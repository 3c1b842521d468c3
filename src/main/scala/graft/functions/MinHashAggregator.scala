package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` building a 64-permutation MinHash signature from
  * per-shingle base hashes (SURVEY.md §2.10 names this as the one
  * custom-aggregate candidate; the expression-only alternative —
  * 64 parallel `min(xxhash64(j, s))` columns — lives in
  * `graft.ops.Dedup.minhashSignatures`).
  *
  * Input is the shingle's 64-bit base hash; permutation j is a
  * splitmix64 finalization of `h + j·φ64` — one multiply-shift chain per
  * perm instead of re-hashing the string 64 times, so the per-row cost
  * is 64 integer mixes regardless of shingle length. The buffer is a
  * plain `Array[Long]` with element-wise min merge: partial aggregation
  * (map-side combine) falls out of the Aggregator contract, exactly the
  * property that keeps the signature pass one-shuffle at corpus scale.
  */
object MinHashAggregator extends Aggregator[Long, Array[Long], Array[Long]] {

  val NumPerms = 64

  /** golden-ratio increment + splitmix64 finalizer (public-domain
    * construction, Steele et al., JDK SplittableRandom).
    */
  private final val Phi64 = 0x9e3779b97f4a7c15L

  @inline private def mix(h: Long, j: Int): Long = {
    var z = h + (j + 1) * Phi64
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  override def zero: Array[Long] = Array.fill(NumPerms)(Long.MaxValue)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    var j = 0
    while (j < NumPerms) {
      val p = mix(h, j)
      if (p < buf(j)) buf(j) = p
      j += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < NumPerms) {
      if (b(j) < a(j)) a(j) = b(j)
      j += 1
    }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  // native array<bigint> encoding (not kryo/java blobs) so the output
  // column composes with array functions downstream
  private val enc: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def bufferEncoder: Encoder[Array[Long]] = enc
  override def outputEncoder: Encoder[Array[Long]] = enc
}
