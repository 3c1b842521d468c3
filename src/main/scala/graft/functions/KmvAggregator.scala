package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** K-minimum-values sketch summary: number of hashes kept (= K once the
  * stream has ≥ K distinct values) and the K-th smallest distinct hash.
  */
case class KmvSummary(k: Long, kth_min: Long)

/** Typed `Aggregator` maintaining the K smallest DISTINCT 60-bit hashes
  * — the bounded per-partition state the KMV estimator
  * (`graft.ops.Relational.kmvDistinct`) needs at scale. The naive
  * construction (`distinct` over every hash, global sort, LIMIT K)
  * shuffles all n distinct hashes; this buffer holds ≤ K longs per
  * partition, partial aggregation (map-side combine) falls out of the
  * Aggregator contract, and the shuffle moves exactly one ≤K-element
  * array per map partition regardless of n.
  *
  * The buffer is a sorted `Array[Long]`: a candidate below the current
  * K-th minimum binary-searches in O(log K) and inserts by copy only
  * when accepted — once the buffer saturates with small hashes,
  * almost every row is rejected after the search, so the steady-state
  * per-row cost is the search alone (the classic bounded-heap
  * behavior, here kept sorted so `merge` is a linear two-pointer pass
  * and the estimator reads the max in O(1)).
  *
  * Estimator identity with the unbounded form is exact, not
  * approximate: both keep the K smallest distinct values, so `k` and
  * `kth_min` — and therefore the oracle-checked estimate — are
  * bit-identical.
  */
object KmvAggregator extends Aggregator[Long, Array[Long], KmvSummary] {

  val K = 256

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    if (buf.length == K && h >= buf(K - 1)) return buf
    val pos = java.util.Arrays.binarySearch(buf, h)
    if (pos >= 0) return buf // already present: KMV keeps distinct values
    val ins = -pos - 1
    val outLen = math.min(buf.length + 1, K)
    val out = new Array[Long](outLen)
    System.arraycopy(buf, 0, out, 0, ins)
    out(ins) = h
    System.arraycopy(buf, ins, out, ins + 1, outLen - ins - 1)
    out
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[Long](math.min(a.length + b.length, K))
    var i = 0; var j = 0; var n = 0
    while (n < K && (i < a.length || j < b.length)) {
      val takeA = j >= b.length || (i < a.length && a(i) <= b(j))
      val v = if (takeA) a(i) else b(j)
      if (takeA) i += 1 else j += 1
      if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 } // drop cross-partition dups
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  override def finish(buf: Array[Long]): KmvSummary =
    KmvSummary(buf.length.toLong, if (buf.isEmpty) 0L else buf(buf.length - 1))

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[KmvSummary] = Encoders.product[KmvSummary]
}
