package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` OR-folding bit positions into a fixed-size Bloom
  * bitmap — the at-scale membership primitive for decontamination: the
  * benchmark side collapses to an `mBits`-bit array (8 KiB at the
  * default sizing) that BROADCASTS to every executor, so the candidate
  * side is one map-local bit test per shingle instead of a shuffle join
  * against the benchmark shingle set. Same lifecycle as the reference's
  * lookup-table reads (pipeline_architecture.py:128-148 reads a tiny
  * control table before scanning the batch), with the table shrunk to
  * a bitmap.
  *
  * Positions are computed OUTSIDE the aggregator (Kirsch–Mitzenmacher
  * over md5 halves, the same `(h1 + j·h2)` family as
  * `graft.ops.Dedup`'s oracle-checked MinHash) so the whole filter —
  * not just its behavior — is engine-neutral: DuckDB can rebuild the
  * identical bit SET and the flag decision replays exactly.
  *
  * The buffer is a plain `Array[Long]` with element-wise OR merge:
  * partial aggregation (map-side combine) falls out of the Aggregator
  * contract, so building the filter over a 100 TB benchmark corpus
  * shuffles one bitmap per map partition, nothing else.
  *
  * The size is a constructor knob: the companion default carries the
  * fixture sizing, and [[BloomAggregator.sizeFor]] is the executable
  * production formula (m ≈ 1.44·k·n from the measured benchmark-set
  * cardinality).
  */
class BloomAggregator(val mBits: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(mBits > 0 && mBits % 64 == 0, s"mBits must be a positive word multiple: $mBits")

  private val words = mBits / 64

  override def zero: Array[Long] = new Array[Long](words)

  override def reduce(buf: Array[Long], pos: Long): Array[Long] = {
    buf((pos >>> 6).toInt) |= 1L << (pos & 63)
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < words) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  private val enc: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def bufferEncoder: Encoder[Array[Long]] = enc
  override def outputEncoder: Encoder[Array[Long]] = enc
}

/** Fixture-default instance (8 KiB) plus the sizing constants. */
object BloomAggregator extends BloomAggregator(1 << 16) {

  /** Default filter size in bits (8 KiB). Sized for the fixture's
    * benchmark set (~10³ distinct shingles ⇒ load factor ~6%,
    * fp ≈ (kn/m)^k ≈ 2e-5); size production filters with [[sizeFor]].
    */
  val MBits = 1 << 16

  /** Hash functions per key. With h1 < 2^60, h2 < 2^56 and j ≤ 3 the
    * affine combination stays below 2^63 — no signed overflow.
    */
  val K = 4

  /** Production sizing: m ≈ 1.44·k·n bits (the optimal-k relation
    * m = k·n/ln 2 solved for m, giving fp ≈ 2^-k), rounded up to a
    * 64-bit word multiple, floored at one word. `n` is the measured
    * distinct-key cardinality of the set the filter will hold.
    *
    * The bit count is bounded by Int (the bitmap is one in-memory
    * array row): past n ≈ 3.7e8 at k=4 the formula exceeds 2^31-64
    * bits (~256 MiB) and this FAILS LOUDLY rather than letting the
    * Long→Int wrap hand back a silently undersized (or negative)
    * filter whose false-positive rate explodes. Membership sets
    * bigger than that shouldn't be one Bloom row anyway — shard the
    * set and build one filter per shard.
    */
  def sizeFor(n: Long, k: Int = K): Int = {
    val bits = math.ceil(1.44 * k * n.toDouble).toLong
    val aligned = ((bits + 63) / 64) * 64
    val m = math.max(64L, aligned)
    require(m <= Int.MaxValue - 63,
      s"sizeFor(n=$n, k=$k) needs $m bits > Int range; shard the set " +
        "into multiple filters instead")
    m.toInt
  }
}
