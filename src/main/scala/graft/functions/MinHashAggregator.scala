package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Typed Aggregator computing a full MinHash signature in one pass.
  *
  * Input: one 64-bit shingle hash per row (already reduced mod p).
  * Buffer: primitive Array[Long] of `numHashes` running minima — the
  * per-group state is 1 KB regardless of document size, and partial
  * aggregation applies, so at 100 TB the shuffle carries one small array per
  * (partition, doc) instead of 128× the shingle rows (explode) or the raw
  * shingle sets (collect_set).
  *
  * h_i(x) = (a_i * x + b_i) mod p with p = 2^31-1 and a_i, b_i derived from
  * i by the splitmix64 finalizer — deterministic across runs/partitions (no
  * RNG state), and pairwise independent across i, unlike coefficients that
  * are linear in i: with a_i = c*(i+1) every h_i is a scalar multiple of one
  * base hash, so all 128 minima are decided by the same argmin event and the
  * banded-LSH false-negative bound collapses from (1-J^r)^b to ~(1-J).
  * Independent a_i/b_i restore the textbook bound (~4e-13 at J >= 0.6 with
  * r=2, b=64), which is what lets the exact-Jaccard oracle match.
  * a_i, x < 2^31 keeps a_i * x + b_i < 2^62: no long overflow.
  */
class MinHashAggregator(numHashes: Int, p: Long) extends Aggregator[Long, Array[Long], Seq[Long]] {

  /** splitmix64 finalizer: high-quality 64-bit mix of the seed. */
  private def mix(seed: Long): Long = {
    var z = seed + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  // a in [1, p-1] (nonzero so h_i is a permutation), b in [0, p-1]
  private val as: Array[Long] = Array.tabulate(numHashes)(i => (mix(2L * i + 1) & Long.MaxValue) % (p - 1) + 1)
  private val bs: Array[Long] = Array.tabulate(numHashes)(i => (mix(2L * i + 2) & Long.MaxValue) % p)

  override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def reduce(buf: Array[Long], x: Long): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      val h = (as(i) * x + bs(i)) % p
      if (h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      if (b2(i) < b1(i)) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}
