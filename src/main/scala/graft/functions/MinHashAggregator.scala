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
  * h_i(x) = (a_i * x + b_i) mod p with p = 2^31-1 and a_i, b_i fixed
  * LCG-style functions of i — deterministic across runs/partitions, no RNG.
  * a_i, x < 2^31 keeps a_i * x + b_i < 2^62: no long overflow.
  */
class MinHashAggregator(numHashes: Int, p: Long) extends Aggregator[Long, Array[Long], Seq[Long]] {

  private val as: Array[Long] = Array.tabulate(numHashes)(i => (1103515245L * (i + 1)) % p)
  private val bs: Array[Long] = Array.tabulate(numHashes)(i => (12345L * (i + 1)) % p)

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
