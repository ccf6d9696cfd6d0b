package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Typed Aggregator folding per-token 64-bit hashes into a SimHash signature.
  *
  * Input: one token hash per row. Buffer: primitive Array[Int] of per-bit
  * sign sums — fixed `bits`-sized state per group with map-side partial
  * aggregation, so at 100 TB the shuffle carries one ~240 B vector per
  * (partition, doc) instead of the token rows. Replaces a 60-column
  * sum(CASE) hash aggregate whose codegen compile time dominated small runs.
  *
  * finish() sets bit b iff the sign sum is positive — exactly the
  * `CASE WHEN b > 0 THEN 2^b ELSE 0` fold the DuckDB oracle computes.
  */
class SimHashAggregator(bits: Int) extends Aggregator[Long, Array[Int], Long] {

  override def zero: Array[Int] = new Array[Int](bits)

  override def reduce(buf: Array[Int], h: Long): Array[Int] = {
    var b = 0
    while (b < bits) {
      buf(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
      b += 1
    }
    buf
  }

  override def merge(b1: Array[Int], b2: Array[Int]): Array[Int] = {
    var b = 0
    while (b < bits) { b1(b) += b2(b); b += 1 }
    b1
  }

  override def finish(buf: Array[Int]): Long = {
    var sim = 0L
    var b = 0
    while (b < bits) {
      if (buf(b) > 0) sim |= (1L << b)
      b += 1
    }
    sim
  }

  override def bufferEncoder: Encoder[Array[Int]] = ExpressionEncoder[Array[Int]]()
  override def outputEncoder: Encoder[Long] = ExpressionEncoder[Long]()
}
