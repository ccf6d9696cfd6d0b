package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Bounded keep-smallest-K per group — the "top-K per group" primitive
  * as a mergeable aggregate instead of a ranking window.
  *
  * Input rows are (key: String, id: Long, payload: Long); the aggregate
  * keeps the K smallest by (key, id) — the md5-rank-prefix selection
  * idiom (`CurationOps.domainMix` / `sampleStratified`) — and finishes
  * to (n_kept, Σ payload of the kept rows).
  *
  * Why this exists when `row_number + filter` plans as WindowGroupLimit:
  * WindowGroupLimit's map-side pruning fires ONLY when the rank filter
  * directly follows the window. The moment the same query also needs an
  * aggregate over ALL rows of the group (a per-group total next to the
  * capped subset — exactly the domain-mix shape), either the window
  * fuses with the aggregate and the pruning dies (the full corpus
  * funnels through one sort task per group key), or the corpus is
  * scanned twice. This aggregate gives the single-scan plan with
  * BOUNDED state: partial buffers never exceed K entries, merge is a
  * truncating sorted merge, so each map task sends ≤ K rows per group
  * to the exchange and a group 1000× hotter than the rest still costs
  * every task at most K entries of memory. Runs as ObjectHashAggregate
  * (the collect_set precedent: one corpus exchange of bounded payloads
  * measured faster than two codegen exchanges at sf1+).
  *
  * Determinism: (key, id) is a total order (id is a distinct doc_id),
  * so the kept set is unique regardless of partitioning or merge order
  * — unlike the Misra-Gries sketch this aggregate is EXACT and carries
  * a normal DuckDB oracle.
  */
class TopKKeep(k: Int)
    extends Aggregator[(String, Long, Long), Seq[(String, Long, Long)], (Long, Long)] {

  @inline private def lt(a: (String, Long, Long), b: (String, Long, Long)): Boolean = {
    val c = a._1.compareTo(b._1)
    c < 0 || (c == 0 && a._2 < b._2)
  }

  override def zero: Seq[(String, Long, Long)] = Vector.empty

  override def reduce(
      b: Seq[(String, Long, Long)],
      r: (String, Long, Long)): Seq[(String, Long, Long)] =
    if (b.size >= k && !lt(r, b.last)) b // hot-group fast path: no allocation
    else {
      val (lo, hi) = b.span(lt(_, r))
      val ins = (lo :+ r) ++ hi
      if (ins.size > k) ins.init else ins
    }

  override def merge(
      a: Seq[(String, Long, Long)],
      b: Seq[(String, Long, Long)]): Seq[(String, Long, Long)] = {
    // truncating merge of two sorted runs — O(K), never materializes more
    val out = Vector.newBuilder[(String, Long, Long)]
    var (i, j, n) = (0, 0, 0)
    while (n < k && (i < a.size || j < b.size)) {
      if (j >= b.size || (i < a.size && lt(a(i), b(j)))) { out += a(i); i += 1 }
      else { out += b(j); j += 1 }
      n += 1
    }
    out.result()
  }

  override def finish(b: Seq[(String, Long, Long)]): (Long, Long) =
    (b.size.toLong, b.iterator.map(_._3).sum)

  override def bufferEncoder: Encoder[Seq[(String, Long, Long)]] =
    ExpressionEncoder[Seq[(String, Long, Long)]]()
  override def outputEncoder: Encoder[(Long, Long)] =
    ExpressionEncoder[(Long, Long)]()
}
