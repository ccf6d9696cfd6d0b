package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Misra-Gries summary buffer: surviving counters plus the cumulative
  * decrement (`loss`). For every term t — in the buffer or not —
  * the estimate satisfies est(t) ≤ true(t) ≤ est(t) + loss, with
  * loss ≤ n / (m + 1) over n total occurrences.
  */
case class MgBuf(counts: Map[String, Long], loss: Long)

/** Mergeable Misra-Gries heavy-hitters sketch over (term, count) pairs —
  * the constant-memory sibling of the exact top-terms aggregate, the same
  * relationship `q_percentiles_approx` (Greenwald-Khanna) has to the
  * exact percentile operator.
  *
  * Why it exists: the exact vocabulary aggregate's state is
  * O(|vocabulary|) — fine for word-tokenized text, unbounded for n-gram /
  * URL / identifier streams at 100 TB. The MG summary caps state at 2m
  * counters per partition AND at the final merge (≤ m right after each
  * compaction), with the classic
  * deterministic error bound (Misra & Gries 1982; mergeability per
  * Agarwal et al., "Mergeable Summaries", PODS'12): merging two
  * summaries then compacting preserves est(t) ≤ true(t) ≤ est(t)+loss
  * and Σloss ≤ n/(m+1).
  *
  * Compaction (on exceeding m keys): subtract the (m+1)-th largest count
  * from every counter and drop the non-positive — each surviving counter
  * absorbs the decrement into `loss`, which the output exposes as the
  * per-term upper bound `cnt_hi = est + loss`.
  *
  * Determinism: the VALUES (counts, loss) depend on partition merge
  * order — like any mergeable sketch — so this operator carries the
  * driver's rows-only check (no DuckDB oracle); PropertySpec pins the
  * error bound against the exact aggregate, and on a corpus whose
  * vocabulary fits in m counters the sketch is provably EXACT
  * (loss = 0, no compaction ever fires), which the spec also asserts
  * against q_top_terms.
  */
class TopTermsSketch(m: Int, k: Int)
    extends Aggregator[(String, Long), MgBuf, Seq[(String, Long, Long)]] {

  /** Amortized compaction: the buffer is allowed to grow to 2m keys, and
    * one compaction (subtract the (m+1)-th largest count, drop the
    * non-positive — leaves ≤ m keys) then pays for the next m insertions.
    * Compacting at the hard m bound instead would rebuild the map on
    * EVERY new key once full — O(m log m) per row in exactly the
    * unbounded-key regime this sketch exists for. The error bound is
    * unchanged: each subtracted δ hits ≥ m+1 counters (counting dropped
    * mass), so Σδ = loss ≤ n/(m+1); memory is ≤ 2m counters.
    */
  private def compact(counts: Map[String, Long], loss: Long): MgBuf =
    if (counts.size <= 2 * m) MgBuf(counts, loss)
    else {
      val sorted = counts.valuesIterator.toArray
      java.util.Arrays.sort(sorted)
      val delta = sorted(sorted.length - (m + 1)) // (m+1)-th largest
      MgBuf(
        counts.collect { case (t, c) if c > delta => t -> (c - delta) },
        loss + delta)
    }

  override def zero: MgBuf = MgBuf(Map.empty, 0L)

  override def reduce(b: MgBuf, row: (String, Long)): MgBuf =
    compact(b.counts.updated(row._1, b.counts.getOrElse(row._1, 0L) + row._2), b.loss)

  override def merge(a: MgBuf, b: MgBuf): MgBuf =
    compact(
      b.counts.foldLeft(a.counts) { case (acc, (t, c)) =>
        acc.updated(t, acc.getOrElse(t, 0L) + c)
      },
      a.loss + b.loss)

  override def finish(b: MgBuf): Seq[(String, Long, Long)] =
    b.counts.toSeq
      .map { case (t, c) => (t, c, c + b.loss) }
      .sortBy { case (t, c, _) => (-c, t) }
      .take(k)

  override def bufferEncoder: Encoder[MgBuf] = ExpressionEncoder[MgBuf]()
  override def outputEncoder: Encoder[Seq[(String, Long, Long)]] =
    ExpressionEncoder[Seq[(String, Long, Long)]]()
}
