package graft.sources

import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}

/** Single-long offset of a push-buffer source (the absolute count of rows
  * admitted since this subscription began, rebased on restart).
  */
private[sources] final case class PushOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

/** Driver-side push-subscription buffer shared by the MQTT and OPC-UA
  * live sources — ONE copy of the offset/rebase/eviction machinery whose
  * invariants are easy to drift apart when maintained twice (and did:
  * the init-close guard and the cap clamp each existed in only one of
  * the former copies).
  *
  * Semantics: a push protocol (MQTT QoS-0 / OPC-UA notifications) feeds
  * `admit`; rows past `maxBuffered` pending are DROPPED (counted and
  * logged once per overflow episode) — at-most-once is the transport's
  * own contract, and an unbounded buffer would instead OOM the driver
  * under a flood. `commit` evicts the committed prefix; the broker/server
  * never redelivers.
  *
  * Restart rebase (deserializeOffset): a fresh source instance starts
  * counting at 0, but the checkpoint may be at offset N from the previous
  * run. Offsets must never go backwards, so adopt the checkpointed
  * position as the new base. The buffer is KEPT, not cleared: everything
  * in it arrived after this instance's subscribe, i.e. post-restart —
  * those rows are renumbered to start at N and flow out in the next
  * planned batch. Only the pre-crash window is lost (a batch planned
  * before the crash but never committed replays EMPTY): at-most-once,
  * the documented loss mode, never a duplicate and never a drop of
  * post-restart arrivals.
  *
  * The rebase guard is `o > maxIssued` — the high-water mark of offsets
  * THIS instance has handed to Spark via latestOffset — not a comparison
  * against the buffer length: admission starts at construction
  * (subscribe) but the offset log is parsed later, so a hot topic can
  * buffer more rows than the checkpointed offset before recovery reads
  * the log. A buffer-length guard would then skip the rebase, mislabel
  * post-restart rows with pre-crash offsets, and commit() would evict
  * rows that were never planned into any batch. Offsets this instance
  * itself produced always satisfy o <= maxIssued, so steady-state
  * round-trips of the offset log are pure parses and the rebase fires
  * exactly when the checkpoint is ahead of this instance's numbering.
  */
private[sources] abstract class PushBufferMicroBatchStream[R](
    sourceName: String, maxBuffered0: Long) extends MicroBatchStream {

  // clamped into Int range: the buffer is Int-indexed, so a larger cap
  // could never bind and the "hard cap" would silently be no cap at all
  private val maxBuffered: Int =
    math.min(math.max(maxBuffered0, 1L), (Int.MaxValue - 8).toLong).toInt

  private val buf = scala.collection.mutable.ArrayBuffer.empty[R]
  private var base = 0L // absolute offset of buf(0)
  private var maxIssued = 0L // highest offset returned from latestOffset
  private var dropped = 0L
  private val lock = new Object

  /** Admit one pushed row under the cap (sheds + logs past it). Safe to
    * call from the transport's callback thread at any point after base-
    * class construction.
    */
  protected final def admit(row: R): Unit = lock.synchronized {
    if (buf.length < maxBuffered) {
      if (dropped > 0) {
        System.err.println(
          s"[$sourceName] resumed after dropping $dropped messages at cap $maxBuffered")
        dropped = 0
      }
      buf += row
    } else {
      if (dropped == 0)
        System.err.println(
          s"[$sourceName] buffer cap $maxBuffered reached — shedding (at-most-once)")
      dropped += 1
    }
  }

  override final def initialOffset(): Offset = PushOffset(0L)
  override final def latestOffset(): Offset =
    lock.synchronized {
      val o = base + buf.length
      if (o > maxIssued) maxIssued = o
      PushOffset(o)
    }

  override final def deserializeOffset(json: String): Offset = {
    val o = json.toLong
    lock.synchronized {
      if (o > maxIssued) { base = o; maxIssued = o }
    }
    PushOffset(o)
  }

  /** The [start, end) slice with absolute offsets attached. */
  protected final def slice(start: Offset, end: Offset): Array[(Long, R)] = {
    val s = start.asInstanceOf[PushOffset].n
    val e = end.asInstanceOf[PushOffset].n
    lock.synchronized {
      buf.slice((s - base).toInt.max(0), (e - base).toInt.max(0))
        .zipWithIndex
        .map { case (r, i) => (s + i, r) }
        .toArray
    }
  }

  override final def commit(end: Offset): Unit = lock.synchronized {
    val e = end.asInstanceOf[PushOffset].n
    val drop = (e - base).toInt
    if (drop > 0) { buf.remove(0, drop.min(buf.length)); base = e }
  }
}
