package graft.sources

import org.apache.spark.sql.connector.read.streaming.Offset
import org.scalatest.funsuite.AnyFunSuite

/** Offset/rebase/eviction invariants of the shared push-source buffer,
  * exercised directly (no Spark session needed — the machinery is plain
  * driver-side state).
  */
class PushBufferSpec extends AnyFunSuite {

  private class TestStream extends PushBufferMicroBatchStream[String]("test-src", 1000L) {
    def push(r: String): Unit = admit(r)
    def sliceFor(a: Long, b: Long): Array[(Long, String)] =
      slice(PushOffset(a), PushOffset(b))
    def commitAt(n: Long): Unit = commit(PushOffset(n))
    def latest: Long = latestOffset().asInstanceOf[PushOffset].n
    def parse(s: String): Offset = deserializeOffset(s)
    override def planInputPartitions(start: Offset, end: Offset) =
      throw new UnsupportedOperationException
    override def createReaderFactory() =
      throw new UnsupportedOperationException
    override def stop(): Unit = ()
  }

  test("steady state: offset-log round-trips never rebase, commit evicts the prefix") {
    val s = new TestStream
    (0 until 5).foreach(i => s.push(s"r$i"))
    assert(s.latest == 5)
    // Spark round-trips offsets this instance issued through the log
    s.parse("5"); s.parse("3")
    assert(s.sliceFor(0, 5).map(_._2).toSeq == (0 until 5).map(i => s"r$i"))
    s.commitAt(5)
    assert(s.sliceFor(0, 5).isEmpty, "committed prefix evicted")
    s.push("r5")
    assert(s.latest == 6 && s.sliceFor(5, 6).toSeq == Seq((5L, "r5")))
  }

  test("restart rebase wins the race against early admission (no silent eviction of new rows)") {
    val s = new TestStream
    // the transport pushes 150 rows between subscribe (construction) and
    // Spark's recovery parse of the checkpointed offset log — MORE than
    // the checkpointed offset, which a buffer-length rebase guard missed
    (0 until 150).foreach(i => s.push(s"r$i"))
    // recovery replays the last planned batch [90, 100) from the log
    s.parse("90"); s.parse("100")
    // the pre-crash window is lost (at-most-once): the replay is EMPTY,
    // post-restart rows must NOT be mislabeled with pre-crash offsets
    assert(s.sliceFor(90, 100).isEmpty,
      "replayed pre-crash batch must not serve post-restart rows")
    // committing the replayed batch must not evict anything
    s.commitAt(100)
    // every post-restart arrival flows out, renumbered from the checkpoint
    assert(s.latest == 250)
    val rows = s.sliceFor(100, 250)
    assert(rows.length == 150, s"post-restart rows dropped: only ${rows.length}/150 served")
    assert(rows.head == (100L, "r0") && rows.last == (249L, "r149"))
  }
}
