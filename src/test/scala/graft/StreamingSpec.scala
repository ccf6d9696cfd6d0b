package graft

import graft.streaming.StreamingOps
import graft.streaming.StreamingOps._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Streaming-twin semantics (SURVEY §5.2.4): watermark drops late rows and
  * closed buckets match the batch recompute; stateful alarms reproduce the
  * batch window results across micro-batch boundaries.
  */
class StreamingSpec extends SparkSuite {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("mv stream: closed buckets equal batch recompute; late rows beyond watermark dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    val events = mem.toDF().toDF("event_id", "ts", "metric", "value")
    val q = StreamingOps.mvMinuteStream(events)
      .writeStream.format("memory").queryName("mv_out")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, ts("2024-01-01 00:00:10"), "click", 10.0),
        (2L, ts("2024-01-01 00:00:50"), "click", 20.0),
        (3L, ts("2024-01-01 00:01:10"), "click", 30.0)
      )
      q.processAllAvailable()
      // advance watermark far past minute 0 and inject a too-late row for it
      mem.addData((4L, ts("2024-01-01 00:10:00"), "click", 99.0))
      q.processAllAvailable()
      mem.addData((5L, ts("2024-01-01 00:00:30"), "click", 1000.0)) // late, dropped
      q.processAllAvailable()
      mem.addData((6L, ts("2024-01-01 00:20:00"), "click", 1.0)) // close minute 10
      q.processAllAvailable()
      val rows = spark.table("mv_out")
        .select("bucket", "avg_value", "sample_count").collect()
        .map(r => (r.getTimestamp(0).toString, r.getDouble(1), r.getLong(2))).toSet
      // minute 0: avg(10,20)=15 with the late 1000.0 dropped; minute 1
      // closed too. SET EQUALITY, not contains: a watermark regression
      // that let the late row re-emit minute 0 would add a fourth row
      // that contains-only checks would never see
      assert(rows == Set(
        ("2024-01-01 00:00:00.0", 15.0, 2L),
        ("2024-01-01 00:01:00.0", 30.0, 1L),
        ("2024-01-01 00:10:00.0", 99.0, 1L)), rows.toString)
    } finally q.stop()
  }

  test("trend alarm state survives micro-batch boundaries") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[MetricEvent]
    val q = StreamingOps.trendAlarms(mem.toDS())
      .writeStream.format("memory").queryName("trend_out")
      .outputMode("append").start()
    try {
      // click target 250; all three > 2% deviation, split across batches
      mem.addData(MetricEvent(1, ts("2024-01-01 00:00:01"), 7, "click", 280.0))
      q.processAllAvailable()
      mem.addData(
        MetricEvent(2, ts("2024-01-01 00:00:02"), 7, "click", 240.0),
        MetricEvent(3, ts("2024-01-01 00:00:03"), 7, "click", 265.0)
      )
      q.processAllAvailable()
      val fired = spark.table("trend_out").select("event_id").as[Long].collect().toSeq
      assert(fired == Seq(3L))
      // a within-band row resets the run: two more deviant rows must not fire
      mem.addData(
        MetricEvent(4, ts("2024-01-01 00:00:04"), 7, "click", 251.0), // 0.4%
        MetricEvent(5, ts("2024-01-01 00:00:05"), 7, "click", 280.0),
        MetricEvent(6, ts("2024-01-01 00:00:06"), 7, "click", 280.0)
      )
      q.processAllAvailable()
      assert(spark.table("trend_out").count() == 1)
    } finally q.stop()
  }

  test("edge alarm fires once per excursion across batches and re-arms") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[MetricEvent]
    val q = StreamingOps.edgeAlarms(mem.toDS(), 200.0)
      .writeStream.format("memory").queryName("edge_out")
      .outputMode("append").start()
    try {
      mem.addData(
        MetricEvent(1, ts("2024-01-01 00:00:01"), 9, "click", 250.0),
        MetricEvent(2, ts("2024-01-01 00:00:02"), 9, "click", 150.0) // fire
      )
      q.processAllAvailable()
      mem.addData(MetricEvent(3, ts("2024-01-01 00:00:03"), 9, "click", 120.0)) // still low: no
      q.processAllAvailable()
      mem.addData(
        MetricEvent(4, ts("2024-01-01 00:00:04"), 9, "click", 240.0), // re-arm
        MetricEvent(5, ts("2024-01-01 00:00:05"), 9, "click", 110.0)  // fire
      )
      q.processAllAvailable()
      val fired = spark.table("edge_out").select("event_id").as[Long].collect().toSeq.sorted
      assert(fired == Seq(2L, 5L))
    } finally q.stop()
  }

  test("auto-recovery stream: fires once on the transition into recoverable") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[MetricEvent]
    val q = StreamingOps.recoveries(mem.toDS())
      .writeStream.format("memory").queryName("recovery_out")
      .outputMode("append").start()
    try {
      mem.addData(
        MetricEvent(1, ts("2024-01-01 00:00:01"), 3, "error", 150.0),   // in Error
        MetricEvent(2, ts("2024-01-01 00:00:02"), 3, "click", 100.0),
        MetricEvent(3, ts("2024-01-01 00:00:03"), 3, "view", 50.0)
      )
      q.processAllAvailable()
      assert(spark.table("recovery_out").count() == 0, "purchase still missing")
      mem.addData(MetricEvent(4, ts("2024-01-01 00:00:04"), 3, "purchase", 10.0)) // all healthy
      q.processAllAvailable()
      mem.addData(MetricEvent(5, ts("2024-01-01 00:00:05"), 3, "click", 120.0)) // still recoverable: no re-fire
      q.processAllAvailable()
      val fired = spark.table("recovery_out").select("event_id").as[Long].collect().toSeq
      assert(fired == Seq(4L))
      // healthy drop re-arms, next full condition fires again
      mem.addData(
        MetricEvent(6, ts("2024-01-01 00:00:06"), 3, "view", 1.0),   // unhealthy
        MetricEvent(7, ts("2024-01-01 00:00:07"), 3, "view", 80.0)   // healthy again -> fire
      )
      q.processAllAvailable()
      assert(spark.table("recovery_out").select("event_id").as[Long].collect().toSeq.sorted == Seq(4L, 7L))
    } finally q.stop()
  }

  test("session stream: sessions close at the watermark, match batch semantics") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, Double)]
    val events = mem.toDF().toDF("event_id", "ts", "user_id", "value")
    val q = StreamingOps.sessionizeStream(events)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, ts("2024-01-01 00:00:00"), 5L, 1.0),
        (2L, ts("2024-01-01 00:10:00"), 5L, 2.0) // same session (gap 10min)
      )
      q.processAllAvailable()
      assert(spark.table("sess_out").count() == 0, "session still open")
      // 40-min silence then a new event: closes session 1, opens session 2
      mem.addData((3L, ts("2024-01-01 00:50:00"), 5L, 4.0))
      q.processAllAvailable()
      mem.addData((4L, ts("2024-01-01 02:00:00"), 5L, 8.0)) // closes session 2
      q.processAllAvailable()
      val rows = spark.table("sess_out")
        .select("session_start", "n_events", "total_value").collect()
        .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getDouble(2))).toSet
      assert(rows.contains(("2024-01-01 00:00:00.0", 2L, 3.0)))
      assert(rows.contains(("2024-01-01 00:50:00.0", 1L, 4.0)))
    } finally q.stop()
  }

  test("minhash candidate stream == batch candidates under random micro-batch splits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // fixture docs + synthetic near-dup twins, arriving in random order and
    // random micro-batch splits: candidate pairs must equal the batch
    // operator's band-join candidates exactly (same natives, same buckets)
    val fixture = Tables.documents(spark, SfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val rnd = new scala.util.Random(31)
    val docs = rnd.shuffle(fixture.toSeq)
    val mem = MemoryStream[(Long, String)]
    val q = StreamingOps.minhashCandidatesStream(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("cand_out")
      .outputMode("append").start()
    try {
      var rest = docs
      while (rest.nonEmpty) {
        val (batch, tail) = rest.splitAt(1 + rnd.nextInt(200))
        mem.addData(batch: _*)
        rest = tail
      }
      // re-deliver a slice (at-least-once input): must add no new pairs
      mem.addData(docs.take(20): _*)
      q.processAllAvailable()
      val streamed = spark.table("cand_out")
        .select("i", "j").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      import graft.ops.DedupOps
      val docsDf = docs.toDF("doc_id", "text")
      val withSig = docsDf
        .select(col("doc_id"), DedupOps.shingleHashSet(col("text")).as("xs"))
        .filter(size(col("xs")) > 0)
        .withColumn("sig", DedupOps.minhashSigCol(col("xs")))
      val bands = DedupOps.bandedDocIds(withSig)
      val batchCand = bands.as("a")
        .join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id"), col("b.doc_id")).distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == batchCand,
        s"streamed ${streamed.size} vs batch ${batchCand.size}; " +
          s"only-streamed=${(streamed -- batchCand).take(5)} only-batch=${(batchCand -- streamed).take(5)}")
      assert(batchCand.nonEmpty, "fixture produced no candidates — vacuous test")
    } finally q.stop()
  }

  test("incremental dedup stream == batch best matches under random micro-batch splits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // base = the fixture's src0 docs (the static index); stream = every
    // other source's docs in random order and random micro-batch splits,
    // plus a redelivered slice. The streamed best matches must equal the
    // batch operator's rows exactly (same natives, same buckets, same
    // tie-break).
    val base = graft.ops.DedupOps.IncrementalBaseSource
    val all = Tables.documents(spark, SfDir)
      .select("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val baseDocs = all.filter(_._3 == base).map(d => (d._1, d._2)).toSeq.toDF("doc_id", "text")
    val rnd = new scala.util.Random(43)
    val probes = rnd.shuffle(all.filterNot(_._3 == base).toSeq)
    val mem = MemoryStream[(Long, String, String)]
    val q = StreamingOps.dedupIncrementalStream(
        mem.toDF().toDF("doc_id", "text", "source"), baseDocs)
      .writeStream.format("memory").queryName("incdedup_out")
      .outputMode("append").start()
    try {
      var rest = probes
      while (rest.nonEmpty) {
        val (batch, tail) = rest.splitAt(1 + rnd.nextInt(150))
        mem.addData(batch: _*)
        rest = tail
      }
      mem.addData(probes.take(25): _*) // at-least-once redelivery
      q.processAllAvailable()
      val streamed = spark.table("incdedup_out").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      // emit-once even under redelivery
      assert(streamed.map(_._1).distinct.length == streamed.length, "doc emitted twice")
      val batchRows = graft.ops.DedupOps.dedupIncrementalOn(
          all.toSeq.toDF("doc_id", "text", "source"), base).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      assert(batchRows.nonEmpty, "fixture has no cross-source near-dups — vacuous test")
      assert(streamed.toSet === batchRows.toSet,
        s"only-streamed=${(streamed.toSet -- batchRows.toSet).take(3)} " +
          s"only-batch=${(batchRows.toSet -- streamed.toSet).take(3)}")
    } finally q.stop()
  }

  test("url dedup stream: one survivor per canonical URL under splits + redelivery") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ids = Tables.documents(spark, SfDir).select("doc_id").collect().map(_.getLong(0))
    val rnd = new scala.util.Random(44)
    val order = rnd.shuffle(ids.toSeq)
    val mem = MemoryStream[Long]
    val q = StreamingOps.urlDedupStream(mem.toDF().toDF("doc_id"))
      .writeStream.format("memory").queryName("urldedup_out")
      .outputMode("append").start()
    try {
      var rest = order
      while (rest.nonEmpty) {
        val (batch, tail) = rest.splitAt(1 + rnd.nextInt(150))
        mem.addData(batch: _*)
        rest = tail
      }
      mem.addData(order.take(30): _*) // at-least-once redelivery
      q.processAllAvailable()
      val streamed = spark.table("urldedup_out").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      // emit-once per canonical URL, even under redelivery
      assert(streamed.map(_._2).distinct.length == streamed.length, "url emitted twice")
      // survivor set covers exactly the batch operator's canonical URLs
      val batchUrls = graft.ops.CurationOps.urlDedup(spark, SfDir).collect()
        .map(_.getString(1)).toSet
      assert(streamed.map(_._2).toSet === batchUrls)
      // each survivor is a doc that actually maps to that URL (arrival
      // order decides WHICH one, so membership is the invariant)
      val urlOf = Tables.documents(spark, SfDir).select(col("doc_id"),
          graft.ops.CurationOps.canonicalUrl(graft.ops.CurationOps.docUrl).as("url"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      streamed.foreach { case (id, url) => assert(urlOf(id) == url, s"doc $id") }
    } finally q.stop()
  }

  test("multimodal dedup stream: one survivor per perceptual key under splits + redelivery") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.MultimodalOps
    val fixture = MultimodalOps.mediaTable(spark, SfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("format"),
        r.getAs[Long]("n_bytes"), r.getAs[Array[Byte]]("payload")))
    val rnd = new scala.util.Random(45)
    val order = rnd.shuffle(fixture.toSeq)
    val mem = MemoryStream[(Long, String, Long, Array[Byte])]
    val q = StreamingOps.multimodalDedupStream(
        mem.toDF().toDF("doc_id", "format", "n_bytes", "payload"))
      .writeStream.format("memory").queryName("mmdedup_out")
      .outputMode("append").start()
    try {
      var rest = order
      while (rest.nonEmpty) {
        val (batch, tail) = rest.splitAt(1 + rnd.nextInt(150))
        mem.addData(batch: _*)
        rest = tail
      }
      mem.addData(order.take(30): _*) // at-least-once redelivery
      q.processAllAvailable()
      val streamed = spark.table("mmdedup_out").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      // emit-once per perceptual key, even under redelivery
      assert(streamed.map(_._2).distinct.length == streamed.length, "pkey emitted twice")
      // keeper GROUPS equal the batch operator's: same key set (arrival
      // order decides WHICH group member survives, so membership is the
      // invariant — the urlDedupStream contract)
      val batchKeys = MultimodalOps.multimodalDedup(spark, SfDir).collect()
        .map(_.getAs[Long]("pkey")).toSet
      assert(streamed.map(_._2).toSet === batchKeys)
      // each survivor is a medium that actually quantizes to its key
      val keyOf = MultimodalOps.withPerceptualKey(MultimodalOps.mediaTable(spark, SfDir))
        .collect().map(k => k.getAs[Long]("doc_id") -> k.getAs[Long]("pkey")).toMap
      streamed.foreach { case (id, k) => assert(keyOf(id) == k, s"doc $id") }
    } finally q.stop()
  }

  test("substring dedup stream == asymmetric batch cut spans under splits + redelivery") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = graft.ops.DedupOps.IncrementalBaseSource
    val all = Tables.documents(spark, SfDir)
      .select("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val baseDocs = all.filter(_._3 == base).map(d => (d._1, d._2)).toSeq.toDF("doc_id", "text")
    val rnd = new scala.util.Random(45)
    val probes = rnd.shuffle(all.filterNot(_._3 == base).map(d => (d._1, d._2)).toSeq)
    val mem = MemoryStream[(Long, String)]
    val q = StreamingOps.dedupSubstringStream(
        mem.toDF().toDF("doc_id", "text"), baseDocs)
      .writeStream.format("memory").queryName("subdedup_out")
      .outputMode("append").start()
    try {
      var rest = probes
      while (rest.nonEmpty) {
        val (batch, tail) = rest.splitAt(1 + rnd.nextInt(150))
        mem.addData(batch: _*)
        rest = tail
      }
      mem.addData(probes.take(25): _*) // at-least-once redelivery
      q.processAllAvailable()
      val streamed = spark.table("subdedup_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // emit-once under redelivery: no duplicate span rows
      assert(streamed.length == streamed.distinct.length, "span emitted twice")
      // batch reference with the SAME asymmetric semantics: every probe
      // window whose fingerprint appears anywhere in the base is a cut;
      // islands merged in plain Scala
      val w = graft.ops.DedupOps.SubstrWindow
      val baseH = baseDocs
        .select(explode(graft.ops.DedupOps.windowHashes(col("text"))).as("h"))
        .distinct().as[Long].collect().toSet
      val probeOcc = probes.toDF("doc_id", "text")
        .select(col("doc_id"), posexplode(graft.ops.DedupOps.windowHashes(col("text"))))
        .select(col("doc_id"), (col("pos") + 1).cast("long").as("p"), col("col").as("h"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val expect = probeOcc.filter(t => baseH(t._3)).groupBy(_._1).toSeq.flatMap {
        case (id, rows) =>
          val ps = rows.map(_._2).sorted
          val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
          var s0 = ps(0); var last = ps(0)
          ps.iterator.drop(1).foreach { p =>
            if (p - last > w) { out += ((id, s0, last + w - s0)); s0 = p }
            last = p
          }
          out += ((id, s0, last + w - s0))
          out.toSeq
      }
      assert(expect.nonEmpty, "fixture has no cross-source verbatim spans — vacuous test")
      assert(streamed.toSet === expect.toSet,
        s"only-streamed=${(streamed.toSet -- expect.toSet).take(3)} " +
          s"only-batch=${(expect.toSet -- streamed.toSet).take(3)}")
    } finally q.stop()
  }

  test("decontamination stream: flags equal the batch operator under micro-batch splits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evalDocs = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "pack my box with five dozen liquor jugs")
    ).toDF("doc_id", "text")
    val train = Seq(
      (1L, "the quick brown fox jumps high today"), // shares grams with 100
      (2L, "entirely unrelated content with nothing in common whatsoever"),
      (3L, "pack my box with five dozen bottles") // shares grams with 101
    )
    val mem = MemoryStream[(Long, String)]
    val q = StreamingOps.decontaminateStream(
        mem.toDF().toDF("doc_id", "text"), evalDocs)
      .writeStream.format("memory").queryName("decon_out")
      .outputMode("append").start()
    try {
      mem.addData(train(0))
      q.processAllAvailable()
      mem.addData(train(1), train(2)) // second micro-batch
      q.processAllAvailable()
      val streamed = spark.table("decon_out")
        .select("doc_id", "n_shared_grams", "n_eval_docs").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // batch reference: same join+agg on the full static data
      val batch = train.toDF("doc_id", "text")
        .select(col("doc_id"), explode(graft.ops.DedupOps.ngramHashSet(
          graft.ops.TextOps.normText(col("text")))).as("gram"))
        .join(evalDocs.select(explode(graft.ops.DedupOps.ngramHashSet(
          graft.ops.TextOps.normText(col("text")))).as("gram"),
          col("doc_id").as("eval_doc")), "gram")
        .groupBy("doc_id")
        .agg(count_distinct(col("gram")).as("g"), count_distinct(col("eval_doc")).as("e"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed == batch, s"streamed $streamed vs batch $batch")
      assert(streamed.map(_._1) == Set(1L, 3L), s"expected docs 1 and 3 flagged: $streamed")
    } finally q.stop()
  }

  test("decontamination stream: artifact arm reads the versioned eval grams with identical flags") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evalDocs = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "pack my box with five dozen liquor jugs")
    ).toDF("doc_id", "text")
    // publish the gram set once (the CurationJob 'evalgrams' stage shape);
    // the stream then serves from the committed version — no driver
    // collect, no per-start extraction
    val artDir = java.nio.file.Files.createTempDirectory("decon_art").toString
    graft.pipeline.VersionedStore.publish(spark, artDir, 1, Seq(
      "evalgrams" -> evalDocs.select(
        explode(graft.ops.DedupOps.ngramHashSet(
          graft.ops.TextOps.normText(col("text")))).as("gram"),
        col("doc_id").as("eval_doc"))))
    val train = Seq(
      (1L, "the quick brown fox jumps high today"),
      (2L, "entirely unrelated content with nothing in common whatsoever"),
      (3L, "pack my box with five dozen bottles"))
    val mem = MemoryStream[(Long, String)]
    val q = StreamingOps.decontaminateStreamFromArtifact(
        mem.toDF().toDF("doc_id", "text"), artDir)
      .writeStream.format("memory").queryName("decon_art_out")
      .outputMode("append").start()
    try {
      mem.addData(train: _*)
      q.processAllAvailable()
      val streamed = spark.table("decon_art_out")
        .select("doc_id", "n_shared_grams", "n_eval_docs").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val batch = train.toDF("doc_id", "text")
        .select(col("doc_id"), explode(graft.ops.DedupOps.ngramHashSet(
          graft.ops.TextOps.normText(col("text")))).as("gram"))
        .join(evalDocs.select(explode(graft.ops.DedupOps.ngramHashSet(
          graft.ops.TextOps.normText(col("text")))).as("gram"),
          col("doc_id").as("eval_doc")), "gram")
        .groupBy("doc_id")
        .agg(count_distinct(col("gram")).as("g"), count_distinct(col("eval_doc")).as("e"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed == batch, s"artifact arm $streamed vs batch $batch")
    } finally q.stop()
  }

  test("contamination coverage stream: per-doc verdicts equal the batch operator across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evalText = "the quick brown fox jumps over the lazy dog again and again"
    val evalDocs = Seq((100L, evalText)).toDF("doc_id", "text")
    val train = Seq(
      (1L, evalText),                                                    // coverage 1.0
      (2L, "completely different words here with zero gram overlap QQ"), // clean
      (3L, "tiny"),                                                      // no grams
      (4L, "the quick brown fox PLUS unrelated tail material beyond"))   // partial
    val mem = MemoryStream[(Long, String)]
    val q = StreamingOps.contamCoverageStream(
        mem.toDF().toDF("doc_id", "text"), evalDocs)
      .writeStream.format("memory").queryName("cov_out")
      .outputMode("append").start()
    try {
      mem.addData(train(0))
      q.processAllAvailable()
      mem.addData(train(1), train(2), train(3)) // second micro-batch
      q.processAllAvailable()
      val streamed = spark.table("cov_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4)))
        .toSet
      // batch reference: the oracle-gated operator over the union corpus
      val batch = graft.ops.CurationOps.contamCoverageOn(
          (train.map { case (id, t) => (id, t, "s1") } :+
            ((100L, evalText, graft.ops.CurationOps.EvalSource)))
            .toDF("doc_id", "text", "source").withColumn("lang", lit("en")))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4)))
        .toSet
      assert(streamed == batch, s"streamed $streamed\nbatch $batch")
      assert(streamed.exists(r => r._1 == 1L && r._4 == 1.0 && r._5 == "contaminated"))
      assert(streamed.exists(r => r._1 == 3L && r._2 == 0L && r._5 == "clean"))
    } finally q.stop()
  }

  test("contamination coverage stream: artifact arm serves the versioned eval grams with identical verdicts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evalText = "the quick brown fox jumps over the lazy dog again and again"
    val evalDocs = Seq((100L, evalText)).toDF("doc_id", "text")
    // publish the CurationJob 'evalgrams' stage shape once; the stream
    // serves from the committed version — no per-start extraction
    val artDir = java.nio.file.Files.createTempDirectory("cov_art").toString
    graft.pipeline.VersionedStore.publish(spark, artDir, 1, Seq(
      "evalgrams" -> evalDocs.select(
        explode(graft.ops.DedupOps.ngramHashSet(
          graft.ops.TextOps.normText(col("text")))).as("gram"),
        col("doc_id").as("eval_doc"))))
    val train = Seq(
      (1L, evalText),
      (2L, "completely different words here with zero gram overlap QQ"),
      (3L, "tiny"),
      (4L, "the quick brown fox PLUS unrelated tail material beyond"))
    val mem = MemoryStream[(Long, String)]
    val q = StreamingOps.contamCoverageStreamFromArtifact(
        mem.toDF().toDF("doc_id", "text"), artDir)
      .writeStream.format("memory").queryName("cov_art_out")
      .outputMode("append").start()
    try {
      mem.addData(train: _*)
      q.processAllAvailable()
      val streamed = spark.table("cov_art_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4)))
        .toSet
      val batch = graft.ops.CurationOps.contamCoverageOn(
          (train.map { case (id, t) => (id, t, "s1") } :+
            ((100L, evalText, graft.ops.CurationOps.EvalSource)))
            .toDF("doc_id", "text", "source").withColumn("lang", lit("en")))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4)))
        .toSet
      assert(streamed == batch, s"artifact arm $streamed\nbatch $batch")
    } finally q.stop()
  }

  test("exact dedup stream: one survivor per normalized digest across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = StreamingOps.dedupExactStream(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("exact_out")
      .outputMode("append").start()
    try {
      mem.addData((1L, "the cat sat"), (2L, "THE  CAT  SAT")) // same normalized form
      q.processAllAvailable()
      mem.addData((3L, "the cat sat"), (4L, "a different doc"))
      q.processAllAvailable()
      val rows = spark.table("exact_out").select("doc_id").as[Long].collect().toSet
      // survivor of the digest-equal family is its first arrival; doc 3 in a
      // later batch is suppressed by the state store
      assert(rows.size == 2 && rows.contains(4L) && (rows - 4L).subsetOf(Set(1L, 2L)))
    } finally q.stop()
  }

  test("histogram stream: fixed-baseline bins — running counts equal batch across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // baseline bounds = the batch operator's own per-metric cent extremes,
    // computed over the SAME rows the stream will carry
    val rows = Seq(
      ("click", 1.00), ("click", 2.50), ("click", 9.99), ("click", 5.25),
      ("scroll", -3.00), ("scroll", 7.00), ("scroll", 7.00), ("flat", 4.44))
    val bounds = rows.groupBy(_._1).map { case (m, xs) =>
      val cents = xs.map(x => math.floor(x._2 * 100 + 0.5).toLong)
      m -> StreamingOps.HistBounds(cents.min, cents.max)
    }
    val mem = MemoryStream[(String, Double)]
    val q = StreamingOps.histogramStream(
        mem.toDF().toDF("event_type", "value"), bounds)
      .writeStream.format("memory").queryName("hist_out")
      .outputMode("complete").start()
    try {
      val (b1, b2) = rows.splitAt(4)
      mem.addData(b1: _*)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
      val streamed = spark.table("hist_out")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      // independent batch recompute with the identical integer binning
      val bins = graft.ops.RelationalOps.HistBins
      val batch = rows.groupBy(identity).view.mapValues(_.size).toSeq
        .map { case ((m, v), n) =>
          val c = math.floor(v * 100 + 0.5).toLong
          val hb = bounds(m)
          val bin = if (hb.cmaxCents == hb.cminCents) 0L
            else math.min(bins - 1L,
              (c - hb.cminCents) * bins / (hb.cmaxCents - hb.cminCents))
          ((m, bin), n.toLong)
        }.groupBy(_._1).view.mapValues(_.map(_._2).sum)
        .map { case ((m, bin), n) => (m, bin, n) }.toSet
      assert(streamed == batch, s"streamed $streamed vs batch $batch")
      // single-valued metric lands in bin 0 (the batch degenerate case)
      assert(streamed.exists(t => t._1 == "flat" && t._2 == 0L && t._3 == 1L))
    } finally q.stop()
  }

  test("top-terms stream: running vocabulary counts equal batch recompute across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = StreamingOps.topTermsStream(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("topterms_out")
      .outputMode("complete").start()
    try {
      val batch1 = Seq((1L, "spark spark scan join"), (2L, "scan  scan filter"))
      val batch2 = Seq((3L, "join spark"), (4L, "filter"))
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
      val streamed = spark.table("topterms_out")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val batch = graft.ops.TextOps.topTermsOn(
          (batch1 ++ batch2).toDF("doc_id", "text"), k = 100)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed == batch, s"streamed $streamed vs batch $batch")
      assert(streamed == Set(
        ("spark", 3L, 2L), ("scan", 3L, 2L), ("join", 2L, 2L), ("filter", 2L, 2L)))
    } finally q.stop()
  }

  test("streaming ingest: dispatch + enrichment on a memory stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val ctx = Seq((7L, "John Doe")).toDF("user_id", "operator")
    val q = StreamingOps.ingest(mem.toDF().toDF("payload"), ctx)
      .writeStream.format("memory").queryName("ingest_out")
      .outputMode("append").start()
    try {
      mem.addData(
        """{"event_id":1,"node_id":"click","value":6.55,"ts_us":1704067200000000,"user_id":7}""",
        """{"event_id":2,"node_id":"status","value":true,"ts_us":1704067201000000,"user_id":7}""",
        """{"event_id":3,"node_id":"status","value":"Running","ts_us":1704067202000000,"user_id":7}""",
        """{"event_id":4,"node_id":"status","value":"123","ts_us":1704067203000000,"user_id":7}""",
        // non-ASCII string payload (raw UTF-8 on the wire): must survive
        // the dual-parse dispatch exactly — the variant-only path mangled
        // this to U+FFFD mojibake
        """{"event_id":5,"node_id":"status","value":"Störung µ-Förderer","ts_us":1704067204000000,"user_id":7}"""
      )
      q.processAllAvailable()
      val rows = spark.table("ingest_out")
        .select("event_id", "value_num", "value_str", "operator").collect()
        .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)), r.getString(3))).toSet
      assert(rows == Set(
        (1L, Some(6.55), None, "John Doe"),   // JSON number → value_num
        (2L, None, Some("True"), "John Doe"), // JSON bool → capitalized string
        (3L, None, Some("Running"), "John Doe"),
        // a JSON STRING that merely looks numeric stays value_str — the
        // reference dispatches on isinstance, not parseability
        (4L, None, Some("123"), "John Doe"),
        (5L, None, Some("Störung µ-Förderer"), "John Doe")
      ))
    } finally q.stop()
  }

  test("counter increment stream: reset-aware deltas survive micro-batch boundaries") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ev(id: Long, ts: String, v: Double) =
      MetricEvent(id, Timestamp.valueOf(ts), 1L, "ComponentsPlacedGood", v)
    val mem = MemoryStream[MetricEvent]
    val q = StreamingOps.counterIncrements(mem.toDS())
      .writeStream.format("memory").queryName("cinc_out")
      .outputMode("append").start()
    try {
      // batch 1: baseline 10.00, +2.50
      mem.addData(ev(1, "2024-01-01 00:00:01", 10.00), ev(2, "2024-01-01 00:00:02", 12.50))
      q.processAllAvailable()
      // batch 2: +0.50 ACROSS the batch boundary (state carries 12.50),
      // then a reset to 3.00 (counter restarted -> contributes 3.00)
      mem.addData(ev(3, "2024-01-01 00:00:03", 13.00), ev(4, "2024-01-01 00:00:04", 3.00))
      q.processAllAvailable()
      val got = spark.table("cinc_out").as[StreamingOps.CounterInc].collect()
        .map(c => c.event_id -> c.inc_cents).toMap
      assert(got == Map(2L -> 250L, 3L -> 50L, 4L -> 300L),
        s"got $got — baseline must emit nothing, delta must cross batches, reset must restart")
    } finally q.stop()
  }

  test("spc stream: fixed-limit rules fire across batch boundaries, runs carry state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val limits = Map("CycleTime" -> StreamingOps.SpcLimits(mean = 10.0, sd = 1.0))
    def ev(id: Long, ts: String, v: Double) =
      MetricEvent(id, Timestamp.valueOf(ts), 1L, "CycleTime", v)
    val mem = MemoryStream[MetricEvent]
    val q = StreamingOps.spcAlarms(mem.toDS(), limits, runLen = 3)
      .writeStream.format("memory").queryName("spc_out")
      .outputMode("append").start()
    try {
      // two above-mean points (run 1, 2) + one 3-sigma outlier below
      mem.addData(ev(1, "2024-01-01 00:00:01", 10.5), ev(2, "2024-01-01 00:00:02", 10.6),
        ev(3, "2024-01-01 00:00:03", 13.5))
      q.processAllAvailable()
      // the outlier was BELOW-side-breaking? no: 13.5 > mean -> run 3
      // continues above; next batch extends the above run to 4 and 5
      mem.addData(ev(4, "2024-01-01 00:00:04", 10.2), ev(5, "2024-01-01 00:00:05", 6.0))
      q.processAllAvailable()
      val got = spark.table("spc_out").as[StreamingOps.SpcAlarm].collect()
        .map(a => a.event_id -> (a.rule1_3sigma, a.rule4_run)).toMap
      // id 3: rule1 (|13.5-10|>3) AND completes the 3-run above the mean;
      // id 4: 4th consecutive above — run rule only, ACROSS the batch
      // boundary; id 5: 3-sigma below (|6-10|>3), run resets to 1
      assert(got == Map(3L -> ((true, true)), 4L -> ((false, true)), 5L -> ((true, false))),
        s"got $got")
    } finally q.stop()
  }

  test("time-weight stream: closed hourly buckets equal the batch operator across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // irregular samples, two metrics, split mid-bucket across micro-batches
    val samples = Seq(
      (1L, "2024-01-01 00:00:00", "rate", 10.00),
      (2L, "2024-01-01 00:20:00", "rate", 20.00),
      (3L, "2024-01-01 00:45:00", "rate", 40.00),   // hour 0: 10×20m + 20×25m + 40×15m
      (4L, "2024-01-01 01:30:00", "rate", 50.00),   // closes rate hour 0; hour 1 stays open
      (5L, "2024-01-01 00:10:00", "temp", -7.85),
      (6L, "2024-01-01 02:05:00", "temp", -6.25),   // closes temp hour 0 (one sample, full-hour weight)
      (7L, "2024-01-01 02:40:00", "temp", -6.00))
    def ev(t: (Long, String, String, Double)) =
      MetricEvent(t._1, Timestamp.valueOf(t._2), 1L, t._3, t._4)
    val mem = MemoryStream[MetricEvent]
    val q = StreamingOps.timeWeightStream(mem.toDS())
      .writeStream.format("memory").queryName("tw_out")
      .outputMode("append").start()
    try {
      // bucket-closing sample arrives in a LATER micro-batch than the
      // bucket's own samples — the running sums must carry through state
      mem.addData(samples.take(3).map(ev): _*)
      q.processAllAvailable()
      mem.addData(samples.slice(3, 5).map(ev): _*)
      q.processAllAvailable()
      mem.addData(samples.drop(5).map(ev): _*)
      q.processAllAvailable()
      val got = spark.table("tw_out").as[StreamingOps.TwRow].collect()
        .map(r => (r.metric, r.bucket.toString, r.twa, r.n_samples)).toSet
      // batch recompute over the same rows; the stream emits exactly the
      // CLOSED buckets — everything but each metric's last (open) bucket
      val batch = graft.ops.RelationalOps.timeWeightOn(
        samples.toDF("event_id", "ts_s", "metric", "value")
          .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s"))
      val open = Set(("rate", "2024-01-01 01:00:00.0"), ("temp", "2024-01-01 02:00:00.0"))
      val expect = batch.collect()
        .map(r => (r.getString(0), r.getTimestamp(1).toString, r.getDouble(2), r.getLong(3)))
        .filterNot(r => open(r._1, r._2)).toSet
      assert(expect.nonEmpty && got == expect, s"stream $got vs batch $expect")
      // spot-check the arithmetic really is time-weighted, not a plain avg
      assert(got.contains(("rate", "2024-01-01 00:00:00.0", 21.6667, 3L)))
    } finally q.stop()
  }

  test("percentile stream: closed hourly buckets match an independent rank replay across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // two metrics; hour 0 has duplicates and ties, split across batches
    val samples = Seq(
      (1L, "2024-01-01 00:05:00", "rate", 10.00),
      (2L, "2024-01-01 00:10:00", "rate", 30.00),
      (3L, "2024-01-01 00:20:00", "rate", 20.00),
      (4L, "2024-01-01 00:30:00", "rate", 30.00), // duplicate value
      (5L, "2024-01-01 00:40:00", "rate", 40.00),
      (6L, "2024-01-01 01:10:00", "rate", 99.00), // closes rate hour 0
      (7L, "2024-01-01 00:15:00", "temp", -7.85),
      (8L, "2024-01-01 02:05:00", "temp", -6.25)) // closes temp hour 0 (n=1)
    def ev(t: (Long, String, String, Double)) =
      MetricEvent(t._1, Timestamp.valueOf(t._2), 1L, t._3, t._4)
    val mem = MemoryStream[MetricEvent]
    val q = StreamingOps.percentilesStream(mem.toDS())
      .writeStream.format("memory").queryName("pct_out")
      .outputMode("append").start()
    try {
      // the bucket's samples and its closing sample arrive in different
      // micro-batches — the value-count map must carry through state
      mem.addData(samples.take(4).map(ev): _*)
      q.processAllAvailable()
      mem.addData(samples.slice(4, 6).map(ev): _*)
      q.processAllAvailable()
      mem.addData(samples.drop(6).map(ev): _*)
      q.processAllAvailable()
      val got = spark.table("pct_out").as[StreamingOps.PctRow].collect()
        .map(r => (r.metric, r.bucket.toString, r.p_permille, r.p_value, r.n_samples))
        .toSet
      // independent replay: the batch operator's rank rule applied per
      // closed (metric, hour) directly to the sorted sample multiset
      def replay(metric: String, bucket: String, vs: Seq[Double]) = {
        val sorted = vs.sorted
        graft.ops.RelationalOps.PercentilesPerMille.map { pm =>
          val target = math.max(1L, (vs.length.toLong * pm + 999L) / 1000L)
          (metric, bucket, pm, sorted((target - 1).toInt), vs.length.toLong)
        }
      }
      val expect = (
        replay("rate", "2024-01-01 00:00:00.0", Seq(10.0, 30.0, 20.0, 30.0, 40.0)) ++
        replay("temp", "2024-01-01 00:00:00.0", Seq(-7.85))).toSet
      assert(got == expect, s"stream $got vs replay $expect")
      // ranks land on real samples: p50 of the 5-sample hour is the 3rd
      // ascending value (30.0), p99 the 5th (40.0)
      assert(got.contains(("rate", "2024-01-01 00:00:00.0", 500, 30.0, 5L)))
      assert(got.contains(("rate", "2024-01-01 00:00:00.0", 990, 40.0, 5L)))
    } finally q.stop()
  }

  test("locf gap-fill stream: closed minutes + carried gaps equal the batch operator") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val samples = Seq(
      (1L, "2024-01-01 00:00:10", "m", 10.00),
      (2L, "2024-01-01 00:00:40", "m", 20.00),   // minute 0: avg 15.0, n=2
      (3L, "2024-01-01 00:03:05", "m", 30.00),   // closes minute 0 → gaps 00:01, 00:02 carry 15.0
      (4L, "2024-01-01 00:03:50", "m", 50.00),   // minute 3: avg 40.0, n=2
      (5L, "2024-01-01 00:05:30", "m", 7.77))    // closes minute 3 → gap 00:04; minute 5 open
    def ev(t: (Long, String, String, Double)) =
      MetricEvent(t._1, Timestamp.valueOf(t._2), 1L, t._3, t._4)
    val mem = MemoryStream[MetricEvent]
    val q = StreamingOps.gapfillLocfStream(mem.toDS())
      .writeStream.format("memory").queryName("locf_out")
      .outputMode("append").start()
    try {
      // the minute-0 close arrives two micro-batches after its samples
      mem.addData(samples.take(2).map(ev): _*)
      q.processAllAvailable()
      mem.addData(samples.slice(2, 4).map(ev): _*)
      q.processAllAvailable()
      mem.addData(samples.drop(4).map(ev): _*)
      q.processAllAvailable()
      val got = spark.table("locf_out").as[StreamingOps.LocfRow].collect()
        .map(r => (r.metric, r.bucket.toString, r.avg_value, r.locf_value, r.is_gap, r.sample_count))
        .toSet
      val batch = graft.ops.RelationalOps.gapfillLocfOn(
        samples.toDF("event_id", "ts_s", "metric", "value")
          .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s"))
      // the stream emits exactly the CLOSED minutes: everything before
      // each metric's last observed bucket (minute 5 is still open)
      val expect = batch.collect()
        .map(r => (r.getString(0), r.getTimestamp(1).toString,
          Option(r.get(2)).map(_.asInstanceOf[Double]), r.getDouble(3), r.getBoolean(4), r.getLong(5)))
        .filterNot(_._2 == "2024-01-01 00:05:00.0").toSet
      assert(expect.size == 5 && got == expect, s"stream $got vs batch $expect")
      // the carry really crosses the gap: minute 4 carries minute 3's avg
      assert(got.contains(("m", "2024-01-01 00:04:00.0", None, 40.0, true, 0L)))
    } finally q.stop()
  }

  test("locf gap-fill stream: a corrupt far-future timestamp cannot explode the fill (bounded per gap)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // one wild jump: 90 days forward (e.g. a nanoseconds-for-micros
    // timestamp) — unbounded fill would materialize ~129k rows per such
    // event and burn the poisoned bucket into the state store
    val base = Timestamp.valueOf("2024-01-01 00:00:10")
    val wild = new Timestamp(base.getTime + 90L * 24 * 3600 * 1000)
    val after = new Timestamp(wild.getTime + 2L * 60 * 1000)
    val mem = MemoryStream[MetricEvent]
    val q = StreamingOps.gapfillLocfStream(mem.toDS())
      .writeStream.format("memory").queryName("locf_capped")
      .outputMode("append").start()
    try {
      mem.addData(MetricEvent(1L, base, 1L, "m", 10.00))
      q.processAllAvailable()
      mem.addData(MetricEvent(2L, wild, 1L, "m", 20.00))
      q.processAllAvailable()
      mem.addData(MetricEvent(3L, after, 1L, "m", 30.00))
      q.processAllAvailable()
      assert(q.isActive)
      val got = spark.table("locf_capped").as[StreamingOps.LocfRow].collect()
      // the wild gap fills exactly the bound, not the full 129,600 minutes
      val wildGaps = got.count(r => r.is_gap && r.bucket.before(wild))
      assert(wildGaps == StreamingOps.MaxGapFillMinutes.toInt,
        s"expected capped fill, got $wildGaps gap rows")
      // real observations are never dropped: both closed minutes emitted
      assert(got.exists(r => !r.is_gap && r.avg_value.contains(10.0)))
      assert(got.exists(r => !r.is_gap && r.avg_value.contains(20.0)))
      // the small trailing gap still fills normally (1 minute between
      // the wild bucket and the closing observation)
      assert(got.count(r => r.is_gap && !r.bucket.before(wild)) == 1)
    } finally q.stop()
  }

  test("interp gap-fill stream: a corrupt far-future timestamp cannot explode the fill (bounded per gap)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // same bound as the locf twin — the interp segment needs BOTH
    // endpoints, so the wild segment emits when its right endpoint
    // closes; the fill inside it must still cap
    val base = Timestamp.valueOf("2024-01-01 00:00:10")
    val wild = new Timestamp(base.getTime + 90L * 24 * 3600 * 1000)
    val after = new Timestamp(wild.getTime + 2L * 60 * 1000)
    val mem = MemoryStream[MetricEvent]
    val q = StreamingOps.gapfillInterpStream(mem.toDS())
      .writeStream.format("memory").queryName("interp_capped")
      .outputMode("append").start()
    try {
      mem.addData(MetricEvent(1L, base, 1L, "m", 10.00))
      q.processAllAvailable()
      mem.addData(MetricEvent(2L, wild, 1L, "m", 20.00))
      q.processAllAvailable()
      mem.addData(MetricEvent(3L, after, 1L, "m", 30.00))
      q.processAllAvailable()
      assert(q.isActive)
      val got = spark.table("interp_capped").as[StreamingOps.InterpRow].collect()
      val wildGaps = got.count(r => r.is_gap && r.bucket.before(wild))
      assert(wildGaps == StreamingOps.MaxGapFillMinutes.toInt,
        s"expected capped fill, got $wildGaps gap rows")
      // both observed endpoints emitted exactly
      assert(got.exists(r => !r.is_gap && r.avg_value.contains(10.0)))
      assert(got.exists(r => !r.is_gap && r.avg_value.contains(20.0)))
    } finally q.stop()
  }

  test("interp gap-fill stream: segments emit when the right endpoint closes, equal batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val samples = Seq(
      (1L, "2024-01-01 00:00:10", "m", 10.00),
      (2L, "2024-01-01 00:00:40", "m", 20.00),   // minute 0: avg 15.0
      (3L, "2024-01-01 00:03:05", "m", 45.00),   // minute 3 opens (gaps 1,2 pending its close)
      (4L, "2024-01-01 00:04:30", "m", 50.00),   // closes minute 3 → segment 0→3 emits (15→45 interp)
      (5L, "2024-01-01 00:06:00", "m", 7.77))    // closes minute 4 → segment 3→4 emits; minute 6 open
    def ev(t: (Long, String, String, Double)) =
      MetricEvent(t._1, Timestamp.valueOf(t._2), 1L, t._3, t._4)
    val mem = MemoryStream[MetricEvent]
    val q = StreamingOps.gapfillInterpStream(mem.toDS())
      .writeStream.format("memory").queryName("interp_out")
      .outputMode("append").start()
    try {
      mem.addData(samples.take(3).map(ev): _*)
      q.processAllAvailable()
      mem.addData(samples.slice(3, 4).map(ev): _*)
      q.processAllAvailable()
      mem.addData(samples.drop(4).map(ev): _*)
      q.processAllAvailable()
      val got = spark.table("interp_out").as[StreamingOps.InterpRow].collect()
        .map(r => (r.metric, r.bucket.toString, r.avg_value, r.interp_value, r.is_gap)).toSet
      val batch = graft.ops.RelationalOps.gapfillInterpOn(
        samples.toDF("event_id", "ts_s", "metric", "value")
          .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s"))
      // the stream has emitted every segment whose right endpoint is
      // CLOSED: everything before minute 4's observed row... minute 4
      // closed when the 00:06 sample arrived, so only the open minute 6
      // row and the 00:05 gap (needs minute 6's final avg) are pending
      val pending = Set("2024-01-01 00:05:00.0", "2024-01-01 00:06:00.0")
      val expect = batch.collect()
        .map(r => (r.getString(0), r.getTimestamp(1).toString,
          Option(r.get(2)).map(_.asInstanceOf[Double]), r.getDouble(3), r.getBoolean(4)))
        .filterNot(r => pending(r._2)).toSet
      assert(expect.size == 5 && got == expect, s"stream $got vs batch $expect")
      // linear blend across the 3-minute gap: minute 1 = 15 + (45-15)*(1/3)
      assert(got.contains(("m", "2024-01-01 00:01:00.0", None, 25.0, true)))
      assert(got.contains(("m", "2024-01-01 00:02:00.0", None, 35.0, true)))
    } finally q.stop()
  }

  test("asof stream: errors enrich with the latest prior click across batches, equal batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import StreamingOps.AsofEvent
    val events = Seq(
      AsofEvent(1L, ts("2024-01-01 00:00:01"), 7L, "click", 1.5),
      AsofEvent(2L, ts("2024-01-01 00:00:05"), 7L, "error", 99.0),  // → click 1
      AsofEvent(3L, ts("2024-01-01 00:00:02"), 8L, "error", 50.0),  // no prior click: drops
      AsofEvent(4L, ts("2024-01-01 00:00:10"), 7L, "click", 2.5),
      AsofEvent(5L, ts("2024-01-01 00:00:10"), 7L, "error", 98.0),  // same instant → click 4 (inclusive)
      AsofEvent(6L, ts("2024-01-01 00:00:20"), 8L, "click", 9.0),
      AsofEvent(7L, ts("2024-01-01 00:00:30"), 8L, "error", 97.0))  // click carried ACROSS batches
    val mem = MemoryStream[AsofEvent]
    val q = StreamingOps.asofStream(mem.toDS())
      .writeStream.format("memory").queryName("asof_out")
      .outputMode("append").start()
    try {
      mem.addData(events.take(5): _*)
      q.processAllAvailable()
      mem.addData(events.slice(5, 6): _*)
      q.processAllAvailable()
      mem.addData(events.drop(6): _*)
      q.processAllAvailable()
      val got = spark.table("asof_out").as[StreamingOps.AsofRow].collect()
        .map(r => (r.event_id, r.user_id, r.ts.toString, r.value, r.click_ts.toString, r.click_value))
        .toSet
      // the as-of lookup needs only the past, so the stream emits the
      // batch result EXACTLY — no closed-bucket exclusions
      val batch = graft.ops.RelationalOps.asofJoinOn(
        events.toDF().select(col("event_id"), col("user_id"), col("ts"),
          col("event_type"), col("value")))
      val expect = batch.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).toString,
          r.getDouble(3), r.getTimestamp(4).toString, r.getDouble(5))).toSet
      assert(expect.size == 3 && got == expect, s"stream $got vs batch $expect")
    } finally q.stop()
  }

  test("cleanse stream: quality gate + chunking equals batch under micro-batch splits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // one doc per gate outcome: pass (distinct words + stopwords, long
    // enough to chunk twice), fail-short, fail-repetitive
    val pass = (1 to 40).map(i => f"word$i%02d").mkString(" ") + " the a the a"
    val docs = Seq(
      (1L, pass),
      (2L, "tiny doc the a"), // 4 tokens < MinTokens
      (3L, Seq.fill(30)("dup").mkString(" ") + " the a") // dup_word_frac ≈ 0.9
    )
    val mem = MemoryStream[(Long, String)]
    val q = StreamingOps.cleanseStream(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("cleanse_out")
      .outputMode("append").start()
    try {
      mem.addData(docs(0))
      q.processAllAvailable()
      mem.addData(docs(1), docs(2)) // second micro-batch
      q.processAllAvailable()
      val streamed = spark.table("cleanse_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
        .toSet
      val batch = StreamingOps.cleanseStream(docs.toDF("doc_id", "text")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
        .toSet
      assert(streamed == batch, s"streamed $streamed vs batch $batch")
      // only the passing doc survives the gate; its ~280 chars chunk twice
      assert(streamed.map(_._1) == Set(1L), s"gate verdicts wrong: $streamed")
      assert(streamed.size == 2, s"expected 2 chunks: $streamed")
    } finally q.stop()
  }

  test("scrub stream: stateless redaction equals batch and masks the payload") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Seq((1L, 7L, "click"), (2L, 12345L, "error"))
    val mem = MemoryStream[(Long, Long, String)]
    val q = StreamingOps.scrubStream(
        mem.toDF().toDF("event_id", "user_id", "event_type"))
      .writeStream.format("memory").queryName("scrub_out")
      .outputMode("append").start()
    try {
      mem.addData(events(0))
      q.processAllAvailable()
      mem.addData(events(1))
      q.processAllAvailable()
      val streamed = spark.table("scrub_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
        .toSet
      val batch = graft.ops.CleanOps.piiRedactOn(
          events.toDF("event_id", "user_id", "event_type")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
        .toSet
      assert(streamed == batch, s"streamed $streamed vs batch $batch")
      val byId = streamed.map(t => t._1 -> t).toMap
      // the line wraps the address in literal angle brackets, so the
      // masked form keeps them: <<EMAIL>>
      assert(byId(1L)._5 == "user 7 <<EMAIL>> from <IP> did click", byId(1L).toString)
      assert(byId(2L)._5 == "user <NUM> <<EMAIL>> from <IP> did error", byId(2L).toString)
    } finally q.stop()
  }

  test("OHLC stream: closed hourly candlesticks equal the batch operator across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // two metrics; hour 0's open/high/low/close all differ, and the bucket
    // is split mid-hour across micro-batches so every component of the
    // candle must carry through state before the closing sample arrives
    val samples = Seq(
      (1L, "2024-01-01 00:05:00", "rate", 20.00),   // open
      (2L, "2024-01-01 00:20:00", "rate", 45.00),   // high
      (3L, "2024-01-01 00:35:00", "rate", 5.00),    // low
      (4L, "2024-01-01 00:50:00", "rate", 30.00),   // close
      (5L, "2024-01-01 01:30:00", "rate", 50.00),   // closes rate hour 0; hour 1 open
      (6L, "2024-01-01 00:10:00", "temp", -7.85),
      (7L, "2024-01-01 02:05:00", "temp", -6.25))   // closes temp hour 0 (n=1 candle)
    def ev(t: (Long, String, String, Double)) =
      MetricEvent(t._1, Timestamp.valueOf(t._2), 1L, t._3, t._4)
    val mem = MemoryStream[MetricEvent]
    val q = StreamingOps.ohlcStream(mem.toDS())
      .writeStream.format("memory").queryName("ohlc_out")
      .outputMode("append").start()
    try {
      mem.addData(samples.take(2).map(ev): _*)
      q.processAllAvailable()
      mem.addData(samples.slice(2, 5).map(ev): _*)
      q.processAllAvailable()
      mem.addData(samples.drop(5).map(ev): _*)
      q.processAllAvailable()
      val got = spark.table("ohlc_out").as[StreamingOps.OhlcRow].collect()
        .map(r => (r.metric, r.bucket.toString, r.open_v, r.high_v, r.low_v,
          r.close_v, r.n_samples)).toSet
      // batch recompute over the same rows; the stream emits exactly the
      // CLOSED buckets — everything but each metric's last (open) bucket
      val batch = graft.ops.DownsampleOps.downsampleOhlcOn(
        samples.toDF("event_id", "ts_s", "event_type", "value")
          .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s"))
      val open = Set(("rate", "2024-01-01 01:00:00.0"), ("temp", "2024-01-01 02:00:00.0"))
      val expect = batch.collect()
        .map(r => (r.getString(0), r.getTimestamp(1).toString, r.getDouble(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6)))
        .filterNot(r => open(r._1, r._2)).toSet
      assert(expect.nonEmpty && got == expect, s"stream $got vs batch $expect")
      // the candle is order-sensitive at both ends: open ≠ low, close ≠ high
      assert(got.contains(("rate", "2024-01-01 00:00:00.0", 20.0, 45.0, 5.0, 30.0, 4L)))
    } finally q.stop()
  }

  test("heartbeat stream: interruption fires on late arrival, count equals batch column") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // m: 2-min gap (fine), 10-min gap straddling a BATCH BOUNDARY (one
    // interruption — last-ts state must carry), then fine again; lone
    // metric never gaps
    val samples = Seq(
      (1L, "2024-01-01 00:00:00", "m"),
      (2L, "2024-01-01 00:02:00", "m"),
      (3L, "2024-01-01 00:12:00", "m"),
      (4L, "2024-01-01 00:14:00", "m"),
      (5L, "2024-01-01 00:01:00", "lone"))
    def ev(t: (Long, String, String)) =
      MetricEvent(t._1, Timestamp.valueOf(t._2), 1L, t._3, 1.0)
    val mem = MemoryStream[MetricEvent]
    val q = StreamingOps.heartbeatStream(mem.toDS())
      .writeStream.format("memory").queryName("hb_out")
      .outputMode("append").start()
    try {
      mem.addData(samples.take(2).map(ev): _*)
      q.processAllAvailable()
      assert(spark.table("hb_out").isEmpty, "2-min gap must not alert")
      mem.addData(samples.drop(2).map(ev): _*)
      q.processAllAvailable()
      val got = spark.table("hb_out").as[StreamingOps.Interruption].collect()
      assert(got.toSeq === Seq(StreamingOps.Interruption(
        "m", Timestamp.valueOf("2024-01-01 00:02:00"), 10L * 60 * 1000000)),
        got.mkString(","))
      // the alert count is the batch operator's interruptions column
      val batch = graft.ops.SessionOps.uptimeOn(
        samples.map(t => (t._1, t._2, 1L, t._3, 1.0, "")).toDF(
          "event_id", "ts_s", "user_id", "event_type", "value", "props")
          .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s"))
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
      assert(batch === Map("m" -> 1L, "lone" -> 0L))
      assert(got.count(_.metric == "m") === batch("m"))
    } finally q.stop()
  }

  test("LTTB stream == batch under random in-order micro-batch splits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // randomized but seeded: 3 metrics × ~120 in-order samples with random
    // gaps (some inside a bucket, some skipping buckets entirely), split at
    // random batch boundaries — every anchored bucket's selection must
    // equal the batch operator's
    val rnd = new scala.util.Random(47)
    var id = 0L
    val samples = (0 until 3).flatMap { m =>
      var tUs = Timestamp.valueOf("2024-01-01 00:00:00").getTime * 1000
      (0 until 120).map { _ =>
        tUs += (1L + rnd.nextInt(5000)) * 1000000L // 1 s .. ~83 min steps
        id += 1
        (id, tUs, s"m$m", math.floor(rnd.nextDouble() * 10000) / 100.0)
      }
    }
    def ev(t: (Long, Long, String, Double)) = {
      val ts = new Timestamp(t._2 / 1000)
      MetricEvent(t._1, ts, 1L, t._3, t._4)
    }
    val mem = MemoryStream[MetricEvent]
    val q = StreamingOps.lttbStream(mem.toDS())
      .writeStream.format("memory").queryName("lttb_rand_out")
      .outputMode("append").start()
    try {
      // interleave metrics but keep each metric's own order (the family's
      // ordered-per-key transport assumption)
      var rest = samples.groupBy(_._3).values.toSeq.map(_.toList)
      while (rest.exists(_.nonEmpty)) {
        val ks = rest.map(s => math.min(s.length, 1 + rnd.nextInt(40)))
        val batch = rest.zip(ks).flatMap { case (s, k) => s.take(k) }
        rest = rest.zip(ks).map { case (s, k) => s.drop(k) }
        if (batch.nonEmpty) { mem.addData(batch.map(ev): _*); q.processAllAvailable() }
      }
      val got = spark.table("lttb_rand_out").as[StreamingOps.LttbRow].collect()
        .map(r => (r.metric, r.bucket.toString, r.ts.toString, r.sel_value)).toSet
      val batchDf = graft.ops.DownsampleOps.downsampleLttbOn(
        samples.toDF("event_id", "ts_us", "event_type", "value")
          .withColumn("ts", expr("timestamp_micros(ts_us)")).drop("ts_us"))
      val all = batchDf.collect()
        .map(r => (r.getString(0), r.getTimestamp(1).toString,
          r.getTimestamp(2).toString, r.getDouble(3)))
      // unanchored tail per metric: the open bucket always; the pending one
      // too unless it is the metric's first (which emitted at its close)
      val expect = all.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        val sorted = rows.toSeq.sortBy(_._2)
        val drop = if (sorted.length <= 2) 1 else 2
        sorted.dropRight(drop)
      }.toSet
      assert(expect.nonEmpty && got == expect,
        s"missing ${expect -- got}; extra ${got -- expect}")
    } finally q.stop()
  }

  test("stateAgg stream == batch under random in-order micro-batch splits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // seeded random walk: 5 users × 60 state transitions at random µs-level
    // steps, split at random batch boundaries. The streamed closures must
    // reproduce the batch operator's per-state totals exactly (total_us =
    // sum of streamed dwells; n_entries = closed + open states).
    val states = Vector("idle", "busy", "blocked", "maint")
    val rnd = new scala.util.Random(31)
    var id = 0L
    val samples = (1 to 5).flatMap { u =>
      var tUs = Timestamp.valueOf("2024-01-01 00:00:00").getTime * 1000
      (0 until 60).map { _ =>
        tUs += 1L + rnd.nextInt(9000000) // 1 µs .. 9 s steps
        id += 1
        (id, tUs, u.toLong, states(rnd.nextInt(states.length)))
      }
    }
    def tsOf(us: Long): Timestamp = { // full-µs Timestamp (memory note: ms ctor drops sub-ms)
      val t = new Timestamp(java.lang.Math.floorDiv(us, 1000L))
      t.setNanos((java.lang.Math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    }
    def ev(t: (Long, Long, Long, String)) =
      StreamingOps.MetricEvent(t._1, tsOf(t._2), t._3, t._4, 1.0)
    val mem = MemoryStream[StreamingOps.MetricEvent]
    val q = StreamingOps.stateAggStream(mem.toDS())
      .writeStream.format("memory").queryName("state_out")
      .outputMode("append").start()
    try {
      var rest = samples.groupBy(_._3).values.toSeq.map(_.toList)
      while (rest.exists(_.nonEmpty)) {
        val ks = rest.map(s => math.min(s.length, 1 + rnd.nextInt(25)))
        val batch = rest.zip(ks).flatMap { case (s, k) => s.take(k) }
        rest = rest.zip(ks).map { case (s, k) => s.drop(k) }
        if (batch.nonEmpty) { mem.addData(batch.map(ev): _*); q.processAllAvailable() }
      }
      val dwells = spark.table("state_out").as[StreamingOps.StateDwell].collect()
      // recompute the batch operator over the full event set
      val batchRows = graft.ops.SessionOps.stateAggOn(
        samples.toDF("event_id", "ts_us", "user_id", "event_type")
          .withColumn("ts", expr("timestamp_micros(ts_us)")).drop("ts_us"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      // each user's final (open) state closes nothing but counts an entry
      val open = samples.groupBy(_._3).values.map(_.maxBy(s => (s._2, s._1))._4)
        .groupBy(identity).map { case (s, xs) => s -> xs.size.toLong }
      val streamTotals = dwells.groupBy(_.state).map { case (s, rs) =>
        s -> (rs.map(_.dwell_us).sum, rs.length.toLong + open.getOrElse(s, 0L))
      }
      // every state the batch sees with nonzero entries must reconcile
      assert(batchRows.keySet === (streamTotals.keySet ++ open.keySet))
      batchRows.foreach { case (s, (total, n)) =>
        val (gotTotal, gotN) = streamTotals.getOrElse(s, (0L, open.getOrElse(s, 0L)))
        assert(gotTotal === total, s"state $s total dwell")
        assert(gotN === n, s"state $s entry count")
      }
      // dwells are per-µs exact and non-negative by construction
      assert(dwells.forall(_.dwell_us >= 0L))
    } finally q.stop()
  }

  test("funnel stream == batch under random in-order micro-batch splits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // seeded random event walk over the three funnel stages + noise types,
    // split at random batch boundaries; the streamed stage advances must
    // equal the batch operator's per-stage user counts, and same-instant
    // events must not advance (strict >)
    val stages = graft.ops.SessionOps.FunnelStages
    val types = stages ++ Seq("view", "error")
    val rnd = new scala.util.Random(53)
    var id = 0L
    val samples = (1 to 40).flatMap { u =>
      var tUs = Timestamp.valueOf("2024-01-01 00:00:00").getTime * 1000
      (0 until 15).map { _ =>
        tUs += rnd.nextInt(3) * 500000L // 0 steps make same-instant ties
        id += 1
        (id, tUs, u.toLong, types(rnd.nextInt(types.length)))
      }
    }
    def tsOf(us: Long): Timestamp = {
      val t = new Timestamp(java.lang.Math.floorDiv(us, 1000L))
      t.setNanos((java.lang.Math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    }
    def ev(t: (Long, Long, Long, String)) =
      StreamingOps.MetricEvent(t._1, tsOf(t._2), t._3, t._4, 1.0)
    val mem = MemoryStream[StreamingOps.MetricEvent]
    val q = StreamingOps.funnelStream(mem.toDS())
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode("append").start()
    try {
      var rest = samples.groupBy(_._3).values.toSeq.map(_.toList)
      while (rest.exists(_.nonEmpty)) {
        val ks = rest.map(s => math.min(s.length, 1 + rnd.nextInt(8)))
        val batch = rest.zip(ks).flatMap { case (s, k) => s.take(k) }
        rest = rest.zip(ks).map { case (s, k) => s.drop(k) }
        if (batch.nonEmpty) { mem.addData(batch.map(ev): _*); q.processAllAvailable() }
      }
      val adv = spark.table("funnel_out").as[StreamingOps.StageAdvance].collect()
      // a user advances each stage at most once
      assert(adv.groupBy(a => (a.user_id, a.stage)).forall(_._2.length == 1))
      // independent plain-Scala recompute of the strict-order chain
      val expect = samples.groupBy(_._3).map { case (u, evs) =>
        val firsts = Array.fill(stages.size)(Long.MinValue)
        evs.sortBy(e => (e._2, e._1)).foreach { e =>
          val i = stages.indexOf(e._4)
          if (i >= 0 && firsts(i) == Long.MinValue &&
              (i == 0 || (firsts(i - 1) != Long.MinValue && e._2 > firsts(i - 1))))
            firsts(i) = e._2
        }
        u -> firsts.toSeq
      }
      val gotFirsts = adv.groupBy(_.user_id).map { case (u, as) =>
        u -> stages.indices.map(i => as.find(_.stage == i + 1)
          .map(a => a.at.getTime * 1000 + a.at.getNanos / 1000 % 1000)
          .getOrElse(Long.MinValue))
      }
      expect.foreach { case (u, fs) =>
        assert(gotFirsts.getOrElse(u, stages.map(_ => Long.MinValue)) === fs, s"user $u")
      }
      // and the registered batch operator's counts equal the advance counts
      val batchCounts = graft.ops.SessionOps.funnelOn(
        samples.toDF("event_id", "ts_us", "user_id", "event_type")
          .withColumn("ts", expr("timestamp_micros(ts_us)")).drop("ts_us"),
        stages).collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
      stages.indices.foreach { i =>
        assert(adv.count(_.stage == i + 1).toLong === batchCounts(i + 1), s"stage ${i + 1}")
      }
    } finally q.stop()
  }

  test("distinct stream: running per-metric cardinality, emits only on growth") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[MetricEvent]
    val q = StreamingOps.distinctStream(mem.toDS())
      .writeStream.format("memory").queryName("dist_out")
      .outputMode("append").start()
    def ev(id: Long, m: String, u: Long) =
      MetricEvent(id, Timestamp.valueOf("2024-01-01 00:00:00"), u, m, 1.0)
    try {
      mem.addData(ev(1, "click", 7), ev(2, "click", 8), ev(3, "view", 7))
      q.processAllAvailable()
      // duplicates only — no growth, batch must emit NOTHING for click
      mem.addData(ev(4, "click", 7), ev(5, "click", 8))
      q.processAllAvailable()
      val afterDup = spark.table("dist_out").as[StreamingOps.DistinctRow].collect()
      assert(afterDup.toSet === Set(StreamingOps.DistinctRow("click", 2L),
        StreamingOps.DistinctRow("view", 1L)), afterDup.mkString(","))
      // growth across the batch boundary: set state carried, count exact
      mem.addData(ev(6, "click", 9), ev(7, "view", 8))
      q.processAllAvailable()
      val rows = spark.table("dist_out").as[StreamingOps.DistinctRow].collect()
      val latest = rows.groupBy(_.metric).map { case (m, rs) => m -> rs.map(_.n_users).max }
      // latest running count per metric == batch count_distinct over all rows
      assert(latest === Map("click" -> 3L, "view" -> 2L), rows.mkString(","))
      // per-metric emissions are strictly increasing (emit-on-growth)
      rows.groupBy(_.metric).values.foreach { rs =>
        val ns = rs.map(_.n_users).sorted
        assert(ns.distinct.length == ns.length, rs.mkString(","))
      }
    } finally q.stop()
  }

  test("LTTB stream: a bucket emits when its right-anchor bucket closes, equal to batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // metric m: four hourly buckets (0 emits at close via the first-bucket
    // rule; 1 emits only once 2 CLOSES — its right anchor; 2 pends, 3 open);
    // metric solo: two buckets (0 emits at close via the first rule, 1
    // open). Bucket 1's points and its anchors arrive in three different
    // micro-batches.
    val samples = Seq(
      (1L, "2024-01-01 00:10:00", "m", 5.0),
      (2L, "2024-01-01 00:50:00", "m", 9.0),
      (3L, "2024-01-01 01:15:00", "m", 2.0),
      (4L, "2024-01-01 01:30:00", "m", 20.0),
      (5L, "2024-01-01 01:45:00", "m", 3.0),
      (6L, "2024-01-01 02:20:00", "m", 7.0),
      (7L, "2024-01-01 02:40:00", "m", 1.0),
      (8L, "2024-01-01 03:05:00", "m", 4.0),
      (9L, "2024-01-01 05:10:00", "solo", 2.5),
      (10L, "2024-01-01 06:20:00", "solo", 6.5))
    def ev(t: (Long, String, String, Double)) =
      MetricEvent(t._1, Timestamp.valueOf(t._2), 1L, t._3, t._4)
    val mem = MemoryStream[MetricEvent]
    val q = StreamingOps.lttbStream(mem.toDS())
      .writeStream.format("memory").queryName("lttb_out")
      .outputMode("append").start()
    try {
      mem.addData(samples.take(3).map(ev): _*)
      q.processAllAvailable()
      val afterFirst = spark.table("lttb_out").as[StreamingOps.LttbRow].collect()
      // bucket m/0 closed in this batch and emits immediately (first rule);
      // nothing else can have emitted yet
      assert(afterFirst.map(r => (r.metric, r.bucket.toString)).toSet ===
        Set(("m", "2024-01-01 00:00:00.0")))
      mem.addData(samples.slice(3, 6).map(ev): _*)
      q.processAllAvailable()
      mem.addData(samples.drop(6).map(ev): _*)
      q.processAllAvailable()
      val got = spark.table("lttb_out").as[StreamingOps.LttbRow].collect()
        .map(r => (r.metric, r.bucket.toString, r.ts.toString, r.sel_value)).toSet
      val batch = graft.ops.DownsampleOps.downsampleLttbOn(
        samples.toDF("event_id", "ts_s", "event_type", "value")
          .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s"))
      // stream emits every batch row except the open bucket and any closed
      // bucket still pending its right anchor (the first bucket needs no
      // right anchor, so solo's 05 bucket DID emit)
      val unemitted = Set(
        ("m", "2024-01-01 02:00:00.0"), ("m", "2024-01-01 03:00:00.0"),
        ("solo", "2024-01-01 06:00:00.0"))
      val expect = batch.collect()
        .map(r => (r.getString(0), r.getTimestamp(1).toString,
          r.getTimestamp(2).toString, r.getDouble(3)))
        .filterNot(r => unemitted(r._1, r._2)).toSet
      assert(expect.nonEmpty && got == expect, s"stream $got vs batch $expect")
      // the mid-bucket selection used real anchors: the chosen point is the
      // area argmax (the 20.0 spike at 01:30), an INTERIOR point of its
      // bucket — neither the first nor the last sample
      assert(got.exists(r => r._1 == "m" && r._2 == "2024-01-01 01:00:00.0" && r._4 == 20.0),
        s"mid-bucket selection wrong: $got")
    } finally q.stop()
  }
}
