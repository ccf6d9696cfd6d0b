package graft

import graft.ops.{AlarmOps, SessionOps, TextOps}
import graft.streaming.StreamingOps
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
import org.apache.spark.sql.types._

import java.sql.Timestamp

/** Randomized property tests (fixed seeds — deterministic): each scenario is
  * one (user_id, metric) key, all scenarios union into a single DataFrame so
  * the operator under test runs once per property, not once per trial.
  *
  * The strongest property here is batch ≡ streaming ≡ reference-fold
  * equivalence for the stateful alarms: the batch window op, the
  * flatMapGroupsWithState twin (fed in randomly-split micro-batches through
  * TestGroupState), and a direct transliteration of the reference's state
  * machine (opcua_server/main.py:319-332, :14-40) must agree on every
  * random input.
  */
class PropertySpec extends SparkSuite {

  private val NTrials = 60

  private def propEventsDf(rows: Seq[(Long, Long, String, Long, Double)]) = {
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("ts", TimestampType),
      StructField("value", DoubleType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (e, u, m, t, v) => Row(e, u, m, new Timestamp(t * 1000L), v) }, 4),
      schema)
  }

  test("edge alarm: batch lag-window == reference state machine == streaming fold") {
    val rnd = new scala.util.Random(1234)
    val thr = 200.0
    // scenario per user: values around the threshold incl. exact hits
    val scenarios = (0 until NTrials).map { u =>
      val n = 1 + rnd.nextInt(12)
      u.toLong -> Seq.fill(n)(rnd.nextInt(5) match {
        case 0 => thr // exactly at threshold: must re-arm, not fire
        case 1 => 0.0
        case _ => rnd.nextDouble() * 400.0
      })
    }
    val rows = scenarios.flatMap { case (u, vs) =>
      vs.zipWithIndex.map { case (v, i) => ((u * 1000 + i), u, "click", i.toLong * 60, v) }
    }
    val batch = AlarmOps.edgeAlarmOn(propEventsDf(rows), thr)
      .collect().map(r => (r.getLong(1), r.getLong(0))).groupBy(_._1)
      .map { case (u, a) => u -> a.map(_._2).sorted.toSeq }

    scenarios.foreach { case (u, vs) =>
      // reference fold: opcua_server/main.py:319-332
      var below = false
      val expected = vs.zipWithIndex.flatMap { case (v, i) =>
        if (v < thr) {
          val fire = !below; below = true
          if (fire) Some(u * 1000 + i) else None
        } else { below = false; None }
      }
      assert(batch.getOrElse(u, Nil) == expected, s"batch vs fold for user $u values $vs")

      // streaming fold across random micro-batch splits
      var state = TestGroupState.create[StreamingOps.EdgeState](
        org.apache.spark.api.java.Optional.empty(), GroupStateTimeout.NoTimeout, 0L,
        org.apache.spark.api.java.Optional.empty[Long](), hasTimedOut = false)
      val events = vs.zipWithIndex.map { case (v, i) =>
        StreamingOps.MetricEvent(u * 1000 + i, new Timestamp(i * 60000L), u, "click", v)
      }
      val splits = events.grouped(1 + rnd.nextInt(events.size)).toSeq
      val streamed = splits.flatMap { chunk =>
        val out = StreamingOps.edgeFlatMap(thr)((u, "click"), chunk.iterator, state).toSeq
        state = TestGroupState.create[StreamingOps.EdgeState](
          org.apache.spark.api.java.Optional.fromNullable(if (state.exists) state.get else null),
          GroupStateTimeout.NoTimeout, 0L,
          org.apache.spark.api.java.Optional.empty[Long](), hasTimedOut = false)
        out.map(_.event_id)
      }
      assert(streamed == expected, s"streaming vs fold for user $u values $vs")
    }
  }

  test("trend alarm: batch window == reference ring buffer over random walks") {
    val rnd = new scala.util.Random(5678)
    val target = 250.0 // 'click'
    val scenarios = (0 until NTrials).map { u =>
      val n = 1 + rnd.nextInt(10)
      // range spans BOTH alarm thresholds (±15%): runs must cross the 2%
      // trend band AND the 10% immediate band, or the precedence rule
      // below is untestable
      u.toLong -> Seq.fill(n)(target * (1.0 + (rnd.nextDouble() - 0.5) * 0.30))
    }
    val rows = scenarios.flatMap { case (u, vs) =>
      vs.zipWithIndex.map { case (v, i) => ((u * 1000 + i), u, "click", i.toLong * 60, v) }
    }
    val batch = AlarmOps.deviationTrendOn(propEventsDf(rows))
      .collect().map(r => (r.getLong(1), r.getLong(0))).groupBy(_._1)
      .map { case (u, a) => u -> a.map(_._2).sorted.toSeq }
    scenarios.foreach { case (u, vs) =>
      // reference ring buffer: opcua_server/main.py:14-40
      var recent = List.empty[Double]
      val expected = vs.zipWithIndex.flatMap { case (v, i) =>
        val pct = (v - target) / target * 100.0
        recent = (recent :+ math.abs(pct)).takeRight(3)
        // immediate-alarm precedence (opcua_server/main.py:35-36): a >10%
        // cycle returns before the trend check — it feeds the buffer but
        // never emits a trend row itself
        if (recent.size == 3 && recent.forall(_ > 2.0) && math.abs(pct) <= 10.0)
          Some(u * 1000 + i)
        else None
      }
      assert(batch.getOrElse(u, Nil) == expected, s"user $u values $vs")
    }
  }

  test("sessionize: session boundaries match the gap fold; totals preserved") {
    val rnd = new scala.util.Random(91011)
    val gapSec = 30 * 60
    val scenarios = (0 until NTrials).map { u =>
      var t = 0L
      val n = 1 + rnd.nextInt(20)
      u.toLong -> Seq.fill(n) {
        t += rnd.nextInt(2 * gapSec).toLong + 1
        (t, rnd.nextDouble() * 10)
      }
    }
    val rows = scenarios.flatMap { case (u, evs) =>
      evs.zipWithIndex.map { case ((t, v), i) => ((u * 1000 + i), u, "click", t, v) }
    }
    val got = SessionOps.sessionizeOn(propEventsDf(rows)).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000, r.getLong(2)))
      .groupBy(_._1).map { case (u, a) => u -> a.map(x => (x._2, x._3)).sortBy(_._1).toSeq }
    scenarios.foreach { case (u, evs) =>
      // fold: new session when gap >= 30 min
      val expected = evs.foldLeft(List.empty[(Long, Long, Long)]) { // (start, lastTs, n)
        case (acc, (t, _)) => acc match {
          case (start, last, n) :: tail if t - last < gapSec => (start, t, n + 1) :: tail
          case _ => (t, t, 1L) :: acc
        }
      }.reverse.map { case (start, _, n) => (start, n) }
      assert(got.getOrElse(u, Nil) == expected, s"user $u events $evs")
    }
  }

  test("LSH top-k: multi-probe recall >= 0.9 vs exact on randomized embeddings") {
    import graft.ops.SimilarityOps
    // Randomized corpus (fixed seed) in the regime ANN serves: true near
    // neighbors of the query (small per-dim noise) buried in a large
    // random background. The hamming-1 probe ring tolerates one flipped
    // sign plane; noise at sd 0.15 against query dims >= 0.5 in magnitude
    // makes 2+ flips vanishingly rare, so recall should be ~1.0 — 0.9 is
    // the contract.
    val rnd = new scala.util.Random(42)
    val d = 64
    val k = 10
    // query: leading (bucketed) dims bounded away from the hyperplanes
    val q = Array.tabulate(d) { i =>
      val g = rnd.nextGaussian()
      if (i < 8) ((if (g >= 0) 0.5 else -0.5) + g).toFloat else g.toFloat
    }
    val neighbors = (1 to 20).map { id =>
      (id.toLong, 1, q.map(x => (x + 0.15 * rnd.nextGaussian()).toFloat))
    }
    val background = (21 to 2000).map { id =>
      (id.toLong, 2, Array.fill(d)(rnd.nextGaussian().toFloat))
    }
    val rows = Seq((0L, 0, q)) ++ neighbors ++ background
    import spark.implicits._
    val emb = rows.toDF("vec_id", "label", "embedding")
    val exact = SimilarityOps.simTopKOn(emb, k).collect().map(_.getLong(0)).toSet
    val lsh = SimilarityOps.simTopKLshOn(emb, k).collect().map(_.getLong(0)).toSet
    assert(exact.size == k)
    val recall = exact.intersect(lsh).size.toDouble / k
    assert(recall >= 0.9, s"LSH recall $recall below 0.9: exact=$exact lsh=$lsh")
  }

  test("minhash banding: exact precision, recall >= 0.95 vs brute-force Jaccard") {
    import graft.ops.DedupOps
    // Randomized corpus (fixed seed) with mutated twins whose token-mutation
    // rates straddle the 0.6 shingle-Jaccard threshold. With 64 bands of
    // r=2 and a pairwise-independent hash family, the false-negative odds
    // for a qualifying pair are (1-J^2)^64 <= (1-0.36)^64 ~ 4e-13 — recall
    // must be ~1.0. A degenerate (linearly-derived) family collapses that
    // bound to ~(1-J) ~ 0.4 per pair, which this test catches at ~15 true
    // pairs with odds ~1 - 0.6^15.
    val rnd = new scala.util.Random(77)
    val vocab = Vector.tabulate(500)(i => s"w$i")
    val bases = (0 until 80).map { i =>
      (i.toLong, Seq.fill(30 + rnd.nextInt(50))(vocab(rnd.nextInt(vocab.size))))
    }
    val twins = bases.take(60).map { case (id, toks) =>
      val rate = 0.02 + 0.3 * rnd.nextDouble()
      (1000L + id, toks.map(t => if (rnd.nextDouble() < rate) vocab(rnd.nextInt(vocab.size)) else t))
    }
    val all = (bases ++ twins).map { case (id, toks) => (id, toks.mkString(" ")) }
    // ground truth by brute force over the SAME shingle-hash sets the
    // operator verifies against (WordShingleHashes is A/B-tested above
    // against the SQL-composed pipeline, so this is not circular)
    def xs(text: String): Set[Long] = {
      val a = graft.functions.WordShingleHashes.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(text), 3)
      (0 until a.numElements()).map(a.getLong).toSet
    }
    val sets = all.map { case (id, t) => id -> xs(t) }.toMap
    val ids = all.map(_._1)
    val truth = (for {
      ai <- ids.indices.iterator
      bi <- (ai + 1 until ids.size).iterator
      si = sets(ids(ai)); sj = sets(ids(bi))
      if si.nonEmpty && sj.nonEmpty
      inter = (si & sj).size
      if inter.toDouble / (si.size + sj.size - inter) >= DedupOps.JaccardThreshold
    } yield (math.min(ids(ai), ids(bi)), math.max(ids(ai), ids(bi)))).toSet
    assert(truth.size >= 10, s"fixture degenerate: only ${truth.size} true pairs")
    import spark.implicits._
    val got = DedupOps.minhashPairsOn(all.toDF("doc_id", "text"))
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.catalog.clearCache()
    // the exact-Jaccard verify step makes precision exact by construction
    assert((got -- truth).isEmpty, s"false positives: ${got -- truth}")
    val recall = truth.intersect(got).size.toDouble / truth.size
    assert(recall >= 0.95, s"banding recall $recall; missed ${truth -- got}")
  }

  test("incremental dedup: randomized probes find their exact best base match") {
    import graft.ops.DedupOps
    // base corpus + probe twins with mutation rates straddling the 0.6
    // threshold; some probes mutate two DIFFERENT base docs' prefixes so
    // the best-match tie-break (jaccard DESC, base_id ASC) is exercised.
    // Ground truth: plain-Scala argmax over exact shingle-hash Jaccard
    // (WordShingleHashes is A/B-tested against SQL elsewhere).
    val rnd = new scala.util.Random(59)
    val vocab = Vector.tabulate(400)(i => s"w$i")
    val baseDocs = (0 until 60).map { i =>
      (i.toLong, Seq.fill(25 + rnd.nextInt(40))(vocab(rnd.nextInt(vocab.size))))
    }
    val probes = (0 until 80).map { k =>
      val (bid, toks) = baseDocs(rnd.nextInt(baseDocs.size))
      val rate = 0.02 + 0.35 * rnd.nextDouble()
      (2000L + k,
        toks.map(t => if (rnd.nextDouble() < rate) vocab(rnd.nextInt(vocab.size)) else t))
    }
    val all = baseDocs.map { case (id, t) => (id, t.mkString(" "), "src0") } ++
      probes.map { case (id, t) => (id, t.mkString(" "), "srcNew") }
    def xs(text: String): Set[Long] = {
      val a = graft.functions.WordShingleHashes.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(text), 3)
      (0 until a.numElements()).map(a.getLong).toSet
    }
    val baseSets = baseDocs.map { case (id, t) => id -> xs(t.mkString(" ")) }
    val expect = probes.flatMap { case (pid, t) =>
      val ps = xs(t.mkString(" "))
      val cands = baseSets.flatMap { case (bid, bs) =>
        val inter = (ps & bs).size
        val jac = inter.toDouble / (ps.size + bs.size - inter)
        if (jac >= DedupOps.JaccardThreshold) Some((bid, inter.toLong, jac)) else None
      }
      if (cands.isEmpty) None
      else {
        val best = cands.minBy { case (bid, _, jac) => (-jac, bid) }
        Some(pid -> ((best._1, best._2, math.floor(best._3 * 10000 + 0.5) / 10000)))
      }
    }.toMap
    assert(expect.size >= 20 && expect.size < probes.size,
      s"fixture degenerate: ${expect.size} of ${probes.size} probes match")
    import spark.implicits._
    val got = DedupOps.dedupIncrementalOn(all.toDF("doc_id", "text", "source"), "src0")
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // banding misses a qualifying pair with odds (1-J^2)^64 <= 4e-13 —
    // equality, not recall, is the assertion
    assert(got === expect)
  }

  test("source overlap: randomized corpora equal plain-Scala set algebra") {
    import graft.ops.DedupOps
    // random small-vocab docs across 6 sources so pair overlaps are dense;
    // includes sub-3-token docs (no shingles) and double-space runs. The
    // reference computes source shingle-sets with plain Scala collections
    // over the SAME per-doc hash sets (WordShingleHashes is A/B-tested
    // against the SQL pipeline elsewhere — not circular), then set algebra.
    val rnd = new scala.util.Random(31)
    // 8-word vocab keeps the trigram space at 512, so cross-source
    // shingle collisions are dense enough for every pair to overlap
    val vocab = Vector.tabulate(8)(i => s"t$i")
    val docs = (0 until 6).flatMap { s =>
      (0 until 15).map { d =>
        val n = 2 + rnd.nextInt(12) // 2 = below the shingle minimum
        val sep = if (rnd.nextBoolean()) " " else "  "
        (s * 100L + d, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(sep), s"s$s")
      }
    }
    def xs(text: String): Set[Long] = {
      val a = graft.functions.WordShingleHashes.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(text), 3)
      (0 until a.numElements()).map(a.getLong).toSet
    }
    val bySource = docs.groupBy(_._3).view
      .mapValues(_.map(d => xs(d._2)).reduce(_ ++ _)).toMap
    val expect = (for {
      i <- bySource.keys.toSeq.sorted
      j <- bySource.keys.toSeq.sorted if i < j
      inter = (bySource(i) & bySource(j)).size.toLong if inter > 0
      (ni, nj) = (bySource(i).size.toLong, bySource(j).size.toLong)
    } yield (i, j, inter, ni, nj,
      math.floor(inter.toDouble / (ni + nj - inter) * 10000 + 0.5) / 10000)).toSet
    import spark.implicits._
    assert(expect.size >= 10, s"fixture degenerate: ${expect.size} overlapping pairs")
    // BOTH size-gate arms must equal the reference: the object-set arm
    // (fixture default) and the ≤64-source bitmask arm (forced by zeroing
    // the gate — the arm a corpus-scale run takes)
    def run() = DedupOps.sourceOverlapOn(docs.toDF("doc_id", "text", "source"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
    assert(run() === expect, "set arm diverged")
    spark.conf.set("spark.graft.overlapSetMaxBytes", "0")
    try assert(run() === expect, "bitmask arm diverged")
    finally spark.conf.unset("spark.graft.overlapSetMaxBytes")
  }

  test("dedupEmbed sub-bucket bits: ceil-log2 formula, growth with corpus, block bound") {
    import graft.ops.SimilarityOps.{subBucketBits, TargetBlockRows}
    val T = TargetBlockRows
    // exact boundary behavior of the integer ceil-log2
    assert(subBucketBits(T * 4, 4) == 0, "avg block == target needs no split")
    assert(subBucketBits(T * 4 + 4, 4) == 1, "one row over target splits once")
    assert(subBucketBits(T * 2 * 4, 4) == 1)
    assert(subBucketBits(T * 2 * 4 + 4, 4) == 2)
    assert(subBucketBits(0, 0) == 0 && subBucketBits(5, 0) == 0, "degenerate inputs safe")
    assert(subBucketBits(Long.MaxValue / 4, 1) == 16, "clamped at 16 bits")
    // monotone growth: 2x the corpus never shrinks k, and k covers the
    // growth — avgBlock / 2^k stays <= target for every scale
    var last = 0
    for (e <- 6 to 40) {
      val n = 1L << e
      val k = subBucketBits(n, 4)
      assert(k >= last, s"k shrank at n=2^$e")
      last = k
      val avg = (n + 3) / 4
      // the bound holds until the 16-bit clamp engages (beyond it, block
      // size grows again — at that corpus scale labels themselves would be
      // re-partitioned upstream)
      assert((avg >> k) <= T || k == 16, s"avg block ${(avg >> k)} exceeds target at n=2^$e")
    }
    // on the real fixture: the composite (label, sign-bucket) key bounds
    // observed blocks near the target (signs are not perfectly balanced,
    // so allow 4x slack over the average-case bound)
    val emb = Tables.embeddings(spark, SfDir)
    val st = emb.agg(count(lit(1)), count_distinct(col("label"))).head()
    val k = subBucketBits(st.getLong(0), st.getLong(1))
    val bucket = (0 until k)
      .map(i => when(element_at(col("embedding"), i + 1) >= 0f, lit(1 << i)).otherwise(lit(0)))
      .foldLeft(lit(0))(_ + _)
    val maxBlock = emb.groupBy(col("label"), bucket.as("bucket"))
      .agg(count(lit(1)).as("n")).agg(max(col("n"))).head().getLong(0)
    assert(maxBlock <= math.max(T * 4, (st.getLong(0) / math.max(1, st.getLong(1)) >> k) * 4),
      s"fixture block of $maxBlock rows far above target $T (k=$k)")
  }

  test("rolling fingerprint: composition fp(A++B) == (fp(A)*B^|B| + fp(B)) mod p") {
    val rnd = new scala.util.Random(1213)
    val P = BigInt(2147483647L)
    val B = BigInt(1000003L)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val docs = (0 until NTrials).map { i =>
      val a = Seq.fill(1 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size)))
      val b = Seq.fill(1 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size)))
      (i, a, b)
    }
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val rows = docs.flatMap { case (i, a, b) => Seq(
      Row(i * 3L, a.mkString(" ")),
      Row(i * 3L + 1, b.mkString(" ")),
      Row(i * 3L + 2, (a ++ b).mkString(" ")))
    }
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), schema)
    val fps = TextOps.fingerprintOn(df).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    docs.foreach { case (i, _, b) =>
      val fa = BigInt(fps(i * 3L))
      val fb = BigInt(fps(i * 3L + 1))
      val fab = BigInt(fps(i * 3L + 2))
      val want = (fa * B.modPow(b.size, P) + fb) mod P
      assert(fab == want, s"doc $i: $fab != $want")
    }
  }

  test("term_freq_stats tokenizer == split(trim(text), '\\s+') on randomized whitespace") {
    // the native expression hand-rolls the space-trim + whitespace split;
    // this pins it to the Spark builtins the oracle SQL mirrors, over
    // strings with leading/trailing/internal runs of every \s class
    val rnd = new scala.util.Random(4242)
    val ws = Array(" ", "\t", "\n", "  ", " \t ")
    val words = Array("the", "a", "spark", "table", "x", "veryLongToken", "b1")
    val rows = (0 until 80).map { i =>
      val n = rnd.nextInt(8) // 0 tokens possible: whitespace-only strings
      val body = Seq.fill(n)(words(rnd.nextInt(words.length)))
        .mkString(ws(rnd.nextInt(ws.length)))
      val pad = if (rnd.nextBoolean()) ws(rnd.nextInt(ws.length)) else ""
      Row(i.toLong, pad + body + (if (rnd.nextBoolean()) ws(rnd.nextInt(ws.length)) else ""))
    }
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), schema)
    val got = df.selectExpr("id", "term_freq_stats(text) AS st")
      .selectExpr("id", "st.n_tokens", "st.n_distinct", "st.top_w", "st.n_bigrams", "st.top_b")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // independent reference: Spark's own split(trim(...)) builtins
    val ref = df.selectExpr("id", "split(trim(text), '\\\\s+') AS toks").collect().map { r =>
      val toks = r.getSeq[String](1)
      val wc = toks.groupBy(identity).map(_._2.length)
      val bigrams = toks.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
      val bc = bigrams.groupBy(identity).map(_._2.length)
      r.getLong(0) -> ((toks.length.toLong, wc.size.toLong, wc.max.toLong,
        bigrams.length.toLong, if (bc.isEmpty) 0L else bc.max.toLong))
    }.toMap
    ref.foreach { case (id, want) =>
      assert(got(id) == want, s"row $id: got ${got(id)} want $want")
    }
  }

  test("exactAvg4: signed half-away rounding (negative sums round away from zero)") {
    import spark.implicits._
    // 16 x -10.42 + 8 x -10.41 sums to exactly -250.00; the mean
    // -10.41666... must round to -10.4167 (half away from zero). The
    // unsigned formula truncated toward zero to -10.4166 because both
    // engines' integer division truncates; the sign-adjusted half term
    // fixes it identically in Spark and DuckDB.
    val df = (Seq.fill(16)(-10.42) ++ Seq.fill(8)(-10.41)).toDF("v")
    val got = df.agg(graft.model.Model.exactAvg4("v").as("a")).head().getDouble(0)
    assert(got == -10.4167, s"got $got")
    // positive twin unchanged
    val pos = (Seq.fill(16)(10.42) ++ Seq.fill(8)(10.41)).toDF("v")
    assert(pos.agg(graft.model.Model.exactAvg4("v").as("a")).head().getDouble(0) == 10.4167)
  }

  test("percentilesApprox: every value within the GK rank-error bound of the exact target") {
    import graft.ops.RelationalOps
    // the sketch's contract is a rank guarantee, not a value hash: the
    // returned sample's feasible rank interval (ties widen it) must
    // contain the exact operator's target rank within n/accuracy slack
    val vals = Tables.events(spark, SfDir).filter(col("value").isNotNull)
      .groupBy(col("event_type")).agg(collect_list(col("value")).as("vs"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1).sorted)
      .toMap
    val approx = RelationalOps.percentilesApprox(spark, SfDir).collect()
    assert(approx.length == vals.size * RelationalOps.PercentilesPerMille.size)
    approx.foreach { r =>
      val (m, pm, v) = (r.getString(0), r.getInt(1), r.getDouble(2))
      val vs = vals(m)
      val n = vs.length
      val target = math.max(1L, (n.toLong * pm + 999) / 1000)
      val rankLo = vs.count(_ < v) + 1
      val rankHi = vs.count(_ <= v)
      val slack = n.toDouble / RelationalOps.PctApproxAccuracy + 1
      assert(target >= rankLo - slack && target <= rankHi + slack,
        s"$m p$pm: value $v occupies ranks [$rankLo, $rankHi] of $n, target $target")
    }
  }

  test("top-terms MG sketch: error bound holds in the lossy regime; exact below capacity") {
    import spark.implicits._
    // Zipf-ish corpus with FAR more distinct terms than the sketch's 256
    // counters: term_i appears ceil(4000 / i) times, i in 1..3000 — heavy
    // head, long tail, ~30k total occurrences
    val rnd = new scala.util.Random(42)
    val occurrences = rnd.shuffle(
      (1 to 3000).flatMap(i => Seq.fill(4000 / i + 1)(f"t$i%04d")))
    // pack into docs of 50 tokens so the operator runs its real path
    val docs = occurrences.grouped(50).zipWithIndex
      .map { case (toks, id) => (id.toLong, toks.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    val n = occurrences.size.toLong
    val m = TextOps.TopTermsSketchCounters
    val out = TextOps.topTermsApproxOn(docs, k = 20).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.length == 20)
    val truth = occurrences.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val loss = out.head._4 - out.head._3 // cnt_hi - est, same for every row
    assert(loss <= n / (m + 1), s"loss $loss exceeds the MG bound ${n / (m + 1)}")
    out.foreach { case (_, term, est, hi) =>
      val t = truth(term)
      assert(est <= t && t <= hi, s"$term: true $t outside [est $est, hi $hi]")
    }
    // the unambiguous head (true count far above loss + everyone else's
    // upper bound) must surface, in order
    assert(out(0)._2 == "t0001" && out(1)._2 == "t0002",
      s"head of the distribution lost: ${out.take(3).mkString(",")}")

    // below capacity (fixture vocabulary << 256 counters) the sketch never
    // compacts: loss == 0 and the ranking equals the exact aggregate
    val approxFix = TextOps.topTermsApprox(spark, SfDir).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    val exactFix = TextOps.topTerms(spark, SfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(approxFix.forall { case (_, est, hi) => est == hi }, "loss on a sub-capacity corpus")
    assert(approxFix.map(t => (t._1, t._2)).toSeq == exactFix.toSeq,
      "sub-capacity sketch must equal the exact top-terms")
  }

  test("bpeTrain == plain-Scala Sennrich reference (randomized corpora + fixture)") {
    import spark.implicits._
    // direct transliteration of the Sennrich et al. 2016 learn_bpe loop:
    // get_stats counts overlapping adjacent pairs weighted by word freq,
    // the argmax ties break (count DESC, l ASC, r ASC), merges apply
    // greedily left-to-right
    def scalaBpe(words: Map[String, Long], k: Int): Seq[(Int, String, String, String, Long)] = {
      var cur: Seq[(Vector[String], Long)] =
        words.toSeq.map { case (w, f) => (w.map(_.toString).toVector, f) }
      val out = scala.collection.mutable.ArrayBuffer[(Int, String, String, String, Long)]()
      var it = 1
      var stop = false
      while (it <= k && !stop) {
        val counts = scala.collection.mutable.Map[(String, String), Long]().withDefaultValue(0L)
        cur.foreach { case (s, f) =>
          var i = 0
          while (i < s.length - 1) { counts((s(i), s(i + 1))) += f; i += 1 }
        }
        if (counts.isEmpty) stop = true
        else {
          val ((l, r), c) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
          out += ((it, l, r, l + r, c))
          cur = cur.map { case (s, f) =>
            val b = Vector.newBuilder[String]
            var i = 0
            while (i < s.length) {
              if (i + 1 < s.length && s(i) == l && s(i + 1) == r) { b += l + r; i += 2 }
              else { b += s(i); i += 1 }
            }
            (b.result(), f)
          }
        }
        it += 1
      }
      out.toSeq
    }
    def wordFreqs(docs: Seq[String]): Map[String, Long] =
      docs.flatMap(_.trim.split("\\s+")).filter(_.nonEmpty)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rnd = new scala.util.Random(42)
    // adversarial shapes: runs of a repeated char (overlap counting +
    // greedy non-overlap merges), single chars, shared prefixes
    val corpora = Seq(
      Seq("aaaa aaa aa a", "aaaa aaaa"),
      Seq("abab ababab ab", "ba ab ba"),
      (1 to 40).map(_ => Seq("low", "lower", "lowest", "newest", "widest",
        "aa", "aaa")(rnd.nextInt(7))).mkString(" ") :: Nil
    )
    corpora.zipWithIndex.foreach { case (docs, ci) =>
      val got = TextOps.bpeTrainOn(docs.toDF("text"), 5).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
        .toSeq
      assert(got === scalaBpe(wordFreqs(docs), 5), s"corpus $ci: $docs")
    }
    // the fixture run agrees too (k = BpeMerges, the registered query)
    val fixtureDocs = Tables.documents(spark, SfDir).select("text").as[String].collect().toSeq
    val got = TextOps.bpeTrain(spark, SfDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSeq
    assert(got === scalaBpe(wordFreqs(fixtureDocs), TextOps.BpeMerges))
  }

  test("bpeApply == plain-Scala greedy-merge tokenizer (randomized corpora + fixture)") {
    import spark.implicits._
    // the Sennrich apply loop: per word, split to chars, apply each merge
    // greedily left-to-right in training order, count surviving symbols
    def applyCount(merges: Seq[(String, String)], text: String): Long =
      text.trim.split("\\s+").filter(_.nonEmpty).map { w =>
        var syms: Vector[String] = w.map(_.toString).toVector
        merges.foreach { case (l, r) =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) { b += l + r; i += 2 }
            else { b += syms(i); i += 1 }
          }
          syms = b.result()
        }
        syms.length.toLong
      }.sum
    val rnd = new scala.util.Random(7)
    val corpora = Seq(
      Seq("aaaa aaa aa a", "aaaa aaaa"),          // overlap runs: greedy non-overlap
      Seq("abab ababab ab", "ba ab ba"),          // chained merges across iterations
      (1 to 40).map(_ => Seq("low", "lower", "lowest", "newest", "widest",
        "aa", "aaa")(rnd.nextInt(7))).mkString(" ") :: Nil
    )
    corpora.zipWithIndex.foreach { case (docs, ci) =>
      val merges = TextOps.bpeTrainedMerges(docs.toDF("text"), 5)
      val got = docs.toDF("text")
        .select(TextOps.bpeCountCol(TextOps.bpeEncodeCol(col("text"), merges)))
        .as[Long].collect().toSeq
      val want = docs.map(applyCount(merges.map(m => (m._2, m._3)), _))
      assert(got === want, s"corpus $ci: $docs")
    }
    // the registered fixture query agrees per doc, and its arithmetic
    // invariant holds: merges_applied = n_base_symbols - n_bpe_tokens
    val merges = TextOps.trainedMerges(spark, SfDir).map(m => (m._2, m._3))
    val byDoc = Tables.documents(spark, SfDir)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toMap
    val out = TextOps.bpeApply(spark, SfDir).collect()
    assert(out.length == byDoc.size)
    out.foreach { r =>
      val (id, nWs, nBase, nBpe, applied) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val text = byDoc(id)
      assert(nBpe == applyCount(merges, text), s"doc $id subword count")
      assert(nBase == text.replaceAll("\\s", "").length.toLong, s"doc $id base symbols")
      assert(applied == nBase - nBpe, s"doc $id merges_applied")
      assert(nWs == text.trim.split("\\s+").length.toLong, s"doc $id ws tokens")
    }
  }

  test("agent JSON escaping: every adversarial payload parses back exactly through the shared envelope schema") {
    // the OPC-UA→MQTT agent hand-assembles its wire JSON (jsonStr /
    // jsonScalar); this property drives the writer with quotes,
    // backslashes, control chars, multi-byte and astral code points, and
    // every scalar type, then parses through graft.model.Envelope — the
    // exact consumer path — asserting string identity and type-channel
    // preservation. A single escaping slip here is silent data loss on
    // the live topology.
    import graft.net.OpcuaWire.Variant
    import graft.streaming.OpcuaMqttAgent
    val rnd = new scala.util.Random(4242)
    def randString(): String = {
      val n = rnd.nextInt(24)
      val sb = new StringBuilder
      (0 until n).foreach { _ =>
        rnd.nextInt(6) match {
          case 0 => sb += '"'
          case 1 => sb += '\\'
          case 2 => sb += rnd.nextInt(0x20).toChar // raw control char
          case 3 => sb += ('a' + rnd.nextInt(26)).toChar
          case 4 => sb ++= "é€µ"
          case 5 => sb ++= new String(Character.toChars(0x1F600 + rnd.nextInt(16)))
        }
      }
      sb.toString
    }
    val cases: Seq[(Long, String, Any)] = (1 to 300).map { i =>
      val v: Any = rnd.nextInt(4) match {
        case 0 => rnd.nextDouble() * math.pow(10, rnd.nextInt(12) - 6)
        case 1 => rnd.nextLong()
        case 2 => rnd.nextBoolean()
        case 3 => randString()
      }
      (i.toLong, randString() + "n", v) // node_id non-empty (wellFormed)
    }
    val payloads = cases.map { case (id, name, v) =>
      s"""{"event_id":$id,"node_id":${OpcuaMqttAgent.jsonStr(name)},""" +
        s""""value":${OpcuaMqttAgent.jsonScalar(Variant.of(v))},"ts_us":$id,"user_id":null}"""
    }
    import spark.implicits._
    val parsed = spark.createDataset(payloads).toDF("payload")
      // the decode contract's dual parse: string content from ms, the
      // type channel (and ASCII-safe numeric/boolean content) from m
      .select(from_json(col("payload"), graft.model.Envelope.variantSchema).as("m"),
        from_json(col("payload"), graft.model.Envelope.stringSchema).as("ms"))
      .where(graft.model.Envelope.wellFormed)
      .select(
        col("m.event_id").as("id"),
        col("m.node_id").as("name"),
        col("ms.value").as("vs"),
        expr("try_variant_get(m.value, '$', 'double')").as("vd"),
        expr("try_variant_get(m.value, '$', 'bigint')").as("vl"),
        expr("try_variant_get(m.value, '$', 'boolean')").as("vb"),
        expr("schema_of_variant(m.value)").as("vt"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(parsed.size == cases.length, "a payload failed to parse — escaping bug")
    cases.foreach { case (id, name, v) =>
      val r = parsed(id)
      assert(r.getString(1) == name, s"node_id mangled for case $id: ${r.getString(1)}")
      v match {
        case s: String =>
          assert(r.getString(6) == "STRING" && r.getString(2) == s,
            s"string value mangled for case $id")
        case d: Double =>
          assert(r.getString(6) != "STRING" && !r.isNullAt(3) &&
            r.getDouble(3) == d, s"double value mangled for case $id: $v vs ${r.get(3)}")
        case l: Long =>
          assert(r.getString(6) != "STRING" && !r.isNullAt(4) &&
            r.getLong(4) == l, s"long value mangled for case $id")
        case b: Boolean =>
          assert(r.getString(6) == "BOOLEAN" && r.getBoolean(5) == b,
            s"boolean value mangled for case $id")
        case other => fail(s"unexpected case type $other")
      }
    }
  }
}
