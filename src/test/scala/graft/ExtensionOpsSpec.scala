package graft

import graft.ops.{CurationOps, DedupOps, SessionOps, SimilarityOps, TextOps}
import org.apache.spark.sql.functions._

/** §2E invariants (SURVEY §5.2.3): dedup idempotence, top-k ⊆ full-sort
  * prefix, HLL within tolerance, session-gap semantics.
  */
class ExtensionOpsSpec extends SparkSuite {

  test("exact dedup is idempotent and keeps the smallest doc_id") {
    val once = TextOps.dedupExact(spark, SfDir).cache()
    val n = once.count()
    assert(n > 0)
    // all kept ids distinct; n_copies sums to corpus size
    assert(once.select("doc_id").distinct().count() == n)
    val total = once.agg(sum("n_copies")).head().getLong(0)
    assert(total == Tables.documents(spark, SfDir).count())
    // the survivor is the per-normalized-text MINIMUM doc_id, checked
    // against an independent groupBy on the raw text (a max/first
    // regression keeps one-per-digest and still sums correctly)
    val ref = Tables.documents(spark, SfDir)
      .groupBy(TextOps.normText(col("text")).as("k"))
      .agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    assert(once.select("doc_id").exceptAll(ref).count() == 0 &&
      ref.exceptAll(once.select("doc_id")).count() == 0,
      "survivors are not the per-text minima")
    // idempotence: dedup over the deduped corpus keeps every row
    val docs = Tables.documents(spark, SfDir)
      .join(once.select("doc_id"), "doc_id")
    // independent duplicate-count over the survivor corpus: zero groups
    // with >1 row means a second dedup pass would be the identity
    val twice = docs
      .groupBy(TextOps.normText(col("text")).as("k"))
      .agg(count(lit(1)).as("c"))
    assert(twice.filter(col("c") > 1).count() == 0, "dedup output still has dups")
  }

  test("minhash candidates reproduce the exact-Jaccard pair set at J >= 0.6") {
    // brute-force exact pairs over all shingle-sharing docs
    val sh = Tables.documents(spark, SfDir)
      .withColumn("toks", split(trim(col("text")), "\\s+"))
      .filter(size(col("toks")) >= 3)
      .select(
        col("doc_id"),
        explode(expr(
          "transform(sequence(1, size(toks) - 2), i -> concat_ws(' ', slice(toks, i, 3)))"
        )).as("s")
      )
      .distinct()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val exact = sh.as("a")
      .join(sh.as("b"), col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id").as("i"), col("n").as("na")), "i")
      .join(sizes.select(col("doc_id").as("j"), col("n").as("nb")), "j")
      .filter(col("inter").cast("double") / (col("na") + col("nb") - col("inter")) >= DedupOps.JaccardThreshold)
      .select("i", "j")
    val got = DedupOps.dedupMinhash(spark, SfDir).select("i", "j")
    assert(got.exceptAll(exact).count() == 0 && exact.exceptAll(got).count() == 0)
  }

  test("incremental dedup: best base match equals a brute-force cross recompute") {
    // exact cross-side pairs over string shingles (no shared expressions),
    // then a plain-Scala argmax per probe with the (jaccard DESC, base_id
    // ASC) tie-break
    val base = DedupOps.IncrementalBaseSource
    val sh = Tables.documents(spark, SfDir)
      .withColumn("toks", split(trim(col("text")), "\\s+"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), col("source"), explode(expr(
        "transform(sequence(1, size(toks) - 2), i -> concat_ws(' ', slice(toks, i, 3)))"
      )).as("s"))
      .distinct()
    val sizes = sh.select("doc_id", "s").distinct()
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cross = sh.as("a")
      .join(sh.as("b"), col("a.s") === col("b.s") &&
        col("a.source") =!= lit(base) && col("b.source") === lit(base))
      .groupBy(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .agg(count(lit(1)).as("inter"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = cross
      .map { case (i, j, inter) =>
        (i, j, inter, inter.toDouble / (sizes(i) + sizes(j) - inter))
      }
      .filter(_._4 >= DedupOps.JaccardThreshold)
      .groupBy(_._1).map { case (i, cands) =>
        val best = cands.minBy { case (_, j, _, jac) => (-jac, j) }
        i -> ((best._2, best._3,
          math.floor(best._4 * 10000 + 0.5) / 10000))
      }
    val got = DedupOps.dedupIncremental(spark, SfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got.nonEmpty, "fixture has no cross-source near-dups vs the base")
    assert(got === expect)
    // no probe doc from the base source, ever
    DedupOps.dedupIncremental(spark, SfDir).collect()
      .foreach(r => assert(r.getString(1) != base, "base doc emitted as probe"))
  }

  test("substring dedup: spans equal a plain-Scala string-window recompute") {
    val W = DedupOps.SubstrWindow
    val rows = Tables.documents(spark, SfDir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    // brute force over literal window STRINGS (no shared hash code):
    // global keeper = min (doc_id, p) per distinct window text
    val occ = rows.flatMap { case (id, text) =>
      val toks = text.trim.split("\\s+")
      if (toks.length < W) Nil
      else (0 to toks.length - W).map(i => (id, i + 1L, toks.slice(i, i + W).mkString(" ")))
    }
    val keeper = occ.groupBy(_._3).map { case (g, os) =>
      g -> os.map(o => (o._1, o._2)).min
    }
    val cuts = occ.filter { case (id, p, g) => keeper(g) != ((id, p)) }
      .map { case (id, p, _) => (id, p) }
    val expect = cuts.groupBy(_._1).toSeq.flatMap { case (id, ps) =>
      val sorted = ps.map(_._2).sorted
      val spans = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      sorted.foreach { p =>
        if (spans.nonEmpty && p - (spans.last._2) <= W) {
          val (s0, _) = spans.remove(spans.length - 1); spans += ((s0, p))
        } else spans += ((p, p))
      }
      spans.map { case (s0, pMax) => (id, s0, pMax + W - s0) }
    }.sortBy(t => (t._1, t._2))
    val got = DedupOps.dedupSubstring(spark, SfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.nonEmpty, "fixture has no duplicated substrings")
    assert(got === expect)
  }

  test("substring dedup: keep-first, within-doc repeats, and short docs") {
    import spark.implicits._
    val W = DedupOps.SubstrWindow
    val span = (1 to W).map(i => s"t$i").mkString(" ")     // exactly W tokens
    val docs = Seq(
      (1L, span + " uniq1 uniq2"),                         // owner (smallest id)
      (2L, "pre1 pre2 " + span),                           // cut at p=3
      (3L, span + " mid " + span),                         // two cuts incl. within-doc
      (4L, (1 to W - 1).map(i => s"t$i").mkString(" ")),   // too short: no windows
      (5L, "zz1 zz2 zz3")                                  // short and unrelated
    ).toDF("doc_id", "text")
    val got = DedupOps.dedupSubstringOn(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // doc 2: the span's window matches doc 1's p=1 occurrence → cut [3, W+2]
    // doc 3: cut windows at p=1 and p=W+2 (both copies owned by doc 1);
    //        the gap of W+1 > W keeps them separate spans; the 'mid'-
    //        crossing windows are unique so they are never cut
    assert(got.filter(_._1 == 2L) === Seq((2L, 3L, W.toLong)), got.toString)
    assert(got.filter(_._1 == 3L) ===
      Seq((3L, 1L, W.toLong), (3L, W + 2L, W.toLong)), got.toString)
    assert(!got.exists(_._1 == 1L) && !got.exists(_._1 == 4L) && !got.exists(_._1 == 5L),
      got.toString)
  }

  test("substring dedup: skew-safe aggregate-keeper arm equals the window arm") {
    val key = "spark.graft.substrSkewSafe"
    def run() = DedupOps.dedupSubstring(spark, SfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    spark.conf.set(key, "true") // opt into the aggregate+join skew arm
    val agg = try run() finally spark.conf.unset(key)
    val win = run() // default: window arm
    assert(agg.nonEmpty && agg == win, s"arms diverge: ${agg.take(3)} vs ${win.take(3)}")
  }

  test("dedup apply: synthetic corpus exercises every stage incl. a span cut on a kept doc") {
    import spark.implicits._
    // canonical-URL identity is md5-bucket-dependent; ids 6 and 171 both
    // canonicalize to https://site6.co.uk/p/1 (verified against the
    // oracle derivation) and no other pair in this set collides
    val shared = (1 to 20).map(i => s"sh$i").mkString(" ")          // 20-token verbatim run
    val near = (1 to 30).map(i => s"nd$i").mkString(" ")
    val nearMut = ((1 to 29).map(i => s"nd$i") :+ "ndX").mkString(" ")
    val docs = Seq(
      (0L, "plain zero doc"),
      (2L, "identical twin text body"),
      (3L, "identical twin text body"),                             // exact dup of 2
      (4L, "semantic keeper stand in"),
      (5L, "a plain untouched document"),
      (171L, "url duplicate different words gamma delta"),          // url dup of 6
      (7L, near),
      (8L, nearMut),                                                // minhash near-dup of 7
      (9L, "semantically pruned doc body"),                         // semantic prune (injected)
      (6L, shared + " " + (1 to 30).map(i => s"kb$i").mkString(" ")),// span keeper (50 toks)
      (10L, shared + " " + (1 to 40).map(i => s"kc$i").mkString(" ")) // kept, 20-token cut
    ).toDF("doc_id", "text")
    val semRm = Seq((9L, 4L)).toDF("doc_id", "keeper_semantic")
    val got = graft.ops.DedupOps.dedupApplyPerDocOn(docs, semRm)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), Option(r.get(2)).map(_.asInstanceOf[Long]), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got(3L) == (("exact", Some(2L), 4L, 0L)), got(3L).toString)
    assert(got(171L) == (("url", Some(6L), 6L, 0L)), got(171L).toString)
    assert(got(8L) == (("minhash", Some(7L), 30L, 0L)), got(8L).toString)
    assert(got(9L) == (("semantic", Some(4L), 4L, 0L)), got(9L).toString)
    // doc 10 survives every doc-level stage but loses the 20-token
    // verbatim span whose first occurrence lives in doc 6
    assert(got(10L) == (("kept", None, 60L, 40L)), got(10L).toString)
    // keepers and untouched docs keep their full token mass
    Seq(0L, 2L, 4L, 5L, 7L, 6L).foreach { id =>
      assert(got(id)._1 == "kept" && got(id)._4 == got(id)._3, s"$id: ${got(id)}")
    }
  }

  test("dedup apply + ledger: fixture stages are consistent with each operator's own output") {
    val per = graft.ops.DedupOps.dedupApply(spark, SfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3), r.getLong(4)))
    val nDocs = Tables.documents(spark, SfDir).count()
    assert(per.length == nDocs, "per-doc output must cover the corpus once")
    // independent prune sets from the individual (oracle-checked) operators
    val exactKeep = TextOps.dedupExact(spark, SfDir).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val urlKeep = CurationOps.urlDedup(spark, SfDir).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val mhNonKeep = DedupOps.dedupClusters(spark, SfDir)
      .filter(col("doc_id") =!= col("cluster_id")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val semPruned = graft.ops.ClusterOps.semanticDedup(spark, SfDir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val spanCut = DedupOps.dedupSubstring(spark, SfDir)
      .groupBy(col("doc_id")).agg(sum("span_len").as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    per.foreach { case (id, stage, n, kept) =>
      val expect =
        if (!exactKeep.contains(id)) "exact"
        else if (!urlKeep.contains(id)) "url"
        else if (mhNonKeep.contains(id)) "minhash"
        else if (semPruned.contains(id)) "semantic"
        else "kept"
      assert(stage == expect, s"doc $id: $stage != $expect")
      if (stage == "kept") assert(kept == n - spanCut.getOrElse(id, 0L), s"doc $id kept tokens")
      else assert(kept == 0L, s"doc $id removed but kept tokens")
    }
    // ledger equals the driver-side rollup of the per-doc table
    val led = graft.ops.DedupOps.dedupLedger(spark, SfDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    val totD = per.length.toLong
    val totT = per.map(_._3).sum
    var cumD = 0L
    var cumT = 0L
    val expectLed = Seq("exact", "url", "minhash", "semantic", "substring").zipWithIndex.map {
      case (st, i) =>
        val (d, t) =
          if (st == "substring") (0L, per.filter(_._2 == "kept").map(p => p._3 - p._4).sum)
          else {
            val rows = per.filter(_._2 == st)
            (rows.length.toLong, rows.map(_._3).sum)
          }
        cumD += d; cumT += t
        (i + 1, st, d, t, totD - cumD, totT - cumT)
    }
    assert(led.toSeq == expectLed, s"led ${led.toSeq}\nexpect $expectLed")
  }

  test("url canonicalization collapses presentation variants, keeps identity") {
    import spark.implicits._
    val urls = Seq(
      "http://WWW.Site3.net:80/p/1/?id=2&utm_source=feed#frag",
      "https://www.site3.net:443/p/1?id=2",
      "https://site3.net/p/1/?utm_campaign=x&utm_source=a",
      "https://blog.site3.net/p/1",
      "http://site9.co.uk/p/2?id=1"
    ).toDF("u")
    val got = urls.select(CurationOps.canonicalUrl(col("u"))).as[String].collect().toSeq
    assert(got === Seq(
      "https://site3.net/p/1?id=2",   // every variant collapsed
      "https://site3.net/p/1?id=2",
      "https://site3.net/p/1",        // tracking-only query removed
      "https://blog.site3.net/p/1",   // blog is NOT www: identity kept
      "https://site9.co.uk/p/2?id=1"), got.toString)
    val doms = urls.select(CurationOps.registrableDomain(
      CurationOps.canonicalParts(col("u"))._1)).as[String].collect().toSeq
    assert(doms === Seq("site3.net", "site3.net", "site3.net",
      "site3.net",                    // registrable domain strips blog.
      "site9.co.uk"), doms.toString)  // two-part public suffix keeps 3 labels
  }

  test("domain mix: caps bind, kept set is the md5-rank prefix") {
    val got = CurationOps.domainMix(spark, SfDir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (nd, nk) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept"))
      assert(nk == math.min(nd, CurationOps.DomainDocCap.toLong), r.toString)
    }
    // determinism: a second run is byte-identical
    val again = CurationOps.domainMix(spark, SfDir).collect()
    assert(got.map(_.toString).toSeq === again.map(_.toString).toSeq)
    // arm equality: the TopKKeep default, the two-scan WindowGroupLimit
    // arm, and the fused single-window arm select the SAME kept set
    for (arm <- Seq("twoscan", "window")) {
      spark.conf.set("spark.graft.domainMixArm", arm)
      val alt = try CurationOps.domainMix(spark, SfDir).collect()
        finally spark.conf.unset("spark.graft.domainMixArm")
      assert(got.map(_.toString).toSeq === alt.map(_.toString).toSeq,
        s"arm $arm diverges from the TopKKeep default")
    }
  }

  test("source overlap equals an independent string-shingle recompute") {
    // exact distinct (source, shingle-STRING) stream built from split/
    // slice SQL — no shared expression with the native hash-set operator
    val sh = Tables.documents(spark, SfDir)
      .withColumn("toks", split(trim(col("text")), "\\s+"))
      .filter(size(col("toks")) >= 3)
      .select(col("source"), explode(expr(
        "transform(sequence(1, size(toks) - 2), i -> concat_ws(' ', slice(toks, i, 3)))"
      )).as("s"))
      .distinct()
    val sizes = sh.groupBy("source").agg(count(lit(1)).as("n"))
    val exact = sh.as("a")
      .join(sh.as("b"), col("a.s") === col("b.s") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_i"), col("b.source").as("src_j"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("source").as("src_i"), col("n").as("n_i")), "src_i")
      .join(sizes.select(col("source").as("src_j"), col("n").as("n_j")), "src_j")
      .select("src_i", "src_j", "inter", "n_i", "n_j")
    val full = DedupOps.sourceOverlap(spark, SfDir).cache()
    val got = full.select("src_i", "src_j", "inter", "n_i", "n_j")
    assert(got.count() > 0, "fixture has no overlapping source pairs")
    assert(got.exceptAll(exact).count() == 0 && exact.exceptAll(got).count() == 0)
    // jaccard column: plain-Scala round-half-up over the exact integers
    full.collect().foreach { r =>
      val (inter, ni, nj) = (r.getAs[Long]("inter"), r.getAs[Long]("n_i"), r.getAs[Long]("n_j"))
      val expect = math.floor(inter.toDouble / (ni + nj - inter) * 10000 + 0.5) / 10000
      assert(r.getAs[Double]("jaccard") === expect, s"(${r.get(0)}, ${r.get(1)})")
      assert(inter <= math.min(ni, nj), "intersection exceeds a set size")
    }
    full.unpersist()
  }

  test("word_shingle_hashes/minhash_sig: in-row natives == SQL-composed pipeline") {
    import graft.ops.DedupOps
    import spark.implicits._
    // fixture docs + adversarial shapes: multi-space runs, tabs/newlines
    // (Spark trim strips only ' '), non-BMP text, exactly-3 tokens,
    // 2 tokens (no shingles), repeated shingles (distinct), empty string
    val edge = Seq(
      (9001L, "a  b\tc   d"), (9002L, "x y"), (9003L, "one two three"),
      (9004L, "\nlead ing newline tokens"), (9005L, "😀 a 😀 a 😀 a 😀"),
      (9006L, "r r r r r r"), (9007L, ""), (9008L, "   ")
    ).toDF("doc_id", "text")
    val docs = Tables.documents(spark, SfDir).select("doc_id", "text").unionAll(edge)
    // the SQL-composed reference pipeline the natives replaced
    val sqlXs = docs
      .withColumn("toks", split(trim(col("text")), "\\s+"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(toks) - 2), i -> concat_ws(' ', slice(toks, i, 3)))"
      )).as("shingle"))
      .select(col("doc_id"), xxhash64(col("shingle")).as("x"))
      .groupBy("doc_id").agg(collect_set(col("x")).as("xs"))
      .select(col("doc_id"), sort_array(col("xs")).as("xs"))
    val nativeXs = docs
      .select(col("doc_id"), DedupOps.shingleHashSet(col("text")).as("xs0"))
      .filter(size(col("xs0")) > 0)
      .select(col("doc_id"), sort_array(col("xs0")).as("xs"))
    assert(sqlXs.exceptAll(nativeXs).count() == 0 && nativeXs.exceptAll(sqlXs).count() == 0,
      "native shingle sets differ from the SQL pipeline")
    // signature: matches a direct reimplementation of h_i(x) = (a_i x + b_i) mod p
    def mix(seed: Long): Long = {
      var z = seed + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val p = 2147483647L
    val as = Array.tabulate(128)(i => (mix(2L * i + 1) & Long.MaxValue) % (p - 1) + 1)
    val bs = Array.tabulate(128)(i => (mix(2L * i + 2) & Long.MaxValue) % p)
    val sigRow = spark.sql(
      "SELECT minhash_sig(word_shingle_hashes('alpha beta gamma delta', 3), 128, 2147483647) AS sig"
    ).head().getSeq[Long](0)
    val xs = nativeXs.filter(col("doc_id") === 9003L) // sanity: expression registered in SQL
    assert(xs.count() == 1)
    val shingleHashes = spark.sql(
      "SELECT word_shingle_hashes('alpha beta gamma delta', 3) AS xs"
    ).head().getSeq[Long](0)
    // raw 64-bit inputs; the permutation reduces mod p internally
    val expected = (0 until 128).map(i =>
      shingleHashes.map(x => (as(i) * java.lang.Math.floorMod(x, p) + bs(i)) % p).min)
    assert(sigRow == expected, "signature differs from the reference formula")
  }

  test("simhash_sig: in-row native == SQL-composed pipeline (distinct-token md5 fold)") {
    import graft.ops.DedupOps
    import spark.implicits._
    val edge = Seq(
      (9101L, "a  b\tc   d"), (9102L, "x y"), (9103L, "one two three"),
      (9104L, "\nlead ing newline tokens"), (9105L, "😀 a 😀 a 😀 a 😀"),
      (9106L, "r r r r r r"), (9107L, ""), (9108L, "   "), (9109L, "solo")
    ).toDF("doc_id", "text")
    val docs = Tables.documents(spark, SfDir).select("doc_id", "text").unionAll(edge)
    // the SQL-composed reference pipeline the native replaced
    val simAgg = udaf(new TestSimHashFold(60))
    val sqlSims = docs
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("tok"))
      .distinct()
      .withColumn("h", expr("CAST(conv(substring(md5(tok), 1, 15), 16, 10) AS BIGINT)"))
      .groupBy(col("doc_id")).agg(simAgg(col("h")).as("sim"))
    val nativeSims = docs.select(col("doc_id"), DedupOps.simhashSigCol(col("text")).as("sim"))
    assert(sqlSims.exceptAll(nativeSims).count() == 0 &&
      nativeSims.exceptAll(sqlSims).count() == 0,
      "native simhash signatures differ from the SQL pipeline")
  }

  test("dedup clusters: pair-consistent, linear output, min-id representative") {
    val clusters = DedupOps.dedupClusters(spark, SfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(clusters.size == Tables.documents(spark, SfDir).count(), "one row per doc")
    // every near-dup pair lands in the same cluster
    DedupOps.dedupMinhash(spark, SfDir).collect().foreach { r =>
      val (i, j) = (r.getLong(0), r.getLong(1))
      assert(clusters(i)._1 == clusters(j)._1, s"pair ($i,$j) split across clusters")
    }
    // representative is the component minimum; sizes consistent
    clusters.groupBy(_._2._1).foreach { case (cid, members) =>
      assert(cid == members.keys.min, s"cluster $cid rep is not the min doc_id")
      members.values.foreach { case (_, sz) => assert(sz == members.size) }
    }
  }

  test("dup weights: cluster-consistent masses, inverse-multiplicity weights") {
    val clusters = DedupOps.dedupClusters(spark, SfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val weights = DedupOps.dupWeights(spark, SfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    // one row per cluster, sizes agree with the cluster table
    val sizeByCluster = clusters.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    assert(weights.keySet == sizeByCluster.keySet)
    weights.foreach { case (cid, (sz, total, kept, w)) =>
      assert(sz == sizeByCluster(cid), s"cluster $cid size")
      assert(kept <= total, s"cluster $cid kept > total")
      assert(w == math.floor(1.0 / sz * 10000.0 + 0.5) / 10000.0, s"cluster $cid weight")
    }
    // token masses reconcile against an independent per-doc count
    import org.apache.spark.sql.functions.{col, size => asize, split, trim}
    val toks = Tables.documents(spark, SfDir)
      .select(col("doc_id"), asize(split(trim(col("text")), "\\s+")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byCluster = clusters.groupBy(_._2)
    byCluster.foreach { case (cid, members) =>
      assert(weights(cid)._2 == members.map(m => toks(m._1)).sum, s"cluster $cid total")
      assert(weights(cid)._3 == toks(cid), s"cluster $cid kept mass != representative's")
    }
    // corpus token mass is partitioned exactly across clusters
    assert(weights.values.map(_._2).sum == toks.values.sum)
  }

  test("ngram dedup: pairs equal an independent df-capped gram-Jaccard reference") {
    val got = DedupOps.dedupNgram(spark, SfDir)
      .select("i", "j", "inter").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.nonEmpty)
    // reference built from SQL primitives only (substring over the
    // normalized text, no native expression, no shared helper): the same
    // df-cap, the same threshold — catches a broken intersection count or
    // posting-list expansion, which the operator's own output filters
    // cannot (they re-assert what produced them)
    val grams = Tables.documents(spark, SfDir)
      .select(col("doc_id"), TextOps.normText(col("text")).as("t"))
      .filter(length(col("t")) >= 8)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, length(t) - 7), i -> substring(t, i, 8))")).as("g"))
      .distinct()
    val capped = grams.groupBy("g").agg(collect_list(col("doc_id")).as("ids"))
      .filter(size(col("ids")) <= 20)
      .select(col("g"), explode(col("ids")).as("doc_id"))
    val sizes = capped.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val ref = capped.as("a")
      .join(capped.as("b"), col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id").as("i"), col("n").as("na")), "i")
      .join(sizes.select(col("doc_id").as("j"), col("n").as("nb")), "j")
      .filter(col("inter").cast("double") / (col("na") + col("nb") - col("inter")) >=
        DedupOps.NgramJaccardThreshold)
      .select("i", "j", "inter").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == ref,
      s"ngram pairs differ: only-op=${(got -- ref).take(5)} only-ref=${(ref -- got).take(5)}")
  }

  test("ngram dedup: singleton posting lists survive (Spark sequence(1,0) DESCENDS, unlike range)") {
    import spark.implicits._
    // doc 3's grams are all df=1 → every posting list it appears in has
    // size 1. The pair generator iterates sequence(1, size-1); for
    // size=1 that is sequence(1, 0), which Spark evaluates as the
    // DESCENDING [1, 0] (DuckDB's range(1, 1) is empty) — ungated it
    // dereferences ids[-1] and throws INVALID_ARRAY_INDEX. Round-7
    // regression: the guard must keep singleton lists out of the
    // 2-combination expansion while still counting them for doc sizes.
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "zzzz yyyy xxxx wwww vvvv uuuu")
    ).toDF("doc_id", "text")
    val pairs = DedupOps.dedupNgramOn(docs)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)),
      s"expected exactly the near-dup pair (1,2), got $pairs")
  }

  test("ngram extraction slides over code points, not UTF-16 code units") {
    import spark.implicits._
    // 9 non-BMP chars = 18 UTF-16 code units; code-point slicing yields
    // 9-8+1 = 2 distinct 8-grams (code-unit slicing would yield 11 and
    // split surrogate pairs)
    val nonBmp = "𝕒𝕓𝕔𝕕𝕖𝕗𝕘𝕙𝕚"
    val counts = Seq(nonBmp, "abcdefghi", "short")
      .toDF("t")
      .select(size(DedupOps.ngramHashSet(col("t"))).as("n"))
      .collect().map(_.getInt(0)).toSeq
    assert(counts == Seq(2, 2, 0))
    // same result through the SQL registration (whole-stage codegen path)
    GraftExtensions.register(spark)
    val viaSql = Seq(nonBmp).toDF("t")
      .selectExpr("size(ngram_hashes(t, 8)) AS n")
      .head().getInt(0)
    assert(viaSql == 2)
  }

  test("rolling fingerprint: order-sensitive, stable, in [0, p)") {
    val a = TextOps.fingerprint(spark, SfDir).collect()
    val b = TextOps.fingerprint(spark, SfDir).collect()
    assert(a.sameElements(b), "deterministic")
    a.foreach { r =>
      val fp = r.getAs[Long]("fp")
      assert(fp >= 0L && fp < 2147483647L)
    }
    // shifting token order must change the fold for multi-token docs:
    // compare doc fingerprint distribution against naive sum-of-hashes
    val distinctFps = a.map(_.getAs[Long]("fp")).distinct.length
    assert(distinctFps > a.length / 2, "fingerprints mostly distinct")
  }

  test("quality score: bounded and monotone in components") {
    val rows = TextOps.qualityScore(spark, SfDir).collect()
    rows.foreach { r =>
      val q = r.getAs[Double]("quality")
      assert(q >= 0.0 && q <= 1.0)
      assert(r.getAs[Double]("punct_ratio") >= 0.0 && r.getAs[Double]("punct_ratio") <= 1.0)
    }
    // monotonicity, with everything else held equal: more punctuation must
    // DECREASE quality; more stopwords (up to the 0.5 cap) must INCREASE
    // it; longer docs (to 100 tokens) must not decrease it. An inverted
    // component would keep quality in [0,1] and pass the bounds alone.
    import spark.implicits._
    val base = ("w1 " * 50).trim
    val docs = Seq(
      (1L, "en", base),                                // clean
      (2L, "en", base.replace("w1 w1", "w1! w1,")),    // more punctuation
      (3L, "en", ("the " * 25 + "w1 " * 25).trim),     // more stopwords
      (4L, "en", ("w1 " * 100).trim)                   // longer
    ).toDF("doc_id", "lang", "text")
    val q = graft.ops.TextOps.withQualityColumns(docs)
      .select("doc_id", "quality").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(q(2) < q(1), s"punctuation must lower quality: $q")
    assert(q(3) > q(1), s"stopwords must raise quality (cap 0.5): $q")
    assert(q(4) >= q(1), s"length term must not lower quality: $q")
  }

  test("brute-force top-k is a prefix of the full similarity sort") {
    val topk = SimilarityOps.simTopK(spark, SfDir).collect()
    assert(topk.length == 10)
    val sims = topk.map(_.getAs[Double]("cos_sim"))
    assert(sims.sameElements(sims.sorted(Ordering[Double].reverse)), "descending order")
    assert(sims.forall(s => s >= -1.0001 && s <= 1.0001), "cosine bounds")
  }

  test("LSH top-k returns same-bucket exact matches, subset of brute-force ranking") {
    val lsh = SimilarityOps.simTopKLsh(spark, SfDir, 5).collect()
    assert(lsh.nonEmpty, "LSH probe ring returned no candidates — vacuous")
    // independent exact scores for EVERY vector (not just the brute-force
    // top-10): each LSH hit must carry the exact score, so a mis-scored or
    // out-of-ranking candidate fails instead of skipping the assertion
    import spark.implicits._
    val q = Tables.embeddings(spark, SfDir).filter(col("vec_id") === 0)
      .select("embedding").as[Array[Float]].head().map(_.toDouble)
    val qn = math.sqrt(q.map(x => x * x).sum)
    val exact = Tables.embeddings(spark, SfDir).filter(col("vec_id") =!= 0)
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
      .map { case (id, e) =>
        val v = e.map(_.toDouble)
        val dot = v.zip(q).map { case (a, b) => a * b }.sum
        id -> math.floor(dot / (math.sqrt(v.map(x => x * x).sum) * qn) * 10000.0 + 0.5) / 10000.0
      }.toMap
    lsh.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      assert(exact.contains(id), s"LSH returned unknown vec $id")
      assert(exact(id) == r.getAs[Double]("cos_sim"), s"vec $id score mismatch")
    }
    // descending, no better-scoring SAME-BUCKET candidate was skipped:
    // LSH's k results must be the top-k of its own candidate set — here
    // just check ordering; recall vs exact is PropertySpec's job
    val sims = lsh.map(_.getAs[Double]("cos_sim"))
    assert(sims.sameElements(sims.sorted(Ordering[Double].reverse)))
  }

  test("batched top-k: each query's ranks equal an independent per-query brute force") {
    import spark.implicits._
    val got = SimilarityOps.simTopKBatch(spark, SfDir).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rnk"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("cos_sim")))
    assert(got.map(_._1).distinct.length == SimilarityOps.BatchQueries)
    val vecs = Tables.embeddings(spark, SfDir)
      .filter(!exists(col("embedding"), x => isnan(x)))
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
      .map { case (id, e) => id -> e.map(_.toDouble) }
    // independent: rank every corpus vector against every query by plain
    // Scala loops and the portable rounding, then take each query's top-k
    val expect = vecs.filter(_._1 < SimilarityOps.BatchQueries).flatMap { case (qid, q) =>
      val qn = math.sqrt(q.map(x => x * x).sum)
      vecs.filter(_._1 != qid).map { case (id, v) =>
        val dot = v.zip(q).map { case (a, b) => a * b }.sum
        val cos = math.floor(
          dot / (math.sqrt(v.map(x => x * x).sum) * qn) * 10000.0 + 0.5) / 10000.0
        (qid, id, cos)
      }.sortBy(t => (-t._3, t._2)).take(SimilarityOps.BatchK)
        .zipWithIndex.map { case ((g, id, cos), i) => (g, i + 1, id, cos) }
    }
    assert(got.sortBy(t => (t._1, t._2)).toSeq === expect.sortBy(t => (t._1, t._2)).toSeq)
  }

  test("IVF top-k: exact scores, candidates drawn from probed posting lists") {
    val ivf = SimilarityOps.simTopKIvf(spark, SfDir, k = 10, nProbe = 2).collect()
    assert(ivf.nonEmpty)
    val all = SimilarityOps.simTopK(spark, SfDir).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cos_sim"))).toMap
    // exact scoring within probed lists: any IVF hit also in the brute-force
    // top-10 must carry the identical score
    ivf.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      all.get(id).foreach(s => assert(s == r.getAs[Double]("cos_sim"), s"vec $id"))
    }
    // probed lists cover at most nProbe labels
    assert(ivf.map(_.getAs[Int]("label")).distinct.length <= 2)
    val sims = ivf.map(_.getAs[Double]("cos_sim"))
    assert(sims.sameElements(sims.sorted(Ordering[Double].reverse)))
  }

  test("approx_count_distinct within 5% of exact") {
    val e = Tables.events(spark, SfDir)
    val joined = e.groupBy("event_type")
      .agg(
        count_distinct(col("user_id")).as("exact"),
        approx_count_distinct(col("user_id")).as("approx")
      )
      .collect()
    joined.foreach { r =>
      val ex = r.getAs[Long]("exact").toDouble
      val ap = r.getAs[Long]("approx").toDouble
      assert(math.abs(ap - ex) / ex <= 0.05, s"approx $ap vs exact $ex")
    }
  }

  test("sessionize: gap >= 30min splits, < 30min merges") {
    val df = eventsDf(Seq(
      (1L, "2024-01-01 00:00:00", 1L, "click", 1.0, "{}"),
      (2L, "2024-01-01 00:29:59", 1L, "click", 2.0, "{}"), // merges (< 30min)
      (3L, "2024-01-01 01:10:00", 1L, "click", 4.0, "{}"), // gap > 30min → new
      (4L, "2024-01-02 00:00:00", 2L, "click", 8.0, "{}")  // other user
    ))
    val got = SessionOps.sessionizeOn(df)
      .select("user_id", "n_events", "total_value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq
      .sortBy(x => (x._1, x._3))
    assert(got == Seq((1L, 2L, 3.0), (1L, 1L, 4.0), (2L, 1L, 8.0)))
  }

  test("top bigrams + lm score: fixture results match a plain-Scala recompute") {
    val docs = Tables.documents(spark, SfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // independent: sequential tokenize → adjacent pairs → counts
    val perDoc = docs.map { case (id, text) =>
      val t = text.trim.split("\\s+")
      id -> (if (t.length >= 2) t.sliding(2).map(_.mkString(" ")).toSeq else Seq.empty)
    }
    val corpus = perDoc.flatMap(_._2).groupBy(identity).map { case (b, xs) => b -> xs.size.toLong }
    val expTop = corpus.toSeq.sortBy { case (b, c) => (-c, b) }.take(20)
    val gotTop = TextOps.topBigrams(spark, SfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(gotTop.toSeq === expTop.map { case (b, c) => (b, c) })
    val gotLm = TextOps.lmScore(spark, SfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val expLm = perDoc.filter(_._2.nonEmpty).map { case (id, bs) =>
      val s = bs.map(corpus).sum
      id -> ((bs.size.toLong, s, s / bs.size))
    }.toMap
    assert(gotLm === expLm)
  }

  test("lm score: sub-two-token documents emit no row; typical text outscores rare junk") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat"),
      (3L, "zzq"),            // one token → no bigrams → no row
      (4L, "xju qwv")         // bigram unique in corpus → minimum score
    ).toDF("doc_id", "text")
    val got = TextOps.lmScoreOn(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(!got.contains(3L))
    // doc 2's bigrams ("the cat", "cat sat") each appear twice in the
    // corpus → mean 2; doc 4's singleton bigram → mean 1; doc 1 mixes
    // shared and unique pairs (sum 7 over 5 → integer mean 1, sum above
    // the singleton's)
    assert(got(4L) === ((1L, 1L, 1L)), got.toString)
    assert(got(2L) === ((2L, 4L, 2L)), got.toString)
    assert(got(1L) === ((5L, 7L, 1L)), got.toString)
    assert(got(2L)._3 > got(4L)._3 && got(1L)._2 > got(4L)._2)
  }

  test("funnel: stages require strict order; out-of-order and same-instant don't advance") {
    val df = eventsDf(Seq(
      // user 1: full ordered funnel
      (1L, "2024-01-01 00:00:00", 1L, "click", 1.0, "{}"),
      (2L, "2024-01-01 00:10:00", 1L, "signup", 1.0, "{}"),
      (3L, "2024-01-01 00:20:00", 1L, "purchase", 1.0, "{}"),
      // user 2: signup BEFORE first click — must not count as stage 2
      (4L, "2024-01-01 00:05:00", 2L, "signup", 1.0, "{}"),
      (5L, "2024-01-01 00:06:00", 2L, "click", 1.0, "{}"),
      // user 3: click then SAME-INSTANT signup — strict > excludes it
      (6L, "2024-01-01 00:07:00", 3L, "click", 1.0, "{}"),
      (7L, "2024-01-01 00:07:00", 3L, "signup", 1.0, "{}"),
      // user 4: clicks only
      (8L, "2024-01-01 00:08:00", 4L, "click", 1.0, "{}"),
      // user 5: purchase without signup — stage 3 requires stage 2
      (9L, "2024-01-01 00:01:00", 5L, "click", 1.0, "{}"),
      (10L, "2024-01-01 00:02:00", 5L, "purchase", 1.0, "{}")
    ))
    val got = SessionOps.funnelOn(df, SessionOps.FunnelStages).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    // stage 1: users 1,2,3,4,5; stage 2: user 1 only; stage 3: user 1 only
    assert(got === Seq(
      (1, "click", 5L, 1000L),
      (2, "signup", 1L, 200L),
      (3, "purchase", 1L, 200L)), got.mkString(","))
    // skew-safe arm (external-sorted streaming fold) is pointwise equal
    val safe = SessionOps.funnelOn(df, SessionOps.FunnelStages, skewSafe = true)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(safe === got, s"skew-safe arm diverged: $safe vs $got")
  }

  test("funnel: skew-safe arm equals the in-row fold on the sf0.001 fixture") {
    val a = SessionOps.funnelOn(Tables.events(spark, SfDir), SessionOps.FunnelStages,
      skewSafe = false).collect().map(_.toSeq).toSeq
    val b = SessionOps.funnelOn(Tables.events(spark, SfDir), SessionOps.FunnelStages,
      skewSafe = true).collect().map(_.toSeq).toSeq
    assert(a === b)
  }

  test("retention cohorts: first-seen week anchors, multi-activity weeks count once") {
    val df = eventsDf(Seq(
      // cohort week W: users 1,2 first seen 2024-01-01 (Mon); epoch-day div
      // 7 weeks — NOT calendar weeks, so the exact ids don't matter, only
      // the differences
      (1L, "2024-01-01 00:00:00", 1L, "click", 1.0, "{}"),
      (2L, "2024-01-02 00:00:00", 2L, "click", 1.0, "{}"),
      // user 1 active twice in week W+1 → counts ONCE
      (3L, "2024-01-08 00:00:00", 1L, "view", 1.0, "{}"),
      (4L, "2024-01-09 00:00:00", 1L, "click", 1.0, "{}"),
      // user 2 skips a week, returns in W+2
      (5L, "2024-01-16 00:00:00", 2L, "click", 1.0, "{}"),
      // user 3 is its own later cohort
      (6L, "2024-01-17 00:00:00", 3L, "click", 1.0, "{}")
    ))
    val rows = SessionOps.retentionCohortsOn(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq.sorted
    val w0 = rows.head._1 // the 2024-01-01 cohort's epoch-week id
    assert(rows === Seq(
      (w0, 0L, 2L, 1000L),      // both users active in their first week
      (w0, 1L, 1L, 500L),       // user 1 — once, despite two events that week
      (w0, 2L, 1L, 500L),       // user 2 returns after skipping a week
      (w0 + 2L, 0L, 1L, 1000L)  // user 3's solo later cohort
    ), rows.mkString(","))
  }

  test("uptime: heartbeat coverage caps at the timeout, long gaps count interruptions") {
    // metric m: gaps of 2 min (covered in full), 10 min (capped at 5 and
    // one interruption), then the trailing heartbeat's full timeout window
    val df = eventsDf(Seq(
      (1L, "2024-01-01 00:00:00", 1L, "m", 1.0, "{}"),
      (2L, "2024-01-01 00:02:00", 1L, "m", 1.0, "{}"),
      (3L, "2024-01-01 00:12:00", 1L, "m", 1.0, "{}"),
      (4L, "2024-01-01 09:00:00", 2L, "lone", 1.0, "{}") // single heartbeat
    ))
    val got = SessionOps.uptimeOn(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val min5 = 5L * 60 * 1000000
    // m: 2min + min(10min, 5min) + trailing 5min = 12 min up, 1 interruption
    assert(got("m") === ((2L * 60 * 1000000 + min5 + min5, 1L, 3L)))
    // a single heartbeat is up for exactly one timeout window, no gaps
    assert(got("lone") === ((min5, 0L, 1L)))
  }

  test("uptime: two-phase (metric, day) arm equals single-phase across day boundaries") {
    // gaps that straddle midnight exercise the boundary-repair carry: the
    // last sample of a day must measure its gap to the NEXT PRESENT day's
    // first sample (2024-01-02 is silent for m — the carry skips it)
    val df = eventsDf(Seq(
      (1L, "2024-01-01 23:58:00", 1L, "m", 1.0, "{}"),
      (2L, "2024-01-01 23:59:00", 1L, "m", 1.0, "{}"),
      (3L, "2024-01-03 00:01:00", 1L, "m", 1.0, "{}"),  // >1 day gap → interruption
      (4L, "2024-01-03 00:02:00", 1L, "m", 1.0, "{}"),
      (5L, "2024-01-01 23:59:30", 2L, "n", 1.0, "{}"),
      (6L, "2024-01-02 00:00:30", 2L, "n", 1.0, "{}"),  // 1-min midnight gap, covered
      (7L, "2024-01-02 00:03:30", 2L, "n", 1.0, "{}")
    ))
    val single = SessionOps.uptimeOn(df, twoPhase = false).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val two = SessionOps.uptimeOn(df, twoPhase = true).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(single === two, s"single=$single two=$two")
    val min5 = 5L * 60 * 1000000
    // m: two 1-min gaps + capped interruption gap (5min) + trailing 5min
    assert(two.find(_._1 == "m").get === (("m", 2L * 60000000L + min5 + min5, 1L, 4L)))
    // n: 60s + 180s + trailing 5min, zero interruptions
    assert(two.find(_._1 == "n").get === (("n", 240000000L + min5, 0L, 3L)))
  }

  test("state_agg: dwell ends at the user's next event; open states contribute zero") {
    val df = eventsDf(Seq(
      (1L, "2024-01-01 00:00:00", 1L, "idle", 1.0, "{}"),   // 10 min idle
      (2L, "2024-01-01 00:10:00", 1L, "busy", 1.0, "{}"),   // 5 min busy
      (3L, "2024-01-01 00:15:00", 1L, "idle", 1.0, "{}"),   // open → 0
      (4L, "2024-01-01 00:00:00", 2L, "busy", 1.0, "{}"),   // 20 min busy
      (5L, "2024-01-01 00:20:00", 2L, "idle", 1.0, "{}")    // open → 0
    ))
    val got = SessionOps.stateAggOn(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got("idle") === ((10L * 60 * 1000000, 3L, 10L * 60 * 1000000 / 3)))
    assert(got("busy") === ((25L * 60 * 1000000, 2L, 25L * 60 * 1000000 / 2)))
  }

  test("simhash: band pairs EQUAL brute-force all-pairs hamming <= 3 (pigeonhole lossless)") {
    import graft.ops.DedupOps
    val got = DedupOps.dedupSimhash(spark, SfDir)
      .select("i", "j", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got.nonEmpty, "fixture contains near-identical docs")
    // brute-force reference over the signatures themselves: the 4x15-bit
    // banding claims to be LOSSLESS for hd <= 3 (pigeonhole) — so the band
    // join's output must equal the full quadratic scan, not just satisfy
    // its own post-filter. A broken band split (wrong shift stride)
    // silently drops pairs that this set-equality catches.
    val sims = Tables.documents(spark, SfDir)
      .select(col("doc_id"), DedupOps.simhashSigCol(col("text")).as("sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val ref = (for {
      a <- sims.indices.iterator
      b <- (a + 1 until sims.length).iterator
      hd = java.lang.Long.bitCount(sims(a)._2 ^ sims(b)._2)
      if hd <= DedupOps.SimHammingMax
    } yield {
      val (i, j) = (sims(a)._1, sims(b)._1)
      (math.min(i, j), math.max(i, j), hd)
    }).toSet
    assert(got == ref,
      s"band join != brute force: missed=${(ref -- got).take(5)} extra=${(got -- ref).take(5)}")
  }

  test("embedding near-dup pairs are symmetric-free (i < j) and above threshold") {
    import graft.ops.SimilarityOps
    val got = SimilarityOps.dedupEmbed(spark, SfDir).collect()
    got.foreach { r =>
      assert(r.getAs[Long]("i") < r.getAs[Long]("j"))
      assert(r.getAs[Double]("cos_sim") >= SimilarityOps.EmbedCosineThreshold - 1e-4)
    }
    // composite blocking key: every pair agrees on label AND the sign bits
    // of the first k dims, k data-derived from the corpus counts (the
    // bound that keeps average blocks ~TargetBlockRows instead of O(N))
    val emb = Tables.embeddings(spark, SfDir)
    val st = emb.agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)),
      org.apache.spark.sql.functions.count_distinct(col("label"))).head()
    val k = SimilarityOps.subBucketBits(st.getLong(0), st.getLong(1))
    val signs = emb.collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (0 until k)
          .map(d => r.getSeq[Float](r.fieldIndex("embedding"))(d) >= 0f))
      .toMap
    got.foreach { r =>
      assert(signs(r.getAs[Long]("i")) == signs(r.getAs[Long]("j")),
        s"pair crosses sign sub-buckets: ${r}")
    }
  }

  test("multimodal: stub features are normalized histograms, deterministic") {
    import graft.ops.MultimodalOps
    val a = MultimodalOps.multimodalFeaturesTyped(spark, SfDir).orderBy("doc_id").collect()
    val b = MultimodalOps.multimodalFeaturesTyped(spark, SfDir).orderBy("doc_id").collect()
    assert(a.length == Tables.documents(spark, SfDir).count())
    a.zip(b).foreach { case (x, y) => assert(x == y, "deterministic decode stub") }
    a.foreach { r =>
      val feats = r.getSeq[Double](r.fieldIndex("features"))
      assert(feats.length == MultimodalOps.HistBins)
      assert(math.abs(feats.sum - 1.0) < 1e-9, "histogram normalized")
    }
    // registered (flattened) form: scalar f0..f7 columns, rounded, sortable
    val flat = MultimodalOps.multimodalFeatures(spark, SfDir)
    val cols = flat.columns
    assert((0 until MultimodalOps.HistBins).forall(i => cols.contains(s"f$i")))
    val head = flat.head()
    val sum = (0 until MultimodalOps.HistBins).map(i => head.getAs[Double](s"f$i")).sum
    assert(math.abs(sum - 1.0) < 1e-3, "rounded histogram still ~normalized")
  }

  test("multimodal resize/frames: stride arithmetic consistent with metadata") {
    import graft.ops.MultimodalOps
    val rs = MultimodalOps.multimodalResize(spark, SfDir).collect()
    assert(rs.length == Tables.documents(spark, SfDir).count())
    rs.foreach { r =>
      val (orig, resized) = (r.getAs[Long]("orig_units"), r.getAs[Long]("resized_units"))
      assert(resized == (orig + MultimodalOps.ResizeStride - 1) / MultimodalOps.ResizeStride)
      assert(r.getAs[Long]("checksum") > 0 || orig == 0)
    }
    val fs = MultimodalOps.multimodalFrames(spark, SfDir).collect()
    fs.foreach { r =>
      val (nf, ns) = (r.getAs[Long]("n_frames"), r.getAs[Long]("n_sampled"))
      assert(ns == (nf + MultimodalOps.FrameStride - 1) / MultimodalOps.FrameStride)
    }
  }

  test("multimodal dedup: perceptual-key groups equal a plain-Scala replay") {
    import graft.ops.MultimodalOps
    // independent key computation straight from the fixture text
    val docs = Tables.documents(spark, SfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("")))
    val want = docs.map { case (id, text) =>
      val hist = new Array[Long](MultimodalOps.HistBins)
      var n = 0L
      val it = text.codePoints().iterator()
      while (it.hasNext) { val cp = it.nextInt(); hist((cp & 0xFF) >> 5) += 1; n += 1 }
      val key = (0 until MultimodalOps.HistBins).map(b =>
        ((hist(b) * MultimodalOps.PkeyLevels) / math.max(n, 1L)) << (7 * b)).sum
      (id, key)
    }.groupBy(_._2).map { case (key, members) =>
      (members.map(_._1).min, members.size.toLong, key)
    }.toSeq.sortBy(_._1)
    val got = MultimodalOps.multimodalDedup(spark, SfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("pkey"))).toSeq
    assert(got === want)
    // the key is coarser than exact-byte identity but must DISCRIMINATE:
    // multiple groups (not one corpus-wide bucket), and at least one key
    // still groups multiple docs (the fixture's small-edit near-dups)
    assert(got.length <= docs.length)
    assert(got.length > 1, "every doc quantized to one key — key too coarse")
    assert(got.exists(_._2 > 1L), "fixture has no perceptual collisions — key too fine")
  }

  test("text stats: token counts and ratios on a known doc") {
    import org.apache.spark.sql.Row
    val doc = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, "the quick a  fox", "en", "src0", 16L)), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("lang", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("source", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n_chars", org.apache.spark.sql.types.LongType)
      ))
    )
    // reuse the op body via a temp dir is overkill — assert the expressions
    val r = doc
      .withColumn("toks", split(trim(col("text")), "\\s+"))
      .select(
        size(col("toks")).as("n_tokens"),
        expr("size(filter(toks, t -> t IN ('the', 'a')))").as("n_stop")
      )
      .head()
    assert(r.getInt(0) == 4 && r.getInt(1) == 2)
  }

  test("dedup rate by source: totals tie out against corpus and exact dedup") {
    val out = TextOps.dedupRateBySource(spark, SfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    val docs = Tables.documents(spark, SfDir)
    assert(out.map(_._2).sum == docs.count(), "per-source docs don't sum to corpus")
    out.foreach { case (src, n, d, pm) =>
      assert(d >= 1 && d <= n, s"$src: distinct $d outside [1, $n]")
      assert(pm == (n - d) * 1000 / n, s"$src: permille formula drift")
    }
    // per-source distinct recomputed independently
    val ref = docs.groupBy(col("source"))
      .agg(countDistinct(TextOps.normText(col("text"))).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { case (src, _, d, _) => assert(ref(src) == d, s"$src distinct mismatch") }
  }

  test("term_counts: in-row frequencies == explode+groupBy reference; ascending terms") {
    val docs = Tables.documents(spark, SfDir).limit(100)
    val native = docs
      .select(col("doc_id"), explode(TextOps.termCounts(col("text"))).as("tc"))
      .select(col("doc_id"), col("tc.term").as("term"), col("tc.c").as("c"))
    val ref = docs
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("c"))
    assert(native.exceptAll(ref).count() == 0 && ref.exceptAll(native).count() == 0,
      "native term_counts disagrees with the explode+groupBy reference")
    // ascending term order inside each array
    val arrays = docs.select(TextOps.termCounts(col("text")).as("tcs"))
      .select(expr("transform(tcs, t -> t.term)").as("ts")).collect()
    arrays.foreach { r =>
      val ts = r.getSeq[String](0)
      assert(ts == ts.sorted, s"terms not ascending: $ts")
    }
  }

  test("term_counts: trim/whitespace tokenization edge cases match split semantics") {
    import org.apache.spark.sql.Row
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("  a  b\ta a "), Row(""), Row("   "), Row("x")), 1), schema)
    val out = df.select(
        TextOps.termCounts(col("text")).as("tcs"),
        split(trim(col("text")), "\\s+").as("ref"))
      .collect()
    out.foreach { r =>
      val total = r.getSeq[Row](0).map(_.getLong(1)).sum
      assert(total == r.getSeq[String](1).size,
        s"token totals diverge from split(trim): $r")
    }
    val first = out(0).getSeq[Row](0).map(t => (t.getString(0), t.getLong(1)))
    assert(first == Seq(("a", 3L), ("b", 1L)))
  }

  test("top terms: counts match an independent token scan; ordered desc") {
    val out = TextOps.topTerms(spark, SfDir).collect()
    assert(out.length == 20)
    val cnts = out.map(_.getLong(1))
    assert(cnts.sameElements(cnts.sortBy(-_)), "not ordered by cnt desc")
    val byTerm = Tables.documents(spark, SfDir)
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("cnt"), countDistinct(col("doc_id")).as("doc_freq"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    out.foreach { r =>
      val (cnt, dfreq) = byTerm(r.getString(0))
      assert(r.getLong(1) == cnt && r.getLong(2) == dfreq, s"mismatch for $r")
    }
  }

  test("tfidf: top-3 per doc, scores reproduce the integer formula") {
    val out = SparkEntry.queries("q_tfidf")(spark, SfDir).collect()
    val n = Tables.documents(spark, SfDir).count()
    val perDoc = out.groupBy(_.getLong(0))
    assert(perDoc.values.forall(_.length <= 3))
    perDoc.values.foreach { rs =>
      assert(rs.map(_.getInt(1)).sorted.sameElements(Array.range(1, rs.length + 1)))
      // rank order follows (score desc, term asc)
      val sorted = rs.sortBy(_.getInt(1))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(3) > b.getLong(3) ||
            (a.getLong(3) == b.getLong(3) && a.getString(2) < b.getString(2)))
        case _ =>
      }
    }
    // independent score recomputation for one document
    val docId = out.head.getLong(0)
    val toks = Tables.documents(spark, SfDir).filter(col("doc_id") === docId)
      .select(explode(split(trim(col("text")), "\\s+")).as("term"))
    val ntok = toks.count()
    val dfMap = Tables.documents(spark, SfDir)
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("term"))
      .distinct().groupBy("term").agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val cMap = toks.groupBy("term").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.filter(_.getLong(0) == docId).foreach { r =>
      val term = r.getString(2)
      val expected = math.floor(cMap(term).toDouble * n * 1000000.0 /
        (ntok * dfMap(term))).toLong
      assert(r.getLong(3) == expected, s"score mismatch for $term")
    }
  }
}

/** Reference fold for the simhash A/B test: the typed Aggregator pipeline
  * the native SimHashSig expression replaced — kept here as the oracle the
  * in-row form must reproduce bit-for-bit.
  */
private[graft] class TestSimHashFold(bits: Int)
    extends org.apache.spark.sql.expressions.Aggregator[Long, Array[Int], Long] {
  import org.apache.spark.sql.Encoder
  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
  override def zero: Array[Int] = new Array[Int](bits)
  override def reduce(buf: Array[Int], h: Long): Array[Int] = {
    var b = 0
    while (b < bits) { buf(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1); b += 1 }
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
    while (b < bits) { if (buf(b) > 0) sim |= (1L << b); b += 1 }
    sim
  }
  override def bufferEncoder: Encoder[Array[Int]] = ExpressionEncoder[Array[Int]]()
  override def outputEncoder: Encoder[Long] = ExpressionEncoder[Long]()
}
