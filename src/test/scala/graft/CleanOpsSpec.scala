package graft

import graft.ops.{CleanOps, CurationOps}
import org.apache.spark.sql.functions._

/** Invariants of the cleaning-stage ops asserted against INDEPENDENT
  * references — plain-Scala recomputations over the collected fixture
  * rows, never the operators' own expressions — plus non-degeneracy
  * checks (a filter that keeps or drops everything proves nothing).
  */
class CleanOpsSpec extends SparkSuite {

  private lazy val fixtureDocs: Map[Long, String] =
    Tables.documents(spark, SfDir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  private def wsTokens(text: String): Array[String] =
    text.trim.split("\\s+")

  test("q_pii_redact: masks every email/IP/long-number and counts them") {
    val rows = CleanOps.piiRedact(spark, SfDir).collect()
    assert(rows.nonEmpty)
    val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}".r
    val num4 = "\\d{4,}".r
    rows.foreach { r =>
      val red = r.getAs[String]("redacted")
      // independent scan of the output: nothing PII-shaped survives
      assert(email.findFirstIn(red).isEmpty, s"email survived redaction: $red")
      assert(num4.findFirstIn(red).isEmpty, s"long digit run survived: $red")
      assert(!red.contains("@"), s"@ survived: $red")
      // every synthesized line embeds exactly one email and one IP
      assert(r.getAs[Long]("n_emails") == 1L, red)
      assert(r.getAs[Long]("n_ips") == 1L, red)
      assert(red.contains("<EMAIL>") && red.contains("<IP>"), red)
      // the non-PII payload survives untouched
      assert(red.endsWith(" did click") || red.endsWith(" did view") ||
        red.endsWith(" did purchase") || red.endsWith(" did signup") ||
        red.endsWith(" did error"), red)
    }
  }

  test("q_pii_redact: digit runs >= 4 masked, shorter user ids kept verbatim") {
    val byId = CleanOps.piiRedact(spark, SfDir).collect()
    val events = Tables.events(spark, SfDir).select("event_id", "user_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val shortIds = byId.filter(r => events(r.getAs[Long]("event_id")).toString.length < 4)
    val longIds = byId.filter(r => events(r.getAs[Long]("event_id")).toString.length >= 4)
    // both branches must be exercised by the fixture, else the rule is untested
    assert(shortIds.nonEmpty, "fixture has no short user ids")
    shortIds.foreach { r =>
      val uid = events(r.getAs[Long]("event_id"))
      assert(r.getAs[String]("redacted").startsWith(s"user $uid "),
        s"short id $uid must survive: ${r.getAs[String]("redacted")}")
      assert(r.getAs[Long]("n_nums") == 0L)
    }
    longIds.foreach { r =>
      assert(r.getAs[String]("redacted").startsWith("user <NUM> "), r.toString)
      assert(r.getAs[Long]("n_nums") >= 1L)
    }
  }

  test("q_repetition: fractions match a plain-Scala recount of the fixture") {
    val rows = CleanOps.repetition(spark, SfDir).collect()
    assert(rows.length == fixtureDocs.size)
    def r4(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    rows.foreach { r =>
      val toks = wsTokens(fixtureDocs(r.getAs[Long]("doc_id")))
      val counts = toks.groupBy(identity).map(_._2.length)
      val bigrams = toks.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
      val bCounts = bigrams.groupBy(identity).map(_._2.length)
      assert(r.getAs[Long]("n_tokens") == toks.length.toLong)
      assert(r.getAs[Double]("dup_word_frac") ==
        r4(1.0 - counts.size.toDouble / toks.length))
      assert(r.getAs[Double]("top_word_frac") ==
        r4(counts.max.toDouble / toks.length))
      // a regenerated fixture may contain sub-2-token docs (the operator
      // supports them: n_bigrams=0 edge test below); report that case
      // instead of crashing on empty.max
      if (bigrams.nonEmpty)
        assert(r.getAs[Double]("top_bigram_frac") ==
          r4(bCounts.max.toDouble / bigrams.length))
      else
        assert(r.getAs[Double]("top_bigram_frac") == 0.0,
          s"doc ${r.getAs[Long]("doc_id")}: no bigrams but nonzero top_bigram_frac")
    }
  }

  test("redactCol: arbitrary text — mixed case, multiple hits, precedence") {
    import spark.implicits._
    val rows = Seq(
      (1L, "contact User.Name@EXAMPLE.COM or admin@site.org today"),
      (2L, "ssh 192.168.1.100 then 10.0.0.1, card 4111111111111111"),
      (3L, "id 123 ok, id 9876 masked"),
      (4L, "clean text with no identifiers at all")
    ).toDF("id", "text")
      .select(col("id"), graft.ops.CleanOps.redactCol(col("text")).as("red"))
      .as[(Long, String)].collect().toMap
    // case-insensitive email rule — a scrubber must not leak on case
    assert(rows(1L) == "contact <EMAIL> or <EMAIL> today", rows(1L))
    // IPs masked before the digit-run rule can split them; the card
    // number is a bare digit run
    assert(rows(2L) == "ssh <IP> then <IP>, card <NUM>", rows(2L))
    // runs under 4 digits survive
    assert(rows(3L) == "id 123 ok, id <NUM> masked", rows(3L))
    assert(rows(4L) == "clean text with no identifiers at all")
  }

  test("term_freq_stats: edge cases — empty, single-token, repeated, padded input") {
    import spark.implicits._
    val rows = Seq(
      (1L, ""), // split(trim('')) -> one empty token, like the oracle
      (2L, "solo"),
      (3L, "a a a"),
      (4L, "  x  y x  "), // padding + internal runs collapse
      (5L, "b c b c b")
    ).toDF("id", "text")
      .selectExpr("id", "term_freq_stats(text) AS st") // via the SQL registry
      .selectExpr("id", "st.n_tokens", "st.n_distinct", "st.top_w", "st.n_bigrams", "st.top_b")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows(0) == ((1L, 1L, 1L, 1L, 0L, 0L)))
    assert(rows(1) == ((2L, 1L, 1L, 1L, 0L, 0L)))
    assert(rows(2) == ((3L, 3L, 1L, 3L, 2L, 2L))) // bigram 'a a' twice
    assert(rows(3) == ((4L, 3L, 2L, 2L, 2L, 1L)))
    assert(rows(4) == ((5L, 5L, 2L, 3L, 4L, 2L))) // 'b c' twice beats 'c b'
    // null in, null out
    val n = Seq((1L, null: String)).toDF("id", "text")
      .selectExpr("term_freq_stats(text) AS st").collect()
    assert(n.head.isNullAt(0))
  }

  test("q_quality_filter: keep flag matches an independent rule evaluation; both classes present") {
    val rows = CleanOps.qualityFilter(spark, SfDir).collect()
    rows.foreach { r =>
      val text = fixtureDocs(r.getAs[Long]("doc_id"))
      val toks = wsTokens(text)
      val n = toks.length.toLong
      val avgLen = text.replaceAll("\\s", "").length.toDouble / n
      val nStop = toks.count(t => t == "the" || t == "a").toLong
      val dupFrac = 1.0 - toks.distinct.length.toDouble / n
      val expect = n >= CleanOps.MinTokens && n <= CleanOps.MaxTokens &&
        avgLen >= CleanOps.MinAvgTokenLen && avgLen <= CleanOps.MaxAvgTokenLen &&
        nStop >= CleanOps.MinStopwords && dupFrac < CleanOps.MaxDupWordFrac
      assert(r.getAs[Boolean]("keep") == expect,
        s"doc ${r.getAs[Long]("doc_id")}: keep=${r.getAs[Boolean]("keep")} expected $expect")
    }
    val kept = rows.count(_.getAs[Boolean]("keep"))
    assert(kept > 0 && kept < rows.length,
      s"filter is degenerate on the fixture: $kept/${rows.length} kept")
  }

  test("q_chunk_docs: chunks tile each document and digests verify") {
    val rows = CleanOps.chunkDocs(spark, SfDir).collect()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.keySet == fixtureDocs.keySet)
    byDoc.foreach { case (docId, chunks) =>
      val text = fixtureDocs(docId)
      val sorted = chunks.sortBy(_.getAs[Long]("chunk_idx"))
      // chunk count is exactly ceil(len / stride)
      assert(sorted.length ==
        (text.length + CleanOps.ChunkStride - 1) / CleanOps.ChunkStride)
      sorted.foreach { c =>
        val start = c.getAs[Long]("chunk_start").toInt
        assert((start - 1) % CleanOps.ChunkStride == 0)
        val expect = text.substring(start - 1,
          math.min(text.length, start - 1 + CleanOps.ChunkChars))
        assert(c.getAs[Long]("n_chunk_chars") == expect.length.toLong)
        // digest verified with an independent md5 (java.security, not Spark)
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(expect.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        assert(c.getAs[String]("chunk_md5") == hex, s"doc $docId chunk at $start")
      }
      // consecutive chunks overlap by ChunkChars - ChunkStride chars
      sorted.sliding(2).filter(_.length == 2).foreach { pair =>
        assert(pair(1).getAs[Long]("chunk_start") - pair(0).getAs[Long]("chunk_start") ==
          CleanOps.ChunkStride.toLong)
      }
    }
  }

  test("q_source_mix: shares sum to 1, counts and means match the corpus") {
    val rows = CurationOps.sourceMix(spark, SfDir).collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == fixtureDocs.size.toLong)
    val shareSum = rows.map(_.getAs[Double]("token_share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-3, s"token shares sum to $shareSum")
    // independent reference for one cell: recompute the mean quality from
    // the oracle-checked q_quality_score output
    val q = graft.ops.TextOps.qualityScore(spark, SfDir)
      .join(Tables.documents(spark, SfDir).select("doc_id", "source"), "doc_id")
      .collect().map(r =>
        (r.getAs[String]("source"), r.getAs[String]("lang")) -> r.getAs[Double]("quality"))
    val byCell = q.groupBy(_._1)
    rows.foreach { r =>
      val cell = (r.getAs[String]("source"), r.getAs[String]("lang"))
      val qs = byCell(cell).map(_._2)
      assert(r.getAs[Long]("n_docs") == qs.length.toLong)
      val mean = math.floor(qs.sum / qs.length * 10000.0 + 0.5) / 10000.0
      assert(math.abs(r.getAs[Double]("avg_quality") - mean) < 2e-4,
        s"cell $cell: ${r.getAs[Double]("avg_quality")} vs $mean")
    }
  }
}
