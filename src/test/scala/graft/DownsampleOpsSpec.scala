package graft

import graft.ops.DownsampleOps
import org.apache.spark.sql.Row

/** Downsample operators vs independent plain-Scala recomputes (never the
  * operator's own expressions), plus the LTTB edge rules on synthetic
  * frames: endpoint buckets, the single-bucket metric, and area ties.
  */
class DownsampleOpsSpec extends SparkSuite {

  private val BUs = DownsampleOps.LttbBucketUs

  /** (metric, x µs, y cents, event_id, ts, value) from a raw events Row. */
  private def pts(rows: Array[Row]): Seq[(String, Long, Long, Long, java.sql.Timestamp, Double)] =
    rows.toSeq.flatMap { r =>
      Option(r.getAs[java.sql.Timestamp]("ts")).flatMap { ts =>
        Option(r.getAs[Any]("value")).map { v =>
          val d = v.asInstanceOf[Double]
          (r.getAs[String]("event_type"),
            ts.getTime * 1000 + ts.getNanos / 1000 % 1000,
            math.floor(d * 100 + 0.5).toLong,
            r.getAs[Long]("event_id"), ts, d)
        }
      }
    }

  /** Plain-Scala fixed-anchor LTTB over the point set — sequential maps and
    * sorts, no Spark expressions shared with the operator.
    */
  private def lttbReference(
      ps: Seq[(String, Long, Long, Long, java.sql.Timestamp, Double)])
      : Map[(String, Long), (java.sql.Timestamp, Double)] = {
    val byBucket = ps.groupBy(p => (p._1, p._2 - java.lang.Math.floorMod(p._2, BUs)))
    val avg = byBucket.map { case (k, rows) =>
      val n = rows.size
      val bx = k._2
      val xa = bx + rows.map(_._2 - bx).sum / n
      val ymin = rows.map(_._3).min
      val ya = ymin + (rows.map(_._3).sum - n * ymin) / n
      k -> (xa, ya)
    }
    byBucket.map { case (k @ (metric, bx), rows) =>
      val buckets = avg.keys.filter(_._1 == metric).map(_._2).toSeq.sorted
      val i = buckets.indexOf(bx)
      val left = if (i > 0) Some(avg((metric, buckets(i - 1)))) else None
      val right = if (i < buckets.size - 1) Some(avg((metric, buckets(i + 1)))) else None
      val chosen = (left, right) match {
        case (None, _) => rows.minBy(p => (p._2, p._4)) // first bucket: first point
        case (_, None) => rows.maxBy(p => (p._2, p._4)) // last bucket: last point
        case (Some((xl, yl)), Some((xr, yr))) =>
          // BigInt, like the operator's decimal(38,0): sparse series make
          // (xl − xr) the gap between POPULATED buckets, unbounded in µs
          rows.maxBy(p => (((BigInt(xl) - BigInt(xr)) * (BigInt(p._3) - BigInt(yl)) -
            (BigInt(xl) - BigInt(p._2)) * (BigInt(yr) - BigInt(yl))).abs, -p._4))
      }
      k -> (chosen._5, chosen._6)
    }
  }

  test("q_downsample_ohlc: fixture result matches a plain-Scala per-bucket recompute") {
    val events = Tables.events(spark, SfDir)
    val got = DownsampleOps.downsampleOhlc(spark, SfDir).collect()
    assert(got.nonEmpty)
    val expected = pts(events.collect())
      .groupBy(p => (p._1, p._2 - java.lang.Math.floorMod(p._2, BUs)))
      .map { case (k, rows) =>
        val byTime = rows.sortBy(p => (p._2, p._4))
        k -> (byTime.head._6, rows.map(_._6).max, rows.map(_._6).min,
          byTime.last._6, rows.size.toLong)
      }
    assert(got.length === expected.size)
    got.foreach { r =>
      val ts = r.getAs[java.sql.Timestamp]("bucket")
      val k = (r.getAs[String]("metric"), ts.getTime * 1000)
      val (o, h, l, c, n) = expected(k)
      assert((r.getAs[Double]("open_v"), r.getAs[Double]("high_v"),
        r.getAs[Double]("low_v"), r.getAs[Double]("close_v"),
        r.getAs[Long]("n_samples")) === ((o, h, l, c, n)), s"bucket $k")
    }
  }

  test("q_downsample_lttb: fixture selection matches the plain-Scala fixed-anchor reference") {
    val events = Tables.events(spark, SfDir)
    val got = DownsampleOps.downsampleLttb(spark, SfDir).collect()
    assert(got.nonEmpty)
    val expected = lttbReference(pts(events.collect()))
    assert(got.length === expected.size)
    // downsampling actually happened: strictly fewer points than the corpus
    assert(got.length < events.filter("value IS NOT NULL").count())
    got.foreach { r =>
      val k = (r.getAs[String]("metric"), r.getAs[java.sql.Timestamp]("bucket").getTime * 1000)
      val (ts, v) = expected(k)
      assert(r.getAs[java.sql.Timestamp]("ts") === ts, s"bucket $k")
      assert(r.getAs[Double]("sel_value") === v, s"bucket $k")
    }
  }

  test("q_downsample_lttb edges: endpoint buckets keep first/last, ties pick smallest event_id") {
    // one metric, three hourly buckets. Both anchor averages sit at y=7.0,
    // and the mid bucket's points also have y=7.0 — every mid-bucket area
    // is |(xl−xr)·0 − (xl−x)·0| = 0, an exact tie that must resolve to the
    // smallest event_id. A second single-bucket metric exercises the
    // both-anchors-null rule.
    val e = eventsDf(Seq(
      (1L, "2024-01-01 00:10:00", 1L, "m", 5.0, ""),
      (2L, "2024-01-01 00:50:00", 1L, "m", 9.0, ""), // NOT selected: first bucket keeps first
      (3L, "2024-01-01 01:20:00", 1L, "m", 7.0, ""), // area tie with id 4
      (4L, "2024-01-01 01:40:00", 1L, "m", 7.0, ""),
      (5L, "2024-01-01 02:05:00", 1L, "m", 5.0, ""), // NOT selected: last bucket keeps last
      (6L, "2024-01-01 02:45:00", 1L, "m", 9.0, ""),
      (7L, "2024-01-01 05:00:00", 1L, "solo", 2.0, ""),
      (8L, "2024-01-01 05:30:00", 1L, "solo", 8.0, "")
    ))
    val got = DownsampleOps.downsampleLttbOn(e).collect()
    val sel = got.map(r => (r.getAs[String]("metric"),
      r.getAs[java.sql.Timestamp]("bucket").toString.take(13),
      r.getAs[java.sql.Timestamp]("ts").toString, r.getAs[Double]("sel_value"))).toSet
    assert(sel === Set(
      ("m", "2024-01-01 00", "2024-01-01 00:10:00.0", 5.0),
      ("m", "2024-01-01 01", "2024-01-01 01:20:00.0", 7.0),
      ("m", "2024-01-01 02", "2024-01-01 02:45:00.0", 9.0),
      ("solo", "2024-01-01 05", "2024-01-01 05:00:00.0", 2.0)
    ), got.mkString("\n"))
  }

  test("q_downsample_lttb sparse: 50-day anchor gap area exceeds BIGINT, selection stays exact") {
    // Two populated anchor buckets 50 days apart put (xl − xr) = −4.32e12
    // µs at the interior bucket. The big candidate's cents diff (4,270,080
    // ≈ 2^64 / gap) makes the true area 1.8e19 — one past BIGINT — while
    // 64-bit arithmetic wraps it to |−1.5e12|, BELOW the trivial
    // candidate's 4.32e14: pre-widening code (wrap or ANSI overflow —
    // either way wrong) cannot select the correct point here. The
    // decimal(38,0) operator must pick the big-area point.
    val e = eventsDf(Seq(
      (1L, "2024-01-01 00:00:00", 1L, "m", 0.0, ""),   // left anchor (yl = 0)
      (2L, "2024-01-20 05:10:00", 1L, "m", 1.0, ""),   // trivial candidate, area 4.32e14
      (3L, "2024-01-20 05:20:00", 1L, "m", 42700.8, ""), // true winner, area ~1.8e19
      (4L, "2024-02-20 00:00:00", 1L, "m", 0.0, "")    // right anchor (yr = 0)
    ))
    val got = DownsampleOps.downsampleLttbOn(e).collect()
      .map(r => r.getAs[java.sql.Timestamp]("ts").toString -> r.getAs[Double]("sel_value"))
      .toMap
    assert(got("2024-01-20 05:20:00.0") === 42700.8, got.mkString(","))
    // and the whole frame matches the BigInt plain-Scala reference
    val ref = lttbReference(pts(e.collect())).values
      .map { case (ts, v) => ts.toString -> v }.toMap
    assert(got === ref)
  }

  test("ArgMaxKey === max_by(payload, struct(k1, k2)) across partials, merges and serialization") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graftbridge
    // deterministic pseudo-random (k1 decimal(38,0) spanning > long range,
    // k2 long incl. negatives, payload struct) over few groups and many
    // partitions, so partial buffers shuffle (serialize/deserialize/merge)
    val rnd = new scala.util.Random(42)
    val rows = (1 to 2000).map { i =>
      val grp = rnd.nextInt(7)
      // k1 mixes long-scale and beyond-long-scale magnitudes, with
      // deliberate collisions so the k2 tie-break decides some groups
      val k1 = if (rnd.nextBoolean()) BigDecimal(rnd.nextInt(5))
        else BigDecimal(BigInt(Long.MaxValue)) * (rnd.nextInt(3) + 1) + rnd.nextInt(2)
      (grp, k1.bigDecimal, rnd.nextLong(), i.toLong, s"p$i")
    }
    val df = spark.createDataFrame(rows).toDF("g", "k1raw", "k2", "id", "tag")
      .withColumn("k1", col("k1raw").cast("decimal(38,0)"))
      .repartition(16)
    def amk(k1: org.apache.spark.sql.Column, k2: org.apache.spark.sql.Column,
        p: (String, org.apache.spark.sql.Column)*) =
      graft.functions.ArgMaxKey.structOf(k1, k2, p: _*)
    val payload = struct(col("id"), col("tag"))
    // k2 made unique per (g, k1) would hide merge-order bugs; instead make
    // the FULL pair unique (append id to k2's low bits is wrong for the
    // ordering) — use (k2, id-as-tiebreak) folded into k2 via distinctness:
    // the generator draws k2 from 2^64 so collisions within a (g, k1) are
    // ~impossible; uniqueness of the pair keeps both sides deterministic
    val got = df.groupBy("g")
      .agg(amk(col("k1"), col("k2"), "id" -> col("id"), "tag" -> col("tag")).as("sel"))
      .select(col("g"), col("sel.id"), col("sel.tag")).collect()
      .map(r => (r.getInt(0), (r.getLong(1), r.getString(2)))).toMap
    val want = df.groupBy("g")
      .agg(max_by(payload, struct(col("k1"), col("k2"))).as("sel"))
      .select(col("g"), col("sel.id"), col("sel.tag")).collect()
      .map(r => (r.getInt(0), (r.getLong(1), r.getString(2)))).toMap
    assert(got === want)
    // and against plain Scala, independent of both Spark aggregates
    val ref = rows.groupBy(_._1).map { case (g, rs) =>
      val best = rs.maxBy(r => (BigDecimal(r._2), r._3))
      g -> ((best._4, best._5))
    }
    assert(got === ref)
  }

  test("q_downsample_ohlc edges: single-sample bucket collapses all four prices") {
    val e = eventsDf(Seq(
      (1L, "2024-01-01 00:10:00", 1L, "m", 5.5, ""),
      (2L, "2024-01-01 01:10:00", 1L, "m", 1.0, ""),
      (3L, "2024-01-01 01:20:00", 1L, "m", 9.0, ""),
      (4L, "2024-01-01 01:30:00", 1L, "m", 2.0, "")
    ))
    val got = DownsampleOps.downsampleOhlcOn(e).collect()
      .map(r => r.getAs[java.sql.Timestamp]("bucket").toString.take(13) ->
        (r.getAs[Double]("open_v"), r.getAs[Double]("high_v"),
          r.getAs[Double]("low_v"), r.getAs[Double]("close_v"))).toMap
    assert(got("2024-01-01 00") === ((5.5, 5.5, 5.5, 5.5)))
    assert(got("2024-01-01 01") === ((1.0, 9.0, 1.0, 2.0)))
  }
}
