package graft

import graft.ops.RelationalOps
import org.apache.spark.sql.functions._

/** §2B invariants on the sf0.001 fixture + alarm-feed truth table on the
  * hand fixture (SURVEY §7.3.1).
  */
class RelationalOpsSpec extends SparkSuite {

  test("bucket agg: per-bucket counts sum to the filtered row count") {
    val total = Tables.events(spark, SfDir).filter(col("value").isNotNull).count()
    val summed = RelationalOps.bucketAgg(spark, SfDir)
      .agg(sum("sample_count")).head().getLong(0)
    assert(summed == total)
  }

  test("last value matches orderBy head") {
    val viaOp = RelationalOps.lastValue(spark, SfDir).head()
    val expected = Tables.events(spark, SfDir)
      .filter(col("event_type") === "click")
      .orderBy(col("ts").desc, col("event_id").desc)
      .select(col("ts"), col("value"))
      .head()
    assert(viaOp.getTimestamp(0) == expected.getTimestamp(0))
    assert(viaOp.getDouble(1) == expected.getDouble(1))
  }

  test("latest per group: the returned row IS each metric's (ts, event_id)-max row") {
    import org.apache.spark.sql.expressions.Window
    val df = RelationalOps.latestPerGroup(spark, SfDir)
    assert(df.count() == df.select("metric").distinct().count())
    // independent reference: rank every event per metric and take rank 1 —
    // a min_by / wrong-ordering regression returns the wrong row while
    // still producing one row per key
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val expected = Tables.events(spark, SfDir)
      .withColumn("value_str", graft.model.Model.valueStr)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_type").as("metric"), col("ts").as("time"),
        coalesce(col("value_str"), col("value").cast("string")).as("value"))
    assert(df.select("metric", "time", "value").exceptAll(expected).count() == 0 &&
      expected.exceptAll(df.select("metric", "time", "value")).count() == 0,
      "latest-per-group rows differ from the ranked reference")
  }

  test("alarm feed plans a broadcast join for the 1-row CTE side") {
    val plan = RelationalOps.alarmFeed(spark, SfDir).queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), s"expected broadcast join in:\n$plan")
  }

  test("last value plans TakeOrderedAndProject (no global sort)") {
    val plan = RelationalOps.lastValue(spark, SfDir).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan:\n$plan")
  }

  test("scan filter pushes the metric predicate into the parquet scan") {
    val plan = RelationalOps.scanFilter(spark, SfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("event_type"), s"plan:\n$plan")
  }

  test("q_asof_join: matches an independent per-user nearest-prior scan of the fixture") {
    val rows = RelationalOps.asofJoin(spark, SfDir).collect()
    // independent reference: brute-force nearest prior click per error
    val ev = Tables.events(spark, SfDir)
      .select("event_id", "user_id", "ts", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getString(3), r.getDouble(4)))
    val clicksByUser = ev.filter(_._4 == "click").groupBy(_._2)
    val errors = ev.filter(_._4 == "error")
    val expect = errors.flatMap { case (eid, uid, ts, _, v) =>
      clicksByUser.getOrElse(uid, Array.empty)
        .filter(c => !c._3.after(ts)) // click ts <= error ts (inclusive)
        .sortBy(_._3.getTime)
        .lastOption
        .map(c => (eid, uid, ts, v, c._3, c._5))
    }.toSet
    val got = rows.map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
      r.getDouble(3), r.getTimestamp(4), r.getDouble(5))).toSet
    assert(got == expect,
      s"asof mismatch: extra ${(got -- expect).take(3)} / missing ${(expect -- got).take(3)}")
    // inner semantics: some errors have no prior click and must drop
    assert(got.size < errors.length, "no error was dropped — inner as-of not exercised")
    assert(got.nonEmpty)
  }

  test("q_asof_join: a null-valued click is still the match (ASOF returns its value, null included)") {
    import spark.implicits._
    // the fixture is null-free so the oracle cannot catch this: the pair
    // must come from ONE click row — carrying ts and value through two
    // independent ignoreNulls windows would stitch (latest click's ts,
    // latest NON-NULL click's value) and drop errors whose only prior
    // click has a null value
    val e = Seq(
      (1L, 10L, "2024-01-01 00:00:00", Option(5.0), "click"),
      (2L, 10L, "2024-01-01 00:01:00", Option.empty[Double], "click"),
      (3L, 10L, "2024-01-01 00:02:00", Option(7.0), "error"),
      (4L, 20L, "2024-01-01 00:00:30", Option.empty[Double], "click"),
      (5L, 20L, "2024-01-01 00:01:30", Option(9.0), "error")
    ).toDF("event_id", "user_id", "ts_s", "value", "event_type")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val got = RelationalOps.asofJoinOn(e)
      .select("event_id", "click_ts", "click_value")
      .as[(Long, java.sql.Timestamp, Option[Double])].collect().sortBy(_._1)
    assert(got.length == 2, got.mkString("; "))
    // error 3's match is click 2 (the latest), whose value is null —
    // NOT click 1's 5.0
    assert(got(0) == ((3L, java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), None)))
    // user 20's only prior click is null-valued: the error is KEPT
    assert(got(1) == ((5L, java.sql.Timestamp.valueOf("2024-01-01 00:00:30"), None)))
  }

  test("q_gapfill_locf: dense spine, carried values match an independent replay") {
    val rows = RelationalOps.gapfillLocf(spark, SfDir).collect()
    val byMetric = rows.groupBy(_.getString(0))
    assert(byMetric.keySet == Set("click", "view", "purchase", "signup", "error"))
    byMetric.foreach { case (m, rs) =>
      val sorted = rs.sortBy(_.getTimestamp(1).getTime)
      // spine is dense: every consecutive bucket is exactly one minute apart
      sorted.sliding(2).filter(_.length == 2).foreach { p =>
        assert(p(1).getTimestamp(1).getTime - p(0).getTimestamp(1).getTime == 60000L,
          s"$m spine has a hole or duplicate at ${p(0).getTimestamp(1)}")
      }
      // first row is observed (lo = min observed bucket) and gaps exist
      assert(!sorted.head.getBoolean(4), s"$m spine must start on an observation")
      assert(sorted.exists(_.getBoolean(4)), s"$m has no gaps — gapfill unexercised")
      // independent LOCF replay: walking the spine carrying the last
      // non-null avg_value must reproduce locf_value everywhere
      var carried = Double.NaN
      sorted.foreach { r =>
        if (!r.isNullAt(2)) carried = r.getDouble(2)
        assert(r.getDouble(3) == carried,
          s"$m locf diverges at ${r.getTimestamp(1)}: ${r.getDouble(3)} vs $carried")
        // gap rows carry zero samples, observed rows at least one
        if (r.getBoolean(4)) assert(r.getLong(5) == 0L) else assert(r.getLong(5) >= 1L)
      }
    }
  }

  test("q_counter_rate: two-phase (argmax day carries) equals the single-phase form") {
    import org.apache.spark.sql.functions._
    // the two-phase branch is gate-selected only at scale, so the r18
    // ArgMaxKey day-carry rewrite needs an explicit fixture-level equality
    // pin against the single-phase (plain per-metric lag) form
    val rows = Tables.events(spark, SfDir).filter(col("value").isNotNull)
      .select(col("event_type").as("metric"), col("ts"), col("event_id"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getDouble(2), r.getLong(3)))
      .toSet
    assert(canon(RelationalOps.counterRateOn(rows, twoPhase = true)) ===
      canon(RelationalOps.counterRateOn(rows, twoPhase = false)))
  }

  test("q_counter_rate: per-bucket increase matches an independent replay with resets") {
    val rows = RelationalOps.counterRate(spark, SfDir).collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(2), r.getLong(3)))
    // independent replay over the raw events
    val ev = Tables.events(spark, SfDir)
      .select("event_id", "ts", "event_type", "value").collect()
      .filter(!_.isNullAt(3))
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2), r.getDouble(3)))
    val expect = ev.groupBy(_._3).flatMap { case (m, rs) =>
      val ordered = rs.sortBy(r => (r._2.getTime, r._1))
      val cents = ordered.map(r => math.floor(r._4 * 100 + 0.5).toLong)
      val incs = ordered.zip(cents).zipWithIndex.drop(1).map { case ((r, c), i) =>
        val prev = cents(i - 1)
        (m, r._2, if (c >= prev) c - prev else c)
      }
      incs.groupBy { case (_, ts, _) =>
        val cal = java.util.Calendar.getInstance(java.util.TimeZone.getTimeZone("UTC"))
        cal.setTime(ts); cal.set(java.util.Calendar.MINUTE, 0)
        cal.set(java.util.Calendar.SECOND, 0); cal.set(java.util.Calendar.MILLISECOND, 0)
        cal.getTime.getTime
      }.map { case (bucketMs, is) =>
        (m, bucketMs, is.map(_._3).sum.toDouble / 100.0, is.size.toLong)
      }
    }.toSet
    val got = rows.map(r => (r._1, r._2.getTime, r._3, r._4)).toSet
    assert(got == expect,
      s"counter rate mismatch: extra ${(got -- expect).take(3)} missing ${(expect -- got).take(3)}")
    // resets must actually occur in the fixture (values are not monotonic)
    val anyReset = ev.groupBy(_._3).exists { case (_, rs) =>
      val ordered = rs.sortBy(r => (r._2.getTime, r._1)).map(_._4)
      ordered.zip(ordered.drop(1)).exists { case (a, b) => b < a }
    }
    assert(anyReset, "fixture has no counter resets — reset branch unexercised")
  }

  test("q_time_weight: weighted means match an independent replay; differ from plain avg") {
    val rows = RelationalOps.timeWeight(spark, SfDir).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getDouble(2), r.getLong(3)))
    val ev = Tables.events(spark, SfDir)
      .select("event_id", "ts", "event_type", "value").collect()
      .filter(!_.isNullAt(3))
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2), r.getDouble(3)))
    val HourMs = 3600000L
    val expect = ev.groupBy(e => (e._3, e._2.getTime / HourMs * HourMs)).map {
      case ((m, bucketMs), rs) =>
        def epochUs(t: java.sql.Timestamp): Long =
          t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L
        val ordered = rs.sortBy(r => (epochUs(r._2), r._1))
        val cents = ordered.map(r => math.floor(r._4 * 100 + 0.5).toLong)
        val tsUs = ordered.map(r => epochUs(r._2))
        val endUs = (bucketMs + HourMs) * 1000L
        val dts = tsUs.zip(tsUs.drop(1) :+ endUs).map { case (a, b) => b - a }
        val num = cents.zip(dts).map { case (c, d) => c * d }.sum
        val twa = math.floor(num.toDouble / dts.sum.toDouble / 100.0 * 10000.0 + 0.5) / 10000.0
        (m, bucketMs, twa, ordered.size.toLong)
    }.toSet
    val got = rows.toSet
    assert(got == expect,
      s"twa mismatch: extra ${(got -- expect).take(3)} missing ${(expect -- got).take(3)}")
    // the weighting must matter somewhere: at least one bucket's twa
    // differs from its unweighted mean
    val differs = expect.exists { case (m, b, twa, _) =>
      val vs = ev.filter(e => e._3 == m && e._2.getTime / HourMs * HourMs == b).map(_._4)
      math.abs(vs.sum / vs.size - twa) > 1e-3
    }
    assert(differs, "time weighting indistinguishable from plain avg on the fixture")
  }

  test("q_histogram / q_percentiles: match independent replays of the fixture") {
    val ev = Tables.events(spark, SfDir)
      .select("event_id", "event_type", "value").collect()
      .filter(!_.isNullAt(2))
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val byMetric = ev.groupBy(_._2)

    val hist = RelationalOps.histogram(spark, SfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val expectHist = byMetric.flatMap { case (m, rs) =>
      val cents = rs.map(r => math.floor(r._3 * 100 + 0.5).toLong)
      val (lo, hi) = (cents.min, cents.max)
      cents.groupBy { c =>
        if (hi == lo) 0L else math.min(RelationalOps.HistBins - 1L, (c - lo) * RelationalOps.HistBins / (hi - lo))
      }.map { case (bin, cs) => (m, bin) -> cs.size.toLong }
    }
    assert(hist == expectHist, s"histogram mismatch: ${(hist.toSet -- expectHist.toSet).take(3)}")
    // per-metric bin counts must cover every sample
    RelationalOps.histogram(spark, SfDir).collect().groupBy(_.getString(0)).foreach {
      case (m, rows) => assert(rows.map(_.getLong(2)).sum == byMetric(m).length.toLong)
    }

    val pct = RelationalOps.percentiles(spark, SfDir).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    byMetric.foreach { case (m, rs) =>
      val sorted = rs.sortBy(r => (r._3, r._1)).map(_._3)
      RelationalOps.PercentilesPerMille.foreach { pm =>
        val idx = math.max(1L, (sorted.length.toLong * pm + 999) / 1000).toInt - 1
        assert(pct((m, pm)) == sorted(idx), s"$m p$pm: ${pct((m, pm))} vs ${sorted(idx)}")
      }
      // monotone across the percentile ladder
      val ladder = RelationalOps.PercentilesPerMille.map(pm => pct((m, pm)))
      assert(ladder == ladder.sorted, s"$m percentiles not monotone: $ladder")
    }
  }

  test("q_spc_rules: flags match an independent Western-Electric replay; both rules fire") {
    val rows = RelationalOps.spcRules(spark, SfDir).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(4), r.getBoolean(5))).toMap
    val ev = Tables.events(spark, SfDir)
      .select("event_id", "ts", "event_type", "value").collect()
      .filter(!_.isNullAt(3))
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2), r.getDouble(3)))
    val expect = scala.collection.mutable.Map.empty[Long, (Boolean, Boolean)]
    ev.groupBy(_._3).foreach { case (_, rs) =>
      val ordered = rs.sortBy(r => (r._2.getTime, r._1))
      val cents = ordered.map(r => math.floor(r._4 * 100 + 0.5).toLong)
      val n = cents.length.toLong
      val sSum = cents.sum
      val q = cents.map(c => c * c).sum
      val mean = sSum.toDouble / n.toDouble
      val sd = math.sqrt((n * q - sSum * sSum).toDouble / (n * (n - 1)).toDouble)
      var runSide = false
      var runLen = 0
      ordered.zip(cents).foreach { case (r, c) =>
        val above = c.toDouble > mean
        runLen = if (runLen > 0 && above == runSide) runLen + 1 else 1
        runSide = above
        val rule1 = math.abs(c.toDouble - mean) > 3.0 * sd
        val rule4 = runLen >= RelationalOps.SpcRunLen
        if (rule1 || rule4) expect(r._1) = (rule1, rule4)
      }
    }
    assert(rows == expect.toMap,
      s"spc mismatch: extra ${(rows.keySet -- expect.keySet).take(3)} missing ${(expect.keySet -- rows.keySet).take(3)}")
    assert(rows.values.exists(_._1) && rows.values.exists(_._2),
      "both SPC rules must fire on the fixture")
  }

  test("gap-fill: two-phase (metric, day) arm equals the single-phase fold pointwise") {
    import org.apache.spark.sql.functions.col
    val rows = Tables.events(spark, SfDir).select(
      col("event_type").as("metric"), col("ts"), col("value"))
    Seq(
      (RelationalOps.gapfillLocfOn(rows, twoPhase = false),
        RelationalOps.gapfillLocfOn(rows, twoPhase = true)),
      (RelationalOps.gapfillInterpOn(rows, twoPhase = false),
        RelationalOps.gapfillInterpOn(rows, twoPhase = true))
    ).foreach { case (a, b) =>
      assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
        "gap-fill arms diverged")
    }
  }

  test("q_gapfill_interp: values sit on the segment between neighbors; trailing gaps null") {
    val rows = RelationalOps.gapfillInterp(spark, SfDir).collect()
    rows.groupBy(_.getString(0)).foreach { case (m, rs) =>
      val sorted = rs.sortBy(_.getTimestamp(1).getTime)
      // independent replay: nearest observed neighbors per gap row
      val obs = sorted.zipWithIndex.filter(!_._1.isNullAt(2))
      val obsIdx = obs.map(_._2)
      sorted.zipWithIndex.foreach { case (r, i) =>
        if (!r.isNullAt(2)) {
          assert(r.getDouble(3) == r.getDouble(2), s"$m observed row altered at $i")
        } else {
          val after = obsIdx.find(_ > i)
          if (after.isEmpty) {
            assert(r.isNullAt(3), s"$m trailing gap interpolated at $i")
          } else {
            val before = obsIdx.filter(_ < i)
            assert(before.nonEmpty,
              s"$m: gap row at index $i precedes the first observation — spine must start observed")
            val lo = before.last
            val hi = after.get
            val (pv, nv) = (sorted(lo).getDouble(2), sorted(hi).getDouble(2))
            val want = pv + (nv - pv) * ((i - lo).toDouble / (hi - lo).toDouble)
            val rounded = math.floor(want * 10000.0 + 0.5) / 10000.0
            assert(r.getDouble(3) == rounded,
              s"$m interp off at $i: ${r.getDouble(3)} vs $rounded")
            // interpolation stays within the segment's value envelope
            assert(r.getDouble(3) >= math.min(pv, nv) - 1e-9 &&
              r.getDouble(3) <= math.max(pv, nv) + 1e-9)
          }
        }
      }
    }
  }
}
