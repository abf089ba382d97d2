package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TimeSeriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("resampleFill: gaps materialize with n_obs=0 and carried-forward value") {
    // key a: observations at t=0,10 (bucket 0), t=35 (bucket 30),
    // nothing in bucket 60, t=95 (bucket 90) — step 30s
    // key b: single observation (one-bucket span, no gaps)
    val df = Seq(
      ("a", ts(0), 1.0), ("a", ts(10), 5.0), ("a", ts(35), 2.0),
      ("a", ts(95), 7.0),
      ("b", ts(1000), 9.0)
    ).toDF("k", "t", "v")
    val got = TimeSeries.resampleFill(df, Seq("k"), "t", "v", 30L)
      .as[(String, Long, Double, Long)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq == Seq(
      ("a", 0L, 5.0, 2L),    // max of 1.0, 5.0
      ("a", 30L, 2.0, 1L),
      ("a", 60L, 2.0, 0L),   // gap: filled from bucket 30
      ("a", 90L, 7.0, 1L),
      ("b", 990L, 9.0, 1L)))
  }

  test("deterministic under adversarial repartition") {
    val rows = (0 until 500).map { i =>
      (s"k${i % 3}", ts(i * 17L), (i % 13).toDouble)
    }
    val base = rows.toDF("k", "t", "v")
    val a = TimeSeries.resampleFill(base.repartition(1), Seq("k"), "t", "v", 60L)
      .as[(String, Long, Double, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val b = TimeSeries.resampleFill(base.repartition(16), Seq("k"), "t", "v", 60L)
      .as[(String, Long, Double, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(a == b)
    // span is dense: every key covers [min, max] with no missing bucket
    a.groupBy(_._1).foreach { case (_, g) =>
      val bs = g.map(_._2)
      assert(bs.sliding(2).forall(p => p.length < 2 || p(1) - p(0) == 60L))
    }
  }

  test("loud guard on absurd grid size; reserved columns; empty input") {
    val df = Seq(("a", ts(0), 1.0), ("a", ts(100000000L), 2.0))
      .toDF("k", "t", "v")
    val e = intercept[IllegalArgumentException] {
      TimeSeries.resampleFill(df, Seq("k"), "t", "v", 1L,
        maxBucketsPerKey = 1000L)
    }
    assert(e.getMessage.contains("maxBucketsPerKey"))
    val clash = df.withColumn("n_obs", lit(1))
    val e2 = intercept[IllegalArgumentException] {
      TimeSeries.resampleFill(clash, Seq("k", "n_obs"), "t", "v", 30L)
    }
    assert(e2.getMessage.contains("reserved"))
    // a VALUE column literally named "value" is fine — it is aliased
    // into the gauge, the case the events fixture exercises
    assert(TimeSeries.resampleFill(
      df.withColumnRenamed("v", "value"), Seq("k"), "t", "value", 30L)
      .count() > 0L)
    assert(TimeSeries.resampleFill(
      df.filter(lit(false)), Seq("k"), "t", "v", 30L).count() == 0L)
  }

  // ----- changeHistory (SCD2) -----

  test("changeHistory: runs collapse, bounds chain, open period flagged") {
    // user 1: A A B A  -> periods A[0,20) B[20,30) A[30,null)
    // user 2: single event -> one open period
    val df = Seq(
      (1L, ts(0), "A", 10L), (1L, ts(10), "A", 11L),
      (1L, ts(20), "B", 12L), (1L, ts(30), "A", 13L),
      (2L, ts(5), "X", 14L)
    ).toDF("user_id", "t", "attr", "eid")
    val got = TimeSeries.changeHistory(df, Seq("user_id"), "t", "attr", "eid")
      .as[(Long, String, Long, Option[Long], Long, Boolean)]
      .collect().sortBy(r => (r._1, r._3)).toSeq
    val us = 1000000L
    assert(got == Seq(
      (1L, "A", 0L, Some(20L * us), 2L, false),
      (1L, "B", 20L * us, Some(30L * us), 1L, false),
      (1L, "A", 30L * us, None, 1L, true),
      (2L, "X", 5L * us, None, 1L, true)))
  }

  test("changeHistory: same-timestamp ties break by tie column; null attrs run") {
    val df = Seq(
      (1L, ts(0), "A", 1L), (1L, ts(0), "B", 2L), (1L, ts(0), "A", 3L),
      (3L, ts(0), null, 1L), (3L, ts(10), null, 2L), (3L, ts(20), "C", 3L)
    ).toDF("user_id", "t", "attr", "eid")
    val got = TimeSeries.changeHistory(df, Seq("user_id"), "t", "attr", "eid")
      .as[(Long, Option[String], Long, Option[Long], Long, Boolean)]
      .collect().sortBy(r => (r._1, r._3, r._2)).toSeq
    // user 1: three periods all at valid_from 0 (A, B, A by eid order)
    assert(got.count(_._1 == 1L) == 3)
    assert(got.filter(_._1 == 1L).count(_._6) == 1)
    // user 3: null run collapses into ONE period, then C
    val u3 = got.filter(_._1 == 3L)
    assert(u3.map(r => (r._2, r._5)) == Seq((None, 2L), (Some("C"), 1L)))
  }

  test("trailingWindow: closed day interval, same-day peers, aging out") {
    // key a: days 0, 0 (peers), 2, 29, 31 — window 30 days means the
    // frame at day d covers [d-29, d]; day 31 drops both day-0 rows
    // but keeps days 2 and 29
    def day(d: Long) = ts(d * 86400L)
    val df = Seq(
      ("a", day(0), 10L), ("a", day(0), 20L), ("a", day(2), 1L),
      ("a", day(29), 5L), ("a", day(31), 100L),
      ("b", day(1000), 7L)
    ).toDF("k", "t", "v")
    val got = TimeSeries.trailingWindow(df, Seq("k"), "t", "v", 30)
      .select("k", "day", "v", "trail_sum", "trail_cnt")
      .as[(String, Long, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._2, r._3)).toSeq
    assert(got == Seq(
      ("a", 0L, 10L, 30L, 2L),   // same-day peer included both ways
      ("a", 0L, 20L, 30L, 2L),
      ("a", 2L, 1L, 31L, 3L),
      ("a", 29L, 5L, 36L, 4L),   // day 0 still inside [0, 29]
      ("a", 31L, 100L, 106L, 3L), // day-0 rows aged out
      ("b", 1000L, 7L, 7L, 1L)))
  }

  test("trailingWindow: deterministic under repartition; rejects double values") {
    val rows = (0 until 600).map { i =>
      (i % 5L, ts((i % 90) * 86400L + i), (i % 23).toLong)
    }
    val df = rows.toDF("k", "t", "v")
    val a = TimeSeries.trailingWindow(df.repartition(1), Seq("k"), "t", "v", 7)
      .select("k", "day", "v", "trail_sum", "trail_cnt")
      .as[(Long, Long, Long, Long, Long)].collect().sorted.toSeq
    val b = TimeSeries.trailingWindow(df.repartition(17), Seq("k"), "t", "v", 7)
      .select("k", "day", "v", "trail_sum", "trail_cnt")
      .as[(Long, Long, Long, Long, Long)].collect().sorted.toSeq
    assert(a == b && a.size == 600)
    // brute-force oracle on a sample of rows
    val byKey = rows.groupBy(_._1)
    a.grouped(37).map(_.head).foreach { case (k, d, _, s, n) =>
      val inFrame = byKey(k).map(r => ((r._2.getTime / 1000) / 86400, r._3))
        .filter { case (rd, _) => rd >= d - 6 && rd <= d }
      assert(s == inFrame.map(_._2).sum && n == inFrame.size.toLong)
    }
    val bad = Seq(("a", ts(0), 1.5)).toDF("k", "t", "v")
    val e = intercept[IllegalArgumentException] {
      TimeSeries.trailingWindow(bad, Seq("k"), "t", "v", 7)
    }
    assert(e.getMessage.contains("integral"))
  }

  test("snapshotAt == direct latest-event answer; unborn keys absent") {
    val rows = (0 until 400).map { i =>
      (i % 9L, ts(i * 31L), s"s${(i / 7) % 4}", i.toLong)
    } :+ ((100L, ts(999999L), "late", 9999L)) // born after the snapshot
    val df = rows.toDF("user_id", "t", "attr", "eid")
    val hist = TimeSeries.changeHistory(df, Seq("user_id"), "t", "attr", "eid")
    val tSnap = 200L * 31L * 1000000L // micros
    val snap = TimeSeries.snapshotAt(hist, tSnap)
      .select("user_id", "value")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    // reference: latest event at or before tSnap per user
    val direct = rows.filter(_._2.getTime * 1000L <= tSnap)
      .groupBy(_._1).map { case (u, g) =>
        (u, g.maxBy(r => (r._2.getTime, r._4))._3)
      }.toSeq.sortBy(_._1)
    assert(snap == direct)
    // exactly one row per live key, none for the late-born key
    assert(snap.map(_._1).distinct.size == snap.size)
    assert(!snap.exists(_._1 == 100L))
    // as-of the far future: every key current, values == final events
    val end = TimeSeries.snapshotAt(hist, Long.MaxValue)
    assert(end.count() == 10L &&
      end.filter(col("is_current")).count() == 10L)
  }

  test("changeHistory deterministic under repartition; period count == change count") {
    val rows = (0 until 400).map { i =>
      (i % 7L, ts(i * 13L), s"s${(i / 11) % 3}", i.toLong)
    }
    val df = rows.toDF("user_id", "t", "attr", "eid")
    val a = TimeSeries.changeHistory(df.repartition(11), Seq("user_id"),
      "t", "attr", "eid")
      .as[(Long, String, Long, Option[Long], Long, Boolean)]
      .collect().sortBy(r => (r._1, r._3)).toSeq
    val b = TimeSeries.changeHistory(df, Seq("user_id"), "t", "attr", "eid")
      .as[(Long, String, Long, Option[Long], Long, Boolean)]
      .collect().sortBy(r => (r._1, r._3)).toSeq
    assert(a == b)
    // events are conserved: per-user n_events sums to the input count
    assert(a.map(_._5).sum == 400L)
    // exactly one open period per user
    assert(a.count(_._6) == 7)
  }

  test("groupTrend recovers an exact line: slope/intercept/r2 are exact") {
    // y = 3x + 7 sampled at x = 0..9: a perfect fit must come back
    // bitwise exact (every moment sum is integral and the closed
    // forms divide exactly)
    val df = (0L to 9L).map(x => ("a", x, 3 * x + 7)).toDF("g", "x", "y")
    val r = TimeSeries.groupTrend(df, Seq("g"), "x", "y").collect().head
    assert(r.getAs[Long]("n") == 10L)
    assert(r.getAs[Double]("slope") == 3.0)
    assert(r.getAs[Double]("intercept") == 7.0)
    assert(r.getAs[Double]("r2") == 1.0)
  }

  test("groupTrend hand-computed non-exact fit + degenerate groups") {
    // group "b": points (0,0),(1,0),(2,3) -> slope 1.5, intercept -0.5
    // group "c": constant x -> NULL fit; group "d": single point -> NULL
    val df = Seq(
      ("b", 0L, 0L), ("b", 1L, 0L), ("b", 2L, 3L),
      ("c", 5L, 1L), ("c", 5L, 9L),
      ("d", 2L, 4L)
    ).toDF("g", "x", "y")
    val m = TimeSeries.groupTrend(df, Seq("g"), "x", "y")
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    assert(m("b").getAs[Double]("slope") == 1.5)
    assert(m("b").getAs[Double]("intercept") == -0.5)
    // r2 = num^2/(den*deny): num=9, den=6, deny=3*9-9=18 -> 81/108
    assert(m("b").getAs[Double]("r2") == 81.0 / 108.0)
    assert(m("c").isNullAt(m("c").fieldIndex("slope")))
    assert(m("d").isNullAt(m("d").fieldIndex("slope")))
    assert(m("c").isNullAt(m("c").fieldIndex("r2")))
  }

  test("groupTrend moment sums are repartition-invariant; contracts loud") {
    val rows = (0 until 300).map(i => (s"g${i % 3}", (i % 50).toLong,
      ((i * 7) % 23).toLong))
    val df = rows.toDF("g", "x", "y")
    val a = TimeSeries.groupTrend(df.repartition(13), Seq("g"), "x", "y")
      .orderBy("g").collect().toSeq
    val b = TimeSeries.groupTrend(df.coalesce(1), Seq("g"), "x", "y")
      .orderBy("g").collect().toSeq
    assert(a == b)
    val e = intercept[IllegalArgumentException] {
      TimeSeries.groupTrend(
        Seq(("a", 1.0, 2L)).toDF("g", "x", "y"), Seq("g"), "x", "y")
    }
    assert(e.getMessage.contains("must be integral"))
    val e2 = intercept[IllegalArgumentException] {
      TimeSeries.groupTrend(
        Seq(("a", 1L, 2L)).toDF("slope", "x", "y"), Seq("slope"), "x", "y")
    }
    assert(e2.getMessage.contains("reserved"))
  }

  test("volumeAnomaly: a planted spike flags; steady days and warmup don't") {
    // key A: 10 events/day for days 0..9, then 100 on day 10, 10 on 11
    def day(d: Int, i: Int) = ts(d * 86400L + i)
    val rows =
      (0 until 10).flatMap(d => (0 until 10).map(i => ("A", day(d, i)))) ++
      (0 until 100).map(i => ("A", day(10, i))) ++
      (0 until 10).map(i => ("A", day(11, i)))
    val df = rows.toDF("k", "t")
    val got = TimeSeries.volumeAnomaly(df, Seq("k"), "t",
      windowDays = 7, minDays = 5)
      .orderBy("day")
      .collect().map(r => (r.getAs[Long]("day"), r.getAs[Long]("cnt"),
        r.getAs[Long]("trail_days"), r.getAs[Boolean]("is_anomaly")))
    // epoch day of fixture day 0
    val d0 = got.head._1
    val byDay = got.map(r => (r._1 - d0, r)).toMap
    // warmup: days 0-4 have < 5 baseline days -> never anomalous
    (0 to 4).foreach(d => assert(!byDay(d.toLong)._4, s"day $d"))
    // steady state: zero variance, cnt == mean -> (k*x-s) == 0, no flag
    (5 to 9).foreach(d => assert(!byDay(d.toLong)._4, s"day $d"))
    // the spike: baseline all-10s, x=100 -> flags even at zero variance
    assert(byDay(10L)._4)
    // the day after returns to baseline but variance now includes the
    // spike; 10 is within 3 sigma of the contaminated window -> no flag
    assert(!byDay(11L)._4)
    // trailing window is gap-correct on day VALUES: plant a key with
    // a 30-day hole; the day after the hole has an empty frame
    val sparse = (Seq(("B", ts(0L)), ("B", ts(40L * 86400L))))
      .toDF("k", "t")
    val sp = TimeSeries.volumeAnomaly(sparse, Seq("k"), "t", 7, 5)
      .orderBy("day").collect()
    assert(sp.length == 2 && sp(1).getAs[Long]("trail_days") == 0L &&
      !sp(1).getAs[Boolean]("is_anomaly"))
    assert(sp(1).isNullAt(sp(1).fieldIndex("mean")))
  }

  test("interArrivalProfile: hand-checked quantiles of per-user gaps") {
    // user 1, type A at 0,10,30,100 -> gaps 10,20,70 (seconds)
    // user 2, type A at 0,5          -> gap 5
    // gaps(A) = {5,10,20,70}s; p50: r=ceil(200/100)=2 -> 10s
    // p90: r=ceil(360/100)=4 -> 70s; type B single event -> no gaps
    val rows = Seq(
      (1L, "A", 0L, 1L), (1L, "A", 10L, 2L), (1L, "A", 30L, 3L),
      (1L, "A", 100L, 4L), (2L, "A", 0L, 5L), (2L, "A", 5L, 6L),
      (3L, "B", 50L, 7L))
    val df = rows.map { case (u, t, sec, id) => (u, t, ts(sec), id) }
      .toDF("user_id", "event_type", "ts", "event_id")
    val got = TimeSeries.interArrivalProfile(df.repartition(7),
      Seq("event_type"), Seq("user_id"), "ts", "event_id", Seq(50, 90))
      .orderBy("event_type", "pct")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("A", 50L, 4L, 10000000L), ("A", 90L, 4L, 70000000L)))
    // cross-user boundaries never produce a gap: one event per user
    val solo = (1L to 5L).map(u => (u, "A", ts(u), u))
      .toDF("user_id", "event_type", "ts", "event_id")
    assert(TimeSeries.interArrivalProfile(solo, Seq("event_type"),
      Seq("user_id"), "ts", "event_id").count() == 0L)
    intercept[IllegalArgumentException] {
      TimeSeries.interArrivalProfile(df, Seq("event_type"),
        Seq("user_id"), "ts", "event_id", Seq(0))
    }
    intercept[IllegalArgumentException] {
      TimeSeries.interArrivalProfile(df, Seq("event_type"),
        Seq("user_id"), "ts", "event_id", Seq(50, 50))
    }
  }

  test("trailingPercentile: hand-checked PIT, ties count as <=, warmup null") {
    // key A daily counts: d0=5, d1=10, d2=5, d3=20, d4=1 (window 3)
    def mk(d: Int, n: Int) = (0 until n).map(i => ("A", ts(d * 86400L + i)))
    val df = (mk(0, 5) ++ mk(1, 10) ++ mk(2, 5) ++ mk(3, 20) ++ mk(4, 1))
      .toDF("k", "t")
    val got = TimeSeries.trailingPercentile(df, Seq("k"), "t", windowDays = 3)
      .orderBy("day").collect().map { r =>
        (r.getAs[Long]("cnt"), r.getAs[Long]("trail_days"),
          if (r.isNullAt(r.fieldIndex("pit"))) None
          else Some(r.getAs[Double]("pit")))
      }.toSeq
    assert(got == Seq(
      (5L, 0L, None),               // warmup
      (10L, 1L, Some(1.0)),         // 5 <= 10
      (5L, 2L, Some(0.5)),          // tie with d0's 5 counts as <=
      (20L, 3L, Some(1.0)),
      (1L, 3L, Some(0.0))))         // below everything
  }

  test("periodOverPeriod: prior-day join, honest nulls for gaps and zeros") {
    // key A: day0=4, day1=8, day3=2 (day2 missing)
    def mk(d: Int, n: Int) = (0 until n).map(i => ("A", ts(d * 86400L + i)))
    val df = (mk(0, 4) ++ mk(1, 8) ++ mk(3, 2)).toDF("k", "t")
    val got = TimeSeries.periodOverPeriod(df, Seq("k"), "t", lagDays = 1)
      .orderBy("day").collect().map { r =>
        (r.getAs[Long]("cnt"),
          Option(r.getAs[Any]("prev_cnt")).map(_.asInstanceOf[Long]),
          if (r.isNullAt(r.fieldIndex("pct_change"))) None
          else Some(r.getAs[Double]("pct_change")))
      }.toSeq
    assert(got == Seq(
      (4L, None, None),
      (8L, Some(4L), Some(1.0)),      // doubled
      (2L, None, None)))              // gap: day2 absent -> no prior
    // lag 3 reaches across the gap
    val l3 = TimeSeries.periodOverPeriod(df, Seq("k"), "t", lagDays = 3)
      .orderBy("day").collect()
    assert(l3.last.getAs[Long]("prev_cnt") == 4L &&
      l3.last.getAs[Long]("abs_change") == -2L)
    intercept[IllegalArgumentException] {
      TimeSeries.periodOverPeriod(df, Seq("k"), "t", 0)
    }
  }

  test("activityProfile: integer dow/hour; epoch day 0 is Thursday") {
    // 1970-01-01 00:30 UTC -> dow (0+4)%7 = 4 (Thursday), hour 0
    // 1970-01-04 23:10 UTC -> epoch day 3 -> dow 0 (Sunday), hour 23
    val df = Seq(
      ("A", ts(1800L)), ("A", ts(1800L)),
      ("A", ts(3L * 86400L + 23L * 3600L + 600L)))
      .toDF("k", "t")
    val got = TimeSeries.activityProfile(df, Seq("k"), "t")
      .orderBy("dow", "hour")
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      ("A", 0L, 23L, 1L, 1.0 / 3.0),
      ("A", 4L, 0L, 2L, 2.0 / 3.0)))
  }

  test("volumeAnomaly contracts: window bounds, reserved keys, cell cap") {
    val df = Seq(("A", ts(0L))).toDF("k", "t")
    intercept[IllegalArgumentException] {
      TimeSeries.volumeAnomaly(df, Seq("k"), "t", windowDays = 61)
    }
    intercept[IllegalArgumentException] {
      TimeSeries.volumeAnomaly(df, Seq("k"), "t", 7, minDays = 1)
    }
    intercept[IllegalArgumentException] {
      TimeSeries.volumeAnomaly(
        Seq(("A", ts(0L))).toDF("cnt", "t"), Seq("cnt"), "t")
    }
  }

  // ---- cusumVolume ----

  /** Sequential reference of the textbook CUSUM recursion in the
    * operator's scaled-integer units: S±'_t = max(0, S±'_{t−1} ± z'_t)
    * with z'_t = 4n·c_t − 5S (up) / 3S − 4n·c_t (down). */
  private def refCusum(counts: Seq[Long], thresholdMu: Int)
      : Seq[(Long, Long, Boolean, Boolean)] = {
    val n = counts.size.toLong
    val s = counts.sum
    var sp = 0L; var sn = 0L
    counts.map { c =>
      sp = math.max(0L, sp + (4L * n * c - 5L * s))
      sn = math.max(0L, sn + (3L * s - 4L * n * c))
      (sp, sn, sp > 4L * thresholdMu * s, sn > 4L * thresholdMu * s)
    }
  }

  private def dayTs(day: Long, i: Long) = ts(day * 86400L + i)

  private def cusumRows(df: org.apache.spark.sql.DataFrame) =
    TimeSeries.cusumVolume(df, Seq("k"), "t")
      .orderBy("k", "day").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(5), r.getBoolean(6)))

  test("cusumVolume: closed form == sequential recursion, flags exact") {
    // pseudo-random daily counts for one key
    val counts = (0 until 20).map(d => ((d * 13 + 5) % 9 + 1).toLong)
    val rows = counts.zipWithIndex.flatMap { case (c, d) =>
      (0L until c).map(i => ("a", dayTs(d.toLong, i)))
    }
    val got = TimeSeries.cusumVolume(
      rows.toDF("k", "t"), Seq("k"), "t", thresholdMu = 3)
      .orderBy("day").collect()
    val ref = refCusum(counts, 3)
    assert(got.length == ref.length)
    val n = counts.size.toLong; val s = counts.sum
    got.zip(ref).foreach { case (r, (sp, sn, fp, fn)) =>
      assert(r.getLong(2) == counts(r.getLong(1).toInt))
      assert(r.getDouble(3) == sp.toDouble / (4.0 * s.toDouble))
      assert(r.getDouble(4) == sn.toDouble / (4.0 * s.toDouble))
      assert(r.getBoolean(5) == fp && r.getBoolean(6) == fn)
    }
  }

  test("cusumVolume: sustained upward drift accumulates into a flag") {
    // 30 days at 10/day then 30 days at 30/day: each drifted day adds
    // (30 − 5µ/4) = µ in scaled units; the accumulation crosses 3µ
    // after ~12 drift days even though µ (computed over the full
    // span) splits the level shift
    val counts = Seq.fill(30)(10L) ++ Seq.fill(30)(30L)
    val ref = refCusum(counts, 3)
    assert(ref.exists(_._3), "reference itself must flag — fixture bug")
    val rows = counts.zipWithIndex.flatMap { case (c, d) =>
      (0L until c).map(i => ("a", dayTs(d.toLong, i)))
    }
    val got = cusumRows(rows.toDF("k", "t"))
    assert(got.exists(_._4))
    assert(got.map(_._4) sameElements ref.map(_._3))
  }

  test("cusumVolume: volume collapse — missing days zero-fill and flag downward") {
    // 20 days at 8/day, then the key goes silent for 20 days (one
    // stray event at the end keeps the span open)
    val rows = (0 until 20).flatMap(d =>
      (0L until 8L).map(i => ("a", dayTs(d.toLong, i)))) :+
      ("a", dayTs(40L, 0L))
    val got = cusumRows(rows.toDF("k", "t"))
    assert(got.length == 41) // gap-free grid
    assert(got.filter(r => r._2 >= 20 && r._2 < 40).forall(_._3 == 0L))
    assert(got.exists(_._5), "downward drift must flag")
  }

  test("cusumVolume: keys are independent") {
    val rows =
      (0 until 10).flatMap(d => Seq(("a", dayTs(d.toLong, 0L)))) ++
        (0 until 3).flatMap(d =>
          (0L until 5L).map(i => ("b", dayTs(d.toLong, i))))
    val got = cusumRows(rows.toDF("k", "t"))
    assert(got.filter(_._1 == "a").length == 10)
    assert(got.filter(_._1 == "b").length == 3)
    // key a is perfectly flat: cusum never exceeds the allowance
    assert(got.filter(_._1 == "a").forall(r => !r._4 && !r._5))
  }

  // ---- autocorrelation ----

  /** Sequential reference: z_t = n*c_t − S; acf(k) = Σz_t z_{t+k}/Σz². */
  private def refAcf(counts: Seq[Long], maxLag: Int): Seq[Option[Double]] = {
    val n = counts.size.toLong
    val s = counts.sum
    val z = counts.map(c => n * c - s)
    val den = z.map(x => x * x).sum
    (1 to maxLag).map { k =>
      if (den == 0L) None
      else Some(z.dropRight(k).zip(z.drop(k))
        .map { case (a, b) => a * b }.sum.toDouble / den.toDouble)
    }
  }

  test("autocorrelation: planted weekly cycle peaks at lag 7") {
    // 49 days: weekly sawtooth 1..7 repeated
    val counts = (0 until 49).map(d => (d % 7 + 1).toLong)
    val rows = counts.zipWithIndex.flatMap { case (c, d) =>
      (0L until c).map(i => ("a", dayTs(d.toLong, i)))
    }
    val got = TimeSeries.autocorrelation(
      rows.toDF("k", "t"), Seq("k"), "t", maxLag = 7)
      .orderBy("lag").collect()
      .map(r => r.getLong(1) -> r.getDouble(3)).toMap
    val ref = refAcf(counts, 7)
    (1 to 7).foreach(k => assert(got(k.toLong) == ref(k - 1).get, s"lag $k"))
    // exact peak value: perfect periodicity attenuated only by the
    // unnormalized tail factor (n-k)/n = 42/49
    assert(got(7L) > got(1L) && got(7L) == 42.0 / 49.0)
  }

  test("autocorrelation: gap days enter as zeros; constant series null") {
    // key a: events on days 0 and 2 only -> grid 0,1,2 with zero day 1
    val a = Seq(("a", dayTs(0L, 0L)), ("a", dayTs(2L, 0L)))
    // key b: identical count every day -> den 0 -> null acf
    val b = (0 until 5).map(d => ("b", dayTs(d.toLong, 0L)))
    val got = TimeSeries.autocorrelation(
      (a ++ b).toDF("k", "t"), Seq("k"), "t", maxLag = 2)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    val refA = refAcf(Seq(1L, 0L, 1L), 2)
    assert(got(("a", 1L)) == refA(0) && got(("a", 2L)) == refA(1))
    assert(got(("b", 1L)).isEmpty && got(("b", 2L)).isEmpty)
  }

  test("autocorrelation: matches reference on pseudo-random counts + repartition") {
    val counts = (0 until 30).map(d => ((d * 17 + 3) % 11).toLong)
    val rows = counts.zipWithIndex.flatMap { case (c, d) =>
      (0L until c).map(i => ("a", dayTs(d.toLong, i)))
    }
    val ref = refAcf(counts, 5)
    val got = TimeSeries.autocorrelation(
      rows.toDF("k", "t").repartition(13), Seq("k"), "t", maxLag = 5)
      .orderBy("lag").collect()
      .map(r => if (r.isNullAt(3)) None else Some(r.getDouble(3)))
    assert(got.toSeq == ref)
  }

  test("autocorrelation: loud contracts") {
    val df = Seq(("a", ts(0L))).toDF("k", "t")
    intercept[IllegalArgumentException] {
      TimeSeries.autocorrelation(df, Seq.empty, "t")
    }
    intercept[IllegalArgumentException] {
      TimeSeries.autocorrelation(df, Seq("k"), "t", maxLag = 0)
    }
    intercept[IllegalArgumentException] {
      TimeSeries.autocorrelation(
        Seq(("a", ts(0L))).toDF("lag", "t"), Seq("lag"), "t")
    }
  }

  test("cusumVolume: loud contracts") {
    val df = Seq(("a", ts(0L))).toDF("k", "t")
    intercept[IllegalArgumentException] {
      TimeSeries.cusumVolume(df, Seq.empty, "t")
    }
    intercept[IllegalArgumentException] {
      TimeSeries.cusumVolume(df, Seq("k"), "t", thresholdMu = 0)
    }
    intercept[IllegalArgumentException] {
      TimeSeries.cusumVolume(
        Seq(("a", ts(0L))).toDF("day", "t"), Seq("day"), "t")
    }
  }

  test("seasonalDecompose: components reconstruct, edges null, dow fold") {
    import spark.implicits._
    val day = 86400L
    // 21 days of a planted weekly pattern: base 10 + 5 on dow 0
    val rows = (0 until 21).flatMap { dd =>
      val dow = (dd + 8 + 4) % 7 // day = dd + 8 epoch days
      val n = if (dow == 0) 15 else 10
      Seq.fill(n)(("k", ts((dd + 8) * day + 10)))
    }
    val out = TimeSeries.seasonalDecompose(
      rows.toDF("k", "t"), Seq("k"), "t")
      .collect().map(r => r.getLong(1) ->
        (r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)),
          if (r.isNullAt(5)) None else Some(r.getDouble(5)),
          if (r.isNullAt(6)) None else Some(r.getDouble(6)))).toMap
    assert(out.size == 21)
    val d0 = out.keys.min
    // first/last 3 days: no full centered window -> nulls
    for (t <- Seq(d0, d0 + 1, d0 + 2, d0 + 18, d0 + 19, d0 + 20))
      assert(out(t)._3.isEmpty && out(t)._5.isEmpty)
    // interior: cnt == trend + seasonal + residual (rounded faces)
    for (t <- (d0 + 3) to (d0 + 17)) {
      val (_, cnt, Some(tr), Some(se), Some(re)) = out(t)
      assert(math.abs(cnt.toDouble - (tr + se + re)) < 1e-9, s"day $t")
    }
    // the planted spike day carries the positive seasonal component
    val spikeDays = out.filter(_._2._1 == 0L).keys.toSeq.sorted
    val interiorSpike = spikeDays.filter(t => t >= d0 + 3 && t <= d0 + 17)
    assert(interiorSpike.nonEmpty)
    interiorSpike.foreach { t =>
      assert(out(t)._4.get > 3.0, s"seasonal at $t = ${out(t)._4}")
    }
    // non-spike interior dows sit slightly negative (mean-centered-ish)
    val plain = ((d0 + 3) to (d0 + 17)).filter(t => out(t)._1 != 0L)
    plain.foreach(t => assert(out(t)._4.get < 0.5))
    intercept[IllegalArgumentException] {
      TimeSeries.seasonalDecompose(
        Seq(("a", ts(0L))).toDF("dow", "t"), Seq("dow"), "t")
    }
  }

  test("ewma: closed form == the recursion, gaps count as zero days") {
    // key a: day 0 x3, day 1 x1, day 3 x2 (day 2 missing -> 0)
    val day = 86400L
    val rows = Seq.fill(3)(("a", ts(10))) ++ Seq(("a", ts(day + 10))) ++
      Seq.fill(2)(("a", ts(3 * day + 10)))
    val out = TimeSeries.ewma(rows.toDF("k", "t"), Seq("k"), "t", 0.3)
      .collect()
      .map(r => r.getLong(1) -> (r.getLong(2), r.getDouble(3))).toMap
    // recursive reference: e0 = c0; et = 0.3 ct + 0.7 e(t-1)
    val counts = Seq(3.0, 1.0, 0.0, 2.0)
    val ref = counts.tail.scanLeft(counts.head)((e, c) => 0.3 * c + 0.7 * e)
    val d0 = out.keys.min
    assert(out.size == 4) // gap-free grid
    assert(out(d0 + 2)._1 == 0L) // missing day materialized as 0
    for (t <- 0 until 4)
      assert(math.abs(out(d0 + t)._2 - ref(t)) < 1e-6,
        s"day $t: ${out(d0 + t)._2} vs ${ref(t)}")
    // alpha=1 degenerates to the raw series
    val raw = TimeSeries.ewma(rows.toDF("k", "t"), Seq("k"), "t", 1.0)
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    for (t <- 0 until 4)
      assert(raw(d0 + t) == counts(t))
    intercept[IllegalArgumentException] {
      TimeSeries.ewma(rows.toDF("k", "t"), Seq("k"), "t", 0.0)
    }
    intercept[IllegalArgumentException] {
      TimeSeries.ewma(rows.toDF("k", "t"), Seq("k"), "t", 0.3,
        maxDays = 2)
    }
    intercept[IllegalArgumentException] {
      TimeSeries.ewma(
        Seq(("a", ts(0L))).toDF("cnt", "t"), Seq("cnt"), "t")
    }
  }

  private def trendRows(key: String, countsByDay: Seq[Int]) =
    countsByDay.zipWithIndex.flatMap { case (c, d) =>
      Seq.fill(c)((key, ts(d * 86400L)))
    }

  test("trendTest: monotone series — exact S, continuity-corrected z, unit Sen slope") {
    // counts 1..10 over 10 days: S = 45, no ties, V = 10*9*25 = 2250,
    // z = 44 / sqrt(125), sen slope exactly 1.
    val df = trendRows("up", (1 to 10)) .toDF("k", "t")
    val r = TimeSeries.trendTest(df, Seq("k"), "t").collect().head
    assert(r.getLong(1) == 10L && r.getLong(2) == 45L) // n_days, n_pairs
    assert(r.getLong(3) == 45L)                        // s_stat
    val zExp = math.rint(44.0 / math.sqrt(2250.0 / 18.0) * 1e6) / 1e6
    assert(r.getDouble(4) == zExp)
    assert(r.getString(5) == "up")
    assert(r.getDouble(6) == 1.0)
    // mirrored: counts 10..1 — everything flips sign
    val d = TimeSeries.trendTest(
      trendRows("dn", (1 to 10).reverse).toDF("k", "t"),
      Seq("k"), "t").collect().head
    assert(d.getLong(3) == -45L && d.getString(5) == "down")
    assert(d.getDouble(4) == -zExp && d.getDouble(6) == -1.0)
  }

  test("trendTest: constant series is undecidable (V=0 -> null z/trend), short series 'none'") {
    val df = trendRows("c", Seq(2, 2, 2, 2, 2)).toDF("k", "t")
    val r = TimeSeries.trendTest(df, Seq("k"), "t").collect().head
    assert(r.getLong(3) == 0L)
    assert(r.isNullAt(4) && r.isNullAt(5)) // z, trend
    assert(r.getDouble(6) == 0.0)          // all pairwise slopes are 0
    // two days, distinct values: V = 3·2·... wait n=2: V = 2*1*9 = 18,
    // S = 1, z = 0 (continuity correction eats |S|=1) -> 'none'
    val s = TimeSeries.trendTest(
      trendRows("s", Seq(1, 2)).toDF("k", "t"), Seq("k"), "t")
      .collect().head
    assert(s.getLong(3) == 1L && s.getDouble(4) == 0.0 &&
      s.getString(5) == "none")
  }

  test("trendTest: silent days zero-fill into the grid and the tie correction") {
    // events on day 0 (3) and day 2 (3); day 1 materializes as 0.
    // pairs: (3,0)->-1, (3,3)->0, (0,3)->+1  => S=0, z=0, 'none';
    // slopes {-3, 0, 3} -> median 0; ties: two 3s -> V = 66-18 = 48.
    val df = Seq.fill(3)(("g", ts(0L))) ++ Seq.fill(3)(("g", ts(2 * 86400L)))
    val r = TimeSeries.trendTest(df.toDF("k", "t"), Seq("k"), "t")
      .collect().head
    assert(r.getLong(1) == 3L && r.getLong(2) == 3L && r.getLong(3) == 0L)
    assert(r.getDouble(4) == 0.0 && r.getString(5) == "none")
    assert(r.getDouble(6) == 0.0)
  }

  test("trendTest: keys independent, repartition-invariant, loud contracts") {
    val mixed = trendRows("a", (1 to 8)) ++ trendRows("b", Seq(5, 5, 5))
    val base = mixed.toDF("k", "t")
    val one = TimeSeries.trendTest(base.repartition(1), Seq("k"), "t")
      .orderBy("k").collect().toSeq
    val many = TimeSeries.trendTest(base.repartition(7), Seq("k"), "t")
      .orderBy("k").collect().toSeq
    assert(one == many)
    assert(one.map(_.getString(0)) == Seq("a", "b"))
    assert(one.head.getString(5) == "up" && one(1).isNullAt(5))
    intercept[IllegalArgumentException] {
      TimeSeries.trendTest(base, Seq("k"), "t", maxDays = 1)
    }
    intercept[IllegalArgumentException] {
      TimeSeries.trendTest(base, Seq("k"), "t", maxDays = 6000)
    }
    intercept[IllegalArgumentException] {
      TimeSeries.trendTest(
        trendRows("a", Seq(1, 2, 3, 4)).toDF("k", "t"),
        Seq("k"), "t", maxDays = 3)
    }
    intercept[IllegalArgumentException] {
      TimeSeries.trendTest(
        Seq(("x", ts(0L))).toDF("s_stat", "t"), Seq("s_stat"), "t")
    }
  }
}
