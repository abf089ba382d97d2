package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SketchesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 3 groups x overlapping user sets, sharded 4 ways
  private lazy val rows = (0 until 4000).map { i =>
    (i.toLong, s"t${i % 3}", (i % 700).toLong, i % 4)
  }.toDF("event_id", "event_type", "user_id", "shard")

  test("every sharding of the ledger lands in the gated band around exact") {
    // Datasketches estimates are path-dependent (HIP vs union
    // composite estimator), so splits need not agree bitwise — the
    // operative contract is that ANY sharding, and the one-pass
    // sketch, all sit within the mergeTol/relErr band the report
    // gates. Exact per type: t_g holds users {i%700 : i%3==g}.
    val exact = (0 until 4000).groupBy(i => s"t${i % 3}")
      .map { case (g, is) => g -> is.map(_ % 700).distinct.size.toLong }
    val onePass = Sketches.hllSketch(rows, Seq("event_type"), "user_id")
      .select(col("event_type"),
        Sketches.estimate(col("sketch")).as("est"))
      .as[(String, Long)].collect().toMap
    for (shards <- Seq(2, 8, 32)) {
      val resharded = rows.withColumn("shard", pmod(col("event_id"), lit(shards)))
      val merged = Sketches.hllMerge(
        Sketches.hllShardSketches(
          resharded, Seq("event_type"), "shard", "user_id"),
        Seq("event_type"))
        .select(col("event_type"),
          Sketches.estimate(col("sketch")).as("est"))
        .as[(String, Long)].collect().toMap
      exact.foreach { case (g, ex) =>
        assert(math.abs(merged(g) - ex).toDouble / ex <= 0.05,
          s"shards=$shards group=$g merged=${merged(g)} exact=$ex")
        assert(math.abs(merged(g) - onePass(g)).toDouble / ex <= 0.02,
          s"shards=$shards group=$g drift ${merged(g)} vs ${onePass(g)}")
      }
    }
  }

  test("incremental ledger: old sketches + delta == whole-corpus, old raw unread") {
    val old = rows.filter(col("shard") < 2)
    val delta = rows.filter(col("shard") >= 2)
    // the persisted ledger: sketches only, raw rows conceptually gone
    val oldLedger = Sketches.hllShardSketches(
      old, Seq("event_type"), "shard", "user_id")
    val deltaLedger = Sketches.hllShardSketches(
      delta, Seq("event_type"), "shard", "user_id")
    val inc = Sketches.hllMerge(
      oldLedger.unionByName(deltaLedger), Seq("event_type"))
      .select(col("event_type"), Sketches.estimate(col("sketch")).as("est"))
      .as[(String, Long)].collect().toMap
    // within the gated band of the one-shot whole-corpus sketch and
    // of exact — the incremental path costs no accuracy
    val whole = Sketches.hllSketch(rows, Seq("event_type"), "user_id")
      .select(col("event_type"), Sketches.estimate(col("sketch")).as("est"))
      .as[(String, Long)].collect().toMap
    val exact = (0 until 4000).groupBy(i => s"t${i % 3}")
      .map { case (g, is) => g -> is.map(_ % 700).distinct.size.toLong }
    exact.foreach { case (g, ex) =>
      assert(math.abs(inc(g) - ex).toDouble / ex <= 0.05, s"$g vs exact")
      assert(math.abs(inc(g) - whole(g)).toDouble / ex <= 0.02,
        s"$g inc=${inc(g)} whole=${whole(g)}")
    }
  }

  test("gatedDistinctReport emits exact counts and passes its gates") {
    val got = Sketches.gatedDistinctReport(
      rows, Seq("event_type"), "shard", "user_id")
      .as[(String, Long)].collect().toMap
    // exact by construction: group t_g holds users {i%700 : i%3==g}
    val ref = (0 until 4000).groupBy(i => s"t${i % 3}")
      .map { case (g, is) => g -> is.map(_ % 700).distinct.size.toLong }
    assert(got == ref)
  }

  test("gate fails loudly when the error bound is unmeetable") {
    // relErr so tight the ~1.6%-error sketch cannot pass on a
    // 700-distinct group — unless the estimate is exactly right,
    // which lgK=12 is not at this cardinality for every group
    val e = intercept[IllegalArgumentException] {
      Sketches.gatedDistinctReport(
        rows, Seq("event_type"), "shard", "user_id", relErr = 1e-9)
    }
    assert(e.getMessage.contains("sketch regressed"))
  }

  test("empty input: report is empty, gates vacuous") {
    assert(Sketches.gatedDistinctReport(
      rows.filter(lit(false)), Seq("event_type"), "shard", "user_id")
      .count() == 0L)
  }

  // ----- KLL quantile ledger -----

  // values 0..3999 scaled: group t_g holds {i*1.0 : i%3==g} — exact
  // quantiles computable by hand
  private lazy val vrows = (0 until 4000).map { i =>
    (i.toLong, s"t${i % 3}", i.toDouble, i % 4)
  }.toDF("event_id", "event_type", "value", "shard")

  private def exactQ(g: Int, q: Double): Double = {
    val vs = (0 until 4000).filter(_ % 3 == g).map(_.toDouble).sorted
    vs((math.floor((vs.length - 1) * q)).toInt)
  }

  test("gatedQuantileReport: exact lower-interpolation quantiles, gates pass") {
    val qs = Seq(0.25, 0.5, 0.9)
    val got = Sketches.gatedQuantileReport(
      vrows, Seq("event_type"), "shard", "value", qs)
      .as[(String, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    for (g <- 0 until 3; q <- qs) {
      assert(got((s"t$g", q)) == exactQ(g, q), s"t$g q=$q")
    }
    assert(got.size == 9)
  }

  test("KLL ledger: shard sketches union within rank tolerance of truth") {
    val merged = Sketches.kllMerge(
      Sketches.kllShardSketches(vrows, Seq("event_type"), "shard", "value"),
      Seq("event_type"))
      .withColumn("est", Sketches.kllQuantiles(Seq(0.5))(col("sketch")))
      .select(col("event_type"), element_at(col("est"), 1))
      .as[(String, Double)].collect().toMap
    for (g <- 0 until 3) {
      val med = exactQ(g, 0.5)
      // rank error <= ~1.65% at k=200 => value within a few percent
      // of the median on this uniform data
      assert(math.abs(merged(s"t$g") - med) / med < 0.1,
        s"t$g est=${merged(s"t$g")} exact=$med")
    }
  }

  test("KLL gate fails loudly at an unmeetable rank tolerance") {
    // rankTol 1e-12 demands the estimate's true-rank interval
    // brackets q EXACTLY — and the distinct-value rank intervals tile
    // [0,1], so for any single q there is one value that would
    // legitimately pass. A compaction happening to retain exactly
    // that value made the single-q spelling flake (seen once in a
    // full-suite run, merge order is scheduling-dependent); nine
    // simultaneous quantiles require nine simultaneous exact hits,
    // which a k=200 sketch of 1334 values cannot produce
    val e = intercept[IllegalArgumentException] {
      Sketches.gatedQuantileReport(
        vrows, Seq("event_type"), "shard", "value",
        (1 to 9).map(_ / 10.0),
        rankTol = 1e-12)
    }
    assert(e.getMessage.contains("sketch regressed"))
  }

  test("slidingDistinct: window arithmetic exact on planted days; gate loud") {
    import spark.implicits._
    // one group, users visible on specific days: day 0 {u1,u2},
    // day 3 {u2,u3}, day 10 {u1}: with windowDays=7 the trailing
    // sets are d0={u1,u2}, d3={u1,u2,u3}, d10={u1} (day 3 aged out
    // at day 10)
    val df = Seq(("a", 0L, 1L), ("a", 0L, 2L), ("a", 3L, 2L),
      ("a", 3L, 3L), ("a", 10L, 1L)).toDF("g", "day", "u")
    val got = Sketches.slidingDistinctReport(
      df, Seq("g"), "day", "u", windowDays = 7)
      .as[(String, Long, Long)].collect().sortBy(_._2).toSeq
    assert(got == Seq(("a", 0L, 2L), ("a", 3L, 3L), ("a", 10L, 1L)))
    // windowDays=1 degenerates to daily distinct
    assert(Sketches.slidingDistinctReport(df, Seq("g"), "day", "u", 1)
      .as[(String, Long, Long)].collect().sortBy(_._2).toSeq ==
      Seq(("a", 0L, 2L), ("a", 3L, 2L), ("a", 10L, 1L)))
    // deterministic under repartition at fixture scale
    val rows = (0 until 4000)
      .map(i => (s"g${i % 2}", (i % 20).toLong, (i * 7 % 300).toLong))
    val big = rows.toDF("g", "day", "u")
    val a = Sketches.slidingDistinctReport(
      big.repartition(3), Seq("g"), "day", "u", 7)
      .as[(String, Long, Long)].collect().sorted.toSeq
    val b = Sketches.slidingDistinctReport(
      big.repartition(17), Seq("g"), "day", "u", 7)
      .as[(String, Long, Long)].collect().sorted.toSeq
    assert(a == b && a.nonEmpty)
    // gate fails loudly at an unmeetable tolerance — needs DENSE-mode
    // cardinality (HLL is exact in sparse mode, where any relErr
    // passes): ~30k distinct per trailing window forces estimation
    val huge = (0 until 40000)
      .map(i => ("g", (i % 10).toLong, (i.toLong * 7919L) % 1000000L))
      .toDF("g", "day", "u")
    assert(intercept[IllegalArgumentException] {
      Sketches.slidingDistinctReport(huge, Seq("g"), "day", "u", 7,
        relErr = 1e-9)
    }.getMessage.contains("regressed"))
    // cell bound is loud
    assert(intercept[IllegalArgumentException] {
      Sketches.slidingDistinctReport(big, Seq("g"), "day", "u", 7,
        maxCells = 3)
    }.getMessage.contains("maxCells"))
  }

  test("KLL report: null values excluded, empty input empty") {
    val withNulls = vrows
      .withColumn("value", when(col("event_id") % 2 === 0, col("value")))
    // nulls drop from both the ranks and the sketch — no NPE, exact
    // quantiles over the surviving half
    val got = Sketches.gatedQuantileReport(
      withNulls, Seq("event_type"), "shard", "value", Seq(0.5))
      .as[(String, Double, Double)].collect()
    assert(got.length == 3)
    assert(Sketches.gatedQuantileReport(
      vrows.filter(lit(false)), Seq("event_type"), "shard", "value",
      Seq(0.5)).count() == 0L)
  }

  test("gatedOverlapReport: hand overlaps, disjoint pair emits 0, " +
      "duplicates collapse, loud contracts") {
    import spark.implicits._
    // A: users 1..10; B: users 6..15 (overlap 5); C: 100..104
    // (disjoint from both); duplicate rows must not inflate counts
    val rows = ((1L to 10L).map(("A", _)) ++
      (6L to 15L).map(("B", _)) ++ (100L to 104L).map(("C", _)) ++
      Seq(("A", 1L), ("B", 6L))).toDF("src", "user")
    val got = Sketches.gatedOverlapReport(rows, "src", "user")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toMap
    assert(got.keySet == Set(("A", "B"), ("A", "C"), ("B", "C")))
    assert(got(("A", "B")) == ((10L, 10L, 5L,
      BigDecimal(5.0 / 15.0).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(got(("A", "C")) == ((10L, 5L, 0L, 0.0)))
    assert(got(("B", "C")) == ((10L, 5L, 0L, 0.0)))
    // null sources drop before counting (no 4th source appears)
    val withNullSrc = rows.union(
      Seq((null.asInstanceOf[String], 999L)).toDF("src", "user"))
    assert(Sketches.gatedOverlapReport(withNullSrc, "src", "user")
      .count() == 3L)
    intercept[IllegalArgumentException] {
      Sketches.gatedOverlapReport(rows, "src", "user", maxSources = 2)
    }
    intercept[IllegalArgumentException] {
      Sketches.gatedOverlapReport(rows, "src", "user", relErr = 0.0)
    }
  }
}
