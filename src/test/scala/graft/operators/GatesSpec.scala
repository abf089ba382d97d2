package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class GatesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("pairRecall: exact fraction, vacuous on empty reference, no cached blocks") {
    import spark.implicits._
    spark.catalog.clearCache() // isolate from earlier suites' LRU leftovers
    val exact = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L))
      .toDF("query_id", "nn_id")
    val approx = Seq((1L, 10L), (2L, 20L), (2L, 21L), (9L, 99L))
      .toDF("query_id", "nn_id")
    assert(Gates.pairRecall(approx, exact) == 0.75)
    assert(Gates.pairRecall(approx, exact.limit(0)) == 1.0)
    // duplicate approx pairs must not double-count hits
    val dup = approx.unionAll(approx)
    assert(Gates.pairRecall(dup, exact) == 0.75)
    assert(spark.sharedState.cacheManager.isEmpty,
      "pairRecall left cached blocks behind")
  }

  test("requireFloor: passes at the floor, throws below it") {
    Gates.requireFloor(0.5, 0.5, "at-floor")
    val e = intercept[IllegalArgumentException] {
      Gates.requireFloor(0.49, 0.5, "below-floor")
    }
    assert(e.getMessage.contains("below-floor"))
  }

  test("recall-gated ANN query leaves no cached blocks (q48 end to end)") {
    spark.catalog.clearCache()
    val df = graft.SparkEntry.queries("q48_sim_ann_ivf")(
      spark, TestSpark.sf0001)
    assert(df.count() > 0)
    assert(spark.sharedState.cacheManager.isEmpty,
      "the sampled gate must not strand cached blocks after the query")
  }

  test("annTopK / annTopKInt8 queries leave no cached blocks (q40/q63 end to end)") {
    // annCandidates hands its pair cache to the ANN operators, which
    // must free it (and their own scored-pair cache) once the
    // k-bounded result is materialized — the free-at-the-seam
    // discipline, extended from the sampled gates to the ANN paths
    for (q <- Seq("q40_sim_ann_lsh", "q63_sim_ann_int8")) {
      spark.catalog.clearCache()
      val df = graft.SparkEntry.queries(q)(spark, TestSpark.sf0001)
      assert(df.count() > 0)
      assert(spark.sharedState.cacheManager.isEmpty,
        s"$q stranded cached blocks after the query")
    }
  }

  test("rankErrorGate: real sketch passes on the lineitem fixture") {
    val li = spark.read.parquet(s"${TestSpark.sf0001}/lineitem.parquet")
    Gates.rankErrorGate(li, "l_returnflag", "l_quantity",
      Seq(0.25, 0.5, 0.9), accuracy = 1000)
  }

  test("rankErrorGate: failure path fires (impossible tolerance)") {
    val li = spark.read.parquet(s"${TestSpark.sf0001}/lineitem.parquet")
    // a hugely negative cushion inverts the rank interval, so every
    // check must fail — pins the gate's wiring, not the sketch
    val e = intercept[IllegalArgumentException] {
      Gates.rankErrorGate(li, "l_returnflag", "l_quantity",
        Seq(0.5), accuracy = 1000, tieCushion = -1e9)
    }
    assert(e.getMessage.contains("sketch regressed"))
  }

  test("rankErrorGate: maxChecks bound is loud; nulls excluded from denominators") {
    import spark.implicits._
    val e = intercept[IllegalArgumentException] {
      Gates.rankErrorGate(
        Seq(("a", 1.0), ("b", 2.0)).toDF("g", "v"),
        "g", "v", Seq(0.5), maxChecks = 1)
    }
    assert(e.getMessage.contains("maxChecks"))
    // half the values null: the gate must measure rank over the
    // non-null half only (else the 0.5 quantile check would miss)
    val withNulls = Seq(
      ("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(3.0)),
      ("a", None), ("a", None), ("a", None)
    ).toDF("g", "v")
    Gates.rankErrorGate(withNulls, "g", "v", Seq(0.5), accuracy = 100)
  }

  test("rankErrorGate: empty / all-null input passes vacuously, not NoSuchElement") {
    import spark.implicits._
    Gates.rankErrorGate(
      Seq.empty[(String, Option[Double])].toDF("g", "v"), "g", "v", Seq(0.5))
    Gates.rankErrorGate(
      Seq(("a", None: Option[Double])).toDF("g", "v"), "g", "v", Seq(0.5))
  }
}
