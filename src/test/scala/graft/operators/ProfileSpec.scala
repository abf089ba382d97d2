package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ProfileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("profile: exact counts, nulls, ranges on a hand table") {
    val df = Seq(
      (1L, Option("a"), Option(2.0)),
      (2L, Option("b"), None),
      (3L, Option("a"), Option(5.0)),
      (4L, None, Option(5.0))
    ).toDF("id", "s", "v")
    val got = Profile.profile(df, Seq("id", "s", "v"), exact = true)
      .as[(String, Long, Long, Long, String, String)]
      .collect().map(r => r._1 -> r).toMap
    assert(got("id") == ("id", 4L, 0L, 4L, "1", "4"))
    assert(got("s") == ("s", 4L, 1L, 2L, "a", "b"))
    assert(got("v") == ("v", 4L, 1L, 2L, "2.0", "5.0"))
  }

  test("profile: single scan (one aggregate, no per-column jobs)") {
    val df = spark.read.parquet(s"${TestSpark.sf0001}/lineitem.parquet")
    val plan = Profile.profile(df, Seq("l_orderkey", "l_quantity"))
      .queryExecution.executedPlan.toString
    // one scan node, one two-phase aggregate, a generate for stack
    assert("Scan parquet".r.findAllIn(plan).length == 1, plan.take(2000))
    assert(plan.contains("Generate"), plan.take(2000))
  }

  test("profile: approx default tracks exact within HLL tolerance") {
    val df = spark.read.parquet(s"${TestSpark.sf0001}/lineitem.parquet")
    val exact = Profile.profile(df, Seq("l_partkey"), exact = true)
      .select("n_distinct").as[Long].head()
    val approx = Profile.profile(df, Seq("l_partkey"))
      .select("n_distinct").as[Long].head()
    assert(math.abs(approx - exact).toDouble / exact < 0.1)
  }
}
