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
}
