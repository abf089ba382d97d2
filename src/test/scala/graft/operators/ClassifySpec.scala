package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ClassifySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("logisticGD: first step from zero weights matches hand math") {
    // w=0 => sigma6 = 0.5 on every row
    //   sum(0.5-y)         = 0        => b0 stays 0
    //   sum((0.5-y)*x)     = -0.375   => w = -0.5*(-0.375/4) = 0.046875
    //   mae                = 0.5
    val df = Seq((1L, 1.0), (0L, 0.5), (0L, 0.0), (1L, 0.25))
      .toDF("y", "x")
    val r = Classify.logisticGD(df, "y", Seq("x"), lr = 0.5,
      iterations = 1).head()
    assert(r.getLong(0) == 1L && r.getLong(1) == 4L)
    assert(r.getDouble(2) == 0.5)       // mae
    assert(r.getDouble(3) == 0.0)       // b0
    assert(r.getDouble(4) == 0.046875)  // w_x
  }

  test("logisticGD: separable data — weight goes the right way, residual falls") {
    val df = (0 until 200).map { i =>
      val x = i / 200.0
      (if (x >= 0.5) 1L else 0L, BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toDF("y", "x")
    val trace = Classify.logisticGD(df, "y", Seq("x"), lr = 2.0,
      iterations = 10).orderBy("iter").collect()
    assert(trace.length == 10)
    assert(trace.last.getDouble(4) > 0.0) // w_x positive: x predicts y
    assert(trace.last.getDouble(2) < trace.head.getDouble(2)) // mae falls
  }

  test("logisticGD: bitwise deterministic under repartition; null rows drop") {
    val rows = (0 until 500).map { i =>
      ((i % 3 == 0).compareTo(false).toLong,
        BigDecimal((i % 17) / 17.0).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal((i % 5) / 5.0).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val base = rows.toDF("y", "a", "b")
    val one = Classify.logisticGD(base.repartition(1), "y",
      Seq("a", "b"), iterations = 3).orderBy("iter").collect().toSeq
    val many = Classify.logisticGD(base.repartition(13), "y",
      Seq("a", "b"), iterations = 3).orderBy("iter").collect().toSeq
    assert(one == many)
    // a null feature removes its row from n
    val withNull = base.union(
      Seq((1L, null.asInstanceOf[java.lang.Double], 0.5)).map(t =>
        (t._1, Option(t._2).map(_.toDouble).getOrElse(Double.NaN), t._3))
        .toDF("y", "a", "b").withColumn("a",
          when(isnan(col("a")), lit(null)).otherwise(col("a"))))
    val rn = Classify.logisticGD(withNull, "y", Seq("a", "b"),
      iterations = 1).head()
    assert(rn.getLong(1) == 500L)
  }

  test("score + aucReport: sigmoid value, perfect/chance/degenerate AUC") {
    val df = Seq((1L, 1.0), (0L, 0.0)).toDF("y", "x")
    // score with b0=0, w=1: sigma(1) and sigma(0) at the 6-dec face
    val s = Classify.score(df, Seq("x"), Seq(0.0, 1.0))
      .orderBy("x").collect().map(_.getDouble(2))
    assert(s(0) == 0.5)
    assert(s(1) == BigDecimal(1.0 / (1.0 + math.exp(-1.0)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // perfect separation
    val perfect = Seq((0L, 0.1), (0L, 0.2), (1L, 0.8), (1L, 0.9))
      .toDF("y", "s")
    assert(Classify.aucReport(perfect, "y", "s").head().getDouble(2)
      == 1.0)
    // all scores equal: midranks give exactly 0.5
    val flat = Seq((0L, 0.5), (1L, 0.5), (0L, 0.5), (1L, 0.5))
      .toDF("y", "s")
    assert(Classify.aucReport(flat, "y", "s").head().getDouble(2)
      == 0.5)
    // one-class input: auc undecidable -> null
    val oneClass = Seq((1L, 0.1), (1L, 0.9)).toDF("y", "s")
    assert(Classify.aucReport(oneClass, "y", "s").head().isNullAt(2))
    intercept[IllegalArgumentException] {
      Classify.score(df, Seq("x"), Seq(0.0))
    }
  }

  test("aucByGroup: per-group hand AUCs, ties, one-class null, null handling") {
    val df = Seq(
      ("a", 0L, 0.1), ("a", 0L, 0.2), ("a", 1L, 0.8), ("a", 1L, 0.9),
      ("b", 1L, 0.5), ("b", 0L, 0.5),
      ("c", 1L, 0.3), ("c", 1L, 0.7),
      (null.asInstanceOf[String], 0L, 0.4))
      .toDF("g", "y", "s")
    val got = Classify.aucByGroup(df, "g", "y", "s")
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got.keySet == Set("a", "b", "c")) // null group dropped
    assert(got("a") == ((2L, 2L, Some(1.0))))
    assert(got("b") == ((1L, 1L, Some(0.5)))) // tied scores: midrank
    assert(got("c") == ((2L, 0L, None)))      // one-class: undecidable
    intercept[IllegalArgumentException] {
      Classify.aucByGroup(
        Seq(("a", 1L, null.asInstanceOf[java.lang.Double]))
          .toDF("g", "y", "s"), "g", "y", "s")
    }
  }

  test("thresholdSweep: hand confusion counts, edge thresholds, loud contracts") {
    val df = Seq((1L, 0.9), (1L, 0.4), (0L, 0.6), (0L, 0.1))
      .toDF("y", "s")
    val got = Classify.thresholdSweep(df, "y", "s",
      Seq(0.0, 0.5, 1.0))
      .orderBy("threshold").collect()
    // t=0.0: all predicted positive
    assert(got(0).getLong(1) == 2L && got(0).getLong(2) == 2L &&
      got(0).getLong(3) == 0L && got(0).getLong(4) == 0L)
    assert(got(0).getDouble(5) == 0.5 && got(0).getDouble(6) == 1.0)
    assert(got(0).getDouble(7) == BigDecimal(4.0 / 6.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // t=0.5: one of each cell
    assert((1 to 4).map(got(1).getLong) == Seq(1L, 1L, 1L, 1L))
    assert(got(1).getDouble(5) == 0.5 && got(1).getDouble(6) == 0.5 &&
      got(1).getDouble(7) == 0.5)
    // t=1.0: nothing predicted positive -> precision null, recall 0
    assert(got(2).getLong(1) == 0L && got(2).getLong(2) == 0L)
    assert(got(2).isNullAt(5))
    assert(got(2).getDouble(6) == 0.0 && got(2).getDouble(7) == 0.0)
    intercept[IllegalArgumentException] {
      Classify.thresholdSweep(df, "y", "s", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Classify.thresholdSweep(df, "y", "s", Seq(1.5))
    }
    intercept[IllegalArgumentException] {
      Classify.thresholdSweep(df, "y", "s", Seq(0.5, 0.5))
    }
  }

  test("logisticGD: loud contracts") {
    val df = Seq((1L, 1.0), (0L, 0.0)).toDF("y", "x")
    intercept[IllegalArgumentException] {
      Classify.logisticGD(df.filter(lit(false)), "y", Seq("x"))
    }
    intercept[IllegalArgumentException] {
      Classify.logisticGD(
        Seq((2L, 1.0), (0L, 0.0)).toDF("y", "x"), "y", Seq("x"))
    }
    intercept[IllegalArgumentException] {
      Classify.logisticGD(df, "y", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Classify.logisticGD(df, "y", Seq("x"), lr = 0.0)
    }
    intercept[IllegalArgumentException] {
      Classify.logisticGD(df, "y", Seq("x"), iterations = 11)
    }
  }
}
