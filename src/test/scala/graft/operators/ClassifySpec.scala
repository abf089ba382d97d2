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
