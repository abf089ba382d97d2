package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val lineitem =
    spark.read.parquet(s"${TestSpark.sf0001}/lineitem.parquet")

  test("saltedSum == plain sum (decimal-exact at any salt)") {
    val plain = lineitem
      .groupBy("l_returnflag")
      .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).as("q"))
      .orderBy("l_returnflag")
      .collect().map(r => (r.getString(0), r.getDecimal(1)))
    for (salt <- Seq(1, 4, 32)) {
      val got = Skew.saltedSum(
        lineitem, Seq("l_returnflag"),
        col("l_quantity").cast(DecimalType(18, 2)), "q", salt)
        .orderBy("l_returnflag")
        .collect().map(r => (r.getString(0), r.getDecimal(1)))
      assert(got.toSeq == plain.toSeq, s"salt=$salt")
    }
  }

  test("saltedCountDistinct == plain countDistinct") {
    val plain = lineitem
      .groupBy("l_returnflag")
      .agg(countDistinct("l_partkey").as("d"))
      .orderBy("l_returnflag")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val got = Skew.saltedCountDistinct(
      lineitem, Seq("l_returnflag"), col("l_partkey"), "d", salt = 8)
      .orderBy("l_returnflag")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == plain.toSeq)
  }
}
