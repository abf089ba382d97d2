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

  test("saltedSum is retry-deterministic: adversarial repartition cannot change it") {
    // A partition-order-dependent salt (the old monotonically_increasing_id
    // spelling) assigns different buckets when the scan order changes —
    // the same hazard a stage retry or AQE re-plan triggers at scale.
    // A content-derived salt must give identical results (not merely
    // equal sums) under any physical row distribution.
    val base = lineitem.select("l_returnflag", "l_quantity", "l_orderkey",
      "l_linenumber")
    val reference = Skew.saltedSum(
      base, Seq("l_returnflag"),
      col("l_quantity").cast(DecimalType(18, 2)), "q", salt = 16)
      .orderBy("l_returnflag")
      .collect().map(r => (r.getString(0), r.getDecimal(1)))
    for (reshuffle <- Seq(
        base.repartition(3),
        base.repartition(17, col("l_orderkey")),
        base.orderBy(col("l_quantity").desc, col("l_orderkey"), col("l_linenumber")),
        base.coalesce(1))) {
      val got = Skew.saltedSum(
        reshuffle, Seq("l_returnflag"),
        col("l_quantity").cast(DecimalType(18, 2)), "q", salt = 16)
        .orderBy("l_returnflag")
        .collect().map(r => (r.getString(0), r.getDecimal(1)))
      assert(got.toSeq == reference.toSeq)
    }
  }

  test("saltedSum salt buckets are content-determined and spread") {
    // directly inspect the partial phase: same row content => same salt,
    // and distinct rows occupy more than one bucket (the spread that
    // makes the hot key parallel)
    val salted = lineitem
      .withColumn("_salt",
        pmod(xxhash64(lineitem.columns.map(col): _*), lit(16L)))
    val again = lineitem.repartition(7)
      .withColumn("_salt",
        pmod(xxhash64(lineitem.columns.map(col): _*), lit(16L)))
    assert(salted.select("_salt").distinct().count() > 1)
    // key: full row content; value: salt — identical across runs
    val a = salted.select(md5(to_json(struct(lineitem.columns.map(col): _*)))
      .as("k"), col("_salt")).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = again.select(md5(to_json(struct(lineitem.columns.map(col): _*)))
      .as("k"), col("_salt")).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b)
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
