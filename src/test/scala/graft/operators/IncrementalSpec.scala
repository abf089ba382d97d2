package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class IncrementalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rows(seed: Int, n: Int) = (0 until n).map { i =>
    val v: java.lang.Long =
      if ((i * seed) % 11 == 0) null else ((i * seed) % 97 - 40).toLong
    (s"k${(i * seed) % 7}", v)
  }

  private type St = (String, Long, Option[Long], Option[Long], Option[Long])
  private def collectState(df: org.apache.spark.sql.DataFrame): Seq[St] =
    df.as[St].collect().sortBy(_._1).toSeq

  test("merge algebra: build(b1) ⊕ build(b2) == build(b1 ∪ b2), assoc + comm") {
    val b1 = rows(3, 500).toDF("k", "v")
    val b2 = rows(5, 300).toDF("k", "v")
    val b3 = rows(7, 200).toDF("k", "v")
    def st(df: org.apache.spark.sql.DataFrame) =
      Incremental.buildState(df.repartition(9), Seq("k"), "v")
    val full = collectState(st(b1.unionByName(b2).unionByName(b3)))
    val m12_3 = collectState(Incremental.mergeStates(
      Incremental.mergeStates(st(b1), st(b2)), st(b3)))
    val m1_23 = collectState(Incremental.mergeStates(
      st(b1), Incremental.mergeStates(st(b2), st(b3))))
    val m321 = collectState(Incremental.mergeStates(
      Incremental.mergeStates(st(b3), st(b2)), st(b1)))
    assert(m12_3 == full)
    assert(m1_23 == full)
    assert(m321 == full)
  }

  test("disjoint keys pass through; nulls count in n but not folds") {
    val a = Seq(("x", Some(5L)), ("x", None)).toDF("k", "v")
    val b = Seq(("y", Some(-2L))).toDF("k", "v")
    val merged = collectState(Incremental.mergeStates(
      Incremental.buildState(a, Seq("k"), "v"),
      Incremental.buildState(b, Seq("k"), "v")))
    assert(merged == Seq(
      ("x", 2L, Some(5L), Some(5L), Some(5L)),
      ("y", 1L, Some(-2L), Some(-2L), Some(-2L))))
    // an all-null batch merges without disturbing the other side's folds
    val an = Seq(("x", Option.empty[Long])).toDF("k", "v")
    val m2 = collectState(Incremental.mergeStates(
      Incremental.buildState(a, Seq("k"), "v"),
      Incremental.buildState(an, Seq("k"), "v")))
    assert(m2 == Seq(("x", 3L, Some(5L), Some(5L), Some(5L))))
  }

  test("guards: non-integral value, reserved keys, schema mismatch") {
    val d = Seq(("x", 1.5)).toDF("k", "v")
    assert(intercept[IllegalArgumentException] {
      Incremental.buildState(d, Seq("k"), "v")
    }.getMessage.contains("integral"))
    val r = Seq((1L, 2L)).toDF("n", "v")
    assert(intercept[IllegalArgumentException] {
      Incremental.buildState(r, Seq("n"), "v")
    }.getMessage.contains("reserved"))
    val s1 = Incremental.buildState(
      Seq(("x", 1L)).toDF("k", "v"), Seq("k"), "v")
    assert(intercept[IllegalArgumentException] {
      Incremental.mergeStates(s1, s1.withColumnRenamed("k", "g"))
    }.getMessage.contains("differ"))
    assert(intercept[IllegalArgumentException] {
      Incremental.mergeStates(s1.drop("min_v"), s1.drop("min_v"))
    }.getMessage.contains("state"))
  }
}
