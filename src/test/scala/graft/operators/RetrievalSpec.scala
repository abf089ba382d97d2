package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fuse(
      a: Seq[(Long, Long)], b: Seq[(Long, Long)],
      rrfK: Int = 60, topK: Int = 20) =
    Retrieval.rrfFuse(
      Seq("a" -> a.toDF("id", "rank"), "b" -> b.toDF("id", "rank")),
      "id", "rank", rrfK, topK)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))

  test("hand example: shared id outranks single-list ids") {
    // id 10 in both lists (ranks 2, 1); ids 11/12 in one list each
    val got = fuse(Seq((10L, 2L), (11L, 1L)), Seq((10L, 1L), (12L, 2L)))
    assert(got.map(_._2).toSeq == Seq(10L, 11L, 12L))
    val m = got.map(r => r._2 -> r).toMap
    assert(m(10L)._3 == 1.0 / 62 + 1.0 / 61)
    assert(m(11L)._3 == 1.0 / 61)
    assert(m(12L)._3 == 1.0 / 62)
    assert(m(10L)._4 == Some(2L) && m(10L)._5 == Some(1L))
    assert(m(11L)._5.isEmpty && m(12L)._4.isEmpty)
  }

  test("equal scores break ties by id") {
    // id 5 only in list a at rank 3; id 4 only in list b at rank 3
    val got = fuse(Seq((5L, 3L)), Seq((4L, 3L)))
    assert(got.map(_._2).toSeq == Seq(4L, 5L))
    assert(got(0)._3 == got(1)._3)
    assert(got.map(_._1).toSeq == Seq(1L, 2L))
  }

  test("topK bounds the output") {
    val a = (1L to 30L).map(i => (i, i))
    assert(fuse(a, Seq.empty, topK = 7).length == 7)
  }

  test("score is bitwise stable under repartition") {
    val a = (1L to 50L).map(i => (i * 3 % 41, i))
    val b = (1L to 50L).map(i => (i * 7 % 43, i))
    val r1 = Retrieval.rrfFuse(
      Seq("x" -> a.toDF("id", "rank"), "y" -> b.toDF("id", "rank")),
      "id", "rank")
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    val r2 = Retrieval.rrfFuse(
      Seq("x" -> a.toDF("id", "rank").repartition(13),
        "y" -> b.toDF("id", "rank").repartition(7)),
      "id", "rank")
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    assert(r1 == r2)
  }

  test("loud contracts: empty list set, duplicate names, bad knobs") {
    val df = Seq((1L, 1L)).toDF("id", "rank")
    intercept[IllegalArgumentException] {
      Retrieval.rrfFuse(Seq.empty, "id", "rank")
    }
    intercept[IllegalArgumentException] {
      Retrieval.rrfFuse(Seq("a" -> df, "a" -> df), "id", "rank")
    }
    intercept[IllegalArgumentException] {
      Retrieval.rrfFuse(Seq("a" -> df), "id", "rank", rrfK = 0)
    }
    intercept[IllegalArgumentException] {
      Retrieval.rrfFuse(Seq("a" -> df), "id", "rank", topK = 0)
    }
  }
}
