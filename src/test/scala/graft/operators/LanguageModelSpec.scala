package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class LanguageModelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")

  test("vocab: hand ranks, minCount filter, tie-break by token") {
    val fx = Seq(
      (1L, "b b b a a c"),
      (2L, "a d")
    ).toDF("doc_id", "text")
    // counts: a=3, b=3, c=1, d=1 -> rank by (cnt desc, token):
    // a(1), b(2), c(3), d(4)
    val got = LanguageModel.vocab(fx, "text")
      .as[(String, Long, Long)].collect().sortBy(_._3).toSeq
    assert(got == Seq(("a", 3L, 1L), ("b", 3L, 2L), ("c", 1L, 3L),
      ("d", 1L, 4L)))
    val cut = LanguageModel.vocab(fx, "text", minCount = 2L)
      .as[(String, Long, Long)].collect().sortBy(_._3).toSeq
    assert(cut == Seq(("a", 3L, 1L), ("b", 3L, 2L)))
  }

  test("vocab: global ids are contiguous and repartition-stable on the fixture") {
    def run(df: org.apache.spark.sql.DataFrame) =
      LanguageModel.vocab(df, "text", minCount = 2L)
        .as[(String, Long, Long)].collect().sortBy(_._3).toSeq
    val a = run(docs)
    assert(a.nonEmpty)
    // ids 1..n with counts non-increasing in id order
    assert(a.map(_._3) == (1L to a.length))
    a.sliding(2).foreach {
      case Seq(x, y) =>
        assert(x._2 > y._2 || (x._2 == y._2 && x._1 < y._1))
      case _ =>
    }
    assert(run(docs.repartition(13)) == a)
  }

  test("bigramSurprisal: hand-computed add-1 model; short docs absent") {
    val fx = Seq(
      (1L, "a b a"),
      (2L, "a b"),
      (3L, "x"),
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    // unigrams a=3 b=2 x=1 (V=3); bigrams "a b"=2, "b a"=1
    // d1: -log2(3/6)=1, -log2(2/5)=log2(2.5); mean=(1+log2 2.5)/2
    // d2: -log2(3/6)=1
    val got = LanguageModel.bigramSurprisal(fx, "doc_id", "text")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val d1 = BigDecimal((1.0 + math.log(2.5) / math.log(2.0)) / 2.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Seq((1L, 2L, d1), (2L, 1L, 1.0)))
  }

  test("bigramSurprisal: repartition-stable bitwise on the fixture corpus") {
    def run(df: org.apache.spark.sql.DataFrame) =
      LanguageModel.bigramSurprisal(df, "doc_id", "text")
        .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val a = run(docs)
    assert(a.length == docs.filter(
      size(split(col("text"), " ")) >= 2).count())
    assert(run(docs.repartition(11)) == a)
    // duplicated docs (the fixture plants near-dups) should score low
    // relative to the corpus; basic sanity: all scores positive finite
    a.foreach { case (_, n, s) =>
      assert(n >= 1 && s > 0.0 && !s.isInfinite && !s.isNaN)
    }
  }
}
