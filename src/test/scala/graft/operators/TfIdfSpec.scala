package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TfIdfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple apple banana"),
    (2L, "banana cherry"),
    (3L, "cherry cherry cherry durian")
  ).toDF("doc_id", "text")

  test("termScores: exact tf, df, and reciprocal-idf scores") {
    val got = TfIdf.termScores(docs, "doc_id", "text")
      .as[(Long, String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    // n_docs = 3; score = tf * 3 / df
    assert(got((1L, "apple")) == ((2L, 1L, 6.0)))   // 2*3/1
    assert(got((1L, "banana")) == ((1L, 2L, 1.5)))  // 1*3/2
    assert(got((2L, "banana")) == ((1L, 2L, 1.5)))
    assert(got((2L, "cherry")) == ((1L, 2L, 1.5)))
    assert(got((3L, "cherry")) == ((3L, 2L, 4.5)))  // 3*3/2
    assert(got((3L, "durian")) == ((1L, 1L, 3.0)))
    assert(got.size == 6)
  }

  test("topTerms: rank order by score desc then term, contiguous ranks") {
    val got = TfIdf.topTerms(docs, "doc_id", "text", k = 2)
      .as[(Long, Long, String, Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(r => (r._3, r._2))).toMap
    assert(got(1L).toSeq == Seq(("apple", 1L), ("banana", 2L)))
    // doc 2: banana and cherry tie at 1.5 -> term tiebreak
    assert(got(2L).toSeq == Seq(("banana", 1L), ("cherry", 2L)))
    assert(got(3L).toSeq == Seq(("cherry", 1L), ("durian", 2L)))
  }

  test("null/empty texts contribute no terms; fixture run is deterministic") {
    val withNulls = Seq(
      (1L, Option("a b")), (2L, Option("")), (3L, Option.empty[String])
    ).toDF("doc_id", "text")
    val ids = TfIdf.termScores(withNulls, "doc_id", "text")
      .select("id").as[Long].collect().toSet
    assert(ids == Set(1L))
    val fixture = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    def run() = TfIdf.topTerms(fixture, "doc_id", "text", 3)
      .as[(Long, Long, String, Long, Long, Double)].collect().toSet
    assert(run() == run())
  }
}
