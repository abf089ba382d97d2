package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BoilerplateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // "cookie banner text here" appears in 3 of 5 docs -> its grams are
  // boilerplate at minDocFrac 0.5; unique content grams are not
  private val docs = Seq(
    (1L, "cookie banner text here unique alpha content"),
    (2L, "cookie banner text here unique beta content"),
    (3L, "cookie banner text here unique gamma content"),
    (4L, "entirely different document body words"),
    (5L, "ab")  // < n words -> no grams
  ).toDF("doc_id", "text")

  test("boilerplateNgrams: exact df threshold on ALL docs") {
    val got = Boilerplate.boilerplateNgrams(docs, "doc_id", "text",
      n = 3, minDocFrac = 0.5)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r._2).toMap
    // grams in >= 2.5 docs: the 3 grams shared by docs 1-3
    assert(got == Map(
      "cookie banner text" -> 3L,
      "banner text here" -> 3L,
      "text here unique" -> 3L))
  }

  test("boilerplateScore: per-doc fractions incl. gramless docs") {
    val got = Boilerplate.boilerplateScore(docs, "doc_id", "text",
      n = 3, minDocFrac = 0.5)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got.size == 5)
    // docs 1-3: 5 distinct grams each, 3 boilerplate
    Seq(1L, 2L, 3L).foreach { id =>
      assert(got(id) == ((5L, 3L, 0.6)))
    }
    assert(got(4L) == ((3L, 0L, 0.0)))
    assert(got(5L) == ((0L, 0L, 0.0)))
  }

  test("sourceOverlap: hand-checked shared-gram counts, ordered pairs only") {
    val df = Seq(
      (1L, "s1", "alpha beta gamma delta"),
      (2L, "s2", "alpha beta gamma other"),   // shares 2 grams with s1
      (3L, "s3", "totally different text here"),
      (4L, "s2", "alpha beta gamma delta")    // s2 dup of doc 1: +2 more
    ).toDF("doc_id", "source", "text")
    val got = Boilerplate.sourceOverlap(df, "source", "text", n = 3)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // s1 grams: {abg, bgd}; s2 grams: {abg, bgo, bgd (from doc 4)}
    // shared s1-s2 = {alpha beta gamma, beta gamma delta} = 2
    assert(got == Map(("s1", "s2") -> 2L))
    got.keys.foreach { case (a, b) => assert(a < b) }
  }

  test("boilerplate vocabulary is bounded by gramsPerDoc/minDocFrac on the fixture") {
    val fixture = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val vocab = Boilerplate.boilerplateNgrams(
      fixture, "doc_id", "text", n = 3, minDocFrac = 0.02).count()
    val totalGrams = Boilerplate.boilerplateScore(
      fixture, "doc_id", "text", n = 3, minDocFrac = 0.02)
      .agg(org.apache.spark.sql.functions.sum("n_grams"))
      .as[Long].head()
    val nDocs = fixture.count()
    // structural bound: df >= frac*N per vocab gram, so
    // |vocab| <= totalGrams / (frac*N)
    assert(vocab <= (totalGrams / (0.02 * nDocs)).toLong + 1)
  }
}
