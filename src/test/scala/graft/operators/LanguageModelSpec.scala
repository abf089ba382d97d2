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

  test("gramNovelty: first-seen types per batch, within-doc distinctness") {
    // batch 0: "a b c d" -> grams {abc, bcd}; "a b c e" -> {abc, bce}
    // batch 1: "a b c d" (all stale) ; batch 2: "x y z w" -> 2 new
    val docs = Seq(
      (0L, "a b c d"), (0L, "a b c e"),
      (1L, "a b c d"),
      (2L, "x y z w"))
      .toDF("batch", "text")
    val got = LanguageModel.gramNovelty(docs, "text", "batch", n = 3)
      .orderBy("period")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (0L, 4L, 3L, 3L, 1.0),   // abc(x2 docs), bcd, bce: 4 incidences
      (1L, 2L, 2L, 0L, 0.0),   // all grams seen in batch 0
      (2L, 2L, 2L, 2L, 1.0)))
    // a doc repeating its own gram counts it ONCE (set semantics)
    val rep = Seq((0L, "a b c a b c a b c")).toDF("batch", "text")
    val r = LanguageModel.gramNovelty(rep, "text", "batch", 3)
      .collect().head
    // grams: abc, bca, cab, abc(dup), bca(dup) -> 3 distinct
    assert(r.getLong(1) == 3L && r.getLong(2) == 3L)
    intercept[IllegalArgumentException] {
      LanguageModel.gramNovelty(
        Seq((1.5, "x")).toDF("batch", "text"), "text", "batch")
    }
  }

  test("oovReport: hand-counted OOV occurrences and types per group") {
    // corpus token counts: the(4) cat(3) dog(2) rare(1) odd(1)
    // minCount=2 vocab = {the, cat, dog}; rare/odd are OOV
    val docs = Seq(
      ("s1", "the cat the dog rare"),
      ("s1", "the cat"),
      ("s2", "the cat dog odd rare odd"))
      .toDF("source", "text")
    // careful: odd appears twice in one doc -> corpus cnt 2 -> IN vocab!
    // recount: the=4 cat=3 dog=2 rare=2 odd=2 at minCount=3:
    // vocab={the,cat}; oov occurrences: s1: dog,rare = 2 of 7;
    // s2: dog,odd,rare,odd = 4 of 6
    val got = LanguageModel.oovReport(docs, "source", "text", minCount = 3L)
      .orderBy("source")
      .as[(String, Long, Long, Double, Long)].collect().toSeq
    assert(got == Seq(
      ("s1", 7L, 2L, 2.0 / 7.0, 2L),   // types: dog, rare
      ("s2", 6L, 4L, 4.0 / 6.0, 3L)))  // types: dog, odd, rare
    // fully in-vocab group emits zeros, not nulls
    val clean = Seq(("a", "x x x"), ("b", "x")).toDF("source", "text")
    val z = LanguageModel.oovReport(clean, "source", "text", 1L)
      .orderBy("source")
      .as[(String, Long, Long, Double, Long)].collect().toSeq
    assert(z == Seq(("a", 3L, 0L, 0.0, 0L), ("b", 1L, 0L, 0.0, 0L)))
    // repartition invariance
    val again = LanguageModel.oovReport(docs.repartition(7), "source",
      "text", 3L).orderBy("source")
      .as[(String, Long, Long, Double, Long)].collect().toSeq
    assert(again == got)
    intercept[IllegalArgumentException] {
      LanguageModel.oovReport(docs, "source", "text", 0L)
    }
  }

  test("vocabGrowth: hand curve, Heaps beta, saturation past the " +
      "corpus end, loud contracts") {
    import spark.implicits._
    // doc 1: a b        (T=2, V={a,b})
    // doc 2: a c c      (T=5, V={a,b,c})
    // doc 3: d          (T=6, V={a,b,c,d})
    // doc 4: a b        (T=8, V unchanged)
    val docs = Seq(
      (1L, "a b"), (2L, "a c c"), (3L, "d"), (4L, "a b"))
      .toDF("doc_id", "text")
    val got = LanguageModel.vocabGrowth(
      docs, "doc_id", "text", Seq(1L, 2L, 4L, 10L))
      .orderBy("cutoff")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    assert(got(0) == ((1L, 1L, 2L, 2L, None))) // first row: no beta
    // cutoff 2: V 2->3, T 2->5; beta = ln(1.5)/ln(2.5)
    assert(got(1)._1 == 2L && got(1)._2 == 2L &&
      got(1)._3 == 5L && got(1)._4 == 3L)
    val b2 = math.floor(
      math.log(3.0 / 2.0) / math.log(5.0 / 2.0) * 1e6 + 0.5) / 1e6
    assert(got(1)._5.contains(b2))
    // cutoff 4: V 3->4, T 5->8
    val b3 = math.floor(
      math.log(4.0 / 3.0) / math.log(8.0 / 5.0) * 1e6 + 0.5) / 1e6
    assert(got(2) == ((4L, 4L, 8L, 4L, Some(b3))))
    // cutoff 10 saturates: same totals, beta null (log ratio 0)
    assert(got(3) == ((10L, 4L, 8L, 4L, None)))
    intercept[IllegalArgumentException] {
      LanguageModel.vocabGrowth(docs, "doc_id", "text", Seq(4L, 2L))
    }
    intercept[IllegalArgumentException] {
      LanguageModel.vocabGrowth(docs, "doc_id", "text", Seq.empty)
    }
  }

  test("collocations: hand PMI values, threshold, empty docs, determinism") {
    import spark.implicits._
    // tokens x:3 y:3 z:1 (Tu=7); bigrams (x,y):3 (y,z):1 (Tb=4)
    val docs = Seq((1L, "x y"), (2L, "x y"), (3L, "x y z"),
      (4L, ""), (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val all = LanguageModel.collocations(docs, "text", 1L)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toMap
    assert(all.keySet == Set(("x", "y"), ("y", "z")))
    assert(all(("x", "y")) ==
      ((3L, 3L, 3L, r6(math.log(3.0 * 49.0 / (4.0 * 9.0))))))
    assert(all(("y", "z")) ==
      ((1L, 3L, 1L, r6(math.log(49.0 / 12.0)))))
    // threshold cuts the singleton pair
    val cut = LanguageModel.collocations(docs, "text", 2L).collect()
    assert(cut.length == 1 && cut.head.getString(0) == "x")
    // repartition-invariant
    val a = LanguageModel.collocations(docs.repartition(1), "text", 1L)
      .orderBy("a", "b").collect().toSeq
    val b = LanguageModel.collocations(docs.repartition(7), "text", 1L)
      .orderBy("a", "b").collect().toSeq
    assert(a == b)
    intercept[IllegalArgumentException] {
      LanguageModel.collocations(docs, "text", 0L)
    }
  }

  test("zipfSlope: hand corpus matches the closed-form OLS fit") {
    // freqs a=4, b=2, c=1 -> ranks 1,2,3
    val docs = Seq("a a a a b b c").toDF("text")
    val got = LanguageModel.zipfSlope(docs, "text").collect().head
    val x = Seq(1.0, 2.0, 3.0).map(math.log)
    val y = Seq(4.0, 2.0, 1.0).map(math.log)
    val n = 3.0
    val (sx, sy) = (x.sum, y.sum)
    val sxx = x.map(v => v * v).sum
    val sxy = x.zip(y).map { case (a, b) => a * b }.sum
    val slope = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    def r6(v: Double) = math.rint(v * 1e6) / 1e6
    assert(got.getLong(0) == 3L)
    assert(math.abs(got.getDouble(1) - r6(slope)) < 2e-6)
    assert(math.abs(got.getDouble(2) - r6((sy - slope * sx) / n)) < 2e-6)
    // a perfectly Zipfian corpus (freq = 8/rank for ranks 1,2,4,8)
    // is NOT constructible with integer consecutive ranks; the sign
    // and monotone-decreasing face is the portable property
    assert(got.getDouble(1) < 0.0)
  }

  test("zipfSlope: loud guards and minCount pre-filter") {
    intercept[IllegalArgumentException] { // one type: no line
      LanguageModel.zipfSlope(Seq("a a a").toDF("text"), "text")
    }
    intercept[IllegalArgumentException] { // vocab over the fold bound
      LanguageModel.zipfSlope(
        Seq("a a b c").toDF("text"), "text", maxVocab = 2L)
    }
    // minCount drops the singleton: fit runs over {a:4, b:2}
    val got = LanguageModel.zipfSlope(
      Seq("a a a a b b c").toDF("text"), "text", minCount = 2L)
      .collect().head
    assert(got.getLong(0) == 2L)
    // two points: slope = ln(2/4)/ln(2/1) = -1 (to rounding)
    assert(math.abs(got.getDouble(1) - (-1.0)) < 2e-6)
  }

  test("zipfSlope twoPhase: partial-sum spelling agrees with the " +
      "ordered-fold face within tolerance and lifts the vocab bound") {
    // a spread of frequencies across 26 types, several partitions so
    // the distributed sums genuinely reassociate
    val docs = ('a' to 'z').zipWithIndex.map { case (c, i) =>
      (Seq.fill(i + 1)(c.toString) ++ Seq.fill((i * 7) % 5 + 1)(
        s"$c$c")).mkString(" ")
    }.toDF("text").repartition(7)
    val exact = LanguageModel.zipfSlope(docs, "text").collect().head
    val two = LanguageModel.zipfSlope(docs, "text", twoPhase = true)
      .collect().head
    assert(exact.getLong(0) == two.getLong(0))
    // reassociation error is O(n·eps) on the raw moments — far inside
    // the 6-decimal face; allow one ulp of the rounded face
    assert(math.abs(exact.getDouble(1) - two.getDouble(1)) <= 2e-6)
    assert(math.abs(exact.getDouble(2) - two.getDouble(2)) <= 2e-6)
    // twoPhase lifts the one-task fold bound (no maxVocab raise)
    val lifted = LanguageModel.zipfSlope(
      Seq("a a b c").toDF("text"), "text", maxVocab = 2L,
      twoPhase = true).collect().head
    assert(lifted.getLong(0) == 3L)
  }
}
