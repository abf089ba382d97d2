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

  // ----- BM25 -----

  /** Driver-side BM25 reference with the same rational idf and
    * sorted-term fold. */
  private def bm25Ref(
      rows: Seq[(Long, String)], terms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): Seq[(Long, Long, Double)] = {
    val toks = rows.map { case (id, t) =>
      id -> t.split(" ").filter(_.nonEmpty).toSeq
    }
    val n = toks.size.toLong
    val tot = toks.map(_._2.size.toLong).sum
    val avgdl = tot.toDouble / n.toDouble
    val dfm = terms.distinct.map { t =>
      t -> toks.count(_._2.contains(t)).toLong
    }.toMap
    val scored = toks.flatMap { case (id, ws) =>
      val contribs = terms.distinct.sorted.flatMap { t =>
        val tf = ws.count(_ == t).toLong
        if (tf == 0L) None
        else {
          val df = dfm(t).toDouble
          val idf = (n.toDouble - df + 0.5) / (df + 0.5)
          Some(idf * ((tf.toDouble * (k1 + 1.0)) /
            (tf.toDouble + k1 * ((1.0 - b) + b * (ws.size.toDouble / avgdl)))))
        }
      }
      if (contribs.isEmpty) None
      else Some(id -> contribs.foldLeft(0.0)(_ + _))
    }
    scored.sortBy { case (id, s) => (-s, id) }.take(k)
      .zipWithIndex.map { case ((id, s), i) => (i + 1L, id, s) }
  }

  private val searchDocs = Seq(
    (1L, "spark query engine"),                      // 1x query, short
    (2L, "query query query query engine planner"),  // saturated tf
    (3L, "query"),                                   // shortest doc
    (4L, "a long document about nothing relevant at all with many words"),
    (5L, "engine room"),
    (6L, "query engine query engine")                // both terms twice
  )

  test("bm25TopK == driver reference, exact doubles") {
    val got = TfIdf.bm25TopK(searchDocs.toDF("doc_id", "text"),
        "doc_id", "text", Seq("query", "engine"), k = 4)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == bm25Ref(searchDocs, Seq("query", "engine"), 4))
    assert(got.size == 4)
    // doc 6 (both terms, twice, short) must outrank doc 4 (no terms:
    // absent) and doc 3 (one term once)
    val rankOf = got.map(r => r._2 -> r._1).toMap
    assert(rankOf.contains(6L) && !rankOf.contains(4L))
  }

  test("bm25 tf saturation: 4x tf scores less than 4x the 1x score") {
    val two = Seq((1L, "query pad pad pad"), (2L, "query query query query"))
    val got = TfIdf.bm25TopK(two.toDF("doc_id", "text"),
        "doc_id", "text", Seq("query"), k = 2)
      .as[(Long, Long, Double)].collect().map(r => r._2 -> r._3).toMap
    assert(got(2L) > got(1L))
    assert(got(2L) < 4.0 * got(1L), "k1 saturation must bend the curve")
  }

  test("bm25 invariant under repartitioning; duplicate query terms collapse") {
    val df = searchDocs.toDF("doc_id", "text")
    val base = TfIdf.bm25TopK(df, "doc_id", "text",
      Seq("query", "engine"), 6).as[(Long, Long, Double)].collect().toSeq
    val re = TfIdf.bm25TopK(df.repartition(7), "doc_id", "text",
      Seq("engine", "query", "query"), 6)
      .as[(Long, Long, Double)].collect().toSeq
    assert(re == base)
  }

  // ----- phrase search -----

  test("phraseSearch: consecutive-only matches, overlaps, counts") {
    val docs = Seq(
      (1L, "a b c a b c"),        // "a b c" twice
      (2L, "a c b"),              // words present, never consecutive
      (3L, "x a b c y"),          // once, mid-document
      (4L, "a b"),                // too short
      (5L, "c b a")               // reversed
    ).toDF("doc_id", "text")
    val got = TfIdf.phraseSearch(docs, "doc_id", "text", Seq("a", "b", "c"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 3L -> 1L))
  }

  test("phraseSearch: repeated-word phrases and self-overlap") {
    val docs = Seq(
      (1L, "go go go stop"),     // "go go" at anchors 0 and 1
      (2L, "go stop go")
    ).toDF("doc_id", "text")
    val got = TfIdf.phraseSearch(docs, "doc_id", "text", Seq("go", "go"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L))
    // single-word phrase degenerates to term count
    val one = TfIdf.phraseSearch(docs, "doc_id", "text", Seq("go"))
      .as[(Long, Long)].collect().toMap
    assert(one == Map(1L -> 3L, 2L -> 2L))
  }

  test("jaccardTopK == driver reference; zero-overlap docs excluded") {
    val docs = Seq(
      (1L, "a b c d e"),          // shares grams with the query
      (2L, "a b c x y"),
      (3L, "p q r s t"),          // disjoint
      (4L, "a b"),                // too short for 3-grams
      (5L, "c d e f g")
    ).toDF("doc_id", "text")
    val query = "a b c d x"
    val got = TfIdf.jaccardTopK(docs, "doc_id", "text", query, k = 10)
      .as[(Long, Long, Double)].collect().toSeq
    val qg = Kernels.wordNgrams(query, 3).toSet
    val ref = Seq(1L -> "a b c d e", 2L -> "a b c x y", 5L -> "c d e f g",
      3L -> "p q r s t")
      .map { case (id, t) =>
        val g = Kernels.wordNgrams(t, 3).toSet
        val i = (g & qg).size
        id -> (if (g.isEmpty) 0.0
               else i.toDouble / (g.size + qg.size - i))
      }.filter(_._2 > 0)
      .sortBy { case (id, j) => (-j, id) }
      .zipWithIndex.map { case ((id, j), r) => (r + 1L, id, j) }
    assert(got == ref)
    assert(!got.exists(r => Set(3L, 4L).contains(r._2)))
    intercept[IllegalArgumentException] {
      TfIdf.jaccardTopK(docs, "doc_id", "text", "too short", k = 5)
    }
  }

  test("phraseSearch matches a scan reference on the fixture corpus") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val phrase = Seq("slow", "hash", "batch")
    val got = TfIdf.phraseSearch(docs, "doc_id", "text", phrase)
      .as[(Long, Long)].collect().toMap
    val ref = docs.select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) =>
        val ws = t.split(" ").filter(_.nonEmpty)
        id -> (0 to ws.length - phrase.length).count(
          i => ws.slice(i, i + phrase.length).toSeq == phrase).toLong
      }.filter(_._2 > 0).toMap
    assert(got == ref)
  }

  test("distinctiveTerms: relevance ratio, corpus floor, rank cutoff") {
    // s1 says "spam" 6x of its 10 tokens; s2 never does.
    // corpus: spam 6, filler 14 (floor 2 keeps both)
    val docs = Seq(
      ("s1", "spam spam spam spam spam spam base base base base"),
      ("s2", "base base base base base base base base base base"))
      .toDF("source", "text")
    val got = TfIdf.distinctiveTerms(docs, "source", "text",
      minCorpusCount = 2L, k = 2)
      .orderBy("source", "rank")
      .as[(String, String, Long, Long, Double, Long)].collect().toSeq
    val m = got.map(r => (r._1, r._2) -> r._5).toMap
    // score(spam | s1) = (6 * 20) / (6 * 10) = 2.0
    assert(m(("s1", "spam")) == 2.0)
    // score(base | s2) = (10 * 20) / (14 * 10) = 10/7
    assert(m(("s2", "base")) == (10.0 * 20.0) / (14.0 * 10.0))
    // s1's top term is spam, rank 1
    assert(got.head == (("s1", "spam", 6L, 6L, 2.0, 1L)))
    // the floor screens out terms below corpus support
    val floored = TfIdf.distinctiveTerms(docs, "source", "text",
      minCorpusCount = 7L, k = 5)
      .as[(String, String, Long, Long, Double, Long)].collect()
    assert(floored.forall(_._2 == "base"))
    intercept[IllegalArgumentException] {
      TfIdf.distinctiveTerms(docs, "source", "text", k = 0)
    }
  }

  test("cooccurTopPairs: hand-checked lift on a tiny corpus") {
    // 4 docs; "a b" co-occur in 2 of 4 docs, df(a)=3, df(b)=2
    //   lift(a,b) = 2*4/(3*2) = 4/3
    // "a c" co-occur once, df(c)=2 -> lift = 1*4/(3*2) = 2/3
    // "b c" never co-occur -> no row
    val docs = Seq(
      (1L, "a b a"), (2L, "a b"), (3L, "a c"), (4L, "c d"))
      .toDF("doc_id", "text")
    val got = TfIdf.cooccurTopPairs(docs, "doc_id", "text",
      maxVocab = 10, minDf = 1L, k = 10)
      .as[(Long, String, String, Long, Long, Long, Double)]
      .collect().toSeq
    val m = got.map(r => (r._2, r._3) -> r).toMap
    assert(m(("a", "b"))._4 == 2L)
    assert(m(("a", "b"))._7 == 2.0 * 4 / (3 * 2))
    assert(m(("a", "c"))._7 == 1.0 * 4 / (3 * 2))
    assert(!m.contains(("b", "c")))
    // rank 1 is the highest lift: (c,d) with df(d)=1 lifts to
    // 1*4/(2*1) = 2.0 — rare-pair inflation, the reason real runs
    // set minDf > 1; (a,b) at 4/3 ranks second
    assert(m(("c", "d"))._7 == 2.0)
    assert(got.head._1 == 1L && (got.head._2, got.head._3) == ("c", "d"))
    assert(got(1)._1 == 2L && (got(1)._2, got(1)._3) == ("a", "b"))
    // minDf=2 screens the rare-term pair out entirely
    val screened = TfIdf.cooccurTopPairs(docs, "doc_id", "text",
      maxVocab = 10, minDf = 2L, k = 10)
      .as[(Long, String, String, Long, Long, Long, Double)]
      .collect().toSeq
    assert(screened.head._1 == 1L &&
      (screened.head._2, screened.head._3) == ("a", "b"))
    assert(!screened.exists(r => r._2 == "d" || r._3 == "d"))
  }

  test("cooccurTopPairs: vocab cutoff prunes pairs; deterministic") {
    // maxVocab=2 keeps the two highest-df terms (df desc, term asc):
    // a(df 3), b(df 2) beats c(df 2) on the term tiebreak
    val docs = Seq(
      (1L, "a b a"), (2L, "a b"), (3L, "a c"), (4L, "c b"))
      .toDF("doc_id", "text")
    val got = TfIdf.cooccurTopPairs(docs, "doc_id", "text",
      maxVocab = 2, minDf = 1L, k = 10)
      .as[(Long, String, String, Long, Long, Long, Double)]
      .collect().toSeq
    assert(got.map(r => (r._2, r._3)) == Seq(("a", "b")))
    // repartition invariance
    val again = TfIdf.cooccurTopPairs(docs.repartition(7), "doc_id",
      "text", maxVocab = 2, minDf = 1L, k = 10)
      .as[(Long, String, String, Long, Long, Long, Double)]
      .collect().toSeq
    assert(got == again)
    intercept[IllegalArgumentException] {
      TfIdf.cooccurTopPairs(docs, "doc_id", "text", maxVocab = 1)
    }
    intercept[IllegalArgumentException] {
      TfIdf.cooccurTopPairs(docs, "doc_id", "text", k = 0)
    }
  }
}
