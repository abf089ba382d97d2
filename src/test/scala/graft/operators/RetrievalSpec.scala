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

  // ---- rerankBlend ----

  private def blend(cos: Double, cov: Double, den: Double): Double =
    BigDecimal(0.5 * ((cos + 1.0) / 2.0) + 0.3 * cov
      + 0.2 * (den / (1.0 + den)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("rerankBlend: hand features, missing vector and missing doc " +
      "coalesce, final order by blended score") {
    val docs = Seq(
      (1L, "join hash scan join"), // coverage 1, den 4/4
      (2L, "hash only here"),      // coverage 1/3, den 1/3
      (3L, "nothing relevant"))    // coverage 0, den 0
      .toDF("doc_id", "text")
    val emb = Seq(
      (0L, Array(1f, 0f)),  // the query vector
      (1L, Array(1f, 0f)),  // cos 1 with the query
      (2L, Array(0f, 1f)),  // cos 0
      (4L, Array(1f, 0f)))  // vector-only candidate, no doc row
      .toDF("vec_id", "embedding")
    val fused = Seq((1L, 3L), (2L, 1L), (3L, 2L), (4L, 4L))
      .toDF("id", "rank")
    val got = Retrieval.rerankBlend(
      fused, "id", "rank", docs, "doc_id", "text",
      emb, "vec_id", "embedding",
      Seq("join", "hash", "scan"), queryVecId = 0L, topK = 10)
      .collect()
      .map(r => r.getLong(1) -> ((r.getLong(0), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5),
        r.getLong(6)))).toMap
    // id 1: full coverage + cos 1 -> 0.5 + 0.3 + 0.2*0.5 = 0.9
    assert(got(1L) == ((1L, 0.9, 1.0, 1.0, 1.0, 3L)))
    // id 4: no doc row -> text features 0; cos 1 -> 0.5
    assert(got(4L)._2 == blend(1.0, 0.0, 0.0) &&
      got(4L)._1 == 2L && got(4L)._6 == 4L)
    // id 2: cos 0, coverage 1/3, den 1/3
    assert(got(2L)._2 == blend(0.0, 1.0 / 3.0, 1.0 / 3.0))
    assert(got(2L)._4 == BigDecimal(1.0 / 3.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // id 3: no vector -> cos coalesces to -1, all features 0 -> 0.0
    assert(got(3L) == ((4L, 0.0, -1.0, 0.0, 0.0, 2L)))
    // reranked order 1 > 4 > 2 > 3 differs from the fused order
    assert(got.toSeq.sortBy(_._2._1).map(_._1) ==
      Seq(1L, 4L, 2L, 3L))
  }

  test("rerankBlend: loud contracts") {
    val docs = Seq((1L, "a")).toDF("doc_id", "text")
    val emb = Seq((0L, Array(1f))).toDF("vec_id", "embedding")
    val fused = Seq((1L, 1L)).toDF("id", "rank")
    def call(terms: Seq[String], topK: Int = 10,
        wCos: Double = 0.5, wCov: Double = 0.3, wDen: Double = 0.2) =
      Retrieval.rerankBlend(fused, "id", "rank", docs, "doc_id",
        "text", emb, "vec_id", "embedding", terms, 0L, topK,
        wCos, wCov, wDen)
    intercept[IllegalArgumentException] { call(Seq.empty) }
    intercept[IllegalArgumentException] { call(Seq("a", "a")) }
    intercept[IllegalArgumentException] { call(Seq("a"), topK = 0) }
    intercept[IllegalArgumentException] {
      call(Seq("a"), wCos = -0.1)
    }
    intercept[IllegalArgumentException] {
      call(Seq("a"), wCos = 0, wCov = 0, wDen = 0)
    }
  }

  test("rerankBlend: absent or duplicated queryVecId fails loudly " +
      "instead of silently scoring every cosine as -1") {
    val docs = Seq((1L, "a")).toDF("doc_id", "text")
    val fused = Seq((1L, 1L)).toDF("id", "rank")
    def call(emb: org.apache.spark.sql.DataFrame) =
      Retrieval.rerankBlend(fused, "id", "rank", docs, "doc_id",
        "text", emb, "vec_id", "embedding", Seq("a"), 0L, 10)
    // absent: id 0 not in the frame
    val absent = Seq((1L, Array(1f))).toDF("vec_id", "embedding")
    val e1 = intercept[IllegalArgumentException] { call(absent) }
    assert(e1.getMessage.contains("matched 0 rows"))
    // duplicated: id 0 twice would fan candidates out
    val dup = Seq((0L, Array(1f)), (0L, Array(0f)))
      .toDF("vec_id", "embedding")
    val e2 = intercept[IllegalArgumentException] { call(dup) }
    assert(e2.getMessage.contains("matched 2 rows"))
  }

  // (query_id, rank, nn_id, cos) / (query_id, id_a, id_b, sim)
  private def mmrCand(rows: (Long, Long, Long, Double)*) =
    rows.toDF("query_id", "rank", "nn_id", "cos")
  private def mmrSims(rows: (Long, Long, Long, Double)*) =
    rows.toDF("query_id", "id_a", "id_b", "sim")

  test("mmrDiversify: the diversity penalty skips the near-dup of " +
      "the first pick") {
    // A (.9) picked first; B (.88) is A's near-dup (sim .99), C (.5)
    // is diverse (sim .1): step 2 takes C despite the lower cosine
    val cand = mmrCand(
      (1L, 1L, 11L, 0.9), (1L, 2L, 12L, 0.88), (1L, 3L, 13L, 0.5))
    val sims = mmrSims(
      (1L, 11L, 12L, 0.99), (1L, 12L, 11L, 0.99),
      (1L, 11L, 13L, 0.1), (1L, 13L, 11L, 0.1),
      (1L, 12L, 13L, 0.1), (1L, 13L, 12L, 0.1))
    val got = Retrieval.mmrDiversify(cand, sims, m = 3)
      .orderBy("step")
      .as[(Long, Long, Long, Double)].collect().toSeq
    def r6(v: Double) = math.rint(v * 1e6) / 1e6
    assert(got.map(t => (t._2, t._3)) ==
      Seq((1L, 11L), (2L, 13L), (3L, 12L)))
    assert(got(0)._4 == 0.9)
    // C: .7*.5 - .3*.1 = .32 ; B after {A,C}: .7*.88 - .3*.99
    assert(math.abs(got(1)._4 - r6(0.7 * 0.5 - 0.3 * 0.1)) < 2e-6)
    assert(math.abs(got(2)._4 - r6(0.7 * 0.88 - 0.3 * 0.99)) < 2e-6)
  }

  test("mmrDiversify: m=1 is the raw top hit; short lists stay " +
      "short; loud contracts") {
    val cand = mmrCand((1L, 1L, 11L, 0.9), (1L, 2L, 12L, 0.8))
    val sims = mmrSims((1L, 11L, 12L, 0.5), (1L, 12L, 11L, 0.5))
    val one = Retrieval.mmrDiversify(cand, sims, m = 1).collect()
    assert(one.length == 1 && one.head.getLong(2) == 11L)
    // two candidates, m=4: steps 3 and 4 have nothing to pick
    val short = Retrieval.mmrDiversify(cand, sims, m = 4)
      .orderBy("step").collect()
    assert(short.length == 2)
    intercept[IllegalArgumentException] {
      Retrieval.mmrDiversify(cand, sims, m = 0)
    }
    intercept[IllegalArgumentException] {
      Retrieval.mmrDiversify(cand, sims, m = 9)
    }
    intercept[IllegalArgumentException] {
      Retrieval.mmrDiversify(cand, sims, m = 2, wRel = 0.0, wDiv = 0.0)
    }
  }

  test("labelEval: hand P@k / MRR / nDCG against the closed forms") {
    // corpus labels: A = {1, 11, 13}, B = {12, 14}, C = {2}
    val labels = Seq((1L, "A"), (11L, "A"), (12L, "B"), (13L, "A"),
      (14L, "B"), (2L, "C")).toDF("id", "lab")
    // query 1 (A): hits at ranks 2 and 3; query 2 (C): no other C
    val knn = Seq(
      (1L, 1L, 12L, 0.9), (1L, 2L, 11L, 0.8),
      (1L, 3L, 13L, 0.7), (1L, 4L, 14L, 0.6),
      (2L, 1L, 11L, 0.9), (2L, 2L, 12L, 0.8),
      (2L, 3L, 13L, 0.7), (2L, 4L, 14L, 0.6)
    ).toDF("query_id", "rank", "nn_id", "cos")
    val got = Retrieval.labelEval(knn, labels, "id", "lab", k = 4)
      .orderBy("query_id").collect()
    def lg(r: Double) = 1.0 / (math.log(r + 1.0) / math.log(2.0))
    def r6(v: Double) = math.rint(v * 1e6) / 1e6
    val q1 = got(0)
    assert(q1.getLong(1) == 2L)                       // n_rel = min(3-1, 4)
    assert(q1.getDouble(2) == 0.5)                    // p@4 = 2/4
    assert(q1.getDouble(3) == 0.5)                    // mrr = 1/2
    val ndcg = (lg(2) + lg(3)) / (lg(1) + lg(2))
    assert(math.abs(q1.getDouble(4) - r6(ndcg)) < 2e-6)
    val q2 = got(1)
    assert(q2.getLong(1) == 0L)                       // no other C member
    assert(q2.getDouble(2) == 0.0 && q2.getDouble(3) == 0.0)
    assert(q2.isNullAt(4))                            // ndcg undecidable
    intercept[IllegalArgumentException] {
      Retrieval.labelEval(knn, labels, "id", "lab", k = 0)
    }
  }

  test("labelEval extraKeys: one grouped pass equals per-key separate " +
      "calls (the q270 grid discipline)") {
    import org.apache.spark.sql.functions.{col, lit}
    val labels = Seq((1L, "A"), (11L, "A"), (12L, "B"), (13L, "A"),
      (14L, "B"), (2L, "C")).toDF("id", "lab")
    // two bands over the same queries with different candidate lists
    val knn = Seq(
      (4L, 1L, 1L, 12L, 0.9), (4L, 1L, 2L, 11L, 0.8),
      (4L, 2L, 1L, 11L, 0.9), (4L, 2L, 2L, 13L, 0.8),
      (5L, 1L, 1L, 11L, 0.9), (5L, 1L, 2L, 13L, 0.8),
      (5L, 2L, 1L, 12L, 0.9)
    ).toDF("band", "query_id", "rank", "nn_id", "cos")
    val grouped = Retrieval.labelEval(
        knn, labels, "id", "lab", k = 2, extraKeys = Seq("band"))
      .orderBy("band", "query_id")
      .collect().map(_.toSeq).toSeq
    val separate = Seq(4L, 5L).flatMap { bd =>
      Retrieval.labelEval(
          knn.filter(col("band") === bd).drop("band"),
          labels, "id", "lab", k = 2)
        .withColumn("band", lit(bd))
        .select("band", "query_id", "n_rel", "p_at_k", "mrr", "ndcg")
        .orderBy("query_id")
        .collect().map(_.toSeq).toSeq
    }
    assert(grouped.nonEmpty && grouped == separate)
    // empty default unchanged: no keys -> the r9 shape
    assert(Retrieval.labelEval(
        knn.filter(col("band") === 4L).drop("band"),
        labels, "id", "lab", k = 2).columns.toSeq ==
      Seq("query_id", "n_rel", "p_at_k", "mrr", "ndcg"))
  }
}
