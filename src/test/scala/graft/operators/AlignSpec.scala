package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AlignSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // hand-built k-NN frames in the bruteForceTopK contract
  // (query_id, rank, nn_id, cos)
  private def knn(rows: (Long, Long, Long, Double)*) =
    rows.toDF("query_id", "rank", "nn_id", "cos")

  test("marginScore: hand-computed margin, best partner kept") {
    // x=1: neighbors y=11 (cos .9), y=13 (cos .5) -> mean .7
    val fwd = knn((1L, 1L, 11L, 0.9), (1L, 2L, 13L, 0.5))
    // y=11: mean .8; y=13: mean .2
    val bwd = knn(
      (11L, 1L, 1L, 0.9), (11L, 2L, 2L, 0.7),
      (13L, 1L, 1L, 0.5), (13L, 2L, 2L, -0.1))
    val got = Align.marginScore(fwd, bwd, k = 2, minMargin = 0.0)
      .as[(Long, Long, Double, Double)].collect()
    // margin(1,11) = .9 / ((.7+.8)/2) = 1.2
    // margin(1,13) = .5 / ((.7+.2)/2) = 1.111..; best is y=11
    assert(got.toSeq == Seq((1L, 11L, 0.9, 0.9 / 0.75)))
  }

  test("marginScore: hubness correction can flip the raw-cosine order") {
    // y=11 is a hub (dense neighborhood, mean .88): x's higher cosine
    // to it LOSES to the isolated y=13 once margins normalize density.
    val fwd = knn((1L, 1L, 11L, 0.9), (1L, 2L, 13L, 0.8))
    val bwd = knn(
      (11L, 1L, 2L, 0.92), (11L, 2L, 1L, 0.84),
      (13L, 1L, 1L, 0.8), (13L, 2L, 2L, 0.0))
    val got = Align.marginScore(fwd, bwd, k = 2, minMargin = 0.0)
      .as[(Long, Long, Double, Double)].collect()
    assert(got.length == 1)
    assert(got.head._2 == 13L) // not the hub, despite cos .8 < .9
  }

  test("marginScore: minMargin filters, queries below it vanish") {
    val fwd = knn((1L, 1L, 11L, 0.5), (2L, 1L, 11L, 0.9))
    val bwd = knn((11L, 1L, 2L, 0.9), (11L, 2L, 1L, 0.5))
    // x=1: mean .5, margin = .5/((.5+.7)/2) = .833...
    // x=2: mean .9, margin = .9/((.9+.7)/2) = 1.125
    val got = Align.marginScore(fwd, bwd, k = 2, minMargin = 1.0)
      .as[(Long, Long, Double, Double)].collect()
    assert(got.map(_._1).toSeq == Seq(2L))
  }

  test("marginScore: repartition-invariant (rank-ordered fold)") {
    val e = spark.read
      .parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val a = e.filter(col("vec_id") % 2 === 0)
    val b = e.filter(col("vec_id") % 2 === 1)
    def run(parts: Int) = {
      val fwd = Similarity.bruteForceTopK(
        b.repartition(parts), "vec_id", "embedding",
        a, "vec_id", "embedding", k = 4)
      val bwd = Similarity.bruteForceTopK(
        a.repartition(parts), "vec_id", "embedding",
        b, "vec_id", "embedding", k = 4)
      Align.marginScore(fwd, bwd, k = 4, minMargin = 1.05)
        .orderBy("src_id")
        .as[(Long, Long, Double, Double)].collect().toSeq
    }
    val r1 = run(2)
    val r2 = run(7)
    assert(r1 == r2) // bitwise: the means fold in rank order
    assert(r1.nonEmpty)
  }

  test("marginScore: k out of bounds fails loudly") {
    val f = knn((1L, 1L, 11L, 0.9))
    intercept[IllegalArgumentException] {
      Align.marginScore(f, f, k = 0)
    }
    intercept[IllegalArgumentException] {
      Align.marginScore(f, f, k = 65)
    }
  }

  test("marginScore: non-positive neighborhood mean fails loudly " +
      "(the ratio margin inverts on negative means)") {
    // y=13's mean is (-0.2 + -0.4)/2 < 0: a ratio margin would rank
    // the WORST candidate first — loud failure instead. The guard is
    // in-plan (raise_error), so it surfaces at the ACTION, not at
    // build — the r9 zero-extra-pass spelling.
    val fwd = knn((1L, 1L, 11L, 0.9), (1L, 2L, 13L, 0.5))
    val bwd = knn(
      (11L, 1L, 1L, 0.9), (11L, 2L, 2L, 0.7),
      (13L, 1L, 1L, -0.2), (13L, 2L, 2L, -0.4))
    val e = intercept[Exception] {
      Align.marginScore(fwd, bwd, k = 2, minMargin = 0.0).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("neighborhood mean cosine")))
  }

  test("marginScoreBoth: bitwise equal to the two-call spelling on the " +
      "real dual k-NN frames (the streamed tail's shape)") {
    val e = spark.read
      .parquet(s"${TestSpark.sf0001}/embeddings.parquet")
      .select("vec_id", "embedding")
    val a = e.filter($"vec_id" % 2 === 0)
    val b = e.filter($"vec_id" % 2 === 1)
    val fwd = Similarity.bruteForceTopK(
      b, "vec_id", "embedding", a, "vec_id", "embedding", k = 4)
    val bwd = Similarity.bruteForceTopK(
      a, "vec_id", "embedding", b, "vec_id", "embedding", k = 4)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("src_id", "dst_id", "cos", "margin")
        .as[(Long, Long, Double, Double)].collect().sorted.toSeq
    val twoCall = rows(Align.marginScore(fwd, bwd, 4, 1.0)) ++
      rows(Align.marginScore(bwd, fwd, 4, 1.0))
    val onePass = rows(Align.marginScoreBoth(fwd.unionByName(bwd), 4, 1.0))
    assert(onePass.nonEmpty)
    assert(onePass == twoCall.sorted,
      "one-pass dual margin diverged from the two-call spelling")
  }

  test("marginScore: a bad mean never joined into a margin does not " +
      "fire the in-plan guard (it influences no emitted pair)") {
    // y=99 has a negative mean in bwd but is nobody's forward
    // candidate — the scored join never consumes it, so the mine
    // succeeds (the r8 build-time collect would have failed here)
    val fwd = knn((1L, 1L, 11L, 0.9))
    val bwd = knn(
      (11L, 1L, 1L, 0.9), (11L, 2L, 2L, 0.7),
      (99L, 1L, 1L, -0.5))
    val got = Align.marginScore(fwd, bwd, k = 2, minMargin = 0.0)
      .as[(Long, Long, Double, Double)].collect()
    assert(got.length == 1 && got.head._2 == 11L)
  }
}
