package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class EpochMixtureSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Driver-side single-pass reference: global per-group cumulative
    * in md5 order — the semantics the bucketed operator must match. */
  private def reference(
      rows: Seq[(Long, String, String)], // (id, group, text)
      weights: Map[String, Double],
      budget: Long,
      salt: String = "graft"): Seq[(Long, String, Long)] = {
    val wsum = weights.values.sum
    val toks = rows.map { case (id, g, t) =>
      (id, g, t.split(" ").count(_.nonEmpty).toLong)
    }
    weights.keys.toSeq.sorted.flatMap { g =>
      val in = toks.filter(_._2 == g)
      val t = in.map(_._3).sum
      if (t == 0L) Seq.empty
      else {
        val target = math.floor(budget * (weights(g) / wsum)).toLong
        val e = target / t
        val r = target - e * t
        val ordered = in.sortBy { case (id, _, _) =>
          (md5hex(s"$salt|$id"), id)
        }
        var cum = 0L
        ordered.flatMap { case (id, _, tk) =>
          cum += tk
          val reps = e + (if (cum <= r) 1L else 0L)
          (0L until reps).map(ep => (id, g, ep))
        }
      }
    }.sortBy { case (id, g, ep) => (id, g, ep) }
  }

  // 3 sources: tiny (repeats), medium (1 epoch + fraction),
  // large (pure subsample); doc token counts vary 0..6
  private val docs: Seq[(Long, String, String)] =
    (0 until 4).map(i => (i.toLong, "tiny", Seq.fill(i + 2)("t").mkString(" "))) ++
      (10 until 30).map(i => (i.toLong, "med", Seq.fill(i % 5 + 1)("m").mkString(" "))) ++
      (100 until 160).map(i => (i.toLong, "big", Seq.fill(i % 7)("b").mkString(" "))) // some 0-token
  private val weights = Map("tiny" -> 0.5, "med" -> 0.25, "big" -> 0.25)
  // tiny T=14 -> target 200, e=14; med T=60 -> target 100, e=1;
  // big T=182 -> target 100, e=0 (pure subsample)
  private val budget = 400L

  private def run(parts: Int): Seq[(Long, String, Long)] =
    Sampling.epochMixture(
      docs.toDF("doc_id", "source", "text").repartition(parts),
      "source", "doc_id", "text", weights, budget)
      .as[(Long, String, Long)].collect().toSeq
      .sortBy { case (id, g, ep) => (id, g, ep) }

  test("bucketed operator == global-cumulative reference; all three regimes") {
    val expected = reference(docs, weights, budget)
    val got = run(8)
    assert(got == expected)
    // the fixture really exercises repeat / epoch+fraction / subsample
    val eByG = got.groupBy(_._2).view.mapValues(_.map(_._3).max).toMap
    assert(eByG("tiny") >= 2L, s"tiny should repeat, got $eByG")
    assert(eByG("med") >= 1L)
    assert(eByG("big") == 0L, "big must be subsample-only")
    val bigIds = docs.filter(_._2 == "big").map(_._1).toSet
    val keptBig = got.filter(_._2 == "big").map(_._1).toSet
    assert(keptBig.nonEmpty && keptBig.size < bigIds.size)
  }

  test("invariant under partitioning") {
    val expected = run(1)
    for (p <- Seq(3, 32)) assert(run(p) == expected, s"parts=$p")
  }

  test("zero-token docs ride free only at the front of the hash order") {
    // all-zero group: no tokens -> skipped entirely
    val df = Seq((1L, "z", ""), (2L, "z", ""), (3L, "ok", "a b c"))
      .toDF("doc_id", "source", "text")
    val got = Sampling.epochMixture(
      df, "source", "doc_id", "text", Map("z" -> 0.5, "ok" -> 0.5), 6L)
      .as[(Long, String, Long)].collect().toSeq
    assert(got.forall(_._2 == "ok"))
    // target ok = 3 tokens = exactly T: e=1, r=0 -> single full epoch
    assert(got == Seq((3L, "ok", 0L)))
  }

  test("maxEpochs guard fails loudly on a runaway repeat factor") {
    val df = Seq((1L, "s", "one two")).toDF("doc_id", "source", "text")
    val e = intercept[IllegalArgumentException] {
      Sampling.epochMixture(
        df, "source", "doc_id", "text", Map("s" -> 1.0), 1000000L)
    }
    assert(e.getMessage.contains("maxEpochs"))
    // raising the bound explicitly is honored
    val got = Sampling.epochMixture(
      df, "source", "doc_id", "text", Map("s" -> 1.0), 10L,
      maxEpochs = 100000L)
    assert(got.count() == 5L) // 10 tokens / 2 per epoch = 5 epochs
  }

  test("missing source skipped; empty weights-filtered input yields empty frame") {
    val df = Seq((1L, "a", "x y")).toDF("doc_id", "source", "text")
    val got = Sampling.epochMixture(
      df, "source", "doc_id", "text", Map("a" -> 0.5, "ghost" -> 0.5), 4L)
      .as[(Long, String, Long)].collect().toSeq
    // a's target = floor(4 * .5) = 2 = T -> one epoch
    assert(got == Seq((1L, "a", 0L)))
    val none = Sampling.epochMixture(
      df, "source", "doc_id", "text", Map("ghost" -> 1.0), 4L)
    assert(none.count() == 0L)
    assert(none.columns.toSeq == Seq("doc_id", "source", "epoch"))
  }
}
