package graft.operators

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class PrivacySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus = (
    (1 to 10).map(i => ("a", s"x$i")) ++ // a: 10 rows
      (1 to 5).map(i => ("b", s"y$i")) ++ // b: 5 rows
      Seq(("c", "z1"), ("c", "z2")) // c: 2 rows (suppressible)
    ).toSeq.toDF("grp", "payload")

  test("dpCounts: k-suppression withholds small groups entirely") {
    val out = Privacy.dpCounts(
      corpus, Seq("grp"), epsilon = 1.0, k = 3L, salt = "graft")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 10L, "b" -> 5L)) // c absent, not zeroed
  }

  test("dpCounts: noise is deterministic, bounded-biased, salt-keyed") {
    def release(salt: String) =
      Privacy.dpCounts(corpus, Seq("grp"), 1.0, 1L, salt)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getDouble(2))).toMap
    val a = release("graft")
    // identical on re-run and under repartitioning (retry-proof)
    assert(release("graft") == a)
    val b = Privacy.dpCounts(corpus.repartition(7), Seq("grp"), 1.0, 1L, "graft")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    assert(b == a)
    // a different salt re-draws the noise
    assert(release("other") != a)
    // release = true count + Laplace(1/eps) noise, floored at 0:
    // with eps=1 the |noise| median is ln(2); check plausibility
    a.foreach { case (_, (n, rel)) =>
      assert(rel >= 0.0 && math.abs(rel - n) < 40.0)
    }
    // at least one group's noise is nonzero (md5 uniform is not 0.5)
    assert(a.exists { case (_, (n, rel)) => rel != n.toDouble })
  }

  test("dpCounts: noise matches the inverse-CDF construction exactly") {
    val out = Privacy.dpCounts(corpus, Seq("grp"), 2.0, 1L, "s7")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    def expected(grp: String, n: Long): Double = {
      val m = Kernels.md5Lower64(grp + ":s7") >>> 11
      val u = (m.toDouble + 0.5) / 9007199254740992.0
      val v = u - 0.5
      val s = if (v >= 0) 1.0 else -1.0
      val noise = -(1.0 / 2.0) * s * math.log(1.0 - 2.0 * math.abs(v))
      math.floor(math.max(n + noise, 0.0) * 1e6 + 0.5) / 1e6
    }
    assert(math.abs(out("a") - expected("a", 10L)) < 1e-9)
    assert(math.abs(out("b") - expected("b", 5L)) < 1e-9)
  }

  test("dpCounts: multi-dim key is the pipe-joined group value") {
    val df = Seq(("a", "en", 1), ("a", "en", 2), ("a", "de", 3))
      .toDF("src", "lang", "x")
    val out = Privacy.dpCounts(df, Seq("src", "lang"), 1.0, 1L, "graft")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getLong(2)).toMap
    assert(out == Map(("a", "en") -> 2L, ("a", "de") -> 1L))
    intercept[IllegalArgumentException] {
      Privacy.dpCounts(df, Seq.empty, 1.0, 1L, "graft")
    }
    intercept[IllegalArgumentException] {
      Privacy.dpCounts(df, Seq("src"), 0.0, 1L, "graft")
    }
    intercept[IllegalArgumentException] {
      Privacy.dpCounts(df, Seq("src"), 1.0, 0L, "graft")
    }
    // the salt keys the noise: an empty salt is refused loudly
    intercept[IllegalArgumentException] {
      Privacy.dpCounts(df, Seq("src"), 1.0, 1L, "")
    }
  }

  test("luhnValid: known card checksums; ccAudit hand counts") {
    import spark.implicits._
    val checks = Seq("4532015112830366", "4111111111111111",
      "4111111111111112", "5500005555555559", "1234567890123")
      .toDF("s")
      .select(col("s"), Privacy.luhnValid(col("s")).as("v"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(checks("4532015112830366") && checks("4111111111111111")
      && checks("5500005555555559"))
    assert(!checks("4111111111111112") && !checks("1234567890123"))
    // audit: src a has one valid + one invalid candidate doc, one
    // clean doc; src b is clean
    val docs = Seq(
      ("a", "pay 4111111111111111 now"),
      ("a", "ref 4111111111111112 bad"),
      ("a", "no digits here"),
      ("b", "clean")).toDF("src", "text")
    val got = Privacy.ccAudit(docs, Seq("src"), "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) None else Some(r.getDouble(5)))).toMap
    assert(got("a") == ((3L, 2L, 2L, 1L, Some(0.5))))
    assert(got("b") == ((1L, 0L, 0L, 0L, None)))
    intercept[IllegalArgumentException] {
      Privacy.ccAudit(docs, Seq("n_docs"), "text")
    }
  }

  test("kAnonymityAudit: hand groups, NULL quasi audits as its own " +
      "cell, loud contracts") {
    val rows = Seq(
      (Option("nyc"), "flu"), (Option("nyc"), "flu"),
      (Option("nyc"), "cold"),                      // n=3, l=2
      (Option("sf"), "flu"),                        // n=1 -> at risk
      (Option.empty[String], "flu"),
      (Option.empty[String], "flu")                 // NULL cell, l=1
    ).toDF("city", "dx")
    val got = Privacy.kAnonymityAudit(rows, Seq("city"), "dx", k = 2L)
      .collect()
      .map(r => Option(r.getString(0)).getOrElse("_null") ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got == Map(
      "nyc" -> ((3L, 2L, false)),
      "sf" -> ((1L, 1L, true)),
      "_null" -> ((2L, 1L, false))))
    intercept[IllegalArgumentException] {
      Privacy.kAnonymityAudit(rows, Seq.empty, "dx", k = 2L)
    }
    intercept[IllegalArgumentException] {
      Privacy.kAnonymityAudit(rows, Seq("city"), "dx", k = 1L)
    }
    intercept[IllegalArgumentException] {
      Privacy.kAnonymityAudit(rows, Seq("dx"), "dx", k = 2L)
    }
  }
}
