package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ExpectationsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dirty = Seq(
    // (id, name, score)
    (Some(1L), Some("alpha"), Some(10L)),
    (Some(2L), Some("beta"), Some(200L)),   // score out of range
    (Some(2L), Some("gamma"), Some(20L)),   // duplicate id
    (Some(3L), None, Some(30L)),            // null name
    (None, Some("Delta"), None),            // null id + null score + bad case
    (Some(4L), Some("epsilon"), Some(40L))
  ).toDF("id", "name", "score")

  test("planted violations are counted per rule; clean rules pass") {
    val got = Expectations.audit(
      dirty,
      checks = Seq(
        "id_not_null" -> col("id").isNotNull,
        "score_range" -> col("score").between(0L, 100L),
        "name_lower" -> col("name").rlike("^[a-z]+$")),
      uniques = Seq(Expectations.UniqueKey("id_unique", Seq("id"))))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4))).toSeq
    assert(got == Seq(
      // ordered by rule name; null predicate counts as a violation
      ("id_not_null", "row", 1L, 6L, false),
      ("id_unique", "unique", 1L, 6L, false),
      ("name_lower", "row", 2L, 6L, false),  // null name + "Delta"
      ("score_range", "row", 2L, 6L, false)  // 200 + null score
    ))
  }

  test("a clean frame passes every rule with zero violations") {
    val clean = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    val got = Expectations.audit(
      clean,
      checks = Seq("id_not_null" -> col("id").isNotNull),
      uniques = Seq(Expectations.UniqueKey("id_unique", Seq("id"))))
      .collect().map(r => (r.getString(0), r.getLong(2), r.getBoolean(4)))
    assert(got.toSeq == Seq(("id_not_null", 0L, true),
      ("id_unique", 0L, true)))
  }

  test("unique rule counts rows beyond the first occurrence (c-1 per key)") {
    val df = Seq(1L, 1L, 1L, 2L, 2L, 3L).toDF("k")
    val got = Expectations.audit(df,
      checks = Nil,
      uniques = Seq(Expectations.UniqueKey("k_unique", Seq("k"))))
      .collect().head
    assert(got.getLong(2) == 3L) // (3-1) + (2-1)
    assert(got.getLong(3) == 6L)
  }

  test("null-is-fine must be spelled into the predicate explicitly") {
    val df = Seq[Option[Long]](Some(5L), None).toDF("v")
    val strict = Expectations.audit(df,
      checks = Seq("v_range" -> col("v").between(0L, 10L)))
      .collect().head.getLong(2)
    val lenient = Expectations.audit(df,
      checks = Seq("v_range" ->
        (col("v").isNull || col("v").between(0L, 10L))))
      .collect().head.getLong(2)
    assert(strict == 1L && lenient == 0L)
  }

  test("duplicate rule names and empty suites fail loudly") {
    val df = Seq(1L).toDF("v")
    val e1 = intercept[IllegalArgumentException] {
      Expectations.audit(df, checks = Seq(
        "r" -> col("v").isNotNull, "r" -> col("v").between(0, 1)))
    }
    assert(e1.getMessage.contains("duplicate rule names"))
    val e2 = intercept[IllegalArgumentException] {
      Expectations.audit(df, checks = Nil, uniques = Nil)
    }
    assert(e2.getMessage.contains("at least one rule"))
  }

  test("row rules fold into ONE aggregation pass (single scan)") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    val plan = Expectations.audit(df, checks = Seq(
      "a" -> col("id").isNotNull,
      "b" -> col("name").rlike("^[a-z]$"),
      "c" -> col("id").between(0L, 10L)))
      .queryExecution.executedPlan.toString
    // one scan of the input feeding one aggregate — no unioned
    // per-rule scans for row-scoped rules
    val scans = plan.linesIterator.count(_.contains("LocalTableScan"))
    assert(scans <= 1, s"expected a single input scan:\n$plan")
  }
}
