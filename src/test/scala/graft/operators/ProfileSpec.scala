package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ProfileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("profile: exact counts, nulls, ranges on a hand table") {
    val df = Seq(
      (1L, Option("a"), Option(2.0)),
      (2L, Option("b"), None),
      (3L, Option("a"), Option(5.0)),
      (4L, None, Option(5.0))
    ).toDF("id", "s", "v")
    val got = Profile.profile(df, Seq("id", "s", "v"), exact = true)
      .as[(String, Long, Long, Long, String, String)]
      .collect().map(r => r._1 -> r).toMap
    assert(got("id") == ("id", 4L, 0L, 4L, "1", "4"))
    assert(got("s") == ("s", 4L, 1L, 2L, "a", "b"))
    assert(got("v") == ("v", 4L, 1L, 2L, "2.0", "5.0"))
  }

  test("profile: single scan (one aggregate, no per-column jobs)") {
    val df = spark.read.parquet(s"${TestSpark.sf0001}/lineitem.parquet")
    val plan = Profile.profile(df, Seq("l_orderkey", "l_quantity"))
      .queryExecution.executedPlan.toString
    // one scan node, one two-phase aggregate, a generate for stack
    assert("Scan parquet".r.findAllIn(plan).length == 1, plan.take(2000))
    assert(plan.contains("Generate"), plan.take(2000))
  }

  test("profile: approx default tracks exact within HLL tolerance") {
    val df = spark.read.parquet(s"${TestSpark.sf0001}/lineitem.parquet")
    val exact = Profile.profile(df, Seq("l_partkey"), exact = true)
      .select("n_distinct").as[Long].head()
    val approx = Profile.profile(df, Seq("l_partkey"))
      .select("n_distinct").as[Long].head()
    assert(math.abs(approx - exact).toDouble / exact < 0.1)
  }

  test("drift: planted null-rate anomaly alerts; quiet columns stay quiet") {
    import spark.implicits._
    val docs = spark.read.parquet(s"${graft.TestSpark.sf0001}/documents.parquet")
    val old = docs.filter(col("doc_id") < 25)
    val fresh = docs.filter(col("doc_id") >= 25)
      .withColumn("lang",
        when(col("doc_id") % 3 === 0, lit(null).cast("string"))
          .otherwise(col("lang")))
    val r = Profile.drift(old, fresh, Seq("lang", "source", "n_chars"))
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("lang").getBoolean(6), "lang null alert should fire")
    assert(!r("source").getBoolean(6), "source must stay quiet")
    assert(!r("n_chars").getBoolean(6))
    // no drift at all: same snapshot twice is entirely quiet
    val same = Profile.drift(old, old, Seq("lang", "source"))
      .collect()
    same.foreach { x =>
      assert(!x.getBoolean(6) && !x.getBoolean(10) && !x.getBoolean(11),
        s"false alert on ${x.getString(0)}")
    }
    intercept[IllegalArgumentException] {
      Profile.drift(old, fresh, Seq("lang"), distinctBand = (2.0, 0.5))
    }
  }

  test("snapshotDiff: statuses, null/ambiguity safety, loud duplicate keys, summary") {
    import spark.implicits._
    val old = Seq(
      (1L, Option("a"), Option("b")),   // unchanged
      (2L, Option("x"), Option("y")),   // changed
      (3L, Option("z"), Option("z")),   // removed
      (4L, Option.empty[String], None), // unchanged (both null)
      (5L, Option.empty[String], None), // null -> "null": MUST be changed
      (6L, Option("ab"), Option("c"))   // ("ab","c") vs ("a","bc"): changed
    ).toDF("id", "c1", "c2")
    val fresh = Seq(
      (1L, Option("a"), Option("b")),
      (2L, Option("x"), Option("Y")),
      (4L, Option.empty[String], None),
      (5L, Option("null"), None),
      (6L, Option("a"), Option("bc")),
      (7L, Option("new"), None)         // added
    ).toDF("id", "c1", "c2")
    val got = Profile.snapshotDiff(old, fresh, "id", Seq("c1", "c2"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(
      1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "unchanged", 5L -> "changed", 6L -> "changed",
      7L -> "added"))
    val summary = Profile.snapshotDiff(old, fresh, "id", Seq("c1", "c2"),
      summaryOnly = true).as[(String, Long)].collect().toMap
    assert(summary == Map(
      "unchanged" -> 2L, "changed" -> 3L, "removed" -> 1L, "added" -> 1L))
    // a duplicate key in either snapshot fails loudly, never explodes
    val dup = old.unionAll(old.limit(1))
    val e = intercept[IllegalArgumentException] {
      Profile.snapshotDiff(dup, fresh, "id", Seq("c1"))
    }
    assert(e.getMessage.contains("duplicate key"))
  }

  test("drift: all-null columns never emit NULL/NaN/Inf in an alerting report") {
    import spark.implicits._
    val old = Seq((1L, Option.empty[String]), (2L, None))
      .toDF("id", "c")
    val fresh = Seq((3L, Option("x")), (4L, Option("y")))
      .toDF("id", "c")
    // all-null -> data: density_old is 0, so the ratio is NULL (not
    // Inf) and the distinct alert is FORCED true; range_changed is a
    // real boolean (null-safe compare), not three-valued NULL
    val r1 = Profile.drift(old, fresh, Seq("c")).collect().head
    assert(r1.isNullAt(r1.fieldIndex("density_ratio")))
    assert(r1.getBoolean(r1.fieldIndex("distinct_alert")))
    assert(!r1.isNullAt(r1.fieldIndex("range_changed")) &&
      r1.getBoolean(r1.fieldIndex("range_changed")))
    // all-null on BOTH sides: nothing moved, nothing alerts, and no
    // NaN from the 0/0 density ratio
    val r2 = Profile.drift(old, old, Seq("c")).collect().head
    assert(r2.isNullAt(r2.fieldIndex("density_ratio")))
    assert(!r2.getBoolean(r2.fieldIndex("distinct_alert")))
    assert(!r2.getBoolean(r2.fieldIndex("range_changed")))
    // data -> all-null: ratio is a real 0.0 (under the band), alert on
    val r3 = Profile.drift(fresh, old, Seq("c")).collect().head
    assert(r3.getDouble(r3.fieldIndex("density_ratio")) == 0.0)
    assert(r3.getBoolean(r3.fieldIndex("distinct_alert")))
    assert(r3.getBoolean(r3.fieldIndex("range_changed")))
  }

  // ----- madOutliers -----

  test("madOutliers flags planted spikes, not the bulk; per-group medians") {
    import spark.implicits._
    // group a: tight around 10 with one spike; group b shifted, own spike
    val rows = (0 until 99).map(i => ("a", i.toLong, 10.0 + (i % 5) * 0.1)) ++
      Seq(("a", 500L, 1000.0)) ++
      (0 until 99).map(i => ("b", 1000L + i, 50.0 + (i % 7) * 0.2)) ++
      Seq(("b", 1500L, -400.0))
    val got = Profile.madOutliers(
      rows.toDF("g", "id", "v"), Seq("g"), "id", "v")
      .as[(String, Long, Double, Double, Double)].collect()
    assert(got.map(r => (r._1, r._2)).toSet == Set(("a", 500L), ("b", 1500L)))
    // the reported medians belong to each group's bulk, not the spike
    got.foreach {
      case ("a", _, _, med, mad) => assert(med >= 10.0 && med <= 10.4 && mad > 0)
      case ("b", _, _, med, mad) => assert(med >= 50.0 && med <= 51.2 && mad > 0)
      case other => fail(other.toString)
    }
  }

  test("madOutliers: degenerate MAD=0 flags every deviator; nulls dropped") {
    import spark.implicits._
    // >half identical -> mad 0 -> any deviation flags (the documented
    // convention); null values never reach the ranks
    val rows = Seq(("a", 1L, Some(5.0)), ("a", 2L, Some(5.0)),
      ("a", 3L, Some(5.0)), ("a", 4L, Some(5.1)), ("a", 5L, None))
    val got = Profile.madOutliers(
      rows.toDF("g", "id", "v"), Seq("g"), "id", "v")
      .as[(String, Long, Double, Double, Double)].collect()
    assert(got.map(_._2).toSeq == Seq(4L))
    assert(got.head._5 == 0.0)
    // no outliers in a clean group
    val clean = Seq(("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 3.0))
    assert(Profile.madOutliers(
      clean.toDF("g", "id", "v"), Seq("g"), "id", "v").count() == 0L)
  }
}
