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

  test("giniConcentration: known values, tie-order invariance, edge groups") {
    import spark.implicits._
    // perfectly flat group: G = 0 exactly by the rank formula
    // (2*sum(i*c))/(n*n*c) - (n+1)/n = (n+1)/n - (n+1)/n
    val flat = (1L to 10L).map(i => ("flat", i, 7L))
    // maximal concentration: all mass on one doc of n=4
    // ranks asc: 0,0,0,M -> G = 2*4M/(4M) - 5/4 = 2 - 1.25 = 0.75
    val conc = Seq(("conc", 1L, 0L), ("conc", 2L, 0L), ("conc", 3L, 0L),
      ("conc", 4L, 1000L))
    // all-zero group: gini is null, not 0/0
    val zero = Seq(("zero", 1L, 0L), ("zero", 2L, 0L))
    val df = (flat ++ conc ++ zero).toDF("g", "id", "v").repartition(5)
    val got = Profile.giniConcentration(df, "g", "id", "v")
      .as[(String, Long, Long, Option[Double])].collect()
      .sortBy(_._1).toSeq
    assert(got == Seq(
      ("conc", 4L, 1000L, Some(0.75)),
      ("flat", 10L, 70L, Some(0.0)),
      ("zero", 2L, 0L, None)))
    // tie-order invariance: permuting ids of equal values changes nothing
    val perm = (1L to 10L).map(i => ("flat", 11L - i, 7L))
      .toDF("g", "id", "v")
    assert(Profile.giniConcentration(perm, "g", "id", "v")
      .as[(String, Long, Long, Option[Double])].collect().head ==
      ("flat", 10L, 70L, Some(0.0)))
    // non-integral measure rejected
    val e = intercept[IllegalArgumentException] {
      Profile.giniConcentration(
        Seq(("a", 1L, 1.5)).toDF("g", "id", "v"), "g", "id", "v")
    }
    assert(e.getMessage.contains("integral"))
  }

  test("giniConcentration: overflow guard fires loudly") {
    import spark.implicits._
    // one group whose n*total passes 2^62: 3 docs of ~2^61 each
    // loud either way: the operator's guard fires (the guard job
    // prunes the _ws aggregate, so it runs first), or — if pruning
    // ever changes — ANSI's own ARITHMETIC_OVERFLOW surfaces
    val big = Seq(("g", 1L, Long.MaxValue / 4), ("g", 2L, Long.MaxValue / 4),
      ("g", 3L, Long.MaxValue / 4)).toDF("g", "id", "v")
    val e = intercept[Exception] {
      Profile.giniConcentration(big, "g", "id", "v")
    }
    assert(e.getMessage.toLowerCase.contains("overflow"))
  }

  test("mutualInfo: independent, dependent, and degenerate pairs") {
    import spark.implicits._
    // independent 2x2 uniform: MI = 0 exactly (every cell's
    // ln((c*n)/(ca*cb)) = ln(1) = 0)
    val indep = Seq(("x", "u"), ("x", "v"), ("y", "u"), ("y", "v"))
      .toDF("a", "b")
    val gi = Profile.mutualInfo(indep, "a", "b")
      .as[(Long, Double, Double, Double, Double, Option[Double])]
      .collect().head
    assert(gi._1 == 4L && gi._5 == 0.0 && gi._6 == Some(0.0))
    assert(math.abs(gi._2 - math.log(2)) < 1e-15)
    // perfect dependence: MI = H(a) = H(b) = H(ab), NMI = 1
    val dep = Seq(("x", "u"), ("x", "u"), ("y", "v"), ("y", "v"))
      .toDF("a", "b")
    val gd = Profile.mutualInfo(dep, "a", "b")
      .as[(Long, Double, Double, Double, Double, Option[Double])]
      .collect().head
    assert(math.abs(gd._5 - math.log(2)) < 1e-15)
    assert(math.abs(gd._6.get - 1.0) < 1e-12)
    // constant column: zero marginal entropy -> nmi null, mi 0
    val const = Seq(("x", "u"), ("x", "v")).toDF("a", "b")
    val gc = Profile.mutualInfo(const, "a", "b")
      .as[(Long, Double, Double, Double, Double, Option[Double])]
      .collect().head
    assert(gc._2 == 0.0 && gc._5 == 0.0 && gc._6.isEmpty)
    // determinism under adversarial repartition (the fold is sorted)
    val big = (0 until 3000).map(i => (s"a${i % 7}", s"b${(i * 13) % 11}"))
      .toDF("a", "b")
    val r1 = Profile.mutualInfo(big.repartition(1), "a", "b").collect().head
    val r2 = Profile.mutualInfo(big.repartition(23), "a", "b").collect().head
    assert(r1 == r2)
    // cell-cardinality guard fires loudly for id-like columns
    val ids = (0 until 100).map(i => (s"id$i", s"id$i")).toDF("a", "b")
    val e = intercept[IllegalArgumentException] {
      Profile.mutualInfo(ids, "a", "b", maxCells = 50)
    }
    assert(e.getMessage.contains("maxCells"))
  }

  test("weightedMedian: mass thresholds, zero weights, loud negatives") {
    import spark.implicits._
    // group a: values 1(w5), 2(w1), 3(w4) -> W=10, ceil(W/2)=5,
    // cum at v=1 is 5 >= 5 -> median 1 (half the mass sits at 1)
    // group b: 1(w1), 2(w1) -> W=2, thr 1 -> median 1
    // group c: zero-weight row carries no mass
    val df = Seq(("a", 1L, 1L, 5L), ("a", 2L, 2L, 1L), ("a", 3L, 3L, 4L),
      ("b", 4L, 1L, 1L), ("b", 5L, 2L, 1L),
      ("c", 6L, 7L, 0L), ("c", 7L, 9L, 2L))
      .toDF("g", "id", "v", "w")
    val got = Profile.weightedMedian(df, "g", "id", "v", "w")
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(("a", 10L, 1L), ("b", 2L, 1L), ("c", 2L, 9L)))
    // unweighted sanity: all weights 1 == classic lower median
    val un = (1L to 9L).map(i => ("u", i, i, 1L)).toDF("g", "id", "v", "w")
    assert(Profile.weightedMedian(un, "g", "id", "v", "w")
      .as[(String, Long, Long)].collect().head == ("u", 9L, 5L))
    val neg = Seq(("n", 1L, 1L, -2L)).toDF("g", "id", "v", "w")
    assert(intercept[IllegalArgumentException] {
      Profile.weightedMedian(neg, "g", "id", "v", "w")
    }.getMessage.contains("negative"))
  }

  test("integrityAudit: planted orphans and null keys are counted exactly") {
    import spark.implicits._
    import graft.operators.Profile.FkEdge
    // parent has ids 1..5; child references 1,1,2,6,6,7,null,null
    // -> 8 rows, 2 null keys, 3 orphan rows over 2 orphan keys
    val parent = (1L to 5L).toDF("pid")
    val child = Seq[java.lang.Long](1L, 1L, 2L, 6L, 6L, 7L, null, null)
      .toDF("cid").repartition(5)
    val clean = (1L to 3L).toDF("cid")
    val got = graft.operators.Profile.integrityAudit(Seq(
      FkEdge("dirty", child, "cid", parent, "pid"),
      FkEdge("clean", clean, "cid", parent, "pid")))
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      ("clean", 3L, 0L, 0L, 0L),
      ("dirty", 8L, 2L, 3L, 2L)))
    // guards
    intercept[IllegalArgumentException] {
      graft.operators.Profile.integrityAudit(Seq.empty)
    }
    intercept[IllegalArgumentException] {
      graft.operators.Profile.integrityAudit(Seq(
        FkEdge("a", child, "cid", parent, "pid"),
        FkEdge("a", clean, "cid", parent, "pid")))
    }
  }

  test("joinSizeAudit predicts the materialized join exactly; nulls drop") {
    import spark.implicits._
    val left = (Seq.fill(7)("a") ++ Seq.fill(3)("b") ++ Seq("c") ++
      Seq(null.asInstanceOf[String])).zipWithIndex
      .map { case (k, i) => (Option(k), i.toLong) }.toDF("k", "x")
    val right = (Seq.fill(5)("a") ++ Seq.fill(2)("b") ++ Seq("d") ++
      Seq(null.asInstanceOf[String])).zipWithIndex
      .map { case (k, i) => (Option(k), i.toLong) }.toDF("k", "y")
    val audit = graft.operators.Profile.joinSizeAudit(
      left, "k", right, "k", topN = 5)
      .as[(String, Long, Long, Long, Long, Long)].collect().sortBy(_._6)
    // a: 7*5=35, b: 3*2=6; c/d/null never match
    assert(audit.toSeq == Seq(
      ("a", 7L, 5L, 35L, 41L, 1L), ("b", 3L, 2L, 6L, 41L, 2L)))
    // the prediction equals the real join's size
    val actual = left.filter($"k".isNotNull)
      .join(right.filter($"k".isNotNull), Seq("k")).count()
    assert(actual == 41L && audit.head._5 == actual)
    // disjoint keys: empty report (predicted total would be 0)
    assert(graft.operators.Profile.joinSizeAudit(
      Seq(("x", 1)).toDF("k", "v"), "k",
      Seq(("y", 1)).toDF("k", "v"), "k").count() == 0L)
  }

  test("histogram: bin edges, sentinels, occupied-only; guards") {
    import spark.implicits._
    // [0, 100) x 10 bins: width 10; edge values land in the
    // half-open bin ([10,20) -> bin 1); -5 below, 100 at hi
    val df = Seq(("g", -5L), ("g", 0L), ("g", 9L), ("g", 10L),
      ("g", 19L), ("g", 99L), ("g", 100L), ("g", 250L))
      .toDF("grp", "v").repartition(3)
    val got = graft.operators.Profile.histogram(df, "grp", "v", 0L, 100L, 10)
      .as[(String, Long, Long)].collect().sortBy(_._2).toSeq
    assert(got == Seq(
      ("g", -1L, 1L),  // below lo
      ("g", 0L, 2L),   // 0, 9
      ("g", 1L, 2L),   // 10, 19
      ("g", 9L, 1L),   // 99
      ("g", 10L, 2L))) // 100, 250 at/above hi
    // occupied-only: no zero bins 2..8 emitted
    assert(!got.exists(r => r._2 >= 2 && r._2 <= 8))
    intercept[IllegalArgumentException] {
      graft.operators.Profile.histogram(df, "grp", "v", 100L, 0L, 10)
    }
    intercept[IllegalArgumentException] {
      graft.operators.Profile.histogram(df, "grp", "v", 0L, Long.MaxValue, 10)
    }
    intercept[IllegalArgumentException] {
      graft.operators.Profile.histogram(
        Seq(("g", 1.5)).toDF("grp", "v"), "grp", "v", 0L, 10L, 5)
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

  test("provenanceLedger: tamper propagates forward, XOR is order-free") {
    import spark.implicits._
    val docs = (0L until 30L).map(i => (i, s"text $i", i / 10))
      .toDF("id", "text", "p")
    val base = Profile.provenanceLedger(docs, "id", "text", "p")
      .orderBy("period")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(base.map(_._1) == Seq(0L, 1L, 2L) &&
      base.forall(_._2 == 10L))
    // physical layout cannot change any hash
    val again = Profile.provenanceLedger(docs.repartition(7), "id",
      "text", "p").orderBy("period")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(again == base)
    // editing one row in period 0 changes EVERY chain hash forward
    val tampered = docs.withColumn("text",
      when(col("id") === 3L, lit("EDITED")).otherwise(col("text")))
    val t = Profile.provenanceLedger(tampered, "id", "text", "p")
      .orderBy("period").as[(Long, Long, Long, String)].collect().toSeq
    assert(t.head._3 != base.head._3)
    assert(t.map(_._4).zip(base.map(_._4)).forall {
      case (a, b) => a != b })
    // editing the LAST period leaves earlier links intact
    val late = docs.withColumn("text",
      when(col("id") === 25L, lit("EDITED")).otherwise(col("text")))
    val l = Profile.provenanceLedger(late, "id", "text", "p")
      .orderBy("period").as[(Long, Long, Long, String)].collect().toSeq
    assert(l.take(2) == base.take(2) && l.last._4 != base.last._4)
    // a dropped row changes both the count and the chain
    val dropped = Profile.provenanceLedger(
      docs.filter(col("id") =!= 7L), "id", "text", "p")
      .orderBy("period").as[(Long, Long, Long, String)].collect().toSeq
    assert(dropped.head._2 == 9L && dropped.head._4 != base.head._4)
  }

  test("fanoFactor: regular, Poisson-ish, and bursty keys hand-checked") {
    import spark.implicits._
    def mk(u: Long, perDay: Seq[Int]) = perDay.zipWithIndex.flatMap {
      case (n, d) => (0 until n).map(i =>
        (u, new java.sql.Timestamp((d * 86400L + i) * 1000L)))
    }
    // u1 machine-regular 5/day x4: var 0 -> fano 0
    // u2 bursty [1,1,1,17]: n=4 s=20 ssq=292 -> (4*292-400)/(3*20)=12.8
    // u3 single active day -> null
    val df = (mk(1L, Seq(5, 5, 5, 5)) ++ mk(2L, Seq(1, 1, 1, 17)) ++
      mk(3L, Seq(9)))
      .toDF("user_id", "ts")
    val got = Profile.fanoFactor(df.repartition(7), Seq("user_id"), "ts")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got(1L) == ((4L, 20L, Some(0.0))))
    assert(got(2L) == ((4L, 20L, Some(12.8))))
    assert(got(3L) == ((1L, 9L, None)))
    intercept[IllegalArgumentException] {
      Profile.fanoFactor(df, Seq("day"), "ts")
    }
  }

  test("tailIndex: hand-checked Hill alpha, degenerate and cutoff cases") {
    import spark.implicits._
    // xs desc = [8,4,2,1]: ref 1, m 3, lnsum = ln8+ln4+ln2 = 6 ln2
    val df = Seq(("g", 8L), ("g", 4L), ("g", 2L), ("g", 1L),
      ("flat", 7L), ("flat", 7L), ("flat", 7L),
      ("solo", 5L),
      ("zeros", 9L), ("zeros", 0L), ("zeros", -3L))
      .toDF("g", "v")
    val got = Profile.tailIndex(df, "g", "v", k = 50)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got("g")._1 == 3L && got("g")._2 == 1L)
    assert(got("g")._3.get == 3.0 /
      (math.log(8.0) + math.log(4.0) + math.log(2.0)))
    // all-equal tail: zero ln-sum -> alpha null (no tail information)
    assert(got("flat") == ((2L, 7L, None)))
    // single positive value: no tail, row dropped entirely
    assert(!got.contains("solo"))
    // zero/negative values never enter (ln undefined): "zeros" keeps
    // only 9 -> single value -> dropped
    assert(!got.contains("zeros"))
    // k bounds the tail: with k=2 only the top 3 values enter
    val big = (1L to 100L).map(v => ("p", v)).toDF("g", "v")
    val k2 = Profile.tailIndex(big, "g", "v", k = 2).collect().head
    assert(k2.getLong(1) == 2L && k2.getLong(2) == 98L)
    assert(k2.getDouble(3) == 2.0 /
      (math.log(100.0 / 98.0) + math.log(99.0 / 98.0)))
    intercept[IllegalArgumentException] {
      Profile.tailIndex(df, "g", "v", k = 1)
    }
  }

  test("mixtureDiagnostics: ESS and shares, hand-checked") {
    import spark.implicits._
    // g1: masses 30,10 -> total 40, ssq 1000, ESS = 1600/1000 = 1.6
    // g2: 5,5,5,5 even -> ESS = 400/100 = 4 = n, ratio 1.0
    val df = Seq(
      ("g1", "a", 30L), ("g1", "b", 10L),
      ("g2", "a", 5L), ("g2", "b", 5L), ("g2", "c", 5L), ("g2", "d", 5L))
      .toDF("g", "item", "w")
    val m = Profile.mixtureDiagnostics(df, "g", "item", "w")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(m("g1").getAs[Long]("n_items") == 2L)
    assert(m("g1").getAs[Long]("total_mass") == 40L)
    assert(m("g1").getAs[Double]("max_share") == 0.75)
    assert(m("g1").getAs[Double]("ess") == 1.6)
    assert(m("g1").getAs[Double]("ess_ratio") == 0.8)
    assert(m("g2").getAs[Double]("ess") == 4.0)
    assert(m("g2").getAs[Double]("ess_ratio") == 1.0)
    assert(m("g2").getAs[Double]("max_share") == 0.25)
    // item weights aggregate before the moments (split rows == one row)
    val split = Seq(("g1", "a", 20L), ("g1", "a", 10L), ("g1", "b", 10L))
      .toDF("g", "item", "w")
    val s2 = Profile.mixtureDiagnostics(split, "g", "item", "w")
      .collect().head
    assert(s2.getAs[Double]("ess") == 1.6)
    val e = intercept[IllegalArgumentException] {
      Profile.mixtureDiagnostics(
        Seq(("g", "a", 1.5)).toDF("g", "item", "w"), "g", "item", "w")
    }
    assert(e.getMessage.contains("integral"))
    val big = Seq(("g", "a", 3L << 31), ("g", "b", 3L << 31))
      .toDF("g", "item", "w")
    val e2 = intercept[Exception] {
      Profile.mixtureDiagnostics(big, "g", "item", "w")
    }
    assert(e2.getMessage.toLowerCase.contains("overflow"))
  }

  test("chiSquaredCells: textbook 2x2 table, zero cells carry mass") {
    import spark.implicits._
    // obs: (a,x)=30 (a,y)=10 (b,x)=10 (b,y)=30; classic chi2 = 20
    val rows = Seq.fill(30)(("a", "x")) ++ Seq.fill(10)(("a", "y")) ++
      Seq.fill(10)(("b", "x")) ++ Seq.fill(30)(("b", "y"))
    val got = Profile.chiSquaredCells(rows.toDF("cond", "cat"),
      "cond", "cat").orderBy("cond", "cat")
      .as[(String, String, Long, Long, Long, Double, Double)]
      .collect().toSeq
    assert(got.map(_._3) == Seq(30L, 10L, 10L, 30L))
    // every expected = 40*40/80 = 20; every term = 100/20 = 5
    assert(got.forall(r => r._6 == 20.0 && r._7 == 5.0))
    assert(got.map(_._7).sum == 20.0)
    // a category absent from one cond still emits a grid cell: its
    // zero observed carries chi2 mass = expected
    val sparse = (Seq.fill(6)(("a", "x")) ++ Seq.fill(6)(("b", "x")) ++
      Seq.fill(4)(("b", "z"))).toDF("cond", "cat")
    val g2 = Profile.chiSquaredCells(sparse, "cond", "cat")
      .orderBy("cond", "cat")
      .as[(String, String, Long, Long, Long, Double, Double)]
      .collect().toSeq
    val az = g2.find(r => r._1 == "a" && r._2 == "z").get
    assert(az._3 == 0L)          // unobserved
    assert(az._6 == 6.0 * 4 / 16) // rt(a)=6, ct(z)=4, N=16
    assert(az._7 == az._6)       // (0-e)^2/e == e
    // nulls excluded from the test entirely
    val withNull = (rows :+ ((null.asInstanceOf[String], "x")))
      .toDF("cond", "cat")
    assert(Profile.chiSquaredCells(withNull, "cond", "cat")
      .agg(org.apache.spark.sql.functions.sum("obs")).head.getLong(0)
      == 80L)
    // runaway cardinality fails loudly before the grid exists
    val wide = (0 until 200).map(i => (s"c$i", s"k$i")).toDF("cond", "cat")
    val e = intercept[IllegalArgumentException] {
      Profile.chiSquaredCells(wide, "cond", "cat", maxCells = 100L)
    }
    assert(e.getMessage.contains("maxCells"))
  }

  // ---- rankSumTest ----

  /** Sequential midrank reference: doubled rank sum of group A over
    * the pooled sample, ties as midranks. */
  private def refU2(a: Seq[Double], b: Seq[Double]): Long = {
    val pooled = (a.map((_, 'a')) ++ b.map((_, 'b'))).sortBy(_._1)
    // doubled midrank per value group
    val byValue = pooled.zipWithIndex.groupBy(_._1._1)
    var r2a = 0L
    byValue.foreach { case (_, grp) =>
      val ranks2 = grp.map(_._2 + 1).sum * 2L / grp.size // 2*midrank
      r2a += grp.count(_._1._2 == 'a') * ranks2
    }
    r2a - a.size.toLong * (a.size + 1L)
  }

  private def runRankSum(rows: Seq[(String, Double)]) =
    Profile.rankSumTest(rows.toDF("g", "v"), "g", "v", "A", "B")
      .head()

  test("rankSumTest: hand example with ties matches the midrank reference") {
    val a = Seq(1.0, 2.0, 2.0, 5.0)
    val b = Seq(2.0, 3.0, 4.0)
    val rows = a.map(("A", _)) ++ b.map(("B", _))
    val r = runRankSum(rows)
    assert(r.getLong(0) == 4L && r.getLong(1) == 3L)
    assert(r.getLong(2) == refU2(a, b))
    // tie group of size 3 at value 2.0: 3^3-3 = 24
    assert(r.getLong(3) == 24L)
    assert(r.getDouble(4) ==
      refU2(a, b).toDouble / (4L * 3L).toDouble - 1.0)
  }

  test("rankSumTest: identical distributions give effect 0") {
    val rows = (1 to 50).flatMap(i =>
      Seq(("A", i.toDouble), ("B", i.toDouble)))
    val r = runRankSum(rows)
    assert(r.getDouble(4) == 0.0)
  }

  test("rankSumTest: stochastic dominance pushes effect toward +1") {
    val rows = (1 to 40).map(i => ("A", 100.0 + i)) ++
      (1 to 40).map(i => ("B", i.toDouble))
    val r = runRankSum(rows)
    assert(r.getDouble(4) == 1.0) // complete separation
  }

  test("rankSumTest matches reference on pseudo-random data + repartition") {
    val a = (0 until 80).map(i => ((i * 13 + 7) % 23).toDouble)
    val b = (0 until 60).map(i => ((i * 17 + 3) % 23).toDouble)
    val rows = a.map(("A", _)) ++ b.map(("B", _))
    val expect = refU2(a, b)
    assert(runRankSum(rows).getLong(2) == expect)
    val r2 = Profile.rankSumTest(
      rows.toDF("g", "v").repartition(17), "g", "v", "A", "B").head()
    assert(r2.getLong(2) == expect)
    // other groups in the frame are ignored
    val noisy = rows ++ Seq(("C", 9999.0), ("D", -1.0))
    assert(Profile.rankSumTest(
      noisy.toDF("g", "v"), "g", "v", "A", "B").head()
      .getLong(2) == expect)
  }

  test("rankSumTest: loud contracts") {
    intercept[IllegalArgumentException] {
      Profile.rankSumTest(
        Seq(("A", 1.0)).toDF("g", "v"), "g", "v", "A", "A")
    }
    val withNull = Seq(("A", Some(1.0)), ("B", None))
      .toDF("g", "v")
    val e = intercept[IllegalArgumentException] {
      Profile.rankSumTest(withNull, "g", "v", "A", "B")
    }
    assert(e.getMessage.contains("null"))
  }

  test("psi: identical distributions 0, planted shift flags, clamps") {
    import spark.implicits._
    val ref = (0 until 400).map(i => ("k", (i % 100).toDouble)).toSeq
      .toDF("g", "v")
    // same distribution -> psi == 0 exactly (all terms 0)
    val same = Profile.psi(ref, ref, Seq("g"), "v", bins = 10)
      .head()
    assert(same.getLong(1) == 400L && same.getLong(2) == 400L)
    assert(same.getDouble(3) == 0.0)
    // shifted distribution -> psi grows with the shift
    def shifted(by: Double) = (0 until 400)
      .map(i => ("k", (i % 100).toDouble + by)).toSeq.toDF("g", "v")
    val small = Profile.psi(ref, shifted(10), Seq("g"), "v")
      .head().getDouble(3)
    val big = Profile.psi(ref, shifted(60), Seq("g"), "v")
      .head().getDouble(3)
    assert(small > 0.0 && big > small)
    // out-of-range current values clamp into edge bins, not vanish
    val far = Profile.psi(ref, shifted(1000), Seq("g"), "v")
      .head()
    assert(far.getLong(2) == 400L) // every current row counted
    assert(far.getDouble(3) > big)
    // keys missing from either side drop; degenerate hi==lo is fine
    val refB = ref.unionAll(Seq(("only_ref", 1.0)).toDF("g", "v"))
    val out = Profile.psi(refB, ref, Seq("g"), "v").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("k"))
    val const = Seq(("c", 5.0), ("c", 5.0)).toDF("g", "v")
    assert(Profile.psi(const, const, Seq("g"), "v")
      .head().getDouble(3) == 0.0)
    intercept[IllegalArgumentException] {
      Profile.psi(ref, ref, Seq.empty, "v")
    }
    intercept[IllegalArgumentException] {
      Profile.psi(ref, ref, Seq("g"), "v", bins = 1)
    }
  }

  test("benford: integer digit extraction, grid zeros, expectations") {
    import spark.implicits._
    // digits by construction: 1.23 -> 123 -> '1'; 0.05 -> 5 -> '5';
    // 950.00 -> 95000 -> '9'
    val rows = Seq(("k", 1.23), ("k", 0.05), ("k", 950.0),
      ("k", 19.99), ("k", -4.0), ("k", 0.0)) // non-positive excluded
    val out = Profile.benford(rows.toDF("g", "v"), Seq("g"), "v")
      .collect().map(r => r.getLong(1) ->
        (r.getLong(2), r.getLong(3), r.getDouble(5))).toMap
    assert(out.size == 9) // full digit grid, zeros materialized
    assert(out(1L)._1 == 2L) // 1.23 and 19.99
    assert(out(5L)._1 == 1L && out(9L)._1 == 1L)
    assert(out(2L)._1 == 0L)
    assert(out.values.forall(_._2 == 4L)) // n_total excludes <= 0
    // Benford expectation: digit 1 ~ .30103, digit 9 ~ .045757
    assert(math.abs(out(1L)._3 - 0.30103) < 1e-5)
    assert(math.abs(out(9L)._3 - 0.045757) < 1e-5)
    // shares sum to 1 per key (rounded cells)
    val shares = Profile.benford(rows.toDF("g", "v"), Seq("g"), "v")
      .collect().map(_.getDouble(4)).sum
    assert(math.abs(shares - 1.0) < 1e-5)
    intercept[IllegalArgumentException] {
      Profile.benford(rows.toDF("g", "v"), Seq.empty, "v")
    }
  }

  test("welchTTest: textbook case, degenerate guards") {
    import spark.implicits._
    // A = {1,2,3,4,5} (mean 3, var 2.5), B = {2,4,6} (mean 4, var 4)
    val df = (Seq(1, 2, 3, 4, 5).map(v => ("A", v.toDouble)) ++
      Seq(2, 4, 6).map(v => ("B", v.toDouble))).toSeq.toDF("g", "v")
    val r = Profile.welchTTest(df, "g", "v", "A", "B").head()
    assert(r.getLong(0) == 5L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == 3.0 && r.getDouble(3) == 4.0)
    val va = 2.5 / 5; val vb = 4.0 / 3
    val tRef = (3.0 - 4.0) / math.sqrt(va + vb)
    val dfRef = math.pow(va + vb, 2) /
      (va * va / 4 + vb * vb / 2)
    assert(math.abs(r.getDouble(4) - tRef) < 1e-12)
    assert(math.abs(r.getDouble(5) - dfRef) < 1e-12)
    // single-row group -> null t/df, means still emitted
    val tiny = Seq(("A", 1.0), ("A", 3.0), ("B", 2.0)).toDF("g", "v")
    val r2 = Profile.welchTTest(tiny, "g", "v", "A", "B").head()
    assert(r2.getDouble(3) == 2.0 && r2.isNullAt(4) && r2.isNullAt(5))
    // zero variance both sides -> null (division by zero guarded)
    val flat = Seq(("A", 2.0), ("A", 2.0), ("B", 2.0), ("B", 2.0))
      .toDF("g", "v")
    assert(Profile.welchTTest(flat, "g", "v", "A", "B")
      .head().isNullAt(4))
  }

  test("ksTest: hand D, naive reference, identical -> 0, empty -> null") {
    import spark.implicits._
    def run(a: Seq[Double], b: Seq[Double]) =
      Profile.ksTest(
        (a.map(("A", _)) ++ b.map(("B", _))).toSeq.toDF("g", "v"),
        "g", "v", "A", "B").head()
    // A={1,2,3}, B={3,4,5}: D = 2/3 (numerator 6 over 3*3)
    val r = run(Seq(1, 2, 3).map(_.toDouble), Seq(3, 4, 5).map(_.toDouble))
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == 6.0)
    assert(r.getDouble(3) == 6.0 / 9.0)
    // identical samples -> D exactly 0, not significant
    val same = Seq(1.5, 2.25, 9.0)
    val r0 = run(same, same)
    assert(r0.getDouble(2) == 0.0 && r0.getDouble(3) == 0.0)
    assert(!r0.getBoolean(4))
    // naive reference on random data (exact integer arithmetic)
    val rnd = new scala.util.Random(23)
    val ra = Seq.fill(80)(rnd.nextInt(500) / 100.0)
    val rb = Seq.fill(120)(rnd.nextInt(500) / 100.0 + 0.5)
    val rr = run(ra, rb)
    val pooled = (ra ++ rb).distinct.sorted
    val dRef = pooled.map { v =>
      val ca = ra.count(_ <= v).toLong
      val cb = rb.count(_ <= v).toLong
      math.abs(ca * rb.length - cb * ra.length)
    }.max
    assert(rr.getDouble(2) == dRef.toDouble)
    assert(rr.getDouble(3) == dRef.toDouble / (80.0 * 120.0))
    // clearly shifted distributions flag significant
    val shifted = run(Seq.fill(100)(1.0), Seq.fill(100)(2.0))
    assert(shifted.getBoolean(4))
    // one empty group -> null d/significant, counts still emitted
    val e = run(Seq(1.0, 2.0), Seq.empty)
    assert(e.getLong(0) == 2L && e.getLong(1) == 0L)
    assert(e.isNullAt(3) && e.isNullAt(4))
  }

  test("latenessAudit: running high-water mark, hand-checked") {
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    // key a arrives out of order twice (5 behind 10, 15 behind 20);
    // key b is perfectly ordered
    val rows = Seq(
      ("a", 1L, ts(10)), ("a", 2L, ts(5)), ("a", 3L, ts(20)),
      ("a", 4L, ts(15)), ("a", 5L, ts(25)),
      ("b", 1L, ts(1)), ("b", 2L, ts(2)), ("b", 3L, ts(3)))
      .toDF("k", "seq", "t")
    val out = Profile.latenessAudit(rows, Seq("k"), "t", "seq")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4),
          r.getDouble(5))).toMap
    assert(out("a")._1 == 5L && out("a")._2 == 2L)
    assert(out("a")._3 == 0.4)
    assert(out("a")._4 == 5000000L) // both late events 5 s behind
    // p95 over [0, 5e6, 0, 5e6, 0]: rank 3.8 interpolates to 5e6
    assert(out("a")._5 == 5.0e6)
    assert(out("b") == ((3L, 0L, 0.0, 0L, 0.0)))
    // arrival order is the SEQUENCE column, not row order: permuting
    // physical rows changes nothing
    val shuffled = Profile.latenessAudit(
      rows.orderBy(org.apache.spark.sql.functions.rand(7)),
      Seq("k"), "t", "seq")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(shuffled == Map("a" -> 2L, "b" -> 0L))
    intercept[IllegalArgumentException] {
      Profile.latenessAudit(rows, Seq.empty, "t", "seq")
    }
  }

  test("spearmanCorr: monotone ±1, ties vs hand value, degenerate " +
      "null, partitioning invariance") {
    import spark.implicits._
    // strictly increasing nonlinear map: rho exactly 1
    val inc = (1 to 50).map(i => (i.toDouble, i.toDouble * i))
      .toDF("x", "y")
    assert(Profile.spearmanCorr(inc, "x", "y").head().getDouble(1)
      == 1.0)
    // strictly decreasing: exactly -1
    val dec = (1 to 50).map(i => (i.toDouble, 1.0 / i)).toDF("x", "y")
    assert(Profile.spearmanCorr(dec, "x", "y", scale = 6).head()
      .getDouble(1) == -1.0)
    // ties: x = (1,1,2), y = (1,2,3) — average ranks (1.5,1.5,3)
    // vs (1,2,3): hand Pearson = Σdxdy/sqrt(Σdx²·Σdy²)
    // = 1.5/sqrt(1.5·2) = 1.5/sqrt(3)
    val tied = Seq((1.0, 1.0), (1.0, 2.0), (2.0, 3.0)).toDF("x", "y")
    val rho = Profile.spearmanCorr(tied, "x", "y").head().getDouble(1)
    assert(math.abs(rho -
      math.floor(1.5 / math.sqrt(3.0) * 1e6 + 0.5) / 1e6) < 1e-9)
    // zero rank variance on one side -> null
    val flat = Seq((1.0, 1.0), (1.0, 2.0), (1.0, 3.0)).toDF("x", "y")
    assert(Profile.spearmanCorr(flat, "x", "y").head().isNullAt(1))
    // repartition changes nothing (exact integer moments)
    val a = Profile.spearmanCorr(inc.repartition(7), "x", "y").head()
    assert(a.getLong(0) == 50L && a.getDouble(1) == 1.0)
    intercept[IllegalArgumentException] {
      Profile.spearmanCorr(inc, "x", "y", scale = 9)
    }
  }

  test("corrMatrix: exact ±1, hand value, listwise deletion, " +
      "zero-variance null, loud contracts") {
    import spark.implicits._
    val df = (1 to 30).map(i =>
      (i.toDouble, 2.0 * i + 1.0, -i.toDouble)).toDF("x", "y", "z")
    val m = Profile.corrMatrix(df, Seq("x", "y", "z"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(m.size == 3)
    assert(m(("x", "y")) == ((30L, 1.0)))   // affine: exactly 1
    assert(m(("x", "z")) == ((30L, -1.0)))  // negated: exactly -1
    assert(m(("y", "z")) == ((30L, -1.0)))
    // hand value: (1,2,3) vs (1,3,2) -> r = 0.5
    val hand = Seq((1.0, 1.0), (2.0, 3.0), (3.0, 2.0)).toDF("a", "b")
    val r = Profile.corrMatrix(hand, Seq("a", "b")).head().getDouble(3)
    assert(math.abs(r - 0.5) < 1e-12)
    // listwise: one null row drops from EVERY pair (common n)
    val withNull = df.union(
      spark.sql("SELECT 99.0 AS x, CAST(NULL AS DOUBLE) AS y, 1.0 AS z"))
    val m2 = Profile.corrMatrix(withNull, Seq("x", "y", "z"))
      .collect().map(r2 => r2.getLong(2)).distinct.toSeq
    assert(m2 == Seq(30L)) // the null row is out of ALL pairs
    // zero variance -> null
    val flat = Seq((1.0, 1.0), (1.0, 2.0)).toDF("a", "b")
    assert(Profile.corrMatrix(flat, Seq("a", "b")).head().isNullAt(3))
    intercept[IllegalArgumentException] {
      Profile.corrMatrix(df, Seq("x"))
    }
    intercept[IllegalArgumentException] {
      Profile.corrMatrix(df, Seq("x", "x"))
    }
  }

  test("cramersV: perfect association 1, independence 0, " +
      "single-level null, loud level bound") {
    import spark.implicits._
    // a == b up to renaming: V exactly 1 (chi2 = n*(min-1) = 5)
    val perfect = (Seq.fill(2)(("x", "x")) ++ Seq.fill(3)(("y", "y")))
      .toDF("a", "b")
    val p = Profile.cramersV(perfect, "a", "b").head()
    assert(p.getLong(0) == 5L && p.getDouble(3) == 5.0)
    assert(p.getDouble(4) == 1.0)
    // uniform grid: chi2 0, V 0
    val indep = Seq(("x", "p"), ("x", "q"), ("y", "p"), ("y", "q"))
      .toDF("a", "b")
    val i = Profile.cramersV(indep, "a", "b").head()
    assert(i.getDouble(3) == 0.0 && i.getDouble(4) == 0.0)
    // one level on a side: V undefined -> null; nulls drop from n
    val one = Seq(("x", "p"), ("x", "q"),
      (null.asInstanceOf[String], "r")).toDF("a", "b")
    val o = Profile.cramersV(one, "a", "b").head()
    assert(o.getLong(0) == 2L && o.isNullAt(4))
    intercept[IllegalArgumentException] {
      Profile.cramersV(indep, "a", "b", maxLevels = 1)
    }
    val e = intercept[IllegalArgumentException] {
      Profile.cramersV(
        (1 to 40).map(i2 => (s"a$i2", "x")).toDF("a", "b"),
        "a", "b", maxLevels = 10)
    }
    assert(e.getMessage.contains("maxLevels"))
  }

  test("jsDivergence: identical 0, hand two-bin value, zero-safe " +
      "empty bins, bounded by ln 2") {
    import spark.implicits._
    val ref = Seq(0.0, 0.0, 1.0, 1.0).map(("k", _)).toDF("g", "v")
    // identical snapshots: exactly 0
    assert(Profile.jsDivergence(ref, ref, Seq("g"), "v", bins = 2)
      .head().getDouble(3) == 0.0)
    // hand case: p=(.5,.5) vs q=(1,0) at 2 bins
    // JSD = .5[.5 ln(.5/.75)+.5 ln(.5/.25)] + .5[1 ln(1/.75)]
    val cur = Seq(("k", 0.0)).toDF("g", "v")
    val expected = 0.5 * (0.5 * math.log(0.5 / 0.75)
      + 0.5 * math.log(0.5 / 0.25)) + 0.5 * math.log(1.0 / 0.75)
    val got = Profile.jsDivergence(ref, cur, Seq("g"), "v", bins = 2)
      .head()
    assert(got.getLong(1) == 4L && got.getLong(2) == 1L)
    assert(math.abs(got.getDouble(3)
      - math.floor(expected * 1e6 + 0.5) / 1e6) < 1e-9)
    // bounded: even adversarial shift clamping all mass into one
    // edge bin stays <= ln 2
    val far = Seq.fill(50)(("k", 999.0)).toDF("g", "v")
    val j = Profile.jsDivergence(ref, far, Seq("g"), "v").head()
      .getDouble(3)
    assert(j > 0.0 && j <= math.log(2.0) + 1e-9)
    intercept[IllegalArgumentException] {
      Profile.jsDivergence(ref, cur, Seq("g"), "v", bins = 1)
    }
  }

  test("proportionTest: hand Wilson bounds and pooled z, empty-side " +
      "nulls, stray groups ignored, loud contracts") {
    import spark.implicits._
    val rows = ((1 to 7).map(_ => ("h", "a", true)) ++
      (1 to 3).map(_ => ("h", "a", false)) ++
      (1 to 3).map(_ => ("h", "b", true)) ++
      (1 to 7).map(_ => ("h", "b", false)) ++
      Seq(("h", "zzz", true))) // stray group: ignored entirely
      .toDF("k", "grp", "s")
    val r = Profile.proportionTest(rows, Seq("k"), "grp", "a", "b",
      col("s")).head()
    def r6(d: Double) = math.floor(d * 1e6 + 0.5) / 1e6
    val z = 1.959963984540054
    def wilson(n: Double, p: Double, sign: Double) =
      (p + z * z / (2 * n) + sign * z *
        math.sqrt((p * (1 - p) + z * z / (4 * n)) / n)) /
        (1 + z * z / n)
    assert(r.getLong(1) == 10L && r.getLong(2) == 7L)
    assert(r.getDouble(3) == 0.7)
    assert(math.abs(r.getDouble(4) - r6(wilson(10, 0.7, -1))) < 1e-9)
    assert(math.abs(r.getDouble(5) - r6(wilson(10, 0.7, 1))) < 1e-9)
    assert(r.getLong(6) == 10L && r.getLong(7) == 3L)
    // pooled z: (0.7-0.3)/sqrt(0.5*0.5*(0.1+0.1))
    val zExp = 0.4 / math.sqrt(0.5 * 0.5 * 0.2)
    assert(math.abs(r.getDouble(11) - r6(zExp)) < 1e-9)
    // the Wilson interval stays inside [0,1] even at p = 1, and the
    // degenerate pooled proportion (everything true) nulls the z
    val ext = (Seq.fill(3)(("h", "a", true)) ++
      Seq.fill(3)(("h", "b", true))).toDF("k", "grp", "s")
    val e = Profile.proportionTest(ext, Seq("k"), "grp", "a", "b",
      col("s")).head()
    assert(e.getDouble(4) >= 0.0 && e.getDouble(5) <= 1.0)
    assert(e.getDouble(3) == 1.0)
    assert(e.isNullAt(11)) // pooled p = 1: no variance, null not NaN
    intercept[IllegalArgumentException] {
      Profile.proportionTest(rows, Seq("k"), "grp", "a", "a", col("s"))
    }
    intercept[IllegalArgumentException] {
      Profile.proportionTest(rows, Seq("k"), "grp", "a", "b",
        col("s"), ciPct = 80)
    }
  }

  test("cohensKappa: textbook value, perfect 1, chance-level 0, " +
      "degenerate null, nulls drop") {
    import spark.implicits._
    // classic 2x2 example: diag 45, n 70, marginals a:(50,20)
    // b:(45,25) -> po = 45/70... use the standard (20,5 / 10,15):
    // po = 0.7, pe = (25*30 + 25*40... hand-build:
    // a rows: 20 (x,x), 5 (x,y), 10 (y,x), 15 (y,y): n=50
    // po = 35/50 = 0.7; ta = x:25, y:25; tb = x:30, y:20
    // pe = (25*30 + 25*20)/2500 = 0.5; kappa = 0.2/0.5 = 0.4
    val rows = (Seq.fill(20)(("x", "x")) ++ Seq.fill(5)(("x", "y")) ++
      Seq.fill(10)(("y", "x")) ++ Seq.fill(15)(("y", "y")))
      .toDF("a", "b")
    val r = Profile.cohensKappa(rows, "a", "b").head()
    assert(r.getLong(0) == 50L)
    assert(r.getDouble(1) == 0.7 && r.getDouble(2) == 0.5)
    assert(r.getDouble(3) == 0.4)
    // perfect agreement -> 1 (as long as pe < 1)
    val perfect = Seq(("x", "x"), ("y", "y"), ("x", "x"))
      .toDF("a", "b")
    assert(Profile.cohensKappa(perfect, "a", "b").head()
      .getDouble(3) == 1.0)
    // single shared label on both sides: pe = 1 -> kappa null
    val degen = Seq(("x", "x"), ("x", "x")).toDF("a", "b")
    assert(Profile.cohensKappa(degen, "a", "b").head().isNullAt(3))
    // null labels drop from n
    val withNull = rows.union(
      Seq((null.asInstanceOf[String], "x")).toDF("a", "b"))
    assert(Profile.cohensKappa(withNull, "a", "b").head()
      .getLong(0) == 50L)
  }

  test("ratioMetricCI: proportional units collapse to zero width, " +
      "hand delta variance, degenerate nulls, loud contracts") {
    import spark.implicits._
    // x exactly = y/2 per unit: the covariance term cancels the
    // variance EXACTLY -> se 0, CI = [ratio, ratio]
    val prop = Seq(("g", 1.0, 2.0), ("g", 2.0, 4.0), ("g", 3.0, 6.0))
      .toDF("k", "x", "y")
    val p = Profile.ratioMetricCI(prop, Seq("k"), "x", "y").head()
    assert(p.getLong(1) == 3L && p.getDouble(2) == 0.5)
    assert(p.getDouble(3) == 0.0)
    assert(p.getDouble(4) == 0.5 && p.getDouble(5) == 0.5)
    // hand case: units (1,1),(3,2),(2,3): ratio 1, delta variance by
    // direct formula over sample moments
    val h = Seq(("g", 1.0, 1.0), ("g", 3.0, 2.0), ("g", 2.0, 3.0))
      .toDF("k", "x", "y")
    val r = Profile.ratioMetricCI(h, Seq("k"), "x", "y").head()
    val (vx, vy, cxy) = (1.0, 1.0, 0.5) // sample var/cov of the units
    val ratio = 6.0 / 6.0
    val se = math.sqrt(
      (vx + ratio * ratio * vy - 2.0 * ratio * cxy) / (3.0 * 4.0))
    def r6(d: Double) = math.floor(d * 1e6 + 0.5) / 1e6
    assert(r.getDouble(2) == 1.0)
    assert(math.abs(r.getDouble(3) - r6(se)) < 1e-9)
    assert(math.abs(r.getDouble(4) -
      r6(ratio - 1.959963984540054 * se)) < 1e-6 + 1e-9)
    // sum(y) = 0 or n < 2: null faces, never a division blowup
    val zy = Seq(("g", 1.0, 0.0), ("g", 2.0, 0.0)).toDF("k", "x", "y")
    assert(Profile.ratioMetricCI(zy, Seq("k"), "x", "y").head()
      .isNullAt(2))
    val single = Seq(("g", 1.0, 2.0)).toDF("k", "x", "y")
    assert(Profile.ratioMetricCI(single, Seq("k"), "x", "y").head()
      .isNullAt(2))
    intercept[IllegalArgumentException] {
      Profile.ratioMetricCI(h, Seq("k"), "x", "y", ciPct = 80)
    }
    intercept[IllegalArgumentException] {
      Profile.ratioMetricCI(h, Seq.empty, "x", "y")
    }
  }

  test("ksTestByKey: each key's one-vs-rest D equals the pairwise " +
      "ksTest on the same split; asymptotic p matches the formula") {
    import spark.implicits._
    // three keys with visibly different distributions
    val rows = ((1 to 40).map(i => ("a", i.toDouble)) ++
      (1 to 30).map(i => ("b", i.toDouble + 15.0)) ++
      (1 to 30).map(i => ("c", (i % 7).toDouble))).toDF("k", "v")
    val byKey = Profile.ksTestByKey(rows, "k", "v", scale = 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    for (key <- Seq("a", "b", "c")) {
      val split = rows.withColumn("g",
        when(col("k") === key, "one").otherwise("rest"))
      val ref = Profile.ksTest(split, "g", "v", "one", "rest",
        scale = 2).head()
      val (n, nRest, d, p) = byKey(key)
      assert(n == ref.getLong(0) && nRest == ref.getLong(1), key)
      assert(d == ref.getDouble(3), key)
      val e = n.toDouble * nRest.toDouble / (n.toDouble + nRest.toDouble)
      val expP = math.min(1.0, 2.0 * math.exp(-2.0 * e * d * d))
      assert(math.abs(p - expP) < 1e-6, key)
    }
    // the shifted key deviates more than the uniform-ish one
    assert(byKey("c")._3 > 0.2)
    intercept[IllegalArgumentException] {
      Profile.ksTestByKey(rows, "k", "v", maxKeys = 2)
    }
  }

  test("bhFdr: textbook step-up, tie block rejects together, " +
      "no-rejection and loud contracts") {
    import spark.implicits._
    // classic example: m=5, q=0.25; sorted p = .01 .02 .04 .30 .50
    // thresholds i*q/m = .05 .10 .15 .20 .25 -> k*=3, reject p<=.04
    val df = Seq(("t1", 0.01), ("t2", 0.30), ("t3", 0.04),
      ("t4", 0.02), ("t5", 0.50)).toDF("id", "p")
    val out = Profile.bhFdr(df, "id", "p", q = 0.25)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getBoolean(3))).toMap
    assert(out("t1") == ((1L, true)))
    assert(out("t4") == ((2L, true)))
    assert(out("t3") == ((3L, true)))
    assert(out("t2") == ((4L, false)))
    assert(out("t5") == ((5L, false)))
    // tied block: p = .04 .04 with m=2, q=.05 — at the max-tie rank
    // 2 the threshold is .05, so BOTH reject (the tie must not split)
    val ties = Seq(("a", 0.04), ("b", 0.04)).toDF("id", "p")
    val to = Profile.bhFdr(ties, "id", "p", q = 0.05)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getBoolean(3))).toMap
    assert(to("a") == ((2L, true)) && to("b") == ((2L, true)))
    // nothing clears: rejected all-false, never null
    val none = Profile.bhFdr(
      Seq(("a", 0.9), ("b", 0.8)).toDF("id", "p"), "id", "p", 0.05)
      .collect()
    assert(none.forall(!_.getBoolean(3)))
    intercept[IllegalArgumentException] {
      Profile.bhFdr(Seq(("a", 1.5)).toDF("id", "p"), "id", "p", 0.05)
    }
    intercept[IllegalArgumentException] {
      Profile.bhFdr(df, "id", "p", q = 0.0)
    }
    intercept[IllegalArgumentException] {
      Profile.bhFdr(df, "id", "p", 0.05, maxTests = 3L)
    }
  }

  test("wasserstein1: shift = distance, disjoint mass, naive reference, " +
      "degenerate edges") {
    import spark.implicits._
    def w1(rows: Seq[(String, Double)], scale: Int = 0) =
      Profile.wasserstein1(rows.toDF("g", "v"), "g", "v", "A", "B",
        scale)
    // B is A shifted by exactly 1: W1 == 1
    val shift = Seq(0.0, 1.0, 2.0).map(("A", _)) ++
      Seq(1.0, 2.0, 3.0).map(("B", _))
    assert(w1(shift).head().getDouble(3) == 1.0)
    // identical distributions: 0; single shared value still emits
    val same = Seq(("A", 5.0), ("A", 7.0), ("B", 5.0), ("B", 7.0))
    assert(w1(same).head().getDouble(3) == 0.0)
    val point = Seq(("A", 5.0), ("B", 5.0))
    val p = w1(point).head()
    assert(p.getLong(0) == 1L && p.getDouble(3) == 0.0)
    // disjoint point masses: distance between them
    assert(w1(Seq(("A", 0.0), ("B", 10.0))).head().getDouble(3)
      == 10.0)
    // sub-unit values via scale
    assert(w1(Seq(("A", 0.5), ("B", 1.0)), scale = 2)
      .head().getDouble(3) == 0.5)
    // one empty side: null w1
    val oneSided = w1(Seq(("A", 1.0), ("A", 2.0))).head()
    assert(oneSided.getLong(1) == 0L && oneSided.isNullAt(3))
    // pseudo-random data vs the naive O(n log n) reference, under
    // adversarial repartition
    val rows = (0 until 400).map { i =>
      (if (i % 2 == 0) "A" else "B", ((i * 37) % 23).toDouble)
    }
    val got = Profile.wasserstein1(
      rows.toDF("g", "v").repartition(13), "g", "v", "A", "B", 0)
      .head().getDouble(3)
    val av = rows.filter(_._1 == "A").map(_._2.toLong).sorted
    val bv = rows.filter(_._1 == "B").map(_._2.toLong).sorted
    val grid = (av ++ bv).distinct.sorted
    var ref = 0.0
    grid.zip(grid.tail).foreach { case (v, vn) =>
      val fa = av.count(_ <= v).toDouble / av.size
      val fb = bv.count(_ <= v).toDouble / bv.size
      ref += math.abs(fa - fb) * (vn - v)
    }
    assert(math.abs(got - ref) < 1e-6, s"$got vs $ref")
  }

  test("krippendorffAlpha: hand value with ragged panel, unpairable " +
      "items drop, perfect 1, single-category null") {
    import spark.implicits._
    // i1 aa (term 2), i2 ab (0), i3 bbb (3), i4 b (drops),
    // i5 a+null (drops after null filter)
    // n = 7, A_o = 5; marginals a:3 b:4 -> A_e = 18/6 = 3
    // alpha = 1 - (7-5)/(7-3) = 0.5
    val panel = Seq(
      (1L, "a"), (1L, "a"),
      (2L, "a"), (2L, "b"),
      (3L, "b"), (3L, "b"), (3L, "b"),
      (4L, "b"),
      (5L, "a"), (5L, null.asInstanceOf[String]))
      .toDF("item", "label")
    val r = Profile.krippendorffAlpha(panel, "item", "label").head()
    assert(r.getLong(0) == 3L && r.getLong(1) == 7L &&
      r.getLong(2) == 2L)
    assert(r.getDouble(3) == 5.0 && r.getDouble(4) == 3.0)
    assert(r.getDouble(5) == 0.5)
    // unanimous items over >= 2 categories: alpha exactly 1
    val perfect = Seq((1L, "a"), (1L, "a"), (2L, "b"), (2L, "b"))
      .toDF("item", "label")
    assert(Profile.krippendorffAlpha(perfect, "item", "label")
      .head().getDouble(5) == 1.0)
    // single category: D_e = 0 -> null
    val degen = Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "a"))
      .toDF("item", "label")
    assert(Profile.krippendorffAlpha(degen, "item", "label")
      .head().isNullAt(5))
    // only unpairable items: empty panel faces are null
    val thin = Seq((1L, "a"), (2L, "b")).toDF("item", "label")
    val t = Profile.krippendorffAlpha(thin, "item", "label").head()
    assert(t.getLong(0) == 0L && t.isNullAt(3) && t.isNullAt(5))
  }

  test("fleissKappa: textbook value, perfect 1, degenerate null, " +
      "null drops the item, ragged panel loud") {
    import spark.implicits._
    // 4 items x 3 raters, two categories:
    //  i1 aaa (s2=9), i2 aab (5), i3 bbb (9), i4 abb (5)
    //  P-bar = (28-12)/24 = 2/3; c_a = c_b = 6 -> Pe = 72/144 = 0.5
    //  kappa = (2/3 - 1/2)/(1/2) = 1/3
    val panel = Seq(
      (1L, "a"), (1L, "a"), (1L, "a"),
      (2L, "a"), (2L, "a"), (2L, "b"),
      (3L, "b"), (3L, "b"), (3L, "b"),
      (4L, "a"), (4L, "b"), (4L, "b")).toDF("item", "label")
    val r = Profile.fleissKappa(panel, "item", "label").head()
    assert(r.getLong(0) == 4L && r.getLong(1) == 3L &&
      r.getLong(2) == 2L)
    assert(r.getDouble(3) == math.rint(2.0 / 3.0 * 1e6) / 1e6)
    assert(r.getDouble(4) == 0.5)
    assert(r.getDouble(5) == math.rint(1.0 / 3.0 * 1e6) / 1e6)
    // unanimous panels over >= 2 categories: kappa exactly 1
    val perfect = Seq((1L, "a"), (1L, "a"), (2L, "b"), (2L, "b"))
      .toDF("item", "label")
    assert(Profile.fleissKappa(perfect, "item", "label").head()
      .getDouble(5) == 1.0)
    // single category everywhere: Pe = 1 -> kappa null
    val degen = Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "a"))
      .toDF("item", "label")
    assert(Profile.fleissKappa(degen, "item", "label").head()
      .isNullAt(5))
    // a null rating removes its whole item (else the panel is ragged)
    val withNull = panel.union(
      Seq((5L, "a"), (5L, null.asInstanceOf[String]), (5L, "b"))
        .toDF("item", "label"))
    val rn = Profile.fleissKappa(withNull, "item", "label").head()
    assert(rn.getLong(0) == 4L &&
      rn.getDouble(5) == r.getDouble(5))
    // ragged panel (an item with 2 ratings among 3-rating items)
    intercept[IllegalArgumentException] {
      Profile.fleissKappa(
        panel.union(Seq((9L, "a"), (9L, "b")).toDF("item", "label")),
        "item", "label").head()
    }
    // single-rater panel
    intercept[IllegalArgumentException] {
      Profile.fleissKappa(
        Seq((1L, "a"), (2L, "b")).toDF("item", "label"),
        "item", "label").head()
    }
  }

  test("encodingAudit: counts each planted artifact exactly, " +
      "multi-codepoint pattern counted per occurrence, clean and " +
      "null docs report zero") {
    import spark.implicits._
    val art = Profile.EncodingArtifacts.toMap
    val docs = Seq(
      (1L, Some("plain ascii prose")),
      (2L, Some("caf" + art("latin1_utf8") + "© and " +
        art("latin1_utf8"))), // 2x latin1 tell
      (3L, Some("it" + art("smart_quote") + "s it" +
        art("smart_quote") + "s")), // 2x 3-codepoint quote
      (4L, Some(art("replacement") * 3)),
      (5L, Some("a" + art("zwsp") + "b" + art("ctl"))),
      (6L, None)).toDF("doc_id", "text")
    val out = Profile.encodingAudit(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (1 to 6).map(r.getLong).toList).toMap
    assert(out(1L) == List(0, 0, 0, 0, 0, 0))
    assert(out(2L) == List(2, 0, 0, 0, 0, 2))
    // the smart-quote bytes contain no stray "Ã" (U+00C3) — the
    // latin1 counter must not fire on U+00E2
    assert(out(3L) == List(0, 2, 0, 0, 0, 2))
    assert(out(4L) == List(0, 0, 3, 0, 0, 3))
    assert(out(5L) == List(0, 0, 0, 1, 1, 2))
    assert(out(6L) == List(0, 0, 0, 0, 0, 0))
    val clean = Profile.encodingAudit(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getBoolean(7)).toMap
    assert(clean == Map(1L -> true, 2L -> false, 3L -> false,
      4L -> false, 5L -> false, 6L -> true))
  }
}
