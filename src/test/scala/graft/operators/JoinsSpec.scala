package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class JoinsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: Long): Timestamp = new Timestamp(s * 1000L)

  // probes: (id, key, t); quotes: (key, t, px)
  private lazy val probes = Seq(
    (1L, "a", ts(10)), (2L, "a", ts(20)), (3L, "a", ts(30)),
    (4L, "b", ts(15)), (5L, "c", ts(50))
  ).toDF("id", "k", "t")

  private lazy val quotes = Seq(
    ("a", ts(5), 1.0), ("a", ts(20), 2.0), ("a", ts(25), 3.0),
    ("b", ts(16), 4.0), ("d", ts(1), 9.0)
  ).toDF("k", "qt", "px")

  test("asofJoin: greatest right time <= left time, per key; null when none") {
    val got = Joins.asofJoin(
      probes, quotes, Seq("k"), "t", "qt", Seq("px"))
      .orderBy("id")
      .select("id", "matched_time", "px")
      .as[(Long, Option[Timestamp], Option[Double])].collect()
    assert(got.toSeq == Seq(
      (1L, Some(ts(5)), Some(1.0)),    // only the t=5 quote is <= 10
      (2L, Some(ts(20)), Some(2.0)),   // tie at t=20 matches (<=)
      (3L, Some(ts(25)), Some(3.0)),   // latest of the three
      (4L, None, None),                // b's quote is at 16 > 15
      (5L, None, None)))               // no c quotes at all
  }

  test("asofJoin strict: a tied right row is not visible") {
    val got = Joins.asofJoin(
      probes, quotes, Seq("k"), "t", "qt", Seq("px"), strict = true)
      .orderBy("id").select("id", "px")
      .as[(Long, Option[Double])].collect().toMap
    assert(got(2L).contains(1.0)) // t=20 quote excluded, falls back to t=5
    assert(got(3L).contains(3.0)) // 25 < 30 still fine
  }

  test("asofJoin tolerance: stale matches are nulled, not dropped") {
    val got = Joins.asofJoin(
      probes, quotes, Seq("k"), "t", "qt", Seq("px"),
      tolerance = Some(6.0))
      .orderBy("id").select("id", "px")
      .as[(Long, Option[Double])].collect().toMap
    assert(got.size == 5)             // left-outer: every probe survives
    assert(got(1L).contains(1.0))     // 10-5  = 5s <= 6s
    assert(got(3L).contains(3.0))     // 30-25 = 5s <= 6s
    assert(got(2L).contains(2.0))     // exact tie, staleness 0
  }

  test("asofJoin: NULL keys match nothing (equi-join semantics)") {
    val p = Seq((1L, Option("a"), ts(10)), (2L, Option.empty[String], ts(10)))
      .toDF("id", "k", "t")
    val q = Seq((Option("a"), ts(5), 1.0), (Option.empty[String], ts(5), 2.0))
      .toDF("k", "qt", "px")
    val got = Joins.asofJoin(p, q, Seq("k"), "t", "qt", Seq("px"))
      .orderBy("id").select("id", "px")
      .as[(Long, Option[Double])].collect().toMap
    assert(got(1L).contains(1.0))
    assert(got(2L).isEmpty) // NULL never equals NULL
  }

  test("asofJoin rejects payload/reserved column collisions") {
    val err = intercept[IllegalArgumentException] {
      Joins.asofJoin(probes, quotes.withColumnRenamed("px", "t"),
        Seq("k"), "t", "qt", Seq("t"))
    }
    assert(err.getMessage.contains("collide"))
  }

  test("asofJoin == naive per-row max on fixture events") {
    val ev = graft.queries.Catalog.events(spark, TestSpark.sf0001)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    val got = Joins.asofJoin(
      purchases, clicks, Seq("user_id"), "ts", "ts", Seq("click_id"))
      .select("event_id", "click_id")
      .as[(Long, Option[Long])].collect().toMap

    val cs = clicks.as[(Long, Timestamp, Long)].collect()
    val naive = purchases.as[(Long, Long, Timestamp)].collect().map {
      case (eid, uid, t) =>
        val cands = cs.filter(c => c._1 == uid && !c._2.after(t))
        eid -> (if (cands.isEmpty) None
                else Some(cands.maxBy(_._2.getTime)._3))
    }.toMap
    assert(got == naive)
    assert(got.values.exists(_.isDefined)) // non-degenerate fixture
  }

  test("asofJoinNative == composed asofJoin on fixture events") {
    val ev = graft.queries.Catalog.events(spark, TestSpark.sf0001)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"),
        col("event_id").as("click_id"), col("value").as("click_value"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("event_id").collect().map(_.toSeq).toSeq
    val composed = Joins.asofJoin(
      purchases, clicks, Seq("user_id"), "ts", "ts",
      Seq("click_id", "click_value"))
    val native = Joins.asofJoinNative(
      purchases, clicks, Seq("user_id"), "ts", "ts",
      Seq("click_id", "click_value"))
    assert(rows(native) == rows(composed))
    assert(rows(native).nonEmpty)
    // strict variant agrees too
    assert(rows(Joins.asofJoinNative(purchases, clicks, Seq("user_id"),
      "ts", "ts", Seq("click_id", "click_value"), strict = true)) ==
      rows(Joins.asofJoin(purchases, clicks, Seq("user_id"),
        "ts", "ts", Seq("click_id", "click_value"), strict = true)))
  }

  test("asofJoinNative: hand cases incl. NULL keys and self-as-of") {
    val p = Seq((1L, Option("a"), ts(10)), (2L, Option("a"), ts(30)),
      (3L, Option.empty[String], ts(10)), (4L, Option("c"), ts(50)))
      .toDF("id", "k", "t")
    val q = Seq((Option("a"), ts(5), 1.0), (Option("a"), ts(20), 2.0),
      (Option.empty[String], ts(5), 9.0))
      .toDF("k", "qt", "px")
    val got = Joins.asofJoinNative(p, q, Seq("k"), "t", "qt", Seq("px"))
      .orderBy("id").select("id", "px")
      .as[(Long, Option[Double])].collect().toMap
    assert(got == Map(1L -> Some(1.0), 2L -> Some(2.0), 3L -> None, 4L -> None))
    // self-as-of: both sides from ONE DataFrame — fresh right expr ids
    val self = Joins.asofJoinNative(
      probes, probes.select(col("k"), col("t"), col("id").as("pid")),
      Seq("k"), "t", "t", Seq("pid"))
    assert(self.count() == probes.count()) // every probe matches itself
  }

  test("asofJoinNative plan: AsofJoin node, exchanges only for the keys") {
    val ev = graft.queries.Catalog.events(spark, TestSpark.sf0001)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    val df = Joins.asofJoinNative(
      purchases, clicks, Seq("user_id"), "ts", "ts", Seq("click_id"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsofJoin"), p.take(2000))
    assert(!p.contains("Window"), p.take(2000))
  }

  test("asofJoin property: composed == native == naive on random corpora") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val keyGen = Gen.oneOf("a", "b", "c", "d")
    // coarse times force ties and duplicate (key, time) collisions on
    // the left; right times are offset so exact-tie (<=) paths fire
    val pairGen: Gen[(String, Long)] = Gen.zip(keyGen, Gen.choose(0L, 30L))
    (0 until 5).foreach { i =>
      val lRaw: List[(String, Long)] = Gen.listOfN(60, pairGen)
        .apply(Gen.Parameters.default, Seed(7L + i)).get
      val rRaw: List[(String, Long)] = Gen.listOfN(40, pairGen)
        .apply(Gen.Parameters.default, Seed(1000L + i)).get
      val lRows = lRaw.zipWithIndex.map { case ((k, t), id) =>
        (id.toLong, k, ts(t))
      }
      // dedupe right (key, time) — payload would be nondeterministic
      // under ties, which is a data-contract precondition, not a bug
      val rRows = rRaw.distinct.zipWithIndex.map { case ((k, t), id) =>
        (k, ts(t), id.toDouble)
      }
      val l = lRows.toDF("id", "k", "t")
      val r = rRows.toDF("k", "qt", "px")
      def result(df: org.apache.spark.sql.DataFrame) =
        df.select("id", "matched_time", "px")
          .as[(Long, Option[Timestamp], Option[Double])].collect().toSet
      val composed = result(Joins.asofJoin(l, r, Seq("k"), "t", "qt", Seq("px")))
      val native = result(Joins.asofJoinNative(l, r, Seq("k"), "t", "qt", Seq("px")))
      val naive = lRows.map { case (id, k, t) =>
        val cands = rRows.filter(c => c._1 == k && !c._2.after(t))
        if (cands.isEmpty) (id, None, None)
        else {
          val best = cands.maxBy(_._2.getTime)
          (id, Some(best._2), Some(best._3))
        }
      }.toSet
      assert(composed == naive, s"composed != naive at seed ${7 + i}")
      assert(native == naive, s"native != naive at seed ${7 + i}")
    }
  }

  test("asofJoin property matrix: strict × tolerance × partitions, composed == native == naive") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val keyGen = Gen.oneOf("a", "b", "c", "d")
    // left times extend past every right time (45 > 30): the merge's
    // right-side-exhausted tail path runs on every key
    val lGen: Gen[(String, Long)] = Gen.zip(keyGen, Gen.choose(0L, 45L))
    val rGen: Gen[(String, Long)] = Gen.zip(keyGen, Gen.choose(0L, 30L))
    val origParts = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      for {
        i <- 0 until 3
        parts <- Seq("2", "32") // 2 forces multi-key partitions and
                                // cross-partition key boundaries
        strict <- Seq(false, true)
        tol <- Seq(None, Some(7.0))
      } {
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        val lRows = Gen.listOfN(60, lGen)
          .apply(Gen.Parameters.default, Seed(21L + i)).get
          .zipWithIndex.map { case ((k, t), id) => (id.toLong, k, ts(t)) }
        val rRows = Gen.listOfN(40, rGen)
          .apply(Gen.Parameters.default, Seed(4000L + i)).get
          .distinct.zipWithIndex.map { case ((k, t), id) => (k, ts(t), id.toDouble) }
        val l = lRows.toDF("id", "k", "t")
        val r = rRows.toDF("k", "qt", "px")
        def result(df: org.apache.spark.sql.DataFrame) =
          df.select("id", "matched_time", "px")
            .as[(Long, Option[Timestamp], Option[Double])].collect().toSet
        val composed = result(Joins.asofJoin(
          l, r, Seq("k"), "t", "qt", Seq("px"), strict, tol))
        val native = result(Joins.asofJoinNative(
          l, r, Seq("k"), "t", "qt", Seq("px"), strict, tol))
        val naive = lRows.map { case (id, k, t) =>
          val cands = rRows.filter(c => c._1 == k &&
            (if (strict) c._2.before(t) else !c._2.after(t)))
          val fresh = cands.filter(c => tol.forall(s =>
            (t.getTime - c._2.getTime) <= (s * 1000).toLong))
          if (cands.isEmpty || fresh.isEmpty) (id, None, None)
          else {
            // best candidate ignores tolerance; staleness nulls it
            val best = cands.maxBy(_._2.getTime)
            if (tol.forall(s => (t.getTime - best._2.getTime) <= (s * 1000).toLong))
              (id, Some(best._2), Some(best._3))
            else (id, None, None)
          }
        }.toSet
        val ctx = s"seed=${21 + i} parts=$parts strict=$strict tol=$tol"
        assert(composed == naive, s"composed != naive [$ctx]")
        assert(native == naive, s"native != naive [$ctx]")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", origParts)
  }

  test("as-of duplicate (key,time) right rows: deterministic when payloads agree") {
    // the data contract says right (key,time) should be unique for a
    // deterministic payload; when duplicates DO occur with equal
    // payloads, both paths must still agree and pick that payload
    val l = Seq((1L, "a", ts(10)), (2L, "a", ts(30))).toDF("id", "k", "t")
    val r = Seq(
      ("a", ts(5), 1.0), ("a", ts(5), 1.0), ("a", ts(5), 1.0),
      ("a", ts(20), 2.0), ("a", ts(20), 2.0)
    ).toDF("k", "qt", "px")
    def result(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "matched_time", "px")
        .as[(Long, Option[Timestamp], Option[Double])].collect().toSet
    val expected = Set(
      (1L, Some(ts(5)), Some(1.0)),
      (2L, Some(ts(20)), Some(2.0)))
    assert(result(Joins.asofJoin(l, r, Seq("k"), "t", "qt", Seq("px"))) == expected)
    assert(result(Joins.asofJoinNative(l, r, Seq("k"), "t", "qt", Seq("px"))) == expected)
  }

  test("asofJoinNative validates key and time column types up front") {
    val l = Seq((1L, "a", ts(10))).toDF("id", "k", "t")
    val rStrKey = Seq((1L, "a", ts(5), 1.0)).toDF("rid", "k", "t", "v")
    // mismatched key types: left string vs right long
    val rLongKey = rStrKey.withColumn("k", lit(7L))
    val e1 = intercept[IllegalArgumentException] {
      Joins.asofJoinNative(l, rLongKey, Seq("k"), "t", "t", Seq("v"))
    }
    assert(e1.getMessage.contains("mismatched types"))
    // non-timestamp/long time column
    val lIntTime = l.withColumn("t", lit(5))
    val rIntTime = rStrKey.withColumn("t", lit(3))
    val e2 = intercept[IllegalArgumentException] {
      Joins.asofJoinNative(lIntTime, rIntTime, Seq("k"), "t", "t", Seq("v"))
    }
    assert(e2.getMessage.contains("must be TIMESTAMP or BIGINT"))
    // well-typed call still works after the checks
    assert(Joins.asofJoinNative(l, rStrKey, Seq("k"), "t", "t", Seq("v"))
      .count() == 1L)
  }

  test("asofJoin forward: smallest right time >= left time; strict and tolerance") {
    val got = Joins.asofJoin(
      probes, quotes, Seq("k"), "t", "qt", Seq("px"), direction = "forward")
      .orderBy("id")
      .select("id", "px").as[(Long, Option[Double])].collect().toSeq
    // a@10 -> qt20 (2.0); a@20 -> qt20 inclusive (2.0); a@30 -> none;
    // b@15 -> qt16 (4.0); c@50 -> none
    assert(got == Seq((1L, Some(2.0)), (2L, Some(2.0)), (3L, None),
      (4L, Some(4.0)), (5L, None)))
    val strict = Joins.asofJoin(
      probes, quotes, Seq("k"), "t", "qt", Seq("px"),
      strict = true, direction = "forward")
      .orderBy("id")
      .select("id", "px").as[(Long, Option[Double])].collect().toSeq
    // a@20's tied quote is hidden -> next is qt25 (3.0)
    assert(strict.head == ((1L, Some(2.0))))
    assert(strict(1) == ((2L, Some(3.0))))
    val tol = Joins.asofJoin(
      probes, quotes, Seq("k"), "t", "qt", Seq("px"),
      tolerance = Some(1.0), direction = "forward")
      .orderBy("id")
      .select("id", "px").as[(Long, Option[Double])].collect().toSeq
    // a@10 -> qt20 is 10s ahead > 1s tolerance -> nulled; b@15 -> qt16 ok
    assert(tol == Seq((1L, None), (2L, Some(2.0)), (3L, None),
      (4L, Some(4.0)), (5L, None)))
  }

  test("asofJoin nearest: strictly closer side wins, exact tie takes backward") {
    // key x: probe@20 sits exactly between quotes at 10 and 30 -> tie
    // -> backward (1.0); probe@24 is closer to 30 -> forward (2.0);
    // probe@11 closer to 10 -> backward (1.0)
    val l = Seq((1L, "x", ts(20)), (2L, "x", ts(24)), (3L, "x", ts(11)),
      (4L, "y", ts(5)))
      .toDF("id", "k", "t")
    val r = Seq(("x", ts(10), 1.0), ("x", ts(30), 2.0), ("y", ts(50), 7.0))
      .toDF("k", "qt", "px")
    val got = Joins.asofJoin(
      l, r, Seq("k"), "t", "qt", Seq("px"), direction = "nearest")
      .orderBy("id")
      .select("id", "px").as[(Long, Option[Double])].collect().toSeq
    assert(got == Seq((1L, Some(1.0)), (2L, Some(2.0)), (3L, Some(1.0)),
      (4L, Some(7.0)))) // y@5: only a future quote exists -> forward
    // tolerance cuts the far side: y@5 -> qt50 is 45s away > 10s -> null
    val tol = Joins.asofJoin(
      l, r, Seq("k"), "t", "qt", Seq("px"),
      tolerance = Some(10.0), direction = "nearest")
      .orderBy("id")
      .select("id", "px").as[(Long, Option[Double])].collect().toSeq
    assert(tol == Seq((1L, Some(1.0)), (2L, Some(2.0)), (3L, Some(1.0)),
      (4L, None)))
    intercept[IllegalArgumentException] {
      Joins.asofJoin(l, r, Seq("k"), "t", "qt", Seq("px"),
        direction = "sideways")
    }
  }

  test("asofJoinNative forward == composed forward (hand case, strict, tolerance, fixture)") {
    // hand case mirrors the composed forward test
    val got = Joins.asofJoinNative(
      probes, quotes, Seq("k"), "t", "qt", Seq("px"), direction = "forward")
      .orderBy("id")
      .select("id", "px").as[(Long, Option[Double])].collect().toSeq
    assert(got == Seq((1L, Some(2.0)), (2L, Some(2.0)), (3L, None),
      (4L, Some(4.0)), (5L, None)))
    // composed == native across strict x tolerance on fixture events
    val ev = graft.queries.Catalog.events(spark, TestSpark.sf0001)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    for (strict <- Seq(false, true); tol <- Seq(None, Some(600.0))) {
      def cols(df: org.apache.spark.sql.DataFrame) =
        df.select("event_id", "matched_time", "click_id")
          .collect().map(r => (r.getLong(0),
            Option(r.getTimestamp(1)).map(_.getTime),
            if (r.isNullAt(2)) -1L else r.getLong(2)))
          .sortBy(_._1).toSeq
      val composed = cols(Joins.asofJoin(
        purchases, clicks, Seq("user_id"), "ts", "ts", Seq("click_id"),
        strict, tol, "forward"))
      val native = cols(Joins.asofJoinNative(
        purchases, clicks, Seq("user_id"), "ts", "ts", Seq("click_id"),
        strict, tol, "forward"))
      assert(native == composed, s"strict=$strict tol=$tol")
      assert(composed.exists(_._3 >= 0L)) // matches actually exist
    }
  }

  test("asofJoin nearest property: == per-row min-distance reference on fixture") {
    val ev = graft.queries.Catalog.events(spark, TestSpark.sf0001)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    val got = Joins.asofJoin(
      purchases, clicks, Seq("user_id"), "ts", "ts", Seq("click_id"),
      direction = "nearest")
      .select("event_id", "click_id")
      .as[(Long, Option[Long])].collect().toMap
    val cs = clicks.as[(Long, Timestamp, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(c => (c._2.getTime, c._3))).toMap
    purchases.as[(Long, Long, Timestamp)].collect().foreach {
      case (eid, uid, t) =>
        val expect = cs.get(uid).flatMap { quotes =>
          val past = quotes.filter(_._1 <= t.getTime)
          val future = quotes.filter(_._1 >= t.getTime)
          val b = if (past.isEmpty) None else Some(past.maxBy(q => (q._1, q._2)))
          val f = if (future.isEmpty) None
            else Some(future.minBy(q => (q._1, -q._2)))
          (b, f) match {
            case (Some(pb), Some(pf)) =>
              if (pf._1 - t.getTime < t.getTime - pb._1) Some(pf._2)
              else Some(pb._2)
            case (x, y) => x.orElse(y).map(_._2)
          }
        }
        assert(got(eid) == expect, s"purchase $eid")
    }
  }

  test("rangeJoin == naive theta join; bucketing width is invisible") {
    val ev = graft.queries.Catalog.events(spark, TestSpark.sf0001).limit(400)
    val l = ev.select(col("event_id").as("lid"), col("user_id"),
      col("ts").as("lt"))
    val r = ev.select(col("event_id").as("rid"), col("user_id"),
      col("ts").as("rt"))
    def pairs(widthSec: Option[Double]) = Joins.rangeJoin(
      l, r, Seq("user_id"), "lt", "rt", lowerSec = 1e-6, upperSec = 600.0,
      widthSec = widthSec)
      .select("lid", "rid").as[(Long, Long)].collect().toSet

    val naive = l.as("l").join(r.as("r"),
      col("l.user_id") === col("r.user_id") &&
        col("rt") > col("lt") &&
        unix_micros(col("rt")) - unix_micros(col("lt")) <= 600000000L)
      .select("lid", "rid").as[(Long, Long)].collect().toSet

    val wide = pairs(None)
    assert(wide == naive)
    assert(wide.nonEmpty)
    // a narrower bucket width duplicates rows into more cells but the
    // residual predicate must make the result identical
    assert(pairs(Some(150.0)) == naive)
  }

  test("intervalOverlapJoin == naive theta join; cell width invisible") {
    // random variable-length intervals on both sides, several keys
    val rnd = new scala.util.Random(7)
    val l = (0 until 120).map(i =>
      (i.toLong, (i % 5).toLong, ts(rnd.nextInt(5000)),
        rnd.nextInt(900))).map { case (id, k, t0, span) =>
      (id, k, t0, ts(t0.getTime / 1000L + span)) }
      .toDF("lid", "k", "ls", "le")
    val r = (0 until 130).map(i =>
      (1000L + i, (i % 5).toLong, ts(rnd.nextInt(5000)),
        rnd.nextInt(900))).map { case (id, k, t0, span) =>
      (id, k, t0, ts(t0.getTime / 1000L + span)) }
      .toDF("rid", "k", "rs", "re")

    val naive = l.as("l").join(r.as("r"),
      col("l.k") === col("r.k") &&
        col("ls") <= col("re") && col("rs") <= col("le"))
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(naive.nonEmpty)

    for (w <- Seq(100.0, 1000.0, 7200.0)) {
      val got = Joins.intervalOverlapJoin(
        l, r, Seq("k"), "ls", "le", "rs", "re", widthSec = w)
        .select("lid", "rid").as[(Long, Long)].collect()
      // exactly once per pair — the first-shared-cell predicate must
      // dedupe without a distinct even when intervals share many cells
      assert(got.length == got.toSet.size, s"duplicates at width $w")
      assert(got.toSet == naive, s"mismatch at width $w")
    }
  }

  test("intervalOverlapJoin loud contracts: inversion, span, collision") {
    val ok = Seq((1L, 1L, ts(0), ts(10)))
      .toDF("lid", "k", "ls", "le")
    val inverted = Seq((1L, 1L, ts(100), ts(5)))
      .toDF("rid", "k", "rs", "re")
    val e1 = intercept[IllegalArgumentException] {
      Joins.intervalOverlapJoin(
        ok, inverted, Seq("k"), "ls", "le", "rs", "re", widthSec = 60)
    }
    assert(e1.getMessage.contains("inverted"))

    val huge = Seq((2L, 1L, ts(0), ts(3600 * 24)))
      .toDF("rid", "k", "rs", "re")
    val e2 = intercept[IllegalArgumentException] {
      Joins.intervalOverlapJoin(ok, huge, Seq("k"),
        "ls", "le", "rs", "re", widthSec = 1.0, maxCellsPerRow = 100)
    }
    assert(e2.getMessage.contains("maxCellsPerRow"))

    val clash = Seq((2L, 1L, ts(0), ts(5)))
      .toDF("lid", "k", "rs", "re") // "lid" collides with left
    val e3 = intercept[IllegalArgumentException] {
      Joins.intervalOverlapJoin(ok, clash, Seq("k"),
        "ls", "le", "rs", "re", widthSec = 60)
    }
    assert(e3.getMessage.contains("rename"))

    // empty sides are fine (guard head() on empty agg)
    val empty = Seq.empty[(Long, Long, Timestamp, Timestamp)]
      .toDF("rid", "k", "rs", "re")
    assert(Joins.intervalOverlapJoin(ok, empty, Seq("k"),
      "ls", "le", "rs", "re", widthSec = 60).count() == 0L)
  }
}
