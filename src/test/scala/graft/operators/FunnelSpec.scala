package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class FunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  // u1: clean view->click->purchase
  // u2: click BEFORE view — click must not count; no purchase
  // u3: view only
  // u4: view and click at the SAME instant — strict > blocks step 2
  // u5: view -> click -> purchase but purchase before click
  private val events = Seq(
    (1L, "view", ts(10)), (1L, "click", ts(20)), (1L, "purchase", ts(30)),
    (2L, "click", ts(5)), (2L, "view", ts(10)),
    (3L, "view", ts(1)),
    (4L, "view", ts(10)), (4L, "click", ts(10)),
    (5L, "view", ts(10)), (5L, "purchase", ts(15)), (5L, "click", ts(20))
  ).toDF("user_id", "event_type", "ts")

  private val steps = Seq("view", "click", "purchase")

  test("cascading order semantics: out-of-order and simultaneous events don't advance") {
    val got = Funnel.funnelCounts(events, "user_id", "event_type", "ts", steps)
      .as[(Long, String, Long)].collect().toSeq
    // step1: u1..u5 all viewed = 5
    // step2 (click after view): u1 (20>10), u5 (20>10) — u2's click
    // precedes its view, u4's is simultaneous -> 2
    // step3 (purchase after qualifying click): u1 only — u5 purchased
    // before its click -> 1
    assert(got == Seq((1L, "view", 5L), (2L, "click", 2L), (3L, "purchase", 1L)))
  }

  test("funnelUsers carries entry timestamps and nulls after fallout") {
    val got = Funnel.funnelUsers(events, "user_id", "event_type", "ts", steps)
      .as[(Long, Timestamp, Option[Timestamp], Option[Timestamp])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((ts(10), Some(ts(20)), Some(ts(30)))))
    assert(got(2L) == ((ts(10), None, None)))
    assert(got(5L) == ((ts(10), Some(ts(20)), None)))
    assert(!got.contains(6L))
  }

  test("maxGap bounds each transition") {
    // u1's click is 10s after view; with a 5s gap it no longer counts
    val got = Funnel.funnelCounts(events, "user_id", "event_type", "ts",
      steps, maxGap = Some(5000000L))
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((1L, "view", 5L), (2L, "click", 0L), (3L, "purchase", 0L)))
  }

  test("counts are monotonically non-increasing and partition-invariant") {
    val base = Funnel.funnelCounts(events, "user_id", "event_type", "ts", steps)
      .as[(Long, String, Long)].collect().toSeq
    val counts = base.map(_._3)
    assert(counts == counts.sortBy(-_))
    val re = Funnel.funnelCounts(events.repartition(7),
      "user_id", "event_type", "ts", steps)
      .as[(Long, String, Long)].collect().toSeq
    assert(re == base)
  }

  test("single-step funnel and absent step types") {
    val one = Funnel.funnelCounts(events, "user_id", "event_type", "ts",
      Seq("purchase")).as[(Long, String, Long)].collect().toSeq
    assert(one == Seq((1L, "purchase", 2L))) // u1, u5 ever purchased
    val ghost = Funnel.funnelCounts(events, "user_id", "event_type", "ts",
      Seq("view", "refund")).as[(Long, String, Long)].collect().toSeq
    assert(ghost == Seq((1L, "view", 5L), (2L, "refund", 0L)))
  }

  // ----- retention cohorts -----

  test("retentionMatrix: cohort by first period, offsets count comebacks") {
    import java.sql.Timestamp
    def t(periods: Long, within: Long = 0L) =
      new Timestamp((periods * 100L + within) * 1000L)
    // period = 100s. u1 born p0, active p0/p1/p3 (twice in p1 — the
    // distinct collapse); u2 born p0, only p0; u3 born p1, active p1/p2
    val df = Seq(
      (1L, t(0)), (1L, t(1)), (1L, t(1, 50)), (1L, t(3)),
      (2L, t(0, 7)),
      (3L, t(1)), (3L, t(2))
    ).toDF("user_id", "ts")
    val got = Funnel.retentionMatrix(df, "user_id", "ts", periodSec = 100L)
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // epoch p of t(k) = k (timestamps are k*100 s)
    assert(got == Map(
      (0L, 0L) -> 2L,  // u1+u2 at birth
      (0L, 1L) -> 1L,  // u1 back in p1 (deduped)
      (0L, 3L) -> 1L,  // u1 back in p3
      (1L, 0L) -> 1L,  // u3 at birth
      (1L, 1L) -> 1L)) // u3 back in p2
  }

  test("retentionMatrix: offset-0 row equals cohort size; conservation") {
    import java.sql.Timestamp
    val rnd = new scala.util.Random(11)
    val rows = (0 until 500).map { _ =>
      (rnd.nextInt(40).toLong, new Timestamp(rnd.nextInt(100000) * 1000L))
    }
    val df = rows.toDF("user_id", "ts")
    val got = Funnel.retentionMatrix(df, "user_id", "ts", periodSec = 7000L)
      .as[(Long, Long, Long)].collect()
    // every user appears in exactly one cohort's offset-0 cell
    assert(got.filter(_._2 == 0L).map(_._3).sum ==
      rows.map(_._1).distinct.size.toLong)
    // offsets never negative (first event defines the cohort)
    assert(got.forall(_._2 >= 0L))
  }

  test("transitionMatrix: hand-counted edges, shares sum to 1 per source") {
    // u1: A B A B   -> A>B, B>A, A>B
    // u2: A A C     -> A>A, A>C
    // u3: C         -> no edges
    val rows = Seq(
      (1L, "A", 0L, 1L), (1L, "B", 1L, 2L), (1L, "A", 2L, 3L),
      (1L, "B", 3L, 4L),
      (2L, "A", 0L, 5L), (2L, "A", 1L, 6L), (2L, "C", 2L, 7L),
      (3L, "C", 9L, 8L))
    val df = rows.map { case (u, t, sec, id) => (u, t, ts(sec), id) }
      .toDF("user_id", "event_type", "ts", "event_id")
    val got = Funnel.transitionMatrix(df, "user_id", "event_type",
      "ts", "event_id")
      .orderBy("from_type", "to_type")
      .as[(String, String, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      ("A", "A", 1L, 4L, 0.25), ("A", "B", 2L, 4L, 0.5),
      ("A", "C", 1L, 4L, 0.25), ("B", "A", 1L, 1L, 1.0)))
    // edge count conserves: events - users-with-events = edges
    assert(got.map(_._3).sum == rows.size - 3L)
  }

  test("transitionMatrix ties break by tieCol, not arrival order") {
    // two same-timestamp events: tie column decides which is 'first'
    val df = Seq(
      (1L, "X", ts(5), 2L), (1L, "Y", ts(5), 1L), (1L, "Z", ts(6), 3L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val got = Funnel.transitionMatrix(
      df.repartition(7), "user_id", "event_type", "ts", "event_id")
      .orderBy("from_type", "to_type")
      .as[(String, String, Long, Long, Double)].collect().toSeq
    // order is Y (id 1) -> X (id 2) -> Z (id 3)
    assert(got == Seq(("X", "Z", 1L, 1L, 1.0), ("Y", "X", 1L, 1L, 1.0)))
  }

  test("behaviorMotifs: hand-counted trigrams, tie order, short streams") {
    // u1: A B A B A -> ABA, BAB, ABA ; u2: A B A -> ABA ; u3: A B (none)
    val rows = Seq(
      (1L, "A", 0L), (1L, "B", 1L), (1L, "A", 2L), (1L, "B", 3L),
      (1L, "A", 4L),
      (2L, "A", 10L), (2L, "B", 11L), (2L, "A", 12L),
      (3L, "A", 20L), (3L, "B", 21L))
    val df = rows.zipWithIndex.map { case ((u, t, sec), i) =>
      (u, t, ts(sec), i.toLong) }
      .toDF("user_id", "event_type", "ts", "event_id")
    val got = Funnel.behaviorMotifs(df.repartition(5), "user_id",
      "event_type", "ts", "event_id", n = 3, k = 10)
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, "A>B>A", 3L, 0.75),
      (2L, "B>A>B", 1L, 0.25)))
    // n = 2 degenerates to transition counts
    val bi = Funnel.behaviorMotifs(df, "user_id", "event_type", "ts",
      "event_id", n = 2, k = 10)
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(bi.map(r => r._2 -> r._3).toMap ==
      Map("A>B" -> 4L, "B>A" -> 3L))
    intercept[IllegalArgumentException] {
      Funnel.behaviorMotifs(df, "user_id", "event_type", "ts",
        "event_id", n = 1)
    }
  }

  test("survivalCurve: hand-checked spans and >=-cumulative counts") {
    // spans: u1 0d (single event), u2 0d (same-day), u3 2d, u4 5d, u5 5d
    val rows = Seq(
      (1L, 0L), (2L, 3600L), (2L, 7200L),
      (3L, 0L), (3L, 2L * 86400L),
      (4L, 0L), (4L, 5L * 86400L),
      (5L, 86400L), (5L, 6L * 86400L))
    val df = rows.map { case (u, sec) => (u, ts(sec)) }
      .toDF("user_id", "t")
    val got = Funnel.survivalCurve(df.repartition(5), "user_id", "t")
      .orderBy("span_days")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (0L, 2L, 5L, 1.0),        // everyone survives >= 0 days
      (2L, 1L, 3L, 0.6),
      (5L, 2L, 2L, 0.4)))
    // survival is non-increasing in span
    assert(got.map(_._3) == got.map(_._3).sorted.reverse)
  }

  test("transitionEntropy: hand-checked H; deterministic flow is zero") {
    // u1: A B A C  -> edges A>B, B>A, A>C ; u2: A B -> A>B
    // from A: {B:2, C:1} -> H = -(2/3 ln 2/3 + 1/3 ln 1/3)
    // from B: {A:1} deterministic -> H = 0
    val rows = Seq(
      (1L, "A", 0L, 1L), (1L, "B", 1L, 2L), (1L, "A", 2L, 3L),
      (1L, "C", 3L, 4L),
      (2L, "A", 10L, 5L), (2L, "B", 11L, 6L))
    val df = rows.map { case (u, t, sec, id) => (u, t, ts(sec), id) }
      .toDF("user_id", "event_type", "ts", "event_id")
    val got = Funnel.transitionEntropy(df.repartition(5), "user_id",
      "event_type", "ts", "event_id")
      .orderBy("from_type")
      .as[(String, Long, Long, Double)].collect().toSeq
    val pB = 2.0 / 3.0; val pC = 1.0 / 3.0
    assert(got.map(_._1) == Seq("A", "B"))
    assert(got.head._2 == 2L && got.head._3 == 3L)
    assert(got.head._4 == -(pB * math.log(pB) + pC * math.log(pC)))
    assert(got(1)._4 == 0.0 && got(1)._2 == 1L)
    // entropy is maximal (ln k) for a uniform next distribution:
    // 30 users each do X -> {X,Y,Z} in equal proportion
    val uni = (0 until 30).flatMap { u =>
      Seq((u.toLong, "X", ts(u * 10L), u * 2L),
        (u.toLong, Seq("X", "Y", "Z")(u % 3), ts(u * 10L + 1),
          u * 2L + 1))
    }.toDF("user_id", "event_type", "ts", "event_id")
    val hx = Funnel.transitionEntropy(uni, "user_id", "event_type",
      "ts", "event_id")
      .filter(col("from_type") === "X").collect().head
    assert(hx.getLong(1) == 3L)
    assert(math.abs(hx.getDouble(3) - math.log(3.0)) < 1e-9)
  }

  test("lastTouchAttribution: most recent touch wins; gaps and direct nulls") {
    // u1: view(10) click(20) buy(30)      -> click, gap 10s
    // u2: buy(5) view(6)                  -> direct (no earlier touch)
    // u3: view(0) buy(100)                -> outside 50s window: null
    // u4: error(40) buy(41)               -> error not a touch: null
    val df = Seq(
      (1L, "view", 10L, 1L), (1L, "click", 20L, 2L), (1L, "buy", 30L, 3L),
      (2L, "buy", 5L, 4L), (2L, "view", 6L, 5L),
      (3L, "view", 0L, 6L), (3L, "buy", 100L, 7L),
      (4L, "error", 40L, 8L), (4L, "buy", 41L, 9L))
      .map { case (u, t, sec, id) => (u, t, ts(sec), id) }
      .toDF("user_id", "event_type", "ts", "event_id")
    val got = Funnel.lastTouchAttribution(df.repartition(5),
      "user_id", "event_type", "ts", "event_id",
      "buy", Seq("view", "click"), maxGapMicros = Some(50000000L))
      .orderBy("user_id")
      .as[(Long, Long, Long, Option[String], Option[Long], Option[Long])]
      .collect().toSeq
    assert(got == Seq(
      (1L, 3L, 30000000L, Some("click"), Some(20000000L), Some(10000000L)),
      (2L, 4L, 5000000L, None, None, None),
      (3L, 7L, 100000000L, None, None, None),
      (4L, 9L, 41000000L, None, None, None)))
    // without a gap limit, u3 attributes to its old view
    val open = Funnel.lastTouchAttribution(df, "user_id", "event_type",
      "ts", "event_id", "buy", Seq("view", "click"))
      .filter(col("user_id") === 3L)
      .as[(Long, Long, Long, Option[String], Option[Long], Option[Long])]
      .collect().head
    assert(open._4 == Some("view") && open._6 == Some(100000000L))
    // same-timestamp touch with a smaller tie id DOES count (order-strict)
    val tied = Seq((9L, "view", ts(7), 1L), (9L, "buy", ts(7), 2L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val t = Funnel.lastTouchAttribution(tied, "user_id", "event_type",
      "ts", "event_id", "buy", Seq("view"))
      .as[(Long, Long, Long, Option[String], Option[Long], Option[Long])]
      .collect().head
    assert(t._4 == Some("view") && t._6 == Some(0L))
    intercept[IllegalArgumentException] {
      Funnel.lastTouchAttribution(df, "user_id", "event_type", "ts",
        "event_id", "buy", Seq("buy", "view"))
    }
    intercept[IllegalArgumentException] {
      Funnel.lastTouchAttribution(df, "user_id", "event_type", "ts",
        "event_id", "buy", Nil)
    }
  }
}
