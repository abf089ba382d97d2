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
}
