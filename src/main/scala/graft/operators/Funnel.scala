package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis over an event stream — "how many users
  * VIEWED, then CLICKED after viewing, then PURCHASED after
  * clicking" — the event-analytics query family (conversion funnels,
  * activation flows) built from the cascading-first-timestamp
  * pattern: step k's frame is the users whose earliest step-k event
  * STRICTLY FOLLOWS their step-(k−1) entry time. min() cascades make
  * the semantics order-exact without sorting whole user histories —
  * no window over a user's full event list, no sessionization
  * required.
  *
  * Scale shape: each step is filter(type) → per-user partial-agg min
  * → equi-join on user_id with the previous (already user-keyed,
  * strictly shrinking) frame. The event table is scanned once per
  * step with the type filter pushed to parquet; every shuffle is a
  * per-user aggregate that map-side-combines to one row per user per
  * partition. Funnels are short (a handful of steps); for unusually
  * deep ones persist the intermediate level frames — each is one
  * narrow (user, ts) row per surviving user.
  *
  * `maxGap` (microseconds) optionally bounds each step transition:
  * step k must land within gap of step k−1's entry. Strict `>`
  * ordering either way — simultaneous events do not advance a
  * funnel (deterministic, and the conservative reading of "then").
  *
  * Reference analog: chained filter+aggregate jobs — successive
  * `MapReduceMaster::MapReduce` submissions
  * (`Imagine_MapReduce/MapReduceMaster.cpp:36-58`). */
object Funnel {

  /** Per-user entry times, one column per reached step:
    * (user, ts_1, ..., ts_k) — rows only for users who completed
    * step 1; later columns null once the user falls out. Mostly a
    * spec surface; [[funnelCounts]] is the reporting face. */
  def funnelUsers(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String],
      maxGap: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "steps must be non-empty")
    val e = events.select(col(userCol).as("user"),
      col(typeCol).as("typ"), col(tsCol).as("ts"))
    var acc = e.filter(col("typ") === steps.head)
      .groupBy("user").agg(min("ts").as("ts_1"))
    var k = 2
    steps.tail.foreach { step =>
      val prevTs = col(s"ts_${k - 1}")
      val within: Column = maxGap match {
        case Some(g) =>
          col("ts") > prevTs &&
            col("ts") <= prevTs + expr(s"INTERVAL $g MICROSECOND")
        case None => col("ts") > prevTs
      }
      val next = e.filter(col("typ") === step)
        .join(acc, Seq("user"))
        .filter(within)
        .groupBy("user").agg(min(col("ts")).as(s"ts_$k"))
        .select(col("user"), col(s"ts_$k"))
      acc = acc.join(next, Seq("user"), "left")
      k += 1
    }
    acc
  }

  /** The funnel report: (step, event_type, users) — users counts how
    * many completed steps 1..k in order. Monotonically non-increasing
    * by construction. ONE pass over the level frame: count(ts_k)
    * skips nulls, so every step's survivor count comes out of a
    * single aggregate row, unpivoted to rows map-side. */
  def funnelCounts(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String],
      maxGap: Option[Long] = None): DataFrame = {
    val levels = funnelUsers(events, userCol, typeCol, tsCol, steps, maxGap)
    val one = levels.agg(
      count(col("ts_1")).as("c_1"),
      steps.indices.tail.map(i => count(col(s"ts_${i + 1}")).as(s"c_${i + 1}")): _*)
    one.select(explode(array(steps.zipWithIndex.map { case (name, i) =>
      struct(lit(i + 1L).as("step"), lit(name).as("event_type"),
        col(s"c_${i + 1}").as("users"))
    }: _*)).as("r"))
      .select("r.*").orderBy("step")
  }

  /** Retention cohort matrix — the OTHER event-analytics staple (the
    * funnel asks "did they progress through steps"; retention asks
    * "did they come back"): users bucket by the period of their FIRST
    * event (the cohort), and cell (cohort, offset) counts the
    * distinct cohort members active `offset` periods later. Period =
    * `periodSec`-second buckets of epoch time (weeks = 604800), so
    * boundaries are pure integer arithmetic any engine reproduces —
    * no calendar functions, whose week-numbering conventions differ
    * across engines.
    *
    * Scale shape: first-event times are one per-user partial-agg min
    * (the q113 discipline); activity collapses to DISTINCT
    * (user, period) BEFORE the cohort join, so the join input is
    * bounded by users × active-periods, not events; the final count
    * is a partial-agg groupBy on (cohort, offset). The event table
    * is never shuffled whole. Output: (cohort_period, period_offset,
    * n_users) with offset 0 = the cohort's size-at-birth row. */
  def retentionMatrix(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      periodSec: Long = 604800L): DataFrame = {
    require(periodSec > 0, s"periodSec must be positive, got $periodSec")
    val period = expr(
      s"(unix_micros($tsCol) div 1000000) div $periodSec")
    val firsts = events
      .select(col(userCol).as("_u"), period.as("_p"))
      .groupBy("_u").agg(min(col("_p")).as("_cohort"))
    val active = events
      .select(col(userCol).as("_u"), period.as("_p"))
      .distinct()
    active.join(firsts, Seq("_u"))
      .groupBy(col("_cohort").as("cohort_period"),
        (col("_p") - col("_cohort")).as("period_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** First-order transition matrix over each user's event stream —
    * "after a VIEW, what happens next, and with what probability" —
    * the Markov-chain summary behind next-action models, anomaly
    * detection on flows, and UX funnel discovery (where [[funnelCounts]]
    * checks ONE hypothesized path, this surfaces ALL observed edges).
    *
    * Scale shape: one user-partitioned lag window (each user's
    * history sorts once within its partition — never a global
    * window), then the (from, to) pairs partial-aggregate to edge
    * counts; the per-source totals are a second tiny aggregate over
    * the EDGE frame (states², not events) joined back broadcast.
    * `share` = n / from_total is one IEEE division of exact counts —
    * bitwise cross-engine. Ordering ties within a user break by
    * `tieCol` so every stream is total and the matrix deterministic.
    *
    * Reference analog: sum-by-key over adjacent-pair keys — the pair
    * EXTRACTION (lag over a per-user ordered stream) is the part the
    * reference's sort-merge reduce cannot express. */
  /** Last-touch attribution — for every conversion event, the most
    * recent earlier touchpoint from `touchTypes` by the same user
    * (optionally within `maxGapMicros`): the report that answers
    * "what drove this purchase" and feeds channel weighting. Where
    * [[funnelCounts]] aggregates one hypothesized path and
    * [[transitionMatrix]] aggregates all edges, attribution keeps
    * ROW-level provenance: one output row per conversion, joined to
    * its winning touch.
    *
    * Spelling: ONE user-partitioned window — running
    * `last(<touch fields>, ignoreNulls)` over the user's stream
    * ordered by (ts, tie) with frame ending at the PREVIOUS row, so
    * a touch at the conversion's own position never self-attributes
    * and ordering is total (ties break by `tieCol`; a same-timestamp
    * touch with a smaller tie value does count — order-strict, the
    * deterministic reading). No join, no per-conversion scan; the
    * stream sorts once per user. Conversions with no in-window touch
    * emit with null attribution (the "direct/unattributed" row a
    * real report must surface, not drop).
    *
    * Output: (user, tie, conv_us, touch_type, touch_us, gap_us).
    *
    * Reference analog: none — position-sensitive per-row state over
    * a sorted stream is exactly what sum-by-key cannot express
    * (`Imagine_MapReduce/MapReduceUtil.cpp:114-135`). */
  def lastTouchAttribution(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      tieCol: String,
      conversionType: String,
      touchTypes: Seq[String],
      maxGapMicros: Option[Long] = None): DataFrame = {
    require(touchTypes.nonEmpty, "at least one touch type required")
    require(!touchTypes.contains(conversionType),
      s"conversion type $conversionType cannot also be a touch type " +
        "(self-attribution would depend on tie order)")
    maxGapMicros.foreach(g => require(g > 0, s"maxGapMicros must be > 0, got $g"))
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val isTouch = col(typeCol).isin(touchTypes.map(_.asInstanceOf[Any]): _*)
    val us = expr(s"unix_micros($tsCol)")
    val attributed = events
      .select(col(userCol), col(typeCol), col(tsCol), col(tieCol))
      .withColumn("_touch_us",
        last(when(isTouch, us), ignoreNulls = true).over(w))
      .withColumn("_touch_type",
        last(when(isTouch, col(typeCol)), ignoreNulls = true).over(w))
      .filter(col(typeCol) === conversionType)
      .withColumn("conv_us", us)
      .withColumn("_gap", col("conv_us") - col("_touch_us"))
    val inWindow = maxGapMicros match {
      case Some(g) => col("_touch_us").isNotNull && col("_gap") <= g
      case None => col("_touch_us").isNotNull
    }
    attributed.select(
      col(userCol), col(tieCol), col("conv_us"),
      when(inWindow, col("_touch_type")).as("touch_type"),
      when(inWindow, col("_touch_us")).as("touch_us"),
      when(inWindow, col("_gap")).as("gap_us"))
  }

  /** User survival curve — for every observed activity span s (days
    * between a user's first and last event), how many users lasted
    * AT LEAST that long: the retention summary behind "half our
    * users are gone within N days". The distribution complement of
    * [[retentionMatrix]] (which buckets by calendar cohort; this
    * marginalizes cohorts out).
    *
    * Exact and windowless-at-scale: spans are one per-user min/max
    * partial agg; the ≥-cumulative over the spans frame (distinct
    * spans, tiny) runs through [[Skew.cumulativeCounts]]'s two-phase
    * bucket spelling — n_surviving(s) = total − cnt_le(s) + cnt(s).
    * survival_frac is one IEEE division of exact counts.
    *
    * Output: (span_days, n_users, n_surviving, survival_frac), one
    * row per observed span, span 0 = single-event users. */
  def survivalCurve(
      events: DataFrame,
      userCol: String,
      tsCol: String): DataFrame = {
    val day = datediff(col(tsCol).cast("date"),
      to_date(lit("1970-01-01"))).cast("long")
    val spans = events
      .select(col(userCol).as("_u"), day.as("_d"))
      .groupBy("_u")
      .agg((max(col("_d")) - min(col("_d"))).as("_v"))
      .groupBy("_v").agg(count(lit(1)).as("_cnt"))
    val cum = Skew.cumulativeCounts(spans, 64)
    val total = spans.agg(sum("_cnt").as("_n"))
    cum.crossJoin(broadcast(total))
      .select(col("_v").as("span_days"), col("_cnt").as("n_users"),
        (col("_n") - col("_cum") + col("_cnt")).as("n_surviving"),
        expr("CAST(_n - _cum + _cnt AS DOUBLE) / CAST(_n AS DOUBLE)")
          .as("survival_frac"))
  }

  /** Transition entropy per source state — how PREDICTABLE each
    * state's next step is: H = −Σ p·ln p over the outgoing
    * transition distribution. H ≈ 0 marks deterministic flows
    * (scripted bots, forced UI paths); H near ln(out-degree) marks
    * uniform wandering. The one-number summary a monitoring
    * dashboard wants on top of [[transitionMatrix]]'s full matrix.
    *
    * Determinism: the edge frame is states²-bounded, so each state's
    * distribution is a BOUNDED list — shares (exact-count divisions)
    * fold in to_type-sorted order through a sequential UDF, the q94
    * precedent for cross-engine libm-parity ln sums.
    *
    * Output: (from_type, n_next_types, from_total, entropy) —
    * entropy in nats. */
  def transitionEntropy(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      tieCol: String): DataFrame = {
    val edges = transitionMatrix(events, userCol, typeCol, tsCol, tieCol)
    edges.groupBy("from_type")
      .agg(count(lit(1)).as("n_next_types"),
        first(col("from_total")).as("from_total"),
        sort_array(collect_list(struct(col("to_type"), col("share"))))
          .as("_ps"))
      .withColumn("entropy",
        -entropySumUdf(transform(col("_ps"), p => p.getField("share"))))
      .select(col("from_type"), col("n_next_types"), col("from_total"),
        col("entropy"))
  }

  /** Sequential Σ p·ln(p) over the bounded, already-sorted share
    * list (p = 0 cannot occur: edges exist only with n ≥ 1). */
  private val entropySumUdf = udf((ps: scala.collection.Seq[Double]) => {
    var s = 0.0
    ps.foreach(p => s += p * math.log(p))
    s
  })

  /** Top-k behavioral motifs — the most frequent length-`n` event-type
    * sequences users actually perform (consecutive by the user's own
    * (ts, tie) order): the discovery complement of
    * [[transitionMatrix]] (first-order edges) for n > 2, feeding
    * funnel hypotheses, bot signatures ("view>view>view" at machine
    * cadence), and UX path mining.
    *
    * Shape: a lag CHAIN on one user-partitioned window (n−1 lags,
    * one sort), motif = the '>'-joined types where the oldest lag is
    * present (streams shorter than n emit nothing), then a
    * motif-keyed partial agg, a bounded TakeOrdered top-k, and
    * [[Ranks.rankBounded]] — no global window. `share` (of all
    * length-n windows corpus-wide) rides from a broadcast single-row
    * total: exact counts, one IEEE division.
    *
    * Ties in count break by motif text so the k-cutoff is total and
    * deterministic. Output: (rank, motif, n_occurrences, share). */
  def behaviorMotifs(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      tieCol: String,
      n: Int = 3,
      k: Int = 20): DataFrame = {
    require(n >= 2 && n <= 8, s"motif length must be in [2, 8], got $n")
    require(k >= 1 && k <= 10000, s"k must be in [1, 10000], got $k")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    val withLags = (1 until n).foldLeft(
      events.select(col(userCol), col(typeCol), col(tsCol), col(tieCol))) {
      case (d, i) => d.withColumn(s"_l$i", lag(col(typeCol), i).over(w))
    }
    val parts = (n - 1 to 1 by -1).map(i => col(s"_l$i")) :+ col(typeCol)
    val motifs = withLags
      .filter(col(s"_l${n - 1}").isNotNull)
      .select(concat_ws(">", parts: _*).as("motif"))
      .groupBy("motif").agg(count(lit(1)).as("n_occurrences"))
    val total = motifs.agg(sum("n_occurrences").as("_t"))
    val top = motifs
      .orderBy(col("n_occurrences").desc, col("motif")).limit(k)
    Ranks.rankBounded(top, col("n_occurrences").desc, col("motif"))
      .crossJoin(broadcast(total))
      .select(col("rank"), col("motif"), col("n_occurrences"),
        (col("n_occurrences").cast("double") / col("_t").cast("double"))
          .as("share"))
  }

  def transitionMatrix(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    val edges = events
      .select(col(userCol), col(typeCol).as("to_type"),
        col(tsCol), col(tieCol))
      .withColumn("from_type", lag(col("to_type"), 1).over(w))
      .filter(col("from_type").isNotNull)
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
    val totals = edges.groupBy("from_type")
      .agg(sum(col("n")).as("from_total"))
    edges.join(broadcast(totals), "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        col("from_total"),
        (col("n").cast("double") / col("from_total").cast("double"))
          .as("share"))
  }
}
