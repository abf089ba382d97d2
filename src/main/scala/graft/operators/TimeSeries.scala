package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixed-interval time-series resampling with gap fill — the shape a
  * metrics/telemetry corpus needs before any windowed model or drift
  * monitor can consume it: raw events arrive at irregular
  * timestamps; the consumer wants one row per (key, interval) with
  * empty intervals PRESENT (count 0) and gauge values carried
  * forward from the last observation. The reference engine's
  * aggregation stops at sum-by-key over observed keys
  * (`Imagine_MapReduce/MapReduceUtil.cpp:114-135`); materializing the holes is
  * what resampling adds.
  *
  * Scale shape: one (key, bucket) partial-aggregated shuffle over
  * the raw events; the dense grid is generated from the PER-KEY SPAN
  * ROWS (one row per key — `sequence` + `explode`, never a cross
  * join against a calendar table), so grid cost is output-sized, and
  * a loud `maxBucketsPerKey` guard (narrow span aggregate) rejects a
  * step so fine the grid would dwarf the data. The forward fill is a
  * key-partitioned running `last(ignoreNulls)` window — never
  * global. The gauge is `max` per bucket (order-free), so results
  * are bitwise cross-engine; means over doubles would be
  * summation-order-dependent. */
object TimeSeries {

  /** Resample `df` to `stepSec`-second buckets per `keyCols`:
    * `(keyCols..., bucket_s, value, n_obs)` — one row per key per
    * step from the key's first observed bucket to its last, `n_obs`
    * the event count in that bucket (0 for gaps), `value` the max
    * observed `valueCol` in the bucket, forward-filled across gaps
    * (the first bucket of every key is observed by construction, so
    * `value` is never null). */
  def resampleFill(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      valueCol: String,
      stepSec: Long,
      maxBucketsPerKey: Long = 10000000L): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    require(stepSec > 0, s"stepSec must be positive, got $stepSec")
    // every non-key input column is aliased or dropped by the
    // explicit selects below (valueCol becomes `value`, tsCol becomes
    // `bucket_s`), so only the KEY columns ride through by name and
    // may not collide with the output/intermediate names
    Seq("bucket_s", "value", "n_obs", "_b0", "_b1", "_v").foreach { r =>
      require(!keyCols.contains(r),
        s"key column name $r is reserved by resampleFill")
    }
    val keyC = keyCols.map(col)
    // integer `div` all the way down: epoch micros -> seconds ->
    // bucket floor. Fractional division would round-trip through
    // double and lose the low digits cross-engine.
    val bucket = (expr(
      s"(unix_micros($tsCol) div 1000000) div $stepSec") * stepSec)
      .as("bucket_s")
    val obs = df
      .select(keyC :+ bucket :+ col(valueCol).as("_v"): _*)
      .groupBy(keyC :+ col("bucket_s"): _*)
      .agg(max(col("_v")).as("_v"), count(lit(1)).as("n_obs"))
    val span = obs.groupBy(keyC: _*)
      .agg(min("bucket_s").as("_b0"), max("bucket_s").as("_b1"))
    // loud guard before any grid row exists: the span frame is one
    // row per key, so this aggregate is narrow
    val worst = span
      .agg(max(expr(s"(_b1 - _b0) div $stepSec")))
      .head().getAs[Any](0)
    worst match {
      case n: Long => require(n < maxBucketsPerKey,
        s"resampleFill at step=${stepSec}s would generate $n buckets " +
          s"for one key — exceeds maxBucketsPerKey=$maxBucketsPerKey. " +
          "Coarsen the step or raise the bound deliberately")
      case _ => // empty input: nothing to guard
    }
    val grid = span.select(keyC :+ explode(
      sequence(col("_b0"), col("_b1"), lit(stepSec))).as("bucket_s"): _*)
    val fillW = Window.partitionBy(keyC: _*).orderBy("bucket_s")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, keyCols :+ "bucket_s", "left")
      .select(keyC ++ Seq(
        col("bucket_s"),
        last(col("_v"), ignoreNulls = true).over(fillW).as("value"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs")): _*)
  }

  /** Changelog → SCD2 dimension history: collapse each key's
    * attribute stream into validity PERIODS — one row per run of
    * consecutive equal `attrCol` values, with `[valid_from_us,
    * valid_to_us)` bounds, the event count inside the run, and an
    * `is_current` flag on the open period. The classic
    * slowly-changing-dimension type-2 build, and the temporal
    * complement of [[Profile.snapshotDiff]]: diff reconciles two
    * snapshots, this materializes the full history BETWEEN snapshots
    * from the raw change stream.
    *
    * Gaps-and-islands by VALUE CHANGE (where sessionization cuts on
    * time gaps): change flag = null-safe lag comparison, run id =
    * running sum of flags, periods = one grouped aggregate, bounds =
    * a lead over the per-key period rows. Every window is
    * key-partitioned — never global — and the period frame the lead
    * runs on is runs-sized, not events-sized. Ordering ties break by
    * `tieCol` so the history is total and deterministic; timestamps
    * emit as epoch micros (exact integers cross-engine). */
  /** Trailing time-RANGE rolling aggregate: for every input row, the
    * sum and count of `valueCol` over the key's rows in the closed
    * day interval `[day - (windowDays-1), day]` — the "trailing
    * 30-day spend per customer" shape every activity feature store
    * needs. A ROWS frame cannot express it (peers on the same day
    * must all enter the frame, and empty days must still age rows
    * out); this is the one window shape that genuinely needs
    * `rangeBetween`, so the frame runs on an integer epoch-day key
    * derived from `timeCol` (date semantics in the session zone, UTC
    * here).
    *
    * Scale shape: ONE key-partitioned range window — Spark sorts
    * each key's partition by day once and slides the frame in a
    * single pass (frame start/end advance monotonically; no
    * per-row rescan), so cost is a shuffle on `keyCols` plus a
    * per-partition sort, the same bill as any windowed feature.
    * Never global: the partition spec is required, and ties within a
    * (key, day) are frame-PEERS (all included) so the result is
    * total-order-independent. `valueCol` must be integral (enforced)
    * — a double sum's value would depend on intra-frame add order
    * and could not be pinned cross-engine; callers convert currency
    * to cents first (`floor(x*100+0.5)`, bitwise on both engines).
    *
    * Reference analog: the reduce sums whole key groups only
    * (`Imagine_MapReduce/MapReduceUtil.cpp:114-135`); a trailing
    * window over event time has no spelling there at all. */
  def trailingWindow(
      df: DataFrame,
      keyCols: Seq[String],
      timeCol: String,
      valueCol: String,
      windowDays: Int): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    require(windowDays > 0, s"windowDays must be positive, got $windowDays")
    Seq("day", "trail_sum", "trail_cnt").foreach { r =>
      require(!df.columns.contains(r),
        s"input column name $r is reserved by trailingWindow")
    }
    val vt = df.schema(valueCol).dataType
    require(Seq("long", "integer", "short", "byte").contains(vt.typeName),
      s"valueCol $valueCol must be integral for an order-independent " +
        s"frame sum, got ${vt.typeName}; convert currency to cents " +
        "(floor(x*100+0.5)) first")
    val keyC = keyCols.map(col)
    val day = datediff(col(timeCol).cast("date"),
      to_date(lit("1970-01-01"))).cast("long")
    val w = Window.partitionBy(keyC: _*).orderBy(col("day"))
      .rangeBetween(-(windowDays - 1).toLong, 0L)
    df.withColumn("day", day)
      .withColumn("trail_sum", sum(col(valueCol)).over(w))
      .withColumn("trail_cnt", count(lit(1)).over(w))
  }

  /** Time-travel lookup over a [[changeHistory]] result: the state of
    * every key AS OF `tsMicros` — the read side of the SCD2 story
    * (build history once, answer any point-in-time question from the
    * runs-sized table instead of re-scanning the changelog). A key
    * whose first period opens after `tsMicros` simply doesn't exist
    * yet and emits nothing. One filter over the period table: period
    * semantics are `[valid_from_us, valid_to_us)`, so the predicate
    * is `from <= t < coalesce(to, +inf)` — at most one row per key
    * by the non-overlap invariant changeHistory guarantees. */
  def snapshotAt(history: DataFrame, tsMicros: Long): DataFrame =
    history.filter(col("valid_from_us") <= tsMicros &&
      (col("valid_to_us").isNull || col("valid_to_us") > tsMicros))

  /** Trailing-window volume anomaly flags — "did this event type's
    * daily volume jump outside its own recent behavior": for every
    * (key, day), the day's count against the mean/variance of the
    * PREVIOUS `windowDays` days (current day excluded — it must not
    * contaminate its own baseline), flagged when it sits more than
    * 3 sample standard deviations out. The drop/spike pager for
    * ingest pipelines, built so both engines agree BITWISE: the
    * trailing moments (k, Σ, Σ²) are exact integers from a
    * key-partitioned RANGE window (gap-correct: absent days age out
    * by day value, not row position), and the 3σ test is squared
    * into `(k·x − Σ)²·(k−1) > 9·k·(k·Σ² − Σ²)` — evaluated as a
    * fixed sequence of IEEE products over exactly-cast integers, so
    * there is NO sqrt and no library seam. Days with fewer than
    * `minDays` of history emit `false` (insufficient baseline, not
    * an anomaly).
    *
    * Scale shape: one (key, day) partial-agg shuffle, then ONE
    * key-partitioned range window over the DAILY frame (days-sized,
    * not events-sized). Overflow contract, guarded loudly: per-day
    * counts must stay ≤ 10M and `windowDays` ≤ 60 so k·Σ² fits
    * 64 bits with margin — a corpus above that pre-aggregates to a
    * coarser key first (the guard is one narrow max over the daily
    * frame).
    *
    * Output: (key..., day, cnt, trail_days, trail_sum, mean,
    * is_anomaly); `mean` = Σ/k (one IEEE division, null when no
    * history). */
  def volumeAnomaly(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      windowDays: Int = 7,
      minDays: Int = 5): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    require(windowDays >= 1 && windowDays <= 60,
      s"windowDays must be in [1, 60] (overflow contract), got $windowDays")
    require(minDays >= 2 && minDays <= windowDays,
      s"minDays must be in [2, windowDays], got $minDays")
    Seq("day", "cnt", "trail_days", "trail_sum", "mean", "is_anomaly")
      .foreach { r =>
        require(!keyCols.contains(r),
          s"key column name $r is reserved by volumeAnomaly")
      }
    val keyC = keyCols.map(col)
    val day = datediff(col(tsCol).cast("date"),
      to_date(lit("1970-01-01"))).cast("long")
    val daily = df
      .select(keyC :+ day.as("day"): _*)
      .groupBy(keyC :+ col("day"): _*)
      .agg(count(lit(1)).as("cnt"))
    val worst = daily.agg(max("cnt")).head().getAs[Any](0)
    worst match {
      case n: Long => require(n <= 10000000L,
        s"volumeAnomaly: a (key, day) cell holds $n rows — beyond the " +
          "10M overflow contract for the squared-sigma test; " +
          "pre-aggregate to a coarser key")
      case _ => // empty input
    }
    val w = Window.partitionBy(keyC: _*).orderBy(col("day"))
      .rangeBetween(-windowDays.toLong, -1L)
    daily
      .withColumn("trail_days", count(col("cnt")).over(w))
      .withColumn("trail_sum", sum(col("cnt")).over(w))
      .withColumn("_ssq", sum(col("cnt") * col("cnt")).over(w))
      .withColumn("trail_days", coalesce(col("trail_days"), lit(0L)))
      .withColumn("trail_sum", coalesce(col("trail_sum"), lit(0L)))
      .withColumn("_ssq", coalesce(col("_ssq"), lit(0L)))
      .withColumn("mean",
        when(col("trail_days") > 0,
          expr("CAST(trail_sum AS DOUBLE) / CAST(trail_days AS DOUBLE)")))
      .withColumn("is_anomaly",
        when(col("trail_days") >= minDays,
          expr("CAST(trail_days * cnt - trail_sum AS DOUBLE) " +
            "* CAST(trail_days * cnt - trail_sum AS DOUBLE) " +
            "* CAST(trail_days - 1 AS DOUBLE) " +
            "> 9.0 * CAST(trail_days AS DOUBLE) " +
            "* CAST(trail_days * _ssq - trail_sum * trail_sum AS DOUBLE)"))
          .otherwise(lit(false)))
      .drop("_ssq")
  }

  /** Inter-arrival time profile — exact disc quantiles of the gap
    * between a user's consecutive events of each type: the cadence
    * fingerprint behind bot detection (machine-regular gaps),
    * session-timeout calibration (where does the p90 gap sit), and
    * capacity planning. Medians, not means: one parked session would
    * drag a mean gap arbitrarily; the quantiles are rank arithmetic
    * over exact integer microsecond deltas — bitwise cross-engine,
    * no interpolation convention.
    *
    * Shape: deltas from ONE (seq, key)-partitioned lag window
    * (each user's per-type stream sorts once; ties break by
    * `tieCol`), then the [[graft.operators.Features.winsorize]]-style
    * quantile ladder: distinct (key, delta) counts, key-partitioned
    * cumsum, per-key totals, and the requested percentiles ride in
    * as an exploded literal frame joined on `cum ≥ ceil(p·n/100)`.
    * Long-format output — (key..., pct, n_gaps, gap_us) — so any
    * percentile list works without schema games. */
  def interArrivalProfile(
      df: DataFrame,
      keyCols: Seq[String],
      seqCols: Seq[String],
      tsCol: String,
      tieCol: String,
      pcts: Seq[Int] = Seq(50, 90)): DataFrame = {
    require(keyCols.nonEmpty && seqCols.nonEmpty,
      "key and sequence columns are both required")
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      s"percentiles must be in [1,100], got $pcts")
    require(pcts.distinct.size == pcts.size, s"duplicate percentiles: $pcts")
    val keyC = keyCols.map(col)
    val w = Window.partitionBy((seqCols ++ keyCols).map(col): _*)
      .orderBy(col(tsCol), col(tieCol))
    val us = expr(s"unix_micros($tsCol)")
    val deltas = df
      .select((seqCols ++ keyCols).map(col) :+ col(tsCol) :+ col(tieCol): _*)
      .withColumn("_us", us)
      .withColumn("_delta", col("_us") - lag(col("_us"), 1).over(w))
      .filter(col("_delta").isNotNull)
    val counts = deltas.groupBy(keyC :+ col("_delta"): _*)
      .agg(count(lit(1)).as("_cnt"))
    val wc = Window.partitionBy(keyC: _*).orderBy(col("_delta"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = counts.withColumn("_cum", sum(col("_cnt")).over(wc))
    val targets = deltas.groupBy(keyC: _*)
      .agg(count(lit(1)).as("n_gaps"))
      .select(keyC :+ col("n_gaps") :+
        explode(array(pcts.map(p => lit(p.toLong)): _*)).as("pct"): _*)
      .withColumn("_r",
        greatest(lit(1L), expr("(pct * n_gaps + 99) div 100")))
    cum.join(targets, keyCols)
      .filter(col("_cum") >= col("_r"))
      .groupBy(keyC ++ Seq(col("pct"), col("n_gaps")): _*)
      .agg(min(col("_delta")).as("gap_us"))
  }

  /** Period-over-period change — each (key, day)'s count against the
    * SAME key exactly `lagDays` earlier (the week-over-week /
    * day-over-day ops report): absolute and relative change, with
    * the honest nulls a real report needs (no prior period → null;
    * prior period zero → null pct, the division nobody can define).
    *
    * Shape: the days-sized daily frame LEFT-equi-joins itself on
    * (key, day − lagDays) — a plain hash/sort-merge join, no window
    * anywhere, no range predicate. Days present now but absent
    * `lagDays` ago surface with null prev (new keys, gaps);
    * disappeared days are the caller's complementary query with
    * sides swapped. pct_change = (cnt − prev)/prev as one fixed IEEE
    * sequence over exact counts.
    *
    * Output: (key..., day, cnt, prev_cnt, abs_change, pct_change). */
  def periodOverPeriod(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      lagDays: Int = 7): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    require(lagDays >= 1, s"lagDays must be >= 1, got $lagDays")
    Seq("day", "cnt", "prev_cnt", "abs_change", "pct_change").foreach { r =>
      require(!keyCols.contains(r),
        s"key column name $r is reserved by periodOverPeriod")
    }
    val keyC = keyCols.map(col)
    val day = datediff(col(tsCol).cast("date"),
      to_date(lit("1970-01-01"))).cast("long")
    val daily = df
      .select(keyC :+ day.as("day"): _*)
      .groupBy(keyC :+ col("day"): _*)
      .agg(count(lit(1)).as("cnt"))
    val prev = daily.select(
      keyC ++ Seq((col("day") + lagDays).as("day"),
        col("cnt").as("prev_cnt")): _*)
    daily.join(prev, keyCols :+ "day", "left")
      .withColumn("abs_change", col("cnt") - col("prev_cnt"))
      .withColumn("pct_change",
        when(col("prev_cnt").isNotNull && col("prev_cnt") =!= 0L,
          expr("CAST(cnt - prev_cnt AS DOUBLE) " +
            "/ CAST(prev_cnt AS DOUBLE)")))
  }

  /** Hour-of-day × day-of-week activity profile — the seasonality
    * heatmap behind load forecasting, anomaly context ("is Monday
    * 9am always like this"), and bot screening (humans have a
    * circadian signature, scripts don't). Day-of-week comes from
    * PURE INTEGER arithmetic — (epoch_day + 4) mod 7, 0 = Sunday —
    * never from a calendar function, whose week-numbering and
    * zero-point conventions differ across engines; hours are UTC
    * integer division on epoch micros.
    *
    * Shape: one (key, dow, hour) partial-agg shuffle; per-key totals
    * over the 168-cells-per-key frame ride back broadcast; `share`
    * is one IEEE division of exact counts. Only observed cells emit.
    *
    * Output: (key..., dow, hour, n, share). */
  def activityProfile(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    Seq("dow", "hour", "n", "share", "_t").foreach { r =>
      require(!keyCols.contains(r),
        s"key column name $r is reserved by activityProfile")
    }
    val keyC = keyCols.map(col)
    // `div`, not `/`: epoch micros can't survive a double round-trip
    val cells = df
      .select(keyC ++ Seq(
        expr(s"((unix_micros($tsCol) div 86400000000) + 4) % 7")
          .as("dow"),
        expr(s"(unix_micros($tsCol) div 3600000000) % 24").as("hour")): _*)
      .groupBy(keyC ++ Seq(col("dow"), col("hour")): _*)
      .agg(count(lit(1)).as("n"))
    val totals = cells.groupBy(keyC: _*).agg(sum("n").as("_t"))
    cells.join(broadcast(totals), keyCols)
      .select(keyC ++ Seq(col("dow"), col("hour"), col("n"),
        (col("n").cast("double") / col("_t").cast("double"))
          .as("share")): _*)
  }

  /** Trailing empirical percentile (PIT score) — where today's count
    * sits within its own trailing window's DISTRIBUTION: n_le/k,
    * the fraction of the previous `windowDays` observed days whose
    * count is ≤ today's. The nonparametric cousin of
    * [[volumeAnomaly]]: no variance model, exact by construction
    * (ties count as ≤, both endpoints integers, one IEEE division),
    * and readable directly as "today is a p98 day".
    *
    * Shape: the daily frame self-joins on KEY EQUALITY plus the
    * bounded day-range predicate — an equi-join with a range filter
    * (SortMergeJoin, never a nested loop; PlanHygieneSpec pins it),
    * fan-out ≤ `windowDays` per row by construction, left-preserved
    * so warm-up days emit with `trail_days` = 0 and null `pit`.
    * Everything runs on the days-sized aggregate, not raw events. */
  def trailingPercentile(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      windowDays: Int = 30): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    require(windowDays >= 1 && windowDays <= 370,
      s"windowDays must be in [1, 370], got $windowDays")
    Seq("day", "cnt", "trail_days", "n_le", "pit").foreach { r =>
      require(!keyCols.contains(r),
        s"key column name $r is reserved by trailingPercentile")
    }
    val keyC = keyCols.map(col)
    val day = datediff(col(tsCol).cast("date"),
      to_date(lit("1970-01-01"))).cast("long")
    val daily = df
      .select(keyC :+ day.as("day"): _*)
      .groupBy(keyC :+ col("day"): _*)
      .agg(count(lit(1)).as("cnt"))
    val a = daily.as("a")
    val b = daily.as("b")
    val keysEq = keyCols.map(k => col(s"a.$k") === col(s"b.$k"))
      .reduce(_ && _)
    val inWindow = col("b.day") >= col("a.day") - windowDays &&
      col("b.day") <= col("a.day") - 1
    a.join(b, keysEq && inWindow, "left")
      .groupBy(keyCols.map(k => col(s"a.$k").as(k)) ++
        Seq(col("a.day").as("day"), col("a.cnt").as("cnt")): _*)
      .agg(count(col("b.cnt")).as("trail_days"),
        sum(when(col("b.cnt") <= col("a.cnt"), 1L).otherwise(0L))
          .as("n_le"))
      .withColumn("n_le",
        when(col("trail_days") > 0, coalesce(col("n_le"), lit(0L))))
      .withColumn("pit",
        when(col("trail_days") > 0,
          expr("CAST(n_le AS DOUBLE) / CAST(trail_days AS DOUBLE)")))
  }

  /** Per-group ordinary-least-squares trend line — "is this source's
    * daily volume growing or shrinking, and how fast" — fitted from
    * the five EXACT integer moment sums (n, Σx, Σy, Σx², Σxy, Σy²)
    * so the result is bitwise reproducible cross-engine: integer
    * sums are order-free, and the slope / intercept / r² that follow
    * are each a FIXED, documented sequence of IEEE-754 operations
    * over those exact sums (one cast per operand, one multiply, one
    * divide — mirrored verbatim in the SQL oracle). The usual
    * `regr_slope`-style streaming-covariance aggregate would NOT
    * pin cross-engine: its running doubles depend on partial-agg
    * order.
    *
    * Scale shape: one partial-aggregated shuffle on `keyCols` — six
    * BIGINT sums per group, map-side combined, no window, no second
    * pass. Both `xCol` and `yCol` must be integral (enforced):
    * double inputs would make Σ order-dependent. Overflow contract
    * (documented, caller-owned): |Σx·Σy| and n·Σxy must fit in 64
    * bits — rebase x (e.g. days since corpus start, not epoch days)
    * when magnitudes threaten; DuckDB's HUGEINT accumulation masks
    * overflow the Spark side would wrap on, so the fixture keeps
    * well inside the range and the guard rails live in the caller.
    *
    * Outputs per group: `n`, the exact sums, `slope`
    * = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²), `intercept`
    * = (Σy − slope·Σx) / n, and `r2` = num² / (den·(n·Σy² − Σy²)) —
    * NULL when x (or y, for r²) is constant in the group.
    *
    * Reference analog: sum-by-key
    * (`Imagine_MapReduce/MapReduceUtil.cpp:114-135`) — the moment
    * sums ARE sum-by-key; the line fit is three scalar
    * expressions on top. */
  def groupTrend(
      df: DataFrame,
      keyCols: Seq[String],
      xCol: String,
      yCol: String): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    Seq("n", "sx", "sy", "sxx", "sxy", "syy", "slope", "intercept", "r2")
      .foreach { r =>
        require(!keyCols.contains(r),
          s"key column name $r is reserved by groupTrend")
      }
    Seq(xCol, yCol).foreach { c =>
      val t = df.schema(c).dataType.typeName
      require(Seq("long", "integer", "short", "byte").contains(t),
        s"$c must be integral for exact order-free moment sums, got $t")
    }
    val keyC = keyCols.map(col)
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    val moments = df
      .select(keyC ++ Seq(x.as("_x"), y.as("_y")): _*)
      .groupBy(keyC: _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col("_x")).as("sx"),
        sum(col("_y")).as("sy"),
        sum(col("_x") * col("_x")).as("sxx"),
        sum(col("_x") * col("_y")).as("sxy"),
        sum(col("_y") * col("_y")).as("syy"))
    // the exact-integer numerators/denominators; NULLIF turns the
    // degenerate (constant-x / constant-y) groups into NULL fits
    moments
      .withColumn("slope",
        expr("CAST(n * sxy - sx * sy AS DOUBLE) " +
          "/ CAST(NULLIF(n * sxx - sx * sx, 0) AS DOUBLE)"))
      .withColumn("intercept",
        expr("(CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE)) " +
          "/ CAST(n AS DOUBLE)"))
      .withColumn("r2",
        expr("(CAST(n * sxy - sx * sy AS DOUBLE) " +
          "* CAST(n * sxy - sx * sy AS DOUBLE)) " +
          "/ (CAST(NULLIF(n * sxx - sx * sx, 0) AS DOUBLE) " +
          "* CAST(NULLIF(n * syy - sy * sy, 0) AS DOUBLE))"))
  }

  def changeHistory(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      attrCol: String,
      tieCol: String): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    Seq("value", "valid_from_us", "valid_to_us", "n_events", "is_current",
      "_chg", "_run", "_ts") .foreach { r =>
      require(!keyCols.contains(r),
        s"key column name $r is reserved by changeHistory")
    }
    val keyC = keyCols.map(col)
    val runs = df
      .select(keyC ++ Seq(col(tsCol).as("_ts"), col(tieCol).as("_tie"),
        col(attrCol).as("value")): _*)
      .withColumn("_chg",
        when(lag(col("value"), 1).over(
          Window.partitionBy(keyC: _*).orderBy(col("_ts"), col("_tie")))
          <=> col("value"), 0L).otherwise(1L))
      .withColumn("_run", sum(col("_chg")).over(
        Window.partitionBy(keyC: _*).orderBy(col("_ts"), col("_tie"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val periods = runs
      .groupBy(keyC ++ Seq(col("_run"), col("value")): _*)
      .agg(min(expr("unix_micros(_ts)")).as("valid_from_us"),
        count(lit(1)).as("n_events"))
    val perKey = Window.partitionBy(keyC: _*).orderBy("valid_from_us")
    periods
      .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(perKey))
      .withColumn("is_current", col("valid_to_us").isNull)
      .select(keyC ++ Seq(col("value"), col("valid_from_us"),
        col("valid_to_us"), col("n_events"), col("is_current")): _*)
  }

  /** CUSUM drift detection on daily event volume — the changepoint
    * screen that catches a slow upstream decay (a crawler quietly
    * losing a shard, a producer double-emitting) long before any
    * single day trips the 3σ spike test ([[volumeAnomaly]] is the
    * spike twin; CUSUM accumulates small same-signed deviations).
    *
    * EXACT INTEGER arithmetic throughout. The textbook recursion
    * S⁺_t = max(0, S⁺_{t−1} + x_t − μ − k) is not a prefix sum, but
    * its closed form is: S⁺_t = C_t − min_{j≤t} C_j with
    * C_t = Σ_{i≤t}(x_i − μ − k) and C_0 = 0. Scale everything by
    * 4n (n = the key's day count, S = its total): with allowance
    * k = μ/4 and in 4n units, C'_t = 4n·P_t − 5S·t where P_t is the
    * integer prefix count sum — a BIGINT. Both the running sum and
    * the running min are key-partitioned windows over the DAILY
    * frame; sums of integers are order-free, so the result is
    * deterministic and bitwise cross-engine. The only IEEE ops are
    * the two final normalizations `S±'/(4n·μ/n)` emitted for
    * readability — flags compare integers.
    *
    * Day grid: each key's [min_day, max_day] span is made gap-free
    * (`sequence` + explode, zero-filled) — a volume COLLAPSE is
    * precisely the case where days stop arriving, and a grid-less
    * spelling would never see them.
    *
    * Flags: `flag_pos` (volume drifted up) when S⁺'_t > 4·H·S, i.e.
    * S⁺_t > H·μ in day-count units; `flag_neg` symmetric.
    *
    * Overflow contract, guarded loudly: 5·S·n_days must fit 64 bits
    * with margin — per-key totals ≤ 1e11 events and spans ≤ 20k days.
    *
    * Output: (key..., day, cnt, cusum_pos, cusum_neg, flag_pos,
    * flag_neg) — cusum_± in μ units (DOUBLE, two fixed IEEE ops). */
  def cusumVolume(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      thresholdMu: Int = 3): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    require(thresholdMu >= 1 && thresholdMu <= 100,
      s"thresholdMu must be in [1, 100], got $thresholdMu")
    Seq("day", "cnt", "cusum_pos", "cusum_neg", "flag_pos", "flag_neg")
      .foreach { r =>
        require(!keyCols.contains(r),
          s"key column name $r is reserved by cusumVolume")
      }
    val keyC = keyCols.map(col)
    val day = datediff(col(tsCol).cast("date"),
      to_date(lit("1970-01-01"))).cast("long")
    val daily = df
      .select(keyC :+ day.as("day"): _*)
      .groupBy(keyC :+ col("day"): _*)
      .agg(count(lit(1)).as("cnt"))
    // Gap-free per-key grid: missing days are real zero-volume days.
    val span = daily.groupBy(keyC: _*)
      .agg(min("day").as("_d0"), max("day").as("_d1"),
        sum("cnt").as("_s"))
    val worst = span
      .agg(max(col("_s")).as("ms"),
        max(col("_d1") - col("_d0") + 1).as("md"))
      .head()
    if (!worst.isNullAt(0)) {
      val (ms, md) = (worst.getLong(0), worst.getLong(1))
      require(ms <= 100000000000L && md <= 20000L,
        s"cusumVolume: a key holds $ms events over $md days — beyond " +
          "the 5·S·n 64-bit overflow contract; pre-aggregate to a " +
          "coarser key or shorter span")
    }
    val grid = span
      .select(keyC ++ Seq(col("_s"),
        (col("_d1") - col("_d0") + 1L).as("_n"), explode(
          sequence(col("_d0"), col("_d1"))).as("day")): _*)
    val full = grid
      .join(daily, keyCols :+ "day", "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
    // n = gap-free grid day count, carried from the span agg; t =
    // 1-based position; P = integer prefix sum — one window pass.
    val wCum = Window.partitionBy(keyC: _*).orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withC = full
      .withColumn("_p", sum(col("cnt")).over(wCum))
      .withColumn("_t", count(lit(1)).over(wCum))
    // C'_t = 4n·P_t − 5S·t  (allowance k = μ/4, scaled by 4n);
    // D'_t = 3S·t − 4n·P_t  (downward twin, allowance μ/4).
    val withS = withC
      .withColumn("_cp", lit(4L) * col("_n") * col("_p")
        - lit(5L) * col("_s") * col("_t"))
      .withColumn("_cn", lit(3L) * col("_s") * col("_t")
        - lit(4L) * col("_n") * col("_p"))
      .withColumn("_mp",
        least(lit(0L), min(col("_cp")).over(wCum)))
      .withColumn("_mn",
        least(lit(0L), min(col("_cn")).over(wCum)))
      .withColumn("_sp", col("_cp") - col("_mp"))
      .withColumn("_sn", col("_cn") - col("_mn"))
    // S±' are in 4n units of day-counts; μ = S/n, so S±'/(4S) is the
    // CUSUM in μ units. Two fixed IEEE divisions, flags on integers.
    withS
      .withColumn("cusum_pos",
        when(col("_s") > 0,
          col("_sp").cast("double") / (lit(4.0) * col("_s").cast("double"))))
      .withColumn("cusum_neg",
        when(col("_s") > 0,
          col("_sn").cast("double") / (lit(4.0) * col("_s").cast("double"))))
      .withColumn("flag_pos",
        col("_sp") > lit(4L) * thresholdMu * col("_s"))
      .withColumn("flag_neg",
        col("_sn") > lit(4L) * thresholdMu * col("_s"))
      .select(keyC ++ Seq(col("day"), col("cnt"), col("cusum_pos"),
        col("cusum_neg"), col("flag_pos"), col("flag_neg")): _*)
  }

  /** Sample autocorrelation of daily event volume at lags 1..maxLag
    * per key — the seasonality fingerprint ([[activityProfile]] shows
    * WHERE the cycle sits; the ACF shows THAT one exists and how
    * strong): a weekly-cycled crawl shows a lag-7 spike, a drifting
    * producer decays slowly across all lags, white noise sits near
    * zero everywhere.
    *
    * EXACT INTEGER moments: with n = grid days and S = total events,
    * the centered value scaled by n is z_t = n·c_t − S (a BIGINT,
    * and Σz = 0 identically). Then
    * acf(k) = Σ_{t} z_t·z_{t+k} / Σ_t z_t² — both sums are integer
    * partial aggs (order-free, bitwise cross-engine) and the ratio
    * is the ONE IEEE division per (key, lag). The day grid is
    * gap-free (zero-filled) like [[cusumVolume]] — a silent day IS
    * part of the cycle.
    *
    * Overflow contract, guarded loudly: z² sums need
    * (n·max_daily)² · n within 63 bits — enforced as
    * n·max_daily ≤ 2_000_000 and n ≤ 20_000 (a corpus above that
    * pre-aggregates to a coarser key).
    *
    * Shape: one (key, day) partial agg, one span agg, one grid
    * explode, ONE lag equi-join (the lag list rides as a generated
    * column — no per-lag pass), two partial-agg sums. Keys with a
    * zero denominator (constant series) emit null acf.
    *
    * Output: (key..., lag, n_days, acf). */
  def autocorrelation(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      maxLag: Int = 7): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    require(maxLag >= 1 && maxLag <= 60,
      s"maxLag must be in [1, 60], got $maxLag")
    Seq("lag", "n_days", "acf", "day", "cnt").foreach { r =>
      require(!keyCols.contains(r),
        s"key column name $r is reserved by autocorrelation")
    }
    val keyC = keyCols.map(col)
    val day = datediff(col(tsCol).cast("date"),
      to_date(lit("1970-01-01"))).cast("long")
    val daily = df
      .select(keyC :+ day.as("day"): _*)
      .groupBy(keyC :+ col("day"): _*)
      .agg(count(lit(1)).as("cnt"))
    val span = daily.groupBy(keyC: _*)
      .agg(min("day").as("_d0"), max("day").as("_d1"),
        sum("cnt").as("_s"), max("cnt").as("_mc"))
    val worst = span
      .agg(max((col("_d1") - col("_d0") + 1) * col("_mc")).as("nm"),
        max(col("_d1") - col("_d0") + 1).as("nd"))
      .head()
    if (!worst.isNullAt(0)) {
      require(worst.getLong(0) <= 2000000L && worst.getLong(1) <= 20000L,
        s"autocorrelation: a key spans ${worst.getLong(1)} days with " +
          s"n*max_daily=${worst.getLong(0)} — beyond the z^2 64-bit " +
          "overflow contract; pre-aggregate to a coarser key")
    }
    val grid = span
      .select(keyC ++ Seq(col("_s"),
        (col("_d1") - col("_d0") + 1L).as("_n"), explode(
          sequence(col("_d0"), col("_d1"))).as("day")): _*)
    val z = grid
      .join(daily, keyCols :+ "day", "left")
      .withColumn("_z",
        col("_n") * coalesce(col("cnt"), lit(0L)) - col("_s"))
      .select(keyC ++ Seq(col("day"), col("_n"), col("_z")): _*)
    val den = z.groupBy(keyC: _*)
      .agg(sum(col("_z") * col("_z")).as("_den"),
        first(col("_n")).as("n_days"))
    val lagged = z
      .select(keyC ++ Seq(col("day"), col("_z"),
        explode(sequence(lit(1), lit(maxLag))).as("lag")): _*)
      .withColumn("_probe_day", col("day") + col("lag"))
    val num = lagged.as("a")
      .join(z.select(keyC ++
          Seq(col("day").as("_probe_day"), col("_z").as("_z2")): _*),
        keyCols :+ "_probe_day")
      .groupBy(keyC :+ col("lag"): _*)
      .agg(sum(col("_z") * col("_z2")).as("_num"))
    den
      .select(keyC ++ Seq(col("n_days"), col("_den"),
        explode(sequence(lit(1), lit(maxLag))).as("lag")): _*)
      .join(num, keyCols :+ "lag", "left")
      .withColumn("acf",
        when(col("_den") > 0,
          coalesce(col("_num"), lit(0L)).cast("double")
            / col("_den").cast("double")))
      .select(keyC ++ Seq(col("lag").cast("long").as("lag"),
        col("n_days"), col("acf")): _*)
  }

  /** Classical seasonal decomposition of per-key daily volume —
    * count = trend + weekly seasonal + residual, the STL-lite every
    * ops dashboard runs before alerting on "volume dropped" (a
    * Sunday dip is seasonality, not an incident; CUSUM/anomaly
    * screens should run on the RESIDUAL). Trend is the centered
    * 7-day mean (defined only where the full window exists — edges
    * emit null trend/seasonal/residual rather than a fabricated
    * value); the seasonal component is the day-of-week mean of the
    * detrended series, folded in day order per (key, dow) so the
    * double accumulation is bitwise; dow is pure integer arithmetic
    * ((epoch_day+4) mod 7 — the q168 no-calendar-seam rule).
    *
    * Shape: events collapse to the (key, day) frame first; one
    * key-partitioned 7-row range window, one (key, dow) ordered
    * fold over the days-sized frame, one join back. 6-decimal face
    * (division chains on folded doubles).
    *
    * Output: keys* + (day, dow, cnt, trend, seasonal, residual). */
  def seasonalDecompose(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    Seq("day", "dow", "cnt", "trend", "seasonal", "residual")
      .foreach { r =>
        require(!keyCols.contains(r),
          s"key column name $r is reserved by seasonalDecompose")
      }
    val keyC = keyCols.map(col)
    val day = datediff(col(tsCol).cast("date"),
      to_date(lit("1970-01-01"))).cast("long")
    val daily = df
      .select(keyC :+ day.as("day"): _*)
      .groupBy(keyC :+ col("day"): _*)
      .agg(count(lit(1)).as("cnt"))
    val span = daily.groupBy(keyC: _*)
      .agg(min("day").as("_d0"), max("day").as("_d1"))
    val grid = span
      .select(keyC ++ Seq(col("_d0"), col("_d1"),
        explode(sequence(col("_d0"), col("_d1"))).as("day")): _*)
    val c = grid.join(daily, keyCols :+ "day", "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      .withColumn("dow", (col("day") + 4) % 7)
    val w7 = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("day")).rangeBetween(-3, 3)
    val withTrend = c
      .withColumn("_w7", count(lit(1)).over(w7))
      .withColumn("trend",
        when(col("_w7") === 7,
          round(sum(col("cnt")).over(w7).cast("double") / 7.0, 6)))
      .withColumn("_det", col("cnt").cast("double") - col("trend"))
    val seasonal = withTrend
      .filter(col("_det").isNotNull)
      .groupBy(keyC :+ col("dow"): _*)
      .agg(sort_array(collect_list(struct(col("day"), col("_det"))))
        .as("_ds"))
      .select(keyC ++ Seq(col("dow"), round(
        aggregate(transform(col("_ds"), s => s.getField("_det")),
          lit(0.0), (acc, t) => acc + t) /
          size(col("_ds")).cast("double"), 6).as("seasonal")): _*)
    withTrend
      .join(seasonal, keyCols :+ "dow", "left")
      .withColumn("residual",
        when(col("trend").isNotNull,
          round(col("cnt").cast("double") - col("trend")
            - col("seasonal"), 6)))
      .withColumn("seasonal",
        when(col("trend").isNotNull, col("seasonal")))
      .select(keyC ++ Seq(col("day"), col("dow"), col("cnt"),
        col("trend"), col("seasonal"), col("residual")): _*)
  }

  /** Exponentially-weighted moving average of the per-key daily
    * volume on the gap-free day grid — the smoother operations
    * dashboards overlay on raw counts (recent days dominate, old
    * days decay geometrically; missing days count 0 rather than
    * being skipped, so a quiet day actually pulls the average down).
    *
    * The recursion ewma_t = α·c_t + (1−α)·ewma_{t−1} (seeded
    * ewma_{d0} = c_{d0}) is UNROLLED to its closed form
    * ewma_t = (1−α)^(t−d0)·c_{d0} + α·Σ_{s>d0..t} (1−α)^(t−s)·c_s,
    * so there is no sequential dependency to schedule: each (key, t)
    * is one day-ordered fold over ≤ n terms. That costs O(days²)
    * per key — bounded LOUDLY by `maxDays`, because time is the
    * bounded dimension (a 100× corpus has 100× rows, not 100×
    * days); rows never enter the quadratic.
    *
    * Emitted at 6 decimals: `pow` differs by 1 ulp across libm
    * builds (the q94 face discipline).
    *
    * Output: keys* + (day, cnt, ewma) for every grid day. */
  def ewma(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      alpha: Double = 0.3,
      maxDays: Int = 2000): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    require(alpha > 0.0 && alpha <= 1.0,
      s"alpha must be in (0, 1], got $alpha")
    Seq("day", "cnt", "ewma").foreach { r =>
      require(!keyCols.contains(r),
        s"key column name $r is reserved by ewma")
    }
    val beta = 1.0 - alpha
    val keyC = keyCols.map(col)
    val day = datediff(col(tsCol).cast("date"),
      to_date(lit("1970-01-01"))).cast("long")
    val daily = df
      .select(keyC :+ day.as("day"): _*)
      .groupBy(keyC :+ col("day"): _*)
      .agg(count(lit(1)).as("cnt"))
    val span = daily.groupBy(keyC: _*)
      .agg(min("day").as("_d0"), max("day").as("_d1"))
    val worst = span
      .agg(max(col("_d1") - col("_d0") + 1).as("nd")).head()
    if (!worst.isNullAt(0)) {
      require(worst.getLong(0) <= maxDays,
        s"ewma: a key spans ${worst.getLong(0)} days > maxDays=" +
          s"$maxDays — the closed-form unroll is O(days^2) per key; " +
          "pre-aggregate to a coarser grain or raise the bound " +
          "deliberately")
    }
    val grid = span
      .select(keyC ++ Seq(col("_d0"), col("_d1"),
        explode(sequence(col("_d0"), col("_d1"))).as("day")): _*)
    val c = grid
      .join(daily, keyCols :+ "day", "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
    val terms = c
      .select(keyC ++ Seq(col("_d0"), col("cnt"),
        col("day").as("_s"),
        explode(sequence(col("day"), col("_d1"))).as("day")): _*)
      .withColumn("_term",
        when(col("_s") === col("_d0"),
          pow(lit(beta), (col("day") - col("_d0")).cast("double")))
          .otherwise(lit(alpha) *
            pow(lit(beta), (col("day") - col("_s")).cast("double")))
          * col("cnt").cast("double"))
    val folded = terms
      .groupBy(keyC :+ col("day"): _*)
      .agg(sort_array(collect_list(struct(col("_s"), col("_term"))))
        .as("_ts"))
      .withColumn("ewma", round(
        aggregate(transform(col("_ts"), s => s.getField("_term")),
          lit(0.0), (acc, t) => acc + t), 6))
    c.select(keyC ++ Seq(col("day"), col("cnt")): _*)
      .join(folded.select(keyC ++ Seq(col("day"), col("ewma")): _*),
        keyCols :+ "day")
  }

  /** Mann–Kendall trend test + Theil–Sen slope per key over daily
    * event volume — the robust is-this-series-actually-growing
    * readout ([[groupTrend]]'s OLS slope is leverage-sensitive; one
    * backfill day drags it, while the rank statistic and the median
    * slope shrug). The day grid is gap-free (zero-filled) like
    * [[cusumVolume]] — a silent day IS evidence about the trend.
    *
    * EXACT INTEGER core: S = Σ_{i<j} sign(c_j − c_i) and the
    * tie-corrected variance numerator
    * V = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5) are 64-bit integers
    * (n ≤ 5000 keeps V under 2.6e11). The normal-approx z with
    * continuity correction, z = (S∓1)/√(V/18), is ONE IEEE chain at
    * the 6-decimal face; `trend` is 'up'/'down'/'none' at the shared
    * two-sided 5% literal 1.959964, decided on the ROUNDED z so both
    * engines compare the same number. Constant series (V = 0) emit
    * null z/trend — no trend is decidable, which is different from
    * 'none'.
    *
    * Theil–Sen: the exact interpolated median (the q77/q80
    * `percentile` == `quantile_cont` contract) over all pairwise
    * slopes (c_j − c_i)/(d_j − d_i), each ONE IEEE division.
    *
    * Shape & scale: the corpus collapses to (key, day) in one fully
    * partial aggregate; everything after runs on series of ≤ maxDays
    * rows per key — the pair self-join is O(keys · maxDays²) rows
    * and the per-key median collects ≤ maxDays²/2 slopes
    * (≈ 2M doubles at the default cap — the documented memory
    * contract; raise it deliberately). The span guard fails loudly
    * above maxDays, same contract as [[ewma]].
    *
    * Output: (key..., n_days, n_pairs, s_stat, z, trend, sen_slope). */
  def trendTest(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      maxDays: Int = 2000): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    require(maxDays >= 2 && maxDays <= 5000,
      s"maxDays must be in [2, 5000], got $maxDays")
    Seq("day", "cnt", "n_days", "n_pairs", "s_stat", "z", "trend",
      "sen_slope").foreach { r =>
      require(!keyCols.contains(r),
        s"key column name $r is reserved by trendTest")
    }
    val keyC = keyCols.map(col)
    val day = datediff(col(tsCol).cast("date"),
      to_date(lit("1970-01-01"))).cast("long")
    val daily = df
      .select(keyC :+ day.as("day"): _*)
      .groupBy(keyC :+ col("day"): _*)
      .agg(count(lit(1)).as("cnt"))
    val span = daily.groupBy(keyC: _*)
      .agg(min("day").as("_d0"), max("day").as("_d1"))
    val worst = span
      .agg(max(col("_d1") - col("_d0") + 1).as("nd")).head()
    if (!worst.isNullAt(0)) {
      require(worst.getLong(0) <= maxDays,
        s"trendTest: a key spans ${worst.getLong(0)} days > maxDays=" +
          s"$maxDays — the pair stage is O(days^2) per key; " +
          "pre-aggregate to a coarser grain or raise the bound " +
          "deliberately")
    }
    val grid = span
      .select(keyC ++ Seq(col("_d0"), col("_d1"), explode(
        sequence(col("_d0"), col("_d1"))).as("day")): _*)
    val full = grid
      .join(daily, keyCols :+ "day", "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      .select(keyC ++ Seq(col("day"), col("cnt")): _*)
    val nDays = full.groupBy(keyC: _*)
      .agg(count(lit(1)).as("n_days"))
    // All i<j pairs of the (≤ maxDays)-row per-key series: the S
    // statistic's sign sum and the Theil–Sen slope sample.
    val a = full.select(
      keyC ++ Seq(col("day").as("_da"), col("cnt").as("_ca")): _*)
    val b = full.select(
      keyC ++ Seq(col("day").as("_db"), col("cnt").as("_cb")): _*)
    val pairs = a.join(b, keyCols)
      .filter(col("_db") > col("_da"))
      .withColumn("_sign",
        when(col("_cb") > col("_ca"), lit(1L))
          .when(col("_cb") < col("_ca"), lit(-1L))
          .otherwise(lit(0L)))
      .withColumn("_slope",
        (col("_cb") - col("_ca")).cast("double") /
          (col("_db") - col("_da")).cast("double"))
    val pairAgg = pairs.groupBy(keyC: _*)
      .agg(sum(col("_sign")).as("s_stat"),
        count(lit(1)).as("n_pairs"),
        expr("percentile(_slope, 0.5)").as("_sen_raw"))
    // Tie groups over the zero-filled grid: t days sharing a value
    // contribute t(t−1)(2t+5) to the variance correction.
    val ties = full.groupBy(keyC :+ col("cnt"): _*)
      .agg(count(lit(1)).as("_tt"))
      .groupBy(keyC: _*)
      .agg(sum(col("_tt") * (col("_tt") - 1L) *
        (lit(2L) * col("_tt") + 5L)).as("_tie"))
    val joined = nDays
      .join(pairAgg, keyCols, "left")
      .join(ties, keyCols, "left")
      .withColumn("n_pairs", coalesce(col("n_pairs"), lit(0L)))
      .withColumn("s_stat", coalesce(col("s_stat"), lit(0L)))
      .withColumn("_vn",
        col("n_days") * (col("n_days") - 1L) *
          (lit(2L) * col("n_days") + 5L) -
          coalesce(col("_tie"), lit(0L)))
    joined
      .withColumn("z",
        when(col("_vn") > 0L, round(
          when(col("s_stat") > 0L, col("s_stat") - 1L)
            .when(col("s_stat") < 0L, col("s_stat") + 1L)
            .otherwise(lit(0L)).cast("double") /
            sqrt(col("_vn").cast("double") / lit(18.0)), 6)))
      .withColumn("trend",
        when(col("_vn") > 0L,
          when(col("z") > 1.959964, lit("up"))
            .when(col("z") < -1.959964, lit("down"))
            .otherwise(lit("none"))))
      .withColumn("sen_slope", round(col("_sen_raw"), 6))
      .select(keyC ++ Seq(col("n_days"), col("n_pairs"),
        col("s_stat"), col("z"), col("trend"), col("sen_slope")): _*)
  }
}
