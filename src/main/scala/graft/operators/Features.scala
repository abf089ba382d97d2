package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group feature scaling — the normalization pass between raw
  * corpus statistics and anything that consumes them as features
  * (curation models, mixture weights, quality thresholds): a raw
  * "token count 512" means nothing until it is "84th percentile of
  * its source" or "+1.3 σ for its source". The reference engine has
  * no second-pass-over-aggregates notion at all; this is the Spark
  * spelling of that loop.
  *
  * Determinism discipline: the measure must be integral, so the
  * group moments (n, Σx, Σx²) are exact 64-bit integers, and every
  * floating-point step afterwards is a FIXED sequence of IEEE ops on
  * those exact operands — mean = Σx/n, m2 = Σx² − Σx·mean,
  * z = (x − mean)/√(m2/(n−1)) — bitwise identical cross-engine
  * (IEEE sqrt is correctly rounded; no libm seam). percent_rank is
  * rank arithmetic: `(rank−1)/(n−1)`, ties share a value.
  *
  * Scale shape: one group-partitioned rank window + one partial-agg
  * groupBy broadcast back — both keyed, never global. Σx² bounds the
  * integer path: a loud post-agg guard rejects groups where
  * n·max²-scale sums could have wrapped 2^63 (coarsen the unit or
  * pre-scale; silence would mean silently wrong σ). */
object Features {

  /** Adds `pct_rank` (percent_rank of `valueCol` within `groupCol`,
    * ties share) and `z` (per-group z-score, sample std; null when
    * the group is a single row or has zero variance) to `df`'s rows.
    * Null measures pass through with null `pct_rank`/`z` and do not
    * enter the moments. */
  def scaleBy(
      df: DataFrame,
      groupCol: String,
      valueCol: String): DataFrame = {
    val vt = df.schema(valueCol).dataType
    require(Seq("long", "integer", "short", "byte").contains(vt.typeName),
      s"valueCol $valueCol must be integral for exact group moments, " +
        s"got ${vt.typeName}; pre-scale to integer units first")
    Seq("pct_rank", "z", "_n", "_s", "_ss").foreach { r =>
      require(!df.columns.contains(r),
        s"input column name $r is reserved by scaleBy")
    }
    val v = col(valueCol).cast("long")
    val moments = df
      .filter(v.isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("_n"), sum(v).as("_s"),
        sum(v * v).as("_ss"))
    // loud overflow guard: under ANSI (the session default) the
    // engine itself throws ARITHMETIC_OVERFLOW computing these
    // moments; this post-agg check covers non-ANSI sessions, where
    // sum(v*v) wraps silently.
    // |Σx²| ≤ n·max(x²); flag any group whose row count could have
    // carried max(|x|)² past 2^62 (conservative: uses the group's
    // actual extremes would need another pass — this bound only
    // needs the already-computed moments: if |_s| or _ss lands in
    // the top quarter of the range, the sum was at risk)
    val risky = moments
      .filter(abs(col("_ss")) > lit(Long.MaxValue / 4) ||
        abs(col("_s")) > lit(Long.MaxValue / 4))
      .select(col(groupCol)).limit(1).collect()
    require(risky.isEmpty,
      s"scaleBy: group '${risky.headOption.map(_.get(0))}' has moment " +
        "sums in the top quarter of the 64-bit range - possible " +
        "overflow; coarsen the measure's unit")
    val mean = col("_s").cast("double") / col("_n")
    val m2 = greatest(lit(0.0),
      col("_ss").cast("double") - col("_s").cast("double") * mean)
    val std = when(col("_n") > 1, sqrt(m2 / (col("_n") - lit(1))))
    val w = Window.partitionBy(col(groupCol)).orderBy(v.asc)
    // null measures never enter the rank partition: Spark sorts nulls
    // first, DuckDB last — inside the window they would shift
    // percent_rank's denominator differently per engine. Scale the
    // non-null rows, pass null rows through with null features.
    val scaled = df.filter(v.isNotNull)
      .withColumn("pct_rank", percent_rank().over(w))
      .join(broadcast(moments), Seq(groupCol), "left")
      .withColumn("z",
        when(std.isNotNull && std =!= 0.0, (v.cast("double") - mean) / std))
      .drop("_n", "_s", "_ss")
    scaled.unionByName(
      df.filter(v.isNull)
        .withColumn("pct_rank", lit(null).cast("double"))
        .withColumn("z", lit(null).cast("double"))
        .select(scaled.columns.map(col): _*))
  }

  /** Quantile-distribution mapping — the values-level table that
    * maps the SOURCE distribution of a measure onto the TARGET
    * distribution at matched ranks (quantile normalization): value v
    * at upper-rank r among n_src source rows maps to the target's
    * disc quantile at ceil(r·n_tgt/n_src). The standard fix when two
    * snapshots / scanners / scorers disagree in scale but should
    * agree in distribution — calibrate B-scores onto A's scale, then
    * compare row for row.
    *
    * The operator emits the DISTINCT-VALUES mapping table, not
    * per-row output: values-sized (join it back to rows by value),
    * which is also what makes it scale — the only non-aggregated
    * structures are the two distinct-value frames, whose global
    * prefix sums run through [[Skew.cumulativeCounts]]'s two-phase
    * bucket spelling (no global window, no driver fold). The rank
    * match itself is NOT a values × values scan: every target rank
    * 1..n_tgt belongs to exactly one target value (the interval
    * (cum − cnt, cum]), so the lookup is an INTERVAL JOIN, spelled
    * the q47 way — both sides key on a coarse rank-bucket
    * (equi-join; targets explode only across the buckets their
    * interval spans, ≈ K + V_tgt rows total) with the exact
    * between-filter as residual. All rank arithmetic is exact
    * integer; nothing interpolates.
    *
    * Output: (value, n_le, n_src, target_rank, mapped) —
    * one row per distinct non-null source value. */
  def quantileMap(
      src: DataFrame,
      tgt: DataFrame,
      valueCol: String,
      coarseBuckets: Int = 64): DataFrame = {
    def vt(df: DataFrame) = df.schema(valueCol).dataType.typeName
    Seq(vt(src), vt(tgt)).foreach { t =>
      require(Seq("long", "integer", "short", "byte").contains(t),
        s"valueCol $valueCol must be integral on both sides, got $t")
    }
    def vals(df: DataFrame) = df.filter(col(valueCol).isNotNull)
      .select(col(valueCol).cast("long").as("_v"))
      .groupBy("_v").agg(count(lit(1)).as("_cnt"))
    val srcCum = Skew.cumulativeCounts(vals(src), coarseBuckets)
    val tgtCum = Skew.cumulativeCounts(vals(tgt), coarseBuckets)
    val nSrc = srcCum.agg(sum("_cnt").as("_ns"))
    val nTgt = tgtCum.agg(sum("_cnt").as("_nt"))
    val targets = srcCum
      .crossJoin(broadcast(nSrc)).crossJoin(broadcast(nTgt))
      .select(col("_v").as("value"), col("_cum").as("n_le"),
        col("_ns").as("n_src"),
        greatest(lit(1L), expr("(_cum * _nt + _ns - 1) div _ns"))
          .as("target_rank"),
        greatest(lit(1L), expr(s"(_nt + $coarseBuckets - 1) " +
          s"div $coarseBuckets")).as("_w"))
    // each target value owns the contiguous rank interval
    // (cum - cnt, cum]; explode it across the coarse rank-buckets it
    // spans and equi-join on the bucket, exact bounds as residual
    val intervals = tgtCum.crossJoin(broadcast(nTgt))
      .select(col("_v").as("mapped"),
        (col("_cum") - col("_cnt") + 1).as("_lo"), col("_cum").as("_hi"),
        greatest(lit(1L), expr(s"(_nt + $coarseBuckets - 1) " +
          s"div $coarseBuckets")).as("_w"))
      .select(col("mapped"), col("_lo"), col("_hi"),
        explode(sequence(expr("(_lo - 1) div _w"),
          expr("(_hi - 1) div _w"))).as("_bkt"))
    targets
      .withColumn("_bkt", expr("(target_rank - 1) div _w"))
      .join(intervals, Seq("_bkt"))
      .filter(col("target_rank").between(col("_lo"), col("_hi")))
      .select(col("value"), col("n_le"), col("n_src"),
        col("target_rank"), col("mapped"))
  }

  /** Per-group winsorization — clip a measure to its group's
    * [pLoPct, pHiPct] EXACT disc quantiles before it feeds a mean,
    * a z-score, or a mixture weight, so a handful of pathological
    * documents can't drag the statistic (the robust-stats
    * complement of [[scaleBy]]: MAD flags outliers, winsorize
    * bounds their influence without dropping rows).
    *
    * Quantile convention (lower/disc): threshold-p value = the
    * smallest v whose ≤-cumulative count reaches
    * max(1, ceil(p·n/100)) among the group's non-null rows — exact
    * rank arithmetic over exact counts, no interpolation, bitwise
    * cross-engine. All windows are GROUP-partitioned: distinct
    * (group, value) counts cumsum within their group; thresholds
    * ride back via a groups-sized broadcast join; the clip itself is
    * `least`/`greatest` per row. Null measures pass through with
    * null bounds and null `clipped`.
    *
    * Output: input columns + `lo`, `hi`, `clipped`. */
  def winsorize(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      pLoPct: Int,
      pHiPct: Int): DataFrame = {
    require(0 <= pLoPct && pLoPct <= pHiPct && pHiPct <= 100,
      s"need 0 <= pLoPct <= pHiPct <= 100, got [$pLoPct, $pHiPct]")
    val vt = df.schema(valueCol).dataType
    require(Seq("long", "integer", "short", "byte").contains(vt.typeName),
      s"valueCol $valueCol must be integral for exact quantiles, " +
        s"got ${vt.typeName}")
    Seq("lo", "hi", "clipped", "_v", "_cnt", "_cum", "_n", "_rlo", "_rhi")
      .foreach { r =>
        require(!df.columns.contains(r),
          s"input column name $r is reserved by winsorize")
      }
    val v = col(valueCol).cast("long")
    val vals = df.filter(v.isNotNull)
      .groupBy(col(groupCol), v.as("_v"))
      .agg(count(lit(1)).as("_cnt"))
    val wc = Window.partitionBy(col(groupCol)).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = vals.withColumn("_cum", sum(col("_cnt")).over(wc))
    val thresholds = df.filter(v.isNotNull)
      .groupBy(col(groupCol)).agg(count(lit(1)).as("_n"))
      .withColumn("_rlo",
        greatest(lit(1L), expr(s"($pLoPct * _n + 99) div 100")))
      .withColumn("_rhi",
        greatest(lit(1L), expr(s"($pHiPct * _n + 99) div 100")))
    def bound(rank: String, out: String) = cum
      .join(thresholds.select(col(groupCol), col(rank)), Seq(groupCol))
      .filter(col("_cum") >= col(rank))
      .groupBy(col(groupCol)).agg(min(col("_v")).as(out))
    val bounds = bound("_rlo", "lo").join(bound("_rhi", "hi"), Seq(groupCol))
    df.join(broadcast(bounds), Seq(groupCol), "left")
      .withColumn("clipped",
        when(v.isNotNull, least(greatest(v, col("lo")), col("hi"))))
      .withColumn("lo", when(v.isNotNull, col("lo")))
      .withColumn("hi", when(v.isNotNull, col("hi")))
  }
}
