package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset profiling — the audit pass a training pipeline runs before
  * (and after) every transformation: per-column null counts, distinct
  * cardinality, and numeric ranges.
  *
  * Shape matters at 100 TB. The default (`exact = false`) computes
  * EVERYTHING in one scan: a single wide aggregate where the distinct
  * counts are HLL sketches (`approx_count_distinct`) — no per-column
  * jobs, no `describe()`-style driver loops, and no Catalyst
  * multi-distinct Expand. That is the only honest default at scale.
  *
  * Exact mode exists for fixtures and oracles. Spelling all the exact
  * `count(DISTINCT)`s inside one aggregate forces Catalyst's
  * distinct-rewrite Expand: the row stream is duplicated (columns+1)×
  * through the partial aggregate — at 100 TB that multiplies shuffle
  * input by the number of profiled columns. Instead, each distinct
  * count runs as its OWN column-pruned subtree (scan reads exactly one
  * column — columnar formats make the total bytes across all subtrees
  * equal to ONE scan of the profiled columns) union'd with the wide
  * non-distinct aggregate into a single job, so the independent
  * subtrees schedule concurrently. Measured at sf0.1 (4 lineitem
  * columns): 6.0s (Expand spelling) → ~1.5s, with strictly less
  * shuffle volume at any scale. */
object Profile {

  /** One row per profiled column:
    * (column, n_rows, n_nulls, n_distinct, min_val, max_val) with
    * min/max as strings (schema-stable across column types). */
  def profile(
      df: DataFrame,
      cols: Seq[String],
      exact: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    // generated measure names are positional (__n_0, __nulls_1, ...),
    // never derived from user column text: a source column named
    // "a.b" or "x-y z" can't break (or silently re-resolve inside)
    // the stack() expression below. The label row still carries the
    // real name via a quoted literal.
    val baseMeasures = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        count(lit(1)).as(s"__n_$i"),
        count(when(col(c).isNull, 1)).as(s"__nulls_$i"),
        min(col(c)).cast("string").as(s"__min_$i"),
        max(col(c)).cast("string").as(s"__max_$i")) ++
        (if (exact) Nil
         else Seq(approx_count_distinct(col(c)).as(s"__dist_$i")))
    }
    val wide = df.agg(baseMeasures.head, baseMeasures.tail: _*)
    def label(i: Int): String =
      cols(i).replace("\\", "\\\\").replace("'", "\\'")
    if (!exact) {
      // unpivot the single wide row into one row per column — stack
      // is a Generate over one row, not a per-column job
      val stackArgs = cols.indices.map { i =>
        s"'${label(i)}', __n_$i, __nulls_$i, __dist_$i, __min_$i, __max_$i"
      }.mkString(", ")
      wide.select(expr(
        s"stack(${cols.length}, $stackArgs) AS " +
          "(column, n_rows, n_nulls, n_distinct, min_val, max_val)"))
    } else {
      val stackArgs = cols.indices.map { i =>
        s"'${label(i)}', __n_$i, __nulls_$i, __min_$i, __max_$i"
      }.mkString(", ")
      val stacked = wide.select(expr(
        s"stack(${cols.length}, $stackArgs) AS " +
          "(column, n_rows, n_nulls, min_val, max_val)"))
      // one pruned-scan distinct subtree per column, union'd so the
      // whole profile is still ONE job with concurrent stages
      val dists = cols.indices.map { i =>
        df.select(col(cols(i)).as("__v"))
          .agg(countDistinct(col("__v")).as("n_distinct"))
          .select(lit(cols(i)).as("column"), col("n_distinct"))
      }.reduce(_.unionAll(_))
      stacked.join(dists, Seq("column"), "left")
        .select(col("column"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_val"), col("max_val"))
    }
  }

  /** Row-level snapshot diff — the record-granularity complement to
    * [[drift]]'s column-level gate: which keys were ADDED, REMOVED,
    * or CHANGED between two snapshots of the same table (incremental
    * crawl reconciliation, "what did this re-ingest actually touch").
    * Change detection compares the listed `cols` via a cross-engine
    * md5 of their null-tagged string concatenation (the [[Dedup]]
    * exact-dup fingerprint discipline applied to row identity), so
    * the whole report is recomputable by any engine with md5.
    *
    * Scale shape: ONE full outer join keyed by `keyCol` (sort-merge
    * at scale, AQE-handled) over projections pruned to key + listed
    * cols; no window, no collect, output one narrow row per key in
    * either snapshot. `summaryOnly = true` collapses to the 4-row
    * status count report. Duplicate keys within a snapshot are
    * caller error and fail LOUDLY (one cheap count pass) — a diff
    * keyed on a non-key would silently join-explode. */
  def snapshotDiff(
      old: DataFrame,
      fresh: DataFrame,
      keyCol: String,
      cols: Seq[String],
      summaryOnly: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "snapshotDiff needs at least one compared column")
    def fingerprinted(df: DataFrame, tag: String) = {
      val dups = df.groupBy(col(keyCol)).count()
        .filter(col("count") > 1).limit(1).collect()
      require(dups.isEmpty, {
        s"snapshotDiff: $tag snapshot has duplicate key " +
          s"'${dups.head.get(0)}' — $keyCol is not a key; a diff on a " +
          "non-key would silently join-explode"
      })
      // null-tagged concat: NULL and the string "null" must not
      // collide, and neither may ("ab","c") vs ("a","bc") — each
      // value is length-prefixed
      val parts = cols.map { c =>
        val s = col(c).cast("string")
        concat(when(s.isNull, lit("N:")).otherwise(
          concat(lit("V"), length(s), lit(":"))), coalesce(s, lit("")))
      }
      df.select(col(keyCol).as("key"),
        md5(concat(parts: _*)).as(s"_fp_$tag"))
    }
    val joined = fingerprinted(old, "old")
      .join(fingerprinted(fresh, "new"), Seq("key"), "full_outer")
    val status = when(col("_fp_old").isNull, "added")
      .when(col("_fp_new").isNull, "removed")
      .when(col("_fp_old") === col("_fp_new"), "unchanged")
      .otherwise("changed")
    val perKey = joined.select(col("key"), status.as("status"))
    if (summaryOnly)
      perKey.groupBy("status").agg(count(lit(1)).as("n"))
    else perKey
  }

  /** Snapshot-to-snapshot drift report — the data-validation gate a
    * continuously-ingesting pipeline runs before accepting a new
    * batch: per-column null-rate jump, distinct-density ratio, and
    * value-range movement between an `old` and `fresh` snapshot, each
    * with an alert flag against the caller's tolerances. Built on two
    * exact [[profile]] runs (one job each) + one tiny column-keyed
    * join; every emitted number is integer counts and IEEE division,
    * so the report is engine-exact. Flags, not filters: drift is a
    * DECISION for the operator of the pipeline, so the report
    * surfaces everything and alerts loudly rather than dropping data
    * silently. */
  def drift(
      old: DataFrame,
      fresh: DataFrame,
      cols: Seq[String],
      maxNullJump: Double = 0.05,
      distinctBand: (Double, Double) = (0.5, 2.0)): DataFrame = {
    require(distinctBand._1 > 0.0 && distinctBand._1 <= distinctBand._2,
      s"distinctBand must be 0 < lo <= hi, got $distinctBand")
    def side(df: DataFrame, tag: String) =
      profile(df, cols, exact = true).select(
        col("column"),
        col("n_rows").as(s"n_$tag"),
        (col("n_nulls").cast("double") /
          greatest(col("n_rows"), lit(1L))).as(s"null_rate_$tag"),
        col("n_distinct").as(s"distinct_$tag"),
        (col("n_distinct").cast("double") /
          greatest(col("n_rows") - col("n_nulls"), lit(1L)))
          .as(s"density_$tag"),
        col("min_val").as(s"min_$tag"),
        col("max_val").as(s"max_$tag"))
    val joined = side(old, "old").join(side(fresh, "new"), "column")
    // An alerting report must not emit surprising NULLs/NaNs: when the
    // old side has zero non-null rows its density is 0 (0 distinct /
    // max(0,1)) and the ratio would be 0/0=NaN or x/0=Inf — emit a
    // NULL ratio with a FORCED alert instead (an all-null column
    // suddenly carrying data is drift by definition). range_changed
    // uses null-safe equality so an all-null min/max on either side
    // compares as a value (changed=true when only one side is null),
    // never as a three-valued NULL.
    val ratio = when(col("density_old") === 0.0, lit(null))
      .otherwise(col("density_new") / col("density_old"))
    joined.select(
      col("column"), col("n_old"), col("n_new"),
      col("null_rate_old"), col("null_rate_new"),
      (col("null_rate_new") - col("null_rate_old")).as("null_jump"),
      (col("null_rate_new") - col("null_rate_old") > maxNullJump)
        .as("null_alert"),
      col("distinct_old"), col("distinct_new"),
      ratio.as("density_ratio"),
      when(col("density_old") === 0.0, col("density_new") > 0.0)
        .otherwise(ratio < distinctBand._1 || ratio > distinctBand._2)
        .as("distinct_alert"),
      (not(col("min_new") <=> col("min_old")) ||
        not(col("max_new") <=> col("max_old"))).as("range_changed"))
  }

  /** Robust per-group outlier detection — median/MAD, the
    * data-cleaning screen that survives the outliers it hunts (mean
    * and stddev are dragged by the very rows they're supposed to
    * flag; the median and the median-absolute-deviation have 50%
    * breakdown). A row is an outlier when
    * |value − median| > cut · MAD (cut = 3 by convention).
    *
    * Medians are the LOWER-interpolation order statistic (value at
    * ascending rank (n−1) div 2 + 1) computed with integer rank
    * arithmetic — exact cross-engine, no percentile interpolation
    * conventions in play, which is what lets the q129 oracle
    * recompute every median, MAD, and flag bitwise. Degenerate MAD=0
    * (over half the group identical) flags EVERY deviating row —
    * the standard MAD convention, documented rather than patched.
    *
    * Scale shape: two key-partitioned rank windows (value order,
    * then deviation order) + two one-row-per-group joins — never a
    * global sort; group medians move as single rows. Output: the
    * flagged rows only — (groupCols..., id, value, med, mad). */
  def madOutliers(
      df: DataFrame,
      groupCols: Seq[String],
      idCol: String,
      valueCol: String,
      cut: Double = 3.0): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column required")
    require(cut > 0.0, s"cut must be positive, got $cut")
    Seq("id", "value", "med", "mad", "_rn", "_n", "_dev").foreach { r =>
      require(!groupCols.contains(r),
        s"group column name $r is reserved by madOutliers")
    }
    val keyC = groupCols.map(col)
    val vcol = col(valueCol).cast("double")
    val base = df
      .select(keyC ++ Seq(col(idCol).as("id"), vcol.as("value")): _*)
      .filter(col("value").isNotNull)
    def lowerMedian(in: DataFrame, c: String, out: String): DataFrame = {
      val w = Window.partitionBy(keyC: _*).orderBy(col(c))
      in.withColumn("_rn", row_number().over(w).cast("long"))
        .withColumn("_n", count(lit(1)).over(
          Window.partitionBy(keyC: _*)))
        .filter(col("_rn") === expr("(_n - 1) div 2 + 1"))
        .select(keyC :+ col(c).as(out): _*)
    }
    val med = lowerMedian(base, "value", "med")
    val withDev = base.join(med, groupCols)
      .withColumn("_dev", abs(col("value") - col("med")))
    val mad = lowerMedian(withDev, "_dev", "mad")
    withDev.join(mad, groupCols)
      .filter(col("_dev") > lit(cut) * col("mad"))
      .select(keyC ++ Seq(col("id"), col("value"),
        col("med"), col("mad")): _*)
  }

  /** Per-group Gini concentration of an integral measure — the
    * "is this source's token mass concentrated in a few documents?"
    * diagnostic a mixture designer reads next to the per-source row
    * counts (a source whose tokens live in 2% of its documents needs
    * different sampling than a flat one). Returns one row per group:
    * `(group, n_docs, total, gini)` with `gini` the classic
    * rank-formula coefficient over ascending `valueCol`:
    * `G = 2·Σ(i·x_i) / (n·Σx) − (n+1)/n`. Every sum is 64-bit
    * integer (ties in x are order-invariant: swapping equal values
    * across ranks leaves Σ(i·x_i) unchanged, so the `idCol` tiebreak
    * only pins the row_number, not the result); the two final
    * divisions are the only floating-point ops, performed in one
    * fixed order — bitwise cross-engine. Null measures are excluded.
    *
    * Scale shape: one group-partitioned rank window (never global) +
    * one partial-agg groupBy. The integer path needs
    * `2·n·Σx < 2^63`; a narrow post-aggregation guard (group-count-
    * sized, one tiny job) fails LOUDLY instead of wrapping — at a
    * corpus where a single group's n·Σx approaches 2^62, bucket the
    * group or switch the measure to a coarser unit. */
  def giniConcentration(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      valueCol: String): DataFrame = {
    val vt = df.schema(valueCol).dataType
    require(Seq("long", "integer", "short", "byte").contains(vt.typeName),
      s"valueCol $valueCol must be integral (exact rank sums), got " +
        vt.typeName)
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("_v"), col(idCol))
    val agged = df
      .select(col(groupCol), col(idCol), col(valueCol).cast("long").as("_v"))
      .filter(col("_v").isNotNull)
      .withColumn("_rk", row_number().over(w).cast("long"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"), sum(col("_v")).as("total"),
        sum(col("_rk") * col("_v")).as("_ws"))
    val over = agged
      .filter(col("total") > 0 &&
        col("n_docs") > lit(Long.MaxValue / 2) / col("total"))
      .select(col(groupCol), col("n_docs"), col("total")).limit(1)
      .collect()
    require(over.isEmpty, {
      val r = over.head
      s"giniConcentration: group '${r.get(0)}' has n=${r.get(1)}, " +
        s"total=${r.get(2)} — 2*n*total overflows 64-bit; bucket the " +
        "group or coarsen the measure"
    })
    agged
      // all-zero mass has no concentration to speak of: null, not 0/0
      .withColumn("gini", when(col("total") === 0, lit(null)).otherwise(
        (lit(2.0) * col("_ws")) / (col("n_docs") * col("total")) -
          (col("n_docs") + lit(1.0)) / col("n_docs")))
      .drop("_ws")
  }

  /** Mutual information between two categorical columns, with the
    * entropies that contextualize it — the "is `source` already
    * telling me the `lang`?" dependence check a mixture designer
    * runs before stratifying on both. One row:
    * `(n, h_a, h_b, h_ab, mi, nmi)`, entropies in nats,
    * `nmi = mi / sqrt(h_a·h_b)` (null when either marginal entropy
    * is 0 — a constant column carries no information to normalize
    * by). Null categories are excluded.
    *
    * Determinism: Σ p·ln(…) over many cells is add-order-dependent
    * in IEEE arithmetic, so each sum is a SEQUENTIAL FOLD over the
    * cell terms in sorted cell order (`sort_array` + `aggregate`) —
    * the same value on every run, every partitioning, and every
    * engine that folds the same sorted list (the DuckDB oracle's
    * `list(… ORDER BY …)` + `list_aggregate('sum')`). Each term
    * keeps its operands exact: `ln((c·n)/(c_a·c_b))` is one ln of
    * one division of two exact 64-bit products.
    *
    * Scale shape: three partial-agg passes (cells, two marginals)
    * over the raw pairs — the data-scaled work — then everything
    * else happens on CELL-count rows. Two loud guards: `n < 2^31.5`
    * (the integer products must stay in 64 bits — beyond that,
    * sample first; this is a diagnostic, not a trainer) and
    * `maxCells` on the pair-domain cardinality before any
    * `collect_list` (categorical columns only; a high-cardinality
    * id column would blow the single-row fold). */
  def mutualInfo(
      df: DataFrame,
      aCol: String,
      bCol: String,
      maxCells: Long = 1L << 20): DataFrame = {
    val base = df
      .select(col(aCol).as("a"), col(bCol).as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
    val nVal = base.count()
    require(nVal > 0, "mutualInfo needs at least one non-null pair")
    require(nVal <= 3037000499L, // floor(sqrt(2^63 - 1))
      s"mutualInfo: n=$nVal rows makes c*n overflow 64-bit; " +
        "sample the corpus first (this is a diagnostic)")
    val cells = base.groupBy("a", "b").agg(count(lit(1)).as("c"))
    val nCells = cells.count()
    require(nCells <= maxCells,
      s"mutualInfo: $nCells distinct (a, b) cells > maxCells=$maxCells " +
        "- these must be categorical columns, not ids")
    val n = lit(nVal)
    val ca = base.groupBy("a").agg(count(lit(1)).as("ca"))
    val cb = base.groupBy("b").agg(count(lit(1)).as("cb"))
    def foldSum(listCol: Column, field: String): Column =
      aggregate(sort_array(listCol), lit(0.0),
        (acc, x) => acc + x.getField(field))
    val j = cells.join(broadcast(ca), "a").join(broadcast(cb), "b")
      .withColumn("mt", (col("c") / n) *
        log((col("c") * n).cast("double") / (col("ca") * col("cb"))))
      .withColumn("ht", -(col("c") / n) * log(col("c") / n))
    val joint = j
      .agg(collect_list(struct(col("a"), col("b"), col("mt"), col("ht")))
        .as("l"))
      .select(foldSum(col("l"), "mt").as("mi"),
        foldSum(col("l"), "ht").as("h_ab"))
    def marginal(m: DataFrame, k: String, c: String, out: String) = m
      .withColumn("t", -(col(c) / n) * log(col(c) / n))
      .agg(collect_list(struct(col(k), col("t"))).as("l"))
      .select(foldSum(col("l"), "t").as(out))
    marginal(ca, "a", "ca", "h_a")
      .crossJoin(marginal(cb, "b", "cb", "h_b"))
      .crossJoin(joint)
      .select(n.as("n"), col("h_a"), col("h_b"), col("h_ab"), col("mi"),
        when(col("h_a") * col("h_b") === 0.0, lit(null))
          .otherwise(col("mi") / sqrt(col("h_a") * col("h_b"))).as("nmi"))
  }

  /** Per-group WEIGHTED lower median: the smallest `valueCol` whose
    * cumulative `weightCol` (ascending by value, `idCol` tiebreak)
    * reaches ⌈W/2⌉ — "the n_chars level where half the group's TOKEN
    * MASS sits", which is the statistic a curation threshold should
    * use when documents differ wildly in size (an unweighted median
    * over-counts short docs). Both columns must be integral: the
    * cumulative compare is pure 64-bit arithmetic, no interpolation
    * convention to disagree on. Returns `(group, total_w, med_v)`.
    * Rows with null value/weight or weight 0 carry no mass and are
    * excluded; negative weights fail LOUDLY (a narrow group-sized
    * guard — a negative weight silently shifts every threshold).
    *
    * Scale shape: one group-partitioned cumulative window + one
    * partial-agg groupBy, broadcast-joined totals. Never global. */
  def weightedMedian(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      valueCol: String,
      weightCol: String): DataFrame = {
    Seq(valueCol, weightCol).foreach { c =>
      val t = df.schema(c).dataType.typeName
      require(Seq("long", "integer", "short", "byte").contains(t),
        s"$c must be integral for an exact weighted median, got $t")
    }
    val (v, w) = (col(valueCol).cast("long"), col(weightCol).cast("long"))
    val base = df.select(col(groupCol), col(idCol).as("_id"), v.as("_v"),
        w.as("_w"))
      .filter(col("_v").isNotNull && col("_w").isNotNull && col("_w") =!= 0)
    val totals = base.groupBy(col(groupCol))
      .agg(sum(col("_w")).as("total_w"), min(col("_w")).as("_minw"))
    val neg = totals.filter(col("_minw") < 0)
      .select(col(groupCol)).limit(1).collect()
    require(neg.isEmpty,
      s"weightedMedian: group '${neg.headOption.map(_.get(0))}' has a " +
        "negative weight - medians are undefined under signed mass")
    val cum = base.withColumn("_cw", sum(col("_w")).over(
      Window.partitionBy(col(groupCol)).orderBy(col("_v"), col("_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    cum.join(broadcast(totals.drop("_minw")), Seq(groupCol))
      // `div`, not `/`: long / long is DOUBLE division in Spark —
      // the ceil-half threshold must stay integer arithmetic
      .filter(col("_cw") >= expr("(total_w + 1) div 2"))
      .groupBy(col(groupCol), col("total_w"))
      .agg(min(col("_v")).as("med_v"))
  }

  /** One foreign-key edge for [[integrityAudit]]: `child.childKey`
    * should reference `parent.parentKey`. */
  final case class FkEdge(
      name: String,
      child: DataFrame,
      childKey: String,
      parent: DataFrame,
      parentKey: String)

  /** Fixed-bin histogram per group — the distribution SHAPE the
    * min/max/quantile profile can't show (bimodality, gaps, a spike
    * at a sentinel value). Bin edges are CALLER-DECLARED `[lo, hi)`
    * with `nBins` equal widths — data-independent, so results are
    * stable across snapshots and comparable between runs (the whole
    * point of a drift-monitoring histogram; data-dependent edges
    * would reshuffle every bin on every batch). Bin assignment is
    * pure 64-bit integer arithmetic — `(v−lo)·nBins div (hi−lo)` —
    * exact cross-engine; out-of-range rows land in sentinel bins −1
    * (below lo) and `nBins` (at/above hi) rather than silently
    * clipping, and nulls are excluded. Only OCCUPIED bins emit
    * (dense output at scale would be groups×bins rows of zeros;
    * the reader joins a bin spine if it wants them).
    *
    * One partial-agg groupBy — histogram at any scale is one
    * shuffle of (group, bin) cells. */
  def histogram(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      lo: Long,
      hi: Long,
      nBins: Int): DataFrame = {
    require(nBins >= 1 && nBins <= 100000,
      s"nBins must be in [1, 100000], got $nBins")
    require(lo < hi, s"need lo < hi, got [$lo, $hi)")
    require(hi - lo <= Long.MaxValue / nBins,
      s"(hi-lo)*nBins overflows 64-bit: [$lo, $hi) x $nBins")
    val vt = df.schema(valueCol).dataType.typeName
    require(Seq("long", "integer", "short", "byte").contains(vt),
      s"valueCol $valueCol must be integral for exact binning, got $vt")
    val v = col(valueCol).cast("long")
    val bin = when(v < lo, lit(-1L))
      .when(v >= hi, lit(nBins.toLong))
      .otherwise(expr(s"(($valueCol - $lo) * $nBins) div (${hi - lo})"))
    df.filter(v.isNotNull)
      .groupBy(col(groupCol), bin.as("bin"))
      .agg(count(lit(1)).as("n"))
  }

  /** Join-size audit — predict `|A ⋈ B|` on an equi-key BEFORE paying
    * for it: the exact output cardinality is `Σ_k nl(k)·nr(k)`, which
    * two key-count aggregates and a count-sized join compute without
    * materializing a single joined row. THE pre-flight for join
    * explosions (a blocking key whose top contributor alone yields
    * 10^10 rows is a redesign, not a bigger cluster). Returns the
    * top-`topN` contributing keys `(key, n_left, n_right, out_rows,
    * predicted_total, rank)` — `predicted_total` on every row, the
    * headline number. Null keys match nothing in an equi-join and
    * are excluded, exactly as the audited join would drop them.
    *
    * Scale shape: two partial-agg key counts + one count-sized join
    * (dimension-sized sides broadcast) + a `limit(topN)` prune with
    * the bounded no-window rank. `out_rows` products run under ANSI
    * — a predicted size past 2^63 fails loudly, which IS the
    * answer. */
  def joinSizeAudit(
      left: DataFrame,
      leftKey: String,
      right: DataFrame,
      rightKey: String,
      topN: Int = 20): DataFrame = {
    require(topN >= 1 && topN <= 10000, s"topN must be in [1,10000], got $topN")
    val lc = left.filter(col(leftKey).isNotNull)
      .groupBy(col(leftKey).as("key")).agg(count(lit(1)).as("n_left"))
    val rc = right.filter(col(rightKey).isNotNull)
      .groupBy(col(rightKey).as("key")).agg(count(lit(1)).as("n_right"))
    val contrib = lc.join(rc, Seq("key"))
      .withColumn("out_rows", col("n_left") * col("n_right"))
    val total = contrib.agg(
      coalesce(sum(col("out_rows")), lit(0L)).as("predicted_total"))
    val top = contrib
      .orderBy(col("out_rows").desc, col("key").asc)
      .limit(topN)
    Ranks.rankBounded(top, col("out_rows").desc, col("key").asc)
      .crossJoin(broadcast(total))
      .select(col("key"), col("n_left"), col("n_right"), col("out_rows"),
        col("predicted_total"), col("rank"))
  }

  /** Referential-integrity audit across a star schema — the pre-join
    * data-quality gate: per FK edge, how many child rows carry a
    * null key, and how many reference a parent that does not exist
    * (orphans — each one a row an inner join will silently DROP
    * downstream). One report row per edge:
    * `(edge, n_child, n_null_keys, n_orphans, n_orphan_keys)`.
    *
    * Scale shape: per edge, one narrow aggregate over the child keys
    * plus one left-anti join against the DISTINCT parent keys
    * (Catalyst broadcasts dimension-sized parents; fact-to-fact
    * edges shuffle on the key, the same bill as the join being
    * audited). Edges evaluate independently and union — no
    * cross-edge barrier. */
  def integrityAudit(edges: Seq[FkEdge]): DataFrame = {
    require(edges.nonEmpty, "at least one edge required")
    require(edges.map(_.name).distinct.size == edges.size,
      s"edge names must be unique, got ${edges.map(_.name)}")
    edges.map { e =>
      val keys = e.child.select(col(e.childKey).as("_k"))
      val counts = keys.agg(
        count(lit(1)).as("n_child"),
        sum(when(col("_k").isNull, 1L).otherwise(0L)).as("n_null_keys"))
      val orphans = keys.filter(col("_k").isNotNull)
        .join(e.parent.select(col(e.parentKey).as("_k")).distinct(),
          Seq("_k"), "left_anti")
        .agg(count(lit(1)).as("n_orphans"),
          count_distinct(col("_k")).as("n_orphan_keys"))
      counts.crossJoin(orphans)
        .select(lit(e.name).as("edge"), col("n_child"),
          col("n_null_keys"), col("n_orphans"), col("n_orphan_keys"))
    }.reduce(_ unionByName _)
  }

  /** Tamper-evident provenance ledger — one chained fingerprint per
    * ingest period: any row added, dropped, or edited in ANY past
    * period changes every chain hash from that period forward, so
    * two parties (producer, consumer, auditor) can compare one hash
    * instead of re-scanning history. The batch-level analog of a
    * commit DAG for a corpus.
    *
    * Construction: row signature = md5-lower-64 of "id:text" (the
    * repo's cross-engine hash); per-period content fingerprint =
    * BIT_XOR of row signatures (order-free — partial-aggregates,
    * immune to partitioning) plus the row count. Honesty note on
    * strength: XOR-of-hashes detects corruption, loss, and drift —
    * the operational threats — but is NOT an adversarial
    * commitment (crafted row sets can cancel in XOR; an identical
    * duplicated pair XORs to the same zero as another identical
    * pair). Adversarial settings want a Merkle tree; this ledger's
    * job is cheap continuous integrity monitoring. Chain hash_i =
    * md5(hash_{i−1} ':' period ':' xor ':' n) folded over periods in
    * order. The fold is PERIODS-sized (bounded by calendar, not
    * data) — one collect into a single sorted struct list and a
    * sequential UDF, the q94 bounded-fold discipline; everything
    * row-scale is one partial-agg shuffle.
    *
    * Output: (period, n_rows, xor_sig, chain_hash), one row per
    * period, chain seeded with the literal "genesis". */
  def provenanceLedger(
      df: DataFrame,
      idCol: String,
      textCol: String,
      periodCol: String): DataFrame = {
    val pt = df.schema(periodCol).dataType.typeName
    require(Seq("long", "integer", "short", "byte").contains(pt),
      s"periodCol $periodCol must be integral, got $pt")
    val sigUdf = udf((id: Long, t: String) =>
      graft.operators.Kernels.md5Lower64(s"$id:${if (t == null) "" else t}"))
    val per = df
      .select(col(periodCol).cast("long").as("period"),
        sigUdf(col(idCol).cast("long"), col(textCol)).as("_sig"))
      .groupBy("period")
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(_sig)").as("xor_sig"))
    val chainUdf = udf((periods: scala.collection.Seq[Long],
        ns: scala.collection.Seq[Long],
        xors: scala.collection.Seq[Long]) => {
      val md = java.security.MessageDigest.getInstance("MD5")
      def hex(b: Array[Byte]) = b.map("%02x".format(_)).mkString
      var prev = "genesis"
      periods.indices.map { i =>
        val s = s"$prev:${periods(i)}:${xors(i)}:${ns(i)}"
        prev = hex(md.digest(s.getBytes("UTF-8")))
        (periods(i), prev)
      }
    })
    val chained = per
      .groupBy()
      .agg(sort_array(collect_list(struct(col("period"), col("n_rows"),
        col("xor_sig")))).as("_ps"))
      .select(explode(chainUdf(
        transform(col("_ps"), p => p.getField("period")),
        transform(col("_ps"), p => p.getField("n_rows")),
        transform(col("_ps"), p => p.getField("xor_sig")))).as("_c"))
      .select(col("_c._1").as("period"), col("_c._2").as("chain_hash"))
    per.join(chained, "period")
      .select(col("period"), col("n_rows"), col("xor_sig"),
        col("chain_hash"))
  }

  /** Burstiness (Fano factor) per key — variance-to-mean ratio of
    * daily activity counts: ≈1 is Poisson-like organic behavior,
    * ≫1 is bursty (campaigns, scrapers waking up), ≪1 is
    * machine-regular (cron bots hitting exactly n/day) — the
    * per-entity behavioral screen that complements
    * [[TimeSeries.volumeAnomaly]]'s per-day flags. Only ACTIVE days
    * enter (a key's absent days are unobserved, not zero — the
    * honest default for open populations; densify upstream with
    * [[TimeSeries.resampleFill]] to opt into closed-world zeros).
    *
    * Exact: daily counts are one (key, day) partial agg; the moments
    * (n, Σ, Σ²) are exact integer sums and Fano =
    * (n·Σ² − Σ²) / ((n−1)·Σ) is ONE IEEE division of exact 64-bit
    * operands — no intermediate float accumulation anywhere. Keys
    * with a single active day emit null (variance undefined).
    *
    * Output: (key..., n_days, total, fano). */
  def fanoFactor(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    Seq("n_days", "total", "fano", "day").foreach { r =>
      require(!keyCols.contains(r),
        s"key column name $r is reserved by fanoFactor")
    }
    val keyC = keyCols.map(col)
    val day = datediff(col(tsCol).cast("date"),
      to_date(lit("1970-01-01"))).cast("long")
    df.select(keyC :+ day.as("day"): _*)
      .groupBy(keyC :+ col("day"): _*)
      .agg(count(lit(1)).as("_c"))
      .groupBy(keyC: _*)
      .agg(count(lit(1)).as("n_days"),
        sum(col("_c")).as("total"),
        sum(col("_c") * col("_c")).as("_ssq"))
      .withColumn("fano",
        when(col("n_days") > 1,
          expr("CAST(n_days * _ssq - total * total AS DOUBLE) " +
            "/ CAST((n_days - 1) * total AS DOUBLE)")))
      .drop("_ssq")
  }

  /** Heavy-tail index per group (Hill estimator) — HOW heavy is the
    * tail of a measure's distribution: α̂ = m / Σ ln(x_i / x_ref)
    * over the m largest values against the (m+1)-th as reference.
    * Small α (≲2) = a genuinely heavy tail (the top documents/users
    * dominate totals — plan for skew handling, caps, winsorization);
    * large α = tails die fast and means can be trusted. The
    * parametric complement of [[giniConcentration]] and the number
    * that decides whether [[Features.winsorize]] thresholds are
    * cosmetic or load-bearing.
    *
    * Determinism: the tail is BOUNDED (m ≤ k, k small) — the only
    * collection is the per-group top-(k+1) multiset (rank-filtered
    * BEFORE collecting, group-partitioned window), and the ln-sum
    * folds over it in descending-value order, a fixed sequence both
    * engines replay (ties hold equal values — interchangeable fold
    * terms). Each term is ln(CAST/CAST) — one division, one
    * correctly-rounded libm-parity ln (the q94 precedent).
    *
    * Groups need ≥ 2 positive values; a tail of all-equal values has
    * Σ = 0 → α null (no tail information). Output: (group, m,
    * x_ref, alpha). */
  def tailIndex(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      k: Int = 100): DataFrame = {
    require(k >= 2 && k <= 10000, s"k must be in [2, 10000], got $k")
    val vt = df.schema(valueCol).dataType
    require(Seq("long", "integer", "short", "byte").contains(vt.typeName),
      s"valueCol $valueCol must be integral, got ${vt.typeName}")
    val w = Window.partitionBy(col(groupCol)).orderBy(col("_v").desc)
    val top = df
      .filter(col(valueCol).isNotNull && col(valueCol) > 0)
      .select(col(groupCol), col(valueCol).cast("long").as("_v"))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k + 1)
    top.groupBy(col(groupCol))
      .agg(sort_array(collect_list(col("_v")), asc = false).as("_xs"))
      .filter(size(col("_xs")) >= 2) // a 1-value group has no tail
      .withColumn("m", (size(col("_xs")) - 1).cast("long"))
      .withColumn("x_ref", element_at(col("_xs"), -1))
      .withColumn("_lnsum", lnSumUdf(col("_xs")))
      .withColumn("alpha",
        when(col("_lnsum") =!= 0.0,
          col("m").cast("double") / col("_lnsum")))
      .select(col(groupCol), col("m"), col("x_ref"), col("alpha"))
  }

  /** Descending-order sequential Σ ln(x_i/x_last) over the bounded
    * tail list (null for lists shorter than 2). */
  private val lnSumUdf = udf((xs: scala.collection.Seq[Long]) => {
    if (xs == null || xs.size < 2) None
    else {
      val ref = xs.last.toDouble
      var s = 0.0
      xs.init.foreach(x => s += math.log(x.toDouble / ref))
      Some(s)
    }
  })

  /** Chi-squared independence cells over two categorical columns —
    * the distribution-shift test behind "did the event-type mix
    * change between cohorts / snapshots / A-B arms": for every
    * (cond, cat) cell of the FULL contingency grid (absent
    * combinations included at observed = 0 — they carry real χ²
    * mass), the observed count, the independence-expected count
    * rt·ct/N, and the cell's χ² contribution (o − e)²/e. The caller
    * sums `chi2_term` against a critical value; per-cell rows are
    * emitted (not the scalar sum) because double summation order is
    * engine-specific while each cell is a FIXED IEEE sequence over
    * exact integer marginals — bitwise cross-engine, and the cells
    * ARE the diagnosis (which category moved).
    *
    * Complements [[drift]] (per-column value histogram compare) and
    * [[mutualInfo]] (association strength): χ² is the calibrated
    * test statistic with a null distribution.
    *
    * Scale shape: observed cells, row marginals, and column
    * marginals are three partial-agg aggregates (the grid never
    * materializes from raw rows); the full grid is the CROSS JOIN OF
    * THE TWO MARGINAL FRAMES — marginal-sized, not data-sized — with
    * observed counts left-joined on. A loud `maxCells` guard (two
    * narrow distinct counts) rejects runaway-cardinality columns
    * before the grid exists. Null category values are excluded
    * (both engines' GROUP BY treat them as a real group, but a
    * contingency test over "unknown" is the caller's modeling
    * choice — make it explicit with a coalesce upstream). */
  /** Mixture concentration diagnostics — for each group, how evenly
    * its mass spreads across items: Kish effective sample size
    * ESS = (Σw)²/Σw² (the "how many equal items is this worth"
    * number a mixture designer reads before trusting per-group
    * statistics), its ratio to the item count (1.0 = perfectly
    * even), and the dominant item's share. Complements
    * [[giniConcentration]] (inequality index) with the
    * reweighting-literature units downstream sampling math uses.
    *
    * Exactness: masses are integral (enforced), so Σw and Σw² are
    * exact 64-bit sums; ESS and the shares are fixed IEEE sequences
    * over them. Overflow contract, guarded loudly post-agg: Σw² must
    * stay under 2⁶² — per-item masses beyond ~10⁹ need a coarser
    * unit (same discipline as [[Features.scaleBy]]).
    *
    * Shape: one (group, item) partial agg, one group-level agg on
    * the items frame. Output: (group, n_items, total_mass,
    * max_share, ess, ess_ratio). */
  def mixtureDiagnostics(
      df: DataFrame,
      groupCol: String,
      itemCol: String,
      weightCol: String): DataFrame = {
    val wt = df.schema(weightCol).dataType
    require(Seq("long", "integer", "short", "byte").contains(wt.typeName),
      s"weightCol $weightCol must be integral for exact sums, " +
        s"got ${wt.typeName}")
    Seq("n_items", "total_mass", "max_share", "ess", "ess_ratio", "_ssq",
      "_mx").foreach { r =>
      require(!df.columns.contains(r),
        s"input column name $r is reserved by mixtureDiagnostics")
    }
    val masses = df
      .groupBy(col(groupCol), col(itemCol))
      .agg(sum(col(weightCol).cast("long")).as("_m"))
    val agg = masses.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_items"),
        sum(col("_m")).as("total_mass"),
        sum(col("_m") * col("_m")).as("_ssq"),
        max(col("_m")).as("_mx"))
    val risky = agg.filter(col("_ssq") > Long.MaxValue / 4)
      .select(col(groupCol)).limit(1).collect()
    require(risky.isEmpty,
      s"mixtureDiagnostics: group '${risky.headOption.map(_.get(0))}' " +
        "has a squared-mass sum in the top quarter of the 64-bit " +
        "range - possible overflow; coarsen the weight unit")
    agg.select(col(groupCol), col("n_items"), col("total_mass"),
      expr("CAST(_mx AS DOUBLE) / CAST(total_mass AS DOUBLE)")
        .as("max_share"),
      expr("CAST(total_mass AS DOUBLE) * CAST(total_mass AS DOUBLE) " +
        "/ CAST(_ssq AS DOUBLE)").as("ess"),
      expr("(CAST(total_mass AS DOUBLE) * CAST(total_mass AS DOUBLE) " +
        "/ CAST(_ssq AS DOUBLE)) / CAST(n_items AS DOUBLE)")
        .as("ess_ratio"))
  }

  def chiSquaredCells(
      df: DataFrame,
      condCol: String,
      catCol: String,
      maxCells: Long = 1000000L): DataFrame = {
    Seq("obs", "expected", "chi2_term", "_rt", "_ct", "_n").foreach { r =>
      require(!df.columns.contains(r),
        s"input column name $r is reserved by chiSquaredCells")
    }
    val base = df
      .filter(col(condCol).isNotNull && col(catCol).isNotNull)
      .select(col(condCol), col(catCol))
    val obs = base.groupBy(col(condCol), col(catCol))
      .agg(count(lit(1)).as("obs"))
    val rt = base.groupBy(col(condCol)).agg(count(lit(1)).as("_rt"))
    val ct = base.groupBy(col(catCol)).agg(count(lit(1)).as("_ct"))
    val dims = rt.agg(count(lit(1))).head().getLong(0) ->
      ct.agg(count(lit(1))).head().getLong(0)
    require(dims._1 * dims._2 <= maxCells,
      s"contingency grid ${dims._1} x ${dims._2} exceeds " +
        s"maxCells=$maxCells — these columns are not categorical " +
        "at test granularity; bucket them first")
    val n = base.agg(count(lit(1)).as("_n"))
    rt.crossJoin(ct).crossJoin(broadcast(n))
      .join(obs, Seq(condCol, catCol), "left")
      .withColumn("obs", coalesce(col("obs"), lit(0L)))
      .withColumn("expected",
        expr("CAST(_rt * _ct AS DOUBLE) / CAST(_n AS DOUBLE)"))
      .withColumn("chi2_term",
        expr("(CAST(obs AS DOUBLE) - expected) " +
          "* (CAST(obs AS DOUBLE) - expected) / expected"))
      .select(col(condCol), col(catCol), col("obs"),
        col("_rt").as("row_total"), col("_ct").as("col_total"),
        col("expected"), col("chi2_term"))
  }

  /** Mann–Whitney rank-sum comparison of two groups' value
    * distributions — the nonparametric A/B screen ("did source X's
    * quality scores shift against source Y's?") that a means test
    * gets wrong on heavy-tailed data: one parked outlier drags a
    * mean arbitrarily, while ranks have a 50% breakdown point
    * (same reason [[madOutliers]] uses medians).
    *
    * EXACT INTEGER rank arithmetic: ranks never materialize per row.
    * From per-distinct-value counts, the doubled midrank of a tie
    * group is 2·cum − cnt + 1 (an integer), so the doubled rank sum
    * 2R_A = Σ cnt_A·(2·cum − cnt + 1) and the doubled U statistic
    * u2_a = 2R_A − n_a·(n_a+1) are BIGINTs — bitwise cross-engine.
    * The tie-correction term Σ(t³ − t) is emitted alongside so any
    * significance convention can be applied downstream; the
    * rank-biserial effect size r = u2_a/(n_a·n_b) − 1 is the one
    * IEEE division emitted.
    *
    * Scale shape: one (value) partial-agg shuffle, then the global
    * cumulative count via the two-phase bucket spelling (fixed-width
    * buckets on the value range; per-bucket partitioned windows over
    * the DISTINCT-value frame; a B-row summary self-join for the
    * bucket offsets) — never an unpartitioned window, never per-row
    * ranks. Output: ONE row (n_a, n_b, u2_a, tie_cubed_sum,
    * effect_r). */
  def rankSumTest(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      groupA: String,
      groupB: String,
      coarseBuckets: Int = 64): DataFrame = {
    require(groupA != groupB, "groupA and groupB must differ")
    require(coarseBuckets > 0,
      s"coarseBuckets must be positive, got $coarseBuckets")
    val inGroups = df.filter(col(groupCol).isin(groupA, groupB))
    val nNull = inGroups.filter(col(valueCol).isNull).limit(1).count()
    require(nNull == 0L,
      s"rankSumTest: null $valueCol values in the compared groups — " +
        "ranks cannot order nulls; filter or impute them explicitly")
    val counts = inGroups
      .groupBy(col(valueCol).as("_v"))
      .agg(count(lit(1)).as("_cnt"),
        sum(when(col(groupCol) === groupA, 1L).otherwise(0L)).as("_ca"))
    val mm = counts.agg(min("_v").as("_mn"), max("_v").as("_mx"))
    val bucketed = counts.crossJoin(broadcast(mm))
      .withColumn("_b",
        when(col("_mx") === col("_mn"), lit(0))
          .otherwise(least(
            floor((col("_v") - col("_mn"))
              / (col("_mx") - col("_mn")) * coarseBuckets).cast("int"),
            lit(coarseBuckets - 1))))
      .drop("_mn", "_mx")
    val bt = bucketed.groupBy("_b").agg(sum("_cnt").as("_bt"))
    val off = bt.as("a")
      .join(bt.as("b"), col("a._b") < col("b._b"))
      .groupBy(col("b._b").as("_b")).agg(sum(col("a._bt")).as("_off"))
    val wb = Window.partitionBy("_b").orderBy("_v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = bucketed
      .join(broadcast(off), Seq("_b"), "left")
      .withColumn("_cum",
        sum(col("_cnt")).over(wb) + coalesce(col("_off"), lit(0L)))
    cum
      .agg(
        sum(col("_ca")).as("n_a"),
        sum(col("_cnt") - col("_ca")).as("n_b"),
        sum(col("_ca") * (lit(2L) * col("_cum") - col("_cnt") + 1L))
          .as("_r2a"),
        sum(col("_cnt") * col("_cnt") * col("_cnt") - col("_cnt"))
          .as("tie_cubed_sum"))
      .withColumn("u2_a",
        col("_r2a") - col("n_a") * (col("n_a") + 1L))
      .withColumn("effect_r",
        when(col("n_a") > 0 && col("n_b") > 0,
          col("u2_a").cast("double")
            / (col("n_a") * col("n_b")).cast("double") - 1.0))
      .select(col("n_a"), col("n_b"), col("u2_a"),
        col("tie_cubed_sum"), col("effect_r"))
  }

  /** Benford's-law first-digit audit — the forensic screen for
    * fabricated or synthetic numeric data: organically-grown
    * magnitudes (prices, populations, file sizes) put digit d first
    * with probability log10(1+1/d); invented numbers don't. Emits,
    * per key and digit 1..9, the observed count/share, the Benford
    * expectation, and the chi-squared cell term — cells, not a
    * summed statistic, per the chiSquaredCells discipline (double
    * summation order is engine-specific; the cells are the
    * diagnosis).
    *
    * The first digit is EXTRACTED IN INTEGER SPACE: the value goes
    * through DECIMAL(18,`scale`) (exact), scales to a BIGINT, and
    * the digit is the first character of its decimal rendering —
    * no log10 near a power-of-10 boundary, no float formatting
    * seam; bit-identical anywhere. Non-positive and null values are
    * excluded (Benford is defined on positive magnitudes).
    *
    * Shape: one keyed count agg + a 9-row grid join per key.
    * Shares/terms at 6 decimals (the ln face). */
  def benford(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      scale: Int = 2): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    require(scale >= 0 && scale <= 6,
      s"scale must be in [0, 6], got $scale")
    val keyC = keyCols.map(col)
    val dec = org.apache.spark.sql.types.DecimalType(18, scale)
    val cents = (col(valueCol).cast(dec) *
      math.pow(10, scale).toLong).cast("long")
    // cents >= 1 keeps the grid honest: a positive value that rounds
    // to 0 at this scale would put digit '0' outside the 1..9 grid,
    // and a value overflowing DECIMAL(18,scale) yields a null digit —
    // either way n_total would count rows the grid can't show and
    // shares would no longer sum to 1. Both are excluded from counts
    // AND totals (totals derive from counts below).
    val counts = df
      .filter(col(valueCol).isNotNull && col(valueCol) > 0)
      .select(keyC :+ cents.as("_cents"): _*)
      .filter(col("_cents") >= 1L)
      .select(keyC :+
        substring(col("_cents").cast("string"), 1, 1).cast("long")
          .as("digit"): _*)
      .groupBy(keyC :+ col("digit"): _*)
      .agg(count(lit(1)).as("n_obs"))
    val totals = counts.groupBy(keyC: _*)
      .agg(sum("n_obs").as("_n"))
    val grid = totals
      .select(keyC :+ col("_n") :+
        explode(sequence(lit(1L), lit(9L))).as("digit"): _*)
    grid
      .join(counts, keyCols :+ "digit", "left")
      .withColumn("n_obs", coalesce(col("n_obs"), lit(0L)))
      .withColumn("share", round(
        col("n_obs").cast("double") / col("_n").cast("double"), 6))
      .withColumn("benford_share", round(
        log(lit(1.0) + lit(1.0) / col("digit").cast("double"))
          / log(lit(10.0)), 6))
      .withColumn("chi2_term", round(
        (col("n_obs").cast("double")
          - col("_n").cast("double") * (
            log(lit(1.0) + lit(1.0) / col("digit").cast("double"))
              / log(lit(10.0))))
          * (col("n_obs").cast("double")
            - col("_n").cast("double") * (
              log(lit(1.0) + lit(1.0) / col("digit").cast("double"))
                / log(lit(10.0))))
          / (col("_n").cast("double") * (
            log(lit(1.0) + lit(1.0) / col("digit").cast("double"))
              / log(lit(10.0)))), 6))
      .select(keyC ++ Seq(col("digit"), col("n_obs"),
        col("_n").as("n_total"), col("share"), col("benford_share"),
        col("chi2_term")): _*)
  }

  /** Population Stability Index between a reference and a current
    * snapshot — THE deployed-model monitoring metric: PSI < 0.1 is
    * stable, 0.1–0.25 drifting, > 0.25 act. Per key,
    * PSI = Σ_bins (p_ref − p_cur)·ln(p_ref/p_cur) over `bins`
    * fixed-width bins sized from the REFERENCE's min/max (current
    * values outside clamp into the edge bins — new mass beyond the
    * reference range must count, not vanish); empty-bin shares clamp
    * at `floor` (1e-6) so ln stays finite, the standard practice.
    *
    * Determinism: bin counts are exact integers; each share/term is
    * a fixed IEEE chain; the bin fold runs in bin order; the face
    * rounds at 6 (ln ulp variance — q94 discipline).
    *
    * Shape: one narrow min/max agg on the reference, one keyed
    * count agg per side, a bins-sized grid join. Nothing
    * driver-side, nothing row-scaled beyond the two count passes.
    *
    * Output per key: (n_ref, n_cur, psi). Keys missing from either
    * side are dropped (no distribution to compare). */
  def psi(
      ref: DataFrame,
      cur: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      bins: Int = 10,
      floor: Double = 1e-6): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    require(bins >= 2 && bins <= 10000,
      s"bins must be in [2, 10000], got $bins")
    require(floor > 0.0 && floor < 0.1,
      s"floor must be in (0, 0.1), got $floor")
    val keyC = keyCols.map(col)
    val x = col(valueCol).cast("double")
    val bounds = ref.filter(x.isNotNull)
      .groupBy(keyC: _*)
      .agg(min(x).as("_lo"), max(x).as("_hi"))
    def binned(df: DataFrame, side: String): DataFrame =
      df.filter(x.isNotNull)
        .join(bounds, keyCols)
        .withColumn("_bin",
          when(col("_hi") === col("_lo"), lit(0L)).otherwise(
            greatest(lit(0L), least(lit(bins - 1L),
              floor_(((x - col("_lo")) / (col("_hi") - col("_lo")))
                * bins).cast("long")))))
        .groupBy(keyC :+ col("_bin"): _*)
        .agg(count(lit(1)).as(s"_n_$side"))
    val grid = bounds
      .select(keyC :+ explode(sequence(lit(0L),
        lit(bins - 1L))).as("_bin"): _*)
    val cells = grid
      .join(binned(ref, "ref"), keyCols :+ "_bin", "left")
      .join(binned(cur, "cur"), keyCols :+ "_bin", "left")
      .withColumn("_n_ref", coalesce(col("_n_ref"), lit(0L)))
      .withColumn("_n_cur", coalesce(col("_n_cur"), lit(0L)))
    val totals = cells.groupBy(keyC: _*)
      .agg(sum("_n_ref").as("n_ref"), sum("_n_cur").as("n_cur"))
    val terms = cells.join(totals, keyCols)
      .filter(col("n_ref") > 0 && col("n_cur") > 0)
      .withColumn("_pr", greatest(
        col("_n_ref").cast("double") / col("n_ref").cast("double"),
        lit(floor)))
      .withColumn("_pc", greatest(
        col("_n_cur").cast("double") / col("n_cur").cast("double"),
        lit(floor)))
      .withColumn("_term",
        (col("_pr") - col("_pc")) * log(col("_pr") / col("_pc")))
    terms
      .groupBy(keyC :+ col("n_ref") :+ col("n_cur"): _*)
      .agg(sort_array(collect_list(struct(col("_bin"), col("_term"))))
        .as("_ts"))
      .withColumn("psi", round(
        aggregate(transform(col("_ts"), s => s.getField("_term")),
          lit(0.0), (acc, t) => acc + t), 6))
      .select(keyC ++ Seq(col("n_ref"), col("n_cur"), col("psi")): _*)
  }

  // spark's `floor(Column)` is shadowed inside this object by nothing,
  // but the local name makes the bin expression read unambiguously
  private def floor_(c: Column): Column =
    org.apache.spark.sql.functions.floor(c)

  /** Welch's unequal-variance t-test between two groups — the A/B
    * screen for MEANS where [[rankSumTest]] screens distributions.
    * All moments are EXACT: values go through DECIMAL(18,2) sums
    * (associative — identical under any partial-agg order) and
    * DECIMAL(38,4) squared sums, then t and the Welch–Satterthwaite
    * df are one fixed IEEE chain over those exact inputs — no
    * transcendental, bit-identical cross-engine, no rounding face
    * needed.
    *
    * Output: one row (n_a, n_b, mean_a, mean_b, t_stat, df) —
    * nulls when either group has < 2 rows or both variances are 0. */
  def welchTTest(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      groupA: String,
      groupB: String): DataFrame = {
    val d2 = org.apache.spark.sql.types.DecimalType(18, 2)
    val d4 = org.apache.spark.sql.types.DecimalType(38, 4)
    val x = col(valueCol).cast(d2)
    def side(g: String, tag: String): DataFrame =
      df.filter(col(groupCol) === g && col(valueCol).isNotNull)
        .agg(count(lit(1)).as(s"n_$tag"),
          sum(x).as(s"_s1_$tag"),
          sum((x * x).cast(d4)).as(s"_s2_$tag"))
    val m = side(groupA, "a").crossJoin(side(groupB, "b"))
    def meanC(t: String): Column =
      col(s"_s1_$t").cast("double") / col(s"n_$t").cast("double")
    def varN(t: String): Column = {
      // sample variance / n, the Welch ingredient: computed as
      // (n·Σx² − (Σx)²) / (n·(n−1)) / n in one fixed chain
      val n = col(s"n_$t").cast("double")
      ((n * col(s"_s2_$t").cast("double")
        - col(s"_s1_$t").cast("double") * col(s"_s1_$t").cast("double"))
        / (n * (n - 1.0))) / n
    }
    m.withColumn("mean_a", when(col("n_a") > 0, meanC("a")))
      .withColumn("mean_b", when(col("n_b") > 0, meanC("b")))
      .withColumn("_va", when(col("n_a") > 1, varN("a")))
      .withColumn("_vb", when(col("n_b") > 1, varN("b")))
      .withColumn("_se2", col("_va") + col("_vb"))
      .withColumn("t_stat",
        when(col("_se2") > 0,
          (col("mean_a") - col("mean_b")) / sqrt(col("_se2"))))
      .withColumn("df",
        when(col("_se2") > 0,
          (col("_se2") * col("_se2")) /
            (col("_va") * col("_va") / (col("n_a").cast("double") - 1.0)
              + col("_vb") * col("_vb")
                / (col("n_b").cast("double") - 1.0))))
      .select(col("n_a"), col("n_b"), col("mean_a"), col("mean_b"),
        col("t_stat"), col("df"))
  }

  /** Two-sample Kolmogorov–Smirnov test — the DISTRIBUTION-shape
    * screen beside [[welchTTest]] (means) and [[rankSumTest]]
    * (stochastic dominance): D = sup |F_a − F_b| over the pooled
    * support. Computed ENTIRELY in exact integer space: values go
    * through decimal scaling to BIGINT, cumulative counts come from
    * the two-phase bucketed prefix sum ([[Skew.cumulativeCounts]] —
    * no global window), and D's numerator is
    * max |cumA·n_b − cumB·n_a| in DECIMAL(38,0) — cross-engine
    * bitwise with NO float accumulation anywhere; the only IEEE
    * steps are the final division and the α=0.05 critical-value
    * compare (1.358·sqrt((n_a+n_b)/(n_a·n_b)), the large-sample
    * approximation).
    *
    * Output: one row (n_a, n_b, d_num DECIMAL(38,0), d, significant)
    * — nulls when either group is empty. */
  def ksTest(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      groupA: String,
      groupB: String,
      scale: Int = 2,
      coarseBuckets: Int = 64): DataFrame = {
    require(scale >= 0 && scale <= 6,
      s"scale must be in [0, 6], got $scale")
    val dec = org.apache.spark.sql.types.DecimalType(18, scale)
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val mult = math.pow(10, scale).toLong
    def side(g: String, tag: String): DataFrame =
      df.filter(col(groupCol) === g && col(valueCol).isNotNull)
        .select((col(valueCol).cast(dec) * mult).cast("long").as("_v"))
        .groupBy("_v").agg(count(lit(1)).as(tag))
    val a = side(groupA, "_ca")
    val b = side(groupB, "_cb")
    val joined = a.join(b, Seq("_v"), "outer")
      .na.fill(0L, Seq("_ca", "_cb"))
    def cum(cnt: String, out: String): DataFrame =
      Skew.cumulativeCounts(
        joined.select(col("_v"), col(cnt).as("_cnt")), coarseBuckets)
        .select(col("_v"), col("_cum").as(out))
    val merged = cum("_ca", "_cuma").join(cum("_cb", "_cumb"), "_v")
    val ns = joined.agg(sum("_ca").as("n_a"), sum("_cb").as("n_b"))
    merged.crossJoin(broadcast(ns))
      .withColumn("_dn", abs(
        col("_cuma").cast(dec38) * col("n_b")
          - col("_cumb").cast(dec38) * col("n_a")))
      .groupBy(col("n_a"), col("n_b"))
      .agg(max(col("_dn")).cast(dec38).as("d_num"))
      .withColumn("d",
        when(col("n_a") > 0 && col("n_b") > 0,
          col("d_num").cast("double") /
            (col("n_a").cast("double") * col("n_b").cast("double"))))
      .withColumn("significant",
        when(col("n_a") > 0 && col("n_b") > 0,
          col("d") > lit(1.358) * sqrt(
            (col("n_a").cast("double") + col("n_b").cast("double")) /
              (col("n_a").cast("double") * col("n_b").cast("double")))))
      .select(col("n_a"), col("n_b"),
        // face type: the exact decimal converts once to double (the
        // same one deterministic narrowing on any engine)
        col("d_num").cast("double").as("d_num"), col("d"),
        col("significant"))
  }

  /** Two-sample 1-D Wasserstein (earth-mover) distance — the
    * MAGNITUDE-sensitive drift metric beside [[ksTest]]'s sup-norm
    * (KS says "the CDFs separate somewhere"; W₁ says "by how much
    * mass × distance" — a tiny uniform shift of every value moves
    * W₁ by exactly the shift but barely moves D, and a spike in one
    * bin moves D but barely W₁; drift triage wants both):
    * W₁ = ∫|F_A − F_B| dv over the merged value grid.
    *
    * EXACT INTEGER core (the [[ksTest]] discipline): values
    * integerize through DECIMAL(18,scale)·10^scale; on each
    * constant-difference interval [v_i, v_{i+1}) the term
    * |cumA·n_b − cumB·n_a| · Δv accumulates in DECIMAL(38,0) —
    * order-free, bitwise cross-engine; the single final IEEE chain
    * divides by n_a·n_b·10^scale to land back in value units, at
    * the 6-decimal face.
    *
    * Shape: two (value)-keyed count aggs, the bucketed two-phase
    * prefix sum ([[Skew.cumulativeCounts]] — no global window), and
    * the successor value via the SAME bucketing: lead within each
    * coarse bucket + a ≤coarseBuckets-row boundary frame for the
    * last value of each bucket. Nothing row-scaled after the count
    * aggs.
    *
    * Output: one row (n_a, n_b, w1_num, w1) — w1 null when either
    * side is empty. */
  def wasserstein1(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      groupA: String,
      groupB: String,
      scale: Int = 2,
      coarseBuckets: Int = 64): DataFrame = {
    require(scale >= 0 && scale <= 6,
      s"scale must be in [0, 6], got $scale")
    require(coarseBuckets > 0,
      s"coarseBuckets must be positive, got $coarseBuckets")
    val dec = org.apache.spark.sql.types.DecimalType(18, scale)
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val mult = math.pow(10, scale).toLong
    def side(g: String, tag: String): DataFrame =
      df.filter(col(groupCol) === g && col(valueCol).isNotNull)
        .select((col(valueCol).cast(dec) * mult).cast("long").as("_v"))
        .groupBy("_v").agg(count(lit(1)).as(tag))
    val a = side(groupA, "_ca")
    val b = side(groupB, "_cb")
    val joined = a.join(b, Seq("_v"), "outer")
      .na.fill(0L, Seq("_ca", "_cb"))
    def cum(cnt: String, out: String): DataFrame =
      Skew.cumulativeCounts(
        joined.select(col("_v"), col(cnt).as("_cnt")), coarseBuckets)
        .select(col("_v"), col("_cum").as(out))
    // successor of each value on the merged grid, via the same
    // coarse bucketing as the prefix sums: lead within the bucket,
    // bucket-boundary rows read the next non-empty bucket's min
    val mm = joined.agg(min("_v").as("_mn"), max("_v").as("_mx"))
    val bucketed = joined.select("_v").crossJoin(broadcast(mm))
      .withColumn("_b",
        expr(s"((_v - _mn) * $coarseBuckets) div (_mx - _mn + 1)"))
      .select("_v", "_b")
    val bmin = bucketed.groupBy("_b").agg(min("_v").as("_bmin"))
    val nxt = bmin.as("x")
      .join(bmin.as("y"), col("x._b") < col("y._b"))
      .groupBy(col("x._b").as("_b"))
      .agg(min(col("y._bmin")).as("_next_start"))
    val wLead = Window.partitionBy("_b").orderBy("_v")
    val leads = bucketed
      .join(broadcast(nxt), Seq("_b"), "left")
      .withColumn("_vnext",
        coalesce(lead(col("_v"), 1).over(wLead), col("_next_start")))
      .select(col("_v"), col("_vnext"))
    val merged = cum("_ca", "_cuma").join(cum("_cb", "_cumb"), "_v")
      .join(leads, "_v")
    val ns = joined.agg(sum("_ca").as("n_a"), sum("_cb").as("n_b"))
    merged.crossJoin(broadcast(ns))
      // the global last value has no span: its term is 0 (and its
      // CDF difference is identically 0 anyway)
      .withColumn("_term", abs(
        col("_cuma").cast(dec38) * col("n_b")
          - col("_cumb").cast(dec38) * col("n_a"))
        * coalesce(col("_vnext") - col("_v"), lit(0L)).cast(dec38))
      .groupBy(col("n_a"), col("n_b"))
      .agg(coalesce(sum(col("_term")), lit(0L).cast(dec38))
        .as("_w1num"))
      .select(col("n_a"), col("n_b"),
        col("_w1num").cast("double").as("w1_num"),
        when(col("n_a") > 0 && col("n_b") > 0,
          round(col("_w1num").cast("double") /
            (col("n_a").cast("double") * col("n_b").cast("double")
              * lit(mult.toDouble)), 6)).as("w1"))
  }

  /** Watermark/late-data audit — the measurement that SIZES a
    * streaming job's watermark before it exists: replaying a day of
    * events in arrival order (`seqCol` — an ingest sequence or
    * offset), how far behind the running event-time high-water mark
    * does each event arrive? An event is LATE when some
    * earlier-arriving event of the same key already carried a later
    * event time; `withWatermark(d)` silently DROPS exactly the
    * events whose lateness exceeds d, so d must be read off this
    * audit (e.g. max or p95 lateness), not guessed.
    *
    * Shape: one key-partitioned window ordered by arrival (running
    * max over the preceding frame — never a global window), one
    * partial agg. Lateness is exact integer µs; the percentile is
    * the exact interpolated one (the q77 cross-engine contract).
    *
    * Output per key: (n, late_n, late_rate, max_late_us,
    * p95_late_us). */
  def latenessAudit(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      seqCol: String): DataFrame = {
    require(keyCols.nonEmpty,
      "latenessAudit needs >= 1 key column (a global audit would be " +
        "one unpartitioned window; add a constant key deliberately " +
        "if that is really wanted)")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(seqCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val late = df
      .withColumn("_us", unix_micros(col(tsCol)))
      .withColumn("_mx", max(col("_us")).over(w))
      .withColumn("_late_us",
        when(col("_mx").isNull, lit(0L))
          .otherwise(greatest(col("_mx") - col("_us"), lit(0L))))
    late.groupBy(keyCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("_late_us") > 0L, 1L).otherwise(0L)).as("late_n"),
        max(col("_late_us")).as("max_late_us"),
        expr("percentile(_late_us, 0.95)").as("p95_late_us"))
      .withColumn("late_rate",
        col("late_n").cast("double") / col("n").cast("double"))
      .select((keyCols.map(col) ++ Seq(col("n"), col("late_n"),
        col("late_rate"), col("max_late_us"), col("p95_late_us"))): _*)
  }

  /** Spearman rank correlation between two numeric columns — the
    * monotone-association screen the Pearson-style moments misses
    * (heavy tails, nonlinear-but-monotone metric pairs: quality
    * score vs length, tokens vs bytes). ρ is Pearson over AVERAGE
    * ranks with standard tie handling.
    *
    * EXACT INTEGER spelling, no global window: values decimal-scale
    * to BIGINT (the ksTest contract); per distinct value the
    * ≤-cumulative count comes from the two-phase bucketed prefix sum
    * ([[Skew.cumulativeCounts]]); a value's DOUBLED average rank is
    * the integer 2·cum − cnt + 1 (doubling clears the tie .5 — the
    * factor cancels in ρ), ranks join back to rows by value, and all
    * five moments (Σx, Σy, Σx², Σy², Σxy over doubled ranks)
    * accumulate in DECIMAL(38,0) — order-free, bit-identical on any
    * engine or partitioning. ρ is ONE fixed IEEE expression over the
    * exact moments, emitted at 6 decimals: the moments exceed 2^53,
    * and the decimal→double narrowing is a measured 1-ULP
    * cross-engine seam (BigDecimal.doubleValue vs DuckDB's
    * hugeint cast — observed at sf0.1), exactly the class the
    * repo's 6-decimal face exists for. Moment magnitudes reach ~4n⁴, so DECIMAL(38,0)
    * is exact to ~2e9 rows and fails loudly (ANSI overflow) past it —
    * at that scale rank correlation should ride a sampled frame
    * anyway.
    *
    * Rows with a null on either side are dropped (a rank needs both
    * coordinates). Output: one row (n, rho) — rho null when either
    * side has zero rank variance (all values tied).
    *
    * Reference analog: none (SURVEY §2.2 — no correlation of any
    * kind); north-star pipeline surface. */
  def spearmanCorr(
      df: DataFrame,
      xCol: String,
      yCol: String,
      scale: Int = 2,
      coarseBuckets: Int = 64): DataFrame = {
    require(scale >= 0 && scale <= 6,
      s"scale must be in [0, 6], got $scale")
    val dec = org.apache.spark.sql.types.DecimalType(18, scale)
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val mult = math.pow(10, scale).toLong
    val rows = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select((col(xCol).cast(dec) * mult).cast("long").as("_x"),
        (col(yCol).cast(dec) * mult).cast("long").as("_y"))
    def doubledRanks(c: String): DataFrame = {
      val vals = rows.select(col(c).as("_v"))
        .groupBy("_v").agg(count(lit(1)).as("_cnt"))
      Skew.cumulativeCounts(vals, coarseBuckets)
        .select(col("_v").as(c),
          (lit(2L) * col("_cum") - col("_cnt") + 1L).as(s"_r$c"))
    }
    val ranked = rows
      .join(doubledRanks("_x"), "_x")
      .join(doubledRanks("_y"), "_y")
    val m = ranked.agg(
      count(lit(1)).as("n"),
      sum(col("_r_x").cast(dec38)).as("_sx"),
      sum(col("_r_y").cast(dec38)).as("_sy"),
      sum(col("_r_x").cast(dec38) * col("_r_x").cast(dec38)).as("_sxx"),
      sum(col("_r_y").cast(dec38) * col("_r_y").cast(dec38)).as("_syy"),
      sum(col("_r_x").cast(dec38) * col("_r_y").cast(dec38)).as("_sxy"))
    // every product below stays in exact decimal; each term narrows
    // to double ONCE (the deterministic nearest-even conversion),
    // then one IEEE division over one sqrt
    m.select(col("n"),
      when(
        (col("n") * col("_sxx") - col("_sx") * col("_sx"))
          .cast("double") > 0.0 &&
        (col("n") * col("_syy") - col("_sy") * col("_sy"))
          .cast("double") > 0.0,
        round(
          (col("n") * col("_sxy") - col("_sx") * col("_sy"))
            .cast("double") /
            sqrt((col("n") * col("_sxx") - col("_sx") * col("_sx"))
              .cast("double") *
              (col("n") * col("_syy") - col("_sy") * col("_sy"))
                .cast("double")), 6))
        .as("rho"))
  }

  /** Jensen–Shannon divergence between a reference and a current
    * snapshot, per key — [[psi]]'s zero-safe sibling: where PSI
    * needs an empty-bin floor to keep ln finite, JSD handles empty
    * bins NATIVELY (each term is p·ln(p/m) with m = (p+q)/2, and
    * 0·ln(0/m) ≡ 0 — a bin empty on one side contributes
    * p·ln 2 ≤ ln 2, never infinity), is symmetric in the two
    * histograms (operationally the ROLES differ: bins are sized
    * from `ref`'s range, so swap the frames and the binning moves
    * too), and is bounded in [0, ln 2] — the preferred drift number
    * when snapshots can have disjoint support (new-category
    * launches, cold starts).
    *
    * Same shape and determinism as psi: bins sized from the
    * REFERENCE's per-key min/max (current values clamp into the edge
    * bins), exact integer bin counts, each term one fixed IEEE
    * chain, the sum folded in bin order (sorted fold — engine- and
    * partition-stable), face at 6 decimals (the ln discipline).
    *
    * Output per key: (n_ref, n_cur, jsd). Keys missing from either
    * side are dropped. */
  def jsDivergence(
      ref: DataFrame,
      cur: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      bins: Int = 10): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    require(bins >= 2 && bins <= 10000,
      s"bins must be in [2, 10000], got $bins")
    val keyC = keyCols.map(col)
    val x = col(valueCol).cast("double")
    val bounds = ref.filter(x.isNotNull)
      .groupBy(keyC: _*)
      .agg(min(x).as("_lo"), max(x).as("_hi"))
    def binned(df: DataFrame, side: String): DataFrame =
      df.filter(x.isNotNull)
        .join(bounds, keyCols)
        .withColumn("_bin",
          when(col("_hi") === col("_lo"), lit(0L)).otherwise(
            greatest(lit(0L), least(lit(bins - 1L),
              floor_(((x - col("_lo")) / (col("_hi") - col("_lo")))
                * bins).cast("long")))))
        .groupBy(keyC :+ col("_bin"): _*)
        .agg(count(lit(1)).as(s"_n_$side"))
    val grid = bounds
      .select(keyC :+ explode(sequence(lit(0L),
        lit(bins - 1L))).as("_bin"): _*)
    val cells = grid
      .join(binned(ref, "ref"), keyCols :+ "_bin", "left")
      .join(binned(cur, "cur"), keyCols :+ "_bin", "left")
      .withColumn("_n_ref", coalesce(col("_n_ref"), lit(0L)))
      .withColumn("_n_cur", coalesce(col("_n_cur"), lit(0L)))
    val totals = cells.groupBy(keyC: _*)
      .agg(sum("_n_ref").as("n_ref"), sum("_n_cur").as("n_cur"))
    val terms = cells.join(totals, keyCols)
      .filter(col("n_ref") > 0 && col("n_cur") > 0)
      .withColumn("_p",
        col("_n_ref").cast("double") / col("n_ref").cast("double"))
      .withColumn("_q",
        col("_n_cur").cast("double") / col("n_cur").cast("double"))
      .withColumn("_m", (col("_p") + col("_q")) / 2.0)
      // 0·ln(0/m) ≡ 0 spelled explicitly — log(0) would be null/-inf
      .withColumn("_term",
        when(col("_p") > 0.0,
          lit(0.5) * col("_p") * log(col("_p") / col("_m")))
          .otherwise(lit(0.0)) +
        when(col("_q") > 0.0,
          lit(0.5) * col("_q") * log(col("_q") / col("_m")))
          .otherwise(lit(0.0)))
    terms
      .groupBy(keyC :+ col("n_ref") :+ col("n_cur"): _*)
      .agg(sort_array(collect_list(struct(col("_bin"), col("_term"))))
        .as("_ts"))
      .withColumn("jsd", round(
        aggregate(transform(col("_ts"), s => s.getField("_term")),
          lit(0.0), (acc, t) => acc + t), 6))
      .select(keyC ++ Seq(col("n_ref"), col("n_cur"), col("jsd")): _*)
  }

  /** Wilson-score comparison of two proportions per key — the
    * conversion-rate readout beside [[ratioMetricCI]] (which handles
    * per-unit RATIO metrics; this one handles row-level Bernoulli
    * outcomes): each group's success share gets the Wilson score
    * interval (the standard small-n-safe interval — a plain normal
    * interval can leave [0,1]; Wilson cannot), plus the pooled
    * two-proportion z statistic. Exact integer counts; every
    * emitted number is one fixed IEEE chain at 6 decimals; z comes
    * from the shared literal table (ciPct ∈ {90, 95, 99}).
    *
    * Input: rows with a key, a group column with EXACTLY the two
    * values `groupA`/`groupB` of interest (others ignored), and a
    * boolean success column. Output per key: (n_a, k_a, p_a,
    * a_lo, a_hi, n_b, k_b, p_b, b_lo, b_hi, z_stat) — null faces
    * where a side is empty or the pooled variance degenerates. */
  def proportionTest(
      df: DataFrame,
      keyCols: Seq[String],
      groupCol: String,
      groupA: String,
      groupB: String,
      successCol: Column,
      ciPct: Int = 95): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    require(ZByCi.contains(ciPct),
      s"ciPct must be one of ${ZByCi.keys.toSeq.sorted.mkString("/")} " +
        s"(normal quantile literal table), got $ciPct")
    require(groupA != groupB, "groupA and groupB must differ")
    val z = ZByCi(ciPct)
    val keyC = keyCols.map(col)
    val m = df
      .filter(col(groupCol).isin(groupA, groupB) &&
        successCol.isNotNull)
      .groupBy(keyC: _*)
      .agg(
        sum(when(col(groupCol) === groupA, 1L).otherwise(0L))
          .as("n_a"),
        sum(when(col(groupCol) === groupA && successCol, 1L)
          .otherwise(0L)).as("k_a"),
        sum(when(col(groupCol) === groupB, 1L).otherwise(0L))
          .as("n_b"),
        sum(when(col(groupCol) === groupB && successCol, 1L)
          .otherwise(0L)).as("k_b"))
    def wilson(n: Column, k: Column, lower: Boolean): Column = {
      val nd = n.cast("double")
      val p = k.cast("double") / nd
      val z2 = lit(z * z)
      val center = p + z2 / (lit(2.0) * nd)
      val spread = lit(z) * sqrt(
        (p * (lit(1.0) - p) + z2 / (lit(4.0) * nd)) / nd)
      val denom = lit(1.0) + z2 / nd
      if (lower) (center - spread) / denom
      else (center + spread) / denom
    }
    val pa = col("k_a").cast("double") / col("n_a").cast("double")
    val pb = col("k_b").cast("double") / col("n_b").cast("double")
    val pPool = (col("k_a") + col("k_b")).cast("double") /
      (col("n_a") + col("n_b")).cast("double")
    val seP = sqrt(pPool * (lit(1.0) - pPool) *
      (lit(1.0) / col("n_a").cast("double")
        + lit(1.0) / col("n_b").cast("double")))
    m.select(keyC ++ Seq(
      col("n_a"), col("k_a"),
      round(when(col("n_a") > 0L, pa), 6).as("p_a"),
      round(when(col("n_a") > 0L,
        wilson(col("n_a"), col("k_a"), lower = true)), 6).as("a_lo"),
      round(when(col("n_a") > 0L,
        wilson(col("n_a"), col("k_a"), lower = false)), 6).as("a_hi"),
      col("n_b"), col("k_b"),
      round(when(col("n_b") > 0L, pb), 6).as("p_b"),
      round(when(col("n_b") > 0L,
        wilson(col("n_b"), col("k_b"), lower = true)), 6).as("b_lo"),
      round(when(col("n_b") > 0L,
        wilson(col("n_b"), col("k_b"), lower = false)), 6).as("b_hi"),
      round(when(col("n_a") > 0L && col("n_b") > 0L &&
        pPool > 0.0 && pPool < 1.0, (pa - pb) / seP), 6)
        .as("z_stat")): _*)
  }

  /** Cohen's kappa between two label columns — chance-corrected
    * agreement, the inter-annotator / metadata-vs-classifier trust
    * number ([[cramersV]] measures association strength; kappa
    * measures AGREEMENT on the same label space): κ = (p_o − p_e) /
    * (1 − p_e) with p_o the observed agreement share and p_e the
    * chance agreement Σ_l (rowTot_l·colTot_l)/n².
    *
    * Exactness with NO fold at all: the diagonal count and every
    * marginal are exact integers; p_e's numerator Σ ta·tb
    * accumulates in DECIMAL(38,0) (products exact, sum order-free),
    * so p_o, p_e, and κ are each ONE IEEE division/chain over exact
    * integers — no order-sensitive double summation anywhere. Faces
    * at 6 decimals. Null-label rows drop; κ is null when p_e = 1
    * (degenerate single-label case).
    *
    * Shape: one (a,b) partial agg + two marginal aggs + one
    * broadcast-joined scalar attach. Levels are NOT bounded — only
    * marginal frames flow, never a grid.
    *
    * Output: one row (n, po, pe, kappa). */
  def cohensKappa(
      df: DataFrame,
      aCol: String,
      bCol: String): DataFrame = {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val base = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .select(col(aCol).cast("string").as("_a"),
        col(bCol).cast("string").as("_b"))
    val stats = base.agg(count(lit(1)).as("n"),
      sum(when(col("_a") === col("_b"), 1L).otherwise(0L)).as("_diag"))
    val ta = base.groupBy("_a").agg(count(lit(1)).as("_ta"))
    val tb = base.groupBy("_b").agg(count(lit(1)).as("_tb"))
    val peNum = ta
      .join(tb, ta("_a") === tb("_b"))
      .agg(coalesce(sum(col("_ta").cast(dec38) *
        col("_tb").cast(dec38)), lit(0L).cast(dec38)).as("_pe_num"))
    val j = stats.crossJoin(broadcast(peNum))
    val po = col("_diag").cast("double") / col("n").cast("double")
    val pe = col("_pe_num").cast("double") /
      (col("n").cast("double") * col("n").cast("double"))
    j.select(col("n"),
      round(when(col("n") > 0L, po), 6).as("po"),
      round(when(col("n") > 0L, pe), 6).as("pe"),
      round(when(col("n") > 0L && pe < 1.0,
        (po - pe) / (lit(1.0) - pe)), 6).as("kappa"))
  }

  /** Fleiss' kappa over a long-format ratings frame (one row per
    * (item, label) rating) — chance-corrected agreement for r ≥ 2
    * raters per item ([[cohensKappa]] handles exactly two NAMED
    * raters; Fleiss handles any fixed panel size without caring
    * which rater said what — the multi-labeler QA readout for an
    * annotation pipeline): κ = (P̄ − P̄_e)/(1 − P̄_e) with
    * P̄ = [Σ_i Σ_j n_ij² − n·r] / [n·r·(r−1)] and
    * P̄_e = Σ_j c_j² / (n·r)².
    *
    * Fleiss requires a FIXED rating count per item; a ragged panel
    * fails loudly (min ≠ max ratings — there is no silently-correct
    * answer). Null-label ratings drop their whole item (a partial
    * panel is a ragged panel). Exactness: n_ij, Σn_ij², and the
    * category totals are exact integers; c_j² accumulates in
    * DECIMAL(38,0) ([[cohensKappa]]'s p_e discipline — order-free,
    * no float fold anywhere); P̄, P̄_e, κ are each ONE IEEE chain at
    * the 6-decimal face. κ is null when P̄_e = 1 (single category).
    *
    * Shape: one (item, label) partial agg, one per-item agg, one
    * per-category agg, three broadcast scalar attaches. Items and
    * categories both unbounded — only aggregate frames flow.
    *
    * Output: one row (n_items, n_raters, n_categories, p_bar, p_e,
    * kappa). */
  def fleissKappa(
      df: DataFrame,
      itemCol: String,
      labelCol: String): DataFrame = {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val rated = df.select(col(itemCol).as("_i"),
      col(labelCol).cast("string").as("_l"))
    val dropped = rated
      .groupBy("_i")
      .agg(sum(when(col("_l").isNull, 1L).otherwise(0L)).as("_bad"))
      .filter(col("_bad") === 0L)
      .select("_i")
    val base = rated.join(dropped, Seq("_i"), "left_semi")
    val nij = base.groupBy("_i", "_l").agg(count(lit(1)).as("_c"))
    val perItem = nij.groupBy("_i")
      .agg(sum(col("_c") * col("_c")).as("_s2"),
        sum(col("_c")).as("_r"))
    val panel = perItem.agg(
      count(lit(1)).as("n_items"),
      min(col("_r")).as("_rmin"), max(col("_r")).as("_rmax"),
      sum(col("_s2").cast(dec38)).as("_s2sum"))
    val cats = nij.groupBy("_l")
      .agg(sum(col("_c")).as("_cj"))
      .agg(count(lit(1)).as("n_categories"),
        coalesce(sum(col("_cj").cast(dec38) * col("_cj").cast(dec38)),
          lit(0L).cast(dec38)).as("_pe_num"))
    val head = panel.head()
    if (!head.isNullAt(1)) {
      val (rMin, rMax) = (head.getLong(1), head.getLong(2))
      require(rMin == rMax,
        s"fleissKappa needs a fixed panel: items carry between $rMin " +
          s"and $rMax non-null ratings — complete or drop the ragged " +
          "items upstream")
      require(rMin >= 2L,
        s"fleissKappa needs >= 2 raters per item, got $rMin")
    }
    val j = panel.crossJoin(broadcast(cats))
    val nr = col("n_items").cast("double") * col("_rmin").cast("double")
    val pBar = (col("_s2sum").cast("double") -
      col("n_items").cast("double") * col("_rmin").cast("double")) /
      (nr * (col("_rmin").cast("double") - lit(1.0)))
    val pE = col("_pe_num").cast("double") / (nr * nr)
    j.select(col("n_items"),
      col("_rmin").as("n_raters"),
      col("n_categories"),
      round(when(col("n_items") > 0L, pBar), 6).as("p_bar"),
      round(when(col("n_items") > 0L, pE), 6).as("p_e"),
      round(when(col("n_items") > 0L && pE < 1.0,
        (pBar - pE) / (lit(1.0) - pE)), 6).as("kappa"))
  }

  /** Krippendorff's alpha (nominal) over a long-format ratings frame
    * — the agreement coefficient that TOLERATES missing ratings,
    * which is the regime real annotation pipelines live in
    * ([[fleissKappa]] demands a fixed panel and fails loudly on
    * ragged data; here a rater abstaining just shrinks that item's
    * panel): α = 1 − D_o/D_e over the coincidence matrix, in the
    * computational form A_o = Σ_u Σ_c n_uc(n_uc−1)/(m_u−1) and
    * A_e = Σ_c n_c(n_c−1)/(n−1), α = 1 − (n−A_o)/(n−A_e).
    *
    * Determinism: all n_uc / m_u / n_c moments are exact integers.
    * The per-item term I_u/(m_u−1) is a rational, so its sum would
    * be float-order-sensitive — instead each item's term is
    * quantized to the 6-decimal face (ONE IEEE division + round)
    * and summed as exact DECIMAL(18,6) — order-free and
    * bitwise cross-engine; the quantization perturbs α from the
    * textbook value by ≤ 5e-7 per item, far below reporting
    * resolution, and identically on both engines. A_e's single
    * global division and the final α are each one IEEE chain at the
    * 6-decimal face.
    *
    * Null-label ratings drop (that IS the missing-data case); items
    * left with < 2 ratings carry no pairable information and drop.
    * α is null when D_e = 0 (single category — undecidable).
    *
    * Shape: one (item, label) partial agg, one per-item agg, one
    * per-category agg, broadcast scalar attaches. Items, raters,
    * and categories all unbounded.
    *
    * Output: one row (n_items, n_ratings, n_categories, a_obs,
    * a_exp, alpha) — n_ratings counts only pairable ratings. */
  def krippendorffAlpha(
      df: DataFrame,
      itemCol: String,
      labelCol: String): DataFrame = {
    val dec6 = org.apache.spark.sql.types.DecimalType(18, 6)
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 6)
    val rated = df
      .filter(col(labelCol).isNotNull)
      .select(col(itemCol).as("_i"),
        col(labelCol).cast("string").as("_l"))
    val nuc = rated.groupBy("_i", "_l").agg(count(lit(1)).as("_c"))
    val perItem = nuc.groupBy("_i")
      .agg(sum(col("_c")).as("_m"),
        sum(col("_c") * (col("_c") - 1L)).as("_iu"))
      .filter(col("_m") >= 2L)
    val items = perItem.agg(
      count(lit(1)).as("n_items"),
      coalesce(sum(col("_m")), lit(0L)).as("_n"),
      coalesce(sum(
        round(col("_iu").cast("double") /
          (col("_m") - 1L).cast("double"), 6).cast(dec6)),
        lit(0L).cast(dec38)).as("_ao"))
    // marginals over PAIRABLE items only
    val cats = nuc.join(perItem.select("_i"), Seq("_i"), "left_semi")
      .groupBy("_l").agg(sum(col("_c")).as("_nc"))
      .agg(count(lit(1)).as("n_categories"),
        coalesce(sum(col("_nc") * (col("_nc") - 1L)), lit(0L))
          .as("_ae_num"))
    val j = items.crossJoin(broadcast(cats))
    val nD = col("_n").cast("double")
    val aO = col("_ao").cast("double")
    val aE = col("_ae_num").cast("double") /
      (col("_n") - 1L).cast("double")
    j.select(col("n_items"), col("_n").as("n_ratings"),
      col("n_categories"),
      round(when(col("n_items") > 0L, aO), 6).as("a_obs"),
      round(when(col("n_items") > 0L, aE), 6).as("a_exp"),
      round(when(col("n_items") > 0L && nD - aE =!= 0.0,
        lit(1.0) - (nD - aO) / (nD - aE)), 6).as("alpha"))
  }

  /** Normal quantiles for the delta-method CI levels this operator
    * supports — double literals shared verbatim with the SQL oracle
    * (no erf/quantile function exists portably in both engines). */
  private val ZByCi: Map[Int, Double] = Map(
    90 -> 1.6448536269514722,
    95 -> 1.959963984540054,
    99 -> 2.5758293035489004)

  /** Delta-method confidence interval for a per-group RATIO metric
    * Σx/Σy over analysis units — the closed-form sibling of
    * [[Sampling.bootstrapMeanCI]] and the standard A/B-platform
    * spelling for per-user ratios (clicks per session, revenue per
    * order): a ratio of sums is NOT a mean of per-unit ratios, and
    * its variance needs the covariance term,
    * var(r) ≈ (s²_x + r²·s²_y − 2r·s_xy) / (n·ȳ²).
    *
    * Exactness: per-unit x/y decimal-scale to integers; the five
    * moments (Σx, Σy, Σx², Σy², Σxy) accumulate in DECIMAL(38,0) —
    * order-free, partition-proof; ratio/se/bounds are one fixed IEEE
    * chain over the exact moments, emitted at 6 decimals (the sqrt
    * face). z comes from a literal table shared with the oracle
    * (ciPct ∈ {90, 95, 99} — no portable normal quantile exists),
    * anything else is loudly rejected.
    *
    * Output per key: (keys*, n_units, ratio, se, ci_lo, ci_hi) —
    * null ratio/se/bounds when Σy = 0 or n < 2. Units with a null
    * in either column are dropped. */
  def ratioMetricCI(
      df: DataFrame,
      keyCols: Seq[String],
      numCol: String,
      denCol: String,
      ciPct: Int = 95,
      scale: Int = 2): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    require(ZByCi.contains(ciPct),
      s"ciPct must be one of ${ZByCi.keys.toSeq.sorted.mkString("/")} " +
        s"(normal quantile literal table), got $ciPct")
    require(scale >= 0 && scale <= 6,
      s"scale must be in [0, 6], got $scale")
    val dec = org.apache.spark.sql.types.DecimalType(18, scale)
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val mult = math.pow(10, scale).toLong
    val z = ZByCi(ciPct)
    val keyC = keyCols.map(col)
    val base = df
      .filter(col(numCol).isNotNull && col(denCol).isNotNull)
      .select(keyC :+
        (col(numCol).cast(dec) * mult).cast("long").as("_x") :+
        (col(denCol).cast(dec) * mult).cast("long").as("_y"): _*)
    val m = base.groupBy(keyC: _*)
      .agg(count(lit(1)).as("n_units"),
        sum(col("_x").cast(dec38)).as("_sx"),
        sum(col("_y").cast(dec38)).as("_sy"),
        sum(col("_x").cast(dec38) * col("_x").cast(dec38)).as("_sxx"),
        sum(col("_y").cast(dec38) * col("_y").cast(dec38)).as("_syy"),
        sum(col("_x").cast(dec38) * col("_y").cast(dec38)).as("_sxy"))
    val n = col("n_units").cast("double")
    val sx = col("_sx").cast("double")
    val sy = col("_sy").cast("double")
    // sample (co)variances from the exact moments:
    // s² = (n·Σaa − Σa·Σb-form) / (n·(n−1)) — each term narrows to
    // double once, then one fixed chain
    val vx = (col("n_units") * col("_sxx") - col("_sx") * col("_sx"))
      .cast("double") / (n * (n - 1.0))
    val vy = (col("n_units") * col("_syy") - col("_sy") * col("_sy"))
      .cast("double") / (n * (n - 1.0))
    val cxy = (col("n_units") * col("_sxy") - col("_sx") * col("_sy"))
      .cast("double") / (n * (n - 1.0))
    val ratio = sx / sy
    val yBar = sy / n
    val se = sqrt((vx + ratio * ratio * vy - lit(2.0) * ratio * cxy)
      / (n * yBar * yBar))
    val ok = col("_sy") =!= 0L && col("n_units") >= 2L
    m.select(keyC ++ Seq(col("n_units"),
      round(when(ok, ratio), 6).as("ratio"),
      round(when(ok, se), 6).as("se"),
      round(when(ok, ratio - lit(z) * se), 6).as("ci_lo"),
      round(when(ok, ratio + lit(z) * se), 6).as("ci_hi")): _*)
  }

  /** Pairwise Pearson correlation matrix over k numeric columns in
    * ONE aggregate pass — the metric-redundancy screen a feature/
    * quality dashboard needs ("length, token count, and byte count
    * are 0.98-correlated; keep one"). Rows with a null in ANY of the
    * listed columns are dropped (listwise-complete — the matrix is
    * then positive semi-definite over a single common row set, which
    * pairwise deletion cannot guarantee). Each r emits at 6 decimals
    * (the spearmanCorr decimal→double narrowing seam).
    *
    * EXACT spelling: values decimal-scale to integers; all k sums,
    * k square-sums, and k(k−1)/2 cross-sums accumulate in
    * DECIMAL(38,0) in the SAME single aggregate (one scan, no per-
    * pair jobs); each r is ONE fixed IEEE expression over exact
    * moments (the [[spearmanCorr]] spelling — bit-identical cross-
    * engine, no rounding face). Sums of squares reach n·x², so with
    * |x| ≤ 10^p the exactness bound is n ≤ 10^(38−2p) rows — fails
    * loudly (ANSI decimal overflow) past it, never silently.
    *
    * `cols` is loudly bounded (2..20): the agg width is k(k+5)/2
    * expressions, a driver-side constant.
    *
    * Output: (col_a, col_b, n, r) for every pair col_a < col_b in
    * the given order; r null when either side has zero variance. */
  def corrMatrix(
      df: DataFrame,
      cols: Seq[String],
      scale: Int = 2): DataFrame = {
    require(cols.size >= 2 && cols.size <= 20,
      s"cols must number 2..20, got ${cols.size}")
    require(cols.distinct.size == cols.size, "cols must be distinct")
    require(scale >= 0 && scale <= 6,
      s"scale must be in [0, 6], got $scale")
    val dec = org.apache.spark.sql.types.DecimalType(18, scale)
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val mult = math.pow(10, scale).toLong
    val base = df
      .filter(cols.map(c => col(c).isNotNull).reduce(_ && _))
      .select(cols.map(c =>
        (col(c).cast(dec) * mult).cast("long").as(s"_$c")): _*)
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    val aggs =
      cols.map(c => sum(col(s"_$c").cast(dec38)).as(s"_s_$c")) ++
      cols.map(c => sum(col(s"_$c").cast(dec38) *
        col(s"_$c").cast(dec38)).as(s"_q_$c")) ++
      pairs.map { case (a, b) =>
        sum(col(s"_$a").cast(dec38) * col(s"_$b").cast(dec38))
          .as(s"_x_${a}_$b")
      }
    val m = base.agg(count(lit(1)).as("_n"), aggs: _*)
    val rows = array(pairs.map { case (a, b) =>
      val num = (col("_n") * col(s"_x_${a}_$b")
        - col(s"_s_$a") * col(s"_s_$b")).cast("double")
      val va = (col("_n") * col(s"_q_$a")
        - col(s"_s_$a") * col(s"_s_$a")).cast("double")
      val vb = (col("_n") * col(s"_q_$b")
        - col(s"_s_$b") * col(s"_s_$b")).cast("double")
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        col("_n").as("n"),
        round(when(va > 0.0 && vb > 0.0, num / sqrt(va * vb)), 6)
          .as("r"))
    }: _*)
    m.select(explode(rows).as("_p")).select(col("_p.*"))
  }

  /** Cramér's V association between two categorical columns — the
    * contingency-strength one-number beside [[chiSquaredCells]]'s
    * diagnosis grid: V = sqrt(χ² / (n·(min(r,c)−1))) ∈ [0,1],
    * the "are source and language entangled" screen a mixture
    * designer runs before treating dimensions as independent.
    *
    * Exactness: observed counts and marginals are exact integers
    * (one (a,b) partial agg + two marginal aggs); each cell's
    * expected value and χ² term is a fixed IEEE chain; the χ² SUM —
    * the one order-sensitive step — folds over cells in SORTED
    * (a, b) order via the repo's sort_array + aggregate idiom (the
    * charEntropy discipline), deterministic on any partitioning and
    * reproduced exactly by list_aggregate in SQL. The fold collects
    * the FULL r×c grid (zero cells included — they carry χ² mass)
    * into one row, so levels are loudly bounded by `maxLevels` per
    * side. χ²/V emit at 6 decimals (the ln/exp face discipline).
    *
    * Null levels are dropped (no association mass in "unknown" —
    * spell an explicit sentinel level if nulls should count).
    *
    * Output: one row (n, levels_a, levels_b, chi2, v). */
  def cramersV(
      df: DataFrame,
      aCol: String,
      bCol: String,
      maxLevels: Int = 1000): DataFrame = {
    require(maxLevels >= 2 && maxLevels <= 10000,
      s"maxLevels must be in [2, 10000], got $maxLevels")
    val base = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .select(col(aCol).cast("string").as("_a"),
        col(bCol).cast("string").as("_b"))
    val obs = base.groupBy("_a", "_b").agg(count(lit(1)).as("_o"))
    val ra = base.groupBy("_a").agg(count(lit(1)).as("_ta"))
    val rb = base.groupBy("_b").agg(count(lit(1)).as("_tb"))
    val la = ra.limit(maxLevels + 1).count()
    val lb = rb.limit(maxLevels + 1).count()
    require(la <= maxLevels && lb <= maxLevels,
      s"cramersV folds the FULL ${la}x$lb contingency grid into one " +
        s"row; a side exceeds maxLevels=$maxLevels — raise it only " +
        "if the level count is genuinely bounded")
    val n = base.agg(count(lit(1)).as("_n"))
    // full grid: every (a, b) level pair, zero cells included
    val grid = ra.crossJoin(rb)
      .join(obs, Seq("_a", "_b"), "left")
      .na.fill(0L, Seq("_o"))
    val cells = grid.crossJoin(broadcast(n))
      .select(col("_a"), col("_b"),
        ((col("_o").cast("double")
          - col("_ta").cast("double") * col("_tb").cast("double")
            / col("_n").cast("double"))
          * (col("_o").cast("double")
            - col("_ta").cast("double") * col("_tb").cast("double")
              / col("_n").cast("double"))
          / (col("_ta").cast("double") * col("_tb").cast("double")
            / col("_n").cast("double"))).as("_t"))
    val folded = cells
      .agg(sort_array(collect_list(struct(col("_a"), col("_b"),
        col("_t")))).as("_cs"))
      .select(aggregate(transform(col("_cs"), s => s.getField("_t")),
        lit(0.0), (acc, t) => acc + t).as("_chi2"))
    folded.crossJoin(broadcast(n))
      .crossJoin(broadcast(ra.agg(count(lit(1)).as("_la"))))
      .crossJoin(broadcast(rb.agg(count(lit(1)).as("_lb"))))
      .select(col("_n").as("n"), col("_la").as("levels_a"),
        col("_lb").as("levels_b"),
        round(col("_chi2"), 6).as("chi2"),
        round(
          when(least(col("_la"), col("_lb")) > 1L,
            sqrt(col("_chi2") / (col("_n").cast("double")
              * (least(col("_la"), col("_lb")) - 1L).cast("double")))),
          6).as("v"))
  }

  /** One-vs-rest Kolmogorov–Smirnov per key with the asymptotic
    * p-value — [[ksTest]] run for EVERY key against the pooled rest
    * in one pass: "which sources' length distributions deviate from
    * the corpus". D is exact-integer like ksTest (the numerator
    * max |cumKey·n_rest − cumRest·n_key| in DECIMAL(38,0)); the
    * p-value is the two-sided asymptotic min(1, 2·exp(−2·e·D²)) with
    * e = n·n_rest/(n+n_rest) — exp is the one transcendental, so p
    * rounds at 6 decimals (the q94 ln/exp-face discipline). Feeds
    * [[bhFdr]] for multiplicity control.
    *
    * Shape: one (key, value) partial agg + one global value agg; the
    * evaluation grid is keys × distinct values (sup of a step-
    * function difference can land where EITHER side jumps, so the
    * full union grid is required for exactness); per-key prefix sums
    * run as a key-partitioned window over the VALUES frame (values-
    * sized, not rows-sized). Keys are loudly bounded by `maxKeys` —
    * the grid and the keys-sized downstream are driver-safe by
    * construction.
    *
    * Output per key: (key, n, n_rest, d, p_value). Null-key and
    * null-value rows are dropped. */
  def ksTestByKey(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      scale: Int = 2,
      maxKeys: Int = 1000): DataFrame = {
    require(scale >= 0 && scale <= 6,
      s"scale must be in [0, 6], got $scale")
    require(maxKeys >= 2, s"maxKeys must be >= 2, got $maxKeys")
    val dec = org.apache.spark.sql.types.DecimalType(18, scale)
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val mult = math.pow(10, scale).toLong
    val base = df
      .filter(col(keyCol).isNotNull && col(valueCol).isNotNull)
      .select(col(keyCol).cast("string").as("_k"),
        (col(valueCol).cast(dec) * mult).cast("long").as("_v"))
    val keyCounts = base.groupBy("_k").agg(count(lit(1)).as("_nk"))
    val overK = keyCounts.limit(maxKeys + 1).count()
    require(overK <= maxKeys,
      s"ksTestByKey: more than $maxKeys keys — the keys × values " +
        "evaluation grid scales with the key count; raise maxKeys " +
        "only if the key cardinality is genuinely bounded")
    val perKV = base.groupBy("_k", "_v").agg(count(lit(1)).as("_ck"))
    val vals = base.groupBy("_v").agg(count(lit(1)).as("_call"))
    val nAll = base.agg(count(lit(1)).as("_nall"))
    // full grid: every key at every global jump point
    val grid = vals.crossJoin(broadcast(keyCounts))
      .join(perKV, Seq("_k", "_v"), "left")
      .na.fill(0L, Seq("_ck"))
    val wk = Window.partitionBy("_k").orderBy("_v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = grid
      .withColumn("_cumk", sum(col("_ck")).over(wk))
      .withColumn("_cumall", sum(col("_call")).over(wk))
    cum.crossJoin(broadcast(nAll))
      .withColumn("_nrest", col("_nall") - col("_nk"))
      .withColumn("_dn", abs(
        col("_cumk").cast(dec38) * col("_nrest")
          - (col("_cumall") - col("_cumk")).cast(dec38) * col("_nk")))
      .groupBy(col("_k").as(keyCol), col("_nk").as("n"),
        col("_nrest").as("n_rest"))
      .agg(max(col("_dn")).cast(dec38).as("_dnum"))
      .withColumn("d",
        when(col("n") > 0 && col("n_rest") > 0,
          col("_dnum").cast("double") /
            (col("n").cast("double") * col("n_rest").cast("double"))))
      .withColumn("p_value",
        when(col("d").isNotNull, round(least(lit(1.0),
          lit(2.0) * exp(lit(-2.0)
            * (col("n").cast("double") * col("n_rest").cast("double")
              / (col("n").cast("double") + col("n_rest").cast("double")))
            * col("d") * col("d"))), 6)))
      .select(col(keyCol), col("n"), col("n_rest"), col("d"),
        col("p_value"))
  }

  /** Benjamini–Hochberg FDR control over a frame of (test, p-value)
    * rows — the multiplicity gate for the drift battery: run a
    * per-key test family ([[ksTestByKey]], per-key PSI, per-slice
    * Welch) and BH decides WHICH rejections survive at false-
    * discovery rate `q` instead of alpha-per-test flag inflation.
    *
    * EXACT spelling, no global window: p-values quantize to 1e-6
    * (they arrive at the 6-decimal face anyway); per distinct p the
    * ≤-cumulative test count (= the LARGEST rank among ties, the
    * correct-and-most-permissive BH index for a tied block) comes
    * from the two-phase prefix sum; the step-up condition
    * p ≤ rank·q/m compares as the exact integer cross-product
    * p6·m ≤ rank·q6; the cutoff p* is the largest flagged p, and a
    * test rejects iff its p ≤ p* — all DECIMAL/BIGINT until the
    * reported threshold face.
    *
    * Tests are key-level facts, loudly bounded by `maxTests` (the
    * neymanAllocation posture: a test family is bounded by
    * construction; 100 TB changes row counts, not test counts).
    *
    * Output per input row: (idCol, p, rank, rejected) with rank =
    * the max-tie BH index of its p. */
  def bhFdr(
      df: DataFrame,
      idCol: String,
      pCol: String,
      q: Double = 0.05,
      maxTests: Long = 100000L,
      coarseBuckets: Int = 64): DataFrame = {
    require(q > 0.0 && q < 1.0, s"q must be in (0,1), got $q")
    require(maxTests >= 1L && maxTests <= 100000000L,
      s"maxTests must be in [1, 1e8], got $maxTests")
    val q6 = math.round(q * 1e6)
    val raw = df
      .filter(col(pCol).isNotNull)
      .select(col(idCol), col(pCol).as("p"),
        (col(pCol).cast(org.apache.spark.sql.types.DecimalType(18, 6))
          * 1000000L).cast("long").as("_p6"))
    // materialize the family ONCE, bounded: checkpointing THROUGH
    // limit(maxTests+1) caps materialization at maxTests+1 rows in a
    // single upstream evaluation — the caller's upstream (often a
    // whole per-key test battery like ksTestByKey) would otherwise
    // recompute for the guard action, the range check, AND the
    // three-way self-reference below. The count on the checkpoint
    // then decides the size guard for free. localCheckpoint blocks
    // do not survive executor loss — on a real cluster the battery
    // simply recomputes on the retried lineage, the acceptable
    // failure mode for a keys-sized frame.
    val base = raw.limit((maxTests + 1L).toInt).localCheckpoint(true)
    val over = base.count()
    require(over <= maxTests,
      s"bhFdr: more than $maxTests tests — BH is a key-level gate; " +
        "raise maxTests only if the test family is genuinely bounded")
    val bad = base.filter(col("_p6") < 0L || col("_p6") > 1000000L)
      .limit(1).collect()
    require(bad.isEmpty,
      s"bhFdr: p-value out of [0,1]: ${if (bad.nonEmpty) bad.head else ""}")
    val vals = base.groupBy(col("_p6").as("_v"))
      .agg(count(lit(1)).as("_cnt"))
    val cum = Skew.cumulativeCounts(vals, coarseBuckets)
      .select(col("_v").as("_p6"), col("_cum").as("rank"))
    val m = base.agg(count(lit(1)).as("_m"))
    val flagged = cum.crossJoin(broadcast(m))
      .filter(col("_p6") * col("_m") <= col("rank") * lit(q6))
    val pStar = flagged.agg(max("_p6").as("_pstar"))
    base
      .join(cum, "_p6")
      .crossJoin(broadcast(pStar))
      .select(col(idCol), col("p"), col("rank"),
        (col("_pstar").isNotNull && col("_p6") <= col("_pstar"))
          .as("rejected"))
  }

  /** The encoding artifacts [[encodingAudit]] hunts, each a LITERAL
    * byte sequence so both engines count via substring replacement —
    * no regex, hence no Java-vs-RE2 dialect risk:
    *   - `latin1_utf8` "Ã" — UTF-8 bytes re-decoded as Latin-1 (the
    *     classic café→cafÃ© double-encoding tell)
    *   - `smart_quote` "â€™" — a Windows-1252 right quote after the
    *     same double-decode
    *   - `replacement` U+FFFD — a decoder already gave up
    *   - `zwsp` U+200B — zero-width space (copy-paste shrapnel that
    *     breaks tokenizers invisibly)
    *   - `ctl` U+0001 — a C0 control byte that survived extraction */
  val EncodingArtifacts: Seq[(String, String)] = Seq(
    "latin1_utf8" -> "\u00C3",
    "smart_quote" -> "\u00E2\u20AC\u2122",
    "replacement" -> "\uFFFD",
    "zwsp" -> "\u200B",
    "ctl" -> "\u0001")

  /** Per-document encoding-artifact audit — the mojibake screen every
    * web-scraped corpus needs before tokenization (double-encoded
    * UTF-8, replacement chars, zero-width and control bytes all
    * inflate token counts and poison dedup fingerprints while being
    * invisible in most viewers).
    *
    * One codegen'd projection per document: each artifact count is
    * `(len(text) − len(replace(text, artifact))) / len(artifact)` —
    * exact integer arithmetic over literal substrings, a single scan,
    * no shuffle, no UDF, and bitwise-reproducible in any SQL engine.
    * `clean` flags documents with zero artifacts; the per-source
    * aggregate is one `groupBy` away and deliberately not baked in.
    *
    * Output: (id, n_latin1_utf8, n_smart_quote, n_replacement,
    * n_zwsp, n_ctl, n_artifacts, clean). */
  def encodingAudit(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val c = coalesce(col(textCol), lit("")) // null text = clean, not null flags
    val counts = EncodingArtifacts.map { case (name, pat) =>
      ((length(c) - length(replace(c, lit(pat), lit("")))) /
        pat.length).cast("long").as(s"n_$name")
    }
    df.select(col(idCol) +: counts: _*)
      .withColumn("n_artifacts",
        EncodingArtifacts.map { case (n, _) => col(s"n_$n") }
          .reduce(_ + _))
      .withColumn("clean", col("n_artifacts") === 0L)
  }
}
