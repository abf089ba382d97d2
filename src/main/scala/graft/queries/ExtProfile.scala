package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.TextFunctions
import graft.operators.{Dedup, Multimodal, Similarity}
import graft.queries.Catalog.{Q, table, events}
import graft.queries.ExtShared._

/** Profiling, sketches, and the drift/stats battery: HLL/KLL/heavy hitters, PSI, chi-squared, KS, CUSUM, Welch, Benford, ACF, EWMA, seasonal decompose.
  * Split from the former single Extensions.scala (round 7) for
  * navigability — zero behavior change; [[Extensions.all]] still
  * concatenates every family. */
private[queries] object ExtProfile {

  private val q67_profile = Q(
    "q67_profile",
    // One-scan dataset profile (exact mode for the oracle; production
    // default swaps distinct counts for HLL sketches).
    (s, dir) =>
      graft.operators.Profile.profile(
        table(s, dir, "lineitem"),
        Seq("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate"),
        exact = true)
        .orderBy("column"),
    Some("""WITH m AS (SELECT
        CAST(count(*) AS BIGINT) AS n,
        CAST(count(*) FILTER (l_orderkey IS NULL) AS BIGINT) AS nu1,
        CAST(count(DISTINCT l_orderkey) AS BIGINT) AS d1,
        CAST(min(l_orderkey) AS VARCHAR) AS mn1, CAST(max(l_orderkey) AS VARCHAR) AS mx1,
        CAST(count(*) FILTER (l_quantity IS NULL) AS BIGINT) AS nu2,
        CAST(count(DISTINCT l_quantity) AS BIGINT) AS d2,
        CAST(min(l_quantity) AS VARCHAR) AS mn2, CAST(max(l_quantity) AS VARCHAR) AS mx2,
        CAST(count(*) FILTER (l_returnflag IS NULL) AS BIGINT) AS nu3,
        CAST(count(DISTINCT l_returnflag) AS BIGINT) AS d3,
        min(l_returnflag) AS mn3, max(l_returnflag) AS mx3,
        CAST(count(*) FILTER (l_shipdate IS NULL) AS BIGINT) AS nu4,
        CAST(count(DISTINCT l_shipdate) AS BIGINT) AS d4,
        CAST(min(l_shipdate) AS VARCHAR) AS mn4,
        CAST(max(l_shipdate) AS VARCHAR) AS mx4
      FROM lineitem)
      SELECT 'l_orderkey' AS "column", n AS n_rows, nu1 AS n_nulls,
        d1 AS n_distinct, mn1 AS min_val, mx1 AS max_val FROM m
      UNION ALL SELECT 'l_quantity', n, nu2, d2, mn2, mx2 FROM m
      UNION ALL SELECT 'l_returnflag', n, nu3, d3, mn3, mx3 FROM m
      UNION ALL SELECT 'l_shipdate', n, nu4, d4, mn4, mx4 FROM m
      ORDER BY "column"""")
  )

  private val q118_hll_ledger = Q(
    "q118_hll_ledger",
    // Mergeable HLL distinct-count ledger: per-(event_type, shard)
    // Datasketches HLL sketches (8 shards standing in for daily
    // ingest batches), unioned per type — with two in-job gates:
    // shard-union estimate must EQUAL the one-pass estimate
    // (mergeability lossless), and the estimate must sit within 5%
    // of exact. Emits the exact per-type distinct-user counts so the
    // oracle is cross-engine-checkable while the sketch path stays
    // load-bearing (a gate failure fails the query).
    (s, dir) =>
      graft.operators.Sketches.gatedDistinctReport(
        events(s, dir).withColumn("shard", pmod(col("event_id"), lit(8))),
        Seq("event_type"), "shard", "user_id", lgK = 12, relErr = 0.05)
        .orderBy("event_type"),
    Some("""SELECT event_type,
        CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct
      FROM events GROUP BY 1 ORDER BY 1""")
  )

  private val q119_resample_fill = Q(
    "q119_resample_fill",
    // Time-series resample + gap fill: events to hourly buckets per
    // type — every hour of each type's span present (215 empty hours
    // at sf0.01 carry n_obs=0), gauge = per-bucket max(value)
    // forward-filled across gaps (order-free, so bitwise
    // cross-engine; a mean would be summation-order-dependent). Grid
    // generated from per-key span rows, fill window key-partitioned.
    (s, dir) =>
      graft.operators.TimeSeries.resampleFill(
        events(s, dir), Seq("event_type"), "ts", "value", stepSec = 3600L)
        .orderBy("event_type", "bucket_s"),
    Some("""WITH o AS (SELECT event_type,
        (epoch_us(ts)//1000000//3600)*3600 AS b,
        max(value) AS v, CAST(count(*) AS BIGINT) AS n_obs
      FROM events GROUP BY 1, 2),
      s AS (SELECT event_type, min(b) AS b0, max(b) AS b1 FROM o GROUP BY 1),
      g AS (SELECT event_type, unnest(range(b0, b1 + 3600, 3600)) AS b FROM s),
      j AS (SELECT g.event_type, g.b, o.v, coalesce(o.n_obs, 0) AS n_obs
        FROM g LEFT JOIN o USING (event_type, b))
      SELECT event_type, b AS bucket_s,
        last_value(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY b
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
        CAST(n_obs AS BIGINT) AS n_obs
      FROM j ORDER BY event_type, bucket_s""")
  )

  private val q125_kll_ledger = Q(
    "q125_kll_ledger",
    // KLL quantile ledger (the distribution twin of q118's HLL count
    // ledger, via custom native TypedImperativeAggregates over the
    // Datasketches KLL library): per-(event_type, shard) sketches
    // union per type, the merged estimate's TRUE rank is gated at
    // q +- 0.05 in one conditional-aggregate pass, and the emitted
    // answer is the EXACT lower-interpolation quantile (value at
    // ascending rank floor((n-1)q)+1) — cross-engine exact while
    // the sketch path stays load-bearing. KLL compaction flips
    // random coins, so nothing sketch-derived reaches the oracle.
    (s, dir) =>
      graft.operators.Sketches.gatedQuantileReport(
        events(s, dir).withColumn("shard", pmod(col("event_id"), lit(8))),
        Seq("event_type"), "shard", "value",
        quantiles = Seq(0.25, 0.5, 0.9, 0.99))
        .orderBy("event_type", "q"),
    Some("""WITH r AS (SELECT event_type, value,
        row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
        count(*) OVER (PARTITION BY event_type) AS n
        FROM events WHERE value IS NOT NULL),
      qs AS (SELECT unnest([0.25, 0.5, 0.9, 0.99]) AS q)
      SELECT event_type, q, value
      FROM r CROSS JOIN qs
      WHERE rn = CAST(floor((n - 1) * q) AS BIGINT) + 1
      ORDER BY event_type, q""")
  )

  private val q147_histogram = Q(
    "q147_histogram",
    // Per-source document-length histogram over declared [0, 600) x
    // 12 bins: the distribution SHAPE profiles and quantiles can't
    // show, with data-independent edges so snapshots compare.
    // Integer bin arithmetic, sentinel bins for out-of-range, only
    // occupied cells emit — one (group, bin) partial-agg shuffle.
    (s, dir) =>
      graft.operators.Profile.histogram(
        table(s, dir, "documents"), "source", "n_chars",
        lo = 0L, hi = 600L, nBins = 12)
        .orderBy("source", "bin"),
    Some("""SELECT source,
        CASE WHEN n_chars < 0 THEN -1
          WHEN n_chars >= 600 THEN 12
          ELSE (n_chars * 12) // 600 END AS bin,
        CAST(count(*) AS BIGINT) AS n
      FROM documents WHERE n_chars IS NOT NULL
      GROUP BY 1, 2 ORDER BY source, bin""")
  )

  private val q148_group_trend = Q(
    "q148_group_trend",
    // Per-event-type OLS trend of daily event volume — "is this
    // stream growing, and how fast" — fitted from the six exact
    // integer moment sums so slope/intercept/r² are each a fixed
    // IEEE sequence both engines replay bitwise. Day is rebased to
    // days-since-2020 (magnitude hygiene for the Σx·Σy products).
    (s, dir) =>
      graft.operators.TimeSeries.groupTrend(
        events(s, dir)
          .select(col("event_type"),
            datediff(col("ts").cast("date"), to_date(lit("2020-01-01")))
              .cast("long").as("day"))
          .groupBy("event_type", "day")
          .agg(count(lit(1)).as("cnt")),
        Seq("event_type"), "day", "cnt")
        .orderBy("event_type"),
    Some("""WITH d AS (SELECT event_type,
        CAST(date_diff('day', DATE '2020-01-01', CAST(ts AS DATE))
          AS BIGINT) AS day,
        CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2),
      m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(day) AS BIGINT) AS sx,
        CAST(sum(cnt) AS BIGINT) AS sy,
        CAST(sum(day * day) AS BIGINT) AS sxx,
        CAST(sum(day * cnt) AS BIGINT) AS sxy,
        CAST(sum(cnt * cnt) AS BIGINT) AS syy
      FROM d GROUP BY 1)
      SELECT event_type, n, sx, sy, sxx, sxy, syy,
        CAST(n * sxy - sx * sy AS DOUBLE)
          / CAST(NULLIF(n * sxx - sx * sx, 0) AS DOUBLE) AS slope,
        (CAST(sy AS DOUBLE)
          - (CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(NULLIF(n * sxx - sx * sx, 0) AS DOUBLE))
            * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept,
        (CAST(n * sxy - sx * sy AS DOUBLE)
          * CAST(n * sxy - sx * sy AS DOUBLE))
          / (CAST(NULLIF(n * sxx - sx * sx, 0) AS DOUBLE)
             * CAST(NULLIF(n * syy - sy * sy, 0) AS DOUBLE)) AS r2
      FROM m ORDER BY event_type""")
  )

  private val q155_chi_squared = Q(
    "q155_chi_squared",
    // Chi-squared mix-shift cells: event-type distribution across
    // even/odd epoch days — the full marginal-sized contingency grid
    // (absent cells at obs 0), expected counts and per-cell χ² terms
    // as fixed IEEE sequences over exact integer marginals.
    (s, dir) =>
      graft.operators.Profile.chiSquaredCells(
        events(s, dir).select(
          (datediff(col("ts").cast("date"), to_date(lit("1970-01-01")))
            .cast("long") % 2).as("half"),
          col("event_type")),
        "half", "event_type")
        .orderBy("half", "event_type"),
    Some("""WITH b AS (SELECT
        CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
          AS BIGINT) % 2 AS half, event_type
        FROM events WHERE event_type IS NOT NULL),
      o AS (SELECT half, event_type, CAST(count(*) AS BIGINT) AS obs
        FROM b GROUP BY 1, 2),
      rt AS (SELECT half, CAST(count(*) AS BIGINT) AS row_total
        FROM b GROUP BY 1),
      ct AS (SELECT event_type, CAST(count(*) AS BIGINT) AS col_total
        FROM b GROUP BY 1),
      n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM b),
      g AS (SELECT rt.half, ct.event_type,
          CAST(COALESCE(o.obs, 0) AS BIGINT) AS obs,
          rt.row_total, ct.col_total,
          CAST(rt.row_total * ct.col_total AS DOUBLE)
            / CAST(n.n AS DOUBLE) AS expected
        FROM rt CROSS JOIN ct CROSS JOIN n
        LEFT JOIN o ON o.half = rt.half
          AND o.event_type = ct.event_type)
      SELECT half, event_type, obs, row_total, col_total, expected,
        (CAST(obs AS DOUBLE) - expected)
          * (CAST(obs AS DOUBLE) - expected) / expected AS chi2_term
      FROM g ORDER BY half, event_type""")
  )

  private val q159_volume_anomaly = Q(
    "q159_volume_anomaly",
    // Ingest pager: per-event-type daily volume flagged against the
    // trailing 7-day mean/variance — exact integer moments from a
    // gap-correct RANGE window, 3σ test squared into integer cross
    // products (no sqrt, no libm), days with <5 baseline days never
    // flag.
    (s, dir) =>
      graft.operators.TimeSeries.volumeAnomaly(
        events(s, dir), Seq("event_type"), "ts",
        windowDays = 7, minDays = 5)
        .orderBy("event_type", "day"),
    Some("""WITH d AS (SELECT event_type,
        CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
          AS BIGINT) AS day,
        CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2),
      w AS (SELECT event_type, day, cnt,
        CAST(count(cnt) OVER fr AS BIGINT) AS trail_days,
        CAST(COALESCE(sum(cnt) OVER fr, 0) AS BIGINT) AS trail_sum,
        CAST(COALESCE(sum(cnt * cnt) OVER fr, 0) AS BIGINT) AS ssq
        FROM d WINDOW fr AS (PARTITION BY event_type ORDER BY day
          RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING))
      SELECT event_type, day, cnt, trail_days, trail_sum,
        CASE WHEN trail_days > 0 THEN CAST(trail_sum AS DOUBLE)
          / CAST(trail_days AS DOUBLE) END AS mean,
        CASE WHEN trail_days >= 5 THEN
          CAST(trail_days * cnt - trail_sum AS DOUBLE)
            * CAST(trail_days * cnt - trail_sum AS DOUBLE)
            * CAST(trail_days - 1 AS DOUBLE)
          > 9.0 * CAST(trail_days AS DOUBLE)
            * CAST(trail_days * ssq - trail_sum * trail_sum AS DOUBLE)
        ELSE FALSE END AS is_anomaly
      FROM w ORDER BY event_type, day""")
  )

  private val q162_interarrival = Q(
    "q162_interarrival",
    // Cadence fingerprint: exact p50/p90 of per-user inter-arrival
    // micros for each event type — lag deltas from one (user, type)
    // window, then the rank-arithmetic quantile ladder in long
    // format.
    (s, dir) =>
      graft.operators.TimeSeries.interArrivalProfile(
        events(s, dir), Seq("event_type"), Seq("user_id"),
        "ts", "event_id", pcts = Seq(50, 90))
        .orderBy("event_type", "pct"),
    Some("""WITH o AS (SELECT event_type, user_id, epoch_us(ts) AS us,
        lag(epoch_us(ts)) OVER (PARTITION BY user_id, event_type
          ORDER BY ts, event_id) AS prev
        FROM events),
      d AS (SELECT event_type, us - prev AS delta FROM o
        WHERE prev IS NOT NULL),
      c AS (SELECT event_type, delta, CAST(count(*) AS BIGINT) AS cnt
        FROM d GROUP BY 1, 2),
      s AS (SELECT event_type, delta, CAST(sum(cnt) OVER
          (PARTITION BY event_type ORDER BY delta
           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM c),
      n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps
        FROM d GROUP BY 1),
      t AS (SELECT n.event_type, n.n_gaps, p.pct,
          greatest(1, (p.pct * n.n_gaps + 99) // 100) AS r
        FROM n, (SELECT CAST(unnest([50, 90]) AS BIGINT) AS pct) p)
      SELECT t.event_type, t.pct, t.n_gaps,
        CAST(min(s.delta) AS BIGINT) AS gap_us
      FROM t JOIN s ON s.event_type = t.event_type AND s.cum >= t.r
      GROUP BY 1, 2, 3 ORDER BY t.event_type, t.pct""")
  )

  private val q167_period_change = Q(
    "q167_period_change",
    // Week-over-week ops report: each (event_type, day) count vs the
    // same key 7 days earlier — a plain left equi-join on the
    // days-sized frame, honest nulls for missing or zero priors.
    (s, dir) =>
      graft.operators.TimeSeries.periodOverPeriod(
        events(s, dir), Seq("event_type"), "ts", lagDays = 7)
        .orderBy("event_type", "day"),
    Some("""WITH d AS (SELECT event_type,
        CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
          AS BIGINT) AS day,
        CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2)
      SELECT a.event_type, a.day, a.cnt, b.cnt AS prev_cnt,
        a.cnt - b.cnt AS abs_change,
        CASE WHEN b.cnt IS NOT NULL AND b.cnt <> 0
          THEN CAST(a.cnt - b.cnt AS DOUBLE) / CAST(b.cnt AS DOUBLE)
          END AS pct_change
      FROM d a LEFT JOIN d b ON b.event_type = a.event_type
        AND b.day = a.day - 7
      ORDER BY a.event_type, a.day""")
  )

  private val q171_tail_index = Q(
    "q171_tail_index",
    // Heavy-tail diagnosis: per-source Hill estimator over document
    // lengths (top-50 tail, bounded collect after a rank filter);
    // each ln term replayed identically in SQL, descending-order
    // sequential fold.
    (s, dir) =>
      graft.operators.Profile.tailIndex(
        table(s, dir, "documents"), "source", "n_chars", k = 50)
        .orderBy("source"),
    Some("""WITH b AS (SELECT source, n_chars AS v FROM documents
        WHERE n_chars IS NOT NULL AND n_chars > 0),
      r AS (SELECT source, v, row_number() OVER
        (PARTITION BY source ORDER BY v DESC) AS rn FROM b),
      tk AS (SELECT source, v, rn FROM r WHERE rn <= 51),
      l AS (SELECT source, list(v ORDER BY rn) AS xs FROM tk
        GROUP BY 1),
      agg AS (SELECT source, CAST(len(xs) - 1 AS BIGINT) AS m,
        CAST(xs[-1] AS BIGINT) AS x_ref,
        list_aggregate(list_transform(xs[1:len(xs) - 1],
          x -> ln(CAST(x AS DOUBLE) / CAST(xs[-1] AS DOUBLE))),
          'sum') AS lnsum
        FROM l WHERE len(xs) >= 2)
      SELECT source, m, x_ref,
        CASE WHEN lnsum <> 0 THEN CAST(m AS DOUBLE) / lnsum END
          AS alpha
      FROM agg ORDER BY source""")
  )

  private val q179_burstiness = Q(
    "q179_burstiness",
    // Behavioral screen: per-user Fano factor (variance/mean of
    // daily event counts over active days) — exact integer moments,
    // ONE IEEE division; single-active-day users emit null.
    (s, dir) =>
      graft.operators.Profile.fanoFactor(
        events(s, dir), Seq("user_id"), "ts")
        .orderBy("user_id"),
    Some("""WITH d AS (SELECT user_id,
        CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
          AS BIGINT) AS day,
        CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1, 2),
      m AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_days,
        CAST(sum(c) AS BIGINT) AS total,
        CAST(sum(c * c) AS BIGINT) AS ssq FROM d GROUP BY 1)
      SELECT user_id, n_days, total,
        CASE WHEN n_days > 1 THEN
          CAST(n_days * ssq - total * total AS DOUBLE)
            / CAST((n_days - 1) * total AS DOUBLE) END AS fano
      FROM m ORDER BY user_id""")
  )

  private val q129_mad_outliers = Q(
    "q129_mad_outliers",
    // Robust outlier screen: events whose value deviates from their
    // type's median by more than 3x the MAD (both medians = the
    // lower-interpolation order statistic at integer rank
    // (n-1) div 2 + 1 — exact cross-engine, no percentile
    // interpolation conventions). Two key-partitioned rank windows,
    // group medians move as single rows.
    (s, dir) =>
      graft.operators.Profile.madOutliers(
        events(s, dir), Seq("event_type"), "event_id", "value", cut = 3.0)
        .select(col("event_type"), col("id").as("event_id"),
          col("value"), col("med"), col("mad"))
        .orderBy("event_type", "event_id"),
    Some("""WITH b AS (SELECT event_type, event_id, value FROM events
        WHERE value IS NOT NULL),
      mr AS (SELECT event_type, event_id, value,
        row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
        count(*) OVER (PARTITION BY event_type) AS n FROM b),
      med AS (SELECT event_type, value AS med FROM mr
        WHERE rn = (n - 1) // 2 + 1),
      d AS (SELECT b.event_type, b.event_id, b.value, med.med,
        abs(b.value - med.med) AS dev FROM b JOIN med USING (event_type)),
      dr AS (SELECT event_type, dev,
        row_number() OVER (PARTITION BY event_type ORDER BY dev) AS rn,
        count(*) OVER (PARTITION BY event_type) AS n FROM d),
      mad AS (SELECT event_type, dev AS mad FROM dr
        WHERE rn = (n - 1) // 2 + 1)
      SELECT d.event_type, d.event_id, d.value, d.med, mad.mad
      FROM d JOIN mad USING (event_type)
      WHERE d.dev > 3.0 * mad.mad
      ORDER BY event_type, event_id""")
  )

  private val q130_trailing_window = Q(
    "q130_trailing_window",
    // Trailing 30-day spend per customer at every order: the one
    // window shape that genuinely needs a time-RANGE frame (same-day
    // peers all enter; empty days still age rows out — a ROWS frame
    // can express neither). One custkey-partitioned range window on
    // epoch days; currency goes to integer cents (floor(x*100+0.5),
    // bitwise on both engines) so the frame sum is add-order-free.
    (s, dir) =>
      graft.operators.TimeSeries.trailingWindow(
        table(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
            floor(col("o_totalprice") * lit(100.0) + lit(0.5))
              .cast("long").as("cents")),
        Seq("o_custkey"), "o_orderdate", "cents", windowDays = 30)
        .select(col("o_orderkey"), col("o_custkey"), col("day"),
          col("cents"), col("trail_sum").as("trail_cents"),
          col("trail_cnt"))
        .orderBy("o_orderkey"),
    Some("""WITH b AS (SELECT o_orderkey, o_custkey,
        date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day,
        CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders)
      SELECT o_orderkey, o_custkey, CAST(day AS BIGINT) AS day, cents,
        CAST(sum(cents) OVER (PARTITION BY o_custkey ORDER BY day
          RANGE BETWEEN 29 PRECEDING AND CURRENT ROW) AS BIGINT)
          AS trail_cents,
        CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY day
          RANGE BETWEEN 29 PRECEDING AND CURRENT ROW) AS BIGINT)
          AS trail_cnt
      FROM b ORDER BY o_orderkey""")
  )

  private val q132_gini = Q(
    "q132_gini",
    // Per-source Gini concentration of token mass: the mixture-design
    // diagnostic next to raw row counts. Integer rank sums (one
    // source-partitioned rank window, tie order provably irrelevant),
    // two IEEE divisions in a fixed order — bitwise cross-engine.
    (s, dir) =>
      graft.operators.Profile.giniConcentration(
        table(s, dir, "documents")
          .select(col("source"), col("doc_id"),
            TextFunctions.tokenCount(col("text")).as("toks")),
        "source", "doc_id", "toks")
        .orderBy("source"),
    Some(s"""WITH b AS (SELECT source, doc_id,
        CAST(len($W) AS BIGINT) AS toks FROM documents),
      r AS (SELECT source, toks, CAST(row_number() OVER
        (PARTITION BY source ORDER BY toks, doc_id) AS BIGINT) AS rk
        FROM b),
      a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(toks) AS BIGINT) AS total,
        CAST(sum(rk * toks) AS BIGINT) AS ws FROM r GROUP BY source)
      SELECT source, n_docs, total,
        CASE WHEN total = 0 THEN NULL ELSE
          2.0 * ws / (n_docs * total) - (n_docs + 1.0) / n_docs
        END AS gini
      FROM a ORDER BY source""")
  )

  private val q133_mutual_info = Q(
    "q133_mutual_info",
    // Is `source` already telling me the `lang`? Categorical MI +
    // entropies over the documents pair domain. Every p*ln(...) sum
    // is a sequential fold over SORTED cells (add-order-pinned);
    // each term's ln takes one division of two exact integer
    // products. ln itself is the one libm-vs-JVM seam (1-ulp
    // divergence on some inputs), so outputs round to 6 decimals on
    // both engines — the q94 convention.
    (s, dir) =>
      graft.operators.Profile.mutualInfo(
        table(s, dir, "documents"), "lang", "source")
        .select(col("n"), round(col("h_a"), 6).as("h_a"),
          round(col("h_b"), 6).as("h_b"), round(col("h_ab"), 6).as("h_ab"),
          round(col("mi"), 6).as("mi"), round(col("nmi"), 6).as("nmi")),
    Some("""WITH b AS (SELECT lang AS a, source AS b FROM documents
        WHERE lang IS NOT NULL AND source IS NOT NULL),
      n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM b),
      c AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c
        FROM b GROUP BY a, b),
      ca AS (SELECT a, CAST(count(*) AS BIGINT) AS ca FROM b GROUP BY a),
      cb AS (SELECT b, CAST(count(*) AS BIGINT) AS cb FROM b GROUP BY b),
      j AS (SELECT c.a, c.b,
          (c.c / n.n) * ln(CAST(c.c * n.n AS DOUBLE) / (ca.ca * cb.cb))
            AS mt,
          -(c.c / n.n) * ln(c.c / n.n) AS ht
        FROM c, n
        JOIN ca ON c.a = ca.a
        JOIN cb ON c.b = cb.b),
      joint AS (SELECT
          list_aggregate(list(mt ORDER BY a, b), 'sum') AS mi,
          list_aggregate(list(ht ORDER BY a, b), 'sum') AS h_ab FROM j),
      ha AS (SELECT list_aggregate(
          list(-(ca / n.n) * ln(ca / n.n) ORDER BY a), 'sum') AS h_a
        FROM ca, n),
      hb AS (SELECT list_aggregate(
          list(-(cb / n.n) * ln(cb / n.n) ORDER BY b), 'sum') AS h_b
        FROM cb, n)
      SELECT n.n AS n, round(ha.h_a, 6) AS h_a, round(hb.h_b, 6) AS h_b,
        round(joint.h_ab, 6) AS h_ab, round(joint.mi, 6) AS mi,
        CASE WHEN ha.h_a * hb.h_b = 0.0 THEN NULL
          ELSE round(joint.mi / sqrt(ha.h_a * hb.h_b), 6) END AS nmi
      FROM n, ha, hb, joint""")
  )

  private val q136_feature_scale = Q(
    "q136_feature_scale",
    // Per-source feature scaling of token counts: percent_rank (rank
    // arithmetic, ties share) + z-score whose group moments are
    // exact 64-bit integers — every float step afterwards is a fixed
    // IEEE sequence (mean, m2, sample std via correctly-rounded
    // sqrt), so the compare is bitwise with NO rounding crutch.
    (s, dir) =>
      graft.operators.Features.scaleBy(
        table(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            TextFunctions.tokenCount(col("text")).as("toks")),
        "source", "toks")
        .select(col("doc_id"), col("source"), col("toks"),
          col("pct_rank"), col("z"))
        .orderBy("doc_id"),
    Some(s"""WITH b AS (SELECT doc_id, source,
        CAST(len($W) AS BIGINT) AS toks FROM documents),
      m AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(toks) AS BIGINT) AS s,
        CAST(sum(toks * toks) AS BIGINT) AS ss FROM b GROUP BY source)
      SELECT b.doc_id, b.source, b.toks,
        percent_rank() OVER (PARTITION BY b.source ORDER BY b.toks)
          AS pct_rank,
        CASE WHEN m.n > 1 AND
            sqrt(greatest(0.0, CAST(ss AS DOUBLE)
              - CAST(s AS DOUBLE) * (CAST(s AS DOUBLE) / n))
              / (n - 1)) <> 0.0
          THEN (CAST(b.toks AS DOUBLE) - CAST(s AS DOUBLE) / n)
            / sqrt(greatest(0.0, CAST(ss AS DOUBLE)
              - CAST(s AS DOUBLE) * (CAST(s AS DOUBLE) / n))
              / (n - 1))
          ELSE NULL END AS z
      FROM b JOIN m USING (source) ORDER BY b.doc_id""")
  )

  private val q137_weighted_median = Q(
    "q137_weighted_median",
    // Token-weighted lower median of document length per source: the
    // n_chars level where half the source's TOKEN MASS sits — the
    // threshold statistic that doesn't over-count short docs. Pure
    // 64-bit cumulative arithmetic, no interpolation convention.
    (s, dir) =>
      graft.operators.Profile.weightedMedian(
        table(s, dir, "documents")
          .select(col("source"), col("doc_id"), col("n_chars"),
            TextFunctions.tokenCount(col("text")).as("toks")),
        "source", "doc_id", "n_chars", "toks")
        .orderBy("source"),
    Some(s"""WITH b AS (SELECT source, doc_id, n_chars,
        CAST(len($W) AS BIGINT) AS w FROM documents
        WHERE n_chars IS NOT NULL AND len($W) <> 0),
      t AS (SELECT source, CAST(sum(w) AS BIGINT) AS total_w
        FROM b GROUP BY source),
      c AS (SELECT source, n_chars, CAST(sum(w) OVER
          (PARTITION BY source ORDER BY n_chars, doc_id
           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw FROM b)
      SELECT c.source, t.total_w,
        CAST(min(c.n_chars) AS BIGINT) AS med_v
      FROM c JOIN t USING (source)
      WHERE c.cw >= (t.total_w + 1) // 2
      GROUP BY c.source, t.total_w ORDER BY c.source""")
  )

  private val q138_sliding_distinct = Q(
    "q138_sliding_distinct",
    // Trailing 7-day distinct users per event type: distinct doesn't
    // sum across days, so the exact path collapses to daily-distinct
    // rows then fans each out to the bounded window of target days;
    // the at-scale twin rides ONE HLL SKETCH per day through the
    // same fan-out (constant bytes per day regardless of
    // cardinality) and is gated within 5% of exact per cell in-job.
    // The oracle re-derives every trailing count with a day-range
    // self-join.
    (s, dir) =>
      graft.operators.Sketches.slidingDistinctReport(
        events(s, dir).select(col("event_type"),
          datediff(col("ts").cast("date"), to_date(lit("1970-01-01")))
            .cast("long").as("day"),
          col("user_id")),
        Seq("event_type"), "day", "user_id", windowDays = 7)
        .orderBy("event_type", "day"),
    Some("""WITH d AS (SELECT DISTINCT event_type,
        CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
          AS BIGINT) AS day, user_id FROM events),
      days AS (SELECT DISTINCT event_type, day FROM d)
      SELECT days.event_type, days.day,
        CAST(count(DISTINCT d.user_id) AS BIGINT) AS n_distinct
      FROM days JOIN d ON d.event_type = days.event_type
        AND d.day BETWEEN days.day - 6 AND days.day
      GROUP BY days.event_type, days.day
      ORDER BY days.event_type, days.day""")
  )

  private val q139_heavy_keys = Q(
    "q139_heavy_keys",
    // Shuffle pre-flight: the exact top-10 lineitem supplier keys by
    // row count with their table share — the report that decides
    // between plain groupBy, salting, or AQE trust before paying the
    // real shuffle. Total order (count desc, key asc nulls first) so
    // the cutoff is deterministic; rank via the bounded no-window
    // path; share is one IEEE division against a broadcast total.
    (s, dir) =>
      graft.operators.Skew.heavyKeys(
        table(s, dir, "lineitem"), "l_suppkey", topK = 10)
        .orderBy("rank"),
    Some("""WITH c AS (SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n
        FROM lineitem GROUP BY l_suppkey),
      t AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM c),
      r AS (SELECT l_suppkey, n, CAST(row_number() OVER
          (ORDER BY n DESC, l_suppkey NULLS FIRST) AS BIGINT) AS rank
        FROM c)
      SELECT r.l_suppkey, r.n, CAST(r.n AS DOUBLE) / t.t AS share, r.rank
      FROM r, t WHERE r.rank <= 10 ORDER BY r.rank""")
  )

  private val q108_heavy_hitters = Q(
    "q108_heavy_hitters",
    // Exact heavy hitters at bounded memory: Misra-Gries summaries
    // per partition tree-merged into a provably-complete candidate
    // set (every token with count > N/k survives the merge), then an
    // In-pruned exact verify pass — bitwise the full-shuffle GROUP BY
    // answer without ever shuffling the token stream. The fixture's
    // near-flat 31-token vocab makes the sketch trivially exact here
    // (k=64 > |vocab|); HeavyHittersSpec is where the decrement and
    // merge paths earn their keep, on skewed streams cut across
    // adversarial partitionings.
    (s, dir) =>
      graft.operators.HeavyHitters.heavyTokens(
        table(s, dir, "documents"), "text", k = 64),
    Some(s"""WITH toks AS (SELECT unnest($W) AS token FROM documents),
      n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM toks),
      c AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt
        FROM toks GROUP BY token)
      SELECT token, cnt FROM c, n WHERE cnt * 64 > n.n
      ORDER BY cnt DESC, token""")
  )

  private val q96_profile_drift = Q(
    "q96_profile_drift",
    // Snapshot drift gate: old half vs new half of the corpus, with a
    // planted anomaly (every 7th new doc loses its lang) that must
    // trip the null-rate alert while the untouched columns stay
    // quiet. Every number is integer counts + IEEE division — the
    // oracle recomputes the whole report exactly.
    (s, dir) => {
      val docs = table(s, dir, "documents")
      val old = docs.filter(col("doc_id") < 250)
      val fresh = docs.filter(col("doc_id") >= 250)
        .withColumn("lang",
          when(col("doc_id") % 7 === 0, lit(null).cast("string"))
            .otherwise(col("lang")))
      graft.operators.Profile.drift(
        old, fresh, Seq("lang", "source", "n_chars"))
        .orderBy("column")
    },
    Some("""WITH oldt AS (SELECT lang, source, n_chars FROM documents
        WHERE doc_id < 250),
      newt AS (SELECT CASE WHEN doc_id % 7 = 0 THEN NULL ELSE lang END
          AS lang, source, n_chars FROM documents WHERE doc_id >= 250),
      po AS (
        SELECT 'lang' AS c, count(*) AS n,
          count(*) FILTER (WHERE lang IS NULL) AS nn,
          count(DISTINCT lang) AS nd,
          CAST(min(lang) AS VARCHAR) AS mn, CAST(max(lang) AS VARCHAR) AS mx
        FROM oldt
        UNION ALL SELECT 'source', count(*),
          count(*) FILTER (WHERE source IS NULL), count(DISTINCT source),
          CAST(min(source) AS VARCHAR), CAST(max(source) AS VARCHAR)
        FROM oldt
        UNION ALL SELECT 'n_chars', count(*),
          count(*) FILTER (WHERE n_chars IS NULL), count(DISTINCT n_chars),
          CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR)
        FROM oldt),
      pn AS (
        SELECT 'lang' AS c, count(*) AS n,
          count(*) FILTER (WHERE lang IS NULL) AS nn,
          count(DISTINCT lang) AS nd,
          CAST(min(lang) AS VARCHAR) AS mn, CAST(max(lang) AS VARCHAR) AS mx
        FROM newt
        UNION ALL SELECT 'source', count(*),
          count(*) FILTER (WHERE source IS NULL), count(DISTINCT source),
          CAST(min(source) AS VARCHAR), CAST(max(source) AS VARCHAR)
        FROM newt
        UNION ALL SELECT 'n_chars', count(*),
          count(*) FILTER (WHERE n_chars IS NULL), count(DISTINCT n_chars),
          CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR)
        FROM newt),
      j AS (SELECT po.c, po.n AS n_old, pn.n AS n_new,
          CAST(po.nn AS DOUBLE) / greatest(po.n, 1) AS nro,
          CAST(pn.nn AS DOUBLE) / greatest(pn.n, 1) AS nrn,
          po.nd AS d_old, pn.nd AS d_new,
          (CAST(pn.nd AS DOUBLE) / greatest(pn.n - pn.nn, 1)) /
            (CAST(po.nd AS DOUBLE) / greatest(po.n - po.nn, 1)) AS dr,
          po.mn AS mno, po.mx AS mxo, pn.mn AS mnn, pn.mx AS mxn
        FROM po JOIN pn ON po.c = pn.c)
      SELECT c AS "column",
        CAST(n_old AS BIGINT) AS n_old, CAST(n_new AS BIGINT) AS n_new,
        nro AS null_rate_old, nrn AS null_rate_new,
        nrn - nro AS null_jump, (nrn - nro) > 0.05 AS null_alert,
        CAST(d_old AS BIGINT) AS distinct_old,
        CAST(d_new AS BIGINT) AS distinct_new,
        dr AS density_ratio, (dr < 0.5 OR dr > 2.0) AS distinct_alert,
        (mnn <> mno OR mxn <> mxo) AS range_changed
      FROM j ORDER BY "column"""")
  )

  private val q102_snapshot_diff = Q(
    "q102_snapshot_diff",
    // Row-level snapshot reconciliation: which keys a re-ingest
    // added/removed/changed. The planted diff: old = doc_id < 450,
    // new = doc_id >= 50 with lang rewritten on multiples of 10 — so
    // every status class is exercised. The oracle recomputes statuses
    // INDEPENDENTLY (direct IS DISTINCT FROM column comparison, not
    // the md5 fingerprint), so equality also cross-checks the
    // fingerprint construction itself.
    (s, dir) => {
      val docs = table(s, dir, "documents")
        .select("doc_id", "lang", "source", "n_chars")
      val old = docs.filter(col("doc_id") < 450)
      val fresh = docs.filter(col("doc_id") >= 50)
        .withColumn("lang",
          when(col("doc_id") % 10 === 0, lit("xx")).otherwise(col("lang")))
      graft.operators.Profile.snapshotDiff(
        old, fresh, "doc_id", Seq("lang", "source", "n_chars"))
        .orderBy("key")
    },
    Some("""WITH o AS (SELECT doc_id, lang, source, n_chars
        FROM documents WHERE doc_id < 450),
      n AS (SELECT doc_id,
          CASE WHEN doc_id % 10 = 0 THEN 'xx' ELSE lang END AS lang,
          source, n_chars
        FROM documents WHERE doc_id >= 50)
      SELECT COALESCE(o.doc_id, n.doc_id) AS key,
        CASE WHEN o.doc_id IS NULL THEN 'added'
             WHEN n.doc_id IS NULL THEN 'removed'
             WHEN (o.lang IS DISTINCT FROM n.lang)
               OR (o.source IS DISTINCT FROM n.source)
               OR (o.n_chars IS DISTINCT FROM n.n_chars) THEN 'changed'
             ELSE 'unchanged' END AS status
      FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
      ORDER BY key""")
  )

  private val q77_percentiles_approx = Q(
    "q77_percentiles_approx",
    // The sketch percentile path, continuously verified: run
    // percentile_approx (GK summaries, the 100 TB spelling — bounded
    // sketch per group instead of a full sort) through
    // Gates.rankErrorGate — its empirical rank error is measured
    // against the data inside the job (one conditional-aggregate
    // pass), the query fails if it exceeds the 1/accuracy guarantee
    // (+ tie cushion) — and emit the exact interpolated percentiles
    // for the bitwise oracle. The q40 recall-gate pattern applied to
    // sketches, so the approx operator has no rows-only gap.
    (s, dir) => {
      val li = table(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
      graft.operators.Gates.rankErrorGate(
        li, "l_returnflag", "l_quantity", Seq(0.25, 0.9), accuracy = 1000)
      li.groupBy("l_returnflag")
        .agg(
          expr("percentile(l_quantity, 0.25)").as("p25_qty"),
          expr("percentile(l_quantity, 0.9)").as("p90_qty"),
          expr("percentile(l_extendedprice, 0.5)").as("p50_price"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag,
      quantile_cont(l_quantity, 0.25) AS p25_qty,
      quantile_cont(l_quantity, 0.9) AS p90_qty,
      quantile_cont(l_extendedprice, 0.5) AS p50_price
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
  )

  private val q184_cusum = Q(
    "q184_cusum",
    // CUSUM drift detection on per-type daily volume: exact integer
    // closed form S±_t = C_t − min_{j<=t} C_j scaled by 4n (allowance
    // mu/4, threshold 3*mu), gap-free day grid so a volume collapse
    // is visible. Integer windows are order-free — bitwise
    // cross-engine; only the two emitted normalizations are IEEE.
    (s, dir) =>
      graft.operators.TimeSeries.cusumVolume(
        events(s, dir), Seq("event_type"), "ts", thresholdMu = 3)
        .orderBy("event_type", "day"),
    Some("""WITH d AS (SELECT event_type,
        CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
          AS BIGINT) AS day,
        CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2),
      sp AS (SELECT event_type, min(day) AS d0, max(day) AS d1,
        CAST(sum(cnt) AS BIGINT) AS s FROM d GROUP BY 1),
      grid AS (SELECT event_type, s, d1 - d0 + 1 AS n,
        unnest(range(d0, d1 + 1)) AS day FROM sp),
      f AS (SELECT g.event_type, g.s, g.n, g.day,
        COALESCE(d.cnt, 0) AS cnt FROM grid g
        LEFT JOIN d ON d.event_type = g.event_type AND d.day = g.day),
      c AS (SELECT event_type, s, n, day, cnt,
        CAST(sum(cnt) OVER w AS BIGINT) AS p,
        CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
          AS BIGINT) AS t FROM f
        WINDOW w AS (PARTITION BY event_type ORDER BY day
          ROWS UNBOUNDED PRECEDING)),
      x AS (SELECT *, 4 * n * p - 5 * s * t AS cp,
        3 * s * t - 4 * n * p AS cn FROM c),
      m AS (SELECT *, least(0, min(cp) OVER w2) AS mp,
        least(0, min(cn) OVER w2) AS mn FROM x
        WINDOW w2 AS (PARTITION BY event_type ORDER BY day
          ROWS UNBOUNDED PRECEDING))
      SELECT event_type, day, cnt,
        CASE WHEN s > 0 THEN CAST(cp - mp AS DOUBLE)
          / (4.0 * CAST(s AS DOUBLE)) END AS cusum_pos,
        CASE WHEN s > 0 THEN CAST(cn - mn AS DOUBLE)
          / (4.0 * CAST(s AS DOUBLE)) END AS cusum_neg,
        (cp - mp) > 4 * 3 * s AS flag_pos,
        (cn - mn) > 4 * 3 * s AS flag_neg
      FROM m ORDER BY event_type, day""")
  )

  private val q190_rank_sum = Q(
    "q190_rank_sum",
    // Mann-Whitney rank-sum A/B screen: click vs view event values,
    // exact integer doubled-midrank arithmetic (u2 = 2U, tie term
    // carried), rank-biserial effect size as the one IEEE division.
    // Ranks never materialize per row — two-phase bucket cumsum.
    (s, dir) =>
      graft.operators.Profile.rankSumTest(
        events(s, dir), "event_type", "value", "click", "view"),
    Some("""WITH f AS (SELECT event_type, value FROM events
        WHERE event_type IN ('click', 'view')),
      c AS (SELECT value AS v, CAST(count(*) AS BIGINT) AS cnt,
        CAST(count(CASE WHEN event_type = 'click' THEN 1 END)
          AS BIGINT) AS ca FROM f GROUP BY 1),
      cc AS (SELECT v, cnt, ca, CAST(sum(cnt) OVER (ORDER BY v
          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM c),
      a AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
        CAST(sum(cnt - ca) AS BIGINT) AS n_b,
        CAST(sum(ca * (2 * cum - cnt + 1)) AS BIGINT) AS r2a,
        CAST(sum(cnt * cnt * cnt - cnt) AS BIGINT) AS tie_cubed_sum
        FROM cc)
      SELECT n_a, n_b, r2a - n_a * (n_a + 1) AS u2_a, tie_cubed_sum,
        CASE WHEN n_a > 0 AND n_b > 0
          THEN CAST(r2a - n_a * (n_a + 1) AS DOUBLE)
            / CAST(n_a * n_b AS DOUBLE) - 1.0 END AS effect_r
      FROM a""")
  )

  private val q191_acf = Q(
    "q191_acf",
    // Seasonality fingerprint: per-type daily-volume autocorrelation
    // at lags 1..7 over the gap-free day grid — exact integer moments
    // (z_t = n*c_t - S BIGINTs, order-free sums), one IEEE division
    // per (key, lag).
    (s, dir) =>
      graft.operators.TimeSeries.autocorrelation(
        events(s, dir), Seq("event_type"), "ts", maxLag = 7)
        .orderBy("event_type", "lag"),
    Some("""WITH d AS (SELECT event_type,
        CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
          AS BIGINT) AS day,
        CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2),
      sp AS (SELECT event_type, min(day) AS d0, max(day) AS d1,
        CAST(sum(cnt) AS BIGINT) AS s FROM d GROUP BY 1),
      grid AS (SELECT event_type, s, d1 - d0 + 1 AS n,
        unnest(range(d0, d1 + 1)) AS day FROM sp),
      z AS (SELECT g.event_type, g.n, g.day,
        g.n * COALESCE(d.cnt, 0) - g.s AS z FROM grid g
        LEFT JOIN d ON d.event_type = g.event_type AND d.day = g.day),
      den AS (SELECT event_type, CAST(sum(z * z) AS BIGINT) AS den,
        CAST(min(n) AS BIGINT) AS n_days FROM z GROUP BY 1),
      lags AS (SELECT unnest(range(1, 8)) AS lag),
      num AS (SELECT a.event_type, l.lag,
        CAST(sum(a.z * b.z) AS BIGINT) AS num
        FROM z a CROSS JOIN lags l JOIN z b
          ON b.event_type = a.event_type AND b.day = a.day + l.lag
        GROUP BY 1, 2)
      SELECT d.event_type AS event_type, CAST(l.lag AS BIGINT) AS lag,
        d.n_days,
        CASE WHEN d.den > 0 THEN CAST(COALESCE(num.num, 0) AS DOUBLE)
          / CAST(d.den AS DOUBLE) END AS acf
      FROM den d CROSS JOIN lags l
      LEFT JOIN num ON num.event_type = d.event_type AND num.lag = l.lag
      ORDER BY 1, 2""")
  )

  private val q207_ewma = Q(
    "q207_ewma",
    // EWMA smoothing of per-type daily volume on the gap-free grid:
    // the alpha=0.3 recursion unrolled to its closed form, so each
    // (type, day) is one day-ordered fold with geometric weights —
    // no sequential dependency, nothing driver-side. DuckDB replays
    // the identical weights and fold order; 6-decimal face for
    // pow's last-ulp variance across libm builds.
    (s, dir) =>
      graft.operators.TimeSeries.ewma(
        events(s, dir), Seq("event_type"), "ts", alpha = 0.3)
        .orderBy("event_type", "day"),
    Some("""WITH d AS (SELECT event_type,
        CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
          AS BIGINT) AS day,
        CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2),
      sp AS (SELECT event_type, min(day) AS d0, max(day) AS d1
        FROM d GROUP BY 1),
      grid AS (SELECT event_type, d0, d1, u.day AS day
        FROM sp CROSS JOIN unnest(range(d0, d1 + 1)) AS u(day)),
      c AS (SELECT g.event_type, g.d0, g.d1, g.day,
          COALESCE(d.cnt, 0) AS cnt
        FROM grid g LEFT JOIN d ON d.event_type = g.event_type
          AND d.day = g.day),
      pairs AS (SELECT a.event_type, b.day AS day, a.day AS s,
          (CASE WHEN a.day = a.d0
            THEN power(0.7, CAST(b.day - a.d0 AS DOUBLE))
            ELSE 0.3 * power(0.7, CAST(b.day - a.day AS DOUBLE)) END)
            * CAST(a.cnt AS DOUBLE) AS term
        FROM c a JOIN c b ON b.event_type = a.event_type
          AND b.day >= a.day),
      e AS (SELECT event_type, day,
          round(list_aggregate(list(term ORDER BY s), 'sum'), 6)
            AS ewma
        FROM pairs GROUP BY 1, 2)
      SELECT c.event_type, c.day, CAST(c.cnt AS BIGINT) AS cnt, e.ewma
      FROM c JOIN e ON e.event_type = c.event_type AND e.day = c.day
      ORDER BY c.event_type, c.day""")
  )

  private val q208_psi = Q(
    "q208_psi",
    // Population Stability Index per event type between the month's
    // first half (reference) and second half (current) — the
    // deployed-model drift metric. Reference-ranged fixed bins with
    // edge clamping, 1e-6 share floor, bin-ordered fold, 6-decimal
    // ln face; DuckDB rebuilds every bin count and term.
    (s, dir) => {
      val ev = events(s, dir)
      graft.operators.Profile.psi(
        ev.filter(dayofmonth(col("ts")) <= 15),
        ev.filter(dayofmonth(col("ts")) > 15),
        Seq("event_type"), "value", bins = 10)
        .orderBy("event_type")
    },
    Some("""WITH r AS (SELECT event_type, value FROM events
        WHERE date_part('day', ts) <= 15 AND value IS NOT NULL),
      c AS (SELECT event_type, value FROM events
        WHERE date_part('day', ts) > 15 AND value IS NOT NULL),
      b AS (SELECT event_type, min(value) AS lo, max(value) AS hi
        FROM r GROUP BY 1),
      rb AS (SELECT r.event_type, CASE WHEN b.hi = b.lo THEN 0
          ELSE greatest(0, least(9, CAST(floor(
            ((r.value - b.lo) / (b.hi - b.lo)) * 10) AS BIGINT)))
          END AS bin, count(*) AS nr
        FROM r JOIN b USING (event_type) GROUP BY 1, 2),
      cb AS (SELECT c.event_type, CASE WHEN b.hi = b.lo THEN 0
          ELSE greatest(0, least(9, CAST(floor(
            ((c.value - b.lo) / (b.hi - b.lo)) * 10) AS BIGINT)))
          END AS bin, count(*) AS nc
        FROM c JOIN b USING (event_type) GROUP BY 1, 2),
      grid AS (SELECT event_type, u.bin AS bin FROM b
        CROSS JOIN unnest(range(0, 10)) AS u(bin)),
      cells AS (SELECT g.event_type, g.bin,
          COALESCE(rb.nr, 0) AS nr, COALESCE(cb.nc, 0) AS nc
        FROM grid g
        LEFT JOIN rb ON rb.event_type = g.event_type
          AND rb.bin = g.bin
        LEFT JOIN cb ON cb.event_type = g.event_type
          AND cb.bin = g.bin),
      t AS (SELECT event_type, CAST(sum(nr) AS BIGINT) AS n_ref,
          CAST(sum(nc) AS BIGINT) AS n_cur FROM cells GROUP BY 1),
      terms AS (SELECT cells.event_type, t.n_ref, t.n_cur, cells.bin,
          (greatest(CAST(nr AS DOUBLE) / CAST(n_ref AS DOUBLE), 1e-6)
           - greatest(CAST(nc AS DOUBLE) / CAST(n_cur AS DOUBLE),
             1e-6))
          * ln(greatest(CAST(nr AS DOUBLE) / CAST(n_ref AS DOUBLE),
              1e-6)
            / greatest(CAST(nc AS DOUBLE) / CAST(n_cur AS DOUBLE),
              1e-6)) AS term
        FROM cells JOIN t ON t.event_type = cells.event_type
        WHERE t.n_ref > 0 AND t.n_cur > 0)
      SELECT event_type, n_ref, n_cur,
        round(list_aggregate(list(term ORDER BY bin), 'sum'), 6)
          AS psi
      FROM terms GROUP BY event_type, n_ref, n_cur
      ORDER BY event_type""")
  )

  private val q209_welch_ttest = Q(
    "q209_welch_ttest",
    // Welch's unequal-variance t-test on click vs purchase values:
    // the means A/B screen beside q190's rank-sum distribution
    // screen. DECIMAL-exact moments (associative, any partial-agg
    // order), then t and the Welch-Satterthwaite df as one fixed
    // IEEE chain — bitwise cross-engine, no transcendental.
    (s, dir) =>
      graft.operators.Profile.welchTTest(
        events(s, dir), "event_type", "value", "click", "purchase"),
    Some("""WITH a AS (SELECT CAST(count(*) AS BIGINT) AS n_a,
        sum(CAST(value AS DECIMAL(18,2))) AS s1a,
        sum(CAST(CAST(value AS DECIMAL(18,2))
          * CAST(value AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS s2a
        FROM events WHERE event_type = 'click' AND value IS NOT NULL),
      b AS (SELECT CAST(count(*) AS BIGINT) AS n_b,
        sum(CAST(value AS DECIMAL(18,2))) AS s1b,
        sum(CAST(CAST(value AS DECIMAL(18,2))
          * CAST(value AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS s2b
        FROM events WHERE event_type = 'purchase'
          AND value IS NOT NULL),
      m AS (SELECT n_a, n_b,
        CAST(s1a AS DOUBLE) / CAST(n_a AS DOUBLE) AS mean_a,
        CAST(s1b AS DOUBLE) / CAST(n_b AS DOUBLE) AS mean_b,
        ((CAST(n_a AS DOUBLE) * CAST(s2a AS DOUBLE)
          - CAST(s1a AS DOUBLE) * CAST(s1a AS DOUBLE))
          / (CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) - 1.0)))
          / CAST(n_a AS DOUBLE) AS va,
        ((CAST(n_b AS DOUBLE) * CAST(s2b AS DOUBLE)
          - CAST(s1b AS DOUBLE) * CAST(s1b AS DOUBLE))
          / (CAST(n_b AS DOUBLE) * (CAST(n_b AS DOUBLE) - 1.0)))
          / CAST(n_b AS DOUBLE) AS vb
        FROM a CROSS JOIN b)
      SELECT n_a, n_b, mean_a, mean_b,
        CASE WHEN va + vb > 0
          THEN (mean_a - mean_b) / sqrt(va + vb) END AS t_stat,
        CASE WHEN va + vb > 0
          THEN ((va + vb) * (va + vb))
            / (va * va / (CAST(n_a AS DOUBLE) - 1.0)
              + vb * vb / (CAST(n_b AS DOUBLE) - 1.0)) END AS df
      FROM m""")
  )

  private val q215_benford = Q(
    "q215_benford",
    // Benford first-digit forensic audit of extended prices per
    // returnflag: digits extracted in exact integer space (decimal
    // cents -> first char of the BIGINT rendering — no log10 near
    // power-of-10 boundaries), Benford expectation and chi-squared
    // cells at the 6-decimal ln face. The fabricated-data screen,
    // emitted as cells per the chiSquaredCells discipline.
    (s, dir) =>
      graft.operators.Profile.benford(
        table(s, dir, "lineitem"), Seq("l_returnflag"),
        "l_extendedprice", scale = 2)
        .orderBy("l_returnflag", "digit"),
    Some("""WITH v AS (SELECT l_returnflag AS k,
        CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
          AS cents
        FROM lineitem
        WHERE l_extendedprice IS NOT NULL AND l_extendedprice > 0
          AND CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
            AS BIGINT) >= 1),
      c AS (SELECT k,
          CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT)
            AS digit,
          CAST(count(*) AS BIGINT) AS n_obs FROM v GROUP BY 1, 2),
      t AS (SELECT k, CAST(sum(n_obs) AS BIGINT) AS n FROM c
        GROUP BY 1),
      g AS (SELECT t.k, t.n, u.digit AS digit FROM t
        CROSS JOIN unnest(range(1, 10)) AS u(digit)),
      j AS (SELECT g.k, g.digit, g.n, COALESCE(c.n_obs, 0) AS n_obs
        FROM g LEFT JOIN c ON c.k = g.k AND c.digit = g.digit)
      SELECT k AS l_returnflag, CAST(digit AS BIGINT) AS digit,
        n_obs, n AS n_total,
        round(CAST(n_obs AS DOUBLE) / CAST(n AS DOUBLE), 6) AS share,
        round(ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0), 6)
          AS benford_share,
        round((CAST(n_obs AS DOUBLE) - CAST(n AS DOUBLE)
            * (ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0)))
          * (CAST(n_obs AS DOUBLE) - CAST(n AS DOUBLE)
            * (ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0)))
          / (CAST(n AS DOUBLE)
            * (ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0))), 6)
          AS chi2_term
      FROM j ORDER BY l_returnflag, digit""")
  )

  private val q219_ks_test = Q(
    "q219_ks_test",
    // Two-sample Kolmogorov-Smirnov on click vs view values — the
    // distribution-SHAPE screen completing the classical family
    // (Welch means q209, rank-sum dominance q190, chi-squared
    // categories q155): D's numerator is max |cumA*n_b - cumB*n_a|
    // in exact DECIMAL(38,0) over two-phase bucketed prefix sums —
    // no global window, no float accumulation; the oracle's global
    // window replays it bitwise.
    (s, dir) =>
      graft.operators.Profile.ksTest(
        events(s, dir), "event_type", "value", "click", "view"),
    Some("""WITH a AS (SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100
          AS BIGINT) AS v FROM events
        WHERE event_type = 'click' AND value IS NOT NULL),
      b AS (SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100
          AS BIGINT) AS v FROM events
        WHERE event_type = 'view' AND value IS NOT NULL),
      ca AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM a
        GROUP BY 1),
      cb AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM b
        GROUP BY 1),
      j AS (SELECT COALESCE(ca.v, cb.v) AS v,
          COALESCE(ca.c, 0) AS ca, COALESCE(cb.c, 0) AS cb
        FROM ca FULL OUTER JOIN cb ON cb.v = ca.v),
      c AS (SELECT v, sum(ca) OVER (ORDER BY v) AS cuma,
          sum(cb) OVER (ORDER BY v) AS cumb FROM j),
      n AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
          CAST(sum(cb) AS BIGINT) AS n_b FROM j),
      m AS (SELECT max(abs(CAST(cuma AS DECIMAL(38,0)) * n.n_b
            - CAST(cumb AS DECIMAL(38,0)) * n.n_a)) AS d_num,
          any_value(n.n_a) AS n_a, any_value(n.n_b) AS n_b
        FROM c CROSS JOIN n)
      SELECT n_a, n_b, CAST(d_num AS DOUBLE) AS d_num,
        CAST(d_num AS DOUBLE)
          / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) AS d,
        CAST(d_num AS DOUBLE)
          / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
          > 1.358 * sqrt((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
            / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)))
          AS significant
      FROM m""")
  )

  private val q220_seasonal_decompose = Q(
    "q220_seasonal_decompose",
    // STL-lite: per-type daily volume = centered-7-day trend +
    // day-of-week seasonal (day-ordered bitwise fold of the
    // detrended series) + residual; edges without a full window
    // emit honest nulls. Anomaly screens belong on the RESIDUAL —
    // a Sunday dip is seasonality, not an incident. The oracle
    // replays trend windows, folds, and residuals at the 6-decimal
    // face.
    (s, dir) =>
      graft.operators.TimeSeries.seasonalDecompose(
        events(s, dir), Seq("event_type"), "ts")
        .orderBy("event_type", "day"),
    Some("""WITH d AS (SELECT event_type,
        CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
          AS BIGINT) AS day,
        CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2),
      sp AS (SELECT event_type, min(day) AS d0, max(day) AS d1
        FROM d GROUP BY 1),
      grid AS (SELECT event_type, u.day AS day FROM sp
        CROSS JOIN unnest(range(d0, d1 + 1)) AS u(day)),
      c AS (SELECT g.event_type, g.day, (g.day + 4) % 7 AS dow,
          COALESCE(d.cnt, 0) AS cnt
        FROM grid g LEFT JOIN d ON d.event_type = g.event_type
          AND d.day = g.day),
      t AS (SELECT *, CASE WHEN count(*) OVER w7 = 7
            THEN round(CAST(sum(cnt) OVER w7 AS DOUBLE) / 7.0, 6)
            END AS trend
        FROM c WINDOW w7 AS (PARTITION BY event_type ORDER BY day
          ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      det AS (SELECT *, CAST(cnt AS DOUBLE) - trend AS det FROM t),
      se AS (SELECT event_type, dow,
          round(list_aggregate(list(det ORDER BY day), 'sum')
            / CAST(count(*) AS DOUBLE), 6) AS seasonal
        FROM det WHERE det IS NOT NULL GROUP BY 1, 2)
      SELECT det.event_type, det.day, det.dow, det.cnt, det.trend,
        CASE WHEN det.trend IS NOT NULL THEN se.seasonal END
          AS seasonal,
        CASE WHEN det.trend IS NOT NULL THEN
          round(CAST(det.cnt AS DOUBLE) - det.trend - se.seasonal, 6)
          END AS residual
      FROM det LEFT JOIN se ON se.event_type = det.event_type
        AND se.dow = det.dow
      ORDER BY det.event_type, det.day""")
  )


  private val q243_overlap_matrix = Q(
    "q243_overlap_matrix",
    // Audience-overlap matrix: distinct-user overlap for every
    // event-type pair, zero-overlap pairs included. The at-scale
    // path — HLL inclusion-exclusion over per-source sketches — runs
    // and is gated in the same job (error bound relErr·(|A|+|B|),
    // the differencing-scales-with-set-size contract); the emitted
    // counts are exact, so the oracle is cross-engine-checkable.
    (s, dir) =>
      graft.operators.Sketches.gatedOverlapReport(
        events(s, dir), "event_type", "user_id",
        lgK = 12, relErr = 0.05)
        .orderBy("src_a", "src_b"),
    Some("""WITH v AS (SELECT DISTINCT event_type AS s, user_id AS u
        FROM events
        WHERE event_type IS NOT NULL AND user_id IS NOT NULL),
      d AS (SELECT s, CAST(count(*) AS BIGINT) AS n FROM v
        GROUP BY 1),
      o AS (SELECT a.s AS src_a, b.s AS src_b,
          CAST(count(*) AS BIGINT) AS n_overlap
        FROM v a JOIN v b ON a.u = b.u AND a.s < b.s GROUP BY 1, 2),
      g AS (SELECT da.s AS src_a, db.s AS src_b, da.n AS n_a,
          db.n AS n_b
        FROM d da JOIN d db ON da.s < db.s)
      SELECT g.src_a, g.src_b, g.n_a, g.n_b,
        CAST(COALESCE(o.n_overlap, 0) AS BIGINT) AS n_overlap,
        round(CAST(COALESCE(o.n_overlap, 0) AS DOUBLE)
          / CAST(g.n_a + g.n_b - COALESCE(o.n_overlap, 0) AS DOUBLE),
          6) AS jaccard
      FROM g LEFT JOIN o ON o.src_a = g.src_a AND o.src_b = g.src_b
      ORDER BY 1, 2""")
  )

  private val q252_wasserstein = Q(
    "q252_wasserstein",
    // 1-D Wasserstein on click vs view values — the
    // magnitude-sensitive drift number beside q219's KS sup-norm
    // (a uniform shift moves W1 by the shift but barely moves D):
    // interval terms |cumA·n_b − cumB·n_a|·Δv in exact
    // DECIMAL(38,0) over the bucketed two-phase machinery, one
    // final IEEE chain back to value units. The oracle replays it
    // with global windows, bitwise.
    (s, dir) =>
      graft.operators.Profile.wasserstein1(
        events(s, dir), "event_type", "value", "click", "view"),
    Some("""WITH a AS (SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100
          AS BIGINT) AS v FROM events
        WHERE event_type = 'click' AND value IS NOT NULL),
      b AS (SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100
          AS BIGINT) AS v FROM events
        WHERE event_type = 'view' AND value IS NOT NULL),
      ca AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM a
        GROUP BY 1),
      cb AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM b
        GROUP BY 1),
      j AS (SELECT COALESCE(ca.v, cb.v) AS v,
          COALESCE(ca.c, 0) AS ca, COALESCE(cb.c, 0) AS cb
        FROM ca FULL JOIN cb ON cb.v = ca.v),
      w AS (SELECT v, sum(ca) OVER (ORDER BY v) AS cuma,
          sum(cb) OVER (ORDER BY v) AS cumb,
          lead(v) OVER (ORDER BY v) AS vnext FROM j),
      n AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
          CAST(sum(cb) AS BIGINT) AS nb FROM j),
      t AS (SELECT COALESCE(sum(abs(cuma * n.nb - cumb * n.na)
          * COALESCE(vnext - v, 0)), 0) AS w1num
        FROM w CROSS JOIN n)
      SELECT n.na AS n_a, n.nb AS n_b,
        CAST(t.w1num AS DOUBLE) AS w1_num,
        CASE WHEN n.na > 0 AND n.nb > 0 THEN
          round(CAST(t.w1num AS DOUBLE) / (CAST(n.na AS DOUBLE)
            * CAST(n.nb AS DOUBLE) * 100.0), 6) END AS w1
      FROM n CROSS JOIN t""")
  )

  private val q238_trend_test = Q(
    "q238_trend_test",
    // Mann–Kendall + Theil–Sen per event type over the zero-filled
    // daily grid: exact-integer S and tie-corrected variance
    // numerator, continuity-corrected z at the 6-decimal face,
    // trend decided on the ROUNDED z at the shared 1.959964
    // literal, sen slope via the percentile==quantile_cont
    // contract. The robust twin of q148's OLS group trend.
    (s, dir) =>
      graft.operators.TimeSeries.trendTest(
        events(s, dir), Seq("event_type"), "ts")
        .orderBy("event_type"),
    Some("""WITH d AS (SELECT event_type,
        CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
          AS BIGINT) AS day,
        CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2),
      sp AS (SELECT event_type, min(day) AS d0, max(day) AS d1
        FROM d GROUP BY 1),
      grid AS (SELECT event_type, u.day AS day FROM sp
        CROSS JOIN unnest(range(d0, d1 + 1)) AS u(day)),
      c AS (SELECT g.event_type, g.day, COALESCE(d.cnt, 0) AS cnt
        FROM grid g LEFT JOIN d ON d.event_type = g.event_type
          AND d.day = g.day),
      n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
        FROM c GROUP BY 1),
      p AS (SELECT a.event_type,
          CAST(sum(CASE WHEN b.cnt > a.cnt THEN 1
            WHEN b.cnt < a.cnt THEN -1 ELSE 0 END) AS BIGINT)
            AS s_stat,
          CAST(count(*) AS BIGINT) AS n_pairs,
          quantile_cont(CAST(b.cnt - a.cnt AS DOUBLE)
            / CAST(b.day - a.day AS DOUBLE), 0.5) AS sen_raw
        FROM c a JOIN c b ON b.event_type = a.event_type
          AND b.day > a.day GROUP BY 1),
      t AS (SELECT event_type,
          CAST(COALESCE(sum(tt * (tt - 1) * (2 * tt + 5)), 0)
            AS BIGINT) AS tie
        FROM (SELECT event_type, cnt,
            CAST(count(*) AS BIGINT) AS tt
          FROM c GROUP BY 1, 2) GROUP BY 1),
      j AS (SELECT n.event_type, n.n_days,
          COALESCE(p.n_pairs, 0) AS n_pairs,
          COALESCE(p.s_stat, 0) AS s_stat, p.sen_raw,
          n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
            - COALESCE(t.tie, 0) AS vn
        FROM n LEFT JOIN p ON p.event_type = n.event_type
        LEFT JOIN t ON t.event_type = n.event_type),
      zc AS (SELECT *, CASE WHEN vn > 0 THEN
          round(CAST(CASE WHEN s_stat > 0 THEN s_stat - 1
              WHEN s_stat < 0 THEN s_stat + 1 ELSE 0 END AS DOUBLE)
            / sqrt(CAST(vn AS DOUBLE) / 18.0), 6) END AS z
        FROM j)
      SELECT event_type, n_days, n_pairs, s_stat, z,
        CASE WHEN vn > 0 THEN
          CASE WHEN z > 1.959964 THEN 'up'
            WHEN z < -1.959964 THEN 'down' ELSE 'none' END
          END AS trend,
        round(sen_raw, 6) AS sen_slope
      FROM zc ORDER BY event_type""")
  )

  private val q255_encoding_audit = Q(
    "q255_encoding_audit",
    // Mojibake screen: the fixture text is clean ASCII, so the query
    // plants deterministic doc_id-derived artifacts first (Latin-1
    // double-decode "Ã", Windows-1252 smart quote "â€™", U+FFFD,
    // zero-width space, a C0 control byte) and the audit must count
    // exactly what was planted. Counts are literal-substring
    // replacement arithmetic — no regex, so no Java-vs-RE2 dialect
    // risk — and the oracle replays the same planting with chr().
    (s, dir) => {
      val id = col("doc_id")
      val art = graft.operators.Profile.EncodingArtifacts.toMap
      val doctored = table(s, dir, "documents").select(
        id,
        concat(
          col("text"),
          when(id % 3 === 1, lit(art("latin1_utf8")))
            .when(id % 3 === 2, lit(art("latin1_utf8") * 2))
            .otherwise(lit("")),
          when(id % 4 === 0, lit(art("smart_quote"))).otherwise(lit("")),
          when(id % 5 === 0, lit(art("replacement") * 2))
            .otherwise(lit("")),
          when(id % 7 === 0, lit(art("zwsp"))).otherwise(lit("")),
          when(id % 11 === 0, lit(art("ctl"))).otherwise(lit("")))
          .as("text"))
      graft.operators.Profile
        .encodingAudit(doctored, "doc_id", "text")
        .orderBy("doc_id")
    },
    Some("""WITH d AS (SELECT doc_id, text ||
        CASE WHEN doc_id % 3 = 1 THEN chr(195)
          WHEN doc_id % 3 = 2 THEN chr(195) || chr(195)
          ELSE '' END ||
        CASE WHEN doc_id % 4 = 0
          THEN chr(226) || chr(8364) || chr(8482) ELSE '' END ||
        CASE WHEN doc_id % 5 = 0
          THEN chr(65533) || chr(65533) ELSE '' END ||
        CASE WHEN doc_id % 7 = 0 THEN chr(8203) ELSE '' END ||
        CASE WHEN doc_id % 11 = 0 THEN chr(1) ELSE '' END AS t
        FROM documents),
      c AS (SELECT doc_id,
        CAST(len(t) - len(replace(t, chr(195), '')) AS BIGINT)
          AS n_latin1_utf8,
        CAST((len(t) - len(replace(t,
          chr(226) || chr(8364) || chr(8482), ''))) // 3 AS BIGINT)
          AS n_smart_quote,
        CAST(len(t) - len(replace(t, chr(65533), '')) AS BIGINT)
          AS n_replacement,
        CAST(len(t) - len(replace(t, chr(8203), '')) AS BIGINT)
          AS n_zwsp,
        CAST(len(t) - len(replace(t, chr(1), '')) AS BIGINT) AS n_ctl
        FROM d)
      SELECT *, n_artifacts = 0 AS clean FROM (SELECT c.*,
        n_latin1_utf8 + n_smart_quote + n_replacement + n_zwsp + n_ctl
          AS n_artifacts FROM c)
      ORDER BY doc_id""")
  )

  private val q222_spearman = Q(
    "q222_spearman",
    // Spearman rank correlation of quantity vs extended price:
    // doubled average ranks (2·cum − cnt + 1, integer — the tie .5
    // cleared, the factor cancels in rho) from the window-free
    // two-phase prefix sum, five exact DECIMAL(38,0)/HUGEINT
    // moments, rho as ONE fixed IEEE expression at the 6-decimal
    // face (>2^53 decimal→double narrowing is a 1-ULP seam).
    (s, dir) =>
      graft.operators.Profile.spearmanCorr(
        table(s, dir, "lineitem"), "l_quantity", "l_extendedprice",
        scale = 2),
    Some("""WITH r AS (SELECT
        CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS x,
        CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
          AS y
        FROM lineitem
        WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
      vx AS (SELECT x AS v, count(*) AS c FROM r GROUP BY 1),
      cx AS (SELECT v, 2 * sum(c) OVER (ORDER BY v) - c + 1 AS r2
        FROM vx),
      vy AS (SELECT y AS v, count(*) AS c FROM r GROUP BY 1),
      cy AS (SELECT v, 2 * sum(c) OVER (ORDER BY v) - c + 1 AS r2
        FROM vy),
      j AS (SELECT cx.r2 AS rx, cy.r2 AS ry FROM r
        JOIN cx ON cx.v = r.x JOIN cy ON cy.v = r.y),
      m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        sum(rx) AS sx, sum(ry) AS sy, sum(rx * rx) AS sxx,
        sum(ry * ry) AS syy, sum(rx * ry) AS sxy FROM j)
      SELECT n, CASE WHEN
          CAST(n * sxx - sx * sx AS DOUBLE) > 0.0 AND
          CAST(n * syy - sy * sy AS DOUBLE) > 0.0
        THEN round(CAST(n * sxy - sx * sy AS DOUBLE)
          / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
            * CAST(n * syy - sy * sy AS DOUBLE)), 6) END AS rho
      FROM m""")
  )

  private val q223_ks_by_key = Q(
    "q223_ks_by_key",
    // One-vs-rest KS per source over document lengths: exact-integer
    // D numerator on the full keys × values jump grid, asymptotic
    // two-sided p = min(1, 2·exp(−2·e·D²)) at the 6-decimal exp
    // face. The per-key drift screen that feeds BH (q224).
    (s, dir) =>
      graft.operators.Profile.ksTestByKey(
        table(s, dir, "documents"), "source", "n_chars", scale = 0)
        .orderBy("source"),
    Some("""WITH b AS (SELECT source AS k,
        CAST(CAST(n_chars AS DECIMAL(18,0)) AS BIGINT) AS v
        FROM documents
        WHERE source IS NOT NULL AND n_chars IS NOT NULL),
      kc AS (SELECT k, CAST(count(*) AS BIGINT) AS nk FROM b
        GROUP BY 1),
      vs AS (SELECT v, CAST(count(*) AS BIGINT) AS callv FROM b
        GROUP BY 1),
      kv AS (SELECT k, v, CAST(count(*) AS BIGINT) AS ck FROM b
        GROUP BY 1, 2),
      g AS (SELECT kc.k, kc.nk, vs.v, vs.callv,
          COALESCE(kv.ck, 0) AS ck
        FROM kc CROSS JOIN vs
        LEFT JOIN kv ON kv.k = kc.k AND kv.v = vs.v),
      c AS (SELECT *,
          sum(ck) OVER (PARTITION BY k ORDER BY v) AS cumk,
          sum(callv) OVER (PARTITION BY k ORDER BY v) AS cumall
        FROM g),
      nn AS (SELECT CAST(count(*) AS BIGINT) AS nall FROM b),
      dd AS (SELECT k, nk, nall - nk AS nrest,
          max(abs(cumk * (nall - nk) - (cumall - cumk) * nk)) AS dnum
        FROM c CROSS JOIN nn GROUP BY 1, 2, 3),
      f AS (SELECT k, nk, nrest,
          CASE WHEN nk > 0 AND nrest > 0 THEN CAST(dnum AS DOUBLE)
            / (CAST(nk AS DOUBLE) * CAST(nrest AS DOUBLE)) END AS d
        FROM dd)
      SELECT k AS source, nk AS n, nrest AS n_rest, d,
        CASE WHEN d IS NOT NULL THEN round(least(1.0,
          2.0 * exp(-2.0
            * (CAST(nk AS DOUBLE) * CAST(nrest AS DOUBLE)
              / (CAST(nk AS DOUBLE) + CAST(nrest AS DOUBLE)))
            * d * d)), 6) END AS p_value
      FROM f ORDER BY source""")
  )

  private val q224_bh_fdr = Q(
    "q224_bh_fdr",
    // Benjamini–Hochberg FDR control over the q223 per-source KS
    // p-value family at q=0.10: max-tie ranks from the window-free
    // prefix sum, the step-up condition as the exact integer
    // cross-product p6·m ≤ rank·q6, rejection by the p* cutoff.
    // The multiplicity gate the drift battery reports through.
    (s, dir) => {
      val ks = graft.operators.Profile.ksTestByKey(
        table(s, dir, "documents"), "source", "n_chars", scale = 0)
      graft.operators.Profile.bhFdr(ks, "source", "p_value", q = 0.10)
        .orderBy("source")
    },
    Some("""WITH b AS (SELECT source AS k,
        CAST(CAST(n_chars AS DECIMAL(18,0)) AS BIGINT) AS v
        FROM documents
        WHERE source IS NOT NULL AND n_chars IS NOT NULL),
      kc AS (SELECT k, CAST(count(*) AS BIGINT) AS nk FROM b
        GROUP BY 1),
      vs AS (SELECT v, CAST(count(*) AS BIGINT) AS callv FROM b
        GROUP BY 1),
      kv AS (SELECT k, v, CAST(count(*) AS BIGINT) AS ck FROM b
        GROUP BY 1, 2),
      g AS (SELECT kc.k, kc.nk, vs.v, vs.callv,
          COALESCE(kv.ck, 0) AS ck
        FROM kc CROSS JOIN vs
        LEFT JOIN kv ON kv.k = kc.k AND kv.v = vs.v),
      c AS (SELECT *,
          sum(ck) OVER (PARTITION BY k ORDER BY v) AS cumk,
          sum(callv) OVER (PARTITION BY k ORDER BY v) AS cumall
        FROM g),
      nn AS (SELECT CAST(count(*) AS BIGINT) AS nall FROM b),
      dd AS (SELECT k, nk, nall - nk AS nrest,
          max(abs(cumk * (nall - nk) - (cumall - cumk) * nk)) AS dnum
        FROM c CROSS JOIN nn GROUP BY 1, 2, 3),
      f AS (SELECT k, nk, nrest,
          CASE WHEN nk > 0 AND nrest > 0 THEN CAST(dnum AS DOUBLE)
            / (CAST(nk AS DOUBLE) * CAST(nrest AS DOUBLE)) END AS d
        FROM dd),
      p AS (SELECT k,
          CASE WHEN d IS NOT NULL THEN round(least(1.0,
            2.0 * exp(-2.0
              * (CAST(nk AS DOUBLE) * CAST(nrest AS DOUBLE)
                / (CAST(nk AS DOUBLE) + CAST(nrest AS DOUBLE)))
              * d * d)), 6) END AS pv
        FROM f),
      p6 AS (SELECT k, pv,
          CAST(CAST(pv AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS v6
        FROM p WHERE pv IS NOT NULL),
      vals AS (SELECT v6, CAST(count(*) AS BIGINT) AS c FROM p6
        GROUP BY 1),
      rk AS (SELECT v6, sum(c) OVER (ORDER BY v6) AS rnk FROM vals),
      mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM p6),
      star AS (SELECT max(v6) AS pstar FROM rk CROSS JOIN mm
        WHERE v6 * m <= rnk * 100000)
      SELECT p6.k AS source, p6.pv AS p,
        CAST(rk.rnk AS BIGINT) AS rank,
        (star.pstar IS NOT NULL AND p6.v6 <= star.pstar) AS rejected
      FROM p6 JOIN rk ON rk.v6 = p6.v6 CROSS JOIN star
      ORDER BY source""")
  )

  private val q227_corr_matrix = Q(
    "q227_corr_matrix",
    // Pairwise Pearson matrix over the four lineitem money/rate
    // columns in ONE aggregate pass: 4 sums + 4 square-sums + 6
    // cross-sums, all exact DECIMAL(38,0)/HUGEINT, each r one fixed
    // IEEE expression at the 6-decimal face (the spearman
    // narrowing seam). The metric-redundancy screen.
    (s, dir) =>
      graft.operators.Profile.corrMatrix(
        table(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
        scale = 2)
        .orderBy("col_a", "col_b"),
    Some("""WITH r AS (SELECT
        CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS q,
        CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
          AS e,
        CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS d,
        CAST(CAST(l_tax AS DECIMAL(18,2)) * 100 AS BIGINT) AS t
        FROM lineitem
        WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
          AND l_discount IS NOT NULL AND l_tax IS NOT NULL),
      m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        sum(q) AS sq, sum(e) AS se, sum(d) AS sd, sum(t) AS st,
        sum(q*q) AS qq, sum(e*e) AS ee, sum(d*d) AS dd,
        sum(t*t) AS tt, sum(q*e) AS qe, sum(q*d) AS qd,
        sum(q*t) AS qt, sum(e*d) AS ed, sum(e*t) AS et,
        sum(d*t) AS dt FROM r),
      p AS (
        SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b, n,
          CASE WHEN CAST(n*qq - sq*sq AS DOUBLE) > 0.0
            AND CAST(n*ee - se*se AS DOUBLE) > 0.0
            THEN round(CAST(n*qe - sq*se AS DOUBLE)
              / sqrt(CAST(n*qq - sq*sq AS DOUBLE)
                * CAST(n*ee - se*se AS DOUBLE)), 6) END AS r FROM m
        UNION ALL
        SELECT 'l_quantity', 'l_discount', n,
          CASE WHEN CAST(n*qq - sq*sq AS DOUBLE) > 0.0
            AND CAST(n*dd - sd*sd AS DOUBLE) > 0.0
            THEN round(CAST(n*qd - sq*sd AS DOUBLE)
              / sqrt(CAST(n*qq - sq*sq AS DOUBLE)
                * CAST(n*dd - sd*sd AS DOUBLE)), 6) END FROM m
        UNION ALL
        SELECT 'l_quantity', 'l_tax', n,
          CASE WHEN CAST(n*qq - sq*sq AS DOUBLE) > 0.0
            AND CAST(n*tt - st*st AS DOUBLE) > 0.0
            THEN round(CAST(n*qt - sq*st AS DOUBLE)
              / sqrt(CAST(n*qq - sq*sq AS DOUBLE)
                * CAST(n*tt - st*st AS DOUBLE)), 6) END FROM m
        UNION ALL
        SELECT 'l_extendedprice', 'l_discount', n,
          CASE WHEN CAST(n*ee - se*se AS DOUBLE) > 0.0
            AND CAST(n*dd - sd*sd AS DOUBLE) > 0.0
            THEN round(CAST(n*ed - se*sd AS DOUBLE)
              / sqrt(CAST(n*ee - se*se AS DOUBLE)
                * CAST(n*dd - sd*sd AS DOUBLE)), 6) END FROM m
        UNION ALL
        SELECT 'l_extendedprice', 'l_tax', n,
          CASE WHEN CAST(n*ee - se*se AS DOUBLE) > 0.0
            AND CAST(n*tt - st*st AS DOUBLE) > 0.0
            THEN round(CAST(n*et - se*st AS DOUBLE)
              / sqrt(CAST(n*ee - se*se AS DOUBLE)
                * CAST(n*tt - st*st AS DOUBLE)), 6) END FROM m
        UNION ALL
        SELECT 'l_discount', 'l_tax', n,
          CASE WHEN CAST(n*dd - sd*sd AS DOUBLE) > 0.0
            AND CAST(n*tt - st*st AS DOUBLE) > 0.0
            THEN round(CAST(n*dt - sd*st AS DOUBLE)
              / sqrt(CAST(n*dd - sd*sd AS DOUBLE)
                * CAST(n*tt - st*st AS DOUBLE)), 6) END FROM m)
      SELECT col_a, col_b, n, r FROM p ORDER BY col_a, col_b""")
  )

  private val q228_cramers_v = Q(
    "q228_cramers_v",
    // Cramér's V between language and source: exact integer
    // contingency counts, chi-squared folded over the FULL grid in
    // sorted (lang, source) order (zero cells carry mass), V at the
    // 6-decimal face — the "are these dimensions entangled" screen
    // a mixture designer runs before treating them as independent.
    (s, dir) =>
      graft.operators.Profile.cramersV(
        table(s, dir, "documents"), "lang", "source"),
    Some("""WITH b AS (SELECT CAST(lang AS VARCHAR) AS a,
        CAST(source AS VARCHAR) AS bb FROM documents
        WHERE lang IS NOT NULL AND source IS NOT NULL),
      obs AS (SELECT a, bb, CAST(count(*) AS BIGINT) AS o FROM b
        GROUP BY 1, 2),
      ra AS (SELECT a, CAST(count(*) AS BIGINT) AS ta FROM b
        GROUP BY 1),
      rb AS (SELECT bb, CAST(count(*) AS BIGINT) AS tb FROM b
        GROUP BY 1),
      nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM b),
      g AS (SELECT ra.a, rb.bb, ra.ta, rb.tb,
          COALESCE(obs.o, 0) AS o
        FROM ra CROSS JOIN rb
        LEFT JOIN obs ON obs.a = ra.a AND obs.bb = rb.bb),
      c AS (SELECT a, bb,
          (CAST(o AS DOUBLE) - CAST(ta AS DOUBLE) * CAST(tb AS DOUBLE)
            / CAST(n AS DOUBLE))
          * (CAST(o AS DOUBLE) - CAST(ta AS DOUBLE)
            * CAST(tb AS DOUBLE) / CAST(n AS DOUBLE))
          / (CAST(ta AS DOUBLE) * CAST(tb AS DOUBLE)
            / CAST(n AS DOUBLE)) AS t
        FROM g CROSS JOIN nn),
      f AS (SELECT list_aggregate(list(t ORDER BY a, bb), 'sum')
          AS chi2 FROM c),
      la AS (SELECT CAST(count(*) AS BIGINT) AS levels_a FROM ra),
      lb AS (SELECT CAST(count(*) AS BIGINT) AS levels_b FROM rb)
      SELECT nn.n, la.levels_a, lb.levels_b,
        round(f.chi2, 6) AS chi2,
        CASE WHEN least(la.levels_a, lb.levels_b) > 1
          THEN round(sqrt(f.chi2 / (CAST(nn.n AS DOUBLE)
            * CAST(least(la.levels_a, lb.levels_b) - 1 AS DOUBLE))),
            6) END AS v
      FROM f CROSS JOIN nn CROSS JOIN la CROSS JOIN lb""")
  )

  private val q229_ratio_ci = Q(
    "q229_ratio_ci",
    // Delta-method 95% CI for the per-arm clicks-per-event ratio
    // over per-user units (user_id % 2 as the synthetic A/B arm):
    // a ratio of sums is not a mean of ratios — the variance needs
    // the covariance term. Five exact DECIMAL moments per arm, one
    // fixed IEEE chain, z from the shared literal table. The
    // closed-form sibling of q225's bootstrap.
    (s, dir) => {
      val units = events(s, dir)
        .filter(col("user_id").isNotNull)
        .groupBy(col("user_id"), (col("user_id") % 2).as("arm"))
        .agg(sum(when(col("event_type") === "click", 1L)
          .otherwise(0L)).as("clicks"),
          count(lit(1)).as("n_events"))
      graft.operators.Profile.ratioMetricCI(
        units, Seq("arm"), "clicks", "n_events",
        ciPct = 95, scale = 0)
        .orderBy("arm")
    },
    Some("""WITH u AS (SELECT user_id,
        CAST(user_id % 2 AS BIGINT) AS arm,
        CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
          AS BIGINT) AS x,
        CAST(count(*) AS BIGINT) AS y
        FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2),
      m AS (SELECT arm, CAST(count(*) AS BIGINT) AS n,
        sum(x) AS sx, sum(y) AS sy, sum(x*x) AS sxx,
        sum(y*y) AS syy, sum(x*y) AS sxy FROM u GROUP BY 1),
      f AS (SELECT arm, n,
        CAST(n AS DOUBLE) AS nd,
        CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE) AS ratio,
        CAST(n*sxx - sx*sx AS DOUBLE)
          / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) AS vx,
        CAST(n*syy - sy*sy AS DOUBLE)
          / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) AS vy,
        CAST(n*sxy - sx*sy AS DOUBLE)
          / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) AS cxy,
        CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS ybar,
        (sy <> 0 AND n >= 2) AS ok FROM m),
      g AS (SELECT arm, n, ok, ratio,
        sqrt((vx + ratio * ratio * vy - 2.0 * ratio * cxy)
          / (nd * ybar * ybar)) AS se FROM f)
      SELECT arm, n AS n_units,
        CASE WHEN ok THEN round(ratio, 6) END AS ratio,
        CASE WHEN ok THEN round(se, 6) END AS se,
        CASE WHEN ok THEN round(ratio - 1.959963984540054 * se, 6)
          END AS ci_lo,
        CASE WHEN ok THEN round(ratio + 1.959963984540054 * se, 6)
          END AS ci_hi
      FROM g ORDER BY arm""")
  )

  private val q234_js_divergence = Q(
    "q234_js_divergence",
    // Jensen-Shannon divergence per event type between the month's
    // halves — PSI's zero-safe symmetric sibling (empty bins carry
    // p·ln2, never an infinity or a floor), bounded in [0, ln 2].
    // Same reference-ranged bins, bin-ordered fold, 6-decimal face;
    // DuckDB rebuilds every bin and term.
    (s, dir) => {
      val ev = events(s, dir)
      graft.operators.Profile.jsDivergence(
        ev.filter(dayofmonth(col("ts")) <= 15),
        ev.filter(dayofmonth(col("ts")) > 15),
        Seq("event_type"), "value", bins = 10)
        .orderBy("event_type")
    },
    Some("""WITH r AS (SELECT event_type, value FROM events
        WHERE date_part('day', ts) <= 15 AND value IS NOT NULL),
      c AS (SELECT event_type, value FROM events
        WHERE date_part('day', ts) > 15 AND value IS NOT NULL),
      b AS (SELECT event_type, min(value) AS lo, max(value) AS hi
        FROM r GROUP BY 1),
      rb AS (SELECT r.event_type, CASE WHEN b.hi = b.lo THEN 0
          ELSE greatest(0, least(9, CAST(floor(
            ((r.value - b.lo) / (b.hi - b.lo)) * 10) AS BIGINT)))
          END AS bin, count(*) AS nr
        FROM r JOIN b USING (event_type) GROUP BY 1, 2),
      cb AS (SELECT c.event_type, CASE WHEN b.hi = b.lo THEN 0
          ELSE greatest(0, least(9, CAST(floor(
            ((c.value - b.lo) / (b.hi - b.lo)) * 10) AS BIGINT)))
          END AS bin, count(*) AS nc
        FROM c JOIN b USING (event_type) GROUP BY 1, 2),
      grid AS (SELECT event_type, u.bin AS bin FROM b
        CROSS JOIN unnest(range(0, 10)) AS u(bin)),
      cells AS (SELECT g.event_type, g.bin,
          COALESCE(rb.nr, 0) AS nr, COALESCE(cb.nc, 0) AS nc
        FROM grid g
        LEFT JOIN rb ON rb.event_type = g.event_type
          AND rb.bin = g.bin
        LEFT JOIN cb ON cb.event_type = g.event_type
          AND cb.bin = g.bin),
      t AS (SELECT event_type, CAST(sum(nr) AS BIGINT) AS n_ref,
          CAST(sum(nc) AS BIGINT) AS n_cur FROM cells GROUP BY 1),
      pq AS (SELECT cells.event_type, t.n_ref, t.n_cur, cells.bin,
          CAST(nr AS DOUBLE) / CAST(n_ref AS DOUBLE) AS p,
          CAST(nc AS DOUBLE) / CAST(n_cur AS DOUBLE) AS q
        FROM cells JOIN t ON t.event_type = cells.event_type
        WHERE t.n_ref > 0 AND t.n_cur > 0),
      terms AS (SELECT event_type, n_ref, n_cur, bin,
          (CASE WHEN p > 0.0
            THEN 0.5 * p * ln(p / ((p + q) / 2.0)) ELSE 0.0 END)
          + (CASE WHEN q > 0.0
            THEN 0.5 * q * ln(q / ((p + q) / 2.0)) ELSE 0.0 END)
          AS term
        FROM pq)
      SELECT event_type, n_ref, n_cur,
        round(list_aggregate(list(term ORDER BY bin), 'sum'), 6)
          AS jsd
      FROM terms GROUP BY event_type, n_ref, n_cur
      ORDER BY event_type""")
  )

  private val q235_proportion_test = Q(
    "q235_proportion_test",
    // Two-proportion comparison with Wilson score intervals: per
    // month half, the click share of each synthetic arm
    // (user_id % 2) with small-n-safe CIs and the pooled z — the
    // conversion-rate readout beside q229's ratio CIs. Exact
    // integer counts, one fixed IEEE chain per number, shared z
    // literal.
    (s, dir) =>
      graft.operators.Profile.proportionTest(
        events(s, dir)
          .filter(col("user_id").isNotNull)
          .withColumn("half",
            when(dayofmonth(col("ts")) <= 15, "h1").otherwise("h2"))
          .withColumn("arm", (col("user_id") % 2).cast("string")),
        Seq("half"), "arm", "0", "1",
        col("event_type") === "click", ciPct = 95)
        .orderBy("half"),
    Some("""WITH e AS (SELECT
        CASE WHEN date_part('day', ts) <= 15 THEN 'h1' ELSE 'h2' END
          AS half,
        CAST(user_id % 2 AS VARCHAR) AS arm,
        (event_type = 'click') AS s
        FROM events WHERE user_id IS NOT NULL),
      m AS (SELECT half,
        CAST(sum(CASE WHEN arm = '0' THEN 1 ELSE 0 END) AS BIGINT)
          AS n_a,
        CAST(sum(CASE WHEN arm = '0' AND s THEN 1 ELSE 0 END)
          AS BIGINT) AS k_a,
        CAST(sum(CASE WHEN arm = '1' THEN 1 ELSE 0 END) AS BIGINT)
          AS n_b,
        CAST(sum(CASE WHEN arm = '1' AND s THEN 1 ELSE 0 END)
          AS BIGINT) AS k_b
        FROM e WHERE arm IN ('0', '1') GROUP BY 1),
      w AS (SELECT half, n_a, k_a, n_b, k_b,
        CAST(k_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS pa,
        CAST(k_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS pb,
        CAST(k_a + k_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)
          AS pp,
        1.959963984540054 AS z FROM m)
      SELECT half, n_a, k_a,
        round(pa, 6) AS p_a,
        round((pa + z*z / (2.0 * CAST(n_a AS DOUBLE))
          - z * sqrt((pa * (1.0 - pa)
            + z*z / (4.0 * CAST(n_a AS DOUBLE)))
            / CAST(n_a AS DOUBLE)))
          / (1.0 + z*z / CAST(n_a AS DOUBLE)), 6) AS a_lo,
        round((pa + z*z / (2.0 * CAST(n_a AS DOUBLE))
          + z * sqrt((pa * (1.0 - pa)
            + z*z / (4.0 * CAST(n_a AS DOUBLE)))
            / CAST(n_a AS DOUBLE)))
          / (1.0 + z*z / CAST(n_a AS DOUBLE)), 6) AS a_hi,
        n_b, k_b,
        round(pb, 6) AS p_b,
        round((pb + z*z / (2.0 * CAST(n_b AS DOUBLE))
          - z * sqrt((pb * (1.0 - pb)
            + z*z / (4.0 * CAST(n_b AS DOUBLE)))
            / CAST(n_b AS DOUBLE)))
          / (1.0 + z*z / CAST(n_b AS DOUBLE)), 6) AS b_lo,
        round((pb + z*z / (2.0 * CAST(n_b AS DOUBLE))
          + z * sqrt((pb * (1.0 - pb)
            + z*z / (4.0 * CAST(n_b AS DOUBLE)))
            / CAST(n_b AS DOUBLE)))
          / (1.0 + z*z / CAST(n_b AS DOUBLE)), 6) AS b_hi,
        CASE WHEN pp > 0.0 AND pp < 1.0 THEN
          round((pa - pb) / sqrt(pp * (1.0 - pp)
            * (1.0 / CAST(n_a AS DOUBLE)
              + 1.0 / CAST(n_b AS DOUBLE))), 6) END AS z_stat
      FROM w ORDER BY half""")
  )

  val all: Seq[Q] = Seq(
    q252_wasserstein,
    q243_overlap_matrix,
    q238_trend_test,
    q227_corr_matrix,
    q228_cramers_v,
    q229_ratio_ci,
    q234_js_divergence,
    q235_proportion_test,
    q67_profile,
    q118_hll_ledger,
    q119_resample_fill,
    q125_kll_ledger,
    q147_histogram,
    q148_group_trend,
    q155_chi_squared,
    q159_volume_anomaly,
    q162_interarrival,
    q167_period_change,
    q171_tail_index,
    q179_burstiness,
    q129_mad_outliers,
    q130_trailing_window,
    q132_gini,
    q133_mutual_info,
    q136_feature_scale,
    q137_weighted_median,
    q138_sliding_distinct,
    q139_heavy_keys,
    q108_heavy_hitters,
    q96_profile_drift,
    q102_snapshot_diff,
    q77_percentiles_approx,
    q184_cusum,
    q190_rank_sum,
    q191_acf,
    q207_ewma,
    q208_psi,
    q209_welch_ttest,
    q215_benford,
    q219_ks_test,
    q220_seasonal_decompose,
    q222_spearman,
    q223_ks_by_key,
    q224_bh_fdr,
    q255_encoding_audit)

}
