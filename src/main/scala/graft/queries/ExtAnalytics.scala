package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.TextFunctions
import graft.operators.{Dedup, Multimodal, Similarity}
import graft.queries.Catalog.{Q, table, events}
import graft.queries.ExtShared._

/** Analytics: funnel, retention, SCD2, attribution, survival, skyline, baskets, graph stats (triangles, PageRank, assortativity), motifs.
  * Split from the former single Extensions.scala (round 7) for
  * navigability — zero behavior change; [[Extensions.all]] still
  * concatenates every family. */
private[queries] object ExtAnalytics {

  private val q60_topk_aggregator = Q(
    "q60_topk_aggregator",
    // The bounded-state TopKLongs Aggregator as a catalog query:
    // per-type top-8 event ids with O(k) state per group (map-side
    // partial heaps), vs the oracle's window-rank spelling.
    (s, dir) => {
      import s.implicits._
      events(s, dir)
        .select(col("event_type"), col("event_id"))
        .as[(String, Long)]
        .groupByKey(_._1)
        .mapValues(_._2)
        .agg(new graft.functions.TypedAggregators.TopKLongs(8).toColumn)
        .flatMap { case (t, ids) =>
          ids.iterator.zipWithIndex.map { case (id, i) =>
            (t, (i + 1).toLong, id)
          }
        }
        .toDF("event_type", "rank", "event_id")
        .orderBy("event_type", "rank")
    },
    Some("""SELECT event_type,
      CAST(row_number() OVER (PARTITION BY event_type
        ORDER BY event_id DESC) AS BIGINT) AS rank, event_id
      FROM events QUALIFY rank <= 8 ORDER BY event_type, rank""")
  )

  private val q123_scd2_history = Q(
    "q123_scd2_history",
    // Changelog -> SCD2 dimension history: each user's event_type
    // stream collapses into validity periods (runs of consecutive
    // equal values) with [valid_from_us, valid_to_us) bounds and an
    // is_current open period. Gaps-and-islands by VALUE CHANGE —
    // sessionize (q58) cuts on time gaps, this cuts on attribute
    // transitions; all windows user-partitioned.
    (s, dir) =>
      graft.operators.TimeSeries.changeHistory(
        events(s, dir), Seq("user_id"), "ts", "event_type", "event_id")
        .orderBy("user_id", "valid_from_us"),
    Some("""WITH l AS (SELECT user_id, event_type, ts, event_id,
        CASE WHEN lag(event_type) OVER
          (PARTITION BY user_id ORDER BY ts, event_id)
          IS NOT DISTINCT FROM event_type THEN 0 ELSE 1 END AS chg
        FROM events),
      r AS (SELECT *, sum(chg) OVER (PARTITION BY user_id
          ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS run
        FROM l),
      g AS (SELECT user_id, run, event_type AS value,
          min(epoch_us(ts)) AS valid_from_us,
          CAST(count(*) AS BIGINT) AS n_events
        FROM r GROUP BY 1, 2, 3)
      SELECT user_id, value, valid_from_us,
        lead(valid_from_us) OVER (PARTITION BY user_id
          ORDER BY valid_from_us) AS valid_to_us,
        n_events,
        lead(valid_from_us) OVER (PARTITION BY user_id
          ORDER BY valid_from_us) IS NULL AS is_current
      FROM g ORDER BY user_id, valid_from_us""")
  )

  private val q126_retention = Q(
    "q126_retention",
    // Retention cohort matrix: users cohorted by first-event week
    // (604800-second epoch buckets — pure integer arithmetic, no
    // engine-specific week numbering), cell (cohort, offset) =
    // distinct cohort members active offset weeks later. Activity
    // collapses to distinct (user, week) before any join.
    (s, dir) =>
      graft.operators.Funnel.retentionMatrix(
        events(s, dir), "user_id", "ts")
        .orderBy("cohort_period", "period_offset"),
    Some("""WITH p AS (SELECT user_id,
        epoch_us(ts)//1000000//604800 AS w FROM events),
      f AS (SELECT user_id, min(w) AS cohort FROM p GROUP BY 1),
      a AS (SELECT DISTINCT user_id, w FROM p)
      SELECT f.cohort AS cohort_period, a.w - f.cohort AS period_offset,
        CAST(count(*) AS BIGINT) AS n_users
      FROM a JOIN f USING (user_id)
      GROUP BY 1, 2 ORDER BY 1, 2""")
  )

  private val q149_cooccurrence = Q(
    "q149_cooccurrence",
    // Collocation mining: top-40 token pairs by lift over a
    // 150-term document-frequency vocabulary — the quadratic is
    // vocabulary-pruned (per-doc fan-out capped at C(150,2)), and
    // lift = n_xy·N/(df_a·df_b) is exact integers + one IEEE
    // multiply/divide each side, so rank and score pin bitwise. The
    // oracle rebuilds presence, vocab cutoff, pair counts, and the
    // score with the identical ordering.
    (s, dir) =>
      graft.operators.TfIdf.cooccurTopPairs(
        table(s, dir, "documents"), "doc_id", "text",
        maxVocab = 150, minDf = 5L, k = 40)
        .orderBy("rank"),
    Some(s"""WITH p AS (SELECT DISTINCT doc_id, unnest($W) AS term
        FROM documents),
      f AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM p
        GROUP BY term HAVING count(*) >= 5),
      v AS (SELECT term, df FROM f ORDER BY df DESC, term LIMIT 150),
      pv AS (SELECT p.doc_id, p.term FROM p JOIN v USING (term)),
      n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
      pr AS (SELECT a.term AS term_a, b.term AS term_b,
          CAST(count(*) AS BIGINT) AS n_xy
        FROM pv a JOIN pv b
          ON a.doc_id = b.doc_id AND a.term < b.term
        GROUP BY 1, 2),
      sc AS (SELECT pr.term_a, pr.term_b, pr.n_xy,
          va.df AS df_a, vb.df AS df_b,
          (CAST(pr.n_xy AS DOUBLE) * CAST(n.n_docs AS DOUBLE))
            / (CAST(va.df AS DOUBLE) * CAST(vb.df AS DOUBLE)) AS lift
        FROM pr
        JOIN v va ON va.term = pr.term_a
        JOIN v vb ON vb.term = pr.term_b, n)
      SELECT CAST(row_number() OVER
          (ORDER BY lift DESC, term_a, term_b) AS BIGINT) AS rank,
        term_a, term_b, n_xy, df_a, df_b, lift
      FROM sc ORDER BY lift DESC, term_a, term_b LIMIT 40""")
  )

  private val q151_transitions = Q(
    "q151_transitions",
    // First-order event-type transition matrix: per-user lag pairs
    // (user-partitioned window, ties broken by event_id) →
    // partial-agg edge counts → per-source totals over the
    // edges-sized frame; share is one IEEE division of exact counts.
    (s, dir) =>
      graft.operators.Funnel.transitionMatrix(
        events(s, dir), "user_id", "event_type", "ts", "event_id")
        .orderBy("from_type", "to_type"),
    Some("""WITH p AS (SELECT user_id,
        lag(event_type) OVER (PARTITION BY user_id
          ORDER BY ts, event_id) AS from_type,
        event_type AS to_type FROM events),
      c AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
        FROM p WHERE from_type IS NOT NULL GROUP BY 1, 2),
      f AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS from_total
        FROM c GROUP BY 1)
      SELECT c.from_type, c.to_type, c.n, f.from_total,
        CAST(c.n AS DOUBLE) / CAST(f.from_total AS DOUBLE) AS share
      FROM c JOIN f USING (from_type)
      ORDER BY from_type, to_type""")
  )

  private val q157_attribution = Q(
    "q157_attribution",
    // Last-touch attribution: every purchase joined to the user's
    // most recent earlier view/click within a 3-day window — one
    // user-partitioned running-last window (frame ends at the
    // previous row, ties by event_id), unattributed conversions
    // surface with null touch columns.
    (s, dir) =>
      graft.operators.Funnel.lastTouchAttribution(
        events(s, dir), "user_id", "event_type", "ts", "event_id",
        conversionType = "purchase",
        touchTypes = Seq("view", "click"),
        maxGapMicros = Some(259200000000L))
        .orderBy("user_id", "event_id"),
    Some("""WITH w AS (SELECT user_id, event_id, event_type,
        epoch_us(ts) AS us,
        last_value(CASE WHEN event_type IN ('view', 'click')
          THEN epoch_us(ts) END IGNORE NULLS) OVER fr AS t_us,
        last_value(CASE WHEN event_type IN ('view', 'click')
          THEN event_type END IGNORE NULLS) OVER fr AS t_ty
        FROM events
        WINDOW fr AS (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
      SELECT user_id, event_id, us AS conv_us,
        CASE WHEN t_us IS NOT NULL AND us - t_us <= 259200000000
          THEN t_ty END AS touch_type,
        CASE WHEN t_us IS NOT NULL AND us - t_us <= 259200000000
          THEN t_us END AS touch_us,
        CASE WHEN t_us IS NOT NULL AND us - t_us <= 259200000000
          THEN us - t_us END AS gap_us
      FROM w WHERE event_type = 'purchase'
      ORDER BY user_id, event_id""")
  )

  private val q163_trailing_pit = Q(
    "q163_trailing_pit",
    // Nonparametric volume score: each day's event count placed
    // within its trailing 7-day empirical distribution (PIT = n_le/k)
    // — equi-join + bounded day-range self-join on the days-sized
    // frame, warmup days emit null.
    (s, dir) =>
      graft.operators.TimeSeries.trailingPercentile(
        events(s, dir), Seq("event_type"), "ts", windowDays = 7)
        .orderBy("event_type", "day"),
    Some("""WITH d AS (SELECT event_type,
        CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
          AS BIGINT) AS day,
        CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2)
      SELECT a.event_type, a.day, a.cnt,
        CAST(count(b.cnt) AS BIGINT) AS trail_days,
        CASE WHEN count(b.cnt) > 0 THEN CAST(sum(CASE WHEN
          b.cnt <= a.cnt THEN 1 ELSE 0 END) AS BIGINT) END AS n_le,
        CASE WHEN count(b.cnt) > 0 THEN CAST(sum(CASE WHEN
          b.cnt <= a.cnt THEN 1 ELSE 0 END) AS DOUBLE)
          / CAST(count(b.cnt) AS DOUBLE) END AS pit
      FROM d a LEFT JOIN d b ON b.event_type = a.event_type
        AND b.day BETWEEN a.day - 7 AND a.day - 1
      GROUP BY a.event_type, a.day, a.cnt
      ORDER BY a.event_type, a.day""")
  )

  private val q166_motifs = Q(
    "q166_motifs",
    // Behavioral path mining: top-20 event-type trigrams users
    // actually perform — one lag chain on a user-partitioned window,
    // motif-keyed partial agg, bounded top-k with count-then-motif
    // tiebreak, share from a broadcast total.
    (s, dir) =>
      graft.operators.Funnel.behaviorMotifs(
        events(s, dir), "user_id", "event_type", "ts", "event_id",
        n = 3, k = 20)
        .orderBy("rank"),
    Some("""WITH l AS (SELECT user_id, event_type,
        lag(event_type, 1) OVER w AS l1,
        lag(event_type, 2) OVER w AS l2
        FROM events WINDOW w AS (PARTITION BY user_id
          ORDER BY ts, event_id)),
      m AS (SELECT l2 || '>' || l1 || '>' || event_type AS motif,
        CAST(count(*) AS BIGINT) AS n_occurrences
        FROM l WHERE l2 IS NOT NULL GROUP BY 1),
      t AS (SELECT CAST(sum(n_occurrences) AS BIGINT) AS tt FROM m),
      r AS (SELECT motif, n_occurrences, CAST(row_number() OVER
          (ORDER BY n_occurrences DESC, motif) AS BIGINT) AS rank
        FROM m)
      SELECT r.rank, r.motif, r.n_occurrences,
        CAST(r.n_occurrences AS DOUBLE) / CAST(t.tt AS DOUBLE) AS share
      FROM r, t WHERE r.rank <= 20 ORDER BY r.rank""")
  )

  private val q168_activity_profile = Q(
    "q168_activity_profile",
    // Seasonality heatmap: per event type, counts and shares over
    // (day-of-week, hour) cells — dow from pure integer arithmetic
    // ((epoch_day + 4) mod 7), never a calendar function, so both
    // engines agree by construction.
    (s, dir) =>
      graft.operators.TimeSeries.activityProfile(
        events(s, dir), Seq("event_type"), "ts")
        .orderBy("event_type", "dow", "hour"),
    Some("""WITH c AS (SELECT event_type,
        ((epoch_us(ts) // 86400000000) + 4) % 7 AS dow,
        (epoch_us(ts) // 3600000000) % 24 AS hour,
        CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2, 3),
      t AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS tt
        FROM c GROUP BY 1)
      SELECT c.event_type, CAST(c.dow AS BIGINT) AS dow,
        CAST(c.hour AS BIGINT) AS hour, c.n,
        CAST(c.n AS DOUBLE) / CAST(t.tt AS DOUBLE) AS share
      FROM c JOIN t USING (event_type)
      ORDER BY c.event_type, dow, hour""")
  )

  private val q239_link_prediction = Q(
    "q239_link_prediction",
    // Distance-2 link prediction on the part co-purchase graph
    // (q226's genuinely dense fixture): parts never co-ordered but
    // sharing >= 2 co-purchase partners — common-neighbor count,
    // Jaccard of neighborhoods, and Adamic–Adar with hub-discounted
    // 1/ln(deg) weights folded in (degree, node) sorted order so
    // the float sum is bitwise cross-engine. The maxDegree=64
    // center cap (the O(deg²) wedge knob) is live in BOTH engines —
    // on this graph it admits only the sparse fringe (min degree
    // 42), exactly the hub-exclusion regime the knob exists for.
    (s, dir) => {
      val li = table(s, dir, "lineitem")
        .select(col("l_orderkey").as("k"), col("l_partkey").as("p"))
        .filter(col("p").isNotNull)
      val edges = li.as("a")
        .join(li.as("b"),
          col("a.k") === col("b.k") && col("a.p") =!= col("b.p"))
        .select(col("a.p").as("id_a"), col("b.p").as("id_b"))
      graft.operators.Graphs.linkPrediction(
        edges, "id_a", "id_b", minCommon = 2, maxDegree = 64L)
        .orderBy("id_a", "id_b")
    },
    Some("""WITH li AS (SELECT l_orderkey AS k, l_partkey AS p
        FROM lineitem WHERE l_partkey IS NOT NULL),
      p AS (SELECT DISTINCT least(a.p, b.p) AS a,
          greatest(a.p, b.p) AS b
        FROM li a JOIN li b ON a.k = b.k AND a.p <> b.p),
      e AS (SELECT a AS src, b AS dst FROM p
        UNION ALL SELECT b, a FROM p),
      dg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg
        FROM e GROUP BY 1),
      ann AS (SELECT e.src, e.dst, dc.deg AS dcen
        FROM e JOIN dg dc ON dc.src = e.src
        WHERE dc.deg <= 64),
      w AS (SELECT e1.dst AS id_a, e2.dst AS id_b, e1.src AS v,
          e1.dcen AS dv
        FROM ann e1 JOIN ann e2 ON e2.src = e1.src
          AND e1.dst < e2.dst),
      sc AS (SELECT id_a, id_b,
          CAST(count(*) AS BIGINT) AS common_neighbors,
          list_aggregate(list(1.0 / ln(CAST(dv AS DOUBLE))
            ORDER BY dv, v), 'sum') AS aa
        FROM w GROUP BY 1, 2 HAVING count(*) >= 2),
      ne AS (SELECT sc.* FROM sc LEFT JOIN p
        ON p.a = sc.id_a AND p.b = sc.id_b WHERE p.a IS NULL)
      SELECT ne.id_a, ne.id_b, ne.common_neighbors,
        round(CAST(ne.common_neighbors AS DOUBLE)
          / CAST(da.deg + db.deg - ne.common_neighbors AS DOUBLE),
          6) AS jaccard,
        round(ne.aa, 6) AS adamic_adar
      FROM ne JOIN dg da ON da.src = ne.id_a
      JOIN dg db ON db.src = ne.id_b
      ORDER BY 1, 2""")
  )

  private val q169_triangle_stats = Q(
    "q169_triangle_stats",
    // Structure of the near-dup graph: per-node degree, triangle
    // count, and clustering coefficient over the LSH pair list —
    // degree-oriented wedge generation (hub fan-out bounded O(sqrt E)),
    // every join equi-keyed. The oracle rebuilds the exact-Jaccard
    // pair graph and counts triangles by three-way self-join.
    (s, dir) =>
      graft.operators.Graphs.triangleStats(
        Dedup.minHashLshPairs(
          table(s, dir, "documents"), "doc_id", "text",
          n = 3, bands = 32, rowsPerBand = 4, minJ = 0.5),
        "id_a", "id_b")
        .orderBy("node"),
    Some(s"""WITH g AS (SELECT doc_id, ${ngrams3(W)} AS s
        FROM documents),
      p AS (SELECT a.doc_id AS a, b.doc_id AS b
        FROM g a JOIN g b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
          (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
          >= 0.5),
      d AS (SELECT node, CAST(count(*) AS BIGINT) AS degree FROM
        (SELECT a AS node FROM p UNION ALL SELECT b FROM p)
        GROUP BY 1),
      t AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM p e1 JOIN p e2 ON e2.a = e1.b
        JOIN p e3 ON e3.a = e1.a AND e3.b = e2.b),
      tc AS (SELECT node, CAST(count(*) AS BIGINT) AS triangles FROM
        (SELECT x AS node FROM t UNION ALL SELECT y FROM t
         UNION ALL SELECT z FROM t) GROUP BY 1)
      SELECT d.node, d.degree,
        CAST(COALESCE(tc.triangles, 0) AS BIGINT) AS triangles,
        CASE WHEN d.degree >= 2
          THEN CAST(2 * COALESCE(tc.triangles, 0) AS DOUBLE)
            / CAST(d.degree * (d.degree - 1) AS DOUBLE)
          END AS clustering_coeff
      FROM d LEFT JOIN tc ON tc.node = d.node ORDER BY d.node""")
  )

  private val q170_quantile_map = Q(
    "q170_quantile_map",
    // Distribution calibration: map the odd-doc token-count
    // distribution onto the even-doc one at matched ranks — the
    // values-level quantile-normalization table, exact integer rank
    // arithmetic, two-phase prefix sums, bucketed interval equi-join
    // for the rank lookup.
    (s, dir) => {
      val d = table(s, dir, "documents")
        .select(col("doc_id"),
          TextFunctions.tokenCount(col("text")).as("toks"))
      graft.operators.Features.quantileMap(
        d.filter(col("doc_id") % 2 === 1).select("toks"),
        d.filter(col("doc_id") % 2 === 0).select("toks"),
        "toks")
        .orderBy("value")
    },
    Some(s"""WITH b AS (SELECT doc_id, CAST(len($W) AS BIGINT) AS toks
        FROM documents),
      s AS (SELECT toks AS v, CAST(count(*) AS BIGINT) AS cnt
        FROM b WHERE doc_id % 2 = 1 GROUP BY 1),
      sc AS (SELECT v, cnt, CAST(sum(cnt) OVER (ORDER BY v
          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM s),
      tt AS (SELECT toks AS v, CAST(count(*) AS BIGINT) AS cnt
        FROM b WHERE doc_id % 2 = 0 GROUP BY 1),
      tc AS (SELECT v, cnt, CAST(sum(cnt) OVER (ORDER BY v
          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM tt),
      ns AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM s),
      nt AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM tt),
      m AS (SELECT sc.v AS value, sc.cum AS n_le, ns.n AS n_src,
        greatest(1, (sc.cum * nt.n + ns.n - 1) // ns.n)
          AS target_rank FROM sc, ns, nt)
      SELECT m.value, m.n_le, m.n_src, m.target_rank,
        CAST(min(tc.v) AS BIGINT) AS mapped
      FROM m JOIN tc ON tc.cum >= m.target_rank
      GROUP BY 1, 2, 3, 4 ORDER BY m.value""")
  )

  private val q175_survival_curve = Q(
    "q175_survival_curve",
    // Retention survival: users surviving at least each observed
    // activity span — per-user min/max agg, two-phase >=-cumulative
    // over the spans frame, one IEEE division for the fraction.
    (s, dir) =>
      graft.operators.Funnel.survivalCurve(
        events(s, dir), "user_id", "ts")
        .orderBy("span_days"),
    Some("""WITH u AS (SELECT user_id,
        CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
          AS BIGINT) AS d FROM events),
      sp AS (SELECT user_id, max(d) - min(d) AS v FROM u GROUP BY 1),
      c AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt FROM sp
        GROUP BY 1),
      s AS (SELECT v, cnt, CAST(sum(cnt) OVER (ORDER BY v
        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM c),
      n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM c)
      SELECT s.v AS span_days, s.cnt AS n_users,
        n.n - s.cum + s.cnt AS n_surviving,
        CAST(n.n - s.cum + s.cnt AS DOUBLE) / CAST(n.n AS DOUBLE)
          AS survival_frac
      FROM s, n ORDER BY span_days""")
  )

  private val q134_incremental_agg = Q(
    "q134_incremental_agg",
    // Incremental view maintenance: the daily per-type aggregate
    // table maintained by MERGING two batch states (events split by
    // event_id parity) — the oracle recomputes the view from ALL raw
    // rows, so the hash compare IS the "merged == full recompute"
    // theorem on real data. Merge inputs are state-sized, never the
    // old corpus. Null values count toward n but not the folds, on
    // both engines.
    (s, dir) => {
      val ev = events(s, dir).select(col("event_type"),
        datediff(col("ts").cast("date"), to_date(lit("1970-01-01")))
          .cast("long").as("day"),
        floor(col("value") * lit(100.0) + lit(0.5)).cast("long")
          .as("cents"),
        col("event_id"))
      val st = graft.operators.Incremental.buildState(
        ev.filter(col("event_id") % 2 === 0).drop("event_id"),
        Seq("event_type", "day"), "cents")
      val dl = graft.operators.Incremental.buildState(
        ev.filter(col("event_id") % 2 =!= 0).drop("event_id"),
        Seq("event_type", "day"), "cents")
      graft.operators.Incremental.mergeStates(st, dl)
        .orderBy("event_type", "day")
    },
    Some("""WITH b AS (SELECT event_type,
        CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
          AS BIGINT) AS day,
        CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events)
      SELECT event_type, day, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(cents) AS BIGINT) AS sum_v,
        min(cents) AS min_v, max(cents) AS max_v
      FROM b GROUP BY event_type, day ORDER BY event_type, day""")
  )

  private val q113_funnel = Q(
    "q113_funnel",
    // Ordered conversion funnel view -> click -> purchase: cascading
    // first-timestamp joins (step k's earliest event strictly after
    // the step k-1 entry), one aggregate row unpivoted to the
    // 3-step report. Strict > on timestamps both engines.
    (s, dir) =>
      graft.operators.Funnel.funnelCounts(
        events(s, dir), "user_id", "event_type", "ts",
        Seq("view", "click", "purchase")),
    Some("""WITH e AS (SELECT user_id, event_type, ts FROM events),
      a AS (SELECT user_id, min(ts) AS ta FROM e
        WHERE event_type = 'view' GROUP BY user_id),
      b AS (SELECT e.user_id, min(e.ts) AS tb FROM e
        JOIN a ON e.user_id = a.user_id AND e.ts > a.ta
        WHERE e.event_type = 'click' GROUP BY e.user_id),
      c AS (SELECT e.user_id, min(e.ts) AS tc FROM e
        JOIN b ON e.user_id = b.user_id AND e.ts > b.tb
        WHERE e.event_type = 'purchase' GROUP BY e.user_id)
      SELECT CAST(1 AS BIGINT) AS step, 'view' AS event_type,
        (SELECT CAST(count(*) AS BIGINT) FROM a) AS users
      UNION ALL SELECT 2, 'click', (SELECT CAST(count(*) AS BIGINT) FROM b)
      UNION ALL SELECT 3, 'purchase', (SELECT CAST(count(*) AS BIGINT) FROM c)
      ORDER BY step""")
  )

  private val q85_salted_join = Q(
    "q85_salted_join",
    // Salted equi-join under maximal key skew: lineitem's 3-value
    // l_returnflag means a plain shuffle join lands ~1/3 of the fact
    // table on ONE reducer partition each. Skew.saltedJoin spreads
    // every flag across 16 content-derived sub-keys and replicates the
    // (tiny here, "too big to broadcast" in the real case) dim 16x.
    // The oracle is the PLAIN join — equality proves salting changes
    // partitioning only, never semantics.
    (s, dir) => {
      val li = table(s, dir, "lineitem")
        .select("l_returnflag", "l_quantity", "l_extendedprice")
      val dim = s.createDataFrame(Seq(
        ("A", "returned"), ("N", "in_transit"), ("R", "refunded")))
        .toDF("l_returnflag", "flag_label")
      graft.operators.Skew.saltedJoin(li, dim, Seq("l_returnflag"), salt = 16)
        .groupBy("flag_label")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity")).cast("long").as("sum_qty"))
        .orderBy("flag_label")
    },
    Some("""WITH dim(l_returnflag, flag_label) AS (VALUES
        ('A', 'returned'), ('N', 'in_transit'), ('R', 'refunded'))
      SELECT flag_label, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(l_quantity) AS BIGINT) AS sum_qty
      FROM lineitem JOIN dim USING (l_returnflag)
      GROUP BY flag_label ORDER BY flag_label""")
  )

  private val q183_skyline = Q(
    "q183_skyline",
    // Pareto frontier of the part catalog under (minimize
    // p_retailprice, maximize p_size) — the cost/quality screen.
    // Two-phase bucketed dominance: per-bucket prefix-max windows
    // (partitioned, never global) + a B-row bucket-summary join; the
    // oracle is the textbook NOT EXISTS dominance test.
    (s, dir) =>
      graft.operators.Skyline.pareto2D(
        table(s, dir, "part"), "p_retailprice", "p_size")
        .select("p_partkey", "p_name", "p_retailprice", "p_size")
        .orderBy("p_retailprice", "p_partkey"),
    Some("""SELECT p_partkey, p_name, p_retailprice, p_size
      FROM part p
      WHERE NOT EXISTS (SELECT 1 FROM part q
        WHERE q.p_retailprice <= p.p_retailprice
          AND q.p_size >= p.p_size
          AND (q.p_retailprice < p.p_retailprice
            OR q.p_size > p.p_size))
      ORDER BY p_retailprice, p_partkey""")
  )

  private val q185_pagerank = Q(
    "q185_pagerank",
    // Fixed-point PageRank (3 iterations, damping 17/20) over the
    // near-dup LSH pair graph — which member of a duplicate
    // neighborhood is canonical. BIGINT ranks in 1e-12 units: the
    // per-node inbound SUM is an order-free integer partial agg, so
    // the result is bitwise deterministic where float PageRank is
    // shuffle-order-dependent. Oracle unrolls the same three integer
    // iterations over the exact-Jaccard graph.
    (s, dir) =>
      graft.operators.Graphs.pageRank(
        Dedup.minHashLshPairs(
          table(s, dir, "documents"), "doc_id", "text",
          n = 3, bands = 32, rowsPerBand = 4, minJ = 0.5),
        "id_a", "id_b", iterations = 3)
        .orderBy("node"),
    Some {
      val S = pagerankScale
      def iter(prev: String, sNm: String, rNm: String) =
        s"""$sNm AS (SELECT e.dst,
          CAST(sum($prev.r // $prev.deg) AS BIGINT) AS m
          FROM e JOIN $prev ON $prev.node = e.src GROUP BY 1),
        $rNm AS (SELECT nodes.node, nodes.deg,
          (3 * $S) // (20 * nn.n)
            + (17 * COALESCE($sNm.m, 0)) // 20 AS r
          FROM nodes CROSS JOIN nn
          LEFT JOIN $sNm ON $sNm.dst = nodes.node)"""
      s"""WITH g AS (SELECT doc_id, ${ngrams3(W)} AS s FROM documents),
        p AS (SELECT a.doc_id AS a, b.doc_id AS b
          FROM g a JOIN g b ON a.doc_id < b.doc_id
          WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
            (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
            >= 0.5),
        e AS (SELECT a AS src, b AS dst FROM p
          UNION ALL SELECT b, a FROM p),
        dg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg
          FROM e GROUP BY 1),
        nodes AS (SELECT src AS node, deg FROM dg),
        nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
        r0 AS (SELECT node, deg, $S // nn.n AS r
          FROM nodes CROSS JOIN nn),
        ${iter("r0", "s1", "r1")},
        ${iter("r1", "s2", "r2")},
        ${iter("r2", "s3", "r3")}
        SELECT node, CAST(r AS BIGINT) AS rank_scaled,
          CAST(r AS DOUBLE) / $S.0 AS rank
        FROM r3 ORDER BY node"""
    }
  )

  private val q188_pit_enrich = Q(
    "q188_pit_enrich",
    // Point-in-time enrichment: each purchase event joined to the
    // SCD2 state (q123's changeHistory) the user was in STRICTLY
    // before the purchase — the leak-proof feature-store read
    // (training features must not see the label event itself). One
    // as-of backward join over the shared (user) exchange; first-ever
    // events carry honest nulls. The oracle replays the validity
    // tiling [from, to) against each fact timestamp.
    (s, dir) => {
      val ev = events(s, dir)
      val hist = graft.operators.TimeSeries.changeHistory(
        ev, Seq("user_id"), "ts", "event_type", "event_id")
        .withColumn("_vf", timestamp_micros(col("valid_from_us")))
      val facts = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      graft.operators.Joins.asofJoin(
        facts, hist, Seq("user_id"), "ts", "_vf",
        rightPayload = Seq("value", "valid_from_us"),
        strict = true, direction = "backward")
        .select(col("event_id"), col("user_id"),
          expr("unix_micros(ts)").as("ts_us"),
          col("value").as("prev_state"),
          col("valid_from_us").as("state_since_us"))
        .orderBy("event_id")
    },
    Some("""WITH l AS (SELECT user_id, event_type, ts, event_id,
        CASE WHEN lag(event_type) OVER
          (PARTITION BY user_id ORDER BY ts, event_id)
          IS NOT DISTINCT FROM event_type THEN 0 ELSE 1 END AS chg
        FROM events),
      r AS (SELECT *, sum(chg) OVER (PARTITION BY user_id
          ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS run
        FROM l),
      g AS (SELECT user_id, run, event_type AS value,
          min(epoch_us(ts)) AS valid_from_us
        FROM r GROUP BY 1, 2, 3),
      periods AS (SELECT user_id, value, valid_from_us,
        lead(valid_from_us) OVER (PARTITION BY user_id
          ORDER BY valid_from_us) AS valid_to_us FROM g),
      facts AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
        FROM events WHERE event_type = 'purchase')
      SELECT f.event_id, f.user_id, f.ts_us,
        p.value AS prev_state, p.valid_from_us AS state_since_us
      FROM facts f LEFT JOIN periods p ON p.user_id = f.user_id
        AND p.valid_from_us < f.ts_us
        AND (p.valid_to_us IS NULL OR p.valid_to_us >= f.ts_us)
      ORDER BY event_id""")
  )

  private val q192_basket_rules = Q(
    "q192_basket_rules",
    // Market-basket association rules over order baskets: part pairs
    // co-purchased in >= 3 orders, with directed confidences and
    // lift from exact integer counts — the per-basket self-join
    // bounds the quadratic, never corpus^2.
    (s, dir) =>
      graft.operators.Basket.associationPairs(
        table(s, dir, "lineitem"), "l_orderkey", "l_partkey",
        minSupport = 3L)
        .orderBy("item_a", "item_b"),
    Some("""WITH i AS (SELECT DISTINCT l_orderkey AS bk,
        l_partkey AS it FROM lineitem),
      f AS (SELECT it, CAST(count(*) AS BIGINT) AS df FROM i
        GROUP BY 1),
      nb AS (SELECT CAST(count(DISTINCT bk) AS BIGINT) AS n FROM i),
      p AS (SELECT a.it AS item_a, b.it AS item_b,
        CAST(count(*) AS BIGINT) AS n_xy
        FROM i a JOIN i b ON a.bk = b.bk AND a.it < b.it
        GROUP BY 1, 2 HAVING count(*) >= 3)
      SELECT p.item_a, p.item_b, p.n_xy, fa.df AS df_a, fb.df AS df_b,
        CAST(p.n_xy AS DOUBLE) / CAST(fa.df AS DOUBLE) AS conf_ab,
        CAST(p.n_xy AS DOUBLE) / CAST(fb.df AS DOUBLE) AS conf_ba,
        CAST(p.n_xy * nb.n AS DOUBLE)
          / CAST(fa.df * fb.df AS DOUBLE) AS lift
      FROM p JOIN f fa ON fa.it = p.item_a
      JOIN f fb ON fb.it = p.item_b CROSS JOIN nb
      ORDER BY item_a, item_b""")
  )

  private val q193_abc_revenue = Q(
    "q193_abc_revenue",
    // ABC/Pareto revenue classification of parts: decimal-exact
    // revenue sums (associative — shuffle-order-proof), two-phase
    // descending cumsum, class boundaries compared as 100*(cum-w) vs
    // pct*total in exact decimal arithmetic.
    (s, dir) => {
      val rev = table(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2)))
          .as("revenue"))
      graft.operators.Skew.paretoClasses(rev, "l_partkey", "revenue")
        .select(col("key").as("l_partkey"),
          // classes decide in exact decimal; the EMITTED money is the
          // conventional double face (one deterministic conversion)
          col("weight").cast("double").as("revenue"),
          col("cum_weight").cast("double").as("cum_revenue"),
          col("abc_class"))
        .orderBy(col("revenue").desc, col("l_partkey"))
    },
    Some("""WITH r AS (SELECT l_partkey,
        sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS revenue
        FROM lineitem GROUP BY 1),
      t AS (SELECT sum(revenue) AS tot FROM r),
      c AS (SELECT l_partkey, revenue,
        sum(revenue) OVER (ORDER BY revenue DESC, l_partkey
          ROWS UNBOUNDED PRECEDING) AS cum FROM r)
      SELECT c.l_partkey, CAST(c.revenue AS DOUBLE) AS revenue,
        CAST(c.cum AS DOUBLE) AS cum_revenue,
        CASE WHEN 100 * (c.cum - c.revenue) < 80 * t.tot THEN 'A'
          WHEN 100 * (c.cum - c.revenue) < 95 * t.tot THEN 'B'
          ELSE 'C' END AS abc_class
      FROM c CROSS JOIN t ORDER BY c.revenue DESC, l_partkey""")
  )

  private val q196_interval_overlap = Q(
    "q196_interval_overlap",
    // Interval-overlap join (incident correlation): per user, error
    // windows [ts, ts + 120*value s] against purchase windows of the
    // same shape — BOTH sides variable-length intervals, the shape a
    // range join cannot express. Joins.intervalOverlapJoin explodes
    // each side into the day cells its interval touches, equi-joins
    // on (user, cell), and keeps a pair only in the first shared
    // cell (no distinct). The oracle is the direct inequality join.
    (s, dir) => {
      val ev = events(s, dir).select(
        col("event_id"), col("user_id"), col("event_type"), col("ts"),
        timestamp_micros(unix_micros(col("ts")) +
          floor(col("value") * 120).cast("long") * 1000000L).as("te"))
      val err = ev.filter(col("event_type") === "error").select(
        col("event_id").as("error_id"), col("user_id"),
        col("ts").as("error_ts"), col("te").as("error_te"))
      val pur = ev.filter(col("event_type") === "purchase").select(
        col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"), col("te").as("purchase_te"))
      graft.operators.Joins.intervalOverlapJoin(
        err, pur, Seq("user_id"),
        "error_ts", "error_te", "purchase_ts", "purchase_te",
        widthSec = 86400.0)
        .select(col("error_id"), col("purchase_id"), col("user_id"),
          (unix_micros(least(col("error_te"), col("purchase_te"))) -
            unix_micros(greatest(col("error_ts"), col("purchase_ts"))))
            .as("overlap_micros"))
        .orderBy("error_id", "purchase_id")
    },
    Some("""WITH ev AS (SELECT event_id, user_id, event_type, ts,
        ts + to_seconds(CAST(floor(value * 120) AS BIGINT)) AS te
        FROM events),
      e AS (SELECT event_id AS error_id, user_id, ts AS ets, te AS ete
        FROM ev WHERE event_type = 'error'),
      p AS (SELECT event_id AS purchase_id, user_id, ts AS pts,
          te AS pte FROM ev WHERE event_type = 'purchase')
      SELECT e.error_id, p.purchase_id, e.user_id,
        CAST(epoch_us(least(e.ete, p.pte))
          - epoch_us(greatest(e.ets, p.pts)) AS BIGINT) AS overlap_micros
      FROM e JOIN p ON p.user_id = e.user_id
        AND e.ets <= p.pte AND p.pts <= e.ete
      ORDER BY e.error_id, p.purchase_id""")
  )

  private val q199_assortativity = Q(
    "q199_assortativity",
    // Degree assortativity of the part co-purchase graph (q192's
    // edges): do popular parts co-occur with popular parts? Exact
    // integer moments over directed half-edges, ONE IEEE expression
    // for Newman's r — bit-identical cross-engine. Hub-and-spokes
    // crawl artifacts in a dup graph drive r negative; this is the
    // one-number structure diagnosis.
    (s, dir) => {
      val edges = graft.operators.Basket.coPairs(
        table(s, dir, "lineitem"), "l_orderkey", "l_partkey")
        .select(col("item_a").as("u"), col("item_b").as("v"))
      graft.operators.Graphs.degreeAssortativity(edges, "u", "v")
    },
    Some("""WITH i AS (SELECT DISTINCT l_orderkey AS bk,
        l_partkey AS it FROM lineitem),
      e AS (SELECT DISTINCT a.it AS u, b.it AS v
        FROM i a JOIN i b ON a.bk = b.bk AND a.it < b.it),
      dirr AS (SELECT u AS src, v AS dst FROM e
        UNION ALL SELECT v, u FROM e),
      deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM dirr
        GROUP BY 1),
      j AS (SELECT dx.d AS dx, dy.d AS dy FROM dirr
        JOIN deg dx ON dx.src = dirr.src
        JOIN deg dy ON dy.src = dirr.dst),
      m AS (SELECT CAST(count(*) AS BIGINT) AS m_halfedges,
        CAST(CAST(sum(dx) AS DECIMAL(38,0)) AS DOUBLE) AS sx,
        CAST(sum(CAST(dx AS DECIMAL(38,0)) * CAST(dx AS DECIMAL(38,0)))
          AS DOUBLE) AS sxx,
        CAST(sum(CAST(dx AS DECIMAL(38,0)) * CAST(dy AS DECIMAL(38,0)))
          AS DOUBLE) AS sxy
        FROM j),
      nn AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM deg),
      ne AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e)
      SELECT nn.n_nodes, ne.n_edges, m.m_halfedges,
        CASE WHEN CAST(m.m_halfedges AS DOUBLE) * sxx - sx * sx > 0.0
          THEN (CAST(m.m_halfedges AS DOUBLE) * sxy - sx * sx)
            / (CAST(m.m_halfedges AS DOUBLE) * sxx - sx * sx)
          END AS r
      FROM nn CROSS JOIN ne CROSS JOIN m""")
  )

  private val q226_triangles_capped = Q(
    "q226_triangles_capped",
    // Hub-excluded triangle stats on the part co-purchase graph
    // (parts sharing an order) — a genuinely dense graph where the
    // maxDegree knob matters: degree > 160 hubs (the staple parts
    // every order touches) leave the counting subgraph and report
    // NULL counts; everyone else counts the capped subgraph, a
    // documented lower bound. The oracle rebuilds the edges, the
    // hub set, and every capped count by three-way self-join.
    (s, dir) => {
      val li = table(s, dir, "lineitem")
        .select(col("l_orderkey").as("k"), col("l_partkey").as("p"))
        .filter(col("p").isNotNull)
      val edges = li.as("a")
        .join(li.as("b"),
          col("a.k") === col("b.k") && col("a.p") =!= col("b.p"))
        .select(col("a.p").as("id_a"), col("b.p").as("id_b"))
      graft.operators.Graphs.triangleStats(
        edges, "id_a", "id_b", maxDegree = Some(160L))
        .orderBy("node")
    },
    Some("""WITH li AS (SELECT l_orderkey AS k, l_partkey AS p
        FROM lineitem WHERE l_partkey IS NOT NULL),
      e AS (SELECT DISTINCT least(a.p, b.p) AS x,
          greatest(a.p, b.p) AS y
        FROM li a JOIN li b ON a.k = b.k AND a.p <> b.p),
      d AS (SELECT node, CAST(count(*) AS BIGINT) AS degree FROM
        (SELECT x AS node FROM e UNION ALL SELECT y FROM e)
        GROUP BY 1),
      hubs AS (SELECT node FROM d WHERE degree > 160),
      ec AS (SELECT x, y FROM e
        WHERE x NOT IN (SELECT node FROM hubs)
          AND y NOT IN (SELECT node FROM hubs)),
      t AS (SELECT e1.x AS a, e1.y AS b, e2.y AS c
        FROM ec e1 JOIN ec e2 ON e2.x = e1.y
        JOIN ec e3 ON e3.x = e1.x AND e3.y = e2.y),
      tc AS (SELECT node, CAST(count(*) AS BIGINT) AS triangles FROM
        (SELECT a AS node FROM t UNION ALL SELECT b FROM t
         UNION ALL SELECT c FROM t) GROUP BY 1)
      SELECT d.node, d.degree,
        CASE WHEN d.degree <= 160
          THEN CAST(COALESCE(tc.triangles, 0) AS BIGINT) END
          AS triangles,
        CASE WHEN d.degree >= 2 AND d.degree <= 160
          THEN CAST(2 * COALESCE(tc.triangles, 0) AS DOUBLE)
            / CAST(d.degree * (d.degree - 1) AS DOUBLE)
          END AS clustering_coeff
      FROM d LEFT JOIN tc ON tc.node = d.node ORDER BY d.node""")
  )

  private val q232_kcore = Q(
    "q232_kcore",
    // 70-core of the part co-purchase graph: iterative peeling
    // (delete degree<70 nodes, recompute, repeat) to fixpoint —
    // converges in 2 rounds on this graph; the Spark side loudly
    // bounds rounds at 8 and the oracle unrolls the SAME 8 rounds
    // (monotone peeling: extra rounds past fixpoint are no-ops, so
    // the unrolled twin is exact). Dense-nucleus extraction above
    // triangle counting.
    (s, dir) => {
      val li = table(s, dir, "lineitem")
        .select(col("l_orderkey").as("k"), col("l_partkey").as("p"))
        .filter(col("p").isNotNull)
      val edges = li.as("a")
        .join(li.as("b"),
          col("a.k") === col("b.k") && col("a.p") =!= col("b.p"))
        .select(col("a.p").as("id_a"), col("b.p").as("id_b"))
      graft.operators.Graphs.kCore(
        edges, "id_a", "id_b", k = 70, maxRounds = 8)
        .orderBy("node")
    },
    Some {
      // each round: restrict edges to alive destinations (inner
      // equi-join), then per-alive-node surviving degree (left
      // equi-join + count of matches). Every CTE is MATERIALIZED:
      // DuckDB inlines plain CTEs, and with each round referencing
      // the previous one twice the 8-round chain would otherwise
      // expand 2^8 evaluations of the base graph
      val rounds = (1 to 8).map { i =>
        s"""m$i AS MATERIALIZED (SELECT dd.s, dd.d FROM dd
          JOIN a${i - 1} t ON t.node = dd.d),
        d$i AS MATERIALIZED (SELECT n.node, count(m$i.d) AS c
          FROM a${i - 1} n
          LEFT JOIN m$i ON m$i.s = n.node GROUP BY 1),
        a$i AS MATERIALIZED (SELECT node FROM d$i WHERE c >= 70)"""
      }.mkString(",\n      ")
      s"""WITH li AS (SELECT l_orderkey AS k, l_partkey AS p
          FROM lineitem WHERE l_partkey IS NOT NULL),
        ee AS MATERIALIZED (SELECT DISTINCT least(a.p, b.p) AS x,
            greatest(a.p, b.p) AS y
          FROM li a JOIN li b ON a.k = b.k AND a.p <> b.p),
        dd AS MATERIALIZED (SELECT x AS s, y AS d FROM ee
          UNION ALL SELECT y, x FROM ee),
        fd AS MATERIALIZED (SELECT s AS node,
            CAST(count(*) AS BIGINT) AS degree
          FROM dd GROUP BY 1),
        a0 AS MATERIALIZED (SELECT node FROM fd WHERE degree >= 70),
        $rounds,
        cd AS (SELECT dd.s AS node,
            CAST(count(*) AS BIGINT) AS kcore_degree FROM dd
          JOIN a8 ts ON ts.node = dd.s
          JOIN a8 td ON td.node = dd.d GROUP BY 1)
        SELECT fd.node, fd.degree, (a.node IS NOT NULL) AS in_kcore,
          cd.kcore_degree
        FROM fd LEFT JOIN a8 a ON a.node = fd.node
        LEFT JOIN cd ON cd.node = fd.node ORDER BY fd.node"""
    }
  )

  private val q264_label_propagation = Q(
    "q264_label_propagation",
    // Community detection on the part co-purchase graph: 4 rounds of
    // SYNCHRONOUS label propagation (adopt the most frequent neighbor
    // label, ties to the MIN label — fully deterministic, unlike the
    // classic randomized LPA). Fixed rounds, never convergence-tested,
    // so the oracle unrolls the SAME 4 rounds MATERIALIZED (the q232
    // discipline; un-materialized, DuckDB would inline the chain and
    // re-evaluate the base graph 2^4 times). No floats anywhere —
    // integer counts and id ties — so equality is structural.
    (s, dir) => {
      val li = table(s, dir, "lineitem")
        .select(col("l_orderkey").as("k"), col("l_partkey").as("p"))
        .filter(col("p").isNotNull)
      val edges = li.as("a")
        .join(li.as("b"),
          col("a.k") === col("b.k") && col("a.p") =!= col("b.p"))
        .select(col("a.p").as("id_a"), col("b.p").as("id_b"))
      graft.operators.Graphs.labelPropagation(
        edges, "id_a", "id_b", rounds = 4)
        .orderBy("node")
    },
    Some {
      s"""WITH $lpaChainSql,
        sz AS (SELECT label, CAST(count(*) AS BIGINT) AS size
          FROM l4 GROUP BY 1)
        SELECT l4.node, l4.label AS community, sz.size
        FROM l4 JOIN sz ON sz.label = l4.label ORDER BY l4.node"""
    }
  )

  /** The co-purchase LPA chain shared by q264 (the partition) and
    * q265 (its modularity): li → simple graph ee/dd → l0 → four
    * MATERIALIZED synchronous rounds ending at l4. */
  private def lpaChainSql: String = {
    val rounds = (1 to 4).map { i =>
      s"""n$i AS MATERIALIZED (SELECT dd.s AS node, l${i - 1}.label,
        count(*) AS c FROM dd
        JOIN l${i - 1} ON l${i - 1}.node = dd.d GROUP BY 1, 2),
      l$i AS MATERIALIZED (SELECT node, label FROM (
        SELECT node, label, row_number() OVER (PARTITION BY node
          ORDER BY c DESC, label) AS r FROM n$i) WHERE r = 1)"""
    }.mkString(",\n      ")
    s"""li AS (SELECT l_orderkey AS k, l_partkey AS p
        FROM lineitem WHERE l_partkey IS NOT NULL),
      ee AS MATERIALIZED (SELECT DISTINCT least(a.p, b.p) AS x,
          greatest(a.p, b.p) AS y
        FROM li a JOIN li b ON a.k = b.k AND a.p <> b.p),
      dd AS MATERIALIZED (SELECT x AS s, y AS d FROM ee
        UNION ALL SELECT y, x FROM ee),
      l0 AS MATERIALIZED (SELECT DISTINCT s AS node, s AS label
        FROM dd),
      $rounds"""
  }

  private val q265_modularity = Q(
    "q265_modularity",
    // Newman modularity of the q264 LPA partition — "did LPA find
    // structure or noise" as one exact-rational number per community
    // (Q = sum of q_contrib): within-community edge share minus the
    // degree-preserving random expectation. Exact integers up to ONE
    // double division per row (4mL_c − d_c² over 4m², DECIMAL(38,0)
    // cast BEFORE the multiply, the q197 discipline); the oracle
    // replays the full LPA chain then the same integer algebra.
    (s, dir) => {
      val li = table(s, dir, "lineitem")
        .select(col("l_orderkey").as("k"), col("l_partkey").as("p"))
        .filter(col("p").isNotNull)
      val edges = li.as("a")
        .join(li.as("b"),
          col("a.k") === col("b.k") && col("a.p") =!= col("b.p"))
        .select(col("a.p").as("id_a"), col("b.p").as("id_b"))
      val comm = graft.operators.Graphs.labelPropagation(
        edges, "id_a", "id_b", rounds = 4)
        .select(col("node"), col("community"))
      graft.operators.Graphs.modularity(edges, "id_a", "id_b", comm)
        .orderBy("community")
    },
    Some {
      s"""WITH $lpaChainSql,
        deg AS (SELECT s AS node, CAST(count(*) AS BIGINT) AS dg
          FROM dd GROUP BY 1),
        dc AS (SELECT l4.label AS community,
            CAST(count(*) AS BIGINT) AS n_nodes,
            CAST(sum(deg.dg) AS BIGINT) AS d_c
          FROM l4 JOIN deg ON deg.node = l4.node GROUP BY 1),
        lcc AS (SELECT ca.label AS community,
            CAST(count(*) AS BIGINT) AS l_c
          FROM ee JOIN l4 ca ON ca.node = ee.x
          JOIN l4 cb ON cb.node = ee.y
          WHERE ca.label = cb.label GROUP BY 1),
        mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM ee)
        SELECT dc.community, dc.n_nodes,
          COALESCE(lcc.l_c, CAST(0 AS BIGINT)) AS l_c, dc.d_c,
          round(CAST(CAST(4 AS DECIMAL(38,0))
              * CAST(mm.m AS DECIMAL(38,0))
              * CAST(COALESCE(lcc.l_c, 0) AS DECIMAL(38,0))
              - CAST(dc.d_c AS DECIMAL(38,0))
              * CAST(dc.d_c AS DECIMAL(38,0)) AS DOUBLE)
            / CAST(CAST(4 AS DECIMAL(38,0))
              * CAST(mm.m AS DECIMAL(38,0))
              * CAST(mm.m AS DECIMAL(38,0)) AS DOUBLE), 6)
            AS q_contrib
        FROM dc LEFT JOIN lcc USING (community) CROSS JOIN mm
        ORDER BY dc.community"""
    }
  )

  val all: Seq[Q] = Seq(
    q226_triangles_capped,
    q232_kcore,
    q264_label_propagation,
    q265_modularity,
    q60_topk_aggregator,
    q123_scd2_history,
    q126_retention,
    q149_cooccurrence,
    q151_transitions,
    q157_attribution,
    q163_trailing_pit,
    q166_motifs,
    q168_activity_profile,
    q169_triangle_stats,
    q170_quantile_map,
    q175_survival_curve,
    q134_incremental_agg,
    q113_funnel,
    q85_salted_join,
    q183_skyline,
    q185_pagerank,
    q188_pit_enrich,
    q192_basket_rules,
    q193_abc_revenue,
    q196_interval_overlap,
    q199_assortativity,
    q239_link_prediction)
}
