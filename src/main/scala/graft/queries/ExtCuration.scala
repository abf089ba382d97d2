package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.TextFunctions
import graft.operators.{Dedup, Multimodal, Similarity}
import graft.queries.Catalog.{Q, table, events}
import graft.queries.ExtShared._

/** Curation and sampling: token budgets, quality cuts, mixtures, packing, sharding, k-fold, allocation.
  * Split from the former single Extensions.scala (round 7) for
  * navigability — zero behavior change; [[Extensions.all]] still
  * concatenates every family. */
private[queries] object ExtCuration {

  /** Spark-side q244/q245 training frame: rule-distillation label +
    * four 6-decimal-face surface features over documents. The label
    * is the hand-written quality rule's verdict (qualityScore ≥ 0.6
    * — ~51/49 balanced on this corpus), so training DISTILLS the
    * saturating hand rule into a linear model — the standard way a
    * rule-based corpus filter gets replaced by a learned one, and a
    * genuinely learnable task here (the corpus's metadata labels are
    * uncorrelated with its synthetic text, measured: every surface
    * and marker feature is class-flat for `lang`; the trained AUC on
    * this label is ≈0.99 where the lang label gave ≈0.51). Features
    * deliberately differ from the rule's inputs where natural
    * (token count vs the rule's char count; mean word length as a
    * nuisance feature). */
  private[queries] def qualityFeatures(
      s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    table(s, dir, "documents")
      .select(
        col("doc_id"), col("source"),
        when(TextFunctions.qualityScore(col("text")) >= 0.6, 1L)
          .otherwise(0L).as("y"),
        round(TextFunctions.tokenCount(col("text")).cast("double")
          / 400.0, 6).as("x1"),
        round(TextFunctions.punctRatio(col("text")), 6).as("x2"),
        round(TextFunctions.stopwordRatio(col("text")), 6).as("x3"),
        round(TextFunctions.meanWordLen(col("text")) / 10.0, 6)
          .as("x4"))
  }

  /** Oracle twin of [[qualityFeatures]] + the unrolled 3-iteration
    * quantized-GD chain (w0 → w3): CTEs t, dup, f, nn, w0, s1..w3.
    * Shared by the q244 (training trace) and q245 (scoring + AUC)
    * oracles. */
  private[queries] val qualityTrainCtes: String = {
    val sig = (p: String) =>
      s"round(1.0/(1.0+exp(-($p.b0 + $p.w1*f.x1 + $p.w2*f.x2 " +
        s"+ $p.w3*f.x3 + $p.w4*f.x4))), 6)"
    val d6 = (c: String) => s"CAST($c AS DECIMAL(18,6))"
    def gradCtes(k: Int): String = {
      val p = s"w${k - 1}"
      s"""s$k AS (SELECT f.y, f.x1, f.x2, f.x3, f.x4,
          ${sig(p)} AS s6
        FROM f CROSS JOIN $p),
      g$k AS (SELECT
          sum(${d6("s6")} - ${d6("y")}) AS g0,
          sum((${d6("s6")} - ${d6("y")}) * ${d6("x1")}) AS gx1,
          sum((${d6("s6")} - ${d6("y")}) * ${d6("x2")}) AS gx2,
          sum((${d6("s6")} - ${d6("y")}) * ${d6("x3")}) AS gx3,
          sum((${d6("s6")} - ${d6("y")}) * ${d6("x4")}) AS gx4,
          sum(abs(${d6("s6")} - ${d6("y")})) AS mae
        FROM s$k),
      w$k AS (SELECT
          round(p.b0 - 2.0 * (CAST(g.g0 AS DOUBLE)
            / CAST(nn.n AS DOUBLE)), 6) AS b0,
          round(p.w1 - 2.0 * (CAST(g.gx1 AS DOUBLE)
            / CAST(nn.n AS DOUBLE)), 6) AS w1,
          round(p.w2 - 2.0 * (CAST(g.gx2 AS DOUBLE)
            / CAST(nn.n AS DOUBLE)), 6) AS w2,
          round(p.w3 - 2.0 * (CAST(g.gx3 AS DOUBLE)
            / CAST(nn.n AS DOUBLE)), 6) AS w3,
          round(p.w4 - 2.0 * (CAST(g.gx4 AS DOUBLE)
            / CAST(nn.n AS DOUBLE)), 6) AS w4,
          round(CAST(g.mae AS DOUBLE) / CAST(nn.n AS DOUBLE), 6)
            AS mae
        FROM g$k g CROSS JOIN w${k - 1} p CROSS JOIN nn)"""
    }
    s"""t AS (SELECT doc_id, text, source, $W AS w,
        CASE WHEN length(text) = 0 THEN 0.0
          ELSE CAST(len(regexp_extract_all(text,
            '[.,;:!?''"()\\[\\]{}-]')) AS DOUBLE) / length(text)
          END AS pr,
        CASE WHEN len($W) = 0 THEN 0.0
          ELSE CAST(len(list_filter($W,
            x -> list_contains($stopList, x))) AS DOUBLE)
            / len($W) END AS sr
        FROM documents),
      f AS (SELECT t.doc_id, t.source,
          CASE WHEN round(least(CAST(length(t.text) AS DOUBLE)
              / 400.0, 1.0) * 0.5
            + least(t.sr * 5.0, 1.0) * 0.4
            + (1.0 - least(t.pr * 4.0, 1.0)) * 0.1, 6) >= 0.6
            THEN 1 ELSE 0 END AS y,
          round(CAST(len(t.w) AS DOUBLE) / 400.0, 6) AS x1,
          round(t.pr, 6) AS x2,
          round(t.sr, 6) AS x3,
          round(CASE WHEN len(t.w) = 0 THEN 0.0
            ELSE CAST(list_aggregate(list_transform(t.w,
              x -> length(x)), 'sum') AS DOUBLE) / len(t.w) END
            / 10.0, 6) AS x4
        FROM t),
      nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM f),
      w0 AS (SELECT 0.0 AS b0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3,
        0.0 AS w4),
      ${gradCtes(1)},
      ${gradCtes(2)},
      ${gradCtes(3)}"""
  }

  private val q244_quality_classifier = Q(
    "q244_quality_classifier",
    // Distributed logistic-regression training (Classify.logisticGD,
    // 3 full-batch quantized-GD steps, lr=2.0): surface features at
    // 6-decimal faces (scaled token count, punct ratio, stopword
    // ratio, scaled mean word length) distill the hand-written
    // quality rule's verdict — the fastText-style quality screen,
    // trained instead of hand-tuned.
    // Gradient sums are exact DECIMAL(38,12) (order-free), sigmoids
    // ride the 6-decimal exp face, weights re-quantize to 6 decimals
    // per step — so the oracle replays TRAINING ITSELF, iteration by
    // iteration, to hash equality. Output: the 3-row training trace;
    // the last row is the model.
    (s, dir) =>
      graft.operators.Classify.logisticGD(
        qualityFeatures(s, dir), "y", Seq("x1", "x2", "x3", "x4"),
        lr = 2.0, iterations = 3)
        .orderBy("iter"),
    Some {
      def outRow(k: Int): String =
        s"""SELECT CAST($k AS BIGINT) AS iter, nn.n, w$k.mae,
          w$k.b0, w$k.w1 AS w_x1, w$k.w2 AS w_x2, w$k.w3 AS w_x3,
          w$k.w4 AS w_x4 FROM w$k CROSS JOIN nn"""
      s"""WITH $qualityTrainCtes
        ${outRow(1)} UNION ALL ${outRow(2)} UNION ALL ${outRow(3)}
        ORDER BY iter"""
    }
  )

  private val q245_classifier_auc = Q(
    "q245_classifier_auc",
    // Train-then-evaluate: the q244 model's final weights score the
    // corpus (same quantized sigmoid), and ROC AUC comes from the
    // exact-integer midrank identity AUC = U/(n+·n-) over the
    // rankSumTest machinery — one IEEE division at the 6-decimal
    // face. The oracle replays training to w3, rescores, and
    // rebuilds the midrank sum over distinct score values.
    (s, dir) => {
      val f = qualityFeatures(s, dir)
      val last = graft.operators.Classify.logisticGD(
        f, "y", Seq("x1", "x2", "x3", "x4"),
        lr = 2.0, iterations = 3)
        .orderBy("iter").collect().last
      val w = (3 to 7).map(last.getDouble)
      graft.operators.Classify.aucReport(
        graft.operators.Classify.score(
          f, Seq("x1", "x2", "x3", "x4"), w),
        "y", "score")
    },
    Some(s"""WITH $qualityTrainCtes,
      sc AS (SELECT f.y,
          round(1.0/(1.0+exp(-(w3.b0 + w3.w1*f.x1 + w3.w2*f.x2
            + w3.w3*f.x3 + w3.w4*f.x4))), 6) AS s
        FROM f CROSS JOIN w3),
      cnt AS (SELECT s, CAST(count(*) AS BIGINT) AS c,
          CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT)
            AS cp
        FROM sc GROUP BY 1),
      cum AS (SELECT s, c, cp, sum(c) OVER (ORDER BY s) AS cm
        FROM cnt),
      agg AS (SELECT
          CAST(COALESCE(sum(cp), 0) AS BIGINT) AS n_pos,
          CAST(COALESCE(sum(c - cp), 0) AS BIGINT) AS n_neg,
          CAST(COALESCE(sum(cp * (2 * cm - c + 1)), 0) AS BIGINT)
            AS r2a
        FROM cum)
      SELECT n_pos, n_neg,
        CASE WHEN n_pos > 0 AND n_neg > 0 THEN
          round(CAST(r2a - n_pos * (n_pos + 1) AS DOUBLE)
            / (2.0 * CAST(n_pos * n_neg AS DOUBLE)), 6)
          END AS auc
      FROM agg""")
  )

  private val q68_sample_crossengine = Q(
    "q68_sample_crossengine",
    // Cross-engine deterministic sampling: the md5-threshold decision
    // is recomputed bit-for-bit by DuckDB (md5_number_lower), so the
    // sampled ROW SET itself is the oracle — the property that lets a
    // non-Spark system carve the identical split.
    (s, dir) =>
      graft.operators.Sampling.crossEngineSample(
        table(s, dir, "documents"), col("doc_id"), fraction = 0.25,
        salt = "graft")
        .select("doc_id", "source")
        .orderBy("doc_id"),
    Some {
      val t = java.lang.Long.toUnsignedString(
        graft.operators.Sampling.unsignedThreshold(0.25))
      s"""SELECT doc_id, source FROM documents
      WHERE md5_number_lower(CAST(doc_id AS VARCHAR) || ':graft')
        < CAST('$t' AS UBIGINT)
      ORDER BY doc_id"""
    }
  )

  private val q99_shuffle_shards = Q(
    "q99_shuffle_shards",
    // Deterministic sharded corpus shuffle: shard AND in-shard
    // position are pure functions of md5(doc_id:salt), so the entire
    // permutation — not just a sampled property of it — is the
    // oracle; DuckDB recomputes every (shard, pos) bit-for-bit. The
    // pretraining ordering step with zero RNG and zero global sort.
    (s, dir) =>
      graft.operators.Sampling.shuffleShards(
        table(s, dir, "documents"), col("doc_id"), nShards = 8,
        salt = "graft")
        .select("doc_id", "shard", "pos")
        .orderBy("shard", "pos"),
    Some("""WITH h AS (SELECT doc_id,
        md5_number_lower(CAST(doc_id AS VARCHAR) || ':graft') AS hv
      FROM documents)
      SELECT doc_id, CAST(hv % 8 AS BIGINT) AS shard,
        CAST(row_number() OVER (PARTITION BY hv % 8
          ORDER BY hv, doc_id) AS BIGINT) AS pos
      FROM h ORDER BY shard, pos""")
  )

  private val q100_length_batches = Q(
    "q100_length_batches",
    // Length-bucketed batch assignment: docs grouped by similar token
    // count (bucket = toks/50), fixed-size batches filled inside each
    // (bucket, shard) cell — the padding-minimization report for runs
    // that batch whole documents. Pure integer math; the oracle
    // recomputes every batch's count/max/sum/padding.
    (s, dir) => {
      val t = table(s, dir, "documents").select(
        col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("toks"))
      graft.operators.Pack.lengthBatches(
        t, "doc_id", "toks", bucketWidth = 50L, batchSize = 8, shards = 2)
        .orderBy("bucket", "shard", "batch")
    },
    Some(s"""WITH t AS (SELECT doc_id, CAST(len($W) AS BIGINT) AS toks
        FROM documents),
      b AS (SELECT doc_id, toks, toks // 50 AS bucket,
        doc_id % 2 AS shard FROM t),
      r AS (SELECT *, (row_number() OVER (PARTITION BY bucket, shard
        ORDER BY toks, doc_id) - 1) // 8 AS batch FROM b)
      SELECT CAST(bucket AS BIGINT) AS bucket,
        CAST(shard AS BIGINT) AS shard, CAST(batch AS BIGINT) AS batch,
        CAST(count(*) AS BIGINT) AS n_docs,
        CAST(max(toks) AS BIGINT) AS max_toks,
        CAST(sum(toks) AS BIGINT) AS sum_toks,
        CAST(count(*) * max(toks) - sum(toks) AS BIGINT) AS padding
      FROM r GROUP BY bucket, shard, batch
      ORDER BY bucket, shard, batch""")
  )

  private val q69_token_budget = Q(
    "q69_token_budget",
    // Quality-first token-budget cut: keep the best-quality prefix
    // that fits 20k tokens. Ordering key is the (oracle-matched)
    // quality score with doc_id tiebreak — a total order, so the
    // window cumsum is deterministic in both engines.
    (s, dir) =>
      graft.operators.Curation.tokenBudgetSelect(
        table(s, dir, "documents"), "doc_id", "text", budget = 20000L,
        quality = TextFunctions.qualityScore(col("text")),
        // qualityScore is a [0,1] convex blend by construction, so the
        // range scan is skippable — two passes total
        qualityRange = Some((0.0, 1.0)))
        .select("doc_id", "source", "lang")
        .orderBy("doc_id"),
    Some(s"""WITH scored AS (SELECT doc_id, source, lang,
        CAST(len($W) AS BIGINT) AS toks,
        round(least(CAST(length(text) AS DOUBLE) / 400.0, 1.0) * 0.5
          + least((CASE WHEN len($W) = 0 THEN 0.0
              ELSE CAST(len(list_filter($W, x -> list_contains($stopList, x)))
                AS DOUBLE) / len($W) END) * 5.0, 1.0) * 0.4
          + (1.0 - least((CASE WHEN length(text) = 0 THEN 0.0
              ELSE CAST(len(regexp_extract_all(text,
                '[.,;:!?''"()\\[\\]{}-]')) AS DOUBLE) / length(text) END)
              * 4.0, 1.0)) * 0.1, 6) AS quality
      FROM documents)
      SELECT doc_id, source, lang FROM scored
      QUALIFY sum(toks) OVER (ORDER BY quality DESC, doc_id
        ROWS UNBOUNDED PRECEDING) <= 20000
      ORDER BY doc_id""")
  )

  private val q44_curation_pipeline = Q(
    "q44_curation_pipeline",
    // The realistic composition: language filter -> quality floor ->
    // exact dedup (keep min doc_id per content) -> per-source counts.
    // Each stage is one of the library's operators; the oracle
    // recomputes the whole pipeline in SQL.
    (s, dir) => {
      val docs = table(s, dir, "documents")
      val kept = docs
        .filter(TextFunctions.langId(col("text")) === col("lang"))
        .filter(TextFunctions.qualityScore(col("text")) >= 0.5)
      val deduped = Dedup.exactDedup(kept, "doc_id", "text")
      deduped.groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(TextFunctions.tokenCount(col("text"))).as("n_tokens"))
        .orderBy("source")
    },
    Some {
      val markers = TextFunctions.LangMarkers.map { case (l, ms) =>
        l -> ms.map(m => s"'$m'").mkString("[", ", ", "]")
      }
      val scores = markers.map { case (l, arr) =>
        s"len(list_intersect(list_distinct($W), $arr)) AS s_$l"
      }.mkString(", ")
      val best = markers.map { case (l, _) => s"s_$l" }.mkString("greatest(", ", ", ")")
      val pick = markers.map { case (l, _) =>
        s"WHEN s_$l = $best THEN '$l'"
      }.mkString(" ")
      s"""WITH scored AS (
        SELECT doc_id, text, lang, source, $scores,
          CASE WHEN length(text) = 0 THEN 0.0
            ELSE CAST(len(regexp_extract_all(text,
              '[.,;:!?''"()\\[\\]{}-]')) AS DOUBLE) / length(text) END AS pr,
          CASE WHEN len($W) = 0 THEN 0.0
            ELSE CAST(len(list_filter($W, x -> list_contains($stopList, x)))
              AS DOUBLE) / len($W) END AS sr
        FROM documents),
      pred AS (
        SELECT *, CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]')
            THEN 'zh' WHEN $best = 0 THEN 'und' $pick ELSE 'und' END AS lang_pred,
          round(least(CAST(length(text) AS DOUBLE) / 400.0, 1.0) * 0.5
            + least(sr * 5.0, 1.0) * 0.4
            + (1.0 - least(pr * 4.0, 1.0)) * 0.1, 6) AS quality
        FROM scored),
      kept AS (SELECT * FROM pred WHERE lang_pred = lang AND quality >= 0.5),
      deduped AS (SELECT * FROM kept QUALIFY
        row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1)
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(len($W)) AS BIGINT) AS n_tokens
      FROM deduped GROUP BY source ORDER BY source"""
    }
  )

  private val q45_source_audit = Q(
    "q45_source_audit",
    // Pretraining-data audit: per-source token/char/quality profile.
    (s, dir) =>
      table(s, dir, "documents")
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(TextFunctions.tokenCount(col("text"))).as("n_tokens"),
          sum(col("n_chars")).as("n_chars"),
          min(TextFunctions.qualityScore(col("text"))).as("min_quality"),
          max(TextFunctions.qualityScore(col("text"))).as("max_quality"))
        .orderBy("source"),
    Some(s"""WITH q AS (SELECT source, text, n_chars,
        round(least(CAST(length(text) AS DOUBLE) / 400.0, 1.0) * 0.5
          + least((CASE WHEN len($W) = 0 THEN 0.0
              ELSE CAST(len(list_filter($W, x -> list_contains($stopList, x)))
                AS DOUBLE) / len($W) END) * 5.0, 1.0) * 0.4
          + (1.0 - least((CASE WHEN length(text) = 0 THEN 0.0
              ELSE CAST(len(regexp_extract_all(text,
                '[.,;:!?''"()\\[\\]{}-]')) AS DOUBLE) / length(text) END)
              * 4.0, 1.0)) * 0.1, 6) AS quality
      FROM documents)
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(len($W)) AS BIGINT) AS n_tokens,
        CAST(sum(n_chars) AS BIGINT) AS n_chars,
        min(quality) AS min_quality, max(quality) AS max_quality
      FROM q GROUP BY source ORDER BY source""")
  )

  private val q124_interleave_order = Q(
    "q124_interleave_order",
    // Balanced mixture order: every source spread proportionally
    // through the epoch via the stride trick — frac = (2r-1)/(2n)
    // over per-source md5-hash-order ranks (one IEEE division,
    // bitwise cross-engine). Ranks via the capPerGroup md5-bucket
    // prefix-sum decomposition: no per-source global window, no
    // driver state.
    (s, dir) =>
      graft.operators.Sampling.interleaveOrder(
        table(s, dir, "documents").select("doc_id", "source"),
        "doc_id", "source")
        .orderBy("doc_id"),
    Some("""WITH r AS (SELECT doc_id, source,
        row_number() OVER (PARTITION BY source
          ORDER BY md5('graft|' || CAST(doc_id AS VARCHAR)), doc_id) AS rank,
        count(*) OVER (PARTITION BY source) AS n
        FROM documents)
      SELECT doc_id, source, CAST(rank AS BIGINT) AS rank,
        CAST(n AS BIGINT) AS n,
        (2.0 * rank - 1.0) / (2.0 * n) AS frac
      FROM r ORDER BY doc_id""")
  )

  private val q146_exact_k_sample = Q(
    "q146_exact_k_sample",
    // Exactly-k reproducible eval sample: top-100 documents by
    // (md5('graft|id'), id) — an exact count (a Bernoulli fraction
    // is binomial), a total order, and an md5 any engine reproduces.
    // One TakeOrderedAndProject: per-partition heaps, k rows to the
    // merge, no global sort.
    (s, dir) =>
      graft.operators.Sampling.exactK(
        table(s, dir, "documents").select("doc_id", "source", "lang"),
        "doc_id", k = 100)
        .orderBy("doc_id"),
    Some("""SELECT doc_id, source, lang FROM (
        SELECT doc_id, source, lang,
          row_number() OVER (ORDER BY
            md5('graft|' || CAST(doc_id AS VARCHAR)), doc_id) AS rk
        FROM documents) WHERE rk <= 100 ORDER BY doc_id""")
  )

  private val q154_winsorize = Q(
    "q154_winsorize",
    // Robust-stats clipping: per-source token counts winsorized to
    // the exact [p5, p95] disc quantiles — rank arithmetic over
    // exact counts (group-partitioned cumsum, groups-sized broadcast
    // back), integer clip, no interpolation convention to disagree
    // on.
    (s, dir) =>
      graft.operators.Features.winsorize(
        table(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            TextFunctions.tokenCount(col("text")).as("toks")),
        "source", "toks", pLoPct = 5, pHiPct = 95)
        .orderBy("doc_id"),
    Some(s"""WITH b AS (SELECT doc_id, source,
        CAST(len($W) AS BIGINT) AS toks FROM documents),
      c AS (SELECT source, toks, CAST(count(*) AS BIGINT) AS cnt
        FROM b GROUP BY 1, 2),
      sc AS (SELECT source, toks, CAST(sum(cnt) OVER
          (PARTITION BY source ORDER BY toks
           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM c),
      n AS (SELECT source, CAST(count(*) AS BIGINT) AS n
        FROM b GROUP BY 1),
      t AS (SELECT source, greatest(1, (5 * n + 99) // 100) AS rlo,
        greatest(1, (95 * n + 99) // 100) AS rhi FROM n),
      lo AS (SELECT sc.source, CAST(min(sc.toks) AS BIGINT) AS lo
        FROM sc JOIN t USING (source) WHERE sc.cum >= t.rlo
        GROUP BY 1),
      hi AS (SELECT sc.source, CAST(min(sc.toks) AS BIGINT) AS hi
        FROM sc JOIN t USING (source) WHERE sc.cum >= t.rhi
        GROUP BY 1)
      SELECT b.source, b.doc_id, b.toks, lo.lo, hi.hi,
        least(greatest(b.toks, lo.lo), hi.hi) AS clipped
      FROM b JOIN lo USING (source) JOIN hi USING (source)
      ORDER BY b.doc_id""")
  )

  private val q156_nucleus_coverage = Q(
    "q156_nucleus_coverage",
    // Mixture design: per language, the smallest set of sources
    // covering 80% of token mass — (mass desc, source) nucleus rule
    // in pure integer arithmetic, items-sized partitioned cumsum.
    (s, dir) =>
      graft.operators.Curation.topPCoverage(
        table(s, dir, "documents")
          .select(col("lang"), col("source"),
            TextFunctions.tokenCount(col("text")).as("toks")),
        "lang", "source", "toks", pPct = 80)
        .orderBy("lang", "source"),
    Some(s"""WITH b AS (SELECT lang, source,
        CAST(len($W) AS BIGINT) AS toks FROM documents),
      m AS (SELECT lang, source, CAST(sum(toks) AS BIGINT) AS mass
        FROM b GROUP BY 1, 2),
      t AS (SELECT lang, (80 * CAST(sum(mass) AS BIGINT) + 99) // 100
          AS thr FROM m GROUP BY 1),
      c AS (SELECT lang, source, mass, CAST(sum(mass) OVER
          (PARTITION BY lang ORDER BY mass DESC, source
           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_mass FROM m)
      SELECT c.lang, c.source, c.mass, c.cum_mass,
        (c.cum_mass - c.mass) < t.thr AS in_nucleus
      FROM c JOIN t USING (lang) ORDER BY lang, source""")
  )

  private val q160_kfold = Q(
    "q160_kfold",
    // Stratified 5-fold assignment over documents by source: the
    // salted md5 content hash is the shuffle key (cross-engine by
    // construction), folds balance within each stratum to ±1, one
    // stratum-partitioned window.
    (s, dir) =>
      graft.operators.Sampling.kFoldAssign(
        table(s, dir, "documents").select(col("doc_id"), col("source")),
        Seq("source"), "doc_id", k = 5)
        .orderBy("doc_id"),
    Some("""SELECT doc_id, source,
        (CAST(row_number() OVER (PARTITION BY source
          ORDER BY md5('graft:' || CAST(doc_id AS VARCHAR)), doc_id)
          AS BIGINT) - 1) % 5 AS fold
      FROM documents ORDER BY doc_id""")
  )

  private val q164_mixture_diagnostics = Q(
    "q164_mixture_diagnostics",
    // Mixture concentration: per language, Kish effective sample
    // size over source token masses, evenness ratio, and dominant
    // share — exact integer moments, fixed IEEE tail.
    (s, dir) =>
      graft.operators.Profile.mixtureDiagnostics(
        table(s, dir, "documents")
          .select(col("lang"), col("source"),
            TextFunctions.tokenCount(col("text")).as("toks")),
        "lang", "source", "toks")
        .orderBy("lang"),
    Some(s"""WITH b AS (SELECT lang, source,
        CAST(len($W) AS BIGINT) AS toks FROM documents),
      m AS (SELECT lang, source, CAST(sum(toks) AS BIGINT) AS mm
        FROM b GROUP BY 1, 2),
      a AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_items,
        CAST(sum(mm) AS BIGINT) AS total_mass,
        CAST(sum(mm * mm) AS BIGINT) AS ssq,
        CAST(max(mm) AS BIGINT) AS mx FROM m GROUP BY 1)
      SELECT lang, n_items, total_mass,
        CAST(mx AS DOUBLE) / CAST(total_mass AS DOUBLE) AS max_share,
        CAST(total_mass AS DOUBLE) * CAST(total_mass AS DOUBLE)
          / CAST(ssq AS DOUBLE) AS ess,
        (CAST(total_mass AS DOUBLE) * CAST(total_mass AS DOUBLE)
          / CAST(ssq AS DOUBLE)) / CAST(n_items AS DOUBLE) AS ess_ratio
      FROM a ORDER BY lang""")
  )

  private val q173_temperature_mix = Q(
    "q173_temperature_mix",
    // sqrt-temperature mixture (α = 1/2, the one power IEEE rounds
    // identically everywhere): per-source masses → √mass weights →
    // shares off a group-sorted sequential normalizer → floor row
    // budget at 10k.
    (s, dir) =>
      graft.operators.Sampling.temperatureWeights(
        table(s, dir, "documents")
          .select(col("source"),
            TextFunctions.tokenCount(col("text")).as("toks")),
        "source", "toks", budget = 10000L)
        .orderBy("source"),
    Some(s"""WITH b AS (SELECT source, CAST(len($W) AS BIGINT) AS toks
        FROM documents),
      m AS (SELECT source, CAST(sum(toks) AS BIGINT) AS mass
        FROM b GROUP BY 1),
      w AS (SELECT source, mass, sqrt(CAST(mass AS DOUBLE)) AS w
        FROM m),
      t AS (SELECT list_aggregate(list(w ORDER BY source), 'sum')
        AS tot FROM w)
      SELECT w.source, w.mass, w.w, w.w / t.tot AS share,
        CAST(floor(w.w / t.tot * CAST(10000 AS DOUBLE)) AS BIGINT)
          AS n_target
      FROM w, t ORDER BY w.source""")
  )

  private val q131_filter_attrition = Q(
    "q131_filter_attrition",
    // Staged-filter attrition: where did the corpus go? Four drop
    // rules in pipeline order (short, wrong-lang, long-words,
    // too-long), each document charged to the FIRST rule that fires
    // (19/143/3/61 eliminated at sf0.01, 274 kept). One aggregation
    // pass — the whole report is sum(case) columns on a single row;
    // no intermediate filtered corpus, no window. Predicates stay on
    // integer counts so the cross-engine compare is exact; the one
    // double (pct_of_input) is a single IEEE division.
    (s, dir) =>
      graft.operators.Curation.filterAttrition(
        table(s, dir, "documents"),
        Seq(
          "short" -> (TextFunctions.tokenCount(col("text")) < 15),
          "wrong_lang" -> !col("lang").isin("en", "de", "fr"),
          "long_words" ->
            (col("n_chars") > lit(6L) * TextFunctions.tokenCount(col("text"))),
          "too_long" -> (col("n_chars") > 450)))
        .orderBy("stage_idx"),
    Some(s"""WITH ff AS (SELECT CASE
        WHEN len($W) < 15 THEN 0
        WHEN lang NOT IN ('en','de','fr') THEN 1
        WHEN n_chars > 6*len($W) THEN 2
        WHEN n_chars > 450 THEN 3
        ELSE 4 END AS ff FROM documents),
      c AS (SELECT CAST(count(*) AS BIGINT) AS total,
        CAST(sum(CASE WHEN ff=0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
        CAST(sum(CASE WHEN ff=1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        CAST(sum(CASE WHEN ff=2 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
        CAST(sum(CASE WHEN ff=3 THEN 1 ELSE 0 END) AS BIGINT) AS c3
        FROM ff)
      SELECT CAST(0 AS BIGINT) AS stage_idx, 'input' AS stage,
        CAST(0 AS BIGINT) AS eliminated, total AS remaining,
        0.0 AS pct_of_input FROM c
      UNION ALL SELECT 1, 'short', c0, total - c0,
        CAST(c0 AS DOUBLE) / total FROM c
      UNION ALL SELECT 2, 'wrong_lang', c1, total - c0 - c1,
        CAST(c1 AS DOUBLE) / total FROM c
      UNION ALL SELECT 3, 'long_words', c2, total - c0 - c1 - c2,
        CAST(c2 AS DOUBLE) / total FROM c
      UNION ALL SELECT 4, 'too_long', c3, total - c0 - c1 - c2 - c3,
        CAST(c3 AS DOUBLE) / total FROM c
      ORDER BY stage_idx""")
  )

  private val q142_mixture_plan = Q(
    "q142_mixture_plan",
    // The mixture designer's bill before materializing: q109's exact
    // integer math (target = floor(budget*w/sumW), epochs = integer
    // div) as a per-source report — src0 upsamples ~3.5x, src1 ~1.8x,
    // src2/src3 run fractional epochs, and a source named in the
    // weights but absent from the corpus (srcX) reports zero current
    // tokens and a null rate instead of a log line.
    (s, dir) =>
      graft.operators.Sampling.mixturePlan(
        table(s, dir, "documents"), "source", "text",
        weights = Map(
          "src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.125,
          "src3" -> 0.125, "srcX" -> 0.0),
        budgetTokens = 10000L)
        .orderBy("source"),
    Some(s"""WITH cur AS (SELECT source,
        CAST(sum(len($W)) AS BIGINT) AS current_tokens
        FROM documents WHERE source IN ('src0','src1','src2','src3')
        GROUP BY source),
      tgt AS (SELECT * FROM (VALUES
        ('src0', CAST(floor(10000 * (0.5 / 1.0)) AS BIGINT)),
        ('src1', CAST(floor(10000 * (0.25 / 1.0)) AS BIGINT)),
        ('src2', CAST(floor(10000 * (0.125 / 1.0)) AS BIGINT)),
        ('src3', CAST(floor(10000 * (0.125 / 1.0)) AS BIGINT)),
        ('srcX', CAST(floor(10000 * (0.0 / 1.0)) AS BIGINT)))
        AS t(source, target_tokens))
      SELECT tgt.source, tgt.target_tokens,
        CAST(coalesce(cur.current_tokens, 0) AS BIGINT) AS current_tokens,
        CASE WHEN coalesce(cur.current_tokens, 0) > 0
          THEN tgt.target_tokens // cur.current_tokens END AS epochs,
        CASE WHEN coalesce(cur.current_tokens, 0) > 0
          THEN tgt.target_tokens
            - (tgt.target_tokens // cur.current_tokens)
              * cur.current_tokens END AS remainder_tokens,
        CASE WHEN coalesce(cur.current_tokens, 0) > 0
          THEN CAST(tgt.target_tokens AS DOUBLE) / cur.current_tokens
          END AS rate
      FROM tgt LEFT JOIN cur USING (source) ORDER BY tgt.source""")
  )

  private val q109_epoch_mixture = Q(
    "q109_epoch_mixture",
    // Mixture epoching: weights {src0 .5, src1 .25, src2/src3 .125}
    // over a 10k-token budget make src0 repeat 3 full epochs + a
    // fractional one, src1 one epoch + fraction, src2/src3 pure
    // subsamples — the three regimes of a real pretraining mix in one
    // fixture. Binary-exact weights keep floor(budget·w/Σw) identical
    // IEEE math on both engines; everything downstream is integer.
    // The oracle spells the fractional cut as ONE per-source
    // cumulative window; the operator's bucketed two-phase must be
    // bitwise that by prefix-sum decomposition.
    (s, dir) =>
      graft.operators.Sampling.epochMixture(
        table(s, dir, "documents"), "source", "doc_id", "text",
        weights = Map(
          "src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.125, "src3" -> 0.125),
        budgetTokens = 10000L)
        .orderBy("doc_id", "epoch"),
    Some(s"""WITH base AS (SELECT doc_id, source,
        CAST(len($W) AS BIGINT) AS toks,
        md5('graft|' || CAST(doc_id AS VARCHAR)) AS h
        FROM documents WHERE source IN ('src0','src1','src2','src3')),
      tot AS (SELECT source, CAST(sum(toks) AS BIGINT) AS t
        FROM base GROUP BY source HAVING sum(toks) > 0),
      tgt AS (SELECT source, t, CAST(floor(10000 * (CASE source
          WHEN 'src0' THEN 0.5 WHEN 'src1' THEN 0.25
          ELSE 0.125 END / 1.0)) AS BIGINT) AS target FROM tot),
      eg AS (SELECT source, t, target, target // t AS e,
        target - (target // t) * t AS r FROM tgt),
      cum AS (SELECT b.doc_id, b.source, b.toks,
        CAST(sum(b.toks) OVER (PARTITION BY b.source ORDER BY b.h, b.doc_id
          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c
        FROM base b JOIN eg USING (source)),
      reps AS (SELECT cum.doc_id, cum.source,
        CAST(e + CASE WHEN c <= r THEN 1 ELSE 0 END AS BIGINT) AS reps
        FROM cum JOIN eg USING (source))
      SELECT doc_id, source, CAST(unnest(range(reps)) AS BIGINT) AS epoch
      FROM reps WHERE reps > 0 ORDER BY doc_id, epoch""")
  )

  private val q116_domain_cap = Q(
    "q116_domain_cap",
    // Per-source row cap (the Common-Crawl domain cap) at 20 docs per
    // source in md5 hash order. The operator's bucketed spelling —
    // distributed (source, md5-prefix-bucket) counts, ≤256-row offset
    // windows, whole-bucket prune before any sort, NO driver state —
    // must be bitwise this oracle's naive per-source global window.
    (s, dir) =>
      graft.operators.Curation.capPerGroup(
        table(s, dir, "documents").select("doc_id", "source"),
        "doc_id", "source", cap = 20)
        .orderBy("doc_id"),
    Some("""WITH r AS (SELECT doc_id, source,
        row_number() OVER (PARTITION BY source
          ORDER BY md5('graft|' || CAST(doc_id AS VARCHAR)), doc_id) AS rk
        FROM documents)
      SELECT doc_id, source FROM r WHERE rk <= 20 ORDER BY doc_id""")
  )

  private val q74_pack_sequences = Q(
    "q74_pack_sequences",
    // Sequence packing: per-source token streams (docs concatenated in
    // doc_id order) chunked at a 2048-token context length; each doc
    // reports its start offset and chunk span — pure integer window
    // math, recomputed exactly by the oracle.
    (s, dir) => {
      val docs = table(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          TextFunctions.tokenCount(col("text")).as("toks"))
      graft.operators.Pack.sequenceOffsets(
        docs, "doc_id", "source", "doc_id", "toks", seqLen = 2048L)
        .select(col("id").as("doc_id"), col("shard").as("source"),
          col("toks"), col("start_offset"),
          col("first_chunk"), col("last_chunk"))
        .orderBy("doc_id")
    },
    Some(s"""WITH t AS (SELECT doc_id, source,
        CAST(len($W) AS BIGINT) AS toks FROM documents),
      o AS (SELECT doc_id, source, toks,
        CAST(sum(toks) OVER (PARTITION BY source ORDER BY doc_id
          ROWS UNBOUNDED PRECEDING) - toks AS BIGINT) AS start_offset FROM t)
      SELECT doc_id, source, toks, start_offset,
        CAST(start_offset // 2048 AS BIGINT) AS first_chunk,
        CAST(CASE WHEN toks = 0 THEN start_offset // 2048
          ELSE (start_offset + toks - 1) // 2048 END AS BIGINT) AS last_chunk
      FROM o ORDER BY doc_id""")
  )

  private val q275_pack_delete_radius = Q(
    "q275_pack_delete_radius",
    // Delete propagation through the PACKED artifacts (r10 verdict
    // #3 — the layer below q271's clusters and q274's indexes): the
    // q74 sequence-packing manifest names each doc's token span in
    // its source shard's 2048-token chunk stream; a tombstone batch
    // (doc_id % 97 — q271/q274's) invalidates every chunk holding a
    // deleted doc's tokens, and Pack.deleteBlastRadius reports, per
    // invalidated (source, chunk): doc/deleted-doc counts and the
    // deleted vs SURVIVING token split — surviving_tokens is the
    // re-pack cost, 0 marks a chunk that simply vanishes (the
    // empty-chunk edge, spec-pinned). Exact integer accounting end
    // to end (q74's oracle style): the oracle replays the cumsum
    // offsets, the chunk-span explode, and the min/max overlap
    // arithmetic in SQL.
    (s, dir) => {
      val docs = table(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          TextFunctions.tokenCount(col("text")).as("toks"))
      val manifest = graft.operators.Pack.sequenceOffsets(
        docs, "doc_id", "source", "doc_id", "toks", seqLen = 2048L)
      val tomb = docs.select(col("doc_id"))
        .filter(col("doc_id") % 97 === 0)
      graft.operators.Pack.deleteBlastRadius(manifest, tomb, 2048L)
        .select(col("shard").as("source"), col("chunk_id"),
          col("n_docs"), col("n_deleted"), col("deleted_tokens"),
          col("surviving_tokens"))
        .orderBy("source", "chunk_id")
    },
    Some(s"""WITH t AS (SELECT doc_id, source,
        CAST(len($W) AS BIGINT) AS toks FROM documents),
      o AS (SELECT doc_id, source, toks,
        CAST(sum(toks) OVER (PARTITION BY source ORDER BY doc_id
          ROWS UNBOUNDED PRECEDING) - toks AS BIGINT) AS s FROM t),
      x AS (SELECT source, CAST(u.c AS BIGINT) AS chunk_id, doc_id,
          CASE WHEN doc_id % 97 = 0 THEN 1 ELSE 0 END AS del,
          least(s + toks, (CAST(u.c AS BIGINT) + 1) * 2048)
            - greatest(s, CAST(u.c AS BIGINT) * 2048) AS ov
        FROM o CROSS JOIN UNNEST(range(s // 2048,
          (s + toks - 1) // 2048 + 1)) AS u(c)
        WHERE toks > 0),
      inv AS (SELECT DISTINCT source, chunk_id FROM x WHERE del = 1)
      SELECT x.source, x.chunk_id,
        CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(del) AS BIGINT) AS n_deleted,
        CAST(sum(CASE WHEN del = 1 THEN ov ELSE 0 END) AS BIGINT)
          AS deleted_tokens,
        CAST(sum(CASE WHEN del = 0 THEN ov ELSE 0 END) AS BIGINT)
          AS surviving_tokens
      FROM x JOIN inv ON inv.source = x.source
        AND inv.chunk_id = x.chunk_id
      GROUP BY x.source, x.chunk_id
      ORDER BY x.source, x.chunk_id""")
  )

  private val q75_quality_quantile = Q(
    "q75_quality_quantile",
    // FineWeb-style per-source quality cut: keep the best 25% of each
    // source by quality score (rank-based — integer math end to end,
    // ties broken by doc_id so the kept set is a deterministic
    // total-order prefix).
    (s, dir) =>
      graft.operators.Curation.topQuantilePerGroup(
        table(s, dir, "documents"), "doc_id", "source",
        TextFunctions.qualityScore(col("text")), frac = 0.25)
        .select("doc_id", "source", "lang")
        .orderBy("doc_id"),
    Some(s"""WITH q AS (SELECT doc_id, source, lang,
        round(least(CAST(length(text) AS DOUBLE) / 400.0, 1.0) * 0.5
          + least((CASE WHEN len($W) = 0 THEN 0.0
              ELSE CAST(len(list_filter($W, x -> list_contains($stopList, x)))
                AS DOUBLE) / len($W) END) * 5.0, 1.0) * 0.4
          + (1.0 - least((CASE WHEN length(text) = 0 THEN 0.0
              ELSE CAST(len(regexp_extract_all(text,
                '[.,;:!?''"()\\[\\]{}-]')) AS DOUBLE) / length(text) END)
              * 4.0, 1.0)) * 0.1, 6) AS quality
      FROM documents),
      r AS (SELECT doc_id, source, lang,
        row_number() OVER (PARTITION BY source
          ORDER BY quality DESC, doc_id) AS rk,
        count(*) OVER (PARTITION BY source) AS n FROM q)
      SELECT doc_id, source, lang FROM r
      WHERE rk <= ceil(0.25 * n) ORDER BY doc_id""")
  )

  private val q83_chunk_overlap = Q(
    "q83_chunk_overlap",
    // Overlapping-window chunking (retrieval/embedding indexing): every
    // doc sliced into 32-token windows at stride 8 — 24-token overlap,
    // every token covered, only the last chunk short. Pure per-row
    // compute (one kernel call + posexplode, no shuffle); the oracle
    // recomputes every window's exact start/length/text with integer
    // math and list slicing.
    (s, dir) =>
      graft.operators.Pack.chunkWithOverlap(
        table(s, dir, "documents"), "doc_id", "text",
        chunkSize = 32, stride = 8)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id", "chunk_id"),
    Some(s"""WITH toks AS (SELECT doc_id, $W AS w FROM documents),
      n AS (SELECT doc_id, w, len(w) AS nt,
          CASE WHEN len(w) = 0 THEN 0
               WHEN len(w) <= 32 THEN 1
               ELSE 1 + (len(w) - 32 + 7) // 8 END AS nchunks
        FROM toks),
      c AS (SELECT doc_id, w, nt, CAST(u.i AS BIGINT) AS chunk_id
        FROM n CROSS JOIN unnest(range(0, nchunks)) AS u(i))
      SELECT doc_id, chunk_id,
        chunk_id * 8 + 1 AS start_tok,
        least(32, nt - chunk_id * 8) AS n_tokens,
        array_to_string(w[chunk_id * 8 + 1 :
          least(chunk_id * 8 + 32, nt)], ' ') AS chunk_text
      FROM c ORDER BY doc_id, chunk_id""")
  )

  private val q84_weighted_sample = Q(
    "q84_weighted_sample",
    // A-ES weighted sampling without replacement: 100 docs, odds
    // proportional to n_chars. u is exact cross-engine integer/IEEE
    // math; the one libm step (ln) is covered by the operator's
    // in-job boundary-gap gate, so the oracle recomputes the same
    // priorities with ITS ln and must select the identical set.
    (s, dir) =>
      graft.operators.Sampling.weightedSample(
        table(s, dir, "documents"), col("doc_id"), col("n_chars"), k = 100)
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id"),
    Some("""WITH p AS (SELECT doc_id, source, n_chars,
        ln((CAST(md5_number_lower(CAST(doc_id AS VARCHAR) || ':graft')
             >> 11 AS DOUBLE) + 0.5) / 9007199254740992.0)
          / CAST(n_chars AS DOUBLE) AS pri
        FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
      t AS (SELECT doc_id, source, n_chars FROM p ORDER BY pri DESC
        LIMIT 100)
      SELECT doc_id, source, n_chars FROM t ORDER BY doc_id""")
  )

  private val q81_mixture_sample = Q(
    "q81_mixture_sample",
    // Exact-count pretraining-mix cut: 50/30/20 across three sources,
    // 60 rows total. src0's floor(0.5·60)=30 exceeds its sf0.01
    // availability (25), exercising the capped-shortfall path in both
    // engines (the oracle's least(target, n)). The md5 hex rank order
    // is engine-identical, so the EXACT kept set is recomputed by
    // DuckDB — not just the counts.
    (s, dir) =>
      graft.operators.Sampling.mixtureSample(
        table(s, dir, "documents"), "source", col("doc_id"),
        Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2), total = 60L)
        .select("doc_id", "source", "lang")
        .orderBy("doc_id"),
    Some("""WITH r AS (SELECT doc_id, source, lang,
        row_number() OVER (PARTITION BY source
          ORDER BY md5(CAST(doc_id AS VARCHAR) || ':graft'), doc_id) AS rk,
        count(*) OVER (PARTITION BY source) AS n
      FROM documents WHERE source IN ('src0', 'src1', 'src2'))
      SELECT doc_id, source, lang FROM r
      WHERE rk <= least(CASE source WHEN 'src0' THEN 30
        WHEN 'src1' THEN 18 WHEN 'src2' THEN 12 END, n)
      ORDER BY doc_id""")
  )

  private val q80_percentiles_tokens = Q(
    "q80_percentiles_tokens",
    // Gates.rankErrorGate reused on a second sketch workload — the
    // per-source token-length distribution every curation run reads
    // (sequence-length budgeting, outlier cuts). Same contract as
    // q77: the GK sketch is rank-error-gated in-job, the exact
    // interpolated percentiles are emitted for the bitwise oracle.
    (s, dir) => {
      val d = table(s, dir, "documents")
        .select(col("source"),
          TextFunctions.tokenCount(col("text")).cast("double").as("toks"))
      graft.operators.Gates.rankErrorGate(
        d, "source", "toks", Seq(0.5, 0.99), accuracy = 500)
      d.groupBy("source")
        .agg(
          expr("percentile(toks, 0.5)").as("p50_toks"),
          expr("percentile(toks, 0.99)").as("p99_toks"))
        .orderBy("source")
    },
    Some(s"""WITH t AS (SELECT source,
        CAST(len($W) AS DOUBLE) AS toks FROM documents)
      SELECT source, quantile_cont(toks, 0.5) AS p50_toks,
        quantile_cont(toks, 0.99) AS p99_toks
      FROM t GROUP BY source ORDER BY source""")
  )

  private val q197_neyman_allocation = Q(
    "q197_neyman_allocation",
    // Neyman-optimal stratified sampling allocation across
    // returnflag|linestatus strata at a 1000-row budget: exact
    // integer moments per stratum (one distributed pass), one fixed
    // IEEE expression per emitted double, stratum-ordered normalizer
    // fold, largest-remainder integer rounding — sum(alloc_raw) is
    // EXACTLY the budget, and DuckDB reproduces every bit.
    (s, dir) =>
      graft.operators.Sampling.neymanAllocation(
        table(s, dir, "lineitem").withColumn("stratum",
          concat_ws("|", col("l_returnflag"), col("l_linestatus"))),
        "stratum", "l_quantity", total = 1000L)
        .orderBy("stratum"),
    Some("""WITH m AS (SELECT l_returnflag || '|' || l_linestatus
        AS stratum, CAST(count(*) AS BIGINT) AS n_rows,
        CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS s1,
        CAST(sum(CAST(l_quantity AS DECIMAL(38,0))
          * CAST(l_quantity AS DECIMAL(38,0))) AS DOUBLE)
          AS s2
        FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY 1),
      v AS (SELECT stratum, n_rows, CASE WHEN n_rows > 1 THEN
          sqrt(greatest((CAST(n_rows AS DOUBLE) * s2 - s1 * s1)
            / (CAST(n_rows AS DOUBLE) * CAST(n_rows - 1 AS DOUBLE)),
            0.0)) ELSE 0.0 END AS sd FROM m),
      w AS (SELECT stratum, n_rows, sd,
          CAST(n_rows AS DOUBLE) * sd AS ns FROM v),
      t AS (SELECT list_aggregate(list(ns ORDER BY stratum), 'sum')
          AS tot FROM w),
      f AS (SELECT w.stratum, w.n_rows, w.sd, t.tot,
          CASE WHEN t.tot > 0 THEN w.ns / t.tot ELSE 0.0 END AS share,
          CASE WHEN t.tot > 0 THEN 1000.0 * (w.ns / t.tot)
            ELSE 0.0 END AS target
        FROM w CROSS JOIN t),
      b AS (SELECT *, CAST(floor(target) AS BIGINT) AS base,
          row_number() OVER (ORDER BY target - floor(target) DESC,
            stratum) AS rk FROM f),
      lo AS (SELECT 1000 - sum(base) AS leftover FROM b)
      SELECT b.stratum, b.n_rows, b.sd, b.share,
        CAST(CASE WHEN b.tot > 0 THEN b.base
          + (CASE WHEN b.rk <= lo.leftover THEN 1 ELSE 0 END)
          ELSE 0 END AS BIGINT) AS alloc_raw,
        CAST(least(CASE WHEN b.tot > 0 THEN b.base
          + (CASE WHEN b.rk <= lo.leftover THEN 1 ELSE 0 END)
          ELSE 0 END, b.n_rows) AS BIGINT) AS alloc
      FROM b CROSS JOIN lo ORDER BY b.stratum""")
  )

  private val q210_rendezvous_shard = Q(
    "q210_rendezvous_shard",
    // Rendezvous-hash re-sharding 10 -> 11: each doc's shard is the
    // argmax of md5(id:shard:salt) over shards, so growing the ring
    // moves ONLY docs whose new shard wins — ~1/11 of the corpus,
    // where pmod re-deals nearly all. Codegen md5 + array HOFs; the
    // oracle replays both assignments and the moved flag with
    // arg_max over the same hex weights.
    (s, dir) => {
      val docs = table(s, dir, "documents").select(col("doc_id"))
      val s10 = graft.operators.Sampling.rendezvousShard(
        docs, "doc_id", 10, outCol = "shard10")
      graft.operators.Sampling.rendezvousShard(
        s10, "doc_id", 11, outCol = "shard11")
        .withColumn("moved", col("shard10") =!= col("shard11"))
        .orderBy("doc_id")
    },
    Some("""WITH d AS (SELECT doc_id FROM documents),
      w AS (SELECT doc_id, u.s AS s,
          md5(CAST(doc_id AS VARCHAR) || ':' || CAST(u.s AS VARCHAR)
            || ':graft') AS h
        FROM d CROSS JOIN unnest(range(0, 11)) AS u(s)),
      a10 AS (SELECT doc_id, CAST(arg_max(s, h) AS BIGINT) AS shard10
        FROM w WHERE s < 10 GROUP BY 1),
      a11 AS (SELECT doc_id, CAST(arg_max(s, h) AS BIGINT) AS shard11
        FROM w GROUP BY 1)
      SELECT d.doc_id, a10.shard10, a11.shard11,
        a10.shard10 <> a11.shard11 AS moved
      FROM d JOIN a10 USING (doc_id) JOIN a11 USING (doc_id)
      ORDER BY d.doc_id""")
  )

  private val q218_filter_overlap = Q(
    "q218_filter_overlap",
    // Quality-policy Venn planning: three filters (short docs,
    // repetitive docs, low-stopword docs) evaluated as one
    // conditional-aggregation pass, reported as the FULL 2^3 mask
    // grid — zero cells included, because "no doc trips exactly
    // {short, lowstop}" is policy signal. The oracle rebuilds every
    // flag (exact integer/rational comparisons) and every cell.
    (s, dir) =>
      graft.operators.Curation.filterOverlap(
        table(s, dir, "documents"), Seq(
          "short" -> (TextFunctions.tokenCount(col("text")) < 60),
          "repetitive" ->
            (TextFunctions.repetitionRatio(col("text")) > 0.5),
          "lowstop" ->
            (TextFunctions.stopwordRatio(col("text")) < 0.06)))
        .orderBy("mask"),
    Some(s"""WITH w AS (SELECT doc_id, $W AS ws FROM documents),
      f AS (SELECT doc_id,
          (CASE WHEN len(ws) < 60 THEN 1 ELSE 0 END)
          + (CASE WHEN len(ws) > 0 AND 1.0 -
              CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws) > 0.5
              THEN 2 ELSE 0 END)
          + (CASE WHEN (CASE WHEN len(ws) = 0 THEN 0.0
              ELSE CAST(len(list_filter(ws,
                x -> list_contains($stopList, x))) AS DOUBLE)
                / len(ws) END) < 0.06 THEN 4 ELSE 0 END) AS mask
        FROM w),
      c AS (SELECT mask, CAST(count(*) AS BIGINT) AS n_docs FROM f
        GROUP BY 1),
      t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total FROM c),
      g AS (SELECT u.mask AS mask FROM unnest(range(0, 8)) AS u(mask))
      SELECT CAST(g.mask AS BIGINT) AS mask,
        concat_ws(',',
          CASE WHEN g.mask & 1 <> 0 THEN 'short' END,
          CASE WHEN g.mask & 2 <> 0 THEN 'repetitive' END,
          CASE WHEN g.mask & 4 <> 0 THEN 'lowstop' END) AS filters,
        COALESCE(c.n_docs, 0) AS n_docs,
        round(CAST(COALESCE(c.n_docs, 0) AS DOUBLE)
          / CAST(t.total AS DOUBLE), 6) AS share
      FROM g LEFT JOIN c ON c.mask = g.mask CROSS JOIN t
      ORDER BY g.mask""")
  )


  private val q225_bootstrap_ci = Q(
    "q225_bootstrap_ci",
    // Poisson-bootstrap 95% CI for the per-event-type mean value:
    // every row draws 200 deterministic Poisson(1) weights (the
    // inverse-CDF transform of the md5 uniform against the shared
    // literal CDF table), replicate sums stay exact integers, CI
    // bounds are the exact interpolated percentiles over replicate
    // means — the q77/q80 percentile==quantile_cont contract. One
    // map-side fan-out; only the keys x 200 frame shuffles.
    (s, dir) =>
      graft.operators.Sampling.bootstrapMeanCI(
        events(s, dir), Seq("event_type"), "event_id", "value",
        replicates = 200, ciPct = 95, scale = 2, salt = "graft")
        .orderBy("event_type"),
    Some("""WITH r AS (SELECT event_type AS k,
        CAST(event_id AS VARCHAR) AS id,
        CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS x6
        FROM events WHERE value IS NOT NULL),
      rep AS (SELECT k, id, x6, CAST(u.b AS INTEGER) AS b
        FROM r CROSS JOIN unnest(range(200)) AS u(b)),
      uu AS (SELECT k, b, x6,
          (CAST(md5_number_lower(id || ':' || b || ':graft')
            >> 11 AS DOUBLE) + 0.5) / 9007199254740992.0 AS u
        FROM rep),
      ww AS (SELECT k, b, x6, CASE
          WHEN u < 0.36787944117144233 THEN 0
          WHEN u < 0.7357588823428847 THEN 1
          WHEN u < 0.9196986029286058 THEN 2
          WHEN u < 0.9810118431238462 THEN 3
          WHEN u < 0.9963401531726563 THEN 4
          WHEN u < 0.9994058151824183 THEN 5
          WHEN u < 0.9999167588507119 THEN 6
          WHEN u < 0.9999897508033253 THEN 7
          WHEN u < 0.9999988747974021 THEN 8
          WHEN u < 0.9999998885745217 THEN 9
          ELSE 10 END AS w FROM uu),
      pr AS (SELECT k, b, sum(w * x6) AS s,
          CAST(sum(w) AS BIGINT) AS n
        FROM ww GROUP BY 1, 2),
      mn AS (SELECT k, b,
          CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * 100.0) AS m
        FROM pr WHERE n > 0),
      ci AS (SELECT k, CAST(count(*) AS BIGINT) AS b_used,
          quantile_cont(m, 0.025) AS ci_lo,
          quantile_cont(m, 0.975) AS ci_hi
        FROM mn GROUP BY 1),
      pt AS (SELECT k, CAST(count(*) AS BIGINT) AS n_rows,
          CAST(sum(x6) AS DOUBLE)
            / (CAST(count(*) AS DOUBLE) * 100.0) AS mean
        FROM r GROUP BY 1)
      SELECT pt.k AS event_type, pt.n_rows, pt.mean, ci.b_used,
        ci.ci_lo, ci.ci_hi
      FROM pt JOIN ci ON ci.k = pt.k ORDER BY event_type""")
  )

  private val q231_reliability = Q(
    "q231_reliability",
    // Does the quality score predict duplication? Reliability table
    // of qualityScore against "document content is duplicated"
    // (exact-dup membership): 10 equal-width score cells, exact
    // 6-decimal-integer binning, per-cell population / dup rate /
    // mean score / calibration gap — cells, not a summed ECE (the
    // chiSquaredCells discipline). Zero cells materialize.
    (s, dir) => {
      val docs = table(s, dir, "documents")
      val dup = Dedup.exactGroups(docs, "doc_id", "text")
        .select(col("content_hash"),
          (col("n_copies") > 1L).as("is_dup"))
      val scored = docs.select(
        md5(col("text")).as("content_hash"),
        TextFunctions.qualityScore(col("text")).as("q"))
      graft.operators.Curation.reliabilityTable(
        scored.join(dup, "content_hash"), "q", col("is_dup"),
        bins = 10)
        .orderBy("bin")
    },
    Some(s"""WITH scored AS (SELECT doc_id,
        round(least(CAST(length(text) AS DOUBLE) / 400.0, 1.0) * 0.5
          + least((CASE WHEN len($W) = 0 THEN 0.0
              ELSE CAST(len(list_filter($W, x -> list_contains($stopList, x)))
                AS DOUBLE) / len($W) END) * 5.0, 1.0) * 0.4
          + (1.0 - least((CASE WHEN length(text) = 0 THEN 0.0
              ELSE CAST(len(regexp_extract_all(text,
                '[.,;:!?''"()\\[\\]{}-]')) AS DOUBLE) / length(text) END)
              * 4.0, 1.0)) * 0.1, 6) AS q,
        (count(*) OVER (PARTITION BY text)) > 1 AS y
        FROM documents),
      b AS (SELECT CAST(CAST(q AS DECIMAL(18,6)) * 1000000 AS BIGINT)
          AS s6, y FROM scored WHERE q IS NOT NULL AND y IS NOT NULL),
      c AS (SELECT least((s6 * 10) // 1000000, 9) AS bin,
          CAST(count(*) AS BIGINT) AS n,
          CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT)
            AS n_pos,
          sum(s6) AS ssum
        FROM b GROUP BY 1),
      g AS (SELECT CAST(u.b AS BIGINT) AS bin
        FROM unnest(range(10)) AS u(b))
      SELECT g.bin,
        round(CAST(g.bin AS DOUBLE) / 10, 6) AS lo,
        round(CAST(g.bin + 1 AS DOUBLE) / 10, 6) AS hi,
        CAST(COALESCE(c.n, 0) AS BIGINT) AS n,
        CAST(COALESCE(c.n_pos, 0) AS BIGINT) AS n_pos,
        CASE WHEN COALESCE(c.n, 0) > 0 THEN
          round(CAST(c.n_pos AS DOUBLE) / CAST(c.n AS DOUBLE), 6)
          END AS pos_rate,
        CASE WHEN COALESCE(c.n, 0) > 0 THEN
          round(CAST(c.ssum AS DOUBLE)
            / (CAST(c.n AS DOUBLE) * 1000000.0), 6) END AS mean_score,
        CASE WHEN COALESCE(c.n, 0) > 0 THEN
          round(CAST(c.n_pos AS DOUBLE) / CAST(c.n AS DOUBLE)
            - CAST(c.ssum AS DOUBLE)
              / (CAST(c.n AS DOUBLE) * 1000000.0), 6) END AS gap
      FROM g LEFT JOIN c ON c.bin = g.bin ORDER BY g.bin""")
  )

  private val q246_classifier_fairness = Q(
    "q246_classifier_fairness",
    // Per-source ROC AUC of the q244 model — the fairness audit a
    // corpus filter needs BEFORE deployment: a slice where AUC
    // collapses is a slice the filter silently deletes. Same
    // exact-integer midrank identity as q245, partitioned by
    // source over the (group, distinct-score-face) frame.
    (s, dir) => {
      val f = qualityFeatures(s, dir)
      val last = graft.operators.Classify.logisticGD(
        f, "y", Seq("x1", "x2", "x3", "x4"),
        lr = 2.0, iterations = 3)
        .orderBy("iter").collect().last
      val w = (3 to 7).map(last.getDouble)
      graft.operators.Classify.aucByGroup(
        graft.operators.Classify.score(
          f, Seq("x1", "x2", "x3", "x4"), w),
        "source", "y", "score")
        .orderBy("source")
    },
    Some(s"""WITH $qualityTrainCtes,
      sc AS (SELECT f.source, f.y,
          round(1.0/(1.0+exp(-(w3.b0 + w3.w1*f.x1 + w3.w2*f.x2
            + w3.w3*f.x3 + w3.w4*f.x4))), 6) AS s
        FROM f CROSS JOIN w3 WHERE f.source IS NOT NULL),
      cnt AS (SELECT source, s, CAST(count(*) AS BIGINT) AS c,
          CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT)
            AS cp
        FROM sc GROUP BY 1, 2),
      cum AS (SELECT source, s, c, cp,
          sum(c) OVER (PARTITION BY source ORDER BY s) AS cm
        FROM cnt),
      agg AS (SELECT source,
          CAST(sum(cp) AS BIGINT) AS n_pos,
          CAST(sum(c - cp) AS BIGINT) AS n_neg,
          CAST(sum(cp * (2 * cm - c + 1)) AS BIGINT) AS r2a
        FROM cum GROUP BY 1)
      SELECT source, n_pos, n_neg,
        CASE WHEN n_pos > 0 AND n_neg > 0 THEN
          round(CAST(r2a - n_pos * (n_pos + 1) AS DOUBLE)
            / (2.0 * CAST(n_pos * n_neg AS DOUBLE)), 6)
          END AS auc
      FROM agg ORDER BY source""")
  )

  private val q247_threshold_sweep = Q(
    "q247_threshold_sweep",
    // Operating-point table for the q244 model: exact confusion
    // counts at 9 thresholds from one conditional-aggregation pass
    // over a bounded fan-out; precision/recall/F1 one IEEE division
    // each at the 6-decimal face, null when undecidable. AUC (q245)
    // says the ranking is good; this table says where to cut.
    (s, dir) => {
      val f = qualityFeatures(s, dir)
      val last = graft.operators.Classify.logisticGD(
        f, "y", Seq("x1", "x2", "x3", "x4"),
        lr = 2.0, iterations = 3)
        .orderBy("iter").collect().last
      val w = (3 to 7).map(last.getDouble)
      graft.operators.Classify.thresholdSweep(
        graft.operators.Classify.score(
          f, Seq("x1", "x2", "x3", "x4"), w),
        "y", "score",
        (6 to 14).map(_ / 20.0))
        .orderBy("threshold")
    },
    Some(s"""WITH $qualityTrainCtes,
      sc AS (SELECT f.y,
          round(1.0/(1.0+exp(-(w3.b0 + w3.w1*f.x1 + w3.w2*f.x2
            + w3.w3*f.x3 + w3.w4*f.x4))), 6) AS s
        FROM f CROSS JOIN w3),
      fan AS (SELECT sc.y, sc.s, CAST(u.threshold AS DOUBLE)
          AS threshold FROM sc
        CROSS JOIN unnest([0.3, 0.35, 0.4, 0.45, 0.5, 0.55, 0.6,
          0.65, 0.7]) AS u(threshold)),
      cm AS (SELECT threshold,
          CAST(sum(CASE WHEN s >= threshold AND y = 1
            THEN 1 ELSE 0 END) AS BIGINT) AS tp,
          CAST(sum(CASE WHEN s >= threshold AND y <> 1
            THEN 1 ELSE 0 END) AS BIGINT) AS fp,
          CAST(sum(CASE WHEN s < threshold AND y = 1
            THEN 1 ELSE 0 END) AS BIGINT) AS fn,
          CAST(sum(CASE WHEN s < threshold AND y <> 1
            THEN 1 ELSE 0 END) AS BIGINT) AS tn
        FROM fan GROUP BY 1)
      SELECT threshold, tp, fp, fn, tn,
        CASE WHEN tp + fp > 0 THEN
          round(CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE), 6)
          END AS precision,
        CASE WHEN tp + fn > 0 THEN
          round(CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE), 6)
          END AS recall,
        CASE WHEN 2 * tp + fp + fn > 0 THEN
          round(CAST(2 * tp AS DOUBLE)
            / CAST(2 * tp + fp + fn AS DOUBLE), 6)
          END AS f1
      FROM cm ORDER BY threshold""")
  )

  private val q254_gopher_gate = Q(
    "q254_gopher_gate",
    // Gopher/MassiveText multi-rule document filter as one codegen'd
    // scan: word-count bounds, mean-word-length band, alphabetic-word
    // fraction, required-stopword hits, duplicate-2-gram fraction,
    // and top-2-gram share (longest equal-run of the sorted gram
    // array — no explode). Thresholds tightened to this corpus'
    // observed ranges so every rule column carries both outcomes;
    // all signals are exact integer ratios, so DuckDB reproduces
    // them bitwise.
    (s, dir) =>
      graft.operators.Curation.gopherGate(
        table(s, dir, "documents"), "doc_id", "text",
        minWords = 30L, maxWords = 100000L,
        minMeanWordLen = 3.0, maxMeanWordLen = 10.0,
        minAlphaFrac = 0.8, minStopHits = 2,
        maxDup2Frac = 0.05, maxTop2Frac = 0.05)
        .orderBy("doc_id"),
    Some(s"""WITH t AS (SELECT doc_id, $W AS w FROM documents),
      g AS (SELECT doc_id, w,
        list_transform(range(greatest(len(w) - 1, 0)),
          i -> w[i+1] || ' ' || w[i+2]) AS g2 FROM t),
      mx AS (SELECT doc_id, max(cnt) AS mxc FROM (
          SELECT doc_id, gram, count(*) AS cnt
          FROM (SELECT doc_id, unnest(g2) AS gram FROM g)
          GROUP BY 1, 2) GROUP BY 1),
      s AS (SELECT g.doc_id,
        CAST(len(w) AS BIGINT) AS word_count,
        CASE WHEN len(w) = 0 THEN 0.0
          ELSE CAST(list_sum(list_transform(w, x -> len(x)))
            AS DOUBLE) / len(w) END AS mean_word_len,
        CASE WHEN len(w) = 0 THEN 0.0
          ELSE CAST(len(list_filter(w,
            x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) / len(w)
          END AS alpha_frac,
        CAST(len(list_intersect(list_distinct(w),
          ['the','be','to','of','and','that','have','with']))
          AS BIGINT) AS stop_hits,
        CASE WHEN len(g2) = 0 THEN 0.0
          ELSE 1.0 - CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2)
          END AS dup2_frac,
        CASE WHEN len(g2) = 0 THEN 0.0
          ELSE CAST(coalesce(mx.mxc, 0) AS DOUBLE) / len(g2)
          END AS top2_frac
        FROM g LEFT JOIN mx ON mx.doc_id = g.doc_id)
      SELECT *, r_words AND r_word_len AND r_alpha AND r_stop
          AND r_dup2 AND r_top2 AS passed
      FROM (SELECT s.*,
        word_count BETWEEN 30 AND 100000 AS r_words,
        mean_word_len BETWEEN 3.0 AND 10.0 AS r_word_len,
        alpha_frac >= 0.8 AS r_alpha,
        stop_hits >= 2 AS r_stop,
        dup2_frac <= 0.05 AS r_dup2,
        top2_frac <= 0.05 AS r_top2 FROM s)
      ORDER BY doc_id""")
  )

  val all: Seq[Q] = Seq(
    q254_gopher_gate,
    q247_threshold_sweep,
    q246_classifier_fairness,
    q245_classifier_auc,
    q244_quality_classifier,
    q231_reliability,
    q68_sample_crossengine,
    q99_shuffle_shards,
    q100_length_batches,
    q69_token_budget,
    q44_curation_pipeline,
    q45_source_audit,
    q124_interleave_order,
    q146_exact_k_sample,
    q154_winsorize,
    q156_nucleus_coverage,
    q160_kfold,
    q164_mixture_diagnostics,
    q173_temperature_mix,
    q131_filter_attrition,
    q142_mixture_plan,
    q109_epoch_mixture,
    q116_domain_cap,
    q74_pack_sequences,
    q275_pack_delete_radius,
    q75_quality_quantile,
    q83_chunk_overlap,
    q84_weighted_sample,
    q81_mixture_sample,
    q80_percentiles_tokens,
    q197_neyman_allocation,
    q210_rendezvous_shard,
    q218_filter_overlap,
    q225_bootstrap_ci)

}
