package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank fusion across retrieval modalities — the standard way a
  * training-data pipeline combines lexical (BM25, [[TfIdf.bm25TopK]])
  * and semantic ([[Similarity.bruteForceTopK]] / ANN) retrieval into
  * one candidate list: Reciprocal Rank Fusion (Cormack, Clarke &
  * Büttcher, SIGIR'09), score(d) = Σ_lists 1/(k + rank_list(d)).
  * RRF needs no score calibration between modalities — only ranks —
  * which is exactly why it is the default fusion in hybrid search.
  *
  * Determinism: the fused score is a FIXED-ORDER sum of the listed
  * rankings' terms (each a single 1/(k+rank) division from integer
  * rank), never a shuffle-ordered float aggregation — bitwise
  * reproducible and expressible identically in any engine.
  */
object Retrieval {

  /** Fuse named rankings (each a frame carrying `idCol` + `rankCol`,
    * rank 1-based) by RRF; return the global top `topK` with the
    * per-list ranks carried (null where a list missed the id).
    *
    * Output: (rank, id, rrf, rank_<name>...), rank 1-based by
    * (rrf DESC, id) — id is the total-order tiebreak.
    *
    * Shape: per-list projections union into a distinct id frame
    * (partial-agg), one left equi-join per list (each list is
    * top-k-bounded — broadcast-sized by construction), a k-bounded
    * TakeOrdered, and [[Ranks.rankBounded]] for the emitted rank —
    * no global window, nothing driver-side. */
  def rrfFuse(
      rankings: Seq[(String, DataFrame)],
      idCol: String,
      rankCol: String,
      rrfK: Int = 60,
      topK: Int = 20): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(rankings.map(_._1).distinct.size == rankings.size,
      "ranking names must be distinct")
    require(rrfK >= 1, s"rrfK must be >= 1, got $rrfK")
    require(topK >= 1, s"topK must be >= 1, got $topK")

    val lists = rankings.map { case (name, df) =>
      name -> df.select(col(idCol).as("id"),
        col(rankCol).cast("long").as(s"rank_$name"))
    }
    val ids = lists.map(_._2.select("id")).reduce(_ unionAll _).distinct()
    val joined = lists.foldLeft(ids) { case (acc, (name, l)) =>
      acc.join(broadcast(l), Seq("id"), "left")
    }
    val score = lists.map { case (name, _) =>
      coalesce(lit(1.0) / (lit(rrfK) + col(s"rank_$name")), lit(0.0))
    }.reduce(_ + _)
    val rankCols = lists.map { case (name, _) => col(s"rank_$name") }
    val top = joined
      .select(Seq(col("id"), score.as("rrf")) ++ rankCols: _*)
      .orderBy(col("rrf").desc, col("id"))
      .limit(topK)
    Ranks.rankBounded(top, col("rrf").desc, col("id"))
      .select(Seq(col("rank"), col("id"), col("rrf")) ++ rankCols: _*)
  }

  /** Retrieve-then-rerank cascade, stage two: a cross-encoder-style
    * blended scorer over the FUSED CANDIDATE LIST ONLY — the shape
    * every production hybrid-retrieval stack uses (cheap retrievers
    * generate, an expensive pair scorer re-orders a k-bounded list).
    * The scorer here is a deterministic stand-in for a model: it
    * reads the (query, candidate) PAIR CONTENT fresh — full-text
    * term coverage and density plus the exact query-vector cosine —
    * rather than reusing retriever scores, which is exactly the
    * cross-encoder contract (late interaction over the pair, no
    * score calibration between the upstream lists).
    *
    * score = wCos·(cos+1)/2 + wCov·coverage + wDen·den/(1+den),
    * where coverage = |query terms present| / |query terms| and
    * den = term occurrences / word count. A candidate missing its
    * vector (or its document row) contributes 0 for that feature —
    * COALESCE'd identically on both engines. Every feature is exact
    * integers + one IEEE division (or the [[Kernels.cosineArrays]]
    * dim-ordered fold), the blend is ONE fixed left-associated IEEE
    * expression, emitted at 6 decimals: bitwise cross-engine.
    *
    * Shape — the 100 TB argument IS the cascade: the candidate list
    * is topK-of-fusion bounded (tens of rows), so the expensive
    * stage broadcasts the CANDIDATE IDS against corpus and
    * embeddings (two broadcast joins that prune to candidate-sized
    * frames at the scan) and scores only those rows. Corpus size
    * never enters stage two; nothing driver-side, no window.
    *
    * Output: (rank, id, score, cos, coverage, density, rank_fused),
    * rank 1-based by (score DESC, id), topK rows. */
  def rerankBlend(
      fused: DataFrame,
      fusedIdCol: String,
      fusedRankCol: String,
      docs: DataFrame,
      docIdCol: String,
      textCol: String,
      emb: DataFrame,
      vecIdCol: String,
      vecCol: String,
      queryTerms: Seq[String],
      queryVecId: Long,
      topK: Int = 10,
      wCos: Double = 0.5,
      wCov: Double = 0.3,
      wDen: Double = 0.2): DataFrame = {
    require(queryTerms.nonEmpty, "rerankBlend needs query terms")
    require(queryTerms.distinct.size == queryTerms.size,
      "query terms must be distinct")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    require(wCos >= 0 && wCov >= 0 && wDen >= 0 &&
      wCos + wCov + wDen > 0, "weights must be >= 0, sum > 0")
    // fixed term order: the hit sum folds identically cross-engine
    val terms = queryTerms.sorted
    // internal join key carries a reserved name so a caller's own
    // "id" column in docs/emb can never collide with the candidate id
    val cand = fused.select(
      col(fusedIdCol).cast("long").as("_cand_id"),
      col(fusedRankCol).cast("long").as("rank_fused"))
    // text features, candidate-pruned at the scan: broadcast the
    // k-bounded candidate ids INTO the corpus join, never the corpus
    val words = graft.functions.TextFunctions.words(col(textCol))
    val docSide = docs
      .join(broadcast(cand.select("_cand_id")),
        col(docIdCol).cast("long") === col("_cand_id"))
      .select(col("_cand_id"), words.as("_w"))
    val hits = terms.map(t =>
      size(filter(col("_w"), w => w === lit(t))).cast("long"))
      .reduce(_ + _)
    val covered = terms.map(t =>
      when(exists(col("_w"), w => w === lit(t)), 1L).otherwise(0L))
      .reduce(_ + _)
    val textFeat = docSide.select(col("_cand_id"),
      (covered.cast("double") / lit(terms.size.toDouble))
        .as("_coverage"),
      (hits.cast("double") /
        greatest(size(col("_w")), lit(1)).cast("double")).as("_den"))
    // pair cosine against the ONE query vector (broadcast single row)
    val cosUdf = udf((a: scala.collection.Seq[Float],
        b: scala.collection.Seq[Float]) =>
      Kernels.cosineArrays(a.toArray, b.toArray))
    val qv = emb.filter(col(vecIdCol).cast("long") === queryVecId)
      .select(col(vecCol).cast("array<float>").as("_qv"))
    // exactly ONE query vector, verified before the plan is built: an
    // absent id would make the crossJoin yield no vecFeat rows and
    // every candidate's cosine would coalesce to -1.0 — a
    // wrong-but-plausible ranking instead of a loud failure — and a
    // duplicated id would fan every candidate out into multiple rows.
    // The check is a pushed-down id-filter + limit(2): candidate-scan
    // cost, fail-fast (the repo's limit-guard discipline).
    val qvN = qv.limit(2).collect().length
    require(qvN == 1,
      s"rerankBlend: queryVecId=$queryVecId matched $qvN rows in the " +
        "embedding frame (expected exactly 1) — an absent id silently " +
        "scores every candidate's cosine as -1, a duplicate fans " +
        "candidates out")
    val vecFeat = emb
      .join(broadcast(cand.select("_cand_id")),
        col(vecIdCol).cast("long") === col("_cand_id"))
      .crossJoin(broadcast(qv))
      .select(col("_cand_id"),
        cosUdf(col("_qv"), col(vecCol).cast("array<float>"))
          .as("_cos"))
    val feat = cand
      .join(broadcast(textFeat), Seq("_cand_id"), "left")
      .join(broadcast(vecFeat), Seq("_cand_id"), "left")
      .select(col("_cand_id"), col("rank_fused"),
        coalesce(col("_cos"), lit(-1.0)).as("_c"),
        coalesce(col("_coverage"), lit(0.0)).as("_cov"),
        coalesce(col("_den"), lit(0.0)).as("_d"))
    val blended = feat.select(col("_cand_id").as("id"),
      col("rank_fused"),
      round(lit(wCos) * ((col("_c") + lit(1.0)) / lit(2.0)) +
        lit(wCov) * col("_cov") +
        lit(wDen) * (col("_d") / (lit(1.0) + col("_d"))), 6)
        .as("score"),
      round(col("_c"), 6).as("cos"),
      round(col("_cov"), 6).as("coverage"),
      round(col("_d"), 6).as("density"))
    val top = blended.orderBy(col("score").desc, col("id"))
      .limit(topK)
    Ranks.rankBounded(top, col("score").desc, col("id"))
      .select(col("rank"), col("id"), col("score"), col("cos"),
        col("coverage"), col("density"), col("rank_fused"))
  }

  /** Maximal Marginal Relevance (Carbonell & Goldstein, SIGIR'98):
    * greedily re-rank each query's candidate shortlist so picks are
    * relevant AND mutually diverse — step score = wRel·cos −
    * wDiv·max(sim to anything already picked). The training-data
    * read: a near-dup cluster in an ANN shortlist collapses to one
    * representative, so a retrieval-built batch doesn't spend m slots
    * on m copies.
    *
    * Greedy selection is inherently sequential in m, so the m steps
    * are UNROLLED into the plan (the q232 k-core discipline: loops
    * the engine can't express become fixed-count stages both engines
    * replay identically; `m` is loudly bounded because each step
    * appends joins to the lineage). Everything per step is bounded
    * by the shortlist: one anti-join against the ≤(t−1)-row selected
    * set, one equi-join + MAX over the k²-row pair-sim frame, one
    * per-query window over ≤ k rows. Corpus size never appears —
    * the quadratic candidate problem belongs to whichever k-NN
    * supplier built the shortlist.
    *
    * `candidates` carries the [[Similarity.bruteForceTopK]] contract
    * (query_id, rank, nn_id, cos); `pairSims` carries BOTH directions
    * of every within-query candidate pair as (query_id, id_a, id_b,
    * sim). Determinism: step products/differences are single IEEE
    * ops on bitwise-reproducible cosines, MAX is order-free, ties
    * break by nn_id; faces round to 6 decimals. wRel/wDiv are BOTH
    * explicit (never 1−λ computed at runtime: 1.0−0.7 is
    * 0.30000000000000004 in IEEE and would diverge from a SQL 0.3
    * literal).
    *
    * Output: (query_id, step 1..m, nn_id, mmr_score) — step 1 is the
    * raw-cosine top hit; queries with fewer than m candidates emit
    * shorter lists. */
  def mmrDiversify(
      candidates: DataFrame,
      pairSims: DataFrame,
      m: Int,
      wRel: Double = 0.7,
      wDiv: Double = 0.3): DataFrame = {
    require(m >= 1 && m <= 8,
      s"m must be in [1, 8] (each step unrolls into the plan), got $m")
    require(wRel >= 0.0 && wDiv >= 0.0 && (wRel + wDiv) > 0.0,
      s"weights must be non-negative and not both zero, got " +
        s"wRel=$wRel wDiv=$wDiv")
    val cand = candidates
      .select(col("query_id"), col("nn_id"), col("cos"), col("rank"))
    var sel = cand.filter(col("rank") === 1)
      .select(col("query_id"), lit(1L).as("step"), col("nn_id"),
        round(col("cos"), 6).as("mmr_score"))
    for (t <- 2 to m) {
      val selIds = sel
        .select(col("query_id").as("_q"), col("nn_id").as("_sid"))
      val rem = cand.join(selIds,
        col("query_id") === col("_q") && col("nn_id") === col("_sid"),
        "left_anti")
      val pen = pairSims.join(selIds,
        pairSims("query_id") === col("_q") &&
          pairSims("id_b") === col("_sid"))
        .groupBy(pairSims("query_id").as("_pq"), pairSims("id_a"))
        .agg(max(col("sim")).as("_pen"))
      val scored = rem.join(pen,
        col("query_id") === col("_pq") && col("nn_id") === col("id_a"))
        .select(col("query_id"), col("nn_id"),
          (lit(wRel) * col("cos") - lit(wDiv) * col("_pen"))
            .as("_sc"))
      val w = Window.partitionBy("query_id")
        .orderBy(col("_sc").desc, col("nn_id"))
      val pick = scored.withColumn("_r", row_number().over(w))
        .filter(col("_r") === 1)
        .select(col("query_id"), lit(t.toLong).as("step"),
          col("nn_id"), round(col("_sc"), 6).as("mmr_score"))
      sel = sel.unionByName(pick)
      // sel_t references sel_{t-1} THREE times (anti-join, penalty
      // semi, union), so an untruncated unroll replicates the
      // candidate-supplier subtree ~3^(m-1) times — 2187 copies at
      // the allowed m=8, a catalyst-analysis explosion. Truncate the
      // (queries × t rows, tiny) selection every 3 steps: the longest
      // post-checkpoint segment is then 3 un-truncated steps (steps
      // 4–6 after the t=3 checkpoint), bounding plan copies at 3^3
      // for every allowed m, while m<=3 unrolls keep their pure
      // single-plan spelling. (The previous every-4 cadence left
      // steps 5–8 un-truncated at m=8 — a 3^4 worst case.)
      if (t % 3 == 0 && t < m) sel = sel.localCheckpoint(true)
    }
    sel
  }

  /** Label-relevance retrieval evaluation — P@k, MRR and nDCG@k per
    * query, with "relevant" = the candidate carries the query's
    * label: the standard way to score an embedding space (or an ANN
    * index) when graded judgments don't exist but class labels do.
    * Like [[mmrDiversify]], this takes the k-NN LIST, not the
    * corpus: feed it [[Similarity.bruteForceTopK]] to score the
    * embedding space itself, or an ANN supplier's list to score the
    * index (metric drop vs the exact list = recall loss priced in
    * ranking terms).
    *
    * nDCG's ideal is the TRUE ideal: n_rel = min(corpus size of the
    * query's label − 1 self, k) — so a query whose label has 3
    * members is not punished for k−2 unfillable slots. DCG folds
    * rel_r/(ln(r+1)/ln 2) in ascending rank order and IDCG folds the
    * same r=1..n_rel prefix, both bitwise-reproducible sequential
    * sums (the q94 ln discipline); P@k and MRR are exact-integer
    * ratios. Shape: two equi-joins against the (id → label) frame,
    * one label-count aggregate, one k-bounded per-query fold — the
    * quadratic work lives in whichever supplier built the list.
    *
    * Output: (extraKeys..., query_id, n_rel, p_at_k, mrr, ndcg),
    * faces at 6 decimals; mrr 0 when nothing relevant ranked, ndcg
    * null when the corpus holds no other member of the label.
    *
    * `extraKeys` (r10) widens the grouping so ONE pass scores a
    * whole grid of evals — e.g. q270's dedup-threshold sweep keys
    * the same query population by `band`, evaluating seven candidate
    * corpora in one aggregation instead of seven plans re-scoring
    * the k-NN supplier. The keys ride through every join and land
    * first in the output; the empty default is exactly the r9
    * per-query eval. */
  def labelEval(
      knn: DataFrame,
      labels: DataFrame,
      idCol: String,
      labelCol: String,
      k: Int,
      selfExcluded: Boolean = true,
      extraKeys: Seq[String] = Nil): DataFrame = {
    require(k >= 1 && k <= 1000, s"k must be in [1, 1000], got $k")
    val keys = extraKeys.map(col)
    val lab = labels.select(col(idCol).as("_lid"),
      col(labelCol).as("_lab"))
    val counts = lab.groupBy(col("_lab"))
      .agg(count(lit(1)).as("_lc"))
    val self = if (selfExcluded) 1L else 0L
    val qLab = knn.filter(col("rank") <= k)
      .join(lab, col("query_id") === col("_lid"))
      .select(keys ++ Seq(col("query_id"), col("rank"), col("nn_id"),
        col("_lab").as("_qlab")): _*)
    val rel = qLab
      .join(lab.select(col("_lid").as("_cid"), col("_lab").as("_clab")),
        col("nn_id") === col("_cid"))
      .select(keys ++ Seq(col("query_id"), col("_qlab"), col("rank"),
        when(col("_clab") === col("_qlab"), 1L).otherwise(0L)
          .as("_rel")): _*)
    val logTerm = (r: Column) =>
      lit(1.0) / (log(r.cast("double") + lit(1.0)) / log(lit(2.0)))
    val perQ = rel
      .groupBy(keys ++ Seq(col("query_id"), col("_qlab")): _*)
      .agg(sort_array(collect_list(struct(col("rank"), col("_rel"))))
        .as("_rr"),
        sum(col("_rel")).as("_nhit"),
        min(when(col("_rel") === 1L, col("rank"))).as("_first"))
      .join(counts, col("_qlab") === col("_lab"))
      .select(keys ++ Seq(col("query_id"),
        least(col("_lc") - lit(self), lit(k.toLong)).as("n_rel"),
        col("_rr"), col("_nhit"), col("_first")): _*)
    perQ.select(
      keys ++ Seq(col("query_id"), col("n_rel"),
      round(col("_nhit").cast("double") / lit(k.toDouble), 6)
        .as("p_at_k"),
      round(when(col("_first").isNull, lit(0.0))
        .otherwise(lit(1.0) / col("_first").cast("double")), 6)
        .as("mrr"),
      round(
        aggregate(col("_rr"), lit(0.0), (acc, s) =>
          acc + when(s.getField("_rel") === 1L,
            logTerm(s.getField("rank"))).otherwise(lit(0.0))) /
        when(col("n_rel") >= 1L,
          aggregate(sequence(lit(1L), col("n_rel")), lit(0.0),
            (acc, r) => acc + logTerm(r))), 6).as("ndcg")): _*)
  }
}
