package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding-space alignment mining — the margin criterion of
  * Artetxe & Schwenk ("Margin-based Parallel Corpus Mining with
  * Multilingual Sentence Embeddings", ACL'19), the standard recipe
  * for mining bitext / aligned pairs between two embedded corpora
  * (CCMatrix-style): a candidate pair (x, y) is kept not when its
  * raw cosine is high but when the cosine BEATS the density of each
  * endpoint's own neighborhood,
  *
  *   margin(x, y) = cos(x, y) / ((meanTopK(x→B) + meanTopK(y→A)) / 2)
  *
  * — a hubness correction: a vector sitting in a dense region scores
  * high cosine against everything, and the ratio normalizes that
  * away. The reference has no vector machinery at all (its closest
  * analog is the RPC function registry dispatching named kernels,
  * `Imagine_Rpc/RpcServer.cpp:218-223`); this is north-star pipeline
  * surface (SURVEY §7.2 M4).
  *
  * The operator takes the two k-NN LISTS, not the corpora: the
  * margin criterion is independent of how neighbors were found, so
  * fixtures/oracles feed it [[Similarity.bruteForceTopK]] (exact)
  * while a 100 TB run feeds it [[Similarity.ivfTopK]] /
  * [[Similarity.annTopK]] (sub-quadratic candidates) — the same
  * exact-vs-ANN split every other similarity query in the catalog
  * uses. Everything downstream of the k-NN frames is equi-joins and
  * per-query-bounded folds; nothing here is quadratic.
  */
object Align {

  /** Score forward k-NN candidates by the ratio margin and keep each
    * query's best partner above `minMargin`.
    *
    * `fwd` (x→B) and `bwd` (y→A) carry the [[Similarity.bruteForceTopK]]
    * contract: (query_id, rank, nn_id, cos) with rank 1..k dense and
    * deterministic (cos desc, nn_id tiebreak). The neighborhood means
    * fold the k cosines IN RANK ORDER (sort_array over (rank, cos)
    * structs, then a sequential `aggregate`) so the double sum is
    * bitwise-reproducible by the oracle's `list(cos ORDER BY r)` fold
    * — a distributed SUM over 4 doubles would be cheaper but
    * order-nondeterministic. Per-query state is k structs, loudly
    * bounded.
    *
    * Shape at scale: one k-bounded fold per side keyed by query id,
    * then two equi-joins of the forward candidate list against the
    * two mean frames (candidate-list-sized, shuffle-partitioned on
    * the join keys), one per-query window over <= k rows. No
    * all-pairs stage; the quadratic risk lives (and is guarded) in
    * whichever k-NN supplier the caller picked.
    *
    * Output: (src_id, dst_id, cos, margin) — x's best-margin partner,
    * margin >= minMargin, one row per surviving src_id. */
  def marginScore(
      fwd: DataFrame,
      bwd: DataFrame,
      k: Int,
      minMargin: Double = 1.0): DataFrame = {
    require(k >= 1 && k <= 64, s"k must be in [1, 64], got $k")
    require(minMargin >= 0.0 && minMargin.isFinite,
      s"minMargin must be finite and >= 0, got $minMargin")

    val scored = scoreAgainstMeans(fwd, neighborhoodMean(fwd, k),
      neighborhoodMean(bwd, k), k)
    bestAboveFloor(scored, minMargin)
  }

  /** BOTH directions of [[marginScore]] in one pass over a single
    * frame holding the two sides' k-NN lists together (the
    * cross-lingual streamed tail's shape — each query's neighbors are
    * all of the opposite parity): one neighborhood-mean fold over the
    * whole frame serves as `mf` for a row's query side and as `mb`
    * for its neighbor side simultaneously, so the two-call spelling's
    * four mean groupBys collapse to one and its two rank windows to
    * one. Per query the consumed rows, folds, joins, and tie-breaks
    * are identical expressions over identical inputs, so the output
    * is BITWISE the union of marginScore(fwd, bwd) and
    * marginScore(bwd, fwd) split by side — AlignSpec pins the
    * equality. Same output contract: (src_id, dst_id, cos, margin),
    * one row per surviving src_id. */
  def marginScoreBoth(
      lists: DataFrame,
      k: Int,
      minMargin: Double = 1.0): DataFrame = {
    require(k >= 1 && k <= 64, s"k must be in [1, 64], got $k")
    require(minMargin >= 0.0 && minMargin.isFinite,
      s"minMargin must be finite and >= 0, got $minMargin")
    val means = neighborhoodMean(lists, k)
    val scored = scoreAgainstMeans(lists, means, means, k)
    bestAboveFloor(scored, minMargin)
  }

  // mean of the top-k cosines, folded in rank order (bitwise
  // deterministic; k-bounded per-query state)
  private def neighborhoodMean(knn: DataFrame, k: Int): DataFrame =
      knn.filter(col("rank") <= k)
        .select(col("query_id"),
          struct(col("rank"), col("cos")).as("s"))
        .groupBy("query_id")
        .agg(sort_array(collect_list(col("s"))).as("ss"))
        .select(col("query_id"),
          (aggregate(transform(col("ss"), s => s.getField("cos")),
            lit(0.0), (acc, x) => acc + x) / size(col("ss"))).as("m"))

  // the ratio margin PRESUMES positive neighborhood means (the
  // Artetxe-Schwenk setting): a negative mean INVERTS the ranking
  // (cos -0.8 / mean -0.5 = 1.6 beats cos -0.2 / -0.5 = 0.4) and a
  // zero mean divides to Infinity/NaN — both would silently emit
  // nonsense "aligned" pairs. The guard is FOLDED INTO the scored
  // plan (raise_error at execution on the first non-positive mean a
  // margin would consume) so it costs ZERO extra passes — the
  // previous build-time collect forced one full extra execution of
  // BOTH k-NN supplier subtrees, for q259 an additional ~n²/4
  // cosine pass per side. A mean the candidate joins never consume
  // is not checked: it influences no emitted margin. The at-scale
  // caller on an anisotropic space should re-center or use a
  // DIFFERENCE margin before mining.
  private def positiveMean(c: org.apache.spark.sql.Column) =
    when(c <= 0.0 || isnan(c),
      raise_error(concat(
        lit("marginScore: a neighborhood mean cosine is "),
        c.cast("string"),
        lit(" <= 0 — the ratio margin inverts (or divides to " +
          "Infinity) on non-positive means. Re-center the " +
          "embedding space or use a difference margin for this " +
          "corpus."))).cast("double"))
      .otherwise(c)

  // margin = cos / ((own mean + neighbor's mean) / 2), one row per
  // candidate; `fwdMeans` keys the row's query side, `bwdMeans` the
  // neighbor side (the same frame in the one-pass spelling)
  private def scoreAgainstMeans(
      cands: DataFrame,
      fwdMeans: DataFrame,
      bwdMeans: DataFrame,
      k: Int): DataFrame = {
    val mf = fwdMeans.select(col("query_id").as("_x"), col("m").as("_mf"))
    val mb = bwdMeans.select(col("query_id").as("_y"), col("m").as("_mb"))
    cands.filter(col("rank") <= k)
      .join(mf, col("query_id") === col("_x"))
      .join(mb, col("nn_id") === col("_y"))
      .select(col("query_id"), col("nn_id"), col("cos"),
        (col("cos") /
          ((positiveMean(col("_mf")) + positiveMean(col("_mb"))) /
            lit(2.0))).as("margin"))
  }

  // per-query best by (margin desc, nn_id), floored
  private def bestAboveFloor(
      scored: DataFrame, minMargin: Double): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(col("margin").desc, col("nn_id"))
    scored.withColumn("_r", row_number().over(w))
      .filter(col("_r") === 1 && col("margin") >= minMargin)
      .select(col("query_id").as("src_id"), col("nn_id").as("dst_id"),
        col("cos"), col("margin"))
  }
}
