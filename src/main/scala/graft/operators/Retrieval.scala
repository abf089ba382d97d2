package graft.operators

import org.apache.spark.sql.DataFrame
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
}
