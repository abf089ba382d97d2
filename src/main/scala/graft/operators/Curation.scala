package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Dataset-assembly operators: the last mile of a training-data
  * pipeline, where a cleaned corpus is cut to a token budget. */
object Curation {

  /** Quality-first token-budget selection: order documents by
    * (quality DESC, id ASC — a total order), keep the maximal prefix
    * whose cumulative token count stays within `budget`. The window
    * spelling is exact and is what the DuckDB oracle recomputes; its
    * cost is one global sort. At 100 TB scale the same result comes
    * cheaper in two phases — histogram the per-quality-bucket token
    * counts, binary-search the quality cutoff on the driver, then one
    * parallel filter plus an exact window only over the boundary
    * bucket — the documented scale path; semantics identical. */
  def tokenBudgetSelect(
      df: DataFrame,
      idCol: String,
      textCol: String,
      budget: Long,
      quality: Column): DataFrame = {
    val w = Window
      .orderBy(quality.desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_toks", TextFunctions.tokenCount(col(textCol)))
      .withColumn("_cum", sum(col("_toks")).over(w))
      .filter(col("_cum") <= budget)
      .drop("_toks", "_cum")
  }

  /** Per-group quality-quantile selection (the FineWeb-style cut):
    * within each group keep the best `frac` of rows by `scoreCol`,
    * ties broken by id so the kept set is a total-order prefix —
    * deterministic under retries and bitwise reproducible by any
    * engine with window rank (the q75 oracle). Rank-based (count
    * thresholds, ceil(frac·n) kept per group), NOT percent_rank —
    * identical semantics, but integer math end to end.
    *
    * One shuffle on the group key; the window is a per-group sort.
    * At 100 TB the same cutoff comes cheaper via per-group score
    * histograms + a driver-side threshold (the tokenBudgetSelect
    * two-phase note applies verbatim); semantics identical. */
  def topQuantilePerGroup(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      scoreCol: Column,
      frac: Double): DataFrame = {
    require(frac > 0.0 && frac <= 1.0, "frac must be in (0, 1]")
    val w = Window.partitionBy(groupCol)
      .orderBy(scoreCol.desc, col(idCol))
    val wc = Window.partitionBy(groupCol)
    df.withColumn("_rk", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(wc))
      .filter(col("_rk") <= ceil(lit(frac) * col("_n")).cast("long"))
      .drop("_rk", "_n")
  }
}
