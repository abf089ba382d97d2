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
}
