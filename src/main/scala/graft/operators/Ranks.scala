package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rank assignment for frames already BOUNDED by construction. */
object Ranks {
  /** 1-based `rank` over `order` for a frame a prior `limit(k)` (or a
    * vocab-sized aggregation) has already bounded to a handful of
    * rows. Deliberately NOT a window: `Window.orderBy` with no
    * partition is the global-window shape PlanHygieneSpec bans, and a
    * `partitionBy(lit)` disguise doesn't survive Spark 4's
    * EliminateWindowPartitions rule (foldable partition keys are
    * pruned, restoring the WindowExec single-partition warning).
    * Instead: one explicit partition (`coalesce(1)` — the upstream
    * GlobalLimit already left the k rows in one partition, so this
    * moves nothing), a partition-local sort, and
    * `monotonically_increasing_id` which enumerates a lone partition
    * 0..n-1 in iterator order. Spark never reorders past the
    * nondeterministic id expression, so rank follows the sort. */
  def rankBounded(df: DataFrame, order: Column*): DataFrame = {
    require(order.nonEmpty, "rankBounded needs at least one order column")
    df.coalesce(1)
      .sortWithinPartitions(order: _*)
      .withColumn("rank", (monotonically_increasing_id() + 1).cast("long"))
  }
}
