package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset profiling — the audit pass a training pipeline runs before
  * (and after) every transformation: per-column null counts, distinct
  * cardinality, and numeric ranges, computed in ONE scan.
  *
  * Shape matters at 100 TB: one wide aggregate with every measure as
  * a separate aggregate expression compiles to a single pass with
  * partial aggregation (no per-column jobs, no `describe()`-style
  * driver loops). Exact distinct counts are the expensive part —
  * `exact = false` (default) swaps them for HLL sketches
  * (`approx_count_distinct`), which is the only honest default at
  * scale; exact mode exists for fixtures and oracles. */
object Profile {

  /** One row per profiled column:
    * (column, n_rows, n_nulls, n_distinct, min_val, max_val) with
    * min/max as strings (schema-stable across column types). */
  def profile(
      df: DataFrame,
      cols: Seq[String],
      exact: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    // generated measure names are positional (__m0_, __m1_, ...), never
    // derived from user column text: a source column named "a.b" or
    // "x-y z" can't break (or silently re-resolve inside) the stack()
    // expression below. The label row still carries the real name via
    // a quoted literal.
    val measures = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        count(lit(1)).as(s"__n_$i"),
        count(when(col(c).isNull, 1)).as(s"__nulls_$i"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"__dist_$i"),
        min(col(c)).cast("string").as(s"__min_$i"),
        max(col(c)).cast("string").as(s"__max_$i"))
    }
    val wide = df.agg(measures.head, measures.tail: _*)
    // unpivot the single wide row into one row per column — stack is
    // a Generate over one row, not a per-column job
    val stackArgs = cols.indices.map { i =>
      val label = cols(i).replace("\\", "\\\\").replace("'", "\\'")
      s"'$label', __n_$i, __nulls_$i, __dist_$i, __min_$i, __max_$i"
    }.mkString(", ")
    wide.select(expr(
      s"stack(${cols.length}, $stackArgs) AS " +
        "(column, n_rows, n_nulls, n_distinct, min_val, max_val)"))
  }
}
