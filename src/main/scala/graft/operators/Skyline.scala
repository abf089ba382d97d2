package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pareto-frontier (skyline) extraction: the rows no other row
  * dominates under (minimize `xCol`, maximize `yCol`) — the
  * cost/quality trade-off screen (cheapest part per size class, best
  * document per token budget, fastest config per accuracy tier).
  *
  * The classic single-node spelling sorts the whole input once and
  * walks it with a running max — a global sort plus a global window,
  * exactly the single-task shape that dies first at scale. This one
  * is two-phase: fixed-width range buckets on `x` localize the
  * running-max to per-bucket windows (parallel, bounded), and the
  * cross-bucket prefix is reconstructed from a B-row bucket summary
  * (B is a constant knob, never data-sized) joined back by broadcast.
  * Result is exactly the sequential skyline for any bucket count —
  * a spec pins B=1 == B=64.
  *
  * Dominance is the standard strict one: q dominates p iff
  * q.x <= p.x ∧ q.y >= p.y with at least one strict. Tied points
  * (equal x AND equal y) do not dominate each other, so duplicated
  * frontier points all survive.
  *
  * Reference analog: none — multi-pass dominance pruning is the
  * category the reference's one map/reduce pass cannot compose.
  */
object Skyline {

  /** Exact 2-D skyline of `df` under (minimize `xCol`, maximize
    * `yCol`). Returns the input rows (all columns) that survive.
    * Null metric values are rejected loudly — a null would silently
    * vanish from every comparison and the row would masquerade as
    * frontier.
    *
    * Shape: one narrow min/max agg (broadcast), deterministic
    * fixed-width bucket assignment, one (bucket, x) tie-collapse
    * partial agg, per-bucket prefix-max windows over the collapsed
    * frame, a B^2 self-join on the B-row bucket summary, and one
    * equi-join back onto the input. Nothing global, nothing
    * driver-side. */
  def pareto2D(
      df: DataFrame,
      xCol: String,
      yCol: String,
      buckets: Int = 64): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val reserved = Seq("_b", "_x", "_y", "_ymax_same_x", "_m1", "_pmax")
      .filter(df.columns.contains)
    require(reserved.isEmpty,
      s"pareto2D reserves internal column names; the input already " +
        s"has ${reserved.mkString(", ")} — rename before calling")

    val x = col(xCol)
    val y = col(yCol)

    // Loud null contract (narrow count, one job).
    val nNull = df.filter(x.isNull || y.isNull).limit(1).count()
    require(nNull == 0L,
      s"pareto2D: null $xCol/$yCol values present — nulls cannot be " +
        "ordered under dominance; filter or impute them explicitly")

    val mm = df.agg(min(x).as("_mn"), max(x).as("_mx"))
    // Deterministic fixed-width bucket: equal x always lands in the
    // same bucket, so "strictly earlier bucket" == "strictly smaller
    // x" — the invariant the prefix-max correction relies on.
    val bucketed = df.crossJoin(broadcast(mm))
      .withColumn("_b",
        when(col("_mx") === col("_mn"), lit(0))
          .otherwise(least(
            floor((x - col("_mn")) / (col("_mx") - col("_mn"))
              * buckets).cast("int"),
            lit(buckets - 1))))
      .drop("_mn", "_mx")

    // Tie-collapse: one row per distinct x per bucket, carrying the
    // best (max) y at that exact x.
    val g = bucketed.groupBy(col("_b"), x.as("_x"))
      .agg(max(y).cast("double").as("_ymax_same_x"))

    // Strictly-smaller-x running max inside the bucket: g has one row
    // per distinct x, so a rows-frame ending one before the current
    // row IS the strict prefix.
    val wPrev = Window.partitionBy("_b").orderBy("_x")
      .rowsBetween(Window.unboundedPreceding, -1)
    val gm = g.withColumn("_m1", max(col("_ymax_same_x")).over(wPrev))

    // Cross-bucket prefix max from the B-row summary (B constant).
    val bmax = g.groupBy("_b").agg(max(col("_ymax_same_x")).as("_bm"))
    val pmax = bmax.as("a")
      .join(bmax.as("b"), col("a._b") < col("b._b"))
      .groupBy(col("b._b").as("_b"))
      .agg(max(col("a._bm")).as("_pmax"))

    val ginfo = gm
      .join(broadcast(pmax), Seq("_b"), "left")
      .withColumn("_m1", greatest(
        coalesce(col("_m1"), lit(Double.NegativeInfinity)),
        coalesce(col("_pmax"), lit(Double.NegativeInfinity))))
      .select(col("_b"), col("_x"), col("_ymax_same_x"), col("_m1"))

    // Survive iff no strictly-cheaper row reaches my y (_m1 >= y) and
    // no same-cost row strictly beats it (_ymax_same_x > y).
    bucketed
      .join(ginfo, bucketed("_b") === ginfo("_b") && x === ginfo("_x"))
      .filter(!(col("_m1") >= y.cast("double")) &&
        !(col("_ymax_same_x") > y.cast("double")))
      .select(df.columns.map(col): _*)
  }
}
