package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Continuous-verification gates for approximate operators: every
  * sketch/ANN query in the catalog runs its approximation, measures
  * its quality against an exact reference INSIDE the job, and fails
  * loudly if quality regresses — so "approximate" never silently
  * degrades into "wrong". Two gate families, both bounded-cost:
  *
  *   - [[pairRecall]] — pair-level recall of an approximate
  *     top-k / candidate set against an exact reference (the ANN
  *     gate, q40/q48/q63). At 100 TB the reference comes from a
  *     deterministic SAMPLED query subset (exact top-k for the
  *     sample is one corpus scan, O(n·|sample|)), never the O(n²)
  *     full self-join.
  *   - [[rankErrorGate]] — empirical rank error of
  *     `percentile_approx` (GK summaries) against the data itself:
  *     a returned value's true rank is an INTERVAL under ties
  *     (count(<v)/n, count(<=v)/n); the sketch passes iff each
  *     requested quantile falls inside that interval widened by the
  *     1/accuracy guarantee (+ tie cushion). One conditional-
  *     aggregate pass over the input regardless of how many
  *     (group, quantile) checks ride along.
  */
object Gates {

  /** Pair-level recall of `approx` against `exact`, both keyed by
    * (queryCol, nnCol): |approx ∩ exact| / |exact|. ONE action — a
    * left join plus conditional count — and nothing is persisted, so
    * the gate leaves no cached blocks behind. `exact` is typically
    * small (|sample|·k rows) and broadcast-joins; `approx` runs once.
    * Empty reference gates vacuously at 1.0. */
  def pairRecall(
      approx: DataFrame,
      exact: DataFrame,
      queryCol: String = "query_id",
      nnCol: String = "nn_id"): Double = {
    // distinct BOTH sides: a duplicated pair would otherwise multiply
    // rows through the join and corrupt the counts (top-k outputs are
    // pair-unique, but the gate shouldn't trust its callers on that)
    val a = approx.select(
      col(queryCol).cast("long").as("query_id"),
      col(nnCol).cast("long").as("nn_id")).distinct()
    val stats = exact
      .select(col(queryCol).cast("long").as("query_id"),
        col(nnCol).cast("long").as("nn_id")).distinct()
      .join(a.withColumn("_hit", lit(1)), Seq("query_id", "nn_id"), "left")
      .agg(count(lit(1)).as("total"), count(col("_hit")).as("hits"))
      .head()
    val total = stats.getLong(0)
    if (total == 0L) 1.0 else stats.getLong(1).toDouble / total
  }

  /** Loud floor assertion shared by the gate call sites: logs the
    * measured value, then fails the whole job if it sits below the
    * floor — which is what turns a quality regression into a
    * correctness failure the driver's gate catches. */
  def requireFloor(metric: Double, floor: Double, what: String): Unit = {
    System.err.println(f"[graft] $what = $metric%.4f (floor $floor)")
    require(metric >= floor,
      f"$what = $metric%.4f below floor $floor — approximation regressed")
  }

  /** Empirical rank-error gate for `percentile_approx`: runs the
    * sketch at `accuracy` over `valueCol` per `groupCol` group, then
    * verifies IN ONE PASS over the data that every returned value's
    * rank interval [count(<v)/n − tol, count(<=v)/n + tol] contains
    * its requested quantile, tol = tieCushion/accuracy (the GK
    * guarantee is 1/accuracy; the cushion absorbs interpolation at
    * heavy ties). Throws if any check fails — the q40 recall-gate
    * pattern applied to sketch aggregates.
    *
    * The per-group approx values are collected: bounded by
    * `maxChecks` (groups × quantiles), the same loudness contract as
    * the other driver-side constants. Null values are excluded from
    * both the sketch and the rank denominators (percentile_approx
    * ignores them; the denominators must too). */
  def rankErrorGate(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      quantiles: Seq[Double],
      accuracy: Int = 1000,
      tieCushion: Double = 5.0,
      maxChecks: Int = 1000): Unit = {
    require(quantiles.nonEmpty, "rankErrorGate needs at least one quantile")
    val vcol = col(valueCol).cast("double")
    val d = df.filter(vcol.isNotNull)
    val approx = d.groupBy(groupCol)
      .agg(percentile_approx(vcol,
        array(quantiles.map(lit): _*), lit(accuracy)).as("ap"))
      .collect()
    if (approx.isEmpty) {
      // no non-null values anywhere: nothing the sketch could have
      // gotten wrong — vacuous pass, said out loud
      System.err.println(
        s"[graft] rankErrorGate($valueCol): empty input, vacuous pass")
      return
    }
    require(approx.length * quantiles.length <= maxChecks,
      s"rankErrorGate collected ${approx.length} groups x " +
        s"${quantiles.length} quantiles > maxChecks=$maxChecks — " +
        "gate on fewer groups or raise the bound explicitly")
    val checks = approx.flatMap { r =>
      val ap = r.getSeq[Double](1)
      quantiles.zipWithIndex.map { case (q, i) => (r.get(0), q, ap(i)) }
    }.toSeq
    val aggExprs = checks.zipWithIndex.flatMap { case ((g, _, v), i) =>
      val inG: Column = col(groupCol) <=> lit(g)
      val n = sum(when(inG, 1).otherwise(0))
      Seq(
        (sum(when(inG && vcol < v, 1).otherwise(0)).cast("double") / n)
          .as(s"_lt$i"),
        (sum(when(inG && vcol <= v, 1).otherwise(0)).cast("double") / n)
          .as(s"_le$i"))
    }
    val ranks = d.agg(aggExprs.head, aggExprs.tail: _*).head()
    val tol = tieCushion / accuracy
    checks.zipWithIndex.foreach { case ((g, q, v), i) =>
      val lo = ranks.getDouble(2 * i) - tol
      val hi = ranks.getDouble(2 * i + 1) + tol
      require(q >= lo && q <= hi,
        f"percentile_approx at ($g, $q) returned $v whose rank interval " +
          f"[$lo%.5f, $hi%.5f] misses q — sketch regressed")
    }
  }
}
