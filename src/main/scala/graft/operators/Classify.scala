package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed training for the classic LLM-corpus quality filter —
  * a logistic-regression classifier over cheap surface features (the
  * fastText-style quality/junk screen every published pretraining
  * pipeline runs somewhere between dedup and tokenization). Training
  * is full-batch gradient descent: one aggregate job per iteration,
  * weights live on the driver as a handful of scalars, the corpus is
  * never collected. The reference engine could express one gradient
  * step as a map+reduce pass (`Imagine_MapReduce/Mapper.h:268-270` +
  * `MapReduceUtil.cpp:114-135`); the iteration loop is exactly the
  * job-chaining its users hand-roll over successive
  * `MapReduceMaster::MapReduce` submissions
  * (`MapReduceMaster.cpp:36-58`) — here it is the operator.
  *
  * DETERMINISM (the whole design): a float gradient SUM over a
  * shuffled corpus is order-nondeterministic, so naive distributed
  * GD is unreproducible run-to-run, let alone cross-engine. This
  * operator quantizes instead:
  *
  *   - features arrive as 6-decimal faces (exact DECIMAL(18,6));
  *   - per-row sigmoid σ(z) is rounded to 6 decimals (the repo's
  *     exp face — z itself is one fixed IEEE chain over exact
  *     doubles);
  *   - per-row gradient terms (σ₆ − y)·x_j are EXACT decimal
  *     products, summed in DECIMAL(38,12) — order-free,
  *     partition-proof, bitwise cross-engine;
  *   - the weight update w′ = round(w − lr·(Σ/n), 6) is one IEEE
  *     chain per weight, re-quantized to 6 decimals so the next
  *     iteration starts from a cross-engine-identical literal.
  *
  * This is quantized GD: each step's direction is the exact batch
  * gradient of the true loss at 6-decimal weight resolution — the
  * quantization noise (≤ 5e-7 per weight per step) is orders of
  * magnitude below any learning-relevant signal for O(1)-scaled
  * features, and what it buys is an oracle that can replay TRAINING
  * ITSELF, iteration by iteration, to hash equality.
  *
  * Scale shape: per iteration ONE fully partial-aggregated pass
  * (k+2 decimal sums), nothing else; the input is cached across
  * iterations (iterations ≤ 10, loud). At 100 TB the cost is
  * `iterations` scans of the feature frame — which is why the
  * feature frame should be the slim projected one, not the corpus.
  *
  * Output: one row per iteration, (iter, n, mae, b0,
  * w_<feature>...) — mae is the mean |σ₆ − y| training residual the
  * step descended on (iteration start); the weights are POST-step,
  * so the last row is the trained model. */
object Classify {

  def logisticGD(
      df: DataFrame,
      labelCol: String,
      featureCols: Seq[String],
      lr: Double = 0.5,
      iterations: Int = 3): DataFrame = {
    require(featureCols.nonEmpty && featureCols.size <= 16,
      s"featureCols must have 1..16 entries, got ${featureCols.size}")
    require(lr > 0.0 && lr <= 10.0, s"lr must be in (0, 10], got $lr")
    require(iterations >= 1 && iterations <= 10,
      s"iterations must be in [1, 10], got $iterations")
    val spark = df.sparkSession
    val dec = DecimalType(18, 6)
    val keep = featureCols.map(col(_).isNotNull)
      .foldLeft(col(labelCol).isNotNull)(_ && _)
    val base = df.filter(keep)
      .select(col(labelCol).cast("long").as("_y") +:
        featureCols.zipWithIndex.map { case (f, i) =>
          col(f).cast("double").as(s"_x$i")
        }: _*)
      .persist()
    try {
      val stats = base.agg(count(lit(1)).as("n"),
        min(col("_y")).as("lo"), max(col("_y")).as("hi")).head()
      val n = stats.getLong(0)
      require(n > 0L, "logisticGD: no complete rows to train on")
      require(stats.getLong(1) >= 0L && stats.getLong(2) <= 1L,
        s"logisticGD: label must be 0/1, saw [${stats.getLong(1)}, " +
          s"${stats.getLong(2)}]")
      def q6(x: Double): Double =
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble
      var w = Array.fill(featureCols.size + 1)(0.0)
      val out = Seq.newBuilder[Row]
      for (it <- 1 to iterations) {
        // z: one fixed left-associated IEEE chain over exact doubles
        var z: Column = lit(w(0))
        featureCols.indices.foreach { j =>
          z = z + lit(w(j + 1)) * col(s"_x$j")
        }
        val s6 = round(lit(1.0) / (lit(1.0) + exp(-z)), 6)
        val diff = s6.cast(dec) - col("_y").cast(dec)
        val aggCols =
          sum(diff).as("_g0") +:
            featureCols.indices.map { j =>
              sum(diff * col(s"_x$j").cast(dec)).as(s"_g$j")
            } :+ sum(abs(diff)).as("_mae")
        val r = base.agg(aggCols.head, aggCols.tail: _*).head()
        val mae = q6(
          r.getDecimal(0 + featureCols.size + 1).doubleValue / n)
        val g = (0 to featureCols.size).map { j =>
          r.getDecimal(j).doubleValue / n
        }
        w = w.indices.map(j => q6(w(j) - lr * g(j))).toArray
        // the row reports the POST-step weights next to the mae the
        // step descended on — the final row IS the trained model
        out += Row(
          (it.toLong +: n.toLong +: mae +: w.toSeq): _*)
      }
      val schema = StructType(
        Seq(StructField("iter", LongType, nullable = false),
          StructField("n", LongType, nullable = false),
          StructField("mae", DoubleType, nullable = false),
          StructField("b0", DoubleType, nullable = false)) ++
          featureCols.map(f =>
            StructField(s"w_$f", DoubleType, nullable = false)))
      spark.createDataFrame(
        java.util.Arrays.asList(out.result(): _*), schema)
    } finally base.unpersist()
  }

  /** Apply a trained model: appends `score` = σ₆(b0 + Σ w_j·x_j) —
    * the same quantized sigmoid spelling training used, so a scored
    * corpus is reproducible by the oracle that replayed training.
    * `weights` is (b0, w_1..w_k) aligned with `featureCols` — the
    * tail of [[logisticGD]]'s last row. */
  def score(
      df: DataFrame,
      featureCols: Seq[String],
      weights: Seq[Double]): DataFrame = {
    require(weights.size == featureCols.size + 1,
      s"weights must be (b0, one per feature): expected " +
        s"${featureCols.size + 1}, got ${weights.size}")
    var z: Column = lit(weights.head)
    featureCols.zipWithIndex.foreach { case (f, j) =>
      z = z + lit(weights(j + 1)) * col(f).cast("double")
    }
    df.withColumn("score", round(lit(1.0) / (lit(1.0) + exp(-z)), 6))
  }

  /** ROC AUC of a score against a 0/1 label — the classifier-quality
    * readout, computed as the midrank Mann–Whitney identity
    * AUC = U/(n₊·n₋) over [[Profile.rankSumTest]]'s exact-integer
    * doubled-rank machinery (window-free two-phase prefix sums, tie
    * midranks exact): the AUC itself is ONE IEEE division at the
    * 6-decimal face. Null scores are rejected loudly by the rank
    * machinery; auc is null when either class is empty.
    *
    * Output: one row (n_pos, n_neg, auc). */
  def aucReport(
      df: DataFrame,
      labelCol: String,
      scoreCol: String): DataFrame = {
    val lbl = df.select(
      when(col(labelCol).cast("long") === 1L, lit("pos"))
        .otherwise(lit("neg")).as("_g"),
      col(scoreCol).as("_s"))
    Profile.rankSumTest(lbl, "_g", "_s", "pos", "neg")
      .select(col("n_a").as("n_pos"), col("n_b").as("n_neg"),
        when(col("n_a") > 0L && col("n_b") > 0L,
          round(col("u2_a").cast("double") /
            (lit(2.0) * (col("n_a") * col("n_b")).cast("double")), 6))
          .as("auc"))
  }

  /** Operating-point sweep — precision/recall/F1 at each candidate
    * threshold, the table a curator reads to PICK the cutoff (AUC
    * says the model ranks well; it does not say where to cut).
    * All four confusion counts are exact integers from ONE
    * conditional-aggregation pass over a bounded threshold fan-out
    * (k ≤ 64 thresholds ride an exploded literal array — k·n rows
    * into a fully partial agg, no per-threshold jobs); precision,
    * recall, and F1 = 2tp/(2tp+fp+fn) are each ONE IEEE division at
    * the 6-decimal face, null when their denominator is empty
    * (undecidable, not 0). Predictions are `score >= t` over
    * 6-decimal score faces, so the comparison is cross-engine
    * stable.
    *
    * Output per threshold: (threshold, tp, fp, fn, tn, precision,
    * recall, f1). */
  def thresholdSweep(
      df: DataFrame,
      labelCol: String,
      scoreCol: String,
      thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty && thresholds.size <= 64,
      s"thresholds must have 1..64 entries, got ${thresholds.size}")
    require(thresholds.forall(t => t >= 0.0 && t <= 1.0),
      "thresholds must lie in [0, 1]")
    require(thresholds.distinct.size == thresholds.size,
      "thresholds must be distinct")
    val fan = df.select(
      col(labelCol).cast("long").as("_y"),
      col(scoreCol).cast("double").as("_s"),
      explode(array(thresholds.map(lit): _*)).as("threshold"))
    fan.groupBy("threshold")
      .agg(
        sum(when(col("_s") >= col("threshold") && col("_y") === 1L,
          1L).otherwise(0L)).as("tp"),
        sum(when(col("_s") >= col("threshold") && col("_y") =!= 1L,
          1L).otherwise(0L)).as("fp"),
        sum(when(col("_s") < col("threshold") && col("_y") === 1L,
          1L).otherwise(0L)).as("fn"),
        sum(when(col("_s") < col("threshold") && col("_y") =!= 1L,
          1L).otherwise(0L)).as("tn"))
      .select(col("threshold"), col("tp"), col("fp"), col("fn"),
        col("tn"),
        when(col("tp") + col("fp") > 0L,
          round(col("tp").cast("double") /
            (col("tp") + col("fp")).cast("double"), 6))
          .as("precision"),
        when(col("tp") + col("fn") > 0L,
          round(col("tp").cast("double") /
            (col("tp") + col("fn")).cast("double"), 6))
          .as("recall"),
        when(lit(2L) * col("tp") + col("fp") + col("fn") > 0L,
          round((lit(2L) * col("tp")).cast("double") /
            (lit(2L) * col("tp") + col("fp") + col("fn"))
              .cast("double"), 6))
          .as("f1"))
  }

  /** Per-subgroup ROC AUC — the model FAIRNESS audit for a corpus
    * filter: a quality classifier whose AUC collapses on one
    * language or source is silently deleting that slice, which is
    * the number a curator needs BEFORE applying the filter, not
    * after. Same exact-integer midrank identity as [[aucReport]],
    * partitioned: counts collapse to (group, distinct score) rows —
    * at most 1e6+1 six-decimal score faces per group, so the
    * per-group cumulative window runs over a structurally bounded
    * frame, never raw rows. One-class groups (all-positive /
    * all-negative) emit null auc — undecidable, not 0.5. Null
    * groups drop; null scores fail loudly (ranks cannot order
    * them).
    *
    * Output per group: (group, n_pos, n_neg, auc). */
  def aucByGroup(
      df: DataFrame,
      groupCol: String,
      labelCol: String,
      scoreCol: String): DataFrame = {
    val base = df.filter(col(groupCol).isNotNull)
    val nNull = base.filter(col(scoreCol).isNull).limit(1).count()
    require(nNull == 0L,
      s"aucByGroup: null $scoreCol values — ranks cannot order " +
        "nulls; filter or impute them explicitly")
    val counts = base
      .groupBy(col(groupCol).as("_g"), col(scoreCol).as("_s"))
      .agg(count(lit(1)).as("_cnt"),
        sum(when(col(labelCol).cast("long") === 1L, 1L)
          .otherwise(0L)).as("_cp"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("_g").orderBy("_s")
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    counts
      .withColumn("_cum", sum(col("_cnt")).over(w))
      .groupBy("_g")
      .agg(sum(col("_cp")).as("n_pos"),
        sum(col("_cnt") - col("_cp")).as("n_neg"),
        sum(col("_cp") * (lit(2L) * col("_cum") - col("_cnt") + 1L))
          .as("_r2a"))
      .select(col("_g").as(groupCol), col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0L && col("n_neg") > 0L,
          round((col("_r2a") - col("n_pos") * (col("n_pos") + 1L))
            .cast("double") /
            (lit(2.0) * (col("n_pos") * col("n_neg")).cast("double")),
            6)).as("auc"))
  }
}
