package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Test-set decontamination — the step every serious training-data
  * pipeline runs before a model ever sees the corpus: find (and drop)
  * training documents that overlap a held-out evaluation set, so
  * benchmark numbers measure generalization rather than memorization.
  * Reference method: n-gram collision (as published for GPT-2/GPT-3
  * and the standard since) — a training document is contaminated if
  * any of its word n-grams appears in any evaluation document.
  *
  * Scale shape: the evaluation side is ALWAYS tiny relative to the
  * corpus (benchmarks are KBs–MBs; the corpus is the 100 TB side), so
  * the distinct test-gram set broadcasts, the train side streams one
  * n-gram explode through a broadcast semi-join, and the per-doc hit
  * count is a partial-aggregated groupBy on the (already filtered,
  * usually near-empty) collision stream. The corpus is never
  * shuffled; row bodies move only in the final keep/drop semi-join
  * keyed on the id. */
object Decontaminate {

  private def ngramsUdf(n: Int) = udf((t: String) =>
    if (t == null) Array.empty[String] else Kernels.wordNgrams(t, n))

  private def grams(df: DataFrame, idCol: String, textCol: String, n: Int) =
    df.select(col(idCol).as("id"), explode(ngramsUdf(n)(col(textCol))).as("g"))

  /** The benchmark side's distinct grams — no id column riding along. */
  private def testGramSet(test: DataFrame, testTextCol: String, n: Int) =
    test.select(explode(ngramsUdf(n)(col(testTextCol))).as("g")).distinct()

  /** Per-training-document contamination report:
    * (id, n_shared, contaminated) — n_shared counts the DISTINCT
    * train-doc n-grams that also occur anywhere in the evaluation
    * set; every training row appears exactly once (n_shared 0 when
    * clean, including docs shorter than n words). */
  def contaminationReport(
      train: DataFrame,
      trainId: String,
      trainText: String,
      test: DataFrame,
      testText: String,
      n: Int = 8): DataFrame = {
    val testGrams = testGramSet(test, testText, n)
    val hits = grams(train, trainId, trainText, n)
      .join(broadcast(testGrams), Seq("g"), "left_semi")
      .groupBy("id").agg(count(lit(1)).as("n_shared"))
    train.select(col(trainId).as("id"))
      .join(hits, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"))
      .withColumn("contaminated", col("n_shared") > 0)
  }

  /** The enforcement end: keep only clean training rows. One
    * broadcast-semi-join gram pass to find contaminated ids, one
    * anti join keyed on the id to drop them — document bodies are
    * read once and never shuffled. */
  def removeContaminated(
      train: DataFrame,
      trainId: String,
      trainText: String,
      test: DataFrame,
      testText: String,
      n: Int = 8): DataFrame = {
    val testGrams = testGramSet(test, testText, n)
    val dirty = grams(train, trainId, trainText, n)
      .join(broadcast(testGrams), Seq("g"), "left_semi")
      .select("id").distinct()
    train.join(dirty, train(trainId) === dirty("id"), "left_anti")
  }

  /** Bloom-prefiltered contamination candidates + the exact verify
    * join — shared plumbing for the *Bloom variants. Returns per-doc
    * hit counts (id, n_shared) over EXACTLY the true collisions. */
  private def bloomHits(
      train: DataFrame, trainId: String, trainText: String,
      test: DataFrame, testText: String, n: Int, fpp: Double): DataFrame = {
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0,1), got $fpp")
    val testGrams = testGramSet(test, testText, n)
    val nGrams = testGrams.count()
    val bf = testGrams.stat.bloomFilter("g", math.max(nGrams, 1L), fpp)
    val bfB = train.sparkSession.sparkContext.broadcast(bf)
    val mightUdf = udf((g: String) => bfB.value.mightContainString(g))
    // the corpus gram stream collapses to true hits + ~fpp noise
    // BEFORE any join — so the exact verify below joins a near-empty
    // stream and need not broadcast the full gram set
    val candidates = grams(train, trainId, trainText, n)
      .filter(mightUdf(col("g")))
    candidates.join(testGrams, Seq("g"), "left_semi")
      .groupBy("id").agg(count(lit(1)).as("n_shared"))
  }

  /** [[contaminationReport]] with a Bloom-filter pre-pass — the
    * BIG-benchmark-set spelling: when the held-out side has millions
    * of distinct grams, broadcasting them as strings is GBs per
    * executor, but a Bloom filter at `fpp` is ~1.2 bytes/gram — the
    * corpus gram stream tests membership against the broadcast sketch
    * first, collapsing to true hits plus an fpp-fraction of noise,
    * and only that near-empty stream reaches the EXACT verify join
    * (which Catalyst is free to shuffle — its stream side is tiny
    * now, so the full gram set never needs to broadcast). The verify
    * keeps the output bitwise EQUAL to [[contaminationReport]] —
    * Bloom filters have no false negatives, and the false positives
    * die in the verify — DecontaminateSpec pins the equality, and
    * q106 runs this path against q70's exact oracle. */
  def contaminationReportBloom(
      train: DataFrame,
      trainId: String,
      trainText: String,
      test: DataFrame,
      testText: String,
      n: Int = 8,
      fpp: Double = 0.01): DataFrame = {
    val hits = bloomHits(train, trainId, trainText, test, testText, n, fpp)
    train.select(col(trainId).as("id"))
      .join(hits, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"))
      .withColumn("contaminated", col("n_shared") > 0)
  }

  /** [[removeContaminated]] through the same Bloom pre-pass; output
    * rows identical (spec-pinned). */
  def removeContaminatedBloom(
      train: DataFrame,
      trainId: String,
      trainText: String,
      test: DataFrame,
      testText: String,
      n: Int = 8,
      fpp: Double = 0.01): DataFrame = {
    val dirty = bloomHits(train, trainId, trainText, test, testText, n, fpp)
      .select("id").distinct()
    train.join(dirty, train(trainId) === dirty("id"), "left_anti")
  }
}
