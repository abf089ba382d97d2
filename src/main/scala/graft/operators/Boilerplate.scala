package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level boilerplate detection (the C4-style cleanup pass):
  * n-grams that occur in an outsized fraction of documents are
  * navigation chrome, license headers, cookie banners — not content.
  * Training on them wastes capacity and skews n-gram statistics;
  * pipelines measure each document's boilerplate fraction and filter
  * or strip.
  *
  * Scale shape: the document-frequency aggregate is fully partial
  * (one shuffle keyed by gram), and the boilerplate gram set is
  * STRUCTURALLY bounded — a gram needs df ≥ minDocFrac·N, so there
  * can be at most (avg grams per doc) / minDocFrac of them regardless
  * of corpus size — which is what makes the per-doc scoring join a
  * safe broadcast at any N. */
object Boilerplate {

  private def grams(df: DataFrame, idCol: String, textCol: String, n: Int) = {
    val ngramsUdf = udf((t: String) =>
      if (t == null) Array.empty[String] else Kernels.wordNgrams(t, n))
    df.select(col(idCol).as("id"), explode(ngramsUdf(col(textCol))).as("g"))
  }

  /** The boilerplate vocabulary: distinct word n-grams present in at
    * least `minDocFrac` of ALL documents (null/short texts count in
    * the denominator): (g, df, doc_frac). */
  def boilerplateNgrams(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      minDocFrac: Double = 0.05): DataFrame = {
    require(minDocFrac > 0.0, "minDocFrac must be positive")
    val nDocs = df.agg(count(lit(1)).cast("double").as("n_docs"))
    grams(df, idCol, textCol, n)
      .groupBy("g").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      .filter(col("df").cast("double") >= lit(minDocFrac) * col("n_docs"))
      .select(col("g"), col("df"),
        (col("df").cast("double") / col("n_docs")).as("doc_frac"))
  }

  /** Inter-source overlap matrix — the provenance audit that catches
    * mirrored/scraped-twice corpora before dedup wastes a full pass on
    * them: for every pair of sources, how many distinct n-grams they
    * share. Shape: distinct (source, gram) pairs (one partial-agg
    * shuffle), then a gram-keyed self-join whose fan-out per gram is
    * bounded by the number of SOURCES sharing it (sources², not
    * docs²) — a gram shared by every source costs |sources|² rows,
    * never |docs|². Output: (source_a, source_b, shared_grams),
    * source_a < source_b. */
  def sourceOverlap(
      df: DataFrame,
      sourceCol: String,
      textCol: String,
      n: Int = 3): DataFrame = {
    val ngramsUdf = udf((t: String) =>
      if (t == null) Array.empty[String] else Kernels.wordNgrams(t, n))
    val sg = df.select(col(sourceCol).as("src"), col(textCol).as("t"))
      .select(col("src"), explode(ngramsUdf(col("t"))).as("g"))
      .distinct()
    sg.as("a").join(sg.as("b"),
        col("a.g") === col("b.g") && col("a.src") < col("b.src"))
      .groupBy(col("a.src").as("source_a"), col("b.src").as("source_b"))
      .agg(count(lit(1)).as("shared_grams"))
  }

  /** Per-document boilerplate report:
    * (id, n_grams, n_boiler, boiler_frac) — n_grams is the doc's
    * distinct n-gram count, n_boiler how many of those are in the
    * boilerplate vocabulary, boiler_frac their ratio (0 for docs with
    * no grams). Filter on boiler_frac to drop chrome-dominated docs. */
  def boilerplateScore(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      minDocFrac: Double = 0.05): DataFrame = {
    val g = grams(df, idCol, textCol, n)
    val boiler = boilerplateNgrams(df, idCol, textCol, n, minDocFrac)
      .select("g")
    val hits = g.join(broadcast(boiler), Seq("g"), "left_semi")
      .groupBy("id").agg(count(lit(1)).as("n_boiler"))
    val totals = g.groupBy("id").agg(count(lit(1)).as("n_grams"))
    df.select(col(idCol).as("id"))
      .join(totals, Seq("id"), "left")
      .join(hits, Seq("id"), "left")
      .select(
        col("id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_boiler"), lit(0L)).as("n_boiler"))
      .withColumn("boiler_frac",
        when(col("n_grams") === 0L, lit(0.0))
          .otherwise(col("n_boiler").cast("double") /
            col("n_grams").cast("double")))
  }
}
