package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.TextFunctions

/** Corpus-level term weighting: TF-IDF and the per-document top
  * keyword extraction built on it — the relevance/keyword primitive a
  * curation pipeline uses for topic tagging, near-boilerplate
  * detection, and retrieval indexing.
  *
  * Two passes over a token explode, both fully partial-aggregated:
  * term frequencies shuffle on (id, term), document frequencies on
  * term. The document count rides along as a broadcast single-row
  * aggregate, never a driver-side action. Skew note: a pathological
  * term (empty-string, boilerplate token) concentrates its posting
  * list on one reducer — document frequency is a count, so the
  * map-side partial agg already collapses each partition's
  * contribution to one row per term; no salting needed.
  *
  * The idf factor is the RECIPROCAL form n_docs/df (not log(n/df)):
  * IEEE division is identically rounded on every engine while libm
  * log is not, so scores — and therefore rankings — are bit-for-bit
  * reproducible cross-engine (the q71 oracle recomputes them in
  * DuckDB). Monotone in 1/df like the log form, so top-k per doc
  * selects the same "rare here, frequent in doc" terms. */
object TfIdf {

  /** (id, term, tf, df, score) for every (document, term) pair:
    * tf = occurrences of term in the doc, df = number of docs
    * containing the term, score = tf · n_docs / df. */
  def termScores(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode(TextFunctions.words(col(textCol))).as("term"))
    val tf = toks.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = toks.select("id", "term").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = df.agg(count(lit(1)).as("n_docs"))
    tf.join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .select(col("id"), col("term"), col("tf"), col("df"),
        (col("tf").cast("double") * col("n_docs").cast("double") /
          col("df").cast("double")).as("score"))
  }

  /** Top-k scoring terms per document, rank 1 = best, ties broken by
    * term so the ranking is total and deterministic:
    * (id, rank, term, tf, df, score). */
  def topTerms(
      df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy("id")
      .orderBy(col("score").desc, col("term"))
    termScores(df, idCol, textCol)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("id", "rank", "term", "tf", "df", "score")
  }
}
