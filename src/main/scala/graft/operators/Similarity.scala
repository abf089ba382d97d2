package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`array<float>`),
  * SURVEY §7.2 M4. Two paths:
  *
  *   - [[bruteForceTopK]] — the exact baseline: broadcast the (small)
  *     query set against the full corpus, one scan, per-query top-k via
  *     window rank. Linear in corpus size, no corpus shuffle at all
  *     when the query side broadcasts.
  *   - [[annTopK]] — the scale path: random-hyperplane LSH buckets
  *     (sign sketch); only bucket-mates are scored. Sub-linear
  *     candidate generation, tunable recall via tables × bits.
  *
  * The cosine kernel is a pure Catalyst expression chain
  * (`zip_with` + `aggregate`): stays in whole-stage codegen, and —
  * load-bearing for the DuckDB oracle — float operands are cast to
  * double and summed strictly left-to-right, which is exactly what a
  * sequential SQL engine does, so scores agree bitwise across engines.
  */
object Similarity {

  /** Sequential-fold dot product in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Euclidean norm, same fold discipline. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in [-1, 1]; 0 for zero vectors. */
  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0.0, lit(0.0)).otherwise(dot(a, b) / d)
  }

  /** Exact top-k nearest neighbors by cosine for each query vector.
    * `queries` must be small enough to broadcast (it is hash-joined
    * against every corpus row); the corpus side streams — one scan,
    * no shuffle of corpus vectors. Ties broken by corpus id so rank
    * is total and deterministic. */
  def bruteForceTopK(
      corpus: DataFrame,
      corpusId: String,
      corpusVec: String,
      queries: DataFrame,
      queryId: String,
      queryVec: String,
      k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    val c = corpus.select(col(corpusId).as("nn_id"), col(corpusVec).as("cv"))
    val q = queries.select(col(queryId).as("query_id"), col(queryVec).as("qv"))
    val joined = c.join(broadcast(q),
      if (excludeSelf) col("nn_id") =!= col("query_id") else lit(true))
    val scored = joined.select(
      col("query_id"), col("nn_id"),
      cosine(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("nn_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("nn_id"), col("cos"))
  }

  /** Deterministic random hyperplanes: `tables` sketch tables of
    * `bits` hyperplanes each, components from a fixed-seed LCG
    * (reproducible across runs/JVMs — no global RNG). */
  private[operators] def hyperplanes(
      tables: Int, bits: Int, dim: Int, seed: Long): Array[Array[Array[Double]]] = {
    var s = seed
    def next(): Double = {
      // 64-bit LCG (MMIX constants), mapped to [-1, 1)
      s = s * 6364136223846793005L + 1442695040888963407L
      (s >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
    }
    Array.fill(tables, bits, dim)(next())
  }

  /** Sign-sketch bucket key for one table: bit j = sign(v · h_j),
    * packed into a long. Hyperplanes are literal arrays (broadcast in
    * the plan as constants — no driver-side state, no UDF). */
  private def bucketKey(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.foldLeft(lit(0L)) { case (acc, (p, j)) =>
      val h = array(p.map(lit): _*)
      acc + when(dot(vec, h) >= 0.0, lit(1L << j)).otherwise(0L)
    }

  /** Candidate pairs that share an LSH bucket in any table —
    * the sub-quadratic front end for near-dup / ANN at scale.
    * Output: (id_a, id_b) distinct, id_a < id_b. */
  def annCandidates(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      tables: Int = 8,
      bits: Int = 12,
      dim: Int = 64,
      seed: Long = 42L): DataFrame = {
    val hp = hyperplanes(tables, bits, dim, seed)
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    val bucketed = v.select(
      col("id"),
      explode(array(hp.indices.map(t =>
        struct(lit(t).as("tbl"), bucketKey(col("v"), hp(t)).as("bkt"))): _*))
        .as("tb"))
      .select(col("id"), col("tb.tbl").as("tbl"), col("tb.bkt").as("bkt"))
    bucketed.as("l")
      .join(bucketed.as("r"),
        col("l.tbl") === col("r.tbl") && col("l.bkt") === col("r.bkt") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
  }

  /** Approximate top-k: score only same-bucket candidates, then rank.
    * Recall is tunable via (tables, bits); a spec measures it against
    * [[bruteForceTopK]] on the fixture data. */
  def annTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      tables: Int = 8,
      bits: Int = 10,
      dim: Int = 64,
      seed: Long = 42L): DataFrame = {
    val cand = annCandidates(df, idCol, vecCol, tables, bits, dim, seed)
    // candidates are undirected; score both directions for per-id top-k
    val sym = cand.select(col("id_a").as("query_id"), col("id_b").as("nn_id"))
      .unionAll(cand.select(col("id_b").as("query_id"), col("id_a").as("nn_id")))
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    val scored = sym
      .join(v.as("q"), col("query_id") === col("q.id"))
      .join(v.as("c"), col("nn_id") === col("c.id"))
      .select(col("query_id"), col("nn_id"),
        cosine(col("q.v"), col("c.v")).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("nn_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("nn_id"), col("cos"))
  }
}
