package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucket-size capping for LSH-style candidate generation.
  *
  * Every bucketed self-join (MinHash bands, sign-sketch tables,
  * SimHash blocks) generates O(|bucket|²) pairs per bucket. One
  * degenerate bucket — an embedding farm of near-identical vectors,
  * all-zero vectors, boilerplate documents — turns into a single
  * straggler task that dominates the stage at 100 TB. Standard LSH
  * practice caps the bucket size; this helper SPLITS oversized
  * buckets instead of dropping them: members are spread across
  * ceil(n / maxBucketSize) sub-buckets by a content hash, so per-task
  * work is bounded by O(maxBucketSize²) while intra-sub-bucket pairs
  * (and therefore most duplicate mass — a degenerate bucket's members
  * still pair within their sub-bucket) are retained. Pairs that land
  * in different sub-buckets of the same oversized bucket are lost in
  * THAT bucket only; multi-table/multi-band schemes get independent
  * split boundaries per table (the bucket key feeds the sub-hash), so
  * a pair split apart in one table can still collide in another.
  *
  * Determinism: the sub-bucket is pmod(xxhash64(bucket key, id), n) —
  * pure row content, stable under stage retries and AQE re-plans
  * (the same discipline as [[Skew.saltedSum]]).
  *
  * Observability: [[oversized]] reports exactly which buckets were
  * split and how; callers surface it for monitoring rather than
  * silently truncating coverage.
  */
object Buckets {

  /** Per-bucket membership counts of buckets over the cap:
    * (bucketCols..., bucket_n, n_splits). Cheap: one partial-agg
    * shuffle of (bucket key, count) pairs, output rows ≤ n/cap. */
  def oversized(
      bucketed: DataFrame,
      bucketCols: Seq[String],
      maxBucketSize: Int): DataFrame = {
    require(maxBucketSize > 0, "maxBucketSize must be positive")
    bucketed
      .groupBy(bucketCols.map(col): _*)
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") > maxBucketSize)
      .withColumn("n_splits",
        ceil(col("bucket_n").cast("double") / maxBucketSize).cast("long"))
  }

  /** Adds a `_sub` split column: 0 for rows of within-cap buckets,
    * hash(bucket key, id) mod n_splits for oversized ones. Join on
    * (bucketCols..., _sub) instead of bucketCols alone.
    *
    * Spelled as ONE window count over the bucket key — a single
    * shuffle of the assignments, no second aggregate branch and no
    * join back (the groupBy+join spelling re-evaluated the bucketed
    * input once per branch). The window partition per bucket is a
    * linear count, so even the degenerate bucket this helper exists
    * for costs O(|bucket|) here, never O(|bucket|²). */
  def capped(
      bucketed: DataFrame,
      bucketCols: Seq[String],
      idCol: String,
      maxBucketSize: Int): DataFrame = {
    require(maxBucketSize > 0, "maxBucketSize must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(bucketCols.map(col): _*)
    val nSplits = ceil(
      count(lit(1)).over(w).cast("double") / maxBucketSize).cast("long")
    bucketed.withColumn("_sub",
      when(nSplits <= 1L, lit(0L))
        .otherwise(pmod(
          xxhash64((bucketCols.map(col) :+ col(idCol)): _*),
          nSplits)))
  }
}
