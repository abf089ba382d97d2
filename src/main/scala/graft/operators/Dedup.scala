package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.TextFunctions

/** Deduplication operators for training-data pipelines (SURVEY §7.2 M4),
  * each designed shuffle-light for the 100 TB posture:
  *
  *   - exact:        one hash-aggregate over md5(text) — a single
  *                   shuffle keyed by digest, no row data moved twice;
  *   - n-gram Jaccard: inverted-index self-join (explode n-grams, join
  *                   on the n-gram, count co-occurrences) — never a
  *                   cross join; fan-out bounded by n-gram document
  *                   frequency, skew handled by AQE;
  *   - MinHash+LSH:  shingle → k hash mins → band → bucket join; only
  *                   same-bucket pairs are candidates, then exact
  *                   Jaccard verification removes LSH false positives.
  *                   Probability of missing a pair at similarity s is
  *                   (1-s^r)^b — with r=4,b=32 a 0.9-similar pair is
  *                   missed with p≈1e-15;
  *   - SimHash:      64-bit sign fingerprint; pigeonhole banding on 4×
  *                   16-bit blocks finds all pairs within Hamming
  *                   distance 3 without a cross join;
  *   - embedding cosine: exact pairwise baseline (quadratic — only for
  *                   bounded candidate sets; the scale path is
  *                   [[Similarity.annCandidates]] LSH bucketing).
  *
  * No operator collects to the driver; every intermediate is a
  * DataFrame that partitions by its join/group key.
  */
object Dedup {

  /** Exact duplicate groups by content digest. Output: one row per
    * distinct content (digest, representative id = min, count).
    * The 100 TB shape: shuffle carries only (digest, id). */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), md5(col(textCol)).as("content_hash"))
      .groupBy("content_hash")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Exact-dedup projection: keeps the minimum-id row of each content
    * group (the usual "keep first" policy), via one window. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** Distinct word-n-gram sets per document: (id, ngrams, set size). */
  private def ngramSets(
      df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(
      col(idCol).as("id"),
      TextFunctions.wordNgrams(col(textCol), n).as("ngrams"))
      .withColumn("set_size", size(col("ngrams")))

  /** Exact n-gram Jaccard similarity for every pair with J >= minJ,
    * via inverted index (explode + equi-join on the n-gram), never a
    * cross join. Output: (id_a, id_b, jaccard) with id_a < id_b.
    *
    * Scale notes: the join key is the n-gram string, so fan-out is
    * sum over n-grams of df(g)^2; stopword-like shingles are the skew
    * risk — AQE skew-join splits them, and a df-cap filter (drop
    * n-grams appearing in > maxDf docs) bounds the worst case the way
    * prefix filtering does in set-similarity joins. */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      minJ: Double = 0.5,
      maxDf: Option[Int] = None): DataFrame = {
    val sets = ngramSets(df, idCol, textCol, n)
    val posting0 = sets.select(col("id"), explode(col("ngrams")).as("g"))
    val posting = maxDf match {
      case Some(cap) =>
        val wdf = Window.partitionBy("g")
        posting0.withColumn("_df", count(lit(1)).over(wdf))
          .filter(col("_df") <= cap).drop("_df")
      case None => posting0
    }
    val co = posting.as("l")
      .join(posting.as("r"), col("l.g") === col("r.g") &&
        col("l.id") < col("r.id"))
      .groupBy(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    val sz = sets.select(col("id"), col("set_size"))
    co.join(sz.as("sa"), col("id_a") === col("sa.id"))
      .join(sz.as("sb"), col("id_b") === col("sb.id"))
      .select(
        col("id_a"), col("id_b"),
        (col("inter").cast("double") /
          (col("sa.set_size") + col("sb.set_size") - col("inter")))
          .as("jaccard"))
      .filter(col("jaccard") >= minJ)
  }

  /** MinHash signature column: for hash index i, the minimum over the
    * doc's shingles of xxhash64(i, shingle) — k independent
    * permutation proxies, all inside codegen (no UDF). */
  def minHashSignature(ngrams: Column, numHashes: Int): Column =
    transform(
      sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(ngrams, s => xxhash64(i, s))))

  /** MinHash + LSH near-duplicate pairs with exact verification.
    *
    * Pipeline: shingle → k=bands*rowsPerBand minhashes → per-band
    * bucket key hash(band slice) → explode bands → self-join on
    * (band, bucket) → distinct candidate pairs → exact Jaccard on the
    * shingle sets → filter >= minJ.
    *
    * Only bucket-mates ever meet, so the join cost tracks collision
    * counts, not |df|^2; the verification join re-reads only candidate
    * rows' shingle arrays. */
  def minHashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      bands: Int = 32,
      rowsPerBand: Int = 4,
      minJ: Double = 0.5): DataFrame = {
    val sets = ngramSets(df, idCol, textCol, n)
      .filter(col("set_size") > 0)
    val sig = sets.withColumn(
      "sig", minHashSignature(col("ngrams"), bands * rowsPerBand))
    val banded = sig.select(
      col("id"),
      explode(
        transform(
          sequence(lit(0), lit(bands - 1)),
          b => struct(
            b.as("band"),
            // bucket = hash of this band's slice of the signature
            xxhash64(b, slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)))
              .as("bucket"))))
        .as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val candidates = banded.as("l")
      .join(banded.as("r"),
        col("l.band") === col("r.band") &&
          col("l.bucket") === col("r.bucket") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
    val g = sets.select(col("id"), col("ngrams"), col("set_size"))
    candidates
      .join(g.as("ga"), col("id_a") === col("ga.id"))
      .join(g.as("gb"), col("id_b") === col("gb.id"))
      .select(
        col("id_a"), col("id_b"),
        (size(array_intersect(col("ga.ngrams"), col("gb.ngrams"))).cast("double") /
          size(array_union(col("ga.ngrams"), col("gb.ngrams"))))
          .as("jaccard"))
      .filter(col("jaccard") >= minJ)
  }

  /** 64-bit SimHash of the word stream: bit b of the fingerprint is
    * the sign of sum over tokens of ±1 according to bit b of
    * xxhash64(token). Pure expression tree (64 parallel aggregates
    * fused by codegen into one pass over the token array). */
  def simHash(textCol: Column): Column = {
    val hashes = transform(TextFunctions.words(textCol), w => xxhash64(w))
    // shiftright's Scala binding wants an Int shift; the band/bit index
    // here is a lambda variable, so go through the SQL function.
    def shr(x: Column, bits: Column): Column =
      call_function("shiftright", x, bits)
    val bits = transform(
      sequence(lit(0), lit(63)),
      b => when(
        aggregate(hashes, lit(0L),
          (acc, h) => acc +
            when(shr(h, b).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
          > 0, 1L).otherwise(0L))
    aggregate(bits, lit(0L), (acc, bit) => shiftleft(acc, 1) + bit)
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column =
    call_function("bit_count", a.bitwiseXOR(b)).cast("long")

  /** SimHash near-dup pairs within Hamming distance maxHamming:
    * pigeonhole banding on (maxHamming+1) blocks — a pair within
    * distance d differs in at most d blocks, so it agrees on at least
    * one of d+1, and an equi-join on (block index, block value) finds
    * every such pair without a cross join. More blocks = wider radius
    * but higher join fan-out (each block is shorter → more random
    * collisions); the Hamming post-filter keeps the result exact. */
  def simHashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 16,
      "blocks of >= 4 bits needed to keep banding selective")
    val nBlocks = maxHamming + 1
    val blockBits = 64 / nBlocks // tail bits beyond nBlocks*blockBits
    val mask = if (blockBits == 64) -1L else (1L << blockBits) - 1
    val fp = df.select(col(idCol).as("id"), simHash(col(textCol)).as("fp"))
    val blocks = fp.select(
      col("id"), col("fp"),
      explode(
        transform(
          sequence(lit(0), lit(nBlocks - 1)),
          b => struct(
            b.as("blk"),
            call_function("shiftright", col("fp"), b * blockBits)
              .bitwiseAND(mask).as("bval"))))
        .as("bb"))
      .select(col("id"), col("fp"), col("bb.blk").as("blk"), col("bb.bval").as("bval"))
    blocks.as("l")
      .join(blocks.as("r"),
        col("l.blk") === col("r.blk") && col("l.bval") === col("r.bval") &&
          col("l.id") < col("r.id"))
      .select(
        col("l.id").as("id_a"), col("r.id").as("id_b"),
        hamming64(col("l.fp"), col("r.fp")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact pairwise embedding-cosine near-dup baseline. Quadratic in
    * |df| — correct at any scale but intended for bounded candidate
    * sets; at 100 TB route candidates through
    * [[Similarity.annCandidates]] first and verify here. */
  def embeddingCosinePairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      minCos: Double): DataFrame = {
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    v.as("l").join(v.as("r"), col("l.id") < col("r.id"))
      .select(
        col("l.id").as("id_a"), col("r.id").as("id_b"),
        Similarity.cosine(col("l.v"), col("r.v")).as("cos"))
      .filter(col("cos") >= minCos)
  }
}
