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

  /** Incremental exact dedup — the production shape at 100 TB: a new
    * batch is deduped within itself (keep min id per content) and then
    * anti-joined against the ALREADY-PROCESSED corpus's digest set, so
    * the existing data is never rescanned — only its (tiny) digest
    * index is read. `knownDigests` is one `content_hash` column, the
    * running index a pipeline maintains by unioning each batch's
    * [[exactGroups]] output. Both joins key on the digest: uniform,
    * skew-free, and the anti side carries 16 bytes per known doc. */
  def exactDedupIncremental(
      newDocs: DataFrame,
      idCol: String,
      textCol: String,
      knownDigests: DataFrame): DataFrame = {
    val withinBatch = exactDedup(newDocs, idCol, textCol)
    val known = knownDigests
      .select(col(knownDigests.columns.head).as("content_hash"))
      .distinct()
    withinBatch
      .join(known,
        md5(withinBatch(textCol)) === known("content_hash"), "left_anti")
  }

  /** Distinct word-n-gram sets per document: (id, ngrams, set size).
    * One kernel call per doc ([[Kernels.wordNgrams]]); semantically
    * identical to the TextFunctions HOF spelling. */
  private def ngramSets(
      df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    // null text -> empty set (filtered by the set_size > 0 guard every
    // caller applies), instead of an NPE inside the kernel
    val ngramsUdf = udf((t: String) =>
      if (t == null) Array.empty[String] else Kernels.wordNgrams(t, n))
    df.select(
      col(idCol).as("id"),
      ngramsUdf(col(textCol)).as("ngrams"))
      .withColumn("set_size", size(col("ngrams")))
  }

  /** Containment pairs — the ASYMMETRIC near-dup mode Jaccard
    * misses: doc A is (near-)contained in doc B when
    * |grams(A) ∩ grams(B)| / |grams(A)| ≥ minC, the signature of
    * wrappers, quote-with-commentary, and boilerplate-framed
    * re-posts, where the size imbalance crushes symmetric Jaccard
    * below any dedup threshold. One output row per DIRECTED
    * containment (id_a contained in id_b); mutual near-equality
    * shows up as both directions.
    *
    * Scale shape (prefix-filter, containment form): if the overlap
    * reaches ceil(minC·|A|), A's rarest-first prefix of
    * |A| − ceil(minC·|A|) + 1 grams must hit B's FULL gram set — so
    * candidates come from prefix(A) ⋈ posting(B), one-sided pruning
    * (the contained side prunes; the container side must stay
    * whole). Exact verify: one HashSet intersection per candidate,
    * containment = inter/|A| (one IEEE division of exact integers).
    *
    * `maxDf` is the PPJoin boilerplate guard — without it, a
    * corpus-frequent gram joins contained-side prefixes against an
    * uncapped full posting list and becomes the skew stage on a
    * boilerplate-heavy corpus. It caps by excluding grams with
    * document frequency > maxDf from the MEASURE itself: capped
    * grams vanish from candidate generation AND verification, so
    * the semantics become "containment over the sub-maxDf gram
    * vocabulary" (boilerplate phrasing stops counting as content
    * overlap — usually what dedup wants anyway) and the
    * prefix-filter completeness guarantee stays EXACT with respect
    * to that capped measure — the cap is a semantic definition, not
    * a silent recall knob. Docs whose every gram is boilerplate
    * drop out (no capped set to be contained). */
  def containmentPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      minC: Double = 0.9,
      maxDf: Option[Int] = None): DataFrame = {
    require(minC > 0.0 && minC <= 1.0, s"minC must be in (0,1], got $minC")
    maxDf.foreach(cap => require(cap >= 1,
      s"maxDf must be >= 1 when set, got $cap"))
    val setsFull =
      ngramSets(df, idCol, textCol, n).filter(col("set_size") > 0)
    val (sets, posting) = maxDf match {
      case None =>
        (setsFull, setsFull.select(col("id"), col("set_size"),
          explode(col("ngrams")).as("g")))
      case Some(cap) =>
        // ngramSets are distinct-per-doc, so count-per-gram IS the
        // document frequency; drop boilerplate grams, then rebuild
        // the per-doc sets so verification uses the same vocabulary
        val p0 = setsFull.select(col("id"),
          explode(col("ngrams")).as("g"))
        val wdf = Window.partitionBy("g")
        val capped = p0.withColumn("_df", count(lit(1)).over(wdf))
          .filter(col("_df") <= cap).drop("_df")
        val cappedSets = capped.groupBy("id")
          .agg(sort_array(collect_list(col("g"))).as("ngrams"))
          .withColumn("set_size", size(col("ngrams")))
          .filter(col("set_size") > 0)
        (cappedSets,
          capped.join(cappedSets.select("id", "set_size"), "id"))
    }
    val dfreq = posting.groupBy("g").agg(count(lit(1)).as("gdf"))
    val wDoc = Window.partitionBy("id").orderBy("gdf", "g")
    val prefix = posting.join(dfreq, "g")
      .withColumn("_rk", row_number().over(wDoc))
      .filter(col("_rk") <=
        (col("set_size") - ceil(lit(minC) * col("set_size")) + 1)
          .cast("int"))
      .select("id", "g")
    val candidates = prefix.as("l")
      .join(posting.select("id", "g").as("r"),
        col("l.g") === col("r.g") && col("l.id") =!= col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
    val cUdf = udf((a: scala.collection.Seq[String],
        b: scala.collection.Seq[String]) => {
      if (a.isEmpty) 0.0
      else {
        val bs = b.toSet
        var inter = 0
        a.foreach(x => if (bs.contains(x)) inter += 1)
        inter.toDouble / a.length
      }
    })
    val g = sets.select(col("id"), col("ngrams"))
    candidates
      .join(g.as("ga"), col("id_a") === col("ga.id"))
      .join(g.as("gb"), col("id_b") === col("gb.id"))
      .select(col("id_a"), col("id_b"),
        cUdf(col("ga.ngrams"), col("gb.ngrams")).as("containment"))
      .filter(col("containment") >= minC)
  }

  /** Exact-Jaccard verification of candidate pairs against the full
    * n-gram sets — shared tail of the LSH and prefix-filter paths.
    * Size-ratio upper bound (J <= min/max since inter <= min(|A|,|B|)
    * and union >= max) skips the set build for hopeless pairs before
    * any hashing happens. */
  private def verifyJaccard(
      candidates: DataFrame, sets: DataFrame, minJ: Double): DataFrame = {
    val jUdf = udf((a: scala.collection.Seq[String],
        b: scala.collection.Seq[String]) => {
      val mn = math.min(a.length, b.length).toDouble
      val mx = math.max(a.length, b.length).toDouble
      if (mx > 0 && mn / mx < minJ) 0.0 else Kernels.jaccard(a, b)
    })
    val g = sets.select(col("id"), col("ngrams"))
    candidates
      .join(g.as("ga"), col("id_a") === col("ga.id"))
      .join(g.as("gb"), col("id_b") === col("gb.id"))
      .select(col("id_a"), col("id_b"),
        jUdf(col("ga.ngrams"), col("gb.ngrams")).as("jaccard"))
      .filter(col("jaccard") >= minJ)
  }

  /** Exact n-gram Jaccard similarity for every pair with J >= minJ,
    * via a prefix-filtered inverted index (the AllPairs/PPJoin family):
    *
    *  1. global n-gram document frequencies, rarest-first total order
    *     (df, gram);
    *  2. each doc keeps only its PREFIX — the |s| - ceil(minJ*|s|) + 1
    *     rarest n-grams. If two docs have J >= minJ their prefixes
    *     must share a gram (a pair overlapping only outside both
    *     prefixes has intersection < minJ*|s| on each side), so the
    *     prefix-prefix equi-join loses no true pair;
    *  3. candidates verified with exact Jaccard over the full sets.
    *
    * The prefix keeps only low-df grams, collapsing the join fan-out
    * that high-frequency shingles would cause (sum of df^2 over
    * prefix grams ≪ over all grams) — this, not a df cap, is what
    * makes exact set-similarity join survive 100 TB. `maxDf` remains
    * as an opt-in approximation that additionally drops grams seen in
    * more than maxDf docs. Output: (id_a, id_b, jaccard), id_a < id_b. */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      minJ: Double = 0.5,
      maxDf: Option[Int] = None): DataFrame = {
    // NOT cached: the n-gram sets feed three plan branches (posting
    // list + both sides of the verify join), but measured at sf0.1 the
    // columnar cache build/decode of 1.5M-string array rows costs ~3x
    // more than re-running the shingle kernel per branch — string-
    // array caching is the rare case where recompute wins.
    val sets = ngramSets(df, idCol, textCol, n).filter(col("set_size") > 0)
    val posting0 = sets.select(col("id"), col("set_size"),
      explode(col("ngrams")).as("g"))
    val posting = maxDf match {
      case Some(cap) =>
        val wdf = Window.partitionBy("g")
        posting0.withColumn("_df", count(lit(1)).over(wdf))
          .filter(col("_df") <= cap).drop("_df")
      case None => posting0
    }
    val dfreq = posting.groupBy("g").agg(count(lit(1)).as("gdf"))
    // rarest-first prefix per doc: rank grams by (df, gram) within
    // each doc, keep the first |s| - ceil(minJ*|s|) + 1. A window
    // row_number is one sort-shuffle entirely inside codegen; the
    // collect_list + array_sort spelling it replaces built a 400-
    // element struct array per doc and sorted it interpreted.
    val wDoc = Window.partitionBy("id").orderBy("gdf", "g")
    val prefix = posting.join(dfreq, "g")
      .withColumn("_rk", row_number().over(wDoc))
      .filter(col("_rk") <=
        (col("set_size") - ceil(lit(minJ) * col("set_size")) + 1).cast("int"))
      .select("id", "g")
    val candidates = prefix.as("l")
      .join(prefix.as("r"), col("l.g") === col("r.g") &&
        col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
    verifyJaccard(candidates, sets, minJ)
  }

  /** MinHash + LSH near-duplicate pairs with exact verification.
    *
    * Pipeline: shingle → k=bands*rowsPerBand minhashes → per-band
    * bucket keys ([[Kernels.minHashBands]], one JIT-compiled call per
    * doc — the Catalyst HOF spelling of the same thing runs
    * interpreted and was ~100× slower) → explode bands → self-join on
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
      minJ: Double = 0.5,
      maxBucketSize: Int = 4096): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    // sets feed the banding pass + both sides of the verify join;
    // capped feeds both sides of the candidate self-join — persist or
    // the shingle/minhash UDFs re-run per branch (same reasoning and
    // storage level as ngramJaccardPairs / annCandidates).
    val sets = ngramSets(df, idCol, textCol, n)
      .filter(col("set_size") > 0)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val bandsUdf = udf((ng: scala.collection.Seq[String]) =>
      Kernels.minHashBands(ng, bands, rowsPerBand))
    val banded = sets.select(
      col("id"), posexplode(bandsUdf(col("ngrams"))).as(Seq("band", "bucket")))
    // A degenerate bucket (boilerplate corpus: thousands of
    // near-identical docs hashing into one band bucket) would make one
    // O(|bucket|²) straggler task; split it into capped sub-buckets
    // ([[Buckets]]). Each band splits along different boundaries, so a
    // pair separated in one band usually still collides in another of
    // its ~bands·s^r expected collisions.
    val capped = Buckets.capped(banded, Seq("band", "bucket"), "id", maxBucketSize)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val candidates = capped.as("l")
      .join(capped.as("r"),
        col("l.band") === col("r.band") &&
          col("l.bucket") === col("r.bucket") &&
          col("l._sub") === col("r._sub") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
    val verified = verifyJaccard(candidates, sets, minJ)
      .persist(StorageLevel.MEMORY_AND_DISK)
    verified.count()
    capped.unpersist(blocking = false)
    sets.unpersist(blocking = false)
    verified
  }

  /** The persistent near-dup index for continuous ingestion: one row
    * per document — (id, ngrams, bands) — carrying its shingle set and
    * its LSH band-bucket keys. A pipeline computes this once per batch
    * and persists it (parquet); future batches dedup against the index
    * without ever re-reading, re-shingling or re-hashing the original
    * corpus. Index size is O(docs · (grams + bands)), independent of
    * text length once shingled. */
  def minHashIndex(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      bands: Int = 32,
      rowsPerBand: Int = 4): DataFrame = {
    val sets = ngramSets(df, idCol, textCol, n).filter(col("set_size") > 0)
    val bandsUdf = udf((ng: scala.collection.Seq[String]) =>
      Kernels.minHashBands(ng, bands, rowsPerBand))
    sets.select(col("id"), col("ngrams"), bandsUdf(col("ngrams")).as("bands"))
  }

  /** Within-index MinHash-LSH near-dup pairs: the same result as
    * [[minHashLshPairs]] (spec-pinned equal) computed FROM an
    * existing [[minHashIndex]] — text is never re-read or
    * re-shingled, so a pipeline that already built its per-batch
    * index (it should: the index is also what future batches probe
    * via [[minHashLshIncremental]]) gets its within-batch pairs for
    * just the band self-join + verify. Callers reusing the index
    * across several consumers should persist it once (parquet-backed
    * indexes already are). */
  /** Contrastive pair-set builder — the training set for a LEARNED
    * dedup/similarity model (bi-encoder, cross-encoder, or a
    * re-ranking head over [[minHashLshPairs]]' candidates): every
    * LSH-verified near-dup pair becomes a POSITIVE, and each
    * positive is matched with one deterministic LENGTH-MATCHED
    * negative — a document from the partner's token-length bucket
    * that is NOT a near-dup of the anchor. Length matching is the
    * standard anti-shortcut: without it the model learns "similar
    * length ⇒ duplicate" instead of content similarity.
    *
    * The negative pick is DETERMINISTIC (min doc id in the bucket
    * after exclusions), not random — reproducible builds, and the
    * oracle replays the exact same choice. Positives without any
    * eligible bucket partner emit no negative (visible as a
    * label-count asymmetry, not silently re-bucketed).
    *
    * Shape: the LSH pair stage (banded, bucket-capped — never
    * all-pairs), one token-count pass, then a pairs×bucket join
    * whose fan-out is bounded by the largest length bucket —
    * guarded loudly by `maxBucketDocs` — an anti-join against the
    * positive set, and a min partial agg.
    *
    * Output: (anchor, partner, label) — label 1 for near-dup
    * positives (anchor < partner), 0 for the matched negatives. */
  def contrastivePairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      bands: Int = 32,
      rowsPerBand: Int = 4,
      minJ: Double = 0.5,
      lenBucket: Int = 16,
      maxBucketDocs: Long = 100000L): DataFrame = {
    require(lenBucket >= 1, s"lenBucket must be >= 1, got $lenBucket")
    require(maxBucketDocs >= 1L,
      s"maxBucketDocs must be >= 1, got $maxBucketDocs")
    val pos = minHashLshPairs(df, idCol, textCol, n, bands,
      rowsPerBand, minJ)
      .select(col("id_a"), col("id_b"))
    val buckets = df.select(col(idCol).cast("long").as("_id"),
      floor(graft.functions.TextFunctions.tokenCount(col(textCol))
        .cast("double") / lenBucket).cast("long").as("_bkt"))
    val worst = buckets.groupBy("_bkt").agg(count(lit(1)).as("n"))
      .agg(max("n")).head()
    if (!worst.isNullAt(0)) {
      require(worst.getLong(0) <= maxBucketDocs,
        s"contrastivePairs: a length bucket holds " +
          s"${worst.getLong(0)} docs > maxBucketDocs=$maxBucketDocs " +
          "— the negative-candidate join fans out per bucket; widen " +
          "lenBucket or raise the bound deliberately")
    }
    val cand = pos
      .join(buckets.select(col("_id").as("id_b"),
        col("_bkt").as("_tb")), "id_b")
      .join(buckets.select(col("_id").as("_cand"),
        col("_bkt").as("_tb")), "_tb")
      .filter(col("_cand") =!= col("id_a") &&
        col("_cand") =!= col("id_b"))
    // a candidate already near-dup with the anchor is not a negative
    val negs = cand
      .join(pos.select(col("id_a").as("_pa"), col("id_b").as("_pb")),
        least(col("id_a"), col("_cand")) === col("_pa") &&
          greatest(col("id_a"), col("_cand")) === col("_pb"),
        "left_anti")
      .groupBy("id_a", "id_b")
      .agg(min(col("_cand")).as("_neg"))
    pos.select(col("id_a").as("anchor"), col("id_b").as("partner"),
      lit(1L).as("label"))
      .unionAll(negs.select(col("id_a").as("anchor"),
        col("_neg").as("partner"), lit(0L).as("label")))
  }

  def minHashLshPairsFromIndex(
      index: DataFrame,
      minJ: Double = 0.5,
      maxBucketSize: Int = 4096): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val idx = index.select(col("id"), col("ngrams"), col("bands"))
    val banded = idx.select(col("id"),
      posexplode(col("bands")).as(Seq("band", "bucket")))
    val capped = Buckets.capped(banded, Seq("band", "bucket"), "id",
      maxBucketSize)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val candidates = capped.as("l")
      .join(capped.as("r"),
        col("l.band") === col("r.band") &&
          col("l.bucket") === col("r.bucket") &&
          col("l._sub") === col("r._sub") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
    val verified = verifyJaccard(candidates, idx.select("id", "ngrams"), minJ)
      .persist(StorageLevel.MEMORY_AND_DISK)
    verified.count()
    capped.unpersist(blocking = false)
    verified
  }

  /** Incremental MinHash-LSH near-dup pairs: a NEW batch against
    * itself and against an existing [[minHashIndex]] — old↔old pairs
    * are never generated (they were found when the old batches were
    * ingested), so per-batch cost tracks the batch's collisions, not
    * the corpus's. Same banding/capping/exact-verify discipline as
    * [[minHashLshPairs]]; DedupSpec pins incremental == full-corpus
    * pairs restricted to pairs touching the new batch. Ids must be
    * disjoint between index and batch. Output: (id_a, id_b, jaccard),
    * id_a < id_b, at least one side new. */
  def minHashLshIncremental(
      newDocs: DataFrame,
      idCol: String,
      textCol: String,
      index: DataFrame,
      minJ: Double = 0.5,
      n: Int = 3,
      bands: Int = 32,
      rowsPerBand: Int = 4,
      maxBucketSize: Int = 4096): DataFrame =
    minHashLshIncrementalFromIndex(
      minHashIndex(newDocs, idCol, textCol, n, bands, rowsPerBand),
      index, minJ, maxBucketSize)

  /** [[minHashLshIncremental]] with the new batch's index PREBUILT —
    * for pipelines that need the batch index anyway (they all do: it
    * is also what gets persisted as the next delta), so the batch is
    * shingled and minhashed exactly once per ingestion cycle, not
    * once per consumer ([[graft.streaming.Streams.ingestNearDupBatch]]
    * persists it across the probe and the delta write). */
  def minHashLshIncrementalFromIndex(
      newIdx: DataFrame,
      index: DataFrame,
      minJ: Double = 0.5,
      maxBucketSize: Int = 4096): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val all = index.select(col("id"), col("ngrams"), col("bands"))
      .withColumn("is_new", lit(false))
      .unionByName(newIdx.withColumn("is_new", lit(true)))
    val banded = all.select(col("id"), col("is_new"),
      posexplode(col("bands")).as(Seq("band", "bucket")))
    val capped = Buckets.capped(banded, Seq("band", "bucket"), "id", maxBucketSize)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val candidates = capped.as("l")
      .join(capped.as("r"),
        col("l.band") === col("r.band") &&
          col("l.bucket") === col("r.bucket") &&
          col("l._sub") === col("r._sub") &&
          col("l.id") < col("r.id") &&
          (col("l.is_new") || col("r.is_new")))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    candidates.count()
    capped.unpersist(blocking = false)
    verifyJaccard(candidates, all.select("id", "ngrams"), minJ)
  }

  /** Compact a persisted [[minHashIndex]] lineage: union any number
    * of per-batch index deltas, resolve docs re-ingested in a later
    * delta to their LATEST rows (last-writer-wins by delta position —
    * re-crawled pages, edited docs), and drop tombstoned ids
    * (takedowns, retention). The maintenance half of the incremental
    * story: [[minHashLshIncremental]] keeps ingestion O(batch), this
    * keeps the index itself from accreting stale/duplicate entries —
    * without it every probe pays for dead rows and a re-ingested doc
    * collides with its own ghost.
    *
    * Scale shape: one row_number window keyed by id (the LWW resolve
    * — per-id partitions, parallel), one left-anti join against the
    * tombstone set (broadcast when small). Deltas are parquet-backed
    * DataFrames in production; nothing is collected. Output: the same
    * (id, ngrams, bands) schema [[minHashIndex]] emits, so compacted
    * indexes feed [[minHashLshPairsFromIndex]] / incremental probes
    * unchanged. */
  def compactIndex(
      deltas: Seq[DataFrame],
      tombstones: Option[DataFrame] = None,
      tombstoneIdCol: String = "id"): DataFrame = {
    require(deltas.nonEmpty, "compactIndex needs at least one delta")
    val tagged = deltas.zipWithIndex.map { case (d, i) =>
      d.select(col("id"), col("ngrams"), col("bands"))
        .withColumn("_delta", lit(i))
    }.reduce(_ unionByName _)
    // minHashIndex deltas carry one row per id, but arbitrary caller
    // DataFrames may not — a duplicate id WITHIN one delta must still
    // resolve deterministically, so the LWW window tiebreaks on a
    // content hash (identical-content ties are harmless by identity;
    // differing-content rows order by their 64-bit hash, which is
    // stable across runs and partitionings)
    val lww = tagged
      .withColumn("_rk", row_number().over(
        Window.partitionBy("id").orderBy(
          col("_delta").desc, xxhash64(col("ngrams"), col("bands")).asc)))
      .filter(col("_rk") === 1)
      .select("id", "ngrams", "bands")
    tombstones match {
      case Some(t) =>
        lww.join(t.select(col(tombstoneIdCol).as("id")).distinct(),
          Seq("id"), "left_anti")
      case None => lww
    }
  }

  /** 64-bit SimHash of the word stream: bit j of the fingerprint is
    * the sign of sum over tokens of ±1 according to bit j of the
    * token's hash. One [[Kernels.simHash64]] call per row (the
    * 64-aggregate Catalyst spelling evaluates interpreted, ~64 passes
    * per document). */
  def simHash(textCol: Column, md5Tokens: Boolean = false): Column = {
    val simUdf =
      if (md5Tokens)
        udf((toks: scala.collection.Seq[String]) => Kernels.simHash64Md5(toks))
      else
        udf((toks: scala.collection.Seq[String]) => Kernels.simHash64(toks))
    simUdf(TextFunctions.words(textCol))
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
      maxHamming: Int = 3,
      md5Tokens: Boolean = false): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 16,
      "blocks of >= 4 bits needed to keep banding selective")
    val nBlocks = maxHamming + 1
    val blockBits = 64 / nBlocks // tail bits beyond nBlocks*blockBits
    val mask = if (blockBits == 64) -1L else (1L << blockBits) - 1
    val fp = df.select(col(idCol).as("id"),
      simHash(col(textCol), md5Tokens).as("fp"))
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

  /** The 100 TB spelling of embedding near-dup: LSH candidate
    * generation ([[Similarity.annCandidates]], sub-quadratic, bucket
    * sizes capped) followed by exact cosine verification of the
    * candidates only. Compute is O(candidates), never O(n²) — this
    * composition, not [[embeddingCosinePairs]], is what runs
    * whole-corpus at scale; the quadratic operator remains the
    * bounded-set verify/baseline tool. Recall is the LSH collision
    * probability at the chosen (tables × bits); at high thresholds
    * (near-identical vectors) it is effectively exact — the catalog
    * query q56 pins equality with the exact baseline on the fixtures.
    * Output: (id_a, id_b, cos), id_a < id_b, cos >= minCos. */
  def embeddingNearDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      minCos: Double,
      tables: Int = 16,
      bits: Int = 8,
      dim: Int = 64,
      seed: Long = 42L,
      maxBucketSize: Int = 4096): DataFrame = {
    graft.expressions.GraftFunctions.register(df.sparkSession)
    val cand = Similarity.annCandidates(
      df, idCol, vecCol, tables, bits, dim, seed, maxBucketSize)
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    cand
      .join(v.as("va"), col("id_a") === col("va.id"))
      .join(v.as("vb"), col("id_b") === col("vb.id"))
      .select(col("id_a"), col("id_b"),
        call_function("graft_cosine", col("va.v"), col("vb.v")).as("cos"))
      .filter(col("cos") >= minCos)
  }

  /** Duplicate-cluster resolution: connected components over the
    * candidate pair graph, labeling every id with the MINIMUM id
    * reachable from it (the cluster representative). This is the step
    * that turns pair lists (LSH/SimHash/Jaccard output) into an
    * actionable "keep one per cluster" decision.
    *
    * Algorithm: iterative min-label propagation — each round joins
    * edges to current labels and takes the per-vertex min; converges
    * in O(graph diameter) rounds. Near-dup graphs are short-diameter
    * (clusters are stars/cliques around a representative), so this
    * beats the alternating-star machinery in practice; rounds are
    * driver-coordinated like every iterative Spark graph algorithm.
    * Each round's labels are checkpointed: without plan truncation
    * the self-referential join DOUBLES the logical plan every round
    * (exponential analysis cost — it OOMs the driver before the data
    * is ever large). `checkpointDir = None` uses `localCheckpoint`
    * (zero-setup, right for local/fixture runs); on a real cluster
    * pass a durable dir — reliable checkpoints survive executor
    * loss, localCheckpoint blocks do not. For adversarially long
    * chains raise `maxIter` (the require makes non-convergence loud,
    * never silent).
    *
    * Small graphs short-circuit to driver-side union-find — same
    * design as [[duplicateClustersIncremental]]'s remap, but sized by
    * a BOUNDED fetch rather than a separate count: `limit(max+1)`
    * collects at most maxDriverEdges+1 narrow rows in ONE job; if
    * everything arrived, those ARE the edges (zero iterative jobs),
    * else the distributed min-label loop runs as before. Near-dup
    * pair sets are tiny next to their corpora, so at fixture AND
    * production scale the common case is the short-circuit, and the
    * fallback is the one that must exist, loudly bounded, for the
    * genuinely huge collision graphs. DedupSpec runs the equality
    * property through both paths.
    *
    * Output: (id, cluster_id), one row per input id; singletons label
    * themselves. Pair endpoints absent from `ids` act as connectivity
    * BRIDGES on both paths (a~x, x~b ⇒ a and b share a cluster, and
    * the canonical label is the min id across the whole component,
    * bridge ids included) but never appear as output rows — both the
    * driver union-find and the distributed loop implement exactly
    * this, so the label assignment is independent of which side of
    * `maxDriverEdges` the graph lands (DedupSpec pins it). */
  def duplicateClusters(
      ids: DataFrame,
      pairs: DataFrame,
      maxIter: Int = 20,
      checkpointDir: Option[String] = None,
      maxDriverEdges: Int = 1 << 20): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    val edgePairs = pairs.select(col("id_a").cast("long"),
      col("id_b").cast("long")).as[(Long, Long)]
    val fetched = edgePairs.limit(maxDriverEdges + 1).collect()
    if (fetched.length <= maxDriverEdges) {
      val idName0 = ids.columns.head
      val base = ids.select(col(idName0).cast("long").as("id")).distinct()
      val parent = new scala.collection.mutable.HashMap[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x // path compression
        while (parent.getOrElse(c, c) != c) {
          val next = parent(c); parent(c) = r; c = next
        }
        r
      }
      // union-by-min keeps every root the component minimum — the same
      // canonical labels the min-label loop converges to
      fetched.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val remap = parent.keys.toSeq
        .map(l => l -> find(l))
        .filter { case (id, root) => id != root }
        .toDF("_old", "_new")
      return base.join(remap, base("id") === remap("_old"), "left")
        .select(col("id"), coalesce(col("_new"), col("id")).as("cluster_id"))
    }
    // iterative plans MUST be truncated each round (else the lineage
    // and analysis cost grow per iteration). localCheckpoint is the
    // zero-setup default for local/fixture runs; pass `checkpointDir`
    // on a real cluster — reliable checkpoints go to the (HDFS/object
    // store) dir and survive executor loss, which localCheckpoint
    // blocks do not.
    val save: DataFrame => DataFrame = checkpointDir match {
      case Some(dir) =>
        if (spark.sparkContext.getCheckpointDir.isEmpty)
          spark.sparkContext.setCheckpointDir(dir)
        df => df.checkpoint(true)
      case None => df => df.localCheckpoint(true)
    }
    val idName = ids.columns.head
    val edges = save(pairs
      .select(col("id_a").cast("long").as("src"),
        col("id_b").cast("long").as("dst"))
      .unionAll(pairs.select(col("id_b").cast("long").as("src"),
        col("id_a").cast("long").as("dst"))))
    val baseIds = save(ids.select(col(idName).cast("long").as("id")).distinct())
    // the label graph spans ids ∪ pair endpoints: an endpoint absent
    // from `ids` is still a connectivity bridge (a~x, x~b ⇒ a~b), and
    // the driver union-find above merges through such nodes — the
    // distributed loop must propagate through them identically or the
    // same logical input would cluster differently depending on which
    // side of maxDriverEdges it lands. Bridge-only nodes participate
    // in propagation (and, like the driver path, in the min-label
    // canon) but are filtered from the output, which stays one row
    // per requested id.
    var labels = save(baseIds
      .unionAll(edges.select(col("src").as("id")))
      .distinct()
      .withColumn("cluster_id", col("id")))
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIter) {
      val neighborMin = edges
        .join(labels, edges("src") === labels("id"))
        .select(col("dst").as("id"), col("cluster_id").as("ncomp"))
        .groupBy("id").agg(min("ncomp").as("ncomp"))
      val updated = save(labels.as("l")
        .join(neighborMin.as("n"), Seq("id"), "left")
        .select(col("id"),
          least(col("cluster_id"), coalesce(col("ncomp"), col("cluster_id")))
            .as("cluster_id")))
      changed = updated.as("u")
        .join(labels.select(col("id"), col("cluster_id").as("old")), Seq("id"))
        .filter(col("cluster_id") =!= col("old"))
        .count()
      // the convergence count above was the last reader of the previous
      // round's checkpoint — release its blocks before the next round
      // caches a new set (else up to maxIter label sets pile up)
      labels.unpersist()
      labels = updated
      it += 1
    }
    require(changed == 0L,
      s"duplicateClusters did not converge in $maxIter rounds — " +
        "pathologically long chain; raise maxIter")
    labels.join(baseIds, Seq("id")).select("id", "cluster_id")
  }

  /** Incremental cluster maintenance — the label-side twin of
    * [[minHashLshIncremental]]: a NEW batch's duplicate pairs are
    * merged into EXISTING cluster labels without re-reading (or even
    * re-listing) the old pair set. The old corpus participates only
    * through its label column; the iterative CC runs over the LABEL
    * graph projected from the new edges — at most 2·|newPairs| nodes,
    * the touched components only — never over the full corpus, so
    * per-batch cost tracks the batch's collisions exactly like q76's
    * pair finder. Labels stay canonical (min id in the merged
    * component): existing labels are already component-minima, new
    * ids enter labeled by themselves, and min-label propagation over
    * the label graph yields the min across every merged part —
    * DedupSpec pins incremental == batch on random graphs.
    *
    * `existing`: (id, cluster_id) from a prior [[duplicateClusters]]
    * run. `newIds`: the new batch's ids (first column; singletons get
    * self-labels). `newPairs`: (id_a, id_b) — pairs touching the new
    * batch, e.g. from [[minHashLshIncremental]].
    *
    * Output: (id, cluster_id) for old ∪ new ids — same shape as
    * [[duplicateClusters]], directly usable as next round's
    * `existing`. */
  def duplicateClustersIncremental(
      existing: DataFrame,
      newIds: DataFrame,
      newPairs: DataFrame,
      maxIter: Int = 20,
      checkpointDir: Option[String] = None,
      maxDriverEdges: Long = 1L << 20): DataFrame = {
    val spark = existing.sparkSession
    import spark.implicits._
    val ex = existing.select(col("id").cast("long").as("id"),
      col("cluster_id").cast("long").as("cluster_id"))
    val newIdName = newIds.columns.head
    val fresh = newIds.select(col(newIdName).cast("long").as("id")).distinct()
      .join(ex, Seq("id"), "left_anti")
      .withColumn("cluster_id", col("id"))
    val base = ex.unionByName(fresh)
    // project the new edges onto the label graph: each endpoint is
    // replaced by its current label, same-label edges vanish
    val lbl = base.select(col("id"), col("cluster_id").as("lbl"))
    val lblEdges = newPairs
      .select(col("id_a").cast("long").as("id_a"),
        col("id_b").cast("long").as("id_b"))
      .join(lbl.select(col("id").as("id_a"), col("lbl").as("la")), Seq("id_a"))
      .join(lbl.select(col("id").as("id_b"), col("lbl").as("lb")), Seq("id_b"))
      .select(col("la").as("id_a"), col("lb").as("id_b"))
      .filter(col("id_a") =!= col("id_b"))
    // The label graph has at most 2·|newPairs| nodes — usually TINY
    // next to the corpus, so the remap is computed by driver-side
    // union-find when it fits, and falls back to the distributed
    // min-label loop when a batch's collision graph is genuinely
    // large. Sizing uses the duplicateClusters bounded-fetch pattern:
    // limit(max+1) collects at most maxDriverEdges+1 narrow rows in
    // ONE job (checked, never assumed — and no separate count pass);
    // if everything arrived, those ARE the edges. Both paths yield
    // the identical min-label remap (DedupSpec runs the equality
    // property through each).
    val boundInt = math.min(maxDriverEdges, (Int.MaxValue - 1).toLong).toInt
    val fetched = lblEdges.as[(Long, Long)].limit(boundInt + 1).collect()
    val remap: DataFrame =
      if (fetched.length <= boundInt) {
        val parent = new scala.collection.mutable.HashMap[Long, Long]()
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent(r)
          var c = x // path compression
          while (parent.getOrElse(c, c) != c) {
            val next = parent(c); parent(c) = r; c = next
          }
          r
        }
        fetched.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        parent.keys.toSeq
          .map(l => l -> find(l))
          .filter { case (old, root) => old != root }
          .toDF("_old", "_new")
      } else {
        val touched = lblEdges.select(col("id_a").as("l"))
          .unionAll(lblEdges.select(col("id_b").as("l"))).distinct()
        duplicateClusters(touched, lblEdges, maxIter, checkpointDir)
          .select(col("id").as("_old"), col("cluster_id").as("_new"))
          .filter(col("_old") =!= col("_new"))
      }
    base.join(remap, base("cluster_id") === remap("_old"), "left")
      .select(col("id"),
        coalesce(col("_new"), col("cluster_id")).as("cluster_id"))
  }

  /** Leakage-free train/eval split assignment: every member of a
    * near-duplicate cluster lands in the SAME split bucket, so a
    * held-out fraction never contains a near-copy of a training row —
    * splitting by per-document hash (the naive spelling) leaks every
    * duplicated document across the boundary and inflates eval scores
    * exactly like test-set contamination does.
    *
    * Output: (id, cluster_id, bucket), bucket in [0, nBuckets).
    * `hashed = true` (production default) buckets by
    * xxhash64(cluster_id) for uniformity independent of id
    * distribution; `hashed = false` buckets by cluster_id % nBuckets —
    * deterministic modulo arithmetic any SQL engine reproduces, which
    * is what lets the q72 oracle recompute the full assignment from
    * the recursive-CTE component labels. Cost on top of
    * [[duplicateClusters]]: one narrow projection. */
  def clusterAwareSplit(
      df: DataFrame,
      idCol: String,
      pairs: DataFrame,
      nBuckets: Int = 100,
      hashed: Boolean = true,
      maxIter: Int = 20,
      checkpointDir: Option[String] = None): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    val clusters = duplicateClusters(df.select(idCol), pairs, maxIter, checkpointDir)
    val bucket =
      if (hashed) pmod(xxhash64(col("cluster_id")), lit(nBuckets.toLong))
      else pmod(col("cluster_id"), lit(nBuckets.toLong))
    clusters.withColumn("bucket", bucket)
  }

  /** Tombstone blast radius through the dedup layer — the
    * right-to-be-forgotten query a production corpus owner runs
    * before honoring a delete batch: which duplicate clusters does
    * the batch touch, does any cluster lose its canonical
    * REPRESENTATIVE (the member whose id equals the min-label
    * `cluster_id` — the row [[resolveDuplicates]] kept and every
    * downstream index/pack references), and who is the surviving
    * representative afterwards. Deleting a non-representative
    * member is metadata-only; deleting the representative
    * invalidates every derived artifact keyed on it, and a fully
    * deleted cluster (n_survivors = 0) must propagate the delete
    * into indexes rather than re-elect — demonstrated end to end by
    * q274 (this report driving [[compactIndex]]/ivfCompact, then a
    * probe proving no tombstoned id is ever returned), with the
    * packed layer covered by [[Pack.deleteBlastRadius]] (q275), the
    * k-NN list layer by [[Similarity.listInvalidation]] (q276), and
    * the per-request certificate by q277.
    *
    * `clusters`: (id, cluster_id) — [[duplicateClusters]] output
    * (singletons self-labeled, so a tombstoned unique doc shows up
    * as its own fully-deleted cluster). `tombstones`: delete-request
    * ids (first column). Ids in `tombstones` absent from `clusters`
    * are ignored — they deleted nothing the dedup layer tracks.
    *
    * Output, one row per cluster the batch touches (n_deleted >= 1):
    * (cluster_id, n_members, n_deleted, n_survivors, rep_deleted,
    * new_rep) — `rep_deleted` is 0/1 (BIGINT, the repo's
    * cross-engine spelling), `new_rep` the min SURVIVING id (equal
    * to cluster_id when the representative survives; NULL when the
    * cluster is fully deleted).
    *
    * Shape, and why it holds at 100 TB: one equi-join of the narrow
    * (id, cluster_id) frame against the tombstone ids — a delete
    * batch is small next to the corpus, so Catalyst broadcasts it
    * (AQE converts at runtime when the static estimate misses) —
    * then ONE partial-aggregable groupBy(cluster_id); conditional
    * min/max/sum, no windows, no collect, row bodies never move.
    * The HAVING-style touched-cluster filter runs post-aggregate on
    * cluster-sized data. */
  def deletePropagation(
      clusters: DataFrame,
      tombstones: DataFrame): DataFrame = {
    val tombName = tombstones.columns.head
    val tomb = tombstones
      .select(col(tombName).cast("long").as("_tid")).distinct()
    clusters
      .select(col("id").cast("long").as("id"),
        col("cluster_id").cast("long").as("cluster_id"))
      .join(tomb, col("id") === col("_tid"), "left")
      .withColumn("_del",
        when(col("_tid").isNotNull, 1L).otherwise(0L))
      .groupBy("cluster_id")
      .agg(
        count(lit(1)).as("n_members"),
        sum(col("_del")).as("n_deleted"),
        sum(lit(1L) - col("_del")).as("n_survivors"),
        max(when(col("id") === col("cluster_id"), col("_del"))
          .otherwise(0L)).as("rep_deleted"),
        min(when(col("_del") === 0L, col("id"))).as("new_rep"))
      .filter(col("n_deleted") >= 1L)
  }

  /** Apply cluster labels back to the data: keep exactly the rows
    * whose id IS its cluster's representative (the min id). The
    * "delete the duplicates" end of the pair→cluster pipeline:
    * pairs = any candidate generator, clusters = [[duplicateClusters]],
    * and the final semi join keys on the id — one shuffle of ids, row
    * bodies move once. */
  def resolveDuplicates(
      df: DataFrame,
      idCol: String,
      pairs: DataFrame,
      maxIter: Int = 20): DataFrame = {
    val clusters = duplicateClusters(df.select(idCol), pairs, maxIter)
    val keep = clusters.filter(col("id") === col("cluster_id")).select("id")
    df.join(keep, df(idCol) === keep("id"), "left_semi")
  }

  /** [[resolveDuplicates]] with a QUALITY policy: keep each cluster's
    * best row by `scoreCol` (ties by id — total, deterministic)
    * rather than its min id. The curation-correct resolution — a
    * near-dup cluster usually holds one clean original and N mangled
    * copies, and min-id keeps whichever was crawled first, not
    * whichever is best. Emits (id, cluster_id, score, keep) for
    * EVERY row — the audit face; filter(keep) + semi-join is the
    * enforcement end ([[keepBestDuplicates]]).
    *
    * Cost on top of [[duplicateClusters]]: one narrow (id, score)
    * join and one max_by aggregate per cluster — partial-aggregated,
    * no windows over cluster members, row bodies never move. */
  def resolveDuplicatesBy(
      df: DataFrame,
      idCol: String,
      scoreCol: String,
      pairs: DataFrame,
      maxIter: Int = 20): DataFrame = {
    val clusters = duplicateClusters(df.select(idCol), pairs, maxIter)
    val scored = clusters.join(
      df.select(col(idCol).as("id"),
        col(scoreCol).cast("double").as("score")), Seq("id"))
    // argmax by (score, -id): max_by with a sortable struct — ties
    // break toward the SMALLER id, so (score DESC, id ASC) total order
    val best = scored.groupBy("cluster_id")
      .agg(max(struct(col("score"), (-col("id")).as("_negid")))
        .as("_best"))
      .select(col("cluster_id"),
        (-col("_best._negid")).cast("long").as("_keep_id"))
    scored.join(best, Seq("cluster_id"))
      .select(col("id"), col("cluster_id"), col("score"),
        (col("id") === col("_keep_id")).as("keep"))
  }

  /** The enforcement end of [[resolveDuplicatesBy]]: rows whose id is
    * its cluster's quality representative, bodies moved once. */
  def keepBestDuplicates(
      df: DataFrame,
      idCol: String,
      scoreCol: String,
      pairs: DataFrame,
      maxIter: Int = 20): DataFrame = {
    val keep = resolveDuplicatesBy(df, idCol, scoreCol, pairs, maxIter)
      .filter(col("keep")).select("id")
    df.join(keep, df(idCol) === keep("id"), "left_semi")
  }

  /** Per-group dedup ATTRITION: what does each source really
    * contribute after duplicate resolution? Raw vs kept doc and
    * token counts per `groupCol`, where "kept" follows
    * [[resolveDuplicatesBy]]'s best-member policy — the number a
    * mixture designer must use instead of raw token counts (a source
    * that is 60% internal near-dups of another source is smaller
    * than it looks, and weighting it by raw tokens over-samples its
    * duplicated mass). All counts are 64-bit integer sums — exact
    * cross-engine. One resolve pass + one id join + one partial agg
    * on top of the cluster machinery. */
  def dedupAttrition(
      df: DataFrame,
      idCol: String,
      scoreCol: String,
      groupCol: String,
      weightCol: String,
      pairs: DataFrame,
      maxIter: Int = 20): DataFrame = {
    val res = resolveDuplicatesBy(df, idCol, scoreCol, pairs, maxIter)
      .select(col("id"), col("keep"))
    df.select(col(idCol).as("id"), col(groupCol).as("group"),
        col(weightCol).cast("long").as("_w"))
      .join(res, Seq("id"))
      .groupBy(col("group"))
      .agg(count(lit(1)).as("n_raw"), sum(col("_w")).as("tokens_raw"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("keep"), col("_w")).otherwise(0L)).as("tokens_kept"))
  }

  /** Exact pairwise embedding-cosine near-dup baseline — a
    * block-nested cross computed distributively: rows are hashed into
    * `blocks` buckets, every row is replicated to the `blocks`
    * block-pairs it participates in, and each block-pair task runs a
    * tight JIT'd double loop over its two blocks. Compute is the
    * unavoidable O(n^2/tasks) per task, but shuffle volume is only
    * n*blocks vectors (vs. a naive broadcast-nested-loop join whose
    * per-pair row machinery dominated: 28s -> ~2s at sf0.1), nothing
    * is collected to the driver, and parallelism = blocks*(blocks+1)/2
    * tasks. Still quadratic overall — at 100 TB this is the VERIFY
    * stage behind [[Similarity.annCandidates]], not a whole-corpus
    * operator. Output: (id_a, id_b, cos), id_a < id_b, cos >= minCos. */
  def embeddingCosinePairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      minCos: Double,
      blocks: Int = 16): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val v = df.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<float>").as("v"))
      .as[(Long, Array[Float])]
    // each (row, other-block) lands in a distinct block-pair, so no
    // dedup is needed: {blk, other} determines bp uniquely
    val replicated = v.flatMap { case (id, vec) =>
      val blk = ((id % blocks) + blocks).toInt % blocks
      (0 until blocks).map { other =>
        val bp = if (blk <= other) blk * blocks + other else other * blocks + blk
        (bp, blk, id, vec)
      }
    }
    replicated
      .groupByKey(_._1)
      .flatMapGroups { (bp, it) =>
        val lo = bp / blocks
        val hi = bp % blocks
        val left = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Float])]
        val right = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Float])]
        it.foreach { case (_, blk, id, vec) =>
          if (blk == lo) left += ((id, vec))
          if (blk == hi && lo != hi) right += ((id, vec))
        }
        val l = left.toArray
        val r = if (lo == hi) l else right.toArray
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
        var i = 0
        while (i < l.length) {
          val (ia, va) = l(i)
          var j = if (lo == hi) i + 1 else 0
          while (j < r.length) {
            val (ib, vb) = r(j)
            if (ia != ib) {
              val c = Kernels.cosineArrays(va, vb)
              if (c >= minCos) {
                if (ia < ib) out += ((ia, ib, c)) else out += ((ib, ia, c))
              }
            }
            j += 1
          }
          i += 1
        }
        out.iterator
      }
      .toDF("id_a", "id_b", "cos")
  }

  /** Substring-level duplicate detection: the maximal token spans
    * whose every length-`n` word gram appears in >= `minDocs` DISTINCT
    * documents. Document-level dedup (exact / MinHash / SimHash above)
    * misses long VERBATIM passages embedded in otherwise-distinct
    * documents — licenses, boilerplate templates, quoted chains — the
    * duplication mode the published substring-dedup work (Lee et al.,
    * "Deduplicating Training Data Makes Language Models Better", ACL
    * 2022) removes with a single-node suffix array. The Spark-shaped
    * equivalent for a fixed gram length is GRAM POSTINGS:
    *
    *   1. fingerprint every positional n-gram ([[Kernels
    *      .gramMd5Positions]] — one JIT pass per doc, 64-bit keys so
    *      the postings shuffle carries (id, pos, long), never gram
    *      text);
    *   2. one aggregate keyed by fingerprint marks grams seen in >=
    *      `minDocs` distinct docs (partial aggregation applies — the
    *      distinct-doc count is two map-side-combined phases);
    *   3. postings join back on the fingerprint (co-partitioned with
    *      the aggregate's output partitioning — one exchange for the
    *      probe side, fan-out = occurrence count, never quadratic);
    *   4. per-doc gaps-and-islands window merges overlapping/adjacent
    *      duplicated gram starts into MAXIMAL spans (bounded by doc
    *      length — the window key is the doc id, so a 100 TB corpus
    *      sorts millions of tiny partitions in parallel, no global
    *      sort anywhere);
    *   5. one doc-keyed join rehydrates span text from the original
    *      column.
    *
    * Fingerprint collisions (~occurrences²/2⁶⁵) could merge two
    * distinct grams; at any realistic corpus size the expected count
    * is << 1, and the q82 oracle computes the SAME fingerprints
    * (`md5_number_lower`), so both engines agree bit-for-bit
    * regardless. Output: (doc_id, span_start, n_tokens, span_text),
    * positions 1-based over the space-split token list. */
  def duplicatedSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8,
      minDocs: Int = 2): DataFrame = {
    require(n >= 1, s"gram length must be >= 1, got $n")
    require(minDocs >= 2,
      s"minDocs < 2 would mark every gram duplicated, got $minDocs")
    val gramsUdf = udf((t: String) =>
      if (t == null) Array.empty[Long] else Kernels.gramMd5Positions(t, n))
    val postings = df
      .select(col(idCol).cast("long").as("doc_id"),
        posexplode(gramsUdf(col(textCol))).as(Seq("_p0", "_gh")))
      .select(col("doc_id"), (col("_p0") + 1).cast("long").as("pos"),
        col("_gh"))
    val dup = postings.groupBy("_gh")
      .agg(countDistinct(col("doc_id")).as("_nd"))
      .filter(col("_nd") >= minDocs)
      .select("_gh")
    val hits = postings.join(dup, "_gh").select("doc_id", "pos")
    val wDoc = Window.partitionBy("doc_id").orderBy("pos")
    // islands: a duplicated gram at pos covers tokens [pos, pos+n-1];
    // it extends the running span iff pos <= prev_pos + n (overlap or
    // adjacency). First row's lag is null -> coalesce to a sentinel
    // that always breaks.
    val spans = hits
      .withColumn("_brk",
        when(col("pos") >
          coalesce(lag(col("pos"), 1).over(wDoc), lit(-2L * n)) + n, 1L)
          .otherwise(0L))
      .withColumn("_isl", sum(col("_brk")).over(
        wDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("_isl"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + (n - 1)).as("span_end"))
    val toks = df.select(col(idCol).cast("long").as("doc_id"),
      filter(split(coalesce(col(textCol), lit("")), " "),
        w => w =!= "").as("_w"))
    spans.join(toks, "doc_id")
      .select(col("doc_id"), col("span_start"),
        (col("span_end") - col("span_start") + 1L).as("n_tokens"),
        array_join(
          slice(col("_w"), col("span_start").cast("int"),
            (col("span_end") - col("span_start") + 1L).cast("int")),
          " ").as("span_text"))
  }

  /** The cleaner behind [[duplicatedSpans]]: excise every duplicated
    * span from every document and emit the rebuilt text — the
    * "remove the verbatim passage wherever it recurs" action the
    * substring-dedup literature applies after detection. Every doc
    * comes back (docs without duplicated spans keep all their tokens;
    * the rebuilt text is whitespace-normalized on both engines by
    * construction), with the token accounting curation needs:
    * (doc_id, clean_text, kept_tokens, removed_tokens).
    *
    * Cost on top of detection: one per-doc span collect (bounded by
    * doc length), one doc-keyed left join, one kernel pass per doc —
    * no new shuffle shape. */
  def removeDuplicatedSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8,
      minDocs: Int = 2): DataFrame = {
    val spans = duplicatedSpans(df, idCol, textCol, n, minDocs)
    val ranges = spans.groupBy("doc_id")
      .agg(sort_array(collect_list(
        struct(col("span_start"), col("n_tokens")))).as("_rs"))
    val toks = df.select(col(idCol).cast("long").as("doc_id"),
      filter(split(coalesce(col(textCol), lit("")), " "),
        w => w =!= "").as("_w"))
    val exciseUdf = udf(
      (w: scala.collection.Seq[String],
       starts: scala.collection.Seq[Long],
       lens: scala.collection.Seq[Long]) => {
        val drop = new Array[Boolean](w.length)
        if (starts != null && lens != null) {
          var j = 0
          while (j < starts.length) {
            val start = starts(j).toInt; val len = lens(j).toInt
            var p = start
            while (p < start + len && p <= w.length) {
              drop(p - 1) = true; p += 1
            }
            j += 1
          }
        }
        val sb = new java.lang.StringBuilder()
        var kept = 0L
        var i = 0
        while (i < w.length) {
          if (!drop(i)) {
            if (kept > 0L) sb.append(' ')
            sb.append(w(i)); kept += 1L
          }
          i += 1
        }
        (sb.toString, kept, w.length - kept)
      })
    toks.join(ranges, Seq("doc_id"), "left")
      .select(col("doc_id"),
        exciseUdf(col("_w"),
          transform(col("_rs"), r => r.getField("span_start")),
          transform(col("_rs"), r => r.getField("n_tokens"))).as("_c"))
      .select(col("doc_id"), col("_c._1").as("clean_text"),
        col("_c._2").as("kept_tokens"), col("_c._3").as("removed_tokens"))
  }

  /** Per-period novelty rate — the dedup health monitor for a
    * continuously-ingesting corpus: bucket rows into ingest periods
    * by `periodCol` (a batch id, an epoch day — any integral
    * ordering key), and report per period how many rows are NEW
    * content (their digest's FIRST occurrence, first = minimum
    * (period, tie) — ingest order) vs re-crawled duplicates.
    * A falling novelty rate is the signal to retire a source or
    * tighten the crawl frontier BEFORE paying to process it.
    *
    * Shape: one digest-keyed partial agg finds each content's first
    * occurrence (min of the orderable (period, tie) pair via a
    * struct min — exact, no window), one (period)-keyed agg counts
    * rows, and the first-occurrence frame re-aggregates by its
    * period; a left join stitches the report (periods with zero new
    * content emit 0, not a missing row). dup_rate = 1 − new/rows,
    * one IEEE division.
    *
    * Output: (period, n_rows, n_new, dup_rate), one row per
    * observed period. */
  def noveltyByPeriod(
      df: DataFrame,
      idCol: String,
      textCol: String,
      periodCol: String): DataFrame = {
    val pt = df.schema(periodCol).dataType
    require(Seq("long", "integer", "short", "byte").contains(pt.typeName),
      s"periodCol $periodCol must be integral, got ${pt.typeName}")
    Seq("n_rows", "n_new", "dup_rate", "_h", "_first").foreach { r =>
      require(!df.columns.contains(r),
        s"input column name $r is reserved by noveltyByPeriod")
    }
    val base = df.select(col(periodCol).cast("long").as("period"),
      col(idCol).as("_id"), md5(col(textCol)).as("_h"))
    val firsts = base
      .groupBy("_h")
      .agg(min(struct(col("period"), col("_id"))).as("_first"))
      .select(col("_first.period").as("period"))
      .groupBy("period").agg(count(lit(1)).as("n_new"))
    val rows = base.groupBy("period").agg(count(lit(1)).as("n_rows"))
    rows.join(firsts, Seq("period"), "left")
      .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
      .withColumn("dup_rate",
        lit(1.0) - expr("CAST(n_new AS DOUBLE) / CAST(n_rows AS DOUBLE)"))
  }

  /** Content-defined chunk table (the rsync/LBFS dedup family):
    * every document splits at content-determined boundaries
    * ([[Kernels.cdcChunks]] — md5-windowed rolling condition, mean
    * chunk ≈ `modulus` chars), and each chunk carries its content
    * md5 plus how many OTHER documents contain a byte-identical
    * chunk. This is the dedup that survives INSERTIONS: a shifted
    * copy re-synchronizes at the next content boundary, so its
    * later chunks still collide — where fixed-size blocks and even
    * span dedup's gram grid lose alignment. (Substring span dedup,
    * [[duplicatedSpans]], finds shared PASSAGES; CDC finds shared
    * STORAGE — the two answer different questions.)
    *
    * Scale shape: chunking is one map pass (per-doc kernel, JIT'd);
    * the duplicate count is one partial agg keyed by chunk md5 and
    * one equi-join back — the digest-keyed shuffle discipline of
    * [[exactDuplicates]]; chunk payloads never shuffle (only
    * doc_id + md5 leave the map side).
    *
    * Output: (doc_id, chunk_idx 1-based, start 1-based, chunk_len,
    * chunk_md5, dup_docs = docs other than this one sharing the
    * chunk md5). */
  def cdcChunkTable(
      df: DataFrame,
      idCol: String,
      textCol: String,
      window: Int = 16,
      modulus: Int = 64): DataFrame = {
    val wLocal = window
    val mLocal = modulus
    val chunksUdf = udf((text: String) =>
      if (text == null) Array.empty[Kernels.CdcChunk]
      else Kernels.cdcChunks(text, wLocal, mLocal))
    val chunks = df
      .select(col(idCol).cast("long").as("doc_id"),
        posexplode(chunksUdf(col(textCol))).as(Seq("_c0", "ch")))
      .select(col("doc_id"), (col("_c0") + 1).cast("long").as("chunk_idx"),
        col("ch.start").as("start"), col("ch.len").as("chunk_len"),
        col("ch.chunkMd5").as("chunk_md5"))
    val docsPerChunk = chunks
      .select(col("chunk_md5"), col("doc_id")).distinct()
      .groupBy("chunk_md5").agg(count(lit(1)).as("_docs"))
    chunks.join(docsPerChunk, "chunk_md5")
      .select(col("doc_id"), col("chunk_idx"), col("start"),
        col("chunk_len"), col("chunk_md5"),
        (col("_docs") - 1L).as("dup_docs"))
  }
}
