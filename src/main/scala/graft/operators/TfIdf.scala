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

  /** BM25 ranked retrieval — score every document against a bag-of-
    * words query and return the top k: the search primitive that
    * turns the wordcount/TF-IDF family into an engine a user can
    * actually ASK things ("find the docs about X in this 100 TB
    * corpus"). Okapi BM25 with the standard k1/b saturation and
    * length normalization, except the idf factor is the RATIONAL
    * Robertson–Spärck-Jones form (N − df + 0.5)/(df + 0.5) WITHOUT
    * the ln() — the same rounding-portability dodge as [[termScores]]
    * (IEEE division is identically rounded everywhere, libm log is
    * not), so scores and rankings are bitwise cross-engine. Same
    * monotone-in-1/df shape; the saturation and length terms are
    * untouched. Documented, deliberate deviation from textbook BM25.
    *
    * Determinism: each doc's score folds its per-term contributions
    * in SORTED TERM ORDER (collect_list order is partitioning
    * noise; the array_sort fixes it), matching an ORDER BY term
    * list-sum on any SQL engine. Ties in score break by doc id.
    *
    * Scale shape: query terms are a handful — the token explode
    * collapses against an In filter BEFORE any shuffle, so tf
    * aggregates a near-empty stream on (id, term), df on ≤|query|
    * keys; corpus length stats ride as one broadcast aggregate row.
    * The final rank is orderBy(score).limit(k) — a TakeOrdered, no
    * global sort — and the row_number window runs on the already-
    * k-row result. One corpus scan end to end.
    *
    * Reference analog: the wordcount query family (the default
    * (line, 1) map, `Imagine_MapReduce/Mapper.h:268-270`, into the
    * sum-by-key reduce, `MapReduceUtil.cpp:114-135`) upgraded to
    * ranked retrieval. */
  def bm25TopK(
      df: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(k >= 1, s"k must be >= 1, got $k")
    val terms = queryTerms.distinct.sorted
    val docs = df.select(col(idCol).as("id"),
      TextFunctions.tokenCount(col(textCol)).as("dl"),
      TextFunctions.words(col(textCol)).as("w"))
    val stats = docs.agg(sum("dl").as("tot"), count(lit(1)).as("n"))
    val tf = docs.select(col("id"), explode(col("w")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nD = col("n").cast("double")
    val dfD = col("df").cast("double")
    val tfD = col("tf").cast("double")
    val dlD = col("dl").cast("double")
    val totD = col("tot").cast("double")
    val contrib =
      ((nD - dfD + lit(0.5)) / (dfD + lit(0.5))) *
        ((tfD * lit(k1 + 1.0)) /
          (tfD + lit(k1) * (lit(1.0 - b) + lit(b) * (dlD / (totD / nD)))))
    val scored = tf
      .join(broadcast(dfreq), "term")
      .join(docs.select("id", "dl"), "id")
      .crossJoin(broadcast(stats))
      .select(col("id"), col("term"), contrib.as("contrib"))
      .groupBy("id")
      .agg(aggregate(
        array_sort(collect_list(struct(col("term"), col("contrib")))),
        lit(0.0), (acc, s) => acc + s.getField("contrib")).as("score"))
    val top = scored.orderBy(col("score").desc, col("id")).limit(k)
    Ranks.rankBounded(top, col("score").desc, col("id"))
      .select(col("rank"), col("id"), col("score"))
  }

  /** Exact phrase search via positional postings — the retrieval
    * primitive [[bm25TopK]]'s bag-of-words scoring cannot express:
    * find every document containing the words of `phrase`
    * CONSECUTIVELY, and how often. The standard inverted-index
    * spelling: each phrase-word occurrence at token position p
    * proposes anchor p − i for every phrase slot i holding that word
    * (repeated-word phrases propose several), and an anchor where
    * all |phrase| slots check in is a match — one grouped count
    * instead of a per-document regex scan.
    *
    * Scale shape: the token posexplode collapses against an In
    * filter on the phrase's words BEFORE any shuffle, so only
    * phrase-word postings (id, anchor, slot) ever move; the match
    * test is a partial-aggregated groupBy on (id, anchor) counting
    * distinct slots, and the per-doc totals aggregate the
    * already-tiny match stream. Document bodies are read once,
    * never shuffled. Output: (id, n_matches) for matching documents
    * only, n_matches = number of distinct start positions. */
  def phraseSearch(
      df: DataFrame,
      idCol: String,
      textCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must be non-empty")
    val slots: Map[String, Seq[Int]] =
      phrase.zipWithIndex.groupBy(_._1).map { case (t, l) => t -> l.map(_._2) }
    val words = phrase.distinct
    val slotsUdf = udf((t: String) => slots(t).toArray)
    val postings = df
      .select(col(idCol).as("id"),
        posexplode(TextFunctions.words(col(textCol))).as(Seq("pos", "term")))
      .filter(col("term").isin(words: _*))
      .select(col("id"), col("pos"), explode(slotsUdf(col("term"))).as("slot"))
      .select(col("id"), (col("pos") - col("slot")).as("anchor"), col("slot"))
      .filter(col("anchor") >= 0)
    postings
      .groupBy("id", "anchor")
      .agg(count_distinct(col("slot")).as("_k"))
      .filter(col("_k") === phrase.length)
      .groupBy("id")
      .agg(count(lit(1)).as("n_matches"))
  }

  /** Single-query n-gram Jaccard document search — the LOOKUP face of
    * the dedup family's set-similarity machinery ("is this draft
    * already in the corpus?", the dedup-as-a-service call): score
    * every document's shingle set against ONE query text and return
    * the top k by exact Jaccard. For a single query the right 100 TB
    * shape is NOT an index probe — it is one corpus scan with the
    * query's grams riding as an array literal: per-row
    * `array_intersect` (codegen'd) + a TakeOrdered top-k, no shuffle
    * of anything but k rows. Batch workloads (every doc vs every doc)
    * belong to [[Dedup.minHashLshPairs]]; standing query streams to
    * the persisted-index probes. Output: (rank, id, jaccard), ties by
    * id; docs sharing no gram are not candidates. */
  def jaccardTopK(
      df: DataFrame,
      idCol: String,
      textCol: String,
      query: String,
      k: Int,
      n: Int = 3): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val qGrams: Array[String] = Kernels.wordNgrams(
      if (query == null) "" else query, n)
    require(qGrams.nonEmpty,
      s"query shorter than n=$n words — no shingles to match")
    val ngramsUdf = udf((t: String) =>
      if (t == null) Array.empty[String] else Kernels.wordNgrams(t, n))
    val qArr = array(qGrams.map(lit).toIndexedSeq: _*)
    val scored = df
      .select(col(idCol).as("id"), ngramsUdf(col(textCol)).as("_g"))
      .withColumn("_inter", size(array_intersect(col("_g"), qArr)))
      .filter(col("_inter") > 0)
      .select(col("id"),
        (col("_inter").cast("double") /
          (size(col("_g")) + lit(qGrams.length) - col("_inter"))
            .cast("double")).as("jaccard"))
    val top = scored.orderBy(col("jaccard").desc, col("id")).limit(k)
    Ranks.rankBounded(top, col("jaccard").desc, col("id"))
      .select("rank", "id", "jaccard")
  }

  /** Distinctive vocabulary per group — the corpus-forensics report
    * "which terms does THIS source use far more than the corpus
    * does": relevance ratio (a/Tg)/(b/T) spelled as a·T / (b·Tg) —
    * exact integer counts, one multiply per side, one division — for
    * every (group, term) with corpus support ≥ `minCorpusCount`
    * (rare-term inflation is the failure mode; the floor is the
    * fix), ranked top-k per group. Surfaces boilerplate signatures,
    * spam vocabularies, and domain drift before any model sees them.
    *
    * Shape: one token explode feeding the (group, term) and (term)
    * partial aggs; group totals ride back broadcast (groups-sized);
    * the corpus side joins token-keyed. Ranking is one
    * group-partitioned window. Ties break by term so the k-cutoff is
    * total. Output: (group, term, n_group, n_corpus, score, rank). */
  def distinctiveTerms(
      df: DataFrame,
      groupCol: String,
      textCol: String,
      minCorpusCount: Long = 10L,
      k: Int = 10): DataFrame = {
    require(k >= 1 && k <= 10000, s"k must be in [1, 10000], got $k")
    require(minCorpusCount >= 1, s"minCorpusCount must be >= 1")
    val toks = df.select(col(groupCol),
      explode(TextFunctions.words(col(textCol))).as("term"))
    val byGroup = toks.groupBy(col(groupCol), col("term"))
      .agg(count(lit(1)).as("n_group"))
    val corpus = toks.groupBy("term").agg(count(lit(1)).as("n_corpus"))
      .filter(col("n_corpus") >= minCorpusCount)
    val groupTotals = byGroup.groupBy(col(groupCol))
      .agg(sum("n_group").as("_tg"))
    val corpusTotal = corpus.agg(sum("n_corpus").as("_t"))
    val scored = byGroup
      .join(corpus, "term")
      .join(broadcast(groupTotals), Seq(groupCol))
      .crossJoin(broadcast(corpusTotal))
      .withColumn("score",
        expr("(CAST(n_group AS DOUBLE) * CAST(_t AS DOUBLE)) " +
          "/ (CAST(n_corpus AS DOUBLE) * CAST(_tg AS DOUBLE))"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("score").desc, col("term"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(groupCol), col("term"), col("n_group"),
        col("n_corpus"), col("score"), col("rank"))
  }

  /** Top-k token co-occurrence pairs by LIFT — the collocation /
    * topic-affinity report ("which terms travel together far more
    * often than chance") a corpus analyst reads before building
    * phrase lists or merge rules. Lift = P(a,b) / (P(a)·P(b))
    * spelled as n_ab·N / (df_a·df_b): exact integer counts cast once
    * to double, one multiply each side, one divide — bitwise
    * cross-engine, and monotone in PMI (PMI = log lift) without
    * libm's cross-engine rounding.
    *
    * Scale shape — the quadratic is VOCABULARY-PRUNED, never free:
    * document-level term presence (distinct (doc, term), one
    * partial-agg shuffle) → document frequencies (term-keyed
    * partial agg) → top-`maxVocab` terms by (df desc, term)
    * (bounded TakeOrdered, broadcast back) → the pair self-join runs
    * doc-keyed over ONLY vocabulary hits, so per-doc fan-out is
    * capped at C(maxVocab, 2) regardless of document length and in
    * practice by the handful of vocab terms a doc contains. Pair
    * counts partial-aggregate on (term_a, term_b); a doc-frequency
    * join (broadcast — vocab-sized) and one broadcast single-row
    * corpus count finish the score. No window, no global sort beyond
    * the final bounded top-k.
    *
    * Ties in lift break by (term_a, term_b) so the ranking — and the
    * k-cutoff — are total and deterministic.
    *
    * Reference analog: word-count composed with itself
    * (`Imagine_MapReduce/Mapper.h:268-270` map →
    * `MapReduceUtil.cpp:114-135` sum-by-key) — presence,
    * df, and pair counts are each that same sum-by-key shape; the
    * reference has no join to compose them. */
  def cooccurTopPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxVocab: Int = 200,
      minDf: Long = 2L,
      k: Int = 50): DataFrame = {
    require(maxVocab >= 2, s"maxVocab must be >= 2, got $maxVocab")
    require(k >= 1, s"k must be >= 1, got $k")
    val presence = df
      .select(col(idCol).as("_id"),
        explode(TextFunctions.words(col(textCol))).as("term"))
      .distinct()
    val vocab = presence
      .groupBy("term").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
      .orderBy(col("df").desc, col("term"))
      .limit(maxVocab)
    val hits = presence.join(broadcast(vocab.select("term")), "term")
    val pairs = hits.as("a")
      .join(hits.as("b"),
        col("a._id") === col("b._id") && col("a.term") < col("b.term"))
      .groupBy(col("a.term").as("term_a"), col("b.term").as("term_b"))
      .agg(count(lit(1)).as("n_xy"))
    val nDocs = df.agg(count(lit(1)).as("n_docs"))
    val scored = pairs
      .join(broadcast(vocab.select(col("term").as("term_a"),
        col("df").as("df_a"))), "term_a")
      .join(broadcast(vocab.select(col("term").as("term_b"),
        col("df").as("df_b"))), "term_b")
      .crossJoin(broadcast(nDocs))
      .select(col("term_a"), col("term_b"), col("n_xy"),
        col("df_a"), col("df_b"),
        ((col("n_xy").cast("double") * col("n_docs").cast("double")) /
          (col("df_a").cast("double") * col("df_b").cast("double")))
          .as("lift"))
    val top = scored
      .orderBy(col("lift").desc, col("term_a"), col("term_b")).limit(k)
    Ranks.rankBounded(top, col("lift").desc, col("term_a"), col("term_b"))
      .select("rank", "term_a", "term_b", "n_xy", "df_a", "df_b", "lift")
  }
}
