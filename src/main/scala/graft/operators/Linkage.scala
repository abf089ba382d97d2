package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Record linkage by bounded edit distance — the entity-resolution
  * primitive: "cold bolt" and "old bolt" are the same product family
  * even though no exact or token-set method links them. Runs on the
  * attribute DICTIONARY (distinct values + their row counts), not the
  * row stream: a 100 TB corpus's name dictionary is sublinear in the
  * corpus, and linking rows directly would re-emit every exact-dup
  * pair quadratically per group ([[Dedup]] owns that problem).
  *
  * Blocking is Ed-Join-style q-gram count filtering (Xiao, Wang &
  * Lin, VLDB'08): an edit operation destroys at most q q-grams, so
  * ed(x,y) <= k implies the gram MULTISETS overlap in at least
  * max(|Gx|,|Gy|) − q·k elements — and therefore x's first q·k+1
  * grams under any global total order must hit y's gram list.
  * Candidates come from one inverted-index equi-join of those
  * prefixes (rarest-gram-first order keeps the index's hot lists
  * out of the prefix, the same trick as [[Dedup]]'s AllPairs);
  * verification is the codegen'd native `levenshtein`. Exact recall
  * by the theorem — a spec pins blocked == quadratic on fixtures.
  *
  * Multiset gram identity is (gram, occurrence-index), so repeated
  * grams inside one string block correctly.
  */
object Linkage {

  /** Sorted-neighborhood blocking (Hernández & Stolfo's merge/purge):
    * candidates are dictionary values within `window` positions of
    * each other in SORTED order, verified by native `levenshtein`
    * <= `maxDist`. The complementary blocking to
    * [[nameVariantPairs]]'s q-gram filter — O(n·w) candidates
    * TOTAL regardless of string content (q-gram blocking can
    * degenerate on low-diversity dictionaries), at the documented
    * recall cost: a typo in the leading characters moves a value far
    * away in sort order and the pair is missed. Production ER runs
    * BOTH passes and unions (multi-pass sorted neighborhood); this
    * operator is one pass over one sort key.
    *
    * No global window anywhere: the global rank comes from the
    * range-partition + zipWithIndex spelling ([[LanguageModel.vocab]]
    * — each partition sorts locally, ids attach per-partition), and
    * candidate pairs come from a bucketed equi-join on rank cells
    * (`rank div window` joins its own and the next cell, which
    * covers every pair with rank difference < window exactly once).
    *
    * Output: (name_a, name_b, rank_gap, dist), name_a < name_b in
    * sort order (rank order = lexicographic, so also name order). */
  def sortedNeighborhood(
      df: DataFrame,
      strCol: String,
      window: Int = 8,
      maxDist: Int = 2): DataFrame = {
    require(window >= 2 && window <= 10000,
      s"window must be in [2, 10000], got $window")
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val spark = df.sparkSession
    val distinctNames = df
      .filter(col(strCol).isNotNull)
      .select(col(strCol).as("name")).distinct()
      .repartitionByRange(col("name").asc)
      .sortWithinPartitions(col("name").asc)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("name",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("rank",
        org.apache.spark.sql.types.LongType, nullable = false)))
    val ranked = spark.createDataFrame(
      distinctNames.rdd.zipWithIndex().map { case (r, i) =>
        org.apache.spark.sql.Row(r.getString(0), i)
      }, schema)
    val w = window.toLong
    val cells = ranked
      .withColumn("_cell", explode(array(
        (col("rank") / w).cast("long"),
        (col("rank") / w).cast("long") + 1L)))
    val right = ranked
      .select(col("name").as("name_b"), col("rank").as("_rb"),
        (col("rank") / w).cast("long").as("_cell"))
    cells.join(right, "_cell")
      .filter(col("_rb") > col("rank") &&
        col("_rb") - col("rank") < w)
      .withColumn("dist", levenshtein(col("name"), col("name_b")))
      .filter(col("dist") <= maxDist)
      .select(col("name").as("name_a"), col("name_b"),
        (col("_rb") - col("rank")).as("rank_gap"), col("dist"))
  }

  /** All unordered pairs of distinct `strCol` values with edit
    * distance <= `maxDist`, with each value's row count carried.
    * Strings must be non-null and at least `q` chars (loud contract —
    * a sub-q string has no grams and would silently never link).
    *
    * Output: (name_a, name_b, dist, n_a, n_b), name_a < name_b.
    *
    * Shape: one dictionary partial agg, one gram explode over the
    * DICTIONARY (not the rows), one frequency agg, one per-name
    * window for the q·k+1 prefix, one index equi-join on
    * (gram, occ), length-filtered, then one `levenshtein` per
    * candidate. Every join equi-keyed; nothing driver-side. */
  def nameVariantPairs(
      df: DataFrame,
      strCol: String,
      maxDist: Int = 2,
      q: Int = 2): DataFrame = {
    require(maxDist >= 0 && maxDist <= 8,
      s"maxDist must be in [0, 8], got $maxDist")
    require(q >= 1 && q <= 8, s"q must be in [1, 8], got $q")

    val dict = df.groupBy(col(strCol).as("name"))
      .agg(count(lit(1)).as("n"))

    val bad = dict
      .filter(col("name").isNull || length(col("name")) < q)
      .limit(1).count()
    require(bad == 0L,
      s"nameVariantPairs: null or sub-$q-char $strCol values present " +
        "— they carry no q-grams and would silently never link; " +
        "filter or pad them explicitly")

    // (name, gram, occ): occ is the occurrence index that makes the
    // gram MULTISET a set of (g, occ) elements.
    val posting = dict
      .select(col("name"), explode(expr(
        s"transform(sequence(0, length(name) - $q), " +
          s"i -> substring(name, i + 1, $q))")).as("g"))
      .withColumn("occ", row_number().over(
        Window.partitionBy("name", "g").orderBy("name")))
    val dfreq = posting.groupBy("g").agg(count(lit(1)).as("gdf"))

    val prefixLen = q * maxDist + 1
    val wName = Window.partitionBy("name").orderBy("gdf", "g", "occ")
    val prefix = posting.join(dfreq, "g")
      .withColumn("_rk", row_number().over(wName))
      .filter(col("_rk") <= prefixLen)
      .select(col("name"), col("g"), col("occ"))

    val candidates = prefix.as("l")
      .join(posting.as("r"),
        col("l.g") === col("r.g") && col("l.occ") === col("r.occ") &&
          col("l.name") =!= col("r.name"))
      .select(least(col("l.name"), col("r.name")).as("name_a"),
        greatest(col("l.name"), col("r.name")).as("name_b"))
      .distinct()
      .filter(abs(length(col("name_a")) - length(col("name_b")))
        <= maxDist)

    val verified = candidates
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= maxDist)

    verified
      .join(dict.select(col("name").as("name_a"), col("n").as("n_a")),
        "name_a")
      .join(dict.select(col("name").as("name_b"), col("n").as("n_b")),
        "name_b")
      .select(col("name_a"), col("name_b"), col("dist"),
        col("n_a"), col("n_b"))
  }
}
