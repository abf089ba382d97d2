package graft.queries

import graft.queries.Catalog.Q


/** North-star extension queries (SURVEY §7.2 M4): dedup, similarity
  * search, text analysis, multimodal — each a `queries()` entry over
  * the driver fixtures, oracle-backed wherever DuckDB can express the
  * identical computation (md5 digests, sequential-double folds,
  * integer set algebra). Queries whose kernels hash with xxhash64 or
  * run JVM-side (SimHash, MinHash buckets, ANN buckets, codec stubs)
  * carry no SQL oracle — the driver records rows-only checks and the
  * ScalaTest specs pin their semantics instead.
  *
  * DuckDB dialect notes (oracle side only): str_split/list_filter for
  * words, list_transform+range for n-grams, `\x{4e00}` RE2 escapes vs
  * Java's `一`, list_aggregate(...,'sum') as the sequential fold.
  */
object Extensions {

  /** Every extension query, concatenated across the per-family files
    * (ExtText / ExtDedup / ExtSimilarity / ExtStreaming /
    * ExtMultimodal / ExtCuration / ExtProfile / ExtAnalytics /
    * ExtGovernance). The split is navigational only; the registry
    * SparkEntry builds from this is unchanged. */
  def all: Seq[Q] =
    ExtText.all ++ ExtDedup.all ++ ExtSimilarity.all ++
      ExtStreaming.all ++ ExtMultimodal.all ++ ExtCuration.all ++
      ExtProfile.all ++ ExtAnalytics.all ++ ExtGovernance.all
}
