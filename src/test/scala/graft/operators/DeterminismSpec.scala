package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Retry-determinism sweep: every candidate-generation operator must
  * be a pure function of row CONTENT — a stage retry or AQE re-plan
  * reorders and re-partitions inputs, and any partition-order
  * dependence silently corrupts results at cluster scale (the class
  * of bug fixed in Skew.saltedSum). Each operator is run over
  * adversarially re-distributed inputs and must produce identical
  * results, not merely equivalent ones. */
class DeterminismSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet(s"${TestSpark.sf0001}/documents.parquet")
    .select("doc_id", "text")
  private lazy val emb = spark.read
    .parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    .select("vec_id", "embedding")

  private def distributions(df: DataFrame): Seq[DataFrame] = Seq(
    df,
    df.repartition(3),
    df.repartition(17, col(df.columns.head)),
    df.orderBy(col(df.columns.head).desc),
    df.coalesce(1))

  private def pinned[T](name: String, runs: Seq[Set[T]]): Unit = {
    assert(runs.head.nonEmpty, s"$name: empty baseline makes the test vacuous")
    runs.tail.zipWithIndex.foreach { case (r, i) =>
      assert(r == runs.head, s"$name: distribution ${i + 1} diverged")
    }
  }

  test("minHashLshPairs is content-determined under any input distribution") {
    pinned("minhash", distributions(docs).map(d =>
      Dedup.minHashLshPairs(d, "doc_id", "text")
        .as[(Long, Long, Double)].collect().toSet))
  }

  test("simHashPairs (both hash variants) is content-determined") {
    pinned("simhash-xxh", distributions(docs).map(d =>
      Dedup.simHashPairs(d, "doc_id", "text")
        .as[(Long, Long, Long)].collect().toSet))
    pinned("simhash-md5", distributions(docs).take(3).map(d =>
      Dedup.simHashPairs(d, "doc_id", "text", md5Tokens = true)
        .as[(Long, Long, Long)].collect().toSet))
  }

  test("ngramJaccardPairs is content-determined") {
    pinned("jaccard", distributions(docs).map(d =>
      Dedup.ngramJaccardPairs(d, "doc_id", "text")
        .as[(Long, Long, Double)].collect().toSet))
  }

  test("annCandidates (incl. bucket-cap splits) is content-determined") {
    // cap forced low so the split path itself is exercised: the _sub
    // assignment must come from row content, never partition order
    pinned("ann", distributions(emb).map(d =>
      Similarity.annCandidates(d, "vec_id", "embedding",
        tables = 4, bits = 4, maxBucketSize = 20)
        .as[(Long, Long)].collect().toSet))
  }

  test("ivfTopK is content-determined (bounded sample is hash-ordered)") {
    pinned("ivf", distributions(emb).map(d =>
      Similarity.ivfTopK(d, "vec_id", "embedding", k = 5)
        .as[(Long, Long, Long, Double)].collect().toSet))
  }

  test("contaminationReport is content-determined") {
    val heldout = docs.filter(col("doc_id") % 10 === 0)
    pinned("decontaminate", distributions(docs.filter(col("doc_id") % 10 =!= 0))
      .map(d =>
        Decontaminate.contaminationReport(d, "doc_id", "text", heldout, "text", n = 3)
          .as[(Long, Long, Boolean)].collect().toSet))
  }

  test("TfIdf.topTerms is content-determined (score + term tiebreak total order)") {
    pinned("tfidf", distributions(docs).map(d =>
      TfIdf.topTerms(d, "doc_id", "text", k = 3)
        .as[(Long, Long, String, Long, Long, Double)].collect().toSet))
  }

  test("boilerplateScore is content-determined") {
    pinned("boilerplate", distributions(docs).map(d =>
      Boilerplate.boilerplateScore(d, "doc_id", "text", n = 3, minDocFrac = 0.02)
        .as[(Long, Long, Long, Double)].collect().toSet))
  }

  test("clusterAwareSplit (hashed) is content-determined") {
    val pairs = Dedup.minHashLshPairs(docs, "doc_id", "text")
      .select("id_a", "id_b")
    pinned("clusterSplit", distributions(docs.select("doc_id")).map(d =>
      Dedup.clusterAwareSplit(d, "doc_id", pairs, nBuckets = 7)
        .as[(Long, Long, Long)].collect().toSet))
  }
}
