package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Degenerate-input sweep: empty corpora, singletons, k larger than
  * the corpus. Operators must return empty/short results with the
  * same schema as the populated path — never throw, never change
  * shape (downstream unions and writers depend on schema stability). */
class EdgeCasesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private def emptyEmb =
    Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
  private def tinyEmb = Seq(
    (1L, Array(1f, 0f, 0f)), (2L, Array(0.9f, 0.1f, 0f))
  ).toDF("vec_id", "embedding")

  test("dedup operators on empty and singleton corpora") {
    assert(Dedup.exactGroups(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.minHashLshPairs(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.ngramJaccardPairs(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.simHashPairs(emptyDocs, "doc_id", "text").count() == 0)
    val one = Seq((1L, "a single document here")).toDF("doc_id", "text")
    assert(Dedup.minHashLshPairs(one, "doc_id", "text").count() == 0)
    assert(Dedup.embeddingNearDupPairs(emptyEmb, "vec_id", "embedding", 0.5)
      .count() == 0)
  }

  test("ivfTopK on an empty corpus: empty result, schema matches populated path") {
    val empty = Similarity.ivfTopK(emptyEmb, "vec_id", "embedding", k = 5)
    assert(empty.count() == 0)
    val populated = Similarity.ivfTopK(tinyEmb, "vec_id", "embedding", k = 5)
    assert(empty.schema == populated.schema,
      s"${empty.schema} vs ${populated.schema}")
    assert(empty.schema == StructType(Seq(
      StructField("query_id", LongType, nullable = false),
      StructField("rank", LongType, nullable = false),
      StructField("nn_id", LongType, nullable = false),
      StructField("cos", DoubleType, nullable = false))))
  }

  test("k larger than the corpus: every neighbor ranked, nothing invented") {
    val res = Similarity.bruteForceTopK(
      tinyEmb, "vec_id", "embedding", tinyEmb, "vec_id", "embedding", k = 50)
      .collect()
    assert(res.length == 2) // each query has exactly 1 non-self neighbor
    val ann = Similarity.annTopK(tinyEmb, "vec_id", "embedding", k = 50,
      tables = 4, bits = 2, dim = 3)
      .collect()
    assert(ann.length <= 2)
    val ivf = Similarity.ivfTopK(tinyEmb, "vec_id", "embedding", k = 50)
      .collect()
    assert(ivf.length == 2)
  }

  test("quantization of empty and zero vectors") {
    val (s, q) = Kernels.quantizeInt8(Seq.empty[Float])
    assert(s == 0.0 && q.isEmpty)
    assert(Kernels.int8Cosine(Seq.empty[Byte], Seq.empty[Byte]) == 0.0)
    val df = Seq((1L, Array.empty[Float]), (2L, Array(0f, 0f)))
      .toDF("id", "v")
    val rows = df.select(Quantize.int8(col("v")).as("qv"))
      .select(col("qv.scale"), size(col("qv.q"))).collect()
    assert(rows.map(r => (r.getDouble(0), r.getInt(1))).toSeq ==
      Seq((0.0, 0), (0.0, 2)))
  }

  test("sessionizeBatch and dedupBatch on empty events") {
    val empty = Seq.empty[(Long, java.sql.Timestamp, String)]
      .toDF("user_id", "ts", "event_type")
    assert(graft.streaming.Streams.sessionizeBatch(empty, 1000L).count() == 0)
    assert(graft.streaming.Streams.dedupBatch(
      empty, Seq("user_id", "event_type")).count() == 0)
  }

  test("scrub and text functions on empty strings") {
    val df = Seq("").toDF("text")
    val r = df.select(
      graft.functions.TextFunctions.scrubPii(col("text")),
      graft.functions.TextFunctions.urlCount(col("text")),
      graft.functions.TextFunctions.fingerprint(col("text"))).head()
    assert(r.getString(0) == "")
    assert(r.getLong(1) == 0L)
    assert(r.getString(2).length == 32) // md5 fallback
  }
}
