package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** Ad-hoc component timing probe (dev tool, not part of the driver
  * contract): times the pieces that make up the ANN queries so perf
  * work targets the measured bottleneck, not the guessed one. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    emb.cache().count()

    def time(name: String)(f: => Long): Unit = {
      f // warm
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  ($n rows)")
    }

    time("exactSelfTopK(bcast)") {
      Similarity.exactSelfTopK(emb, "vec_id", "embedding", 10).count()
    }
    time("exactSelfTopKBlocked") {
      Similarity.exactSelfTopKBlocked(emb, "vec_id", "embedding", 10).count()
    }
    time("annCandidates") {
      Similarity.annCandidates(emb, "vec_id", "embedding", tables = 16, bits = 6).count()
    }
    time("annTopK") {
      Similarity.annTopK(emb, "vec_id", "embedding", 10, tables = 16, bits = 6).count()
    }
    time("ivfTopK") {
      Similarity.ivfTopK(emb, "vec_id", "embedding", 10, nlist = 16, nprobe = 4).count()
    }
    time("annTopKInt8") {
      Similarity.annTopKInt8(emb, "vec_id", "embedding", 10, tables = 16, bits = 6).count()
    }
    time("nearDup(q56 shape)") {
      val e = emb.select("vec_id", "embedding")
      val planted = e.filter(col("vec_id") < 100)
        .select((col("vec_id") + 10000).as("vec_id"),
          transform(col("embedding"), x => (x * lit(0.5f)).cast("float")).as("embedding"))
      Dedup.embeddingNearDupPairs(e.unionByName(planted), "vec_id", "embedding",
        minCos = 0.99, tables = 8, bits = 12).count()
    }
    spark.stop()
  }
}
