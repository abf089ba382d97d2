package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage breakdown for the q40 ANN path (dev tool). */
object Probe6 {
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
    def t[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$what%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    println(s"embeddings: ${e.count()} rows")
    (1 to 2).foreach { round =>
      spark.catalog.clearCache()
      println(s"--- round $round ---")
      val cand = t("annCandidates") {
        val c = graft.operators.Similarity.annCandidates(
          e, "vec_id", "embedding", tables = 16, bits = 6)
        println(s"  pairs: ${c.count()}")
        c
      }
      val ann = t("annTopK full") {
        graft.operators.Similarity.annTopK(
          e, "vec_id", "embedding", k = 10, tables = 16, bits = 6).count()
      }
      val exact = t("sampled exact reference") {
        graft.operators.Similarity.bruteForceTopK(
          e, "vec_id", "embedding",
          e.filter(col("vec_id") % 10 === 0), "vec_id", "embedding", 10).count()
      }
      println(s"  ann rows $ann exact rows $exact")
    }
    spark.stop()
  }
}
