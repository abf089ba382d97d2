package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-4 LSH tuning probe: recall + wall time for table-count
  * variants of the q40 path at the current SF (dev tool). */
object Probe7 {
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
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val exact = graft.operators.Similarity.bruteForceTopK(
      e, "vec_id", "embedding",
      e.filter(col("vec_id") % 10 === 0), "vec_id", "embedding", 10)
    val exactPairs = exact.select("query_id", "nn_id")
    exactPairs.cache().count()
    for (tables <- Seq(16, 12, 10); bits <- Seq(6, 7)) {
      (1 to 2).foreach { run =>
        spark.catalog.clearCache(); exactPairs.cache().count()
        val t0 = System.nanoTime()
        val ann = graft.operators.Similarity.annTopK(
          e, "vec_id", "embedding", k = 10, tables = tables, bits = bits)
        val recall = graft.operators.Gates.pairRecall(
          ann.filter(col("query_id") % 10 === 0), exactPairs)
        val dt = (System.nanoTime() - t0) / 1e9
        if (run == 2)
          println(f"tables=$tables bits=$bits  recall=$recall%.4f  $dt%7.3f s")
      }
    }
    spark.stop()
  }
}
