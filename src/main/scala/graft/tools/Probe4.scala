package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc round-4 probe (dev tool, not part of the driver contract):
  * runs the queries this round touched, printing per-query wall time
  * and row counts; the sampled-recall gates log their measured values
  * to stderr on the way through. */
object Probe4 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q40_sim_ann_lsh", "q48_sim_ann_ivf", "q63_sim_ann_int8",
        "q69_token_budget", "q77_percentiles_approx",
        "q79_dedup_clusters_incremental", "q80_percentiles_tokens")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$name%-34s $dt%8.3f s  ($n rows)")
    }
    spark.stop()
  }
}
