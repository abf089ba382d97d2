package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc round-4 perf probe (dev tool): times the ANN queries at the
  * bench's sf/parallelism with per-query cache isolation. */
object Probe5 {
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
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q40_sim_ann_lsh", "q63_sim_ann_int8")
    // warm the JVM/scan once, then measure
    names.foreach { name =>
      (1 to 2).foreach { run =>
        val fn = graft.SparkEntry.queries(name)
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"$name%-34s run$run $dt%8.3f s  ($n rows)")
      }
    }
    spark.stop()
  }
}
