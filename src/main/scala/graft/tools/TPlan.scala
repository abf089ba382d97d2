package graft.tools
import org.apache.spark.sql.SparkSession
/** Dev tool: print the join/exchange/aggregate skeleton of named
  * catalog queries' executed plans — the plan-shape audit the
  * COVERAGE notes quote. */
object TPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (q <- args) {
      println(s"===== $q")
      val df = graft.SparkEntry.queries(q)(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      val interesting = plan.linesIterator.filter(l =>
        l.contains("Join") || l.contains("Exchange") ||
        l.contains("Aggregate") || l.contains("Cartesian") ||
        l.contains("Window") || l.contains("Scan parquet"))
      interesting.foreach(l => println(l.take(150)))
    }
    spark.stop()
  }
}
