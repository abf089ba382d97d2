package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Evidence for the SCALING.md claim that the big-big join
  * (lineitem ⋈ orders) can be made exchange-free by co-bucketing both
  * tables on the join key — the layout decision that matters most at
  * 100 TB, where that shuffle IS the job. */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("co-bucketed tables join without a shuffle exchange") {
    // warehouse dir is a static conf — the default (./spark-warehouse,
    // gitignored) is used; DROP TABLE below removes the managed files
    val li = spark.read.parquet(s"${TestSpark.sf0001}/lineitem.parquet")
    val o = spark.read.parquet(s"${TestSpark.sf0001}/orders.parquet")
    li.write.mode("overwrite").bucketBy(4, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed")
    o.write.mode("overwrite").bucketBy(4, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("o_bucketed")
    try {
      // disable broadcast so the join would otherwise shuffle both sides
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      // bucketed scan feeds the sort-merge join directly: the only
      // exchange left is the small post-join aggregation shuffle
      val joinSection = plan.split("HashAggregate").last
      assert(joinSection.contains("SortMergeJoin") ||
        plan.contains("SortMergeJoin"), plan.take(2000))
      val exchangesBelowJoin = plan
        .linesIterator.dropWhile(!_.contains("SortMergeJoin"))
        .count(_.contains("Exchange hashpartitioning"))
      assert(exchangesBelowJoin == 0,
        s"join inputs should be exchange-free:\n${plan.take(3000)}")
      // and the result is still right
      assert(joined.collect().map(_.getLong(1)).sum ==
        spark.table("li_bucketed").count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}
