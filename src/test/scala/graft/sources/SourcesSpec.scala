package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SourcesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", DoubleType)))

  test("csv round-trip with explicit schema") {
    val dir = Files.createTempDirectory("graft-src").toString
    import spark.implicits._
    val df = Seq((1L, "a", 0.5), (2L, "b", 1.5)).toDF("id", "name", "score")
    Sources.writeCsv(df, s"$dir/csv")
    val back = Sources.csv(spark, s"$dir/csv", schema)
    assert(back.schema == schema)
    assert(back.orderBy("id").collect().map(_.toSeq).toSeq ==
      df.orderBy("id").collect().map(_.toSeq).toSeq)
  }

  test("json-lines round-trip with explicit schema") {
    val dir = Files.createTempDirectory("graft-src-json").toString
    import spark.implicits._
    val df = Seq((1L, "x", 2.0)).toDF("id", "name", "score")
    df.write.json(s"$dir/json")
    val back = Sources.jsonLines(spark, s"$dir/json", schema)
      .select("id", "name", "score")
    assert(back.collect().map(_.toSeq).toSeq == df.collect().map(_.toSeq).toSeq)
  }

  test("partitioned parquet sink prunes partitions on read") {
    val dir = Files.createTempDirectory("graft-src-pq").toString
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "tag")
    Sources.writeParquet(df, s"$dir/pq", partitionBy = Seq("tag"))
    val pruned = Sources.parquet(spark, s"$dir/pq").filter(col("tag") === "a")
    assert(pruned.count() == 2)
    // partition pruning: only the tag=a directory is scanned
    val scan = pruned.queryExecution.executedPlan.toString
    assert(!scan.contains("tag=b"), scan.take(1000))
  }
}
