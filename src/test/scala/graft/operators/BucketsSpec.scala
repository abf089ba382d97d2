package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BucketsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 1000 rows in bucket "hot", 30 in bucket "cold"
  private def fixture = {
    val hot = (0L until 1000L).map(i => (i, 0, 77L))
    val cold = (1000L until 1030L).map(i => (i, 0, 5L))
    (hot ++ cold).toDF("id", "tbl", "bkt")
  }

  test("within-cap buckets pass through untouched (_sub = 0)") {
    val capped = Buckets.capped(fixture, Seq("tbl", "bkt"), "id", 2000)
    assert(capped.filter(col("_sub") =!= 0L).count() == 0L)
    assert(capped.count() == 1030L)
  }

  test("oversized bucket splits into bounded sub-buckets; rows preserved") {
    val cap = 100
    val capped = Buckets.capped(fixture, Seq("tbl", "bkt"), "id", cap)
    assert(capped.count() == 1030L) // split, never dropped
    val subSizes = capped.groupBy("tbl", "bkt", "_sub")
      .agg(count(lit(1)).as("n"))
    // hot bucket: 1000/100 = 10 splits, hash-spread — no sub-bucket may
    // exceed 2x the cap (pair work per task stays O(cap²), the skew bound)
    assert(subSizes.agg(max("n")).head().getLong(0) <= 2L * cap)
    // cold bucket stays whole
    assert(capped.filter(col("bkt") === 5L && col("_sub") =!= 0L).count() == 0L)
  }

  test("split assignment is content-determined: stable under repartition") {
    val cap = 100
    val a = Buckets.capped(fixture, Seq("tbl", "bkt"), "id", cap)
      .select("id", "tbl", "bkt", "_sub")
      .as[(Long, Int, Long, Long)].collect().toSet
    val b = Buckets.capped(fixture.repartition(13), Seq("tbl", "bkt"), "id", cap)
      .select("id", "tbl", "bkt", "_sub")
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(a == b)
  }

  test("oversized reports the split buckets with counts") {
    val over = Buckets.oversized(fixture, Seq("tbl", "bkt"), 100)
      .as[(Int, Long, Long, Long)].collect()
    assert(over.toSeq == Seq((0, 77L, 1000L, 10L)))
    assert(Buckets.oversized(fixture, Seq("tbl", "bkt"), 2000).count() == 0L)
  }
}
