package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RanksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("rankBounded: ranks follow the order columns exactly") {
    val df = Seq((3L, 0.5), (1L, 0.9), (2L, 0.9), (4L, 0.1))
      .toDF("id", "score")
    val got = Ranks.rankBounded(df, col("score").desc, col("id"))
      .select("rank", "id").as[(Long, Long)].collect().sorted
    // score desc, id asc: 1 (0.9), 2 (0.9), 3 (0.5), 4 (0.1)
    assert(got.toSeq == Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L)))
  }

  test("rankBounded: deterministic under adversarial repartition") {
    val base = (1L to 200L).map(i => (i, (i * 2654435761L) % 97))
      .toDF("id", "score")
    val expect = Ranks.rankBounded(base, col("score").desc, col("id"))
      .select("rank", "id").as[(Long, Long)].collect().sortBy(_._1).toSeq
    for (n <- Seq(1, 7, 32)) {
      val got = Ranks.rankBounded(
        base.repartition(n, col("score")), col("score").desc, col("id"))
        .select("rank", "id").as[(Long, Long)].collect().sortBy(_._1).toSeq
      assert(got == expect, s"repartition($n) changed ranks")
    }
  }

  test("rankBounded: plans no Window node") {
    val df = Seq((1L, 1.0)).toDF("id", "score")
    val p = Ranks.rankBounded(df, col("score"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window ["), p)
  }
}
