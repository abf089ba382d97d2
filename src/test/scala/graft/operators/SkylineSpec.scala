package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SkylineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, Double, Int)], buckets: Int = 64) =
    Skyline.pareto2D(rows.toDF("id", "x", "y"), "x", "y", buckets)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
      .toSet

  private def brute(rows: Seq[(Long, Double, Int)]) =
    rows.filter { p =>
      !rows.exists(q => q._2 <= p._2 && q._3 >= p._3 &&
        (q._2 < p._2 || q._3 > p._3))
    }.toSet

  test("hand example: frontier under (min x, max y)") {
    val rows = Seq(
      (1L, 1.0, 5), (2L, 2.0, 7), (3L, 3.0, 6), // 3 dominated by 2
      (4L, 2.5, 7), // dominated by 2 (same y, higher x)
      (5L, 0.5, 1))
    assert(run(rows) == Set((1L, 1.0, 5), (2L, 2.0, 7), (5L, 0.5, 1)))
  }

  test("tied points (equal x AND y) all survive") {
    val rows = Seq((1L, 1.0, 5), (2L, 1.0, 5), (3L, 2.0, 4))
    assert(run(rows) == Set((1L, 1.0, 5), (2L, 1.0, 5)))
  }

  test("same x, strictly better y dominates") {
    val rows = Seq((1L, 1.0, 5), (2L, 1.0, 6))
    assert(run(rows) == Set((2L, 1.0, 6)))
  }

  test("matches brute force on pseudo-random data, any bucket count") {
    val rows = (0L until 200L).map { i =>
      (i, ((i * 131) % 97).toDouble, ((i * 57 + 13) % 89).toInt)
    }
    val expect = brute(rows)
    assert(run(rows, buckets = 1) == expect)
    assert(run(rows, buckets = 7) == expect)
    assert(run(rows, buckets = 64) == expect)
  }

  test("repartition invariance") {
    val rows = (0L until 100L).map { i =>
      (i, ((i * 37) % 41).toDouble, ((i * 23 + 5) % 31).toInt)
    }
    val df = rows.toDF("id", "x", "y").repartition(13)
    val got = Skyline.pareto2D(df, "x", "y")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
      .toSet
    assert(got == brute(rows))
  }

  test("all x equal collapses to the max-y rows") {
    val rows = Seq((1L, 2.0, 3), (2L, 2.0, 9), (3L, 2.0, 9))
    assert(run(rows) == Set((2L, 2.0, 9), (3L, 2.0, 9)))
  }

  test("null metric values fail loudly") {
    val df = Seq((Some(1L), Some(1.0), Some(5)), (Some(2L), None, Some(3)))
      .toDF("id", "x", "y")
    val e = intercept[IllegalArgumentException] {
      Skyline.pareto2D(df, "x", "y")
    }
    assert(e.getMessage.contains("null"))
  }

  test("reserved internal column names fail loudly") {
    val df = Seq((1L, 1.0, 5, 0)).toDF("id", "x", "y", "_b")
    val e = intercept[IllegalArgumentException] {
      Skyline.pareto2D(df, "x", "y")
    }
    assert(e.getMessage.contains("_b"))
  }
}
