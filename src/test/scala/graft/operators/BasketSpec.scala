package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BasketSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, Long)], minSup: Long = 2L) =
    Basket.associationPairs(rows.toDF("bk", "it"), "bk", "it", minSup)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6), r.getDouble(7)))
      .toMap

  test("hand example: counts, confidences, lift") {
    // baskets: 1:{a,b}, 2:{a,b,c}, 3:{a,c}, 4:{b}  (a=10,b=11,c=12)
    val rows = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L),
      (2L, 12L), (3L, 10L), (3L, 12L), (4L, 11L))
    val m = run(rows)
    // (a,b): n=2, df_a=3, df_b=3, N=4 -> conf 2/3 both, lift 8/9
    assert(m((10L, 11L)) ==
      ((2L, 3L, 3L, 2.0 / 3.0, 2.0 / 3.0, 8.0 / 9.0)))
    // (a,c): n=2, df_c=2 -> conf_ab 2/3, conf_ba 1.0, lift 8/6
    assert(m((10L, 12L)) ==
      ((2L, 3L, 2L, 2.0 / 3.0, 1.0, 8.0 / 6.0)))
    // (b,c): support 1 < 2 -> absent
    assert(!m.contains((11L, 12L)))
  }

  test("duplicate (basket, item) rows collapse before counting") {
    val rows = Seq((1L, 10L), (1L, 10L), (1L, 11L), (2L, 10L),
      (2L, 11L))
    val m = run(rows)
    assert(m((10L, 11L))._1 == 2L)
    assert(m((10L, 11L))._2 == 2L) // df_a counts baskets, not rows
  }

  test("independent items have lift 1 exactly") {
    // a in every basket, b in every basket -> lift = n*N/(N*N) = 1
    val rows = (1L to 6L).flatMap(b => Seq((b, 1L), (b, 2L)))
    assert(run(rows)((1L, 2L))._6 == 1.0)
  }

  test("repartition invariance") {
    val rows = (0L until 300L).map(i => (i % 40, (i * 7) % 13))
    val base = run(rows)
    val again = Basket.associationPairs(
      rows.toDF("bk", "it").repartition(17), "bk", "it", 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(again == base.view.mapValues(_._1).toMap)
  }

  test("coPairs: cross-basket dedup, same guard as associationPairs") {
    // pairs repeat across baskets -> one row; within-basket order-free
    val rows = Seq((1L, 10L), (1L, 11L), (2L, 11L), (2L, 10L),
      (3L, 10L), (3L, 12L))
    val got = Basket.coPairs(rows.toDF("bk", "it"), "bk", "it")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((10L, 11L), (10L, 12L)))
    val big = (0L until 50L).map(i => (1L, i))
    val e = intercept[IllegalArgumentException] {
      Basket.coPairs(big.toDF("bk", "it"), "bk", "it",
        maxBasketItems = 10)
    }
    assert(e.getMessage.contains("maxBasketItems"))
  }

  test("mega-basket fails loudly; null keys drop; contracts") {
    val big = (0L until 50L).map(i => (1L, i))
    val e = intercept[IllegalArgumentException] {
      Basket.associationPairs(
        big.toDF("bk", "it"), "bk", "it", 2L, maxBasketItems = 10)
    }
    assert(e.getMessage.contains("maxBasketItems"))
    intercept[IllegalArgumentException] {
      Basket.associationPairs(
        big.toDF("bk", "it"), "bk", "it", minSupport = 0L)
    }
    val withNull = Seq((Some(1L), Some(10L)), (None, Some(11L)),
      (Some(1L), None)).toDF("bk", "it")
    assert(Basket.associationPairs(withNull, "bk", "it", 1L)
      .count() == 0L) // the only surviving row has no partner
  }
}
