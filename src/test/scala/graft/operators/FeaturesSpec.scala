package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class FeaturesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("scaleBy: known ranks and z-scores, ties share, nulls pass through") {
    // group a: 1,2,2,4 -> mean 2.25, sample var (1.5625+.0625*2+3.0625)/3
    val df = Seq(("a", 1L, Some(1L)), ("a", 2L, Some(2L)),
      ("a", 3L, Some(2L)), ("a", 4L, Some(4L)), ("a", 5L, None),
      ("b", 6L, Some(9L)))
      .toDF("g", "id", "v")
    val got = Features.scaleBy(df, "g", "v")
      .select("g", "id", "v", "pct_rank", "z")
      .as[(String, Long, Option[Long], Option[Double], Option[Double])]
      .collect().sortBy(_._2).toSeq
    val mean = 9.0 / 4
    val std = math.sqrt((25.0 - 9.0 * mean) / 3) // sumsq 1+4+4+16
    assert(got.map(r => (r._1, r._2, r._4)) == Seq(
      ("a", 1L, Some(0.0)), ("a", 2L, Some(1.0 / 3)),
      ("a", 3L, Some(1.0 / 3)), // tie shares the rank
      ("a", 4L, Some(1.0)), ("a", 5L, None),
      ("b", 6L, Some(0.0))))
    got.filter(_._1 == "a").filter(_._3.isDefined).foreach { r =>
      assert(math.abs(r._5.get - (r._3.get - mean) / std) < 1e-15)
    }
    // single-row group: zero variance -> z null, pct_rank 0
    assert(got.last._5.isEmpty && got.last._4 == Some(0.0))
    // constant group: std 0 -> z null for every row
    val const = Seq(("c", 1L, 5L), ("c", 2L, 5L)).toDF("g", "id", "v")
    assert(Features.scaleBy(const, "g", "v")
      .select("z").as[Option[Double]].collect().forall(_.isEmpty))
  }

  test("scaleBy: deterministic under repartition; guards") {
    val rows = (0 until 1000).map(i => (s"g${i % 4}", i.toLong, (i % 37).toLong))
    val df = rows.toDF("g", "id", "v")
    val a = Features.scaleBy(df.repartition(1), "g", "v")
      .select("g", "id", "pct_rank", "z")
      .as[(String, Long, Double, Double)].collect().sorted.toSeq
    val b = Features.scaleBy(df.repartition(19), "g", "v")
      .select("g", "id", "pct_rank", "z")
      .as[(String, Long, Double, Double)].collect().sorted.toSeq
    assert(a == b && a.size == 1000)
    assert(intercept[IllegalArgumentException] {
      Features.scaleBy(Seq(("a", 1.5)).toDF("g", "v"), "g", "v")
    }.getMessage.contains("integral"))
    assert(intercept[IllegalArgumentException] {
      Features.scaleBy(df.withColumn("z", lit(1)), "g", "v")
    }.getMessage.contains("reserved"))
    // overflow is LOUD either way: under ANSI (the session default)
    // the engine throws ARITHMETIC_OVERFLOW computing the moments;
    // under non-ANSI wrap the operator's own guard fires
    val big = (0 until 3).map(i => ("g", i.toLong, 3L << 30))
      .toDF("g", "id", "v")
    val e = intercept[Exception] { Features.scaleBy(big, "g", "v") }
    assert(e.getMessage.toLowerCase.contains("overflow"))
  }

  test("winsorize: hand-checked p10/p90 clip on 1..10") {
    // group of 1..10: rlo = ceil(10*10/100) = 1 -> lo = 1;
    // rhi = ceil(90*10/100) = 9 -> hi = 9; only 10 clips
    val df = (1L to 10L).map(v => ("g", v, v)).toSeq.toDF("g", "id", "v")
    val got = Features.winsorize(df, "g", "v", 10, 90)
      .orderBy("id")
      .select("v", "lo", "hi", "clipped")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.forall(r => r._2 == 1L && r._3 == 9L))
    assert(got.map(_._4) == Seq(1L, 2, 3, 4, 5, 6, 7, 8, 9, 9))
  }

  test("winsorize: duplicates, per-group bounds, null passthrough") {
    // g1 heavily duplicated at 5 with outliers; g2 distinct values
    val rows = Seq.fill(8)(("g1", Some(5L))) ++
      Seq(("g1", Some(-100L)), ("g1", Some(100L)), ("g1", Option.empty[Long])) ++
      (1L to 4L).map(v => ("g2", Some(v)))
    val df = rows.zipWithIndex
      .map { case ((g, v), i) => (g, i.toLong, v) }.toDF("g", "id", "v")
    val got = Features.winsorize(df, "g", "v", 20, 80)
      .collect().map(r => r.getLong(1) ->
        (if (r.isNullAt(r.fieldIndex("clipped"))) None
         else Some(r.getLong(r.fieldIndex("clipped"))))).toMap
    // g1 non-null n=10: rlo=ceil(200/100)=2 -> cum: -100(1), 5(9) -> lo=5
    // rhi=ceil(800/100)=8 -> hi=5; everything clips to 5
    rows.zipWithIndex.foreach { case ((g, v), i) =>
      (g, v) match {
        case ("g1", Some(_)) => assert(got(i.toLong) == Some(5L))
        case ("g1", None) => assert(got(i.toLong) == None)
        case ("g2", Some(x)) =>
          // g2 n=4: rlo=ceil(80/100)=1 -> lo=1; rhi=ceil(320/100)=4 -> hi=4
          assert(got(i.toLong) == Some(x))
        case _ => fail()
      }
    }
  }

  test("quantileMap: rank-matched mapping, hand-checked both regimes") {
    // equal sizes, distinct values: pure rank transfer 1..4 -> 10..40
    val src = Seq(1L, 2L, 3L, 4L).toDF("v")
    val tgt = Seq(10L, 20L, 30L, 40L).toDF("v")
    val m = Features.quantileMap(src, tgt, "v")
      .orderBy("value")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(m.map(r => r._1 -> r._5) ==
      Seq(1L -> 10L, 2L -> 20L, 3L -> 30L, 4L -> 40L))
    // unequal sizes with duplicates: src n=2, tgt n=8 (each value x2)
    // v=1: rank 1 -> target rank ceil(8/2)=4 -> 20 (cum 10:2, 20:4)
    // v=2: rank 2 -> target rank 8 -> 40
    val src2 = Seq(1L, 2L).toDF("v")
    val tgt2 = Seq(10L, 10L, 20L, 20L, 30L, 30L, 40L, 40L).toDF("v")
    val m2 = Features.quantileMap(src2, tgt2, "v")
      .orderBy("value")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(m2 == Seq((1L, 1L, 2L, 4L, 20L), (2L, 2L, 2L, 8L, 40L)))
    // identical distributions map to themselves at any coarse knob
    val same = (1L to 100L).flatMap(v => Seq.fill((v % 3 + 1).toInt)(v))
    for (k <- Seq(4, 64, 1000)) {
      val sm = Features.quantileMap(same.toDF("v"), same.toDF("v"), "v",
        coarseBuckets = k)
        .as[(Long, Long, Long, Long, Long)].collect()
      assert(sm.forall(r => r._1 == r._5), s"coarseBuckets=$k")
    }
    val e = intercept[IllegalArgumentException] {
      Features.quantileMap(Seq(1.5).toDF("v"), Seq(1L).toDF("v"), "v")
    }
    assert(e.getMessage.contains("integral"))
  }

  test("winsorize loud contracts and bound ordering") {
    val df = Seq(("g", 1L, 1L)).toDF("g", "id", "v")
    intercept[IllegalArgumentException] {
      Features.winsorize(df, "g", "v", 60, 40)
    }
    intercept[IllegalArgumentException] {
      Features.winsorize(df, "g", "v", -1, 50)
    }
    val e = intercept[IllegalArgumentException] {
      Features.winsorize(
        Seq(("g", 1L, 1.5)).toDF("g", "id", "v"), "g", "v", 5, 95)
    }
    assert(e.getMessage.contains("integral"))
    val e2 = intercept[IllegalArgumentException] {
      Features.winsorize(
        Seq(("g", 1L, 2L)).toDF("g", "lo", "v"), "g", "v", 5, 95)
    }
    assert(e2.getMessage.contains("reserved"))
  }
}
