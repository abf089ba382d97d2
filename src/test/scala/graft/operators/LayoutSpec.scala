package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // a 64x64 grid: both coordinates uniform, so locality is testable
  private lazy val grid = (for {
    x <- 0 until 64; y <- 0 until 64
  } yield (x.toLong * 64 + y, x.toDouble, y.toDouble))
    .toDF("id", "x", "y")

  test("z-value interleave matches a bit-level reference") {
    val got = Layout.zOrdered(grid, Seq("x", "y"), bits = 6, cellBits = 4)
      .select("id", "z").as[(Long, Long)].collect().toMap
    def interleave(a: Long, b: Long): Long =
      (0 until 6).map(i =>
        (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1)))
        .reduce(_ | _)
    // x,y in [0,63] scale to ranks floor(v/63*63) == v exactly
    for (x <- Seq(0L, 1L, 31L, 63L); y <- Seq(0L, 17L, 63L)) {
      assert(got(x * 64 + y) == interleave(x, y), s"($x,$y)")
    }
  }

  test("pruning benefit: narrow ranges on EITHER column touch few cells") {
    val laid = Layout.zOrdered(grid, Seq("x", "y"), bits = 6, cellBits = 4)
    val total = 16L
    // narrow band on x (1/8 of the domain) and on y
    val cx = Layout.cellsTouched(laid, "x", 8.0, 15.0)
    val cy = Layout.cellsTouched(laid, "y", 8.0, 15.0)
    assert(cx <= total / 2, s"x-range touched $cx of $total cells")
    assert(cy <= total / 2, s"y-range touched $cy of $total cells")
    // lexicographic order by x would answer the y-probe by touching
    // EVERY cell — that asymmetry is z-order's reason to exist
    val lex = grid.withColumn("cell", floor(col("x") / lit(4.0)).cast("long"))
    val lexY = lex.filter(col("y").between(8.0, 15.0))
      .select("cell").distinct().count()
    assert(lexY == 16L, "lex layout should not prune the second column")
    assert(cy < lexY)
  }

  test("deterministic under repartition; constant and null columns rank 0") {
    val a = Layout.zOrdered(grid.repartition(13), Seq("x", "y"), 6, 4)
      .select("id", "z", "cell").as[(Long, Long, Long)].collect().sortBy(_._1)
    val b = Layout.zOrdered(grid, Seq("x", "y"), 6, 4)
      .select("id", "z", "cell").as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq)
    val const = Seq((1L, 5.0, 2.0), (2L, 5.0, 3.0)).toDF("id", "x", "y")
    val z = Layout.zOrdered(const, Seq("x", "y"), 6, 4)
      .select("id", "z").as[(Long, Long)].collect().toMap
    // x constant -> rank 0 contributes nothing; z from y alone
    assert(z(1L) == 0L)
    assert(z(2L) != 0L)
  }

  test("loud guards: reserved columns, bit budget, too few columns") {
    val df = Seq((1L, 1.0, 2.0)).toDF("id", "x", "y")
    intercept[IllegalArgumentException] {
      Layout.zOrdered(df.withColumn("z", lit(1)), Seq("x", "y"), 6, 4)
    }
    intercept[IllegalArgumentException] {
      Layout.zOrdered(df, Seq("x", "y"), bits = 32, cellBits = 4)
    }
    intercept[IllegalArgumentException] {
      Layout.zOrdered(df, Seq("x"), bits = 8, cellBits = 4)
    }
  }

  test("compactionPlan: next-fit bins by cumulative size, hand-checked") {
    // files in id order, target 100: cum-before 0,60,120,150,370
    // -> bins 0,0,1,1,3
    val files = Seq(
      ("s", 1L, 60L), ("s", 2L, 60L), ("s", 3L, 30L), ("s", 4L, 220L),
      ("s", 5L, 10L))
      .toDF("src", "fid", "bytes")
    val got = Layout.compactionPlan(files, "src", "fid", "bytes", 100L)
      .orderBy("fid")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.map(_._4) == Seq(0L, 0L, 1L, 1L, 3L))
    // bin stats: bin 0 = {60,60}, bin 1 = {30,220}, bin 3 = {10}
    assert(got.map(r => (r._4, r._5, r._6)).distinct.sorted ==
      Seq((0L, 120L, 2L), (1L, 250L, 2L), (3L, 10L, 1L)))
  }

  test("compactionPlan: groups pack independently; invariants hold") {
    val files = (0 until 400).map(i =>
      (s"g${i % 5}", i.toLong, (i % 37).toLong * 100L))
      .toDF("src", "fid", "bytes")
    val plan = Layout.compactionPlan(files, "src", "fid", "bytes", 4096L)
    // file count and byte mass conserved
    assert(plan.count() == 400L)
    val tot = plan.agg(sum("bytes")).head.getLong(0)
    assert(tot == (0 until 400).map(i => (i % 37).toLong * 100L).sum)
    // within each group, bins are monotone non-decreasing in file order
    val rows = plan.orderBy("src", "fid")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    rows.groupBy(_._1).foreach { case (_, g) =>
      val bins = g.sortBy(_._2).map(_._4)
      assert(bins.zip(bins.tail).forall { case (a, b) => a <= b })
    }
    // every bin's bytes except possibly the overshoot file stay sane:
    // bin_bytes < target + max file size in that bin
    rows.foreach { r =>
      val maxInBin = rows.filter(x => x._1 == r._1 && x._4 == r._4)
        .map(_._3).max
      assert(r._5 < 4096L + maxInBin)
    }
    // determinism under repartition
    val again = Layout.compactionPlan(
      files.repartition(11), "src", "fid", "bytes", 4096L)
      .orderBy("src", "fid")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rows.toSeq == again.toSeq)
  }

  test("compactionPlan loud contracts: reserved names, integral bytes") {
    val files = Seq(("s", 1L, 10L)).toDF("src", "fid", "bytes")
    val e = intercept[IllegalArgumentException] {
      Layout.compactionPlan(files.withColumn("bin", lit(1L)),
        "src", "fid", "bytes", 100L)
    }
    assert(e.getMessage.contains("reserved"))
    val e2 = intercept[IllegalArgumentException] {
      Layout.compactionPlan(
        Seq(("s", 1L, 1.5)).toDF("src", "fid", "bytes"),
        "src", "fid", "bytes", 100L)
    }
    assert(e2.getMessage.contains("integral"))
    intercept[IllegalArgumentException] {
      Layout.compactionPlan(files, "src", "fid", "bytes", 0L)
    }
  }

  // ---- encodingAdvisor ----

  test("encodingAdvisor: hand-checked cardinality facts incl. nulls") {
    val rows = Seq(
      (Some("x"), 1L), (Some("x"), 2L), (Some("x"), 3L),
      (Some("y"), 4L), (None, 5L))
    val df = rows.toDF("s", "k")
    val got = Layout.encodingAdvisor(df, Seq("s", "k"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getDouble(6), r.getBoolean(7))).toMap
    // s: 5 rows, 1 null, 2 distinct, max 3, sumsq 9+1=10
    assert(got("s") == ((5L, 1L, 2L, 3L, 10L, 3.0 / 5.0, false)))
    // k: all distinct
    assert(got("k") == ((5L, 0L, 5L, 1L, 5L, 1.0 / 5.0, false)))
  }

  test("encodingAdvisor: the 1/16 dictionary boundary in integers") {
    // 32 non-null rows over 2 distinct values: 16*2 <= 32 -> true
    val friendly = (0 until 32).map(i => (if (i % 2 == 0) "a" else "b"))
      .toDF("c")
    assert(Layout.encodingAdvisor(friendly, Seq("c"))
      .head().getBoolean(7))
    // 31 rows over 2 distinct: 32 <= 31 -> false
    val not = (0 until 31).map(i => (if (i % 2 == 0) "a" else "b"))
      .toDF("c")
    assert(!Layout.encodingAdvisor(not, Seq("c")).head().getBoolean(7))
  }

  test("encodingAdvisor: loud contracts") {
    val df = Seq(("a", 1L)).toDF("s", "k")
    intercept[IllegalArgumentException] {
      Layout.encodingAdvisor(df, Seq.empty)
    }
    val e = intercept[IllegalArgumentException] {
      Layout.encodingAdvisor(df, Seq("s", "missing"))
    }
    assert(e.getMessage.contains("missing"))
  }
}
