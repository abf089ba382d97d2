package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SketchesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 3 groups x overlapping user sets, sharded 4 ways
  private lazy val rows = (0 until 4000).map { i =>
    (i.toLong, s"t${i % 3}", (i % 700).toLong, i % 4)
  }.toDF("event_id", "event_type", "user_id", "shard")

  test("every sharding of the ledger lands in the gated band around exact") {
    // Datasketches estimates are path-dependent (HIP vs union
    // composite estimator), so splits need not agree bitwise — the
    // operative contract is that ANY sharding, and the one-pass
    // sketch, all sit within the mergeTol/relErr band the report
    // gates. Exact per type: t_g holds users {i%700 : i%3==g}.
    val exact = (0 until 4000).groupBy(i => s"t${i % 3}")
      .map { case (g, is) => g -> is.map(_ % 700).distinct.size.toLong }
    val onePass = Sketches.hllSketch(rows, Seq("event_type"), "user_id")
      .select(col("event_type"),
        Sketches.estimate(col("sketch")).as("est"))
      .as[(String, Long)].collect().toMap
    for (shards <- Seq(2, 8, 32)) {
      val resharded = rows.withColumn("shard", pmod(col("event_id"), lit(shards)))
      val merged = Sketches.hllMerge(
        Sketches.hllShardSketches(
          resharded, Seq("event_type"), "shard", "user_id"),
        Seq("event_type"))
        .select(col("event_type"),
          Sketches.estimate(col("sketch")).as("est"))
        .as[(String, Long)].collect().toMap
      exact.foreach { case (g, ex) =>
        assert(math.abs(merged(g) - ex).toDouble / ex <= 0.05,
          s"shards=$shards group=$g merged=${merged(g)} exact=$ex")
        assert(math.abs(merged(g) - onePass(g)).toDouble / ex <= 0.02,
          s"shards=$shards group=$g drift ${merged(g)} vs ${onePass(g)}")
      }
    }
  }

  test("incremental ledger: old sketches + delta == whole-corpus, old raw unread") {
    val old = rows.filter(col("shard") < 2)
    val delta = rows.filter(col("shard") >= 2)
    // the persisted ledger: sketches only, raw rows conceptually gone
    val oldLedger = Sketches.hllShardSketches(
      old, Seq("event_type"), "shard", "user_id")
    val deltaLedger = Sketches.hllShardSketches(
      delta, Seq("event_type"), "shard", "user_id")
    val inc = Sketches.hllMerge(
      oldLedger.unionByName(deltaLedger), Seq("event_type"))
      .select(col("event_type"), Sketches.estimate(col("sketch")).as("est"))
      .as[(String, Long)].collect().toMap
    // within the gated band of the one-shot whole-corpus sketch and
    // of exact — the incremental path costs no accuracy
    val whole = Sketches.hllSketch(rows, Seq("event_type"), "user_id")
      .select(col("event_type"), Sketches.estimate(col("sketch")).as("est"))
      .as[(String, Long)].collect().toMap
    val exact = (0 until 4000).groupBy(i => s"t${i % 3}")
      .map { case (g, is) => g -> is.map(_ % 700).distinct.size.toLong }
    exact.foreach { case (g, ex) =>
      assert(math.abs(inc(g) - ex).toDouble / ex <= 0.05, s"$g vs exact")
      assert(math.abs(inc(g) - whole(g)).toDouble / ex <= 0.02,
        s"$g inc=${inc(g)} whole=${whole(g)}")
    }
  }

  test("gatedDistinctReport emits exact counts and passes its gates") {
    val got = Sketches.gatedDistinctReport(
      rows, Seq("event_type"), "shard", "user_id")
      .as[(String, Long)].collect().toMap
    // exact by construction: group t_g holds users {i%700 : i%3==g}
    val ref = (0 until 4000).groupBy(i => s"t${i % 3}")
      .map { case (g, is) => g -> is.map(_ % 700).distinct.size.toLong }
    assert(got == ref)
  }

  test("gate fails loudly when the error bound is unmeetable") {
    // relErr so tight the ~1.6%-error sketch cannot pass on a
    // 700-distinct group — unless the estimate is exactly right,
    // which lgK=12 is not at this cardinality for every group
    val e = intercept[IllegalArgumentException] {
      Sketches.gatedDistinctReport(
        rows, Seq("event_type"), "shard", "user_id", relErr = 1e-9)
    }
    assert(e.getMessage.contains("sketch regressed"))
  }

  test("empty input: report is empty, gates vacuous") {
    assert(Sketches.gatedDistinctReport(
      rows.filter(lit(false)), Seq("event_type"), "shard", "user_id")
      .count() == 0L)
  }
}
