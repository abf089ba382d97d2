package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class PackSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // shard A stream: 10 + 0 + 5 + 4 tokens, seqLen 8
  // offsets: d1@0 (chunks 0-1), d2@10 (empty, chunk 1), d3@10
  // (chunks 1-1), d4@15 (chunks 1-2)
  private val docs = Seq(
    (1L, "A", 10L), (2L, "A", 0L), (3L, "A", 5L), (4L, "A", 4L),
    (5L, "B", 8L), (6L, "B", 1L)
  ).toDF("doc_id", "source", "toks")

  test("sequenceOffsets: hand-checked offsets and chunk spans") {
    val got = Pack.sequenceOffsets(docs, "doc_id", "source", "doc_id",
      "toks", seqLen = 8L)
      .as[(Long, String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._4, r._5, r._6))).toMap
    assert(got(1L) == ((0L, 0L, 1L)))   // tokens 0..9 -> chunks 0,1
    assert(got(2L) == ((10L, 1L, 1L)))  // empty doc at offset 10
    assert(got(3L) == ((10L, 1L, 1L)))  // tokens 10..14 -> chunk 1
    assert(got(4L) == ((15L, 1L, 2L)))  // tokens 15..18 -> chunks 1,2
    assert(got(5L) == ((0L, 0L, 0L)))   // B: tokens 0..7 -> chunk 0
    assert(got(6L) == ((8L, 1L, 1L)))   // B: token 8 -> chunk 1
  }

  test("null token counts read as 0 and never poison the shard cumsum") {
    val withNull = Seq(
      (1L, "A", Option(4L)), (2L, "A", Option.empty[Long]), (3L, "A", Option(5L))
    ).toDF("doc_id", "source", "toks")
    val got = Pack.sequenceOffsets(withNull, "doc_id", "source", "doc_id",
      "toks", seqLen = 8L)
      .as[(Long, String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap
    assert(got(1L) == ((4L, 0L)))
    assert(got(2L) == ((0L, 4L))) // null -> 0 tokens at offset 4
    assert(got(3L) == ((5L, 4L)))
    val counts = Pack.chunkCounts(withNull, "doc_id", "source", "doc_id",
      "toks", seqLen = 8L).as[(String, Long, Long, Long)].head()
    assert(counts == (("A", 9L, 1L, 1L)))
  }

  test("chunkCounts agrees with per-doc offsets") {
    val counts = Pack.chunkCounts(docs, "doc_id", "source", "doc_id",
      "toks", seqLen = 8L)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(counts("A") == ((19L, 2L, 3L))) // 19 toks = 2 full chunks + 3
    assert(counts("B") == ((9L, 1L, 1L)))
    // cross-check: total == last doc's start + toks per shard
    val offs = Pack.sequenceOffsets(docs, "doc_id", "source", "doc_id",
      "toks", seqLen = 8L)
      .groupBy("shard").agg(max(col("start_offset") + col("toks")).as("t"))
      .as[(String, Long)].collect().toMap
    assert(offs("A") == counts("A")._1)
    assert(offs("B") == counts("B")._1)
  }

  test("offsets are per-shard contiguous and deterministic on the fixture") {
    val fixture = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      .select(col("doc_id"), col("source"),
        graft.functions.TextFunctions.tokenCount(col("text")).as("toks"))
    def run() = Pack.sequenceOffsets(fixture, "doc_id", "source", "doc_id",
      "toks", seqLen = 2048L)
      .as[(Long, String, Long, Long, Long, Long)].collect().toSet
    val a = run()
    assert(a == run())
    // contiguity: within each shard sorted by start, offset_i+toks_i ==
    // offset_{i+1} (no gaps, no overlaps in the virtual stream)
    a.groupBy(_._2).values.foreach { shard =>
      val sorted = shard.toSeq.sortBy(_._4)
      sorted.sliding(2).foreach {
        case Seq(x, y) => assert(x._4 + x._3 == y._4, s"gap after ${x._1}")
        case _ =>
      }
    }
  }
}
