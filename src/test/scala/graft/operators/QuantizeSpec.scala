package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class QuantizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    .select("vec_id", "embedding")

  test("codes stay in [-127,127]; zero vector quantizes to scale 0, zero codes") {
    val (s0, q0) = Kernels.quantizeInt8(Seq(0f, 0f, 0f))
    assert(s0 == 0.0 && q0.forall(_ == 0))
    val rows = emb.select(Quantize.int8(col("embedding")).as("qv"))
      .select(col("qv.scale"), col("qv.q")).collect()
    rows.foreach { r =>
      assert(r.getDouble(0) > 0.0)
      val q = r.getSeq[Byte](1)
      assert(q.forall(b => b >= -127 && b <= 127))
      // scale = max|x|/127 means at least one component hits ±127
      assert(q.exists(b => b == 127 || b == -127))
    }
  }

  test("dequantize reconstruction error is bounded by scale/2 per component") {
    val rows = emb.select(
      col("embedding"),
      Quantize.int8(col("embedding")).as("qv"))
      .select(col("embedding"), col("qv.scale").as("s"),
        Quantize.dequantize(col("qv")).as("recon"))
      .collect()
    rows.foreach { r =>
      val x = r.getSeq[Float](0)
      val s = r.getDouble(1)
      val xh = r.getSeq[Float](2)
      x.zip(xh).foreach { case (a, b) =>
        assert(math.abs(a - b) <= s / 2 + 1e-6, s"err ${math.abs(a - b)} vs $s")
      }
    }
  }

  test("int8 cosine tracks float cosine within quantization error") {
    val q = emb.select(col("vec_id"), col("embedding"),
      Quantize.int8(col("embedding")).as("qv"))
    val pairs = q.as("a").join(q.as("b"),
      col("a.vec_id") < col("b.vec_id") &&
        col("a.vec_id") % 25 === 0 && col("b.vec_id") % 25 === 3)
      .select(
        Similarity.cosineKernel(col("a.embedding"), col("b.embedding")).as("cf"),
        Quantize.cosineInt8(col("a.qv"), col("b.qv")).as("c8"))
      .collect()
    assert(pairs.length > 100)
    pairs.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 0.02,
        s"${r.getDouble(0)} vs ${r.getDouble(1)}")
    }
  }

  test("quantization is deterministic and matches the kernel directly") {
    val viaCol = emb.orderBy("vec_id").limit(5)
      .select(Quantize.int8(col("embedding")).as("qv"))
      .select(col("qv.scale"), col("qv.q")).collect()
      .map(r => (r.getDouble(0), r.getSeq[Byte](1).toSeq))
    val viaKernel = emb.orderBy("vec_id").limit(5)
      .select("embedding").collect()
      .map(r => Kernels.quantizeInt8(r.getSeq[Float](0)))
      .map { case (s, q) => (s, q.toSeq) }
    assert(viaCol.toSeq == viaKernel.toSeq)
  }
}
