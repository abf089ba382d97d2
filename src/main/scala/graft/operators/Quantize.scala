package graft.operators

import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.functions._

/** Embedding quantization for shuffle-weight reduction (SURVEY §7.2
  * M4 similarity-search scale path): float32 embeddings dominate the
  * bytes every ANN/dedup shuffle moves; symmetric int8 codes carry
  * ~4x less with bounded per-component error (≤ scale/2). Cosine over
  * the codes needs no scales at all — they cancel — so candidate
  * scoring runs on pure 64-bit integer dot products ([[Kernels
  * .int8Cosine]]) and only the final verify stage, if any, touches
  * float vectors again.
  *
  * The quantizer's arithmetic (max|x|/127 scale, floor(x/scale + 0.5)
  * rounding) is deliberately chosen from the IEEE-double operations
  * every engine computes identically, so the q62 DuckDB oracle
  * recomputes the exact codes in SQL.
  */
object Quantize {

  /** Quantized vector: per-vector scale + int8 codes. */
  case class QVec(scale: Double, q: Seq[Byte])

  /** array<float> → struct(scale double, q array<tinyint>). */
  def int8(vec: Column): Column = {
    val u = udf((v: scala.collection.Seq[Float]) =>
      if (v == null) null
      else {
        val (s, q) = Kernels.quantizeInt8(v)
        QVec(s, q.toSeq)
      })
    u(vec)
  }

  /** struct(scale, q) → array<float> reconstruction (x̂_i = q_i·scale);
    * |x - x̂| ≤ scale/2 per component. */
  def dequantize(qvec: Column): Column = {
    val u = udf((r: Row) =>
      if (r == null) null
      else {
        val s = r.getDouble(0)
        r.getSeq[Byte](1).map(b => (b * s).toFloat).toArray
      })
    u(qvec)
  }

  /** Cosine between two quantized vectors — scales cancel, so this is
    * the native codegen'd [[graft.expressions.Int8Cosine]] over the
    * code arrays: primitive byte reads and 64-bit integer accumulators
    * inlined into whole-stage codegen (the UDF spelling paid
    * Row-struct conversion per candidate pair). NULL structs yield
    * NULL like the UDF did (getField propagates null). */
  def cosineInt8(a: Column, b: Column): Column =
    org.apache.spark.sql.graftshim.GraftSqlShim.column(
      graft.expressions.Int8Cosine(
        org.apache.spark.sql.graftshim.GraftSqlShim.expression(a.getField("q")),
        org.apache.spark.sql.graftshim.GraftSqlShim.expression(b.getField("q"))))
}
