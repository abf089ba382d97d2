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

  // -------------------------------------------------------------------
  // Random projection — the OTHER compression axis: int8 shrinks the
  // bytes per dimension, Johnson–Lindenstrauss shrinks the DIMENSIONS.
  // -------------------------------------------------------------------

  /** First byte of md5(key) as two lowercase hex chars — fixed-width
    * lowercase hex compares lexicographically as its numeric value,
    * so band tests below are plain string compares any engine
    * reproduces from its own md5(). */
  private def md5Byte0(key: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8"))
    "%02x".format(d(0))
  }

  /** Sparse random projection (Achlioptas, "Database-friendly random
    * projections", PODS 2001): y_j = √(3/d′) · Σ_i x_i·s(i,j) with
    * s(i,j) ∈ {+1, −1, 0} at ≈{1/6, 1/6, 2/3} — the JL transform
    * that preserves pairwise distances within (1±ε) w.h.p. while
    * CUTTING THE DIMENSION, i.e. the shuffle bytes AND the per-pair
    * flops of everything downstream (ANN candidate scoring, dedup
    * verify). Two-thirds of the matrix is zeros, so the projection
    * itself is ~d·d′/3 multiply-adds per row, map-side, no shuffle.
    *
    * The sign matrix is NOT random at run time: s(i,j) derives from
    * md5("salt|i|j")'s first byte (<0x2b → +1, <0x56 → −1, else 0 —
    * 43/256 ≈ 1/6 per sign), so the SAME salt rebuilds the SAME
    * projection on any engine, any cluster, any retry — and the
    * oracle recomputes every output double bitwise from DuckDB's own
    * md5 (per-term products folded in ascending-i order, one final
    * scale multiply; all IEEE basic ops).
    *
    * Vectors longer than `inDim` fail loudly (the matrix would
    * silently truncate them); shorter ones project by their own
    * length (missing dims contribute nothing, matching the oracle's
    * range(len) fold). */
  /** The projection as a reusable Column function — composition
    * surface for operators that project INLINE (no id-join) before
    * shuffling, e.g. [[Similarity.ivfTopKProjected]]. */
  def randomProjector(
      inDim: Int, outDim: Int, salt: String = "graft"): Column => Column = {
    require(inDim >= 1, s"inDim must be >= 1, got $inDim")
    require(outDim >= 1, s"outDim must be >= 1, got $outDim")
    val signs: Array[Array[Double]] = Array.tabulate(outDim, inDim) {
      (j, i) =>
        val h = md5Byte0(s"$salt|$i|$j")
        if (h < "2b") 1.0 else if (h < "56") -1.0 else 0.0
    }
    val scale = math.sqrt(3.0 / outDim)
    val inDimLocal = inDim
    val outDimLocal = outDim
    val u = udf((v: scala.collection.Seq[Float]) =>
      if (v == null) null
      else {
        require(v.length <= inDimLocal,
          s"vector dim ${v.length} exceeds the projection's inDim=" +
            s"$inDimLocal — rebuild with a larger inDim rather than " +
            "silently truncating components")
        Array.tabulate(outDimLocal) { j =>
          val s = signs(j)
          var acc = 0.0; var i = 0
          while (i < v.length) { acc += v(i).toDouble * s(i); i += 1 }
          acc * scale
        }
      })
    (c: Column) => u(c)
  }

  def randomProject(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      vecCol: String,
      inDim: Int,
      outDim: Int,
      salt: String = "graft"): org.apache.spark.sql.DataFrame = {
    val proj = randomProjector(inDim, outDim, salt)
    df.select(col(idCol).as("id"), proj(col(vecCol)).as("proj"))
  }

  // -------------------------------------------------------------------
  // Product quantization — the THIRD compression axis: int8 shrinks
  // bytes PER dimension (4x), JL shrinks the dimension COUNT; PQ
  // replaces the vector with m sub-space codebook indices (Jégou,
  // Douze, Schmid, "Product Quantization for Nearest Neighbor
  // Search", TPAMI 2011) — a 64-dim float32 vector becomes m=8 bytes,
  // 32x fewer candidate-join bytes, with the codebook (m·k·subDim
  // floats, a few KB) broadcast instead of shuffled.
  // -------------------------------------------------------------------

  /** A trained PQ codebook: `cents(s)(c)` is sub-space `s`'s code-`c`
    * centroid (subDim floats). Driver-sized by construction
    * (m · codes · subDim floats — KBs), so it broadcasts with the
    * scoring closures the way the IVF centroid array does. */
  case class PqCodebook(
      m: Int, subDim: Int, cents: Array[Array[Array[Float]]]) {
    def codes: Int = cents(0).length
  }

  /** Train per-sub-space codebooks with Lloyd k-means (L2 on
    * sub-vectors) over a BOUNDED in-memory sample — the same
    * training contract as IVF's `trainCentroids`: deterministic
    * (init = the first `codes` sample sub-vectors of a hash-ordered
    * sample, sequential driver fold), and O(sample · dim) memory
    * regardless of corpus size. Callers score cosine, so pass
    * unit-normalized sample vectors — PQ itself is metric-neutral.
    *
    * `dim % m == 0` is required loudly: a ragged split would silently
    * give the last sub-space a different resolution. */
  def pqTrain(
      sample: Array[Array[Float]],
      m: Int,
      codes: Int = 16,
      iters: Int = 5): PqCodebook = {
    require(sample.nonEmpty, "pqTrain needs a non-empty sample")
    require(m >= 1, s"m must be >= 1, got $m")
    require(codes >= 1 && codes <= 256,
      s"codes must be in [1, 256] (one byte per sub-space), got $codes")
    val dim = sample(0).length
    require(dim % m == 0,
      s"vector dim $dim is not divisible by m=$m sub-spaces — a ragged " +
        "split would quantize the tail at a different resolution; pick " +
        "m dividing the dimension")
    val subDim = dim / m
    val cents = Array.tabulate(m) { s =>
      val off = s * subDim
      val subs = sample.map(v => java.util.Arrays.copyOfRange(v, off, off + subDim))
      val k = math.min(codes, subs.length)
      var cs = subs.take(k).map(_.clone)
      var it = 0
      while (it < iters) {
        val sums = Array.fill(k)(new Array[Double](subDim))
        val counts = new Array[Int](k)
        subs.foreach { x =>
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < k) {
            var d = 0.0; var i = 0
            val cent = cs(c)
            while (i < subDim) {
              val diff = x(i).toDouble - cent(i); d += diff * diff; i += 1
            }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          val acc = sums(best)
          var i = 0
          while (i < subDim) { acc(i) += x(i); i += 1 }
          counts(best) += 1
        }
        cs = Array.tabulate(k) { c =>
          if (counts(c) == 0) cs(c) // keep empty codes stable
          else Array.tabulate(subDim)(i => (sums(c)(i) / counts(c)).toFloat)
        }
        it += 1
      }
      cs
    }
    PqCodebook(m, subDim, cents)
  }

  /** Map-side PQ encoder: array<float> → array<tinyint> of m nearest
    * sub-space codes (L2 argmin, ties to the lower code). The corpus
    * side of an ANN candidate join carries these m bytes instead of
    * dim floats. Vectors must have exactly m·subDim components —
    * anything else fails loudly (a short vector would silently
    * quantize garbage for its missing tail). */
  def pqEncoder(cb: PqCodebook): Column => Column = {
    val m = cb.m; val subDim = cb.subDim; val cents = cb.cents
    val u = udf((v: scala.collection.Seq[Float]) =>
      if (v == null) null
      else {
        require(v.length == m * subDim,
          s"vector dim ${v.length} != codebook dim ${m * subDim}")
        val out = new Array[Byte](m)
        var s = 0
        while (s < m) {
          val cs = cents(s)
          val off = s * subDim
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < cs.length) {
            var d = 0.0; var i = 0
            val cent = cs(c)
            while (i < subDim) {
              val diff = v(off + i).toDouble - cent(i); d += diff * diff
              i += 1
            }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          out(s) = best.toByte
          s += 1
        }
        out
      })
    (c: Column) => u(c)
  }

  /** Asymmetric-distance score of a raw query against PQ codes:
    * dot(q, x̂) = Σ_s dot(q_s, cents(s)(code_s)), sub-spaces folded in
    * ascending order, components ascending within each — one fixed
    * IEEE summation order, deterministic across partitionings and
    * retries. Over unit-normalized inputs this approximates cosine;
    * the candidate join that feeds it moves m BYTES per corpus row. */
  def pqScorer(cb: PqCodebook): (Column, Column) => Column = {
    val m = cb.m; val subDim = cb.subDim; val cents = cb.cents
    val u = udf((q: scala.collection.Seq[Float], codes: Array[Byte]) =>
      if (q == null || codes == null) null.asInstanceOf[java.lang.Double]
      else {
        require(codes.length == m, s"code width ${codes.length} != m=$m")
        var acc = 0.0
        var s = 0
        while (s < m) {
          val cent = cents(s)(codes(s) & 0xff)
          val off = s * subDim
          var i = 0
          while (i < subDim && off + i < q.length) {
            acc += q(off + i).toDouble * cent(i); i += 1
          }
          s += 1
        }
        java.lang.Double.valueOf(acc)
      })
    (q: Column, codes: Column) => u(q, codes)
  }
}
