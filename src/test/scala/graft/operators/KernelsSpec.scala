package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.TextFunctions

/** The kernels are JIT'd twins of Column-expression spellings; the
  * oracle correctness of q33/q35/q36 rests on the twins agreeing.
  * This suite pins that equivalence on the real fixture corpus. */
class KernelsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("Kernels.wordNgrams == TextFunctions.wordNgrams on every fixture doc") {
    import spark.implicits._
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val kernelUdf = udf((t: String) => Kernels.wordNgrams(t, 3))
    val mismatches = docs.select(
      col("doc_id"),
      kernelUdf(col("text")).as("k"),
      TextFunctions.wordNgrams(col("text"), 3).as("c"))
      .filter(col("k") =!= col("c"))
      .count()
    assert(mismatches == 0)
    // plus hand cases: empties, repeated grams, multi-space
    for (t <- Seq("", "a", "a b", "a b c", "a  b   c d", "x y x y x y")) {
      val viaKernel = Kernels.wordNgrams(t, 3).toSeq
      val viaColumn = Seq(t).toDF("text")
        .select(TextFunctions.wordNgrams(col("text"), 3))
        .head().getSeq[String](0).toSeq
      assert(viaKernel == viaColumn, s"text '$t'")
    }
  }

  test("Kernels.jaccard == array_intersect/union counts") {
    val a = Seq("x", "y", "z")
    val b = Seq("y", "z", "w", "v")
    assert(Kernels.jaccard(a, b) == 2.0 / 5.0)
    assert(Kernels.jaccard(a, a) == 1.0)
    assert(Kernels.jaccard(a, Seq.empty) == 0.0)
    assert(Kernels.jaccard(Seq.empty, Seq.empty) == 0.0)
  }

  test("minHashSignature: deterministic, monotone under superset for any single hash") {
    val s1 = Kernels.minHashSignature(Seq("a b c", "b c d"), 16)
    val s2 = Kernels.minHashSignature(Seq("a b c", "b c d"), 16)
    assert(s1.toSeq == s2.toSeq)
    // adding elements can only lower each min
    val s3 = Kernels.minHashSignature(Seq("a b c", "b c d", "c d e"), 16)
    s1.zip(s3).foreach { case (x, y) => assert(y <= x) }
    // identical sets in different order: same signature
    val s4 = Kernels.minHashSignature(Seq("b c d", "a b c"), 16)
    assert(s1.toSeq == s4.toSeq)
  }

  test("hash64 is stable (pins the on-disk/bucket contract)") {
    assert(Kernels.hash64("abc", 42L) == Kernels.hash64("abc", 42L))
    assert(Kernels.hash64("abc", 42L) != Kernels.hash64("abd", 42L))
    assert(Kernels.hash64("abc", 1L) != Kernels.hash64("abc", 2L))
  }

  test("simHash64: order-insensitive for same multiset, sensitive to content") {
    val a = Kernels.simHash64(Seq("w1", "w2", "w3"))
    assert(Kernels.simHash64(Seq("w3", "w1", "w2")) == a)
    assert(Kernels.simHash64(Seq("w1", "w2", "zzz")) != a)
    assert(Kernels.simHash64(Seq.empty) == 0L)
  }

  test("md5Lower64 == DuckDB md5_number_lower (cross-engine contract)") {
    // pinned against duckdb: SELECT md5_number_lower('hello') etc.,
    // converted to signed two's-complement
    def signed(u: BigInt): Long =
      (if (u >= (BigInt(1) << 63)) u - (BigInt(1) << 64) else u).toLong
    assert(Kernels.md5Lower64("hello") == signed(BigInt("10575884659879408057")))
    assert(Kernels.md5Lower64("a") == signed(BigInt("7000413967451013937")))
    assert(Kernels.md5Lower64("") == signed(BigInt("9098107892288553193")))
  }

  test("simHash64Md5 shares simHash64's semantics on a different hash") {
    val a = Kernels.simHash64Md5(Seq("w1", "w2", "w3"))
    assert(Kernels.simHash64Md5(Seq("w3", "w1", "w2")) == a)
    assert(Kernels.simHash64Md5(Seq("w1", "w2", "zzz")) != a)
    assert(Kernels.simHash64Md5(Seq.empty) == 0L)
    assert(a != Kernels.simHash64(Seq("w1", "w2", "w3")))
  }
}
