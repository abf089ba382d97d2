package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class LinkageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def run(names: Seq[String], k: Int = 2, q: Int = 2) =
    Linkage.nameVariantPairs(names.toDF("name"), "name", k, q)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .toSet

  private def brute(names: Seq[String], k: Int) = {
    val dict = names.groupBy(identity).view.mapValues(_.size.toLong)
    val ds = dict.keys.toSeq.sorted
    (for {
      i <- ds.indices; j <- (i + 1) until ds.size
      d = lev(ds(i), ds(j)) if d <= k
    } yield (ds(i), ds(j), d.toLong, dict(ds(i)), dict(ds(j)))).toSet
  }

  test("hand example: planted variants link, distant names do not") {
    val names = Seq("cold bolt", "old bolt", "cold bolt", "red plate",
      "red plates", "green gear")
    val got = run(names)
    assert(got == Set(
      ("cold bolt", "old bolt", 1L, 2L, 1L),
      ("red plate", "red plates", 1L, 1L, 1L)))
  }

  test("exact duplicates collapse into the dictionary, dist-0 absent") {
    // same value twice: one dictionary row, no self pair
    assert(run(Seq("same", "same")).isEmpty)
  }

  test("blocked result == quadratic ground truth on pseudo-random strings") {
    val alphabet = "abcd"
    // deterministic 6-char strings over a tiny alphabet: collisions
    // and near-misses guaranteed
    val names = (0 until 160).map { i =>
      (0 until 6).map(p => alphabet(((i * (p + 3) + p * 7) % 4))).mkString
    }
    for (k <- Seq(1, 2)) {
      assert(run(names, k) == brute(names, k), s"maxDist=$k")
    }
  }

  test("repeated grams inside one string block correctly (multiset occ)") {
    // "aaaa" vs "aaab": shared gram "aa" occurs 3x vs 2x — the pair
    // must still surface via (gram, occ) identity
    val names = Seq("aaaa", "aaab")
    assert(run(names, 1) == Set(("aaaa", "aaab", 1L, 1L, 1L)))
  }

  test("sub-q strings fail loudly") {
    val e = intercept[IllegalArgumentException] {
      run(Seq("ok", "x"))
    }
    assert(e.getMessage.contains("sub-"))
  }

  test("null names fail loudly") {
    val df = Seq(Some("okay"), None).toDF("name")
    val e = intercept[IllegalArgumentException] {
      Linkage.nameVariantPairs(df, "name")
    }
    assert(e.getMessage.contains("null"))
  }

  test("maxDist 0 finds nothing on a distinct dictionary") {
    assert(run(Seq("abcd", "abce", "abcf"), 0).isEmpty)
  }

  private def snRun(names: Seq[String], w: Int, maxDist: Int = 2) =
    Linkage.sortedNeighborhood(
      names.toDF("n"), "n", window = w, maxDist = maxDist)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getInt(3)))

  test("sortedNeighborhood == rank-window reference; once per pair") {
    val rnd = new scala.util.Random(3)
    // clustered names: variants of a few stems -> real near matches
    val names = (0 until 60).map { i =>
      val stem = s"part${i % 12}"
      if (i < 12) stem else stem + ('a' + rnd.nextInt(4)).toChar
    }.distinct
    for (w <- Seq(3, 8, 40)) {
      val got = snRun(names, w)
      assert(got.length == got.toSet.size, s"dup pairs at w=$w")
      val sorted = names.sorted
      val rank = sorted.zipWithIndex.toMap
      def lev(a: String, b: String): Int = {
        val d = Array.tabulate(a.length + 1, b.length + 1) {
          (i, j) => if (i == 0) j else if (j == 0) i else 0 }
        for (i <- 1 to a.length; j <- 1 to b.length)
          d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
            d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        d(a.length)(b.length)
      }
      val ref = (for {
        a <- sorted; b <- sorted
        if rank(b) > rank(a) && rank(b) - rank(a) < w
        if lev(a, b) <= 2
      } yield (a, b, (rank(b) - rank(a)).toLong, lev(a, b))).toSet
      assert(got.toSet == ref, s"w=$w")
    }
    // wider window only adds pairs
    assert(snRun(names, 3).toSet.subsetOf(snRun(names, 40).toSet))
    // duplicates collapse to the dictionary before ranking
    val dup = snRun(names ++ names, 8)
    assert(dup.toSet == snRun(names, 8).toSet)
    intercept[IllegalArgumentException] {
      Linkage.sortedNeighborhood(names.toDF("n"), "n", window = 1)
    }
  }
}
