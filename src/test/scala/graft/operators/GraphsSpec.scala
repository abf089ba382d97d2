package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class GraphsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def stats(edges: Seq[(Long, Long)]) =
    Graphs.triangleStats(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap

  test("triangle + pendant: hand-checked degrees, counts, coefficients") {
    val m = stats(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)))
    assert(m(1L) == ((2L, 1L, Some(1.0))))
    assert(m(2L) == ((2L, 1L, Some(1.0))))
    assert(m(3L) == ((3L, 1L, Some(1.0 / 3.0))))
    assert(m(4L) == ((1L, 0L, None))) // degree 1: coefficient undefined
  }

  test("K4: every node in 3 triangles, coefficient exactly 1") {
    val k4 = for {
      i <- 1L to 4L; j <- (i + 1) to 4L
    } yield (i, j)
    val m = stats(k4)
    assert(m.values.forall(_ == ((3L, 3L, Some(1.0)))))
  }

  test("normalization: duplicates, reversed edges, self-loops collapse") {
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L),
      (2L, 2L))
    val m = stats(messy)
    assert(m(1L)._2 == 1L && m(2L)._2 == 1L && m(3L)._2 == 1L)
    assert(m(2L)._1 == 2L) // the self-loop added no degree
  }

  test("matches a brute-force reference on a pseudo-random graph") {
    // deterministic graph: edge (i, j) when (i*31 + j*17) % 7 == 0
    val edges = for {
      i <- 0L until 30L; j <- (i + 1) until 30L
      if (i * 31 + j * 17) % 7 == 0
    } yield (i, j)
    val es = edges.toSet
    def has(a: Long, b: Long) = es.contains((a min b, a max b))
    val refTriangles = (for {
      x <- 0L until 30L; y <- (x + 1) until 30L; z <- (y + 1) until 30L
      if has(x, y) && has(x, z) && has(y, z)
    } yield (x, y, z)).toSeq
    val refPerNode = refTriangles.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val m = stats(edges)
    m.foreach { case (node, (_, tri, _)) =>
      assert(tri == refPerNode.getOrElse(node, 0L), s"node $node")
    }
    // total triangle incidences = 3 * number of triangles
    assert(m.values.map(_._2).sum == 3L * refTriangles.size)
    // repartition invariance
    val again = Graphs.triangleStats(
      edges.toDF("a", "b").repartition(13), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(again == m.view.mapValues(_._2).toMap)
  }

  test("power-law fixture: hub generates zero wedges; maxDegree hub " +
      "exclusion reports NULL for the hub and subgraph counts below") {
    // 2000-leaf star at node 0 + K4 among leaves 1..4 — the
    // boilerplate-hub shape of a real dup graph
    val star = (1L to 2000L).map(i => (0L, i))
    val k4 = for { i <- 1L to 4L; j <- (i + 1) to 4L } yield (i, j)
    val edges = star ++ k4
    // uncapped: hand-checked — hub sits in the 6 K4-edge triangles;
    // nodes 1..4 see 3 K4-internal + 3 hub triangles each
    val un = stats(edges)
    assert(un(0L) == ((2000L, 6L, Some(12.0 / (2000.0 * 1999.0)))))
    (1L to 4L).foreach { i =>
      assert(un(i) == ((4L, 6L, Some(1.0))), s"node $i")
    }
    assert(un(5L) == ((1L, 0L, None)))
    // capped at 100: the hub row keeps its full degree but counts
    // NULL (uncounted, not zero); nodes 1..4 count the K4 subgraph
    // only (3 each — a lower bound), coeff over full degree
    val capped = Graphs.triangleStats(
      edges.toDF("a", "b"), "a", "b", maxDegree = Some(100L))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(capped(0L) == ((2000L, None, None)))
    (1L to 4L).foreach { i =>
      assert(capped(i) == ((4L, Some(3L), Some(0.5))), s"node $i")
    }
    assert(capped(5L) == ((1L, Some(0L), None)))
    // the same skewed fixture completes through the whole family
    assert(Graphs.pageRank(edges.toDF("a", "b"), "a", "b", 3)
      .count() == 2001L)
    assert(Graphs.degreeAssortativity(edges.toDF("a", "b"), "a", "b")
      .count() == 1L)
    intercept[IllegalArgumentException] {
      Graphs.triangleStats(edges.toDF("a", "b"), "a", "b",
        maxDegree = Some(0L))
    }
  }

  test("kCore: peeling cascade to fixpoint, survivors' in-core " +
      "degrees, loud non-convergence, checkpoint-cadence equality") {
    import spark.implicits._
    def run(edges: Seq[(Long, Long)], k: Int, maxRounds: Int = 16,
        every: Int = 4) =
      Graphs.kCore(edges.toDF("a", "b"), "a", "b", k, maxRounds,
        checkpointEvery = every)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getBoolean(2),
            if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    // triangle 1-2-3 + pendant 3-4: 2-core = the triangle; node 3
    // keeps its FULL degree 3 but an in-core degree of 2
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val m = run(tri, 2)
    assert(m(1L) == ((2L, true, Some(2L))))
    assert(m(2L) == ((2L, true, Some(2L))))
    assert(m(3L) == ((3L, true, Some(2L))))
    assert(m(4L) == ((1L, false, None)))
    // a path cascades empty at k=2 — ends peel, middles follow,
    // MULTIPLE rounds required
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val pm = run(path, 2)
    assert(pm.values.forall(v => !v._2 && v._3.isEmpty))
    // the same cascade cannot finish in 1 round: loud, not silent
    val e = intercept[IllegalArgumentException] {
      run(path, 2, maxRounds = 1)
    }
    assert(e.getMessage.contains("fixpoint"))
    // K4 + tail survives at k=3 exactly as the clique
    val k4 = (for { i <- 1L to 4L; j <- (i + 1) to 4L }
      yield (i, j)) ++ Seq((4L, 9L))
    val km = run(k4, 3)
    assert((1L to 4L).forall(i => km(i)._2 && km(i)._3.contains(3L)))
    assert(km(9L) == ((1L, false, None)))
    // checkpoint cadence is an implementation detail: every=1 and
    // every=100 produce the identical map
    assert(run(tri, 2, every = 1) == run(tri, 2, every = 100))
    intercept[IllegalArgumentException] {
      run(tri, 0)
    }
  }

  test("kCore: broadcast-vs-shuffled alive-set paths are equal across " +
      "the bound; guard loud") {
    import spark.implicits._
    // K4 + pendant: alive set is 4–5 nodes, so broadcastMaxNodes=1
    // forces the UN-HINTED (shuffle) semi-join on every round while
    // the default takes the broadcast path — same fixpoint required
    val k4 = (for { i <- 1L to 4L; j <- (i + 1) to 4L }
      yield (i, j)) ++ Seq((4L, 9L))
    def run(bound: Long) =
      Graphs.kCore(k4.toDF("a", "b"), "a", "b", k = 3,
        broadcastMaxNodes = bound)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getBoolean(2),
            if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(run(1L) == run(10000000L))
    intercept[IllegalArgumentException] {
      Graphs.kCore(k4.toDF("a", "b"), "a", "b", k = 3,
        broadcastMaxNodes = 0L)
    }
  }

  // ---- pageRank (fixed-point) ----

  private val Scale = 1000000000000L

  /** Sequential reference of the fixed-point iteration: identical
    * integer arithmetic, order-free by construction. */
  private def refPageRank(
      edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val und = edges.collect {
      case (a, b) if a != b => (a min b, a max b)
    }.distinct
    val dir = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = dir.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n = deg.size.toLong
    var r = deg.keys.map(_ -> Scale / n).toMap
    for (_ <- 1 to iters) {
      val in = dir.groupBy(_._2).view
        .mapValues(_.map { case (u, _) => r(u) / deg(u) }.sum).toMap
      r = deg.keys.map(v =>
        v -> ((3L * Scale) / (20L * n)
          + (17L * in.getOrElse(v, 0L)) / 20L)).toMap
    }
    r
  }

  private def pr(edges: Seq[(Long, Long)], iters: Int = 3) =
    Graphs.pageRank(edges.toDF("a", "b"), "a", "b", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("pageRank: star center outranks leaves, leaves tie exactly") {
    val star = (2L to 8L).map(i => (1L, i))
    val m = pr(star)
    val leaves = (2L to 8L).map(m)
    assert(leaves.distinct.size == 1)
    assert(m(1L) > leaves.head)
  }

  test("pageRank: a regular graph ranks every node identically") {
    val cycle = (0L until 10L).map(i => (i, (i + 1) % 10))
    assert(pr(cycle).values.toSet.size == 1)
  }

  test("pageRank matches the sequential integer reference exactly") {
    val edges = for {
      i <- 0L until 25L; j <- (i + 1) until 25L
      if (i * 31 + j * 17) % 5 == 0
    } yield (i, j)
    for (iters <- Seq(1, 3)) {
      assert(pr(edges, iters) == refPageRank(edges, iters),
        s"iterations=$iters")
    }
    // repartition + shuffle-order invariance (the point of the
    // fixed-point spelling: integer sums cannot re-associate)
    val again = Graphs.pageRank(
      edges.toDF("a", "b").repartition(17), "a", "b", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == refPageRank(edges, 3))
  }

  test("pageRank: 20 iterations with periodic checkpoints matches " +
      "the reference (lineage truncation changes nothing)") {
    val edges = for {
      i <- 0L until 25L; j <- (i + 1) until 25L
      if (i * 31 + j * 17) % 5 == 0
    } yield (i, j)
    val expected = refPageRank(edges, 20)
    // checkpointEvery=5 fires at iterations 5/10/15; the cap run
    // must complete without lineage blowup AND bit-match the
    // sequential reference
    val ckpt = Graphs.pageRank(edges.toDF("a", "b"), "a", "b",
      iterations = 20, checkpointEvery = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ckpt == expected)
    // a never-firing cadence (25 > 20) produces the identical map
    val plain = Graphs.pageRank(edges.toDF("a", "b"), "a", "b",
      iterations = 20, checkpointEvery = 25)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(plain == expected)
    intercept[IllegalArgumentException] {
      Graphs.pageRank(edges.toDF("a", "b"), "a", "b", 3,
        checkpointEvery = 0)
    }
  }

  test("pageRank: self-loops and duplicate edges normalize away") {
    val m1 = pr(Seq((1L, 2L), (2L, 3L)))
    val m2 = pr(Seq((1L, 2L), (2L, 1L), (1L, 1L), (2L, 3L), (2L, 3L)))
    assert(m1 == m2)
  }

  test("pageRank: empty edge list yields an empty frame") {
    assert(pr(Seq.empty[(Long, Long)]).isEmpty)
  }

  test("pageRank: emitted double is exactly rank_scaled / 1e12") {
    val rows = Graphs.pageRank(
      Seq((1L, 2L), (2L, 3L)).toDF("a", "b"), "a", "b", 2).collect()
    rows.foreach { r =>
      assert(r.getDouble(2) == r.getLong(1).toDouble / 1.0e12)
    }
  }

  private def assortativity(edges: Seq[(Long, Long)]): org.apache.spark.sql.Row =
    Graphs.degreeAssortativity(edges.toDF("a", "b"), "a", "b").head()

  test("degreeAssortativity: star is maximally disassortative (r = -1)") {
    val star = (2L to 6L).map(i => (1L, i))
    val r = assortativity(star)
    assert(r.getLong(0) == 6L && r.getLong(1) == 5L &&
      r.getLong(2) == 10L)
    assert(math.abs(r.getDouble(3) - (-1.0)) < 1e-12)
  }

  test("degreeAssortativity: regular graphs have zero degree variance -> null r") {
    // a 4-cycle: every degree 2
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    val r = assortativity(cycle)
    assert(r.getLong(0) == 4L && r.getLong(1) == 4L)
    assert(r.isNullAt(3))
  }

  test("degreeAssortativity matches the naive Pearson reference") {
    val rnd = new scala.util.Random(5)
    val edges = (0 until 200)
      .map(_ => (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter(e => e._1 != e._2)
    val got = assortativity(edges)
    // naive reference: normalize, mirror, Pearson over half-edges
    val und = edges.map(e =>
      (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val dir = und ++ und.map(_.swap)
    val deg = dir.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val xs = dir.map { case (u, v) => (deg(u), deg(v)) }
    val m = xs.size.toDouble
    val sx = xs.map(_._1).sum.toDouble
    val sxx = xs.map(p => p._1 * p._1).sum.toDouble
    val sxy = xs.map(p => p._1 * p._2).sum.toDouble
    val ref = (m * sxy - sx * sx) / (m * sxx - sx * sx)
    assert(math.abs(got.getDouble(3) - ref) < 1e-12)
    // duplicate edges and both orientations normalize away
    val doubled = edges ++ edges.map(_.swap)
    assert(assortativity(doubled).getDouble(3) == got.getDouble(3))
  }

  private def predict(
      edges: Seq[(Long, Long)],
      minCommon: Int = 1,
      maxDegree: Long = 1000L) =
    Graphs.linkPrediction(edges.toDF("a", "b"), "a", "b",
      minCommon, maxDegree)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap

  test("linkPrediction: path wedge and square diagonals, hand Adamic-Adar") {
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    // path 1-2-3: the only distance-2 pair is (1,3) through center 2
    val path = predict(Seq((1L, 2L), (2L, 3L)))
    assert(path.keySet == Set((1L, 3L)))
    assert(path((1L, 3L)) == ((1L, 1.0, r6(1.0 / math.log(2.0)))))
    // square 1-2-3-4-1: both diagonals, two shared degree-2 corners
    val sq = predict(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)))
    assert(sq.keySet == Set((1L, 3L), (2L, 4L)))
    val aa2 = r6(1.0 / math.log(2.0) + 1.0 / math.log(2.0))
    assert(sq((1L, 3L)) == ((2L, 1.0, aa2)))
    assert(sq((2L, 4L)) == ((2L, 1.0, aa2)))
    // triangle: every pair adjacent — nothing at distance 2
    assert(predict(Seq((1L, 2L), (2L, 3L), (1L, 3L))).isEmpty)
  }

  test("linkPrediction: hub cap silences wedges; minCommon filters") {
    val star = (1L to 5L).map(i => (100L, i))
    // center degree 5 > cap 4: no evidence survives
    assert(predict(star, maxDegree = 4L).isEmpty)
    // cap admits the center: all C(5,2) leaf pairs appear
    val full = predict(star, maxDegree = 5L)
    assert(full.size == 10)
    assert(full.values.forall(_._1 == 1L))
    // jaccard for two degree-1 leaves sharing their only neighbor
    assert(full((1L, 2L))._2 == 1.0)
    // two centers 100, 200 over leaves 1..3: leaf pairs share the 2
    // centers, the center pair shares all 3 leaves — minCommon slices
    // between them
    val twoC = (1L to 3L).flatMap(i => Seq((100L, i), (200L, i)))
    assert(predict(twoC, minCommon = 3).keySet == Set((100L, 200L)))
    val kept = predict(twoC, minCommon = 2)
    assert(kept.keySet ==
      Set((1L, 2L), (1L, 3L), (2L, 3L), (100L, 200L)))
    assert(kept((1L, 2L))._1 == 2L && kept((100L, 200L))._1 == 3L)
  }

  test("linkPrediction: deterministic under repartition; loud contracts") {
    val edges = (0 until 300).map { i =>
      (i.toLong % 23L, 23L + (i * 7L) % 31L)
    }
    val a = Graphs.linkPrediction(
      edges.toDF("a", "b").repartition(1), "a", "b")
      .orderBy("id_a", "id_b").collect().toSeq
    val b = Graphs.linkPrediction(
      edges.toDF("a", "b").repartition(13), "a", "b")
      .orderBy("id_a", "id_b").collect().toSeq
    assert(a == b && a.nonEmpty)
    intercept[IllegalArgumentException] {
      Graphs.linkPrediction(edges.toDF("a", "b"), "a", "b",
        minCommon = 0)
    }
    intercept[IllegalArgumentException] {
      Graphs.linkPrediction(edges.toDF("a", "b"), "a", "b",
        maxDegree = 1L)
    }
    intercept[IllegalArgumentException] {
      Graphs.linkPrediction(edges.toDF("a", "b"), "a", "b",
        maxCommon = 0L)
    }
  }

  test("linkPrediction: per-pair common-neighbor count over maxCommon " +
      "raises at execution with the offending pair — and since r10 " +
      "the aggregation buffer never materialized past the cap") {
    // star through 3 low-degree centers: pair (100, 200) shares all
    // 3 of them — every center passes maxDegree, so only maxCommon
    // can catch the count-unbounded fold (state boundedness itself
    // is pinned by the CappedSortedLongs unit spec below)
    val edges = (1L to 3L).flatMap(c => Seq((100L, c), (200L, c)))
    val ok = Graphs.linkPrediction(edges.toDF("a", "b"), "a", "b",
      maxCommon = 3L).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(ok((100L, 200L)) == 3L) // exactly at the bound: fine
    val e = intercept[Exception] {
      Graphs.linkPrediction(edges.toDF("a", "b"), "a", "b",
        maxCommon = 2L).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("maxCommon=2")))
  }

  test("CappedSortedLongs: state hard-stops at the cap, overflow " +
      "finishes empty, within-cap groups finish sorted regardless of " +
      "merge order") {
    import graft.functions.TypedAggregators.CappedSortedLongs
    val agg = new CappedSortedLongs(3L)
    // within cap: values out of order across two partial buffers
    val a = Seq(5L, 2L).foldLeft(agg.zero)(agg.reduce)
    val b = Seq(7L).foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(agg.merge(a, b)).toSeq == Seq(2L, 5L, 7L))
    // overflow via reduce: buffer stops growing at the cap and the
    // exact count keeps counting; finish is unambiguously empty
    val over = (1L to 10L).foldLeft(agg.zero)(agg.reduce)
    assert(over.n == 10L && over.vs.size <= 3)
    assert(over.vs.isEmpty) // dropped eagerly once the cap tripped
    assert(agg.finish(over).isEmpty)
    // overflow via merge of two within-cap partials
    val c = Seq(1L, 2L).foldLeft(agg.zero)(agg.reduce)
    val d = Seq(3L, 4L).foldLeft(agg.zero)(agg.reduce)
    val m = agg.merge(c, d)
    assert(m.n == 4L && m.vs.isEmpty && agg.finish(m).isEmpty)
    intercept[IllegalArgumentException] { new CappedSortedLongs(0L) }
  }

  test("linkPrediction preCountGuard: fails at BUILD before any list " +
      "materializes; agrees with the default path when clean") {
    val edges = (1L to 3L).flatMap(c => Seq((100L, c), (200L, c)))
    // the opt-in count-only pre-pass raises at operator build
    // (IllegalArgumentException from require), not at the action
    val e = intercept[IllegalArgumentException] {
      Graphs.linkPrediction(edges.toDF("a", "b"), "a", "b",
        maxCommon = 2L, preCountGuard = true)
    }
    assert(e.getMessage.contains("pre-count guard") &&
      e.getMessage.contains("maxCommon=2"))
    // clean run: guarded and unguarded paths emit identical rows
    val base = Graphs.linkPrediction(edges.toDF("a", "b"), "a", "b")
      .orderBy("id_a", "id_b").collect().toSeq
    val guarded = Graphs.linkPrediction(edges.toDF("a", "b"), "a", "b",
        preCountGuard = true)
      .orderBy("id_a", "id_b").collect().toSeq
    assert(base == guarded && base.nonEmpty)
  }

  test("labelPropagation: two triangles over a weak bridge settle " +
      "into two communities; swap parity pinned; dupes collapse") {
    val edges = Seq(
      (1L, 2L), (2L, 3L), (1L, 3L),           // triangle A
      (4L, 5L), (5L, 6L), (4L, 6L),           // triangle B
      (3L, 4L),                               // weak bridge
      (7L, 8L),                               // isolated pair
      (2L, 1L), (1L, 2L)                      // dupes + reverse: one edge
    )
    val got = Graphs.labelPropagation(
      edges.toDF("a", "b"), "a", "b", rounds = 4)
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // hand-traced 4 synchronous rounds (min-label ties):
    // {1,2,3} -> community 1, {4,5,6} -> community 3; the two-node
    // component swaps labels each round and lands on identity at
    // even parity
    assert(got == Seq(
      (1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (4L, 3L, 3L), (5L, 3L, 3L), (6L, 3L, 3L),
      (7L, 7L, 1L), (8L, 8L, 1L)))
    // repartition-invariant: integer counts + id ties only
    val again = Graphs.labelPropagation(
      edges.toDF("a", "b").repartition(7), "a", "b", rounds = 4)
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(again == got)
    intercept[IllegalArgumentException] {
      Graphs.labelPropagation(edges.toDF("a", "b"), "a", "b",
        rounds = 9)
    }
    intercept[IllegalArgumentException] {
      Graphs.labelPropagation(edges.toDF("a", "b"), "a", "b",
        rounds = 0)
    }
  }

  test("modularity: hand rationals on the two-triangle fixture; " +
      "all-one-community partition scores exactly zero") {
    val edges = Seq(
      (1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L),
      (3L, 4L), (7L, 8L)
    ).toDF("a", "b")
    val comm = Graphs.labelPropagation(edges, "a", "b", rounds = 4)
      .select(col("node"), col("community"))
    val got = Graphs.modularity(edges, "a", "b", comm)
      .orderBy("community").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    // m=8; triangles: L=3, d=7 -> (96-49)/256; singletons: (0-1)/256
    assert(got == Seq(            // 47/256 and -1/256 at the 6-dp face
      (1L, 3L, 3L, 7L, 0.183594),
      (3L, 3L, 3L, 7L, 0.183594),
      (7L, 1L, 0L, 1L, -0.003906),
      (8L, 1L, 0L, 1L, -0.003906)))
    // Q = 2*(47/256) - 2*(1/256) = 0.359375: strong structure
    assert(math.abs(got.map(_._5).sum - 0.359375) < 1e-5)
    // the degenerate one-community partition is exactly Q = 0
    val one = comm.select(col("node"), lit(0L).as("community"))
    val flat = Graphs.modularity(edges, "a", "b", one).collect()
    assert(flat.length == 1 && flat.head.getDouble(4) == 0.0)
    // a PARTIAL assignment would silently drop edges from L_c:
    // loud failure instead — in-plan since r9 (raise_error at the
    // action; the old build-time collects re-ran the caller's LPA
    // chain twice), so the error surfaces wrapped by Spark
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    val partial = comm.filter(col("node") =!= 7L)
    val e = intercept[Exception] {
      Graphs.modularity(edges, "a", "b", partial).collect()
    }
    assert(messages(e).exists(
      _.contains("exactly one community per graph node")))
    // a node assigned TWICE would double-count degree mass and edges
    val doubled = comm.unionByName(
      comm.filter(col("node") === 1L)
        .select(col("node"), lit(99L).as("community")))
    val e2 = intercept[Exception] {
      Graphs.modularity(edges, "a", "b", doubled).collect()
    }
    assert(messages(e2).exists(
      _.contains("exactly one community per graph node")))
  }
}
