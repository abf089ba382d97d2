package graft.operators

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
}
