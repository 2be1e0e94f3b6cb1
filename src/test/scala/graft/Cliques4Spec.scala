package graft

import org.scalatest.funsuite.AnyFunSuite

class Cliques4Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cliques(edges: Seq[(String, String)]) =
    graft.ops.Cliques4.cliqueList(edges.toDF("src", "dst"), "src", "dst")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3)))
      .sorted

  test("K4 yields exactly one clique with sorted corners") {
    val k4 = for {
      i <- 0 until 4; j <- i + 1 until 4
    } yield (s"n$j", s"n$i") // reversed input order: canonicalized inside
    assert(cliques(k4).toSeq == Seq(("n0", "n1", "n2", "n3")))
  }

  test("K5 yields C(5,4) = 5 cliques; K4-minus-an-edge yields none") {
    val k5 = for (i <- 0 until 5; j <- i + 1 until 5) yield (s"n$i", s"n$j")
    assert(cliques(k5).length == 5)
    val broken = (for (i <- 0 until 4; j <- i + 1 until 4)
      yield (s"n$i", s"n$j")).filterNot(_ == ("n0", "n3"))
    assert(cliques(broken).isEmpty)
  }

  test("brute-force parity on a random graph") {
    val rnd = new scala.util.Random(23)
    val nodes = (0 until 12).map(i => f"v$i%02d")
    val edges = (for {
      i <- nodes.indices; j <- (i + 1) until nodes.length
      if rnd.nextInt(100) < 40
    } yield (nodes(i), nodes(j)))
    val es = edges.toSet
    def adj(a: String, b: String) = es.contains((a, b))
    val expected = (for {
      i <- nodes.indices; j <- (i + 1) until nodes.length
      k <- (j + 1) until nodes.length; l <- (k + 1) until nodes.length
      if adj(nodes(i), nodes(j)) && adj(nodes(i), nodes(k)) &&
        adj(nodes(i), nodes(l)) && adj(nodes(j), nodes(k)) &&
        adj(nodes(j), nodes(l)) && adj(nodes(k), nodes(l))
    } yield (nodes(i), nodes(j), nodes(k), nodes(l))).sorted
    assert(cliques(edges).toSeq == expected)
  }

  test("per-node counts sum to 4x the clique count") {
    val k5 = for (i <- 0 until 5; j <- i + 1 until 5) yield (s"n$i", s"n$j")
    val counts = graft.ops.Cliques4.perNodeCounts(k5.toDF("src", "dst"),
        "src", "dst")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(counts.map(_._2).sum == 20L) // 5 cliques x 4 corners
    // every K5 node sits in C(4,3) = 4 of the 5 cliques
    assert(counts.forall(_._2 == 4L))
  }
}
