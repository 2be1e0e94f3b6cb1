package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.NodeSketch

class NodeSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("star leaves have identical radius-2 balls -> identical sketches") {
    val edges = Seq(("c", "l1"), ("c", "l2"), ("c", "l3"), ("c", "l4"))
      .toDF("src", "dst")
    val sig = NodeSketch.sketches(edges, "src", "dst", k = 8, rounds = 2)
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.map(r => r.getInt(1) -> r.getLong(2)).sorted.toSeq)
      .toMap
    assert(sig.size == 5 && sig.forall(_._2.size == 8))
    // every leaf sees the whole graph within radius 2
    assert(sig("l1") == sig("l2") && sig("l2") == sig("l3")
      && sig("l3") == sig("l4"))

    val pairs = NodeSketch.similarPairs(edges, "src", "dst", k = 8,
      rounds = 2, minMatch = 8)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(3)))
    // all 6 leaf pairs at 8/8 = 1000 permille (the center's ball is the
    // same node SET here too, so it may join them — check leaves only)
    val leafPairs = pairs.filter(p => p._1.startsWith("l") && p._2.startsWith("l"))
    assert(leafPairs.length == 6 && leafPairs.forall(_._3 == 1000L))
  }

  test("sketch lanes are ball minima (brute-force replay)") {
    // path a-b-c-d-e: radius-2 ball of c = {a..e}, of a = {a,b,c}
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"))
      .toDF("src", "dst")
    val sig = NodeSketch.sketches(edges, "src", "dst", k = 4, rounds = 2)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    val base = sig.keys.map(_._1).toSeq.distinct.map { n =>
      n -> (0 until 4).map { lane =>
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(s"ns$lane:$n".getBytes("UTF-8"))
        java.lang.Long.parseLong(
          md.take(8).map(b => f"$b%02x").mkString.take(15), 16)
      }
    }.toMap
    val ball = Map(
      "a" -> Seq("a", "b", "c"), "b" -> Seq("a", "b", "c", "d"),
      "c" -> Seq("a", "b", "c", "d", "e"),
      "d" -> Seq("b", "c", "d", "e"), "e" -> Seq("c", "d", "e"))
    for ((n, bs) <- ball; lane <- 0 until 4)
      assert(sig((n, lane)) == bs.map(m => base(m)(lane)).min,
        s"node $n lane $lane")
  }
}
