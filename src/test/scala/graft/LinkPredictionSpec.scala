package graft

import graft.ops.LinkPrediction
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LinkPredictionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("RA index on a known fixture") {
    // path a-w-b plus w-c: pairs through center w (deg 3)
    val edges = Seq(("w", "a"), ("w", "b"), ("w", "c")).toDF("src", "dst")
    val got = LinkPrediction.resourceAllocation(edges, "src", "dst")
      .as[(String, String, Long, Long)].collect().toSet
    val third = 1000000000L / 3
    assert(got == Set(("a", "b", 1L, third), ("a", "c", 1L, third),
      ("b", "c", 1L, third)))
  }

  test("existing edges are excluded; multiple centers accumulate") {
    // square a-b-c-d-a: (a,c) and (b,d) are the non-edges, each with two
    // degree-2 common neighbors → ra_q = 2 * 5e8
    val square = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"))
      .toDF("src", "dst")
    val got = LinkPrediction.resourceAllocation(square, "src", "dst")
      .as[(String, String, Long, Long)].collect().toSet
    assert(got == Set(("a", "c", 2L, 1000000000L), ("b", "d", 2L, 1000000000L)))
  }

  test("hot centers are excluded with bounded score loss") {
    // hub h connected to 10 leaves, plus a private wedge l0-m-l1
    val hub = (0 until 10).map(i => ("h", s"l$i"))
    val wedge = Seq(("m", "l0"), ("m", "l1"))
    val edges = (hub ++ wedge).toDF("src", "dst")
    val capped = LinkPrediction.resourceAllocation(edges, "src", "dst",
        maxCenterDegree = 5)
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // leaf pairs through the hub (deg 10 > 5) vanish unless another center
    // connects them; (l0, l1) survives via m (deg 2) with only m's weight,
    // and (h, m) is a legitimate prediction via centers l0 and l1 (deg 2)
    assert(capped.keySet == Set(("l0", "l1"), ("h", "m")))
    assert(capped(("l0", "l1"))._4 == 500000000L)
    assert(capped(("h", "m")) == ("h", "m", 2L, 1000000000L))
    val uncapped = LinkPrediction.resourceAllocation(edges, "src", "dst")
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    // with the hub included the same pair also gets 1e9/10
    assert(uncapped(("l0", "l1")) == 500000000L + 100000000L)
  }

  test("neighbor-Jaccard per-mille on path and square fixtures") {
    // path a-w-b: candidate (a,b), common {w}, deg 1/1 -> 1000*1/(1+1-1)
    val path = Seq(("w", "a"), ("w", "b")).toDF("src", "dst")
    val gotPath = LinkPrediction.neighborJaccard(path, "src", "dst")
      .as[(String, String, Long, Long, Long, Long)].collect().toSet
    assert(gotPath == Set(("a", "b", 1L, 1L, 1L, 1000L)))
    // square a-b-c-d-a: (a,c) common {b,d}, deg 2/2 -> 1000*2/(2+2-2)
    val square = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"))
      .toDF("src", "dst")
    val gotSq = LinkPrediction.neighborJaccard(square, "src", "dst")
      .as[(String, String, Long, Long, Long, Long)].collect().toSet
    assert(gotSq == Set(("a", "c", 2L, 2L, 2L, 1000L), ("b", "d", 2L, 2L, 2L, 1000L)))
  }

  test("neighbor-Jaccard center cap drops hub wedges, keeps exact degrees") {
    // hub h (deg 10) + private wedge l0-m-l1: cap 5 keeps only wedges
    // through m; (l0,l1) common drops to 1 but degrees stay full (2 each)
    val hub = (0 until 10).map(i => ("h", s"l$i"))
    val edges = (hub ++ Seq(("m", "l0"), ("m", "l1"))).toDF("src", "dst")
    val capped = LinkPrediction.neighborJaccard(edges, "src", "dst",
        maxCenterDegree = 5)
      .as[(String, String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(capped(("l0", "l1")) == ("l0", "l1", 1L, 2L, 2L, 1000L * 1 / 3))
    assert(capped(("h", "m")) == ("h", "m", 2L, 10L, 2L, 1000L * 2 / 10))
  }

  test("RA and Jaccard: local wedge replay ≡ distributed (gate forced off)") {
    // hub above the cap + shared-neighbor pairs + existing closing edges
    val hub = (0 until 8).map(i => ("h", s"l$i"))
    val edges = (hub ++ Seq(("m", "l0"), ("m", "l1"), ("l0", "l1"),
      ("l2", "l3"), ("m", "l2"), ("p", "l0"), ("p", "m"))).toDF("src", "dst")
    for (cap <- Seq(5, 1024); minC <- Seq(1, 2)) {
      val raL = LinkPrediction.resourceAllocation(edges, "src", "dst",
          maxCenterDegree = cap, minCommon = minC)
        .as[(String, String, Long, Long)].collect().toSet
      val raD = LinkPrediction.resourceAllocation(edges, "src", "dst",
          maxCenterDegree = cap, minCommon = minC, maxLocalEdges = 0L)
        .as[(String, String, Long, Long)].collect().toSet
      assert(raL == raD, s"RA cap=$cap minCommon=$minC")
      val jL = LinkPrediction.neighborJaccard(edges, "src", "dst",
          maxCenterDegree = cap, minCommon = minC)
        .as[(String, String, Long, Long, Long, Long)].collect().toSet
      val jD = LinkPrediction.neighborJaccard(edges, "src", "dst",
          maxCenterDegree = cap, minCommon = minC, maxLocalEdges = 0L)
        .as[(String, String, Long, Long, Long, Long)].collect().toSet
      assert(jL == jD, s"Jaccard cap=$cap minCommon=$minC")
    }
  }
}
