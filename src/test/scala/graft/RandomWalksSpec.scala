package graft

import graft.ops.RandomWalks
import org.scalatest.funsuite.AnyFunSuite

class RandomWalksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(edges: Seq[(String, String)], seeds: Seq[String],
      steps: Int): Map[(String, Long), String] =
    RandomWalks.walks(edges.toDF("src", "dst"), "src", "dst",
        seeds.toDF("s"), "s", steps)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._3) -> r._2).toMap

  test("single out-edge chains are followed exactly") {
    val got = run(Seq(("a", "b"), ("b", "c"), ("c", "d")), Seq("a"), 3)
    assert(got == Map(("a", 0L) -> "a", ("a", 1L) -> "b",
      ("a", 2L) -> "c", ("a", 3L) -> "d"))
  }

  test("walks stop at sink nodes: no rows past the dead end") {
    val got = run(Seq(("a", "b")), Seq("a"), 4)
    assert(got == Map(("a", 0L) -> "a", ("a", 1L) -> "b"))
  }

  test("branch choice replays the md5 argmin deterministically") {
    val edges = Seq(("a", "x"), ("a", "y"), ("a", "z"))
    val got1 = run(edges, Seq("a"), 1)
    val got2 = run(edges, Seq("a"), 1)
    assert(got1 == got2)
    // the chosen neighbor is the md5-score argmin, computed independently
    val choice = got1(("a", 1L))
    val expected = Seq("x", "y", "z").minBy { u =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(("walka|1|" + u).getBytes("UTF-8"))
      val hex = h.map("%02x".format(_)).mkString.take(15)
      (java.lang.Long.parseLong(hex, 16), u)
    }
    assert(choice == expected)
  }

  test("distinct walks from distinct seeds diverge (per-walk coin)") {
    // complete-ish digraph: every node links to every other; the per-walk
    // salt means two seeds almost surely pick different second steps
    val ns = (0 until 8).map(i => s"n$i")
    val edges = for (a <- ns; b <- ns if a != b) yield (a, b)
    val got = run(edges, ns, 2)
    assert(got.size == 8 * 3)
    val secondSteps = ns.map(s => got((s, 2L))).distinct
    assert(secondSteps.size > 1)
  }

  test("multi-seed walks each follow their own path on the journey graph") {
    val e = graft.queries.Tables
      .userSequenceEdges(spark, "/root/testdata/sf0.001")
    val seeds = e.select("src").distinct().orderBy("src").limit(10)
    val nSeeds = seeds.count() // sf0.001 has fewer than 10 sources
    val out = RandomWalks.walks(e, "src", "dst", seeds, "src", steps = 3)
      .as[(String, String, Long)].collect()
    val byWalk = out.groupBy(_._1)
    assert(byWalk.size == nSeeds)
    byWalk.values.foreach { rows =>
      // step 0 exists and equals the walk id; steps are consecutive
      val steps = rows.map(_._3).sorted
      assert(steps.head == 0L)
      assert(steps.zipWithIndex.forall { case (s, i) => s == i.toLong })
      val seed = rows.find(_._3 == 0L).get
      assert(seed._2 == seed._1)
    }
  }
}
