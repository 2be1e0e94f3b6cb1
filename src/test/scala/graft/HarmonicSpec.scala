package graft

import graft.ops.Harmonic
import org.scalatest.funsuite.AnyFunSuite

class HarmonicSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // path graph 1-2-3-4-5, all sources (rate 1000), radius 4 covers every
  // pair; lcm(1..4) = 12, so H_num(v) = Σ 12/d over the other nodes
  test("harmonicCentrality: exact on a path graph at full source rate") {
    val edges = Seq(("1", "2"), ("2", "3"), ("3", "4"), ("4", "5"))
      .toDF("src", "dst")
    val out = Harmonic.harmonicCentrality(edges, "src", "dst", rounds = 4)
      .select("node", "n_reached", "harmonic_num", "harmonic_den")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // node 3: d = 1,1,2,2 -> 12+12+6+6 = 36
    assert(out("3") == (("3", 4L, 36L, 12L)))
    // node 1: d = 1,2,3,4 -> 12+6+4+3 = 25
    assert(out("1") == (("1", 4L, 25L, 12L)))
    // node 2: d = 1,1,2,3 -> 12+12+6+4 = 34
    assert(out("2") == (("2", 4L, 34L, 12L)))
    // symmetry of the path
    assert(out("5")._3 == 25L && out("4")._3 == 34L)
  }

  test("harmonicCentrality: radius truncation drops far pairs") {
    val edges = Seq(("1", "2"), ("2", "3"), ("3", "4"), ("4", "5"))
      .toDF("src", "dst")
    val out = Harmonic.harmonicCentrality(edges, "src", "dst", rounds = 2)
      .select("node", "n_reached", "harmonic_num")
      .as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
    // lcm(1,2) = 2; node 1 reaches only 2 (d1) and 3 (d2): 2 + 1 = 3
    assert(out("1") == (("1", 2L, 3L)))
    // node 3 reaches all four within radius 2: 2+2+1+1 = 6
    assert(out("3") == (("3", 4L, 6L)))
  }

  test("harmonicCentrality: multi-edges and direction are ignored") {
    val edges = Seq(("1", "2"), ("2", "1"), ("1", "2"), ("2", "3"))
      .toDF("src", "dst")
    val out = Harmonic.harmonicCentrality(edges, "src", "dst", rounds = 3)
      .select("node", "harmonic_num").as[(String, Long)].collect().toMap
    // lcm(1..3) = 6; node 1: d(2)=1, d(3)=2 -> 6+3 = 9
    assert(out("1") == 9L)
    assert(out("2") == 12L)
  }

  test("local replay ≡ distributed frontier BFS (gate forced off)") {
    // branching + a disconnected pair + sampled sources: pins the md5
    // source sample AND the truncated integer terms across both paths
    val edges = (Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
      ("b", "f"), ("f", "g"), ("g", "a"), ("x", "y")) ++
      (1 to 40).map(i => (s"n$i", s"n${i + 1}"))).toDF("src", "dst")
    for (rate <- Seq(1000, 500, 200); rounds <- Seq(2, 4)) {
      val local = Harmonic.harmonicCentrality(edges, "src", "dst",
          rounds, rate, salt = "s8")
        .as[(String, Long, Long, Long)].collect().toSet
      val dist = Harmonic.harmonicCentrality(edges, "src", "dst",
          rounds, rate, salt = "s8", maxLocalEdges = 0L)
        .as[(String, Long, Long, Long)].collect().toSet
      assert(local == dist, s"rate=$rate rounds=$rounds")
    }
  }
}
