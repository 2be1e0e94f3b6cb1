package graft

import graft.ops.Matching
import org.scalatest.funsuite.AnyFunSuite

class MatchingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(edges: Seq[(String, String, Long)], rounds: Int = 6) =
    Matching.greedyMatching(edges.toDF("src", "dst", "pr"), "src", "dst",
        rounds = rounds, priorityCol = Some("pr"))
      .as[(String, String, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap

  test("middle edge with lowest priority blocks its neighbors") {
    // path a-b-c-d, priorities ab=1 bc=0 cd=2: bc is both-endpoint minimal,
    // its endpoints retire ab and cd -> maximal matching {bc}
    val got = run(Seq(("a", "b", 1L), ("b", "c", 0L), ("c", "d", 2L)))
    assert(got == Map(("b", "c") -> 1L))
  }

  test("outer edges match in one round when they are locally minimal") {
    val got = run(Seq(("a", "b", 0L), ("b", "c", 1L), ("c", "d", 0L)))
    assert(got == Map(("a", "b") -> 1L, ("c", "d") -> 1L))
  }

  test("second round matches what the first round's removals unblock") {
    // star-ish chain: e1=ab(0) matches; cd blocked round 1 only by bc's
    // local minimality at c? priorities: ab=0, bc=1, cd=2.
    // round 1: a:ab, b:ab, c:bc, d:cd -> ab matched; bc drops (b gone);
    // round 2: only cd remains -> matched
    val got = run(Seq(("a", "b", 0L), ("b", "c", 1L), ("c", "d", 2L)))
    assert(got == Map(("a", "b") -> 1L, ("c", "d") -> 2L))
  }

  test("md5 default yields an independent and maximal edge set") {
    val es = for (i <- 0 until 30; j <- i + 1 until 30 if (i * 7 + j) % 5 == 0)
      yield (s"n$i", s"n$j")
    val edges = es.toDF("src", "dst")
    val m = Matching.greedyMatching(edges, "src", "dst", rounds = 20)
      .as[(String, String, Long)].collect()
    val mv = m.flatMap(p => Seq(p._1, p._2))
    assert(mv.distinct.length == mv.length, "matched edges share a vertex")
    val mvSet = mv.toSet
    es.foreach { case (a, b) =>
      assert(mvSet(a) || mvSet(b), s"unmatched addable edge ($a,$b): not maximal")
    }
  }

  test("local replay ≡ distributed rounds (gate forced off), rounds kept") {
    val rnd = new scala.util.Random(11)
    val es = (1 to 80).map(_ => (s"n${rnd.nextInt(25)}", s"n${rnd.nextInt(25)}"))
    val df = es.toDF("src", "dst")
    for (r <- Seq(1, 3, 6)) {
      val local = Matching.greedyMatching(df, "src", "dst", rounds = r)
        .as[(String, String, Long)].collect().toSet
      val dist = Matching.greedyMatching(df, "src", "dst", rounds = r,
          maxLocalEdges = 0L)
        .as[(String, String, Long)].collect().toSet
      assert(local == dist, s"rounds=$r") // including the round each fell
    }
  }
}
