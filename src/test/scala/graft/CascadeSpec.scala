package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CascadeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(edges: Seq[(String, String)], k: Int = 2,
      permille: Int = 1000, rounds: Int = 6) =
    graft.ops.Cascade.thresholdCascade(edges.toDF("src", "dst"),
        "src", "dst", k = k, seedPermille = permille, rounds = rounds)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("all-seed start activates everything at round 0") {
    val m = run(Seq(("a", "b"), ("b", "c")), permille = 1000)
    assert(m.values.forall(_ == 0L))
  }

  test("rounds are monotone: neighbors of enough seeds fire in order") {
    // permille=1000 seeds everything; instead force determinism with
    // k=1 on a path: whoever IS seeded spreads one hop per round
    val m = run((0 until 6).map(i => (f"p$i%02d", f"p${i + 1}%02d")),
      k = 1, permille = 250, rounds = 10)
    // every activated non-seed must have an activated neighbor one
    // round earlier
    val byNode = m
    (0 to 6).map(i => f"p$i%02d").foreach { n =>
      val r = byNode(n)
      if (r > 0) {
        val nbrs = (0 to 6).map(i => f"p$i%02d").filter(o =>
          (byNode.keySet.contains(o)) && math.abs(o.drop(1).toInt - n.drop(1).toInt) == 1)
        assert(nbrs.exists(o => byNode(o) == r - 1),
          s"$n fired at $r without a neighbor at ${r - 1}")
      }
    }
  }

  test("k=2 requires two active neighbors: a lone seed cannot spread") {
    // star around m: if only the hub is seeded, leaves see ONE active
    // neighbor and never fire at k=2. Use salt-free determinism by
    // checking the invariant instead: any node at round>0 has >= 2
    // neighbors with smaller round.
    val g = Seq(("m", "a"), ("m", "b"), ("a", "b"), ("b", "c"))
    val m = run(g, k = 2, permille = 500, rounds = 8)
    val adj = g.flatMap { case (x, y) => Seq(x -> y, y -> x) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    m.foreach { case (n, r) =>
      if (r > 0) {
        val earlier = adj(n).count(o => m(o) >= 0 && m(o) < r)
        assert(earlier >= 2, s"$n fired at $r with $earlier earlier nbrs")
      }
    }
  }

  test("unreached nodes report -1 and every node appears once") {
    val m = run(Seq(("a", "b"), ("x", "y")), k = 2, permille = 1,
      rounds = 3)
    assert(m.size == 4)
    // permille=1 seeds (almost surely) nobody on 4 nodes -> all -1;
    // whatever the sample picked, values are only -1 or 0..3
    assert(m.values.forall(v => v == -1L || (v >= 0L && v <= 3L)))
  }

  test("truncation: zero rounds allowed means seeds only") {
    val m = run(Seq(("a", "b"), ("b", "c"), ("a", "c")), k = 1,
      permille = 500, rounds = 1)
    assert(m.values.forall(v => v <= 1L))
  }
}
