package graft

import graft.ops.{Butterflies, Decontaminate, GraphStats, Similarity, Trend}
import org.scalatest.funsuite.AnyFunSuite

class Wave6MiscSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val day = 86400000000L

  test("lag-1 autocorrelation of a perfectly alternating series is -1") {
    // daily counts 1,3,1,3,1 -> pairs (1,3),(3,1),(1,3),(3,1) -> r = -1
    val events = Seq(0, 1, 2, 3, 4).flatMap { d =>
      val n = if (d % 2 == 0) 1 else 3
      (0 until n).map(i => ("click", d * day + i))
    }
    val got = Trend.lagAutocorr(events.toDF("t", "ts_us"), "t", "ts_us")
      .select("grp", "n_pairs", "r").as[(String, Long, Double)]
      .collect().head
    assert(got._1 == "click" && got._2 == 4L)
    assert(math.abs(got._3 + 1.0) < 1e-12)
  }

  test("zero-variance count series yields NULL r, single-day group no row") {
    val flat = Seq(("flat", 0L), ("flat", day), ("flat", 2 * day))
    val lone = Seq(("lone", 0L))
    val got = Trend.lagAutocorr((flat ++ lone).toDF("t", "ts_us"),
        "t", "ts_us")
      .select($"grp", $"r".isNull).as[(String, Boolean)].collect().toMap
    assert(got == Map("flat" -> true)) // 1,1,1 -> zero variance; lone absent
  }

  test("embedding decontamination flags cosine hits against the eval set") {
    val vecs = Seq(
      (0L, Seq(1.0, 0.0)), (1L, Seq(1.0, 0.0)),
      (2L, Seq(0.0, 1.0)), (3L, Seq(-1.0, 0.0)))
      .toDF("vec_id", "embedding")
    val q = vecs.select($"vec_id", Similarity.quantize($"embedding").as("qv"))
    val eval = q.where($"vec_id" === 0L)
    val got = Decontaminate.embedOverlap(q, "vec_id", "qv",
        eval, "vec_id", "qv", threshold = 0.5)
      .select("id", "n_hits", "contaminated")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(!got.contains(0L)) // self pair excluded, no eval partner left
    assert(got(1L) == ((1L, 1L, 1L)))
    assert(got(2L) == ((2L, 0L, 0L)))
    assert(got(3L) == ((3L, 0L, 0L)))
  }

  test("excludeSelfId=false scores a vector against its own eval copy") {
    val vecs = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)))
      .toDF("vec_id", "embedding")
    val q = vecs.select($"vec_id", Similarity.quantize($"embedding").as("qv"))
    val got = Decontaminate.embedOverlap(q, "vec_id", "qv",
        q.where($"vec_id" === 0L), "vec_id", "qv",
        threshold = 0.5, excludeSelfId = false)
      .select("id", "contaminated").as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 1L, 1L -> 0L))
  }

  test("K(2,2) has exactly one butterfly; hub nodes are excluded") {
    val e = Seq(("a", "x"), ("b", "x"), ("a", "y"), ("b", "y"),
      // hub z with wedge degree 3 > cap 2 -> its wedges must not count
      ("a", "z"), ("b", "z"), ("c", "z"))
      .toDF("l", "r")
    val got = Butterflies.globalCount(e, "l", "r", maxWedgeDegree = 2)
      .as[(Long, Long, Long, Long)].collect().head
    // kept edges: the 4 K(2,2) edges; pair (a,b) with c=2 -> 1 butterfly
    assert(got == ((4L, 1L, 2L, 1L)))
  }

  test("reciprocity counts mutual directed edges exactly") {
    val e = Seq(("a", "b"), ("b", "a"), ("a", "c"), ("a", "c"))
      .toDF("src", "dst")
    val got = GraphStats.reciprocity(e, "src", "dst")
      .as[(Long, Long, Long)].collect().head
    assert(got == ((3L, 2L, 666L))) // dup a->c deduped; a<->b mutual
  }

  test("component density profiles each component independently") {
    // triangle {a,b,c} (density 1000) + path {x,y,z} (2 edges of 3 -> 666)
    val e = Seq(("a", "b"), ("b", "c"), ("a", "c"),
      ("x", "y"), ("y", "z")).toDF("src", "dst")
    val got = GraphStats.componentDensity(e, "src", "dst")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got == Map("a" -> ((3L, 3L, 1000L)), "x" -> ((3L, 2L, 666L))))
  }

  test("negative edges never collide with true edges, either orientation") {
    // NOTE: mult % n == 1 for small n, so partners are rank-successors —
    // pick edges that are NOT successor pairs under the alphabetical
    // ranking (a 4-cycle would make every partner a true edge and the
    // sample legitimately empty)
    val e = Seq(("a", "d"), ("b", "e"), ("c", "f")).toDF("src", "dst")
    val edgeSet = Set(("a", "d"), ("b", "e"), ("c", "f"))
    val got = graft.ops.LinkPrediction.negativeEdges(e, "src", "dst")
      .as[(String, String)].collect().toSet
    assert(got.nonEmpty)
    got.foreach { case (s, t) =>
      assert(s != t && !edgeSet.contains((s, t)) && !edgeSet.contains((t, s)))
    }
    // replayable: a second run yields the identical sample
    val again = graft.ops.LinkPrediction.negativeEdges(e, "src", "dst")
      .as[(String, String)].collect().toSet
    assert(again == got)
  }
}
