package graft

import graft.ops.{Communities, GraphStats, KCore, LinkPrediction, Triangles}
import org.scalatest.funsuite.AnyFunSuite

/** Randomized parity properties for the round-8 gated driver-local
  * replays: on seeded pseudo-random graphs, every local fast path must
  * equal its distributed form with the gate forced to 0 — the fixtures in
  * the per-op specs pin known tie-break cases; these sweep shapes nobody
  * hand-picked (self-loops, duplicate and reversed edges, isolated-ish
  * fringes, skewed degrees via preferential attachment).
  */
class PropertiesWave9Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Seeded messy random graph: preferential-attachment-ish skew plus
    * uniform noise, duplicates, reversals, and self-loops included. */
  private def randomEdges(seed: Int, n: Int, m: Int): Seq[(String, String)] = {
    val rnd = new scala.util.Random(seed)
    (1 to m).map { _ =>
      val a = rnd.nextInt(n)
      // skew: half the endpoints re-draw from the low-id "celebrities"
      val b = if (rnd.nextBoolean()) rnd.nextInt(1 + n / 4) else rnd.nextInt(n)
      (s"v$a", s"v$b")
    } ++ Seq((s"v0", s"v0")) // explicit self-loop
  }

  test("random graphs: every local replay ≡ its distributed form") {
    for (seed <- Seq(7, 19, 83)) {
      val edges = randomEdges(seed, n = 40, m = 120).toDF("src", "dst")

      val lpaL = Communities.labelPropagation(edges, "src", "dst", rounds = 3)
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      val lpaD = Communities.labelPropagation(edges, "src", "dst", rounds = 3,
          maxLocalEdges = 0L)
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(lpaL == lpaD, s"LPA seed=$seed")

      val lbl = Communities.labelPropagation(edges, "src", "dst", rounds = 2)
      val mvL = Communities.modularityMoveStep(edges, "src", "dst", lbl)
        .as[(String, String)].collect().toSet
      val mvD = Communities.modularityMoveStep(edges, "src", "dst", lbl,
          maxLocalEdges = 0L)
        .as[(String, String)].collect().toSet
      assert(mvL == mvD, s"moveStep seed=$seed")

      val kcL = KCore.kCore(edges, "src", "dst", k = 2, iters = 3)
        .as[(String, Long)].collect().toSet
      val kcD = KCore.kCore(edges, "src", "dst", k = 2, iters = 3,
          maxLocalEdges = 0L)
        .as[(String, Long)].collect().toSet
      assert(kcL == kcD, s"kcore seed=$seed")

      val triL = Triangles.triangleList(edges, "src", "dst")
        .as[(String, String, String)].collect().toSet
      val triD = Triangles.triangleList(edges, "src", "dst",
          maxLocalEdges = 0L)
        .as[(String, String, String)].collect().toSet
      assert(triL == triD, s"triangles seed=$seed")

      val raL = LinkPrediction.resourceAllocation(edges, "src", "dst",
          maxCenterDegree = 8, minCommon = 2)
        .as[(String, String, Long, Long)].collect().toSet
      val raD = LinkPrediction.resourceAllocation(edges, "src", "dst",
          maxCenterDegree = 8, minCommon = 2, maxLocalEdges = 0L)
        .as[(String, String, Long, Long)].collect().toSet
      assert(raL == raD, s"RA seed=$seed")

      val asL = GraphStats.degreeAssortativity(edges, "src", "dst")
        .as[(Long, Long, Long, Long, Option[Double])].collect().head
      val asD = GraphStats.degreeAssortativity(edges, "src", "dst",
          maxLocalEdges = 0L)
        .as[(Long, Long, Long, Long, Option[Double])].collect().head
      assert(asL == asD, s"assortativity seed=$seed")
    }
  }
}
