package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Generative invariants for the round-8 continuation operators, on
  * seeded random inputs nobody hand-picked.
  */
class PropertiesWave11Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def randomGraph(seed: Int, n: Int, m: Int): Seq[(String, String)] = {
    val rnd = new scala.util.Random(seed)
    (1 to m).map(_ => (s"n${rnd.nextInt(n)}", s"n${rnd.nextInt(n)}"))
      .filter { case (a, b) => a != b }
  }

  test("bridges: removing a reported bridge splits its component") {
    for (seed <- Seq(3, 7, 21)) {
      val g = randomGraph(seed, 14, 18) ++ Seq(("n0", "tail$seed"))
      val edges = g.toDF("src", "dst")
      val bridges = graft.ops.Bridges.bridges(edges, "src", "dst")
        .collect().map(r => (r.getString(0), r.getString(1)))
      val ccAll = graft.ops.ConnectedComponents.components(
        edges.select(col("src"), col("dst"))).collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      bridges.foreach { case (x, y) =>
        val remaining = g.filter { case (a, b) =>
          Set(a, b) != Set(x, y)
        }
        val cc2 = graft.ops.ConnectedComponents.components(
          remaining.toDF("src", "dst")).collect()
          .map(r => r.getString(0) -> r.getString(1)).toMap
        // endpoints were connected before, must not be after
        assert(ccAll(x) == ccAll(y))
        assert(cc2.get(x) != cc2.get(y) || cc2.get(x).isEmpty,
          s"($x,$y) reported as bridge but removal keeps them connected")
      }
    }
  }

  test("coloring: proper on random graphs, chromatic bound respected") {
    for (seed <- Seq(11, 23)) {
      val g = randomGraph(seed, 12, 30)
      if (g.nonEmpty) {
        val m = graft.ops.Coloring.greedyColoring(g.toDF("src", "dst"),
            "src", "dst", rounds = 20)
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        assert(m.values.forall(_ >= 0L), "20 rounds must converge on n=12")
        g.foreach { case (a, b) => assert(m(a) != m(b)) }
        val maxDeg = g.flatMap { case (a, b) => Seq(a, b) }
          .groupBy(identity).map { case (n, xs) =>
            g.count { case (x, y) =>
              (x == n || y == n) && x != y
            }
          }.max
        assert(m.values.max <= maxDeg.toLong)
      }
    }
  }

  test("WL: color classes refine degree classes, never coarsen") {
    for (seed <- Seq(5, 19)) {
      val g = randomGraph(seed, 15, 25)
      if (g.nonEmpty) {
        val df = g.toDF("src", "dst")
        val wl1 = graft.ops.WlRefinement.wlColors(df, "src", "dst", 1)
          .collect().map(r => r.getString(0) -> r.getString(1)).toMap
        val wl3 = graft.ops.WlRefinement.wlColors(df, "src", "dst", 3)
          .collect().map(r => r.getString(0) -> r.getString(1)).toMap
        // same wl3 color => same wl1 color (refinement is monotone)
        wl3.groupBy(_._2).values.foreach { nodes =>
          assert(nodes.map(n => wl1(n._1)).toSet.size == 1)
        }
      }
    }
  }

  test("cascade: rounds are causally consistent and seeds match the hash") {
    for (seed <- Seq(2, 13)) {
      val g = randomGraph(seed, 16, 30)
      if (g.nonEmpty) {
        val m = graft.ops.Cascade.thresholdCascade(g.toDF("src", "dst"),
            "src", "dst", k = 2, seedPermille = 300, rounds = 8)
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val adj = g.flatMap { case (x, y) => Seq(x -> y, y -> x) }
          .distinct.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
        m.foreach { case (n, r) =>
          if (r > 0L) {
            assert(adj(n).count(o => m(o) >= 0L && m(o) < r) >= 2,
              s"$n activated at $r without two earlier-active neighbors")
          }
        }
      }
    }
  }

  test("chi2: ppm is bounded by [0, 1e6] and symmetric in label flip") {
    val rnd = new scala.util.Random(29)
    val docs = (1 to 120).map { _ =>
      ((1 to 6).map(_ => s"w${rnd.nextInt(9)}"), rnd.nextBoolean())
    }
    val a = graft.ops.ChiSquare.tokenLabel(docs.toDF("toks", "label"),
      "toks", "label").collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    val b = graft.ops.ChiSquare.tokenLabel(
      docs.map { case (t, l) => (t, !l) }.toDF("toks", "label"),
      "toks", "label").collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(a.values.forall(v => v >= 0L && v <= 1000000L))
    assert(a == b, "chi-square is invariant under flipping the label")
  }

  test("kappa: bounded by [-1000, 1000], equals 1000 iff identical raters") {
    val rnd = new scala.util.Random(31)
    for (bias <- Seq(0.2, 0.5, 0.8)) {
      val rows = (1 to 200).map { _ =>
        (rnd.nextDouble() < bias, rnd.nextDouble() < bias)
      }
      val r = graft.ops.Agreement.cohensKappa(rows.toDF("a", "b"), "a", "b")
        .collect()(0)
      val k = r.getAs[Long]("kappa_permille")
      assert(k >= -1000L && k <= 1000L)
      if (k == 1000L) assert(rows.forall(p => p._1 == p._2))
    }
  }

  test("AMS: lane parity — each lane sum has the parity of the row count") {
    val rnd = new scala.util.Random(41)
    val keys = (1 to 150).map(_ => s"k${rnd.nextInt(40)}")
    val out = graft.ops.AmsSketch.f2Lanes(keys.toDF("k"), "k", 12).collect()
    out.foreach { r =>
      val z = r.getAs[Long]("lane_sum")
      assert(math.abs(z) <= keys.length)
      assert(((z % 2) + 2) % 2 == keys.length % 2,
        "sum of ±1 over n items shares n's parity")
    }
  }

  test("simpson: dominance raises the index; ppm stays in [0, 1e6]") {
    val rnd = new scala.util.Random(43)
    val even = (1 to 100).map(i => ("g", s"s${i % 10}"))
    val skew = (1 to 100).map(i => ("g", if (i <= 82) "s0" else s"s${i % 6}"))
    def ppm(rows: Seq[(String, String)]) =
      graft.ops.Diversity.simpsonIndex(rows.toDF("grp", "cat"),
        "grp", "cat").collect()(0).getAs[Long]("simpson_ppm")
    val (pe, ps) = (ppm(even), ppm(skew))
    assert(pe >= 0L && ps <= 1000000L)
    assert(ps > pe, s"skewed ($ps) must exceed even ($pe)")
  }
}
