package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Generative invariants for the second round-8 continuation wave, on
  * seeded random inputs nobody hand-picked.
  */
class PropertiesWave12Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def randomGraph(seed: Int, n: Int, m: Int): Seq[(String, String)] = {
    val rnd = new scala.util.Random(seed)
    (1 to m).map(_ => (s"n${rnd.nextInt(n)}", s"n${rnd.nextInt(n)}"))
      .filter { case (a, b) => a != b }
  }

  test("densest peel: the flagged round maximizes density over the profile") {
    for (seed <- Seq(5, 19, 42)) {
      val rows = graft.ops.DensestSubgraph.peelProfile(
          randomGraph(seed, 16, 40).toDF("src", "dst"), "src", "dst")
        .collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getBoolean(4)))
      val best = rows.find(_._3).get
      rows.foreach { case (n, m, _) =>
        // exact cross-multiplied comparison: best m/n >= every m/n
        assert(best._2 * n >= m * best._1,
          s"seed $seed: flagged round is not maximal")
      }
      assert(rows.count(_._3) == 1)
    }
  }

  test("set cover: marginal gains never increase (submodularity)") {
    for (seed <- Seq(2, 11, 29)) {
      val rnd = new scala.util.Random(seed)
      val pairs = (1 to 120).map(_ =>
        (s"s${rnd.nextInt(9)}", s"e${rnd.nextInt(40)}"))
      val gains = graft.ops.SetCover.greedyMaxCoverage(
          pairs.toDF("s", "el"), "s", "el", k = 9)
        .collect().map(_.getLong(2))
      assert(gains.zip(gains.tail).forall { case (a, b) => b <= a },
        s"seed $seed: gains ${gains.mkString(",")} increased")
    }
  }

  test("budgeted cover: spend stays within budget, totals reconcile") {
    for (seed <- Seq(3, 13, 37)) {
      val rnd = new scala.util.Random(seed)
      val pairs = (1 to 100).map(_ =>
        (s"s${rnd.nextInt(8)}", s"e${rnd.nextInt(30)}"))
      val costs = (0 until 8).map(i => (s"s$i", 10L + rnd.nextInt(90)))
      val budget = 150L
      val rows = graft.ops.SetCover.greedyBudgetedCoverage(
          pairs.toDF("s", "el"), "s", "el", costs.toDF("s", "cost"),
          "s", "cost", budget)
        .collect()
        .map(r => (r.getLong(2), r.getLong(3), r.getLong(5), r.getLong(6)))
      rows.foreach { case (_, _, spent, _) => assert(spent <= budget) }
      assert(rows.map(_._2).sum == rows.lastOption.map(_._3).getOrElse(0L))
      assert(rows.map(_._1).sum == rows.lastOption.map(_._4).getOrElse(0L))
    }
  }

  test("stationary: total mass never exceeds the ppm grid and only bleeds") {
    for (seed <- Seq(7, 23)) {
      val rnd = new scala.util.Random(seed)
      val types = Array("a", "b", "c", "d", "e")
      val rows = Seq.tabulate(150) { i =>
        (s"u${i % 9}", i.toLong, types(rnd.nextInt(types.length)), i.toLong)
      }
      val pis = graft.ops.Transitions.stationaryDistribution(
          rows.toDF("user_id", "ts_us", "event_type", "event_id"),
          "user_id", "ts_us", "event_type", "event_id", rounds = 6)
        .collect().map(_.getLong(1))
      assert(pis.sum <= 1000000L, "floor arithmetic can only lose mass")
      assert(pis.forall(_ >= 0L))
    }
  }

  test("auc: flipping labels complements the doubled U statistic") {
    for (seed <- Seq(5, 17)) {
      val rnd = new scala.util.Random(seed)
      val rows = Seq.fill(60)(
        (rnd.nextInt(8).toLong, rnd.nextInt(2).toLong))
      def u2(rs: Seq[(Long, Long)]) = {
        val r = graft.ops.Auc.aucByGroup(
          rs.map { case (s, l) => ("g", s, l) }.toDF("grp", "score", "lab"),
          "grp", "score", "lab").collect()(0)
        (r.getLong(1), r.getLong(2), r.getLong(3))
      }
      val (p, n, u) = u2(rows)
      val (_, _, uFlip) = u2(rows.map { case (s, l) => (s, 1L - l) })
      assert(u + uFlip == 2L * p * n,
        s"seed $seed: U + U_flipped must cover all pairs exactly")
    }
  }

  test("corr: negating one column exactly negates the coefficient") {
    for (seed <- Seq(3, 31)) {
      val rnd = new scala.util.Random(seed)
      val rows = Seq.fill(80)(
        (rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
      def corrOf(rs: Seq[(Long, Long)]) =
        graft.ops.Correlation.pairwiseCorr(rs.toDF("a", "b"), Seq("a", "b"))
          .collect()(0).getDouble(8)
      val r1 = corrOf(rows)
      val r2 = corrOf(rows.map { case (a, b) => (a, -b) })
      // sums negate exactly, denominators are unchanged, so the doubles
      // are bit-identical up to sign
      assert(r1 == -r2)
    }
  }

  test("rrf: fusion is invariant to the order of the input rankings") {
    val rnd = new scala.util.Random(41)
    def ranking(seed: Int) = {
      val r = new scala.util.Random(seed)
      (1L to 3L).flatMap(q => r.shuffle((10 to 25).toList).take(8)
        .zipWithIndex.map { case (d, i) => (q, d.toLong, i + 1) })
        .toDF("query_id", "neighbor_id", "rank")
    }
    val a = ranking(rnd.nextInt()); val b = ranking(rnd.nextInt())
    val f1 = graft.ops.RankFusion.reciprocalRankFusion(Seq(a, b), topK = 6)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).toSeq
    val f2 = graft.ops.RankFusion.reciprocalRankFusion(Seq(b, a), topK = 6)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(f1 == f2)
  }

  test("conductance: cuts double-count every cross edge, volumes fill 2m") {
    for (seed <- Seq(9, 27)) {
      val g = randomGraph(seed, 15, 35)
      val labels = (0 until 15).map(i => (s"n$i", s"c${i % 3}"))
      val rows = graft.ops.GraphStats.conductance(g.toDF("src", "dst"),
          "src", "dst", labels.toDF("node", "community"))
        .collect().map(r => (r.getLong(2), r.getLong(3)))
      val und = g.map { case (a, b) => if (a < b) (a, b) else (b, a) }
        .distinct
      val lab = labels.toMap
      val cross = und.count { case (a, b) => lab(a) != lab(b) }
      assert(rows.map(_._2).sum == 2L * cross)
      assert(rows.map(_._1).sum == 2L * und.size)
    }
  }

  test("centralization: star scores 1000, cycle scores 0") {
    def cz(edges: Seq[(String, String)]) =
      graft.ops.GraphStats.degreeCentralization(edges.toDF("src", "dst"),
        "src", "dst").collect()(0)
    val star = (1 to 6).map(i => ("hub", s"leaf$i"))
    assert(cz(star).getLong(4) == 1000L)
    val cycle = (0 until 6).map(i => (s"c$i", s"c${(i + 1) % 6}"))
    assert(cz(cycle).getLong(4) == 0L)
    // degenerate 2-node graph: normalizer undefined -> NULL
    assert(cz(Seq(("a", "b"))).isNullAt(4))
  }

  test("salted join equals the plain join on skewed random data") {
    val rnd = new scala.util.Random(67)
    val left = Seq.fill(500)((if (rnd.nextInt(10) < 8) "hot"
      else s"k${rnd.nextInt(5)}", rnd.nextInt(100)))
      .toDF("k", "v")
    val right = Seq("hot" -> 1, "k0" -> 2, "k1" -> 3, "k9" -> 4)
      .toDF("k", "w")
    val salted = graft.ops.SkewJoin.saltedJoin(left, right, "k", salts = 8)
      .groupBy("k").agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
        max(col("w")).as("w"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getInt(3))).toSet
    val plain = left.join(right, Seq("k"))
      .groupBy("k").agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
        max(col("w")).as("w"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getInt(3))).toSet
    assert(salted == plain)
  }

  test("cliques4: every emitted quadruple is fully pairwise adjacent") {
    for (seed <- Seq(15, 33)) {
      val g = randomGraph(seed, 12, 45)
      val es = g.map { case (a, b) => if (a < b) (a, b) else (b, a) }.toSet
      val cl = graft.ops.Cliques4.cliqueList(g.toDF("src", "dst"),
          "src", "dst")
        .collect().map(r => Seq(r.getString(0), r.getString(1),
          r.getString(2), r.getString(3)))
      cl.foreach { q =>
        assert(q == q.sorted && q.distinct.size == 4)
        for (i <- 0 until 4; j <- (i + 1) until 4)
          assert(es.contains((q(i), q(j))),
            s"seed $seed: ${q.mkString(",")} missing edge ${q(i)}-${q(j)}")
      }
    }
  }
}
