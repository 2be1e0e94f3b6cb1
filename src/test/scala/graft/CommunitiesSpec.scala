package graft

import graft.ops.Communities
import org.scalatest.funsuite.AnyFunSuite

class CommunitiesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Pure single-node reference of the same deterministic LPA: synchronous
    * update, most frequent neighbor label, min label on ties. */
  private def lpaRef(edges: Seq[(String, String)], rounds: Int): Map[String, String] = {
    val sym = (edges ++ edges.map(_.swap)).filter(e => e._1 != e._2).distinct
    val adj = sym.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var lab = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      lab = adj.map { case (n, ns) =>
        val counts = ns.groupBy(lab).map { case (l, xs) => (l, xs.size) }
        n -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    lab
  }

  private def lpaSpark(edges: Seq[(String, String)], rounds: Int): Map[String, String] =
    Communities.labelPropagation(edges.toDF("src", "dst"), "src", "dst", rounds)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap

  private val clique1 = for (a <- Seq("a", "b", "c", "d"); b <- Seq("a", "b", "c", "d") if a < b) yield (a, b)
  private val clique2 = for (a <- Seq("e", "f", "g", "h"); b <- Seq("e", "f", "g", "h") if a < b) yield (a, b)
  private val bridged = clique1 ++ clique2 ++ Seq(("d", "e"))

  test("two cliques with a bridge resolve to two communities") {
    val out = lpaSpark(bridged, rounds = 4)
    assert(out == lpaRef(bridged, rounds = 4))
    val groups = out.groupBy(_._2).values.map(_.keys.toSet).toSet
    assert(groups == Set(Set("a", "b", "c", "d"), Set("e", "f", "g", "h")))
  }

  test("spark ≡ reference round by round (partial fixpoints too)") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("e", "f"),
      ("x", "y"), ("y", "z"), ("z", "x"), ("b", "a"), ("a", "a"))
    for (r <- 1 to 4)
      assert(lpaSpark(edges, r) == lpaRef(edges, r), s"rounds=$r")
  }

  test("local fast path ≡ distributed loop (gate forced off)") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("e", "f"),
      ("x", "y"), ("y", "z"), ("z", "x"), ("b", "a"), ("a", "a")) ++ bridged
    for (r <- 1 to 4) {
      val local = lpaSpark(edges, r) // default gate: local replay
      val dist = Communities.labelPropagation(edges.toDF("src", "dst"),
          "src", "dst", r, maxLocalEdges = 0L)
        .collect().map(x => (x.getString(0), x.getString(1))).toMap
      assert(local == dist, s"rounds=$r")
    }
  }

  test("weighted LPA: a heavy edge outvotes many light ones; parity; 1s ≡ unweighted") {
    // v: one weight-10 edge into the {a,b} clique vs two weight-1 edges
    // into the {x,y} clique — weighted majority goes heavy
    val e = Seq(("a", "b", 10L), ("a", "v", 10L), ("v", "x", 1L),
      ("v", "y", 1L), ("x", "y", 10L)).toDF("src", "dst", "w")
    val got = Communities.labelPropagationWeighted(e, "src", "dst", "w", 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    val dist = Communities.labelPropagationWeighted(e, "src", "dst", "w", 2,
        maxLocalEdges = 0L)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(got == dist)
    // round 1: v's weighted votes are a:10 vs x:1 + y:1 → a's label
    val r1 = Communities.labelPropagationWeighted(e, "src", "dst", "w", 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(r1("v") == "a")
    // all-1 weights degenerate to the unweighted operator, round by round
    val e1 = e.withColumn("w", org.apache.spark.sql.functions.lit(1L))
    for (r <- 1 to 3) {
      val w1 = Communities.labelPropagationWeighted(e1, "src", "dst", "w", r)
        .collect().map(x => (x.getString(0), x.getString(1))).toMap
      val u1 = Communities.labelPropagation(e1, "src", "dst", r)
        .collect().map(x => (x.getString(0), x.getString(1))).toMap
      assert(w1 == u1, s"rounds=$r")
    }
  }

  test("labelSpreading: local replay ≡ distributed loop, off-graph seed kept") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("e", "f"),
      ("x", "y"), ("y", "z"), ("z", "x"))
    val seeds = Seq(("a", "L1"), ("z", "L2"), ("ghost", "L3"))
    for (r <- 1 to 4) {
      val local = Communities.labelSpreading(edges.toDF("src", "dst"),
          "src", "dst", seeds.toDF("node", "label"), r)
        .collect().map(x => (x.getString(0), x.getString(1))).toMap
      val dist = Communities.labelSpreading(edges.toDF("src", "dst"),
          "src", "dst", seeds.toDF("node", "label"), r, maxLocalEdges = 0L)
        .collect().map(x => (x.getString(0), x.getString(1))).toMap
      assert(local == dist, s"rounds=$r")
      assert(local("ghost") == "L3", s"rounds=$r off-graph seed must survive")
    }
  }

  test("result is partition-invariant") {
    val df = bridged.toDF("src", "dst").repartition(13)
    val out = Communities.labelPropagation(df, "src", "dst", rounds = 4)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(out == lpaRef(bridged, rounds = 4))
  }

  /** Exact integer-scaled modularity Q·4m² of a partition over a
    * canonical undirected edge list — the guard statistic louvainHier
    * compares, recomputed independently here. */
  private def qNum(edges: Seq[(String, String)],
      lab: Map[String, String]): Long = {
    val canon = edges.map { case (a, b) => if (a < b) (a, b) else (b, a) }
      .filter(e => e._1 != e._2).distinct
    val m = canon.size.toLong
    val intra = canon.count { case (a, b) => lab(a) == lab(b) }.toLong
    val deg = (canon.map(_._1) ++ canon.map(_._2))
      .groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }
    val dC = deg.toSeq.groupBy { case (v, _) => lab(v) }
      .map { case (_, xs) => xs.map(_._2).sum }
    4L * m * intra - dC.map(d => d * d).sum
  }

  private def labMap(df: org.apache.spark.sql.DataFrame): Map[String, String] =
    df.collect().map(r => (r.getString(0), r.getString(1))).toMap

  test("louvainHier: modularity never decreases across the contraction") {
    val rnd = new scala.util.Random(919)
    for (seed <- 0 until 6) {
      val n = 8 + rnd.nextInt(8)
      val edges = (0 until (2 * n)).map { _ =>
        (s"n${rnd.nextInt(n)}", s"n${rnd.nextInt(n)}")
      }.filter(e => e._1 != e._2).distinct
      if (edges.nonEmpty) {
        val df = edges.toDF("src", "dst")
        val p0 = labMap(Communities.lpaLouvain(df, "src", "dst",
          lpaRounds = 2, moveRounds = 1))
        val p1 = labMap(Communities.louvainHier(df, "src", "dst",
          lpaRounds = 2, moveRounds = 1))
        assert(p1.keySet == p0.keySet, s"seed run $seed")
        assert(qNum(edges, p1) >= qNum(edges, p0),
          s"seed run $seed: contraction must not lower Q (guard)")
      }
    }
  }

  test("louvainHier merges the two halves of a bridged clique pair") {
    // two 4-cliques joined by one bridge: level 0 (short LPA + 1 move)
    // can leave them split; the contracted level sees a 2-supernode
    // graph and the guard accepts the merge only if Q improves —
    // either way the result is a valid partition of all 8 nodes with
    // Q >= level 0's
    val p1 = labMap(Communities.louvainHier(bridged.toDF("src", "dst"),
      "src", "dst", lpaRounds = 1, moveRounds = 1))
    val p0 = labMap(Communities.lpaLouvain(bridged.toDF("src", "dst"),
      "src", "dst", lpaRounds = 1, moveRounds = 1))
    assert(p1.keySet == p0.keySet)
    assert(qNum(bridged, p1) >= qNum(bridged, p0))
    // communities are whole at level 1: every community's members map to
    // exactly one level-1 label (projection is per-community)
    val byP0 = p0.keys.groupBy(p0)
    byP0.foreach { case (_, members) =>
      assert(members.map(p1).toSet.size == 1,
        "projection must move whole level-0 communities")
    }
  }

  test("louvainHier levels chain: Q(levels=2) >= Q(levels=1) >= Q(base)") {
    val rnd = new scala.util.Random(313)
    for (seed <- 0 until 3) {
      val n = 10 + rnd.nextInt(6)
      val edges = (0 until (3 * n)).map { _ =>
        (s"n${rnd.nextInt(n)}", s"n${rnd.nextInt(n)}")
      }.filter(e => e._1 != e._2).distinct
      if (edges.nonEmpty) {
        val df = edges.toDF("src", "dst")
        val p0 = labMap(Communities.lpaLouvain(df, "src", "dst", 2, 1))
        val l1 = labMap(Communities.louvainHier(df, "src", "dst", 2, 1))
        val l2 = labMap(Communities.louvainHier(df, "src", "dst", 2, 1,
          levels = 2))
        assert(qNum(edges, l1) >= qNum(edges, p0), s"seed run $seed")
        assert(qNum(edges, l2) >= qNum(edges, l1), s"seed run $seed")
      }
    }
  }

  test("louvainHier: gated local replay ≡ distributed path (gate off)") {
    val df = bridged.toDF("src", "dst")
    val gated = labMap(Communities.louvainHier(df, "src", "dst",
      lpaRounds = 2, moveRounds = 2))
    val dist = labMap(Communities.louvainHier(df, "src", "dst",
      lpaRounds = 2, moveRounds = 2, maxLocalEdges = 0L))
    assert(gated == dist)
  }

  test("louvainHier: whole-pipeline local replay ≡ distributed, random graphs + levels=2") {
    // the r10 local path replays contraction + weighted moves + guarded
    // acceptance driver-side; every stage must match the distributed
    // forms node-for-node, including multi-level chaining
    val rnd = new scala.util.Random(4242)
    for (seed <- 0 until 4) {
      val n = 12 + rnd.nextInt(10)
      val edges = (0 until (3 * n)).map { _ =>
        (s"v${rnd.nextInt(n)}", s"v${rnd.nextInt(n)}")
      }.filter(e => e._1 != e._2).distinct
      if (edges.nonEmpty) {
        val df = edges.toDF("src", "dst")
        for (levels <- Seq(1, 2)) {
          val gated = labMap(Communities.louvainHier(df, "src", "dst",
            lpaRounds = 3, moveRounds = 2, hierMoveRounds = 2,
            levels = levels))
          val dist = labMap(Communities.louvainHier(df, "src", "dst",
            lpaRounds = 3, moveRounds = 2, hierMoveRounds = 2,
            levels = levels, maxLocalEdges = 0L))
          assert(gated == dist, s"seed=$seed levels=$levels")
        }
      }
    }
  }
}
