package graft

import graft.functions.{TokenFingerprintImpl, functions => gfn}
import graft.ops.{Betweenness, ConnectedComponents, ShortestPaths, TextStats}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-checks of the scale-path variants against the exact baselines,
  * plus the native Catalyst expression/aggregate.
  */
class ScalePathsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def randomEdges(n: Int, nodes: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)((s"n${rnd.nextInt(nodes)}", s"n${rnd.nextInt(nodes)}"))
      .filter { case (a, b) => a != b }
      .toDF("src", "dst")
  }

  test("union-find aggregate CC matches GraphX CC") {
    val edges = randomEdges(400, 150, 7)
    val viaAgg = ConnectedComponents.componentsViaAggregate(edges)
      .as[(String, String)].collect().toSet
    val viaGraphX = ConnectedComponents.componentsGraphX(edges)
      .as[(String, String)].collect().toSet
    assert(viaAgg == viaGraphX)
    assert(viaAgg.nonEmpty)
  }

  test("components() strategy gate: all three strategy tiers agree") {
    val edges = randomEdges(300, 80, 11)
    val local = ConnectedComponents.components(edges) // driver-local union-find
      .as[(String, String)].collect().toSet
    val agg = ConnectedComponents.components(edges, maxLocalEdges = 0) // UnionFindAgg
      .as[(String, String)].collect().toSet
    val graphx = ConnectedComponents.components(edges, maxAggVertices = 0,
        maxLocalEdges = 0) // GraphX path
      .as[(String, String)].collect().toSet
    assert(local == agg)
    assert(agg == graphx)
    assert(local.nonEmpty)
  }

  test("fixed-point PageRank: local and distributed paths are bit-identical") {
    val edges = randomEdges(500, 60, 17)
    val local = graft.ops.PageRank.scoresFixedPoint(edges)
      .as[(String, Long)].collect().toMap
    val dist = graft.ops.PageRank.scoresFixedPoint(edges, maxLocalEdges = 0)
      .as[(String, Long)].collect().toMap
    assert(local == dist) // integer arithmetic: exact equality, no tolerance
    assert(local.nonEmpty)
    // ranks are positive and sum below scale (sinks leak mass, parity with
    // the double-precision recurrence)
    assert(local.values.forall(_ > 0))
    assert(local.values.sum <= 1000000000000L)
  }

  test("personalized PageRank: local and distributed paths are bit-identical") {
    val edges = randomEdges(500, 60, 23)
    val srcs = Seq("n1", "n2", "n5")
    val local = graft.ops.PageRank.pprFixedPoint(edges, srcs)
      .as[(String, Long)].collect().toMap
    val dist = graft.ops.PageRank.pprFixedPoint(edges, srcs, maxLocalEdges = 0)
      .as[(String, Long)].collect().toMap
    assert(local == dist)
    assert(local.nonEmpty)
    // teleport mass lands only on sources: every positive score is
    // walk-reachable from the source set
    val reached = local.filter(_._2 > 0).keySet
    assert(srcs.toSet.subsetOf(reached))
    assert(local.values.sum <= 1000000000000L)
  }

  test("distributed PageRank tol-mode runs ONE job per iteration (L1 folded in)") {
    val edges = randomEdges(400, 50, 29)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    def countJobs(tol: Double): Int = {
      spark.sparkContext.addSparkListener(listener)
      try {
        jobs.set(0)
        // tol tiny → never converges early → same 4 iterations as tol=0
        graft.ops.PageRank.scores(edges, maxIter = 4, tol = tol,
          maxLocalEdges = 0).count()
        // listener events are async; brief settle before reading the count
        Thread.sleep(1500)
        jobs.get()
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    val fixed = countJobs(tol = 0) // no convergence check at all
    val tolMode = countJobs(tol = 1e-300)
    // the folded L1 must cost ZERO extra scheduled jobs vs fixed-iteration
    // mode — the old separate agg action added one per iteration
    assert(tolMode == fixed, s"fixed-iter jobs=$fixed, tol-mode jobs=$tolMode")
  }

  test("PageRank tol-mode scores unchanged by the folded L1 (vs fixed-iter run)") {
    val edges = randomEdges(400, 50, 31)
    // tol so large it converges after iteration 1 → equals a 1-iteration run
    val tolRun = graft.ops.PageRank.scores(edges, maxIter = 50, tol = 1e9,
      maxLocalEdges = 0).as[(String, Double)].collect().toMap
    val oneIter = graft.ops.PageRank.scores(edges, maxIter = 1, tol = 0,
      maxLocalEdges = 0).as[(String, Double)].collect().toMap
    assert(tolRun == oneIter)
  }

  test("PageRank local fast path matches distributed loop") {
    val edges = randomEdges(500, 60, 13)
    val local = graft.ops.PageRank.scores(edges)
      .as[(String, Double)].collect().toMap
    val dist = graft.ops.PageRank.scores(edges, maxLocalEdges = 0)
      .as[(String, Double)].collect().toMap
    assert(local.keySet == dist.keySet)
    local.foreach { case (k, v) =>
      assert(math.abs(v - dist(k)) < 1e-12, s"node $k: local=$v dist=${dist(k)}")
    }
  }

  test("Pregel multi-source SSSP matches broadcast Dijkstra") {
    val edges = Seq(
      ("A", "B", 1.0), ("A", "C", 2.0), ("B", "C", 1.0), ("C", "D", 1.5),
      ("D", "E", 0.7), ("B", "E", 9.9))
      .toDF("src", "dst", "weight")
    val exact = ShortestPaths.allPairs(edges, directed = true)
      .as[(String, String, Double)].collect()
      .filter(r => Set("A", "C").contains(r._1)).toSet
    val pregel = ShortestPaths.fromSourcesPregel(edges, Seq("A", "C"), directed = true)
      .as[(String, String, Double)].collect().toSet
    assert(pregel == exact)
    assert(pregel.nonEmpty)
  }

  test("Pregel SSSP undirected matches Dijkstra distances") {
    val edges = Seq(("A", "B", 1.0), ("B", "C", 2.5), ("C", "D", 0.5))
      .toDF("src", "dst", "weight")
    val pregel = ShortestPaths.fromSourcesPregel(edges, Seq("D"), directed = false)
      .as[(String, String, Double)].collect()
      .map { case (f, t, d) => (t, d) }.toMap
    assert(pregel == Map("A" -> 4.0, "B" -> 3.0, "C" -> 0.5))
  }

  test("pairwise-quantized betweenness agrees with exact Brandes") {
    val edges = Seq(
      ("A", "B"), ("B", "C"), ("C", "D"), ("D", "E"), ("B", "D"), ("E", "F"))
      .toDF("src", "dst")
    val exact = Betweenness.betweennessCentrality(edges, "src", "dst",
        normalized = false, directed = false)
      .as[(String, Double)].collect().toMap
    val quant = Betweenness.betweennessPairwiseQuantized(edges, "src", "dst")
      .as[(String, Long)].collect().toMap
    assert(quant.keySet == exact.keySet)
    quant.foreach { case (node, qbc) =>
      // qbc sums ordered pairs (2× unordered) on a 1e9 grid with per-triple
      // floors: within #triples ulps of 2e9 × exact
      val approx = qbc.toDouble / 2e9
      assert(math.abs(approx - exact(node)) < 1e-6,
        s"$node: quantized $approx vs exact ${exact(node)}")
    }
  }

  test("sampled betweenness with full sample equals exact betweenness") {
    val edges = randomEdges(120, 40, 11)
    val exact = Betweenness.betweennessCentrality(edges, "src", "dst")
      .as[(String, Double)].collect().toMap
    val sampled = Betweenness.betweennessCentralitySampled(edges, "src", "dst",
        sampleSize = 10000)
      .as[(String, Double)].collect().toMap
    assert(exact.keySet == sampled.keySet)
    exact.foreach { case (k, v) => assert(math.abs(sampled(k) - v) < 1e-9) }
  }

  test("sampled betweenness approximates exact (rank of top node)") {
    val edges = randomEdges(400, 80, 13)
    val exact = Betweenness.betweennessCentrality(edges, "src", "dst")
      .as[(String, Double)].collect().toMap
    val approx = Betweenness.betweennessCentralitySampled(edges, "src", "dst",
        sampleSize = 40, seed = 5)
      .as[(String, Double)].collect().toMap
    val topExact = exact.maxBy(_._2)._1
    // the true top node should land in the approximate top 5
    val approxTop5 = approx.toSeq.sortBy(-_._2).take(5).map(_._1).toSet
    assert(approxTop5.contains(topExact))
  }

  test("bpe-ish token count and char-ngram lang id behave sensibly") {
    val df = Seq(
      (1L, "hello world 123 foo-bar"), // runs: hello, world, 123, foo, bar = 5
      (2L, "the weather there is soothing")) // en char-ngrams dominate
      .toDF("id", "text")
    val counts = df.select(TextStats.bpeishTokenCount("text")).as[Int].collect()
    assert(counts(0) == 5)
    val lang = df.where($"id" === 2)
      .select(TextStats.langIdCharNgram("text")).as[String].first()
    assert(lang == "en")
  }

  test("native token_fingerprint expression matches the column-algebra formula") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(200)
    val both = docs.select(
        TextStats.fingerprint("text").as("expr_fp"),
        gfn.token_fingerprint(col("text")).as("native_fp"))
      .as[(Long, Long)].collect()
    assert(both.nonEmpty)
    both.foreach { case (e, n) => assert(e == n) }
  }

  test("GraftExtensions applies cleanly and functions resolve in a new session") {
    // a second live session with its own extensions can't be built in a
    // shared-test JVM (builder reuses the active context), so assert the
    // two halves separately: the extensions object injects without error,
    // and the same builder registered via registerAll resolves in SQL
    val holder = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions()(holder)
    val s2 = spark.newSession()
    graft.functions.functions.registerAll(s2)
    import s2.implicits._
    val got = s2.sql("SELECT token_fingerprint('a b c')").as[Long].first()
    assert(got == TokenFingerprintImpl.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("a b c"), 1000000007L))
  }

  test("native token_fingerprint registered for SQL") {
    gfn.registerAll(spark)
    val got = spark.sql("SELECT token_fingerprint('the quick brown fox')").as[Long].first()
    val direct = TokenFingerprintImpl.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("the quick brown fox"),
      1000000007L)
    assert(got == direct)
  }
}
