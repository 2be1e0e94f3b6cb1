package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Community detection by synchronous label propagation (Raghavan et al.
  * 2007), made deterministic: every node simultaneously adopts the most
  * frequent label among its neighbors, ties broken by the MINIMUM label —
  * no RNG, no visit order. Run for a FIXED number of rounds: synchronous
  * LPA can oscillate on bipartite-ish structures, and a fixed round count
  * makes the result a well-defined partial fixpoint that an unrolled-CTE
  * oracle reproduces exactly (the same parity trick as KCore and the
  * fixed-point PageRank).
  *
  * Scale shape: each round is one join (edge × label) plus two
  * aggregations — pure shuffle algebra keyed by node, no per-task vertex
  * state, `localCheckpoint` every other round to stop plan nesting
  * (KCore's fixpoint hygiene). At 1000 executors the per-round cost is
  * the co-partitioned edge-label join; rounds are few (communities form
  * in O(log n) rounds in practice).
  */
object Communities {

  /** (node, community) after exactly `rounds` synchronous updates over
    * the undirected graph of `edges` (symmetrized, deduplicated,
    * self-loops dropped). Nodes keep their own id as initial label.
    */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 64, s"rounds must be in [1, 64], got $rounds")
    val spark = edges.sparkSession
    import spark.implicits._
    val half = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .where($"a".isNotNull && $"b".isNotNull && $"a" =!= $"b")
    // distinct AFTER symmetrizing collapses (u,v) and (v,u) duplicates of
    // the input into one undirected edge each way
    val sym = half.union(half.select($"b".as("a"), $"a".as("b")))
      .distinct()
      .localCheckpoint(true) // consumed once per round — cut, not re-derived
    var lab = sym.select($"a".as("node")).distinct()
      .select($"node", $"node".as("lab"))
      .localCheckpoint(true)
    for (i <- 1 to rounds) {
      val cnt = sym
        .join(lab.select($"node".as("b"), $"lab".as("nlab")), "b")
        .groupBy($"a", $"nlab").agg(count(lit(1)).as("c"))
      // most frequent neighbor label, min label on ties: one min-struct
      // aggregate — no window over the node table
      val next = cnt.groupBy($"a")
        .agg(min(struct((lit(0L) - $"c").as("nc"), $"nlab".as("lab"))).as("m"))
        .select($"a".as("node"), $"m.lab".as("lab"))
      lab = if (i % 2 == 0 || i == rounds) next.localCheckpoint(true) else next
    }
    lab.withColumnRenamed("lab", "community")
  }

  /** Convenience digest: per-community member count, for community-size
    * distributions. */
  def communitySizes(labeled: DataFrame): DataFrame =
    labeled.groupBy(col("community")).agg(count(lit(1)).as("n_members"))

  /** One synchronous Louvain-style move step: every node simultaneously
    * re-evaluates, against the CURRENT partition, which neighboring
    * community (or its own) maximizes the modularity gain of hosting it,
    * and adopts the argmax. The per-candidate score is the exact
    * integer-scaled gain term
    *
    *     score(v, c) = 4m·e_{v,c} − 2·d_v·(d_c − [c = c(v)]·d_v)
    *
    * (e_{v,c} = edges from v into c, d_c = community degree sum; the
    * d_v correction removes v's own contribution when judging its home
    * community) — comparing scores across candidates for fixed v is
    * exactly comparing Louvain's ΔQ, with no floating point anywhere.
    * Ties break to the smaller community label; argmax is a min-struct
    * aggregate, not a window. Synchronous + deterministic = the same
    * partition every run/engine, unlike classic sequential Louvain whose
    * result depends on visit order — the documented trade for
    * reproducibility (iterate the step to a fixpoint for refinement).
    *
    * Shape: degree/community-degree tables via partial-aggregated
    * shuffles, one adjacency⋈labels join for e_{v,c}, one argmax
    * aggregate. No driver state.
    *
    * Output: (node, community) — the post-move partition.
    */
  def modularityMoveStep(edges: DataFrame, srcCol: String, dstCol: String,
      labels: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(
        least(col(srcCol), col(dstCol)).as("x"),
        greatest(col(srcCol), col(dstCol)).as("y"))
      .where($"x".isNotNull && $"y".isNotNull && $"x" =!= $"y")
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val adj = e.select($"x".as("v"), $"y".as("n"))
      .union(e.select($"y".as("v"), $"x".as("n")))
    val lab = labels.select(col("node"), col("community"))
      .localCheckpoint(true)
    val m = e.count()
    val deg = adj.groupBy($"v").agg(count(lit(1)).as("d"))
    val dc = deg.join(lab, deg("v") === lab("node"))
      .groupBy($"community").agg(sum($"d").as("d_c"))
    // edges from v into each neighboring community
    val evc = adj.join(lab.select($"node".as("n"), $"community".as("c")), "n")
      .groupBy($"v", $"c").agg(count(lit(1)).as("e_vc"))
    // candidate set = neighbor communities ∪ own community (e_vc = 0 when
    // v has no neighbor at home)
    val own = lab.select($"node".as("v"), $"community".as("c"),
      lit(0L).as("e_vc"))
    val cand = evc.union(own)
      .groupBy($"v", $"c").agg(max($"e_vc").as("e_vc"))
    // degree and home-community ride ONE v-keyed join (they share the key)
    val vinfo = deg.join(lab, deg("v") === lab("node"))
      .select($"v", $"d", $"community".as("home"))
    val scored = cand
      .join(vinfo, "v")
      .join(dc.select($"community".as("c"), $"d_c"), "c")
      .withColumn("d_excl",
        $"d_c" - when($"c" === $"home", $"d").otherwise(lit(0L)))
      .withColumn("score",
        lit(4L) * m * $"e_vc" - lit(2L) * $"d" * $"d_excl")
    scored.groupBy($"v")
      .agg(min(struct((lit(0L) - $"score").as("ns"), $"c".as("c"))).as("b"))
      .select($"v".as("node"), $"b.c".as("community"))
  }

  /** Semi-supervised label SPREADING (Zhu & Ghahramani 2002 shape): a
    * small seed set carries known labels; every other node adopts, each
    * synchronous round, the most frequent label among its CURRENTLY
    * LABELED neighbors (ties to the smallest label — the [[labelPropagation]]
    * min-struct rule). Seeds are clamped: they never change, which is
    * what separates spreading from community LPA. Nodes not reached
    * within `rounds` hops of any seed stay unlabeled and are absent from
    * the output.
    *
    * Shape per round: one label-keyed join of the symmetric edge list
    * against the labeled set + one majority aggregate (min-struct, no
    * window) + the clamp union — pure shuffle algebra, label state
    * localCheckpointed every other round.
    *
    * `seeds`: (node, label) — must be unique per node. Output:
    * (node, label) for every labeled node after `rounds` rounds.
    */
  def labelSpreading(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 64, s"rounds must be in [1, 64], got $rounds")
    val spark = edges.sparkSession
    import spark.implicits._
    val half = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .where($"a".isNotNull && $"b".isNotNull && $"a" =!= $"b")
    val sym = half.union(half.select($"b".as("a"), $"a".as("b")))
      .distinct()
      .localCheckpoint(true)
    val seed = seeds.select(col("node"), col("label").as("lab"))
      .localCheckpoint(true)
    var lab = seed
    for (i <- 1 to rounds) {
      val cnt = sym
        .join(lab.select($"node".as("b"), $"lab".as("nlab")), "b")
        .groupBy($"a", $"nlab").agg(count(lit(1)).as("c"))
      val majority = cnt.groupBy($"a")
        .agg(min(struct((lit(0L) - $"c").as("nc"), $"nlab".as("lab"))).as("m"))
        .select($"a".as("node"), $"m.lab".as("lab"))
      val next = seed.union(
        majority.join(seed.select($"node"), Seq("node"), "left_anti"))
      lab = if (i % 2 == 0 || i == rounds) next.localCheckpoint(true) else next
    }
    lab.withColumnRenamed("lab", "label")
  }
}
