package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guards: the expensive properties we hand-audited
  * with .explain (single scan, shared exchange, no cartesian product)
  * asserted against the ACTUAL physical plan, so a refactor that silently
  * doubles a scan or forks a window exchange fails CI instead of only
  * showing up as a bench regression rounds later.
  */
class PlanGuardSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def physical(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  private def scans(p: String): Int =
    "Scan parquet".r.findAllIn(p).size

  /** LIVE scan count (scans not behind a cache) for plans with persisted
    * subtrees: InMemoryTableScan string rendering re-prints the cached
    * child, inflating the string count — walk the TREE and count real
    * file scans only. AQE-aware: a plain `plan.collect` sees only the
    * AdaptiveSparkPlanExec leaf (graft.tools.PlanWalk).
    */
  private def treeScans(name: String): Int =
    graft.tools.PlanWalk.liveFileScans(
      SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan).size

  private def treeWindows(name: String) =
    graft.tools.PlanWalk.windows(
      SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan)
  private def shuffles(p: String): Int =
    "(?<!Broadcast)Exchange (hash|range|Single)".r.findAllIn(p).size

  test("q_feature_hash vectorizes from one documents scan, no joins") {
    val p = physical("q_feature_hash")
    assert(scans(p) == 1)
    assert(!p.contains("Join"), s"hashing trick needs no vocabulary join:\n$p")
  }

  // Persisted queries: the cached subtree is NOT a child of the
  // consuming plan, so a correct guard is "no more than one LIVE file
  // scan, and the cache is actually in play" — every consumer reads
  // InMemoryTableScan instead of re-deriving the subtree.
  test("q_source_overlap scans documents once (persisted shingle index)") {
    assert(treeScans("q_source_overlap") <= 1)
    assert(physical("q_source_overlap").contains("InMemoryTableScan"))
  }

  test("q_chi2_tokens scans documents once (persisted pruned base)") {
    assert(treeScans("q_chi2_tokens") <= 1)
    assert(physical("q_chi2_tokens").contains("InMemoryTableScan"))
  }

  test("q_rich_club derives the co-order graph once (persisted)") {
    val p = physical("q_rich_club")
    assert(treeScans("q_rich_club") <= 1)
    assert(p.contains("InMemoryTableScan"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q_temporal_triangles joins with equi keys, never cartesian") {
    val p = physical("q_temporal_triangles")
    assert(!p.contains("CartesianProduct"))
    assert(treeScans("q_temporal_triangles") <= 1)
    assert(p.contains("InMemoryTableScan"),
      "persisted temporal edge list feeds all three join legs")
  }

  test("q_kappa is one aggregate over one scan") {
    val p = physical("q_kappa")
    assert(scans(p) == 1)
    assert(!p.contains("Join"))
  }

  test("q_skipgrams reads documents exactly once (lead-array explode)") {
    assert(scans(physical("q_skipgrams")) == 1)
  }

  test("q_cdf computes every probe from one scan") {
    assert(scans(physical("q_cdf")) == 1)
  }

  test("q_unpivot melts from one scan") {
    assert(scans(physical("q_unpivot")) == 1)
  }

  test("q_cube expands the grouping lattice from one scan") {
    assert(scans(physical("q_cube")) == 1)
  }

  test("q_scd2 shares one data exchange across both windows (+ output sort)") {
    val p = physical("q_scd2")
    assert(scans(p) == 1)
    assert(shuffles(p) <= 2, s"expected <= 2 shuffles, plan:\n$p")
  }

  test("q_tpch_q3 has no cartesian product and scans each table once") {
    val p = physical("q_tpch_q3")
    assert(!p.contains("CartesianProduct"))
    assert(scans(p) == 3)
  }

  test("q_dq_rules audits every per-row rule from one lineitem pass") {
    // one scan for the rule sums + one each side of the orphan anti-join
    val p = physical("q_dq_rules")
    assert(scans(p) == 3)
    assert(!p.contains("CartesianProduct"))
  }

  test("q_tpch_q6 pushes every predicate to the scan") {
    val p = physical("q_tpch_q6")
    assert(scans(p) == 1)
    assert(p.contains("PushedFilters") &&
      p.contains("l_shipdate") && p.contains("l_quantity"),
      s"predicates must reach the parquet scan, plan:\n${p.take(2000)}")
  }

  test("q_outliers consumes the source through shared caches, scanned once") {
    // ranked and devs are persisted: every top-level consumer reads an
    // InMemoryTableScan, so the events parquet is materialized exactly
    // once (string-counting scans would see the cached subtree re-printed
    // under each reuse — count FileSourceScanExec nodes in the TREE,
    // where cached innards don't appear)
    val plan = SparkEntry.queries("q_outliers")(spark, sf)
      .queryExecution.executedPlan
    val treeScans = plan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.size
    assert(treeScans == 0, s"expected all source reads behind the shared " +
      s"caches, found $treeScans direct scans")
    assert(plan.toString.contains("InMemoryRelation"))
    assert(!plan.toString.contains("CartesianProduct"))
  }

  test("q_window_range evaluates both frame aggregates in one Window node") {
    val p = physical("q_window_range")
    assert(scans(p) == 1)
    assert("Window ".r.findAllIn(p).size == 1,
      s"both RANGE aggregates must share one Window, plan:\n${p.take(2000)}")
  }

  test("q_rank_normalize and q_rfm rank without any Window operator") {
    // VERDICT r7 items 4-5: per-group/global ranks ride the range-partition
    // + zipWithIndex machinery (Ranks.globalRowNumber), so no WindowExec —
    // in particular no single-giant-partition window over a low-cardinality
    // group key — may appear anywhere in either physical tree
    for (q <- Seq("q_rank_normalize", "q_rfm")) {
      val windows = treeWindows(q)
      assert(windows.isEmpty,
        s"$q must not plan a Window, found: ${windows.map(_.nodeName)}")
    }
  }

  test("q_length_batches buckets without any Window; q_coreness without sort windows") {
    // both new ops claim windowless plans: length batching rides the
    // Ranks range-exchange machinery, coreness computes per-node h-index
    // from zip_with over a degree-bounded collect_list
    for (q <- Seq("q_length_batches", "q_coreness")) {
      assert(treeWindows(q).isEmpty, s"$q must not plan a Window")
    }
  }

  test("q_k_anonymity is one partial-aggregated exchange, no join") {
    val p = physical("q_k_anonymity")
    assert(scans(p) == 1)
    assert(shuffles(p) <= 2, s"expected scan + one agg exchange (+ sort), plan:\n$p")
    assert(p.contains("partial_count") || p.contains("HashAggregate"),
      "map-side combine must precede the exchange")
  }

  test("q_kmv_jaccard's pairwise stage joins sketch rows, not token rows") {
    val p = physical("q_kmv_jaccard")
    // token scan feeds the sketch agg twice (a/b sides of the self-join);
    // the non-equi pair join must be a BNL over SKETCH rows (one row per
    // source), never a cartesian of token rows
    assert(!p.contains("CartesianProduct"))
  }

  test("q_corr reduces all pairs from ONE lineitem scan, no join, no window") {
    val p = physical("q_corr")
    assert(scans(p) == 1, s"one scan must feed every sufficient sum:\n$p")
    assert(!p.contains("Join"), "pairwise sums must not self-join the scan")
    assert(!p.contains("Window"), "no window anywhere in a global aggregate")
  }

  test("q_auc and q_decision_stump window only over AGGREGATED tables") {
    for (name <- Seq("q_auc", "q_decision_stump")) {
      val plan = SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan
      graft.tools.PlanWalk.flatten(plan).foreach {
        case w: org.apache.spark.sql.execution.window.WindowExec =>
          // the cumulative window must consume a hash aggregate (the
          // (group, value)-keyed count), never raw scan rows
          val hasAgg = graft.tools.PlanWalk.flatten(w.child).exists(
            _.isInstanceOf[
              org.apache.spark.sql.execution.aggregate.HashAggregateExec])
          assert(hasAgg,
            s"$name: window over raw rows, expected pre-aggregated input:\n$w")
        case _ => ()
      }
    }
  }

  test("q_rrf_fusion ranks through k-slot aggregates, no Window operator") {
    val p = physical("q_rrf_fusion")
    assert(!p.contains("WindowExec") && !p.contains("RunningWindowFunction"),
      s"fusion must rank via TopKByAgg, not window sorts:\n$p")
  }

  test("q_conductance aggregates labeled edges without cartesian products") {
    val p = physical("q_conductance")
    assert(!p.contains("CartesianProduct"))
  }

  test("q_zorder_prune answers every probe from ONE scan, no join") {
    val p = physical("q_zorder_prune")
    assert(scans(p) == 1,
      s"bucket stats and all probe matches must share one scan:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "probe fan-out is an explode over the aggregated bucket table")
  }

  test("audit queries avoid cartesian products (broadcast fan-out only)") {
    for (name <- Seq("q_cms_error", "q_kmv_error", "q_minhash_error",
        "q_skew_join")) {
      assert(!physical(name).contains("CartesianProduct"),
        s"$name must not cartesian-join")
    }
  }

  test("q_stationary and q_centralization run without any Window operator") {
    for (name <- Seq("q_stationary", "q_centralization"))
      assert(!physical(name).contains("WindowExec"),
        s"$name must be pure aggregate algebra")
  }

  test("fourth-wave queries avoid cartesian products") {
    for (name <- Seq("q_dbscan_grid", "q_record_linkage", "q_phash_dedup",
        "q_homophily", "q_triad_census", "q_t_closeness", "q_benford",
        "q_robustness")) {
      assert(!physical(name).contains("CartesianProduct"),
        s"$name must not cartesian-join")
    }
  }

  test("q_knn_shapley broadcasts the sampled test side") {
    val p = physical("q_knn_shapley")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"the test sample must broadcast, never shuffle the train side:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q_bm25 broadcasts query terms and never windows or cartesians") {
    val p = physical("q_bm25")
    assert(!p.contains("CartesianProduct"))
    assert(treeWindows("q_bm25").isEmpty,
      "top-k per query must ride the k-slot aggregate, not a window sort")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"query terms/df/corpus must broadcast:\n${p.take(1500)}")
  }

  test("q_label_noise_class broadcasts the probe side, windowless") {
    val p = physical("q_label_noise_class")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "the sampled probe set must broadcast, never shuffle the reference side")
    assert(treeWindows("q_label_noise_class").isEmpty)
  }

  test("q_benford and q_burstiness are single-scan aggregates") {
    assert(scans(physical("q_benford")) == 1)
    assert(scans(physical("q_burstiness")) == 1)
    assert(!physical("q_burstiness").contains("WindowExec"),
      "fano factor is two stacked aggregates, no windows")
  }
}
