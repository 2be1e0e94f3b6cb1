package graft

import graft.ops.{AssociationRules, Betweenness, ConnectedComponents, Dedup, KMeansEmbed, Multimodal, PageRank, Sessionize, ShortestPaths, Similarity, TextStats, Tokenizer}
import graft.queries.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryHelpers._

/** Driver-contract registry — relational surface: TPC-H shapes, windows, joins, sampling, privacy tables.
  * One slice of [[SparkEntry.queries]]/[[SparkEntry.oracleSql]]; entries
  * moved verbatim in the r10 split (no semantic change, guarded by the
  * duplicate-key check in SparkEntry).
  */
private[graft] object RelationalQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> { (s, d) =>
      // TPC-H Q1-style pricing summary. Double sums are made
      // order-insensitive (hence oracle-hashable) by per-row cast to
      // DECIMAL(18,2) before the exact decimal sum, then cast back.
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
          // computed product: floor to integer cents (exact in double, no
          // rounding-mode divergence between engines), exact integer sum,
          // one final double division
          (sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * lit(100.0)))
            .cast("double") / lit(100.0)).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    "q_rollup" -> { (s, d) =>
      // grouping-sets coverage: rollup subtotals with sentinel labels
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity").cast("long")).as("sum_qty"),
          count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("sum_qty"), col("n"))
        .orderBy("flag", "status")
    },
    "q_window_running" -> { (s, d) =>
      // analytic window frame coverage: per-supplier running quantity
      import org.apache.spark.sql.expressions.Window
      // l_quantity tiebreak: (shipdate, orderkey, linenumber) is NOT
      // unique at sf0.1; rows still tied after quantity are full
      // duplicates, whose order cannot change any prefix sum
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.lineitem(s, d)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          sum(col("l_quantity").cast("long")).over(w).as("running_qty"))
        // (orderkey, linenumber) is NOT unique in the synthetic data;
        // running_qty is strictly increasing within a supplier partition,
        // so it makes the output order total
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber", "running_qty")
    },
    "q_setops" -> { (s, d) =>
      // set-operation coverage: parts shipped under both return flags,
      // minus low-price ones
      val li = Tables.lineitem(s, d)
      val a = li.where(col("l_returnflag") === "A").select(col("l_partkey"))
      val r = li.where(col("l_returnflag") === "R").select(col("l_partkey"))
      val cheap = li.where(col("l_extendedprice") < 1000.0).select(col("l_partkey"))
      a.intersect(r).except(cheap).orderBy("l_partkey")
    },
    "q_k_anonymity" -> { (s, d) =>
      // k-anonymity audit over (nation, segment) quasi-identifiers
      // (ops/KAnonymity): one partial-aggregated groupBy, class sizes +
      // at-risk flags — the pre-release privacy hygiene check
      graft.ops.KAnonymity.classSizes(Tables.customer(s, d),
          Seq("c_nationkey", "c_mktsegment"), k = 10L)
        .orderBy("c_nationkey", "c_mktsegment")
    },
    "q_window_distinct" -> { (s, d) =>
      // unique users per rolling hour (30-min hop): HLL registers INSIDE
      // the sliding-window aggregation — the canonical streaming metric,
      // one pass, sketch state per window instead of a distinct shuffle
      // of every (window, user) pair at 100 TB. Register math is
      // md5-integer → hash-exact oracle (estimates spec-tested in HllSpec).
      val win = Sessionize.sliding(Tables.events(s, d), "ts_us",
          windowUs = 3600000000L, slideUs = 1800000000L)
        .withColumn("h", graft.functions.functions.hex_to_long(
          substring(md5(col("user_id").cast("string")), 1, 15)))
      win.groupBy(col("window_start_us"))
        .agg(graft.functions.Hll.hll_registers(col("h"), p = 6).as("regs"))
        .select(col("window_start_us"),
          posexplode(col("regs")).as(Seq("reg_idx", "reg_val")))
        .orderBy("window_start_us", "reg_idx")
    },
    "q_pack" -> { (s, d) =>
      // contiguous sequence packing into ~512-token bins, per 8-way
      // doc-id shard (packing is windowed per shard — the global-pack
      // would serialize; per-shard is the 100 TB layout anyway)
      val chunks = graft.ops.Chunker.chunkByTokens(Tables.documents(s, d),
          "doc_id", "text", chunkTokens = 64, overlapTokens = 16)
        .withColumn("shard", pmod(col("doc_id"), lit(8)).cast("int"))
      graft.ops.Chunker.packContiguous(chunks, "n_chunk_tokens",
          capacity = 512, keyCols = Seq("shard"),
          orderCols = Seq("doc_id", "chunk_idx"))
        .groupBy(col("shard"), col("bin"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(col("n_chunk_tokens")).as("tot_tokens"))
        .orderBy("shard", "bin")
    },
    "q_quantiles_sketch" -> { (s, d) =>
      // FULL STATE of the mergeable bottom-k rank sketch per order
      // priority, exploded to rows — the q_hll_distinct register-compare
      // pattern: the oracle recomputes the k smallest (md5-lane, value)
      // pairs and every cell must match
      val vals = Tables.orders(s, d)
        .where(col("o_totalprice").isNotNull)
        .select(col("o_orderpriority"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
      graft.ops.Quantiles.sketch(vals, "cents", k = 64, keyCols = Seq("o_orderpriority"))
        .select(col("o_orderpriority"), posexplode(col("__s")))
        .select(col("o_orderpriority"), (col("pos") + 1).cast("int").as("rk"),
          col("col.h").as("h"), col("col.v").as("v"))
        .orderBy("o_orderpriority", "rk")
    },
    "q_quantiles_sample" -> { (s, d) =>
      // user-facing quantiles derived from the same sketch — the
      // self-tuning replacement for histogramQuantiles' bucketWidth knob
      val vals = Tables.orders(s, d)
        .where(col("o_totalprice").isNotNull)
        .select(col("o_orderpriority"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
      graft.ops.Quantiles.sampleQuantiles(vals, "cents", k = 64,
          qsPerMille = Seq(500, 900, 990), keyCols = Seq("o_orderpriority"))
        .orderBy("o_orderpriority", "q_permille")
    },
    "q_quantiles" -> { (s, d) =>
      // one-pass histogram quantiles per order priority (ops/Quantiles):
      // integer per-mille rank thresholds → hash-exact across engines,
      // no global sort anywhere in the plan
      graft.ops.Quantiles.histogramQuantiles(
          Tables.orders(s, d).select(col("o_orderpriority"), col("o_totalprice")),
          "o_totalprice", bucketWidth = 1000.0,
          qsPerMille = Seq(500, 900, 990), keyCols = Seq("o_orderpriority"))
        .orderBy("o_orderpriority", "q_permille")
    },
    "q_sample" -> { (s, d) =>
      // deterministic md5 train/test split: partitioning-independent,
      // engine-portable row-identity sampling (ops/Sampling), aggregated
      // per lang to keep the check compact while covering every kept row
      graft.ops.Sampling.hashSample(Tables.documents(s, d), "doc_id",
          ratePerMille = 200)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("sum_ids"))
        .orderBy("lang")
    },
    "q_weighted_sample" -> { (s, d) =>
      // importance sampling ∝ n_chars with integer-exact acceptance and
      // Horvitz-Thompson inclusion probabilities (ops/Sampling)
      graft.ops.Sampling.weightedSample(Tables.documents(s, d), "doc_id",
          "n_chars", ratePerMillion = 1000, salt = "ws1")
        .select(col("doc_id"), col("n_chars"), col("p_ppm"))
        .orderBy("doc_id")
    },
    "q_profile" -> { (s, d) =>
      // one-pass column profiling (ops/Profiler): nulls, min/max, HLL
      // distinct sketch for four orders columns from a single wide
      // aggregation. The register dot-product digest is integer math →
      // hash-exact oracle; the float HLL estimate is dropped here and
      // accuracy-tested in ProfilerSpec instead
      graft.ops.Profiler.profile(Tables.orders(s, d),
          Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"))
        .withColumnRenamed("column", "col_name")
        .drop("distinct_est")
        .orderBy("col_name")
    },
    "q_zorder" -> { (s, d) =>
      // Morton-curve stats over (orderkey, partkey): the z-value column
      // algebra that ops/ZOrderLayout.layout clusters files by. Bucketed
      // by the top 8 z-bits → each bucket is a rectangle in key space;
      // min/max inside prove the interleave (see ZOrderLayoutSpec for the
      // actual file-pruning property)
      import graft.ops.ZOrderLayout
      Tables.lineitem(s, d)
        .select(ZOrderLayout.zValue2(
          col("l_orderkey") % 65536, col("l_partkey") % 65536).as("z"))
        .groupBy(shiftright(col("z"), 24).as("z_bucket"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("z")).as("z_min"), max(col("z")).as("z_max"))
        .orderBy("z_bucket")
    },
    "q_anonymize" -> { (s, d) =>
      // privacy pass with referential integrity: custkeys pseudonymized
      // INDEPENDENTLY on each table (md5 keyed surrogate, no mapping
      // table), names digit-masked; the per-customer order counts must
      // still line up through the surrogate join
      import graft.ops.Anonymize
      val cust = Tables.customer(s, d).select(
        Anonymize.pseudonym(col("c_custkey"), "s4lt").as("cust_pid"),
        Anonymize.maskNumbers(col("c_name")).as("masked_name"),
        col("c_mktsegment"))
      val ords = Tables.orders(s, d).select(
        Anonymize.pseudonym(col("o_custkey"), "s4lt").as("cust_pid"),
        lit(1).as("__o"))
      cust.join(ords, Seq("cust_pid"), "left")
        .groupBy(col("cust_pid"), col("masked_name"), col("c_mktsegment"))
        .agg(count(col("__o")).as("n_orders"))
        .orderBy("cust_pid")
    },
    "q_bloom_join" -> { (s, d) =>
      // Bloom-pruned semi join (ops/BloomPrune.scala): lineitems of
      // top-priced orders. The Bloom probe filters the lineitem SCAN
      // before any exchange; the exact semi join then removes false
      // positives, so the result is oracle-identical to a plain IN join
      val pricey = Tables.orders(s, d).where(col("o_totalprice") > 450000.0)
      graft.ops.BloomPrune.semiJoin(
          Tables.lineitem(s, d), "l_orderkey", pricey, "o_orderkey")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
        .orderBy("l_returnflag")
    },
    "q_range_join" -> { (s, d) =>
      // banded range join (ops/RangeJoin.scala): orders priced into 100
      // overlapping price bands via a band-id equi-join + residual — the
      // shape that survives when both sides are too big to broadcast (the
      // naive BETWEEN plan is a nested-loop/cartesian product)
      val bands = s.range(0, 100).select(
        col("id").cast("int").as("band_id"),
        (col("id") * 5000).cast("double").as("lo"),
        (col("id") * 5000 + 9999).cast("double").as("hi"))
      val points = Tables.orders(s, d).select(col("o_orderkey"), col("o_totalprice"))
      graft.ops.RangeJoin.pointInInterval(points, "o_totalprice",
          bands, "lo", "hi", bandWidth = 5000.0)
        .groupBy("band_id")
        .agg(count(lit(1)).as("n_orders"),
          (sum(floor(col("o_totalprice") * lit(100.0))).cast("double") / lit(100.0))
            .as("sum_price"))
        .orderBy("band_id")
    },
    "q_pivot" -> { (s, d) =>
      // relational pivot: events per day x event type as a wide table
      // (explicit value list keeps the schema static and oracle-mirrorable)
      Tables.events(s, d)
        .withColumn("day", expr("ts_us div 86400000000"))
        .groupBy("day")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .count().na.fill(0L)
        .orderBy("day")
    },
    "q_rank_normalize" -> { (s, d) =>
      // rank-based feature scaling (Normalize.rankPermille): per-flag
      // integer per-mille percent rank of the price — distribution-free,
      // tie-deterministic (rank() merges equal values)
      graft.ops.Normalize.rankPermille(
          Tables.lineitem(s, d).select(col("l_orderkey"), col("l_linenumber"),
            col("l_returnflag"), col("l_extendedprice")),
          "l_extendedprice", Seq("l_returnflag"))
        // (orderkey, linenumber) is NOT unique in the synthetic lineitem
        // (~12k duplicate pairs at sf0.01) — sort by the value columns too
        // so the dump order is total wherever rows differ
        .orderBy("l_orderkey", "l_linenumber", "l_returnflag",
          "l_extendedprice")
    },
    "q_cube" -> { (s, d) =>
      // full grouping-sets lattice (cube, completing q_rollup's subtotal
      // chain): all four grouping combos with the grouping_id bitmask
      // exposed — one pass, Spark expands to a partial-aggregated Expand,
      // no per-combo rescan
      Tables.lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity").cast("long")).as("sum_qty"),
          count(lit(1)).as("n"), grouping_id().cast("long").as("gid"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("gid"), col("sum_qty"), col("n"))
        .orderBy("flag", "status", "gid")
    },
    "q_unpivot" -> { (s, d) =>
      // wide→long reshape (Dataset.unpivot — the melt dual of q_pivot):
      // per-flag integer measure sums (cents / basis points, exact in
      // double before floor) melted to (flag, measure, value) rows
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag").as("flag"))
        .agg(
          sum(floor(col("l_quantity") * lit(100.0)).cast("long")).as("qty_c"),
          sum(floor(col("l_extendedprice") * lit(100.0)).cast("long")).as("price_c"),
          sum(floor(col("l_discount") * lit(10000.0)).cast("long")).as("disc_bp"),
          sum(floor(col("l_tax") * lit(10000.0)).cast("long")).as("tax_bp"))
        .unpivot(Array(col("flag")),
          Array(col("qty_c"), col("price_c"), col("disc_bp"), col("tax_bp")),
          "measure", "value")
        .orderBy("flag", "measure")
    },
    "q_tpch_q3" -> { (s, d) =>
      // TPC-H Q3 (shipping priority): the classic fact⋈fact⋈dim star with
      // filters PUSHED INTO ALL THREE SCANS before the joins. No forced
      // broadcast: customer is a fact-sized table at 100 TB, so the plan
      // must stay a shuffle join there and let AQE downgrade to broadcast
      // when the filtered side is actually small (it is at bench SF).
      // Revenue: integer-cents sum (order-insensitive), one final divide.
      val cut = to_timestamp(lit("1998-03-15"))
      val cust = Tables.customer(s, d)
        .where(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val ord = Tables.orders(s, d).where(col("o_orderdate") < cut)
        .select(col("o_orderkey"), col("o_custkey"),
          expr("unix_micros(cast(o_orderdate as timestamp))").as("o_orderdate_us"),
          col("o_orderpriority"))
      Tables.lineitem(s, d).where(col("l_shipdate") > cut)
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate_us"), col("o_orderpriority"))
        .agg((sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * lit(100.0))).cast("double") / lit(100.0)).as("revenue"))
        // (revenue, l_orderkey) is a total order → the top-10 cut is
        // deterministic; Spark runs it as a TakeOrdered, no global sort
        .orderBy(col("revenue").desc, col("l_orderkey")).limit(10)
    },
    "q_tpch_q5" -> { (s, d) =>
      // TPC-H Q5 (local-supplier revenue): five-way join where the
      // customer⋈supplier nation-equality rides the existing l_suppkey
      // join (no extra shuffle), and nation⋈region — genuinely tiny at
      // ANY scale — is the one explicitly broadcast dim
      val nr = Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .where(col("r_name") === "ASIA")
        .select(col("n_nationkey"), col("n_name"))
      val ord = Tables.orders(s, d)
        .where(col("o_orderdate") >= to_timestamp(lit("1997-01-01")) &&
          col("o_orderdate") < to_timestamp(lit("1998-01-01")))
        .select("o_orderkey", "o_custkey")
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"),
          col("l_extendedprice"), col("l_discount"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d).select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(s, d).select("s_suppkey", "s_nationkey"),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nr), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg((sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * lit(100.0))).cast("double") / lit(100.0)).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
    "q_dq_rules" -> { (s, d) =>
      // declarative data-quality audit (ops/Validation): six per-row rules
      // in ONE scan (conditional sums, unpivoted) + one anti-join
      // referential check; the pipeline-gate primitive
      val li = Tables.lineitem(s, d)
      graft.ops.Validation.ruleViolations(li, Seq(
          "discount_out_of_range" ->
            (col("l_discount") < 0.0 || col("l_discount") > 0.3),
          "discount_over_8pct" -> (col("l_discount") > 0.08),
          "tax_negative" -> (col("l_tax") < 0.0),
          "quantity_nonpositive" -> (col("l_quantity") <= 0.0),
          "quantity_over_40" -> (col("l_quantity") > 40.0),
          "returnflag_invalid" -> !col("l_returnflag").isin("A", "N", "R")))
        .unionByName(graft.ops.Validation.orphanCount("orderkey_orphan",
          li, "l_orderkey", Tables.orders(s, d), "o_orderkey"))
        .orderBy("rule")
    },
    "q_grouped_topk" -> { (s, d) =>
      // top-3 revenue parts per supplier nation via the k-slot top-k
      // aggregate (functions/TopKByAgg) — partial top-k merges map-side
      // like any hash agg; no per-group full window sort at any scale
      val rev = Tables.lineitem(s, d)
        .join(Tables.supplier(s, d).select("s_suppkey", "s_nationkey"),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_nationkey"), col("l_partkey"))
        .agg(sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * lit(100.0))).cast("double").as("cents"))
      rev.groupBy(col("s_nationkey"))
        .agg(graft.functions.TopKByAgg.top_k_by_str(col("cents"),
          concat(lit("P"), col("l_partkey")), 3).as("arr"))
        .select(col("s_nationkey").cast("long").as("nationkey"),
          posexplode(col("arr")).as(Seq("rk0", "e")))
        .select(col("nationkey"), (col("rk0") + 1).cast("long").as("rk"),
          col("e.payload").as("part"),
          (col("e.score") / lit(100.0)).as("revenue"))
        .orderBy("nationkey", "rk")
    },
    "q_tpch_q8" -> { (s, d) =>
      // TPC-H Q8 (national market share): nation appears in TWO roles
      // (customer's region filter vs supplier's share bucket) — the share
      // is a ratio of two exact integer-cents sums, so the double divide
      // is portable. Dims broadcast; facts stay shuffle joins.
      val nr = Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .where(col("r_name") === "ASIA").select(col("n_nationkey"))
      val supNation = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)
            .select(col("n_nationkey").as("sn_key"), col("n_name"))),
          col("s_nationkey") === col("sn_key"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val ord = Tables.orders(s, d)
        .where(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
          col("o_orderdate") < to_timestamp(lit("1998-01-01")))
        .select(col("o_orderkey"), col("o_custkey"),
          year(col("o_orderdate")).cast("long").as("o_year"))
      val cust = Tables.customer(s, d).select("c_custkey", "c_nationkey")
        .join(broadcast(nr), col("c_nationkey") === col("n_nationkey"))
        .select("c_custkey")
      val econParts = Tables.part(s, d)
        .where(col("p_type") === "ECONOMY").select("p_partkey")
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * lit(100.0)).cast("long").as("vol_c"))
        .join(econParts, col("l_partkey") === col("p_partkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(supNation, col("l_suppkey") === col("s_suppkey"))
        .groupBy("o_year")
        .agg((sum(when(col("supp_nation") === "NATION_7", col("vol_c"))
            .otherwise(0L)).cast("double") /
          sum(col("vol_c")).cast("double")).as("mkt_share"))
        .orderBy("o_year")
    },
    "q_tpch_q10" -> { (s, d) =>
      // TPC-H Q10 (returned-item reporting): top-20 customers by revenue
      // lost to returns in one quarter — filters into every scan, revenue
      // in exact cents, deterministic top-20 via the (revenue, custkey)
      // total order (TakeOrdered, no global sort)
      val ord = Tables.orders(s, d)
        .where(col("o_orderdate") >= to_timestamp(lit("1997-10-01")) &&
          col("o_orderdate") < to_timestamp(lit("1998-01-01")))
        .select("o_orderkey", "o_custkey")
      val li = Tables.lineitem(s, d).where(col("l_returnflag") === "R")
        .select(col("l_orderkey"),
          floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * lit(100.0)).cast("long").as("rev_c"))
      val custN = Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)
            .select(col("n_nationkey"), col("n_name"))),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("c_mktsegment"), col("n_name"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(custN, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("c_mktsegment"), col("n_name"))
        .agg((sum(col("rev_c")).cast("double") / lit(100.0)).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey")).limit(20)
    },
    "q_winsorize" -> { (s, d) =>
      // per-flag winsorization audit (Normalize.winsorizeStats): exact
      // P05/P95 order-statistic cuts over integer cents + what clipping
      // would do — one group-keyed sort window, one conditional aggregate
      graft.ops.Normalize.winsorizeStats(
          Tables.lineitem(s, d).select(col("l_returnflag").as("flag"),
            floor(col("l_extendedprice") * lit(100.0)).cast("long").as("v_c")),
          "v_c", Seq("flag"))
        .orderBy("flag")
    },
    "q_tpch_q6" -> { (s, d) =>
      // TPC-H Q6 (forecasting revenue change) — the pushdown showcase:
      // every predicate reaches the parquet scan, one partial-aggregated
      // global sum, revenue in exact integer ten-thousandths
      Tables.lineitem(s, d)
        .where(col("l_shipdate") >= to_timestamp(lit("1997-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1998-01-01")) &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(count(lit(1)).as("n_items"),
          sum(floor(col("l_extendedprice") * col("l_discount") * lit(10000.0))
            .cast("long")).as("revenue_e4"))
    },
    "q_tpch_q4" -> { (s, d) =>
      // TPC-H Q4 shape (order-priority checking) adapted to this schema
      // (no commit/receipt dates): an order counts when ANY lineitem
      // shipped > 90 days after the order date — EXISTS becomes a
      // left-semi join with an equi key plus residual range predicate
      val ord = Tables.orders(s, d)
        .where(col("o_orderdate") >= to_timestamp(lit("1997-07-01")) &&
          col("o_orderdate") < to_timestamp(lit("1997-10-01")))
      val li = Tables.lineitem(s, d).select("l_orderkey", "l_shipdate")
      ord.join(li,
          ord("o_orderkey") === li("l_orderkey") &&
            li("l_shipdate") > ord("o_orderdate") + expr("INTERVAL 90 DAY"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },
    "q_tpch_q12" -> { (s, d) =>
      // TPC-H Q12 shape (shipping-mode priority split) adapted to this
      // schema (no l_shipmode → l_returnflag is the mode stand-in):
      // late lineitems (shipped > 60 days after order) per flag, split
      // into high- vs low-priority order counts via conditional sums
      val ord = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_shipdate"), col("l_returnflag"))
      li.join(ord,
          li("l_orderkey") === ord("o_orderkey") &&
            li("l_shipdate") > ord("o_orderdate") + expr("INTERVAL 60 DAY"))
        .groupBy("l_returnflag")
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
            .otherwise(1L)).as("low_line_count"))
        .orderBy("l_returnflag")
    },
    "q_tpch_q18" -> { (s, d) =>
      // TPC-H Q18 (large-volume customers): the IN-subquery over a HAVING
      // aggregate becomes an aggregate + join; top-100 via the
      // deterministic (totalprice desc, orderkey) total order
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_quantity").cast("long").as("qty"))
      val big = li.groupBy("l_orderkey").agg(sum(col("qty")).as("sum_qty"))
        .where(col("sum_qty") > 300L)
      val ord = Tables.orders(s, d)
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderdate"), col("sum_qty"))
      ord.join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_totalprice"), col("o_orderdate"), col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },
    "q_tpch_q22" -> { (s, d) =>
      // TPC-H Q22 shape (global-sales opportunity) adapted: customers
      // with above-average positive balance and NO orders since 1998 —
      // the scalar-average subquery is exact integer cents compared by
      // cross-multiplication (bal_c·n_pos > sum_c_pos, no double mean),
      // NOT EXISTS is a left-anti join on the filtered order scan
      val cust = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"),
          floor(col("c_acctbal") * lit(100.0)).cast("long").as("bal_c"))
      val avgStats = cust.where(col("bal_c") > 0L)
        .agg(count(lit(1)).as("n_pos"), sum(col("bal_c")).as("sum_c"))
      val recent = Tables.orders(s, d)
        .where(col("o_orderdate") >= to_timestamp(lit("1998-01-01")))
        .select(col("o_custkey"))
      cust.crossJoin(broadcast(avgStats))
        .where(col("bal_c") * col("n_pos") > col("sum_c"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_name"))),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("numcust"), sum(col("bal_c")).as("totbal_c"))
        .orderBy("n_name")
    },
    "q_tpch_q2" -> { (s, d) =>
      // TPC-H Q2 shape (minimum-cost supplier) adapted: this schema has
      // no partsupp, so the part-supplier catalog is derived from
      // lineitem — supply cost per (part, supplier) is the minimum
      // observed unit price in exact integer cents (cents div
      // whole-unit quantity, both non-negative so Spark/DuckDB integer
      // division agree). The correlated MIN subquery becomes a per-part
      // aggregate joined back on equality; all dims broadcast.
      val pf = broadcast(Tables.part(s, d)
        .where(col("p_size") <= 15 && col("p_type") === "LARGE")
        .select(col("p_partkey"), col("p_name")))
      val eur = broadcast(Tables.supplier(s, d)
        .join(Tables.nation(s, d), col("s_nationkey") === col("n_nationkey"))
        .join(Tables.region(s, d).where(col("r_name") === "EUROPE"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_name"),
          floor(col("s_acctbal") * lit(100.0)).cast("long").as("bal_c")))
      val ps = Tables.lineitem(s, d)
        .join(pf.select("p_partkey"),
          col("l_partkey") === col("p_partkey"), "left_semi")
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min(expr(
          "floor(l_extendedprice * 100.0) div cast(l_quantity as bigint)"))
          .as("supplycost_c"))
      val eps = ps.join(eur, col("l_suppkey") === col("s_suppkey"))
      val mc = eps.groupBy(col("l_partkey").as("mp"))
        .agg(min(col("supplycost_c")).as("min_c"))
      eps.join(mc, col("l_partkey") === col("mp") &&
          col("supplycost_c") === col("min_c"))
        .join(pf, col("l_partkey") === col("p_partkey"))
        .select(col("p_partkey"), col("p_name"), col("s_suppkey"),
          col("s_name"), col("n_name"), col("bal_c"), col("supplycost_c"))
        .orderBy("p_partkey", "s_suppkey")
    },
    "q_tpch_q9" -> { (s, d) =>
      // TPC-H Q9 shape (product-type profit) adapted: the supply-cost
      // stand-in is half the part's retail price in cents (no
      // partsupp); profit = revenue cents − qty·cost_c as exact signed
      // integers (subtraction only, no signed division), grouped by
      // supplier nation × ship year — lineitem shuffles once on the
      // tiny group key, both dims broadcast
      val pt = broadcast(Tables.part(s, d)
        .where(col("p_name").like("%gear%"))
        .select(col("p_partkey"),
          expr("floor(p_retailprice * 100.0) div 2").as("cost_c")))
      val sn = broadcast(Tables.supplier(s, d)
        .join(Tables.nation(s, d), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name")))
      Tables.lineitem(s, d)
        .join(pt, col("l_partkey") === col("p_partkey"))
        .join(sn, col("l_suppkey") === col("s_suppkey"))
        .select(col("n_name"), year(col("l_shipdate")).cast("long").as("o_year"),
          (floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * lit(100.0)).cast("long") -
            col("cost_c") * col("l_quantity").cast("long")).as("amount_c"))
        .groupBy("n_name", "o_year")
        .agg(count(lit(1)).as("n_items"), sum(col("amount_c")).as("profit_c"))
        .orderBy("n_name", "o_year")
    },
    "q_tpch_q11" -> { (s, d) =>
      // TPC-H Q11 shape (important stock) adapted: per-part inventory
      // value = revenue cents contributed by ASIA suppliers' lineitems;
      // the "fraction of the total" predicate is cross-multiplied exact
      // integers (2000·value_c > total_c, i.e. >0.05% share) against a
      // broadcast 1-row global sum — no doubles, no second scan
      val asia = broadcast(Tables.supplier(s, d)
        .join(Tables.nation(s, d), col("s_nationkey") === col("n_nationkey"))
        .join(Tables.region(s, d).where(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey")))
      val vals = Tables.lineitem(s, d)
        .join(asia, col("l_suppkey") === col("s_suppkey"), "left_semi")
        .groupBy(col("l_partkey"))
        .agg(sum(floor(col("l_extendedprice") * lit(100.0)).cast("long"))
          .as("value_c"))
      vals.crossJoin(broadcast(vals.agg(sum(col("value_c")).as("total_c"))))
        .where(col("value_c") * lit(2000L) > col("total_c"))
        .select(col("l_partkey"), col("value_c"))
        .orderBy(col("value_c").desc, col("l_partkey"))
    },
    "q_tpch_q16" -> { (s, d) =>
      // TPC-H Q16 shape (part/supplier relationship) adapted: the
      // catalog is the distinct (part, supplier) pairs in lineitem; the
      // "customer complaints" exclusion becomes negative account
      // balance (left-anti on a broadcast handful); exact distinct
      // supplier counts per (brand, type, size) bucket
      val badSupp = broadcast(Tables.supplier(s, d)
        .where(col("s_acctbal") < 0.0).select(col("s_suppkey")))
      Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_suppkey")).distinct()
        .join(badSupp, col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(broadcast(Tables.part(s, d)
          .where(col("p_brand") =!= "Brand#13" && col("p_type") =!= "PROMO" &&
            col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
          .select(col("p_partkey"), col("p_brand"), col("p_type"),
            col("p_size"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    },
    "q_tpch_q20" -> { (s, d) =>
      // TPC-H Q20 shape (potential part promotion) adapted: no
      // ps_availqty, so a supplier qualifies when it shipped MORE than
      // half of a bolt-part's total 1997 volume (2·supp_qty > part_qty,
      // exact integer cross-multiplication), restricted to AMERICA
      // suppliers; the shipdate filter reaches the scan, the part
      // filter arrives as a broadcast semi join
      val bolts = broadcast(Tables.part(s, d)
        .where(col("p_name").like("%bolt%")).select(col("p_partkey")))
      val li97 = Tables.lineitem(s, d)
        .where(col("l_shipdate") >= to_timestamp(lit("1997-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1998-01-01")))
        .join(bolts, col("l_partkey") === col("p_partkey"), "left_semi")
        .select(col("l_partkey"), col("l_suppkey"),
          col("l_quantity").cast("long").as("qty"))
      val perSupp = li97.groupBy("l_partkey", "l_suppkey")
        .agg(sum(col("qty")).as("supp_qty"))
      val perPart = li97.groupBy(col("l_partkey").as("pp"))
        .agg(sum(col("qty")).as("part_qty"))
      val amer = broadcast(Tables.supplier(s, d)
        .join(Tables.nation(s, d), col("s_nationkey") === col("n_nationkey"))
        .join(Tables.region(s, d).where(col("r_name") === "AMERICA"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"), col("s_name")))
      perSupp.join(perPart, col("l_partkey") === col("pp"))
        .where(col("supp_qty") * lit(2L) > col("part_qty"))
        .join(amer, col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name")).distinct()
        .orderBy("s_suppkey")
    },
    "q_tpch_q21" -> { (s, d) =>
      // TPC-H Q21 shape (suppliers who kept orders waiting) adapted:
      // lateness = shipped > 90 days after order date (no
      // receipt/commit dates), scope = EUROPE suppliers. For finished
      // orders, a supplier's late lineitem counts when the order has
      // another supplier (EXISTS → n_supp ≥ 2) but no OTHER late
      // supplier (NOT EXISTS → n_late_supp = 1 — this row's supplier IS
      // that one late supplier). Both correlated subqueries collapse
      // into ONE per-order aggregate joined back on the order key.
      val li = Tables.lineitem(s, d)
        .join(Tables.orders(s, d).where(col("o_orderstatus") === "F")
            .select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_suppkey"),
          (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAY"))
            .as("late"))
      val stats = li.groupBy(col("l_orderkey").as("ok"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(when(col("late"), col("l_suppkey"))).as("n_late_supp"))
      val eur = broadcast(Tables.supplier(s, d)
        .join(Tables.nation(s, d), col("s_nationkey") === col("n_nationkey"))
        .join(Tables.region(s, d).where(col("r_name") === "EUROPE"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"), col("s_name")))
      li.where(col("late"))
        .join(eur, col("l_suppkey") === col("s_suppkey"))
        .join(stats, col("l_orderkey") === col("ok"))
        .where(col("n_supp") >= 2L && col("n_late_supp") === 1L)
        .groupBy("s_suppkey", "s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_suppkey"))
    },
    "q_join_size_est" -> { (s, d) =>
      // AMS cross-moment join sizing (AmsSketch.crossMomentLanes): price
      // the click⋈view user join from two 16-long sketches; the exact
      // join size rides along as the estimator check
      val ev = Tables.events(s, d)
      graft.ops.AmsSketch.crossMomentLanes(
        ev.where(col("event_type") === "click").select(col("user_id")),
        "user_id",
        ev.where(col("event_type") === "view").select(col("user_id")),
        "user_id", lanes = 16)
    },
    "q_skew_join" -> { (s, d) =>
      // salted skew join (ops/SkewJoin): six event types dwarf any hash
      // partitioning — salt the fact side 8 ways against the replicated
      // type dim; the aggregate must equal the plain-join oracle exactly
      val ev = Tables.events(s, d).select(col("event_type"), col("value"))
      val dim = Tables.events(s, d).groupBy("event_type")
        .agg(count(lit(1)).as("type_n"))
      graft.ops.SkewJoin.saltedJoin(ev, dim, "event_type", salts = 8)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_rows"), max(col("type_n")).as("type_n"),
          sum(floor(col("value") * 100).cast("long")).as("cents"))
        .orderBy("event_type")
    },
    "q_zorder_prune" -> { (s, d) =>
      // min/max file-skipping audit of the Morton layout
      // (ZOrderLayout.pruningAudit): two slabs + one box over
      // (orderkey, partkey) — the numbers that justify Z-ordering
      graft.ops.ZOrderLayout.pruningAudit(
        Tables.lineitem(s, d),
        col("l_orderkey") % 65536, col("l_partkey") % 65536,
        Seq((0L, 4095L, 0L, 65535L), (0L, 65535L, 0L, 4095L),
          (10000L, 20000L, 30000L, 40000L)))
        .orderBy("probe_id")
    },
    "q_l_diversity" -> { (s, d) =>
      // distinct l-diversity audit (KAnonymity.lDiversity): balance-bucket
      // homogeneity inside each (nation, segment) QI class — two stacked
      // map-side-combined aggregates, class-dimension output
      graft.ops.KAnonymity.lDiversity(
        Tables.customer(s, d).withColumn("bal_bucket",
          floor(col("c_acctbal") / 1000)),
        Seq("c_nationkey", "c_mktsegment"), "bal_bucket", l = 3L)
        .orderBy("c_nationkey", "c_mktsegment")
    },
    "q_window_range" -> { (s, d) =>
      // RANGE-frame window (the frame family q_window_running's ROWS
      // frame doesn't cover): per-user trailing-1h event count + value
      // sum in exact micro-units over the integer-µs ordering key
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts_us"))
        .rangeBetween(-3600000000L, 0L)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts_us"),
          floor(col("value") * lit(1000000.0)).cast("long").as("v_us"))
        .withColumn("trail_n", count(lit(1)).over(w))
        .withColumn("trail_sum", sum(col("v_us")).over(w))
        .orderBy("user_id", "ts_us", "event_id")
    },
    "q_global_rank" -> { (s, d) =>
      // global sequence numbering WITHOUT a single-partition window
      // (Ranks.globalRowNumber: range exchange + zipWithIndex offsets);
      // every 997th rank probed so the oracle proves the whole order
      graft.ops.Ranks.globalRowNumber(
          Tables.lineitem(s, d).select(col("l_orderkey"),
            col("l_linenumber"),
            floor(col("l_extendedprice") * lit(100.0)).cast("long")
              .as("v_c")),
          Seq("v_c", "l_orderkey", "l_linenumber"))
        .where(pmod(col("grn"), lit(997L)) === 0L)
        .orderBy("grn")
    },
    "q_percentile_cont" -> { (s, d) =>
      // interpolated P50/P90 per flag (Quantiles.interpolatedPercentiles):
      // PERCENTILE_CONT semantics from exact integer anchors + one affine
      // double step — identical expression in the oracle, hash-exact
      graft.ops.Quantiles.interpolatedPercentiles(
          Tables.lineitem(s, d).select(col("l_returnflag").as("flag"),
            floor(col("l_extendedprice") * lit(100.0)).cast("long")
              .as("v_c")),
          "v_c", Seq("flag"), Seq(50, 90))
        .orderBy("flag")
    },
    "q_tpch_q14" -> { (s, d) =>
      // TPC-H Q14 (promotion effect): one month of lineitems ⋈ part,
      // promo share in exact integer permyriad of cents revenue —
      // shipdate filter pushed to the scan, one aggregation row out
      val li = Tables.lineitem(s, d)
        .where(col("l_shipdate") >= to_timestamp(lit("1997-09-01")) &&
          col("l_shipdate") < to_timestamp(lit("1997-10-01")))
        .select(col("l_partkey"),
          floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * lit(100.0)).cast("long").as("rev_c"))
      li.join(Tables.part(s, d).select(col("p_partkey"), col("p_type")),
          col("l_partkey") === col("p_partkey"))
        .agg(count(lit(1)).as("n_items"),
          sum(when(col("p_type") === "PROMO", col("rev_c")).otherwise(0L))
            .as("promo_c"),
          sum(col("rev_c")).as("total_c"))
        .withColumn("promo_permyriad",
          expr("(10000 * promo_c) div total_c"))
    },
    "q_tpch_q15" -> { (s, d) =>
      // TPC-H Q15 (top supplier): quarterly revenue per supplier, keep
      // the max — the view + scalar-max-subquery becomes an aggregate +
      // broadcast max join (ties all kept, as in the spec)
      val rev = Tables.lineitem(s, d)
        .where(col("l_shipdate") >= to_timestamp(lit("1997-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1997-04-01")))
        .groupBy(col("l_suppkey"))
        .agg(sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * lit(100.0)).cast("long")).as("total_rev_c"))
      val maxRev = rev.agg(max(col("total_rev_c")).as("max_rev_c"))
      rev.crossJoin(broadcast(maxRev))
        .where(col("total_rev_c") === col("max_rev_c"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_rev_c"))
        .orderBy("s_suppkey")
    },
    "q_robust_scale" -> { (s, d) =>
      // RobustScaler on exact order statistics (Quantiles.robustScale):
      // per-type (v−med)/IQR in signed per-mille, magnitude and sign
      // divided separately for cross-engine integer-division parity
      graft.ops.Quantiles.robustScale(
          Tables.events(s, d).select(col("event_type").as("grp"),
            floor(col("value") * lit(1000000.0)).cast("long").as("v_us")),
          "v_us", Seq("grp"))
        .orderBy("grp", "v_us")
    },
    "q_join_profile" -> { (s, d) =>
      // pre-join diagnostics (ops/JoinProfile): per-side rows/distincts/
      // orphans/hottest-key multiplicity + the EXACT join cardinality
      // Σ c_l(k)·c_r(k) — computed from the two count tables, never rows
      graft.ops.JoinProfile.profile(
        Tables.orders(s, d), "o_custkey",
        Tables.customer(s, d), "c_custkey")
    },
    "q_tpch_q19" -> { (s, d) =>
      // TPC-H Q19 shape (discounted revenue, disjunctive predicates):
      // three brand×quantity×size AND-clauses OR'd — one join, the
      // disjunction evaluated post-join, revenue in exact cents
      val li = Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_quantity"),
          floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * lit(100.0)).cast("long").as("rev_c"))
      val p = Tables.part(s, d).select("p_partkey", "p_brand", "p_size")
      li.join(p, col("l_partkey") === col("p_partkey"))
        .where(
          (col("p_brand") === "Brand#12" && col("l_quantity") >= 1 &&
            col("l_quantity") <= 11 && col("p_size") >= 1 &&
            col("p_size") <= 5) ||
          (col("p_brand") === "Brand#23" && col("l_quantity") >= 10 &&
            col("l_quantity") <= 20 && col("p_size") >= 1 &&
            col("p_size") <= 10) ||
          (col("p_brand") === "Brand#34" && col("l_quantity") >= 20 &&
            col("l_quantity") <= 30 && col("p_size") >= 1 &&
            col("p_size") <= 15))
        .agg(count(lit(1)).as("n_items"), sum(col("rev_c")).as("rev_c"))
    },
    "q_tpch_q7" -> { (s, d) =>
      // TPC-H Q7 (volume shipping): lineitem revenue between two nations
      // by year — supplier and customer nation dims BOTH broadcast, the
      // two big fact joins shuffle on their keys, year from the pushed
      // shipdate range
      val n1 = "NATION_9"; val n2 = "NATION_10"
      val natl = broadcast(Tables.nation(s, d)
        .where(col("n_name").isin(n1, n2))
        .select(col("n_nationkey"), col("n_name")))
      val sup = Tables.supplier(s, d)
        .join(natl, col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cust = Tables.customer(s, d)
        .join(natl, col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      val ord = Tables.orders(s, d).select("o_orderkey", "o_custkey")
      Tables.lineitem(s, d)
        .where(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1998-01-01")))
        .select(col("l_orderkey"), col("l_suppkey"),
          year(col("l_shipdate")).as("l_year"),
          floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * lit(100.0)).cast("long").as("rev_c"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .where(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
        .agg(count(lit(1)).as("n_items"), sum(col("rev_c")).as("rev_c"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },
    "q_tpch_q13" -> { (s, d) =>
      // TPC-H Q13 (customer order-count distribution): left join keeps
      // zero-order customers, two stacked aggregations — the classic
      // histogram-of-counts shape
      val ord = Tables.orders(s, d).select(col("o_custkey"))
      Tables.customer(s, d).select(col("c_custkey"))
        .join(ord, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_custkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },
    "q_tpch_q17" -> { (s, d) =>
      // TPC-H Q17 shape (small-quantity revenue): lineitems under 20% of
      // their part's average quantity — the correlated AVG subquery
      // decorrelates into a per-part aggregate joined back, threshold as
      // the cross-multiplied integer test 5·qty·n < Σqty (no double avg)
      val li = Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"),
          floor(col("l_extendedprice") * lit(100.0)).cast("long")
            .as("price_c"))
      val pq = li.groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n_li"), sum(col("qty")).as("sum_q"))
      li.join(pq, Seq("l_partkey"))
        .join(Tables.part(s, d).select(col("p_partkey"), col("p_brand")),
          col("l_partkey") === col("p_partkey"))
        .where(col("p_brand").isin("Brand#12", "Brand#23") &&
          lit(5L) * col("qty") * col("n_li") < col("sum_q"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_small"),
          sum(col("price_c")).as("rev_small_c"))
        .orderBy("p_brand")
    },
    "q_radius_join" -> { (s, d) =>
      // planar radius self-join (Density.radiusPairs): all embedding
      // pairs within L2 0.125 on the first two axes — 9-cell grid
      // candidates (the spatial LSH), exact integer squared-distance
      // verify, never all-pairs
      graft.ops.Density.radiusPairs(Tables.embeddings(s, d), "vec_id",
        "embedding", epsQ = 1250L).orderBy("id_a", "id_b")
    },
    "q_t_closeness" -> { (s, d) =>
      // t-closeness privacy audit (KAnonymity.tCloseness): per-nation
      // TVD between the nation's market-segment mix and the global one,
      // exact permille via cross-multiplication with the absent-value
      // mass folded in closed form; threshold t = 100 permille
      graft.ops.KAnonymity.tCloseness(
        Tables.customer(s, d).select(col("c_nationkey"),
          col("c_mktsegment")),
        Seq("c_nationkey"), "c_mktsegment", 100L)
        .orderBy("c_nationkey")
    })

  def oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(FLOOR(l_extendedprice * (1.0 - l_discount) * 100.0)) AS DOUBLE) / 100.0 AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    // NOTE: DuckDB types SUM(BIGINT) as HUGEINT (int128), which pandas
    // renders as float64 — the driver's strict value hash then sees
    // `506627.0` vs Spark's `506627` and fails even though the numbers are
    // equal (round-1 q_rollup/q_window_running/q_text_stats mismatches).
    // Every integer SUM in oracle SQL must be wrapped in CAST(... AS BIGINT).,
    "q_rollup" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS flag,
        |       COALESCE(l_linestatus, 'ALL') AS status,
        |       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |       COUNT(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY flag, status""".stripMargin,
    "q_window_running" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |       CAST(SUM(CAST(l_quantity AS BIGINT)) OVER (
        |         PARTITION BY l_suppkey
        |         ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_qty
        |FROM lineitem
        |ORDER BY l_suppkey, l_orderkey, l_linenumber, running_qty""".stripMargin,
    "q_setops" ->
      """SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
        |INTERSECT
        |SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
        |EXCEPT
        |SELECT l_partkey FROM lineitem WHERE l_extendedprice < 1000.0
        |ORDER BY l_partkey""".stripMargin,
    "q_zorder" ->
      s"""WITH base AS (SELECT l_orderkey % 65536 AS a, l_partkey % 65536 AS b
         |              FROM lineitem),
         |${graft.ops.ZOrderLayout.spreadOracleCtes("base")}
         |SELECT (z >> 24) AS z_bucket, COUNT(*) AS n_rows,
         |       MIN(z) AS z_min, MAX(z) AS z_max
         |FROM zfin GROUP BY 1 ORDER BY z_bucket""".stripMargin,
    "q_anonymize" ->
      """WITH cust AS (SELECT md5('s4lt' || CAST(c_custkey AS VARCHAR)) AS cust_pid,
        |                     regexp_replace(c_name, '[0-9]+', '<ID>', 'g') AS masked_name,
        |                     c_mktsegment
        |              FROM customer),
        |o AS (SELECT md5('s4lt' || CAST(o_custkey AS VARCHAR)) AS cust_pid FROM orders)
        |SELECT cust.cust_pid, masked_name, c_mktsegment, COUNT(o.cust_pid) AS n_orders
        |FROM cust LEFT JOIN o ON cust.cust_pid = o.cust_pid
        |GROUP BY 1, 2, 3
        |ORDER BY cust.cust_pid""".stripMargin,
    "q_bloom_join" ->
      """SELECT l_returnflag, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |WHERE l_orderkey IN
        |  (SELECT o_orderkey FROM orders WHERE o_totalprice > 450000.0)
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q_k_anonymity" ->
      """SELECT c_nationkey, c_mktsegment, COUNT(*) AS n,
        |  CASE WHEN COUNT(*) < 10 THEN 1 ELSE 0 END AS at_risk
        |FROM customer GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
    "q_window_distinct" ->
      """WITH e AS (SELECT (epoch_us(ts) // 1800000000 - t.k) * 1800000000 AS ws,
        |             user_id
        |           FROM events, UNNEST(range(0, 2)) AS t(k)),
        |h AS (SELECT ws,
        |        ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
        |      FROM e),
        |r AS (SELECT ws, CAST(h % 64 AS INT) AS idx,
        |        CASE WHEN h >> 6 = 0 THEN 55
        |             ELSE bit_count(((h >> 6) & -(h >> 6)) - 1) + 1 END AS rho
        |      FROM h),
        |regs AS (SELECT ws, idx, MAX(rho) AS reg FROM r GROUP BY 1, 2),
        |wins AS (SELECT DISTINCT ws FROM e)
        |SELECT w.ws AS window_start_us, CAST(t.i AS INT) AS reg_idx,
        |       CAST(COALESCE(regs.reg, 0) AS INT) AS reg_val
        |FROM wins w CROSS JOIN range(0, 64) t(i)
        |LEFT JOIN regs ON regs.ws = w.ws AND regs.idx = t.i
        |ORDER BY w.ws, reg_idx""".stripMargin,
    "q_pack" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |c AS (SELECT doc_id, w, len(w) AS n FROM t),
        |idx AS (SELECT doc_id, w, CAST(u.i AS INT) AS chunk_idx
        |        FROM c, UNNEST(range(0, 1 + CAST(CEIL(GREATEST(n - 64, 0) / 48.0) AS BIGINT))) AS u(i)),
        |ch AS (SELECT doc_id, chunk_idx,
        |              CAST(doc_id % 8 AS INT) AS shard,
        |              CAST(len(w[chunk_idx * 48 + 1 : chunk_idx * 48 + 64]) AS INT) AS n_tok
        |       FROM idx),
        |r AS (SELECT shard, n_tok,
        |        SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id, chunk_idx
        |          ROWS UNBOUNDED PRECEDING) AS run
        |      FROM ch),
        |b AS (SELECT shard, n_tok, CAST((run - n_tok) // 512 AS BIGINT) AS bin FROM r)
        |SELECT shard, bin, COUNT(*) AS n_chunks,
        |       CAST(SUM(n_tok) AS BIGINT) AS tot_tokens
        |FROM b GROUP BY shard, bin ORDER BY shard, bin""".stripMargin,
    "q_quantiles_sketch" ->
      s"""WITH ${quantileSampleCtes(k = 64)}
         |SELECT pri AS o_orderpriority, CAST(rk AS INT) AS rk, h, v
         |FROM kept ORDER BY 1, 2""".stripMargin,
    "q_quantiles_sample" ->
      s"""WITH ${quantileSampleCtes(k = 64)},
         |sq AS (SELECT pri, CAST(COUNT(*) AS BIGINT) AS n FROM kept GROUP BY pri),
         |q AS (SELECT UNNEST([500, 900, 990]) AS q_permille),
         |idx AS (SELECT pri, q_permille,
         |               GREATEST(1, LEAST(n, (n * q_permille + 999) // 1000)) AS ix
         |        FROM sq CROSS JOIN q),
         |ordered AS (SELECT pri, v, ROW_NUMBER() OVER (PARTITION BY pri ORDER BY v) AS vr
         |            FROM kept)
         |SELECT i.pri AS o_orderpriority, CAST(i.q_permille AS INT) AS q_permille,
         |       o.v AS quantile_v
         |FROM idx i JOIN ordered o ON o.pri = i.pri AND o.vr = i.ix
         |ORDER BY 1, 2""".stripMargin,
    "q_quantiles" ->
      """WITH b AS (SELECT o_orderpriority, CAST(FLOOR(o_totalprice / 1000.0) AS BIGINT) AS bucket,
        |                  COUNT(*) AS cnt
        |           FROM orders WHERE o_totalprice IS NOT NULL
        |           GROUP BY o_orderpriority, bucket),
        |c AS (SELECT o_orderpriority, bucket, cnt,
        |        SUM(cnt) OVER (PARTITION BY o_orderpriority ORDER BY bucket
        |          ROWS UNBOUNDED PRECEDING) AS cum,
        |        SUM(cnt) OVER (PARTITION BY o_orderpriority) AS n
        |      FROM b),
        |q AS (SELECT UNNEST([500, 900, 990]) AS q_permille),
        |hit AS (SELECT o_orderpriority, q_permille, MIN(bucket) AS qb
        |        FROM c CROSS JOIN q
        |        WHERE cum >= (n * q_permille + 999) // 1000
        |        GROUP BY o_orderpriority, q_permille)
        |SELECT o_orderpriority, CAST(q_permille AS INT) AS q_permille,
        |       CAST(qb AS DOUBLE) * 1000.0 AS quantile_lo
        |FROM hit ORDER BY o_orderpriority, q_permille""".stripMargin,
    "q_sample" ->
      """SELECT lang, COUNT(*) AS n_docs, CAST(SUM(doc_id) AS BIGINT) AS sum_ids
        |FROM documents
        |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000 < 200
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "q_weighted_sample" ->
      """SELECT doc_id, n_chars,
        |       LEAST(1000000, n_chars * 1000) AS p_ppm
        |FROM documents
        |WHERE ('0x' || substr(md5('ws1' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000000
        |      < n_chars * 1000
        |ORDER BY doc_id""".stripMargin,
    "q_profile" -> profileOracle(
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")),
    "q_range_join" ->
      """WITH b AS (SELECT CAST(i AS INT) AS band_id,
        |                  CAST(i * 5000 AS DOUBLE) AS lo,
        |                  CAST(i * 5000 + 9999 AS DOUBLE) AS hi
        |           FROM range(0, 100) t(i))
        |SELECT b.band_id, COUNT(*) AS n_orders,
        |       CAST(SUM(FLOOR(o.o_totalprice * CAST(100.0 AS DOUBLE))) AS DOUBLE) / 100.0 AS sum_price
        |FROM b JOIN orders o ON o.o_totalprice >= b.lo AND o.o_totalprice <= b.hi
        |GROUP BY b.band_id ORDER BY b.band_id""".stripMargin,
    "q_pivot" ->
      """SELECT epoch_us(ts) // 86400000000 AS day,
        |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,
    "q_rank_normalize" ->
      """WITH r AS (SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice,
        |             rank() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rk,
        |             COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        |           FROM lineitem)
        |SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice,
        |       CAST(((rk - 1) * 1000) // GREATEST(n - 1, 1) AS BIGINT)
        |         AS rank_permille
        |FROM r ORDER BY l_orderkey, l_linenumber, l_returnflag,
        |  l_extendedprice""".stripMargin,
    "q_cube" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS flag,
        |       COALESCE(l_linestatus, 'ALL') AS status,
        |       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |       COUNT(*) AS n
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY flag, status, gid""".stripMargin,
    "q_unpivot" ->
      """WITH a AS (SELECT l_returnflag AS flag,
        |  CAST(SUM(CAST(FLOOR(l_quantity * 100.0) AS BIGINT)) AS BIGINT) AS qty_c,
        |  CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT)) AS BIGINT) AS price_c,
        |  CAST(SUM(CAST(FLOOR(l_discount * 10000.0) AS BIGINT)) AS BIGINT) AS disc_bp,
        |  CAST(SUM(CAST(FLOOR(l_tax * 10000.0) AS BIGINT)) AS BIGINT) AS tax_bp
        |  FROM lineitem GROUP BY 1)
        |SELECT flag, measure, value FROM (
        |  SELECT flag, 'qty_c' AS measure, qty_c AS value FROM a
        |  UNION ALL SELECT flag, 'price_c', price_c FROM a
        |  UNION ALL SELECT flag, 'disc_bp', disc_bp FROM a
        |  UNION ALL SELECT flag, 'tax_bp', tax_bp FROM a)
        |ORDER BY flag, measure""".stripMargin,
    "q_tpch_q3" ->
      """SELECT l_orderkey, epoch_us(o_orderdate) AS o_orderdate_us,
        |       o_orderpriority,
        |       CAST(SUM(FLOOR(l_extendedprice * (1.0 - l_discount) * 100.0)) AS DOUBLE) / 100.0 AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15'
        |  AND l_shipdate > TIMESTAMP '1998-03-15'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q_tpch_q5" ->
      """SELECT n_name,
        |       CAST(SUM(FLOOR(l_extendedprice * (1.0 - l_discount) * 100.0)) AS DOUBLE) / 100.0 AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "q_dq_rules" ->
      """SELECT rule, n_violations FROM (
        |  SELECT 'discount_out_of_range' AS rule,
        |    CAST(COUNT(*) FILTER (WHERE l_discount < 0.0 OR l_discount > 0.3) AS BIGINT) AS n_violations FROM lineitem
        |  UNION ALL SELECT 'discount_over_8pct',
        |    CAST(COUNT(*) FILTER (WHERE l_discount > 0.08) AS BIGINT) FROM lineitem
        |  UNION ALL SELECT 'tax_negative',
        |    CAST(COUNT(*) FILTER (WHERE l_tax < 0.0) AS BIGINT) FROM lineitem
        |  UNION ALL SELECT 'quantity_nonpositive',
        |    CAST(COUNT(*) FILTER (WHERE l_quantity <= 0.0) AS BIGINT) FROM lineitem
        |  UNION ALL SELECT 'quantity_over_40',
        |    CAST(COUNT(*) FILTER (WHERE l_quantity > 40.0) AS BIGINT) FROM lineitem
        |  UNION ALL SELECT 'returnflag_invalid',
        |    CAST(COUNT(*) FILTER (WHERE l_returnflag NOT IN ('A', 'N', 'R')) AS BIGINT) FROM lineitem
        |  UNION ALL SELECT 'orderkey_orphan', CAST(COUNT(*) AS BIGINT)
        |    FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
        |ORDER BY rule""".stripMargin,
    "q_grouped_topk" ->
      """WITH rev AS (SELECT s_nationkey, l_partkey,
        |    CAST(SUM(FLOOR(l_extendedprice * (1.0 - l_discount) * 100.0)) AS DOUBLE) AS cents
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  GROUP BY 1, 2),
        |rk AS (SELECT s_nationkey, 'P' || CAST(l_partkey AS VARCHAR) AS part, cents,
        |    ROW_NUMBER() OVER (PARTITION BY s_nationkey
        |      ORDER BY cents DESC, 'P' || CAST(l_partkey AS VARCHAR) ASC) AS rk
        |  FROM rev)
        |SELECT CAST(s_nationkey AS BIGINT) AS nationkey, CAST(rk AS BIGINT) AS rk,
        |       part, cents / 100.0 AS revenue
        |FROM rk WHERE rk <= 3 ORDER BY nationkey, rk""".stripMargin,
    "q_tpch_q8" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(SUM(CASE WHEN sn.n_name = 'NATION_7'
        |        THEN CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)
        |        ELSE 0 END) AS DOUBLE)
        |  / CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)) AS DOUBLE) AS mkt_share
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |JOIN region ON cn.n_regionkey = r_regionkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1 ORDER BY o_year""".stripMargin,
    "q_tpch_q10" ->
      """SELECT c_custkey, c_name, c_acctbal, c_mktsegment, n_name,
        |  CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1997-10-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1, 2, 3, 4, 5
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,
    "q_winsorize" ->
      """WITH v AS (SELECT l_returnflag AS flag,
        |             CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT) AS v
        |           FROM lineitem),
        |r AS (SELECT flag, v, ROW_NUMBER() OVER (PARTITION BY flag ORDER BY v) AS rn,
        |        COUNT(*) OVER (PARTITION BY flag) AS n FROM v),
        |cuts AS (SELECT flag,
        |    MIN(CASE WHEN rn = GREATEST((n * 5 + 99) // 100, 1) THEN v END) AS p_lo,
        |    MIN(CASE WHEN rn = GREATEST((n * 95 + 99) // 100, 1) THEN v END) AS p_hi
        |  FROM r GROUP BY flag)
        |SELECT flag, COUNT(*) AS n, MIN(p_lo) AS p_lo, MIN(p_hi) AS p_hi,
        |  CAST(SUM(CASE WHEN v < p_lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_low,
        |  CAST(SUM(CASE WHEN v > p_hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_high,
        |  CAST(SUM(GREATEST(LEAST(v, p_hi), p_lo)) AS BIGINT) AS wsum
        |FROM r JOIN cuts USING (flag)
        |GROUP BY flag ORDER BY flag""".stripMargin,
    "q_tpch_q6" ->
      """SELECT COUNT(*) AS n_items,
        |  CAST(SUM(FLOOR(l_extendedprice * l_discount * 10000.0)) AS BIGINT) AS revenue_e4
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q_tpch_q4" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-07-01'
        |  AND o_orderdate < TIMESTAMP '1997-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q_tpch_q12" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |       THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |       THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q_tpch_q18" ->
      """WITH big AS (SELECT l_orderkey,
        |               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |             FROM lineitem GROUP BY l_orderkey
        |             HAVING SUM(CAST(l_quantity AS BIGINT)) > 300)
        |SELECT c_custkey, c_name, o_orderkey, o_totalprice, o_orderdate, sum_qty
        |FROM orders JOIN big ON o_orderkey = big.l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin,
    "q_tpch_q22" ->
      """WITH cust AS (SELECT c_custkey, c_nationkey,
        |                CAST(FLOOR(c_acctbal * 100.0) AS BIGINT) AS bal_c
        |              FROM customer),
        |st AS (SELECT COUNT(*) AS n_pos, CAST(SUM(bal_c) AS BIGINT) AS sum_c
        |       FROM cust WHERE bal_c > 0),
        |r AS (SELECT o_custkey FROM orders
        |      WHERE o_orderdate >= TIMESTAMP '1998-01-01')
        |SELECT n_name, COUNT(*) AS numcust,
        |  CAST(SUM(bal_c) AS BIGINT) AS totbal_c
        |FROM cust CROSS JOIN st JOIN nation ON c_nationkey = n_nationkey
        |WHERE bal_c * n_pos > sum_c
        |  AND NOT EXISTS (SELECT 1 FROM r WHERE r.o_custkey = cust.c_custkey)
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,
    "q_tpch_q2" ->
      """WITH pf AS (SELECT p_partkey, p_name FROM part
        |            WHERE p_size <= 15 AND p_type = 'LARGE'),
        |eur AS (SELECT s_suppkey, s_name, n_name,
        |          CAST(FLOOR(s_acctbal * 100.0) AS BIGINT) AS bal_c
        |        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |        JOIN region ON n_regionkey = r_regionkey
        |        WHERE r_name = 'EUROPE'),
        |ps AS (SELECT l_partkey, l_suppkey,
        |         MIN(CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT)
        |             // CAST(l_quantity AS BIGINT)) AS supplycost_c
        |       FROM lineitem
        |       WHERE l_partkey IN (SELECT p_partkey FROM pf)
        |       GROUP BY 1, 2),
        |eps AS (SELECT l_partkey, s_suppkey, s_name, n_name, bal_c,
        |          supplycost_c
        |        FROM ps JOIN eur ON l_suppkey = s_suppkey),
        |mc AS (SELECT l_partkey AS mp, MIN(supplycost_c) AS min_c
        |       FROM eps GROUP BY 1)
        |SELECT p_partkey, p_name, s_suppkey, s_name, n_name, bal_c,
        |  supplycost_c
        |FROM eps JOIN mc ON l_partkey = mp AND supplycost_c = min_c
        |JOIN pf ON l_partkey = p_partkey
        |ORDER BY p_partkey, s_suppkey""".stripMargin,
    "q_tpch_q9" ->
      """SELECT n_name, CAST(year(l_shipdate) AS BIGINT) AS o_year,
        |  COUNT(*) AS n_items,
        |  CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100.0)
        |                AS BIGINT)
        |           - (CAST(FLOOR(p_retailprice * 100.0) AS BIGINT) // 2)
        |             * CAST(l_quantity AS BIGINT)) AS BIGINT) AS profit_c
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%gear%'
        |GROUP BY 1, 2
        |ORDER BY n_name, o_year""".stripMargin,
    "q_tpch_q11" ->
      """WITH asia AS (SELECT s_suppkey
        |              FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |              JOIN region ON n_regionkey = r_regionkey
        |              WHERE r_name = 'ASIA'),
        |vals AS (SELECT l_partkey,
        |           CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT))
        |                AS BIGINT) AS value_c
        |         FROM lineitem
        |         WHERE l_suppkey IN (SELECT s_suppkey FROM asia)
        |         GROUP BY 1),
        |tot AS (SELECT CAST(SUM(value_c) AS BIGINT) AS total_c FROM vals)
        |SELECT l_partkey, value_c
        |FROM vals CROSS JOIN tot
        |WHERE value_c * 2000 > total_c
        |ORDER BY value_c DESC, l_partkey""".stripMargin,
    "q_tpch_q16" ->
      """WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        |ok AS (SELECT l_partkey, l_suppkey FROM pairs
        |       WHERE l_suppkey NOT IN
        |         (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0))
        |SELECT p_brand, p_type, p_size,
        |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM ok JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q_tpch_q20" ->
      """WITH li97 AS (SELECT l_partkey, l_suppkey,
        |                CAST(l_quantity AS BIGINT) AS qty
        |              FROM lineitem
        |              WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |                AND l_shipdate < TIMESTAMP '1998-01-01'
        |                AND l_partkey IN (SELECT p_partkey FROM part
        |                                  WHERE p_name LIKE '%bolt%')),
        |per_supp AS (SELECT l_partkey, l_suppkey,
        |               CAST(SUM(qty) AS BIGINT) AS supp_qty
        |             FROM li97 GROUP BY 1, 2),
        |per_part AS (SELECT l_partkey AS pp,
        |               CAST(SUM(qty) AS BIGINT) AS part_qty
        |             FROM li97 GROUP BY 1),
        |amer AS (SELECT s_suppkey, s_name
        |         FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |         JOIN region ON n_regionkey = r_regionkey
        |         WHERE r_name = 'AMERICA')
        |SELECT DISTINCT s_suppkey, s_name
        |FROM per_supp JOIN per_part ON l_partkey = pp
        |JOIN amer ON l_suppkey = s_suppkey
        |WHERE supp_qty * 2 > part_qty
        |ORDER BY s_suppkey""".stripMargin,
    "q_tpch_q21" ->
      """WITH li AS (SELECT l_orderkey, l_suppkey,
        |              l_shipdate > o_orderdate + INTERVAL 90 DAY AS late
        |            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |            WHERE o_orderstatus = 'F'),
        |stats AS (SELECT l_orderkey AS ok,
        |            COUNT(DISTINCT l_suppkey) AS n_supp,
        |            COUNT(DISTINCT CASE WHEN late THEN l_suppkey END)
        |              AS n_late_supp
        |          FROM li GROUP BY 1),
        |eur AS (SELECT s_suppkey, s_name
        |        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |        JOIN region ON n_regionkey = r_regionkey
        |        WHERE r_name = 'EUROPE')
        |SELECT s_suppkey, s_name, COUNT(*) AS numwait
        |FROM li JOIN eur ON l_suppkey = s_suppkey
        |JOIN stats ON l_orderkey = ok
        |WHERE late AND n_supp >= 2 AND n_late_supp = 1
        |GROUP BY 1, 2
        |ORDER BY numwait DESC, s_suppkey""".stripMargin,
    "q_join_size_est" ->
      """WITH ka AS (SELECT CAST(user_id AS VARCHAR) AS k FROM events
        |            WHERE event_type = 'click' AND user_id IS NOT NULL),
        |kb AS (SELECT CAST(user_id AS VARCHAR) AS k FROM events
        |       WHERE event_type = 'view' AND user_id IS NOT NULL),
        |za AS (SELECT lane,
        |         CAST(SUM(1 - 2 * ((('0x' || substr(md5(
        |           CAST(lane AS VARCHAR) || '#' || k), 1, 15))::BIGINT) % 2))
        |           AS BIGINT) AS z_a
        |       FROM ka CROSS JOIN range(16) t(lane) GROUP BY lane),
        |zb AS (SELECT lane,
        |         CAST(SUM(1 - 2 * ((('0x' || substr(md5(
        |           CAST(lane AS VARCHAR) || '#' || k), 1, 15))::BIGINT) % 2))
        |           AS BIGINT) AS z_b
        |       FROM kb CROSS JOIN range(16) t(lane) GROUP BY lane),
        |ex AS (SELECT COALESCE(CAST(SUM(fa * fb) AS BIGINT), 0)
        |         AS join_size_exact
        |       FROM (SELECT k, COUNT(*) AS fa FROM ka GROUP BY k) a
        |       JOIN (SELECT k, COUNT(*) AS fb FROM kb GROUP BY k) b
        |         USING (k))
        |SELECT za.lane, z_a, z_b, z_a * z_b AS est_prod, join_size_exact
        |FROM za JOIN zb USING (lane) CROSS JOIN ex
        |ORDER BY za.lane""".stripMargin,
    "q_skew_join" ->
      """WITH ev AS (SELECT event_type, value FROM events),
        |dim AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS type_n
        |        FROM events GROUP BY 1)
        |SELECT ev.event_type, COUNT(*) AS n_rows,
        |  CAST(MAX(type_n) AS BIGINT) AS type_n,
        |  CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM ev JOIN dim ON dim.event_type = ev.event_type
        |GROUP BY ev.event_type
        |ORDER BY ev.event_type""".stripMargin,
    "q_zorder_prune" ->
      s"""WITH base AS (SELECT l_orderkey % 65536 AS a, l_partkey % 65536 AS b
         |              FROM lineitem),
         |${graft.ops.ZOrderLayout.spreadOracleCtes("base")},
         |pr AS (SELECT * FROM (VALUES (0, 0, 4095, 0, 65535),
         |                             (1, 0, 65535, 0, 4095),
         |                             (2, 10000, 20000, 30000, 40000))
         |       AS t(probe_id, la, ha, lb, hb)),
         |st AS (SELECT (z >> 24) AS z_bucket, COUNT(*) AS n_rows,
         |         MIN(a) AS min_a, MAX(a) AS max_a,
         |         MIN(b) AS min_b, MAX(b) AS max_b
         |       FROM zfin GROUP BY 1),
         |per AS (SELECT pr.probe_id, st.n_rows,
         |          (st.max_a < pr.la OR st.min_a > pr.ha
         |           OR st.max_b < pr.lb OR st.min_b > pr.hb) AS pruned
         |        FROM st CROSS JOIN pr),
         |agg AS (SELECT probe_id, COUNT(*) AS n_buckets,
         |          CAST(SUM(CASE WHEN pruned THEN 1 ELSE 0 END) AS BIGINT)
         |            AS n_pruned,
         |          CAST(SUM(n_rows) AS BIGINT) AS rows_total,
         |          CAST(SUM(CASE WHEN pruned THEN 0 ELSE n_rows END) AS BIGINT)
         |            AS rows_scanned
         |        FROM per GROUP BY 1),
         |mtot AS (SELECT pr.probe_id,
         |           CAST(SUM(CASE WHEN a BETWEEN la AND ha
         |                          AND b BETWEEN lb AND hb
         |                         THEN 1 ELSE 0 END) AS BIGINT) AS rows_matched
         |         FROM base CROSS JOIN pr GROUP BY 1)
         |SELECT CAST(agg.probe_id AS BIGINT) AS probe_id, n_buckets, n_pruned,
         |  rows_total, rows_scanned, rows_matched,
         |  (1000 * n_pruned) // n_buckets AS prune_permille
         |FROM agg JOIN mtot ON mtot.probe_id = agg.probe_id
         |ORDER BY probe_id""".stripMargin,
    "q_l_diversity" ->
      """WITH q AS (SELECT c_nationkey, c_mktsegment,
        |             CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_bucket
        |           FROM customer),
        |g AS (SELECT c_nationkey, c_mktsegment, bal_bucket, COUNT(*) AS n
        |      FROM q GROUP BY 1, 2, 3),
        |c AS (SELECT c_nationkey, c_mktsegment,
        |        CAST(SUM(n) AS BIGINT) AS n_rows,
        |        COUNT(*) AS n_sensitive, CAST(MAX(n) AS BIGINT) AS max_sens_n
        |      FROM g GROUP BY 1, 2)
        |SELECT c_nationkey, c_mktsegment, n_rows, n_sensitive, max_sens_n,
        |  n_sensitive >= 3 AS is_diverse
        |FROM c ORDER BY c_nationkey, c_mktsegment""".stripMargin,
    "q_window_range" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |  CAST(FLOOR(value * 1000000.0) AS BIGINT) AS v_us,
        |  COUNT(*) OVER w AS trail_n,
        |  CAST(SUM(CAST(FLOOR(value * 1000000.0) AS BIGINT)) OVER w AS BIGINT) AS trail_sum
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, ts_us, event_id""".stripMargin,
    "q_global_rank" ->
      """WITH r AS (SELECT l_orderkey, l_linenumber,
        |             CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT) AS v_c,
        |             ROW_NUMBER() OVER (ORDER BY
        |               CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT),
        |               l_orderkey, l_linenumber) AS grn
        |           FROM lineitem)
        |SELECT l_orderkey, l_linenumber, v_c, grn
        |FROM r WHERE grn % 997 = 0
        |ORDER BY grn""".stripMargin,
    "q_percentile_cont" ->
      """WITH v AS (SELECT l_returnflag AS flag,
        |             CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT) AS v
        |           FROM lineitem),
        |r AS (SELECT flag, v, ROW_NUMBER() OVER (PARTITION BY flag ORDER BY v) AS rn,
        |        COUNT(*) OVER (PARTITION BY flag) AS n FROM v),
        |a AS (SELECT flag, COUNT(*) AS n,
        |        MIN(CASE WHEN rn = ((n - 1) * 50) // 100 + 1 THEN v END) AS p50_lo,
        |        MIN(CASE WHEN rn = LEAST(((n - 1) * 50) // 100 + 2, n) THEN v END) AS p50_hi,
        |        MIN(((n - 1) * 50) % 100) AS p50_frac,
        |        MIN(CASE WHEN rn = ((n - 1) * 90) // 100 + 1 THEN v END) AS p90_lo,
        |        MIN(CASE WHEN rn = LEAST(((n - 1) * 90) // 100 + 2, n) THEN v END) AS p90_hi,
        |        MIN(((n - 1) * 90) % 100) AS p90_frac
        |      FROM r GROUP BY flag)
        |SELECT flag, n, p50_lo, p50_hi, p50_frac,
        |  CAST(p50_lo AS DOUBLE)
        |    + (CAST(p50_hi AS DOUBLE) - CAST(p50_lo AS DOUBLE)) * (p50_frac / 100.0) AS p50,
        |  p90_lo, p90_hi, p90_frac,
        |  CAST(p90_lo AS DOUBLE)
        |    + (CAST(p90_hi AS DOUBLE) - CAST(p90_lo AS DOUBLE)) * (p90_frac / 100.0) AS p90
        |FROM a ORDER BY flag""".stripMargin,
    "q_tpch_q14" ->
      """WITH li AS (SELECT l_partkey,
        |              CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT) AS rev_c
        |            FROM lineitem
        |            WHERE l_shipdate >= TIMESTAMP '1997-09-01'
        |              AND l_shipdate < TIMESTAMP '1997-10-01')
        |SELECT COUNT(*) AS n_items,
        |  CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev_c ELSE 0 END) AS BIGINT) AS promo_c,
        |  CAST(SUM(rev_c) AS BIGINT) AS total_c,
        |  (10000 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev_c ELSE 0 END) AS BIGINT))
        |    // CAST(SUM(rev_c) AS BIGINT) AS promo_permyriad
        |FROM li JOIN part ON l_partkey = p_partkey""".stripMargin,
    "q_tpch_q15" ->
      """WITH rev AS (SELECT l_suppkey,
        |               CAST(SUM(FLOOR(l_extendedprice * (1.0 - l_discount) * 100.0)) AS BIGINT) AS total_rev_c
        |             FROM lineitem
        |             WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |               AND l_shipdate < TIMESTAMP '1997-04-01'
        |             GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_rev_c
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_rev_c = (SELECT MAX(total_rev_c) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "q_robust_scale" ->
      """WITH v AS (SELECT event_type AS grp,
        |             CAST(FLOOR(value * 1000000.0) AS BIGINT) AS v FROM events),
        |r AS (SELECT grp, v, ROW_NUMBER() OVER (PARTITION BY grp ORDER BY v) AS rn,
        |        COUNT(*) OVER (PARTITION BY grp) AS n FROM v),
        |cuts AS (SELECT grp,
        |    MIN(CASE WHEN rn = GREATEST((n * 25 + 99) // 100, 1) THEN v END) AS p25,
        |    MIN(CASE WHEN rn = GREATEST((n * 50 + 99) // 100, 1) THEN v END) AS med,
        |    MIN(CASE WHEN rn = GREATEST((n * 75 + 99) // 100, 1) THEN v END) AS p75
        |  FROM r GROUP BY grp)
        |SELECT r.grp, v AS v_us, med, p75 - p25 AS iqr,
        |  CASE WHEN p75 - p25 = 0 THEN NULL
        |       ELSE (CASE WHEN v >= med THEN 1 ELSE -1 END)
        |              * ((1000 * ABS(v - med)) // (p75 - p25)) END AS scaled_permille
        |FROM r JOIN cuts USING (grp)
        |ORDER BY r.grp, v_us""".stripMargin,
    "q_join_profile" ->
      """WITH lc AS (SELECT o_custkey AS k, COUNT(*) AS lc FROM orders
        |            WHERE o_custkey IS NOT NULL GROUP BY 1),
        |rc AS (SELECT c_custkey AS k, COUNT(*) AS rc FROM customer
        |       WHERE c_custkey IS NOT NULL GROUP BY 1),
        |m AS (SELECT lc, rc FROM lc FULL OUTER JOIN rc ON lc.k = rc.k)
        |SELECT CAST(SUM(COALESCE(lc, 0)) AS BIGINT) AS l_rows,
        |  CAST(SUM(COALESCE(rc, 0)) AS BIGINT) AS r_rows,
        |  CAST(SUM(CASE WHEN lc IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS l_distinct,
        |  CAST(SUM(CASE WHEN rc IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS r_distinct,
        |  CAST(SUM(CASE WHEN rc IS NULL THEN lc ELSE 0 END) AS BIGINT) AS l_orphan_rows,
        |  CAST(SUM(CASE WHEN lc IS NULL THEN rc ELSE 0 END) AS BIGINT) AS r_orphan_rows,
        |  CAST(MAX(COALESCE(lc, 0)) AS BIGINT) AS l_max_multiplicity,
        |  CAST(MAX(COALESCE(rc, 0)) AS BIGINT) AS r_max_multiplicity,
        |  CAST(SUM(COALESCE(lc, 0) * COALESCE(rc, 0)) AS BIGINT) AS join_rows
        |FROM m""".stripMargin,
    "q_tpch_q19" ->
      """SELECT COUNT(*) AS n_items,
        |  CAST(SUM(FLOOR(l_extendedprice * (1.0 - l_discount) * 100.0)) AS BIGINT) AS rev_c
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11
        |         AND p_size BETWEEN 1 AND 5)
        |   OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20
        |         AND p_size BETWEEN 1 AND 10)
        |   OR (p_brand = 'Brand#34' AND l_quantity BETWEEN 20 AND 30
        |         AND p_size BETWEEN 1 AND 15)""".stripMargin,
    "q_tpch_q7" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |  CAST(YEAR(l_shipdate) AS INT) AS l_year,
        |  COUNT(*) AS n_items,
        |  CAST(SUM(FLOOR(l_extendedprice * (1.0 - l_discount) * 100.0)) AS BIGINT) AS rev_c
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND sn.n_name IN ('NATION_9', 'NATION_10')
        |  AND cn.n_name IN ('NATION_9', 'NATION_10')
        |  AND sn.n_name <> cn.n_name
        |GROUP BY 1, 2, 3
        |ORDER BY 1, 2, 3""".stripMargin,
    "q_tpch_q13" ->
      """SELECT c_count, COUNT(*) AS custdist FROM (
        |  SELECT c_custkey, COUNT(o_custkey) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q_tpch_q17" ->
      """WITH li AS (SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
        |              CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT) AS price_c
        |            FROM lineitem),
        |pq AS (SELECT l_partkey, COUNT(*) AS n_li,
        |         CAST(SUM(qty) AS BIGINT) AS sum_q
        |       FROM li GROUP BY l_partkey)
        |SELECT p_brand, COUNT(*) AS n_small,
        |  CAST(SUM(price_c) AS BIGINT) AS rev_small_c
        |FROM li JOIN pq USING (l_partkey)
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand IN ('Brand#12', 'Brand#23')
        |  AND 5 * qty * n_li < sum_q
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin,
    "q_radius_join" ->
      """WITH pts AS (SELECT vec_id AS id,
        |         CAST(FLOOR(CAST(embedding[1] AS DOUBLE) * 10000.0)
        |           AS BIGINT) AS xq,
        |         CAST(FLOOR(CAST(embedding[2] AS DOUBLE) * 10000.0)
        |           AS BIGINT) AS yq
        |       FROM embeddings
        |       WHERE embedding[1] IS NOT NULL AND embedding[2] IS NOT NULL),
        |c AS (SELECT id, xq, yq, xq // 1250 AS cx, yq // 1250 AS cy
        |      FROM pts),
        |off AS (SELECT dx, dy FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),
        |          (0,0),(0,1),(1,-1),(1,0),(1,1)) t(dx, dy)),
        |cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b,
        |           a.xq AS xa, a.yq AS ya, b.xq AS xb, b.yq AS yb
        |         FROM c a JOIN off ON true
        |           JOIN c b ON b.cx = a.cx + off.dx AND b.cy = a.cy + off.dy
        |         WHERE a.id < b.id)
        |SELECT id_a, id_b,
        |  (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb) AS dist_sq_q
        |FROM cand
        |WHERE (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)
        |  <= 1250 * 1250
        |ORDER BY id_a, id_b""".stripMargin,
    "q_t_closeness" ->
      """WITH gv AS (SELECT c_nationkey, c_mktsegment AS v,
        |         CAST(COUNT(*) AS BIGINT) AS c_gv
        |       FROM customer GROUP BY 1, 2),
        |gdist AS (SELECT c_mktsegment AS v, CAST(COUNT(*) AS BIGINT) AS c_v
        |         FROM customer GROUP BY 1),
        |tot AS (SELECT CAST(SUM(c_v) AS BIGINT) AS n_total FROM gdist),
        |ng AS (SELECT c_nationkey, CAST(SUM(c_gv) AS BIGINT) AS n_rows,
        |         CAST(COUNT(*) AS BIGINT) AS n_sensitive,
        |         CAST(SUM(c_v) AS BIGINT) AS cg_sum
        |       FROM gv JOIN gdist USING (v) GROUP BY 1),
        |a AS (SELECT g.c_nationkey,
        |        CAST(SUM(ABS(g.c_gv * t.n_total - gl.c_v * n.n_rows))
        |          AS BIGINT) AS a_sum
        |      FROM gv g JOIN gdist gl USING (v)
        |        JOIN ng n ON n.c_nationkey = g.c_nationkey, tot t
        |      GROUP BY 1),
        |f AS (SELECT n.c_nationkey, n.n_rows, n.n_sensitive,
        |        (1000 * (a.a_sum + n.n_rows * (t.n_total - n.cg_sum)))
        |          // (2 * n.n_rows * t.n_total) AS tvd_permille
        |      FROM ng n JOIN a ON a.c_nationkey = n.c_nationkey, tot t)
        |SELECT c_nationkey, n_rows, n_sensitive, tvd_permille,
        |  tvd_permille <= 100 AS is_close
        |FROM f ORDER BY c_nationkey""".stripMargin)
}
