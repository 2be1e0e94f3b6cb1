package graft

import graft.ops.{AssociationRules, Betweenness, ConnectedComponents, Dedup, KMeansEmbed, Multimodal, PageRank, Sessionize, ShortestPaths, Similarity, TextStats, Tokenizer}
import graft.queries.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryHelpers._

/** Driver-contract registry — statistics, sketches, evaluation metrics, everything cross-cutting.
  * One slice of [[SparkEntry.queries]]/[[SparkEntry.oracleSql]]; entries
  * moved verbatim in the r10 split (no semantic change, guarded by the
  * duplicate-key check in SparkEntry).
  */
private[graft] object StatQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_events_json" -> { (s, d) =>
      // JSON property extraction from the props column
      Tables.events(s, d)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
        .orderBy("event_type")
    },
    "q_hll_distinct" -> { (s, d) =>
      // distinct tokens per language via the mergeable HLL register
      // aggregate (functions/HllSketch.scala) — the one-pass 100 TB
      // alternative to COUNT(DISTINCT). The md5-lane hash and the
      // trailing-zero rank are pure integer math, so the REGISTERS
      // themselves reproduce in DuckDB → hash-exact oracle (estimate
      // accuracy is covered by HllSpec against exact distinct counts)
      val toks = Tables.documents(s, d)
        .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
        .withColumn("h", graft.functions.functions.hex_to_long(substring(md5(col("tok")), 1, 15)))
      toks.groupBy(col("lang"))
        .agg(graft.functions.Hll.hll_registers(col("h"), p = 6).as("regs"))
        .select(col("lang"), posexplode(col("regs")))
        .select(col("lang"), col("pos").cast("int").as("reg_idx"),
          col("col").cast("int").as("reg_val"))
        .orderBy("lang", "reg_idx")
    },
    "q_hll_rollup" -> { (s, d) =>
      // THE reason sketches earn their place at 100 TB: registers built
      // once at the finest grain (source, lang) roll up to per-source
      // and global levels by register max-MERGE over the tiny sketch
      // table — the token stream is scanned exactly once. Register
      // arithmetic is md5-integer math → hash-exact DuckDB oracle.
      val toks = Tables.documents(s, d)
        .select(col("source"), col("lang"),
          explode(split(col("text"), " ")).as("tok"))
        .withColumn("h", graft.functions.functions.hex_to_long(
          substring(md5(col("tok")), 1, 15)))
      val fine = toks.groupBy(col("source"), col("lang"))
        .agg(graft.functions.Hll.hll_registers(col("h"), p = 6).as("regs"))
        .select(col("source"), col("lang"),
          posexplode(col("regs")).as(Seq("reg_idx", "reg_val")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val bySource = fine.groupBy(col("source"), col("reg_idx"))
        .agg(max(col("reg_val")).as("reg_val"))
        .withColumn("lang", lit("ALL"))
      val global = fine.groupBy(col("reg_idx"))
        .agg(max(col("reg_val")).as("reg_val"))
        .withColumn("source", lit("ALL")).withColumn("lang", lit("ALL"))
      fine.select(col("source"), col("lang"), col("reg_idx"), col("reg_val"))
        .unionByName(bySource.select(col("source"), col("lang"),
          col("reg_idx"), col("reg_val")))
        .unionByName(global.select(col("source"), col("lang"),
          col("reg_idx"), col("reg_val")))
        .orderBy("source", "lang", "reg_idx")
    },
    "q_cdf" -> { (s, d) =>
      // empirical CDF probes per flag (inverse view of q_quantiles): the
      // permille of rows at or below each fixed price point — ONE scan,
      // conditional sums, then a probe-array explode (no per-probe rescan)
      val probes = Seq(100000L, 300000L, 500000L, 700000L, 900000L)
      val aggs = count(lit(1)).as("n") +: probes.map(p =>
        sum(when(col("v_c") <= p, 1L).otherwise(0L)).as(s"le_$p"))
      Tables.lineitem(s, d)
        .select(col("l_returnflag").as("flag"),
          floor(col("l_extendedprice") * lit(100.0)).cast("long").as("v_c"))
        .groupBy("flag")
        .agg(aggs.head, aggs.tail: _*)
        .select(col("flag"), col("n"),
          explode(array(probes.map(p => struct(lit(p).as("probe"),
            col(s"le_$p").as("n_le"))): _*)).as("e"))
        .select(col("flag"), col("e.probe").as("probe"),
          col("e.n_le").as("n_le"),
          expr("(1000 * e.n_le) div n").as("permille"))
        .orderBy("flag", "probe")
    },
    "q_outliers" -> { (s, d) =>
      // robust MAD outliers per event type (ops/Outliers): exact integer
      // order statistics (lower median, lower MAD), 3×MAD flag via
      // integer comparison — the monitoring primitive mean/stddev breaks on
      graft.ops.Outliers.madStats(
          Tables.events(s, d).select(col("event_type").as("grp"),
            floor(col("value") * lit(1000000.0)).cast("long").as("v")),
          "v", Seq("grp"))
        .orderBy("grp")
    },
    "q_kappa" -> { (s, d) =>
      // Cohen's kappa between two labeling heuristics over documents
      // (Agreement.cohensKappa): length rule vs type-token-ratio rule,
      // chance-corrected agreement in signed permille
      val rated = Tables.documents(s, d).select(
        (size(split(col("text"), " ")) >= 30).as("ra"),
        (size(array_distinct(split(col("text"), " "))) * 5 >=
          size(split(col("text"), " ")) * 3).as("rb"))
      graft.ops.Agreement.cohensKappa(rated, "ra", "rb")
    },
    "q_simpson" -> { (s, d) =>
      // Simpson source-concentration per language (Diversity
      // .simpsonIndex): the no-logarithm diversity index, exact ppm
      graft.ops.Diversity.simpsonIndex(Tables.documents(s, d),
        "lang", "source")
    },
    "q_calibration" -> { (s, d) =>
      // reliability bins of the quality score against the lang label
      // (Agreement.calibrationBins): is a 0.8-quality doc English 80%
      // of the time? Exact per-bin rates in ppm
      val scored = TextStats.withTokenStats(Tables.documents(s, d), "text")
        .select(TextStats.qualityScore.as("quality"),
          (col("lang") === "en").as("lab"))
      graft.ops.Agreement.calibrationBins(scored, "quality", "lab")
    },
    "q_set_cover" -> { (s, d) =>
      // greedy max coverage (SetCover.greedyMaxCoverage): which six
      // sources together cover the most distinct 5-grams — the
      // (1-1/e) curation pick, unrolled-oracle-exact
      // r12 OPT: gated widen — the 5-gram transform is CPU-bound per row
      // and the small single-file scan otherwise runs it in one task
      // (profiled single-task gram stages in both set-cover queries);
      // no-op at real scale. Keyed on the token array for even spread.
      val se = graft.ops.Similarity.widen(Tables.documents(s, d)
          .select(col("source").as("s"), split(col("text"), " ").as("w"))
          .where(size(col("w")) >= 5), "w")
        .select(col("s"), explode(expr(
          "transform(sequence(0, size(w) - 5), i -> " +
            "concat_ws(' ', slice(w, i + 1, 5)))")).as("el"))
      graft.ops.SetCover.greedyMaxCoverage(se, "s", "el", k = 6)
    },
    "q_kmv_error" -> { (s, d) =>
      // KMV distinct-count audit (SetSketch.distinctErrorAudit): bottom-k
      // estimator vs exact distinct token hashes per source — exact
      // integer estimator via DECIMAL(38,0) before the floor division
      val h = Tables.documents(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
        .select(col("source"), graft.functions.functions.hex_to_long(
          substring(md5(col("tok")), 1, 15)).as("h"))
      graft.ops.SetSketch.distinctErrorAudit(h, "source", "h", k = 256)
        .orderBy("source")
    },
    "q_mrr" -> { (s, d) =>
      // reciprocal rank of the true nearest neighbor inside the LSH list
      // (AnnAudit.reciprocalRank): rank quality where recall can't see it
      val e = Tables.embeddings(s, d)
      val q = e.select(col("vec_id"),
        Similarity.quantize(col("embedding")).as("qv"))
      val truth = Similarity.bruteForceTopK(q, "vec_id", "qv",
        q.where(col("vec_id") < 20), "vec_id", "qv", k = 5)
      val approx = Similarity.lshTopKPortable(e, "vec_id", "embedding",
          dim = 64, k = 5, nBits = 6, tables = 4, seed = 42L,
          queryPred = col("id") < 20) // audit pushdown: score 20 queries, not 32k
      graft.ops.AnnAudit.reciprocalRank(truth, approx)
    },
    "q_ndcg" -> { (s, d) =>
      // binary-relevance NDCG@5 of the LSH list vs the exact top-5
      // (AnnAudit.ndcgAtK): literal log2-discount ppm weights — no
      // runtime logarithm, oracle-identical in any engine
      val e = Tables.embeddings(s, d)
      val q = e.select(col("vec_id"),
        Similarity.quantize(col("embedding")).as("qv"))
      val truth = Similarity.bruteForceTopK(q, "vec_id", "qv",
        q.where(col("vec_id") < 20), "vec_id", "qv", k = 5)
      val approx = Similarity.lshTopKPortable(e, "vec_id", "embedding",
          dim = 64, k = 5, nBits = 6, tables = 4, seed = 42L,
          queryPred = col("id") < 20) // audit pushdown: score 20 queries, not 32k
      graft.ops.AnnAudit.ndcgAtK(truth, approx, k = 5)
    },
    "q_rand_index" -> { (s, d) =>
      // pair-counting clustering agreement (ops/ClusterEval): do the
      // part–supplier connected components recover the brand partition?
      // Exact contingency-sum Rand/precision/recall/purity permilles
      val comp = ConnectedComponents.components(
          Tables.partSupplierEdges(s, d))
        .where(col("node").startsWith("P"))
        .select(col("node"), col("component").as("label"))
      val brand = Tables.part(s, d).select(
        concat(lit("P"), col("p_partkey")).as("node"),
        col("p_brand").as("label"))
      graft.ops.ClusterEval.pairConfusion(comp, brand)
    },
    "q_cms_error" -> { (s, d) =>
      // Count-Min overcount histogram (FrequencySketch.errorAudit):
      // est − exact per part item over the same 4×4096 grid the
      // heavy-hitter query trusts — every error provably >= 0
      graft.ops.FrequencySketch.errorAudit(
        Tables.lineitem(s, d)
          .select(concat(lit("P"), col("l_partkey")).as("item")),
        "item", depth = 4, width = 4096)
        .orderBy("err")
    },
    "q_auc" -> { (s, d) =>
      // exact Mann–Whitney ROC-AUC per source (ops/Auc): does raw text
      // length separate English docs? Integer 2U pieces + floor permille,
      // score-cardinality-sized windows only
      graft.ops.Auc.aucByGroup(
        Tables.documents(s, d).select(col("source"),
          length(col("text")).as("score"),
          (col("lang") === "en").cast("long").as("lab")),
        "source", "score", "lab")
        .orderBy("grp")
    },
    "q_corr" -> { (s, d) =>
      // Pearson correlation matrix over lineitem measures
      // (ops/Correlation): one scan, one aggregate, exact integer
      // sufficient sums + the assortativity-discipline double coefficient
      val f = Tables.lineitem(s, d).select(
        floor(col("l_quantity")).as("qty"),
        floor(col("l_extendedprice")).as("price_usd"),
        floor(col("l_discount") * 100).as("disc_pct"),
        floor(col("l_tax") * 100).as("tax_pct"))
      graft.ops.Correlation.pairwiseCorr(f,
          Seq("qty", "price_usd", "disc_pct", "tax_pct"))
        .orderBy("col_a", "col_b")
    },
    "q_cover_budget" -> { (s, d) =>
      // budgeted greedy coverage (SetCover.greedyBudgetedCoverage):
      // best 5-gram coverage per byte under a 30%-of-corpus budget —
      // integer gain/cost ratios, shrinking-incidence rounds
      val docs = Tables.documents(s, d)
      // r12 OPT: gated widen, same rationale as q_set_cover above
      val se = graft.ops.Similarity.widen(docs
          .select(col("source").as("s"), split(col("text"), " ").as("w"))
          .where(size(col("w")) >= 5), "w")
        .select(col("s"), explode(expr(
          "transform(sequence(0, size(w) - 5), i -> " +
            "concat_ws(' ', slice(w, i + 1, 5)))")).as("el"))
      val costs = docs.groupBy(col("source").as("s"))
        .agg(sum(length(col("text"))).as("cost"))
      val budget =
        costs.agg(sum(col("cost"))).collect()(0).getLong(0) * 30L / 100L
      graft.ops.SetCover.greedyBudgetedCoverage(se, "s", "el",
        costs, "s", "cost", budget, maxPicks = 8)
    },
    "q_decision_stump" -> { (s, d) =>
      // best Gini split per cheap feature (ops/DecisionStump): which of
      // {text length, token count, avg token length} predicts lang='en'
      // best — exact integer ppm scoring, value-cardinality-sized window
      val base = Tables.documents(s, d).select(
          (col("lang") === "en").cast("long").as("lab"),
          length(col("text")).cast("long").as("f_len"),
          size(split(col("text"), " ")).cast("long").as("f_tok"))
        .withColumn("f_avg10", expr("(10 * f_len) div f_tok"))
      val f = base.selectExpr(
        "stack(3, 'len', f_len, 'n_tokens', f_tok, 'avg10', f_avg10)" +
          " as (feature, value)", "lab")
      graft.ops.DecisionStump.bestSplits(f, "feature", "value", "lab")
        .orderBy("feature")
    },
    "q_f2_sketch" -> { (s, d) =>
      // AMS F₂ sketch (ops/AmsSketch): 16 ±1-lane sums estimating the
      // user-frequency second moment, exact F₂ riding along as the
      // estimator-quality check
      graft.ops.AmsSketch.f2Lanes(Tables.events(s, d), "user_id",
        lanes = 16)
    },
    "q_kmv_sketch" -> { (s, d) =>
      // FULL STATE of the per-source KMV bottom-k distinct-token sketch
      // (functions/KmvSketch via SetSketch.kmvSketches), exploded to rows
      // — the register-compare pattern: the oracle recomputes the k
      // smallest distinct md5 lanes and every cell must match
      val h = Tables.documents(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
        .select(col("source"), graft.functions.functions.hex_to_long(
          substring(md5(col("tok")), 1, 15)).as("h"))
      graft.ops.SetSketch.kmvSketches(h, "source", "h", k = 256)
        .select(col("source"), posexplode(col("sketch")))
        .select(col("source"), (col("pos") + 1).cast("int").as("rk"),
          col("col").as("h"))
        .orderBy("source", "rk")
    },
    "q_kmv_jaccard" -> { (s, d) =>
      // pairwise source-vocabulary overlap from the SAME sketches
      // (SetSketch.pairwiseJaccard): bottom-k union sample per pair —
      // the set-intersection estimate HLL registers cannot provide
      val h = Tables.documents(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
        .select(col("source"), graft.functions.functions.hex_to_long(
          substring(md5(col("tok")), 1, 15)).as("h"))
      val sk = graft.ops.SetSketch.kmvSketches(h, "source", "h", k = 256)
      graft.ops.SetSketch.pairwiseJaccard(sk, "source", k = 256)
        .orderBy("src_a", "src_b")
    },
    "q_spearman" -> { (s, d) =>
      // Spearman rank correlation (ops/RankCorr.spearman): does a
      // customer's order FREQUENCY track their SPEND within each
      // nation? Ranks made deterministically untied by custkey
      // tiebreak; exact untied identity in ppm. The data-sized scan is
      // the customer-level pre-aggregation; the two window sorts are
      // nation-bounded
      val cust = Tables.orders(s, d).groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          sum(floor(col("o_totalprice") * lit(100.0)).cast("long"))
            .as("spend_c"))
      val withNation = cust.join(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      graft.ops.RankCorr.spearman(withNation, "c_nationkey",
        "n_orders", "spend_c", "o_custkey").orderBy("grp")
    },
    "q_kendall" -> { (s, d) =>
      // Kendall tau-a (ops/RankCorr.kendallTauA): are BUSY days also
      // HIGH-VALUE days per event type? The O(n²) pair join runs on
      // the pre-aggregated day×type series (the Auc discipline) — the
      // corpus scan is the daily rollup
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"),
          expr("ts_us div 86400000000").as("day"))
        .agg(count(lit(1)).as("n_events"),
          sum(floor(col("value") * lit(100.0)).cast("long"))
            .as("value_c"))
      graft.ops.RankCorr.kendallTauA(daily, "event_type", "day",
        "n_events", "value_c").orderBy("grp")
    },
    "q_lorenz" -> { (s, d) =>
      // Lorenz-curve deciles of the co-order degree distribution
      // (Inequality.lorenzPoints): the curve q_degree_gini integrates —
      // exact prorated value mass at each population decile
      val e = Tables.coOrderPairEdges(s, d).select("src", "dst").distinct()
      val deg = e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node")))
        .groupBy("node").agg(count(lit(1)).as("degree"))
      graft.ops.Inequality.lorenzPoints(deg, "degree", nQuantiles = 10)
        .orderBy("quantile")
    },
    "q_pareto" -> { (s, d) =>
      // per-nation Pareto frontier of customers on (order count, spend)
      // (ops/Skyline.paretoFront2D): skyline without the O(n^2)
      // dominance join — per-x max-y collapse + one distinct-x window;
      // duplicates and ties survive exactly
      val cust = Tables.orders(s, d).groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          sum(floor(col("o_totalprice") * lit(100.0)).cast("long"))
            .as("spend_c"))
      val j = cust.join(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      graft.ops.Skyline.paretoFront2D(j, "c_nationkey", "o_custkey",
        "n_orders", "spend_c").orderBy("grp", "id")
    },
    "q_isotonic" -> { (s, d) =>
      // isotonic calibration of purchase rate vs event-value bucket
      // (ops/Isotonic.fitBuckets): quantized-minimax fit over the
      // 20-bucket dimension — monotone non-decreasing by construction,
      // PAVA-free and fully oracle-replayable
      val b = Tables.events(s, d)
        .select(expr("CAST(FLOOR(value / 25.0) AS BIGINT)").as("bucket"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
      graft.ops.Isotonic.fitBuckets(b, "bucket", "n", "pos")
        .orderBy("bucket")
    },
    "q_bootstrap_ci" -> { (s, d) =>
      // subsample-bootstrap 5-95% CI of mean order value per priority
      // (ops/Bootstrap.meanCi): 20 replayable md5 half-samples, floored
      // integer replica means, percentile CI as order statistics — no
      // sqrt, no t-table, fully oracle-replayable
      graft.ops.Bootstrap.meanCi(
        Tables.orders(s, d).select(col("o_orderpriority"),
          col("o_orderkey"),
          floor(col("o_totalprice") * lit(100.0)).cast("long").as("v_c")),
        "o_orderpriority", "o_orderkey", "v_c",
        bReps = 20, loPermille = 50, hiPermille = 950).orderBy("grp")
    },
    "q_weighted_median" -> { (s, d) =>
      // exact quantity-weighted median price (cents) per return flag
      // (Quantiles.weightedMedian): cumulative window over the
      // value-AGGREGATED table, lower-median convention
      graft.ops.Quantiles.weightedMedian(
        Tables.lineitem(s, d).select(col("l_returnflag"),
          floor(col("l_extendedprice") * lit(100.0)).cast("long")
            .as("price_c"),
          col("l_quantity").cast("long").as("qty")),
        "l_returnflag", "price_c", "qty").orderBy("grp")
    },
    "q_conformal" -> { (s, d) =>
      // split-conformal calibration audit (ops/Conformal): per order
      // priority, train-mean predictor, ceil((n+1)(1-alpha)) residual
      // quantile on the calibration split, empirical coverage on test
      // (alpha = 10% -> expect ~900 permille)
      graft.ops.Conformal.splitConformalAudit(
        Tables.orders(s, d).select(col("o_orderpriority"),
          col("o_orderkey"),
          floor(col("o_totalprice") * lit(100.0)).cast("long").as("y_c")),
        "o_orderpriority", "o_orderkey", "y_c", alphaPermille = 100L)
        .orderBy("grp")
    },
    "q_benford" -> { (s, d) =>
      // Benford first-digit forensic audit (ops/Benford): do order
      // prices (in cents) follow the log10(1+1/d) first-digit law?
      // One hash agg to 9 digit rows; expected ppm is a shared LITERAL
      // CASE in both engines — no log10 at runtime
      graft.ops.Benford.firstDigitAudit(
        Tables.orders(s, d).select(
          floor(col("o_totalprice") * lit(100.0)).cast("long").as("v")),
        "v").orderBy("digit")
    })

  def oracles: Map[String, String] = Map(
    "q_events_json" ->
      """SELECT event_type, COUNT(*) AS n,
        |       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_hll_distinct" ->
      """WITH toks AS (SELECT lang, UNNEST(string_split(text, ' ')) AS tok FROM documents),
        |h AS (SELECT lang, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toks),
        |r AS (SELECT lang, CAST(h % 64 AS INT) AS idx,
        |             CASE WHEN h >> 6 = 0 THEN 55
        |                  ELSE bit_count(((h >> 6) & -(h >> 6)) - 1) + 1 END AS rho
        |      FROM h),
        |regs AS (SELECT lang, idx, MAX(rho) AS reg FROM r GROUP BY lang, idx),
        |langs AS (SELECT DISTINCT lang FROM documents)
        |SELECT l.lang, CAST(t.i AS INT) AS reg_idx,
        |       CAST(COALESCE(regs.reg, 0) AS INT) AS reg_val
        |FROM langs l CROSS JOIN range(0, 64) t(i)
        |LEFT JOIN regs ON regs.lang = l.lang AND regs.idx = t.i
        |ORDER BY l.lang, reg_idx""".stripMargin,
    "q_hll_rollup" ->
      """WITH toks AS (SELECT source, lang, UNNEST(string_split(text, ' ')) AS tok
        |              FROM documents),
        |h AS (SELECT source, lang,
        |        ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toks),
        |r AS (SELECT source, lang, CAST(h % 64 AS INT) AS idx,
        |        CASE WHEN h >> 6 = 0 THEN 55
        |             ELSE bit_count(((h >> 6) & -(h >> 6)) - 1) + 1 END AS rho
        |      FROM h),
        |grps AS (SELECT DISTINCT source, lang FROM documents
        |         UNION SELECT DISTINCT source, 'ALL' FROM documents
        |         UNION SELECT 'ALL', 'ALL'),
        |lv AS (SELECT source, lang, idx, MAX(rho) AS reg
        |       FROM r GROUP BY source, lang, idx
        |       UNION ALL
        |       SELECT source, 'ALL', idx, MAX(rho) FROM r GROUP BY source, idx
        |       UNION ALL
        |       SELECT 'ALL', 'ALL', idx, MAX(rho) FROM r GROUP BY idx)
        |SELECT g.source, g.lang, CAST(t.i AS INT) AS reg_idx,
        |       CAST(COALESCE(lv.reg, 0) AS INT) AS reg_val
        |FROM grps g CROSS JOIN range(0, 64) t(i)
        |LEFT JOIN lv ON lv.source = g.source AND lv.lang = g.lang AND lv.idx = t.i
        |ORDER BY g.source, g.lang, reg_idx""".stripMargin,
    "q_cdf" ->
      """WITH v AS (SELECT l_returnflag AS flag,
        |             CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT) AS v
        |           FROM lineitem),
        |a AS (SELECT flag, COUNT(*) AS n,
        |        CAST(COUNT(*) FILTER (WHERE v <= 100000) AS BIGINT) AS le1,
        |        CAST(COUNT(*) FILTER (WHERE v <= 300000) AS BIGINT) AS le2,
        |        CAST(COUNT(*) FILTER (WHERE v <= 500000) AS BIGINT) AS le3,
        |        CAST(COUNT(*) FILTER (WHERE v <= 700000) AS BIGINT) AS le4,
        |        CAST(COUNT(*) FILTER (WHERE v <= 900000) AS BIGINT) AS le5
        |      FROM v GROUP BY flag)
        |SELECT flag, probe, n_le, (1000 * n_le) // n AS permille FROM (
        |  SELECT flag, CAST(100000 AS BIGINT) AS probe, le1 AS n_le, n FROM a
        |  UNION ALL SELECT flag, 300000, le2, n FROM a
        |  UNION ALL SELECT flag, 500000, le3, n FROM a
        |  UNION ALL SELECT flag, 700000, le4, n FROM a
        |  UNION ALL SELECT flag, 900000, le5, n FROM a)
        |ORDER BY flag, probe""".stripMargin,
    "q_outliers" ->
      """WITH v AS (SELECT event_type AS grp,
        |             CAST(FLOOR(value * 1000000.0) AS BIGINT) AS v FROM events),
        |r AS (SELECT grp, v, ROW_NUMBER() OVER (PARTITION BY grp ORDER BY v) AS rn,
        |        COUNT(*) OVER (PARTITION BY grp) AS n FROM v),
        |med AS (SELECT grp, MIN(CASE WHEN rn = (n + 1) // 2 THEN v END) AS med
        |        FROM r GROUP BY grp),
        |dv AS (SELECT r.grp, v, n, med, ABS(v - med) AS d FROM r JOIN med USING (grp)),
        |r2 AS (SELECT grp, v, n, med, d,
        |         ROW_NUMBER() OVER (PARTITION BY grp ORDER BY d, v) AS rd FROM dv),
        |mad AS (SELECT grp, MIN(CASE WHEN rd = (n + 1) // 2 THEN d END) AS mad
        |        FROM r2 GROUP BY grp)
        |SELECT grp, COUNT(*) AS n, MIN(med) AS med, MIN(mad) AS mad,
        |  CAST(SUM(CASE WHEN d * 1 > mad * 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM r2 JOIN mad USING (grp)
        |GROUP BY grp ORDER BY grp""".stripMargin,
    "q_kappa" ->
      """WITH rated AS (SELECT
        |    len(string_split(text, ' ')) >= 30 AS a,
        |    len(list_distinct(string_split(text, ' '))) * 5 >=
        |      len(string_split(text, ' ')) * 3 AS b
        |  FROM documents),
        |agg AS (SELECT COUNT(*) AS n,
        |    CAST(SUM(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT) AS agree,
        |    CAST(SUM(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS a_pos,
        |    CAST(SUM(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT) AS b_pos
        |  FROM rated),
        |ch AS (SELECT *, a_pos * b_pos + (n - a_pos) * (n - b_pos) AS chance
        |       FROM agg),
        |nd AS (SELECT n, agree, a_pos, b_pos,
        |         n * agree - chance AS num, n * n - chance AS den
        |       FROM ch)
        |SELECT n, agree, a_pos, b_pos, num, den,
        |  CASE WHEN den = 0 THEN 0
        |       WHEN num >= 0 THEN (1000 * num) // den
        |       ELSE -((1000 * (-num)) // den) END AS kappa_permille
        |FROM nd""".stripMargin,
    "q_simpson" ->
      """WITH c AS (SELECT lang AS grp, source AS cat, COUNT(*) AS n_c
        |           FROM documents GROUP BY 1, 2),
        |g AS (SELECT grp, CAST(SUM(n_c) AS BIGINT) AS n,
        |        COUNT(*) AS n_cats,
        |        CAST(SUM(n_c * (n_c - 1)) AS BIGINT) AS pairs_same
        |      FROM c GROUP BY 1)
        |SELECT grp, n, n_cats,
        |  (1000000 * pairs_same) // (n * (n - 1)) AS simpson_ppm
        |FROM g WHERE n >= 2
        |ORDER BY grp""".stripMargin,
    "q_calibration" ->
      """WITH t AS (SELECT lang, string_split(text, ' ') AS w FROM documents),
        |s AS (SELECT lang,
        |        len(w) AS n_tokens,
        |        len(list_distinct(w)) AS n_distinct,
        |        len(list_filter(w, x -> x IN ('the','a','of','and','in'))) AS n_stop
        |      FROM t),
        |q AS (SELECT lang = 'en' AS lab,
        |        CAST(0.4 AS DOUBLE) * LEAST(CAST(n_tokens AS DOUBLE) / CAST(100.0 AS DOUBLE), CAST(1.0 AS DOUBLE))
        |        + CAST(0.4 AS DOUBLE) * (CAST(n_distinct AS DOUBLE) / n_tokens)
        |        + CAST(0.2 AS DOUBLE) * LEAST(CAST(n_stop AS DOUBLE) * CAST(5.0 AS DOUBLE) / n_tokens, CAST(1.0 AS DOUBLE))
        |        AS quality
        |      FROM s),
        |b AS (SELECT CAST(FLOOR(quality * 10) AS BIGINT) AS bin,
        |        COUNT(*) AS n,
        |        CAST(SUM(CASE WHEN lab THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
        |      FROM q GROUP BY 1)
        |SELECT bin, n, n_pos, (1000000 * n_pos) // n AS rate_ppm
        |FROM b ORDER BY bin""".stripMargin,
    "q_set_cover" ->
      s"""WITH toks AS (SELECT source, string_split(text, ' ') AS w
         |              FROM documents),
         |se AS MATERIALIZED (SELECT DISTINCT source AS s,
         |        array_to_string(w[i:i+4], ' ') AS el
         |      FROM toks, UNNEST(range(1, len(w) - 3)) AS t(i)
         |      WHERE len(w) >= 5),
         |${graft.ops.SetCover.oracleRoundCtes(6)}
         |SELECT pick, s, gain, covered_total
         |FROM coverrows ORDER BY pick""".stripMargin,
    "q_kmv_error" ->
      """WITH toks AS (SELECT source, UNNEST(string_split(text, ' ')) AS tok
        |              FROM documents),
        |h AS (SELECT DISTINCT source,
        |        ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h
        |      FROM toks),
        |ex AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_exact
        |       FROM h GROUP BY 1),
        |rk AS (SELECT source, h,
        |         ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS r
        |       FROM h),
        |kth AS (SELECT source, CAST(MAX(CASE WHEN r = 256 THEN h END)
        |          AS BIGINT) AS h_k
        |        FROM rk GROUP BY 1),
        |est AS (SELECT ex.source, n_exact,
        |          CASE WHEN n_exact < 256 THEN n_exact
        |               ELSE CAST((255 * 1152921504606846976::HUGEINT) // h_k
        |                    AS BIGINT) END AS est
        |        FROM ex JOIN kth ON kth.source = ex.source)
        |SELECT source, n_exact, est,
        |  CASE WHEN est >= n_exact
        |       THEN (1000000 * (est - n_exact)) // n_exact
        |       ELSE 0 - ((1000000 * (n_exact - est)) // n_exact)
        |       END AS err_ppm
        |FROM est ORDER BY source""".stripMargin,
    "q_mrr" ->
      s"""WITH $annAuditCtes,
         |t1 AS (SELECT query_id, neighbor_id FROM bf WHERE rank = 1)
         |SELECT t1.query_id, COALESCE(l.rank, 0) AS first_rank,
         |  CASE WHEN l.rank IS NOT NULL THEN 1000000 // l.rank
         |       ELSE 0 END AS rr_ppm
         |FROM t1 LEFT JOIN lsh l
         |  ON l.query_id = t1.query_id AND l.neighbor_id = t1.neighbor_id
         |ORDER BY t1.query_id""".stripMargin,
    "q_ndcg" ->
      s"""WITH $annAuditCtes,
         |w AS (SELECT * FROM (VALUES (1, 1000000), (2, 630929), (3, 500000),
         |                            (4, 430676), (5, 386852)) t(r, wt)),
         |g AS (SELECT a.query_id,
         |        CAST(SUM(CASE WHEN t.neighbor_id IS NOT NULL THEN w.wt
         |                      ELSE 0 END) AS BIGINT) AS dcg_ppm
         |      FROM lsh a JOIN w ON w.r = a.rank
         |      LEFT JOIN bf t ON t.query_id = a.query_id
         |                    AND t.neighbor_id = a.neighbor_id
         |      WHERE a.rank <= 5 GROUP BY 1),
         |ts AS (SELECT query_id, COUNT(*) AS nt FROM bf GROUP BY 1),
         |idcg AS (SELECT ts.query_id, CAST(SUM(w.wt) AS BIGINT) AS idcg_ppm
         |         FROM ts JOIN w ON w.r <= LEAST(nt, 5) GROUP BY 1)
         |SELECT idcg.query_id, COALESCE(dcg_ppm, 0) AS dcg_ppm, idcg_ppm,
         |  CASE WHEN idcg_ppm > 0
         |       THEN (1000000 * COALESCE(dcg_ppm, 0)) // idcg_ppm
         |       ELSE 0 END AS ndcg_ppm
         |FROM idcg LEFT JOIN g ON g.query_id = idcg.query_id
         |ORDER BY idcg.query_id""".stripMargin,
    "q_rand_index" -> ccOracle(
      """, j AS (SELECT comp.la, p.p_brand AS lb
        |      FROM (SELECT node, MIN(lab) AS la FROM cc GROUP BY node) comp
        |      JOIN part p ON comp.node = 'P' || CAST(p.p_partkey AS VARCHAR)),
        |cont AS (SELECT la, lb, COUNT(*) AS nij FROM j GROUP BY 1, 2),
        |core AS (SELECT CAST(SUM(nij) AS BIGINT) AS n_items,
        |           CAST(SUM((nij * (nij - 1)) // 2) AS BIGINT) AS tp
        |         FROM cont),
        |saa AS (SELECT CAST(SUM((na * (na - 1)) // 2) AS BIGINT) AS sa
        |        FROM (SELECT CAST(SUM(nij) AS BIGINT) AS na
        |              FROM cont GROUP BY la)),
        |sbb AS (SELECT CAST(SUM((nb * (nb - 1)) // 2) AS BIGINT) AS sb
        |        FROM (SELECT CAST(SUM(nij) AS BIGINT) AS nb
        |              FROM cont GROUP BY lb)),
        |pur AS (SELECT CAST(SUM(mx) AS BIGINT) AS pure
        |        FROM (SELECT MAX(nij) AS mx FROM cont GROUP BY la))
        |SELECT n_items, tp, sa - tp AS fp, sb - tp AS fn,
        |  (n_items * (n_items - 1)) // 2 - sa - sb + tp AS tn,
        |  CASE WHEN n_items >= 2 THEN (1000 * (tp + (n_items * (n_items - 1)) // 2 - sa - sb + tp))
        |                              // ((n_items * (n_items - 1)) // 2) END AS rand_permille,
        |  CASE WHEN sa > 0 THEN (1000 * tp) // sa END AS pair_precision_permille,
        |  CASE WHEN sb > 0 THEN (1000 * tp) // sb END AS pair_recall_permille,
        |  CASE WHEN n_items > 0 THEN (1000 * pure) // n_items END AS purity_permille
        |FROM core CROSS JOIN saa CROSS JOIN sbb CROSS JOIN pur""".stripMargin),
    "q_cms_error" ->
      """WITH js AS (SELECT CAST(UNNEST(range(0, 4)) AS INT) AS j),
        |ev AS (SELECT 'P' || CAST(l_partkey AS VARCHAR) AS item FROM lineitem),
        |evm AS (SELECT item, md5(item) AS m FROM ev),
        |h AS (SELECT js.j,
        |             ('0x' || substr(evm.m, js.j * 8 + 1, 8))::BIGINT % 4096 AS idx
        |      FROM evm CROSS JOIN js),
        |sk AS (SELECT j, idx, COUNT(*) AS cnt FROM h GROUP BY j, idx),
        |exact AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS exact
        |          FROM ev GROUP BY 1),
        |qh AS (SELECT e.item, js.j,
        |              ('0x' || substr(md5(e.item), js.j * 8 + 1, 8))::BIGINT % 4096 AS idx
        |       FROM exact e CROSS JOIN js),
        |est AS (SELECT qh.item, CAST(MIN(COALESCE(sk.cnt, 0)) AS BIGINT) AS est
        |        FROM qh LEFT JOIN sk ON sk.j = qh.j AND sk.idx = qh.idx
        |        GROUP BY qh.item)
        |SELECT est.est - exact.exact AS err, COUNT(*) AS n_items
        |FROM est JOIN exact USING (item)
        |GROUP BY 1 ORDER BY err""".stripMargin,
    "q_auc" ->
      """WITH f AS (SELECT source AS grp, CAST(LENGTH(text) AS BIGINT) AS score,
        |             CAST(lang = 'en' AS BIGINT) AS lab FROM documents),
        |g AS (SELECT grp, score, CAST(SUM(lab) AS BIGINT) AS p,
        |        CAST(COUNT(*) - SUM(lab) AS BIGINT) AS n
        |      FROM f GROUP BY 1, 2),
        |c AS (SELECT grp, p, n,
        |        CAST(SUM(n) OVER (PARTITION BY grp ORDER BY score) - n
        |          AS BIGINT) AS negbelow
        |      FROM g),
        |a AS (SELECT grp, CAST(SUM(p) AS BIGINT) AS n_pos,
        |        CAST(SUM(n) AS BIGINT) AS n_neg,
        |        CAST(SUM(p * (2 * negbelow + n)) AS BIGINT) AS u2
        |      FROM c GROUP BY 1)
        |SELECT grp, n_pos, n_neg, u2,
        |  CASE WHEN n_pos > 0 AND n_neg > 0
        |       THEN (1000 * u2) // (2 * n_pos * n_neg) END AS auc_permille
        |FROM a ORDER BY grp""".stripMargin,
    "q_corr" ->
      """WITH f AS (SELECT CAST(FLOOR(l_quantity) AS BIGINT) AS qty,
        |             CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_usd,
        |             CAST(FLOOR(l_discount * 100) AS BIGINT) AS disc_pct,
        |             CAST(FLOOR(l_tax * 100) AS BIGINT) AS tax_pct
        |           FROM lineitem),
        |o AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |        CAST(SUM(qty) AS BIGINT) AS s_qty,
        |        CAST(SUM(price_usd) AS BIGINT) AS s_price,
        |        CAST(SUM(disc_pct) AS BIGINT) AS s_disc,
        |        CAST(SUM(tax_pct) AS BIGINT) AS s_tax,
        |        CAST(SUM(qty * qty) AS BIGINT) AS q_qty,
        |        CAST(SUM(price_usd * price_usd) AS BIGINT) AS q_price,
        |        CAST(SUM(disc_pct * disc_pct) AS BIGINT) AS q_disc,
        |        CAST(SUM(tax_pct * tax_pct) AS BIGINT) AS q_tax,
        |        CAST(SUM(qty * price_usd) AS BIGINT) AS x_qty_price,
        |        CAST(SUM(qty * disc_pct) AS BIGINT) AS x_qty_disc,
        |        CAST(SUM(qty * tax_pct) AS BIGINT) AS x_qty_tax,
        |        CAST(SUM(price_usd * disc_pct) AS BIGINT) AS x_price_disc,
        |        CAST(SUM(price_usd * tax_pct) AS BIGINT) AS x_price_tax,
        |        CAST(SUM(disc_pct * tax_pct) AS BIGINT) AS x_disc_tax
        |      FROM f),
        |pairs AS (
        |  SELECT 'qty' AS col_a, 'price_usd' AS col_b, n, s_qty AS sx,
        |    s_price AS sy, x_qty_price AS sxy, q_qty AS sx2, q_price AS sy2
        |  FROM o
        |  UNION ALL SELECT 'qty', 'disc_pct', n, s_qty, s_disc, x_qty_disc,
        |    q_qty, q_disc FROM o
        |  UNION ALL SELECT 'qty', 'tax_pct', n, s_qty, s_tax, x_qty_tax,
        |    q_qty, q_tax FROM o
        |  UNION ALL SELECT 'price_usd', 'disc_pct', n, s_price, s_disc,
        |    x_price_disc, q_price, q_disc FROM o
        |  UNION ALL SELECT 'price_usd', 'tax_pct', n, s_price, s_tax,
        |    x_price_tax, q_price, q_tax FROM o
        |  UNION ALL SELECT 'disc_pct', 'tax_pct', n, s_disc, s_tax,
        |    x_disc_tax, q_disc, q_tax FROM o)
        |SELECT col_a, col_b, n, sx, sy, sxy, sx2, sy2,
        |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |  / (SQRT(GREATEST(CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)
        |       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), CAST(0 AS DOUBLE)))
        |     * SQRT(GREATEST(CAST(n AS DOUBLE) * CAST(sy2 AS DOUBLE)
        |       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE), CAST(0 AS DOUBLE))))
        |    AS corr
        |FROM pairs ORDER BY col_a, col_b""".stripMargin,
    "q_cover_budget" ->
      s"""WITH toks AS (SELECT source, string_split(text, ' ') AS w
         |              FROM documents),
         |se AS MATERIALIZED (SELECT DISTINCT source AS s,
         |        array_to_string(w[i:i+4], ' ') AS el
         |      FROM toks, UNNEST(range(1, len(w) - 3)) AS t(i)
         |      WHERE len(w) >= 5),
         |costs AS (SELECT source AS s, CAST(SUM(LENGTH(text)) AS BIGINT) AS cost
         |          FROM documents GROUP BY 1),
         |budget AS (SELECT CAST(SUM(LENGTH(text)) AS BIGINT) * 30 // 100 AS bud
         |           FROM documents),
         |${graft.ops.SetCover.oracleBudgetCtes(8)}
         |SELECT pick, s, gain, cost, ratio_ppm, spent_total, covered_total
         |FROM coverrows ORDER BY pick""".stripMargin,
    "q_decision_stump" ->
      """WITH base AS (SELECT CAST(lang = 'en' AS BIGINT) AS lab,
        |         CAST(LENGTH(text) AS BIGINT) AS f_len,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS f_tok
        |       FROM documents),
        |b2 AS (SELECT lab, f_len, f_tok, (10 * f_len) // f_tok AS f_avg10
        |       FROM base),
        |f AS (SELECT 'len' AS feature, f_len AS value, lab FROM b2
        |      UNION ALL SELECT 'n_tokens', f_tok, lab FROM b2
        |      UNION ALL SELECT 'avg10', f_avg10, lab FROM b2),
        |g AS (SELECT feature, value, COUNT(*) AS t,
        |        CAST(SUM(lab) AS BIGINT) AS p
        |      FROM f GROUP BY 1, 2),
        |cum AS (SELECT feature, value,
        |          CAST(SUM(t) OVER (PARTITION BY feature ORDER BY value)
        |            AS BIGINT) AS tl,
        |          CAST(SUM(p) OVER (PARTITION BY feature ORDER BY value)
        |            AS BIGINT) AS pl
        |        FROM g),
        |tot AS (SELECT feature, CAST(SUM(t) AS BIGINT) AS tt,
        |          CAST(SUM(p) AS BIGINT) AS pp
        |        FROM g GROUP BY 1),
        |s AS (SELECT cum.feature, value, tl, pl, tt - tl AS tr,
        |        pp - pl AS pr, tt, tl - pl AS nl,
        |        (tt - tl) - (pp - pl) AS nr
        |      FROM cum JOIN tot ON tot.feature = cum.feature
        |      WHERE tt - tl > 0),
        |sc AS (SELECT feature, value, tl, pl, tr, pr,
        |         ((tl*tl - pl*pl - nl*nl) * 1000000) // (tl * tt)
        |         + ((tr*tr - pr*pr - nr*nr) * 1000000) // (tr * tt)
        |           AS score_ppm
        |       FROM s)
        |SELECT feature, value AS split_value, score_ppm, tl AS t_left,
        |  pl AS p_left, tr AS t_right, pr AS p_right
        |FROM sc
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY feature
        |  ORDER BY score_ppm, value) = 1
        |ORDER BY feature""".stripMargin,
    "q_f2_sketch" ->
      """WITH k AS (SELECT CAST(user_id AS VARCHAR) AS k FROM events
        |           WHERE user_id IS NOT NULL),
        |s AS (SELECT lane,
        |        CAST(SUM(1 - 2 * ((('0x' || substr(md5(
        |          CAST(lane AS VARCHAR) || '#' || k), 1, 15))::BIGINT) % 2))
        |          AS BIGINT) AS lane_sum
        |      FROM k CROSS JOIN range(16) t(lane)
        |      GROUP BY lane),
        |ex AS (SELECT CAST(SUM(f * f) AS BIGINT) AS f2_exact
        |       FROM (SELECT COUNT(*) AS f FROM k GROUP BY k))
        |SELECT lane, lane_sum, lane_sum * lane_sum AS f2_est, f2_exact
        |FROM s CROSS JOIN ex
        |ORDER BY lane""".stripMargin,
    "q_kmv_sketch" ->
      """WITH h AS (SELECT DISTINCT source,
        |             ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h
        |           FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
        |                 FROM documents)),
        |r AS (SELECT source, h,
        |        ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rk
        |      FROM h)
        |SELECT source, CAST(rk AS INT) AS rk, h
        |FROM r WHERE rk <= 256
        |ORDER BY source, rk""".stripMargin,
    "q_kmv_jaccard" ->
      """WITH h AS (SELECT DISTINCT source,
        |             ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h
        |           FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
        |                 FROM documents)),
        |r AS (SELECT source, h,
        |        ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rk
        |      FROM h),
        |sk AS (SELECT source, h FROM r WHERE rk <= 256),
        |prs AS (SELECT a.source AS src_a, b.source AS src_b
        |        FROM (SELECT DISTINCT source FROM sk) a
        |        JOIN (SELECT DISTINCT source FROM sk) b ON a.source < b.source),
        |u AS (SELECT prs.src_a, prs.src_b, s.h,
        |        MAX(CASE WHEN s.source = prs.src_a THEN 1 ELSE 0 END) AS ia,
        |        MAX(CASE WHEN s.source = prs.src_b THEN 1 ELSE 0 END) AS ib
        |      FROM prs JOIN sk s ON s.source IN (prs.src_a, prs.src_b)
        |      GROUP BY 1, 2, 3),
        |ru AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY src_a, src_b ORDER BY h) AS rn
        |       FROM u),
        |bk AS (SELECT * FROM ru WHERE rn <= 256)
        |SELECT src_a, src_b, COUNT(*) AS k_eff, MAX(h) AS h_k,
        |  CAST(SUM(ia * ib) AS BIGINT) AS n_shared,
        |  (1000 * CAST(SUM(ia * ib) AS BIGINT)) // COUNT(*) AS jaccard_permille
        |FROM bk GROUP BY src_a, src_b
        |ORDER BY src_a, src_b""".stripMargin,
    "q_spearman" ->
      """WITH cust AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |         CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
        |           AS BIGINT) AS spend_c
        |       FROM orders GROUP BY 1),
        |j AS (SELECT c_nationkey AS grp, n_orders AS x, spend_c AS y,
        |        o_custkey AS k
        |      FROM cust JOIN customer ON o_custkey = c_custkey),
        |r AS (SELECT grp,
        |        CAST(ROW_NUMBER() OVER (PARTITION BY grp ORDER BY x, k)
        |          AS BIGINT) AS rx,
        |        CAST(ROW_NUMBER() OVER (PARTITION BY grp ORDER BY y, k)
        |          AS BIGINT) AS ry
        |      FROM j),
        |a AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
        |        CAST(SUM((rx - ry) * (rx - ry)) AS BIGINT) AS d2_sum
        |      FROM r GROUP BY 1)
        |SELECT grp, n, d2_sum,
        |  CASE WHEN n > 1
        |       THEN 1000000 - (6000000 * d2_sum) // (n * (n * n - 1))
        |       END AS rho_ppm
        |FROM a ORDER BY grp""".stripMargin,
    "q_kendall" ->
      """WITH daily AS (SELECT event_type AS grp,
        |         epoch_us(ts) // 86400000000 AS t,
        |         CAST(COUNT(*) AS BIGINT) AS x,
        |         CAST(SUM(CAST(FLOOR(value * 100.0) AS BIGINT))
        |           AS BIGINT) AS y
        |       FROM events GROUP BY 1, 2),
        |p AS (SELECT a.grp,
        |        CASE WHEN (b.x - a.x) * (b.y - a.y) > 0 THEN 1 ELSE 0 END
        |          AS con,
        |        CASE WHEN (b.x - a.x) * (b.y - a.y) < 0 THEN 1 ELSE 0 END
        |          AS dis,
        |        CASE WHEN (b.x - a.x) * (b.y - a.y) = 0 THEN 1 ELSE 0 END
        |          AS tie
        |      FROM daily a JOIN daily b ON a.grp = b.grp AND a.t < b.t),
        |g AS (SELECT grp, CAST(SUM(con) AS BIGINT) AS concordant,
        |        CAST(SUM(dis) AS BIGINT) AS discordant,
        |        CAST(SUM(tie) AS BIGINT) AS tied
        |      FROM p GROUP BY 1)
        |SELECT grp, concordant + discordant + tied AS n_pairs,
        |  concordant, discordant, tied,
        |  CASE WHEN concordant + discordant + tied > 0 THEN
        |    CASE WHEN concordant >= discordant
        |         THEN (1000000 * (concordant - discordant))
        |              // (concordant + discordant + tied)
        |         ELSE 0 - ((1000000 * (discordant - concordant))
        |              // (concordant + discordant + tied)) END
        |  END AS tau_a_ppm
        |FROM g ORDER BY grp""".stripMargin,
    "q_lorenz" ->
      """WITH rows0 AS (SELECT l_orderkey AS tid,
        |         'P' || CAST(l_partkey AS VARCHAR) AS item
        |       FROM lineitem WHERE l_quantity <= 15),
        |txok AS (SELECT tid FROM rows0 GROUP BY tid HAVING COUNT(*) <= 8),
        |r AS (SELECT rows0.tid, rows0.item FROM rows0 JOIN txok USING (tid)),
        |e0 AS (SELECT DISTINCT a.item AS x, b.item AS y
        |       FROM r a JOIN r b ON a.tid = b.tid AND a.item < b.item),
        |deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS v FROM
        |          (SELECT x AS node FROM e0 UNION ALL SELECT y FROM e0)
        |        GROUP BY 1),
        |g AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS c FROM deg GROUP BY 1),
        |b AS (SELECT v, c,
        |        CAST(SUM(c) OVER wd AS BIGINT) AS cumIncl,
        |        CAST(SUM(v * c) OVER wd AS BIGINT) AS cumVal
        |      FROM g WINDOW wd AS (ORDER BY v ROWS UNBOUNDED PRECEDING)),
        |t AS (SELECT MAX(cumIncl) AS n, MAX(cumVal) AS total FROM b),
        |cuts AS (SELECT CAST(q AS INT) AS quantile,
        |           (t.n * q) // 10 AS m_units, t.total
        |         FROM UNNEST(range(1, 11)) AS u(q), t)
        |SELECT quantile, m_units,
        |  COALESCE((cumVal - v * c) + v * (m_units - (cumIncl - c)), 0)
        |    AS cum_value,
        |  CASE WHEN total > 0
        |       THEN (1000 * COALESCE((cumVal - v * c)
        |            + v * (m_units - (cumIncl - c)), 0)) // total
        |       ELSE 0 END AS share_permille
        |FROM cuts LEFT JOIN b
        |  ON (cumIncl - c) < m_units AND m_units <= cumIncl
        |ORDER BY quantile""".stripMargin,
    "q_pareto" ->
      """WITH cust AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS x,
        |         CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
        |           AS BIGINT) AS y
        |       FROM orders GROUP BY 1),
        |j AS (SELECT c_nationkey AS grp, o_custkey AS id, x, y
        |      FROM cust JOIN customer ON o_custkey = c_custkey),
        |px AS (SELECT grp, x, CAST(MAX(y) AS BIGINT) AS ymax
        |       FROM j GROUP BY 1, 2),
        |f AS (SELECT grp, x, ymax FROM (
        |    SELECT grp, x, ymax,
        |      MAX(ymax) OVER (PARTITION BY grp ORDER BY x DESC
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |        AS run_strict
        |    FROM px)
        |  WHERE run_strict IS NULL OR ymax > run_strict)
        |SELECT j.grp, j.id, j.x, j.y
        |FROM j JOIN f ON f.grp = j.grp AND f.x = j.x AND f.ymax = j.y
        |ORDER BY j.grp, j.id""".stripMargin,
    "q_isotonic" ->
      """WITH b AS (SELECT CAST(FLOOR(value / 25.0) AS BIGINT) AS bucket,
        |         CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1
        |           ELSE 0 END) AS BIGINT) AS pos
        |       FROM events GROUP BY 1),
        |pre AS (SELECT bucket, n, pos,
        |         CAST(SUM(n) OVER wd AS BIGINT) AS cn,
        |         CAST(SUM(pos) OVER wd AS BIGINT) AS cp
        |       FROM b WINDOW wd AS (ORDER BY bucket
        |         ROWS UNBOUNDED PRECEDING)),
        |jk AS (SELECT pj.bucket AS j, pk.bucket AS k,
        |         ((pk.cp - (pj.cp - pj.pos)) * 1000000)
        |           // (pk.cn - (pj.cn - pj.n)) AS m_ppm
        |       FROM pre pj JOIN pre pk ON pj.bucket <= pk.bucket),
        |inn AS (SELECT b.bucket, jk.j, MIN(m_ppm) AS inner_min
        |        FROM b JOIN jk ON jk.j <= b.bucket AND jk.k >= b.bucket
        |        GROUP BY 1, 2),
        |fit AS (SELECT bucket, MAX(inner_min) AS iso_ppm FROM inn
        |        GROUP BY 1)
        |SELECT b.bucket, b.n, b.pos, (b.pos * 1000000) // b.n AS rate_ppm,
        |  fit.iso_ppm
        |FROM b JOIN fit ON fit.bucket = b.bucket ORDER BY b.bucket""".stripMargin,
    "q_bootstrap_ci" ->
      """WITH base AS (SELECT o_orderpriority AS grp,
        |         CAST(o_orderkey AS VARCHAR) AS id,
        |         CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) AS v
        |       FROM orders),
        |ov AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(v) AS BIGINT) // CAST(COUNT(*) AS BIGINT)
        |           AS mean_c
        |       FROM base GROUP BY 1),
        |reps AS (SELECT grp, b,
        |           CAST(SUM(v) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS mb
        |         FROM base, UNNEST(range(0, 20)) AS t(b)
        |         WHERE (('0x' || substr(md5('boot' || CAST(b AS VARCHAR)
        |             || ':' || id), 1, 13))::BIGINT) % 2 = 0
        |         GROUP BY 1, 2),
        |rk AS (SELECT grp, b, mb,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY grp ORDER BY mb, b)
        |           AS BIGINT) AS rk,
        |         CAST(COUNT(*) OVER (PARTITION BY grp) AS BIGINT) AS nr
        |       FROM reps),
        |lo AS (SELECT grp, mb AS ci_lo_c FROM rk
        |       WHERE rk = GREATEST((nr * 50 + 999) // 1000, 1)),
        |hi AS (SELECT grp, mb AS ci_hi_c FROM rk
        |       WHERE rk = GREATEST((nr * 950 + 999) // 1000, 1)),
        |br AS (SELECT grp, MAX(nr) AS b_reps FROM rk GROUP BY 1)
        |SELECT ov.grp, n, mean_c, b_reps, ci_lo_c, ci_hi_c
        |FROM ov JOIN br USING (grp) JOIN lo USING (grp) JOIN hi USING (grp)
        |ORDER BY ov.grp""".stripMargin,
    "q_weighted_median" ->
      """WITH base AS (SELECT l_returnflag AS grp,
        |         CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT) AS v,
        |         CAST(l_quantity AS BIGINT) AS w
        |       FROM lineitem WHERE l_quantity > 0),
        |g AS (SELECT grp, v, CAST(SUM(w) AS BIGINT) AS ws
        |      FROM base GROUP BY 1, 2),
        |c AS (SELECT grp, v, ws,
        |        CAST(SUM(ws) OVER (PARTITION BY grp ORDER BY v
        |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
        |        CAST(SUM(ws) OVER (PARTITION BY grp) AS BIGINT) AS tot
        |      FROM g)
        |SELECT grp, MAX(tot) AS total_w, MIN(v) AS wmedian
        |FROM c WHERE 2 * cum >= tot GROUP BY grp ORDER BY grp""".stripMargin,
    "q_conformal" ->
      """WITH base AS (SELECT o_orderpriority AS grp, o_orderkey AS id,
        |         CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) AS y,
        |         o_orderkey % 3 AS part
        |       FROM orders),
        |pred AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_train,
        |           CAST(SUM(y) AS BIGINT) // CAST(COUNT(*) AS BIGINT)
        |             AS pred
        |         FROM base WHERE part = 0 GROUP BY 1),
        |calr AS (SELECT b.grp, ABS(b.y - p.pred) AS resid,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY b.grp
        |      ORDER BY ABS(b.y - p.pred), b.id) AS BIGINT) AS rk,
        |    CAST(COUNT(*) OVER (PARTITION BY b.grp) AS BIGINT) AS n_cal
        |  FROM base b JOIN pred p ON p.grp = b.grp WHERE b.part = 1),
        |cal AS (SELECT grp, MAX(n_cal) AS n_cal,
        |    MAX(CASE WHEN rk = LEAST(n_cal, ((n_cal + 1) * 900 + 999) // 1000)
        |        THEN resid END) AS q_hat
        |  FROM calr GROUP BY 1)
        |SELECT b.grp, MAX(p.n_train) AS n_train, MAX(c.n_cal) AS n_cal,
        |  CAST(COUNT(*) AS BIGINT) AS n_test, MAX(p.pred) AS pred,
        |  MAX(c.q_hat) AS q_hat,
        |  (1000 * CAST(SUM(CASE WHEN ABS(b.y - p.pred) <= c.q_hat THEN 1
        |    ELSE 0 END) AS BIGINT)) // CAST(COUNT(*) AS BIGINT)
        |    AS coverage_permille
        |FROM base b JOIN pred p ON p.grp = b.grp
        |  JOIN cal c ON c.grp = b.grp
        |WHERE b.part = 2 GROUP BY b.grp ORDER BY b.grp""".stripMargin,
    "q_benford" ->
      """WITH v AS (SELECT CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) AS v
        |       FROM orders),
        |obs AS (SELECT CAST(SUBSTR(CAST(v AS VARCHAR), 1, 1) AS INT) AS digit,
        |          CAST(COUNT(*) AS BIGINT) AS n_obs
        |        FROM v WHERE v IS NOT NULL AND v > 0 GROUP BY 1),
        |d AS (SELECT CAST(UNNEST(range(1, 10)) AS INT) AS digit),
        |tot AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n_total FROM obs)
        |SELECT d.digit, CAST(COALESCE(obs.n_obs, 0) AS BIGINT) AS n_obs,
        |  CASE WHEN t.n_total > 0
        |       THEN (1000000 * COALESCE(obs.n_obs, 0)) // t.n_total
        |       ELSE 0 END AS obs_ppm,
        |  CASE d.digit WHEN 1 THEN 301029 WHEN 2 THEN 176091
        |    WHEN 3 THEN 124938 WHEN 4 THEN 96910 WHEN 5 THEN 79181
        |    WHEN 6 THEN 66946 WHEN 7 THEN 57991 WHEN 8 THEN 51152
        |    ELSE 45757 END AS exp_ppm,
        |  (CASE WHEN t.n_total > 0
        |        THEN (1000000 * COALESCE(obs.n_obs, 0)) // t.n_total
        |        ELSE 0 END)
        |  - (CASE d.digit WHEN 1 THEN 301029 WHEN 2 THEN 176091
        |      WHEN 3 THEN 124938 WHEN 4 THEN 96910 WHEN 5 THEN 79181
        |      WHEN 6 THEN 66946 WHEN 7 THEN 57991 WHEN 8 THEN 51152
        |      ELSE 45757 END) AS dev_ppm
        |FROM d LEFT JOIN obs ON obs.digit = d.digit, tot t
        |ORDER BY d.digit""".stripMargin)
}
