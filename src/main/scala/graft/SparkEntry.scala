package graft

import graft.ops.{AssociationRules, Betweenness, ConnectedComponents, Dedup, KMeansEmbed, Multimodal, PageRank, Sessionize, ShortestPaths, Similarity, TextStats, Tokenizer}
import graft.queries.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Connected components (the reference's headline operator) over a
    * part↔supplier co-purchase graph, with per-component size stats.
    */
  def entry(spark: SparkSession): DataFrame = {
    val edges = Tables.partSupplierEdges(spark, "/root/testdata/sf0.001")
    ConnectedComponents.components(edges)
      .groupBy("component").agg(count(lit(1)).as("n_nodes"))
      .orderBy("component")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
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
    "q_components" -> { (s, d) =>
      ConnectedComponents.components(Tables.partSupplierEdges(s, d))
        .orderBy("node")
    },
    "q_components_stats" -> { (s, d) =>
      ConnectedComponents.components(Tables.partSupplierEdges(s, d))
        .groupBy("component").agg(count(lit(1)).as("n_nodes"))
        .orderBy("component")
    },
    "q_components_agg" -> { (s, d) =>
      // same semantics as q_components via the one-pass Catalyst
      // union-find aggregate (canonical labels are identical)
      ConnectedComponents.componentsViaAggregate(Tables.partSupplierEdges(s, d))
        .orderBy("node")
    },
    "q_components_star" -> { (s, d) =>
      // the pure-shuffle 100 TB CC path (alternating large-star/small-star
      // contraction, O(log n) rounds, no task-local vertex state) under
      // the SAME oracle as q_components — proving the scale path computes
      // identical canonical labels, as q_shortest_path_pregel does for SSSP
      ConnectedComponents.componentsAlternatingStar(Tables.partSupplierEdges(s, d))
        .orderBy("node")
    },
    "q_assoc" -> { (s, d) =>
      // unweighted association mining over order→part transactions;
      // minConfidence=0 keeps the association graph symmetric so `pattern`
      // reduces to undirected components (SQL-checkable)
      val tx = Tables.lineitem(s, d).select(
        col("l_orderkey").as("tid"),
        concat(lit("P"), col("l_partkey")).as("item"))
      AssociationRules.graphAssociationRules(tx, "tid", "item", None,
          AssociationRules.Params(minSupport = 0.002, minConfidence = 0.0,
            maxItemsetSize = 5, weighted = false, firstAppearanceOrder = false))
        .select(col("item"), col("support"), col("lift_score"), col("pattern"))
        .orderBy("item")
    },
    "q_assoc_weighted" -> { (s, d) =>
      // weighted mode: frequency = l_quantity; exercises the per-pair
      // confidence filter and the top-5 consequent ranking (scalar digest)
      val tx = Tables.lineitem(s, d).select(
        col("l_orderkey").as("tid"),
        concat(lit("P"), col("l_partkey")).as("item"),
        col("l_quantity").as("freq"))
      AssociationRules.graphAssociationRules(tx, "tid", "item", Some("freq"),
          AssociationRules.Params(minSupport = 0.04, minConfidence = 0.5,
            maxItemsetSize = 8, weighted = true, firstAppearanceOrder = false,
            includePattern = false))
        .select(col("item"), col("support"), col("lift_score"),
          size(col("consequents")).as("n_top"),
          coalesce(element_at(col("consequents"), 1), lit("")).as("top_consequent"),
          coalesce(element_at(col("confidence_scores"), 1), lit(0.0)).as("top_confidence"))
        .orderBy("item")
    },
    "q_assoc_lists" -> { (s, d) =>
      // the top-5 consequent/confidence lists themselves — the reference's
      // own tests exercise their contents
      // (reference: tests/test_graph_solver.py:249-293). Exploded to
      // (item, rank, consequent, confidence) rows so the DuckDB oracle
      // cell-compares list CONTENT and ORDER, not just a scalar digest.
      val tx = Tables.lineitem(s, d).select(
        col("l_orderkey").as("tid"),
        concat(lit("P"), col("l_partkey")).as("item"),
        col("l_quantity").as("freq"))
      AssociationRules.graphAssociationRules(tx, "tid", "item", Some("freq"),
          AssociationRules.Params(minSupport = 0.04, minConfidence = 0.5,
            maxItemsetSize = 8, weighted = true, firstAppearanceOrder = false,
            includePattern = false))
        .select(col("item"),
          posexplode(arrays_zip(col("consequents"), col("confidence_scores"))))
        .select(col("item"), (col("pos") + 1).cast("int").as("rank"),
          col("col.consequents").as("consequent"),
          col("col.confidence_scores").as("confidence"))
        .orderBy("item", "rank")
    },
    "q_shortest_path" -> { (s, d) =>
      // all-pairs fixed-point Dijkstra over the 25-node nation graph;
      // multiple competing paths + truncating weight quantization
      ShortestPaths.allPairs(Tables.nationGraphEdges(s, d), directed = false)
        .orderBy("from", "to")
    },
    "q_shortest_path_pregel" -> { (s, d) =>
      // the 100 TB SSSP path under the driver gate: GraphX Pregel
      // multi-source relaxation — same fixed-point quantization as
      // q_shortest_path's broadcast Dijkstra, proven identical by the
      // shared recursive-CTE oracle restricted to these sources
      ShortestPaths.fromSourcesPregel(Tables.nationGraphEdges(s, d),
          sources = Seq("NATION_0", "NATION_12", "NATION_7"), directed = false)
        .orderBy("from", "to")
    },
    "q_pagerank" -> { (s, d) =>
      // reference recurrence (no dangling redistribution) on the directed
      // part→supplier graph, capped at 12 iterations with the reference's
      // L1 < 1e-6 convergence check live — this bipartite DAG hits its
      // exact fixpoint in ~3 iterations, so the check pays for itself. No
      // SQL oracle (double-precision iterative fixpoint) → driver records
      // rows-only; value goldens live in ScalaTest
      PageRank.scores(Tables.partSupplierDirectedEdges(s, d),
          damping = 0.85, maxIter = 12, tol = 1e-6)
        .orderBy("node")
    },
    "q_pagerank_fp" -> { (s, d) =>
      // fixed-point integer PageRank (damping 17/20, ×1e12 grid, 10 fixed
      // iterations): every step is integer arithmetic, so the scores are
      // bit-identical in any engine / summation order → full DuckDB oracle
      // (unrolled per-iteration CTEs), unlike the double-precision
      // q_pagerank which is rows-only
      PageRank.scoresFixedPoint(Tables.partSupplierDirectedEdges(s, d),
          iters = 10)
        .orderBy("node")
    },
    "q_ppr" -> { (s, d) =>
      // personalized PageRank: same integer recurrence, teleport onto the
      // three source parts only — random-walk proximity scores used as a
      // curation graph feature
      PageRank.pprFixedPoint(Tables.partSupplierDirectedEdges(s, d),
          sources = Seq("P1", "P2", "P3"), iters = 10)
        .orderBy("node")
    },
    "q_betweenness" -> { (s, d) =>
      // exact Brandes over the undirected nation graph, normalized;
      // no SQL oracle → rows-only + ScalaTest goldens
      Betweenness.betweennessCentrality(
          Tables.nationGraphEdges(s, d), "src", "dst",
          normalized = true, directed = false)
        .orderBy("node")
    },
    "q_betweenness_pairs" -> { (s, d) =>
      // betweenness via the pairwise σ identity with per-triple ×1e9
      // quantization — exact integer sums in any engine → full DuckDB
      // oracle (path-enumeration σ + the same FLOOR expression), unlike
      // the order-sensitive double accumulation of q_betweenness
      Betweenness.betweennessPairwiseQuantized(
          Tables.nationGraphEdges(s, d), "src", "dst", directed = false)
        .orderBy("node")
    },
    "q_dedup_exact" -> { (s, d) =>
      Dedup.exactDuplicates(Tables.documents(s, d), "doc_id", "text")
        .orderBy("text_sha")
    },
    "q_dedup_keep_best" -> { (s, d) =>
      // survivor selection by quality, not id: keeper = longest copy
      // (n_chars), ties → smallest doc_id — the curation-pipeline variant
      // of exact dedup
      Dedup.exactDedupKeepBest(Tables.documents(s, d), "doc_id", "text",
          "n_chars")
        .orderBy("text_sha")
    },
    "q_dedup_ngram" -> { (s, d) =>
      Dedup.ngramJaccardPairs(Tables.documents(s, d), "doc_id", "text",
          n = 3, threshold = 0.5)
        .orderBy("id_a", "id_b")
    },
    "q_dedup_prefix" -> { (s, d) =>
      // PPJoin-style prefix filtering: same exact pair set and scores as
      // q_dedup_ngram (the oracle SQL is literally shared) from a far
      // smaller candidate join — the 100 TB path for EXACT jaccard dedup
      Dedup.ngramJaccardPairsPrefix(Tables.documents(s, d), "doc_id", "text",
          n = 3, threshold = 0.5)
        .orderBy("id_a", "id_b")
    },
    "q_dedup_edit" -> { (s, d) =>
      // Levenshtein near-dups: shingle-blocked candidates, length
      // pre-filter, banded 3-arg levenshtein verification — catches
      // aligned small-edit dups token-set measures miss
      Dedup.editDistancePairs(Tables.documents(s, d), "doc_id", "text",
          maxDist = 20, n = 3)
        .orderBy("id_a", "id_b")
    },
    "q_dedup_passage" -> { (s, d) =>
      // sub-document dedup: per-doc count of 16-token passages repeated
      // anywhere in the corpus (boilerplate signal document-level dedup
      // cannot see)
      Dedup.passageDuplication(Tables.documents(s, d), "doc_id", "text",
          passageTokens = 16)
        .orderBy("doc_id")
    },
    "q_dedup_minhash" -> { (s, d) =>
      // MinHash(64)+LSH(16 bands) candidates, exact-Jaccard verified.
      // Portable md5 hashing → full DuckDB oracle (the xxhash64 variant
      // stays as the throughput path, recall-tested in ScalaTest)
      Dedup.minHashLshPairsPortable(Tables.documents(s, d), "doc_id", "text",
          n = 3, numHashes = 64, bands = 16, threshold = 0.5)
        .orderBy("id_a", "id_b")
    },
    "q_dedup_winnow" -> { (s, d) =>
      // winnowing fingerprints (Dedup.winnowingPairs — the MOSS
      // selection): per-doc sliding-window minimum of md5 4-gram hashes,
      // pairs mined through the fingerprint index, exact
      // fingerprint-Jaccard >= 0.5 — the fourth blocking family, with
      // the w+n-1 shared-run detection guarantee
      Dedup.winnowingPairs(Tables.documents(s, d), "doc_id", "text",
          n = 4, w = 5, threshold = 0.5)
        .orderBy("id_a", "id_b")
    },
    "q_dedup_simhash" -> { (s, d) =>
      // 64-bit SimHash from md5 halves, 4×16-bit bands (exact ≤ 3 bits by
      // pigeonhole) → full DuckDB oracle
      Dedup.simHashPairsPortable(Tables.documents(s, d), "doc_id", "text",
          maxBits = 3)
        .orderBy("id_a", "id_b")
    },
    "q_dedup_embed" -> { (s, d) =>
      // cosine near-dup over ×10000-quantized embeddings: integer dot
      // products are exact in any summation order → bit-identical to the
      // DuckDB oracle. Runs the distributed block-pair plan — no driver
      // vector collect anywhere in the plan (the broadcast variant is
      // bit-identical and auto-selected by embeddingCosinePairs below the
      // gate; this query showcases the 100 TB shape).
      val q = Tables.embeddings(s, d)
        .select(col("vec_id"), Similarity.quantize(col("embedding")).as("qv"))
      Dedup.embeddingCosinePairsBlocked(q, "vec_id", "qv", threshold = 0.3)
        .orderBy("id_a", "id_b")
    },
    "q_dedup_clusters" -> { (s, d) =>
      // the step after pair mining: near-dup pairs (portable MinHash+LSH)
      // collapsed into dedup clusters via connected components — keeper is
      // the component's min doc id; per-cluster sizes out
      val pairs = Dedup.minHashLshPairsPortable(Tables.documents(s, d),
          "doc_id", "text", n = 3, numHashes = 64, bands = 16, threshold = 0.5)
      Dedup.nearDupClusters(pairs, "id_a", "id_b")
        .groupBy(col("component").as("keeper"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("keeper")
    },
    "q_split_leakage" -> { (s, d) =>
      // train/test contamination audit (ops/SplitLeakage): deterministic
      // md5 80/20 split crossed with the MinHash+LSH near-dup pairs —
      // every cross-split pair is memorization leaking into the held-out
      // metric; one 3-row aggregate over the mined pair table
      val pairs = Dedup.minHashLshPairsPortable(Tables.documents(s, d),
          "doc_id", "text", n = 3, numHashes = 64, bands = 16, threshold = 0.5)
      graft.ops.SplitLeakage.crossSplitPairs(pairs, "id_a", "id_b",
          salt = "split", testPermille = 200)
        .orderBy("split_a", "split_b")
    },
    "q_split_leakage_cross" -> { (s, d) =>
      // streaming-monitor form of the leakage audit (SplitLeakage
      // .crossCorpusLeaks, wrapped by streaming/StreamSplitLeakage):
      // docs with doc_id % 7 == 0 play the arriving batch, the rest the
      // frozen reference corpus; every cross-split near-dup pair is a
      // leak event — shingle-index candidates, uncapped-set Jaccard
      val docs = Tables.documents(s, d)
      graft.ops.SplitLeakage.crossCorpusLeaks(
          docs.where(pmod(col("doc_id"), lit(7)) === 0),
          docs.where(pmod(col("doc_id"), lit(7)) =!= 0),
          "doc_id", "text", n = 3, threshold = 0.5)
        .orderBy("new_id", "ref_id")
    },
    "q_bm25" -> { (s, d) =>
      // BM25-shaped lexical retrieval (ops/Bm25): three fixed queries
      // against the corpus — ppm-floored Robertson-ratio idf (no libm
      // log), exact cross-multiplied tf saturation (k1=6/5, b=3/4),
      // top-10 per query via the k-slot aggregate
      import s.implicits._
      val qs = Seq((1L, "hash"), (1L, "join"), (2L, "slow"), (2L, "scan"),
        (2L, "filter"), (3L, "vector"), (3L, "data"))
        .toDF("query_id", "term")
      graft.ops.Bm25.topKDocs(Tables.documents(s, d), "doc_id", "text",
          qs, k = 10)
        .orderBy("query_id", "rank")
    },
    "q_ann_topk" -> { (s, d) =>
      // exact brute-force cosine top-5 for the first 20 vectors
      val q = Tables.embeddings(s, d)
        .select(col("vec_id"), Similarity.quantize(col("embedding")).as("qv"))
      Similarity.bruteForceTopK(q, "vec_id", "qv",
          q.where(col("vec_id") < 20), "vec_id", "qv", k = 5)
        .orderBy("query_id", "rank")
    },
    "q_ann_lsh" -> { (s, d) =>
      // hyperplane-LSH bucketed ANN (the sub-quadratic scale path).
      // Approximate vs brute force, but DETERMINISTIC given the seeded
      // integer-quantized hyperplanes — the portable variant's buckets,
      // candidates and cosines are exact integer math reproducible in
      // DuckDB → hash-exact oracle (recall vs brute force in ScalaTest)
      val e = Tables.embeddings(s, d)
      Similarity.lshTopKPortable(e, "vec_id", "embedding", dim = 64, k = 5,
          nBits = 6, tables = 4, seed = 42L)
        .orderBy("query_id", "rank")
    },
    "q_ann_multiprobe" -> { (s, d) =>
      // multi-probe LSH (Similarity.lshTopKMultiProbe): HALF the hash
      // tables of q_ann_lsh, each query also probing its nBits Hamming-1
      // buckets — the memory-for-probes trade every large ANN deployment
      // makes; candidates are a superset of same-table single-probe
      // (recall-ordering spec'd), arithmetic identical -> hash-exact
      Similarity.lshTopKMultiProbe(Tables.embeddings(s, d), "vec_id",
          "embedding", dim = 64, k = 5, nBits = 6, tables = 2, seed = 42L)
        .orderBy("query_id", "rank")
    },
    "q_ann_pq" -> { (s, d) =>
      // product-quantization ANN: per-subspace quantized-Lloyd codebooks,
      // m-byte codes, asymmetric-distance ranking — the memory-compressed
      // ANN form; all-integer distances → hash-exact oracle
      Similarity.pqTopKPortable(Tables.embeddings(s, d), "vec_id",
          "embedding", dim = 64, k = 5)
        .orderBy("query_id", "rank")
    },
    "q_ann_ivf" -> { (s, d) =>
      // IVF-cell ANN. The portable variant quantizes vectors AND the Lloyd
      // iteration itself (floor-of-mean centroids, integer distances,
      // (dist, cell) tiebreaks, literal seeded init) so the whole inverted
      // file reproduces in DuckDB → hash-exact oracle; approximate only
      // relative to brute force (recall in ScalaTest)
      val e = Tables.embeddings(s, d)
      Similarity.ivfTopKPortable(e, "vec_id", "embedding", dim = 64, k = 5,
          nCells = 16, nProbe = 4, kmeansIters = 3, sampleN = 200, seed = 42L)
        .orderBy("query_id", "rank")
    },
    "q_ann_ivfpq" -> { (s, d) =>
      // IVF-PQ (IVFADC): coarse cells restrict WHICH codes a query scores,
      // residual product codes are WHAT it scores them with — PQ's
      // sub-quadratic scale path (q_ann_pq's exhaustive ADC scan never
      // runs here); all-integer residual ADC → hash-exact oracle
      Similarity.ivfPqTopKPortable(Tables.embeddings(s, d), "vec_id",
          "embedding", dim = 64, k = 5, nCells = 16, nProbe = 4, m = 16,
          ksub = 16, candR = 50, kmeansIters = 2, sampleN = 200, seed = 42L)
        .orderBy("query_id", "rank")
    },
    "q_tokenize" -> { (s, d) =>
      // real greedy longest-match subword tokenization against the
      // explicit vocab; head_toks cell-compares the actual token SEQUENCE
      // of the first 8 words, not just counts
      Tokenizer.tokenStats(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")
    },
    "q_token_freq" -> { (s, d) =>
      // corpus-wide token frequencies — the table a BPE trainer's merge
      // step consumes; distinct-word tokenization joined back with word
      // multiplicities
      Tokenizer.tokenFrequencies(Tables.documents(s, d), "doc_id", "text")
        .orderBy("tok")
    },
    "q_token_gini" -> { (s, d) =>
      // per-source token concentration (TextStats.tokenConcentration):
      // integer HHI/Gini over whitespace-token counts — the boilerplate/
      // spam diversity screen, no libm entropy
      graft.ops.TextStats.tokenConcentration(Tables.documents(s, d),
          "source", "text")
        .orderBy("key")
    },
    "q_gopher_rules" -> { (s, d) =>
      // Gopher-style quality rule battery (ops/GopherRules): per-doc
      // integer evidence + 0/1 flags, scan-speed column algebra —
      // replace-length symbol counting, no libm, no UDF
      graft.ops.GopherRules.ruleFlags(Tables.documents(s, d),
          "doc_id", "text")
        .orderBy("id")
    },
    "q_k_anonymity" -> { (s, d) =>
      // k-anonymity audit over (nation, segment) quasi-identifiers
      // (ops/KAnonymity): one partial-aggregated groupBy, class sizes +
      // at-risk flags — the pre-release privacy hygiene check
      graft.ops.KAnonymity.classSizes(Tables.customer(s, d),
          Seq("c_nationkey", "c_mktsegment"), k = 10L)
        .orderBy("c_nationkey", "c_mktsegment")
    },
    "q_length_batches" -> { (s, d) =>
      // length-bucketed batching (Features.lengthBucketedBatches): pad-
      // waste-bounded training batches via ONE global range exchange —
      // bucket-leading sort + per-bucket offsets, no per-bucket window
      graft.ops.Features.lengthBucketedBatches(Tables.documents(s, d),
          "doc_id", "n_chars", bucketWidth = 64, batchSize = 16)
        .orderBy("id")
    },
    "q_target_encode" -> { (s, d) =>
      // smoothed target encoding of order priority against a high-value
      // flag (ops/TargetEncode): ppm integer shrinkage toward the global
      // rate, m = 20 pseudo-counts
      graft.ops.TargetEncode.encoderTable(Tables.orders(s, d),
          "o_orderpriority", col("o_totalprice") > 150000.0, smoothing = 20L)
        .orderBy("category")
    },
    "q_tfidf" -> { (s, d) =>
      // top-3 TF-IDF terms per doc over the real token stream; integer
      // per-mille idf (no ln — not oracle-portable), k-slot aggregate
      // instead of a window sort
      Tokenizer.tfidfTopTerms(Tables.documents(s, d), "doc_id", "text", k = 3)
        .orderBy("doc_id", "rank")
    },
    "q_tokenize_trained" -> { (s, d) =>
      // end-to-end: train BPE merges on the corpus, then greedy-tokenize
      // the same corpus against the LEARNED symbol inventory. The vocab
      // collect is vocabulary-sized (distinct trained symbols), limit-
      // capped — the same bounded-scalar class as the per-round argmax
      val docs = Tables.documents(s, d)
      val segs = graft.ops.BpeTrain.train(
        graft.ops.BpeTrain.corpusWords(docs, "text"), rounds = 3)._2
      val cap = 1 << 20
      val vocab = segs.select(col("sym")).distinct().limit(cap + 1)
        .collect().map(_.getString(0)).toSeq
      require(vocab.size <= cap, s"trained vocab exceeds $cap symbols")
      Tokenizer.tokenStats(docs, "doc_id", "text", vocab.sorted)
        .orderBy("doc_id")
    },
    "q_bpe_merges" -> { (s, d) =>
      // distributed BPE vocabulary training, 3 merge rounds: the learned
      // (left, right) merges with their weighted pair counts — greedy
      // leftmost non-overlapping semantics replayed by the unrolled oracle
      graft.ops.BpeTrain.train(
          graft.ops.BpeTrain.corpusWords(Tables.documents(s, d), "text"),
          rounds = 3)._1
        .orderBy("round")
    },
    "q_bpe_segments" -> { (s, d) =>
      // the corpus segmentation after those 3 merges — cell-comparing it
      // implicitly verifies every per-round argmax and merge decision
      graft.ops.BpeTrain.train(
          graft.ops.BpeTrain.corpusWords(Tables.documents(s, d), "text"),
          rounds = 3)._2
        .orderBy("w", "pos")
    },
    "q_text_stats" -> { (s, d) =>
      // integer token statistics rolled up per (lang, source); the one
      // ratio column is a single final division (deterministic)
      TextStats.withTokenStats(Tables.documents(s, d), "text")
        .groupBy(col("lang"), col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("tot_tokens"),
          sum(col("n_chars")).as("tot_chars"),
          sum(col("n_distinct")).as("tot_distinct"),
          sum(col("n_stop")).as("tot_stop"),
          sum(TextStats.bpeishTokenCount("text")).as("tot_bpe_tokens"),
          (sum(col("n_stop")).cast("double") / sum(col("n_tokens"))).as("stop_ratio"))
        .orderBy("lang", "source")
    },
    "q_lang_id" -> { (s, d) =>
      Tables.documents(s, d)
        .select(col("lang"), TextStats.langId("text").as("predicted"))
        .groupBy(col("lang"), col("predicted"))
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "predicted")
    },
    "q_rare_tokens" -> { (s, d) =>
      // corpus-frequency rarity per document (ops/TextStats
      // .rareTokenScore): tokens with document-frequency <= 2 are "rare";
      // integer counts + integer division → hash-exact oracle
      TextStats.rareTokenScore(Tables.documents(s, d), "doc_id", "text",
          rareDf = 2L)
        .orderBy("doc_id")
    },
    "q_repetition" -> { (s, d) =>
      // Gopher-style repetition filters (ops/TextStats.repetitionStats):
      // duplicate-bigram / top-bigram / duplicate-5-gram token fractions
      // per document, integer per-mille — doc-keyed shuffles only
      val docs = Tables.documents(s, d)
      val r2 = TextStats.repetitionStats(docs, "doc_id", "text", 2)
        .select(col("doc_id"), col("total_ngrams").as("total_bigrams"),
          col("dup_permille").as("dup2_permille"),
          col("top_permille").as("top2_permille"))
      val r5 = TextStats.repetitionStats(docs, "doc_id", "text", 5)
        .select(col("doc_id"), col("dup_permille").as("dup5_permille"))
      r2.join(r5, Seq("doc_id")).orderBy("doc_id")
    },
    "q_source_cap" -> { (s, d) =>
      // per-source diversity cap (Sampling.capPerStratum): ≤ 10 docs per
      // source by deterministic 52-bit md5 priority, k-slot aggregate
      graft.ops.Sampling.capPerStratum(Tables.documents(s, d),
          Seq("source"), "doc_id", cap = 10, salt = "cap")
        .orderBy("source", "rank")
    },
    "q_doc_sim" -> { (s, d) =>
      // inverted-index sparse TF-IDF cosine top-3 (ops/DocSimilarity):
      // posting-list self-join (no cross join), df-capped vectors,
      // decimal-exact squared-cosine per-mille, k-slot top-k aggregate
      graft.ops.DocSimilarity.topKSimilarDocs(Tables.documents(s, d),
          "doc_id", "text", k = 3, maxDf = 200)
        .orderBy("doc_id", "rank")
    },
    "q_decontam" -> { (s, d) =>
      // benchmark decontamination (ops/Decontaminate): deterministic
      // md5-split carves an "eval corpus" out of documents, then each
      // train doc is scored by the fraction of its 3-gram shingles that
      // collide with ANY eval n-gram (broadcast eval-side probe)
      val split = graft.ops.Sampling.hashSplit(Tables.documents(s, d),
        "doc_id", Seq("eval" -> 100, "train" -> 1000), salt = "decontam")
      val ev = split.where(col("split") === "eval")
      val train = split.where(col("split") === "train")
      graft.ops.Decontaminate.flagContaminated(train, ev, "doc_id", "text",
          n = 3, thresholdPermille = 200)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    },
    "q_fingerprint" -> { (s, d) =>
      // native codegen'd Catalyst expression (ScalaTest proves it equals
      // the column-algebra formula the oracle mirrors)
      Tables.documents(s, d)
        .select(col("doc_id"),
          graft.functions.functions.token_fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")
    },
    "q_quality" -> { (s, d) =>
      TextStats.withTokenStats(Tables.documents(s, d), "text")
        .select(col("doc_id"), TextStats.qualityScore.as("quality"))
        .orderBy("doc_id")
    },
    "q_sessionize" -> { (s, d) =>
      Sessionize.sessionStats(Tables.events(s, d), "user_id", "ts_us", "event_id",
          gapUs = 1800000000L)
        .orderBy("user_id")
    },
    "q_funnel" -> { (s, d) =>
      // ordered view→click→purchase funnel (ops/Funnel.scala): step k's
      // time is the earliest step-k event STRICTLY after step k-1's; a
      // user absent from step 1 is absent entirely. k user-keyed shuffles
      // over scan-pruned per-step subsets — no full-stream window.
      graft.ops.Funnel.userFunnel(Tables.events(s, d), "user_id", "ts_us",
          "event_type", Seq("view", "click", "purchase"))
        .orderBy("user_id")
    },
    "q_funnel_steps" -> { (s, d) =>
      // chart form: one row per step with the user count that reached it
      graft.ops.Funnel.stepCounts(Tables.events(s, d), "user_id", "ts_us",
          "event_type", Seq("view", "click", "purchase"))
        .orderBy("step")
    },
    "q_event_windows" -> { (s, d) =>
      // hourly tumbling windows per event type; value summed as exact cents
      Sessionize.tumbling(Tables.events(s, d), "ts_us", 3600000000L)
        .groupBy(col("window_start_us"), col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          (sum(floor(col("value") * lit(100.0))).cast("double") / lit(100.0)).as("sum_value"))
        .orderBy("window_start_us", "event_type")
    },
    "q_sliding_windows" -> { (s, d) =>
      // 1-hour windows hopping every 15 min (Spark's native window()
      // generator — the Structured Streaming primitive, exercised in
      // batch): each event lands in exactly 4 epoch-aligned windows
      Sessionize.sliding(Tables.events(s, d), "ts_us",
          windowUs = 3600000000L, slideUs = 900000000L)
        .groupBy(col("window_start_us"), col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          (sum(floor(col("value") * lit(100.0))).cast("double") / lit(100.0)).as("sum_value"))
        .orderBy("window_start_us", "event_type")
    },
    "q_feature_prop" -> { (s, d) =>
      // one round of GraphSAGE-style mean message passing: user-graph
      // neighbors' quantized embeddings, element-wise floor-mean
      // (ops/FeatureProp) — the core graph-ML feature workload
      graft.ops.FeatureProp.neighborMean(
          Tables.userSequenceEdges(s, d), "src", "dst",
          Tables.embeddings(s, d), "vec_id", "embedding")
        .orderBy("node", "pos")
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
    "q_rate_spikes" -> { (s, d) =>
      // hourly event-rate spikes per type: n > 2x the mean of the 3
      // previous observed hours, tested as a cross-multiplied integer
      // comparison (ops/Anomaly) — no floating-point mean anywhere
      graft.ops.Anomaly.rateSpikes(Tables.events(s, d), "ts_us",
          "event_type", windowUs = 3600000000L, lookback = 3)
        .orderBy("event_type", "window_start_us")
    },
    "q_funnel_timing" -> { (s, d) =>
      // per-step time-to-convert (n, integer mean µs, max µs from step 1)
      // in ONE aggregation pass over the per-user funnel
      graft.ops.Funnel.stepTiming(Tables.events(s, d), "user_id", "ts_us",
          "event_type", Seq("view", "click", "purchase"))
        .orderBy("step")
    },
    "q_retention" -> { (s, d) =>
      // daily cohort retention matrix (ops/Retention): cohort = day of a
      // user's first event, k = days since cohort with any activity
      graft.ops.Retention.cohortRetention(Tables.events(s, d), "user_id",
          "ts_us", periodUs = 86400000000L)
        .orderBy("cohort_start_us", "k")
    },
    "q_events_json" -> { (s, d) =>
      // JSON property extraction from the props column
      Tables.events(s, d)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
        .orderBy("event_type")
    },
    "q_asof" -> { (s, d) =>
      // native as-of join (custom LogicalPlan + Strategy + sort-merge
      // SparkPlan, plans/AsOfJoin.scala): every non-purchase event picks
      // the user's latest prior-or-equal purchase. Right side pre-agged
      // unique per (user, ts) so the as-of pick is engine-deterministic;
      // DuckDB mirrors with its native ASOF LEFT JOIN.
      val ev = Tables.events(s, d)
      // repartition by the join key BEFORE the (user_id, ts_us) groupBy:
      // hash(user_id) satisfies the aggregation's ClusteredDistribution
      // (user_id ⊂ keys) AND the as-of join's requirement, so the plan
      // carries ONE exchange on this side instead of agg-shuffle + re-shuffle
      val purchases = ev.where(col("event_type") === "purchase")
        .repartition(col("user_id"))
        .groupBy(col("user_id"), col("ts_us"))
        .agg((sum(floor(col("value") * lit(100.0))).cast("double") / lit(100.0))
          .as("p_value"))
      val others = ev.where(col("event_type") =!= "purchase")
        .select(col("event_id"), col("user_id"), col("ts_us"))
      graft.plans.AsOfJoin.asofBackward(others, purchases,
          keys = Seq("user_id"), leftTime = "ts_us", rightTime = "ts_us")
        .select(col("event_id"), col("user_id"), col("ts_us"),
          col("ts_us_r").as("purchase_ts_us"), col("p_value"))
        .orderBy("event_id")
    },
    "q_asof_fwd" -> { (s, d) =>
      // forward direction of the same as-of plan: every non-purchase event
      // picks the user's EARLIEST at-or-after purchase (e.g. "which
      // purchase did this browse lead to"); DuckDB mirrors with
      // ASOF ... ON c.ts_us <= p.ts_us
      val ev = Tables.events(s, d)
      val purchases = ev.where(col("event_type") === "purchase")
        .repartition(col("user_id"))
        .groupBy(col("user_id"), col("ts_us"))
        .agg((sum(floor(col("value") * lit(100.0))).cast("double") / lit(100.0))
          .as("p_value"))
      val others = ev.where(col("event_type") =!= "purchase")
        .select(col("event_id"), col("user_id"), col("ts_us"))
      graft.plans.AsOfJoin.asofForward(others, purchases,
          keys = Seq("user_id"), leftTime = "ts_us", rightTime = "ts_us")
        .select(col("event_id"), col("user_id"), col("ts_us"),
          col("ts_us_r").as("purchase_ts_us"), col("p_value"))
        .orderBy("event_id")
    },
    "q_asof_near" -> { (s, d) =>
      // nearest as-of: every non-purchase event picks the user's CLOSEST
      // purchase in time, either direction, ties to the earlier one —
      // same single-pass O(1)-state merge as backward/forward. DuckDB has
      // no nearest ASOF; the oracle composes its backward and forward
      // ASOF joins and replays the tie rule
      val ev = Tables.events(s, d)
      val purchases = ev.where(col("event_type") === "purchase")
        .repartition(col("user_id"))
        .groupBy(col("user_id"), col("ts_us"))
        .agg((sum(floor(col("value") * lit(100.0))).cast("double") / lit(100.0))
          .as("p_value"))
      val others = ev.where(col("event_type") =!= "purchase")
        .select(col("event_id"), col("user_id"), col("ts_us"))
      graft.plans.AsOfJoin.asofNearest(others, purchases,
          keys = Seq("user_id"), leftTime = "ts_us", rightTime = "ts_us")
        .select(col("event_id"), col("user_id"), col("ts_us"),
          col("ts_us_r").as("purchase_ts_us"), col("p_value"))
        .orderBy("event_id")
    },
    "q_chunks" -> { (s, d) =>
      // document chunking (ops/Chunker): 64-token windows, 16-token
      // overlap — pure per-row collection algebra, zero shuffles before
      // the final orderBy. Chunk text digested to md5 so the oracle
      // cell-compares every chunk's exact content
      graft.ops.Chunker.chunkByTokens(Tables.documents(s, d), "doc_id",
          "text", chunkTokens = 64, overlapTokens = 16)
        .select(col("doc_id"), col("chunk_idx"), col("n_chunk_tokens"),
          md5(col("chunk_text")).as("chunk_md5"))
        .orderBy("doc_id", "chunk_idx")
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
    "q_heavy_hitters" -> { (s, d) =>
      // Count-Min frequency estimates (ops/FrequencySketch): one pass over
      // lineitem part keys into a 4×4096 counter grid, then d lookups per
      // queried part. Counters are order-insensitive integer COUNTs and
      // the md5-lane hashing is byte-defined → sketch AND estimates are
      // hash-exact in DuckDB. Estimates never undercount (CMS guarantee,
      // proven in FrequencySketchSpec); threshold picks the heavy parts
      val events = Tables.lineitem(s, d)
        .select(concat(lit("P"), col("l_partkey")).as("item"))
      val parts = Tables.part(s, d)
        .select(concat(lit("P"), col("p_partkey")).as("item"))
      graft.ops.FrequencySketch.heavyHitters(events, parts, "item",
          depth = 4, width = 4096, threshold = 40L)
        .orderBy("item")
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
    "q_link_pred" -> { (s, d) =>
      // Resource-Allocation link prediction over the co-order part graph:
      // which part pairs are never co-ordered but share >= 2 co-order
      // neighbors. 1/deg weights quantized by integer div (×1e9) — exact
      // in any engine, unlike Adamic-Adar's libm ln(). Hot centers capped
      // at degree 64 (mirrored in the oracle), the LSH hot-bucket pattern
      graft.ops.LinkPrediction.resourceAllocation(
          Tables.coOrderPairEdges(s, d), "src", "dst",
          maxCenterDegree = 64, minCommon = 2)
        .orderBy("a", "b")
    },
    "q_communities" -> { (s, d) =>
      // deterministic synchronous label propagation on the co-order part
      // graph: 4 fixed rounds, most-frequent neighbor label with min-label
      // tie-break — the unrolled-CTE oracle replays the identical partial
      // fixpoint (q_kcore parity trick)
      graft.ops.Communities.labelPropagation(
          Tables.coOrderPairEdges(s, d), "src", "dst", rounds = 4)
        .orderBy("node")
    },
    "q_hyperball" -> { (s, d) =>
      // HyperBall ball-register state at radius 3 (ops/HyperBall): the
      // O(V·2^p) sketch path for geometric centralities — the register
      // evolution is pure integer math, so the SPARSE register table
      // itself is the oracle surface (estimates are spec-tested)
      graft.ops.HyperBall.ballRegisters(
          Tables.coOrderPairEdges(s, d), "src", "dst", rounds = 3, p = 4)
        .orderBy("node", "idx")
    },
    "q_eff_diameter" -> { (s, d) =>
      // neighborhood function + 90% effective diameter from the same
      // HyperBall register sweep as q_hyperball (ops/HyperBall
      // .effectiveDiameter): raw-HLL estimates floored to whole nodes
      // via one DECIMAL(38,0) division per node, order-independent
      // integer sums — the float-free estimator variant that joins the
      // oracle surface
      graft.ops.HyperBall.effectiveDiameter(
          Tables.coOrderPairEdges(s, d), "src", "dst", rounds = 3, p = 4)
        .orderBy("r")
    },
    "q_harmonic" -> { (s, d) =>
      // truncated harmonic centrality on the co-order part graph:
      // radius-4 BFS from a 1% md5-sampled source set, lcm-scaled exact
      // rational sums (ops/Harmonic) — fixed rounds so the unrolled
      // MATERIALIZED-CTE oracle replays the identical partial fixpoint
      graft.ops.Harmonic.harmonicCentrality(
          Tables.coOrderPairEdges(s, d), "src", "dst",
          rounds = 4, sourceRatePermille = 10, salt = "harmonic")
        .orderBy("node")
    },
    "q_lpa_weighted" -> { (s, d) =>
      // weighted label propagation (Communities.labelPropagationWeighted):
      // neighbors vote with co-occurrence weight, 3 fixed rounds over the
      // weighted co-order projection — unrolled weighted-majority oracle
      graft.ops.Communities.labelPropagationWeighted(
          graft.ops.GraphStats.bipartiteProjection(
            Tables.lineitem(s, d).where(col("l_quantity") <= 15)
              .select(col("l_orderkey").as("oid"),
                concat(lit("P"), col("l_partkey")).as("item")),
            "oid", "item", maxGroupSize = 8),
          "a", "b", "weight", rounds = 3)
        .orderBy("node")
    },
    "q_louvain_weighted" -> { (s, d) =>
      // weighted Louvain move over the weighted co-order projection
      // (Communities.modularityMoveStepWeighted): strengths replace
      // degrees, co-occurrence counts are the integer weights, LPA-2 on
      // the same pair set seeds the partition
      val proj = graft.ops.GraphStats.bipartiteProjection(
          Tables.lineitem(s, d).where(col("l_quantity") <= 15)
            .select(col("l_orderkey").as("oid"),
              concat(lit("P"), col("l_partkey")).as("item")),
          "oid", "item", maxGroupSize = 8)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      graft.ops.Communities.modularityMoveStepWeighted(proj, "a", "b",
          "weight",
          graft.ops.Communities.labelPropagation(proj, "a", "b", rounds = 2))
        .orderBy("node")
    },
    "q_bipartite_proj" -> { (s, d) =>
      // weighted bipartite projection (GraphStats.bipartiteProjection):
      // orders × parts → co-order item pairs with co-occurrence weights,
      // memberships deduped, 8-item group cap BEFORE any pair blowup
      graft.ops.GraphStats.bipartiteProjection(
          Tables.lineitem(s, d).where(col("l_quantity") <= 15)
            .select(col("l_orderkey").as("oid"),
              concat(lit("P"), col("l_partkey")).as("item")),
          "oid", "item", maxGroupSize = 8)
        .orderBy("a", "b")
    },
    "q_coreness" -> { (s, d) =>
      // FULL k-core decomposition in one run (ops/Coreness): h-index
      // fixpoint, 4 fixed rounds — upper-bounding partial fixpoint both
      // engines replay exactly; windowless h-index via zip_with/least
      graft.ops.Coreness.hIndexRounds(Tables.coOrderPairEdges(s, d),
          "src", "dst", rounds = 4)
        .orderBy("node")
    },
    "q_kcore" -> { (s, d) =>
      // k-core of the co-order part graph: exactly 8 synchronized peeling
      // rounds (ops/KCore) — fixed rounds so the unrolled-CTE oracle
      // computes the identical partial fixpoint (the q_pagerank_fp parity
      // trick); KCoreSpec proves fixed-rounds == true fixpoint when the
      // round count covers the peel depth
      graft.ops.KCore.kCore(Tables.coOrderPairEdges(s, d), "src", "dst",
          k = 3, iters = 8)
        .orderBy("node")
    },
    "q_triangles" -> { (s, d) =>
      // per-part triangle participation in the co-order graph (parts
      // co-occurring in an order are linked; low-quantity lineitems only
      // and orders capped at 8 items so clique blowup is bounded — same
      // guardrail as association mining; MEASURED on the unguarded graph
      // by tools/TriFullBench: 1.20M edges, 5.65M participations, 21.1 s
      // at sf0.1/local[32] — feasible, just no extra oracle coverage).
      // Degree-ordered orientation emits each triangle once
      graft.ops.Triangles.perNodeCounts(Tables.coOrderPairEdges(s, d),
          "src", "dst")
        .orderBy("node")
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
    "q_scc" -> { (s, d) =>
      // strongly connected components of the directed user-journey graph
      // (ops/Scc.scala): mutual-reachability classes via forward/backward
      // min-label peeling — all shuffle algebra, no driver graph state
      graft.ops.Scc.components(Tables.userSequenceEdges(s, d))
        .orderBy("node")
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
    "q_interval_overlap" -> { (s, d) =>
      // interval×interval banded overlap join: user sessions (gap-based
      // intervals) against the wall-clock hours they span. Exactly-once by
      // the first-band-of-intersection rule; hour-wide bands
      val ev = Tables.events(s, d)
      val sess = Sessionize.sessionize(ev, "user_id", "ts_us", "event_id",
          gapUs = 1800000000L)
        .groupBy(col("user_id"), col("session_no"))
        .agg(min(col("ts_us")).as("s_start"), max(col("ts_us")).as("s_end"))
      val hours = Sessionize.tumbling(ev, "ts_us", 3600000000L)
        .select(col("window_start_us")).distinct()
        .withColumn("h_end", col("window_start_us") + lit(3599999999L))
      graft.ops.RangeJoin.intervalOverlap(sess, "s_start", "s_end",
          hours, "window_start_us", "h_end", bandWidth = 3600000000.0)
        .select(col("user_id"), col("session_no"), col("window_start_us"))
        .orderBy("user_id", "session_no", "window_start_us")
    },
    "q_curate" -> { (s, d) =>
      // full curation pipeline: exact dedup → ngram near-dedup → quality
      // gate → language id; every stage is engine-portable so the whole
      // pipeline has a composed DuckDB oracle
      graft.ops.Curation.curate(Tables.documents(s, d), "doc_id", "text",
          minQuality = 0.3, jaccardThreshold = 0.5, shingleSize = 3)
        .select(col("doc_id"), col("quality"), col("lang_pred"))
        .orderBy("doc_id")
    },
    "q_multimodal" -> { (s, d) =>
      // binary-asset pipeline: pack → partition-wise (stubbed) decode →
      // feature extraction → per-kind/format rollup. The decode stub
      // derives metadata from md5(payload) (byte-defined), so the rollup
      // hash-matches a DuckDB oracle mirroring the same formulas
      val assets = Multimodal.decodeAssets(
        Multimodal.packAssets(Tables.documents(s, d), "doc_id", "text"))
      Multimodal.extractFeatures(assets, dim = 8)
        .groupBy(col("kind"), col("meta.format").as("format"))
        .agg(count(lit(1)).as("n_assets"),
          sum(col("meta.width").cast("long")).as("tot_width"),
          sum(length(col("payload")).cast("long")).as("tot_bytes"))
        .orderBy("kind", "format")
    },
    "q_multimodal_imageio" -> { (s, d) =>
      // REAL image decode through the AssetDecoder boundary: synthesize a
      // tiny constant-gray PNG per doc (dims + gray derived from doc_id by
      // formula), decode with pure-JVM javax.imageio, report the DECODED
      // width/height/format/luma. The oracle re-derives the formula from
      // doc_id alone — it matches only if the PNG encode→decode round
      // trip really happened (no stub involved)
      import s.implicits._
      val ids = Tables.documents(s, d)
        .select(col("doc_id").cast("long")).as[Long]
      val assets = ids.mapPartitions(_.map { id =>
        val w = (1 + id % 16).toInt
        val h = (1 + (id / 16) % 16).toInt
        val gray = (id % 256).toInt
        (id, "image", Multimodal.syntheticPng(w, h, gray))
      }).toDF("asset_id", "kind", "payload")
      Multimodal.decodeAssetsWithStats(assets, Multimodal.ImageIoDecoder)
        .select(col("asset_id"), col("width"), col("height"), col("format"),
          expr("luma_sum div n_pixels").as("gray"))
        .orderBy("asset_id")
    },
    "q_multimodal_ann" -> { (s, d) =>
      // the full multimodal story in ONE plan: binary payloads →
      // partition-wise decode → portable md5-lane features → bucketed
      // hyperplane-LSH ANN top-3. Every stage is byte-defined, so the
      // whole pipeline hash-matches a DuckDB oracle.
      val assets = Multimodal.decodeAssets(
        Multimodal.packAssets(Tables.documents(s, d), "doc_id", "text"))
      val feats = Multimodal.extractFeaturesPortable(assets, dim = 8)
        .select(col("asset_id"), col("features"))
      Similarity.lshTopKPortable(feats, "asset_id", "features", dim = 8,
          k = 3, nBits = 4, tables = 2, seed = 42L)
        .orderBy("query_id", "rank")
    },
    "q_kmeans" -> { (s, d) =>
      // fully distributed Lloyd (per-partition k×dim partial stats, only
      // the merged sums reach the driver — the 100 TB shape, unlike the
      // sample-based Lloyd inside q_ann_ivf). Integer-quantized vectors,
      // floorDiv centroid updates, (dist, cluster) argmin ties → the
      // whole 2-iteration fit + final assignment is hash-exact vs the
      // unrolled-CTE DuckDB oracle.
      KMeansEmbed.assignments(Tables.embeddings(s, d), "vec_id",
          "embedding", k = 8, iters = 2)
        .orderBy("vec_id")
    },
    "q_kmeans_fps" -> { (s, d) =>
      // farthest-point (deterministic k-means++-style) seeding: spreads
      // the initial centroids instead of taking the k smallest ids —
      // k-1 extra broadcast-map + top-1 corpus passes, same distributed
      // Lloyd machinery after
      KMeansEmbed.assignments(Tables.embeddings(s, d), "vec_id",
          "embedding", k = 4, iters = 1, farthestPoint = true)
        .orderBy("vec_id")
    },
    "q_semdedup" -> { (s, d) =>
      // SemDeDup (Abbas et al. 2023): k-means partition, then exact
      // cosine dedup only WITHIN a cluster — Σ|cell|² pair work instead
      // of n². A vector is a dup iff a smaller-id same-cluster vector
      // clears the cosine threshold.
      KMeansEmbed.semDedup(Tables.embeddings(s, d), "vec_id", "embedding",
          k = 8, iters = 2, threshold = 0.35)
        .orderBy("vec_id")
    },
    "q_novelty" -> { (s, d) =>
      // first-occurrence 3-gram novelty per document — the per-doc "is
      // this fresh content or boilerplate" curation signal; no pair join,
      // two shingle-keyed shuffles (ops/TextStats.noveltyScores)
      TextStats.noveltyScores(Tables.documents(s, d), "doc_id", "text", n = 3)
        .orderBy("doc_id")
    },
    "q_multimodal_resize" -> { (s, d) =>
      // pack → decode → aspect-preserving integer resize into a 256×256
      // box (audio passthrough, payload truncated by area ratio) →
      // per-kind/format rollup of the post-resize dims and bytes
      val assets = Multimodal.decodeAssets(
        Multimodal.packAssets(Tables.documents(s, d), "doc_id", "text"))
      Multimodal.resizeAssets(assets, maxW = 256, maxH = 256)
        .groupBy(col("kind"), col("meta.format").as("format"))
        .agg(count(lit(1)).as("n_assets"),
          sum(col("meta.width").cast("long")).as("tot_width"),
          sum(col("meta.height").cast("long")).as("tot_height"),
          sum(length(col("payload")).cast("long")).as("tot_bytes"))
        .orderBy("kind", "format")
    },
    "q_domain_affinity" -> { (s, d) =>
      // DSIR-style importance signal with target = English docs: exact
      // cross-multiplied likelihood-ratio test on md5-hashed bigram
      // buckets (no logs — integer-exact), affinity = permille of a
      // doc's features in target-affine buckets (ops/DomainAffinity)
      graft.ops.DomainAffinity.score(Tables.documents(s, d), "doc_id",
          "text", targetPred = col("lang") === "en")
        .orderBy("doc_id")
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
    "q_transitions" -> { (s, d) =>
      // Markov next-event transition matrix per user sequence
      // (ops/Transitions): counts + integer per-mille probabilities,
      // |types|^2 output table however large the stream
      graft.ops.Transitions.eventTransitions(Tables.events(s, d),
          "user_id", "ts_us", "event_type", "event_id")
        .orderBy("from_type", "to_type")
    },
    "q_scd2" -> { (s, d) =>
      // SCD2 change capture (ops/ChangeCapture): compress each user's
      // event-type stream into versioned validity intervals — the
      // lakehouse MERGE-maintained dimension derived from the raw log
      graft.ops.ChangeCapture.stateIntervals(Tables.events(s, d),
          "user_id", "ts_us", "event_type", "event_id")
        .orderBy("user_id", "version")
    },
    "q_interval_merge" -> { (s, d) =>
      // gaps-and-islands (ops/Intervals): merge each user's 30-minute
      // activity intervals into maximal islands, integer-µs windows
      graft.ops.Intervals.coalesceIntervals(Tables.events(s, d),
          "user_id", "ts_us", "event_id", durUs = 1800000000L)
        .orderBy("user_id", "island_idx")
    },
    "q_decay_counts" -> { (s, d) =>
      // half-life decayed per-type activity (ops/Decay): dyadic 2^-age
      // weights over hourly windows — recency score in exact integer
      // arithmetic, reference time = latest observed window
      graft.ops.Decay.decayedCounts(Tables.events(s, d), "ts_us",
          "event_type", windowUs = 3600000000L, maxAge = 20)
        .orderBy("event_type")
    },
    "q_keywords" -> { (s, d) =>
      // top-3 rarity-weighted keywords per document (TextStats.keywords):
      // integer tf·(1e6 div df) scoring, ranked by the k-slot string
      // top-k aggregate instead of a window sort over every token row
      graft.ops.TextStats.keywords(Tables.documents(s, d),
          "doc_id", "text", k = 3)
        .orderBy("doc_id", "rank")
    },
    "q_jaccard_links" -> { (s, d) =>
      // neighborhood-Jaccard link scores over the co-order part graph —
      // the normalized companion of q_link_pred's RA index, same wedge
      // plan and degree-64 center cap, exact integer per-mille
      graft.ops.LinkPrediction.neighborJaccard(
          Tables.coOrderPairEdges(s, d), "src", "dst",
          maxCenterDegree = 64, minCommon = 2)
        .orderBy("a", "b")
    },
    "q_bipartite" -> { (s, d) =>
      // per-component 2-colorability of the (undirected) user-journey
      // graph via the parity-doubling reduction to connected components
      // (ops/Bipartite) — two CC runs, no new fixpoint machinery
      graft.ops.Bipartite.bipartiteComponents(
          Tables.userSequenceEdges(s, d), "src", "dst")
        .orderBy("component")
    },
    "q_user_paths" -> { (s, d) =>
      // top user journeys (ops/Paths): first-5-event-type path strings
      // counted across users — the Sankey/flow table, bounded collect
      // buffers (row_number <= maxLen filter runs before the agg)
      graft.ops.Paths.userPaths(Tables.events(s, d), "user_id", "ts_us",
          "event_id", "event_type", maxLen = 5)
        .orderBy("path", "depth")
    },
    "q_hard_negatives" -> { (s, d) =>
      // contrastive hard-negative mining (Similarity.hardNegatives):
      // top-5 most-similar DIFFERENT-label vectors per query — broadcast
      // query batch, one corpus scan, k-slot top-k aggregate
      val e = Tables.embeddings(s, d).select(col("vec_id"),
        graft.ops.Similarity.quantize(col("embedding")).as("qv"), col("label"))
      graft.ops.Similarity.hardNegatives(e, "vec_id", "qv", "label",
          e.where(col("vec_id") < 20), k = 5)
        .orderBy("query_id", "rank")
    },
    "q_pagerank_weighted" -> { (s, d) =>
      // edge-weighted integer fixed-point PageRank: walk mass leaves each
      // part proportional to floor(l_quantity) per supplier edge — the
      // weighted member of the q_pagerank_fp family, same unrolled oracle
      PageRank.weightedScoresFixedPoint(
          Tables.lineitem(s, d).select(
            concat(lit("P"), col("l_partkey")).as("src"),
            concat(lit("S"), col("l_suppkey")).as("dst"),
            col("l_quantity").as("w")),
          "w", iters = 10)
        .orderBy("node")
    },
    "q_degree_dist" -> { (s, d) =>
      // degree histogram of the co-order part graph (ops/GraphStats)
      graft.ops.GraphStats.degreeHistogram(
          Tables.coOrderPairEdges(s, d), "src", "dst")
        .orderBy("degree")
    },
    "q_assortativity" -> { (s, d) =>
      // Newman degree assortativity as one row of integer sufficient
      // statistics + the double coefficient derived from their casts
      graft.ops.GraphStats.degreeAssortativity(
          Tables.coOrderPairEdges(s, d), "src", "dst")
    },
    "q_modularity" -> { (s, d) =>
      // modularity of the 4-round LPA partition over the same graph —
      // exact integer fraction Σ(4m·e_c − d_c²) / 4m² plus the quotient.
      // The co-order derivation (groupBy + double explode over lineitem)
      // feeds BOTH the modularity edge side and LPA — persist so it runs
      // once (breaks even at sf0.1 where materialization ≈ recompute; at
      // corpus scale recompute is a second full lineitem pass)
      val edges = Tables.coOrderPairEdges(s, d)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      graft.ops.GraphStats.modularity(edges, "src", "dst",
        graft.ops.Communities.labelPropagation(edges, "src", "dst", rounds = 4))
    },
    "q_temporal_reach" -> { (s, d) =>
      // time-respecting earliest arrival over temporal user edges from a
      // 10% md5-sampled source set, 4 fixed relaxation rounds
      // (ops/TemporalReach) — static reachability overcounts diffusion
      val te = Tables.userTemporalEdges(s, d)
      val nodes = te.select(col("src").as("node"))
        .union(te.select(col("dst").as("node"))).distinct()
      graft.ops.TemporalReach.earliestArrival(te, "src", "dst", "t",
          graft.ops.Sampling.hashSample(nodes, "node", 100, "treach"),
          rounds = 4)
        .orderBy("s", "node")
    },
    "q_mixture" -> { (s, d) =>
      // training-mixture sampling (ops/Mixture): 50/30/20 target shares
      // over three sources, 30-row budget — per-source per-mille rates
      // from quota arithmetic, identity-hash acceptance, others dropped
      graft.ops.Mixture.mixSample(Tables.documents(s, d), "doc_id", "source",
          Seq("src0" -> 500, "src1" -> 300, "src2" -> 200),
          totalTarget = 30L, salt = "mix")
        .select(col("doc_id"), col("source"), col("rate_permille"))
        .orderBy("doc_id")
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
    "q_attribution" -> { (s, d) =>
      // last-touch conversion attribution over a 7-day lookback
      // (ops/Attribution) — the temporal pick runs through the custom
      // as-of physical plan (strict backward + tolerance), not a pair join
      graft.ops.Attribution.lastTouch(Tables.events(s, d), "user_id",
          "ts_us", "event_type", "purchase", "value",
          lookbackUs = 7L * 86400000000L)
        .orderBy("touch_type")
    },
    "q_collocations" -> { (s, d) =>
      // document-level token collocation lift (ops/Collocations):
      // integer sufficient stats + double lift, df-capped pairing
      graft.ops.Collocations.collocations(Tables.documents(s, d),
          "doc_id", "text", maxDf = 400L, minPairCount = 20L)
        .orderBy("x", "y")
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
    "q_matching" -> { (s, d) =>
      // distributed greedy maximal matching on the co-order part graph
      // (ops/Matching): md5 edge priorities, 6 local-minimum rounds —
      // the "merge each near-dup pair once" symmetry breaker
      graft.ops.Matching.greedyMatching(Tables.coOrderPairEdges(s, d),
          "src", "dst", rounds = 6, salt = "match")
        .orderBy("x", "y")
    },
    "q_event_ngrams" -> { (s, d) =>
      // length-3 event-type sequence counts per user stream
      // (Transitions.eventNgrams) — sequential pattern mining input,
      // one entity-keyed window for all leads, |types|^3 count table
      graft.ops.Transitions.eventNgrams(Tables.events(s, d), "user_id",
          "ts_us", "event_type", "event_id", n = 3)
        .orderBy("ngram")
    },
    "q_multimodal_dedup" -> { (s, d) =>
      // thumbnail-level exact asset dedup (Multimodal.dedupAssets):
      // payloads packed from the 40-char text prefix stand in for sampled
      // first-frame thumbnails — identical bytes collapse to the smallest
      // asset id, digest-keyed shuffle carries no payloads
      val thumbs = Multimodal.packAssets(
        Tables.documents(s, d).select(col("doc_id"),
          substring(col("text"), 1, 40).as("text")),
        "doc_id", "text")
      Multimodal.dedupAssets(thumbs).orderBy("digest")
    },
    "q_snapshot_diff" -> { (s, d) =>
      // snapshot diff (ops/Diff): per-part shipped totals as of two
      // cutoffs — one full-outer key join classifies added/changed keys
      // (the change-data audit primitive; integer value columns)
      def snap(cut: String) = Tables.lineitem(s, d)
        .where(col("l_shipdate") < to_timestamp(lit(cut)))
        .groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n_items"),
          sum(floor(col("l_quantity")).cast("long")).as("sum_qty"))
      graft.ops.Diff.diffSnapshots(snap("1998-01-01"), snap("1999-01-01"),
          Seq("l_partkey"), Seq("n_items", "sum_qty"))
        .orderBy("l_partkey")
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
    "q_random_walks" -> { (s, d) =>
      // node2vec-style walk sampling (ops/RandomWalks): 4-step
      // hash-guided walks from the 40 lexicographically-smallest users of
      // the journey graph — deterministic "coin" via the md5 identity-hash
      // contract, one frontier⋈edges join + map-side argmin per step
      val e = Tables.userSequenceEdges(s, d)
      val seeds = e.select("src").distinct().orderBy("src").limit(40)
      graft.ops.RandomWalks.walks(e, "src", "dst", seeds, "src", steps = 4)
        .orderBy("walk_id", "step")
    },
    "q_mst" -> { (s, d) =>
      // distributed Borůvka minimum spanning forest (ops/SpanningForest)
      // on the nation graph with md5-derived DISTINCT integer weights —
      // distinctness makes the MSF unique, so the DuckDB oracle can run
      // Prim (a different greedy) and provably land on the same edge set
      val e = Tables.nationGraphEdges(s, d)
        .select(least(col("src"), col("dst")).as("x"),
          greatest(col("src"), col("dst")).as("y"))
        .distinct()
        .withColumn("w", graft.functions.functions.hex_to_long(
          substring(md5(concat(lit("mst"), col("x"), lit("|"), col("y"))), 1, 12)))
      graft.ops.SpanningForest.minimumSpanningForest(e, "x", "y", "w")
        .select("x", "y", "w").orderBy("x", "y")
    },
    "q_eccentricity" -> { (s, d) =>
      // per-node eccentricity (max finite shortest-path distance) on the
      // weighted nation graph — same ×1000-truncating APSP engine as
      // q_shortest_path, folded with one max; unreachable pairs stay out.
      // allPairs emits each undirected pair once (from < to), so the max
      // folds over BOTH endpoints; distances are symmetric
      val ap = ShortestPaths
        .allPairs(Tables.nationGraphEdges(s, d), directed = false)
      ap.select(col("from").as("node"), col("distance"))
        .union(ap.select(col("to").as("node"), col("distance")))
        .groupBy("node")
        .agg(max(col("distance")).as("ecc"))
        .orderBy("node")
    },
    "q_ktruss" -> { (s, d) =>
      // 4-truss of the co-order part graph (ops/Truss): iterative
      // triangle-support peeling on the degree-oriented wedge plan —
      // 6 rounds is past the fixpoint at this SF (oracle unrolls the same
      // 6; the monotone peel makes early-stable == full-unroll)
      graft.ops.Truss.kTruss(Tables.coOrderPairEdges(s, d), "src", "dst",
          k = 4, maxRounds = 6)
        .orderBy("x", "y")
    },
    "q_skipgrams" -> { (s, d) =>
      // word2vec training-pair extraction (ops/Skipgrams): forward
      // window-2 (center, context) counts over the corpus, one doc-keyed
      // window for all leads + one map-side-combined count
      graft.ops.Skipgrams.skipgramCounts(Tables.documents(s, d), "doc_id",
          "text", window = 2, minCount = 20L)
        .orderBy("center", "context")
    },
    "q_clustering_coef" -> { (s, d) =>
      // local clustering coefficient (Triangles.clusteringCoefficients)
      // on the co-order part graph — integer-permille portable score
      graft.ops.Triangles.clusteringCoefficients(
          Tables.coOrderPairEdges(s, d), "src", "dst")
        .orderBy("node")
    },
    "q_dedup_contain" -> { (s, d) =>
      // containment near-dup (Dedup.containmentPairs): catches short-doc-
      // inside-long-doc duplication that Jaccard structurally misses
      Dedup.containmentPairs(Tables.documents(s, d), "doc_id", "text",
          n = 3, thresholdPermille = 800L)
        .orderBy("id_a", "id_b")
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
    "q_split_strata" -> { (s, d) =>
      // exact-fraction 80/20 stratified split (ops/Splits): every
      // (lang, source) stratum gets exactly floor(0.8n) train rows,
      // ranked by the replayable md5 permutation
      graft.ops.Splits.stratifiedSplit(
          Tables.documents(s, d).select("doc_id", "lang", "source"),
          "doc_id", Seq("lang", "source"), trainNum = 4, trainDen = 5)
        .select("doc_id", "lang", "source", "split")
        .orderBy("doc_id")
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
    "q_mis" -> { (s, d) =>
      // Luby maximal independent set (ops/IndependentSet) on the co-order
      // part graph — the node-side dual of q_matching's symmetry breaking;
      // 6 rounds is past the fixpoint at this SF (unrolled-oracle parity)
      graft.ops.IndependentSet.maximalIndependentSet(
          Tables.coOrderPairEdges(s, d), "src", "dst", rounds = 6)
        .orderBy("node")
    },
    "q_label_noise" -> { (s, d) =>
      // label-noise detection: for each of the first 500 vectors, how many
      // of its 10 nearest neighbors (exact cosine over the shared ×10000
      // quantization) share its label — minority agreement flags a suspect
      // label. The label-QA pass of an embedding-classifier pipeline;
      // the LSH/IVF ANN variants are the documented scale path for the
      // neighbor search.
      val emb = Tables.embeddings(s, d)
      val q = emb.select(col("vec_id"),
        Similarity.quantize(col("embedding")).as("qv"))
      val topk = Similarity.bruteForceTopK(q, "vec_id", "qv",
        q.where(col("vec_id") < 500), "vec_id", "qv", k = 10)
      val lab = emb.select(col("vec_id"), col("label"))
      topk
        .join(lab.select(col("vec_id").as("query_id"),
          col("label").as("q_label")), "query_id")
        .join(lab.select(col("vec_id").as("neighbor_id"),
          col("label").as("n_label")), "neighbor_id")
        .groupBy(col("query_id"), col("q_label"))
        .agg(sum(when(col("n_label") === col("q_label"), 1L).otherwise(0L))
            .as("n_agree"),
          count(lit(1)).as("k_found"))
        .withColumn("suspect", col("n_agree") * 2 < col("k_found"))
        .orderBy("query_id")
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
    "q_trend" -> { (s, d) =>
      // per-type OLS value drift (ops/Trend): exact integer sufficient
      // sums (day-scaled x, micro-unit y), identically-rounded double
      // slope — the data-drift monitoring primitive
      graft.ops.Trend.groupTrends(Tables.events(s, d), "event_type",
          "ts_us", "value")
        .orderBy("grp")
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
    "q_lm_score" -> { (s, d) =>
      // CCNet-style LM quality scoring (ops/LmScore): bigram model
      // trained on the lang='en' slice, every document scored by its mean
      // conditional bigram probability in ppm — integer-exact (no logs),
      // model join is a plain bigram-keyed shuffle (model size unbounded)
      graft.ops.LmScore.score(Tables.documents(s, d), "doc_id", "text",
          col("lang") === "en")
        .orderBy("doc_id")
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
    "q_autocorr" -> { (s, d) =>
      // lag-1 autocorrelation of daily event counts per type
      // (Trend.lagAutocorr): integer sufficient sums, correctly-rounded
      // IEEE sqrt/divide for the final r — the seasonality probe
      graft.ops.Trend.lagAutocorr(Tables.events(s, d), "event_type",
          "ts_us")
        .orderBy("grp")
    },
    "q_decontam_embed" -> { (s, d) =>
      // embedding-space decontamination (Decontaminate.embedOverlap):
      // eval = the vec_id % 97 == 0 slice (broadcast), corpus streams
      // through one scan of codegen ArrayDot cosines; quantized vectors
      // make dot/norms exact so the doubles hash-match the oracle
      val q = Tables.embeddings(s, d)
        .select(col("vec_id"), Similarity.quantize(col("embedding")).as("qv"))
      graft.ops.Decontaminate.embedOverlap(q, "vec_id", "qv",
          q.where(pmod(col("vec_id"), lit(97L)) === 0L), "vec_id", "qv",
          threshold = 0.25)
        .orderBy("id")
    },
    "q_reciprocity" -> { (s, d) =>
      // directed-graph reciprocity of the user-journey graph
      // (GraphStats.reciprocity): two shuffles of the distinct edge set,
      // one-row output
      graft.ops.GraphStats.reciprocity(
        Tables.userSequenceEdges(s, d), "src", "dst")
    },
    "q_butterflies" -> { (s, d) =>
      // bipartite butterfly (2x2 biclique) count over the part-supplier
      // graph (ops/Butterflies): co-neighbor pair counts via the bounded
      // collect_list wedge plan, hub guard at wedge degree 64
      graft.ops.Butterflies.globalCount(
        Tables.partSupplierEdges(s, d), "src", "dst", maxWedgeDegree = 64)
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
    "q_hits" -> { (s, d) =>
      // HITS hubs & authorities (ops/Hits): two exact integer a/h
      // rounds over the directed user-journey graph — a_1 is in-degree,
      // the unrolled-CTE oracle replays every walk count bit for bit
      graft.ops.Hits.hubsAuthorities(Tables.userSequenceEdges(s, d),
          "src", "dst", iterations = 2)
        .orderBy("node")
    },
    "q_bridges" -> { (s, d) =>
      // bridge edges of the undirected user-journey graph (ops/Bridges):
      // gated local Tarjan under the cap, BFS-forest XOR-labeling
      // distributed path above it — the oracle re-derives every bridge
      // by per-edge-removal reachability
      graft.ops.Bridges.bridges(Tables.userSequenceEdges(s, d),
        "src", "dst")
    },
    "q_articulation" -> { (s, d) =>
      // articulation points of the same graph (Bridges.articulationPoints,
      // gated local Tarjan): the oracle re-derives each one by per-node
      // removal — BFS from one neighbor must reach every other neighbor
      graft.ops.Bridges.articulationPoints(Tables.userSequenceEdges(s, d),
        "src", "dst")
    },
    "q_2ecc" -> { (s, d) =>
      // 2-edge-connected components (Bridges.twoEdgeConnectedComponents):
      // drop every bridge, CC-label what survives — min-member labels,
      // bridge-stranded nodes become singletons
      graft.ops.Bridges.twoEdgeConnectedComponents(
        Tables.userSequenceEdges(s, d), "src", "dst")
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
    "q_source_overlap" -> { (s, d) =>
      // source-level corpus overlap (ops/SourceOverlap): df-capped
      // 5-gram inverted index rolled up to source pairs — which feeds
      // mirror each other, in containment permille of the smaller side
      graft.ops.SourceOverlap.pairOverlap(Tables.documents(s, d),
        "source", "text", n = 5, maxDf = 16)
    },
    "q_coloring" -> { (s, d) =>
      // Jones–Plassmann greedy coloring (ops/Coloring): md5-priority
      // parallel rounds, mex colors, 12-round truncation replayed
      // exactly by the unrolled oracle
      graft.ops.Coloring.greedyColoring(Tables.userSequenceEdges(s, d),
        "src", "dst", rounds = 12)
    },
    "q_wl_colors" -> { (s, d) =>
      // 1-WL color refinement (ops/WlRefinement): 3 rounds of
      // (own color, sorted neighbor multiset) hashing — structural
      // fingerprints; the oracle replays each round via string_agg
      graft.ops.WlRefinement.wlColors(Tables.userSequenceEdges(s, d),
        "src", "dst", rounds = 3)
    },
    "q_euler" -> { (s, d) =>
      // Eulerian feasibility per component (GraphChecks.eulerian):
      // degree parity + CC, no traversal
      graft.ops.GraphChecks.eulerian(Tables.userSequenceEdges(s, d),
        "src", "dst")
    },
    "q_rich_club" -> { (s, d) =>
      // rich-club profile of the co-order graph (GraphChecks.richClub):
      // hub-to-hub density per degree threshold in exact permille
      graft.ops.GraphChecks.richClub(Tables.coOrderPairEdges(s, d),
        "src", "dst", maxK = 16)
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
    "q_temporal_triangles" -> { (s, d) =>
      // cyclic temporal triangles (ops/TemporalMotifs): u→v→w→u with
      // strictly increasing times inside a 6h window — information-flow
      // loops, not static structure
      graft.ops.TemporalMotifs.cyclicTriangles(
        Tables.userTemporalEdges(s, d), "src", "dst", "t",
        windowUs = 21600000000L)
    },
    "q_simpson" -> { (s, d) =>
      // Simpson source-concentration per language (Diversity
      // .simpsonIndex): the no-logarithm diversity index, exact ppm
      graft.ops.Diversity.simpsonIndex(Tables.documents(s, d),
        "lang", "source")
    },
    "q_centroid_shift" -> { (s, d) =>
      // embedding drift between labels (EmbedStats.centroidShift):
      // exact integer centroid sums, portable dot/sqrt cosine
      graft.ops.EmbedStats.centroidShift(Tables.embeddings(s, d),
        "label", "embedding")
    },
    "q_cascade" -> { (s, d) =>
      // threshold cascade (ops/Cascade): md5-sampled seeds, activate at
      // >= 2 active neighbors, 6 synchronous rounds replayed by the
      // generated unrolled oracle
      graft.ops.Cascade.thresholdCascade(Tables.userSequenceEdges(s, d),
        "src", "dst", k = 2, seedPermille = 100, rounds = 6)
    },
    "q_wl_components" -> { (s, d) =>
      // per-component 1-WL signatures: structurally indistinguishable
      // components share wl_sig — distributed isomorphism screening.
      // Input: the five per-event-type journey graphs, node-namespaced
      // so each type is its own component family
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("ts_us"), col("event_id"))
      val typed = Tables.events(s, d).where(col("value") < 2.0)
        .withColumn("nxt", lead(col("user_id"), 1).over(w))
        .where(col("nxt").isNotNull && col("nxt") =!= col("user_id"))
        .select(concat(col("event_type"), lit(":"), col("user_id")).as("src"),
          concat(col("event_type"), lit(":"), col("nxt")).as("dst"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val wl = graft.ops.WlRefinement.wlColors(typed, "src", "dst",
        rounds = 3)
      val cc = graft.ops.ConnectedComponents.components(typed)
      val sig = wl.join(cc, Seq("node"))
        .groupBy("component")
        .agg(count(lit(1)).as("n_nodes"),
          md5(concat_ws(",", sort_array(collect_list(col("wl_color")))))
            .as("wl_sig"))
      val iso = sig.groupBy("wl_sig").agg(count(lit(1)).as("n_isomorphic"))
      sig.join(iso, Seq("wl_sig"))
        .select(col("component"), col("n_nodes"), col("wl_sig"),
          col("n_isomorphic"))
        .orderBy("component")
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
    "q_blocking_quality" -> { (s, d) =>
      // blocking-quality audit (ops/BlockingQuality): does SimHash band
      // blocking retain the trigram-Jaccard>=0.5 truth pairs, and how
      // much of the all-pairs work does it eliminate?
      val docs = Tables.documents(s, d)
      graft.ops.BlockingQuality.evaluate(
        graft.ops.Dedup.simHashBandCandidates(docs, "doc_id", "text"),
        graft.ops.Dedup.ngramJaccardPairs(docs, "doc_id", "text",
          n = 3, threshold = 0.5),
        docs)
    },
    "q_seq_patterns" -> { (s, d) =>
      // gapped sequential patterns up to length 3 (SeqMining
      // .frequentSequences): greedy-earliest subsequence containment,
      // support = distinct users, min support 50
      graft.ops.SeqMining.frequentSequences(Tables.events(s, d),
        "user_id", "event_type", "ts_us", minSupport = 50L)
    },
    "q_densest" -> { (s, d) =>
      // Charikar densest-subgraph peeling over the co-order graph
      // (DensestSubgraph.peelProfile): all-integer density comparisons,
      // best round flagged, gated local replay of the identical rounds
      graft.ops.DensestSubgraph.peelProfile(Tables.coOrderPairEdges(s, d),
        "src", "dst", maxRounds = 24)
    },
    "q_set_cover" -> { (s, d) =>
      // greedy max coverage (SetCover.greedyMaxCoverage): which six
      // sources together cover the most distinct 5-grams — the
      // (1-1/e) curation pick, unrolled-oracle-exact
      val se = Tables.documents(s, d)
        .select(col("source").as("s"), split(col("text"), " ").as("w"))
        .where(size(col("w")) >= 5)
        .select(col("s"), explode(expr(
          "transform(sequence(0, size(w) - 5), i -> " +
            "concat_ws(' ', slice(w, i + 1, 5)))")).as("el"))
      graft.ops.SetCover.greedyMaxCoverage(se, "s", "el", k = 6)
    },
    "q_conductance" -> { (s, d) =>
      // per-community cut quality (GraphStats.conductance): brand
      // partition of the co-purchase graph, φ in exact permille —
      // inner-join labeled edges, community-keyed integer aggregate
      val labels = Tables.part(s, d).select(
        concat(lit("P"), col("p_partkey")).as("node"),
        col("p_brand").as("community"))
      graft.ops.GraphStats.conductance(Tables.coOrderPairEdges(s, d),
          "src", "dst", labels)
        .orderBy("community")
    },
    "q_canonicalize" -> { (s, d) =>
      // cluster → canonical record consensus (Dedup.canonicalize): the
      // post-dedup election — longest member wins (tie min id), majority
      // language, absorption accounting; min-struct argmax throughout
      val docs = Tables.documents(s, d)
      val pairs = Dedup.minHashLshPairsPortable(docs, "doc_id", "text",
        n = 3, numHashes = 64, bands = 16, threshold = 0.5)
      Dedup.canonicalize(docs, "doc_id", "text", "lang", "source",
          Dedup.nearDupClusters(pairs, "id_a", "id_b"))
        .orderBy("cluster")
    },
    "q_degree_gini" -> { (s, d) =>
      // exact Gini of the co-order degree distribution (ops/Inequality):
      // is connectivity concentrated in a few hub parts? Lorenz rank-sum
      // identity, window only over the aggregated degree-value table
      // coOrderPairEdges emits one pair PER CO-ORDER; the degree
      // distribution is over the simple graph, so dedup first
      val e = Tables.coOrderPairEdges(s, d).select("src", "dst").distinct()
      val deg = e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node")))
        .groupBy("node").agg(count(lit(1)).as("degree"))
      graft.ops.Inequality.giniExact(deg, "degree")
    },
    "q_target_leakage" -> { (s, d) =>
      // leave-one-out leakage audit of the mean encoder
      // (TargetEncode.looLeakageAudit) over a HIGH-cardinality category
      // (custkey): small categories with big LOO gaps are memorized
      // labels, not features
      graft.ops.TargetEncode.looLeakageAudit(Tables.orders(s, d),
          "o_custkey", col("o_totalprice") > 150000.0, smoothing = 20L)
        .orderBy("category")
    },
    "q_ann_recall2" -> { (s, d) =>
      // recall@5 of the OTHER two index families vs exact brute force
      // (AnnAudit.recallAtK): IVF and PQ side by side — with q_ann_recall
      // every approximate index in the engine is recall-audited
      val e = Tables.embeddings(s, d)
      val q = e.select(col("vec_id"),
        Similarity.quantize(col("embedding")).as("qv"))
      val truth = Similarity.bruteForceTopK(q, "vec_id", "qv",
        q.where(col("vec_id") < 20), "vec_id", "qv", k = 5)
      val ivf = Similarity.ivfTopKPortable(e, "vec_id", "embedding",
          dim = 64, k = 5, nCells = 16, nProbe = 4, kmeansIters = 3,
          sampleN = 200, seed = 42L)
        .where(col("query_id") < 20)
      val pq = Similarity.pqTopKPortable(e, "vec_id", "embedding",
          dim = 64, k = 5)
        .where(col("query_id") < 20)
      graft.ops.AnnAudit.recallAtK(truth, ivf)
        .withColumn("method", lit("ivf"))
        .unionByName(graft.ops.AnnAudit.recallAtK(truth, pq)
          .withColumn("method", lit("pq")))
        .orderBy("method", "query_id")
    },
    "q_ann_recall_ivfpq" -> { (s, d) =>
      // recall@5 of the composed IVF-PQ index vs exact brute force — the
      // audit the verdict asked to sit alongside q_ann_recall2, closing
      // the loop on PQ's sub-quadratic path (accuracy, not just shape)
      val e = Tables.embeddings(s, d)
      val q = e.select(col("vec_id"),
        Similarity.quantize(col("embedding")).as("qv"))
      val truth = Similarity.bruteForceTopK(q, "vec_id", "qv",
        q.where(col("vec_id") < 20), "vec_id", "qv", k = 5)
      val ivfpq = Similarity.ivfPqTopKPortable(e, "vec_id", "embedding",
          dim = 64, k = 5, nCells = 16, nProbe = 4, m = 16, ksub = 16,
          candR = 50, kmeansIters = 2, sampleN = 200, seed = 42L)
        .where(col("query_id") < 20)
      graft.ops.AnnAudit.recallAtK(truth, ivfpq).orderBy("query_id")
    },
    "q_topk_drift" -> { (s, d) =>
      // week-over-week top-10 part churn (Trend.topKChurn): leaderboard
      // Jaccard via k-slot string aggregates — the drift alarm per-item
      // counts bury
      graft.ops.Trend.topKChurn(
        Tables.lineitem(s, d).select(
          // NTZ parquet timestamp: cast through the (UTC-pinned) session
          // zone, same µs values as DuckDB's epoch_us
          expr("unix_micros(cast(l_shipdate as timestamp)) div 604800000000")
            .as("wk"),
          concat(lit("P"), col("l_partkey")).as("item")),
        "wk", "item", k = 10)
        .orderBy("period")
    },
    "q_kmeans_distortion" -> { (s, d) =>
      // per-cluster distortion rollup of the distributed Lloyd fit:
      // SSE / max / floored mean of the exact integer distances — the
      // "is k right" audit next to q_kmeans's assignments
      KMeansEmbed.assignments(Tables.embeddings(s, d), "vec_id",
          "embedding", k = 8, iters = 2)
        .groupBy("cluster")
        .agg(count(lit(1)).as("n_vecs"), sum(col("dist")).as("sse"),
          max(col("dist")).as("max_dist"))
        .withColumn("mean_dist", expr("sse div n_vecs"))
        .orderBy("cluster")
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
    "q_centralization" -> { (s, d) =>
      // Freeman degree centralization of the co-order graph
      // (GraphStats.degreeCentralization): how star-like is it, in exact
      // integer pieces + floor permille
      graft.ops.GraphStats.degreeCentralization(
        Tables.coOrderPairEdges(s, d), "src", "dst")
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
          dim = 64, k = 5, nBits = 6, tables = 4, seed = 42L)
        .where(col("query_id") < 20)
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
          dim = 64, k = 5, nBits = 6, tables = 4, seed = 42L)
        .where(col("query_id") < 20)
      graft.ops.AnnAudit.ndcgAtK(truth, approx, k = 5)
    },
    "q_minhash_error" -> { (s, d) =>
      // MinHash estimator audit (Dedup.minHashEstimateAudit): matching-
      // lane estimate vs exact shingle Jaccard over all pairs of the
      // first 40 docs — completes the sketch trust-but-verify family
      graft.ops.Dedup.minHashEstimateAudit(
        Tables.documents(s, d).where(col("doc_id") < 40),
        "doc_id", "text", n = 3, numHashes = 64)
        .orderBy("id_a", "id_b")
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
    "q_ks_drift" -> { (s, d) =>
      // two-sample Kolmogorov–Smirnov drift (ops/KsTest): how far apart
      // are the en vs non-en text-length distributions — exact
      // cross-multiplied CDF gap, window over the aggregated value table
      graft.ops.KsTest.twoSample(
        Tables.documents(s, d).select((col("lang") === "en").as("in_a"),
          length(col("text")).as("value")),
        "in_a", "value")
    },
    "q_ks_sketch" -> { (s, d) =>
      // bounded-state KS (KsTest.twoSampleSketch): the same en vs non-en
      // drift question through TWO deterministic bottom-k md5-lane
      // samples — the O(k)-state form StreamKsDrift emits per window;
      // oracle replays the identical sample and gap
      graft.ops.KsTest.twoSampleSketch(
        Tables.documents(s, d).select((col("lang") === "en").as("in_a"),
          length(col("text")).as("value")),
        "in_a", "value", k = 128)
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
    "q_cliques4" -> { (s, d) =>
      // per-part 4-clique participation (ops/Cliques4): the densification
      // step past triangles — triangleList (gated local replay inside)
      // expanded along the highest corner, two semi-joins close the pairs
      graft.ops.Cliques4.perNodeCounts(Tables.coOrderPairEdges(s, d),
          "src", "dst")
        .orderBy("node")
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
    "q_ann_recall" -> { (s, d) =>
      // recall@5 audit of the LSH index vs exact brute force
      // (ops/AnnAudit): per-query hit counts over the two k-bounded
      // lists — the trust-but-verify step before shipping an ANN index
      val e = Tables.embeddings(s, d)
      val q = e.select(col("vec_id"),
        Similarity.quantize(col("embedding")).as("qv"))
      val truth = Similarity.bruteForceTopK(q, "vec_id", "qv",
        q.where(col("vec_id") < 20), "vec_id", "qv", k = 5)
      val approx = Similarity.lshTopKPortable(e, "vec_id", "embedding",
          dim = 64, k = 5, nBits = 6, tables = 4, seed = 42L)
        .where(col("query_id") < 20)
      graft.ops.AnnAudit.recallAtK(truth, approx)
    },
    "q_stationary" -> { (s, d) =>
      // Markov stationary distribution (Transitions.stationary
      // Distribution): closed chain over event types, 6 integer
      // fixed-point rounds, gated local replay of the |types|² matrix
      graft.ops.Transitions.stationaryDistribution(Tables.events(s, d),
        "user_id", "ts_us", "event_type", "event_id", rounds = 6)
    },
    "q_cover_budget" -> { (s, d) =>
      // budgeted greedy coverage (SetCover.greedyBudgetedCoverage):
      // best 5-gram coverage per byte under a 30%-of-corpus budget —
      // integer gain/cost ratios, shrinking-incidence rounds
      val docs = Tables.documents(s, d)
      val se = docs
        .select(col("source").as("s"), split(col("text"), " ").as("w"))
        .where(size(col("w")) >= 5)
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
    "q_rrf_fusion" -> { (s, d) =>
      // reciprocal-rank fusion (ops/RankFusion) of two ANN scorers over
      // the same query batch: exact cosine top-20 + inner-product top-20,
      // fused by integer 1e6 div (60 + rank) — k-slot aggregates, no
      // window sorts anywhere
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), Similarity.quantize(col("embedding")).as("qv"))
      val queries = emb.where(col("vec_id") < 20)
      val ra = Similarity.bruteForceTopK(emb, "vec_id", "qv",
        queries, "vec_id", "qv", k = 20)
      val rb = graft.ops.RankFusion.innerProductTopK(emb, "vec_id", "qv",
        queries, "vec_id", "qv", k = 20)
      graft.ops.RankFusion.reciprocalRankFusion(Seq(ra, rb), k0 = 60,
          topK = 5)
        .orderBy("query_id", "rank")
    },
    "q_chi2_tokens" -> { (s, d) =>
      // χ² token–language association (ops/ChiSquare): which tokens
      // predict lang='en'? φ² in exact ppm via digit-carried long
      // division — the feature-selection pass of a quality classifier
      graft.ops.ChiSquare.tokenLabel(
        Tables.documents(s, d).select(
          split(col("text"), " ").as("toks"),
          (col("lang") === "en").as("label")),
        "toks", "label")
    },
    "q_feature_hash" -> { (s, d) =>
      // signed feature hashing (ops/FeatureHash): 64-bucket hashing-
      // trick vectors per document, no vocabulary state anywhere
      graft.ops.FeatureHash.hashFeatures(
          Tables.documents(s, d).select(col("doc_id"),
            split(col("text"), " ").as("toks")),
          "doc_id", "toks", bits = 6)
        .orderBy("doc_id", "bucket")
    },
    "q_f2_sketch" -> { (s, d) =>
      // AMS F₂ sketch (ops/AmsSketch): 16 ±1-lane sums estimating the
      // user-frequency second moment, exact F₂ riding along as the
      // estimator-quality check
      graft.ops.AmsSketch.f2Lanes(Tables.events(s, d), "user_id",
        lanes = 16)
    },
    "q_cusum" -> { (s, d) =>
      // CUSUM changepoint (ops/Changepoint): the day each event type's
      // daily rate shifted — n·S_i drift maximized in exact integers
      // over the dimension-sized daily series
      val daily = Tables.events(s, d)
        .select(col("event_type").as("grp"),
          expr("ts_us div 86400000000").as("day"))
        .groupBy("grp", "day").agg(count(lit(1)).as("cnt"))
      graft.ops.Changepoint.cusumMaxShift(daily, "grp", "day", "cnt")
        .orderBy("grp")
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
    "q_scc_condense" -> { (s, d) =>
      // condensation DAG of the user-journey graph (Scc.condensationEdges):
      // distinct inter-SCC edges — the acyclic quotient topological passes
      // run on
      graft.ops.Scc.condensationEdges(Tables.userSequenceEdges(s, d))
        .orderBy("scc_src", "scc_dst")
    },
    "q_topo_layers" -> { (s, d) =>
      // longest-path topological layers of the nation DAG
      // (TopoSort.longestPathLayers): frontier relaxation rounds = DAG
      // depth, pure shuffle algebra, loud cycle guard
      graft.ops.TopoSort.longestPathLayers(
          Tables.nationGraphEdges(s, d), "src", "dst")
        .orderBy("node")
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
    "q_dedup_snm" -> { (s, d) =>
      // sorted-neighborhood dedup (Dedup.sortedNeighborhoodPairs): the
      // third blocking family — text-prefix sort key, rank window 8,
      // exact 3-gram Jaccard on the O(N*w) candidates
      Dedup.sortedNeighborhoodPairs(Tables.documents(s, d), "doc_id",
          "text", window = 8, n = 3, thresholdPermille = 500)
        .orderBy("id_a", "id_b")
    },
    "q_latest_state" -> { (s, d) =>
      // per-user latest-state compaction (the upsert/materialized view of
      // an event log) WITHOUT a window sort: max over (ts, event_id,
      // payload...) structs — one partial-aggregated shuffle, the struct
      // comparison never reaches the payload fields because (ts_us,
      // event_id) is unique
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(max(struct(col("ts_us"), col("event_id"), col("event_type"),
            col("value"))).as("m"),
          count(lit(1)).as("n_events"))
        .select(col("user_id"), col("m.ts_us").as("last_ts_us"),
          col("m.event_id").as("last_event_id"),
          col("m.event_type").as("last_type"),
          col("m.value").as("last_value"), col("n_events"))
        .orderBy("user_id")
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
    "q_merge_upsert" -> { (s, d) =>
      // MERGE INTO emulation (ops/Merge): a deterministic change batch
      // (updates %7, deletes %11, inserts at key+1000000 for %13) applied
      // to the customer snapshot in one full-outer join
      val base = Tables.customer(s, d)
        .select(col("c_custkey").as("k"), col("c_mktsegment").as("seg"),
          floor(col("c_acctbal") * lit(100.0)).cast("long").as("bal_c"))
      val updates = base.where(pmod(col("k"), lit(7L)) === 0L)
        .select(col("k"), lit("U").as("op"), col("seg"),
          (col("bal_c") + 10000L).as("bal_c"))
      val deletes = base.where(pmod(col("k"), lit(11L)) === 0L &&
          pmod(col("k"), lit(7L)) =!= 0L)
        .select(col("k"), lit("D").as("op"), col("seg"), col("bal_c"))
      val inserts = base.where(pmod(col("k"), lit(13L)) === 0L)
        .select((col("k") + 1000000L).as("k"), lit("I").as("op"),
          lit("NEW").as("seg"), lit(0L).as("bal_c"))
      graft.ops.Merge.applyChanges(base, "k",
          updates.union(deletes).union(inserts), "op", Seq("seg", "bal_c"))
        .orderBy("k")
    },
    "q_louvain_move" -> { (s, d) =>
      // one synchronous Louvain move step over the LPA-4 partition
      // (Communities.modularityMoveStep): exact integer ΔQ comparison,
      // argmax via min-struct — deterministic unlike sequential Louvain
      graft.ops.Communities.lpaLouvain(Tables.coOrderPairEdges(s, d),
          "src", "dst", lpaRounds = 4, moveRounds = 1)
        .orderBy("node")
    },
    "q_louvain" -> { (s, d) =>
      // multi-round synchronous Louvain (Communities.lpaLouvain, VERDICT
      // r7 item 6): LPA-4 init, then TWO move rounds, each re-scoring
      // every node against the previous round's partition — the
      // unrolled-CTE oracle replays both rounds exactly; one derivation
      // pass feeds both replays
      graft.ops.Communities.lpaLouvain(Tables.coOrderPairEdges(s, d),
          "src", "dst", lpaRounds = 4, moveRounds = 2)
        .orderBy("node")
    },
    "q_louvain_hier" -> { (s, d) =>
      // multi-level Louvain (Communities.louvainHier, VERDICT r8 item 5):
      // LPA-4 + two node-move rounds, contract communities into
      // supernodes, one weighted move round on the contracted graph,
      // project back — adopted only when the exact integer modularity on
      // the ORIGINAL graph does not decrease (guarded acceptance)
      graft.ops.Communities.louvainHier(Tables.coOrderPairEdges(s, d),
          "src", "dst", lpaRounds = 4, moveRounds = 2, hierMoveRounds = 1)
        .orderBy("node")
    },
    "q_simrank" -> { (s, d) =>
      // SimRank structural similarity on the directed nation graph
      // (ops/SimRank): recursive "similar in-neighbors" measure on the
      // ppm integer grid, 3 floored rounds, sparse nonzero pairs only —
      // unrolled-CTE oracle replays every round exactly
      graft.ops.SimRank.simRank(
          Tables.nationGraphEdges(s, d), "src", "dst", iters = 3)
        .orderBy("node_a", "node_b")
    },
    "q_katz" -> { (s, d) =>
      // Katz centrality on the user-journey graph (ops/Katz): integer
      // fixed-point on a 1e9 grid, alpha = 1/8 (max in-degree 5 -> safe
      // geometric bound), 6 iterations unrolled in the oracle
      graft.ops.Katz.centralityFixedPoint(
          Tables.userSequenceEdges(s, d))
        .orderBy("node")
    },
    "q_user_features" -> { (s, d) =>
      // churn/engagement covariates per user (Features.activityFeatures):
      // one conditional aggregation, data-derived reference time
      graft.ops.Features.activityFeatures(Tables.events(s, d),
          "user_id", "ts_us")
        .orderBy("id")
    },
    "q_rfm" -> { (s, d) =>
      // RFM segmentation (Features.rfm): exact rank-arithmetic quartiles
      // over the per-customer aggregate — deterministic in any engine
      graft.ops.Features.rfm(
          Tables.orders(s, d).withColumn("ts_us",
            unix_micros(col("o_orderdate").cast("timestamp"))),
          "o_custkey", "ts_us", "o_totalprice")
        .orderBy("id")
    },
    "q_epoch_batches" -> { (s, d) =>
      // deterministic epoch shuffling (Features.epochBatches): per-epoch
      // md5 permutation + one global range-partitioned rank for ALL
      // epochs, cut into fixed batches — the replayable training reader
      graft.ops.Features.epochBatches(Tables.documents(s, d), "doc_id",
          epochs = 2, batchSize = 64)
        .orderBy("id", "epoch")
    },
    "q_label_spread" -> { (s, d) =>
      // semi-supervised label spreading (Communities.labelSpreading):
      // 2% md5-seeded nodes carry their own id as label, 3 synchronous
      // rounds of clamped majority adoption over the co-order graph
      val edges = Tables.coOrderPairEdges(s, d)
      val nodes = edges.select(col("src").as("node"))
        .union(edges.select(col("dst").as("node"))).distinct()
      val seeds = nodes
        .where(pmod(graft.functions.functions.hex_to_long(
          substring(md5(concat(lit("spread"), col("node"))), 1, 15)),
          lit(1000L)) < 20L)
        .select(col("node"), col("node").as("label"))
      graft.ops.Communities.labelSpreading(edges, "src", "dst", seeds,
          rounds = 3)
        .orderBy("node")
    },
    "q_join_profile" -> { (s, d) =>
      // pre-join diagnostics (ops/JoinProfile): per-side rows/distincts/
      // orphans/hottest-key multiplicity + the EXACT join cardinality
      // Σ c_l(k)·c_r(k) — computed from the two count tables, never rows
      graft.ops.JoinProfile.profile(
        Tables.orders(s, d), "o_custkey",
        Tables.customer(s, d), "c_custkey")
    },
    "q_resample_ohlc" -> { (s, d) =>
      // daily OHLC resampling per event type (Resample.ohlc): open/close
      // via min/max (ts, id, value) structs — one hash aggregate, no
      // per-bucket window sort; exact micro-unit values
      graft.ops.Resample.ohlc(
          Tables.events(s, d).withColumn("v_us",
            floor(col("value") * lit(1000000.0)).cast("long")),
          "event_type", "ts_us", "event_id", "v_us",
          bucketUs = 86400000000L)
        .orderBy("grp", "bucket_start_us")
    },
    "q_hourly_profile" -> { (s, d) =>
      // hour-of-day seasonality fingerprint per type
      // (Resample.hourlyProfile): counts + per-mille share of the type's
      // total, broadcast totals join
      graft.ops.Resample.hourlyProfile(Tables.events(s, d),
          "event_type", "ts_us")
        .orderBy("grp", "hour")
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
    "q_embed_gram" -> { (s, d) =>
      // distributed covariance sufficient statistics (EmbedStats
      // .gramMatrix): one mapPartitions pass folds rows into dim×dim
      // exact Long partials — dim² numbers shuffle, never rows; the
      // driver-side PCA eigensolve consumes exactly this table
      graft.ops.EmbedStats.gramMatrix(
          Tables.embeddings(s, d)
            .select(Similarity.quantize(col("embedding")).as("qv")),
          "qv", dim = 64)
        .orderBy("i", "j")
    },
    "q_graph_density" -> { (s, d) =>
      // per-component structure profile (GraphStats.componentDensity):
      // node count, undirected edge count, truncating per-mille density —
      // labels computed once and persisted for both rollups
      graft.ops.GraphStats.componentDensity(
          Tables.partSupplierEdges(s, d), "src", "dst")
        .orderBy("component")
    },
    "q_negative_edges" -> { (s, d) =>
      // deterministic negative sampling (LinkPrediction.negativeEdges):
      // fixed multiplicative-permutation partners over global node ranks,
      // true edges anti-joined away — replayable in the oracle
      graft.ops.LinkPrediction.negativeEdges(
          Tables.userSequenceEdges(s, d), "src", "dst")
        .orderBy("src", "dst")
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
    "q_vocab_drift" -> { (s, d) =>
      // pairwise total-variation drift between source vocabularies
      // (ops/VocabDrift): hashed-bucket token distributions in integer
      // per-mille, L1 over the tiny distribution table — the log-free
      // domain-drift monitor (KL needs libm, not oracle-portable)
      graft.ops.VocabDrift.drift(Tables.documents(s, d), "source", "text",
          buckets = 1024)
        .orderBy("src_a", "src_b")
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
    "q_mann_kendall" -> { (s, d) =>
      // Mann–Kendall S + Theil–Sen median slope (ops/RankCorr
      // .mannKendall): the nonparametric "is traffic drifting" battery
      // per event type over the daily count series; slopes quantized
      // to ppm/day with sign-split division, lower median picked
      // deterministically
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"),
          expr("ts_us div 86400000000").as("day"))
        .agg(count(lit(1)).as("n_events"))
      graft.ops.RankCorr.mannKendall(daily, "event_type", "day",
        "n_events").orderBy("grp")
    },
    "q_percolation" -> { (s, d) =>
      // random-failure percolation sweep (Robustness
      // .randomFailureSweep): nested md5 removals at 25/50/75% on the
      // part-supplier graph — the contrast curve to q_robustness's
      // targeted attack (Albert-Jeong-Barabasi experiment)
      graft.ops.Robustness.randomFailureSweep(
        Tables.partSupplierEdges(s, d), "src", "dst",
        fractionsPermille = Seq(250, 500, 750)).orderBy("f_permille")
    },
    "q_bowtie" -> { (s, d) =>
      // bow-tie macro-structure of the user-journey digraph
      // (ops/BowTie.decompose): giant SCC core + IN (reaches core) +
      // OUT (reachable from core) + other — frontier BFS loops seeded
      // at the core, diameter-bounded rounds
      graft.ops.BowTie.decompose(Tables.userSequenceEdges(s, d),
        "src", "dst")
    },
    "q_gap_quantiles" -> { (s, d) =>
      // inter-event gap P50/P90/P99 (seconds) per event type
      // (Quantiles.sampleQuantiles over per-user lag gaps): the
      // operational inter-arrival latency distribution; user-keyed lag
      // window + the mergeable bottom-k order-statistic sketch
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts_us"), col("event_id"))
      val gaps = Tables.events(s, d)
        .withColumn("prev", lag(col("ts_us"), 1).over(w))
        .where(col("prev").isNotNull)
        .select(col("event_type"),
          expr("(ts_us - prev) div 1000000").as("gap_s"))
      graft.ops.Quantiles.sampleQuantiles(gaps, "gap_s", k = 64,
        qsPerMille = Seq(500, 900, 990), keyCols = Seq("event_type"))
        .orderBy("event_type", "q_permille")
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
    "q_running_drawdown" -> { (s, d) =>
      // per-day running drawdown of event counts per type
      // (SeriesShape.runningDrawdown): the live "how far below its own
      // peak" series q_drawdown summarizes; StreamDrawdown emits the
      // identical rows incrementally (stream≡batch spec'd)
      val daily = Tables.events(s, d)
        .groupBy(col("event_type").as("grp"),
          expr("ts_us div 86400000000").as("day"))
        .agg(count(lit(1)).as("c"))
      graft.ops.SeriesShape.runningDrawdown(daily, "grp", "day", "c")
        .orderBy("grp", "bucket")
    },
    "q_streaks" -> { (s, d) =>
      // longest consecutive-day activity streak per user
      // (SeriesShape.longestStreak): gaps-and-islands via the
      // bucket - row_number constant, earliest longest island wins
      graft.ops.SeriesShape.longestStreak(
        Tables.events(s, d).select(col("user_id"),
          expr("ts_us div 86400000000").as("day")),
        "user_id", "day").orderBy("key")
    },
    "q_discord" -> { (s, d) =>
      // matrix-profile discord (SeriesShape.topDiscord): the daily
      // window whose nearest non-overlapping neighbor is farthest —
      // the series' most anomalous shape, max-min over exact integer
      // distances
      val daily = Tables.events(s, d)
        .groupBy(col("event_type").as("grp"),
          expr("ts_us div 86400000000").as("day"))
        .agg(count(lit(1)).as("c"))
      graft.ops.SeriesShape.topDiscord(daily, "grp", "day", "c",
        motifLen = 3).orderBy("grp")
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
    "q_drawdown" -> { (s, d) =>
      // worst peak-to-trough collapse of daily event counts per type
      // (SeriesShape.maxDrawdown): running max, earliest argmax via
      // one min-struct aggregate — the resilience number for any
      // monitored rate
      val daily = Tables.events(s, d)
        .groupBy(col("event_type").as("grp"),
          expr("ts_us div 86400000000").as("day"))
        .agg(count(lit(1)).as("c"))
      graft.ops.SeriesShape.maxDrawdown(daily, "grp", "day", "c")
        .orderBy("grp")
    },
    "q_ts_motif" -> { (s, d) =>
      // matrix-profile-lite motif discovery (SeriesShape.bestMotif):
      // closest pair of non-overlapping length-3 windows of the daily
      // series per type, exact integer distances, |i-j|>=3 exclusion
      val daily = Tables.events(s, d)
        .groupBy(col("event_type").as("grp"),
          expr("ts_us div 86400000000").as("day"))
        .agg(count(lit(1)).as("c"))
      graft.ops.SeriesShape.bestMotif(daily, "grp", "day", "c",
        motifLen = 3).orderBy("grp")
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
    "q_radius_join" -> { (s, d) =>
      // planar radius self-join (Density.radiusPairs): all embedding
      // pairs within L2 0.125 on the first two axes — 9-cell grid
      // candidates (the spatial LSH), exact integer squared-distance
      // verify, never all-pairs
      graft.ops.Density.radiusPairs(Tables.embeddings(s, d), "vec_id",
        "embedding", epsQ = 1250L).orderBy("id_a", "id_b")
    },
    "q_sparsify" -> { (s, d) =>
      // kNN-graph sparsification audit (ops/Sparsify.sparsifyDrift):
      // keep each node's 2 heaviest incident edges of the weighted
      // part-supplier graph (OR-symmetrized), CC before/after — did
      // pruning shatter the giant component?
      val wEdges = Tables.lineitem(s, d).where(col("l_quantity") <= 2)
        .groupBy(concat(lit("P"), col("l_partkey")).as("src"),
          concat(lit("S"), col("l_suppkey")).as("dst"))
        .agg(count(lit(1)).as("w"))
      graft.ops.Sparsify.sparsifyDrift(wEdges, "src", "dst", "w",
        kPerNode = 2)
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
    "q_sq_recall" -> { (s, d) =>
      // int8 scalar-quantization recall audit (Similarity.sqCodes +
      // AnnAudit.recallAtK): top-5 cosine ranking on 0..255 SQ codes vs
      // exact brute force — completes the recall-audited index family
      // (LSH, IVF, PQ, SQ)
      val e = Tables.embeddings(s, d)
      val q = e.select(col("vec_id"),
        Similarity.quantize(col("embedding")).as("qv"))
      val truth = Similarity.bruteForceTopK(q, "vec_id", "qv",
        q.where(col("vec_id") < 20), "vec_id", "qv", k = 5)
      val codes = Similarity.sqCodes(e, "vec_id", "embedding")
      val approx = Similarity.bruteForceTopK(codes, "vec_id", "recon",
        codes.where(col("vec_id") < 20), "vec_id", "recon", k = 5)
      graft.ops.AnnAudit.recallAtK(truth, approx)
    },
    "q_linkage_clusters" -> { (s, d) =>
      // end-to-end entity resolution: q_record_linkage's 'link'-class
      // pairs collapsed into entity clusters via min-label CC
      // (Dedup.nearDupClusters), per-cluster member counts — the
      // pair->entity step every ER pipeline ends with
      import graft.ops.RecordLinkage.Comparator
      val pairs = graft.ops.RecordLinkage.scorePairs(
        Tables.customer(s, d), "c_custkey",
        Tables.supplier(s, d), "s_suppkey",
        col("c_nationkey"), col("s_nationkey"),
        Seq(
          Comparator(
            expr("CAST(FLOOR(ABS(c_acctbal) * 100) AS BIGINT) % 10"),
            expr("CAST(FLOOR(ABS(s_acctbal) * 100) AS BIGINT) % 10"),
            18L, -2L),
          Comparator(floor(col("c_acctbal") / lit(1000.0)).cast("long"),
            floor(col("s_acctbal") / lit(1000.0)).cast("long"), 15L, -3L),
          Comparator(expr("right(c_name, 2)"), expr("right(s_name, 2)"),
            25L, -1L)),
        linkThreshold = 40L, possibleThreshold = 40L)
        .select(concat(lit("C"), col("id_a")).as("id_a"),
          concat(lit("S"), col("id_b")).as("id_b"))
      graft.ops.Dedup.nearDupClusters(pairs, "id_a", "id_b")
        .groupBy(col("component").as("entity"))
        .agg(count(lit(1)).as("n_members"))
        .orderBy("entity")
    },
    "q_node_sketch" -> { (s, d) =>
      // neighborhood-MinHash node sketches (ops/NodeSketch.sketches):
      // 8 md5 lanes, radius-2 min-propagation over the user-journey
      // graph — float-free structural embeddings whose round evolution
      // the oracle unrolls exactly
      graft.ops.NodeSketch.sketches(Tables.userSequenceEdges(s, d),
        "src", "dst", k = 8, rounds = 2).orderBy("node", "lane")
    },
    "q_node_sim" -> { (s, d) =>
      // positional similarity from the same sketches (ops/NodeSketch
      // .similarPairs): candidate pairs mined THROUGH shared lane
      // minima (LSH for free), exact matching-lane count >= 5 of 8,
      // MinHash-estimated ball Jaccard in permille
      graft.ops.NodeSketch.similarPairs(Tables.userSequenceEdges(s, d),
        "src", "dst", k = 8, rounds = 2, minMatch = 5)
        .orderBy("node_a", "node_b")
    },
    "q_mase" -> { (s, d) =>
      // seasonal-naive vs step-naive forecast error per event type
      // (Trend.seasonalNaiveError): MASE-style cross-multiplied ppm
      // ratio over the observed daily series — < 1e6 means real weekly
      // seasonality
      graft.ops.Trend.seasonalNaiveError(Tables.events(s, d),
        "event_type", "ts_us", season = 7).orderBy("grp")
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
    "q_phash_dedup" -> { (s, d) =>
      // perceptual-hash near-dup pairs over packed multimodal assets
      // (Multimodal.phashNearDup): 60-bit pHash stand-in, 4-band LSH
      // bucketing (pigeonhole: Hamming < 4 always caught), exact
      // bit_count(xor) verify — candidate volume bounded by band
      // buckets, never all-pairs
      graft.ops.Multimodal.phashNearDup(
        graft.ops.Multimodal.packAssets(Tables.documents(s, d),
          "doc_id", "text"),
        bands = 4, maxHamming = 20).orderBy("id_a", "id_b")
    },
    "q_robustness" -> { (s, d) =>
      // targeted-attack robustness (ops/Robustness): remove the top-20
      // degree hubs of the part-supplier graph (deterministic ties),
      // largest-component size before/after via the CC family
      graft.ops.Robustness.hubRemovalImpact(
        Tables.partSupplierEdges(s, d), "src", "dst", topK = 20)
    },
    "q_knn_shapley" -> { (s, d) =>
      // KNN-Shapley data valuation (ops/DataValue): closed-form Shapley
      // of each training vector for a 5-NN classifier over a sampled
      // test set (id mod 25) — term-wise ppm flooring turns the
      // recurrence into an exact suffix sum both engines replay
      graft.ops.DataValue.knnShapley(Tables.embeddings(s, d), "vec_id",
        "embedding", "label", k = 5, testModulus = 25L)
        .orderBy("train_id")
    },
    "q_label_noise_class" -> { (s, d) =>
      // per-CLASS kNN label-noise audit (ops/LabelNoise): how many probe
      // points' 5 nearest neighbors mostly DISAGREE with the point's own
      // label, rolled up per label class — the confident-learning triage
      // complement of q_label_noise's per-vector agreement counts; exact
      // integer L2, k-slot aggregate (no window)
      graft.ops.LabelNoise.knnLabelAudit(Tables.embeddings(s, d), "vec_id",
        "embedding", "label", k = 5, probeModulus = 4L)
        .orderBy("label")
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
    "q_homophily" -> { (s, d) =>
      // label homophily of the co-order part graph against part brands
      // (GraphStats.labelHomophily): Newman's discrete assortativity
      // with (2m)^2 cleared — do same-brand parts co-occur in orders
      // beyond what brand degree masses predict? One row of exact sums
      graft.ops.GraphStats.labelHomophily(
        Tables.coOrderPairEdges(s, d), "src", "dst",
        Tables.part(s, d).select(
          concat(lit("P"), col("p_partkey")).as("node"), col("p_brand")),
        "node", "p_brand")
    },
    "q_triad_census" -> { (s, d) =>
      // directed triad census of the user-journey graph (ops/Triads):
      // feed-forward vs cyclic motif counts; wedges stay a degree-table
      // aggregate (never materialized), the two triangle joins carry
      // candidate 2-paths only
      graft.ops.Triads.directedCensus(
        Tables.userSequenceEdges(s, d), "src", "dst")
    },
    "q_record_linkage" -> { (s, d) =>
      // Fellegi-Sunter scoring pass (ops/RecordLinkage): customers vs
      // suppliers blocked on nation, three literal deci-ban field
      // comparators (acctbal cents digit, kilobuck acctbal bucket, name
      // suffix), classified link/possible; sub-threshold pairs dropped
      // so output stays candidate-sized
      import graft.ops.RecordLinkage.Comparator
      graft.ops.RecordLinkage.scorePairs(
        Tables.customer(s, d), "c_custkey",
        Tables.supplier(s, d), "s_suppkey",
        col("c_nationkey"), col("s_nationkey"),
        Seq(
          Comparator(
            expr("CAST(FLOOR(ABS(c_acctbal) * 100) AS BIGINT) % 10"),
            expr("CAST(FLOOR(ABS(s_acctbal) * 100) AS BIGINT) % 10"),
            18L, -2L),
          Comparator(floor(col("c_acctbal") / lit(1000.0)).cast("long"),
            floor(col("s_acctbal") / lit(1000.0)).cast("long"), 15L, -3L),
          Comparator(expr("right(c_name, 2)"), expr("right(s_name, 2)"),
            25L, -1L)),
        linkThreshold = 40L, possibleThreshold = 20L)
        .orderBy("id_a", "id_b")
    },
    "q_page_hinkley" -> { (s, d) =>
      // Page–Hinkley online changepoint per event type (ops/Changepoint
      // .pageHinkley): reference rate trained on the first 3 observed
      // days, daily-count drift envelopes on the rest — the
      // train-batch/score-stream split; StreamChangepoint emits the
      // identical rows incrementally (stream≡batch spec'd)
      val ev = Tables.events(s, d).select(col("event_type").as("key"),
          col("ts_us"), expr("ts_us div 86400000000").as("day"))
        .crossJoin(broadcast(Tables.events(s, d)
          .agg(expr("min(ts_us div 86400000000)").as("min_day"))))
      val baseline = ev.where(col("day") < col("min_day") + 3)
        .groupBy("key")
        .agg(count(lit(1)).as("n_ev"), countDistinct(col("day")).as("n_w"))
        .select(col("key"), expr("(1000000 * n_ev) div n_w").as("mu_ppm"))
      graft.ops.Changepoint.pageHinkley(
          ev.where(col("day") >= col("min_day") + 3), "key", "ts_us",
          86400000000L, baseline, lambdaWindowTenths = 15L)
        .orderBy("key", "window_start_us")
    },
    "q_dbscan_grid" -> { (s, d) =>
      // grid-density clustering over the first two embedding axes
      // (ops/Density.gridDbscan): eps = 1/8 (power of two -> exact cell
      // assignment), core cells >= 10 pts, clusters = CC over 8-adjacent
      // core cells, borders take the MIN adjacent cluster — all cluster
      // structure on the cell dimension, points only map-side-join in
      graft.ops.Density.gridDbscan(Tables.embeddings(s, d), "vec_id",
        "embedding", eps = 0.125, minPts = 10L).orderBy("id")
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
    },
    "q_burstiness" -> { (s, d) =>
      // Fano factor of daily event counts per type (Trend.fanoFactor):
      // the burstiness probe next to q_autocorr's memory and q_cusum's
      // level shifts — var/mean kept exact by cross-multiplied ppm
      graft.ops.Trend.fanoFactor(Tables.events(s, d), "event_type",
        "ts_us").orderBy("grp")
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
    }
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  private val ngramJaccardOracleSql: String =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
      |       FROM toks, UNNEST(range(1, greatest(len(w)-1, 2))) AS t(i)),
      |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
      |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2)
      |SELECT id_a, id_b, CAST(n_inter AS DOUBLE)/(sa.n_sh + sb.n_sh - n_inter) AS jaccard
      |FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
      |WHERE CAST(n_inter AS DOUBLE)/(sa.n_sh + sb.n_sh - n_inter) >= 0.5
      |ORDER BY id_a, id_b""".stripMargin

  def oracleSql: Map[String, String] = Map(
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
    // Every integer SUM in oracle SQL must be wrapped in CAST(... AS BIGINT).
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
    "q_components" -> ccOracle("SELECT node, min(lab) AS component FROM cc GROUP BY node ORDER BY node"),
    "q_components_agg" -> ccOracle("SELECT node, min(lab) AS component FROM cc GROUP BY node ORDER BY node"),
    "q_components_star" -> ccOracle("SELECT node, min(lab) AS component FROM cc GROUP BY node ORDER BY node"),
    "q_components_stats" -> ccOracle(
      """SELECT component, COUNT(*) AS n_nodes
        |FROM (SELECT node, min(lab) AS component FROM cc GROUP BY node)
        |GROUP BY component ORDER BY component""".stripMargin),
    "q_assoc" ->
      """WITH RECURSIVE
        |rows0 AS (SELECT l_orderkey AS tid, 'P' || CAST(l_partkey AS VARCHAR) AS item FROM lineitem),
        |tot AS (SELECT COUNT(DISTINCT tid) AS t FROM rows0),
        |supp AS (SELECT item, COUNT(*) AS cnt FROM rows0 GROUP BY item),
        |valid AS (SELECT item, cnt FROM supp, tot WHERE CAST(cnt AS DOUBLE) / t >= 0.002),
        |txok AS (SELECT tid FROM rows0 GROUP BY tid HAVING COUNT(*) <= 5),
        |vrows AS (SELECT r.tid, r.item FROM rows0 r JOIN valid USING (item) JOIN txok USING (tid)),
        |pairs AS (SELECT a.item AS ant, c.item AS cons
        |          FROM vrows a JOIN vrows c ON a.tid = c.tid AND a.item <> c.item),
        |liftn AS (SELECT ant, COUNT(*) AS npairs FROM pairs GROUP BY ant),
        |sym AS (SELECT DISTINCT ant AS a, cons AS b FROM pairs
        |        UNION SELECT DISTINCT cons AS a, ant AS b FROM pairs),
        |cc AS (
        |  SELECT item AS node, item AS lab FROM valid
        |  UNION
        |  SELECT s.b AS node, c.lab FROM cc c JOIN sym s ON c.node = s.a WHERE c.lab < s.b),
        |comp AS (SELECT node, MIN(lab) AS comp FROM cc GROUP BY node),
        |pat AS (SELECT node, DENSE_RANK() OVER (ORDER BY comp) AS pattern FROM comp)
        |SELECT v.item,
        |       CAST(v.cnt AS DOUBLE) AS support,
        |       COALESCE(CAST(l.npairs * v.cnt AS DOUBLE) / (SELECT t FROM tot), 0.0) AS lift_score,
        |       CAST(p.pattern AS INT) AS pattern
        |FROM valid v
        |LEFT JOIN liftn l ON v.item = l.ant
        |JOIN pat p ON v.item = p.node
        |ORDER BY v.item""".stripMargin,
    "q_assoc_weighted" ->
      """WITH
        |rows0 AS (SELECT l_orderkey AS tid, 'P' || CAST(l_partkey AS VARCHAR) AS item,
        |                 l_quantity AS q FROM lineitem),
        |tot AS (SELECT COUNT(DISTINCT tid) AS t FROM rows0),
        |supp AS (SELECT item, SUM(q) AS ws FROM rows0 GROUP BY item),
        |valid AS (SELECT item, ws FROM supp, tot WHERE ws / t >= 0.04),
        |txok AS (SELECT tid FROM rows0 GROUP BY tid HAVING COUNT(*) <= 8),
        |vrows AS (SELECT r.tid, r.item, r.q FROM rows0 r JOIN valid USING (item) JOIN txok USING (tid)),
        |kept AS (SELECT a.item AS ant, c.item AS cons, a.q AS qa, c.q AS qc,
        |                a.q * c.q / v.ws AS conf
        |         FROM vrows a
        |         JOIN vrows c ON a.tid = c.tid AND a.item <> c.item
        |         JOIN valid v ON v.item = a.item
        |         WHERE a.q * c.q / v.ws >= 0.5),
        |lift AS (SELECT ant, SUM(qa * qc) / MIN(vv.ws) AS lift_score
        |         FROM kept JOIN valid vv ON vv.item = kept.ant GROUP BY ant),
        |ranked AS (SELECT ant, cons, conf,
        |                  ROW_NUMBER() OVER (PARTITION BY ant ORDER BY conf DESC, cons ASC) AS rn
        |           FROM kept),
        |digest AS (SELECT ant,
        |                  CAST(SUM(CASE WHEN rn <= 5 THEN 1 ELSE 0 END) AS INT) AS n_top,
        |                  MAX(CASE WHEN rn = 1 THEN cons END) AS top_consequent,
        |                  MAX(CASE WHEN rn = 1 THEN conf END) AS top_confidence
        |           FROM ranked GROUP BY ant)
        |SELECT v.item, v.ws AS support,
        |       COALESCE(l.lift_score, 0.0) AS lift_score,
        |       COALESCE(d.n_top, 0) AS n_top,
        |       COALESCE(d.top_consequent, '') AS top_consequent,
        |       COALESCE(d.top_confidence, 0.0) AS top_confidence
        |FROM valid v
        |LEFT JOIN lift l ON v.item = l.ant
        |LEFT JOIN digest d ON v.item = d.ant
        |ORDER BY v.item""".stripMargin,
    "q_assoc_lists" ->
      """WITH
        |rows0 AS (SELECT l_orderkey AS tid, 'P' || CAST(l_partkey AS VARCHAR) AS item,
        |                 l_quantity AS q FROM lineitem),
        |tot AS (SELECT COUNT(DISTINCT tid) AS t FROM rows0),
        |supp AS (SELECT item, SUM(q) AS ws FROM rows0 GROUP BY item),
        |valid AS (SELECT item, ws FROM supp, tot WHERE ws / t >= 0.04),
        |txok AS (SELECT tid FROM rows0 GROUP BY tid HAVING COUNT(*) <= 8),
        |vrows AS (SELECT r.tid, r.item, r.q FROM rows0 r JOIN valid USING (item) JOIN txok USING (tid)),
        |kept AS (SELECT a.item AS ant, c.item AS cons, a.q * c.q / v.ws AS conf
        |         FROM vrows a
        |         JOIN vrows c ON a.tid = c.tid AND a.item <> c.item
        |         JOIN valid v ON v.item = a.item
        |         WHERE a.q * c.q / v.ws >= 0.5),
        |ranked AS (SELECT ant, cons, conf,
        |                  ROW_NUMBER() OVER (PARTITION BY ant ORDER BY conf DESC, cons ASC) AS rn
        |           FROM kept)
        |SELECT ant AS item, CAST(rn AS INT) AS rank, cons AS consequent, conf AS confidence
        |FROM ranked WHERE rn <= 5
        |ORDER BY item, rank""".stripMargin,
    "q_shortest_path" ->
      s"""WITH
         |${nationApspCtes(rounds = 5)}
         |SELECT CASE WHEN src < dst THEN src ELSE dst END AS "from",
         |       CASE WHEN src < dst THEN dst ELSE src END AS "to",
         |       CAST(MIN(cost) AS DOUBLE) / 1000.0 AS distance
         |FROM d5 WHERE src <> dst GROUP BY 1, 2
         |ORDER BY 1, 2""".stripMargin,
    "q_shortest_path_pregel" ->
      s"""WITH
         |${nationApspCtes(rounds = 5)}
         |SELECT src AS "from", dst AS "to", CAST(cost AS DOUBLE) / 1000.0 AS distance
         |FROM d5 WHERE src <> dst AND src IN ('NATION_0', 'NATION_12', 'NATION_7')
         |ORDER BY 1, 2""".stripMargin,
    "q_simrank" -> simRankOracle(iters = 3),
    "q_pagerank_fp" -> pagerankFpOracle(iters = 10),
    "q_ppr" -> pagerankFpOracle(iters = 10, sources = Seq("P1", "P2", "P3")),
    "q_betweenness_pairs" ->
      s"""WITH
         |${nationBfsSigmaCtes(rounds = 10)},
         |tri AS (SELECT a.t AS v,
         |          CAST(FLOOR(1000000000.0 * a.sigma * b.sigma / st.sigma) AS BIGINT) AS qc
         |        FROM sg st
         |        JOIN sg a ON a.s = st.s
         |        JOIN sg b ON b.s = a.t AND b.t = st.t
         |        WHERE a.t <> st.t AND a.d + b.d = st.d)
         |SELECT n.node, CAST(COALESCE(SUM(t.qc), 0) AS BIGINT) AS qbc
         |FROM nodes n LEFT JOIN tri t ON t.v = n.node
         |GROUP BY n.node ORDER BY n.node""".stripMargin,
    "q_dedup_exact" ->
      """SELECT sha256(text) AS text_sha, COUNT(*) AS n_copies, MIN(doc_id) AS keep_id
        |FROM documents GROUP BY sha256(text) ORDER BY text_sha""".stripMargin,
    "q_dedup_keep_best" ->
      """WITH g AS (SELECT sha256(text) AS text_sha, doc_id,
        |                  CAST(n_chars AS BIGINT) AS score
        |           FROM documents),
        |agg AS (SELECT text_sha, COUNT(*) AS n_copies FROM g GROUP BY text_sha),
        |best AS (SELECT text_sha, doc_id AS keep_id, score AS keep_score,
        |                ROW_NUMBER() OVER (PARTITION BY text_sha
        |                  ORDER BY score DESC, doc_id ASC) AS rn
        |         FROM g)
        |SELECT a.text_sha, a.n_copies, b.keep_id, b.keep_score
        |FROM agg a JOIN best b ON a.text_sha = b.text_sha AND b.rn = 1
        |ORDER BY a.text_sha""".stripMargin,
    "q_scc" ->
      """WITH RECURSIVE
        |ev AS (SELECT user_id, ts, event_id,
        |              lead(user_id) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS nxt
        |       FROM events WHERE event_type = 'click' AND value < 2.0),
        |e AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS src, CAST(nxt AS VARCHAR) AS dst
        |      FROM ev WHERE nxt IS NOT NULL AND nxt <> user_id),
        |n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |reach AS (SELECT node AS a, node AS b FROM n
        |          UNION
        |          SELECT r.a, e.dst FROM reach r JOIN e ON r.b = e.src),
        |scc AS (SELECT f.a AS node, MIN(f.b) AS scc_id
        |        FROM reach f JOIN reach r ON f.a = r.b AND f.b = r.a
        |        GROUP BY f.a)
        |SELECT node, scc_id FROM scc ORDER BY node""".stripMargin,
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
    "q_dedup_ngram" -> ngramJaccardOracleSql,
    // prefix filtering changes the CANDIDATE plan, not the result: the
    // oracle is shared verbatim with the full-inverted-index query
    "q_dedup_prefix" -> ngramJaccardOracleSql,
    // candidate generation (shared-shingle blocking) mirrored exactly: a
    // pair sharing no word trigram is out of contract on both sides
    "q_dedup_edit" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
        |       FROM toks, UNNEST(range(1, greatest(len(w)-1, 2))) AS t(i)),
        |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |         FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id)
        |SELECT id_a, id_b, CAST(levenshtein(ta.text, tb.text) AS BIGINT) AS dist
        |FROM cand
        |JOIN documents ta ON ta.doc_id = id_a
        |JOIN documents tb ON tb.doc_id = id_b
        |WHERE abs(len(ta.text) - len(tb.text)) <= 20
        |  AND levenshtein(ta.text, tb.text) <= 20
        |ORDER BY id_a, id_b""".stripMargin,
    "q_dedup_passage" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |c AS (SELECT doc_id, w, len(w) AS n FROM t),
        |idx AS (SELECT doc_id, w, CAST(u.i AS INT) AS ci
        |        FROM c, UNNEST(range(0, 1 + CAST(CEIL(GREATEST(n - 16, 0) / 16.0) AS BIGINT))) AS u(i)),
        |ch AS (SELECT doc_id, md5(array_to_string(w[ci*16+1 : ci*16+16], ' ')) AS h
        |       FROM idx),
        |g AS (SELECT h, COUNT(*) AS c FROM ch GROUP BY h),
        |d AS (SELECT doc_id, COUNT(*) AS n_passages,
        |             CAST(SUM(CASE WHEN g.c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_passages
        |      FROM ch JOIN g USING (h) GROUP BY doc_id)
        |SELECT doc_id, n_passages, n_dup_passages,
        |       CAST(FLOOR(n_dup_passages * 1000.0 / n_passages) AS BIGINT) AS dup_permille
        |FROM d ORDER BY doc_id""".stripMargin,
    "q_dedup_clusters" ->
      s"""WITH RECURSIVE
         |toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |sh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
         |       FROM toks, UNNEST(range(1, greatest(len(w)-1, 2))) AS t(i)),
         |${graft.ops.Dedup.minHashPortableOracleCtes(numHashes = 64, bands = 16)},
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |         FROM bnd a JOIN bnd b
         |           ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
         |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
         |inter AS (SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
         |          FROM cand c
         |          JOIN sh a ON a.doc_id = c.id_a
         |          JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
         |          GROUP BY c.id_a, c.id_b),
         |p AS (SELECT CAST(id_a AS VARCHAR) AS a, CAST(id_b AS VARCHAR) AS b
         |      FROM inter JOIN sizes sa ON sa.doc_id = id_a
         |                 JOIN sizes sb ON sb.doc_id = id_b
         |      WHERE CAST(n_inter AS DOUBLE)/(sa.n_sh + sb.n_sh - n_inter) >= 0.5),
         |sym AS (SELECT a, b FROM p UNION SELECT b AS a, a AS b FROM p),
         |nodes AS (SELECT DISTINCT a AS node FROM sym),
         |cc AS (SELECT node, node AS lab FROM nodes
         |       UNION
         |       SELECT s.b AS node, c.lab FROM cc c JOIN sym s ON c.node = s.a
         |       WHERE c.lab < s.b),
         |comp AS (SELECT node, MIN(lab) AS component FROM cc GROUP BY node)
         |SELECT component AS keeper, COUNT(*) AS n_docs
         |FROM comp GROUP BY component ORDER BY keeper""".stripMargin,
    "q_split_leakage" ->
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |sh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
         |       FROM toks, UNNEST(range(1, greatest(len(w)-1, 2))) AS t(i)),
         |${graft.ops.Dedup.minHashPortableOracleCtes(numHashes = 64, bands = 16)},
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |         FROM bnd a JOIN bnd b
         |           ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
         |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
         |inter AS (SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
         |          FROM cand c
         |          JOIN sh a ON a.doc_id = c.id_a
         |          JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
         |          GROUP BY c.id_a, c.id_b),
         |p AS (SELECT id_a, id_b
         |      FROM inter JOIN sizes sa ON sa.doc_id = id_a
         |                 JOIN sizes sb ON sb.doc_id = id_b
         |      WHERE CAST(n_inter AS DOUBLE)/(sa.n_sh + sb.n_sh - n_inter) >= 0.5),
         |sp AS (SELECT
         |        CASE WHEN ('0x' || substr(md5('split' || CAST(id_a AS VARCHAR)), 1, 15))::BIGINT
         |                  % 1000 < 200 THEN 'test' ELSE 'train' END AS spl_a,
         |        CASE WHEN ('0x' || substr(md5('split' || CAST(id_b AS VARCHAR)), 1, 15))::BIGINT
         |                  % 1000 < 200 THEN 'test' ELSE 'train' END AS spl_b
         |      FROM p)
         |SELECT LEAST(spl_a, spl_b) AS split_a, GREATEST(spl_a, spl_b) AS split_b,
         |       CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |       LEAST(spl_a, spl_b) <> GREATEST(spl_a, spl_b) AS is_leak
         |FROM sp GROUP BY 1, 2, 4 ORDER BY split_a, split_b""".stripMargin,
    "q_split_leakage_cross" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
        |       FROM toks, UNNEST(range(1, greatest(len(w)-1, 2))) AS t(i)),
        |shn AS (SELECT doc_id AS new_id, shingle FROM sh WHERE doc_id % 7 = 0),
        |shr AS (SELECT doc_id AS ref_id, shingle FROM sh WHERE doc_id % 7 <> 0),
        |cand AS (SELECT DISTINCT n.new_id, r.ref_id
        |         FROM shn n JOIN shr r ON r.shingle = n.shingle),
        |sn AS (SELECT new_id, COUNT(*) AS sa FROM shn GROUP BY 1),
        |sr AS (SELECT ref_id, COUNT(*) AS sb FROM shr GROUP BY 1),
        |inter AS (SELECT c.new_id, c.ref_id, CAST(COUNT(*) AS BIGINT) AS n_shared
        |          FROM cand c JOIN shn a ON a.new_id = c.new_id
        |          JOIN shr b ON b.ref_id = c.ref_id AND b.shingle = a.shingle
        |          GROUP BY 1, 2),
        |j AS (SELECT i.new_id, i.ref_id, i.n_shared,
        |        CAST(i.n_shared AS DOUBLE)/(sn.sa + sr.sb - i.n_shared) AS jaccard
        |      FROM inter i JOIN sn ON sn.new_id = i.new_id
        |                   JOIN sr ON sr.ref_id = i.ref_id
        |      WHERE CAST(i.n_shared AS DOUBLE)/(sn.sa + sr.sb - i.n_shared) >= 0.5),
        |sp AS (SELECT new_id, ref_id, n_shared, jaccard,
        |        CASE WHEN ('0x' || substr(md5('split' || CAST(new_id AS VARCHAR)), 1, 15))::BIGINT
        |             % 1000 < 200 THEN 'test' ELSE 'train' END AS split_new,
        |        CASE WHEN ('0x' || substr(md5('split' || CAST(ref_id AS VARCHAR)), 1, 15))::BIGINT
        |             % 1000 < 200 THEN 'test' ELSE 'train' END AS split_ref
        |      FROM j)
        |SELECT new_id, ref_id, n_shared, jaccard, split_new, split_ref,
        |       split_new <> split_ref AS is_leak
        |FROM sp ORDER BY new_id, ref_id""".stripMargin,
    "q_bm25" ->
      """WITH toks AS (SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS tok
        |              FROM documents),
        |tok2 AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
        |tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
        |       FROM tok2 GROUP BY 1, 2),
        |dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
        |corpus AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_docs,
        |                  (SELECT CAST(COALESCE(SUM(tf), 0) AS BIGINT) FROM tf) AS s_tok),
        |q(query_id, term) AS (VALUES (1, 'hash'), (1, 'join'), (2, 'slow'),
        |       (2, 'scan'), (2, 'filter'), (3, 'vector'), (3, 'data')),
        |dfreq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf
        |       WHERE tok IN (SELECT DISTINCT term FROM q) GROUP BY tok),
        |scored AS (SELECT q.query_id, tf.doc_id,
        |        CAST(SUM(
        |          ((1000000 * (corpus.n_docs - dfreq.df + 1)) // (dfreq.df + 1))
        |          * ((22000000::HUGEINT * tf.tf * corpus.s_tok)
        |             // (10::HUGEINT * corpus.s_tok * tf.tf
        |                + 3::HUGEINT * corpus.s_tok
        |                + 9::HUGEINT * dl.dl * corpus.n_docs))
        |          // 1000000) AS BIGINT) AS score_ppm
        |      FROM tf JOIN q ON q.term = tf.tok
        |      JOIN dfreq ON dfreq.tok = tf.tok
        |      JOIN dl ON dl.doc_id = tf.doc_id
        |      CROSS JOIN corpus
        |      GROUP BY 1, 2),
        |r AS (SELECT query_id, doc_id, score_ppm,
        |        ROW_NUMBER() OVER (PARTITION BY query_id
        |          ORDER BY score_ppm DESC, doc_id ASC) AS rn
        |      FROM scored)
        |SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rn AS INT) AS rank,
        |       doc_id, score_ppm
        |FROM r WHERE rn <= 10 ORDER BY query_id, rank""".stripMargin,
    "q_dedup_winnow" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS wd FROM documents),
        |g AS (SELECT doc_id, i AS pos, array_to_string(wd[i:i+3], ' ') AS gram
        |      FROM toks, UNNEST(range(1, greatest(len(wd)-2, 2))) t(i)),
        |h AS (SELECT doc_id, pos,
        |        ('0x' || substr(md5(gram), 1, 15))::BIGINT AS hv,
        |        COUNT(*) OVER (PARTITION BY doc_id) AS m
        |      FROM g),
        |wm AS (SELECT doc_id, pos, m,
        |        MIN(hv) OVER (PARTITION BY doc_id ORDER BY pos
        |          ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS fp
        |      FROM h),
        |sel AS MATERIALIZED (SELECT DISTINCT doc_id, fp FROM wm
        |        WHERE pos <= greatest(m - 4, 1)),
        |sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_fp
        |        FROM sel GROUP BY 1),
        |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |        CAST(COUNT(*) AS BIGINT) AS n_shared
        |      FROM sel a JOIN sel b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2)
        |SELECT id_a, id_b, n_shared,
        |       CAST(n_shared AS DOUBLE)/(sa.n_fp + sb.n_fp - n_shared) AS jaccard
        |FROM inter JOIN sizes sa ON sa.doc_id = id_a
        |           JOIN sizes sb ON sb.doc_id = id_b
        |WHERE CAST(n_shared AS DOUBLE)/(sa.n_fp + sb.n_fp - n_shared) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,
    "q_dedup_minhash" ->
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |sh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
         |       FROM toks, UNNEST(range(1, greatest(len(w)-1, 2))) AS t(i)),
         |${graft.ops.Dedup.minHashPortableOracleCtes(numHashes = 64, bands = 16)},
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |         FROM bnd a JOIN bnd b
         |           ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
         |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
         |inter AS (SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
         |          FROM cand c
         |          JOIN sh a ON a.doc_id = c.id_a
         |          JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
         |          GROUP BY c.id_a, c.id_b)
         |SELECT id_a, id_b,
         |       CAST(n_inter AS DOUBLE)/(sa.n_sh + sb.n_sh - n_inter) AS jaccard
         |FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
         |WHERE CAST(n_inter AS DOUBLE)/(sa.n_sh + sb.n_sh - n_inter) >= 0.5
         |ORDER BY id_a, id_b""".stripMargin,
    "q_dedup_simhash" ->
      """WITH toks AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents),
        |h AS (SELECT doc_id,
        |        ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h1,
        |        ('0x' || substr(md5(tok), 9, 8))::BIGINT AS h2
        |      FROM toks),
        |bits AS (SELECT doc_id, j,
        |           CAST(SUM(CASE WHEN (h1 >> j) & 1 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS v1,
        |           CAST(SUM(CASE WHEN (h2 >> j) & 1 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS v2
        |         FROM h CROSS JOIN (SELECT UNNEST(range(0, 32)) AS j) GROUP BY doc_id, j),
        |fp AS (SELECT doc_id,
        |         CAST(SUM(CASE WHEN v1 > 0 THEN 1::BIGINT << j ELSE 0 END) AS BIGINT) AS fp1,
        |         CAST(SUM(CASE WHEN v2 > 0 THEN 1::BIGINT << j ELSE 0 END) AS BIGINT) AS fp2
        |       FROM bits GROUP BY doc_id),
        |bnd AS (SELECT doc_id, UNNEST([0, 1, 2, 3]) AS band,
        |               UNNEST([fp1 & 65535, (fp1 >> 16) & 65535,
        |                       fp2 & 65535, (fp2 >> 16) & 65535]) AS bucket
        |        FROM fp),
        |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |         FROM bnd a JOIN bnd b
        |           ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id)
        |SELECT c.id_a, c.id_b,
        |       CAST(bit_count(xor(fa.fp1, fb.fp1)) + bit_count(xor(fa.fp2, fb.fp2)) AS INT) AS hamming
        |FROM cand c JOIN fp fa ON fa.doc_id = c.id_a JOIN fp fb ON fb.doc_id = c.id_b
        |WHERE bit_count(xor(fa.fp1, fb.fp1)) + bit_count(xor(fa.fp2, fb.fp2)) <= 3
        |ORDER BY id_a, id_b""".stripMargin,
    "q_dedup_embed" ->
      """WITH q AS (SELECT vec_id, list_transform(embedding,
        |             x -> FLOOR(CAST(x AS DOUBLE) * CAST(10000.0 AS DOUBLE))) AS v
        |           FROM embeddings),
        |n AS (SELECT vec_id, (SELECT SUM(x*x) FROM UNNEST(v) AS t(x)) AS nrm FROM q),
        |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |        (SELECT SUM(a.v[i]*b.v[i]) FROM UNNEST(range(1, len(a.v)+1)) AS t(i)) AS dot
        |      FROM q a JOIN q b ON a.vec_id < b.vec_id)
        |SELECT id_a, id_b, dot / SQRT(na.nrm * nb.nrm) AS cosine
        |FROM p JOIN n na ON na.vec_id = id_a JOIN n nb ON nb.vec_id = id_b
        |WHERE dot / SQRT(na.nrm * nb.nrm) >= CAST(0.3 AS DOUBLE)
        |ORDER BY id_a, id_b""".stripMargin,
    "q_ann_topk" ->
      """WITH q AS (SELECT vec_id, list_transform(embedding,
        |             x -> FLOOR(CAST(x AS DOUBLE) * CAST(10000.0 AS DOUBLE))) AS v
        |           FROM embeddings),
        |n AS (SELECT vec_id, (SELECT SUM(x*x) FROM UNNEST(v) AS t(x)) AS nrm FROM q),
        |p AS (SELECT qq.vec_id AS query_id, c.vec_id AS neighbor_id,
        |        (SELECT SUM(qq.v[i]*c.v[i]) FROM UNNEST(range(1, len(qq.v)+1)) AS t(i)) AS dot
        |      FROM (SELECT * FROM q WHERE vec_id < 20) qq
        |      JOIN q c ON c.vec_id <> qq.vec_id),
        |scored AS (SELECT query_id, neighbor_id,
        |             dot / SQRT(na.nrm * nb.nrm) AS cosine,
        |             ROW_NUMBER() OVER (PARTITION BY query_id
        |               ORDER BY dot / SQRT(na.nrm * nb.nrm) DESC, neighbor_id ASC) AS rank
        |           FROM p JOIN n na ON na.vec_id = query_id
        |                  JOIN n nb ON nb.vec_id = neighbor_id)
        |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cosine
        |FROM scored WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,
    "q_ann_pq" -> graft.ops.Similarity.pqPortableOracle(
      dim = 64, k = 5, m = 16, ksub = 16, candR = 50, kmeansIters = 2,
      sampleN = 200, seed = 42L),
    "q_ann_ivf" -> graft.ops.Similarity.ivfPortableOracle(
      dim = 64, k = 5, nCells = 16, nProbe = 4, kmeansIters = 3,
      sampleN = 200, seed = 42L),
    "q_ann_ivfpq" -> graft.ops.Similarity.ivfPqPortableOracle(
      dim = 64, k = 5, nCells = 16, nProbe = 4, m = 16, ksub = 16,
      candR = 50, kmeansIters = 2, sampleN = 200, seed = 42L),
    "q_ann_multiprobe" -> graft.ops.Similarity.lshMultiProbeOracle(
      dim = 64, k = 5, nBits = 6, tables = 2, seed = 42L),
    "q_ann_lsh" -> graft.ops.Similarity.lshPortableOracle(
      dim = 64, k = 5, nBits = 6, tables = 4, seed = 42L),
    "q_tokenize" ->
      s"""WITH RECURSIVE
         |${tokenizeCtes()}
         |,
         |$tokenStatsTailSql""".stripMargin,
    "q_tokenize_trained" ->
      s"""WITH RECURSIVE
         |${bpeCtes(rounds = 3)},
         |${tokenizeCtes(vocabCte = "vocab AS (SELECT DISTINCT sym AS tok FROM rows3)")}
         |,
         |$tokenStatsTailSql""".stripMargin,
    "q_token_freq" ->
      s"""WITH RECURSIVE
         |${tokenizeCtes()}
         |,
         |wn AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n_w FROM words GROUP BY w)
         |SELECT t.tok, CAST(SUM(wn.n_w) AS BIGINT) AS n_occurrences
         |FROM wt t JOIN wn ON wn.w = t.w
         |GROUP BY t.tok ORDER BY t.tok""".stripMargin,
    "q_token_gini" ->
      """WITH tok AS (SELECT source AS key, t.tok
        |             FROM documents, UNNEST(string_split(text, ' ')) AS t(tok)
        |             WHERE length(t.tok) > 0),
        |c AS (SELECT key, tok, COUNT(*) AS c FROM tok GROUP BY 1, 2),
        |s AS (SELECT key, CAST(SUM(c) AS BIGINT) AS n_tokens,
        |        COUNT(*) AS n_distinct, CAST(MAX(c) AS BIGINT) AS top_count,
        |        CAST(SUM(c * c) AS BIGINT) AS sq
        |      FROM c GROUP BY key)
        |SELECT key, n_tokens, n_distinct, top_count,
        |  (1000000 * sq) // (n_tokens * n_tokens) AS hhi_ppm,
        |  1000000 - (1000000 * sq) // (n_tokens * n_tokens) AS gini_ppm
        |FROM s ORDER BY key""".stripMargin,
    "q_gopher_rules" ->
      """WITH w AS (SELECT doc_id AS id, text,
        |         list_filter(string_split(text, ' '), x -> length(x) > 0) AS toks
        |       FROM documents),
        |b AS (SELECT id, CAST(len(toks) AS BIGINT) AS n_words,
        |        CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS sumlen,
        |        CAST(length(text) - length(replace(text, '#', ''))
        |          + (length(text) - length(replace(text, '...', ''))) // 3
        |          AS BIGINT) AS n_symbols,
        |        CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')))
        |          AS BIGINT) AS n_alpha_words,
        |        CAST(len(list_filter(toks, x -> x IN ('the', 'a', 'of', 'and', 'in')))
        |          AS BIGINT) AS n_stop_hits
        |      FROM w),
        |f AS (SELECT id, n_words,
        |        CASE WHEN n_words > 0 THEN (10 * sumlen) // n_words ELSE 0 END AS mwl_x10,
        |        n_symbols, n_alpha_words, n_stop_hits
        |      FROM b)
        |SELECT id, n_words, mwl_x10, n_symbols, n_alpha_words, n_stop_hits,
        |  CASE WHEN n_words BETWEEN 50 AND 100000 THEN 1 ELSE 0 END AS words_ok,
        |  CASE WHEN mwl_x10 BETWEEN 30 AND 100 THEN 1 ELSE 0 END AS mwl_ok,
        |  CASE WHEN n_symbols * 10 <= n_words THEN 1 ELSE 0 END AS sym_ok,
        |  CASE WHEN n_alpha_words * 10 >= n_words * 8 THEN 1 ELSE 0 END AS alpha_ok,
        |  CASE WHEN n_stop_hits >= 2 THEN 1 ELSE 0 END AS stop_ok,
        |  (CASE WHEN n_words BETWEEN 50 AND 100000 THEN 1 ELSE 0 END)
        |    * (CASE WHEN mwl_x10 BETWEEN 30 AND 100 THEN 1 ELSE 0 END)
        |    * (CASE WHEN n_symbols * 10 <= n_words THEN 1 ELSE 0 END)
        |    * (CASE WHEN n_alpha_words * 10 >= n_words * 8 THEN 1 ELSE 0 END)
        |    * (CASE WHEN n_stop_hits >= 2 THEN 1 ELSE 0 END) AS pass
        |FROM f ORDER BY id""".stripMargin,
    "q_k_anonymity" ->
      """SELECT c_nationkey, c_mktsegment, COUNT(*) AS n,
        |  CASE WHEN COUNT(*) < 10 THEN 1 ELSE 0 END AS at_risk
        |FROM customer GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
    "q_length_batches" ->
      """WITH b AS (SELECT doc_id AS id, CAST(n_chars AS BIGINT) AS len,
        |         n_chars // 64 AS bucket
        |       FROM documents WHERE n_chars IS NOT NULL),
        |r AS (SELECT id, len, bucket,
        |        ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY len, id) - 1 AS pos0
        |      FROM b)
        |SELECT id, len, bucket, pos0 // 16 AS batch_id, pos0 % 16 AS pos_in_batch
        |FROM r ORDER BY id""".stripMargin,
    "q_target_encode" ->
      """WITH base AS (SELECT o_orderpriority AS category,
        |         CASE WHEN o_totalprice > 150000.0 THEN 1 ELSE 0 END AS t
        |       FROM orders),
        |g AS (SELECT (1000000 * CAST(SUM(t) AS BIGINT)) // COUNT(*) AS gppm
        |      FROM base),
        |per AS (SELECT category, COUNT(*) AS n, CAST(SUM(t) AS BIGINT) AS n_pos
        |        FROM base GROUP BY category)
        |SELECT category, n, n_pos,
        |  (1000000 * n_pos + 20 * g.gppm) // (n + 20) AS enc_ppm
        |FROM per, g ORDER BY category""".stripMargin,
    "q_bpe_merges" ->
      s"""WITH ${bpeCtes(rounds = 3)}
         |${(1 to 3).map(r =>
              s"""SELECT $r AS round, ba AS "left", bb AS "right", cnt AS pair_count FROM best$r""")
             .mkString("\nUNION ALL ")}
         |ORDER BY round""".stripMargin,
    "q_bpe_segments" ->
      s"""WITH ${bpeCtes(rounds = 3)}
         |SELECT w, pos, sym FROM rows3 ORDER BY w, pos""".stripMargin,
    "q_tfidf" ->
      s"""WITH RECURSIVE
         |${tokenizeCtes()}
         |,
         |dt AS (SELECT wo.doc_id, t.tok, CAST(COUNT(*) AS BIGINT) AS tf
         |       FROM words wo JOIN wt t ON wo.w = t.w GROUP BY wo.doc_id, t.tok),
         |dfreq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM dt GROUP BY tok),
         |nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
         |wq AS (SELECT dt.doc_id, dt.tok,
         |              dt.tf * (((SELECT n_docs FROM nd) * 1000) // dfreq.df) AS weight
         |       FROM dt JOIN dfreq ON dt.tok = dfreq.tok),
         |r AS (SELECT doc_id, tok, weight,
         |             ROW_NUMBER() OVER (PARTITION BY doc_id
         |               ORDER BY weight DESC, tok ASC) AS rn
         |      FROM wq)
         |SELECT doc_id, CAST(rn AS INT) AS rank, tok, CAST(weight AS BIGINT) AS weight
         |FROM r WHERE rn <= 3 ORDER BY doc_id, rank""".stripMargin,
    "q_text_stats" ->
      """WITH t AS (SELECT lang, source, text, string_split(text, ' ') AS w FROM documents),
        |s AS (SELECT lang, source,
        |        len(w) AS n_tokens, length(text) AS n_chars,
        |        len(list_distinct(w)) AS n_distinct,
        |        len(list_filter(w, x -> x IN ('the','a','of','and','in'))) AS n_stop,
        |        len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+')) AS n_bpe
        |      FROM t)
        |SELECT lang, source, COUNT(*) AS n_docs,
        |       CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens,
        |       CAST(SUM(n_chars) AS BIGINT) AS tot_chars,
        |       CAST(SUM(n_distinct) AS BIGINT) AS tot_distinct,
        |       CAST(SUM(n_stop) AS BIGINT) AS tot_stop,
        |       CAST(SUM(n_bpe) AS BIGINT) AS tot_bpe_tokens,
        |       CAST(SUM(n_stop) AS DOUBLE) / SUM(n_tokens) AS stop_ratio
        |FROM s GROUP BY lang, source ORDER BY lang, source""".stripMargin,
    "q_lang_id" ->
      """WITH t AS (SELECT lang, string_split(text, ' ') AS w FROM documents),
        |sc AS (SELECT lang,
        |         len(list_filter(w, x -> x IN ('the','a','of','and','in'))) AS en,
        |         len(list_filter(w, x -> x IN ('der','die','das','und'))) AS de,
        |         len(list_filter(w, x -> x IN ('el','los','y','es'))) AS es,
        |         len(list_filter(w, x -> x IN ('le','les','et','est'))) AS fr
        |       FROM t),
        |p AS (SELECT lang,
        |        CASE WHEN en >= GREATEST(de, es, fr) AND en > 0 THEN 'en'
        |             WHEN de >= GREATEST(es, fr) AND de > 0 THEN 'de'
        |             WHEN es >= fr AND es > 0 THEN 'es'
        |             WHEN fr > 0 THEN 'fr'
        |             ELSE 'unknown' END AS predicted
        |      FROM sc)
        |SELECT lang, predicted, COUNT(*) AS n
        |FROM p GROUP BY lang, predicted ORDER BY lang, predicted""".stripMargin,
    "q_rare_tokens" ->
      """WITH toks AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents),
        |dfreq AS (SELECT tok, COUNT(*) AS df
        |          FROM (SELECT DISTINCT doc_id, tok FROM toks) GROUP BY tok),
        |j AS (SELECT toks.doc_id, dfreq.df FROM toks JOIN dfreq USING (tok)),
        |agg AS (SELECT doc_id,
        |          COUNT(*) AS n_token_rows,
        |          CAST(SUM(CASE WHEN df <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare
        |        FROM j GROUP BY doc_id)
        |SELECT doc_id, n_token_rows, n_rare,
        |       CAST((n_rare * 1000) // n_token_rows AS BIGINT) AS rare_permille
        |FROM agg ORDER BY doc_id""".stripMargin,
    "q_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |g2 AS (SELECT doc_id, array_to_string(list_slice(w, i, i + 1), ' ') AS ngram
        |       FROM t, UNNEST(range(1, len(w))) AS u(i)),
        |c2 AS (SELECT doc_id, ngram, COUNT(*) AS c FROM g2 GROUP BY doc_id, ngram),
        |a2 AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS total_bigrams,
        |         CAST((CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT) * 1000)
        |              // SUM(c) AS BIGINT) AS dup2_permille,
        |         CAST((MAX(c) * 1000) // SUM(c) AS BIGINT) AS top2_permille
        |       FROM c2 GROUP BY doc_id),
        |g5 AS (SELECT doc_id, array_to_string(list_slice(w, i, i + 4), ' ') AS ngram
        |       FROM t, UNNEST(range(1, len(w) - 3)) AS u(i)),
        |c5 AS (SELECT doc_id, ngram, COUNT(*) AS c FROM g5 GROUP BY doc_id, ngram),
        |a5 AS (SELECT doc_id,
        |         CAST((CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT) * 1000)
        |              // SUM(c) AS BIGINT) AS dup5_permille
        |       FROM c5 GROUP BY doc_id)
        |SELECT a2.doc_id, total_bigrams, dup2_permille, top2_permille, dup5_permille
        |FROM a2 JOIN a5 ON a2.doc_id = a5.doc_id ORDER BY a2.doc_id""".stripMargin,
    "q_source_cap" ->
      """WITH p AS (SELECT source, doc_id,
        |        ('0x' || substr(md5('cap' || CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT AS prio
        |      FROM documents),
        |r AS (SELECT source, doc_id, prio,
        |        ROW_NUMBER() OVER (PARTITION BY source
        |          ORDER BY prio DESC, doc_id ASC) AS rn
        |      FROM p)
        |SELECT source, CAST(rn AS INT) AS rank, doc_id, prio AS priority
        |FROM r WHERE rn <= 10 ORDER BY source, rank""".stripMargin,
    "q_doc_sim" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |tok AS (SELECT doc_id, u.tok FROM t, UNNEST(w) AS u(tok)),
        |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tok GROUP BY doc_id, tok),
        |dfq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok HAVING COUNT(*) <= 200),
        |nd AS (SELECT COUNT(*) AS n FROM documents),
        |w AS (SELECT tf.doc_id, tf.tok,
        |        tf.tf * (((SELECT n FROM nd) * 1000) // dfq.df) AS wt
        |      FROM tf JOIN dfq USING (tok)),
        |norm AS (SELECT doc_id, SUM(wt * wt) AS n2 FROM w GROUP BY doc_id),
        |dot AS (SELECT a.doc_id AS ia, b.doc_id AS ib, SUM(a.wt * b.wt) AS num
        |        FROM w a JOIN w b ON a.tok = b.tok AND a.doc_id < b.doc_id
        |        GROUP BY a.doc_id, b.doc_id),
        |sim AS (SELECT ia, ib,
        |          CAST((num * num * 1000) // (na.n2 * nb.n2) AS BIGINT) AS c2
        |        FROM dot JOIN norm na ON na.doc_id = ia
        |                 JOIN norm nb ON nb.doc_id = ib),
        |sym AS (SELECT ia AS a, ib AS b, c2 FROM sim
        |        UNION ALL SELECT ib AS a, ia AS b, c2 FROM sim),
        |r AS (SELECT a, b, c2,
        |        ROW_NUMBER() OVER (PARTITION BY a ORDER BY c2 DESC, b ASC) AS rn
        |      FROM sym)
        |SELECT a AS doc_id, CAST(rn AS INT) AS rank, b AS nbr_id,
        |       c2 AS cos2_permille
        |FROM r WHERE rn <= 3 ORDER BY doc_id, rank""".stripMargin,
    "q_decontam" ->
      """WITH b AS (SELECT doc_id, text,
        |         ('0x' || substr(md5('decontam' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        |           % 1000 AS bkt
        |       FROM documents),
        |train AS (SELECT doc_id, string_split(text, ' ') AS w FROM b WHERE bkt >= 100),
        |ev AS (SELECT string_split(text, ' ') AS w FROM b WHERE bkt < 100),
        |tsh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
        |        FROM train, UNNEST(range(1, greatest(len(w)-1, 2))) AS t(i)),
        |esh AS (SELECT DISTINCT array_to_string(w[i:i+2], ' ') AS shingle
        |        FROM ev, UNNEST(range(1, greatest(len(w)-1, 2))) AS t(i)),
        |sizes AS (SELECT doc_id, COUNT(*) AS n_ngrams FROM tsh GROUP BY doc_id),
        |hits AS (SELECT doc_id, COUNT(*) AS n_contam
        |         FROM tsh JOIN esh USING (shingle) GROUP BY doc_id)
        |SELECT s.doc_id,
        |       CAST(s.n_ngrams AS BIGINT) AS n_ngrams,
        |       CAST(COALESCE(h.n_contam, 0) AS BIGINT) AS n_contam,
        |       CAST((COALESCE(h.n_contam, 0) * 1000) // s.n_ngrams AS BIGINT) AS contam_permille,
        |       CAST(CASE WHEN (COALESCE(h.n_contam, 0) * 1000) // s.n_ngrams >= 200
        |            THEN 1 ELSE 0 END AS BIGINT) AS contaminated
        |FROM sizes s LEFT JOIN hits h ON s.doc_id = h.doc_id
        |ORDER BY s.doc_id""".stripMargin,
    "q_fingerprint" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |SELECT doc_id,
        |  CAST((SELECT SUM((ascii(substr(w[i+1], 1, 1)) * 31 + length(w[i+1])) *
        |          CAST(([1,31,961,29791,923521,28629151,887503681,27512614111])[(i % 8) + 1] AS BIGINT))
        |        FROM UNNEST(range(0, len(w))) AS u(i)) % 1000000007 AS BIGINT) AS fp
        |FROM t ORDER BY doc_id""".stripMargin,
    "q_quality" ->
      """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents),
        |s AS (SELECT doc_id,
        |        len(w) AS n_tokens,
        |        len(list_distinct(w)) AS n_distinct,
        |        len(list_filter(w, x -> x IN ('the','a','of','and','in'))) AS n_stop
        |      FROM t)
        |SELECT doc_id,
        |  CAST(0.4 AS DOUBLE) * LEAST(CAST(n_tokens AS DOUBLE) / CAST(100.0 AS DOUBLE), CAST(1.0 AS DOUBLE))
        |  + CAST(0.4 AS DOUBLE) * (CAST(n_distinct AS DOUBLE) / n_tokens)
        |  + CAST(0.2 AS DOUBLE) * LEAST(CAST(n_stop AS DOUBLE) * CAST(5.0 AS DOUBLE) / n_tokens, CAST(1.0 AS DOUBLE))
        |  AS quality
        |FROM s ORDER BY doc_id""".stripMargin,
    "q_sessionize" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id FROM events),
        |g AS (SELECT user_id, us,
        |        CASE WHEN LAG(us) OVER (PARTITION BY user_id ORDER BY us, event_id) IS NULL
        |             OR us - LAG(us) OVER (PARTITION BY user_id ORDER BY us, event_id) > 1800000000
        |             THEN 1 ELSE 0 END AS new_session,
        |        event_id
        |      FROM e),
        |sn AS (SELECT user_id, us,
        |         SUM(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
        |           ROWS UNBOUNDED PRECEDING) AS session_no
        |       FROM g)
        |SELECT user_id, COUNT(DISTINCT session_no) AS n_sessions, COUNT(*) AS n_events,
        |       CAST(MAX(us) - MIN(us) AS BIGINT) AS span_us
        |FROM sn GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_funnel" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_type FROM events),
        |s1 AS (SELECT user_id, MIN(us) AS t1 FROM e WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT s1.user_id, t1, MIN(CASE WHEN e.us > t1 THEN e.us END) AS t2
        |       FROM s1 LEFT JOIN e ON e.user_id = s1.user_id AND e.event_type = 'click'
        |       GROUP BY 1, 2),
        |s3 AS (SELECT s2.user_id, t1, t2, MIN(CASE WHEN e.us > t2 THEN e.us END) AS t3
        |       FROM s2 LEFT JOIN e ON e.user_id = s2.user_id AND e.event_type = 'purchase'
        |       GROUP BY 1, 2, 3)
        |SELECT user_id, t1, t2, t3,
        |       CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2 ELSE 1 END AS depth
        |FROM s3 ORDER BY user_id""".stripMargin,
    "q_funnel_steps" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_type FROM events),
        |s1 AS (SELECT user_id, MIN(us) AS t1 FROM e WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT s1.user_id, t1, MIN(CASE WHEN e.us > t1 THEN e.us END) AS t2
        |       FROM s1 LEFT JOIN e ON e.user_id = s1.user_id AND e.event_type = 'click'
        |       GROUP BY 1, 2),
        |s3 AS (SELECT s2.user_id, t1, t2, MIN(CASE WHEN e.us > t2 THEN e.us END) AS t3
        |       FROM s2 LEFT JOIN e ON e.user_id = s2.user_id AND e.event_type = 'purchase'
        |       GROUP BY 1, 2, 3)
        |SELECT 1 AS step, 'view' AS step_type, COUNT(t1) AS n_users FROM s3
        |UNION ALL SELECT 2, 'click', COUNT(t2) FROM s3
        |UNION ALL SELECT 3, 'purchase', COUNT(t3) FROM s3
        |ORDER BY step""".stripMargin,
    "q_event_windows" ->
      """SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us, event_type,
        |       COUNT(*) AS n,
        |       CAST(SUM(FLOOR(value * CAST(100.0 AS DOUBLE))) AS DOUBLE) / CAST(100.0 AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_feature_prop" ->
      """WITH ev AS (SELECT user_id, ts, event_id,
        |              lead(user_id) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS nxt
        |       FROM events WHERE event_type = 'click' AND value < 2.0),
        |ed AS (SELECT DISTINCT user_id AS src, nxt AS dst
        |       FROM ev WHERE nxt IS NOT NULL AND nxt <> user_id),
        |sym AS (SELECT src AS a, dst AS b FROM ed
        |        UNION SELECT dst, src FROM ed),
        |q AS (SELECT vec_id, list_transform(embedding,
        |        x -> CAST(FLOOR(CAST(x AS DOUBLE) * CAST(10000.0 AS DOUBLE)) AS BIGINT)) AS v
        |      FROM embeddings),
        |j AS (SELECT sym.a AS node, t.i - 1 AS pos, q.v[t.i] AS vl
        |      FROM sym JOIN q ON q.vec_id = sym.b,
        |           UNNEST(range(1, len(q.v)+1)) AS t(i)),
        |g AS (SELECT node, pos, SUM(vl) AS s, COUNT(*) AS n
        |      FROM j GROUP BY 1, 2)
        |SELECT node, CAST(pos AS INT) AS pos,
        |       CAST((s - (((s % n) + n) % n)) // n AS BIGINT) AS value
        |FROM g ORDER BY node, pos""".stripMargin,
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
    "q_rate_spikes" ->
      """WITH c AS (SELECT event_type,
        |             epoch_us(ts) - (epoch_us(ts) % 3600000000) AS window_start_us,
        |             COUNT(*) AS n
        |           FROM events GROUP BY 1, 2),
        |w AS (SELECT event_type, window_start_us, n,
        |        COALESCE(SUM(n) OVER (PARTITION BY event_type
        |          ORDER BY window_start_us ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING), 0)
        |          AS base_sum,
        |        COUNT(n) OVER (PARTITION BY event_type
        |          ORDER BY window_start_us ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
        |          AS n_prior
        |      FROM c)
        |SELECT event_type, window_start_us, n,
        |       CAST(base_sum AS BIGINT) AS base_sum,
        |       CAST(n_prior AS BIGINT) AS n_prior,
        |       (n_prior = 3 AND n * n_prior * 1 > base_sum * 2) AS is_spike
        |FROM w ORDER BY event_type, window_start_us""".stripMargin,
    "q_funnel_timing" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_type FROM events),
        |s1 AS (SELECT user_id, MIN(us) AS t1 FROM e WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT s1.user_id, t1, MIN(CASE WHEN e.us > t1 THEN e.us END) AS t2
        |       FROM s1 LEFT JOIN e ON e.user_id = s1.user_id AND e.event_type = 'click'
        |       GROUP BY 1, 2),
        |s3 AS (SELECT s2.user_id, t1, t2, MIN(CASE WHEN e.us > t2 THEN e.us END) AS t3
        |       FROM s2 LEFT JOIN e ON e.user_id = s2.user_id AND e.event_type = 'purchase'
        |       GROUP BY 1, 2, 3)
        |SELECT * FROM (
        |  SELECT 1 AS step, 'view' AS step_type, COUNT(t1) AS n_users,
        |    CAST(CASE WHEN COUNT(t1) = 0 THEN NULL
        |              ELSE SUM(t1 - t1) // COUNT(t1) END AS BIGINT) AS avg_us,
        |    CAST(MAX(t1 - t1) AS BIGINT) AS max_us FROM s3
        |  UNION ALL
        |  SELECT 2, 'click', COUNT(t2),
        |    CAST(CASE WHEN COUNT(t2) = 0 THEN NULL
        |              ELSE SUM(t2 - t1) // COUNT(t2) END AS BIGINT),
        |    CAST(MAX(t2 - t1) AS BIGINT) FROM s3
        |  UNION ALL
        |  SELECT 3, 'purchase', COUNT(t3),
        |    CAST(CASE WHEN COUNT(t3) = 0 THEN NULL
        |              ELSE SUM(t3 - t1) // COUNT(t3) END AS BIGINT),
        |    CAST(MAX(t3 - t1) AS BIGINT) FROM s3)
        |ORDER BY step""".stripMargin,
    "q_retention" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
        |c AS (SELECT user_id,
        |        MIN(us) - (MIN(us) % 86400000000) AS cohort_start_us
        |      FROM e GROUP BY user_id),
        |a AS (SELECT DISTINCT c.cohort_start_us,
        |        ((e.us - e.us % 86400000000) - c.cohort_start_us)
        |          // 86400000000 AS k,
        |        e.user_id
        |      FROM e JOIN c USING (user_id))
        |SELECT cohort_start_us, k, COUNT(*) AS n_users
        |FROM a GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_sliding_windows" ->
      """SELECT (epoch_us(ts) // 900000000 - t.k) * 900000000 AS window_start_us,
        |       event_type, COUNT(*) AS n,
        |       CAST(SUM(FLOOR(value * CAST(100.0 AS DOUBLE))) AS DOUBLE) / CAST(100.0 AS DOUBLE) AS sum_value
        |FROM events, UNNEST(range(0, 4)) AS t(k)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_events_json" ->
      """SELECT event_type, COUNT(*) AS n,
        |       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_asof" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, value
        |           FROM events),
        |p AS (SELECT user_id, ts_us,
        |        CAST(SUM(FLOOR(value * CAST(100.0 AS DOUBLE))) AS DOUBLE) / 100.0 AS p_value
        |      FROM e WHERE event_type = 'purchase' GROUP BY user_id, ts_us),
        |c AS (SELECT event_id, user_id, ts_us FROM e WHERE event_type <> 'purchase')
        |SELECT c.event_id, c.user_id, c.ts_us,
        |       p.ts_us AS purchase_ts_us, p.p_value
        |FROM c ASOF LEFT JOIN p
        |  ON c.user_id = p.user_id AND c.ts_us >= p.ts_us
        |ORDER BY c.event_id""".stripMargin,
    "q_asof_fwd" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, value
        |           FROM events),
        |p AS (SELECT user_id, ts_us,
        |        CAST(SUM(FLOOR(value * CAST(100.0 AS DOUBLE))) AS DOUBLE) / 100.0 AS p_value
        |      FROM e WHERE event_type = 'purchase' GROUP BY user_id, ts_us),
        |c AS (SELECT event_id, user_id, ts_us FROM e WHERE event_type <> 'purchase')
        |SELECT c.event_id, c.user_id, c.ts_us,
        |       p.ts_us AS purchase_ts_us, p.p_value
        |FROM c ASOF LEFT JOIN p
        |  ON c.user_id = p.user_id AND c.ts_us <= p.ts_us
        |ORDER BY c.event_id""".stripMargin,
    "q_multimodal" ->
      """WITH a AS (SELECT doc_id AS asset_id,
        |             (['image','audio','video'])[(doc_id % 3) + 1] AS kind,
        |             text,
        |             ('0x' || substr(md5(text), 1, 8))::BIGINT AS h
        |           FROM documents),
        |d AS (SELECT asset_id, kind,
        |        64 + h % 1024 AS width,
        |        CASE WHEN kind = 'image' THEN (CASE WHEN h % 2 = 0 THEN 'png' ELSE 'jpeg' END)
        |             WHEN kind = 'audio' THEN 'wav' ELSE 'mp4' END AS format,
        |        strlen(text) AS nbytes
        |      FROM a)
        |SELECT kind, format, COUNT(*) AS n_assets,
        |       CAST(SUM(width) AS BIGINT) AS tot_width,
        |       CAST(SUM(nbytes) AS BIGINT) AS tot_bytes
        |FROM d GROUP BY kind, format ORDER BY kind, format""".stripMargin,
    "q_multimodal_imageio" ->
      """SELECT doc_id AS asset_id,
        |  CAST(1 + doc_id % 16 AS INT) AS width,
        |  CAST(1 + (doc_id // 16) % 16 AS INT) AS height,
        |  'png' AS format,
        |  doc_id % 256 AS gray
        |FROM documents ORDER BY asset_id""".stripMargin,
    "q_multimodal_ann" -> graft.ops.Similarity.lshPortableOracle(
      dim = 8, k = 3, nBits = 4, tables = 2, seed = 42L,
      qSelect = {
        // md5(text) == md5(utf-8 payload bytes); 16-bit lanes % 1000,
        // pre-quantized ×10000 exactly as the Spark plan does
        val lanes = (0 until 8).map(i =>
          s"FLOOR(CAST(('0x' || substr(md5(text), ${4 * i + 1}, 4))::BIGINT % 1000 AS DOUBLE) * CAST(10000.0 AS DOUBLE))")
          .mkString(",\n           ")
        s"""SELECT doc_id AS id,
           |         [$lanes] AS v
           |       FROM documents""".stripMargin
      }),
    "q_asof_near" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, value
        |           FROM events),
        |p AS (SELECT user_id, ts_us,
        |        CAST(SUM(FLOOR(value * CAST(100.0 AS DOUBLE))) AS DOUBLE) / 100.0 AS p_value
        |      FROM e WHERE event_type = 'purchase' GROUP BY user_id, ts_us),
        |c AS (SELECT event_id, user_id, ts_us FROM e WHERE event_type <> 'purchase'),
        |b AS (SELECT c.event_id, p.ts_us AS m_ts, p.p_value AS m_val
        |      FROM c ASOF LEFT JOIN p
        |        ON c.user_id = p.user_id AND c.ts_us >= p.ts_us),
        |f AS (SELECT c.event_id, p.ts_us AS m_ts, p.p_value AS m_val
        |      FROM c ASOF LEFT JOIN p
        |        ON c.user_id = p.user_id AND c.ts_us <= p.ts_us)
        |SELECT c.event_id, c.user_id, c.ts_us,
        |       CASE WHEN b.m_ts IS NOT NULL AND
        |                 (f.m_ts IS NULL OR c.ts_us - b.m_ts <= f.m_ts - c.ts_us)
        |            THEN b.m_ts ELSE f.m_ts END AS purchase_ts_us,
        |       CASE WHEN b.m_ts IS NOT NULL AND
        |                 (f.m_ts IS NULL OR c.ts_us - b.m_ts <= f.m_ts - c.ts_us)
        |            THEN b.m_val ELSE f.m_val END AS p_value
        |FROM c JOIN b USING (event_id) JOIN f USING (event_id)
        |ORDER BY c.event_id""".stripMargin,
    "q_chunks" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |c AS (SELECT doc_id, w, len(w) AS n FROM t),
        |idx AS (SELECT doc_id, w, CAST(u.i AS INT) AS chunk_idx
        |        FROM c, UNNEST(range(0, 1 + CAST(CEIL(GREATEST(n - 64, 0) / 48.0) AS BIGINT))) AS u(i)),
        |ch AS (SELECT doc_id, chunk_idx,
        |              w[chunk_idx * 48 + 1 : chunk_idx * 48 + 64] AS cw
        |       FROM idx)
        |SELECT doc_id, chunk_idx, CAST(len(cw) AS INT) AS n_chunk_tokens,
        |       md5(array_to_string(cw, ' ')) AS chunk_md5
        |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin,
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
    "q_heavy_hitters" ->
      """WITH js AS (SELECT CAST(UNNEST(range(0, 4)) AS INT) AS j),
        |ev AS (SELECT md5('P' || CAST(l_partkey AS VARCHAR)) AS m FROM lineitem),
        |h AS (SELECT js.j,
        |             ('0x' || substr(ev.m, js.j * 8 + 1, 8))::BIGINT % 4096 AS idx
        |      FROM ev CROSS JOIN js),
        |sk AS (SELECT j, idx, COUNT(*) AS cnt FROM h GROUP BY j, idx),
        |q AS (SELECT DISTINCT 'P' || CAST(p_partkey AS VARCHAR) AS item FROM part),
        |qh AS (SELECT q.item, js.j,
        |              ('0x' || substr(md5(q.item), js.j * 8 + 1, 8))::BIGINT % 4096 AS idx
        |       FROM q CROSS JOIN js),
        |est AS (SELECT qh.item, MIN(COALESCE(sk.cnt, 0)) AS est
        |        FROM qh LEFT JOIN sk ON sk.j = qh.j AND sk.idx = qh.idx
        |        GROUP BY qh.item)
        |SELECT item, CAST(est AS BIGINT) AS est
        |FROM est WHERE est >= 40 ORDER BY item""".stripMargin,
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
    "q_link_pred" ->
      """WITH rows0 AS (SELECT l_orderkey AS tid, 'P' || CAST(l_partkey AS VARCHAR) AS item
        |               FROM lineitem WHERE l_quantity <= 15),
        |txok AS (SELECT tid FROM rows0 GROUP BY tid HAVING COUNT(*) <= 8),
        |r AS (SELECT rows0.tid, rows0.item FROM rows0 JOIN txok USING (tid)),
        |e AS (SELECT DISTINCT a.item AS x, b.item AS y
        |      FROM r a JOIN r b ON a.tid = b.tid AND a.item < b.item),
        |adj AS (SELECT x AS w, y AS n FROM e UNION ALL SELECT y AS w, x AS n FROM e),
        |deg AS (SELECT w, COUNT(*) AS d FROM adj GROUP BY w),
        |okc AS (SELECT w, d FROM deg WHERE d <= 64),
        |wed AS (SELECT a1.n AS a, a2.n AS b, okc.d
        |        FROM adj a1
        |        JOIN okc ON okc.w = a1.w
        |        JOIN adj a2 ON a2.w = a1.w AND a1.n < a2.n),
        |cand AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n_common,
        |                CAST(SUM(1000000000 // d) AS BIGINT) AS ra_q
        |         FROM wed GROUP BY a, b
        |         HAVING COUNT(*) >= 2)
        |SELECT c.a, c.b, c.n_common, c.ra_q
        |FROM cand c LEFT JOIN e ON e.x = c.a AND e.y = c.b
        |WHERE e.x IS NULL
        |ORDER BY c.a, c.b""".stripMargin,
    "q_kcore" -> kcoreOracle(k = 3, iters = 8),
    "q_coreness" -> corenessOracle(rounds = 4),
    "q_lpa_weighted" ->
      """WITH base AS (SELECT DISTINCT l_orderkey AS tid,
        |         'P' || CAST(l_partkey AS VARCHAR) AS item
        |       FROM lineitem WHERE l_quantity <= 15),
        |ok AS (SELECT tid FROM base GROUP BY tid HAVING COUNT(*) <= 8),
        |bb AS (SELECT base.tid, base.item FROM base JOIN ok USING (tid)),
        |ew AS MATERIALIZED (SELECT x.item AS x, y.item AS y,
        |        CAST(COUNT(*) AS BIGINT) AS w
        |      FROM bb x JOIN bb y ON x.tid = y.tid AND x.item < y.item
        |      GROUP BY 1, 2),
        |sew AS MATERIALIZED (SELECT x AS a, y AS b, w FROM ew
        |      UNION ALL SELECT y AS a, x AS b, w FROM ew),
        |wl0 AS MATERIALIZED (SELECT DISTINCT a AS node, a AS lab FROM sew),
        |wc1 AS (SELECT s.a, l.lab, CAST(SUM(s.w) AS BIGINT) AS c
        |      FROM sew s JOIN wl0 l ON l.node = s.b GROUP BY s.a, l.lab),
        |wl1 AS MATERIALIZED (SELECT a AS node, lab FROM (
        |      SELECT a, lab,
        |             ROW_NUMBER() OVER (PARTITION BY a ORDER BY c DESC, lab ASC) AS rn
        |      FROM wc1) WHERE rn = 1),
        |wc2 AS (SELECT s.a, l.lab, CAST(SUM(s.w) AS BIGINT) AS c
        |      FROM sew s JOIN wl1 l ON l.node = s.b GROUP BY s.a, l.lab),
        |wl2 AS MATERIALIZED (SELECT a AS node, lab FROM (
        |      SELECT a, lab,
        |             ROW_NUMBER() OVER (PARTITION BY a ORDER BY c DESC, lab ASC) AS rn
        |      FROM wc2) WHERE rn = 1),
        |wc3 AS (SELECT s.a, l.lab, CAST(SUM(s.w) AS BIGINT) AS c
        |      FROM sew s JOIN wl2 l ON l.node = s.b GROUP BY s.a, l.lab),
        |wl3 AS MATERIALIZED (SELECT a AS node, lab FROM (
        |      SELECT a, lab,
        |             ROW_NUMBER() OVER (PARTITION BY a ORDER BY c DESC, lab ASC) AS rn
        |      FROM wc3) WHERE rn = 1)
        |SELECT node, lab AS community FROM wl3 ORDER BY node""".stripMargin,
    "q_louvain_weighted" ->
      """WITH base AS (SELECT DISTINCT l_orderkey AS tid,
        |         'P' || CAST(l_partkey AS VARCHAR) AS item
        |       FROM lineitem WHERE l_quantity <= 15),
        |ok AS (SELECT tid FROM base GROUP BY tid HAVING COUNT(*) <= 8),
        |bb AS (SELECT base.tid, base.item FROM base JOIN ok USING (tid)),
        |ew AS MATERIALIZED (SELECT x.item AS x, y.item AS y,
        |        CAST(COUNT(*) AS BIGINT) AS w
        |      FROM bb x JOIN bb y ON x.tid = y.tid AND x.item < y.item
        |      GROUP BY 1, 2),
        |se AS MATERIALIZED (SELECT x AS a, y AS b FROM ew
        |      UNION ALL SELECT y AS a, x AS b FROM ew),
        |l0 AS MATERIALIZED (SELECT DISTINCT a AS node, a AS lab FROM se),
        |c1 AS MATERIALIZED (SELECT s.a, l.lab, COUNT(*) AS c
        |      FROM se s JOIN l0 l ON l.node = s.b GROUP BY s.a, l.lab),
        |l1 AS MATERIALIZED (SELECT a AS node, lab FROM (
        |      SELECT a, lab,
        |             ROW_NUMBER() OVER (PARTITION BY a ORDER BY c DESC, lab ASC) AS rn
        |      FROM c1) WHERE rn = 1),
        |c2 AS MATERIALIZED (SELECT s.a, l.lab, COUNT(*) AS c
        |      FROM se s JOIN l1 l ON l.node = s.b GROUP BY s.a, l.lab),
        |l2 AS MATERIALIZED (SELECT a AS node, lab FROM (
        |      SELECT a, lab,
        |             ROW_NUMBER() OVER (PARTITION BY a ORDER BY c DESC, lab ASC) AS rn
        |      FROM c2) WHERE rn = 1),
        |adjw AS (SELECT x AS v, y AS n, w FROM ew
        |      UNION ALL SELECT y AS v, x AS n, w FROM ew),
        |ww AS (SELECT CAST(SUM(w) AS BIGINT) AS wsum FROM ew),
        |strv AS (SELECT v, CAST(SUM(w) AS BIGINT) AS s FROM adjw GROUP BY v),
        |labv AS (SELECT node, lab AS community FROM l2),
        |sccw AS (SELECT community, CAST(SUM(s) AS BIGINT) AS s_c
        |      FROM strv JOIN labv ON strv.v = labv.node GROUP BY community),
        |wvc AS (SELECT adjw.v, labv.community AS c,
        |        CAST(SUM(adjw.w) AS BIGINT) AS w_vc
        |      FROM adjw JOIN labv ON labv.node = adjw.n GROUP BY 1, 2),
        |ownc AS (SELECT node AS v, community AS c, 0 AS w_vc FROM labv),
        |candc AS (SELECT v, c, CAST(MAX(w_vc) AS BIGINT) AS w_vc FROM (
        |        SELECT * FROM wvc UNION ALL SELECT * FROM ownc)
        |      GROUP BY v, c),
        |scw AS (SELECT candc.v, candc.c,
        |        4 * ww.wsum * candc.w_vc
        |          - 2 * strv.s * (sccw.s_c -
        |              CASE WHEN candc.c = labv.community THEN strv.s ELSE 0 END) AS score
        |      FROM candc CROSS JOIN ww
        |      JOIN labv ON labv.node = candc.v
        |      JOIN strv ON strv.v = candc.v
        |      JOIN sccw ON sccw.community = candc.c),
        |best AS (SELECT v, c,
        |        ROW_NUMBER() OVER (PARTITION BY v ORDER BY score DESC, c ASC) AS rn
        |      FROM scw)
        |SELECT v AS node, c AS community FROM best WHERE rn = 1
        |ORDER BY node""".stripMargin,
    "q_bipartite_proj" ->
      """WITH base AS (SELECT DISTINCT l_orderkey AS tid,
        |         'P' || CAST(l_partkey AS VARCHAR) AS item
        |       FROM lineitem WHERE l_quantity <= 15),
        |ok AS (SELECT tid FROM base GROUP BY tid HAVING COUNT(*) <= 8),
        |b AS (SELECT base.tid, base.item FROM base JOIN ok USING (tid))
        |SELECT x.item AS a, y.item AS b, COUNT(*) AS weight
        |FROM b x JOIN b y ON x.tid = y.tid AND x.item < y.item
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
    "q_communities" -> lpaOracle(rounds = 4),
    "q_harmonic" -> harmonicOracle(rounds = 4, ratePermille = 10,
      salt = "harmonic"),
    "q_hyperball" -> hyperballOracle(rounds = 3, p = 4, hashBits = 60),
    "q_eff_diameter" -> effDiameterOracle(rounds = 3, p = 4, hashBits = 60,
      targetPermille = 900L),
    "q_triangles" ->
      """WITH rows0 AS (SELECT l_orderkey AS tid, 'P' || CAST(l_partkey AS VARCHAR) AS item
        |               FROM lineitem WHERE l_quantity <= 15),
        |txok AS (SELECT tid FROM rows0 GROUP BY tid HAVING COUNT(*) <= 8),
        |r AS (SELECT rows0.tid, rows0.item FROM rows0 JOIN txok USING (tid)),
        |e AS (SELECT DISTINCT a.item AS x, b.item AS y
        |      FROM r a JOIN r b ON a.tid = b.tid AND a.item < b.item),
        |tri AS (SELECT e1.x AS a, e1.y AS b, e2.y AS c
        |        FROM e e1
        |        JOIN e e2 ON e2.x = e1.y
        |        JOIN e e3 ON e3.x = e1.x AND e3.y = e2.y),
        |corners AS (SELECT a AS node FROM tri
        |            UNION ALL SELECT b FROM tri
        |            UNION ALL SELECT c FROM tri)
        |SELECT node, COUNT(*) AS n_triangles
        |FROM corners GROUP BY node ORDER BY node""".stripMargin,
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
    "q_range_join" ->
      """WITH b AS (SELECT CAST(i AS INT) AS band_id,
        |                  CAST(i * 5000 AS DOUBLE) AS lo,
        |                  CAST(i * 5000 + 9999 AS DOUBLE) AS hi
        |           FROM range(0, 100) t(i))
        |SELECT b.band_id, COUNT(*) AS n_orders,
        |       CAST(SUM(FLOOR(o.o_totalprice * CAST(100.0 AS DOUBLE))) AS DOUBLE) / 100.0 AS sum_price
        |FROM b JOIN orders o ON o.o_totalprice >= b.lo AND o.o_totalprice <= b.hi
        |GROUP BY b.band_id ORDER BY b.band_id""".stripMargin,
    "q_interval_overlap" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id FROM events),
        |g AS (SELECT user_id, us,
        |        CASE WHEN LAG(us) OVER (PARTITION BY user_id ORDER BY us, event_id) IS NULL
        |             OR us - LAG(us) OVER (PARTITION BY user_id ORDER BY us, event_id) > 1800000000
        |             THEN 1 ELSE 0 END AS new_session,
        |        event_id
        |      FROM e),
        |sn AS (SELECT user_id, us,
        |         SUM(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
        |           ROWS UNBOUNDED PRECEDING) AS session_no
        |       FROM g),
        |s AS (SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
        |             MIN(us) AS s_start, MAX(us) AS s_end
        |      FROM sn GROUP BY user_id, session_no),
        |h AS (SELECT DISTINCT epoch_us(date_trunc('hour', ts)) AS window_start_us FROM events)
        |SELECT s.user_id, s.session_no, h.window_start_us
        |FROM s JOIN h ON s.s_start <= h.window_start_us + 3599999999
        |              AND h.window_start_us <= s.s_end
        |ORDER BY s.user_id, s.session_no, h.window_start_us""".stripMargin,
    "q_curate" ->
      """WITH keep AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY sha256(text)),
        |d1 AS (SELECT d.doc_id, d.text FROM documents d JOIN keep USING (doc_id)),
        |toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM d1),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
        |       FROM toks, UNNEST(range(1, greatest(len(w)-1, 2))) AS t(i)),
        |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
        |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2),
        |losers AS (SELECT DISTINCT id_b AS doc_id
        |           FROM inter JOIN sizes sa ON sa.doc_id = id_a
        |                      JOIN sizes sb ON sb.doc_id = id_b
        |           WHERE CAST(n_inter AS DOUBLE)/(sa.n_sh + sb.n_sh - n_inter) >= 0.5),
        |d2 AS (SELECT * FROM d1 WHERE doc_id NOT IN (SELECT doc_id FROM losers)),
        |st AS (SELECT doc_id, string_split(text, ' ') AS w, text FROM d2),
        |sc AS (SELECT doc_id,
        |         len(w) AS n_tokens,
        |         len(list_distinct(w)) AS n_distinct,
        |         len(list_filter(w, x -> x IN ('the','a','of','and','in'))) AS en,
        |         len(list_filter(w, x -> x IN ('der','die','das','und'))) AS de,
        |         len(list_filter(w, x -> x IN ('el','los','y','es'))) AS es,
        |         len(list_filter(w, x -> x IN ('le','les','et','est'))) AS fr
        |       FROM st),
        |q AS (SELECT doc_id,
        |        CAST(0.4 AS DOUBLE) * LEAST(CAST(n_tokens AS DOUBLE) / CAST(100.0 AS DOUBLE), CAST(1.0 AS DOUBLE))
        |        + CAST(0.4 AS DOUBLE) * (CAST(n_distinct AS DOUBLE) / n_tokens)
        |        + CAST(0.2 AS DOUBLE) * LEAST(CAST(en AS DOUBLE) * CAST(5.0 AS DOUBLE) / n_tokens, CAST(1.0 AS DOUBLE))
        |        AS quality,
        |        CASE WHEN en >= GREATEST(de, es, fr) AND en > 0 THEN 'en'
        |             WHEN de >= GREATEST(es, fr) AND de > 0 THEN 'de'
        |             WHEN es >= fr AND es > 0 THEN 'es'
        |             WHEN fr > 0 THEN 'fr'
        |             ELSE 'unknown' END AS lang_pred
        |      FROM sc)
        |SELECT doc_id, quality, lang_pred FROM q
        |WHERE quality >= CAST(0.3 AS DOUBLE)
        |ORDER BY doc_id""".stripMargin,
    "q_kmeans" -> (kmeansCtes(iters = 2) + """
        |SELECT vec_id, cluster, CAST(dist AS BIGINT) AS dist
        |FROM a_f ORDER BY vec_id""".stripMargin),
    "q_kmeans_fps" -> (kmeansFpsCtes(iters = 1, k = 4) + """
        |SELECT vec_id, cluster, CAST(dist AS BIGINT) AS dist
        |FROM a_f ORDER BY vec_id""".stripMargin),
    "q_semdedup" -> (kmeansCtes(iters = 2) + """,
        |nrm AS (SELECT vec_id, (SELECT SUM(v[i]*v[i])
        |          FROM UNNEST(range(1, len(v)+1)) AS t(i)) AS nrm FROM q),
        |wv AS (SELECT a_f.vec_id, a_f.cluster, q.v, nrm.nrm
        |       FROM a_f JOIN q USING (vec_id) JOIN nrm USING (vec_id)),
        |dup AS (SELECT DISTINCT b.vec_id FROM wv a
        |        JOIN wv b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        |        WHERE (SELECT SUM(a.v[i]*b.v[i])
        |                 FROM UNNEST(range(1, len(a.v)+1)) AS t(i))
        |              / SQRT(a.nrm * b.nrm) >= CAST(0.35 AS DOUBLE))
        |SELECT w.vec_id, w.cluster,
        |       (w.vec_id IN (SELECT vec_id FROM dup)) AS is_dup
        |FROM wv w ORDER BY w.vec_id""".stripMargin),
    "q_novelty" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
        |       FROM toks, UNNEST(range(1, greatest(len(w)-1, 2))) AS t(i)),
        |fo AS (SELECT shingle, MIN(doc_id) AS first_id FROM sh GROUP BY shingle)
        |SELECT sh.doc_id,
        |  COUNT(*) AS n_shingles,
        |  CAST(SUM(CASE WHEN sh.doc_id = fo.first_id THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_novel,
        |  CAST((SUM(CASE WHEN sh.doc_id = fo.first_id THEN 1 ELSE 0 END) * 1000)
        |    // COUNT(*) AS BIGINT) AS novelty_permille
        |FROM sh JOIN fo USING (shingle)
        |GROUP BY sh.doc_id
        |ORDER BY sh.doc_id""".stripMargin,
    "q_multimodal_resize" ->
      """WITH a AS (SELECT doc_id AS asset_id,
        |             (['image','audio','video'])[(doc_id % 3) + 1] AS kind,
        |             text,
        |             ('0x' || substr(md5(text), 1, 8))::BIGINT AS h
        |           FROM documents),
        |d AS (SELECT asset_id, kind,
        |        CAST(64 + h % 1024 AS BIGINT) AS w,
        |        CAST(64 + (h // 1024) % 1024 AS BIGINT) AS ht,
        |        CASE WHEN kind = 'image' THEN (CASE WHEN h % 2 = 0 THEN 'png' ELSE 'jpeg' END)
        |             WHEN kind = 'audio' THEN 'wav' ELSE 'mp4' END AS format,
        |        CAST(strlen(text) AS BIGINT) AS len
        |      FROM a),
        |r AS (SELECT kind, format, w, ht, len,
        |        CASE WHEN kind IN ('image', 'video')
        |             THEN least(1000000, (256 * 1000000) // w, (256 * 1000000) // ht)
        |             ELSE 1000000 END AS scale
        |      FROM d),
        |f AS (SELECT kind, format, w, ht, len,
        |        greatest(1, (w * scale) // 1000000) AS nw,
        |        greatest(1, (ht * scale) // 1000000) AS nh
        |      FROM r),
        |g AS (SELECT kind, format, nw, nh,
        |        least(len, greatest(1, (len * nw * nh) // (w * ht))) AS nlen
        |      FROM f)
        |SELECT kind, format, COUNT(*) AS n_assets,
        |  CAST(SUM(nw) AS BIGINT) AS tot_width,
        |  CAST(SUM(nh) AS BIGINT) AS tot_height,
        |  CAST(SUM(nlen) AS BIGINT) AS tot_bytes
        |FROM g GROUP BY kind, format ORDER BY kind, format""".stripMargin,
    "q_domain_affinity" ->
      """WITH toks AS (SELECT doc_id, lang = 'en' AS is_t,
        |                text, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT DISTINCT doc_id, is_t,
        |         array_to_string(w[i:i+1], ' ') AS shingle
        |       FROM toks, UNNEST(range(1, greatest(len(w), 2))) AS t(i)),
        |b AS (SELECT DISTINCT doc_id, is_t,
        |        ('0x' || substr(md5(shingle), 1, 8))::BIGINT % 4096 AS bucket
        |      FROM sh),
        |cnts AS (SELECT bucket,
        |           CAST(SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS ct,
        |           CAST(SUM(CASE WHEN is_t THEN 0 ELSE 1 END) AS BIGINT) AS cs
        |         FROM b GROUP BY bucket),
        |tot AS (SELECT CAST(SUM(ct) AS BIGINT) AS nt,
        |               CAST(SUM(cs) AS BIGINT) AS ns FROM cnts),
        |aff AS (SELECT bucket,
        |          (ct + 1) * (ns + 4096) >= 2 * ((cs + 1) * (nt + 4096)) AS is_affine
        |        FROM cnts, tot)
        |SELECT b.doc_id, COUNT(*) AS n_features,
        |  CAST(SUM(CASE WHEN aff.is_affine THEN 1 ELSE 0 END) AS BIGINT) AS n_affine,
        |  CAST((SUM(CASE WHEN aff.is_affine THEN 1 ELSE 0 END) * 1000)
        |    // COUNT(*) AS BIGINT) AS affinity_permille
        |FROM b JOIN aff USING (bucket)
        |GROUP BY b.doc_id ORDER BY b.doc_id""".stripMargin,
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
    "q_transitions" ->
      """WITH e AS (SELECT user_id, event_type,
        |             lead(event_type) OVER (PARTITION BY user_id
        |               ORDER BY epoch_us(ts), event_id) AS to_type
        |           FROM events),
        |c AS (SELECT event_type AS from_type, to_type, COUNT(*) AS n
        |      FROM e WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |       CAST(SUM(n) OVER (PARTITION BY from_type) AS BIGINT) AS from_total,
        |       CAST((n * 1000) // SUM(n) OVER (PARTITION BY from_type) AS BIGINT)
        |         AS permille
        |FROM c ORDER BY from_type, to_type""".stripMargin,
    "q_scd2" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id, event_type,
        |             lag(event_type) OVER (PARTITION BY user_id
        |               ORDER BY epoch_us(ts), event_id) AS prev
        |           FROM events),
        |ch AS (SELECT user_id, us, event_id, event_type
        |       FROM e WHERE prev IS NULL OR prev <> event_type)
        |SELECT user_id, event_type, us AS valid_from_us,
        |       lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
        |         AS valid_to_us,
        |       CAST(row_number() OVER (PARTITION BY user_id ORDER BY us, event_id)
        |         AS BIGINT) AS version,
        |       lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) IS NULL
        |         AS is_current
        |FROM ch ORDER BY user_id, version""".stripMargin,
    "q_interval_merge" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id,
        |             epoch_us(ts) + 1800000000 AS e_end FROM events),
        |m AS (SELECT *, MAX(e_end) OVER (PARTITION BY user_id
        |        ORDER BY us, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
        |      FROM e),
        |f AS (SELECT *, CASE WHEN pme IS NULL OR us > pme THEN 1 ELSE 0 END AS nw
        |      FROM m),
        |i AS (SELECT *, SUM(nw) OVER (PARTITION BY user_id
        |        ORDER BY us, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island_idx
        |      FROM f)
        |SELECT user_id, CAST(island_idx AS BIGINT) AS island_idx,
        |       MIN(us) AS start_us, MAX(e_end) AS end_us, COUNT(*) AS n_events
        |FROM i GROUP BY user_id, island_idx ORDER BY user_id, island_idx""".stripMargin,
    "q_decay_counts" ->
      """WITH c AS (SELECT event_type,
        |             epoch_us(ts) - epoch_us(ts) % 3600000000 AS ws,
        |             COUNT(*) AS n
        |           FROM events GROUP BY 1, 2),
        |r AS (SELECT MAX(ws) AS ref_ws FROM c),
        |a AS (SELECT event_type, n, (ref_ws - ws) // 3600000000 AS age
        |      FROM c, r WHERE (ref_ws - ws) // 3600000000 <= 20)
        |SELECT event_type, CAST(SUM(n) AS BIGINT) AS n_recent,
        |       CAST(SUM(n * (CAST(1 AS BIGINT) << CAST(20 - age AS INT)))
        |         AS BIGINT) AS decayed_num,
        |       CAST((SUM(n * (CAST(1 AS BIGINT) << CAST(20 - age AS INT)))
        |         * 1000000) // 1048576 AS BIGINT) AS decayed_ppm
        |FROM a GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_keywords" ->
      """WITH toks AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
        |              FROM documents),
        |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        |dfq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
        |sc AS (SELECT doc_id, tok, tf * (1000000 // df) AS score
        |       FROM tf JOIN dfq USING (tok)),
        |r AS (SELECT doc_id, tok, score,
        |        row_number() OVER (PARTITION BY doc_id
        |          ORDER BY score DESC, tok ASC) AS rank
        |      FROM sc)
        |SELECT doc_id, CAST(rank AS BIGINT) AS rank, tok AS token,
        |       CAST(score AS BIGINT) AS score
        |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    "q_jaccard_links" ->
      """WITH rows0 AS (SELECT l_orderkey AS tid, 'P' || CAST(l_partkey AS VARCHAR) AS item
        |               FROM lineitem WHERE l_quantity <= 15),
        |txok AS (SELECT tid FROM rows0 GROUP BY tid HAVING COUNT(*) <= 8),
        |r AS (SELECT rows0.tid, rows0.item FROM rows0 JOIN txok USING (tid)),
        |e AS (SELECT DISTINCT a.item AS x, b.item AS y
        |      FROM r a JOIN r b ON a.tid = b.tid AND a.item < b.item),
        |adj AS (SELECT x AS w, y AS n FROM e UNION ALL SELECT y AS w, x AS n FROM e),
        |deg AS (SELECT w, COUNT(*) AS d FROM adj GROUP BY w),
        |okc AS (SELECT w FROM deg WHERE d <= 64),
        |capd AS (SELECT a1.w, a1.n FROM adj a1 JOIN okc ON okc.w = a1.w),
        |cand AS (SELECT a1.n AS a, a2.n AS b, CAST(COUNT(*) AS BIGINT) AS n_common
        |         FROM capd a1 JOIN capd a2 ON a2.w = a1.w AND a1.n < a2.n
        |         GROUP BY 1, 2 HAVING COUNT(*) >= 2)
        |SELECT c.a, c.b, c.n_common, da.d AS deg_a, db.d AS deg_b,
        |       CAST((1000 * c.n_common) // (da.d + db.d - c.n_common) AS BIGINT)
        |         AS jaccard_permille
        |FROM cand c
        |LEFT JOIN e ON e.x = c.a AND e.y = c.b
        |JOIN deg da ON da.w = c.a
        |JOIN deg db ON db.w = c.b
        |WHERE e.x IS NULL
        |ORDER BY c.a, c.b""".stripMargin,
    "q_bipartite" ->
      """WITH RECURSIVE
        |ev AS (SELECT user_id, ts, event_id,
        |         lead(user_id) OVER (PARTITION BY event_type
        |           ORDER BY ts, event_id) AS nxt
        |       FROM events WHERE event_type = 'click' AND value < 2.0),
        |ed AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS a,
        |         CAST(nxt AS VARCHAR) AS b
        |       FROM ev WHERE nxt IS NOT NULL AND nxt <> user_id),
        |dbl AS (SELECT a || '#0' AS a, b || '#1' AS b FROM ed
        |        UNION SELECT a || '#1', b || '#0' FROM ed),
        |symd AS (SELECT a, b FROM dbl UNION SELECT b AS a, a AS b FROM dbl),
        |nodesd AS (SELECT DISTINCT a AS node FROM symd),
        |ccd AS (
        |  SELECT node, node AS lab FROM nodesd
        |  UNION
        |  SELECT s.b AS node, c.lab
        |  FROM ccd c JOIN symd s ON c.node = s.a
        |  WHERE c.lab < s.b),
        |compd AS (SELECT node, MIN(lab) AS comp FROM ccd GROUP BY node),
        |pairs AS (SELECT substr(node, 1, length(node) - 2) AS bnode, comp,
        |            COUNT(*) AS k
        |          FROM compd GROUP BY 1, 2),
        |odd AS (SELECT DISTINCT bnode FROM pairs WHERE k = 2),
        |symb AS (SELECT a, b FROM ed UNION SELECT b AS a, a AS b FROM ed),
        |nodesb AS (SELECT DISTINCT a AS node FROM symb),
        |ccb AS (
        |  SELECT node, node AS lab FROM nodesb
        |  UNION
        |  SELECT s.b AS node, c.lab
        |  FROM ccb c JOIN symb s ON c.node = s.a
        |  WHERE c.lab < s.b),
        |compb AS (SELECT node, MIN(lab) AS component FROM ccb GROUP BY node)
        |SELECT component, COUNT(*) AS n_nodes,
        |       MAX(CASE WHEN o.bnode IS NOT NULL THEN 1 ELSE 0 END) = 0
        |         AS is_bipartite
        |FROM compb LEFT JOIN odd o ON o.bnode = compb.node
        |GROUP BY component ORDER BY component""".stripMargin,
    "q_user_paths" ->
      """WITH e AS (SELECT user_id, event_type,
        |             row_number() OVER (PARTITION BY user_id
        |               ORDER BY epoch_us(ts), event_id) AS rn
        |           FROM events),
        |p AS (SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path,
        |        COUNT(*) AS depth
        |      FROM e WHERE rn <= 5 GROUP BY user_id)
        |SELECT path, CAST(depth AS BIGINT) AS depth, COUNT(*) AS n_users
        |FROM p GROUP BY 1, 2 ORDER BY path, depth""".stripMargin,
    "q_hard_negatives" ->
      """WITH q AS (SELECT vec_id, label, list_transform(embedding,
        |             x -> FLOOR(CAST(x AS DOUBLE) * CAST(10000.0 AS DOUBLE))) AS v
        |           FROM embeddings),
        |n AS (SELECT vec_id, (SELECT SUM(x*x) FROM UNNEST(v) AS t(x)) AS nrm FROM q),
        |p AS (SELECT qq.vec_id AS query_id, c.vec_id AS neighbor_id,
        |        (SELECT SUM(qq.v[i]*c.v[i]) FROM UNNEST(range(1, len(qq.v)+1)) AS t(i)) AS dot
        |      FROM (SELECT * FROM q WHERE vec_id < 20) qq
        |      JOIN q c ON c.vec_id <> qq.vec_id AND c.label <> qq.label),
        |scored AS (SELECT query_id, neighbor_id,
        |             dot / SQRT(na.nrm * nb.nrm) AS cosine,
        |             ROW_NUMBER() OVER (PARTITION BY query_id
        |               ORDER BY dot / SQRT(na.nrm * nb.nrm) DESC, neighbor_id ASC) AS rank
        |           FROM p JOIN n na ON na.vec_id = query_id
        |                  JOIN n nb ON nb.vec_id = neighbor_id
        |           WHERE NOT isnan(dot / SQRT(na.nrm * nb.nrm)))
        |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cosine
        |FROM scored WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,
    "q_pagerank_weighted" -> pagerankFpOracle(iters = 10, weighted = true),
    "q_degree_dist" ->
      """WITH rows0 AS (SELECT l_orderkey AS tid, 'P' || CAST(l_partkey AS VARCHAR) AS item
        |               FROM lineitem WHERE l_quantity <= 15),
        |txok AS (SELECT tid FROM rows0 GROUP BY tid HAVING COUNT(*) <= 8),
        |r AS (SELECT rows0.tid, rows0.item FROM rows0 JOIN txok USING (tid)),
        |e AS (SELECT DISTINCT a.item AS x, b.item AS y
        |      FROM r a JOIN r b ON a.tid = b.tid AND a.item < b.item),
        |adj AS (SELECT x AS node FROM e UNION ALL SELECT y FROM e),
        |deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
        |        FROM adj GROUP BY node)
        |SELECT degree, COUNT(*) AS n_nodes FROM deg
        |GROUP BY degree ORDER BY degree""".stripMargin,
    "q_assortativity" ->
      """WITH rows0 AS (SELECT l_orderkey AS tid, 'P' || CAST(l_partkey AS VARCHAR) AS item
        |               FROM lineitem WHERE l_quantity <= 15),
        |txok AS (SELECT tid FROM rows0 GROUP BY tid HAVING COUNT(*) <= 8),
        |r AS (SELECT rows0.tid, rows0.item FROM rows0 JOIN txok USING (tid)),
        |e AS (SELECT DISTINCT a.item AS x, b.item AS y
        |      FROM r a JOIN r b ON a.tid = b.tid AND a.item < b.item),
        |adj AS (SELECT x AS node FROM e UNION ALL SELECT y FROM e),
        |deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM adj GROUP BY node),
        |ends AS (SELECT dx.d AS dx, dy.d AS dy
        |         FROM e JOIN deg dx ON dx.node = e.x JOIN deg dy ON dy.node = e.y),
        |sym AS (SELECT dx, dy FROM ends UNION ALL SELECT dy AS dx, dx AS dy FROM ends),
        |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS m_ends,
        |        CAST(SUM(dx * dy) AS BIGINT) AS s_xy,
        |        CAST(SUM(dx) AS BIGINT) AS s_x,
        |        CAST(SUM(dx * dx) AS BIGINT) AS s_x2
        |      FROM sym)
        |SELECT m_ends, s_xy, s_x, s_x2,
        |       (CAST(m_ends AS DOUBLE) * CAST(s_xy AS DOUBLE)
        |          - CAST(s_x AS DOUBLE) * CAST(s_x AS DOUBLE))
        |       / (CAST(m_ends AS DOUBLE) * CAST(s_x2 AS DOUBLE)
        |          - CAST(s_x AS DOUBLE) * CAST(s_x AS DOUBLE)) AS assortativity
        |FROM s""".stripMargin,
    "q_modularity" ->
      s"""${lpaCtes(4)},
         |lab AS (SELECT node, lab AS community FROM l4),
         |wl AS (SELECT lx.community AS cx, ly.community AS cy
         |       FROM e0 JOIN lab lx ON lx.node = e0.x
         |              JOIN lab ly ON ly.node = e0.y),
         |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS m_edges FROM wl),
         |intra AS (SELECT cx AS community, CAST(COUNT(*) AS BIGINT) AS e_c
         |          FROM wl WHERE cx = cy GROUP BY cx),
         |degc AS (SELECT community, CAST(COUNT(*) AS BIGINT) AS d_c
         |         FROM (SELECT cx AS community FROM wl
         |               UNION ALL SELECT cy FROM wl) GROUP BY community),
         |pc AS (SELECT d.community, COALESCE(i.e_c, 0) AS e_c, d.d_c
         |       FROM degc d LEFT JOIN intra i ON i.community = d.community),
         |qn AS (SELECT CAST(SUM(4 * t.m_edges * pc.e_c - pc.d_c * pc.d_c)
         |                AS BIGINT) AS q_num,
         |              ANY_VALUE(t.m_edges) AS m_edges
         |       FROM pc, tot t)
         |SELECT m_edges, q_num,
         |       CAST(4 * m_edges * m_edges AS BIGINT) AS q_den,
         |       CAST(q_num AS DOUBLE) / CAST(4 * m_edges * m_edges AS DOUBLE)
         |         AS modularity
         |FROM qn""".stripMargin,
    "q_temporal_reach" -> {
      val head =
        """WITH ev AS (SELECT user_id, event_id,
          |         lead(user_id) OVER (PARTITION BY event_type
          |           ORDER BY ts, event_id) AS nxt,
          |         lead(epoch_us(ts)) OVER (PARTITION BY event_type
          |           ORDER BY ts, event_id) AS nxt_us
          |       FROM events WHERE event_type = 'click' AND value < 2.0),
          |te AS MATERIALIZED (SELECT DISTINCT CAST(user_id AS VARCHAR) AS a,
          |         CAST(nxt AS VARCHAR) AS b, CAST(nxt_us AS BIGINT) AS t
          |       FROM ev WHERE nxt IS NOT NULL AND nxt <> user_id),
          |nodes AS (SELECT DISTINCT a AS node FROM te
          |          UNION SELECT DISTINCT b FROM te),
          |src AS (SELECT node FROM nodes
          |        WHERE ('0x' || substr(md5('treach' || node), 1, 15))::BIGINT
          |              % 1000 < 100),
          |r0 AS MATERIALIZED (SELECT node AS s, node AS v,
          |         CAST(-1 AS BIGINT) AS arr FROM src)""".stripMargin
      val steps = (1 to 4).map { i =>
        s"""r$i AS MATERIALIZED (SELECT s, v, MIN(arr) AS arr FROM (
           |       SELECT s, v, arr FROM r${i - 1}
           |       UNION ALL
           |       SELECT p.s, te.b AS v, te.t AS arr
           |       FROM r${i - 1} p JOIN te ON p.v = te.a AND te.t > p.arr
           |     ) GROUP BY s, v)""".stripMargin
      }.mkString(",\n")
      s"""$head,
         |$steps
         |SELECT s, v AS node, CAST(arr AS BIGINT) AS earliest_us FROM r4
         |WHERE s <> v ORDER BY s, node""".stripMargin
    },
    "q_mixture" ->
      """WITH sh AS (SELECT * FROM (VALUES ('src0', 500), ('src1', 300),
        |              ('src2', 200)) AS t(source, share)),
        |cnt AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
        |rates AS (SELECT cnt.source,
        |            LEAST(1000, (((30 * share) // 1000) * 1000) // n)
        |              AS rate_permille
        |          FROM cnt JOIN sh USING (source))
        |SELECT d.doc_id, d.source, CAST(rate_permille AS BIGINT) AS rate_permille
        |FROM documents d JOIN rates USING (source)
        |WHERE ('0x' || substr(md5('mix' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        |      % 1000 < rate_permille
        |ORDER BY doc_id""".stripMargin,
    "q_pivot" ->
      """SELECT epoch_us(ts) // 86400000000 AS day,
        |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,
    "q_attribution" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us, event_type, value
        |           FROM events),
        |conv AS (SELECT event_id, user_id, us,
        |           CAST(FLOOR(value * CAST(100.0 AS DOUBLE)) AS BIGINT) AS cents
        |         FROM e WHERE event_type = 'purchase'),
        |t0 AS (SELECT user_id, us, event_type, event_id,
        |         row_number() OVER (PARTITION BY user_id, us ORDER BY event_id) AS rn
        |       FROM e WHERE event_type <> 'purchase'),
        |tch AS (SELECT user_id, us, event_type AS touch_type FROM t0 WHERE rn = 1),
        |pick AS (SELECT c.event_id, c.user_id, c.cents, MAX(t.us) AS touch_us
        |         FROM conv c LEFT JOIN tch t ON t.user_id = c.user_id
        |              AND t.us < c.us AND c.us - t.us <= 604800000000
        |         GROUP BY 1, 2, 3),
        |att AS (SELECT COALESCE(t.touch_type, '(none)') AS touch_type, p.cents
        |        FROM pick p LEFT JOIN tch t ON t.user_id = p.user_id
        |             AND t.us = p.touch_us)
        |SELECT touch_type, COUNT(*) AS n_conversions,
        |       CAST(SUM(cents) AS BIGINT) AS cents_total
        |FROM att GROUP BY 1 ORDER BY touch_type""".stripMargin,
    "q_collocations" ->
      """WITH toks AS (SELECT DISTINCT doc_id, UNNEST(string_split(text, ' ')) AS tok
        |              FROM documents),
        |dfq AS (SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok),
        |kept AS (SELECT t.doc_id, t.tok FROM toks t JOIN dfq USING (tok)
        |         WHERE dfq.n <= 400),
        |p AS (SELECT a.tok AS x, b.tok AS y, COUNT(*) AS n_xy
        |      FROM kept a JOIN kept b ON a.doc_id = b.doc_id AND a.tok < b.tok
        |      GROUP BY 1, 2 HAVING COUNT(*) >= 20),
        |nd AS (SELECT COUNT(DISTINCT doc_id) AS n FROM documents)
        |SELECT x, y, CAST(n_xy AS BIGINT) AS n_xy,
        |       CAST(dx.n AS BIGINT) AS n_x, CAST(dy.n AS BIGINT) AS n_y,
        |       CAST(nd.n AS BIGINT) AS n_docs,
        |       (CAST(n_xy AS DOUBLE) * CAST(nd.n AS DOUBLE))
        |         / (CAST(dx.n AS DOUBLE) * CAST(dy.n AS DOUBLE)) AS lift
        |FROM p JOIN dfq dx ON dx.tok = p.x JOIN dfq dy ON dy.tok = p.y, nd
        |ORDER BY x, y""".stripMargin,
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
    "q_matching" -> {
      val head =
        """WITH rows0 AS (SELECT l_orderkey AS tid, 'P' || CAST(l_partkey AS VARCHAR) AS item
          |               FROM lineitem WHERE l_quantity <= 15),
          |txok AS (SELECT tid FROM rows0 GROUP BY tid HAVING COUNT(*) <= 8),
          |r AS (SELECT rows0.tid, rows0.item FROM rows0 JOIN txok USING (tid)),
          |e AS (SELECT DISTINCT a.item AS x, b.item AS y
          |      FROM r a JOIN r b ON a.tid = b.tid AND a.item < b.item),
          |e0 AS MATERIALIZED (SELECT x, y,
          |        ('0x' || substr(md5('match' || x || '|' || y), 1, 15))::BIGINT AS p
          |      FROM e)""".stripMargin
      val steps = (1 to 6).map { i =>
        s"""adj$i AS (SELECT x AS v, x, y, p FROM e${i - 1}
           |        UNION ALL SELECT y AS v, x, y, p FROM e${i - 1}),
           |lm$i AS (SELECT x, y FROM (
           |        SELECT v, x, y, row_number() OVER (PARTITION BY v
           |          ORDER BY p, x, y) AS rn FROM adj$i) WHERE rn = 1),
           |m$i AS MATERIALIZED (SELECT x, y, $i AS round FROM lm$i
           |       GROUP BY x, y HAVING COUNT(*) = 2),
           |mv$i AS (SELECT x AS v FROM m$i UNION SELECT y FROM m$i),
           |e$i AS MATERIALIZED (SELECT t.x, t.y, t.p FROM e${i - 1} t
           |       LEFT JOIN mv$i a ON a.v = t.x
           |       LEFT JOIN mv$i b ON b.v = t.y
           |       WHERE a.v IS NULL AND b.v IS NULL)""".stripMargin
      }.mkString(",\n")
      val un = (1 to 6).map(i => s"SELECT * FROM m$i").mkString(" UNION ALL ")
      s"""$head,
         |$steps
         |SELECT x, y, CAST(round AS BIGINT) AS round FROM ($un)
         |ORDER BY x, y""".stripMargin
    },
    "q_event_ngrams" ->
      """WITH e AS (SELECT user_id, event_type,
        |             lead(event_type, 1) OVER (PARTITION BY user_id
        |               ORDER BY epoch_us(ts), event_id) AS t1,
        |             lead(event_type, 2) OVER (PARTITION BY user_id
        |               ORDER BY epoch_us(ts), event_id) AS t2
        |           FROM events)
        |SELECT event_type || '>' || t1 || '>' || t2 AS ngram,
        |       COUNT(*) AS n_occurrences
        |FROM e WHERE t1 IS NOT NULL AND t2 IS NOT NULL
        |GROUP BY 1 ORDER BY ngram""".stripMargin,
    "q_multimodal_dedup" ->
      """SELECT md5(substr(text, 1, 40)) AS digest, COUNT(*) AS n_copies,
        |       CAST(MIN(doc_id) AS BIGINT) AS keeper_id
        |FROM documents GROUP BY 1 ORDER BY digest""".stripMargin,
    "q_snapshot_diff" ->
      """WITH o AS (SELECT l_partkey, COUNT(*) AS n_items,
        |             CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
        |           FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-01-01'
        |           GROUP BY 1),
        |n AS (SELECT l_partkey, COUNT(*) AS n_items,
        |        CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
        |      FROM lineitem WHERE l_shipdate < TIMESTAMP '1999-01-01'
        |      GROUP BY 1),
        |j AS (SELECT COALESCE(o.l_partkey, n.l_partkey) AS l_partkey,
        |        o.n_items AS old_n_items, n.n_items AS new_n_items,
        |        o.sum_qty AS old_sum_qty, n.sum_qty AS new_sum_qty,
        |        CASE WHEN o.l_partkey IS NULL THEN 'added'
        |             WHEN n.l_partkey IS NULL THEN 'removed'
        |             WHEN o.n_items <> n.n_items OR o.sum_qty <> n.sum_qty
        |               THEN 'changed' END AS change
        |      FROM o FULL OUTER JOIN n ON o.l_partkey = n.l_partkey)
        |SELECT change, l_partkey, old_n_items, new_n_items,
        |       old_sum_qty, new_sum_qty
        |FROM j WHERE change IS NOT NULL ORDER BY l_partkey""".stripMargin,
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
    "q_random_walks" -> {
      // unrolled per-step argmin mirror of RandomWalks.walks: same md5
      // coin, same (score, dst) tie order, seeds = 40 smallest src strings
      val head =
        """WITH ev AS (SELECT user_id, ts, event_id,
          |         lead(user_id) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS nxt
          |       FROM events WHERE event_type = 'click' AND value < 2.0),
          |e AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS src, CAST(nxt AS VARCHAR) AS dst
          |      FROM ev WHERE nxt IS NOT NULL AND nxt <> user_id),
          |seeds AS (SELECT src AS walk_id FROM (SELECT DISTINCT src FROM e)
          |          ORDER BY src LIMIT 40),
          |s0 AS (SELECT walk_id, walk_id AS node FROM seeds)""".stripMargin
      val steps = (1 to 4).map { t =>
        s"""s$t AS (SELECT walk_id, dst AS node FROM (
           |  SELECT w.walk_id, e.dst,
           |    row_number() OVER (PARTITION BY w.walk_id ORDER BY
           |      ('0x' || substr(md5('walk' || w.walk_id || '|$t|' || e.dst), 1, 15))::BIGINT, e.dst) AS rn
           |  FROM s${t - 1} w JOIN e ON w.node = e.src) WHERE rn = 1)""".stripMargin
      }.mkString(",\n")
      val un = (0 to 4)
        .map(t => s"SELECT walk_id, CAST($t AS BIGINT) AS step, node FROM s$t")
        .mkString(" UNION ALL ")
      s"""$head,
         |$steps
         |SELECT * FROM ($un) ORDER BY walk_id, step""".stripMargin
    },
    "q_mst" ->
      // Prim with a single-row recursive state (visited list + chosen
      // edges); == Borůvka's MSF because the md5 weights are distinct
      """WITH RECURSIVE
        |nk AS (SELECT n_name, n_nationkey, ROW_NUMBER() OVER (ORDER BY n_nationkey) AS rn FROM nation),
        |chain AS (SELECT a.n_name AS src, b.n_name AS dst FROM nk a JOIN nk b ON b.rn = a.rn + 1),
        |skip AS (SELECT a.n_name AS src, b.n_name AS dst FROM nk a JOIN nk b ON b.rn = a.rn + 5),
        |und AS (SELECT LEAST(src, dst) AS x, GREATEST(src, dst) AS y
        |        FROM (SELECT * FROM chain UNION ALL SELECT * FROM skip)),
        |e AS MATERIALIZED (SELECT x, y,
        |      ('0x' || substr(md5('mst' || x || '|' || y), 1, 12))::BIGINT AS w
        |    FROM (SELECT DISTINCT x, y FROM und)),
        |prim AS (
        |  SELECT 0 AS it, [(SELECT MIN(x) FROM e)] AS vis,
        |         CAST([] AS STRUCT(x VARCHAR, y VARCHAR, w BIGINT)[]) AS mst
        |  UNION ALL
        |  SELECT it + 1,
        |    list_append(vis, CASE WHEN list_contains(vis, pick.x) THEN pick.y ELSE pick.x END),
        |    list_append(mst, {'x': pick.x, 'y': pick.y, 'w': pick.w})
        |  FROM prim, LATERAL (
        |    SELECT x, y, w FROM e
        |    WHERE list_contains(prim.vis, x) <> list_contains(prim.vis, y)
        |    ORDER BY w, x, y LIMIT 1) AS pick
        |  WHERE it < 24
        |)
        |SELECT u.x AS x, u.y AS y, u.w AS w FROM (
        |  SELECT unnest(mst) AS u FROM prim
        |  WHERE it = (SELECT MAX(it) FROM prim))
        |ORDER BY x, y""".stripMargin,
    "q_eccentricity" ->
      s"""WITH
         |${nationApspCtes(rounds = 5)}
         |SELECT src AS node, CAST(MAX(cost) AS DOUBLE) / 1000.0 AS ecc
         |FROM d5 GROUP BY src ORDER BY node""".stripMargin,
    "q_ktruss" -> {
      // unrolled support-peeling mirror of Truss.kTruss (k=4, 6 rounds):
      // per round, triangles of the surviving edge set via the canonical
      // a<b<c 3-join, corner-pair support, HAVING >= k-2, inner join back
      val head =
        """WITH rows0 AS (SELECT l_orderkey AS tid, 'P' || CAST(l_partkey AS VARCHAR) AS item
          |               FROM lineitem WHERE l_quantity <= 15),
          |txok AS (SELECT tid FROM rows0 GROUP BY tid HAVING COUNT(*) <= 8),
          |r AS (SELECT rows0.tid, rows0.item FROM rows0 JOIN txok USING (tid)),
          |e0 AS MATERIALIZED (SELECT DISTINCT a.item AS x, b.item AS y
          |      FROM r a JOIN r b ON a.tid = b.tid AND a.item < b.item)""".stripMargin
      val steps = (1 to 6).map { i =>
        val p = i - 1
        s"""t$i AS (SELECT e1.x AS a, e1.y AS b, e2.y AS c
           |        FROM e$p e1 JOIN e$p e2 ON e2.x = e1.y
           |        JOIN e$p e3 ON e3.x = e1.x AND e3.y = e2.y),
           |s$i AS (SELECT x, y FROM (SELECT a AS x, b AS y FROM t$i
           |         UNION ALL SELECT a, c FROM t$i UNION ALL SELECT b, c FROM t$i)
           |         GROUP BY x, y HAVING COUNT(*) >= 2),
           |e$i AS MATERIALIZED (SELECT e$p.x, e$p.y FROM e$p JOIN s$i USING (x, y))""".stripMargin
      }.mkString(",\n")
      s"""$head,
         |$steps
         |SELECT x, y FROM e6 ORDER BY x, y""".stripMargin
    },
    "q_skipgrams" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |p AS (SELECT w[i] AS center, w[i+j] AS context
        |      FROM toks, UNNEST(range(1, len(w)+1)) AS t(i), UNNEST([1,2]) AS u(j)
        |      WHERE i + j <= len(w))
        |SELECT center, context, COUNT(*) AS n FROM p GROUP BY 1, 2
        |HAVING COUNT(*) >= 20
        |ORDER BY center, context""".stripMargin,
    "q_clustering_coef" ->
      """WITH rows0 AS (SELECT l_orderkey AS tid, 'P' || CAST(l_partkey AS VARCHAR) AS item
        |               FROM lineitem WHERE l_quantity <= 15),
        |txok AS (SELECT tid FROM rows0 GROUP BY tid HAVING COUNT(*) <= 8),
        |r AS (SELECT rows0.tid, rows0.item FROM rows0 JOIN txok USING (tid)),
        |e AS (SELECT DISTINCT a.item AS x, b.item AS y
        |      FROM r a JOIN r b ON a.tid = b.tid AND a.item < b.item),
        |tri AS (SELECT e1.x AS a, e1.y AS b, e2.y AS c
        |        FROM e e1 JOIN e e2 ON e2.x = e1.y
        |        JOIN e e3 ON e3.x = e1.x AND e3.y = e2.y),
        |corners AS (SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
        |            UNION ALL SELECT c FROM tri),
        |tcnt AS (SELECT node, COUNT(*) AS n_tri FROM corners GROUP BY 1),
        |deg AS (SELECT node, COUNT(*) AS deg FROM
        |        (SELECT x AS node FROM e UNION ALL SELECT y FROM e) GROUP BY 1)
        |SELECT d.node, d.deg, CAST(COALESCE(t.n_tri, 0) AS BIGINT) AS n_triangles,
        |       CAST(FLOOR(2000 * COALESCE(t.n_tri, 0) / (d.deg * (d.deg - 1))) AS BIGINT) AS coef_pm
        |FROM deg d LEFT JOIN tcnt t USING (node)
        |WHERE d.deg >= 2 ORDER BY node""".stripMargin,
    "q_dedup_contain" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
        |       FROM toks, UNNEST(range(1, greatest(len(w)-1, 2))) AS t(i)),
        |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
        |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2)
        |SELECT id_a, id_b, n_inter, sa.n_sh AS n_a, sb.n_sh AS n_b,
        |       CAST(FLOOR(1000 * n_inter / LEAST(sa.n_sh, sb.n_sh)) AS BIGINT) AS contain_pm
        |FROM inter JOIN sizes sa ON sa.doc_id = id_a
        |JOIN sizes sb ON sb.doc_id = id_b
        |WHERE FLOOR(1000 * n_inter / LEAST(sa.n_sh, sb.n_sh)) >= 800
        |ORDER BY id_a, id_b""".stripMargin,
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
    "q_split_strata" ->
      """WITH r AS (SELECT doc_id, lang, source,
        |    ROW_NUMBER() OVER (PARTITION BY lang, source ORDER BY
        |      ('0x' || substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
        |      doc_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY lang, source) AS n
        |  FROM documents)
        |SELECT doc_id, lang, source,
        |       CASE WHEN rn * 5 <= n * 4 THEN 'train' ELSE 'test' END AS split
        |FROM r ORDER BY doc_id""".stripMargin,
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
    "q_mis" -> {
      // unrolled Luby rounds mirroring IndependentSet: per-round md5
      // priorities, neighbor argmin via row_number, row-value comparison,
      // winners+neighbors retired by anti-join
      val head =
        """WITH rows0 AS (SELECT l_orderkey AS tid, 'P' || CAST(l_partkey AS VARCHAR) AS item
          |               FROM lineitem WHERE l_quantity <= 15),
          |txok AS (SELECT tid FROM rows0 GROUP BY tid HAVING COUNT(*) <= 8),
          |r AS (SELECT rows0.tid, rows0.item FROM rows0 JOIN txok USING (tid)),
          |e0 AS MATERIALIZED (SELECT DISTINCT a.item AS x, b.item AS y
          |      FROM r a JOIN r b ON a.tid = b.tid AND a.item < b.item),
          |n0 AS MATERIALIZED (SELECT x AS node FROM e0 UNION SELECT y FROM e0)""".stripMargin
      val steps = (1 to 6).map { i =>
        val p = i - 1
        s"""p$i AS (SELECT node, ('0x' || substr(md5('mis$i|' || node), 1, 15))::BIGINT AS pr FROM n$p),
           |adj$i AS (SELECT x AS v, y AS u FROM e$p UNION ALL SELECT y, x FROM e$p),
           |nm$i AS (SELECT v, pr AS mp, u AS mu FROM (
           |  SELECT a.v, pp.pr, pp.node AS u,
           |    ROW_NUMBER() OVER (PARTITION BY a.v ORDER BY pp.pr, pp.node) AS rn
           |  FROM adj$i a JOIN p$i pp ON pp.node = a.u) WHERE rn = 1),
           |mis$i AS MATERIALIZED (SELECT p$i.node FROM p$i LEFT JOIN nm$i ON nm$i.v = p$i.node
           |  WHERE nm$i.v IS NULL OR (p$i.pr, p$i.node) < (nm$i.mp, nm$i.mu)),
           |k$i AS (SELECT node FROM mis$i UNION SELECT a.u FROM adj$i a JOIN mis$i m ON a.v = m.node),
           |n$i AS MATERIALIZED (SELECT t.node FROM n$p t LEFT JOIN k$i kk ON kk.node = t.node WHERE kk.node IS NULL),
           |e$i AS MATERIALIZED (SELECT t.x, t.y FROM e$p t LEFT JOIN k$i a ON a.node = t.x
           |  LEFT JOIN k$i b ON b.node = t.y WHERE a.node IS NULL AND b.node IS NULL)""".stripMargin
      }.mkString(",\n")
      val un = (1 to 6)
        .map(i => s"SELECT node, CAST($i AS BIGINT) AS round FROM mis$i")
        .mkString(" UNION ALL ")
      s"""$head,
         |$steps
         |SELECT node, round FROM ($un) ORDER BY node""".stripMargin
    },
    "q_label_noise" ->
      """WITH q AS (SELECT vec_id, label, list_transform(embedding,
        |             x -> FLOOR(CAST(x AS DOUBLE) * CAST(10000.0 AS DOUBLE))) AS v
        |           FROM embeddings),
        |n AS (SELECT vec_id, (SELECT SUM(x*x) FROM UNNEST(v) AS t(x)) AS nrm FROM q),
        |p AS (SELECT qq.vec_id AS query_id, c.vec_id AS neighbor_id,
        |        (SELECT SUM(qq.v[i]*c.v[i]) FROM UNNEST(range(1, len(qq.v)+1)) AS t(i)) AS dot
        |      FROM (SELECT * FROM q WHERE vec_id < 500) qq
        |      JOIN q c ON c.vec_id <> qq.vec_id),
        |scored AS (SELECT query_id, neighbor_id,
        |             ROW_NUMBER() OVER (PARTITION BY query_id
        |               ORDER BY dot / SQRT(na.nrm * nb.nrm) DESC, neighbor_id ASC) AS rank
        |           FROM p JOIN n na ON na.vec_id = query_id
        |                  JOIN n nb ON nb.vec_id = neighbor_id),
        |top AS (SELECT query_id, neighbor_id FROM scored WHERE rank <= 10)
        |SELECT t.query_id, ql.label AS q_label,
        |       CAST(SUM(CASE WHEN nl.label = ql.label THEN 1 ELSE 0 END) AS BIGINT) AS n_agree,
        |       COUNT(*) AS k_found,
        |       CAST(SUM(CASE WHEN nl.label = ql.label THEN 1 ELSE 0 END) AS BIGINT) * 2 < COUNT(*) AS suspect
        |FROM top t
        |JOIN q ql ON ql.vec_id = t.query_id
        |JOIN q nl ON nl.vec_id = t.neighbor_id
        |GROUP BY t.query_id, ql.label
        |ORDER BY query_id""".stripMargin,
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
    "q_trend" ->
      """WITH t0 AS (SELECT MIN(epoch_us(ts)) AS t0 FROM events),
        |s AS (SELECT event_type AS grp, (epoch_us(ts) - t0) // 86400000000 AS x,
        |        CAST(FLOOR(value * 1000000.0) AS BIGINT) AS y FROM events, t0)
        |SELECT grp, COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS s_x,
        |  CAST(SUM(y) AS BIGINT) AS s_y, CAST(SUM(x * y) AS BIGINT) AS s_xy,
        |  CAST(SUM(x * x) AS BIGINT) AS s_x2,
        |  (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(x * y) AS DOUBLE)
        |     - CAST(SUM(x) AS DOUBLE) * CAST(SUM(y) AS DOUBLE))
        |  / NULLIF(CAST(COUNT(*) AS DOUBLE) * CAST(SUM(x * x) AS DOUBLE)
        |     - CAST(SUM(x) AS DOUBLE) * CAST(SUM(x) AS DOUBLE), 0.0) AS slope
        |FROM s GROUP BY grp ORDER BY grp""".stripMargin,
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
    "q_lm_score" ->
      """WITH w AS (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents),
        |b AS (SELECT doc_id, lang, ws[i] AS w1, ws[i + 1] AS w2
        |      FROM w, UNNEST(range(1, len(ws))) AS t(i)
        |      WHERE len(ws) >= 2),
        |m AS (SELECT w1, w2, COUNT(*) AS c2 FROM b WHERE lang = 'en' GROUP BY 1, 2),
        |f AS (SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 FROM m GROUP BY 1),
        |sc AS (SELECT doc_id, COUNT(*) AS nb,
        |         CAST(SUM(COALESCE((m.c2 * 1000000) // f.c1, 0)) AS BIGINT) AS sp
        |       FROM b LEFT JOIN m USING (w1, w2) LEFT JOIN f USING (w1)
        |       GROUP BY doc_id)
        |SELECT d.doc_id, CAST(COALESCE(nb, 0) AS BIGINT) AS n_bigrams,
        |  CAST(COALESCE(sp, 0) AS BIGINT) AS sum_ppm,
        |  CAST(CASE WHEN COALESCE(nb, 0) = 0 THEN 0 ELSE sp // nb END AS BIGINT) AS lm_ppm
        |FROM (SELECT DISTINCT doc_id FROM documents) d LEFT JOIN sc USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
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
    "q_autocorr" ->
      """WITH daily AS (SELECT event_type AS grp,
        |                 epoch_us(ts) // 86400000000 AS day, COUNT(*) AS c
        |               FROM events GROUP BY 1, 2),
        |p AS (SELECT grp, c AS x,
        |        LEAD(c, 1) OVER (PARTITION BY grp ORDER BY day) AS y
        |      FROM daily)
        |SELECT grp, COUNT(*) AS n_pairs,
        |  CAST(SUM(x) AS BIGINT) AS s_x, CAST(SUM(y) AS BIGINT) AS s_y,
        |  CAST(SUM(x * y) AS BIGINT) AS s_xy,
        |  CAST(SUM(x * x) AS BIGINT) AS s_x2,
        |  CAST(SUM(y * y) AS BIGINT) AS s_y2,
        |  (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(x * y) AS DOUBLE)
        |     - CAST(SUM(x) AS DOUBLE) * CAST(SUM(y) AS DOUBLE))
        |  / NULLIF(SQRT((CAST(COUNT(*) AS DOUBLE) * CAST(SUM(x * x) AS DOUBLE)
        |       - CAST(SUM(x) AS DOUBLE) * CAST(SUM(x) AS DOUBLE))
        |     * (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(y * y) AS DOUBLE)
        |       - CAST(SUM(y) AS DOUBLE) * CAST(SUM(y) AS DOUBLE))), 0.0) AS r
        |FROM p WHERE y IS NOT NULL
        |GROUP BY grp ORDER BY grp""".stripMargin,
    "q_decontam_embed" ->
      """WITH q AS (SELECT vec_id, list_transform(embedding,
        |             x -> FLOOR(CAST(x AS DOUBLE) * CAST(10000.0 AS DOUBLE))) AS v
        |           FROM embeddings),
        |n AS (SELECT vec_id, (SELECT SUM(x*x) FROM UNNEST(v) AS t(x)) AS nrm FROM q),
        |ev AS (SELECT vec_id AS eid, v AS evec FROM q WHERE vec_id % 97 = 0),
        |p AS (SELECT t.vec_id AS id, e.eid,
        |        (SELECT SUM(t.v[i] * e.evec[i])
        |         FROM UNNEST(range(1, len(t.v) + 1)) AS s(i)) AS dot
        |      FROM q t JOIN ev e ON t.vec_id <> e.eid),
        |c AS (SELECT p.id, dot / SQRT(na.nrm * nb.nrm) AS cos
        |      FROM p JOIN n na ON na.vec_id = p.id JOIN n nb ON nb.vec_id = p.eid)
        |SELECT id, COUNT(*) AS n_eval,
        |  CAST(SUM(CASE WHEN cos >= CAST(0.25 AS DOUBLE) THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
        |  MAX(cos) AS max_cos,
        |  CAST(CASE WHEN SUM(CASE WHEN cos >= CAST(0.25 AS DOUBLE) THEN 1 ELSE 0 END) > 0
        |       THEN 1 ELSE 0 END AS BIGINT) AS contaminated
        |FROM c GROUP BY id ORDER BY id""".stripMargin,
    "q_reciprocity" ->
      """WITH ev AS (SELECT user_id, ts, event_id,
        |              lead(user_id) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS nxt
        |            FROM events WHERE event_type = 'click' AND value < 2.0),
        |e AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS src, CAST(nxt AS VARCHAR) AS dst
        |      FROM ev WHERE nxt IS NOT NULL AND nxt <> user_id),
        |rec AS (SELECT COUNT(*) AS m_reciprocal FROM e x
        |        WHERE EXISTS (SELECT 1 FROM e r
        |                      WHERE r.src = x.dst AND r.dst = x.src)),
        |tot AS (SELECT COUNT(*) AS m_edges FROM e)
        |SELECT m_edges, m_reciprocal,
        |  (m_reciprocal * 1000) // m_edges AS reciprocity_permille
        |FROM tot, rec""".stripMargin,
    "q_butterflies" ->
      """WITH e AS (SELECT DISTINCT 'P' || CAST(l_partkey AS VARCHAR) AS l,
        |             'S' || CAST(l_suppkey AS VARCHAR) AS r
        |           FROM lineitem WHERE l_quantity <= 2),
        |okr AS (SELECT r FROM e GROUP BY r HAVING COUNT(*) <= 64),
        |k AS (SELECT l, r FROM e JOIN okr USING (r)),
        |p AS (SELECT a.l AS l1, b.l AS l2, COUNT(*) AS c
        |      FROM k a JOIN k b ON a.r = b.r AND a.l < b.l
        |      GROUP BY 1, 2)
        |SELECT (SELECT COUNT(*) FROM k) AS m_edges,
        |  COUNT(*) AS n_wedge_pairs,
        |  CAST(SUM(c) AS BIGINT) AS n_wedges,
        |  CAST(SUM(c * (c - 1) // 2) AS BIGINT) AS n_butterflies
        |FROM p""".stripMargin,
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
    "q_hits" ->
      """WITH ev AS (SELECT user_id, ts, event_id,
        |              lead(user_id) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS nxt
        |            FROM events WHERE event_type = 'click' AND value < 2.0),
        |e AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS src, CAST(nxt AS VARCHAR) AS dst
        |      FROM ev WHERE nxt IS NOT NULL AND nxt <> user_id),
        |n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |a1 AS (SELECT dst AS node, COUNT(*) AS sc FROM e GROUP BY 1),
        |h1 AS (SELECT src AS node, CAST(SUM(a1.sc) AS BIGINT) AS sc
        |       FROM e JOIN a1 ON e.dst = a1.node GROUP BY 1),
        |a2 AS (SELECT dst AS node, CAST(SUM(h1.sc) AS BIGINT) AS sc
        |       FROM e JOIN h1 ON e.src = h1.node GROUP BY 1),
        |h2 AS (SELECT src AS node, CAST(SUM(a2.sc) AS BIGINT) AS sc
        |       FROM e JOIN a2 ON e.dst = a2.node GROUP BY 1)
        |SELECT n.node, COALESCE(a2.sc, 0) AS auth_fp,
        |  COALESCE(h2.sc, 0) AS hub_fp
        |FROM n LEFT JOIN a2 ON n.node = a2.node
        |LEFT JOIN h2 ON n.node = h2.node
        |ORDER BY n.node""".stripMargin,
    "q_bridges" ->
      """WITH RECURSIVE
        |ev AS (SELECT user_id, ts, event_id,
        |         lead(user_id) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS nxt
        |       FROM events WHERE event_type = 'click' AND value < 2.0),
        |e AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS src, CAST(nxt AS VARCHAR) AS dst
        |      FROM ev WHERE nxt IS NOT NULL AND nxt <> user_id),
        |und AS (SELECT DISTINCT least(src, dst) AS x, greatest(src, dst) AS y
        |        FROM e),
        |eid AS (SELECT x, y, x || '|' || y AS id FROM und),
        |sym AS (SELECT id, x AS a, y AS b FROM eid
        |        UNION ALL SELECT id, y AS a, x AS b FROM eid),
        |reach AS (SELECT id AS rm, x AS node FROM eid
        |          UNION
        |          SELECT r.rm, s2.b
        |          FROM reach r JOIN sym s2
        |            ON s2.a = r.node AND s2.id <> r.rm)
        |SELECT x AS src, y AS dst
        |FROM eid
        |WHERE NOT EXISTS (SELECT 1 FROM reach r
        |                  WHERE r.rm = eid.id AND r.node = eid.y)
        |ORDER BY src, dst""".stripMargin,
    "q_articulation" ->
      """WITH RECURSIVE
        |ev AS (SELECT user_id, ts, event_id,
        |         lead(user_id) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS nxt
        |       FROM events WHERE event_type = 'click' AND value < 2.0),
        |e AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS src, CAST(nxt AS VARCHAR) AS dst
        |      FROM ev WHERE nxt IS NOT NULL AND nxt <> user_id),
        |und AS (SELECT DISTINCT least(src, dst) AS x, greatest(src, dst) AS y
        |        FROM e),
        |sym AS (SELECT x AS a, y AS b FROM und
        |        UNION ALL SELECT y AS a, x AS b FROM und),
        |start AS (SELECT a AS v, MIN(b) AS s FROM sym GROUP BY a),
        |reach AS (SELECT v, s AS node FROM start
        |          UNION
        |          SELECT r.v, s2.b
        |          FROM reach r JOIN sym s2 ON s2.a = r.node
        |          WHERE s2.b <> r.v AND s2.a <> r.v)
        |SELECT DISTINCT sym.a AS node
        |FROM sym
        |WHERE NOT EXISTS (SELECT 1 FROM reach r
        |                  WHERE r.v = sym.a AND r.node = sym.b)
        |ORDER BY node""".stripMargin,
    "q_2ecc" ->
      """WITH RECURSIVE
        |ev AS (SELECT user_id, ts, event_id,
        |         lead(user_id) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS nxt
        |       FROM events WHERE event_type = 'click' AND value < 2.0),
        |e AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS src, CAST(nxt AS VARCHAR) AS dst
        |      FROM ev WHERE nxt IS NOT NULL AND nxt <> user_id),
        |und AS (SELECT DISTINCT least(src, dst) AS x, greatest(src, dst) AS y
        |        FROM e),
        |eid AS (SELECT x, y, x || '|' || y AS id FROM und),
        |sym AS (SELECT id, x AS a, y AS b FROM eid
        |        UNION ALL SELECT id, y AS a, x AS b FROM eid),
        |reach AS (SELECT id AS rm, x AS node FROM eid
        |          UNION
        |          SELECT r.rm, s2.b
        |          FROM reach r JOIN sym s2
        |            ON s2.a = r.node AND s2.id <> r.rm),
        |bridges AS (SELECT x, y FROM eid
        |            WHERE NOT EXISTS (SELECT 1 FROM reach r
        |                              WHERE r.rm = eid.id AND r.node = eid.y)),
        |res AS (SELECT u.x, u.y FROM und u
        |        WHERE NOT EXISTS (SELECT 1 FROM bridges b
        |                          WHERE b.x = u.x AND b.y = u.y)),
        |rsym AS (SELECT x AS a, y AS b FROM res
        |         UNION ALL SELECT y AS a, x AS b FROM res),
        |n AS (SELECT x AS node FROM und UNION SELECT y FROM und),
        |reach2 AS (SELECT node AS a, node AS b FROM n
        |           UNION
        |           SELECT r.a, s2.b FROM reach2 r JOIN rsym s2 ON s2.a = r.b)
        |SELECT a AS node, MIN(b) AS component
        |FROM reach2 GROUP BY a ORDER BY node""".stripMargin,
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
    "q_source_overlap" ->
      """WITH toks AS (SELECT source, string_split(text, ' ') AS w
        |              FROM documents),
        |sh AS (SELECT DISTINCT source AS src,
        |         array_to_string(w[i:i+4], ' ') AS shingle
        |       FROM toks, UNNEST(range(1, len(w) - 3)) AS t(i)
        |       WHERE len(w) >= 5),
        |kept AS (SELECT shingle FROM sh GROUP BY shingle
        |         HAVING COUNT(*) <= 16),
        |cs AS (SELECT src, shingle FROM sh JOIN kept USING (shingle)),
        |tot AS (SELECT src, COUNT(*) AS n_sh FROM cs GROUP BY src),
        |p AS (SELECT a.src AS src_a, b.src AS src_b, COUNT(*) AS shared
        |      FROM cs a JOIN cs b ON a.shingle = b.shingle AND a.src < b.src
        |      GROUP BY 1, 2)
        |SELECT src_a, src_b, shared, ta.n_sh AS n_a, tb.n_sh AS n_b,
        |  (1000 * shared) // least(ta.n_sh, tb.n_sh) AS contain_permille
        |FROM p JOIN tot ta ON ta.src = src_a
        |JOIN tot tb ON tb.src = src_b
        |ORDER BY src_a, src_b""".stripMargin,
    "q_coloring" ->
      s"""WITH ev AS MATERIALIZED (SELECT user_id, ts, event_id,
         |       lead(user_id) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS nxt
         |     FROM events WHERE event_type = 'click' AND value < 2.0),
         |e AS MATERIALIZED (SELECT DISTINCT CAST(user_id AS VARCHAR) AS src, CAST(nxt AS VARCHAR) AS dst
         |      FROM ev WHERE nxt IS NOT NULL AND nxt <> user_id),
         |und AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS x, greatest(src, dst) AS y
         |        FROM e),
         |symg AS MATERIALIZED (SELECT x AS a, y AS b FROM und
         |         UNION ALL SELECT y AS a, x AS b FROM und),
         |${graft.ops.Coloring.oracleRoundCtes(12)}
         |SELECT n.v AS node, COALESCE(c.color, -1) AS color,
         |  COALESCE(c.round, -1) AS round
         |FROM nodesg n LEFT JOIN c12 c ON c.v = n.v
         |ORDER BY node""".stripMargin,
    "q_wl_colors" ->
      """WITH ev AS MATERIALIZED (SELECT user_id, ts, event_id,
        |       lead(user_id) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS nxt
        |     FROM events WHERE event_type = 'click' AND value < 2.0),
        |e AS MATERIALIZED (SELECT DISTINCT CAST(user_id AS VARCHAR) AS src, CAST(nxt AS VARCHAR) AS dst
        |      FROM ev WHERE nxt IS NOT NULL AND nxt <> user_id),
        |und AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS x, greatest(src, dst) AS y
        |        FROM e),
        |symg AS MATERIALIZED (SELECT x AS a, y AS b FROM und
        |         UNION ALL SELECT y AS a, x AS b FROM und),
        |c0 AS MATERIALIZED (SELECT a AS v, md5(CAST(COUNT(*) AS VARCHAR)) AS c
        |      FROM symg GROUP BY a),
        |m1 AS (SELECT s.a AS v, string_agg(c.c, ',' ORDER BY c.c) AS ms
        |       FROM symg s JOIN c0 c ON c.v = s.b GROUP BY s.a),
        |c1 AS MATERIALIZED (SELECT p.v, md5(p.c || '#' || m.ms) AS c
        |      FROM c0 p JOIN m1 m ON m.v = p.v),
        |m2 AS (SELECT s.a AS v, string_agg(c.c, ',' ORDER BY c.c) AS ms
        |       FROM symg s JOIN c1 c ON c.v = s.b GROUP BY s.a),
        |c2 AS MATERIALIZED (SELECT p.v, md5(p.c || '#' || m.ms) AS c
        |      FROM c1 p JOIN m2 m ON m.v = p.v),
        |m3 AS (SELECT s.a AS v, string_agg(c.c, ',' ORDER BY c.c) AS ms
        |       FROM symg s JOIN c2 c ON c.v = s.b GROUP BY s.a),
        |c3 AS MATERIALIZED (SELECT p.v, md5(p.c || '#' || m.ms) AS c
        |      FROM c2 p JOIN m3 m ON m.v = p.v),
        |sz AS (SELECT c, COUNT(*) AS color_size FROM c3 GROUP BY c)
        |SELECT c3.v AS node, c3.c AS wl_color, sz.color_size
        |FROM c3 JOIN sz ON sz.c = c3.c
        |ORDER BY node""".stripMargin,
    "q_euler" ->
      """WITH RECURSIVE
        |ev AS (SELECT user_id, ts, event_id,
        |         lead(user_id) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS nxt
        |       FROM events WHERE event_type = 'click' AND value < 2.0),
        |e AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS src, CAST(nxt AS VARCHAR) AS dst
        |      FROM ev WHERE nxt IS NOT NULL AND nxt <> user_id),
        |und AS (SELECT DISTINCT least(src, dst) AS x, greatest(src, dst) AS y
        |        FROM e),
        |sym AS (SELECT x AS a, y AS b FROM und
        |        UNION ALL SELECT y AS a, x AS b FROM und),
        |deg AS (SELECT a AS node, COUNT(*) AS deg FROM sym GROUP BY a),
        |n AS (SELECT x AS node FROM und UNION SELECT y FROM und),
        |reach AS (SELECT node AS a, node AS b FROM n
        |          UNION
        |          SELECT r.a, s2.b FROM reach r JOIN sym s2 ON s2.a = r.b),
        |comp AS (SELECT a AS node, MIN(b) AS component FROM reach GROUP BY a)
        |SELECT component, COUNT(*) AS n_nodes,
        |  CAST(SUM(deg) // 2 AS BIGINT) AS m_edges,
        |  CAST(SUM(CASE WHEN deg % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_odd,
        |  (SUM(CASE WHEN deg % 2 = 1 THEN 1 ELSE 0 END) = 0) AS has_circuit,
        |  (SUM(CASE WHEN deg % 2 = 1 THEN 1 ELSE 0 END) <= 2) AS has_path
        |FROM deg JOIN comp USING (node)
        |GROUP BY component
        |ORDER BY component""".stripMargin,
    "q_rich_club" ->
      """WITH base AS (SELECT DISTINCT l_orderkey AS tid,
        |         'P' || CAST(l_partkey AS VARCHAR) AS item
        |       FROM lineitem WHERE l_quantity <= 15),
        |ok AS (SELECT tid FROM base GROUP BY tid HAVING COUNT(*) <= 8),
        |bb AS (SELECT base.tid, base.item FROM base JOIN ok USING (tid)),
        |und AS MATERIALIZED (SELECT DISTINCT x.item AS x, y.item AS y
        |        FROM bb x JOIN bb y ON x.tid = y.tid AND x.item < y.item),
        |deg AS MATERIALIZED (SELECT node, COUNT(*) AS deg
        |      FROM (SELECT x AS node FROM und
        |            UNION ALL SELECT y FROM und)
        |      GROUP BY node),
        |nk AS (SELECT t.k, COUNT(*) AS n_k
        |       FROM deg, UNNEST(range(1, CAST(least(deg - 1, 16) AS BIGINT) + 1)) AS t(k)
        |       WHERE deg >= 2
        |       GROUP BY t.k),
        |ek AS (SELECT t.k, COUNT(*) AS e_k
        |       FROM (SELECT least(dx.deg, dy.deg) AS dmin
        |             FROM und JOIN deg dx ON dx.node = und.x
        |             JOIN deg dy ON dy.node = und.y) m,
        |         UNNEST(range(1, CAST(least(dmin - 1, 16) AS BIGINT) + 1)) AS t(k)
        |       WHERE dmin >= 2
        |       GROUP BY t.k)
        |SELECT nk.k, nk.n_k, COALESCE(ek.e_k, 0) AS e_k,
        |  (1000 * 2 * COALESCE(ek.e_k, 0)) // (nk.n_k * (nk.n_k - 1))
        |    AS phi_permille
        |FROM nk LEFT JOIN ek ON ek.k = nk.k
        |WHERE nk.n_k >= 2
        |ORDER BY nk.k""".stripMargin,
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
    "q_temporal_triangles" ->
      """WITH ev AS (SELECT user_id, event_id,
        |         lead(user_id) OVER (PARTITION BY event_type
        |           ORDER BY ts, event_id) AS nxt,
        |         lead(epoch_us(ts)) OVER (PARTITION BY event_type
        |           ORDER BY ts, event_id) AS nxt_us
        |       FROM events WHERE event_type = 'click' AND value < 2.0),
        |te AS MATERIALIZED (SELECT DISTINCT CAST(user_id AS VARCHAR) AS s,
        |         CAST(nxt AS VARCHAR) AS d, CAST(nxt_us AS BIGINT) AS t
        |       FROM ev WHERE nxt IS NOT NULL AND nxt <> user_id),
        |w AS MATERIALIZED (SELECT a.s AS u, a.d AS v, b.d AS w,
        |         a.t AS t1, b.t AS t2
        |       FROM te a JOIN te b ON b.s = a.d
        |       WHERE b.t > a.t AND b.t - a.t <= 21600000000
        |         AND b.d <> a.s),
        |tri AS (SELECT COUNT(*) AS n_triangles
        |        FROM w JOIN te c ON c.s = w.w AND c.d = w.u
        |        WHERE c.t > w.t2 AND c.t - w.t1 <= 21600000000)
        |SELECT (SELECT COUNT(*) FROM te) AS n_edges,
        |  (SELECT COUNT(*) FROM w) AS n_wedges,
        |  n_triangles
        |FROM tri""".stripMargin,
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
    "q_centroid_shift" ->
      """WITH q AS (SELECT CAST(label AS VARCHAR) AS lab,
        |         list_transform(embedding,
        |           x -> CAST(FLOOR(CAST(x AS DOUBLE) * CAST(10000.0 AS DOUBLE)) AS BIGINT)) AS v
        |       FROM embeddings),
        |e AS (SELECT lab, t.i AS d, v[t.i] AS s0
        |      FROM q, UNNEST(range(1, len(v) + 1)) AS t(i)),
        |sums AS (SELECT lab, d, CAST(SUM(s0) AS BIGINT) AS s
        |         FROM e GROUP BY 1, 2),
        |meta AS (SELECT CAST(label AS VARCHAR) AS lab, COUNT(*) AS n
        |         FROM embeddings GROUP BY 1),
        |norms AS (SELECT sums.lab, CAST(SUM(s * s) AS BIGINT) AS nrm, meta.n
        |          FROM sums JOIN meta ON meta.lab = sums.lab
        |          GROUP BY sums.lab, meta.n),
        |dots AS (SELECT a.lab AS label_a, b.lab AS label_b,
        |           CAST(SUM(a.s * b.s) AS BIGINT) AS dot
        |         FROM sums a JOIN sums b ON a.d = b.d AND a.lab < b.lab
        |         GROUP BY 1, 2)
        |SELECT label_a, label_b, na.n AS n_a, nb.n AS n_b, dot,
        |  na.nrm AS nrm_a, nb.nrm AS nrm_b,
        |  CAST(dot AS DOUBLE) /
        |    SQRT(CAST(na.nrm AS DOUBLE) * CAST(nb.nrm AS DOUBLE)) AS cosine
        |FROM dots
        |JOIN norms na ON na.lab = label_a
        |JOIN norms nb ON nb.lab = label_b
        |ORDER BY label_a, label_b""".stripMargin,
    "q_cascade" ->
      s"""WITH ev AS MATERIALIZED (SELECT user_id, ts, event_id,
         |       lead(user_id) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS nxt
         |     FROM events WHERE event_type = 'click' AND value < 2.0),
         |e AS MATERIALIZED (SELECT DISTINCT CAST(user_id AS VARCHAR) AS src, CAST(nxt AS VARCHAR) AS dst
         |      FROM ev WHERE nxt IS NOT NULL AND nxt <> user_id),
         |und AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS x, greatest(src, dst) AS y
         |        FROM e),
         |symg AS MATERIALIZED (SELECT x AS a, y AS b FROM und
         |         UNION ALL SELECT y AS a, x AS b FROM und),
         |${graft.ops.Cascade.oracleRoundCtes(k = 2, seedPermille = 100, rounds = 6)}
         |SELECT n.node, COALESCE(a.r, -1) AS active_round
         |FROM nodesg n LEFT JOIN a6 a ON a.node = n.node
         |ORDER BY n.node""".stripMargin,
    "q_wl_components" ->
      """WITH RECURSIVE
        |ev AS (SELECT event_type, user_id, ts, event_id,
        |         lead(user_id) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS nxt
        |       FROM events WHERE value < 2.0),
        |e AS (SELECT DISTINCT
        |        event_type || ':' || CAST(user_id AS VARCHAR) AS src,
        |        event_type || ':' || CAST(nxt AS VARCHAR) AS dst
        |      FROM ev WHERE nxt IS NOT NULL AND nxt <> user_id),
        |und AS (SELECT DISTINCT least(src, dst) AS x, greatest(src, dst) AS y
        |        FROM e),
        |symg AS (SELECT x AS a, y AS b FROM und
        |         UNION ALL SELECT y AS a, x AS b FROM und),
        |c0 AS (SELECT a AS v, md5(CAST(COUNT(*) AS VARCHAR)) AS c
        |       FROM symg GROUP BY a),
        |m1 AS (SELECT s.a AS v, string_agg(c.c, ',' ORDER BY c.c) AS ms
        |       FROM symg s JOIN c0 c ON c.v = s.b GROUP BY s.a),
        |c1 AS (SELECT p.v, md5(p.c || '#' || m.ms) AS c
        |       FROM c0 p JOIN m1 m ON m.v = p.v),
        |m2 AS (SELECT s.a AS v, string_agg(c.c, ',' ORDER BY c.c) AS ms
        |       FROM symg s JOIN c1 c ON c.v = s.b GROUP BY s.a),
        |c2 AS (SELECT p.v, md5(p.c || '#' || m.ms) AS c
        |       FROM c1 p JOIN m2 m ON m.v = p.v),
        |m3 AS (SELECT s.a AS v, string_agg(c.c, ',' ORDER BY c.c) AS ms
        |       FROM symg s JOIN c2 c ON c.v = s.b GROUP BY s.a),
        |c3 AS (SELECT p.v, md5(p.c || '#' || m.ms) AS c
        |       FROM c2 p JOIN m3 m ON m.v = p.v),
        |nn AS (SELECT x AS node FROM und UNION SELECT y FROM und),
        |reach AS (SELECT node AS a, node AS b FROM nn
        |          UNION
        |          SELECT r.a, s2.b FROM reach r JOIN symg s2 ON s2.a = r.b),
        |comp AS (SELECT a AS node, MIN(b) AS component FROM reach GROUP BY a),
        |sig AS (SELECT comp.component, COUNT(*) AS n_nodes,
        |          md5(string_agg(c3.c, ',' ORDER BY c3.c)) AS wl_sig
        |        FROM c3 JOIN comp ON comp.node = c3.v
        |        GROUP BY 1),
        |iso AS (SELECT wl_sig, COUNT(*) AS n_isomorphic FROM sig GROUP BY 1)
        |SELECT component, n_nodes, sig.wl_sig, n_isomorphic
        |FROM sig JOIN iso ON iso.wl_sig = sig.wl_sig
        |ORDER BY component""".stripMargin,
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
    "q_blocking_quality" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
        |       FROM toks, UNNEST(range(1, greatest(len(w)-1, 2))) AS t(i)),
        |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
        |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2),
        |truth AS (SELECT id_a, id_b
        |          FROM inter JOIN sizes sa ON sa.doc_id = id_a
        |          JOIN sizes sb ON sb.doc_id = id_b
        |          WHERE CAST(n_inter AS DOUBLE)/(sa.n_sh + sb.n_sh - n_inter) >= 0.5),
        |tk AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents),
        |h AS (SELECT doc_id,
        |        ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h1,
        |        ('0x' || substr(md5(tok), 9, 8))::BIGINT AS h2
        |      FROM tk),
        |bits AS (SELECT doc_id, j,
        |           CAST(SUM(CASE WHEN (h1 >> j) & 1 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS v1,
        |           CAST(SUM(CASE WHEN (h2 >> j) & 1 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS v2
        |         FROM h CROSS JOIN (SELECT UNNEST(range(0, 32)) AS j) GROUP BY doc_id, j),
        |fp AS (SELECT doc_id,
        |         CAST(SUM(CASE WHEN v1 > 0 THEN 1::BIGINT << j ELSE 0 END) AS BIGINT) AS fp1,
        |         CAST(SUM(CASE WHEN v2 > 0 THEN 1::BIGINT << j ELSE 0 END) AS BIGINT) AS fp2
        |       FROM bits GROUP BY doc_id),
        |bnd AS (SELECT doc_id, UNNEST([0, 1, 2, 3]) AS band,
        |               UNNEST([fp1 & 65535, (fp1 >> 16) & 65535,
        |                       fp2 & 65535, (fp2 >> 16) & 65535]) AS bucket
        |        FROM fp),
        |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |         FROM bnd a JOIN bnd b
        |           ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
        |agg AS (SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
        |          (SELECT COUNT(*) FROM truth) AS n_truth,
        |          (SELECT COUNT(*) FROM cand) AS n_cand,
        |          (SELECT COUNT(*) FROM cand JOIN truth USING (id_a, id_b))
        |            AS n_hit)
        |SELECT n_docs, n_truth, n_cand, n_hit,
        |  CASE WHEN n_truth = 0 THEN 1000
        |       ELSE (1000 * n_hit) // n_truth END AS recall_permille,
        |  CASE WHEN n_docs < 2 THEN 0
        |       ELSE 1000000 - (2000000 * n_cand) // (n_docs * (n_docs - 1))
        |       END AS reduction_ppm
        |FROM agg""".stripMargin,
    "q_seq_patterns" ->
      """WITH ev AS (SELECT CAST(user_id AS VARCHAR) AS u, event_type AS it,
        |              epoch_us(ts) AS t
        |            FROM events
        |            WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
        |f AS (SELECT u, it AS a, MIN(t) AS t1 FROM ev GROUP BY 1, 2),
        |p AS (SELECT f.u, f.a, e.it AS b, MIN(e.t) AS t2
        |      FROM f JOIN ev e ON e.u = f.u AND e.t > f.t1
        |      GROUP BY 1, 2, 3),
        |tr AS (SELECT p.u, p.a, p.b, e.it AS c, MIN(e.t) AS t3
        |       FROM p JOIN ev e ON e.u = p.u AND e.t > p.t2
        |       GROUP BY 1, 2, 3, 4),
        |s1 AS (SELECT a AS pattern, CAST(1 AS BIGINT) AS len,
        |         COUNT(*) AS support
        |       FROM f GROUP BY 1),
        |s2 AS (SELECT a || '>' || b AS pattern, CAST(2 AS BIGINT) AS len,
        |         COUNT(*) AS support
        |       FROM p GROUP BY a, b),
        |s3 AS (SELECT a || '>' || b || '>' || c AS pattern,
        |         CAST(3 AS BIGINT) AS len, COUNT(*) AS support
        |       FROM tr GROUP BY a, b, c)
        |SELECT pattern, len, support
        |FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2
        |      UNION ALL SELECT * FROM s3)
        |WHERE support >= 50
        |ORDER BY support DESC, pattern""".stripMargin,
    "q_densest" ->
      s"""WITH base AS (SELECT DISTINCT l_orderkey AS tid,
         |         'P' || CAST(l_partkey AS VARCHAR) AS item
         |       FROM lineitem WHERE l_quantity <= 15),
         |ok AS (SELECT tid FROM base GROUP BY tid HAVING COUNT(*) <= 8),
         |bb AS (SELECT base.tid, base.item FROM base JOIN ok USING (tid)),
         |und AS MATERIALIZED (SELECT DISTINCT x.item AS x, y.item AS y
         |        FROM bb x JOIN bb y ON x.tid = y.tid AND x.item < y.item),
         |${graft.ops.DensestSubgraph.oracleRoundCtes(24)}
         |SELECT round, n_nodes, m_edges,
         |  (1000 * m_edges) // n_nodes AS density_permille,
         |  round = (SELECT round FROM peelbest) AS is_best
         |FROM peelstats ORDER BY round""".stripMargin,
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
    "q_conductance" ->
      """WITH base AS (SELECT DISTINCT l_orderkey AS tid,
        |         'P' || CAST(l_partkey AS VARCHAR) AS item
        |       FROM lineitem WHERE l_quantity <= 15),
        |ok AS (SELECT tid FROM base GROUP BY tid HAVING COUNT(*) <= 8),
        |bb AS (SELECT base.tid, base.item FROM base JOIN ok USING (tid)),
        |und AS (SELECT DISTINCT x.item AS x, y.item AS y
        |        FROM bb x JOIN bb y ON x.tid = y.tid AND x.item < y.item),
        |lab AS (SELECT 'P' || CAST(p_partkey AS VARCHAR) AS node,
        |          p_brand AS community FROM part),
        |le AS (SELECT und.x, und.y, lx.community AS cx, ly.community AS cy
        |       FROM und JOIN lab lx ON lx.node = und.x
        |                JOIN lab ly ON ly.node = und.y),
        |tm AS (SELECT 2 * COUNT(*) AS two_m FROM le),
        |contrib AS (SELECT cx AS community, 2 AS v, 0 AS k FROM le WHERE cx = cy
        |            UNION ALL SELECT cx, 1, 1 FROM le WHERE cx <> cy
        |            UNION ALL SELECT cy, 1, 1 FROM le WHERE cx <> cy),
        |vols AS (SELECT community, CAST(SUM(v) AS BIGINT) AS vol,
        |           CAST(SUM(k) AS BIGINT) AS cut
        |         FROM contrib GROUP BY 1),
        |nds AS (SELECT community, COUNT(DISTINCT n) AS n_nodes
        |        FROM (SELECT cx AS community, x AS n FROM le
        |              UNION ALL SELECT cy, y FROM le)
        |        GROUP BY 1)
        |SELECT v.community, n_nodes, vol, cut,
        |  CASE WHEN least(vol, two_m - vol) > 0
        |       THEN (1000 * cut) // least(vol, two_m - vol)
        |       ELSE 0 END AS conductance_permille
        |FROM vols v JOIN nds USING (community) CROSS JOIN tm
        |ORDER BY community""".stripMargin,
    "q_canonicalize" ->
      s"""WITH RECURSIVE
         |toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |sh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
         |       FROM toks, UNNEST(range(1, greatest(len(w)-1, 2))) AS t(i)),
         |${graft.ops.Dedup.minHashPortableOracleCtes(numHashes = 64, bands = 16)},
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |         FROM bnd a JOIN bnd b
         |           ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
         |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
         |inter AS (SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
         |          FROM cand c
         |          JOIN sh a ON a.doc_id = c.id_a
         |          JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
         |          GROUP BY c.id_a, c.id_b),
         |p AS (SELECT CAST(id_a AS VARCHAR) AS a, CAST(id_b AS VARCHAR) AS b
         |      FROM inter JOIN sizes sa ON sa.doc_id = id_a
         |                 JOIN sizes sb ON sb.doc_id = id_b
         |      WHERE CAST(n_inter AS DOUBLE)/(sa.n_sh + sb.n_sh - n_inter) >= 0.5),
         |sym AS (SELECT a, b FROM p UNION SELECT b AS a, a AS b FROM p),
         |nodes AS (SELECT DISTINCT a AS node FROM sym),
         |cc AS (SELECT node, node AS lab FROM nodes
         |       UNION
         |       SELECT s.b AS node, c.lab FROM cc c JOIN sym s ON c.node = s.a
         |       WHERE c.lab < s.b),
         |comp AS (SELECT node, MIN(lab) AS component FROM cc GROUP BY node),
         |mem AS (SELECT comp.component AS cluster, d.doc_id AS id,
         |          LENGTH(d.text) AS len, d.lang, d.source
         |        FROM comp JOIN documents d
         |          ON CAST(d.doc_id AS VARCHAR) = comp.node),
         |elect AS (SELECT cluster, COUNT(*) AS n_docs,
         |            COUNT(DISTINCT source) AS n_sources,
         |            CAST(SUM(len) AS BIGINT) AS total_len
         |          FROM mem GROUP BY 1),
         |canon AS (SELECT cluster, id AS canonical_id, len AS canonical_len
         |          FROM mem
         |          QUALIFY ROW_NUMBER() OVER (PARTITION BY cluster
         |            ORDER BY len DESC, id) = 1),
         |lv AS (SELECT cluster, lang AS major_lang
         |       FROM (SELECT cluster, lang, COUNT(*) AS n
         |             FROM mem GROUP BY 1, 2)
         |       QUALIFY ROW_NUMBER() OVER (PARTITION BY cluster
         |         ORDER BY n DESC, lang) = 1)
         |SELECT e.cluster, n_docs, canonical_id, canonical_len, major_lang,
         |  n_sources, total_len
         |FROM elect e JOIN canon USING (cluster) JOIN lv USING (cluster)
         |ORDER BY cluster""".stripMargin,
    "q_degree_gini" ->
      """WITH base AS (SELECT DISTINCT l_orderkey AS tid,
        |         'P' || CAST(l_partkey AS VARCHAR) AS item
        |       FROM lineitem WHERE l_quantity <= 15),
        |ok AS (SELECT tid FROM base GROUP BY tid HAVING COUNT(*) <= 8),
        |bb AS (SELECT base.tid, base.item FROM base JOIN ok USING (tid)),
        |und AS (SELECT DISTINCT x.item AS x, y.item AS y
        |        FROM bb x JOIN bb y ON x.tid = y.tid AND x.item < y.item),
        |deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS v
        |        FROM (SELECT x AS node FROM und UNION ALL SELECT y FROM und)
        |        GROUP BY 1),
        |g AS (SELECT v, COUNT(*) AS c FROM deg GROUP BY 1),
        |cum AS (SELECT v, c,
        |          CAST(SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - c
        |            AS BIGINT) AS rbefore
        |        FROM g),
        |s AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
        |        CAST(SUM(v * c) AS BIGINT) AS total,
        |        CAST(SUM(v * (c * rbefore + (c * (c + 1)) // 2)) AS BIGINT)
        |          AS s1
        |      FROM cum)
        |SELECT n, total, 2 * s1 - (n + 1) * total AS s1_num,
        |  CASE WHEN n > 0 AND total > 0
        |       THEN (1000 * (2 * s1 - (n + 1) * total)) // (n * total)
        |       END AS gini_permille
        |FROM s""".stripMargin,
    "q_target_leakage" ->
      """WITH c AS (SELECT o_custkey AS category, CAST(COUNT(*) AS BIGINT) AS n,
        |             CAST(SUM(CASE WHEN o_totalprice > 150000.0
        |                           THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
        |           FROM orders GROUP BY 1),
        |g AS (SELECT (1000000 * CAST(SUM(n_pos) AS BIGINT))
        |        // CAST(SUM(n) AS BIGINT) AS gppm FROM c),
        |e AS (SELECT category, n, n_pos,
        |        (1000000 * n_pos + 20 * gppm) // (n + 20) AS enc_ppm,
        |        CASE WHEN n_pos >= 1
        |             THEN (1000000 * (n_pos - 1) + 20 * gppm) // (n - 1 + 20)
        |             END AS loo_pos_ppm,
        |        CASE WHEN n - n_pos >= 1
        |             THEN (1000000 * n_pos + 20 * gppm) // (n - 1 + 20)
        |             END AS loo_neg_ppm
        |      FROM c CROSS JOIN g)
        |SELECT category, n, n_pos, enc_ppm, loo_pos_ppm, loo_neg_ppm,
        |  loo_neg_ppm - loo_pos_ppm AS leak_gap_ppm
        |FROM e ORDER BY category""".stripMargin,
    "q_ann_recall2" ->
      s"""WITH $annAuditCtes,
         |ivf AS (SELECT * FROM (
         |${graft.ops.Similarity.ivfPortableOracle(dim = 64, k = 5,
              nCells = 16, nProbe = 4, kmeansIters = 3, sampleN = 200,
              seed = 42L)})),
         |pq AS (SELECT * FROM (
         |${graft.ops.Similarity.pqPortableOracle(dim = 64, k = 5, m = 16,
              ksub = 16, candR = 50, kmeansIters = 2, sampleN = 200,
              seed = 42L)})),
         |ra AS (SELECT 'ivf' AS method, b.query_id, COUNT(*) AS n_truth,
         |         CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL
         |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
         |       FROM bf b LEFT JOIN ivf a
         |         ON a.query_id = b.query_id AND a.neighbor_id = b.neighbor_id
         |       GROUP BY 1, 2
         |       UNION ALL
         |       SELECT 'pq', b.query_id, COUNT(*),
         |         CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL
         |                       THEN 1 ELSE 0 END) AS BIGINT)
         |       FROM bf b LEFT JOIN pq a
         |         ON a.query_id = b.query_id AND a.neighbor_id = b.neighbor_id
         |       GROUP BY 1, 2)
         |SELECT method, query_id, n_truth, n_hits,
         |  (1000 * n_hits) // n_truth AS recall_permille
         |FROM ra ORDER BY method, query_id""".stripMargin,
    "q_ann_recall_ivfpq" ->
      s"""WITH $annAuditCtes,
         |ivfpq AS (SELECT * FROM (
         |${graft.ops.Similarity.ivfPqPortableOracle(dim = 64, k = 5,
              nCells = 16, nProbe = 4, m = 16, ksub = 16, candR = 50,
              kmeansIters = 2, sampleN = 200, seed = 42L)})),
         |ra AS (SELECT b.query_id, COUNT(*) AS n_truth,
         |         CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL
         |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
         |       FROM bf b LEFT JOIN ivfpq a
         |         ON a.query_id = b.query_id AND a.neighbor_id = b.neighbor_id
         |       GROUP BY 1)
         |SELECT query_id, n_truth, n_hits,
         |  (1000 * n_hits) // n_truth AS recall_permille
         |FROM ra ORDER BY query_id""".stripMargin,
    "q_topk_drift" ->
      """WITH c AS (SELECT epoch_us(l_shipdate) // 604800000000 AS period,
        |             'P' || CAST(l_partkey AS VARCHAR) AS item,
        |             COUNT(*) AS n
        |           FROM lineitem GROUP BY 1, 2),
        |t AS (SELECT period, item FROM c
        |      QUALIFY ROW_NUMBER() OVER (PARTITION BY period
        |        ORDER BY n DESC, item) <= 10),
        |sizes AS (SELECT period, COUNT(*) AS k_n FROM t GROUP BY 1),
        |com AS (SELECT a.period, COUNT(*) AS n_common
        |        FROM t a JOIN t b
        |          ON b.period = a.period + 1 AND b.item = a.item
        |        GROUP BY 1)
        |SELECT sa.period, sb.period AS next_period,
        |  sa.k_n AS k_a, sb.k_n AS k_b,
        |  CAST(COALESCE(n_common, 0) AS BIGINT) AS n_common,
        |  (1000 * COALESCE(n_common, 0))
        |    // (sa.k_n + sb.k_n - COALESCE(n_common, 0)) AS jaccard_permille
        |FROM sizes sa JOIN sizes sb ON sb.period = sa.period + 1
        |LEFT JOIN com ON com.period = sa.period
        |ORDER BY sa.period""".stripMargin,
    "q_kmeans_distortion" -> (kmeansCtes(iters = 2) + """
        |SELECT cluster, COUNT(*) AS n_vecs,
        |  CAST(SUM(dist) AS BIGINT) AS sse,
        |  CAST(MAX(dist) AS BIGINT) AS max_dist,
        |  CAST(SUM(dist) AS BIGINT) // COUNT(*) AS mean_dist
        |FROM a_f GROUP BY cluster ORDER BY cluster""".stripMargin),
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
    "q_centralization" ->
      """WITH base AS (SELECT DISTINCT l_orderkey AS tid,
        |         'P' || CAST(l_partkey AS VARCHAR) AS item
        |       FROM lineitem WHERE l_quantity <= 15),
        |ok AS (SELECT tid FROM base GROUP BY tid HAVING COUNT(*) <= 8),
        |bb AS (SELECT base.tid, base.item FROM base JOIN ok USING (tid)),
        |und AS (SELECT DISTINCT x.item AS x, y.item AS y
        |        FROM bb x JOIN bb y ON x.tid = y.tid AND x.item < y.item),
        |deg AS (SELECT node, COUNT(*) AS d
        |        FROM (SELECT x AS node FROM und UNION ALL SELECT y FROM und)
        |        GROUP BY 1),
        |s AS (SELECT COUNT(*) AS n_nodes, CAST(MAX(d) AS BIGINT) AS d_max,
        |        CAST(SUM(d) AS BIGINT) AS d_sum
        |      FROM deg)
        |SELECT n_nodes, d_max,
        |  n_nodes * d_max - d_sum AS c_num,
        |  (n_nodes - 1) * (n_nodes - 2) AS c_den,
        |  CASE WHEN n_nodes >= 3
        |       THEN (1000 * (n_nodes * d_max - d_sum))
        |            // ((n_nodes - 1) * (n_nodes - 2)) END
        |    AS centralization_permille
        |FROM s""".stripMargin,
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
    "q_minhash_error" ->
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w
         |              FROM documents WHERE doc_id < 40),
         |sh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
         |       FROM toks, UNNEST(range(1, greatest(len(w)-1, 2))) AS t(i)),
         |${graft.ops.Dedup.minHashPortableOracleCtes(numHashes = 64, bands = 16)},
         |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
         |estm AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |           CAST(COUNT(*) AS BIGINT) AS est_matches
         |         FROM mh a JOIN mh b
         |           ON a.i = b.i AND a.mh = b.mh AND a.doc_id < b.doc_id
         |         GROUP BY 1, 2),
         |inter AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b,
         |            CAST(COUNT(*) AS BIGINT) AS n_inter
         |          FROM sh x JOIN sh y
         |            ON x.shingle = y.shingle AND x.doc_id < y.doc_id
         |          GROUP BY 1, 2),
         |uni AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |          a.n_sh AS na, b.n_sh AS nb
         |        FROM sizes a JOIN sizes b ON a.doc_id < b.doc_id)
         |SELECT uni.id_a, uni.id_b,
         |  COALESCE(est_matches, 0) AS est_matches,
         |  (1000 * COALESCE(est_matches, 0)) // 64 AS est_permille,
         |  (1000 * COALESCE(n_inter, 0)) // (na + nb - COALESCE(n_inter, 0))
         |    AS exact_permille,
         |  (1000 * COALESCE(est_matches, 0)) // 64
         |    - (1000 * COALESCE(n_inter, 0)) // (na + nb - COALESCE(n_inter, 0))
         |    AS err_permille
         |FROM uni LEFT JOIN estm ON estm.id_a = uni.id_a AND estm.id_b = uni.id_b
         |         LEFT JOIN inter ON inter.id_a = uni.id_a AND inter.id_b = uni.id_b
         |ORDER BY uni.id_a, uni.id_b""".stripMargin,
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
    "q_ks_drift" ->
      """WITH f AS (SELECT lang = 'en' AS in_a,
        |             CAST(LENGTH(text) AS BIGINT) AS value FROM documents),
        |g AS (SELECT value,
        |        CAST(SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |        CAST(SUM(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS b
        |      FROM f GROUP BY 1),
        |c AS (SELECT value,
        |        CAST(SUM(a) OVER (ORDER BY value) AS BIGINT) AS ca,
        |        CAST(SUM(b) OVER (ORDER BY value) AS BIGINT) AS cb
        |      FROM g),
        |t AS (SELECT CAST(SUM(a) AS BIGINT) AS n_a,
        |        CAST(SUM(b) AS BIGINT) AS n_b FROM g),
        |d AS (SELECT n_a, n_b, value, ABS(ca * n_b - cb * n_a) AS d
        |      FROM c CROSS JOIN t),
        |m AS (SELECT n_a, n_b, d AS d_num, value AS at_value
        |      FROM d ORDER BY d DESC, value LIMIT 1)
        |SELECT n_a, n_b, d_num, at_value,
        |  CASE WHEN n_a > 0 AND n_b > 0
        |       THEN (1000 * d_num) // (n_a * n_b) END AS ks_permille
        |FROM m""".stripMargin,
    "q_ks_sketch" ->
      """WITH base AS (SELECT lang = 'en' AS in_a,
        |         CAST(LENGTH(text) AS BIGINT) AS v
        |       FROM documents WHERE lang IS NOT NULL AND text IS NOT NULL),
        |hp AS (SELECT in_a, v,
        |         ('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 15))::BIGINT AS h
        |       FROM base),
        |sa AS MATERIALIZED (SELECT v FROM (
        |       SELECT v, ROW_NUMBER() OVER (ORDER BY h, v) AS rn
        |       FROM hp WHERE in_a) WHERE rn <= 128),
        |sb AS MATERIALIZED (SELECT v FROM (
        |       SELECT v, ROW_NUMBER() OVER (ORDER BY h, v) AS rn
        |       FROM hp WHERE NOT in_a) WHERE rn <= 128),
        |sz AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM sa) AS sn_a,
        |              (SELECT CAST(COUNT(*) AS BIGINT) FROM sb) AS sn_b),
        |nn AS (SELECT CAST(SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |              CAST(SUM(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS n_b
        |       FROM base),
        |cand AS (SELECT DISTINCT v FROM (
        |       SELECT v FROM sa UNION ALL SELECT v FROM sb)),
        |ca AS (SELECT c.v, CAST(COUNT(sa.v) AS BIGINT) AS cum_a
        |       FROM cand c LEFT JOIN sa ON sa.v <= c.v GROUP BY c.v),
        |cb AS (SELECT c.v, CAST(COUNT(sb.v) AS BIGINT) AS cum_b
        |       FROM cand c LEFT JOIN sb ON sb.v <= c.v GROUP BY c.v),
        |dd AS (SELECT ca.v, ABS(ca.cum_a * sz.sn_b - cb.cum_b * sz.sn_a) AS d
        |       FROM ca JOIN cb ON ca.v = cb.v CROSS JOIN sz),
        |best AS (SELECT v AS at_value, d AS d_num FROM dd
        |       ORDER BY d DESC, v ASC LIMIT 1)
        |SELECT nn.n_a, nn.n_b, sz.sn_a, sz.sn_b, best.d_num, best.at_value,
        |  CASE WHEN sz.sn_a > 0 AND sz.sn_b > 0
        |       THEN (1000 * best.d_num) // (sz.sn_a * sz.sn_b) END AS ks_permille
        |FROM nn CROSS JOIN sz CROSS JOIN best""".stripMargin,
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
    "q_cliques4" ->
      """WITH base AS (SELECT DISTINCT l_orderkey AS tid,
        |         'P' || CAST(l_partkey AS VARCHAR) AS item
        |       FROM lineitem WHERE l_quantity <= 15),
        |ok AS (SELECT tid FROM base GROUP BY tid HAVING COUNT(*) <= 8),
        |bb AS (SELECT base.tid, base.item FROM base JOIN ok USING (tid)),
        |und AS MATERIALIZED (SELECT DISTINCT x.item AS x, y.item AS y
        |        FROM bb x JOIN bb y ON x.tid = y.tid AND x.item < y.item),
        |tri AS (SELECT e1.x AS a, e1.y AS b, e2.y AS c
        |        FROM und e1 JOIN und e2 ON e2.x = e1.x AND e2.y > e1.y
        |        JOIN und e3 ON e3.x = e1.y AND e3.y = e2.y),
        |cl AS (SELECT t.a, t.b, t.c, ed.y AS d
        |       FROM tri t JOIN und ed ON ed.x = t.c
        |       WHERE EXISTS (SELECT 1 FROM und p
        |                     WHERE p.x = t.a AND p.y = ed.y)
        |         AND EXISTS (SELECT 1 FROM und q2
        |                     WHERE q2.x = t.b AND q2.y = ed.y)),
        |part AS (SELECT node, COUNT(*) AS n_cliques4
        |         FROM (SELECT a AS node FROM cl UNION ALL SELECT b FROM cl
        |               UNION ALL SELECT c FROM cl UNION ALL SELECT d FROM cl)
        |         GROUP BY 1)
        |SELECT node, n_cliques4 FROM part ORDER BY node""".stripMargin,
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
    "q_ann_recall" ->
      s"""WITH lsh AS (SELECT * FROM (
         |${graft.ops.Similarity.lshPortableOracle(dim = 64, k = 5,
              nBits = 6, tables = 4, seed = 42L)})),
         |bf AS (SELECT * FROM (
         |  WITH q AS (SELECT vec_id, list_transform(embedding,
         |               x -> FLOOR(CAST(x AS DOUBLE) * CAST(10000.0 AS DOUBLE))) AS v
         |             FROM embeddings),
         |  n AS (SELECT vec_id, (SELECT SUM(x*x) FROM UNNEST(v) AS t(x)) AS nrm FROM q),
         |  p AS (SELECT qq.vec_id AS query_id, c.vec_id AS neighbor_id,
         |          (SELECT SUM(qq.v[i]*c.v[i])
         |           FROM UNNEST(range(1, len(qq.v)+1)) AS t(i)) AS dot
         |        FROM (SELECT * FROM q WHERE vec_id < 20) qq
         |        JOIN q c ON c.vec_id <> qq.vec_id),
         |  scored AS (SELECT query_id, neighbor_id,
         |               ROW_NUMBER() OVER (PARTITION BY query_id
         |                 ORDER BY dot / SQRT(na.nrm * nb.nrm) DESC,
         |                   neighbor_id ASC) AS rank
         |             FROM p JOIN n na ON na.vec_id = query_id
         |                    JOIN n nb ON nb.vec_id = neighbor_id)
         |  SELECT query_id, neighbor_id FROM scored WHERE rank <= 5)),
         |j AS (SELECT b.query_id, COUNT(*) AS n_truth,
         |        CAST(SUM(CASE WHEN l.neighbor_id IS NOT NULL
         |                      THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
         |      FROM bf b LEFT JOIN lsh l
         |        ON l.query_id = b.query_id AND l.neighbor_id = b.neighbor_id
         |      GROUP BY 1)
         |SELECT query_id, n_truth, n_hits,
         |  (1000 * n_hits) // n_truth AS recall_permille
         |FROM j ORDER BY query_id""".stripMargin,
    "q_stationary" ->
      s"""WITH e AS (SELECT user_id, event_type,
         |             lead(event_type) OVER (PARTITION BY user_id
         |               ORDER BY epoch_us(ts), event_id) AS to_type
         |           FROM events),
         |c AS (SELECT event_type AS a, to_type AS b, COUNT(*) AS n
         |      FROM e WHERE to_type IS NOT NULL GROUP BY 1, 2),
         |st AS (SELECT DISTINCT a AS s FROM c),
         |tr AS (SELECT a, b, n FROM c WHERE b IN (SELECT s FROM st)),
         |outd AS (SELECT a, CAST(SUM(n) AS BIGINT) AS o FROM tr GROUP BY 1),
         |${graft.ops.Transitions.stationaryOracleCtes(6)}
         |SELECT st.s AS state, COALESCE(p6.pi, 0) AS pi_ppm
         |FROM st LEFT JOIN p6 ON p6.s = st.s
         |ORDER BY state""".stripMargin,
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
    "q_rrf_fusion" ->
      """WITH q AS (SELECT vec_id, list_transform(embedding,
        |             x -> FLOOR(CAST(x AS DOUBLE) * CAST(10000.0 AS DOUBLE))) AS v
        |           FROM embeddings),
        |n AS (SELECT vec_id, (SELECT SUM(x*x) FROM UNNEST(v) AS t(x)) AS nrm FROM q),
        |p AS (SELECT qq.vec_id AS query_id, c.vec_id AS neighbor_id,
        |        (SELECT SUM(qq.v[i]*c.v[i])
        |         FROM UNNEST(range(1, len(qq.v)+1)) AS t(i)) AS dot
        |      FROM (SELECT * FROM q WHERE vec_id < 20) qq
        |      JOIN q c ON c.vec_id <> qq.vec_id),
        |ra AS (SELECT query_id, neighbor_id,
        |         ROW_NUMBER() OVER (PARTITION BY query_id
        |           ORDER BY dot / SQRT(na.nrm * nb.nrm) DESC,
        |             neighbor_id ASC) AS rank
        |       FROM p JOIN n na ON na.vec_id = query_id
        |              JOIN n nb ON nb.vec_id = neighbor_id),
        |rb AS (SELECT query_id, neighbor_id,
        |         ROW_NUMBER() OVER (PARTITION BY query_id
        |           ORDER BY dot DESC, neighbor_id ASC) AS rank
        |       FROM p),
        |u AS (SELECT query_id, neighbor_id, rank FROM ra WHERE rank <= 20
        |      UNION ALL
        |      SELECT query_id, neighbor_id, rank FROM rb WHERE rank <= 20),
        |fz AS (SELECT query_id, neighbor_id,
        |         CAST(SUM(1000000 // (60 + rank)) AS BIGINT) AS rrf_ppm
        |       FROM u GROUP BY 1, 2)
        |SELECT query_id, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
        |    ORDER BY rrf_ppm DESC, neighbor_id ASC) AS INT) AS rank,
        |  neighbor_id, rrf_ppm
        |FROM fz
        |QUALIFY rank <= 5
        |ORDER BY query_id, rank""".stripMargin,
    "q_chi2_tokens" ->
      s"""WITH docs AS (SELECT doc_id, lang = 'en' AS lab, text FROM documents),
         |tokd AS (SELECT DISTINCT doc_id, lab, t.tok
         |         FROM docs, UNNEST(string_split(text, ' ')) AS t(tok)
         |         WHERE length(t.tok) > 0),
         |tot AS (SELECT COUNT(*) AS n,
         |          CAST(SUM(CASE WHEN lab THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
         |        FROM docs),
         |pt AS (SELECT tok, COUNT(*) AS df,
         |         CAST(SUM(CASE WHEN lab THEN 1 ELSE 0 END) AS BIGINT) AS pos_df
         |       FROM tokd GROUP BY 1),
         |j AS (SELECT tok, df, pos_df, n, n_pos FROM pt CROSS JOIN tot),
         |${graft.ops.ChiSquare.oracleDigitSql("j")}
         |SELECT tok, df, pos_df, phi2_ppm,
         |  CAST(phi2_ppm * n AS BIGINT) AS chi2_ppm
         |FROM chi
         |ORDER BY phi2_ppm DESC, tok""".stripMargin,
    "q_feature_hash" ->
      """WITH tok AS (SELECT doc_id, t.tok
        |             FROM documents, UNNEST(string_split(text, ' ')) AS t(tok)
        |             WHERE length(t.tok) > 0),
        |h AS (SELECT doc_id,
        |        ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h
        |      FROM tok),
        |f AS (SELECT doc_id, h % 64 AS bucket,
        |        1 - 2 * ((h // 64) % 2) AS sign
        |      FROM h)
        |SELECT doc_id, bucket, CAST(SUM(sign) AS BIGINT) AS feat_val,
        |  COUNT(*) AS n_tokens
        |FROM f GROUP BY 1, 2
        |ORDER BY doc_id, bucket""".stripMargin,
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
    "q_cusum" ->
      """WITH daily AS (SELECT event_type AS grp,
        |                 epoch_us(ts) // 86400000000 AS day,
        |                 COUNT(*) AS cnt
        |               FROM events GROUP BY 1, 2),
        |b AS (SELECT grp, day, cnt, ROW_NUMBER() OVER w AS i,
        |        CAST(SUM(cnt) OVER w AS BIGINT) AS prefix
        |      FROM daily WINDOW w AS (PARTITION BY grp ORDER BY day)),
        |st AS (SELECT grp, COUNT(*) AS nb, CAST(SUM(cnt) AS BIGINT) AS total
        |       FROM daily GROUP BY 1),
        |dv AS (SELECT b.grp, day, nb, total,
        |         nb * prefix - i * total AS dev,
        |         abs(nb * prefix - i * total) AS absdev
        |       FROM b JOIN st ON b.grp = st.grp),
        |r AS (SELECT *, ROW_NUMBER() OVER
        |        (PARTITION BY grp ORDER BY absdev DESC, day) AS rk
        |      FROM dv)
        |SELECT grp, nb AS n_buckets, total, day AS cp_bucket,
        |  absdev AS cusum_max_scaled,
        |  CASE WHEN dev >= 0 THEN 1 ELSE -1 END AS dir_sign
        |FROM r WHERE rk = 1
        |ORDER BY grp""".stripMargin,
    "q_window_range" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |  CAST(FLOOR(value * 1000000.0) AS BIGINT) AS v_us,
        |  COUNT(*) OVER w AS trail_n,
        |  CAST(SUM(CAST(FLOOR(value * 1000000.0) AS BIGINT)) OVER w AS BIGINT) AS trail_sum
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, ts_us, event_id""".stripMargin,
    "q_scc_condense" ->
      """WITH RECURSIVE
        |ev AS (SELECT user_id, ts, event_id,
        |              lead(user_id) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS nxt
        |       FROM events WHERE event_type = 'click' AND value < 2.0),
        |e AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS src, CAST(nxt AS VARCHAR) AS dst
        |      FROM ev WHERE nxt IS NOT NULL AND nxt <> user_id),
        |n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |reach AS (SELECT node AS a, node AS b FROM n
        |          UNION
        |          SELECT r.a, e.dst FROM reach r JOIN e ON r.b = e.src),
        |scc AS (SELECT f.a AS node, MIN(f.b) AS scc_id
        |        FROM reach f JOIN reach r ON f.a = r.b AND f.b = r.a
        |        GROUP BY f.a)
        |SELECT DISTINCT a.scc_id AS scc_src, b.scc_id AS scc_dst
        |FROM e JOIN scc a ON a.node = e.src JOIN scc b ON b.node = e.dst
        |WHERE a.scc_id <> b.scc_id
        |ORDER BY scc_src, scc_dst""".stripMargin,
    "q_topo_layers" ->
      """WITH RECURSIVE
        |nk AS (SELECT n_name, n_nationkey, ROW_NUMBER() OVER (ORDER BY n_nationkey) AS rn FROM nation),
        |chain AS (SELECT a.n_name AS src, b.n_name AS dst FROM nk a JOIN nk b ON b.rn = a.rn + 1),
        |skip AS (SELECT a.n_name AS src, b.n_name AS dst FROM nk a JOIN nk b ON b.rn = a.rn + 5),
        |e AS (SELECT DISTINCT src, dst FROM (SELECT * FROM chain UNION ALL SELECT * FROM skip)),
        |n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |s AS (SELECT node FROM n WHERE node NOT IN (SELECT dst FROM e)),
        |p AS (SELECT node, 0 AS l FROM s
        |      UNION ALL
        |      SELECT e.dst, p.l + 1 FROM p JOIN e ON e.src = p.node)
        |SELECT node, CAST(MAX(l) AS BIGINT) AS layer
        |FROM p GROUP BY node ORDER BY node""".stripMargin,
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
    "q_dedup_snm" ->
      """WITH k AS (SELECT doc_id, substr(text, 1, 64) AS key FROM documents),
        |r AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY key, doc_id) AS grn FROM k),
        |cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |         FROM r a JOIN r b ON b.grn - a.grn BETWEEN 1 AND 8),
        |toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
        |       FROM toks, UNNEST(range(1, greatest(len(w)-1, 2))) AS t(i)),
        |si AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        |inter AS (SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
        |          FROM cand c
        |          JOIN sh a ON a.doc_id = c.id_a
        |          JOIN sh b ON b.doc_id = c.id_b AND a.shingle = b.shingle
        |          GROUP BY 1, 2)
        |SELECT c.id_a, c.id_b, CAST(COALESCE(n_inter, 0) AS BIGINT) AS n_inter,
        |  (1000 * COALESCE(n_inter, 0))
        |    // (sa.n_sh + sb.n_sh - COALESCE(n_inter, 0)) AS jaccard_permille
        |FROM cand c
        |JOIN si sa ON sa.doc_id = c.id_a
        |JOIN si sb ON sb.doc_id = c.id_b
        |LEFT JOIN inter ON inter.id_a = c.id_a AND inter.id_b = c.id_b
        |WHERE (1000 * COALESCE(n_inter, 0))
        |    // (sa.n_sh + sb.n_sh - COALESCE(n_inter, 0)) >= 500
        |ORDER BY c.id_a, c.id_b""".stripMargin,
    "q_latest_state" ->
      """WITH r AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |             event_type, value,
        |             ROW_NUMBER() OVER (PARTITION BY user_id
        |               ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn,
        |             COUNT(*) OVER (PARTITION BY user_id) AS n_events
        |           FROM events)
        |SELECT user_id, ts_us AS last_ts_us, event_id AS last_event_id,
        |  event_type AS last_type, value AS last_value,
        |  CAST(n_events AS BIGINT) AS n_events
        |FROM r WHERE rn = 1
        |ORDER BY user_id""".stripMargin,
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
    "q_katz" -> katzOracle(iters = 6, alphaNum = 1, alphaDen = 8,
      scale = 1000000000L),
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
    "q_merge_upsert" ->
      """WITH base AS (SELECT c_custkey AS k, c_mktsegment AS seg,
        |                CAST(FLOOR(c_acctbal * 100.0) AS BIGINT) AS bal_c
        |              FROM customer),
        |ch AS (SELECT k, 'U' AS op, seg, bal_c + 10000 AS bal_c
        |       FROM base WHERE k % 7 = 0
        |       UNION ALL
        |       SELECT k, 'D', seg, bal_c FROM base
        |       WHERE k % 11 = 0 AND k % 7 <> 0
        |       UNION ALL
        |       SELECT k + 1000000, 'I', 'NEW', 0 FROM base WHERE k % 13 = 0)
        |SELECT COALESCE(ch.k, base.k) AS k,
        |  CASE WHEN ch.op IS NOT NULL THEN ch.seg ELSE base.seg END AS seg,
        |  CAST(CASE WHEN ch.op IS NOT NULL THEN ch.bal_c ELSE base.bal_c END AS BIGINT) AS bal_c
        |FROM base FULL OUTER JOIN ch ON base.k = ch.k
        |WHERE ch.op IS NULL OR ch.op <> 'D'
        |ORDER BY k""".stripMargin,
    "q_louvain_move" ->
      s"""${lpaCtes(4)},
         |adjv AS (SELECT x AS v, y AS n FROM e0 UNION ALL SELECT y AS v, x AS n FROM e0),
         |mm AS (SELECT COUNT(*) AS m FROM e0),
         |degv AS (SELECT v, COUNT(*) AS d FROM adjv GROUP BY v),
         |labv AS (SELECT node, lab AS community FROM l4),
         |dcc AS (SELECT community, CAST(SUM(d) AS BIGINT) AS d_c
         |        FROM degv JOIN labv ON degv.v = labv.node GROUP BY community),
         |evc AS (SELECT adjv.v, labv.community AS c, COUNT(*) AS e_vc
         |        FROM adjv JOIN labv ON labv.node = adjv.n GROUP BY 1, 2),
         |ownc AS (SELECT node AS v, community AS c, 0 AS e_vc FROM labv),
         |candc AS (SELECT v, c, CAST(MAX(e_vc) AS BIGINT) AS e_vc FROM (
         |            SELECT * FROM evc UNION ALL SELECT * FROM ownc)
         |          GROUP BY v, c),
         |sc AS (SELECT candc.v, candc.c,
         |         4 * mm.m * candc.e_vc
         |           - 2 * degv.d * (dcc.d_c -
         |               CASE WHEN candc.c = labv.community THEN degv.d ELSE 0 END) AS score
         |       FROM candc CROSS JOIN mm
         |       JOIN labv ON labv.node = candc.v
         |       JOIN degv ON degv.v = candc.v
         |       JOIN dcc ON dcc.community = candc.c),
         |best AS (SELECT v, c,
         |           ROW_NUMBER() OVER (PARTITION BY v ORDER BY score DESC, c ASC) AS rn
         |         FROM sc)
         |SELECT v AS node, c AS community FROM best WHERE rn = 1
         |ORDER BY node""".stripMargin,
    "q_louvain" -> louvainOracle(moveRounds = 2),
    "q_louvain_hier" -> louvainHierOracle(moveRounds = 2),
    "q_user_features" ->
      """WITH r AS (SELECT MAX(epoch_us(ts)) AS ref FROM events)
        |SELECT user_id AS id, COUNT(*) AS n_total,
        |  CAST(SUM(CASE WHEN epoch_us(ts) > ref - 7 * 86400000000
        |       THEN 1 ELSE 0 END) AS BIGINT) AS n_7d,
        |  CAST(SUM(CASE WHEN epoch_us(ts) > ref - 30 * 86400000000
        |       THEN 1 ELSE 0 END) AS BIGINT) AS n_30d,
        |  (ref - MAX(epoch_us(ts))) // 86400000000 AS days_since_last,
        |  (MAX(epoch_us(ts)) - MIN(epoch_us(ts))) // 86400000000 AS days_active_span
        |FROM events, r GROUP BY user_id, ref
        |ORDER BY id""".stripMargin,
    "q_rfm" ->
      """WITH r AS (SELECT MAX(epoch_us(o_orderdate)) AS ref FROM orders),
        |base AS (SELECT o_custkey AS id,
        |           (ref - MAX(epoch_us(o_orderdate))) // 86400000000 AS recency_days,
        |           COUNT(*) AS frequency,
        |           CAST(SUM(FLOOR(o_totalprice * 100.0)) AS BIGINT) AS monetary_c
        |         FROM orders, r GROUP BY o_custkey, ref),
        |n AS (SELECT COUNT(*) AS n FROM base),
        |rk AS (SELECT base.*, n.n,
        |         ROW_NUMBER() OVER (ORDER BY recency_days, id) AS rr,
        |         ROW_NUMBER() OVER (ORDER BY frequency DESC, id) AS rf,
        |         ROW_NUMBER() OVER (ORDER BY monetary_c DESC, id) AS rm
        |       FROM base, n)
        |SELECT id, recency_days, frequency, monetary_c,
        |  4 - (4 * (rr - 1)) // n AS r_score,
        |  4 - (4 * (rf - 1)) // n AS f_score,
        |  4 - (4 * (rm - 1)) // n AS m_score,
        |  (4 - (4 * (rr - 1)) // n) * 100 + (4 - (4 * (rf - 1)) // n) * 10
        |    + (4 - (4 * (rm - 1)) // n) AS rfm
        |FROM rk ORDER BY id""".stripMargin,
    "q_epoch_batches" ->
      """WITH k AS (SELECT doc_id AS id, e.epoch,
        |             ('0x' || substr(md5(CAST(e.epoch AS VARCHAR) || '|'
        |               || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS kk
        |           FROM documents, UNNEST([0, 1]) AS e(epoch)),
        |r AS (SELECT id, epoch,
        |        ROW_NUMBER() OVER (ORDER BY epoch, kk, id) - 1 AS pos0g
        |      FROM k),
        |n AS (SELECT COUNT(*) AS n FROM documents)
        |SELECT id, epoch, (pos0g - epoch * n) // 64 AS batch_id,
        |  (pos0g - epoch * n) % 64 AS pos_in_batch
        |FROM r, n
        |ORDER BY id, epoch""".stripMargin,
    "q_label_spread" -> labelSpreadOracle(rounds = 3, ratePermille = 20,
      salt = "spread"),
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
    "q_resample_ohlc" ->
      """WITH v AS (SELECT event_type AS grp, epoch_us(ts) AS ts_us, event_id,
        |             CAST(FLOOR(value * 1000000.0) AS BIGINT) AS v_us
        |           FROM events),
        |b AS (SELECT grp, ts_us - (ts_us % 86400000000) AS bucket_start_us,
        |        ts_us, event_id, v_us FROM v),
        |r AS (SELECT grp, bucket_start_us, v_us,
        |        ROW_NUMBER() OVER (PARTITION BY grp, bucket_start_us
        |          ORDER BY ts_us, event_id) AS ra,
        |        ROW_NUMBER() OVER (PARTITION BY grp, bucket_start_us
        |          ORDER BY ts_us DESC, event_id DESC) AS rd
        |      FROM b)
        |SELECT grp, bucket_start_us, COUNT(*) AS n,
        |  MIN(CASE WHEN ra = 1 THEN v_us END) AS open,
        |  MAX(v_us) AS high, MIN(v_us) AS low,
        |  MIN(CASE WHEN rd = 1 THEN v_us END) AS close
        |FROM r GROUP BY grp, bucket_start_us
        |ORDER BY grp, bucket_start_us""".stripMargin,
    "q_hourly_profile" ->
      """WITH h AS (SELECT event_type AS grp,
        |             (epoch_us(ts) // 3600000000) % 24 AS hour
        |           FROM events),
        |c AS (SELECT grp, hour, COUNT(*) AS n FROM h GROUP BY grp, hour),
        |t AS (SELECT grp, CAST(SUM(n) AS BIGINT) AS tot FROM c GROUP BY grp)
        |SELECT c.grp, c.hour, c.n, (1000 * n) // tot AS share_permille
        |FROM c JOIN t ON c.grp = t.grp
        |ORDER BY c.grp, c.hour""".stripMargin,
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
    "q_embed_gram" ->
      """WITH q AS (SELECT list_transform(embedding,
        |             x -> CAST(FLOOR(CAST(x AS DOUBLE) * CAST(10000.0 AS DOUBLE)) AS BIGINT)) AS v
        |           FROM embeddings),
        |cells AS (SELECT CAST(a.i AS INT) AS i, CAST(b.j AS INT) AS j,
        |            v[a.i + 1] * v[b.j + 1] AS p
        |          FROM q, UNNEST(range(0, 64)) AS a(i), UNNEST(range(0, 64)) AS b(j)
        |          WHERE b.j >= a.i)
        |SELECT i, j, (SELECT COUNT(*) FROM q) AS n,
        |  CAST(SUM(p) AS BIGINT) AS s
        |FROM cells GROUP BY i, j
        |ORDER BY i, j""".stripMargin,
    "q_graph_density" -> ccOracle(
      """, comp AS (SELECT node, MIN(lab) AS component FROM cc GROUP BY node),
        |e2 AS (SELECT DISTINCT LEAST(a, b) AS x, GREATEST(a, b) AS y FROM edges),
        |ce AS (SELECT c.component, COUNT(*) AS n_edges
        |       FROM e2 JOIN comp c ON c.node = e2.x GROUP BY 1),
        |cn AS (SELECT component, COUNT(*) AS n_nodes FROM comp GROUP BY 1)
        |SELECT cn.component, cn.n_nodes,
        |  CAST(COALESCE(ce.n_edges, 0) AS BIGINT) AS n_edges,
        |  CASE WHEN cn.n_nodes > 1
        |       THEN (2000 * COALESCE(ce.n_edges, 0))
        |              // (cn.n_nodes * (cn.n_nodes - 1))
        |       ELSE 0 END AS density_permille
        |FROM cn LEFT JOIN ce USING (component)
        |ORDER BY component""".stripMargin),
    "q_negative_edges" ->
      """WITH ev AS (SELECT user_id, ts, event_id,
        |              lead(user_id) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS nxt
        |            FROM events WHERE event_type = 'click' AND value < 2.0),
        |e AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS src, CAST(nxt AS VARCHAR) AS dst
        |      FROM ev WHERE nxt IS NOT NULL AND nxt <> user_id),
        |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |r AS (SELECT node, ROW_NUMBER() OVER (ORDER BY node) AS grn FROM nodes),
        |nn AS (SELECT COUNT(*) AS n FROM r),
        |cand AS (SELECT a.node AS src, b.node AS dst
        |         FROM r a CROSS JOIN nn
        |         JOIN r b ON b.grn = (a.grn * 2654435761) % nn.n + 1
        |         WHERE (a.grn * 2654435761) % nn.n + 1 <> a.grn)
        |SELECT c.src, c.dst FROM cand c
        |WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.src = c.src AND e.dst = c.dst)
        |  AND NOT EXISTS (SELECT 1 FROM e WHERE e.src = c.dst AND e.dst = c.src)
        |ORDER BY src, dst""".stripMargin,
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
    "q_vocab_drift" ->
      """WITH toks AS (SELECT source AS k,
        |                ('0x' || substr(md5(tok), 1, 8))::BIGINT % 1024 AS b
        |              FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
        |                    FROM documents)),
        |cnts AS (SELECT k, b, COUNT(*) AS cnt FROM toks GROUP BY k, b),
        |tots AS (SELECT k, CAST(SUM(cnt) AS BIGINT) AS tot FROM cnts GROUP BY k),
        |dist AS (SELECT cnts.k, b, (1000 * cnt) // tot AS pm
        |         FROM cnts JOIN tots USING (k)),
        |prs AS (SELECT a.k AS src_a, b.k AS src_b
        |        FROM (SELECT DISTINCT k FROM dist) a
        |        JOIN (SELECT DISTINCT k FROM dist) b ON a.k < b.k),
        |un AS (SELECT prs.src_a, prs.src_b, d.b, d.pm AS pm_a, 0 AS pm_b
        |       FROM prs JOIN dist d ON d.k = prs.src_a
        |       UNION ALL
        |       SELECT prs.src_a, prs.src_b, d.b, 0 AS pm_a, d.pm AS pm_b
        |       FROM prs JOIN dist d ON d.k = prs.src_b),
        |pb AS (SELECT src_a, src_b, b, SUM(pm_a) AS pa, SUM(pm_b) AS pb
        |       FROM un GROUP BY 1, 2, 3)
        |SELECT src_a, src_b, COUNT(*) AS n_buckets_used,
        |  CAST(SUM(ABS(pa - pb)) AS BIGINT) AS l1_permille
        |FROM pb GROUP BY src_a, src_b
        |ORDER BY src_a, src_b""".stripMargin,
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
    "q_mann_kendall" ->
      """WITH daily AS (SELECT event_type AS grp,
        |         epoch_us(ts) // 86400000000 AS t,
        |         CAST(COUNT(*) AS BIGINT) AS y
        |       FROM events GROUP BY 1, 2),
        |p AS (SELECT a.grp, a.t AS ta, b.t AS tb, b.y - a.y AS dy,
        |        b.t - a.t AS dt
        |      FROM daily a JOIN daily b ON a.grp = b.grp AND a.t < b.t),
        |q AS (SELECT grp, ta, tb, dy,
        |        CASE WHEN dy >= 0 THEN (1000000 * dy) // dt
        |             ELSE 0 - ((1000000 * (0 - dy)) // dt) END AS slope_ppm
        |      FROM p),
        |r AS (SELECT grp, dy, slope_ppm,
        |        CAST(ROW_NUMBER() OVER (PARTITION BY grp
        |          ORDER BY slope_ppm, ta, tb) AS BIGINT) AS rn,
        |        CAST(COUNT(*) OVER (PARTITION BY grp) AS BIGINT) AS np
        |      FROM q)
        |SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |  CAST(SUM(CASE WHEN dy > 0 THEN 1 WHEN dy < 0 THEN -1 ELSE 0 END)
        |    AS BIGINT) AS s_stat,
        |  MAX(CASE WHEN rn = (np + 1) // 2 THEN slope_ppm END)
        |    AS sen_slope_ppm
        |FROM r GROUP BY grp ORDER BY grp""".stripMargin,
    "q_percolation" -> percolationOracle(Seq(250, 500, 750)),
    "q_bowtie" ->
      """WITH RECURSIVE
        |ev AS (SELECT user_id, ts, event_id,
        |         lead(user_id) OVER (PARTITION BY event_type
        |           ORDER BY ts, event_id) AS nxt
        |       FROM events WHERE event_type = 'click' AND value < 2.0),
        |e AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS src,
        |        CAST(nxt AS VARCHAR) AS dst
        |      FROM ev WHERE nxt IS NOT NULL AND nxt <> user_id),
        |-- DuckDB quirk: inside WITH RECURSIVE a non-recursive CTE's
        |-- UNION loses dedup -- make the distinct explicit
        |n AS (SELECT DISTINCT node FROM (SELECT src AS node FROM e
        |      UNION ALL SELECT dst FROM e)),
        |reach AS (SELECT node AS a, node AS b FROM n
        |          UNION
        |          SELECT r.a, e.dst FROM reach r JOIN e ON r.b = e.src),
        |scc AS (SELECT f.a AS node, MIN(f.b) AS scc_id
        |        FROM reach f JOIN reach r ON f.a = r.b AND f.b = r.a
        |        GROUP BY f.a),
        |core AS (SELECT node FROM scc WHERE scc_id = (
        |    SELECT scc_id FROM (SELECT scc_id, COUNT(*) AS sz FROM scc
        |                        GROUP BY 1)
        |    ORDER BY sz DESC, scc_id LIMIT 1)),
        |outx AS (SELECT DISTINCT r.b AS node
        |         FROM reach r JOIN core c ON r.a = c.node
        |         WHERE r.b NOT IN (SELECT node FROM core)),
        |inx AS (SELECT DISTINCT r.a AS node
        |        FROM reach r JOIN core c ON r.b = c.node
        |        WHERE r.a NOT IN (SELECT node FROM core))
        |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM n) AS n_nodes,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM core) AS n_core,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM inx) AS n_in,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM outx) AS n_out,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM n)
        |    - (SELECT CAST(COUNT(*) AS BIGINT) FROM core)
        |    - (SELECT CAST(COUNT(*) AS BIGINT) FROM inx)
        |    - (SELECT CAST(COUNT(*) AS BIGINT) FROM outx) AS n_other""".stripMargin,
    "q_gap_quantiles" ->
      """WITH ev AS (SELECT event_type, user_id, epoch_us(ts) AS ts_us,
        |         event_id FROM events),
        |g AS (SELECT event_type,
        |        ts_us - LAG(ts_us) OVER (PARTITION BY user_id, event_type
        |          ORDER BY ts_us, event_id) AS gap
        |      FROM ev),
        |vals AS (SELECT event_type AS pri, gap // 1000000 AS v
        |         FROM g WHERE gap IS NOT NULL),
        |hashed AS (SELECT pri, v,
        |             ('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 15))::BIGINT
        |               AS h
        |           FROM vals),
        |rk AS (SELECT pri, v, h,
        |         ROW_NUMBER() OVER (PARTITION BY pri ORDER BY h, v) AS rk
        |       FROM hashed),
        |kept AS (SELECT pri, v, h, rk FROM rk WHERE rk <= 64),
        |sq AS (SELECT pri, CAST(COUNT(*) AS BIGINT) AS n FROM kept
        |       GROUP BY pri),
        |q AS (SELECT UNNEST([500, 900, 990]) AS q_permille),
        |idx AS (SELECT pri, q_permille,
        |          GREATEST(1, LEAST(n, (n * q_permille + 999) // 1000))
        |            AS ix
        |        FROM sq CROSS JOIN q),
        |ordered AS (SELECT pri, v,
        |              ROW_NUMBER() OVER (PARTITION BY pri ORDER BY v) AS vr
        |            FROM kept)
        |SELECT i.pri AS event_type, CAST(i.q_permille AS INT) AS q_permille,
        |       o.v AS quantile_v
        |FROM idx i JOIN ordered o ON o.pri = i.pri AND o.vr = i.ix
        |ORDER BY 1, 2""".stripMargin,
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
    "q_running_drawdown" ->
      """WITH daily AS (SELECT event_type AS grp,
        |         epoch_us(ts) // 86400000000 AS day,
        |         CAST(COUNT(*) AS BIGINT) AS c
        |       FROM events GROUP BY 1, 2)
        |SELECT grp, day AS bucket, c,
        |  CAST(MAX(c) OVER (PARTITION BY grp ORDER BY day
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS runmax,
        |  CAST(MAX(c) OVER (PARTITION BY grp ORDER BY day
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) - c AS dd
        |FROM daily ORDER BY grp, bucket""".stripMargin,
    "q_streaks" ->
      """WITH act AS (SELECT DISTINCT user_id AS key,
        |         epoch_us(ts) // 86400000000 AS bucket
        |       FROM events),
        |isl AS (SELECT key, bucket,
        |         bucket - CAST(ROW_NUMBER() OVER (PARTITION BY key
        |           ORDER BY bucket) AS BIGINT) AS island
        |       FROM act),
        |runs AS (SELECT key, island, CAST(COUNT(*) AS BIGINT) AS len,
        |           CAST(MIN(bucket) AS BIGINT) AS start
        |         FROM isl GROUP BY 1, 2),
        |sel AS (SELECT key, len, start,
        |         ROW_NUMBER() OVER (PARTITION BY key
        |           ORDER BY len DESC, start) AS rk,
        |         CAST(SUM(len) OVER (PARTITION BY key) AS BIGINT)
        |           AS n_active
        |       FROM runs)
        |SELECT key, n_active, len AS longest_streak,
        |  start AS streak_start
        |FROM sel WHERE rk = 1 ORDER BY key""".stripMargin,
    "q_discord" ->
      """WITH daily AS (SELECT event_type AS grp,
        |         epoch_us(ts) // 86400000000 AS day,
        |         CAST(COUNT(*) AS BIGINT) AS c
        |       FROM events GROUP BY 1, 2),
        |idx AS (SELECT grp, c,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY grp ORDER BY day)
        |           AS BIGINT) AS i
        |       FROM daily),
        |sub AS (SELECT x.grp, x.i, x.c AS c0, y.c AS c1, z.c AS c2
        |        FROM idx x
        |          JOIN idx y ON y.grp = x.grp AND y.i = x.i + 1
        |          JOIN idx z ON z.grp = x.grp AND z.i = x.i + 2),
        |nn AS (SELECT a.grp, a.i,
        |         CAST(MIN((a.c0-b.c0)*(a.c0-b.c0) + (a.c1-b.c1)*(a.c1-b.c1)
        |           + (a.c2-b.c2)*(a.c2-b.c2)) AS BIGINT) AS nn_dist_sq
        |       FROM sub a JOIN sub b ON b.grp = a.grp
        |         AND ABS(b.i - a.i) >= 3
        |       GROUP BY 1, 2),
        |np AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_positions
        |       FROM sub GROUP BY 1),
        |sel AS (SELECT grp, i, nn_dist_sq,
        |         ROW_NUMBER() OVER (PARTITION BY grp
        |           ORDER BY nn_dist_sq DESC, i) AS rk
        |       FROM nn)
        |SELECT sel.grp, np.n_positions, i, nn_dist_sq
        |FROM sel JOIN np ON np.grp = sel.grp
        |WHERE rk = 1 ORDER BY sel.grp""".stripMargin,
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
    "q_drawdown" ->
      """WITH daily AS (SELECT event_type AS grp,
        |         epoch_us(ts) // 86400000000 AS day,
        |         CAST(COUNT(*) AS BIGINT) AS c
        |       FROM events GROUP BY 1, 2),
        |r AS (SELECT grp, day AS bucket, c,
        |        CAST(MAX(c) OVER (PARTITION BY grp ORDER BY day
        |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS runmax
        |      FROM daily),
        |sel AS (SELECT grp, bucket, c, runmax, runmax - c AS dd,
        |         ROW_NUMBER() OVER (PARTITION BY grp
        |           ORDER BY runmax - c DESC, bucket) AS rk,
        |         CAST(COUNT(*) OVER (PARTITION BY grp) AS BIGINT)
        |           AS n_buckets
        |       FROM r)
        |SELECT grp, n_buckets, runmax AS peak_c, c AS trough_c,
        |  dd AS max_drawdown, bucket AS dd_bucket
        |FROM sel WHERE rk = 1 ORDER BY grp""".stripMargin,
    "q_ts_motif" ->
      """WITH daily AS (SELECT event_type AS grp,
        |         epoch_us(ts) // 86400000000 AS day,
        |         CAST(COUNT(*) AS BIGINT) AS c
        |       FROM events GROUP BY 1, 2),
        |idx AS (SELECT grp, c,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY grp ORDER BY day)
        |           AS BIGINT) AS i
        |       FROM daily),
        |sub AS (SELECT x.grp, x.i, x.c AS c0, y.c AS c1, z.c AS c2
        |        FROM idx x
        |          JOIN idx y ON y.grp = x.grp AND y.i = x.i + 1
        |          JOIN idx z ON z.grp = x.grp AND z.i = x.i + 2),
        |pairs AS (SELECT a.grp, a.i, b.i AS j,
        |    (a.c0-b.c0)*(a.c0-b.c0) + (a.c1-b.c1)*(a.c1-b.c1)
        |      + (a.c2-b.c2)*(a.c2-b.c2) AS dist_sq
        |  FROM sub a JOIN sub b ON b.grp = a.grp AND b.i >= a.i + 3),
        |np AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_positions
        |       FROM sub GROUP BY 1),
        |sel AS (SELECT grp, i, j, dist_sq,
        |         ROW_NUMBER() OVER (PARTITION BY grp
        |           ORDER BY dist_sq, i, j) AS rk
        |       FROM pairs)
        |SELECT sel.grp, np.n_positions, i, j, CAST(dist_sq AS BIGINT)
        |  AS dist_sq
        |FROM sel JOIN np ON np.grp = sel.grp
        |WHERE rk = 1 ORDER BY sel.grp""".stripMargin,
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
    "q_sparsify" ->
      """WITH RECURSIVE
        |we AS (SELECT 'P' || CAST(l_partkey AS VARCHAR) AS a,
        |         'S' || CAST(l_suppkey AS VARCHAR) AS b,
        |         CAST(COUNT(*) AS BIGINT) AS w
        |       FROM lineitem WHERE l_quantity <= 2 GROUP BY 1, 2),
        |sym AS (SELECT a, b, w FROM we UNION ALL SELECT b, a, w FROM we),
        |rk AS (SELECT a, b,
        |         ROW_NUMBER() OVER (PARTITION BY a ORDER BY w DESC, b)
        |           AS rk
        |       FROM sym),
        |sp AS (SELECT DISTINCT LEAST(a, b) AS src, GREATEST(a, b) AS dst
        |       FROM rk WHERE rk <= 2),
        |symf AS (SELECT a, b FROM we UNION SELECT b AS a, a AS b FROM we),
        |nodesf AS (SELECT DISTINCT a AS node FROM symf),
        |ccf AS (SELECT node, node AS lab FROM nodesf
        |        UNION SELECT s.b AS node, c.lab
        |        FROM ccf c JOIN symf s ON c.node = s.a WHERE c.lab < s.b),
        |compf AS (SELECT node, MIN(lab) AS component FROM ccf GROUP BY 1),
        |af AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_comp_full,
        |         CAST(MAX(cnt) AS BIGINT) AS lcc_full
        |       FROM (SELECT component, COUNT(*) AS cnt FROM compf
        |             GROUP BY 1)),
        |syms AS (SELECT src AS a, dst AS b FROM sp
        |         UNION SELECT dst AS a, src AS b FROM sp),
        |nodess AS (SELECT DISTINCT a AS node FROM syms),
        |ccs AS (SELECT node, node AS lab FROM nodess
        |        UNION SELECT s.b AS node, c.lab
        |        FROM ccs c JOIN syms s ON c.node = s.a WHERE c.lab < s.b),
        |comps AS (SELECT node, MIN(lab) AS component FROM ccs GROUP BY 1),
        |asx AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_comp_sparse,
        |          CAST(MAX(cnt) AS BIGINT) AS lcc_sparse
        |        FROM (SELECT component, COUNT(*) AS cnt FROM comps
        |              GROUP BY 1))
        |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM we) AS m_full,
        |  af.n_comp_full, af.lcc_full,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM sp) AS m_sparse,
        |  asx.n_comp_sparse, asx.lcc_sparse
        |FROM af, asx""".stripMargin,
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
    "q_sq_recall" ->
      """WITH q AS (SELECT vec_id, list_transform(embedding,
        |         x -> CAST(FLOOR(CAST(x AS DOUBLE) * CAST(10000.0 AS DOUBLE))
        |           AS BIGINT)) AS v
        |       FROM embeddings),
        |dm AS (SELECT i AS pos, MIN(q.v[i]) AS mn, MAX(q.v[i]) AS mx
        |       FROM q, UNNEST(range(1, len((SELECT v FROM q LIMIT 1)) + 1))
        |         AS t(i)
        |       GROUP BY 1),
        |codes AS (SELECT id, list(mn * 255 + code * (mx - mn)
        |      ORDER BY pos) AS cv FROM (
        |    SELECT q.vec_id AS id, d.pos, d.mn, d.mx,
        |      CASE WHEN d.mx > d.mn
        |           THEN ((q.v[d.pos] - d.mn) * 255) // (d.mx - d.mn)
        |           ELSE 0 END AS code
        |    FROM q, dm d) GROUP BY id),
        |tn AS (SELECT vec_id, (SELECT SUM(x*x) FROM UNNEST(v) AS t(x)) AS nrm
        |       FROM q),
        |tp AS (SELECT qq.vec_id AS query_id, c.vec_id AS neighbor_id,
        |        (SELECT SUM(qq.v[i]*c.v[i])
        |         FROM UNNEST(range(1, len(qq.v)+1)) AS t(i)) AS dot
        |      FROM (SELECT * FROM q WHERE vec_id < 20) qq
        |      JOIN q c ON c.vec_id <> qq.vec_id),
        |truth AS (SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |      ROW_NUMBER() OVER (PARTITION BY query_id
        |        ORDER BY dot / SQRT(na.nrm * nb.nrm) DESC, neighbor_id ASC)
        |        AS rank
        |    FROM tp JOIN tn na ON na.vec_id = query_id
        |           JOIN tn nb ON nb.vec_id = neighbor_id
        |    WHERE na.nrm > 0 AND nb.nrm > 0)
        |  WHERE rank <= 5),
        |an AS (SELECT id, (SELECT SUM(x*x) FROM UNNEST(cv) AS t(x)) AS nrm
        |       FROM codes),
        |ap AS (SELECT qq.id AS query_id, c.id AS neighbor_id,
        |        (SELECT SUM(qq.cv[i]*c.cv[i])
        |         FROM UNNEST(range(1, len(qq.cv)+1)) AS t(i)) AS dot
        |      FROM (SELECT * FROM codes WHERE id < 20) qq
        |      JOIN codes c ON c.id <> qq.id),
        |approx AS (SELECT query_id, neighbor_id FROM (
        |    SELECT ap.query_id, ap.neighbor_id,
        |      ROW_NUMBER() OVER (PARTITION BY ap.query_id
        |        ORDER BY ap.dot / SQRT(na.nrm * nb.nrm) DESC,
        |          ap.neighbor_id ASC) AS rank
        |    FROM ap JOIN an na ON na.id = ap.query_id
        |           JOIN an nb ON nb.id = ap.neighbor_id
        |    WHERE na.nrm > 0 AND nb.nrm > 0)
        |  WHERE rank <= 5)
        |SELECT t.query_id, CAST(COUNT(*) AS BIGINT) AS n_truth,
        |  CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_hits,
        |  (1000 * CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1
        |    ELSE 0 END) AS BIGINT)) // CAST(COUNT(*) AS BIGINT)
        |    AS recall_permille
        |FROM truth t LEFT JOIN approx a
        |  ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id
        |GROUP BY t.query_id ORDER BY t.query_id""".stripMargin,
    "q_linkage_clusters" ->
      """WITH RECURSIVE
        |a AS (SELECT c_custkey AS id_a, c_nationkey AS blk,
        |         CAST(FLOOR(ABS(c_acctbal) * 100) AS BIGINT) % 10 AS f0,
        |         CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS f1,
        |         right(c_name, 2) AS f2
        |       FROM customer),
        |b AS (SELECT s_suppkey AS id_b, s_nationkey AS blk,
        |        CAST(FLOOR(ABS(s_acctbal) * 100) AS BIGINT) % 10 AS g0,
        |        CAST(FLOOR(s_acctbal / 1000.0) AS BIGINT) AS g1,
        |        right(s_name, 2) AS g2
        |      FROM supplier),
        |p AS (SELECT 'C' || CAST(id_a AS VARCHAR) AS x,
        |        'S' || CAST(id_b AS VARCHAR) AS y,
        |        (CASE WHEN f0 IS NOT NULL AND g0 IS NOT NULL AND f0 = g0
        |              THEN 18 ELSE -2 END)
        |      + (CASE WHEN f1 IS NOT NULL AND g1 IS NOT NULL AND f1 = g1
        |              THEN 15 ELSE -3 END)
        |      + (CASE WHEN f2 IS NOT NULL AND g2 IS NOT NULL AND f2 = g2
        |              THEN 25 ELSE -1 END) AS score
        |      FROM a JOIN b ON b.blk = a.blk),
        |e AS (SELECT x, y FROM p WHERE score >= 40),
        |sym AS (SELECT x AS a, y AS b FROM e UNION SELECT y, x FROM e),
        |nodes AS (SELECT DISTINCT a AS node FROM sym),
        |cc AS (SELECT node, node AS lab FROM nodes
        |       UNION SELECT s.b AS node, c.lab
        |       FROM cc c JOIN sym s ON c.node = s.a WHERE c.lab < s.b)
        |SELECT component AS entity, CAST(COUNT(*) AS BIGINT) AS n_members
        |FROM (SELECT node, MIN(lab) AS component FROM cc GROUP BY 1)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_node_sketch" -> nodeSketchOracle(
      """SELECT node, CAST(lane AS INT) AS lane, h FROM s2
        |ORDER BY node, lane""".stripMargin),
    "q_node_sim" -> nodeSketchOracle(
      """, pr AS (SELECT x.node AS node_a, y.node AS node_b,
        |    CAST(COUNT(*) AS BIGINT) AS n_match
        |  FROM s2 x JOIN s2 y ON y.lane = x.lane AND y.h = x.h
        |    AND x.node < y.node
        |  GROUP BY 1, 2)
        |SELECT node_a, node_b, n_match, (1000 * n_match) // 8 AS sim_permille
        |FROM pr WHERE n_match >= 5 ORDER BY node_a, node_b""".stripMargin),
    "q_mase" ->
      """WITH daily AS (SELECT event_type AS grp,
        |         epoch_us(ts) // 86400000000 AS day,
        |         CAST(COUNT(*) AS BIGINT) AS c
        |       FROM events GROUP BY 1, 2),
        |l AS (SELECT grp, c,
        |        LAG(c, 1) OVER (PARTITION BY grp ORDER BY day) AS l1,
        |        LAG(c, 7) OVER (PARTITION BY grp ORDER BY day) AS ls
        |      FROM daily),
        |g AS (SELECT grp, CAST(COUNT(l1) AS BIGINT) AS n_1,
        |        CAST(SUM(ABS(c - l1)) AS BIGINT) AS sae_1,
        |        CAST(COUNT(ls) AS BIGINT) AS n_season,
        |        CAST(SUM(ABS(c - ls)) AS BIGINT) AS sae_season
        |      FROM l GROUP BY 1)
        |SELECT grp, n_1, sae_1, n_season, sae_season,
        |  CASE WHEN n_1 > 0 AND n_season > 0 AND sae_1 > 0
        |       THEN (1000000 * sae_season * n_1) // (sae_1 * n_season)
        |  END AS mase_ppm
        |FROM g ORDER BY grp""".stripMargin,
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
    "q_phash_dedup" ->
      """WITH h AS (SELECT doc_id AS id,
        |         ('0x' || substr(md5(text), 1, 15))::BIGINT AS h
        |       FROM documents),
        |b AS (SELECT id, h, k, (h >> (15 * CAST(k AS INT))) & 32767 AS bv
        |      FROM h, UNNEST([0, 1, 2, 3]) AS t(k)),
        |c AS (SELECT DISTINCT a.id AS id_a, bb.id AS id_b,
        |        a.h AS ha, bb.h AS hb
        |      FROM b a JOIN b bb ON bb.k = a.k AND bb.bv = a.bv
        |        AND a.id < bb.id)
        |SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
        |FROM c WHERE bit_count(xor(ha, hb)) <= 20
        |ORDER BY id_a, id_b""".stripMargin,
    "q_robustness" ->
      """WITH RECURSIVE
        |edges AS (SELECT DISTINCT 'P' || CAST(l_partkey AS VARCHAR) AS a,
        |            'S' || CAST(l_suppkey AS VARCHAR) AS b
        |          FROM lineitem WHERE l_quantity <= 2),
        |deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM
        |          (SELECT a AS node FROM edges
        |           UNION ALL SELECT b FROM edges) GROUP BY 1),
        |hubs AS (SELECT node FROM deg ORDER BY d DESC, node LIMIT 20),
        |e2 AS (SELECT a, b FROM edges
        |       WHERE a NOT IN (SELECT node FROM hubs)
        |         AND b NOT IN (SELECT node FROM hubs)),
        |sym1 AS (SELECT a, b FROM edges UNION SELECT b AS a, a AS b
        |         FROM edges),
        |nodes1 AS (SELECT DISTINCT a AS node FROM sym1),
        |cc1 AS (SELECT node, node AS lab FROM nodes1
        |        UNION SELECT s.b AS node, c.lab
        |        FROM cc1 c JOIN sym1 s ON c.node = s.a WHERE c.lab < s.b),
        |comp1 AS (SELECT node, MIN(lab) AS component FROM cc1 GROUP BY 1),
        |l1 AS (SELECT CAST(MAX(cnt) AS BIGINT) AS lcc FROM
        |         (SELECT component, COUNT(*) AS cnt FROM comp1 GROUP BY 1)),
        |sym2 AS (SELECT a, b FROM e2 UNION SELECT b AS a, a AS b FROM e2),
        |nodes2 AS (SELECT DISTINCT a AS node FROM sym2),
        |cc2 AS (SELECT node, node AS lab FROM nodes2
        |        UNION SELECT s.b AS node, c.lab
        |        FROM cc2 c JOIN sym2 s ON c.node = s.a WHERE c.lab < s.b),
        |comp2 AS (SELECT node, MIN(lab) AS component FROM cc2 GROUP BY 1),
        |l2 AS (SELECT CAST(MAX(cnt) AS BIGINT) AS lcc FROM
        |         (SELECT component, COUNT(*) AS cnt FROM comp2 GROUP BY 1))
        |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM nodes1) AS n_nodes,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM edges) AS m_edges,
        |  l1.lcc AS lcc,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM nodes2) AS n_nodes_after,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM e2) AS m_edges_after,
        |  COALESCE(l2.lcc, 0) AS lcc_after
        |FROM l1, l2""".stripMargin,
    "q_knn_shapley" ->
      """WITH q AS (SELECT vec_id AS id, list_transform(embedding,
        |         x -> CAST(FLOOR(CAST(x AS DOUBLE) * 10000.0) AS BIGINT))
        |         AS v, label AS lab
        |       FROM embeddings),
        |t AS (SELECT id AS test_id, v AS tv, lab AS tlab FROM q
        |      WHERE id % 25 = 0),
        |r AS (SELECT id AS train_id, v AS rv, lab AS rlab FROM q
        |      WHERE id % 25 <> 0),
        |pairs AS (SELECT test_id, train_id,
        |    (SELECT SUM((tv[i] - rv[i]) * (tv[i] - rv[i]))
        |     FROM UNNEST(range(1, len(tv) + 1)) AS u(i)) AS dist,
        |    CASE WHEN tlab = rlab THEN 1 ELSE 0 END AS eq
        |  FROM t JOIN r ON true),
        |rk AS (SELECT test_id, train_id, eq,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY test_id
        |      ORDER BY dist, train_id) AS BIGINT) AS j,
        |    CAST(COUNT(*) OVER (PARTITION BY test_id) AS BIGINT) AS n
        |  FROM pairs),
        |d AS (SELECT test_id, train_id, eq, j, n,
        |    LEAD(eq) OVER (PARTITION BY test_id ORDER BY j) AS eq_next
        |  FROM rk),
        |s AS (SELECT test_id, train_id, j,
        |    CASE WHEN j = n THEN (1000000 * eq) // n
        |         WHEN eq >= eq_next
        |         THEN (1000000 * (eq - eq_next)) // GREATEST(5, j)
        |         ELSE 0 - ((1000000 * (eq_next - eq)) // GREATEST(5, j))
        |    END AS delta
        |  FROM d),
        |suf AS (SELECT test_id, train_id,
        |    CAST(SUM(delta) OVER (PARTITION BY test_id ORDER BY j DESC
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS shap_ppm
        |  FROM s)
        |SELECT train_id, CAST(COUNT(*) AS BIGINT) AS n_tests,
        |  CAST(SUM(shap_ppm) AS BIGINT) AS shap_sum_ppm
        |FROM suf GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_label_noise_class" ->
      """WITH q AS (SELECT vec_id AS id, list_transform(embedding,
        |         x -> CAST(FLOOR(CAST(x AS DOUBLE) * 10000.0) AS BIGINT))
        |         AS v, CAST(label AS BIGINT) AS lab
        |       FROM embeddings),
        |p AS (SELECT id AS probe_id, v AS pv, lab AS plab FROM q
        |      WHERE id % 4 = 0),
        |pairs AS (SELECT probe_id, plab, train_id,
        |    (SELECT SUM((pv[i] - rv[i]) * (pv[i] - rv[i]))
        |     FROM UNNEST(range(1, len(pv) + 1)) AS u(i)) AS dist,
        |    CASE WHEN plab = rlab THEN 1 ELSE 0 END AS eq
        |  FROM p JOIN (SELECT id AS train_id, v AS rv, lab AS rlab FROM q) r
        |    ON probe_id <> train_id),
        |rk AS (SELECT probe_id, plab, eq,
        |    ROW_NUMBER() OVER (PARTITION BY probe_id
        |      ORDER BY dist, train_id) AS rn
        |  FROM pairs),
        |agg AS (SELECT probe_id, plab,
        |    CAST(SUM(eq) AS BIGINT) AS eq_k,
        |    CAST(COUNT(*) AS BIGINT) AS k_eff
        |  FROM rk WHERE rn <= 5 GROUP BY 1, 2)
        |SELECT plab AS label, CAST(COUNT(*) AS BIGINT) AS n_probes,
        |  CAST(SUM(CASE WHEN eq_k * 2 < k_eff THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_flagged,
        |  (1000 * CAST(SUM(CASE WHEN eq_k * 2 < k_eff THEN 1 ELSE 0 END)
        |     AS BIGINT)) // CAST(COUNT(*) AS BIGINT) AS flag_permille,
        |  (1000000 * CAST(SUM(eq_k) AS BIGINT))
        |     // CAST(SUM(k_eff) AS BIGINT) AS agree_ppm
        |FROM agg GROUP BY 1 ORDER BY label""".stripMargin,
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
    "q_homophily" ->
      """WITH rows0 AS (SELECT l_orderkey AS tid,
        |         'P' || CAST(l_partkey AS VARCHAR) AS item
        |       FROM lineitem WHERE l_quantity <= 15),
        |txok AS (SELECT tid FROM rows0 GROUP BY tid HAVING COUNT(*) <= 8),
        |r AS (SELECT rows0.tid, rows0.item FROM rows0 JOIN txok USING (tid)),
        |e0 AS (SELECT DISTINCT a.item AS x, b.item AS y
        |       FROM r a JOIN r b ON a.tid = b.tid AND a.item < b.item),
        |lab AS (SELECT 'P' || CAST(p_partkey AS VARCHAR) AS n,
        |          p_brand AS l FROM part),
        |le AS (SELECT la.l AS lx, lb.l AS ly
        |       FROM e0 JOIN lab la ON la.n = e0.x JOIN lab lb ON lb.n = e0.y),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS m_edges,
        |          CAST(SUM(CASE WHEN lx = ly THEN 1 ELSE 0 END) AS BIGINT)
        |            AS e_same
        |        FROM le),
        |dl AS (SELECT l, CAST(COUNT(*) AS BIGINT) AS d FROM
        |         (SELECT lx AS l FROM le UNION ALL SELECT ly FROM le)
        |       GROUP BY 1),
        |s2 AS (SELECT CAST(SUM(d * d) AS BIGINT) AS sum_dl2 FROM dl)
        |SELECT m_edges, e_same, sum_dl2,
        |  CASE WHEN 4 * m_edges * m_edges = sum_dl2 THEN NULL
        |       WHEN 4 * m_edges * e_same >= sum_dl2
        |       THEN (1000000 * (4 * m_edges * e_same - sum_dl2))
        |            // (4 * m_edges * m_edges - sum_dl2)
        |       ELSE 0 - ((1000000 * (sum_dl2 - 4 * m_edges * e_same))
        |            // (4 * m_edges * m_edges - sum_dl2))
        |  END AS r_ppm
        |FROM tot, s2""".stripMargin,
    "q_triad_census" ->
      """WITH ev AS (SELECT user_id, ts, event_id,
        |         lead(user_id) OVER (PARTITION BY event_type
        |           ORDER BY ts, event_id) AS nxt
        |       FROM events WHERE event_type = 'click' AND value < 2.0),
        |e AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS a,
        |        CAST(nxt AS VARCHAR) AS b
        |      FROM ev WHERE nxt IS NOT NULL AND nxt <> user_id),
        |recip AS (SELECT e.a, e.b FROM e JOIN e r ON r.a = e.b AND r.b = e.a),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS m_edges FROM e),
        |rc AS (SELECT CAST(COUNT(*) AS BIGINT) AS m_reciprocal FROM recip),
        |din AS (SELECT b AS n, CAST(COUNT(*) AS BIGINT) AS din FROM e
        |        GROUP BY 1),
        |dout AS (SELECT a AS n, CAST(COUNT(*) AS BIGINT) AS dout FROM e
        |         GROUP BY 1),
        |rd AS (SELECT a AS n, CAST(COUNT(*) AS BIGINT) AS recip FROM recip
        |       GROUP BY 1),
        |wg AS (SELECT CAST(SUM(din.din * dout.dout - COALESCE(rd.recip, 0))
        |         AS BIGINT) AS n_wedges
        |       FROM din JOIN dout USING (n) LEFT JOIN rd USING (n)),
        |p AS (SELECT e1.a, e1.b, e2.b AS c
        |      FROM e e1 JOIN e e2 ON e2.a = e1.b WHERE e1.a <> e2.b),
        |tr AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_transitive FROM p
        |       WHERE EXISTS (SELECT 1 FROM e
        |                     WHERE e.a = p.a AND e.b = p.c)),
        |cy AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cyclic FROM p
        |       WHERE p.a < p.b AND p.a < p.c
        |         AND EXISTS (SELECT 1 FROM e
        |                     WHERE e.a = p.c AND e.b = p.a))
        |SELECT m_edges, m_reciprocal, n_wedges, n_transitive, n_cyclic
        |FROM tot, rc, wg, tr, cy""".stripMargin,
    "q_record_linkage" ->
      """WITH a AS (SELECT c_custkey AS id_a, c_nationkey AS blk,
        |         CAST(FLOOR(ABS(c_acctbal) * 100) AS BIGINT) % 10 AS f0,
        |         CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS f1,
        |         right(c_name, 2) AS f2
        |       FROM customer),
        |b AS (SELECT s_suppkey AS id_b, s_nationkey AS blk,
        |        CAST(FLOOR(ABS(s_acctbal) * 100) AS BIGINT) % 10 AS g0,
        |        CAST(FLOOR(s_acctbal / 1000.0) AS BIGINT) AS g1,
        |        right(s_name, 2) AS g2
        |      FROM supplier),
        |p AS (SELECT id_a, id_b, CAST(
        |        (CASE WHEN f0 IS NOT NULL AND g0 IS NOT NULL AND f0 = g0
        |              THEN 18 ELSE -2 END)
        |      + (CASE WHEN f1 IS NOT NULL AND g1 IS NOT NULL AND f1 = g1
        |              THEN 15 ELSE -3 END)
        |      + (CASE WHEN f2 IS NOT NULL AND g2 IS NOT NULL AND f2 = g2
        |              THEN 25 ELSE -1 END) AS BIGINT) AS score_db
        |      FROM a JOIN b ON b.blk = a.blk)
        |SELECT id_a, id_b, score_db,
        |  CASE WHEN score_db >= 40 THEN 'link' ELSE 'possible' END AS klass
        |FROM p WHERE score_db >= 20 ORDER BY id_a, id_b""".stripMargin,
    "q_page_hinkley" ->
      """WITH ev AS (SELECT event_type AS key, epoch_us(ts) AS ts_us,
        |         epoch_us(ts) // 86400000000 AS day FROM events),
        |md AS (SELECT MIN(day) AS min_day FROM ev),
        |base AS (SELECT key,
        |           (1000000 * CAST(COUNT(*) AS BIGINT))
        |             // CAST(COUNT(DISTINCT day) AS BIGINT) AS mu_ppm
        |         FROM ev, md WHERE day < min_day + 3 GROUP BY 1),
        |counts AS (SELECT key, ts_us - ts_us % 86400000000 AS window_start_us,
        |             CAST(COUNT(*) AS BIGINT) AS n
        |           FROM ev, md WHERE day >= min_day + 3 GROUP BY 1, 2),
        |j AS (SELECT c.key, c.window_start_us, c.n,
        |        c.n * 1000000 - b.mu_ppm AS dev
        |      FROM counts c JOIN base b ON b.key = c.key),
        |x AS (SELECT key, window_start_us, n,
        |        CAST(SUM(dev) OVER wk AS BIGINT) AS s_ppm
        |      FROM j WINDOW wk AS (PARTITION BY key ORDER BY window_start_us
        |        ROWS UNBOUNDED PRECEDING)),
        |y AS (SELECT key, window_start_us, n, s_ppm,
        |        s_ppm - CAST(MIN(s_ppm) OVER wk AS BIGINT) AS drift_up_ppm,
        |        CAST(MAX(s_ppm) OVER wk AS BIGINT) - s_ppm AS drift_down_ppm
        |      FROM x WINDOW wk AS (PARTITION BY key ORDER BY window_start_us
        |        ROWS UNBOUNDED PRECEDING))
        |SELECT y.key, window_start_us, n, s_ppm, drift_up_ppm, drift_down_ppm,
        |  GREATEST(drift_up_ppm, drift_down_ppm) * 10 > 15 * b.mu_ppm AS alarm
        |FROM y JOIN base b ON b.key = y.key ORDER BY y.key, window_start_us""".stripMargin,
    "q_dbscan_grid" ->
      """WITH RECURSIVE
        |pts AS (SELECT vec_id AS id,
        |          CAST(FLOOR(CAST(embedding[1] AS DOUBLE) / 0.125) AS BIGINT)
        |            AS cell_x,
        |          CAST(FLOOR(CAST(embedding[2] AS DOUBLE) / 0.125) AS BIGINT)
        |            AS cell_y
        |        FROM embeddings
        |        WHERE embedding[1] IS NOT NULL AND embedding[2] IS NOT NULL),
        |cells AS (SELECT cell_x, cell_y, CAST(COUNT(*) AS BIGINT) AS n
        |          FROM pts GROUP BY 1, 2),
        |core AS (SELECT cell_x, cell_y,
        |           CAST(cell_x AS VARCHAR) || ':' || CAST(cell_y AS VARCHAR)
        |             AS node
        |         FROM cells WHERE n >= 10),
        |off AS (SELECT dx, dy FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),
        |          (0,0),(0,1),(1,-1),(1,0),(1,1)) t(dx, dy)),
        |sym AS (SELECT a.node AS a, b.node AS b
        |        FROM core a JOIN off ON true
        |          JOIN core b ON b.cell_x = a.cell_x + off.dx
        |                     AND b.cell_y = a.cell_y + off.dy),
        |cc AS (SELECT node, node AS lab
        |         FROM (SELECT DISTINCT a AS node FROM sym)
        |       UNION
        |       SELECT s.b AS node, c.lab
        |       FROM cc c JOIN sym s ON c.node = s.a
        |       WHERE c.lab < s.b),
        |comp AS (SELECT node, MIN(lab) AS component FROM cc GROUP BY 1),
        |coreclu AS (SELECT c.cell_x, c.cell_y, comp.component AS cluster
        |            FROM core c JOIN comp ON comp.node = c.node),
        |borderclu AS (SELECT nc.cell_x, nc.cell_y, MIN(k.cluster) AS cluster
        |              FROM (SELECT cell_x, cell_y FROM cells WHERE n < 10) nc
        |                JOIN off ON true
        |                JOIN coreclu k ON k.cell_x = nc.cell_x + off.dx
        |                              AND k.cell_y = nc.cell_y + off.dy
        |              GROUP BY 1, 2)
        |SELECT p.id, p.cell_x, p.cell_y,
        |  COALESCE(k.cluster, b.cluster) AS cluster,
        |  CASE WHEN k.cluster IS NOT NULL THEN 'core'
        |       WHEN b.cluster IS NOT NULL THEN 'border'
        |       ELSE 'noise' END AS kind
        |FROM pts p
        |  LEFT JOIN coreclu k ON k.cell_x = p.cell_x AND k.cell_y = p.cell_y
        |  LEFT JOIN borderclu b ON b.cell_x = p.cell_x AND b.cell_y = p.cell_y
        |ORDER BY p.id""".stripMargin,
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
        |ORDER BY d.digit""".stripMargin,
    "q_burstiness" ->
      """WITH daily AS (SELECT event_type AS grp,
        |         epoch_us(ts) // 86400000000 AS day,
        |         CAST(COUNT(*) AS BIGINT) AS c
        |       FROM events GROUP BY 1, 2),
        |g AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_days,
        |        CAST(SUM(c) AS BIGINT) AS total,
        |        CAST(SUM(c * c) AS BIGINT) AS sum_sq
        |      FROM daily GROUP BY 1)
        |SELECT grp, n_days, total, sum_sq,
        |  CASE WHEN total > 0
        |       THEN (1000000 * (n_days * sum_sq - total * total))
        |            // (n_days * total) END AS fano_ppm
        |FROM g ORDER BY grp""".stripMargin,
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
        |FROM f ORDER BY c_nationkey""".stripMargin
  )

  /** Shared unrolled-CTE prefix of the q_kmeans / q_semdedup oracles:
    * ×10000 floor-quantized vectors, smallest-id seeding, `iters`
    * assign+update Lloyd rounds, final assignment `a_f`. Mirrors
    * [[graft.ops.KMeansEmbed.fit]] step for step — integer squared
    * distances, (dist, cluster) argmin ties, floorDiv centroid updates
    * via the pmod identity (the numerator is exactly divisible, so
    * DuckDB's integer `//` equals Math.floorDiv). */
  private val kmeansDistSql =
    "(SELECT SUM((q.v[i]-c.v[i])*(q.v[i]-c.v[i])) " +
      "FROM UNNEST(range(1, len(q.v)+1)) AS t(i))"

  private def kmeansAssignCte(name: String, cPrev: String) =
    s"""$name AS (SELECT vec_id, cluster, dist FROM (
       |  SELECT q.vec_id, c.cluster, $kmeansDistSql AS dist,
       |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |      ORDER BY $kmeansDistSql ASC, c.cluster ASC) AS rk
       |  FROM q CROSS JOIN $cPrev c) WHERE rk = 1)""".stripMargin

  private def kmeansUpdateCte(name: String, a: String) =
    s"""$name AS (SELECT cluster, list(comp ORDER BY pos) AS v FROM (
       |  SELECT $a.cluster, t.i AS pos,
       |    (SUM(q.v[t.i]) - (((SUM(q.v[t.i]) % COUNT(*)) + COUNT(*)) % COUNT(*)))
       |      // COUNT(*) AS comp
       |  FROM $a JOIN q USING (vec_id), UNNEST(range(1, len(q.v)+1)) AS t(i)
       |  GROUP BY $a.cluster, t.i) GROUP BY cluster)""".stripMargin

  private val kmeansQCte =
    """q AS (SELECT vec_id, list_transform(embedding,
      |    x -> CAST(FLOOR(CAST(x AS DOUBLE) * CAST(10000.0 AS DOUBLE)) AS BIGINT)) AS v
      |  FROM embeddings)""".stripMargin

  private def kmeansRoundsSql(iters: Int): String =
    ((1 to iters).map { i =>
      kmeansAssignCte(s"a$i", s"c${i - 1}") + ",\n" +
        kmeansUpdateCte(s"c$i", s"a$i")
    } :+ kmeansAssignCte("a_f", s"c$iters")).mkString(",\n")

  private def kmeansCtes(iters: Int, k: Int = 8): String =
    s"""WITH $kmeansQCte,
       |c0 AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cluster, v
       |  FROM (SELECT vec_id, v FROM q ORDER BY vec_id LIMIT $k)),
       |${kmeansRoundsSql(iters)}""".stripMargin

  /** FPS-seeded variant: c0 built by k-1 farthest-point selection CTEs
    * (argmax of min squared distance to the chosen set, ties -> min id),
    * mirroring [[graft.ops.KMeansEmbed]]'s `farthestPoint = true`. */
  private def kmeansFpsCtes(iters: Int, k: Int): String = {
    val sel = (2 to k).map { j =>
      s"""m${j - 1} AS (SELECT q.vec_id, MIN($kmeansDistSql) AS md
         |  FROM q CROSS JOIN ch${j - 1} c GROUP BY q.vec_id),
         |s$j AS (SELECT ${j - 1} AS cluster, v FROM q
         |  WHERE vec_id = (SELECT vec_id FROM m${j - 1}
         |                  ORDER BY md DESC, vec_id ASC LIMIT 1)),
         |ch$j AS (SELECT * FROM ch${j - 1} UNION ALL SELECT * FROM s$j)""".stripMargin
    }.mkString(",\n")
    s"""WITH $kmeansQCte,
       |ch1 AS (SELECT 0 AS cluster, v
       |  FROM (SELECT v FROM q ORDER BY vec_id LIMIT 1)),
       |$sel,
       |c0 AS (SELECT CAST(cluster AS INT) AS cluster, v FROM ch$k),
       |${kmeansRoundsSql(iters)}""".stripMargin
  }

  /** Per-column profiling oracle over `orders`: one UNION ALL block per
    * column mirroring Profiler.profile — null counts, string min/max, and
    * the HLL register dot-product digest (same md5-lane + trailing-zero
    * rho SQL as q_hll_distinct, p=6; empty registers contribute 0 so
    * summing only materialized registers equals the full-array sum). */
  private def profileOracle(cols: Seq[String]): String = {
    val blocks = cols.map { c =>
      s"""SELECT '$c' AS col_name,
         |       COUNT(*) AS n_rows,
         |       CAST(COUNT(*) - COUNT($c) AS BIGINT) AS n_nulls,
         |       MIN(CAST($c AS VARCHAR)) AS min_str,
         |       MAX(CAST($c AS VARCHAR)) AS max_str,
         |       (WITH h AS (SELECT ('0x' || substr(md5(CAST($c AS VARCHAR)), 1, 15))::BIGINT AS h
         |                   FROM orders WHERE $c IS NOT NULL),
         |        r AS (SELECT CAST(h % 64 AS INT) AS idx,
         |                     CASE WHEN h >> 6 = 0 THEN 55
         |                          ELSE bit_count(((h >> 6) & -(h >> 6)) - 1) + 1 END AS rho
         |              FROM h),
         |        regs AS (SELECT idx, MAX(rho) AS reg FROM r GROUP BY idx)
         |        SELECT CAST(COALESCE(SUM(reg * (idx + 1)), 0) AS BIGINT) FROM regs)
         |         AS distinct_digest
         |FROM orders""".stripMargin
    }
    blocks.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  /** Unrolled k-core peeling oracle over the same co-order part graph as
    * q_triangles: one (degree, keep, edges) CTE triple per round mirrors
    * KCore.kCore's synchronized peel exactly — both engines compute the
    * identical `iters`-round partial fixpoint (fixed rounds, the same
    * parity trick as [[pagerankFpOracle]]). */
  private def kcoreOracle(k: Int, iters: Int): String = {
    // MATERIALIZED is load-bearing: each round references the previous
    // round's edge set three times, so DuckDB's default CTE inlining would
    // re-expand round 8 into ~3^8 copies of the lineitem scan (observed as
    // fd exhaustion). Materialization changes execution only, not values.
    val head =
      """WITH rows0 AS (SELECT l_orderkey AS tid, 'P' || CAST(l_partkey AS VARCHAR) AS item
        |               FROM lineitem WHERE l_quantity <= 15),
        |txok AS (SELECT tid FROM rows0 GROUP BY tid HAVING COUNT(*) <= 8),
        |r AS (SELECT rows0.tid, rows0.item FROM rows0 JOIN txok USING (tid)),
        |e0 AS MATERIALIZED (SELECT DISTINCT a.item AS x, b.item AS y
        |       FROM r a JOIN r b ON a.tid = b.tid AND a.item < b.item)""".stripMargin
    val steps = (1 to iters).map { i =>
      s"""d$i AS MATERIALIZED (SELECT node, COUNT(*) AS deg
         |        FROM (SELECT x AS node FROM e${i - 1}
         |              UNION ALL SELECT y FROM e${i - 1})
         |        GROUP BY node),
         |k$i AS MATERIALIZED (SELECT node FROM d$i WHERE deg >= $k),
         |e$i AS MATERIALIZED (SELECT e.x, e.y FROM e${i - 1} e
         |        JOIN k$i kx ON e.x = kx.node
         |        JOIN k$i ky ON e.y = ky.node)""".stripMargin
    }.mkString(",\n")
    s"""$head,
       |$steps
       |SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
       |FROM (SELECT x AS node FROM e$iters UNION ALL SELECT y FROM e$iters)
       |GROUP BY node ORDER BY node""".stripMargin
  }

  /** Unrolled synchronous label-propagation oracle over the same co-order
    * part graph as kcoreOracle: per round, neighbor-label counts then the
    * (count DESC, label ASC) winner per node — exactly
    * ops.Communities.labelPropagation's min-struct aggregate. MATERIALIZED
    * per round for the usual CTE-inlining reason.
    */
  /** The LPA CTE chain (co-order graph, `rounds` synchronous updates) as a
    * reusable body — q_communities reads the final labels, q_modularity
    * appends the partition-quality tail over the same l{rounds} table. */
  private def lpaCtes(rounds: Int): String = {
    val head =
      """WITH rows0 AS (SELECT l_orderkey AS tid, 'P' || CAST(l_partkey AS VARCHAR) AS item
        |               FROM lineitem WHERE l_quantity <= 15),
        |txok AS (SELECT tid FROM rows0 GROUP BY tid HAVING COUNT(*) <= 8),
        |r AS (SELECT rows0.tid, rows0.item FROM rows0 JOIN txok USING (tid)),
        |e0 AS MATERIALIZED (SELECT DISTINCT a.item AS x, b.item AS y
        |       FROM r a JOIN r b ON a.tid = b.tid AND a.item < b.item),
        |se AS MATERIALIZED (SELECT x AS a, y AS b FROM e0
        |       UNION ALL SELECT y AS a, x AS b FROM e0),
        |l0 AS MATERIALIZED (SELECT DISTINCT a AS node, a AS lab FROM se)""".stripMargin
    val steps = (1 to rounds).map { i =>
      s"""c$i AS MATERIALIZED (SELECT s.a, l.lab, COUNT(*) AS c
         |        FROM se s JOIN l${i - 1} l ON l.node = s.b
         |        GROUP BY s.a, l.lab),
         |l$i AS MATERIALIZED (SELECT a AS node, lab FROM (
         |        SELECT a, lab,
         |               ROW_NUMBER() OVER (PARTITION BY a ORDER BY c DESC, lab ASC) AS rn
         |        FROM c$i) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"$head,\n$steps"
  }

  private def lpaOracle(rounds: Int): String =
    s"""${lpaCtes(rounds)}
       |SELECT node, lab AS community FROM l$rounds ORDER BY node""".stripMargin

  /** Unrolled h-index coreness oracle over the co-order graph: c0 =
    * degree, then `rounds` rounds of c(v) = h-index of neighbor values,
    * h-index in SQL as MAX(LEAST(rank-desc, value)) — tie order in the
    * ROW_NUMBER is irrelevant (the multiset fixes the h-index). Mirrors
    * ops.Coreness.hIndexRounds round for round. */
  private def corenessOracle(rounds: Int): String = {
    val head =
      """WITH rows0 AS (SELECT l_orderkey AS tid, 'P' || CAST(l_partkey AS VARCHAR) AS item
        |               FROM lineitem WHERE l_quantity <= 15),
        |txok AS (SELECT tid FROM rows0 GROUP BY tid HAVING COUNT(*) <= 8),
        |r AS (SELECT rows0.tid, rows0.item FROM rows0 JOIN txok USING (tid)),
        |e0 AS MATERIALIZED (SELECT DISTINCT a.item AS x, b.item AS y
        |       FROM r a JOIN r b ON a.tid = b.tid AND a.item < b.item),
        |se AS MATERIALIZED (SELECT x AS a, y AS b FROM e0
        |       UNION ALL SELECT y AS a, x AS b FROM e0),
        |c0 AS MATERIALIZED (SELECT a AS node, CAST(COUNT(*) AS BIGINT) AS core
        |       FROM se GROUP BY a)""".stripMargin
    val steps = (1 to rounds).map { i =>
      s"""nv$i AS (SELECT s.a AS node, c.core AS nc
         |        FROM se s JOIN c${i - 1} c ON c.node = s.b),
         |rk$i AS (SELECT node, nc,
         |          ROW_NUMBER() OVER (PARTITION BY node ORDER BY nc DESC) AS rn
         |        FROM nv$i),
         |c$i AS MATERIALIZED (SELECT node, CAST(MAX(LEAST(rn, nc)) AS BIGINT) AS core
         |        FROM rk$i GROUP BY node)""".stripMargin
    }.mkString(",\n")
    s"$head,\n$steps\nSELECT node, core FROM c$rounds ORDER BY node"
  }

  /** Unrolled multi-round Louvain oracle: LPA-4 init (ml0 = l4), then
    * `moveRounds` copies of the q_louvain_move CTE block chained
    * ml0 → ml1 → … — each round's dcc/evc/cand/score tables read the
    * PREVIOUS round's labels; graph-static tables (adjv, m, degv) are
    * shared. Mirrors ops.Communities.louvain round for round. */
  private def louvainOracle(moveRounds: Int): String = {
    val head =
      s"""${lpaCtes(4)},
         |adjv AS MATERIALIZED (SELECT x AS v, y AS n FROM e0
         |        UNION ALL SELECT y AS v, x AS n FROM e0),
         |mm AS (SELECT COUNT(*) AS m FROM e0),
         |degv AS MATERIALIZED (SELECT v, COUNT(*) AS d FROM adjv GROUP BY v),
         |ml0 AS (SELECT node, lab AS community FROM l4)""".stripMargin
    val steps = (1 to moveRounds).map { i =>
      val p = s"ml${i - 1}"
      s"""dcc$i AS (SELECT community, CAST(SUM(d) AS BIGINT) AS d_c
         |        FROM degv JOIN $p ON degv.v = $p.node GROUP BY community),
         |evc$i AS (SELECT adjv.v, $p.community AS c, COUNT(*) AS e_vc
         |        FROM adjv JOIN $p ON $p.node = adjv.n GROUP BY 1, 2),
         |ownc$i AS (SELECT node AS v, community AS c, 0 AS e_vc FROM $p),
         |candc$i AS (SELECT v, c, CAST(MAX(e_vc) AS BIGINT) AS e_vc FROM (
         |            SELECT * FROM evc$i UNION ALL SELECT * FROM ownc$i)
         |          GROUP BY v, c),
         |sc$i AS (SELECT candc$i.v, candc$i.c,
         |         4 * mm.m * candc$i.e_vc
         |           - 2 * degv.d * (dcc$i.d_c -
         |               CASE WHEN candc$i.c = $p.community THEN degv.d ELSE 0 END) AS score
         |       FROM candc$i CROSS JOIN mm
         |       JOIN $p ON $p.node = candc$i.v
         |       JOIN degv ON degv.v = candc$i.v
         |       JOIN dcc$i ON dcc$i.community = candc$i.c),
         |ml$i AS MATERIALIZED (SELECT v AS node, c AS community FROM (
         |         SELECT v, c,
         |                ROW_NUMBER() OVER (PARTITION BY v ORDER BY score DESC, c ASC) AS rn
         |         FROM sc$i) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"$head,\n$steps\nSELECT node, community FROM ml$moveRounds ORDER BY node"
  }

  /** Unrolled multi-LEVEL Louvain oracle (VERDICT r8 item 5): the
    * [[louvainOracle]] CTE chain up to ml{moveRounds}, then the
    * contraction (community-pair groupBy → weighted super-edges), ONE
    * weighted move round on the contracted graph (the q_louvain_weighted
    * CTE shape with identity init), the projection back, and the guarded
    * acceptance — both partitions' exact integer modularities
    * Q·4m² = 4m·intra − Σ d_c² on the ORIGINAL graph decide which one is
    * emitted. Mirrors ops.Communities.louvainHier stage for stage. */
  private def louvainHierOracle(moveRounds: Int): String = {
    val head =
      s"""${lpaCtes(4)},
         |adjv AS MATERIALIZED (SELECT x AS v, y AS n FROM e0
         |        UNION ALL SELECT y AS v, x AS n FROM e0),
         |mm AS (SELECT COUNT(*) AS m FROM e0),
         |degv AS MATERIALIZED (SELECT v, COUNT(*) AS d FROM adjv GROUP BY v),
         |ml0 AS (SELECT node, lab AS community FROM l4)""".stripMargin
    val steps = (1 to moveRounds).map { i =>
      val p = s"ml${i - 1}"
      s"""dcc$i AS (SELECT community, CAST(SUM(d) AS BIGINT) AS d_c
         |        FROM degv JOIN $p ON degv.v = $p.node GROUP BY community),
         |evc$i AS (SELECT adjv.v, $p.community AS c, COUNT(*) AS e_vc
         |        FROM adjv JOIN $p ON $p.node = adjv.n GROUP BY 1, 2),
         |ownc$i AS (SELECT node AS v, community AS c, 0 AS e_vc FROM $p),
         |candc$i AS (SELECT v, c, CAST(MAX(e_vc) AS BIGINT) AS e_vc FROM (
         |            SELECT * FROM evc$i UNION ALL SELECT * FROM ownc$i)
         |          GROUP BY v, c),
         |sc$i AS (SELECT candc$i.v, candc$i.c,
         |         4 * mm.m * candc$i.e_vc
         |           - 2 * degv.d * (dcc$i.d_c -
         |               CASE WHEN candc$i.c = $p.community THEN degv.d ELSE 0 END) AS score
         |       FROM candc$i CROSS JOIN mm
         |       JOIN $p ON $p.node = candc$i.v
         |       JOIN degv ON degv.v = candc$i.v
         |       JOIN dcc$i ON dcc$i.community = candc$i.c),
         |ml$i AS MATERIALIZED (SELECT v AS node, c AS community FROM (
         |         SELECT v, c,
         |                ROW_NUMBER() OVER (PARTITION BY v ORDER BY score DESC, c ASC) AS rn
         |         FROM sc$i) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    val last = s"ml$moveRounds"
    val hier =
      s"""ce AS MATERIALIZED (SELECT LEAST(a.community, b.community) AS sx,
         |        GREATEST(a.community, b.community) AS sy,
         |        CAST(COUNT(*) AS BIGINT) AS w
         |      FROM e0 JOIN $last a ON a.node = e0.x
         |      JOIN $last b ON b.node = e0.y
         |      WHERE a.community <> b.community GROUP BY 1, 2),
         |sadj AS (SELECT sx AS v, sy AS n, w FROM ce
         |      UNION ALL SELECT sy AS v, sx AS n, w FROM ce),
         |sww AS (SELECT CAST(SUM(w) AS BIGINT) AS wsum FROM ce),
         |sstr AS (SELECT v, CAST(SUM(w) AS BIGINT) AS s FROM sadj GROUP BY v),
         |sl0 AS (SELECT DISTINCT community AS node, community FROM $last),
         |sscc AS (SELECT sl0.community, CAST(SUM(sstr.s) AS BIGINT) AS s_c
         |      FROM sstr JOIN sl0 ON sstr.v = sl0.node GROUP BY sl0.community),
         |swvc AS (SELECT sadj.v, sl0.community AS c,
         |        CAST(SUM(sadj.w) AS BIGINT) AS w_vc
         |      FROM sadj JOIN sl0 ON sl0.node = sadj.n GROUP BY 1, 2),
         |sown AS (SELECT node AS v, community AS c, 0 AS w_vc FROM sl0),
         |scand AS (SELECT v, c, CAST(MAX(w_vc) AS BIGINT) AS w_vc FROM (
         |        SELECT * FROM swvc UNION ALL SELECT * FROM sown)
         |      GROUP BY v, c),
         |sscw AS (SELECT scand.v, scand.c,
         |        4 * sww.wsum * scand.w_vc
         |          - 2 * sstr.s * (sscc.s_c -
         |              CASE WHEN scand.c = sl0.community THEN sstr.s ELSE 0 END) AS score
         |      FROM scand CROSS JOIN sww
         |      JOIN sl0 ON sl0.node = scand.v
         |      JOIN sstr ON sstr.v = scand.v
         |      JOIN sscc ON sscc.community = scand.c),
         |sml1 AS MATERIALIZED (SELECT v AS node, c AS community FROM (
         |        SELECT v, c,
         |               ROW_NUMBER() OVER (PARTITION BY v ORDER BY score DESC, c ASC) AS rn
         |        FROM sscw) WHERE rn = 1),
         |proj AS MATERIALIZED (SELECT $last.node,
         |        COALESCE(sml1.community, $last.community) AS community
         |      FROM $last LEFT JOIN sml1 ON sml1.node = $last.community),
         |qi1 AS (SELECT CAST(SUM(CASE WHEN a.community = b.community
         |                    THEN 1 ELSE 0 END) AS BIGINT) AS intra
         |      FROM e0 JOIN proj a ON a.node = e0.x
         |      JOIN proj b ON b.node = e0.y),
         |qd1 AS (SELECT CAST(SUM(dc * dc) AS BIGINT) AS sumdc2 FROM (
         |        SELECT CAST(SUM(degv.d) AS BIGINT) AS dc
         |        FROM degv JOIN proj ON proj.node = degv.v
         |        GROUP BY proj.community)),
         |qi0 AS (SELECT CAST(SUM(CASE WHEN a.community = b.community
         |                    THEN 1 ELSE 0 END) AS BIGINT) AS intra
         |      FROM e0 JOIN $last a ON a.node = e0.x
         |      JOIN $last b ON b.node = e0.y),
         |qd0 AS (SELECT CAST(SUM(dc * dc) AS BIGINT) AS sumdc2 FROM (
         |        SELECT CAST(SUM(degv.d) AS BIGINT) AS dc
         |        FROM degv JOIN $last ON $last.node = degv.v
         |        GROUP BY $last.community)),
         |sel AS (SELECT
         |        (SELECT 4 * mm.m * qi1.intra - qd1.sumdc2 FROM mm, qi1, qd1)
         |     >= (SELECT 4 * mm.m * qi0.intra - qd0.sumdc2 FROM mm, qi0, qd0)
         |        AS take1)
         |SELECT node, community FROM proj WHERE (SELECT take1 FROM sel)
         |UNION ALL
         |SELECT node, community FROM $last WHERE NOT (SELECT take1 FROM sel)
         |ORDER BY node""".stripMargin
    s"$head,\n$steps,\n$hier"
  }

  /** Unrolled seeded label-spreading oracle over the co-order graph:
    * like [[lpaCtes]] but labels start ONLY on the md5-sampled seed set
    * and seeds are clamped each round (non-seeds adopt the neighbor
    * majority, ties to the smallest label) — mirrors
    * ops.Communities.labelSpreading round for round. */
  private def labelSpreadOracle(rounds: Int, ratePermille: Int,
      salt: String): String = {
    val head =
      s"""WITH rows0 AS (SELECT l_orderkey AS tid, 'P' || CAST(l_partkey AS VARCHAR) AS item
         |               FROM lineitem WHERE l_quantity <= 15),
         |txok AS (SELECT tid FROM rows0 GROUP BY tid HAVING COUNT(*) <= 8),
         |r AS (SELECT rows0.tid, rows0.item FROM rows0 JOIN txok USING (tid)),
         |e0 AS MATERIALIZED (SELECT DISTINCT a.item AS x, b.item AS y
         |       FROM r a JOIN r b ON a.tid = b.tid AND a.item < b.item),
         |se AS MATERIALIZED (SELECT x AS a, y AS b FROM e0
         |       UNION ALL SELECT y AS a, x AS b FROM e0),
         |s0 AS MATERIALIZED (SELECT DISTINCT a AS node, a AS lab FROM se
         |       WHERE ('0x' || substr(md5('$salt' || a), 1, 15))::BIGINT
         |             % 1000 < $ratePermille),
         |l0 AS MATERIALIZED (SELECT node, lab FROM s0)""".stripMargin
    val steps = (1 to rounds).map { i =>
      s"""c$i AS MATERIALIZED (SELECT s.a, l.lab, COUNT(*) AS c
         |        FROM se s JOIN l${i - 1} l ON l.node = s.b
         |        GROUP BY s.a, l.lab),
         |m$i AS MATERIALIZED (SELECT a AS node, lab FROM (
         |        SELECT a, lab,
         |               ROW_NUMBER() OVER (PARTITION BY a ORDER BY c DESC, lab ASC) AS rn
         |        FROM c$i) WHERE rn = 1),
         |l$i AS MATERIALIZED (SELECT node, lab FROM s0
         |        UNION ALL
         |        SELECT node, lab FROM m$i
         |        WHERE node NOT IN (SELECT node FROM s0))""".stripMargin
    }.mkString(",\n")
    s"""$head,
       |$steps
       |SELECT node, lab AS label FROM l$rounds ORDER BY node""".stripMargin
  }

  /** Unrolled radius-R multi-source BFS oracle for truncated harmonic
    * centrality over the same co-order part graph: per round, the
    * frontier (rows at distance i-1) expands across the symmetric edge
    * list and distances merge by MIN — exactly
    * ops.Harmonic.harmonicCentrality's union+min aggregate. Sources are
    * the md5 per-mille sample (q_sample identity-hash pattern); the
    * harmonic sum uses lcm(1..rounds)/d integer terms. MATERIALIZED per
    * round for the usual CTE-inlining reason.
    */
  private def harmonicOracle(rounds: Int, ratePermille: Int,
      salt: String): String = {
    val scale = (1 to rounds).map(BigInt(_)).foldLeft(BigInt(1)) {
      (acc, d) => acc * d / acc.gcd(d)
    }
    val head =
      s"""WITH rows0 AS (SELECT l_orderkey AS tid, 'P' || CAST(l_partkey AS VARCHAR) AS item
         |               FROM lineitem WHERE l_quantity <= 15),
         |txok AS (SELECT tid FROM rows0 GROUP BY tid HAVING COUNT(*) <= 8),
         |r AS (SELECT rows0.tid, rows0.item FROM rows0 JOIN txok USING (tid)),
         |e0 AS MATERIALIZED (SELECT DISTINCT a.item AS x, b.item AS y
         |       FROM r a JOIN r b ON a.tid = b.tid AND a.item < b.item),
         |se AS MATERIALIZED (SELECT x AS a, y AS b FROM e0
         |       UNION ALL SELECT y AS a, x AS b FROM e0),
         |src AS MATERIALIZED (SELECT DISTINCT a AS node FROM se
         |       WHERE ('0x' || substr(md5('$salt' || a), 1, 15))::BIGINT
         |             % 1000 < $ratePermille),
         |d0 AS MATERIALIZED (SELECT node AS s, node AS v, 0 AS d FROM src)""".stripMargin
    val steps = (1 to rounds).map { i =>
      s"""d$i AS MATERIALIZED (SELECT s, v, MIN(d) AS d FROM (
         |        SELECT s, v, d FROM d${i - 1}
         |        UNION ALL
         |        SELECT p.s, se.b AS v, p.d + 1 AS d
         |        FROM d${i - 1} p JOIN se ON p.v = se.a
         |        WHERE p.d = ${i - 1}) GROUP BY s, v)""".stripMargin
    }.mkString(",\n")
    s"""$head,
       |$steps
       |SELECT v AS node, CAST(COUNT(*) AS BIGINT) AS n_reached,
       |       CAST(SUM($scale // d) AS BIGINT) AS harmonic_num,
       |       CAST($scale AS BIGINT) AS harmonic_den
       |FROM d$rounds WHERE d > 0 GROUP BY v ORDER BY v""".stripMargin
  }

  /** Unrolled HyperBall oracle over the co-order part graph: base
    * registers are the HLL of each node's own md5 hash (the
    * q_hll_distinct integer register math), and each round max-merges
    * neighbor registers across the symmetric edge list — exactly
    * ops.HyperBall.ballRegisters' join+max aggregate, on the same sparse
    * (node, idx, rho) rows. MATERIALIZED per round as usual.
    */
  /** Percolation-sweep oracle: one filtered edge set + min-label
    * recursive CC per fraction (0 included), summaries unioned. The
    * sym CTEs dedup EXPLICITLY — inside WITH RECURSIVE, DuckDB treats a
    * non-recursive CTE's UNION as UNION ALL (the q_bowtie quirk). */
  private def percolationOracle(fractions: Seq[Int]): String = {
    def block(f: Int): String = {
      val e =
        if (f == 0) s"e_f$f AS (SELECT a, b FROM edges)"
        else
          s"""e_f$f AS (SELECT a, b FROM edges
             | WHERE ('0x' || substr(md5('perc' || a), 1, 13))::BIGINT
             |     % 1000 >= $f
             |   AND ('0x' || substr(md5('perc' || b), 1, 13))::BIGINT
             |     % 1000 >= $f)""".stripMargin
      s"""$e,
         |sym_f$f AS (SELECT DISTINCT a, b FROM (SELECT a, b FROM e_f$f
         |  UNION ALL SELECT b AS a, a AS b FROM e_f$f)),
         |nodes_f$f AS (SELECT DISTINCT a AS node FROM sym_f$f),
         |cc_f$f AS (SELECT node, node AS lab FROM nodes_f$f
         |  UNION SELECT s.b AS node, c.lab
         |  FROM cc_f$f c JOIN sym_f$f s ON c.node = s.a WHERE c.lab < s.b),
         |comp_f$f AS (SELECT node, MIN(lab) AS component FROM cc_f$f
         |  GROUP BY 1),
         |sum_f$f AS (SELECT $f AS f_permille,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM nodes_f$f) AS n_nodes,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM e_f$f) AS m_edges,
         |  (SELECT CAST(COALESCE(MAX(cnt), 0) AS BIGINT) FROM
         |     (SELECT component, COUNT(*) AS cnt FROM comp_f$f GROUP BY 1))
         |    AS lcc)""".stripMargin
    }
    s"""WITH RECURSIVE
       |edges AS (SELECT DISTINCT 'P' || CAST(l_partkey AS VARCHAR) AS a,
       |            'S' || CAST(l_suppkey AS VARCHAR) AS b
       |          FROM lineitem WHERE l_quantity <= 2),
       |${(0 +: fractions.sorted).map(block).mkString(",\n")}
       |${(0 +: fractions.sorted).map(f => s"SELECT * FROM sum_f$f")
        .mkString("\nUNION ALL\n")}
       |ORDER BY f_permille""".stripMargin
  }

  /** Shared CTE chain of the q_node_sketch / q_node_sim oracles: the
    * user-journey graph, 8 md5 lanes per node, two unrolled
    * min-propagation rounds (s1, s2) mirroring ops.NodeSketch.sketches.
    * `finalSelect` either starts with ", cte AS (" to extend the WITH
    * chain or is a plain SELECT. */
  private def nodeSketchOracle(finalSelect: String): String =
    s"""WITH ev AS (SELECT user_id, ts, event_id,
       |         lead(user_id) OVER (PARTITION BY event_type
       |           ORDER BY ts, event_id) AS nxt
       |       FROM events WHERE event_type = 'click' AND value < 2.0),
       |e0 AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS a,
       |         CAST(nxt AS VARCHAR) AS b
       |       FROM ev WHERE nxt IS NOT NULL AND nxt <> user_id),
       |sym AS MATERIALIZED (SELECT a, b FROM e0
       |       UNION SELECT b AS a, a AS b FROM e0),
       |nodes AS (SELECT DISTINCT a AS node FROM sym),
       |s0 AS (SELECT node, k AS lane,
       |        ('0x' || substr(md5('ns' || CAST(k AS VARCHAR) || ':' || node),
       |          1, 15))::BIGINT AS h
       |      FROM nodes, UNNEST(range(0, 8)) AS t(k)),
       |s1 AS MATERIALIZED (SELECT node, lane, MIN(h) AS h FROM (
       |        SELECT s.a AS node, p.lane, p.h
       |        FROM sym s JOIN s0 p ON p.node = s.b
       |        UNION ALL SELECT node, lane, h FROM s0) GROUP BY 1, 2),
       |s2 AS MATERIALIZED (SELECT node, lane, MIN(h) AS h FROM (
       |        SELECT s.a AS node, p.lane, p.h
       |        FROM sym s JOIN s1 p ON p.node = s.b
       |        UNION ALL SELECT node, lane, h FROM s1) GROUP BY 1, 2)
       |$finalSelect""".stripMargin

  private def hyperballOracle(rounds: Int, p: Int, hashBits: Int): String = {
    s"""${hyperballRegisterCtes(rounds, p, hashBits)}
       |SELECT node, CAST(idx AS INT) AS idx, CAST(rho AS INT) AS rho
       |FROM b$rounds ORDER BY node, idx""".stripMargin
  }

  /** Shared register-evolution CTE chain of the q_hyperball /
    * q_eff_diameter oracles: co-order graph, md5-lane base registers,
    * one max-merge CTE per radius (b0..b`rounds`). */
  private def hyperballRegisterCtes(rounds: Int, p: Int,
      hashBits: Int): String = {
    val m = 1 << p
    val wZeroRho = hashBits - p + 1
    val head =
      s"""WITH rows0 AS (SELECT l_orderkey AS tid, 'P' || CAST(l_partkey AS VARCHAR) AS item
         |               FROM lineitem WHERE l_quantity <= 15),
         |txok AS (SELECT tid FROM rows0 GROUP BY tid HAVING COUNT(*) <= 8),
         |r AS (SELECT rows0.tid, rows0.item FROM rows0 JOIN txok USING (tid)),
         |e0 AS MATERIALIZED (SELECT DISTINCT a.item AS x, b.item AS y
         |       FROM r a JOIN r b ON a.tid = b.tid AND a.item < b.item),
         |se AS MATERIALIZED (SELECT x AS a, y AS b FROM e0
         |       UNION ALL SELECT y AS a, x AS b FROM e0),
         |h0 AS (SELECT DISTINCT a AS node,
         |         ('0x' || substr(md5(a), 1, 15))::BIGINT AS h FROM se),
         |b0 AS MATERIALIZED (SELECT node, CAST(h % $m AS INT) AS idx,
         |       CAST(CASE WHEN h >> $p = 0 THEN $wZeroRho
         |            ELSE bit_count(((h >> $p) & -(h >> $p)) - 1) + 1
         |            END AS INT) AS rho
         |       FROM h0)""".stripMargin
    val steps = (1 to rounds).map { i =>
      s"""b$i AS MATERIALIZED (SELECT node, idx, MAX(rho) AS rho FROM (
         |        SELECT node, idx, rho FROM b${i - 1}
         |        UNION ALL
         |        SELECT se.a AS node, b.idx, b.rho
         |        FROM se JOIN b${i - 1} b ON b.node = se.b
         |      ) GROUP BY node, idx)""".stripMargin
    }.mkString(",\n")
    s"""$head,
       |$steps""".stripMargin
  }

  /** Effective-diameter oracle: replays ops.HyperBall.effectiveDiameter
    * over the shared register CTEs — raw-HLL estimate floored to whole
    * nodes per (r, node) via HUGEINT division (the Spark side divides in
    * DECIMAL(38,0); both floor the same non-negative ratio), integer
    * neighborhood-function sums, threshold radius as a MIN. */
  private def effDiameterOracle(rounds: Int, p: Int, hashBits: Int,
      targetPermille: Long): String = {
    val m = 1 << p
    val alphaPpm = m match {
      case 16 => 673000L; case 32 => 697000L; case 64 => 709000L
      case _ => sys.error(s"unsupported p=$p")
    }
    val kBits = hashBits - p + 1
    val pow2K = 1L << kBits
    val num = (BigInt(alphaPpm) * m * m * pow2K).toString
    val slices = (0 to rounds).map(i =>
      s"SELECT $i AS r, node, rho FROM b$i").mkString("\n  UNION ALL ")
    s"""${hyperballRegisterCtes(rounds, p, hashBits)},
       |sl AS ($slices),
       |pn AS (SELECT r, node, CAST(COUNT(*) AS BIGINT) AS nz,
       |         CAST(SUM(CAST(1 AS BIGINT) << ($kBits - rho)) AS BIGINT)
       |           AS s_pow
       |       FROM sl GROUP BY 1, 2),
       |e AS (SELECT r, node,
       |        CAST('$num'::HUGEINT
       |          // ((s_pow + ($m - nz) * $pow2K)::HUGEINT * 1000000)
       |          AS BIGINT) AS est
       |      FROM pn),
       |nf AS (SELECT r, CAST(COUNT(*) AS BIGINT) AS n_nodes,
       |         CAST(SUM(est) AS BIGINT) AS nf_est
       |       FROM e GROUP BY 1),
       |fin AS (SELECT nf_est AS nf_final FROM nf WHERE r = $rounds),
       |rt AS (SELECT r, n_nodes, nf_est,
       |         CASE WHEN nf_final > 0 THEN (1000 * nf_est) // nf_final
       |              ELSE 0 END AS ratio_permille, nf_final
       |       FROM nf, fin),
       |eff AS (SELECT MIN(r) AS eff_diameter FROM rt
       |        WHERE 1000 * nf_est >= $targetPermille * nf_final)
       |SELECT r, n_nodes, nf_est, ratio_permille, eff_diameter
       |FROM rt, eff ORDER BY r""".stripMargin
  }

  /** Unrolled fixed-point PageRank oracle: one CTE per iteration mirrors
    * PageRank.scoresFixedPoint exactly — integer division (`//` ≡ Spark
    * `div` for the all-positive values here), damping 17/20, base
    * (3·scale)//(20·n). Unrolled rather than recursive because the
    * recursive term would need to reference the working table twice
    * (contributions + zero-indegree nodes). All sums cast back to BIGINT
    * (DuckDB SUM(BIGINT) is HUGEINT → float64 in pandas → hash mismatch).
    */
  /** Unrolled integer fixed-point Katz oracle over the user-journey
    * graph — mirrors ops.Katz.centralityFixedPoint iteration for
    * iteration (one truncating division per node per round, applied to
    * the summed in-contribution). */
  private def katzOracle(iters: Int, alphaNum: Long, alphaDen: Long,
      scale: Long): String = {
    val head =
      s"""WITH ev AS (SELECT user_id, ts, event_id,
         |              lead(user_id) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS nxt
         |            FROM events WHERE event_type = 'click' AND value < 2.0),
         |e0 AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS src, CAST(nxt AS VARCHAR) AS dst
         |       FROM ev WHERE nxt IS NOT NULL AND nxt <> user_id),
         |em AS MATERIALIZED (SELECT src, dst, COUNT(*) AS m FROM e0 GROUP BY src, dst),
         |nodes AS (SELECT src AS node FROM em UNION SELECT dst FROM em),
         |k0 AS (SELECT node, CAST($scale AS BIGINT) AS r FROM nodes)""".stripMargin
    val iterCtes = (1 to iters).map { i =>
      s"""k$i AS MATERIALIZED (
         |  SELECT nd.node,
         |         $scale + ($alphaNum * COALESCE(inc.s, 0)) // $alphaDen AS r
         |  FROM nodes nd LEFT JOIN (
         |    SELECT em.dst, CAST(SUM(em.m * p.r) AS BIGINT) AS s
         |    FROM em JOIN k${i - 1} p ON p.node = em.src
         |    GROUP BY em.dst) inc ON inc.dst = nd.node)""".stripMargin
    }.mkString(",\n")
    s"""$head,
       |$iterCtes
       |SELECT node, CAST(r AS BIGINT) AS katz_fp FROM k$iters ORDER BY node""".stripMargin
  }

  private def pagerankFpOracle(iters: Int, sources: Seq[String] = Nil,
      weighted: Boolean = false): String = {
    val S = "1000000000000"
    // personalized: teleport (initial mass + per-iteration base) lands on
    // the source set only, divided by |S| — mirrors PageRank.pprFixedPoint
    val (initExpr, baseExpr) =
      if (sources.isEmpty)
        (s"$S // (SELECT n FROM nn)",
          s"(3 * $S) // (20 * (SELECT n FROM nn))")
      else {
        val list = sources.map(s => s"'$s'").mkString(", ")
        val ns = sources.size
        (s"CASE WHEN node IN ($list) THEN $S // $ns ELSE 0 END",
          s"CASE WHEN nd.node IN ($list) THEN (3 * $S) // (20 * $ns) ELSE 0 END")
      }
    // weighted: edge weight = floor(l_quantity), non-positive dropped,
    // m/outdeg are weight SUMS — mirrors PageRank.weightedScoresFixedPoint
    val e0Cte =
      if (weighted)
        """e0 AS (SELECT 'P' || CAST(l_partkey AS VARCHAR) AS src,
          |              'S' || CAST(l_suppkey AS VARCHAR) AS dst,
          |              CAST(FLOOR(l_quantity) AS BIGINT) AS w
          |       FROM lineitem WHERE CAST(FLOOR(l_quantity) AS BIGINT) > 0),
          |em AS (SELECT src, dst, CAST(SUM(w) AS BIGINT) AS m FROM e0 GROUP BY src, dst),
          |od AS (SELECT src, CAST(SUM(w) AS BIGINT) AS outdeg FROM e0 GROUP BY src),""".stripMargin
      else
        """e0 AS (SELECT 'P' || CAST(l_partkey AS VARCHAR) AS src,
          |              'S' || CAST(l_suppkey AS VARCHAR) AS dst FROM lineitem),
          |em AS (SELECT src, dst, COUNT(*) AS m FROM e0 GROUP BY src, dst),
          |od AS (SELECT src, COUNT(*) AS outdeg FROM e0 GROUP BY src),""".stripMargin
    val head =
      s"""WITH
         |$e0Cte
         |e AS (SELECT em.src, em.dst, em.m, od.outdeg FROM em JOIN od ON em.src = od.src),
         |nodes AS (SELECT DISTINCT src AS node FROM e0 UNION SELECT DISTINCT dst FROM e0),
         |nn AS (SELECT COUNT(*) AS n FROM nodes),
         |pr0 AS (SELECT node, $initExpr AS r FROM nodes),""".stripMargin
    val iterCtes = (1 to iters).map { i =>
      s"""pr$i AS (
         |  SELECT nd.node,
         |         $baseExpr + COALESCE(inc.s, 0) AS r
         |  FROM nodes nd LEFT JOIN (
         |    SELECT e.dst, CAST(SUM((17 * e.m * p.r) // (20 * e.outdeg)) AS BIGINT) AS s
         |    FROM e JOIN pr${i - 1} p ON p.node = e.src
         |    GROUP BY e.dst) inc ON inc.dst = nd.node)""".stripMargin
    }.mkString(",\n")
    s"$head\n$iterCtes\nSELECT node, CAST(r AS BIGINT) AS rank_q FROM pr$iters ORDER BY node"
  }

  /** Per-document token-stat tail over `words`/`wt` from [[tokenizeCtes]]:
    * counts, unknown counts, and the first-8-token head string. */
  private def tokenStatsTailSql: String =
    """wstat AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n_tok,
      |                 CAST(SUM(CASE WHEN tok = '?' THEN 1 ELSE 0 END) AS BIGINT) AS n_unk
      |          FROM wt GROUP BY w),
      |dstat AS (SELECT wo.doc_id, CAST(SUM(s.n_tok) AS BIGINT) AS n_tokens,
      |                 CAST(SUM(s.n_unk) AS BIGINT) AS n_unk
      |          FROM words wo JOIN wstat s ON wo.w = s.w GROUP BY wo.doc_id),
      |htok AS (SELECT wo.doc_id, wo.wi, t.step, t.tok,
      |                ROW_NUMBER() OVER (PARTITION BY wo.doc_id ORDER BY wo.wi, t.step) AS rn
      |         FROM words wo JOIN wt t ON wo.w = t.w WHERE wo.wi <= 8),
      |head AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY wi, step) AS head_toks
      |         FROM htok WHERE rn <= 8 GROUP BY doc_id)
      |SELECT d.doc_id, COALESCE(ds.n_tokens, 0) AS n_tokens,
      |       COALESCE(ds.n_unk, 0) AS n_unk,
      |       COALESCE(h.head_toks, '') AS head_toks
      |FROM documents d
      |LEFT JOIN dstat ds ON d.doc_id = ds.doc_id
      |LEFT JOIN head h ON d.doc_id = h.doc_id
      |ORDER BY d.doc_id""".stripMargin

  /** Unrolled BPE-training CTEs mirroring ops.BpeTrain exactly: per round,
    * LEAD-paired symbol counts weighted by word multiplicity, a
    * deterministic argmax (count desc, left asc, right asc, LIMIT 1), the
    * chained-candidate run trick for greedy leftmost non-overlapping
    * merging (odd run members), then the rewrite/delete. Ends with
    * `best1..bestR` and `rows$rounds(w, pos, sym)`.
    */
  private def bpeCtes(rounds: Int): String = {
    val head =
      """docs0 AS (SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
        |wn AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n_w
        |       FROM (SELECT unnest(ws) AS w FROM docs0) GROUP BY w),
        |rows0 AS MATERIALIZED (
        |  SELECT w, CAST(i AS BIGINT) AS pos, substr(w, CAST(i AS INT), 1) AS sym
        |  FROM wn, UNNEST(range(1, len(w) + 1)) t(i))""".stripMargin
    val steps = (1 to rounds).map { r =>
      s"""p$r AS MATERIALIZED (
         |  SELECT w, pos, sym,
         |         LEAD(sym) OVER (PARTITION BY w ORDER BY pos) AS nsym,
         |         LEAD(pos) OVER (PARTITION BY w ORDER BY pos) AS npos
         |  FROM rows${r - 1}),
         |cnt$r AS MATERIALIZED (
         |  SELECT p.sym, p.nsym, CAST(SUM(wn.n_w) AS BIGINT) AS cnt
         |  FROM p$r p JOIN wn ON wn.w = p.w
         |  WHERE p.nsym IS NOT NULL GROUP BY p.sym, p.nsym),
         |best$r AS MATERIALIZED (
         |  SELECT sym AS ba, nsym AS bb, cnt FROM cnt$r
         |  ORDER BY cnt DESC, sym ASC, nsym ASC LIMIT 1),
         |cand$r AS MATERIALIZED (
         |  SELECT p.w, p.pos, p.npos,
         |         CASE WHEN LAG(p.npos) OVER (PARTITION BY p.w ORDER BY p.pos) = p.pos
         |              THEN 0 ELSE 1 END AS rs
         |  FROM p$r p JOIN best$r b ON p.sym = b.ba AND p.nsym = b.bb),
         |keptr$r AS MATERIALIZED (
         |  SELECT w, pos, npos FROM (
         |    SELECT w, pos, npos,
         |           ROW_NUMBER() OVER (PARTITION BY w, run ORDER BY pos) AS k
         |    FROM (SELECT w, pos, npos,
         |                 SUM(rs) OVER (PARTITION BY w ORDER BY pos
         |                   ROWS UNBOUNDED PRECEDING) AS run
         |          FROM cand$r))
         |  WHERE k % 2 = 1),
         |rows$r AS MATERIALIZED (
         |  SELECT r.w, r.pos,
         |         CASE WHEN m.pos IS NOT NULL THEN (SELECT ba || bb FROM best$r)
         |              ELSE r.sym END AS sym
         |  FROM rows${r - 1} r
         |  LEFT JOIN (SELECT w, pos FROM keptr$r) m ON m.w = r.w AND m.pos = r.pos
         |  LEFT JOIN (SELECT w, npos FROM keptr$r) d ON d.w = r.w AND d.npos = r.pos
         |  WHERE d.npos IS NULL)""".stripMargin
    }.mkString(",\n")
    s"$head,\n$steps"
  }

  /** Bottom-k order-statistic sample CTEs mirroring
    * functions.QuantileSampleAgg: per order priority, the k smallest
    * (md5-lane hash, cents value) pairs with multiplicity. Ends with
    * `kept(pri, v, h, rk)`.
    */
  private def quantileSampleCtes(k: Int): String =
    s"""vals AS (SELECT o_orderpriority AS pri,
       |                CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS v
       |         FROM orders WHERE o_totalprice IS NOT NULL),
       |hashed AS (SELECT pri, v,
       |                  ('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 15))::BIGINT AS h
       |           FROM vals),
       |rk AS (SELECT pri, v, h,
       |              ROW_NUMBER() OVER (PARTITION BY pri ORDER BY h, v) AS rk
       |       FROM hashed),
       |kept AS (SELECT pri, v, h, rk FROM rk WHERE rk <= $k)""".stripMargin

  /** Greedy longest-match subword tokenization CTEs mirroring
    * ops.Tokenizer exactly: explode docs to 1-based word positions,
    * tokenize DISTINCT words. The greedy loop is sequential per word, so
    * the recursion precomputes the TOTAL step function `ch(w, pos) →
    * (token, advance)` non-recursively (longest vocab match per position,
    * `?`/1 fallback) and then just iterates each word's trajectory with an
    * inner join — aggregation/EXISTS inside the recursive term, which
    * DuckDB rejects, is never needed. Ends with `words(doc_id, wi, w)` and
    * `wt(w, step, tok)` for the caller's final SELECT.
    */
  private def tokenizeCtes(
      vocabCte: String =
        s"vocab(tok) AS (VALUES ${graft.ops.Tokenizer.vocabValuesSql()})"): String =
    s"""$vocabCte,
       |docs AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
       |words AS (SELECT doc_id, CAST(generate_subscripts(ws, 1) AS INT) AS wi, unnest(ws) AS w FROM docs),
       |dw AS (SELECT DISTINCT w FROM words),
       |positions AS (SELECT w, unnest(range(1, len(w) + 1)) AS pos FROM dw),
       |cand AS (SELECT p.w, p.pos, v.tok
       |         FROM positions p JOIN vocab v ON substr(p.w, CAST(p.pos AS INT), len(v.tok)) = v.tok),
       |pick AS (SELECT w, pos, tok,
       |                ROW_NUMBER() OVER (PARTITION BY w, pos ORDER BY len(tok) DESC) AS rn
       |         FROM cand),
       |ch AS MATERIALIZED (
       |  SELECT p.w, p.pos, COALESCE(k.tok, '?') AS tok,
       |         COALESCE(len(k.tok), 1) AS adv
       |  FROM positions p LEFT JOIN (SELECT w, pos, tok FROM pick WHERE rn = 1) k
       |    ON k.w = p.w AND k.pos = p.pos),
       |st AS (
       |  SELECT w, CAST(1 AS BIGINT) AS pos, CAST(0 AS INT) AS step, CAST('' AS VARCHAR) AS tok FROM dw
       |  UNION ALL
       |  SELECT s.w, s.pos + c.adv, s.step + 1, c.tok
       |  FROM st s JOIN ch c ON c.w = s.w AND c.pos = s.pos
       |  WHERE s.pos <= len(s.w)),
       |wt AS (SELECT w, step, tok FROM st WHERE step >= 1)""".stripMargin

  /** Path-doubling all-pairs shortest-distance CTEs over the 25-node
    * nation graph: with 0-cost self-loops folded into d0, each round
    * subsumes the last, so d_k(a,c) = min cost over walks of <= 2^k
    * edges. `rounds`=5 covers 32 >= 24 edges — the longest possible
    * simple path on 25 nodes — and nonnegative costs make min-over-walks
    * = min-over-simple-paths, so d5 is the exact all-pairs distance.
    * Replaces the recursive simple-path enumeration whose fan-out
    * dominated the t2 oracle wall time (VERDICT r4 item 1). MATERIALIZED
    * is load-bearing: each round references the previous one twice.
    */
  /** Unrolled SimRank oracle over the directed nation graph: the
    * chain+skip edge CTEs, then `iters` rounds of the pair⋈edge⋈edge
    * sum with the same HUGEINT-floored ppm update and the diagonal
    * clamped to 10⁶ — mirrors ops.SimRank.simRank round for round. */
  private def simRankOracle(iters: Int, cPpm: Long = 800000L): String = {
    val head =
      """nk AS (SELECT n_name, n_nationkey, ROW_NUMBER() OVER (ORDER BY n_nationkey) AS rn FROM nation),
        |chain AS (SELECT a.n_name AS src, b.n_name AS dst
        |          FROM nk a JOIN nk b ON b.rn = a.rn + 1),
        |skip AS (SELECT a.n_name AS src, b.n_name AS dst
        |         FROM nk a JOIN nk b ON b.rn = a.rn + 5),
        |edges AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
        |         SELECT * FROM chain UNION ALL SELECT * FROM skip)
        |         WHERE src <> dst),
        |din AS (SELECT dst AS a, CAST(COUNT(*) AS BIGINT) AS din
        |        FROM edges GROUP BY 1),
        |nodes AS (SELECT DISTINCT x AS node FROM (
        |         SELECT src AS x FROM edges UNION ALL SELECT dst FROM edges)),
        |s0 AS MATERIALIZED (SELECT node AS pa, node AS pb,
        |         CAST(1000000 AS BIGINT) AS s_ppm FROM nodes)""".stripMargin
    val steps = (1 to iters).map { t =>
      s"""sum$t AS (SELECT ea.dst AS na, eb.dst AS nb,
         |          CAST(SUM(s.s_ppm) AS BIGINT) AS ssum
         |        FROM s${t - 1} s
         |        JOIN edges ea ON ea.src = s.pa
         |        JOIN edges eb ON eb.src = s.pb
         |        WHERE ea.dst <> eb.dst GROUP BY 1, 2),
         |s$t AS MATERIALIZED (SELECT pa, pb, s_ppm FROM (
         |        SELECT node AS pa, node AS pb,
         |               CAST(1000000 AS BIGINT) AS s_ppm FROM nodes
         |        UNION ALL
         |        SELECT q.na, q.nb,
         |               CAST(($cPpm::HUGEINT * q.ssum)
         |                 // (1000000::HUGEINT * da.din * db.din) AS BIGINT)
         |        FROM sum$t q
         |        JOIN din da ON da.a = q.na
         |        JOIN din db ON db.a = q.nb)
         |      WHERE s_ppm > 0)""".stripMargin
    }.mkString(",\n")
    s"""WITH $head,
       |$steps
       |SELECT pa AS node_a, pb AS node_b, s_ppm FROM s$iters
       |WHERE pa < pb ORDER BY 1, 2""".stripMargin
  }

  private def nationApspCtes(rounds: Int): String = {
    val head =
      """nk AS (SELECT n_name, n_nationkey, ROW_NUMBER() OVER (ORDER BY n_nationkey) AS rn FROM nation),
        |chain AS (SELECT a.n_name AS src, b.n_name AS dst,
        |            CAST(TRUNC((CAST(0.1 AS DOUBLE) + (b.n_nationkey % 7) * CAST(0.35 AS DOUBLE)) * CAST(1000.0 AS DOUBLE)) AS BIGINT) AS cost
        |          FROM nk a JOIN nk b ON b.rn = a.rn + 1),
        |skip AS (SELECT a.n_name AS src, b.n_name AS dst,
        |           CAST(TRUNC((CAST(1.0 AS DOUBLE) + (b.n_nationkey % 5) * CAST(0.21 AS DOUBLE)) * CAST(1000.0 AS DOUBLE)) AS BIGINT) AS cost
        |         FROM nk a JOIN nk b ON b.rn = a.rn + 5),
        |edges AS (SELECT * FROM chain UNION ALL SELECT * FROM skip),
        |sym AS (SELECT src, dst, cost FROM edges UNION ALL SELECT dst AS src, src AS dst, cost FROM edges),
        |d0 AS MATERIALIZED (
        |  SELECT src, dst, MIN(cost) AS cost FROM (
        |    SELECT src, dst, cost FROM sym
        |    UNION ALL
        |    SELECT src, src AS dst, CAST(0 AS BIGINT) AS cost FROM (SELECT DISTINCT src FROM sym))
        |  GROUP BY src, dst)""".stripMargin
    val steps = (1 to rounds).map { i =>
      s"""d$i AS MATERIALIZED (
         |  SELECT a.src, b.dst, MIN(a.cost + b.cost) AS cost
         |  FROM d${i - 1} a JOIN d${i - 1} b ON a.dst = b.src
         |  GROUP BY a.src, b.dst)""".stripMargin
    }.mkString(",\n")
    s"$head,\n$steps"
  }

  /** Unrolled level-synchronous BFS with shortest-path counts over the
    * unweighted nation graph: frontier f_i holds (src, node, sigma) for
    * nodes at distance exactly i, sigma summed over predecessor
    * frontiers — the standard Brandes forward pass, which is what the
    * repo's distributed Betweenness computes. `rounds` must be >= the
    * graph's eccentricity (8 for the 25-node chain+skip graph; 10 leaves
    * margin — extra rounds are empty frontiers). Replaces the recursive
    * simple-path enumeration (VERDICT r4 item 1).
    */
  private def nationBfsSigmaCtes(rounds: Int): String = {
    val head =
      """nk AS (SELECT n_name, n_nationkey, ROW_NUMBER() OVER (ORDER BY n_nationkey) AS rn FROM nation),
        |chain AS (SELECT a.n_name AS src, b.n_name AS dst FROM nk a JOIN nk b ON b.rn = a.rn + 1),
        |skip AS (SELECT a.n_name AS src, b.n_name AS dst FROM nk a JOIN nk b ON b.rn = a.rn + 5),
        |edges AS (SELECT * FROM chain UNION ALL SELECT * FROM skip),
        |sym AS (SELECT src, dst FROM edges UNION ALL SELECT dst AS src, src AS dst FROM edges),
        |nodes AS (SELECT DISTINCT src AS node FROM sym),
        |f0 AS MATERIALIZED (SELECT node AS src, node, CAST(1 AS BIGINT) AS sigma FROM nodes),
        |r0 AS MATERIALIZED (SELECT src, node FROM f0)""".stripMargin
    val steps = (1 to rounds).map { i =>
      s"""f$i AS MATERIALIZED (
         |  SELECT f.src, s.dst AS node, CAST(SUM(f.sigma) AS BIGINT) AS sigma
         |  FROM f${i - 1} f JOIN sym s ON f.node = s.src
         |  LEFT JOIN r${i - 1} r ON r.src = f.src AND r.node = s.dst
         |  WHERE r.node IS NULL
         |  GROUP BY f.src, s.dst),
         |r$i AS MATERIALIZED (SELECT src, node FROM r${i - 1} UNION ALL SELECT src, node FROM f$i)""".stripMargin
    }.mkString(",\n")
    val levels = (1 to rounds)
      .map(i => s"SELECT src, node, $i AS d, sigma FROM f$i")
      .mkString("\n  UNION ALL ")
    s"$head,\n$steps,\nsg AS (SELECT src AS s, node AS t, d, sigma FROM (\n  $levels))"
  }

  /** DuckDB min-label-propagation connected components over the same
    * part↔supplier edges as Tables.partSupplierEdges; `finalSelect` runs
    * over cc(node, lab) where min(lab) per node = canonical component.
    */
  /** Shared CTE prefix for the ANN-audit oracles: `lsh(query_id, rank,
    * neighbor_id, cosine)` from the portable LSH generator and
    * `bf(query_id, neighbor_id, rank)` — the exact quantized-cosine
    * top-5 for queries vec_id < 20 (the q_ann_topk pipeline).
    */
  private def annAuditCtes: String =
    s"""lsh AS (SELECT * FROM (
       |${graft.ops.Similarity.lshPortableOracle(dim = 64, k = 5,
            nBits = 6, tables = 4, seed = 42L)})),
       |bf AS (SELECT * FROM (
       |  WITH q AS (SELECT vec_id, list_transform(embedding,
       |               x -> FLOOR(CAST(x AS DOUBLE) * CAST(10000.0 AS DOUBLE))) AS v
       |             FROM embeddings),
       |  n AS (SELECT vec_id, (SELECT SUM(x*x) FROM UNNEST(v) AS t(x)) AS nrm FROM q),
       |  p AS (SELECT qq.vec_id AS query_id, c.vec_id AS neighbor_id,
       |          (SELECT SUM(qq.v[i]*c.v[i])
       |           FROM UNNEST(range(1, len(qq.v)+1)) AS t(i)) AS dot
       |        FROM (SELECT * FROM q WHERE vec_id < 20) qq
       |        JOIN q c ON c.vec_id <> qq.vec_id),
       |  scored AS (SELECT query_id, neighbor_id,
       |               ROW_NUMBER() OVER (PARTITION BY query_id
       |                 ORDER BY dot / SQRT(na.nrm * nb.nrm) DESC,
       |                   neighbor_id ASC) AS rank
       |             FROM p JOIN n na ON na.vec_id = query_id
       |                    JOIN n nb ON nb.vec_id = neighbor_id)
       |  SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank
       |  FROM scored WHERE rank <= 5))""".stripMargin

  private def ccOracle(finalSelect: String): String =
    s"""WITH RECURSIVE
       |edges AS (
       |  SELECT 'P' || CAST(l_partkey AS VARCHAR) AS a,
       |         'S' || CAST(l_suppkey AS VARCHAR) AS b
       |  FROM lineitem WHERE l_quantity <= 2),
       |sym AS (SELECT a, b FROM edges UNION SELECT b AS a, a AS b FROM edges),
       |nodes AS (SELECT DISTINCT a AS node FROM sym),
       |cc AS (
       |  SELECT node, node AS lab FROM nodes
       |  UNION
       |  SELECT s.b AS node, c.lab
       |  FROM cc c JOIN sym s ON c.node = s.a
       |  WHERE c.lab < s.b)
       |$finalSelect""".stripMargin
}
