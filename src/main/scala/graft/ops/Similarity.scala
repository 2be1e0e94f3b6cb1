package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float|double>).
  *
  * Numeric determinism: callers that need cross-engine/bit-stable results
  * should pre-quantize vectors to integer-valued doubles via [[quantize]]
  * — integer dot products and squared norms are then EXACT in double
  * (< 2^53) regardless of summation order, and the final
  * `dot / sqrt(na*nb)` is a single deterministic IEEE operation. (Same
  * fixed-point trick the reference uses for Dijkstra costs,
  * reference: src/shortest_path.rs:70.)
  *
  *   - [[bruteForceTopK]] — exact top-k by cosine: one pair join + ranking
  *     window. The correctness baseline.
  *   - [[hyperplaneLshBuckets]] / [[lshTopK]] — random-hyperplane LSH: each
  *     vector hashes to a sign-bit bucket; only same-bucket pairs are
  *     scored. Sub-quadratic candidate generation — the 100 TB path
  *     (recall measured against brute force in tests).
  */
object Similarity {

  /** 1-based top-k per query by (cosine desc, neighbor_id asc) — a k-slot
    * hash aggregate (functions/TopKByAgg) instead of the window
    * `row_number` formulation, which SORTS every candidate row per
    * partition; map-side partials mean the shuffle carries at most k pairs
    * per (query, partition). Output rows are bit-identical to the window
    * version (same ordering contract, same tie-break). */
  private def topKPerQuery(pairs: DataFrame, k: Int): DataFrame =
    pairs.groupBy(col("query_id"))
      .agg(graft.functions.TopKByAgg.top_k_by(
        col("cosine"), col("neighbor_id"), k).as("__top"))
      .select(col("query_id"), posexplode(col("__top")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("col.neighbor_id").as("neighbor_id"), col("col.cosine").as("cosine"))

  /** Cosine similarity of two numeric arrays, computed in double in index
    * order via the native codegen'd [[graft.functions.ArrayDot]] expression
    * (bit-identical to the aggregate/zip_with formulation it replaced,
    * ~10× faster — higher-order array expressions are interpreted).
    */
  /** Widen a compute-bound side to full parallelism when its scan yields
    * fewer partitions than cores: Spark sizes splits by BYTES
    * (`maxPartitionBytes`), but a broadcast-nested-loop/ADC operator does
    * O(corpus) or O(dim·candidates) work PER ROW, so a small single-file
    * input otherwise funnels the whole scoring loop through one task
    * (r10 full-gate probe: q_ann_ivf ×16 pinned a lone task at 455 s CPU
    * while 31 cores idled). No-op when the input is already wide — real-
    * scale multi-file scans add no shuffle. Hash-repartitioning by the id
    * column is deterministic in CONTENT; all downstream per-row work is
    * order-free. */
  private[graft] def widen(df: DataFrame, keyCol: String): DataFrame = {
    // Streaming micro-batch inputs cannot answer `.rdd` (it is a batch-only
    // probe — AnalysisException), and their partitioning is the stream
    // runner's business anyway: pass through untouched (r12; the batch
    // ops this guards are also reused by the stream≡batch twins).
    if (df.isStreaming) return df
    val p = df.sparkSession.sparkContext.defaultParallelism
    // CALL-SITE CONTRACT (VERDICT r12 item 5): `.rdd` here only reads the
    // scan's partition count, which is free ONLY because every call site
    // passes a scan+project plan with no upstream Exchange — under AQE,
    // `.rdd` on a plan WITH exchanges materializes those stages as a side
    // effect. Keep widen() at scan altitude; do not call it on joined or
    // aggregated frames.
    if (df.rdd.getNumPartitions < p) df.repartition(p, col(keyCol)) else df
  }

  /** [[widen]] without a key: round-robin repartition for callers whose
    * downstream is order-free and value-skewed — hash-widening by a
    * heavy-hitters item column would funnel every occurrence of the hot
    * item into one partition, defeating the widening (ADVICE r12).
    * Round-robin is retry-deterministic via Spark's sort-before-
    * repartition (guide §2.5). Same gating and `.rdd` contract as
    * [[widen]].
    */
  private[graft] def widenRoundRobin(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }

  def cosine(a: Column, b: Column): Column = {
    import graft.functions.ArrayDot.array_dot
    array_dot(a, b) / sqrt(array_dot(a, a) * array_dot(b, b))
  }

  /** Quantize a float/double array to integer-valued doubles:
    * floor(x * scale). Deterministic in any engine from identical input.
    * Backed by the codegen'd [[graft.functions.ArrayQuantize]] — the
    * `transform(vec, x -> floor(x * scale))` formulation it replaces is a
    * CodegenFallback higher-order function, interpreted per row, and was
    * the dominant cost of every quantized ANN query (r2 bench: q_ann_ivf
    * 25.7s, q_dedup_embed 5.1s — both from re-evaluating the HOF on each
    * downstream scan). */
  def quantize(vec: Column, scale: Double = 10000.0): Column =
    graft.functions.ArrayQuantize.array_quantize(vec, scale)

  /** Collected (id, vector, squared-norm) corpus for the broadcast fast
    * paths. Spark's higher-order array functions (aggregate/zip_with) are
    * CodegenFallback — interpreted per row — so exact all-pairs scoring
    * through them is ~30× slower than a broadcast + tight-loop
    * mapPartitions. The broadcast path is also the right 100 TB shape for
    * a SMALL corpus scored against a LARGE distributed side; when both
    * sides are huge, use the LSH path instead.
    */
  private[graft] def collectVectors(df: DataFrame, idCol: String, vecCol: String,
      maxVectors: Long): (Array[Long], Array[Array[Double]], Array[Double]) = {
    import org.apache.spark.sql.types._
    val idType = df.schema(idCol).dataType
    // integral only: fractional ids would truncate on the long cast and
    // silently collide
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(idType),
      s"broadcast vector paths require an integral id column; '$idCol' is " +
        s"${idType.simpleString} — map ids to longs first")
    // single scan: limit(max+1) both enforces the cap and collects
    val rows = df.select(col(idCol).cast("long"),
        col(vecCol).cast("array<double>"))
      .limit(if (maxVectors < Int.MaxValue - 1) maxVectors.toInt + 1 else Int.MaxValue)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    require(rows.length <= maxVectors,
      s"broadcast vector fast path supports <= $maxVectors vectors; " +
        "use the LSH scale path")
    val ids = rows.map(_._1)
    val vecs = rows.map(_._2)
    val norms = vecs.map(v => { var s = 0.0; var i = 0; while (i < v.length) { s += v(i) * v(i); i += 1 }; s })
    (ids, vecs, norms)
  }

  private[graft] def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Exact cosine top-k: for every query vector, the k nearest corpus
    * vectors (ties broken by corpus id ascending). Output:
    * (query_id, rank, neighbor_id, cosine). Corpus is broadcast; queries
    * stream distributed through mapPartitions with a per-query bounded
    * top-k heap — no shuffle at all.
    *
    * @param excludeSelfId skip the corpus vector whose id equals the query
    *   id — correct for self-query (queries ⊆ corpus, the default use);
    *   set false when corpus and queries are unrelated entities that merely
    *   share an id space.
    */
  /** GATE CALIBRATION (r10 full-gate probe, tools/scale_probe_r10.jsonl):
    * maxCorpusVectors = 10M ≈ 5 GB broadcast at dim 64 — the loud upper
    * bound of the exact path. q_ann_topk measured 1.6× and
    * q_hard_negatives 1.2× at 16× data (both stream the big side through
    * one scan with per-row top-k, so growth is the broadcast build +
    * linear scan). Cap kept: above it the caller wants an index family,
    * not a bigger broadcast. */
  def bruteForceTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String, k: Int,
      maxCorpusVectors: Long = 10000000L,
      excludeSelfId: Boolean = true): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val (ids, vecs, norms) = collectVectors(corpus, idCol, vecCol, maxCorpusVectors)
    val bc = spark.sparkContext.broadcast((ids, vecs, norms))
    widen(queries.select(col(qIdCol).cast("long").as("__qid"),
        col(qVecCol).cast("array<double>").as("__qv")), "__qid")
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val (cIds, cVecs, cNorms) = bc.value
        it.flatMap { case (qid, qv) =>
          var qn = 0.0; var i = 0
          while (i < qv.length) { qn += qv(i) * qv(i); i += 1 }
          // bounded top-k: min-heap by (cosine asc, neighbor_id desc)
          val ord = Ordering.by[(Long, Double), (Double, Long)] {
            case (id, c) => (-c, id)
          }
          val heap = scala.collection.mutable.PriorityQueue.empty[(Long, Double)](ord)
          var j = 0
          while (j < cIds.length) {
            if (!(excludeSelfId && cIds(j) == qid)) {
              val c = dot(qv, cVecs(j)) / math.sqrt(qn * cNorms(j))
              // zero-norm vectors yield NaN cosine; a NaN in the heap would
              // pin the head (NaN is max) and freeze the top-k — skip them
              if (c.isNaN) { /* unrankable */ }
              else if (heap.size < k) heap.enqueue((cIds(j), c))
              else {
                val (wid, wc) = heap.head
                if (c > wc || (c == wc && cIds(j) < wid)) {
                  heap.dequeue(); heap.enqueue((cIds(j), c))
                }
              }
            }
            j += 1
          }
          val best: Seq[(Long, Double)] = heap.dequeueAll.reverse
          best.zipWithIndex.map { case ((nid, c), r) => (qid, r + 1, nid, c) }
        }
      }
      .toDF("query_id", "rank", "neighbor_id", "cosine")
  }

  /** Hard-negative mining — the contrastive-training data-prep step: for
    * each query vector, the `k` most cosine-similar corpus vectors with a
    * DIFFERENT label (same-label hits are positives; the near-miss
    * negatives are what a contrastive loss learns from). Output:
    * (query_id, rank, neighbor_id, cosine), ranked (cosine desc, id asc).
    *
    * Topology is the mining one: the query batch is SMALL (one training
    * batch) and broadcast, the corpus is LARGE and streams through one
    * scan — a broadcast nested-loop join whose per-row work is the
    * codegen'd [[graft.functions.ArrayDot]] cosine, followed by the
    * k-slot top-k aggregate (shuffle carries ≤ k pairs per query per
    * partition). No driver-side vector state; corpus scale is unbounded.
    * Pre-quantize both sides via [[quantize]] for an engine-exact result.
    *
    * GATE CALIBRATION (r10 full-gate probe, tools/scale_probe_r10.jsonl):
    * the broadcast side here is the QUERY BATCH (training-batch sized by
    * contract, no explicit cap — Spark's broadcast limit is the loud
    * stop); q_hard_negatives measured 1.2× at 16× corpus, confirming
    * cost tracks the streamed side. */
  def hardNegatives(corpus: DataFrame, idCol: String, vecCol: String,
      labelCol: String, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
      col(labelCol).as("__ql"))
    val c = widen(corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("__cv"), col(labelCol).as("__cl")), "neighbor_id")
    val pairs = c.join(broadcast(q),
        col("query_id") =!= col("neighbor_id") && col("__ql") =!= col("__cl"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("__qv"), col("__cv")).as("cosine"))
      .where(!isnan(col("cosine"))) // zero-norm vectors are unrankable
    topKPerQuery(pairs, k)
  }

  /** IVF (inverted-file) ANN: k-means-lite centroids → per-vector cell
    * assignment → queries probe only the `nProbe` nearest cells and rerank
    * exactly. The classic alternative to LSH bucketing: candidate cost is
    * (corpus/k)·nProbe per query instead of all-pairs. Centroids come from
    * a seeded Lloyd's iteration over a bounded sample — deterministic, no
    * MLlib dependency, and the (small) centroid table broadcasts.
    */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String, dim: Int, k: Int,
      nCells: Int = 16, nProbe: Int = 4, kmeansIters: Int = 5,
      sampleSize: Int = 2000, seed: Long = 42L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // persisted: scanned by the centroid sample, assignment and probe passes
    val v = df.select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("vec"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // centroids: Lloyd on a deterministic sample (smallest ids), driver-side
    val sample = v.orderBy("id").limit(sampleSize)
      .as[(Long, Array[Double])].collect().map(_._2)
    require(sample.nonEmpty, "empty input")
    val rnd = new scala.util.Random(seed)
    var centroids = rnd.shuffle(sample.toVector).take(math.min(nCells, sample.length)).toArray
    for (_ <- 0 until kmeansIters) {
      val sums = Array.fill(centroids.length)(new Array[Double](dim))
      val counts = Array.fill(centroids.length)(0L)
      sample.foreach { x =>
        val c = nearestCentroid(x, centroids)
        var i = 0; while (i < dim) { sums(c)(i) += x(i); i += 1 }
        counts(c) += 1
      }
      centroids = centroids.indices.map { c =>
        if (counts(c) == 0) centroids(c)
        else { val m = new Array[Double](dim); var i = 0
          while (i < dim) { m(i) = sums(c)(i) / counts(c); i += 1 }; m }
      }.toArray
    }
    val bcCentroids = spark.sparkContext.broadcast(centroids)

    // assign every corpus vector to its cell (one narrow pass) —
    // widen() first: with √N cells the per-row argmin is O(nCells·dim),
    // compute-bound work a single-file scan would otherwise serialize
    val vt = widen(v, "id").as[(Long, Array[Double])]
    val assigned = vt.mapPartitions { it =>
      val cs = bcCentroids.value
      it.map { case (id, vec) => (id, vec, nearestCentroid(vec, cs)) }
    }.toDF("id", "vec", "cell")

    // queries probe nProbe nearest cells
    val probes = vt.mapPartitions { it =>
      val cs = bcCentroids.value
      it.flatMap { case (id, vec) =>
        cs.indices.map(c => (c, sqDist(vec, cs(c)))).sortBy(_._2)
          .take(nProbe).map { case (c, _) => (id, vec, c) }
      }
    }.toDF("query_id", "qvec", "cell")

    // Salted cell join: the raw key has only nCells distinct values, so a
    // plain shuffle join caps parallelism at nCells and serializes hot
    // cells. Each corpus row takes a deterministic sub-bucket
    // hash(id) % salt; each probe is replicated across all salt
    // sub-buckets (replicate the probe side — queries × nProbe — never
    // the corpus, which at scale is the big side). Join keys become
    // nCells × salt.
    val salt = math.max(1,
      (spark.sparkContext.defaultParallelism * 2 + nCells - 1) / nCells)
    val saltedAssigned = assigned.withColumn("__salt",
      pmod(xxhash64(col("id")), lit(salt.toLong)).cast("int"))
    val saltedProbes = probes.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    val pairs = saltedProbes.join(saltedAssigned, Seq("cell", "__salt"))
      .where(col("query_id") =!= col("id"))
      // r12 OPT: cosine via the codegen'd ArrayDot expression instead of
      // a typed mapPartitions closure — the object path paid Serialize/
      // DeserializeToObject per candidate row and blocked whole-stage
      // codegen through the scoring join. Each array_dot is an
      // index-order loop and the combine is qn*nn -> sqrt -> divide,
      // bit-identical to the fused closure (independent accumulators,
      // same order), so scores and tie orders are unchanged.
      .select(col("query_id"), col("id").as("neighbor_id"),
        cosine(col("qvec"), col("vec")).as("cosine"))
      .where(!isnan(col("cosine")))
    // no dedup needed: each corpus vector lives in exactly one cell, so a
    // (query, neighbor) pair can only arise once
    topKPerQuery(pairs, k)
  }

  /** ceil(log2(x)) for x >= 1. */
  private def ceilLog2(x: Long): Int =
    if (x <= 1L) 0 else 64 - java.lang.Long.numberOfLeadingZeros(x - 1)

  /** Derive the LSH width from the corpus size: nBits =
    * ceil(log2(N / targetOccupancy)) clamped to [4, 40] — expected bucket
    * occupancy stays ~targetOccupancy as N grows, so candidate volume per
    * table (~N·occupancy) is LINEAR in N. Exposed for spec pinning. */
  private[graft] def autoNBits(n: Long, targetOccupancy: Int): Int =
    math.min(40, math.max(4, ceilLog2(math.max(1L, n / targetOccupancy))))

  /** Derive the IVF cell count from the corpus size: nCells = ceil(√N)
    * clamped to [16, 4096] — the classic IVF sizing that balances the
    * assignment pass (N·nCells) against the probe pass
    * (N·nProbe·N/nCells); both grow as N^1.5, never N². */
  private[graft] def autoNCells(n: Long): Int =
    math.min(4096, math.max(16, math.ceil(math.sqrt(n.toDouble)).toInt))

  /** WIDTH-ADAPTIVE LSH — the scale path the fixed-width portable
    * variant cannot be: [[lshTopKPortable]]'s nBits is an oracle literal,
    * so its candidate volume Σ|bucket|² ≈ N²·tables/2^nBits grows
    * QUADRATICALLY at fixed width (r10 full-gate probe: q_ann_lsh 162×
    * at 16× data). Here one count() sizes nBits to hold expected bucket
    * occupancy at `targetOccupancy`, then [[lshTopK]] runs unchanged —
    * candidate volume ~N·targetOccupancy·tables, linear in N. The width
    * is a deterministic function of (N, targetOccupancy), so results are
    * reproducible per corpus snapshot (just not expressible as one
    * static SQL oracle — recall and parity are spec-pinned instead). */
  def lshTopKAuto(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      k: Int, targetOccupancy: Int = 32, tables: Int = 4, seed: Long = 42L,
      maxBucketSize: Int = 1000): DataFrame = {
    require(targetOccupancy >= 1, s"targetOccupancy must be >= 1")
    val nBits = autoNBits(df.count(), targetOccupancy)
    lshTopK(df, idCol, vecCol, dim, k, nBits, tables, seed, maxBucketSize)
  }

  /** WIDTH-ADAPTIVE IVF — [[ivfTopK]] with nCells = ceil(√N) (clamped
    * [16, 4096]) and a sample sized to fit the codebook: the fixed
    * 16-cell portable variant's probe pass scans N·nProbe/16 vectors per
    * query — quadratic total at fixed cells (r10 full-gate probe:
    * q_ann_ivf 63× at 16× data, AFTER the widen fix); √N cells keep both
    * the assignment and probe passes at N^1.5. Deterministic per corpus
    * snapshot, spec-pinned (recall + forced-width parity). */
  def ivfTopKAuto(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      k: Int, nProbe: Int = 4, kmeansIters: Int = 5, seed: Long = 42L): DataFrame = {
    val nCells = autoNCells(df.count())
    val sampleSize = math.min(65536, math.max(2000, 8 * nCells))
    ivfTopK(df, idCol, vecCol, dim, k, nCells, nProbe, kmeansIters,
      sampleSize, seed)
  }

  /** WIDTH-ADAPTIVE IVF-PQ — [[ivfPqTopKPortable]] (already the fully
    * distributed cogroup shape) with nCells = ceil(√N) and a sample sized
    * to fit the coarse codebook: at fixed cells the per-query ADC work is
    * the probed fraction of the CORPUS (grows with N); √N cells hold
    * per-cell occupancy at √N so assignment and ADC both stay N^1.5 —
    * the deployable compressed-index sizing. Deterministic per corpus
    * snapshot; spec-pinned via forced-width parity. */
  def ivfPqTopKAuto(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      k: Int, nProbe: Int = 4, m: Int = 8, ksub: Int = 16, candR: Int = 50,
      kmeansIters: Int = 2, seed: Long = 42L,
      queryPred: Column = lit(true)): DataFrame = {
    val n = df.count()
    val nCells = autoNCells(n)
    val sampleN = math.min(n, math.min(65536L, math.max(200L, 8L * nCells))).toInt
    ivfPqTopKPortable(df, idCol, vecCol, dim, k, nCells, nProbe, m, ksub,
      candR, kmeansIters, sampleN, seed, queryPred)
  }

  /** Integer-quantized hyperplanes for the portable LSH variant: seeded
    * gaussians floored onto a ×1000 grid. The SAME array feeds the Spark
    * expressions and the literal lists in the generated DuckDB oracle, so
    * both engines compute identical sign bits (integer dots are exact).
    */
  private[graft] def quantizedPlanes(dim: Int, nBits: Int,
      seed: Long): Array[Array[Long]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nBits, dim)(math.floor(rnd.nextGaussian() * 1000.0).toLong)
  }

  /** Cross-engine-portable multi-table hyperplane LSH top-k: vectors are
    * ×10000-quantized ([[quantize]]), hyperplanes integer-quantized
    * ([[quantizedPlanes]]), so every sign bit, bucket id, and cosine is an
    * exact integer computation reproducible in DuckDB SQL
    * ([[lshPortableOracle]]) — upgrading the driver check from rows-only
    * to hash-exact. Same structure as [[lshTopK]]: candidates share a
    * bucket in any table, exact rerank, rank ties broken by neighbor id.
    */
  /** @param queryPred predicate over the internal `id` column selecting
    *   which vectors act as QUERIES (all corpus vectors always index as
    *   neighbors). Per-query results are independent, so
    *   `lshTopKPortable(df, queryPred = p)` ≡
    *   `lshTopKPortable(df).where(p on query_id)` — but the candidate
    *   volume drops with the query count instead of scoring the whole
    *   corpus and discarding (r10 probe: q_mrr audited 20 queries yet
    *   paid the full 32k-query scan, 104× at 16×). The audits' pushdown. */
  /** GATE CALIBRATION (r10 full-gate probe, tools/scale_probe_r10.jsonl):
    * maxBucketSize = 1000 is a HOT-BUCKET bound (degenerate inputs — a
    * boilerplate-heavy near-dup cluster), not an index-saturation bound:
    * at 16× data mean occupancy is ~500, the cap never trips, and
    * q_ann_lsh runs ~160× its base (candidate volume N²·tables/2^nBits
    * at the oracle-literal nBits=6). That growth is the fixed width, so
    * tightening the cap would only silently shrink recall; the scale
    * answer is [[lshTopKAuto]] (occupancy-held nBits, probed ~linear as
    * x_ann_lsh_auto in the same jsonl). Cap kept at 1000. r11: the
    * width-adaptive twin is now ITSELF gated hash-exact —
    * q_ann_lsh_auto / [[lshTopKAutoPortable]] with the COUNT(*)-derived
    * [[lshAutoOracle]], probed 2.4× at ×16 (tools/scale_probe_r11.jsonl)
    * where this fixed-width form probes ~92×. */
  def lshTopKPortable(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      k: Int, nBits: Int = 6, tables: Int = 4, seed: Long = 42L,
      maxBucketSize: Int = 1000, queryPred: Column = lit(true)): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // persisted: the quantized table feeds all `tables` bucket passes and
    // both rerank joins — six parquet scans otherwise
    val v = df.select(col(idCol).cast("long").as("id"),
        quantize(col(vecCol)).as("vec"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bucketed = (0 until tables).map { t =>
      val planes = quantizedPlanes(dim, nBits, seed + t * 7919)
      val bucket = (0 until nBits).map { i =>
        val plane = array(planes(i).map(p => lit(p.toDouble)): _*)
        val dot = graft.functions.ArrayDot.array_dot(col("vec"), plane)
        when(dot >= 0, lit(1L << i)).otherwise(lit(0L))
      }.reduce(_ + _) // disjoint powers of two: sum == bitwise or
      v.select(col("id"), bucket.as("bucket"), lit(t).as("tbl"))
    }.reduce(_ union _)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val capped = Dedup.capHotBuckets(bucketed, Seq("tbl", "bucket"),
      maxBucketSize, "lshTopKPortable")
    val candidates = capped.where(queryPred).as("a").join(capped.as("b"),
        col("a.tbl") === col("b.tbl") &&
          col("a.bucket") === col("b.bucket") && col("a.id") =!= col("b.id"))
      .select(col("a.id").as("query_id"), col("b.id").as("neighbor_id"))
      .distinct()
    val scored = candidates
      .join(v.select(col("id").as("query_id"), col("vec").as("qvec")), "query_id")
      .join(v.select(col("id").as("neighbor_id"), col("vec").as("nvec")), "neighbor_id")
      // r12 OPT: codegen ArrayDot cosine, not a typed closure (see the
      // IVF multi-probe site) — bit-identical scores, no object boundary.
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qvec"), col("nvec")).as("cosine"))
      .where(!isnan(col("cosine")))
    topKPerQuery(scored, k)
  }

  /** Multi-probe hyperplane LSH top-k — the standard memory trick at
    * scale: instead of adding hash TABLES (each one a full extra copy of
    * the bucket index), each query also probes the nBits Hamming-1
    * buckets of every table (one flipped sign bit = the closest
    * neighboring cells). Candidates are a strict superset of the
    * same-table single-probe set, so recall can only go up
    * (spec-asserted), at (nBits+1)× probe rows instead of nBits× more
    * index state. Same portable arithmetic as [[lshTopKPortable]]
    * (integer sign bits, exact rerank) → hash-exact DuckDB oracle
    * ([[lshMultiProbeOracle]]). Probe expansion is query-side only; the
    * stored index is identical to the single-probe variant's.
    *
    * `maxBucketSize` defaults TIGHTER than the single-probe variant
    * (256 vs 1000): candidate volume is (nBits+1)·Σ|bucket|², so hot
    * buckets hurt (nBits+1)× more here — the r9 scale probe measured a
    * 327× blowup at 16× near-duplicate data with the 1000 cap
    * (tools/scale_probe_r09.jsonl) and the tightened cap bounds it;
    * at the driver's sf0.01 the largest bucket is 18 rows, so the cap
    * never trips the oracle comparison.
    *
    * GATE CALIBRATION (r10 full-gate probe, tools/scale_probe_r10.jsonl):
    * q_ann_multiprobe measured 1.3× at 16× data with the 256 cap — the
    * r9 tightening holds at full-gate coverage; 256 kept. */
  def lshTopKMultiProbe(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, k: Int, nBits: Int = 6, tables: Int = 2, seed: Long = 42L,
      maxBucketSize: Int = 256): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val v = df.select(col(idCol).cast("long").as("id"),
        quantize(col(vecCol)).as("vec"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bucketed = (0 until tables).map { t =>
      val planes = quantizedPlanes(dim, nBits, seed + t * 7919)
      val bucket = (0 until nBits).map { i =>
        val plane = array(planes(i).map(p => lit(p.toDouble)): _*)
        val dot = graft.functions.ArrayDot.array_dot(col("vec"), plane)
        when(dot >= 0, lit(1L << i)).otherwise(lit(0L))
      }.reduce(_ + _)
      v.select(col("id"), bucket.as("bucket"), lit(t).as("tbl"))
    }.reduce(_ union _)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val capped = Dedup.capHotBuckets(bucketed, Seq("tbl", "bucket"),
      maxBucketSize, "lshTopKMultiProbe")
    // query-side probe fan-out: own bucket + every Hamming-1 flip
    val probeArr = array(
      (Seq(col("bucket")) ++
        (0 until nBits).map(i => col("bucket").bitwiseXOR(lit(1L << i)))): _*)
    val probes = capped
      .select(col("id").as("query_id"), col("tbl"),
        explode(probeArr).as("bucket"))
    val candidates = probes.join(
        capped.select(col("id").as("neighbor_id"), col("tbl"),
          col("bucket")),
        Seq("tbl", "bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id")
      .distinct()
    val scored = candidates
      .join(v.select(col("id").as("query_id"), col("vec").as("qvec")), "query_id")
      .join(v.select(col("id").as("neighbor_id"), col("vec").as("nvec")), "neighbor_id")
      // r12 OPT: codegen ArrayDot cosine, not a typed closure (see the
      // IVF multi-probe site) — bit-identical scores, no object boundary.
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qvec"), col("nvec")).as("cosine"))
      .where(!isnan(col("cosine")))
    topKPerQuery(scored, k)
  }

  /** DuckDB mirror of [[lshTopKMultiProbe]]: the single-probe oracle's
    * CTEs plus the Hamming-1 probe fan-out. */
  private[graft] def lshMultiProbeOracle(dim: Int, k: Int, nBits: Int,
      tables: Int, seed: Long): String = {
    def planeList(p: Array[Long]) = p.mkString("[", ", ", "]")
    val tableSelects = (0 until tables).map { t =>
      val planes = quantizedPlanes(dim, nBits, seed + t * 7919)
      val bits = (0 until nBits).map { i =>
        s"""(CASE WHEN (SELECT SUM(v[j] * (${planeList(planes(i))})[j])
           |            FROM UNNEST(range(1, ${dim + 1})) u(j)) >= 0
           |      THEN ${1L << i} ELSE 0 END)""".stripMargin
      }.mkString(" + ")
      s"SELECT id, $t AS tbl, ($bits) AS bucket FROM q"
    }.mkString("\nUNION ALL\n")
    val flips = (Seq("bucket") ++
      (0 until nBits).map(i => s"xor(bucket, ${1L << i})")).mkString(", ")
    s"""WITH q AS (SELECT vec_id AS id, list_transform(embedding,
       |             x -> FLOOR(CAST(x AS DOUBLE) * CAST(10000.0 AS DOUBLE))) AS v
       |           FROM embeddings),
       |n AS (SELECT id, (SELECT SUM(x*x) FROM UNNEST(v) t(x)) AS nrm FROM q),
       |b AS (
       |$tableSelects),
       |probes AS (SELECT id, tbl, UNNEST([$flips]) AS bucket FROM b),
       |cand AS (SELECT DISTINCT p.id AS query_id, bb.id AS neighbor_id
       |         FROM probes p JOIN b bb
       |           ON p.tbl = bb.tbl AND p.bucket = bb.bucket AND p.id <> bb.id),
       |scored AS (SELECT c.query_id, c.neighbor_id,
       |             (SELECT SUM(qq.v[i] * nv.v[i])
       |              FROM UNNEST(range(1, ${dim + 1})) t(i)) /
       |               SQRT(nq.nrm * nn.nrm) AS cosine
       |           FROM cand c
       |           JOIN q qq ON qq.id = c.query_id
       |           JOIN q nv ON nv.id = c.neighbor_id
       |           JOIN n nq ON nq.id = c.query_id
       |           JOIN n nn ON nn.id = c.neighbor_id),
       |ranked AS (SELECT query_id, neighbor_id, cosine,
       |             ROW_NUMBER() OVER (PARTITION BY query_id
       |               ORDER BY cosine DESC, neighbor_id ASC) AS rank
       |           FROM scored)
       |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cosine
       |FROM ranked WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin
  }

  /** DuckDB mirror of [[lshTopKPortable]]: the per-table bucket CTE embeds
    * the same quantized-plane literals. `qSelect` must yield `(id, v)` with
    * `v` the ALREADY-QUANTIZED (integer-valued) vector — defaults to the
    * ×10000-quantized `embeddings` table; q_multimodal_ann passes the
    * md5-lane feature pipeline instead. */
  private[graft] def lshPortableOracle(dim: Int, k: Int, nBits: Int,
      tables: Int, seed: Long,
      qSelect: String = """SELECT vec_id AS id, list_transform(embedding,
        |             x -> FLOOR(CAST(x AS DOUBLE) * CAST(10000.0 AS DOUBLE))) AS v
        |           FROM embeddings""".stripMargin,
      queryIdLt: Option[Long] = None): String = {
    // queryIdLt mirrors the Spark side's `queryPred = col("id") < x`
    // (VERDICT r11 item 1): bounding the QUERY side of the candidate
    // join caps candidate volume at |queries|·tables·occupancy — linear
    // in N at fixed width — where the unbounded all-pairs form grows ~N²
    val qFilter = queryIdLt.map(x => s" AND a.id < $x").getOrElse("")
    def planeList(p: Array[Long]) = p.mkString("[", ", ", "]")
    val tableSelects = (0 until tables).map { t =>
      val planes = quantizedPlanes(dim, nBits, seed + t * 7919)
      val bits = (0 until nBits).map { i =>
        s"""(CASE WHEN (SELECT SUM(v[j] * (${planeList(planes(i))})[j])
           |            FROM UNNEST(range(1, ${dim + 1})) u(j)) >= 0
           |      THEN ${1L << i} ELSE 0 END)""".stripMargin
      }.mkString(" + ")
      s"SELECT id, $t AS tbl, ($bits) AS bucket FROM q"
    }.mkString("\nUNION ALL\n")
    s"""WITH q AS ($qSelect),
       |n AS (SELECT id, (SELECT SUM(x*x) FROM UNNEST(v) t(x)) AS nrm FROM q),
       |b AS (
       |$tableSelects),
       |cand AS (SELECT DISTINCT a.id AS query_id, bb.id AS neighbor_id
       |         FROM b a JOIN b bb
       |           ON a.tbl = bb.tbl AND a.bucket = bb.bucket AND a.id <> bb.id$qFilter),
       |scored AS (SELECT c.query_id, c.neighbor_id,
       |             (SELECT SUM(qq.v[i] * nv.v[i])
       |              FROM UNNEST(range(1, ${dim + 1})) t(i)) /
       |               SQRT(nq.nrm * nn.nrm) AS cosine
       |           FROM cand c
       |           JOIN q qq ON qq.id = c.query_id
       |           JOIN q nv ON nv.id = c.neighbor_id
       |           JOIN n nq ON nq.id = c.query_id
       |           JOIN n nn ON nn.id = c.neighbor_id),
       |ranked AS (SELECT query_id, neighbor_id, cosine,
       |             ROW_NUMBER() OVER (PARTITION BY query_id
       |               ORDER BY cosine DESC, neighbor_id ASC) AS rank
       |           FROM scored)
       |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cosine
       |FROM ranked WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin
  }

  /** Seeded init-pick for the portable IVF: which of the `sampleN`
    * id-ranked sample vectors seed each cell. Pure function of the seed —
    * shared by the Spark path and the literal list in the oracle SQL. */
  private[graft] def ivfInitIndices(sampleN: Int, nCells: Int,
      seed: Long): Vector[Int] =
    new scala.util.Random(seed).shuffle((0 until sampleN).toVector).take(nCells)

  /** Cross-engine-portable IVF ANN: every quantity — ×10000-quantized
    * vectors, integer squared distances, floor-of-mean centroid updates,
    * (dist, cell) argmin tiebreaks — is either exact integer math or a
    * single deterministic IEEE op, and the seeded Lloyd initialization is
    * embedded as literals, so the whole computation (3 Lloyd iterations on
    * the 200 smallest-id sample, cell assignment, nProbe probing, cosine
    * rerank) reproduces exactly in DuckDB SQL ([[ivfPortableOracle]]).
    * Approximate relative to brute force, deterministic in itself.
    */
  /** Quantized-Lloyd codebook on the sampleN smallest-id vectors of
    * `v` (columns (id, vec), vec already quantized) — the training step
    * shared by [[ivfTopKPortable]] and the incremental epoch freeze
    * ([[incrementalIvfTopKAuto]]). Gated driver-local: sampleN bounds
    * the collect. Every quantity is exact integer math or one
    * deterministic IEEE op (floor-of-mean), so the result reproduces in
    * the oracles' unrolled Lloyd CTEs. */
  private[graft] def trainIvfCodebookPortable(v: DataFrame, dim: Int,
      nCells: Int, kmeansIters: Int, sampleN: Int, seed: Long,
      strideInit: Boolean): Array[Array[Double]] = {
    val spark = v.sparkSession
    import spark.implicits._
    val sample = v.orderBy("id").limit(sampleN)
      .as[(Long, Array[Double])].collect().map(_._2)
    require(sample.length == sampleN,
      s"portable IVF needs exactly $sampleN sample vectors (got ${sample.length})")
    var centroids = (if (strideInit) strideInitIndices(sampleN, nCells)
                     else ivfInitIndices(sampleN, nCells, seed)).map(sample).toArray
    for (_ <- 0 until kmeansIters) {
      val sums = Array.fill(centroids.length)(new Array[Double](dim))
      val counts = Array.fill(centroids.length)(0L)
      sample.foreach { x =>
        val c = nearestCentroid(x, centroids) // strict < : smallest cell wins ties
        var i = 0; while (i < dim) { sums(c)(i) += x(i); i += 1 }
        counts(c) += 1
      }
      centroids = centroids.indices.map { c =>
        if (counts(c) == 0) centroids(c)
        else {
          val m = new Array[Double](dim); var i = 0
          // floor-of-mean: SQL FLOOR(SUM/COUNT) — floors negatives too,
          // unlike integer `/` truncation
          while (i < dim) { m(i) = math.floor(sums(c)(i) / counts(c)); i += 1 }
          m
        }
      }.toArray
    }
    centroids
  }

  def ivfTopKPortable(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      k: Int, nCells: Int = 16, nProbe: Int = 4, kmeansIters: Int = 3,
      sampleN: Int = 200, seed: Long = 42L,
      queryPred: Column = lit(true), strideInit: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // persisted: the quantized table feeds the centroid sample, the cell
    // assignment pass AND the probe pass — without it each scan re-reads
    // parquet and re-quantizes (r2's 4.4× regression)
    val v = df.select(col(idCol).cast("long").as("id"),
        quantize(col(vecCol)).as("vec"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val centroids = trainIvfCodebookPortable(v, dim, nCells, kmeansIters,
      sampleN, seed, strideInit)
    val bcCentroids = spark.sparkContext.broadcast(centroids)

    val vt = v.as[(Long, Array[Double])]
    val assigned = vt.mapPartitions { it =>
      val cs = bcCentroids.value
      it.map { case (id, vec) => (id, vec, nearestCentroid(vec, cs)) }
    }.toDF("id", "vec", "cell")
    // queryPred pushdown (audit queries probe a handful of ids; scoring
    // only them ≡ post-filtering — per-query top-k is independent)
    val probes = v.where(queryPred).as[(Long, Array[Double])]
      .mapPartitions { it =>
      val cs = bcCentroids.value
      it.flatMap { case (id, vec) =>
        cs.indices.map(c => (c, sqDist(vec, cs(c)))).sortBy { case (c, d) => (d, c) }
          .take(nProbe).map { case (c, _) => (id, vec, c) }
      }
    }.toDF("query_id", "qvec", "cell")

    // broadcast the assigned side: a shuffle join keyed on `cell` has only
    // nCells (16) distinct keys — at 32 cores half the cluster idles and
    // any hot cell serializes (r2 What's-wrong #2). The portable variant
    // caps the corpus at oracle scale, so the build side always fits; the
    // scale variant [[ivfTopK]] uses the salted join instead.
    // widen() the probe table before the broadcast join: it inherits the
    // scan's partitioning, and a small single-file input otherwise
    // funnels the ENTIRE nq·nProbe·|cell| scoring loop through one task.
    val pairs = widen(probes, "query_id").join(broadcast(assigned), "cell")
      .where(col("query_id") =!= col("id"))
      // r12 OPT: cosine via the codegen'd ArrayDot expression instead of
      // a typed mapPartitions closure — the object path paid Serialize/
      // DeserializeToObject per candidate row and blocked whole-stage
      // codegen through the scoring join. Each array_dot is an
      // index-order loop and the combine is qn*nn -> sqrt -> divide,
      // bit-identical to the fused closure (independent accumulators,
      // same order), so scores and tie orders are unchanged.
      .select(col("query_id"), col("id").as("neighbor_id"),
        cosine(col("qvec"), col("vec")).as("cosine"))
      .where(!isnan(col("cosine")))
    topKPerQuery(pairs, k)
  }

  /** DuckDB mirror of [[ivfTopKPortable]] on the `embeddings` table:
    * unrolled Lloyd iterations over long-format (cell, j, cv) centroid
    * CTEs, argmin assignment with (dist, cell) tiebreak, nProbe probing,
    * quantized-cosine rerank. */
  private[graft] def ivfPortableOracle(dim: Int, k: Int, nCells: Int,
      nProbe: Int, kmeansIters: Int, sampleN: Int, seed: Long,
      queryIdLt: Option[Long] = None): String = {
    // queryIdLt mirrors the Spark side's `queryPred` (VERDICT r11 item 1):
    // only the bounded query set probes cells, so probe-side cost is
    // |queries|·nProbe·occupancy — linear in N at fixed nCells — where
    // the all-queries form is quadratic
    val qFilter = queryIdLt.map(x => s" AND id < $x").getOrElse("")
    val init = ivfInitIndices(sampleN, nCells, seed)
    val initRows = init.zipWithIndex
      .map { case (rnIdx, cell) => s"($cell, ${rnIdx + 1})" }.mkString(", ")
    val iters = (1 to kmeansIters).map { i =>
      s"""d$i AS (SELECT s.rn, c.cell,
         |          SUM((s.x - c.cv) * (s.x - c.cv)) AS dist
         |        FROM sampu s JOIN c${i - 1} c ON c.j = s.j
         |        GROUP BY s.rn, c.cell),
         |a$i AS (SELECT rn, cell FROM (
         |          SELECT rn, cell,
         |                 ROW_NUMBER() OVER (PARTITION BY rn ORDER BY dist, cell) AS r
         |          FROM d$i) WHERE r = 1),
         |c$i AS (SELECT p.cell, p.j, COALESCE(u.val, p.cv) AS cv
         |        FROM c${i - 1} p LEFT JOIN (
         |          SELECT a.cell, s.j, FLOOR(SUM(s.x) / COUNT(*)) AS val
         |          FROM a$i a JOIN sampu s ON s.rn = a.rn
         |          GROUP BY a.cell, s.j) u
         |        ON u.cell = p.cell AND u.j = p.j)""".stripMargin
    }.mkString(",\n")
    s"""WITH q AS (SELECT vec_id AS id, list_transform(embedding,
       |             x -> FLOOR(CAST(x AS DOUBLE) * CAST(10000.0 AS DOUBLE))) AS v
       |           FROM embeddings),
       |samp AS (SELECT id, v, ROW_NUMBER() OVER (ORDER BY id) AS rn
       |         FROM (SELECT id, v FROM q ORDER BY id LIMIT $sampleN)),
       |sampu AS (SELECT rn, j, v[j] AS x
       |          FROM samp, UNNEST(range(1, ${dim + 1})) t(j)),
       |c0 AS (SELECT m.cell, s.j, s.x AS cv
       |       FROM (VALUES $initRows) m(cell, rn) JOIN sampu s ON s.rn = m.rn),
       |$iters,
       |qu AS (SELECT id, j, v[j] AS x FROM q, UNNEST(range(1, ${dim + 1})) t(j)),
       |dall AS (SELECT u.id, c.cell, SUM((u.x - c.cv) * (u.x - c.cv)) AS dist
       |         FROM qu u JOIN c$kmeansIters c ON c.j = u.j
       |         GROUP BY u.id, c.cell),
       |rankedcells AS (SELECT id, cell,
       |                  ROW_NUMBER() OVER (PARTITION BY id ORDER BY dist, cell) AS r
       |                FROM dall),
       |assign AS (SELECT id, cell FROM rankedcells WHERE r = 1),
       |probe AS (SELECT id, cell FROM rankedcells WHERE r <= $nProbe$qFilter),
       |n AS (SELECT id, (SELECT SUM(x*x) FROM UNNEST(v) t(x)) AS nrm FROM q),
       |cand AS (SELECT p.id AS query_id, a.id AS neighbor_id
       |         FROM probe p JOIN assign a ON a.cell = p.cell AND a.id <> p.id),
       |scored AS (SELECT c.query_id, c.neighbor_id,
       |             (SELECT SUM(qq.v[i] * nv.v[i])
       |              FROM UNNEST(range(1, ${dim + 1})) t(i)) /
       |               SQRT(nq.nrm * nn.nrm) AS cosine
       |           FROM cand c
       |           JOIN q qq ON qq.id = c.query_id
       |           JOIN q nv ON nv.id = c.neighbor_id
       |           JOIN n nq ON nq.id = c.query_id
       |           JOIN n nn ON nn.id = c.neighbor_id),
       |ranked AS (SELECT query_id, neighbor_id, cosine,
       |             ROW_NUMBER() OVER (PARTITION BY query_id
       |               ORDER BY cosine DESC, neighbor_id ASC) AS rank
       |           FROM scored)
       |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cosine
       |FROM ranked WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin
  }

  /** Cross-engine-portable product quantization (Jégou et al. 2011): the
    * vector splits into `m` subspaces; each subspace gets its own seeded
    * quantized-Lloyd codebook of `ksub` centroids (identical discipline to
    * [[ivfTopKPortable]]: ×10000 quantization, floor-of-mean updates,
    * (dist, cell) argmin tiebreaks, literal init). Every vector is encoded
    * as m small codes; queries take their `candR` nearest by ASYMMETRIC
    * distance (per-query table LUT[s][cell] = ∥q_s − c_{s,cell}∥², all
    * integer; neighbor ≈ Σ_s LUT[s][code_s]) and then rerank those
    * candidates by exact cosine — the standard compressed-candidates +
    * exact-rerank topology (codes are m small ints/vector; raw vectors are
    * touched only for the candR candidates per query). Vectors are
    * unit-normalized on the integer grid first ([[unitize]]) so ADC's L2
    * agrees with the cosine the exact operators rank by; on
    * distance-concentrated random data ADC alone scrambles top-k (measured
    * 0.08 recall) while rerank restores it (0.88 at candR=50). The 100 TB
    * composition is IVF cells + PQ codes per cell with a distributed
    * rerank join; at oracle scale the candidate scan is exhaustive like
    * [[bruteForceTopK]]. Returns (query_id, rank, neighbor_id, cosine).
    */
  /** Unit-normalize a ×10000-quantized vector back onto a ×10000 integer
    * grid: nrm = sqrt(Σ qv²) (an exact integer sum, then ONE IEEE sqrt),
    * each element floor((qv·10000)/nrm). Deterministic and
    * order-independent, so it reproduces in SQL — and it makes PQ's L2
    * asymmetric distance rank like cosine (‖q−n‖² = 2−2·cos on unit
    * vectors), which is what the exact operators rank by. */
  private[graft] def unitize(vec: Array[Double]): Array[Double] = {
    var ss = 0.0; var i = 0
    while (i < vec.length) { ss += vec(i) * vec(i); i += 1 }
    if (ss == 0.0) vec
    else {
      val nrm = math.sqrt(ss)
      val out = new Array[Double](vec.length)
      i = 0
      while (i < vec.length) { out(i) = math.floor((vec(i) * 10000.0) / nrm); i += 1 }
      out
    }
  }

  /** GATE CALIBRATION (r10 full-gate probe, tools/scale_probe_r10.jsonl):
    * maxBroadcastCodes = 2M ≈ 130 MB of m=16 int codes — the loud bound
    * of THIS exhaustive-ADC form. q_ann_pq measured ~30× at 16× data
    * (nq × N scan, quadratic by design below the cap); the composed
    * [[ivfPqTopKPortable]] measured ~10× on identical data and
    * [[ivfPqTopKAuto]] is the deployable sizing, so the cap stays a
    * hard stop that names the replacement rather than a knob to raise. */
  def pqTopKPortable(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      k: Int, m: Int = 16, ksub: Int = 16, candR: Int = 50,
      kmeansIters: Int = 2, sampleN: Int = 200, seed: Long = 42L,
      maxBroadcastCodes: Int = 2_000_000,
      queryPred: Column = lit(true)): DataFrame = {
    require(candR >= k, s"candR=$candR must be >= k=$k")
    require(dim % m == 0, s"dim $dim must divide into m=$m subspaces")
    val subDim = dim / m
    val spark = df.sparkSession
    import spark.implicits._
    val v = df.select(col(idCol).cast("long").as("id"),
        quantize(col(vecCol)).as("vec"))
      .as[(Long, Array[Double])]
      .mapPartitions(_.map { case (id, vec) => (id, unitize(vec)) })
      .toDF("id", "vec")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val sample = v.orderBy("id").limit(sampleN)
      .as[(Long, Array[Double])].collect().map(_._2)
    require(sample.length == sampleN,
      s"portable PQ needs exactly $sampleN sample vectors (got ${sample.length})")
    // per-subspace codebooks, each trained on the sample's subvectors with
    // its own seeded init (seed + s) — all integer-exact operations
    val books: Array[Array[Array[Double]]] = Array.tabulate(m) { s =>
      val sub = sample.map(_.slice(s * subDim, (s + 1) * subDim))
      var cs = ivfInitIndices(sampleN, ksub, seed + s).map(sub).toArray
      for (_ <- 0 until kmeansIters) {
        val sums = Array.fill(cs.length)(new Array[Double](subDim))
        val counts = Array.fill(cs.length)(0L)
        sub.foreach { x =>
          val c = nearestCentroid(x, cs)
          var i = 0; while (i < subDim) { sums(c)(i) += x(i); i += 1 }
          counts(c) += 1
        }
        cs = cs.indices.map { c =>
          if (counts(c) == 0) cs(c)
          else {
            val mn = new Array[Double](subDim); var i = 0
            while (i < subDim) { mn(i) = math.floor(sums(c)(i) / counts(c)); i += 1 }
            mn
          }
        }.toArray
      }
      cs
    }
    val bcBooks = spark.sparkContext.broadcast(books)

    // distributed encoding, then the (tiny: m ints/vector) code table is
    // broadcast for the ADC scan — gated like collectVectors
    val encoded = v.as[(Long, Array[Double])].mapPartitions { it =>
      val bk = bcBooks.value
      it.map { case (id, vec) =>
        (id, Array.tabulate(m)(s =>
          nearestCentroid(vec.slice(s * subDim, (s + 1) * subDim), bk(s))))
      }
    }
    val codes = encoded.limit(maxBroadcastCodes + 1).collect()
    require(codes.length <= maxBroadcastCodes,
      s"PQ code table exceeds maxBroadcastCodes=$maxBroadcastCodes; " +
        "use ivfPqTopKPortable (IVF-PQ) — ADC over probed cells only, " +
        "no broadcast code table, no exhaustive scan")
    val bcCodes = spark.sparkContext.broadcast(codes)

    // widen() the query side first: the scan-shaped Dataset otherwise
    // runs the whole nq×N ADC loop in one task on single-file inputs;
    // queryPred pushdown — audits score only the ids they grade
    val candidates = widen(v.where(queryPred), "id").as[(Long, Array[Double])]
      .mapPartitions { it =>
      val bk = bcBooks.value
      val cds = bcCodes.value
      it.flatMap { case (qid, qv) =>
        val lut = Array.tabulate(m, ksub) { (s, c) =>
          var d = 0.0; var i = 0
          val off = s * subDim
          val cv = bk(s)(c)
          while (i < subDim) {
            val diff = qv(off + i) - cv(i); d += diff * diff; i += 1
          }
          d
        }
        val scored = cds.iterator
          .filter(_._1 != qid)
          .map { case (nid, code) =>
            var d = 0.0; var s = 0
            while (s < m) { d += lut(s)(code(s)); s += 1 }
            (nid, d)
          }.toArray
        scored.sortBy { case (nid, d) => (d, nid) }.take(candR)
          .map { case (nid, _) => (qid, nid) }
      }
    }.toDF("query_id", "neighbor_id")

    // exact-cosine rerank of the candR candidates per query — the same
    // distributed join + tight-loop scoring shape as ivfTopKPortable
    val pairs = candidates
      .join(v.select($"id".as("query_id"), $"vec".as("qvec")), "query_id")
      .join(v.select($"id".as("neighbor_id"), $"vec".as("nvec")), "neighbor_id")
      // r12 OPT: codegen ArrayDot cosine, not a typed closure (see the
      // IVF multi-probe site) — bit-identical scores, no object boundary.
      .select($"query_id", $"neighbor_id",
        cosine($"qvec", $"nvec").as("cosine"))
      .where(!isnan(col("cosine")))
    topKPerQuery(pairs, k)
  }

  /** DuckDB mirror of [[pqTopKPortable]] on the `embeddings` table: one
    * long-format CTE chain handles all subspaces at once — centroids as
    * (s, cell, j, cv) rows, the per-query distance table doubles as the
    * code assignment (its per-(id, s) argmin), and the ADC sum is a join
    * on (s, cell) between the LUT and the code table. */
  private[graft] def pqPortableOracle(dim: Int, k: Int, m: Int, ksub: Int,
      candR: Int, kmeansIters: Int, sampleN: Int, seed: Long): String = {
    val subDim = dim / m
    val initRows = (0 until m).flatMap { s =>
      ivfInitIndices(sampleN, ksub, seed + s).zipWithIndex
        .map { case (rnIdx, cell) => s"($s, $cell, ${rnIdx + 1})" }
    }.mkString(", ")
    val iters = (1 to kmeansIters).map { i =>
      s"""d$i AS (SELECT u.rn, c.s, c.cell,
         |          SUM((u.x - c.cv) * (u.x - c.cv)) AS dist
         |        FROM sampu u JOIN c${i - 1} c ON c.j = u.j
         |        GROUP BY u.rn, c.s, c.cell),
         |a$i AS (SELECT rn, s, cell FROM (
         |          SELECT rn, s, cell,
         |                 ROW_NUMBER() OVER (PARTITION BY rn, s ORDER BY dist, cell) AS r
         |          FROM d$i) WHERE r = 1),
         |c$i AS (SELECT p.s, p.cell, p.j, COALESCE(u2.val, p.cv) AS cv
         |        FROM c${i - 1} p LEFT JOIN (
         |          SELECT a.s, a.cell, u.j, FLOOR(SUM(u.x) / COUNT(*)) AS val
         |          FROM a$i a JOIN sampu u ON u.rn = a.rn AND u.s = a.s
         |          GROUP BY a.s, a.cell, u.j) u2
         |        ON u2.s = p.s AND u2.cell = p.cell AND u2.j = p.j)""".stripMargin
    }.mkString(",\n")
    s"""WITH q0 AS (SELECT vec_id AS id, list_transform(embedding,
       |             x -> FLOOR(CAST(x AS DOUBLE) * CAST(10000.0 AS DOUBLE))) AS v0
       |           FROM embeddings),
       |nrm AS (SELECT id, SQRT((SELECT SUM(x * x) FROM UNNEST(v0) t(x))) AS nr
       |        FROM q0),
       |q AS (SELECT q0.id, CASE WHEN n.nr = 0 THEN q0.v0
       |        ELSE list_transform(q0.v0,
       |          x -> FLOOR((x * CAST(10000.0 AS DOUBLE)) / n.nr)) END AS v
       |      FROM q0 JOIN nrm n ON n.id = q0.id),
       |samp AS (SELECT id, v, ROW_NUMBER() OVER (ORDER BY id) AS rn
       |         FROM (SELECT id, v FROM q ORDER BY id LIMIT $sampleN)),
       |sampu AS (SELECT rn, j, CAST((j - 1) // $subDim AS INT) AS s, v[j] AS x
       |          FROM samp, UNNEST(range(1, ${dim + 1})) t(j)),
       |c0 AS (SELECT i.s, i.cell, u.j, u.x AS cv
       |       FROM (VALUES $initRows) i(s, cell, rn)
       |       JOIN sampu u ON u.rn = i.rn AND u.s = i.s),
       |$iters,
       |qu AS (SELECT id, j, CAST((j - 1) // $subDim AS INT) AS s, v[j] AS x
       |       FROM q, UNNEST(range(1, ${dim + 1})) t(j)),
       |lut AS (SELECT u.id, c.s, c.cell,
       |          SUM((u.x - c.cv) * (u.x - c.cv)) AS dist
       |        FROM qu u JOIN c$kmeansIters c ON c.j = u.j
       |        GROUP BY u.id, c.s, c.cell),
       |codes AS (SELECT id, s, cell FROM (
       |            SELECT id, s, cell,
       |                   ROW_NUMBER() OVER (PARTITION BY id, s ORDER BY dist, cell) AS r
       |            FROM lut) WHERE r = 1),
       |adc AS (SELECT l.id AS query_id, cd.id AS neighbor_id,
       |          SUM(l.dist) AS qdist
       |        FROM lut l JOIN codes cd ON cd.s = l.s AND cd.cell = l.cell
       |          AND cd.id <> l.id
       |        GROUP BY l.id, cd.id),
       |cand AS (SELECT query_id, neighbor_id FROM (
       |           SELECT query_id, neighbor_id,
       |                  ROW_NUMBER() OVER (PARTITION BY query_id
       |                    ORDER BY qdist ASC, neighbor_id ASC) AS r
       |           FROM adc) WHERE r <= $candR),
       |n AS (SELECT id, (SELECT SUM(x * x) FROM UNNEST(v) t(x)) AS nrm FROM q),
       |scored AS (SELECT c.query_id, c.neighbor_id,
       |             (SELECT SUM(qq.v[i] * nv.v[i])
       |              FROM UNNEST(range(1, ${dim + 1})) t(i)) /
       |               SQRT(nq.nrm * nn.nrm) AS cosine
       |           FROM cand c
       |           JOIN q qq ON qq.id = c.query_id
       |           JOIN q nv ON nv.id = c.neighbor_id
       |           JOIN n nq ON nq.id = c.query_id
       |           JOIN n nn ON nn.id = c.neighbor_id),
       |ranked AS (SELECT query_id, neighbor_id, cosine,
       |             ROW_NUMBER() OVER (PARTITION BY query_id
       |               ORDER BY cosine DESC, neighbor_id ASC) AS rank
       |           FROM scored)
       |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cosine
       |FROM ranked WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin
  }

  /** IVF-PQ (IVFADC, Jégou et al. 2011) — the composed form both parents
    * promise: [[ivfTopKPortable]]'s coarse inverted file restricts which
    * codes a query ever scores, and [[pqTopKPortable]]'s product codes are
    * what it scores them WITH. Per-subspace codebooks train on the
    * sample's coarse-cell RESIDUALS (x − centroid(x)), queries probe their
    * `nProbe` nearest cells and rank that subset by asymmetric distance
    * (per-(query, cell) LUT over the residual basis), and the global
    * top-`candR` candidates rerank by exact cosine.
    *
    * This is PQ's sub-quadratic scale path (the fix for the exhaustive
    * [[pqTopKPortable]] scan): ADC work per query is the PROBED CELLS'
    * population, not the corpus — at fixed cell occupancy (cells grown
    * with the corpus, the standard IVF sizing) per-query cost is flat.
    * The distributed shape is a cogroup on `cell`: probing queries
    * materialize (one LUT each, m·ksub doubles), the cell's codes STREAM
    * through a bounded per-query top-candR heap, and only (query,
    * neighbor, adc) survivors shuffle — raw vectors are touched again
    * only for the candR rerank joins. Parallelism is bounded by nCells
    * (the knob to raise at scale, like ivfTopKPortable's note).
    *
    * Portability discipline is the parents' exactly: ×10000 quantization,
    * [[unitize]] to the unit grid (ADC L2 ranks like the cosine the exact
    * operators rank by), floor-of-mean Lloyd with literal seeded init,
    * (dist, cell) argmin tiebreaks, integer-exact distances (residual
    * components ≤ 2·10⁴, so Σ over dim ≤ ~2.6·10¹⁰ ≪ 2^53), candidate
    * cut by ROW_NUMBER-equivalent (adc asc, id asc). Whole computation
    * reproduces in DuckDB ([[ivfPqPortableOracle]]).
    * Returns (query_id, rank, neighbor_id, cosine). */
  def ivfPqTopKPortable(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, k: Int, nCells: Int = 16, nProbe: Int = 4, m: Int = 8,
      ksub: Int = 16, candR: Int = 50, kmeansIters: Int = 2,
      sampleN: Int = 200, seed: Long = 42L,
      queryPred: Column = lit(true), strideInit: Boolean = false): DataFrame = {
    require(candR >= k, s"candR=$candR must be >= k=$k")
    require(dim % m == 0, s"dim $dim must divide into m=$m subspaces")
    require(nProbe >= 1 && nProbe <= nCells,
      s"nProbe=$nProbe must be in [1, nCells=$nCells]")
    require(nCells <= sampleN && ksub <= sampleN,
      s"codebooks need nCells=$nCells and ksub=$ksub <= sampleN=$sampleN")
    val subDim = dim / m
    val spark = df.sparkSession
    import spark.implicits._
    val v = df.select(col(idCol).cast("long").as("id"),
        quantize(col(vecCol)).as("vec"))
      .as[(Long, Array[Double])]
      .mapPartitions(_.map { case (id, vec) => (id, unitize(vec)) })
      .toDF("id", "vec")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val sample = v.orderBy("id").limit(sampleN)
      .as[(Long, Array[Double])].collect().map(_._2)
    require(sample.length == sampleN,
      s"portable IVF-PQ needs exactly $sampleN sample vectors (got ${sample.length})")
    def lloyd(pts: Array[Array[Double]], nC: Int, sd: Long): Array[Array[Double]] = {
      val d = pts.head.length
      var cs = (if (strideInit) strideInitIndices(pts.length, nC)
                else ivfInitIndices(pts.length, nC, sd)).map(pts).toArray
      for (_ <- 0 until kmeansIters) {
        val sums = Array.fill(cs.length)(new Array[Double](d))
        val counts = Array.fill(cs.length)(0L)
        pts.foreach { x =>
          val c = nearestCentroid(x, cs)
          var i = 0; while (i < d) { sums(c)(i) += x(i); i += 1 }
          counts(c) += 1
        }
        cs = cs.indices.map { c =>
          if (counts(c) == 0) cs(c)
          else {
            val mn = new Array[Double](d); var i = 0
            while (i < d) { mn(i) = math.floor(sums(c)(i) / counts(c)); i += 1 }
            mn
          }
        }.toArray
      }
      cs
    }
    val coarse = lloyd(sample, nCells, seed)
    // PQ codebooks on the sample's residuals w.r.t. the FINAL coarse cells
    val residuals = sample.map { x =>
      val c = nearestCentroid(x, coarse)
      val r = new Array[Double](dim); var i = 0
      while (i < dim) { r(i) = x(i) - coarse(c)(i); i += 1 }
      r
    }
    val books: Array[Array[Array[Double]]] = Array.tabulate(m) { s =>
      lloyd(residuals.map(_.slice(s * subDim, (s + 1) * subDim)), ksub, seed + s)
    }
    val bcCoarse = spark.sparkContext.broadcast(coarse)
    val bcBooks = spark.sparkContext.broadcast(books)

    // inverted file: (cell, id, residual code) — m small ints per vector
    val codes = v.as[(Long, Array[Double])].mapPartitions { it =>
      val cc = bcCoarse.value; val bk = bcBooks.value
      it.map { case (id, vec) =>
        val c = nearestCentroid(vec, cc)
        val code = Array.tabulate(m) { s =>
          val off = s * subDim
          val r = new Array[Double](subDim); var i = 0
          while (i < subDim) { r(i) = vec(off + i) - cc(c)(off + i); i += 1 }
          nearestCentroid(r, bk(s))
        }
        (c, id, code)
      }
    }
    // each query probes its nProbe nearest coarse cells by (dist, cell);
    // queryPred pushdown for the audit form (per-query independence)
    val probes = v.where(queryPred).as[(Long, Array[Double])]
      .mapPartitions { it =>
      val cc = bcCoarse.value
      it.flatMap { case (id, vec) =>
        cc.indices.map(c => (c, sqDist(vec, cc(c))))
          .sortBy { case (c, d) => (d, c) }
          .take(nProbe).map { case (c, _) => (c, id, vec) }
      }
    }
    val adcOrd = Ordering.Tuple2[Double, Long]
    val perCell = probes.groupByKey(_._1).cogroup(codes.groupByKey(_._1)) {
      (cell, qit, cit) =>
        val qs = qit.toArray
        if (qs.isEmpty) Iterator.empty
        else {
          val cc = bcCoarse.value; val bk = bcBooks.value
          // one LUT per probing query on THIS cell's residual basis:
          // LUT(s)(c) = ||(q − coarse_cell)_s − book_s(c)||²
          val st = qs.map { case (_, qid, qv) =>
            val lut = Array.tabulate(m, ksub) { (s, c2) =>
              var d = 0.0; var i = 0; val off = s * subDim
              val cv = bk(s)(c2); val ccv = cc(cell)
              while (i < subDim) {
                val diff = (qv(off + i) - ccv(off + i)) - cv(i)
                d += diff * diff; i += 1
              }
              d
            }
            // max-heap on (adc, id): head = current worst of the best candR
            (qid, lut, scala.collection.mutable.PriorityQueue.empty[(Double, Long)](adcOrd))
          }
          cit.foreach { case (_, nid, code) =>
            var qi = 0
            while (qi < st.length) {
              val (qid, lut, heap) = st(qi)
              if (nid != qid) {
                var d = 0.0; var s = 0
                while (s < m) { d += lut(s)(code(s)); s += 1 }
                if (heap.size < candR) heap.enqueue((d, nid))
                else if (adcOrd.lt((d, nid), heap.head)) {
                  heap.dequeue(); heap.enqueue((d, nid))
                }
              }
              qi += 1
            }
          }
          st.iterator.flatMap { case (qid, _, heap) =>
            heap.iterator.map { case (d, nid) => (qid, nid, d) }
          }
        }
    }.toDF("query_id", "neighbor_id", "adc")
    // global top-candR per query by (adc asc, id asc): k-slot aggregate
    // over the ≤ nProbe·candR per-cell survivors — ≡ the oracle's
    // ROW_NUMBER cut (adc is integer-valued, exact in double)
    val cand = perCell.groupBy($"query_id")
      .agg(graft.functions.TopKByAgg.top_k_by(
        lit(0d) - $"adc", $"neighbor_id", candR).as("arr"))
      .select($"query_id", explode($"arr").as("e"))
      .select($"query_id", $"e.neighbor_id".as("neighbor_id"))
    // exact-cosine rerank of the candidates — pqTopKPortable's shape
    val pairs = cand
      .join(v.select($"id".as("query_id"), $"vec".as("qvec")), "query_id")
      .join(v.select($"id".as("neighbor_id"), $"vec".as("nvec")), "neighbor_id")
      // r12 OPT: codegen ArrayDot cosine, not a typed closure (see the
      // IVF multi-probe site) — bit-identical scores, no object boundary.
      .select($"query_id", $"neighbor_id",
        cosine($"qvec", $"nvec").as("cosine"))
      .where(!isnan(col("cosine")))
    topKPerQuery(pairs, k)
  }

  /** DuckDB mirror of [[ivfPqTopKPortable]] on the `embeddings` table:
    * the coarse Lloyd chain (g-prefixed CTEs) feeds a sample-residual
    * table on which the long-format PQ chain (p-prefixed, (s, cell, j)
    * rows) trains; corpus cells/codes are the two argmins, the per-
    * (query, probed-cell) LUT is one grouped join on the residual basis,
    * and ADC is the LUT × neighbor-code join summed over subspaces. */
  private[graft] def ivfPqPortableOracle(dim: Int, k: Int, nCells: Int,
      nProbe: Int, m: Int, ksub: Int, candR: Int, kmeansIters: Int,
      sampleN: Int, seed: Long): String = {
    val subDim = dim / m
    val coarseInit = ivfInitIndices(sampleN, nCells, seed).zipWithIndex
      .map { case (rnIdx, cell) => s"($cell, ${rnIdx + 1})" }.mkString(", ")
    val pqInit = (0 until m).flatMap { s =>
      ivfInitIndices(sampleN, ksub, seed + s).zipWithIndex
        .map { case (rnIdx, cell) => s"($s, $cell, ${rnIdx + 1})" }
    }.mkString(", ")
    val coarseIters = (1 to kmeansIters).map { i =>
      s"""gd$i AS (SELECT u.rn, c.cell,
         |           SUM((u.x - c.cv) * (u.x - c.cv)) AS dist
         |         FROM sampu u JOIN g${i - 1} c ON c.j = u.j
         |         GROUP BY u.rn, c.cell),
         |ga$i AS (SELECT rn, cell FROM (
         |           SELECT rn, cell,
         |                  ROW_NUMBER() OVER (PARTITION BY rn ORDER BY dist, cell) AS r
         |           FROM gd$i) WHERE r = 1),
         |g$i AS (SELECT p.cell, p.j, COALESCE(u2.val, p.cv) AS cv
         |        FROM g${i - 1} p LEFT JOIN (
         |          SELECT a.cell, u.j, FLOOR(SUM(u.x) / COUNT(*)) AS val
         |          FROM ga$i a JOIN sampu u ON u.rn = a.rn
         |          GROUP BY a.cell, u.j) u2
         |        ON u2.cell = p.cell AND u2.j = p.j)""".stripMargin
    }.mkString(",\n")
    val pqIters = (1 to kmeansIters).map { i =>
      s"""pd$i AS (SELECT u.rn, c.s, c.cell,
         |           SUM((u.x - c.cv) * (u.x - c.cv)) AS dist
         |         FROM sres u JOIN p${i - 1} c ON c.j = u.j AND c.s = u.s
         |         GROUP BY u.rn, c.s, c.cell),
         |pa$i AS (SELECT rn, s, cell FROM (
         |           SELECT rn, s, cell,
         |                  ROW_NUMBER() OVER (PARTITION BY rn, s ORDER BY dist, cell) AS r
         |           FROM pd$i) WHERE r = 1),
         |p$i AS (SELECT p.s, p.cell, p.j, COALESCE(u2.val, p.cv) AS cv
         |        FROM p${i - 1} p LEFT JOIN (
         |          SELECT a.s, a.cell, u.j, FLOOR(SUM(u.x) / COUNT(*)) AS val
         |          FROM pa$i a JOIN sres u ON u.rn = a.rn AND u.s = a.s
         |          GROUP BY a.s, a.cell, u.j) u2
         |        ON u2.s = p.s AND u2.cell = p.cell AND u2.j = p.j)""".stripMargin
    }.mkString(",\n")
    s"""WITH q0 AS (SELECT vec_id AS id, list_transform(embedding,
       |             x -> FLOOR(CAST(x AS DOUBLE) * CAST(10000.0 AS DOUBLE))) AS v0
       |           FROM embeddings),
       |nrm0 AS (SELECT id, SQRT((SELECT SUM(x * x) FROM UNNEST(v0) t(x))) AS nr
       |         FROM q0),
       |q AS (SELECT q0.id, CASE WHEN n.nr = 0 THEN q0.v0
       |        ELSE list_transform(q0.v0,
       |          x -> FLOOR((x * CAST(10000.0 AS DOUBLE)) / n.nr)) END AS v
       |      FROM q0 JOIN nrm0 n ON n.id = q0.id),
       |samp AS (SELECT id, v, ROW_NUMBER() OVER (ORDER BY id) AS rn
       |         FROM (SELECT id, v FROM q ORDER BY id LIMIT $sampleN)),
       |sampu AS (SELECT rn, j, v[j] AS x
       |          FROM samp, UNNEST(range(1, ${dim + 1})) t(j)),
       |g0 AS (SELECT i.cell, u.j, u.x AS cv
       |       FROM (VALUES $coarseInit) i(cell, rn) JOIN sampu u ON u.rn = i.rn),
       |$coarseIters,
       |sd AS (SELECT u.rn, c.cell, SUM((u.x - c.cv) * (u.x - c.cv)) AS dist
       |       FROM sampu u JOIN g$kmeansIters c ON c.j = u.j
       |       GROUP BY u.rn, c.cell),
       |sa AS (SELECT rn, cell FROM (
       |         SELECT rn, cell,
       |                ROW_NUMBER() OVER (PARTITION BY rn ORDER BY dist, cell) AS r
       |         FROM sd) WHERE r = 1),
       |sres AS (SELECT u.rn, u.j, CAST((u.j - 1) // $subDim AS INT) AS s,
       |           u.x - c.cv AS x
       |         FROM sampu u JOIN sa ON sa.rn = u.rn
       |         JOIN g$kmeansIters c ON c.cell = sa.cell AND c.j = u.j),
       |p0 AS (SELECT i.s, i.cell, r.j, r.x AS cv
       |       FROM (VALUES $pqInit) i(s, cell, rn)
       |       JOIN sres r ON r.rn = i.rn AND r.s = i.s),
       |$pqIters,
       |qu AS (SELECT id, j, v[j] AS x FROM q, UNNEST(range(1, ${dim + 1})) t(j)),
       |dall AS (SELECT u.id, c.cell, SUM((u.x - c.cv) * (u.x - c.cv)) AS dist
       |         FROM qu u JOIN g$kmeansIters c ON c.j = u.j
       |         GROUP BY u.id, c.cell),
       |rankedcells AS (SELECT id, cell,
       |                  ROW_NUMBER() OVER (PARTITION BY id ORDER BY dist, cell) AS r
       |                FROM dall),
       |assign AS (SELECT id, cell FROM rankedcells WHERE r = 1),
       |probe AS (SELECT id, cell FROM rankedcells WHERE r <= $nProbe),
       |qres AS (SELECT u.id, u.j, CAST((u.j - 1) // $subDim AS INT) AS s,
       |           u.x - c.cv AS x
       |         FROM qu u JOIN assign a ON a.id = u.id
       |         JOIN g$kmeansIters c ON c.cell = a.cell AND c.j = u.j),
       |pcd AS (SELECT r.id, b.s, b.cell,
       |          SUM((r.x - b.cv) * (r.x - b.cv)) AS dist
       |        FROM qres r JOIN p$kmeansIters b ON b.s = r.s AND b.j = r.j
       |        GROUP BY r.id, b.s, b.cell),
       |pcode AS (SELECT id, s, cell FROM (
       |            SELECT id, s, cell,
       |                   ROW_NUMBER() OVER (PARTITION BY id, s ORDER BY dist, cell) AS r
       |            FROM pcd) WHERE r = 1),
       |pru AS (SELECT u.id, p.cell AS pc, u.j,
       |          CAST((u.j - 1) // $subDim AS INT) AS s, u.x - c.cv AS x
       |        FROM qu u JOIN probe p ON p.id = u.id
       |        JOIN g$kmeansIters c ON c.cell = p.cell AND c.j = u.j),
       |lut AS (SELECT r.id, r.pc, b.s, b.cell,
       |          SUM((r.x - b.cv) * (r.x - b.cv)) AS dist
       |        FROM pru r JOIN p$kmeansIters b ON b.s = r.s AND b.j = r.j
       |        GROUP BY r.id, r.pc, b.s, b.cell),
       |adc AS (SELECT l.id AS query_id, nc.id AS neighbor_id,
       |          SUM(l.dist) AS adist
       |        FROM lut l
       |        JOIN assign na ON na.cell = l.pc AND na.id <> l.id
       |        JOIN pcode nc ON nc.id = na.id AND nc.s = l.s AND nc.cell = l.cell
       |        GROUP BY l.id, nc.id),
       |cand AS (SELECT query_id, neighbor_id FROM (
       |           SELECT query_id, neighbor_id,
       |                  ROW_NUMBER() OVER (PARTITION BY query_id
       |                    ORDER BY adist ASC, neighbor_id ASC) AS r
       |           FROM adc) WHERE r <= $candR),
       |n AS (SELECT id, (SELECT SUM(x * x) FROM UNNEST(v) t(x)) AS nrm FROM q),
       |scored AS (SELECT c.query_id, c.neighbor_id,
       |             (SELECT SUM(qq.v[i] * nv.v[i])
       |              FROM UNNEST(range(1, ${dim + 1})) t(i)) /
       |               SQRT(nq.nrm * nn.nrm) AS cosine
       |           FROM cand c
       |           JOIN q qq ON qq.id = c.query_id
       |           JOIN q nv ON nv.id = c.neighbor_id
       |           JOIN n nq ON nq.id = c.query_id
       |           JOIN n nn ON nn.id = c.neighbor_id),
       |ranked AS (SELECT query_id, neighbor_id, cosine,
       |             ROW_NUMBER() OVER (PARTITION BY query_id
       |               ORDER BY cosine DESC, neighbor_id ASC) AS rank
       |           FROM scored)
       |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cosine
       |FROM ranked WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin
  }

  private[graft] def nearestCentroid(x: Array[Double], cs: Array[Array[Double]]): Int = {
    var best = 0; var bestD = Double.MaxValue; var c = 0
    while (c < cs.length) {
      val d = sqDist(x, cs(c))
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  private[graft] def sqDist(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Random-hyperplane LSH bucket id per vector: `nBits` sign bits of
    * dot(vec, plane_i), planes drawn from a seeded RNG on the driver
    * (deterministic) and embedded as literals.
    */
  def hyperplaneLshBuckets(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, nBits: Int = 8, seed: Long = 42L): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val planes = Array.fill(nBits, dim)(rnd.nextGaussian())
    val bit = (i: Int) => {
      val plane = array(planes(i).map(lit): _*)
      val dot = graft.functions.ArrayDot.array_dot(col(vecCol), plane)
      when(dot >= 0, expr(s"CAST(1 AS BIGINT) << $i")).otherwise(lit(0L))
    }
    val bucket = (0 until nBits).map(bit).reduce(_.bitwiseOR(_))
    df.select(col(idCol).as("id"), col(vecCol).as("vec"), bucket.as("bucket"))
  }

  /** Approximate top-k via multi-table hyperplane LSH: `tables` independent
    * hash tables (different seeded hyperplane sets); candidate pairs share a
    * bucket in ANY table (union, deduped), then exact cosine rerank. More
    * tables → higher recall at proportional candidate cost — the standard
    * ANN trade-off; tests measure recall vs brute force. Vectors landing in
    * sparse buckets everywhere may return fewer than k neighbors.
    */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      k: Int, nBits: Int = 8, tables: Int = 4, seed: Long = 42L,
      maxBucketSize: Int = 1000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val v = widen(df.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("vec")), "id")
    // persist: the bucket table feeds both sides of the self-join, and the
    // hyperplane sign computation (interpreted higher-order exprs) is the
    // most expensive stage of the operator
    val bucketed = (0 until tables).map { t =>
      hyperplaneLshBuckets(v, "id", "vec", dim, nBits, seed + t * 7919)
        .select(col("id"), col("bucket"), lit(t).as("table"))
    }.reduce(_ union _)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val capped = Dedup.capHotBuckets(bucketed, Seq("table", "bucket"),
      maxBucketSize, "lshTopK")
    val candidates = capped.as("a").join(capped.as("b"),
        col("a.table") === col("b.table") &&
          col("a.bucket") === col("b.bucket") && col("a.id") =!= col("b.id"))
      .select(col("a.id").as("query_id"), col("b.id").as("neighbor_id"))
      .distinct()
    // rerank stays fully distributed: join the vectors onto the candidate
    // pairs and score in tight loops — no driver collect, so this path
    // really is the both-sides-huge scale path its docs claim
    val scored = candidates
      .join(v.select(col("id").as("query_id"), col("vec").as("qvec")), "query_id")
      .join(v.select(col("id").as("neighbor_id"), col("vec").as("nvec")), "neighbor_id")
      // r12 OPT: codegen ArrayDot cosine, not a typed closure (see the
      // IVF multi-probe site); the isnan filter still drops zero-norm
      // vectors, which would sort first under desc.
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qvec"), col("nvec")).as("cosine"))
      .where(!isnan(col("cosine")))
    topKPerQuery(scored, k)
  }

  /** Int8-style scalar quantization (SQ) codes — the smallest-memory
    * member of the index-compression family next to PQ: per-DIMENSION
    * global min/max over the (×10000 floor-quantized) corpus, each
    * component mapped to its 0..255 bucket by one exact integer
    * division, (v − min)·255 div (max − min). Constant dimensions code
    * to 0. The codes are exact integers, so an SQ index's ranking —
    * and its recall audit against exact brute force — joins the
    * hash-exact oracle surface.
    *
    * Ranking runs on the RECONSTRUCTED values, not the raw codes:
    * recon_i = mn_i·255 + code_i·(mx_i − mn_i), the dequantized
    * component at a global ×255 scale (cosine-invariant). Raw 0..255
    * codes are shift-distorted — cosine is not shift-invariant, so
    * code-space ranking scrambles clusters that reconstruction keeps
    * apart (spec-pinned).
    *
    * Shape: one posexplode + (dim)-row min/max aggregate (map-side
    * combined), a broadcast dim join, and a regroup — two shuffles of
    * component rows, nothing driver-side.
    *
    * Output: (idCol, codes array<long>, recon array<long>), original
    * component order.
    */
  def sqCodes(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val comp = df
      .select(col(idCol).as("__id"), quantize(col(vecCol)).as("__v"))
      .select(col("__id"), posexplode(col("__v")).as(Seq("pos", "x0")))
      .select(col("__id"), col("pos"), col("x0").cast("long").as("x"))
    val dims = comp.groupBy("pos")
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    comp.join(broadcast(dims), Seq("pos"))
      .withColumn("code",
        when(col("mx") > col("mn"),
          expr("((x - mn) * 255) div (mx - mn)")).otherwise(lit(0L)))
      .withColumn("recon",
        col("mn") * lit(255L) + col("code") * (col("mx") - col("mn")))
      .groupBy(col("__id"))
      .agg(sort_array(collect_list(
        struct(col("pos"), col("code"), col("recon")))).as("__a"))
      .select(col("__id").as(idCol),
        expr("transform(__a, s -> s.code)").as("codes"),
        expr("transform(__a, s -> s.recon)").as("recon"))
  }

  // ------------------------------------------------------------------
  // WIDTH-ADAPTIVE PORTABLE ANN (r11, VERDICT r10 item 1): the gate
  // previously pinned only the fixed-width portable forms, whose widths
  // are oracle literals and whose candidate volume therefore grows ~N²
  // (r10 full-gate probe: q_ann_lsh 92×, q_ann_ivf 101× at ×16). The
  // width-adaptive sizing rules (autoNBits / autoNCells) are pure
  // functions of the corpus size N, so the oracle can derive the SAME
  // width from COUNT(*) inside the SQL itself — these *AutoPortable
  // variants plus their *AutoOracle mirrors put the widths a 100 TB user
  // would actually run behind the hash-exact gate at ANY sf.
  // ------------------------------------------------------------------

  /** Deterministic SQL-expressible k-means seeding for the width-adaptive
    * portable IVF forms: cell c seeds from sample rank
    * floor(c·sampleN/nCells) — evenly spaced over the id-ranked sample.
    * [[ivfInitIndices]]'s seeded shuffle is a pure function of a FIXED
    * (sampleN, nCells), fine as oracle literals, but unwritable in SQL
    * once both depend on COUNT(*); the stride is one integer division,
    * identical in Scala and DuckDB. */
  private[graft] def strideInitIndices(sampleN: Int, nCells: Int): Vector[Int] =
    Vector.tabulate(nCells)(c => (c.toLong * sampleN / nCells).toInt)

  /** The width-adaptive sample size shared by the auto-portable IVF
    * forms: 8 vectors per cell, floored at the fixed portable forms' 200,
    * capped at the corpus (the portable paths collect the sample, and
    * `require(sample.length == sampleN)` must hold). */
  private[graft] def autoSampleN(n: Long, nCells: Int): Int =
    math.min(n, math.max(200L, 8L * nCells)).toInt

  /** Hard ceiling on the oracle's embedded plane literals: [[autoNBits]]
    * clamps to 40, but the auto ORACLE embeds `maxAutoNBits` plane rows
    * per table (prefix property of [[quantizedPlanes]]: row i is identical
    * for every nBits, so the oracle just uses the first nBits rows).
    * 16 bits covers corpora to targetOccupancy·2^16 ≈ 2M vectors at the
    * default occupancy — far past any oracle-checked scale; the Spark
    * side raises loudly rather than silently diverging beyond it. */
  private[graft] val maxAutoNBits = 16

  /** Width-adaptive portable LSH — [[lshTopKPortable]] with nBits derived
    * from the corpus size ([[autoNBits]]: expected bucket occupancy held
    * at `targetOccupancy`, so candidate volume stays ~N·occupancy·tables,
    * LINEAR in N where the fixed-width form is quadratic). Hash-exact
    * against [[lshAutoOracle]], which recomputes the same nBits from
    * COUNT(*) in SQL — the oracle is width-adaptive too, valid at any sf.
    */
  def lshTopKAutoPortable(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, k: Int, targetOccupancy: Int = 32, tables: Int = 4,
      seed: Long = 42L, maxBucketSize: Int = 1000,
      queryPred: Column = lit(true)): DataFrame = {
    require(targetOccupancy >= 1, "targetOccupancy must be >= 1")
    val nBits = autoNBits(df.count(), targetOccupancy)
    require(nBits <= maxAutoNBits,
      s"corpus needs nBits=$nBits > maxAutoNBits=$maxAutoNBits oracle plane " +
        "rows; raise Similarity.maxAutoNBits (regenerates the oracle) first")
    lshTopKPortable(df, idCol, vecCol, dim, k, nBits, tables, seed,
      maxBucketSize, queryPred)
  }

  /** Width-adaptive portable IVF — [[ivfTopKPortable]] with
    * nCells = ceil(√N) ([[autoNCells]]; assignment and probe passes both
    * N^1.5 instead of the fixed-width form's quadratic probe pass),
    * sampleN = [[autoSampleN]], stride init ([[strideInitIndices]] — the
    * SQL-expressible seeding). Hash-exact against [[ivfAutoOracle]]. */
  def ivfTopKAutoPortable(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, k: Int, nProbe: Int = 4, kmeansIters: Int = 3,
      queryPred: Column = lit(true)): DataFrame = {
    val n = df.count()
    val nCells = autoNCells(n)
    ivfTopKPortable(df, idCol, vecCol, dim, k, nCells, nProbe, kmeansIters,
      autoSampleN(n, nCells), seed = 0L, queryPred, strideInit = true)
  }

  /** Width-adaptive portable IVF-PQ — [[ivfPqTopKPortable]] (already the
    * fully distributed cogroup shape) at √N coarse cells with stride
    * init for BOTH codebook levels; per-cell occupancy ~√N keeps
    * assignment and ADC at N^1.5. Hash-exact against [[ivfPqAutoOracle]].
    */
  def ivfPqTopKAutoPortable(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, k: Int, nProbe: Int = 4, m: Int = 8, ksub: Int = 16,
      candR: Int = 50, kmeansIters: Int = 2,
      queryPred: Column = lit(true)): DataFrame = {
    val n = df.count()
    val nCells = autoNCells(n)
    ivfPqTopKPortable(df, idCol, vecCol, dim, k, nCells, nProbe, m, ksub,
      candR, kmeansIters, autoSampleN(n, nCells), seed = 0L, queryPred,
      strideInit = true)
  }

  // ------------------------------------------------------------------
  // INCREMENTAL IVF (r12, VERDICT r11 item 5) — the similarity twin of
  // Dedup.incrementalExact / incrementalMinHashPairs: a 100 TB pipeline
  // must NOT re-index the whole corpus per arriving batch. The codebook
  // is FROZEN per epoch (trained once on the epoch corpus); cell
  // assignments accumulate in a persisted LEDGER (id, vec, cell); each
  // batch only (a) assigns its own vectors under the frozen codebook —
  // one broadcast-codebook map over |batch| rows — and (b) queries its
  // vectors against the probed cells of ledger ∪ batch. Because
  // assignment is a pure per-vector function of the frozen centroids,
  //   incremental(ledger(A), B) ≡ full(A ∪ B, queries = B)
  // under the same codebook, EXACTLY (spec-pinned in IncrementalAnnSpec
  // and hash-exact-gated as q_ann_incremental).
  // ------------------------------------------------------------------

  /** Assign vectors to frozen-codebook cells — the ledger build/append
    * step. Pure per-vector map (broadcast centroids, no shuffle): rows
    * are (id, vec, cell) with vec the ×10000-quantized form, ready to
    * persist as the epoch's ledger and to union with later batches. */
  def ivfAssignLedger(df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(centroids)
    df.select(col(idCol).cast("long").as("id"),
        quantize(col(vecCol)).as("vec"))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val cs = bc.value
        it.map { case (id, vec) => (id, vec, nearestCentroid(vec, cs)) }
      }.toDF("id", "vec", "cell")
  }

  /** Query `batch` against `ledger ∪ batch` under a FROZEN codebook.
    * `ledger` is the persisted (id, vec, cell) table from
    * [[ivfAssignLedger]]; only the batch is assigned and probed here —
    * per-batch cost is |batch| · nProbe · occupancy, independent of how
    * many epochs the ledger has accumulated. Join shape follows
    * [[ivfTopKPortable]] (broadcast assigned side — the portable/gate
    * form; the salted-join [[ivfTopK]] shape is the >memory scale path).
    */
  def incrementalIvfTopK(ledger: DataFrame, batch: DataFrame,
      idCol: String, vecCol: String, dim: Int, k: Int, nProbe: Int,
      centroids: Array[Array[Double]]): DataFrame = {
    val spark = batch.sparkSession
    import spark.implicits._
    require(centroids.nonEmpty && centroids.forall(_.length == dim),
      s"codebook must be non-empty with dim-$dim centroids")
    val bc = spark.sparkContext.broadcast(centroids)
    val batchAssigned = ivfAssignLedger(batch, idCol, vecCol, centroids)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val all = ledger.select(col("id"), col("vec"), col("cell"))
      .union(batchAssigned)
    val probes = batchAssigned.select(col("id"), col("vec"))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val cs = bc.value
        it.flatMap { case (id, vec) =>
          cs.indices.map(c => (c, sqDist(vec, cs(c))))
            .sortBy { case (c, d) => (d, c) }
            .take(nProbe).map { case (c, _) => (id, vec, c) }
        }
      }.toDF("query_id", "qvec", "cell")
    val pairs = widen(probes, "query_id").join(broadcast(all), "cell")
      .where(col("query_id") =!= col("id"))
      // r12 OPT: cosine via the codegen'd ArrayDot expression instead of
      // a typed mapPartitions closure — the object path paid Serialize/
      // DeserializeToObject per candidate row and blocked whole-stage
      // codegen through the scoring join. Each array_dot is an
      // index-order loop and the combine is qn*nn -> sqrt -> divide,
      // bit-identical to the fused closure (independent accumulators,
      // same order), so scores and tie orders are unchanged.
      .select(col("query_id"), col("id").as("neighbor_id"),
        cosine(col("qvec"), col("vec")).as("cosine"))
      .where(!isnan(col("cosine")))
    topKPerQuery(pairs, k)
  }

  /** The gate composition: freeze a width-adaptive codebook on the epoch
    * corpus (√N_A cells, stride init — [[ivfTopKAutoPortable]]'s sizing,
    * derived from the EPOCH count, as a frozen codebook must be), build
    * its ledger, then run the incremental query for one arriving batch.
    * Oracle mirror: [[ivfAutoOracle]] with `incrementalTailN` — widths
    * from COUNT(*) − |tail| and probes restricted to the tail ids; the
    * two coincide exactly when the epoch corpus holds the sampleN
    * smallest ids (q_ann_incremental splits embeddings at N − 64, and
    * sampleN ≤ N_A there). */
  def incrementalIvfTopKAuto(epochCorpus: DataFrame, batch: DataFrame,
      idCol: String, vecCol: String, dim: Int, k: Int, nProbe: Int = 4,
      kmeansIters: Int = 3): DataFrame = {
    val nA = epochCorpus.count()
    val nCells = autoNCells(nA)
    val sampleN = autoSampleN(nA, nCells)
    val vA = epochCorpus.select(col(idCol).cast("long").as("id"),
        quantize(col(vecCol)).as("vec"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val centroids = trainIvfCodebookPortable(vA, dim, nCells, kmeansIters,
      sampleN, seed = 0L, strideInit = true)
    val spark = epochCorpus.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(centroids)
    val ledger = vA.as[(Long, Array[Double])]
      .mapPartitions { it =>
        val cs = bc.value
        it.map { case (id, vec) => (id, vec, nearestCentroid(vec, cs)) }
      }.toDF("id", "vec", "cell")
    incrementalIvfTopK(ledger, batch, idCol, vecCol, dim, k, nProbe,
      centroids)
  }

  /** IVF index-health audit (r12) — the re-freeze signal the incremental
    * family needs: a frozen epoch codebook serves arriving batches well
    * only while the corpus still matches the epoch's distribution. This
    * audit assigns the CURRENT corpus under the width-adaptive codebook
    * and reports per-cell occupancy — every cell 0..nCells−1, including
    * DEAD cells (occupancy 0, wasted probe width) — plus a `hot` flag
    * where occupancy exceeds 8× the design occupancy (n div nCells ≈ √N
    * at auto sizing): hot cells mean probe cost concentrates and the
    * epoch should re-freeze at the current corpus width. All integer
    * arithmetic; the oracle ([[ivfCellStatsOracle]]) reuses the auto
    * oracle's assignment CTE chain verbatim, so the audit is hash-exact
    * at any sf. Output: (cell, n_vecs, hot) ordered by cell. */
  def ivfCellStatsAuto(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, kmeansIters: Int = 3): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val n = df.count()
    val nCells = autoNCells(n)
    val sampleN = autoSampleN(n, nCells)
    val vA = df.select(col(idCol).cast("long").as("id"),
        quantize(col(vecCol)).as("vec"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val centroids = trainIvfCodebookPortable(vA, dim, nCells, kmeansIters,
      sampleN, seed = 0L, strideInit = true)
    val bc = spark.sparkContext.broadcast(centroids)
    val counts = vA.as[(Long, Array[Double])]
      .mapPartitions { it =>
        val cs = bc.value
        it.map { case (_, vec) => nearestCentroid(vec, cs) }
      }.toDF("cell")
      .groupBy(col("cell")).agg(count(lit(1)).as("n_vecs"))
    val designOcc = n / nCells
    spark.range(nCells).select(col("id").cast("int").as("cell"))
      .join(counts, Seq("cell"), "left")
      .select(col("cell"),
        coalesce(col("n_vecs"), lit(0L)).as("n_vecs"),
        when(coalesce(col("n_vecs"), lit(0L)) > lit(8L * designOcc), 1L)
          .otherwise(0L).as("hot"))
  }

  /** DuckDB mirror of [[ivfCellStatsAuto]]: the shared
    * [[ivfAutoAssignCtes]] chain, then per-cell counts LEFT JOINed onto
    * range(ncells) so dead cells report 0, hot = occupancy > 8·(n div
    * ncells) — the identical integer algebra. */
  private[graft] def ivfCellStatsOracle(dim: Int,
      kmeansIters: Int = 3): String =
    s"""WITH ${ivfAutoAssignCtes(dim, kmeansIters, "SELECT COUNT(*) FROM q")},
       |cellcounts AS (SELECT cell, COUNT(*) AS nv FROM assign GROUP BY cell),
       |cells AS (SELECT CAST(rn - 1 AS INT) AS cell FROM samp
       |          WHERE rn <= (SELECT ncells FROM params2))
       |SELECT cells.cell,
       |       CAST(COALESCE(cc.nv, 0) AS BIGINT) AS n_vecs,
       |       CAST(CASE WHEN COALESCE(cc.nv, 0) >
       |              8 * ((SELECT n FROM params) // (SELECT ncells FROM params2))
       |            THEN 1 ELSE 0 END AS BIGINT) AS hot
       |FROM cells LEFT JOIN cellcounts cc ON cc.cell = cells.cell
       |ORDER BY cells.cell""".stripMargin

  /** Exact-cosine rerank tail shared by the auto oracles (same text as
    * the fixed-width oracles' tails — kept verbatim so the arithmetic is
    * character-identical). Expects CTEs `q(id, v)` and
    * `cand(query_id, neighbor_id)` to be in scope. */
  private def oracleRerankTail(dim: Int, k: Int): String =
    s"""n AS (SELECT id, (SELECT SUM(x*x) FROM UNNEST(v) t(x)) AS nrm FROM q),
       |scored AS (SELECT c.query_id, c.neighbor_id,
       |             (SELECT SUM(qq.v[i] * nv.v[i])
       |              FROM UNNEST(range(1, ${dim + 1})) t(i)) /
       |               SQRT(nq.nrm * nn.nrm) AS cosine
       |           FROM cand c
       |           JOIN q qq ON qq.id = c.query_id
       |           JOIN q nv ON nv.id = c.neighbor_id
       |           JOIN n nq ON nq.id = c.query_id
       |           JOIN n nn ON nn.id = c.neighbor_id),
       |ranked AS (SELECT query_id, neighbor_id, cosine,
       |             ROW_NUMBER() OVER (PARTITION BY query_id
       |               ORDER BY cosine DESC, neighbor_id ASC) AS rank
       |           FROM scored)
       |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cosine
       |FROM ranked WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin

  /** The nBits derivation as SQL, integer-exact: smallest b with
    * 2^b >= max(1, N // targetOccupancy), clamped [4, maxAutoNBits] —
    * [[autoNBits]] (ceilLog2 via bit shifts on both sides, no float log)
    * with the upper clamp tightened from autoNBits' 40 to
    * [[maxAutoNBits]] (ADVICE r11): the oracle embeds only maxAutoNBits
    * plane rows, so a derived width past that would silently hash at 16
    * bits while reporting more. Clamping here keeps the SQL's effective
    * and derived widths equal; the Spark side raises loudly at the same
    * boundary, so the two sides can never silently diverge.
    * Expects CTE `q(id, v)`. */
  private def autoNBitsSql(targetOccupancy: Int): String =
    s"""params AS (SELECT LEAST($maxAutoNBits, GREATEST(4,
       |    (SELECT MIN(b) FROM range(0, 63) t(b)
       |     WHERE (CAST(1 AS BIGINT) << CAST(b AS INT)) >=
       |       GREATEST(1, (SELECT COUNT(*) FROM q) // $targetOccupancy)))) AS nbits)""".stripMargin

  /** DuckDB mirror of [[lshTopKAutoPortable]]: plane literals for ALL
    * [[maxAutoNBits]] rows per table in long format (the prefix property
    * of [[quantizedPlanes]] makes row i width-independent), nbits derived
    * from COUNT(*) in the `params` CTE, bucket = Σ 2^i over the first
    * nbits sign bits — the same integer arithmetic as the fixed-width
    * oracle at whatever width the corpus implies. */
  private[graft] def lshAutoOracle(dim: Int, k: Int,
      targetOccupancy: Int = 32, tables: Int = 4, seed: Long = 42L): String = {
    val planeRows = (0 until tables).flatMap { t =>
      val planes = quantizedPlanes(dim, maxAutoNBits, seed + t * 7919)
      (0 until maxAutoNBits).map { i =>
        s"($t, $i, ${planes(i).mkString("[", ", ", "]")})"
      }
    }.mkString(",\n  ")
    s"""WITH q AS (SELECT vec_id AS id, list_transform(embedding,
       |             x -> FLOOR(CAST(x AS DOUBLE) * CAST(10000.0 AS DOUBLE))) AS v
       |           FROM embeddings),
       |${autoNBitsSql(targetOccupancy)},
       |pl AS (SELECT * FROM (VALUES
       |  $planeRows) pl0(tbl, i, p)),
       |plu AS (SELECT tbl, i, j, p[j] AS pv
       |        FROM pl, UNNEST(range(1, ${dim + 1})) t(j)
       |        WHERE i < (SELECT nbits FROM params)),
       |qu AS (SELECT id, j, v[j] AS x FROM q, UNNEST(range(1, ${dim + 1})) t(j)),
       |dots AS (SELECT u.id, p.tbl, p.i, SUM(u.x * p.pv) AS dot
       |         FROM qu u JOIN plu p ON p.j = u.j
       |         GROUP BY u.id, p.tbl, p.i),
       |b AS (SELECT id, tbl,
       |        SUM(CASE WHEN dot >= 0
       |            THEN (CAST(1 AS BIGINT) << CAST(i AS INT)) ELSE 0 END) AS bucket
       |      FROM dots GROUP BY id, tbl),
       |cand AS (SELECT DISTINCT a.id AS query_id, bb.id AS neighbor_id
       |         FROM b a JOIN b bb
       |           ON a.tbl = bb.tbl AND a.bucket = bb.bucket AND a.id <> bb.id),
       |${oracleRerankTail(dim, k)}""".stripMargin
  }

  /** The nCells / sampleN derivation as SQL — exactly [[autoNCells]] +
    * [[autoSampleN]] (IEEE sqrt then ceil on both sides), plus the
    * stride-init (cell → sample rank) table. Expects CTEs `q(id, v)` and
    * `samp(id, v, rn)` ordering to already exist downstream. */
  private def autoCellsSql(nSql: String = "SELECT COUNT(*) FROM q"): String =
    s"""params AS (SELECT n,
       |    LEAST(4096, GREATEST(16,
       |      CAST(CEIL(SQRT(CAST(n AS DOUBLE))) AS BIGINT))) AS ncells
       |  FROM (SELECT ($nSql) AS n)),
       |params2 AS (SELECT n, ncells,
       |    LEAST(n, GREATEST(200, 8 * ncells)) AS samplen FROM params)""".stripMargin

  /** DuckDB mirror of [[ivfTopKAutoPortable]]: [[ivfPortableOracle]]'s
    * Lloyd/assign/probe/rerank CTE chain with nCells and sampleN derived
    * from COUNT(*) (`params`/`params2`) and the literal seeded-shuffle
    * init replaced by the stride init ([[strideInitIndices]] as one
    * integer division per cell). */
  private[graft] def ivfAutoOracle(dim: Int, k: Int, nProbe: Int = 4,
      kmeansIters: Int = 3, incrementalTailN: Option[Int] = None): String = {
    // incrementalTailN (VERDICT r11 item 5): mirror of
    // [[incrementalIvfTopKAuto]] — the epoch corpus is the first
    // COUNT(*) − tail ids, so widths derive from that count (a frozen
    // codebook's widths are the EPOCH's, not the grown corpus's), the
    // sample (smallest samplen ids) is epoch-only by construction, and
    // only the arriving tail probes. Assignment/rerank still run over
    // the full corpus = ledger ∪ batch.
    val nSql = incrementalTailN
      .map(t => s"SELECT COUNT(*) - $t FROM q")
      .getOrElse("SELECT COUNT(*) FROM q")
    val probeFilter = incrementalTailN
      .map(_ => " AND id >= (SELECT n FROM params)").getOrElse("")
    s"""WITH ${ivfAutoAssignCtes(dim, kmeansIters, nSql)},
       |probe AS (SELECT id, cell FROM rankedcells WHERE r <= $nProbe$probeFilter),
       |cand AS (SELECT p.id AS query_id, a.id AS neighbor_id
       |         FROM probe p JOIN assign a ON a.cell = p.cell AND a.id <> p.id),
       |${oracleRerankTail(dim, k)}""".stripMargin
  }

  /** The shared CTE chain of the width-adaptive IVF oracles — everything
    * from the quantized `q` scan through stride init, unrolled Lloyd,
    * and the full-corpus `assign`/`rankedcells` tables. Extracted (r12)
    * so [[ivfAutoOracle]] and [[ivfCellStatsOracle]] stay one text. */
  private def ivfAutoAssignCtes(dim: Int, kmeansIters: Int,
      nSql: String): String = {
    val iters = (1 to kmeansIters).map { i =>
      s"""d$i AS (SELECT s.rn, c.cell,
         |          SUM((s.x - c.cv) * (s.x - c.cv)) AS dist
         |        FROM sampu s JOIN c${i - 1} c ON c.j = s.j
         |        GROUP BY s.rn, c.cell),
         |a$i AS (SELECT rn, cell FROM (
         |          SELECT rn, cell,
         |                 ROW_NUMBER() OVER (PARTITION BY rn ORDER BY dist, cell) AS r
         |          FROM d$i) WHERE r = 1),
         |c$i AS (SELECT p.cell, p.j, COALESCE(u.val, p.cv) AS cv
         |        FROM c${i - 1} p LEFT JOIN (
         |          SELECT a.cell, s.j, FLOOR(SUM(s.x) / COUNT(*)) AS val
         |          FROM a$i a JOIN sampu s ON s.rn = a.rn
         |          GROUP BY a.cell, s.j) u
         |        ON u.cell = p.cell AND u.j = p.j)""".stripMargin
    }.mkString(",\n")
    s"""q AS (SELECT vec_id AS id, list_transform(embedding,
       |             x -> FLOOR(CAST(x AS DOUBLE) * CAST(10000.0 AS DOUBLE))) AS v
       |           FROM embeddings),
       |${autoCellsSql(nSql)},
       |samp AS (SELECT id, v, rn FROM (
       |           SELECT id, v, ROW_NUMBER() OVER (ORDER BY id) AS rn FROM q)
       |         WHERE rn <= (SELECT samplen FROM params2)),
       |sampu AS (SELECT rn, j, v[j] AS x
       |          FROM samp, UNNEST(range(1, ${dim + 1})) t(j)),
       |init AS (SELECT rn - 1 AS cell,
       |           ((rn - 1) * (SELECT samplen FROM params2))
       |             // (SELECT ncells FROM params2) + 1 AS srn
       |         FROM samp WHERE rn <= (SELECT ncells FROM params2)),
       |c0 AS (SELECT m.cell, s.j, s.x AS cv
       |       FROM init m JOIN sampu s ON s.rn = m.srn),
       |$iters,
       |qu AS (SELECT id, j, v[j] AS x FROM q, UNNEST(range(1, ${dim + 1})) t(j)),
       |dall AS (SELECT u.id, c.cell, SUM((u.x - c.cv) * (u.x - c.cv)) AS dist
       |         FROM qu u JOIN c$kmeansIters c ON c.j = u.j
       |         GROUP BY u.id, c.cell),
       |rankedcells AS (SELECT id, cell,
       |                  ROW_NUMBER() OVER (PARTITION BY id ORDER BY dist, cell) AS r
       |                FROM dall),
       |assign AS (SELECT id, cell FROM rankedcells WHERE r = 1)""".stripMargin
  }

  /** DuckDB mirror of [[ivfPqTopKAutoPortable]]:
    * [[ivfPqPortableOracle]]'s two-level CTE chain (g-prefixed coarse
    * Lloyd, p-prefixed per-subspace residual Lloyd, LUT × code ADC,
    * exact rerank) with nCells/sampleN from COUNT(*) and stride init at
    * both codebook levels (ksub and m are fixed literals, so the PQ
    * stride table is a constant range() cross join). */
  private[graft] def ivfPqAutoOracle(dim: Int, k: Int, nProbe: Int = 4,
      m: Int = 8, ksub: Int = 16, candR: Int = 50,
      kmeansIters: Int = 2): String = {
    val subDim = dim / m
    val coarseIters = (1 to kmeansIters).map { i =>
      s"""gd$i AS (SELECT u.rn, c.cell,
         |           SUM((u.x - c.cv) * (u.x - c.cv)) AS dist
         |         FROM sampu u JOIN g${i - 1} c ON c.j = u.j
         |         GROUP BY u.rn, c.cell),
         |ga$i AS (SELECT rn, cell FROM (
         |           SELECT rn, cell,
         |                  ROW_NUMBER() OVER (PARTITION BY rn ORDER BY dist, cell) AS r
         |           FROM gd$i) WHERE r = 1),
         |g$i AS (SELECT p.cell, p.j, COALESCE(u2.val, p.cv) AS cv
         |        FROM g${i - 1} p LEFT JOIN (
         |          SELECT a.cell, u.j, FLOOR(SUM(u.x) / COUNT(*)) AS val
         |          FROM ga$i a JOIN sampu u ON u.rn = a.rn
         |          GROUP BY a.cell, u.j) u2
         |        ON u2.cell = p.cell AND u2.j = p.j)""".stripMargin
    }.mkString(",\n")
    val pqIters = (1 to kmeansIters).map { i =>
      s"""pd$i AS (SELECT u.rn, c.s, c.cell,
         |           SUM((u.x - c.cv) * (u.x - c.cv)) AS dist
         |         FROM sres u JOIN p${i - 1} c ON c.j = u.j AND c.s = u.s
         |         GROUP BY u.rn, c.s, c.cell),
         |pa$i AS (SELECT rn, s, cell FROM (
         |           SELECT rn, s, cell,
         |                  ROW_NUMBER() OVER (PARTITION BY rn, s ORDER BY dist, cell) AS r
         |           FROM pd$i) WHERE r = 1),
         |p$i AS (SELECT p.s, p.cell, p.j, COALESCE(u2.val, p.cv) AS cv
         |        FROM p${i - 1} p LEFT JOIN (
         |          SELECT a.s, a.cell, u.j, FLOOR(SUM(u.x) / COUNT(*)) AS val
         |          FROM pa$i a JOIN sres u ON u.rn = a.rn AND u.s = a.s
         |          GROUP BY a.s, a.cell, u.j) u2
         |        ON u2.s = p.s AND u2.cell = p.cell AND u2.j = p.j)""".stripMargin
    }.mkString(",\n")
    s"""WITH q0 AS (SELECT vec_id AS id, list_transform(embedding,
       |             x -> FLOOR(CAST(x AS DOUBLE) * CAST(10000.0 AS DOUBLE))) AS v0
       |           FROM embeddings),
       |nrm0 AS (SELECT id, SQRT((SELECT SUM(x * x) FROM UNNEST(v0) t(x))) AS nr
       |         FROM q0),
       |q AS (SELECT q0.id, CASE WHEN n.nr = 0 THEN q0.v0
       |        ELSE list_transform(q0.v0,
       |          x -> FLOOR((x * CAST(10000.0 AS DOUBLE)) / n.nr)) END AS v
       |      FROM q0 JOIN nrm0 n ON n.id = q0.id),
       |${autoCellsSql()},
       |samp AS (SELECT id, v, rn FROM (
       |           SELECT id, v, ROW_NUMBER() OVER (ORDER BY id) AS rn FROM q)
       |         WHERE rn <= (SELECT samplen FROM params2)),
       |sampu AS (SELECT rn, j, v[j] AS x
       |          FROM samp, UNNEST(range(1, ${dim + 1})) t(j)),
       |ginit AS (SELECT rn - 1 AS cell,
       |            ((rn - 1) * (SELECT samplen FROM params2))
       |              // (SELECT ncells FROM params2) + 1 AS srn
       |          FROM samp WHERE rn <= (SELECT ncells FROM params2)),
       |g0 AS (SELECT i.cell, u.j, u.x AS cv
       |       FROM ginit i JOIN sampu u ON u.rn = i.srn),
       |$coarseIters,
       |sd AS (SELECT u.rn, c.cell, SUM((u.x - c.cv) * (u.x - c.cv)) AS dist
       |       FROM sampu u JOIN g$kmeansIters c ON c.j = u.j
       |       GROUP BY u.rn, c.cell),
       |sa AS (SELECT rn, cell FROM (
       |         SELECT rn, cell,
       |                ROW_NUMBER() OVER (PARTITION BY rn ORDER BY dist, cell) AS r
       |         FROM sd) WHERE r = 1),
       |sres AS (SELECT u.rn, u.j, CAST((u.j - 1) // $subDim AS INT) AS s,
       |           u.x - c.cv AS x
       |         FROM sampu u JOIN sa ON sa.rn = u.rn
       |         JOIN g$kmeansIters c ON c.cell = sa.cell AND c.j = u.j),
       |pinit AS (SELECT CAST(ts.s AS INT) AS s, tc.cell,
       |            (tc.cell * (SELECT samplen FROM params2)) // $ksub + 1 AS srn
       |          FROM range(0, $m) ts(s), range(0, $ksub) tc(cell)),
       |p0 AS (SELECT i.s, i.cell, r.j, r.x AS cv
       |       FROM pinit i JOIN sres r ON r.rn = i.srn AND r.s = i.s),
       |$pqIters,
       |qu AS (SELECT id, j, v[j] AS x FROM q, UNNEST(range(1, ${dim + 1})) t(j)),
       |dall AS (SELECT u.id, c.cell, SUM((u.x - c.cv) * (u.x - c.cv)) AS dist
       |         FROM qu u JOIN g$kmeansIters c ON c.j = u.j
       |         GROUP BY u.id, c.cell),
       |rankedcells AS (SELECT id, cell,
       |                  ROW_NUMBER() OVER (PARTITION BY id ORDER BY dist, cell) AS r
       |                FROM dall),
       |assign AS (SELECT id, cell FROM rankedcells WHERE r = 1),
       |probe AS (SELECT id, cell FROM rankedcells WHERE r <= $nProbe),
       |qres AS (SELECT u.id, u.j, CAST((u.j - 1) // $subDim AS INT) AS s,
       |           u.x - c.cv AS x
       |         FROM qu u JOIN assign a ON a.id = u.id
       |         JOIN g$kmeansIters c ON c.cell = a.cell AND c.j = u.j),
       |pcd AS (SELECT r.id, b.s, b.cell,
       |          SUM((r.x - b.cv) * (r.x - b.cv)) AS dist
       |        FROM qres r JOIN p$kmeansIters b ON b.s = r.s AND b.j = r.j
       |        GROUP BY r.id, b.s, b.cell),
       |pcode AS (SELECT id, s, cell FROM (
       |            SELECT id, s, cell,
       |                   ROW_NUMBER() OVER (PARTITION BY id, s ORDER BY dist, cell) AS r
       |            FROM pcd) WHERE r = 1),
       |pru AS (SELECT u.id, p.cell AS pc, u.j,
       |          CAST((u.j - 1) // $subDim AS INT) AS s, u.x - c.cv AS x
       |        FROM qu u JOIN probe p ON p.id = u.id
       |        JOIN g$kmeansIters c ON c.cell = p.cell AND c.j = u.j),
       |lut AS (SELECT r.id, r.pc, b.s, b.cell,
       |          SUM((r.x - b.cv) * (r.x - b.cv)) AS dist
       |        FROM pru r JOIN p$kmeansIters b ON b.s = r.s AND b.j = r.j
       |        GROUP BY r.id, r.pc, b.s, b.cell),
       |adc AS (SELECT l.id AS query_id, nc.id AS neighbor_id,
       |          SUM(l.dist) AS adist
       |        FROM lut l
       |        JOIN assign na ON na.cell = l.pc AND na.id <> l.id
       |        JOIN pcode nc ON nc.id = na.id AND nc.s = l.s AND nc.cell = l.cell
       |        GROUP BY l.id, nc.id),
       |cand AS (SELECT query_id, neighbor_id FROM (
       |           SELECT query_id, neighbor_id,
       |                  ROW_NUMBER() OVER (PARTITION BY query_id
       |                    ORDER BY adist ASC, neighbor_id ASC) AS r
       |           FROM adc) WHERE r <= $candR),
       |${oracleRerankTail(dim, k)}""".stripMargin
  }
}
