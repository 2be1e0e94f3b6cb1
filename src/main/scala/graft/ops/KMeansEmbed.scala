package graft.ops

import org.apache.spark.internal.Logging
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed Lloyd k-means over quantized embeddings, plus the
  * SemDeDup-style cluster-then-pair semantic dedup built on top of it.
  *
  * Beyond-reference operator (the reference has no vector ops at all —
  * its surface is the 7 graph kernels of `polars_grouper/__init__.py`);
  * this is the curation step described in "SemDeDup: Data-efficient
  * learning at web-scale through semantic deduplication" (Abbas et al.,
  * 2023): cluster the corpus, then search for near-duplicates only WITHIN
  * a cluster — O(Σ|cluster|²) instead of O(n²) pair work.
  *
  * Scale design (the part [[Similarity.ivfTopKPortable]]'s sample-based
  * Lloyd deliberately does not do): the fit is MLlib-shaped —
  *
  *   - every iteration is ONE `mapPartitions` pass that folds each
  *     partition into k×(dim+1) local longs (assign + partial sums in a
  *     tight loop, no per-row shuffle rows), followed by a (cluster, pos)
  *     partial-aggregate shuffle of at most partitions×k×dim tiny rows;
  *   - only the k×dim merged sums ever reach the driver (gated by a loud
  *     `require`), never the data — at 100 TB the collect is still a few
  *     hundred KB;
  *   - the corpus Dataset is persisted once and re-scanned per iteration.
  *
  * Exactness contract (same as the q_dedup_embed / q_ann_ivf family):
  * vectors are ×`scale` floor-quantized to integer-valued doubles, so
  * squared distances, dot products and per-cluster component sums are
  * exact integers (< 2^53) in ANY summation order; centroid updates use
  * floor-division `Math.floorDiv(sum, n)`. Every step therefore
  * reproduces bit-identically in DuckDB SQL (see the q_kmeans /
  * q_semdedup oracles in [[graft.SparkEntry]]).
  *
  * Determinism: seeding is the k smallest-id vectors (cluster label =
  * rank in that order); argmin ties break toward the smallest cluster
  * label; empty clusters are dropped (their labels simply stop existing,
  * mirroring the SQL's group-by-over-assignments update).
  */
object KMeansEmbed extends Logging {

  /** (id, quantized vector) corpus + fitted centroids + final assignment.
    * `centroids` maps cluster label -> centroid (labels of emptied
    * clusters absent). */
  private[graft] case class Fit(
      corpus: Dataset[(Long, Array[Double])],
      centroids: Array[(Int, Array[Double])],
      assigned: DataFrame) // (id, cluster, dist)

  /** Lloyd fit: `iters` assign+update rounds from a deterministic
    * seeding, then a final assignment pass. `farthestPoint = false`
    * seeds with the k smallest-id vectors; `true` uses farthest-point
    * (k-means++-flavored, deterministic) seeding: c0 = smallest-id
    * vector, each next centroid the vector maximizing its min squared
    * distance to the chosen set (ties -> smallest id) — k-1 extra
    * corpus passes, each a broadcast map + top-1, no extra shuffles. */
  private[graft] def fit(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, scale: Double = 10000.0,
      maxDriverStats: Long = 4000000L,
      farthestPoint: Boolean = false): Fit = {
    val spark = df.sparkSession
    import spark.implicits._
    require(k > 0 && iters >= 0, s"need k > 0, iters >= 0 (got $k, $iters)")
    val q = df.select(col(idCol).cast("long").as("id"),
        Similarity.quantize(col(vecCol), scale).as("qv"))
      .as[(Long, Array[Double])]
      .persist(StorageLevel.MEMORY_AND_DISK)
    val seed =
      if (farthestPoint) farthestPointSeeds(q, k)
      else q.orderBy(col("id")).limit(k).collect().map(_._2)
    require(seed.nonEmpty, "k-means on an empty corpus")
    val dim = seed(0).length
    require(k.toLong * dim <= maxDriverStats,
      s"k*dim = ${k.toLong * dim} driver-collected centroid stats exceed " +
        s"$maxDriverStats — lower k or raise maxDriverStats")
    var centroids: Array[(Int, Array[Double])] =
      seed.zipWithIndex.map { case (v, i) => (i, v) }

    for (_ <- 0 until iters) {
      val bc = spark.sparkContext.broadcast(centroids)
      // one row per (partition, cluster, pos): the treeAggregate shape as
      // a Dataset, partial-combined again map-side by the groupBy below
      val partials = q.mapPartitions { it =>
        val cs = bc.value
        val kk = cs.length
        val sums = Array.fill(kk)(new Array[Long](dim))
        val cnts = new Array[Long](kk)
        it.foreach { case (_, v) =>
          val c = argmin(v, cs)
          val s = sums(c)
          var i = 0; while (i < dim) { s(i) += v(i).toLong; i += 1 }
          cnts(c) += 1L
        }
        (0 until kk).iterator.filter(cnts(_) > 0L).flatMap { c =>
          val lbl = cs(c)._1
          // count rides on pos 0 so one tiny aggregation merges everything
          sums(c).iterator.zipWithIndex.map { case (s, i) =>
            (lbl, i, s, if (i == 0) cnts(c) else 0L)
          }
        }
      }.toDF("cluster", "pos", "s", "cnt")
      val merged = partials.groupBy(col("cluster"), col("pos"))
        .agg(sum(col("s")).as("s"), sum(col("cnt")).as("cnt"))
        .collect()
      bc.destroy()
      val byCluster = merged.groupBy(_.getInt(0))
      centroids = byCluster.toArray.sortBy(_._1).map { case (lbl, rows) =>
        val n = rows.map(_.getLong(3)).sum
        val v = new Array[Double](dim)
        rows.foreach { r => v(r.getInt(1)) = Math.floorDiv(r.getLong(2), n).toDouble }
        (lbl, v)
      }
    }

    val bcF = spark.sparkContext.broadcast(centroids)
    val assigned = q.mapPartitions { it =>
      val cs = bcF.value
      it.map { case (id, v) =>
        val c = argmin(v, cs)
        (id, cs(c)._1, sqDistL(v, cs(c)._2))
      }
    }.toDF("id", "cluster", "dist")
    Fit(q, centroids, assigned)
  }

  /** Deterministic farthest-point seeds in SELECTION order (cluster
    * label = selection index). Each step is one corpus map against the
    * broadcast chosen set plus a (minDist desc, id asc) top-1. */
  private def farthestPointSeeds(q: Dataset[(Long, Array[Double])],
      k: Int): Array[Array[Double]] = {
    val spark = q.sparkSession
    import spark.implicits._
    val first = q.orderBy(col("id")).limit(1).collect()
    require(first.nonEmpty, "k-means on an empty corpus")
    val chosen = scala.collection.mutable.ArrayBuffer[Array[Double]](first(0)._2)
    while (chosen.length < k) {
      val bc = spark.sparkContext.broadcast(chosen.toArray)
      val next = q.mapPartitions { it =>
        val cs = bc.value
        it.map { case (id, v) =>
          var md = Long.MaxValue
          var i = 0
          while (i < cs.length) {
            val d = sqDistL(v, cs(i)); if (d < md) md = d; i += 1
          }
          (id, v, md)
        }
      }.toDF("id", "v", "md")
        .orderBy(col("md").desc, col("id").asc).limit(1)
        .as[(Long, Array[Double], Long)].collect()
      bc.destroy()
      chosen += next(0)._2
    }
    chosen.toArray
  }

  /** Final assignment as a driver query: (vec_id, cluster, dist). */
  def assignments(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, scale: Double = 10000.0,
      farthestPoint: Boolean = false): DataFrame =
    fit(df, idCol, vecCol, k, iters, scale, farthestPoint = farthestPoint)
      .assigned
      .withColumnRenamed("id", idCol)

  /** SemDeDup: k-means partition, then exact cosine pairs ONLY within a
    * cluster; a vector is a duplicate iff a SMALLER-id vector of the same
    * cluster has cosine >= `threshold` with it. Output
    * (id, cluster, is_dup) — `filter(!is_dup)` is the kept corpus.
    *
    * The cluster is the block: each cluster is packed into one row and
    * scored in a tight loop (the [[Dedup.embeddingCosinePairsBlocked]]
    * idiom, with k-means cells instead of hash blocks — cells put
    * SIMILAR vectors together, which is what makes the intra-cluster
    * restriction a good approximation of full-pair dedup). `require`s
    * every cluster under `maxClusterSize`; at 100 TB raise k (cell size
    * ~n/k) rather than the cap — pair work per cluster is quadratic.
    */
  def semDedup(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int, threshold: Double, scale: Double = 10000.0,
      maxClusterSize: Int = 1000000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val f = fit(df, idCol, vecCol, k, iters, scale)
    val withVec = f.corpus.toDF("id", "qv")
      .join(f.assigned.select(col("id"), col("cluster")), "id")
    val packed = withVec.groupBy(col("cluster"))
      .agg(collect_list(struct(col("id"), col("qv"))).as("rows"))
    val dups = packed.as[(Int, Array[(Long, Array[Double])])]
      .flatMap { case (_, rows) =>
        if (rows.length > maxClusterSize)
          throw new IllegalArgumentException(
            s"semDedup cluster of ${rows.length} rows exceeds " +
              s"$maxClusterSize — raise k (quadratic pair work per cluster)")
        val sorted = rows.sortBy(_._1)
        val norms = sorted.map { case (_, v) => dotD(v, v) }
        // j is a dup iff some i<j (smaller id) clears the threshold
        (1 until sorted.length).iterator.filter { j =>
          var i = 0; var hit = false
          while (i < j && !hit) {
            val c = dotD(sorted(i)._2, sorted(j)._2) /
              math.sqrt(norms(i) * norms(j))
            if (c >= threshold) hit = true
            i += 1
          }
          hit
        }.map(j => sorted(j)._1)
      }.toDF("id").withColumn("is_dup", lit(true))
    f.assigned.select(col("id"), col("cluster"))
      .join(dups, Seq("id"), "left")
      .select(col("id").as(idCol), col("cluster"),
        coalesce(col("is_dup"), lit(false)).as("is_dup"))
  }

  /** Smallest squared distance wins; ties -> smallest cluster label
    * (labels are sorted ascending in the array, and `<` keeps the first
    * minimum). */
  private def argmin(x: Array[Double], cs: Array[(Int, Array[Double])]): Int = {
    var best = 0; var bestD = Long.MaxValue; var c = 0
    while (c < cs.length) {
      val d = sqDistL(x, cs(c)._2)
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Exact integer squared L2 over integer-valued doubles. */
  private def sqDistL(a: Array[Double], b: Array[Double]): Long = {
    var s = 0L; var i = 0
    while (i < a.length) {
      val d = a(i).toLong - b(i).toLong; s += d * d; i += 1
    }
    s
  }

  /** Integer-exact dot over integer-valued doubles (terms and sums stay
    * < 2^53, so double accumulation is order-independent). */
  private def dotD(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }
}
