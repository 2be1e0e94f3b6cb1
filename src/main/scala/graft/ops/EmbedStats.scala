package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Second-moment statistics over an embedding column — the sufficient
  * statistics of covariance/PCA/whitening: G[i][j] = Σ_rows v_i·v_j.
  * With the Gram matrix (and the column sums alongside) a driver-side
  * eigensolve yields principal components from ONE pass over the data —
  * the standard way PCA runs at 100 TB (dim² numbers move, never rows).
  *
  * Shape: one `mapPartitions` pass folds each partition into a dim×dim
  * upper-triangle of exact Long partial sums in a tight loop (the
  * [[KMeansEmbed]] recipe — no explode of dim² rows per vector, no
  * shuffle of anything row-sized); the only exchange carries ≤
  * dim·(dim+1)/2 rows per partition. Inputs must be integer-valued
  * (pre-quantize via [[Similarity.quantize]]) so the sums are exact in
  * any summation order — hash-exact in the oracle.
  *
  * Overflow budget: |v_i·v_j| ≤ scale² (10⁸ at the default ×10⁴), so a
  * Long holds ~9·10¹⁰ row-contributions per cell; beyond that quantize
  * coarser or pre-aggregate per shard. Accumulation uses
  * `Math.addExact`/`multiplyExact`, so an overflow fails loudly instead
  * of wrapping into a silently wrong statistic.
  *
  * Output: (i, j, n, s) for 0 ≤ i ≤ j < dim — n the total row count, s
  * the exact Σ v_i·v_j.
  */
object EmbedStats {

  /** Embedding drift between groups — are two slices of the corpus
    * (labels, sources, time shards) embedded in the same region? Exact
    * integer centroid SUMS per (group, dimension) — cosine of sums
    * equals cosine of means, so no division happens until the final
    * projection, where dot/√(‖a‖²·‖b‖²) uses only IEEE-correctly-
    * rounded ops on exact integers (the portable-cosine contract the
    * ANN family already proves). Norm products are multiplied as
    * doubles — each factor is exact, the product would overflow a Long.
    *
    * Shape: one posexplode + (group, dim)-keyed sum (partial-
    * aggregated; output is groups×dim rows however large the corpus),
    * then a dim-keyed pair join over the group dimension — nothing
    * row-sized ever shuffles twice. Output per unordered group pair:
    * (label_a, label_b, n_a, n_b, dot, nrm_a, nrm_b, cosine).
    */
  def centroidShift(df: DataFrame, labelCol: String, vecCol: String,
      scale: Double = 10000.0): DataFrame = {
    val q = df.select(col(labelCol).cast("string").as("lab"),
        posexplode(Similarity.quantize(col(vecCol), scale))
          .as(Seq("d", "v")))
    // quantize emits integer-VALUED doubles (ArrayQuantize contract);
    // the cast makes every sum an exact Long
    val sums = q.groupBy("lab", "d")
      .agg(sum(col("v").cast("long")).as("s"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val meta = df.groupBy(col(labelCol).cast("string").as("lab"))
      .agg(count(lit(1)).as("n"))
    val norms = sums.groupBy("lab")
      .agg(sum(col("s") * col("s")).as("nrm"))
      .join(meta, Seq("lab"))
    val dots = sums.select(col("lab").as("label_a"), col("d"),
        col("s").as("sa"))
      .join(sums.select(col("lab").as("label_b"), col("d"),
        col("s").as("sb")), Seq("d"))
      .where(col("label_a") < col("label_b"))
      .groupBy("label_a", "label_b")
      .agg(sum(col("sa") * col("sb")).as("dot"))
    dots
      .join(norms.select(col("lab").as("label_a"), col("nrm").as("nrm_a"),
        col("n").as("n_a")), Seq("label_a"))
      .join(norms.select(col("lab").as("label_b"), col("nrm").as("nrm_b"),
        col("n").as("n_b")), Seq("label_b"))
      .select(col("label_a"), col("label_b"), col("n_a"), col("n_b"),
        col("dot"), col("nrm_a"), col("nrm_b"),
        (col("dot").cast("double") /
          sqrt(col("nrm_a").cast("double") * col("nrm_b").cast("double")))
          .as("cosine"))
      .orderBy("label_a", "label_b")
  }

  def gramMatrix(df: DataFrame, vecCol: String, dim: Int): DataFrame = {
    require(dim >= 1 && dim <= 4096, s"dim must be in [1, 4096], got $dim")
    val spark = df.sparkSession
    import spark.implicits._
    val cells = dim * (dim + 1) / 2
    df.select(col(vecCol).cast("array<double>")).as[Array[Double]]
      .mapPartitions { it =>
        val sums = new Array[Long](cells)
        var n = 0L
        it.foreach { v =>
          require(v.length == dim,
            s"vector length ${v.length} != declared dim $dim")
          n += 1
          var c = 0
          var i = 0
          while (i < dim) {
            val vi = v(i).toLong
            var j = i
            while (j < dim) {
              sums(c) = Math.addExact(sums(c),
                Math.multiplyExact(vi, v(j).toLong))
              j += 1; c += 1
            }
            i += 1
          }
        }
        if (n == 0L) Iterator.empty
        else {
          val out = new Array[(Int, Int, Long, Long)](cells)
          var c = 0
          var i = 0
          while (i < dim) {
            var j = i
            while (j < dim) { out(c) = (i, j, n, sums(c)); j += 1; c += 1 }
            i += 1
          }
          out.iterator
        }
      }
      .toDF("i", "j", "n", "s")
      .groupBy("i", "j")
      .agg(sum(col("n")).as("n"), sum(col("s")).as("s"))
  }

  /** Driver-side principal components from a [[gramMatrix]] table — the
    * second half of one-pass PCA: collect the dim×(dim+1)/2 exact sums
    * (dim² numbers, NEVER rows), form the mean-free covariance with the
    * column sums, and run cyclic Jacobi sweeps. Deterministic: fixed
    * sweep order, fixed sweep count, no data-dependent pivoting — the
    * same sums always yield the same rotations. Returns the top
    * `k` (eigenvalue, eigenvector) pairs ordered by eigenvalue
    * descending (ties by first-differing component sign convention:
    * each vector is flipped so its largest-|component| entry is
    * positive).
    *
    * `colSums` are Σ v_i per dimension (compute alongside the gram pass
    * or with one cheap aggregation); pass `center = false` to
    * decompose the raw second moment instead.
    */
  def pcaFromGram(gram: Array[((Int, Int), Long)], colSums: Array[Long],
      n: Long, dim: Int, k: Int, center: Boolean = true,
      sweeps: Int = 30): Seq[(Double, Array[Double])] = {
    require(n > 0 && k >= 1 && k <= dim, s"need 0 < k <= dim, n > 0")
    val a = Array.ofDim[Double](dim, dim)
    gram.foreach { case ((i, j), s) =>
      val c =
        if (center)
          (s.toDouble - colSums(i).toDouble * colSums(j).toDouble / n) / n
        else s.toDouble / n
      a(i)(j) = c; a(j)(i) = c
    }
    val v = Array.tabulate(dim, dim)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    while (sweep < sweeps) {
      var p = 0
      while (p < dim - 1) {
        var q = p + 1
        while (q < dim) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-14) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t =
              if (theta == 0.0) 1.0
              else math.signum(theta) /
                (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < dim) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < dim) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val eig = (0 until dim).map { j =>
      val vec = Array.tabulate(dim)(i => v(i)(j))
      val m = vec.indices.maxBy(i => math.abs(vec(i)))
      if (vec(m) < 0) { var i = 0; while (i < dim) { vec(i) = -vec(i); i += 1 } }
      (a(j)(j), vec)
    }
    eig.sortBy(-_._1).take(k)
  }

  /** Project every vector onto a component basis (PCA dimensionality
    * reduction / whitening step) with NO UDF: since
    * (v − μ)·w = v·w − μ·w and μ·w is a constant, each output
    * coordinate is one codegen'd [[graft.functions.ArrayDot]] against a
    * literal component array minus a literal scalar — row-parallel,
    * whole-stage codegen, no shuffle, unbounded corpus. `means` are the
    * column means (pass zeros for uncentered), completing the
    * gram → eigensolve → project pipeline without a second statistics
    * pass. Output: the input columns plus `projected` array<double> of
    * length k.
    */
  def project(df: DataFrame, vecCol: String,
      components: Seq[Array[Double]], means: Array[Double]): DataFrame = {
    require(components.nonEmpty, "need at least one component")
    val dim = components.head.length
    require(components.forall(_.length == dim) && means.length == dim,
      "component/mean dimensions disagree")
    val v = col(vecCol).cast("array<double>")
    val coords = components.map { w =>
      val muDotW = means.zip(w).map { case (m, x) => m * x }.sum
      graft.functions.ArrayDot.array_dot(v,
        array(w.toSeq.map(lit): _*)) - lit(muDotW)
    }
    df.withColumn("projected", array(coords: _*))
  }
}
