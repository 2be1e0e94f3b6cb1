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
}
