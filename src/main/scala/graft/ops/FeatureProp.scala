package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** GraphSAGE-style neighbor feature aggregation (Hamilton et al. 2017,
  * "Inductive Representation Learning on Large Graphs") — ONE round of
  * mean message passing: every node's output feature vector is the
  * element-wise floor-mean of its neighbors' (quantized) features over
  * the symmetrized edge set. The core graph workload of ML feature
  * pipelines, expressed as pure shuffle algebra:
  *
  *   edges ⋈ features on the neighbor key  →  posexplode dims  →
  *   (node, dim) partial-aggregated sum/count  →  floorDiv mean
  *
  * — the standard message-passing shape: shuffle volume O(E·d), no
  * driver state, partial aggregation combines map-side. Exactness
  * contract (repo convention): features are ×`scale` floor-quantized
  * integers and the mean is floorDiv, so results are bit-identical in
  * any engine/partitioning (q_feature_prop oracle; partition-invariance
  * follows from integer sums).
  *
  * Output: (node, pos, value) long rows; nodes with no FEATURED
  * neighbor are absent (their mean is undefined, not zero).
  */
object FeatureProp {

  def neighborMean(edges: DataFrame, srcCol: String, dstCol: String,
      feats: DataFrame, idCol: String, vecCol: String,
      scale: Double = 10000.0): DataFrame = {
    val fwd = edges.select(col(srcCol).cast("long").as("a"),
      col(dstCol).cast("long").as("b"))
    val sym = fwd.union(fwd.select(col("b").as("a"), col("a").as("b")))
      .where(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .distinct()
    val q = feats.select(col(idCol).cast("long").as("fid"),
      Similarity.quantize(col(vecCol), scale).as("qv"))
    sym.join(q, col("b") === col("fid"))
      .select(col("a").as("node"), posexplode(col("qv")).as(Seq("pos", "v")))
      .groupBy(col("node"), col("pos"))
      .agg(sum(col("v").cast("long")).as("s"), count(lit(1)).as("n"))
      .select(col("node"), col("pos"),
        expr("(s - pmod(s, n)) div n").as("value"))
  }
}
