package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Temporal motif counting — structure AND order: a temporal triangle
  * is u→v→w→u whose three edges occur in strictly increasing time
  * within a window δ (Paranjape et al.'s M₆-style cyclic motif). The
  * time constraint is what makes this different from (and far more
  * selective than) static triangle counting: an information-flow loop
  * has to happen in ORDER, and the strict `<` drops simultaneous-
  * timestamp ties identically on both engines.
  *
  * Implementation is two band-predicated self-joins over the
  * (src, dst, t) edge list: wedges first (e₂ leaves where e₁ landed,
  * later but within δ of e₁'s time), then the closing edge (back to
  * e₁'s source, later than e₂, still within δ). Each join is an equi
  * key (the shared node) plus a residual time band — hash joins, no
  * cartesian products. At 100 TB the δ band IS the partitioner: edges
  * bucket by ⌊t/δ⌋ and a motif only spans two adjacent buckets, so the
  * joins co-locate on (node, time-bucket) with one-bucket overlap —
  * the standard temporal-join discipline; here the plan keeps the
  * equi+band shape that strategy needs.
  *
  * Output: one row — (n_edges, n_wedges, n_triangles) at the given δ.
  */
object TemporalMotifs {

  def cyclicTriangles(edges: DataFrame, srcCol: String, dstCol: String,
      tCol: String, windowUs: Long): DataFrame = {
    require(windowUs > 0, s"windowUs must be positive, got $windowUs")
    val e = edges.select(col(srcCol).cast("string").as("s"),
        col(dstCol).cast("string").as("d"), col(tCol).cast("long").as("t"))
      .where(col("s").isNotNull && col("d").isNotNull && col("t").isNotNull)
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wedges = e.select(col("s").as("u"), col("d").as("v"),
        col("t").as("t1"))
      .join(e.select(col("s").as("v"), col("d").as("w"), col("t").as("t2")),
        Seq("v"))
      .where(col("t2") > col("t1") &&
        col("t2") - col("t1") <= windowUs &&
        col("w") =!= col("u"))
    val tris = wedges
      .join(e.select(col("s").as("w"), col("d").as("u"), col("t").as("t3")),
        Seq("w", "u"))
      .where(col("t3") > col("t2") && col("t3") - col("t1") <= windowUs)
    val nW = wedges.agg(count(lit(1)).as("n_wedges"))
    val nT = tris.agg(count(lit(1)).as("n_triangles"))
    e.agg(count(lit(1)).as("n_edges"))
      .crossJoin(broadcast(nW))
      .crossJoin(broadcast(nT))
  }
}
