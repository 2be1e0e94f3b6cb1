package graft.core

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Input normalization shared by every graph operator.
  *
  * Mirrors the reference's input coercions — node/item ids cast to string,
  * weights/frequencies to double, transaction ids to long
  * (reference: src/graph_utils.rs:42-64) — and its null policy: a row with a
  * null in any used column contributes no edge/transaction row
  * (reference: src/graph_utils.rs:90-97).
  *
  * All helpers are pure column algebra, so Catalyst pushes the casts and
  * null filters into the scan.
  */
object Ingest {

  /** Normalized unweighted edge list: (src string, dst string), null rows dropped. */
  def edges(df: DataFrame, from: String, to: String): DataFrame =
    df.select(
        col(from).cast("string").as("src"),
        col(to).cast("string").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)

  /** Normalized weighted edge list: (src, dst, weight double), null rows dropped. */
  def weightedEdges(df: DataFrame, from: String, to: String, weight: String): DataFrame =
    df.select(
        col(from).cast("string").as("src"),
        col(to).cast("string").as("dst"),
        col(weight).cast("double").as("weight"))
      .where(col("src").isNotNull && col("dst").isNotNull && col("weight").isNotNull)

  /** Append a 0-based ingest-order row index.
    *
    * The reference's first-appearance numbering (src/graph_utils.rs:66-76) is
    * inherently row-order dependent; Spark DataFrames have no intrinsic row
    * order after a shuffle. This uses `zipWithIndex`, which indexes rows in
    * partition order — exact for single-partition/freshly-parallelized input
    * (all parity-mode fixtures) and stable for an un-shuffled file read.
    * Canonical-label operators (the scale path) never call this.
    */
  def withRowIdx(df: DataFrame, name: String): DataFrame = {
    val schema = df.schema.add(name, LongType, nullable = false)
    val rdd = df.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    df.sparkSession.createDataFrame(rdd, schema)
  }
}
