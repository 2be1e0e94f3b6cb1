package graft.streaming

import graft.ops.ConnectedComponents
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Incremental connected components over a stream of edges.
  *
  * Global connectivity cannot be keyed, so per-key state operators
  * (mapGroupsWithState) don't fit; the classic incremental formulation is
  * SPANNING-FOREST COMPRESSION instead: connectivity of everything seen so
  * far is fully captured by one (node → component-representative) edge per
  * node — O(V) state, not O(all edges ever). Each micro-batch unions its
  * new edges with the current forest, recomputes components on that
  * compressed graph (via the batch operator, so the same size-gated
  * union-find/GraphX strategy applies), and writes the new forest:
  *
  *   state_t = forest(components(state_{t-1} ∪ edges_batch_t))
  *
  * The recomputation input is |V| + |batch| edges regardless of history
  * length — the property that keeps this viable on an unbounded stream.
  * Exactness: a spanning forest preserves connectivity exactly, so labels
  * after batch t equal batch CC over all edges seen through t (components
  * can only merge as edges arrive; edge deletion is out of scope, as in
  * every union-find-based CC).
  *
  * State lives in a parquet directory (atomic swap via temp-dir rename),
  * making the query restartable alongside the sink's own checkpoint.
  */
object StreamComponents {

  /** Start the incremental CC query on a stream of (src, dst) edges.
    * After each batch, `stateDir/current` holds (node, component) parquet.
    */
  def run(edges: DataFrame, stateDir: String,
      checkpointDir: String): StreamingQuery = {
    edges.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeBatch(batch, stateDir)
        ()
      }
      .start()
  }

  /** One incremental step: merge a batch of edges into the forest state.
    * Exposed for direct use (and tests) independent of the streaming
    * runtime.
    */
  def mergeBatch(batch: DataFrame, stateDir: String): Unit = {
    val spark = batch.sparkSession
    val cur = currentState(spark, stateDir)
    val forestEdges = cur match {
      case Some(st) =>
        // forest edge per non-representative node, unioned with the batch
        st.where(col("node") =!= col("component"))
          .select(col("node").as("src"), col("component").as("dst"))
          .union(batch.select(col("src"), col("dst")))
      case None => batch.select(col("src"), col("dst"))
    }
    val next = ConnectedComponents.components(
      forestEdges.where(col("src").isNotNull && col("dst").isNotNull))
    writeState(next, stateDir)
  }

  /** (node, component) labels equal to batch CC over every edge seen. */
  def currentState(spark: SparkSession, stateDir: String): Option[DataFrame] = {
    val p = new java.io.File(s"$stateDir/current")
    if (p.exists()) Some(spark.read.parquet(p.toString)) else None
  }

  private def writeState(df: DataFrame, stateDir: String): Unit = {
    val tmp = s"$stateDir/next"
    df.write.mode("overwrite").parquet(tmp)
    val cur = new java.io.File(s"$stateDir/current")
    val old = new java.io.File(s"$stateDir/prev")
    if (old.exists()) delete(old)
    if (cur.exists() && !cur.renameTo(old))
      throw new java.io.IOException(s"cannot rotate $cur")
    if (!new java.io.File(tmp).renameTo(cur))
      throw new java.io.IOException(s"cannot promote $tmp")
    delete(old)
  }

  private def delete(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(delete)
    f.delete()
  }
}
