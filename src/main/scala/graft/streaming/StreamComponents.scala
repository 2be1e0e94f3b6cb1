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
        // EVERY state row becomes an edge (node → component), including
        // representatives' self-edges: filtering to node =!= component
        // silently dropped singleton components (a node whose component is
        // itself, e.g. from a self-loop edge) from the recompute, breaking
        // the invariant that state equals batch CC over all edges seen
        st.select(col("node").as("src"), col("component").as("dst"))
          .union(batch.select(col("src"), col("dst")))
      case None => batch.select(col("src"), col("dst"))
    }
    val next = ConnectedComponents.components(
      forestEdges.where(col("src").isNotNull && col("dst").isNotNull))
    writeState(next, stateDir)
  }

  /** (node, component) labels equal to batch CC over every edge seen.
    * Falls back to `prev` when `current` is missing — the crash window
    * between rotating current→prev and promoting next→current leaves only
    * prev on disk, and restarting from prev is safe: the sink checkpoint
    * replays the interrupted batch, and CC is idempotent to re-merged
    * edges. */
  def currentState(spark: SparkSession, stateDir: String): Option[DataFrame] = {
    val (fs, base) = fsOf(spark, stateDir)
    val cur = new org.apache.hadoop.fs.Path(base, "current")
    val prev = new org.apache.hadoop.fs.Path(base, "prev")
    if (fs.exists(cur)) Some(spark.read.parquet(cur.toString))
    else if (fs.exists(prev)) Some(spark.read.parquet(prev.toString))
    else None
  }

  /** State rotation via the Hadoop FileSystem API (works on HDFS/object
    * stores, not just the local FS), ordered so that a complete state dir
    * exists on disk at every instant:
    * write next → drop stale prev → rename current→prev → rename
    * next→current. `prev` is retained until the NEXT successful batch, so
    * a crash at any point leaves either `current` or `prev` readable and
    * [[currentState]] recovers. */
  private def writeState(df: DataFrame, stateDir: String): Unit = {
    val spark = df.sparkSession
    val (fs, base) = fsOf(spark, stateDir)
    import org.apache.hadoop.fs.Path
    val next = new Path(base, "next")
    val cur = new Path(base, "current")
    val prev = new Path(base, "prev")
    df.write.mode("overwrite").parquet(next.toString)
    if (fs.exists(prev) && !fs.delete(prev, true))
      throw new java.io.IOException(s"cannot drop stale $prev")
    if (fs.exists(cur) && !fs.rename(cur, prev))
      throw new java.io.IOException(s"cannot rotate $cur")
    if (!fs.rename(next, cur))
      throw new java.io.IOException(s"cannot promote $next")
  }

  private def fsOf(spark: SparkSession, dir: String)
      : (org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path) = {
    val base = new org.apache.hadoop.fs.Path(dir)
    (base.getFileSystem(spark.sparkContext.hadoopConfiguration), base)
  }
}
