package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Exactly-once-per-batch parquet sink for `foreachBatch` pipelines — the
  * write-side half of streaming exactly-once: Structured Streaming
  * guarantees a FAILED micro-batch is REPLAYED with the same `batchId`
  * and the same deterministic content, so a sink that (a) keys each
  * batch's output by its id and (b) skips ids that already committed
  * turns at-least-once delivery into exactly-once effects.
  *
  * Commit protocol is the standard `_SUCCESS`-marker one:
  *
  *   - `batch_id=N` exists WITH `_SUCCESS`  → committed: skip (replay)
  *   - exists WITHOUT `_SUCCESS`            → a crashed attempt: overwrite
  *   - absent                               → write
  *
  * The exists-check + write pair is not atomic, but foreachBatch runs
  * batches serially on one driver — there is exactly one writer per
  * stream, which is the precondition Structured Streaming itself
  * operates under. Readers take only committed batch dirs
  * ([[readCommitted]]), so a concurrent reader never sees a partial
  * attempt.
  */
object IdempotentSink {

  /** Write `df` under `basePath/batch_id=N` unless that batch already
    * committed. Returns true when data was (re)written, false on skip.
    */
  def writeOnce(df: DataFrame, basePath: String, batchId: Long): Boolean = {
    val dir = new Path(s"$basePath/batch_id=$batchId")
    val fs = dir.getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val committed = fs.exists(new Path(dir, "_SUCCESS"))
    if (committed) false
    else {
      // a dir without _SUCCESS is a crashed attempt — overwrite it whole
      df.write.mode("overwrite").parquet(dir.toString)
      true
    }
  }

  /** Union of all COMMITTED batches (dirs carrying `_SUCCESS`), with the
    * batch id restored as a `batch_id` column. Uncommitted attempt dirs
    * are invisible. Empty base dirs yield None (no schema to offer).
    */
  def readCommitted(spark: SparkSession, basePath: String): Option[DataFrame] = {
    val base = new Path(basePath)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) return None
    val dirs = fs.listStatus(base).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter(p => p.getName.startsWith("batch_id=") &&
        fs.exists(new Path(p, "_SUCCESS")))
    if (dirs.isEmpty) None
    else Some(dirs.map { p =>
      import org.apache.spark.sql.functions.lit
      val id = p.getName.stripPrefix("batch_id=").toLong
      spark.read.parquet(p.toString).withColumn("batch_id", lit(id))
    }.reduce(_ unionByName _))
  }
}
