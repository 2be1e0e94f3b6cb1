package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Continuous heavy hitters (24th module): per tumbling event-time
  * window, Count-Min estimates for a fixed probe list of items — the
  * streaming twin of [[graft.ops.FrequencySketch.heavyHitters]], for
  * "which tracked tokens / urls / error codes spiked this window" over
  * a stream whose raw item cardinality would melt an exact per-item
  * state store.
  *
  * ONE stateful aggregation, in three stateless-wrapped steps:
  *   1. each event explodes into its `depth` (lane j, bucket idx) cells —
  *      the identical md5-lane arithmetic as the batch sketch
  *      ([[graft.ops.FrequencySketch.cmsTable]]), so stream and batch
  *      agree bit-for-bit;
  *   2. a stream-static BROADCAST join keeps only cells some probe item
  *      hashes to, tagging them with that item — collision mass from
  *      untracked items flows in correctly because the join key is the
  *      CELL, not the item value;
  *   3. one watermarked groupBy (item, window) with per-lane pivot
  *      counts; the CMS min-over-lanes is then a stateless `least`.
  *
  * State per (item, window) is `depth` longs — bounded by the probe list,
  * NOT by the stream's item cardinality; append mode emits each window
  * once at watermark close. Every step is order-independent integer
  * math, which the stream≡batch spec leans on.
  *
  * Append-mode delta vs the batch estimator (documented, spec-pinned):
  * batch `estimateCounts` LEFT-joins the sketch and so emits probe items
  * with est = 0; a probe item none of whose cells saw any event produces
  * no streaming row at all. Rows with est = 0 can still appear (one lane
  * hit, another empty). Compare after filtering both sides to est > 0,
  * or treat absence as zero.
  *
  * Output per closed window: (item, window_start_us, est, is_heavy).
  */
object StreamHeavyHitters {

  def windowedHeavyHitters(stream: DataFrame, tsCol: String,
      itemCol: String, items: DataFrame, probeItemCol: String,
      depth: Int, width: Int, threshold: Long,
      windowDuration: String, delayThreshold: String): DataFrame = {
    require(depth >= 1 && depth <= 4,
      s"depth must be in [1, 4] (md5 yields four 32-bit lanes), got $depth")
    require(width >= 16 && width <= (1 << 30),
      s"width must be in [16, 2^30], got $width")
    require(threshold >= 1, s"threshold must be >= 1, got $threshold")

    def lane(j: Column): Column =
      graft.functions.functions.hex_to_long(
        expr("substring(__md5, j * 8 + 1, 8)")) % width
    def cells(df: DataFrame, c: String, keep: Column*): DataFrame =
      df.where(col(c).isNotNull)
        .withColumn("__md5", md5(col(c).cast("string")))
        .withColumn("j", explode(array((0 until depth).map(lit): _*)))
        .select(keep :+ col("j") :+ lane(col("j")).as("idx"): _*)

    val probeCells = broadcast(
      cells(items.select(col(probeItemCol).as("item")).distinct(),
        "item", col("item")))
    // the watermark sits UPSTREAM of the probe join: rows matching no
    // probe cell still advance event time (otherwise a stream of
    // untracked items would never close a window)
    val eventCells = cells(
      stream.select(col(tsCol), col(itemCol).as("__item"))
        .withWatermark(tsCol, delayThreshold),
      "__item", col(tsCol))
    val perLane = eventCells
      .join(probeCells, Seq("j", "idx"))
      .groupBy(col("item"), window(col(tsCol), windowDuration))
      .agg(
        sum(when(col("j") === 0, 1L).otherwise(0L)).as("__c0"),
        (1 until depth).map(j =>
          sum(when(col("j") === j, 1L).otherwise(0L)).as(s"__c$j")): _*)
    val est =
      if (depth == 1) col("__c0")
      else least((0 until depth).map(j => col(s"__c$j")): _*)
    perLane.select(col("item"),
      unix_micros(col("window.start")).as("window_start_us"),
      est.as("est"), (est >= threshold).as("is_heavy"))
  }
}
