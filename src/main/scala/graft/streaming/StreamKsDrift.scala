package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Continuous two-sample KS drift (VERDICT r8 item 7, 19th module): per
  * tumbling event-time window and key, how far apart are the value
  * distributions of the two slices (reference vs candidate, en vs
  * non-en, control vs treatment) — the streaming twin of
  * [[graft.ops.KsTest.twoSampleSketch]].
  *
  * Same discipline as [[StreamQuantiles]]: the per-(key, window) state is
  * TWO mergeable bottom-k sketches (one per slice, carried by one
  * windowed aggregate — [[graft.functions.QuantileSampleAgg]] skips
  * nulls, so `when(slice, …)` routes each row to its slice's sketch) plus
  * two exact counts; watermark + append mode emits each window once. The
  * KS extraction afterwards is the IDENTICAL stateless array algebra as
  * the batch form ([[graft.ops.KsTest.sketchKs]]), which the
  * stream≡batch spec leans on: the md5-lane sample is a pure function of
  * the window's input multiset, so arrival order cannot change a row.
  *
  * Output per closed window: (key, window_start_us, n_a, n_b, sn_a,
  * sn_b, d_num, at_value, ks_permille).
  */
object StreamKsDrift {

  def windowedKs(stream: DataFrame, tsCol: String, keyCol: String,
      sliceCol: String, valCol: String, k: Int,
      windowDuration: String, delayThreshold: String): DataFrame = {
    require(k >= 8 && k <= 65536, s"k must be in [8, 65536], got $k")
    val v: Column = col(valCol).cast("long")
    val ina: Column = col(sliceCol).cast("boolean")
    val h = graft.functions.functions.hex_to_long(
      substring(md5(v.cast("string")), 1, 15))
    val agged = stream
      .where(ina.isNotNull && v.isNotNull)
      .select(col(tsCol), col(keyCol).as("key"), ina.as("__in_a"),
        v.as("__v"), h.as("__h"))
      .withWatermark(tsCol, delayThreshold)
      .groupBy(col("key"), window(col(tsCol), windowDuration))
      .agg(
        graft.functions.QuantileSample.quantile_sample(
          when(col("__in_a"), col("__h")), when(col("__in_a"), col("__v")),
          k).as("__sa"),
        graft.functions.QuantileSample.quantile_sample(
          when(!col("__in_a"), col("__h")), when(!col("__in_a"), col("__v")),
          k).as("__sb"),
        sum(when(col("__in_a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(col("__in_a"), 0L).otherwise(1L)).as("n_b"))
    graft.ops.KsTest.sketchKs(
        agged.select(col("key"),
          unix_micros(col("window.start")).as("window_start_us"),
          col("__sa"), col("__sb"), col("n_a"), col("n_b")))
      .select("key", "window_start_us", "n_a", "n_b", "sn_a", "sn_b",
        "d_num", "at_value", "ks_permille")
  }
}
