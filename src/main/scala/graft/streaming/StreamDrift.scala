package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Continuous distribution-drift monitoring — the streaming counterpart
  * of [[graft.ops.KsTest.twoSample]]: per tumbling event-time window,
  * the exact two-sample Kolmogorov–Smirnov distance between the slice
  * (`sliceCol` true) and the rest, over BUCKETED values.
  *
  * Same discipline as [[StreamAuc]]: bucketing makes the per-window
  * sufficient statistic a fixed-width pair of histograms (2·B
  * associative sums), and the cross-multiplied CDF gap
  *
  *   D·n_a·n_b = max_k |cumA(k)·n_b − cumB(k)·n_a|
  *
  * unrolls over the B buckets in a stateless projection — plain
  * watermark + windowed agg, one state row per window, append mode
  * emits each window once. Empty buckets repeat the previous cumulative
  * gap, so bucket granularity bounds resolution, never correctness.
  *
  * Output: (window_start_us, n_a, n_b, d_num, ks_permille) — NULL KS
  * when either side is empty in the window.
  */
object StreamDrift {

  def windowedKs(stream: DataFrame, tsCol: String, sliceCol: String,
      bucketCol: String, nBuckets: Int, windowDuration: String,
      delayThreshold: String): DataFrame = {
    require(nBuckets >= 2 && nBuckets <= 64,
      s"nBuckets must be in [2, 64], got $nBuckets")
    val b = col(bucketCol).cast("long")
    val inA = col(sliceCol).cast("boolean")
    val aggs: Seq[Column] = (0 until nBuckets).flatMap { k =>
      Seq(sum(when(b === k && inA, 1L).otherwise(0L)).as(s"a$k"),
        sum(when(b === k && !inA, 1L).otherwise(0L)).as(s"b$k"))
    }
    val hist = stream
      .withWatermark(tsCol, delayThreshold)
      .groupBy(window(col(tsCol), windowDuration))
      .agg(aggs.head, aggs.tail: _*)
    val nA = (0 until nBuckets).map(k => col(s"a$k")).reduce(_ + _)
    val nB = (0 until nBuckets).map(k => col(s"b$k")).reduce(_ + _)
    val gaps = (0 until nBuckets).map { k =>
      val cumA = (0 to k).map(j => col(s"a$j")).reduce(_ + _)
      val cumB = (0 to k).map(j => col(s"b$j")).reduce(_ + _)
      abs(cumA * col("n_b") - cumB * col("n_a"))
    }
    val keep = Seq(unix_micros(col("window.start")).as("window_start_us"),
      nA.as("n_a"), nB.as("n_b")) ++
      (0 until nBuckets).map(k => col(s"a$k")) ++
      (0 until nBuckets).map(k => col(s"b$k"))
    hist.select(keep: _*)
      .withColumn("d_num", greatest(gaps: _*))
      .select(col("window_start_us"), col("n_a"), col("n_b"), col("d_num"),
        when(col("n_a") > 0L && col("n_b") > 0L,
          expr("(1000 * d_num) div (n_a * n_b)"))
          .otherwise(lit(null)).as("ks_permille"))
  }
}
