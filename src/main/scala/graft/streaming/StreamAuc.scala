package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Continuous model-quality monitoring — the streaming counterpart of
  * [[graft.ops.Auc.aucByGroup]]: per tumbling event-time window, the
  * exact Mann–Whitney AUC of a BUCKETED score against a binary label.
  *
  * The trick that keeps this on the [[StreamValidation]] discipline
  * (plain watermark + windowed agg, no flatMapGroupsWithState): with
  * scores pre-bucketed to 0..B−1, the per-window sufficient statistic is
  * a FIXED-WIDTH histogram — 2·B conditional sums, all associative — and
  * the doubled U statistic unrolls over the B buckets in a stateless
  * projection:
  *
  *   2U = Σ_k p_k · (2·Σ_{j<k} n_j + n_k)
  *
  * State is one row per window, evicted at the watermark; append mode
  * emits each window exactly once, when final. Bucketing trades score
  * resolution for bounded state — exactly the trade a monitor wants.
  *
  * Output: (window_start_us, n_pos, n_neg, u2, auc_permille) — the same
  * integer pieces the batch operator reports, NULL AUC for one-class
  * windows.
  */
object StreamAuc {

  def windowedAuc(stream: DataFrame, tsCol: String, bucketCol: String,
      labelCol: String, nBuckets: Int, windowDuration: String,
      delayThreshold: String): DataFrame = {
    require(nBuckets >= 2 && nBuckets <= 64,
      s"nBuckets must be in [2, 64], got $nBuckets")
    val b = col(bucketCol).cast("long")
    val lab = col(labelCol).cast("long")
    val aggs: Seq[Column] = (0 until nBuckets).flatMap { k =>
      Seq(
        sum(when(b === k && lab === 1L, 1L).otherwise(0L)).as(s"p$k"),
        sum(when(b === k && lab === 0L, 1L).otherwise(0L)).as(s"n$k"))
    }
    val hist = stream
      .withWatermark(tsCol, delayThreshold)
      .groupBy(window(col(tsCol), windowDuration))
      .agg(aggs.head, aggs.tail: _*)
    val nPos = (0 until nBuckets).map(k => col(s"p$k")).reduce(_ + _)
    val nNeg = (0 until nBuckets).map(k => col(s"n$k")).reduce(_ + _)
    val u2 = (0 until nBuckets).map { k =>
      val negBelow =
        if (k == 0) lit(0L)
        else (0 until k).map(j => col(s"n$j")).reduce(_ + _)
      col(s"p$k") * (lit(2L) * negBelow + col(s"n$k"))
    }.reduce(_ + _)
    hist.select(unix_micros(col("window.start")).as("window_start_us"),
        nPos.as("n_pos"), nNeg.as("n_neg"), u2.as("u2"))
      .withColumn("auc_permille",
        when(col("n_pos") > 0L && col("n_neg") > 0L,
          expr("(1000 * u2) div (2 * n_pos * n_neg)"))
          .otherwise(lit(null)))
  }
}
