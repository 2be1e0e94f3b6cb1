package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Continuous windowed quantiles — per tumbling event-time window and
  * key, order-statistic quantiles (P50/P95/…) from the bottom-k sketch
  * aggregate ([[graft.functions.QuantileSampleAgg]]): the streaming
  * "what's my P95 latency this hour" primitive.
  *
  * Same discipline as [[StreamValidation]]/[[StreamAuc]]: the per-window
  * state is ONE mergeable sketch row (k (hash, value) slots — the
  * md5-lane sample is deterministic, so stream ≡ batch exactly), plain
  * watermark + windowed agg, append mode emits each window once. The
  * quantile extraction afterwards is stateless array algebra — the
  * identical tail as the batch [[graft.ops.Quantiles.sampleQuantiles]],
  * which the stream≡batch spec leans on.
  *
  * Output: (key, window_start_us, q_permille, quantile_v) — one row per
  * requested quantile per closed window.
  */
object StreamQuantiles {

  def windowedQuantiles(stream: DataFrame, tsCol: String, keyCol: String,
      valCol: String, k: Int, qsPerMille: Seq[Int],
      windowDuration: String, delayThreshold: String): DataFrame = {
    require(qsPerMille.nonEmpty && qsPerMille.forall(q => q >= 1 && q <= 1000),
      s"quantiles are per-mille ranks in [1, 1000], got $qsPerMille")
    val spark = stream.sparkSession
    import spark.implicits._
    val v: Column = col(valCol).cast("long")
    val h = graft.functions.functions.hex_to_long(
      substring(md5(v.cast("string")), 1, 15))
    val sk = stream
      .where(v.isNotNull)
      .withWatermark(tsCol, delayThreshold)
      .groupBy(col(keyCol).as("key"), window(col(tsCol), windowDuration))
      .agg(graft.functions.QuantileSample.quantile_sample(h, v, k).as("__s"))
    val qdf = qsPerMille.toDF("q_permille")
    sk.select(col("key"),
        unix_micros(col("window.start")).as("window_start_us"), col("__s"))
      .withColumn("__vs", array_sort(expr("transform(__s, x -> x.v)")))
      .withColumn("__n", size(col("__vs")))
      .crossJoin(broadcast(qdf))
      .withColumn("__ix",
        greatest(lit(1), least(col("__n"),
          expr("(__n * q_permille + 999) div 1000"))).cast("int"))
      .select(col("key"), col("window_start_us"),
        col("q_permille").cast("int").as("q_permille"),
        element_at(col("__vs"), col("__ix")).as("quantile_v"))
  }
}
