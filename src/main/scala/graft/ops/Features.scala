package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Entity-level feature engineering — the last step before a training
  * table leaves the pipeline. All features are exact integers relative
  * to a REFERENCE time taken from the data itself (global max event
  * time), so the same events always produce the same features in any
  * engine.
  */
object Features {

  private val dayUs = 86400000000L

  /** Per-entity activity features from an event stream:
    * (id, n_total, n_7d, n_30d, days_since_last, days_active_span) —
    * the recency/intensity covariates of churn and engagement models.
    * ONE conditional aggregation over an id-keyed shuffle; the reference
    * time is a broadcast one-row aggregate.
    */
  def activityFeatures(df: DataFrame, idCol: String,
      tsUsCol: String): DataFrame = {
    val ref = df.agg(max(col(tsUsCol)).as("__ref"))
    df.select(col(idCol).as("id"), col(tsUsCol).as("__ts"))
      .crossJoin(broadcast(ref))
      .groupBy("id")
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("__ts") > col("__ref") - 7L * dayUs, 1L).otherwise(0L))
          .as("n_7d"),
        sum(when(col("__ts") > col("__ref") - 30L * dayUs, 1L).otherwise(0L))
          .as("n_30d"),
        ((first(col("__ref")) - max(col("__ts"))) / dayUs).cast("long")
          .as("days_since_last"),
        ((max(col("__ts")) - min(col("__ts"))) / dayUs).cast("long")
          .as("days_active_span"))
  }

  /** RFM segmentation over an order log: per customer the classic
    * (recency, frequency, monetary) triple plus quartile scores 1-4 on
    * each axis (4 = best). Quartiles are EXACT rank arithmetic —
    * score = 4 − (4·(rank−1)) div n over a deterministic total order
    * (metric, ties by id) — not an interpolated ntile, so the
    * segmentation reproduces in any engine.
    *
    * Each axis rank runs over the per-customer AGGREGATE (one row per
    * customer) via [[Ranks.globalRowNumber]] — a range exchange + parallel
    * numbering, NOT a single-partition `row_number` window (VERDICT r7
    * item 5: three sequential global sorts of the customer dimension
    * would bottleneck a billion-customer table through one task each).
    * Descending axes ride the same machinery on the negated metric; the
    * unique id tie-break makes every axis a total order, so ranks are
    * engine-reproducible.
    *
    * Output: (id, recency_days, frequency, monetary_c, r_score, f_score,
    * m_score, rfm) with rfm = 100·r + 10·f + m.
    */
  def rfm(df: DataFrame, idCol: String, tsUsCol: String,
      amountCol: String): DataFrame = {
    val ref = df.agg(max(col(tsUsCol)).as("__ref"))
    val base = df.select(col(idCol).as("id"), col(tsUsCol).as("__ts"),
        floor(col(amountCol) * lit(100.0)).cast("long").as("__amt_c"))
      .crossJoin(broadcast(ref))
      .groupBy("id")
      .agg(((first(col("__ref")) - max(col("__ts"))) / dayUs).cast("long")
          .as("recency_days"),
        count(lit(1)).as("frequency"),
        sum(col("__amt_c")).as("monetary_c"))
      .localCheckpoint(true) // consumed 4× below (spine + three axis ranks)
    val nRow = base.agg(count(lit(1)).as("__n"))
    // row_number() ≡ grn when the sort ends in the unique id; desc axes
    // sort the negated metric (no nulls: count/sum over non-null amounts)
    val rr = Ranks.globalRowNumber(
        base.select(col("id"), col("recency_days")),
        Seq("recency_days", "id"), "__rr")
      .select(col("id"), col("__rr"))
    val rf = Ranks.globalRowNumber(
        base.select(col("id"), (-col("frequency")).as("__negf")),
        Seq("__negf", "id"), "__rf")
      .select(col("id"), col("__rf"))
    val rm = Ranks.globalRowNumber(
        base.select(col("id"), (-col("monetary_c")).as("__negm")),
        Seq("__negm", "id"), "__rm")
      .select(col("id"), col("__rm"))
    base.crossJoin(broadcast(nRow))
      .join(rr, "id").join(rf, "id").join(rm, "id")
      .withColumn("r_score", lit(4L) - expr("(4 * (__rr - 1)) div __n"))
      .withColumn("f_score", lit(4L) - expr("(4 * (__rf - 1)) div __n"))
      .withColumn("m_score", lit(4L) - expr("(4 * (__rm - 1)) div __n"))
      .withColumn("rfm",
        col("r_score") * 100L + col("f_score") * 10L + col("m_score"))
      .select("id", "recency_days", "frequency", "monetary_c",
        "r_score", "f_score", "m_score", "rfm")
  }

  /** Deterministic epoch shuffling for training readers: each epoch is a
    * DIFFERENT but fully replayable permutation of the corpus, cut into
    * fixed-size batches — (id, epoch, batch_id, pos_in_batch). The
    * permutation key is the md5 lane of (epoch, id), so epoch e's order
    * is uncorrelated with epoch e+1's yet identical on every run/engine;
    * ranks come from [[Ranks.globalRowNumber]] (range exchange, never a
    * single-partition sort).
    */
  def epochBatches(df: DataFrame, idCol: String, epochs: Int,
      batchSize: Int): DataFrame = {
    require(epochs >= 1 && batchSize >= 1,
      s"need epochs >= 1 and batchSize >= 1, got $epochs/$batchSize")
    val n = df.count()
    val keyed = df.select(col(idCol).as("id"))
      .withColumn("epoch", explode(sequence(lit(0), lit(epochs - 1))))
      .withColumn("__k", graft.functions.functions.hex_to_long(
        substring(md5(concat(col("epoch").cast("string"), lit("|"),
          col("id").cast("string"))), 1, 15)))
    // one global rank over (epoch, shuffle-key, id): epoch leads the sort,
    // so each epoch's ranks are the contiguous block [epoch·n+1, …] and
    // the in-epoch position falls out by subtraction — one range exchange
    // for ALL epochs instead of a window per epoch
    Ranks.globalRowNumber(keyed, Seq("epoch", "__k", "id"))
      .withColumn("__pos0", col("grn") - 1L - col("epoch") * n)
      .select(col("id"), col("epoch"),
        expr(s"__pos0 div $batchSize").as("batch_id"),
        expr(s"__pos0 % $batchSize").as("pos_in_batch"))
  }

  /** Length-bucketed batching — the padding-waste killer of a training
    * reader: group sequences into `bucketWidth`-wide length buckets and
    * batch WITHIN a bucket (ordered by exact length, id tie-break), so a
    * batch's members have near-equal lengths and pad-to-max waste is
    * bounded by the bucket width instead of the corpus max.
    *
    * Same machinery as [[epochBatches]]: ONE [[Ranks.globalRowNumber]]
    * range exchange over (bucket, len, id) — bucket leads the sort, so
    * each bucket occupies a contiguous global-rank block and the
    * in-bucket position is grn minus the bucket's min grn (a tiny
    * per-bucket offset aggregate broadcast back; the rankPermille trick).
    * No per-bucket window, no skew from popular lengths.
    *
    * Output: (id, len, bucket, batch_id, pos_in_batch) — batch_id is
    * per-bucket, 0-based; the final (possibly short) batch per bucket is
    * the caller's drop/keep policy.
    */
  def lengthBucketedBatches(df: DataFrame, idCol: String, lenCol: String,
      bucketWidth: Int, batchSize: Int): DataFrame = {
    require(bucketWidth >= 1 && batchSize >= 1,
      s"need bucketWidth >= 1 and batchSize >= 1, got $bucketWidth/$batchSize")
    val keyed = df.select(col(idCol).as("id"),
        col(lenCol).cast("long").as("len"))
      .where(col("len").isNotNull)
      .withColumn("bucket", expr(s"len div $bucketWidth"))
    val numbered = Ranks.globalRowNumber(keyed, Seq("bucket", "len", "id"))
      .localCheckpoint(true) // spine + offset aggregate both read it
    val offsets = numbered.groupBy(col("bucket"))
      .agg(min(col("grn")).as("__gmin"))
    numbered.join(broadcast(offsets), Seq("bucket"))
      .withColumn("__pos0", col("grn") - col("__gmin"))
      .select(col("id"), col("len"), col("bucket"),
        expr(s"__pos0 div $batchSize").as("batch_id"),
        expr(s"__pos0 % $batchSize").as("pos_in_batch"))
  }
}
