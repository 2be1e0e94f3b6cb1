package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField}

/** Scale-safe global sequence numbering: `ROW_NUMBER() OVER (ORDER BY …)`
  * without the single-partition window Spark would otherwise plan (a
  * global window frame funnels the ENTIRE dataset through one task — the
  * canonical 100 TB anti-pattern; Spark even warns "No Partition Defined
  * for Window operation").
  *
  * Two-pass shape instead: range-repartition on the sort key (the same
  * exchange a global `orderBy` uses, so skew handling and spill come
  * from Spark's own range partitioner), sort within partitions, then
  * `zipWithIndex` — whose internal first pass counts per-partition rows
  * and second pass adds the per-partition offsets. Every partition is
  * numbered in parallel; nothing is ever collected. (This is the one
  * legitimate RDD drop-down in the repo: per-partition imperative
  * numbering with a partition-index closure, which the DataFrame API
  * cannot express without a driver-side offset join.)
  *
  * DETERMINISM: ranks 1..N follow the (sortCols) total order. Range
  * boundaries never affect the result (equal keys land in one partition
  * and the within-partition sort restores full order), but ROWS THAT TIE
  * ON ALL sortCols get an arbitrary relative order — pass a unique
  * tie-breaker (an id) as the last sort column, exactly as you would
  * under a window `ROW_NUMBER`.
  *
  * Output: the input columns plus `grn` (1-based global rank).
  */
object Ranks {

  def globalRowNumber(df: DataFrame, sortCols: Seq[String],
      rankCol: String = "grn"): DataFrame = {
    require(sortCols.nonEmpty, "globalRowNumber needs at least one sort column")
    require(!df.columns.contains(rankCol),
      s"input already has a '$rankCol' column — pass a different rankCol")
    val spark = df.sparkSession
    val sorted = df
      .repartitionByRange(sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
    val schema = sorted.schema.add(rankCol, LongType, nullable = false)
    val numbered = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(numbered, schema)
  }

  /** Scale-safe global running sums: `SUM(c) OVER (ORDER BY … ROWS
    * UNBOUNDED PRECEDING)` for each of `sumCols`, WITHOUT the
    * single-partition window Spark would otherwise plan (VERDICT r8 item
    * 1: the last unpartitioned WindowExec sites funneled whole
    * distinct-value tables through one task).
    *
    * Same two-pass shape as [[globalRowNumber]]: range-repartition on the
    * sort key + within-partition sort (pinned once with an eager
    * localCheckpoint so both passes read the same partitions), then
    *   pass 1: per-partition column totals — one `(pid, totals)` row per
    *           partition, collected to the driver (numPartitions·k longs,
    *           bounded by cluster config exactly like zipWithIndex's
    *           internal count collect);
    *   pass 2: per-partition running sums seeded with the exclusive
    *           prefix of the earlier partitions' totals.
    * Every partition accumulates in parallel; no data-sized state ever
    * leaves the executors.
    *
    * DETERMINISM: same contract as [[globalRowNumber]] — rows tying on
    * all `sortCols` get an arbitrary relative order, so either pass a
    * unique key or (the callers' pattern) feed a table already grouped
    * by the sort key. All `sumCols` must be LongType and non-null.
    *
    * Output: the input columns plus `<prefix><c>` (long) running-sum
    * columns, rows in (sortCols) order within their partitions.
    */
  def globalCumSums(df: DataFrame, sortCols: Seq[String],
      sumCols: Seq[String], prefix: String = "cum_"): DataFrame = {
    require(sortCols.nonEmpty, "globalCumSums needs at least one sort column")
    require(sumCols.nonEmpty, "globalCumSums needs at least one sum column")
    val spark = df.sparkSession
    sumCols.foreach { c =>
      val f = df.schema(c)
      require(f.dataType == LongType,
        s"globalCumSums: column '$c' must be LongType, got ${f.dataType}")
      require(!df.columns.contains(prefix + c),
        s"input already has a '${prefix + c}' column")
    }
    val sorted = df
      .repartitionByRange(sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .localCheckpoint(true)
    val idx = sumCols.map(c => sorted.schema.fieldIndex(c)).toArray
    val k = idx.length
    val rdd = sorted.rdd
    val nParts = rdd.getNumPartitions
    val partTotals = rdd.mapPartitionsWithIndex { (pid, it) =>
      val acc = new Array[Long](k)
      it.foreach { r =>
        var i = 0
        while (i < k) { acc(i) += r.getLong(idx(i)); i += 1 }
      }
      Iterator((pid, acc))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = Array.ofDim[Long](nParts, k)
    var p = 1
    while (p < nParts) {
      var i = 0
      while (i < k) {
        offsets(p)(i) = offsets(p - 1)(i) + partTotals(p - 1)(i)
        i += 1
      }
      p += 1
    }
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields ++
        sumCols.map(c => StructField(prefix + c, LongType, nullable = false)))
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      val acc = offsets(pid).clone()
      it.map { r =>
        var i = 0
        while (i < k) { acc(i) += r.getLong(idx(i)); i += 1 }
        Row.fromSeq(r.toSeq ++ acc.toSeq)
      }
    }
    spark.createDataFrame(out, schema)
  }
}
