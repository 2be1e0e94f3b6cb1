package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton curve) data layout — multi-dimensional clustering so
  * per-file min/max statistics prune scans on EVERY laid-out column, not
  * just the leading sort key.
  *
  * A plain `ORDER BY a` layout makes files narrow in `a` and full-range in
  * `b`: a predicate on `b` prunes nothing. Interleaving the bits of both
  * keys and range-partitioning + sorting by the interleaved value places
  * rows so each file covers a small RECTANGLE in (a, b) space — both
  * columns get narrow per-file ranges, and a filter on either prunes most
  * files at the footer-stats level before any row is read. This is the
  * standard lakehouse layout trick for 100 TB fact tables queried on
  * multiple independent dimensions.
  *
  * The z-value itself is pure bitwise column algebra (the classic
  * shift-or-mask bit spread), fully inside whole-stage codegen and
  * reproducible with the same integer ops in any engine — see
  * [[spreadOracleCtes]] for the SQL mirror.
  */
object ZOrderLayout {

  /** Spread the low 16 bits of `c` to even bit positions (0, 2, 4, ...). */
  private[graft] def spread16(c: Column): Column = {
    var x = c.bitwiseAND(lit(65535L))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(16711935L))    // 0x00FF00FF
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(252645135L))   // 0x0F0F0F0F
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(858993459L))   // 0x33333333
    x = x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(1431655765L))  // 0x55555555
    x
  }

  /** 32-bit Morton code of two 16-bit keys: bits of `a` at even
    * positions, bits of `b` at odd ones. Callers quantize wider domains
    * to 16 bits first (modulo, range bucketing, or rank). */
  def zValue2(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Cluster `df` into `numFiles` range partitions of the Morton curve,
    * sorted within each — the write-side layout call. */
  def layout(df: DataFrame, a: Column, b: Column, numFiles: Int): DataFrame = {
    val z = zValue2(a, b)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** Min/max file-skipping audit over the z-bucketed layout — the number
    * that justifies Z-ordering at 100 TB: for each probe rectangle
    * (laᵢ..haᵢ × lbᵢ..hbᵢ), how many buckets ("files") a min/max index
    * prunes outright and how much data the surviving scan touches vs
    * actually matches. Because Morton buckets are rectangles in key
    * space, slab and box probes prune aggressively — the audit proves it
    * on the real key distribution instead of asserting it.
    *
    * One scan, ONE aggregate: per-bucket min/max of both keys AND one
    * conditional matched-count per probe ride the same groupBy; probes
    * then explode per bucket (|probes| ≤ 16) into a probe-keyed rollup.
    *
    * Output per probe: (probe_id, n_buckets, n_pruned, rows_total,
    * rows_scanned, rows_matched, prune_permille).
    */
  def pruningAudit(df: DataFrame, aCol: Column, bCol: Column,
      probes: Seq[(Long, Long, Long, Long)],
      bucketShift: Int = 24): DataFrame = {
    require(probes.nonEmpty && probes.length <= 16,
      s"need 1..16 probes, got ${probes.length}")
    require(bucketShift >= 0 && bucketShift < 32,
      s"bucketShift must be in [0, 32), got $bucketShift")
    val z = df.select(aCol.cast("long").as("a"), bCol.cast("long").as("b"))
      .withColumn("z", zValue2(col("a"), col("b")))
    val matchedAggs = probes.zipWithIndex.map { case ((la, ha, lb, hb), i) =>
      sum(when(col("a").between(la, ha) && col("b").between(lb, hb), 1L)
        .otherwise(0L)).as(s"m$i")
    }
    val baseAggs = Seq(count(lit(1)).as("n_rows"),
      min(col("a")).as("min_a"), max(col("a")).as("max_a"),
      min(col("b")).as("min_b"), max(col("b")).as("max_b")) ++ matchedAggs
    val stats = z.groupBy(shiftright(col("z"), bucketShift).as("z_bucket"))
      .agg(baseAggs.head, baseAggs.tail: _*)
    stats.select(explode(array(probes.zipWithIndex.map {
        case ((la, ha, lb, hb), i) =>
          struct(lit(i.toLong).as("probe_id"), col("n_rows"),
            (col("max_a") < la || col("min_a") > ha ||
              col("max_b") < lb || col("min_b") > hb).as("pruned"),
            col(s"m$i").as("matched"))
      }: _*)).as("p"))
      .select(col("p.*"))
      .groupBy("probe_id")
      .agg(count(lit(1)).as("n_buckets"),
        sum(when(col("pruned"), 1L).otherwise(0L)).as("n_pruned"),
        sum(col("n_rows")).as("rows_total"),
        sum(when(col("pruned"), 0L).otherwise(col("n_rows")))
          .as("rows_scanned"),
        sum(col("matched")).as("rows_matched"))
      .withColumn("prune_permille", expr("(1000 * n_pruned) div n_buckets"))
  }

  /** SQL mirror of [[spread16]]/[[zValue2]] as chained CTEs over columns
    * `a` and `b` of `src`: exposes `zfin(..., z)`. Kept textually next to
    * the Column form so the two cannot drift apart. */
  def spreadOracleCtes(src: String): String =
    s"""z0 AS (SELECT *, (a & 65535) AS za, (b & 65535) AS zb FROM $src),
       |z1 AS (SELECT *, ((za | (za << 8)) & 16711935) AS za1, ((zb | (zb << 8)) & 16711935) AS zb1 FROM z0),
       |z2 AS (SELECT *, ((za1 | (za1 << 4)) & 252645135) AS za2, ((zb1 | (zb1 << 4)) & 252645135) AS zb2 FROM z1),
       |z3 AS (SELECT *, ((za2 | (za2 << 2)) & 858993459) AS za3, ((zb2 | (zb2 << 2)) & 858993459) AS zb3 FROM z2),
       |z4 AS (SELECT *, ((za3 | (za3 << 1)) & 1431655765) AS za4, ((zb3 | (zb3 << 1)) & 1431655765) AS zb4 FROM z3),
       |zfin AS (SELECT *, (za4 | (zb4 << 1)) AS z FROM z4)""".stripMargin
}
