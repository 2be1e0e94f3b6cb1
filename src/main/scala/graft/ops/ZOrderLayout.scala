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
