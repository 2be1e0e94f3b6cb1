package graft.ops

import graft.functions.Hll
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** One-pass column profiling — the routine first step over a new 100 TB
  * table: per column, null count, min/max, and a distinct-count sketch,
  * all from a SINGLE wide aggregation (one scan, map-side combined; no
  * per-column jobs, no COUNT(DISTINCT) shuffle of every value). The
  * aggregate result is one row; shaping it into per-column rows is a
  * driver-side transpose of that single row, not a data-plane collect.
  *
  * Distinct counts come from the md5-lane HLL registers
  * ([[graft.functions.HllRegistersAgg]]): `distinct_digest` is the
  * register dot-product Σ reg_val·(reg_idx+1) — pure integer, reproducible
  * in any engine (the q_profile oracle recomputes it in SQL), while
  * `distinct_est` is the standard HLL estimate (accuracy covered in
  * ProfilerSpec, excluded from cross-engine comparison because the
  * harmonic-mean arithmetic is float).
  *
  * Values are hashed/compared via their canonical string form, so profile
  * floats with care (float→string formatting is engine-specific); integer
  * and string columns are engine-portable.
  */
object Profiler {

  def profile(df: DataFrame, cols: Seq[String], p: Int = 6): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    val spark = df.sparkSession
    val aggs = cols.flatMap { c =>
      val s = col(c).cast("string")
      Seq(
        count(lit(1)).as(s"${c}__rows"),
        count(col(c)).as(s"${c}__nonnull"),
        min(s).as(s"${c}__min"),
        max(s).as(s"${c}__max"),
        Hll.hll_registers(
          graft.functions.functions.hex_to_long(substring(md5(s), 1, 15)), p)
          .as(s"${c}__regs"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val out = cols.zipWithIndex.map { case (c, i) =>
      val base = i * 5
      val nRows = row.getLong(base)
      val nonNull = row.getLong(base + 1)
      val regs = row.getSeq[Int](base + 4)
      val digest = regs.zipWithIndex.map { case (v, j) => v.toLong * (j + 1) }.sum
      Row(c, nRows, nRows - nonNull, row.getString(base + 2),
        row.getString(base + 3), digest,
        math.round(Hll.estimate(regs)))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(out, 1),
      StructType(Seq(
        StructField("column", StringType, nullable = false),
        StructField("n_rows", LongType, nullable = false),
        StructField("n_nulls", LongType, nullable = false),
        StructField("min_str", StringType, nullable = true),
        StructField("max_str", StringType, nullable = true),
        StructField("distinct_digest", LongType, nullable = false),
        StructField("distinct_est", LongType, nullable = false))))
  }
}
