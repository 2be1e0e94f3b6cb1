package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise Pearson correlation matrix over integer feature columns —
  * the "which metrics move together" profiling step. Everything reduces
  * to integer sufficient sums in ONE aggregate over ONE scan (p sums,
  * p square-sums, p·(p−1)/2 cross-sums — no per-pair passes), then each
  * pair's coefficient is derived by a fixed double expression over its
  * sums:
  *
  *   r = (n·Σxy − Σx·Σy) / (√max(n·Σx² − (Σx)², 0) · √max(n·Σy² − (Σy)², 0))
  *
  * — the [[GraphStats]] assortativity discipline: the sums hash-match
  * exactly, and the doubles match because both engines execute the
  * IDENTICAL correctly-rounded IEEE sequence (the max-with-0 guards the
  * sqrt against the tiny negative a >2⁵³ product can round to). A
  * zero-variance column yields NULL via try_divide, matching DuckDB's
  * NULL-on-zero-divisor division.
  *
  * Inputs must be pre-scaled to integers (cents/permille) with
  * |value| small enough that Σx² fits a long — floor to coarser units
  * first at larger scales.
  *
  * Output: one row per unordered pair (col_a < col_b by input order):
  * (col_a, col_b, n, sx, sy, sxy, sx2, sy2, corr).
  */
object Correlation {

  def pairwiseCorr(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.length >= 2, s"need at least 2 columns, got ${cols.length}")
    require(cols.distinct.length == cols.length, "duplicate column names")
    val d = df.select(cols.map(c => col(c).cast("long").as(c)): _*)
      .where(cols.map(c => col(c).isNotNull).reduce(_ && _))
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.length
    } yield (cols(i), cols(j))
    val aggs = count(lit(1)).as("n") +:
      (cols.map(c => sum(col(c)).as(s"s_$c")) ++
        cols.map(c => sum(col(c) * col(c)).as(s"q_$c")) ++
        pairs.map { case (a, b) =>
          sum(col(a) * col(b)).as(s"x_${a}_$b")
        })
    val one = d.agg(aggs.head, aggs.tail: _*)
    one.select(explode(array(pairs.map { case (a, b) =>
        struct(lit(a).as("col_a"), lit(b).as("col_b"), col("n"),
          col(s"s_$a").as("sx"), col(s"s_$b").as("sy"),
          col(s"x_${a}_$b").as("sxy"), col(s"q_$a").as("sx2"),
          col(s"q_$b").as("sy2"))
      }: _*)).as("p"))
      .select(col("p.*"))
      .withColumn("corr", corrExpr)
  }

  private def corrExpr =
    expr("""try_divide(
        cast(n as double) * cast(sxy as double)
          - cast(sx as double) * cast(sy as double),
        sqrt(greatest(cast(n as double) * cast(sx2 as double)
          - cast(sx as double) * cast(sx as double), cast(0 as double)))
        * sqrt(greatest(cast(n as double) * cast(sy2 as double)
          - cast(sy as double) * cast(sy as double), cast(0 as double))))""")
}
