package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Subsample-bootstrap confidence intervals — "how sure are we about
  * this mean" without any distributional assumption: B deterministic
  * half-samples (row r belongs to replica b iff the md5 lane of
  * `b:id` is even — the m-out-of-n bootstrap with a REPLAYABLE
  * membership coin, not an RNG), a floored integer mean per replica,
  * and the percentile CI read off the ORDER STATISTICS of the B
  * replica means (ranks ceil(B·lo/1000), ceil(B·hi/1000); ties broken
  * by replica index). No sqrt, no t-table — everything stays exact
  * integers, so the whole audit is oracle-replayable.
  *
  * Scale shape: the replica fan-out is an explode by B (one scan,
  * B× shuffle volume of the value column only), then (group, replica)
  * and group-dimension aggregates; the rank window runs over B rows
  * per group. B is the knob — 20 replicas ⇒ 5%/95% at rank 1-ish
  * resolution.
  *
  * Output per group: (grp, n, mean_c, b_reps, ci_lo_c, ci_hi_c).
  */
object Bootstrap {

  def meanCi(df: DataFrame, grpCol: String, idCol: String, valCol: String,
      bReps: Int, loPermille: Int, hiPermille: Int,
      salt: String = "boot"): DataFrame = {
    require(bReps >= 4 && bReps <= 200, s"bReps must be in [4, 200], got $bReps")
    require(loPermille >= 1 && hiPermille <= 999 && loPermille < hiPermille,
      s"bad CI permilles ($loPermille, $hiPermille)")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(grpCol).as("grp"),
        col(idCol).cast("string").as("id"), col(valCol).cast("long").as("v"))
      .where(col("v").isNotNull)
    val overall = base.groupBy("grp")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      .select(col("grp"), col("n"), expr("s div n").as("mean_c"))
    val reps = base
      .crossJoin(broadcast((0 until bReps).toDF("b")))
      .where(pmod(graft.functions.functions.hex_to_long(
        substring(md5(concat(lit(salt), col("b").cast("string"), lit(":"),
          col("id"))), 1, 13)), lit(2L)) === 0L)
      .groupBy("grp", "b")
      .agg(count(lit(1)).as("nb"), sum(col("v")).as("sb"))
      .where(col("nb") > 0L)
      .select(col("grp"), col("b"), expr("sb div nb").as("mb"))
    val w = Window.partitionBy(col("grp")).orderBy(col("mb"), col("b"))
    val ranked = reps
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("nr", count(lit(1)).over(Window.partitionBy(col("grp"))))
    val lo = ranked
      .where(col("rk") === expr(s"greatest((nr * $loPermille + 999) div 1000, 1)"))
      .select(col("grp"), col("mb").as("ci_lo_c"))
    val hi = ranked
      .where(col("rk") === expr(s"greatest((nr * $hiPermille + 999) div 1000, 1)"))
      .select(col("grp"), col("mb").as("ci_hi_c"))
    overall
      .join(broadcast(ranked.groupBy("grp").agg(max(col("nr")).as("b_reps"))),
        Seq("grp"))
      .join(broadcast(lo), Seq("grp"))
      .join(broadcast(hi), Seq("grp"))
      .select("grp", "n", "mean_c", "b_reps", "ci_lo_c", "ci_hi_c")
  }
}
