package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-anonymity audit over quasi-identifier columns (Sweeney 2002) — the
  * privacy-hygiene check a training-data release runs before shipping
  * user-derived tables: every row whose quasi-identifier combination is
  * shared by fewer than k rows is re-identifiable by linkage.
  *
  * [[classSizes]] is the audit surface: one row per equivalence class
  * (distinct quasi-identifier combination) with its size and an `at_risk`
  * 0/1 flag (n < k). Suppressing or generalizing the flagged classes is
  * the caller's policy decision; joining the flag back onto the data is
  * one broadcast/shuffle join keyed by the same columns.
  *
  * Scale shape: ONE partial-aggregated groupBy on the quasi-identifier
  * key — map-side combine collapses each partition to one row per class
  * before the shuffle, so the exchange carries classes, not rows. No
  * window, no collect.
  */
object KAnonymity {

  def classSizes(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "k-anonymity needs at least one quasi-identifier")
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("at_risk", when(col("n") < k, 1L).otherwise(0L))
  }

  /** One-row rollup of [[classSizes]]: class counts, at-risk classes, and
    * the number of ROWS living in at-risk classes (the actual exposure).
    */
  def riskSummary(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame =
    classSizes(df, quasiCols, k).agg(
      count(lit(1)).as("n_classes"),
      sum(col("at_risk")).as("n_at_risk_classes"),
      sum(col("n") * col("at_risk")).as("n_rows_at_risk"),
      min(col("n")).as("min_class"),
      max(col("n")).as("max_class"))

  /** Distinct ℓ-diversity audit (Machanavajjhala 2007) — k-anonymity's
    * necessary companion: a large QI class is still unsafe when everyone
    * in it shares the SAME sensitive value (homogeneity attack). Per QI
    * class: row count, distinct sensitive values, the largest single
    * sensitive value's frequency (the homogeneity measure), and the
    * pass/fail flag `n_sensitive >= l`.
    *
    * Two stacked partial-aggregating groupBys — (QI, sensitive) then QI —
    * both map-side combined; output is QI-class-dimension-sized.
    */
  def lDiversity(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "l-diversity needs at least one quasi-identifier")
    require(l >= 2, s"l must be >= 2, got $l")
    df.groupBy((quasiCols :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .groupBy(quasiCols.map(col): _*)
      .agg(sum(col("__n")).as("n_rows"),
        count(lit(1)).as("n_sensitive"),
        max(col("__n")).as("max_sens_n"))
      .withColumn("is_diverse", col("n_sensitive") >= l)
  }

  /** t-closeness audit (Li 2007) — the step past [[lDiversity]]: a QI
    * class can be diverse yet still LEAK when its sensitive-value mix
    * differs sharply from the corpus-wide mix (skewness attack). Per QI
    * class we report the total variation distance between the class's
    * sensitive distribution and the global one, exactly, in permille:
    *
    *   TVD(g) = ½ Σ_v |c_gv/n_g − C_v/N|
    *
    * Cross-multiplying by n_g·N keeps every term an integer, and values
    * ABSENT from the class are folded in closed form — they contribute
    * Σ_{v∉g} C_v·n_g = n_g·(N − Σ_{v∈g} C_v) — so only the observed
    * (class, value) pairs are ever joined:
    *
    *   tvd_permille = 1000·(A + n_g·(N − Cg)) div (2·n_g·N),
    *   A = Σ_{v∈g} |c_gv·N − C_v·n_g|,  Cg = Σ_{v∈g} C_v.
    *
    * Everything after the two stacked map-side-combined groupBys is
    * dimension-sized: the value-keyed join carries (classes × observed
    * values) rows, the global value table broadcasts, N is a 1-row
    * cross. `is_close` flags classes with TVD ≤ t (permille).
    *
    * Overflow note: |c_gv·N − C_v·n_g| ≤ 2·n_g·N, so keep n_g·N below
    * ~4.6·10¹⁸ (e.g. a 10⁹-row table with 10⁹-row classes overflows
    * before the data does).
    *
    * Output: (quasiCols…, n_rows, n_sensitive, tvd_permille, is_close).
    */
  def tCloseness(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, tPermille: Long): DataFrame = {
    require(quasiCols.nonEmpty, "t-closeness needs at least one quasi-identifier")
    require(tPermille >= 0 && tPermille <= 1000,
      s"t must be a permille in [0, 1000], got $tPermille")
    val qc = quasiCols.map(col)
    val gv = df.groupBy((quasiCols :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("c_gv"))
      .withColumnRenamed(sensitiveCol, "__v")
    val glob = df.groupBy(col(sensitiveCol).as("__v"))
      .agg(count(lit(1)).as("c_v"))
    val base = gv.join(broadcast(glob), Seq("__v"))
    val ng = base.groupBy(qc: _*)
      .agg(sum(col("c_gv")).as("n_rows"),
        count(lit(1)).as("n_sensitive"),
        sum(col("c_v")).as("cg_sum"))
    base.join(ng, quasiCols)
      .crossJoin(broadcast(glob.agg(sum(col("c_v")).as("n_total"))))
      .groupBy(qc: _*)
      .agg(max(col("n_rows")).as("n_rows"),
        max(col("n_sensitive")).as("n_sensitive"),
        max(col("cg_sum")).as("cg_sum"),
        max(col("n_total")).as("n_total"),
        sum(abs(col("c_gv") * col("n_total") - col("c_v") * col("n_rows")))
          .as("a_sum"))
      .withColumn("tvd_permille", expr(
        "(1000 * (a_sum + n_rows * (n_total - cg_sum))) div (2 * n_rows * n_total)"))
      .withColumn("is_close", col("tvd_permille") <= tPermille)
      .select((qc :+ col("n_rows") :+ col("n_sensitive")
        :+ col("tvd_permille") :+ col("is_close")): _*)
  }
}
