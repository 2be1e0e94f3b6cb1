package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** χ² token–label association — the feature-selection step of a quality
  * classifier pipeline: for every token, how strongly does its PRESENCE
  * in a document predict a binary label? From the 2×2 contingency table
  *
  *                label=1   label=0
  *   token in doc    a         b        (a+b = df)
  *   token absent    c         d
  *
  * χ² = n·(ad−bc)² / ((a+b)(c+d)(a+c)(b+d)) = n·φ², with φ² ∈ [0,1].
  *
  * Computed in EXACT integer arithmetic: φ² is emitted in parts-per-
  * million via long division carried digit by digit (quotient first,
  * then six ×10 remainder steps), so no intermediate ever exceeds
  * den·10 and the DuckDB oracle replays the identical longs. The digit
  * loop bounds den ≤ n⁴/16 ≤ Long.Max/10 ⇒ n ≤ 75 000 labeled docs —
  * feature selection runs on a bounded labeled sample by design (the
  * corpus is unbounded; the labeled set never is), and the require
  * names that contract loudly instead of overflowing.
  *
  * Shape: one explode + distinct (doc, token) shuffle, one token-keyed
  * count aggregate, one broadcast 1-row global join — no windows, no
  * driver state; the token dimension is the only reduce key.
  */
object ChiSquare {

  /** Per-token χ²: input one row per document with a token-array column
    * and a boolean label column. Tokens present in EVERY document are
    * dropped (den = 0, χ² undefined — and they carry no signal anyway).
    * Output: (tok, df, pos_df, phi2_ppm, chi2_ppm) sorted by
    * association strength.
    */
  def tokenLabel(docs: DataFrame, tokensCol: String,
      labelCol: String): DataFrame = {
    // base feeds the doc-count totals AND the token explode — persist so
    // the corpus scan (already pruned to two columns) runs once
    val base = docs.select(col(tokensCol).as("__toks"),
      col(labelCol).cast("boolean").as("__lab"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = base.agg(count(lit(1)).as("n"),
      sum(when(col("__lab"), 1L).otherwise(0L)).as("n_pos"))
    val perTok = base
      .select(explode(array_distinct(col("__toks"))).as("tok"), col("__lab"))
      .where(length(col("tok")) > 0)
      .groupBy("tok")
      .agg(count(lit(1)).as("df"),
        sum(when(col("__lab"), 1L).otherwise(0L)).as("pos_df"))
    val j = perTok.crossJoin(broadcast(totals))
      .where(col("df") < col("n") && col("n_pos") > 0L &&
        col("n_pos") < col("n"))
    // loud scale contract: n⁴/16 · 10 must fit a Long for the digit loop
    val guarded = j.withColumn("n",
      when(col("n") <= 75000L, col("n"))
        .otherwise(raise_error(concat(lit("ChiSquare.tokenLabel: labeled " +
          "sample has "), col("n"),
          lit(" docs > 75000 — sample the labeled set first")))))
    val withParts = guarded
      .withColumn("a", col("pos_df"))
      .withColumn("b", col("df") - col("pos_df"))
      .withColumn("c", col("n_pos") - col("pos_df"))
      .withColumn("dd", col("n") - col("df") - col("c"))
      .withColumn("det", col("a") * col("dd") - col("b") * col("c"))
      .withColumn("sq", col("det") * col("det"))
      .withColumn("den", col("df") * (col("n") - col("df")) *
        col("n_pos") * (col("n") - col("n_pos")))
    // digit-by-digit ppm: q·10⁶ + Σ dᵢ·10^(6−i), remainder never > den
    val digits = (1 to 6).foldLeft(
      withParts.withColumn("q", expr("sq div den"))
        .withColumn("r", col("sq") % col("den"))
        .withColumn("ppm", col("q") * 1000000L)) { (acc, i) =>
      val p = math.pow(10, 6 - i).toLong
      acc.withColumn("ppm",
          col("ppm") + expr("(r * 10) div den") * p)
        .withColumn("r", (col("r") * 10L) % col("den"))
    }
    digits.select(col("tok"), col("df"), col("pos_df"),
        col("ppm").as("phi2_ppm"),
        (col("ppm") * col("n")).as("chi2_ppm"))
      .orderBy(col("phi2_ppm").desc, col("tok"))
  }

  /** The oracle-side mirror of the digit loop, parameterized on the CTE
    * carrying (tok, df, pos_df, n, n_pos) — kept here so Spark code and
    * SQL never drift apart.
    */
  def oracleDigitSql(src: String): String =
    s"""parts AS (SELECT tok, df, pos_df,
       |            pos_df AS a, df - pos_df AS b, n_pos - pos_df AS c,
       |            n - df - (n_pos - pos_df) AS dd, n, n_pos
       |          FROM $src
       |          WHERE df < n AND n_pos > 0 AND n_pos < n),
       |sq AS (SELECT tok, df, pos_df, n,
       |         (a*dd - b*c) * (a*dd - b*c) AS sq,
       |         df * (n - df) * n_pos * (n - n_pos) AS den
       |       FROM parts),
       |d0 AS (SELECT *, sq // den AS q, sq % den AS r FROM sq),
       |d1 AS (SELECT *, (r*10) // den AS g1, (r*10) % den AS r1 FROM d0),
       |d2 AS (SELECT *, (r1*10) // den AS g2, (r1*10) % den AS r2 FROM d1),
       |d3 AS (SELECT *, (r2*10) // den AS g3, (r2*10) % den AS r3 FROM d2),
       |d4 AS (SELECT *, (r3*10) // den AS g4, (r3*10) % den AS r4 FROM d3),
       |d5 AS (SELECT *, (r4*10) // den AS g5, (r4*10) % den AS r5 FROM d4),
       |d6 AS (SELECT *, (r5*10) // den AS g6 FROM d5),
       |chi AS (SELECT tok, df, pos_df, n,
       |          CAST(q*1000000 + g1*100000 + g2*10000 + g3*1000
       |               + g4*100 + g5*10 + g6 AS BIGINT) AS phi2_ppm
       |        FROM d6)""".stripMargin
}
