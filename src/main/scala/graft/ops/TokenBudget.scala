package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Largest-remainder (Hamilton) quota allocation — the data-mixing step
  * of a training run: given per-group corpus sizes (tokens per source /
  * domain / language) and a global token budget, hand each group an
  * INTEGER quota proportional to its size such that the quotas sum to
  * the budget EXACTLY. Floor-division alone under-allocates by up to
  * (groups − 1); the largest-remainder rule gives the leftover units to
  * the groups floor-division shortchanged the most — the same arithmetic
  * parliaments use for seat apportionment, here integer-exact end to end
  * (no double ratios, so the result is engine-portable and
  * oracle-checkable bit-for-bit).
  *
  * Shape: one groupBy for sizes, two 1-row aggregates (total size, total
  * floor allocation) broadcast back — the gated-collect family the repo
  * already uses for thresholds — and ONE global ranking of groups by
  * remainder, on [[Ranks.globalRowNumber]] (range exchange + per-
  * partition numbering), never a single-partition window: the group
  * domain can be large (per-site quotas) even when each group is huge.
  * Ties on remainder break by group key ascending — deterministic and
  * documented, as apportionment requires.
  *
  * Overflow: `budget · size` must stay in int64; guarded per row with a
  * loud raise_error rather than a silent wrap (the repo's document-loud
  * policy). Sizes must be non-negative; groups with null keys are
  * dropped (null is not a domain).
  *
  * The reference has no allocation surface; beyond-reference pipeline
  * operator in the curation family ([[Curation]], [[DomainAffinity]]).
  *
  * Output: (group, sz, quota), Σ quota = budget exactly (spec-pinned).
  */
object TokenBudget {

  def allocate(df: DataFrame, groupCol: String, sizeCol: String,
      budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val sizes = df.where(col(groupCol).isNotNull)
      .groupBy(col(groupCol).as("grp"))
      .agg(sum(col(sizeCol).cast("long")).as("sz"))
      .where(col("sz") >= 0L)
    if (budget == 0L)
      return sizes.select(col("grp"), col("sz"), lit(0L).as("quota"))
    val tot = sizes.agg(sum(col("sz")).as("__tot"))
      .select(when(col("__tot") === 0L,
        raise_error(lit("token budget: total size is zero but budget > 0 " +
          "— nothing to apportion proportionally")))
        .otherwise(col("__tot")).as("__tot"))
    val guarded = sizes.crossJoin(broadcast(tot))
      .withColumn("sz", when(
        lit(budget) =!= 0L && col("sz") > lit(Long.MaxValue / math.max(budget, 1L)),
        raise_error(concat(lit(s"token budget overflow: budget $budget * size "),
          col("sz"), lit(" exceeds int64 — rescale sizes upstream"))))
        .otherwise(col("sz")))
      .withColumn("__fl", expr(s"(${budget}L * sz) div __tot"))
      .withColumn("__rem", expr(s"(${budget}L * sz) % __tot"))
    val extra = guarded.agg((lit(budget) - sum(col("__fl"))).as("__extra"))
    // rank by remainder DESC, group ASC — globalRowNumber sorts ascending,
    // so feed the negated remainder
    val ranked = Ranks.globalRowNumber(
      guarded.withColumn("__negrem", -col("__rem"))
        .select(col("grp"), col("sz"), col("__fl"), col("__negrem")),
      Seq("__negrem", "grp"))
    ranked.crossJoin(broadcast(extra))
      .select(col("grp"), col("sz"),
        (col("__fl") + when(col("grn") <= col("__extra"), 1L).otherwise(0L))
          .as("quota"))
  }

  /** The identical largest-remainder arithmetic as a pure local function —
    * the shared kernel [[graft.streaming.StreamTokenBudget]] runs per
    * closed window (its per-window group state is small by contract; the
    * DataFrame operator above is the corpus-scale path). Same contract:
    * null groups dropped, negative totals dropped, budget 0 → all zeros,
    * no surviving groups → empty, zero total over surviving groups with
    * budget > 0 raises, budget·size (and corpus-total) overflow raises,
    * remainder ties break by group ascending. Equivalence with the
    * DataFrame operator is property-pinned in StreamTokenBudgetSpec.
    */
  def allocateLocal(rows: Seq[(String, Long)], budget: Long)
      : Seq[(String, Long, Long)] = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val sizes = rows.filter(_._1 != null)
      .groupMapReduce(_._1)(_._2)(_ + _).toSeq
      .filter(_._2 >= 0L).sortBy(_._1)
    if (budget == 0L) return sizes.map { case (g, s) => (g, s, 0L) }
    // no surviving groups → empty allocation, matching the DataFrame
    // operator (whose raise_error lives on size rows — zero rows, zero
    // raises); the zero-total raise below is for groups that EXIST with
    // nothing to apportion over (ADVICE r10 negative-path parity)
    if (sizes.isEmpty) return Seq.empty
    // addExact (ADVICE r10): every term is >= 0 after the negative-total
    // drop, so a plain sum wrapping negative would silently corrupt every
    // quota downstream; overflow of the CORPUS total must raise like the
    // per-group budget·size overflow below does
    val tot = sizes.map(_._2).foldLeft(0L)(Math.addExact)
    require(tot > 0L, "token budget: total size is zero but budget > 0 " +
      "— nothing to apportion proportionally")
    sizes.foreach { case (_, s) =>
      require(s <= Long.MaxValue / budget,
        s"token budget overflow: budget $budget * size $s exceeds int64 " +
          "— rescale sizes upstream")
    }
    val fl = sizes.map { case (g, s) =>
      (g, s, budget * s / tot, budget * s % tot)
    }
    val extra = budget - fl.map(_._3).sum
    val order = fl.sortBy { case (g, _, _, rem) => (-rem, g) }
    order.zipWithIndex.map { case ((g, s, f, _), i) =>
      (g, s, f + (if (i < extra) 1L else 0L))
    }.sortBy(_._1)
  }
}
