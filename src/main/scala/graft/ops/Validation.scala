package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality auditing (Deequ-style): a rule set is
  * evaluated in ONE scan of the table — each rule is a violation
  * predicate compiled to a conditional sum, so 10 rules cost one pass and
  * one 1-row aggregate, not 10 jobs. Referential integrity (orphan
  * foreign keys) can't ride the same scan; it's one anti-join count per
  * relationship, unioned in.
  *
  * Output: (rule, n_violations) — one row per rule, 0 meaning clean.
  * The long-format output is the thing a pipeline gate consumes
  * (`WHERE n_violations > 0`), produced by unpivoting the 1-row wide
  * aggregate (no second scan).
  */
object Validation {

  /** One-scan rule audit. `rules` maps rule name → VIOLATION predicate
    * (true = row breaks the rule). Null predicate results count as
    * violations — an unexpectedly-null column is itself a defect. */
  def ruleViolations(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "ruleViolations needs at least one rule")
    val aggs = rules.map { case (name, violated) =>
      sum(when(coalesce(violated, lit(true)), 1L).otherwise(0L)).as(name)
    }
    df.agg(aggs.head, aggs.tail: _*)
      .unpivot(Array.empty, rules.map(r => col(r._1)).toArray,
        "rule", "n_violations")
  }

  /** Orphan-FK count as a (rule, n_violations) row: child rows whose
    * `childKey` has no match in `parent.parentKey`. Anti-join keyed on
    * the FK — the shuffle is on the key being validated, as any
    * referential check must be. */
  def orphanCount(rule: String, child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame =
    child.select(col(childKey).as("__k"))
      .join(parent.select(col(parentKey).as("__k")).distinct(),
        Seq("__k"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(rule).as("rule"), col("n_violations"))
}
