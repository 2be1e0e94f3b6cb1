package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Continuous data-quality auditing — the streaming counterpart of
  * [[graft.ops.Validation.ruleViolations]]: per tumbling event-time
  * window, how many arriving rows break each declared rule.
  *
  * Deliberately STATELESS beyond the windowed aggregation itself: rule
  * counts are associative conditional sums, so plain watermark + windowed
  * agg is the whole operator — Spark's incremental hash agg partial-merges
  * map-side, state is one row per (window, rule-set) and is evicted at
  * the watermark. Append mode emits each window exactly once, when final.
  * No flatMapGroupsWithState where a built-in aggregation suffices.
  *
  * Output: (window_start_us, rule, n_violations) — long format, one row
  * per rule per closed window, matching the batch operator's unpivot.
  */
object StreamValidation {

  def windowedRuleViolations(stream: DataFrame, tsCol: String,
      windowDuration: String, delayThreshold: String,
      rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "windowedRuleViolations needs at least one rule")
    val aggs = rules.map { case (name, violated) =>
      sum(when(coalesce(violated, lit(true)), 1L).otherwise(0L)).as(name)
    }
    stream
      .withWatermark(tsCol, delayThreshold)
      .groupBy(window(col(tsCol), windowDuration))
      .agg(aggs.head, aggs.tail: _*)
      .select(unix_micros(col("window.start")).as("window_start_us") +:
        rules.map(r => col(r._1)): _*)
      .unpivot(Array(col("window_start_us")),
        rules.map(r => col(r._1)).toArray, "rule", "n_violations")
  }
}
