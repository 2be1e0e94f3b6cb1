package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Markov transition matrix over per-entity event sequences — the
  * sequence-mining primitive behind "what do users do next" analyses and
  * the first step of any behavioral next-event model: for every ordered
  * pair of event types (a, b), count how often b immediately follows a
  * within one entity's time-ordered stream, plus the per-source integer
  * per-mille transition probability.
  *
  * The successor is derived with `lead` over (`tsCol`, `tieCol`) inside
  * each entity partition — the tie column (a unique event id) makes the
  * order total, so the pair multiset is deterministic and the driver query
  * gets a hash-exact DuckDB oracle. Probabilities are integer:
  * `permille = (n * 1000) div from_total` — no floating-point division.
  *
  * Plan shape at 100 TB: ONE entity-keyed shuffle for the sequence window
  * (the same partitioning sessionization uses), then a (from, to) count
  * whose partials combine map-side into a |types|² table — tiny however
  * large the stream. The per-source totals are a window over that tiny
  * table, not over events.
  */
object Transitions {

  def eventTransitions(events: DataFrame, entityCol: String, tsCol: String,
      typeCol: String, tieCol: String): DataFrame = {
    val seq = Window.partitionBy(col(entityCol))
      .orderBy(col(tsCol), col(tieCol))
    val pairs = events
      .select(col(entityCol), col(tsCol), col(tieCol),
        col(typeCol).as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(seq))
      .where(col("to_type").isNotNull)
    val counts = pairs.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val perSource = Window.partitionBy(col("from_type"))
    counts
      .withColumn("from_total", sum(col("n")).over(perSource))
      .withColumn("permille", expr("(n * 1000) div from_total"))
  }

  /** Event n-gram counts — [[eventTransitions]] generalized to length-`n`
    * consecutive type sequences ("view>view>click"), the input of
    * sequential pattern mining and next-k-step models. All `n−1` leads
    * share ONE entity-keyed sort window (Spark evaluates them in a single
    * Window operator), windows that would cross the end of an entity's
    * stream are dropped, and the count table is at most |types|^n rows —
    * partial-aggregated map-side like the transition matrix.
    */
  def eventNgrams(events: DataFrame, entityCol: String, tsCol: String,
      typeCol: String, tieCol: String, n: Int = 3): DataFrame = {
    require(n >= 2 && n <= 8, s"n must be in [2, 8], got $n")
    val seq = Window.partitionBy(col(entityCol))
      .orderBy(col(tsCol), col(tieCol))
    var df = events.select(col(entityCol), col(tsCol), col(tieCol),
      col(typeCol).as("__t0"))
    for (i <- 1 until n)
      df = df.withColumn(s"__t$i", lead(col("__t0"), i).over(seq))
    val steps = (0 until n).map(i => col(s"__t$i"))
    df.where(steps.map(_.isNotNull).reduce(_ && _))
      .select(concat_ws(">", steps: _*).as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("n_occurrences"))
  }
}
