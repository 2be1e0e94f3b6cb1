package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis over an event table — the "view → click →
  * purchase" conversion question every product/events pipeline asks, and a
  * natural curation signal for behavioral training data (how deep did a
  * session get before the label event).
  *
  * Semantics: per user, step 1's time is the earliest event of the first
  * step type; step k's time is the earliest event of step k's type STRICTLY
  * AFTER step k-1's time. A user who never performed step 1 is absent; a
  * later step performed only before an earlier one does not count (the
  * funnel is ordered, not a bag-of-types). Strict `>` means a same-
  * timestamp pair cannot satisfy two consecutive steps — ties are treated
  * as simultaneous, not ordered.
  *
  * Execution shape: one user-keyed aggregation for step 1, then per
  * additional step one user-keyed left equi-join + aggregation over ONLY
  * that step's events (the type filter pushes to the scan). Everything
  * shuffles on the user key alone — k steps cost k small keyed shuffles,
  * no windows over the full event stream, no per-user state beyond the
  * k running step times. At 100 TB the per-step event subsets are the
  * scan-pruned minority of the stream and AQE handles their skew.
  */
object Funnel {

  /** Per-user funnel times: (userCol, t1..tk, depth) where tk is the
    * step-k completion time (null once the funnel stalls) and depth is the
    * number of completed steps (>= 1 by construction — only users who
    * completed step 1 appear).
    */
  def userFunnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val base = events.select(col(userCol), col(tsCol), col(typeCol))
    var acc = base.where(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t1"))
    steps.zipWithIndex.tail.foreach { case (step, i) =>
      val prev = s"t$i"
      val cur = s"t${i + 1}"
      val stepEvents = base.where(col(typeCol) === step)
        .select(col(userCol), col(tsCol).as("__step_ts"))
      val keep = col(userCol) +: (1 to i).map(j => col(s"t$j"))
      acc = acc.join(stepEvents, Seq(userCol), "left")
        .groupBy(keep: _*)
        .agg(min(when(col("__step_ts") > col(prev), col("__step_ts"))).as(cur))
    }
    // chained ascending so the DEEPEST non-null step is the outermost
    // branch: when(t_k, k).otherwise(when(t_{k-1}, k-1). ... .otherwise(1))
    val depth = steps.indices.drop(1)
      .foldLeft(lit(1)) { (acc, j) =>
        when(col(s"t${j + 1}").isNotNull, j + 1).otherwise(acc)
      }
    acc.withColumn("depth", depth.cast("int"))
  }

  /** Step-level conversion summary off [[userFunnel]]: one row per step
    * with the number of users who reached it — the chart form. Tiny
    * (k rows); one extra aggregation over the per-user result.
    */
  def stepCounts(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    val perUser = userFunnel(events, userCol, tsCol, typeCol, steps)
    // ONE aggregation pass over the per-user result, then stack() to the
    // chart shape — k separate filtered counts would recompute the funnel
    // plan k times
    val counts = steps.indices.map { j =>
      sum(when(col(s"t${j + 1}").isNotNull, 1L).otherwise(0L)).as(s"__n${j + 1}")
    }
    val stacked = steps.indices.map { j =>
      s"${j + 1}, '${steps(j).replace("'", "''")}', __n${j + 1}"
    }.mkString(", ")
    perUser.agg(counts.head, counts.tail: _*)
      .selectExpr(
        s"stack(${steps.length}, $stacked) AS (step, step_type, n_users)")
  }

  /** Time-to-convert summary: per step, the users who reached it and the
    * integer-exact mean and max µs from step 1 (step 1 rows are 0 by
    * definition). ONE aggregation pass over the per-user funnel, the k
    * output rows built by exploding an in-row struct array — no per-step
    * re-execution of the funnel plan. avg_us is truncating integer
    * division (null when the step was never reached).
    */
  def stepTiming(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    val perUser = userFunnel(events, userCol, tsCol, typeCol, steps)
    val aggs = steps.indices.flatMap { j =>
      val t = col(s"t${j + 1}")
      Seq(
        sum(when(t.isNotNull, 1L).otherwise(0L)).as(s"__n${j + 1}"),
        sum(t - col("t1")).as(s"__d${j + 1}"),
        max(t - col("t1")).as(s"__m${j + 1}"))
    }
    val aggRow = perUser.agg(aggs.head, aggs.tail: _*)
    val rows = steps.indices.map { j =>
      struct(
        lit(j + 1).as("step"), lit(steps(j)).as("step_type"),
        col(s"__n${j + 1}").as("n_users"),
        when(col(s"__n${j + 1}") > 0,
          expr(s"__d${j + 1} div __n${j + 1}")).as("avg_us"),
        col(s"__m${j + 1}").as("max_us"))
    }
    aggRow.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }
}
