package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Greedy maximum coverage — the (1 − 1/e)-approximation behind every
  * "pick k sources/shards that together cover the most" decision:
  * repeatedly take the set with the largest MARGINAL gain over what is
  * already covered. For corpus curation the sets are sources and the
  * elements are distinct n-grams — the answer to "which six feeds buy
  * the most linguistic coverage".
  *
  * Each of the k rounds is one partial-aggregated gain count + a 1-row
  * argmax collect + one anti-join that SHRINKS the remaining incidence
  * (covered_total is the running sum of gains, so no growing covered
  * set and no per-round distinct count). Ties break to the
  * lexicographically smallest set name — the same (−gain, set)
  * min-struct order the unrolled oracle's ORDER BY replays. Rounds
  * stop early when everything reachable is covered (identical to the
  * full unroll: a round with no positive marginal gain emits nothing).
  *
  * Output: (pick, s, gain, covered_total) — one row per successful
  * pick, covered_total the DISTINCT covered-element count after it.
  */
object SetCover {

  def greedyMaxCoverage(df: DataFrame, setCol: String, elemCol: String,
      k: Int = 6): DataFrame = {
    require(k >= 1 && k <= 32, s"k must be in [1, 32], got $k")
    val spark = df.sparkSession
    import spark.implicits._
    // `rem` is the still-uncovered slice of the set–element incidence:
    // it only SHRINKS (one anti-join per pick), and because each round's
    // gain counts exactly the newly covered distinct elements,
    // covered_total is the running SUM of gains — no growing covered
    // set, no per-round distinct-count job.
    var rem = df.select(col(setCol).cast("string").as("s"),
        col(elemCol).cast("string").as("el"))
      .where(col("s").isNotNull && col("el").isNotNull)
      .distinct()
      .localCheckpoint(eager = true)
    val out = collection.mutable.ArrayBuffer.empty[(Long, String, Long, Long)]
    var coveredTotal = 0L
    var i = 1
    var live = true
    while (i <= k && live) {
      val gains = rem.groupBy("s").agg(count(lit(1)).as("gain"))
      val winner = gains
        .agg(min(struct((-col("gain")).as("ng"), col("s").as("s"))).as("w"))
        .select(col("w.s"), (-col("w.ng")).as("gain"))
        .collect()
      if (winner.isEmpty || winner(0).isNullAt(0)) live = false
      else {
        val s = winner(0).getString(0)
        val gain = winner(0).getLong(1)
        coveredTotal += gain
        out += ((i.toLong, s, gain, coveredTotal))
        if (i < k) {
          rem = rem
            .join(rem.where(col("s") === s).select("el"), Seq("el"),
              "left_anti")
            .localCheckpoint(eager = true)
        }
        i += 1
      }
    }
    if (out.isEmpty)
      spark.emptyDataset[(Long, String, Long, Long)]
        .toDF("pick", "s", "gain", "covered_total")
    else
      spark.createDataFrame(out.toIndexedSeq)
        .toDF("pick", "s", "gain", "covered_total")
        .orderBy("pick")
  }

  /** Budget-constrained greedy coverage — the knapsack-flavored sibling
    * of [[greedyMaxCoverage]]: pick by best GAIN-PER-COST among the sets
    * that still fit the remaining budget. The classic curation decision
    * when sources are priced (bytes to store, license fees): cheap decent
    * feeds beat one expensive great one.
    *
    * The ratio is integer: `(gain · 1_000_000) div cost` — the greedy is
    * DEFINED over that floored key (ties to the smaller set name), so any
    * engine replays it exactly. Costs must be one row per set (enforced
    * by a min-aggregate). Rounds stop when nothing affordable still has
    * positive marginal gain; the budget never recovers, so stopping early
    * equals the full unroll (later oracle rounds are provably empty).
    *
    * Output: (pick, s, gain, cost, ratio_ppm, spent_total, covered_total).
    */
  def greedyBudgetedCoverage(df: DataFrame, setCol: String, elemCol: String,
      costs: DataFrame, costSetCol: String, costCol: String, budget: Long,
      maxPicks: Int = 8): DataFrame = {
    require(maxPicks >= 1 && maxPicks <= 32,
      s"maxPicks must be in [1, 32], got $maxPicks")
    require(budget >= 0L, s"budget must be >= 0, got $budget")
    val spark = df.sparkSession
    import spark.implicits._
    val costTbl = costs.select(col(costSetCol).cast("string").as("s"),
        col(costCol).cast("long").as("cost"))
      .groupBy("s").agg(min(col("cost")).as("cost"))
    var rem = df.select(col(setCol).cast("string").as("s"),
        col(elemCol).cast("string").as("el"))
      .where(col("s").isNotNull && col("el").isNotNull)
      .distinct()
      .localCheckpoint(eager = true)
    val out =
      collection.mutable.ArrayBuffer.empty[(Long, String, Long, Long, Long, Long, Long)]
    var spent = 0L
    var coveredTotal = 0L
    var i = 1
    var live = true
    while (i <= maxPicks && live) {
      val winner = rem.groupBy("s").agg(count(lit(1)).as("gain"))
        .join(costTbl, Seq("s"))
        .where(col("cost") <= lit(budget - spent))
        .select(min(struct(
          (-expr("(gain * 1000000) div cost")).as("nr"), col("s"),
          col("gain"), col("cost"))).as("w"))
        .where(col("w").isNotNull)
        .select(col("w.s"), col("w.gain"), col("w.cost"),
          (-col("w.nr")).as("ratio"))
        .collect()
      if (winner.isEmpty || winner(0).isNullAt(0)) live = false
      else {
        val s = winner(0).getString(0)
        val gain = winner(0).getLong(1)
        val cost = winner(0).getLong(2)
        val ratio = winner(0).getLong(3)
        spent += cost
        coveredTotal += gain
        out += ((i.toLong, s, gain, cost, ratio, spent, coveredTotal))
        if (i < maxPicks) {
          rem = rem
            .join(rem.where(col("s") === s).select("el"), Seq("el"),
              "left_anti")
            .localCheckpoint(eager = true)
        }
        i += 1
      }
    }
    if (out.isEmpty)
      spark.emptyDataset[(Long, String, Long, Long, Long, Long, Long)]
        .toDF("pick", "s", "gain", "cost", "ratio_ppm", "spent_total",
          "covered_total")
    else
      spark.createDataFrame(out.toIndexedSeq)
        .toDF("pick", "s", "gain", "cost", "ratio_ppm", "spent_total",
          "covered_total")
        .orderBy("pick")
  }

  /** Unrolled-oracle chain for [[greedyBudgetedCoverage]] over CTEs
    * `se(s, el)`, `costs(s, cost)` and `budget(bud)`: cov/sp/g/p/r per
    * round; the result union is `coverrows`.
    */
  def oracleBudgetCtes(maxPicks: Int): String = {
    val sb = new StringBuilder
    sb.append("cov0 AS (SELECT el FROM se WHERE 1 = 0),\n")
    sb.append("sp0 AS (SELECT CAST(0 AS BIGINT) AS sp)")
    for (i <- 1 to maxPicks) {
      val prev = i - 1
      sb.append(
        s""",
           |g$i AS (SELECT s, COUNT(*) AS gain FROM se
           |        WHERE el NOT IN (SELECT el FROM cov$prev)
           |        GROUP BY s),
           |p$i AS (SELECT g.s, gain, c.cost,
           |          (gain * 1000000) // c.cost AS ratio_ppm
           |        FROM g$i g JOIN costs c USING (s)
           |        WHERE c.cost <= (SELECT bud FROM budget)
           |                        - (SELECT sp FROM sp$prev)
           |        ORDER BY (gain * 1000000) // c.cost DESC, g.s LIMIT 1),
           |cov$i AS MATERIALIZED (SELECT el FROM cov$prev
           |        UNION
           |        SELECT el FROM se WHERE s = (SELECT s FROM p$i)),
           |sp$i AS (SELECT (SELECT sp FROM sp$prev)
           |           + COALESCE((SELECT cost FROM p$i), 0) AS sp),
           |r$i AS (SELECT CAST($i AS BIGINT) AS pick, s, gain, cost,
           |          ratio_ppm, (SELECT sp FROM sp$i) AS spent_total,
           |          (SELECT COUNT(*) FROM cov$i) AS covered_total
           |        FROM p$i)""".stripMargin)
    }
    sb.append(
      s""",
         |coverrows AS (${(1 to maxPicks).map(i => s"SELECT * FROM r$i")
             .mkString("\n  UNION ALL ")})""".stripMargin)
    sb.toString
  }

  /** Unrolled-oracle chain over a CTE `se(s, el)` (distinct
    * set–element pairs): cov0..cov<k>, g/p/r per round; the result
    * union is `coverrows`.
    */
  def oracleRoundCtes(k: Int): String = {
    val sb = new StringBuilder
    sb.append("cov0 AS (SELECT el FROM se WHERE 1 = 0)")
    for (i <- 1 to k) {
      val prev = s"cov${i - 1}"
      sb.append(
        s""",
           |g$i AS (SELECT s, COUNT(*) AS gain FROM se
           |        WHERE el NOT IN (SELECT el FROM $prev)
           |        GROUP BY s),
           |p$i AS (SELECT s, gain FROM g$i ORDER BY gain DESC, s LIMIT 1),
           |cov$i AS MATERIALIZED (SELECT el FROM $prev
           |        UNION
           |        SELECT el FROM se WHERE s = (SELECT s FROM p$i)),
           |r$i AS (SELECT CAST($i AS BIGINT) AS pick, s, gain,
           |          (SELECT COUNT(*) FROM cov$i) AS covered_total
           |        FROM p$i)""".stripMargin)
    }
    sb.append(
      s""",
         |coverrows AS (${(1 to k).map(i => s"SELECT * FROM r$i")
             .mkString("\n  UNION ALL ")})""".stripMargin)
    sb.toString
  }
}
