package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** User-path analysis — the "what journeys do users take" product
  * question: the first `maxLen` event types of each entity's time-ordered
  * stream joined into a path string, counted across entities. The output
  * is the top-paths table behind every Sankey/flow visualization.
  *
  * Order within an entity is (`tsCol`, `tieCol`) — total via the unique
  * tie column — so each entity's path is deterministic and the driver
  * query gets a hash-exact DuckDB oracle (string_agg with ORDER BY
  * mirrors the sorted-struct array join 1:1).
  *
  * Plan shape at 100 TB: one entity-keyed sort window (row_number) whose
  * `<= maxLen` filter drops the stream's tail EARLY, one entity
  * aggregation collecting ≤ maxLen (rank, type) structs — the buffer is
  * bounded by construction, the ADVICE-r4 collect_list concern doesn't
  * arise — and a final path count whose partials combine map-side into a
  * distinct-paths-sized table.
  */
object Paths {

  def userPaths(events: DataFrame, entityCol: String, tsCol: String,
      tieCol: String, typeCol: String, maxLen: Int = 5): DataFrame = {
    require(maxLen >= 1, s"maxLen must be positive, got $maxLen")
    val seq = Window.partitionBy(col(entityCol))
      .orderBy(col(tsCol), col(tieCol))
    events
      .select(col(entityCol), col(tsCol), col(tieCol), col(typeCol))
      .withColumn("__rn", row_number().over(seq))
      .where(col("__rn") <= maxLen)
      .groupBy(col(entityCol))
      .agg(collect_list(struct(col("__rn"), col(typeCol).as("t"))).as("__steps"))
      .select(
        array_join(expr("transform(array_sort(__steps), x -> x.t)"), ">")
          .as("path"),
        size(col("__steps")).cast("long").as("depth"))
      .groupBy(col("path"), col("depth"))
      .agg(count(lit(1)).as("n_users"))
  }
}
