package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto frontier (skyline query) per group — the classic
  * multi-criteria OLAP operator: keep every point not DOMINATED on
  * (maximize x, maximize y); q dominates p iff q.x ≥ p.x, q.y ≥ p.y
  * and strictly better on at least one axis. Exact-duplicate points
  * are mutually non-dominating and all survive.
  *
  * Computed without the O(n²) dominance join: collapse to one row per
  * (group, x) carrying max-y (same-x domination resolved right there),
  * then one window over DISTINCT x descending gives the running
  * strictly-greater-x max-y; a point is on the frontier iff its y
  * beats that. The survivors then pull back every original point
  * matching a frontier (x, max-y) pair — so ties and duplicates come
  * through exactly.
  *
  * Scale shape: a (group, x) aggregate, a group-bounded window over
  * DISTINCT x values (value-cardinality-sized, the Gini/KS
  * discipline), and one broadcast-able semi-join back. Output: the
  * input's (grp, id, x, y) frontier rows.
  */
object Skyline {

  def paretoFront2D(df: DataFrame, grpCol: String, idCol: String,
      xCol: String, yCol: String): DataFrame = {
    val base = df.select(col(grpCol).as("grp"), col(idCol).as("id"),
        col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .where(col("x").isNotNull && col("y").isNotNull)
    val perX = base.groupBy("grp", "x").agg(max(col("y")).as("ymax"))
    val byXDesc = Window.partitionBy(col("grp")).orderBy(col("x").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = perX
      .withColumn("run_strict", max(col("ymax")).over(byXDesc))
      .where(col("run_strict").isNull || col("ymax") > col("run_strict"))
      .select(col("grp"), col("x"), col("ymax"))
    base.join(frontier.withColumnRenamed("ymax", "y"),
        Seq("grp", "x", "y"), "left_semi")
      .select("grp", "id", "x", "y")
  }
}
