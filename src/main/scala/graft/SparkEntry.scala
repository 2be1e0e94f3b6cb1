package graft

import graft.ops.ConnectedComponents
import graft.queries.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Connected components (the reference's headline operator) over a
    * part↔supplier co-purchase graph, with per-component size stats.
    */
  def entry(spark: SparkSession): DataFrame = {
    val edges = Tables.partSupplierEdges(spark, "/root/testdata/sf0.001")
    ConnectedComponents.components(edges)
      .groupBy("component").agg(count(lit(1)).as("n_nodes"))
      .orderBy("component")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> { (s, d) =>
      // TPC-H Q1-style pricing summary. Double sums are made
      // order-insensitive (hence oracle-hashable) by per-row cast to
      // DECIMAL(18,2) before the exact decimal sum, then cast back.
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
          // computed product: floor to integer cents (exact in double, no
          // rounding-mode divergence between engines), exact integer sum,
          // one final double division
          (sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * lit(100.0)))
            .cast("double") / lit(100.0)).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    "q_components" -> { (s, d) =>
      ConnectedComponents.components(Tables.partSupplierEdges(s, d))
        .orderBy("node")
    },
    "q_components_stats" -> { (s, d) =>
      ConnectedComponents.components(Tables.partSupplierEdges(s, d))
        .groupBy("component").agg(count(lit(1)).as("n_nodes"))
        .orderBy("component")
    }
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(FLOOR(l_extendedprice * (1.0 - l_discount) * 100.0)) AS DOUBLE) / 100.0 AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_components" -> ccOracle("SELECT node, min(lab) AS component FROM cc GROUP BY node ORDER BY node"),
    "q_components_stats" -> ccOracle(
      """SELECT component, COUNT(*) AS n_nodes
        |FROM (SELECT node, min(lab) AS component FROM cc GROUP BY node)
        |GROUP BY component ORDER BY component""".stripMargin)
  )

  /** DuckDB min-label-propagation connected components over the same
    * part↔supplier edges as Tables.partSupplierEdges; `finalSelect` runs
    * over cc(node, lab) where min(lab) per node = canonical component.
    */
  private def ccOracle(finalSelect: String): String =
    s"""WITH RECURSIVE
       |edges AS (
       |  SELECT 'P' || CAST(l_partkey AS VARCHAR) AS a,
       |         'S' || CAST(l_suppkey AS VARCHAR) AS b
       |  FROM lineitem WHERE l_quantity <= 2),
       |sym AS (SELECT a, b FROM edges UNION SELECT b AS a, a AS b FROM edges),
       |nodes AS (SELECT DISTINCT a AS node FROM sym),
       |cc AS (
       |  SELECT node, node AS lab FROM nodes
       |  UNION
       |  SELECT s.b AS node, c.lab
       |  FROM cc c JOIN sym s ON c.node = s.a
       |  WHERE c.lab < s.b)
       |$finalSelect""".stripMargin
}
