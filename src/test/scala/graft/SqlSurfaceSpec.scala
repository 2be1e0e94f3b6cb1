package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SQL-first surface: every native graft function (scalar AND
  * aggregate) must work from plain `spark.sql(...)` after registration —
  * the same builders GraftExtensions injects for
  * `--conf spark.sql.extensions=graft.GraftExtensions` sessions. */
class SqlSurfaceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val registered = {
    graft.functions.functions.registerAll(spark)
    Seq((1L, "alpha beta"), (2L, "beta gamma"), (3L, "alpha beta"))
      .toDF("id", "text").createOrReplaceTempView("sql_docs")
    true
  }

  test("scalar functions resolve and compute in SQL") {
    assert(registered)
    val row = spark.sql(
      """SELECT hex_to_long('ff') AS h,
        |       token_fingerprint(text) AS fp,
        |       array_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dot
        |FROM sql_docs WHERE id = 1""".stripMargin)
      .as[(Long, Long, Double)].head()
    assert(row._1 == 255L && row._3 == 11.0)
    val viaColumn = Seq("alpha beta").toDF("text")
      .select(graft.functions.functions.token_fingerprint($"text"))
      .as[Long].head()
    assert(row._2 == viaColumn)
  }

  test("aggregate functions resolve, group, and match the Column API") {
    assert(registered)
    val sql = spark.sql(
      """SELECT hll_registers(hex_to_long(substring(md5(text), 1, 15)), 6) AS regs,
        |       bit_votes(hex_to_long(substring(md5(text), 1, 15)), 8) AS votes,
        |       top_k_by(CAST(id AS DOUBLE), id, 2) AS top,
        |       top_k_by_str(CAST(id AS DOUBLE), text, 2) AS top_s,
        |       quantile_sample(hex_to_long(substring(md5(text), 1, 15)), id, 2) AS qs,
        |       kmv_sketch(hex_to_long(substring(md5(text), 1, 15)), 2) AS kmv
        |FROM sql_docs""".stripMargin).collect().head
    val api = Seq((1L, "alpha beta"), (2L, "beta gamma"), (3L, "alpha beta"))
      .toDF("id", "text")
      .withColumn("h", graft.functions.functions.hex_to_long(
        substring(md5($"text"), 1, 15)))
      .agg(
        graft.functions.Hll.hll_registers($"h", 6).as("regs"),
        graft.functions.BitVoteAgg.bit_votes($"h", 8).as("votes"),
        graft.functions.TopKByAgg.top_k_by($"id".cast("double"), $"id", 2).as("top"),
        graft.functions.TopKByAgg.top_k_by_str($"id".cast("double"), $"text", 2).as("top_s"),
        graft.functions.QuantileSample.quantile_sample($"h", $"id", 2).as("qs"),
        graft.functions.KmvSketch.kmv_sketch($"h", 2).as("kmv"))
      .collect().head
    assert(sql == api)
    // and grouped SQL aggregation works
    val grouped = spark.sql(
      """SELECT text, top_k_by(CAST(id AS DOUBLE), id, 1)[0].neighbor_id AS best
        |FROM sql_docs GROUP BY text ORDER BY text""".stripMargin)
      .as[(String, Long)].collect().toSeq
    assert(grouped == Seq(("alpha beta", 3L), ("beta gamma", 2L)))
  }
}
