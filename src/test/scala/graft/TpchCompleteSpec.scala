package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The six TPC-H shapes that complete the 22-query relational surface
  * (q2, q9, q11, q16, q20, q21 — adapted to this schema, which has no
  * partsupp table). Each test re-derives the query's defining invariant
  * from the raw tables independently of the query plan, so these checks
  * complement the driver's DuckDB hash gate rather than repeating it.
  */
class TpchCompleteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q2: every returned supplier achieves its part's minimum cost") {
    val rows = run("q_tpch_q2").collect()
    assert(rows.nonEmpty)
    val byPart = rows.groupBy(_.getAs[Long]("p_partkey"))
    byPart.foreach { case (_, rs) =>
      val costs = rs.map(_.getAs[Long]("supplycost_c")).toSet
      assert(costs.size == 1, "tied winners must all carry the min cost")
    }
    // suppliers restricted to EUROPE
    val eur = queries.Tables.supplier(spark, sf)
      .join(queries.Tables.nation(spark, sf),
        col("s_nationkey") === col("n_nationkey"))
      .join(queries.Tables.region(spark, sf).where(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey").collect().map(_.getLong(0)).toSet
    assert(rows.forall(r => eur.contains(r.getAs[Long]("s_suppkey"))))
  }

  test("q9: total profit matches an independent SQL recomputation") {
    val got = run("q_tpch_q9").agg(sum("profit_c"), sum("n_items")).collect()(0)
    queries.Tables.lineitem(spark, sf).createOrReplaceTempView("t_li")
    queries.Tables.part(spark, sf).createOrReplaceTempView("t_p")
    val want = spark.sql(
      """SELECT sum(floor(l_extendedprice * (1.0 - l_discount) * 100.0)
        |           - (floor(p_retailprice * 100.0) div 2)
        |             * cast(l_quantity as bigint)),
        |       count(*)
        |FROM t_li JOIN t_p ON l_partkey = p_partkey
        |WHERE p_name LIKE '%gear%'""".stripMargin).collect()(0)
    assert(got.getLong(0) == want.getLong(0))
    assert(got.getLong(1) == want.getLong(1))
  }

  test("q11: every kept part clears the cross-multiplied share threshold") {
    val rows = run("q_tpch_q11").collect()
    assert(rows.nonEmpty)
    // recompute the ASIA-scoped total from scratch
    val asia = queries.Tables.supplier(spark, sf)
      .join(queries.Tables.nation(spark, sf),
        col("s_nationkey") === col("n_nationkey"))
      .join(queries.Tables.region(spark, sf).where(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"))
    val total = queries.Tables.lineitem(spark, sf)
      .join(asia, col("l_suppkey") === col("s_suppkey"), "left_semi")
      .agg(sum(floor(col("l_extendedprice") * lit(100.0)).cast("long")))
      .collect()(0).getLong(0)
    rows.foreach(r => assert(r.getAs[Long]("value_c") * 2000L > total))
    // sorted by value desc
    val vals = rows.map(_.getAs[Long]("value_c"))
    assert(vals.zip(vals.tail).forall { case (a, b) => a >= b })
  }

  test("q16: buckets respect the brand/type/size predicates") {
    val rows = run("q_tpch_q16").collect()
    assert(rows.nonEmpty)
    val sizes = Set(1, 4, 9, 14, 19, 23, 36, 45)
    rows.foreach { r =>
      assert(r.getAs[String]("p_brand") != "Brand#13")
      assert(r.getAs[String]("p_type") != "PROMO")
      assert(sizes.contains(r.getAs[Int]("p_size")))
      assert(r.getAs[Long]("supplier_cnt") > 0L)
    }
  }

  test("q20: every qualifying supplier truly dominates some bolt part") {
    val rows = run("q_tpch_q20").collect()
    val li97 = queries.Tables.lineitem(spark, sf)
      .where(col("l_shipdate") >= to_timestamp(lit("1997-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1998-01-01")))
      .join(queries.Tables.part(spark, sf)
          .where(col("p_name").like("%bolt%")).select("p_partkey"),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .select(col("l_partkey"), col("l_suppkey"),
        col("l_quantity").cast("long").as("qty"))
    val perSupp = li97.groupBy("l_partkey", "l_suppkey")
      .agg(sum("qty").as("sq")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val perPart = li97.groupBy("l_partkey").agg(sum("qty").as("pq")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val sk = r.getAs[Long]("s_suppkey")
      val dominates = perSupp.exists { case ((pk, s), sq) =>
        s == sk && 2L * sq > perPart(pk)
      }
      assert(dominates, s"supplier $sk returned without a dominated part")
    }
  }

  test("q21: a late order counted has >=2 suppliers and exactly 1 late one") {
    val rows = run("q_tpch_q21").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("numwait") > 0L))
    // ordering contract: numwait desc, then supplier key
    val pairs = rows.map(r =>
      (r.getAs[Long]("numwait"), r.getAs[Long]("s_suppkey")))
    assert(pairs.zip(pairs.tail).forall { case ((w1, s1), (w2, s2)) =>
      w1 > w2 || (w1 == w2 && s1 < s2)
    })
  }

  test("plan shapes: dims broadcast, no cartesian products") {
    for (q <- Seq("q_tpch_q2", "q_tpch_q9", "q_tpch_q16", "q_tpch_q20",
        "q_tpch_q21")) {
      val p = run(q).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian product")
      assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
        s"$q should broadcast its dimension side")
    }
  }

  test("q9 scans lineitem once and shuffles only for the final group-by") {
    val p = run("q_tpch_q9").queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans == 4, s"expected 4 scans (lineitem+part+supplier+nation): $p")
  }
}
