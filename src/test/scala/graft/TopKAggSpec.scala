package graft

import graft.functions.{TopKBuffer, TopKByAgg}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

class TopKAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("buffer keeps best-k by (score desc, id asc) under any insert order") {
    val p = Prop.forAll(Gen.listOf(for {
      s <- Gen.choose(0, 20).map(_ / 4.0) // coarse scores force ties
      id <- Gen.choose(0L, 50L)
    } yield (s, id))) { pairs =>
      val distinct = pairs.distinct
      val buf = new TopKBuffer(5)
      distinct.foreach { case (s, id) => buf.insert(s, id) }
      val got = (0 until buf.n).map(j => (buf.scores(j), buf.ids(j)))
      val want = distinct.sortBy { case (s, id) => (-s, id) }.take(5)
      got == want
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("aggregate equals the window row_number formulation, groups and ties included") {
    val df = spark.range(0, 5000).select(
      ($"id" % 40).as("query_id"),
      ($"id" % 101).as("neighbor_id"),
      (pmod(xxhash64($"id"), lit(7)).cast("double") / 2.0).as("cosine"))
      .distinct()
    val agg = df.groupBy($"query_id")
      .agg(TopKByAgg.top_k_by($"cosine", $"neighbor_id", 5).as("t"))
      .select($"query_id", posexplode($"t"))
      .select($"query_id", ($"pos" + 1).cast("int").as("rank"),
        $"col.neighbor_id".as("neighbor_id"), $"col.cosine".as("cosine"))
      .as[(Long, Int, Long, Double)].collect().toSet
    val w = Window.partitionBy($"query_id")
      .orderBy($"cosine".desc, $"neighbor_id".asc)
    val win = df.withColumn("rank", row_number().over(w))
      .where($"rank" <= 5)
      .select($"query_id", $"rank".cast("int"), $"neighbor_id", $"cosine")
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(agg == win && agg.nonEmpty)
  }

  test("nulls are skipped; plan uses ObjectHashAggregate, not a sort") {
    val df = Seq[(Long, java.lang.Long, java.lang.Double)](
      (1L, 10L, 0.5), (1L, null, 0.9), (1L, 11L, null), (1L, 12L, 0.7))
      .toDF("query_id", "neighbor_id", "cosine")
    val out = df.groupBy($"query_id")
      .agg(TopKByAgg.top_k_by($"cosine", $"neighbor_id", 3).as("t"))
    assert(out.queryExecution.executedPlan.toString.contains("ObjectHashAggregate"))
    val rows = out.select(explode($"t")).select("col.*")
      .as[(Long, Double)].collect().toSeq
    assert(rows == Seq((12L, 0.7), (10L, 0.5)))
  }

  test("NaN scores rank FIRST, exactly like the window row_number under DESC") {
    // Spark's nan-safe sort puts NaN largest; the buffer's Double.compare
    // ordering must agree so the drop-in contract holds for NaN inputs
    val df = Seq(
      (1L, 0.5, 10L), (1L, Double.NaN, 11L), (1L, 0.9, 12L), (1L, Double.NaN, 13L),
      (2L, -0.0, 20L), (2L, 0.0, 21L))
      .toDF("g", "score", "id")
    val agg = df.groupBy($"g")
      .agg(TopKByAgg.top_k_by($"score", $"id", 3).as("t"))
      .select($"g", explode($"t"))
      .select($"g", $"col.neighbor_id")
      .as[(Long, Long)].collect().toSeq.sorted
    val win = df.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy($"g").orderBy($"score".desc, $"id".asc)))
      .where($"rn" <= 3)
      .select($"g", $"id")
      .as[(Long, Long)].collect().toSeq.sorted
    assert(agg == win)
    // NaN rows really are first for group 1
    val first = df.groupBy($"g").agg(TopKByAgg.top_k_by($"score", $"id", 3).as("t"))
      .where($"g" === 1L)
      .select(expr("transform(t, x -> x.neighbor_id)")).as[Seq[Long]].head()
    assert(first == Seq(11L, 13L, 12L))
  }
}
