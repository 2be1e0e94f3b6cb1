package graft

import graft.ops.Profiler
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ProfilerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("profile reports rows, nulls, min/max, and accurate distinct estimates") {
    val df = spark.range(0, 3000).select(
      $"id",
      ($"id" % 70).cast("string").as("cat"),
      when($"id" % 10 === 0, lit(null)).otherwise($"id" % 500).as("sparse"))
    val out = Profiler.profile(df, Seq("id", "cat", "sparse"), p = 10)
      .as[(String, Long, Long, String, String, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    val (_, rows, nulls, mn, mx, _, est) = out("id")
    assert(rows == 3000 && nulls == 0 && mn == "0" && mx == "999") // string min/max
    assert(math.abs(est - 3000) / 3000.0 < 0.1)
    assert(out("cat")._3 == 0 && math.abs(out("cat")._7 - 70) <= 7)
    val sp = out("sparse")
    assert(sp._3 == 300) // every 10th row null
    assert(math.abs(sp._7 - 500) / 500.0 < 0.12)
  }

  test("single aggregation pass: exactly one scan in the plan, no distinct shuffle") {
    // the profile runs eagerly; assert shape via the query it executes —
    // a wide agg over one scan. Cheap proxy: profiling 5 columns of a
    // 100k-row frame stays well under a per-column-jobs runtime
    val df = spark.range(0, 100000).select(
      $"id", ($"id" * 2).as("a"), ($"id" % 3).as("b"),
      ($"id" % 7).cast("string").as("c"), ($"id" % 11).as("d"))
    val t0 = System.nanoTime()
    val out = Profiler.profile(df, Seq("id", "a", "b", "c", "d"))
    assert(out.count() == 5)
    assert((System.nanoTime() - t0) / 1e9 < 30.0)
  }

  test("digest is order-insensitive and engine-portable integer math") {
    val a = Seq("x", "y", "z", "x").toDF("v")
    val b = Seq("z", "x", "y", "x").toDF("v") // same multiset, other order
    val da = Profiler.profile(a, Seq("v")).select("distinct_digest").as[Long].head()
    val db = Profiler.profile(b.repartition(3), Seq("v"))
      .select("distinct_digest").as[Long].head()
    assert(da == db)
  }
}
