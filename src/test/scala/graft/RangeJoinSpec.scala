package graft

import graft.ops.RangeJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("pointInInterval equals the naive non-equi join") {
    val points = Seq((1L, 0.0), (2L, 4.9), (3L, 5.0), (4L, 17.3), (5L, 100.0),
      (6L, -3.2), (7L, 49.999)).toDF("pid", "v")
    val ivs = Seq((10L, 0.0, 10.0), (11L, 5.0, 5.0), (12L, -10.0, -1.0),
      (13L, 15.0, 60.0), (14L, 90.0, 100.0), (15L, 60.0, 50.0)) // lo > hi
      .toDF("iid", "lo", "hi")
    val naive = points.join(ivs, $"v" >= $"lo" && $"v" <= $"hi")
    // widths both smaller and larger than typical interval width
    for (w <- Seq(1.0, 7.0, 64.0)) {
      val banded = RangeJoin.pointInInterval(points, "v", ivs, "lo", "hi", w)
      assert(rows(banded.select(points.columns.map(col) ++
        ivs.columns.map(col): _*)) == rows(naive))
      // exactly-once: no duplicate pairs even when an interval spans many bands
      assert(banded.count() == banded.select("pid", "iid").distinct().count())
    }
  }

  test("intervalOverlap equals the naive overlap join") {
    val a = Seq((1L, 0.0, 10.0), (2L, 5.0, 5.0), (3L, 20.0, 90.0),
      (4L, -50.0, -40.0), (5L, 7.0, 3.0)).toDF("aid", "a_lo", "a_hi")
    val b = Seq((10L, 9.0, 21.0), (11L, 100.0, 200.0), (12L, -45.0, -45.0),
      (13L, 0.0, 1000.0)).toDF("bid", "b_lo", "b_hi")
    val naive = a.where($"a_lo" <= $"a_hi")
      .join(b.where($"b_lo" <= $"b_hi"), $"a_lo" <= $"b_hi" && $"b_lo" <= $"a_hi")
    for (w <- Seq(2.0, 16.0, 500.0)) {
      val banded = RangeJoin.intervalOverlap(a, "a_lo", "a_hi", b, "b_lo", "b_hi", w)
      assert(rows(banded.select(a.columns.map(col) ++ b.columns.map(col): _*))
        == rows(naive))
      assert(banded.count() == banded.select("aid", "bid").distinct().count())
    }
  }

  test("null values and bounds never match") {
    val points = Seq[(java.lang.Long, java.lang.Double)]((1L, null), (2L, 5.0))
      .toDF("pid", "v")
    val ivs = Seq[(java.lang.Long, java.lang.Double, java.lang.Double)](
      (10L, null, 10.0), (11L, 0.0, null), (12L, 0.0, 10.0))
      .toDF("iid", "lo", "hi")
    val out = RangeJoin.pointInInterval(points, "v", ivs, "lo", "hi", 4.0)
    assert(out.select("pid", "iid").as[(Long, Long)].collect().toSet ==
      Set((2L, 12L)))
  }

  test("a runaway interval fails loudly instead of replicating millions of rows") {
    val points = Seq((1L, 5.0)).toDF("pid", "v")
    val ivs = Seq((10L, 0.0, 1e12)).toDF("iid", "lo", "hi") // corrupt bound
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(points, "v", ivs, "lo", "hi",
        bandWidth = 1.0, maxBandsPerInterval = 1000).count()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("spans >= 1000 bands")), e.getMessage)
    // the same interval is fine with a sane width
    assert(RangeJoin.pointInInterval(points, "v", ivs, "lo", "hi",
      bandWidth = 1e10).count() == 1)
  }

  test("banded plan is an equi-join, not a nested-loop/cartesian product") {
    // even with broadcast disabled (the at-scale shape: both sides large),
    // banding must produce a shuffle equi-join — the naive plan degrades
    // to CartesianProduct
    withSql("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val points = spark.range(0, 1000).select($"id".as("pid"),
        ($"id" % 97 * 1.5).as("v"))
      val ivs = spark.range(0, 50).select($"id".as("iid"),
        ($"id" * 3.0).as("lo"), ($"id" * 3.0 + 4.0).as("hi"))
      val banded = RangeJoin.pointInInterval(points, "v", ivs, "lo", "hi", 4.0)
      val plan = banded.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoop"), plan)
      val naive = points.join(ivs, $"v" >= $"lo" && $"v" <= $"hi")
      assert(naive.queryExecution.executedPlan.toString
        .contains("CartesianProduct"))
      assert(banded.count() == naive.count())
    }
  }

  private def withSql[A](kvs: (String, String)*)(body: => A): A = {
    val old = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
