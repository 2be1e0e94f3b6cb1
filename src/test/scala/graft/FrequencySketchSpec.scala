package graft

import graft.ops.FrequencySketch
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FrequencySketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // skewed stream: item k appears k times, k = 1..60 (1830 rows)
  private lazy val stream = spark.range(1, 61)
    .select(explode(sequence(lit(1), $"id")).as("rep"), concat(lit("it"), $"id").as("item"))
    .select("item")

  test("estimates never underestimate and respect the CMS error bound") {
    val truth = (1 to 60).map(k => s"it$k" -> k.toLong).toMap
    val est = FrequencySketch
      .heavyHitters(stream, stream, "item", depth = 4, width = 256, threshold = 0L)
      .as[(String, Long)].collect().toMap
    assert(est.keySet == truth.keySet)
    truth.foreach { case (item, t) =>
      assert(est(item) >= t, s"$item underestimated: ${est(item)} < $t")
    }
    // ε = e/w bound on the overestimate, N = 1830 rows
    val eps = math.E / 256
    val n = 1830
    val overshoots = truth.count { case (item, t) => est(item) - t > eps * n }
    assert(overshoots == 0, s"$overshoots items exceed the eN/w bound")
  }

  test("heavy hitters with a threshold form a superset of the truth") {
    val hh = FrequencySketch
      .heavyHitters(stream, stream, "item", 4, 256, threshold = 40L)
      .as[(String, Long)].collect().toMap
    val trueHeavy = (40 to 60).map(k => s"it$k").toSet
    assert(trueHeavy.subsetOf(hh.keySet)) // no false negatives, ever
  }

  test("sketches merge by counter addition") {
    def tbl(df: org.apache.spark.sql.DataFrame) =
      FrequencySketch.cmsTable(df, "item", 3, 64)
        .as[(Int, Long, Long)].collect().map { case (j, i, c) => (j, i) -> c }.toMap
    val whole = tbl(stream)
    // disjoint row split by item hash; sketch(h1 ∪ h2) = sketch(h1) + sketch(h2)
    val h1 = stream.where(xxhash64($"item") % 2 === 0)
    val h2 = stream.where(xxhash64($"item") % 2 =!= 0)
    val merged = (tbl(h1).toSeq ++ tbl(h2).toSeq)
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    assert(merged == whole)
  }

  test("null items are skipped, absent buckets estimate 0") {
    val df = Seq(Some("a"), None, Some("a"), Some("b")).toDF("item")
    val sketch = FrequencySketch.cmsTable(df, "item", 4, 64)
    val est = FrequencySketch
      .estimateCounts(sketch, Seq("a", "b", "zz_unseen").toDF("item"), "item", 4, 64)
      .as[(String, Long)].collect().toMap
    assert(est("a") >= 2 && est("b") >= 1)
    // an unseen item can only collide into occupied buckets or hit empty
    // ones; with 3 occupied cells in a 64-wide row, 4 rows, expect 0
    assert(est("zz_unseen") <= 3)
  }

  test("itemCol colliding with internal names is rejected loudly") {
    // a column literally named j/idx/cnt/__md5 would alias into the lane
    // expressions / estimate join and fail (or mis-resolve) at analysis
    val df = Seq("a", "b").toDF("j")
    val ex = intercept[IllegalArgumentException] {
      FrequencySketch.cmsTable(df, "j", depth = 4, width = 64)
    }
    assert(ex.getMessage.contains("collides"))
    val sketch = FrequencySketch.cmsTable(df.toDF("item"), "item", 4, 64)
    intercept[IllegalArgumentException] {
      FrequencySketch.estimateCounts(sketch, df.toDF("cnt"), "cnt", 4, 64)
    }
  }
}
