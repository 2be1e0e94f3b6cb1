package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AmsSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("f2_exact is the true second moment, lane sums are bounded") {
    // frequencies: a=3, b=2, c=1 -> F2 = 9+4+1 = 14
    val df = Seq("a", "a", "a", "b", "b", "c").toDF("k")
    val out = graft.ops.AmsSketch.f2Lanes(df, "k", lanes = 8).collect()
    assert(out.length == 8)
    assert(out.forall(_.getAs[Long]("f2_exact") == 14L))
    out.foreach { r =>
      assert(math.abs(r.getAs[Long]("lane_sum")) <= 6L)
      assert(r.getAs[Long]("f2_est") ==
        r.getAs[Long]("lane_sum") * r.getAs[Long]("lane_sum"))
    }
  }

  test("lane sums merge additively across stream splits") {
    val all = Seq("a", "a", "b", "c", "c", "c").toDF("k")
    val p1 = Seq("a", "b", "c").toDF("k")
    val p2 = Seq("a", "c", "c").toDF("k")
    def sums(df: org.apache.spark.sql.DataFrame) =
      graft.ops.AmsSketch.f2Lanes(df, "k", lanes = 4).collect()
        .map(r => r.getAs[Long]("lane") -> r.getAs[Long]("lane_sum")).toMap
    val (sa, s1, s2) = (sums(all), sums(p1), sums(p2))
    (0L to 3L).foreach { l => assert(sa(l) == s1(l) + s2(l)) }
  }

  test("a single-key stream estimates F2 exactly on every lane") {
    // all items share one sign per lane: Z = ±n, Z² = n² = F2
    val df = Seq.fill(5)("only").toDF("k")
    val out = graft.ops.AmsSketch.f2Lanes(df, "k", lanes = 6).collect()
    assert(out.forall(_.getAs[Long]("f2_est") == 25L))
    assert(out.forall(_.getAs[Long]("f2_exact") == 25L))
  }

  test("cross moment: exact join size and per-lane product identity") {
    // A: a×2, b×1 ; B: a×3, c×2 -> join size = 2*3 = 6
    val a = Seq("a", "a", "b").toDF("k")
    val b = Seq("a", "a", "a", "c", "c").toDF("k")
    val out = graft.ops.AmsSketch.crossMomentLanes(a, "k", b, "k", lanes = 8)
      .collect()
    assert(out.length == 8)
    assert(out.forall(_.getAs[Long]("join_size_exact") == 6L))
    out.foreach { r =>
      assert(r.getAs[Long]("est_prod") ==
        r.getAs[Long]("z_a") * r.getAs[Long]("z_b"))
    }
  }

  test("cross moment: disjoint key sets join to zero exactly") {
    val out = graft.ops.AmsSketch.crossMomentLanes(
      Seq("a", "b").toDF("k"), "k", Seq("x", "y").toDF("k"), "k", lanes = 4)
      .collect()
    assert(out.forall(_.getAs[Long]("join_size_exact") == 0L))
  }

  test("cross moment of a stream with itself degenerates to F2") {
    val df = Seq("a", "a", "b", "c").toDF("k")
    val cross = graft.ops.AmsSketch.crossMomentLanes(df, "k", df, "k", 6)
      .collect().map(r => r.getAs[Long]("lane") ->
        (r.getAs[Long]("est_prod"), r.getAs[Long]("join_size_exact"))).toMap
    val f2 = graft.ops.AmsSketch.f2Lanes(df, "k", 6)
      .collect().map(r => r.getAs[Long]("lane") ->
        (r.getAs[Long]("f2_est"), r.getAs[Long]("f2_exact"))).toMap
    assert(cross == f2)
  }

  test("the mean lane estimate lands near F2 on a spread stream") {
    val df = (1 to 200).map(i => s"k${i % 50}").toDF("k")
    val out = graft.ops.AmsSketch.f2Lanes(df, "k", lanes = 16).collect()
    val exact = out.head.getAs[Long]("f2_exact")
    val mean = out.map(_.getAs[Long]("f2_est")).sum / out.length
    // unbiased estimator, 16 lanes: expect the mean within 3x of truth
    assert(mean > exact / 3 && mean < exact * 3,
      s"mean=$mean exact=$exact")
  }
}
