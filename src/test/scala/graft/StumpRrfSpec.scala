package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StumpRrfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("stump finds the perfectly separating threshold") {
    // feature value <= 2 is all label 1, > 2 all label 0: Gini 0 at v=2
    val f = Seq((1L, 1L), (2L, 1L), (3L, 0L), (4L, 0L))
      .map { case (v, l) => ("f", v, l) }.toDF("feature", "value", "lab")
    val r = graft.ops.DecisionStump.bestSplits(f, "feature", "value", "lab")
      .collect()(0)
    assert(r.getLong(1) == 2L)   // split_value
    assert(r.getLong(2) == 0L)   // score_ppm: pure split
    assert((r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)) ==
      (2L, 2L, 2L, 0L))
  }

  test("stump hand-computed mixed split and smallest-value tie-break") {
    // values 1(lab1) 2(lab0) 3(lab1) 4(lab0): any split is imperfect.
    // v=1: L=(1,1,0) G=0; R=(3,1,2): (9-1-4)*1e6/(3*4)=333333 -> 333333
    // v=2: L=(2,1,1): (4-1-1)*1e6/(2*4)=250000; R=(2,1,1): 250000 -> 500000
    // v=3: symmetric to v=1 -> 333333. Best: tie 333333 at v=1 and v=3
    // -> smallest value 1 wins.
    val f = Seq((1L, 1L), (2L, 0L), (3L, 1L), (4L, 0L))
      .map { case (v, l) => ("f", v, l) }.toDF("feature", "value", "lab")
    val r = graft.ops.DecisionStump.bestSplits(f, "feature", "value", "lab")
      .collect()(0)
    assert(r.getLong(1) == 1L && r.getLong(2) == 333333L)
  }

  test("stump score bounds and side accounting hold on random data") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(300) { i =>
      (s"f${i % 3}", rnd.nextInt(10).toLong, rnd.nextInt(2).toLong)
    }
    val out = graft.ops.DecisionStump.bestSplits(
      rows.toDF("feature", "value", "lab"), "feature", "value", "lab")
      .collect()
    assert(out.length == 3)
    val totals = rows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    out.foreach { r =>
      val score = r.getLong(2)
      assert(score >= 0L && score <= 500000L,
        s"weighted binary Gini must sit in [0, 0.5]: $score")
      assert(r.getLong(3) + r.getLong(5) == totals(r.getString(0)))
    }
  }

  test("rrf fuses two lists with exact integer contributions") {
    // query 1: list A ranks docs (10,20,30), list B ranks (20,10,40)
    val ra = Seq((1L, 10L, 1), (1L, 20L, 2), (1L, 30L, 3))
      .toDF("query_id", "neighbor_id", "rank")
    val rb = Seq((1L, 20L, 1), (1L, 10L, 2), (1L, 40L, 3))
      .toDF("query_id", "neighbor_id", "rank")
    val out = graft.ops.RankFusion.reciprocalRankFusion(Seq(ra, rb),
        k0 = 60, topK = 4)
      .orderBy("rank").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
    val c = (r: Int) => 1000000L / (60L + r)
    // 10: r1+r2 = 16393+16129 = 32522; 20: r2+r1 = same 32522 (tie ->
    // smaller id first); 30: 15873; 40: 15873 (tie -> 30 first)
    assert(out.toSeq == Seq(
      (1, 10L, c(1) + c(2)), (2, 20L, c(1) + c(2)),
      (3, 30L, c(3)), (4, 40L, c(3))))
  }

  test("inner-product ranking orders by dot desc then id") {
    val corpus = Seq((1L, Array(1.0, 0.0)), (2L, Array(2.0, 0.0)),
      (3L, Array(0.0, 5.0)), (4L, Array(2.0, 0.0)))
      .toDF("id", "v")
    val queries = Seq((9L, Array(1.0, 0.0))).toDF("id", "v")
    val out = graft.ops.RankFusion.innerProductTopK(corpus, "id", "v",
        queries, "id", "v", k = 4)
      .orderBy("rank").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    // dots: 2 -> 2, 4 -> 2 (tie: id 2 first), 1 -> 1, 3 -> 0
    assert(out.toSeq == Seq((1, 2L, 2.0), (2, 4L, 2.0), (3, 1L, 1.0),
      (4, 3L, 0.0)))
  }
}
