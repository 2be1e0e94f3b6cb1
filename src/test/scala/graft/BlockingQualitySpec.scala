package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BlockingQualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def eval(cand: Seq[(Long, Long)], truth: Seq[(Long, Long)],
      nDocs: Int) = {
    val r = graft.ops.BlockingQuality.evaluate(
      cand.toDF("id_a", "id_b"), truth.toDF("id_a", "id_b"),
      (1 to nDocs).toDF("doc")).collect()(0)
    (r.getAs[Long]("n_truth"), r.getAs[Long]("n_cand"),
      r.getAs[Long]("n_hit"), r.getAs[Long]("recall_permille"),
      r.getAs[Long]("reduction_ppm"))
  }

  test("perfect blocking: candidates = truth") {
    val pairs = Seq((1L, 2L), (3L, 4L))
    // 5 docs -> 10 possible pairs, 2 candidates -> reduction 800000
    assert(eval(pairs, pairs, 5) == (2L, 2L, 2L, 1000L, 800000L))
  }

  test("missed truth pairs lower recall proportionally") {
    val (nt, nc, nh, rec, _) =
      eval(Seq((1L, 2L)), Seq((1L, 2L), (3L, 4L), (5L, 6L)), 10)
    assert((nt, nc, nh) == (3L, 1L, 1L))
    assert(rec == 333L)
  }

  test("no blocking at all: zero reduction, full recall") {
    // all 6 pairs of 4 docs as candidates
    val all = for (i <- 1L to 4L; j <- i + 1 to 4L) yield (i, j)
    val (_, _, _, rec, red) = eval(all, Seq((1L, 2L)), 4)
    assert(rec == 1000L && red == 0L)
  }

  test("empty truth reports vacuous recall 1000") {
    val (_, _, _, rec, _) = eval(Seq((1L, 2L)), Seq.empty, 4)
    assert(rec == 1000L)
  }

  test("duplicate pair rows are counted once on both sides") {
    val (nt, nc, nh, _, _) =
      eval(Seq((1L, 2L), (1L, 2L)), Seq((1L, 2L), (1L, 2L)), 4)
    assert((nt, nc, nh) == (1L, 1L, 1L))
  }

  private def calib(rows: Seq[(Double, Boolean)]) =
    graft.ops.Agreement.calibrationBins(rows.toDF("score", "lab"),
        "score", "lab")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

  test("calibration bins partition rows and rates are exact") {
    val m = calib(Seq((0.05, false), (0.05, true), (0.55, true),
      (0.58, true), (0.95, true)))
    assert(m(0L) == (2L, 1L, 500000L))
    assert(m(5L) == (2L, 2L, 1000000L))
    assert(m(9L) == (1L, 1L, 1000000L))
    assert(m.values.map(_._1).sum == 5L)
  }

  test("score 1.0 lands in the overflow bin nBins, not nBins-1") {
    val m = calib(Seq((1.0, true)))
    assert(m.keySet == Set(10L), "floor(1.0*10) = 10 is its own bin")
  }
}
