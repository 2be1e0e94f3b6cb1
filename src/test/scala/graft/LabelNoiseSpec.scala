package graft

import org.scalatest.funsuite.AnyFunSuite

class LabelNoiseSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // two tight clusters far apart; labels follow clusters except id 8,
  // a label-1 point sitting inside the label-0 cluster (a mislabel),
  // and id 4 (probe, clean). probeModulus = 4 -> probes are 0, 4, 8, 12
  private val pts = Seq(
    (0L, Seq(0.00f, 0.0f), 0), (1L, Seq(0.01f, 0.0f), 0),
    (2L, Seq(0.02f, 0.0f), 0), (3L, Seq(0.03f, 0.0f), 0),
    (4L, Seq(0.04f, 0.0f), 0), (5L, Seq(0.05f, 0.0f), 0),
    (8L, Seq(0.06f, 0.0f), 1), // mislabel: label 1 deep in cluster 0
    (12L, Seq(5.00f, 0.0f), 1), (13L, Seq(5.01f, 0.0f), 1),
    (14L, Seq(5.02f, 0.0f), 1), (15L, Seq(5.03f, 0.0f), 1))
    .toDF("vec_id", "embedding", "label")

  test("a mislabeled point is flagged; clean probes are not") {
    val out = graft.ops.LabelNoise.knnLabelAudit(pts, "vec_id",
        "embedding", "label", k = 5, probeModulus = 4L)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // label 0 probes: ids 0 and 4, both inside their own cluster
    assert(out(0L)._2 == 2 && out(0L)._3 == 0 && out(0L)._4 == 0)
    // label 1 probes: id 8 (flagged — its 5-NN are all label 0) and
    // id 12 (clean — its 5-NN include 13/14/15 but also far cluster-0
    // points; 3 of 5 agree, majority -> not flagged)
    assert(out(1L)._2 == 2 && out(1L)._3 == 1 && out(1L)._4 == 500)
  }

  test("agreement ppm is the exact floored ratio of summed top-k bits") {
    val out = graft.ops.LabelNoise.knnLabelAudit(pts, "vec_id",
        "embedding", "label", k = 3, probeModulus = 4L)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // label 0, k=3: probes 0 and 4 each have all-3 same-label NNs
    assert(out(0L)._5 == 1000000L)
    // label 1, k=3: probe 8 -> 0/3 agree; probe 12 -> 3/3 agree
    // agree_ppm = 1e6*3 div 6 = 500000
    assert(out(1L)._5 == 500000L)
  }

  test("ties on distance break by train_id like the oracle's ROW_NUMBER") {
    // probe 0 at origin; ids 1 and 2 equidistant with different labels:
    // k=1 must pick train_id 1 (label 0 -> agree)
    val tie = Seq(
      (0L, Seq(0.0f, 0.0f), 0),
      (1L, Seq(1.0f, 0.0f), 0),
      (2L, Seq(-1.0f, 0.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = graft.ops.LabelNoise.knnLabelAudit(tie, "vec_id",
        "embedding", "label", k = 1, probeModulus = 4L)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq((0L, 1L, 0L, 0L, 1000000L)))
  }
}
