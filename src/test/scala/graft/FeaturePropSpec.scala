package graft

import graft.ops.FeatureProp
import org.scalatest.funsuite.AnyFunSuite

class FeaturePropSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hand-computed neighbor floor-mean on a path graph") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val feats = Seq(
      (1L, Seq(1.0f, -0.5f)),
      (2L, Seq(2.0f, 0.25f)),
      (3L, Seq(4.0f, 0.1f))).toDF("vec_id", "embedding")
    val got = FeatureProp.neighborMean(edges, "src", "dst", feats,
        "vec_id", "embedding")
      .orderBy("node", "pos").as[(Long, Int, Long)].collect().toSeq
    // quantized: 1->[10000,-5000], 2->[20000,2500], 3->[40000,1000]
    assert(got == Seq(
      (1L, 0, 20000L), (1L, 1, 2500L),          // N(1) = {2}
      (2L, 0, 25000L), (2L, 1, -2000L),         // N(2) = {1,3}: floor((-5000+1000)/2)
      (3L, 0, 20000L), (3L, 1, 2500L)))         // N(3) = {2}
  }

  test("nodes without featured neighbors are absent; self-loops dropped") {
    val edges = Seq((1L, 1L), (1L, 99L)).toDF("src", "dst") // 99 has no feats
    val feats = Seq((1L, Seq(1.0f))).toDF("vec_id", "embedding")
    val got = FeatureProp.neighborMean(edges, "src", "dst", feats,
        "vec_id", "embedding")
      .as[(Long, Int, Long)].collect().toSeq
    // only node 99 has a featured neighbor (node 1); 1's neighbor 99 has
    // no features and the self-loop is dropped
    assert(got == Seq((99L, 0, 10000L)))
  }
}
