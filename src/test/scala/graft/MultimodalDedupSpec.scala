package graft

import graft.ops.Multimodal
import org.scalatest.funsuite.AnyFunSuite

class MultimodalDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("identical payloads collapse to the smallest asset id") {
    val assets = Multimodal.packAssets(
      Seq((2L, "same"), (1L, "same"), (3L, "other")).toDF("doc_id", "text"),
      "doc_id", "text")
    val got = Multimodal.dedupAssets(assets)
      .as[(String, Long, Long)].collect()
      .map(r => r._3 -> r._2).toMap
    assert(got == Map(1L -> 2L, 3L -> 1L)) // keeper -> n_copies
  }

  test("digest is payload-defined: distinct bytes never merge") {
    val assets = Multimodal.packAssets(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text"),
      "doc_id", "text")
    assert(Multimodal.dedupAssets(assets).count() == 3L)
  }
}
