package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FeatureHashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, Seq("spark", "join", "spark", "agg")),
    (2L, Seq("join", "scan")),
    (3L, Seq.empty[String]))

  test("buckets stay in range and counts conserve the token total") {
    val out = graft.ops.FeatureHash
      .hashFeatures(docs.toDF("doc_id", "toks"), "doc_id", "toks", bits = 3)
      .collect()
    assert(out.forall { r =>
      val b = r.getAs[Long]("bucket"); b >= 0L && b < 8L
    })
    assert(out.map(_.getAs[Long]("n_tokens")).sum == 6L)
    // empty docs contribute no rows
    assert(!out.exists(_.getAs[Long]("doc_id") == 3L))
  }

  test("the signed sum is bounded by the bucket count and shares parity") {
    val out = graft.ops.FeatureHash
      .hashFeatures(docs.toDF("doc_id", "toks"), "doc_id", "toks", bits = 2)
      .collect()
    out.foreach { r =>
      val v = r.getAs[Long]("feat_val")
      val n = r.getAs[Long]("n_tokens")
      assert(math.abs(v) <= n)
      assert((v - n) % 2 == 0, "each token moves the sum by exactly ±1")
    }
  }

  test("identical token multisets hash to identical vectors") {
    val a = graft.ops.FeatureHash
      .hashFeatures(Seq((1L, Seq("x", "y", "x"))).toDF("doc_id", "toks"),
        "doc_id", "toks")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val b = graft.ops.FeatureHash
      .hashFeatures(Seq((9L, Seq("x", "x", "y"))).toDF("doc_id", "toks"),
        "doc_id", "toks")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(a == b)
  }

  test("a token's bucket is stable: doubling it doubles its contribution") {
    val one = graft.ops.FeatureHash
      .hashFeatures(Seq((1L, Seq("tok"))).toDF("doc_id", "toks"),
        "doc_id", "toks").collect()(0)
    val two = graft.ops.FeatureHash
      .hashFeatures(Seq((1L, Seq("tok", "tok"))).toDF("doc_id", "toks"),
        "doc_id", "toks").collect()(0)
    assert(one.getAs[Long]("bucket") == two.getAs[Long]("bucket"))
    assert(two.getAs[Long]("feat_val") == 2L * one.getAs[Long]("feat_val"))
  }

  test("bits bound is loud") {
    intercept[IllegalArgumentException] {
      graft.ops.FeatureHash.hashFeatures(
        docs.toDF("doc_id", "toks"), "doc_id", "toks", bits = 0)
    }
  }
}
