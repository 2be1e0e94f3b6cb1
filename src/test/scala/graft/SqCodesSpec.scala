package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Similarity

class SqCodesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("sq codes: min -> 0, max -> 255, constant dim -> 0, order kept") {
    val rows = Seq(
      (1L, Array(0.0f, 0.5f, -1.0f)),
      (2L, Array(1.0f, 0.5f, 0.0f)),
      (3L, Array(0.5f, 0.5f, 1.0f)))
    val out = Similarity.sqCodes(rows.toDF("vec_id", "embedding"),
      "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // dim 1: range [0, 10000]: 0 -> 0, 10000 -> 255, 5000 -> 127
    // dim 2: constant -> 0 everywhere
    // dim 3: range [-10000, 10000]: -1 -> 0, 0 -> 127, 1 -> 255
    assert(out(1L) == Seq(0L, 0L, 0L))
    assert(out(2L) == Seq(255L, 0L, 127L))
    assert(out(3L) == Seq(127L, 0L, 255L))
  }

  test("code ranking preserves exact neighbors on well-separated clusters") {
    val rnd = new scala.util.Random(9)
    // two tight clusters far apart: SQ at 8 bits cannot confuse them
    val rows = (0L until 40L).map { i =>
      val base = if (i % 2 == 0) 0.9f else -0.9f
      (i, Array.fill(8)(base + rnd.nextFloat() * 0.01f))
    }
    val df = rows.toDF("vec_id", "embedding")
    val q = df.select($"vec_id", Similarity.quantize($"embedding").as("qv"))
    val truth = Similarity.bruteForceTopK(q, "vec_id", "qv",
      q.where($"vec_id" < 4), "vec_id", "qv", k = 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1) % 2)).toSet
    val codes = Similarity.sqCodes(df, "vec_id", "embedding")
    // rank on RECONSTRUCTED values: raw shifted codes would scramble
    // cosine geometry (not shift-invariant)
    val approx = Similarity.bruteForceTopK(codes, "vec_id", "recon",
      codes.where($"vec_id" < 4), "vec_id", "recon", k = 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1) % 2)).toSet
    // every retrieved neighbor stays in the query's own parity cluster
    assert(truth.forall { case (q2, par) => par == q2 % 2 })
    assert(approx.forall { case (q2, par) => par == q2 % 2 })
  }
}
