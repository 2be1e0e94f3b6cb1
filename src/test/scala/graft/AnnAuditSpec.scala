package graft

import org.scalatest.funsuite.AnyFunSuite

class AnnAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("recall counts identity hits, keeps misses, drops approx-only") {
    val truth = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 20L))
      .toDF("query_id", "neighbor_id")
    val approx = Seq((1L, 11L), (1L, 12L), (1L, 99L), (3L, 30L))
      .toDF("query_id", "neighbor_id")
    val out = graft.ops.AnnAudit.recallAtK(truth, approx)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 3L, 2L, 666L), // 2 of 3 recalled, floor permille
      (2L, 1L, 0L, 0L))) // query the index missed entirely still reports
  }

  test("perfect recall is exactly 1000 regardless of rank order") {
    val truth = Seq((7L, 1L), (7L, 2L)).toDF("query_id", "neighbor_id")
    val approx = Seq((7L, 2L), (7L, 1L)).toDF("query_id", "neighbor_id")
    val r = graft.ops.AnnAudit.recallAtK(truth, approx).collect()(0)
    assert(r.getLong(3) == 1000L)
  }
}
