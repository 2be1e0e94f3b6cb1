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

  private def ranked(rows: Seq[(Long, Long, Int)]) =
    rows.toDF("query_id", "neighbor_id", "rank")

  test("reciprocal rank finds the true top-1 or reports 0") {
    val truth = ranked(Seq((1L, 10L, 1), (1L, 11L, 2), (2L, 20L, 1)))
    val approx = ranked(Seq((1L, 99L, 1), (1L, 10L, 2), (2L, 21L, 1)))
    val out = graft.ops.AnnAudit.reciprocalRank(truth, approx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 2L, 500000L), (2L, 0L, 0L)))
  }

  test("ndcg@5: perfect list scores 1e6, half-relevant list the hand value") {
    val truth = ranked(Seq((1L, 10L, 1), (1L, 11L, 2)))
    val perfect = ranked(Seq((1L, 10L, 1), (1L, 11L, 2)))
    val p = graft.ops.AnnAudit.ndcgAtK(truth, perfect, k = 5).collect()(0)
    assert(p.getLong(3) == 1000000L)
    // only the truth's 11 found, at rank 3: dcg = 500000,
    // idcg = 1000000 + 630929 = 1630929
    val partial = ranked(Seq((1L, 99L, 1), (1L, 98L, 2), (1L, 11L, 3)))
    val q = graft.ops.AnnAudit.ndcgAtK(truth, partial, k = 5).collect()(0)
    assert((q.getLong(1), q.getLong(2)) == ((500000L, 1630929L)))
    assert(q.getLong(3) == 1000000L * 500000L / 1630929L)
  }

  test("ndcg of an empty approx list is 0, never null or an error") {
    val truth = ranked(Seq((5L, 1L, 1)))
    val approx = ranked(Seq.empty[(Long, Long, Int)])
    val r = graft.ops.AnnAudit.ndcgAtK(truth, approx, k = 5).collect()(0)
    assert(r.getLong(1) == 0L && r.getLong(3) == 0L)
  }
}
