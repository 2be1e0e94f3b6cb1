package graft

import graft.ops.DocSimilarity
import org.scalatest.funsuite.AnyFunSuite

class DocSimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // n_docs=3, df: x=2 y=2 z=2 q=1 -> idf_x1000: 1500/1500/1500/3000
  // w1={x:3000,y:1500} n2=11.25e6; w2={x,y,z:1500} n2=6.75e6;
  // w3={z:1500,q:3000} n2=11.25e6
  // dot(1,2)=6.75e6 -> cos2=(num²·1000)div(n2a·n2b)=600
  // dot(2,3)=2.25e6 -> cos2=66; (1,3) share nothing -> absent
  test("topKSimilarDocs: hand-computed squared-cosine per-mille ranking") {
    val docs = Seq((1L, "x x y"), (2L, "x y z"), (3L, "z q"))
      .toDF("doc_id", "text")
    val out = DocSimilarity.topKSimilarDocs(docs, "doc_id", "text",
        k = 2, maxDf = 3)
      .select("doc_id", "rank", "nbr_id", "cos2_permille")
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(out == Set(
      (1L, 1, 2L, 600L),
      (2L, 1, 1L, 600L), (2L, 2, 3L, 66L),
      (3L, 1, 2L, 66L)))
  }

  test("topKSimilarDocs: df cap drops stopword-only overlap") {
    // "the" appears in all 3 docs; with maxDf=2 it leaves every vector,
    // so docs 1 and 3 (sharing only "the") get no pair at all
    val docs = Seq((1L, "the alpha"), (2L, "the alpha beta"), (3L, "the gamma"))
      .toDF("doc_id", "text")
    val out = DocSimilarity.topKSimilarDocs(docs, "doc_id", "text",
        k = 3, maxDf = 2)
      .select("doc_id", "nbr_id").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 2L), (2L, 1L))) // 3 is isolated
  }

  test("topKSimilarDocs: plan is an inverted-index equi-join, no cross join") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = graft.ops.DocSimilarity
      .topKSimilarDocs(docs, "doc_id", "text", k = 3, maxDf = 50)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    // the posting-list pair generation is a keyed join (the only
    // nested-loop joins allowed are the broadcast 1-row totals factors)
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("BroadcastHashJoin"), plan)
    assert(plan.linesIterator.filter(_.contains("BroadcastNestedLoop"))
      .forall(_.contains("BuildRight, Cross")), plan)
    // the top-k is the k-slot aggregate, not a rank-window sort
    assert(plan.contains("topkbyagg") && !plan.contains("row_number"), plan)
  }

  test("topKSimilarDocs: identical docs score 1000") {
    val docs = Seq((1L, "a b c"), (2L, "a b c"), (3L, "unrelated words here"))
      .toDF("doc_id", "text")
    val out = DocSimilarity.topKSimilarDocs(docs, "doc_id", "text",
        k = 1, maxDf = 3)
      .select("doc_id", "nbr_id", "cos2_permille")
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 2L, 1000L), (2L, 1L, 1000L)))
  }
}
