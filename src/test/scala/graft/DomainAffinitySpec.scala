package graft

import graft.ops.DomainAffinity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DomainAffinitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("target-exclusive features score 1000, rest-exclusive score low") {
    // target docs share a private vocabulary; rest docs another
    val docs = Seq(
      (1L, "t", "alpha beta gamma delta"),
      (2L, "t", "alpha beta gamma delta"),
      (3L, "t", "alpha beta gamma delta"),
      (4L, "r", "omega psi chi phi"),
      (5L, "r", "omega psi chi phi"),
      (6L, "r", "omega psi chi phi"))
      .toDF("doc_id", "lang", "text")
    val out = DomainAffinity.score(docs, "doc_id", "text",
        targetPred = col("lang") === "t")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // every bigram of a target doc appears in 3 target / 0 rest docs:
    // (3+1)(ns+B) >= 2(0+1)(nt+B) holds easily -> all affine
    (1L to 3L).foreach(id => assert(out(id)._4 == 1000L, s"doc $id"))
    // rest bigrams: ct=0, cs=3 -> (1)(ns+B) >= 2(4)(nt+B) fails -> 0
    (4L to 6L).foreach(id => assert(out(id)._4 == 0L, s"doc $id"))
  }

  test("sf0.001 documents: en scores above every other language on average") {
    val docs = graft.queries.Tables.documents(spark, "/root/testdata/sf0.001")
    val scored = DomainAffinity.score(docs, "doc_id", "text",
        targetPred = col("lang") === "en")
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .groupBy("lang").agg(avg(col("affinity_permille")).as("m"))
      .as[(String, Double)].collect().toMap
    assert(scored.contains("en"))
    scored.foreach { case (lang, m) =>
      if (lang != "en") assert(scored("en") > m, s"en ${scored("en")} <= $lang $m")
    }
    // every doc has at least one feature row (docs are all >= 2 tokens)
    val n = DomainAffinity.score(docs, "doc_id", "text",
      targetPred = col("lang") === "en").count()
    assert(n == docs.count())
  }

  test("scores are invariant to input partitioning") {
    val docs = graft.queries.Tables.documents(spark, "/root/testdata/sf0.001")
    def run(d: org.apache.spark.sql.DataFrame) =
      DomainAffinity.score(d, "doc_id", "text", col("lang") === "en")
        .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(run(docs) == run(docs.repartition(13)))
  }

  test("stream scoring against a batch-built model equals batch scoring") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.queries.Tables.documents(spark, "/root/testdata/sf0.001")
    val affine = DomainAffinity
      .affineBuckets(docs, "doc_id", "text", col("lang") === "en")
      .cache() // frozen model: scored against by every micro-batch
    val batchScores = DomainAffinity
      .scoreAgainst(docs, "doc_id", "text", affine)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap

    val rows = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect()
    val input = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Map[Long, (Long, Long, Long, Long)]()
    val q = graft.streaming.StreamAffinity.start(
        input.toDS().toDF("doc_id", "text"), "doc_id", "text", affine) {
      (scored, _) =>
        scored.as[(Long, Long, Long, Long)].collect()
          .foreach(r => got(r._1) = r)
    }
    rows.grouped(math.max(1, rows.length / 3)).foreach { chunk =>
      input.addData(chunk.toIndexedSeq); q.processAllAvailable()
    }
    q.stop()
    assert(got.keySet == batchScores.keySet)
    got.foreach { case (id, r) => assert(r == batchScores(id), s"doc $id") }
  }
}
