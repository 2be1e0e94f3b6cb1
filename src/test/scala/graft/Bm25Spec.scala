package graft

import org.scalatest.funsuite.AnyFunSuite

class Bm25Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "hash join hash join hash"), // tf(hash)=3, dl=5
    (2L, "hash scan"),
    (3L, "scan scan scan scan"),
    (4L, "merge sort window"))
    .toDF("doc_id", "text")

  /** Independent brute force of the documented quantized formula. */
  private def expected(qterms: Seq[String], k: Int): Seq[(Long, Long)] = {
    val toks = Map(1L -> Seq("hash", "join", "hash", "join", "hash"),
      2L -> Seq("hash", "scan"), 3L -> Seq.fill(4)("scan"),
      4L -> Seq("merge", "sort", "window"))
    val nDocs = toks.size.toLong
    val sTok = toks.values.map(_.size).sum.toLong
    def score(d: Long): Long = qterms.map { t =>
      val tf = toks(d).count(_ == t).toLong
      if (tf == 0) 0L
      else {
        val df = toks.values.count(_.contains(t)).toLong
        val idf = (1000000L * (nDocs - df + 1)) / (df + 1)
        val dl = toks(d).size.toLong
        val tfn = (22000000L * tf * sTok) /
          (10L * sTok * tf + 3L * sTok + 9L * dl * nDocs)
        idf * tfn / 1000000L
      }
    }.sum
    toks.keys.toSeq.map(d => (d, score(d))).filter(_._2 > 0)
      .sortBy { case (d, s) => (-s, d) }.take(k)
  }

  test("scores match the quantized formula, ranked (score desc, id asc)") {
    val qs = Seq((1L, "hash"), (1L, "scan")).toDF("query_id", "term")
    val got = graft.ops.Bm25.topKDocs(docs, "doc_id", "text", qs, k = 10)
      .orderBy("rank")
      .select("doc_id", "score_ppm").as[(Long, Long)].collect().toSeq
    assert(got == expected(Seq("hash", "scan"), 10))
    // doc 1 saturates tf(hash)=3 but misses scan; doc 2 hits both rare
    // and common terms — the ranking must come from the formula, not
    // raw tf
    assert(got.nonEmpty && got.map(_._1).toSet == Set(1L, 2L, 3L))
  }

  test("idf orders rare above common at equal tf") {
    // 'join' appears in 1 doc, 'scan' in 2: for a doc containing each
    // once with the same dl, the join contribution must be larger
    val qs = Seq((1L, "join"), (2L, "scan")).toDF("query_id", "term")
    val byQ = graft.ops.Bm25.topKDocs(docs, "doc_id", "text", qs, k = 1)
      .select("query_id", "score_ppm").as[(Long, Long)].collect().toMap
    assert(byQ(1L) > byQ(2L))
  }

  test("k caps and ranks are dense from 1") {
    val qs = Seq((9L, "scan")).toDF("query_id", "term")
    val got = graft.ops.Bm25.topKDocs(docs, "doc_id", "text", qs, k = 1)
      .select("query_id", "rank", "doc_id").as[(Long, Int, Long)].collect()
    assert(got.length == 1 && got.head._2 == 1)
    // doc 3 (tf=4) outscores doc 2 (tf=1) on 'scan'
    assert(got.head._3 == 3L)
  }
}
