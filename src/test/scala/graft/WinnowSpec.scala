package graft

import org.scalatest.funsuite.AnyFunSuite

class WinnowSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pairs(docs: Seq[(Long, String)], threshold: Double) =
    graft.ops.Dedup.winnowingPairs(docs.toDF("doc_id", "text"),
        "doc_id", "text", n = 4, w = 5, threshold = threshold)
      .as[(Long, Long, Long, Double)].collect()

  test("winnowing guarantee: a shared run of w+n-1 tokens is detected") {
    // docs 1/2 share EXACTLY the 8-token run (w+n-1 = 5+4-1); the rest
    // of each text is disjoint — at least one fingerprint must match,
    // so the pair appears at any positive threshold
    val shared = "alpha bravo charlie delta echo foxtrot golf hotel"
    val docs = Seq(
      (1L, s"one two three four five six $shared aa bb cc dd ee ff"),
      (2L, s"zz yy xx ww vv uu $shared k1 k2 k3 k4 k5 k6"))
    val got = pairs(docs, threshold = 0.01)
    assert(got.exists(p => p._1 == 1L && p._2 == 2L),
      s"guarantee violated: ${got.mkString(",")}")
  }

  test("identical docs score jaccard 1.0; disjoint docs never pair") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again today"),
      (2L, "the quick brown fox jumps over the lazy dog again today"),
      (3L, "completely different words in every single position here now"))
    val got = pairs(docs, threshold = 0.5)
    assert(got.toSeq == Seq((1L, 2L, got.head._3, 1.0)))
  }

  test("fingerprint density: far fewer fingerprints than shingles") {
    val text = (1 to 200).map(i => s"w${i % 37}").mkString(" ")
    val sel = graft.ops.Dedup.winnowingPairs(
      Seq((1L, text), (2L, text)).toDF("doc_id", "text"),
      "doc_id", "text", n = 4, w = 5, threshold = 0.5)
    // the pair must match fully; its shared-fingerprint count is the
    // doc's fingerprint-set size, far below the 197 gram positions
    val row = sel.as[(Long, Long, Long, Double)].head()
    assert(row._4 == 1.0)
    assert(row._3 < 120, s"expected winnowed density, got ${row._3}")
  }

  test("hot-bucket cap bounds candidates only: surviving pairs score on uncapped sets") {
    // all 4 docs share the 8-token run H -> one common fingerprint whose
    // bucket (4 docs) trips maxBucketSize = 3 and is dropped from
    // candidate mining; docs 1/2 are IDENTICAL, so their pair must still
    // be mined through the other buckets AND score jaccard exactly 1.0 —
    // n_shared must come from the uncapped fingerprint sets, not the
    // capped ones (else the shared-hot fp deflates it below 1.0)
    val h = "hot1 hot2 hot3 hot4 hot5 hot6 hot7 hot8"
    val docs = Seq(
      (1L, s"a1 a2 a3 a4 a5 a6 $h b1 b2 b3 b4 b5 b6"),
      (2L, s"a1 a2 a3 a4 a5 a6 $h b1 b2 b3 b4 b5 b6"),
      (3L, s"c1 c2 c3 c4 c5 c6 $h d1 d2 d3 d4 d5 d6"),
      (4L, s"e1 e2 e3 e4 e5 e6 $h f1 f2 f3 f4 f5 f6"))
    val got = graft.ops.Dedup.winnowingPairs(docs.toDF("doc_id", "text"),
        "doc_id", "text", n = 4, w = 5, threshold = 0.9, maxBucketSize = 3)
      .as[(Long, Long, Long, Double)].collect()
    assert(got.exists(p => p._1 == 1L && p._2 == 2L && p._4 == 1.0),
      s"expected uncapped-jaccard 1.0 for the identical pair: ${got.mkString(",")}")
  }

  test("partition-invariant") {
    val docs = (1L to 30L).map(i =>
      (i, (1 to 40).map(j => s"t${(i * 7 + j * 3) % 23}").mkString(" ")))
    val one = pairs(docs, 0.3).toSet
    val many = graft.ops.Dedup.winnowingPairs(
        docs.toDF("doc_id", "text").repartition(11),
        "doc_id", "text", n = 4, w = 5, threshold = 0.3)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(one == many)
  }
}
