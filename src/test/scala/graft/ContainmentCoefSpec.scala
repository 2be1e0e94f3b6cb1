package graft

import graft.ops.{Dedup, Triangles}
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the round-7 containment dedup + clustering-coefficient ops. */
class ContainmentCoefSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("full containment of a short doc in a long host scores 1000") {
    // doc 2's entire shingle set is inside doc 1's; jaccard would be low
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "quick brown fox jumps over"),
      (3L, "completely different words here entirely"))
    val got = Dedup.containmentPairs(docs.toDF("id", "text"), "id", "text",
        n = 3, thresholdPermille = 800L)
      .select("id_a", "id_b", "contain_pm")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 1000L)))
  }

  test("containment threshold excludes partial overlap below it") {
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d x y z w")) // shares 2 of 6 shingles -> ~333 permille
    val got = Dedup.containmentPairs(docs.toDF("id", "text"), "id", "text",
        n = 3, thresholdPermille = 800L).count()
    assert(got == 0L)
  }

  test("clustering coefficient: triangle nodes score 1000, path center 0") {
    // triangle a-b-c plus path c-d-e: d has deg 2, no triangle -> 0
    val edges = Seq(("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e"))
    val got = Triangles.clusteringCoefficients(edges.toDF("s", "t"), "s", "t")
      .select("node", "deg", "n_triangles", "coef_pm")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got("a") == (2L, 1L, 1000L))
    assert(got("b") == (2L, 1L, 1000L))
    assert(got("c") == (3L, 1L, 333L))
    assert(got("d") == (2L, 0L, 0L))
    assert(!got.contains("e")) // deg 1 -> excluded
  }

  test("coefficient is computed on the simple graph (dups collapse)") {
    val edges = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("a", "c"))
    val got = Triangles.clusteringCoefficients(edges.toDF("s", "t"), "s", "t")
      .select("node", "deg").as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 2L, "b" -> 2L, "c" -> 2L))
  }
}
