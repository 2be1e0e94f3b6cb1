package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Multimodal, Robustness}

class PhashRobustnessSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("phash: exact-duplicate payloads pair at distance 0; threshold respected") {
    val docs = Seq(
      (1L, "the same text"), (2L, "the same text"), // dup pair
      (3L, "something else entirely"),
      (4L, "yet another unique document"),
      (5L, "the same text")) // triple with 1 and 2
    val assets = Multimodal.packAssets(docs.toDF("doc_id", "text"),
      "doc_id", "text")
    val out = Multimodal.phashNearDup(assets, bands = 4, maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSet == Set((1L, 2L, 0L), (1L, 5L, 0L), (2L, 5L, 0L)))
  }

  test("phash: ordering, threshold and band bucketing hold on a larger corpus") {
    val docs = (0L until 200L).map(i => (i, s"doc body number $i"))
    val assets = Multimodal.packAssets(docs.toDF("doc_id", "text"),
      "doc_id", "text")
    val out = Multimodal.phashNearDup(assets, bands = 4, maxHamming = 25)
      .collect()
    out.foreach { r =>
      assert(r.getLong(0) < r.getLong(1) && r.getLong(2) <= 25L)
    }
    intercept[IllegalArgumentException] {
      Multimodal.phashNearDup(assets, bands = 7, maxHamming = 5)
    }
  }

  test("percolation: removals are NESTED across fractions, f=0 is the full graph") {
    val rnd = new scala.util.Random(37)
    val edges = Seq.fill(150)((s"n${rnd.nextInt(40)}", s"n${rnd.nextInt(40)}"))
      .filter(e => e._1 != e._2).toDF("src", "dst")
    val out = Robustness.randomFailureSweep(edges, "src", "dst",
      Seq(250, 500, 750)).orderBy("f_permille").collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(0, 250, 500, 750))
    // monotone: higher fraction can only remove more
    val ms = out.map(_.getLong(2))
    assert(ms.zip(ms.tail).forall { case (a, b) => a >= b })
    val ns = out.map(_.getLong(1))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
    assert(out.head.getLong(3) <= out.head.getLong(1)) // lcc <= nodes
  }

  test("robustness: removing the star hub shatters the giant component") {
    val edges = Seq(("h", "a"), ("h", "b"), ("h", "c"), ("h", "d"),
      ("x", "y")).toDF("src", "dst")
    val r = Robustness.hubRemovalImpact(edges, "src", "dst", topK = 1)
      .collect().head
    assert(r.getLong(0) == 7L && r.getLong(1) == 5L && r.getLong(2) == 5L)
    // hub h removed: only x-y survives; a..d become invisible singletons
    assert(r.getLong(3) == 2L && r.getLong(4) == 1L && r.getLong(5) == 2L)
  }
}
