package graft

import graft.ops.Merge
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** The CDC-apply loop: folding change micro-batches through
  * Merge.applyChanges one at a time (the foreachBatch topology) must
  * land on the same snapshot as applying the per-key LATEST change once
  * — the associativity that makes incremental merge restarts safe.
  */
class MergeFoldSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("sequential micro-batch folds equal one compacted apply") {
    val base = (1L to 20L).map(k => (k, s"s$k", k * 10L)).toDF("k", "s", "v")
    // three ordered batches touching overlapping keys
    val b1 = Seq((2L, "U", "x1", 1L), (3L, "D", "", 0L), (30L, "I", "n", 7L))
    val b2 = Seq((2L, "U", "x2", 2L), (4L, "D", "", 0L), (3L, "I", "back", 3L))
    val b3 = Seq((30L, "D", "", 0L), (5L, "U", "x5", 5L))
    val batches = Seq(b1, b2, b3).map(_.toDF("k", "op", "s", "v"))
    val folded = batches.foldLeft(base: DataFrame) { (snap, ch) =>
      Merge.applyChanges(snap, "k", ch, "op", Seq("s", "v"))
    }.as[(Long, String, Long)].collect().toSet
    // latest change per key across all batches (batch order wins)
    val latest = (b1.map((_, 1)) ++ b2.map((_, 2)) ++ b3.map((_, 3)))
      .groupBy(_._1._1).map { case (_, rows) => rows.maxBy(_._2)._1 }.toSeq
    val compacted = Merge.applyChanges(base, "k",
        latest.toDF("k", "op", "s", "v"), "op", Seq("s", "v"))
      .as[(Long, String, Long)].collect().toSet
    assert(folded == compacted)
    // spot-check semantics: 3 deleted then re-inserted, 30 inserted then deleted
    assert(folded.exists(r => r._1 == 3L && r._2 == "back"))
    assert(!folded.exists(_._1 == 30L))
    assert(folded.exists(r => r._1 == 2L && r._2 == "x2"))
  }
}
