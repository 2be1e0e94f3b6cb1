package graft

import graft.ops.BpeTrain
import org.scalatest.funsuite.AnyFunSuite

class BpeTrainSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(words: Seq[(String, Long)], rounds: Int) = {
    val (m, r) = BpeTrain.train(words.toDF("w", "n_w"), rounds)
    (m.orderBy("round").collect().map(x =>
       (x.getInt(0), x.getString(1), x.getString(2), x.getLong(3))).toSeq,
     r.orderBy("w", "pos").collect().map(x =>
       (x.getString(0), x.getInt(1), x.getString(2))).toSeq)
  }

  test("weighted pair counts drive merge order; ties break lexicographically") {
    // "aaab"×2: pairs (a,a)=2·2=4, (a,b)=1·2=2; "ab"×3: (a,b)=3 → (a,b)=5 wins r1.
    // r2: "a a ab": (a,a)=2, (a,ab)=2 — tie → (a,a) (left/right asc).
    // r3: "aa ab": (aa,ab)=2 → merges to the full word.
    val (merges, segs) = run(Seq(("aaab", 2L), ("ab", 3L)), rounds = 3)
    assert(merges == Seq(
      (1, "a", "b", 5L), (2, "a", "a", 2L), (3, "aa", "ab", 2L)))
    assert(segs == Seq(("aaab", 1, "aaab"), ("ab", 1, "ab")))
  }

  test("overlap chains merge greedy leftmost: aaaa → (aa)(aa), not a(aa)a") {
    val (merges, segs) = run(Seq(("aaaa", 1L)), rounds = 2)
    assert(merges == Seq((1, "a", "a", 3L), (2, "aa", "aa", 1L)))
    // after r1 the segmentation must have been [aa, aa] (positions 1 and 3)
    assert(segs == Seq(("aaaa", 1, "aaaa")))
    val (_, segs1) = run(Seq(("aaaa", 1L)), rounds = 1)
    assert(segs1 == Seq(("aaaa", 1, "aa"), ("aaaa", 3, "aa")))
  }

  test("odd-length chain: aaaaa → aa aa a after one (a,a) merge") {
    val (_, segs) = run(Seq(("aaaaa", 1L)), rounds = 1)
    assert(segs == Seq(("aaaaa", 1, "aa"), ("aaaaa", 3, "aa"), ("aaaaa", 5, "a")))
  }

  test("training stops quietly when no pairs remain") {
    // single-char words have no adjacent pairs at all
    val (merges, segs) = run(Seq(("a", 5L), ("b", 2L)), rounds = 4)
    assert(merges.isEmpty)
    assert(segs == Seq(("a", 1, "a"), ("b", 1, "b")))
  }

  test("encode replays learned merges: training corpus round-trips exactly") {
    val words = Seq(("aaab", 2L), ("ab", 3L), ("baba", 1L)).toDF("w", "n_w")
    val (m, trained) = BpeTrain.train(words, rounds = 3)
    val merges = m.orderBy("round").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val encoded = BpeTrain.encode(words, merges)
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("w", "pos").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSeq
    assert(norm(encoded) == norm(trained))
    // and encoding UNSEEN words applies the same merges deterministically
    val novel = BpeTrain.encode(Seq(("aabb", 1L)).toDF("w", "n_w"), merges)
    assert(norm(novel).map(_._3).mkString("") == "aabb")
  }

  test("real corpus: merges are nonempty and segments reconstruct the words") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val (m, r) = BpeTrain.train(BpeTrain.corpusWords(docs, "text"), rounds = 3)
    assert(m.count() == 3)
    // concatenating each word's symbols in pos order must give the word back
    val rebuilt = r.orderBy("w", "pos").collect()
      .groupBy(_.getString(0))
      .map { case (w, rows) => (w, rows.sortBy(_.getInt(1)).map(_.getString(2)).mkString) }
    rebuilt.foreach { case (w, joined) => assert(w == joined, s"word $w") }
  }
}
