package graft

import graft.ops.Chunker
import org.scalatest.funsuite.AnyFunSuite

class ChunkerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def doc(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")

  test("chunks tile the document with the requested overlap") {
    val df = Seq((1L, doc(10))).toDF("doc_id", "text")
    val out = Chunker.chunkByTokens(df, "doc_id", "text",
        chunkTokens = 4, overlapTokens = 1)
      .as[(Long, Int, Int, String)].collect().sortBy(_._2)
    // stride 3: windows [1..4], [4..7], [7..10] — exact cover, tail full
    assert(out.map(_._4).toSeq == Seq(
      "w1 w2 w3 w4", "w4 w5 w6 w7", "w7 w8 w9 w10"))
    assert(out.map(_._3).forall(_ == 4))
  }

  test("short tail chunk is kept; short docs yield exactly one chunk") {
    val df = Seq((1L, doc(9)), (2L, doc(2)), (3L, "solo")).toDF("doc_id", "text")
    val out = Chunker.chunkByTokens(df, "doc_id", "text", 4, 1)
      .as[(Long, Int, Int, String)].collect()
    val byDoc = out.groupBy(_._1)
    // doc 1: stride 3 → chunks at 1, 4, 7 with the last being w7 w8 w9
    assert(byDoc(1L).sortBy(_._2).map(_._4).last == "w7 w8 w9")
    assert(byDoc(2L).toSeq == Seq((2L, 0, 2, "w1 w2")))
    assert(byDoc(3L).toSeq == Seq((3L, 0, 1, "solo")))
  }

  test("every token position is covered by at least one chunk") {
    val df = Seq((1L, doc(100))).toDF("doc_id", "text")
    for ((c, o) <- Seq((8, 0), (8, 3), (16, 15))) {
      val chunks = Chunker.chunkByTokens(df, "doc_id", "text", c, o)
        .as[(Long, Int, Int, String)].collect()
      val covered = chunks.flatMap(_._4.split(" ")).toSet
      assert(covered == (1 to 100).map(i => s"w$i").toSet, s"chunk=$c overlap=$o")
    }
  }

  test("contiguous packing fills bins to capacity with bounded overflow") {
    val chunks = Seq.tabulate(20)(i => ("k", i, 30 + (i % 5) * 10)) // 30..70 tokens
      .toDF("k", "idx", "n_tok")
    val packed = Chunker.packContiguous(chunks, "n_tok", capacity = 100,
        keyCols = Seq("k"), orderCols = Seq("idx"))
      .as[(String, Int, Int, Long)].collect()
    val byBin = packed.groupBy(_._4).view.mapValues(_.map(_._3).sum).toMap
    val total = packed.map(_._3).sum
    assert(byBin.keySet == (0L until (total / 100 + 1)).toSet.filter(b => b * 100 < total))
    // every bin except possibly the last holds >= capacity - max_chunk + 1
    // and <= capacity + max_chunk - 1 tokens
    val lastBin = byBin.keys.max
    byBin.foreach { case (b, tokens) =>
      if (b != lastBin) assert(tokens >= 100 - 70 + 1 && tokens <= 100 + 70 - 1,
        s"bin $b has $tokens")
    }
    // bins are contiguous in the order: idx sequences within a bin are runs
    packed.groupBy(_._4).foreach { case (_, rows) =>
      val idxs = rows.map(_._2).sorted
      assert(idxs.zip(idxs.tail).forall { case (a, b) => b == a + 1 })
    }
  }

  test("packing is per key partition") {
    val chunks = Seq(("a", 0, 60), ("a", 1, 60), ("a", 2, 60),
      ("b", 0, 60), ("b", 1, 60)).toDF("k", "idx", "n_tok")
    val packed = Chunker.packContiguous(chunks, "n_tok", 100,
        Seq("k"), Seq("idx"))
      .as[(String, Int, Int, Long)].collect().toSet
    // a chunk joins the bin its FIRST token lands in: offsets 0/60/120 →
    // bins 0/0/1; each key's running sum starts over at bin 0
    assert(packed == Set(("a", 0, 60, 0L), ("a", 1, 60, 0L), ("a", 2, 60, 1L),
      ("b", 0, 60, 0L), ("b", 1, 60, 0L)))
  }
}
