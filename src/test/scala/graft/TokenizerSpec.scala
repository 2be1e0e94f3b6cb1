package graft

import graft.ops.Tokenizer
import org.scalatest.funsuite.AnyFunSuite

class TokenizerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val vs = Tokenizer.defaultVocab.toSet
  private val mx = Tokenizer.defaultVocab.map(_.length).max

  test("greedy longest-match picks the longest prefix, not the first") {
    assert(Tokenizer.tokenizeWord("the", vs, mx) == Seq("the"))
    assert(Tokenizer.tokenizeWord("batch", vs, mx) == Seq("bat", "ch"))
    assert(Tokenizer.tokenizeWord("table", vs, mx) == Seq("tab", "le"))
    assert(Tokenizer.tokenizeWord("spark", vs, mx) == Seq("sp", "ark"))
    assert(Tokenizer.tokenizeWord("sort", vs, mx) == Seq("sor", "t"))
  }

  test("unknown characters emit ? and advance one char") {
    // q, x, z are deliberately not in the vocab (not even as singles)
    assert(Tokenizer.tokenizeWord("xyz", vs, mx) == Seq("?", "y", "?"))
    assert(Tokenizer.tokenizeWord("", vs, mx) == Seq.empty)
  }

  test("greedy is a left-to-right maximal munch (no backtracking)") {
    // "windo" : "wind" consumes 4 chars even though "w"+"i"+"ndo..." would
    // also tokenize; remaining "o" is a single
    assert(Tokenizer.tokenizeWord("windo", vs, mx) == Seq("wind", "o"))
  }

  test("tokenStats: counts, unk, and 8-token head per document") {
    val docs = Seq(
      (1L, "the batch table"),
      (2L, "xq"),
      (3L, ""),
      (4L, "a a a a a a a a a a")) // 10 words of 1 token each
      .toDF("doc_id", "text")
    val rows = Tokenizer.tokenStats(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq == Seq(
      (1L, 5L, 0L, "the bat ch tab le"),
      (2L, 2L, 2L, "? ?"),
      (3L, 0L, 0L, ""),
      (4L, 10L, 0L, "a a a a a a a a")))
  }

  test("tokenFrequencies: multiplicity-weighted corpus counts") {
    val docs = Seq((1L, "the the batch"), (2L, "batch")).toDF("doc_id", "text")
    val freqs = Tokenizer.tokenFrequencies(docs, "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(freqs == Map("the" -> 2L, "bat" -> 2L, "ch" -> 2L))
  }

  test("pipeline ≡ local kernel on the real corpus words") {
    val docs = Tables("documents")
    val words = Tokenizer.explodeWords(docs, "doc_id", "text")
    val fromPipeline = Tokenizer.tokenizeDistinctWords(words)
      .collect().map(r => (r.getString(0), r.getSeq[String](1).toList)).toMap
    fromPipeline.foreach { case (w, toks) =>
      assert(toks == Tokenizer.tokenizeWord(w, vs, mx).toList, s"word $w")
    }
    assert(fromPipeline.nonEmpty)
  }

  private def Tables(name: String) =
    spark.read.parquet(s"/root/testdata/sf0.001/$name.parquet")
}
