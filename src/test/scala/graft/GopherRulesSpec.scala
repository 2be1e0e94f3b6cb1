package graft

import graft.ops.GopherRules
import org.scalatest.funsuite.AnyFunSuite

class GopherRulesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def flags(text: String) =
    GopherRules.ruleFlags(Seq((1L, text)).toDF("doc_id", "txt"), "doc_id", "txt")
      .collect().head

  test("a normal document passes every rule") {
    val text = ("the and " + "word " * 58).trim // 60 words, mwl 3.9
    val r = flags(text)
    assert(r.getAs[Long]("n_words") == 60L)
    assert(r.getAs[Long]("mwl_x10") == (10L * (3 + 3 + 58 * 4)) / 60)
    assert(r.getAs[Long]("pass") == 1L)
  }

  test("short, symbol-heavy, and non-alpha docs fail their specific rules") {
    val short = flags("the and word")
    assert(short.getAs[Long]("words_ok") == 0L && short.getAs[Long]("pass") == 0L)
    val symbolic = flags(("# " * 50).trim)
    assert(symbolic.getAs[Long]("n_symbols") == 50L)
    assert(symbolic.getAs[Long]("sym_ok") == 0L)
    assert(symbolic.getAs[Long]("alpha_ok") == 0L)
    val numeric = flags(("12 34 " * 30).trim + " the and")
    assert(numeric.getAs[Long]("alpha_ok") == 0L) // 2 alpha of 62 words
    assert(numeric.getAs[Long]("stop_ok") == 1L)
  }

  test("ellipsis runs count via the replace-length trick, non-overlapping") {
    // "...." holds ONE non-overlapping "..." (then a lone dot): 1 + 1 = 2
    val r = flags("a ... b .... c")
    assert(r.getAs[Long]("n_symbols") == 2L)
  }

  test("empty tokens from double spaces never count as words") {
    val r = flags("a  b   c")
    assert(r.getAs[Long]("n_words") == 3L)
    assert(r.getAs[Long]("mwl_x10") == 10L)
  }
}
