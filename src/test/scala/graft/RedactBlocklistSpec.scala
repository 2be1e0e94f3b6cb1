package graft

import graft.ops.{Blocklist, Redact}
import org.scalatest.funsuite.AnyFunSuite

class RedactBlocklistSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val pii = Seq(
    Redact.Pattern("email",
      "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}", "<EMAIL>"),
    Redact.Pattern("phone", "[0-9]{3}-[0-9]{4}", "<PHONE>"))

  test("scrub redacts every occurrence and counts per pattern") {
    val df = Seq(
      (1L, "contact bob@example.com or 555-1234 or eve@test.org"),
      (2L, "no pii here at all")).toDF("doc_id", "text")
    val got = Redact.scrub(df, "doc_id", "text", pii)
      .as[(Long, Long, Long, String)].collect().toMap2
    assert(got(1L) == (2L, 1L,
      "contact <EMAIL> or <PHONE> or <EMAIL>"))
    assert(got(2L) == (0L, 0L, "no pii here at all"))
  }

  test("patterns apply in order: a later pattern sees the earlier rewrite") {
    val df = Seq((1L, "555 dogs")).toDF("doc_id", "text")
    val got = Redact.scrub(df, "doc_id", "text", Seq(
        Redact.Pattern("num", "[0-9]+", "<NUM>"),
        Redact.Pattern("five", "555", "X")))
      .as[(Long, Long, Long, String)].collect().head
    // "555" was already rewritten by the broader first pattern
    assert(got == ((1L, 1L, 0L, "<NUM> dogs")))
  }

  test("null text stays null with null counts (a null is not a document)") {
    val df = Seq((1L, Option.empty[String]), (2L, Some("a@b.io")))
      .toDF("doc_id", "text")
    val got = Redact.scrub(df, "doc_id", "text", pii)
      .as[(Long, Option[Long], Option[Long], Option[String])]
      .collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got(1L) == ((None, None, None)))
    assert(got(2L) == ((Some(1L), Some(0L), Some("<EMAIL>"))))
  }

  test("pattern-name guards are loud") {
    val df = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Redact.scrub(df, "doc_id", "text",
        Seq(Redact.Pattern("a", "x", "y"), Redact.Pattern("a", "z", "w")))
    }
    intercept[IllegalArgumentException] {
      Redact.scrub(df, "doc_id", "text",
        Seq(Redact.Pattern("Bad Name", "x", "y")))
    }
  }

  implicit private class Map2[A](rows: Array[(Long, A, A, String)]) {
    def toMap2: Map[Long, (A, A, String)] =
      rows.map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }

  test("phrase matches are token-aligned, never substrings") {
    val df = Seq(
      (1L, "the quick brown fox"),
      (2L, "brownish quickfox jumps")).toDF("doc_id", "text")
    val got = Blocklist.phraseMatches(df, "doc_id", "text",
        Seq("quick brown", "brown"))
      .as[(Long, String, Long, Long)].collect().toSet
    // doc 2's "brownish"/"quickfox" must NOT match
    assert(got == Set(
      (1L, "quick brown", 1L, 1L),
      (1L, "brown", 1L, 2L)))
  }

  test("overlapping phrase occurrences all count") {
    val df = Seq((1L, "go go go")).toDF("doc_id", "text")
    val got = Blocklist.phraseMatches(df, "doc_id", "text", Seq("go go"))
      .as[(Long, String, Long, Long)].collect().toSet
    assert(got == Set((1L, "go go", 2L, 0L)))
  }

  test("mixed phrase lengths resolve from one shared lead set") {
    val df = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "beta gamma delta alpha")).toDF("doc_id", "text")
    val got = Blocklist.phraseMatches(df, "doc_id", "text",
        Seq("alpha", "beta gamma delta", "gamma delta"))
      .as[(Long, String, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, "alpha", 1L, 0L),
      (1L, "beta gamma delta", 1L, 1L),
      (1L, "gamma delta", 1L, 2L),
      (2L, "alpha", 1L, 3L),
      (2L, "beta gamma delta", 1L, 0L),
      (2L, "gamma delta", 1L, 1L)))
  }

  test("blocklist guards: empty, duplicate, overlong phrases are loud") {
    val df = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Blocklist.phraseMatches(df, "doc_id", "text", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Blocklist.phraseMatches(df, "doc_id", "text", Seq("a", "a"))
    }
    intercept[IllegalArgumentException] {
      Blocklist.phraseMatches(df, "doc_id", "text",
        Seq(Seq.fill(17)("w").mkString(" ")))
    }
  }
}
