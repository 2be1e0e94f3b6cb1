package graft

import graft.ops.Merge
import org.scalatest.funsuite.AnyFunSuite

class MergeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("merge applies upsert, delete, and insert in one pass") {
    val base = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("k", "s", "v")
    val changes = Seq(
      (2L, "U", "b2", 99L),  // update
      (3L, "D", "c", 30L),   // delete
      (9L, "I", "new", 1L),  // insert
      (7L, "U", "up", 5L))   // update on missing key -> insert
      .toDF("k", "op", "s", "v")
    val got = Merge.applyChanges(base, "k", changes, "op", Seq("s", "v"))
      .as[(Long, String, Long)].collect().toSet
    assert(got == Set((1L, "a", 10L), (2L, "b2", 99L),
      (9L, "new", 1L), (7L, "up", 5L)))
  }

  test("an empty change batch is the identity") {
    val base = Seq((1L, "a", 10L)).toDF("k", "s", "v")
    val none = Seq.empty[(Long, String, String, Long)]
      .toDF("k", "op", "s", "v")
    val got = Merge.applyChanges(base, "k", none, "op", Seq("s", "v"))
      .as[(Long, String, Long)].collect().toSet
    assert(got == Set((1L, "a", 10L)))
  }

  test("deleting a missing key is a no-op, not an error") {
    val base = Seq((1L, "a", 10L)).toDF("k", "s", "v")
    val del = Seq((5L, "D", "x", 0L)).toDF("k", "op", "s", "v")
    val got = Merge.applyChanges(base, "k", del, "op", Seq("s", "v"))
      .as[(Long, String, Long)].collect().toSet
    assert(got == Set((1L, "a", 10L)))
  }

  test("a change batch with two rows for one key fails loudly, not fans out") {
    val base = Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "s", "v")
    val dupes = Seq((1L, "U", "a1", 11L), (1L, "U", "a2", 12L))
      .toDF("k", "op", "s", "v")
    val ex = intercept[Exception] {
      Merge.applyChanges(base, "k", dupes, "op", Seq("s", "v")).collect()
    }
    def messages(t: Throwable): List[String] =
      Option(t).toList.flatMap(e =>
        Option(e.getMessage).toList ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("multiple rows for key")))
    // guard off: documented caller-enforces-uniqueness mode, join fans out
    val fanned = Merge.applyChanges(base, "k", dupes, "op", Seq("s", "v"),
      enforceUniqueChanges = false).collect()
    assert(fanned.length == 3) // 2 dup rows for k=1 + untouched k=2
  }
}
