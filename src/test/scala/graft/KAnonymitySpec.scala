package graft

import graft.ops.{Features, KAnonymity}
import org.scalatest.funsuite.AnyFunSuite

class KAnonymitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("class sizes and risk flags; summary counts rows, not classes") {
    val df = Seq(
      ("US", "A"), ("US", "A"), ("US", "A"),
      ("US", "B"),
      ("DE", "A"), ("DE", "A")).toDF("country", "seg")
    val sizes = KAnonymity.classSizes(df, Seq("country", "seg"), k = 3)
      .as[(String, String, Long, Long)].collect().toSet
    assert(sizes == Set(("US", "A", 3L, 0L), ("US", "B", 1L, 1L),
      ("DE", "A", 2L, 1L)))
    val sum = KAnonymity.riskSummary(df, Seq("country", "seg"), k = 3)
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(sum == ((3L, 2L, 3L, 1L, 3L))) // 1 + 2 rows at risk
  }

  test("length-bucketed batches: in-bucket positions ordered by (len, id)") {
    val df = Seq((1L, 10L), (2L, 12L), (3L, 11L), (4L, 70L), (5L, 65L),
      (6L, 12L)).toDF("id", "len")
    val got = Features.lengthBucketedBatches(df, "id", "len",
        bucketWidth = 64, batchSize = 2)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._3, r._4, r._5))).toMap
    // bucket 0 order: (10,1) (11,3) (12,2) (12,6) → batches [1,3] [2,6]
    assert(got(1L) == ((0L, 0L, 0L)))
    assert(got(3L) == ((0L, 0L, 1L)))
    assert(got(2L) == ((0L, 1L, 0L)))
    assert(got(6L) == ((0L, 1L, 1L)))
    // bucket 1 order: (65,5) (70,4)
    assert(got(5L) == ((1L, 0L, 0L)))
    assert(got(4L) == ((1L, 0L, 1L)))
  }

  test("bucketed batching is partition-invariant") {
    val rows = (1L to 100L).map(i => (i, (i * 7) % 40 + 5))
    val a = Features.lengthBucketedBatches(rows.toDF("id", "len"), "id", "len",
        bucketWidth = 8, batchSize = 4)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val b = Features.lengthBucketedBatches(
        rows.toDF("id", "len").repartition(13), "id", "len",
        bucketWidth = 8, batchSize = 4)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(a == b)
  }

  test("l-diversity flags homogeneous classes that k-anonymity passes") {
    // class A: 4 rows but ALL share sensitive 'x' -> big yet homogeneous;
    // class B: 3 rows over 3 distinct values -> diverse
    val df = Seq(
      ("A", "x"), ("A", "x"), ("A", "x"), ("A", "x"),
      ("B", "x"), ("B", "y"), ("B", "z"))
      .toDF("qi", "sens")
    val out = graft.ops.KAnonymity.lDiversity(df, Seq("qi"), "sens", l = 3L)
      .orderBy("qi").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(out.toSeq == Seq(
      ("A", 4L, 1L, 4L, false),
      ("B", 3L, 3L, 1L, true)))
  }
}
