package graft

import graft.streaming.IdempotentSink
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

class IdempotentSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("idsink").toString

  test("a replayed batch id writes once; distinct ids accumulate") {
    val base = freshDir()
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    assert(IdempotentSink.writeOnce(b0, base, 0L))
    assert(!IdempotentSink.writeOnce(b0, base, 0L)) // replay: skipped
    assert(IdempotentSink.writeOnce(Seq((3L, "c")).toDF("k", "v"), base, 1L))
    val got = IdempotentSink.readCommitted(spark, base).get
      .as[(Long, String, Long)].collect().toSet
    assert(got == Set((1L, "a", 0L), (2L, "b", 0L), (3L, "c", 1L)))
  }

  test("a crashed attempt (no _SUCCESS) is overwritten, not skipped") {
    val base = freshDir()
    assert(IdempotentSink.writeOnce(Seq((1L, "a")).toDF("k", "v"), base, 0L))
    // simulate a crash mid-attempt on batch 1: dir exists, no _SUCCESS
    val dir = new Path(s"$base/batch_id=1")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(dir)
    // readers never see the partial attempt
    val before = IdempotentSink.readCommitted(spark, base).get
      .select("batch_id").as[Long].collect().toSet
    assert(before == Set(0L))
    // the replay completes the batch
    assert(IdempotentSink.writeOnce(Seq((9L, "z")).toDF("k", "v"), base, 1L))
    val after = IdempotentSink.readCommitted(spark, base).get
      .as[(Long, String, Long)].collect().toSet
    assert(after == Set((1L, "a", 0L), (9L, "z", 1L)))
  }

  test("missing or empty base yields None") {
    assert(IdempotentSink.readCommitted(spark, freshDir() + "/nope").isEmpty)
    val base = freshDir()
    assert(IdempotentSink.readCommitted(spark, base).isEmpty)
  }
}
