package graft

import graft.streaming.StreamBloomDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamBloomDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(batches: Seq[Seq[(Long, String)]], bits: Int = 1 << 16)
      : Map[Long, Boolean] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val name = s"sbloom_${System.nanoTime()}"
    val q = StreamBloomDedup.dedupFlags(
        input.toDS().toDF("doc_id", "text"), "doc_id", "text",
        nShards = 8, bitsPerShard = bits, k = 4)
      .writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    batches.foreach { b => input.addData(b); q.processAllAvailable() }
    q.stop()
    spark.table(name).as[(Long, Boolean)].collect().toMap
  }

  test("no false negatives: every repeat of seen content is flagged") {
    val texts = (1 to 50).map(i => s"document body number $i with words")
    val first = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    // repeats arrive across later batches AND within one batch
    val second = texts.zipWithIndex.map { case (t, i) => (1000L + i, t) }
    val third = Seq((2000L, texts.head), (2001L, texts.head))
    val got = run(Seq(first, second ++ third))
    second.foreach { case (id, _) =>
      assert(got(id), s"repeat $id must be flagged (one-sided guarantee)")
    }
    assert(got(2000L) && got(2001L))
  }

  test("false positives stay bounded at sized occupancy") {
    // 1000 distinct docs into 8 shards x 65536 bits with k=4:
    // occupancy ~0.8%, expected FP rate well under 5%
    val docs = (1 to 1000).map(i => (i.toLong, s"unique text $i ${i * 31}"))
    val got = run(Seq(docs))
    val fp = got.count(_._2)
    assert(fp < 50, s"expected <5% false positives on fresh content, got $fp")
  }

  test("the filter never forgets across many batches") {
    val early = Seq((1L, "the earliest document of all"))
    val fillers = (1 to 5).map(b =>
      (1 to 100).map(i => ((b * 1000 + i).toLong, s"filler $b $i")))
    val late = Seq((99999L, "the earliest document of all"))
    val got = run(early +: fillers :+ late)
    assert(got(99999L), "a duplicate 5 batches later must still be flagged")
    assert(!got(1L), "the first copy is never flagged")
  }
}
