package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Standalone minhash stage-timing harness (dev tool). */
object MhBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    docs.count()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(s"[mh] $label: ${(System.nanoTime() - t0) / 1e9}s"); r
    }
    val sh = time("shingles+distinct+persist") {
      val s = graft.ops.Dedup.shingles(docs, "doc_id", "text", 3)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      s.count(); s
    }
    val sig = time("signatures") {
      val s = graft.ops.Dedup.minHashSignatures(docs, "doc_id", "text", 3, 64)
      s.count(); s
    }
    time("full minHashLshPairs") {
      graft.ops.Dedup.minHashLshPairs(docs, "doc_id", "text", 3, 64, 16, 0.5).count()
    }
    spark.stop()
  }
}
