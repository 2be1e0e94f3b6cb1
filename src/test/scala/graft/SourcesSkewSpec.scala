package graft

import graft.ops.SkewJoin
import graft.sources.Readers
import org.scalatest.funsuite.AnyFunSuite

class SourcesSkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("csv and json round-trip with explicit schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft-io").toString
    val df = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    Readers.writeCsv(df, s"$dir/nation_csv")
    Readers.writeJsonLines(df, s"$dir/nation_json")
    val backCsv = Readers.csv(spark, s"$dir/nation_csv", df.schema)
    val backJson = Readers.jsonLines(spark, s"$dir/nation_json", df.schema)
    val orig = df.collect().map(_.toString).toSet
    assert(backCsv.collect().map(_.toString).toSet == orig)
    assert(backJson.collect().map(_.toString).toSet == orig)
    assert(backCsv.schema == df.schema)
  }

  test("partitioned parquet sink enables partition pruning") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    Readers.writePartitionedParquet(docs, s"$dir/docs", Seq("lang"))
    val pruned = spark.read.parquet(s"$dir/docs").where($"lang" === "en")
    // the scan's file index must only touch the lang=en partition
    val scanned = pruned.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    assert(pruned.count() == docs.where($"lang" === "en").count())
    assert(scanned.contains("PartitionFilters") &&
      scanned.contains("lang"))
  }

  test("orc round-trip with explicit schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toString
    val df = spark.read.parquet("/root/testdata/sf0.001/region.parquet")
    Readers.writeOrc(df, s"$dir/region_orc")
    val back = Readers.orc(spark, s"$dir/region_orc", df.schema)
    assert(back.collect().map(_.toString).toSet == df.collect().map(_.toString).toSet)
  }

  test("salted join spreads a hot key made of identical rows") {
    import graft.ops.SkewJoin
    // 200 IDENTICAL rows under one key: row-content hashing would give them
    // all the same salt; the position-mixed salt must spread them
    val left = Seq.fill(200)((1L, "same")).toDF("k", "payload")
    val right = Seq((1L, "dim")).toDF("k", "name")
    val out = SkewJoin.saltedJoin(left, right, "k", salts = 8)
    assert(out.count() == 200)
    // count distinct salts actually used by re-deriving: join output has no
    // salt column, so instead assert on the internal salting expression
    val salted = left.withColumn("__salt",
      org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.xxhash64(
          org.apache.spark.sql.functions.struct(left.columns.map(org.apache.spark.sql.functions.col): _*),
          org.apache.spark.sql.functions.spark_partition_id(),
          org.apache.spark.sql.functions.monotonically_increasing_id()),
        org.apache.spark.sql.functions.lit(8)))
    val distinctSalts = salted.select("__salt").distinct().count()
    assert(distinctSalts > 1, s"hot key not spread: $distinctSalts salt(s)")
  }

  test("salted join returns exactly the rows of the plain join") {
    // skewed left side: one hot key
    val left = (1 to 500).map(i => (if (i % 10 == 0) 1L else i.toLong, s"p$i"))
      .toDF("k", "payload")
    val right = Seq((1L, "hot"), (2L, "x"), (30L, "y")).toDF("k", "name")
    val plain = left.join(right, "k").collect().map(_.toString).sorted
    val salted = SkewJoin.saltedJoin(left, right, "k", salts = 8)
      .select("k", "payload", "name")
      .collect().map(_.toString).sorted
    assert(salted.toSeq == plain.toSeq)
    assert(salted.nonEmpty)
  }
}
