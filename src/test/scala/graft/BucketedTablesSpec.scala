package graft

import graft.sources.BucketedTables
import org.scalatest.funsuite.AnyFunSuite

/** Proves the co-located-join property: same-bucketed join sides plan with
  * zero shuffle exchanges, vs two for the plain-parquet join.
  */
class BucketedTablesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bucketed join eliminates both shuffle exchanges") {
    // AQE can also skip exchanges for tiny inputs; disable broadcast (both
    // the static and the AQE-replan thresholds) to force the shuffle-join
    // path so the assertion is about bucketing
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      val or = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")

      val plain = li.join(or, li("l_orderkey") === or("o_orderkey"))
      assert(BucketedTables.shuffleExchangeCount(plain) >= 2)

      BucketedTables.writeBucketed(li, "li_bkt", "l_orderkey", 8, Some("l_orderkey"))
      BucketedTables.writeBucketed(
        or.withColumnRenamed("o_orderkey", "l_orderkey"), "or_bkt", "l_orderkey", 8)
      val bucketed = BucketedTables.bucketedJoin(spark, "li_bkt", "or_bkt", "l_orderkey")
      assert(BucketedTables.shuffleExchangeCount(bucketed) == 0)
      assert(bucketed.count() > 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_bkt")
      spark.sql("DROP TABLE IF EXISTS or_bkt")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }
}
