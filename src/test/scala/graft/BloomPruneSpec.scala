package graft

import graft.functions.BloomFilter.{bloom_filter_agg, bloom_might_contain}
import graft.ops.BloomPrune
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bloom-filter build/probe kernel + semi-join pruning operator. */
class BloomPruneSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("filter bytes are a pure function of the key set (merge-order invariant)") {
    val keys = (1L to 5000L).filter(_ % 7 == 0)
    def build(parts: Int): Array[Byte] =
      BloomPrune.buildFilter(
        keys.toDF("k").repartition(parts), "k", numBits = 1 << 14, numHashes = 5)
    assert(java.util.Arrays.equals(build(1), build(13)))
    assert(java.util.Arrays.equals(build(3), build(32)))
  }

  test("no false negatives; false positives bounded at sane load") {
    // kernel-level: build and probe with the raw bigint agg/probe pair
    // (BloomPrune.buildFilter additionally hash-normalizes keys, so its
    // filters are only probeable through BloomPrune.probe)
    val keys = (0L until 2000L).map(_ * 3 + 1)
    val filter = keys.toDF("k")
      .select(bloom_filter_agg(col("k"), 1 << 16, 5))
      .collect()(0).getAs[Array[Byte]](0)
    val probes = (0L until 20000L).toDF("k")
      .select(col("k"), bloom_might_contain(lit(filter), col("k")).as("hit"))
      .as[(Long, Boolean)].collect()
    val keySet = keys.toSet
    assert(probes.forall { case (k, hit) => !keySet(k) || hit },
      "a present key must always hit")
    val fps = probes.count { case (k, hit) => hit && !keySet(k) }
    // m/n = 2^16/2000 ≈ 33 bits/key, k=5 → theoretical fpp ≈ 1e-4; allow 100×
    assert(fps < 200, s"false-positive count out of range: $fps")
  }

  test("semiJoin equals the plain semi join on testdata") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val pricey = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .where(col("o_totalprice") > 400000.0)
    val got = BloomPrune.semiJoin(li, "l_orderkey", pricey, "o_orderkey")
      .select("l_orderkey", "l_linenumber")
      .as[(Long, Int)].collect().toSet
    val want = li.join(pricey, li("l_orderkey") === pricey("o_orderkey"), "left_semi")
      .select("l_orderkey", "l_linenumber")
      .as[(Long, Int)].collect().toSet
    assert(want.nonEmpty && got == want)
  }

  test("the Bloom probe sits below the join in the optimized plan") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val pricey = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .where(col("o_totalprice") > 400000.0)
    val plan = BloomPrune.semiJoin(li, "l_orderkey", pricey, "o_orderkey")
      .queryExecution.optimizedPlan
    // the filter containing the probe must appear UNDER the semi join
    // (scan-side pruning), not above it
    val joins = plan.collect { case j: Join => j }
    assert(joins.nonEmpty)
    val underJoin = joins.head.left.collect {
      case f: Filter if f.condition.toString.toLowerCase.contains("bloommightcontain") => f
    }
    assert(underJoin.nonEmpty,
      s"expected bloom probe below the join; plan:\n$plan")
  }

  test("probe prunes most non-matching rows before the join") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val pricey = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .where(col("o_totalprice") > 400000.0)
    val filter = BloomPrune.buildFilter(pricey, "o_orderkey")
    val total = li.count()
    val kept = BloomPrune.probe(li, "l_orderkey", filter).count()
    val trueMatches = li.join(
      pricey, li("l_orderkey") === pricey("o_orderkey"), "left_semi").count()
    assert(kept >= trueMatches, "no false negatives")
    // with 2^23 bits over a few hundred keys the fp rate is ~0: the probe
    // should keep barely more than the true matches, far below the scan
    assert(kept < trueMatches + total / 100,
      s"pruning too weak: kept=$kept matches=$trueMatches total=$total")
  }

  test("string keys survive the probe (ADVICE r5: cast-to-long dropped them)") {
    val small = Seq("alpha", "gamma").toDF("k")
    val big = Seq("alpha", "beta", "gamma", "delta").toDF("k")
    val got = BloomPrune.semiJoin(big, "k", small, "k",
      numBits = 1 << 12, numHashes = 3).as[String].collect().toSet
    assert(got == Set("alpha", "gamma"))
  }

  test("int big side matches bigint small side (integral family normalizes)") {
    val small = Seq(3L, 5L).toDF("k")
    val big = Seq(1, 2, 3, 4, 5).toDF("k")
    val got = BloomPrune.semiJoin(big, "k", small, "k",
      numBits = 1 << 12, numHashes = 3).as[Int].collect().toSet
    assert(got == Set(3, 5))
  }

  test("mismatched non-integral key types are rejected loudly") {
    val small = Seq("1").toDF("k")
    val big = Seq(1L).toDF("k")
    val e = intercept[IllegalArgumentException] {
      BloomPrune.semiJoin(big, "k", small, "k")
    }
    assert(e.getMessage.contains("hash identically"))
  }

  test("aggregate rejects non-bigint keys loudly") {
    val e = intercept[Exception] {
      Seq("a", "b").toDF("k")
        .select(bloom_filter_agg(col("k"), 1 << 10, 3)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("bigint"))
  }
}
