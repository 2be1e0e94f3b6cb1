package graft

import graft.functions.Hll
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HllSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The register formula, straight-line Scala (the oracle the aggregate
    * must match): 60-bit md5 hash, idx = low p bits, rho = trailing-zero
    * rank of the rest. */
  private def refRegisters(values: Seq[String], p: Int): Array[Int] = {
    val m = 1 << p
    val regs = new Array[Int](m)
    values.foreach { v =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(v.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      val h = java.lang.Long.parseLong(hex, 16)
      val idx = (h & (m - 1)).toInt
      val w = h >>> p
      val rho = if (w == 0L) 60 - p + 1 else java.lang.Long.numberOfTrailingZeros(w) + 1
      if (rho > regs(idx)) regs(idx) = rho
    }
    regs
  }

  private def hashed(df: DataFrame, c: String): DataFrame =
    df.withColumn("h", conv(substring(md5(col(c)), 1, 15), 16, 10).cast("long"))

  test("registers match the straight-line reference formula") {
    val vals = (0 until 500).map(i => s"tok_$i")
    val df = hashed(vals.toDF("v"), "v")
    val got = df.agg(Hll.hll_registers($"h", p = 6)).as[Seq[Int]].head()
    assert(got == refRegisters(vals, 6).toSeq)
  }

  test("registers merge by elementwise max (sketch of a union)") {
    val a = (0 until 300).map(i => s"a_$i")
    val b = (150 until 450).map(i => s"a_$i") // overlapping halves
    def regsOf(vs: Seq[String]) =
      hashed(vs.toDF("v"), "v").agg(Hll.hll_registers($"h", 6)).as[Seq[Int]].head()
    val merged = regsOf(a).zip(regsOf(b)).map { case (x, y) => math.max(x, y) }
    assert(merged == regsOf((a ++ b).distinct))
  }

  test("null hashes contribute nothing") {
    val df = Seq[java.lang.Long](1L, null, 2L, null).toDF("h")
    val withNulls = df.agg(Hll.hll_registers($"h", 4)).as[Seq[Int]].head()
    val without = Seq(1L, 2L).toDF("h")
      .agg(Hll.hll_registers($"h", 4)).as[Seq[Int]].head()
    assert(withNulls == without)
  }

  test("estimate is within the theoretical error band") {
    // m = 1024 → standard error 1.04/sqrt(1024) ≈ 3.3%; assert 3σ
    val n = 20000
    val df = hashed(spark.range(n).select(concat(lit("v"), $"id").as("v")), "v")
    val regs = df.agg(Hll.hll_registers($"h", p = 10)).as[Seq[Int]].head()
    val est = Hll.estimate(regs)
    assert(math.abs(est - n) / n < 0.10, s"estimate $est for true $n")
    // duplicates must not move the estimate: same distinct set, 3x the rows
    val dup = hashed(spark.range(3 * n)
      .select(concat(lit("v"), $"id" % n).as("v")), "v")
    val regsDup = dup.agg(Hll.hll_registers($"h", p = 10)).as[Seq[Int]].head()
    assert(regsDup == regs)
  }

  test("small-range linear counting stays accurate") {
    val n = 30
    val df = hashed(spark.range(n).select(concat(lit("s"), $"id").as("v")), "v")
    val regs = df.agg(Hll.hll_registers($"h", p = 10)).as[Seq[Int]].head()
    val est = Hll.estimate(regs)
    assert(math.abs(est - n) / n < 0.10, s"estimate $est for true $n")
  }

  test("grouped sketches partial-aggregate under ObjectHashAggregate") {
    val df = hashed(spark.range(2000).select(
      ($"id" % 4).cast("string").as("g"),
      concat(lit("v"), $"id").as("v")), "v")
    val out = df.groupBy($"g").agg(Hll.hll_registers($"h", 6).as("regs"))
    assert(out.queryExecution.executedPlan.toString.contains("ObjectHashAggregate"))
    val byGroup = out.as[(String, Seq[Int])].collect().toMap
    assert(byGroup.size == 4)
    for (g <- 0 until 4) {
      val expect = refRegisters((0 until 2000).filter(_ % 4 == g).map(i => s"v$i"), 6)
      assert(byGroup(g.toString) == expect.toSeq, s"group $g")
    }
  }
}
