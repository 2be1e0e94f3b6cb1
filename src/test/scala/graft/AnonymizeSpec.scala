package graft

import graft.ops.Anonymize
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pseudonymization keeps referential integrity; masking scrubs patterns. */
class AnonymizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pseudonyms are deterministic, salt-dependent, and type-canonical") {
    val df = Seq((1L, "1"), (2L, "2")).toDF("k_long", "k_str")
    val row = df.select(
      Anonymize.pseudonym(col("k_long"), "s").as("a"),
      Anonymize.pseudonym(col("k_str"), "s").as("b"),
      Anonymize.pseudonym(col("k_long"), "t").as("c")).collect()(0)
    assert(row.getString(0) == row.getString(1), "long 1 and string \"1\" agree")
    assert(row.getString(0) != row.getString(2), "different salt, different surrogate")
  }

  test("joins survive per-table pseudonymization") {
    val cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    val ords = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val before = cust.join(ords, cust("c_custkey") === ords("o_custkey")).count()
    val pc = Anonymize.pseudonymizeKeys(cust, Seq("c_custkey"), "s4lt")
    val po = Anonymize.pseudonymizeKeys(ords, Seq("o_custkey"), "s4lt")
    val after = pc.join(po, pc("c_custkey") === po("o_custkey")).count()
    assert(before > 0 && after == before)
    // and the surrogate column no longer exposes the raw key
    assert(pc.schema("c_custkey").dataType.typeName == "string")
    assert(!pc.select("c_custkey").as[String].head().forall(_.isDigit))
  }

  test("maskNumbers scrubs every digit run") {
    val out = Seq("Customer#000000042", "a1b22c333", "nodigits")
      .toDF("t").select(Anonymize.maskNumbers(col("t")).as("m"))
      .as[String].collect()
    assert(out(0) == "Customer#<ID>")
    assert(out(1) == "a<ID>b<ID>c<ID>")
    assert(out(2) == "nodigits")
  }
}
