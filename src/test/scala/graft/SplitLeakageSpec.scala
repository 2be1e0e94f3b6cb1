package graft

import org.scalatest.funsuite.AnyFunSuite

class SplitLeakageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** JVM mirror of the md5-lane split (hex_to_long of the first 15 hex
    * chars, permille threshold). */
  private def splitRef(id: Long, salt: String, testPermille: Int): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest((salt + id.toString).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    if (java.lang.Long.parseLong(hex.take(15), 16) % 1000 < testPermille)
      "test" else "train"
  }

  test("split assignment matches the JVM md5 reference") {
    val ids = (1L to 200L).toDF("id")
    val got = ids.select(org.apache.spark.sql.functions.col("id"),
        graft.ops.SplitLeakage.splitOf(
          org.apache.spark.sql.functions.col("id"), "split", 200).as("s"))
      .as[(Long, String)].collect().toMap
    (1L to 200L).foreach { i =>
      assert(got(i) == splitRef(i, "split", 200), s"id $i")
    }
    // 20% target: the md5 lane is uniform, so the test share lands near
    // 200 permille on 200 ids (loose band — determinism is the contract)
    val nTest = got.values.count(_ == "test")
    assert(nTest > 15 && nTest < 90)
  }

  test("cross-split pairs are counted per combo with leak flags") {
    // force known splits by picking ids whose md5 lanes we just verified;
    // build pairs across every combo
    val ids = (1L to 60L)
    val bySplit = ids.groupBy(i => splitRef(i, "split", 200))
    val tr = bySplit("train").toSeq.sorted
    val te = bySplit("test").toSeq.sorted
    assert(tr.size >= 2 && te.size >= 2, "need both splits populated")
    val pairs = Seq(
      (tr(0), tr(1)), // train-train
      (te(0), te(1)), // test-test
      (tr(0), te(0)), (te(1), tr(1))) // two leaks either orientation
      .toDF("id_a", "id_b")
    val got = graft.ops.SplitLeakage.crossSplitPairs(pairs, "id_a", "id_b")
      .as[(String, String, Long, Boolean)].collect().toSet
    assert(got == Set(
      ("train", "train", 1L, false),
      ("test", "test", 1L, false),
      ("test", "train", 2L, true)))
  }
}
