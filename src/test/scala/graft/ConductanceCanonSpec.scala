package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ConductanceCanonSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def phi(edges: Seq[(String, String)],
      labels: Seq[(String, String)]) =
    graft.ops.GraphStats.conductance(edges.toDF("src", "dst"), "src", "dst",
        labels.toDF("node", "community"))
      .orderBy("community")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))

  test("two triangles over a bridge: hand-computed conductance") {
    val triA = Seq(("a1", "a2"), ("a2", "a3"), ("a1", "a3"))
    val triB = Seq(("b1", "b2"), ("b2", "b3"), ("b1", "b3"))
    val edges = triA ++ triB :+ (("a1", "b1"))
    val labels = Seq("a1", "a2", "a3").map(_ -> "A") ++
      Seq("b1", "b2", "b3").map(_ -> "B")
    val rows = phi(edges, labels)
    // each side: vol = 2*3 internal + 1 bridge end = 7, cut = 1,
    // two_m = 14, phi = 1000*1 // min(7, 7) = 142
    assert(rows.toSeq == Seq(("A", 3L, 7L, 1L, 142L),
      ("B", 3L, 7L, 1L, 142L)))
  }

  test("a single community covering the whole graph reports 0") {
    val rows = phi(Seq(("x", "y"), ("y", "z")),
      Seq("x" -> "C", "y" -> "C", "z" -> "C"))
    assert(rows.toSeq == Seq(("C", 3L, 4L, 0L, 0L)))
  }

  test("edges touching unlabeled nodes are excluded (inner-join)") {
    val rows = phi(Seq(("x", "y"), ("y", "ghost")),
      Seq("x" -> "C", "y" -> "C"))
    assert(rows.toSeq == Seq(("C", 2L, 2L, 0L, 0L)))
  }

  private val docsDf = Seq(
    // cluster 1: id 11 short, id 12 longest, id 13 same len as 12 (tie ->
    // min id wins); langs en,en,de -> en; sources s1,s2,s1
    (11L, "aa", "en", "s1"),
    (12L, "bbbbb", "en", "s2"),
    (13L, "ccccc", "de", "s1"),
    // cluster 2: one member
    (21L, "dddd", "fr", "s3"),
    // unclustered doc: must not appear
    (99L, "zzzz", "en", "s9"))
    .toDF("doc_id", "text", "lang", "source")

  private val clustersDf = Seq(
    ("11", "c1"), ("12", "c1"), ("13", "c1"), ("21", "c2"))
    .toDF("node", "component")

  test("canonicalize elects longest-then-min-id and majority language") {
    val rows = graft.ops.Dedup.canonicalize(docsDf, "doc_id", "text",
        "lang", "source", clustersDf)
      .orderBy("cluster")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getLong(5), r.getLong(6)))
    assert(rows.toSeq == Seq(
      // 12 and 13 both have len 5 -> min id 12; en beats de 2:1
      ("c1", 3L, 12L, 5L, "en", 2L, 12L),
      ("c2", 1L, 21L, 4L, "fr", 1L, 4L)))
  }

  test("language ties break to the lexicographically smallest lang") {
    val docs = Seq((1L, "aaa", "fr", "s"), (2L, "bb", "de", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val cl = Seq(("1", "c"), ("2", "c")).toDF("node", "component")
    val r = graft.ops.Dedup.canonicalize(docs, "doc_id", "text", "lang",
      "source", cl).collect()(0)
    assert(r.getString(4) == "de")
  }
}
