package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver-contract registries against SILENT KEY SHADOWING:
  * `SparkEntry.merged` catches a name duplicated ACROSS registry files,
  * but a key repeated INSIDE one Map literal dedupes silently (last
  * entry wins) — a re-added query can replace an existing one with no
  * compile error, no runtime error, and no gate-count change anyone
  * notices (this bit round 10: a second "q_novelty" literal shadowed the
  * r9 operator until the bench record's time shifted).
  *
  * The only place the duplication is visible is the SOURCE TEXT, so this
  * spec counts `"<name>" ->` key occurrences per registry file and pins
  * each registered query to exactly one queries entry plus one oracle
  * entry (when it has an oracle). Comments mentioning query names don't
  * match the key-arrow pattern.
  */
class RegistrySourceSpec extends AnyFunSuite {

  private val registryFiles = Seq(
    "src/main/scala/graft/GraphQueries.scala",
    "src/main/scala/graft/TextQueries.scala",
    "src/main/scala/graft/EventQueries.scala",
    "src/main/scala/graft/RelationalQueries.scala",
    "src/main/scala/graft/StatQueries.scala")

  private lazy val keyCounts: Map[String, Int] = {
    // q_* and q1_agg-style names; deliberately NOT plain q[a-z]* — rule
    // maps inside queries carry keys like "quantity_over_40"
    val keyArrow = """"(q\d*_[a-z0-9_]+)"\s*->""".r
    registryFiles.flatMap { path =>
      val src = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path)), "UTF-8")
      keyArrow.findAllMatchIn(src).map(_.group(1))
    }.groupMapReduce(identity)(_ => 1)(_ + _)
  }

  test("every registered query key appears exactly once per section") {
    val oracles = SparkEntry.oracleSql.keySet
    val bad = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val expected = 1 + (if (oracles(name)) 1 else 0)
      val got = keyCounts.getOrElse(name, 0)
      if (got != expected)
        Some(s"$name: $got key-arrow occurrences in registry sources, " +
          s"expected $expected (a duplicate Map key silently shadows)")
      else None
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  test("no orphan keys: every source key is a registered query") {
    val known = SparkEntry.queries.keySet
    val orphans = keyCounts.keys.filterNot(known).toSeq.sorted
    assert(orphans.isEmpty,
      s"keys in registry sources but not in SparkEntry.queries: $orphans")
  }
}
