package graft.tools

import java.nio.file.{Files, Paths}

/** Writes SparkEntry.oracleSql as oracle_sql.json WITHOUT running any
  * query — seconds instead of the full Verify pass, for iterating on
  * oracle SQL against an existing Verify output directory.
  *
  * Usage: runMain graft.tools.DumpOracles <outFile>
  */
object DumpOracles {
  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "/tmp/oracle_sql.json"
    Files.writeString(Paths.get(out), graft.Verify.oracleJson)
    println(s"wrote $out")
  }
}
