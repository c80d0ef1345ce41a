package graft.tools

import java.nio.file.{Files, Paths}

/** Dump SparkEntry.oracleSql to <outDir>/oracle_sql.json without running
  * any Spark queries — lets check_oracle.py replay a single query's
  * oracle against an existing OneQuery parquet during iteration.
  * usage: runMain graft.tools.DumpOracle <outDir>
  */
object DumpOracle {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    new java.io.File(outDir).mkdirs()
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
  }
}
