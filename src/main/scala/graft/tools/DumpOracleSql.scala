package graft.tools

import java.nio.file.{Files, Paths}

import graft.SparkEntry

/** Dev harness: write SparkEntry.oracleSql as JSON without a Spark session,
  * for tools/spotcheck.py's targeted DuckDB diff. Not part of the driver
  * contract (the driver gets the same map from Verify's oracle_sql.json). */
object DumpOracleSql {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/oracle_sql.json")
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    Files.writeString(Paths.get(out),
      SparkEntry.oracleSql.map { case (k, v) => s"${q(k)}: ${q(v)}" }
        .mkString("{", ",", "}"))
  }
}
