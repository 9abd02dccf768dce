package graft

import java.nio.file.{Files, Paths}

/** Shared oracle_sql.json writer for [[Verify]] and the local
  * [[tools.VerifySome]] — one escape implementation, so an escaping fix
  * lands in both tools at once (the round-1 bug this guards against: one
  * unescaped control char in builder-authored SQL makes the driver's
  * json.load fail and silently zeroes the round's correctness).
  */
object OracleJson {

  /** JSON string escape: backslash, quote, and ALL control chars (<0x20). */
  def escape(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Dump SparkEntry.oracleSql as outDir/oracle_sql.json. */
  def write(outDir: String): Unit = {
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${escape(k)}: ${escape(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
  }
}
