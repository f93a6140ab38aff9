package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // --sql-only <path>: dump just oracle_sql.json (no Spark session) —
    // used by tools/lint_oracle_types.py to regenerate the type sidecar.
    if (args.headOption.contains("--sql-only")) {
      require(args.length == 2, "usage: Verify --sql-only <out.json>")
      writeOracleJson(args(1)); return
    }
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.caseSensitive", "true")
      // non-ANSI cast semantics: categorize/make_continuous rely on
      // invalid-cast -> NULL (pandas to_numeric parity), and the DuckDB
      // oracle replays the same decisions with TRY_CAST
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val failed = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        None
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        Some(name)
      }
    }
    // loud summary — a failed query would otherwise just be a missing
    // output dir, easy to miss among the INFO noise
    if (failed.nonEmpty)
      println(s"[verify] ${failed.size} QUERY FAILURE(S): ${failed.mkString(", ")}")
    else println(s"[verify] all ${SparkEntry.queries.size} queries dumped OK")
    writeOracleJson(s"$outDir/oracle_sql.json")
    spark.stop()
  }

  private def writeOracleJson(path: String): Unit = {
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(path), json)
  }
}
