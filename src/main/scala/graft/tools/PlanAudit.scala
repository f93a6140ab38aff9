package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan auditor: for every declared query, checks the physical plan for the
  * properties that matter at 100 TB — parquet filter pushdown on filtered
  * scans, column pruning (ReadSchema narrower than the table), and
  * whole-stage codegen presence — and flags scans that read every column.
  *
  * `PlanAuditSpec` runs [[auditQuery]] over the whole query surface inside
  * `sbt test` and FAILS on any flag outside its justified allowlist, so a
  * pushdown/codegen regression reds the build rather than a log line.
  * Run standalone: `sbt "runMain graft.tools.PlanAudit [sfDir]"`. */
object PlanAudit {

  final case class Audit(name: String, codegenSpans: Int, pushed: Boolean,
                         flags: Seq[String], plan: String)

  private val wide = "(struct<.{600,})".r

  /** Plan (not execute) one query with AQE off and derive its audit row.
    * Queries with eager driver-side steps (collect-based audits, local
    * fast paths) still only pay their construction cost. */
  def auditQuery(spark: SparkSession, sfDir: String, name: String,
                 fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Audit = {
    val plan = fn(spark, sfDir).queryExecution.executedPlan
    val s = plan.toString
    val pushed = "PushedFilters: \\[([^\\]]*)\\]".r
      .findAllMatchIn(s).map(_.group(1)).toSeq
    val hasScanFilter = pushed.exists(_.trim.nonEmpty)
    val nCodegen = "\\*\\(\\d+\\)".r.findAllIn(s).toSeq.distinct.size
    val wideScan = wide.findFirstIn(s).isDefined
    val flags = Seq(
      // a real Filter node with nothing reaching the scan ("PushedFilters:"
      // itself must not match)
      if (pushed.nonEmpty && !hasScanFilter && s.contains("Filter (")) "NO-PUSHDOWN" else "",
      if (nCodegen == 0) "NO-CODEGEN" else "",
      if (wideScan) "WIDE-SCAN" else "").filter(_.nonEmpty)
    Audit(name, nCodegen, hasScanFilter, flags, s)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.caseSensitive", "true")
      .config("spark.ui.enabled", "false")
      // AQE off: codegen stages are only visible in the static plan string
      // without adaptive wrapping
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val a = auditQuery(spark, sfDir, name, fn)
        println(f"[audit] $name%-28s codegenSpans=${a.codegenSpans}%-3d pushed=${a.pushed}%-5s ${a.flags.mkString(",")}")
      } catch {
        case e: Throwable => println(s"[audit] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
