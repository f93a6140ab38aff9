package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan auditor: for every declared query, checks the physical plan for the
  * properties that matter at 100 TB — parquet filter pushdown on filtered
  * scans, column pruning (ReadSchema narrower than the table), and
  * whole-stage codegen presence — and flags scans that read every column.
  * Run: `sbt "runMain graft.tools.PlanAudit [sfDir]"`. */
object PlanAudit {
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
    val wide = "(struct<.{600,})".r
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
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
        println(f"[audit] $name%-28s codegenSpans=$nCodegen%-3d pushed=${hasScanFilter}%-5s ${flags.mkString(",")}")
      } catch {
        case e: Throwable => println(s"[audit] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
