package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** SparkEntry harness-contract tests: the testdata generator has shipped
  * events.ts as TIMESTAMP(NANOS)-read-as-long AND as TIMESTAMP_NTZ micros
  * across rounds — both encodings must produce identical query results. */
class EntryCompatSpec extends SparkSpec {

  test("events.ts normalization: nanos-long and TIMESTAMP_NTZ parquet agree") {
    val dir = Files.createTempDirectory("graft-ts-compat").toString
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src.write.mode("overwrite").parquet(s"$dir/a/events.parquet")
    // same instants as raw nanosecond longs (the pre-round-7 encoding)
    val micros = src.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => col("ts") / 1000
      case _ => unix_micros(col("ts").cast("timestamp"))
    }
    src.withColumn("ts", (micros * 1000).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/b/events.parquet")
    val q = SparkEntry.queries("events_interarrival")
    val a = q(spark, s"$dir/a").collect().map(_.toSeq).toSet
    val b = q(spark, s"$dir/b").collect().map(_.toSeq).toSet
    assert(a.nonEmpty, "compat fixture must produce rows")
    assert(a === b, "both ts encodings must yield identical results")
  }
}
