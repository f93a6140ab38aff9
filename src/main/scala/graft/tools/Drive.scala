package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch end-to-end driver for ad-hoc verification (see skills/verify). */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.caseSensitive", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // REAL file-based streaming source over the events table: lifetime
    // totals via transformWithState, checked against the batch aggregate
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batch = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
    val stream = spark.readStream.schema(batch.schema)
      .parquet("/tmp/evstream")
    val q = graft.streaming.EventStreams.runningTotalsStream(spark, stream)
      .writeStream.format("memory").queryName("drive_totals")
      .outputMode("update").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("drive_totals")
      .groupBy("user_id").agg(org.apache.spark.sql.functions.max("n_events").as("n"))
    val want = batch.groupBy("user_id").count()
    val diff = got.join(want, Seq("user_id"))
      .filter(org.apache.spark.sql.functions.col("n") =!=
        org.apache.spark.sql.functions.col("count")).count()
    println(s"[drive] users=${want.count()} mismatches=$diff")
    assert(diff == 0, "stream lifetime totals must equal batch counts")
    spark.stop()
  }
}
