package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.caseSensitive", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 1) bloom conf-raise: a 6M-key blocklist must NOT be clamped to the
    //    4M-item / 64Mi-bit session caps (silent fpp erosion)
    val big = spark.range(6L * 1000 * 1000).select(col("id").as("k"))
    val bf = graft.pipeline.Blocklist.sketch(big, "k", fpp = 0.01,
      expectedItems = 6L * 1000 * 1000)
    val wantBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(6L * 1000 * 1000, 0.01)
    println(s"sketch bytes=${bf.length} wantBits/8=${wantBits / 8} " +
      s"conf.maxNumBits=${spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.maxNumBits")}")
    assert(bf.length.toLong * 8 >= wantBits,
      s"sketch clamped: ${bf.length * 8L} bits < $wantBits wanted")

    // 2) filterOut persistInput path: same exact result as the default
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .withColumn("fp", md5(col("text")))
    val bl = docs.filter(col("doc_id") % 7 === 0).select(col("fp").as("bad_fp"))
    val a = graft.pipeline.Blocklist.filterOut(docs, bl, "fp", "bad_fp")
      .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    val b = graft.pipeline.Blocklist.filterOut(docs, bl, "fp", "bad_fp",
      persistInput = true)
      .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(a == b, "persistInput path diverged")
    println(s"filterOut persistInput path: ${b.size} rows, identical")

    // 3) asofJoin collision guard fires
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
      .withColumn("t", col("event_id"))
    val leftSide = ev.select(col("user_id"), col("t"), lit(1).as("asof_t"))
    val rightSide = ev.select(col("user_id"), col("t"), col("value"))
    val guarded =
      try {
        graft.pipeline.Joins.asofJoin(leftSide, rightSide, Seq("user_id"),
          "t", "t", Seq("value"))
        false
      } catch { case e: IllegalArgumentException =>
        println(s"collision guard fired: ${e.getMessage.take(90)}"); true
      }
    assert(guarded, "asofJoin collision guard did NOT fire")

    println("DRIVE OK")
    spark.stop()
  }
}
