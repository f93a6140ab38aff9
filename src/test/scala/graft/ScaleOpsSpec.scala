package graft

import org.apache.spark.sql.functions._
import graft.io.Load
import graft.pipeline.Joins

/** Scale primitives: salted skew-joins, bucketed co-located joins, ORC
  * interchange. These tests pin the PLAN shape, not just the values —
  * at 100 TB the plan is the contract. */
class ScaleOpsSpec extends SparkSpec {

  test("saltedJoin == plain join on a skewed key distribution") {
    import spark.implicits._
    // 90% of fact rows share one key (the pathological-skew shape)
    val fact = (0 until 5000).map(i =>
      (if (i % 10 == 0) i % 7 else 999, i.toLong)).toDF("k", "v")
    val dim = (0 until 1000).map(i => (i, s"d$i")).toDF("k", "name")
    val plain = fact.join(dim, Seq("k"))
    val salted = Joins.saltedJoin(fact, dim, Seq("k"), salt = 8)
    assert(salted.columns.toSeq === plain.columns.toSeq)
    val a = plain.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    val b = salted.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    assert(a === b) // row-for-row identical incl. duplicate multiplicity
    // the join key really is (k, __salt): fact's skew key splits 8 ways
    val plan = Joins.saltedJoin(fact, dim, Seq("k"), 8).queryExecution
      .executedPlan.toString
    assert(plan.contains("__salt"))
  }

  test("bucketed tables equi-join without a shuffle on either side") {
    val t1 = "graft_bkt_orders"
    val t2 = "graft_bkt_lineitem"
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    Load.saveBucketed(orders, t1, Seq("o_orderkey"), numBuckets = 8)
    Load.saveBucketed(lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
      t2, Seq("o_orderkey"), numBuckets = 8)
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = spark.table(t1).join(spark.table(t2), "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() === lineitem.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql(s"DROP TABLE IF EXISTS $t1")
      spark.sql(s"DROP TABLE IF EXISTS $t2")
    }
  }

  test("ORC roundtrip preserves schema and values") {
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.write.mode("overwrite").orc(s"$dir/docs.orc")
    val back = Load.fromOrc(spark, s"$dir/docs.orc", idCol = Some("doc_id"))
    assert(back.df.schema.fields.map(f => (f.name, f.dataType)).toSet ===
      docs.withColumnRenamed("doc_id", graft.model.CladeFrame.DefaultId)
        .schema.fields.map(f => (f.name, f.dataType)).toSet)
    assert(back.df.count() === docs.count())
    // pushdown reaches the ORC scan too
    val plan = back.df.filter(col(graft.model.CladeFrame.DefaultId) < 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("LessThan"))
  }
}
