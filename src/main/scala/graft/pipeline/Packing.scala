package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Sequence-packing operators for LLM training pipelines (driver mandate):
  * assign documents to fixed-token-budget training sequences.
  *
  * Two contracts, matching the two shapes used in practice:
  *
  *  - packChunked — GPT-style concat-and-chunk: documents are concatenated
  *    in a deterministic order inside each group and the token stream is cut
  *    every `maxTokens`; a document may straddle a cut. Pure window algebra
  *    (one cumulative sum per group), fully SQL-replayable, and the window
  *    is PARTITIONED by the group column — at 100 TB the group key (shard /
  *    source) bounds each sort, there is no global ordering anywhere.
  *
  *  - packFirstFit — greedy no-split packing: a document never crosses a
  *    sequence boundary; a new bin opens when the next document would
  *    overflow. Inherently sequential within a group, so it runs as one
  *    linear pass per group (repartition by group + sortWithinPartitions +
  *    mapPartitions) — each group streams through exactly one task with O(1)
  *    state, never through the driver.
  */
object Packing {

  /** Concat-and-chunk packing. Adds:
    *   - `start_offset`  — the document's first token position in its
    *                       group's concatenated stream (0-based)
    *   - `chunk_first` / `chunk_last` — the fixed-size windows (of
    *                       `maxTokens` tokens) the document lands in
    * Documents with 0 tokens get chunk_first = chunk_last = the chunk of
    * their offset. */
  def packChunked(df: DataFrame, tokens: Column, maxTokens: Int,
                  groupCol: String, orderCol: String): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    val w = Window.partitionBy(groupCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val start = coalesce(sum(tokens).over(w), lit(0L))
    df.withColumn("start_offset", start)
      .withColumn("chunk_first", floor(col("start_offset") / maxTokens))
      .withColumn("chunk_last",
        when(tokens > 0, floor((col("start_offset") + tokens - 1) / maxTokens))
          .otherwise(col("chunk_first")))
  }

  /** Greedy first-fit-in-order packing (no document splitting): within each
    * group (ordered by `orderCol`), documents fill bin 0,1,2,… sequentially;
    * a document that would overflow `maxTokens` opens the next bin.
    * Documents longer than `maxTokens` get a bin of their own. Adds
    * `bin_id` (0-based per group). */
  def packFirstFit(df: DataFrame, tokensCol: String, maxTokens: Int,
                   groupCol: String, orderCol: String): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    val spark = df.sparkSession
    val outSchema = StructType(df.schema.fields :+ StructField("bin_id", LongType))
    val gi = df.schema.fieldIndex(groupCol)
    val ti = df.schema.fieldIndex(tokensCol)
    // one task per group-run: repartition co-locates a group, the sort makes
    // the scan order deterministic, and the per-partition state is O(1)
    val arranged = df.repartition(col(groupCol))
      .sortWithinPartitions(col(groupCol), col(orderCol))
    val packed = arranged.rdd.mapPartitions { it =>
      var curGroup: Any = null
      var first = true
      var binId = 0L
      var fill = 0L
      it.map { r =>
        val g = r.get(gi)
        if (first || g != curGroup) { curGroup = g; first = false; binId = 0L; fill = 0L }
        val n = r.get(ti) match {
          case null => 0L
          case x: Number => x.longValue()
        }
        if (fill > 0L && fill + n > maxTokens) { binId += 1L; fill = 0L }
        fill += n
        Row.fromSeq(r.toSeq :+ binId)
      }
    }
    spark.createDataFrame(packed, outSchema)
  }
}
