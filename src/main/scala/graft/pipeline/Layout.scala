package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout clustering for scan pruning — the OPTIMIZE ZORDER side of a
  * lakehouse pipeline. Multi-dimensional filters (partkey AND suppkey,
  * date AND domain) defeat single-column sort layouts: sorting by one key
  * scatters the other across every file. Interleaving the bits of both
  * keys' bucket ids (a Morton / Z-order curve) gives one sort key whose
  * ranges are small rectangles in BOTH dimensions, so per-file min/max
  * stats prune scans on either predicate.
  *
  * Everything is integer Column arithmetic (codegen'd, exactly
  * SQL-replayable): bucketize each dimension to `bits` bits against its
  * global min/max (one broadcast aggregate row — no driver collect), then
  * interleave. `zOrdered` range-partitions + sorts by the z-value, which is
  * exactly the write layout; `zCellStats` is the clustering-quality report
  * (per-cell row counts and per-dimension spans — tight spans = good
  * pruning).
  */
object Layout {

  /** Bucket id of `x` in [0, 2^bits) against inclusive bounds [mn, mx]:
    * ((x - mn) * (2^bits - 1)) DIV max(mx - mn, 1). Two exact paths behind
    * a per-bounds-row CASE: when the domain is narrow enough that the long
    * product cannot overflow (range ≤ Long.MaxValue / (2^bits-1) — true
    * for any real-world key short of full-range longs), plain long
    * arithmetic with INTEGRAL division (`div`, not `/`: double division of
    * >2^53 operands can land one ulp below the exact integer quotient and
    * truncate off-by-one). For wide domains (epoch-nanos over decades,
    * sign-spanning ranges — where even x-mn overflows) the same idiom runs
    * in decimal, exact over the entire long domain (≤ 32 digits). The
    * width test itself is decimal so it cannot overflow; both branches
    * stay codegen'd Catalyst arithmetic, and the CASE is constant per
    * bounds row so the fast path costs one long compare per row. */
  private def bucket(x: Column, mn: Column, mx: Column, bits: Int): Column = {
    val m = (1L << bits) - 1
    val rangeD = mx.cast("decimal(20,0)") - mn.cast("decimal(20,0)")
    val narrow = rangeD <= lit(Long.MaxValue / m).cast("decimal(20,0)")
    val fast = call_function("div", (x - mn) * lit(m), greatest(mx - mn, lit(1L)))
    val nD = (x.cast("decimal(20,0)") - mn.cast("decimal(20,0)")) * lit(m).cast("decimal(10,0)")
    val dD = greatest(rangeD, lit(1L).cast("decimal(20,0)"))
    val wide = ((nD - pmod(nD, dD)) / dD).cast("long")
    when(narrow, fast).otherwise(wide)
  }

  /** Morton interleave of d `bits`-bit bucket ids: bit i of dimension j
    * lands at position i·d + j. A fixed unrolled sum of shifts/masks —
    * whole-stage-codegen folds it into straight-line long arithmetic. */
  def interleaveBitsN(bs: Seq[Column], bits: Int): Column = {
    val d = bs.length
    require(d >= 1 && d * bits <= 62, s"d*bits must fit a long: $d x $bits")
    (for (i <- 0 until bits; j <- 0 until d) yield
      shiftleft(shiftrightunsigned(bs(j), i).bitwiseAND(lit(1L)), i * d + j))
      .reduce(_ + _)
  }

  /** 2-D convenience: bit i of x at position 2i, of y at 2i+1. */
  def interleaveBits(bx: Column, by: Column, bits: Int): Column =
    interleaveBitsN(Seq(bx, by), bits)

  /** Attach the z-value of `cols` as `out`, each dimension bucketized to
    * `bits` bits against its own global bounds (ONE broadcast aggregate row
    * riding the plan — stays lazy, no driver action). */
  def withZValueN(df: DataFrame, cols: Seq[String],
                  bits: Int, out: String): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31]: $bits")
    val bounds = df.agg(
      min(col(cols.head).cast("long")).as(s"__mn0"),
      (max(col(cols.head).cast("long")).as(s"__mx0") +:
        cols.tail.zipWithIndex.flatMap { case (c, i) => Seq(
          min(col(c).cast("long")).as(s"__mn${i + 1}"),
          max(col(c).cast("long")).as(s"__mx${i + 1}")) }): _*)
    val buckets = cols.zipWithIndex.map { case (c, i) =>
      bucket(col(c).cast("long"), col(s"__mn$i"), col(s"__mx$i"), bits) }
    df.crossJoin(broadcast(bounds))
      .withColumn(out, interleaveBitsN(buckets, bits))
      .drop(cols.indices.flatMap(i => Seq(s"__mn$i", s"__mx$i")): _*)
  }

  def withZValue(df: DataFrame, xCol: String, yCol: String,
                 bits: Int = 8, out: String = "zvalue"): DataFrame =
    withZValueN(df, Seq(xCol, yCol), bits, out)

  /** The write layout: range-partition by z-value (each output file covers
    * one compact z-range = one small hyper-rectangle in every dimension)
    * and sort within partitions so parquet row-group stats are tight too.
    * Write the result with the caller's sink; `numFiles` sizes the output. */
  def zOrderedN(df: DataFrame, cols: Seq[String],
                numFiles: Int, bits: Int = 8): DataFrame = {
    require(numFiles >= 1, s"numFiles must be >= 1: $numFiles")
    withZValueN(df, cols, bits, "zvalue")
      .repartitionByRange(numFiles, col("zvalue"))
      .sortWithinPartitions("zvalue")
  }

  def zOrdered(df: DataFrame, xCol: String, yCol: String,
               numFiles: Int, bits: Int = 8): DataFrame =
    zOrderedN(df, Seq(xCol, yCol), numFiles, bits)

  /** Clustering-quality report: rows per z-cell and each dimension's span
    * inside the cell. One shuffle (the cell aggregation, ≤ 2^(2·bits) groups
    * regardless of input size). Tight spans relative to the global range
    * mean a scan with a predicate on either dimension can skip most cells. */
  def zCellStats(df: DataFrame, xCol: String, yCol: String,
                 bits: Int = 6): DataFrame =
    withZValue(df, xCol, yCol, bits, out = "zcell")
      .groupBy(col("zcell"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(xCol)).as("x_min"), max(col(xCol)).as("x_max"),
        min(col(yCol)).as("y_min"), max(col(yCol)).as("y_max"))
}
