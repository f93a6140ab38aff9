package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text-hash signature expressions for the dedup operators.
  *
  * The round-2 implementations shingled/hashed through typed Dataset maps
  * (`as[(String, String)].map`), which force a deserialization boundary and
  * break whole-stage codegen around the scan. These expressions keep the
  * signature computation inside the codegen'd projection; the generated
  * code calls the SAME static kernels ([[graft.pipeline.Dedup]]) the tests
  * assert against, so plan shape changes but numerics cannot.
  */

/** MinHash signature of a string: array<long> of per-function minima over
  * the fmix64 hash family (the family rides in the plan as a reference
  * object). */
case class MinhashSignature(child: Expression, params: Array[Long], shingleK: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature needs string, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(graft.pipeline.Dedup.minhashSignatureWith(
      v.asInstanceOf[UTF8String].toString, params, shingleK))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val paramsRef = ctx.addReferenceObj("params", params, "long[]")
    nullSafeCodeGen(ctx, ev, x =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.pipeline.Dedup.minhashSignatureWith($x.toString(), $paramsRef, $shingleK));
       """.stripMargin)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "minhash_signature"
}

/** 64-bit SimHash of a string (sign-aggregated token hashes). */
case class Simhash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 needs string, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    java.lang.Long.valueOf(graft.pipeline.Dedup.simhash(v.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.pipeline.Dedup.simhash($x.toString());")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "simhash64"
}

/** Ordered word-n-gram window hashes over a PRE-SPLIT word array:
  * array<long>, element i = hash of words[i..i+n-1]. Computed as a
  * polynomial combine of per-word XXH64 hashes — O(words·n) long ops and
  * ZERO n-gram string materialization (the Column-algebra path built an
  * n-word string per position before hashing it). Only equality of equal
  * windows matters to the dedup/decontamination joins, so the hash family
  * is free to differ from xxhash64-of-concat; the DuckDB oracles join raw
  * n-gram strings and would surface any collision. */
case class NgramWindowHashes(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ngram_window_hashes needs array<string>, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(graft.pipeline.Decontaminate.ngramWindowHashKernel(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.pipeline.Decontaminate.ngramWindowHashKernel($x, $n));
       """.stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "ngram_window_hashes"
}

/** Winnowing fingerprint selection over a pre-split word array
  * (Schleimer et al. 2003): array<struct<pos,fp>> of the per-window
  * min-hash selections, rightmost on ties — one JVM loop per document
  * replacing an interpreted nested transform/aggregate HOF chain that
  * measured ~2 ms/doc. The hash stays the cross-engine md5-prefix int64
  * (selection depends on hash ORDER, so the DuckDB oracle must replay it
  * bit-identically); kernel: [[graft.pipeline.Text.winnowKernel]]. */
case class WinnowPrints(child: Expression, k: Int, w: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", LongType, nullable = false),
    StructField("fp", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"winnow_prints needs array<string>, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    graft.pipeline.Text.winnowKernel(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.pipeline.Text.winnowKernel($x, $k, $w);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "winnow_prints"
}

/** Per-string character-entropy statistics:
  * struct<n_chars, n_distinct, entropy_nats> with the order-pinned
  * Σ c·ln c fold (sorted distinct codepoints) — bit-identical to the
  * DuckDB oracle's list-sorted fold. Kernel:
  * [[graft.pipeline.Text.charEntropyKernel]]. */
case class CharEntropyStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("entropy_nats", DoubleType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"char_entropy_stats needs string, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    graft.pipeline.Text.charEntropyKernel(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.pipeline.Text.charEntropyKernel($x);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "char_entropy_stats"
}

/** Distinct k-shingle polynomial hashes of a string: array<long> — the
  * exact-Jaccard verification representation. */
case class ShingleHashes(child: Expression, shingleK: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes needs string, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(graft.pipeline.Dedup.shingleHashSet(
      v.asInstanceOf[UTF8String].toString, shingleK))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.pipeline.Dedup.shingleHashSet($x.toString(), $shingleK));
       """.stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "shingle_hashes"
}
