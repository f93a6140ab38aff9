package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, DoubleType}

/** Native k-nearest-centroid assignment: array<int> of the `k` nearest
  * centroid indices (squared euclidean, ties broken by lower index — the
  * same order a stable sort by distance produces). Replaces the former
  * Scala udf on BOTH the IVF query path and the corpus-scale index-build
  * assignment: the centroid matrix rides as a reference object and the
  * whole argmin loop stays inside whole-stage codegen, so the heaviest
  * build step (one pass over the full corpus) no longer crosses a
  * serialization boundary per row.
  */
case class NearestLists(child: Expression, centers: Seq[Seq[Double]], k: Int)
    extends UnaryExpression {

  require(centers.nonEmpty, "nearest_lists needs at least one center")
  require(centers.forall(_.length == centers.head.length),
    "all centers must have the same dimension")
  require(k >= 1 && k <= centers.length,
    s"k must be in 1..${centers.length}, got $k")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  // nullable regardless of the child: a dimension mismatch or null element
  // yields null even for a non-null input. Inheriting child.nullable=false
  // here both lies to downstream operators AND breaks codegen —
  // nullSafeCodeGen's non-nullable branch never declares ev.isNull, so the
  // template's `ev.isNull = true` references an undeclared name and the
  // whole stage silently falls back to interpreted execution.
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_lists needs array<float|double>, got ${t.simpleString}")
  }

  // element-width polymorphism: vectors arrive as array<float> OR
  // array<double> depending on the data generator vintage
  private def childIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  @transient private lazy val flat: Array[Double] = centers.flatten.toArray
  private def dim: Int = centers.head.length

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    if (x.numElements() != dim) return null
    var i = 0
    while (i < dim) { if (x.isNullAt(i)) return null; i += 1 }
    new GenericArrayData(NearestLists.kernel(x, flat, dim, k, childIsFloat))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("centers", flat, "double[]")
    val dimV = dim
    val kV = k
    nullSafeCodeGen(ctx, ev, x => {
      val i = ctx.freshName("i")
      s"""
         |if ($x.numElements() != $dimV) { ${ev.isNull} = true; }
         |for (int $i = 0; !${ev.isNull} && $i < $dimV; $i++) {
         |  if ($x.isNullAt($i)) ${ev.isNull} = true;
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    graft.functions.NearestLists.kernel($x, $flatRef, $dimV, $kV, ${childIsFloat.toString}));
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "nearest_lists"
}

object NearestLists {
  /** k smallest centroid indices by squared distance; strict-< selection
    * keeps the lower index on exact ties (stable-sort parity). Shared by
    * interpreted eval and generated code. */
  def kernel(x: ArrayData, flat: Array[Double], dim: Int, k: Int,
             isFloat: Boolean): Array[Int] = {
    val nLists = flat.length / dim
    val d = new Array[Double](nLists)
    var l = 0
    while (l < nLists) {
      var s = 0.0
      var i = 0
      val off = l * dim
      while (i < dim) { val diff = (if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)) - flat(off + i); s += diff * diff; i += 1 }
      d(l) = s
      l += 1
    }
    val idx = Array.tabulate(nLists)(identity)
    var a = 0
    while (a < k) {
      var best = a
      var b = a + 1
      while (b < nLists) { if (d(idx(b)) < d(idx(best))) best = b; b += 1 }
      val t = idx(a); idx(a) = idx(best); idx(best) = t
      a += 1
    }
    java.util.Arrays.copyOf(idx, k)
  }
}
