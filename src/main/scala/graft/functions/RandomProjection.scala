package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Johnson–Lindenstrauss random projection: component b of the
  * result is v · plane_b over a seeded gaussian plane matrix — the
  * continuous cousin of [[HyperplaneSignature]] (which keeps only the
  * sign). The standard pre-ANN dimensionality cut: at 100 TB a 64→16
  * projection shrinks every embedding shuffle/scan 4× while JL keeps
  * pairwise distances within the usual (1±ε) band, and brute-force /
  * IVF / LSH all run unchanged on the projected column.
  *
  * The plane matrix rides inside the expression node, so the whole
  * projection is ONE codegen'd fused loop — the composable formulation
  * (outDim × dim chained `element_at` adds) builds hundreds of
  * expression nodes and falls out of whole-stage codegen.
  */
case class RandomProjection(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression {

  require(planes.nonEmpty, "projection needs at least one plane")
  require(planes.forall(_.length == planes.head.length),
    "all projection planes must have the same dimension")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  // dim mismatch / null element -> null row (same contract as the
  // signature expression: a truncated dot product would silently place
  // the vector somewhere wrong)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"random_projection needs array<float|double>, got ${t.simpleString}")
    }

  private def childIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  @transient private lazy val flat: Array[Double] = planes.flatten.toArray
  private def outDim: Int = planes.length
  private def dim: Int = planes.head.length

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    if (x.numElements() != dim) return null
    var i = 0
    while (i < dim) { if (x.isNullAt(i)) return null; i += 1 }
    val out = new Array[Double](outDim)
    val cf = childIsFloat
    var b = 0
    while (b < outDim) {
      var proj = 0.0
      var j = 0
      val off = b * dim
      while (j < dim) {
        proj += (if (cf) x.getFloat(j).toDouble else x.getDouble(j)) * flat(off + j)
        j += 1
      }
      out(b) = proj
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("planes", flat, "double[]")
    val outDimV = outDim
    val dimV = dim
    nullSafeCodeGen(ctx, ev, x => {
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val proj = ctx.freshName("proj")
      val off = ctx.freshName("off")
      val out = ctx.freshName("out")
      s"""
         |if ($x.numElements() != $dimV) { ${ev.isNull} = true; }
         |for (int $i = 0; !${ev.isNull} && $i < $dimV; $i++) {
         |  if ($x.isNullAt($i)) ${ev.isNull} = true;
         |}
         |if (!${ev.isNull}) {
         |  double[] $out = new double[$outDimV];
         |  for (int $b = 0; $b < $outDimV; $b++) {
         |    double $proj = 0.0;
         |    int $off = $b * $dimV;
         |    for (int $i = 0; $i < $dimV; $i++) {
         |      $proj += ((double) $x.${if (childIsFloat) "getFloat" else "getDouble"}($i)) * $flatRef[$off + $i];
         |    }
         |    $out[$b] = $proj;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "random_projection"
}
