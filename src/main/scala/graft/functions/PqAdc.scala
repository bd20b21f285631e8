package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native ADC (asymmetric distance computation) table builder:
  * `graft_pq_adc(pv, cvs, subDim)` → `array<array<double>>` where
  * `result(s)(c) = dot(pv[s·subDim .. ), cvs(c)[s·subDim .. ))` over
  * `subDim` elements, left-to-right from 0.0 — the per-probe lookup
  * tables PQ scoring reads instead of computing full-width dots per
  * candidate. Runs once per probe against the broadcast codebook;
  * native for the same 64 KB-codegen-limit reason as [[PqEncode]].
  */
case class PqAdc(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (first.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }) && (second.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }) && third.dataType == IntegerType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_pq_adc expects (array<double>, array<array<double>>, int), " +
        s"got (${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        s"${third.dataType.simpleString})")
  }

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def prettyName: String = "graft_pq_adc"

  /** public so generated code can call it. */
  def compute(pvA: Any, cvsA: Any, subDimA: Any): ArrayData = {
    val pv = pvA.asInstanceOf[ArrayData]
    val cvs = cvsA.asInstanceOf[ArrayData]
    val subDim = subDimA.asInstanceOf[Int]
    val nSub = pv.numElements() / subDim
    val nCodes = cvs.numElements()
    val rows = new Array[Any](nSub)
    var s = 0
    while (s < nSub) {
      val off = s * subDim
      val row = new Array[Double](nCodes)
      var c = 0
      while (c < nCodes) {
        val cv = cvs.getArray(c)
        var dot = 0.0
        var i = 0
        while (i < subDim) { dot += pv.getDouble(off + i) * cv.getDouble(off + i); i += 1 }
        row(c) = dot
        c += 1
      }
      rows(s) = ArrayData.toArrayData(row)
      s += 1
    }
    new GenericArrayData(rows)
  }

  override def nullSafeEval(a: Any, b: Any, c: Any): Any = compute(a, b, c)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdc", this, classOf[PqAdc].getName)
    nullSafeCodeGen(ctx, ev, (p, cvs, sd) =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"$ref.compute($p, $cvs, $sd);")
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): PqAdc =
    copy(first = f, second = s, third = t)
}
