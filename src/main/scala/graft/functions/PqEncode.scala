package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native product-quantization encoder:
  * `graft_pq_encode(vd, cvs, hcs, subDim)` →
  * `struct<picks: array<bigint>, vnrm: double>`.
  *
  * For each contiguous `subDim`-wide subspace s of the vector,
  * picks the codebook POSITION minimizing L2 distance — computed as
  * argmax(dot(v_s, c_s) − ‖c_s‖²/2), the vector's own self-dot being
  * constant per subspace; `hcs(c)(s)` supplies the half self-dots
  * precomputed at codebook build. Ties keep the LOWEST position
  * (strict `>` in the scan). Also returns the PQ-reconstructed norm
  * sqrt(Σ_s 2·h_chosen) accumulated in subspace order, so the whole
  * encode matches the unrolled-column formulation (and the DuckDB
  * oracle) bit-for-bit.
  *
  * Why native: the unrolled-columns version of this computation (128
  * dot/struct columns) exceeds janino's 64 KB method limit, silently
  * dropping the WHOLE projection to interpreted eval — the same
  * failure class the repo's profiling found for array-HOF lambdas.
  * Here codegen emits one call into this JIT-compiled loop
  * (ctx.addReferenceObj), keeping the stage inside whole-stage
  * codegen. Same SIMD-ethos rationale as ArrayDot
  * (/root/reference/hash-util.h:1).
  */
case class PqEncode(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {

  private def arr2(t: DataType): Boolean = t match {
    case ArrayType(ArrayType(DoubleType, _), _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (first.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }) && arr2(second.dataType) && arr2(third.dataType) &&
      fourth.dataType == IntegerType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_pq_encode expects (array<double>, array<array<double>>, " +
        s"array<array<double>>, int), got (${first.dataType.simpleString}, " +
        s"${second.dataType.simpleString}, ${third.dataType.simpleString}, " +
        s"${fourth.dataType.simpleString})")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("picks", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("vnrm", DoubleType, nullable = false)))
  override def prettyName: String = "graft_pq_encode"

  /** the hot loop — public so generated code can call it. */
  def compute(vdA: Any, cvsA: Any, hcsA: Any, subDimA: Any): InternalRow = {
    val vd = vdA.asInstanceOf[ArrayData]
    val cvs = cvsA.asInstanceOf[ArrayData]
    val hcs = hcsA.asInstanceOf[ArrayData]
    val subDim = subDimA.asInstanceOf[Int]
    val nSub = vd.numElements() / subDim
    val nCodes = cvs.numElements()
    val picks = new Array[Long](nSub)
    var vnrm2 = 0.0
    var s = 0
    while (s < nSub) {
      val off = s * subDim
      var best = Double.NegativeInfinity
      var bestC = -1L
      var bestH = 0.0
      var c = 0
      while (c < nCodes) {
        val cv = cvs.getArray(c)
        val h = hcs.getArray(c).getDouble(s)
        var dot = 0.0
        var i = 0
        while (i < subDim) { dot += vd.getDouble(off + i) * cv.getDouble(off + i); i += 1 }
        val score = dot - h
        if (score > best) { best = score; bestC = c; bestH = h }
        c += 1
      }
      picks(s) = bestC
      vnrm2 += 2.0 * bestH
      s += 1
    }
    new GenericInternalRow(Array[Any](
      ArrayData.toArrayData(picks), math.sqrt(vnrm2)))
  }

  override def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    compute(a, b, c, d)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, (v, cvs, hcs, sd) =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) " +
        s"$ref.compute($v, $cvs, $hcs, $sd);")
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): PqEncode =
    copy(first = f, second = s, third = t, fourth = q)
}
