package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole text→MinHash-signature kernel as ONE native expression:
  * normalize (lower, collapse whitespace, trim) → whitespace tokens →
  * DISTINCT word 3-shingles → Hash60(md5) mod p per shingle → all 128
  * permutation lanes — the full per-document signature pipeline in a
  * single tight Java kernel, for call sites that structurally cannot
  * aggregate (stateless streaming LSH: the signature must be a
  * projection of the row itself).
  *
  * This is the reference's hand-written scan-kernel ethos
  * (/root/reference/hash-util.h:1) applied to the lambda cliff: the
  * HOF formulation of the same chain (transform-shingle →
  * transform-md5 → 128 array_min lambdas) evaluates interpreted at
  * >100× the cost (measured 93 s for the sf0.1 streaming replay;
  * this kernel ~3 s). Every step replicates the batch pipeline and
  * its DuckDB oracle bit for bit: the normalization is the repo-wide
  * `trim(regexp_replace(lower(text), '\s+', ' '))` (Java regex, the
  * same engine Spark's regexp_replace runs), the shingle hash is
  * Hash60 (first 15 md5 hex chars as a long) mod 2³¹−1, and the lane
  * family is MinHashSig's (a_i·h + b_i) mod p.
  *
  * Documents with fewer than 3 words have no shingles and yield
  * NULL (the callers' filter, like the oracles' `len(sh) > 0`). */
case class MinHashText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_text expects STRING, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_text"

  override def nullSafeEval(input: Any): Any =
    MinHashText.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = MinHashText.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, input => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.GenericArrayData)
         |  $cls.compute($input);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashText =
    copy(child = newChild)
}

object MinHashText {
  private val NPerms = 128
  private val P = 2147483647L // 2^31 - 1

  private val as: Array[Long] =
    Array.tabulate(NPerms)(i => ((2L * i + 1) * 2654435761L) % P)
  private val bs: Array[Long] =
    Array.tabulate(NPerms)(i => ((i + 1L) * 2246822519L) % P)

  private val hexDigits = "0123456789abcdef".toCharArray

  /** Hash60 of a UTF-8 string: first 15 hex chars of md5 as a long —
    * the same value as `CAST(conv(substring(md5(s),1,15),16,10) AS
    * BIGINT)` (and [[graft.operators.Vectors.h60]]). 15 hex digits =
    * 60 bits, parsed directly from the digest bytes. */
  private def h60(bytes: Array[Byte]): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(bytes)
    // first 15 hex chars = first 7 bytes + the high nibble of byte 8
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >> 4)
  }

  /** the full kernel; null for texts with fewer than 3 words. */
  def compute(text: UTF8String): GenericArrayData = {
    // lowercase through UTF8String so the kernel is bit-identical to
    // the batch pipeline's lower() on EVERY JVM locale (String
    // .toLowerCase uses the default locale: a Turkish JVM maps 'I' to
    // dotless 'ı', silently changing every shingle md5)
    val norm = text.toLowerCase.toString
      .replaceAll("\\s+", " ").trim
    val words = norm.split(" ", -1)
    if (words.length < 3) return null
    val seen = new java.util.HashSet[String]()
    val out = Array.fill(NPerms)(P)
    var j = 0
    var any = false
    while (j + 2 < words.length) {
      val sh = words(j) + " " + words(j + 1) + " " + words(j + 2)
      if (seen.add(sh)) {
        any = true
        val h = h60(sh.getBytes("UTF-8")) % P
        var i = 0
        while (i < NPerms) {
          val v = (as(i) * h + bs(i)) % P
          if (v < out(i)) out(i) = v
          i += 1
        }
      }
      j += 1
    }
    if (!any) null else new GenericArrayData(out)
  }
}
