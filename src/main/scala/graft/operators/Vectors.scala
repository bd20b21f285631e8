package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vector kernels over `embedding: array<float>` columns.
  *
  * All arithmetic is double, accumulated strictly left-to-right in
  * dimension order, so DuckDB oracles that fold the same way produce
  * bit-identical IEEE results — the cross-engine analog of the
  * reference hand-vectorizing its kernels one way and getting one
  * deterministic answer (/root/reference/hash-util.h:1).
  *
  * The 16 LSH hyperplanes are derived from md5("hp<p>_<d>") — no RNG,
  * so Spark (computed here in Scala, embedded as literals) and DuckDB
  * (computed inline in SQL) see the same planes exactly.
  */
object Vectors {
  val Dims = 64
  val Planes = 16

  /** First 15 md5 hex chars as a 60-bit non-negative long —
    * the same value as SQL `conv(substring(md5(s),1,15),16,10)`. */
  def h60(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  /** hyperplane weights in [-1, 1] on a 1/1000 grid. */
  def plane(p: Int): Seq[Double] =
    (0 until Dims).map(d => (h60(s"hp${p}_${d}") % 2001 - 1000) / 1000.0)

  /** dot product via the native codegen ArrayDot expression
    * (graft.functions.ArrayDot): a tight generated multiply-add loop,
    * left-to-right from 0.0. */
  def dot(a: Column, b: Column): Column =
    call_function("graft_dot", a, b)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** L2 norm — the sqrt(self-dot) subterm of cosine. */
  def norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine from precomputed norms: bit-identical to cosine() (the
    * norm subexpressions are the same values, the division tree is
    * the same shape) but the self-dots are computed once per ROW
    * instead of once per PAIR — the standard ANN norm cache, cutting
    * the pair-path kernel work 3×. */
  def cosinePre(a: Column, b: Column, na: Column, nb: Column): Column =
    dot(a, b) / (na * nb)

  /** embedding cast to array<double> (floats widen exactly). */
  def asDouble(df: DataFrame): DataFrame =
    df.withColumn("vd", transform(col("embedding"), x => x.cast("double")))

  /** (vec_id, sig): 16-bit hyperplane signature — 16 native dot
    * products against literal planes, all inside one codegen stage. */
  def signatures(df: DataFrame): DataFrame = {
    val sig = (0 until Planes)
      .map(p => when(dot(col("vd"), typedlit(plane(p))) >= 0, lit(1 << p)).otherwise(lit(0)))
      .reduce(_ + _)
    asDouble(df).select(col("vec_id"), sig.as("sig"))
  }
}
