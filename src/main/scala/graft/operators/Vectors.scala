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
  /** legacy 16-bit sign signature — kept ONLY as the migration
    * audit's baseline config ([[graft.operators.Dedup.embeddingTuning]]);
    * production banding is the [[SigPlanes]]-plane family below. */
  val Planes = 16
  /** Round-11 banding (the scale fix for the old 4-bit raw band
    * keys, whose 16-value range put ~1/16 of the whole corpus in
    * every bucket — quadratic candidate mass at 10⁹ vectors):
    * 128 md5-derived hyperplanes, banded 16 × 8 bits, each band's
    * 8-bit slice md5-HASHED with its band index into a 60-bit key —
    * the same hashed-band-key discipline as the text MinHash side.
    * Measured on the real corpus at both SFs (cosine ≥ 0.4 truth):
    * multi-probe recall 0.85/0.93 at 44/45% candidate share vs the
    * old config's 0.92/0.95 at 77% — same recall class at 1.7× less
    * candidate mass, with max bucket occupancy 2.0%/1.7% of the
    * corpus vs the old keys' guaranteed ~6.25% average. At a real
    * near-dup operating point (cosine ≥ 0.9, where p_bit ≈ 0.9) a
    * band matches with probability 0.43 vs 2⁻⁸ for unrelated
    * vectors, so bucket occupancy is driven by actual similarity. */
  val SigPlanes = 128
  val Bands = 16
  val BandBits = 8

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
    * products against literal planes, all inside one codegen stage.
    * LEGACY: feeds only the migration audit's baseline config. */
  def signatures(df: DataFrame): DataFrame = {
    val sig = (0 until Planes)
      .map(p => when(dot(col("vd"), typedlit(plane(p))) >= 0, lit(1 << p)).otherwise(lit(0)))
      .reduce(_ + _)
    asDouble(df).select(col("vec_id"), sig.as("sig"))
  }

  /** (vec_id, slices): the 16 × 8-bit band slices of the 128-plane
    * sign signature — slice b packs the sign bits of planes
    * 8b..8b+7 little-endian. 128 native dot products against
    * literal plane arrays (complex-type literals are references in
    * generated code, not inlined constants, so the stage stays
    * inside whole-stage codegen). */
  def bandSlices(df: DataFrame): DataFrame = {
    val slices = (0 until Bands).map { b =>
      (0 until BandBits).map { i =>
        val p = b * BandBits + i
        when(dot(col("vd"), typedlit(plane(p))) >= 0, lit(1 << i)).otherwise(lit(0))
      }.reduce(_ + _)
    }
    asDouble(df).select(col("vec_id"), array(slices: _*).as("slices"))
  }

  /** (vec_id, band, key): the exact 16 hashed band keys per vector.
    * key = Hash60 of "band:slice". Hashing does not enlarge the 2^8
    * slice domain, but it (a) spreads bucket keys uniformly over 60
    * bits so the candidate shuffle never hot-spots on a dense key
    * range, and (b) makes the key carry its band, so a single-column
    * equi-join covers (band, slice) — the exact convention of the
    * text MinHash banding. */
  def bandKeys(df: DataFrame): DataFrame =
    bandSlices(df)
      .select(col("vec_id"), posexplode(col("slices")).as(Seq("band", "slice")))
      .select(col("vec_id"), col("band"),
        expr(Hash60.sql("concat(CAST(band AS STRING), ':', CAST(slice AS STRING))"))
          .as("key"))

  /** (vec_id, band, key): multi-probe keys — each band's exact slice
    * PLUS its 8 one-bit flips, hashed. ×9 fan-out on the tiny key
    * relation; near-dup pairs whose 128-bit signatures straddle a
    * single band bit still collide somewhere. */
  def probeBandKeys(df: DataFrame): DataFrame =
    bandSlices(df)
      .select(col("vec_id"), posexplode(col("slices")).as(Seq("band", "slice")))
      .select(col("vec_id"), col("band"),
        explode(expr("transform(array(0,1,2,4,8,16,32,64,128), f -> slice ^ f)"))
          .as("pslice"))
      .select(col("vec_id"), col("band"),
        expr(Hash60.sql("concat(CAST(band AS STRING), ':', CAST(pslice AS STRING))"))
          .as("key"))
}
