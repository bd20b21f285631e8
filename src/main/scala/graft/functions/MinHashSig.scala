package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** One-pass 128-permutation MinHash signature aggregate.
  *
  * Replaces the 128-separate-`min`-columns formulation: each input
  * shingle hash updates all 128 buffer lanes inside ONE tight loop
  * over primitive long arrays (the same multiply-add-min kernel the
  * reference hand-vectorizes in its hash utilities,
  * /root/reference/hash-util.h:1), instead of evaluating 128
  * independent aggregate expressions per row — at 128 aggregates the
  * generated update code also blows past JIT-friendly method sizes,
  * which is exactly the regime where an imperative aggregate with a
  * typed buffer wins. Completes graft's custom-extension ladder:
  * scalar Expression (ArrayDot) → aggregate (this) → LogicalPlan/
  * Strategy/SparkPlan (TopKPerKey) → Rule (TopKRewrite).
  *
  * The permutation constants replicate Dedup's universal-hash family
  * (a_i·(h mod p) + b_i mod p, p = 2^31−1) bit for bit, so the DuckDB
  * oracles that replay that arithmetic keep matching exactly.
  *
  * Buffers are primitive Array[Long]; partial-aggregate shuffles
  * serialize them as fixed-width byte blocks. Map-side combine works
  * as usual (update into the buffer per partition, elementwise-min
  * merge across partitions), so the shuffle carries one 128-long
  * signature per (doc, partition), never the shingles.
  */
case class MinHashSig(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  private val nPerms = 128
  private val P = 2147483647L // 2^31 - 1

  // a_i, b_i as in Dedup.minhashLsh (Knuth/xxhash odd multipliers);
  // both < p and h mod p < 2^31, so a·h + b < 2^62 — no Long overflow
  private lazy val as: Array[Long] =
    Array.tabulate(nPerms)(i => ((2L * i + 1) * 2654435761L) % P)
  private lazy val bs: Array[Long] =
    Array.tabulate(nPerms)(i => ((i + 1L) * 2246822519L) % P)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_sig expects a BIGINT hash column, got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_minhash_sig"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(nPerms)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      // floorMod, not %: the function is registered for arbitrary
      // BIGINT inputs, and a sign-of-dividend % on a negative hash
      // would produce negative signature lanes. For the non-negative
      // hashes Dedup feeds (h60), floorMod == %, so oracle parity
      // with the 128-min-column formulation is unchanged.
      val h = Math.floorMod(v.asInstanceOf[Long], P)
      var i = 0
      while (i < nPerms) {
        val x = (as(i) * h + bs(i)) % P
        if (x < buf(i)) buf(i) = x
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < nPerms) {
      if (b2(i) < b1(i)) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(nPerms * java.lang.Long.BYTES)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](nPerms)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSig =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSig =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
