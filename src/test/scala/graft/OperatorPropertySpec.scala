package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Randomized equivalence properties for the custom physical
  * operators: across seeded random frames (heavy ties, null keys and
  * timestamps, skewed key domains), AsOfJoinExec (both directions,
  * with and without tolerance) must equal an independent in-driver
  * reference implementation, and the spill-forced TopKPerKeyExec
  * must equal the window row_number formulation. Seeds are fixed, so
  * failures reproduce exactly. */
class OperatorPropertySpec extends SparkSpec {

  private case class L(lid: Long, k: Option[Long], ts: Option[Long])
  private case class R(rid: Long, rk: Option[Long], rts: Option[Long])

  private def genFrames(seed: Int): (Seq[L], Seq[R]) = {
    val rnd = new scala.util.Random(seed)
    def opt(v: Long): Option[Long] = if (rnd.nextInt(10) == 0) None else Some(v)
    val nL = 40 + rnd.nextInt(160)
    val nR = 40 + rnd.nextInt(160)
    // tiny key/ts domains on purpose: dense ties and key collisions
    val left = (0 until nL).map(i =>
      L(i.toLong, opt(rnd.nextInt(5).toLong), opt(rnd.nextInt(40).toLong)))
    val right = (0 until nR).map(i =>
      R(1000L + i, opt(rnd.nextInt(5).toLong), opt(rnd.nextInt(40).toLong)))
    (left, right)
  }

  private def toLeftDf(rows: Seq[L]) = {
    import spark.implicits._
    rows.map(l => (l.lid, l.k.map(java.lang.Long.valueOf).orNull,
      l.ts.map(java.lang.Long.valueOf).orNull)).toDF("lid", "k", "ts")
  }
  private def toRightDf(rows: Seq[R]) = {
    import spark.implicits._
    rows.map(r => (r.rid, r.rk.map(java.lang.Long.valueOf).orNull,
      r.rts.map(java.lang.Long.valueOf).orNull)).toDF("rid", "rk", "rts")
  }

  /** reference backward as-of: latest rts ≤ ts, ties → largest rid. */
  private def refBackward(left: Seq[L], right: Seq[R],
      tol: Option[Long]): Map[Long, Option[Long]] =
    left.map { l =>
      val cands = for {
        lk <- l.k.toSeq; lts <- l.ts.toSeq
        r <- right
        rk <- r.rk.toSeq; rts <- r.rts.toSeq
        if rk == lk && rts <= lts && tol.forall(t => lts - rts <= t)
      } yield r
      l.lid -> cands.sortBy(r => (r.rts.get, r.rid)).lastOption.map(_.rid)
    }.toMap

  /** reference forward as-of: earliest rts ≥ ts, ties → largest rid. */
  private def refForward(left: Seq[L], right: Seq[R],
      tol: Option[Long]): Map[Long, Option[Long]] =
    left.map { l =>
      val cands = for {
        lk <- l.k.toSeq; lts <- l.ts.toSeq
        r <- right
        rk <- r.rk.toSeq; rts <- r.rts.toSeq
        if rk == lk && rts >= lts && tol.forall(t => rts - lts <= t)
      } yield r
      val best = cands.sortBy(r => (-r.rts.get, r.rid)).lastOption
      l.lid -> best.map(_.rid)
    }.toMap

  private def runJoin(left: Seq[L], right: Seq[R], tol: Option[Long],
      forward: Boolean): Map[Long, Option[Long]] = {
    val df =
      if (forward)
        graft.plans.AsOf.joinForward(toLeftDf(left), toRightDf(right),
          Seq("k" -> "rk"), "ts", "rts", Seq("rid"), tol)
      else
        graft.plans.AsOf.join(toLeftDf(left), toRightDf(right),
          Seq("k" -> "rk"), "ts", "rts", Seq("rid"), tol)
    df.select("lid", "rid").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
  }

  for (seed <- 1 to 6) {
    test(s"asof backward equals the reference on random frames (seed $seed)") {
      val (l, r) = genFrames(seed)
      for (tol <- Seq(None, Some(0L), Some(3L), Some(100L))) {
        val got = runJoin(l, r, tol, forward = false)
        val want = refBackward(l, r, tol)
        assert(got == want, s"tol=$tol")
      }
    }
    test(s"asof forward equals the reference on random frames (seed $seed)") {
      val (l, r) = genFrames(seed + 100)
      for (tol <- Seq(None, Some(0L), Some(3L), Some(100L))) {
        val got = runJoin(l, r, tol, forward = true)
        val want = refForward(l, r, tol)
        assert(got == want, s"tol=$tol")
      }
    }
  }

  for (seed <- 1 to 4) {
    test(s"spill-forced topk equals window row_number on random data (seed $seed)") {
      import spark.implicits._
      val rnd = new scala.util.Random(seed + 500)
      val n = 1500 + rnd.nextInt(1500)
      // skewed keys: key 0 holds ~half the rows
      val rows = (0 until n).map { i =>
        val key = if (rnd.nextBoolean()) 0L else rnd.nextInt(40).toLong
        (i.toLong, key, rnd.nextInt(20).toLong) // small value domain → ties
      }
      val df = rows.toDF("id", "key", "v").repartition(3, col("key"))
      val k = 1 + rnd.nextInt(4)
      val got = graft.plans.TopK.perKey(df, Seq("key"),
          Seq("v" -> false, "id" -> true), k, maxKeysPerPartition = 4)
        .select("key", "id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val w = Window.partitionBy("key").orderBy(col("v").desc, col("id"))
      val want = df.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= k)
        .select("key", "id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want, s"k=$k n=$n")
    }
  }

  for (seed <- Seq(11, 12)) {
    test(s"mahalanobis score is translation-invariant per dimension (seed $seed)") {
      import spark.implicits._
      val rnd = new scala.util.Random(seed)
      val n = 20 + rnd.nextInt(30)
      // values on the 1/1024 dyadic grid: adding a dyadic shift is
      // then EXACT in doubles, so each quantized qx moves by an exact
      // integer constant and the integer residuals are untouched
      val base = (1 to n).map(i =>
        (i.toLong, Seq.fill(4)((rnd.nextInt(410) - 205) / 1024.0)))
      val shift = Seq(0.25, -0.125, 0.5, 0.0625)
      val shifted = base.map { case (id, v) =>
        (id, v.zip(shift).map { case (x, c) => x + c }) }
      def scores(rows: Seq[(Long, Seq[Double])]) =
        operators.Similarity.outlierMahalOn(rows.toDF("vec_id", "vd"))
          .collect().map(r => r.getAs[Long]("vec_id") ->
            r.getAs[Long]("score_micro")).toMap
      val a = scores(base); val b = scores(shifted)
      // dyadic shifts move each quantized qx by an exact constant, so
      // the integer residuals are identical and scores match exactly
      assert(a == b, s"translation changed scores")
    }

    test(s"zipf octaves are token-order invariant (seed $seed)") {
      import spark.implicits._
      val rnd = new scala.util.Random(seed)
      val toks = (1 to 500).map(_ => s"w${rnd.nextInt(40)}")
      def curve(ts: Seq[String]) =
        operators.TextAnalysis.zipfCurveOn(ts.toDF("w")).collect()
          .map(r => (r.getAs[Long]("octave"), r.getAs[Long]("n_terms"),
            r.getAs[Long]("n_occ"))).toSet
      assert(curve(toks) == curve(rnd.shuffle(toks)))
    }
  }
}
