package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.TopK

/** TopKPerKey (custom LogicalPlan + Strategy + SparkPlan) must agree
  * exactly with the window row_number ≤ k formulation for a total
  * ordering. */
class TopKSpec extends SparkSpec {

  private def viaWindow(k: Int) = {
    val w = Window.partitionBy("p_brand")
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    graft.sources.Tables.part(spark, sf)
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
  }

  private def viaTopK(k: Int) =
    TopK.perKey(graft.sources.Tables.part(spark, sf),
      Seq("p_brand"), Seq("p_retailprice" -> false, "p_partkey" -> true), k)

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("p_brand", "p_partkey", "rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  test("topk operator matches window row_number for k=3 and k=1") {
    for (k <- Seq(1, 3)) {
      val want = rows(viaWindow(k))
      val got = rows(viaTopK(k))
      assert(got == want,
        s"k=$k missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    }
  }

  test("topk plan contains the custom exec and no window sort") {
    val plan = viaTopK(3).queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("topk degrades to sorted spill runs past the key budget, result exact") {
    // p_partkey is effectively unique per row — far more than 10 keys
    // per partition, so a 10-key budget forces spills on every
    // partition. The operator must complete via the run merge with
    // EXACTLY the window formulation's answer, not refuse or OOM.
    val df = TopK.perKey(graft.sources.Tables.part(spark, sf),
      Seq("p_partkey"), Seq("p_retailprice" -> false, "p_partkey" -> true),
      k = 2, maxKeysPerPartition = 10)
    val got = df.collect()
      .map(r => (r.getAs[Long]("p_partkey"), r.getAs[Long]("rank"))).sorted.toSeq
    // it really spilled (the degradation path, not the fast path)
    assert(TopKSpec.spills(df) > 0, "expected the 10-key budget to force spill runs")
    val w = Window.partitionBy("p_partkey")
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    val want = graft.sources.Tables.part(spark, sf)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 2).collect()
      .map(r => (r.getAs[Long]("p_partkey"), r.getAs[Long]("rank"))).sorted.toSeq
    assert(got == want)
  }

  test("optimizer rule rewrites the plain window formulation onto the native exec") {
    val s = spark.newSession()
    graft.plans.GraftOptimizations.install(s)
    val w = Window.partitionBy("p_brand")
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    def windowed(session: org.apache.spark.sql.SparkSession) =
      graft.sources.Tables.part(session, sf)
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
    val rewritten = windowed(s)
    val plan = rewritten.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan.take(2000))
    assert(!plan.contains("Window"), plan.take(2000))
    // an uninstalled session keeps the window plan
    val vanilla = windowed(spark)
    assert(vanilla.queryExecution.executedPlan.toString.contains("Window"))
    // identical results, schema preserved (rank stays the int the
    // window produced, same column name)
    assert(rewritten.schema == vanilla.schema)
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.select("p_brand", "p_partkey", "rank").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(asSet(rewritten) == asSet(vanilla))
  }

  test("optimizer rule matches Long bounds and the cast the analyzer inserts") {
    val s = spark.newSession()
    graft.plans.GraftOptimizations.install(s)
    val w = Window.partitionBy("p_brand")
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    // rn <= 3L compares int row_number to a bigint literal, so the
    // analyzer wraps rn in Cast(LongType) — the rule must see through it
    val rewritten = graft.sources.Tables.part(s, sf)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= lit(3L))
    val plan = rewritten.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan.take(2000))
    assert(!plan.contains("Window"), plan.take(2000))
    val vanilla = graft.sources.Tables.part(spark, sf)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= lit(3L))
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.select("p_brand", "p_partkey", "rank").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(asSet(rewritten) == asSet(vanilla))
  }

  test("optimizer rule matches the reversed literal-first predicate spellings") {
    val s = spark.newSession()
    graft.plans.GraftOptimizations.install(s)
    val w = Window.partitionBy("p_brand")
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    def windowed(session: org.apache.spark.sql.SparkSession) =
      graft.sources.Tables.part(session, sf)
        .withColumn("rank", row_number().over(w))
    // 4 > rank (strict, literal first) ≡ rank <= 3; 1 = rank ≡ rank = 1
    for ((pred, want) <- Seq(
        (lit(4) > col("rank"), windowed(spark).filter(col("rank") <= 3)),
        (lit(1) === col("rank"), windowed(spark).filter(col("rank") === 1)))) {
      val rewritten = windowed(s).filter(pred)
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerKey"), plan.take(2000))
      assert(!plan.contains("Window"), plan.take(2000))
      def asSet(df: org.apache.spark.sql.DataFrame) =
        df.select("p_brand", "p_partkey", "rank").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
      assert(asSet(rewritten) == asSet(want))
    }
  }

  test("optimizer rule leaves degenerate bounds alone (no Int underflow to k=MaxValue)") {
    val s = spark.newSession()
    graft.plans.GraftOptimizations.install(s)
    val w = Window.partitionBy("p_brand")
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    // rn < Int.MinValue is always false; v-1 wrapping would plan a
    // k=Int.MaxValue heap. The rule must not fire, and the result is empty.
    val df = graft.sources.Tables.part(s, sf)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") < lit(Int.MinValue))
    assert(!df.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    assert(df.count() == 0)
    // bounds past Int.MaxValue (trivially-true filter) also stay on the
    // window plan rather than overflowing the Int k
    val wide = graft.sources.Tables.part(s, sf)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= lit(Long.MaxValue))
    assert(!wide.queryExecution.executedPlan.toString.contains("TopKPerKey"))
  }

  test("re-install with a different bound replaces the rule (last call wins)") {
    val s = spark.newSession()
    graft.plans.GraftOptimizations.install(s, maxKeysPerPartition = 2)
    val w = Window.partitionBy("p_partkey").orderBy(col("p_retailprice").desc)
    def topk() = graft.sources.Tables.part(s, sf)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 1)
    // bound=2 must spill: p_partkey has far more than 2 keys/partition
    val tight = topk()
    tight.collect()
    assert(TopKSpec.spills(tight) > 0, "2-key budget should have forced spill runs")
    assert(tight.count() == graft.sources.Tables.part(s, sf).count())
    // re-install with a comfortable bound — previously silently
    // ignored; now the fast heap path with zero spills proves the
    // replacement took effect
    graft.plans.GraftOptimizations.install(s, maxKeysPerPartition = 1 << 20)
    val wide = topk()
    wide.collect()
    assert(TopKSpec.spills(wide) == 0, "1M-key budget should stay on the heap fast path")
    assert(wide.count() == graft.sources.Tables.part(s, sf).count())
  }

  test("optimizer rule leaves rank()/dense_rank() windows alone — tie semantics differ") {
    val s = spark.newSession()
    graft.plans.GraftOptimizations.install(s)
    // rank() can emit MORE than k rows per key under ties; rewriting it
    // onto row_number-semantics heaps would silently drop tied rows
    val w = Window.partitionBy("p_brand").orderBy(col("p_retailprice").desc)
    for (fn <- Seq(rank(), dense_rank())) {
      val df = graft.sources.Tables.part(s, sf)
        .withColumn("rank", fn.over(w))
        .filter(col("rank") <= 3)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("TopKPerKey"), plan.take(1500))
      assert(plan.contains("Window"), plan.take(1500))
    }
  }

  test("MinHashSig buffer algebra: split-and-merge equals one-shot update, serde roundtrips") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.LongType
    val agg = graft.functions.MinHashSig(BoundReference(0, LongType, nullable = true))
    val rnd = new scala.util.Random(42)
    val hashes = Array.fill(200)(rnd.nextLong().abs % (1L << 60))
    def updated(hs: Seq[Long]): Array[Long] =
      hs.foldLeft(agg.createAggregationBuffer()) { (b, h) =>
        agg.update(b, InternalRow(h))
      }
    val oneShot = updated(hashes.toSeq)
    val (l, r) = hashes.splitAt(73)
    // merge of partials == one pass over everything (the shuffle contract)
    val merged = agg.merge(updated(l.toSeq), updated(r.toSeq))
    assert(merged.sameElements(oneShot))
    // serde roundtrip is lossless (partial buffers cross the wire)
    assert(agg.deserialize(agg.serialize(oneShot)).sameElements(oneShot))
    // null inputs are ignored, not crashes
    val withNull = agg.update(updated(hashes.toSeq), InternalRow(null))
    assert(withNull.sameElements(oneShot))
    // every lane moved off the empty-buffer sentinel
    assert(oneShot.forall(_ != Long.MaxValue))
    // negative inputs (the function is registered for arbitrary
    // BIGINTs) still land every lane in [0, 2^31-1) via floorMod
    val negged = updated(Seq(-1L, Long.MinValue, -2147483647L))
    assert(negged.forall(x => x >= 0 && x < 2147483647L), negged.take(5).mkString(","))
  }

  test("topk survives arbitration-refusal spills mid-insert with zero row loss") {
    // The forced seam makes every 2nd reserve() behave as a refused
    // grant: the heaps flush to a run WHILE an insert holds a live
    // heap reference. The pre-fix code added that row to the orphaned
    // heap (neither in the map nor in the run) — rows silently
    // vanished exactly when executors were under memory pressure.
    // After the brand shuffle each partition holds one brand, and
    // reserves happen only for the first k kept rows, so every-2nd
    // guarantees the spill lands mid-insert on the heap-exists branch
    // (row 2 or 4 of an existing heap) in every partition.
    graft.plans.TopKPerKeyExec.testForceSpillEvery = 2
    try {
      val df = viaTopK(5)
      df.collect() // action on df itself so ITS plan's metrics populate
      assert(TopKSpec.spills(df) > 0, "the forced seam should have produced runs")
      val got = rows(df)
      val want = rows(viaWindow(5))
      assert(got == want,
        s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    } finally graft.plans.TopKPerKeyExec.testForceSpillEvery = 0
  }

  test("topk works for global top-k (no keys)") {
    val got = TopK.perKey(graft.sources.Tables.part(spark, sf),
      Seq.empty, Seq("p_retailprice" -> false, "p_partkey" -> true), 5)
      .collect()
    assert(got.length == 5)
    val prices = got.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("p_retailprice"))
    assert(prices.sameElements(prices.sortBy(-(_: Double))))
  }
}

object TopKSpec {
  /** total spilled-run count across every TopKPerKeyExec in the
    * (AQE-final) executed plan — run AFTER an action. */
  def spills(df: org.apache.spark.sql.DataFrame): Long = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def find(p: SparkPlan): Long = p match {
      case a: AdaptiveSparkPlanExec => find(a.executedPlan)
      case q: QueryStageExec => find(q.plan)
      case t: graft.plans.TopKPerKeyExec =>
        t.metrics("numSpilledRuns").value + t.children.map(find).sum
      case other => other.children.map(find).sum
    }
    find(df.queryExecution.executedPlan)
  }
}
