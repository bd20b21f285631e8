package graft

import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("salted join result is identical to the plain unsalted join") {
    val got = queries.SkewJoin.saltedJoin(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val ev = graft.sources.Tables.events(spark, sf)
    val plain = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(18,2)")).cast("double").as("s"))
      .collect()
      .map(r => (r.getString(0), r.getString(0).toUpperCase, r.getLong(1), r.getDouble(2))).toSet
    assert(got == plain)
  }

  test("AQE coalesces near-empty shuffle partitions at runtime") {
    // a tiny aggregate leaves most of the configured reducers empty;
    // AQE's runtime coalesce merges them — at cluster scale this is
    // what keeps low-volume stages from scheduling thousands of
    // no-op tasks (and sinks from writing thousands of tiny files)
    val df = graft.sources.Tables.nation(spark, sf).groupBy("n_regionkey").count()
    df.collect() // run so the adaptive plan is final
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AQEShuffleReadExec, AdaptiveSparkPlanExec, QueryStageExec}
    val adaptive = df.queryExecution.executedPlan.collectFirst {
      case a: AdaptiveSparkPlanExec => a
    }.getOrElse(fail("no adaptive plan"))
    // query stages are collect-leaves; descend into their plans
    def shuffleReads(p: SparkPlan): Seq[AQEShuffleReadExec] =
      p.collect {
        case r: AQEShuffleReadExec => Seq(r)
        case q: QueryStageExec => shuffleReads(q.plan)
      }.flatten
    val reads = shuffleReads(adaptive.executedPlan)
    assert(reads.nonEmpty, adaptive.executedPlan.toString.take(2000))
    // the REAL assertion: the runtime read must coalesce the
    // configured reducers down to fewer partitions (a plan-string
    // match on isFinalPlan=true is vacuously true for any executed
    // adaptive plan)
    val configured = spark.conf.get("spark.sql.shuffle.partitions").toInt
    assert(reads.head.partitionSpecs.size < configured,
      s"AQEShuffleRead kept ${reads.head.partitionSpecs.size} of $configured partitions")
  }

  test("salted join shuffles on (event_type, salt), spreading each hot key") {
    val plan = queries.SkewJoin.saltedJoin(spark, sf).queryExecution.executedPlan.toString
    // the pre-join exchange must hash-partition on both join keys
    val exchangeLines = plan.linesIterator.filter(_.contains("hashpartitioning")).toSeq
    assert(exchangeLines.exists(l => l.contains("event_type") && l.contains("salt")),
      exchangeLines.mkString("\n"))
    // and it must be a real shuffle join, not a broadcast of the dim
    assert(plan.contains("ShuffledHashJoin") || plan.contains("SortMergeJoin"), plan.take(2000))
  }

  test("AQE splits a skewed join partition at runtime (skew join)") {
    // 90% of the fact lands on one key. Skew splitting subdivides the
    // giant reduce partition by MAP-OUTPUT ranges, so the map side
    // must genuinely be parallel (8 range partitions here — a
    // single-file scan has one map task and nothing to split by,
    // which silently disables the rule; found the hard way). With
    // thresholds lowered to test scale, AQE must mark the join skewed
    // — the runtime counterpart of the explicit salting above.
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
    import s.implicits._
    val fact = s.range(0, 100000, 1, 8)
      .select(expr("CASE WHEN id % 10 < 9 THEN 0L ELSE id % 10 END").as("k"),
        col("id").as("v"))
    val dim = s.range(0, 10, 1, 2).select(col("id").as("k"), (col("id") * 100).as("w"))
    val j = fact.join(dim, "k").agg(count(lit(1)).as("n"), sum("v").as("sv"))
    val rows = j.collect()
    assert(rows.nonEmpty && rows(0).getAs[Long]("n") == 100000L)
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true") || plan.contains("isSkewJoin=true"),
      plan.take(3000))
  }
}
