package graft
import org.apache.spark.sql.SparkSession
import scala.util.control.NonFatal

/** Benchmark main: runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR at local[cpus] and prints ONE JSON line.
  *
  * Methodology: each query runs three times; the reported steady
  * number is the MIN of the two post-warmup runs. The first run pays
  * one-off JVM/whole-stage-codegen compilation and broadcast warmup,
  * which a long-lived cluster amortizes to zero — and background JIT
  * compilation can still stall a single post-warmup run by seconds
  * (observed: a normally-0.7 s query reading 10 s once), so one
  * sample is not a stable steady-state estimator. Both timings are
  * emitted (queries = steady, cold_queries = first run).
  *
  * Each run drives the plan through a noop sink
  * (`format("noop")`), which materializes EVERY output column —
  * `count()` would let Catalyst prune all projections and time
  * projection-heavy queries as little more than scan+count.
  * Failed queries report -1 and are listed in `"failed"` so a
  * degraded run is distinguishable from a clean one.
  *
  * Contention robustness: a noisy-neighbor stall can inflate a query
  * 3-8x in a way even min-of-3 does not filter (observed: two queries
  * reported 3-8x their stable steady state in one round with zero
  * code change to either). Each run min-merges its steady numbers
  * into a per-SF baseline file (`BENCH_BASELINE_<sf>.json` next to
  * the working directory — per SF because a smaller dataset's steady
  * state would flag every larger-SF run; min-merge because contention
  * only ever inflates, so the best-ever steady state IS the
  * reference). Any query whose steady value exceeds 3x its baseline
  * is re-measured with two more samples and the min is reported; the
  * `outliers` field records every correction (first measurement,
  * final value, baseline), so a contaminated run self-identifies
  * instead of needing a reader to adjudicate against history.
  * Baselines are absolute times: on a substantially slower host most
  * of the suite would flag at once, so when more than max(5, 10%) of
  * queries flag, the gate stands down and reports the count in
  * `baseline_mismatch` instead of re-running everything.
  */
object Bench {

  private[graft] def baselineFile(sfDir: String, dir: java.io.File): java.io.File =
    new java.io.File(dir, s"BENCH_BASELINE_${new java.io.File(sfDir).getName}.json")

  /** best-known steady numbers for this SF from the baseline file. */
  private[graft] def prevSteady(sfDir: String,
      dir: java.io.File = new java.io.File(".")): Map[String, Double] =
    try {
      val f = baselineFile(sfDir, dir)
      if (!f.isFile) Map.empty
      else {
        val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(f)
        val q = node.get("queries")
        if (q == null) Map.empty
        else {
          import scala.jdk.CollectionConverters._
          q.properties().iterator().asScala
            .map(e => e.getKey -> e.getValue.asDouble(-1.0))
            .filter(_._2 > 0).toMap
        }
      }
    } catch { case NonFatal(_) => Map.empty }

  /** min-merge this run's steady numbers into the baseline file. */
  private[graft] def saveBaseline(sfDir: String, dir: java.io.File,
      steady: Map[String, Double]): Unit =
    try {
      val old = prevSteady(sfDir, dir)
      val merged = (old.keySet ++ steady.keySet).toSeq.sorted.flatMap { k =>
        val vs = Seq(old.get(k), steady.get(k)).flatten.filter(_ > 0)
        if (vs.isEmpty) None else Some(k -> vs.min)
      }
      val js = merged.map { case (k, v) => "\"" + k + "\":" + v }
        .mkString("{\"queries\":{", ",", "}}")
      java.nio.file.Files.writeString(baselineFile(sfDir, dir).toPath, js): Unit
    } catch { case NonFatal(_) => () }
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      } catch { case NonFatal(_) => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }
    val prev = prevSteady(sfDir)
    val firstPass = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val cold = once(fn)
      val warm0 = if (cold < 0) -1.0 else {
        // min of THREE post-warmup samples: on a contended host a
        // single noisy-neighbor stall can inflate two consecutive
        // samples (observed in a driver run: a locally-1.1 s query
        // reported 27 s as the min of two), so two samples are not a
        // stable steady-state estimator
        val xs = Seq(once(fn), once(fn), once(fn))
        if (xs.exists(_ < 0)) -1.0 else xs.min
      }
      (name, warm0, cold)
    }
    // Outlier gate (see class doc). The baseline holds ABSOLUTE times
    // from whatever machine last ran this SF: if a large share of the
    // suite flags at once, that is a slower host (or a global change),
    // not per-query contention — re-running everything would add ~40%
    // runtime and drown the signal, so the gate stands down and the
    // mismatch is reported instead.
    val flaggedNames = firstPass.collect {
      case (n, w, _) if w > 0 && prev.get(n).exists(b => w > 3 * b) => n
    }.toSet
    val gateActive = flaggedNames.nonEmpty &&
      flaggedNames.size <= math.max(5, firstPass.size / 10)
    val baselineMismatch = if (!gateActive) flaggedNames.size else 0
    val outliers = scala.collection.mutable.ArrayBuffer[(String, Double, Double, Double)]()
    val results = firstPass.map { case t @ (name, warm0, cold) =>
      if (gateActive && flaggedNames(name)) {
        val fn = SparkEntry.queries(name)
        val re = Seq(once(fn), once(fn)).filter(_ >= 0)
        val fin = if (re.isEmpty) warm0 else math.min(warm0, re.min)
        outliers += ((name, warm0, fin, prev(name)))
        (name, fin, cold)
      } else t
    }
    def js(xs: Seq[(String, Double)]): String =
      xs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val failed = results.filter(_._2 < 0).map(_._1)
    val total = results.map(_._2).filter(_ >= 0).sum
    val coldTotal = results.map(_._3).filter(_ >= 0).sum
    val failedJs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")

    // ---- scale trend: headline queries across every available SF ----
    // The 100×-scale claims rest on plan shape ("identical plan at any
    // sf"); this measures them: time vs data across the sf0.001 →
    // sf0.1 span (100× rows). A super-linear curve would expose a
    // hidden driver-side or quadratic cost. min-of-2 per point (the
    // main loop above already warmed each query's codegen).
    val trendNames = Seq("q1_pricing_summary", "q6_forecast_revenue",
      "q13_customer_distribution", "dedup_minhash_lsh", "ann_ivf_topk",
      "pipeline_token_budget")
    val parent = new java.io.File(sfDir).getAbsoluteFile.getParentFile
    val trendSfs = Seq("sf0.001", "sf0.01", "sf0.1")
      .map(n => n -> new java.io.File(parent, n))
      .filter(_._2.isDirectory)
    val trendJs = trendNames.filter(SparkEntry.queries.contains).map { name =>
      val fn = SparkEntry.queries(name)
      val points = trendSfs.map { case (sfName, f) =>
        def run(): Double = {
          val t0 = System.nanoTime()
          try fn(spark, f.getAbsolutePath).write.format("noop").mode("overwrite").save()
          catch { case NonFatal(_) => return -1.0 }
          (System.nanoTime() - t0) / 1e9
        }
        val a = run(); val b = if (a < 0) -1.0 else run()
        (sfName, if (b < 0) -1.0 else math.min(a, b))
      }
      "\"" + name + "\":" + js(points)
    }.mkString("{", ",", "}")

    // ---- encoding micro-bench (fle-benchmark.cc analog) ----
    val encJs =
      try {
        queries.EncodingLab.compare(spark, sfDir).map { v =>
          val cols = v.bytesByCol.toSeq.sortBy(_._1)
            .map { case (c, b) => "\"" + c + "_bytes\":" + b }
          ("\"" + v.name + "\":{" + (cols ++ Seq(
            "\"file_bytes\":" + v.fileBytes,
            "\"scan_sec\":" + v.scanSec)).mkString(",") + "}")
        }.mkString("{", ",", "}")
      } catch { case NonFatal(_) => "{}" }

    val outliersJs = outliers.map { case (n, first, fin, b) =>
      "\"" + n + "\":{\"first\":" + first + ",\"final\":" + fin + ",\"prev\":" + b + "}"
    }.mkString("{", ",", "}")
    saveBaseline(sfDir, new java.io.File("."),
      results.collect { case (n, w, _) if w > 0 => n -> w }.toMap)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":${js(results.map(r => (r._1, r._2)))},"cold_total":$coldTotal,"cold_queries":${js(results.map(r => (r._1, r._3)))},"failed":$failedJs,"outliers":$outliersJs,"baseline_mismatch":$baselineMismatch,"trend":$trendJs,"encodings":$encJs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
