package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.sources.Tables._

/** Skew mitigation for hot join keys.
  *
  * events.event_type has only 5 values, so a plain shuffle join on it
  * concentrates ~20% of the fact table on each of 5 reducers no
  * matter how many partitions the cluster has — the canonical skew
  * failure at 100 TB (one straggler task holds the stage). The
  * reference faces the same problem as a single-node engine only at
  * its exchange boundaries; in Spark the standard fixes are
  * (a) broadcast the dim (done wherever the dim fits — but a salted
  * shuffle is the fallback when BOTH sides are too big), (b) AQE
  * skew-join splits, (c) explicit salting. This operator demonstrates
  * (c), the technique that works even when AQE's per-partition stats
  * miss (e.g. a single giant key inside one partition):
  *
  * - fact side: a deterministic salt `pmod(xxhash64(event_id), 16)`
  *   splits every hot key into 16 sub-keys;
  * - dim side: exploded 16× (dim rows are cheap to replicate);
  * - join key: (event_type, salt) — each hot key now spreads over 16
  *   reducers, and the post-join aggregate re-combines partials, so
  *   the salt never changes the result.
  *
  * The oracle computes the same join + aggregate unsalted: salting
  * must be invisible in the output. SkewSpec asserts the shuffle
  * actually partitions on (event_type, salt).
  */
object SkewJoin {
  private val D = DecimalType(18, 2)
  val NumSalts = 16

  /** dim: per-type label — derivable in both engines. */
  private def typeDim(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).select("event_type").distinct()
      .withColumn("type_label", upper(col("event_type")))

  def saltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val fact = events(spark, dir)
      .withColumn("salt", pmod(xxhash64(col("event_id")), lit(NumSalts)))
    val dim = typeDim(spark, dir)
      .withColumn("salt", explode(sequence(lit(0), lit(NumSalts - 1))))
      // hint the shuffle join: the demo is the salted exchange, and a
      // broadcast of the exploded dim would skip it
      .hint("shuffle_hash")
    fact.join(dim, Seq("event_type", "salt"))
      .groupBy("event_type", "type_label")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(D)).cast("double").as("sum_value"))
      .orderBy("event_type")
  }
}
