package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The broker-shaped SOURCE SEAM: everything downstream of a feed —
  * watermarking, exactly-once dedup, windowed state, the sinks — is
  * written against this one-method trait, so the transport is the
  * ONLY thing a deployment swaps.
  *
  * Contract: `stream` returns an unbounded (or bounded-replay)
  * streaming DataFrame of event rows carrying the repo-wide
  * epoch-ns `ts` column and its micro-precision `ts_ts` event-time
  * twin (the watermark column). Delivery is AT-LEAST-ONCE and
  * arrival order is NOT event order — implementations are expected
  * to exhibit redelivery and out-of-order arrival, because the
  * consumers' correctness (dropDuplicatesWithinWatermark tiling the
  * time axis with the late filter) is proven against exactly those
  * pathologies (stream_chaos_replay).
  *
  * Shipping implementation: [[graft.streaming.StreamQueries]]'s
  * chaos file feed — a staged multi-batch landing directory where
  * each file is one micro-batch arriving in mtime order. A real
  * deployment drops in a broker reader by replacing one stanza:
  *
  * {{{
  * final class KafkaFeed(bootstrap: String, topic: String) extends EventFeed {
  *   def stream(spark: SparkSession): DataFrame =
  *     spark.readStream.format("kafka")
  *       .option("kafka.bootstrap.servers", bootstrap)
  *       .option("subscribe", topic)
  *       .load()
  *       .select(from_json(col("value").cast("string"), EventSchema).as("e"))
  *       .select(col("e.*"))
  *       .withColumn("ts_ts", expr("timestamp_micros(ts div 1000)"))
  * }
  * }}}
  *
  * No broker ships in this sandbox, so the Kafka form is documented
  * rather than compiled; every semantic the swap relies on
  * (redelivery, disorder, watermark eviction) is exercised by the
  * file feed against the DuckDB oracle.
  */
trait EventFeed {
  def stream(spark: SparkSession): DataFrame
}
