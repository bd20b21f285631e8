package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Tables._

/** Encoding micro-benchmark — the Spark analog of the reference's
  * encode/decode benchmarks (/root/reference/fle-benchmark.cc:1,
  * /root/reference/encoding-benchmark.cc:1), which measure its
  * fixed-length bit-packed (FLE) and dictionary encoders against
  * plain. Here the writer variants are parquet encoding choices and
  * the measurement is what actually matters to a table engine: bytes
  * on disk per column (from the footers' column-chunk metadata) and
  * wall time to scan-and-decode back (via a full-column aggregate).
  *
  * The three encoding variants write UNCOMPRESSED — general-purpose
  * compression on top would smear the encoding signal (snappy over
  * PLAIN recovers much of what the encoding saves, at decode-CPU
  * cost the reference's benchmarks are precisely about avoiding).
  *
  * Variants over (l_orderkey BIGINT monotone-ish key, l_returnflag
  * 3-value string):
  *  - plain: v1 writer, dictionary off → PLAIN for both columns.
  *  - dict:  v1 writer, dictionary on → RLE_DICTIONARY where the
  *    dictionary fits (l_returnflag; l_orderkey overflows the page
  *    dictionary and falls back to plain — the same fallback the
  *    reference's DictEncoderBase implements).
  *  - delta: v2 writer, dictionary off → DELTA_BINARY_PACKED for the
  *    key (the FLE analog: values bit-packed against a per-block
  *    frame of reference) and DELTA_BYTE_ARRAY for the string.
  *
  * The codec axis (the reference writer picks per-column encodings
  * under a compressed-size objective — hdfs-parquet-table-writer.cc)
  * then crosses the best encoding config with the two codecs every
  * warehouse actually deploys:
  *  - dict_snappy / dict_zstd: the dict variant + page compression.
  *    zstd compresses tighter than snappy at higher decode cost —
  *    the size/CPU trade the scan times surface.
  */
object EncodingLab {

  /** bytes per column + total file bytes + steady scan seconds for
    * one written encoding variant. */
  final case class Variant(
      name: String,
      bytesByCol: Map[String, Long],
      fileBytes: Long,
      scanSec: Double)

  def compare(spark: SparkSession, dir: String): Seq[Variant] = {
    val src = lineitem(spark, dir).select("l_orderkey", "l_returnflag")
    val variants = Seq(
      ("plain", "v1", "false", "uncompressed"),
      ("dict", "v1", "true", "uncompressed"),
      ("delta", "v2", "false", "uncompressed"),
      ("dict_snappy", "v1", "true", "snappy"),
      ("dict_zstd", "v1", "true", "zstd"))
    variants.map { case (name, version, dict, codec) =>
      val path = SourcesSinks.tmp(spark, dir, s"enclab_$name")
      src.write.mode("overwrite")
        .option("compression", codec)
        .option("parquet.writer.version", version)
        .option("parquet.enable.dictionary", dict)
        .parquet(path)
      val files = new java.io.File(path).listFiles()
        .filter(_.getName.endsWith(".parquet"))
      val byCol = files.map(columnBytes).reduce { (a, b) =>
        (a.keySet ++ b.keySet).map(k =>
          k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
      }
      // scan-and-decode both columns end to end; min of two runs
      // (first pays file-open/footers, both pay full decode)
      def scanOnce(): Double = {
        val t0 = System.nanoTime()
        spark.read.parquet(path)
          .agg(sum("l_orderkey"), max("l_returnflag"), count(lit(1)))
          .collect(): Unit
        (System.nanoTime() - t0) / 1e9
      }
      Variant(name, byCol, files.map(_.length).sum, math.min(scanOnce(), scanOnce()))
    }
  }

  /** per-column on-disk bytes from the parquet footer (sum of
    * column-chunk compressed sizes over all row groups). */
  private def columnBytes(f: java.io.File): Map[String, Long] = {
    import org.apache.hadoop.conf.Configuration
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(f.getAbsolutePath), new Configuration()))
    try {
      reader.getFooter.getBlocks.asScala
        .flatMap(_.getColumns.asScala)
        .groupBy(_.getPath.toDotString)
        .map { case (c, chunks) => c -> chunks.map(_.getTotalSize).sum }
    } finally reader.close()
  }
}
