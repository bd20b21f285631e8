package graft.dev

import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/** dev-only: inspect the dict-filter layout (row-group stats,
  * encodings) and measure skipping with the dictionary row-group
  * filter explicitly toggled. */
object DictProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val path = graft.queries.SourcesSinks.dictFilterWrite(spark, sf, "li_dictprobe", dict = true)

    import org.apache.hadoop.conf.Configuration
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    def parquetFiles(d: java.io.File): Seq[java.io.File] = {
      val kids = Option(d.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
      kids.filter(_.isDirectory).flatMap(parquetFiles) ++
        kids.filter(_.getName.endsWith(".parquet"))
    }
    parquetFiles(new java.io.File(path)).foreach { f =>
      val r = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(f.getAbsolutePath), new Configuration()))
      try {
        r.getFooter.getBlocks.asScala.zipWithIndex.foreach { case (b, i) =>
          val c = b.getColumns.asScala.find(_.getPath.toDotString == "dict_tag").get
          println(s"[probe] ${f.getName.take(10)} rg$i rows=${b.getRowCount} " +
            s"enc=${c.getEncodings.asScala.mkString("+")} " +
            s"stats=${c.getStatistics} dictOff=${c.getDictionaryPageOffset}")
        }
      } finally r.close()
    }
    def rows(conf: (String, String)*): Long = {
      conf.foreach { case (k, v) => spark.sparkContext.hadoopConfiguration.set(k, v) }
      val df = graft.queries.SourcesSinks.dictFilterRead(spark, path)
      SkipProbe.scanRows(df)
    }
    println("[probe] default: " + rows())
    println("[probe] dict-on : " + rows("parquet.filter.dictionary.enabled" -> "true"))
    println("[probe] stats-off dict-on: " + rows(
      "parquet.filter.stats.enabled" -> "false",
      "parquet.filter.dictionary.enabled" -> "true"))
    spark.stop()
  }
}
