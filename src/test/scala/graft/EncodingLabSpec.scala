package graft

/** The fle-benchmark analog must show the encodings EARN their place:
  * on uncompressed data, v2 DELTA_BINARY_PACKED beats PLAIN for the
  * int64 key column, and dictionary beats PLAIN for the 3-value flag
  * column. Sizes come from the parquet footers, so the assertion is
  * deterministic; scan times are reported as info (timing assertions
  * on a shared host would flake). */
class EncodingLabSpec extends SparkSpec {

  test("delta beats plain for the key column; dict beats plain for low-NDV") {
    val byName = queries.EncodingLab.compare(spark, sf).map(v => v.name -> v).toMap
    val plain = byName("plain"); val dict = byName("dict"); val delta = byName("delta")
    for (v <- Seq(plain, dict, delta))
      info(f"${v.name}%-5s l_orderkey=${v.bytesByCol("l_orderkey")}%8d B  " +
        f"l_returnflag=${v.bytesByCol("l_returnflag")}%8d B  " +
        f"file=${v.fileBytes}%8d B  scan=${v.scanSec}%.3f s")
    // FLE analog: frame-of-reference bit-packing crushes a dense key
    assert(delta.bytesByCol("l_orderkey") < plain.bytesByCol("l_orderkey"),
      s"delta ${delta.bytesByCol("l_orderkey")} !< plain ${plain.bytesByCol("l_orderkey")}")
    // dictionary crushes a 3-value string column
    assert(dict.bytesByCol("l_returnflag") < plain.bytesByCol("l_returnflag"),
      s"dict ${dict.bytesByCol("l_returnflag")} !< plain ${plain.bytesByCol("l_returnflag")}")
    // and the l_orderkey dictionary overflow fell back rather than bloating
    assert(dict.bytesByCol("l_orderkey") <= plain.bytesByCol("l_orderkey") * 11 / 10,
      "dict-overflow fallback should not cost >10% over plain")
  }

  test("codec axis: zstd compresses the key column at least as tight as snappy") {
    val byName = queries.EncodingLab.compare(spark, sf).map(v => v.name -> v).toMap
    val dict = byName("dict"); val snappy = byName("dict_snappy"); val zstd = byName("dict_zstd")
    for (v <- Seq(dict, snappy, zstd))
      info(f"${v.name}%-11s l_orderkey=${v.bytesByCol("l_orderkey")}%8d B  " +
        f"file=${v.fileBytes}%8d B  scan=${v.scanSec}%.3f s")
    // the key column fell back to plain under dict, so the codec does
    // real work there; zstd's entropy stage beats snappy's LZ-only pass
    assert(zstd.bytesByCol("l_orderkey") <= snappy.bytesByCol("l_orderkey"),
      s"zstd ${zstd.bytesByCol("l_orderkey")} !<= snappy ${snappy.bytesByCol("l_orderkey")}")
    // and both compress vs the uncompressed dict baseline
    assert(snappy.bytesByCol("l_orderkey") < dict.bytesByCol("l_orderkey"))
    assert(zstd.fileBytes < dict.fileBytes)
  }
}
