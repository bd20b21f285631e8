package graft.operators

/** The repo-wide 60-bit md5 surrogate: first 15 hex chars of md5 as a
  * non-negative BIGINT. Load-bearing for oracle parity — DuckDB
  * replays it as `CAST(('0x'||substring(md5(x),1,15)) AS BIGINT)` —
  * so every Spark-side site must build the expression HERE; a fix in
  * one inlined copy would silently diverge the others (shingle
  * hashing, stratified sampling, the leakage split, and the bloom
  * lookup key all depend on it).
  */
object Hash60 {
  /** SQL fragment computing the surrogate of `s`, an md5-ready string
    * expression. */
  def sql(s: String): String =
    s"CAST(conv(substring(md5($s), 1, 15), 16, 10) AS BIGINT)"
}
