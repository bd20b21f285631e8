package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DateType}
import graft.sources.Tables._

/** Scalar expression surface.
  *
  * The reference implements scalar functions behind a typed
  * Get*Val interface with LLVM codegen
  * (/root/reference/expr.h:36-60, scalar-fn-call.h, plus the SSE
  * string compare in string-value.inline.h and CRC/FNV hashing in
  * hash-util.h). The Spark analog: `org.apache.spark.sql.functions`
  * built-ins, which Catalyst folds into whole-stage-codegen'd Java —
  * no UDFs anywhere here, so every expression below stays inside the
  * generated loop.
  */
object Exprs {
  private val D = DecimalType(18, 2)

  /** Exact-DECIMAL arithmetic surface — the fixed-point type-system
    * contract every money pipeline relies on (the reference's
    * DecimalVal leg of expr.h:36-60): product scale composition,
    * HALF_UP rounding at positive and negative digits, floor/ceil,
    * and fixed-scale string rendering. Everything here is exact by
    * construction (2-decimal inputs), so the oracle comparison is
    * bitwise; division lives in its own row ([[decimalDiv]]) because
    * decimal division SCALE rules are engine-specific (Spark pads to
    * 6+ fraction digits; this DuckDB returns DOUBLE) — that row pins
    * Spark's semantics against an integer replay instead. */
  def decimalArith(spark: SparkSession, dir: String): DataFrame =
    // sort FIRST on the narrow key columns, derive the decimal/string
    // payload AFTER the Sort (r15, guide §2.3/§2.4): the range
    // exchange's sampling pass re-executes the map-side pipeline, so a
    // payload computed below the Exchange is paid twice — and rides the
    // wire. Project-above-Sort computes it once, post-shuffle, and the
    // exchange carries 4 narrow input columns instead of rendered
    // strings. Identical rows in the identical total order (Project
    // preserves Sort order).
    lineitem(spark, dir).select(
      col("l_orderkey"), col("l_linenumber"),
      col("l_extendedprice").cast(D).as("p"),
      col("l_quantity").cast(DecimalType(9, 2)).as("q"))
      .orderBy("l_orderkey", "l_linenumber")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        col("p").cast("string").as("p_str"),
        // (18,2) × (9,2) → scale-4 product, rendered at fixed scale
        (col("p") * col("q")).cast(DecimalType(38, 4)).cast("string")
          .as("prod_str"),
        round(col("p"), 1).cast("string").as("round1_str"),
        round(col("p"), -2).cast("bigint").as("round_hundreds"),
        floor(col("p")).cast("bigint").as("fl"),
        ceil(col("p")).cast("bigint").as("ce"))

  /** Decimal DIVISION contract — the corner [[decimalArith]]
    * documents by omission, closed: Spark's division result scale is
    * max(6, s1 + p2 + 1), so a (18,2) dividend over a (3,0) divisor
    * lands EXACTLY at scale 6 — ONE half-up rounding of the exact
    * rational quotient, no double rounding — and the widening cast
    * to the declared DECIMAL(38,6) is value-preserving. try_divide
    * carries the ÷0 lane: quantity−1 is zero on every qty-1 line,
    * which degrades to NULL instead of aborting the stage (the ANSI
    * TRY family of expr_try_arith applied to fixed-point). DuckDB's
    * own decimal division returns DOUBLE (the dialect divergence
    * that motivated the omission), so the oracle replays the SAME
    * contract in pure integers: half-up(n/d) = (2n + d) DIV 2d on
    * the micro-unit numerator — bitwise-equal fixed-scale strings.
    * Inputs exact 2-decimal, quantities ≤ 50 → every intermediate
    * fits BIGINT on the oracle side and DECIMAL(22,6) here. */
  def decimalDiv(spark: SparkSession, dir: String): DataFrame =
    // sort-first / project-after, same reasoning as [[decimalArith]]:
    // the two divisions and their string renders run once, above the
    // range exchange, instead of twice below it.
    lineitem(spark, dir).select(
      col("l_orderkey"), col("l_linenumber"),
      col("l_extendedprice").cast(D).as("p"),
      col("l_quantity").cast(DecimalType(3, 0)).as("q"))
      .orderBy("l_orderkey", "l_linenumber")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        // (18,2) / (3,0) → DECIMAL(22,6), single half-up at scale 6
        expr("CAST(try_divide(p, q) AS DECIMAL(38,6))").cast("string")
          .as("unit_price_str"),
        // ÷0 lane: qty−1 is 0 on qty-1 lines → NULL, never an error
        expr("CAST(try_divide(p, CAST(q - 1 AS DECIMAL(3,0))) AS DECIMAL(38,6))")
          .cast("string").as("unit_price_m1_str"))

  /** String kernel: substr/upper/lower/concat/length/LIKE. */
  def stringFuncs(spark: SparkSession, dir: String): DataFrame =
    part(spark, dir).select(
      col("p_partkey"),
      upper(col("p_name")).as("name_upper"),
      lower(col("p_brand")).as("brand_lower"),
      substring(col("p_type"), 1, 3).as("type_prefix"),
      concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
      length(col("p_name")).cast("bigint").as("name_len"),
      col("p_type").like("%O%").as("has_o"),
      trim(col("p_name")).as("name_trim"))
      .orderBy("p_partkey")

  /** Second string-kernel row: pad / translate / repeat / reverse /
    * left / right — the fixed-width formatting and char-mapping
    * surface (scalar-fn-call.cc's string builtins beyond
    * expr_string_funcs' slice/case family). All codegen'd built-ins
    * with byte-identical semantics on both engines. */
  def stringKernel2(spark: SparkSession, dir: String): DataFrame =
    part(spark, dir).select(
      col("p_partkey"),
      lpad(col("p_brand"), 12, ".").as("brand_lpad"),
      rpad(col("p_brand"), 12, "_").as("brand_rpad"),
      translate(col("p_type"), "aeiou", "AEIOU").as("type_vowels"),
      reverse(col("p_name")).as("name_rev"),
      expr("repeat(p_brand, 2)").as("brand_x2"),
      expr("left(p_type, 5)").as("type_left5"),
      expr("right(p_type, 4)").as("type_right4"))
      .orderBy("p_partkey")

  /** Arithmetic + CASE WHEN + cast + floor/ceil. */
  def mathCase(spark: SparkSession, dir: String): DataFrame =
    // NOTE (r15): the sort-first / project-after rewrite (see
    // decimalArith) does NOT hold here — every derived column is a
    // collapsible single-reference expression, so CollapseProject
    // merges the payload back below the Sort whatever the source
    // shape; the original form is kept (measured: plan fingerprint
    // identical under both spellings).
    lineitem(spark, dir).select(
      col("l_orderkey"), col("l_linenumber"),
      (col("l_quantity").cast(D) * col("l_extendedprice").cast(D))
        .cast("double").as("gross"),
      when(col("l_discount") > 0.05, "HIGH")
        .when(col("l_discount") === 0.0, "ZERO")
        .otherwise("LOW").as("disc_band"),
      floor(col("l_extendedprice")).cast("bigint").as("price_floor"),
      ceil(col("l_discount") * 100).cast("bigint").as("disc_pct_ceil"),
      col("l_quantity").cast("int").as("qty_int"),
      (-col("l_tax")).as("neg_tax"),
      abs(col("l_extendedprice") - col("l_quantity")).as("abs_diff"))
      .orderBy("l_orderkey", "l_linenumber")

  /** Date/time kernel on order dates. */
  def dateFuncs(spark: SparkSession, dir: String): DataFrame =
    orders(spark, dir).select(
      col("o_orderkey"),
      // bigint at the contract boundary: DuckDB's year()/month()/… are
      // BIGINT, Spark's are INT — cast so the oracle schema matches.
      year(col("o_orderdate")).cast("bigint").as("o_year"),
      month(col("o_orderdate")).cast("bigint").as("o_month"),
      dayofmonth(col("o_orderdate")).cast("bigint").as("o_day"),
      quarter(col("o_orderdate")).cast("bigint").as("o_quarter"),
      date_trunc("month", col("o_orderdate")).cast(DateType).as("month_start"),
      datediff(lit(java.sql.Date.valueOf("2000-01-01")),
        col("o_orderdate").cast(DateType)).cast("bigint").as("days_to_2000"))
      .orderBy("o_orderkey")

  /** String-date parsing — the direction every text ingest needs:
    * dates arrive as formatted strings and must parse back into
    * typed DATE (to_date with an explicit pattern — inference-free,
    * like every schema decision at scale), then feed date arithmetic.
    * Roundtrips through 'yyyyMMdd' so the parse is value-exact;
    * weekday bridges the engines' offset conventions (Spark
    * dayofweek is 1=Sunday, DuckDB's is 0=Sunday — the oracle
    * shifts). */
  def dateParse(spark: SparkSession, dir: String): DataFrame =
    // sort-first / project-after (see decimalArith): format+parse run
    // once above the range exchange
    orders(spark, dir)
      .select("o_orderkey", "o_orderdate")
      .orderBy("o_orderkey")
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyyMMdd").as("ymd"))
      .withColumn("parsed", to_date(col("ymd"), "yyyyMMdd"))
      .withColumn("epoch_day", unix_date(col("parsed")).cast("bigint"))
      .withColumn("weekday", dayofweek(col("parsed")).cast("bigint"))

  /** Content digests — the hash-util.h analog (md5 / sha256 are
    * engine-portable, unlike CRC32c/FNV). */
  def hashDigest(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir).select(
      col("doc_id"),
      md5(col("text").cast("binary")).as("digest_md5"),
      sha2(col("text").cast("binary"), 256).as("digest_sha256"))
      .orderBy("doc_id")

  /** CRC-family hashes — the hash-util.h:1 CRC32/FNV surface mapped
    * to Spark's codegen'd crc32/xxhash64 built-ins. DuckDB has no
    * counterpart hash, so the oracle is the standard known-answer
    * check every hash implementation ships: the published
    * CRC-32/ISO-HDLC check vectors (crc32("123456789") = 0xCBF43926,
    * crc32("") = 0, the RFC 1321 test-suite strings) plus the
    * deterministic XXH64(seed=42) values of the same inputs — pinned
    * constants reproducible by any independent xxHash implementation.
    * The DATA-dependent surface rides in ExprSpec, which asserts
    * `crcAgg` over the documents corpus is IDENTICAL across
    * adversarial repartitionings — the aggregates are order-free
    * folds (xor / sum / min / max), a pure function of the row SET,
    * never of partition layout or arrival order. */
  def hashCrc(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Seq("", "a", "abc", "message digest", "123456789",
      "The quick brown fox jumps over the lazy dog")
      .toDF("input")
      .select(col("input"),
        length(col("input")).cast("bigint").as("n_chars"),
        crc32(col("input").cast("binary")).as("crc32"),
        xxhash64(col("input")).as("xxh64_seed42"))
      .orderBy("input")
  }

  /** the agg body, parameterized on the input relation so ExprSpec
    * can feed adversarially-repartitioned copies of the same rows. */
  private[graft] def crcAgg(docs: DataFrame): DataFrame =
    docs.select(crc32(col("text").cast("binary")).as("c"),
        xxhash64(col("text")).as("x"))
      .agg(
        count(lit(1)).as("n_rows"),
        bit_xor(col("c")).as("crc_xor"),
        sum(col("c")).as("crc_sum"),
        min(col("c")).as("crc_min"),
        max(col("c")).as("crc_max"),
        bit_xor(col("x")).as("xx_xor"),
        min(col("x")).as("xx_min"),
        max(col("x")).as("xx_max"))

  /** NULL semantics: nullif/coalesce/null-safe equality. */
  def nullSemantics(spark: SparkSession, dir: String): DataFrame =
    // sort-first / project-after (see decimalArith)
    lineitem(spark, dir)
      .select("l_orderkey", "l_linenumber", "l_discount", "l_tax")
      .orderBy("l_orderkey", "l_linenumber")
      .select(
      col("l_orderkey"), col("l_linenumber"),
      nullif(col("l_discount"), lit(0.0)).as("disc_or_null"),
      coalesce(nullif(col("l_discount"), lit(0.0)), lit(-1.0)).as("disc_coalesced"),
      (col("l_discount") <=> lit(0.0)).as("is_zero_nullsafe"),
      isnull(nullif(col("l_tax"), lit(0.0))).as("tax_is_zero"))

  /** Nested-type surface: arrays as first-class scan columns —
    * length, element access (front/back), and order-free element
    * extremes, all reduced to scalar outputs. float→double casts
    * happen after the exact min/max selection, so both engines pick
    * the same element. */
  def arrayOps(spark: SparkSession, dir: String): DataFrame =
    embeddings(spark, dir).select(
      col("vec_id"),
      size(col("embedding")).cast("bigint").as("n_dims"),
      element_at(col("embedding"), 1).cast("double").as("first_dim"),
      element_at(col("embedding"), -1).cast("double").as("last_dim"),
      array_min(col("embedding")).cast("double").as("min_dim"),
      array_max(col("embedding")).cast("double").as("max_dim"))
      .orderBy("vec_id")

  /** URL parsing kernel — the log/crawl-ingest surface (every
    * clickstream or crawl corpus stores URLs; the reference evaluates
    * string kernels like this inside the scan via scalar-fn-call.cc).
    * The URL is assembled from table columns, so every parsed
    * component has an independent ground truth the oracle states
    * directly from those columns — parse_url's HOST/PATH/QUERY/REF/
    * PROTOCOL extraction and per-key query lookup are each pinned
    * value-exact. Pure codegen'd projection; scales embarrassingly. */
  def urlParse(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .withColumn("url",
        concat(lit("https://"), col("source"), lit(".example.com/"),
          col("lang"), lit("/doc/"), col("doc_id"),
          lit("?id="), col("doc_id"), lit("&lang="), col("lang"),
          lit("#s"), pmod(col("doc_id"), lit(7L))))
      .select(
        col("doc_id"),
        parse_url(col("url"), lit("PROTOCOL")).as("proto"),
        parse_url(col("url"), lit("HOST")).as("host"),
        parse_url(col("url"), lit("PATH")).as("path"),
        parse_url(col("url"), lit("QUERY")).as("query"),
        parse_url(col("url"), lit("QUERY"), lit("lang")).as("q_lang"),
        parse_url(col("url"), lit("REF")).as("fragment"))
      .orderBy("doc_id")

  /** Map-type kernel — maps as first-class values (the complex-type
    * surface next to arrayOps): per brand, a type→count map is
    * BUILT (map_from_entries over sort-canonicalized entries, so the
    * map's layout is a pure function of the group's row set), then
    * PROBED (try_element_at — ANSI-safe missing-key null), ITERATED
    * (map_keys re-joined to a string), and FOLDED (aggregate over
    * map_values). Output stays scalar columns, so the contract is
    * engine-portable even though DuckDB's map internals differ.
    * Scale shape: one hash agg to entries, one to groups; map sizes
    * are bounded by the type NDV (6), never by row count. */
  def mapOps(spark: SparkSession, dir: String): DataFrame =
    part(spark, dir)
      .groupBy("p_brand", "p_type")
      .agg(count(lit(1)).as("n"))
      .groupBy("p_brand")
      .agg(map_from_entries(array_sort(collect_list(
        struct(col("p_type"), col("n"))))).as("m"))
      .select(
        col("p_brand"),
        size(col("m")).cast("bigint").as("n_types"),
        coalesce(try_element_at(col("m"), lit("PROMO")), lit(0L)).as("n_promo"),
        array_join(map_keys(col("m")), "|").as("types"),
        expr("aggregate(map_values(m), 0L, (a, x) -> a + x)").as("n_parts"))
      .orderBy("p_brand")

  /** Map higher-order functions — [[higherOrder]]'s twin for the MAP
    * type ([[mapOps]] covers construction/probing; this row covers
    * the lambda surface): transform_values (rescale every value
    * in-place), map_filter (threshold pruning), and map_zip_with
    * (combine two maps key-wise — the merge a per-key metrics join
    * would otherwise need an explode + full-outer join for). Maps
    * have no canonical entry order, so every map-valued result is
    * serialized through sorted entries before comparison — the same
    * canonicalization discipline as [[mapOps]]; scalar outputs
    * (sizes, folded sums) are order-free by construction. */
  def mapHof(spark: SparkSession, dir: String): DataFrame = {
    val perBrand = part(spark, dir)
      .groupBy("p_brand", "p_type").agg(count(lit(1)).as("n"))
      .groupBy("p_brand")
      .agg(map_from_entries(array_sort(collect_list(
        struct(col("p_type"), col("n"))))).as("m"))
    perBrand.select(
      col("p_brand"),
      // transform_values: counts → per-mille of the brand total
      expr("""array_join(transform(array_sort(map_entries(
          transform_values(m, (k, v) -> v * 1000L div
            aggregate(map_values(m), 0L, (a, x) -> a + x)))),
          e -> concat(e.key, ':', e.value)), '|')""").as("permille_csv"),
      // map_filter: keep types with at least 4 parts
      size(expr("map_filter(m, (k, v) -> v >= 4)")).cast("bigint")
        .as("n_major_types"),
      // map_zip_with: symmetric difference mass vs the PROMO-only map
      expr("""aggregate(map_values(map_zip_with(m,
          map_filter(m, (k, v) -> startswith(k, 'PROMO')),
          (k, a, b) -> coalesce(a, 0L) - coalesce(b, 0L))),
          0L, (acc, x) -> acc + x)""").as("non_promo_mass"))
      .orderBy("p_brand")
  }

  /** Bitwise kernel (bit-util.h analog): shifts, masks, popcount,
    * and the bit_and/or/xor aggregates — all codegen built-ins. */
  def bitwise(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        expr("bit_and(l_orderkey)").as("and_okey"),
        expr("bit_or(l_orderkey)").as("or_okey"),
        expr("bit_xor(l_orderkey)").as("xor_okey"),
        sum(expr("CAST(bit_count(l_orderkey & 255) AS BIGINT)")).as("sum_pop_low"),
        sum(expr("CAST(shiftleft(l_linenumber, 2) AS BIGINT)")).as("sum_shl"))
      .orderBy("l_returnflag")

  /** Date INTERVAL arithmetic kernel (the dialect surface next to
    * [[dateFuncs]]' extraction fns): month-clamped add_months (Jan 31
    * + 1 month = Feb 28 — both engines clamp), day arithmetic,
    * last_day, quarter, and day-of-week (Spark counts 1=Sunday,
    * DuckDB 0=Sunday — normalized to the 0-based form). Computed over
    * the DISTINCT order-date domain, so the relation is
    * calendar-bounded, not fact-bounded. */
  def dateInterval(spark: SparkSession, dir: String): DataFrame =
    orders(spark, dir)
      .select(to_date(col("o_orderdate")).as("d")).distinct()
      .select(col("d"),
        add_months(col("d"), 3).as("plus_3m"),
        date_add(col("d"), 30).as("plus_30d"),
        last_day(col("d")).as("month_end"),
        quarter(col("d")).cast("bigint").as("qtr"),
        (dayofweek(col("d")) - 1).cast("bigint").as("dow"))
      .orderBy("d")

  /** Array SET-operation kernel: intersect / union / except between a
    * row's word array and a fixed probe set, sort-canonicalized on
    * both engines (set ops are order-unspecified by SQL, so the
    * contract pins the SET, not the layout). Per-row arrays are
    * bounded by the p_type word count — collection expressions, not
    * corpus-scale HOFs. */
  def arraySetOps(spark: SparkSession, dir: String): DataFrame = {
    val fixed = array(lit("tin"), lit("steel"), lit("brass"))
    part(spark, dir)
      .withColumn("words", split(lower(col("p_type")), " "))
      .select(col("p_partkey"),
        size(col("words")).cast("bigint").as("n_words"),
        array_join(array_sort(array_intersect(col("words"), fixed)), "|").as("inter"),
        array_join(array_sort(array_distinct(concat(col("words"), fixed))), "|").as("uni"),
        array_join(array_sort(array_except(col("words"), fixed)), "|").as("exc"))
      .orderBy("p_partkey")
  }

  /** ANSI-safe TRY arithmetic family (try_add / try_subtract /
    * try_multiply / try_divide): overflow and division-by-zero
    * degrade to NULL instead of killing the job — the contract a
    * 100 TB pipeline needs when a planted poison row must not abort a
    * million-task stage (the engine-level twin of src_json_corrupt's
    * quarantine). Each family gets a data-dependent boundary so both
    * outcomes occur in the same scan — but the overflow outcome is
    * kept a ~1-2% TAIL by a modulus on the operand, which is the
    * measured scale constraint, not a convenience: Spark implements
    * try_add/subtract/multiply as the ANSI op under a per-row
    * exception catch, so a scan where overflow is the COMMON case
    * executes millions of throw/catch pairs — measured 34 s at
    * sf0.1 when most rows overflowed vs 1.6 s with the tail shape
    * (residual = the per-row try/catch discipline itself). TRY is the right contract for rare poison rows; an
    * overflow-heavy domain must use the branchless guard rewrite
    * (CASE WHEN operand ≤ max/k THEN operand*k END — exactly what
    * the oracle's HUGEINT replay does). Division by zero is ALSO an
    * exception under the hood (ANSI divide), so the zero denominator
    * is likewise a ~1% tail (orderkey mod 97). Aggregation keeps only order-free shapes
    * (counts of each outcome, min/max of the survivors) so the
    * result is engine-exact. */
  def tryArith(spark: SparkSession, dir: String): DataFrame =
    // single-row-group input: the 4 try_* kernels + partial agg would
    // run in ONE scan task; parallelized() fans the rows across the
    // machine first (identity at scale — see Tables.parallelized)
    graft.sources.Tables.parallelized(lineitem(spark, dir), col("l_orderkey"))
      .select(col("l_returnflag"),
        expr("try_multiply(l_orderkey % 13300, 700000000000000L)").as("mul"),
        expr(s"try_add(${Long.MaxValue - 1000L}L, l_partkey % 1024)").as("add"),
        expr(s"try_subtract(${Long.MinValue + 50L}L, l_suppkey % 52)").as("sub"),
        expr("try_divide(l_extendedprice, l_orderkey % 97)").as("dv"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("mul").isNull, 1L).otherwise(0L)).as("mul_nulls"),
        min("mul").as("mul_min"), max("mul").as("mul_max"),
        sum(when(col("add").isNull, 1L).otherwise(0L)).as("add_nulls"),
        max("add").as("add_max"),
        sum(when(col("sub").isNull, 1L).otherwise(0L)).as("sub_nulls"),
        min("sub").as("sub_min"),
        sum(when(col("dv").isNull, 1L).otherwise(0L)).as("div_nulls"),
        min("dv").as("div_min"), max("dv").as("div_max"))
      .orderBy("l_returnflag")

  /** Array higher-order-function kernel: transform / filter / exists
    * / forall / aggregate (fold) / zip_with — the lambda surface the
    * reference expresses as per-value compute functions inside the
    * scan loop (/root/reference/expr.h:36-60's typed Get*Val chain;
    * scalar-fn-call.h); Spark's HOFs keep the lambda INSIDE
    * whole-stage codegen (a `LambdaFunction` bound over the array,
    * not a UDF), so the loop stays fused with the scan exactly like
    * the reference's inlined compute fns. Per-row arrays are bounded
    * by the p_type word count (≤3), so no HOF here ever sees
    * unbounded input — the discipline that keeps lambda work
    * per-row-bounded at 100 TB. Every output is either an integer or
    * a canonical string join, so oracle parity is exact. */
  /** Spark 4 COLLATION surface: case-insensitive EQUALITY as a
    * column PROPERTY (collate(col, 'UTF8_LCASE')) rather than an
    * expression rewrite — the group-by merges planted case variants
    * of the same brand inside the hash aggregate itself, with no
    * lower() in the grouping key (at 100 TB that means the collation
    * participates in partial aggregation and shuffle partitioning
    * natively). Case noise is planted deterministically
    * (partkey%3 → lower/upper/as-is), and every OUTPUT is a
    * deterministic function of the merged group — binary-min
    * representative, lowercased key, member count, distinct-variant
    * count, a case-insensitive contains flag — because the collated
    * group's "first" member is order-dependent and must never be
    * emitted raw. Oracle parity: for ASCII data UTF8_LCASE equality
    * ≡ equality of lower(), which is how DuckDB replays it. */
  def collation(spark: SparkSession, dir: String): DataFrame =
    part(spark, dir)
      .withColumn("noisy", expr(
        """CASE CAST(p_partkey % 3 AS INT) WHEN 0 THEN lower(p_brand)
          |WHEN 1 THEN upper(p_brand) ELSE p_brand END""".stripMargin))
      .groupBy(expr("collate(noisy, 'UTF8_LCASE')").as("k"))
      .agg(count(lit(1)).as("n_parts"),
        countDistinct(expr("collate(noisy, 'UTF8_BINARY')")).as("n_variants"),
        min(expr("collate(noisy, 'UTF8_BINARY')")).as("rep_binary_min"),
        sum(when(expr("contains(collate(noisy, 'UTF8_LCASE'), 'BRAND')"), 1L)
          .otherwise(0L)).as("n_ci_contains"))
      .select(lower(col("k")).as("brand_lc"), col("n_parts"),
        col("n_variants"), col("rep_binary_min"), col("n_ci_contains"))
      .orderBy("brand_lc")

  /** STRUCT as a first-class value — the row-type surface §2.3 was
    * missing: named_struct construction + field access, lexicographic
    * struct ORDERING (the comparator behind every argmax/as-of/top-k
    * in this repo, here surfaced directly), least/greatest over
    * structs, and array_sort over an array of structs (field-order
    * comparison, tag travels with the key). The oracle replays struct
    * ordering as standard SQL row-value comparisons — (a, b) < (c, d)
    * — which is exactly the semantics Spark's struct comparator
    * implements, so the engines agree on every tie-break. All outputs
    * scalar (string/bool/bigint); pure projection, codegen-fused. */
  def structOps(spark: SparkSession, dir: String): DataFrame = {
    val p = part(spark, dir).select(col("p_partkey"), col("p_brand"),
        col("p_size").cast("bigint").as("sz"),
        expr("CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) % 50")
          .as("k2"))
    p.select(
      col("p_partkey"),
      expr("named_struct('brand', p_brand, 'size', sz).brand").as("brand_field"),
      (struct(col("sz").as("a"), col("p_partkey").as("b")) <
        struct(col("k2").as("a"), col("p_partkey").as("b"))).as("s1_lt_s2"),
      least(struct(col("sz").as("a"), col("p_partkey").as("b")),
        struct(col("k2").as("a"), col("p_partkey").as("b")))
        .getField("a").as("min_k"),
      expr("""array_join(transform(array_sort(array(
        named_struct('k', sz, 'tag', 'size'),
        named_struct('k', k2, 'tag', 'price'))), s -> s.tag), ',')""")
        .as("order_tags"),
      expr("named_struct('x', sz, 'y', p_brand) = named_struct('x', sz, 'y', p_brand)")
        .as("eq_self"))
      .orderBy("p_partkey")
  }

  def higherOrder(spark: SparkSession, dir: String): DataFrame = {
    val p = part(spark, dir).select(
      col("p_partkey"), split(lower(col("p_type")), " ").as("words"))
    p.select(
      col("p_partkey"),
      array_join(transform(col("words"), w => length(w).cast("string")), ",")
        .as("lens_csv"),
      size(filter(col("words"), w => length(w) >= 6)).cast("long").as("n_long"),
      exists(col("words"), w => w.rlike("^[aeiou]")).as("any_vowel_start"),
      forall(col("words"), w => w.rlike("^[a-z]+$")).as("all_alpha"),
      aggregate(col("words"), lit(0L), (acc, w) => acc + length(w))
        .as("len_sum"),
      array_join(
        zip_with(sequence(lit(1), size(col("words"))), col("words"),
          (i, w) => concat(i.cast("string"), lit(":"), w)), "|")
        .as("idx_words"))
      .orderBy("p_partkey")
  }
}
