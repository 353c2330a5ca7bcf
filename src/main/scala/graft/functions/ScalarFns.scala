package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Scalar function families (SURVEY.md §2.B "Scalar functions").
  * The reference's only scalar work is byte extraction + IPv4 dotted-quad
  * formatting (/root/reference/src/main.rs:193-196) — `f_ip_format`
  * reproduces that exact formatting as a composition of codegen'd
  * built-ins (shiftright / bitwiseAND / concat_ws), not a UDF.
  *
  * Scale notes: everything here is a narrow per-row projection of
  * `org.apache.spark.sql.functions` built-ins — whole-stage-codegen'd,
  * no shuffle, no UDF/serialization boundary. The only shuffle in each
  * query is the final deterministic ORDER BY the oracle gate requires.
  */
object ScalarFns {
  private def t(s: SparkSession, dir: String, n: String) = Tables.t(s, dir, n)

  def fString(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_upper"),
        substring(col("p_type"), 1, 5).as("type_prefix"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
        col("p_name").like("%a%").as("has_a"),
        length(col("p_name")).as("name_len"))
      .orderBy(col("p_partkey").asc)

  def fDate(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
        datediff(col("o_orderdate").cast("date"), to_date(lit("1995-01-01"))).as("days_since"))
      .orderBy(col("o_orderkey").asc)

  def fMath(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        round(abs(col("l_discount") - 0.05), 2).as("abs_disc"),
        ceil(col("l_quantity") / 7.0).as("ceil_q"),
        floor(col("l_quantity") / 7.0).as("floor_q"),
        round(pow(col("l_quantity"), 2), 2).as("q_sq"),
        graft.Det.r4(log(col("l_extendedprice"))).as("ln_price"))
      // non-unique (l_orderkey, l_linenumber): order by outputs too
      .orderBy(col("l_orderkey").asc, col("l_linenumber").asc,
               col("q_sq").asc, col("abs_disc").asc, col("ln_price").asc)

  /** ArrayType surface over the 64-dim embedding column: size /
    * element_at / slice / higher-order aggregate (dot-product building
    * blocks for `sim_topk`). Elements are cast float->double BEFORE any
    * arithmetic so both engines fold identical doubles in identical order. */
  def fArray(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "embeddings")
      .select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        graft.Det.r4(element_at(col("embedding"), 1).cast("double")).as("e0"),
        graft.Det.r4(aggregate(
          transform(slice(col("embedding"), 1, 4), x => x.cast("double")),
          lit(0.0), (acc, x) => acc + x)).as("sum_first4"))
      .orderBy(col("vec_id").asc)

  def fMapJson(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(
        col("event_id"),
        from_json(col("props"), org.apache.spark.sql.types.DataType.fromDDL("map<string,int>"))
          .getItem("k").as("k_int"),
        get_json_object(col("props"), "$.k").cast("int").as("k_via_path"))
      .orderBy(col("event_id").asc)

  /** int -> dotted-quad (reference main.rs:193-196 via std::net::Ipv4Addr)
    * through the NATIVE Catalyst expression `Ipv4Quad` (real doGenCode —
    * stays inside the WholeStageCodegen span; see Ipv4Quad.scala). */
  def fIpFormat(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(
        col("event_id"),
        Ipv4Quad.ip_quad(col("user_id").bitwiseAND(lit(0xFFFFFFFFL))).as("ip"))
      .orderBy(col("event_id").asc)

  /** Bitwise family — the reference's trailer decode is bit extraction
    * (A8: `main.rs` shifts/masks); here as first-class codegen'd column
    * ops over event ids. */
  def fBitwise(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(
        col("event_id"),
        col("event_id").bitwiseXOR(lit(0x5DEECE66DL)).as("xored"),
        col("event_id").bitwiseAND(lit(255L)).as("low_byte"),
        col("event_id").bitwiseOR(lit(1L)).as("ored"),
        shiftleft(col("event_id"), 3).as("shifted"),
        bit_count(col("event_id")).as("n_bits"))
      .orderBy(col("event_id").asc)

  /** URL parsing family (r5): host / path / a single query parameter via
    * the codegen'd `parse_url` expression — the canonical first step of
    * web-corpus curation (domain filtering, dedup by canonical URL).
    * URLs are synthesized deterministically from document metadata (the
    * corpus ships no URL column); DuckDB reproduces the extraction with
    * regexes over the identical synthesized string. */
  def fUrl(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .withColumn("url",
        concat(lit("https://"), col("source"), lit(".example.org/"),
               col("lang"), lit("/doc-"), col("doc_id"), lit("?ref="), col("lang"),
               lit("&id="), col("doc_id")))
      .select(
        col("doc_id"),
        parse_url(col("url"), lit("HOST")).as("host"),
        parse_url(col("url"), lit("PATH")).as("path"),
        parse_url(col("url"), lit("QUERY"), lit("id")).as("qid"))
      .orderBy(col("doc_id").asc)

  /** Struct/nested-type family (r5): build a typed struct column, read
    * fields back out, and serialize it as canonical JSON — nested types
    * are how multimodal metadata travels next to binary payloads (§2.B
    * `multimodal_cols`), and to_json is the interchange edge. Int and
    * string fields only: JSON double formatting is engine-specific. */
  def fStruct(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .withColumn("meta", struct(
        col("lang").as("lang"),
        col("source").as("source"),
        col("n_chars").as("n_chars")))
      .select(
        col("doc_id"),
        col("meta.lang").as("lang"),
        col("meta.n_chars").as("n_chars"),
        to_json(col("meta")).as("meta_json"))
      .orderBy(col("doc_id").asc)

  /** Regex family (r5): extract / match / replace-all with patterns in
    * the common RE2-compatible subset (character classes, anchors,
    * quantifiers) so Java regex and DuckDB's RE2 agree. The replace
    * demonstrates the global-replace semantics Spark defaults to (DuckDB
    * needs the explicit 'g' flag). */
  def fRegex(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(
        col("doc_id"),
        regexp_extract(col("text"), "^([a-z]+)", 1).as("first_tok"),
        col("text").rlike("data").as("has_data"),
        regexp_replace(substring(col("text"), 1, 20), "[aeiou]", "*").as("scrub20"))
      .orderBy(col("doc_id").asc)

  /** Temporal interval arithmetic (r5): add_months / day arithmetic /
    * INTERVAL literals / last_day / quarter — the calendar-math family
    * (billing periods, retention horizons, SLA windows). All codegen'd
    * built-ins, map-only; rendered as formatted strings so both engines
    * emit identical bytes. Month addition CLAMPS at month end in both
    * engines (Jan 31 + 1 month = Feb 28/29). */
  def fInterval(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .select(
        col("o_orderkey"),
        date_format(add_months(col("o_orderdate"), 3), "yyyy-MM-dd").as("plus_3m"),
        date_format(date_add(col("o_orderdate").cast("date"), 90), "yyyy-MM-dd").as("plus_90d"),
        date_format(col("o_orderdate") + expr("INTERVAL 36 HOURS"),
                    "yyyy-MM-dd HH:mm:ss").as("plus_36h"),
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
        quarter(col("o_orderdate")).as("q"))
      .orderBy(col("o_orderkey").asc)

  /** Network-math family (r5): subnet membership and /24 rollup — the
    * capture-analytics companions to `f_ip_format` (the reference's
    * domain): CIDR containment is a shift-compare (`ip >> (32-p) ==
    * net >> (32-p)`), subnet aggregation masks the low octet. All
    * codegen'd bit ops over synthesized IPv4s; the oracle runs the
    * identical shift arithmetic. */
  def fNetwork(spark: SparkSession, dir: String): DataFrame = {
    val ip = col("user_id").bitwiseAND(lit(0xFFFFFFFFL))
    // 10.0.0.0/8 in integer form
    val net = lit(10L << 24)
    t(spark, dir, "events")
      .select(
        col("event_id"),
        Ipv4Quad.ip_quad(ip).as("ip"),
        (shiftright(ip, 24) === shiftright(net, 24)).as("in_10_slash_8"),
        Ipv4Quad.ip_quad(ip.bitwiseAND(lit(0xFFFFFF00L))).as("subnet_24"),
        shiftright(ip, 16).as("prefix_16"))
      .orderBy(col("event_id").asc)
  }

  /** Spark 4 VARIANT family (r6): semi-structured JSON as the binary
    * variant type — `parse_json` once, then typed `variant_get` path
    * extraction; a missing path is NULL, not an error (`try_variant_get`
    * covers type mismatches). At 100 TB this is the open-schema column
    * pattern: the variant encodes once at ingest and every downstream
    * path read is a cheap binary probe, not a JSON re-parse (and parquet
    * shredding can push the hot paths to columnar). The nested probe
    * re-encodes a constructed document to exercise array indexing. All
    * outputs are plain types so the DuckDB JSON oracle matches. */
  def fVariant(spark: SparkSession, dir: String): DataFrame = {
    val v = parse_json(col("props"))
    t(spark, dir, "events")
      .filter(col("event_id") % 6 === 0)
      .select(
        col("event_id"),
        variant_get(v, "$.k", "bigint").as("k"),
        variant_get(v, "$.k", "string").as("k_str"),
        variant_get(parse_json(concat(lit("{\"a\":{\"b\":["),
            variant_get(v, "$.k", "bigint"), lit(",2,3]}}"))),
          "$.a.b[0]", "bigint").as("nested0"),
        variant_get(v, "$.missing", "string").as("missing"),
        is_variant_null(try_variant_get(v, "$.k", "variant")).as("k_is_json_null"))
      .orderBy(col("event_id").asc)
  }

  /** ANSI-safe arithmetic family (r6): `try_add` / `try_divide` /
    * `try_to_number` return NULL where strict ANSI arithmetic raises
    * (overflow, ÷0, malformed input) — the error-handling posture a
    * 100 TB pipeline needs: one poisoned row must NULL out, not kill a
    * 6-hour job; the NULLs stay countable next to the data (same policy
    * as the CSV corrupt-record column and the pcap permissive mode). */
  def fTryArith(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .filter(col("event_id") % 6 === 0)
      .select(
        col("event_id"),
        // r7: divisor `event_id % 4` VARIES within the `% 6 === 0` filter
        // (6→2, 12→0, 18→2, …) so BOTH the ÷0→NULL path and the real
        // quotient path are exercised (r6's `% 3` was always 0 under the
        // filter — the success branch was never tested). The non-zero
        // divisor is always 2 (a power of two), so the double division is
        // binary-exact — no rounding needed, and none wanted: round()
        // half-up vs half-even ties differ between engines.
        try_divide(col("value"), col("event_id") % 4).as("div_maybe0"),
        try_add(col("event_id"), lit(Long.MaxValue)).as("add_overflow"),
        // r7: CAST to BIGINT — try_to_number yields DECIMAL(9,0), which
        // Spark writes as an INT32-backed parquet decimal while DuckDB
        // materializes decimal128; equal values, different bytes, hash
        // mismatch. Boring-type rule: oracle outputs are
        // bigint/string/date/rounded-double only.
        try_to_number(
          when(col("event_id") % 4 === 0, format_string("%d", col("event_id")))
            .otherwise(lit("not-a-number")), lit("999999999"))
          .cast("bigint").as("parsed"))
      .orderBy(col("event_id").asc)

  /** Edit-distance family (r7): levenshtein over the nation-name pair
    * space, plus the normalized similarity 1 - lev/max(len) a fuzzy-dedup
    * gate thresholds on. The pair generation is the textbook quadratic —
    * fine on a 25-row dim; at corpus scale the same scalar sits BEHIND a
    * bucketing stage (LSH bands, length buckets — see dedup_fuzzy) so it
    * only ever scores candidate pairs, never the cross product. */
  def fLevenshtein(spark: SparkSession, dir: String): DataFrame = {
    val n1 = t(spark, dir, "nation").select(
      col("n_nationkey").as("k1"), col("n_name").as("name1"))
    val n2 = t(spark, dir, "nation").select(
      col("n_nationkey").as("k2"), col("n_name").as("name2"))
    n1.crossJoin(n2).filter(col("k1") < col("k2"))
      .select(col("k1"), col("k2"),
        levenshtein(col("name1"), col("name2")).cast("long").as("lev"),
        graft.Det.r4(lit(1.0) - levenshtein(col("name1"), col("name2")).cast("double") /
          greatest(length(col("name1")), length(col("name2"))).cast("double")).as("sim"))
      .orderBy(col("k1").asc, col("k2").asc)
  }

  /** printf-style formatting (r7): `format_string` is the C-printf
    * contract both engines share; zero-padding, hex and string widths
    * render byte-identically, which makes formatted keys safe to hash or
    * join on across engines. */
  def fPrintf(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .filter(col("event_id") % 7 === 0)
      .select(
        col("event_id"),
        format_string("evt-%08d", col("event_id")).as("padded"),
        format_string("%x", col("event_id")).as("hexid"),
        format_string("%s/%05d", col("event_type"), col("user_id")).as("route"))
      .orderBy(col("event_id").asc)

  /** Binary codec family (r7): base64 / hex / sha256 over UTF-8 bytes,
    * plus the encode→decode roundtrip — the content-addressing toolkit
    * (dedup keys, cache keys, wire-safe ids travel in exactly these
    * encodings). Spark's hex() is uppercase and DuckDB's lowercase, so
    * the query pins lower() as the cross-engine canonical form; both
    * emit unpadded-free standard base64 and lowercase sha256 hex. */
  def fCodec(spark: SparkSession, dir: String): DataFrame = {
    val p = substring(col("text"), 1, 24).cast("binary")
    t(spark, dir, "documents")
      .filter(col("doc_id") % 11 === 0)
      .select(
        col("doc_id"),
        base64(p).as("b64"),
        lower(hex(p)).as("hx"),
        sha2(p, 256).as("sha"),
        unbase64(base64(p)).cast("string").as("roundtrip"))
      .orderBy(col("doc_id").asc)
  }

  /** PII masking (r7): `mask()` — upper→X, lower→x, digit→n, punctuation
    * kept — plus the show-last-4 partial form; the redaction pass a
    * training-data pipeline runs before text leaves the trust boundary.
    * Codegen'd builtin; the oracle reproduces the class map with three
    * regexp_replace passes. */
  def fMask(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .filter(col("c_custkey") % 7 === 0)
      .select(
        col("c_custkey"),
        expr("mask(c_name)").as("name_masked"),
        concat(lit("***"), expr("right(c_name, 4)")).as("name_last4"),
        expr("mask(c_mktsegment)").as("segment_masked"))
      .orderBy(col("c_custkey").asc)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "f_mask" -> (fMask _),
    "f_codec" -> (fCodec _),
    "f_levenshtein" -> (fLevenshtein _),
    "f_printf" -> (fPrintf _),
    "f_try_arith" -> (fTryArith _),
    "f_variant" -> (fVariant _),
    "f_network" -> (fNetwork _),
    "f_interval" -> (fInterval _),
    "f_regex" -> (fRegex _),
    "f_url" -> (fUrl _),
    "f_struct" -> (fStruct _),
    "f_bitwise" -> (fBitwise _),
    "f_string" -> (fString _),
    "f_date" -> (fDate _),
    "f_math" -> (fMath _),
    "f_array" -> (fArray _),
    "f_map_json" -> (fMapJson _),
    "f_ip_format" -> (fIpFormat _))

  val oracle: Map[String, String] = Map(
    "f_mask" ->
      """SELECT c_custkey,
        |  regexp_replace(regexp_replace(regexp_replace(
        |    c_name, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
        |    AS name_masked,
        |  '***' || right(c_name, 4) AS name_last4,
        |  regexp_replace(regexp_replace(regexp_replace(
        |    c_mktsegment, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
        |    AS segment_masked
        |FROM customer WHERE c_custkey % 7 = 0
        |ORDER BY c_custkey ASC NULLS FIRST""".stripMargin,
    "f_codec" ->
      """SELECT doc_id,
        |  base64(encode(substring(text, 1, 24))) AS b64,
        |  lower(hex(encode(substring(text, 1, 24)))) AS hx,
        |  sha256(substring(text, 1, 24)) AS sha,
        |  decode(from_base64(base64(encode(substring(text, 1, 24))))) AS roundtrip
        |FROM documents WHERE doc_id % 11 = 0
        |ORDER BY doc_id ASC NULLS FIRST""".stripMargin,
    "f_levenshtein" ->
      """SELECT a.n_nationkey AS k1, b.n_nationkey AS k2,
        |  CAST(levenshtein(a.n_name, b.n_name) AS BIGINT) AS lev,
        |  floor((1.0 - CAST(levenshtein(a.n_name, b.n_name) AS DOUBLE)
        |    / greatest(length(a.n_name), length(b.n_name))) * 10000 + 0.5) / 10000 AS sim
        |FROM nation a, nation b WHERE a.n_nationkey < b.n_nationkey
        |ORDER BY k1 ASC NULLS FIRST, k2 ASC NULLS FIRST""".stripMargin,
    "f_printf" ->
      """SELECT event_id,
        |  printf('evt-%08d', event_id) AS padded,
        |  printf('%x', event_id) AS hexid,
        |  printf('%s/%05d', event_type, user_id) AS route
        |FROM events WHERE event_id % 7 = 0
        |ORDER BY event_id ASC NULLS FIRST""".stripMargin,
    "f_try_arith" ->
      """SELECT event_id,
        |  CASE WHEN event_id % 4 = 0 THEN NULL
        |       ELSE value / (event_id % 4) END AS div_maybe0,
        |  CASE WHEN event_id > 0 THEN NULL
        |       ELSE 9223372036854775807 END AS add_overflow,
        |  CASE WHEN event_id % 4 = 0 THEN CAST(event_id AS BIGINT)
        |       ELSE NULL END AS parsed
        |FROM events WHERE event_id % 6 = 0
        |ORDER BY event_id ASC NULLS FIRST""".stripMargin,
    "f_variant" ->
      """SELECT event_id,
        |  CAST(props->>'$.k' AS BIGINT) AS k,
        |  props->>'$.k' AS k_str,
        |  CAST(json_extract('{"a":{"b":[' || (props->>'$.k') || ',2,3]}}',
        |                    '$.a.b[0]') AS BIGINT) AS nested0,
        |  props->>'$.missing' AS missing,
        |  (json_extract(props, '$.k') = 'null') AS k_is_json_null
        |FROM events WHERE event_id % 6 = 0
        |ORDER BY event_id ASC NULLS FIRST""".stripMargin,
    "f_network" ->
      """WITH e AS (SELECT event_id, user_id & 4294967295 AS ip FROM events)
        |SELECT event_id,
        |  concat_ws('.', (ip >> 24) & 255, (ip >> 16) & 255,
        |                 (ip >> 8) & 255, ip & 255) AS ip,
        |  (ip >> 24) = 10 AS in_10_slash_8,
        |  concat_ws('.', ((ip & 4294967040) >> 24) & 255, ((ip & 4294967040) >> 16) & 255,
        |                 ((ip & 4294967040) >> 8) & 255, (ip & 4294967040) & 255) AS subnet_24,
        |  ip >> 16 AS prefix_16
        |FROM e ORDER BY event_id ASC NULLS FIRST""".stripMargin,
    "f_interval" ->
      """SELECT o_orderkey,
        |  strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus_3m,
        |  strftime(CAST(o_orderdate AS DATE) + 90, '%Y-%m-%d') AS plus_90d,
        |  strftime(o_orderdate + INTERVAL 36 HOUR, '%Y-%m-%d %H:%M:%S') AS plus_36h,
        |  strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
        |  CAST(quarter(o_orderdate) AS INTEGER) AS q
        |FROM orders ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin,
    "f_regex" ->
      """SELECT doc_id,
        |  regexp_extract(text, '^([a-z]+)', 1) AS first_tok,
        |  regexp_matches(text, 'data') AS has_data,
        |  regexp_replace(substr(text, 1, 20), '[aeiou]', '*', 'g') AS scrub20
        |FROM documents ORDER BY doc_id ASC NULLS FIRST""".stripMargin,
    "f_url" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    'https://' || source || '.example.org/' || lang || '/doc-' || doc_id ||
        |    '?ref=' || lang || '&id=' || doc_id AS url
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_extract(url, '^https://([^/]+)/', 1) AS host,
        |  regexp_extract(url, '^https://[^/]+(/[^?]*)', 1) AS path,
        |  regexp_extract(url, '[?&]id=([^&]*)', 1) AS qid
        |FROM u ORDER BY doc_id ASC NULLS FIRST""".stripMargin,
    "f_struct" ->
      """SELECT doc_id, lang, n_chars,
        |  '{"lang":"' || lang || '","source":"' || source || '","n_chars":' || n_chars || '}' AS meta_json
        |FROM documents ORDER BY doc_id ASC NULLS FIRST""".stripMargin,
    "f_bitwise" ->
      """SELECT event_id,
        |  xor(event_id, 25214903917) AS xored,
        |  event_id & 255 AS low_byte,
        |  event_id | 1 AS ored,
        |  event_id << 3 AS shifted,
        |  CAST(bit_count(event_id) AS INTEGER) AS n_bits
        |FROM events ORDER BY event_id ASC NULLS FIRST""".stripMargin,
    "f_string" ->
      """SELECT p_partkey,
        |  upper(p_brand) AS brand_upper,
        |  substring(p_type, 1, 5) AS type_prefix,
        |  concat_ws('-', p_brand, p_type) AS brand_type,
        |  regexp_extract(p_name, '^(\w+)', 1) AS first_word,
        |  p_name LIKE '%a%' AS has_a,
        |  CAST(length(p_name) AS INTEGER) AS name_len
        |FROM part ORDER BY p_partkey ASC NULLS FIRST""".stripMargin,
    "f_date" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INTEGER) AS y,
        |  CAST(month(o_orderdate) AS INTEGER) AS m,
        |  CAST(day(o_orderdate) AS INTEGER) AS d,
        |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        |  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since
        |FROM orders ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin,
    "f_math" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(abs(l_discount - 0.05), 2) AS abs_disc,
        |  CAST(ceil(l_quantity / 7.0) AS BIGINT) AS ceil_q,
        |  CAST(floor(l_quantity / 7.0) AS BIGINT) AS floor_q,
        |  round(pow(l_quantity, 2), 2) AS q_sq,
        |  floor(ln(l_extendedprice) * 10000 + 0.5) / 10000 AS ln_price
        |FROM lineitem ORDER BY l_orderkey ASC NULLS FIRST, l_linenumber ASC NULLS FIRST,
        |  q_sq ASC NULLS FIRST, abs_disc ASC NULLS FIRST, ln_price ASC NULLS FIRST""".stripMargin,
    "f_array" ->
      """SELECT vec_id,
        |  CAST(len(embedding) AS INTEGER) AS dim,
        |  floor(CAST(embedding[1] AS DOUBLE) * 10000 + 0.5) / 10000 AS e0,
        |  floor(list_sum(list_transform(embedding[1:4], x -> CAST(x AS DOUBLE))) * 10000 + 0.5) / 10000 AS sum_first4
        |FROM embeddings ORDER BY vec_id ASC NULLS FIRST""".stripMargin,
    "f_map_json" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_via_path
        |FROM events ORDER BY event_id ASC NULLS FIRST""".stripMargin,
    "f_ip_format" ->
      """SELECT event_id,
        |  concat_ws('.', (user_id >> 24) & 255, (user_id >> 16) & 255,
        |                 (user_id >> 8) & 255, user_id & 255) AS ip
        |FROM events ORDER BY event_id ASC NULLS FIRST""".stripMargin)
}
