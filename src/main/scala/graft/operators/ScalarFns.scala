package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Scalar-function families (SURVEY.md §2 Part B rows B31-B37).
  *
  * All codegen'd `org.apache.spark.sql.functions` built-ins — no UDFs in
  * the hot path (whole-stage codegen keeps these inside one generated
  * loop over the columnar scan). The only reference-derived member is
  * hex display of binary ids (/root/reference/src/bin/main.rs:74-77).
  *
  * Determinism: transcendental outputs are rounded (libm last-ulp
  * differences between JVM and DuckDB); everything else is exact integer /
  * decimal / IEEE-deterministic (sqrt, division) arithmetic.
  */
object ScalarFns {

  // ---------------------------------------------------------------- B31
  def fnString(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderkey") < 500)
      .select(
        col("o_orderkey"),
        lower(col("o_orderpriority")).as("lo"),
        upper(col("o_orderstatus")).as("up"),
        trim(lit("  pad  ")).as("trimmed"),
        substring(col("o_orderpriority"), 1, 1).as("pri_code"),
        concat_ws("|", col("o_orderstatus"), col("o_orderpriority")).as("cat"),
        length(col("o_orderpriority")).as("len"),
        regexp_extract(col("o_orderpriority"), "(\\d+)", 1).as("pri_num"),
        regexp_replace(col("o_orderpriority"), "[AEIOU]", "_").as("devowel"),
        lpad(col("o_orderkey").cast("string"), 8, "0").as("okey_pad"),
        col("o_orderpriority").like("%URGENT%").as("is_urgent"),
        hex(col("o_orderkey")).as("okey_hex"),
        // B4 binary encode/decode: payload → base64 → decode round-trip
        base64(col("o_orderpriority").cast("binary")).as("pri_b64"),
        unbase64(base64(col("o_orderpriority").cast("binary"))).cast("string")
          .as("pri_roundtrip"))
      .orderBy("o_orderkey")

  // ---------------------------------------------------------------- B32
  def fnDatetime(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderkey") < 500)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dom"),
        date_trunc("quarter", col("o_orderdate")).as("qtr"),
        to_date(col("o_orderdate")).as("odate"),
        datediff(to_date(col("o_orderdate")), to_date(lit("1995-01-01"))).as("days_since"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"),
        date_add(to_date(col("o_orderdate")), 30).as("due"),
        last_day(col("o_orderdate")).as("eom"))
      .orderBy("o_orderkey")

  // ---------------------------------------------------------------- B33
  def fnMath(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderkey") < 500)
      .select(
        col("o_orderkey"),
        round(col("o_totalprice"), 1).as("rounded"),
        abs(col("o_totalprice") * -1).as("absval"),
        ceil(col("o_totalprice")).as("ceiled"),
        floor(col("o_totalprice")).as("floored"),
        pow(lit(2.0), col("o_orderkey") % 10).as("pow2"),
        round(log(col("o_totalprice") + 1), 4).as("ln_p"),
        sqrt(col("o_orderkey").cast("double")).as("sq"),
        pmod(col("o_orderkey"), lit(7)).as("mod7"),
        (col("o_orderkey") % 7).as("rem7"))
      .orderBy("o_orderkey")

  // ---------------------------------------------------------------- B34
  def fnCond(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") < 500)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        when(col("l_quantity") < 10, "low")
          .when(col("l_quantity") < 35, "mid")
          .otherwise("high").as("qty_band"),
        coalesce(nullif(col("l_returnflag"), lit("N")), lit("none")).as("rf_or_none"),
        nvl(nullif(col("l_linestatus"), lit("F")), lit("closed")).as("ls_nvl"),
        (col("l_quantity") > 25 && col("l_returnflag") === "R").as("heavy_return"))
      // TOTAL order (r19): (l_orderkey, l_linenumber) is NOT unique in
      // this lineitem, so tie order used to ride on accidental scan
      // order — the one board row that broke when scans stopped being
      // single-task (Tables.load's parallelism floor). All output
      // columns join the sort key, making equal-key rows identical and
      // the order total; the result BAG is untouched and the oracle
      // carries the same tiebreakers.
      .orderBy("l_orderkey", "l_linenumber", "qty_band", "rf_or_none",
        "ls_nvl", "heavy_return")

  // ---------------------------------------------------------------- B35
  /** Array + higher-order functions over tokenized text: transform /
    * filter / aggregate run inside codegen, no UDF. */
  def fnArray(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        size(split(col("text"), " ")).as("n_words"),
        array_contains(split(col("text"), " "), "spark").as("has_spark"),
        size(array_distinct(split(col("text"), " "))).as("n_distinct"),
        element_at(array_sort(array_distinct(split(col("text"), " "))), 1).as("first_word"),
        aggregate(
          transform(split(col("text"), " "), w => length(w)),
          lit(0), (acc, x) => acc + x).as("sum_word_len"),
        size(filter(split(col("text"), " "), w => length(w) > 4)).as("n_long"))
      .orderBy("doc_id")

  // ---------------------------------------------------------------- B36
  /** Map columns (the reference's `files: HashMap<String,String>`,
    * /root/reference/src/lib.rs:24-27): build, inspect, explode back. */
  def fnMap(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderkey") < 300)
      .select(col("o_orderkey"),
        map(
          lit("status"), col("o_orderstatus"),
          lit("priority"), col("o_orderpriority")).as("m"))
      .select(col("o_orderkey"), explode(col("m")).as(Seq("k", "v")))
      .orderBy("o_orderkey", "k")

  // ---------------------------------------------------------------- B37
  /** JSON extraction over `events.props` (a JSON string column). */
  def fnJson(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .filter(col("event_id") < 500)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k_val"),
        from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k").as("k_struct"),
        to_json(struct(col("event_type").as("t"))).as("rejson"))
      .orderBy("event_id")

  /** Second string family: translate / repeat / reverse / position /
    * left-right / contains / prefix / split_part. */
  def fnString2(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderkey") < 500)
      .select(
        col("o_orderkey"),
        translate(col("o_orderpriority"), "-", "_").as("translated"),
        repeat(col("o_orderstatus"), 3).as("repeated"),
        reverse(col("o_orderpriority")).as("reversed"),
        instr(col("o_orderpriority"), "-").as("dash_pos"),
        substring(col("o_orderpriority"), 1, 3).as("left3"),
        col("o_orderpriority").contains("URGENT").as("has_urgent"),
        col("o_orderpriority").startsWith("1").as("is_one"),
        col("o_orderpriority").endsWith("LOW").as("is_low"),
        split(col("o_orderpriority"), "-").getItem(1).as("pri_word"))
      .orderBy("o_orderkey")

  /** Second datetime family: add_months / quarter / dayofweek (aligned
    * across engines) / last-of-week / formatted month. */
  def fnDatetime2(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderkey") < 500)
      .select(
        col("o_orderkey"),
        add_months(to_date(col("o_orderdate")), 3).as("plus3m"),
        quarter(col("o_orderdate")).as("q"),
        (dayofweek(col("o_orderdate")) - 1).as("dow0"), // 0=Sunday in both
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
        trunc(to_date(col("o_orderdate")), "month").as("month_start"),
        dayofyear(col("o_orderdate")).as("doy"))
      .orderBy("o_orderkey")

  /** Bitwise + misc scalar functions — all exact integer arithmetic
    * (identical across engines by construction). */
  def fnBitwise(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderkey") < 500)
      .select(
        col("o_orderkey"),
        col("o_orderkey").bitwiseAND(255).as("and255"),
        col("o_orderkey").bitwiseOR(16).as("or16"),
        col("o_orderkey").bitwiseXOR(85).as("xor85"),
        shiftleft(col("o_orderkey"), 2).as("shl2"),
        shiftright(col("o_orderkey"), 1).as("shr1"),
        bitwise_not(col("o_orderkey")).as("notk"),
        greatest(col("o_orderkey") % 7, col("o_orderkey") % 11).as("gr"),
        least(col("o_orderkey") % 7, col("o_orderkey") % 11).as("ls"),
        signum(col("o_orderkey") - 250).cast("int").as("sgn"),
        bit_count(col("o_orderkey")).as("popcnt"))
      .orderBy("o_orderkey")

  /** Array set algebra over the two halves of each document's token
    * stream: union/intersect/except/overlap via Spark's array set
    * functions, compared by SIZE (cardinalities are engine-order-proof;
    * element order of set ops is not). */
  def fnArraySet(s: SparkSession, d: String): DataFrame = {
    val toks = split(col("text"), " ")
    val h1 = array_distinct(slice(toks, lit(1), (size(toks) / 2).cast("int")))
    val h2 = array_distinct(slice(toks, (size(toks) / 2 + 1).cast("int"), size(toks)))
    Tables.documents(s, d)
      .select(col("doc_id"),
        size(h1).as("nd1"),
        size(h2).as("nd2"),
        size(array_union(h1, h2)).as("n_union"),
        size(array_intersect(h1, h2)).as("n_inter"),
        size(array_except(h1, h2)).as("n_except"),
        arrays_overlap(h1, h2).as("overlaps"),
        size(flatten(array(h1, h2))).as("n_flat"))
      .orderBy("doc_id")
  }

  /** ANSI error-safe functions (`try_cast`/`try_divide`/`try_add`/
    * `try_to_timestamp`): under Spark 4's default ANSI mode a bad cast
    * or overflow THROWS mid-job — at 100 TB one malformed row a billion
    * rows in kills the whole query hours in, so ingest paths use the
    * try_* forms that yield NULL instead. Each lane here manufactures
    * the failure (non-numeric cast, div-by-zero, bigint overflow, bad
    * timestamp) and counts survivors vs nulls; DuckDB replays with
    * TRY_CAST / NULLIF-guarded division / a CASE overflow guard, so the
    * NULL semantics — not just the happy path — hash-compare. */
  def fnTry(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(col("p_partkey"), col("p_type"), col("p_size"), col("p_retailprice"))
      .select(
        expr("try_cast(p_type AS INT)").as("bad_cast"),
        expr("try_cast(substring(p_type, 1, 1) AS INT)").as("bad_cast2"),
        expr("try_divide(p_retailprice, p_size - p_size)").as("div0"),
        expr("try_add(9223372036854775807L, cast(p_partkey + 1 AS BIGINT))").as("overflow"),
        expr("try_to_timestamp(p_type, 'yyyy-MM-dd')").as("bad_ts"),
        expr("try_cast(cast(p_size AS STRING) AS INT)").as("good_cast"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("bad_cast").isNull, 1L).otherwise(0L)).as("null_casts"),
        sum(when(col("bad_cast2").isNull, 1L).otherwise(0L)).as("null_casts2"),
        sum(when(col("div0").isNull, 1L).otherwise(0L)).as("null_div0"),
        sum(when(col("overflow").isNull, 1L).otherwise(0L)).as("null_overflow"),
        sum(when(col("bad_ts").isNull, 1L).otherwise(0L)).as("null_ts"),
        sum(col("good_cast")).as("good_cast_sum"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fn_try"      -> (fnTry(_, _)),
    "fn_array_set" -> (fnArraySet(_, _)),
    "fn_bitwise"  -> (fnBitwise(_, _)),
    "fn_string2"  -> (fnString2(_, _)),
    "fn_datetime2" -> (fnDatetime2(_, _)),
    "fn_string"   -> (fnString(_, _)),
    "fn_datetime" -> (fnDatetime(_, _)),
    "fn_math"     -> (fnMath(_, _)),
    "fn_cond"     -> (fnCond(_, _)),
    "fn_array"    -> (fnArray(_, _)),
    "fn_map"      -> (fnMap(_, _)),
    "fn_json"     -> (fnJson(_, _))
  )

  def oracles: Map[String, String] = Map(
    "fn_try" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CASE WHEN TRY_CAST(p_type AS INT) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_casts,
        |  CAST(SUM(CASE WHEN TRY_CAST(substring(p_type, 1, 1) AS INT) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_casts2,
        |  CAST(SUM(CASE WHEN p_size - p_size = 0 THEN 1 ELSE 0 END) AS BIGINT) AS null_div0,
        |  CAST(COUNT(*) AS BIGINT) AS null_overflow,
        |  CAST(SUM(CASE WHEN TRY_CAST(p_type AS TIMESTAMP) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_ts,
        |  CAST(SUM(TRY_CAST(CAST(p_size AS VARCHAR) AS INT)) AS BIGINT) AS good_cast_sum
        |FROM part""".stripMargin,
    "fn_array_set" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    list_distinct(list_slice(string_split(text, ' '), 1,
        |      len(string_split(text, ' ')) // 2)) AS h1,
        |    list_distinct(list_slice(string_split(text, ' '),
        |      len(string_split(text, ' ')) // 2 + 1,
        |      len(string_split(text, ' ')))) AS h2
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(h1) AS INT) AS nd1,
        |  CAST(len(h2) AS INT) AS nd2,
        |  CAST(len(list_distinct(list_concat(h1, h2))) AS INT) AS n_union,
        |  CAST(len(list_filter(h1, x -> list_contains(h2, x))) AS INT) AS n_inter,
        |  CAST(len(list_filter(h1, x -> NOT list_contains(h2, x))) AS INT) AS n_except,
        |  len(list_filter(h1, x -> list_contains(h2, x))) > 0 AS overlaps,
        |  CAST(len(h1) + len(h2) AS INT) AS n_flat
        |FROM h ORDER BY doc_id""".stripMargin,
    "fn_bitwise" ->
      """SELECT o_orderkey,
        |  o_orderkey & 255 AS and255,
        |  o_orderkey | 16 AS or16,
        |  xor(o_orderkey, 85) AS xor85,
        |  o_orderkey << 2 AS shl2,
        |  o_orderkey >> 1 AS shr1,
        |  ~o_orderkey AS notk,
        |  greatest(o_orderkey % 7, o_orderkey % 11) AS gr,
        |  least(o_orderkey % 7, o_orderkey % 11) AS ls,
        |  CAST(sign(o_orderkey - 250) AS INT) AS sgn,
        |  CAST(bit_count(o_orderkey) AS INT) AS popcnt
        |FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""".stripMargin,
    "fn_string2" ->
      """SELECT o_orderkey,
        |  translate(o_orderpriority, '-', '_') AS translated,
        |  repeat(o_orderstatus, 3) AS repeated,
        |  reverse(o_orderpriority) AS reversed,
        |  CAST(strpos(o_orderpriority, '-') AS INT) AS dash_pos,
        |  substring(o_orderpriority, 1, 3) AS left3,
        |  contains(o_orderpriority, 'URGENT') AS has_urgent,
        |  starts_with(o_orderpriority, '1') AS is_one,
        |  o_orderpriority LIKE '%LOW' AS is_low,
        |  split_part(o_orderpriority, '-', 2) AS pri_word
        |FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""".stripMargin,
    "fn_datetime2" ->
      """SELECT o_orderkey,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m,
        |  CAST(quarter(o_orderdate) AS INT) AS q,
        |  CAST(dayofweek(o_orderdate) AS INT) AS dow0,
        |  strftime(o_orderdate, '%Y-%m') AS ym,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        |  CAST(dayofyear(o_orderdate) AS INT) AS doy
        |FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""".stripMargin,
    "fn_string" ->
      """SELECT o_orderkey,
        |  lower(o_orderpriority) AS lo, upper(o_orderstatus) AS up,
        |  trim('  pad  ') AS trimmed,
        |  substring(o_orderpriority, 1, 1) AS pri_code,
        |  o_orderstatus || '|' || o_orderpriority AS cat,
        |  CAST(length(o_orderpriority) AS INT) AS len,
        |  regexp_extract(o_orderpriority, '(\d+)', 1) AS pri_num,
        |  regexp_replace(o_orderpriority, '[AEIOU]', '_', 'g') AS devowel,
        |  lpad(CAST(o_orderkey AS VARCHAR), 8, '0') AS okey_pad,
        |  o_orderpriority LIKE '%URGENT%' AS is_urgent,
        |  hex(o_orderkey) AS okey_hex,
        |  base64(CAST(o_orderpriority AS BLOB)) AS pri_b64,
        |  o_orderpriority AS pri_roundtrip
        |FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""".stripMargin,
    "fn_datetime" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS y,
        |  CAST(month(o_orderdate) AS INT) AS m,
        |  CAST(dayofmonth(o_orderdate) AS INT) AS dom,
        |  CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP) AS qtr,
        |  CAST(o_orderdate AS DATE) AS odate,
        |  CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
        |  CAST(o_orderdate AS DATE) + 30 AS due,
        |  last_day(CAST(o_orderdate AS DATE)) AS eom
        |FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""".stripMargin,
    "fn_math" ->
      """SELECT o_orderkey,
        |  round(o_totalprice, 1) AS rounded,
        |  abs(o_totalprice * -1) AS absval,
        |  CAST(ceil(o_totalprice) AS BIGINT) AS ceiled,
        |  CAST(floor(o_totalprice) AS BIGINT) AS floored,
        |  pow(2.0, o_orderkey % 10) AS pow2,
        |  round(ln(o_totalprice + 1), 4) AS ln_p,
        |  sqrt(CAST(o_orderkey AS DOUBLE)) AS sq,
        |  o_orderkey % 7 AS mod7,
        |  o_orderkey % 7 AS rem7
        |FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""".stripMargin,
    "fn_cond" ->
      """SELECT l_orderkey, l_linenumber,
        |  CASE WHEN l_quantity < 10 THEN 'low'
        |       WHEN l_quantity < 35 THEN 'mid' ELSE 'high' END AS qty_band,
        |  COALESCE(NULLIF(l_returnflag, 'N'), 'none') AS rf_or_none,
        |  COALESCE(NULLIF(l_linestatus, 'F'), 'closed') AS ls_nvl,
        |  (l_quantity > 25 AND l_returnflag = 'R') AS heavy_return
        |FROM lineitem WHERE l_orderkey < 500
        |ORDER BY l_orderkey, l_linenumber, qty_band, rf_or_none, ls_nvl, heavy_return""".stripMargin,
    "fn_array" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INT) AS n_words,
        |  list_contains(string_split(text, ' '), 'spark') AS has_spark,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_distinct,
        |  list_sort(list_distinct(string_split(text, ' ')))[1] AS first_word,
        |  CAST(length(replace(text, ' ', '')) AS INT) AS sum_word_len,
        |  CAST(len(list_filter(string_split(text, ' '), w -> length(w) > 4)) AS INT) AS n_long
        |FROM documents ORDER BY doc_id""".stripMargin,
    "fn_map" ->
      """SELECT o_orderkey, k, v FROM (
        |  SELECT o_orderkey, 'status' AS k, o_orderstatus AS v FROM orders WHERE o_orderkey < 300
        |  UNION ALL
        |  SELECT o_orderkey, 'priority' AS k, o_orderpriority AS v FROM orders WHERE o_orderkey < 300
        |) ORDER BY o_orderkey, k""".stripMargin,
    "fn_json" ->
      """SELECT event_id,
        |  CAST(json_extract(props, '$.k') AS INT) AS k_val,
        |  CAST(json_extract(props, '$.k') AS INT) AS k_struct,
        |  '{"t":"' || event_type || '"}' AS rejson
        |FROM events WHERE event_id < 500 ORDER BY event_id""".stripMargin
  )
}
