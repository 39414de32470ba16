package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar function surface — the Hive FunctionRegistry namespace
  * (reference engine: ql/exec/FunctionRegistry + GenericUDF* family),
  * which Spark inherits almost verbatim. Grouped into wide projection
  * "packs" so each function is exercised by at least one oracled query.
  *
  * All functions here are Catalyst built-ins (codegen'd) — no Scala UDFs —
  * so every pack stays inside whole-stage codegen and is 100 TB-safe by
  * construction (pure per-row projections, no shuffle at all).
  *
  * Engine-portability notes per pack are inline; functions DuckDB cannot
  * express (soundex, conv, next_day, months_between, parse_url, str_to_map,
  * sentences) live in qMiscPack (rows-only check) + unit tests.
  */
object Functions extends QueryPack {

  /** String pack over customer (c_custkey is unique → stable sort). */
  def qStrPack(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.df(spark, sfDir, "customer")
      .filter($"c_custkey" % 25 === 0)
      .select(
        $"c_custkey",
        concat($"c_name", lit("|"), $"c_mktsegment").as("cat"),
        concat_ws("-", $"c_mktsegment", $"c_name").as("catws"),
        lower($"c_mktsegment").as("lo"),
        upper($"c_name").as("up"),
        initcap($"c_mktsegment").as("ic"),
        length($"c_name").as("len"),
        reverse($"c_mktsegment").as("rev"),
        repeat($"c_mktsegment", 2).as("rep"),
        lpad($"c_custkey".cast("string"), 8, "0").as("pad"),
        rtrim(rpad($"c_mktsegment", 12, " ")).as("trimmed"),
        substring($"c_name", 1, 8).as("sub"),
        instr($"c_name", "#").as("pos"),
        translate($"c_mktsegment", "AEIOU", "aeiou").as("tr"),
        regexp_extract($"c_name", "(\\d+)", 1).as("digits"),
        regexp_replace($"c_name", "\\d", "#").as("masked"),
        format_string("%s/%d", $"c_mktsegment", $"c_custkey").as("fmt"),
        ascii($"c_mktsegment").as("asc"),
        levenshtein($"c_mktsegment", lit("BUILDING")).as("lev"),
        base64(encode($"c_mktsegment", "UTF-8")).as("b64"),
        array_join(split($"c_name", "#"), "~").as("splitjoin"))
      .orderBy($"c_custkey")
  }

  /** Date/time pack over orders + a timestamp sample from events. */
  def qDatePack(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.df(spark, sfDir, "orders")
      .filter($"o_orderkey" % 100 === 0)
      .select(
        $"o_orderkey",
        year($"o_orderdate").as("y"),
        quarter($"o_orderdate").as("q"),
        month($"o_orderdate").as("m"),
        dayofmonth($"o_orderdate").as("d"),
        weekofyear($"o_orderdate").as("woy"),
        to_date($"o_orderdate").as("dt"),
        date_add(to_date($"o_orderdate"), 30).as("plus30"),
        date_sub(to_date($"o_orderdate"), 7).as("minus7"),
        add_months(to_date($"o_orderdate"), 2).as("plus2m"),
        last_day($"o_orderdate").as("eom"),
        trunc(to_date($"o_orderdate"), "MM").as("som"),
        date_format($"o_orderdate", "yyyy-MM-dd HH").as("fmt"),
        datediff(to_date(lit("2002-01-01")), to_date($"o_orderdate"))
          .as("days_to_2002"),
        unix_timestamp($"o_orderdate").as("epoch_s"),
        from_unixtime(unix_timestamp($"o_orderdate")).as("roundtrip"))
      .orderBy($"o_orderkey")
  }

  /** Time-of-day pack over events (the fixture with intraday timestamps):
    * hour/minute/second, day-of-week/-year, epoch millis, hour truncation,
    * make_date reconstruction. */
  def qDatePack2(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.df(spark, sfDir, "events")
      .filter($"event_id" % 20 === 0)
      .select(
        $"event_id",
        hour($"ts").as("h"),
        minute($"ts").as("mi"),
        second($"ts").as("s"),
        dayofweek($"ts").as("dow"), // 1 = Sunday (Hive/Spark convention)
        dayofyear($"ts").as("doy"),
        unix_millis($"ts".cast("timestamp")).as("ep_ms"),
        date_trunc("hour", $"ts").cast("timestamp_ntz").as("hr"),
        make_date(year($"ts"), month($"ts"), dayofmonth($"ts")).as("md"))
      .orderBy($"event_id")
  }

  /** Math pack over part. Transcendentals rounded to 6 decimals — JVM libm
    * and DuckDB's C libm may differ in the last ulp. */
  def qMathPack(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.df(spark, sfDir, "part")
      .filter($"p_partkey" % 20 === 0)
      .select(
        $"p_partkey",
        round($"p_retailprice", 1).as("rnd"),
        floor($"p_retailprice").as("flr"),
        ceil($"p_retailprice").as("cl"),
        round(exp($"p_size" / lit(25.0)), 6).as("ex"),
        round(log($"p_retailprice"), 6).as("ln_"),
        round(log10($"p_retailprice"), 6).as("l10"),
        round(log2($"p_size".cast("double")), 6).as("l2"),
        round(pow($"p_size", 2), 1).as("pw"),
        round(sqrt($"p_retailprice"), 6).as("sq"),
        round(cbrt($"p_retailprice"), 6).as("cb"),
        abs($"p_size" - 25).as("ab"),
        pmod($"p_size" - 25, lit(7)).as("pm"),
        round(sin($"p_size" / lit(10.0)), 6).as("sn"),
        round(atan($"p_size" / lit(10.0)), 6).as("at"),
        round(degrees($"p_size" / lit(10.0)), 6).as("dg"),
        signum($"p_size" - 25).cast("int").as("sg"),
        factorial(($"p_size" % 10).cast("int")).as("fact"),
        hex($"p_size").as("hx"),
        bin($"p_size").as("bn"),
        shiftleft($"p_size", 2).as("shl"))
      .orderBy($"p_partkey")
  }

  /** JSON pack over events.props (a JSON string column — the fixture's
    * stand-in for Hive's get_json_object/json_tuple surface). */
  def qJsonPack(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.df(spark, sfDir, "events")
      .filter($"event_id" % 10 === 0)
      .select(
        $"event_id",
        get_json_object($"props", "$.k").as("k_str"),
        get_json_object($"props", "$.k").cast("int").as("k_int"),
        from_json($"props", lit("k INT")).getField("k").as("k_parsed"),
        get_json_object($"props", "$.missing").as("k_missing"))
      .orderBy($"event_id")
  }

  /** Conditional pack: CASE/IF/COALESCE/NVL/NULLIF/GREATEST/LEAST and the
    * null-safe equality operator. */
  def qCondPack(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.df(spark, sfDir, "lineitem")
      .filter($"l_orderkey" % 100 === 0)
      .select(
        $"l_orderkey", $"l_linenumber", $"l_quantity", $"l_discount",
        $"l_tax", $"l_returnflag",
        when($"l_returnflag" === "R", "returned")
          .when($"l_returnflag" === "A", "ack")
          .otherwise("none").as("flag_desc"),
        expr("if(l_quantity > 25, 'H', 'L')").as("qty_class"),
        nullif($"l_discount", lit(0.0)).as("disc_or_null"),
        coalesce(nullif($"l_discount", lit(0.0)), lit(-1.0)).as("disc_nvl"),
        greatest($"l_discount", $"l_tax").as("gr"),
        least($"l_discount", $"l_tax").as("ls"),
        ($"l_discount" <=> lit(0.05)).as("is_5pct"))
      // lineitem has no unique key: sort by every selected column so the
      // only remaining ties are fully-identical output rows
      .orderBy($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_discount",
        $"l_tax", $"l_returnflag")
  }

  /** Hive-surface functions DuckDB CAN mirror (via to_hex, date
    * arithmetic, and regexp equivalents): conv, next_day, months_between,
    * str_to_map extraction, parse_url HOST/QUERY — the oracle-checkable
    * half of the former misc pack. */
  def qMiscSql(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val url = concat(lit("https://example.com/seg/"), lower($"c_mktsegment"),
      lit("?id="), $"c_custkey")
    Tables.df(spark, sfDir, "customer")
      .filter($"c_custkey" % 100 === 0)
      .select(
        $"c_custkey",
        conv($"c_custkey".cast("string"), 10, 16).as("cv"),
        next_day(to_date($"c_custkey".cast("timestamp")), "Mon").as("nd"),
        months_between(to_date(lit("2000-06-15")),
          to_date(lit("2000-01-15"))).as("mb"),
        str_to_map(concat(lit("seg:"), $"c_mktsegment", lit(",id:"),
          $"c_custkey"), lit(","), lit(":")).getField("seg").as("seg"),
        parse_url(url, lit("HOST")).as("host"),
        parse_url(url, lit("QUERY"), lit("id")).as("qid"))
      .orderBy($"c_custkey")
  }

  /** Functions DuckDB genuinely can't mirror: soundex, sentences, xpath,
    * crc32/sha1/xxhash64, and the INPUT__FILE__NAME virtual column.
    * Rows-only driver check + ScalaTest assertions (MiscFunctionsSpec);
    * the DuckDB-expressible half lives in [[qMiscSql]]. */
  def qMiscPack(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.df(spark, sfDir, "customer")
      .filter($"c_custkey" % 100 === 0)
      .select(
        $"c_custkey",
        soundex($"c_mktsegment").as("sdx"),
        // to_json: array<array<string>> would crash the driver's pandas sort
        to_json(sentences(concat($"c_name", lit(". The end.")))).as("sents"),
        expr(s"xpath_string(concat('<r><k>', c_custkey, '</k></r>'), 'r/k')")
          .as("xp"),
        expr("xpath_int(concat('<r><k>', c_custkey, '</k></r>'), 'r/k')")
          .as("xp_int"),
        size(expr("xpath(concat('<r><k>1</k><k>2</k></r>'), 'r/k/text()')"))
          .as("xp_arr_n"),
        crc32($"c_name".cast("binary")).as("crc"),
        sha1($"c_name".cast("binary")).as("sh1"),
        xxhash64($"c_name").as("xx64"),
        element_at(split(input_file_name(), "/"), -1).as("src_file"))
      .orderBy($"c_custkey")
  }

  /** Collection (array) function surface — Hive's size/array_contains/
    * sort_array family plus the modern Spark extensions. */
  def qCollectionPack(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val toks = expr("filter(split(lower(text), ' '), x -> x != '')")
    Tables.df(spark, sfDir, "documents")
      .filter($"doc_id" % 10 === 0)
      .select(
        $"doc_id",
        size(toks).as("n_tok"),
        array_contains(toks, "the").as("has_the"),
        array_position(toks, "the").cast("int").as("the_pos"),
        element_at(toks, 1).as("first_tok"),
        element_at(toks, -1).as("last_tok"),
        array_join(slice(sort_array(array_distinct(toks)), 1, 3), ",")
          .as("top3_sorted"),
        size(array_distinct(toks)).as("n_distinct"),
        size(flatten(array(toks, array(lit("x"))))).as("n_plus_one"),
        array_join(sequence(lit(1), lit(3)).cast("array<string>"), "-")
          .as("seq13"),
        array_max(transform(toks, t => length(t))).as("max_len"),
        aggregate(transform(toks, t => length(t)), lit(0),
          (acc, x) => acc + x).as("sum_len"))
      .orderBy($"doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_collection_pack" -> qCollectionPack,
    "q_str_pack" -> qStrPack,
    "q_date_pack" -> qDatePack,
    "q_date_pack2" -> qDatePack2,
    "q_math_pack" -> qMathPack,
    "q_json_pack" -> qJsonPack,
    "q_cond_pack" -> qCondPack,
    "q_misc_sql" -> qMiscSql,
    "q_misc_pack" -> qMiscPack
  )

  val oracle: Map[String, String] = Map(
    "q_collection_pack" ->
      """SELECT doc_id,
        |  CAST(len(T) AS INT) AS n_tok,
        |  list_contains(T, 'the') AS has_the,
        |  CAST(COALESCE(list_position(T, 'the'), 0) AS INT) AS the_pos,
        |  T[1] AS first_tok,
        |  T[-1] AS last_tok,
        |  array_to_string(list_sort(list_distinct(T))[1:3], ',') AS top3_sorted,
        |  CAST(len(list_distinct(T)) AS INT) AS n_distinct,
        |  CAST(len(flatten([T, ['x']])) AS INT) AS n_plus_one,
        |  array_to_string(list_transform(range(1, 4), x -> CAST(x AS VARCHAR)), '-')
        |    AS seq13,
        |  CAST(list_max(list_transform(T, t -> length(t))) AS INT) AS max_len,
        |  CAST(list_reduce(list_prepend(0::BIGINT,
        |    list_transform(T, t -> length(t))), (a, b) -> a + b) AS INT)
        |    AS sum_len
        |FROM (SELECT doc_id,
        |        list_filter(string_split(lower(text), ' '), x -> x != '') AS T
        |      FROM documents WHERE doc_id % 10 = 0)
        |ORDER BY doc_id""".stripMargin,

    "q_str_pack" ->
      """SELECT c_custkey,
        |  c_name || '|' || c_mktsegment AS cat,
        |  concat_ws('-', c_mktsegment, c_name) AS catws,
        |  lower(c_mktsegment) AS lo,
        |  upper(c_name) AS up,
        |  upper(substr(lower(c_mktsegment),1,1)) || substr(lower(c_mktsegment),2) AS ic,
        |  CAST(length(c_name) AS INT) AS len,
        |  reverse(c_mktsegment) AS rev,
        |  repeat(c_mktsegment, 2) AS rep,
        |  lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS pad,
        |  rtrim(rpad(c_mktsegment, 12, ' ')) AS trimmed,
        |  substr(c_name, 1, 8) AS sub,
        |  CAST(strpos(c_name, '#') AS INT) AS pos,
        |  translate(c_mktsegment, 'AEIOU', 'aeiou') AS tr,
        |  COALESCE(regexp_extract(c_name, '(\d+)', 1), '') AS digits,
        |  regexp_replace(c_name, '\d', '#', 'g') AS masked,
        |  printf('%s/%d', c_mktsegment, c_custkey) AS fmt,
        |  ascii(c_mktsegment) AS asc,
        |  CAST(levenshtein(c_mktsegment, 'BUILDING') AS INT) AS lev,
        |  base64(encode(c_mktsegment)) AS b64,
        |  array_to_string(string_split(c_name, '#'), '~') AS splitjoin
        |FROM customer WHERE c_custkey % 25 = 0
        |ORDER BY c_custkey""".stripMargin,

    "q_date_pack" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS y,
        |  CAST(quarter(o_orderdate) AS INT) AS q,
        |  CAST(month(o_orderdate) AS INT) AS m,
        |  CAST(day(o_orderdate) AS INT) AS d,
        |  CAST(weekofyear(o_orderdate) AS INT) AS woy,
        |  CAST(o_orderdate AS DATE) AS dt,
        |  CAST(o_orderdate AS DATE) + 30 AS plus30,
        |  CAST(o_orderdate AS DATE) - 7 AS minus7,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus2m,
        |  last_day(o_orderdate) AS eom,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS som,
        |  strftime(o_orderdate, '%Y-%m-%d %H') AS fmt,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT) AS days_to_2002,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
        |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS roundtrip
        |FROM orders WHERE o_orderkey % 100 = 0
        |ORDER BY o_orderkey""".stripMargin,

    "q_date_pack2" ->
      """SELECT event_id,
        |  CAST(hour(ts) AS INT) AS h,
        |  CAST(minute(ts) AS INT) AS mi,
        |  CAST(second(ts) AS INT) AS s,
        |  CAST(dayofweek(ts) + 1 AS INT) AS dow,
        |  CAST(dayofyear(ts) AS INT) AS doy,
        |  CAST(epoch_ms(date_trunc('millisecond', ts)) AS BIGINT) AS ep_ms,
        |  CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr,
        |  make_date(CAST(year(ts) AS BIGINT), CAST(month(ts) AS BIGINT),
        |    CAST(day(ts) AS BIGINT)) AS md
        |FROM events WHERE event_id % 20 = 0
        |ORDER BY event_id""".stripMargin,

    "q_math_pack" ->
      """SELECT p_partkey,
        |  round(p_retailprice, 1) AS rnd,
        |  CAST(floor(p_retailprice) AS BIGINT) AS flr,
        |  CAST(ceil(p_retailprice) AS BIGINT) AS cl,
        |  round(exp(p_size / 25.0), 6) AS ex,
        |  round(ln(p_retailprice), 6) AS ln_,
        |  round(log10(p_retailprice), 6) AS l10,
        |  round(log2(CAST(p_size AS DOUBLE)), 6) AS l2,
        |  round(pow(p_size, 2), 1) AS pw,
        |  round(sqrt(p_retailprice), 6) AS sq,
        |  round(cbrt(p_retailprice), 6) AS cb,
        |  abs(p_size - 25) AS ab,
        |  ((p_size - 25) % 7 + 7) % 7 AS pm,
        |  round(sin(p_size / 10.0), 6) AS sn,
        |  round(atan(p_size / 10.0), 6) AS at,
        |  round(degrees(p_size / 10.0), 6) AS dg,
        |  CAST(CASE WHEN p_size > 25 THEN 1 WHEN p_size < 25 THEN -1 ELSE 0 END AS INT) AS sg,
        |  CAST(factorial(p_size % 10) AS BIGINT) AS fact,
        |  hex(p_size) AS hx,
        |  bin(p_size) AS bn,
        |  p_size << 2 AS shl
        |FROM part WHERE p_partkey % 20 = 0
        |ORDER BY p_partkey""".stripMargin,

    "q_json_pack" ->
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k_parsed,
        |  json_extract_string(props, '$.missing') AS k_missing
        |FROM events WHERE event_id % 10 = 0
        |ORDER BY event_id""".stripMargin,

    "q_cond_pack" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax,
        |  l_returnflag,
        |  CASE WHEN l_returnflag = 'R' THEN 'returned'
        |       WHEN l_returnflag = 'A' THEN 'ack'
        |       ELSE 'none' END AS flag_desc,
        |  CASE WHEN l_quantity > 25 THEN 'H' ELSE 'L' END AS qty_class,
        |  nullif(l_discount, 0.0) AS disc_or_null,
        |  coalesce(nullif(l_discount, 0.0), -1.0) AS disc_nvl,
        |  greatest(l_discount, l_tax) AS gr,
        |  least(l_discount, l_tax) AS ls,
        |  l_discount IS NOT DISTINCT FROM 0.05 AS is_5pct
        |FROM lineitem WHERE l_orderkey % 100 = 0
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount,
        |  l_tax, l_returnflag""".stripMargin,
    // DuckDB has no conv/next_day/str_to_map/parse_url: to_hex + date
    // arithmetic (next Monday via isodow) + regexp extraction reproduce
    // the same values exactly. epoch_ms keeps the timestamp naive (the
    // session TZ is UTC on the Spark side).
    "q_misc_sql" ->
      """WITH c AS (
        |  SELECT c_custkey, c_mktsegment,
        |    CAST(epoch_ms(c_custkey * 1000) AS DATE) AS d,
        |    'https://example.com/seg/' || lower(c_mktsegment)
        |      || '?id=' || CAST(c_custkey AS VARCHAR) AS url
        |  FROM customer WHERE c_custkey % 100 = 0)
        |SELECT c_custkey,
        |  upper(to_hex(c_custkey)) AS cv,
        |  d + CAST(CASE WHEN (8 - isodow(d)) % 7 = 0 THEN 7
        |        ELSE (8 - isodow(d)) % 7 END AS INT) AS nd,
        |  CAST(5.0 AS DOUBLE) AS mb,
        |  regexp_extract('seg:' || c_mktsegment || ',id:'
        |      || CAST(c_custkey AS VARCHAR), 'seg:([^,]*)', 1) AS seg,
        |  regexp_extract(url, 'https?://([^/?#]+)', 1) AS host,
        |  regexp_extract(url, '[?&]id=([^&#]*)', 1) AS qid
        |FROM c ORDER BY c_custkey""".stripMargin
    // q_misc_pack: intentionally no oracle (DuckDB lacks soundex,
    // sentences, xpath, crc32/sha1/xxhash64, input_file_name)
  )
}
