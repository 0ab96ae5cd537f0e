package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType
import graft.TestData
import graft.TestData.r4

/** §2.H scalar functions: string / regex / date / math / conditional /
  * array / explode / json / map (SURVEY.md).
  *
  * All built-ins — codegen'd, no UDFs. Dialect traps handled in the
  * oracles: DuckDB `regexp_replace` needs the 'g' flag to match
  * Spark's replace-all; `generate_subscripts` is 1-based vs
  * `posexplode` 0-based; array outputs are reshaped to scalars.
  */
object ScalarFns {
  type Q = (SparkSession, String) => DataFrame

  val defs: Map[String, Q] = Map(
    "fn_string" -> ((s, d) =>
      TestData.part(s, d)
        .select(col("p_partkey"),
          lower(col("p_name")).as("lo"),
          upper(col("p_brand")).as("up"),
          trim(concat(lit("  "), col("p_type"), lit(" "))).as("trimmed"),
          substring(col("p_name"), 1, 5).as("sub5"),
          concat_ws("|", col("p_brand"), col("p_type")).as("joined"),
          lpad(col("p_brand"), 12, "*").as("padded"),
          length(col("p_name")).as("name_len"),
          regexp_replace(col("p_name"), lit(" "), lit("_")).as("snake"),
          levenshtein(col("p_name"), col("p_brand")).as("lev"))
        .orderBy("p_partkey")),

    "fn_regex" -> ((s, d) =>
      TestData.part(s, d)
        .select(col("p_partkey"),
          regexp_extract(col("p_brand"), "[0-9]+", 0).as("brand_num"),
          regexp_replace(col("p_type"), "[AEIOU]", "_").as("devoweled"),
          col("p_type").rlike("^(PROMO|LARGE)").as("is_promo_or_large"))
        .orderBy("p_partkey")),

    "fn_date" -> ((s, d) =>
      TestData.orders(s, d)
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          quarter(col("o_orderdate")).as("q"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("dom"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          date_add(col("o_orderdate"), 30).cast("timestamp").as("due_date"),
          datediff(lit("2002-01-01").cast("timestamp"), col("o_orderdate"))
            .as("days_to_2002"))
        .orderBy("o_orderkey")),

    "fn_math" -> ((s, d) =>
      TestData.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          floor(col("l_extendedprice")).as("fl"),
          ceil(col("l_extendedprice")).as("ce"),
          r4(abs(col("l_discount") - lit(0.05))).as("abs_d"),
          r4(pow(col("l_quantity"), 2)).as("qty_sq"),
          r4(sqrt(col("l_extendedprice"))).as("sq"),
          r4(log(col("l_extendedprice"))).as("ln_p"),
          r4(log10(col("l_extendedprice"))).as("log10_p"),
          r4(exp(col("l_discount"))).as("exp_d"),
          (col("l_partkey") % 7).as("mod7"))
        // non-unique fixture key: the r4/integer outputs complete the
        // total order (fl/ce suffice to separate distinct rows)
        .orderBy("l_orderkey", "l_linenumber", "fl", "abs_d", "qty_sq",
          "mod7")),

    "fn_bitwise" -> ((s, d) =>
      TestData.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_partkey").bitwiseAND(lit(255L)).as("band"),
          col("l_partkey").bitwiseOR(col("l_suppkey")).as("bor"),
          col("l_partkey").bitwiseXOR(col("l_suppkey")).as("bxor"),
          shiftleft(col("l_linenumber"), 2).as("shl"),
          shiftright(col("l_partkey"), 3).as("shr"),
          bit_count(col("l_partkey")).as("bits"))
        // non-unique fixture key: integer outputs complete the order
        .orderBy("l_orderkey", "l_linenumber", "bor", "bxor")),

    // ANSI-SAFE arithmetic (Spark 4 default ANSI mode throws on
    // overflow / div-by-zero / bad casts — the `try_` family returns
    // NULL instead, the posture batch pipelines need so one poison
    // row can't kill a 100 TB job). Each NULL is coalesced to a
    // sentinel so the oracle compare carries no nullable columns.
    "fn_try_safe" -> ((s, d) =>
      TestData.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          // zero denominator on line 3 → NULL, not an exception
          coalesce(r4(expr("try_divide(l_extendedprice, l_linenumber - 3)")),
            lit(-1.0)).as("safe_div"),
          // l_orderkey ≥ 0, so +1 makes the add always overflow → NULL
          coalesce(expr(s"try_add(l_orderkey + 1L, ${Long.MaxValue}L)"),
            lit(-1L)).as("safe_add"),
          // non-numeric cast → NULL
          coalesce(expr("try_cast(l_returnflag AS INT)"), lit(-1))
            .as("safe_cast"))
        .orderBy("l_orderkey", "l_linenumber", "safe_div")),

    "fn_conditional" -> ((s, d) =>
      TestData.orders(s, d)
        .select(col("o_orderkey"),
          when(col("o_totalprice") > 300000.0, lit("big"))
            .when(col("o_totalprice") > 100000.0, lit("mid"))
            .otherwise(lit("small")).as("size_class"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open"))
            .as("status_or_open"),
          greatest(col("o_totalprice"), lit(150000.0)).as("floor_price"),
          least(col("o_totalprice"), lit(150000.0)).as("capped_price"))
        .orderBy("o_orderkey")),

    "fn_array" -> ((s, d) =>
      TestData.documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .select(col("doc_id"),
          size(col("toks")).as("n_tokens"),
          array_contains(col("toks"), "the").as("has_the"),
          size(array_distinct(col("toks"))).as("n_distinct"),
          array_sort(col("toks")).getItem(0).as("first_sorted"),
          array_join(slice(col("toks"), 1, 3), ",").as("first3"),
          array_join(transform(col("toks"), t => upper(t)), " ").as("upper_text"),
          size(filter(col("toks"), t => length(t) > 4)).as("n_long"),
          aggregate(col("toks"), lit(0),
            (acc, t) => acc + length(t)).as("sum_len"))
        .orderBy("doc_id")),

    "fn_explode" -> ((s, d) =>
      TestData.documents(s, d)
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .withColumnRenamed("col", "token")
        .select("doc_id", "pos", "token")
        .orderBy("doc_id", "pos")),

    "fn_json" -> ((s, d) =>
      TestData.events(s, d)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast(IntegerType).as("k_path"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("k", IntegerType))))
            .getField("k").as("k_schema"))
        .orderBy("event_id")),

    "fn_map" -> ((s, d) =>
      TestData.events(s, d)
        .withColumn("m", map_from_arrays(
          array(lit("k")),
          array(get_json_object(col("props"), "$.k").cast(IntegerType))))
        .select(col("event_id"),
          array_join(map_keys(col("m")), ",").as("keys"),
          element_at(col("m"), "k").as("k_value"),
          size(map_values(col("m"))).as("n_values"))
        .orderBy("event_id")),

    // Cryptographic digests: engine-independent by definition (md5 /
    // sha-256 are specs, not float math) — the workhorse of exact
    // dedup and content-addressed caching. crc32/xxhash64 exist in
    // Spark but have no DuckDB 1.0 counterpart, so only the portable
    // pair is declared.
    "fn_hash" -> ((s, d) =>
      TestData.part(s, d)
        .select(col("p_partkey"),
          md5(col("p_name")).as("h_md5"),
          sha2(col("p_name"), 256).as("h_sha256"),
          md5(concat_ws("|", col("p_brand"), col("p_type"))).as("h_key"))
        .orderBy("p_partkey")),

    // Struct construction / field access / nested access / structural
    // equality — the typed-record surface (multimodal metadata rides
    // in exactly these). Structs are reshaped to scalars on output
    // (cross-engine struct parquet encodings differ); the nested field
    // is named `inr` because INNER is a DuckDB keyword.
    "fn_struct" -> ((s, d) =>
      TestData.orders(s, d)
        .withColumn("st",
          struct(col("o_orderkey").as("k"), col("o_totalprice").as("p")))
        .withColumn("nested",
          struct(struct((col("o_orderkey") * 2).as("q")).as("inr")))
        .select(col("o_orderkey"),
          col("st.p").as("price_field"),
          col("nested.inr.q").as("nested_q"),
          (col("st") === struct(col("o_orderkey").as("k"),
            col("o_totalprice").as("p"))).cast("int").as("eq_rebuilt"))
        .orderBy("o_orderkey")),

    // URL parsing (`parse_url`) over deterministically synthesized
    // crawl-style URLs — the normalization step every web-corpus
    // pipeline runs before URL dedup. The oracle reconstructs the
    // same components from the generating columns, so the check pins
    // parse_url's HOST/PATH/QUERY/param semantics against an
    // independent derivation. Pure map-side projection.
    "fn_url_parse" -> ((s, d) =>
      TestData.documents(s, d)
        .withColumn("url", concat(lit("https://"), col("source"),
          lit(".example.com/"), col("lang"), lit("/doc/"),
          col("doc_id").cast("string"), lit("?k="),
          col("n_chars").cast("string"), lit("&l="), col("lang")))
        .select(col("doc_id"),
          parse_url(col("url"), lit("HOST")).as("host"),
          parse_url(col("url"), lit("PATH")).as("path"),
          parse_url(col("url"), lit("QUERY")).as("query"),
          parse_url(col("url"), lit("QUERY"), lit("k")).cast("long")
            .as("k_param"))
        .orderBy("doc_id"))
  )

  val oracles: Map[String, String] = Map(
    "fn_hash" ->
      """SELECT p_partkey,
        |  md5(p_name) AS h_md5,
        |  sha256(p_name) AS h_sha256,
        |  md5(concat_ws('|', p_brand, p_type)) AS h_key
        |FROM part ORDER BY p_partkey""".stripMargin,
    "fn_string" ->
      """SELECT p_partkey,
        |  lower(p_name) AS lo, upper(p_brand) AS up,
        |  trim('  ' || p_type || ' ') AS trimmed,
        |  substring(p_name, 1, 5) AS sub5,
        |  concat_ws('|', p_brand, p_type) AS joined,
        |  lpad(p_brand, 12, '*') AS padded,
        |  length(p_name) AS name_len,
        |  replace(p_name, ' ', '_') AS snake,
        |  levenshtein(p_name, p_brand) AS lev
        |FROM part ORDER BY p_partkey""".stripMargin,
    "fn_regex" ->
      """SELECT p_partkey,
        |  regexp_extract(p_brand, '[0-9]+') AS brand_num,
        |  regexp_replace(p_type, '[AEIOU]', '_', 'g') AS devoweled,
        |  regexp_matches(p_type, '^(PROMO|LARGE)') AS is_promo_or_large
        |FROM part ORDER BY p_partkey""".stripMargin,
    "fn_date" ->
      """SELECT o_orderkey,
        |  year(o_orderdate) AS y, quarter(o_orderdate) AS q,
        |  month(o_orderdate) AS m, day(o_orderdate) AS dom,
        |  date_trunc('month', o_orderdate) AS month_start,
        |  (o_orderdate::DATE + 30)::TIMESTAMP AS due_date,
        |  date_diff('day', o_orderdate::DATE, DATE '2002-01-01') AS days_to_2002
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "fn_try_safe" ->
      """SELECT l_orderkey, l_linenumber,
        |  coalesce(CASE WHEN l_linenumber = 3 THEN NULL
        |    ELSE floor((l_extendedprice / (l_linenumber - 3))*10000 + 0.5)/10000
        |    END, -1.0) AS safe_div,
        |  -1::BIGINT AS safe_add,
        |  coalesce(try_cast(l_returnflag AS INT), -1) AS safe_cast
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, safe_div""".stripMargin,
    "fn_math" ->
      """SELECT l_orderkey, l_linenumber,
        |  floor(l_extendedprice)::BIGINT AS fl, ceil(l_extendedprice)::BIGINT AS ce,
        |  floor((abs(l_discount - 0.05))*10000 + 0.5)/10000 AS abs_d,
        |  floor((pow(l_quantity, 2))*10000 + 0.5)/10000 AS qty_sq,
        |  floor((sqrt(l_extendedprice))*10000 + 0.5)/10000 AS sq,
        |  floor((ln(l_extendedprice))*10000 + 0.5)/10000 AS ln_p,
        |  floor((log10(l_extendedprice))*10000 + 0.5)/10000 AS log10_p,
        |  floor((exp(l_discount))*10000 + 0.5)/10000 AS exp_d,
        |  l_partkey % 7 AS mod7
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, fl, abs_d, qty_sq, mod7""".stripMargin,
    "fn_bitwise" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_partkey & 255 AS band,
        |  l_partkey | l_suppkey AS bor,
        |  xor(l_partkey, l_suppkey) AS bxor,
        |  l_linenumber << 2 AS shl,
        |  l_partkey >> 3 AS shr,
        |  bit_count(l_partkey) AS bits
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, bor, bxor""".stripMargin,
    "fn_conditional" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 300000.0 THEN 'big'
        |       WHEN o_totalprice > 100000.0 THEN 'mid'
        |       ELSE 'small' END AS size_class,
        |  coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_or_open,
        |  greatest(o_totalprice, 150000.0) AS floor_price,
        |  least(o_totalprice, 150000.0) AS capped_price
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "fn_array" ->
      """SELECT doc_id,
        |  len(toks) AS n_tokens,
        |  list_contains(toks, 'the') AS has_the,
        |  len(list_distinct(toks)) AS n_distinct,
        |  list_sort(toks)[1] AS first_sorted,
        |  array_to_string(toks[1:3], ',') AS first3,
        |  array_to_string(list_transform(toks, t -> upper(t)), ' ') AS upper_text,
        |  len(list_filter(toks, t -> length(t) > 4)) AS n_long,
        |  list_sum(list_transform(toks, t -> length(t)))::INT AS sum_len
        |FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "fn_explode" ->
      """SELECT doc_id, i AS pos, toks[i + 1] AS token
        |FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |     LATERAL (SELECT unnest(range(len(toks))) AS i) r
        |ORDER BY doc_id, pos""".stripMargin,
    "fn_json" ->
      """SELECT event_id,
        |  json_extract(props, '$.k')::INT AS k_path,
        |  json_extract(props, '$.k')::INT AS k_schema
        |FROM events ORDER BY event_id""".stripMargin,
    "fn_map" ->
      """SELECT event_id, 'k' AS keys,
        |  json_extract(props, '$.k')::INT AS k_value,
        |  1 AS n_values
        |FROM events ORDER BY event_id""".stripMargin,
    "fn_struct" ->
      """SELECT o_orderkey,
        |  struct_pack(k := o_orderkey, p := o_totalprice).p AS price_field,
        |  struct_pack(inr := struct_pack(q := o_orderkey * 2)).inr.q AS nested_q,
        |  (struct_pack(k := o_orderkey, p := o_totalprice)
        |    = struct_pack(k := o_orderkey, p := o_totalprice))::INT AS eq_rebuilt
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    // Independent derivation: rebuild each URL component from the
    // generating columns instead of string-parsing — pins Spark's
    // parse_url against construction, not parser-vs-parser.
    "fn_url_parse" ->
      """SELECT doc_id,
        |  source || '.example.com' AS host,
        |  '/' || lang || '/doc/' || doc_id AS path,
        |  'k=' || n_chars || '&l=' || lang AS query,
        |  n_chars::BIGINT AS k_param
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
