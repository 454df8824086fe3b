package graft.ops

import graft.{Q, Tables, util}
import org.apache.spark.sql.functions._

/** §2.8 scalar function tier. Everything here is a codegen'd built-in
  * (`org.apache.spark.sql.functions._`) — no UDFs in the hot path, so the
  * whole projection stays inside one WholeStageCodegen span at any scale.
  *
  * Cross-engine notes baked into the oracles:
  *  - Spark `dayofweek` is 1=Sunday..7; DuckDB `dayofweek` is 0=Sunday..6.
  *  - Spark `year()/month()` return INT; DuckDB's return BIGINT → cast.
  *  - DuckDB `regexp_replace` needs the 'g' flag to match Spark's
  *    replace-all semantics.
  *  - libm `ln/sqrt` may differ in the last ulp → r2-rounded.
  */
object ScalarFns {

  val defs: Seq[Q] = Seq(
    Q(
      "fn_string_core",
      (s, dir) => {
        Tables(s, dir, "part")
          .select(
            col("p_partkey"),
            substring(col("p_name"), 1, 8).as("name8"),
            lower(col("p_name")).as("name_lo"),
            upper(col("p_brand")).as("brand_up"),
            trim(col("p_type")).as("type_trim"),
            concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
            lpad(col("p_size").cast("string"), 4, "0").as("size_pad"),
            length(col("p_name")).cast("long").as("name_len"))
          .orderBy(col("p_partkey"))
      },
      Some("""SELECT p_partkey,
             |       substring(p_name, 1, 8) AS name8,
             |       lower(p_name) AS name_lo,
             |       upper(p_brand) AS brand_up,
             |       trim(p_type) AS type_trim,
             |       concat_ws('-', p_brand, p_type) AS brand_type,
             |       lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
             |       CAST(length(p_name) AS BIGINT) AS name_len
             |FROM part ORDER BY p_partkey""".stripMargin)
    ),
    Q(
      "fn_regexp",
      (s, dir) => {
        Tables(s, dir, "part")
          .select(
            col("p_partkey"),
            regexp_extract(col("p_brand"), "Brand#(\\d+)", 1).as("brand_num"),
            regexp_replace(col("p_name"), "[aeiou]", "_").as("name_devowel"),
            col("p_name").rlike("^[a-m]").as("starts_am"))
          .orderBy(col("p_partkey"))
      },
      Some("""SELECT p_partkey,
             |       coalesce(regexp_extract(p_brand, 'Brand#(\d+)', 1), '') AS brand_num,
             |       regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_devowel,
             |       regexp_matches(p_name, '^[a-m]') AS starts_am
             |FROM part ORDER BY p_partkey""".stripMargin)
    ),
    Q(
      "fn_date_core",
      (s, dir) => {
        Tables(s, dir, "orders")
          .select(
            col("o_orderkey"),
            date_trunc("month", col("o_orderdate")).cast("timestamp_ntz").as("month_start"),
            year(col("o_orderdate")).cast("long").as("yr"),
            month(col("o_orderdate")).cast("long").as("mo"),
            (dayofweek(col("o_orderdate")) - 1).cast("long").as("dow_sun0"),
            (col("o_orderdate") + expr("interval 3 months")).as("plus_3mo"),
            datediff(lit("1999-01-01").cast("date"), col("o_orderdate")).cast("long")
              .as("days_to_1999"),
            // roundOff=false: raw (ym + day_frac/31) double — the rounded
            // variant's 8-decimal HALF_UP is not reproducible cross-engine
            months_between(lit("1999-01-15").cast("timestamp_ntz"), col("o_orderdate"), false)
              .as("months_to_19990115"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey,
             |       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
             |       CAST(year(o_orderdate) AS BIGINT) AS yr,
             |       CAST(month(o_orderdate) AS BIGINT) AS mo,
             |       CAST(dayofweek(o_orderdate) AS BIGINT) AS dow_sun0,
             |       o_orderdate + INTERVAL 3 MONTH AS plus_3mo,
             |       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01') AS BIGINT) AS days_to_1999,
             |       ((1999 - year(o_orderdate)) * 12 + (1 - month(o_orderdate)))
             |         + (15 - day(o_orderdate)) / 31.0 AS months_to_19990115
             |FROM orders ORDER BY o_orderkey""".stripMargin)
    ),
    Q(
      "fn_math",
      (s, dir) => {
        Tables(s, dir, "orders")
          .select(
            col("o_orderkey"),
            abs(col("o_totalprice") - 100000).as("abs_diff"),
            util.r2(sqrt(col("o_totalprice"))).as("sqrt_price"),
            util.r2(log(col("o_totalprice"))).as("ln_price"),
            (col("o_totalprice") * col("o_totalprice")).as("price_sq"),
            pmod(col("o_orderkey"), lit(7)).as("key_mod7"),
            signum(col("o_totalprice") - 150000).as("above_150k"))
          .orderBy(col("o_orderkey"))
      },
      Some(s"""SELECT o_orderkey,
              |       abs(o_totalprice - 100000) AS abs_diff,
              |       ${util.r2sql("sqrt(o_totalprice)")} AS sqrt_price,
              |       ${util.r2sql("ln(o_totalprice)")} AS ln_price,
              |       o_totalprice * o_totalprice AS price_sq,
              |       o_orderkey % 7 AS key_mod7,
              |       CAST(sign(o_totalprice - 150000) AS DOUBLE) AS above_150k
              |FROM orders ORDER BY o_orderkey""".stripMargin)
    ),
    Q(
      "fn_array_hof",
      // Tokenize + higher-order lambdas; scalars out (list hashing is
      // representation-dependent across engines).
      (s, dir) => {
        val toks = split(col("text"), " ")
        Tables(s, dir, "documents")
          .select(
            col("doc_id"),
            size(toks).cast("long").as("n_tokens"),
            array_contains(toks, "data").as("has_data"),
            size(filter(toks, t => length(t) > 4)).cast("long").as("n_long_tokens"),
            aggregate(transform(toks, t => length(t).cast("long")), lit(0L), (acc, x) => acc + x)
              .as("total_chars"),
            element_at(sort_array(toks), 1).as("first_token"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
             |       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             |       list_contains(string_split(text, ' '), 'data') AS has_data,
             |       CAST(len(list_filter(string_split(text, ' '), t -> length(t) > 4)) AS BIGINT) AS n_long_tokens,
             |       CAST(list_sum(list_transform(string_split(text, ' '), t -> length(t))) AS BIGINT) AS total_chars,
             |       list_sort(string_split(text, ' '))[1] AS first_token
             |FROM documents ORDER BY doc_id""".stripMargin)
    ),
    Q(
      "fn_make_intervals",
      // ANSI interval construction + timestamp arithmetic (round-9):
      // `make_dt_interval` builds a typed DAY-TO-SECOND interval, orders
      // get a 30-day-12-hour payment due date, and lineitems are bucketed
      // by whether they shipped before it — the deadline arithmetic every
      // billing pipeline runs. The interval column exists as a REAL typed
      // value mid-plan (not a string template); outputs are counts and
      // exact µs deltas so the dump stays engine-portable (interval
      // parquet encodings differ across engines). Oracle: DuckDB's
      // INTERVAL literal arithmetic on the same timestamps.
      (s, dir) => {
        val o = Tables(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderdate"))
          .withColumn("due", expr("o_orderdate + make_dt_interval(30, 12, 0, 0)"))
        Tables(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_shipdate"))
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .withColumn("on_time", col("l_shipdate") <= col("due"))
          .groupBy(col("on_time"))
          .agg(count(lit(1)).as("n_lines"),
            sum(expr("""unix_micros(CAST(l_shipdate AS TIMESTAMP))
                       - unix_micros(CAST(due AS TIMESTAMP))"""))
              .as("total_slack_us"))
          .orderBy(col("on_time"))
      },
      Some("""SELECT l_shipdate <= o_orderdate + INTERVAL 30 DAY + INTERVAL 12 HOUR AS on_time,
             |       CAST(count(*) AS BIGINT) AS n_lines,
             |       CAST(sum(epoch_us(l_shipdate)
             |                - epoch_us(o_orderdate + INTERVAL 30 DAY + INTERVAL 12 HOUR)) AS BIGINT) AS total_slack_us
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY 1 ORDER BY on_time""".stripMargin)
    ),
    Q(
      "fn_array_sort_lambda",
      // array_sort with a COMPARATOR lambda (round-9): custom sort order
      // — (token length, then lexicographic) over each doc's first 8
      // tokens — the one array HOF fn_array_hof doesn't touch because it
      // takes a two-argument ordering function, not a key. Output is the
      // joined string (list hashing is representation-dependent). The
      // oracle reaches the same order via DuckDB's decorate-sort-
      // undecorate (sort structs of (len, tok)) — the comparator's total
      // order restated as a sort key, which is exactly why the result is
      // engine-checkable.
      (s, dir) => {
        Tables(s, dir, "documents")
          .select(col("doc_id"), expr(
            """array_join(
              |  array_sort(slice(split(text, ' '), 1, 8),
              |    (l, r) -> CASE WHEN length(l) < length(r) THEN -1
              |                   WHEN length(l) > length(r) THEN 1
              |                   WHEN l < r THEN -1
              |                   WHEN l > r THEN 1
              |                   ELSE 0 END),
              |  ' ')""".stripMargin).as("sorted_head"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
             |       array_to_string(
             |         list_transform(
             |           list_sort(list_transform(string_split(text, ' ')[1:8],
             |             t -> struct_pack(l := length(t), t := t))),
             |           s -> s.t),
             |         ' ') AS sorted_head
             |FROM documents ORDER BY doc_id""".stripMargin)
    ),
    Q(
      "fn_map_ops",
      // Map construction + element access + key/value projections, all as
      // scalar outputs so the dump stays hashable. The DuckDB oracle builds
      // the same MAP (insertion order preserved on both engines; DuckDB's
      // m['k'] indexing yields a one-element list → [1]).
      (s, dir) => {
        val m = map_from_arrays(
          array(lit("status"), lit("priority")),
          array(col("o_orderstatus"), col("o_orderpriority")))
        Tables(s, dir, "orders")
          .select(
            col("o_orderkey"),
            element_at(m, "status").as("status_val"),
            element_at(m, "priority").as("priority_val"),
            size(map_keys(m)).cast("long").as("n_keys"),
            array_join(map_values(m), "|").as("vals_joined"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey,
             |       m['status'][1] AS status_val,
             |       m['priority'][1] AS priority_val,
             |       CAST(cardinality(m) AS BIGINT) AS n_keys,
             |       array_to_string(map_values(m), '|') AS vals_joined
             |FROM (SELECT *, MAP {'status': o_orderstatus, 'priority': o_orderpriority} AS m
             |      FROM orders) t
             |ORDER BY o_orderkey""".stripMargin)
    ),
    Q(
      "fn_string_extra",
      // second string tier: translate/initcap/soundex-adjacent transforms
      // and base64/encode round-trips — all codegen built-ins, no UDFs.
      (s, dir) => {
        Tables(s, dir, "part")
          .select(
            col("p_partkey"),
            translate(col("p_brand"), "#", "-").as("brand_dash"),
            reverse(col("p_name")).as("name_rev"),
            repeat(col("p_type"), 2).as("type_x2"),
            regexp_replace(col("p_name"), " ", "_").as("name_snake"),
            instr(col("p_name"), "a").cast("long").as("first_a"),
            substring_index(col("p_name"), " ", 1).as("first_word"))
          .orderBy(col("p_partkey"))
      },
      Some("""SELECT p_partkey,
             |       translate(p_brand, '#', '-') AS brand_dash,
             |       reverse(p_name) AS name_rev,
             |       repeat(p_type, 2) AS type_x2,
             |       replace(p_name, ' ', '_') AS name_snake,
             |       CAST(strpos(p_name, 'a') AS BIGINT) AS first_a,
             |       split_part(p_name, ' ', 1) AS first_word
             |FROM part ORDER BY p_partkey""".stripMargin)
    ),
    Q(
      "fn_luhn_check",
      // Luhn checksum validation (round-9): the check-digit algorithm on
      // every payment card / IMEI / account id — a DQ gate any ingest of
      // financial identifiers runs. Applied to the 10-digit customer key
      // space: digit i extracted by float-floor division (exact below
      // 2^53, so ONE text parses on both engines), every second digit
      // doubled with the ≥5 ? −9 fold, validity = sum mod 10. Unrolled
      // 10-term integer expression — codegen-friendly, no UDF, no string
      // ops in the hot path.
      (s, dir) => graft.Catalog.sql(s, dir, luhnSql),
      Some(luhnSql)
    ),
    Q(
      "fn_hash_digests",
      // Content digests for landing-zone integrity checks (the reference
      // verifies downloaded objects): md5 + sha256 hex, oracled; the
      // Spark-only 64-bit hashes (xxhash64/crc32) are covered via the
      // MinHash/SimHash tiers.
      (s, dir) => {
        Tables(s, dir, "documents")
          .select(col("doc_id"),
            md5(to_binary(col("text"), lit("utf-8"))).as("md5_hex"),
            sha2(col("text"), 256).as("sha256_hex"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, md5(text) AS md5_hex, sha256(text) AS sha256_hex
             |FROM documents ORDER BY doc_id""".stripMargin)
    ),
    Q(
      "fn_stable_uuid",
      // Deterministic name-based surrogate keys (the UUIDv5 idea via md5):
      // CDC pipelines need entity ids that are STABLE across reruns and
      // engines — random uuid() is banned by the determinism contract, so
      // the key derives from the natural key's digest, formatted as an
      // RFC-4122-shaped string with the version nibble pinned to 5 and the
      // variant nibble to 8. Pure string surgery over md5 hex — identical
      // on both engines.
      (s, dir) => {
        val hex = md5(to_binary(
          concat_ws("|", lit("graft"), col("o_orderkey")), lit("utf-8")))
        val uuid = concat(
          substring(hex, 1, 8), lit("-"),
          substring(hex, 9, 4), lit("-"),
          lit("5"), substring(hex, 14, 3), lit("-"),
          lit("8"), substring(hex, 18, 3), lit("-"),
          substring(hex, 21, 12))
        Tables(s, dir, "orders")
          .select(col("o_orderkey"), uuid.as("stable_uuid"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey,
             |       substring(h, 1, 8) || '-' || substring(h, 9, 4) || '-5' ||
             |       substring(h, 14, 3) || '-8' || substring(h, 18, 3) || '-' ||
             |       substring(h, 21, 12) AS stable_uuid
             |FROM (SELECT o_orderkey, md5('graft|' || o_orderkey) AS h FROM orders)
             |ORDER BY o_orderkey""".stripMargin)
    ),
    Q(
      "fn_base64_roundtrip",
      // Binary transport encoding (pre-signed payloads on the wire):
      // text → bytes → base64 → decode round trip.
      (s, dir) => {
        Tables(s, dir, "documents")
          .select(col("doc_id"),
            base64(to_binary(substring(col("text"), 1, 24), lit("utf-8"))).as("b64_head"),
            (decode(unbase64(base64(to_binary(col("text"), lit("utf-8")))), "UTF-8")
              === col("text")).as("roundtrip_ok"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
             |       to_base64(encode(substring(text, 1, 24))) AS b64_head,
             |       (decode(from_base64(to_base64(encode(text)))) = text) AS roundtrip_ok
             |FROM documents ORDER BY doc_id""".stripMargin)
    ),
    Q(
      "fn_bitops",
      // bitwise AND/OR/XOR/shift column math — flag-field decoding as pure
      // codegen integer expressions.
      (s, dir) => {
        Tables(s, dir, "orders")
          .select(col("o_orderkey"),
            col("o_orderkey").bitwiseAND(255L).as("low_byte"),
            col("o_orderkey").bitwiseOR(1L).as("set_low"),
            col("o_orderkey").bitwiseXOR(lit(0x5aL)).as("xored"),
            shiftleft(col("o_orderkey"), 2).as("shl2"),
            shiftright(col("o_orderkey"), 3).as("shr3"),
            expr("bit_count(o_orderkey)").cast("long").as("popcount"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey,
             |       o_orderkey & 255 AS low_byte,
             |       o_orderkey | 1 AS set_low,
             |       xor(o_orderkey, 90) AS xored,
             |       o_orderkey << 2 AS shl2,
             |       o_orderkey >> 3 AS shr3,
             |       CAST(bit_count(o_orderkey) AS BIGINT) AS popcount
             |FROM orders ORDER BY o_orderkey""".stripMargin)
    ),
    Q(
      "fn_json_extract",
      (s, dir) => {
        Tables.events(s, dir)
          .select(
            col("event_id"),
            get_json_object(col("props"), "$.k").cast("long").as("prop_k"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id,
             |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
             |FROM events ORDER BY event_id""".stripMargin)
    ),
    Q(
      "fn_json_variant",
      // Spark 4 VariantType path for semi-structured payloads: parse once
      // into the binary variant encoding, extract typed fields — at scale
      // this beats per-access string re-parsing (one parse per row, shredded
      // access). Same oracle shape as fn_json_extract.
      (s, dir) => {
        Tables.events(s, dir)
          .select(col("event_id"),
            try_variant_get(parse_json(col("props")), "$.k", "long").as("prop_k"),
            is_variant_null(parse_json(col("props"))).as("props_is_null"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id,
             |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
             |       false AS props_is_null
             |FROM events ORDER BY event_id""".stripMargin)
    ),
    Q(
      "fn_conditional",
      (s, dir) => {
        Tables(s, dir, "orders")
          .select(
            col("o_orderkey"),
            when(col("o_totalprice") > 200000, "high")
              .when(col("o_totalprice") > 100000, "mid")
              .otherwise("low").as("price_band"),
            least(col("o_totalprice"), lit(150000.0)).as("capped"),
            greatest(col("o_totalprice"), lit(50000.0)).as("floored"),
            coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("status_norm"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey,
             |       CASE WHEN o_totalprice > 200000 THEN 'high'
             |            WHEN o_totalprice > 100000 THEN 'mid'
             |            ELSE 'low' END AS price_band,
             |       least(o_totalprice, 150000.0) AS capped,
             |       greatest(o_totalprice, 50000.0) AS floored,
             |       coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_norm
             |FROM orders ORDER BY o_orderkey""".stripMargin)
    ),
    Q(
      "fn_datetime_extra",
      // Calendar arithmetic beyond fn_date_core: quarter/day-of-year
      // extraction, month-end snap, month addition with end-of-month
      // clamping (Jan 31 + 1 month → Feb 29), and date construction.
      (s, dir) => {
        Tables(s, dir, "orders")
          .select(
            col("o_orderkey"),
            quarter(col("o_orderdate")).cast("long").as("qtr"),
            dayofyear(col("o_orderdate")).cast("long").as("doy"),
            last_day(col("o_orderdate")).as("month_end"),
            add_months(col("o_orderdate"), 1).as("next_month"),
            make_date(year(col("o_orderdate")), month(col("o_orderdate")), lit(1))
              .as("month_start"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey,
             |       CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
             |       CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
             |       last_day(o_orderdate) AS month_end,
             |       CAST(o_orderdate + INTERVAL 1 MONTH AS DATE) AS next_month,
             |       make_date(year(o_orderdate), month(o_orderdate), 1) AS month_start
             |FROM orders ORDER BY o_orderkey""".stripMargin)
    ),
    Q(
      "fn_struct_ops",
      // Struct construction, field access, and whole-struct equality — the
      // nested-record surface a replicated feed's envelope columns need.
      // Struct comparison is field-wise on both engines.
      (s, dir) => {
        val s1 = struct(col("o_orderstatus").as("a"), col("o_orderpriority").as("b"))
        val s2 = struct(lit("O").as("a"), lit("1-URGENT").as("b"))
        Tables(s, dir, "orders")
          .select(
            col("o_orderkey"),
            s1.getField("a").as("field_a"),
            s1.getField("b").as("field_b"),
            (s1 === s2).as("is_urgent_open"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey,
             |       s1.a AS field_a, s1.b AS field_b,
             |       (s1 = {'a': 'O', 'b': '1-URGENT'}) AS is_urgent_open
             |FROM (SELECT *, {'a': o_orderstatus, 'b': o_orderpriority} AS s1
             |      FROM orders) t
             |ORDER BY o_orderkey""".stripMargin)
    ),
    Q(
      "fn_try_arithmetic",
      // ANSI-safe scalar variants: try_divide and try_cast return NULL on
      // failure instead of aborting the job — the dirty-feed posture (one
      // malformed record must not kill a 100 TB batch). DuckDB mirrors via
      // x / nullif(...) and TRY_CAST.
      (s, dir) => {
        Tables(s, dir, "part")
          .select(
            col("p_partkey"),
            expr("try_divide(p_retailprice, p_size % 4)").as("div_maybe"),
            expr("try_cast(substring(p_brand, 7) AS INT)").cast("long").as("brand_num"),
            expr("try_cast(p_type AS INT)").cast("long").as("type_num"))
          .select(col("p_partkey"), util.r2(col("div_maybe")).as("div_maybe"),
            col("brand_num"), col("type_num"))
          .orderBy(col("p_partkey"))
      },
      Some(s"""SELECT p_partkey,
              |       ${util.r2sql("p_retailprice / nullif(p_size % 4, 0)")} AS div_maybe,
              |       CAST(TRY_CAST(substring(p_brand, 7) AS INTEGER) AS BIGINT) AS brand_num,
              |       CAST(TRY_CAST(p_type AS INTEGER) AS BIGINT) AS type_num
              |FROM part ORDER BY p_partkey""".stripMargin)
    ),
    Q(
      "fn_url_parse",
      // URL decomposition via parse_url (host/path/query/param). The URL is
      // synthesized from part columns, so the DuckDB oracle — which has no
      // URL functions — checks parse_url's contract by reconstructing each
      // component from the same source expressions.
      (s, dir) => {
        val url = concat(lit("https://shop.example.com/"),
          regexp_replace(col("p_type"), " ", "-"),
          lit("?brand="), regexp_replace(col("p_brand"), "#", ""),
          lit("&size="), col("p_size"))
        Tables(s, dir, "part")
          .select(
            col("p_partkey"),
            parse_url(url, lit("HOST")).as("host"),
            parse_url(url, lit("PATH")).as("path"),
            parse_url(url, lit("QUERY")).as("query"),
            parse_url(url, lit("QUERY"), lit("brand")).as("brand_param"),
            parse_url(url, lit("QUERY"), lit("size")).as("size_param"))
          .orderBy(col("p_partkey"))
      },
      Some("""SELECT p_partkey,
             |       'shop.example.com' AS host,
             |       '/' || replace(p_type, ' ', '-') AS path,
             |       'brand=' || replace(p_brand, '#', '') || '&size=' || p_size AS query,
             |       replace(p_brand, '#', '') AS brand_param,
             |       CAST(p_size AS VARCHAR) AS size_param
             |FROM part ORDER BY p_partkey""".stripMargin)
    ),
    Q(
      "fn_cast_formats",
      // CSV-wire → typed round trip (SURVEY.md §2.8 [DAP]): format to
      // string, parse back, cast across numeric/temporal types.
      (s, dir) => {
        Tables(s, dir, "orders")
          .select(
            col("o_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("date_str"),
            to_timestamp(date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss"),
              "yyyy-MM-dd HH:mm:ss").cast("timestamp_ntz").as("date_rt"),
            col("o_orderdate").cast("date").as("as_date"),
            // double→decimal must go through a shared rounding path
            // (util.r2): direct casts round differently across engines, and
            // double→string formatting is engine-specific. The typed price is
            // emitted as integer cents (BIGINT — DECIMAL renders differently
            // in the two engines' hashers); price_str is derived from the
            // pinned decimal, whose textual form is plain fixed-point on both
            // sides.
            (util.r2(col("o_totalprice")).cast("decimal(18,2)") * lit(100))
              .cast("long").as("price_cents"),
            util.r2(col("o_totalprice")).cast("decimal(18,2)").cast("string").as("price_str"),
            col("o_orderkey").cast("string").as("key_str"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey,
             |       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS date_str,
             |       strptime(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS date_rt,
             |       CAST(o_orderdate AS DATE) AS as_date,
             |       CAST(CAST(floor(o_totalprice * 100 + 0.5) / 100 AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_cents,
             |       CAST(CAST(floor(o_totalprice * 100 + 0.5) / 100 AS DECIMAL(18,2)) AS VARCHAR) AS price_str,
             |       CAST(o_orderkey AS VARCHAR) AS key_str
             |FROM orders ORDER BY o_orderkey""".stripMargin)
    ),
    Q(
      "fn_aes_roundtrip",
      // Column-level encryption built-ins: AES-encrypt, decrypt back, both
      // codegen'd. ECB mode here is ORACLE-motivated, not a production
      // recommendation — the gate needs a deterministic ciphertext (GCM's
      // random IV would break the length check and the bench's repeat
      // runs). Real deployments needing joinable encrypted columns should
      // use deterministic AEAD (AES-SIV) or HMAC blind indexes; raw ECB
      // leaks plaintext block-equality. The oracle can't run AES, so it
      // checks the roundtrip identity plus the PKCS7-padded ciphertext
      // length computed arithmetically.
      (s, dir) => {
        val key = lit("0123456789abcdef") // 16-byte demo key
        val cipher = aes_encrypt(col("c_name").cast("binary"), key.cast("binary"),
          lit("ECB"), lit("PKCS"))
        Tables(s, dir, "customer")
          .select(
            col("c_custkey"),
            aes_decrypt(cipher, key.cast("binary"), lit("ECB"), lit("PKCS"))
              .cast("string").as("name_rt"),
            length(cipher).cast("long").as("cipher_len"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name AS name_rt,
             |       CAST((length(c_name) // 16 + 1) * 16 AS BIGINT) AS cipher_len
             |FROM customer ORDER BY c_custkey""".stripMargin)
    ),
    Q(
      "fn_printf_format",
      // C-style formatting for export keys / padded ids. %.Nf is avoided on
      // purpose: Java formats half-up, C half-even — %d/%s/%x are the
      // portable subset.
      (s, dir) => {
        Tables(s, dir, "orders")
          .select(col("o_orderkey"),
            format_string("%09d|%s|%x", col("o_orderkey"), col("o_orderstatus"),
              col("o_orderkey")).as("export_key"),
            lpad(col("o_orderkey").cast("string"), 12, "0").as("padded"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey,
             |       printf('%09d|%s|%x', o_orderkey, o_orderstatus, o_orderkey) AS export_key,
             |       lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS padded
             |FROM orders ORDER BY o_orderkey""".stripMargin)
    ),
    Q(
      "fn_collation_lcase",
      // Spark 4 collation surface: grouping under UTF8_LCASE folds case
      // variants at the SHUFFLE level (the collation-aware hash/compare is
      // inside the exchange + aggregate, not a per-row lower() rewrite of
      // the data). Mixed-case segment labels are synthesized
      // deterministically (Title case on even keys), grouped under the
      // case-insensitive collation, and the group key is re-anchored with
      // lower() + a plain-string cast so the dumped schema is
      // collation-free. Oracle: lower()-keyed grouping — same fold, the
      // portable way.
      (s, dir) => {
        val seg = lower(col("c_mktsegment"))
        Tables(s, dir, "customer")
          .withColumn("seg_mixed",
            when(col("c_custkey") % 2 === 0,
              concat(upper(substring(seg, 1, 1)), substring(seg, 2, 100)))
              .otherwise(seg))
          .groupBy(expr("collate(seg_mixed, 'UTF8_LCASE')").as("k"))
          .agg(count(lit(1)).as("n_customers"))
          .select(lower(col("k")).cast("string").as("segment"), col("n_customers"))
          .orderBy(col("segment"))
      },
      Some("""SELECT lower(seg_mixed) AS segment, count(*) AS n_customers
             |FROM (SELECT CASE WHEN c_custkey % 2 = 0
             |        THEN upper(substr(lower(c_mktsegment), 1, 1))
             |             || substr(lower(c_mktsegment), 2, 100)
             |        ELSE lower(c_mktsegment) END AS seg_mixed
             |      FROM customer) t
             |GROUP BY lower(seg_mixed) ORDER BY segment""".stripMargin)
    ),
    Q(
      "fn_xml_extract",
      // XML feed surface: xpath extraction over per-row XML payloads —
      // the wire format half the enterprise sources still speak. The XML
      // is synthesized deterministically from orders (so the oracle can
      // recompute the extracted fields straight from the columns), the
      // extraction exercises typed xpath_* plus a node-count xpath over a
      // repeated element. Per-row parse, no shuffle added.
      (s, dir) => {
        Tables(s, dir, "orders")
          .withColumn("xml", concat(
            lit("<order id=\""), col("o_orderkey"), lit("\"><status>"),
            col("o_orderstatus"), lit("</status><lines>"),
            lit("<l n=\"1\"/><l n=\"2\"/>"),
            when(col("o_orderkey") % 3 === 0, lit("<l n=\"3\"/>")).otherwise(lit("")),
            lit("</lines></order>")))
          .select(col("o_orderkey"),
            expr("xpath_long(xml, '/order/@id')").as("xml_id"),
            expr("xpath_string(xml, '/order/status')").as("xml_status"),
            expr("CAST(xpath_number(xml, 'count(/order/lines/l)') AS BIGINT)").as("n_lines"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_orderkey AS xml_id,
             |       o_orderstatus AS xml_status,
             |       CAST(CASE WHEN o_orderkey % 3 = 0 THEN 3 ELSE 2 END AS BIGINT) AS n_lines
             |FROM orders ORDER BY o_orderkey""".stripMargin)
    ),
    Q(
      "fn_csv_embedded",
      // Embedded-CSV columns: from_csv parses a delimited payload column
      // against an explicit schema (the no-inference rule at scale),
      // to_csv re-serializes — covering feeds that nest CSV inside a
      // column the way props nests JSON. Quoted fields with embedded
      // delimiters round-trip.
      (s, dir) => {
        val schema = "k BIGINT, seg STRING, bal DOUBLE"
        Tables(s, dir, "customer")
          .withColumn("line", concat(
            col("c_custkey"), lit(","),
            lit("\""), col("c_mktsegment"), lit(",inner\""), lit(","),
            col("c_acctbal")))
          .withColumn("parsed", expr(s"from_csv(line, '$schema')"))
          .select(col("c_custkey"),
            col("parsed.k").as("k"),
            col("parsed.seg").as("seg"),
            col("parsed.bal").as("bal"),
            expr("to_csv(parsed)").as("round_trip"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_custkey AS k,
             |       c_mktsegment || ',inner' AS seg,
             |       c_acctbal AS bal,
             |       CAST(c_custkey AS VARCHAR) || ',"' || c_mktsegment || ',inner",'
             |         || CAST(c_acctbal AS VARCHAR) AS round_trip
             |FROM customer ORDER BY c_custkey""".stripMargin)
    ),
    Q(
      "fn_business_days",
      // Business-day arithmetic (round-9): weekdays between order date and
      // a deterministic ship date, in closed form — no calendar table, no
      // per-day loop. Both engines disagree on dayofweek NUMBERING
      // (Spark 1=Sun, DuckDB isodow 1=Mon), so the weekday comes from raw
      // epoch-day arithmetic instead: day 0 = Thu ⇒ weekday = (e+3)%7,
      // and g(e) = weekdays in [0,e) = 5·(e div 7) + prefix[(e mod 7)]
      // with prefix = [0,1,2,2,2,3,4]. bd(a,b] = g(eb+1) − g(ea+1), all
      // exact integers — identical CASE text, engine-specific only in the
      // datediff spelling. The per-priority rollup is the SLA report.
      (s, dir) => graft.Catalog.sql(s, dir,
        s"""WITH d AS (
           |  SELECT o_orderpriority,
           |         datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS ea,
           |         datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01')
           |           + CAST(o_orderkey % 20 AS INT) AS eb
           |  FROM orders),
           |g AS (
           |  SELECT o_orderpriority,
           |         (5 * ((eb + 1) DIV 7) + ${bdPrefix("(eb + 1) % 7")})
           |       - (5 * ((ea + 1) DIV 7) + ${bdPrefix("(ea + 1) % 7")}) AS bd
           |  FROM d)
           |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
           |       CAST(sum(bd) AS BIGINT) AS sum_bd,
           |       CAST(floor(CAST(sum(bd) AS DOUBLE) / CAST(count(*) AS DOUBLE)
           |            * 1000000 + 0.5) AS BIGINT) AS avg_bd_e6
           |FROM g GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
      Some(s"""WITH d AS (
              |  SELECT o_orderpriority,
              |         date_diff('day', DATE '1970-01-01',
              |                   CAST(o_orderdate AS DATE)) AS ea,
              |         date_diff('day', DATE '1970-01-01',
              |                   CAST(o_orderdate AS DATE))
              |           + CAST(o_orderkey % 20 AS INT) AS eb
              |  FROM orders),
              |g AS (
              |  SELECT o_orderpriority,
              |         (5 * ((eb + 1) // 7) + ${bdPrefix("(eb + 1) % 7")})
              |       - (5 * ((ea + 1) // 7) + ${bdPrefix("(ea + 1) % 7")}) AS bd
              |  FROM d)
              |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
              |       CAST(sum(bd) AS BIGINT) AS sum_bd,
              |       CAST(floor(CAST(sum(bd) AS DOUBLE) / CAST(count(*) AS DOUBLE)
              |            * 1000000 + 0.5) AS BIGINT) AS avg_bd_e6
              |FROM g GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    ),
    jsonKeyProfileQ
  )

  /** Semi-structured key profile (see [[defs]] entry fn_json_key_profile). */
  private lazy val jsonKeyProfileQ: Q = Q(
    "fn_json_key_profile",
    // Semi-structured payload profiling (round-9): explode every JSON
    // property map into (key, value) rows and profile each key — count,
    // numeric coverage, min/max/sum — the schema-discovery pass run
    // before promoting an untyped props blob to real columns. Spark side
    // parses ONCE per row into map<string,string> (no per-key re-parse,
    // no dynamic get_json_object paths); the aggregate is map-side
    // combined and output is O(distinct keys).
    (s, dir) => {
      Tables.events(s, dir)
        .filter(col("props").isNotNull)
        .select(explode(expr("from_json(props, 'map<string,string>')"))
          .as(Seq("k", "v")))
        .select(col("k"), expr("try_cast(v AS BIGINT)").as("nv"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n"), count(col("nv")).as("n_numeric"),
          min(col("nv")).as("min_v"), max(col("nv")).as("max_v"),
          sum(col("nv")).as("sum_v"))
        .orderBy(col("k"))
    },
    Some("""WITH kv AS (
           |  SELECT unnest(json_keys(props)) AS k, props
           |  FROM events WHERE props IS NOT NULL),
           |kv2 AS (
           |  SELECT k,
           |         try_cast(json_extract(props, '$.' || k) AS BIGINT) AS nv
           |  FROM kv)
           |SELECT k, CAST(count(*) AS BIGINT) AS n,
           |       CAST(count(nv) AS BIGINT) AS n_numeric,
           |       CAST(min(nv) AS BIGINT) AS min_v,
           |       CAST(max(nv) AS BIGINT) AS max_v,
           |       CAST(sum(nv) AS BIGINT) AS sum_v
           |FROM kv2 GROUP BY k ORDER BY k""".stripMargin)
  )

  /** Weekday prefix-count CASE (shared text for [[fn_business_days]]):
    * number of weekdays among epoch days [0, m) with weekday = (d+3)%7. */
  private def bdPrefix(m: String): String =
    s"(CASE $m WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 2 WHEN 3 THEN 2" +
      s" WHEN 4 THEN 2 WHEN 5 THEN 3 ELSE 4 END)"

  /** Shared Spark/DuckDB SQL for [[fn_luhn_check]]: 10 unrolled digit
    * terms, doubled at odd positions with the ≥5 → −9 fold.
    */
  private lazy val luhnSql: String = {
    def digit(i: Int): String =
      s"(CAST(floor(CAST(k AS DOUBLE) / ${math.pow(10, i).toLong}) AS BIGINT) % 10)"
    val terms = (0 until 10).map { i =>
      if (i % 2 == 0) digit(i)
      else s"(2 * ${digit(i)} - CASE WHEN ${digit(i)} >= 5 THEN 9 ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH d AS (SELECT c_custkey AS k FROM customer),
       |s AS (SELECT k, $terms AS luhn_sum FROM d)
       |SELECT luhn_sum % 10 = 0 AS valid, CAST(count(*) AS BIGINT) AS n,
       |       CAST(min(k) AS BIGINT) AS first_key
       |FROM s GROUP BY 1 ORDER BY 1""".stripMargin
  }
}
