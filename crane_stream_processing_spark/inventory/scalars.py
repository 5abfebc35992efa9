"""Scalar-function inventory — SURVEY.md §2.8. The reference's scalar
surface (split / contains / atoi / regex / concat / hash / xor / timestamp
format) plus the standard string / date / math / conditional / array / JSON
surface, all as JVM-side built-ins inside whole-stage codegen.

Cross-engine notes: md5 is the hash both engines share (native hash()/
xxhash64 seeds differ); xor via ``^``/``xor()``; fractional math rounded
to fixed decimals on both sides where formula-level reassociation could
drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import dsum, query, t


@query(
    "scalar_string_suite",
    oracle="""
    SELECT p_partkey,
           lower(p_name) AS lname,
           upper(p_brand) AS ubrand,
           trim(p_type) AS ttype,
           substr(p_name, 1, 8) AS name8,
           length(p_name) AS name_len,
           concat(p_brand, ':', p_type) AS brand_type,
           strpos(p_name, 'a') AS first_a,
           replace(p_name, ' ', '_') AS snake,
           regexp_extract(p_type, '^(\\w+)', 1) AS type_head,
           contains(p_name, 'blue') AS has_blue,
           starts_with(p_brand, 'Brand#1') AS brand1x
    FROM part
    """,
)
def scalar_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String functions: case, trim, substring, length, concat, position,
    replace, regexp_extract, contains, startswith — one projection, no
    shuffle (reference surface: strings.Fields/Contains, regexp,
    server/hothttp.go:60, server/querier.go:28)."""
    return t(spark, sf_dir, "part").select(
        "p_partkey",
        F.lower("p_name").alias("lname"),
        F.upper("p_brand").alias("ubrand"),
        F.trim("p_type").alias("ttype"),
        F.substring("p_name", 1, 8).alias("name8"),
        F.length("p_name").alias("name_len"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.instr(F.col("p_name"), "a").alias("first_a"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("snake"),
        F.regexp_extract("p_type", r"^(\w+)", 1).alias("type_head"),
        F.col("p_name").contains("blue").alias("has_blue"),
        F.col("p_brand").startswith("Brand#1").alias("brand1x"),
    )


@query(
    "scalar_date_suite",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS y,
           CAST(month(o_orderdate) AS INT) AS m,
           CAST(dayofmonth(o_orderdate) AS INT) AS d,
           CAST(isodow(o_orderdate) AS INT) AS iso_dow,
           CAST(quarter(o_orderdate) AS INT) AS q,
           CAST(date_trunc('month', o_orderdate) AS VARCHAR) AS month_start,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '1998-12-01 00:00:00') AS BIGINT)
             AS days_to_cutoff,
           strftime(o_orderdate, '%Y-%m-%d') AS iso_date
    FROM orders
    """,
)
def scalar_date_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time functions: year/month/day/ISO-dow/quarter, date_trunc,
    datediff, date_format (reference's only timestamp use is SDFS version
    formatting, server/sdfs.go:73-74)."""
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        # Spark dayofweek is 1=Sunday; ISO dow = 1=Monday..7=Sunday.
        (((F.dayofweek("o_orderdate") + 5) % 7) + 1).alias("iso_dow"),
        F.quarter("o_orderdate").alias("q"),
        # DuckDB date_trunc('month', ts) yields DATE; match by casting via date.
        F.date_trunc("month", F.col("o_orderdate")).cast("date").cast("string").alias("month_start"),
        F.datediff(
            F.lit("1998-12-01").cast("date"), F.to_date("o_orderdate")
        ).cast("bigint").alias("days_to_cutoff"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_date"),
    )


@query(
    "scalar_math_suite",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount), 4) AS net_price,
           abs(l_discount - 0.05) AS disc_dev,
           CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
           CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
           round(ln(l_extendedprice + 1), 6) AS log_price,
           round(sqrt(l_quantity), 6) AS sqrt_qty,
           round(power(1 + l_tax, 2), 6) AS tax_sq,
           CAST(l_quantity AS BIGINT) % 7 AS qty_mod7,
           greatest(l_discount, l_tax) AS max_rate,
           least(l_discount, l_tax) AS min_rate,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign
    FROM lineitem
    """,
)
def scalar_math_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math functions: round/abs/ceil/floor/ln/sqrt/power/mod/greatest/
    least/sign. Transcendentals rounded to 6 decimals on both sides (libm
    vs JVM StrictMath can differ in the last ulp)."""
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # round at 4 decimals: the true product has <=4 decimal digits, so no
        # half-way ties (Spark HALF_UP on decimal string vs DuckDB on binary
        # value disagree exactly at ties — e.g. 8285.425 at scale 2).
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("net_price"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_quantity").alias("qty_floor"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("log_price"),
        F.round(F.sqrt("l_quantity"), 6).alias("sqrt_qty"),
        F.round(F.pow(1 + F.col("l_tax"), 2), 6).alias("tax_sq"),
        (F.col("l_quantity").cast("bigint") % 7).alias("qty_mod7"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
    )


@query(
    "scalar_json_props",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
           MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_min,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max
    FROM events
    GROUP BY event_type
    """,
)
def scalar_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction: events.props is a JSON string; parse with an
    explicit schema (from_json) and aggregate the extracted field. Schema-
    ful parse beats get_json_object when multiple fields are read."""
    ev = t(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type", F.from_json("props", "k BIGINT").getField("k").alias("k")
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").alias("k_sum"),
        F.min("k").alias("k_min"),
        F.max("k").alias("k_max"),
    )


@query(
    "scalar_conditional_null",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END AS balance_tier,
           coalesce(nullif(c_mktsegment, 'MACHINERY'), 'OTHER') AS segment_or_other,
           (c_acctbal IS NULL) AS bal_is_null,
           if(c_acctbal >= 0, c_acctbal, 0.0) AS bal_clamped
    FROM customer
    """,
)
def scalar_conditional_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional/null functions: CASE WHEN, coalesce, nullif, IS NULL,
    if() — P6's general predicate surface."""
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("balance_tier"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("MACHINERY")), F.lit("OTHER")).alias(
            "segment_or_other"
        ),
        F.isnull("c_acctbal").alias("bal_is_null"),
        F.when(F.col("c_acctbal") >= 0, F.col("c_acctbal")).otherwise(0.0).alias(
            "bal_clamped"
        ),
    )


@query(
    "scalar_hash_xor",
    oracle="""
    SELECT event_id,
           md5(event_type) AS type_md5,
           xor(event_id, user_id) AS id_xor,
           event_id & 255 AS id_low8,
           event_id | 1 AS id_odd,
           CAST(event_id // 2 AS BIGINT) AS id_half
    FROM events
    """,
)
def scalar_hash_xor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash + bitwise ops: md5 (cross-engine-stable hash), XOR (the
    reference acker's core op, server/acker.go:58), AND/OR, integer div."""
    ev = t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.md5("event_type").alias("type_md5"),
        F.col("event_id").bitwiseXOR(F.col("user_id")).alias("id_xor"),
        F.col("event_id").bitwiseAND(F.lit(255)).alias("id_low8"),
        F.col("event_id").bitwiseOR(F.lit(1)).alias("id_odd"),
        F.expr("event_id div 2").alias("id_half"),
    )


@query(
    "scalar_higher_order_suite",
    oracle="""
    SELECT doc_id,
           len(list_filter(tk, t -> length(t) >= 6)) AS n_long_tokens,
           list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_transform(tk, t -> CAST(length(t) AS BIGINT))), (a,b) -> a + b)
             AS total_chars,
           (len(list_filter(tk, t -> t[1] = 'q')) > 0) AS any_q_token,
           array_to_string(list_transform(tk[1:3], t -> upper(t)), ' ') AS head_upper
    FROM (
      SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS tk
      FROM documents
    )
    """,
)
def scalar_higher_order_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions as user surface: transform / filter /
    exists / aggregate (fold) / slicing — all row-local, codegen-side
    (the same primitives the dedup operators build on)."""
    from ..functions import tokens

    docs = t(spark, sf_dir, "documents").select("doc_id", tokens("text").alias("tk"))
    return docs.select(
        "doc_id",
        F.size(F.filter("tk", lambda t: F.length(t) >= 6)).alias("n_long_tokens"),
        F.aggregate(
            F.transform("tk", lambda t: F.length(t).cast("long")),
            F.lit(0).cast("long"),
            lambda a, b: a + b,
        ).alias("total_chars"),
        F.exists("tk", lambda t: t.startswith("q")).alias("any_q_token"),
        F.array_join(
            F.transform(F.slice("tk", 1, 3), lambda t: F.upper(t)), " "
        ).alias("head_upper"),
    )


@query(
    "scalar_map_suite",
    oracle="""
    SELECT o_orderkey,
           map_extract(m, 'status')[1] AS status_v,
           CAST(cardinality(m) AS INT) AS m_size,
           array_to_string(map_keys(m), ',') AS keys_csv,
           array_to_string(map_values(m), ',') AS vals_csv
    FROM (
      SELECT o_orderkey,
             MAP(['status','prio'], [o_orderstatus, o_orderpriority]) AS m
      FROM orders
    )
    """,
)
def scalar_map_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type functions: construct (create_map), element access, size,
    map_keys/map_values — complex types stay columnar end-to-end."""
    o = t(spark, sf_dir, "orders")
    m = F.create_map(
        F.lit("status"), F.col("o_orderstatus"), F.lit("prio"), F.col("o_orderpriority")
    )
    return o.select(
        "o_orderkey",
        F.element_at(m, "status").alias("status_v"),
        F.size(m).alias("m_size"),
        F.array_join(F.map_keys(m), ",").alias("keys_csv"),
        F.array_join(F.map_values(m), ",").alias("vals_csv"),
    )


@query(
    "scalar_posexplode_tokens",
    oracle="""
    SELECT doc_id, CAST(pos - 1 AS INT) AS pos, tok
    FROM (
      SELECT doc_id,
             unnest(tk) AS tok,
             generate_subscripts(tk, 1) AS pos
      FROM (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS tk
        FROM documents WHERE doc_id < 50
      )
    )
    """,
)
def scalar_posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-valued expansion with ordinality: posexplode of the token
    array (the lateral-view shape; 0-based in Spark, aligned here)."""
    from ..functions import tokens

    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return docs.select(
        "doc_id", F.posexplode(tokens("text")).alias("pos", "tok")
    )


@query(
    "scalar_array_suite",
    oracle="""
    SELECT doc_id,
           len(toks) AS n_tokens,
           list_contains(toks, 'spark') AS has_spark,
           toks[1] AS first_token,
           toks[-1] AS last_token,
           array_to_string(list_sort(list_distinct(toks)), ',') AS vocab_csv
    FROM (
      SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS toks
      FROM documents
    )
    """,
)
def scalar_array_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array functions over tokenized text: size, contains, element_at
    (first/last), distinct+sort+join. Complex types stay columnar — no
    explode needed for per-array stats. try_element_at, not element_at:
    an empty/whitespace-only document tokenizes to [], where ANSI-mode
    element_at (Spark 4 default, on in session.py) throws
    INVALID_ARRAY_INDEX — the DuckDB twin's toks[1]/toks[-1] return NULL,
    and try_element_at matches that out-of-bounds→NULL contract."""
    from ..functions import tokens

    docs = t(spark, sf_dir, "documents").select("doc_id", tokens("text").alias("toks"))
    return docs.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.array_contains("toks", "spark").alias("has_spark"),
        F.try_element_at("toks", F.lit(1)).alias("first_token"),
        F.try_element_at("toks", F.lit(-1)).alias("last_token"),
        F.array_join(F.array_sort(F.array_distinct("toks")), ",").alias("vocab_csv"),
    )


@query(
    "scalar_try_arithmetic",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice / NULLIF(l_quantity, 0.0) AS unit_price,
           CASE WHEN l_quantity BETWEEN -1e18 AND 1e18
                THEN CAST(l_quantity AS BIGINT) ELSE NULL END AS qty_int,
           TRY_CAST(l_returnflag AS DOUBLE) AS flag_as_num
    FROM lineitem
    WHERE l_orderkey <= 100
    """,
)
def scalar_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe try_* family: under ANSI mode (Spark 4 default) a
    division by zero or bad cast THROWS mid-pipeline — try_divide /
    try_cast return NULL instead, the contract batch pipelines over dirty
    data need (one malformed row must not kill a 100 TB job)."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 100)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide("l_extendedprice", "l_quantity").alias("unit_price"),
        F.col("l_quantity").try_cast("bigint").alias("qty_int"),
        F.col("l_returnflag").try_cast("double").alias("flag_as_num"),
    )


@query(
    "scalar_url_parse",
    oracle="""
    SELECT source || '.example.com' AS host,
           lang AS qlang,
           COUNT(*) AS n,
           COUNT(DISTINCT doc_id) AS n_paths
    FROM documents
    WHERE lang IS NOT NULL AND source IS NOT NULL
    GROUP BY 1, 2
    """,
)
def scalar_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition with the JVM-side ``parse_url`` builtin — the
    per-document URL is assembled from corpus columns, then host / path
    / a named query parameter are extracted back out and aggregated per
    (host, lang-param). This is the web-corpus curation primitive
    (domain-level stats drive source mixing and blocklists at 100 TB)
    expressed with zero Python: one codegen'd projection + one hash
    aggregate. The oracle recomputes every extraction from the raw
    components, so a parse_url regression (wrong host boundary, query
    param leakage into the path) hash-fails rather than round-tripping.
    The protocol-equality filter is a semantic no-op that likewise
    turns a broken PROTOCOL extraction into a loud row-count mismatch.
    NULL lang/source rows are filtered explicitly on BOTH sides: F.concat
    propagates NULL so the proto filter would silently drop them on the
    Spark side while the oracle's GROUP BY would keep a NULL group —
    the same divergence class agg_hll_sketch_distinct pinned."""
    docs = t(spark, sf_dir, "documents").filter(
        F.col("lang").isNotNull() & F.col("source").isNotNull()
    )
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&v=2"),
    )
    parsed = docs.select(
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("qlang"),
        F.parse_url(url, F.lit("PROTOCOL")).alias("proto"),
    )
    return (
        parsed.filter(F.col("proto") == "https")
        .groupBy("host", "qlang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("path").alias("n_paths"),
        )
    )
