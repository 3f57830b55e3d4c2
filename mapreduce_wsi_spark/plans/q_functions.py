"""Scalar function surface (SURVEY.md §2C): string / date / math /
conditional / JSON / array functions, each with a DuckDB oracle.

The reference's only scalar ops are split/trim/parseInt inside user map code
(TestMapper.java:30,38); here the whole pyspark.sql.functions surface is
first-class and JVM-side (whole-stage codegen — no Python in the hot path).

Cross-engine determinism notes:
- lengths/counts are cast to INT on both sides (DuckDB length() is BIGINT,
  Spark's is INT);
- floor/ceil cast to BIGINT (DuckDB returns DOUBLE, Spark LONG);
- no transcendentals except sqrt (IEEE-754 requires sqrt correctly rounded,
  so it is bit-identical; exp/ln/pow are libm-dependent and excluded from
  oracle-checked outputs).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_wsi_spark.plans.registry import register, tbl


@register(
    "scalar_string_funcs",
    oracle="""
    SELECT p_partkey,
           lower(p_name)  AS name_lower,
           upper(p_brand) AS brand_upper,
           substr(p_name, 1, 5) AS name_pre,
           CAST(length(p_name) AS INT) AS name_len,
           concat_ws('-', p_brand, p_type) AS brand_type,
           replace(p_name, 'a', '@') AS name_sub,
           CAST(len(string_split(p_type, ' ')) AS INT) AS type_words,
           regexp_extract(p_type, '^(\\w+)', 1) AS type_first
    FROM part
    """,
    note="string functions: case, substring, length, concat, replace, "
         "split-count, regex extract")
def scalar_string_funcs(spark, sf_dir):
    p = tbl(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 5).alias("name_pre"),
        F.length("p_name").cast("int").alias("name_len"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_name"), F.lit("a"), F.lit("@")).alias("name_sub"),
        F.size(F.split("p_type", " ")).cast("int").alias("type_words"),
        F.regexp_extract("p_type", r"^(\w+)", 1).alias("type_first"))


@register(
    "scalar_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT)    AS yr,
           CAST(month(o_orderdate) AS INT)   AS mo,
           CAST(quarter(o_orderdate) AS INT) AS qtr,
           CAST(day(o_orderdate) AS INT)     AS dom,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT)
               AS days_since,
           last_day(CAST(o_orderdate AS DATE)) AS month_end
    FROM orders
    """,
    note="date/time extraction, truncation, differences")
def scalar_date_funcs(spark, sf_dir):
    o = tbl(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("yr"),
        F.month("o_orderdate").cast("int").alias("mo"),
        F.quarter("o_orderdate").cast("int").alias("qtr"),
        F.dayofmonth("o_orderdate").cast("int").alias("dom"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff("o_orderdate", F.lit("1995-01-01")).cast("int").alias("days_since"),
        F.last_day("o_orderdate").alias("month_end"))


@register(
    "scalar_math_funcs",
    oracle="""
    SELECT c_custkey,
           abs(c_acctbal - 5000.0) AS dist_from_5k,
           CAST(floor(c_acctbal) AS BIGINT) AS bal_floor,
           CAST(ceil(c_acctbal)  AS BIGINT) AS bal_ceil,
           c_custkey % 7 AS key_mod,
           sqrt(abs(c_acctbal)) AS bal_sqrt,
           abs(c_acctbal) * abs(c_acctbal) AS bal_sq,
           greatest(c_acctbal, 5000.0) AS bal_hi,
           least(c_acctbal, 5000.0)    AS bal_lo,
           CAST(sign(c_acctbal - 5000.0) AS INT) AS bal_sign
    FROM customer
    """,
    note="math functions; sqrt is IEEE-exact so oracle-safe, libm "
         "transcendentals deliberately excluded")
def scalar_math_funcs(spark, sf_dir):
    c = tbl(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        F.abs(bal - 5000.0).alias("dist_from_5k"),
        F.floor(bal).cast("bigint").alias("bal_floor"),
        F.ceil(bal).cast("bigint").alias("bal_ceil"),
        (F.col("c_custkey") % 7).alias("key_mod"),
        F.sqrt(F.abs(bal)).alias("bal_sqrt"),
        (F.abs(bal) * F.abs(bal)).alias("bal_sq"),
        F.greatest(bal, F.lit(5000.0)).alias("bal_hi"),
        F.least(bal, F.lit(5000.0)).alias("bal_lo"),
        F.signum(bal - 5000.0).cast("int").alias("bal_sign"))


@register(
    "scalar_conditional",
    oracle="""
    SELECT bucket, seg_or_other, count(*) AS n FROM (
        SELECT CASE WHEN c_acctbal < 0 THEN 'neg'
                    WHEN c_acctbal < 5000 THEN 'mid'
                    ELSE 'high' END AS bucket,
               COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other
        FROM customer) t
    GROUP BY bucket, seg_or_other
    """,
    note="CASE WHEN / NULLIF / COALESCE")
def scalar_conditional(spark, sf_dir):
    c = tbl(spark, sf_dir, "customer")
    bucket = (F.when(F.col("c_acctbal") < 0, "neg")
              .when(F.col("c_acctbal") < 5000, "mid")
              .otherwise("high").alias("bucket"))
    seg = F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")),
                     F.lit("OTHER")).alias("seg_or_other")
    return (c.select(bucket, seg).groupBy("bucket", "seg_or_other")
            .agg(F.count(F.lit(1)).alias("n")))


@register(
    "json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_val
    FROM events
    """,
    note="JSON field extraction from the events.props string column")
def json_extract(spark, sf_dir):
    ev = tbl(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_val"))


@register(
    "array_funcs",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           CAST(embedding[1] AS DOUBLE) AS e1,
           ((CAST(embedding[1] AS DOUBLE) + CAST(embedding[2] AS DOUBLE))
             + CAST(embedding[3] AS DOUBLE)) AS head3_sum,
           CAST(list_aggregate(embedding, 'max') AS DOUBLE) AS vec_max,
           CAST(list_aggregate(embedding, 'min') AS DOUBLE) AS vec_min
    FROM embeddings
    """,
    note="array/list functions over the embedding column (1-based element "
         "access on both engines; float->double widening is exact)")
def array_funcs(spark, sf_dir):
    e = tbl(spark, sf_dir, "embeddings")
    el = lambda i: F.element_at("embedding", i).cast("double")  # noqa: E731
    return e.select(
        "vec_id",
        F.size("embedding").cast("int").alias("dim"),
        el(1).alias("e1"),
        ((el(1) + el(2)) + el(3)).alias("head3_sum"),
        F.array_max("embedding").cast("double").alias("vec_max"),
        F.array_min("embedding").cast("double").alias("vec_min"))


@register(
    "scalar_string_funcs2",
    oracle="""
    SELECT s_suppkey,
           lpad(s_name, 20, '*') AS name_pad,
           rpad(s_name, 20, '.') AS name_rpad,
           reverse(s_name) AS name_rev,
           repeat(s_name, 2) AS name_twice,
           ascii(s_name) AS first_byte,
           CAST(levenshtein(s_name, 'Supplier#1') AS INT) AS edit_dist,
           translate(s_name, '#0', '_O') AS name_tr
    FROM supplier
    """,
    note="string functions II: padding, reverse/repeat, ascii, edit "
         "distance (levenshtein), character translation")
def scalar_string_funcs2(spark, sf_dir):
    s = tbl(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.lpad("s_name", 20, "*").alias("name_pad"),
        F.rpad("s_name", 20, ".").alias("name_rpad"),
        F.reverse("s_name").alias("name_rev"),
        F.repeat("s_name", 2).alias("name_twice"),
        F.ascii("s_name").alias("first_byte"),
        F.levenshtein("s_name", F.lit("Supplier#1")).alias("edit_dist"),
        F.translate("s_name", "#0", "_O").alias("name_tr"))


@register(
    "scalar_datetime_funcs2",
    oracle="""
    SELECT o_orderkey,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
           o_orderdate + INTERVAL 3 MONTH AS plus_3mo,
           strftime(o_orderdate, '%Y/%m/%d') AS fmt,
           CAST(week(o_orderdate) AS INT) AS iso_week,
           CAST(dayofyear(o_orderdate) AS INT) AS doy,
           make_timestamp(CAST(year(o_orderdate) AS BIGINT), 7, 4, 12, 0,
                          0.0) AS synth_ts
    FROM orders
    """,
    note="datetime functions II: epoch seconds, month arithmetic (with "
         "end-of-month clamping), format, ISO week, day-of-year, "
         "timestamp construction")
def scalar_datetime_funcs2(spark, sf_dir):
    o = tbl(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        (F.add_months("o_orderdate", 3).cast("timestamp")).alias("plus_3mo"),
        F.date_format("o_orderdate", "yyyy/MM/dd").alias("fmt"),
        F.weekofyear("o_orderdate").alias("iso_week"),
        F.dayofyear("o_orderdate").alias("doy"),
        F.make_timestamp(F.year("o_orderdate"), F.lit(7), F.lit(4),
                         F.lit(12), F.lit(0), F.lit(0)).alias("synth_ts"))


@register(
    "scalar_hash_bitwise",
    oracle="""
    SELECT d.doc_id,
           md5(d.text) AS h_md5,
           sha256(d.text) AS h_sha256,
           base64(CAST(d.lang AS BLOB)) AS lang_b64,
           lower(hex(CAST(d.source AS BLOB))) AS src_hex,
           d.doc_id & 255 AS low_byte,
           d.doc_id | 1   AS odd_or,
           xor(d.doc_id, 21845) AS xored,
           CAST(bit_count(d.doc_id) AS INT) AS popcount
    FROM documents d
    """,
    note="hash + binary + bitwise functions: md5/sha256 (content "
         "addressing for dedup), base64/hex codecs, AND/OR/XOR/popcount")
def scalar_hash_bitwise(spark, sf_dir):
    d = tbl(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("h_md5"),
        F.sha2("text", 256).alias("h_sha256"),
        F.base64(F.encode("lang", "UTF-8")).alias("lang_b64"),
        F.lower(F.hex(F.encode("source", "UTF-8"))).alias("src_hex"),
        F.col("doc_id").bitwiseAND(F.lit(255)).alias("low_byte"),
        F.col("doc_id").bitwiseOR(F.lit(1)).alias("odd_or"),
        F.col("doc_id").bitwiseXOR(F.lit(21845)).alias("xored"),
        F.bit_count("doc_id").alias("popcount"))


# --------------------------------------------------------------------------
# Python UDAF surface: grouped-aggregate pandas_udf (Arrow-batched). The
# reference's only "aggregate" is user reduce code (TestReducer.java:26-38);
# this is the engine's third path to those semantics after the native
# expression (functions/integer_mean.py) and applyInPandas
# (flagship_arrow_pandas) — here the custom aggregate composes INSIDE a
# regular .agg() next to built-ins.
# --------------------------------------------------------------------------

import pandas as pd  # noqa: E402  (UDAF type hints need the real type)


def _int_mean_py(v: pd.Series) -> int:
    """Exact integer mean with the reference tripwire
    (TestReducer.java:34-37): (sum/count) - (sum%count)*100, non-negative
    domain so Python floor == Java truncation."""
    s, n = int(v.sum()), len(v)
    return (s // n) - (s % n) * 100


def _count_py(v: pd.Series) -> int:
    # grouped-agg pandas UDFs cannot share an .agg() with JVM aggregates
    # (INVALID_PANDAS_UDF_PLACEMENT) — so the row count is a second UDAF
    return len(v)


@register(
    "udaf_pandas_integer_mean",
    oracle="""
    SELECT l_returnflag,
           CAST((sum(v) // count(*)) - (sum(v) % count(*)) * 100
                AS BIGINT) AS int_mean,
           CAST(count(*) AS BIGINT) AS n
    FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS v
          FROM lineitem) t
    GROUP BY l_returnflag
    """,
    note="custom Python UDAF via grouped-agg pandas_udf (ArrowAggregate"
         "Python node, Arrow transfer), two UDAFs composed in one .agg(); "
         "exact integer arithmetic keeps it oracle-checkable")
def udaf_pandas_integer_mean(spark, sf_dir):
    # wrapped lazily: decorating at import time would parse the DDL return
    # type, which requires an active SparkContext the driver may not have
    # created yet (pytest collection imports this module session-free)
    int_mean_udaf = F.pandas_udf(_int_mean_py, "long")
    count_udaf = F.pandas_udf(_count_py, "long")
    li = tbl(spark, sf_dir, "lineitem")
    return (li.select("l_returnflag",
                      F.col("l_quantity").cast("long").alias("v"))
            .groupBy("l_returnflag")
            .agg(int_mean_udaf("v").alias("int_mean"),
                 count_udaf("v").alias("n")))


@register(
    "json_typed_struct",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k,
           (json_extract_string(props, '$.k') IS NULL) AS k_missing,
           CAST(json_extract_string(props, '$.k') AS INT) * 2 AS k_doubled
    FROM events
    """,
    note="typed JSON parse via from_json into a struct column — parse once, "
         "access many (vs get_json_object re-parsing per extraction); the "
         "scale path for semi-structured columns")
def json_typed_struct(spark, sf_dir):
    ev = tbl(spark, sf_dir, "events")
    parsed = ev.withColumn(
        "p", F.from_json("props", "struct<k:int>"))
    return parsed.select(
        "event_id",
        F.col("p.k").alias("k"),
        F.col("p.k").isNull().alias("k_missing"),
        (F.col("p.k") * 2).alias("k_doubled"))


@register(
    "scalar_datetime_funcs3",
    oracle="""
    SELECT o_orderkey,
           last_day(o_orderdate) AS month_end,
           CAST(quarter(o_orderdate) AS INT) AS qtr,
           CAST(date_trunc('quarter', o_orderdate) AS DATE)
               AS qtr_start,
           CAST(o_orderdate AS DATE)
               + CAST(8 - isodow(o_orderdate) AS INTEGER)
               AS next_monday,
           CAST(date_diff('day', CAST(o_orderdate AS DATE),
                          DATE '1998-12-01') AS BIGINT) AS days_to_ref
    FROM orders
    """,
    note="datetime functions III: end-of-month, quarter + quarter "
         "truncation, strictly-next Monday computed ARITHMETICALLY on "
         "both sides (Spark weekday() == isodow()-1 — the builtins' "
         "week-origin disagreement bridged once, same as "
         "ts_seasonality_dow), and day distance to a reference date")
def scalar_datetime_funcs3(spark, sf_dir):
    o = tbl(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.last_day("o_orderdate").alias("month_end"),
        F.quarter("o_orderdate").alias("qtr"),
        F.date_trunc("quarter", "o_orderdate").cast("date")
        .alias("qtr_start"),
        F.date_add(d, 7 - F.weekday(d)).alias("next_monday"),
        F.datediff(F.lit("1998-12-01").cast("date"), d).cast("long")
        .alias("days_to_ref"))


@register(
    "array_funcs2",
    oracle="""
    SELECT o_orderkey,
           array_to_string(generate_series(1,
               CAST(o_orderkey % 4 + 2 AS BIGINT)), ',') AS seq,
           array_to_string(list_reverse(generate_series(1,
               CAST(o_orderkey % 4 + 2 AS BIGINT))), ',') AS rev,
           array_to_string(generate_series(1,
               CAST(o_orderkey % 4 + 2 AS BIGINT))[2:3], ',') AS sl,
           array_to_string(flatten([generate_series(1, 2),
                    generate_series(1, CAST(o_orderkey % 2 + 1
                                            AS BIGINT))]), ',') AS flat,
           CAST(list_position(generate_series(1,
               CAST(o_orderkey % 4 + 2 AS BIGINT)), 2) AS INT) AS pos2,
           list_contains(generate_series(1,
               CAST(o_orderkey % 4 + 2 AS BIGINT)),
               CAST(4 AS BIGINT)) AS has4,
           array_to_string(list_filter(generate_series(1,
               CAST(o_orderkey % 4 + 2 AS BIGINT)), x -> x != 2), ',')
               AS no2
    FROM orders
    """,
    note="array functions II: sequence construction, reverse, 1-based "
         "inclusive slice (Spark slice(start,len) == DuckDB [2:3]), "
         "flatten of nested arrays, element position, membership, and "
         "filter-removal — the array-surface breadth pass over "
         "deterministic per-key lengths. Every array output ships "
         "JOINED to a ','-string (Spark array_join / DuckDB "
         "array_to_string): the driver's pandas canon cannot sort raw "
         "list cells (r8 red: TypeError unhashable type 'list'), and "
         "the string wrap keeps every array operation under test while "
         "staying inside the driver's output envelope (parity.py "
         "envelope check pins the class)")
def array_funcs2(spark, sf_dir):
    o = tbl(spark, sf_dir, "orders")
    n = (F.col("o_orderkey") % 4 + 2).cast("long")
    seq = F.sequence(F.lit(1).cast("long"), n)

    def joined(arr):
        # array_join needs array<string>; the cast-then-join is exact
        # for integers (no format ambiguity)
        return F.array_join(
            F.transform(arr, lambda x: x.cast("string")), ",")

    return o.select(
        "o_orderkey",
        joined(seq).alias("seq"),
        joined(F.reverse(seq)).alias("rev"),
        joined(F.slice(seq, 2, 2)).alias("sl"),
        joined(F.flatten(F.array(
            F.sequence(F.lit(1).cast("long"), F.lit(2).cast("long")),
            F.sequence(F.lit(1).cast("long"),
                       (F.col("o_orderkey") % 2 + 1).cast("long")))))
        .alias("flat"),
        F.array_position(seq, 2).cast("int").alias("pos2"),
        F.array_contains(seq, F.lit(4).cast("long")).alias("has4"),
        joined(F.filter(seq, lambda x: x != 2)).alias("no2"))


@register(
    "scalar_string_funcs3",
    oracle="""
    SELECT c_custkey,
           translate(c_mktsegment, 'AEIOU', 'aeiou') AS translated,
           split_part(c_name, '#', 2) AS name_num,
           repeat(substr(c_mktsegment, 1, 2), 3) AS rep,
           reverse(c_mktsegment) AS rev,
           CAST(strpos(c_mktsegment, 'I') AS INT) AS pos_i,
           CAST(ascii(c_mktsegment) AS INT) AS first_code,
           right(c_name, 4) AS last4
    FROM customer
    """,
    note="string functions III: character translation, delimiter "
         "field extraction (split_part), repetition, reversal, "
         "1-based substring position (0 = absent on both engines), "
         "leading code point, right-anchored slice — rounding out "
         "the string surface with pairs whose semantics agree "
         "cross-engine without shimming")
def scalar_string_funcs3(spark, sf_dir):
    cust = tbl(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.translate("c_mktsegment", "AEIOU", "aeiou")
        .alias("translated"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2))
        .alias("name_num"),
        F.repeat(F.substring("c_mktsegment", 1, 2), 3).alias("rep"),
        F.reverse("c_mktsegment").alias("rev"),
        F.instr("c_mktsegment", "I").cast("int").alias("pos_i"),
        F.ascii("c_mktsegment").alias("first_code"),
        F.substring(F.col("c_name"), -4, 4).alias("last4"))


@register(
    "scalar_regex_funcs",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[a-z]+')) AS INT)
               AS n_word_runs,
           CAST(len(regexp_extract_all(text, '\b[st][a-z]*')) AS INT)
               AS n_st_words,
           regexp_extract(text, '([a-z]{6,})', 1) AS first_long,
           regexp_matches(text, 'table') AS mentions_table,
           CAST(len(string_split_regex(text, '[aeiou]+')) AS INT)
               AS n_vowel_splits
    FROM documents
    """,
    note="regex function surface: match-run counting, anchored class "
         "extraction, first capture group, boolean containment, and "
         "regex splitting — restricted to the regex subset with "
         "identical Java/RE2 semantics (char classes + word "
         "boundaries, no lookaround/backrefs — the PII_PATTERNS "
         "discipline)")
def scalar_regex_funcs(spark, sf_dir):
    d = tbl(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(t, F.lit("[a-z]+"), F.lit(0)))
        .cast("int").alias("n_word_runs"),
        F.size(F.regexp_extract_all(t, F.lit(r"\b[st][a-z]*"),
                                    F.lit(0)))
        .cast("int").alias("n_st_words"),
        F.regexp_extract(t, "([a-z]{6,})", 1).alias("first_long"),
        t.rlike("table").alias("mentions_table"),
        F.size(F.split(t, "[aeiou]+")).cast("int")
        .alias("n_vowel_splits"))
