"""Scalar function catalog (SURVEY §2c scalar fns [X]).

String / date / math / array / JSON functions, each mapped 1:1 onto
``pyspark.sql.functions`` (JVM-side, whole-stage-codegen'd — never
Python UDFs) with the DuckDB spelling in the oracle.

Cross-engine footguns handled here: extraction functions return int32
in Spark vs BIGINT in DuckDB (→ cast to long); DuckDB ``round`` on
DOUBLE is half-even vs Spark's half-up (→ round on exact decimals
instead); ``ln``/``exp`` are not correctly-rounded and may differ in
the last ulp (→ excluded from oracle-checked outputs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hana_bq_beam_connector_spark.queries import register
from hana_bq_beam_connector_spark.queries._util import events_us
from hana_bq_beam_connector_spark.sources.files import load_table


@register(
    "scalar_string_funcs",
    """
    SELECT p_partkey,
      LOWER(p_name) AS name_lower,
      UPPER(p_brand) AS brand_upper,
      TRIM(p_type) AS type_trim,
      SUBSTR(p_name, 1, 5) AS name_prefix,
      p_brand || ':' || p_type AS brand_type,
      REPLACE(p_name, ' ', '_') AS name_snake,
      CAST(LENGTH(p_name) AS BIGINT) AS name_len
    FROM part
    """,
    doc="lower/upper/trim/substr/concat/replace/length.",
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.trim("p_type").alias("type_trim"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.length("p_name").cast("long").alias("name_len"),
    )


@register(
    "scalar_regexp_funcs",
    r"""
    SELECT p_partkey,
      regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
      regexp_matches(p_type, 'BRUSHED|POLISHED') AS is_finished,
      regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowels,
      CAST(LENGTH(p_name) - LENGTH(regexp_replace(p_name, 'a', '', 'g'))
           AS BIGINT) AS a_count
    FROM part
    """,
    doc="regexp extract/match/replace; counting via replace-diff "
    "(portable to engines without regexp_count).",
)
def scalar_regexp_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.col("p_type").rlike("BRUSHED|POLISHED").alias("is_finished"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("name_novowels"),
        (
            F.length("p_name")
            - F.length(F.regexp_replace("p_name", "a", ""))
        ).cast("long").alias("a_count"),
    )


@register(
    "scalar_date_funcs",
    """
    SELECT o_orderkey,
      CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year,
      CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS order_month,
      CAST(EXTRACT(day FROM o_orderdate) AS BIGINT) AS order_day,
      CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP)
        AS order_month_start,
      CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS due_ts,
      CAST(DATE_DIFF('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate)
           AS BIGINT) AS days_since_95
    FROM orders
    """,
    doc="year/month/day extraction, month truncation, interval "
    "arithmetic, day differences (arg order aligned: Spark "
    "datediff(end,start) = DuckDB date_diff('day',start,end)).",
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("order_day"),
        F.date_trunc("month", "o_orderdate").cast("timestamp_ntz").alias(
            "order_month_start"
        ),
        (F.col("o_orderdate").cast("date") + F.expr("INTERVAL 30 DAYS"))
        .cast("timestamp_ntz")
        .alias("due_ts"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
        ).cast("long").alias("days_since_95"),
    )


@register(
    "scalar_math_funcs",
    """
    SELECT p_partkey,
      ABS(p_retailprice - 1000.0) AS price_dev,
      FLOOR(p_retailprice) AS price_floor,
      CEIL(p_retailprice) AS price_ceil,
      CAST(ROUND(CAST(p_retailprice AS DECIMAL(18,2)), 1) AS DOUBLE)
        AS price_round1,
      CAST(p_size % 7 AS BIGINT) AS size_mod7,
      SQRT(CAST(p_size AS DOUBLE)) AS size_sqrt,
      CAST(p_size AS DOUBLE) * CAST(p_size AS DOUBLE) AS size_sq
    FROM part
    """,
    doc="abs/floor/ceil/round/mod/sqrt/power — round done on exact "
    "decimal (Spark half-up vs DuckDB half-even on doubles would "
    "drift), sqrt is IEEE correctly-rounded so doubles match.",
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    size_d = F.col("p_size").cast("double")
    return p.select(
        "p_partkey",
        F.abs(F.col("p_retailprice") - 1000.0).alias("price_dev"),
        F.floor("p_retailprice").cast("double").alias("price_floor"),
        F.ceil("p_retailprice").cast("double").alias("price_ceil"),
        F.round(F.col("p_retailprice").cast("decimal(18,2)"), 1)
        .cast("double")
        .alias("price_round1"),
        F.pmod(F.col("p_size"), F.lit(7)).cast("long").alias("size_mod7"),
        F.sqrt(size_d).alias("size_sqrt"),
        (size_d * size_d).alias("size_sq"),
    )


@register(
    "scalar_json_funcs",
    """
    SELECT event_id,
      json_extract_string(props, '$.k') AS k_str,
      CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int
    FROM events
    """,
    doc="JSON field extraction over events.props "
    "(get_json_object / json_extract_string).",
)
def scalar_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_us(spark, sf_dir)
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("long").alias("k_int"),
    )


@register(
    "scalar_array_funcs",
    """
    SELECT doc_id,
      CAST(LENGTH(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      string_split(text, ' ')[1] AS first_token,
      list_contains(string_split(text, ' '), 'spark') AS has_spark,
      array_to_string(list_slice(string_split(text, ' '), 1, 3), '-')
        AS first3_joined
    FROM documents
    """,
    doc="array size/index/contains/slice/join over tokenized text "
    "(split is 1:1 between engines for single-space corpora).",
)
def scalar_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.element_at(toks, 1).alias("first_token"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.array_join(F.slice(toks, 1, 3), "-").alias("first3_joined"),
    )


@register(
    "scalar_conditional_funcs",
    """
    SELECT o_orderkey,
      CASE WHEN o_totalprice > 300000 THEN 'high'
           WHEN o_totalprice > 100000 THEN 'mid'
           ELSE 'low' END AS price_band,
      COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_decoded,
      IF(o_orderpriority LIKE '1-%', 1, 0) AS is_urgent
    FROM orders
    """,
    doc="CASE/COALESCE/NULLIF/IF/LIKE conditional surface.",
)
def scalar_conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(
            F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")
        ).alias("status_decoded"),
        F.when(F.col("o_orderpriority").like("1-%"), 1)
        .otherwise(0)
        .cast("int")
        .alias("is_urgent"),
    )


@register(
    "scalar_map_funcs",
    """
    SELECT event_id,
      CAST(cardinality(MAP {'type': event_type,
                            'uid': CAST(user_id AS VARCHAR)}) AS BIGINT)
        AS n_keys,
      array_to_string(map_keys(MAP {'type': event_type,
                                    'uid': CAST(user_id AS VARCHAR)}), ',')
        AS keys_joined,
      map_extract(MAP {'type': event_type,
                       'uid': CAST(user_id AS VARCHAR)}, 'uid')[1] AS uid_val
    FROM events
    """,
    doc="Map scalar functions (SURVEY §2c map): create_map / map_keys "
    "/ element_at — constructed inline (the star tables carry no map "
    "columns) so both engines exercise their native MAP type.",
)
def scalar_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_us(spark, sf_dir)
    m = F.create_map(
        F.lit("type"),
        F.col("event_type"),
        F.lit("uid"),
        F.col("user_id").cast("string"),
    )
    return ev.select(
        "event_id",
        F.size(m).cast("long").alias("n_keys"),
        F.array_join(F.map_keys(m), ",").alias("keys_joined"),
        F.element_at(m, "uid").alias("uid_val"),
    )


@register(
    "scalar_json_typed",
    """
    SELECT event_id,
      CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_typed,
      CAST(json_extract_string(props, '$.missing') AS BIGINT) AS k_missing,
      CASE WHEN json_extract_string(props, '$.k') IS NOT NULL
           THEN 1 ELSE 0 END AS has_k
    FROM events
    """,
    doc="Typed JSON extraction (from_json with declared schema): the "
    "schema-on-read path for semi-structured columns — parse once "
    "into a struct, prune to referenced fields; missing keys are "
    "typed NULLs, not strings.",
)
def scalar_json_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_us(spark, sf_dir)
    parsed = ev.withColumn(
        "__p", F.from_json("props", "k BIGINT, missing BIGINT")
    )
    return parsed.select(
        "event_id",
        F.col("__p.k").alias("k_typed"),
        F.col("__p.missing").alias("k_missing"),
        F.when(F.col("__p.k").isNotNull(), 1).otherwise(0).alias("has_k"),
    )


@register(
    "scalar_nullsafe_funcs",
    """
    SELECT o_orderkey,
      NULLIF(o_orderstatus, 'O') AS status_or_null,
      COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_filled,
      CASE WHEN NULLIF(o_orderstatus, 'O')
                IS NOT DISTINCT FROM NULLIF(o_orderpriority, o_orderpriority)
           THEN 1 ELSE 0 END AS both_null
    FROM orders
    """,
    doc="Null-safe scalar surface: NULLIF / COALESCE / null-safe "
    "equality (Spark <=>, SQL IS NOT DISTINCT FROM) — the three-"
    "valued-logic edges every engine must agree on.",
)
def scalar_nullsafe_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    status_or_null = F.expr("nullif(o_orderstatus, 'O')")
    always_null = F.expr("nullif(o_orderpriority, o_orderpriority)")
    return o.select(
        "o_orderkey",
        status_or_null.alias("status_or_null"),
        F.coalesce(status_or_null, F.lit("OPEN")).alias("status_filled"),
        F.when(status_or_null.eqNullSafe(always_null), 1)
        .otherwise(0)
        .alias("both_null"),
    )


@register(
    "scalar_higher_order_funcs",
    """
    SELECT doc_id,
      list_reduce(list_prepend(CAST(0 AS BIGINT), L),
                  (acc, x) -> acc + x) AS total_chars,
      CAST(len(list_filter(L, x -> x > 4)) AS BIGINT) AS n_long_tokens,
      list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(range(1, len(L) + 1),
                         i -> L[i] * L[len(L) - i + 1])),
          (acc, x) -> acc + x) AS rev_dot
    FROM (
      SELECT doc_id,
             list_transform(string_split(text, ' '),
                            x -> CAST(length(x) AS BIGINT)) AS L
      FROM documents
    )
    """,
    doc="Higher-order array functions — transform / filter / "
    "aggregate (fold) / zip_with — over per-token lengths: total "
    "characters, long-token count, and the dot product of the length "
    "vector with its reverse.  All-integer folds, bit-identical "
    "across engines.  The token-length array binds in its own "
    "projection (word_ngrams contract: an inline split would "
    "re-tokenize per lambda call).",
)
def scalar_higher_order_funcs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    bound = d.select(
        "doc_id",
        F.expr(
            "transform(split(text, ' '), x -> cast(length(x) as bigint))"
        ).alias("L"),
    )
    return bound.select(
        "doc_id",
        F.expr(
            "aggregate(L, cast(0 as bigint), (acc, x) -> acc + x)"
        ).alias("total_chars"),
        F.expr("cast(size(filter(L, x -> x > 4)) as bigint)").alias(
            "n_long_tokens"
        ),
        F.expr(
            "aggregate(zip_with(L, reverse(L), (a, b) -> a * b), "
            "cast(0 as bigint), (acc, x) -> acc + x)"
        ).alias("rev_dot"),
    )


@register(
    "scalar_url_funcs",
    """
    SELECT doc_id,
      regexp_extract(url, '^https?://([^/]+)', 1) AS host,
      regexp_extract(url, '^https?://[^/]+(/[^?]*)', 1) AS path,
      regexp_extract(url, '[?&]lang=([^&]*)', 1) AS lang_param,
      CASE WHEN url LIKE 'https://%' THEN 'https' ELSE 'http' END
        AS scheme
    FROM (
      SELECT doc_id,
        'https://' || source || '.example.com/docs/'
          || CAST(doc_id AS VARCHAR) || '?lang=' || lang AS url
      FROM documents
    )
    """,
    doc="URL parsing (host/path/query-param/scheme) — the link-"
    "normalization step of web-corpus curation.  Spelled with "
    "regexp_extract in BOTH engines (Spark's parse_url exists but "
    "has no DuckDB twin; the regex spelling is engine-portable and "
    "equally codegen'd).  Pure projection: zero shuffles at any "
    "scale.",
)
def scalar_url_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.regexp_extract("url", r"^https?://([^/]+)", 1).alias("host"),
        F.regexp_extract("url", r"^https?://[^/]+(/[^?]*)", 1).alias("path"),
        F.regexp_extract("url", r"[?&]lang=([^&]*)", 1).alias("lang_param"),
        F.when(F.col("url").startswith("https://"), "https")
        .otherwise("http")
        .alias("scheme"),
    )


@register(
    "scalar_variant_funcs",
    """
    SELECT event_id,
      CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_long,
      CAST(json_extract_string(
        '{"u": ' || CAST(user_id AS VARCHAR)
          || ', "tags": ["' || event_type || '", "x"]}',
        '$.u') AS BIGINT) AS u,
      json_extract_string(
        '{"u": ' || CAST(user_id AS VARCHAR)
          || ', "tags": ["' || event_type || '", "x"]}',
        '$.tags[0]') AS tag0
    FROM events
    """,
    doc="Semi-structured VARIANT surface (Spark 4): props parsed once "
    "with try_parse_json into a VARIANT, fields extracted typed via "
    "variant_get — including a nested-array path on a constructed "
    "document.  VARIANT stores a parsed binary form, so N extractions "
    "cost one parse (get_json_object re-parses the string per call — "
    "the difference between 1× and N× parse CPU over a 100 TB JSON "
    "column).  The oracle reads the same paths with DuckDB's JSON "
    "functions; outputs are plain typed columns, so the hash compare "
    "is engine-neutral.",
)
def scalar_variant_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_us(spark, sf_dir)
    doc = F.concat(
        F.lit('{"u": '),
        F.col("user_id").cast("string"),
        F.lit(', "tags": ["'),
        F.col("event_type"),
        F.lit('", "x"]}'),
    )
    obj = F.parse_json(doc)
    return ev.select(
        "event_id",
        F.expr("variant_get(try_parse_json(props), '$.k', 'long')").alias(
            "k_long"
        ),
        F.variant_get(obj, "$.u", "long").alias("u"),
        F.variant_get(obj, "$.tags[0]", "string").alias("tag0"),
    )


@register(
    "scalar_unpivot_metrics",
    """
    WITH a AS (
      SELECT l_returnflag,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
          AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
          AS sum_base_price,
        CAST(SUM(CAST(l_discount AS DECIMAL(4,3))) AS DOUBLE)
          AS sum_discount
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, metric, value
    FROM a UNPIVOT (value FOR metric IN
                    (sum_qty, sum_base_price, sum_discount))
    """,
    doc="UNPIVOT / melt (wide -> long): per-returnflag metric columns "
    "rotate into (metric, value) rows — the reshape every metrics "
    "warehouse needs before a generic 'metric catalog' sink, and a "
    "relational operator the reference's fixed-schema copy pipeline "
    "cannot express.  Spark side is DataFrame.unpivot (the Spark 3.4+ "
    "melt), which is a zero-shuffle row expansion over the already "
    "aggregated frame; sums aggregate through exact DECIMAL and cast "
    "to double ONCE per metric (identical closing expressions both "
    "engines), so the rotated values hash-match bit-for-bit.",
)
def scalar_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    a = li.groupBy("l_returnflag").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_qty"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_base_price"),
        F.sum(F.col("l_discount").cast("decimal(4,3)"))
        .cast("double")
        .alias("sum_discount"),
    )
    return a.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_base_price", "sum_discount"],
        variableColumnName="metric",
        valueColumnName="value",
    )
