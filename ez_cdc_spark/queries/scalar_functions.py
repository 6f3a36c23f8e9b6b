"""Scalar function families (SURVEY.md §2b) — one combined projection query
per family, restricted to the DuckDB-portable subset (regex dialect, TZ,
rounding caveats noted per query).

All of these run inside whole-stage codegen (pure pyspark.sql.functions, no
Python UDFs) — at 100 TB they are a single scan+project stage.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ez_cdc_spark.queries import register
from ez_cdc_spark.queries._util import t


@register(
    "f_string",
    oracle="""
SELECT p_partkey,
       lower(p_name) AS lo, upper(p_brand) AS up,
       trim(concat(' ', p_name, ' ')) AS trimmed,
       ltrim(concat('xx', p_name), 'x') AS lt,
       rtrim(concat(p_name, 'yy'), 'y') AS rt,
       CAST(length(p_name) AS BIGINT) AS len,
       substring(p_name, 2, 5) AS sub,
       concat_ws('|', p_brand, p_type) AS cw,
       replace(p_type, 'BRASS', 'brass') AS repl,
       lpad(p_brand, 12, '.') AS lp, rpad(p_brand, 12, '.') AS rp,
       CAST(strpos(p_name, 'a') AS BIGINT) AS pos_a,
       regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
       regexp_replace(p_name, '[aeiou]', '_', 'g') AS devowel,
       reverse(p_brand) AS rev,
       CAST(levenshtein(p_brand, p_type) AS BIGINT) AS lev,
       split_part(p_name, ' ', 1) AS first_token
FROM part
ORDER BY p_partkey
""",
    doc="F-string: portable string-function family over part.",
)
def f_string(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("lo"),
        F.upper("p_brand").alias("up"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias("trimmed"),
        F.ltrim(F.concat(F.lit("xx"), F.col("p_name")), F.lit("x")).alias("lt"),
        F.rtrim(F.concat(F.col("p_name"), F.lit("yy")), F.lit("y")).alias("rt"),
        F.length("p_name").cast("bigint").alias("len"),
        F.substring("p_name", 2, 5).alias("sub"),
        F.concat_ws("|", "p_brand", "p_type").alias("cw"),
        F.replace(F.col("p_type"), F.lit("BRASS"), F.lit("brass")).alias("repl"),
        F.lpad("p_brand", 12, ".").alias("lp"),
        F.rpad("p_brand", 12, ".").alias("rp"),
        F.instr("p_name", "a").cast("bigint").alias("pos_a"),
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devowel"),
        F.reverse("p_brand").alias("rev"),
        F.levenshtein("p_brand", "p_type").cast("bigint").alias("lev"),
        F.split(F.col("p_name"), " ").getItem(0).alias("first_token"),
    ).orderBy("p_partkey")


@register(
    "f_datetime",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS BIGINT) AS y,
       CAST(month(o_orderdate) AS BIGINT) AS m,
       CAST(day(o_orderdate) AS BIGINT) AS d,
       CAST(date_part('dow', o_orderdate) + 1 AS BIGINT) AS dow,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
       strftime(o_orderdate - INTERVAL 7 DAY, '%Y-%m-%d') AS minus7,
       CAST(date_diff('day', o_orderdate, TIMESTAMP '1998-01-01 00:00:00') AS BIGINT) AS days_to_98,
       CAST((1998 - year(o_orderdate)) * 12 - month(o_orderdate) + 1 AS BIGINT) AS whole_months_to_98,
       strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
       CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
FROM orders
WHERE o_orderkey <= 2000
ORDER BY o_orderkey
""",
    doc="F-datetime: portable date/time family (dayofweek declared via dow+1 mapping).",
)
def f_datetime(spark, sf_dir):
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).cast("bigint").alias("y"),
        F.month(d).cast("bigint").alias("m"),
        F.dayofmonth(d).cast("bigint").alias("d"),
        F.dayofweek(d).cast("bigint").alias("dow"),  # Sunday=1 == duckdb dow+1
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.date_add(d.cast("date"), 30), "yyyy-MM-dd").alias("plus30"),
        F.date_format(F.date_sub(d.cast("date"), 7), "yyyy-MM-dd").alias("minus7"),
        F.datediff(F.lit("1998-01-01").cast("date"), d.cast("date"))
        .cast("bigint")
        .alias("days_to_98"),
        ((F.lit(1998) - F.year(d)) * 12 - F.month(d) + 1)
        .cast("bigint")
        .alias("whole_months_to_98"),
        F.date_format(F.last_day(d.cast("date")), "yyyy-MM-dd").alias("month_end"),
        F.unix_timestamp(d).cast("bigint").alias("epoch_s"),
    ).orderBy("o_orderkey")


@register(
    "f_math",
    oracle="""
SELECT p_partkey,
       CAST(abs(p_size - 25) AS BIGINT) AS a,
       CAST(round(CAST(p_retailprice AS DECIMAL(12,2)) / 7, 2) AS DOUBLE) AS r2,
       CAST(floor(CAST(p_retailprice AS DOUBLE) / 100) AS BIGINT) AS fl,
       CAST(ceil(CAST(p_retailprice AS DOUBLE) / 100) AS BIGINT) AS ce,
       ROUND(sqrt(CAST(p_size AS DOUBLE)), 6) AS sq,
       CAST(pow(CAST(p_size AS DOUBLE), 2) AS DOUBLE) AS p2,
       ROUND(exp(CAST(p_size AS DOUBLE) / 50), 6) AS ex,
       ROUND(ln(CAST(p_size + 1 AS DOUBLE)), 6) AS lg,
       ROUND(log10(CAST(p_size + 1 AS DOUBLE)), 6) AS l10,
       CAST(p_size % 7 AS BIGINT) AS md,
       CAST(((p_size - 30) % 7 + 7) % 7 AS BIGINT) AS pmd,
       CAST(sign(p_size - 25) AS BIGINT) AS sg,
       CAST(greatest(p_size, 25) AS BIGINT) AS gr,
       CAST(least(p_size, 25) AS BIGINT) AS le
FROM part
ORDER BY p_partkey
""",
    doc="F-math: math family; transcendentals ROUND(,6), decimal round exact.",
)
def f_math(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    sz = F.col("p_size")
    szd = sz.cast("double")
    return p.select(
        "p_partkey",
        F.abs(sz - 25).cast("bigint").alias("a"),
        F.round(F.col("p_retailprice").cast("decimal(12,2)") / 7, 2)
        .cast("double")
        .alias("r2"),
        F.floor(F.col("p_retailprice").cast("double") / 100).cast("bigint").alias("fl"),
        F.ceil(F.col("p_retailprice").cast("double") / 100).cast("bigint").alias("ce"),
        F.round(F.sqrt(szd), 6).alias("sq"),
        F.pow(szd, 2).alias("p2"),
        F.round(F.exp(szd / 50), 6).alias("ex"),
        F.round(F.log((sz + 1).cast("double")), 6).alias("lg"),
        F.round(F.log10((sz + 1).cast("double")), 6).alias("l10"),
        (sz % 7).cast("bigint").alias("md"),
        F.pmod(sz - 30, F.lit(7)).cast("bigint").alias("pmd"),
        F.signum((sz - 25).cast("double")).cast("bigint").alias("sg"),
        F.greatest(sz, F.lit(25)).cast("bigint").alias("gr"),
        F.least(sz, F.lit(25)).cast("bigint").alias("le"),
    ).orderBy("p_partkey")


@register(
    "f_conditional",
    oracle="""
SELECT c_custkey,
       coalesce(NULLIF(c_mktsegment, 'BUILDING'), 'was-building') AS seg,
       NULLIF(c_nationkey, 0) AS nk_nullable,
       coalesce(NULLIF(c_nationkey, 0), -1) AS nk_filled,
       CASE WHEN c_acctbal >= 0 THEN 'pos' ELSE 'neg' END AS sign_band
FROM customer
ORDER BY c_custkey
""",
    doc="F-conditional: coalesce / nullif / nvl / if.",
)
def f_conditional(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("was-building")).alias("seg"),
        F.nullif(F.col("c_nationkey"), F.lit(0)).alias("nk_nullable"),
        F.nvl(F.nullif(F.col("c_nationkey"), F.lit(0)), F.lit(-1)).alias("nk_filled"),
        F.when(F.col("c_acctbal") >= 0, "pos").otherwise("neg").alias("sign_band"),
    ).orderBy("c_custkey")


@register(
    "f_array",
    oracle="""
SELECT vec_id,
       CAST(len(embedding) AS BIGINT) AS dim,
       ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_el,
       ROUND(CAST(embedding[64] AS DOUBLE), 6) AS last_el,
       ROUND(CAST(list_min(embedding) AS DOUBLE), 6) AS mn,
       ROUND(CAST(list_max(embedding) AS DOUBLE), 6) AS mx,
       CAST(length(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
       ROUND(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 4) AS total,
       ROUND(CAST(list_sort(embedding)[1] AS DOUBLE), 6) AS sorted_first
FROM embeddings
ORDER BY vec_id
""",
    doc="F-array: size/element_at/min/max/filter/transform/aggregate on embeddings.",
)
def f_array(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    return e.select(
        "vec_id",
        F.size(emb).cast("bigint").alias("dim"),
        F.round(F.element_at(emb, 1).cast("double"), 6).alias("first_el"),
        F.round(F.element_at(emb, 64).cast("double"), 6).alias("last_el"),
        F.round(F.array_min(emb).cast("double"), 6).alias("mn"),
        F.round(F.array_max(emb).cast("double"), 6).alias("mx"),
        F.size(F.filter(emb, lambda x: x > 0)).cast("bigint").alias("n_pos"),
        F.round(
            F.aggregate(
                F.transform(emb, lambda x: x.cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            4,
        ).alias("total"),
        F.round(F.element_at(F.sort_array(emb), 1).cast("double"), 6).alias("sorted_first"),
    ).orderBy("vec_id")


@register(
    "f_map_json",
    oracle="""
SELECT event_id,
       CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
       CAST(json_extract_string(props, '$.k') AS VARCHAR) AS k_str,
       'k' AS first_key
FROM events
WHERE event_id < 2000
ORDER BY event_id
""",
    doc="F-map/json: get_json_object / from_json→map / map_keys on events.props.",
)
def f_map_json(spark, sf_dir):
    e = t(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    m = F.from_json(F.col("props"), "map<string,bigint>")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_val"),
        F.element_at(m, "k").cast("string").alias("k_str"),
        F.element_at(F.map_keys(m), 1).alias("first_key"),
    ).orderBy("event_id")


@register(
    "f_string2",
    oracle="""
SELECT p_partkey,
       array_to_string(list_transform(string_split(lower(p_name), ' '),
                       w -> upper(w[1:1]) || w[2:]), ' ') AS icap,
       repeat(p_brand, 2) AS rep,
       CAST(ascii(p_name[1:1]) AS BIGINT) AS first_ascii,
       p_name[1:3] AS l3,
       p_name[-3:] AS r3,
       CAST(starts_with(p_name, 'a') AS INT) AS sw,
       CAST(ends_with(p_name, 'e') AS INT) AS ew,
       translate(p_brand, 'AB', 'ab') AS tr
FROM part
ORDER BY p_partkey
""",
    doc="F-string-2: initcap (emulated in oracle) / repeat / ascii / left / "
    "right / startswith / endswith / translate.",
)
def f_string2(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    nm = F.col("p_name")
    return p.select(
        "p_partkey",
        F.initcap(nm).alias("icap"),
        F.repeat(F.col("p_brand"), 2).alias("rep"),
        F.ascii(nm).cast("bigint").alias("first_ascii"),
        F.substring(nm, 1, 3).alias("l3"),
        F.substring(nm, -3, 3).alias("r3"),
        F.startswith(nm, F.lit("a")).cast("int").alias("sw"),
        F.endswith(nm, F.lit("e")).cast("int").alias("ew"),
        F.translate(F.col("p_brand"), "AB", "ab").alias("tr"),
    ).orderBy("p_partkey")


@register(
    "f_datetime2",
    oracle="""
SELECT o_orderkey,
       strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS as_date,
       CAST(epoch(strptime(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'),
                           '%Y-%m-%d %H:%M:%S')) AS BIGINT) AS reparsed_epoch,
       strftime(to_timestamp(epoch(o_orderdate)), '%Y-%m-%d %H:%M:%S') AS from_unix,
       CAST(date_diff('month', date_trunc('month', o_orderdate),
                      DATE '1998-01-01') AS DOUBLE) AS mb_to_98,
       strftime(CAST(o_orderdate + INTERVAL 2 MONTH AS DATE), '%Y-%m-%d') AS plus2m,
       CAST(quarter(o_orderdate) AS BIGINT) AS q,
       CAST(weekofyear(o_orderdate) AS BIGINT) AS woy,
       CAST(dayofyear(o_orderdate) AS BIGINT) AS doy
FROM orders
WHERE o_orderkey <= 2000
ORDER BY o_orderkey
""",
    doc="F-datetime-2: to_date / to_timestamp round-trip / from_unixtime / "
    "months_between (month-truncated, integral) / add_months / quarter / "
    "weekofyear / dayofyear. Session TZ pinned UTC both engines.",
)
def f_datetime2(spark, sf_dir):
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    d = F.col("o_orderdate")
    fmt = "yyyy-MM-dd HH:mm:ss"
    return o.select(
        "o_orderkey",
        F.date_format(F.to_date(F.date_format(d, "yyyy-MM-dd")), "yyyy-MM-dd").alias(
            "as_date"
        ),
        F.unix_timestamp(F.to_timestamp(F.date_format(d, fmt), fmt))
        .cast("bigint")
        .alias("reparsed_epoch"),
        F.from_unixtime(F.unix_timestamp(d), fmt).alias("from_unix"),
        F.months_between(
            F.lit("1998-01-01").cast("date"), F.date_trunc("month", d)
        ).alias("mb_to_98"),
        F.date_format(F.add_months(d.cast("date"), 2), "yyyy-MM-dd").alias("plus2m"),
        F.quarter(d).cast("bigint").alias("q"),
        F.weekofyear(d).cast("bigint").alias("woy"),
        F.dayofyear(d).cast("bigint").alias("doy"),
    ).orderBy("o_orderkey")


@register(
    "f_array2",
    oracle="""
WITH b AS (
  SELECT vec_id, embedding,
         list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10) AS INT)) AS ia
  FROM embeddings
)
SELECT vec_id,
       CAST(list_contains(ia, 3) AS INT) AS has3,
       CAST(coalesce(list_position(ia, 3), 0) AS BIGINT) AS pos3,
       array_to_string(list_sort(list_distinct(ia)), ',') AS dia,
       ROUND(CAST(list_slice(embedding, 3, 6)[2] AS DOUBLE), 6) AS slice_el,
       ROUND(CAST(flatten([embedding[1:2], embedding[3:4]])[3] AS DOUBLE), 6) AS flat_el,
       ROUND(CAST(embedding[10] AS DOUBLE), 6) AS zip_val,
       CAST(10 AS BIGINT) AS zip_idx,
       array_to_string(list_sort(list_distinct(list_filter(ia, x -> list_contains([0,1,2], x)))), ',') AS inter,
       array_to_string(list_sort(list_distinct(list_concat(list_slice(ia, 1, 2), [99]))), ',') AS uni,
       CAST(list_has_any(ia, [3, 4]) AS INT) AS overlap34
FROM b
ORDER BY vec_id
""",
    doc="F-array-2: array_contains / array_position / array_distinct / slice / "
    "flatten / arrays_zip / array_intersect / array_union / arrays_overlap "
    "over a derived int array (no float-equality hazards). Array-valued "
    "results are rendered as ','-joined strings: the driver canonicalizer "
    "pandas-sorts every output column and raw array cells are unhashable "
    "(r2 crash); the joined string carries identical information.",
)
def f_array2(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    b = e.select(
        "vec_id",
        emb,
        F.transform(emb, lambda x: F.floor(x.cast("double") * 10).cast("int")).alias(
            "ia"
        ),
        F.sequence(F.lit(1), F.size(emb)).alias("idx"),
    )
    ia = F.col("ia")
    z = F.arrays_zip(F.col("embedding"), F.col("idx"))
    return b.select(
        "vec_id",
        F.array_contains(ia, 3).cast("int").alias("has3"),
        F.array_position(ia, 3).cast("bigint").alias("pos3"),
        F.array_join(
            F.transform(F.sort_array(F.array_distinct(ia)), lambda x: x.cast("string")),
            ",",
        ).alias("dia"),
        F.round(F.element_at(F.slice(F.col("embedding"), 3, 4), 2).cast("double"), 6)
        .alias("slice_el"),
        F.round(
            F.element_at(
                F.flatten(
                    F.array(
                        F.slice(F.col("embedding"), 1, 2),
                        F.slice(F.col("embedding"), 3, 2),
                    )
                ),
                3,
            ).cast("double"),
            6,
        ).alias("flat_el"),
        F.round(F.element_at(z, 10).getField("embedding").cast("double"), 6).alias(
            "zip_val"
        ),
        F.element_at(z, 10).getField("idx").cast("bigint").alias("zip_idx"),
        F.array_join(
            F.transform(
                F.sort_array(F.array_intersect(ia, F.array(F.lit(0), F.lit(1), F.lit(2)))),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("inter"),
        F.array_join(
            F.transform(
                F.sort_array(F.array_union(F.slice(ia, 1, 2), F.array(F.lit(99)))),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("uni"),
        F.arrays_overlap(ia, F.array(F.lit(3), F.lit(4))).cast("int").alias("overlap34"),
    ).orderBy("vec_id")


@register(
    "f_map_json2",
    oracle="""
SELECT event_id,
       CAST(json_extract(props, '$.k') AS BIGINT) AS mv1,
       CAST(json_extract(props, '$.k') AS BIGINT) AS mfe_k,
       to_json(struct_pack(event_id := event_id,
                           k := CAST(json_extract(props, '$.k') AS BIGINT)))::VARCHAR AS js,
       json_extract_string(props, '$.k') AS jt_k,
       'STRUCT<k: BIGINT>' AS sch,
       CAST(1 AS BIGINT) AS mc_x
FROM events
WHERE event_id < 2000
ORDER BY event_id
""",
    doc="F-map/json-2: map_values / map_from_entries / to_json / json_tuple / "
    "schema_of_json / map_concat on events.props.",
)
def f_map_json2(spark, sf_dir):
    e = t(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    m = F.from_json(F.col("props"), "map<string,bigint>")
    kv = F.get_json_object("props", "$.k").cast("bigint")
    m2 = F.map_from_entries(
        F.array(F.struct(F.lit("k").alias("key"), kv.alias("value")))
    )
    return e.select(
        "event_id",
        F.element_at(F.map_values(m), 1).alias("mv1"),
        F.element_at(m2, "k").alias("mfe_k"),
        F.to_json(F.struct(F.col("event_id"), kv.alias("k"))).alias("js"),
        F.json_tuple(F.col("props"), "k").alias("jt_k"),
        F.schema_of_json(F.lit('{"k":87}')).alias("sch"),
        F.element_at(
            F.map_concat(m, F.create_map(F.lit("x"), F.lit(1).cast("bigint"))), "x"
        ).alias("mc_x"),
    ).orderBy("event_id")


@register(
    "f_hash",
    oracle="""
SELECT c_custkey,
       md5(c_name) AS h_md5,
       sha256(c_name) AS h_sha256
FROM customer
ORDER BY c_custkey
""",
    doc="F-hash: md5/sha2-256 (portable); xxhash64/crc32 are bench-only (a4-style).",
)
def f_hash(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.md5("c_name").alias("h_md5"),
        F.lower(F.sha2("c_name", 256)).alias("h_sha256"),
    ).orderBy("c_custkey")


@register(
    "f_bitwise",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(l_orderkey & 255 AS BIGINT) AS key_band,
       CAST(xor(l_orderkey, l_partkey) AS BIGINT) AS key_xor,
       CAST(l_linenumber << 2 AS BIGINT) AS line_shl,
       CAST(l_orderkey >> 3 AS BIGINT) AS key_shr,
       CAST(bit_count(l_orderkey) AS INT) AS key_bits
FROM lineitem
WHERE l_orderkey < 200
ORDER BY l_orderkey, l_linenumber
""",
    doc="F: bitwise function family — AND-masking (hash banding), XOR (key "
    "mixing), shifts, population count (the SimHash/Hamming primitive "
    "x2c builds on). Pure map-side integer expressions inside whole-"
    "stage codegen; identical two's-complement semantics on both "
    "engines.",
)
def f_bitwise(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_orderkey").bitwiseAND(F.lit(255)).cast("bigint").alias("key_band"),
        F.col("l_orderkey").bitwiseXOR(F.col("l_partkey")).cast("bigint").alias("key_xor"),
        F.shiftleft(F.col("l_linenumber"), 2).cast("bigint").alias("line_shl"),
        F.shiftright(F.col("l_orderkey"), 3).cast("bigint").alias("key_shr"),
        F.bit_count(F.col("l_orderkey")).cast("int").alias("key_bits"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "f_url",
    oracle=r"""
WITH u AS (
  SELECT doc_id,
         'https://www.' || source || '.example.com/docs/' ||
         CAST(doc_id AS VARCHAR) || '?lang=' || lang || '&sz=' ||
         CAST(n_chars AS VARCHAR) || '#s' || CAST(doc_id % 5 AS VARCHAR) AS url
  FROM documents WHERE doc_id < 200
)
SELECT doc_id,
       regexp_extract(url, '^([a-z]+)://', 1) AS proto,
       regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
       regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
       regexp_extract(url, '\?([^#]*)', 1) AS query,
       regexp_extract(url, '[?&]lang=([^&#]*)', 1) AS lang_param,
       regexp_extract(url, '#(.*)$', 1) AS fragment,
       regexp_extract(regexp_extract(url, '^[a-z]+://([^/?#]+)', 1),
                      '([^.]+\.[^.]+)$', 1) AS reg_domain
FROM u
ORDER BY doc_id
""",
    doc="F-family, URL functions: Spark's parse_url (PROTOCOL/HOST/PATH/"
    "QUERY/QUERY-param/REF — the java.net.URI-backed extraction every "
    "web-corpus curation pipeline leans on for per-domain dedup, domain "
    "caps (x18) and provenance joins) plus a registrable-domain suffix "
    "grab. URLs are synthesized deterministically from documents "
    "columns (the fixture carries no URL column), covering scheme, "
    "subdomained host, path, two query params, and a fragment. The "
    "DuckDB oracle parses the SAME strings with an INDEPENDENT "
    "implementation (anchored regexes, no parse_url in DuckDB), so "
    "agreement checks the extraction semantics, not a shared parser. "
    "Pure map-side codegen projection, zero shuffle.",
)
def f_url(spark, sf_dir):
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    url = F.concat(
        F.lit("https://www."),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&sz="),
        F.col("n_chars").cast("string"),
        F.lit("#s"),
        (F.col("doc_id") % 5).cast("string"),
    )
    host = F.parse_url(url, F.lit("HOST"))
    return d.select(
        "doc_id",
        F.parse_url(url, F.lit("PROTOCOL")).alias("proto"),
        host.alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
        F.parse_url(url, F.lit("REF")).alias("fragment"),
        F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1).alias("reg_domain"),
    ).orderBy("doc_id")


@register(
    "f_collation",
    oracle="""
WITH v AS (
  SELECT DISTINCT s FROM (
    SELECT unnest([
      n_name,
      lower(n_name),
      concat(upper(substr(lower(n_name), 1, 1)), substr(lower(n_name), 2, 1000)),
      replace(lower(n_name), 'a', 'á')
    ]) AS s FROM nation
  )
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY s) AS BIGINT) AS byte_rnk,
       CAST(ROW_NUMBER() OVER (ORDER BY lower(s), s) AS BIGINT) AS ci_rnk,
       s,
       hex(encode(s)) AS key_hex
FROM v
ORDER BY byte_rnk
""",
    doc="F-collation: the engine's PORTABLE COLLATION CONTRACT, pinned as a "
    "query (SURVEY §5.3 rule, r10). Every string ordering in the engine — "
    "ORDER BY, window ORDER BY, min/max, range fences — compares by raw "
    "UTF-8 BYTE order (Spark's default UTF8_BINARY collation; DuckDB's "
    "default binary collation), never by an ICU/locale collator: locale "
    "tables differ per ICU version and would silently de-synchronize "
    "engines (and cluster nodes) that upgrade independently. The query "
    "materializes the contract on case/accent-DIVERGENT strings where "
    "the two regimes visibly disagree — upper/lower/titlecase/accented "
    "variants of every nation name — and pins BOTH orders cross-engine: "
    "byte_rnk (the contract: 'Z' < 'a' < 'á', uppercase block first, "
    "accented letters after all of ASCII) and ci_rnk (the explicit "
    "case-insensitive rewrite ORDER BY lower(s), s — the engine-portable "
    "way to ASK for case folding), plus the hex sort key itself so a "
    "mismatch shows WHERE the bytes diverged. A property test documents "
    "exactly where byte order and a locale collator would disagree "
    "(en_US interleaves case and folds accents; bytes do neither). "
    "Catalog-sized diagnostic (4 x nations rows, single window) — the "
    "contract it pins governs every corpus-scale ordering op.",
)
def f_collation(spark, sf_dir):
    from pyspark.sql import Window

    n = t(spark, sf_dir, "nation")
    lo = F.lower(F.col("n_name"))
    variants = F.array(
        F.col("n_name"),
        lo,
        F.concat(F.upper(F.substring(lo, 1, 1)), F.substring(lo, 2, 1000)),
        F.replace(lo, F.lit("a"), F.lit("á")),
    )
    v = n.select(F.explode(variants).alias("s")).distinct()
    w_byte = Window.orderBy("s")
    w_ci = Window.orderBy(F.lower("s"), F.col("s"))
    return v.select(
        F.row_number().over(w_byte).cast("bigint").alias("byte_rnk"),
        F.row_number().over(w_ci).cast("bigint").alias("ci_rnk"),
        "s",
        F.hex(F.encode(F.col("s"), "UTF-8")).alias("key_hex"),
    ).orderBy("byte_rnk")


@register(
    "f_variant",
    oracle="""
WITH j AS (
  SELECT event_id,
         props,
         '{"a":' || CAST(user_id AS VARCHAR) || ',"b":{"c":"' || event_type
           || '"},"arr":[1,' || CAST(event_id % 5 AS VARCHAR) || ']}' AS doc
  FROM events
)
SELECT event_id,
       CAST(json_extract(props, '$.k') AS BIGINT) AS k_int,
       json_extract_string(props, '$.k') AS k_str,
       CAST(json_extract(doc, '$.a') AS BIGINT) AS a_int,
       json_extract_string(doc, '$.b.c') AS bc_str,
       CAST(json_extract(doc, '$.arr[1]') AS BIGINT) AS arr_1,
       CAST(json_extract(doc, '$.missing') IS NULL AS INT) AS missing_is_null
FROM j
ORDER BY event_id
""",
    doc="F-variant: Spark 4's VARIANT type — the open-schema semi-"
    "structured column (binary-encoded JSON with typed path access, the "
    "lakehouse answer to string-JSON columns that re-parse on every "
    "touch): parse_json once, then variant_get extracts TYPED values by "
    "JSONPath — top-level scalar, nested object member, array element "
    "by index, and a missing path (NULL via try_variant_get, the "
    "schema-drift-tolerant accessor). The engine contract vs the "
    "f_map_json family: a VARIANT column parses ONCE at ingest and "
    "every later extraction is a binary-offset walk, where "
    "get_json_object re-parses the string per expression — at 100 TB "
    "the difference between one decode and one decode per query "
    "column. All map-side codegen, zero shuffle. DuckDB mirrors with "
    "its own native JSON type (json_extract / json_extract_string) — "
    "two independent semi-structured engines agreeing on typed path "
    "semantics.",
)
def f_variant(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    doc = F.concat(
        F.lit('{"a":'),
        F.col("user_id").cast("string"),
        F.lit(',"b":{"c":"'),
        F.col("event_type"),
        F.lit('"},"arr":[1,'),
        (F.col("event_id") % 5).cast("string"),
        F.lit("]}"),
    )
    j = e.select(
        "event_id",
        F.parse_json("props").alias("vp"),
        F.parse_json(doc).alias("vd"),
    )
    return j.select(
        "event_id",
        F.variant_get("vp", "$.k", "bigint").alias("k_int"),
        F.variant_get("vp", "$.k", "string").alias("k_str"),
        F.variant_get("vd", "$.a", "bigint").alias("a_int"),
        F.variant_get("vd", "$.b.c", "string").alias("bc_str"),
        F.variant_get("vd", "$.arr[1]", "bigint").alias("arr_1"),
        F.try_variant_get("vd", "$.missing", "string")
        .isNull()
        .cast("int")
        .alias("missing_is_null"),
    ).orderBy("event_id")


@register(
    "f_interval",
    oracle="""
SELECT o_orderkey,
       strftime(o_orderdate + INTERVAL '3 days 4 hours 5 minutes 6 seconds',
                '%Y-%m-%d %H:%M:%S') AS plus_dt,
       strftime(o_orderdate + INTERVAL '1 year 2 months', '%Y-%m-%d') AS plus_ym,
       strftime(o_orderdate - INTERVAL '10 days', '%Y-%m-%d %H:%M:%S') AS minus_dt,
       CAST(date_diff('hour', o_orderdate, TIMESTAMP '1998-01-01 00:00:00')
            AS BIGINT) AS hours_to_98,
       strftime(o_orderdate + INTERVAL '6 months', '%Y-%m-%d') AS plus_2q,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01')
            AS BIGINT) AS days_to_98
FROM orders
WHERE o_orderkey <= 2000
ORDER BY o_orderkey
""",
    doc="F-interval: the ANSI INTERVAL arithmetic family — Spark 3.2+ typed "
    "intervals constructed with make_dt_interval (day-time) and "
    "make_ym_interval (year-month) added to and subtracted from "
    "timestamps, plus timestampdiff/timestampadd units and date-level "
    "datediff; DuckDB's single INTERVAL type computes the identical "
    "calendar results. Semantics pinned by the fixture: orders dates are "
    "midnight-aligned so Spark's timestampdiff (whole elapsed units) and "
    "DuckDB's date_diff (boundary crossings) coincide on the hour unit "
    "(divergence only exists for sub-unit offsets — documented, not "
    "exercised); 1189 fixture rows carry day-of-month >= 29, so the "
    "month-addition END-OF-MONTH CLAMP (Jan 31 + 1 month = Feb 28/29) is "
    "genuinely exercised and must agree cross-engine (both clamp). All "
    "outputs rendered as strings/BIGINTs (interval-typed output columns "
    "are banned by the driver-canonicalization conventions test). "
    "Map-side projection, no shuffle but the determinism ORDER BY.",
)
def f_interval(spark, sf_dir):
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    ts98 = F.lit("1998-01-01 00:00:00").cast("timestamp")
    return o.select(
        "o_orderkey",
        F.date_format(
            F.col("o_orderdate") + F.make_dt_interval(F.lit(3), F.lit(4), F.lit(5), F.lit(6.0)),
            "yyyy-MM-dd HH:mm:ss",
        ).alias("plus_dt"),
        F.date_format(
            F.col("o_orderdate") + F.make_ym_interval(F.lit(1), F.lit(2)), "yyyy-MM-dd"
        ).alias("plus_ym"),
        F.date_format(
            F.col("o_orderdate") - F.make_dt_interval(F.lit(10), F.lit(0), F.lit(0), F.lit(0.0)),
            "yyyy-MM-dd HH:mm:ss",
        ).alias("minus_dt"),
        F.expr(
            "timestampdiff(HOUR, o_orderdate, TIMESTAMP '1998-01-01 00:00:00')"
        )
        .cast("bigint")
        .alias("hours_to_98"),
        F.date_format(F.expr("timestampadd(QUARTER, 2, o_orderdate)"), "yyyy-MM-dd").alias(
            "plus_2q"
        ),
        F.datediff(F.lit("1998-01-01").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("bigint")
        .alias("days_to_98"),
    ).orderBy("o_orderkey")
