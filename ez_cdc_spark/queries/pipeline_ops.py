"""Training-data pipeline operators (north-star LLM-pipeline surface).

Beyond the reference's own scope (the reference is a 66-line CDC consumer,
/root/reference/python/cdc_test/main.py) — these are the ops a 100 TB
pretraining-data pipeline runs daily, each declared Spark-first and
oracle-checked against DuckDB:

  x7   stratified sampling      — deterministic portable-hash thresholds,
                                  per-stratum rates; pure map-side filter,
                                  zero shuffle at any scale
  x7b  weighted source mixing   — per-source sample rates for corpus
                                  mixture weights; map-side + tiny agg
  x8   sequence packing         — concat-then-chunk token packing into
                                  fixed context windows via one cumsum
                                  window per stratum (the pretraining
                                  "pack documents into 2048-token rows"
                                  step); one shuffle per stratum key
  x9   PII scrubbing            — regexp redaction (emails/phones) with
                                  per-doc redaction counts; map-side only
  x6d  int8 quantization        — symmetric per-vector embedding
                                  quantization (127/max|x|), the storage
                                  layout step before ANN serving; map-side

Determinism: sampling/mixing use the SAME portable hash as x2c (first 8
md5 hex chars as a 32-bit int) so DuckDB reproduces every kept row;
packing uses integer `div`; quantization uses floor(x*s+0.5) on both
engines (no round-half mode ambiguity).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ez_cdc_spark.queries import register
from ez_cdc_spark.queries._util import t

# Portable 32-bit row hash (same construction as operators/dedup.simhash
# portable mode): Spark conv(substring(md5(s),1,8),16,10) == DuckDB
# CAST('0x'||substr(md5(s),1,8) AS BIGINT).
def _phash(col):
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("long")


def _o_phash(expr: str) -> str:
    return f"CAST('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 8) AS BIGINT)"


@register(
    "x7_stratified_sample",
    oracle=f"""
SELECT doc_id, lang, CAST({_o_phash('doc_id')} % 100 AS BIGINT) AS bucket
FROM documents
WHERE {_o_phash('doc_id')} % 100 < CASE WHEN lang = 'en' THEN 20 ELSE 10 END
ORDER BY doc_id
""",
    doc="X7: deterministic stratified sampling — keep a row iff its portable "
    "32-bit hash mod 100 clears the per-stratum rate (en 20%, rest 10%). "
    "Map-side filter only: no shuffle, no RNG state, reproducible and "
    "cheap at any corpus size; changing rates re-samples consistently "
    "(nested samples: rate 10 ⊂ rate 20).",
)
def x7_stratified_sample(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    bucket = _phash(F.col("doc_id")) % 100
    rate = F.when(F.col("lang") == "en", 20).otherwise(10)
    return (
        d.filter(bucket < rate)
        .select("doc_id", "lang", bucket.cast("bigint").alias("bucket"))
        .orderBy("doc_id")
    )


@register(
    "x7b_weighted_mix",
    oracle=f"""
WITH s AS (
  SELECT 'docs' AS source, doc_id AS id FROM documents
  WHERE {_o_phash('doc_id')} % 100 < 80
  UNION ALL
  SELECT 'events' AS source, event_id AS id FROM events
  WHERE {_o_phash('event_id')} % 100 < 30
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_sampled,
       CAST(MIN(id) AS BIGINT) AS min_id, CAST(MAX(id) AS BIGINT) AS max_id
FROM s GROUP BY source ORDER BY source
""",
    doc="X7b: corpus mixture weights — each source union leg carries its own "
    "portable-hash sample rate (docs 80%, events 30%), the standard "
    "source-weighting step when assembling a training mix. Map-side "
    "filters + one tiny agg; at 100 TB each leg scans independently and "
    "nothing shuffles but the per-source counters.",
)
def x7b_weighted_mix(spark, sf_dir):
    d = t(spark, sf_dir, "documents").filter(_phash(F.col("doc_id")) % 100 < 80)
    e = t(spark, sf_dir, "events").filter(_phash(F.col("event_id")) % 100 < 30)
    mix = d.select(
        F.lit("docs").alias("source"), F.col("doc_id").cast("bigint").alias("id")
    ).unionByName(
        e.select(
            F.lit("events").alias("source"), F.col("event_id").cast("bigint").alias("id")
        )
    )
    return (
        mix.groupBy("source")
        .agg(
            F.count("*").alias("n_sampled"),
            F.min("id").alias("min_id"),
            F.max("id").alias("max_id"),
        )
        .orderBy("source")
    )


@register(
    "x8_sequence_packing",
    oracle=r"""
WITH tok AS (
  SELECT doc_id, lang, CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_tokens
  FROM documents
), cum AS (
  SELECT doc_id, lang, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_end
  FROM tok
)
SELECT doc_id, lang, n_tokens,
       CAST((cum_end - n_tokens) // 2048 AS BIGINT) AS bin_start,
       CAST((cum_end - 1) // 2048 AS BIGINT) AS bin_end,
       CAST((cum_end - n_tokens) % 2048 AS BIGINT) AS bin_offset
FROM cum
ORDER BY doc_id
""",
    doc="X8: sequence packing (concat-then-chunk) — documents are laid "
    "end-to-end per stratum in doc_id order and cut into 2048-token "
    "context windows; each doc reports its start/end window and offset. "
    "One running-sum window per stratum: a single shuffle on the stratum "
    "key, no driver state, and per-stratum streams pack independently at "
    "any scale. Docs longer than a window straddle (bin_end > bin_start) "
    "— the standard pretraining packing, no padding waste.",
)
def x8_sequence_packing(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.col("text"), r"\s+")).cast("bigint")
    w = Window.partitionBy("lang").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tok = d.select("doc_id", "lang", n_tokens.alias("n_tokens"))
    cum = tok.withColumn("cum_end", F.sum("n_tokens").over(w))
    return cum.select(
        "doc_id",
        "lang",
        "n_tokens",
        # `div` (Spark) and `//` (DuckDB) are both floor integer division
        # on the non-negative operands here
        F.expr("CAST((cum_end - n_tokens) div 2048 AS BIGINT)").alias("bin_start"),
        F.expr("CAST((cum_end - 1) div 2048 AS BIGINT)").alias("bin_end"),
        F.expr("CAST((cum_end - n_tokens) % 2048 AS BIGINT)").alias("bin_offset"),
    ).orderBy("doc_id")


_EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
_PHONE_RE = r"[0-9]{3}-[0-9]{3}-[0-9]{4}"


@register(
    "x9_pii_scrub",
    oracle=f"""
WITH pii AS (
  SELECT doc_id,
         substr(text, 1, 40) || ' reach user' || CAST(doc_id AS VARCHAR)
           || '@mail.com or 555-123-4567' AS raw
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(raw, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(raw, '{_PHONE_RE}')) AS BIGINT) AS n_phones,
       md5(regexp_replace(regexp_replace(raw, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{_PHONE_RE}', '<PHONE>', 'g')) AS clean_md5
FROM pii
ORDER BY doc_id
""",
    doc="X9: PII scrubbing — regexp redaction of emails and phone numbers "
    "with per-doc redaction counts and an md5 of the scrubbed text "
    "(portable proof the redacted bytes are identical). The fixture "
    "plants one of each per doc (deterministically derived) since the "
    "corpus itself is clean. Pure map-side regexp — whole-stage codegen, "
    "no shuffle; patterns chosen to mean the same in Java regex and RE2.",
)
def x9_pii_scrub(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    raw = F.concat(
        F.substring(F.col("text"), 1, 40),
        F.lit(" reach user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.com or 555-123-4567"),
    )
    clean = F.regexp_replace(
        F.regexp_replace(raw, _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(raw, F.lit(_EMAIL_RE), F.lit(0)))
        .cast("bigint")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(raw, F.lit(_PHONE_RE), F.lit(0)))
        .cast("bigint")
        .alias("n_phones"),
        F.md5(clean).alias("clean_md5"),
    ).orderBy("doc_id")


@register(
    "x6d_quantize_int8",
    oracle="""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), m AS (
  SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS mx FROM v
)
SELECT vec_id,
       ROUND(CASE WHEN mx > 0 THEN 127.0 / mx ELSE 0 END, 6) AS scale,
       array_to_string(
         CASE WHEN mx > 0
              THEN list_transform(v, x -> CAST(floor(x * (127.0 / mx) + 0.5) AS INT))
              ELSE list_transform(v, x -> 0) END, ',') AS q
FROM m
ORDER BY vec_id
""",
    doc="X6d: symmetric int8 embedding quantization — per-vector scale "
    "127/max|x|, values floor(x*s+0.5) (explicit half-up on both engines; "
    "no round() dialect ambiguity). 4x storage cut ahead of ANN serving. "
    "Map-side transform over the vector column, no shuffle. The quantized "
    "vector is rendered as a ','-joined string: raw array cells crash the "
    "driver canonicalizer's pandas sort (f_array2 r2 post-mortem).",
)
def x6d_quantize_int8(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    sel = e.select("vec_id", v.alias("v")).select(
        "vec_id",
        "v",
        F.array_max(F.transform(F.col("v"), F.abs)).alias("mx"),
    )
    s = F.lit(127.0) / F.col("mx")
    q = F.transform(F.col("v"), lambda x: F.floor(x * s + 0.5).cast("int"))
    zeros = F.transform(F.col("v"), lambda x: F.lit(0))
    q_str = F.array_join(
        F.transform(
            F.when(F.col("mx") > 0, q).otherwise(zeros), lambda x: x.cast("string")
        ),
        ",",
    )
    return sel.select(
        "vec_id",
        F.round(F.when(F.col("mx") > 0, s).otherwise(0.0), 6).alias("scale"),
        q_str.alias("q"),
    ).orderBy("vec_id")


@register(
    "x10_corpus_pipeline",
    oracle=rf"""
WITH q AS (
  SELECT doc_id, lang, text,
         ROUND(0.4 * least(length(text) / 400.0, 1.0)
               + 0.3 * (len(list_distinct(regexp_split_to_array(text, '\s+')))
                   / CAST(len(regexp_split_to_array(text, '\s+')) AS DOUBLE))
               + 0.3 * (1 - len(list_filter(
                     list_transform(regexp_split_to_array(text, '\s+'), x -> lower(x)),
                     x -> list_contains(['the','a','of','and','to','in','is','it'], x)))
                   / CAST(len(regexp_split_to_array(text, '\s+')) AS DOUBLE)), 6) AS quality
  FROM documents
), good AS (
  SELECT doc_id, lang, text FROM q WHERE quality >= 0.5
), dedup AS (
  SELECT doc_id, lang, text FROM good
  QUALIFY doc_id = MIN(doc_id) OVER (PARTITION BY md5(text))
), sampled AS (
  SELECT doc_id, lang,
         CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_tokens
  FROM dedup
  WHERE {_o_phash('doc_id')} % 100 < 50
), cum AS (
  SELECT doc_id, lang, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_end
  FROM sampled
)
SELECT doc_id, lang, n_tokens,
       CAST((cum_end - n_tokens) // 2048 AS BIGINT) AS bin_start
FROM cum
ORDER BY doc_id
""",
    doc="X10: the curation chain end-to-end as ONE declarative plan — "
    "quality filter (x4c score >= 0.5) -> exact dedup keeping min doc_id "
    "per md5(text) (x1's deterministic form) -> 50% portable-hash sample "
    "(x7) -> sequence packing (x8). Catalyst fuses the three map-side "
    "stages into the scan's codegen stage; the only shuffles are the "
    "dedup window and the packing window — what a 100 TB curation run "
    "would pay anyway. Mirrored CTE-for-CTE in the oracle.",
)
def x10_corpus_pipeline(spark, sf_dir):
    from ez_cdc_spark.functions.text import quality_score

    d = t(spark, sf_dir, "documents")
    good = d.filter(quality_score(F.col("text")) >= 0.5)
    w_dup = Window.partitionBy(F.md5(F.col("text")))
    dedup = (
        good.withColumn("__keep", F.min("doc_id").over(w_dup))
        .filter(F.col("doc_id") == F.col("__keep"))
        .drop("__keep")
    )
    sampled = dedup.filter(_phash(F.col("doc_id")) % 100 < 50).select(
        "doc_id",
        "lang",
        F.size(F.split(F.col("text"), r"\s+")).cast("bigint").alias("n_tokens"),
    )
    w_pack = Window.partitionBy("lang").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = sampled.withColumn("cum_end", F.sum("n_tokens").over(w_pack))
    return cum.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.expr("CAST((cum_end - n_tokens) div 2048 AS BIGINT)").alias("bin_start"),
    ).orderBy("doc_id")
