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
  x12  contamination check      — train docs sharing any 5-gram with a
                                  held-out benchmark slice; benchmark gram
                                  set broadcast, map-side probe
  x13  repetition metrics       — Gopher-style top-word / top-bigram
                                  fractions via explode-agg (map-side
                                  partial aggregation)
  x14  token histogram          — 16-token-bucket corpus length profile;
                                  partial agg => O(partitions) shuffle

Determinism: sampling/mixing use the SAME portable hash as x2c (first 8
md5 hex chars as a 32-bit int) so DuckDB reproduces every kept row;
packing uses integer `div`; quantization uses floor(x*s+0.5) on both
engines (no round-half mode ambiguity); x13's flag compares UNROUNDED
IEEE ratios identical in both engines.
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
    "x7c_temperature_upsample",
    oracle="""
WITH c AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY lang),
     f AS (SELECT lang, least(4, (SELECT MAX(n) FROM c) // n) AS factor FROM c)
SELECT d.doc_id, d.lang,
       CAST(unnest(generate_series(1, f.factor)) AS BIGINT) AS copy_idx
FROM documents d JOIN f USING (lang)
ORDER BY doc_id, copy_idx
""",
    doc="X7c: low-resource upsampling (temperature-style source balancing) — "
    "each stratum repeats by floor(max_count / count), capped at 4x, the "
    "standard counter to head-language dominance when assembling a "
    "pretraining mix (en stays 1x, rare langs repeat). The factor table "
    "is a per-stratum aggregate (bytes, broadcast back); the upsample "
    "itself is a map-side explode of sequence(1, factor) — no shuffle of "
    "corpus data at any scale, and integer-only math so DuckDB reproduces "
    "every copy. Pairs with x7's downsampling: together they implement "
    "arbitrary mixture reweighting.",
)
def x7c_temperature_upsample(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    c = d.groupBy("lang").agg(F.count("*").alias("n"))
    cmax = c.agg(F.max("n").alias("m"))
    f = c.crossJoin(F.broadcast(cmax)).select(
        "lang", F.least(F.lit(4).cast("bigint"), F.expr("m div n")).alias("factor")
    )
    return (
        d.join(F.broadcast(f), "lang")
        .select(
            "doc_id",
            "lang",
            # sequence(1L, factor) elements are already BIGINT; explode
            # cannot be nested inside a cast expression
            F.explode(F.sequence(F.lit(1).cast("bigint"), F.col("factor"))).alias(
                "copy_idx"
            ),
        )
        .orderBy("doc_id", "copy_idx")
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
    "x12_contamination",
    oracle=r"""
WITH g AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(ws) >= 5 THEN list_transform(
                generate_series(1, len(ws) - 4),
                i -> array_to_string(ws[i:i+4], ' '))
              ELSE CAST([] AS VARCHAR[]) END) AS grams
  FROM (SELECT doc_id, regexp_split_to_array(text, '\s+') AS ws FROM documents)
), bg AS (
  SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 97 = 0
), hits AS (
  SELECT tr.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
  FROM (SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % 97 <> 0) tr
  JOIN bg USING (gram)
  GROUP BY tr.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(h.n_shared, 0) AS BIGINT) AS n_shared,
       CAST(CASE WHEN COALESCE(h.n_shared, 0) > 0 THEN 1 ELSE 0 END AS INT)
         AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
WHERE d.doc_id % 97 <> 0
ORDER BY d.doc_id
""",
    doc="X12: benchmark-contamination check — flag training docs sharing any "
    "5-gram with a held-out benchmark set (doc_id % 97 == 0, a scale-"
    "independent ~1% slice standing in for an eval suite). The decisive "
    "scale property: the benchmark gram set is tiny and BROADCAST, so the "
    "corpus side is one map-side semi-join probe per gram — no shuffle of "
    "corpus data at 100 TB; per-doc distinct grams bound the probe count. "
    "n_shared counts distinct shared 5-grams (grams deduped per doc "
    "before the join).",
)
def x12_contamination(spark, sf_dir):
    from ez_cdc_spark.sources.tables import widen_partitions

    d = t(spark, sf_dir, "documents")
    # gram generation parallelized off the single-file fixture scan, as in
    # x19 (pass-through on a wide source); the final doc_id left join reads
    # the narrow scan directly
    wide = widen_partitions(d.select("doc_id", "text"))
    ws = F.split(F.col("text"), r"\s+")
    grams = F.array_distinct(
        F.when(
            F.size(ws) >= 5,
            F.transform(
                F.sequence(F.lit(1), F.size(ws) - 4),
                lambda i: F.concat_ws(" ", F.slice(ws, i, 5)),
            ),
        ).otherwise(F.array().cast("array<string>"))
    )
    doc_grams = wide.select("doc_id", F.explode(grams).alias("gram"))
    bench = doc_grams.filter(F.col("doc_id") % 97 == 0).select("gram").distinct()
    hits = (
        doc_grams.filter(F.col("doc_id") % 97 != 0)
        .join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.count("*").cast("bigint").alias("n_shared"))
    )
    return (
        d.filter(F.col("doc_id") % 97 != 0)
        .select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shared", F.lit(0)).cast("bigint").alias("n_shared"),
            (F.coalesce("n_shared", F.lit(0)) > 0).cast("int").alias("contaminated"),
        )
        .orderBy("doc_id")
    )


@register(
    "x13_repetition_metrics",
    oracle=r"""
WITH w AS (
  SELECT doc_id, regexp_split_to_array(text, '\s+') AS ws FROM documents
), wcnt AS (
  SELECT doc_id, w, COUNT(*) AS c
  FROM (SELECT doc_id, unnest(ws) AS w FROM w) GROUP BY doc_id, w
), wagg AS (
  SELECT doc_id, MAX(c) AS top_w, SUM(c) AS n_tok FROM wcnt GROUP BY doc_id
), bcnt AS (
  SELECT doc_id, b, COUNT(*) AS c
  FROM (SELECT doc_id, unnest(CASE WHEN len(ws) >= 2 THEN list_transform(
               generate_series(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i+1])
             ELSE CAST([] AS VARCHAR[]) END) AS b
        FROM w) GROUP BY doc_id, b
), bagg AS (
  SELECT doc_id, MAX(c) AS top_b, SUM(c) AS n_big FROM bcnt GROUP BY doc_id
)
SELECT w.doc_id,
       CAST(w.n_tok AS BIGINT) AS n_tokens,
       ROUND(CAST(w.top_w AS DOUBLE) / w.n_tok, 6) AS top_word_frac,
       ROUND(COALESCE(CAST(b.top_b AS DOUBLE) / b.n_big, 0), 6) AS top_bigram_frac,
       CAST(CASE WHEN CAST(w.top_w AS DOUBLE) / w.n_tok > 0.2
                   OR COALESCE(CAST(b.top_b AS DOUBLE) / b.n_big, 0) > 0.18
            THEN 1 ELSE 0 END AS INT) AS flagged
FROM wagg w LEFT JOIN bagg b USING (doc_id)
ORDER BY w.doc_id
""",
    doc="X13: repetition-based quality signals (Gopher-rule style) — per doc, "
    "the fraction of tokens accounted for by the most frequent word and by "
    "the most frequent bigram; docs above threshold (word > 0.2, bigram > "
    "0.18) are flagged as repetitive. Two explode -> count -> max/sum "
    "chains partitioned by (doc_id, token): map-side partial aggregation "
    "does most of the work, shuffle volume is one row per distinct "
    "(doc, token) — linear scale-out, no per-doc state on the driver. The "
    "flag is computed from the UNROUNDED ratios in both engines (identical "
    "IEEE division of the same ints); rounded ratios are emitted for the "
    "hash.",
)
def x13_repetition_metrics(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    ws = F.split(F.col("text"), r"\s+")
    base = d.select("doc_id", ws.alias("ws"))
    wcnt = (
        base.select("doc_id", F.explode("ws").alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("c"))
    )
    wagg = wcnt.groupBy("doc_id").agg(
        F.max("c").alias("top_w"), F.sum("c").alias("n_tok")
    )
    bigrams = F.when(
        F.size(F.col("ws")) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(F.col("ws")) - 1),
            lambda i: F.concat_ws(" ", F.slice(F.col("ws"), i, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bcnt = (
        base.select("doc_id", F.explode(bigrams).alias("b"))
        .groupBy("doc_id", "b")
        .agg(F.count("*").alias("c"))
    )
    bagg = bcnt.groupBy("doc_id").agg(
        F.max("c").alias("top_b"), F.sum("c").alias("n_big")
    )
    wf = F.col("top_w").cast("double") / F.col("n_tok")
    bf = F.coalesce(F.col("top_b").cast("double") / F.col("n_big"), F.lit(0.0))
    return (
        wagg.join(bagg, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tok").cast("bigint").alias("n_tokens"),
            F.round(wf, 6).alias("top_word_frac"),
            F.round(bf, 6).alias("top_bigram_frac"),
            ((wf > 0.2) | (bf > 0.18)).cast("int").alias("flagged"),
        )
        .orderBy("doc_id")
    )


@register(
    "x14_token_histogram",
    oracle=r"""
WITH n AS (
  SELECT doc_id, CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_tokens
  FROM documents
)
SELECT CAST(least(n_tokens // 16, 15) AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
       CAST(MIN(n_tokens) AS BIGINT) AS min_tokens,
       CAST(MAX(n_tokens) AS BIGINT) AS max_tokens
FROM n GROUP BY 1 ORDER BY bucket
""",
    doc="X14: token-count histogram — corpus length profile in 16-token "
    "buckets (capped at bucket 15), the standard pre-packing diagnostic "
    "(drives max_seq_len / packing-efficiency decisions). Map-side bucket "
    "assignment + one 16-group aggregate: partial aggregation reduces "
    "each partition to <=16 rows before the exchange, so the shuffle is "
    "O(partitions), not O(rows), at any corpus size.",
)
def x14_token_histogram(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.col("text"), r"\s+")).cast("bigint")
    return (
        d.select(n_tokens.alias("n_tokens"))
        .select(
            F.least(F.expr("n_tokens div 16"), F.lit(15)).cast("bigint").alias("bucket"),
            "n_tokens",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
            F.min("n_tokens").cast("bigint").alias("min_tokens"),
            F.max("n_tokens").cast("bigint").alias("max_tokens"),
        )
        .orderBy("bucket")
    )


@register(
    "x15_shard_shuffle",
    oracle=f"""
WITH k AS (
  SELECT doc_id,
         {_o_phash("'shard:' || CAST(doc_id AS VARCHAR)")} % 8 AS shard,
         {_o_phash("'shuf:' || CAST(doc_id AS VARCHAR)")} AS okey
  FROM documents
)
SELECT doc_id, CAST(shard AS BIGINT) AS shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY okey, doc_id) AS BIGINT) AS pos
FROM k ORDER BY doc_id
""",
    doc="X15: deterministic global shuffle into training shards — every "
    "pretraining run's last step before writing shard files: assign each "
    "doc a shard (portable hash of doc_id, mod n_shards) and a "
    "pseudo-random position within the shard (row_number ordered by an "
    "independent second hash). Both hashes are map-side; the only "
    "exchange is the hash-partition by shard, and the per-shard sort is "
    "bounded by shard size — at 100 TB you pick n_shards >= cluster "
    "parallelism so each sort fits an executor, then write each shard "
    "with a single partitioned-parquet pass (S7). Reproducible end to "
    "end: same corpus + salt => identical shard files, which is what "
    "makes training runs resumable and ablations comparable.",
)
def x15_shard_shuffle(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id",
        (
            _phash(F.concat(F.lit("shard:"), F.col("doc_id").cast("string"))) % 8
        ).alias("shard"),
        _phash(F.concat(F.lit("shuf:"), F.col("doc_id").cast("string"))).alias("okey"),
    )
    w = Window.partitionBy("shard").orderBy("okey", "doc_id")
    return (
        keyed.select(
            "doc_id",
            F.col("shard").cast("bigint").alias("shard"),
            F.row_number().over(w).cast("bigint").alias("pos"),
        )
        .orderBy("doc_id")
    )


@register(
    "x16_snapshot_diff",
    oracle="""
WITH old AS (
  SELECT doc_id, md5(text) AS before_hash
  FROM documents WHERE doc_id % 11 <> 0
), new AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END) AS after_hash
  FROM documents WHERE doc_id % 7 <> 0
)
SELECT doc_id,
       CASE WHEN before_hash IS NULL THEN 'c'
            WHEN after_hash  IS NULL THEN 'd'
            ELSE 'u' END AS op,
       before_hash, after_hash
FROM old FULL JOIN new USING (doc_id)
WHERE before_hash IS NULL OR after_hash IS NULL OR before_hash <> after_hash
ORDER BY doc_id
""",
    doc="X16: batch snapshot diff — the reference's CDC semantics "
    "(Debezium op codes c/u/d with before/after images, "
    "/root/reference/python/cdc_test/main.py:45-56, README.md:331) "
    "re-expressed as a batch operator over two corpus snapshots: full "
    "outer join on the key, op from presence/content-hash comparison, "
    "unchanged rows dropped. This is how you CDC a corpus that has no "
    "WAL — diff yesterday's snapshot against today's and feed the "
    "change set to the t9 upsert sink. 100 TB design: each side is "
    "projected map-side to (doc_id, md5) BEFORE the join, so the "
    "exchange moves 40-byte rows, never document text; the join itself "
    "is a co-partitioned hash join on the key. The two snapshots here "
    "are derived deterministically from the documents table (doc_id "
    "mod filters; '%5==0' docs edited) so the oracle reproduces them "
    "exactly.",
)
def x16_snapshot_diff(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    old = d.filter(F.col("doc_id") % 11 != 0).select(
        "doc_id", F.md5("text").alias("before_hash")
    )
    new = (
        d.filter(F.col("doc_id") % 7 != 0)
        .select(
            "doc_id",
            F.md5(
                F.when(
                    F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" v2"))
                ).otherwise(F.col("text"))
            ).alias("after_hash"),
        )
    )
    joined = old.join(new, on="doc_id", how="full")
    return (
        joined.select(
            "doc_id",
            F.when(F.col("before_hash").isNull(), F.lit("c"))
            .when(F.col("after_hash").isNull(), F.lit("d"))
            .otherwise(F.lit("u"))
            .alias("op"),
            "before_hash",
            "after_hash",
        )
        .filter(
            F.col("before_hash").isNull()
            | F.col("after_hash").isNull()
            | (F.col("before_hash") != F.col("after_hash"))
        )
        .orderBy("doc_id")
    )


@register(
    "x17_token_rarity",
    oracle=r"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS token
  FROM documents
), freq AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok GROUP BY token
), per_doc AS (
  SELECT t.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(f.cnt) AS BIGINT) AS freq_sum
  FROM tok t JOIN freq f USING (token)
  GROUP BY t.doc_id
)
SELECT doc_id, n_tokens, freq_sum,
       freq_sum / CAST(n_tokens AS DOUBLE) AS commonness,
       CAST(freq_sum / CAST(n_tokens AS DOUBLE) < 50 AS INT) AS rare_flag
FROM per_doc ORDER BY doc_id
""",
    doc="X17: token-rarity quality score — mean corpus frequency of a "
    "document's tokens (CCNet-style commonness; low = rare/noisy "
    "vocabulary, a standard pretraining quality signal next to x4c and "
    "x13). Exactness: counts stay BIGINT through the sum (integer sums "
    "are order-free, unlike float sums), with ONE IEEE division at the "
    "end — bit-identical on both engines, no rounding needed. 100 TB "
    "design: the vocab table is a partial-aggregated groupBy whose "
    "output is vocabulary-sized (bounded, zipfian), broadcast back "
    "against the exploded corpus so the big side never shuffles on "
    "token; the per-doc re-aggregate partial-aggregates before its "
    "exchange.",
)
def x17_token_rarity(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.col("text"), r"\s+")).alias("token")
    )
    freq = tok.groupBy("token").agg(F.count("*").cast("bigint").alias("cnt"))
    per_doc = (
        tok.join(F.broadcast(freq), "token")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum("cnt").cast("bigint").alias("freq_sum"),
        )
    )
    commonness = F.col("freq_sum") / F.col("n_tokens").cast("double")
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "freq_sum",
        commonness.alias("commonness"),
        (commonness < 50).cast("int").alias("rare_flag"),
    ).orderBy("doc_id")


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


@register(
    "x18_source_cap",
    oracle="""
SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars, CAST(rk AS BIGINT) AS rk
FROM (
  SELECT doc_id, source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS rk
  FROM documents
)
WHERE rk <= 15
ORDER BY doc_id
""",
    doc="X18: per-source document cap (domain balancing) — keep at most 15 "
    "docs per source, best-first (n_chars DESC, doc_id tiebreak), the "
    "standard guard against one domain flooding a training mix. "
    "Implemented as a skew-resistant TWO-PHASE top-k: phase 1 ranks "
    "within (source, salt-of-16) partitions and discards everything past "
    "k locally, so the final per-source window only sees <= 16*k rows per "
    "source no matter how hot the source is — a mega-domain with 10^9 "
    "docs costs two narrow shuffles, never one executor sorting 10^9 "
    "rows. Oracle is the single-window definition the two-phase plan is "
    "algebraically equivalent to.",
)
def x18_source_cap(spark, sf_dir):
    k = 15
    d = t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    salt = F.pmod(F.xxhash64("doc_id"), F.lit(16))
    w_local = Window.partitionBy("source", "salt").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    survivors = (
        d.withColumn("salt", salt)
        .withColumn("lrk", F.row_number().over(w_local))
        .filter(F.col("lrk") <= k)  # phase 1: <= 16k rows/source survive
        .drop("lrk", "salt")
    )
    w_final = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        survivors.withColumn("rk", F.row_number().over(w_final).cast("bigint"))
        .filter(F.col("rk") <= k)
        .select("doc_id", "source", F.col("n_chars").cast("bigint").alias("n_chars"), "rk")
        .orderBy("doc_id")
    )


@register(
    "x19_boilerplate_ngrams",
    oracle=r"""
WITH g AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(ws) >= 5 THEN list_transform(
                generate_series(1, len(ws) - 4),
                i -> array_to_string(ws[i:i+4], ' '))
              ELSE CAST([] AS VARCHAR[]) END) AS grams
  FROM (SELECT doc_id, regexp_split_to_array(text, '\s+') AS ws FROM documents)
), dg AS (
  SELECT doc_id, unnest(grams) AS gram FROM g
), boiler AS (
  SELECT gram FROM dg GROUP BY gram HAVING COUNT(*) >= 3
), hits AS (
  SELECT dg.doc_id, CAST(COUNT(*) AS BIGINT) AS n_boiler
  FROM dg JOIN boiler USING (gram) GROUP BY dg.doc_id
)
SELECT g.doc_id,
       CAST(len(g.grams) AS BIGINT) AS n_grams,
       CAST(COALESCE(h.n_boiler, 0) AS BIGINT) AS n_boiler,
       ROUND(CASE WHEN len(g.grams) = 0 THEN 0
                  ELSE CAST(COALESCE(h.n_boiler, 0) AS DOUBLE) / len(g.grams)
             END, 6) AS boiler_ratio
FROM g LEFT JOIN hits h USING (doc_id)
ORDER BY g.doc_id
""",
    doc="X19: cross-document boilerplate detection (CCNet-style) — a 5-gram "
    "appearing in >= 3 distinct documents is boilerplate (headers, "
    "licenses, navigation chrome); each doc reports what fraction of its "
    "distinct 5-grams are boilerplate. Per-doc grams are DISTINCT before "
    "the explode, so the gram->doc-count aggregate counts documents with "
    "plain COUNT(*) — partial aggregation compresses each map task to its "
    "distinct grams before the one gram-keyed exchange. The boiler set "
    "joins back by gram (shuffle join: the boilerplate table is "
    "corpus-dependent and must not be assumed driver-small); per-doc "
    "re-aggregation partial-aggregates again. Zipfian gram keys skew the "
    "exchange at extreme scale - AQE skew splitting or a gram-salt handles "
    "the head.",
)
def x19_boilerplate_ngrams(spark, sf_dir):
    from ez_cdc_spark.sources.tables import widen_partitions

    # The interpreted 5-gram HOF is the dominant cost and the fixture is a
    # single parquet file (one scan task): widen first so gram generation
    # parallelizes — at 100 TB (thousands of files) this is a no-op.
    d = widen_partitions(t(spark, sf_dir, "documents").select("doc_id", "text"))
    ws = F.split(F.col("text"), r"\s+")
    grams = F.array_distinct(
        F.when(
            F.size(ws) >= 5,
            F.transform(
                F.sequence(F.lit(1), F.size(ws) - 4),
                lambda i: F.concat_ws(" ", F.slice(ws, i, 5)),
            ),
        ).otherwise(F.array().cast("array<string>"))
    )
    # Pin the exploded (doc_id, gram) projection ONCE: it feeds three
    # consumers (doc-frequency agg, the hits join, per-doc gram counts), and
    # without materialization Spark re-runs the interpreted gram HOF per
    # consumer (~3x the dominant cost — the r5 verdict's heaviest bench
    # entry). localCheckpoint also truncates lineage so each consumer's plan
    # starts at the slim two-column rows, never the text scan. On a real
    # cluster swap for persist(DISK_ONLY)/reliable checkpoint if executor
    # loss during the job must be survivable.
    dg = (
        d.select("doc_id", F.explode(grams).alias("gram"))
        .localCheckpoint(eager=True)
    )
    counts = dg.groupBy("doc_id").agg(F.count("*").cast("bigint").alias("n_grams"))
    boiler = dg.groupBy("gram").agg(F.count("*").alias("df")).filter(F.col("df") >= 3)
    hits = (
        dg.join(boiler.select("gram"), "gram")
        .groupBy("doc_id")
        .agg(F.count("*").cast("bigint").alias("n_boiler"))
    )
    # Docs whose text yields zero grams (< 5 words) have no dg rows, so the
    # doc axis comes from a column-pruned doc_id-only scan, not the HOF.
    n_grams = F.coalesce("n_grams", F.lit(0)).cast("bigint")
    nb = F.coalesce("n_boiler", F.lit(0)).cast("bigint")
    return (
        d.select("doc_id")
        .join(counts, "doc_id", "left")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            n_grams.alias("n_grams"),
            nb.alias("n_boiler"),
            F.round(
                F.when(n_grams == 0, F.lit(0.0)).otherwise(
                    nb.cast("double") / n_grams
                ),
                6,
            ).alias("boiler_ratio"),
        )
        .orderBy("doc_id")
    )


@register(
    "x20_token_budget_mix",
    oracle=rf"""
WITH n AS (
  SELECT doc_id, source,
         CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_tokens,
         {_o_phash("'budget:' || CAST(doc_id AS VARCHAR)")} AS okey
  FROM documents
), cum AS (
  SELECT doc_id, source, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY source ORDER BY okey, doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_end
  FROM n
)
SELECT doc_id, source, n_tokens, CAST(cum_end AS BIGINT) AS cum_end
FROM cum WHERE cum_end <= 800
ORDER BY doc_id
""",
    doc="X20: token-budget corpus fill — take documents per source in a "
    "deterministic pseudo-random order (portable hash of doc_id) until "
    "each source's token budget (800) is spent: the 'fill N billion "
    "tokens from each source' step that turns mixture WEIGHTS (x7b) into "
    "mixture QUOTAS. One running-sum window per source is the only "
    "shuffle; integer token counts make the cumsum order-exact on both "
    "engines. At 100 TB the hash order means the kept set is stable "
    "under corpus growth (adding docs only appends candidates past the "
    "budget frontier), and per-source windows parallelize across "
    "sources; a single mega-source pre-filters with x7-style hash "
    "thresholding to an overshoot sample before paying the window sort.",
)
def x20_token_budget_mix(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.col("text"), r"\s+")).cast("bigint")
    okey = _phash(F.concat(F.lit("budget:"), F.col("doc_id").cast("string")))
    base = d.select(
        "doc_id", "source", n_tokens.alias("n_tokens"), okey.alias("okey")
    )
    w = Window.partitionBy("source").orderBy("okey", "doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        base.withColumn("cum_end", F.sum("n_tokens").over(w).cast("bigint"))
        .filter(F.col("cum_end") <= 800)
        .select("doc_id", "source", "n_tokens", "cum_end")
        .orderBy("doc_id")
    )


@register(
    "x21_source_overlap",
    oracle=r"""
WITH dg AS (
  SELECT DISTINCT source, gram
  FROM (
    SELECT source,
           unnest(CASE WHEN len(ws) >= 5 THEN list_transform(
                  generate_series(1, len(ws) - 4),
                  i -> array_to_string(ws[i:i+4], ' '))
                ELSE CAST([] AS VARCHAR[]) END) AS gram
    FROM (SELECT source, regexp_split_to_array(text, '\s+') AS ws FROM documents)
  )
), totals AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_grams FROM dg GROUP BY source
), shared AS (
  SELECT a.source AS src_a, b.source AS src_b, CAST(COUNT(*) AS BIGINT) AS shared_grams
  FROM dg a JOIN dg b ON a.gram = b.gram AND a.source < b.source
  GROUP BY 1, 2
)
SELECT s.src_a, s.src_b, s.shared_grams,
       ROUND(CAST(s.shared_grams AS DOUBLE) / least(ta.n_grams, tb.n_grams), 6)
         AS overlap_coef
FROM shared s
JOIN totals ta ON ta.source = s.src_a
JOIN totals tb ON tb.source = s.src_b
ORDER BY s.src_a, s.src_b
""",
    doc="X21: source-to-source duplication matrix — for every source pair, "
    "the count of shared distinct 5-grams and the overlap coefficient "
    "(shared / smaller source's gram count): the corpus-curation "
    "diagnostic that finds mirror sites and syndicated content BETWEEN "
    "sources before mixing weights are chosen. Distinct (source, gram) "
    "rows self-join on gram — partial-agg'd to distinct pairs map-side "
    "first, one gram-keyed exchange; output is #source-pairs rows "
    "(catalog-bounded), and the per-source totals are a "
    "dimension-table-sized broadcast. Zipfian head grams fan out "
    "quadratically per bucket at extreme scale - cap per-gram source "
    "lists or drop stop-grams first, same head-control as any "
    "inverted-index build.",
)
def x21_source_overlap(spark, sf_dir):
    from ez_cdc_spark.sources.tables import widen_partitions

    # same single-file-fixture widening as x19 (no-op on a wide source)
    d = widen_partitions(t(spark, sf_dir, "documents").select("source", "text"))
    ws = F.split(F.col("text"), r"\s+")
    grams = F.when(
        F.size(ws) >= 5,
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - 4),
            lambda i: F.concat_ws(" ", F.slice(ws, i, 5)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    dg = (
        d.select("source", F.explode(grams).alias("gram"))
        .dropDuplicates(["source", "gram"])
    )
    totals = dg.groupBy("source").agg(F.count("*").cast("bigint").alias("n_grams"))
    a, b = dg.alias("a"), dg.alias("b")
    shared = (
        a.join(b, (F.col("a.gram") == F.col("b.gram")) & (F.col("a.source") < F.col("b.source")))
        .groupBy(F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b"))
        .agg(F.count("*").cast("bigint").alias("shared_grams"))
    )
    ta = F.broadcast(totals.select(F.col("source").alias("src_a"), F.col("n_grams").alias("na")))
    tb = F.broadcast(totals.select(F.col("source").alias("src_b"), F.col("n_grams").alias("nb")))
    return (
        shared.join(ta, "src_a")
        .join(tb, "src_b")
        .select(
            "src_a",
            "src_b",
            "shared_grams",
            F.round(
                F.col("shared_grams").cast("double") / F.least("na", "nb"), 6
            ).alias("overlap_coef"),
        )
        .orderBy("src_a", "src_b")
    )


@register(
    "x22_quality_thresholds",
    oracle=r"""
WITH q AS (
  SELECT ROUND(0.4 * least(length(text) / 400.0, 1.0)
             + 0.3 * (len(list_distinct(regexp_split_to_array(text, '\s+')))
                 / CAST(len(regexp_split_to_array(text, '\s+')) AS DOUBLE))
             + 0.3 * (1 - len(list_filter(
                   list_transform(regexp_split_to_array(text, '\s+'), x -> lower(x)),
                   x -> list_contains(['the','a','of','and','to','in','is','it'], x)))
                 / CAST(len(regexp_split_to_array(text, '\s+')) AS DOUBLE)), 6) AS quality
  FROM documents
), h AS (
  SELECT quality, COUNT(*) AS c FROM q GROUP BY quality
), cum AS (
  SELECT quality,
         SUM(c) OVER (ORDER BY quality DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_ge,
         (SELECT COUNT(*) FROM q) AS n
  FROM h
), fr(keep_frac) AS (
  VALUES (CAST(0.1 AS DECIMAL(3,1))), (0.2), (0.3), (0.4), (0.5),
         (0.6), (0.7), (0.8), (0.9)
)
SELECT CAST(fr.keep_frac AS DOUBLE) AS keep_frac,
       CAST(MAX(cum.quality) AS DOUBLE) AS threshold,
       CAST(MIN(cum.n_ge) AS BIGINT) AS n_kept
FROM cum JOIN fr ON cum.n_ge >= CEILING(fr.keep_frac * cum.n)
GROUP BY fr.keep_frac
ORDER BY keep_frac
""",
    doc="X22: quality-threshold calibration — for each target keep-fraction "
    "(10%..90%), the highest quality cutoff that keeps at least that "
    "fraction of the corpus, plus the exact kept count: the table that "
    "turns 'keep the best 30%' into a map-side filter constant. "
    "Deliberately NOT a global NTILE (which would range-sort the corpus): "
    "the corpus reduces to a DISTINCT-SCORE histogram (bounded by the "
    "6-decimal score space, partial-agg'd map-side), the running count "
    "runs over histogram rows only, and the 9-row fraction table "
    "cross-checks against it — corpus rows are touched exactly once by "
    "the score projection. CEILING(DECIMAL * BIGINT) is exact integer "
    "arithmetic on both engines.",
)
def x22_quality_thresholds(spark, sf_dir):
    from ez_cdc_spark.functions.text import quality_score

    d = t(spark, sf_dir, "documents")
    q = d.select(quality_score(F.col("text")).alias("quality"))
    h = q.groupBy("quality").agg(F.count("*").alias("c"))
    w = Window.orderBy(F.desc("quality")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cum = h.withColumn("n_ge", F.sum("c").over(w)).withColumn(
        "n", F.sum("c").over(w_all)
    )
    fr = spark.createDataFrame(
        [(i / 10.0,) for i in range(1, 10)], "keep_frac double"
    ).select(F.col("keep_frac").cast("decimal(3,1)").alias("keep_frac"))
    return (
        cum.crossJoin(F.broadcast(fr))
        .filter(F.col("n_ge") >= F.ceil(F.col("keep_frac") * F.col("n")))
        .groupBy("keep_frac")
        .agg(
            F.max("quality").cast("double").alias("threshold"),
            F.min("n_ge").cast("bigint").alias("n_kept"),
        )
        .select(F.col("keep_frac").cast("double").alias("keep_frac"), "threshold", "n_kept")
        .orderBy("keep_frac")
    )


@register(
    "x28_split_assign",
    oracle=f"""
SELECT doc_id, source,
       CAST({_o_phash("'split:' || CAST(doc_id AS VARCHAR)")} % 100 AS BIGINT)
         AS bucket,
       CASE WHEN {_o_phash("'split:' || CAST(doc_id AS VARCHAR)")} % 100 < 80
              THEN 'train'
            WHEN {_o_phash("'split:' || CAST(doc_id AS VARCHAR)")} % 100 < 90
              THEN 'val'
            ELSE 'test' END AS split
FROM documents
ORDER BY doc_id
""",
    doc="X28: deterministic train/val/test split assignment — the hash "
    "split every training pipeline runs before anything else: "
    "bucket = portable_hash('split:'||doc_id) % 100, train < 80 <= val "
    "< 90 <= test. Keyed on content-stable identity (never position or "
    "random()), so the assignment is reproducible across runs, stable "
    "under corpus growth (new docs don't reshuffle old ones), and "
    "engine-portable (the oracle recomputes every row's bucket "
    "bit-identically). Pure map-side projection: ZERO shuffle at any "
    "scale beyond the deterministic output sort. The salted key "
    "('split:' prefix) keeps this hash independent of x7's sampling and "
    "x15's sharding hashes. Leakage caveat by design: doc-level splits "
    "leak near-duplicates across splits — run X24 canonical election "
    "first (or key the hash on cluster_id) when that matters.",
)
def x28_split_assign(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    bucket = _phash(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))) % 100
    return (
        d.select(
            "doc_id",
            "source",
            bucket.cast("bigint").alias("bucket"),
            F.when(bucket < 80, F.lit("train"))
            .when(bucket < 90, F.lit("val"))
            .otherwise(F.lit("test"))
            .alias("split"),
        )
        .orderBy("doc_id")
    )


@register(
    "x29_profile",
    oracle="""
WITH base AS (
  SELECT o_orderkey, o_custkey,
         CAST(o_totalprice AS DECIMAL(12,2)) AS o_totalprice,
         o_orderdate, o_orderstatus
  FROM orders
)
SELECT 'o_custkey' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
       CAST(MIN(o_custkey) AS VARCHAR) AS min_s,
       CAST(MAX(o_custkey) AS VARCHAR) AS max_s
FROM base
UNION ALL
SELECT 'o_orderdate', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(COUNT(DISTINCT o_orderdate) AS BIGINT),
       strftime(MIN(o_orderdate), '%Y-%m-%d %H:%M:%S'),
       strftime(MAX(o_orderdate), '%Y-%m-%d %H:%M:%S')
FROM base
UNION ALL
SELECT 'o_orderkey', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(COUNT(DISTINCT o_orderkey) AS BIGINT),
       CAST(MIN(o_orderkey) AS VARCHAR), CAST(MAX(o_orderkey) AS VARCHAR)
FROM base
UNION ALL
SELECT 'o_orderstatus', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
       MIN(o_orderstatus), MAX(o_orderstatus)
FROM base
UNION ALL
SELECT 'o_totalprice', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(COUNT(DISTINCT o_totalprice) AS BIGINT),
       CAST(MIN(o_totalprice) AS VARCHAR), CAST(MAX(o_totalprice) AS VARCHAR)
FROM base
ORDER BY col_name
""",
    doc="X29: single-pass column profiler — the stats surface every "
    "ingestion/data-quality/query-planning step needs (per column: rows, "
    "null count, EXACT distinct count, min/max rendered canonically). "
    "ONE aggregate over the table computes all columns' metrics together "
    "(Catalyst plans the multi-count_distinct via one expand — a single "
    "scan and one aggregation exchange, not a scan per column), then the "
    "1-row result explodes into one row per column: the only shuffled "
    "data is partial-agg state, O(distinct values) per column, never "
    "rows. Renders: numerics/strings via CAST, decimals via exact "
    "DECIMAL(12,2), timestamps second-truncated after native min/max "
    "(truncate-then-compare would misorder sub-second values).",
)
def x29_profile(spark, sf_dir):
    from ez_cdc_spark.queries._util import dec

    base = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        dec("o_totalprice").alias("o_totalprice"),
        "o_orderdate",
        "o_orderstatus",
    )
    ts_render = lambda col: F.date_format(col, "yyyy-MM-dd HH:mm:ss")  # noqa: E731
    str_render = lambda col: col.cast("string")  # noqa: E731
    renders = {"o_orderdate": ts_render}
    cols = ["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate", "o_orderstatus"]
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_rows")]
    for c in cols:
        r = renders.get(c, str_render)
        aggs += [
            F.sum(F.col(c).isNull().cast("bigint")).cast("bigint").alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).cast("bigint").alias(f"{c}__nd"),
            r(F.min(c)).alias(f"{c}__min"),
            r(F.max(c)).alias(f"{c}__max"),
        ]
    one = base.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("n_rows"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__nd").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_s"),
                F.col(f"{c}__max").alias("max_s"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(rows).alias("r")).select("r.*").orderBy("col_name")


@register(
    "x30_expectations",
    oracle="""
SELECT 'domain_o_orderstatus' AS check_name,
       CAST((SELECT COUNT(*) FROM orders
             WHERE o_orderstatus NOT IN ('O', 'F', 'P')) AS BIGINT) AS n_violations
UNION ALL
SELECT 'fk_orders_custkey',
       CAST((SELECT COUNT(*) FROM orders
             WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)) AS BIGINT)
UNION ALL
SELECT 'notnull_o_orderdate',
       CAST((SELECT COUNT(*) FROM orders WHERE o_orderdate IS NULL) AS BIGINT)
UNION ALL
SELECT 'positive_o_totalprice',
       CAST((SELECT COUNT(*) FROM orders
             WHERE CAST(o_totalprice AS DECIMAL(12,2)) <= 0) AS BIGINT)
UNION ALL
SELECT 'unique_o_orderkey',
       CAST((SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders) AS BIGINT)
ORDER BY check_name
""",
    doc="X30: declarative data-quality expectations — the constraint suite "
    "(Deequ/Great-Expectations-style) a pipeline runs before promoting a "
    "landed table: key uniqueness, referential integrity, value domain, "
    "range, and null checks, each returning its VIOLATION COUNT (0 = "
    "pass), unioned into one report. Spark-first shapes per check: "
    "uniqueness is count - count_distinct in one aggregate (no "
    "self-join); the FK check is a LEFT ANTI join against the broadcast "
    "distinct dimension keys (O(fact) map-side probe, no shuffle of the "
    "fact side); domain/range/null checks are pushed-filter counts. "
    "Every check is a 1-row aggregate, so the union costs nothing at any "
    "scale.",
)
def x30_expectations(spark, sf_dir):
    from ez_cdc_spark.queries._util import dec

    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")

    def one(name, df_count):
        return df_count.select(
            F.lit(name).alias("check_name"),
            F.col("v").cast("bigint").alias("n_violations"),
        )

    uniq = o.agg((F.count("*") - F.count_distinct("o_orderkey")).alias("v"))
    fk = (
        o.select("o_custkey")
        .join(
            F.broadcast(c.select(F.col("c_custkey").alias("o_custkey")).distinct()),
            "o_custkey",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("v"))
    )
    dom = o.filter(~F.col("o_orderstatus").isin("O", "F", "P")).agg(
        F.count(F.lit(1)).alias("v")
    )
    pos = o.filter(dec("o_totalprice") <= 0).agg(F.count(F.lit(1)).alias("v"))
    nn = o.filter(F.col("o_orderdate").isNull()).agg(F.count(F.lit(1)).alias("v"))
    report = (
        one("unique_o_orderkey", uniq)
        .unionByName(one("fk_orders_custkey", fk))
        .unionByName(one("domain_o_orderstatus", dom))
        .unionByName(one("positive_o_totalprice", pos))
        .unionByName(one("notnull_o_orderdate", nn))
    )
    return report.orderBy("check_name")


@register(
    "x31_rank_normalize",
    oracle="""
SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
       ROUND(percent_rank() OVER (PARTITION BY source ORDER BY n_chars), 6)
         AS pct_rank
FROM documents
ORDER BY doc_id
""",
    doc="X31: per-source rank normalization — map each document's length "
    "onto its within-source percentile (percent_rank semantics: strictly-"
    "below count / (n-1), ties share a rank), the standard move to make "
    "quality/length signals comparable ACROSS sources before mixing "
    "(x7b) or capping (x18). The oracle states it as a window function; "
    "the engine deliberately does NOT (a source-partitioned window puts "
    "an entire source's rows in one task — source is low-cardinality, so "
    "at 100 TB that's a straggler). Instead: per-(source, value) counts, "
    "a cumulative sum over the DISTINCT-VALUE histogram (the window "
    "shuffles only O(distinct lengths) rows), and a broadcast map-side "
    "join back onto the corpus — same answer, no full-corpus keyed "
    "exchange at all.",
)
def x31_rank_normalize(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    hist = d.groupBy("source", "n_chars").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("source").orderBy("n_chars")
    cum = hist.withColumn("cum", F.sum("cnt").over(w))
    tot = d.groupBy("source").agg(F.count("*").alias("n_src"))
    pr = F.when(F.col("n_src") == 1, F.lit(0.0)).otherwise(
        (F.col("cum") - F.col("cnt")) / (F.col("n_src") - 1)
    )
    ranks = (
        cum.join(F.broadcast(tot), "source")
        .select("source", "n_chars", F.round(pr, 6).alias("pct_rank"))
    )
    return (
        d.join(F.broadcast(ranks), ["source", "n_chars"])
        .select("doc_id", "source", F.col("n_chars").cast("bigint").alias("n_chars"), "pct_rank")
        .orderBy("doc_id")
    )


@register(
    "x32_cohort_retention",
    oracle="""
WITH first_signup AS (
  SELECT user_id, MIN(ts) AS t0 FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), act AS (
  SELECT e.user_id,
         CAST(floor(epoch(f.t0) / 604800) AS BIGINT) AS cohort_week,
         CAST(floor(epoch(e.ts) / 604800)
              - floor(epoch(f.t0) / 604800) AS BIGINT) AS weeks_since
  FROM events e JOIN first_signup f USING (user_id)
  WHERE e.ts >= f.t0
)
SELECT cohort_week, weeks_since,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active
FROM act GROUP BY cohort_week, weeks_since
ORDER BY cohort_week, weeks_since
""",
    doc="X32: cohort retention — the product-analytics staple: bucket users "
    "by first-signup week, count distinct users active k weeks later. The "
    "oracle states it as agg + join; the engine rides w8's single-"
    "exchange pattern instead: the per-user signup anchor is a window min "
    "over the SAME user-keyed exchange the activity rows already need — "
    "no first-touch self-join, no second shuffle of the fact table; the "
    "only other exchange is the final (cohort, week) rollup (distinct "
    "users via its expand). Week arithmetic is integer floor-division of "
    "epoch seconds — truncation-safe on both engines because week "
    "boundaries are whole seconds. At 100 TB: events shuffle once by "
    "user_id; cohort keys are low-cardinality but carry only aggregated "
    "rows.",
)
def x32_cohort_retention(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    t0 = F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w)
    wk = lambda c: F.floor(F.unix_timestamp(c) / 604800).cast("bigint")  # noqa: E731
    anchored = (
        e.select("user_id", "ts", "event_type")
        .withColumn("t0", t0)
        .filter(F.col("t0").isNotNull() & (F.col("ts") >= F.col("t0")))
    )
    return (
        anchored.select(
            "user_id",
            wk(F.col("t0")).alias("cohort_week"),
            (wk(F.col("ts")) - wk(F.col("t0"))).alias("weeks_since"),
        )
        .groupBy("cohort_week", "weeks_since")
        .agg(F.count_distinct("user_id").cast("bigint").alias("n_active"))
        .orderBy("cohort_week", "weeks_since")
    )


@register(
    "x34_unigram_logprob",
    oracle=r"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS token
  FROM documents
), freq AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok GROUP BY token
), total AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM tok
), per_doc AS (
  SELECT t.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         SUM(CAST(ROUND(ln(f.cnt), 6) AS DECIMAL(18,6))) AS ln_cnt_sum
  FROM tok t JOIN freq f USING (token)
  GROUP BY t.doc_id
)
SELECT p.doc_id, p.n_tokens,
       ROUND(CAST(p.ln_cnt_sum AS DOUBLE) / p.n_tokens - ln(tt.n), 6)
         AS avg_logprob
FROM per_doc p, total tt
ORDER BY p.doc_id
""",
    doc="X34: unigram language-model scoring — per-document mean token "
    "log-probability under the corpus's own unigram distribution, the "
    "perplexity-proxy quality filter (CCNet/KenLM style: drop docs whose "
    "vocabulary the corpus LM finds surprising). Log-domain companion to "
    "x17's LINEAR mean frequency: the log makes one hapax drag a doc's "
    "score the way a perplexity filter would, where x17's mean is "
    "dominated by its most common tokens. avg_logprob = mean ln p(tok) "
    "= (SUM ln cnt_tok)/n - ln N. Determinism: each ln(cnt) is rounded "
    "to 6 dp and summed as exact DECIMAL — an order-free sum (float "
    "accumulation order would differ between engines) — then ONE "
    "division and one ln(N) subtraction, ROUND(,6) rendered. 100 TB "
    "plan: identical to x17 — vocab-sized freq table broadcast back "
    "against the exploded corpus (the big side never shuffles on token), "
    "per-doc aggregate partial-aggregates before its doc_id exchange, "
    "and the grand total is a 1-row broadcast.",
)
def x34_unigram_logprob(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.col("text"), r"\s+")).alias("token")
    )
    freq = tok.groupBy("token").agg(F.count("*").cast("bigint").alias("cnt"))
    total = tok.agg(F.count("*").cast("bigint").alias("n"))
    per_doc = (
        tok.join(F.broadcast(freq), "token")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum(F.round(F.log("cnt"), 6).cast("decimal(18,6)")).alias(
                "ln_cnt_sum"
            ),
        )
    )
    return (
        per_doc.join(F.broadcast(total))
        .select(
            "doc_id",
            "n_tokens",
            F.round(
                F.col("ln_cnt_sum").cast("double") / F.col("n_tokens")
                - F.log("n"),
                6,
            ).alias("avg_logprob"),
        )
        .orderBy("doc_id")
    )


@register(
    "x35_source_kl",
    oracle=r"""
WITH tok AS (
  SELECT source, unnest(regexp_split_to_array(text, '\s+')) AS token
  FROM documents
), st AS (
  SELECT source, token, CAST(COUNT(*) AS BIGINT) AS cnt_st
  FROM tok GROUP BY source, token
), g AS (
  SELECT token, CAST(SUM(cnt_st) AS BIGINT) AS cnt_g FROM st GROUP BY token
), tots AS (
  SELECT source, CAST(SUM(cnt_st) AS BIGINT) AS tot_s FROM st GROUP BY source
), tot_g AS (
  SELECT CAST(SUM(cnt_g) AS BIGINT) AS tg FROM g
), terms AS (
  SELECT s.source, ts.tot_s,
         CAST(ROUND(
           (s.cnt_st / CAST(ts.tot_s AS DOUBLE)) *
           CAST(CAST(ROUND(ln(s.cnt_st * tg.tg), 6) AS DECIMAL(18,6))
                - CAST(ROUND(ln(ts.tot_s * g.cnt_g), 6) AS DECIMAL(18,6))
                AS DOUBLE), 12) AS DECIMAL(24,12)) AS term
  FROM st s
  JOIN g USING (token)
  JOIN tots ts USING (source)
  CROSS JOIN tot_g tg
)
SELECT source, MIN(tot_s) AS n_tokens,
       ROUND(CAST(SUM(term) AS DOUBLE), 6) + 0.0 AS kl_nats
FROM terms GROUP BY source ORDER BY source
""",
    doc="X35: per-source KL divergence from the corpus unigram "
    "distribution — the domain-mixture diagnostic behind data-mixing "
    "recipes (DoReMi-style reweighting, source drift monitoring): "
    "KL(P_src || P_corpus) = sum_t p_s(t) ln(p_s(t)/p_g(t)), zero iff the "
    "source's vocabulary usage matches the corpus. Determinism (x34's "
    "recipe, extended): the log-ratio is ln(cnt_st*tot_g) - "
    "ln(tot_s*cnt_g) with each ln rounded to 6 dp and differenced as "
    "exact DECIMAL; p_s is ONE integer-input IEEE division; their "
    "product rounds to 12 dp and sums as exact DECIMAL per source "
    "(order-free), final render ROUND(,6). Boundary margins for every "
    "ln argument are pinned by test. 100 TB plan: the corpus shuffles "
    "ONCE into (source, token) partial-aggregated counts; global counts, "
    "source totals, and the grand total all derive from that vocab-sized "
    "table (no second corpus pass), and every join after the rollup is "
    "broadcast at vocab x sources granularity.",
)
def x35_source_kl(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    tok = d.select(
        "source", F.explode(F.split(F.col("text"), r"\s+")).alias("token")
    )
    st = tok.groupBy("source", "token").agg(
        F.count("*").cast("bigint").alias("cnt_st")
    )
    g = st.groupBy("token").agg(F.sum("cnt_st").cast("bigint").alias("cnt_g"))
    tots = st.groupBy("source").agg(
        F.sum("cnt_st").cast("bigint").alias("tot_s")
    )
    tot_g = g.agg(F.sum("cnt_g").cast("bigint").alias("tg"))
    lr = (
        F.round(F.log(F.col("cnt_st") * F.col("tg")), 6).cast("decimal(18,6)")
        - F.round(F.log(F.col("tot_s") * F.col("cnt_g")), 6).cast(
            "decimal(18,6)"
        )
    ).cast("double")
    p_s = F.col("cnt_st") / F.col("tot_s").cast("double")
    term = F.round(p_s * lr, 12).cast("decimal(24,12)")
    return (
        st.join(F.broadcast(g), "token")
        .join(F.broadcast(tots), "source")
        .join(F.broadcast(tot_g))
        .groupBy("source")
        .agg(
            F.min("tot_s").alias("n_tokens"),
            (F.round(F.sum(term).cast("double"), 6) + F.lit(0.0)).alias("kl_nats"),
        )
        .orderBy("source")
    )


@register(
    "x40_ngram_containment",
    oracle=r"""
WITH g AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(ws) >= 5 THEN list_transform(
                generate_series(1, len(ws) - 4),
                i -> array_to_string(ws[i:i+4], ' '))
              ELSE CAST([] AS VARCHAR[]) END) AS grams
  FROM (SELECT doc_id, regexp_split_to_array(text, '\s+') AS ws FROM documents)
), dg AS (
  SELECT doc_id, unnest(grams) AS gram FROM g
), nd AS (
  SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams FROM g WHERE len(grams) > 0
), keep AS (
  SELECT gram FROM dg GROUP BY gram HAVING COUNT(*) BETWEEN 2 AND 20
), shared AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS n_shared
  FROM dg a JOIN keep k ON a.gram = k.gram JOIN dg b ON b.gram = a.gram
  WHERE a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT s.id_a, s.id_b, s.n_shared,
       ROUND(CAST(s.n_shared AS DOUBLE) / na.n_grams, 6) AS containment_a,
       ROUND(CAST(s.n_shared AS DOUBLE) / nb.n_grams, 6) AS containment_b,
       CAST(CASE WHEN 5 * s.n_shared >= 4 * na.n_grams
                   OR 5 * s.n_shared >= 4 * nb.n_grams THEN 1 ELSE 0 END AS INT)
         AS is_contained
FROM shared s JOIN nd na ON na.doc_id = s.id_a JOIN nd nb ON nb.doc_id = s.id_b
ORDER BY id_a, id_b
""",
    doc="X40: n-gram CONTAINMENT pairs — the asymmetric near-dup detector "
    "Jaccard structurally misses: a short document quoted wholesale "
    "inside a long one has tiny Jaccard (union is large) but containment "
    "c(A->B) = |A inter B| / |A| near 1 — the quote/inclusion/excerpt "
    "case (Broder's containment, the other half of the resemblance "
    "paper). Pair generation is the INVERTED-INDEX join, never all-pairs: "
    "distinct per-doc 5-grams explode once (pinned, x19's shape), a "
    "doc-frequency band keeps only discriminative grams (df in [2,20]: "
    "df=1 cannot pair; df>20 is x19's boilerplate — joining on it would "
    "square the head of the zipf curve), and only pairs actually sharing "
    "a kept gram materialize. Both containment directions are emitted "
    "per unordered pair; the contained flag is the INTEGER comparison "
    "5*shared >= 4*n (no 0.8*n float boundary). Divisions are single "
    "IEEE divides of integers (bit-deterministic, _util rule 3). "
    "Cites x19/x21's gram-join scale notes: zipf-head skew -> AQE skew "
    "split; boilerplate band cap bounds per-gram fanout by construction.",
)
def x40_ngram_containment(spark, sf_dir):
    from ez_cdc_spark.sources.tables import widen_partitions

    d = widen_partitions(t(spark, sf_dir, "documents").select("doc_id", "text"))
    ws = F.split(F.col("text"), r"\s+")
    grams = F.array_distinct(
        F.when(
            F.size(ws) >= 5,
            F.transform(
                F.sequence(F.lit(1), F.size(ws) - 4),
                lambda i: F.concat_ws(" ", F.slice(ws, i, 5)),
            ),
        ).otherwise(F.array().cast("array<string>"))
    )
    g = d.select("doc_id", grams.alias("grams"))
    # pin the exploded projection once — feeds df-band, pair-gen (twice),
    # and per-doc counts (x19's materialization rationale)
    dg = g.select("doc_id", F.explode("grams").alias("gram")).localCheckpoint(
        eager=True
    )
    # Per-doc gram counts come from the CHECKPOINTED rows, not a re-run of
    # the interpreted gram HOF: |dg rows per doc| == size(grams) exactly
    # (grams is already distinct), and `nd` feeds TWO join legs — deriving
    # it from `g` re-evaluated the dominant HOF cost twice (r8 bench: this
    # one change took the warm query from ~9 s to ~2 s at sf0.1). Docs with
    # zero grams are absent either way (they can't appear in `shared`).
    nd = dg.groupBy("doc_id").agg(F.count("*").cast("bigint").alias("n_grams"))
    # Pair generation (r9 rewrite of the r8 shape, per the r8 ADVICE): the
    # r8 version collected every gram's FULL doc list and only then banded
    # on list size — output-equivalent, but a zipf-head gram (df in the
    # millions at 100 TB) would materialize an unbounded single-group
    # collect_list buffer that cannot spill within a group. The df band is
    # therefore applied BEFORE any list materializes: (1) df per gram via
    # a count aggregate (map-side partial count, so its exchange carries
    # slim (gram, count) rows); (2) dg semi-joins to the df∈[2,20] band —
    # both sides are gram-partitioned after their exchanges, and the
    # post-join groupBy reuses that partitioning, so the fat dg rows cross
    # the wire once; (3) collect_list now runs on ≤20-row groups by
    # construction — the buffer is bounded whatever the corpus size — and
    # the map-side i<j pair explosion stays capped at 190 pairs/gram.
    # Same inverted-index semantics, identical output; the within-bucket
    # pair materialization is x2's LSH shape.
    dfreq = dg.groupBy("gram").agg(F.count("*").alias("df"))
    kept = dfreq.filter(F.col("df").between(2, 20)).select("gram")
    banded = (
        dg.join(kept, "gram")
        .groupBy("gram")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
    )
    pair_lists = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    shared = (
        banded.select(F.explode(pair_lists).alias("p"))
        .select("p.id_a", "p.id_b")
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("bigint").alias("n_shared"))
    )
    na = nd.select(F.col("doc_id").alias("id_a"), F.col("n_grams").alias("ng_a"))
    nb = nd.select(F.col("doc_id").alias("id_b"), F.col("n_grams").alias("ng_b"))
    return (
        shared.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            "n_shared",
            F.round(F.col("n_shared") / F.col("ng_a"), 6).alias("containment_a"),
            F.round(F.col("n_shared") / F.col("ng_b"), 6).alias("containment_b"),
            (
                (5 * F.col("n_shared") >= 4 * F.col("ng_a"))
                | (5 * F.col("n_shared") >= 4 * F.col("ng_b"))
            )
            .cast("int")
            .alias("is_contained"),
        )
        .orderBy("id_a", "id_b")
    )


@register(
    "x41_chunk_overlap",
    oracle=r"""
WITH w AS (
  SELECT doc_id, regexp_split_to_array(text, '\s+') AS ws,
         CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n
  FROM documents
), c AS (
  SELECT doc_id, n,
         CASE WHEN n > 64 THEN 1 + (n - 64 + 47) // 48 ELSE 1 END AS n_chunks
  FROM w
), e AS (
  SELECT w.doc_id, w.ws, w.n,
         unnest(generate_series(0, CAST(c.n_chunks - 1 AS INT))) AS i
  FROM w JOIN c USING (doc_id)
)
SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
       CAST(i * 48 AS BIGINT) AS start_tok,
       CAST(least(n - i * 48, 64) AS BIGINT) AS n_tok,
       md5(array_to_string(ws[i * 48 + 1 : i * 48 + 64], ' ')) AS chunk_md5
FROM e
ORDER BY doc_id, chunk_id
""",
    doc="X41: sliding-window document chunking with overlap — the RAG/"
    "embedding-indexing splitter (and the training-window cousin of X8's "
    "packing: X8 concatenates docs INTO fixed windows, X41 splits docs "
    "into overlapping ones). Chunk size 64 tokens, stride 48 (16-token "
    "overlap so no boundary sentence is ever seen by zero chunks). Chunk "
    "count is the closed integer form 1 + ceil((n-64)/48) (non-negative "
    "operands: ceil as (x+47) div 48 — portable), which NEVER emits a "
    "chunk fully contained in its predecessor (the naive "
    "every-48-positions rule does, bloating the index with redundant "
    "tail chunks). Pure map-side: sequence + explode + slice, zero "
    "shuffle beyond the presentation sort; chunks render as md5 so rows "
    "stay slim (the canonicalizer rule from x6d). At 100 TB this is the "
    "shape you want: no state, no join, embarrassingly parallel, and "
    "chunk_id is deterministic so re-runs are idempotent for the "
    "downstream index.",
)
def x41_chunk_overlap(spark, sf_dir):
    C, S = 64, 48
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    ws = F.split(F.col("text"), r"\s+")
    n = F.size(ws).cast("bigint")
    n_chunks = F.when(
        n > C, F.lit(1) + F.expr(f"(size(split(text, '\\\\s+')) - {C} + {S - 1}) div {S}")
    ).otherwise(F.lit(1)).cast("bigint")
    e = d.select(
        "doc_id",
        ws.alias("ws"),
        n.alias("n"),
        F.explode(F.sequence(F.lit(0).cast("bigint"), n_chunks - 1)).alias("i"),
    )
    return e.select(
        "doc_id",
        F.col("i").alias("chunk_id"),
        (F.col("i") * S).cast("bigint").alias("start_tok"),
        F.least(F.col("n") - F.col("i") * S, F.lit(C).cast("bigint")).alias("n_tok"),
        F.md5(
            F.concat_ws(" ", F.slice("ws", (F.col("i") * S + 1).cast("int"), C))
        ).alias("chunk_md5"),
    ).orderBy("doc_id", "chunk_id")


@register(
    "x42_vocab_coverage",
    oracle=r"""
WITH tok AS (
  SELECT unnest(regexp_split_to_array(text, '\s+')) AS token FROM documents
), freq AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok GROUP BY token
), ranked AS (
  SELECT token, cnt,
         CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS BIGINT) AS rk,
         CAST(SUM(cnt) OVER (ORDER BY cnt DESC, token
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
  FROM freq
), tot AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS n_total,
         CAST(COUNT(*) AS BIGINT) AS vocab FROM freq
), ks AS (
  SELECT CAST(unnest([1,2,4,8,16,32,64,128,256,512,1024,4096]) AS BIGINT) AS k
)
SELECT ks.k,
       least(ks.k, tot.vocab) AS vocab_k,
       r.cum AS covered_tokens,
       tot.n_total,
       CAST(r.cum AS DOUBLE) / tot.n_total AS coverage
FROM ks, tot JOIN ranked r ON r.rk = least(ks.k, tot.vocab)
ORDER BY ks.k
""",
    doc="X42: vocabulary coverage curve — what fraction of corpus token "
    "mass the top-k most frequent types cover, for k on a doubling grid: "
    "the tokenizer-design / OOV-budget diagnostic (pick vocab size where "
    "the curve knees) and the zipf-fit companion to X14's histogram. "
    "Scale shape is x22's histogram rule: the corpus collapses to the "
    "vocab-sized (token, cnt) table via one partial-agg'd exchange; the "
    "rank/cumsum window runs over VOCAB rows only (never the corpus — "
    "an unpartitioned window is safe exactly because its input is "
    "catalog-bounded, same argument as x22/x31), and the 12-row k grid "
    "joins by rank. Determinism: ties broken (cnt DESC, token); "
    "coverage is a single IEEE division of BIGINTs (_util rule 3, "
    "bit-identical, no rounding needed).",
)
def x42_vocab_coverage(spark, sf_dir):
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents")
    tok = d.select(F.explode(F.split(F.col("text"), r"\s+")).alias("token"))
    freq = tok.groupBy("token").agg(F.count("*").cast("bigint").alias("cnt"))
    w = Window.orderBy(F.desc("cnt"), F.asc("token"))
    ranked = freq.select(
        "cnt",
        F.row_number().over(w).cast("bigint").alias("rk"),
        F.sum("cnt").over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint")
        .alias("cum"),
    )
    tot = freq.agg(
        F.sum("cnt").cast("bigint").alias("n_total"),
        F.count("*").cast("bigint").alias("vocab"),
    )
    ks = spark.range(0).sparkSession.createDataFrame(
        [(k,) for k in (1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024, 4096)],
        "k bigint",
    )
    return (
        ks.crossJoin(F.broadcast(tot))
        .join(
            F.broadcast(ranked),
            F.col("rk") == F.least(F.col("k"), F.col("vocab")),
        )
        .select(
            "k",
            F.least(F.col("k"), F.col("vocab")).alias("vocab_k"),
            F.col("cum").alias("covered_tokens"),
            "n_total",
            (F.col("cum") / F.col("n_total")).alias("coverage"),
        )
        .orderBy("k")
    )


@register(
    "x45_dup_span_coverage",
    oracle=r"""
WITH tok AS (
  SELECT doc_id, regexp_split_to_array(text, '\s+') AS ws FROM documents
), pos AS (
  SELECT doc_id, i AS p, array_to_string(ws[i:i+7], ' ') AS gram
  FROM tok, unnest(CASE WHEN len(ws) >= 8
                        THEN generate_series(1, len(ws) - 7)
                        ELSE CAST([] AS BIGINT[]) END) AS u(i)
), df AS (
  SELECT gram FROM (SELECT DISTINCT doc_id, gram FROM pos)
  GROUP BY gram HAVING COUNT(*) >= 2
), hit AS (
  SELECT pos.doc_id, pos.p FROM pos JOIN df USING (gram)
), cov AS (
  SELECT doc_id, p,
         CASE WHEN lag(p) OVER w IS NULL THEN 8
              ELSE LEAST(8, p - lag(p) OVER w) END AS add_cov
  FROM hit WINDOW w AS (PARTITION BY doc_id ORDER BY p)
), agg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dup_positions,
         CAST(SUM(add_cov) AS BIGINT) AS covered_tokens
  FROM cov GROUP BY doc_id
)
SELECT t.doc_id, CAST(len(t.ws) AS BIGINT) AS n_tokens,
       COALESCE(a.dup_positions, 0) AS dup_positions,
       COALESCE(a.covered_tokens, 0) AS covered_tokens
FROM tok t LEFT JOIN agg a USING (doc_id)
ORDER BY t.doc_id
""",
    doc="X45: duplicated-SPAN coverage — the exact substring-level dedup "
    "diagnostic ('Deduplicating Training Data Makes Language Models "
    "Better' semantics) that doc-level measures miss: x1 keys whole "
    "docs, x19 counts boilerplate GRAMS, x40 scores doc PAIRS; this op "
    "reports, per doc, how many TOKEN POSITIONS lie inside an 8-token "
    "span that also appears in some other document — the quantity a "
    "span-removal pass would delete. Every position's 8-gram gets a "
    "corpus doc-frequency (distinct-per-doc explode -> COUNT(*), x19's "
    "compression); positions whose gram occurs in >= 2 docs are "
    "'covered', and overlapping spans are union-counted WITHOUT "
    "materializing per-token rows: flagged start positions sort "
    "ascending per doc, so span ends sort too, and the interval union "
    "telescopes to SUM(LEAST(8, p - lag(p))) — one integer lag window. "
    "100 TB shape: gram-keyed exchange with map-side distinct partials "
    "(zipf head -> AQE skew split), hits join back on gram, then ONE "
    "doc-keyed window over flagged positions only (|flagged| << "
    "|tokens|); all integer, no rounding discipline.",
)
def x45_dup_span_coverage(spark, sf_dir):
    from pyspark.sql import Window

    from ez_cdc_spark.sources.tables import widen_partitions

    d = widen_partitions(t(spark, sf_dir, "documents").select("doc_id", "text"))
    ws = F.split(F.col("text"), r"\s+")
    tok = d.select("doc_id", ws.alias("ws"))
    grams = F.when(
        F.size("ws") >= 8,
        F.transform(
            F.sequence(F.lit(1), F.size("ws") - 7),
            lambda i: F.struct(
                i.cast("long").alias("p"),
                F.concat_ws(" ", F.slice("ws", i, 8)).alias("gram"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<p:long,gram:string>>"))
    # Pin the exploded positions once (x19's rationale): the interpreted
    # 8-gram HOF feeds both the doc-frequency agg and the hits join.
    pos = (
        tok.select("doc_id", F.explode(grams).alias("g"))
        .select("doc_id", F.col("g.p").alias("p"), F.col("g.gram").alias("gram"))
        .localCheckpoint(eager=True)
    )
    df = (
        pos.select("doc_id", "gram")
        .distinct()
        .groupBy("gram")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") >= 2)
        .select("gram")
    )
    hit = pos.join(df, "gram").select("doc_id", "p")
    w = Window.partitionBy("doc_id").orderBy("p")
    cov = hit.select(
        "doc_id",
        F.when(F.lag("p").over(w).isNull(), F.lit(8))
        .otherwise(F.least(F.lit(8), F.col("p") - F.lag("p").over(w)))
        .alias("add_cov"),
    )
    agg = cov.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("dup_positions"),
        F.sum("add_cov").cast("bigint").alias("covered_tokens"),
    )
    return (
        tok.select("doc_id", F.size("ws").cast("bigint").alias("n_tokens"))
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("dup_positions", F.lit(0)).cast("bigint").alias("dup_positions"),
            F.coalesce("covered_tokens", F.lit(0)).cast("bigint").alias(
                "covered_tokens"
            ),
        )
        .orderBy("doc_id")
    )


@register(
    "x46_bigram_logprob",
    oracle=r"""
WITH tok AS (
  SELECT doc_id, regexp_split_to_array(text, '\s+') AS ws FROM documents
), db AS (
  SELECT doc_id, array_to_string(ws[i:i+1], ' ') AS bg, ws[i] AS w1
  FROM tok, unnest(CASE WHEN len(ws) >= 2
                        THEN generate_series(1, len(ws) - 1)
                        ELSE CAST([] AS BIGINT[]) END) AS u(i)
), freq AS (
  SELECT bg, w1, CAST(COUNT(*) AS BIGINT) AS cnt_bg FROM db GROUP BY bg, w1
), prefix AS (
  SELECT w1, CAST(SUM(cnt_bg) AS BIGINT) AS cnt_u FROM freq GROUP BY w1
), per_doc AS (
  SELECT d.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         SUM(CAST(ROUND(ln(f.cnt_bg), 6) AS DECIMAL(18,6))
             - CAST(ROUND(ln(p.cnt_u), 6) AS DECIMAL(18,6))) AS s
  FROM db d
  JOIN freq f ON d.bg = f.bg AND d.w1 = f.w1
  JOIN prefix p ON d.w1 = p.w1
  GROUP BY d.doc_id
)
SELECT doc_id, n_bigrams,
       ROUND(CAST(s AS DOUBLE) / n_bigrams, 6) AS avg_logprob
FROM per_doc
ORDER BY doc_id
""",
    doc="X46: bigram conditional LM scoring — per-doc mean ln p(w_i | "
    "w_{i-1}) under the corpus's own bigram distribution, the next step "
    "up the n-gram ladder from x34's unigram filter: a doc full of "
    "common words in UNCOMMON ORDER (shuffled text, keyword stuffing, "
    "MT word salad) scores high on x34 but low here, because the "
    "conditional surprises. p(w_i|w_{i-1}) = cnt(bigram)/cnt(prefix), "
    "with the prefix count derived FROM the bigram table (occurrences "
    "as bigram-first), so probabilities sum to 1 per prefix — a proper "
    "conditional. Determinism is x35's pair recipe verbatim: each term "
    "is the DIFFERENCE of two 6-dp-rounded lns as exact DECIMAL, the "
    "per-doc sum is order-free, one IEEE division, ROUND(,6). Docs with "
    "< 2 tokens have no bigram and are declaredly absent. 100 TB shape: "
    "the bigram freq table is corpus-vocab-squared-bounded and must NOT "
    "be assumed broadcastable (x19's rule) — the corpus shuffles once "
    "on the bigram key (AQE skew split on the zipf head); the PREFIX "
    "table is unigram-vocab-sized and broadcasts back map-side like "
    "x34's freq.",
)
def x46_bigram_logprob(spark, sf_dir):
    from ez_cdc_spark.sources.tables import widen_partitions

    d = widen_partitions(t(spark, sf_dir, "documents").select("doc_id", "text"))
    ws = F.split(F.col("text"), r"\s+")
    bigrams = F.when(
        F.size(ws) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - 1),
            lambda i: F.struct(
                F.concat_ws(" ", F.slice(ws, i, 2)).alias("bg"),
                F.element_at(ws, i).alias("w1"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<bg:string,w1:string>>"))
    # pin the exploded bigram projection once (x19's rationale): it feeds
    # the freq aggregate and the scoring join
    db = (
        d.select("doc_id", F.explode(bigrams).alias("b"))
        .select("doc_id", F.col("b.bg").alias("bg"), F.col("b.w1").alias("w1"))
        .localCheckpoint(eager=True)
    )
    freq = db.groupBy("bg", "w1").agg(F.count("*").cast("bigint").alias("cnt_bg"))
    prefix = freq.groupBy("w1").agg(F.sum("cnt_bg").cast("bigint").alias("cnt_u"))
    term = (
        F.round(F.log("cnt_bg"), 6).cast("decimal(18,6)")
        - F.round(F.log("cnt_u"), 6).cast("decimal(18,6)")
    )
    per_doc = (
        db.join(freq, ["bg", "w1"])
        .join(F.broadcast(prefix), "w1")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            F.sum(term).alias("s"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_bigrams",
        F.round(F.col("s").cast("double") / F.col("n_bigrams"), 6).alias(
            "avg_logprob"
        ),
    ).orderBy("doc_id")


@register(
    "x47_holdout_with_floors",
    oracle=f"""
WITH b AS (
  SELECT doc_id, source,
         CAST({_o_phash("'holdout:' || CAST(doc_id AS VARCHAR)")} % 100 AS BIGINT)
           AS bucket
  FROM documents
), cnt AS (
  SELECT source,
         CAST(SUM(CASE WHEN bucket < 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_hash
  FROM b GROUP BY source
), topup AS (
  SELECT doc_id, source, bucket FROM (
    SELECT p.doc_id, p.source, p.bucket, c.n_hash,
           ROW_NUMBER() OVER (PARTITION BY p.source
                              ORDER BY p.bucket, p.doc_id) AS rn
    FROM b p JOIN cnt c USING (source)
    WHERE p.bucket >= 10 AND c.n_hash < 5
  ) WHERE rn <= 5 - n_hash
)
SELECT doc_id, source, bucket, 'hash' AS via FROM b WHERE bucket < 10
UNION ALL
SELECT doc_id, source, bucket, 'floor' AS via FROM topup
ORDER BY doc_id
""",
    doc="X47: group-wise sampled holdout with per-source floors — the x28 × "
    "x18 composition (r8 verdict task #7): the holdout is primarily the "
    "deterministic map-side hash split (bucket = "
    "portable_hash('holdout:'||doc_id) % 100 < 10 — content-stable, "
    "growth-stable, nested under rate changes, salt-independent of "
    "x7/x15/x28), but a bare hash split gives a tiny source ZERO eval "
    "docs with probability 0.9^n — so every source is topped up to a "
    "floor of 5 docs, drawn deterministically from its non-picked docs "
    "closest to the cut line (ORDER BY bucket, doc_id). Scale shape: "
    "the hash arm is zero-shuffle; the floor arm costs one SLIM "
    "partial-aggregated count exchange, after which only DEFICIENT "
    "sources (n_hash < floor — by construction sources with ~<= 50 "
    "docs, plus vanishing-probability stragglers guarded by x18's "
    "salt-local two-phase top-k) join back via BROADCAST and get "
    "window-ranked; a mega-source never enters the window path at all. "
    "Sources with fewer than 5 docs total holdout everything — "
    "min(5, n_docs) is the floor invariant, 10×-stress-tested.",
)
def x47_holdout_with_floors(spark, sf_dir):
    k, rate = 5, 10
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        (_phash(F.concat(F.lit("holdout:"), F.col("doc_id").cast("string"))) % 100)
        .cast("bigint")
        .alias("bucket"),
    )
    hashpick = d.filter(F.col("bucket") < rate).withColumn("via", F.lit("hash"))
    cnt = d.groupBy("source").agg(
        F.sum(F.when(F.col("bucket") < rate, 1).otherwise(0))
        .cast("bigint")
        .alias("n_hash")
    )
    defic = cnt.filter(F.col("n_hash") < k)
    cand = d.filter(F.col("bucket") >= rate).join(F.broadcast(defic), "source")
    # x18's salt-local two-phase top-k: phase 1 keeps <= 16k rows/source
    salt = F.pmod(F.xxhash64("doc_id"), F.lit(16))
    w_local = Window.partitionBy("source", "salt").orderBy("bucket", "doc_id")
    survivors = (
        cand.withColumn("salt", salt)
        .withColumn("lrk", F.row_number().over(w_local))
        .filter(F.col("lrk") <= k)
        .drop("lrk", "salt")
    )
    w_final = Window.partitionBy("source").orderBy("bucket", "doc_id")
    topup = (
        survivors.withColumn("rn", F.row_number().over(w_final))
        .filter(F.col("rn") <= k - F.col("n_hash"))
        .select("doc_id", "source", "bucket", F.lit("floor").alias("via"))
    )
    return (
        hashpick.select("doc_id", "source", "bucket", "via")
        .unionByName(topup)
        .orderBy("doc_id")
    )


@register(
    "x49_vocab_gini",
    oracle=r"""
WITH toks AS (
  SELECT source, unnest(regexp_split_to_array(text, '\s+')) AS word
  FROM documents
), h AS (
  SELECT source, word, CAST(COUNT(*) AS BIGINT) AS w
  FROM toks GROUP BY source, word
), r AS (
  SELECT source, w,
         CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY w, word)
              AS BIGINT) AS rn
  FROM h
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(SUM(w) AS BIGINT) AS n_tokens,
       CAST(2 * SUM(rn * w) - (COUNT(*) + 1) * SUM(w) AS BIGINT) AS gini_num,
       CAST(COUNT(*) * SUM(w) AS BIGINT) AS gini_den,
       CAST(2 * SUM(rn * w) - (COUNT(*) + 1) * SUM(w) AS DOUBLE)
         / CAST(COUNT(*) * SUM(w) AS DOUBLE) AS gini
FROM r GROUP BY source
ORDER BY source
""",
    doc="X49: per-source vocabulary concentration (Gini coefficient of the "
    "token-frequency distribution) — the 'is this source template spam?' "
    "diagnostic: near-0 means tokens are used evenly (diverse prose), "
    "near-1 means a handful of tokens dominate (boilerplate, log spew, "
    "generated templates). Complements x42's coverage curve (how many "
    "types cover the mass) with the standard single-number inequality "
    "statistic, and x35's KL (who diverges from the corpus) with a "
    "corpus-free per-source measure. Computed on the SORTED frequency "
    "histogram via the exact rank form G = (2·Σ rk·w_k − (n+1)·W)/(n·W) "
    "(ranks ascending by (count, token) — the word tiebreak makes the "
    "rank total and both engines agree on it; tied counts in any order "
    "give the same Σ rk·w_k since equal w factors out of consecutive "
    "ranks... rendered deterministic anyway by the total order). Scale "
    "shape: corpus collapses to the (source, word) histogram in one "
    "partially-aggregated exchange; the rank window and final aggregate "
    "touch VOCABULARY rows only (Heaps-law-bounded, never corpus-sized); "
    "exact BIGINT num/den emitted beside ONE IEEE division.",
)
def x49_vocab_gini(spark, sf_dir):
    from ez_cdc_spark.functions.text import words

    d = t(spark, sf_dir, "documents").select("source", "text")
    toks = d.select("source", F.explode(words(F.col("text"))).alias("word"))
    h = toks.groupBy("source", "word").agg(F.count("*").cast("bigint").alias("w"))
    rw = Window.partitionBy("source").orderBy("w", "word")
    r = h.select("source", "w", F.row_number().over(rw).cast("bigint").alias("rn"))
    num = (2 * F.sum(F.col("rn") * F.col("w")) - (F.count("*") + 1) * F.sum("w")).cast(
        "bigint"
    )
    den = (F.count("*") * F.sum("w")).cast("bigint")
    return (
        r.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_types"),
            F.sum("w").cast("bigint").alias("n_tokens"),
            num.alias("gini_num"),
            den.alias("gini_den"),
            (num.cast("double") / den.cast("double")).alias("gini"),
        )
        .orderBy("source")
    )


@register(
    "x58_snapshot_drift",
    oracle="""
WITH e AS (
  SELECT 'lang' AS col_name, lang AS val, doc_id FROM documents
  UNION ALL
  SELECT 'source' AS col_name, source AS val, doc_id FROM documents
), c AS (
  SELECT col_name, val,
         SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS na,
         SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS nb
  FROM e GROUP BY 1, 2
), t AS (
  SELECT SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS ta,
         SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS tb
  FROM documents
)
SELECT col_name, val,
       CAST(na AS BIGINT) AS n_a,
       CAST(nb AS BIGINT) AS n_b,
       CAST(ABS(na * tb - nb * ta) AS BIGINT) AS drift_num,
       CAST(na AS DOUBLE) / ta - CAST(nb AS DOUBLE) / tb AS rate_delta
FROM c, t
ORDER BY col_name, val
""",
    doc="X58: cross-snapshot distribution drift — x16's snapshot diff "
    "raised to DISTRIBUTION level (x16 says which ROWS changed; x58 "
    "says whether the corpus MIX moved): per categorical column "
    "(lang, source), each category's count in snapshot A vs snapshot B "
    "(the doc_id parity split, the x2f convention) with the drift "
    "numerator |nA·totB − nB·totA| as an EXACT BIGINT cross-multiply "
    "(zero until the mix genuinely moves — the total-variation "
    "numerator before its one division; Σ drift_num / (2·totA·totB) = "
    "TV distance, pinned by the Python property test) and rate_delta "
    "as the difference of two correctly-rounded IEEE divisions "
    "(deterministic per SURVEY 5.3 rule 3 — each division exactly "
    "rounded, the subtraction exactly rounded, no intermediate "
    "rounding). The crawl-snapshot drift monitor every ingest pipeline "
    "wants before a new snapshot poisons the mixing weights (x7's "
    "ratios assume a stable mix; x58 is the alarm that they no longer "
    "hold). 100 TB shape: ONE scan (a 2-wide explode), one "
    "category-bounded exchange (partial-agg'd map-side — the exchange "
    "carries ≤ |langs|+|sources| rows per partition), totals as a "
    "1-row broadcast cross-join (the x22/x42 pattern, no driver-side "
    "action).",
)
def x58_snapshot_drift(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    pairs = d.select(
        "doc_id",
        F.explode(
            F.array(
                F.struct(
                    F.lit("lang").alias("col_name"), F.col("lang").alias("val")
                ),
                F.struct(
                    F.lit("source").alias("col_name"),
                    F.col("source").alias("val"),
                ),
            )
        ).alias("e"),
    ).select("doc_id", "e.col_name", "e.val")
    is_a = (F.col("doc_id") % 2 == 0).cast("bigint")
    is_b = (F.col("doc_id") % 2 == 1).cast("bigint")
    c = pairs.groupBy("col_name", "val").agg(
        F.sum(is_a).alias("na"), F.sum(is_b).alias("nb")
    )
    tot = d.agg(
        F.sum((F.col("doc_id") % 2 == 0).cast("bigint")).alias("ta"),
        F.sum((F.col("doc_id") % 2 == 1).cast("bigint")).alias("tb"),
    )
    return (
        c.join(F.broadcast(tot))
        .select(
            "col_name",
            "val",
            F.col("na").cast("bigint").alias("n_a"),
            F.col("nb").cast("bigint").alias("n_b"),
            F.abs(F.col("na") * F.col("tb") - F.col("nb") * F.col("ta"))
            .cast("bigint")
            .alias("drift_num"),
            (
                F.col("na").cast("double") / F.col("ta")
                - F.col("nb").cast("double") / F.col("tb")
            ).alias("rate_delta"),
        )
        .orderBy("col_name", "val")
    )


@register(
    "x50_span_removal",
    oracle=r"""
WITH tok AS (
  SELECT doc_id, regexp_split_to_array(text, '\s+') AS ws FROM documents
), g AS (
  SELECT doc_id, CAST(i AS BIGINT) AS p, array_to_string(ws[i:i+7], ' ') AS gram
  FROM tok, unnest(CASE WHEN len(ws) >= 8
                        THEN generate_series(1, len(ws) - 7)
                        ELSE CAST([] AS BIGINT[]) END) AS u(i)
), dfq AS (
  SELECT gram FROM (
    SELECT gram, COUNT(DISTINCT doc_id) AS c FROM g GROUP BY gram
  ) WHERE c >= 2
), hits AS (
  SELECT doc_id, p FROM g JOIN dfq USING (gram)
), cov AS (
  SELECT DISTINCT doc_id, p + o AS pos
  FROM hits, unnest(generate_series(0, 7)) AS v(o)
), tokpos AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos, ws[i] AS tokn
  FROM tok, unnest(generate_series(1, len(ws))) AS w2(i)
), kept AS (
  SELECT t.doc_id, t.pos, t.tokn
  FROM tokpos t LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.pos = c.pos
  WHERE c.doc_id IS NULL
), agg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
         md5(string_agg(tokn, ' ' ORDER BY pos)) AS kept_md5
  FROM kept GROUP BY doc_id
)
SELECT tok.doc_id, CAST(len(ws) AS BIGINT) AS n_tokens,
       CAST(len(ws) - COALESCE(n_kept, 0) AS BIGINT) AS n_removed,
       CAST(COALESCE(n_kept, 0) AS BIGINT) AS n_kept,
       COALESCE(kept_md5, md5('')) AS kept_md5
FROM tok LEFT JOIN agg USING (doc_id)
ORDER BY doc_id
""",
    doc="X50: duplicated-span REMOVAL — the transform x45 only measures "
    "(Lee et al.'s ExactSubstr dedup applied): every token position "
    "covered by an 8-token span appearing in >= 2 documents is deleted, "
    "and each doc's surviving tokens are reassembled in order (rendered "
    "as md5 — the x6d slim-row rule — plus exact kept/removed counts). "
    "x45 answers 'how much would span-removal delete'; x50 actually "
    "deletes it, and the two formulations are INDEPENDENT — x45 unions "
    "intervals by lag-telescoping over flagged starts, x50 materializes "
    "the covered-position set — so n_removed == x45.covered_tokens "
    "per doc is a cross-formulation identity (property-tested, plus a "
    "straight-Python Counter reimplementation of the whole transform). "
    "100 TB shape: a corpus REWRITE is inherently O(tokens), and the "
    "plan touches token-scale rows exactly twice — one (doc, pos)-keyed "
    "LEFT ANTI join against the covered set (itself only 8x the flagged "
    "starts, df-bounded) and one doc-keyed reassembly exchange whose "
    "per-group state is one document's kept tokens (the same bound as "
    "any per-doc text op); the gram df aggregate absorbs the zipf head "
    "with map-side distinct-per-doc partials, and the flagged-gram join "
    "reuses the checkpointed exploded projection (x19/x45's rationale). "
    "Docs shorter than 8 tokens have no gram, survive whole, and "
    "fully-duplicated docs degrade to kept_md5 = md5('') — both edges "
    "pinned by the oracle's COALESCE.",
)
def x50_span_removal(spark, sf_dir):
    from ez_cdc_spark.sources.tables import widen_partitions

    d = widen_partitions(t(spark, sf_dir, "documents").select("doc_id", "text"))
    ws = F.split(F.col("text"), r"\s+")
    tok = d.select("doc_id", ws.alias("ws"))
    grams = F.when(
        F.size("ws") >= 8,
        F.transform(
            F.sequence(F.lit(1), F.size("ws") - 7),
            lambda i: F.struct(
                i.cast("long").alias("p"),
                F.concat_ws(" ", F.slice("ws", i, 8)).alias("gram"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<p:long,gram:string>>"))
    pos = (
        tok.select("doc_id", F.explode(grams).alias("g"))
        .select("doc_id", F.col("g.p").alias("p"), F.col("g.gram").alias("gram"))
        .localCheckpoint(eager=True)
    )
    flagged = (
        pos.select("doc_id", "gram")
        .distinct()
        .groupBy("gram")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") >= 2)
        .select("gram")
    )
    hits = pos.join(flagged, "gram").select("doc_id", "p")
    cov = hits.select(
        "doc_id", F.explode(F.sequence(F.col("p"), F.col("p") + 7)).alias("pos")
    ).distinct()
    tokpos = tok.select(
        "doc_id", F.posexplode("ws").alias("idx", "tokn")
    ).select("doc_id", (F.col("idx") + 1).cast("bigint").alias("pos"), "tokn")
    kept = tokpos.join(cov, ["doc_id", "pos"], "left_anti")
    agg = kept.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_kept"),
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tokn"))),
                    lambda s: s.getField("tokn"),
                ),
            )
        ).alias("kept_md5"),
    )
    return (
        tok.select("doc_id", F.size("ws").cast("bigint").alias("n_tokens"))
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("n_tokens") - F.coalesce("n_kept", F.lit(0)))
            .cast("bigint")
            .alias("n_removed"),
            F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
            F.coalesce("kept_md5", F.md5(F.lit(""))).alias("kept_md5"),
        )
        .orderBy("doc_id")
    )


@register(
    "x7d_stratum_ksample",
    oracle="""
WITH h AS (
  SELECT doc_id, source, md5('x7d:' || CAST(doc_id AS VARCHAR)) AS hkey
  FROM documents
), r AS (
  SELECT doc_id, source, hkey,
         CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY hkey, doc_id)
              AS BIGINT) AS rk
  FROM h
)
SELECT doc_id, source, hkey, rk FROM r WHERE rk <= 12 ORDER BY doc_id
""",
    doc="X7d: deterministic fixed-k sample per stratum — the RESERVOIR-"
    "sampling analog that completes the sampling family (x7 fixed-RATE "
    "by hash threshold, x7b per-source rates, x7c upsampling; x7d = "
    "exactly min(k, n) docs per source): keep each source's k docs with "
    "the SMALLEST portable md5 priority ('x7d:'||doc_id). Because the "
    "hash is a fixed uniform permutation of doc ids, the kept set is "
    "distributed exactly as uniform k-without-replacement per stratum "
    "(Efraimidis-Spirakis with equal weights) — but with ZERO sequential "
    "state, so unlike a classical reservoir it is deterministic, "
    "engine-portable, re-runnable, and mergeable (the union's top-k = "
    "top-k of per-shard top-ks — the same mergeable-summary property as "
    "the sketch family). Priorities compare as hex strings under the "
    "f_collation byte contract. 100 TB shape: x18's skew-resistant "
    "two-phase top-k verbatim — a salt-local row_number prunes every "
    "(source, salt) to <= k rows BEFORE the per-source window, so a hot "
    "source never funnels its full row set through one task; the final "
    "window ranks <= 16k rows per source whatever the corpus. Oracle "
    "declares the single-window form (algebraically equal, x18's "
    "argument).",
)
def x7d_stratum_ksample(spark, sf_dir):
    k = 12
    d = t(spark, sf_dir, "documents").select("doc_id", "source")
    hkey = F.md5(F.concat(F.lit("x7d:"), F.col("doc_id").cast("string")))
    salt = F.pmod(F.xxhash64("doc_id"), F.lit(16))
    w_local = Window.partitionBy("source", "salt").orderBy("hkey", "doc_id")
    survivors = (
        d.withColumn("hkey", hkey)
        .withColumn("salt", salt)
        .withColumn("lrk", F.row_number().over(w_local))
        .filter(F.col("lrk") <= k)  # phase 1: <= 16k rows/source survive
        .drop("lrk", "salt")
    )
    w_final = Window.partitionBy("source").orderBy("hkey", "doc_id")
    return (
        survivors.withColumn("rk", F.row_number().over(w_final).cast("bigint"))
        .filter(F.col("rk") <= k)
        .select("doc_id", "source", "hkey", "rk")
        .orderBy("doc_id")
    )


@register(
    "x59_zipf_slope",
    oracle=r"""
WITH tok AS (
  SELECT source, unnest(regexp_split_to_array(text, '\s+')) AS w
  FROM documents
), hist AS (
  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM tok GROUP BY source, w
), r AS (
  SELECT source, cnt,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY cnt DESC, w) AS rk
  FROM hist
), terms AS (
  SELECT source,
         CAST(ROUND(ln(rk), 6) AS DECIMAL(18,6)) AS lx,
         CAST(ROUND(ln(cnt), 6) AS DECIMAL(18,6)) AS ly
  FROM r
), s AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_types,
         CAST(SUM(lx) AS DOUBLE) AS sx,
         CAST(SUM(ly) AS DOUBLE) AS sy,
         CAST(SUM(lx * ly) AS DOUBLE) AS sxy,
         CAST(SUM(lx * lx) AS DOUBLE) AS sxx
  FROM terms GROUP BY source
)
SELECT source, n_types,
       (CAST(n_types AS DOUBLE) * sxy - sx * sy)
         / (CAST(n_types AS DOUBLE) * sxx - sx * sx) AS zipf_slope,
       (sy - ((CAST(n_types AS DOUBLE) * sxy - sx * sy)
              / (CAST(n_types AS DOUBLE) * sxx - sx * sx)) * sx)
         / CAST(n_types AS DOUBLE) AS intercept
FROM s
ORDER BY source
""",
    doc="X59: per-source Zipf slope — the log-log OLS exponent of each "
    "source's token-frequency distribution (healthy natural text ≈ −1; "
    "template spam and synthetic data bend it): the tokenizer-design / "
    "corpus-health companion to x42 (coverage curve), x49 (Gini) and "
    "x35 (KL), fitting ln(freq) on ln(rank) over the vocab histogram. "
    "Determinism composes two proven recipes: each ln term is "
    "ROUND(ln,6) cast to exact DECIMAL (x34's order-free log-domain "
    "rule — products and sums stay exact decimal, so summation order "
    "cannot matter), and the OLS tail is w14's exactly-cast IEEE "
    "pipeline: the five sums cast to DOUBLE once, slope/intercept "
    "computed with pinned parenthesization — bit-identical cross-engine "
    "with no final rounding at all. Rank ties break (cnt DESC, token) "
    "under the f_collation byte contract. 100 TB shape: x49's verbatim "
    "— the corpus collapses to the (source, token) histogram in one "
    "partial-agg exchange; the rank window and the moment sums touch "
    "vocabulary rows only (Heaps-bounded), and the result is one row "
    "per source.",
)
def x59_zipf_slope(spark, sf_dir):
    from ez_cdc_spark.sources.tables import widen_partitions

    d = widen_partitions(t(spark, sf_dir, "documents").select("source", "text"))
    tok = d.select("source", F.explode(F.split("text", r"\s+")).alias("w"))
    hist = tok.groupBy("source", "w").agg(F.count("*").cast("bigint").alias("cnt"))
    wr = Window.partitionBy("source").orderBy(F.desc("cnt"), F.asc("w"))
    r = hist.select("source", "cnt", F.row_number().over(wr).alias("rk"))
    terms = r.select(
        "source",
        F.round(F.log(F.col("rk").cast("double")), 6)
        .cast("decimal(18,6)")
        .alias("lx"),
        F.round(F.log(F.col("cnt").cast("double")), 6)
        .cast("decimal(18,6)")
        .alias("ly"),
    )
    s = terms.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_types"),
        F.sum("lx").cast("double").alias("sx"),
        F.sum("ly").cast("double").alias("sy"),
        F.sum(F.col("lx") * F.col("ly")).cast("double").alias("sxy"),
        F.sum(F.col("lx") * F.col("lx")).cast("double").alias("sxx"),
    )
    nD = F.col("n_types").cast("double")
    slope = (nD * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        nD * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        "source",
        "n_types",
        slope.alias("zipf_slope"),
        ((F.col("sy") - slope * F.col("sx")) / nD).alias("intercept"),
    ).orderBy("source")


@register(
    "x62_cooccurrence_pairs",
    oracle="""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), freq AS (
  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS support FROM items GROUP BY 1
), fi AS (
  SELECT l_partkey, support FROM freq WHERE support >= 30
), ranked AS (
  SELECT i.l_orderkey, i.l_partkey,
         ROW_NUMBER() OVER (PARTITION BY i.l_orderkey
                            ORDER BY f.support DESC, i.l_partkey) AS rn
  FROM items i JOIN fi f USING (l_partkey)
), topf AS (
  SELECT l_orderkey, l_partkey FROM ranked WHERE rn <= 5
), pairs AS (
  SELECT a.l_partkey AS item_a, b.l_partkey AS item_b
  FROM topf a JOIN topf b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)
SELECT CAST(item_a AS BIGINT) AS item_a, CAST(item_b AS BIGINT) AS item_b,
       CAST(COUNT(*) AS BIGINT) AS pair_support
FROM pairs GROUP BY item_a, item_b
HAVING COUNT(*) >= 2
ORDER BY item_a, item_b
""",
    doc="X62: bounded co-occurrence (market-basket) pair mining — the "
    "item-pair explosion tamed map-side: baskets = orders, items = "
    "distinct parts per order. Support-prune first (items in >= 30 "
    "baskets — a broadcast-sized dimension after the prune), then cap "
    "each basket to its top-5 surviving items by (global support DESC, "
    "partkey ASC) so pair generation is <= C(5,2) = 10 pairs per basket "
    "REGARDLESS of basket size — the explosion is bounded before any "
    "shuffle, not filtered after. Spark shape: distinct -> item-frequency "
    "agg -> broadcast the pruned frequency dim back onto items -> ONE "
    "groupBy(basket) that sorts each basket's (−support, partkey) structs "
    "in-array, slices 5, and pair-expands via nested F.transform "
    "(i<j index windows) entirely JVM-side -> explode -> pair-count agg. "
    "No self-join on basket (the oracle's formulation) and no window "
    "row_number pass: the basket cap happens inside one aggregation's "
    "project, so the whole op is two keyed exchanges (basket, pair) plus "
    "the small frequency agg. At 100 TB: per-basket state is the basket's "
    "distinct frequent items (bounded by the prune), pair cardinality is "
    "<= 10 x baskets, and the frequency dim after support pruning is "
    "vocabulary-sized — broadcastable by construction. Tie-break parity "
    "with the oracle: array_sort over struct(-support, partkey) ascending "
    "== ROW_NUMBER ORDER BY support DESC, partkey ASC (support ties "
    "broken by partkey both sides).",
)
def x62_cooccurrence_pairs(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    freq = (
        items.groupBy("l_partkey")
        .agg(F.count("*").cast("bigint").alias("support"))
        .filter(F.col("support") >= 30)
    )
    enriched = items.join(F.broadcast(freq), "l_partkey")
    # One aggregation does cap + pair-gen: sort the basket's items by
    # (-support, partkey), keep the first 5, expand i<j pairs in-array.
    basket = enriched.groupBy("l_orderkey").agg(
        F.slice(
            F.array_sort(
                F.collect_list(F.struct((-F.col("support")).alias("ns"), F.col("l_partkey").alias("pk")))
            ),
            1,
            5,
        ).alias("top_items")
    )
    pairs = basket.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("top_items"),
                    lambda x, i: F.transform(
                        F.slice(
                            F.col("top_items"),
                            i + 2,
                            F.greatest(F.size(F.col("top_items")) - i - 1, F.lit(0)),
                        ),
                        lambda y: F.struct(
                            F.least(x["pk"], y["pk"]).alias("pa"),
                            F.greatest(x["pk"], y["pk"]).alias("pb"),
                        ),
                    ),
                )
            )
        ).alias("p")
    )
    return (
        pairs.groupBy(
            F.col("p.pa").cast("bigint").alias("item_a"),
            F.col("p.pb").cast("bigint").alias("item_b"),
        )
        .agg(F.count("*").cast("bigint").alias("pair_support"))
        .filter(F.col("pair_support") >= 2)
        .orderBy("item_a", "item_b")
    )


# BM25 query terms (x63) — embedded as literals on BOTH engine sides.
_BM25_TERMS = ["merge", "window", "filter", "scan"]


@register(
    "x63_bm25_retrieval",
    oracle=rf"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS token
  FROM documents
), dl AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id
), tots AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(dl) AS BIGINT) AS total_tokens
  FROM dl
), tf AS (
  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok WHERE token IN ('merge', 'window', 'filter', 'scan')
  GROUP BY doc_id, token
), dfq AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY token
), idf AS (
  SELECT token,
         CAST(ROUND(ln((tots.n_docs - df + 0.5) / (df + 0.5) + 1), 6)
              AS DECIMAL(18,6)) AS idf
  FROM dfq, tots
), terms AS (
  SELECT tf.doc_id,
         CAST(ROUND(
           CAST(idf.idf AS DOUBLE)
           * (CAST(22 * tots.total_tokens * tf.tf AS DOUBLE)
              / CAST(10 * tots.total_tokens * tf.tf
                     + 3 * tots.total_tokens
                     + 9 * dl.dl * tots.n_docs AS DOUBLE)), 12)
           AS DECIMAL(24,12)) AS term_score
  FROM tf
  JOIN idf USING (token)
  JOIN dl USING (doc_id)
  CROSS JOIN tots
)
SELECT t.doc_id, d.dl,
       CAST(COUNT(*) AS BIGINT) AS n_terms,
       CAST(SUM(t.term_score) AS DOUBLE) AS bm25
FROM terms t JOIN dl d USING (doc_id)
GROUP BY t.doc_id, d.dl
ORDER BY t.doc_id
""",
    doc="X63: BM25 ranked retrieval scoring (Robertson-Sparck Jones / "
    "Lucene-variant idf, k1=1.2, b=0.75) over the documents table for a "
    "fixed 4-term query — the retrieval-side text op completing the "
    "LM-scoring family (x34 unigram logprob = generative quality, x35 "
    "KL = source drift, x63 = query relevance). Determinism composes the "
    "proven recipes: idf = ROUND(ln((N-df+0.5)/(df+0.5)+1), 6) as exact "
    "DECIMAL (x34's ln recipe; margin-guard property test), the tf "
    "saturation factor cleared of floats entirely — with k1=6/5, b=3/4 "
    "rational, tf(k1+1)/(tf + k1(1-b+b*dl*N/A)) scales by 10A/10A to "
    "(22*A*tf)/(10*A*tf + 3*A + 9*dl*N), all exact BIGINTs — so each "
    "term score is ONE decimal-to-double cast times ONE IEEE division of "
    "exact ints, ROUND(,12) to DECIMAL(24,12), summed EXACTLY (order-"
    "free; float sum order would diverge cross-engine — x35's shape). "
    "At 100 TB: the query-term tf table is corpus-filtered map-side "
    "(token IN (...) before any shuffle), df/idf is 4 rows broadcast, "
    "doc lengths partial-aggregate into one doc-keyed exchange; the "
    "full-corpus term explode never shuffles on token. At larger A the "
    "integer factors move to DECIMAL(38,0) headroom (documented; "
    "2^53 bounds checked in the property test).",
)
def x63_bm25_retrieval(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split(F.col("text"), r"\s+")).alias("token"))
    dl = tok.groupBy("doc_id").agg(F.count("*").cast("bigint").alias("dl"))
    tots = dl.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("total_tokens"),
    )
    tf = (
        tok.filter(F.col("token").isin(_BM25_TERMS))
        .groupBy("doc_id", "token")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )
    dfq = tf.groupBy("token").agg(F.count("*").cast("bigint").alias("df"))
    idf = dfq.join(F.broadcast(tots)).select(
        "token",
        F.round(
            F.log(
                (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
                + F.lit(1)
            ),
            6,
        )
        .cast("decimal(18,6)")
        .alias("idf"),
    )
    terms = (
        tf.join(F.broadcast(idf), "token")
        .join(dl, "doc_id")
        .join(F.broadcast(tots))
        .select(
            "doc_id",
            F.round(
                F.col("idf").cast("double")
                * (
                    (F.lit(22) * F.col("total_tokens") * F.col("tf")).cast("double")
                    / (
                        F.lit(10) * F.col("total_tokens") * F.col("tf")
                        + F.lit(3) * F.col("total_tokens")
                        + F.lit(9) * F.col("dl") * F.col("n_docs")
                    ).cast("double")
                ),
                12,
            )
            .cast("decimal(24,12)")
            .alias("term_score"),
        )
    )
    return (
        terms.groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_terms"),
            F.sum("term_score").alias("score_dec"),
        )
        .join(dl, "doc_id")
        .select(
            "doc_id",
            "dl",
            "n_terms",
            F.col("score_dec").cast("double").alias("bm25"),
        )
        .orderBy("doc_id")
    )
