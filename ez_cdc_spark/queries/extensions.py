"""Extension operators X1-X6 + training-data-pipeline ops (SURVEY.md §2b
north star): dedup family, similarity search, text analysis, multimodal
columns, embedding ops.
"""

from __future__ import annotations

import os

from pyspark.sql import Window
from pyspark.sql import functions as F

from ez_cdc_spark.functions import text as TXT
from ez_cdc_spark.functions.similarity import (
    blocked_topk,
    brute_force_topk,
    centroids,
    dot,
    ivf_topk,
    neardup_pairs,
    norm,
)
from ez_cdc_spark.operators.dedup import (
    connected_components,
    exact_dedup_groups,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_near_dups,
)
from ez_cdc_spark.operators.multimodal import (
    attach_bmp_payload,
    attach_payload,
    extract_features,
    resize_payloads,
    sample_frames,
)
from ez_cdc_spark.sources.tables import widen_partitions
from ez_cdc_spark.queries import register
from ez_cdc_spark.queries._util import t

_STOP_SQL = "['" + "','".join(TXT.STOPWORDS) + "']"

# x11 and x24 both need connected components over the identical x2 candidate
# pair set (jaccard >= 0.5); pair-gen dominates both (r5 verdict #4). The
# components are computed ONCE per (application, corpus path) and pinned with
# localCheckpoint — the retained blocks are slim (id, cluster_id) rows, far
# smaller than the corpus. Keyed by applicationId so a fresh driver session
# never sees another session's checkpoint; keyed by sf_dir so tests running
# multiple fixtures in one session stay isolated; keyed by a corpus file
# FINGERPRINT (mtime_ns + size of the documents parquet footprint) so a
# fixture regenerated mid-session — which the test driver has done between
# rounds — can never be served stale clusters (r6 ADVICE). Superseded
# entries for the same (application, sf_dir) are unpersisted on insert, so
# the pinned blocks don't accumulate. x2/x2f intentionally do NOT use this:
# x2 IS the pair-gen operator, so its bench timing must keep measuring
# pair-gen.
_NEARDUP_CC_CACHE: dict[tuple[str, str, tuple], "DataFrame"] = {}


def _corpus_fingerprint(sf_dir, table: str = "documents") -> tuple:
    """(mtime_ns, size) across the table's parquet file(s) — a cheap
    driver-side stat, no data read."""
    p = os.path.join(str(sf_dir), f"{table}.parquet")
    paths = (
        [os.path.join(p, f) for f in sorted(os.listdir(p)) if f.endswith(".parquet")]
        if os.path.isdir(p)
        else [p]
    )
    return tuple((os.stat(f).st_mtime_ns, os.stat(f).st_size) for f in paths)


_NEARDUP_PAIRS_CACHE: dict[tuple[str, str, tuple], "DataFrame"] = {}

_SHINGLE_SETS_CACHE: dict[tuple[str, str, tuple], "DataFrame"] = {}


def _shared_shingle_sets(spark, sf_dir):
    """The shared dedup unit (r11 verdict #4): the distinct word 3-gram
    shingle-SET table (doc_id, ss, n) both dedup families consume — the
    x2 MinHash family hashes it per permutation slot, the x61 exact prefix
    filter orders it rarest-first — memoized + localCheckpointed with the
    same key discipline as the pair/CC caches, so the split→shingle→
    distinct projection (the dominant per-row cost of either family, ~5 s
    at sf0.1) is paid ONCE per session across both. Representation
    equality (hash(shared ss) == the x2 family's own shingle hashes, per
    doc, as sets) is pinned in tests/test_properties.py."""
    from ez_cdc_spark.operators.dedup import shingle_sets

    key = (spark.sparkContext.applicationId, str(sf_dir), _corpus_fingerprint(sf_dir))
    sets_df = _SHINGLE_SETS_CACHE.get(key)
    if sets_df is None:
        for stale in [k for k in _SHINGLE_SETS_CACHE if k[:2] == key[:2]]:
            try:
                _SHINGLE_SETS_CACHE.pop(stale).unpersist()
            except Exception:
                pass  # releasing superseded checkpoint blocks is best-effort
        sets_df = shingle_sets(t(spark, sf_dir, "documents")).localCheckpoint(eager=True)
        _SHINGLE_SETS_CACHE[key] = sets_df
    return sets_df


_PROBE_TABLES_CACHE: dict[tuple[str, str, tuple], tuple] = {}


def _shared_probe_tables(spark, sf_dir):
    """The LSH probe family's shared session state (x64 contamination,
    x65 removal): the hashed shingle table AND its banded index
    (doc_id, band_id, band_sig), both checkpointed once — the in-session
    stand-in for the stored band table an index maintainer (x57) keeps on
    disk, so each additional probe query pays only its band join + verify,
    never the 64-permutation minhash again. Same cache-key discipline as
    the pair/CC caches."""
    from ez_cdc_spark.operators.dedup import band_rows, portable_hash32

    key = (spark.sparkContext.applicationId, str(sf_dir), _corpus_fingerprint(sf_dir))
    hit = _PROBE_TABLES_CACHE.get(key)
    if hit is None:
        for stale in [k for k in _PROBE_TABLES_CACHE if k[:2] == key[:2]]:
            for df in _PROBE_TABLES_CACHE.pop(stale):
                try:
                    df.unpersist()
                except Exception:
                    pass  # releasing superseded checkpoint blocks is best-effort
        h = portable_hash32  # by-value bind (worker-closure convention)
        shingled = (
            _shared_shingle_sets(spark, sf_dir)
            .select(
                "doc_id",
                F.array_distinct(F.transform("ss", lambda s: h(s))).alias("shingles"),
            )
            .localCheckpoint(eager=True)
        )
        banded = band_rows(shingled).localCheckpoint(eager=True)
        hit = (shingled, banded)
        _PROBE_TABLES_CACHE[key] = hit
    return hit


def _shared_neardup_pairs(spark, sf_dir):
    """The x2 candidate pair set (jaccard >= 0.5), memoized and pinned with
    the same key discipline as the CC cache — pair-gen is the dominant
    cost, and x11 (CC), x24 (election), x36 (cluster split), and x37
    (centrality) all consume the identical set. Pinned rows are slim
    (id_a, id_b, jaccard) triples. Built over the shared shingle-set table
    (dropping zero-shingle docs changes nothing here: an empty set's
    jaccard is NULL against anything, which the >= 0.5 gate already
    drops), so its one-time cost is shared with x61."""
    key = (spark.sparkContext.applicationId, str(sf_dir), _corpus_fingerprint(sf_dir))
    pairs = _NEARDUP_PAIRS_CACHE.get(key)
    if pairs is None:
        for stale in [k for k in _NEARDUP_PAIRS_CACHE if k[:2] == key[:2]]:
            try:
                _NEARDUP_PAIRS_CACHE.pop(stale).unpersist()
            except Exception:
                pass  # releasing superseded checkpoint blocks is best-effort
        pairs = (
            minhash_lsh_candidates(
                None, portable=True, sets_df=_shared_shingle_sets(spark, sf_dir)
            )
            .filter(F.col("jaccard") >= 0.5)
            .localCheckpoint(eager=True)
        )
        _NEARDUP_PAIRS_CACHE[key] = pairs
    return pairs


def _shared_neardup_cc(spark, sf_dir):
    key = (spark.sparkContext.applicationId, str(sf_dir), _corpus_fingerprint(sf_dir))
    cc = _NEARDUP_CC_CACHE.get(key)
    if cc is None:
        for stale in [k for k in _NEARDUP_CC_CACHE if k[:2] == key[:2]]:
            try:
                _NEARDUP_CC_CACHE.pop(stale).unpersist()
            except Exception:
                pass  # releasing superseded checkpoint blocks is best-effort
        pairs = _shared_neardup_pairs(spark, sf_dir)
        cc = connected_components(pairs).localCheckpoint(eager=True)
        _NEARDUP_CC_CACHE[key] = cc
    return cc


def _x2_pair_ctes(num_hashes: int = 64, bands: int = 16) -> str:
    """DuckDB CTE chain mirroring minhash_lsh_candidates(portable=True),
    ending in ``pairs(id_a, id_b, jaccard)`` — shared by the x2 oracle and
    the downstream cluster/incremental-dedup oracles (x11, x2f) so every
    consumer reproduces the IDENTICAL candidate set.

    Exact-parity rules: the permutation constants come from the SAME
    perm_coeff_ints the Spark side uses (embedded as literals); shingle
    hashes are deduped RAW (before mod P), exactly like shingle_hashes'
    array_distinct; the signature perms run on pmod(h, P) like
    minhash_signature; jaccard is over the raw hash sets; candidates are
    any-band-equal over rows-per-band slices.
    """
    from ez_cdc_spark.operators.dedup import _P, perm_coeff_ints

    rows = num_hashes // bands
    terms = ",\n    ".join(
        f"list_min(list_transform(hp, h -> ({a} * h + {b}) % {_P}))"
        for a, b in (perm_coeff_ints(j) for j in range(num_hashes))
    )
    band_eq = (
        f"list_contains(list_transform(generate_series(0, {bands - 1}), "
        f"k -> a.sig[k*{rows}+1 : k*{rows}+{rows}] = b.sig[k*{rows}+1 : k*{rows}+{rows}]), "
        "true)"
    )
    return rf"""w AS (
  SELECT doc_id, regexp_split_to_array(text, '\s+') AS ws FROM documents
), g AS (
  SELECT doc_id,
         CASE WHEN len(ws) >= 3 THEN list_transform(
                generate_series(1, len(ws) - 2),
                i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
              ELSE CAST([] AS VARCHAR[]) END AS grams
  FROM w
), h AS (
  SELECT doc_id,
         list_distinct(list_transform(grams,
             s -> CAST('0x' || substr(md5(s), 1, 8) AS BIGINT))) AS hs
  FROM g
), s AS (
  SELECT doc_id, hs,
    [{terms}] AS sig
  FROM (SELECT doc_id, hs, list_transform(hs, x -> x % {_P}) AS hp FROM h)
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         ROUND(CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE)
               / (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs))), 4) AS jaccard
  FROM s a JOIN s b ON a.doc_id < b.doc_id
  WHERE {band_eq}
)"""


def _x2_oracle_sql(num_hashes: int = 64, bands: int = 16) -> str:
    return (
        "WITH "
        + _x2_pair_ctes(num_hashes, bands)
        + "\nSELECT id_a, id_b, jaccard FROM pairs ORDER BY id_a, id_b\n"
    )


@register(
    "x1_exact_dedup",
    oracle="""
SELECT md5(text) AS text_hash,
       CAST(MIN(doc_id) AS BIGINT) AS canonical_id,
       CAST(COUNT(*) AS BIGINT) AS n_copies
FROM documents
GROUP BY md5(text)
ORDER BY text_hash
""",
    doc="X1: exact dedup via content-hash groupBy (canonical id = min).",
)
def x1_exact_dedup(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return exact_dedup_groups(d).orderBy("text_hash")


@register(
    "x2_minhash_lsh",
    oracle=_x2_oracle_sql(),
    doc="X2: MinHash+LSH banding near-dup candidates with exact-Jaccard "
    "verify — portable md5-derived shingle hashes so the DuckDB oracle "
    "reproduces the EXACT candidate set: same 64 affine permutations "
    "(identical literal constants, generated from one source), same "
    "16-band any-band-equal rule, same jaccard over the raw hash sets.",
)
def x2_minhash_lsh(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return minhash_lsh_candidates(d, portable=True).orderBy("id_a", "id_b")


@register(
    "x2b_ngram_jaccard",
    oracle=rf"""
WITH toks AS (
  SELECT doc_id, list_distinct(regexp_split_to_array(text, '\s+')) AS ws
  FROM documents WHERE doc_id < 100
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       ROUND(CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE)
             / (len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws))), 4) AS jaccard
FROM toks a JOIN toks b ON a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE)
      / (len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws))) >= 0.2
ORDER BY id_a, id_b
""",
    doc="X: exact token-set (1-gram) Jaccard pairs over a bounded slice ↔ DuckDB list ops.",
)
def x2b_ngram_jaccard(spark, sf_dir):
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return ngram_jaccard_pairs(d, n=1, threshold=0.2).orderBy("id_a", "id_b")


@register(
    "x11_neardup_clusters",
    oracle="WITH RECURSIVE "
    + _x2_pair_ctes()
    + r""",
e AS (
  SELECT id_a AS src, id_b AS dst FROM pairs WHERE jaccard >= 0.5
  UNION
  SELECT id_b, id_a FROM pairs WHERE jaccard >= 0.5
), n AS (SELECT DISTINCT src AS id FROM e),
walk(id, lbl) AS (
  SELECT id, id FROM n
  UNION
  SELECT e.dst, walk.lbl FROM walk JOIN e ON e.src = walk.id
), cc AS (SELECT id, MIN(lbl) AS lbl FROM walk GROUP BY id)
SELECT CAST(id AS BIGINT) AS doc_id, CAST(lbl AS BIGINT) AS cluster_id,
       CAST(COUNT(*) OVER (PARTITION BY lbl) AS BIGINT) AS cluster_size
FROM cc ORDER BY doc_id
""",
    doc="X11: fuzzy-dedup cluster assignment — connected components over the "
    "x2 MinHash-LSH candidate pairs (jaccard >= 0.5), the step that turns "
    "pairwise near-dup evidence into keep-one-per-cluster decisions. "
    "Spark side: distributed min-label propagation (operators/dedup.py: "
    "connected_components) — O(cluster diameter) iterations of join + "
    "groupBy.min, nothing driver-side but the convergence counter. Oracle: "
    "recursive CTE over the SAME pair CTEs as x2, so the edge set is "
    "literally identical. cluster_id = min doc_id in the component.",
)
def x11_neardup_clusters(spark, sf_dir):
    cc = _shared_neardup_cc(spark, sf_dir)
    w = Window.partitionBy("cluster_id")
    return (
        cc.select(
            F.col("id").cast("bigint").alias("doc_id"),
            F.col("cluster_id").cast("bigint").alias("cluster_id"),
        )
        .withColumn("cluster_size", F.count("*").over(w).cast("bigint"))
        .orderBy("doc_id")
    )


@register(
    "x2f_incremental_dedup",
    oracle="WITH "
    + _x2_pair_ctes()
    + r""",
exact AS (
  SELECT n.doc_id, MIN(c.doc_id) AS exact_id
  FROM documents n JOIN documents c ON md5(n.text) = md5(c.text)
  WHERE n.doc_id % 5 = 0 AND c.doc_id % 5 <> 0
  GROUP BY n.doc_id
), near AS (
  SELECT CASE WHEN id_a % 5 = 0 THEN id_a ELSE id_b END AS doc_id,
         MIN(CASE WHEN id_a % 5 = 0 THEN id_b ELSE id_a END) AS near_id
  FROM pairs
  WHERE jaccard >= 0.5 AND ((id_a % 5 = 0) <> (id_b % 5 = 0))
  GROUP BY 1
)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       CASE WHEN e.exact_id IS NOT NULL THEN 'exact_dup'
            WHEN nr.near_id IS NOT NULL THEN 'near_dup'
            ELSE 'kept' END AS status,
       CAST(COALESCE(e.exact_id, nr.near_id, -1) AS BIGINT) AS match_id
FROM documents d
LEFT JOIN exact e ON e.doc_id = d.doc_id
LEFT JOIN near nr ON nr.doc_id = d.doc_id
WHERE d.doc_id % 5 = 0
ORDER BY d.doc_id
""",
    doc="X2f: incremental (daily-ingest) dedup — a 'new' batch (doc_id % 5 "
    "== 0, a scale-independent 20% slice) deduped AGAINST the existing "
    "corpus: exact via content-hash anti-lookup (min corpus doc per md5), "
    "near via the x2 LSH candidate pairs that cross the batch/corpus "
    "split (jaccard >= 0.5, min corpus match). Status priority exact > "
    "near > kept; match_id -1 when kept (no NULLs in driver output). "
    "Within-batch duplicates are deliberately NOT collapsed here — that "
    "is x1/x11's job; this op answers 'is it already in the corpus'. At "
    "100 TB the corpus band signatures are computed once and stored; each "
    "batch computes only its own signatures and joins — the same plan "
    "shape as here with the corpus side read from its signature index.",
)
def x2f_incremental_dedup(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    is_new = (F.col("doc_id") % 5) == 0
    new = d.filter(is_new)
    corpus = d.filter(~is_new)
    corpus_hash = corpus.groupBy(F.md5(F.col("text")).alias("h")).agg(
        F.min("doc_id").alias("exact_id")
    )
    exact = (
        new.select("doc_id", F.md5(F.col("text")).alias("h"))
        .join(corpus_hash, "h", "left")
        .select("doc_id", "exact_id")
    )
    pairs = minhash_lsh_candidates(d, portable=True).filter(F.col("jaccard") >= 0.5)
    a_new = ((F.col("id_a") % 5) == 0) & ((F.col("id_b") % 5) != 0)
    b_new = ((F.col("id_b") % 5) == 0) & ((F.col("id_a") % 5) != 0)
    cross = pairs.select(
        F.when(a_new, F.col("id_a")).when(b_new, F.col("id_b")).alias("doc_id"),
        F.when(a_new, F.col("id_b")).when(b_new, F.col("id_a")).alias("corp"),
    ).filter(F.col("doc_id").isNotNull())
    near = cross.groupBy("doc_id").agg(F.min("corp").alias("near_id"))
    out = exact.join(near, "doc_id", "left")
    status = (
        F.when(F.col("exact_id").isNotNull(), F.lit("exact_dup"))
        .when(F.col("near_id").isNotNull(), F.lit("near_dup"))
        .otherwise(F.lit("kept"))
    )
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        status.alias("status"),
        F.coalesce("exact_id", "near_id", F.lit(-1)).cast("bigint").alias("match_id"),
    ).orderBy("doc_id")


# DuckDB mirror of simhash(portable=True): per bit i, sign of sum(+1/-1)
# over token-hash bit i — unrolled exactly like the Spark column expression.
from ez_cdc_spark.operators.dedup import simhash_sql_bit_terms

_X2C_BIT_TERMS = simhash_sql_bit_terms(32, "hs")

@register(
    "x2c_simhash",
    oracle=rf"""
WITH tok AS (
  SELECT doc_id,
         list_transform(regexp_split_to_array(text, '\s+'),
                        w -> CAST('0x' || substr(md5(w), 1, 8) AS BIGINT)) AS hs
  FROM documents
), sh AS (
  SELECT doc_id, {_X2C_BIT_TERMS} AS sh FROM tok
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sh, b.sh)) <= 3
ORDER BY id_a, id_b
""",
    doc="X: SimHash near-dup pairs via pigeonhole chunk blocking (no cross "
    "join; lossless for max_hamming < blocks, so it equals the oracle's "
    "all-pairs answer). Portable md5-derived token hash so DuckDB "
    "reproduces the fingerprint bit-for-bit.",
)
def x2c_simhash(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return simhash_near_dups(d, max_hamming=3, portable=True).orderBy("id_a", "id_b")


@register(
    "x2d_embedding_neardup",
    oracle="""
WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_cosine_similarity(a.v, b.v), 4) AS score
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.v, b.v) >= 0.4
ORDER BY id_a, id_b
""",
    doc="X2d: embedding-cosine near-dup pairs (exact blocked-GEMM, threshold on "
    "unrounded score) ↔ DuckDB list_cosine_similarity self-join.",
)
def x2d_embedding_neardup(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    return neardup_pairs(e, threshold=0.4).orderBy("id_a", "id_b")


@register(
    "x2e_lsh_embedding_neardup",
    oracle=None,  # approximate by construction — recall-tested vs exact x2d
    doc="X2e: random-hyperplane LSH buckets with IN-BUCKET exact-cosine "
    "verify (one numpy GEMM per (band, sig) bucket; only above-threshold "
    "pairs ever materialize) — the extreme-scale approximate path behind "
    "exact x2d; no false positives, recall pinned by "
    "tests/test_scale_ops.py.",
)
def x2e_lsh_embedding_neardup(spark, sf_dir):
    from ez_cdc_spark.functions.similarity import lsh_neardup_pairs

    # fixture embeddings peak near cosine 0.5, so the near-dup threshold is
    # 0.4 here; 64 bits / 16 bands (4 sign bits per band) shows genuine
    # pruning while holding recall 0.983 on the seeded fixture
    e = t(spark, sf_dir, "embeddings")
    return lsh_neardup_pairs(e, threshold=0.4, n_bits=64, bands=16).orderBy(
        "id_a", "id_b"
    )


_COS_ORACLE = """
WITH q AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings WHERE vec_id < 10),
     c AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
     scored AS (
       SELECT q.vec_id AS q_id, c.vec_id AS c_id,
              ROUND(list_cosine_similarity(q.v, c.v), 4) AS score
       FROM q JOIN c ON q.vec_id <> c.vec_id),
     ranked AS (
       SELECT q_id, c_id, score,
              row_number() OVER (PARTITION BY q_id ORDER BY score DESC, c_id) AS rn
       FROM scored)
SELECT q_id, c_id, score FROM ranked WHERE rn <= 5
ORDER BY q_id, c_id
"""


@register(
    "x3_cosine_topk",
    oracle=_COS_ORACLE,
    doc="X3: exact cosine top-5 (brute force, JVM higher-order fns) ↔ DuckDB list_cosine_similarity.",
)
def x3_cosine_topk(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    return brute_force_topk(q, e, k=5).orderBy("q_id", "c_id")


@register(
    "x3d_quantized_topk",
    oracle="""
WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
     m AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS mx FROM v),
     qq AS (SELECT vec_id,
              CASE WHEN mx > 0
                   THEN list_transform(v, x -> CAST(floor(x * (127.0 / mx) + 0.5) AS BIGINT))
                   ELSE list_transform(v, x -> CAST(0 AS BIGINT)) END AS q
            FROM m),
     n AS (SELECT vec_id, q,
             CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS nsq
           FROM qq),
     scored AS (
       SELECT a.vec_id AS q_id, b.vec_id AS c_id,
              ROUND(CASE WHEN a.nsq > 0 AND b.nsq > 0 THEN
                  CAST(list_sum(list_transform(generate_series(1, len(a.q)),
                                               i -> a.q[i] * b.q[i])) AS DOUBLE)
                  / sqrt(CAST(a.nsq * b.nsq AS DOUBLE))
                ELSE 0 END, 4) AS score
       FROM n a JOIN n b ON a.vec_id < 10 AND b.vec_id <> a.vec_id),
     ranked AS (
       SELECT q_id, c_id, score,
              row_number() OVER (PARTITION BY q_id ORDER BY score DESC, c_id) AS rn
       FROM scored)
SELECT q_id, c_id, score FROM ranked WHERE rn <= 5
ORDER BY q_id, c_id
""",
    doc="X3d: top-k search over int8-QUANTIZED vectors — the serving path "
    "after x6d's storage quantization (4x smaller corpus in memory, "
    "integer dot products). The per-vector scale cancels in cosine, so "
    "the score is computed purely from the quantized ints: dot(qa,qb) / "
    "sqrt(|qa|^2 * |qb|^2) — exact integer arithmetic on both engines up "
    "to one final IEEE division/sqrt, hence hash-checkable (unlike "
    "float-accumulation paths). Same brute-force shape as x3 (broadcast "
    "query block x corpus, per-query window top-5, ties by corpus id); "
    "the x3b blocked-GEMM / x3c IVF scale paths apply unchanged on the "
    "int8 column.",
)
def x3d_quantized_topk(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = e.select("vec_id", v.alias("v")).select(
        "vec_id", "v", F.array_max(F.transform(F.col("v"), F.abs)).alias("mx")
    )
    s = F.lit(127.0) / F.col("mx")
    qarr = F.when(
        F.col("mx") > 0,
        F.transform(F.col("v"), lambda x: F.floor(x * s + 0.5).cast("long")),
    ).otherwise(F.transform(F.col("v"), lambda x: F.lit(0).cast("long")))
    qd = base.select("vec_id", qarr.alias("q")).withColumn(
        "nsq",
        F.aggregate(F.col("q"), F.lit(0).cast("long"), lambda acc, x: acc + x * x),
    )
    qblock = qd.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("q").alias("qv"), F.col("nsq").alias("nq")
    )
    corpus = qd.select(
        F.col("vec_id").alias("c_id"), F.col("q").alias("cv"), F.col("nsq").alias("nc")
    )
    dot = F.aggregate(
        F.zip_with(F.col("qv"), F.col("cv"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    score = F.round(
        F.when(
            (F.col("nq") > 0) & (F.col("nc") > 0),
            dot.cast("double") / F.sqrt((F.col("nq") * F.col("nc")).cast("double")),
        ).otherwise(0.0),
        4,
    )
    scored = (
        F.broadcast(qblock)
        .crossJoin(corpus)
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id", score.alias("score"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("c_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .drop("rn")
        .orderBy("q_id", "c_id")
    )


@register(
    "x3b_blocked_topk",
    oracle=_COS_ORACLE,
    doc="X3 scale path: numpy GEMM per Arrow batch (mapInPandas) + per-query top-k window; same oracle as x3.",
)
def x3b_blocked_topk(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    return blocked_topk(q, e, k=5).orderBy("q_id", "c_id")


@register(
    "x4_word_count",
    oracle=r"""
SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS n
FROM (SELECT unnest(regexp_split_to_array(text, '\s+')) AS w FROM documents)
GROUP BY w
ORDER BY n DESC, word
LIMIT 20
""",
    doc="X4: corpus word-count top-20 (explode → count → top-k, tie-broken by word).",
)
def x4_word_count(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(TXT.words(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(20)
    )


@register(
    "x4b_text_metrics",
    oracle=rf"""
SELECT doc_id,
       CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_tokens,
       CAST(len(str_split_regex(text, '[^a-zA-Z0-9]+')) AS BIGINT) AS n_regex_tokens,
       ROUND(CAST(len(list_filter(regexp_split_to_array(text, '\s+'), w -> list_contains({_STOP_SQL}, lower(w)))) AS DOUBLE)
             / len(regexp_split_to_array(text, '\s+')), 6) AS stop_ratio,
       ROUND(CAST(len(list_distinct(regexp_split_to_array(text, '\s+'))) AS DOUBLE)
             / len(regexp_split_to_array(text, '\s+')), 6) AS uniq_ratio,
       ROUND(CAST(list_sum(list_transform(regexp_split_to_array(text, '\s+'), w -> length(w))) AS DOUBLE)
             / len(regexp_split_to_array(text, '\s+')), 6) AS avg_word_len,
       md5(array_to_string(list_sort(list_distinct(regexp_split_to_array(text, '\s+'))), ' ')) AS fingerprint
FROM documents
ORDER BY doc_id
""",
    doc="X4: per-doc quality metrics (token counts, stopword/uniq ratios, fingerprint).",
)
def x4b_text_metrics(spark, sf_dir):
    d = widen_partitions(t(spark, sf_dir, "documents"))
    txt = F.col("text")
    # text is space-separated ASCII words: whitespace tokens == regex tokens
    # except the regex form also handles punctuation/multispace
    return d.select(
        "doc_id",
        TXT.token_count(txt).cast("bigint").alias("n_tokens"),
        TXT.regex_token_count(txt).cast("bigint").alias("n_regex_tokens"),
        F.round(TXT.stopword_ratio(txt), 6).alias("stop_ratio"),
        F.round(TXT.uniq_ratio(txt), 6).alias("uniq_ratio"),
        F.round(TXT.avg_word_len(txt), 6).alias("avg_word_len"),
        TXT.fingerprint(txt).alias("fingerprint"),
    ).orderBy("doc_id")


@register(
    "x4d_tfidf",
    oracle=r"""
WITH toks AS (SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS word FROM documents),
     tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM toks GROUP BY doc_id, word),
     dfreq AS (SELECT word, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY word),
     n AS (SELECT COUNT(*) AS n FROM documents),
     scored AS (
       SELECT t.doc_id, t.word,
              ROUND(t.tf * (ln((n.n + 1.0) / (d.df + 1.0)) + 1), 6) AS tfidf
       FROM tf t, dfreq d, n WHERE t.word = d.word AND t.doc_id < 50),
     ranked AS (
       SELECT doc_id, word, tfidf,
              row_number() OVER (PARTITION BY doc_id
                                 ORDER BY tfidf DESC, word) AS rn
       FROM scored)
SELECT doc_id, word, tfidf FROM ranked WHERE rn <= 5
ORDER BY doc_id, word
""",
    doc="X4: TF-IDF (smooth idf) over the full corpus, top-5 terms per doc "
    "for a bounded output slice. Pure DataFrame ops: explode → two "
    "aggregations → join → window; ranking on the ROUND(,6) score so both "
    "engines break ties identically. r9: the corpus size N is folded into "
    "the plan as a 1-row count aggregate broadcast cross-join (the x22/x42 "
    "pattern) — the previous driver-side d.count() was the last eager "
    "action in a registered batch query (r8 verdict #4), costing an extra "
    "full scan + driver round-trip per run.",
)
def x4d_tfidf(spark, sf_dir):
    from pyspark.sql import Window

    d = widen_partitions(t(spark, sf_dir, "documents"))
    toks = d.select("doc_id", F.explode(TXT.words(F.col("text"))).alias("word"))
    tf = toks.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    dfreq = (
        toks.select("doc_id", "word")
        .distinct()
        .groupBy("word")
        .agg(F.count("*").alias("df"))
    )
    n1 = d.agg(F.count("*").alias("n"))  # 1 row; broadcast below, no action
    scored = (
        tf.filter(F.col("doc_id") < 50)
        .join(dfreq, "word")
        .crossJoin(F.broadcast(n1))
        .select(
            "doc_id",
            "word",
            F.round(
                F.col("tf") * (F.log((F.col("n") + 1.0) / (F.col("df") + 1.0)) + 1), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("word"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .drop("rn")
        .orderBy("doc_id", "word")
    )


@register(
    "x4e_rolling_fingerprint",
    oracle=r"""
SELECT doc_id,
       list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_transform(regexp_split_to_array(text, '\s+'),
                                  w -> CAST(ascii(w[1:1]) * 131 + length(w) AS BIGINT))),
                   (a, b) -> (a * 31 + b) % 2147483647) AS roll_hash
FROM documents
ORDER BY doc_id
""",
    doc="X4: order-sensitive Rabin-Karp rolling hash over the token stream "
    "(fold in JVM higher-order fns, 31-bit Mersenne modulus keeps the "
    "arithmetic ANSI-safe) ↔ DuckDB list_reduce with the same formula.",
)
def x4e_rolling_fingerprint(spark, sf_dir):
    d = widen_partitions(t(spark, sf_dir, "documents"))
    return d.select(
        "doc_id", TXT.rolling_fingerprint(F.col("text")).alias("roll_hash")
    ).orderBy("doc_id")


@register(
    "x4c_lang_quality",
    oracle=r"""
WITH w AS (
  SELECT doc_id, lang, text,
         regexp_split_to_array(text, '\s+') AS ws,
         list_transform(regexp_split_to_array(text, '\s+'), x -> lower(x)) AS wl
  FROM documents
), h AS (
  SELECT doc_id, lang, text, ws, wl,
         len(list_filter(wl, x -> list_contains(['der','die','das','und','ist'], x))) AS h_de,
         len(list_filter(wl, x -> list_contains(['the','of','and','a','to'], x))) AS h_en,
         len(list_filter(wl, x -> list_contains(['el','la','los','y','es'], x))) AS h_es,
         len(list_filter(wl, x -> list_contains(['le','la','les','et','est'], x))) AS h_fr,
         len(list_filter(wl, x -> list_contains(['de','shi','le','he','zai'], x))) AS h_zh
  FROM w
)
SELECT doc_id, lang,
       CASE WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr AND h_de >= h_zh THEN 'de'
            WHEN h_en >= h_es AND h_en >= h_fr AND h_en >= h_zh THEN 'en'
            WHEN h_es >= h_fr AND h_es >= h_zh THEN 'es'
            WHEN h_fr >= h_zh THEN 'fr'
            ELSE 'zh' END AS lang_guess,
       ROUND(0.4 * least(length(text) / 400.0, 1.0)
             + 0.3 * (len(list_distinct(ws)) / CAST(len(ws) AS DOUBLE))
             + 0.3 * (1 - len(list_filter(wl, x -> list_contains(
                   ['the','a','of','and','to','in','is','it'], x)))
                 / CAST(len(ws) AS DOUBLE)), 6) AS quality
FROM h
ORDER BY doc_id
""",
    doc="X4: heuristic language ID (marker-hit argmax, alphabetical "
    "tie-break — the CASE cascade realizes sort-by-(-hits,lang)) + "
    "composite quality score, same IEEE double expression shape on both "
    "engines so ROUND(,6) agrees bit-for-bit.",
)
def x4c_lang_quality(spark, sf_dir):
    d = widen_partitions(t(spark, sf_dir, "documents"))
    txt = F.col("text")
    return d.select(
        "doc_id",
        "lang",
        TXT.lang_id(txt).alias("lang_guess"),
        TXT.quality_score(txt).alias("quality"),
    ).orderBy("doc_id")


@register(
    "x5_multimodal",
    oracle="""
SELECT d.doc_id,
       'text/plain' AS media_type,
       CAST(octet_length(encode(d.text)) AS BIGINT) AS n_bytes,
       CAST(ascii(substr(d.text, 1, 1)) AS INT) AS first_byte,
       CAST(ascii(substr(d.text, length(d.text), 1)) AS INT) AS last_byte,
       e.label,
       CAST(len(e.embedding) AS BIGINT) AS dim
FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
ORDER BY d.doc_id
""",
    doc="X5: binary payload + typed metadata, mapInPandas feature extraction, doc⋈embedding join.",
)
def x5_multimodal(spark, sf_dir):
    d = attach_payload(t(spark, sf_dir, "documents"))
    e = t(spark, sf_dir, "embeddings")
    feats = extract_features(d)
    return (
        d.join(feats, "doc_id")
        .join(e, d.doc_id == e.vec_id)
        .select(
            "doc_id",
            F.col("media_meta.media_type").alias("media_type"),
            F.col("n_bytes").cast("bigint"),
            "first_byte",
            "last_byte",
            "label",
            F.size("embedding").cast("bigint").alias("dim"),
        )
        .orderBy("doc_id")
    )


@register(
    "x5b_resize",
    oracle="""
SELECT doc_id, 8 AS width, 8 AS height, CAST(192 AS BIGINT) AS n_bytes,
       CAST(12 * COALESCE(list_sum(list_transform(
                string_split(substr(text, 1, 16), ''), c -> ascii(c))), 0)
            AS BIGINT) AS checksum
FROM documents
ORDER BY doc_id
""",
    doc="X5: REAL image resize over real image bytes (r7): each document "
    "becomes a genuine uncompressed 24-bit BMP (4x4 gray pixels = its "
    "first 16 text bytes; encode_bmp writes actual file+DIB headers, "
    "bottom-up stride-padded rows), and resize_payloads decodes the BMP "
    "by parsing those headers (operators/multimodal.py: decode_bmp) then "
    "nearest-neighbor-resamples to 8x8. The oracle knows nothing about "
    "BMP: NN 4x4->8x8 duplicates each pixel 2x2 and gray triples into "
    "R=G=B, so checksum = 4*3*sum(first-16-byte values) — the decode/"
    "resample round-trip must reproduce exactly the bytes that went in, "
    "making header parsing, row order, and stride all hash-load-bearing. "
    "Compressed formats raise NotImplementedError inside decode.",
)
def x5b_resize(spark, sf_dir):
    d = attach_bmp_payload(t(spark, sf_dir, "documents"), width=4, height=4)
    return resize_payloads(d, width=8, height=8).orderBy("doc_id")


@register(
    "x5c_frame_sample",
    oracle="""
SELECT doc_id, CAST(r.range AS BIGINT) AS frame_idx,
       CAST(length(substr(text, CAST(r.range * 16 + 1 AS INT), 16)) AS BIGINT) AS n_bytes,
       CAST(ascii(substr(text, CAST(r.range * 16 + 1 AS INT), 1)) AS INT) AS first_byte
FROM documents, range(0, 64) r
WHERE r.range % 4 = 0 AND r.range * 16 < length(text)
ORDER BY doc_id, frame_idx
""",
    doc="X5: fake video frame sampling (payload chunked into 16-byte frames, "
    "every 4th emitted as its own row — flat-map mapInPandas shape). Oracle "
    "uses an uncorrelated range(0,64) bound (max doc ~600 bytes) + length "
    "filter since DuckDB range() can't take lateral args.",
)
def x5c_frame_sample(spark, sf_dir):
    d = attach_payload(t(spark, sf_dir, "documents"))
    return sample_frames(d, frame_bytes=16, every=4).orderBy("doc_id", "frame_idx")


@register(
    "x6_centroids",
    oracle="""
SELECT label, CAST(r.range AS BIGINT) AS pos,
       ROUND(SUM(CAST(embedding[CAST(r.range AS INT)] AS DOUBLE)) / COUNT(*), 4) + 0.0 AS centroid
FROM embeddings, range(1, 65) r
GROUP BY label, pos
ORDER BY label, pos
""",
    doc="X6: per-label embedding centroid (posexplode + avg, ROUND(,4) float rule).",
)
def x6_centroids(spark, sf_dir):
    return centroids(t(spark, sf_dir, "embeddings"))


@register(
    "x6b_norms",
    oracle="""
SELECT vec_id,
       ROUND(sqrt(list_sum(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm,
       ROUND(list_cosine_similarity(
             list_transform(embedding, x -> CAST(x AS DOUBLE)),
             list_transform(embedding, x -> CAST(x AS DOUBLE))), 4) AS self_cos
FROM embeddings
ORDER BY vec_id
""",
    doc="X6: vector norms + self-cosine sanity (normalize building blocks).",
)
def x6b_norms(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    return e.select(
        "vec_id",
        F.round(norm(emb), 4).alias("l2_norm"),
        F.round(dot(emb, emb) / (norm(emb) * norm(emb)), 4).alias("self_cos"),
    ).orderBy("vec_id")


@register(
    "x6c_pairwise_dist",
    oracle="""
WITH v AS (SELECT vec_id, label,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings WHERE vec_id < 40)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_distance(a.v, b.v), 4) AS euclid,
       ROUND(list_inner_product(a.v, b.v), 4) AS dot
FROM v a JOIN v b ON a.vec_id < b.vec_id AND a.label = b.label
ORDER BY id_a, id_b
""",
    doc="X6: within-label pairwise Euclidean distance + dot product "
    "(JVM higher-order fns, label-partitioned self-join — the shuffle key "
    "is the label, so at scale each group's pairs stay on one node).",
)
def x6c_pairwise_dist(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 40)
    a = e.select(F.col("vec_id").alias("id_a"), F.col("label").alias("la"),
                 F.col("embedding").alias("va"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("label").alias("lb"),
                 F.col("embedding").alias("vb"))
    diff = F.zip_with(
        F.transform(F.col("va"), lambda x: x.cast("double")),
        F.transform(F.col("vb"), lambda x: x.cast("double")),
        lambda x, y: (x - y) * (x - y),
    )
    return (
        a.join(b, (F.col("id_a") < F.col("id_b")) & (F.col("la") == F.col("lb")))
        .select(
            "id_a",
            "id_b",
            F.round(
                F.sqrt(F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x)), 4
            ).alias("euclid"),
            F.round(dot(F.col("va"), F.col("vb")), 4).alias("dot"),
        )
        .orderBy("id_a", "id_b")
    )


@register(
    "x3c_ivf_topk",
    oracle=None,  # approximate by construction; recall vs brute force is pytest-checked
    doc="X3 ANN path: IVF coarse quantization (deterministic seed + one "
    "distributed Lloyd iteration, n_probe cell probing) — touches "
    "n_probe/n_cells of the corpus per query instead of all of it. "
    "Hash-anchored by x3c_ivf_exact (the n_probe = n_cells degenerate "
    "mode IS brute force, oracle-checked); this entry keeps the "
    "approximate regime driver-run with its recall floor pytest-pinned.",
)
def x3c_ivf_topk(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    return ivf_topk(q, e, k=5, n_cells=16, n_probe=4).orderBy("q_id", "c_id")


@register(
    "x3c_ivf_exact",
    oracle=_COS_ORACLE,
    doc="X3c in exact mode, hash-checked against the brute-force cosine "
    "oracle (the a12 pattern: run the approximate machinery at settings "
    "where it provably degenerates to the exact answer, making DuckDB a "
    "true oracle for the WHOLE code path — centroid training, cell "
    "assignment, cell-keyed join, per-query top-k window). With "
    "n_probe = n_cells every query probes every cell, so the candidate "
    "set is the full corpus and the result must equal x3's row-for-row "
    "(identity also pinned in tests/test_scale_ops.py). The approximate "
    "regime (n_probe < n_cells) stays recall-tested under x3c_ivf_topk.",
)
def x3c_ivf_exact(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    return ivf_topk(q, e, k=5, n_cells=16, n_probe=16).orderBy("q_id", "c_id")


@register(
    "x6e_matryoshka_retention",
    oracle="""
WITH v AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
         list_transform(embedding[1:16], x -> CAST(x AS DOUBLE)) AS h
  FROM embeddings
)
SELECT vec_id,
       CAST(len(v) AS BIGINT) AS dim_full,
       ROUND(sqrt(list_sum(list_transform(v, x -> x * x))), 6) AS norm_full,
       ROUND(sqrt(list_sum(list_transform(h, x -> x * x))), 6) AS norm_head,
       ROUND(CASE WHEN sqrt(list_sum(list_transform(v, x -> x * x))) = 0 THEN 0
                  ELSE sqrt(list_sum(list_transform(h, x -> x * x)))
                       / sqrt(list_sum(list_transform(v, x -> x * x))) END, 6)
         AS retention,
       CAST(CASE WHEN sqrt(list_sum(list_transform(v, x -> x * x))) > 0
                  AND sqrt(list_sum(list_transform(h, x -> x * x)))
                      / sqrt(list_sum(list_transform(v, x -> x * x))) >= 0.5
            THEN 1 ELSE 0 END AS INT) AS head_usable
FROM v
ORDER BY vec_id
""",
    doc="X6e: matryoshka truncation retention — per vector, how much L2 "
    "mass the first 16 of 64 dimensions keep (cosine between the "
    "truncated-and-zero-padded vector and the full one equals "
    "norm_head/norm_full), the storage-tiering diagnostic before serving "
    "embeddings at a shorter prefix length. Pure per-row JVM "
    "higher-order-function arithmetic — map-side, zero shuffle beyond "
    "the deterministic output sort; the usable flag compares the "
    "UNROUNDED ratio identically in both engines (same left-to-right "
    "float64 fold over the same values).",
)
def x6e_matryoshka_retention(spark, sf_dir):
    from ez_cdc_spark.functions.similarity import norm

    e = t(spark, sf_dir, "embeddings")
    full = F.col("embedding")
    head = F.slice(F.col("embedding"), 1, 16)
    # Zero-norm guard: engines disagree on double x/0 (NULL vs IEEE), so an
    # all-zero vector defines retention = 0 (and head_usable = 0) on both
    # sides — the op is total over all inputs (ADVICE r5).
    retention = F.when(norm(full) == 0, F.lit(0.0)).otherwise(norm(head) / norm(full))
    return e.select(
        "vec_id",
        F.size(full).cast("bigint").alias("dim_full"),
        F.round(norm(full), 6).alias("norm_full"),
        F.round(norm(head), 6).alias("norm_head"),
        F.round(retention, 6).alias("retention"),
        (retention >= 0.5).cast("int").alias("head_usable"),
    ).orderBy("vec_id")


@register(
    "x24_cluster_canonical",
    oracle="WITH RECURSIVE "
    + _x2_pair_ctes()
    + r""",
e AS (
  SELECT id_a AS src, id_b AS dst FROM pairs WHERE jaccard >= 0.5
  UNION
  SELECT id_b, id_a FROM pairs WHERE jaccard >= 0.5
), n AS (SELECT DISTINCT src AS id FROM e),
walk(id, lbl) AS (
  SELECT id, id FROM n
  UNION
  SELECT e.dst, walk.lbl FROM walk JOIN e ON e.src = walk.id
), cc AS (SELECT id, MIN(lbl) AS lbl FROM walk GROUP BY id),
labeled AS (
  SELECT d.doc_id,
         COALESCE(cc.lbl, d.doc_id) AS cluster_id,
         ROUND(0.4 * least(length(d.text) / 400.0, 1.0)
               + 0.3 * (len(list_distinct(regexp_split_to_array(d.text, '\s+')))
                   / CAST(len(regexp_split_to_array(d.text, '\s+')) AS DOUBLE))
               + 0.3 * (1 - len(list_filter(
                     list_transform(regexp_split_to_array(d.text, '\s+'), x -> lower(x)),
                     x -> list_contains(['the','a','of','and','to','in','is','it'], x)))
                   / CAST(len(regexp_split_to_array(d.text, '\s+')) AS DOUBLE)), 6)
           AS quality
  FROM documents d LEFT JOIN cc ON cc.id = d.doc_id
)
SELECT doc_id, CAST(cluster_id AS BIGINT) AS cluster_id,
       CAST(cluster_n AS BIGINT) AS cluster_n, quality
FROM (
  SELECT doc_id, cluster_id, quality,
         COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_n,
         ROW_NUMBER() OVER (PARTITION BY cluster_id
                            ORDER BY quality DESC, doc_id) AS rk
  FROM labeled
)
WHERE rk = 1
ORDER BY doc_id
""",
    doc="X24: canonical-document election — the decision step that completes "
    "fuzzy dedup: x2's LSH pairs become x11's connected-component "
    "clusters, singletons keep their own label (left join, label = "
    "doc_id), and each cluster KEEPS exactly one document — the highest "
    "quality score, doc_id tiebreak — emitting the kept doc with its "
    "cluster size. The per-cluster window shuffles on cluster_id with "
    "cluster-sized groups (near-dup clusters are small by construction); "
    "the cluster labels themselves join back to the corpus by doc_id. "
    "Oracle: the same recursive-CTE components over the IDENTICAL pair "
    "CTEs as x2/x11 plus the x4c quality expression.",
)
def x24_cluster_canonical(spark, sf_dir):
    from ez_cdc_spark.functions.text import quality_score

    d = t(spark, sf_dir, "documents")
    cc = _shared_neardup_cc(spark, sf_dir)
    labeled = (
        d.join(cc.withColumnRenamed("id", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", "doc_id").cast("bigint").alias("cluster_id"),
            quality_score(F.col("text")).alias("quality"),
        )
    )
    w_n = Window.partitionBy("cluster_id")
    w_rk = Window.partitionBy("cluster_id").orderBy(F.desc("quality"), F.asc("doc_id"))
    return (
        labeled.withColumn("cluster_n", F.count("*").over(w_n).cast("bigint"))
        .withColumn("rk", F.row_number().over(w_rk))
        .filter(F.col("rk") == 1)
        .select("doc_id", "cluster_id", "cluster_n", "quality")
        .orderBy("doc_id")
    )


@register(
    "x36_cluster_split",
    oracle="WITH RECURSIVE "
    + _x2_pair_ctes()
    + r""",
e AS (
  SELECT id_a AS src, id_b AS dst FROM pairs WHERE jaccard >= 0.5
  UNION
  SELECT id_b, id_a FROM pairs WHERE jaccard >= 0.5
), n AS (SELECT DISTINCT src AS id FROM e),
walk(id, lbl) AS (
  SELECT id, id FROM n
  UNION
  SELECT e.dst, walk.lbl FROM walk JOIN e ON e.src = walk.id
), cc AS (SELECT id, MIN(lbl) AS lbl FROM walk GROUP BY id),
labeled AS (
  SELECT d.doc_id, COALESCE(cc.lbl, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN cc ON cc.id = d.doc_id
)
SELECT doc_id, CAST(cluster_id AS BIGINT) AS cluster_id,
       CAST(CAST('0x' || substr(md5('split:'
              || CAST(cluster_id AS VARCHAR)), 1, 8) AS BIGINT) % 100
            AS BIGINT) AS bucket,
       CASE WHEN CAST('0x' || substr(md5('split:'
                  || CAST(cluster_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 < 80
              THEN 'train'
            WHEN CAST('0x' || substr(md5('split:'
                  || CAST(cluster_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 < 90
              THEN 'val'
            ELSE 'test' END AS split
FROM labeled
ORDER BY doc_id
""",
    doc="X36: leakage-safe train/val/test split — closes X28's documented "
    "caveat: a doc-keyed hash split scatters near-duplicates across "
    "splits (train/test contamination); here the split hash keys on the "
    "document's NEAR-DUP CLUSTER label (x11's connected components, "
    "singletons = own doc_id), so every member of a duplicate cluster "
    "lands in the same split by construction. Same portable-hash bucket "
    "formula as X28 (salted 'split:' prefix, 80/10/10) applied to "
    "cluster_id; same-split-per-cluster invariant is implied by the "
    "formula and pinned by test. Plan: reuses the session-memoized CC "
    "(one pair-gen paid across x11/x24/x36), one doc_id-keyed broadcast-"
    "back join, then a pure map-side hash projection — no extra shuffle "
    "beyond the label join.",
)
def x36_cluster_split(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    cc = _shared_neardup_cc(spark, sf_dir)
    labeled = d.select("doc_id").join(
        cc.withColumnRenamed("id", "doc_id"), "doc_id", "left"
    ).select(
        "doc_id",
        F.coalesce("cluster_id", "doc_id").cast("bigint").alias("cluster_id"),
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("split:"), F.col("cluster_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    return labeled.select(
        "doc_id",
        "cluster_id",
        bucket.cast("bigint").alias("bucket"),
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    ).orderBy("doc_id")


def _x37_oracle(iters: int = 5) -> str:
    unit = 10**12
    sql = (
        "WITH "
        + _x2_pair_ctes()
        + """,
e AS (
  SELECT id_a AS src, id_b AS dst FROM pairs WHERE jaccard >= 0.5
  UNION
  SELECT id_b, id_a FROM pairs WHERE jaccard >= 0.5
), deg AS (
  SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS d FROM e GROUP BY src
), nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM deg),
"""
        + f"r0 AS (SELECT id, CAST({unit} // n AS BIGINT) AS r FROM deg, nn)"
    )
    prev = "r0"
    for k in range(1, iters + 1):
        sql += f""",
c{k} AS (
  SELECT e.dst AS id, CAST(SUM({prev}.r // deg.d) AS BIGINT) AS s
  FROM e JOIN {prev} ON e.src = {prev}.id JOIN deg ON deg.id = e.src
  GROUP BY e.dst
), r{k} AS (
  SELECT c{k}.id,
         CAST((15 * {unit}) // (100 * nn.n) + (85 * c{k}.s) // 100 AS BIGINT)
           AS r
  FROM c{k}, nn
)"""
        prev = f"r{k}"
    sql += f"""
SELECT {prev}.id AS doc_id, {prev}.r AS pr_units, deg.d AS degree
FROM {prev} JOIN deg ON deg.id = {prev}.id
ORDER BY doc_id
"""
    return sql


@register(
    "x37_pagerank_centrality",
    oracle=_x37_oracle(),
    doc="X37: PageRank centrality over the near-dup similarity graph — the "
    "iterative-graph-numerics capability class (beyond x11's reachability "
    "CC): which document is the HUB of its duplication neighborhood, a "
    "centrality-based alternative input to canonical election. Spec is "
    "FIXED-POINT integer PageRank, damping 0.85, exactly 5 iterations: "
    "ranks live in 1e-12 units as BIGINT, contrib = r div deg, "
    "r' = (15*UNIT) div (100*N) + (85*sum contrib) div 100 — every "
    "operation integer floor-div/sum, so both engines are bit-exact with "
    "NO float anywhere and the order-free integer SUM needs no rounding "
    "discipline at all (the determinism endpoint of the x34 recipe "
    "family). Spark side: 5 rounds of edge-join + dst-keyed sum with "
    "localCheckpoint per round (lineage truncation, x11's iterative "
    "pattern — plan depth stays O(1) per round at any iteration count); "
    "the symmetric edge set guarantees every node receives mass, so no "
    "left-join null path exists. Edges reuse the session-memoized "
    "candidate pairs (pair-gen paid once across x11/x24/x36/x37). "
    "Oracle: the SAME spec as 5 unrolled DuckDB CTE stages over the "
    "identical pair CTEs.",
)
def x37_pagerank_centrality(spark, sf_dir):
    unit = 10**12
    pairs = _shared_neardup_pairs(spark, sf_dir)
    e = (
        pairs.selectExpr("id_a AS src", "id_b AS dst")
        .unionByName(pairs.selectExpr("id_b AS src", "id_a AS dst"))
        .distinct()
    )
    deg = e.groupBy("src").agg(F.count("*").cast("bigint").alias("d")).selectExpr(
        "src AS id", "d"
    )
    nn = deg.agg(F.count("*").cast("bigint").alias("n"))
    r = deg.join(F.broadcast(nn)).selectExpr("id", f"CAST({unit} div n AS BIGINT) AS r")
    for _ in range(5):
        contrib = r.join(deg, "id").selectExpr("id", "r div d AS c")
        spread = (
            e.join(contrib, e.src == contrib.id)
            .groupBy("dst")
            .agg(F.sum("c").cast("bigint").alias("s"))
            .selectExpr("dst AS id", "s")
        )
        r = (
            spread.join(F.broadcast(nn))
            .selectExpr(
                "id",
                f"CAST((15 * {unit}) div (100 * n) + (85 * s) div 100 AS BIGINT) AS r",
            )
            .localCheckpoint(eager=True)
        )
    return (
        r.join(deg, "id")
        .selectExpr("id AS doc_id", "r AS pr_units", "d AS degree")
        .orderBy("doc_id")
    )


def _x38_cte(iters: int = 3, k: int = 8, scale: int = 10000, where: str = "") -> str:
    """Unrolled-CTE DuckDB k-means chain, one CTE stage pair per Lloyd
    iteration (the x37 oracle pattern); shared by the x38 and x39 oracles.
    Argmin is the packed integer key MIN(dist * k + cid): dist fits ~2^49
    (64 dims x (254e4)^2), so the pack is exact in BIGINT and decodes as
    (mk % k, mk // k) — min_by can't take a composite key portably, the
    packed key is the same total order. Ends with a{iters} (assignment)
    and n{iters} (cluster sizes) in scope."""
    sql = f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings {where}
), m AS (
  SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS mx FROM v
), codes AS (
  SELECT vec_id,
         CASE WHEN mx > 0
              THEN list_transform(v, x -> CAST(floor(x * (127.0 / mx) + 0.5)
                                               AS BIGINT) + 127)
              ELSE list_transform(v, x -> CAST(127 AS BIGINT)) END AS u
  FROM m
), dims AS (
  SELECT vec_id, unnest(u) AS val, unnest(range(len(u))) AS pos FROM codes
), seeds AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid, u
  FROM (SELECT vec_id, u FROM codes ORDER BY vec_id LIMIT {k})
), cent0 AS (
  SELECT cid, list_transform(u, x -> x * {scale}) AS cent FROM seeds
)"""
    prev = "cent0"
    for it in range(1, iters + 1):
        sql += f""",
d{it} AS (
  SELECT c.vec_id,
         MIN(CAST(list_sum(list_transform(list_zip(c.u, p.cent),
               z -> (z[1] * {scale} - z[2]) * (z[1] * {scale} - z[2])))
             AS BIGINT) * {k} + p.cid) AS mk
  FROM codes c, {prev} p GROUP BY c.vec_id
), a{it} AS (
  SELECT vec_id, CAST(mk % {k} AS BIGINT) AS cid,
         CAST(mk // {k} AS BIGINT) AS dist FROM d{it}
), n{it} AS (
  SELECT cid, CAST(COUNT(*) AS BIGINT) AS n FROM a{it} GROUP BY cid
), ps{it} AS (
  SELECT a.cid, d.pos, CAST(SUM(d.val) AS BIGINT) AS s
  FROM a{it} a JOIN dims d USING (vec_id) GROUP BY a.cid, d.pos
), cn{it} AS (
  SELECT ps.cid, list((ps.s * {scale}) // n.n ORDER BY ps.pos) AS cent
  FROM ps{it} ps JOIN n{it} n USING (cid) GROUP BY ps.cid
), cent{it} AS (
  SELECT p.cid, COALESCE(c.cent, p.cent) AS cent
  FROM {prev} p LEFT JOIN cn{it} c USING (cid)
)"""
        prev = f"cent{it}"
    return sql


def _x38_oracle(iters: int = 3, k: int = 8, scale: int = 10000) -> str:
    return (
        _x38_cte(iters, k, scale)
        + f"""
SELECT a.vec_id, a.cid AS cluster_id, a.dist AS dist_units,
       n.n AS cluster_n
FROM a{iters} a JOIN n{iters} n USING (cid)
ORDER BY a.vec_id
"""
    )


@register(
    "x38_kmeans_clusters",
    oracle=_x38_oracle(),
    doc="X38: fixed-point k-means corpus clustering — the SemDeDup/topic-"
    "balancing step: embedding-space Lloyd clustering as the blocking key "
    "for semantic dedup and per-topic mixture control. Spec is INTEGER "
    "fixed-point end to end (the x37 recipe applied to geometry): vectors "
    "are x6d's symmetric int8 codes SHIFTED to [0,254] (so every sum is "
    "non-negative and integer `div` == floor-`//` on both engines — "
    "Spark div truncates toward zero, DuckDB // floors, they agree only "
    "above zero), centroids live in 1e-4 code units as BIGINT, distance "
    "is the exact integer squared-L2 (max 64 x (254e4)^2 ~ 2^49, no "
    "overflow), argmin is the packed key min(dist*k + cid) (exact total "
    "order with deterministic low-cid tiebreak), and the centroid update "
    "is an integer floor-div mean; empty clusters keep their previous "
    "centroid (LEFT JOIN + COALESCE on both engines). Seeds: the k "
    "lowest-vec_id vectors — deterministic, no RNG. Exactly 3 "
    "iterations. Spark plan shape per iteration: assignment is a "
    "MAP-SIDE fold over a one-row broadcast centroid array (zero "
    "shuffle, no corpus x k join materialized); the update explodes "
    "assigned rows to (cid, pos, val) and partial-aggregates map-side "
    "into k x d cells, so the only exchange per round carries k*64 "
    "partials per partition; localCheckpoint truncates lineage each "
    "round (x37's iterative pattern). At 100 TB: centroids stay k x d "
    "(broadcast), assignment is embarrassingly parallel, and the update "
    "shuffle is O(k*d*partitions) regardless of corpus size. Oracle: "
    "the same spec as 3 unrolled DuckDB CTE stages.",
)
def x38_kmeans_clusters(spark, sf_dir):
    assigned = _kmeans_assign(spark, sf_dir)
    n_final = assigned.groupBy("cid").agg(F.count("*").cast("bigint").alias("cluster_n"))
    return (
        assigned.join(F.broadcast(n_final), "cid")
        .select(
            "vec_id",
            F.col("cid").alias("cluster_id"),
            F.col("dist").alias("dist_units"),
            "cluster_n",
        )
        .orderBy("vec_id")
    )


# x38's assignment is the blocking structure x39 (semantic dedup) and the
# cluster-quality diagnostics consume — same sharing rationale as the
# neardup pair/CC caches: the 3-iteration Lloyd loop is paid once per
# (application, corpus); the pinned blocks are slim (vec_id, u, cid, dist)
# rows, checkpointed already by the loop itself.
_KMEANS_CACHE: dict[tuple[str, str, tuple], "DataFrame"] = {}


def _shifted_codes(df):
    """x6d's int8 quantization shifted to [0, 254] as array<bigint> — the
    integer vector representation every x38-family op computes on."""
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    mx = F.array_max(F.transform(v, F.abs))
    return F.when(
        mx > 0,
        F.transform(
            v, lambda x: F.floor(x * (F.lit(127.0) / mx) + 0.5).cast("bigint") + 127
        ),
    ).otherwise(F.transform(v, lambda x: F.lit(127).cast("bigint")))


def _kmeans_assign(spark, sf_dir):
    key = (
        spark.sparkContext.applicationId,
        str(sf_dir),
        _corpus_fingerprint(sf_dir, "embeddings"),
    )
    hit = _KMEANS_CACHE.get(key)
    if hit is not None:
        return hit[0]
    for stale in [k for k in _KMEANS_CACHE if k[:2] == key[:2]]:
        try:
            for df in _KMEANS_CACHE.pop(stale):
                df.unpersist()
        except Exception:
            pass  # releasing superseded checkpoint blocks is best-effort

    e = t(spark, sf_dir, "embeddings")
    codes = e.select("vec_id", _shifted_codes(e).alias("u")).localCheckpoint(
        eager=True
    )
    assigned, cent = _lloyd_loop(codes)
    _KMEANS_CACHE[key] = (assigned, cent)
    return assigned


def _kmeans_centroids(spark, sf_dir):
    """Final (post-update) centroids of the memoized x38 run — the 'model'
    the incremental assignment (x44) applies to new batches."""
    _kmeans_assign(spark, sf_dir)
    key = (
        spark.sparkContext.applicationId,
        str(sf_dir),
        _corpus_fingerprint(sf_dir, "embeddings"),
    )
    return _KMEANS_CACHE[key][1]


def _assign_to_centroids(codes, cent, K=8, SCALE=10000):
    """Map-side argmin of a code frame against a centroid frame: one-row
    broadcast of all k centroids, packed-key least fold (x38's assignment
    stage as a standalone op)."""
    cents_row = cent.agg(
        F.array_sort(F.collect_list(F.struct("cid", "cent"))).alias("cents")
    )
    mk = F.aggregate(
        F.col("cents"),
        F.lit(2**62).cast("bigint"),
        lambda acc, c: F.least(
            acc,
            F.aggregate(
                F.zip_with(
                    F.col("u"),
                    c["cent"],
                    lambda a, b: (a * SCALE - b) * (a * SCALE - b),
                ),
                F.lit(0).cast("bigint"),
                lambda s, x: s + x,
            )
            * K
            + c["cid"],
        ),
    )
    return (
        codes.crossJoin(F.broadcast(cents_row))
        .select("vec_id", "u", mk.alias("mk"))
        .select(
            "vec_id",
            "u",
            (F.col("mk") % K).cast("bigint").alias("cid"),
            F.expr(f"mk div {K}").cast("bigint").alias("dist"),
        )
    )


def _lloyd_loop(codes, K=8, T=3, SCALE=10000):
    """The x38 Lloyd iteration over a pinned code frame; returns
    (assignment from iteration T against cent_{T-1}, final centroids
    cent_T). The assignment is what x38 declares; the final centroids are
    the model x44 applies to unseen batches."""
    w_seed = Window.orderBy("vec_id")
    cent = (
        codes.orderBy("vec_id")
        .limit(K)
        .withColumn("cid", (F.row_number().over(w_seed) - 1).cast("bigint"))
        .select("cid", F.transform("u", lambda x: x * SCALE).alias("cent"))
    )

    assigned = None
    for _ in range(T):
        # map-side packed-key argmin against the one-row centroid
        # broadcast (see _assign_to_centroids)
        assigned = _assign_to_centroids(codes, cent, K, SCALE).localCheckpoint(
            eager=True
        )
        sums = (
            assigned.select("cid", F.posexplode("u").alias("pos", "val"))
            .groupBy("cid", "pos")
            .agg(F.sum("val").cast("bigint").alias("s"))
        )
        n = assigned.groupBy("cid").agg(F.count("*").cast("bigint").alias("n"))
        cent_new = (
            sums.join(F.broadcast(n), "cid")
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            # integer floor-div mean (operands non-negative,
                            # so Spark div == DuckDB // exactly)
                            F.struct(
                                "pos",
                                F.expr(f"(s * {SCALE}) div n").cast("bigint").alias("cv"),
                            )
                        )
                    ),
                    lambda st: st["cv"],
                ).alias("cent")
            )
        )
        cent = (
            cent.select("cid", F.col("cent").alias("cent_prev"))
            .join(cent_new, "cid", "left")
            .select("cid", F.coalesce("cent", "cent_prev").alias("cent"))
            .localCheckpoint(eager=True)
        )

    return assigned, cent


_X39_TAU = 130_000  # integer squared-code-distance near-dup threshold


@register(
    "x39_semantic_dedup",
    oracle=_x38_cte()
    + f"""
, mem AS (
  SELECT a.vec_id, a.cid, c.u FROM a3 a JOIN codes c USING (vec_id)
), blockers AS (
  SELECT later.vec_id,
         CAST(MIN(earlier.vec_id) AS BIGINT) AS blocked_by,
         CAST(COUNT(*) AS BIGINT) AS n_blockers
  FROM mem later JOIN mem earlier
    ON later.cid = earlier.cid AND earlier.vec_id < later.vec_id
   AND list_sum(list_transform(list_zip(later.u, earlier.u),
         z -> (z[1] - z[2]) * (z[1] - z[2]))) <= {_X39_TAU}
  GROUP BY later.vec_id
)
SELECT m.vec_id, CAST(m.cid AS BIGINT) AS cluster_id,
       CAST(CASE WHEN b.vec_id IS NULL THEN 1 ELSE 0 END AS INT) AS kept,
       b.blocked_by, COALESCE(b.n_blockers, 0) AS n_blockers
FROM mem m LEFT JOIN blockers b USING (vec_id)
ORDER BY m.vec_id
""",
    doc="X39: semantic deduplication (SemDeDup) — the step x38 exists to "
    "unlock: within each k-means cluster, a vector is DROPPED when any "
    "LOWER-vec_id cluster member sits within an integer squared "
    "code-distance threshold, keeping one representative per semantic "
    "neighborhood. The all-pairs comparison happens ONLY within a "
    "cluster (the SemDeDup scale contract: k grows with the corpus so "
    "cluster sizes stay bounded; the join is cluster-keyed, never "
    "corpus-wide). Distance is exact integer squared-L2 over the x6d "
    "int8 codes — shift-invariant, so the shifted [0,254] codes reused "
    "from x38's cache give identical differences — making the threshold "
    "comparison bit-deterministic on both engines (no cosine rounding "
    "boundary to sit on). Drop rule is 'any earlier neighbor', the "
    "single-pass order-free form of greedy selection (same class as "
    "X1's min-doc_id keep rule): expressible as one aggregate, no "
    "sequential dependency, identical on both engines. Output is total: "
    "every vector appears with kept flag, its lowest blocking neighbor "
    "(audit trail), and blocker count. Plan: reuses the session-"
    "memoized x38 assignment (Lloyd loop paid once across x38/x39), one "
    "cluster-keyed self-join, one vec_id-keyed left join back.",
)
def x39_semantic_dedup(spark, sf_dir):
    assigned = _kmeans_assign(spark, sf_dir)
    mem = assigned.select("vec_id", "cid", "u")
    later = mem.select(
        F.col("vec_id").alias("vid"), "cid", F.col("u").alias("u_l")
    )
    earlier = mem.select(
        F.col("vec_id").alias("eid"), "cid", F.col("u").alias("u_e")
    )
    d2 = F.aggregate(
        F.zip_with(F.col("u_l"), F.col("u_e"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("bigint"),
        lambda s, x: s + x,
    )
    blockers = (
        later.join(earlier, "cid")
        .filter(F.col("eid") < F.col("vid"))
        .filter(d2 <= _X39_TAU)
        .groupBy("vid")
        .agg(
            F.min("eid").cast("bigint").alias("blocked_by"),
            F.count("*").cast("bigint").alias("n_blockers"),
        )
    )
    return (
        mem.join(blockers, mem.vec_id == blockers.vid, "left")
        .select(
            "vec_id",
            F.col("cid").cast("bigint").alias("cluster_id"),
            F.when(F.col("blocked_by").isNull(), 1).otherwise(0).cast("int").alias("kept"),
            "blocked_by",
            F.coalesce("n_blockers", F.lit(0)).cast("bigint").alias("n_blockers"),
        )
        .orderBy("vec_id")
    )


@register(
    "x43_cluster_quality",
    oracle=_x38_cte()
    + """
SELECT a.cid AS cluster_id,
       n.n AS cluster_n,
       CAST(SUM(a.dist) AS BIGINT) AS inertia_units,
       CAST(SUM(a.dist) // n.n AS BIGINT) AS mean_dist_units,
       CAST(MAX(a.dist) AS BIGINT) AS max_dist_units,
       CAST(MIN(a.vec_id) AS BIGINT) AS min_vec_id
FROM a3 a JOIN n3 n USING (cid)
GROUP BY a.cid, n.n
ORDER BY cluster_id
""",
    doc="X43: per-cluster quality diagnostics over the x38 model — inertia "
    "(the k-means objective, summed integer squared distances), mean and "
    "max member distance (spread / outlier radius), size, and the lowest "
    "member id (the seed audit). The operational companion to x38: "
    "elbow-method inputs (inertia vs k), degenerate-cluster detection "
    "(tiny n, huge mean), and the radius that calibrates x39's dedup "
    "threshold. All integer (sums of bigint dist, floor-div mean) — zero "
    "float discipline; one k-row aggregate over the memoized assignment, "
    "marginal cost after any x38-family op has run.",
)
def x43_cluster_quality(spark, sf_dir):
    assigned = _kmeans_assign(spark, sf_dir)
    n = assigned.groupBy("cid").agg(F.count("*").cast("bigint").alias("cluster_n"))
    return (
        assigned.groupBy("cid")
        .agg(
            F.sum("dist").cast("bigint").alias("inertia_units"),
            F.max("dist").cast("bigint").alias("max_dist_units"),
            F.min("vec_id").cast("bigint").alias("min_vec_id"),
        )
        .join(F.broadcast(n), "cid")
        .select(
            F.col("cid").alias("cluster_id"),
            "cluster_n",
            "inertia_units",
            F.expr("inertia_units div cluster_n").cast("bigint").alias(
                "mean_dist_units"
            ),
            "max_dist_units",
            "min_vec_id",
        )
        .orderBy("cluster_id")
    )


_X44_SPLIT = 400  # vec_id fence: < is yesterday's trained corpus, >= is the new batch


@register(
    "x44_incremental_assign",
    oracle=_x38_cte(where=f"WHERE vec_id < {_X44_SPLIT}")
    + f"""
, newv AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings WHERE vec_id >= {_X44_SPLIT}
), newm AS (
  SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS mx FROM newv
), newcodes AS (
  SELECT vec_id,
         CASE WHEN mx > 0
              THEN list_transform(v, x -> CAST(floor(x * (127.0 / mx) + 0.5)
                                               AS BIGINT) + 127)
              ELSE list_transform(v, x -> CAST(127 AS BIGINT)) END AS u
  FROM newm
), nd AS (
  SELECT c.vec_id,
         MIN(CAST(list_sum(list_transform(list_zip(c.u, p.cent),
               z -> (z[1] * 10000 - z[2]) * (z[1] * 10000 - z[2])))
             AS BIGINT) * 8 + p.cid) AS mk
  FROM newcodes c, cent3 p GROUP BY c.vec_id
)
SELECT vec_id, CAST(mk % 8 AS BIGINT) AS cluster_id,
       CAST(mk // 8 AS BIGINT) AS dist_units
FROM nd ORDER BY vec_id
""",
    doc="X44: incremental cluster assignment — the train/apply split that "
    "makes x38 OPERATIONAL at 100 TB: yesterday's corpus (vec_id < fence) "
    "trains the Lloyd model; today's batch (vec_id >= fence) is assigned "
    "to the FROZEN final centroids with zero retraining — x2f's "
    "batch-vs-corpus incremental pattern applied to clustering (and how "
    "SemDeDup/IVF serving actually runs: periodic retrain, continuous "
    "assign). The batch-side cost is pure map-side: one-row broadcast of "
    "k centroids + packed-key argmin fold, no shuffle, no state — the "
    "new batch never sees the training corpus. Oracle: the x38 CTE chain "
    "restricted to the training fence, ending at cent3 (the "
    "post-iteration-3 centroids — the 'model'), + one assignment CTE "
    "over the new batch's codes.",
)
def x44_incremental_assign(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    old = e.filter(F.col("vec_id") < _X44_SPLIT)
    codes_old = old.select("vec_id", _shifted_codes(old).alias("u")).localCheckpoint(
        eager=True
    )
    _, cent = _lloyd_loop(codes_old)
    new = e.filter(F.col("vec_id") >= _X44_SPLIT)
    codes_new = new.select("vec_id", _shifted_codes(new).alias("u"))
    return (
        _assign_to_centroids(codes_new, cent)
        .select(
            "vec_id",
            F.col("cid").alias("cluster_id"),
            F.col("dist").alias("dist_units"),
        )
        .orderBy("vec_id")
    )


@register(
    "x48_dedup_dashboard",
    oracle="WITH "
    + _x2_pair_ctes()
    + """, nd AS (
  SELECT id_a AS doc_id FROM pairs WHERE jaccard >= 0.5
  UNION
  SELECT id_b FROM pairs WHERE jaccard >= 0.5
), eh AS (
  SELECT md5(text) AS h, COUNT(*) AS n, MIN(doc_id) AS canon
  FROM documents GROUP BY 1
), f AS (
  SELECT d.doc_id, d.source, d.n_chars,
         CASE WHEN e.n > 1 AND d.doc_id != e.canon THEN 1 ELSE 0 END AS is_copy,
         CASE WHEN i.doc_id IS NOT NULL THEN 1 ELSE 0 END AS is_near
  FROM documents d
  JOIN eh e ON md5(d.text) = e.h
  LEFT JOIN nd i ON i.doc_id = d.doc_id
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(is_copy) AS BIGINT) AS n_exact_copies,
       CAST(SUM(is_copy) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS exact_dup_rate,
       CAST(SUM(is_near) AS BIGINT) AS n_neardup_docs,
       CAST(SUM(is_near) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS neardup_rate,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(SUM(n_chars) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_chars
FROM f GROUP BY source
ORDER BY source
""",
    doc="X48: per-source dedup-rate dashboard (the SURVEY round-9 "
    "candidate) — the curation monitoring aggregate an operator reads "
    "before deciding which sources to downweight: per source, exact-copy "
    "count/rate (corpus-wide md5 groups, non-canonical copies attributed "
    "to the source that contributed them — x1's canonical-min rule), "
    "near-dup exposure count/rate (docs appearing in ANY x2 candidate "
    "pair at jaccard >= 0.5 — the SAME memoized pair set x11/x24/x36/x37 "
    "consume, so the dashboard is consistent with the dedup pipeline it "
    "monitors and costs no new pair-gen), and size mass (sum/mean "
    "chars). Scale: one slim md5-keyed exchange for the exact groups, "
    "the pair-set's ids collapse to a distinct broadcast-sized flag "
    "table (near-dup survivors are a vanishing corpus fraction; if a "
    "corpus breaks that, flip the flag join to a shuffle — semantics "
    "unchanged), one partial-agg source exchange on top. Rates are "
    "single IEEE divisions of bigint-cast doubles. The exact-copy arm "
    "is an honest 0 on this fixture (no byte-identical texts at sf0.01 "
    "— the near-dup columns carry the discrimination).",
)
def x48_dedup_dashboard(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select("doc_id", "source", "text", "n_chars")
    eh = (
        d.select("doc_id", F.md5("text").alias("h"))
        .groupBy("h")
        .agg(F.count("*").alias("n"), F.min("doc_id").alias("canon"))
    )
    nd = (
        _shared_neardup_pairs(spark, sf_dir)
        .select(F.col("id_a").alias("doc_id"))
        .union(_shared_neardup_pairs(spark, sf_dir).select(F.col("id_b")))
        .distinct()
        .withColumn("is_near", F.lit(1))
    )
    f = (
        d.withColumn("h", F.md5("text"))
        .join(eh, "h")
        .join(F.broadcast(nd), "doc_id", "left")
        .select(
            "source",
            "n_chars",
            F.when((F.col("n") > 1) & (F.col("doc_id") != F.col("canon")), 1)
            .otherwise(0)
            .alias("is_copy"),
            F.coalesce(F.col("is_near"), F.lit(0)).alias("is_near"),
        )
    )
    return (
        f.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("is_copy").cast("bigint").alias("n_exact_copies"),
            (F.sum("is_copy").cast("double") / F.count("*").cast("double")).alias(
                "exact_dup_rate"
            ),
            F.sum("is_near").cast("bigint").alias("n_neardup_docs"),
            (F.sum("is_near").cast("double") / F.count("*").cast("double")).alias(
                "neardup_rate"
            ),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
            (F.sum("n_chars").cast("double") / F.count("*").cast("double")).alias(
                "mean_chars"
            ),
        )
        .orderBy("source")
    )


@register(
    "x53_minhash_calibration",
    oracle="WITH "
    + _x2_pair_ctes()
    + """
SELECT p.id_a, p.id_b,
       CAST(list_sum(list_transform(generate_series(1, 64),
            i -> CASE WHEN a.sig[i] = b.sig[i] THEN 1 ELSE 0 END))
         AS BIGINT) AS match_slots,
       CAST(list_sum(list_transform(generate_series(1, 64),
            i -> CASE WHEN a.sig[i] = b.sig[i] THEN 1 ELSE 0 END))
         AS DOUBLE) / 64 AS est_jaccard,
       p.jaccard AS exact_jaccard
FROM pairs p
JOIN s a ON a.doc_id = p.id_a
JOIN s b ON b.doc_id = p.id_b
WHERE p.jaccard >= 0.5
ORDER BY p.id_a, p.id_b
""",
    doc="X53: MinHash estimator calibration — per x2 candidate pair, the "
    "sketch's OWN similarity estimate (matching signature slots / 64; "
    "E[match/k] = true Jaccard is the MinHash theorem) beside the exact "
    "Jaccard over the raw shingle-hash sets: the 'can I trust the "
    "sketch on THIS corpus' diagnostic that tells an operator whether "
    "64 permutations suffice before they run sketch-only dedup at full "
    "scale (stddev ≈ sqrt(J(1−J)/64) ≈ 0.06 at J=0.5 — the property "
    "test pins the observed error inside a 3σ envelope). Population = "
    "the memoized jaccard >= 0.5 pair set (the pairs the dedup pipeline "
    "ACTS on — the right place to measure trust; the oracle applies the "
    "same threshold explicitly). Same signature construction and "
    "identical permutation literals as x2/t21; the slot-match count is "
    "an exact integer HOF fold "
    "(zip_with + aggregate, JVM-side), est = ONE IEEE division by the "
    "exact constant 64. Scale: pairs are the LSH candidate set (never "
    "all-pairs); each pair joins two signature rows — 64-int arrays, "
    "slim — on doc_id.",
)
def x53_minhash_calibration(spark, sf_dir):
    from ez_cdc_spark.operators.dedup import minhash_signature, shingle_hashes

    pairs = _shared_neardup_pairs(spark, sf_dir).select("id_a", "id_b", "jaccard")
    # Signatures ONLY for docs that appear in a pair (a vanishing corpus
    # fraction) — a full-corpus signature pass here would redo x2's
    # dominant cost for rows the join immediately drops. And the shingle
    # hash array MUST materialize as a column before the signature
    # consumes it: inlining minhash_signature(shingle_hashes(...)) makes
    # every one of the 64 slot expressions re-evaluate the md5 shingle
    # array per row (CollapseProject only guards aliases that exist), a
    # 64x recompute measured at 166 s vs ~2 s at sf0.1.
    ids = (
        pairs.select(F.col("id_a").alias("doc_id"))
        .union(pairs.select(F.col("id_b")))
        .distinct()
    )
    d = t(spark, sf_dir, "documents").join(ids, "doc_id", "leftsemi")
    hs = d.select(
        "doc_id",
        shingle_hashes(F.split(F.col("text"), r"\s+"), 3, portable=True).alias("hs"),
    )
    sigs = hs.select(
        "doc_id", minhash_signature(F.col("hs"), num_hashes=64).alias("sig")
    )
    a = sigs.select(F.col("doc_id").alias("id_a"), F.col("sig").alias("sig_a"))
    b = sigs.select(F.col("doc_id").alias("id_b"), F.col("sig").alias("sig_b"))
    match = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    ).cast("bigint")
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            match.alias("match_slots"),
            (match.cast("double") / F.lit(64)).alias("est_jaccard"),
            F.col("jaccard").alias("exact_jaccard"),
        )
        .orderBy("id_a", "id_b")
    )


@register(
    "x55_cluster_size_histogram",
    oracle="WITH RECURSIVE "
    + _x2_pair_ctes()
    + r""",
e AS (
  SELECT id_a AS src, id_b AS dst FROM pairs WHERE jaccard >= 0.5
  UNION
  SELECT id_b, id_a FROM pairs WHERE jaccard >= 0.5
), n AS (SELECT DISTINCT src AS id FROM e),
walk(id, lbl) AS (
  SELECT id, id FROM n
  UNION
  SELECT e.dst, walk.lbl FROM walk JOIN e ON e.src = walk.id
), cc AS (SELECT id, MIN(lbl) AS lbl FROM walk GROUP BY id),
sz AS (SELECT lbl, CAST(COUNT(*) AS BIGINT) AS cluster_size FROM cc GROUP BY lbl)
SELECT cluster_size,
       CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(cluster_size * COUNT(*) AS BIGINT) AS n_docs,
       CAST((cluster_size - 1) * COUNT(*) AS BIGINT) AS n_removable
FROM sz GROUP BY cluster_size
ORDER BY cluster_size
""",
    doc="X55: near-dup cluster-SIZE distribution — the capacity-planning "
    "view of the dedup graph (x48 tells you WHICH sources are dirty; "
    "x55 tells you the SHAPE of the duplication: many pairs, or a few "
    "mega-clusters?): per cluster size, how many clusters, how many "
    "docs they hold, and how many docs dedup would remove "
    "(size−1 per cluster — the keep-one-canonical rule x24 applies). "
    "Σ n_removable over rows IS the corpus's total dedup yield, and a "
    "heavy tail here is the early warning that a boilerplate family is "
    "collapsing into one giant component (the classic LSH failure "
    "x19's band caps guard against). Reuses the session-memoized CC "
    "labels (the Lloyd-style propagation paid once across "
    "x11/x24/x36/x37/x55); two tiny aggregations over label rows — "
    "nothing corpus-sized moves. Oracle: the SAME recursive-CTE "
    "component labels as x11, re-aggregated.",
)
def x55_cluster_size_histogram(spark, sf_dir):
    cc = _shared_neardup_cc(spark, sf_dir)
    sz = cc.groupBy("cluster_id").agg(F.count("*").cast("bigint").alias("cluster_size"))
    return (
        sz.groupBy("cluster_size")
        .agg(F.count("*").cast("bigint").alias("n_clusters"))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters")).cast("bigint").alias("n_docs"),
            ((F.col("cluster_size") - 1) * F.col("n_clusters"))
            .cast("bigint")
            .alias("n_removable"),
        )
        .orderBy("cluster_size")
    )


@register(
    "x57_incremental_lsh",
    oracle="WITH "
    + _x2_pair_ctes()
    + r"""
SELECT CAST(CASE WHEN id_a % 5 = 0 THEN id_a ELSE id_b END AS BIGINT) AS doc_id,
       CAST(CASE WHEN id_a % 5 = 0 THEN id_b ELSE id_a END AS BIGINT) AS corpus_id,
       jaccard
FROM pairs
WHERE (id_a % 5 = 0) <> (id_b % 5 = 0)
ORDER BY doc_id, corpus_id
""",
    doc="X57: incremental LSH index maintenance — x44's "
    "periodic-build/continuous-serve shape applied to the banded MinHash "
    "index (x2f answers 'is this batch doc already in the corpus'; x57 "
    "is the INDEX-SIDE contract that makes answering cheap): the corpus "
    "band rows (doc_id, band_id, band_sig) are the stored index, the "
    "new batch (doc_id % 5 = 0) computes ONLY ITS OWN signatures and "
    "PROBES the index with an equi-join on (band_id, band_sig) — no "
    "corpus×corpus pair generation anywhere in the plan (the full x2 "
    "pair set never materializes; plan-asserted band-key join, "
    "cartesian-free), then exact-Jaccard-verifies just the candidate "
    "pairs. Emits every verified cross pair with its jaccard — the "
    "rows a maintainer appends to the pair log before appending the "
    "batch's own band rows to the index. At 100 TB: batch-sized work "
    "per ingest (batch bands shuffle; the index side is a stored table "
    "bucketed by band_sig in production), vs x2f's "
    "recompute-the-world. Property-tested equal to the cross-split "
    "slice of the full x2 candidate set.",
)
def x57_incremental_lsh(spark, sf_dir):
    from ez_cdc_spark.functions.text import words
    from ez_cdc_spark.operators.dedup import minhash_signature, shingle_hashes

    d = t(spark, sf_dir, "documents")
    num_hashes, bands = 64, 16
    rows_per_band = num_hashes // bands
    # shingle once; project the hash array BEFORE deriving the signature
    # (the x53/t21 CollapseProject lesson)
    shingled = (
        widen_partitions(d.select("doc_id", "text"))
        .select("doc_id", words(F.col("text")).alias("ws"))
        .select(
            "doc_id",
            shingle_hashes(F.col("ws"), 3, portable=True).alias("shingles"),
        )
    )
    sig = shingled.withColumn(
        "minhash", minhash_signature(F.col("shingles"), num_hashes)
    )
    banded = sig.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.array_join(
                        F.transform(
                            F.slice(
                                F.col("minhash"),
                                b * rows_per_band + 1,
                                rows_per_band,
                            ),
                            lambda v: v.cast("string"),
                        ),
                        ",",
                    )
                ),
            )
        ),
    ).select("doc_id", F.col("pos").alias("band_id"), F.col("col").alias("band_sig"))

    is_new = (F.col("doc_id") % 5) == 0
    index = banded.filter(~is_new).select(
        F.col("doc_id").alias("corpus_id"), "band_id", "band_sig"
    )
    probe = banded.filter(is_new)
    cand = (
        probe.join(index, ["band_id", "band_sig"])
        .select("doc_id", "corpus_id")
        .dropDuplicates(["doc_id", "corpus_id"])
    )
    with_sh = cand.join(
        shingled.select(F.col("doc_id").alias("doc_id"), F.col("shingles").alias("sh_a")),
        "doc_id",
    ).join(
        shingled.select(
            F.col("doc_id").alias("corpus_id"), F.col("shingles").alias("sh_b")
        ),
        "corpus_id",
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return with_sh.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("corpus_id").cast("bigint").alias("corpus_id"),
        F.round(inter / union, 4).alias("jaccard"),
    ).orderBy("doc_id", "corpus_id")


@register(
    "x64_neardup_contamination",
    oracle="WITH "
    + _x2_pair_ctes()
    + r""",
cross_pairs AS (
  SELECT CASE WHEN id_a % 7 = 0 THEN id_b ELSE id_a END AS corpus_id,
         CASE WHEN id_a % 7 = 0 THEN id_a ELSE id_b END AS bench_id,
         jaccard
  FROM pairs
  WHERE ((id_a % 7 = 0) <> (id_b % 7 = 0)) AND jaccard >= 0.5
)
SELECT CAST(corpus_id AS BIGINT) AS corpus_id,
       CAST(COUNT(*) AS BIGINT) AS n_bench_neardups,
       MAX(jaccard) AS top_jaccard,
       CAST(MIN(bench_id) AS BIGINT) AS example_bench_id
FROM cross_pairs GROUP BY corpus_id ORDER BY corpus_id
""",
    doc="X64: NEAR-dup benchmark contamination (r11 verdict #5) — x12 "
    "catches verbatim leakage (shared exact 5-grams); x64 catches the "
    "paraphrased/format-shifted leakage exact grams miss, by probing the "
    "benchmark docs against the corpus LSH index: "
    "operators/dedup.py:lsh_probe_pairs — x57's index-probe path verbatim "
    "with the BENCHMARK side as the batch — then the dedup-grade "
    "J >= 0.5 gate and a per-corpus-doc report (how many benchmark "
    "near-dups, the worst jaccard, an example benchmark id). Benchmark "
    "slice: doc_id % 7 == 0 (x12's % 97 slice is near-dup-vacuous on "
    "this fixture — its 25-pair near-dup population crosses a 1% split "
    "zero times; % 7 stands in for the eval suite with 9 cross pairs). "
    "Shingles come from the session-shared set table "
    "(_shared_shingle_sets), so the corpus-side materialization is the "
    "same one x2/x61 already paid. The ORACLE is deliberately the other "
    "algorithm: the full x2 pair CTEs cross-filtered to benchmark x "
    "corpus — hash-green proves the probe path computes exactly the "
    "cross-split slice without ever generating corpus x corpus pairs "
    "(plan-asserted band-key join, cartesian-free). A planted-near-dup "
    "recall test (paraphrase-perturbed copies must be recovered at "
    "J >= 0.5) pins the detection property itself. At 100 TB: benchmark-"
    "sized probe work against a stored band index — contamination "
    "screening costs the benchmark, not the corpus.",
)
def x64_neardup_contamination(spark, sf_dir):
    from ez_cdc_spark.operators.dedup import lsh_probe_pairs

    shingled, banded = _shared_probe_tables(spark, sf_dir)
    pairs = lsh_probe_pairs(shingled, (F.col("doc_id") % 7) == 0, banded=banded)
    return (
        pairs.filter(F.col("jaccard") >= 0.5)
        .groupBy(F.col("corpus_id").cast("bigint").alias("corpus_id"))
        .agg(
            F.count("*").cast("bigint").alias("n_bench_neardups"),
            F.max("jaccard").alias("top_jaccard"),
            F.min("probe_id").cast("bigint").alias("example_bench_id"),
        )
        .orderBy("corpus_id")
    )


@register(
    "x65_contamination_removal",
    oracle="WITH "
    + _x2_pair_ctes()
    + r""",
flagged AS (
  SELECT DISTINCT CASE WHEN id_a % 7 = 0 THEN id_b ELSE id_a END AS doc_id
  FROM pairs
  WHERE ((id_a % 7 = 0) <> (id_b % 7 = 0)) AND jaccard >= 0.5
), corpus AS (
  SELECT d.doc_id, d.source, d.n_chars,
         CASE WHEN f.doc_id IS NOT NULL THEN 1 ELSE 0 END AS is_flagged
  FROM documents d LEFT JOIN flagged f USING (doc_id)
  WHERE d.doc_id % 7 <> 0
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(is_flagged) AS BIGINT) AS n_removed,
       CAST(COUNT(*) - SUM(is_flagged) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN is_flagged = 0 THEN n_chars ELSE 0 END) AS BIGINT)
         AS chars_kept
FROM corpus GROUP BY source ORDER BY source
""",
    doc="X65: contamination REMOVAL transform — x64 flags, x65 acts (the "
    "flag→act completion, exactly as x50's span removal completed x45's "
    "span diagnostic): corpus docs with any benchmark near-dup at "
    "J >= 0.5 are dropped via a LEFT ANTI-join against the flagged-id "
    "set, and the per-source accounting reconciles EXACTLY with x64's "
    "report — n_docs = n_removed + n_kept per source (pytest-pinned "
    "against x64's flagged ids, plus chars_kept = the kept docs' "
    "n_chars sum, the number a training-mix planner actually consumes). "
    "The flagged-id set comes from the same lsh_probe_pairs machinery "
    "over the session-shared shingle table, so x65 after x64 costs the "
    "anti-join + one aggregate. Oracle: the shared pair CTEs "
    "cross-filtered and LEFT-joined back to documents — a different "
    "join shape (outer + CASE) than the engine's anti-join, so "
    "hash-green proves the removal relation, not the code. At 100 TB: "
    "the flagged set is benchmark-bounded (tiny) and broadcasts; the "
    "corpus is scanned once map-side — removal costs one pass, like "
    "every x7-family gate.",
)
def x65_contamination_removal(spark, sf_dir):
    from ez_cdc_spark.operators.dedup import lsh_probe_pairs

    shingled, banded = _shared_probe_tables(spark, sf_dir)
    flagged = (
        lsh_probe_pairs(shingled, (F.col("doc_id") % 7) == 0, banded=banded)
        .filter(F.col("jaccard") >= 0.5)
        .select(F.col("corpus_id").alias("doc_id"))
        .distinct()
    )
    # ONE corpus pass: the benchmark-bounded flagged set broadcasts into a
    # LEFT join and removal + accounting fold into a single conditional
    # aggregate — the anti-join semantics expressed as is_flagged IS NULL
    # (scanning documents twice for per_source + kept would double the
    # corpus I/O the doc advertises as one pass).
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") % 7 != 0)
    marked = d.join(
        F.broadcast(flagged.withColumn("__f", F.lit(1))), "doc_id", "left"
    )
    kept = F.col("__f").isNull()
    return (
        marked.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.when(~kept, 1).otherwise(0)).cast("bigint").alias("n_removed"),
            F.sum(F.when(kept, 1).otherwise(0)).cast("bigint").alias("n_kept"),
            F.sum(F.when(kept, F.col("n_chars")).otherwise(0))
            .cast("bigint")
            .alias("chars_kept"),
        )
        .orderBy("source")
    )


@register(
    "x51_cluster_keywords",
    oracle=_x38_cte()
    + r""",
tok AS (
  SELECT a.cid, unnest(regexp_split_to_array(d.text, '\s+')) AS w
  FROM a3 a JOIN documents d ON d.doc_id = a.vec_id
), ctf AS (
  SELECT cid, w, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok GROUP BY cid, w
), cdf AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS df
  FROM (SELECT DISTINCT cid, w FROM ctf) GROUP BY w
), sc AS (
  SELECT c.cid, c.w, c.cnt, f.df,
         c.cnt * CAST(ROUND(ln(8.0 / f.df), 6) AS DECIMAL(18,6)) AS score
  FROM ctf c JOIN cdf f USING (w)
), r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY cid ORDER BY score DESC, w) AS rk
  FROM sc
)
SELECT CAST(cid AS BIGINT) AS cluster_id, CAST(rk AS BIGINT) AS rk,
       w AS token, cnt, df, CAST(score AS DOUBLE) AS ctfidf
FROM r WHERE rk <= 5
ORDER BY cluster_id, rk
""",
    doc="X51: per-cluster topic keywords (class-TF-IDF, BERTopic's c-TF-IDF "
    "over the engine's own k-means clustering) — WHAT each x38 embedding "
    "cluster is ABOUT, in tokens: joins the memoized Lloyd assignment "
    "(doc_id == vec_id, the x5 multimodal contract) to document text, "
    "counts tokens per cluster, and scores cnt × ln(k/df) where df = "
    "clusters containing the token — ubiquitous tokens (df = k) score "
    "exactly 0 and cluster-specific ones rise. The labeling step that "
    "turns clustering from a blocking key (x39 SemDeDup) into a "
    "human-auditable topic map for mixture decisions (x7b weights per "
    "TOPIC, not just per source). Determinism: the IDF factor is "
    "ROUND(ln,6) exact DECIMAL (x34's rule; df ∈ {1..k} gives 8 ln "
    "values, margin-guard-tested, ln(1) = exact 0), the score is an "
    "exact BIGINT × DECIMAL product RANKED as decimal (ties impossible "
    "to mis-order cross-engine) with (score DESC, token) total order, "
    "and only the rendered column casts to DOUBLE. 100 TB shape: "
    "corpus collapses to the (cluster, token) histogram via one "
    "partial-agg exchange (x49's rule); df is a token-keyed count over "
    "distinct (cid, w) rows; the rank window touches k × vocab rows "
    "only; the Lloyd assignment cost is session-memoized across the "
    "x38 family.",
)
def x51_cluster_keywords(spark, sf_dir):
    from ez_cdc_spark.sources.tables import load_table

    assigned = _kmeans_assign(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = (
        assigned.select("vec_id", "cid")
        .join(d, assigned.vec_id == d.doc_id)
        .select("cid", F.explode(F.split("text", r"\s+")).alias("w"))
    )
    ctf = tok.groupBy("cid", "w").agg(F.count("*").cast("bigint").alias("cnt"))
    cdf = (
        ctf.select("cid", "w")
        .distinct()
        .groupBy("w")
        .agg(F.count("*").cast("bigint").alias("df"))
    )
    idf = F.round(F.log(F.lit(8.0) / F.col("df")), 6).cast("decimal(18,6)")
    sc = ctf.join(cdf, "w").select(
        "cid", "w", "cnt", "df", (F.col("cnt") * idf).alias("score")
    )
    wr = Window.partitionBy("cid").orderBy(F.desc("score"), F.asc("w"))
    return (
        sc.withColumn("rk", F.row_number().over(wr).cast("bigint"))
        .filter(F.col("rk") <= 5)
        .select(
            F.col("cid").cast("bigint").alias("cluster_id"),
            "rk",
            F.col("w").alias("token"),
            "cnt",
            "df",
            F.col("score").cast("double").alias("ctfidf"),
        )
        .orderBy("cluster_id", "rk")
    )


@register(
    "x52_cluster_balanced_mix",
    oracle=_x38_cte()
    + r""",
dc AS (
  SELECT a.cid, d.doc_id
  FROM a3 a JOIN documents d ON d.doc_id = a.vec_id
), nc AS (
  SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_docs FROM dc GROUP BY cid
), w AS (
  SELECT cid, n_docs,
         least(1000000, greatest(10000,
           ((SELECT SUM(n_docs) FROM nc) // 8) * 1000000 // n_docs
         )) AS weight_ppm
  FROM nc
), s AS (
  SELECT dc.cid, dc.doc_id
  FROM dc JOIN w USING (cid)
  WHERE CAST('0x' || substr(md5(CAST(dc.doc_id AS VARCHAR)), 1, 8) AS BIGINT)
        % 1000000 < w.weight_ppm
)
SELECT CAST(w.cid AS BIGINT) AS cluster_id,
       w.n_docs,
       CAST(w.weight_ppm AS BIGINT) AS weight_ppm,
       CAST(COUNT(s.doc_id) AS BIGINT) AS n_sampled,
       CAST(MIN(s.doc_id) AS BIGINT) AS min_doc,
       CAST(MAX(s.doc_id) AS BIGINT) AS max_doc
FROM w LEFT JOIN s USING (cid)
GROUP BY w.cid, w.n_docs, w.weight_ppm
ORDER BY cluster_id
""",
    doc="X52: cluster-balanced mixture weights — x7b's source-weighting "
    "step recomputed per TOPIC (the x38 embedding cluster), closing the "
    "loop clustering (x38) -> labeling (x51) -> mixing: per-cluster "
    "retention weights that equalize topic mass in the training mix "
    "instead of trusting source labels. Weight is pure integer "
    "parts-per-million: target = total div k docs per cluster, "
    "weight_ppm = clamp(target * 1e6 div n_c, 1% floor, 100% cap) — "
    "over-represented topics are down-sampled toward the uniform "
    "target, small topics keep everything, and the 1% floor guarantees "
    "no topic is annihilated (the x7c floor/cap discipline applied "
    "downward). Membership is the portable md5 hash gate (x7's rule): "
    "doc survives iff phash(doc_id) % 1e6 < weight_ppm, so the sample "
    "is deterministic, reproducible cross-engine, and consistent with "
    "every other phash-gated sample in the engine. All arithmetic is "
    "non-negative BIGINT, so Spark's truncating div == DuckDB's "
    "flooring // (x38's rule); counts to ~1e12 docs keep "
    "target*1e6 < 2^63. 100 TB shape: the weight table is k rows "
    "(broadcast back), the gate is a map-side filter on the corpus — "
    "the only exchanges are the k-row aggregates and the memoized "
    "Lloyd assignment the whole x38 family shares. Oracle: the same "
    "integer spec over the unrolled DuckDB k-means CTE.",
)
def x52_cluster_balanced_mix(spark, sf_dir):
    from ez_cdc_spark.sources.tables import load_table

    assigned = _kmeans_assign(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    dc = (
        assigned.select("vec_id", "cid")
        .join(d, assigned.vec_id == d.doc_id)
        .select("cid", "doc_id")
    )
    nc = dc.groupBy("cid").agg(F.count("*").cast("bigint").alias("n_docs"))
    total = nc.agg(F.sum("n_docs").cast("bigint").alias("total"))
    w = nc.crossJoin(F.broadcast(total)).select(
        "cid",
        "n_docs",
        F.expr(
            "least(cast(1000000 as bigint), greatest(cast(10000 as bigint), "
            "(total div 8) * 1000000 div n_docs))"
        ).alias("weight_ppm"),
    )
    gate = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 1000000
    )
    s = (
        dc.join(F.broadcast(w.select("cid", "weight_ppm")), "cid")
        .filter(gate < F.col("weight_ppm"))
        .groupBy("cid")
        .agg(
            F.count("*").cast("bigint").alias("n_sampled"),
            F.min("doc_id").cast("bigint").alias("min_doc"),
            F.max("doc_id").cast("bigint").alias("max_doc"),
        )
    )
    return (
        w.join(F.broadcast(s), "cid", "left")
        .select(
            F.col("cid").cast("bigint").alias("cluster_id"),
            "n_docs",
            F.col("weight_ppm").cast("bigint"),
            F.coalesce("n_sampled", F.lit(0)).cast("bigint").alias("n_sampled"),
            "min_doc",
            "max_doc",
        )
        .orderBy("cluster_id")
    )


@register(
    "x60_hierarchy_flatten",
    oracle="""
WITH RECURSIVE edges AS (
  SELECT CAST(c_custkey AS BIGINT) AS id,
         CASE WHEN c_custkey <= 10 OR c_custkey % 7 = 0 THEN NULL
              ELSE CAST(c_custkey // 2 AS BIGINT) END AS parent
  FROM customer
), up AS (
  SELECT id AS c_custkey, id AS cur,
         CAST(0 AS BIGINT) AS depth, CAST(0 AS BIGINT) AS path_sum
  FROM edges
  UNION ALL
  SELECT u.c_custkey, e.parent, u.depth + 1, u.path_sum + e.parent
  FROM up u JOIN edges e ON e.id = u.cur
  WHERE e.parent IS NOT NULL
)
SELECT u.c_custkey, u.cur AS root_id, u.depth, u.path_sum
FROM up u JOIN edges e ON e.id = u.cur
WHERE e.parent IS NULL
ORDER BY u.c_custkey
""",
    doc="X60: hierarchy flatten / transitive closure to root — the "
    "recursive-CTE capability class (org charts, BOM explosion, category "
    "trees, reply threads). Spark has no WITH RECURSIVE, so the naive "
    "port walks one parent edge per join: O(depth) shuffle rounds — at "
    "100 TB a depth-30 hierarchy is 30 sequential shuffles. This "
    "implements POINTER DOUBLING instead: state (id, anc, depth-to-anc, "
    "sum-of-ancestor-keys-to-anc) self-joined on anc==id doubles the "
    "covered distance every round, so exactly 5 rounds resolve any "
    "depth <= 2^5 = 32 (the fixture forest's halving parent rule bounds "
    "depth by log2(N): 11 at sf0.01, 31 at 1.5e9 customers — the spec "
    "pins 5 rounds and a property test asserts the margin). Roots are "
    "their own fixpoint (anc=self, d=0, s=0), so converged rows pass "
    "through later rounds unchanged — no convergence test, no early "
    "exit, bit-deterministic. Every value is BIGINT arithmetic (depth "
    "add, key sum): zero floats end-to-end. Each round is one slim "
    "equi-join (4-column state, never the customer payload) with "
    "localCheckpoint truncating lineage (x11/x37's iterative pattern — "
    "plan depth O(1) per round). The synthetic forest derives "
    "deterministically from the dense customer key domain: parent = "
    "id div 2 except roots at id <= 10 or id % 7 = 0. Oracle: DuckDB "
    "native WITH RECURSIVE over the identical edge rule — the engines "
    "agree via entirely different evaluation strategies (rowwise "
    "fixpoint vs logarithmic batch doubling).",
)
def x60_hierarchy_flatten(spark, sf_dir):
    from ez_cdc_spark.operators.hierarchy import pointer_double_flatten

    ids = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("bigint").alias("id")
    )
    is_root = (F.col("id") <= 10) | (F.col("id") % 7 == 0)
    edges = ids.select(
        "id",
        F.when(is_root, F.lit(None).cast("bigint"))
        .otherwise(F.expr("id div 2").cast("bigint"))
        .alias("parent"),
    )
    # State invariant (pointer_double_flatten): anc is an ancestor of id;
    # d = #edges on id->anc; s = sum of keys on (id, anc]. 5 rounds cover
    # depth <= 32; the halving forest's depth is log2(N) (11 at sf0.01).
    state = pointer_double_flatten(edges, rounds=5)
    return state.select(
        F.col("id").alias("c_custkey"),
        F.col("anc").alias("root_id"),
        F.col("d").alias("depth"),
        F.col("s").alias("path_sum"),
    ).orderBy("c_custkey")


@register(
    "x61_prefix_filter_join",
    oracle=r"""
WITH w AS (
  SELECT doc_id, regexp_split_to_array(text, '\s+') AS ws FROM documents
), g AS (
  SELECT doc_id,
         CASE WHEN len(ws) >= 3 THEN list_transform(
                generate_series(1, len(ws) - 2),
                i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
              ELSE CAST([] AS VARCHAR[]) END AS grams
  FROM w
), s AS (
  SELECT doc_id, list_distinct(grams) AS ss FROM g WHERE len(grams) > 0
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(len(a.ss) AS BIGINT) AS n_a,
       CAST(len(b.ss) AS BIGINT) AS n_b,
       CAST(len(list_intersect(a.ss, b.ss)) AS BIGINT) AS inter_size,
       CAST(len(list_intersect(a.ss, b.ss)) AS DOUBLE)
         / CAST(len(a.ss) + len(b.ss) - len(list_intersect(a.ss, b.ss)) AS DOUBLE)
         AS jaccard
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE 2 * len(list_intersect(a.ss, b.ss))
      >= 1 * (len(a.ss) + len(b.ss) - len(list_intersect(a.ss, b.ss)))
ORDER BY id_a, id_b
""",
    doc="X61: prefix-filter EXACT set-similarity self-join (PPJoin-lite) — "
    "the exact complement to x2's MinHash-LSH approximation over the SAME "
    "unit (distinct 3-gram word shingles, same g/s CTE shapes as the x2 "
    "oracle family), J >= 1/2. operators/dedup.py:prefix_similarity_join: "
    "global shingle frequencies -> rarest-first ordering -> each doc "
    "emits only its first |d| - ceil(tau|d|) + 1 shingles as join keys "
    "(prefix-filter completeness: a qualifying pair MUST collide in its "
    "prefixes; property-tested as candidates ⊇ exact-pairs against an "
    "independent Python reimplementation of ALL THREE filters) -> "
    "self-join on prefix shingle pruned in-join by PPJoin's length and "
    "positional filters (both implied by J >= tau; 3.3x fewer candidates "
    "and ~3x wall at sf0.1, set table checkpoint-materialized once for "
    "its three consumers — x40's pattern) "
    "-> exact Jaccard verify on candidates only, with the threshold gate "
    "in INTEGER arithmetic (tau_den*inter >= tau_num*union) so no float "
    "boundary can flip membership; the reported jaccard is the single "
    "IEEE division of two exact ints (§5.3 rule 3). The ORACLE is the "
    "brute-force all-pairs definition — deliberately a DIFFERENT "
    "algorithm, so the hash check proves the filtered join computes the "
    "same relation, not the same code. At 100 TB: no corpus x corpus "
    "anywhere — the self-join is on prefix shingles (bucket width = docs "
    "per rare shingle), the frequency table shuffles rather than assuming "
    "broadcastability (x59's bigram rule), verify cost ∝ candidates. "
    "Plan-asserted cartesian-free.",
)
def x61_prefix_filter_join(spark, sf_dir):
    from ez_cdc_spark.operators.dedup import prefix_similarity_join

    d = t(spark, sf_dir, "documents")
    # r12: the set table is the session-shared one — the SAME materialized
    # unit the x2 MinHash family hashes (_shared_shingle_sets), so the ~5 s
    # split→shingle→distinct cost is paid once per session across both
    # dedup families; x61's marginal cost is prefix-gen + verify.
    return prefix_similarity_join(
        d, tau_num=1, tau_den=2, sets_df=_shared_shingle_sets(spark, sf_dir)
    ).orderBy("id_a", "id_b")


@register(
    "x2eb_lsh_recall_anchor",
    oracle="""
WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM v a JOIN v b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.v, b.v) >= 0.4
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_exact,
       CAST(0 AS BIGINT) AS false_positives,
       TRUE AS recall_ge_090
FROM pairs
""",
    doc="X2eb: DRIVER-VISIBLE anchor for x2e (r15 verdict 'what's wrong' "
    "#2): one row relating the LSH-bucketed near-dup pair set to the "
    "exact x2d pair set — the exact pair count, the LSH path's false "
    "positives (must be 0: in-bucket exact-cosine verification admits "
    "nothing below threshold), and the boolean recall >= 0.90. The "
    "oracle computes the exact pair count from the same DuckDB "
    "cosine self-join that hash-anchors x2d and states 0/TRUE "
    "declaratively — hash-green holds iff the approximate path's "
    "exactness contract holds, visible in the CORRECTNESS artifact "
    "without consulting pytest. (x2e itself stays rows-only: its pair "
    "set is approximate by construction.)",
)
def x2eb_lsh_recall_anchor(spark, sf_dir):
    from ez_cdc_spark.functions.similarity import lsh_neardup_pairs, neardup_pairs

    e = t(spark, sf_dir, "embeddings")
    # Optimization r19 (guide §5 caching): both pair sets feed TWO
    # consumers each — their own count and the semi-join — so without a
    # pin the brute-force GEMM (exact) and the LSH banding pipeline each
    # execute twice per run. The pair lists are threshold-bounded; pin
    # them for the three tiny aggregates. r20 (ADVICE r19): the pin is a
    # per-invocation eager localCheckpoint, NOT persist() — persist
    # registers the PLAN in the CacheManager with no release path here
    # (the caller consumes the returned frame), so a repeated invocation
    # would silently read the previous run's cache instead of executing
    # the pipelines, and the entries would pin executor memory for the
    # session. The checkpoint is keyed to this invocation's RDD alone:
    # every run recomputes from the parquet input.
    exact = (
        neardup_pairs(e, threshold=0.4)
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)
    )
    lsh = (
        lsh_neardup_pairs(e, threshold=0.4, n_bits=64, bands=16)
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)
    )
    matched = lsh.join(exact, on=["id_a", "id_b"], how="left_semi")
    stats = exact.agg(F.count("*").alias("n_exact")).crossJoin(
        lsh.agg(F.count("*").alias("n_lsh"))
    ).crossJoin(matched.agg(F.count("*").alias("n_matched")))
    return stats.select(
        F.col("n_exact").cast("bigint").alias("n_exact"),
        (F.col("n_lsh") - F.col("n_matched")).cast("bigint").alias(
            "false_positives"
        ),
        (F.col("n_matched") >= F.lit(0.90) * F.col("n_exact")).alias(
            "recall_ge_090"
        ),
    )


@register(
    "x66_embedding_covariance",
    oracle="""
WITH idx AS (SELECT UNNEST(range(1, 65)) AS p),
q AS (
    SELECT vec_id, CAST(idx.p - 1 AS INT) AS i,
           CAST(FLOOR(CAST(embedding[idx.p] AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS q
    FROM embeddings CROSS JOIN idx
)
SELECT a.i AS i, b.i AS j,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(a.q) AS BIGINT) AS sum_i,
       CAST(SUM(b.q) AS BIGINT) AS sum_j,
       CAST(SUM(a.q * b.q) AS BIGINT) AS dot,
       CAST(COUNT(*) * SUM(a.q * b.q) - SUM(a.q) * SUM(b.q) AS DOUBLE)
           / CAST(COUNT(*) * COUNT(*) AS DOUBLE) AS cov
FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.i <= b.i
GROUP BY a.i, b.i
ORDER BY i, j
""",
    doc="X66: embedding covariance / Gram matrix — the distributed "
    "second-moment pass PCA, whitening, and ZCA all start from, computed "
    "the way it must be at 100 TB (functions/similarity.py:gram_moments): "
    "each partition folds its Arrow batches into ONE d x d int64 numpy "
    "partial (M^T M per batch, summed) and emits only the upper triangle, "
    "so the exchange carries O(partitions x d^2) tiny rows and the "
    "corpus is touched exactly once — never the O(n x d^2) exploded-pair "
    "shuffle of the posexplode self-join shape (which IS the oracle's "
    "formulation, deliberately: DuckDB computes the same moments by "
    "unnest + self-join, so hash-green proves the blocked accumulation "
    "against an independent algorithm). Exactness is structural, not "
    "rounded away: values quantize to integers (floor(v*1000 + 0.5) — one "
    "IEEE add + one floor, bit-identical in every engine; plain round() "
    "would diverge where the multiply lands ON a .5 boundary — numpy "
    "half-to-even vs SQL half-away), the moments are exact int64 (safe to "
    "~10^12 rows at unit norm), and the derived covariance is one IEEE "
    "division of exactly-converted integers (< 2^53), bit-identical "
    "across engines and partition layouts. Returns (i, j, n, sum_i, "
    "sum_j, dot, cov) for i <= j — 2080 rows at d=64, the full input to "
    "a driver-side eigendecomposition. At 100 TB: one data pass, "
    "d^2-bounded exchange, zero float-ordering hazard.",
)
def x66_embedding_covariance(spark, sf_dir):
    from ez_cdc_spark.functions.similarity import gram_moments

    emb = t(spark, sf_dir, "embeddings")
    m = gram_moments(emb, vec="embedding", scale=1000)
    return m.select(
        "i",
        "j",
        "n",
        "sum_i",
        "sum_j",
        "dot",
        (
            (F.col("n") * F.col("dot") - F.col("sum_i") * F.col("sum_j")).cast(
                "double"
            )
            / (F.col("n") * F.col("n")).cast("double")
        ).alias("cov"),
    ).orderBy("i", "j")
