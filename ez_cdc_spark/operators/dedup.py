"""Deduplication operators (north-star X1/X2 + training-pipeline dedup set):
exact hash, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

Scale design: every variant reduces to (fingerprint → shuffle on bucket →
within-bucket pair join). Nothing here is O(N²) on the full corpus — only
within-bucket, and bucket width is controlled by band/bit parameters. All
hashing is xxhash64 with fixed integer seeds → fully deterministic across
runs and cluster layouts.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, functions as F

from ez_cdc_spark.functions.text import ngrams_from_words, words
from ez_cdc_spark.sources.tables import widen_partitions

# Mersenne prime modulus for the minhash permutation family. 31-bit so that
# a*h + b stays well under 2^63 — the driver may run with ANSI mode on
# (Spark 4 default), where silent long wraparound becomes a runtime error.
_P = (1 << 31) - 1


def exact_dedup_groups(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """X1: group by content hash; keep min id as canonical, count copies."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count("*").cast("bigint").alias("n_copies"),
        )
    )


def portable_hash32(col) -> F.Column:
    """32-bit portable string hash: first 8 md5 hex chars as an int —
    bit-identical in any SQL engine (DuckDB:
    CAST('0x'||substr(md5(s),1,8) AS BIGINT)). Costlier than xxhash64 but
    makes banding/minhash pipelines oracle-checkable end to end."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def shingle_hashes(words_col, n: int = 3, portable: bool = False) -> F.Column:
    """Distinct hash values of word n-gram shingles (xxhash64 by default,
    :func:`portable_hash32` when ``portable``).

    Takes the pre-split words array (a bound column attribute), not raw text —
    see ngrams_from_words for why.
    """
    h = portable_hash32 if portable else F.xxhash64
    return F.array_distinct(
        F.transform(ngrams_from_words(words_col, n), lambda s: h(s))
    )


def minhash_signature(hashes: F.Column, num_hashes: int = 64) -> F.Column:
    """num_hashes-wide minhash signature via (a*h+b) mod p permutations.

    a/b are fixed per-slot constants derived from sha256 of the slot index,
    embedded as literals — driver-side, zero per-row cost, reproducible on
    any machine. All operands are reduced mod the 31-bit Mersenne prime:
    a ∈ [1, P-1], b/h ∈ [0, P-1], so a*h + b < 2^62 + 2^31 — exact under
    ANSI mode (Spark 4 default), no overflow.
    """
    hp = F.transform(hashes, lambda h: F.pmod(h, F.lit(_P)))

    def perm(a, b):
        # closure factory: HOF lambdas are dispatched on arity, so the inner
        # lambda must stay 1-ary (no default-arg captures)
        return lambda h: F.pmod(a * h + b, F.lit(_P))

    return F.array(
        *[
            F.array_min(F.transform(hp, perm(a, b)))
            for a, b in (_perm_coeffs(j) for j in range(num_hashes))
        ]
    )


def perm_coeff_ints(j: int) -> tuple[int, int]:
    """The (a, b) affine-permutation constants for minhash slot ``j`` as
    plain ints — shared with oracle-SQL generation so both engines embed
    the identical literals."""
    a = int.from_bytes(hashlib.sha256(f"minhash-a-{j}".encode()).digest()[:8], "big")
    b = int.from_bytes(hashlib.sha256(f"minhash-b-{j}".encode()).digest()[:8], "big")
    return a % (_P - 1) + 1, b % _P


def _perm_coeffs(j: int) -> tuple:
    a, b = perm_coeff_ints(j)
    return F.lit(a), F.lit(b)


def shingle_sets(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """The shared dedup unit: (doc_id, ss, n) where ``ss`` is the DISTINCT
    raw word ``shingle_n``-gram set and ``n`` its size. Both dedup families
    — MinHash-LSH (x2: hash ss per permutation slot) and the exact prefix
    filter (x61: order ss rarest-first) — consume this identical table, so
    a session that materializes it once (the x2/x61 query layer memoizes +
    localCheckpoints it) pays the split→shingle→distinct projection — the
    dominant per-row cost of either family — a single time. Zero-shingle
    docs (< shingle_n words) are dropped: they cannot reach any Jaccard
    threshold (empty intersection) and their all-identical empty signatures
    would otherwise funnel into one degenerate LSH bucket."""
    # widen_partitions: a single-row-group source file scans as ONE task,
    # which would serialize the CPU-heavy split→shingle→distinct projection
    # (and everything downstream of a checkpoint taken here) on one core —
    # the same reason the x2 path widened before shingling.
    ws = widen_partitions(
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("__text"))
    ).select("doc_id", words(F.col("__text")).alias("ws"))
    return (
        ws.select(
            "doc_id",
            F.array_distinct(ngrams_from_words(F.col("ws"), shingle_n)).alias("ss"),
        )
        .filter(F.size("ss") > 0)
        .select("doc_id", "ss", F.size("ss").cast("bigint").alias("n"))
    )


def minhash_lsh_candidates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    portable: bool = False,
    sets_df: DataFrame | None = None,
) -> DataFrame:
    """X2: banding — docs sharing any band signature become candidate pairs.

    rows-per-band = num_hashes / bands. Shuffle key is (band_id, band_sig):
    at 100 TB this is a single exchange + within-bucket self-join.
    Output: (id_a, id_b, jaccard) for candidates, exact shingle Jaccard
    verified (so no false positives leave the operator). ``portable``
    switches shingle hashing to the md5-derived form so a SQL oracle can
    reproduce the exact candidate set + jaccards (x2's driver check).

    ``sets_df`` (optional): a prebuilt :func:`shingle_sets` table — hashing
    a distinct raw-shingle set yields the identical hash set as hashing the
    raw n-gram stream (distinct commutes with a per-element map up to set
    equality, and every consumer below is set-shaped: array_min per
    permutation slot, array_intersect/union sizes), so the shared table is
    a drop-in; the equality is pinned in tests/test_properties.py.
    """
    h = portable_hash32 if portable else F.xxhash64
    if sets_df is not None:
        shingled = sets_df.select(
            "doc_id", F.array_distinct(F.transform("ss", lambda s: h(s))).alias("shingles")
        )
    else:
        shingled = (
            widen_partitions(
                docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("__text"))
            )
            .select("doc_id", words(F.col("__text")).alias("ws"))
            .select(
                "doc_id",
                shingle_hashes(F.col("ws"), shingle_n, portable=portable).alias("shingles"),
            )
        )
    # Optimization r19 (guide §8.4 step 1 "fingerprints only" / §5): the
    # shingle-hash table is consumed THREE times below — the banding
    # subtree plus both verify-join sides — and without pinning, each
    # consumer re-runs the split→shingle→hash projection over the raw
    # text, the dominant per-row CPU of the whole operator. Materialize
    # the proxy table once per invocation (eager local checkpoint, the
    # repo-wide pin idiom — r20 swaps the r19 lazy variant for eager:
    # same single execution, none of the lazy form's AQE rough edges).
    # Per-invocation only — nothing survives the call, every run
    # recomputes from the parquet input; persist() is deliberately NOT
    # used (a plan-keyed CacheManager entry with no release path would
    # hand later invocations the previous run's cache). Trade-off,
    # documented (ADVICE r19): localCheckpoint truncates lineage without
    # replication, so on a multi-executor cluster an executor loss after
    # materialization fails the job instead of recomputing — acceptable
    # for a per-invocation scratch table that any retry rebuilds from
    # the source in one pass. At 100 TB the pinned table is
    # (doc_id, array<long>) — the decision proxy of §8, far smaller than
    # the text it replaces, and the alternative is two extra full-corpus
    # text scans per run.
    shingled = shingled.localCheckpoint(eager=True)
    # Slim banding rows: (doc_id, band_id, band_sig) only — band_rows is
    # THE banding expression (r12 verdict #4 unified the two formerly
    # literal-identical copies; the probe family x57/x64/x65 shares it).
    # Shuffling the full shingle arrays through the 16x explode would
    # amplify the exchange 16x at 100 TB; shingles are re-joined below for
    # just the candidate pairs.
    banded = band_rows(shingled, num_hashes=num_hashes, bands=bands)

    # Bucket by band signature and emit all i<j pairs inside each bucket.
    # One shuffle over the slim banding rows; a self-join would evaluate the
    # whole minhash pipeline twice (once per join side).
    ids = F.sort_array(F.collect_list("doc_id"))
    buckets = (
        banded.groupBy("band_id", "band_sig")
        .agg(ids.alias("ids"))
        .filter(F.size("ids") > 1)
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    pairs = (
        buckets.select(F.explode(pair_structs).alias("p"))
        .select("p.id_a", "p.id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    with_sh = (
        pairs.join(shingled.select(F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a")), "id_a")
        .join(shingled.select(F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b")), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return with_sh.select(
        "id_a", "id_b", F.round(inter / union, 4).alias("jaccard")
    )


def band_rows(
    shingled: DataFrame, num_hashes: int = 64, bands: int = 16
) -> DataFrame:
    """The LSH index unit: (doc_id, band_id, band_sig) from a (doc_id,
    shingles) table — minhash signatures sliced into band hashes, the
    expression literal-for-literal minhash_lsh_candidates' (same
    permutation constants, same band hash). Factored out so the probe
    family (x64 contamination, x65 removal) can memoize ONE banded index
    per session instead of re-running the 64-permutation minhash per
    query — at scale this is the stored band table an index maintainer
    (x57) keeps on disk."""
    rows_per_band = num_hashes // bands
    sig = shingled.withColumn("minhash", minhash_signature(F.col("shingles"), num_hashes))
    return sig.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.array_join(
                        F.transform(
                            F.slice(F.col("minhash"), b * rows_per_band + 1, rows_per_band),
                            lambda v: v.cast("string"),
                        ),
                        ",",
                    )
                ),
            )
        ),
    ).select("doc_id", F.col("pos").alias("band_id"), F.col("col").alias("band_sig"))


def lsh_probe_pairs(
    shingled: DataFrame,
    is_probe,
    num_hashes: int = 64,
    bands: int = 16,
    banded: DataFrame | None = None,
) -> DataFrame:
    """Index-probe LSH (x57's probe path as a reusable unit, consumed by
    x64/x65): ``shingled`` is (doc_id, shingles) with the PORTABLE hash
    discipline; rows where ``is_probe`` (a boolean Column over doc_id) are
    the query batch, the rest are the stored index. Probe rows join the
    index on (band_id, band_sig) — NO all-pairs generation on either side,
    never index x index — then exact shingle Jaccard verifies just the
    candidates. Returns (probe_id, corpus_id, jaccard). ``banded``
    (optional): a prebuilt/memoized :func:`band_rows` table — callers that
    run several probes per session pass it so the minhash/banding cost is
    paid once (the stored-index reality x57 models)."""
    if banded is None:
        banded = band_rows(shingled, num_hashes=num_hashes, bands=bands)
    index = banded.filter(~is_probe).select(
        F.col("doc_id").alias("corpus_id"), "band_id", "band_sig"
    )
    probe = banded.filter(is_probe)
    cand = (
        probe.join(index, ["band_id", "band_sig"])
        .select(F.col("doc_id").alias("probe_id"), "corpus_id")
        .dropDuplicates(["probe_id", "corpus_id"])
    )
    with_sh = cand.join(
        shingled.select(F.col("doc_id").alias("probe_id"), F.col("shingles").alias("sh_a")),
        "probe_id",
    ).join(
        shingled.select(F.col("doc_id").alias("corpus_id"), F.col("shingles").alias("sh_b")),
        "corpus_id",
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return with_sh.select(
        "probe_id", "corpus_id", F.round(inter / union, 4).alias("jaccard")
    )


def token_hashes(text_col, portable: bool = False) -> F.Column:
    """Array of per-token hashes: xxhash64 by default (fastest JVM path),
    or the first 8 hex chars of md5 when ``portable`` — bit-identical in
    any SQL engine (DuckDB: CAST('0x'||substr(md5(w),1,8) AS BIGINT)),
    which is what makes the x2c driver oracle possible."""
    if portable:
        tok_hash = lambda w: F.conv(F.substring(F.md5(w), 1, 8), 16, 10).cast("long")  # noqa: E731
    else:
        tok_hash = F.xxhash64
    return F.transform(words(text_col), tok_hash)


def simhash_sql_bit_terms(bits: int = 32, hashes_expr: str = "hs") -> str:
    """DuckDB rendering of :func:`simhash_from_hashes` over a token-hash
    list column — the oracle-side mirror (same +1/-1 per-bit fold, same
    sign rule) used by the x2c and t12 oracles."""
    return " + ".join(
        f"(CASE WHEN list_sum(list_transform({hashes_expr}, h -> CASE WHEN "
        f"(h >> {i}) & 1 = 1 THEN 1 ELSE -1 END)) > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(bits)
    )


def simhash_from_hashes(hashes_col, bits: int = 32) -> F.Column:
    """SimHash fingerprint from a PRE-MATERIALIZED token-hash array.

    For each bit position, sum +1/-1 over token hash bits; the sign per
    position forms the fingerprint. Bit positions are unrolled in Python
    (shiftright needs a literal), producing pure column expressions; 32
    bits keeps every mask inside a positive long.

    ``hashes_col`` MUST be a materialized column attribute (projected in a
    previous select), not an inline expression: higher-order functions are
    evaluated interpreted (outside whole-stage codegen) and are not
    common-subexpression-eliminated, so an inline hash-array expression
    would be recomputed once per bit — 32x the token-hashing cost
    (measured ~3x the whole query at sf0.1).
    """
    assert bits <= 62, "fingerprint must fit a positive long"

    def bit_counter(i: int):
        # closure factory: the fold lambda must stay 2-ary (PySpark
        # dispatches higher-order-function lambdas on arity)
        return lambda acc, h: acc + F.when(
            F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    out = F.lit(0).cast("long")
    for i in range(bits):
        bit_count = F.aggregate(hashes_col, F.lit(0).cast("long"), bit_counter(i))
        out = out.bitwiseOR(F.when(bit_count > 0, F.lit(1 << i)).otherwise(0).cast("long"))
    return out


def simhash(text_col, bits: int = 32, portable: bool = False) -> F.Column:
    """SimHash of raw text as a single column expression. Prefer the
    two-step form (:func:`token_hashes` projected first, then
    :func:`simhash_from_hashes`) in any per-row hot path — see the
    recomputation note on simhash_from_hashes."""
    return simhash_from_hashes(token_hashes(text_col, portable=portable), bits)


def simhash_near_dups(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bits: int = 32,
    blocks: int = 4,
    portable: bool = False,
) -> DataFrame:
    """SimHash near-dup join: block the 64-bit fingerprint into ``blocks``
    chunks; pairs within ``max_hamming`` share at least one exact chunk
    (pigeonhole, since max_hamming < blocks), so the join key is
    (chunk_id, chunk_value) — no cross join; the blocking is LOSSLESS, so
    the result equals the all-pairs answer. Output pairs + hamming dist."""
    assert max_hamming < blocks, "pigeonhole blocking needs max_hamming < blocks"
    chunk_bits = bits // blocks
    mask = (1 << chunk_bits) - 1
    # Two-step: materialize the token-hash array, THEN fingerprint — the
    # 32 per-bit aggregates each re-read the array attribute instead of
    # re-hashing every token (HOFs are interpreted and not CSE'd).
    sh = (
        widen_partitions(
            docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("__text"))
        )
        .select("doc_id", token_hashes(F.col("__text"), portable=portable).alias("__th"))
        .select("doc_id", simhash_from_hashes(F.col("__th"), bits).alias("sh"))
    )
    chunked = sh.select(
        "doc_id",
        "sh",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("sh"), i * chunk_bits).bitwiseAND(F.lit(mask))
                    for i in range(blocks)
                ]
            )
        ),
    ).select("doc_id", "sh", F.col("pos").alias("chunk_id"), F.col("col").alias("chunk_val"))
    a, b = chunked.alias("a"), chunked.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.select("id_a", "id_b", ham.cast("bigint").alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


def connected_components(
    edges: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """Connected components over an undirected edge list via distributed
    min-label propagation — the clustering step of fuzzy dedup (pairs from
    LSH/SimHash become clusters; the curation run then keeps one doc per
    cluster).

    Each iteration: every node sends its current label to its neighbors,
    every node keeps the min of (own label, received labels). Converges in
    O(graph diameter) iterations; near-dup graphs are unions of small
    dense clusters, so the diameter — and the iteration count — stays tiny
    even at corpus scale. Every iteration is a pure (join + groupBy.min)
    pair of exchanges on (id) — no driver-side data beyond the scalar
    convergence counter, and ``localCheckpoint`` truncates the iterative
    lineage so plan size stays O(1) per iteration. For adversarially long
    path-shaped graphs, the two-phase large-star/small-star variant
    (O(log² n) rounds) is the documented swap-in; dedup graphs don't need
    it.

    Returns (id, cluster_id) where cluster_id = min node id reachable.
    """
    # Materialize the symmetrized edge list once: its lineage may be an
    # arbitrarily expensive upstream pipeline (e.g. the full MinHash-LSH
    # candidate generation), and it is re-joined EVERY iteration — without
    # this checkpoint each round would recompute the whole upstream plan.
    sym = (
        edges.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(edges.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
    ).localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("src").alias("id")).distinct().withColumn("lbl", F.col("id"))
    ).localCheckpoint(eager=True)
    for _ in range(max_iterations):
        # One aggregation computes BOTH the new label and the convergence
        # signal: own rows are tagged, so min(lbl) is the propagated label
        # and min(lbl where own) is the previous one — no extra join, and
        # the changed-count scan runs over the already-checkpointed result.
        msgs = sym.join(labels, sym["src"] == labels["id"]).select(
            F.col("dst").alias("id"), F.col("lbl"), F.lit(False).alias("own")
        )
        agg = (
            labels.withColumn("own", F.lit(True))
            .unionByName(msgs)
            .groupBy("id")
            .agg(
                F.min("lbl").alias("lbl"),
                F.min(F.when(F.col("own"), F.col("lbl"))).alias("old"),
            )
            .localCheckpoint(eager=True)
        )
        changed = agg.filter(F.col("lbl") < F.col("old")).count()
        labels = agg.select("id", "lbl")
        if changed == 0:
            break
    return labels.select("id", F.col("lbl").alias("cluster_id"))


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact n-gram Jaccard for all pairs of the given docs slice.

    O(N²) in the slice — callers bound the slice (it's the oracle/verify
    path; the scale path is minhash_lsh_candidates which approximates this).
    """
    g = docs.select(
        F.col(id_col).alias("doc_id"),
        words(F.col(text_col)).alias("ws"),
    ).select(
        "doc_id",
        F.array_distinct(ngrams_from_words(F.col("ws"), n)).alias("grams"),
    )
    a, b = g.alias("a"), g.alias("b")
    pairs = a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
    inter = F.size(F.array_intersect(F.col("a.grams"), F.col("b.grams"))).cast("double")
    union = F.size(F.array_union(F.col("a.grams"), F.col("b.grams"))).cast("double")
    return (
        pairs.select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.round(inter / union, 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def prefix_similarity_join(
    docs: DataFrame,
    tau_num: int = 1,
    tau_den: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    sets_df: DataFrame | None = None,
) -> DataFrame:
    """X61: EXACT set-similarity self-join via the prefix filter
    (PPJoin-lite; public algorithm — Chaudhuri et al. SSJoin / Xiao et al.
    PPJoin, and the Vernica-Carey-Li map-reduce formulation) — the exact
    complement to :func:`minhash_lsh_candidates`' MinHash approximation,
    over the SAME unit (distinct word ``shingle_n``-gram sets).

    Threshold is the rational ``tau = tau_num / tau_den`` so the final
    J >= tau gate is evaluated in INTEGER arithmetic
    (``tau_den * |A∩B| >= tau_num * |A∪B|``) — no float boundary risk.

    Algorithm (all DataFrame ops, no UDF):
      1. global shingle frequencies (one agg; the vocabulary-sized table is
         NOT assumed broadcastable — the tok⋈freq join shuffles on shingle),
      2. per doc, order shingles rarest-first by (freq ASC, shingle ASC) and
         emit only the first ``|d| - ceil(tau*|d|) + 1`` as join keys: if
         J(A,B) >= tau then |A∩B| >= ceil(tau*max(|A|,|B|)) (the union
         contains the larger set), and by pigeonhole two sets with overlap
         >= alpha must collide within their first ``|d| - alpha + 1``
         ordered elements — so every qualifying pair shares a PREFIX token
         and the candidate set is provably complete (property-tested
         against exact all-pairs),
      3. self-join prefixes on shingle (id_a < id_b, distinct), pruned by
         PPJoin's two row-level filters inside the join — the LENGTH filter
         (J >= tau forces num*|A| <= den*|B| and symmetrically: a full
         overlap of the smaller set otherwise cannot reach tau) and the
         POSITIONAL filter (the earliest common token at sorted positions
         (i, j) bounds overlap by ubound = 1 + min(|A|-i, |B|-j), and
         J >= tau needs overlap >= ceil(num*(|A|+|B|)/(num+den)); a
         qualifying pair always passes at its earliest collision because
         everything before (i, j) in either set is provably non-shared).
         Both prunes are implied by J >= tau, so completeness survives —
         the property test models all three filters independently. On the
         sf0.1 corpus they cut candidates 3.3x (409k -> 125k) and, with the
         checkpointed set table, total wall time ~3x (19 s -> 5.7 s warm):
         verify cost is proportional to candidates,
      4. exact verify on candidates only: re-join the two full shingle
         sets, J = |A∩B| / (|A|+|B|-|A∩B|) with the integer gate above.

    At 100 TB nothing is corpus x corpus: the only self-join is on prefix
    shingles (step 3), and verify cost is candidates, not pairs.
    """
    if sets_df is None:
        # The set table feeds THREE consumers (prefix generation + both
        # verify sides): materialize it once (x40's checkpoint-projection
        # pattern) so the split→shingle→distinct work — the dominant
        # per-row cost — is paid a single time and the downstream joins
        # scan a compact columnar block with truncated lineage instead of
        # recomputing the projection. Callers that already hold the shared
        # session-memoized table (queries/extensions._shared_shingle_sets —
        # the SAME unit the x2 MinHash family hashes) pass it in, and the
        # materialization is paid once per session across BOTH families.
        sets_df = shingle_sets(
            docs, text_col=text_col, id_col=id_col, shingle_n=shingle_n
        ).localCheckpoint(eager=True)
    tok = sets_df.select("doc_id", "n", F.explode("ss").alias("s"))
    freq = tok.groupBy("s").agg(F.count("*").cast("bigint").alias("cnt"))
    # prefix_len = n - ceil(tau*n) + 1, in pure integer arithmetic:
    # ceil(n*num/den) = (n*num + den - 1) DIV den
    prefix_len = (
        F.col("n")
        - F.expr(f"(n * {tau_num} + {tau_den} - 1) DIV {tau_den}")
        + 1
    ).cast("int")
    pref = (
        tok.join(freq, "s")
        .groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("cnt"), F.col("s")))
            ).alias("ord_toks"),
            F.first("n").alias("n"),
        )
        .select(
            "doc_id",
            "n",
            F.posexplode(
                F.transform(F.slice(F.col("ord_toks"), 1, prefix_len), lambda x: x["s"])
            ).alias("pos0", "s"),
        )
    )
    # PPJoin's two candidate-side prunes (both cheap row predicates inside
    # the equi-join, both implied by J >= tau so completeness is preserved —
    # the property test checks candidates ⊇ exact pairs against them too):
    #   * LENGTH filter: J >= tau forces tau*|A| <= |B| (and symmetrically),
    #     else even a full overlap of the smaller set cannot reach tau;
    #   * POSITIONAL filter: a collision at (1-based) sorted positions
    #     (i, j) bounds the achievable overlap by
    #     ubound = 1 + min(|A|-i, |B|-j) (everything before the collision
    #     point is prefix already known not to match this token), and
    #     J >= tau needs overlap >= alpha = ceil(num*(|A|+|B|)/(num+den))
    #     (from inter >= tau*(|A|+|B|-inter)).
    # ubound >= alpha is evaluated cleared of the ceil/division entirely:
    # ubound >= ceil(num*(na+nb)/(num+den)) <=> (num+den)*ubound >= num*(na+nb)
    # for integer ubound — exact BIGINT arithmetic, no rounding anywhere.
    na, nb = F.col("a.n"), F.col("b.n")
    ia, jb = F.col("a.pos0") + 1, F.col("b.pos0") + 1
    ubound = F.lit(1) + F.least(na - ia, nb - jb)
    cand = (
        pref.alias("a")
        .join(pref.alias("b"), "s")
        .filter(
            (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.lit(tau_num) * na <= F.lit(tau_den) * nb)
            & (F.lit(tau_num) * nb <= F.lit(tau_den) * na)
            & (F.lit(tau_num + tau_den) * ubound >= F.lit(tau_num) * (na + nb))
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    a = sets_df.select(
        F.col("doc_id").alias("id_a"), F.col("ss").alias("ss_a"), F.col("n").alias("n_a")
    )
    b = sets_df.select(
        F.col("doc_id").alias("id_b"), F.col("ss").alias("ss_b"), F.col("n").alias("n_b")
    )
    inter = F.size(F.array_intersect(F.col("ss_a"), F.col("ss_b"))).cast("bigint")
    union = F.col("n_a") + F.col("n_b") - F.col("inter_size")
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("inter_size", inter)
        .filter(F.lit(tau_den) * F.col("inter_size") >= F.lit(tau_num) * union)
        .select(
            "id_a",
            "id_b",
            "n_a",
            "n_b",
            "inter_size",
            (F.col("inter_size").cast("double") / union.cast("double")).alias("jaccard"),
        )
    )
