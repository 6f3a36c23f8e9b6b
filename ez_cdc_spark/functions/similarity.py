"""Embedding similarity functions (SURVEY.md X3/X6).

Two paths, per the 100 TB design rule:
  * oracle path — exact brute-force cosine via built-in higher-order
    functions (zip_with + aggregate), fully JVM-side;
  * scale path — block-matmul: corpus partitioned, query block broadcast,
    one numpy GEMM per Arrow batch inside mapInPandas (vectorized, no
    per-row Python), then a distributed top-k window. For N queries × M
    corpus this is O(N·M) flops but only O(M) shuffle, and the GEMM runs at
    memory bandwidth — the standard exact-ANN baseline. An LSH-bucketed
    approximate variant is in operators/minhash.py (random hyperplanes).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ez_cdc_spark.sources.tables import widen_partitions


def to_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product in double (deterministic order)."""
    return F.aggregate(
        F.zip_with(to_double(a), to_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def normalize(a: Column) -> Column:
    n = norm(a)
    return F.transform(to_double(a), lambda x: x / n)


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    q_id: str = "vec_id",
    c_id: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query side against the
    corpus, rank per query. Output: (q_id, c_id, score) with ROUND(,4) and
    deterministic (rounded-score, id) ordering."""
    q = queries.select(F.col(q_id).alias("q_id"), F.col(vec).alias("q_vec"))
    c = corpus.select(F.col(c_id).alias("c_id"), F.col(vec).alias("c_vec"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("q_id") != F.col("c_id"))
        .select(
            "q_id",
            "c_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 4).alias("score"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("c_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def blocked_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    q_id: str = "vec_id",
    c_id: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """Scale path: numpy GEMM per corpus partition against the broadcast,
    L2-normalized query matrix; per-partition top-k before the final global
    per-query top-k window (shuffle carries ≤ k rows per query per
    partition, not the full N×M score matrix)."""
    import numpy as np

    q_pdf = (
        queries.select(F.col(q_id).alias("q_id"), normalize(F.col(vec)).alias("q_vec"))
        .toPandas()
    )
    q_ids = q_pdf["q_id"].to_numpy()
    q_mat = np.vstack(q_pdf["q_vec"].to_numpy()).astype("float64")  # (nq, d)
    spark = queries.sparkSession
    bc = spark.sparkContext.broadcast((q_ids, q_mat))

    c = widen_partitions(
        corpus.select(F.col(c_id).alias("c_id"), normalize(F.col(vec)).alias("c_vec"))
    )

    def score_block(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, mat = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            c_mat = np.vstack(pdf["c_vec"].to_numpy()).astype("float64")  # (m, d)
            scores = mat @ c_mat.T  # (nq, m) one GEMM per Arrow batch
            nq, m = scores.shape
            kk = min(k + 1, m)
            top = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
            rows = {
                "q_id": np.repeat(ids, kk),
                "c_id": pdf["c_id"].to_numpy()[top].ravel(),
                "score": np.take_along_axis(scores, top, axis=1).ravel(),
            }
            yield pd.DataFrame(rows)

    scored = c.mapInPandas(score_block, "q_id long, c_id long, score double")
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("c_id"))
    return (
        scored.filter(F.col("q_id") != F.col("c_id"))
        .withColumn("score", F.round("score", 4))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def neardup_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec: str = "embedding",
    n_blocks: int = 8,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: every (id_a < id_b) pair with
    cosine >= threshold. Exact, fully distributed — NO driver-side collect.

    Blocked all-pairs GEMM: rows hash into ``n_blocks`` blocks by
    pmod(xxhash64(id), B); each row is replicated to every unordered block
    pair containing its block (B copies per row, so shuffle volume is
    N·B); each of the B·(B+1)/2 pair-tasks scores its left×right matrices
    with one float64 numpy matmul and emits only above-threshold pairs, so
    the dense score tile dies inside the task. Per-task memory is
    2·(N/B)·d doubles — pick B ≈ N·d·16B / (executor tile budget); the
    driver never holds corpus data. Flops stay O(N²·d) because exact
    all-pairs requires it; to cut candidates at extreme N, prefilter with
    LSH/SimHash buckets (operators/dedup.py simhash_near_dups shows the
    pattern) and keep this as the within-bucket exact verify.

    Every unordered pair is scored exactly once: a row in block b appears
    once in each pair-task (min(b,o), max(b,o)) for o in 0..B-1 (the map
    o -> pair is injective for fixed b); cross-block tasks score the full
    left×right rectangle, and the diagonal task (b,b) keeps the strict
    upper triangle by id.

    Threshold is applied to the UNROUNDED score (matches the SQL oracle);
    the emitted score is ROUND(,4) per SURVEY §5.3.
    """
    import numpy as np

    sel = df.select(
        F.col(id_col).alias("id"),
        normalize(F.col(vec)).alias("v"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int").alias("b"),
    )
    replicated = sel.select(
        "id",
        "v",
        "b",
        F.explode(F.sequence(F.lit(0), F.lit(n_blocks - 1))).alias("o"),
    ).select(
        "id",
        "v",
        "b",
        F.least("b", "o").alias("p1"),
        F.greatest("b", "o").alias("p2"),
    )

    def score_pair(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": [], "id_b": [], "score": []}).astype(
            {"id_a": "int64", "id_b": "int64", "score": "float64"}
        )
        if pdf.empty:
            return empty
        p1, p2 = int(pdf["p1"].iloc[0]), int(pdf["p2"].iloc[0])
        if p1 == p2:
            ids = pdf["id"].to_numpy()
            mat = np.vstack(pdf["v"].to_numpy()).astype("float64")
            scores = mat @ mat.T
            ai, bi = np.nonzero((scores >= threshold) & (ids[:, None] < ids[None, :]))
            id_a, id_b, sc = ids[ai], ids[bi], scores[ai, bi]
        else:
            left = pdf[pdf["b"] == p1]
            right = pdf[pdf["b"] == p2]
            if left.empty or right.empty:
                return empty
            l_ids, r_ids = left["id"].to_numpy(), right["id"].to_numpy()
            l_mat = np.vstack(left["v"].to_numpy()).astype("float64")
            r_mat = np.vstack(right["v"].to_numpy()).astype("float64")
            scores = l_mat @ r_mat.T
            ai, bi = np.nonzero(scores >= threshold)
            if not len(ai):
                return empty
            a, b = l_ids[ai], r_ids[bi]
            id_a, id_b = np.minimum(a, b), np.maximum(a, b)
            sc = scores[ai, bi]
        if not len(id_a):
            return empty
        return pd.DataFrame({"id_a": id_a, "id_b": id_b, "score": sc})

    return (
        replicated.groupBy("p1", "p2")
        .applyInPandas(score_pair, "id_a long, id_b long, score double")
        .withColumn("score", F.round("score", 4))
    )


def lsh_neardup_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec: str = "embedding",
    n_bits: int = 32,
    bands: int = 8,
    seed: int = 42,
) -> DataFrame:
    """APPROXIMATE embedding near-dup: random-hyperplane LSH prefilter +
    exact cosine verify within candidate buckets — the extreme-scale
    alternative to :func:`neardup_pairs` when even N·B replication is too
    much. No false positives (exact verify); recall < 1 by construction
    (recall-tested vs the exact op in tests/test_scale_ops.py, not
    SQL-oracled).

    Per band of r = n_bits/bands sign bits, two vectors collide with
    probability (1 - θ/π)^r; any-of-``bands`` collision gives ~0.98 recall
    at cosine 0.8 with the 32/8 default. Only the (n_bits × d) hyperplane
    matrix is broadcast.

    Verification happens IN the bucket: rows group by (band, sig) and each
    bucket runs one numpy GEMM over its members, emitting only
    above-threshold pairs. The shuffle therefore carries (id, band, sig,
    vec) rows — a ``bands``-fold replication of the vectors — which beats
    the alternative (slim banding rows, materialized candidate pairs, two
    vector join-backs, per-pair JVM cosine) whenever the candidate-pair
    count exceeds n·bands: at a low threshold the candidate rate makes
    pair materialization the dominant cost (measured 13 s -> ~2 s at
    sf0.1). Degenerate buckets (one signature capturing a large fraction
    of the corpus) are quadratic within the bucket — same bound as any
    banding scheme; at extreme scale cap bucket width or add a band salt.
    Scores use the same float64 GEMM arithmetic as the exact
    :func:`neardup_pairs`, so the zero-false-positive comparison is
    arithmetic-consistent.
    """
    import numpy as np

    dim = df.select(F.size(F.col(vec)).alias("d")).first()["d"]
    rng = np.random.default_rng(seed)
    hyper = rng.standard_normal((n_bits, dim))
    bc = df.sparkSession.sparkContext.broadcast(hyper)
    rows_per_band = n_bits // bands

    sel = widen_partitions(
        df.select(F.col(id_col).alias("id"), normalize(F.col(vec)).alias("v"))
    )

    def band_rows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        H = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.vstack(pdf["v"].to_numpy()).astype("float64")
            bits = (mat @ H.T) > 0  # (m, n_bits)
            m = len(pdf)
            sigs = np.zeros((m, bands), dtype="int64")
            for b in range(bands):
                chunk = bits[:, b * rows_per_band : (b + 1) * rows_per_band]
                sigs[:, b] = chunk @ (1 << np.arange(rows_per_band))
            yield pd.DataFrame(
                {
                    "id": np.repeat(pdf["id"].to_numpy(), bands),
                    "band": np.tile(np.arange(bands, dtype="int32"), m),
                    "sig": sigs.ravel(),
                    "v": [mat[i] for i in range(m) for _ in range(bands)],
                }
            )

    banded = sel.mapInPandas(band_rows, "id long, band int, sig long, v array<double>")

    def bucket_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "id_a": np.array([], dtype="int64"),
                "id_b": np.array([], dtype="int64"),
                "score": np.array([], dtype="float64"),
            }
        )
        if len(pdf) < 2:
            return empty
        pdf = pdf.sort_values("id")
        ids = pdf["id"].to_numpy()
        mat = np.vstack(pdf["v"].to_numpy())
        sim = mat @ mat.T  # normalized rows -> cosine
        iu, ju = np.triu_indices(len(ids), k=1)
        mask = sim[iu, ju] >= threshold
        if not mask.any():
            return empty
        return pd.DataFrame(
            {
                "id_a": ids[iu[mask]],
                "id_b": ids[ju[mask]],
                "score": sim[iu[mask], ju[mask]],
            }
        )

    pairs = banded.groupBy("band", "sig").applyInPandas(
        bucket_pairs, "id_a long, id_b long, score double"
    )
    # A pair surviving in several bands carries the identical score (same
    # float64 dot of the same normalized rows); max() is just the dedup.
    return pairs.groupBy("id_a", "id_b").agg(
        F.round(F.max("score"), 4).alias("score")
    )


def centroids(embeddings: DataFrame, label: str = "label", vec: str = "embedding") -> DataFrame:
    """X6: per-label per-position centroid via posexplode + avg.

    Float sums across partitions are order-nondeterministic at the last ulp;
    output is ROUND(,4) which absorbs it (SURVEY §5.3 float rule). The
    trailing + 0.0 normalizes IEEE negative zero: a tiny negative mean
    rounds to -0.0 in DuckDB but 0.0 in Spark (observed at sf0.001), and
    the driver's stringified compare treats them as different values.
    """
    ex = embeddings.select(
        F.col(label).alias("label"), F.posexplode(to_double(F.col(vec)))
    ).select("label", (F.col("pos") + 1).alias("pos"), F.col("col").alias("e"))
    return (
        ex.groupBy("label", "pos")
        .agg((F.round(F.sum("e") / F.count("*"), 4) + F.lit(0.0)).alias("centroid"))
        .orderBy("label", "pos")
    )


def _assign_cells(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    cent_mat,
    n_probe: int,
) -> DataFrame:
    """(id, cell) rows: the n_probe nearest coarse cells per L2-normalized
    vector — one numpy GEMM against the broadcast centroid matrix per Arrow
    batch (same pattern as blocked_topk)."""
    import numpy as np

    bc = df.sparkSession.sparkContext.broadcast(cent_mat)
    sel = widen_partitions(
        df.select(F.col(id_col).alias("id"), normalize(F.col(vec_col)).alias("v"))
    )

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cm = bc.value  # (n_cells, d), rows L2-normalized
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.vstack(pdf["v"].to_numpy()).astype("float64")  # (m, d)
            scores = mat @ cm.T  # (m, n_cells)
            p = min(n_probe, scores.shape[1])
            top = np.argpartition(-scores, p - 1, axis=1)[:, :p]
            yield pd.DataFrame(
                {"id": np.repeat(pdf["id"].to_numpy(), p), "cell": top.ravel()}
            )

    return sel.mapInPandas(assign, "id long, cell int")


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    n_cells: int = 16,
    n_probe: int = 4,
    q_id: str = "vec_id",
    c_id: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k via IVF coarse quantization — the scale path
    when even one GEMM pass over the full corpus (blocked_topk) is too much.

    1. Train: deterministic pseudo-random sample of n_cells corpus vectors
       (top-n_cells by xxhash64(id) — a distributed TakeOrdered, no full
       collect), refined by one distributed Lloyd iteration (assign + mean).
       Only the (n_cells × d) centroid matrix ever reaches the driver.
    2. Assign every corpus vector to its nearest cell, every query to its
       n_probe nearest cells (numpy GEMM per Arrow batch).
    3. Shuffle both sides on cell id and score exactly within cells, then
       global per-query top-k window.

    At 100 TB the corpus scan is embarrassingly parallel, the join touches
    n_probe/n_cells of the corpus per query, and no stage holds more than
    one Arrow batch plus the centroid matrix in memory. Approximate:
    recall < 1 by construction — verified against brute_force_topk in
    tests, not against a SQL oracle.
    """
    import numpy as np

    seed_pdf = (
        corpus.orderBy(F.xxhash64(F.col(c_id)))
        .limit(n_cells)
        .select(normalize(F.col(vec)).alias("v"))
        .toPandas()
    )
    cent = np.vstack(seed_pdf["v"].to_numpy()).astype("float64")  # (n_cells, d)

    # One Lloyd iteration, distributed: mean of member vectors per cell.
    assigned = _assign_cells(corpus, c_id, vec, cent, n_probe=1)
    members = assigned.join(
        corpus.select(F.col(c_id).alias("id"), normalize(F.col(vec)).alias("v")), "id"
    )
    mean_pdf = (
        members.select("cell", F.posexplode("v"))
        .groupBy("cell", "pos")
        .agg(F.avg("col").alias("m"))
        .groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("ms"))
        .select("cell", F.col("ms.m").alias("m"))
        .toPandas()
    )
    for _, row in mean_pdf.iterrows():
        v = np.asarray(row["m"], dtype="float64")
        n = np.linalg.norm(v)
        if n > 0:
            cent[row["cell"]] = v / n

    c_cells = _assign_cells(corpus, c_id, vec, cent, n_probe=1).withColumnRenamed(
        "id", "c_id"
    )
    q_cells = _assign_cells(queries, q_id, vec, cent, n_probe=n_probe).withColumnRenamed(
        "id", "q_id"
    )
    c_side = c_cells.join(
        corpus.select(F.col(c_id).alias("c_id"), F.col(vec).alias("c_vec")), "c_id"
    )
    q_side = q_cells.join(
        queries.select(F.col(q_id).alias("q_id"), F.col(vec).alias("q_vec")), "q_id"
    )
    scored = (
        q_side.join(c_side, "cell")
        .filter(F.col("q_id") != F.col("c_id"))
        .select(
            "q_id",
            "c_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 4).alias("score"),
        )
        .dropDuplicates(["q_id", "c_id"])  # a pair can meet in n_probe cells
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("c_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def gram_moments(
    emb: DataFrame, vec: str = "embedding", scale: int = 1000
) -> DataFrame:
    """X66: distributed second moments of an embedding corpus — the
    Gram/covariance building block of PCA and whitening — as ONE map-side
    numpy accumulation plus a d²-bounded exchange.

    Each partition folds its Arrow batches into a single d×d int64
    partial (``Mᵀ M`` per batch, summed), emitting only the upper
    triangle — so the shuffle carries O(partitions · d²) tiny rows,
    never O(n·d²) exploded pairs (the naive posexplode self-join shape),
    and the data is touched exactly once. Values are quantized to
    integers first (``round(v · scale)``): the moments are then EXACT
    integers, bit-identical across engines and partition layouts — no
    float-sum ordering hazard at the hash gate. A scale of 1000 on
    unit-normalized embeddings keeps Σ qᵢqⱼ < 2⁶³ up to ~10¹² rows (and
    the derived covariance's int→double conversions exact below 2⁵³ —
    past that, keep the integer moments and divide downstream).
    Quantization uses floor(x + 0.5) — not round() — so the halfway
    behavior is one IEEE add + one floor, bit-identical in EVERY engine:
    a true tie can't occur (k.5/scale has no finite binary form for
    scale=1000), but the float64 multiply can ROUND onto a .5 boundary,
    where numpy's half-to-even and SQL ROUND's half-away would diverge;
    floor(x+0.5) removes that divergence class entirely.

    Returns (i, j, n, sum_i, sum_j, dot) for i ≤ j — everything needed
    for covariance ((n·dot − sum_i·sum_j) / n²), correlation, or a
    driver-side eigendecomposition of the d×d matrix."""
    import numpy as np

    wide = widen_partitions(emb.select(F.col(vec).alias("v")))

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        G = None
        S = None
        n = 0
        for pdf in batches:
            if pdf.empty:
                continue
            M = np.floor(
                np.vstack(pdf["v"].to_numpy()).astype("float64") * scale + 0.5
            ).astype("int64")
            G = M.T @ M if G is None else G + M.T @ M
            S = M.sum(axis=0) if S is None else S + M.sum(axis=0)
            n += M.shape[0]
        if G is None:
            return
        iu, ju = np.triu_indices(G.shape[0])
        yield pd.DataFrame(
            {
                "i": iu.astype("int32"),
                "j": ju.astype("int32"),
                "dot": G[iu, ju],
                "n": np.int64(n),
                "sum_i": S[iu],
                "sum_j": S[ju],
            }
        )

    parts = wide.mapInPandas(
        partials,
        schema="i int, j int, dot long, n long, sum_i long, sum_j long",
    )
    return parts.groupBy("i", "j").agg(
        F.sum("n").cast("bigint").alias("n"),
        F.sum("sum_i").cast("bigint").alias("sum_i"),
        F.sum("sum_j").cast("bigint").alias("sum_j"),
        F.sum("dot").cast("bigint").alias("dot"),
    )
