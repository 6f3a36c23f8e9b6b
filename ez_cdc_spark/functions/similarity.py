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
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: every (id_a < id_b) pair with
    cosine >= threshold. Exact, via the same blocked-GEMM pattern as
    blocked_topk — the L2-normalized matrix of one side is broadcast and
    each corpus Arrow batch is scored with a single numpy matmul; only
    above-threshold pairs ever materialize (the dense score matrix dies
    with the batch).

    Scale note: the broadcast side here is the full corpus, which is exact
    but O(N·d) driver memory — right for dedup sets up to ~10M vectors. At
    100 TB, swap the broadcast side for LSH/simhash candidate buckets
    (operators/dedup.py simhash_near_dups shows the pattern) and keep this
    GEMM as the exact verify stage within buckets.

    Threshold is applied to the UNROUNDED score (matches the SQL oracle);
    the emitted score is ROUND(,4) per SURVEY §5.3.
    """
    import numpy as np

    pdf = (
        df.select(F.col(id_col).alias("id"), normalize(F.col(vec)).alias("v"))
        .toPandas()
    )
    a_ids = pdf["id"].to_numpy()
    a_mat = np.vstack(pdf["v"].to_numpy()).astype("float64")
    bc = df.sparkSession.sparkContext.broadcast((a_ids, a_mat))

    c = widen_partitions(
        df.select(F.col(id_col).alias("id"), normalize(F.col(vec)).alias("v"))
    )

    def score_block(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, mat = bc.value
        for pdf_b in batches:
            if pdf_b.empty:
                continue
            b_ids = pdf_b["id"].to_numpy()
            b_mat = np.vstack(pdf_b["v"].to_numpy()).astype("float64")
            scores = mat @ b_mat.T  # (N, m)
            # keep a<b only: each unordered pair emitted exactly once
            ai, bi = np.nonzero((scores >= threshold) & (ids[:, None] < b_ids[None, :]))
            if len(ai):
                yield pd.DataFrame(
                    {"id_a": ids[ai], "id_b": b_ids[bi], "score": scores[ai, bi]}
                )

    return (
        c.mapInPandas(score_block, "id_a long, id_b long, score double")
        .withColumn("score", F.round("score", 4))
    )


def centroids(embeddings: DataFrame, label: str = "label", vec: str = "embedding") -> DataFrame:
    """X6: per-label per-position centroid via posexplode + avg.

    Float sums across partitions are order-nondeterministic at the last ulp;
    output is ROUND(,4) which absorbs it (SURVEY §5.3 float rule).
    """
    ex = embeddings.select(
        F.col(label).alias("label"), F.posexplode(to_double(F.col(vec)))
    ).select("label", (F.col("pos") + 1).alias("pos"), F.col("col").alias("e"))
    return (
        ex.groupBy("label", "pos")
        .agg(F.round(F.sum("e") / F.count("*"), 4).alias("centroid"))
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
