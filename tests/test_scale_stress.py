"""Beyond-fixture scale check: key curation ops on a 10x-replicated corpus.

The fixtures verify correctness at sf0.01-0.1; this file replicates the
documents table 10x (distinct doc_ids, identical texts) and asserts EXACT
invariants that must hold if the operators' scale stories are true:

  * exact dedup collapses the replicated corpus back to one row per text,
  * the per-source cap still emits exactly k rows per source,
  * the token histogram's per-bucket doc counts scale exactly 10x,
  * hash-based stratified sampling stays within statistical tolerance.

Runtime is bounded (50k docs, map-side ops + small aggregates); this is a
structural scale check, not a throughput benchmark (bench.py owns timing).
"""

import pytest
from pyspark.sql import functions as F

from ez_cdc_spark.queries import load_all
from ez_cdc_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def docs10x(spark, sf_dir, tmp_path_factory):
    d = load_table(spark, sf_dir, "documents")
    n = d.count()
    reps = spark.range(10).select(F.col("id").alias("rep"))
    big = (
        d.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * F.lit(10_000_000)).alias("doc_id"),
            "text",
            "lang",
            "source",
            "n_chars",
        )
    )
    path = str(tmp_path_factory.mktemp("scale") / "documents10x.parquet")
    big.repartition(32).write.mode("overwrite").parquet(path)
    out = spark.read.parquet(path)
    assert out.count() == 10 * n
    return out, n


def test_exact_dedup_collapses_replicated_corpus(spark, docs10x):
    big, n = docs10x
    # x1's deterministic form: keep min doc_id per md5(text). Replicas share
    # text, so the kept count equals the ORIGINAL corpus's distinct-text
    # count no matter the replication factor.
    kept = (
        big.groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("keep"))
        .count()
    )
    orig_distinct = big.filter(F.col("doc_id") < 10_000_000).select("text").distinct().count()
    assert kept == orig_distinct


def test_source_cap_output_is_scale_invariant(spark, docs10x):
    big, _ = docs10x
    from pyspark.sql import Window

    k = 15
    salt = F.pmod(F.xxhash64("doc_id"), F.lit(16))
    w_local = Window.partitionBy("source", "salt").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    w_final = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    capped = (
        big.select("doc_id", "source", "n_chars")
        .withColumn("salt", salt)
        .withColumn("lrk", F.row_number().over(w_local))
        .filter(F.col("lrk") <= k)
        .withColumn("rk", F.row_number().over(w_final))
        .filter(F.col("rk") <= k)
    )
    per_source = {r["source"]: r["n"] for r in capped.groupBy("source").agg(F.count("*").alias("n")).collect()}
    n_sources = big.select("source").distinct().count()
    assert len(per_source) == n_sources
    assert all(v == k for v in per_source.values())


def test_token_histogram_scales_exactly(spark, docs10x, sf_dir):
    big, _ = docs10x
    def hist(df):
        n_tokens = F.size(F.split(F.col("text"), r"\s+")).cast("bigint")
        return {
            r["bucket"]: r["n_docs"]
            for r in df.select(n_tokens.alias("n_tokens"))
            .select(F.least(F.expr("n_tokens div 16"), F.lit(15)).alias("bucket"), "n_tokens")
            .groupBy("bucket")
            .agg(F.count("*").alias("n_docs"))
            .collect()
        }
    h1 = hist(load_table(spark, sf_dir, "documents"))
    h10 = hist(big)
    assert h10 == {b: 10 * n for b, n in h1.items()}


def test_stratified_sample_rate_holds_at_10x(spark, docs10x):
    big, n = docs10x
    phash = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast("long")
    kept = big.filter(phash % 100 < 20).count()
    frac = kept / (10 * n)
    assert abs(frac - 0.20) < 0.02, f"sample rate drifted: {frac}"
