"""Scale-path operators: salted join exactness and IVF ANN recall."""

from pyspark.sql import functions as F

from ez_cdc_spark.functions.similarity import brute_force_topk, ivf_topk
from ez_cdc_spark.operators.skew import salted_join
from ez_cdc_spark.sources.tables import load_table


def test_salted_join_equals_plain_join_under_skew(spark):
    # one hot key (90% of the big side) + a tail
    big = spark.createDataFrame(
        [(1, i) for i in range(900)] + [(k, k * 1000) for k in range(2, 102)],
        "k INT, payload INT",
    )
    small = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(0, 102)], "k INT, name STRING"
    )
    plain = big.join(small, ["k"]).select("k", "payload", "name")
    salted = salted_join(big, small, on=["k"], salt=8).select("k", "payload", "name")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_keeps_unmatched(spark):
    big = spark.createDataFrame([(1, 10), (2, 20), (9, 90)], "k INT, payload INT")
    small = spark.createDataFrame([(1, "a"), (2, "b")], "k INT, name STRING")
    out = sorted(
        map(tuple, salted_join(big, small, on=["k"], how="left", salt=4).collect())
    )
    assert out == [(1, 10, "a"), (2, 20, "b"), (9, 90, None)]


def test_salted_join_spreads_hot_key(spark):
    """The hot key must actually occupy every salt value (the point of the op)."""
    from ez_cdc_spark.operators.skew import SALT

    big = spark.createDataFrame([(1, i) for i in range(800)], "k INT, payload INT")
    salted = big.withColumn(
        SALT, F.pmod(F.monotonically_increasing_id(), F.lit(8)).cast("int")
    )
    n_salts = salted.select(SALT).distinct().count()
    assert n_salts == 8


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(q, emb, k=5)
    approx = ivf_topk(q, emb, k=5, n_cells=16, n_probe=4)
    exact_pairs = {(r["q_id"], r["c_id"]) for r in exact.collect()}
    approx_pairs = {(r["q_id"], r["c_id"]) for r in approx.collect()}
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    # 4/16 cells probed on clustered fixture data: expect most true
    # neighbors found; the exact value is fixture-seeded and deterministic
    assert recall >= 0.5, f"recall@5 too low: {recall:.2f}"
    # shape contract: ≤ k rows per query, scores rounded to 4 dp
    counts = approx.groupBy("q_id").count().collect()
    assert all(r["count"] <= 5 for r in counts)


def test_ivf_is_deterministic(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    a = sorted(map(tuple, ivf_topk(q, emb, k=3).collect()))
    b = sorted(map(tuple, ivf_topk(q, emb, k=3).collect()))
    assert a == b
