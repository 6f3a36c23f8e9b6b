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


# ---------------------------------------------------------------------------
# CDC-analytics family at 10x (r6 VERDICT #5): the x25/x26/x27/t14 operators
# are correctness-tested at fixture scale; here the EVENT LOG is replicated
# 10x (event_id + rep*10_000_000 keeps lsns distinct while folding onto the
# same 200 keys => 10x-deeper per-key histories), extra at-least-once
# redeliveries are injected (every 50th event duplicated verbatim, on top of
# the %97 duplicates the envelope derivation already emits), and the rows
# are hash-scattered across 16 files so replay order is maximally disordered.
# The assertions are the structural invariants that must survive any scale:
# version-chain monotonicity, as-of <= pivot, audit arithmetic, and the
# incremental maintainer converging to the batch build.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def cdc10x_dir(spark, tmp_path_factory):
    base = load_table(spark, "/root/testdata/sf0.001", "events")
    reps = spark.range(10).select(F.col("id").alias("rep"))
    big = base.crossJoin(reps).select(
        (F.col("event_id") + F.col("rep") * F.lit(10_000_000)).alias("event_id"),
        "ts", "user_id", "event_type", "value", "props",
    )
    redelivered = big.filter(F.col("event_id") % 50 == 0)  # verbatim dupes
    out = str(tmp_path_factory.mktemp("cdc10x"))
    (
        big.unionByName(redelivered)
        .repartition(16, F.xxhash64("event_id"))  # scatter lsn order
        .write.mode("overwrite")
        .parquet(out + "/events.parquet")
    )
    return out


def _flat10x(spark, cdc10x_dir):
    from ez_cdc_spark.queries.cdc_analytics import _flat_envelopes

    return _flat_envelopes(spark, cdc10x_dir)  # (id, op, lsn, attrs) deduped


def test_x25_version_chain_invariants_at_10x(spark, cdc10x_dir):
    hist = load_all()["x25_scd2_history"].fn(spark, cdc10x_dir).collect()
    flat = _flat10x(spark, cdc10x_dir)
    n_opens = flat.filter(F.col("op") != "d").count()
    assert len(hist) == n_opens  # every non-delete change is exactly one version
    by_id = {}
    for r in hist:
        by_id.setdefault(r["id"], []).append(r)
    for rid, rows in by_id.items():
        rows.sort(key=lambda r: r["version_no"])
        assert [r["version_no"] for r in rows] == list(range(1, len(rows) + 1))
        for a, b in zip(rows, rows[1:]):
            assert a["valid_from_lsn"] < b["valid_from_lsn"]
            # a's close is b's open, or earlier when a delete intervened
            assert a["valid_to_lsn"] is not None and a["valid_to_lsn"] <= b["valid_from_lsn"]
        for r in rows:
            assert (r["is_current"] == 1) == (r["valid_to_lsn"] is None)
        assert sum(r["is_current"] for r in rows) <= 1  # at most one live version


def test_x26_asof_pivot_invariants_at_10x(spark, cdc10x_dir):
    from pyspark.sql import Window

    got = {r["id"]: r for r in load_all()["x26_state_asof_lsn"].fn(spark, cdc10x_dir).collect()}
    flat = _flat10x(spark, cdc10x_dir)
    cut = flat.agg(F.floor(F.max("lsn") / 2).cast("bigint").alias("c")).first()["c"]
    assert got and all(r["as_of_lsn"] <= cut for r in got.values())
    # independent reconstruction via a rank window (the query uses max_by)
    w = Window.partitionBy("id").orderBy(F.desc("lsn"))
    last = (
        flat.filter(F.col("lsn") <= cut)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    want = {
        r["id"]: r["lsn"] for r in last.filter(F.col("op") != "d").collect()
    }
    assert {k: v["as_of_lsn"] for k, v in got.items()} == want


def test_x27_audit_arithmetic_at_10x(spark, cdc10x_dir):
    rows = load_all()["x27_change_audit"].fn(spark, cdc10x_dir).collect()
    flat = _flat10x(spark, cdc10x_dir)
    n_changes_total = flat.count()
    by_op = {r["op"]: r["n"] for r in flat.groupBy("op").agg(F.count("*").alias("n")).collect()}
    assert sum(r["n_changes"] for r in rows) == n_changes_total
    assert sum(r["n_creates"] for r in rows) == by_op.get("c", 0)
    assert sum(r["n_updates"] for r in rows) == by_op.get("u", 0)
    assert sum(r["n_deletes"] for r in rows) == by_op.get("d", 0)
    for r in rows:
        assert r["n_creates"] + r["n_updates"] + r["n_deletes"] == r["n_changes"]
        assert r["first_lsn"] <= r["last_lsn"]
    assert sum(r["ends_deleted"] for r in rows) == flat.groupBy("id").agg(
        F.max_by((F.col("op") == "d").cast("int"), F.col("lsn")).alias("e")
    ).agg(F.sum("e")).first()[0]


def test_t14_converges_to_x25_at_10x(spark, cdc10x_dir):
    """The incremental SCD2 maintainer must equal the batch build on the
    10x disordered log — per-key histories 10x deeper than any fixture,
    deletes routinely delivered before their opens across micro-batches."""
    reg = load_all()
    batch = sorted(map(tuple, reg["x25_scd2_history"].fn(spark, cdc10x_dir).collect()))
    maintained = sorted(map(tuple, reg["t14_scd2_maintenance"].fn(spark, cdc10x_dir).collect()))
    assert maintained == batch


def test_x33_pit_enrich_matches_join_formulation_at_10x(spark, cdc10x_dir):
    """PIT enrichment under 10x-deeper histories, injected redeliveries and
    scattered replay order: the engine's union+LOCF window answer must
    equal an INDEPENDENT formulation (theta-join each fact to all earlier
    changes, max_by the winner) — the two strategies share no code path,
    so agreement pins the as-of semantics, the strict-inequality tie rule,
    and the delete-tombstone NULLing at scale."""
    got = {
        r.event_id: (r.dim_lsn, r.dim_first_name, r.dim_last_name, r.dim_email)
        for r in load_all()["x33_pit_enrich"].fn(spark, cdc10x_dir).collect()
    }

    flat = _flat10x(spark, cdc10x_dir)
    facts = (
        load_table(spark, cdc10x_dir, "events")
        .filter(F.col("event_type") == "click")
        .select(
            (F.col("event_id") % 200).cast("bigint").alias("fid"),
            F.col("event_id").cast("bigint").alias("flsn"),
        )
        .dropDuplicates(["flsn"])  # injected redeliveries duplicate facts
    )
    winner = F.max_by(F.struct("op", "first_name", "last_name", "email", "lsn"), F.col("lsn"))
    joined = (
        facts.join(flat, (facts.fid == flat.id) & (flat.lsn < facts.flsn), "left")
        .groupBy("flsn")
        .agg(winner.alias("w"))
        .collect()
    )
    want = {}
    for r in joined:
        w = r.w
        if w is None or w.op is None:
            want[r.flsn] = (None, None, None, None)
        elif w.op == "d":
            want[r.flsn] = (w.lsn, None, None, None)
        else:
            want[r.flsn] = (w.lsn, w.first_name, w.last_name, w.email)
    assert got == want


def test_w10_sessionize_invariants_at_10x(spark, cdc10x_dir):
    """Sessionization on the 10x disordered event log: per-user session
    numbers are contiguous from 1, every session's duration is
    non-negative, and no event is lost or invented (session sizes sum to
    the user's event count)."""
    rows = load_all()["w10_sessionize"].fn(spark, cdc10x_dir).collect()
    ev = load_table(spark, cdc10x_dir, "events")
    per_user = {r.user_id: r.n for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()}
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert set(by_user) == set(per_user)
    for uid, sess in by_user.items():
        nos = sorted(s.session_no for s in sess)
        assert nos == list(range(1, len(sess) + 1)), f"user {uid} gaps"
        assert all(s.duration_s >= 0 for s in sess)
        assert sum(s.n_events for s in sess) == per_user[uid]


def test_heavy_hitter_counts_scale_exactly_10x(spark, docs10x):
    """a14 exact mode on the 10x-replicated corpus: every token's count
    must be EXACTLY 10x its original-corpus count (replicas share text),
    and the top-20 ranking must be replication-invariant — the structural
    check that the sketch's merge is lossless in the uncompressed regime
    at any corpus multiple."""
    from ez_cdc_spark.operators.sketches import mg_topk

    big, _ = docs10x
    tokens = big.select(F.explode(F.split(F.col("text"), r"\s+")).alias("token"))
    top_big = mg_topk(tokens, "token", m=1 << 22, k=20).collect()

    orig = big.filter(F.col("doc_id") < 10_000_000)
    tokens1 = orig.select(F.explode(F.split(F.col("text"), r"\s+")).alias("token"))
    top_orig = {r.token: r.est_count for r in mg_topk(tokens1, "token", m=1 << 22, k=20).collect()}

    assert all(r.err_bound == 0 for r in top_big)
    for r in top_big:
        assert r.est_count == 10 * top_orig[r.token], r.token


# ---------------------------------------------------------------------------
# Round-8 additions (r7 VERDICT #4 + x38): j14/x31/x34/x35/x38 at 10x.
# Replication fixtures keep values identical and keys distinct, so every
# assertion below is an EXACT consequence of the operator's declared
# semantics — except x34/x35, whose 6-dp-rounded-ln terms make replication
# invariance exact only up to the documented rounding budget (~2e-6).
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def events10x_dir(spark, tmp_path_factory):
    """10x event log, distinct event_ids, IDENTICAL timestamps, no injected
    redeliveries (unlike cdc10x_dir) — so pairwise-op outputs scale as exact
    replica products."""
    base = load_table(spark, "/root/testdata/sf0.001", "events")
    reps = spark.range(10).select(F.col("id").alias("rep"))
    big = base.crossJoin(reps).select(
        (F.col("event_id") + F.col("rep") * F.lit(10_000_000)).alias("event_id"),
        "ts", "user_id", "event_type", "value", "props",
    )
    out = str(tmp_path_factory.mktemp("ev10x"))
    big.repartition(16, F.xxhash64("event_id")).write.mode("overwrite").parquet(
        out + "/events.parquet"
    )
    return out


@pytest.fixture(scope="module")
def docs10x_dir(spark, docs10x, tmp_path_factory):
    big, _ = docs10x
    out = str(tmp_path_factory.mktemp("docs10x"))
    big.repartition(16).write.mode("overwrite").parquet(out + "/documents.parquet")
    return out


@pytest.fixture(scope="module")
def emb10x_dir(spark, tmp_path_factory):
    base = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    reps = spark.range(10).select(F.col("id").alias("rep"))
    big = base.crossJoin(reps).select(
        (F.col("vec_id") + F.col("rep") * F.lit(10_000_000)).alias("vec_id"),
        "embedding", "label",
    )
    out = str(tmp_path_factory.mktemp("emb10x"))
    big.repartition(16).write.mode("overwrite").parquet(out + "/embeddings.parquet")
    return out


def test_j14_pair_count_scales_as_replica_product(spark, events10x_dir):
    """Replicated signups and errors share timestamps, so every original
    qualifying pair appears exactly 10x10 times — the binned join must
    find ALL of them (completeness) and nothing else (the residual filter
    soundness), under a maximally disordered file layout."""
    reg = load_all()
    n_small = reg["j14_interval_bin_join"].fn(spark, "/root/testdata/sf0.001").count()
    big = reg["j14_interval_bin_join"].fn(spark, events10x_dir)
    assert big.count() == 100 * n_small
    bad = big.filter((F.col("gap_s") < 0) | (F.col("gap_s") > 60)).count()
    assert bad == 0, "residual range filter leaked a pair"


def test_j14_bin_width_independence(spark, sf_smoke):
    """Bin-edge conservatism: the SAME pair set must come out of a
    different bin width (120 s bins still cover every 60 s interval with
    the lo/hi explode) — agreement across binnings pins completeness
    without an N^2 reference join."""
    e = load_table(spark, sf_smoke, "events")
    a = e.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("eid_a"), F.col("ts").alias("ts_a")
    )
    b = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("eid_b"), F.col("ts").alias("ts_b")
    )
    def pairs(bin_s):
        lo = F.floor(F.unix_timestamp("ts_a") / bin_s).cast("long")
        hi = F.floor((F.unix_timestamp("ts_a") + 60) / bin_s).cast("long")
        ab = a.withColumn("bin", F.explode(F.sequence(lo, hi)))
        bb = b.withColumn("bin", F.floor(F.unix_timestamp("ts_b") / bin_s).cast("long"))
        got = (
            ab.join(bb, "bin")
            .filter(
                (F.col("ts_b") >= F.col("ts_a"))
                & (F.col("ts_b") <= F.col("ts_a") + F.expr("INTERVAL 60 SECONDS"))
            )
            .select("eid_a", "eid_b").distinct()
        )
        return sorted(map(tuple, got.collect()))
    assert pairs(60) == pairs(120)
    reg = load_all()
    got = sorted(
        (r.eid_a, r.eid_b)
        for r in reg["j14_interval_bin_join"].fn(spark, sf_smoke).collect()
    )
    assert got == pairs(60)


def test_x31_rank_histogram_equals_window_at_10x(spark, docs10x_dir):
    """x31's histogram formulation must equal percent_rank() over the raw
    corpus — the window it exists to avoid — on the full 10x corpus, and
    every rank must stay in [0, 1]."""
    from pyspark.sql import Window

    reg = load_all()
    got = reg["x31_rank_normalize"].fn(spark, docs10x_dir)
    w = Window.partitionBy("source").orderBy("n_chars")
    want = (
        load_table(spark, docs10x_dir, "documents")
        .select("doc_id", "source", F.col("n_chars").cast("bigint").alias("n_chars"))
        .withColumn("pct_rank", F.round(F.percent_rank().over(w), 6))
    )
    assert got.filter((F.col("pct_rank") < 0) | (F.col("pct_rank") > 1)).count() == 0
    diff = (
        got.join(want, ["doc_id", "source", "n_chars", "pct_rank"], "full_outer")
        .filter(F.col("doc_id").isNull())
        .count()
    )
    # full_outer on ALL columns: any mismatch creates an unmatched row
    n_got, n_want = got.count(), want.count()
    assert n_got == n_want and diff == 0


def test_x34_x35_scores_replication_invariant(spark, sf_dir, docs10x_dir):
    """Unigram probabilities are count ratios, so 10x replication leaves
    them untouched; the 6-dp-rounded-ln DECIMAL-sum recipe makes the
    scores equal up to the documented rounding budget (each rounded ln
    term moves <= 5e-7, terms average not compound — tol 2e-6)."""
    reg = load_all()
    one = {
        r.doc_id: r.avg_logprob
        for r in reg["x34_unigram_logprob"].fn(spark, sf_dir).collect()
    }
    ten = {
        r.doc_id: r.avg_logprob
        for r in reg["x34_unigram_logprob"].fn(spark, docs10x_dir).collect()
    }
    assert set(one) <= set(ten)  # rep-0 keeps original doc_ids
    for did, score in one.items():
        assert abs(ten[did] - score) <= 2e-6, f"doc {did}: {ten[did]} vs {score}"
    for did, score in ten.items():
        if did >= 10_000_000:
            orig = did % 10_000_000
            assert abs(score - ten[orig]) <= 1e-12, "replicas must score alike"

    kl1 = {r.source: r.kl_nats for r in reg["x35_source_kl"].fn(spark, sf_dir).collect()}
    kl10 = {r.source: r.kl_nats for r in reg["x35_source_kl"].fn(spark, docs10x_dir).collect()}
    assert set(kl1) == set(kl10)
    for s in kl1:
        assert abs(kl1[s] - kl10[s]) <= 2e-6, f"source {s}: {kl10[s]} vs {kl1[s]}"


def test_x38_kmeans_replication_invariants(spark, emb10x_dir):
    """Fixed-point k-means at 10x: replicas keep the original vectors'
    vec_id order for seeding (rep-0 ids are lowest), sums and counts both
    scale 10x so the integer floor-div centroid means are IDENTICAL at
    every iteration — therefore every replica must get EXACTLY its
    original's cluster and distance, and every cluster_n must be exactly
    10x. Also the partition invariant: assignments cover the corpus once."""
    reg = load_all()
    base = {
        r.vec_id: (r.cluster_id, r.dist_units, r.cluster_n)
        for r in reg["x38_kmeans_clusters"].fn(spark, "/root/testdata/sf0.001").collect()
    }
    big = reg["x38_kmeans_clusters"].fn(spark, emb10x_dir).collect()
    n_base = len(base)
    assert len(big) == 10 * n_base  # every vector assigned exactly once
    assert sum(1 for _ in big) == len({r.vec_id for r in big})
    for r in big:
        cid, dist, cn = base[r.vec_id % 10_000_000]
        assert r.cluster_id == cid, f"vec {r.vec_id} moved cluster"
        assert r.dist_units == dist, f"vec {r.vec_id} distance drifted"
        assert r.cluster_n == 10 * cn, f"cluster {cid} size not 10x"


# ---------------------------------------------------------------------------
# Second round-8 batch at 10x (a16 / j16 / w12 / x45): each op's declared
# invariant is checked beyond the fixture, on replicated inputs.


@pytest.fixture(scope="module")
def r8b_10x_dir(spark, sf_dir, tmp_path_factory):
    """An sf-dir-shaped directory with 10x-replicated orders (EXACT duplicate
    rows), events and customer/supplier (replicas under fresh shifted keys),
    and documents (fresh doc_ids, identical texts)."""
    out = str(tmp_path_factory.mktemp("r8b10x"))
    reps = spark.range(10).select(F.col("id").alias("rep"))

    od = load_table(spark, sf_dir, "orders")
    od.crossJoin(reps).drop("rep").repartition(32).write.parquet(f"{out}/orders.parquet")

    li = load_table(spark, sf_dir, "lineitem")
    li.crossJoin(reps).drop("rep").repartition(32).write.parquet(f"{out}/lineitem.parquet")

    ev = load_table(spark, sf_dir, "events")
    (
        ev.crossJoin(reps)
        .select(
            (F.col("event_id") + F.col("rep") * F.lit(10_000_000)).alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("rep") * F.lit(10_000_000)).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        .repartition(32)
        .write.parquet(f"{out}/events.parquet")
    )

    cu = load_table(spark, sf_dir, "customer")
    (
        cu.crossJoin(reps)
        .withColumn("c_custkey", F.col("c_custkey") + F.col("rep") * F.lit(10_000_000))
        .drop("rep")
        .repartition(32)
        .write.parquet(f"{out}/customer.parquet")
    )
    su = load_table(spark, sf_dir, "supplier")
    (
        su.crossJoin(reps)
        .withColumn("s_suppkey", F.col("s_suppkey") + F.col("rep") * F.lit(10_000_000))
        .drop("rep")
        .repartition(32)
        .write.parquet(f"{out}/supplier.parquet")
    )

    docs = load_table(spark, sf_dir, "documents")
    (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * F.lit(10_000_000)).alias("doc_id"),
            "text",
            "lang",
            "source",
            "n_chars",
        )
        .repartition(32)
        .write.parquet(f"{out}/documents.parquet")
    )
    return out


def test_a16_hll_is_duplicate_insensitive_at_10x(spark, sf_dir, r8b_10x_dir):
    """The sketch registers depend only on the SET of values: 10x exact-
    duplicate orders rows must give bit-identical output (z_scaled,
    filled_buckets, estimate) to the original run — the property that lets
    the sketch absorb at-least-once replay and shard unions for free."""
    fn = load_all()["a16_portable_hll"].fn
    base = sorted(tuple(r) for r in fn(spark, sf_dir).collect())
    big = sorted(tuple(r) for r in fn(spark, r8b_10x_dir).collect())
    assert base == big


def test_j16_grid_completeness_vs_brute_force_at_10x(spark, r8b_10x_dir):
    """The grid join's candidate set must be COMPLETE at 10x density: its
    output equals the naive broadcast theta join on the same synthesized
    coordinates (15k x 1k points here — feasible as a one-off check; the
    engine path never materializes that cross)."""
    got = sorted(
        tuple(r)
        for r in load_all()["j16_grid_proximity_join"].fn(spark, r8b_10x_dir).collect()
    )

    def phash(prefix, key):
        return (
            F.conv(F.substring(F.md5(F.concat(F.lit(prefix), F.col(key).cast("string"))), 1, 8), 16, 10).cast("long")
            % 1000
        )

    c = spark.read.parquet(f"{r8b_10x_dir}/customer.parquet").select(
        "c_custkey", phash("gx:", "c_custkey").alias("cx"), phash("gy:", "c_custkey").alias("cy")
    )
    s = spark.read.parquet(f"{r8b_10x_dir}/supplier.parquet").select(
        "s_suppkey", phash("sx:", "s_suppkey").alias("sx"), phash("sy:", "s_suppkey").alias("sy")
    )
    brute = (
        c.join(
            F.broadcast(s),
            (F.abs(F.col("cx") - F.col("sx")) <= 50)
            & (F.abs(F.col("cy") - F.col("sy")) <= 50),
        )
        .select(
            "c_custkey",
            "s_suppkey",
            F.greatest(F.abs(F.col("cx") - F.col("sx")), F.abs(F.col("cy") - F.col("sy")))
            .cast("bigint")
            .alias("cheb_dist"),
        )
        .collect()
    )
    assert got == sorted(tuple(r) for r in brute)
    assert len(got) > 0


def test_w12_is_per_user_local_at_10x(spark, sf_dir, r8b_10x_dir):
    """The frame is user-local, so replicating every user under fresh ids
    must reproduce each original flag 10x: total outliers scale exactly, and
    the rep-0 slice is row-identical to the original output."""
    fn = load_all()["w12_rolling_mad_outlier"].fn
    base = sorted(tuple(r) for r in fn(spark, sf_dir).collect())
    big = fn(spark, r8b_10x_dir).collect()
    assert len(big) == 10 * len(base)
    rep0 = sorted(tuple(r) for r in big if r["user_id"] < 10_000_000)
    assert rep0 == base


def test_w13_is_per_user_local_at_10x(spark, sf_dir, r8b_10x_dir):
    """w13's five window sums are user-local: replicating every user under
    fresh ids (timestamps unchanged) must reproduce each original frame's
    exact integer num/den 10x, and the rep-0 slice row-identically."""
    fn = load_all()["w13_rolling_regression_slope"].fn
    base = sorted(tuple(r) for r in fn(spark, sf_dir).collect())
    big = fn(spark, r8b_10x_dir).collect()
    assert len(big) == 10 * len(base)
    rep0 = sorted(tuple(r) for r in big if r["user_id"] < 10_000_000)
    assert rep0 == base


def test_a18_scales_exactly_under_duplication(spark, sf_dir, r8b_10x_dir):
    """10x exact-duplicate lineitem rows scale every histogram weight by
    exactly 10 — but the fences re-floor at tot' = 10*tot (tot'//10 = tot
    exactly, so kept' = 8*tot, NOT 10*(tot - 2*(tot//10))), shifting the
    boundary slivers. The exact expectation therefore comes from a Python
    walk over the 10x-scaled BASE histogram, down to the bit-identical
    final IEEE division."""
    from decimal import Decimal

    fn = load_all()["a18_weighted_trimmed_mean"].fn
    big = {r["l_returnflag"]: r for r in fn(spark, r8b_10x_dir).collect()}
    hists: dict = {}
    for r in (
        load_table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_quantity", "l_extendedprice")
        .collect()
    ):
        qc = int(Decimal(str(r["l_quantity"])).quantize(Decimal("0.01")) * 100)
        wc = int(Decimal(str(r["l_extendedprice"])).quantize(Decimal("0.01")) * 100)
        hists.setdefault(r["l_returnflag"], {})
        hists[r["l_returnflag"]][qc] = hists[r["l_returnflag"]].get(qc, 0) + 10 * wc
    assert set(hists) == set(big) and len(big) > 0
    for flag, hist in hists.items():
        tot = sum(hist.values())
        lo, hi = tot // 10, tot - tot // 10
        cum, ks = 0, 0
        for qc in sorted(hist):
            w = hist[qc]
            cum += w
            ks += max(0, min(cum, hi) - max(cum - w, lo)) * qc
        g = big[flag]
        assert g["total_weight_cents"] == tot, flag
        assert g["kept_weight_cents"] == hi - lo, flag
        assert g["kept_wsum"] == ks, flag
        assert g["wtrimmed_mean_qty_cents"] == float(ks) / float(hi - lo), flag


def test_x45_replicated_corpus_is_fully_covered(spark, r8b_10x_dir):
    """On a 10x-replicated corpus every doc's every 8-gram appears in its 9
    replicas too, so EVERY position is flagged and the interval union must
    telescope to exactly n_tokens for every doc with >= 8 tokens (and 0
    below 8) — the closed-form endpoint of the coverage arithmetic."""
    rows = load_all()["x45_dup_span_coverage"].fn(spark, r8b_10x_dir).collect()
    assert len(rows) > 0
    for r in rows:
        if r["n_tokens"] >= 8:
            assert r["covered_tokens"] == r["n_tokens"], r
            assert r["dup_positions"] == r["n_tokens"] - 7, r
        else:
            assert r["covered_tokens"] == 0 and r["dup_positions"] == 0, r


def test_x47_floor_invariant_at_10x(spark, sf_dir, r8b_10x_dir):
    """x47's contract at 10x corpus: every source holds out at least
    min(5, n_docs) docs, hash picks are exactly the bucket<10 set (stable
    under growth — the sf0.01 picks survive verbatim among the replicas
    whose doc_ids are unchanged, rep 0), and floor top-ups appear only for
    deficient sources and only up to the deficit."""
    from ez_cdc_spark.queries import load_all
    from ez_cdc_spark.sources.tables import load_table

    reg = load_all()
    out = reg["x47_holdout_with_floors"].fn(spark, r8b_10x_dir)
    rows = out.collect()
    per_source: dict = {}
    for r in rows:
        per_source.setdefault(r["source"], []).append(r)
    n_docs = {
        r["source"]: r["n"]
        for r in load_table(spark, r8b_10x_dir, "documents")
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(per_source) <= set(n_docs)
    for src, n in n_docs.items():
        picked = per_source.get(src, [])
        assert len(picked) >= min(5, n), (src, len(picked), n)
        n_hash = sum(1 for r in picked if r["via"] == "hash")
        n_floor = sum(1 for r in picked if r["via"] == "floor")
        if n_floor:
            assert n_hash < 5 and n_hash + n_floor == min(
                5, n_hash + n_floor
            ) and n_hash + n_floor <= 5, (src, n_hash, n_floor)
        assert all(r["bucket"] < 10 for r in picked if r["via"] == "hash")
        assert all(r["bucket"] >= 10 for r in picked if r["via"] == "floor")
    # growth stability: the sf0.01 hash picks (doc_id < 10M = rep 0) are a
    # subset of the 10x picks with identical via='hash' buckets
    small = {
        r["doc_id"]: r["bucket"]
        for r in reg["x47_holdout_with_floors"].fn(spark, sf_dir).collect()
        if r["via"] == "hash"
    }
    big_hash = {r["doc_id"]: r["bucket"] for r in rows if r["via"] == "hash"}
    for did, b in small.items():
        assert big_hash.get(did) == b, did


def test_w17_is_per_user_local_at_10x(spark, sf_dir, r8b_10x_dir):
    """w17's recurrence is user-local: replicating every user under fresh
    ids (timestamps unchanged) must reproduce each original final state
    exactly, and the rep-0 slice row-identically."""
    fn = load_all()["w17_timedecay_ewma"].fn
    base = sorted(tuple(r) for r in fn(spark, sf_dir).collect())
    big = fn(spark, r8b_10x_dir).collect()
    assert len(big) == 10 * len(base)
    rep0 = sorted(tuple(r) for r in big if r["user_id"] < 10_000_000)
    assert rep0 == base


def test_a22_cms_scales_exactly_under_duplication(spark, sf_dir, r8b_10x_dir):
    """10x exact-duplicate lineitem rows multiply every sketch cell, every
    true count, and therefore every min-estimate and overestimate by exactly
    10 — the cell-wise-SUM merge (CRDT) property that makes CMS shardable:
    the probe set is unchanged and every reported number scales linearly."""
    fn = load_all()["a22_count_min_sketch"].fn
    base = {r["l_partkey"]: r for r in fn(spark, sf_dir).collect()}
    big = {r["l_partkey"]: r for r in fn(spark, r8b_10x_dir).collect()}
    assert set(big) == set(base)
    for k, b in base.items():
        g = big[k]
        assert (g["true_cnt"], g["cms_est"], g["overestimate"]) == (
            10 * b["true_cnt"],
            10 * b["cms_est"],
            10 * b["overestimate"],
        )


def test_a23_bitmap_is_duplicate_insensitive_at_10x(spark, sf_dir, r8b_10x_dir):
    """OR-merge is idempotent: the 10x exact-duplicate orders corpus must
    reproduce the bitmap output bit-for-bit (a22's SUM merge scales 10x on
    the same fixture; a23's OR merge must not move at all)."""
    fn = load_all()["a23_bitmap_distinct"].fn
    base = sorted(tuple(r) for r in fn(spark, sf_dir).collect())
    big = sorted(tuple(r) for r in fn(spark, r8b_10x_dir).collect())
    assert big == base


def test_w18_is_per_user_local_at_10x(spark, sf_dir, r8b_10x_dir):
    """w18's frame is user-local: replicated users under fresh ids must
    reproduce every original mode row exactly (rep-0 slice identical)."""
    fn = load_all()["w18_rolling_mode"].fn
    base = sorted(tuple(r) for r in fn(spark, sf_dir).collect())
    big = fn(spark, r8b_10x_dir).collect()
    assert len(big) == 10 * len(base)
    rep0 = sorted(tuple(r) for r in big if r["user_id"] < 10_000_000)
    assert rep0 == base


def test_x50_replicated_corpus_removes_everything(spark, r8b_10x_dir):
    """x50 on the 10x exact-duplicate corpus: every 8-gram of every doc
    with >= 8 tokens also lives in its 9 replicas, so span removal must
    delete the ENTIRE document (n_kept == 0, kept_md5 == md5('')) while
    docs under 8 tokens survive verbatim — x45's closed-form endpoint
    applied to the transform, plus the removal/coverage identity holding
    at 10x."""
    import hashlib

    from ez_cdc_spark.queries import load_all

    reg = load_all()
    x50 = reg["x50_span_removal"].fn(spark, r8b_10x_dir).collect()
    assert len(x50) > 0
    empty_md5 = hashlib.md5(b"").hexdigest()
    for r in x50:
        if r["n_tokens"] >= 8:
            assert r["n_kept"] == 0 and r["n_removed"] == r["n_tokens"], r
            assert r["kept_md5"] == empty_md5, r
        else:
            assert r["n_removed"] == 0 and r["n_kept"] == r["n_tokens"], r


def test_t30b_fixed_churn_cost_is_flat_across_table_growth(spark, sf_dir):
    """r14 verdict #7: the f86c28e merge-scaling claim, measured through
    the PARTITIONED STREAMING sink with the maintenance policy on. The
    envelope replay (the churn) is CONSTANT while the settled table grows
    16x; the structural cost witnesses — files rewritten by merges and by
    the size-filtered partial compactions — must be IDENTICAL at both
    sizes, every settled file must be carried by reference to the final
    generation, and the maintenance policy must actually have fired (a
    never-firing compaction would make the flatness vacuous)."""
    import importlib

    probe = importlib.import_module("bench_scaling").t30b_fixed_churn_probe

    small = probe(spark, 30_000, sf_dir)
    big = probe(spark, 480_000, sf_dir)

    assert small["micro_batches"] == big["micro_batches"] > 1
    assert small["compactions"] == big["compactions"] > 0, (small, big)
    assert (
        small["merge_rewritten_files_total"]
        == big["merge_rewritten_files_total"]
        > 0
    ), (small, big)
    assert (
        small["compact_rewritten_files_total"]
        == big["compact_rewritten_files_total"]
        > 0
    ), (small, big)
    assert small["settled_files_carried_to_final"] == small["seed_files"]
    assert big["settled_files_carried_to_final"] == big["seed_files"]
