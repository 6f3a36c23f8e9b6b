"""CDC-native analytics over the change stream (SURVEY.md §2b X25-X27,
T14-T15).

The reference's pipeline ends at "changes land somewhere"
(/root/reference/python/cdc_test/main.py:45-56 prints decoded envelopes);
these operators are what a warehouse DOES with a landed change stream next:
slowly-changing-dimension history (X25 batch build, T14 incremental
streaming maintenance), point-in-time state reconstruction (X26), per-key
change auditing (X27), and landing the stream in an RDBMS over JDBC (T15).
All consume the same deterministic envelope derivation as t9/s3b
(streaming/cdc.py), so the DuckDB oracle reproduces the exact input from
the events table via the shared ENV_CTE.

Scale design: every batch operator reduces to ONE key-partitioned exchange
(the id-keyed window or aggregate); envelope payloads are projected to flat
columns map-side before any shuffle, and the as-of pivot is a 1-row
broadcast, so nothing here moves more than (key, lsn, attrs) rows. The
streaming pair bound per-batch work by touched state buckets (T14) or
batch size (T15), never state size.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ez_cdc_spark.queries import register
from ez_cdc_spark.queries._util import t
from ez_cdc_spark.queries.streaming_equiv import ENV_CTE
from ez_cdc_spark.streaming.cdc import derive_envelopes

# Oracle CTE: flatten + dedup the envelope stream to one row per (id, lsn).
# The % 97 duplicate envelopes collapse here, mirroring the Spark-side
# dropDuplicates on the replay-identity key — the normalization every
# at-least-once consumer performs before interpreting a change log.
_DED_CTE = (
    ENV_CTE
    + """,
ded AS (
  SELECT DISTINCT id, lsn, op, first_name, last_name, email FROM env
)
"""
)


def _flat_envelopes(spark, sf_dir, dedup: bool = True):
    """Batch envelope set flattened to (id, op, lsn, attrs). Attribute
    columns come from the after-image and are NULL on deletes (the oracle's
    env carries synthetic values there; no operator below ever surfaces a
    delete's attributes, so the two sides agree on everything comparable).
    The projection happens before any exchange — the nested before/after
    structs never shuffle.

    ``dedup=True`` collapses at-least-once duplicates to one row per
    (id, lsn) via dropDuplicates (an (id,lsn)-keyed exchange with map-side
    partial dedup). Callers that are duplicate-insensitive (x26: max_by
    picks the same winner either way) or that fold dedup into an exchange
    they already pay (x25's lag test) pass dedup=False and skip it."""
    env = derive_envelopes(t(spark, sf_dir, "events"))
    flat = env.select(
        F.coalesce(F.col("after.id"), F.col("before.id")).cast("bigint").alias("id"),
        "op",
        F.col("source.lsn").cast("bigint").alias("lsn"),
        F.col("after.first_name").alias("first_name"),
        F.col("after.last_name").alias("last_name"),
        F.col("after.email").alias("email"),
    )
    return flat.dropDuplicates(["id", "lsn"]) if dedup else flat


# The SCD2 result contract, shared verbatim by X25 (batch build) and T14
# (incrementally maintained by the streaming merge): the two MUST converge
# to the identical table.
_SCD2_ORACLE = (
    _DED_CTE
    + """
, seq AS (
  SELECT id, lsn, op, first_name, last_name, email,
         LEAD(lsn) OVER (PARTITION BY id ORDER BY lsn) AS next_lsn
  FROM ded
)
SELECT CAST(id AS BIGINT) AS id,
       CAST(ROW_NUMBER() OVER (PARTITION BY id ORDER BY lsn) AS BIGINT)
         AS version_no,
       first_name, last_name, email,
       CAST(lsn AS BIGINT) AS valid_from_lsn,
       CAST(next_lsn AS BIGINT) AS valid_to_lsn,
       CAST(CASE WHEN next_lsn IS NULL THEN 1 ELSE 0 END AS INT) AS is_current
FROM seq WHERE op <> 'd'
ORDER BY id, version_no
"""
)


@register(
    "x25_scd2_history",
    oracle=_SCD2_ORACLE,
    doc="X25: SCD Type-2 history build — the change log becomes a versioned "
    "dimension: every create/update opens a version valid from its LSN "
    "until the key's NEXT change (update supersedes, delete closes "
    "without opening), NULL valid_to marks the live version. This is the "
    "canonical warehouse consumption of a Debezium stream — t9 "
    "materializes only current state; X25 keeps the full history an "
    "auditable dimension table needs. Plan: map-side flatten, then ONE "
    "id-keyed exchange carrying everything — duplicate collapse (a lag "
    "test inside the same sorted window, instead of a separate "
    "(id,lsn)-keyed dedup shuffle), the lead() window, and the "
    "post-filter version numbering (same partitioning and sort order, so "
    "neither re-shuffles nor re-sorts; single-exchange shape "
    "plan-asserted in tests). At 100 TB the window state per key is one "
    "row — SCD2 scales with key cardinality, not change volume.",
)
def x25_scd2_history(spark, sf_dir):
    flat = _flat_envelopes(spark, sf_dir, dedup=False)
    w = Window.partitionBy("id").orderBy("lsn")
    # at-least-once duplicates are adjacent in the (id, lsn) sort; keeping
    # the first of each run is a lag test in the exchange we already pay
    ded = (
        flat.withColumn("_dup", F.lag("lsn").over(w) == F.col("lsn"))
        .filter(~F.coalesce(F.col("_dup"), F.lit(False)))
        .drop("_dup")
    )
    seq = ded.withColumn("next_lsn", F.lead("lsn").over(w))
    opened = seq.filter(F.col("op") != "d")
    w_ver = Window.partitionBy("id").orderBy("valid_from_lsn")
    return (
        opened.select(
            "id",
            "first_name",
            "last_name",
            "email",
            F.col("lsn").alias("valid_from_lsn"),
            F.col("next_lsn").alias("valid_to_lsn"),
            F.col("next_lsn").isNull().cast("int").alias("is_current"),
        )
        .withColumn("version_no", F.row_number().over(w_ver).cast("bigint"))
        .select(
            "id",
            "version_no",
            "first_name",
            "last_name",
            "email",
            "valid_from_lsn",
            "valid_to_lsn",
            "is_current",
        )
        .orderBy("id", "version_no")
    )


@register(
    "x26_state_asof_lsn",
    oracle=_DED_CTE
    + """
, piv AS (SELECT MAX(lsn) // 2 AS cut FROM ded),
cut AS (SELECT d.* FROM ded d, piv p WHERE d.lsn <= p.cut),
last AS (SELECT id, MAX(lsn) AS last_lsn FROM cut GROUP BY id)
SELECT CAST(c.id AS BIGINT) AS id, c.first_name, c.last_name, c.email,
       CAST(c.lsn AS BIGINT) AS as_of_lsn
FROM cut c JOIN last l ON c.id = l.id AND c.lsn = l.last_lsn
WHERE c.op <> 'd'
ORDER BY id
""",
    doc="X26: point-in-time state reconstruction (time travel) — the table "
    "as it stood at a pivot LSN (half the max, scale-independent): keep "
    "each key's last change at-or-below the pivot, drop keys whose last "
    "change was a delete. With X16 (snapshot diff) this closes the CDC "
    "loop: any historical state is recoverable from the log alone. Plan: "
    "the pivot is a 1-row aggregate broadcast into the filter (no second "
    "pass over data); the winner per key is ONE id-keyed max_by "
    "aggregate — no last-lsn self-join, no dedup shuffle (at-least-once "
    "duplicates share (lsn, row), so max_by picks the same winner either "
    "way), and the trailing-delete drop is a filter on the winning "
    "struct, not a separate pass.",
)
def x26_state_asof_lsn(spark, sf_dir):
    flat = _flat_envelopes(spark, sf_dir, dedup=False)
    pivot = flat.agg((F.floor(F.max("lsn") / 2)).cast("bigint").alias("cut"))
    cut = flat.join(F.broadcast(pivot), F.col("lsn") <= F.col("cut")).drop("cut")
    winner = F.max_by(
        F.struct("op", "first_name", "last_name", "email", "lsn"), F.col("lsn")
    )
    return (
        cut.groupBy("id")
        .agg(winner.alias("w"))
        .filter(F.col("w.op") != "d")
        .select(
            "id",
            F.col("w.first_name").alias("first_name"),
            F.col("w.last_name").alias("last_name"),
            F.col("w.email").alias("email"),
            F.col("w.lsn").alias("as_of_lsn"),
        )
        .orderBy("id")
    )


@register(
    "x27_change_audit",
    oracle=_DED_CTE
    + """
SELECT CAST(id AS BIGINT) AS id,
       CAST(SUM(CASE WHEN op = 'c' THEN 1 ELSE 0 END) AS BIGINT) AS n_creates,
       CAST(SUM(CASE WHEN op = 'u' THEN 1 ELSE 0 END) AS BIGINT) AS n_updates,
       CAST(SUM(CASE WHEN op = 'd' THEN 1 ELSE 0 END) AS BIGINT) AS n_deletes,
       CAST(COUNT(*) AS BIGINT) AS n_changes,
       CAST(MIN(lsn) AS BIGINT) AS first_lsn,
       CAST(MAX(lsn) AS BIGINT) AS last_lsn,
       CAST(CASE WHEN MAX(CASE WHEN lsn = max_lsn THEN
                 CASE WHEN op = 'd' THEN 1 ELSE 0 END END) = 1
            THEN 1 ELSE 0 END AS INT) AS ends_deleted
FROM (SELECT *, MAX(lsn) OVER (PARTITION BY id) AS max_lsn FROM ded)
GROUP BY id
ORDER BY id
""",
    doc="X27: per-key change audit — the operational health view of a "
    "change stream: per key, how many creates/updates/deletes, its LSN "
    "lifespan, and whether its final state is deleted (the tombstone "
    "check a compaction job needs). max_by(op-is-delete, lsn) folds the "
    "'what was the last op' question into the same id-keyed aggregate as "
    "the counts — no window pass, no join; two exchanges total (the "
    "(id,lsn) duplicate collapse the counts require, then the id rollup), "
    "both partial-aggregated map-side. The oracle states the last-op "
    "question as a windowed max over the same partition.",
)
def x27_change_audit(spark, sf_dir):
    ded = _flat_envelopes(spark, sf_dir)
    return (
        ded.groupBy("id")
        .agg(
            F.sum((F.col("op") == "c").cast("int")).cast("bigint").alias("n_creates"),
            F.sum((F.col("op") == "u").cast("int")).cast("bigint").alias("n_updates"),
            F.sum((F.col("op") == "d").cast("int")).cast("bigint").alias("n_deletes"),
            F.count("*").cast("bigint").alias("n_changes"),
            F.min("lsn").cast("bigint").alias("first_lsn"),
            F.max("lsn").cast("bigint").alias("last_lsn"),
            F.max_by((F.col("op") == "d").cast("int"), F.col("lsn"))
            .cast("int")
            .alias("ends_deleted"),
        )
        .orderBy("id")
    )


@register(
    "t14_scd2_maintenance",
    oracle=_SCD2_ORACLE,
    doc="T14: incremental SCD2 maintenance — the streaming form of X25, as "
    "T9 is for current state: the envelope replay (sliced into several "
    "micro-batches so cross-batch closes actually happen) drives a "
    "foreachBatch merge that reconstructs the event log for ONLY the "
    "touched state buckets, recomputes the versioned history for those "
    "keys, and swaps only their bucket dirs (streaming/cdc.py: "
    "scd2_batch). The maintained table must equal the batch X25 build "
    "row-for-row — same oracle SQL, hash-checked. Per-batch work tracks "
    "touched keys x history depth, never state size (bucket-bounded "
    "rewrites pinned in tests/test_cdc_goldens.py).",
)
def t14_scd2_maintenance(spark, sf_dir):
    from ez_cdc_spark.streaming.cdc import materialize_scd2

    # materialize_scd2 returns the read_scd2 view: versions only, orphan-
    # delete tombstones (merge bookkeeping) stay internal to the state dir
    hist = materialize_scd2(spark, sf_dir)
    return hist.select(
        "id",
        "version_no",
        "first_name",
        "last_name",
        "email",
        "valid_from_lsn",
        "valid_to_lsn",
        "is_current",
    ).orderBy("id", "version_no")


@register(
    "t15_jdbc_cdc_sink",
    oracle=ENV_CTE
    + """
, latest AS (
  SELECT id,
         max_by(op, lsn) AS op,
         CAST(MAX(lsn) AS BIGINT) AS lsn,
         max_by(first_name, lsn) AS first_name,
         max_by(last_name, lsn) AS last_name,
         max_by(email, lsn) AS email
  FROM env GROUP BY id
)
SELECT id, lsn, first_name, last_name, email
FROM latest WHERE op <> 'd'
ORDER BY id
""",
    doc="T15: CDC landing into an RDBMS over JDBC — the serving side the "
    "reference's pipeline implies but never builds (its consumer only "
    "prints; a real deployment lands changes somewhere queryable). Each "
    "micro-batch APPENDS its batch_id-tagged changes to a Derby table "
    "through the standard JDBC writer — O(batch) per batch, never "
    "O(state) — lsn-deduped ACROSS batches (anti-join vs already-landed "
    "lsns in the batch's range; at-least-once duplicates can straddle "
    "micro-batches), with replay idempotency via delete-own-batch_id-"
    "then-append (streaming/cdc.py: jdbc_cdc_sink_batch). Current state "
    "is a last-writer-wins view over the landed log, computed here on "
    "read (one id-keyed max_by aggregate); the final table must equal "
    "t9's materialized state exactly — same oracle SQL. Embedded Derby "
    "is the same code path as any JDBC target; only URL/driver differ.",
)
def t15_jdbc_cdc_sink(spark, sf_dir):
    from ez_cdc_spark.streaming.cdc import materialize_jdbc

    landed = materialize_jdbc(spark, sf_dir)
    winner = F.max_by(
        F.struct("op", "lsn", "first_name", "last_name", "email"), F.col("lsn")
    )
    return (
        landed.groupBy("id")
        .agg(winner.alias("w"))
        .filter(F.col("w.op") != "d")
        .select(
            F.col("id").cast("bigint").alias("id"),
            F.col("w.lsn").cast("bigint").alias("lsn"),
            F.col("w.first_name").alias("first_name"),
            F.col("w.last_name").alias("last_name"),
            F.col("w.email").alias("email"),
        )
        .orderBy("id")
    )


@register(
    "x33_pit_enrich",
    oracle=ENV_CTE
    + """,
ded AS (
  SELECT DISTINCT id, lsn, op, first_name, last_name, email FROM env
),
facts AS (
  SELECT CAST(event_id % 200 AS BIGINT) AS id,
         CAST(event_id AS BIGINT) AS flsn,
         CAST(event_id AS BIGINT) AS event_id,
         CAST(user_id AS BIGINT) AS user_id,
         CAST(value AS DECIMAL(12,2)) AS v
  FROM events WHERE event_type = 'click'
)
SELECT f.event_id AS event_id, f.id AS id, f.user_id AS user_id,
       CAST(f.v AS DOUBLE) AS fact_value,
       CASE WHEN d.op = 'd' THEN NULL ELSE d.first_name END AS dim_first_name,
       CASE WHEN d.op = 'd' THEN NULL ELSE d.last_name END AS dim_last_name,
       CASE WHEN d.op = 'd' THEN NULL ELSE d.email END AS dim_email,
       CAST(d.lsn AS BIGINT) AS dim_lsn
FROM facts f ASOF LEFT JOIN ded d ON f.id = d.id AND f.flsn > d.lsn
ORDER BY event_id
""",
    doc="X33: point-in-time dimension enrichment — each fact ('click' "
    "events) is decorated with the dimension state its key held STRICTLY "
    "BEFORE the fact's LSN (the before-image a REPLICA-IDENTITY-FULL "
    "source carries on the wire, reconstructed downstream from the change "
    "log alone): the latest c/u change below the fact's LSN supplies the "
    "attributes, a latest-change delete yields NULLs (key dead at fact "
    "time), and dim_lsn records the matched change for audit. Strategy "
    "generalizes J8's union+LOCF as-of (operators/asof.py) to a CDC "
    "change log with delete tombstones — NOT a range join (DuckDB's ASOF "
    "sort-merges two inputs): facts and changes UNION into one stream, "
    "sorted (lsn, kind) inside a single id-keyed exchange, and a "
    "last(ignorenulls) window carries the change state onto the facts — "
    "the PIT join costs exactly one shuffle of flat rows, no join node at "
    "all (plan-asserted). At-least-once duplicate changes are identical "
    "rows, so the carried state is unaffected and no dedup pass is paid. "
    "At 100 TB this scales like any keyed window: one exchange of "
    "(id, lsn, attrs), state per key = one row.",
)
def x33_pit_enrich(spark, sf_dir):
    changes = _flat_envelopes(spark, sf_dir, dedup=False).select(
        "id",
        "lsn",
        F.lit(1).alias("kind"),  # facts (0) sort first at equal lsn
        F.struct("op", "first_name", "last_name", "email", "lsn").alias("st"),
        F.lit(None).cast("bigint").alias("event_id"),
        F.lit(None).cast("bigint").alias("user_id"),
        F.lit(None).cast("decimal(12,2)").alias("v"),
    )
    facts = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .select(
            (F.col("event_id") % 200).cast("bigint").alias("id"),
            F.col("event_id").cast("bigint").alias("lsn"),
            F.lit(0).alias("kind"),
            F.lit(None)
            .cast(
                "struct<op:string,first_name:string,last_name:string,"
                "email:string,lsn:bigint>"
            )
            .alias("st"),
            F.col("event_id").cast("bigint").alias("event_id"),
            F.col("user_id").cast("bigint").alias("user_id"),
            F.col("value").cast("decimal(12,2)").alias("v"),
        )
    )
    w = (
        Window.partitionBy("id")
        .orderBy("lsn", "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last("st", ignorenulls=True).over(w)
    live = F.col("pit.op").isNotNull() & (F.col("pit.op") != F.lit("d"))
    return (
        changes.unionByName(facts)
        .withColumn("pit", carried)
        .filter(F.col("kind") == 0)
        .select(
            "event_id",
            "id",
            "user_id",
            F.col("v").cast("double").alias("fact_value"),
            F.when(live, F.col("pit.first_name")).alias("dim_first_name"),
            F.when(live, F.col("pit.last_name")).alias("dim_last_name"),
            F.when(live, F.col("pit.email")).alias("dim_email"),
            F.col("pit.lsn").alias("dim_lsn"),
        )
        .orderBy("event_id")
    )
