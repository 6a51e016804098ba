"""CDC-derived batch operators (SURVEY.md §2.2 X1-X2 + R3/R4/R13/R20 analogues).

The reference pipeline's sink exists so change data can be *queried*
(Kibana over ``cdc_*`` indices, reference ``README.md:189-194``). These are
those queries, expressed over the ``events`` fixture (the change-log
stand-in: ``event_id`` is the LSN ordinal, ``user_id`` the row key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .stats import exact_interp_pct, exact_interp_pct_weighted


@register(
    "latest_state",
    tags=("cdc", "flagship"),
    oracle="""
    SELECT event_id, ts, user_id, event_type, value, props
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
      FROM events
    ) t
    WHERE rn = 1
    """,
)
def latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize the current row per key from an ordered change log -- the
    idempotent-upsert semantic of the reference's ES sink done right
    (``cmd/es_consumer/main.go:77-95`` keys docs by LSN, i.e. per *event*;
    the queryable "current state" view is latest-event-per-key).

    Scale note: implemented as ``max_by`` aggregation, NOT a window.
    ``groupBy(key).agg(max_by(...))`` gets map-side partial aggregation
    (one shuffle of partially-reduced data), whereas
    ``row_number() over (partition by key)`` shuffles every raw row and
    sorts each partition -- at 100 TB the difference is the job.
    """
    ev = load_table(spark, sf_dir, "events")
    payload = [c for c in ev.columns if c != "user_id"]
    return (
        ev.groupBy("user_id")
        .agg(F.max_by(F.struct(*payload), F.col("event_id")).alias("r"))
        .select("user_id", "r.*")
    )


@register(
    "inserts_over_time",
    tags=("cdc",),
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY 1, 2
    """,
)
def inserts_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference README's own example analytic ("inserts over time",
    ``README.md:194``): events per day per op-type. Partial-aggregated
    groupBy; at scale the day-truncated key is low-cardinality and safe."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.col("event_type"),
    ).agg(F.count("*").alias("n_events"))


@register(
    "event_envelope",
    tags=("cdc",),
    oracle="""
    SELECT 'insert'            AS op,
           'public'            AS schema_name,
           'events'            AS table_name,
           event_id            AS lsn,
           ts                  AS ts,
           'public.events:' || CAST(user_id AS VARCHAR) AS key,
           CAST(user_id AS VARCHAR)   AS after_user_id,
           event_type                 AS after_event_type,
           CAST(value AS VARCHAR)     AS after_value
    FROM events
    """,
)
def event_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row -> CDC-envelope projection (reference builds
    ``{type,schema,table,lsn,timestamp,data}`` per row,
    ``internal/wal/replicator.go:138-145,360-367``). Payload values are
    string-degraded exactly as the reference does (``replicator.go:134``).
    Pure ``select`` -- narrow, codegen'd, no shuffle."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.lit("insert").alias("op"),
        F.lit("public").alias("schema_name"),
        F.lit("events").alias("table_name"),
        F.col("event_id").alias("lsn"),
        F.col("ts").alias("ts"),
        F.concat(F.lit("public.events:"), F.col("user_id").cast("string")).alias("key"),
        F.col("user_id").cast("string").alias("after_user_id"),
        F.col("event_type").alias("after_event_type"),
        F.col("value").cast("string").alias("after_value"),
    )


@register(
    "cdc_key",
    tags=("cdc",),
    oracle="""
    SELECT event_id,
           'public.events' || ':' || CAST(user_id AS VARCHAR) AS key
    FROM events
    """,
)
def cdc_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kafka-key extraction (reference: ``schema.table:pk``,
    ``replicator.go:374-379``). The engine uses the *declared* PK from the
    catalog, not the first-column assumption (``replicator.go:341``)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.concat_ws(":", F.lit("public.events"), F.col("user_id").cast("string")).alias("key"),
    )


@register(
    "parse_envelope",
    tags=("cdc",),
    oracle="""
    SELECT event_id,
           TRY_CAST(CASE WHEN json_valid(props)
                         THEN json_extract_string(props, '$.k') END
                    AS BIGINT) AS k,
           CASE WHEN json_valid(props)
                THEN json_extract_string(props, '$.k') END AS k_raw
    FROM events
    """,
)
def parse_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON payload decode (reference consumer ``json.Unmarshal`` into a
    dynamic map, ``cmd/es_consumer/main.go:66-71``): extract typed fields
    from a JSON-string column with built-in JSON path functions -- JVM-side,
    no Python in the loop."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").try_cast("long").alias("k"),
        F.get_json_object("props", "$.k").alias("k_raw"),
    )


@register(
    "decode_update",
    tags=("cdc",),
    oracle="""
    SELECT event_id AS lsn,
           user_id,
           CAST(lag(value) OVER (PARTITION BY user_id ORDER BY event_id) AS VARCHAR) AS before_value,
           CAST(value AS VARCHAR) AS after_value
    FROM events
    QUALIFY lag(value) OVER (PARTITION BY user_id ORDER BY event_id) IS NOT NULL
    """,
)
def decode_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE envelope with both images -- the reference only logs updates
    and drops them (``internal/wal/replicator.go:387-396``, comment at 396);
    the engine constructs before (= previous row image, via the per-key lag)
    and after, string-degraded, then reads both back out of the envelope
    maps. Proves the full old/new-image codec the reference stubs."""
    from pyspark.sql import Window

    from ..streaming import envelope as env

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    changes = (
        ev.withColumn("old_value", F.lag("value").over(w))
        .filter(F.col("old_value").isNotNull())
        .select("event_id", "user_id", "value", F.col("old_value").cast("string").alias("old_value"))
    )
    enc = env.encode(
        changes.select("event_id", "user_id", "value", F.col("old_value").alias("old_v")),
        op="update",
        schema_name="public",
        table_name="events",
        pk_cols=["user_id"],
        lsn=F.col("event_id"),
        ts=F.current_timestamp(),
        before_cols=["old_v"],
    )
    return enc.select(
        F.col("lsn"),
        F.element_at("after", "user_id").cast("long").alias("user_id"),
        F.element_at("before", "v").alias("before_value"),
        F.element_at("after", "value").alias("after_value"),
    )


@register(
    "decode_delete",
    tags=("cdc",),
    oracle="""
    SELECT event_id AS lsn,
           'delete' AS op,
           'public.events:' || CAST(user_id AS VARCHAR) AS key,
           CAST(user_id AS VARCHAR) AS before_user_id,
           event_type AS before_event_type
    FROM events
    WHERE event_type = 'error'
    """,
)
def decode_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETE envelope carrying the old image in ``before`` -- also stubbed
    in the reference (``replicator.go:398-407``). Here 'error' events play
    the deleted rows; the envelope round-trips key + before-image."""
    from ..streaming import envelope as env

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "error")
    enc = env.encode(
        ev.select("event_id", "user_id", "event_type"),
        op="delete",
        schema_name="public",
        table_name="events",
        pk_cols=["user_id"],
        lsn=F.col("event_id"),
        ts=F.current_timestamp(),
    )
    return enc.select(
        "lsn",
        "op",
        "key",
        F.element_at("before", "user_id").alias("before_user_id"),
        F.element_at("before", "event_type").alias("before_event_type"),
    )


@register(
    "route_by_table",
    tags=("cdc",),
    oracle="""
    SELECT 'public' AS schema_name,
           'events_' || event_type AS table_name,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(max(event_id) AS BIGINT) AS max_lsn
    FROM events
    GROUP BY event_type
    """,
)
def route_by_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic per-table routing stats (R21: index name
    ``cdc_<schema>_<table>``, ``cmd/es_consumer/main.go:75``): events fan
    out to one sink partition per (schema, table); this query is the
    router's accounting view -- event count and high-watermark LSN per
    destination, i.e. exactly what a sink health check reads."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.lit("public").alias("schema_name"),
        F.concat(F.lit("events_"), F.col("event_type")).alias("table_name"),
    ).agg(
        F.count("*").alias("n_events"),
        F.max("event_id").alias("max_lsn"),
    )


@register(
    "decode_insert",
    tags=("cdc",),
    oracle="""
    SELECT event_id AS lsn,
           CAST(event_id AS VARCHAR)   AS user_event_id,
           CAST(user_id AS VARCHAR)    AS user_user_id,
           event_type                  AS user_event_type
    FROM events
    """,
)
def decode_insert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INSERT decode round-trip (reference ``replicator.go:332-385`` decodes
    positional tuples into a string map). Engine: encode rows to the JSON
    envelope with ``to_json``, decode with ``from_json`` against the catalog
    schema -- proving the codec is lossless. The oracle is the identity
    projection, which is exactly what a lossless round-trip must equal."""
    ev = load_table(spark, sf_dir, "events")
    enc = ev.select(
        F.col("event_id").alias("lsn"),
        F.to_json(
            F.struct(
                F.col("event_id").cast("string").alias("event_id"),
                F.col("user_id").cast("string").alias("user_id"),
                F.col("event_type").alias("event_type"),
            )
        ).alias("payload"),
    )
    payload_schema = "event_id string, user_id string, event_type string"
    dec = enc.select("lsn", F.from_json("payload", payload_schema).alias("d"))
    return dec.select(
        "lsn",
        F.col("d.event_id").alias("user_event_id"),
        F.col("d.user_id").alias("user_user_id"),
        F.col("d.event_type").alias("user_event_type"),
    )


@register(
    "cdc_scd2",
    tags=("cdc", "analytics"),
    oracle="""
    SELECT user_id,
           event_id AS version_id,
           value,
           ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
           CASE WHEN lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                THEN 1 ELSE 0 END AS is_current
    FROM events
    WHERE event_type = 'purchase'
    """,
)
def cdc_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 history from a change log: each change becomes a version
    row with a [valid_from, valid_to) interval; the open interval marks the
    current version. THE standard materialization of a CDC log for
    downstream analytics ("what was the value as of T" = one range
    predicate, no log replay).

    One keyed shuffle: lead() over (key, change order) closes each version
    with the next one's start. At 100 TB the window partitions by key, so
    state per task is one row -- the log length per key never matters."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    valid_to = F.lead("ts").over(w)
    return e.select(
        "user_id",
        F.col("event_id").alias("version_id"),
        "value",
        F.col("ts").alias("valid_from"),
        valid_to.alias("valid_to"),
        valid_to.isNull().cast("int").alias("is_current"),
    )


@register(
    "cdc_changes_between",
    tags=("cdc",),
    oracle="""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_changes,
           max(event_id) AS last_event_id,
           arg_max(event_type, event_id) AS last_type,
           arg_max(value, event_id) AS last_value,
           CAST(arg_max(ts, event_id) AS TIMESTAMP) AS last_ts
    FROM events
    WHERE event_id >= 100 AND event_id < 800
    GROUP BY user_id
    """,
)
def cdc_changes_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-sync delta: everything that changed per key between two
    checkpoint positions (LSN analogue: event_id), compacted to ONE row
    per key -- the query a downstream consumer runs to catch up from its
    last offset without replaying the log row-by-row. Mirrors the
    reference's checkpoint-resume semantics (store.go:45-59,
    replicator.go:236) as a batch query over the retained log.

    Scale: the LSN range predicate pushes down to the parquet scan (file
    skip via min/max stats when the log is written LSN-ordered -- which
    the ingest sink does); then one partial agg with max_by carrying the
    (value, lsn) pairs. No window, no second shuffle, and the output is
    |changed keys| rows, not |changes|."""
    e = load_table(spark, sf_dir, "events").filter(
        (F.col("event_id") >= 100) & (F.col("event_id") < 800)
    )
    return e.groupBy("user_id").agg(
        F.count("*").alias("n_changes"),
        F.max("event_id").alias("last_event_id"),
        F.max_by("event_type", "event_id").alias("last_type"),
        F.max_by("value", "event_id").alias("last_value"),
        F.max_by("ts", "event_id").alias("last_ts"),
    )


@register(
    "cdc_snapshot_diff",
    tags=("cdc",),
    oracle="""
    WITH v1 AS (
      SELECT user_id, arg_max(value, event_id) AS value, max(event_id) AS lsn
      FROM events WHERE event_id < 400 GROUP BY user_id
    ),
    v2 AS (
      SELECT user_id, arg_max(value, event_id) AS value, max(event_id) AS lsn
      FROM events WHERE event_id < 800 GROUP BY user_id
    )
    SELECT coalesce(v1.user_id, v2.user_id) AS user_id,
           CASE WHEN v1.user_id IS NULL THEN 'added'
                WHEN v2.user_id IS NULL THEN 'removed'
                ELSE 'changed' END AS status,
           v1.value AS old_value, v2.value AS new_value,
           v1.lsn AS old_lsn, v2.lsn AS new_lsn
    FROM v1 FULL OUTER JOIN v2 ON v1.user_id = v2.user_id
    WHERE v1.user_id IS NULL OR v2.user_id IS NULL
       OR v1.value <> v2.value OR v1.lsn <> v2.lsn
    """,
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diff two point-in-time materializations of the change log (state as
    of LSN 400 vs LSN 800): which keys were added / removed / changed
    between two checkpoints -- the reconciliation query replication
    operators run to validate a replica against the source, expressed over
    the engine's own log instead of a second full-table pull.

    Scale: each version is the latest-state partial agg (max_by, one
    shuffle of |keys| partial states); the full-outer join then co-locates
    on the SAME user_id key, so the diff adds no extra fact-table pass --
    two reduced aggregates join, and only disagreeing keys survive."""
    e = load_table(spark, sf_dir, "events")

    def version(lsn_hi: int) -> DataFrame:
        return (
            e.filter(F.col("event_id") < lsn_hi)
            .groupBy("user_id")
            .agg(
                F.max_by("value", "event_id").alias("value"),
                F.max("event_id").alias("lsn"),
            )
        )

    v1 = version(400).select(
        F.col("user_id").alias("u1"), F.col("value").alias("old_value"), F.col("lsn").alias("old_lsn")
    )
    v2 = version(800).select(
        F.col("user_id").alias("u2"), F.col("value").alias("new_value"), F.col("lsn").alias("new_lsn")
    )
    joined = v1.join(v2, F.col("u1") == F.col("u2"), "full_outer")
    status = (
        F.when(F.col("u1").isNull(), "added")
        .when(F.col("u2").isNull(), "removed")
        .otherwise("changed")
    )
    return joined.filter(
        F.col("u1").isNull()
        | F.col("u2").isNull()
        | (F.col("old_value") != F.col("new_value"))
        | (F.col("old_lsn") != F.col("new_lsn"))
    ).select(
        F.coalesce(F.col("u1"), F.col("u2")).alias("user_id"),
        status.alias("status"),
        "old_value",
        "new_value",
        "old_lsn",
        "new_lsn",
    )


@register(
    "cdc_changed_columns",
    tags=("cdc",),
    oracle="""
    WITH lagged AS (
      SELECT event_id, user_id,
             event_type, lag(event_type) OVER w AS prev_type,
             value,      lag(value)      OVER w AS prev_value,
             props,      lag(props)      OVER w AS prev_props
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
    )
    SELECT event_id, user_id,
           concat_ws(',',
             CASE WHEN event_type <> prev_type THEN 'event_type' END,
             CASE WHEN value      <> prev_value THEN 'value' END,
             CASE WHEN props      <> prev_props THEN 'props' END) AS changed_cols
    FROM lagged WHERE prev_type IS NOT NULL
    """,
)
def cdc_changed_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changed-column detection per update: for every change event after a
    key's first, the comma-joined list of payload columns whose value
    differs from the previous image -- what downstream consumers use to
    skip no-op updates and to maintain column-level lineage (the
    before/after envelope makes this a pure projection; the reference
    discards update images entirely, replicator.go:387-396).

    One keyed-window shuffle; concat_ws drops the NULL slots of unchanged
    columns identically in both engines, so the audit string is
    bit-stable."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    lagged = e.select(
        "event_id",
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
        "value",
        F.lag("value").over(w).alias("prev_value"),
        "props",
        F.lag("props").over(w).alias("prev_props"),
    )
    return lagged.filter(F.col("prev_type").isNotNull()).select(
        "event_id",
        "user_id",
        F.concat_ws(
            ",",
            F.when(F.col("event_type") != F.col("prev_type"), "event_type"),
            F.when(F.col("value") != F.col("prev_value"), "value"),
            F.when(F.col("props") != F.col("prev_props"), "props"),
        ).alias("changed_cols"),
    )


@register(
    "cdc_snapshot_asof",
    tags=("cdc",),
    oracle="""
    SELECT user_id,
           arg_max(event_id, event_id) AS event_id,
           CAST(arg_max(ts, event_id) AS TIMESTAMP) AS ts,
           arg_max(event_type, event_id) AS event_type,
           arg_max(value, event_id) AS value
    FROM events
    WHERE ts <= TIMESTAMP '2025-06-01 00:00:00'
    GROUP BY user_id
    """,
)
def cdc_snapshot_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel: reconstruct per-key table state as of a wall-clock
    instant from the retained change log (the AS OF query Delta/Iceberg
    expose via snapshots, answered here from the log itself: latest change
    per key at ts <= T).

    Scale: the time predicate pushes to the parquet scan (min/max row-group
    skip on ts -- the ingest sink writes time-ordered files), then ONE
    max_by partial agg; output is |keys| rows. Contrast cdc_changes_between
    (LSN-bounded delta) -- this is the absolute-state twin."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("ts") <= F.lit("2025-06-01 00:00:00").cast("timestamp")
    )
    return e.groupBy("user_id").agg(
        F.max("event_id").alias("event_id"),
        F.max_by("ts", "event_id").alias("ts"),
        F.max_by("event_type", "event_id").alias("event_type"),
        F.max_by("value", "event_id").alias("value"),
    )


@register(
    "cdc_merge_upsert",
    tags=("cdc",),
    oracle="""
    WITH base AS (
      SELECT user_id, arg_max(value, event_id) AS value, max(event_id) AS lsn
      FROM events WHERE event_id < 5000 GROUP BY user_id
    ),
    delta AS (
      SELECT user_id,
             arg_max(event_type, event_id) AS op_type,
             arg_max(value, event_id) AS value,
             max(event_id) AS lsn
      FROM events WHERE event_id >= 5000 GROUP BY user_id
    )
    SELECT coalesce(b.user_id, d.user_id) AS user_id,
           CASE WHEN d.user_id IS NULL THEN b.value ELSE d.value END AS value,
           CASE WHEN d.user_id IS NULL THEN b.lsn ELSE d.lsn END AS lsn,
           CASE WHEN d.user_id IS NULL THEN 'kept'
                WHEN b.user_id IS NULL THEN 'inserted'
                ELSE 'updated' END AS merge_action
    FROM base b FULL OUTER JOIN delta d ON b.user_id = d.user_id
    WHERE d.user_id IS NULL OR d.op_type <> 'error'
    """,
)
def cdc_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch MERGE: apply a compacted change batch (LSN >= 5000) onto the
    prior materialized state (LSN < 5000) with full upsert semantics --
    unmatched target rows are kept, matched rows take the batch's final
    value, new keys insert, and keys whose LAST batch op is a delete
    ('error' plays the delete marker in the fixture log) drop out. This is
    the MERGE INTO the foreachBatch sink runs incrementally, expressed as
    a standalone batch operator (Delta MERGE semantics, public docs).

    Scale: both sides first compact to one row per key via max_by partial
    agg -- the join sees |keys| rows, not |changes| -- and the full-outer
    join co-locates on the shared user_id shuffle key. The merge_action
    column makes the row-level decision auditable."""
    e = load_table(spark, sf_dir, "events")
    base = (
        e.filter(F.col("event_id") < 5000)
        .groupBy("user_id")
        .agg(F.max_by("value", "event_id").alias("b_value"), F.max("event_id").alias("b_lsn"))
    )
    delta = (
        e.filter(F.col("event_id") >= 5000)
        .groupBy("user_id")
        .agg(
            F.max_by("event_type", "event_id").alias("op_type"),
            F.max_by("value", "event_id").alias("d_value"),
            F.max("event_id").alias("d_lsn"),
        )
    )
    b = base.select(F.col("user_id").alias("bu"), "b_value", "b_lsn")
    d = delta.select(F.col("user_id").alias("du"), "op_type", "d_value", "d_lsn")
    joined = b.join(d, F.col("bu") == F.col("du"), "full_outer")
    no_delta = F.col("du").isNull()
    action = (
        F.when(no_delta, "kept")
        .when(F.col("bu").isNull(), "inserted")
        .otherwise("updated")
    )
    return (
        joined.filter(no_delta | (F.col("op_type") != "error"))
        .select(
            F.coalesce(F.col("bu"), F.col("du")).alias("user_id"),
            F.when(no_delta, F.col("b_value")).otherwise(F.col("d_value")).alias("value"),
            F.when(no_delta, F.col("b_lsn")).otherwise(F.col("d_lsn")).alias("lsn"),
            action.alias("merge_action"),
        )
    )


@register(
    "dead_letter_split",
    tags=("cdc",),
    oracle="""
    WITH wire AS (
      SELECT event_type,
             CASE WHEN event_id % 13 = 0 THEN substr(props, 1, 3) ELSE props END AS payload
      FROM events
    )
    SELECT event_type,
           CAST(sum(CASE WHEN json_valid(payload) THEN 1 ELSE 0 END) AS BIGINT) AS n_ok,
           CAST(sum(CASE WHEN json_valid(payload) THEN 0 ELSE 1 END) AS BIGINT) AS n_dead
    FROM wire GROUP BY event_type
    """,
)
def dead_letter_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter accounting for the consumer's malformed-payload path:
    the reference commits-and-skips events whose JSON fails to decode
    (``cmd/es_consumer/main.go:66-71``); a production pipeline routes them
    to a dead-letter queue and ALERTS on the rate per table. This query is
    that monitor: parse every wire payload, split ok vs dead per event
    type. Corruption is planted deterministically (every 13th event's JSON
    truncated to 3 chars) identically in both engines, so the parse logic
    -- not the corpus -- is what's under test.

    Scale: pure map-side parse (``try_parse_json`` yields NULL on
    malformed input -- no exceptions, no job failure; PERMISSIVE
    ``from_json`` would instead yield a struct of nulls and mask the
    split) + one partial agg shuffling |event_type| rows. The same
    split-by-validity predicate feeds the actual dead-letter sink in
    streaming mode (filter + two writers).

    Cross-engine caveat: Spark's variant parse rejects duplicate object
    keys that DuckDB ``json_valid`` accepts, and tolerates trailing
    garbage DuckDB rejects. Serializer-emitted fixture props and their
    3-char truncations hit neither case; the agreement is pinned per
    payload by ``tests/test_round5_ops.py::
    test_dead_letter_validity_semantics_agree_with_oracle``."""
    e = load_table(spark, sf_dir, "events")
    payload = F.when(
        F.col("event_id") % 13 == 0, F.substring("props", 1, 3)
    ).otherwise(F.col("props"))
    ok = F.expr("try_parse_json(payload) IS NOT NULL")
    e = e.withColumn("payload", payload)
    return e.groupBy("event_type").agg(
        F.sum(F.when(ok, 1).otherwise(0)).cast("bigint").alias("n_ok"),
        F.sum(F.when(ok, 0).otherwise(1)).cast("bigint").alias("n_dead"),
    )


@register(
    "cdc_hot_keys",
    tags=("cdc", "agg"),
    oracle="""
    WITH per_key AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_changes
      FROM events GROUP BY user_id
    ),
    tot AS (SELECT CAST(sum(n_changes) AS BIGINT) AS total FROM per_key)
    SELECT 'public.events:' || CAST(user_id AS VARCHAR) AS key,
           n_changes,
           round(CAST(n_changes AS DOUBLE) / CAST(tot.total AS DOUBLE), 6)
             AS traffic_share
    FROM per_key CROSS JOIN tot
    ORDER BY n_changes DESC, key
    LIMIT 20
    """,
)
def cdc_hot_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key detector over the change feed: the 20 most-mutated keys and
    their share of total change traffic -- the monitor that decides when
    per-key ordering becomes a skew problem (a key above ~1/partitions of
    traffic serializes its reducer; the fix is join_skew_salted's salting
    or AQE skew-join). The reference keys its Kafka messages by this value
    (``internal/kafka/producer.go:37``) but balances partitions with
    LeastBytes, so per-key ordering is not actually partition-guaranteed
    there -- and it has no visibility into the skew either way.

    Scale: per-key partial agg (|keys| states), 1-row broadcast total,
    TakeOrderedAndProject final."""
    e = load_table(spark, sf_dir, "events")
    per_key = e.groupBy("user_id").agg(F.count("*").cast("bigint").alias("n_changes"))
    tot = per_key.agg(F.sum("n_changes").cast("bigint").alias("total"))
    return (
        per_key.crossJoin(F.broadcast(tot))
        .select(
            F.concat(F.lit("public.events:"), F.col("user_id").cast("string")).alias(
                "key"
            ),
            "n_changes",
            F.round(
                F.col("n_changes").cast("double") / F.col("total").cast("double"), 6
            ).alias("traffic_share"),
        )
        .orderBy(F.col("n_changes").desc(), "key")
        .limit(20)
    )


@register(
    "cdc_op_mix_hourly",
    tags=("cdc", "timeseries", "agg"),
    oracle="""
    WITH mapped AS (
      SELECT date_trunc('hour', ts) AS hour,
             CASE event_type
               WHEN 'signup' THEN 'insert'
               WHEN 'purchase' THEN 'insert'
               WHEN 'error' THEN 'delete'
               ELSE 'update' END AS op
      FROM events
    )
    SELECT hour,
           CAST(sum(CASE WHEN op = 'insert' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_insert,
           CAST(sum(CASE WHEN op = 'update' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_update,
           CAST(sum(CASE WHEN op = 'delete' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_delete
    FROM mapped GROUP BY hour
    """,
)
def cdc_op_mix_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly op-mix monitor for the change feed (the planted
    event-type -> op mapping every cdc_* fixture query shares): a delete
    spike flags a bad upstream migration, an insert cliff flags a stalled
    producer -- the first dashboard an on-call replication operator opens.
    The reference's audit log records per-event rows it can only grep
    (``internal/logger/logger.go:41-54``); this is the queryable form.

    Scale: map-side CASE + one partial agg; |hours| x 3 counters."""
    e = load_table(spark, sf_dir, "events")
    op = (
        F.when(F.col("event_type").isin("signup", "purchase"), "insert")
        .when(F.col("event_type") == "error", "delete")
        .otherwise("update")
    )
    return (
        e.select(F.date_trunc("hour", F.col("ts")).alias("hour"), op.alias("op"))
        .groupBy("hour")
        .agg(
            F.sum(F.when(F.col("op") == "insert", 1).otherwise(0))
            .cast("bigint")
            .alias("n_insert"),
            F.sum(F.when(F.col("op") == "update", 1).otherwise(0))
            .cast("bigint")
            .alias("n_update"),
            F.sum(F.when(F.col("op") == "delete", 1).otherwise(0))
            .cast("bigint")
            .alias("n_delete"),
        )
    )


@register(
    "cdc_replication_lag",
    tags=("cdc", "monitor"),
    oracle="""
    WITH a AS (SELECT max(ts) AS now_ts FROM events)
    SELECT event_type,
           max(ts) AS last_ts,
           round((epoch_us(any_value(a.now_ts)) - epoch_us(max(ts)))
                 / 1000000.0, 6) AS lag_seconds,
           CAST(sum(CASE WHEN ts > a.now_ts - INTERVAL 1 HOUR
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_last_hour
    FROM events CROSS JOIN a
    GROUP BY event_type
    """,
)
def cdc_replication_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replication-lag monitor: per routed stream, how far behind "now"
    the newest replicated event is, plus last-hour arrival volume -- the
    freshness panel that completes the X46 ops dashboard (hot keys, op
    mix). The reference's only freshness signal is grepping per-event
    audit lines (``internal/logger/logger.go:41-54``); this is the
    queryable form a replication operator actually pages on.

    The fixture is static, so "now" anchors to the corpus max timestamp
    to stay deterministic; a deployment substitutes the wall clock and
    drops the anchor pass entirely. Lag math is exact integer epoch
    microseconds, divided and rounded once at the end.

    Scale: per-type partial agg (|types| states) + a 1-row broadcast
    anchor; nothing fact-sized shuffles."""
    e = load_table(spark, sf_dir, "events")
    anchor = e.agg(F.max("ts").alias("now_ts"))
    return (
        e.crossJoin(F.broadcast(anchor))
        .groupBy("event_type")
        .agg(
            F.max("ts").alias("last_ts"),
            F.round(
                (F.unix_micros(F.first("now_ts")) - F.unix_micros(F.max("ts")))
                / 1000000.0,
                6,
            ).alias("lag_seconds"),
            F.sum(
                F.when(
                    F.col("ts") > F.col("now_ts") - F.expr("INTERVAL 1 HOUR"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_last_hour"),
        )
    )


@register(
    "cdc_out_of_order_rate",
    tags=("cdc", "monitor", "window"),
    oracle="""
    WITH o AS (
      SELECT event_type, ts,
             max(ts) OVER (PARTITION BY event_type ORDER BY event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING) AS seen
      FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN ts < seen THEN 1 ELSE 0 END) AS BIGINT)
             AS n_late,
           CAST(round(CAST(sum(CASE WHEN ts < seen THEN 1 ELSE 0 END)
                           AS DOUBLE) / count(*), 6) AS DOUBLE) AS late_rate,
           CAST(max(CASE WHEN ts < seen
                         THEN epoch_us(seen) - epoch_us(ts)
                         ELSE 0 END) AS BIGINT) AS max_late_us
    FROM o GROUP BY 1
    """,
)
def cdc_out_of_order_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-order profile per stream: the fraction of events whose
    event time lands behind the running maximum in arrival order
    (event_id standing in for the LSN, the fixture convention), plus the
    worst observed lateness. This is THE input for choosing a Structured
    Streaming watermark delay -- ``withWatermark`` must cover max_late (or
    the accepted loss quantile) or windowed aggregates silently drop those
    events. The reference has no notion of event-time disorder at all: it
    indexes by LSN arrival order only (``cmd/es_consumer/main.go:77``).

    Lateness is exact integer microseconds (epoch_us on both engines), so
    the max and the late/on-time boundary are bit-identical.

    Scale: one window shuffle keyed by the stream id (running max is a
    streaming-friendly prefix scan -- rows-frame, no sort spill beyond
    the keyed order), then a |types|-state partial agg that reuses the
    same partitioning. At 100 TB the arrival order within a type is the
    log's native file order, so the sort is near-presorted merge work."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    o = e.select(
        "event_type",
        "ts",
        F.max("ts").over(w).alias("seen"),
    )
    late = F.when(F.col("ts") < F.col("seen"), 1).otherwise(0)
    late_us = F.when(
        F.col("ts") < F.col("seen"),
        F.unix_micros(F.col("seen")) - F.unix_micros(F.col("ts")),
    ).otherwise(0)
    return o.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.sum(late).cast("bigint").alias("n_late"),
        F.round(F.sum(late).cast("double") / F.count("*"), 6)
        .cast("double")
        .alias("late_rate"),
        F.max(late_us).cast("bigint").alias("max_late_us"),
    )


@register(
    "decode_pgoutput",
    tags=("cdc", "source"),
    oracle="""
    SELECT 'insert' AS op, 'public' AS schema_name, 'events' AS table_name,
           CAST(event_id AS BIGINT) AS lsn,
           'public.events:' || CAST(event_id AS VARCHAR) AS key,
           CAST(user_id AS BIGINT) AS user_id,
           event_type
    FROM events
    """,
)
def decode_pgoutput_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wire-format round trip for the pgoutput binary decode layer
    (sources/pgoutput.py): every events row is encoded into a real
    XLogData+Insert pgoutput frame (text-format tuple cells, exactly what
    a Postgres publication ships), the relation registry is recovered by
    PARSING a wire-format Relation frame, and the two-pass decoder turns
    the binary log back into envelope rows. The DuckDB oracle never sees
    bytes -- it projects the source table directly -- so a hash match
    proves encode->decode is the identity on this surface, i.e. the
    decoder agrees with an independent reading of the same data. This is
    the engine's equivalent of the reference's live WAL decode
    (``internal/wal/replicator.go:304-384``), testable without Postgres.

    Scale: encode and decode are both mapInPandas over whatever
    partitioning the source has -- zero shuffles end to end (the plan is
    scan -> encode -> decode -> project). The relation pass parses ONE
    dim-scale frame; in production it is the byte-predicate scan in
    ``collect_relations`` over the materialized frame log."""
    import pandas as _pd

    from ..sources import pgoutput as P

    REL_OID = 16400
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "event_type")

    def _enc(batches):
        for pdf in batches:
            frames = []
            for eid, uid, et in zip(pdf["event_id"], pdf["user_id"], pdf["event_type"]):
                cells = [
                    str(int(eid)),
                    None if _pd.isna(uid) else str(int(uid)),
                    None if et is None else str(et),
                ]
                frames.append(
                    P.encode_xlogdata(int(eid), P.encode_insert(REL_OID, cells))
                )
            yield _pd.DataFrame(
                {"seq": pdf["event_id"].astype("int64"), "frame": frames}
            )

    frames = ev.mapInPandas(_enc, P.FRAME_SCHEMA)
    rel_frame = P.encode_xlogdata(
        0,
        P.encode_relation(
            REL_OID,
            "public",
            "events",
            [("event_id", 20, True), ("user_id", 20, False), ("event_type", 25, False)],
        ),
    )
    rel_df = spark.createDataFrame([(0, bytearray(rel_frame))], P.FRAME_SCHEMA)
    # registry recovered from wire bytes; scanning only the materialized
    # relation frame avoids re-running the encode stage for pass 1
    relations = P.collect_relations(rel_df)
    decoded = P.decode_pgoutput_frames(frames, relations)
    return decoded.select(
        "op",
        "schema_name",
        "table_name",
        "lsn",
        "key",
        F.col("after")["user_id"].cast("bigint").alias("user_id"),
        F.col("after")["event_type"].alias("event_type"),
    )


@register(
    "cdc_event_size_profile",
    tags=("cdc", "agg"),
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(length(props) AS BIGINT)) AS BIGINT) AS total_bytes,
           round(CAST(sum(CAST(length(props) AS BIGINT)) AS DOUBLE)
                 / count(*), 6) AS avg_bytes,
           CAST(max(length(props)) AS BIGINT) AS max_bytes
    FROM events GROUP BY 1 ORDER BY 1
    """,
)
def cdc_event_size_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload-size profile per event type: count, total/average/max JSON
    payload bytes -- the capacity-planning panel for a change stream
    (sink batch sizing, Kafka message limits, and the early-warning for a
    producer that started embedding blobs in props).

    Scale: string length is computed map-side in the scan projection;
    ONE |types|-state partial agg carries exact integer byte sums."""
    e = load_table(spark, sf_dir, "events")
    ln = F.length("props").cast("bigint")
    return (
        e.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(ln).cast("bigint").alias("total_bytes"),
            F.round(F.sum(ln).cast("double") / F.count("*"), 6).alias("avg_bytes"),
            F.max(ln).cast("bigint").alias("max_bytes"),
        )
        .orderBy("event_type")
    )


@register(
    "cdc_batch_size_distribution",
    tags=("cdc", "agg"),
    oracle="""
    SELECT CAST(event_id // 5000 AS BIGINT) AS batch_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(length(props) AS BIGINT)) AS BIGINT) AS batch_bytes,
           round(CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS DOUBLE)
                 / 1000000, 6) AS span_seconds
    FROM events GROUP BY 1 ORDER BY 1
    """,
)
def cdc_batch_size_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Micro-batch sizing panel: chop the change log into fixed 5000-event
    batches (by the monotone event_id, the LSN stand-in) and report each
    batch's row count, payload bytes, and wall-clock span -- exactly the
    evidence that tunes maxFilesPerTrigger / maxOffsetsPerTrigger
    backpressure (streaming/pipeline.py): bytes-per-batch drives executor
    memory, span-per-batch drives end-to-end latency.

    Scale: the batch key is integer division on a scan column -- no
    window, no sort; ONE |batches|-state partial agg with exact integer
    sums and min/max micros."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy((F.col("event_id") / 5000).cast("bigint").alias("batch_id"))
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(F.length("props").cast("bigint")).cast("bigint").alias("batch_bytes"),
            F.round(
                (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).cast("double")
                / 1_000_000,
                6,
            ).alias("span_seconds"),
        )
        .orderBy("batch_id")
    )


@register(
    "cdc_key_churn",
    tags=("cdc", "agg"),
    oracle="""
    WITH k AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS n_ops,
             CAST(date_diff('second', min(ts), max(ts)) AS BIGINT) AS lifespan_s
      FROM events GROUP BY 1
    )
    SELECT CAST(n_ops // 10 AS BIGINT) AS ops_decade,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(n_ops) AS BIGINT) AS total_ops,
           round(CAST(sum(lifespan_s) AS DOUBLE) / count(*), 2) AS avg_lifespan_s
    FROM k GROUP BY 1 ORDER BY 1
    """,
)
def cdc_key_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-churn histogram for the change feed: per key (the reference's
    Kafka message key, ``internal/kafka/producer.go:37``), total ops and
    active lifespan, bucketed into decade bands of op count (40-49 ops,
    50-59, ...). The upsert sink's compaction win is exactly
    ``total_ops - n_keys`` summed over the tail bands -- this panel tells
    you whether compaction is worth running. Decade edges come from integer
    division and lifespans are exact integer seconds -- no boundary flap.

    Scale: ONE |keys|-grain partial agg over the feed, then a
    |decades|-state rollup."""
    e = load_table(spark, sf_dir, "events")
    k = e.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_ops"),
        (F.unix_seconds(F.max("ts")) - F.unix_seconds(F.min("ts")))
        .cast("bigint")
        .alias("lifespan_s"),
    )
    return (
        k.groupBy(F.expr("n_ops DIV 10").cast("bigint").alias("ops_decade"))
        .agg(
            F.count("*").cast("bigint").alias("n_keys"),
            F.sum("n_ops").cast("bigint").alias("total_ops"),
            F.round(F.sum("lifespan_s").cast("double") / F.count("*"), 2).alias(
                "avg_lifespan_s"
            ),
        )
        .orderBy("ops_decade")
    )


@register(
    "cdc_tombstone_gc_candidates",
    tags=("cdc", "monitor"),
    oracle="""
    WITH mapped AS (
      SELECT user_id, event_id, ts,
             CASE event_type
               WHEN 'signup' THEN 'insert'
               WHEN 'purchase' THEN 'insert'
               WHEN 'error' THEN 'delete'
               ELSE 'update' END AS op
      FROM events
    ),
    last AS (
      SELECT user_id, op AS last_op, ts AS last_ts,
             CAST(event_id AS BIGINT) AS last_lsn
      FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts DESC, event_id DESC) AS rn
        FROM mapped
      ) t WHERE rn = 1
    ),
    anchor AS (SELECT max(ts) AS now_ts FROM events)
    SELECT CAST(l.user_id AS BIGINT) AS user_id, l.last_lsn, l.last_ts,
           CAST(date_diff('second', l.last_ts, a.now_ts) AS BIGINT) AS age_s
    FROM last l CROSS JOIN anchor a
    WHERE l.last_op = 'delete'
      AND l.last_ts <= a.now_ts - INTERVAL 1 DAY
    ORDER BY age_s DESC, user_id
    LIMIT 20
    """,
)
def cdc_tombstone_gc_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tombstone garbage-collection worklist: keys whose LAST change is a
    delete older than the retention horizon (1 day on the 30-day
    fixture window; ``delete.retention.ms``-scale in deployment) -- safe to purge from the
    compacted upsert store (``streaming/sink.py``) because no later op can
    resurrect them below the watermark. This is the Kafka-compaction
    ``delete.retention.ms`` semantic made queryable; the anchor is the
    feed's own max ts so the fixture run is deterministic (wall-clock in
    deployment). (ts, event_id) max_by tiebreaks concurrent ops exactly
    like the upsert sink does.

    Scale: ONE |keys|-grain max_by partial agg; 1-row broadcast anchor;
    TakeOrderedAndProject final."""
    e = load_table(spark, sf_dir, "events")
    op = (
        F.when(F.col("event_type").isin("signup", "purchase"), "insert")
        .when(F.col("event_type") == "error", "delete")
        .otherwise("update")
    )
    last = (
        e.select("user_id", "event_id", "ts", op.alias("op"))
        .groupBy("user_id")
        .agg(
            F.max_by("op", F.struct("ts", "event_id")).alias("last_op"),
            F.max("ts").alias("last_ts"),
            F.max_by("event_id", F.struct("ts", "event_id"))
            .cast("bigint")
            .alias("last_lsn"),
        )
    )
    anchor = e.agg(F.max("ts").alias("now_ts"))
    return (
        last.crossJoin(F.broadcast(anchor))
        .filter(
            (F.col("last_op") == "delete")
            & (F.col("last_ts") <= F.col("now_ts") - F.expr("INTERVAL 1 DAY"))
        )
        .select(
            F.col("user_id").cast("bigint").alias("user_id"),
            "last_lsn",
            "last_ts",
            (F.unix_seconds(F.col("now_ts")) - F.unix_seconds(F.col("last_ts")))
            .cast("bigint")
            .alias("age_s"),
        )
        .orderBy(F.col("age_s").desc(), "user_id")
        .limit(20)
    )


@register(
    "cdc_lsn_gap_detection",
    tags=("cdc",),
    oracle="""
    WITH alive AS (
      SELECT event_id FROM events
      WHERE substr(md5(CAST(event_id AS VARCHAR)), 1, 2) < 'f8'
    ), per AS (
      SELECT CAST(floor(event_id / 1024) AS BIGINT) AS bucket,
             min(event_id) AS lsn_lo,
             max(event_id) AS lsn_hi,
             CAST(count(*) AS BIGINT) AS present
      FROM alive GROUP BY 1
    )
    SELECT bucket, lsn_lo, lsn_hi, present,
           CAST(lsn_hi - lsn_lo + 1 - present AS BIGINT) AS missing_within,
           CAST(coalesce(lsn_lo - lag(lsn_hi) OVER (ORDER BY bucket) - 1, 0) AS BIGINT) AS missing_before
    FROM per
    """,
)
def cdc_lsn_gap_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WAL-continuity audit: find LSN ranges the sink never received --
    the check that catches a dropped replication segment before the
    downstream index silently diverges. The reference tracks only the
    high-water LSN (``replicator.go``'s standby status), so a lost middle
    segment is invisible to it; counting PRESENT LSNs per fixed-width
    bucket against the bucket's own [min, max] span detects every
    interior hole exactly, and a lag over the bucket summary catches
    holes that span bucket boundaries.

    Fixture note: event_id is the LSN (fixture convention) and the
    fixture log is gapless, so a deterministic ~3% md5-band drop
    simulates segment loss; detection then recovers exactly the planted
    holes (pytest-pinned).

    Scale: the heavy pass is ONE partial agg keyed by lsn DIV 1024 --
    min/max/count combine map-side, the shuffle is |buckets| rows (data
    / 1024), and NO global sort of the log ever happens (a naive
    lag-over-every-LSN window would single-partition 10^11 rows). The
    boundary window runs over the bucket summary only."""
    e = load_table(spark, sf_dir, "events")
    alive = e.filter(
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 2) < "f8"
    )
    per = (
        alive.select(
            F.floor(F.col("event_id") / 1024).cast("bigint").alias("bucket"),
            "event_id",
        )
        .groupBy("bucket")
        .agg(
            F.min("event_id").alias("lsn_lo"),
            F.max("event_id").alias("lsn_hi"),
            F.count("*").cast("bigint").alias("present"),
        )
    )
    w = Window.orderBy("bucket")
    return per.select(
        "bucket",
        "lsn_lo",
        "lsn_hi",
        "present",
        (F.col("lsn_hi") - F.col("lsn_lo") + 1 - F.col("present"))
        .cast("bigint")
        .alias("missing_within"),
        F.coalesce(F.col("lsn_lo") - F.lag("lsn_hi").over(w) - 1, F.lit(0))
        .cast("bigint")
        .alias("missing_before"),
    )


@register(
    "cdc_out_of_order_arrivals",
    tags=("cdc", "dq"),
    oracle="""
    WITH e AS (
      SELECT CAST(floor(event_id / 1024) AS BIGINT) AS bucket,
             event_id,
             epoch_us(ts) AS ts_us,
             lag(epoch_us(ts)) OVER (
               PARTITION BY CAST(floor(event_id / 1024) AS BIGINT)
               ORDER BY event_id
             ) AS prev_us
      FROM events
    ),
    per AS (
      SELECT bucket,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(sum(CASE WHEN ts_us < prev_us THEN 1 ELSE 0 END) AS BIGINT)
               AS n_backward,
             CAST(coalesce(max(CASE WHEN ts_us < prev_us
                                    THEN prev_us - ts_us END), 0) AS BIGINT)
               AS max_backward_us,
             min_by(ts_us, event_id) AS first_us,
             max_by(ts_us, event_id) AS last_us
      FROM e GROUP BY 1
    )
    SELECT bucket, n_events, n_backward, max_backward_us,
           CAST(greatest(coalesce(lag(last_us) OVER (ORDER BY bucket)
                                  - first_us, 0), 0) AS BIGINT)
             AS boundary_backward_us
    FROM per
    """,
)
def cdc_out_of_order_arrivals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Commit-order vs commit-time audit: per 1024-LSN bucket, how many
    adjacent-in-LSN event pairs have a BACKWARD timestamp step, and how
    far back the worst one goes -- the disorder profile that tells you
    what watermark delay the streaming windows (X16) actually need, and
    the sibling of cdc_lsn_gap_detection (that one finds holes in the
    sequence; this one finds clock disorder within it). The reference
    trusts event timestamps blindly (replicator.go stamps time.Now at
    decode), so skew is invisible to it.

    Uses the fixture's event_id-as-LSN convention (gap detection's).
    Timestamps compare as exact integer microseconds on both engines.

    Scale: the same no-global-sort shape as gap detection -- adjacent
    pairs resolve inside 1024-LSN buckets (Window.partitionBy(bucket),
    <= 1024 rows per task, never a single-task log sort); the only
    cross-bucket state is one (first_ts, last_ts) row per bucket, and the
    boundary-pair check is a lag over that |log|/1024-row summary."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("bucket").orderBy("event_id")
    ev = e.select(
        F.floor(F.col("event_id") / 1024).cast("bigint").alias("bucket"),
        "event_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
    ).withColumn("prev_us", F.lag("ts_us").over(w))
    back = F.when(F.col("ts_us") < F.col("prev_us"), F.col("prev_us") - F.col("ts_us"))
    per = ev.groupBy("bucket").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.sum(F.when(F.col("ts_us") < F.col("prev_us"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_backward"),
        F.coalesce(F.max(back), F.lit(0)).cast("bigint").alias("max_backward_us"),
        F.min_by("ts_us", "event_id").alias("first_us"),
        F.max_by("ts_us", "event_id").alias("last_us"),
    )
    wb = Window.orderBy("bucket")
    return per.select(
        "bucket",
        "n_events",
        "n_backward",
        "max_backward_us",
        F.greatest(
            F.coalesce(F.lag("last_us").over(wb) - F.col("first_us"), F.lit(0)),
            F.lit(0),
        )
        .cast("bigint")
        .alias("boundary_backward_us"),
    )


@register(
    "cdc_daily_compaction_profile",
    tags=("cdc", "agg", "timeseries"),
    oracle="""
    WITH ops AS (
      SELECT user_id AS k, date_trunc('day', ts) AS day
      FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ),
    daily AS (
      SELECT day,
             CAST(count(*) AS BIGINT) AS n_ops,
             CAST(count(DISTINCT k) AS BIGINT) AS keys_touched
      FROM ops GROUP BY 1
    ),
    first_seen AS (
      SELECT k, min(day) AS day FROM ops GROUP BY 1
    ),
    news AS (
      SELECT day, CAST(count(*) AS BIGINT) AS new_keys FROM first_seen GROUP BY 1
    )
    SELECT d.day, d.n_ops, d.keys_touched,
           CAST(coalesce(n.new_keys, 0) AS BIGINT) AS new_keys,
           CAST(sum(coalesce(n.new_keys, 0))
                OVER (ORDER BY d.day) AS BIGINT) AS cum_keys_seen,
           round(CAST(d.n_ops AS DOUBLE) / d.keys_touched, 6) AS ops_per_key
    FROM daily d LEFT JOIN news n ON d.day = n.day
    """,
)
def cdc_daily_compaction_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-grain compaction planning panel for the change feed: raw ops
    vs distinct keys touched (ops_per_key = the day's write
    amplification, i.e. what state-mode compaction saves the ES sink
    that day), new keys first seen, and the cumulative key universe
    (the live-state table's size ceiling over time). cdc_key_churn
    answers "which KEYS are hot"; this answers "which DAYS does
    compaction pay and how fast does state grow" -- the two axes a
    capacity plan needs.

    Exactness: all counts are exact integers (exact distinct, not HLL --
    the approximate twin is agg_hll_rollup's documented territory); the
    one ratio rounds at 6 dp.

    Scale: one pass to the (key, day) grain (the only fact-sized
    shuffle), then day-grain rollups; the cumulative runs on the
    calendar-bounded day domain (a documented bounded-domain window,
    ~11k rows for 30 years)."""
    e = load_table(spark, sf_dir, "events")
    ops = e.filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull()).select(
        F.col("user_id").alias("k"), F.date_trunc("day", "ts").alias("day")
    ).localCheckpoint(eager=False)  # daily + first-seen reuse the grain
    daily = ops.groupBy("day").agg(
        F.count("*").cast("bigint").alias("n_ops"),
        F.count_distinct(F.col("k")).cast("bigint").alias("keys_touched"),
    )
    news = (
        ops.groupBy("k")
        .agg(F.min("day").alias("day"))
        .groupBy("day")
        .agg(F.count("*").cast("bigint").alias("new_keys"))
    )
    wd = Window.orderBy("day")
    return (
        daily.join(news, "day", "left")
        .select(
            "day",
            "n_ops",
            "keys_touched",
            F.coalesce(F.col("new_keys"), F.lit(0)).cast("bigint").alias("new_keys"),
        )
        .withColumn(
            "cum_keys_seen",
            F.sum("new_keys").over(wd.rowsBetween(Window.unboundedPreceding, 0))
            .cast("bigint"),
        )
        .withColumn(
            "ops_per_key",
            F.round(F.col("n_ops").cast("double") / F.col("keys_touched"), 6),
        )
    )


@register(
    "cdc_revisit_time_histogram",
    tags=("cdc", "agg", "timeseries"),
    oracle="""
    WITH gaps AS (
      SELECT CAST(epoch_us(ts) // 1000000 - epoch_us(lag(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id)) // 1000000
             AS BIGINT) AS g
      FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ),
    banded AS (
      SELECT CAST(CASE WHEN g <= 0 THEN 0
                  ELSE length(bin(g)) END AS INT) AS log2_band,
             g
      FROM gaps WHERE g IS NOT NULL
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM banded)
    SELECT log2_band,
           CAST(count(*) AS BIGINT) AS n_revisits,
           CAST(min(g) AS BIGINT) AS min_gap_s,
           CAST(max(g) AS BIGINT) AS max_gap_s,
           round(CAST(count(*) AS DOUBLE) / n, 6) AS share
    FROM banded CROSS JOIN tot
    GROUP BY log2_band, n
    """,
)
def cdc_revisit_time_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-revisit-time histogram for the change feed: log2 bands of the
    gap (seconds) between consecutive ops on the SAME key -- the
    distribution that sizes every keyed cache and state-store TTL (a
    mass at <64s says state must stay hot; a mass at days says tombstone
    GC can be aggressive). cdc_key_churn counts ops per key; this times
    them.

    Exactness: gaps are exact integer seconds from user-keyed lags; the
    log2 band is the integer BIT LENGTH of the gap (length(bin(g)) --
    pure integer arithmetic; the first floating form, floor(ln g/ln 2),
    flapped one band at powers of two from ln() ulp differences between
    engines, caught by this op's own oracle); zero gaps (same-second
    ops) take band 0.

    Scale: user-keyed window then a |bands| partial agg -- nothing
    global but the 1-row total."""
    e = load_table(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        e.filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .select(
            (F.unix_seconds(F.col("ts")) - F.unix_seconds(F.lag("ts").over(wu)))
            .cast("bigint").alias("g")
        )
        .filter(F.col("g").isNotNull())
    )
    band = F.when(F.col("g") <= 0, F.lit(0)).otherwise(
        F.length(F.bin(F.col("g")))
    ).cast("int")
    banded = gaps.select(band.alias("log2_band"), "g")
    tot = banded.agg(F.count("*").cast("bigint").alias("n"))
    return (
        banded.crossJoin(F.broadcast(tot))
        .groupBy("log2_band", "n")
        .agg(
            F.count("*").cast("bigint").alias("n_revisits"),
            F.min("g").cast("bigint").alias("min_gap_s"),
            F.max("g").cast("bigint").alias("max_gap_s"),
        )
        .select(
            "log2_band", "n_revisits", "min_gap_s", "max_gap_s",
            F.round(F.col("n_revisits").cast("double") / F.col("n"), 6).alias("share"),
        )
    )


@register(
    "cdc_dml_mix_drift",
    tags=("cdc", "analytics", "timeseries"),
    oracle="""
    WITH ops AS (
      SELECT date_trunc('day', ts) AS day,
             CASE event_type
               WHEN 'signup' THEN 'insert'
               WHEN 'purchase' THEN 'insert'
               WHEN 'error' THEN 'delete'
               ELSE 'update' END AS op
      FROM events WHERE ts IS NOT NULL
    ),
    b AS (SELECT min(day) AS lo FROM ops),
    ref AS (
      SELECT op, CAST(count(*) AS BIGINT) AS rn
      FROM ops, b WHERE day < lo + INTERVAL 7 DAY GROUP BY 1
    ),
    rtot AS (SELECT CAST(sum(rn) AS BIGINT) AS rt FROM ref),
    daily AS (
      SELECT day, op, CAST(count(*) AS BIGINT) AS cn FROM ops GROUP BY 1, 2
    ),
    grid AS (
      SELECT d.day, o.op
      FROM (SELECT DISTINCT day FROM daily) d
      CROSS JOIN (VALUES ('insert'), ('update'), ('delete')) o(op)
    ),
    cell AS (
      SELECT g.day, g.op,
             coalesce(r.rn, 0) AS rn, coalesce(dl.cn, 0) AS cn,
             CAST(sum(coalesce(dl.cn, 0)) OVER (PARTITION BY g.day) AS BIGINT) AS ct
      FROM grid g
      LEFT JOIN ref r ON g.op = r.op
      LEFT JOIN daily dl ON g.day = dl.day AND g.op = dl.op
    )
    SELECT CAST(day AS TIMESTAMP) AS day,
           CAST(min(ct) AS BIGINT) AS n_ops,
           round(CAST(sum(CAST(round(
             ((cn + 1.0) / (ct + 3) - (rn + 1.0) / (rt + 3))
             * ln(((cn + 1.0) / (ct + 3)) / ((rn + 1.0) / (rt + 3))), 6)
             AS DECIMAL(18,6))) AS DOUBLE), 6) AS psi
    FROM cell, rtot
    GROUP BY day, rt ORDER BY day
    """,
)
def cdc_dml_mix_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily drift of the DML operation mix (insert/update/delete shares)
    against the first week's baseline, as a PSI per day -- the
    change-feed twin of events_value_psi_weekly: a replication monitor
    cares when a feed that was 70% updates suddenly turns insert- or
    delete-heavy (backfill, bulk purge, or an upstream bug), BEFORE the
    sink falls over. Op classes derive from event types by the engine's
    established mapping (signup/purchase -> insert, error -> delete,
    else update -- the same CASE cdc_op_mix_by_table uses).

    Exactness: both mixes are exact integer counts over a fixed 3-op
    grid with Laplace +1 smoothing (zero-safe); each PSI term rounds at
    6 dp and snaps to DECIMAL(18,6) BEFORE the sum (the ln-ulp recipe
    events_value_psi_weekly established), so accumulation is exact.

    Scale: one pass to (day, op) cells; the baseline is a 3-row
    broadcast; everything downstream is day-grain."""
    e = load_table(spark, sf_dir, "events")
    op = (
        F.when(F.col("event_type").isin("signup", "purchase"), "insert")
        .when(F.col("event_type") == "error", "delete")
        .otherwise("update")
    )
    ops = e.filter(F.col("ts").isNotNull()).select(
        F.date_trunc("day", "ts").alias("day"), op.alias("op")
    ).localCheckpoint(eager=False)
    lo = ops.agg(F.min("day").alias("lo"))
    ref = (
        ops.crossJoin(F.broadcast(lo))
        .filter(F.col("day") < F.col("lo") + F.expr("INTERVAL 7 DAY"))
        .groupBy("op")
        .agg(F.count("*").cast("bigint").alias("rn"))
    )
    rtot = ref.agg(F.sum("rn").cast("bigint").alias("rt"))
    daily = ops.groupBy("day", "op").agg(F.count("*").cast("bigint").alias("cn"))
    grid = (
        daily.select("day").distinct()
        .crossJoin(spark.createDataFrame([("insert",), ("update",), ("delete",)], "op string"))
    )
    cell = (
        grid.join(F.broadcast(ref), "op", "left")
        .join(daily, ["day", "op"], "left")
        .select(
            "day",
            "op",
            F.coalesce(F.col("rn"), F.lit(0)).alias("rn"),
            F.coalesce(F.col("cn"), F.lit(0)).alias("cn"),
        )
        .withColumn("ct", F.sum("cn").over(Window.partitionBy("day")).cast("bigint"))
    )
    p = (F.col("cn") + 1.0) / (F.col("ct") + 3)
    q = (F.col("rn") + 1.0) / (F.col("rt") + 3)
    term = F.round((p - q) * F.log(p / q), 6).cast("decimal(18,6)")
    return (
        cell.crossJoin(F.broadcast(rtot))
        .groupBy(F.col("day").cast("timestamp").alias("day"))
        .agg(
            F.min("ct").cast("bigint").alias("n_ops"),
            F.round(F.sum(term).cast("double"), 6).alias("psi"),
        )
        .orderBy("day")
    )


@register(
    "cdc_burst_detection",
    tags=("cdc", "analytics", "timeseries"),
    oracle="""
    WITH h AS (
      SELECT date_trunc('hour', ts) AS hr, CAST(count(*) AS BIGINT) AS n
      FROM events WHERE ts IS NOT NULL GROUP BY 1
    ),
    s AS (
      SELECT CAST(sum(n) AS BIGINT) AS tot, CAST(count(*) AS BIGINT) AS nh
      FROM h
    )
    SELECT CAST(hr AS TIMESTAMP) AS hour, n AS n_events,
           round(CAST(tot AS DOUBLE) / nh, 6) AS lambda_hourly,
           round((n - CAST(tot AS DOUBLE) / nh)
                 / nullif(sqrt(CAST(tot AS DOUBLE) / nh), 0), 6) AS poisson_z
    FROM h, s
    WHERE n > CAST(tot AS DOUBLE) / nh + 3 * sqrt(CAST(tot AS DOUBLE) / nh)
    ORDER BY hr
    """,
)
def cdc_burst_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest burst detector: hours whose event count exceeds the global
    hourly mean by more than 3 Poisson standard deviations (z = (n -
    lambda)/sqrt(lambda), the classical rate-surprise test) -- the
    feed-side alarm that sizes sink bulk queues and decides when the
    es_sink's max_actions chunking actually matters. Complements
    events_interarrival_stats (micro gaps) and cdc_out_of_order_arrivals
    (ordering): this flags VOLUME spikes at operating grain.

    Contract: lambda is the mean over OBSERVED hours (hours with >= 1
    event) -- an all-quiet feed with one hot hour still alarms; a feed
    with long true gaps should be profiled with
    events_inactivity_gap_profile first.

    Exactness: hourly counts are exact integers; lambda is one IEEE
    division of exact operands; the threshold comparison and z share one
    double closed form on both engines, rounded 6 dp on output.

    Scale: one map-side-combinable pass to |hours| rows, a 1-row
    broadcast of the rate, and a dim-bounded filter."""
    e = load_table(spark, sf_dir, "events")
    h = e.filter(F.col("ts").isNotNull()).groupBy(
        F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count("*").cast("bigint").alias("n"))
    s = h.agg(
        F.sum("n").cast("bigint").alias("tot"),
        F.count("*").cast("bigint").alias("nh"),
    )
    lam = F.col("tot").cast("double") / F.col("nh")
    return (
        h.crossJoin(F.broadcast(s))
        .filter(F.col("n") > lam + 3 * F.sqrt(lam))
        .select(
            F.col("hr").cast("timestamp").alias("hour"),
            F.col("n").alias("n_events"),
            F.round(lam, 6).alias("lambda_hourly"),
            F.round((F.col("n") - lam) / F.nullif(F.sqrt(lam), F.lit(0.0)), 6).alias(
                "poisson_z"
            ),
        )
        .orderBy("hour")
    )


# Ingestion SLA threshold: a source whose consecutive arrivals sit more
# than this many seconds apart has visibly stalled (matches the 5-minute
# freshness budget most replication dashboards page on).
SLA_GAP_SECONDS = 300


@register(
    "cdc_ingestion_sla_by_source",
    tags=("cdc", "monitor"),
    oracle=f"""
    WITH g AS (
      SELECT event_type,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY event_type ORDER BY ts, event_id) AS gap_us
      FROM events
    ),
    gg AS (SELECT event_type, gap_us FROM g WHERE gap_us IS NOT NULL),
    agg AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_gaps,
             round(CAST(sum(CASE WHEN gap_us <= {SLA_GAP_SECONDS} * 1000000
                            THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
               AS pct_within_sla,
             round(CAST(max(gap_us) AS DOUBLE) / 1000000.0, 6) AS max_gap_s,
             CAST(sum(CASE WHEN gap_us > {SLA_GAP_SECONDS} * 1000000
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_breaches,
             round(CAST(sum(CASE WHEN gap_us > {SLA_GAP_SECONDS} * 1000000
                            THEN gap_us - {SLA_GAP_SECONDS} * 1000000
                            ELSE 0 END) AS DOUBLE) / 1000000.0, 6)
               AS breach_seconds
      FROM gg GROUP BY event_type
    ),
    rk AS (
      SELECT event_type, gap_us,
             CAST(row_number() OVER (PARTITION BY event_type ORDER BY gap_us)
               AS BIGINT) AS rn,
             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
      FROM gg
    ),
    q AS (
      -- exact interpolation from integer order stats, truncated to
      -- integer microseconds (the cdc_gap_heatmap_hour_dow rule: the
      -- engines' built-in quantiles are ulp-different, and rem = 50
      -- interpolations land on decimal halves)
      SELECT lo.event_type,
             (100 * lo.gap_us
              + ((95 * (lo.n - 1)) % 100) * (hi.gap_us - lo.gap_us)) // 100
               AS p95_us
      FROM rk lo JOIN rk hi
        ON lo.event_type = hi.event_type
       AND lo.rn = (95 * (lo.n - 1)) // 100 + 1
       AND hi.rn = CASE WHEN (95 * (lo.n - 1)) % 100 = 0
                        THEN lo.rn ELSE lo.rn + 1 END
    )
    SELECT agg.event_type, agg.n_gaps, agg.pct_within_sla,
           round(CAST(q.p95_us AS DOUBLE) / 1000000.0, 6) AS p95_gap_s,
           agg.max_gap_s, agg.n_breaches, agg.breach_seconds
    FROM agg JOIN q ON agg.event_type = q.event_type
    """,
)
def cdc_ingestion_sla_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source ingestion SLA panel over replication cadence: for each
    routed stream, the share of consecutive-arrival gaps inside the
    {SLA_GAP_SECONDS}s freshness budget, the p95 and max gap, and the
    accumulated breach time (sum of gap excess beyond the budget) --
    the round-10 verdict's queue item, and the page-worthy form of
    cdc_replication_lag's point-in-time number: lag says "how stale is
    the newest row NOW"; this says "how often and how badly did this
    source stall over the window", which is what an SLA review needs.

    Exactness: gaps are exact integer epoch-microsecond differences on a
    (ts, event_id)-tiebroken lag; SLA shares, breach counts, and breach
    sums are integer arithmetic over those gaps; p95 interpolates the
    identical integer list on both engines (the events_interarrival_stats
    precedent); each output divides/rounds once.

    Scale: one keyed shuffle for the lag window (partition = event_type),
    stats agg reuses that partitioning; |types| result rows."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    thr_us = SLA_GAP_SECONDS * 1_000_000
    g = e.select(
        "event_type", (us - F.lag(us).over(w)).alias("gap_us")
    ).filter(F.col("gap_us").isNotNull()).localCheckpoint(eager=False)
    agg = g.groupBy("event_type").agg(
        F.count("gap_us").cast("bigint").alias("n_gaps"),
        F.round(
            F.sum(F.when(F.col("gap_us") <= thr_us, 1).otherwise(0)).cast("double")
            / F.count("gap_us"),
            6,
        ).alias("pct_within_sla"),
        F.round(F.max("gap_us").cast("double") / 1000000.0, 6).alias("max_gap_s"),
        F.sum(F.when(F.col("gap_us") > thr_us, 1).otherwise(0))
        .cast("bigint").alias("n_breaches"),
        F.round(
            F.sum(
                F.when(F.col("gap_us") > thr_us, F.col("gap_us") - thr_us).otherwise(0)
            ).cast("double")
            / 1000000.0,
            6,
        ).alias("breach_seconds"),
    )
    q = exact_interp_pct(g, ["event_type"], "gap_us", 95).select(
        F.col("event_type").alias("qet"),
        F.round(F.col("q_val").cast("double") / 1000000.0, 6).alias("p95_gap_s"),
    )
    return agg.join(q, agg["event_type"] == q["qet"]).select(
        "event_type", "n_gaps", "pct_within_sla", "p95_gap_s",
        "max_gap_s", "n_breaches", "breach_seconds",
    )


@register(
    "cdc_gap_heatmap_hour_dow",
    tags=("cdc", "monitor"),
    oracle="""
    WITH g AS (
      SELECT dayofweek(ts) AS dw, CAST(extract(hour FROM ts) AS INT) AS hr,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY event_type ORDER BY ts, event_id) AS gap_us
      FROM events
    ),
    gg AS (SELECT dw, hr, gap_us FROM g WHERE gap_us IS NOT NULL),
    rk AS (
      SELECT dw, hr, gap_us,
             CAST(row_number() OVER (PARTITION BY dw, hr ORDER BY gap_us)
               AS BIGINT) AS rn,
             CAST(count(*) OVER (PARTITION BY dw, hr) AS BIGINT) AS n,
             CAST(sum(gap_us) OVER (PARTITION BY dw, hr) AS BIGINT) AS s
      FROM gg
    ),
    q AS (
      -- exact linear interpolation from integer order statistics:
      -- pos = 95*(n-1)/100; value = x_lo + rem*(x_hi - x_lo)/100 with
      -- rem = (95*(n-1)) % 100 -- ONE shared rational closed form (the
      -- engines' built-in quantile_cont/percentile use ulp-DIFFERENT
      -- but equal formulas, caught flapping at the 6dp round)
      SELECT lo.dw, lo.hr, lo.n, lo.s,
             (100 * lo.gap_us
              + ((95 * (lo.n - 1)) % 100) * (hi.gap_us - lo.gap_us)) // 100
               AS p95_us
      FROM rk lo JOIN rk hi
        ON lo.dw = hi.dw AND lo.hr = hi.hr
       AND lo.rn = (95 * (lo.n - 1)) // 100 + 1
       AND hi.rn = CASE WHEN (95 * (lo.n - 1)) % 100 = 0
                        THEN lo.rn ELSE lo.rn + 1 END
    )
    SELECT CAST(dw AS BIGINT) AS dw, CAST(hr AS BIGINT) AS hr,
           n AS n_gaps,
           round(CAST(s AS DOUBLE) / n / 1000000.0, 6) AS avg_gap_s,
           round(CAST(p95_us AS DOUBLE) / 1000000.0, 6) AS p95_gap_s
    FROM q ORDER BY 1, 2
    """,
)
def cdc_gap_heatmap_hour_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replication-cadence heatmap: mean and p95 inter-arrival gap per
    (day-of-week, hour) cell, pooled across streams -- the capacity
    view that turns cdc_ingestion_sla_by_source's per-stream totals
    into a WHEN picture (weekend batch windows, nightly quiet hours,
    the Monday 9am burst). The gap lands in the cell of its LATER
    event's timestamp: a stall is charged to the hour that felt it.

    Exactness: exact integer microsecond gaps on the (ts, event_id)
    tiebroken lag; cell means are single divisions. The p95 is
    interpolated EXPLICITLY from integer order statistics with one
    shared rational closed form -- the engines' built-in
    quantile_cont/percentile evaluate mathematically-equal but
    ulp-DIFFERENT expressions (x_lo*(1-f)+x_hi*f vs x_lo+f*(x_hi-x_lo)),
    observed flapping at the 6dp round on this very key; the
    interpolated value then TRUNCATES to integer microseconds before
    the display division (interpolation at rem = 50 lands on exact
    decimal halves where Spark HALF_UP and DuckDB HALF_EVEN diverge --
    the stream_ewma_anomaly snap rule). dw is
    0 = Sunday (the shared DuckDB dayofweek convention).

    Scale: one keyed lag window (partition = event_type), then cell-
    grain rank windows over <= 168 cells."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    g = e.select(
        (F.dayofweek("ts") - 1).cast("bigint").alias("dw"),
        F.hour("ts").cast("bigint").alias("hr"),
        (us - F.lag(us).over(w)).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    cw = Window.partitionBy("dw", "hr")
    rk = g.select(
        "dw", "hr", "gap_us",
        F.row_number().over(cw.orderBy("gap_us")).cast("bigint").alias("rn"),
        F.count("*").over(cw).cast("bigint").alias("n"),
        F.sum("gap_us").over(cw).cast("bigint").alias("s"),
    ).localCheckpoint(eager=False)  # both sides of the lo/hi self-join
    lo_rn = F.expr("(95 * (n - 1)) DIV 100") + 1
    rem = F.expr("(95 * (n - 1)) % 100")
    lo = rk.filter(F.col("rn") == lo_rn).select(
        "dw", "hr", "n", "s", F.col("gap_us").alias("x_lo"),
        rem.alias("rem"),
    )
    hi = rk.select(
        F.col("dw").alias("dw2"), F.col("hr").alias("hr2"),
        F.col("rn").alias("rn2"), F.col("gap_us").alias("x_hi"),
    )
    q = lo.join(
        hi,
        (F.col("dw") == F.col("dw2"))
        & (F.col("hr") == F.col("hr2"))
        & (
            F.col("rn2")
            == F.when(F.col("rem") == 0, lo_rn).otherwise(lo_rn + 1)
        ),
    ).select(
        "dw", "hr", "n", "s",
        F.expr("(100 * x_lo + rem * (x_hi - x_lo)) DIV 100").alias("p95_us"),
    )
    return q.select(
        "dw", "hr",
        F.col("n").alias("n_gaps"),
        F.round(F.col("s").cast("double") / F.col("n") / 1000000.0, 6).alias(
            "avg_gap_s"
        ),
        F.round(F.col("p95_us").cast("double") / 1000000.0, 6).alias("p95_gap_s"),
    ).orderBy("dw", "hr")


@register(
    "cdc_revisit_halflife_by_type",
    tags=("cdc", "monitor"),
    oracle="""
    WITH g AS (
      SELECT event_type,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY event_type, user_id ORDER BY ts, event_id)
               AS gap_us
      FROM events
    ),
    agg AS (
      SELECT event_type,
             CAST(count(gap_us) AS BIGINT) AS n_gaps,
             CAST(sum(gap_us) AS BIGINT) AS sum_us
      FROM g WHERE gap_us IS NOT NULL AND gap_us > 0
      GROUP BY event_type
    )
    SELECT event_type, n_gaps,
           round(CAST(n_gaps AS DOUBLE) / (CAST(sum_us AS DOUBLE) / 1000000.0),
                 6) AS lambda_per_s,
           round(ln(2) * (CAST(sum_us AS DOUBLE) / 1000000.0) / n_gaps / 3600,
                 6) AS halflife_hours
    FROM agg ORDER BY event_type
    """,
)
def cdc_revisit_halflife_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parametric revisit-freshness fit per stream: the exponential-MLE
    rate of same-user revisit gaps (lambda = n / sum(gaps) -- THE
    closed-form MLE) and its half-life ln(2)/lambda in hours. The
    parametric companion to cdc_revisit_time_histogram: the histogram
    shows the spectrum, this one number feeds crawl/poll schedulers
    (revisit a source at ~its half-life and you catch half the updates
    at minimal cost -- the freshness-decay scheduling rule).

    Exactness: gaps are exact integer microseconds ((ts, event_id)
    tiebroken, zero-gaps excluded -- an exponential has no mass at 0);
    the MLE is one shared closed form over (n, sum), rounded 6dp.

    Scale: one (type, user)-keyed lag window, then a per-type partial
    agg -- |types| rows out."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type", "user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    g = e.select(
        "event_type", (us - F.lag(us).over(w)).alias("gap_us")
    ).filter(F.col("gap_us").isNotNull() & (F.col("gap_us") > 0))
    agg = g.groupBy("event_type").agg(
        F.count("gap_us").cast("bigint").alias("n_gaps"),
        F.sum("gap_us").cast("bigint").alias("sum_us"),
    )
    secs = F.col("sum_us").cast("double") / 1000000.0
    return agg.select(
        "event_type",
        "n_gaps",
        F.round(F.col("n_gaps").cast("double") / secs, 6).alias("lambda_per_s"),
        F.round(
            F.log(F.lit(2.0)) * secs / F.col("n_gaps") / 3600, 6
        ).alias("halflife_hours"),
    ).orderBy("event_type")


@register(
    "cdc_watermark_skew_by_table",
    tags=("cdc", "monitor"),
    oracle=f"""
    WITH m AS (
      SELECT event_type,
             max(epoch_us(ts)) AS mx,
             CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY event_type
    ),
    g AS (SELECT max(mx) AS gmx FROM m)
    SELECT m.event_type,
           make_timestamp(m.mx) AS stream_max_ts,
           round(CAST(g.gmx - m.mx AS DOUBLE) / 1000000.0, 6) AS skew_s,
           m.n_events,
           CAST(CASE WHEN g.gmx - m.mx > {SLA_GAP_SECONDS} * 1000000
                THEN 1 ELSE 0 END AS BIGINT) AS is_laggard
    FROM m, g ORDER BY m.event_type
    """,
)
def cdc_watermark_skew_by_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-skew panel across routed streams: each stream's
    high-water event time, its lag behind the freshest stream, and a
    laggard flag at the {SLA_GAP_SECONDS}s budget. In a multi-table CDC
    union (the reference routes every table into one Kafka topic,
    ``internal/kafka/producer.go:17-47``) the EFFECTIVE watermark of any
    stream-stream join or windowed agg is min-over-streams of per-stream
    max event time -- one stalled table holds state for ALL of them.
    This is the panel that names the stream doing the holding, where
    cdc_ingestion_sla_by_source prices how often each stream stalls.

    Exactness: per-stream maxima are exact integer epoch-microseconds;
    skew is an integer difference divided/rounded once; the flag is
    integer CASE arithmetic; the timestamp output round-trips micros
    exactly (timestamp_micros vs make_timestamp).

    Scale: ONE map-side-combinable groupBy(event_type) partial agg over
    the log; the global max folds the |types|-row result and broadcasts
    back -- no second fact scan, no window over raw rows."""
    e = load_table(spark, sf_dir, "events")
    m = e.groupBy("event_type").agg(
        F.max(F.unix_micros(F.col("ts"))).alias("mx"),
        F.count("*").cast("bigint").alias("n_events"),
    ).localCheckpoint(eager=False)  # consumed by the global fold AND the panel
    g = m.agg(F.max("mx").alias("gmx"))
    thr_us = SLA_GAP_SECONDS * 1_000_000
    return (
        m.join(F.broadcast(g))
        .select(
            "event_type",
            F.timestamp_micros(F.col("mx")).alias("stream_max_ts"),
            F.round(
                (F.col("gmx") - F.col("mx")).cast("double") / 1000000.0, 6
            ).alias("skew_s"),
            "n_events",
            F.when(F.col("gmx") - F.col("mx") > thr_us, F.lit(1))
            .otherwise(F.lit(0)).cast("bigint").alias("is_laggard"),
        )
        .orderBy("event_type")
    )


@register(
    "cdc_throughput_percentiles_minute",
    tags=("cdc", "monitor"),
    oracle="""
    WITH mb AS (
      SELECT date_trunc('minute', ts) AS m, CAST(count(*) AS BIGINT) AS n
      FROM events WHERE ts IS NOT NULL GROUP BY 1
    ),
    rk AS (
      SELECT n, CAST(row_number() OVER (ORDER BY n) AS BIGINT) AS rn,
             CAST(count(*) OVER () AS BIGINT) AS cnt
      FROM mb
    ),
    q AS (
      SELECT p.pct,
             (100 * lo.n + ((p.pct * (lo.cnt - 1)) % 100) * (hi.n - lo.n))
               // 100 AS q_v
      FROM (SELECT CAST(unnest([50, 95, 99]) AS BIGINT) AS pct) p
      JOIN rk lo ON lo.rn = (p.pct * (lo.cnt - 1)) // 100 + 1
      JOIN rk hi ON hi.rn = CASE WHEN (p.pct * (lo.cnt - 1)) % 100 = 0
                                 THEN lo.rn ELSE lo.rn + 1 END
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM mb) AS n_minutes,
           CAST(max(CASE WHEN pct = 50 THEN q_v END) AS BIGINT) AS p50_epm,
           CAST(max(CASE WHEN pct = 95 THEN q_v END) AS BIGINT) AS p95_epm,
           CAST(max(CASE WHEN pct = 99 THEN q_v END) AS BIGINT) AS p99_epm,
           (SELECT CAST(max(n) AS BIGINT) FROM mb) AS max_epm
    FROM q
    """,
)
def cdc_throughput_percentiles_minute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replication throughput envelope at minute grain: p50/p95/p99 and
    max events-per-OBSERVED-minute (idle minutes carry no row and are
    deliberately excluded -- this sizes the consumer for minutes that
    actually carry traffic). cdc_ingestion_sla_by_source prices GAPS
    (too slow); this prices BURST capacity (too fast): the p99 epm is
    the number the sink's bulk batch size and the broker partition
    count are provisioned against, and p99/p50 is the burstiness the
    events_burstiness Fano factor summarizes at day grain.

    Exactness: minute counts are exact integers; each percentile is the
    shared exact_interp_pct rational closed form (truncated integer
    interpolation) over the bounded count DOMAIN -- no built-in
    quantiles (ulp-divergent cross-engine).

    Scale: one (minute) partial agg over the log; the weighted
    percentile pass runs on the DISTINCT epm-value domain (bounded by
    the count range, not by minutes); one row out."""
    e = load_table(spark, sf_dir, "events")
    mb = e.filter(F.col("ts").isNotNull()).groupBy(
        F.date_trunc("minute", "ts").alias("m")
    ).agg(F.count("*").cast("bigint").alias("n"))
    return throughput_panel_from_minutes(mb)


def throughput_panel_from_minutes(mb: DataFrame) -> DataFrame:
    """The percentile/max panel fold over a (m, n) minute-count relation
    -- shared by the batch key above and by the streaming twin's finish
    step (``streaming.stateful.throughput_finish``), so the drained
    stream and the batch query are the SAME arithmetic by construction."""
    mb = mb.localCheckpoint(
        eager=False
    )  # three percentile passes + the count/max agg consume it
    mbg = mb.withColumn("g", F.lit(1))
    qs = None
    for pct, alias in ((50, "p50_epm"), (95, "p95_epm"), (99, "p99_epm")):
        q = exact_interp_pct_weighted(mbg, ["g"], "n", pct).select(
            F.col("q_val").cast("bigint").alias(alias)
        )
        qs = q if qs is None else qs.crossJoin(q)
    stats = mb.agg(
        F.count("*").cast("bigint").alias("n_minutes"),
        F.max("n").cast("bigint").alias("max_epm"),
    )
    # stats is always one row even on an empty log; qs vanishes (the
    # lo/hi percentile join is empty on empty input), so stats must
    # DRIVE via a left join or the whole panel disappears -- same
    # constant-panel totality contract as search_alpha_dcg_diversity.
    return stats.join(qs, F.lit(True), "left").select(
        "n_minutes", "p50_epm", "p95_epm", "p99_epm", "max_epm"
    )


@register(
    "cdc_replay_window_cost",
    tags=("cdc", "monitor"),
    oracle="""
    WITH m AS (
      SELECT event_type, max(epoch_us(ts)) AS mx,
             CAST(count(*) AS BIGINT) AS n_total
      FROM events WHERE ts IS NOT NULL GROUP BY 1
    )
    SELECT e.event_type,
           m.n_total,
           CAST(sum(CASE WHEN epoch_us(e.ts) > m.mx - 60000000
                    THEN 1 ELSE 0 END) AS BIGINT) AS replay_1m,
           CAST(sum(CASE WHEN epoch_us(e.ts) > m.mx - 300000000
                    THEN 1 ELSE 0 END) AS BIGINT) AS replay_5m,
           CAST(sum(CASE WHEN epoch_us(e.ts) > m.mx - 900000000
                    THEN 1 ELSE 0 END) AS BIGINT) AS replay_15m,
           CAST(sum(CASE WHEN epoch_us(e.ts) > m.mx - 3600000000
                    THEN 1 ELSE 0 END) AS BIGINT) AS replay_60m,
           round(CAST(sum(CASE WHEN epoch_us(e.ts) > m.mx - 3600000000
                          THEN 1 ELSE 0 END) AS DOUBLE) / m.n_total, 6)
             AS share_60m
    FROM events e JOIN m ON e.event_type = m.event_type
    WHERE e.ts IS NOT NULL
    GROUP BY e.event_type, m.n_total
    ORDER BY e.event_type
    """,
)
def cdc_replay_window_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpoint-loss replay cost per stream: if the consumer restarts
    with its offset rolled back 1/5/15/60 minutes behind each stream's
    OWN high-water mark, how many events replay (and the 60-minute
    share of the stream). This prices the checkpointing interval the
    reference leaves implicit in its standby-status loop
    (``replicator.go:186-242`` confirms offsets but never sizes the
    at-least-once replay a crash costs): replay_60m x the sink's
    rows/s (BENCH es_sink) is the recovery-time estimate, and a stream
    whose replay share is high is bursty-at-the-tail -- exactly the
    streams cdc_throughput_percentiles_minute flags.

    Exactness: all windows compare exact integer epoch-microseconds
    against the per-stream max; counts are integers; one share division
    at 6dp.

    Scale: one partial agg for the per-stream high-water (|types| rows,
    broadcast back), one conditional-agg pass for all four windows --
    two fact scans total, no fact-grain window or shuffle beyond the
    keyed partial aggs."""
    e = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    m = e.groupBy("event_type").agg(
        F.max(F.unix_micros("ts")).alias("mx"),
        F.count("*").cast("bigint").alias("n_total"),
    )
    us = F.unix_micros(F.col("ts"))
    def replay(minutes, alias):
        return F.sum(
            F.when(us > F.col("mx") - minutes * 60_000_000, 1).otherwise(0)
        ).cast("bigint").alias(alias)
    return (
        e.join(F.broadcast(m), "event_type")
        .groupBy("event_type", "n_total")
        .agg(
            replay(1, "replay_1m"),
            replay(5, "replay_5m"),
            replay(15, "replay_15m"),
            replay(60, "replay_60m"),
            F.round(
                F.sum(
                    F.when(us > F.col("mx") - 3_600_000_000, 1).otherwise(0)
                ).cast("double")
                / F.col("n_total"),
                6,
            ).alias("share_60m"),
        )
        .select(
            "event_type", "n_total", "replay_1m", "replay_5m",
            "replay_15m", "replay_60m", "share_60m",
        )
        .orderBy("event_type")
    )


@register(
    "cdc_reorder_buffer_depth",
    tags=("cdc", "monitor"),
    oracle="""
    WITH r AS (
      SELECT event_type,
             CAST(row_number() OVER (PARTITION BY event_type
                    ORDER BY event_id) AS BIGINT) AS arrival_rank,
             CAST(row_number() OVER (PARTITION BY event_type
                    ORDER BY ts, event_id) AS BIGINT) AS ts_rank
      FROM events WHERE ts IS NOT NULL
    ),
    d AS (
      SELECT event_type,
             greatest(arrival_rank - ts_rank, 0) AS disp
      FROM r
    ),
    agg AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(max(disp) AS BIGINT) AS max_depth,
             round(CAST(sum(CASE WHEN disp = 0 THEN 1 ELSE 0 END) AS DOUBLE)
                   / count(*), 6) AS pct_in_order
      FROM d GROUP BY 1
    ),
    rk AS (
      SELECT event_type, disp,
             CAST(row_number() OVER (PARTITION BY event_type ORDER BY disp)
               AS BIGINT) AS rn,
             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
      FROM d
    ),
    q AS (
      SELECT lo.event_type,
             (100 * lo.disp
              + ((95 * (lo.n - 1)) % 100) * (hi.disp - lo.disp)) // 100
               AS p95_depth
      FROM rk lo JOIN rk hi
        ON lo.event_type = hi.event_type
       AND lo.rn = (95 * (lo.n - 1)) // 100 + 1
       AND hi.rn = CASE WHEN (95 * (lo.n - 1)) % 100 = 0
                        THEN lo.rn ELSE lo.rn + 1 END
    )
    SELECT agg.event_type, agg.n_events, agg.pct_in_order,
           CAST(q.p95_depth AS BIGINT) AS p95_depth, agg.max_depth
    FROM agg JOIN q ON agg.event_type = q.event_type
    ORDER BY agg.event_type
    """,
)
def cdc_reorder_buffer_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reorder-buffer sizing per stream: each event's positive
    displacement between ARRIVAL order (event_id, the LSN ordinal) and
    EVENT-TIME order (ts), with the per-stream p95 and max. An event
    arriving k positions later than its timestamp rank forces a
    consumer that must emit in event-time order to hold k slots -- so
    max_depth IS the minimum reorder-buffer size for lossless in-order
    emission, and p95_depth the size at a 5% late-drop budget (what a
    watermark delay of that many events buys).
    cdc_out_of_order_arrivals reports HOW OFTEN order breaks; this
    prices WHAT IT COSTS to fix.

    Exactness: both ranks tiebreak on event_id, so displacements are
    exact integers; percentile uses the shared truncated rational
    interpolation; pct_in_order is the NOT-LATE share (early
    arrivals clamp to zero displacement), dividing exact integers
    once.

    Scale: two rank windows partitioned BY STREAM (key-parallel,
    fact-grain -- the events_interarrival_stats class), then all stats
    reduce at the displacement DOMAIN grain."""
    e = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    wa = Window.partitionBy("event_type").orderBy("event_id")
    wt = Window.partitionBy("event_type").orderBy("ts", "event_id")
    d = e.select(
        "event_type",
        F.greatest(
            F.row_number().over(wa).cast("bigint")
            - F.row_number().over(wt).cast("bigint"),
            F.lit(0).cast("bigint"),
        ).alias("disp"),
    ).localCheckpoint(eager=False)  # stats agg + percentile pass
    agg = d.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.max("disp").cast("bigint").alias("max_depth"),
        F.round(
            F.sum(F.when(F.col("disp") == 0, 1).otherwise(0)).cast("double")
            / F.count("*"),
            6,
        ).alias("pct_in_order"),
    )
    q = exact_interp_pct_weighted(d, ["event_type"], "disp", 95).select(
        F.col("event_type").alias("qet"),
        F.col("q_val").cast("bigint").alias("p95_depth"),
    )
    return (
        agg.join(q, agg["event_type"] == q["qet"])
        .select("event_type", "n_events", "pct_in_order", "p95_depth", "max_depth")
        .orderBy("event_type")
    )


@register(
    "cdc_hot_key_skew_daily",
    tags=("cdc", "monitor"),
    oracle="""
    WITH kc AS (
      SELECT date_trunc('day', ts) AS day, user_id,
             CAST(count(*) AS BIGINT) AS cnt
      FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
      GROUP BY 1, 2
    ),
    rk AS (
      SELECT day, cnt,
             row_number() OVER (PARTITION BY day
                                ORDER BY cnt DESC, user_id) AS rn
      FROM kc
    ),
    top10 AS (
      SELECT day, CAST(sum(cnt) AS BIGINT) AS t10
      FROM rk WHERE rn <= 10 GROUP BY day
    ),
    d AS (
      SELECT day,
             CAST(sum(cnt) AS BIGINT) AS n_updates,
             CAST(count(*) AS BIGINT) AS n_keys,
             CAST(max(cnt) AS BIGINT) AS top1,
             CAST(sum(CAST(cnt AS DECIMAL(38,0)) * cnt) AS BIGINT) AS sq
      FROM kc GROUP BY day
    )
    SELECT CAST(d.day AS TIMESTAMP) AS day, d.n_updates, d.n_keys,
           round(CAST(d.top1 AS DOUBLE) / d.n_updates, 6) AS top1_share,
           round(CAST(t.t10 AS DOUBLE) / d.n_updates, 6) AS top10_share,
           round(CAST(d.sq AS DOUBLE)
                 / (CAST(d.n_updates AS DOUBLE) * d.n_updates), 6) AS hhi
    FROM d JOIN top10 t ON d.day = t.day
    ORDER BY day
    """,
)
def cdc_hot_key_skew_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key skew monitor at day grain: how concentrated the day's
    change traffic is on its hottest keys (top-1/top-10 share and the
    key-level HHI). THE panel behind every skew mitigation this engine
    documents -- a day whose top1_share spikes is the day the keyed
    upsert sink's partition for that key becomes the straggler, and the
    number that says whether join_skew_salted-style salting or AQE skew
    handling is worth enabling on the change stream. The reference
    routes all tables through one keyed topic (``producer.go:17-47``),
    so per-key concentration IS its partition skew.

    Exactness: per-(day, key) counts are exact integers; top-10 comes
    from a fully tie-broken rank (cnt desc, user_id); HHI's sum of
    squares accumulates in DECIMAL(38,0); three share divisions at 6dp.

    Scale: ONE map-side-combinable (day, key) partial agg over the log;
    the rank window rides that reduced relation partitioned BY DAY with
    WindowGroupLimit pushing the top-10 truncation map-side, so no day's
    key list ever sorts fully; HHI and totals fold in the same pass
    shape. Day partitioning bounds each window partition by the day's
    distinct keys."""
    e = load_table(spark, sf_dir, "events")
    kc = (
        e.filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .groupBy(F.date_trunc("day", "ts").alias("day"), "user_id")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .localCheckpoint(eager=False)  # rank pass + moment pass consume it
    )
    w = Window.partitionBy("day").orderBy(F.col("cnt").desc(), "user_id")
    top10 = (
        kc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .groupBy("day")
        .agg(F.sum("cnt").cast("bigint").alias("t10"))
    )
    d = kc.groupBy("day").agg(
        F.sum("cnt").cast("bigint").alias("n_updates"),
        F.count("*").cast("bigint").alias("n_keys"),
        F.max("cnt").cast("bigint").alias("top1"),
        F.sum(F.col("cnt").cast("decimal(38,0)") * F.col("cnt"))
        .cast("bigint")
        .alias("sq"),
    )
    nu = F.col("n_updates").cast("double")
    return (
        d.join(top10, "day")
        .select(
            F.col("day").cast("timestamp").alias("day"),
            "n_updates",
            "n_keys",
            F.round(F.col("top1").cast("double") / nu, 6).alias("top1_share"),
            F.round(F.col("t10").cast("double") / nu, 6).alias("top10_share"),
            F.round(F.col("sq").cast("double") / (nu * nu), 6).alias("hhi"),
        )
        .orderBy("day")
    )


@register(
    "cdc_payload_size_profile",
    tags=("cdc", "monitor"),
    oracle="""
    WITH s AS (
      SELECT event_type, CAST(length(props) AS BIGINT) AS sz
      FROM events WHERE props IS NOT NULL
    ),
    dom AS (
      SELECT event_type, sz, CAST(count(*) AS BIGINT) AS w
      FROM s GROUP BY 1, 2
    ),
    cum AS (
      SELECT event_type, sz, w,
             CAST(sum(w) OVER (PARTITION BY event_type ORDER BY sz)
                  AS BIGINT) AS c_end,
             CAST(sum(w) OVER (PARTITION BY event_type) AS BIGINT) AS n
      FROM dom
    ),
    q AS (
      SELECT p.pct, c.event_type,
             (100 * lo.sz + ((p.pct * (lo.n - 1)) % 100) * (hi.sz - lo.sz))
               // 100 AS qv
      FROM (SELECT CAST(unnest([50, 95, 99]) AS BIGINT) AS pct) p
      CROSS JOIN (SELECT DISTINCT event_type FROM cum) c
      JOIN cum lo ON lo.event_type = c.event_type
        AND lo.c_end >= (p.pct * (lo.n - 1)) // 100 + 1
        AND lo.c_end - lo.w < (p.pct * (lo.n - 1)) // 100 + 1
      JOIN cum hi ON hi.event_type = c.event_type
        AND hi.c_end >= CASE WHEN (p.pct * (lo.n - 1)) % 100 = 0
                             THEN (p.pct * (lo.n - 1)) // 100 + 1
                             ELSE (p.pct * (lo.n - 1)) // 100 + 2 END
        AND hi.c_end - hi.w < CASE WHEN (p.pct * (lo.n - 1)) % 100 = 0
                                   THEN (p.pct * (lo.n - 1)) // 100 + 1
                                   ELSE (p.pct * (lo.n - 1)) // 100 + 2 END
    ),
    t AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
             CAST(sum(CAST(sz AS DECIMAL(38,0))) AS BIGINT) AS total_chars,
             CAST(max(sz) AS BIGINT) AS max_chars
      FROM s GROUP BY 1
    )
    SELECT t.event_type, t.n_events, t.total_chars, t.max_chars,
           CAST(max(CASE WHEN q.pct = 50 THEN q.qv END) AS BIGINT) AS p50_chars,
           CAST(max(CASE WHEN q.pct = 95 THEN q.qv END) AS BIGINT) AS p95_chars,
           CAST(max(CASE WHEN q.pct = 99 THEN q.qv END) AS BIGINT) AS p99_chars
    FROM t JOIN q ON t.event_type = q.event_type
    GROUP BY t.event_type, t.n_events, t.total_chars, t.max_chars
    ORDER BY t.event_type
    """,
)
def cdc_payload_size_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stream payload-size envelope: p50/p95/p99/max payload length
    and total volume per event type -- the numbers that size the Kafka
    ``max.message.bytes``, the ES ``_bulk`` chunk budget (the sink caps
    actions per request; BYTES per request is this panel times that
    cap), and the dead-letter threshold for oversized envelopes. Length
    is in characters, identical on both engines for the fixtures' ASCII
    JSON payloads (documented; a byte-exact variant would swap in
    octet semantics on both sides).

    Exactness: lengths are exact integers; percentiles are the shared
    exact-interpolation rational closed form evaluated on the bounded
    (type, length) DOMAIN; totals accumulate in DECIMAL(38,0).

    Scale: one map-side-combinable (type, length) domain reduction over
    the log (payloads never shuffle -- only their lengths); the
    percentile pass and panel fold ride the |types| x |lengths| domain
    relation."""
    e = load_table(spark, sf_dir, "events")
    s = e.filter(F.col("props").isNotNull()).select(
        "event_type", F.length("props").cast("bigint").alias("sz")
    ).localCheckpoint(eager=False)  # percentile + totals passes consume it
    qs = None
    for pct, alias in ((50, "p50_chars"), (95, "p95_chars"), (99, "p99_chars")):
        q = exact_interp_pct_weighted(s, ["event_type"], "sz", pct).select(
            "event_type", F.col("q_val").cast("bigint").alias(alias)
        )
        qs = q if qs is None else qs.join(q, "event_type")
    t = s.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.sum(F.col("sz").cast("decimal(38,0)")).cast("bigint").alias("total_chars"),
        F.max("sz").cast("bigint").alias("max_chars"),
    )
    return (
        t.join(qs, "event_type")
        .select(
            "event_type", "n_events", "total_chars", "max_chars",
            "p50_chars", "p95_chars", "p99_chars",
        )
        .orderBy("event_type")
    )


@register(
    "cdc_state_size_projection",
    tags=("cdc", "monitor"),
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, ts,
             CAST(length(props) AS BIGINT) AS sz
      FROM events
    ),
    panels AS (
      SELECT 'latest_state (per key)' AS operator,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_state_rows,
             CAST(count(DISTINCT user_id)
                  * (16 + CAST(max(sz) AS BIGINT)) AS BIGINT)
               AS bytes_upper
      FROM e
      UNION ALL
      SELECT 'gap_sla / watermark (per stream)',
             CAST(count(DISTINCT event_type) AS BIGINT),
             CAST(count(DISTINCT event_type) * 48 AS BIGINT)
      FROM e
      UNION ALL
      SELECT 'minute_count (per touched minute)',
             CAST(count(DISTINCT date_trunc('minute', ts)) AS BIGINT),
             CAST(count(DISTINCT date_trunc('minute', ts)) * 16 AS BIGINT)
      FROM e WHERE ts IS NOT NULL
      UNION ALL
      SELECT 'ewma_anomaly (per user-day open)',
             CAST(count(DISTINCT user_id) AS BIGINT),
             CAST(count(DISTINCT user_id) * 40 AS BIGINT)
      FROM e
    )
    SELECT operator, n_state_rows, bytes_upper
    FROM panels ORDER BY operator
    """,
)
def cdc_state_size_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful-operator memory projection: for each streaming operator
    family this engine ships (latest-state upsert, per-stream SLA /
    watermark trackers, per-minute throughput counts, per-user EWMA),
    the state-row count its key grain implies on THIS corpus and an
    upper-bound byte estimate from the declared state schema (fixed
    fields + the max payload for the value-carrying state). The
    capacity-planning panel behind every applyInPandasWithState
    operator's "O(keys) across the cluster" claim -- run it on a
    sample before sizing executor memory, exactly as the reference
    would size its ES upsert map. Byte constants are the documented
    state-schema widths (8B longs + string payloads), an UPPER bound,
    not a JVM-object measurement.

    Exactness: distinct counts are exact; byte arithmetic is integer.

    Scale: one pass over the log computing four distinct-aggregates
    (each map-side partial); the panel is 4 rows."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", F.length("props").cast("bigint").alias("sz")
    ).localCheckpoint(eager=False)  # four panel branches consume it
    lat = e.agg(
        F.countDistinct("user_id").alias("nk"), F.max("sz").alias("mx")
    ).select(
        F.lit("latest_state (per key)").alias("operator"),
        F.col("nk").cast("bigint").alias("n_state_rows"),
        (F.col("nk") * (16 + F.col("mx"))).cast("bigint").alias("bytes_upper"),
    )
    stream = e.agg(F.countDistinct("event_type").alias("nt")).select(
        F.lit("gap_sla / watermark (per stream)").alias("operator"),
        F.col("nt").cast("bigint").alias("n_state_rows"),
        (F.col("nt") * 48).cast("bigint").alias("bytes_upper"),
    )
    minute = (
        e.filter(F.col("ts").isNotNull())
        .agg(F.countDistinct(F.date_trunc("minute", "ts")).alias("nm"))
        .select(
            F.lit("minute_count (per touched minute)").alias("operator"),
            F.col("nm").cast("bigint").alias("n_state_rows"),
            (F.col("nm") * 16).cast("bigint").alias("bytes_upper"),
        )
    )
    ewma = e.agg(F.countDistinct("user_id").alias("nu")).select(
        F.lit("ewma_anomaly (per user-day open)").alias("operator"),
        F.col("nu").cast("bigint").alias("n_state_rows"),
        (F.col("nu") * 40).cast("bigint").alias("bytes_upper"),
    )
    return lat.unionAll(stream).unionAll(minute).unionAll(ewma).orderBy("operator")


@register(
    "cdc_duplicate_delivery_audit",
    tags=("cdc", "dq"),
    oracle="""
    WITH g AS (
      SELECT user_id, event_type, ts, CAST(count(*) AS BIGINT) AS n
      FROM events WHERE ts IS NOT NULL
      GROUP BY user_id, event_type, ts
    )
    SELECT event_type,
           CAST(sum(n) AS BIGINT) AS n_deliveries,
           CAST(count(*) AS BIGINT) AS n_distinct_events,
           CAST(sum(n - 1) AS BIGINT) AS n_redundant,
           round(CAST(sum(n - 1) AS DOUBLE) / sum(n), 6) AS dup_rate,
           CAST(max(n) AS BIGINT) AS max_copies
    FROM g GROUP BY event_type ORDER BY event_type
    """,
)
def cdc_duplicate_delivery_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At-least-once duplicate-delivery audit per stream: events whose
    (user, type, event-time) identity appears more than once are replay
    artifacts -- exactly what a consumer restart with a rolled-back
    offset produces (cdc_replay_window_cost PRICES that replay; this
    MEASURES how much of it reached the sink), and the measurement
    behind the keyed-upsert sink's idempotency claim: dup_rate is the
    write amplification idempotent upserts absorb and an append-only
    sink would double-count.

    Exactness: identity-grain counts are exact integers; one rate
    division at 6dp.

    Scale: ONE map-side-combinable identity-grain reduction over the
    log (the natural dedup key already co-partitions replays), then a
    |types|-row panel. No windows, no joins."""
    e = load_table(spark, sf_dir, "events")
    g = (
        e.filter(F.col("ts").isNotNull())
        .groupBy("user_id", "event_type", "ts")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    return (
        g.groupBy("event_type")
        .agg(
            F.sum("n").cast("bigint").alias("n_deliveries"),
            F.count("*").cast("bigint").alias("n_distinct_events"),
            F.sum(F.col("n") - 1).cast("bigint").alias("n_redundant"),
            F.round(
                F.sum(F.col("n") - 1).cast("double") / F.sum("n"), 6
            ).alias("dup_rate"),
            F.max("n").cast("bigint").alias("max_copies"),
        )
        .orderBy("event_type")
    )


@register(
    "cdc_schema_drift_audit",
    tags=("cdc", "monitor", "dq"),
    oracle="""
    WITH ks AS (
      SELECT event_type,
             CAST(date_trunc('day', ts) AS TIMESTAMP) AS dy,
             CASE WHEN props IS NULL OR NOT json_valid(props)
                  THEN '<invalid>'
                  ELSE array_to_string(list_sort(json_keys(props)), ',')
             END AS keyset,
             CASE WHEN props IS NULL OR NOT json_valid(props)
                  THEN CAST(0 AS BIGINT)
                  ELSE CAST(len(json_keys(props)) AS BIGINT) END AS n_keys
      FROM events WHERE ts IS NOT NULL
    ),
    var AS (
      SELECT event_type, keyset, any_value(n_keys) AS n_keys,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(count(DISTINCT dy) AS BIGINT) AS n_days,
             min(dy) AS first_seen, max(dy) AS last_seen
      FROM ks GROUP BY 1, 2
    ),
    tot AS (
      SELECT event_type, CAST(sum(n_events) AS BIGINT) AS type_total,
             CAST(max(n_events) AS BIGINT) AS max_n
      FROM var GROUP BY 1
    )
    SELECT v.event_type, v.keyset, v.n_keys, v.n_events, v.n_days,
           v.first_seen, v.last_seen,
           round(CAST(v.n_events AS DOUBLE) / t.type_total, 6) AS share,
           CAST(CASE WHEN v.n_events = t.max_n THEN 1 ELSE 0 END AS BIGINT)
             AS is_dominant
    FROM var v JOIN tot t ON t.event_type = v.event_type
    ORDER BY v.event_type, v.n_events DESC, v.keyset
    """,
)
def cdc_schema_drift_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload-schema drift census per stream (the schema-evolution
    monitor every CDC deployment needs; the reference would silently
    index whatever shape arrives -- ``es_consumer/main.go:66-71`` drops
    only unmarshal failures): each event's JSON payload reduces to its
    SORTED KEY SET, and the audit reports every (event_type, key-set)
    variant with its event/day counts, first/last sighting, share of
    the stream, and a dominant-variant flag -- a new variant appearing
    with a recent first_seen IS the schema change, and a '<invalid>'
    row surfaces undecodable payloads instead of dropping them (the
    dead-letter accounting rule). Complements
    dq_functional_dependency_audit (value-level drift) at the
    STRUCTURAL level.

    Exactness: key sets are engine-sorted string lists joined with ','
    (exact string equality); counts are exact integers; the dominance
    flag compares exact counts (ties all flag, deterministically);
    share divides once at 6dp. Day timestamps, never raw DATE.

    Scale: one scan folds to (type, keyset, day) partials, then
    (type, keyset) grain; the totals join is |types|-grain broadcast;
    |variants| rows out (== |types| on a healthy stream)."""
    e = load_table(spark, sf_dir, "events")
    valid = F.col("props").isNotNull() & (
        F.expr("json_object_keys(props)").isNotNull()
    )
    ks = e.filter(F.col("ts").isNotNull()).select(
        "event_type",
        F.date_trunc("day", "ts").alias("dy"),
        F.when(
            valid,
            F.array_join(F.array_sort(F.expr("json_object_keys(props)")), ","),
        )
        .otherwise(F.lit("<invalid>"))
        .alias("keyset"),
        F.when(valid, F.size(F.expr("json_object_keys(props)")))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("n_keys"),
    )
    var = ks.groupBy("event_type", "keyset").agg(
        F.any_value("n_keys").alias("n_keys"),
        F.count("*").cast("bigint").alias("n_events"),
        F.countDistinct("dy").cast("bigint").alias("n_days"),
        F.min("dy").alias("first_seen"),
        F.max("dy").alias("last_seen"),
    )
    tot = var.groupBy(F.col("event_type").alias("t_type")).agg(
        F.sum("n_events").cast("bigint").alias("type_total"),
        F.max("n_events").cast("bigint").alias("max_n"),
    )
    return (
        var.join(F.broadcast(tot), F.col("t_type") == F.col("event_type"))
        .select(
            "event_type",
            "keyset",
            "n_keys",
            "n_events",
            "n_days",
            "first_seen",
            "last_seen",
            F.round(
                F.col("n_events").cast("double") / F.col("type_total"), 6
            ).alias("share"),
            F.when(F.col("n_events") == F.col("max_n"), 1)
            .otherwise(0)
            .cast("bigint")
            .alias("is_dominant"),
        )
        .orderBy("event_type", F.col("n_events").desc(), "keyset")
    )
