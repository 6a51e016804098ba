"""CDC-derived batch operators (SURVEY.md §2.2 X1-X2 + R3/R4/R13/R20 analogues).

The reference pipeline's sink exists so change data can be *queried*
(Kibana over ``cdc_*`` indices, reference ``README.md:189-194``). These are
those queries, expressed over the ``events`` fixture (the change-log
stand-in: ``event_id`` is the LSN ordinal, ``user_id`` the row key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


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
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           json_extract_string(props, '$.k') AS k_raw
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
        F.get_json_object("props", "$.k").cast("long").alias("k"),
        F.get_json_object("props", "$.k").alias("k_raw"),
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
