"""Custom stateful streaming operator: continuous latest-state per key
(``applyInPandasWithState``) -- the engine's stateful twin of the batch
latest_state compaction (X1), and the Spark-native replacement for the
reference's per-event ES upsert keyed by LSN (``cmd/es_consumer/main.go:77``).

State per key = the max-LSN row seen so far. Each micro-batch emits only
keys whose state changed -- i.e. a changelog of the materialized view.
Memory is O(keys) on the executors, partitioned by the grouping key, which
is the correct 100 TB posture (state scales out with the cluster, never
through the driver).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "key string, lsn long, op string, payload string"
STATE_SCHEMA = "lsn long, op string, payload string"


def _latest_state_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    best_lsn, best_op, best_payload = state.get if state.exists else (-1, None, None)
    for pdf in pdfs:
        if pdf.empty:
            continue
        i = pdf["lsn"].idxmax()
        if int(pdf.loc[i, "lsn"]) > best_lsn:
            best_lsn = int(pdf.loc[i, "lsn"])
            best_op = pdf.loc[i, "op"]
            best_payload = pdf.loc[i, "payload"]
    changed = (not state.exists) or state.get[0] != best_lsn
    if best_op is not None:
        state.update((best_lsn, best_op, best_payload))
    if changed and best_op is not None:
        yield pd.DataFrame(
            {"key": [key[0]], "lsn": [best_lsn], "op": [best_op], "payload": [best_payload]}
        )


def latest_state_stream(envelope_stream: DataFrame) -> DataFrame:
    """Envelope stream -> changelog of latest-state updates per key.

    Input needs columns (key, lsn, op) plus a JSON ``payload`` column (use
    ``to_json(after)``). Output emits one row per key per micro-batch in
    which that key's state advanced."""
    return (
        envelope_stream.groupBy("key")
        .applyInPandasWithState(
            _latest_state_fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
