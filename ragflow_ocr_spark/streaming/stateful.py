"""Custom stateful streaming operator — ``applyInPandasWithState``.

The reference engine has no streaming state (SURVEY.md §2.10); this is
the Spark-idiomatic surface a continuous crawl-ingest deployment uses
for per-key accumulators that must survive micro-batches AND restarts
(state lives in the stream checkpoint): per-user running event totals
here; per-domain crawl budgets / rate counters in production.

Scale notes:
- state is partitioned by the group key → one shuffle per micro-batch
  on user_id, state store sized by #distinct keys, not #events;
- the handler receives an iterator of Arrow-backed pandas frames per
  key (no per-row Python);
- NoTimeout: totals are cumulative forever; a TTL deployment would use
  ProcessingTimeTimeout and drop idle keys.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def running_user_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: Any
) -> Iterator[pd.DataFrame]:
    """Accumulate (count, sum(value)) per user across micro-batches.
    Emits the running total once per key per micro-batch (update-mode
    semantics)."""
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {
            "user_id": [int(key[0])],
            "n_events": [int(n)],
            "total_value": [round(total, 6)],
        }
    )


def stream_user_totals(events):
    """events stream (user_id, value, ...) → running totals stream."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("user_id").applyInPandasWithState(
        running_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
