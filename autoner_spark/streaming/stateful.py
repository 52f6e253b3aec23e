"""Custom stateful streaming operator: per-conversation KG accumulation.

``applyInPandasWithState`` keeps one state row per ``conv_id`` while the
transcript stream flows: the running mention count and the distinct surface
set seen so far. Each micro-batch emits the UPDATED conversations only —
the streaming analogue of the per-conversation entity assembly.

State is bounded by the distinct-surface vocabulary (dictionary-bounded,
not corpus-bounded), so per-conversation state stays small even on
10^12-turn streams; a ProcessingTimeTimeout would evict dormant
conversations in production (kept NoTimeout here for determinism).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "conv_id string, n_mentions long, n_distinct_surfaces long"
)
STATE_SCHEMA = "surfaces array<string>, n_mentions long"


def _accumulate(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (conv_id,) = key
    if state.exists:
        surfaces_list, n = state.get
        surfaces = set(surfaces_list)
    else:
        surfaces, n = set(), 0
    for pdf in pdfs:
        n += len(pdf)
        surfaces.update(pdf["surface"])
    state.update((sorted(surfaces), n))
    yield pd.DataFrame(
        [{
            "conv_id": conv_id,
            "n_mentions": n,
            "n_distinct_surfaces": len(surfaces),
        }]
    )


def conversation_state(mentions_stream: DataFrame) -> DataFrame:
    """mentions stream -> per-conversation running totals (update mode)."""
    return mentions_stream.groupBy("conv_id").applyInPandasWithState(
        _accumulate,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
