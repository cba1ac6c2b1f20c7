"""Custom stateful streaming operator: per-conversation running rollup.

The reference's continuous side keeps running state over a topic of
newly indexed documents: ``DaemonStream`` wraps a ``RollupStream`` over
a ``TopicStream`` so each re-execution folds the new documents into the
running aggregate (solr/solrj/.../io/stream/DaemonStream.java,
RollupStream.java, TopicStream.java's checkpointed pull). Spark's
native streaming aggregation covers sum/count shapes; this module is
the CUSTOM-state path the engine exposes for semantics Spark's
built-ins can't express — ``applyInPandasWithState`` with an explicit
per-key state tuple:

- key      = conv_id (one state row per conversation),
- state    = (n_turns, n_tokens, last_turn_idx) — tiny fixed-width
  tuple; Spark's state store checkpoints it per batch (the
  UpdateLog-replay durability analog),
- per batch each key folds only its NEW turns into state and emits one
  updated summary row (outputMode=update).

Scale: state is partitioned by conv_id across executors (state-store
shuffle on the grouping key only); a micro-batch moves each arriving
turn once and each touched conversation's 3-long state row once —
independent of history length. Arrow-batched pandas, no per-row Python.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["conversation_rollup_stream", "ROLLUP_SCHEMA", "STATE_SCHEMA"]

ROLLUP_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("n_turns", LongType()),
        StructField("n_tokens", LongType()),
        StructField("last_turn_idx", IntegerType()),
        StructField("closed", BooleanType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_turns", LongType()),
        StructField("n_tokens", LongType()),
        StructField("last_turn_idx", IntegerType()),
    ]
)


def _row(conv_id, n_turns, n_tokens, last_idx, closed):
    return pd.DataFrame(
        {
            "conv_id": [conv_id],
            "n_turns": [n_turns],
            "n_tokens": [n_tokens],
            "last_turn_idx": [last_idx],
            "closed": [closed],
        }
    )


def _make_update(idle_timeout_ms):
    def _update_conversation(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        if state.hasTimedOut:
            # idle conversation: emit the final CLOSED summary and evict
            # the state row (session-window close analog)
            n_turns, n_tokens, last_idx = state.get
            state.remove()
            yield _row(conv_id, n_turns, n_tokens, last_idx, True)
            return
        n_turns, n_tokens, last_idx = (
            state.get if state.exists else (0, 0, -1)
        )
        for pdf in pdfs:
            n_turns += len(pdf)
            # whitespace token count, vectorized across the Arrow batch
            n_tokens += int(
                pdf["text"].fillna("").str.split().str.len().sum()
            )
            if len(pdf):
                last_idx = max(last_idx, int(pdf["turn_idx"].max()))
        state.update((n_turns, n_tokens, last_idx))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield _row(conv_id, n_turns, n_tokens, last_idx, False)

    return _update_conversation


def conversation_rollup_stream(
    turns: DataFrame, idle_timeout_ms: int | None = None
) -> DataFrame:
    """Continuous per-conversation rollup of a streaming transcript
    source: returns the update-mode stream of summary rows. The caller
    attaches the sink/checkpoint (``writeStream.outputMode('update')``).

    ``idle_timeout_ms``: when set, a conversation idle for that long
    emits one final row with ``closed=True`` and its state is EVICTED —
    the session-window close. Without it, state lives forever (the
    running-rollup daemon mode) and ``closed`` is always False."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return turns.groupBy("conv_id").applyInPandasWithState(
        _make_update(idle_timeout_ms),
        outputStructType=ROLLUP_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
