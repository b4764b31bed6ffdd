"""Structured Streaming front-end for the anomaly pipeline.

The reference is a batch tool, but it processes sources as streams with
state (SURVEY.md §2.10); this module is the engine-native streaming shape:

- score_stream: readStream -> foreachBatch(enrich + route against the
  broadcast model). Each micro-batch is routed transactionally into the
  sinks; per-group dedup state is scoped to the micro-batch (a stream at
  10^12-turn scale cannot hold the all-time token-set; the batch engine
  remains the source of truth for exact golden parity).
- anomaly_counts_stream: watermarked sliding-window anomaly counts per
  tool — the aggregate stage as a live metric.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F

from . import model as model_mod
from .pipeline import PipelineConfig, enrich, parse, route


def score_stream(
    spark: SparkSession,
    stream_df: DataFrame,
    model_df: DataFrame,
    out_dir: str,
    cfg: PipelineConfig = PipelineConfig(),
    checkpoint_dir: str | None = None,
):
    """Start a streaming query routing each micro-batch of turns.

    stream_df: a streaming DataFrame in the TURNS shape (readStream).
    Returns the StreamingQuery; the sink lands under out_dir/routed,
    partitioned by (epoch_id, route). foreachBatch is at-least-once: a
    crash between the parquet commit and the checkpoint commit log
    replays the epoch, so the write is made IDEMPOTENT by dynamic
    partition overwrite on epoch_id — a replayed epoch replaces its own
    partition instead of appending a duplicate copy (the standard
    foreachBatch exactly-once recipe).
    """
    indexes = model_mod.collect_indexes(model_df)
    bc = model_mod.broadcast_indexes(spark, indexes)

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        parsed = parse(batch_df, cfg)
        # micro-batches are bounded by the trigger; skip the size probe AND
        # the clean/dirty route split (its stats job costs more than the
        # sub-second Arrow volume of a micro-batch saves)
        routed = route(
            enrich(parsed, bc, cfg), cfg, allow_split=False, clean_split=False
        )
        (
            routed.withColumn("epoch_id", F.lit(epoch_id))
            .write.mode("overwrite")
            .partitionBy("epoch_id", "route")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(f"{out_dir}/routed")
        )

    q = (
        stream_df.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir or f"{out_dir}/_checkpoint")
        .trigger(availableNow=True)
        .start()
    )
    return q


def anomaly_counts_stream(
    stream_routed: DataFrame,
    window: str = "5 minutes",
    slide: str = "1 minute",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked windowed anomaly counts per tool over a routed stream."""
    return (
        stream_routed.filter(F.col("route") == "anomaly")
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide), "tool")
        .agg(F.count(F.lit(1)).alias("anomaly_count"))
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "tool",
            "anomaly_count",
        )
    )


# --------------------------------------------------------------------------
# stateful streaming: cross-batch per-conversation anomaly detection
# --------------------------------------------------------------------------

STREAM_ANOMALY_SCHEMA = (
    "conv_id string, turn_idx int, tool string, text string, score float, "
    "before array<string>, after array<string>"
)
_STATE_SCHEMA = "state string"


def stateful_route(
    stream_turns: DataFrame,
    bc_indexes,
    threshold: float = 0.3,
    cfg: PipelineConfig = PipelineConfig(),
    flush_timeout_ms: int | None = None,
):
    """applyInPandasWithState operator: per-conversation rolling state
    (seen token-sets, a <=12-line context tail, the open anomaly awaiting
    after-context) carried ACROSS micro-batches.

    Streaming-native semantics (documented deviation from the batch engine,
    which holds group-level dedup state): dedup scope is the conversation,
    before-context is the last <=3 tail lines (12 when chained within the
    tail), after-context completes in this or the next micro-batch. The
    batch engine remains the source of truth for exact golden parity.

    Quiescence flush: a conversation idle for ``flush_timeout_ms`` of
    processing time is CLOSED — its open anomaly (one still collecting
    after-context at the stream tail) is emitted with the partial context
    and the state removed, so the last anomaly of a stream with no
    successor batch is not lost AND idle conversations don't hold state
    forever (the state-size bound the 100-TB design needs). A turn arriving
    after the flush starts the conversation fresh.

    OPT-IN (default None): an armed processing-time timeout keeps the
    engine scheduling micro-batches until it fires, which never lets
    drain-style runs (availableNow triggers, processAllAvailable) settle —
    so continuous production streams should set it (it is also the state
    bound for idle conversations), while finite drains should leave it
    off."""
    import json

    from .context import BETWEEN_CTX_LENGTH, CTX_LENGTH
    from .model import lookup
    from .tokenizer import dedup_key, process

    thr = np.float32(threshold)

    def fn(key, pdfs, state):
        conv_id = key[0]
        import pandas as _pd

        cols = ["conv_id", "turn_idx", "tool", "text", "score", "before", "after"]
        if state.hasTimedOut:
            # quiescence: emit the open anomaly with its partial
            # after-context and drop the conversation's state
            st = json.loads(state.get[0])
            open_a = st.get("open")
            state.remove()
            # never yield an EMPTY frame: pyspark's state serializer concats
            # the yielded frames, and concatenating empty/all-NA object
            # columns is deprecated pandas behavior (warns today, changes
            # dtype resolution under pandas 3)
            if open_a:
                yield _pd.DataFrame([open_a], columns=cols)
            return
        if state.exists:
            st = json.loads(state.get[0])
        else:
            st = {"seen": [], "tail": [], "open": None, "last_ctx_gap": 10**9}
        seen = set(st["seen"])
        tail = st["tail"]  # [(text)] up to BETWEEN_CTX_LENGTH
        open_a = st["open"]
        gap = st["last_ctx_gap"]
        out_rows = []
        indexes = bc_indexes.value
        # one GLOBAL sort over the group's whole micro-batch: the iterator
        # yields multiple Arrow chunks in arbitrary shuffle order, so
        # sorting each chunk independently (the round-4 review finding)
        # would walk turns out of order across chunk boundaries whenever a
        # conversation's batch data spans more than one chunk
        chunks = [c for c in pdfs if len(c)]
        batch = (
            _pd.concat(chunks, ignore_index=True).sort_values(
                ["turn_idx"], kind="stable"
            )
            if chunks
            else _pd.DataFrame(columns=["conv_id", "turn_idx", "tool", "text"])
        )
        if len(batch):
            for r in batch.itertuples(index=False):
                text = r.text
                # batch-engine parity (enrich is_known / route): rows of
                # tools ABSENT from a multi-index model are "unknown" —
                # excluded from dedup, scoring AND contexts (the batch
                # context walk only sees known rows). lookup's single-index
                # fallback keeps every tool known for one-index models.
                idx = lookup(indexes, r.tool)
                if idx is None:
                    continue
                tokens = process(text)
                k = dedup_key(tokens)
                is_new = k not in seen
                score = np.float32(0.0)
                if is_new:
                    seen.add(k)
                    score = idx.score([tokens])[0]
                is_anomaly = is_new and score > thr
                if is_anomaly:
                    if open_a is not None:
                        out_rows.append(open_a)
                        open_a = None
                    ctx = BETWEEN_CTX_LENGTH if gap < BETWEEN_CTX_LENGTH else CTX_LENGTH
                    open_a = {
                        "conv_id": conv_id,
                        "turn_idx": int(r.turn_idx),
                        "tool": r.tool,
                        "text": text,
                        "score": float(score),
                        "before": tail[-ctx:],
                        "after": [],
                    }
                    gap = 0
                    tail = []
                elif open_a is not None:
                    open_a["after"].append(text)
                    gap = 0
                    if len(open_a["after"]) >= CTX_LENGTH:
                        out_rows.append(open_a)
                        open_a = None
                else:
                    tail = (tail + [text])[-BETWEEN_CTX_LENGTH:]
                    gap += 1
        state.update((json.dumps({
            "seen": sorted(seen),
            "tail": tail,
            "open": open_a,
            "last_ctx_gap": gap if gap < 10**8 else 10**9,
        }),))
        if flush_timeout_ms is not None:
            # re-armed on every batch that carries data for the group; fires
            # on the first batch executed after the idle period
            state.setTimeoutDuration(flush_timeout_ms)
        if out_rows:  # empty yields would hit the deprecated empty-concat
            yield _pd.DataFrame(out_rows, columns=cols)

    return (
        stream_turns.groupBy("conv_id")
        .applyInPandasWithState(
            fn,
            outputStructType=STREAM_ANOMALY_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=(
                "ProcessingTimeTimeout" if flush_timeout_ms is not None
                else "NoTimeout"
            ),
        )
    )
