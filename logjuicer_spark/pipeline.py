"""The parse -> enrich -> route -> aggregate pipeline.

Spark-first realization of the reference's report flow
(/root/reference/crates/model/src/model.rs:601-751 + process.rs:126-436),
per SURVEY.md §3 E1/E2:

  parse:    sub-line explode + length cap + tokenize (pandas UDF) +
            JVM-side dedup key + ignore predicate
  enrich:   (a) per-(group, token-set) first-occurrence winners via a
            partial-aggregatable groupBy (NOT a window: hot token-sets
            would serialize a window sort; min-struct combines map-side),
            (b) winners scored against the broadcast baseline index,
            (c) scores joined back on (group, dkey) -- AQE handles skew
            and broadcasts the scored side when small,
            (d) global-dedup winners (anomalous token-sets) broadcast-joined
  route:    groupBy(conv_id) -> applyInPandas running the exact
            chunk/context emulation (context.py); fan-out anomalous vs
            normal vs unknown rows
  aggregate: per-conv and per-tool counts, mean distances, score histogram

Scale notes (the 100 TB design point):
- every aggregation here partial-aggregates map-side; the only wide
  exchanges are (tool, dkey) for dedup/enrich and conv_id for contexts
- if the input table is bucketed/sorted by conv_id (Iceberg bucket
  transform), the route shuffle disappears via storage-partitioned join
- extremely long conversations are the residual skew for the route stage
  (one conversation = one task by default). Measured: a 1M-turn
  conversation routes in-task without stalling the stage (BENCH.md);
  conversation-level bucketing with checkpoints lives in
  lineage.run_routed_with_resume. Conversations above cfg.max_task_lines
  are split into chunk-aligned ranges with a PAD_LINES-line replicated
  tail per range (the reference's left_overs generalized to boundary
  padding) and processed by independent tasks — exact by construction
  (context.find_anomalies_ranged) and golden/fuzz-tested against the
  single-task path (tests/test_route_split.py)
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from .context import find_anomalies
from .hashing import THRESHOLD
from .schemas import ROUTED
from .score import SCORED_SCHEMA, make_score_fn
from .tokenizer import tokenize_udf
from . import model as model_mod


@dataclass(frozen=True)
class PipelineConfig:
    group_col: str = "tool"
    ignore_patterns: tuple = ()
    skip_duplicate: bool = True  # config.rs:168-172 (default true)
    explode_sublines: bool = True
    max_line_bytes: int = 6000  # iterator.rs:155-157
    threshold: float = 0.3  # process.rs:20
    # parse timestamps from the text (W3 backfill semantics) instead of the
    # native ts column -- for ts-less sources
    parse_timestamps: bool = False
    # F5 self-reference cut (process.rs:256-258): stop processing a
    # conversation at the first line containing this marker
    self_ref_marker: str | None = None
    # S2/S3: 'text' uses the JVM regex sub-line split; 'json'/'xml' run the
    # exact reader automaton (splitter.py) as a pandas UDF
    file_type: str = "text"
    # route-stage skew escape hatch: conversations with more than this many
    # parsed lines are split into chunk-aligned ranges processed by
    # independent tasks (exact — golden/fuzz-tested against the single-task
    # path). None disables splitting.
    max_task_lines: int | None = 4_000_000


# --------------------------------------------------------------------------
# parse
# --------------------------------------------------------------------------

# literal \n sub-line separator (iterator.rs:255-261: Sep::SubLine only for
# an escaped 'n' — literal \r is NOT a separator there) plus real newlines.
# Deliberate transcript-world deviation: real \r / \r\n inside a turn's text
# are treated as line boundaries too (the reference reads files, where a
# bare \r stays inside the line).
_SUBLINE_SEP = "(?<!\\\\)\\\\n|\r\n|\n|\r"


def parse(
    turns: DataFrame,
    cfg: PipelineConfig = PipelineConfig(),
    columns: str = "full",
) -> DataFrame:
    """Project the turns table to sub-line grain with tokens + dedup key.

    ``columns`` picks how much derived text data rides on every row:

    - ``"full"`` (default, the public surface): tokens (pandas UDF) and the
      JVM-computed dkey — what the entry queries and their oracles stage.
    - ``"dkey"``: ONE fused pandas UDF emits the dedup key directly and no
      per-row tokens column exists. Downstream (enrich/train) recomputes
      the few winner rows' tokens from their text — exact because
      tokenizer.process is a pure per-line function. This is the flagship
      path: per row it saves the tokens Arrow transfer, the JVM
      split/array_sort dkey pass and the checkpoint's tokens column — the
      parse-stage Arrow round-trip named by the round-4 scaling analysis.
    - ``"light"``: no tokenize at all (the errors entry point classifies
      lines with its own FSM and never reads tokens/dkey).
    """
    if columns not in ("full", "dkey", "light"):
        raise ValueError(f"unknown parse columns mode: {columns!r}")
    df = turns
    if cfg.explode_sublines and cfg.file_type != "text":
        from .splitter import split_udf

        df = (
            df.withColumn("_parts", split_udf(cfg.file_type)(F.col("text")))
            .select(
                "conv_id", "turn_idx", "role", "tool", "ts",
                F.explode("_parts").alias("_p"),
            )
            .select(
                "conv_id", "turn_idx", "role", "tool", "ts",
                F.col("_p.sub").alias("sub_idx"),
                F.col("_p.piece").alias("text"),
            )
        )
    elif cfg.explode_sublines:
        stripped = F.regexp_replace("text", "(\r\n|\n|\r)$", "")
        df = (
            df.withColumn("_parts", F.split(stripped, _SUBLINE_SEP))
            .select(
                "conv_id",
                "turn_idx",
                "role",
                "tool",
                "ts",
                F.posexplode("_parts").alias("sub_idx", "text"),
            )
        )
    else:
        df = df.select(
            "conv_id", "turn_idx", "role", "tool", "ts",
            F.lit(0).alias("sub_idx"), "text",
        )
    # max line length: longer lines are dropped entirely (iterator.rs:155-157);
    # empty lines are dropped too but keep their line number
    # (iterator.rs:236-241: `if res.is_empty() { self.get_slice() }`)
    df = df.filter(
        (F.octet_length("text") <= cfg.max_line_bytes) & (F.length("text") > 0)
    )

    if cfg.ignore_patterns:
        ignored = None
        for p in cfg.ignore_patterns:
            m = F.regexp_like("text", F.lit(p))
            ignored = m if ignored is None else (ignored | m)
        df = df.withColumn("is_ignored", ignored)
    else:
        df = df.withColumn("is_ignored", F.lit(False))

    if cfg.self_ref_marker:
        # F5: drop the marker line and everything after it, per conversation.
        # The marker dim has one row per conversation CONTAINING the marker —
        # usually rare, but a corpus where most conversations contain it makes
        # the dim |convs|-sized, so no STATIC broadcast hint is placed: an
        # unconditional hint could OOM executors, and a count-guard here would
        # run a Spark job at plan-construction time (illegal under streaming
        # composition, surprising for lazy callers — the same reasoning that
        # made route()'s clean split opt-in). The join stays unhinted: with
        # AQE on (the big path) runtime stats convert it to a broadcast join
        # when the dim is small; with AQE off (the small path) the input is
        # small by definition and the shuffle join is cheap. parse() runs
        # ZERO Spark jobs at plan time (asserted by test_round3_fixes).
        marker_pos = (
            df.filter(F.col("text").contains(cfg.self_ref_marker))
            .groupBy(F.col("conv_id").alias("_m_conv"))
            .agg(
                F.min(F.struct("turn_idx", "sub_idx")).alias("_m"),
            )
        )
        df = (
            df.join(marker_pos, df["conv_id"] == F.col("_m_conv"), "left")
            .filter(
                F.col("_m_conv").isNull()
                | (F.struct("turn_idx", "sub_idx") < F.col("_m"))
            )
            .drop("_m_conv", "_m")
        )

    if columns == "full":
        df = df.withColumn("tokens", tokenize_udf()(F.col("text")))
        # unordered dedup key (unordered.rs:9-22), computed JVM-side:
        # sorted non-%-prefixed words
        df = df.withColumn(
            "dkey",
            F.array_join(
                F.array_sort(
                    F.filter(
                        F.split("tokens", " "),
                        lambda w: ~w.startswith("%"),
                    )
                ),
                " ",
            ),
        )
    elif columns == "dkey":
        from .tokenizer import dkey_of_text_udf

        df = df.withColumn("dkey", dkey_of_text_udf()(F.col("text")))
    return df


# --------------------------------------------------------------------------
# enrich
# --------------------------------------------------------------------------


def _skey():
    """Sortable single-string encoding of (conv_id, turn_idx, sub_idx):
    lexicographic order of skey == tuple order (\\x00 sorts below every
    other byte; indices zero-padded). One orderable value serves the
    first-occurrence min/min_by aggregations, the is_target equality probe
    and the global-dedup comparison. The winners aggregation compiles to a
    partial SortAggregate (string agg buffers are not HashAggregate-
    mutable) — the scale property that matters is the MAP-SIDE COMBINE:
    duplicate token-sets collapse before the shuffle, unlike a row_number
    window which would ship and sort every raw row (see PLANS.md)."""
    return F.concat_ws(
        "\x00",
        "conv_id",
        F.lpad(F.col("turn_idx").cast("string"), 10, "0"),
        F.lpad(F.col("sub_idx").cast("string"), 6, "0"),
    )


# scored dims smaller than this are broadcast to kill the probe-side shuffle
_BROADCAST_SCORED_ROWS = 1_000_000


def _dirty_ids_collected(scored: DataFrame, cfg: "PipelineConfig", n_winners: int | None):
    """Driver-collected twin of _dirty_conv_dim (round 6): when the scored
    relation is PROVABLY tiny (bounded by the caller-known winners count),
    one collect of (skey, score) yields the dirty-conversation ids AND
    their count — replacing two scheduled jobs (the dim's distinct +
    count) with a single action over the persisted 20-odd rows. The
    threshold comparison is the same f32-literal-promoted-to-f64 test the
    relational dim uses. Returns the sorted id list, or None when the
    bound is unknown/too large (the relational path then applies)."""
    if n_winners is None or n_winners > 100_000:
        return None
    thr = float(np.float32(cfg.threshold))
    rows = scored.select("skey", "score").collect()
    return sorted(
        {
            r["skey"].split("\x00", 1)[0]
            for r in rows
            if r["score"] is not None and r["score"] > thr
        }
    )


def _dirty_conv_dim(scored: DataFrame, cfg: "PipelineConfig") -> DataFrame:
    """Conversations containing an anomalous target row, derived from the
    scored winners alone: a conv is dirty iff an anomalous winner's first
    occurrence lives in it, and the winner's skey ENCODES that
    conversation (_skey's \\x00 separator). The f32 threshold literal
    matches enrich's gl filter and _route_single's anom_row exactly —
    this single definition is load-bearing for route-strategy
    correctness, so both run() paths (and the regression tests) share
    it."""
    return (
        scored.filter(F.col("score") > float(np.float32(cfg.threshold)))
        .select(F.substring_index("skey", "\x00", 1).alias("conv_id"))
        .distinct()
    )

# persisted scored dims awaiting release (run() unpersists after its sinks
# are written; long sessions running many queries would otherwise
# accumulate executor cache)
_SCORED_REFS: list = []


def release_stage_caches():
    while _SCORED_REFS:
        try:
            _SCORED_REFS.pop().unpersist()
        except Exception:
            pass


def _winners_raw(parsed: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """The per-(group, dkey) first-occurrence winners aggregation over
    non-ignored rows WITHOUT the is_known row filter.

    ``tool`` is a group key of the aggregation, so filtering the aggregated
    winners by group membership afterwards is row-for-row identical to
    filtering the input rows first — which lets this full-scan aggregation
    (the expensive half of enrich) run BEFORE the model (and with it the
    known-group set) exists, overlapped with training on the parse thread
    (round 6; guide §2.6 overlap-independent-jobs)."""
    group = cfg.group_col
    eligible = parsed.filter(~F.col("is_ignored")).withColumn("_skey", _skey())
    if "tokens" in parsed.columns:
        return eligible.groupBy(F.col(group).alias("tool"), "dkey").agg(
            F.min("_skey").alias("skey"),
            F.min_by("tokens", "_skey").alias("tokens"),
        )
    return eligible.groupBy(F.col(group).alias("tool"), "dkey").agg(
        F.min("_skey").alias("skey"),
        F.min_by("text", "_skey").alias("wtext"),
    )


def enrich(
    parsed: DataFrame,
    bc_indexes,
    cfg: PipelineConfig = PipelineConfig(),
    count_scored: bool = True,
    model_df: DataFrame | None = None,
    return_scored: bool = False,
    winners: DataFrame | None = None,
    n_winners: int | None = None,
):
    """Attach is_known / is_target / score / emit_ok to every parsed row.

    Scoring path: with bc_indexes (the collected {group: SparseIndex}
    broadcast), the Arrow-batched numpy kernel runs per executor — right
    whenever the model fits one process's RAM. With bc_indexes=None and
    model_df set, scoring runs as the distributed join formulation
    (score.score_winners_distributed) — the escape hatch when the model
    exceeds the driver-collect budget (run() falls back automatically).

    ``return_scored=True`` returns (enriched, scored): the tiny persisted
    scored-winners dim doubles as the route stage's dirty-conversation
    oracle (the winner's skey encodes its conversation), sparing route a
    full enriched re-scan just to pick its strategy."""
    group = cfg.group_col
    if bc_indexes is not None:
        # collected-model path: the keys are already on the driver, so the
        # isin predicate is free (and prunable at the scan)
        known_keys = list(bc_indexes.value.keys())
        single_index = len(known_keys) == 1  # lookup_or_single, model.rs:857-869
        is_known = F.lit(True) if single_index else F.col(group).isin(known_keys)
        parsed = parsed.withColumn("is_known", is_known)
    else:
        if model_df is None:
            raise ValueError("enrich needs bc_indexes or model_df")
        # distributed-model path: the group dim is unbounded in principle, so
        # never collect it — tag membership via a broadcast join on the dim
        # (a million-group model would bloat an isin predicate into the plan
        # itself). The dim is PERSISTED: its lineage is the whole train DAG,
        # which the single-index probe and every broadcast build downstream
        # would otherwise re-run per action (released with the stage caches).
        groups = model_df.select("group_key").distinct().persist()
        _SCORED_REFS.append(groups)
        single_index = groups.count() == 1  # model.rs:857-869
        if single_index:
            parsed = parsed.withColumn("is_known", F.lit(True))
        else:
            known_dim = F.broadcast(
                groups.select(F.col("group_key").alias("_known_g"))
            )
            parsed = (
                parsed.join(known_dim, parsed[group] == F.col("_known_g"), "left")
                .withColumn("is_known", F.col("_known_g").isNotNull())
                .drop("_known_g")
            )
    parsed = parsed.withColumn("_skey", _skey())

    if winners is None:
        eligible = parsed.filter(F.col("is_known") & ~F.col("is_ignored"))
        if "tokens" in parsed.columns:
            winners = (
                eligible.groupBy(F.col(group).alias("tool"), "dkey")
                .agg(
                    F.min("_skey").alias("skey"),
                    F.min_by("tokens", "_skey").alias("tokens"),
                )
            )
        else:
            # fused-dkey parse mode: rows carry no tokens — the winner's TEXT
            # rides out of the aggregation as ``wtext`` and the scoring UDF
            # tokenizes it in-batch (score._token_lines): winner tokens never
            # cross Arrow and no extra Python stage exists. Exact: process()
            # is a pure per-line function, so tokenizing the min-skey row's
            # text reproduces the tokens min_by would have kept.
            winners = eligible.groupBy(F.col(group).alias("tool"), "dkey").agg(
                F.min("_skey").alias("skey"),
                F.min_by("text", "_skey").alias("wtext"),
            )
    elif not single_index:
        # caller-precomputed _winners_raw (no is_known row filter): apply
        # the group-membership filter on the aggregated winners instead —
        # identical rows, because tool is a group key of the aggregation
        if bc_indexes is not None:
            winners = winners.filter(F.col("tool").isin(known_keys))
        else:
            known_dim = F.broadcast(
                groups.select(F.col("group_key").alias("_kw_g"))
            )
            winners = winners.join(
                known_dim, winners["tool"] == F.col("_kw_g"), "left_semi"
            )
    if bc_indexes is not None:
        scored = winners.mapInPandas(make_score_fn(bc_indexes), SCORED_SCHEMA)
    else:
        from .score import score_winners_distributed

        scored = score_winners_distributed(winners, model_df, single_index)
    scored = scored.persist()
    _SCORED_REFS.append(scored)
    # with count_scored=False (small inputs) we broadcast unconditionally;
    # a caller-known winners count is a valid UPPER bound on |scored|
    # (the is_known filter only removes rows), so the broadcast guard can
    # use it without paying a separate count job — scored then
    # materializes at its first consumer (the dirty-conv dim count)
    if n_winners is not None:
        n_scored = n_winners
    else:
        n_scored = scored.count() if count_scored else 0

    scored_sel = scored.select(
        F.col("tool").alias("_w_tool"),
        F.col("dkey").alias("_w_dkey"),
        F.col("skey").alias("_w_skey"),
        "score",
    )
    if n_scored < _BROADCAST_SCORED_ROWS:
        scored_sel = F.broadcast(scored_sel)
    j = parsed.join(
        scored_sel,
        on=[
            parsed[group] == F.col("_w_tool"),
            parsed["dkey"] == F.col("_w_dkey"),
        ],
        how="left",
    ).drop("_w_tool", "_w_dkey")
    j = j.withColumn(
        "is_target",
        F.col("is_known") & ~F.col("is_ignored") & (F.col("_skey") == F.col("_w_skey")),
    ).drop("_w_skey")

    if cfg.skip_duplicate:
        # global dedup dim: first anomalous occurrence of each token-set
        # across ALL groups (gl_skip_lines, model.rs:606,634; process.rs:359-363).
        # |gl| <= |scored| (filter + groupBy over scored), so the scored-dim
        # count guard covers it too: under the threshold we broadcast; above
        # it (an anomaly storm / bad baseline could make gl arbitrarily
        # large) fall back to a shuffle join instead of OOMing the driver.
        gl = (
            scored.filter(F.col("score") > float(np.float32(cfg.threshold)))
            .groupBy("dkey")
            .agg(F.min("skey").alias("_g_skey"))
            .withColumnRenamed("dkey", "_g_dkey")
        )
        if n_scored < _BROADCAST_SCORED_ROWS:
            gl = F.broadcast(gl)
        j = j.join(gl, j["dkey"] == F.col("_g_dkey"), "left")
        j = j.withColumn(
            "emit_ok",
            F.col("_g_dkey").isNull() | (F.col("_skey") == F.col("_g_skey")),
        ).drop("_g_dkey", "_g_skey")
    else:
        j = j.withColumn("emit_ok", F.lit(True))
    out = j.drop("_skey")
    return (out, scored) if return_scored else out


# --------------------------------------------------------------------------
# route
# --------------------------------------------------------------------------

_ROUTE_COLS = [
    "conv_id", "turn_idx", "sub_idx", "role", "tool", "ts", "text",
    "is_ignored", "is_known", "is_target", "score", "emit_ok",
]


def _assemble_conv(pdf: pd.DataFrame, threshold: float, parse_ts: bool = False) -> pd.DataFrame:
    # fast path: conversations with no anomalous target line (the vast
    # majority) have a row-wise independent output — no sort, no context
    # walk, no frame copies. ~8x cheaper per group, which dominates the
    # route stage's wall time at driver scale.
    known_all = pdf["is_known"].to_numpy(dtype=bool)
    tgt_all = pdf["is_target"].to_numpy(dtype=bool) & known_all
    sc_all = pdf["score"].to_numpy(dtype="float32", na_value=np.nan)
    sc_zeroed = np.where(np.isnan(sc_all), np.float32(0.0), sc_all).astype(np.float32)
    if not (sc_zeroed[tgt_all] > np.float32(threshold)).any():
        n = len(pdf)
        out = pd.DataFrame(
            {c: pdf[c] for c in ("conv_id", "turn_idx", "sub_idx", "role", "tool", "ts", "text")}
        )
        if parse_ts:
            out["ts"] = pd.NaT
        out["route"] = np.where(known_all, "normal", "unknown")
        out["score"] = np.where(tgt_all, sc_all, np.nan).astype("float32")
        out["before"] = [None] * n
        out["after"] = [None] * n
        return out

    pdf = pdf.sort_values(["turn_idx", "sub_idx"], kind="stable").reset_index(drop=True)
    n = len(pdf)
    route = np.full(n, "normal", dtype=object)
    known = pdf["is_known"].to_numpy(dtype=bool)
    route[~known] = "unknown"
    before = [None] * n
    after = [None] * n
    scores_out = pdf["score"].to_numpy(dtype="float32", na_value=np.nan).copy()
    scores_out[~(pdf["is_target"].to_numpy(dtype=bool))] = np.nan

    proc = np.flatnonzero(known)
    ts_overrides: dict = {}
    if len(proc):
        sub = pdf.iloc[proc]
        tgt = sub["is_target"].to_numpy(dtype=bool)
        sc = sub["score"].to_numpy(dtype="float32", na_value=np.nan)
        sc = np.where(np.isnan(sc), np.float32(0.0), sc).astype(np.float32)
        if (sc[tgt] > np.float32(threshold)).any():
            anomalies = find_anomalies(
                sub["text"].tolist(),
                sub["turn_idx"].to_numpy(),
                sub["is_ignored"].to_numpy(dtype=bool),
                tgt,
                sc,
                sub["emit_ok"].to_numpy(dtype=bool),
                parse_ts=parse_ts,
                threshold=np.float32(threshold),
            )
            for a in anomalies:
                gi = proc[a["idx"]]
                route[gi] = "anomaly"
                before[gi] = a["before"]
                after[gi] = a["after"]
                if parse_ts:
                    ms = a.get("timestamp_ms")
                    ts_overrides[gi] = (
                        pd.Timestamp(ms, unit="ms") if ms is not None else pd.NaT
                    )

    out = pdf[["conv_id", "turn_idx", "sub_idx", "role", "tool", "ts", "text"]].copy()
    if parse_ts:
        out["ts"] = pd.NaT
        for gi, ts_val in ts_overrides.items():
            out.loc[gi, "ts"] = ts_val
    out["route"] = route
    out["score"] = scores_out
    out["before"] = before
    out["after"] = after
    return out


def _assemble_region(pdf: pd.DataFrame, threshold: float, parse_ts: bool = False) -> pd.DataFrame:
    """Vectorized _assemble_conv over a REGION of whole conversations
    (rows grouped by conv_id and sorted by (turn_idx, sub_idx) within each
    — exactly what _apply_per_conv's exchange+sort guarantees).

    Round-6 realization of the round-5 verdict's top ask: the per-conv
    python loop (one pandas groupby split + frame build per conversation)
    was the route stage's dominant cost at 16M turns. Here the row-wise
    output (route label, score masking, null contexts) is computed ONCE
    over the whole Arrow batch with numpy; only conversations that
    actually contain an anomalous target row run the sequential 3/12
    context walk (find_anomalies), writing into the region-level arrays
    at their row offsets. Row-for-row identical to concatenating
    _assemble_conv per conversation (pinned by
    tests/test_round6_opt.py::test_assemble_region_equals_per_conv and
    the context fuzz suites)."""
    n = len(pdf)
    conv = pdf["conv_id"].to_numpy()
    known = pdf["is_known"].to_numpy(dtype=bool)
    tgt = pdf["is_target"].to_numpy(dtype=bool) & known
    sc = pdf["score"].to_numpy(dtype="float32", na_value=np.nan)
    sc0 = np.where(np.isnan(sc), np.float32(0.0), sc).astype(np.float32)
    anom = tgt & (sc0 > np.float32(threshold))

    out = pd.DataFrame(
        {c: pdf[c] for c in ("conv_id", "turn_idx", "sub_idx", "role", "tool", "ts", "text")}
    )
    if parse_ts:
        out["ts"] = pd.NaT
    route = np.where(known, "normal", "unknown").astype(object)
    scores_out = np.where(tgt, sc, np.nan).astype("float32")
    before = [None] * n
    after = [None] * n

    if anom.any():
        starts = np.flatnonzero(np.r_[True, conv[1:] != conv[:-1]])
        ends = np.r_[starts[1:], n]
        dirty = np.logical_or.reduceat(anom, starts)
        texts_all = pdf["text"].tolist()
        ign_all = pdf["is_ignored"].to_numpy(dtype=bool)
        tidx_all = pdf["turn_idx"].to_numpy()
        emit_all = pdf["emit_ok"].to_numpy(dtype=bool)
        for ci in np.flatnonzero(dirty):
            lo, hi = int(starts[ci]), int(ends[ci])
            proc = lo + np.flatnonzero(known[lo:hi])
            # dirty => an anomalous row exists and is known by definition,
            # so proc is non-empty and the walk has work
            anomalies = find_anomalies(
                [texts_all[i] for i in proc],
                tidx_all[proc],
                ign_all[proc],
                tgt[proc],
                sc0[proc],
                emit_all[proc],
                parse_ts=parse_ts,
                threshold=np.float32(threshold),
            )
            for a in anomalies:
                gi = int(proc[a["idx"]])
                route[gi] = "anomaly"
                before[gi] = a["before"]
                after[gi] = a["after"]
                if parse_ts:
                    ms = a.get("timestamp_ms")
                    out.iloc[gi, out.columns.get_loc("ts")] = (
                        pd.Timestamp(ms, unit="ms") if ms is not None else pd.NaT
                    )
    out["route"] = route
    out["score"] = scores_out
    out["before"] = before
    out["after"] = after
    return out


# slim anomaly relation emitted by the decision-only route walk
_ANOM_SCHEMA = (
    "conv_id string, turn_idx int, sub_idx int, before array<string>, "
    "after array<string>, ts_ms long"
)
# python-input columns the walk actually reads (guide §4: pass only what
# the function needs — role/tool/ts ride through the JVM side only)
_WALK_COLS = [
    "conv_id", "turn_idx", "sub_idx", "text",
    "is_ignored", "is_known", "is_target", "score", "emit_ok",
]


def _anomalies_region(pdf: pd.DataFrame, threshold: float, parse_ts: bool = False) -> pd.DataFrame:
    """Decision-only twin of _assemble_region: run the context walk over a
    region of whole conversations and emit ONLY the anomaly rows (key +
    contexts + optional parsed timestamp). The row-wise remainder of the
    routed output (normal/unknown labels, score masking, passthrough
    columns) is reconstructed JVM-side by _route_single's dense path via a
    broadcast join — the guide §8 shape: the heavy rows cross the Python
    boundary once (inbound, slim columns) and only decisions come back."""
    conv = pdf["conv_id"].to_numpy()
    known = pdf["is_known"].to_numpy(dtype=bool)
    tgt = pdf["is_target"].to_numpy(dtype=bool) & known
    sc = pdf["score"].to_numpy(dtype="float32", na_value=np.nan)
    sc0 = np.where(np.isnan(sc), np.float32(0.0), sc).astype(np.float32)
    anom = tgt & (sc0 > np.float32(threshold))
    cols = ["conv_id", "turn_idx", "sub_idx", "before", "after", "ts_ms"]
    if not anom.any():
        return pd.DataFrame(columns=cols)
    n = len(pdf)
    starts = np.flatnonzero(np.r_[True, conv[1:] != conv[:-1]])
    ends = np.r_[starts[1:], n]
    dirty = np.logical_or.reduceat(anom, starts)
    texts_all = pdf["text"].tolist()
    ign_all = pdf["is_ignored"].to_numpy(dtype=bool)
    tidx_all = pdf["turn_idx"].to_numpy()
    sidx_all = pdf["sub_idx"].to_numpy()
    emit_all = pdf["emit_ok"].to_numpy(dtype=bool)
    rows = []
    for ci in np.flatnonzero(dirty):
        lo, hi = int(starts[ci]), int(ends[ci])
        proc = lo + np.flatnonzero(known[lo:hi])
        anomalies = find_anomalies(
            [texts_all[i] for i in proc],
            tidx_all[proc],
            ign_all[proc],
            tgt[proc],
            sc0[proc],
            emit_all[proc],
            parse_ts=parse_ts,
            threshold=np.float32(threshold),
        )
        cid = conv[lo]
        for a in anomalies:
            gi = int(proc[a["idx"]])
            rows.append(
                (
                    cid,
                    int(tidx_all[gi]),
                    int(sidx_all[gi]),
                    a["before"],
                    a["after"],
                    a.get("timestamp_ms") if parse_ts else None,
                )
            )
    return pd.DataFrame(rows, columns=cols)


def _apply_per_conv(sel: DataFrame, fn, schema, region_fn=None) -> DataFrame:
    """Per-conversation pandas processing without one-python-call-per-group.

    groupBy().applyInPandas ships ONE pandas frame per conversation into
    Python — at transcript scale that is millions of tiny (hundreds-of-rows)
    frames, and the per-call overhead (frame construction, serializer
    round-trip) dominates the stage (round-5 stage attribution: route_write
    31s of an 89s wall at 16M/local[32], most of it per-group overhead on
    ~40k 200-row conversations). This helper keeps the IDENTICAL exchange
    + sort plan shape (hash repartition on conv_id, in-partition sort —
    exactly what FlatMapGroupsInPandas requires anyway) but runs
    mapInPandas over full-size Arrow batches: each batch is cut at the last
    conversation boundary, whole conversations are processed with the same
    per-conv fn, and the partial tail conversation carries into the next
    batch of the SAME partition (partition-local carry state is legal —
    the iterator sees one partition's batches in order). Memory bound:
    carry <= one conversation (the monster-conversation split keeps
    conversations under cfg.max_task_lines before they reach here)."""

    # Require (not force) hash distribution by conv_id + in-partition sort:
    # a window over conv_id carries exactly the ClusteredDistribution +
    # ordering requirement that groupBy().applyInPandas had, so
    # EnsureRequirements inserts the exchange ONLY when the child isn't
    # already partitioned that way — a conv_id-bucketed table (the Iceberg
    # bucket-transform design, test_bucketing) keeps its shuffle-free plan,
    # which a bare repartition(col) would have destroyed (it is an
    # unconditional exchange). The _rn filter is a tautology whose only job
    # is to keep the column referenced so column pruning cannot drop the
    # window (and with it the distribution requirement).
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx", "sub_idx")
    rep = (
        sel.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") >= 1)
        .drop("_rn")
    )

    def run(batches):
        # the tail (possibly incomplete) conversation is buffered as a LIST
        # of frame slices and concatenated ONCE when it completes: a
        # per-batch concat of the carry would copy a many-batch
        # conversation O(n_batches) times — quadratic on a monster
        # conversation spanning hundreds of Arrow batches (measured ~1.6x
        # on the 1M-turn single-task monster bench)
        parts: list = []
        tail_conv = None

        def emit(region: pd.DataFrame):
            if region_fn is not None:
                out = region_fn(region)
                if len(out):
                    yield out
                return
            outs = [
                fn(g) for _, g in region.groupby("conv_id", sort=False)
            ]
            outs = [o for o in outs if len(o)]
            if outs:
                yield pd.concat(outs, ignore_index=True) if len(outs) > 1 else outs[0]

        def flush_tail():
            whole = (
                pd.concat(parts, ignore_index=True)
                if len(parts) > 1
                else parts[0]
            )
            # a single completed conversation is a valid region
            out = region_fn(whole) if region_fn is not None else fn(whole)
            if len(out):
                yield out

        for pdf in batches:
            if len(pdf) == 0:
                continue
            conv = pdf["conv_id"].to_numpy()
            start = 0
            if parts:
                if conv[0] == tail_conv:
                    neq = np.flatnonzero(conv != tail_conv)
                    if len(neq) == 0:
                        parts.append(pdf)  # whole batch continues the conv
                        continue
                    start = int(neq[0])
                    parts.append(pdf.iloc[:start])
                yield from flush_tail()
                parts, tail_conv = [], None
            sub_conv = conv[start:]
            n_tail = int((sub_conv == sub_conv[-1]).sum())
            cut = len(pdf) - n_tail
            if cut > start:
                yield from emit(pdf.iloc[start:cut])
            parts = [pdf.iloc[cut:]]
            tail_conv = conv[-1]
        if parts:
            yield from flush_tail()

    return rep.mapInPandas(run, schema=schema)


def _route_dense_slim(sel: DataFrame, threshold: float, parse_ts: bool) -> DataFrame:
    """Anomaly-dense route with decision-only Python output (guide §8):
    the per-conversation walk reads only _WALK_COLS and emits only the
    anomaly rows; passthrough columns and the normal/unknown labels are
    attached JVM-side via a broadcast join on (conv, turn, sub). The
    caller guarantees the anomaly relation is broadcastable (anomalies
    are a subset of the winners, whose count it checked)."""
    anom = _apply_per_conv(
        sel.select(*_WALK_COLS),
        None,
        _ANOM_SCHEMA,
        region_fn=lambda g: _anomalies_region(g, threshold, parse_ts),
    )
    a = F.broadcast(
        anom.select(
            F.col("conv_id").alias("_a_conv"),
            F.col("turn_idx").alias("_a_turn"),
            F.col("sub_idx").alias("_a_sub"),
            F.col("before").alias("_a_before"),
            F.col("after").alias("_a_after"),
            F.col("ts_ms").alias("_a_ts"),
        )
    )
    j = sel.join(
        a,
        on=[
            sel["conv_id"] == F.col("_a_conv"),
            sel["turn_idx"] == F.col("_a_turn"),
            sel["sub_idx"] == F.col("_a_sub"),
        ],
        how="left",
    )
    matched = F.col("_a_conv").isNotNull()
    ts_col = (
        F.when(matched, F.timestamp_millis(F.col("_a_ts")))
        .otherwise(F.lit(None).cast("timestamp"))
        if parse_ts
        else F.col("ts")
    )
    return j.select(
        "conv_id",
        "turn_idx",
        "sub_idx",
        "role",
        "tool",
        ts_col.alias("ts"),
        "text",
        F.when(matched, F.lit("anomaly"))
        .when(F.col("is_known"), F.lit("normal"))
        .otherwise(F.lit("unknown"))
        .alias("route"),
        F.when(F.col("is_target") & F.col("is_known"), F.col("score"))
        .cast("float")
        .alias("score"),
        F.col("_a_before").alias("before"),
        F.col("_a_after").alias("after"),
    )


def _route_single(
    enriched: DataFrame,
    cfg: PipelineConfig,
    clean_split: bool = False,
    dirty_conv_dim: DataFrame | None = None,
    n_convs: int | None = None,
    n_dirty: int | None = None,
    n_winners: int | None = None,
) -> DataFrame:
    """One conversation per task (the common case: conversations are far
    smaller than cfg.max_task_lines).

    Anomaly-free conversations never enter Python — and never shuffle:
    the ids of conversations containing an anomalous target row (a TINY
    dim: anomalies are rare by definition) are aggregated first; clean
    rows then take a broadcast ANTI-join plus a pure-column select
    (exactly _assemble_conv's fast path — route = known ? normal :
    unknown, score kept on known target rows, no contexts), which is
    map-only: no conv_id exchange, no sort, no Arrow. Only the dirty
    conversations' rows (broadcast semi-join) ship into the pandas
    context walk. Measured at 16M turns/local[32] the Arrow round-trip
    was ~83% of the route stage's wall (identity-pandas control 19.8s vs
    1.3s JVM floor, BENCH.md). The price is re-evaluating the upstream
    plan per branch (dim + clean + dirty) — map-side-only passes that
    cost far less than the exchange+sort+Arrow they remove. If the dirty
    dim exceeds the broadcast guard (an anomaly-dense corpus, where the
    split cannot win) the classic single-pass all-pandas route runs
    instead."""
    threshold = cfg.threshold
    parse_ts = cfg.parse_timestamps

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return _assemble_conv(pdf, threshold, parse_ts)

    def rfn(pdf: pd.DataFrame) -> pd.DataFrame:
        return _assemble_region(pdf, threshold, parse_ts)

    sel = enriched.select(*_ROUTE_COLS)
    if not clean_split:
        # small cached inputs: the Arrow round-trip is sub-second, so the
        # stats job + per-branch re-evaluation cost more than they save
        return _apply_per_conv(sel, fn, ROUTED, region_fn=rfn)
    anom_row = (
        F.col("is_known")
        & F.col("is_target")
        & (F.coalesce(F.col("score"), F.lit(0.0)) > float(np.float32(threshold)))
    )
    # strategy dims. Preferred source (round 4): the caller derives the
    # dirty-conversation dim from the persisted scored winners — a conv is
    # dirty iff an anomalous winner's first occurrence lives in it, and
    # the winner's skey ENCODES that conversation — so the strategy costs
    # one job over a tiny cached dim instead of a full enriched re-scan.
    # (A dim covering convs absent from this input — e.g. the monster
    # split filtered them out — is harmless: the anti/semi joins just
    # never match those ids.) Fallback without the dim: the original
    # map-side-combining stats pass over enriched. The dirty CONV FRACTION
    # still matters, not just broadcastability — a dim covering most
    # conversations (anomaly-dense corpus) makes the split pay its plan
    # passes for nothing; n_convs comes from the caller (a column-pruned
    # approx-distinct over the parsed checkpoint) or the stats pass, and
    # when genuinely unknown only the broadcast guard applies.
    dirty_ids = None
    if dirty_conv_dim is not None:
        if isinstance(dirty_conv_dim, list):
            # driver-collected dirty ids (run()'s _dirty_ids_collected):
            # the count is free and the isin fast path below needs no
            # further job
            dirty_ids = dirty_conv_dim
            n_dirty = len(dirty_ids)
            dirty_dim = None
        else:
            dirty_dim = dirty_conv_dim
            if n_dirty is None:
                n_dirty = dirty_dim.count()
        if callable(n_convs):
            # the conv total costs a parsed-cache/checkpoint column scan
            # (measured 0.3-0.8s at sf0.1): only pay it when the dirty dim
            # is big enough for the fraction guard to plausibly trip — a
            # tiny dim cannot cover 20% of a meaningful conv universe, and
            # at toy scale a mis-chosen split costs less than the scan
            n_convs = n_convs() if n_dirty > 64 else None
    else:
        stats = sel.agg(
            F.approx_count_distinct(
                F.when(anom_row, F.col("conv_id"))
            ).alias("dirty"),
            F.approx_count_distinct("conv_id").alias("total"),
        ).first()
        n_dirty, n_convs = int(stats["dirty"]), int(stats["total"])
        dirty_dim = None

    clean_cols = [
        F.col("conv_id"),
        F.col("turn_idx"),
        F.col("sub_idx"),
        F.col("role"),
        F.col("tool"),
        (F.lit(None).cast("timestamp") if parse_ts else F.col("ts")).alias("ts"),
        F.col("text"),
        F.when(F.col("is_known"), F.lit("normal"))
        .otherwise(F.lit("unknown"))
        .alias("route"),
        F.when(F.col("is_target") & F.col("is_known"), F.col("score"))
        .cast("float")
        .alias("score"),
        F.lit(None).cast("array<string>").alias("before"),
        F.lit(None).cast("array<string>").alias("after"),
    ]
    if n_dirty == 0:
        return sel.select(*clean_cols)
    if n_dirty >= _BROADCAST_SCORED_ROWS or (
        n_convs is not None and n_dirty > 0.2 * n_convs
    ):
        # anomaly-dense: most conversations need the walk anyway (or the
        # dim exceeds the broadcast guard). Round 6 (guide §8): when the
        # anomaly count is provably broadcastable (bounded by the known
        # winners count — every emitted anomaly is an anomalous winner's
        # first occurrence), the walk ships only SLIM decision columns
        # into Python and only the anomaly rows (key + contexts) back
        # out; the full routed rows are reassembled JVM-side by a
        # broadcast join. Row-identical to the region assembler (the
        # normal/unknown/score formulas are the same vectorized
        # expressions; pinned by tests/test_round6_opt.py). Without the
        # bound, the classic single pandas pass runs.
        if n_winners is not None and n_winners < _BROADCAST_SCORED_ROWS:
            return _route_dense_slim(sel, threshold, parse_ts)
        return _apply_per_conv(sel, fn, ROUTED, region_fn=rfn)
    if dirty_dim is None and dirty_ids is None:
        dirty_dim = sel.filter(anom_row).select("conv_id").distinct()
    if n_dirty is not None and n_dirty <= 64:
        # round 6: with a KNOWN tiny dirty set, literal isin predicates
        # beat the broadcast anti/semi joins (no broadcast build per
        # branch; measured 0.42s -> 0.18s clean, 0.63s -> 0.46s dirty at
        # sf1.0), and the dirty rows are explicitly repartitioned down to
        # n_dirty partitions so the pandas walk runs as a handful of
        # tasks instead of one per session shuffle partition. The forced
        # repartition is safe here: this branch carries a few hundred
        # rows by construction (the bucketed-table shuffle-free property
        # matters only for the full-size exchanges, which the clean
        # branch — map-only — never pays). NULL conv_id rows (possible in
        # arbitrary caller tables) stay on the clean branch, matching the
        # anti-join's semantics, via the coalesce.
        ids = (
            dirty_ids
            if dirty_ids is not None
            else [r[0] for r in dirty_dim.select("conv_id").collect()]
        )
        clean_out = sel.filter(
            ~F.coalesce(F.col("conv_id").isin(ids), F.lit(False))
        ).select(*clean_cols)
        dirty = _apply_per_conv(
            sel.filter(F.col("conv_id").isin(ids)).repartition(
                max(1, min(n_dirty, 32)), "conv_id"
            ),
            fn,
            ROUTED,
            region_fn=rfn,
        )
        return clean_out.unionByName(dirty)
    if dirty_dim is None:
        # a collected id list too large for the isin path: lift it back
        # into a relation for the broadcast joins
        dirty_dim = enriched.sparkSession.createDataFrame(
            [(i,) for i in dirty_ids], "conv_id string"
        )
    dim = F.broadcast(dirty_dim.select(F.col("conv_id").alias("_d_conv")))
    clean_out = sel.join(
        dim, sel["conv_id"] == F.col("_d_conv"), "left_anti"
    ).select(*clean_cols)
    dirty = _apply_per_conv(
        sel.join(dim, sel["conv_id"] == F.col("_d_conv"), "left_semi"),
        fn,
        ROUTED,
        region_fn=rfn,
    )
    return clean_out.unionByName(dirty)


def route(
    enriched: DataFrame,
    cfg: PipelineConfig = PipelineConfig(),
    conv_sizes: DataFrame | None = None,
    allow_split: bool = True,
    clean_split: bool = False,
    dirty_conv_dim: DataFrame | None = None,
    n_convs: int | None = None,
    n_dirty: int | None = None,
    n_winners: int | None = None,
) -> DataFrame:
    """Per-conversation context assembly + fan-out labels.

    Monster-conversation skew guard: with cfg.max_task_lines set,
    conversations larger than the limit are processed by route_split
    (chunk-aligned ranges, one task per range) instead of one giant task.
    conv_sizes lets the caller supply precomputed (conv_id, n) counts (e.g.
    from the parsed checkpoint, a column-pruned parquet scan) so the probe
    does not re-evaluate the enrich plan; allow_split=False skips the probe
    entirely (used for inputs already known to be small)."""
    kw = dict(
        clean_split=clean_split, dirty_conv_dim=dirty_conv_dim, n_convs=n_convs,
        n_dirty=n_dirty, n_winners=n_winners,
    )
    if not allow_split or cfg.max_task_lines is None:
        return _route_single(enriched, cfg, **kw)
    if cfg.parse_timestamps:
        # range splitting is undefined in parse-timestamp mode (W3 LastTS
        # state crosses chunk boundaries unbounded — route_split raises), so
        # skip the skew guard instead of crashing; a monster conversation
        # then runs as one task, which is the pre-guard behavior
        import logging

        logging.getLogger(__name__).warning(
            "parse_timestamps=True: skipping the monster-conversation split "
            "guard (max_task_lines=%s); oversized conversations run as "
            "single tasks", cfg.max_task_lines,
        )
        return _route_single(enriched, cfg, **kw)
    if conv_sizes is None:
        conv_sizes = enriched.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n"))
    big_ids = [
        r[0]
        for r in conv_sizes.filter(F.col("n") > cfg.max_task_lines)
        .select("conv_id")
        .collect()
    ]
    if not big_ids:
        return _route_single(enriched, cfg, **kw)
    small = enriched.filter(~F.col("conv_id").isin(big_ids))
    big = enriched.filter(F.col("conv_id").isin(big_ids))
    return _route_single(small, cfg, **kw).unionByName(
        route_split(big, cfg)
    )


# ------------------------- intra-conversation range splitting -------------
#
# The escape hatch for conversations too large for one task's memory: split
# into ranges aligned to the chunk machinery's own flush boundaries, ship
# each range (plus the previous range's PAD_LINES-line tail as a read-only
# pad) to an independent task, and reproduce the carried chunk state from
# the pad (exactness argument: context.find_anomalies_ranged docstring).

_RANGES_SCHEMA = (
    "conv_id string, range_id int, lo string, hi string, pad_lo string, "
    "is_last boolean"
)


def _plan_ranges(pdf: pd.DataFrame, max_task_lines: int) -> pd.DataFrame:
    """Per-conversation range plan over LIGHT columns only (skey + two
    bools — no text): chunk flush boundaries, then whole chunks greedily
    grouped into <= max_task_lines ranges. Emits skey intervals; the last
    range's hi is NULL (it also absorbs trailing targetless lines)."""
    from .context import PAD_LINES, chunk_flush_points

    pdf = pdf.sort_values("skey", kind="stable").reset_index(drop=True)
    conv = pdf["conv_id"].iloc[0]
    cols = ["conv_id", "range_id", "lo", "hi", "pad_lo", "is_last"]
    skeys = pdf["skey"].to_numpy()
    buf_idx = np.flatnonzero(pdf["is_buffered"].to_numpy(dtype=bool))
    if len(buf_idx) == 0:
        return pd.DataFrame(
            [(conv, 0, "", None, None, True)], columns=cols
        )
    tmask = pdf["is_target"].to_numpy(dtype=bool)[buf_idx]
    ends = chunk_flush_points(tmask)
    bounds = [0]
    prev = 0
    for e in ends:
        if e - bounds[-1] > max_task_lines and prev > bounds[-1]:
            bounds.append(prev)
        prev = e
    rows = []
    for k, sb in enumerate(bounds):
        last = k == len(bounds) - 1
        rows.append(
            (
                conv,
                k,
                "" if k == 0 else skeys[buf_idx[sb]],
                None if last else skeys[buf_idx[bounds[k + 1]]],
                None if k == 0 else skeys[buf_idx[max(sb - PAD_LINES, 0)]],
                last,
            )
        )
    return pd.DataFrame(rows, columns=cols)


def _assemble_range(pdf: pd.DataFrame, threshold: float) -> pd.DataFrame:
    """Ranged variant of _assemble_conv: pad rows prime the chunk state and
    are withheld from output (except a carried-open anchor, whose routed
    anomaly row this range owns); a still-open anchor at a non-final range
    end is withheld symmetrically (the next range emits it)."""
    from .context import find_anomalies_ranged

    pdf = pdf.sort_values(["turn_idx", "sub_idx"], kind="stable").reset_index(drop=True)
    is_pad = pdf["is_pad"].to_numpy(dtype=bool)
    is_last = bool(pdf["is_last"].iloc[0])
    n = len(pdf)
    route_lbl = np.full(n, "normal", dtype=object)
    known = pdf["is_known"].to_numpy(dtype=bool)
    route_lbl[~known] = "unknown"
    before = [None] * n
    after = [None] * n
    scores_out = pdf["score"].to_numpy(dtype="float32", na_value=np.nan).copy()
    scores_out[~(pdf["is_target"].to_numpy(dtype=bool))] = np.nan
    keep_row = ~is_pad

    proc = np.flatnonzero(known)
    if len(proc):
        sub = pdf.iloc[proc]
        sc = sub["score"].to_numpy(dtype="float32", na_value=np.nan)
        sc = np.where(np.isnan(sc), np.float32(0.0), sc).astype(np.float32)
        anomalies, carried, suppressed = find_anomalies_ranged(
            sub["text"].tolist(),
            sub["turn_idx"].to_numpy(),
            sub["is_ignored"].to_numpy(dtype=bool),
            sub["is_target"].to_numpy(dtype=bool),
            sc,
            sub["emit_ok"].to_numpy(dtype=bool),
            n_pad=int(is_pad[proc].sum()),
            is_last=is_last,
            threshold=np.float32(threshold),
        )
        for a in anomalies:
            gi = proc[a["idx"]]
            route_lbl[gi] = "anomaly"
            before[gi] = a["before"]
            after[gi] = a["after"]
            if carried is not None and a["idx"] == carried:
                keep_row[gi] = True
        if suppressed is not None:
            keep_row[proc[suppressed]] = False

    out = pdf[["conv_id", "turn_idx", "sub_idx", "role", "tool", "ts", "text"]].copy()
    out["route"] = route_lbl
    out["score"] = scores_out
    out["before"] = before
    out["after"] = after
    return out.loc[keep_row]


def route_split(enriched: DataFrame, cfg: PipelineConfig = PipelineConfig()) -> DataFrame:
    """Exact route output for oversized conversations via chunk-aligned
    range tasks. Plan shape: a LIGHT per-conversation pass (skey + bools,
    ~20 bytes/line instead of full text rows) computes the range intervals;
    a broadcast range-dim join tags every line (and replicates the 20-line
    pads); the context walk then runs per (conv, range) task."""
    if cfg.parse_timestamps:
        raise NotImplementedError(
            "range splitting requires native timestamps: W3 parse-mode "
            "LastTS state crosses chunk boundaries unbounded"
        )
    max_lines = cfg.max_task_lines
    threshold = cfg.threshold
    light = enriched.select(
        "conv_id",
        _skey().alias("skey"),
        (F.col("is_known") & ~F.col("is_ignored")).alias("is_buffered"),
        "is_target",
    )

    def plan(pdf: pd.DataFrame) -> pd.DataFrame:
        return _plan_ranges(pdf, max_lines)

    ranges = light.groupBy("conv_id").applyInPandas(plan, _RANGES_SCHEMA)
    body = ranges.select(
        F.col("conv_id").alias("_r_conv"), "range_id", "lo", "hi", "is_last",
        F.lit(False).alias("is_pad"),
    )
    pad = ranges.filter(F.col("pad_lo").isNotNull()).select(
        F.col("conv_id").alias("_r_conv"), "range_id",
        F.col("pad_lo").alias("lo"), F.col("lo").alias("hi"), "is_last",
        F.lit(True).alias("is_pad"),
    )
    dim = body.unionByName(pad)
    lines = enriched.select(*_ROUTE_COLS).withColumn("skey", _skey())
    j = lines.join(
        F.broadcast(dim),
        on=[
            lines["conv_id"] == F.col("_r_conv"),
            F.col("skey") >= F.col("lo"),
            F.col("hi").isNull() | (F.col("skey") < F.col("hi")),
        ],
    ).drop("_r_conv", "lo", "hi", "skey")

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return _assemble_range(pdf, threshold)

    return j.groupBy("conv_id", "range_id").applyInPandas(fn, schema=ROUTED)


# --------------------------------------------------------------------------
# aggregate
# --------------------------------------------------------------------------


def aggregate(routed: DataFrame) -> dict[str, DataFrame]:
    is_anom = (F.col("route") == "anomaly").cast("long")
    agg_conv = routed.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("line_count"),
        F.sum(F.octet_length("text")).alias("byte_count"),
        F.sum(is_anom).alias("anomaly_count"),
        F.avg(F.when(F.col("route") == "anomaly", F.col("score"))).alias("mean_score"),
    )
    agg_tool = routed.groupBy("tool").agg(
        F.count(F.lit(1)).alias("line_count"),
        F.sum(is_anom).alias("anomaly_count"),
    )
    score_hist = (
        routed.filter(F.col("route") == "anomaly")
        .select(
            F.least(F.floor(F.col("score") * 20).cast("int"), F.lit(19)).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("count"))
    )
    totals = routed.agg(
        F.count(F.lit(1)).alias("total_line_count"),
        F.sum(is_anom).alias("total_anomaly_count"),
    )
    # report ordering (W4, report.rs:612-627): sources sorted by mean
    # anomaly distance desc, job-output-style sources pinned to the top
    log_reports = agg_conv.withColumn(
        "sort_key",
        F.when(F.col("conv_id").startswith("job-output"), F.lit(42.0)).otherwise(
            F.coalesce(F.col("mean_score"), F.lit(-1.0))
        ),
    ).orderBy(F.desc("sort_key"), "conv_id")
    return {
        "agg_conv": agg_conv,
        "agg_tool": agg_tool,
        "score_hist": score_hist,
        "totals": totals,
        "log_reports": log_reports,
    }


# --------------------------------------------------------------------------
# end-to-end runs
# --------------------------------------------------------------------------


def train_model(
    spark: SparkSession,
    baseline_turns: DataFrame,
    cfg: PipelineConfig = PipelineConfig(),
) -> DataFrame:
    return model_mod.train(parse(baseline_turns, cfg), group_col=cfg.group_col)


def _broadcast_or_none(spark, model_df):
    """Collect + broadcast the model, or fall back to distributed scoring
    (enrich model_df path) when it exceeds the driver-collect nnz budget."""
    import logging

    try:
        return model_mod.broadcast_indexes(
            spark, model_mod.collect_indexes(model_df)
        )
    except ValueError as e:
        logging.getLogger(__name__).warning(
            "model exceeds the driver-collect budget; scoring via the "
            "distributed join path instead (%s)", e
        )
        return None


def run(
    spark: SparkSession,
    target_turns: DataFrame,
    baseline_turns: DataFrame | None = None,
    model_df: DataFrame | None = None,
    cfg: PipelineConfig = PipelineConfig(),
    work_dir: str | None = None,
    small_input_rows: int = 200_000,
    input_rows: int | None = None,
    stage_times: dict | None = None,
) -> dict[str, DataFrame]:
    """Full diff-style run (E1/E2): train (or load) then report.

    ``stage_times``: optional dict the BIG path fills with per-stage wall
    seconds (parse_target / train_bc / enrich_scored / route_strategy /
    route_write) — the scaling bench's per-stage attribution (round-5
    verdict ask). parse_target and train_bc OVERLAP on two threads, so
    their sum exceeds the critical path by design.

    ``input_rows``: caller-known upper bound on BOTH the target and the
    baseline row counts (e.g. the total row count of the table both were
    sliced from — a parquet footer count, a cached view's count). Passing
    it skips the limit-probe jobs — which otherwise re-evaluate the
    inputs' upstream plans (windows, joins) just to decide the small-input
    fast path and whether the driver-side trainer may collect the
    baseline.

    Stage outputs (parsed, routed) are checkpointed to ``work_dir`` as
    parquet: parsed feeds three plan branches (winner aggregation, join
    probe, route input) and routed feeds four sinks + aggregates, so
    without a checkpoint the tokenize UDF and the context assembly would
    re-run per consumer. (DataFrame.persist is NOT used: its in-memory
    columnar build is slower than a parquet round-trip for wide string
    rows.) The checkpoints double as the resume points of the lineage
    design (SURVEY.md §2.10).

    Returns dict with routed, anomalies, normal, unknown + aggregates.
    """
    import tempfile
    from concurrent.futures import ThreadPoolExecutor

    if work_dir is None:
        work_dir = tempfile.mkdtemp(prefix="logjuicer_run_")

    # small inputs skip the stage checkpoints: at that size the whole DAG
    # re-evaluates in well under a checkpoint's fixed cost (job scheduling +
    # write + re-scan), so fewer jobs win. When the caller didn't supply
    # input_rows, probe with a short-circuiting limit so big inputs pay
    # ~one split scan.
    # the small path's session tuning (AQE off, clamped shuffle partitions)
    # and its driver-side trainer are sized for SMALL inputs on BOTH sides:
    # a small target with a big baseline must take the big path, whose
    # checkpointing, default conf and nnz-budgeted collect handle it
    def _probe_small(df):
        try:
            return df.limit(small_input_rows + 1).count() <= small_input_rows
        except Exception:
            return False

    if input_rows is not None:
        small = input_rows <= small_input_rows
    else:
        small = _probe_small(target_turns)
        if small and model_df is None and baseline_turns is not None:
            small = _probe_small(baseline_turns)

    if small:
        # persist the parsed stages in memory instead of parquet
        # checkpoints: at this size the executor cache beats a write+rescan,
        # and both parse outputs feed multiple plan branches (baseline:
        # counters + winners; target: winners, join probe, route input) —
        # without it the tokenize UDF re-runs per branch.
        # The target parse is materialized on a second thread while the
        # baseline trains + collects (same overlap the big path uses): the
        # two job chains are independent until enrich needs both.
        #
        # AQE is toggled OFF for the materializing actions of this branch:
        # at small scale its stage-by-stage materialization turns one
        # pipelined job into a cascade of mini-jobs with a scheduling gap
        # each (measured ~2s of the flagship's wall at sf0.1), while every
        # runtime decision AQE could make here is already static — all join
        # dims are broadcast-hinted and 32 partitions of a small input
        # cannot skew. The session value is restored before returning; the
        # returned DataFrames read the materialized routed cache.
        # Shuffle-partition count sized to the input: at 100k rows, 32
        # partitions means 32 python-worker round trips per UDF stage and
        # the task overhead dominates (measured at sf0.1: 32 -> 4.2s,
        # 8 -> 3.2s flagship). ~16k rows per partition, floor 8, never above
        # the session default (which is sized for big inputs).
        old_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
        old_sp = spark.conf.get("spark.sql.shuffle.partitions", "32")
        n_hint = input_rows if input_rows is not None else small_input_rows
        small_sp = max(8, min(int(old_sp), n_hint // 16_000 + 1))
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.shuffle.partitions", str(small_sp))
        import time as _time

        def _rec(key, t0):
            if stage_times is not None:
                stage_times[key] = round(_time.perf_counter() - t0, 3)

        caches = []
        try:
            _t0 = _time.perf_counter()
            parsed_t = parse(target_turns, cfg, columns="dkey").persist()
            caches.append(parsed_t)

            def _mat_target():
                # materialize the parse cache, then run the winners
                # aggregation over it while the main thread is still
                # collecting/training (the is_known filter moves onto the
                # aggregated winners — see _winners_raw)
                parsed_t.count()
                w = _winners_raw(parsed_t, cfg).persist()
                _SCORED_REFS.append(w)
                return w, w.count()

            with ThreadPoolExecutor(max_workers=1) as pool:
                mat_fut = pool.submit(_mat_target)
                if model_df is None:
                    if baseline_turns is None:
                        raise ValueError("need baseline_turns or model_df")
                    # small-input trainer: one collect job, model built on
                    # the driver (train_collected docstring) — the parsed
                    # baseline has one consumer here, so no persist. The
                    # collect is bounded: the small decision above proved
                    # BOTH sides under small_input_rows, so the model nnz
                    # budget (which guards unbounded collects) is
                    # inapplicable here.
                    indexes, model_df = model_mod.train_collected(
                        spark, parse(baseline_turns, cfg, columns="dkey"),
                        group_col=cfg.group_col,
                    )
                    bc = model_mod.broadcast_indexes(spark, indexes)
                else:
                    bc = _broadcast_or_none(spark, model_df)
                winners_raw, n_winners = mat_fut.result()
            _rec("parse_train", _t0)
            _t0 = _time.perf_counter()
            enriched, scored = enrich(
                parsed_t, bc, cfg, count_scored=False, model_df=model_df,
                return_scored=True, winners=winners_raw, n_winners=n_winners,
            )
            # round 4: the small path takes the clean/dirty split too, now
            # that the strategy dim is FREE (derived from the scored
            # winners — materializing them is work the route job needed
            # anyway). Measured at sf0.1: beats the classic single pandas
            # pass in every paired run (2.5-3.6s vs 3.1-4.1s flagship);
            # the old objection (a stats scan costing more than it saved
            # on cached inputs) no longer applies because nothing scans
            # enriched to decide. The conv total (for the dirty-fraction
            # guard that keeps anomaly-DENSE corpora on the single pandas
            # pass) is one narrow scan over the CACHED parsed rows.
            ids = _dirty_ids_collected(scored, cfg, n_winners)
            if ids is not None:
                dirty_conv_dim, n_dirty = ids, len(ids)
            else:
                dirty_conv_dim, n_dirty = _dirty_conv_dim(scored, cfg), None
            n_convs = lambda: int(
                parsed_t.agg(
                    F.approx_count_distinct("conv_id").alias("n")
                ).first()["n"]
            )
            # small input => no conversation can exceed max_task_lines. The
            # routed stage is persisted (not parquet-checkpointed): it feeds
            # the four route views + the aggregates, and at this size the
            # executor cache beats a write+commit+rescan. Materialize BEFORE
            # releasing the upstream caches or the route job would recompute
            # uncached.
            routed = route(
                enriched, cfg, allow_split=False, clean_split=True,
                dirty_conv_dim=dirty_conv_dim, n_convs=n_convs,
                n_dirty=n_dirty, n_winners=n_winners,
            ).persist()
            routed.count()
            _rec("enrich_route", _t0)
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
            spark.conf.set("spark.sql.shuffle.partitions", old_sp)
        release_stage_caches()
        for c in caches:
            c.unpersist()
        # the routed cache outlives this call (the caller reads the views);
        # register it so the NEXT run's release reclaims it — long sessions
        # running many small queries don't accumulate executor cache
        _SCORED_REFS.append(routed)
        out = {"routed": routed, "model": model_df, "work_dir": work_dir}
        out["anomalies"] = routed.filter(F.col("route") == "anomaly")
        out["normal"] = routed.filter(F.col("route") == "normal")
        out["unknown"] = routed.filter(F.col("route") == "unknown")
        out.update(aggregate(routed))
        return out

    # the target parse and the baseline train are independent job chains:
    # submit both so Spark can overlap them (the scheduler fills idle slots
    # of one with tasks of the other)
    import time as _time

    def _rec(key, t0):
        if stage_times is not None:
            stage_times[key] = round(_time.perf_counter() - t0, 3)

    # medium-input job-cascade tuning (round 6): with AQE on, every
    # exchange materializes a query stage — a scheduling gap per shuffle
    # that costs ~0.5s of the flagship wall at 1M rows while buying
    # nothing (all joins are explicitly broadcast-hinted and a <= few-M-row
    # shuffle over the session's fixed partition count cannot need runtime
    # coalescing or skew splitting). Inputs above the bound keep AQE on:
    # that is where its coalescing/skew handling pays. Row-count
    # parameterised (not core-count); override via LOGJUICER_AQE_OFF_MAX_ROWS.
    import os as _os

    aqe_off_max = int(_os.environ.get("LOGJUICER_AQE_OFF_MAX_ROWS", "2000000"))
    medium = input_rows is not None and input_rows <= aqe_off_max
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    if medium:
        spark.conf.set("spark.sql.adaptive.enabled", "false")

    try:
        def _parse_target():
            t0 = _time.perf_counter()
            parse(target_turns, cfg, columns="dkey").write.mode("overwrite").parquet(
                f"{work_dir}/parsed"
            )
            _rec("parse_target", t0)
            # overlap (guide §2.6): the full-scan winners aggregation —
            # the expensive half of enrich — does not need the model (the
            # is_known filter moves onto the aggregated winners, see
            # _winners_raw), so it runs here while the main thread is
            # still training/broadcasting
            t0 = _time.perf_counter()
            w = _winners_raw(
                spark.read.parquet(f"{work_dir}/parsed"), cfg
            ).persist()
            _SCORED_REFS.append(w)
            n = w.count()
            _rec("winners_agg", t0)
            return w, n

        _t_train = _time.perf_counter()
        with ThreadPoolExecutor(max_workers=1) as pool:
            parse_fut = pool.submit(_parse_target)
            if model_df is None:
                if baseline_turns is None:
                    raise ValueError("need baseline_turns or model_df")
                # the parsed baseline has exactly ONE consumer — the
                # trainer's single winners+counters aggregation. Round 6:
                # the middle trainer collects the TINY winners relation and
                # builds the matrix driver-side (one collect job instead of
                # the distributed tail's five mini-jobs); baselines whose
                # winner count exceeds the budget fall back to the
                # distributed trainer + collect/broadcast path.
                indexes, model_df = model_mod.train_winners_collected(
                    spark, parse(baseline_turns, cfg, columns="dkey"),
                    group_col=cfg.group_col,
                )
                bc = (
                    model_mod.broadcast_indexes(spark, indexes)
                    if indexes is not None
                    else _broadcast_or_none(spark, model_df)
                )
            else:
                bc = _broadcast_or_none(spark, model_df)
            winners_raw, n_winners = parse_fut.result()

        _rec("train_bc", _t_train)

        parsed = spark.read.parquet(f"{work_dir}/parsed")
        _t_enrich = _time.perf_counter()
        enriched, scored = enrich(
            parsed, bc, cfg, model_df=model_df, return_scored=True,
            winners=winners_raw, n_winners=n_winners,
        )
        _rec("enrich_scored", _t_enrich)
        # route strategy inputs from the CHEAP sources (round 4): the dirty
        # conv dim comes from the tiny persisted scored winners (skey encodes
        # the winner's conversation), and the conv total from a column-pruned
        # approx-distinct over the parsed checkpoint — the route stage used to
        # re-evaluate the full enriched plan (checkpoint scan + both broadcast
        # joins) once more just to make this decision
        ids = _dirty_ids_collected(scored, cfg, n_winners)
        if ids is not None:
            dirty_conv_dim, n_dirty = ids, len(ids)
        else:
            dirty_conv_dim, n_dirty = _dirty_conv_dim(scored, cfg), None
        n_convs = lambda: int(
            parsed.agg(F.approx_count_distinct("conv_id").alias("n")).first()["n"]
        )
        # monster-conv probe, cheapest-first: a count-star over the checkpoint
        # (parquet footer metadata, no column reads) proves no conversation can
        # exceed the limit whenever the WHOLE input is under it; only then pay
        # the per-conv size aggregation (still just a conv_id column scan)
        _t_strategy = _time.perf_counter()
        conv_sizes = None
        allow_split = False
        if cfg.max_task_lines is not None and parsed.count() > cfg.max_task_lines:
            allow_split = True
            conv_sizes = parsed.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n"))
        routed_plan = route(
            enriched, cfg, conv_sizes=conv_sizes, allow_split=allow_split,
            clean_split=True, dirty_conv_dim=dirty_conv_dim, n_convs=n_convs,
            n_dirty=n_dirty, n_winners=n_winners,
        )
        _rec("route_strategy", _t_strategy)
        _t_route = _time.perf_counter()
        routed_plan.write.mode("overwrite").parquet(f"{work_dir}/routed")
        _rec("route_write", _t_route)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
    release_stage_caches()
    routed = spark.read.parquet(f"{work_dir}/routed")

    out = {"routed": routed, "model": model_df, "work_dir": work_dir}
    out["anomalies"] = routed.filter(F.col("route") == "anomaly")
    out["normal"] = routed.filter(F.col("route") == "normal")
    out["unknown"] = routed.filter(F.col("route") == "unknown")
    out.update(aggregate(routed))
    return out


# --------------------------------------------------------------------------
# log-file-table adapter
# --------------------------------------------------------------------------


def from_log_table(
    files_df: DataFrame,
    source_col: str = "source",
    line_col: str = "line_nr",
    text_col: str = "text",
    fileset=None,
) -> DataFrame:
    """Adapt a log-file table (source path, line number, text) — the
    reference's native input shape — to the TURNS schema: conversation =
    source file, tool = IndexName::from_path(source) so files with similar
    paths share one baseline index (index_name.rs:165-177), with the
    F1 fileset include/exclude predicates applied first."""
    from .indexname import index_name_udf

    df = files_df
    if fileset is not None:
        df = fileset.filter_sources(df, source_col)
    return df.select(
        F.col(source_col).alias("conv_id"),
        F.col(line_col).cast("int").alias("turn_idx"),
        F.lit("log").alias("role"),
        F.col(text_col).alias("text"),
        index_name_udf()(F.col(source_col)).alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
    )


def from_archive_manifest(
    manifest_df: DataFrame,
    archive_col: str = "archive",
    entry_col: str = "entry",
    line_col: str = "line_nr",
    text_col: str = "text",
    fileset=None,
    url_col: str | None = None,
) -> DataFrame:
    """S7 analog: an exploded archive manifest table
    (archive, entry, line_nr, text) -> TURNS.

    Mirrors the reference's tarball traversal semantics
    (source.rs:95-161 with_tarball_source): each file entry is its own
    source named ``archive?entry=path`` (the Source::TarFile url shape),
    the F1 fileset include/exclude predicate applies to the ENTRY path
    (is_fp_valid on the in-archive relative path), and the baseline
    IndexName derives from the entry path so equivalent entries across
    archives share one index. ``url_col`` (e.g. sources.read_tarballs'
    ``entry_url`` with its ``&sub=`` nesting chain) overrides the conv-id
    suffix while ``entry_col`` keeps driving the fileset check and the
    IndexName — Source::TarFile carries (path, url) separately for exactly
    this reason. Tar extraction itself lives in sources.read_tarballs; this
    adapter also accepts pre-exploded manifests from upstream jobs."""
    from .indexname import index_name_udf

    df = manifest_df
    if fileset is not None:
        df = fileset.filter_sources(df, entry_col)
    return df.select(
        F.concat(
            F.col(archive_col), F.lit("?entry="), F.col(url_col or entry_col)
        ).alias("conv_id"),
        F.col(line_col).cast("int").alias("turn_idx"),
        F.lit("log").alias("role"),
        F.col(text_col).alias("text"),
        index_name_udf()(F.col(entry_col)).alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
    )
