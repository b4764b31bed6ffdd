"""Enrich-stage scoring: distance of each distinct (group, token-line) to the
broadcast baseline index.

This is the Spark reincarnation of the reference's chunked nearest-neighbor
search (J2 in SURVEY.md §2.4: index.rs:68-102,175-181 via process.rs:283-287):
the reference buffers 512 unique tokenized lines and scores them with one
sparse matrix product; here every Arrow batch of the winners DataFrame is
scored with one numpy gather/segment-sum per group — same math, f32, and the
baseline matrix arrives once per executor via broadcast instead of being
rebuilt per task.

Winner rows carry ``skey``, the sortable encoding of (conv_id, turn_idx,
sub_idx) used for first-occurrence semantics (see pipeline._SKEY).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from .model import lookup

SCORED_SCHEMA = "tool string, dkey string, skey string, score float"


def make_score_fn(bc_indexes):
    """mapInPandas over winner rows (tool, dkey, skey, tokens) -> + score."""

    def score_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        indexes = bc_indexes.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pdf = pdf.reset_index(drop=True)
            scores = np.ones(len(pdf), dtype=np.float32)
            for tool, g in pdf.groupby("tool", sort=False):
                idx = lookup(indexes, tool)
                if idx is not None:
                    scores[g.index.to_numpy()] = idx.score(g["tokens"].tolist())
            out = pdf[["tool", "dkey", "skey"]].copy()
            out["score"] = scores
            yield out

    return score_batches
