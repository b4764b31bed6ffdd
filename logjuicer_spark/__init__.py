"""logjuicer_spark — a PySpark-native anomaly-extraction engine.

A from-scratch re-expression of the query semantics of
logjuicer/logjuicer (reference: /root/reference, v0.15.2) as a
parse -> enrich -> route -> aggregate DataFrame pipeline over tables of
conversation transcripts ``(conv_id, turn_idx, role, text, tool, ts)``.

This is NOT a port of the Rust execution engine: tokenization is a
vectorized pandas UDF projection, the baseline model is a broadcast
per-group sparse matrix, scoring is an Arrow-batched matmul, contexts
are assembled per-conversation, and routing/aggregation are plain
DataFrame operations optimized by Catalyst.
"""

__version__ = "0.1.0"

MODEL_VERSION = 8  # parity with reference model.rs:53 (MODEL_VERSION = 8)
