"""Driver-contract queries over /root/testdata tables.

Each ``q_*`` builder takes (spark, sf_dir) and returns a DataFrame; the
matching entry in ORACLE_SQL is ANSI SQL that DuckDB evaluates to the same
multiset of rows (column names aligned, floats rounded). Queries map to the
operator inventory of SURVEY.md §2; the non-SQL-expressible ones (tokenizer,
scoring, minhash, the flagship pipeline) have no oracle entry and get the
driver's rows-only check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# Staging area for UDF-produced intermediates (minhash/simhash signatures,
# media payloads, ...) so the DuckDB oracle can verify the RELATIONAL part
# of a UDF-bearing query (banding, bucket joins, aggregation) over the exact
# same rows via read_parquet. The DEFAULT path is fixed so that a harness
# which runs queries() in one process and replays oracle_sql() strings in
# another still lines up (the strings embed the path at import time).
# Concurrent invocations racing on the staged files set LJ_ORACLE_STAGE to
# disjoint dirs — scripts/check_oracle.py and bench.py namespace themselves
# per pid; a single sequential run (the driver's gate) needs nothing.
import os as _os

ORACLE_STAGE = _os.environ.get("LJ_ORACLE_STAGE", "/tmp/lj_oracle")


def _parquet_row_count(path: str) -> int | None:
    """Exact row count from local parquet footers (pyarrow, no Spark job);
    None when the path isn't a plain local file/dir of parquet parts."""
    import glob

    try:
        import pyarrow.parquet as pq

        if _os.path.isdir(path):
            parts = glob.glob(_os.path.join(path, "*.parquet"))
            if not parts:
                return None
            return sum(pq.read_metadata(p).num_rows for p in parts)
        if _os.path.isfile(path):
            return pq.read_metadata(path).num_rows
    except Exception:
        return None
    return None


def _stage(spark: SparkSession, df: DataFrame, name: str) -> DataFrame:
    path = f"{ORACLE_STAGE}/{name}.parquet"
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


# --------------------------------------------------------------------------
# the deterministic events -> turns mapping (shared by entry() and queries)
# --------------------------------------------------------------------------

def turns_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic events -> transcript mapping: conversation per user,
    tool = executor node (the per-tool baseline dimension), text a log-ish
    rendering. The baseline slice is even users WITHOUT their error events,
    so target error lines are genuinely novel to the model."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chan = F.element_at(
        F.array(F.lit("alpine"), F.lit("breeze"), F.lit("copper"), F.lit("dunes")),
        (F.expr("user_id div 2") % 4 + 1).cast("int"),
    )
    # round 6 (guide §2.3 "project before the exchange" in reverse): the
    # row_number window runs over the RAW event columns and every derived
    # string (conv_id, role, the concatenated text, tool) is projected
    # AFTER it — the user_id exchange then carries the narrow parquet
    # columns instead of pre-concatenated text rows (measured 1.63s ->
    # 0.74s for the full view at sf1.0). As a second effect the flagship's
    # branch filters (is_baseline, a pure user_id predicate) now push
    # BELOW the window, so each branch's window sorts only its own rows.
    # Output rows are identical: row_number depends only on
    # (user_id, ts, event_id), which the reorder does not touch.
    return ev.withColumn("turn_idx", F.row_number().over(w).cast("int")).select(
        F.concat(F.lit("conv-"), F.col("user_id").cast("string")).alias("conv_id"),
        "turn_idx",
        F.when(F.col("event_type").isin("signup", "login"), "user")
        .when(F.col("event_type") == "purchase", "assistant")
        .otherwise("tool")
        .alias("role"),
        F.concat(
            F.col("event_type"),
            F.lit(" channel "),
            chan,
            F.lit(" bucket-"),
            F.floor("value").cast("bigint").cast("string"),
            F.lit(" "),
            F.col("props"),
        ).alias("text"),
        F.concat(F.lit("node-"), (F.expr("user_id div 2") % 4).cast("string")).alias("tool"),
        F.col("ts"),
        F.col("event_type").alias("etype"),
        (F.col("user_id") % 2 == 0).alias("is_baseline"),
    )


_TURNS_SQL = """
SELECT 'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS turn_idx,
       CASE WHEN event_type IN ('signup','login') THEN 'user'
            WHEN event_type = 'purchase' THEN 'assistant'
            ELSE 'tool' END AS role,
       event_type || ' channel ' ||
         (['alpine','breeze','copper','dunes'])[CAST((user_id // 2) % 4 + 1 AS INT)] ||
         ' bucket-' || CAST(CAST(FLOOR(value) AS BIGINT) AS VARCHAR) || ' ' || props AS text,
       'node-' || CAST((user_id // 2) % 4 AS VARCHAR) AS tool,
       ts,
       event_type AS etype,
       (user_id % 2 = 0) AS is_baseline
FROM events
"""


# --------------------------------------------------------------------------
# oracle-checked queries (operator inventory)
# --------------------------------------------------------------------------

def q_turns_parse(spark, sf_dir):
    """S1/S5: scan + projection + stable turn ordering."""
    return turns_view(spark, sf_dir).select(
        "conv_id", "turn_idx", "role", "text", "tool"
    )


def q_subline_explode(spark, sf_dir):
    """S1 sub-line split: explode documents into sentence pieces."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.explode(F.split("text", "\\. ")).alias("piece")
    )


def q_filter_lines(spark, sf_dir):
    """F1/F2: include/exclude regex filter + length cap (6000 -> 200 here)."""
    d = _t(spark, sf_dir, "documents")
    return d.filter(
        (F.octet_length("text") <= 200)
        & ~F.regexp_like("source", F.lit("^(web|crawl)$"))
    ).select("doc_id", "source", "n_chars")


def q_dedup_first(spark, sf_dir):
    """F6/U3 skip-lines dedup: first event per (user, type) under stable
    order — expressed as the skew-safe min-struct aggregation the pipeline
    uses (not a window sort)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", "event_type")
        .agg(F.min(F.struct("ts", "event_id")).alias("w"))
        .select("user_id", "event_type", F.col("w.event_id").alias("event_id"))
    )


def q_context_window(spark, sf_dir):
    """W1/W2 before/after context: 3 lags + 3 leads around error events."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.lag("event_id", 1).over(w).alias("before1"),
        F.lag("event_id", 2).over(w).alias("before2"),
        F.lag("event_id", 3).over(w).alias("before3"),
        F.lead("event_id", 1).over(w).alias("after1"),
        F.lead("event_id", 2).over(w).alias("after2"),
        F.lead("event_id", 3).over(w).alias("after3"),
    )
    return d.filter(F.col("event_type") == "error").drop("event_type")


def q_agg_counts(spark, sf_dir):
    """A1/A2/A3: per-conv line/byte/anomaly-ish counters.

    mean_value accumulates through an exact DECIMAL sum rather than a
    float64 AVG: double accumulation is order-dependent, and Spark vs
    DuckDB summation orders once produced a 4-dp rounding tie
    (56.2087 vs 56.2088). The decimal sum is exact and its cast to double
    plus the division are IEEE-deterministic, so both engines produce
    bit-identical means with NO final ROUND — a ROUND would reintroduce
    engine-specific tie behavior on exact 4-dp midpoints (measured:
    3118.29/56 = 55.68375 rounds 55.6837 in Spark, 55.6838 in DuckDB)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("line_count"),
        F.sum(F.octet_length("props")).alias("byte_count"),
        F.sum((F.col("event_type") == "error").cast("long")).alias("error_count"),
        (
            F.sum(F.col("value").cast("decimal(20,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mean_value"),
    )


def q_score_hist(spark, sf_dir):
    """A6 score histogram: width-bucketed counts."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(
            F.least(F.floor(F.col("value") / 50).cast("int"), F.lit(19)).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def q_topk_discovery(spark, sf_dir):
    """S9/W5/K3 baseline discovery: best-scored candidate per group."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("best_price"))
    )


def q_enrich_join(spark, sf_dir):
    """J1/J3 lookup enrich: broadcast-join facts against small dims."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


def q_similarity_cooc(spark, sf_dir):
    """J4/U3 similarity report: identical payloads seen by >1 conversation."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type", "props")
        .agg(F.countDistinct("user_id").alias("nusers"))
        .filter(F.col("nusers") > 1)
    )


def q_dedup_exact(spark, sf_dir):
    """Exact duplicate detection: md5-keyed groups over documents."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5(F.col("text")).alias("h"))
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("dup_count"))
        .filter(F.col("dup_count") > 1)
    )


def q_textstats(spark, sf_dir):
    """Text quality scoring: word/char counts + token-ish counting."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_words"),
        F.length("text").alias("n_chars_m"),
        F.size(F.regexp_extract_all("text", F.lit("[a-zA-Z0-9_]+"), 0)).alias("n_tokens"),
    )


def q_ann_cosine(spark, sf_dir):
    """Brute-force cosine similarity of every embedding to vec_id 0."""
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    q = e.filter(F.col("vec_id") == 0).select(F.col("emb").alias("qemb"))
    j = e.crossJoin(F.broadcast(q))
    dot = F.aggregate(
        F.zip_with("emb", "qemb", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = lambda c: F.sqrt(
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x)
    )  # noqa: E731
    return j.select(
        "vec_id",
        F.round(dot / (nrm(F.col("emb")) * nrm(F.col("qemb"))), 4).alias("cos_sim"),
    )


ORACLE_SQL = {
    "q_turns_parse": f"SELECT conv_id, turn_idx, role, text, tool FROM ({_TURNS_SQL}) t",
    "q_subline_explode": (
        "SELECT doc_id, unnest(string_split_regex(text, '\\. ')) AS piece FROM documents"
    ),
    "q_filter_lines": (
        "SELECT doc_id, source, n_chars FROM documents "
        "WHERE strlen(text) <= 200 AND NOT regexp_matches(source, '^(web|crawl)$')"
    ),
    "q_dedup_first": (
        "SELECT user_id, event_type, event_id FROM ("
        " SELECT user_id, event_type, event_id,"
        "        row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn"
        " FROM events) WHERE rn = 1"
    ),
    "q_context_window": (
        "SELECT user_id, event_id, before1, before2, before3, after1, after2, after3 FROM ("
        " SELECT user_id, event_id, event_type,"
        "  lag(event_id, 1) OVER w AS before1, lag(event_id, 2) OVER w AS before2,"
        "  lag(event_id, 3) OVER w AS before3, lead(event_id, 1) OVER w AS after1,"
        "  lead(event_id, 2) OVER w AS after2, lead(event_id, 3) OVER w AS after3"
        " FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))"
        " WHERE event_type = 'error'"
    ),
    # DuckDB SUMs of integers return HUGEINT (int128), which lands in pandas
    # as dtype=object and hash-mismatches Spark's BIGINT — cast every SUM.
    "q_agg_counts": (
        "SELECT user_id, COUNT(*) AS line_count,"
        " CAST(SUM(strlen(props)) AS BIGINT) AS byte_count,"
        " CAST(SUM(CASE WHEN event_type='error' THEN 1 ELSE 0 END) AS BIGINT) AS error_count,"
        " CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) / COUNT(*) AS mean_value"
        " FROM events GROUP BY user_id"
    ),
    "q_score_hist": (
        "SELECT LEAST(CAST(FLOOR(value/50) AS INT), 19) AS bucket, COUNT(*) AS count"
        " FROM events GROUP BY 1"
    ),
    "q_topk_discovery": (
        "SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS best_price FROM ("
        " SELECT o_custkey, o_orderkey, o_totalprice,"
        "  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) rn"
        " FROM orders) WHERE rn = 1"
    ),
    "q_enrich_join": (
        "SELECT n_name, COUNT(*) AS order_count, ROUND(SUM(o_totalprice), 2) AS revenue"
        " FROM orders JOIN customer ON o_custkey = c_custkey"
        " JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name"
    ),
    "q_similarity_cooc": (
        "SELECT event_type, props, COUNT(DISTINCT user_id) AS nusers"
        " FROM events GROUP BY event_type, props HAVING COUNT(DISTINCT user_id) > 1"
    ),
    "q_dedup_exact": (
        "SELECT md5(text) AS h, MIN(doc_id) AS keep_id, COUNT(*) AS dup_count"
        " FROM documents GROUP BY md5(text) HAVING COUNT(*) > 1"
    ),
    "q_textstats": (
        "SELECT doc_id, len(string_split(text, ' ')) AS n_words,"
        " length(text) AS n_chars_m,"
        " len(regexp_extract_all(text, '[a-zA-Z0-9_]+')) AS n_tokens FROM documents"
    ),
    "q_ann_cosine": (
        "SELECT e.vec_id, ROUND(list_cosine_similarity("
        "  CAST(e.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])), 4) AS cos_sim"
        " FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q"
    ),
}


# --------------------------------------------------------------------------
# rows-only queries (UDF-bearing; no SQL oracle possible)
# --------------------------------------------------------------------------

def q_tokenize(spark, sf_dir):
    """T1-T13: the tokenizer as a vectorized projection over documents."""
    from .tokenizer import tokenize_udf

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", tokenize_udf()(F.col("text")).alias("tokens"))


def q_dedup_key(spark, sf_dir):
    """F6/U the unordered dedup key (unordered.rs:9-22): sorted
    non-%-prefixed words of the tokenized line, computed by the pipeline's
    JVM expression. Tokens are staged; the oracle recomputes the key in
    DuckDB from the identical tokens, so the JVM split/filter/sort/join
    expression is value-verified independently."""
    from .tokenizer import tokenize_udf

    d = _t(spark, sf_dir, "documents")
    toks = _stage(
        spark,
        d.select("doc_id", tokenize_udf()(F.col("text")).alias("tokens")),
        "dkey_tokens",
    )
    return toks.select(
        "doc_id",
        F.array_join(
            F.array_sort(
                F.filter(F.split("tokens", " "), lambda w: ~w.startswith("%"))
            ),
            " ",
        ).alias("dkey"),
    )


def q_pipeline_anomalies(spark, sf_dir):
    """E1/E2 flagship: full diff run on the events-derived transcript table."""
    from . import pipeline

    # round 6: the turns view is NOT cached. Measured at sf1.0 the in-memory
    # columnar cache build + count cost ~2.0s while one full uncached pass of
    # the view is 1.65s — and the two consumers (target parse, baseline
    # train) run on overlapped threads anyway, so paying the window twice in
    # parallel is cheaper than serializing a cache materialization in front
    # of both. The target-row upper bound run() wants (to skip its
    # limit-probe jobs) comes from the events parquet FOOTERS — read
    # directly with pyarrow (milliseconds, no Spark job; a Spark
    # metadata count still costs ~0.2s of scheduling): turns_view is a
    # 1:1 projection of events, so the counts are equal by construction.
    t = turns_view(spark, sf_dir)
    n_rows = _parquet_row_count(f"{sf_dir}/events.parquet")
    if n_rows is None:
        n_rows = _t(spark, sf_dir, "events").count()
    baseline = t.filter(F.col("is_baseline") & (F.col("etype") != "error")).drop(
        "is_baseline", "etype"
    )
    target = t.filter(~F.col("is_baseline")).drop("is_baseline", "etype")
    out = pipeline.run(spark, target, baseline_turns=baseline, input_rows=n_rows)
    return out["anomalies"].select(
        "conv_id", "turn_idx", "tool", "text", F.round("score", 4).alias("score")
    )


QUERIES = {
    "q_turns_parse": q_turns_parse,
    "q_subline_explode": q_subline_explode,
    "q_filter_lines": q_filter_lines,
    "q_dedup_first": q_dedup_first,
    "q_context_window": q_context_window,
    "q_agg_counts": q_agg_counts,
    "q_score_hist": q_score_hist,
    "q_topk_discovery": q_topk_discovery,
    "q_enrich_join": q_enrich_join,
    "q_similarity_cooc": q_similarity_cooc,
    "q_dedup_exact": q_dedup_exact,
    "q_textstats": q_textstats,
    "q_ann_cosine": q_ann_cosine,
    "q_tokenize": q_tokenize,
    "q_dedup_key": q_dedup_key,
    "q_pipeline_anomalies": q_pipeline_anomalies,
}


# --------------------------------------------------------------------------
# extras: dedup / ANN / textstats / multimodal / errors / similarity
# --------------------------------------------------------------------------

def q_lang_id(spark, sf_dir):
    """Language-ID: per-language marker scores + argmax guess (JVM-side)."""
    from .extras.textstats import language_id

    return language_id(_t(spark, sf_dir, "documents"))


def q_quality(spark, sf_dir):
    """Quality scoring: length/punct/stopword/upper/digit ratios."""
    from .extras.textstats import quality_score

    return quality_score(_t(spark, sf_dir, "documents"))


def q_minhash_pairs(spark, sf_dir):
    """MinHash+LSH near-duplicate candidate pairs over documents. The
    signature UDF output is staged so the oracle reproduces the banding,
    bucket join and Jaccard-estimate verify over identical signatures."""
    from .extras.dedup import minhash_lsh_pairs, minhash_signatures

    sigs = _stage(
        spark, minhash_signatures(_t(spark, sf_dir, "documents")), "minhash_sigs"
    )
    return minhash_lsh_pairs(sigs, threshold=0.5)


def q_dedup_groups(spark, sf_dir):
    """Connected components of the MinHash near-dup graph (fixpoint
    min-label propagation, extras.dedup.minhash_dedup_groups). The
    candidate pairs and the id universe are staged; the oracle recomputes
    the components independently with a recursive CTE (transitive closure,
    then min reachable label) over the identical graph."""
    from .extras.dedup import (
        minhash_dedup_groups, minhash_lsh_pairs, minhash_signatures,
    )

    # round 6: stage the signatures FIRST — the pairs plan references the
    # sigs relation five times (first(), band self-join left/right, the
    # two verify joins), so an unstaged sigs re-ran the signature UDF per
    # reference (measured 6.1s -> 2.1s for the pairs at sf0.1). Staged
    # values are identical (deterministic UDF), so cc_pairs/cc_ids and
    # the oracle's re-derivation are unchanged.
    sigs = _stage(spark, minhash_signatures(_t(spark, sf_dir, "documents")), "cc_sigs")
    pairs = _stage(
        spark,
        minhash_lsh_pairs(sigs, threshold=0.5).select("id_a", "id_b"),
        "cc_pairs",
    )
    ids = _stage(spark, sigs.select("id"), "cc_ids")
    return minhash_dedup_groups(pairs, ids)


def q_simhash_pairs(spark, sf_dir):
    """SimHash near-duplicate pairs (Hamming <= 3); signatures staged so the
    oracle replays the pigeonhole banding + Hamming verify."""
    from .extras.dedup import simhash_near_pairs, simhash_signatures

    sigs = _stage(
        spark, simhash_signatures(_t(spark, sf_dir, "documents")), "simhash_sigs"
    )
    return simhash_near_pairs(sigs)


def q_embedding_near_dup(spark, sf_dir):
    """Embedding-cosine near-dup pairs via hyperplane LSH buckets; the
    bucket assignments are staged so the oracle replays the bucket join +
    exact-cosine verify."""
    from .extras.dedup import embedding_buckets, embedding_verify

    e = _stage(
        spark, embedding_buckets(_t(spark, sf_dir, "embeddings")), "emb_buckets"
    )
    return embedding_verify(e, threshold=0.98)


def q_fingerprint(spark, sf_dir):
    """Winnowing fingerprints, exploded to relational (id, pos, fp) grain
    (scalar columns so results sort/hash cleanly; also the useful shape for
    the clone-pair join). The per-doc arrays are staged to parquet so the
    oracle can verify the explode over identical inputs."""
    from .extras.textstats import fingerprint

    sigs = _stage(spark, fingerprint(_t(spark, sf_dir, "documents")), "fp_sigs")
    return sigs.select("id", F.posexplode("fingerprints").alias("pos", "fp"))


def q_fingerprint_pairs(spark, sf_dir):
    """Cross-doc clone detection: explode fingerprints, bucket-join on the
    shared fingerprint value, count shared fingerprints per doc pair.
    Mirrors the dedup suite's shape — no all-pairs product, only docs
    sharing a fingerprint ever meet."""
    from .extras.textstats import fingerprint, fingerprint_pairs

    sigs = _stage(
        spark, fingerprint(_t(spark, sf_dir, "documents")), "fp_sigs_pairs"
    )
    return fingerprint_pairs(sigs, min_shared=2)


def q_ann_ivf(spark, sf_dir):
    """IVF approximate top-k against the vec_id 0 query. Cell assignments
    and the probed-cell list are staged; the oracle replays the pruning +
    exact cosine top-k."""
    from .extras.ann import (
        ivf_assign, ivf_search, probe_cells, train_centroids_distributed,
    )

    emb = _t(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    # distributed Lloyd (every vector, map-side partial sums) — the
    # scale-correct trainer; the sampled driver trainer remains for cheap
    # ad-hoc codebooks
    cents = train_centroids_distributed(spark, emb, n_cells=8, iters=6)
    cells = _stage(
        spark,
        ivf_assign(spark, emb, cents).select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding"), "cell"
        ),
        "ivf_cells",
    )
    probe = probe_cells(cents, query, nprobe=3)
    _stage(spark, spark.createDataFrame([(int(c),) for c in probe], "cell int"), "ivf_probe")
    return ivf_search(cells, query, probe, k=20)


def _errors_turns(spark, sf_dir):
    """Events-derived transcripts with a syslog-style error marker on error
    events so the single-line error regex set has something to find."""
    t = turns_view(spark, sf_dir)
    return t.withColumn(
        "text",
        F.when(
            F.col("etype") == "error", F.concat(F.col("text"), F.lit(' msg="error occurred"'))
        ).otherwise(F.col("text")),
    ).drop("is_baseline", "etype")


def q_errors_report(spark, sf_dir):
    """E3: model-free error extraction. The FSM-classified candidate lines
    are staged; the oracle independently re-derives the report rows from
    them (global first-occurrence dedup per token-set), which checks that
    errors_run's sequential assembly agrees with the relational spec."""
    from . import pipeline as P
    from .errors import error_candidates, errors_run

    t = _errors_turns(spark, sf_dir)
    # round 6: the candidates are computed from the LIGHT parse (the FSM
    # never reads tokens — the full parse staged a tokenize-UDF pass for
    # nothing), staged once, and handed back to errors_run so its
    # global-dedup dim reads the staged parquet instead of embedding a
    # second FSM subtree; the report itself is staged too so the harness's
    # evaluation of the returned frame is a parquet scan, not a third
    # full pass. Staged rows and report rows are value-identical to the
    # previous shape (same expressions, materialization points moved).
    cands = _stage(
        spark,
        error_candidates(P.parse(t, P.PipelineConfig(), columns="light")),
        "err_cands",
    )
    out = errors_run(spark, t, candidates_df=cands)
    return _stage(
        spark,
        out.select("conv_id", "turn_idx", "tool", "text", "score"),
        "err_out",
    )


def q_errors_split(spark, sf_dir):
    """E3 under the range-split skew guard (round-5): the SAME report as
    q_errors_report, but produced by the ranged windows (max_task_lines
    small enough that every conversation splits into several ranges at this
    scale, pads + warm-up verification live). The staged candidates come
    from the split path's own window scan, so DuckDB independently
    re-derives the report from what the split machinery actually computed —
    and the result must equal the single-task report's rows."""
    from . import pipeline as P
    from .errors import errors_run

    t = _errors_turns(spark, sf_dir)
    cfg = P.PipelineConfig(max_task_lines=40)
    out, cands = errors_run(
        spark, t, cfg=cfg, allow_split=True, range_pad=12,
        return_candidates=True,
    )
    _stage(spark, cands, "err_cands_split")
    # round 6: the report is staged BEFORE the split path's persisted
    # intermediates are released (ADVICE r5) — the harness's evaluation of
    # the returned frame is then a parquet scan instead of an uncached
    # re-run of the whole ranged scan (measured 18.6s -> single
    # evaluation); rows identical by construction.
    staged = _stage(
        spark,
        out.select("conv_id", "turn_idx", "tool", "text", "score"),
        "err_split_out",
    )
    P.release_stage_caches()
    return staged


def q_similarity_report(spark, sf_dir):
    """J4: cross-target anomaly co-occurrence over two flagship runs. The
    labeled anomaly union (pipeline + tokenizer UDF output) is staged; the
    oracle reproduces the whole similarity-report aggregation from it."""
    from . import pipeline
    from .similarity import similarity_report
    from .tokenizer import tokenize_udf

    t = turns_view(spark, sf_dir)
    baseline = t.filter(F.col("is_baseline") & (F.col("etype") != "error")).drop(
        "is_baseline", "etype"
    )
    target = t.filter(~F.col("is_baseline")).drop("is_baseline", "etype")
    halves = [
        target.filter(F.pmod(F.xxhash64("conv_id"), F.lit(2)) == i) for i in (0, 1)
    ]
    # round 6: train ONCE on the shared baseline instead of once per half
    # (the two runs re-trained the identical model); the middle trainer's
    # createDataFrame-backed model makes each run's collect/broadcast a
    # local no-op. Anomaly rows are unchanged (same model either way).
    from . import model as M

    _, model_df = M.train_winners_collected(
        spark, pipeline.parse(baseline, pipeline.PipelineConfig(), columns="dkey")
    )
    labeled = None
    for i, half in enumerate(halves):
        out = pipeline.run(spark, half, model_df=model_df)
        a = (
            out["anomalies"]
            .withColumn("target_id", F.lit(i))
            .withColumn("tokens", tokenize_udf()(F.col("text")))
        )
        labeled = a if labeled is None else labeled.unionByName(a)
    labeled = _stage(
        spark,
        labeled.select(
            "target_id", "conv_id", "turn_idx", "sub_idx", "text", "tokens", "tool"
        ),
        "sim_labeled",
    )
    rep = similarity_report(labeled)
    return rep.select("group", "tokens", "conv_id", "turn_idx", "n_sources")


def _known_groups_dim(model_df, parsed_target):
    """Effective is_known membership for the staged oracles: the engine's
    lookup_or_single (model.rs:857-869, enrich's single_index branch)
    treats EVERY group as known when the model holds exactly one index,
    so on a single-group baseline the staged dim must be the target's own
    group universe — staging the model's one group key would make the
    oracle's `tool IN (SELECT group_key ...)` clause drop rows the engine
    legitimately scores, false-failing the gate on a correct output."""
    groups = model_df.select("group_key").distinct()
    if groups.count() == 1:
        return parsed_target.select(F.col("tool").alias("group_key")).distinct()
    return groups


def q_flagship_anomalies(spark, sf_dir):
    """The flagship's anomaly-set semantics, DuckDB-oracled end to end.

    The emitted anomaly set is exactly: per-(tool, token-set) first
    occurrence (winner), scored above the f32 0.3 threshold, and globally
    first among anomalous occurrences of its token-set. All of that is
    relational once the two UDF products are staged (parsed lines with
    their dedup keys; winner scores), so the oracle independently
    re-derives the full set — winners aggregation, score join, global
    dedup, threshold — and the Spark side returns the REAL pipeline's
    routed anomalies. Context arrays (the one non-SQL part) are excluded
    from the projection; they are covered by the golden corpus and the
    differential fuzz suites. q_pipeline_anomalies stays unstaged for the
    bench's flagship timing."""
    from . import model as M, pipeline as P
    from .score import SCORED_SCHEMA, make_score_fn

    cfg = P.PipelineConfig()
    t_all = turns_view(spark, sf_dir).cache()
    baseline = t_all.filter(F.col("is_baseline") & (F.col("etype") != "error")).drop(
        "is_baseline", "etype"
    )
    target = t_all.filter(~F.col("is_baseline")).drop("is_baseline", "etype")

    model_df = M.train(P.parse(baseline, cfg))
    bc = M.broadcast_indexes(spark, M.collect_indexes(model_df))

    parsed_full = P.parse(target, cfg)
    _stage(spark, _known_groups_dim(model_df, parsed_full), "flag_groups")
    _stage(
        spark,
        parsed_full.select(
            "conv_id", "turn_idx", "sub_idx", "tool", "text", "dkey", "is_ignored"
        ),
        "flag_parsed",
    )
    winners = (
        parsed_full.filter(~F.col("is_ignored"))
        .withColumn("_skey", P._skey())
        .groupBy("tool", "dkey")
        .agg(
            F.min("_skey").alias("skey"),
            F.min_by("tokens", "_skey").alias("tokens"),
        )
    )
    scored = winners.mapInPandas(make_score_fn(bc), SCORED_SCHEMA)
    _stage(spark, scored.select("tool", "dkey", "score"), "flag_scored")

    out = P.run(spark, target, model_df=model_df, cfg=cfg)
    t_all.unpersist()
    return out["anomalies"].select(
        "conv_id", "turn_idx", "tool", "text", F.col("score").cast("float").alias("score")
    )


def q_pipeline_anomalies_oracle(spark, sf_dir):
    """Staged twin of q_pipeline_anomalies (round-4 verdict ask #5): the
    SAME run() invocation the bench times — training inside run(), with
    baseline_turns + input_rows, NOT the pre-trained-model path
    q_flagship_anomalies drives — plus oracle staging of the model groups,
    parsed lines and winner scores so DuckDB independently re-derives the
    anomaly set for THIS code path too. The staged intermediates are
    recomputed with the same cfg; the engine's f32 and (conv,turn,sub)
    ordering discipline makes them bit-identical to what run() derives
    internally, which the value-hash match then proves.
    q_pipeline_anomalies itself stays unstaged so the bench's flagship
    timing is free of staging writes."""
    from . import model as M, pipeline as P
    from .score import SCORED_SCHEMA, make_score_fn

    cfg = P.PipelineConfig()
    t = turns_view(spark, sf_dir).cache()
    n_rows = t.count()
    baseline = t.filter(F.col("is_baseline") & (F.col("etype") != "error")).drop(
        "is_baseline", "etype"
    )
    target = t.filter(~F.col("is_baseline")).drop("is_baseline", "etype")

    model_df = M.train(P.parse(baseline, cfg))
    bc = M.broadcast_indexes(spark, M.collect_indexes(model_df))
    parsed_full = P.parse(target, cfg)
    _stage(spark, _known_groups_dim(model_df, parsed_full), "pipe_groups")
    _stage(
        spark,
        parsed_full.select(
            "conv_id", "turn_idx", "sub_idx", "tool", "text", "dkey", "is_ignored"
        ),
        "pipe_parsed",
    )
    winners = (
        parsed_full.filter(~F.col("is_ignored"))
        .withColumn("_skey", P._skey())
        .groupBy("tool", "dkey")
        .agg(
            F.min("_skey").alias("skey"),
            F.min_by("tokens", "_skey").alias("tokens"),
        )
    )
    scored = winners.mapInPandas(make_score_fn(bc), SCORED_SCHEMA)
    _stage(spark, scored.select("tool", "dkey", "score"), "pipe_scored")

    out = P.run(spark, target, baseline_turns=baseline, input_rows=n_rows, cfg=cfg)
    t.unpersist()
    return out["anomalies"].select(
        "conv_id", "turn_idx", "tool", "text",
        F.col("score").cast("float").alias("score"),
    )


def q_score_distributed(spark, sf_dir):
    """J2's core math as relational algebra: the distributed scorer's join
    half over STAGED vector entries and model coordinates. DuckDB verifies
    the dot products, the per-line max and the distance clamp — the heart
    of the engine's scoring, previously only golden-tested."""
    from . import model as M, pipeline as P
    from .score import explode_model, score_join, vectorize_entries

    t_all = turns_view(spark, sf_dir)
    baseline = t_all.filter(F.col("is_baseline") & (F.col("etype") != "error")).drop(
        "is_baseline", "etype"
    )
    target = t_all.filter(~F.col("is_baseline")).drop("is_baseline", "etype")
    cfg = P.PipelineConfig()
    model_df = M.train(P.parse(baseline, cfg))
    parsed_t = P.parse(target, cfg)
    winners = (
        parsed_t.filter(~F.col("is_ignored"))
        .withColumn("_skey", P._skey())
        .groupBy("tool", "dkey")
        .agg(
            F.min("_skey").alias("skey"),
            F.min_by("tokens", "_skey").alias("tokens"),
        )
    )
    w = _stage(spark, winners.select("tool", "dkey", "skey", "tokens"), "score_winners")
    t = _stage(spark, vectorize_entries(w), "score_vec")
    m = _stage(spark, explode_model(model_df), "score_model")
    return score_join(t, m, w, single_index=False).select("tool", "dkey", "score")


def q_media_features(spark, sf_dir):
    """Multimodal plumbing: binary payloads -> typed metadata via the
    mapInPandas extractor. The synthetic media table is staged so the oracle
    recomputes n_bytes/decode_ok, plus a JVM-side content hash over the hex
    encoding (DuckDB's sha256 takes VARCHAR only, so both engines hash the
    hex form; the extractor's raw-byte sha256 is unit-tested against
    F.sha2(payload) separately)."""
    from .extras.multimodal import extract_features, synth_media

    media = _stage(spark, synth_media(spark, 96), "media")
    feats = extract_features(media).select("media_id", "modality", "n_bytes", "decode_ok")
    sha = media.select(
        F.col("media_id").alias("_mid"), F.sha2(F.hex("payload"), 256).alias("sha_hex")
    )
    return (
        feats.join(F.broadcast(sha), feats["media_id"] == F.col("_mid"))
        .drop("_mid")
        .select("media_id", "modality", "n_bytes", "sha_hex", "decode_ok")
    )


_LANG_MARKERS_SQL = {
    "en": "['the','and','of','to','is','in','that','it','was','for']",
    "de": "['der','die','und','das','ist','nicht','ein','mit','auf','zu']",
    "fr": "['le','la','les','et','est','une','que','pour','dans','pas']",
    "es": "['el','la','los','las','es','una','que','por','con','para']",
}

_LANG_SCORES_SQL = ", ".join(
    f"len(list_filter(string_split(text, ' '), w -> list_contains({m}, lower(w)))) AS score_{lg}"
    for lg, m in sorted(_LANG_MARKERS_SQL.items())
)

ORACLE_SQL["q_lang_id"] = f"""
WITH s AS (SELECT doc_id AS id, {_LANG_SCORES_SQL} FROM documents),
b AS (SELECT *, greatest(score_de, score_en, score_es, score_fr) AS best FROM s)
SELECT id, score_de, score_en, score_es, score_fr,
  CASE WHEN best <= 0 THEN 'und'
       WHEN score_de = best THEN 'de'
       WHEN score_en = best THEN 'en'
       WHEN score_es = best THEN 'es'
       WHEN score_fr = best THEN 'fr' END AS lang_guess
FROM b
"""

ORACLE_SQL["q_quality"] = """
WITH r AS (
  SELECT doc_id AS id,
    length(text) AS n_chars,
    len(string_split(text, ' ')) AS n_words,
    length(text) / greatest(len(string_split(text, ' ')), 1) AS mean_word_len,
    len(list_filter(string_split(text, ' '),
        w -> list_contains(['the','and','of','to','is','in','that','it','was','for'], lower(w))))
      / greatest(len(string_split(text, ' ')), 1) AS stop_ratio,
    length(regexp_replace(text, '[^!-/:-@\\[-`{-~]', '', 'g')) / greatest(length(text), 1) AS punct_ratio,
    length(regexp_replace(text, '[^A-Z]', '', 'g')) / greatest(length(text), 1) AS upper_ratio,
    length(regexp_replace(text, '[^0-9]', '', 'g')) / greatest(length(text), 1) AS digit_ratio
  FROM documents)
SELECT id, n_words,
  round(mean_word_len, 4) AS mean_word_len,
  round(stop_ratio, 4) AS stop_ratio,
  round(punct_ratio, 4) AS punct_ratio,
  round(upper_ratio, 4) AS upper_ratio,
  round(digit_ratio, 4) AS digit_ratio,
  round(greatest(CASE WHEN n_words < 5 THEN 0.0
                      WHEN mean_word_len < 2 THEN 0.2
                      WHEN mean_word_len > 12 THEN 0.2
                      ELSE least(1.0, 0.4 + stop_ratio * 2 - punct_ratio
                                 - greatest(upper_ratio - 0.3, 0.0) - digit_ratio) END,
                 0.0), 4) AS quality
FROM r
"""

QUERIES.update(
    {
        "q_lang_id": q_lang_id,
        "q_quality": q_quality,
        "q_minhash_pairs": q_minhash_pairs,
        "q_dedup_groups": q_dedup_groups,
        "q_simhash_pairs": q_simhash_pairs,
        "q_embedding_near_dup": q_embedding_near_dup,
        "q_fingerprint": q_fingerprint,
        "q_fingerprint_pairs": q_fingerprint_pairs,
        "q_ann_ivf": q_ann_ivf,
        "q_errors_report": q_errors_report,
        "q_errors_split": q_errors_split,
        "q_similarity_report": q_similarity_report,
        "q_score_distributed": q_score_distributed,
        "q_flagship_anomalies": q_flagship_anomalies,
        "q_pipeline_anomalies_oracle": q_pipeline_anomalies_oracle,
        "q_media_features": q_media_features,
    }
)


# Oracles over ORACLE_STAGE intermediates: the UDF stage (signatures, cell
# assignments, FSM candidates, ...) is staged to parquet by the query itself;
# DuckDB then independently reproduces every relational step downstream of
# the UDF (banding, bucket joins, dedup, verification, aggregation).
ORACLE_SQL.update(
    {
        "q_fingerprint": (
            f"SELECT id, CAST(generate_subscripts(fingerprints, 1) - 1 AS INT) AS pos,"
            f" unnest(fingerprints) AS fp"
            f" FROM read_parquet('{ORACLE_STAGE}/fp_sigs.parquet/*.parquet')"
        ),
        "q_fingerprint_pairs": (
            f"WITH ex AS (SELECT DISTINCT id, unnest(fingerprints) AS fp"
            f" FROM read_parquet('{ORACLE_STAGE}/fp_sigs_pairs.parquet/*.parquet'))"
            " SELECT l.id AS id_a, r.id AS id_b, COUNT(*) AS shared_count"
            " FROM ex l JOIN ex r ON l.fp = r.fp AND l.id < r.id"
            " GROUP BY 1, 2 HAVING COUNT(*) >= 2"
        ),
        "q_minhash_pairs": (
            f"WITH sigs AS (SELECT * FROM read_parquet('{ORACLE_STAGE}/minhash_sigs.parquet/*.parquet')),"
            " banded AS ("
            "  SELECT id, band, array_to_string(sig[(band*4+1):(band*4+4)], '-') AS bucket"
            "  FROM sigs, (SELECT unnest(range(0,32)) AS band)),"
            " cands AS ("
            "  SELECT DISTINCT l.id AS id_a, r.id AS id_b FROM banded l"
            "  JOIN banded r ON l.band = r.band AND l.bucket = r.bucket AND l.id < r.id),"
            " j AS ("
            "  SELECT id_a, id_b, sa.sig AS sig_a, sb.sig AS sig_b FROM cands"
            "  JOIN sigs sa ON sa.id = cands.id_a JOIN sigs sb ON sb.id = cands.id_b)"
            " SELECT id_a, id_b,"
            "  ROUND(len(list_filter(range(1,129), i -> sig_a[i] = sig_b[i])) / 128.0, 4)"
            "   AS est_jaccard"
            " FROM j"
            " WHERE ROUND(len(list_filter(range(1,129), i -> sig_a[i] = sig_b[i])) / 128.0, 4)"
            "  >= 0.5"
        ),
        "q_dedup_key": (
            f"SELECT doc_id, array_to_string(list_sort(list_filter("
            f" string_split(tokens, ' '), w -> NOT starts_with(w, '%'))), ' ')"
            f" AS dkey"
            f" FROM read_parquet('{ORACLE_STAGE}/dkey_tokens.parquet/*.parquet')"
        ),
        "q_dedup_groups": (
            f"WITH RECURSIVE"
            f" e AS (SELECT id_a, id_b FROM read_parquet('{ORACLE_STAGE}/cc_pairs.parquet/*.parquet')),"
            f" ids AS (SELECT id FROM read_parquet('{ORACLE_STAGE}/cc_ids.parquet/*.parquet')),"
            " edges AS (SELECT id_a AS id, id_b AS nbr FROM e"
            "   UNION ALL SELECT id_b, id_a FROM e),"
            " reach(id, label) AS ("
            "   SELECT id, id FROM ids"
            "   UNION"
            "   SELECT edges.id, reach.label FROM edges"
            "   JOIN reach ON edges.nbr = reach.id)"
            " SELECT id, MIN(label) AS keep_id FROM reach GROUP BY id"
        ),
        "q_simhash_pairs": (
            f"WITH sigs AS (SELECT * FROM read_parquet('{ORACLE_STAGE}/simhash_sigs.parquet/*.parquet')),"
            " chunks AS ("
            "  SELECT id, simhash, band, (simhash >> (16*band)) & 65535 AS chunk"
            "  FROM sigs, (SELECT unnest(range(0,4)) AS band)),"
            " cands AS ("
            "  SELECT DISTINCT l.id AS id_a, r.id AS id_b, l.simhash AS sh_a, r.simhash AS sh_b"
            "  FROM chunks l JOIN chunks r"
            "  ON l.band = r.band AND l.chunk = r.chunk AND l.id < r.id)"
            " SELECT id_a, id_b, CAST(bit_count(xor(sh_a, sh_b)) AS INT) AS hamming"
            " FROM cands WHERE bit_count(xor(sh_a, sh_b)) <= 3"
        ),
        "q_embedding_near_dup": (
            f"WITH e AS (SELECT * FROM read_parquet('{ORACLE_STAGE}/emb_buckets.parquet/*.parquet'))"
            " SELECT l.id AS id_a, r.id AS id_b,"
            "  ROUND(list_cosine_similarity(l.v, r.v), 4) AS cos_sim"
            " FROM e l JOIN e r ON l.bucket = r.bucket AND l.id < r.id"
            # zero-norm exclusion mirrors embedding_verify's NaN guard
            " WHERE list_dot_product(l.v, l.v) > 0"
            "  AND list_dot_product(r.v, r.v) > 0"
            "  AND ROUND(list_cosine_similarity(l.v, r.v), 4) >= 0.98"
        ),
        "q_ann_ivf": (
            f"WITH c AS (SELECT * FROM read_parquet('{ORACLE_STAGE}/ivf_cells.parquet/*.parquet')),"
            f" p AS (SELECT * FROM read_parquet('{ORACLE_STAGE}/ivf_probe.parquet/*.parquet')),"
            " q AS (SELECT embedding AS qv FROM c WHERE vec_id = 0)"
            " SELECT c.vec_id AS id, ROUND(list_cosine_similarity(c.embedding, q.qv), 4)"
            "  AS cos_sim"
            " FROM c, q WHERE c.cell IN (SELECT cell FROM p)"
            # zero-norm exclusion mirrors ivf_search's NaN guard
            "  AND list_dot_product(c.embedding, c.embedding) > 0"
            " ORDER BY cos_sim DESC, id LIMIT 20"
        ),
        "q_errors_report": (
            f"WITH c AS (SELECT * FROM read_parquet('{ORACLE_STAGE}/err_cands.parquet/*.parquet')),"
            " w AS (SELECT dkey, MIN(struct_pack(c := conv_id, t := turn_idx, s := sub_idx))"
            "  AS m FROM c GROUP BY dkey)"
            " SELECT c.conv_id, c.turn_idx, c.tool, c.text, CAST(0.5 AS FLOAT) AS score"
            " FROM c JOIN w ON c.dkey = w.dkey"
            " WHERE c.conv_id = (w.m).c AND c.turn_idx = (w.m).t AND c.sub_idx = (w.m).s"
        ),
        # the split path stages ITS OWN candidate scan (ranged windows);
        # same relational re-derivation as q_errors_report over them
        "q_errors_split": (
            f"WITH c AS (SELECT * FROM read_parquet('{ORACLE_STAGE}/err_cands_split.parquet/*.parquet')),"
            " w AS (SELECT dkey, MIN(struct_pack(c := conv_id, t := turn_idx, s := sub_idx))"
            "  AS m FROM c GROUP BY dkey)"
            " SELECT c.conv_id, c.turn_idx, c.tool, c.text, CAST(0.5 AS FLOAT) AS score"
            " FROM c JOIN w ON c.dkey = w.dkey"
            " WHERE c.conv_id = (w.m).c AND c.turn_idx = (w.m).t AND c.sub_idx = (w.m).s"
        ),
        "q_similarity_report": (
            f"WITH a AS (SELECT tool AS grp, target_id, conv_id, turn_idx, sub_idx, tokens"
            f" FROM read_parquet('{ORACLE_STAGE}/sim_labeled.parquet/*.parquet')),"
            " f AS (SELECT grp, tokens,"
            "  MIN(struct_pack(t := target_id, c := conv_id, ti := turn_idx, s := sub_idx)) AS m"
            "  FROM a GROUP BY grp, tokens),"
            " contrib AS ("
            "  SELECT a.grp, a.tokens, a.target_id, a.conv_id, f.m"
            "  FROM a JOIN f ON a.grp = f.grp AND a.tokens = f.tokens"
            "  WHERE (a.target_id = (f.m).t AND a.conv_id = (f.m).c"
            "         AND a.turn_idx = (f.m).ti AND a.sub_idx = (f.m).s)"
            "     OR a.target_id > (f.m).t)"
            " SELECT grp AS \"group\", tokens, (MIN(m)).c AS conv_id, (MIN(m)).ti AS turn_idx,"
            "  CAST(COUNT(DISTINCT ROW(target_id, conv_id)) AS INT) AS n_sources"
            " FROM contrib GROUP BY grp, tokens"
        ),
        # flagship anomaly-set semantics, independently re-derived: winners
        # (first occurrence per (tool, token-set)), score join, f32-0.3
        # threshold (the literal is float32(0.3) promoted to double, the
        # exact comparison Spark performs), global dedup (first anomalous
        # occurrence per token-set)
        "q_flagship_anomalies": (
            f"WITH p AS (SELECT * FROM read_parquet('{ORACLE_STAGE}/flag_parsed.parquet/*.parquet')),"
            f" g AS (SELECT * FROM read_parquet('{ORACLE_STAGE}/flag_groups.parquet/*.parquet')),"
            f" s AS (SELECT * FROM read_parquet('{ORACLE_STAGE}/flag_scored.parquet/*.parquet')),"
            " elig AS (SELECT * FROM p WHERE NOT is_ignored"
            "   AND tool IN (SELECT group_key FROM g)),"
            " w AS (SELECT tool, dkey,"
            "   MIN(struct_pack(c := conv_id, t := turn_idx, si := sub_idx)) AS m"
            "   FROM elig GROUP BY tool, dkey),"
            " tw AS (SELECT w.tool, w.dkey, (w.m).c AS conv_id, (w.m).t AS turn_idx,"
            "   (w.m).si AS sub_idx, s.score"
            "   FROM w JOIN s ON w.tool = s.tool AND w.dkey = s.dkey),"
            " anom AS (SELECT * FROM tw WHERE score > 0.30000001192092896),"
            " gl AS (SELECT dkey,"
            "   MIN(struct_pack(c := conv_id, t := turn_idx, si := sub_idx)) AS m"
            "   FROM anom GROUP BY dkey)"
            " SELECT a.conv_id, a.turn_idx, a.tool, p2.text, CAST(a.score AS FLOAT) AS score"
            " FROM anom a JOIN gl ON a.dkey = gl.dkey"
            "  AND a.conv_id = (gl.m).c AND a.turn_idx = (gl.m).t AND a.sub_idx = (gl.m).si"
            " JOIN p p2 ON p2.conv_id = a.conv_id AND p2.turn_idx = a.turn_idx"
            "  AND p2.sub_idx = a.sub_idx"
        ),
        # identical re-derivation as q_flagship_anomalies, over the twin's
        # own staged intermediates (pipe_*) — this verifies the run()
        # invocation shape the bench actually times
        "q_pipeline_anomalies_oracle": (
            f"WITH p AS (SELECT * FROM read_parquet('{ORACLE_STAGE}/pipe_parsed.parquet/*.parquet')),"
            f" g AS (SELECT * FROM read_parquet('{ORACLE_STAGE}/pipe_groups.parquet/*.parquet')),"
            f" s AS (SELECT * FROM read_parquet('{ORACLE_STAGE}/pipe_scored.parquet/*.parquet')),"
            " elig AS (SELECT * FROM p WHERE NOT is_ignored"
            "   AND tool IN (SELECT group_key FROM g)),"
            " w AS (SELECT tool, dkey,"
            "   MIN(struct_pack(c := conv_id, t := turn_idx, si := sub_idx)) AS m"
            "   FROM elig GROUP BY tool, dkey),"
            " tw AS (SELECT w.tool, w.dkey, (w.m).c AS conv_id, (w.m).t AS turn_idx,"
            "   (w.m).si AS sub_idx, s.score"
            "   FROM w JOIN s ON w.tool = s.tool AND w.dkey = s.dkey),"
            " anom AS (SELECT * FROM tw WHERE score > 0.30000001192092896),"
            " gl AS (SELECT dkey,"
            "   MIN(struct_pack(c := conv_id, t := turn_idx, si := sub_idx)) AS m"
            "   FROM anom GROUP BY dkey)"
            " SELECT a.conv_id, a.turn_idx, a.tool, p2.text, CAST(a.score AS FLOAT) AS score"
            " FROM anom a JOIN gl ON a.dkey = gl.dkey"
            "  AND a.conv_id = (gl.m).c AND a.turn_idx = (gl.m).t AND a.sub_idx = (gl.m).si"
            " JOIN p p2 ON p2.conv_id = a.conv_id AND p2.turn_idx = a.turn_idx"
            "  AND p2.sub_idx = a.sub_idx"
        ),
        "q_score_distributed": (
            f"WITH t AS (SELECT * FROM read_parquet('{ORACLE_STAGE}/score_vec.parquet/*.parquet')),"
            f" m AS (SELECT * FROM read_parquet('{ORACLE_STAGE}/score_model.parquet/*.parquet')),"
            f" w AS (SELECT * FROM read_parquet('{ORACLE_STAGE}/score_winners.parquet/*.parquet')),"
            " d AS (SELECT t.tool, t.dkey, m.row_id, SUM(t.tval * m.mval) AS dot"
            "  FROM t JOIN m ON t.tool = m.group_key AND t.bucket = m.bucket"
            "  GROUP BY 1, 2, 3),"
            " b AS (SELECT tool, dkey, MAX(dot) AS best FROM d GROUP BY 1, 2)"
            " SELECT w.tool, w.dkey,"
            "  CAST(LEAST(CAST(1.0 AS REAL),"
            "     CAST(1.0 AS REAL) - CAST(COALESCE(b.best, 0.0) AS REAL)) AS REAL) AS score"
            " FROM w LEFT JOIN b ON w.tool = b.tool AND w.dkey = b.dkey"
        ),
        "q_media_features": (
            f"SELECT media_id, modality, CAST(octet_length(payload) AS INT) AS n_bytes,"
            f" sha256(hex(payload)) AS sha_hex,"
            f" modality IN ('image','audio','video') AS decode_ok"
            f" FROM read_parquet('{ORACLE_STAGE}/media.parquet/*.parquet')"
        ),
    }
)


# --------------------------------------------------------------------------
# OLAP operator classes (rollup / pivot / sessionization / as-of / cut)
# --------------------------------------------------------------------------

def q_rollup(spark, sf_dir):
    """Rollup aggregation over lineitem (grouping-set hierarchy)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("lstatus"),
            "n",
            "revenue",
        )
    )


def q_pivot(spark, sf_dir):
    """Pivot: per-conversation counts by event type."""
    ev = _t(spark, sf_dir, "events")
    types = ["click", "error", "login", "purchase", "signup", "view"]
    p = ev.groupBy("user_id").pivot("event_type", types).count().na.fill(0)
    return p.select("user_id", *[F.col(t).cast("long").alias(f"n_{t}") for t in types])


def q_sessionize(spark, sf_dir):
    """Gap-based sessionization (30-min inactivity) per conversation."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ep = F.col("ts").cast("timestamp").cast("long")
    gap = ep - F.lag(ep).over(w)
    flagged = ev.withColumn(
        "new_sess", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    )
    sess = flagged.withColumn(
        "session_id", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        sess.groupBy("user_id")
        .agg(
            F.max("session_id").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def q_asof_last_login(spark, sf_dir):
    """As-of lookup: for each error event, the most recent prior login of
    the same conversation (window formulation of the as-of join)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    login_ts = F.last(
        F.when(F.col("event_type") == "login", F.col("ts")), ignorenulls=True
    ).over(w)
    d = ev.withColumn("last_login_ts", login_ts).filter(F.col("event_type") == "error")
    return d.select(
        "user_id",
        "event_id",
        (
            F.col("ts").cast("timestamp").cast("long")
            - F.col("last_login_ts").cast("timestamp").cast("long")
        ).alias("secs_since_login"),
    )


def q_self_ref_cut(spark, sf_dir):
    """F5-style cut as a relational op: keep events strictly before the
    conversation's first error."""
    ev = _t(spark, sf_dir, "events")
    first_err = (
        ev.filter(F.col("event_type") == "error")
        .groupBy(F.col("user_id").alias("_u"))
        .agg(F.min(F.struct("ts", "event_id")).alias("_m"))
    )
    j = ev.join(F.broadcast(first_err), ev["user_id"] == F.col("_u"), "left")
    kept = j.filter(
        F.col("_u").isNull() | (F.struct("ts", "event_id") < F.col("_m"))
    )
    return kept.groupBy("user_id").agg(F.count(F.lit(1)).alias("kept_events"))


ORACLE_SQL.update(
    {
        "q_rollup": (
            "SELECT COALESCE(l_returnflag, 'ALL') AS rflag,"
            " COALESCE(l_linestatus, 'ALL') AS lstatus, COUNT(*) AS n,"
            " ROUND(SUM(l_extendedprice), 2) AS revenue"
            " FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)"
        ),
        # CAST ... AS BIGINT everywhere: DuckDB integer SUM yields HUGEINT,
        # which hash-mismatches Spark's BIGINT in the driver's canonicalizer
        "q_pivot": (
            "SELECT user_id,"
            " CAST(SUM(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,"
            " CAST(SUM(CASE WHEN event_type='error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,"
            " CAST(SUM(CASE WHEN event_type='login' THEN 1 ELSE 0 END) AS BIGINT) AS n_login,"
            " CAST(SUM(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,"
            " CAST(SUM(CASE WHEN event_type='signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,"
            " CAST(SUM(CASE WHEN event_type='view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view"
            " FROM events GROUP BY user_id"
        ),
        "q_sessionize": (
            "WITH g AS (SELECT user_id, event_id, ts,"
            "  CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800"
            "       OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess"
            "  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),"
            " s AS (SELECT user_id,"
            "  SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id"
            "    ROWS UNBOUNDED PRECEDING) AS session_id FROM g)"
            " SELECT user_id, CAST(MAX(session_id) AS BIGINT) AS n_sessions,"
            " COUNT(*) AS n_events FROM s GROUP BY user_id"
        ),
        "q_asof_last_login": (
            "WITH d AS (SELECT user_id, event_id, ts, event_type,"
            "  last_value(CASE WHEN event_type='login' THEN ts END IGNORE NULLS)"
            "   OVER (PARTITION BY user_id ORDER BY ts, event_id"
            "         ROWS UNBOUNDED PRECEDING) AS last_login_ts"
            "  FROM events)"
            " SELECT user_id, event_id,"
            "  epoch(ts)::BIGINT - epoch(last_login_ts)::BIGINT AS secs_since_login"
            " FROM d WHERE event_type = 'error'"
        ),
        "q_self_ref_cut": (
            "WITH fe AS (SELECT user_id, MIN(ROW(ts, event_id)) AS m"
            "  FROM events WHERE event_type='error' GROUP BY user_id)"
            " SELECT e.user_id, COUNT(*) AS kept_events"
            " FROM events e LEFT JOIN fe ON e.user_id = fe.user_id"
            " WHERE fe.user_id IS NULL OR ROW(e.ts, e.event_id) < fe.m"
            " GROUP BY e.user_id"
        ),
    }
)

QUERIES.update(
    {
        "q_rollup": q_rollup,
        "q_pivot": q_pivot,
        "q_sessionize": q_sessionize,
        "q_asof_last_login": q_asof_last_login,
        "q_self_ref_cut": q_self_ref_cut,
    }
)


def q_quantiles(spark, sf_dir):
    """Exact interpolated percentiles of value per event type (the
    score-distribution summary an aggregate stage publishes)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
    )


ORACLE_SQL["q_quantiles"] = (
    "SELECT event_type, ROUND(quantile_cont(value, 0.5), 4) AS p50,"
    " ROUND(quantile_cont(value, 0.9), 4) AS p90,"
    " ROUND(quantile_cont(value, 0.99), 4) AS p99"
    " FROM events GROUP BY event_type"
)
QUERIES["q_quantiles"] = q_quantiles
