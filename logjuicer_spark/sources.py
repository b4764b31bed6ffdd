"""File-world sources: raw log files and tarballs -> line tables.

The reference ingests log FILES (optionally .gz/.xz-compressed) and
TARBALLS whose entries are themselves log files:

- file/dir source + decompression: source.rs:50-93 (Source::from_path,
  open_content), crates/model/src/reader.rs (flate2/xz2 readers)
- tarball traversal: source.rs:95-161 (with_tarball_source): each regular
  file entry becomes its own source named ``archive?entry=path``

Spark-first realization: ``binaryFiles`` gives (path, bytes) with one file
per task — the right grain, because a log FILE is the conversation unit
(its lines must stay together and ordered anyway, so "whole file in one
task" is the partitioning the pipeline needs, not a compromise). Entries
inside a tar are STREAMED member by member (tarfile reads sequentially),
so peak memory per task is the archive plus its largest entry.
Decompression (.gz/.xz/.bz2 — stdlib, no native codecs needed) applies to
standalone files and to compressed entries inside archives, mirroring the
reference's reader stack. Text is decoded UTF-8-lossy
(String::from_utf8_lossy parity) and split like Rust ``BufRead::lines``
(terminal newline dropped, per-line trailing \\r stripped); line numbers
are 1-based.

The outputs feed the existing adapters:
``pipeline.from_log_table(read_text_logs(...))`` and
``pipeline.from_archive_manifest(read_tarballs(...))`` — fileset
include/exclude predicates and IndexName grouping apply there.
"""

from __future__ import annotations

import bz2
import gzip
import lzma

from pyspark.sql import DataFrame, SparkSession

FILE_LINES_SCHEMA = "source string, line_nr int, text string"
TAR_LINES_SCHEMA = "archive string, entry string, line_nr int, text string"

_DECOMPRESSORS = {
    ".gz": gzip.decompress,
    ".xz": lzma.decompress,
    ".bz2": bz2.decompress,
}


def _maybe_decompress(name: str, data: bytes) -> bytes:
    for ext, fn in _DECOMPRESSORS.items():
        if name.endswith(ext):
            return fn(data)
    return data


def _split_lines(data: bytes):
    """Rust BufRead::lines parity: split on \\n, drop the final empty piece
    a terminal newline produces, strip one trailing \\r per line."""
    text = data.decode("utf-8", errors="replace")
    lines = text.split("\n")
    if lines and lines[-1] == "":
        lines.pop()
    return [ln[:-1] if ln.endswith("\r") else ln for ln in lines]


def read_text_logs(
    spark: SparkSession, path_glob: str, min_partitions: int | None = None
) -> DataFrame:
    """(source, line_nr, text) rows for every log file under the glob;
    .gz/.xz/.bz2 files are decompressed (source keeps the original path —
    IndexName strips the suffix downstream, index_name.rs:165-177)."""
    rdd = spark.sparkContext.binaryFiles(path_glob, min_partitions or 2)

    def explode(kv):
        path, data = kv
        for i, line in enumerate(_split_lines(_maybe_decompress(path, data)), 1):
            yield (path, i, line)

    return spark.createDataFrame(rdd.flatMap(explode), FILE_LINES_SCHEMA)


def read_tarballs(
    spark: SparkSession, path_glob: str, min_partitions: int | None = None
) -> DataFrame:
    """(archive, entry, line_nr, text) rows for every regular-file entry of
    every tarball under the glob (tar / tar.gz / tar.xz / tar.bz2 via
    ``tarfile`` auto-detection; compressed ENTRIES are decompressed too).
    One archive per task; members streamed sequentially
    (source.rs:95-161 semantics — each entry is its own source)."""
    rdd = spark.sparkContext.binaryFiles(path_glob, min_partitions or 2)

    def explode(kv):
        import io
        import tarfile

        path, data = kv
        with tarfile.open(fileobj=io.BytesIO(data), mode="r:*") as tf:
            for member in tf:
                if not member.isfile():
                    continue
                f = tf.extractfile(member)
                if f is None:
                    continue
                raw = _maybe_decompress(member.name, f.read())
                for i, line in enumerate(_split_lines(raw), 1):
                    yield (path, member.name, i, line)

    return spark.createDataFrame(rdd.flatMap(explode), TAR_LINES_SCHEMA)


def turns_from_files(spark: SparkSession, path_glob: str, fileset=None) -> DataFrame:
    """Log files -> TURNS (conversation per file, tool per IndexName)."""
    from .pipeline import from_log_table

    return from_log_table(read_text_logs(spark, path_glob), fileset=fileset)


def turns_from_tarballs(spark: SparkSession, path_glob: str, fileset=None) -> DataFrame:
    """Tarballs -> TURNS (conversation per ``archive?entry=`` source)."""
    from .pipeline import from_archive_manifest

    return from_archive_manifest(read_tarballs(spark, path_glob), fileset=fileset)
