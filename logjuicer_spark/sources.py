"""File-world sources: raw log files and tarballs -> line tables.

The reference ingests log FILES (optionally .gz/.xz-compressed) and
TARBALLS whose entries are themselves log files:

- file/dir source + decompression: source.rs:50-93 (Source::from_path,
  open_content), crates/model/src/reader.rs (flate2/xz2 readers)
- tarball traversal: source.rs:95-161 (with_tarball_source): each regular
  file entry becomes its own source named ``archive?entry=path``

Spark-first realization: one file per task — the right grain, because a
log FILE is the conversation unit (its lines must stay together and
ordered anyway, so "whole file in one task" is the partitioning the
pipeline needs, not a compromise). Plain log files ride ``binaryFiles``
(path, bytes) — log files are line-record small. TARBALLS are never
materialized as task bytes: each task opens its archive as a chunked
file handle and tarfile STREAMS members sequentially ("r|*" mode), with
nested archives opened as child tar streams over the member stream and
compressed entries stream-decompressed, so peak memory per task is
O(codec window + one line) regardless of archive size. Decompression
(.gz/.xz/.bz2 — stdlib, no native codecs needed) applies to standalone
files and to entries inside archives, mirroring the reference's reader
stack. Text is decoded UTF-8-lossy (String::from_utf8_lossy parity) and
split like Rust ``BufRead::lines`` (terminal newline dropped, per-line
trailing \\r stripped); line numbers are 1-based.

The outputs feed the existing adapters:
``pipeline.from_log_table(read_text_logs(...))`` and
``pipeline.from_archive_manifest(read_tarballs(...))`` — fileset
include/exclude predicates and IndexName grouping apply there.
"""

from __future__ import annotations

import bz2
import gzip
import io as _io
import lzma
import os as _os

from pyspark.sql import DataFrame, SparkSession

FILE_LINES_SCHEMA = "source string, line_nr int, text string"
# entry = the member's OWN path at its nesting level (drives IndexName and
# fileset checks, like Source::TarFile.path); entry_url = the full
# `outer.tar&sub=inner` chain (drives the conv id, like the reference URL)
TAR_LINES_SCHEMA = (
    "archive string, entry string, entry_url string, line_nr int, text string"
)

_TAR_SUFFIXES = (".tar", ".tar.gz", ".tgz", ".tar.xz", ".tar.bz2")

_DECOMPRESSORS = {
    ".gz": gzip.decompress,
    ".xz": lzma.decompress,
    ".bz2": bz2.decompress,
}


def _escape_hadoop_glob(p: str) -> str:
    """Hadoop's GlobPattern treats ``* ? [ ] { }`` as metacharacters (with
    backslash escaping): a LISTED literal path handed back to binaryFiles
    must not be re-expanded, or a file literally named ``a[1].log`` is
    silently missed. Literal COMMAS would be split by setInputPaths' path
    list (no escape exists at that layer) — but its splitter skips commas
    inside braces, and GlobPattern accepts a backslash-escaped comma as a
    one-option alternation, so ``c,v.log`` rides as ``c{\\,}v.log``."""
    import re

    return re.sub(r"([*?\[\]{}\\])", r"\\\1", p).replace(",", "{\\,}")


def _plain_path(p: str) -> str:
    """Spark reports binaryFiles paths in URI form (``file:/x``,
    ``hdfs://host/x``); fileset include/exclude patterns are written
    against plain paths (the form the driver-side glob listing checks).
    Strip scheme+authority so an anchored pattern (``^/data/``) matches
    the same string on both sides."""
    if p.startswith("file:") or "://" in p:
        from urllib.parse import urlparse

        return urlparse(p).path or p
    return p


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
    spark: SparkSession,
    path_glob: str,
    min_partitions: int | None = None,
    is_fp_valid=None,
) -> DataFrame:
    """(source, line_nr, text) rows for every log file under the glob;
    .gz/.xz/.bz2 files are decompressed (source keeps the original path —
    IndexName strips the suffix downstream, index_name.rs:165-177).
    ``is_fp_valid`` (e.g. FileSetConfig.is_fp_valid) prunes excluded paths
    BEFORE any read: for local globs the listing is expanded driver-side
    and excluded files (the default exclude list is full of binary formats
    — .png, .jar, .sqlite, ...) are never even opened; for remote schemes
    the predicate still applies per task before decompression/decoding."""
    sc = spark.sparkContext
    minp = min_partitions or 2
    pruned_driver_side = False
    if is_fp_valid is not None and ("://" not in path_glob or path_glob.startswith("file:")):
        import glob as _glob

        listed = _glob.glob(path_glob.replace("file:", "", 1))
        if listed:
            kept = [p for p in listed if is_fp_valid(p)]
            if not kept:
                return spark.createDataFrame([], FILE_LINES_SCHEMA)
            pruned_driver_side = True
            rdd = sc.binaryFiles(
                ",".join(_escape_hadoop_glob(p) for p in kept), minp
            )
    if not pruned_driver_side:
        rdd = sc.binaryFiles(path_glob, minp)
    # when the driver listing already pruned, the per-task recheck is
    # redundant (and Spark's URI-form path would need normalizing); for
    # remote schemes the predicate applies per task on the PLAIN path form
    # — the same form the driver check sees — before any decode work
    task_pred = None if pruned_driver_side else is_fp_valid

    def explode(kv):
        import logging

        path, data = kv
        if task_pred is not None and not task_pred(_plain_path(path)):
            return
        try:
            lines = _split_lines(_maybe_decompress(path, data))
        except Exception as e:  # corrupt codec stream: skip the FILE, not the job
            # reference parity: with_source reports the error per source and
            # continues with the remaining files (source.rs error callback)
            logging.getLogger(__name__).warning("unreadable %s: %s", path, e)
            return
        for i, line in enumerate(lines, 1):
            yield (path, i, line)

    return spark.createDataFrame(rdd.flatMap(explode), FILE_LINES_SCHEMA)


def _open_entry_stream(name: str, fobj):
    """Wrap a tar member's stream in the matching STREAMING decompressor
    (no one-shot bytes decompress): memory stays O(codec window), not
    O(decompressed entry)."""
    if name.endswith(".gz"):
        return gzip.GzipFile(fileobj=fobj)
    if name.endswith(".xz"):
        return lzma.LZMAFile(fobj)
    if name.endswith(".bz2"):
        return bz2.BZ2File(fobj)
    return fobj


class _RawReadStream(_io.RawIOBase):
    """io.RawIOBase adapter over a bare .read(n) object: tarfile's
    stream-mode ExFileObject lacks the seekable()/readinto() surface
    TextIOWrapper probes, so give it one (forward-read-only; RawIOBase
    synthesizes chunked read() from readinto)."""

    def __init__(self, f):
        self._f = f

    def readable(self):
        return True

    def readinto(self, b):
        data = self._f.read(len(b))
        n = len(data)
        b[:n] = data
        return n


def _stream_lines(fobj):
    """Rust BufRead::lines parity over a byte STREAM: incremental
    UTF-8-lossy decode, split on \\n only (TextIOWrapper newline="\\n"
    disables universal-newline translation), strip one trailing \\r per
    line; memory is O(one line), matching the reference's reader loop."""
    import io

    txt = io.TextIOWrapper(
        _RawReadStream(fobj), encoding="utf-8", errors="replace", newline="\n"
    )
    for line in txt:
        if line.endswith("\n"):
            line = line[:-1]
        if line.endswith("\r"):
            line = line[:-1]
        yield line


def _walk_tar(archive: str, fileobj, url_prefix, is_fp_valid):
    """Recursive tar traversal mirroring with_tarball_source
    (source.rs:95-161): per-LEVEL fileset check on the member's own path,
    nested tarballs recursed with a ``&sub=`` URL chain, compressed leaf
    entries stream-decompressed. Everything STREAMS (tarfile mode "r|*":
    sequential block reads, transparent archive compression, no seeks):
    a nested archive opens a child tar stream directly over the member's
    stream and leaf entries are decoded line by line, so peak task memory
    is O(codec window + one line) — the reference's reader-stack bound
    (source.rs:95-161 streams entries the same way) — not
    O(archive + largest entry) as the round-3 buffered version was."""
    import logging
    import tarfile

    log = logging.getLogger(__name__)
    try:
        tf = tarfile.open(fileobj=fileobj, mode="r|*")
    except Exception as e:  # corrupt archive: skip it, not the job
        # reference parity: with_tarball_source reports per-archive errors
        # and continues (source.rs:150-160 error callback)
        log.warning("unreadable archive %s (%s): %s", archive, url_prefix, e)
        return
    with tf:
        members = iter(tf)
        while True:
            # the member ITERATOR itself can raise on a truncated archive
            # (valid header, data cut short): stop THIS archive's traversal
            # with a warning, keep everything already yielded and every
            # other archive in the job (source.rs per-entry error callback)
            try:
                member = next(members)
            except StopIteration:
                break
            except Exception as e:
                log.warning(
                    "truncated/corrupt archive %s (%s): %s",
                    archive, url_prefix, e,
                )
                break
            if not member.isfile():
                continue
            name = member.name
            if is_fp_valid is not None and not is_fp_valid(name):
                continue
            entry_url = name if url_prefix is None else f"{url_prefix}&sub={name}"
            try:
                f = tf.extractfile(member)
            except Exception as e:  # unreadable member header: skip the ENTRY
                log.warning(
                    "unreadable entry %s in %s: %s", entry_url, archive, e
                )
                continue
            if f is None:
                continue
            if name.endswith(_TAR_SUFFIXES):
                # stream-mode members must be fully consumed before the
                # iterator advances; the recursion does exactly that
                yield from _walk_tar(archive, f, entry_url, is_fp_valid)
            else:
                # decode line by line; a codec/truncation error mid-entry
                # keeps the lines already produced, skips the REST of the
                # entry, and continues with the next member
                lines = enumerate(_stream_lines(_open_entry_stream(name, f)), 1)
                while True:
                    try:
                        i, line = next(lines)
                    except StopIteration:
                        break
                    except Exception as e:
                        log.warning(
                            "unreadable entry %s in %s: %s",
                            entry_url, archive, e,
                        )
                        break
                    yield (archive, name, entry_url, i, line)


def read_tarballs(
    spark: SparkSession,
    path_glob: str,
    min_partitions: int | None = None,
    is_fp_valid=None,
) -> DataFrame:
    """(archive, entry, entry_url, line_nr, text) rows for every regular
    leaf entry of every tarball under the glob (tar / tar.gz / tar.xz /
    tar.bz2 via ``tarfile`` auto-detection; NESTED tarballs are traversed
    with the reference's ``&sub=`` URL chaining; compressed entries are
    stream-decompressed). One archive per task; ``is_fp_valid`` (e.g.
    FileSetConfig.is_fp_valid) prunes members — including whole nested
    archives — at each level, like the reference's in-traversal check.

    Local archives (the CLI's case) are NEVER materialized as task bytes:
    the driver expands the glob and each task opens its archive as a
    chunked file handle, so a multi-GB tarball streams through a bounded
    buffer (O(codec window + one line), see _walk_tar). Remote schemes
    fall back to ``binaryFiles`` whole-archive bytes — acceptable for the
    small-archive case only, and documented as such."""
    sc = spark.sparkContext
    if "://" not in path_glob or path_glob.startswith("file:"):
        import glob as _glob

        # regular files only: a glob can match directories or dangling
        # symlinks, which the old binaryFiles path tolerated (it expanded
        # dirs and skipped broken links) — the streamed path must not let
        # one of those abort the job
        paths = sorted(
            p
            for p in _glob.glob(path_glob.replace("file:", "", 1))
            if _os.path.isfile(p)
        )
        if not paths:
            raise FileNotFoundError(f"no archives match {path_glob}")

        def explode_path(path):
            import logging

            try:
                f = open(path, "rb")
            except OSError as e:  # vanished/unreadable since listing
                logging.getLogger(__name__).warning(
                    "unreadable archive %s: %s", path, e
                )
                return
            with f:
                yield from _walk_tar(path, f, None, is_fp_valid)

        rdd = sc.parallelize(paths, len(paths)).flatMap(explode_path)
    else:

        def explode_bytes(kv):
            import io

            path, data = kv
            yield from _walk_tar(path, io.BytesIO(data), None, is_fp_valid)

        rdd = sc.binaryFiles(path_glob, min_partitions or 2).flatMap(explode_bytes)
    return spark.createDataFrame(rdd, TAR_LINES_SCHEMA)


def turns_from_files(spark: SparkSession, path_glob: str, fileset=None) -> DataFrame:
    """Log files -> TURNS (conversation per file, tool per IndexName). The
    fileset check runs inside the reader, before any decode work."""
    from .pipeline import from_log_table

    pred = fileset.is_fp_valid if fileset is not None else None
    return from_log_table(read_text_logs(spark, path_glob, is_fp_valid=pred))


def turns_from_tarballs(spark: SparkSession, path_glob: str, fileset=None) -> DataFrame:
    """Tarballs -> TURNS (conversation per ``archive?entry=`` source, with
    ``&sub=`` chains for nested archives). The fileset check runs per
    traversal level on each member's own path (reference semantics), so
    the manifest adapter gets pre-filtered rows."""
    from .pipeline import from_archive_manifest

    pred = fileset.is_fp_valid if fileset is not None else None
    return from_archive_manifest(
        read_tarballs(spark, path_glob, is_fp_valid=pred),
        url_col="entry_url",
    )
