"""File-world sources: compressed log files and tarball traversal
(source.rs:50-161 semantics — see sources.py docstring)."""

import bz2
import gzip
import io
import lzma
import os
import tarfile

from logjuicer_spark import pipeline, sources
from logjuicer_spark.config import FileSetConfig


def _write(path, data: bytes):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(data)


def test_read_text_logs_decompression_and_lines(spark, tmp_path):
    d = str(tmp_path / "logs")
    _write(f"{d}/plain.log", b"alpha one\nbeta two\r\ngamma three\n")
    _write(f"{d}/zipped.log.gz", gzip.compress(b"gz line A\ngz line B"))
    _write(f"{d}/pressed.log.xz", lzma.compress(b"xz only line\n"))
    _write(f"{d}/squeezed.log.bz2", bz2.compress(b"bz first\nbz second\n"))
    rows = sorted(
        (r.source.rsplit("/", 1)[-1], r.line_nr, r.text)
        for r in sources.read_text_logs(spark, f"{d}/*").collect()
    )
    assert rows == [
        ("plain.log", 1, "alpha one"),
        ("plain.log", 2, "beta two"),   # \r\n stripped like Rust lines()
        ("plain.log", 3, "gamma three"),
        ("pressed.log.xz", 1, "xz only line"),
        ("squeezed.log.bz2", 1, "bz first"),
        ("squeezed.log.bz2", 2, "bz second"),
        ("zipped.log.gz", 1, "gz line A"),
        ("zipped.log.gz", 2, "gz line B"),  # no terminal newline: kept
    ]


def _make_tar(path, entries, mode="w:gz"):
    with tarfile.open(path, mode) as tf:
        for name, payload in entries:
            info = tarfile.TarInfo(name=name)
            info.size = len(payload)
            tf.addfile(info, io.BytesIO(payload))


def test_read_tarballs_entries_and_inner_compression(spark, tmp_path):
    d = str(tmp_path / "archives")
    os.makedirs(d)
    _make_tar(
        f"{d}/build-1.tar.gz",
        [
            ("logs/job-output.txt", b"task one ok\ntask two FAILED\n"),
            ("logs/service.log.gz", gzip.compress(b"svc started\nsvc stopped\n")),
        ],
    )
    _make_tar(
        f"{d}/build-2.tar.xz",
        [("controller/messages", b"kernel says hi\n")],
        mode="w:xz",
    )
    rows = sorted(
        (r.archive.rsplit("/", 1)[-1], r.entry, r.entry_url, r.line_nr, r.text)
        for r in sources.read_tarballs(spark, f"{d}/*").collect()
    )
    assert rows == [
        ("build-1.tar.gz", "logs/job-output.txt", "logs/job-output.txt", 1, "task one ok"),
        ("build-1.tar.gz", "logs/job-output.txt", "logs/job-output.txt", 2, "task two FAILED"),
        ("build-1.tar.gz", "logs/service.log.gz", "logs/service.log.gz", 1, "svc started"),
        ("build-1.tar.gz", "logs/service.log.gz", "logs/service.log.gz", 2, "svc stopped"),
        ("build-2.tar.xz", "controller/messages", "controller/messages", 1, "kernel says hi"),
    ]


def test_turns_from_tarballs_source_ids_and_fileset(spark, tmp_path):
    d = str(tmp_path / "arch2")
    os.makedirs(d)
    _make_tar(
        f"{d}/run.tar.gz",
        [
            ("logs/screen-api.txt", b"api line\n"),
            ("etc/hosts", b"127.0.0.1 localhost\n"),  # default-excluded path
        ],
    )
    turns = sources.turns_from_tarballs(
        spark, f"{d}/*", fileset=FileSetConfig(includes=("screen-",))
    )
    got = turns.collect()
    assert len(got) == 1
    r = got[0]
    # Source::TarFile url shape (source.rs:95-161): archive?entry=path
    assert r.conv_id.endswith("run.tar.gz?entry=logs/screen-api.txt")
    assert r.turn_idx == 1 and r.text == "api line"


def test_diff_over_tarball_corpus_end_to_end(spark, tmp_path):
    """Full E1 flow over real tarballs: baseline archive vs target archive
    with one injected novel line."""
    d = str(tmp_path / "e2e")
    os.makedirs(d)
    steady = [f"service step {w} completed cleanly".encode() for w in
              ("alpha", "bravo", "charlie", "delta")]
    _make_tar(
        f"{d}/base.tar.gz",
        [("logs/service.log", b"\n".join(steady) + b"\n")],
    )
    tgt = steady[:2] + [b"FATAL melted reactor core detected zkx911"] + steady[2:]
    _make_tar(
        f"{d}/tgt.tar.gz",
        [("logs/service.log", b"\n".join(tgt) + b"\n")],
    )
    b = sources.turns_from_tarballs(spark, f"{d}/base.tar.gz")
    t = sources.turns_from_tarballs(spark, f"{d}/tgt.tar.gz")
    out = pipeline.run(spark, t, baseline_turns=b)
    anoms = out["anomalies"].collect()
    assert len(anoms) == 1
    assert "FATAL melted reactor" in anoms[0].text
    assert anoms[0].conv_id.endswith("tgt.tar.gz?entry=logs/service.log")


def test_cli_diff_over_tarballs(spark, tmp_path):
    """CLI surface: diff with --input-format tar over real archives."""
    import io
    import json
    import tarfile

    from logjuicer_spark import cli

    d = str(tmp_path / "cli_arch")
    os.makedirs(d)
    steady = [f"worker heartbeat {w} nominal".encode() for w in
              ("east", "west", "north", "south")]
    _make_tar(f"{d}/base.tar.gz",
              [("logs/job-output.txt", b"\n".join(steady) + b"\n")])
    tgt = steady[:1] + [b"PANIC irrecoverable quorum loss qq17x"] + steady[1:]
    _make_tar(f"{d}/tgt.tar.gz",
              [("logs/job-output.txt", b"\n".join(tgt) + b"\n")])
    out_dir = str(tmp_path / "cli_out")
    cli.main([
        "--out", out_dir, "--input-format", "tar",
        "diff", f"{d}/base.tar.gz", f"{d}/tgt.tar.gz",
    ])
    anoms = spark.read.parquet(f"{out_dir}/anomalies").collect()
    assert len(anoms) == 1 and "PANIC irrecoverable" in anoms[0].text
    with open(f"{out_dir}/report.json") as f:
        rep = json.load(f)
    assert rep["total_anomaly_count"] == 1



def test_read_tarballs_nested_archives(spark, tmp_path):
    """A tarball inside a tarball: entries surface with the reference's
    `&sub=` URL chain (source.rs:141-145), IndexName-bearing `entry` stays
    the member's own path, and the per-level fileset check can prune a
    whole nested archive."""
    import io as _io

    d = str(tmp_path / "nested")
    os.makedirs(d)
    inner = _io.BytesIO()
    with tarfile.open(fileobj=inner, mode="w:gz") as tf:
        payload = b"inner service line\n"
        info = tarfile.TarInfo(name="logs/inner.log")
        info.size = len(payload)
        tf.addfile(info, _io.BytesIO(payload))
    _make_tar(
        f"{d}/outer.tar.gz",
        [
            ("top.log", b"top level line\n"),
            ("bundle/inner.tar.gz", inner.getvalue()),
        ],
    )
    rows = sorted(
        (r.entry, r.entry_url, r.text)
        for r in sources.read_tarballs(spark, f"{d}/*").collect()
    )
    assert rows == [
        ("logs/inner.log", "bundle/inner.tar.gz&sub=logs/inner.log",
         "inner service line"),
        ("top.log", "top.log", "top level line"),
    ]
    # conv ids carry the chain through the adapter
    convs = sorted(
        r.conv_id for r in sources.turns_from_tarballs(spark, f"{d}/*").collect()
    )
    assert convs[0].endswith("outer.tar.gz?entry=bundle/inner.tar.gz&sub=logs/inner.log")
    assert convs[1].endswith("outer.tar.gz?entry=top.log")
    # pruning the nested archive path skips its whole subtree
    got = sources.read_tarballs(
        spark, f"{d}/*", is_fp_valid=lambda p: "inner.tar" not in p
    ).collect()
    assert [r.entry for r in got] == ["top.log"]

def test_corrupt_inputs_skip_not_crash(spark, tmp_path):
    """Reference parity: a corrupt file / archive / entry is reported and
    skipped; the remaining inputs still process (source.rs error callback
    semantics — one bad build artifact must not kill the whole run)."""
    d = str(tmp_path / "corrupt")
    os.makedirs(d)
    _write(f"{d}/good.log", b"healthy line\n")
    _write(f"{d}/bad.log.gz", b"this is not gzip data at all")
    rows = sources.read_text_logs(spark, f"{d}/*").collect()
    assert [(r.source.rsplit("/", 1)[-1], r.text) for r in rows] == [
        ("good.log", "healthy line")
    ]

    da = str(tmp_path / "corrupt_arch")
    os.makedirs(da)
    _make_tar(f"{da}/good.tar.gz", [("x.log", b"archive line\n")])
    _write(f"{da}/bad.tar.gz", b"definitely not a tarball")
    _make_tar(
        f"{da}/mixed.tar.gz",
        [("ok.log", b"fine\n"), ("broken.log.gz", b"not gzip either")],
    )
    rows = sources.read_tarballs(spark, f"{da}/*").collect()
    assert sorted((r.archive.rsplit("/", 1)[-1], r.entry, r.text) for r in rows) == [
        ("good.tar.gz", "x.log", "archive line"),
        ("mixed.tar.gz", "ok.log", "fine"),
    ]


def test_turns_from_files_fileset_prunes_in_reader(spark, tmp_path):
    d = str(tmp_path / "fsf")
    _write(f"{d}/screen-api.txt", b"api says hello\n")
    _write(f"{d}/other.txt", b"should be pruned\n")
    turns = sources.turns_from_files(
        spark, f"{d}/*", fileset=FileSetConfig(includes=("screen-",))
    )
    got = turns.collect()
    assert len(got) == 1 and got[0].text == "api says hello"
    assert got[0].conv_id.endswith("screen-api.txt")


def test_truncated_tar_mid_iteration_skips_remainder(spark, tmp_path):
    """An archive truncated after its first member (valid open, iterator
    fails mid-walk) keeps what was read and does not fail the job."""
    d = str(tmp_path / "trunc")
    os.makedirs(d)
    full = io.BytesIO()
    with tarfile.open(fileobj=full, mode="w") as tf:  # uncompressed
        p1 = b"first entry line\n"
        i1 = tarfile.TarInfo(name="a.log"); i1.size = len(p1)
        tf.addfile(i1, io.BytesIO(p1))
        p2 = b"x" * 10240
        i2 = tarfile.TarInfo(name="b.log"); i2.size = len(p2)
        tf.addfile(i2, io.BytesIO(p2))
    data = full.getvalue()
    _write(f"{d}/cut.tar", data[: len(data) - 9000])  # cut inside member 2
    _write(f"{d}/whole.tar", data)
    rows = sources.read_tarballs(spark, f"{d}/*").collect()
    got = sorted((r.archive.rsplit("/", 1)[-1], r.entry) for r in rows
                 if r.entry == "a.log")
    # the undamaged archive yields both entries; the cut one at least a.log
    assert ("cut.tar", "a.log") in got and ("whole.tar", "a.log") in got
    assert not any(r.archive.endswith("cut.tar") and r.entry == "b.log"
                   and len(r.text) == 10240 for r in rows)


def test_glob_metachar_and_comma_filenames(spark, tmp_path):
    """round-4 ADVICE: literal paths handed back to binaryFiles must be
    escaped (Hadoop re-expands * ? [ ] { }) and comma-containing names
    must not be split by the comma-joined path list."""
    d = str(tmp_path / "odd")
    _write(f"{d}/a[1].log", b"bracket line\n")
    _write(f"{d}/b{{x}}.log", b"brace line\n")
    _write(f"{d}/c,v1.log", b"comma line\n")
    _write(f"{d}/plain.log", b"plain line\n")
    _write(f"{d}/skip.png", b"\x89PNG")
    fs = FileSetConfig()  # default excludes drop .png
    rows = sorted(
        (r.source.rsplit("/", 1)[-1], r.text)
        for r in sources.read_text_logs(
            spark, f"{d}/*", is_fp_valid=fs.is_fp_valid
        ).collect()
    )
    assert rows == [
        ("a[1].log", "bracket line"),
        ("b{x}.log", "brace line"),
        ("c,v1.log", "comma line"),
        ("plain.log", "plain line"),
    ]


def test_plain_path_normalizes_spark_uri_forms():
    """round-4 ADVICE: the executor-side fileset recheck must see the same
    plain-path form the driver listing checked, or anchored patterns
    (^/data/) silently drop files on remote schemes."""
    assert sources._plain_path("file:/data/x.log") == "/data/x.log"
    assert sources._plain_path("file:///data/x.log") == "/data/x.log"
    assert sources._plain_path("hdfs://nn:8020/data/x.log") == "/data/x.log"
    assert sources._plain_path("/data/x.log") == "/data/x.log"


class _CappedReader:
    """File wrapper proving the traversal requests bounded chunks only:
    refuses unbounded read() and records the largest requested size."""

    def __init__(self, f, cap=65536):
        self.f, self.cap, self.max_req = f, cap, 0
        self.unbounded_reads = 0

    def read(self, n=-1):
        if n is None or n < 0:
            self.unbounded_reads += 1
            n = self.cap
        self.max_req = max(self.max_req, n)
        return self.f.read(min(n, self.cap))

    def readable(self):
        return True

    def close(self):
        self.f.close()


def test_tar_walk_streams_bounded_chunks(tmp_path):
    """round-4: the tar source must stream — an archive with a member much
    larger than the read cap traverses correctly through a file object
    that never serves (or sees) a read larger than 64 KiB, including a
    nested archive and a compressed entry."""
    inner = io.BytesIO()
    with tarfile.open(fileobj=inner, mode="w") as tf:
        p = b"nested line\n"
        i1 = tarfile.TarInfo(name="deep.log"); i1.size = len(p)
        tf.addfile(i1, io.BytesIO(p))
    big = b"".join(b"line %06d with some padding text\n" % i for i in range(40000))
    assert len(big) > 1_000_000
    path = str(tmp_path / "big.tar.gz")
    with tarfile.open(path, "w:gz") as tf:
        ib = tarfile.TarInfo(name="big.log"); ib.size = len(big)
        tf.addfile(ib, io.BytesIO(big))
        iz = tarfile.TarInfo(name="zipped.log.gz")
        zp = gzip.compress(b"compressed entry line\n")
        iz.size = len(zp)
        tf.addfile(iz, io.BytesIO(zp))
        ii = tarfile.TarInfo(name="inner.tar"); ii.size = len(inner.getvalue())
        tf.addfile(ii, io.BytesIO(inner.getvalue()))

    with open(path, "rb") as raw:
        capped = _CappedReader(raw)
        rows = list(sources._walk_tar(path, capped, None, None))
    assert capped.unbounded_reads == 0
    assert capped.max_req <= 65536
    by_entry = {}
    for _, entry, _, _, text in rows:
        by_entry.setdefault(entry, []).append(text)
    assert len(by_entry["big.log"]) == 40000
    assert by_entry["big.log"][39999] == "line 039999 with some padding text"
    assert by_entry["zipped.log.gz"] == ["compressed entry line"]
    assert by_entry["deep.log"] == ["nested line"]


def test_tar_glob_matching_directory_and_dead_symlink(spark, tmp_path):
    """round-4 review: a glob matching a subdirectory or dangling symlink
    must not abort the job — only regular files are opened."""
    d = str(tmp_path / "mixed")
    os.makedirs(f"{d}/subdir.tar")  # a DIRECTORY whose name matches the glob
    _make_tar(f"{d}/real.tar.gz", [("a.log", b"real line\n")])
    os.symlink(f"{d}/vanished.tar.gz", f"{d}/broken.tar.gz")  # dangling
    rows = sources.read_tarballs(spark, f"{d}/*").collect()
    assert [(r.archive.rsplit("/", 1)[-1], r.text) for r in rows] == [
        ("real.tar.gz", "real line")
    ]


def test_walk_tar_bytesio_matches_streamed_file(tmp_path):
    """The remote-scheme fallback traverses from whole-archive bytes
    (BytesIO); its output must match the streamed file-handle path."""
    path = str(tmp_path / "par.tar.gz")
    _make_tar(path, [
        ("a.log", b"one\ntwo\n"),
        ("b.log.gz", gzip.compress(b"three\n")),
    ])
    with open(path, "rb") as f:
        streamed = list(sources._walk_tar(path, f, None, None))
    data = open(path, "rb").read()
    buffered = list(sources._walk_tar(path, io.BytesIO(data), None, None))
    assert streamed == buffered
    assert [(e, t) for _, e, _, _, t in streamed] == [
        ("a.log", "one"), ("a.log", "two"), ("b.log.gz", "three")
    ]
