"""File-set configuration: includes / excludes / ignore patterns.

Port of the reference's TargetConfig file predicates
(/root/reference/crates/model/src/config.rs:197-221) and the 59-entry
default exclude list (config/default_excludes.rs:4-62). For a log-file
table (a ``source`` path column) these are partition/file-pruning filters;
for transcripts they are not applied (the table IS the fileset).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

# config/default_excludes.rs:4-62 (verbatim)
DEFAULT_EXCLUDES = [
    ".ico$", ".png$", ".clf$", ".tar.bzip2$", ".subunit$", ".sqlite$",
    ".db$", ".bin$", ".rpm$", ".pcap.log.txt$", ".pkl$", ".jar$", ".pyc$",
    ".py$", ".sh$",
    ".eot$", ".otf$", ".woff$", ".woff2$", ".ttf$",
    ".yaml$", ".ini$", ".conf$",
    "job-output.json$", "zuul-manifest.json$", ".html$",
    "sos_commands/.*/(lsof|ps|journalctl|ls)_", "sos_commands/scsi",
    "cacerts$", "local/creds$", "/authkey$", "mysql/tc.log.txt$",
    "log/.tmp$", "lib/systemd/systemd-coredump$", "os-diff/os-diff$",
    "object.builder$", "account.builder$", "container.builder$",
    "crio/pods/crictl_inspectp_", "crio/containers/crictl_inspect_",
    "/etc/", "/proc/", "/sys/", "/usr/lib/", "/var/lib/selinux/", "/venv/",
    "/\\.[a-zA-Z0-9]",
]


@dataclass(frozen=True)
class FileSetConfig:
    includes: tuple = ()
    excludes: tuple = ()
    default_excludes: bool = True

    def exclude_patterns(self) -> tuple:
        if self.default_excludes:
            return tuple(self.excludes) + tuple(DEFAULT_EXCLUDES)
        return tuple(self.excludes)

    # constructs whose semantics differ (or fail) between Python re and
    # Java regex: named groups/backrefs (?P<, (?P=), comments (?#, Python
    # conditional groups (?(..., and possessive quantifiers (Java-only,
    # so a Python-validated pattern never contains them — but the reverse
    # direction, \\p{...} property classes, parses in Java only)
    _NONPORTABLE = ("(?P<", "(?P=", "(?#", "(?(", "\\p{", "\\A", "\\Z")

    def _warn_nonportable(self) -> None:
        import logging

        for p in tuple(self.includes) + tuple(self.excludes):
            for marker in self._NONPORTABLE:
                if marker in p:
                    logging.getLogger(__name__).warning(
                        "fileset pattern %r uses %r, which Python re and "
                        "the JVM regexp_like interpret differently — the "
                        "driver-side and executor-side file sets may "
                        "disagree; restrict patterns to the portable "
                        "subset", p, marker,
                    )

    def is_fp_valid(self, relative: str) -> bool:
        """config.rs:197-205: match against the path with .gz stripped."""
        fp = relative
        while fp.endswith(".gz"):
            fp = fp[:-3]
        if self.includes and not any(re.search(p, fp) for p in self.includes):
            return False
        return not any(re.search(p, fp) for p in self.exclude_patterns())

    def filter_sources(self, df: DataFrame, source_col: str = "source") -> DataFrame:
        """DataFrame predicate form — Catalyst pushes the regexps to the
        scan, the file-pruning analog of the reference's pre-open check.

        ENGINE CONTRACT: is_fp_valid evaluates patterns with Python ``re``
        (driver/executor side) while this form compiles them to Java regex
        (regexp_like) — the same FileSetConfig must therefore stick to the
        portable common subset (literals, anchors, classes, alternation —
        everything DEFAULT_EXCLUDES and the reference's Rust-regex configs
        use). _warn_nonportable flags the known-divergent constructs at
        plan-build time so a config that would silently match differently
        (or throw mid-job) is caught here, not in a task."""
        self._warn_nonportable()
        fp = F.regexp_replace(F.col(source_col), "(\\.gz)+$", "")
        cond = F.lit(True)
        if self.includes:
            inc = None
            for p in self.includes:
                m = F.regexp_like(fp, F.lit(p))
                inc = m if inc is None else (inc | m)
            cond = cond & inc
        for p in self.exclude_patterns():
            cond = cond & ~F.regexp_like(fp, F.lit(p))
        return df.filter(cond)
