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
        scan, the file-pruning analog of the reference's pre-open check."""
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
