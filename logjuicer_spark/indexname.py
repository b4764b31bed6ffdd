"""IndexName: noise-cleaned file-path key that groups similar sources so
they share one baseline index.

Semantic port of /root/reference/crates/tokenizer/src/index_name.rs
(remove_uid :82-94, is_hexadecimal :19-23, parent walk :44-70,
clean_name :120-151, from_path :165-177). For transcript tables the group
key is simply the ``tool`` column; this projection exists for log-file
sources (a ``source`` path column), verified against the reference's
32-path goldenfile corpus.
"""

from __future__ import annotations

import re
from functools import lru_cache

_UID_RE = re.compile(
    r"[0-9a-zA-Z]{63,128}"
    r"|[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}"
)
_HEX = frozenset("0123456789abcdef")
_VOWELS = frozenset("aeiouy")
_IRRELEVANT = frozenset(["util", "tasks", "manager", "current", "logs", "init"])
_NON_ALPHA_KEEP = re.compile(r"[^A-Za-z.\-]")


def _is_hexadecimal(name: str) -> bool:
    base = name.strip("-_.")
    return all(c in _HEX for c in base)


def _contains_vowel(name: str) -> bool:
    return any(c.lower() in _VOWELS for c in name)


def _is_dir_name_irrelevant(name: str) -> bool:
    return _is_hexadecimal(name) or not _contains_vowel(name) or name in _IRRELEVANT


def _remove_non_vowel_component(name: str) -> str:
    # split_inclusive on -_. : separators stay attached to their component
    parts = re.findall(r"[^-_.]*[-_.]|[^-_.]+$", name)
    return "".join(
        p for p in parts if not _is_hexadecimal(p) and _contains_vowel(p)
    )


def _clean_name(base: str) -> str:
    if base.endswith(".journal"):
        base = base[: -len(".journal")]
    elif base.endswith(".journal~"):
        base = base[: -len(".journal~")]
    if base.startswith("instance-00"):
        return "instance"
    if "@" in base:
        return base[: base.find("@")]
    if base.startswith("sosreport-"):
        prefix = len("sosreport-")
        pos = base[prefix:].find("-")
        return base if pos == -1 else base[: prefix + pos]
    out = _remove_non_vowel_component(base)
    out = _NON_ALPHA_KEEP.sub("", out)
    while out.endswith(".gz"):
        out = out[:-3]
    while out.endswith(".txt"):
        out = out[:-4]
    return out.strip("._-")


@lru_cache(maxsize=1 << 16)
def index_name_from_path(path: str) -> str:
    base = _UID_RE.sub("UID", path)
    parts = [p for p in base.split("/") if p]
    filename = parts[-1] if parts else "NA"
    parent = None
    for name in reversed(parts[:-1]):
        if not _is_dir_name_irrelevant(name):
            parent = name
            break
    if parent is None:
        return _clean_name(filename)
    return f"{_clean_name(parent)}/{_clean_name(filename)}"


def index_name_udf():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _idx(s):  # pragma: no cover - executors
        return s.map(lambda p: index_name_from_path(p) if p is not None else None)

    return _idx
