"""Line splitting with the reference reader's exact semantics.

Port of BytesLines (/root/reference/crates/iterator/src/iterator.rs:115-346):
- real '\\n' ends a line (line counter increments)
- a literal backslash-n two-char sequence ends a SUB-line that keeps the
  same line number; a preceding escaping backslash suppresses it
  (iterator.rs:255-261 — escaped 'r' is NOT a separator)
- the ansible marker '", "stdout_lines": [' acts as a line break at the
  quote (iterator.rs:332-334)
- json mode: one piece per scalar — separators , [ ] { } outside strings
  (iterator.rs:337-346); xml mode splits between '><'
- pieces longer than 6000 bytes are dropped, empty pieces are skipped, and
  both still advance the line counter

Used for parity tests and for the ``file_type`` parse option; the default
transcript path uses an equivalent JVM regex (pipeline.parse).
"""

from __future__ import annotations

MAX_LINE_LENGTH = 6000
_ANSIBLE = '", "stdout_lines": ['


def split_lines(text: str, file_type: str = "text") -> list[tuple[str, int]]:
    """Returns [(piece, line_number)] with 1-based line numbers."""
    out: list[tuple[str, int]] = []
    line_nr = 1
    start = 0
    escaped = False
    in_string = False
    last_char = " "
    json_mode = file_type == "json"
    xml_mode = file_type == "xml"
    i = 0
    n = len(text)

    def emit(end: int, next_start: int, new_line: bool):
        nonlocal start, line_nr
        piece = text[start:end]
        if piece and len(piece.encode("utf-8")) <= MAX_LINE_LENGTH:
            out.append((piece, line_nr))
        elif piece and len(piece.encode("utf-8")) > MAX_LINE_LENGTH:
            pass  # dropped (iterator.rs step I/J)
        if new_line:
            line_nr += 1
        start = next_start

    while i < n:
        c = text[i]
        if escaped:
            escaped = False
            if c == "n":
                # sub-line: exclude the backslash, keep the line number
                # (iterator.rs:255-261 — only escaped 'n', not 'r')
                emit(i - 1, i + 1, new_line=False)
            i += 1
            last_char = c
            continue
        if c == "\\":
            escaped = True
        elif c == "\n" or text.startswith(_ANSIBLE, i):
            emit(i, i + 1, new_line=True)
        elif xml_mode and c == "<" and last_char == ">":
            emit(i, i, new_line=False)
        elif json_mode:
            if c == '"':
                in_string = not in_string
            elif not in_string and c in ",[]{}":
                emit(i, i + 1, new_line=False)
        last_char = c
        i += 1
    emit(n, n, new_line=False)
    return out


def split_udf(file_type: str = "text"):
    """pandas UDF: text -> array<struct<piece string, sub int>> preserving
    within-turn order (line numbers collapse to the turn's own index)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<struct<piece: string, sub: int>>")
    def _split(s):  # pragma: no cover - executors
        return s.map(
            lambda t: [
                {"piece": p, "sub": i}
                for i, (p, _) in enumerate(split_lines(t, file_type))
            ]
            if t is not None
            else None
        )

    return _split
