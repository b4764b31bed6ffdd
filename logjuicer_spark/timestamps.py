"""Timestamp parsing parity functions.

Reference: /root/reference/crates/model/src/timestamps.rs:22-50 (format
chain, chrono parse_and_remainder semantics: parse a prefix, ignore the
remainder) and :86-109 (set_date +-12h day-rollover resolution).

The transcript pipeline itself uses the native ``ts`` column of the input
table; these functions exist for golden parity (W3/X1/X2 in SURVEY.md §2)
and for the errors entry point whose goldens carry textual timestamps.
Epochs are u64 milliseconds (report.rs:573-575).
"""

from __future__ import annotations

import calendar
import re

_JSON_DATE_RE = re.compile(r'^\{"date":(\d+)\.(\d{3})')
# chrono numeric specifiers (%m %d %H %M %S) accept 1-2 digits when
# parsing, so unpadded values like "2024-2-7 9:15:54" must parse (round-4
# review). Known micro-deviations, kept deliberately: %Y is pinned to 4
# digits (chrono would accept shorter years, turning fragments like
# "5-07-30" into year-5 timestamps) and literal spaces are matched as
# written (chrono's Item::Space tolerates arbitrary whitespace).
_FULL_RES = [
    # %F %T,%3f
    re.compile(r"^(\d{4})-(\d{1,2})-(\d{1,2}) (\d{1,2}):(\d{1,2}):(\d{1,2}),(\d{3})"),
    # %FT%T
    re.compile(r"^(\d{4})-(\d{1,2})-(\d{1,2})T(\d{1,2}):(\d{1,2}):(\d{1,2})()"),
    # %F %T.%3f
    re.compile(r"^(\d{4})-(\d{1,2})-(\d{1,2}) (\d{1,2}):(\d{1,2}):(\d{1,2})\.(\d{3})"),
    # %F %T
    re.compile(r"^(\d{4})-(\d{1,2})-(\d{1,2}) (\d{1,2}):(\d{1,2}):(\d{1,2})()"),
    # [%Y/%m/%d %T]
    re.compile(r"^\[(\d{4})/(\d{1,2})/(\d{1,2}) (\d{1,2}):(\d{1,2}):(\d{1,2})\]()"),
]
_TIME_AT6_RE = re.compile(r"^(\d{1,2}):(\d{1,2}):(\d{1,2})\.(\d{3})")
_MONTHS = {m: i + 1 for i, m in enumerate(
    ["jan", "feb", "mar", "apr", "may", "jun", "jul", "aug", "sep", "oct", "nov", "dec"]
)}
_SYSLOG_RE = re.compile(r"^([A-Za-z]{3}) +(\d{1,2}) (\d{1,2}):(\d{1,2}):(\d{1,2})")

HOUR = 3_600_000
DAY = HOUR * 24

FULL = "full"
TIME = "time"


def _valid_hms(h: int, m: int, s: int) -> bool:
    return h < 24 and m < 60 and s < 61


def parse_timestamp(line: str):
    """Returns (kind, value) with kind in {"full", "time"} or None.
    full -> epoch ms; time -> ms since midnight."""
    m = _JSON_DATE_RE.match(line)
    if m:
        return (FULL, int(m.group(1)) * 1000 + int(m.group(2)))
    if line[:1] in (" ", "\t", "\n"):
        return None
    for rx in _FULL_RES:
        m = rx.match(line)
        if m:
            y, mo, d, h, mi, s = (int(m.group(i)) for i in range(1, 7))
            frac = m.group(7)
            if 1 <= mo <= 12 and 1 <= d <= 31 and _valid_hms(h, mi, s):
                try:
                    epoch = calendar.timegm((y, mo, d, h, mi, min(s, 59)))
                except (OverflowError, ValueError):
                    continue
                # validate the day really exists (e.g. Feb 30)
                if d > calendar.monthrange(y, mo)[1]:
                    continue
                # chrono represents a leap second (:60) as second 59 with
                # nanos >= 1e9, so timestamp_millis lands in the NEXT
                # minute's .000 — +1000ms, not a clamp (round-4 review)
                leap = 1000 if s == 60 else 0
                return (FULL, epoch * 1000 + (int(frac) if frac else 0) + leap)
    m = _TIME_AT6_RE.match(line[6:])
    if m and _valid_hms(int(m.group(1)), int(m.group(2)), int(m.group(3))):
        h, mi, s, ms = (int(m.group(i)) for i in range(1, 5))
        leap = 1000 if s == 60 else 0
        return (TIME, (h * 3600 + mi * 60 + min(s, 59)) * 1000 + ms + leap)
    m = _SYSLOG_RE.match(line)
    if m and m.group(1).lower() in _MONTHS and 1 <= int(m.group(2)) <= 31:
        h, mi, s = int(m.group(3)), int(m.group(4)), int(m.group(5))
        if _valid_hms(h, mi, s):
            leap = 1000 if s == 60 else 0
            return (TIME, (h * 3600 + mi * 60 + min(s, 59)) * 1000 + leap)
    return None


def set_date(date_time_ms: int, time_ms: int) -> int:
    """Resolve a time-of-day against a known datetime with +-12h rollover
    (timestamps.rs:86-109)."""
    known_time = date_time_ms % DAY
    known_date = date_time_ms // DAY * DAY
    diff = abs(known_time - time_ms)
    if known_time > time_ms:
        if diff > HOUR * 12:
            return known_date + DAY + time_ms
        return known_date + time_ms
    if diff > HOUR * 12:
        return known_date - DAY + time_ms
    return known_date + time_ms
