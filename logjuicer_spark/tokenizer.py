"""Line tokenizer: replace varying words with fixed mask tokens.

Semantic re-implementation (not a code translation) of the reference
tokenizer ``/root/reference/crates/tokenizer/src/tokenizer.rs:588-608``
(entry ``process``): the output string must match the reference exactly
for the golden parity corpus in ``tests/test_tokenizer.py``.

The hot path for Spark is :func:`tokenize_udf`, a pandas UDF that
deduplicates each Arrow batch before calling :func:`process` (log data
is highly repetitive, so the per-unique-line Python cost amortizes to
~zero), plus a per-executor LRU cache shared across batches.

Design notes for parity (cited file:line into /root/reference):
- word split regex ``([ \t]|\\[nr])+``            tokenizer.rs:45-50
- quote/punctuation trim                            tokenizer.rs:52-61
- global whole-line filter -> "%GL_FILTER"          tokenizer.rs:64-90
- literal classifier precedence                     tokenizer.rs:455-480
- error emphasis (5x weight)                        tokenizer.rs:488-496
- recursive word processing with iterator
  side effects (consume-next for %VALUE_ID and
  password keys)                                    tokenizer.rs:507-585
All length checks are byte lengths (Rust ``str::len``).
"""

from __future__ import annotations

import re
from functools import lru_cache

# --- compiled module-level regexes (one compile per executor) ---------------

# tokenizer.rs:45-50 -- note non-capturing group: Rust regex split does not
# emit capture groups, Python's re.split would.
_WORDS_RE = re.compile(r"(?:[ \t]|\\[nr])+")

_TRIM_CHARS = "'\",;()[]{}<>\\"

# tokenizer.rs:64-90
_GLOBAL_RE = re.compile(
    r"GET / HTTP/1.1"
    r"|\* [a-zA-Z]+: [a-zA-Z0-9\.-]*$|Trying other mirror."
    r"|ovs-ofctl .* (?:dump-ports|dump-flows|show)\b"
    r"|(?:ip|eb)tables .* -L\b"
    r"|(?:^\^[+*-] [a-z0-9\.>-]{5,} [0-9])"
    r"|dnsmasq(?:\[[0-9]+\])?: (?:query|forwarded|reply|cached|config)"
    r"|(?:^[a-f0-9s/]+>[0-9]+ )"
    r"|(?:^\+\+ echo [^ ]+$)"
    r"|(?:^net.ipv[46].(?:conf|neigh).tap)"
    r'|(?:^[" \t]*net.interface.tap)'
    r"|(?:[ '\",]*\|.{17}\|[ '\",]*$)"
)
_WHITESPACE_RE = re.compile(r"\s")

# tokenizer.rs:118-123
_NUMBERS_RE = re.compile(r"[0-9]+\.[0-9]+|[0-9]+")

# tokenizer.rs:130-142 ("weeds?" is verbatim from the reference)
_DATE_RE = re.compile(
    r"^(?:sunday|monday|tuesday|wednesday|thursday|friday|saturday|"
    r"january|february|march|april|may|june|july|august|september|october|"
    r"november|december|months?|weeds?|days?|hours?|minutes?)$",
    re.IGNORECASE | re.ASCII,
)

# tokenizer.rs:152-166
_ERROR_RE = re.compile(
    r"^(?:error|fatal|failure|failed|warning|err|fail|warn|denied|"
    r"assert|assertion|non-zero|exception|traceback)$",
    re.IGNORECASE | re.ASCII,
)

# tokenizer.rs:169-174
_ODD_CHAR_RE = re.compile(r"[<>{}%$,*]")

# tokenizer.rs:198-210 -- the reference pattern is
#   ^(:*[\[\]0-9a-fA-FxZ,]+[:.-]*|(latest|none)|rabbitmq-cluster-id-.*)+$
# under Rust's linear-time regex engine. Python re backtracks exponentially on
# it, so _uid_pattern_match implements the same language with a greedy linear
# scan (safe: block-start characters never overlap block-interior classes).
_UID_A = frozenset("[]0123456789abcdefABCDEFxZ,")
_UID_S = frozenset(":.-")
# fast path: the (:*A+S*)+ sublanguage collapses to this linear regex (after
# the first A char, any mix of A and separator chars is reachable)
_UID_FAST_RE = re.compile(r"^:*[\[\]0-9a-fA-FxZ,][\[\]0-9a-fA-FxZ,:.\-]*$")
# the literal alternatives begin with l/n/r which are outside the A class,
# so words without these substrings are fully decided by the fast path
_UID_LITERALS_RE = re.compile(r"latest|none|rabbitmq-cluster-id-")


def _uid_pattern_match(word: str) -> bool:
    if _UID_FAST_RE.match(word):
        return True
    if _UID_LITERALS_RE.search(word) is None:
        return False
    return _uid_pattern_match_slow(word)


def _uid_pattern_match_slow(word: str) -> bool:
    i, n = 0, len(word)
    blocks = 0
    while i < n:
        if word.startswith("rabbitmq-cluster-id-", i):
            return True
        if word.startswith("latest", i):
            i += 6
            blocks += 1
            continue
        if word.startswith("none", i):
            i += 4
            blocks += 1
            continue
        j = i
        while j < n and word[j] == ":":
            j += 1
        k = j
        while k < n and word[k] in _UID_A:
            k += 1
        if k == j:
            return False
        while k < n and word[k] in _UID_S:
            k += 1
        i = k
        blocks += 1
    return blocks > 0

# tokenizer.rs:224-234
_UUID_RE = re.compile(r"^[a-zA-Z0-9].*-[a-zA-Z0-9]{4}-[a-zA-Z0-9]{4}-[a-zA-Z0-9]{4}-$")

# tokenizer.rs:237-242
_MANY_DASH_RE = re.compile(r"^.+-.+-.+-.")

# tokenizer.rs:244-250
_COOKIE_RE = re.compile(r"^(?:gAAAA|AAAA|tx[a-z]|tap|req-|AUTH_)")

# tokenizer.rs:252-258
_URL_RE = re.compile(r"^(?:https|http|ftp|ssh)://", re.IGNORECASE)

# tokenizer.rs:260-265
_BASE64_RE = re.compile(r"^[A-Za-z0-9+/=]+$")

# tokenizer.rs:267-272
_UNIT_RE = re.compile(r"^[a-z]+_[a-z]+\[[0-9]+\]:$")

# tokenizer.rs:292-304 (two regexes: the (?i:..) scope applies to the first
# alternative only in the reference pattern)
_HASH_PREFIX_RE = re.compile(r"^(?:hash|sha|md)[0-9]*[:~]", re.IGNORECASE)
_HASH_LONG_RE = re.compile(r"\.?[a-zA-Z0-9_+/-]{64,}")

# tokenizer.rs:321-326
_REFS_RE = re.compile(r"^\w{7}\.\.\w{7}$")

# tokenizer.rs:351-361
_KEY_FOR_ID_RE = re.compile(
    r"(?:id|key|ref|region|token|secret|password|pipeline)", re.IGNORECASE
)

_VOWELS = frozenset("aeiouy")  # index_name.rs:36-38 (y included)
_CONSONANTS = frozenset("bcdfghjklmnpqrstvwxz")


def _blen(word: str) -> int:
    """Byte length, matching Rust ``str::len``."""
    if word.isascii():
        return len(word)
    return len(word.encode("utf-8"))


def _trim_quote_and_punctuation(word: str) -> str:
    # tokenizer.rs:52-61
    while word.startswith('u"'):
        word = word[2:]
    while word.startswith("u'"):
        word = word[2:]
    return word.strip(_TRIM_CHARS)


def global_filter(line: str) -> bool:
    # tokenizer.rs:64-90: single-word lines (no whitespace) are filtered too
    # (fast path: a space is by far the most common whitespace)
    if " " not in line and _WHITESPACE_RE.search(line) is None:
        return True
    # trigger gate: every _GLOBAL_RE alternative implies one of these cheap
    # C-speed substring/prefix probes (mapping, in pattern order: GET/HTTP ->
    # "GET / HTTP/1"; "\* ..." -> '*'; mirror literal; ovs-ofctl; (ip|eb)tables
    # -> "tables "; "^\^[+*-]" -> startswith '^'; dnsmasq; "^[a-f0-9s/]+>" ->
    # '>'; "^\+\+ echo" -> prefix; net.ipv/net.interface -> "net"; the
    # |.{17}| table-border -> '|'), so the common no-trigger line skips the
    # big alternation scan entirely (~4x on the line-level cold path)
    if (
        "*" in line or ">" in line or "|" in line or "net" in line
        or "dnsmasq" in line or "tables " in line or "ovs-ofctl" in line
        or "GET / HTTP/1" in line or "Trying other mirror" in line
        or line.startswith("^") or line.startswith("++ echo ")
    ):
        return _GLOBAL_RE.search(line) is not None
    return False


def _remove_numbers(word: str) -> str:
    return _NUMBERS_RE.sub("N", word)


_VOWEL_RE = re.compile(r"[aeiouyAEIOUY]")
_CONSONANT_RE = re.compile(r"[bcdfghjklmnpqrstvwxzBCDFGHJKLMNPQRSTVWXZ]")


def _contains_no_vowel(word: str) -> bool:
    # tokenizer.rs:185-195: no ASCII vowel (y counts) and >= 1 ASCII consonant
    return _VOWEL_RE.search(word) is None and _CONSONANT_RE.search(word) is not None


def _is_uid(word: str) -> bool:
    return _uid_pattern_match(word) or _contains_no_vowel(word)


def _is_base64(word: str) -> bool:
    # tokenizer.rs:260-265 (byte lengths)
    return word.endswith("==") or (
        _blen(word) > 24
        and (word.endswith("=") or _BASE64_RE.match(word) is not None)
    )


def _is_hash(word: str) -> bool:
    # tokenizer.rs:292-304. The prefix alternative must start with h/s/m
    # (case-insensitive); the long alternative needs a 64-char run from its
    # class, impossible below 64 chars.
    if word.startswith("/"):
        return False
    if word[:1] in "hsmHSM" and _HASH_PREFIX_RE.match(word) is not None:
        return True
    return len(word) >= 64 and _HASH_LONG_RE.search(word) is not None


def _is_refs(word: str) -> bool:
    return (
        word.startswith("refs/")
        or word.startswith("repos/")
        # ^\w{7}\.\.\w{7}$ requires ".." -- cheap precheck
        or (".." in word and _REFS_RE.match(word) is not None)
    )


def _is_random_path(word: str) -> bool:
    # tokenizer.rs:367-369
    return "tmp/" in word or "/tmp" in word or word.startswith("tmp")


_URL_PREFIXES = ("https://", "http://", "ftp://", "ssh://")
_COOKIE_PREFIXES = ("gAAAA", "AAAA", "tap", "req-", "AUTH_")
_LC = "abcdefghijklmnopqrstuvwxyz"


def _parse_literal(word: str) -> str | None:
    """tokenizer.rs:455-480 -- the order is part of the contract. Each
    regex is guarded by a C-speed precondition implied by its pattern (the
    golden corpus pins the equivalences)."""
    # %DATE: all date words are pure ASCII letters, <= 9 chars; the anchored
    # IGNORECASE|ASCII alternation is equivalent to a lowercase set lookup
    if len(word) <= 9 and word.isalpha() and word.lower() in _DATE_WORDS:
        return "%DATE"
    if _is_hash(word):
        return "%HASH"
    if _is_uid(word):
        return "%ID"
    # %COOKIE: ^(gAAAA|AAAA|tx[a-z]|tap|req-|AUTH_)
    if word.startswith(_COOKIE_PREFIXES) or (
        word.startswith("tx") and len(word) > 2 and word[2] in _LC
    ):
        return "%COOKIE"
    # %UID: pattern needs >= 3 dashes
    if word.count("-") >= 3 and _UUID_RE.match(word):
        return "%UID"
    # %URL: case-insensitive scheme prefix (first-char gate skips the two
    # string allocations for the overwhelmingly common non-URL word)
    if word[:1] in "hfsHFS" and word[:8].lower().startswith(_URL_PREFIXES):
        return "%URL"
    if _is_random_path(word):
        return "%PATH"
    if _is_refs(word):
        return "%REF"
    if _is_base64(word):
        return "%BASE64"
    # %UNIT: ^[a-z]+_[a-z]+\[[0-9]+\]:$
    if word.endswith(":") and "[" in word and "_" in word and _UNIT_RE.match(word):
        return "%UNIT"
    return None


def _trim_pid(word: str) -> str | None:
    # tokenizer.rs:482-485
    stripped = word.rstrip("0123456789")
    if stripped.endswith("["):
        return stripped[:-1]
    return None


def _split_once(word: str, chars: str) -> tuple[str, str] | None:
    """Rust ``str::split_once([chars])``: split at first occurrence of any."""
    best = -1
    for c in chars:
        i = word.find(c)
        if i != -1 and (best == -1 or i < best):
            best = i
    if best == -1:
        return None
    return word[:best], word[best + 1 :]


def _is_key_value(word: str) -> tuple[str, str] | None:
    # tokenizer.rs:328-339
    kv = _split_once(word, "=:")
    if kv is None:
        return None
    k, v = kv
    if k[:1] and (k[0].isascii() and (k[0].isalpha() or k[0] == "_")):
        return k, v
    return None


def _is_two_words(word: str) -> tuple[str, str] | None:
    # tokenizer.rs:346-349
    kv = _split_once(word, "[(\\@")
    if kv is None:
        return None
    k, v = kv
    return k, v.rstrip("])")


def _is_password_key(word: str) -> bool:
    return word.endswith("password:") or word.endswith("password=")


def _push_error(word: str, out: list[str]) -> None:
    # tokenizer.rs:488-496
    out.append(word)
    out.append(" ")
    for tag in ("%A ", "%B ", "%C ", "%D"):
        out.append(word)
        out.append(tag)


def _cached_sub(word: str, it, out: list[str]) -> bool:
    """Recursion step through the per-word cache: sub-words (key/value
    halves, '/'-'-'-'|' segments, pid-stripped stems) repeat heavily across
    a corpus (the same registry key with a thousand different ports), so
    each distinct sub-word is processed once per executor. Exactness: a
    word's full result (fragment, added, consumed count) is a pure function
    of the word — the consume-next cases discard the consumed word's
    content (tokenizer.rs:536,576) — so replaying frag + consuming
    ``consumed`` items from the live iterator is identical to direct
    recursion."""
    frag, added, consumed = _word_result(word)
    for _ in range(consumed):
        next(it, None)
    if frag:
        out.append(frag)
    return added


def _do_process(base_word: str, it, out: list[str]) -> bool:
    """Recursive word processor; ``it`` is the live word iterator so that
    consume-next semantics (%VALUE_ID, password keys) match the reference
    (tokenizer.rs:507-585). Returns whether something was appended."""
    word = _trim_quote_and_punctuation(base_word)
    added = True
    if not word:
        added = False
    elif (token := _parse_literal(word)) is not None:
        out.append(token)
    # == _ERROR_RE.match: anchored IGNORECASE|ASCII alternation = ASCII-
    # gated lowercase set lookup (non-ASCII words can never match the
    # pure-ASCII alternatives)
    elif word.isascii() and word.lower() in _ERROR_WORDS:
        _push_error(word, out)
    elif _blen(word) <= 3:
        added = False
    elif (strip := _trim_pid(word)) is not None:
        _cached_sub(strip, it, out)
        out.append("%PID")
    elif _ODD_CHAR_RE.search(word):
        out.append("%ODD")
    elif (kv := _is_key_value(word)) is not None:
        key, value = kv
        _cached_sub(key, it, out)
        if _KEY_FOR_ID_RE.search(key):
            if not value:
                next(it, None)  # consume the next word
            out.append("%EQ %VALUE_ID")
        else:
            out.append("%EQ ")
            added = _cached_sub(value, it, out)
    elif "/" in word:
        w1, w2 = word.split("/", 1)
        if _cached_sub(w1, it, out):
            out.append("/ ")
        added = _cached_sub(w2, it, out)
    elif "-" in word:
        w1, w2 = word.split("-", 1)
        if _MANY_DASH_RE.match(w2):
            out.append("%DASH")
        else:
            if _cached_sub(w1, it, out):
                out.append("- ")
            added = _cached_sub(w2, it, out)
    elif "|" in word:
        w1, w2 = word.split("|", 1)
        if _cached_sub(w1, it, out):
            out.append("| ")
        added = _cached_sub(w2, it, out)
    elif _blen(word) >= 32:
        out.append("%BIG")
    elif (tw := _is_two_words(word)) is not None:
        w1, w2 = tw
        if _cached_sub(w1, it, out):
            out.append(" ")
        added = _cached_sub(w2, it, out)
    else:
        x = _remove_numbers(word)
        if _is_password_key(x):
            next(it, None)  # consume the next word
            out.append(x)
        elif _blen(x) > 3:
            out.append(x)
        else:
            added = False
    return added


# ---- fast word classifier ---------------------------------------------------
#
# The dominant word shape in log text is a plain short alphanumeric token.
# For `^[A-Za-z0-9]{1,24}$` words most of the _do_process cascade is
# STATICALLY impossible: quote/punct trim is identity; %HASH needs ':'/'~' or
# >= 64 chars; %UID(uuid) needs '-'; %URL needs '://'; %PATH's "/tmp|tmp/"
# arms need '/'; %REF needs '/' or '..'; %BASE64 needs '=' or > 24 bytes;
# %UNIT needs '['; pid-trim needs '['; %ODD chars are excluded by the class;
# key-value needs '='/':'; the '/', '-', '|' splits and %BIG (>= 32 bytes)
# can't fire; two-words needs '[', '(', '\\' or '@'; password keys need
# ':'/'='. What remains collapses to set lookups and prefix probes in the
# exact tokenizer.rs:455-480 precedence. Differentially fuzz-tested against
# the full cascade (tests/test_tokenizer_fastpath.py).

_ALNUM_WORD_RE = re.compile(r"^[A-Za-z0-9]{1,24}$")
# _UID_FAST_RE restricted to the alnum alphabet: every char hex-ish
_HEX_ONLY_RE = re.compile(r"^[0-9a-fA-FxZ]+$")
# _DATE_RE's alternation expanded ("weeds?" is verbatim from the reference)
_DATE_WORDS = frozenset(
    "sunday monday tuesday wednesday thursday friday saturday "
    "january february march april may june july august september october "
    "november december month months weed weeds day days hour hours "
    "minute minutes".split()
)
# _ERROR_RE's alternation ("non-zero" can never match the alnum shape but
# keeping it costs nothing)
_ERROR_WORDS = frozenset(
    "error fatal failure failed warning err fail warn denied assert "
    "assertion non-zero exception traceback".split()
)


def _word_result_alnum(word: str) -> tuple[str, bool, int] | None:
    """Exact-equivalent result of _do_process for plain alnum words, or None
    when the word is out of shape and the full cascade applies."""
    if _ALNUM_WORD_RE.match(word) is None:
        return None
    lw = word.lower()
    if lw in _DATE_WORDS:
        return ("%DATE", True, 0)
    if (
        _HEX_ONLY_RE.match(word) is not None
        or (
            ("latest" in word or "none" in word)
            and _uid_pattern_match_slow(word)
        )
        or _contains_no_vowel(word)
    ):
        return ("%ID", True, 0)
    if word.startswith(_COOKIE_PREFIXES) or (
        word.startswith("tx") and len(word) > 2 and word[2] in _LC
    ):
        return ("%COOKIE", True, 0)
    if word.startswith("tmp"):
        return ("%PATH", True, 0)
    if lw in _ERROR_WORDS:
        out: list[str] = []
        _push_error(word, out)
        return ("".join(out), True, 0)
    if len(word) <= 3:
        return ("", False, 0)
    x = word if word.isalpha() else _remove_numbers(word)
    if len(x) > 3:
        return (x, True, 0)
    return ("", False, 0)


# alnum segments joined by single dashes, whole word < 64 bytes (>= 64 could
# hit %HASH's long-run arm, whose class includes '-')
_DASH_WORD_RE = re.compile(r"^[A-Za-z0-9]+(?:-[A-Za-z0-9]+)+$")
# _UID_FAST_RE restricted to the dash alphabet: hex-ish first char, then
# hex-ish or '-'
_HEX_DASH_RE = re.compile(r"^[0-9a-fA-FxZ][0-9a-fA-FxZ0-9-]*$")


def _word_result_dash(word: str) -> tuple[str, bool, int] | None:
    """Exact-equivalent result of _do_process for dash-joined alnum words
    (pod-a2863a7f, compute-1051, ...), or None when out of shape.

    For this shape the cascade collapses to: %ID (hex-ish chars / uid
    literals / no-vowel), %COOKIE, %PATH prefix, the error words (only
    "non-zero" carries a dash), the <=3-byte drop, then the '-' split —
    %DASH when the tail has >= 3 more dashes, else recurse per segment
    (each segment is alnum or dash-shaped, so the recursion stays fast and
    never consumes from the word iterator). All other classes are
    statically impossible: %DATE needs isalpha, %HASH needs ':'/'~' or a
    64-char run, %UID(uuid) needs a trailing '-', %URL '://', %REF '/' or
    '..', %BASE64 '=' or the base64 charset, %UNIT/pid-trim '[', %ODD its
    char class, key-value '='/':', the '/' and '|' splits their chars, and
    %BIG sits after the '-' branch."""
    if "-" not in word or len(word) >= 64 or _DASH_WORD_RE.match(word) is None:
        return None
    if (
        _HEX_DASH_RE.match(word) is not None
        or (
            (
                "latest" in word
                or "none" in word
                or "rabbitmq-cluster-id-" in word
            )
            and _uid_pattern_match_slow(word)
        )
        or _contains_no_vowel(word)
    ):
        return ("%ID", True, 0)
    if word.startswith(_COOKIE_PREFIXES) or (
        word.startswith("tx") and len(word) > 2 and word[2] in _LC
    ):
        return ("%COOKIE", True, 0)
    if word.startswith("tmp"):
        return ("%PATH", True, 0)
    if word.lower() == "non-zero":
        out: list[str] = []
        _push_error(word, out)
        return ("".join(out), True, 0)
    if len(word) <= 3:
        return ("", False, 0)
    w1, w2 = word.split("-", 1)
    if _MANY_DASH_RE.match(w2):
        return ("%DASH", True, 0)
    r1 = _word_result_alnum(w1) or _word_result_slow(w1)
    r2 = _word_result_alnum(w2) or _word_result_dash(w2) or _word_result_slow(w2)
    frag = r1[0] + ("- " if r1[1] else "") + r2[0]
    return (frag, r2[1], 0)


# letters-only segments joined by single dots (hostnames, module paths:
# registry.example.com, os.path) — the third-most-common miss shape in the
# cold profile after alnum and dash (round 6)
_DOTTED_WORD_RE = re.compile(r"^[A-Za-z]+(?:\.[A-Za-z]+)+$")
# _UID_FAST_RE restricted to the letters+dots alphabet: hex-ish letters
# (the A-class keeps only a-f/A-F, lowercase x, capital Z) with '.' as a
# separator-class char
_HEX_DOT_RE = re.compile(r"^[a-fA-FxZ][a-fA-FxZ.]*$")


def _word_result_dotted(word: str) -> tuple[str, bool, int] | None:
    """Exact-equivalent result of _do_process for letters+dots words, or
    None when out of shape.

    For this shape the cascade collapses: %DATE needs isalpha (dots break
    it), %HASH needs ':'/'~' after an h/s/m prefix or a 64-char run of its
    dot-free class (excluded by the < 64 cap), %UID(uuid) needs 3 dashes,
    %URL '://', %REF '/' or '..' (single dots only here), %BASE64 '=' or
    its dot-free charset, %UNIT/pid-trim '[', %ODD its char class,
    key-value '='/':', the '/'-'-'-'|' splits their chars, two-words
    '[', '(', '\\\\', '@', error words carry no dots, and _remove_numbers
    is the identity (no digits). What remains, in the exact
    tokenizer.rs:455-480 precedence: %ID (uid pattern with '.' as
    separator / uid literals / no-vowel), %COOKIE, %PATH's tmp prefix,
    the <=3-byte drop, %BIG at >= 32 bytes, else the word itself.
    Differentially fuzz-tested (tests/test_tokenizer_fastpath.py)."""
    if "." not in word or len(word) >= 64 or _DOTTED_WORD_RE.match(word) is None:
        return None
    if (
        _HEX_DOT_RE.match(word) is not None
        or (
            ("latest" in word or "none" in word)
            and _uid_pattern_match_slow(word)
        )
        or _contains_no_vowel(word)
    ):
        return ("%ID", True, 0)
    if word.startswith(("gAAAA", "AAAA", "tap")) or (
        word.startswith("tx") and len(word) > 2 and word[2] in _LC
    ):
        return ("%COOKIE", True, 0)
    if word.startswith("tmp"):
        return ("%PATH", True, 0)
    if len(word) <= 3:
        return ("", False, 0)
    if len(word) >= 32:
        return ("%BIG", True, 0)
    return (word, True, 0)


def _word_result_slow(word: str) -> tuple[str, bool, int]:
    """The full cascade (used directly by the differential fast-path test)."""
    out: list[str] = []
    consumed = [0]

    def _counting():
        while True:
            consumed[0] += 1
            yield ""

    added = _do_process(word, _counting(), out)
    return "".join(out), added, consumed[0]


@lru_cache(maxsize=1 << 18)
def _word_result(word: str) -> tuple[str, bool, int]:
    """(appended fragment, added flag, number of following words consumed)
    for one word. Word processing is a pure function of the word except for
    the consume-next cases (%VALUE_ID with empty value, password keys) where
    the consumed word's content is discarded (tokenizer.rs:536,576) — so the
    full result is cacheable per word, which makes tokenizing repetitive log
    vocabularies a dict lookup per word."""
    fast = (
        _word_result_alnum(word)
        or _word_result_dash(word)
        or _word_result_dotted(word)
    )
    if fast is not None:
        return fast
    return _word_result_slow(word)


@lru_cache(maxsize=1 << 20)
def process(line: str) -> str:
    """Tokenize one line (reference entry point tokenizer.rs:588-608)."""
    line = line.strip()
    if global_filter(line):
        return "%GL_FILTER"
    out: list[str] = []
    skip = 0
    # fast path: without tabs, backslashes or separator runs, the split
    # regex degenerates to a plain space split
    if "\t" not in line and "\\" not in line and "  " not in line:
        words = line.split(" ")
    else:
        words = _WORDS_RE.split(line)
    for word in words:
        if skip:
            skip -= 1
            continue
        frag, added, consumed = _word_result(word)
        skip = consumed
        if frag:
            out.append(frag)
        if added:
            out.append(" ")
    return "".join(out).rstrip()


def dedup_key(tokens: str) -> str:
    """Order-insensitive dedup key of a tokenized line.

    Reference: UnorderedLine (crates/model/src/unordered.rs:9-22) = the
    sorted non-%-prefixed words.  Serialized as a single space-joined
    string so it can live in a DataFrame column.
    """
    return " ".join(sorted(w for w in tokens.split(" ") if not w.startswith("%")))


# --- pandas / Spark integration ---------------------------------------------


def process_series(s):
    """Vectorized tokenize over a pandas Series (batch-level dedup + cache)."""
    import pandas as pd

    uniq = s.dropna().unique()
    mapping = {u: process(u) for u in uniq}
    return s.map(mapping).astype("object").where(s.notna(), None)


@lru_cache(maxsize=1 << 18)
def _dkey_of_tokens(tokens: str) -> str:
    """dedup_key cached per distinct TOKENS value: masking collapses
    high-entropy lines onto few token strings, so even a per-line-unique
    corpus hits this cache almost always (the fused text->dkey path's
    leverage)."""
    return dedup_key(tokens)


def dkey_of_text_series(s):
    """Vectorized text -> dedup key DIRECTLY (fused tokenize + dkey).

    Exactly dedup_key(process(line)) per line — the fused parse mode
    (pipeline.parse columns="dkey") uses this so a row's tokens string
    never crosses the Arrow boundary or lands in the stage checkpoint;
    winner tokens are recomputed from the winner's text at winner scale
    (process is a pure function of the line, so the recomputation is
    exact — pinned by tests/test_parse_modes.py)."""
    uniq = s.dropna().unique()
    mapping = {u: _dkey_of_tokens(process(u)) for u in uniq}
    return s.map(mapping).astype("object").where(s.notna(), None)


def dedup_key_series(s):
    uniq = s.dropna().unique()
    mapping = {u: dedup_key(u) for u in uniq}
    return s.map(mapping).astype("object").where(s.notna(), None)


def tokenize_udf():
    """Returns a pandas UDF column function: text -> tokens."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _tokenize(s):  # pragma: no cover - executed on executors
        return process_series(s)

    return _tokenize


def dedup_key_udf():
    """Returns a pandas UDF column function: tokens -> dedup key."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _dedup(s):  # pragma: no cover - executed on executors
        return dedup_key_series(s)

    return _dedup


def dkey_of_text_udf():
    """Returns a pandas UDF column function: text -> dedup key (fused)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _dkey(s):  # pragma: no cover - executed on executors
        return dkey_of_text_series(s)

    return _dkey
