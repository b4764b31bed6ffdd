"""The alnum fast word classifier and the global-filter trigger gate must be
EXACTLY equivalent to the full cascade — differential tests over adversarial
goldens, generated corpora and hypothesis fuzz."""

import re
import string

from hypothesis import given, settings, strategies as st

import logjuicer_spark.tokenizer as T


# every class the fast path decides, plus near-misses
_GOLDEN_WORDS = [
    # dates (incl. the reference's verbatim "weeds?") and case variants
    "may", "May", "MONDAY", "weeds", "weed", "week", "weeks", "minutes",
    "wednesday", "months", "month", "days", "hour",
    # error words + near misses
    "error", "ERROR", "err", "fail", "failed", "failure", "warning",
    "traceback", "errors", "failing", "denied", "assert", "assertion",
    # hex / no-vowel / uid literals
    "deadbeef", "DEADBEEF", "0a1b2c", "1234", "ff", "x", "Z", "xZ",
    "99z", "99Z", "added", "faded", "decade", "latest", "none", "None",
    "nonessential", "greatest", "latestnone", "nonelatest", "bcdfg",
    "rhythm", "tv", "npm",
    # cookies
    "tap", "tapioca", "taXi", "tx", "txa", "txA", "tx9", "AAAA", "AAAAbc",
    "gAAAAxyz", "req", "AUTH",
    # tmp paths
    "tmp", "tmpfile", "tmpest", "temp",
    # plain words, short words, digit mixes
    "hello", "abc", "abcd", "a1b2", "a123b", "ab12cd", "word2vec",
    "1a2b3c4d", "o0o0", "iii", "aaa", "zzzz9",
    # boundary lengths
    "a" * 24, "a" * 25, "q" * 24, "g" * 3, "g" * 4,
    # dash shapes
    "pod-a2863a7f", "compute-1051", "non-zero", "NON-ZERO", "a-b",
    "a-b-c-d-e", "one-two-three-four", "deadbeef-0123", "a1-b2-c3",
    "tmp-scratch", "req-abc123", "tx-lower", "rabbitmq-cluster-id-x7",
    "latest-build", "build-latest", "none-set", "x-none", "bcd-fgh",
    "tap-dance", "abcd-efg", "ab-c", "word-" + "q" * 40,
    "q" * 30 + "-tail", "a-" + "b1-" * 12 + "z9", "a" * 40 + "-" + "b" * 30,
    # dotted shapes (round 6)
    "registry.example.com", "os.path", "a.b", "a.bc", "abcd.efgh",
    "x.z", "bcd.fgh", "deadbeef.cafe", "face.bead", "tap.example",
    "tmp.scratch", "latest.none", "none.latest", "example.latest",
    "gAAAA.x", "tx.lower", "txa.b", "very.long." + "segment." * 5 + "tail",
    "a." * 20 + "b", "no..double", ".leading", "trailing.", "Mixed.Case.Host",
]


def _fast(w):
    return (
        T._word_result_alnum(w)
        or T._word_result_dash(w)
        or T._word_result_dotted(w)
    )


def test_fast_word_goldens_match_slow():
    for w in _GOLDEN_WORDS:
        fast = _fast(w)
        if fast is not None:
            assert fast == T._word_result_slow(w), w
    # the dash fast path must actually fire on its shapes
    assert T._word_result_dash("pod-a2863a7f") is not None


@settings(max_examples=2000, deadline=None)
@given(st.text(alphabet=string.ascii_letters + string.digits + "-", min_size=1, max_size=70))
def test_fast_word_fuzz_alnum_dash(w):
    fast = _fast(w)
    if fast is not None:
        assert fast == T._word_result_slow(w)


@settings(max_examples=2000, deadline=None)
@given(st.text(alphabet=string.ascii_letters + ".", min_size=1, max_size=70))
def test_fast_word_fuzz_dotted(w):
    fast = _fast(w)
    if fast is not None:
        assert fast == T._word_result_slow(w)


@settings(max_examples=1000, deadline=None)
@given(st.text(min_size=0, max_size=30))
def test_fast_word_fuzz_any(w):
    # arbitrary text: the fast path must either abstain or agree
    fast = _fast(w)
    if fast is not None:
        assert fast == T._word_result_slow(w)


def test_fast_word_corpus_match(spark):
    from logjuicer_spark import gen

    b, t, _ = gen.generate_corpus(
        n_baseline_convs=6, n_target_convs=6, turns_per_conv=120, seed=5
    )
    words = {
        w for r in b + t for w in r["text"].split()
    }
    checked = 0
    for w in words:
        fast = _fast(w)
        if fast is not None:
            assert fast == T._word_result_slow(w), w
            checked += 1
    assert checked > 100  # the fast path actually covers corpus words


# ------------------------------------------------ global filter trigger gate


def _global_filter_reference(line: str) -> bool:
    if " " not in line and T._WHITESPACE_RE.search(line) is None:
        return True
    return T._GLOBAL_RE.search(line) is not None


_GOLDEN_LINES = [
    # one hit per _GLOBAL_RE alternative (tokenizer.rs:64-90)
    "x GET / HTTP/1.1 y",
    "x GET / HTTPx1.1",        # '.' is any-char: "HTTP/1" trigger must cover
    "log * mirror: fedora.org",
    "a Trying other mirror. b",
    "a Trying other mirrorX b",  # trailing '.' is any-char
    "run ovs-ofctl br0 dump-flows now",
    "run iptables -nvL x -L now",
    "run ebtables x -L now",
    "^* good-host.example 5 more",
    "^- other.host> 9 x",
    "dnsmasq[123]: query example.com",
    "dnsmasq: forwarded x y",
    "a1f/s0>42 trailing words",
    "++ echo single",
    "net.ipv4.conf.tap0 = 1",
    "netXipv6.neigh.tapY z",     # '.' any-char after net
    '  "net.interface.tap x',
    "col | 0123456789abcdefg | end",
    # near-misses that must NOT be filtered
    "plain log line without triggers",
    "a network restart happened here",
    "tables without trailing space-tables",
    "GET /index HTTP response",
    "pipe | short | x",
    "^caret start but no match after",
]


def test_global_filter_goldens_match_reference():
    for line in _GOLDEN_LINES:
        assert T.global_filter(line) == _global_filter_reference(line), line


@settings(max_examples=1500, deadline=None)
@given(st.text(min_size=0, max_size=120))
def test_global_filter_fuzz(line):
    assert T.global_filter(line) == _global_filter_reference(line)


@settings(max_examples=800, deadline=None)
@given(
    st.lists(
        st.sampled_from(
            ["GET", "/", "HTTP/1.1", "*", "mirror:", "Trying", "other",
             "mirror.", "ovs-ofctl", "dump-flows", "iptables", "-L",
             "dnsmasq[1]:", "query", "net.ipv4.conf.tap", "++", "echo",
             "|", "0123456789abcdefg", "^+", "host.name", "5", "word"]
        ),
        min_size=0,
        max_size=8,
    )
)
def test_global_filter_fuzz_triggerish(parts):
    line = " ".join(parts)
    assert T.global_filter(line) == _global_filter_reference(line)
