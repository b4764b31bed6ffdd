"""Line-splitter goldens from /root/reference/crates/iterator/src/iterator.rs
tests (:352-442)."""

from logjuicer_spark.splitter import split_lines


def test_text_iterator():
    assert split_lines("first\nsecond\nthird\nfourth\\nsub4") == [
        ("first", 1),
        ("second", 2),
        ("third", 3),
        ("fourth", 4),
        ("sub4", 4),
    ]
    assert split_lines("first\\n") == [("first", 1)]


def test_long_line_dropped():
    text = "a" * (8192 * 2) + "first\nsecond\nthird\n"
    assert split_lines(text) == [("second", 2), ("third", 3)]


def test_last_line():
    text = "a" * (8192 * 2) + "\ntest"
    assert split_lines(text) == [("test", 2)]


def test_ansible_stdout():
    text = (
        'stdout": "Stopping systemd OpenStack\\nERROR: oops", '
        '"stdout_lines": ["Stop...", "ERR..."],'
    )
    assert split_lines(text) == [
        ('stdout": "Stopping systemd OpenStack', 1),
        ("ERROR: oops", 1),
        (', "stdout_lines": ["Stop...", "ERR..."],', 2),
    ]


def test_json_iterator():
    assert split_lines('[42, 43,\n {"key": "value", o:[1,2]}]', "json") == [
        ("42", 1),
        (" 43", 1),
        (" ", 2),
        ('"key": "value"', 2),
        (" o:", 2),
        ("1", 2),
        ("2", 2),
    ]


def test_escaped_backslash_is_not_subline():
    # '\\\\n' (escaped backslash before n) must not split
    assert split_lines(r"a\\n b") == [(r"a\\n b", 1)]


def test_xml_split():
    assert split_lines("<a>x</a><b>y</b>", "xml") == [
        ("<a>x</a>", 1),
        ("<b>y</b>", 1),
    ]
