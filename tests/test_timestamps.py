"""Timestamp goldens from /root/reference/crates/model/src/timestamps.rs
(:52-84 format table, :111-147 day-rollover)."""

from logjuicer_spark.timestamps import FULL, TIME, parse_timestamp, set_date


def test_parse_timestamp_goldens():
    assert parse_timestamp("    5-07-30 07:20:17,250 19 INFO ") is None
    assert parse_timestamp(
        "2025-08-14 13:23:14 E0814 13:23:14.981141  124399 reflector.go"
    ) == (FULL, 1755177794000)
    assert parse_timestamp("Feb 27 11:06:45 ") == (TIME, 40005000)
    assert parse_timestamp("2024-02-27T15:58:33Z ") == (FULL, 1709049513000)
    assert parse_timestamp('{"date":1708419555.859087,') == (FULL, 1708419555859)
    assert parse_timestamp("[2024/02/20 09:13:35]") == (FULL, 1708420415000)
    assert parse_timestamp("2024-02-20 09:15:54.012305") == (FULL, 1708420554012)
    assert parse_timestamp("2024-02-20 09:06:57,036 INFO") == (FULL, 1708420017036)
    assert parse_timestamp("I0220 08:45:08.004309  ") == (TIME, 31508004)


def _get_datetime(date_str, time_str):
    import datetime as dt

    kind, date = parse_timestamp(date_str)
    assert kind == FULL
    kind, t = parse_timestamp(time_str)
    assert kind == TIME
    epoch = set_date(date, t)
    return dt.datetime.fromtimestamp(epoch / 1000, tz=dt.timezone.utc).strftime(
        "%Y-%m-%d %H:%M:%S UTC"
    )


def test_set_date_goldens():
    assert _get_datetime("2024-02-27 11:05:43.333901", "Feb 27 10:41:36") == "2024-02-27 10:41:36 UTC"
    assert _get_datetime("2000-01-01 23:00:00.000", "I0000 01:00:00.000") == "2000-01-02 01:00:00 UTC"
    assert _get_datetime("2000-01-01 23:00:00.000", "I0000 18:00:00.000") == "2000-01-01 18:00:00 UTC"
    assert _get_datetime("2000-01-01 01:00:00.000", "I0000 18:00:00.000") == "1999-12-31 18:00:00 UTC"
    assert _get_datetime("2000-01-01 01:00:00.000", "I0000 05:00:00.000") == "2000-01-01 05:00:00 UTC"
