"""Unit tests for the oracle harness's value canonicalization — the
compare is only as good as canon(), so pin its edge cases."""

from __future__ import annotations

import datetime as dt
import decimal

from kaflow_spark.oracle import canon


def test_decimal_normalization():
    assert canon(decimal.Decimal("1.500")) == canon(decimal.Decimal("1.5"))
    assert canon(decimal.Decimal("100")) == canon(decimal.Decimal("1E+2"))
    assert canon(decimal.Decimal("-0.10")) == canon(decimal.Decimal("-0.1"))


def test_float_int_boundary():
    assert canon(5.0) == canon(5)  # engines may return int vs double
    assert canon(5.25) == "5.25"
    assert canon(float("nan")) == "NaN"


def test_timestamps_tz_aware_vs_naive():
    aware = dt.datetime(2024, 1, 1, 10, 0, 0, tzinfo=dt.timezone.utc)
    naive = dt.datetime(2024, 1, 1, 10, 0, 0)
    assert canon(aware) == canon(naive)  # UTC-aware collapses to naive
    plus2 = dt.datetime(2024, 1, 1, 12, 0, 0, tzinfo=dt.timezone(dt.timedelta(hours=2)))
    assert canon(plus2) == canon(naive)  # offset normalized to UTC


def test_collections_and_bytes():
    assert canon([1, 2, None]) == canon((1, 2, None))
    assert canon(b"\x00\xff") == "00ff"
    assert canon(None) != canon("None")  # NULL never collides with text


def test_bool_not_confused_with_int():
    assert canon(True) == "true"
    assert canon(1) == "1"
    assert canon(True) != canon(1)
