"""Staircase accumulation + date-axis unit tests, mirroring the reference's
staircase_tests.cpp and dates_tests.cpp coverage depth."""

import math

import numpy as np

from delphy_tpu.probers import _add_boxcar, _add_trapezoid
from delphy_tpu.dates import (parse_iso_date, parse_iso_month, parse_iso_year,
                              to_iso_date, to_linear_year,
                              extract_date_range_from_id)


# ---- staircase (core/staircase.h add_boxcar/add_trapezoid) -----------------

def test_boxcar_mass_and_alignment():
    row = np.zeros(10)
    _add_boxcar(0.0, 1.0, row, 2.25, 5.75, 2.0)
    # total mass = h * (b - a)
    np.testing.assert_allclose(row.sum(), 2.0 * 3.5, rtol=1e-12)
    # cell-aligned contributions
    np.testing.assert_allclose(row[2], 2.0 * 0.75)
    np.testing.assert_allclose(row[3], 2.0)
    np.testing.assert_allclose(row[4], 2.0)
    np.testing.assert_allclose(row[5], 2.0 * 0.75)
    assert row[0] == row[1] == row[6] == 0.0


def test_boxcar_clips_to_domain():
    row = np.zeros(4)
    _add_boxcar(0.0, 1.0, row, -3.0, 10.0, 1.0)
    np.testing.assert_allclose(row, np.ones(4))


def test_trapezoid_mass_and_ramp():
    row = np.zeros(8)
    _add_trapezoid(0.0, 1.0, row, 1.0, 5.0, 0.0, 4.0)
    # total mass = average height * width = 2 * 4
    np.testing.assert_allclose(row.sum(), 8.0, rtol=1e-12)
    # heights increase along the ramp
    assert row[1] < row[2] < row[3] < row[4]
    # each full cell's value = ramp value at the cell midpoint
    for c in (1, 2, 3, 4):
        mid = c + 0.5
        np.testing.assert_allclose(row[c], 4.0 * (mid - 1.0) / 4.0,
                                   rtol=1e-12)


def test_trapezoid_degenerate_interval_is_noop():
    row = np.zeros(4)
    _add_trapezoid(0.0, 1.0, row, 2.0, 2.0, 1.0, 3.0)
    assert row.sum() == 0.0


def test_boxcar_subcell_interval():
    row = np.zeros(4)
    _add_boxcar(0.0, 1.0, row, 1.25, 1.5, 8.0)
    np.testing.assert_allclose(row[1], 2.0)
    np.testing.assert_allclose(row.sum(), 2.0)


# ---- dates (core/dates.{h,cpp}) ---------------------------------------------

def test_iso_date_roundtrip_epoch():
    # the time axis is days since 2020-01-01 (dates.h:10-17)
    assert parse_iso_date("2020-01-01") == 0.0
    assert parse_iso_date("2020-01-02") == 1.0
    assert parse_iso_date("2019-12-31") == -1.0
    for s in ("2020-01-01", "2021-07-15", "1999-02-28", "2024-02-29"):
        assert to_iso_date(parse_iso_date(s)) == s


def test_month_and_year_ranges():
    # half-open ranges: hi = first day of the NEXT month/year, exactly the
    # reference convention (dates.cpp:24-46 CivilDay{m+1})
    lo, hi = parse_iso_month("2020-02")
    assert lo == parse_iso_date("2020-02-01")
    assert hi == parse_iso_date("2020-03-01")  # leap-Feb has 29 days
    assert hi - lo == 29.0
    lo, hi = parse_iso_month("2021-02")
    assert hi - lo == 28.0
    lo, hi = parse_iso_year("2020")
    assert lo == parse_iso_date("2020-01-01")
    assert hi == parse_iso_date("2021-01-01")
    assert hi - lo == 366.0  # leap year


def test_linear_year():
    # to_linear_year: fractional years for BEAST output
    y0 = to_linear_year(parse_iso_date("2020-01-01"))
    y1 = to_linear_year(parse_iso_date("2021-01-01"))
    assert abs(y0 - 2020.0) < 3e-3
    assert abs(y1 - 2021.0) < 3e-3
    ym = to_linear_year(parse_iso_date("2020-07-02"))
    assert 2020.45 < ym < 2020.55


def test_extract_date_range_from_id_forms():
    assert extract_date_range_from_id("tip|2020-03-05") == \
        (parse_iso_date("2020-03-05"),) * 2
    lo, hi = extract_date_range_from_id("a|b|2020-03")
    assert lo == parse_iso_date("2020-03-01")
    assert hi == parse_iso_date("2020-04-01")  # half-open, as the reference
    lo, hi = extract_date_range_from_id("x|2020")
    assert lo == parse_iso_date("2020-01-01")
    assert hi == parse_iso_date("2021-01-01")
    assert extract_date_range_from_id("no-date-here") is None
