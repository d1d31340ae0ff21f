"""Time-quantum view cover — a literal transcription of the reference's
``viewsByTimeRange`` walk (time.go:158-271).

The reference stores each bit of a time field once per enabled quantum
unit (views ``f_2019``, ``f_201908``, ``f_20190804``, ``f_2019080414``
for YMDH) and answers ``from=/to=`` ranges by computing the MINIMAL
view-name cover of [from, to): hours up to a day boundary, days up to a
month boundary, months up to a year boundary, whole years, then back
down. Membership of a bit therefore depends only on its TRUNCATED
timestamp being one of the covered view names — which is exactly how we
compile it on Spark: the cover is computed driver-side from the literal
from/to (this module), and the predicate is an OR of
``date_trunc(unit, ts) IN (view set)`` terms, one per unit present in
the cover. That keeps parity with the walk's observable quirks:

- sub-quantum precision in ``from`` is truncated DOWN into the first
  view (executor_test.go:7826 pins from='…T14:36' matching a bit stored
  at 14:00 — both live in the hour-14 view);
- an ``end`` inside a view EXCLUDES that view only if stepping from the
  (unaligned) start lands past it — the walk steps by whole units FROM
  THE START, not from unit boundaries;
- ``addMonth`` resets to day 1 (zeroing minutes) before adding when
  day > 28 (time.go:233-241), so late-month starts do not double-step.

The per-unit view sets are bounded exactly as the reference's view
lists are (≤ 24+31+12+years entries), so the compiled predicate is a
small IN-list — partition-prunable where the quantum column is a plain
timestamp, and an Arrow-free lambda over ``array<struct<value,ts>>``
quantum set fields.
"""

from __future__ import annotations

from datetime import datetime, timedelta

__all__ = ["views_by_time_range", "parse_pql_time", "finest_unit"]


def _go_add_date(t: datetime, y: int, m: int, d: int) -> datetime:
    """Go ``time.AddDate`` — components added then NORMALIZED (Jan 31 +
    1 month = Mar 2/3), unlike calendar-clamping date libraries."""
    yy = t.year + y
    mm = t.month + m
    yy += (mm - 1) // 12
    mm = (mm - 1) % 12 + 1
    base = datetime(
        yy, mm, 1, t.hour, t.minute, t.second, t.microsecond
    )
    return base + timedelta(days=t.day - 1 + d)


def _add_month(t: datetime) -> datetime:
    """time.go:233-241 — for day > 28 the walk resets to the 1st (hour
    kept, MINUTES DROPPED — time.Date(y, m, 1, hour, 0, 0, 0)) before
    adding the month, avoiding the Jan 31 + 1mo = Mar 2 double-step."""
    if t.day > 28:
        t = datetime(t.year, t.month, 1, t.hour)
    return _go_add_date(t, 0, 1, 0)


def _next_year_gte(t: datetime, end: datetime) -> bool:
    nxt = _go_add_date(t, 1, 0, 0)
    return nxt.year == end.year or end > nxt


def _next_month_gte(t: datetime, end: datetime) -> bool:
    nxt = _go_add_date(t, 0, 1, 0)
    return (nxt.year, nxt.month) == (end.year, end.month) or end > nxt


def _next_day_gte(t: datetime, end: datetime) -> bool:
    nxt = _go_add_date(t, 0, 0, 1)
    return (
        (nxt.year, nxt.month, nxt.day) == (end.year, end.month, end.day)
        or end > nxt
    )


def _view(unit: str, t: datetime) -> datetime:
    """viewByTimeUnit (time.go:75-89): the view NAME truncates t to the
    unit — represented here as the truncated datetime."""
    if unit == "Y":
        return datetime(t.year, 1, 1)
    if unit == "M":
        return datetime(t.year, t.month, 1)
    if unit == "D":
        return datetime(t.year, t.month, t.day)
    return datetime(t.year, t.month, t.day, t.hour)  # 'H'


def views_by_time_range(
    start: datetime, end: datetime, quantum: str
) -> dict[str, list[datetime]]:
    """The view cover of [start, end) at ``quantum`` (one of the valid
    reference quantums, time.go:44-55) as {unit: [truncated times]} —
    a faithful replay of the walk-up/walk-down loops."""
    q = quantum.upper()
    if q not in (
        "Y", "YM", "YMD", "YMDH", "M", "MD", "MDH", "D", "DH", "H", ""
    ):
        raise ValueError("invalid time quantum")
    has_y, has_m = "Y" in q, "M" in q
    has_d, has_h = "D" in q, "H" in q
    out: dict[str, list[datetime]] = {"Y": [], "M": [], "D": [], "H": []}
    t = start

    # Walk up from smallest units to largest units (time.go:170-209).
    if has_h or has_d or has_m:
        while t < end:
            if has_h:
                if not _next_day_gte(t, end):
                    break
                elif t.hour != 0:
                    out["H"].append(_view("H", t))
                    t = t + timedelta(hours=1)
                    continue
            if has_d:
                if not _next_month_gte(t, end):
                    break
                elif t.day != 1:
                    out["D"].append(_view("D", t))
                    t = _go_add_date(t, 0, 0, 1)
                    continue
            if has_m:
                if not _next_year_gte(t, end):
                    break
                elif t.month != 1:
                    out["M"].append(_view("M", t))
                    t = _add_month(t)
                    continue
            break

    # Walk back down from largest units to smallest (time.go:211-228).
    while t < end:
        if has_y and _next_year_gte(t, end):
            out["Y"].append(_view("Y", t))
            t = _go_add_date(t, 1, 0, 0)
        elif has_m and _next_month_gte(t, end):
            out["M"].append(_view("M", t))
            t = _add_month(t)
        elif has_d and _next_day_gte(t, end):
            out["D"].append(_view("D", t))
            t = _go_add_date(t, 0, 0, 1)
        elif has_h:
            out["H"].append(_view("H", t))
            t = t + timedelta(hours=1)
        else:
            break
    return {u: vs for u, vs in out.items() if vs}


#: full format first (pilosa.go:145 TimeFormat), then the partial forms
#: parsePartialTime accepts (time.go:301-410)
_TIME_FORMATS = (
    "%Y-%m-%dT%H:%M",
    "%Y-%m-%dT%H",
    "%Y-%m-%d",
    "%Y-%m",
    "%Y",
)


def parse_pql_time(v) -> datetime:
    """parseTime (time.go:274-292): the canonical '2006-01-02T15:04'
    format, the partial forms down to a bare year, a unix-seconds int,
    or an already-parsed datetime."""
    if isinstance(v, datetime):
        return v
    if isinstance(v, (int, float)):
        return datetime.utcfromtimestamp(int(v))
    s = str(v)
    for fmt in _TIME_FORMATS:
        try:
            return datetime.strptime(s, fmt)
        except ValueError:
            continue
    raise ValueError(f"cannot parse time {v!r}")


def finest_unit(quantum: str) -> str:
    """TimeQuantum.Granularity (time.go:37-42) — the last rune."""
    return quantum.upper()[-1]
