"""Property-based tests (hypothesis) for the manifest-stats pruner —
pure Python, no Spark session. Round 5's second review found four silent
delete-skip bugs in exactly this machinery (unpadded years, chrono-vs-lex
string ordering, tz-leaky bounds), all of the same shape: a WRONG PRUNE
is a silently skipped delete, because the residual predicate never runs
over a pruned group. These properties pin the soundness contract
directly:

    _range_hits(stats, col, lo, hi) == False
        ⇒  NO value the group can contain satisfies lo ≤ v ≤ hi
            under the comparison semantics Spark actually uses
            (lexicographic for string columns, chronological for
            timestamp/date columns).

plus the encoding isomorphism every path relies on (fixed-width ⇒
string order == time order, round-trippable)."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st

from simages_spark.table import SnapshotTable, _stat_encode, _temporal_parse

_hits = SnapshotTable._range_hits


def _stats(vals):
    enc = sorted(_stat_encode(v) for v in vals)
    return {"columns": {"c": [enc[0], enc[-1]]}}


# ---------- encoding isomorphism ----------

datetimes = st.datetimes(
    min_value=dt.datetime(1, 1, 1), max_value=dt.datetime(9999, 12, 28)
)
dates = st.dates(min_value=dt.date(1, 1, 1), max_value=dt.date(9999, 12, 28))


@settings(max_examples=300)
@given(a=datetimes, b=datetimes)
def test_encode_preserves_order_and_roundtrips(a, b):
    ea, eb = _stat_encode(a), _stat_encode(b)
    assert (a <= b) == (ea <= eb)  # fixed width ⇒ lex == chrono
    assert _temporal_parse(ea) == a  # lossless round trip
    assert len(ea) == len(eb) == 26  # genuinely fixed width, any year


@settings(max_examples=300)
@given(a=dates, b=dates)
def test_date_encode_preserves_order_and_roundtrips(a, b):
    ea, eb = _stat_encode(a), _stat_encode(b)
    assert (a <= b) == (ea <= eb)
    assert _temporal_parse(ea) == dt.datetime(a.year, a.month, a.day)
    assert len(ea) == len(eb) == 10


# ---------- string-column soundness (Spark compares lexicographically) ----------

texts = st.text(min_size=0, max_size=40)
# adversarial mix: arbitrary strings, ISO-looking strings with ' ' or 'T'
# separators, bare dates, and exact _stat_encode outputs — the shapes the
# round-5 bug confused
stringish = st.one_of(
    texts,
    datetimes.map(_stat_encode),
    dates.map(_stat_encode),
    datetimes.map(lambda d: _stat_encode(d).replace("T", " ")),
    datetimes.map(lambda d: _stat_encode(d)[:19]),  # no microseconds
)


@settings(max_examples=500)
@given(
    vals=st.lists(stringish, min_size=1, max_size=6),
    lo=st.none() | stringish,
    hi=st.none() | stringish,
)
def test_string_column_prune_is_sound_under_lex_order(vals, lo, hi):
    """For a STRING column the truth is Python/UTF-8 lexicographic order
    (what Spark evaluates) — a prune must never drop a group holding a
    lex-matching value, no matter how temporal the strings look."""
    if not _hits(_stats(vals), "c", lo, hi):
        for v in vals:
            assert not (
                (lo is None or v >= lo) and (hi is None or v <= hi)
            ), (vals, lo, hi, v)


# ---------- timestamp-column soundness (truth is chronological) ----------

temporal_bound = st.one_of(
    datetimes,
    dates,
    datetimes.map(_stat_encode),
    dates.map(_stat_encode),
    texts,  # junk bounds must simply never prune
)


def _chrono(b):
    return _temporal_parse(b)


@settings(max_examples=500)
@given(
    vals=st.lists(datetimes, min_size=1, max_size=6),
    lo=st.none() | temporal_bound,
    hi=st.none() | temporal_bound,
)
def test_timestamp_column_prune_is_sound_under_chrono_order(vals, lo, hi):
    """For a TIMESTAMP column (stats string-encoded by _stat_encode) the
    truth is chronological; bounds the pruner cannot order (junk strings)
    must never prune."""
    if not _hits(_stats(vals), "c", lo, hi):
        clo = _chrono(lo) if lo is not None else None
        chi = _chrono(hi) if hi is not None else None
        # pruning with an unorderable present bound is never allowed
        assert lo is None or clo is not None
        assert hi is None or chi is not None
        for v in vals:
            assert not (
                (clo is None or v >= clo) and (chi is None or v <= chi)
            ), (vals, lo, hi, v)


@settings(max_examples=300)
@given(
    vals=st.lists(datetimes, min_size=1, max_size=6),
    lo=st.none() | datetimes,
    hi=st.none() | datetimes,
)
def test_timestamp_prune_is_exact_for_datetime_bounds(vals, lo, hi):
    """COMPLETENESS for the canonical case (datetime bounds against
    timestamp stats): the pruner keeps a group iff the [lo,hi] interval
    intersects [min(vals), max(vals)] — this is what the O(affected
    groups) cost claims rest on."""
    expect = (lo is None or max(vals) >= lo) and (
        hi is None or min(vals) <= hi
    )
    assert _hits(_stats(vals), "c", lo, hi) == expect
