"""Unit tests for bench.py's score-bearing statistic selection.

The bench's reported number is committed every round (BENCH_FULL.json,
BENCH_HISTORY.jsonl) and graded round-over-round, so the estimator's
edge cases are pinned here: the second-smallest rank, the burst cap
(no committed stat may exceed 1.5x the query's own min — round-9
verdict), and the noisy-tail top-up criterion.

No Spark session needed: the functions are pure.
"""

from __future__ import annotations

from hypothesis import given
from hypothesis import strategies as st

from bench import is_noisy, median, reported_stat


def test_stat_is_median_at_n3():
    stat, cong = reported_stat([1.0, 1.2, 9.9])
    assert stat == 1.2 and not cong
    assert median([1.0, 1.2, 9.9]) == 1.2


def test_stat_is_second_smallest_at_n5_rejecting_congested_topups():
    # the observed pq-topk case: base [2.4, 3.0, 6.6] plus two
    # congested top-ups; a plain median would move the WRONG way
    runs = [2.4, 3.0, 6.6, 6.5, 6.5]
    stat, cong = reported_stat(runs)
    assert stat == 3.0 and not cong
    assert median(runs) == 6.5  # what the stat deliberately is NOT


def test_burst_cap_reports_min_and_flags():
    # all but one sample congested: 2nd-smallest is 2.2x the min
    stat, cong = reported_stat([2.0, 4.4, 4.5])
    assert stat == 2.0 and cong


def test_single_run_never_congested():
    stat, cong = reported_stat([3.3])
    assert stat == 3.3 and not cong


@given(
    st.lists(
        st.floats(min_value=1e-3, max_value=1e3, allow_nan=False),
        min_size=1,
        max_size=12,
    ),
    st.floats(min_value=1.05, max_value=3.0),
)
def test_stat_invariant_never_exceeds_cap_times_min(runs, cap):
    """The round-9 verdict's done-criterion, as a property: for any
    run vector the committed stat is within cap x its own min."""
    stat, _ = reported_stat(runs, burst_cap=cap)
    assert stat <= cap * min(runs) + 1e-12
    assert stat >= min(runs)


def test_noisy_criterion_spread_and_floor():
    assert is_noisy([1.0, 2.0, 2.0])  # spread 2.0 > 1.4, median > 0.25
    assert not is_noisy([1.0, 1.2, 1.3])  # spread 1.2 < 1.4
    assert not is_noisy([0.05, 0.2, 0.2])  # fast query: floor wins
    assert not is_noisy([0.0, 1.0, 1.0])  # zero min: undefined spread
