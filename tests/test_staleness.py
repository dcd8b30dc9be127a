"""Unit tests for the prefix-rotation planner (tools/staleness.py).

The witness-staleness gate in tests/test_hardening.py derives its
bound from this module, so the arithmetic and the tier ordering are
load-bearing: a wrong bound either fails the suite forever
(unsatisfiable) or silently stops enforcing rotation.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from tools import staleness  # noqa: E402


def test_invariant_bound_is_rotation_arithmetic():
    # ceil(N / 50): the rounds a full rotation takes at 50 rows/round
    assert staleness.invariant_bound(170) == 4
    assert staleness.invariant_bound(200) == 4  # registration headroom
    assert staleness.invariant_bound(201) == 5  # crossing it loosens
    assert staleness.invariant_bound(50) == 1
    assert staleness.invariant_bound(51) == 2
    assert staleness.invariant_bound(0) == 1  # floor, never 0


def test_bound_uses_driver_budget_not_report_budget(monkeypatch):
    """--budget controls how much of the ordering is printed; the
    invariant must always divide by the driver's real row count
    (regression: a --budget 170 report once computed bound=1)."""
    monkeypatch.setattr(
        staleness, "registry_names", lambda: [f"q{i}" for i in range(170)]
    )
    monkeypatch.setattr(
        staleness, "load_witness_rounds",
        lambda repo=None: (8, {f"q{i}": 8 for i in range(170)}),
    )
    plan = staleness.plan_next_prefix(budget=170)
    assert plan["bound"] == 4


def test_planner_tiers_breach_then_unwitnessed_then_stalest(monkeypatch):
    """Tier order: (1) witnessed queries that would breach the bound
    next round, (2) never-witnessed, (3) stalest-first; registry
    order breaks ties inside each tier."""
    names = ["a", "b", "c", "d", "e", "f"]
    monkeypatch.setattr(staleness, "registry_names", lambda: list(names))
    # latest round 10; bound for 6 queries = ceil(6/50) = 1, so any
    # staleness >= 1 is must-rotate — use a bigger registry instead
    big = [f"q{i:03d}" for i in range(120)]  # bound = ceil(120/50) = 3
    last_green = {n: 10 for n in big}
    last_green["q000"] = 7  # staleness 3 -> breaches next round
    last_green["q001"] = 8  # staleness 2 -> tier 3, stalest
    del last_green["q002"]  # never witnessed -> tier 2
    monkeypatch.setattr(staleness, "registry_names", lambda: list(big))
    monkeypatch.setattr(
        staleness, "load_witness_rounds", lambda repo=None: (10, last_green)
    )
    plan = staleness.plan_next_prefix(budget=5)
    assert plan["bound"] == 3
    assert plan["recommended_prefix"][:3] == ["q000", "q002", "q001"]


def test_committed_priority_covers_full_registry():
    """_PRIORITY must enumerate every registered query exactly once —
    a partial or duplicated ordering silently changes which queries
    the driver witnesses."""
    from solana_etl_pipeline_spark.queries import QUERIES

    names = list(QUERIES)
    assert len(names) == len(set(names))
    # reordered dict still contains the whole registry
    assert len(names) >= 170
