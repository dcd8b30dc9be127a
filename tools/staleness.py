"""Correctness-witness staleness audit + prefix-rotation planner.

The driver verifies a ~``PREFIX_BUDGET``-query prefix of the registry
each round and records the results in ``CORRECTNESS_r{N}.json``.  The
rotation invariant (documented in README.md "Prefix rotation") is:

    every registered query's most recent driver-green row is at most
    ``invariant_bound()`` rounds old once it has been witnessed.

The bound is **derived from arithmetic, not aspiration**: with N
registered queries and a budget of B driver rows per round, a full
rotation takes ``ceil(N / B)`` rounds, so the tightest staleness any
perfect rotation can guarantee in steady state is ``ceil(N / B) - 1``
— and one extra round of slack absorbs a backlog-recovery round (e.g.
a burst of new registrations, or digging out of a missed round)
without making the gate permanently red.  Hence::

    invariant_bound() == ceil(len(registry) / PREFIX_BUDGET)

At 170 queries / 50 rows that is 4.  The earlier hand-written
"two rounds" invariant was unsatisfiable at this registry size
(ceil(170/50) = 4 > 2) — see VERDICT r7 task #1 / r8 task #2.

This tool computes, from the CORRECTNESS files on disk:

  * the last round each registered query was driver-witnessed green;
  * the staleness (rounds since last green) of every query;
  * a recommended next-round prefix, in three tiers:
      1. witnessed queries that would BREACH the bound next round
         (staleness >= bound now);
      2. never-witnessed queries (first-witness priority);
      3. remaining witnessed queries, stalest first.

Run as a script for a human-readable report::

    python tools/staleness.py [--budget 50] [--fail-over N]

``--fail-over N`` exits non-zero if any witnessed query is more than N
rounds stale (default: ``invariant_bound()``) — used by
``tests/test_hardening.py`` to keep the rotation mechanical instead of
relying on a hand-maintained comment.
"""

from __future__ import annotations

import argparse
import json
import math
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

#: Driver rows per round — set by the verify harness, not by us.
PREFIX_BUDGET = 50


def invariant_bound(n_queries: int | None = None,
                    budget: int = PREFIX_BUDGET) -> int:
    """Maximum permitted witness staleness, derived from rotation math.

    ``ceil(N / B)``: the number of rounds a full rotation of N queries
    takes at B driver rows per round.  Perfect rotation keeps steady-
    state staleness at ``ceil(N/B) - 1``; the extra round of headroom
    covers transient backlog (registration bursts, recovery from a
    missed round) so the gate is satisfiable, not merely aspirational.
    """
    if n_queries is None:
        n_queries = len(registry_names())
    return max(1, math.ceil(n_queries / budget))


def load_witness_rounds(repo: Path = REPO) -> tuple[int, dict[str, int]]:
    """Return (latest_round, {query: last_green_round}).

    A query counts as green in a round iff its row has rows_match,
    schema_match and no error (hash_match additionally when present —
    rows-only checks still count as a witness, matching the driver's
    own gate).
    """
    latest = 0
    last_green: dict[str, int] = {}
    for path in sorted(repo.glob("CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path.name)
        if not m:
            continue
        rnd = int(m.group(1))
        latest = max(latest, rnd)
        rows = json.loads(path.read_text())
        for name, row in rows.items():
            ok = (
                row.get("rows_match") is True
                and row.get("schema_match") is True
                and row.get("err") in (None, "")
                and row.get("hash_match") in (True, None)
            )
            if ok:
                last_green[name] = max(last_green.get(name, 0), rnd)
    return latest, last_green


def registry_names() -> list[str]:
    if str(REPO) not in sys.path:
        sys.path.insert(0, str(REPO))
    from solana_etl_pipeline_spark.queries import QUERIES

    return list(QUERIES)


def plan_next_prefix(
    budget: int = PREFIX_BUDGET,
    promote: "list[str] | None" = None,
) -> dict:
    """Compute staleness and the recommended next-round prefix.

    ``promote`` lifts the named queries to the head of the ordering
    (after tier-1 must-rotates and tier-2 first-witnesses, in the
    given order) — the mechanical form of the r11/r12 convention that
    PLAN-CHANGED queries outrank stale witnesses: a query whose
    physical plan was rewritten this round needs a fresh driver
    witness regardless of how recently the OLD plan was green. Names
    must exist in the registry (typo guard)."""
    latest, last_green = load_witness_rounds()
    names = registry_names()
    # The invariant bound always uses the driver's real per-round row
    # count (PREFIX_BUDGET); ``budget`` only controls how much of the
    # recommended ordering this call emits.
    bound = invariant_bound(len(names))
    staleness = {n: latest - last_green[n] for n in names if n in last_green}
    unwitnessed = [n for n in names if n not in last_green]
    # Next round, everything ages one more round. Priority order:
    #   1. MUST-ROTATE — witnessed queries at staleness >= bound,
    #      which would breach the invariant (and trip the
    #      test_hardening gate) if they miss the next prefix;
    #   2. never-witnessed queries — first-witness priority: a query
    #      with zero driver rows is weaker evidence than one aging
    #      within the bound, so first witnesses outrank non-urgent
    #      refreshes (the bound's built-in slack round is what makes
    #      this safe for the refresh backlog);
    #   3. the remaining witnessed queries, stalest first.
    # Stable registry order within each tier keeps the plan
    # deterministic.
    order = {n: i for i, n in enumerate(names)}
    witnessed = sorted(
        (n for n in names if n in last_green),
        key=lambda n: (-staleness[n], order[n]),
    )
    must_rotate = [n for n in witnessed if staleness[n] >= bound]
    rest = [n for n in witnessed if staleness[n] < bound]
    promote = promote or []
    unknown = [n for n in promote if n not in order]
    if unknown:
        raise ValueError(f"--promote names not in registry: {unknown}")
    promoted = [
        n for n in promote
        if n in rest  # already urgent/unwitnessed names keep their tier
    ]
    rest = [n for n in rest if n not in promoted]
    prefix = must_rotate + unwitnessed + promoted + rest
    return {
        "latest_round": latest,
        "bound": bound,
        "unwitnessed": unwitnessed,
        "staleness": staleness,
        "recommended_prefix": prefix[:budget],
    }


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--budget", type=int, default=PREFIX_BUDGET)
    ap.add_argument("--fail-over", type=int, default=None, metavar="N",
                    help="exit 1 if any witnessed query is > N rounds "
                         "stale (default: invariant_bound())")
    ap.add_argument("--promote", default="", metavar="Q1,Q2,...",
                    help="comma-joined query names to lift ahead of "
                         "the non-urgent tier (use for plan-changed "
                         "queries: a rewritten plan needs a fresh "
                         "witness regardless of staleness)")
    args = ap.parse_args(argv)

    plan = plan_next_prefix(
        args.budget,
        promote=[n for n in args.promote.split(",") if n],
    )
    if args.fail_over is None:
        args.fail_over = plan["bound"]
    stale = plan["staleness"]
    by_age: dict[int, list[str]] = {}
    for n, s in stale.items():
        by_age.setdefault(s, []).append(n)
    print(f"latest driver round: r{plan['latest_round']:02d}  "
          f"(invariant bound: staleness <= {plan['bound']})")
    for age in sorted(by_age, reverse=True):
        print(f"  staleness {age}: {len(by_age[age])} queries")
        if age >= plan["bound"]:
            for n in by_age[age]:
                print(f"    - {n}")
    if plan["unwitnessed"]:
        print(f"  never witnessed: {plan['unwitnessed']}")
    print(f"recommended next prefix (budget {args.budget}):")
    for n in plan["recommended_prefix"]:
        print(f"  {n}")

    if args.fail_over is not None:
        over = [n for n, s in stale.items() if s > args.fail_over]
        if over:
            print(f"FAIL: {len(over)} queries > {args.fail_over} rounds stale: {over}",
                  file=sys.stderr)
            return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
