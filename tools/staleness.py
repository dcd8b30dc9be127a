"""Correctness-witness staleness audit + prefix-rotation planner.

The driver verifies a ~50-query prefix of the registry each round and
records the results in ``CORRECTNESS_r{N}.json``.  The rotation
invariant (documented in README.md "Prefix rotation") is:

    every registered query's most recent driver-green row is at most
    TWO rounds old once it has been witnessed at least once.

This tool computes, from the CORRECTNESS files on disk:

  * the last round each registered query was driver-witnessed green;
  * the staleness (rounds since last green) of every query;
  * a recommended next-round prefix: all queries whose staleness would
    exceed the invariant next round, oldest first, padded with the
    next-oldest greens up to the prefix budget.

Run as a script for a human-readable report::

    python tools/staleness.py [--budget 50] [--fail-over N]

``--fail-over N`` exits non-zero if any witnessed query is more than N
rounds stale — used by ``tests/test_hardening.py`` to keep the
rotation mechanical instead of relying on a hand-maintained comment.
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


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


def plan_next_prefix(budget: int = 50) -> dict:
    """Compute staleness and the recommended next-round prefix."""
    latest, last_green = load_witness_rounds()
    names = registry_names()
    staleness = {n: latest - last_green[n] for n in names if n in last_green}
    unwitnessed = [n for n in names if n not in last_green]
    # Next round, everything ages one more round. Priority order:
    #   1. MUST-ROTATE — witnessed queries at staleness >= 2, which
    #      would breach the two-round invariant (and trip the
    #      test_hardening gate) if they miss the next prefix;
    #   2. never-witnessed queries — a first driver row is best-effort
    #      (the gate only binds once a query has been witnessed), so
    #      in a heavy-registration round they wait a round rather than
    #      aging enforceable evidence past the invariant;
    #   3. the remaining witnessed queries, stalest first.
    # Stable registry order within each tier keeps the plan
    # deterministic.
    order = {n: i for i, n in enumerate(names)}
    witnessed = sorted(
        (n for n in names if n in last_green),
        key=lambda n: (-staleness[n], order[n]),
    )
    must_rotate = [n for n in witnessed if staleness[n] >= 2]
    rest = [n for n in witnessed if staleness[n] < 2]
    prefix = must_rotate + unwitnessed + rest
    return {
        "latest_round": latest,
        "unwitnessed": unwitnessed,
        "staleness": staleness,
        "recommended_prefix": prefix[:budget],
    }


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--budget", type=int, default=50)
    ap.add_argument("--fail-over", type=int, default=None, metavar="N",
                    help="exit 1 if any witnessed query is > N rounds stale")
    args = ap.parse_args(argv)

    plan = plan_next_prefix(args.budget)
    stale = plan["staleness"]
    by_age: dict[int, list[str]] = {}
    for n, s in stale.items():
        by_age.setdefault(s, []).append(n)
    print(f"latest driver round: r{plan['latest_round']:02d}")
    for age in sorted(by_age, reverse=True):
        print(f"  staleness {age}: {len(by_age[age])} queries")
        if age >= 2:
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
