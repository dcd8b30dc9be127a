"""Benchmark harness: times every registered query at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``

Each query is fully executed via the ``noop`` sink — unlike ``count()``,
which lets Catalyst prune computed columns, a noop write materializes
every output column without collecting to the driver. Warm-up: one
throwaway run of the flagship so JVM/codegen startup isn't billed to the
first query.

Each query runs ``SPARK_GRAFT_BENCH_REPS`` times (default 3) and the
reported number is the MEDIAN — a shared machine can land a GC pause or
noisy neighbor on any single run (round 3's recorded bench had 17 s
outliers that re-ran at 1.5 s). Reps are INTERLEAVED as full sweeps
(run every query once, then repeat the whole sweep) rather than
back-to-back per query: a multi-second load burst then contaminates
one sweep — one rep of many queries — and the per-query median across
sweeps rejects it, whereas back-to-back reps put all three inside the
burst (round 4 recorded an 11.5 s simhash median that re-ran at
1.7 s). Per-query ``{median, min, n}`` goes to BENCH_FULL.json.

Noisy tail (round-8 verdict): at n=3 a single burst still lands within
1 of the median rank, so unchanged queries swung ±50% round-over-round.
After the base sweeps, queries whose median/min spread exceeds
``SPARK_GRAFT_BENCH_SPREAD`` (default 1.4) get up to
``SPARK_GRAFT_BENCH_EXTRA`` (default 2) additional sweeps — run
INTERLEAVED over just the noisy subset, same burst-rejection argument.

The REPORTED statistic is the SECOND-SMALLEST run. At n=3 that is
exactly the median — every historical BENCH_r{N} number stays
comparable — and at n=5 it discards up to three burst-contaminated
runs while still requiring two independent runs to agree (a plain
median of 5 moves the WRONG way when the top-up sweeps themselves land
in a congested window: 3 slow of 5 runs drag it above the n=3 value,
observed first-hand — pq topk base [2.4, 3.0, 6.6] + congested top-ups
[6.5, 6.5] medians to 6.5). Machine bursts only ever ADD slow samples,
so a low-rank order statistic is the right estimator of the query's
actual cost; the sidecar keeps median and min alongside it.

Burst cap (round-9 verdict): if even the second-smallest sits more
than ``SPARK_GRAFT_BENCH_BURST`` (default 1.5) above the query's own
min, all but one sample were congested — the min is reported and the
query flagged ``congested`` in the sidecar; top-upped queries are
flagged ``topped_up``. The stdout line carries ``n_topped_up`` /
``n_congested`` counts so cross-round comparisons know which numbers
carry different vote counts. Invariant: no committed per-query stat
exceeds 1.5x its own min. Every run
also appends one line to ``BENCH_HISTORY.jsonl`` (git HEAD + full
per-query detail) so round-over-round comparison doesn't depend on git
archaeology of the mutable BENCH_FULL.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

from solana_etl_pipeline_spark.queries import QUERIES
from solana_etl_pipeline_spark.session import build_session


def median(runs: list[float]) -> float:
    """Upper median (element at index n//2 of the sorted runs)."""
    return sorted(runs)[len(runs) // 2]


def is_noisy(
    runs: list[float], spread_cap: float = 1.4, floor: float = 0.25
) -> bool:
    """True when the query deserves top-up sweeps: median/min spread
    beyond ``spread_cap`` AND the median above ``floor`` (sub-second
    spread is scheduler jitter, not signal)."""
    return (
        min(runs) > 0
        and median(runs) / min(runs) > spread_cap
        and median(runs) > floor
    )


def reported_stat(
    runs: list[float], burst_cap: float = 1.5
) -> tuple[float, bool]:
    """The committed per-query statistic: the SECOND-SMALLEST run
    (== median at n=3; burst-robust at n=5 because machine bursts only
    ADD slow samples), except when even that sits more than
    ``burst_cap`` above the query's own min — then every sample but
    one was congested and the min is reported with a congested flag.
    Invariant: the returned stat never exceeds ``burst_cap`` × min.
    Returns ``(stat, is_congested)``."""
    s = sorted(runs)
    stat = s[1] if len(s) >= 2 else s[0]
    if s[0] > 0 and stat / s[0] > burst_cap:
        return s[0], True
    return stat, False


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    # one long-lived JVM runs all ~70 queries; a larger heap keeps GC
    # from taxing the later ones (overridable via env)
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    spark = build_session(app_name="solana-etl-pipeline-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    def execute(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # Warm-up: JVM classloading, codegen, parquet footer caches.
    execute(QUERIES["risk_scores_topk"].spark(spark, sf_dir))

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    all_runs: dict[str, list[float]] = {name: [] for name in QUERIES}
    for sweep in range(reps):
        for name, spec in QUERIES.items():
            t0 = time.perf_counter()
            execute(spec.spark(spark, sf_dir))
            all_runs[name].append(time.perf_counter() - t0)
            # the near-dup queries persist() signature tables scoped to
            # one run; drop them so 100 queries don't accumulate stale
            # cache (storage-memory pressure taxes later queries) — and
            # so every rep pays the same (cold-cache) cost.
            spark.catalog.clearCache()
        print(f"# sweep {sweep + 1}/{reps} done", file=sys.stderr)

    # Adaptive top-up for the noisy tail: give high-spread queries more
    # median votes so one or two bursts can't set the reported number.
    # The floor (0.25 s) skips sub-second queries whose spread is cheap
    # scheduler jitter, not signal the round comparison cares about.
    spread_cap = float(os.environ.get("SPARK_GRAFT_BENCH_SPREAD", "1.4"))
    extra = max(0, int(os.environ.get("SPARK_GRAFT_BENCH_EXTRA", "2")))
    noisy = [
        name
        for name, runs in all_runs.items()
        if is_noisy(runs, spread_cap)
    ]
    for sweep in range(extra if noisy else 0):
        for name in noisy:
            t0 = time.perf_counter()
            execute(QUERIES[name].spark(spark, sf_dir))
            all_runs[name].append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        print(
            f"# top-up sweep {sweep + 1}/{extra} over {len(noisy)} "
            f"noisy queries done",
            file=sys.stderr,
        )

    # Burst resistance (round-9 verdict): if even after top-ups the
    # second-smallest sits >1.5x above the query's own min, every
    # sample but one landed in a congested window — report the min and
    # flag the query "congested" rather than committing a stat that is
    # really a machine-load measurement. Invariant: no reported stat
    # exceeds 1.5x its own min. Top-upped queries are flagged too (and
    # counted on the stdout line) so cross-round readers know which
    # numbers carry extra votes (ADVICE r9: don't silently mix
    # estimators).
    burst_cap = float(os.environ.get("SPARK_GRAFT_BENCH_BURST", "1.5"))

    # Calm retries (ADVICE r10): min-substitution keeps the headline
    # honest but makes it a DIFFERENT estimator for congested queries.
    # Before committing to that, re-run each still-congested query in
    # the quietest window this process will see — the end of the
    # sweep, when no other bench query is running — so a second clean
    # sample can restore the homogeneous second-smallest stat. Bounded
    # (default 2 per query) and recorded per query in the sidecar.
    calm_retries = max(
        0, int(os.environ.get("SPARK_GRAFT_BENCH_CALM_RETRIES", "2"))
    )
    calm_counts: dict[str, int] = {}
    for _ in range(calm_retries):
        still = [
            name
            for name, runs in all_runs.items()
            if reported_stat(runs, burst_cap)[1]
        ]
        if not still:
            break
        for name in still:
            t0 = time.perf_counter()
            execute(QUERIES[name].spark(spark, sf_dir))
            all_runs[name].append(time.perf_counter() - t0)
            spark.catalog.clearCache()
            calm_counts[name] = calm_counts.get(name, 0) + 1
        print(
            f"# calm retry over {len(still)} congested "
            f"quer{'y' if len(still) == 1 else 'ies'} done",
            file=sys.stderr,
        )
    timings: dict[str, float] = {}
    detail: dict[str, dict[str, float]] = {}
    congested: list[str] = []
    for name, runs in all_runs.items():
        s = sorted(runs)
        stat, is_congested = reported_stat(runs, burst_cap)
        if is_congested:
            congested.append(name)
        timings[name] = round(stat, 4)
        detail[name] = {
            "stat": round(stat, 4),
            "median": round(median(runs), 4),
            "min": round(s[0], 4),
            "n": len(runs),
        }
        if extra > 0 and name in noisy:
            detail[name]["topped_up"] = True
        if is_congested:
            detail[name]["congested"] = True
        if name in calm_counts:
            detail[name]["calm_retries"] = calm_counts[name]
        print(
            f"# {name}: stat {stat:.3f}s median {median(runs):.3f}s "
            f"min {s[0]:.3f}s n={len(runs)}"
            + (" CONGESTED" if is_congested else ""),
            file=sys.stderr,
        )

    total = round(sum(timings.values()), 4)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf

    # Full per-query timings go to a sidecar (and stderr above); the
    # stdout JSON line must stay SHORT — the driver keeps only the tail
    # of the output and a ~3.5 KB line with all ~100 queries gets
    # truncated mid-line and fails to parse (BENCH_r02 "parsed": null).
    # SPARK_GRAFT_BENCH_SIDECAR redirects the sidecar so a quick
    # sf0.01 smoke drive (the verify recipe) can't clobber the
    # committed sf0.1 record.
    sidecar = os.environ.get("SPARK_GRAFT_BENCH_SIDECAR", "BENCH_FULL.json")
    with open(sidecar, "w") as fh:
        json.dump({"total_sec": total, "sf": sf_val, "queries": detail}, fh)

    # Append-only history: BENCH_FULL.json is overwritten each run, so
    # per-round per-query records previously survived only via git
    # archaeology of one mutable file. One JSONL line per run, keyed by
    # git HEAD, preserves every record. Smoke drives that redirect the
    # sidecar (the verify recipe) skip the history too.
    if "SPARK_GRAFT_BENCH_SIDECAR" not in os.environ:
        try:
            import subprocess

            head = subprocess.run(
                ["git", "rev-parse", "--short", "HEAD"],
                capture_output=True, text=True, cwd=os.path.dirname(
                    os.path.abspath(__file__)),
            ).stdout.strip() or None
        except OSError:  # pragma: no cover - git absent
            head = None
        # Anchor to the script's own directory (like the git rev-parse
        # above) — a cwd-relative path would silently write the history
        # line elsewhere when bench.py runs from another directory.
        hist_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "BENCH_HISTORY.jsonl",
        )
        with open(hist_path, "a") as fh:
            fh.write(json.dumps({
                "head": head,
                "ts": int(time.time()),
                "sf": sf_val,
                "total_sec": total,
                "queries": detail,
            }) + "\n")

    headline = [
        "risk_scores_topk",
        "events_hourly_rollup",
        "events_dedup_by_key",
        "nested_helius_flatten",
        "window_topk_per_hour",
        "join_fact_revenue",
        "llm_exact_dedup",
        "llm_minhash_near_dup",
        "llm_ngram_jaccard",
        "llm_cosine_topk",
        "llm_decontaminate",
        "llm_lm_quality_score",
        "llm_paragraph_dedup",
        "llm_pq_cosine_topk",
        "llm_dsir_select",
        "sketch_cms_user_counts",
        "streaming_hourly_rollup",
        "streaming_interval_join",
        "enrich_risk_grouped_map",
        "tpch_q1_pricing_summary",
        "tpch_q9_product_profit",
        "tpch_q18_large_orders",
    ]
    compact = {k: round(timings[k], 3) for k in headline if k in timings}
    compact["tpch_all"] = round(
        sum(v for k, v in timings.items() if k.startswith("tpch_")), 3
    )
    compact["llm_all"] = round(
        sum(v for k, v in timings.items() if k.startswith("llm_")), 3
    )
    compact["n_queries"] = len(timings)
    # surface measurement-quality flags on the headline line so
    # cross-round deltas aren't read off silently-different estimators
    if extra > 0 and noisy:
        compact["n_topped_up"] = len(noisy)
    if congested:
        compact["n_congested"] = len(congested)
    def render(q: dict) -> str:
        return json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": q,
                "sf": sf_val,
            }
        )

    # The stdout line must stay short (the driver keeps only the output
    # tail; a >~3.5 KB line truncates mid-JSON and fails to parse). If
    # the headline set ever grows past budget, DROP entries to fit —
    # never abort after a full benchmark run.
    line = render(compact)
    while len(line) >= 1800 and compact:
        compact.pop(next(iter(compact)))
        line = render(compact)
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
