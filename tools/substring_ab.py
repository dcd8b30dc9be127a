"""Interleaved A/B: r12 JVM substring windows vs the r11 Arrow shape.

VERDICT r12 watch item 1 / task 2: after the JVM-side window rebuild
(6711f11) the committed sf0.1 bench for ``llm_substring_dedup`` moved
+15% on min while every rehearsal-scale leg improved — but the
fixture-scale number was never interleave-pinned against the r11
shape, and the box swings ±40% ambient. This tool settles it the
established ``cap_overhead_ab.py`` way: both variants alternate within
ONE session over the SAME registry-query shape (run-augmented sf0.1
corpus, window=20, noop sink like bench.py), so ambient load cancels;
report the per-variant MIN.

Variant A (jvm): the live ``llm.substrings.duplicate_span_report``.
Variant B (arrow): the r11 implementation, extracted verbatim from git
(``6711f11^``) at runtime and imported as a shadow module — no code
copy is checked in, and the comparison can never drift from what r11
actually shipped.

Run: python tools/substring_ab.py [reps] [--sf-dir DIR]
Log:  tools/logs/substring_ab_r13.log (tee manually).
"""

from __future__ import annotations

import argparse
import importlib.util
import statistics
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

R11_REF = "6711f11^"
R11_PATH = "solana_etl_pipeline_spark/llm/substrings.py"


def load_r11_module():
    src = subprocess.check_output(
        ["git", "-C", str(REPO), "show", f"{R11_REF}:{R11_PATH}"],
        text=True,
    )
    tmp = tempfile.NamedTemporaryFile(
        "w", suffix="_substrings_r11.py", delete=False
    )
    tmp.write(src)
    tmp.close()
    spec = importlib.util.spec_from_file_location(
        "substrings_r11_shadow", tmp.name
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("reps", nargs="?", type=int, default=4)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from solana_etl_pipeline_spark.session import build_session
    from solana_etl_pipeline_spark.llm import substrings as live
    from solana_etl_pipeline_spark.queries.llm import _substr_augmented
    from solana_etl_pipeline_spark.sources import load_table

    r11 = load_r11_module()
    spark = build_session(app_name="substring-ab")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, args.sf_dir, "documents")
    corpus = _substr_augmented(docs)

    variants = {
        "jvm_r12": live.duplicate_span_report,
        "arrow_r11": r11.duplicate_span_report,
    }
    walls: dict[str, list[float]] = {k: [] for k in variants}
    counts: dict[str, int] = {}

    def run(label: str, timed: bool = True) -> None:
        fn = variants[label]
        t0 = time.perf_counter()
        rep = fn(corpus, window=20)
        rep.write.format("noop").mode("overwrite").save()
        w = time.perf_counter() - t0
        if timed:
            walls[label].append(w)
        else:
            # equivalence check once, on the untimed warm-up only (a
            # count re-executes the whole pipeline)
            counts[label] = rep.count()
        print(f"{label}: {w:.2f}s", flush=True)

    # one untimed warm-up per variant (codegen/JIT/page cache)
    run("jvm_r12", timed=False)
    run("arrow_r11", timed=False)
    for _ in range(args.reps):
        run("jvm_r12")
        run("arrow_r11")

    assert counts["jvm_r12"] == counts["arrow_r11"], counts
    print(f"row counts agree: {counts['jvm_r12']}")
    for label, ws in walls.items():
        print(
            f"{label}: min {min(ws):.2f}s median "
            f"{statistics.median(ws):.2f}s n={len(ws)} all="
            f"{[round(w, 2) for w in ws]}"
        )
    ratio = min(walls["jvm_r12"]) / min(walls["arrow_r11"])
    print(f"jvm/arrow min ratio: {ratio:.3f}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
