"""ANN recall@k harness: measure how USEFUL each approximate index is,
not just that it finds planted exact twins.

The registry's planted-twin oracles (queries/llm.py) prove exact copies
surface at rank 1; this harness measures recall on ORGANIC neighbors —
the thing an index exists for — against brute-force cosine ground
truth, sweeping each index's tuning knob:

  * ``lsh_cosine_topk``   vs n_bands     (candidate volume knob)
  * ``ivf_cosine_topk``   vs nprobe      (cells probed per query)
  * ``pq_cosine_topk``    vs shortlist   (ADC → exact re-rank width)
  * ``ivfpq_cosine_topk`` vs nprobe × shortlist (the composed index)

Corpus: a deterministic planted-cluster mixture (seeded numpy, no
wall-clock state) — ``n_clusters`` unit centers, each vector a
noise-perturbed center, renormalized. ``noise`` is chosen so clusters
OVERLAP (a query's true top-k usually straddles cell boundaries at
nprobe=1), which is what makes the nprobe/recall curve informative
instead of trivially flat. Query vectors are additional perturbations
held OUT of the corpus, so ground truth contains no self-matches.

Generation is driver-side numpy (100 k × 64 doubles ≈ 50 MB) — this is
a measurement tool, not a production operator; the indexes under test
do their work distributed.

Run::

    python tools/recall_harness.py               # 100 k corpus, full grid
    python tools/recall_harness.py --quick       # 20 k corpus, small grid

Prints one markdown table (for COVERAGE.md) plus one JSON line with
every (index, params) → recall@k measurement.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def synthetic_corpus(spark, n=100_000, dim=64, n_clusters=200,
                     noise=0.7, n_queries=50, seed=7):
    """(corpus_df, queries_df): planted-cluster unit vectors.

    corpus rows: vec_id 0..n-1, cluster = vec_id % n_clusters.
    queries: vec_id 1_000_000+i, perturbed from cluster i's center with
    the same noise — IN-distribution probes that are NOT corpus rows.
    """
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)

    def _perturbed(cluster_ids, gen):
        # per-component sigma noise/sqrt(dim): the noise VECTOR has
        # expected norm ≈ `noise` relative to the unit center, so
        # same-cluster cosine ≈ 1/sqrt(1+noise²) — structure survives
        # (a raw `noise * standard_normal(dim)` would have norm
        # noise*sqrt(dim) ≈ 8·noise and swamp the center entirely)
        v = centers[cluster_ids] + (noise / np.sqrt(dim)) * (
            gen.standard_normal((len(cluster_ids), dim))
        )
        return v / np.linalg.norm(v, axis=1, keepdims=True)

    corpus_vecs = _perturbed(np.arange(n) % n_clusters, rng)
    query_vecs = _perturbed(np.arange(n_queries) % n_clusters, rng)

    def _df(ids, vecs):
        pdf = pd.DataFrame(
            {"vec_id": ids, "embedding": [v.tolist() for v in vecs]}
        )
        return spark.createDataFrame(pdf)

    corpus = _df(np.arange(n), corpus_vecs).repartition(32, "vec_id")
    queries = _df(np.arange(n_queries) + 1_000_000, query_vecs)
    return corpus, queries


def _topk_sets(df) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def recall_at_k(approx, exact: dict[int, set[int]], k: int) -> float:
    """Mean over queries of |approx ∩ exact| / k. Queries the index
    returns NOTHING for count as recall 0 (they stay in the mean)."""
    got = _topk_sets(approx)
    return sum(
        len(got.get(q, set()) & hits) / k for q, hits in exact.items()
    ) / len(exact)


def run(spark, n=100_000, k=5, quick=False):
    from pyspark.sql import functions as F

    from solana_etl_pipeline_spark.llm.similarity import (
        cosine_topk,
        ivf_cosine_topk,
        ivfpq_cosine_topk,
        kmeans_fit,
        lsh_cosine_topk,
        pq_cosine_topk,
        pq_fit,
    )

    corpus, queries = synthetic_corpus(spark, n=n)
    corpus = corpus.persist()
    corpus.count()
    n_cells = max(16, min(256, n // 400))  # ~400 vectors per cell

    t0 = time.time()
    exact = _topk_sets(
        cosine_topk(corpus, queries, k=k, max_queries=None)
    )
    results = [("exact", "brute-force", 1.0, round(time.time() - t0, 1))]

    centroids = kmeans_fit(corpus, k=n_cells, dim=64, n_iters=2)
    books = {
        m: pq_fit(corpus, m=m, ksub=16, dim=64, n_iters=1)
        for m in ((8,) if quick else (8, 16))
    }

    def measure(label, param, fn):
        t = time.time()
        r = recall_at_k(fn(), exact, k)
        results.append((label, param, round(r, 3), round(time.time() - t, 1)))

    for n_bands in (2, 4) if quick else (2, 4, 8):
        measure("lsh", f"n_bands={n_bands}", lambda nb=n_bands: lsh_cosine_topk(
            corpus, queries, k=k, n_planes=16, n_bands=nb))
    for nprobe in (1, 4) if quick else (1, 2, 4, 8):
        measure("ivf", f"nprobe={nprobe}", lambda np_=nprobe: ivf_cosine_topk(
            corpus, queries, centroids, k=k, nprobe=np_))
    for m, book in books.items():
        for shortlist in (50, 200) if quick else (50, 100, 200):
            measure("pq", f"m={m},shortlist={shortlist}",
                    lambda b=book, sl=shortlist: pq_cosine_topk(
                        corpus, queries, b, k=k, shortlist=sl))
    ivfpq_grid = (
        [(1, 50), (2, 200)]
        if quick
        else [(1, 100), (2, 100), (2, 200), (4, 200)]
    )
    for m, book in books.items():
        for nprobe, shortlist in ivfpq_grid:
            measure("ivfpq", f"m={m},nprobe={nprobe},shortlist={shortlist}",
                    lambda b=book, np_=nprobe, sl=shortlist: ivfpq_cosine_topk(
                        corpus, queries, centroids, b, k=k,
                        shortlist=sl, nprobe=np_))
    corpus.unpersist()

    print(f"\n| index | params | recall@{k} | sec |")
    print("|---|---|---|---|")
    for label, param, r, sec in results:
        print(f"| {label} | {param} | {r} | {sec} |")
    print()
    print(json.dumps({
        "n": n, "k": k, "n_cells": n_cells,
        "results": [
            {"index": l, "params": p, "recall": r, "sec": s}
            for l, p, r, s in results
        ],
    }))
    return results


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args(argv)
    if args.quick and args.n == 100_000:
        args.n = 20_000

    from solana_etl_pipeline_spark.session import build_session

    spark = build_session(app_name="recall-harness")
    spark.sparkContext.setLogLevel("ERROR")
    run(spark, n=args.n, k=args.k, quick=args.quick)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
