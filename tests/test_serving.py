"""Serving-layer tests: the dashboard surface over silver→gold
(``streamlit 1.3.txt`` parity — views, banded verdicts, TTL cache,
HTTP refresh page)."""

from __future__ import annotations

import datetime
import json
import time
import urllib.request

from pyspark.sql import Row

from solana_etl_pipeline_spark.pipelines.bronze_silver import (
    build_silver,
    write_silver,
)
from solana_etl_pipeline_spark.serving import Dashboard, TTLCache, serve_http
from tests.test_gold import _wrapped_doc


def _silver_fixture(spark, tmp_path) -> str:
    docs = [
        _wrapped_doc(
            "mintDiverse",
            [f"s{i}" for i in range(4)],
            [(f"buyer{i}", f"holder{i}") for i in range(4)],
        ),
        _wrapped_doc(
            "mintConc", [f"c{i}" for i in range(4)], [("whale", "whale")] * 4
        ),
    ]
    helius_raw = spark.createDataFrame([Row(raw=d) for d in docs])
    ws_raw = spark.createDataFrame(
        [Row(raw=json.dumps({"mint": "mintWs", "txType": "create"}))]
    )
    path = str(tmp_path / "silver")
    write_silver(build_silver(helius_raw, ws_raw), path, mode="overwrite")
    return path


def test_ttl_cache_reloads_after_expiry():
    now = [0.0]
    loads = []
    cache = TTLCache(ttl_sec=300.0, clock=lambda: now[0])
    for t in (0.0, 100.0, 299.0, 300.0, 550.0, 600.0):
        now[0] = t
        cache.get(lambda: loads.append(t))
    # loaded at 0, re-loaded at 300 and 600 — never inside a TTL window
    assert loads == [0.0, 300.0, 600.0]


def test_dashboard_views_and_verdicts(spark, tmp_path):
    silver_path = _silver_fixture(spark, tmp_path)
    dash = Dashboard(spark, silver_path, working_set_rows=1000)

    top = dash.top_safest(k=2)
    assert top[0]["mint"] == "mintDiverse"  # diverse holders => safest

    txns = dash.recent_transactions(100)
    assert len(txns) == 9  # 4 + 4 helius rows + 1 websocket row
    # ts-descending ordering (nulls last is fine; check non-null prefix)
    stamps = [t["ts"] for t in txns if t["ts"] is not None]
    assert stamps == sorted(stamps, reverse=True)

    detail = dash.token_detail("mintConc")
    card = detail["card"]
    assert card["risk_verdict"] in ("HIGH", "MEDIUM", "LOW")
    # one whale doing everything => concentrated, risky
    assert card["safety_score"] < 60
    assert len(detail["transactions"]) == 4

    text = dash.overview_text()
    assert "mintDiverse" in text and "Top 10 safest" in text


def test_dashboard_ttl_and_refresh(spark, tmp_path):
    now = [0.0]
    silver_path = _silver_fixture(spark, tmp_path)
    dash = Dashboard(
        spark, silver_path, working_set_rows=1000,
        data_ttl_sec=300.0, clock=lambda: now[0],
    )
    first = dash._snapshot()
    now[0] = 100.0
    assert dash._snapshot() is first  # cached inside TTL
    now[0] = 400.0
    assert dash._snapshot() is not first  # expired -> reloaded
    reloaded = dash._snapshot()
    dash.refresh()
    assert dash._snapshot() is not reloaded  # explicit invalidation


def test_serve_http_renders_overview(spark, tmp_path):
    silver_path = _silver_fixture(spark, tmp_path)
    dash = Dashboard(spark, silver_path, working_set_rows=1000)
    server = serve_http(dash, port=0, refresh_sec=7)
    try:
        port = server.server_address[1]
        html = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=30
        ).read().decode()
        assert 'http-equiv="refresh" content="7"' in html
        assert "mintDiverse" in html
        assert "<table>" in html
    finally:
        server.shutdown()
        server.server_close()


def test_ttl_cache_releases_one_generation_late_and_is_thread_safe():
    """Expiry retires the REPLACED value and releases it one refresh
    LATER (a reader that fetched it just before expiry gets a full TTL
    cycle to render from it — ADVICE r5), and concurrent gets at
    expiry run the loader exactly once."""
    import threading

    now = [0.0]
    released, loads = [], [0]
    cache = TTLCache(
        ttl_sec=10.0, clock=lambda: now[0], releaser=released.append
    )

    def loader():
        loads[0] += 1
        return f"snap{loads[0]}"

    assert cache.get(loader) == "snap1"
    now[0] = 20.0  # expired: next get reloads; snap1 retires (held)
    threads = [
        threading.Thread(target=cache.get, args=(loader,)) for _ in range(8)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert loads[0] == 2  # one reload total, not one per thread
    assert released == []  # snap1 retired, still renderable
    now[0] = 40.0  # second expiry: snap2 retires, snap1 releases
    assert cache.get(loader) == "snap3"
    assert released == ["snap1"]


def test_ttl_cache_serves_stale_value_during_refresh():
    """A reader arriving while another thread runs the loader is served
    the previous snapshot immediately instead of queueing behind the
    reload (the loader runs outside the lock — ADVICE r5)."""
    import threading

    now = [0.0]
    in_loader = threading.Event()
    release_loader = threading.Event()
    cache = TTLCache(ttl_sec=10.0, clock=lambda: now[0])

    calls = [0]

    def slow_loader():
        calls[0] += 1
        if calls[0] > 1:
            in_loader.set()
            assert release_loader.wait(timeout=30)
        return f"snap{calls[0]}"

    assert cache.get(slow_loader) == "snap1"
    now[0] = 20.0  # expired

    refresher = threading.Thread(target=cache.get, args=(slow_loader,))
    refresher.start()
    try:
        assert in_loader.wait(timeout=30)
        # loader is mid-flight on the other thread: this get must
        # return the stale snapshot immediately, not block
        t0 = time.monotonic()
        assert cache.get(slow_loader) == "snap1"
        assert time.monotonic() - t0 < 5.0
        assert calls[0] == 2  # no second concurrent reload
    finally:
        release_loader.set()
        refresher.join(timeout=30)
    assert cache.get(slow_loader) == "snap2"


def test_ttl_cache_invalidate_keeps_serve_stale_path():
    """invalidate() marks the snapshot expired WITHOUT erasing
    presence: a reader arriving while the post-invalidate reload is
    in flight is served the previous snapshot immediately — the old
    ``_loaded_at = None`` form made every such reader block behind
    the reload (review r15)."""
    import threading

    now = [0.0]
    in_loader = threading.Event()
    release_loader = threading.Event()
    cache = TTLCache(ttl_sec=300.0, clock=lambda: now[0])
    calls = [0]

    def loader():
        calls[0] += 1
        if calls[0] > 1:
            in_loader.set()
            assert release_loader.wait(timeout=30)
        return f"snap{calls[0]}"

    assert cache.get(loader) == "snap1"
    cache.invalidate()  # explicit refresh, NOT expiry

    refresher = threading.Thread(target=cache.get, args=(loader,))
    refresher.start()
    try:
        assert in_loader.wait(timeout=30)
        t0 = time.monotonic()
        assert cache.get(loader) == "snap1"  # stale served, no block
        assert time.monotonic() - t0 < 5.0
        assert calls[0] == 2
    finally:
        release_loader.set()
        refresher.join(timeout=30)
    assert cache.get(loader) == "snap2"


def test_ttl_cache_invalidate_racing_load_is_not_lost():
    """An invalidate() that lands while a load is in flight must not
    be swallowed: the loader read pre-invalidation inputs, so its
    result installs EXPIRED and the next get() reloads instead of
    serving it as fresh for a full TTL (review r15)."""
    import threading

    now = [0.0]
    in_loader = threading.Event()
    release_loader = threading.Event()
    cache = TTLCache(ttl_sec=300.0, clock=lambda: now[0])
    calls = [0]

    def loader():
        calls[0] += 1
        in_loader.set()
        assert release_loader.wait(timeout=30)
        in_loader.clear()
        return f"snap{calls[0]}"

    first = threading.Thread(target=cache.get, args=(loader,))
    first.start()
    try:
        assert in_loader.wait(timeout=30)
        cache.invalidate()  # lands mid-load
    finally:
        release_loader.set()
        first.join(timeout=30)
    # the raced load's value exists (stale-servable) but is NOT
    # fresh: the next get reloads
    release_loader.set()
    assert cache.get(loader) == "snap2"
    assert calls[0] == 2


def test_overview_html_escapes_hostile_token_names(spark, tmp_path):
    """Token names are attacker-controlled (anyone can mint a token
    named ``<script>...``); the HTML overview must escape every cell
    (review r15)."""
    payload = "<script>alert(1)</script>"
    silver = spark.createDataFrame(
        [
            Row(
                description="", type="buy", source="websocket", fee=0,
                fee_payer="", signature=f"s{i}", slot=0,
                ts=datetime.datetime(2024, 1, 1, 0, i),
                token_name=payload, token_symbol="X",
                from_account="a", to_account="b", token_amount=1.0,
                mint=f"mint{i}", token_standard="",
            )
            for i in range(3)
        ]
    )
    path = str(tmp_path / "silver")
    write_silver(silver, path, mode="overwrite")
    dash = Dashboard(spark, path, working_set_rows=100)
    page = dash.overview_html()
    assert "<script>" not in page
    assert "&lt;script&gt;alert(1)&lt;/script&gt;" in page


def test_serve_http_404_for_non_root(spark, tmp_path):
    """Only the overview page exists; /favicon.ico must not run the
    full dashboard collects (review r15)."""
    import urllib.error
    import urllib.request

    silver_path = _silver_fixture(spark, tmp_path)
    dash = Dashboard(spark, silver_path, working_set_rows=1000)
    server = serve_http(dash, port=0)
    try:
        host, port = server.server_address
        page = urllib.request.urlopen(
            f"http://{host}:{port}/", timeout=30
        ).read().decode()
        assert "Top 10 safest" in page
        try:
            urllib.request.urlopen(
                f"http://{host}:{port}/favicon.ico", timeout=30
            )
            raise AssertionError("favicon.ico should 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        server.shutdown()
