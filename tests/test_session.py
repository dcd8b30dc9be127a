"""Session-construction guards: the GCLocker diagnostic flag is
JDK-17-era (the GCLocker itself is removed by JDK 22's region
pinning) — an unrecognized -XX option aborts JVM startup, so the
default driver/executor opts must gate it on the probed java major
version (ADVICE r11)."""

from solana_etl_pipeline_spark import session


def test_gclocker_flag_present_through_jdk21(monkeypatch):
    for major in (17, 21):
        monkeypatch.setattr(session, "_java_major_version", lambda m=major: m)
        opts = session.gc_java_opts()
        assert "-XX:GCLockerRetryAllocationCount=8" in opts
        assert "-XX:+UnlockDiagnosticVMOptions" in opts
        assert "-XX:G1HeapRegionSize=32m" in opts


def test_gclocker_flag_dropped_on_jdk22_plus(monkeypatch):
    for major in (22, 25):
        monkeypatch.setattr(session, "_java_major_version", lambda m=major: m)
        opts = session.gc_java_opts()
        assert "GCLocker" not in opts
        assert "UnlockDiagnosticVMOptions" not in opts
        assert "-XX:G1HeapRegionSize=32m" in opts


def test_gclocker_flag_dropped_when_probe_fails(monkeypatch):
    monkeypatch.setattr(session, "_java_major_version", lambda: None)
    opts = session.gc_java_opts()
    # Fail closed: never emit a flag the JVM might reject.
    assert "GCLocker" not in opts
    assert "-XX:G1HeapRegionSize=32m" in opts


def test_java_probe_parses_this_boxes_jdk():
    session._java_major_version.cache_clear()
    major = session._java_major_version()
    assert major is not None and major >= 17


_CHANGELOG_KEY = (
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
)


def test_rocksdb_confs_emit_changelog_key_for_both_values():
    # The False case must EMIT "false", not omit the key: applying the
    # returned confs to a session where changelog checkpointing was
    # previously enabled has to actually disable it (ADVICE r14).
    on = session.rocksdb_state_store_confs(changelog_checkpointing=True)
    off = session.rocksdb_state_store_confs(changelog_checkpointing=False)
    assert on[_CHANGELOG_KEY] == "true"
    assert off[_CHANGELOG_KEY] == "false"
    for confs in (on, off):
        assert (
            confs["spark.sql.streaming.stateStore.providerClass"]
            == session.ROCKSDB_STATE_STORE_PROVIDER
        )
    # Bounded-memory knobs only appear when a cap is requested.
    assert not any("MemoryUsage" in k for k in on)
    capped = session.rocksdb_state_store_confs(max_memory_mb=256)
    assert (
        capped["spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB"]
        == "256"
    )


def test_rocksdb_confs_snapshot_cadence():
    confs = session.rocksdb_state_store_confs(snapshot_cadence=25)
    assert (
        confs["spark.sql.streaming.stateStore.minDeltasForSnapshot"] == "25"
    )
    # None leaves the build default untouched (key absent)
    assert not any(
        "minDeltasForSnapshot" in k
        for k in session.rocksdb_state_store_confs()
    )
