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
