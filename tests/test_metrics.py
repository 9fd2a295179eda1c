"""Metrics/observability tests (injected clocks)."""

from manga_ocr_tpu.utils.metrics import StageTimer, ThroughputCounter


def test_stage_timer():
    now = [0.0]

    def clock():
        return now[0]

    t = StageTimer(clock=clock)
    with t.stage("encode"):
        now[0] += 0.5
    with t.stage("encode"):
        now[0] += 0.25
    t.record("decode", 1.0)
    s = t.summary()
    assert s["encode"]["count"] == 2
    assert abs(s["encode"]["total_s"] - 0.75) < 1e-9
    assert s["encode"]["mean_ms"] == 375.0
    assert s["decode"]["count"] == 1
    assert "encode" in t.report()


def test_stage_timer_exception_still_counts():
    now = [0.0]
    t = StageTimer(clock=lambda: now[0])
    try:
        with t.stage("boom"):
            now[0] += 1.0
            raise ValueError
    except ValueError:
        pass
    assert t.summary()["boom"]["count"] == 1


def test_throughput_counter_window():
    now = [1000.0]
    c = ThroughputCounter(window_s=10.0, clock=lambda: now[0])
    for _ in range(5):
        c.add(2)
        now[0] += 1.0
    assert c.total == 10
    assert 1.5 < c.rate() < 2.5
    now[0] += 100.0  # window expires
    c.add(1)
    assert c.rate() <= 1.0
