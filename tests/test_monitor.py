"""DriftMonitor: exact chunking invariance, detection/false-alarm behavior,
and the threshold-manifest rate extraction."""

import numpy as np
import pytest

from shm_tpu.monitor import DriftMonitor, expected_rate_from_threshold_meta


def _loop_reference(stream, p0, a, k, h):
    """Window-by-window reference implementation (the semantics the batched
    closed forms must reproduce exactly)."""
    ewma, s_hi, s_lo, n_hi, n_lo = p0, 0.0, 0.0, 0, 0
    for x in stream:
        ewma = (1 - a) * ewma + a * x
        prev_hi, prev_lo = s_hi, s_lo
        s_hi = max(0.0, s_hi + (x - (p0 + k)))
        s_lo = max(0.0, s_lo + ((p0 - k) - x))
        n_hi += (s_hi > h) and (prev_hi <= h)
        n_lo += (s_lo > h) and (prev_lo <= h)
    return ewma, s_hi, s_lo, n_hi, n_lo


def test_batched_update_matches_per_window_loop():
    """The prefix-sum/running-min closed forms must equal the sequential
    recurrences — including the count of alert-threshold crossings."""
    rng = np.random.default_rng(0)
    stream = (rng.random(5000) < 0.05).astype(np.float64)
    stream[2000:2400] = 1.0          # a burst that forces h-crossings
    p0, a, k, h = 0.05, 0.01, 0.025, 4.0
    mon = DriftMonitor(p0, ewma_alpha=a, cusum_k=k, cusum_h=h)
    mon.update(stream)
    ewma, s_hi, s_lo, n_hi, n_lo = _loop_reference(stream, p0, a, k, h)
    s = mon.snapshot()
    assert s["ewma_rate"] == pytest.approx(ewma, rel=1e-9)
    assert s["cusum_high"] == pytest.approx(s_hi, abs=1e-9)
    assert s["cusum_low"] == pytest.approx(s_lo, abs=1e-9)
    assert s["alerts_high_total"] == n_hi
    assert s["alerts_low_total"] == n_lo


def test_chunking_invariance():
    """Feeding one stream in any request chunking must land on the same
    monitor state — the StreamScorer invariance contract, kept here for the
    monitoring plane."""
    rng = np.random.default_rng(1)
    stream = (rng.random(3000) < 0.02).astype(np.float64)
    whole = DriftMonitor(0.01)
    whole.update(stream)
    for sizes in ([1] * 50 + [2950], [7, 64, 1000, 1929], [3000]):
        assert sum(sizes) == stream.size
        mon = DriftMonitor(0.01)
        i = 0
        for n in sizes:
            mon.update(stream[i:i + n])
            i += n
        a, b = mon.snapshot(), whole.snapshot()
        for key in ("ewma_rate", "cusum_high", "cusum_low",
                    "alerts_high_total", "alerts_low_total",
                    "windows", "anomalous"):
            assert a[key] == pytest.approx(b[key], rel=1e-9), key


def test_healthy_stream_stays_quiet():
    """20k windows at exactly the calibrated rate: no alert on either side,
    EWMA near the expected rate."""
    rng = np.random.default_rng(2)
    mon = DriftMonitor(0.01)
    for _ in range(20):
        mon.update(rng.random(1000) < 0.01)
    s = mon.snapshot()
    assert s["alerts_high_total"] == 0 and s["alerts_low_total"] == 0
    assert not s["alert_high"] and not s["alert_low"]
    assert 0.0 <= s["ewma_rate"] <= 0.05


def test_sustained_doubling_alerts_high():
    """Gate rate steps from 1% to 2%: the default CUSUM (k = p0/2, h = 8)
    must alert within a few thousand windows and stay latched while the
    shift persists."""
    rng = np.random.default_rng(3)
    mon = DriftMonitor(0.01)
    mon.update(rng.random(2000) < 0.01)          # healthy preamble
    assert not mon.snapshot()["alert_high"]
    fired_at = None
    for i in range(8):
        s = mon.update(rng.random(1000) < 0.02)
        if s["alert_high"] and fired_at is None:
            fired_at = (i + 1) * 1000
    assert fired_at is not None and fired_at <= 6000
    assert mon.snapshot()["alerts_high_total"] >= 1
    assert mon.snapshot()["alerts_low_total"] == 0


def test_gate_dropout_alerts_low():
    """A gate that stops firing entirely (sensor dropout / threshold gone
    stale high) must raise the LOW-side alert."""
    rng = np.random.default_rng(4)
    mon = DriftMonitor(0.05)
    mon.update(rng.random(1000) < 0.05)
    mon.update(np.zeros(2000))
    s = mon.snapshot()
    assert s["alert_low"] and s["alerts_low_total"] >= 1
    assert s["alerts_high_total"] == 0


def test_reset_restores_baseline():
    mon = DriftMonitor(0.01)
    mon.update(np.ones(500))
    assert mon.snapshot()["alert_high"]
    mon.reset()
    s = mon.snapshot()
    assert s["windows"] == 0 and s["cusum_high"] == 0.0
    assert s["ewma_rate"] == 0.01 and not s["alert_high"]


@pytest.mark.parametrize("kwargs", [
    dict(expected_rate=0.0), dict(expected_rate=1.0),
    dict(expected_rate=0.01, ewma_alpha=0.0),
    dict(expected_rate=0.01, ewma_alpha=1.0),
    dict(expected_rate=0.01, cusum_k=-0.1),
    dict(expected_rate=0.01, cusum_h=0.0),
])
def test_invalid_configs_raise(kwargs):
    with pytest.raises(ValueError):
        DriftMonitor(**kwargs)


def test_update_rejects_non_binary():
    mon = DriftMonitor(0.01)
    with pytest.raises(ValueError):
        mon.update(np.array([0.0, 2.0]))
    mon.update(np.zeros((0,)))           # empty batch is a no-op
    assert mon.snapshot()["windows"] == 0


def test_expected_rate_from_threshold_meta():
    """Measured healthy FPR wins over the construction percentile; either
    alone works; neither -> None (drift monitor stays off)."""
    assert expected_rate_from_threshold_meta(
        {"percentile": 95.0, "normal_fpr_at_threshold": 0.0508}
    ) == pytest.approx(0.0508)
    assert expected_rate_from_threshold_meta(
        {"percentile": 99.0}) == pytest.approx(0.01)
    # a degenerate measured FPR of 0 falls back to the percentile
    assert expected_rate_from_threshold_meta(
        {"percentile": 95.0, "normal_fpr_at_threshold": 0.0}
    ) == pytest.approx(0.05)
    assert expected_rate_from_threshold_meta({"threshold": 1.0}) is None
