"""openLAB ingestion/cleaning/labeling/featurization tests.

Includes golden-data checks against the committed reference artifacts when the
reference tree is mounted (label counts + per-window agreement).
"""

import os

import numpy as np
import pandas as pd
import pytest

from shm_tpu.config import OpenLabConfig
from shm_tpu.data.openlab import (
    clean_openlab_and_rule, provider_raw_outlier_mask_and, moving_average,
    windowize_2d, windowize_1d, sensor_fault_silver_flags, import_catman_file,
    extract_all,
)
from shm_tpu.data.features import featurize_windows, featurize_channel
from shm_tpu.data.splits import run_based_split

REF = "/root/reference/20250506_openLAB_tests"


def ref_clean(x, max_jump=1.0, max_abs=65.0, ma_window=5):
    """Direct port of the reference loop (feature_utils.py:77-99)."""
    x = np.asarray(x, dtype=float)
    removed = np.zeros_like(x, dtype=bool)
    bad = ~np.isfinite(x)
    x2 = x.copy()
    x2[bad] = np.nan
    removed[bad] = True
    for i in range(1, len(x2)):
        if np.isfinite(x2[i]) and np.isfinite(x2[i - 1]):
            if (abs(x2[i] - x2[i - 1]) > max_jump) and (abs(x2[i]) > max_abs):
                x2[i] = np.nan
                removed[i] = True
        else:
            x2[i] = np.nan
            removed[i] = True
    xi = pd.Series(x2).interpolate(limit_direction="both").to_numpy()
    xi = np.convolve(xi, np.ones(ma_window) / ma_window, mode="same")
    return xi.astype(np.float32), removed.astype(np.float32)


@pytest.mark.parametrize("case", range(6))
def test_clean_matches_reference_loop(case, rng):
    x = rng.normal(size=300) * 10
    if case == 1:
        x[100], x[101] = 80.0, -90.0       # AND-rule jumps
    elif case == 2:
        x[50] = np.nan                      # interior NaN -> cascade
    elif case == 3:
        x[0] = np.nan                       # leading NaN -> all removed
    elif case == 4:
        x = np.full(50, np.nan)             # all NaN
    elif case == 5:
        x[1] = 200.0                        # jump at index 1
    c1, r1 = ref_clean(x)
    c2, r2 = clean_openlab_and_rule(x)
    np.testing.assert_array_equal(r1, r2)
    np.testing.assert_allclose(np.nan_to_num(c1, nan=-1), np.nan_to_num(c2, nan=-1),
                               atol=1e-6)


def test_cascade_property(rng):
    """One removal implies everything after is removed (the reference loop's
    data dependence; see shm_tpu.data.openlab docstring)."""
    x = rng.normal(size=100) * 10
    x[30] = np.nan
    _, removed = clean_openlab_and_rule(x)
    assert removed[:30].sum() == 0
    assert removed[30:].all()


def test_provider_mask_and_rule():
    x = np.array([0.0, 70.0, 70.5, 0.0, np.nan, 100.0])
    m = provider_raw_outlier_mask_and(x, diff_th=1.0, abs_th=65.0)
    # idx1: |70-0|>=1 and |70|>=65 -> 1; idx2: |0.5|<1 -> 0; idx4 invalid -> 1;
    # idx5: diff from NaN is NaN -> comparison False, but |100|>=65... NaN>=1 False -> 0
    np.testing.assert_array_equal(m, [0, 1, 0, 0, 1, 0])


def test_moving_average_matches_convolve(rng):
    x = rng.normal(size=100)
    np.testing.assert_allclose(moving_average(x, 5),
                               np.convolve(x, np.ones(5) / 5, mode="same"))
    np.testing.assert_array_equal(moving_average(x, 1), x)


def test_windowize_matches_loop(rng):
    A = rng.normal(size=(450, 4)).astype(np.float32)
    X, idx0 = windowize_2d(A, 200, 20)
    assert X.shape == ((450 - 200) // 20 + 1, 200, 4)
    for k in (0, 5, len(idx0) - 1):
        np.testing.assert_array_equal(X[k], A[idx0[k]:idx0[k] + 200])
    W, i1 = windowize_1d(A[:, 0], 200, 20)
    np.testing.assert_array_equal(i1, idx0)
    # short input
    X0, i0 = windowize_2d(A[:100], 200, 20)
    assert X0.shape == (0, 200, 4) and i0.size == 0


def test_silver_flags():
    u = np.zeros(200)
    f = np.linspace(0, 10, 200)
    flags = sensor_fault_silver_flags(u, f=f, force_rng_min=5.0)
    assert flags["stuck"] == 1 and flags["stuck_forceaware"] == 1
    assert flags["sf_any"] == 1
    u2 = np.sin(np.linspace(0, 10, 200))
    flags2 = sensor_fault_silver_flags(u2)
    assert flags2["sf_any"] == 0


def test_silver_flags_batch_matches_scalar():
    """The batch rule kernel and the scalar wrappers must agree window-by-
    window on edge-heavy inputs (NaNs, jumps, range hits, flatlines)."""
    from shm_tpu.data.openlab import (
        silver_flag_metrics_batch, invalid_ratio_1d, jump_ratio_1d,
        range_violation_ratio_1d, is_stuck_1d, is_stuck_force_aware,
    )

    rng = np.random.default_rng(3)
    T = 50
    rows = [
        rng.normal(0, 1, T),                          # benign
        np.r_[np.zeros(T - 5), rng.normal(0, 1, 5)],  # near-flat
        np.full(T, np.nan),                           # all invalid
        np.r_[rng.normal(0, 1, T - 1), 100.0],        # range + jump hit
        np.where(rng.random(T) < 0.3, np.nan, rng.normal(0, 70, T)),
        np.zeros(T),                                  # exact flatline
        np.r_[np.nan, np.nan, 1.0, 1.0],              # < 5 finite (stuck guard)
        np.array([2.0]),                              # size-1 (no pairs)
    ]
    Tm = max(len(r) for r in rows)
    F = rng.normal(0, 3, (len(rows), Tm))
    for i, u in enumerate(rows):
        U = np.full((1, Tm), np.nan)
        U[0, :len(u)] = u
        m = silver_flag_metrics_batch(U, F=F[i:i + 1], force_rng_min=1.0)
        # scalar spec functions on the same (padded) window
        x = U[0]
        assert m["invalid_ratio"][0] == pytest.approx(invalid_ratio_1d(x))
        assert m["jump_ratio"][0] == pytest.approx(jump_ratio_1d(x, 1.0))
        assert m["range_violation_ratio"][0] == pytest.approx(
            range_violation_ratio_1d(x, 65.0))
        assert bool(m["stuck"][0]) == is_stuck_1d(x, 1e-6)
        assert bool(m["stuck_forceaware"][0]) == is_stuck_force_aware(
            x, F[i], 1e-6, 1.0)
    # the whole stack in one call equals the per-row calls
    U_all = np.full((len(rows), Tm), np.nan)
    for i, u in enumerate(rows):
        U_all[i, :len(u)] = u
    mb = silver_flag_metrics_batch(U_all, F=F, force_rng_min=1.0)
    for i in range(len(rows)):
        one = silver_flag_metrics_batch(U_all[i:i + 1], F=F[i:i + 1],
                                        force_rng_min=1.0)
        for k in mb:
            assert mb[k][i] == pytest.approx(one[k][0]), (k, i)


def test_run_based_split_reproduces_reference():
    runs = [
        "MD_2025_05_06_09_08_25", "MD_2025_05_06_10_43_20", "MD_2025_05_06_12_05_10",
        "MD_2025_05_06_13_43_17", "MD_2025_05_06_16_07_15", "MD_2025_05_06_17_39_40",
        "MD_2025_05_06_18_30_51",
    ]
    s = run_based_split(runs, seed=42)
    assert s["train"] == ["MD_2025_05_06_10_43_20", "MD_2025_05_06_13_43_17",
                          "MD_2025_05_06_16_07_15"]
    assert s["val"] == ["MD_2025_05_06_12_05_10", "MD_2025_05_06_18_30_51"]
    assert s["test"] == ["MD_2025_05_06_09_08_25", "MD_2025_05_06_17_39_40"]


def test_featurize_dims_and_nan_safety(rng):
    X = rng.normal(size=(10, 200, 4)).astype(np.float32)
    X[0, :, 0] = np.nan
    X[1, :150, 1] = np.nan
    F = featurize_windows(X)
    assert F.shape == (10, 76)
    assert np.isfinite(F).all()
    # single-channel helper agrees with the batch path
    row = featurize_channel(X[2, :, 3])
    np.testing.assert_allclose(F[2, 3 * 19:4 * 19], row, rtol=1e-5, atol=1e-7)


def test_freq_features_bucketed_path_bit_equals_per_row(rng):
    """The bucketed NaN-row vectorization (VERDICT r4 #5) must be
    BIT-identical to the reference per-row compacting path on every row
    class: fully finite, scattered NaNs, leading/trailing NaN blocks,
    all-NaN, < 8 finite samples, and constant (zero-power) rows."""
    from shm_tpu.data.features import _bandpower_row, _freq_features_batch

    T = 200
    X = rng.normal(size=(64, T)).astype(np.float32).astype(np.float64)
    X[0, :] = np.nan                      # all NaN -> zeros
    X[1, : T - 5] = np.nan                # 5 finite (< 8) -> zeros
    X[2, ::3] = np.nan                    # scattered
    X[3, :150] = np.nan                   # leading block
    X[4, 50:] = np.nan                    # trailing block
    X[5, :] = 2.5                         # constant -> zero power branch
    X[6, ::2] = np.nan                    # half finite
    for i in range(7, 32):                # random masks, varied finite counts
        mask = rng.random(T) < rng.uniform(0.0, 0.9)
        X[i, mask] = np.nan
    got = _freq_features_batch(X)
    ok = np.isfinite(X)
    want = np.stack([np.asarray(_bandpower_row(X[i][ok[i]]))
                     for i in range(len(X))])
    np.testing.assert_array_equal(got, want)


def test_featurize_constant_and_zero_channels():
    X = np.zeros((2, 200, 4), np.float32)
    X[0, :, 0] = 7.5
    F = featurize_windows(X)
    # constant channel: std 0 -> crest/skew/kurt 0; snr 60 (sig>0, noise 0)
    block = F[0, :19]
    assert block[0] == pytest.approx(7.5)       # mean
    assert block[1] == 0.0                      # std
    assert block[7] == pytest.approx(1.0)       # crest = max|x|/rms = 1 for constant
    assert block[8] == 0.0 and block[9] == 0.0  # skew/kurt guarded by sd floor
    assert block[10] == pytest.approx(60.0)     # snr (noise power ~ 0 -> 60 dB cap)
    # zero channel: everything 0
    assert np.all(F[1, :19] == 0.0)


needs_ref = pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")


@needs_ref
def test_catman_parser_golden():
    p = os.path.join(REF, "Data/raw/MD_2025_05_06_09_08_25.txt")
    df = import_catman_file(p)
    assert list(df.columns[:18]) == [
        "Time_1", "DMS_1", "Time_2", "Force_N", "Force_A", "IWA", "Temp_Bridge",
        "Temp_Ambient", "Time_3", "LWA_1", "LWA_2", "LWA_3", "Time_4", "LWA_4",
        "LWA_5", "NMA_5", "F_total", "Comment"]
    assert "time" in df.columns
    assert len(df) > 10000
    # the absolute time column is T0 (header line 12; NOT the filename's
    # time — this run's header says 08:43:51) + the per-sample Time_1
    # offset, vectorized; NaN sample times map to NaT
    import re

    with open(p, encoding="cp1252") as f:
        header12 = f.readlines()[12]
    m = re.search(r"T0\s*=\s*(\d{2})\.(\d{2})\.(\d{4})\s+(\d{2}:\d{2}:\d{2})",
                  header12)
    assert m is not None
    t0 = pd.Timestamp(f"{m.group(3)}-{m.group(2)}-{m.group(1)} {m.group(4)}")
    t = df["time"]
    valid = t.notna()
    assert valid.any()
    offs = (t[valid] - t0).dt.total_seconds().to_numpy()
    np.testing.assert_allclose(
        offs, df.loc[valid, "Time_1"].to_numpy(float), atol=1e-6)


@needs_ref
def test_extraction_golden_label_parity():
    """Full pipeline vs the committed window_labels.csv: exact agreement."""
    cfg = OpenLabConfig()
    Xc, Xr, meta, diag = extract_all(os.path.join(REF, "Data/raw"), cfg)
    ref = pd.read_csv(os.path.join(REF, "Data/extracted/window_labels.csv"))
    assert len(meta) == len(ref) == 6432
    m = meta.merge(ref, on=["run_id", "win_start_idx"], suffixes=("_o", "_r"))
    assert len(m) == len(ref)
    assert (m["label_o"] == m["label_r"]).all()
    counts = meta["label"].value_counts()
    assert counts["Sensor Fault"] == 3423
    assert counts["Normal"] == 1865
    assert counts["Structural Fault"] == 1144


def test_run_based_split_too_few_runs_raises():
    """n <= 2 runs must raise loudly (the reference's 'at least 3 runs'
    guard) — the rounding fix-up loop could otherwise spin forever."""
    import pytest

    from shm_tpu.data.splits import run_based_split

    for ids in (["a"], ["a", "b"]):
        with pytest.raises(ValueError, match="at least 3"):
            run_based_split(ids)
