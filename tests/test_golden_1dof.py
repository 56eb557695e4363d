"""Golden-data parity: generated 1_DOF variants vs the reference's committed CSVs.

The reference committed the exact CSVs its pipeline consumed
(1_DOF/Data/raw/1dof_{seen,unseen}_variants.csv, float64 NumPy); our fp32 scan
reproduces them to single-precision accumulated tolerance."""

import os

import numpy as np
import pytest

REF = "/root/reference/1_DOF/Data/raw"
needs_ref = pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")


@needs_ref
def test_seen_variants_match_committed_csv():
    import pandas as pd
    from shm_tpu.config import Stage1DofConfig
    from shm_tpu.sim import simulate_free_vibration_sdof, make_clean_variants
    from shm_tpu.sim.signals import SEEN_COLUMNS, variants_to_matrix

    cfg = Stage1DofConfig()
    ref = pd.read_csv(os.path.join(REF, "1dof_seen_variants.csv"))
    assert list(ref.columns) == ["time"] + SEEN_COLUMNS

    t, x, v, a = simulate_free_vibration_sdof(cfg.sdof)
    M = np.asarray(variants_to_matrix(make_clean_variants(t, x, v, a), SEEN_COLUMNS))
    assert M.shape == (len(ref), 12)
    np.testing.assert_allclose(np.asarray(t), ref["time"], atol=1e-5)
    # displacement amplitude ~0.01, velocity ~0.03, acceleration ~0.1:
    # fp32-scan drift tolerances scale with channel magnitude
    for c, atol in [("x_original", 2e-5), ("v_original", 1e-4),
                    ("a_original", 5e-4), ("x_lowfreq", 2e-5),
                    ("a_amplitude_scaled", 8e-4)]:
        i = SEEN_COLUMNS.index(c)
        np.testing.assert_allclose(M[:, i], ref[c].to_numpy(), atol=atol)


@needs_ref
def test_unseen_variants_match_committed_csv():
    import pandas as pd
    import jax.numpy as jnp
    from shm_tpu.config import Stage1DofConfig
    from shm_tpu.sim import make_unseen_variants
    from shm_tpu.sim.signals import UNSEEN_COLUMNS, variants_to_matrix

    cfg = Stage1DofConfig()
    ref = pd.read_csv(os.path.join(REF, "1dof_unseen_variants.csv"))
    t = jnp.arange(0.0, cfg.sdof.t_total + cfg.sdof.dt, cfg.sdof.dt)
    M = np.asarray(variants_to_matrix(make_unseen_variants(t), UNSEEN_COLUMNS))
    for c in ("x_original", "x_envelope", "x_triangle", "x_square"):
        i = UNSEEN_COLUMNS.index(c)
        np.testing.assert_allclose(M[:, i], ref[c].to_numpy(), atol=1e-6)
