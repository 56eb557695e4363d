"""int8 attribution CNN: BN-folding exactness + quantized fidelity (CPU).

The ship/no-ship decision runs on trained artifacts + real windows on the
chip (tools/probe_cnn_int8.py, >=99.9% 3-class agreement bar); these tests
pin the machinery itself: folding is exact, the quantized forward tracks
the float network, and the quantized pytree round-trips jit.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shm_tpu.models import CNN4DOF
from shm_tpu.models.cnn_int8 import (
    cnn4dof_folded_apply, cnn4dof_int8_apply, quantize_cnn4dof)

T, D = 20, 8


@pytest.fixture(scope="module")
def cnn_and_data():
    model = CNN4DOF(dropout=0.0)
    rng = np.random.default_rng(0)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((2, T, D, 2)))
    # perturb batch_stats away from the (0, 1) init so BN folding is
    # non-trivial, and scale fc2 so logits have real margins
    bs = jax.tree.map(np.asarray, variables["batch_stats"])
    bs["bn1"]["mean"] = rng.normal(0, 0.5, bs["bn1"]["mean"].shape).astype("f")
    bs["bn1"]["var"] = rng.uniform(0.5, 2.0, bs["bn1"]["var"].shape).astype("f")
    bs["bn2"]["mean"] = rng.normal(0, 0.5, bs["bn2"]["mean"].shape).astype("f")
    bs["bn2"]["var"] = rng.uniform(0.5, 2.0, bs["bn2"]["var"].shape).astype("f")
    params = jax.tree.map(np.asarray, variables["params"])
    for bn in ("bn1", "bn2"):
        params[bn]["scale"] = rng.uniform(
            0.5, 1.5, params[bn]["scale"].shape).astype("f")
        params[bn]["bias"] = rng.normal(
            0, 0.3, params[bn]["bias"].shape).astype("f")
    params["fc2"]["kernel"] = params["fc2"]["kernel"] * 20.0
    variables = {"params": jax.tree.map(jnp.asarray, params),
                 "batch_stats": jax.tree.map(jnp.asarray, bs)}
    # inputs shaped like the hybrid stack: ch0 ~ N(0,1) window, ch1 a
    # heavy-tailed non-negative residual^2
    Z = rng.normal(size=(256, T, D)).astype(np.float32)
    resid = (rng.normal(size=(256, T, D)).astype(np.float32) ** 2
             * rng.lognormal(0, 1.5, (256, 1, 1)).astype(np.float32))
    X = np.stack([Z, resid], axis=-1)
    return model, variables, jnp.asarray(X)


def test_bn_folding_is_exact(cnn_and_data):
    model, variables, X = cnn_and_data
    ref = model.apply(variables, X, train=False)
    got = cnn4dof_folded_apply(variables, X)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_int8_tracks_float_network(cnn_and_data):
    model, variables, X = cnn_and_data
    q = quantize_cnn4dof(variables, dtype=jnp.float32)
    ref = np.asarray(model.apply(variables, X, train=False))
    got = np.asarray(cnn4dof_int8_apply(q, X))
    # logit error small relative to the logit spread (per-sample dynamic
    # scales: only 8-bit in-window rounding remains)
    err = np.abs(got - ref).max()
    spread = ref.std()
    assert err < 0.35 * spread, (err, spread)
    # argmax agreement away from exact ties
    margin = np.abs(ref[:, 0] - ref[:, 1])
    sel = margin > 0.1 * spread
    agree = (got[sel].argmax(1) == ref[sel].argmax(1)).mean()
    assert agree >= 0.995, agree


def test_int8_saturates_out_of_range_without_blowup(cnn_and_data):
    """Extreme residuals must stay finite: the dynamic per-sample scales
    absorb any magnitude (large-residual windows are exactly the anomalous
    ones), so nothing may wrap or NaN."""
    model, variables, X = cnn_and_data
    q = quantize_cnn4dof(variables, dtype=jnp.float32)
    Xh = np.asarray(X).copy()
    Xh[:8, :, :, 1] *= 1e4                            # extreme residuals
    out = np.asarray(cnn4dof_int8_apply(q, jnp.asarray(Xh)))
    assert np.isfinite(out).all()


def test_quant_pytree_jits(cnn_and_data):
    model, variables, X = cnn_and_data
    q = quantize_cnn4dof(variables, dtype=jnp.float32)
    f = jax.jit(cnn4dof_int8_apply)
    # jit may fuse float rescales differently than eager — tolerance, not
    # bit-equality (the int8 matmul core is integer-exact either way)
    np.testing.assert_allclose(np.asarray(f(q, X[:16])),
                               np.asarray(cnn4dof_int8_apply(q, X[:16])),
                               rtol=1e-5, atol=1e-5)
