"""Fused attention-VAE Pallas kernel (interpret mode on CPU) vs the flax model.

Same convention as the LSTM/minGRU kernel suites (tests/test_ops.py,
tests/test_minrnn.py): every alternative compute path is equivalence-tested
against the default XLA path (CLAUDE.md). The kernel's head-packed score
layout, lane-masked LayerNorm statistics, padded-key softmax masking and
row-masked pool/MSE epilogue are all exercised across the three preset
shapes (H=128/64/32, 2/1 layers, with/without the VAE LayerNorm).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shm_tpu.models import TemporalVAE


def _ref(model, params, Z):
    recon, _, _ = model.apply({"params": params}, Z, sample=False)
    mse = np.asarray(((Z - recon) ** 2).mean(axis=(1, 2)))
    resid = np.asarray((Z - recon) ** 2)
    return mse, resid


@pytest.fixture(scope="module")
def kernel_setup():
    model = TemporalVAE(input_dim=12, latent_dim=16, hidden_dim=128,
                        num_layers=2, dropout=0.3, use_layernorm=True,
                        cell="attention")
    Z = jax.random.normal(jax.random.PRNGKey(0), (24, 40, 12))
    params = model.init({"params": jax.random.PRNGKey(1)}, Z[:2])["params"]
    return model, params, Z


def test_fused_attention_matches_flax(kernel_setup):
    from shm_tpu.ops import fused_attention_gate

    model, params, Z = kernel_setup
    mse_ref, resid_ref = _ref(model, params, Z)
    mse, resid = fused_attention_gate(params, Z, dtype=jnp.float32,
                                      interpret=True, batch_tile=8)
    np.testing.assert_allclose(np.asarray(mse), mse_ref, atol=2e-6)
    np.testing.assert_allclose(np.asarray(resid), resid_ref, atol=1e-5)


def test_fused_attention_ragged_and_gate_only(kernel_setup):
    from shm_tpu.ops import fused_attention_gate

    model, params, Z = kernel_setup
    Zr = Z[:13]
    mse_ref, _ = _ref(model, params, Zr)
    mse, resid = fused_attention_gate(params, Zr, dtype=jnp.float32,
                                      interpret=True, batch_tile=8,
                                      with_residual=False)
    assert resid is None
    assert mse.shape == (13,)
    np.testing.assert_allclose(np.asarray(mse), mse_ref, atol=2e-6)


def test_fused_attention_chunk_windows_matches(kernel_setup):
    """chunk_windows (projection/MLP matmul height — round-5 throughput fix,
    default now the largest divisor of batch_tile up to 16) only
    re-partitions matmul rows, so every width must reproduce the flax
    reference; an invalid width (not dividing batch_tile) must raise."""
    from shm_tpu.ops import fused_attention_gate

    model, params, Z = kernel_setup
    mse_ref, resid_ref = _ref(model, params, Z)
    for cw in (1, 2, 8):
        mse, resid = fused_attention_gate(params, Z, dtype=jnp.float32,
                                          interpret=True, batch_tile=8,
                                          chunk_windows=cw)
        np.testing.assert_allclose(np.asarray(mse), mse_ref, atol=2e-6,
                                   err_msg=f"cw={cw}")
        np.testing.assert_allclose(np.asarray(resid), resid_ref, atol=1e-5,
                                   err_msg=f"cw={cw}")
    with pytest.raises(ValueError, match="chunk_windows"):
        fused_attention_gate(params, Z, dtype=jnp.float32, interpret=True,
                             batch_tile=8, chunk_windows=3)


def test_fused_attention_nt_dot_fallback_matches(kernel_setup):
    """The explicit-transpose score path (nt_dot=False) is bit-equivalent
    in exact arithmetic — it must stay a drop-in fallback."""
    from shm_tpu.ops import fused_attention_gate

    _, params, Z = kernel_setup
    kw = dict(dtype=jnp.float32, interpret=True, batch_tile=8,
              with_residual=False)
    mse_nt, _ = fused_attention_gate(params, Z[:8], nt_dot=True, **kw)
    mse_tr, _ = fused_attention_gate(params, Z[:8], nt_dot=False, **kw)
    np.testing.assert_allclose(np.asarray(mse_nt), np.asarray(mse_tr),
                               rtol=1e-6, atol=1e-7)


def test_fused_attention_stream_matches_flax(kernel_setup):
    """The streaming (flash-style online-softmax) inner loop is an exact
    mathematical rewrite of the packed-score softmax — it must match the
    flax model to the same tolerance as the packed path, residual included."""
    from shm_tpu.ops import fused_attention_gate

    model, params, Z = kernel_setup
    mse_ref, resid_ref = _ref(model, params, Z)
    mse, resid = fused_attention_gate(params, Z, dtype=jnp.float32,
                                      interpret=True, batch_tile=8,
                                      stream=True)
    np.testing.assert_allclose(np.asarray(mse), mse_ref, atol=2e-6)
    np.testing.assert_allclose(np.asarray(resid), resid_ref, atol=1e-5)


def test_fused_attention_stream_multiblock_keys():
    """T > 128 exercises the ONLINE part of the online softmax (2 key blocks
    per head: running max/denominator rescaling across blocks) — the
    openLAB T=200 regime the streaming variant exists for."""
    from shm_tpu.ops import fused_attention_gate

    model = TemporalVAE(input_dim=3, latent_dim=8, hidden_dim=64, num_layers=1,
                        dropout=0.0, use_layernorm=True, cell="attention")
    Z = jax.random.normal(jax.random.PRNGKey(6), (6, 200, 3))
    params = model.init({"params": jax.random.PRNGKey(7)}, Z[:2])["params"]
    mse_ref, resid_ref = _ref(model, params, Z)
    kw = dict(num_layers=1, use_layernorm=True, dtype=jnp.float32,
              interpret=True, batch_tile=3)
    mse_s, resid_s = fused_attention_gate(params, Z, stream=True, **kw)
    np.testing.assert_allclose(np.asarray(mse_s), mse_ref, atol=2e-6)
    np.testing.assert_allclose(np.asarray(resid_s), resid_ref, atol=1e-5)
    # and the two kernel paths agree with each other tightly
    mse_p, _ = fused_attention_gate(params, Z, stream=False, **kw)
    np.testing.assert_allclose(np.asarray(mse_s), np.asarray(mse_p),
                               rtol=1e-6, atol=1e-7)


def test_auto_stream_policy():
    """Default inner-loop selection (measured on chip, BENCHMARKS.md):
    streaming for multi-key-block shapes only."""
    from shm_tpu.ops.fused_attention import auto_stream

    assert auto_stream(128) is False      # 4DOF T=100 -> Tp=128
    assert auto_stream(256) is True       # openLAB T=200 -> Tp=256


def test_fused_attention_openlab_shape():
    """openLAB-preset shape: H=64 (2 real heads + 2 phantom-zero lane
    groups), 1 layer, VAE LayerNorm on."""
    from shm_tpu.ops import fused_attention_gate

    model = TemporalVAE(input_dim=3, latent_dim=8, hidden_dim=64, num_layers=1,
                        dropout=0.0, use_layernorm=True, cell="attention")
    Z = jax.random.normal(jax.random.PRNGKey(2), (10, 30, 3))
    params = model.init({"params": jax.random.PRNGKey(3)}, Z[:2])["params"]
    mse_ref, resid_ref = _ref(model, params, Z)
    mse, resid = fused_attention_gate(params, Z, num_layers=1,
                                      use_layernorm=True, dtype=jnp.float32,
                                      interpret=True, batch_tile=5)
    np.testing.assert_allclose(np.asarray(mse), mse_ref, atol=2e-6)
    np.testing.assert_allclose(np.asarray(resid), resid_ref, atol=1e-5)


def test_fused_attention_1dof_shape_no_layernorm():
    """1DOF-preset shape: H=32 (single head), no VAE LayerNorm."""
    from shm_tpu.ops import fused_attention_gate

    model = TemporalVAE(input_dim=12, latent_dim=5, hidden_dim=32, num_layers=2,
                        dropout=0.0, use_layernorm=False, cell="attention")
    Z = jax.random.normal(jax.random.PRNGKey(4), (9, 25, 12))
    params = model.init({"params": jax.random.PRNGKey(5)}, Z[:2])["params"]
    mse_ref, _ = _ref(model, params, Z)
    mse, _ = fused_attention_gate(params, Z, num_layers=2,
                                  use_layernorm=False, dtype=jnp.float32,
                                  interpret=True, batch_tile=9,
                                  with_residual=False)
    np.testing.assert_allclose(np.asarray(mse), mse_ref, atol=2e-6)


def test_fused_attention_guards():
    from shm_tpu.ops import fused_attention_gate

    model = TemporalVAE(input_dim=3, latent_dim=2, hidden_dim=48, num_layers=1,
                        dropout=0.0, use_layernorm=True, cell="attention")
    Z = jnp.zeros((4, 10, 3), jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(0)}, Z)["params"]
    with pytest.raises(ValueError, match="hidden_dim multiples"):
        fused_attention_gate(params, Z, num_layers=1, interpret=True)

    model_ok = TemporalVAE(input_dim=3, latent_dim=2, hidden_dim=32,
                           num_layers=1, dropout=0.0, cell="attention")
    params_ok = model_ok.init({"params": jax.random.PRNGKey(0)}, Z)["params"]
    with pytest.raises(ValueError, match="multiple of 8"):
        fused_attention_gate(params_ok, Z, num_layers=1, batch_tile=3,
                             interpret=False)


def test_hybrid_fused_attention_matches_xla(kernel_setup):
    """make_hybrid_fn(use_fused_vae=True) on an attention model == XLA path."""
    from shm_tpu.models import CNN4DOF
    from shm_tpu.pipeline import make_hybrid_fn

    model, params, Z = kernel_setup
    cnn = CNN4DOF(dropout=0.0)
    cv = cnn.init({"params": jax.random.PRNGKey(4)},
                  jnp.zeros((2, 40, 12, 2), jnp.float32))
    W = np.asarray(Z[:16]) * 2.0 + 1.0
    mean, std = np.full((12,), 1.0, np.float32), np.full((12,), 2.0, np.float32)
    ref_fn = make_hybrid_fn(model, cnn)
    got_fn = make_hybrid_fn(model, cnn, use_fused_vae=True,
                            fused_dtype=jnp.float32, fused_interpret=True,
                            fused_batch_tile=8)
    thr = jnp.float32(np.median(np.asarray(ref_fn(
        params, cv, jnp.asarray(W), mean, std, jnp.float32(0.0)).mse)))
    ref = ref_fn(params, cv, jnp.asarray(W), mean, std, thr)
    got = got_fn(params, cv, jnp.asarray(W), mean, std, thr)
    np.testing.assert_allclose(np.asarray(got.mse), np.asarray(ref.mse),
                               rtol=1e-4, atol=1e-6)
    assert (np.asarray(got.anomalous) == np.asarray(ref.anomalous)).all()
    assert (np.asarray(got.y_pred) == np.asarray(ref.y_pred)).all()


def test_reconstruction_mse_fused_routes_attention():
    """Explicit fused=True picks the attention gate kernel for the cell
    (interpret-equivalence of the kernel itself is covered above; here we
    pin the ROUTING so a future policy flip cannot silently send the cell
    to an LSTM-shaped kernel that would fail on its param tree)."""
    import shm_tpu.train.vae as tv

    model = TemporalVAE(input_dim=3, latent_dim=2, hidden_dim=32, num_layers=1,
                        dropout=0.0, cell="attention")
    Z = jnp.asarray(np.random.default_rng(9).normal(size=(4, 10, 3)),
                    jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(0)}, Z)["params"]

    import shm_tpu.ops as ops
    called = {}
    real = ops.fused_attention_gate

    def spy(p, z, **kw):
        called["yes"] = True
        kw.update(interpret=True, dtype=jnp.float32)
        kw.pop("io_dtype", None)
        return real(p, z, **kw)

    ops_mod = ops
    orig = ops_mod.fused_attention_gate
    ops_mod.fused_attention_gate = spy
    try:
        mse = tv.reconstruction_mse(model, params, Z, fused=True)
    finally:
        ops_mod.fused_attention_gate = orig
    assert called.get("yes")
    mse_ref = tv.reconstruction_mse(model, params, Z, fused=False)
    np.testing.assert_allclose(mse, mse_ref, atol=2e-6)
