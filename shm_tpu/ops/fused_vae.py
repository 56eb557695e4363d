"""Pallas TPU kernel: the ENTIRE deterministic VAE forward pass, fused.

The hybrid gate's hot path is the LSTM-VAE forward (SURVEY.md §3.2). Under XLA
this is four sequential `lax.scan`s (2 encoder layers + 2 decoder layers) whose
carries round-trip through HBM-visible buffers between layers, plus separate
elementwise passes for LayerNorm / latent heads / residual / MSE.

This kernel runs the whole thing as ONE `pallas_call` per batch tile:

  x tile (VMEM) -> enc L1 scan -> enc L2 scan -> LayerNorm -> mu (z = mu)
      -> tanh(W_z2h @ z) -> dec input projection (computed ONCE: the decoder
         input is constant across time, 4DOF/Scripts/Models/temporal_vae.py:67-68)
      -> dec L1+L2 scan -> output head -> residual (x - recon)^2 (VMEM write)
      -> window MSE accumulation

All recurrent state (4 layers' h/c), all weights, and the input tile live in
VMEM for the full T-step loop; HBM traffic is exactly: read x tile once, write
residual tile + per-window MSE once. Per step the kernel issues four
[4H, H] x [H, Bt] MXU matmuls (the recurrent projections) — everything else is
VPU elementwise fused in-register.

Layout (the key to fitting VMEM — see pallas_guide.md tiling constraints):
everything runs TRANSPOSED, with the batch tile in the LANE (minor) dimension:

  x tile:   [T, D, Bt]   (D=12 pads only sublanes 12->16, not lanes 12->128)
  state:    [H, Bt]      (128 sublanes x 256 lanes, exact tile multiples)
  gates:    [4H, Bt]     (split along sublanes at H=128 boundaries)
  weights:  passed pre-transposed as [out, in]

A naive [.., Bt, D] layout puts D=12 in lanes, padding every buffer 12->128
(10.7x) and blowing the 16MB VMEM budget — that layout OOMs at compile time.

Used for inference/scoring only (the gate + CNN-residual path); training keeps
the XLA scan (autodiff through a Pallas kernel would need a custom VJP and the
training batches are small enough that XLA is already fine there).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def vae_params_to_kernel_weights(params: Dict, num_layers: int = 2) -> Dict:
    """Flatten a TemporalVAE flax param tree into the kernel's (transposed)
    weight dict: matmul weights as [out_dim, in_dim], biases as [out_dim, 1]
    (lane-broadcastable), LSTM biases pre-summed (b_ih + b_hh)."""
    w = {}
    for stack, prefix in (("encoder_lstm", "enc"), ("decoder_lstm", "dec")):
        for l in range(num_layers):
            p = params[stack][f"layer{l}"]
            w[f"{prefix}{l}_wih"] = jnp.swapaxes(p["w_ih"], 0, 1)     # [4H, in]
            w[f"{prefix}{l}_whh"] = jnp.swapaxes(p["w_hh"], 0, 1)     # [4H, H]
            w[f"{prefix}{l}_b"] = (p["b_ih"] + p["b_hh"])[:, None]    # [4H, 1]
    if "layer_norm" in params:
        w["ln_scale"] = params["layer_norm"]["scale"][:, None]        # [H, 1]
        w["ln_bias"] = params["layer_norm"]["bias"][:, None]
    w["mu_w"] = jnp.swapaxes(params["fc_mu"]["kernel"], 0, 1)          # [Z, H]
    w["mu_b"] = params["fc_mu"]["bias"][:, None]
    w["z2h_w"] = jnp.swapaxes(params["fc_latent_to_hidden"]["kernel"], 0, 1)
    w["z2h_b"] = params["fc_latent_to_hidden"]["bias"][:, None]
    w["out_w"] = jnp.swapaxes(params["output_layer"]["kernel"], 0, 1)  # [D, H]
    w["out_b"] = params["output_layer"]["bias"][:, None]
    return w


def _sigmoid_tanh(x):
    """sigmoid as ``0.5 * (tanh(x/2) + 1)`` — ONE VPU transcendental.

    Mosaic lowers ``jax.nn.sigmoid`` (logistic) as exp + divide, which is
    measurably slower on the VPU; this kernel is transcendental-bound (5
    sigmoid/tanh evals per cell-step on [H, Bt] blocks), and the tanh form
    is worth +13% gate throughput (tools/probe_vpu_bound.py, round 2:
    529k vs 467k win/s device-side). XLA-TPU itself lowers logistic via
    tanh, so this also matches the XLA scan path's numerics more closely
    on hardware. vs the exp form: rounding-level differences only
    (measured 5e-5 rel on the bf16 path, 100% gate agreement on trained
    artifacts; pinned in tests/test_ops.py).
    """
    return 0.5 * (jnp.tanh(0.5 * x) + 1.0)


# R(7,6) least-squares rational fit of tanh on [-7, 7] (odd numerator, even
# denominator, Chebyshev nodes + error re-weighting); max |err| vs tanh is
# 9.7e-7 over the whole real line with the input clamp — below the bf16
# path's per-step rounding, so gate numerics are unchanged at either dtype.
_TANH_P = (0.999996935, 0.123091227, 2.28254070e-3, 3.95225241e-6)
_TANH_Q = (0.456412385, 2.10997819e-2, 1.42908691e-4)


def _tanh_rational(x):
    """tanh as a clamped R(7,6) rational — 8 mul/FMA + 1 divide on the VPU,
    no transcendental. Exists to A/B against Mosaic's tanh lowering on the
    transcendental-bound kernel (tools/probe_fast_tanh.py); see
    ``fused_vae_gate(tanh_impl=...)`` for the measured outcome."""
    x = jnp.clip(x, -7.0, 7.0)
    x2 = x * x
    p = x * (_TANH_P[0] + x2 * (_TANH_P[1] + x2 * (_TANH_P[2]
                                                   + x2 * _TANH_P[3])))
    q = 1.0 + x2 * (_TANH_Q[0] + x2 * (_TANH_Q[1] + x2 * _TANH_Q[2]))
    return p / q


def _lstm_step(h, c, gates, H, sig=_sigmoid_tanh, tanh=jnp.tanh):
    """gates: [4H, Bt] in torch order i|f|g|o along sublanes."""
    i = gates[0 * H:1 * H]
    f = gates[1 * H:2 * H]
    g = gates[2 * H:3 * H]
    o = gates[3 * H:4 * H]
    c = sig(f) * c + sig(i) * tanh(g)
    h = sig(o) * tanh(c)
    return h, c


def _kernel(
    x_ref,                     # [T, D, Bt] normalized windows (transposed)
    *refs,                     # L encoder triples, [ln pair,] mu/z2h pairs,
                               # L decoder triples, out pair, then out refs
    T: int, H: int, num_layers: int, use_layernorm: bool, dtype,
    d_real: int, emulate: bool = False, skew: bool = False,
    sigmoid_impl: str = "tanh", tanh_impl: str = "exact",
):
    it = iter(refs)
    enc = [(next(it), next(it), next(it)) for _ in range(num_layers)]
    ln_scale, ln_bias = (next(it), next(it)) if use_layernorm else (None, None)
    mu_w, mu_b = next(it), next(it)
    z2h_w, z2h_b = next(it), next(it)
    dec = [(next(it), next(it), next(it)) for _ in range(num_layers)]
    out_w, out_b = next(it), next(it)
    rest = list(it)
    resid_ref = rest[0] if len(rest) == 2 else None
    mse_ref = rest[-1]

    Bt = x_ref.shape[2]
    f32 = jnp.float32
    tanh = _tanh_rational if tanh_impl == "rational" else jnp.tanh
    if sigmoid_impl == "tanh":
        sig = lambda x: 0.5 * (tanh(0.5 * x) + 1.0)
    else:
        sig = jax.nn.sigmoid
    step = lambda h, c, g: _lstm_step(h, c, g, H, sig, tanh)

    def mm(a, b):
        if emulate:
            # interpret-mode on CPU: XLA-CPU lacks a bf16 x bf16 -> f32 dot
            # thunk for some shapes. Rounding to ``dtype`` and computing in
            # f32 produces the same products the MXU computes (bf16 products
            # are exact in f32; accumulation is f32 on both paths).
            return jnp.dot(a.astype(dtype).astype(f32),
                           b.astype(dtype).astype(f32),
                           preferred_element_type=f32)
        return jnp.dot(a.astype(dtype), b.astype(dtype),
                       preferred_element_type=f32)

    zeros = jnp.zeros((H, Bt), f32)
    skew = skew and num_layers == 2 and T >= 3

    if skew:
        # ----- layer-skewed encoder: L2 lags L1 by one step, so each
        # iteration's L1 and L2 matmul groups are data-independent and the
        # MXU/VPU can overlap them (the stacked form serializes
        # L1 matmul -> act -> L2 matmul -> act per step). Same math, same
        # f32 accumulation order — bit-identical to the stacked loop. -----
        (w1ih, w1hh, b1), (w2ih, w2hh, b2) = enc

        # peel: L1 step 0 (recurrent term is exactly zero at t=0)
        g1 = mm(w1ih[:], x_ref[0]) + b1[:]
        h1, c1 = step(zeros, zeros, g1)

        def enc_body_skew(t, carry):
            h1, c1, h2, c2 = carry                 # h1(t-1), h2(t-2)
            g2 = mm(w2ih[:], h1) + mm(w2hh[:], h2) + b2[:]   # L2 step t-1
            g1 = mm(w1ih[:], x_ref[t]) + mm(w1hh[:], h1) + b1[:]  # L1 step t
            h2n, c2n = step(h2, c2, g2)
            h1n, c1n = step(h1, c1, g1)
            return h1n, c1n, h2n, c2n

        h1, c1, h2, c2 = jax.lax.fori_loop(
            1, T, enc_body_skew, (h1, c1, zeros, zeros))
        # flush: L2 step T-1
        g2 = mm(w2ih[:], h1) + mm(w2hh[:], h2) + b2[:]
        h_last, _ = step(h2, c2, g2)
    else:
        # ----- encoder: all layers advance together inside one time loop -----
        def enc_body(t, carry):
            hs, cs = carry
            inp = x_ref[t]                                    # [D, Bt]
            new_h, new_c = [], []
            for l, (wih, whh, b) in enumerate(enc):
                g = mm(wih[:], inp) + mm(whh[:], hs[l]) + b[:]
                h, c = step(hs[l], cs[l], g)
                new_h.append(h)
                new_c.append(c)
                inp = h
            return tuple(new_h), tuple(new_c)

        hs, _ = jax.lax.fori_loop(
            0, T, enc_body, ((zeros,) * num_layers, (zeros,) * num_layers))
        h_last = hs[-1]

    # ----- LayerNorm over H (sublane axis) + latent head (z = mu) -----
    if use_layernorm:
        mean = jnp.mean(h_last, axis=0, keepdims=True)
        var = jnp.mean((h_last - mean) ** 2, axis=0, keepdims=True)
        h_last = (h_last - mean) * jax.lax.rsqrt(var + 1e-5) * ln_scale[:] + ln_bias[:]
    mu = mm(mu_w[:], h_last) + mu_b[:]                        # [Z, Bt]

    # ----- decoder: constant input projected ONCE -----
    dec_in = tanh(mm(z2h_w[:], mu) + z2h_b[:])                # [H, Bt]
    d0_wih, d0_whh, d0_b = dec[0]
    xp_const = mm(d0_wih[:], dec_in) + d0_b[:]                # [4H, Bt]

    acc0 = jnp.zeros((1, Bt), f32)

    def out_step(t, h2, acc):
        """Output head + residual + MSE accumulate for decoder step t."""
        y_t = mm(out_w[:], h2) + out_b[:]                     # [D, Bt]
        r_t = (x_ref[t].astype(f32) - y_t) ** 2
        if resid_ref is not None:
            resid_ref[t] = r_t.astype(resid_ref.dtype)
        return acc + jnp.sum(r_t, axis=0, keepdims=True)      # [1, Bt]

    if skew:
        # ----- 3-stage skewed decoder: iteration t runs out-head(t-2),
        # L2(t-1), L1(t) — three mutually independent groups. -----
        d1_wih, d1_whh, d1_b = dec[1]

        # peel t=0: L1 step 0 (recurrent term exactly zero)
        h1, c1 = step(zeros, zeros, xp_const)
        # peel t=1: L2 step 0 + L1 step 1
        g2 = mm(d1_wih[:], h1) + d1_b[:]
        g1 = xp_const + mm(d0_whh[:], h1)
        h2, c2 = step(zeros, zeros, g2)
        h1, c1 = step(h1, c1, g1)

        def dec_body_skew(t, carry):
            h1, c1, h2, c2, acc = carry          # h1(t-1), h2(t-2)
            acc = out_step(t - 2, h2, acc)                        # out(t-2)
            g2 = mm(d1_wih[:], h1) + mm(d1_whh[:], h2) + d1_b[:]  # L2(t-1)
            g1 = xp_const + mm(d0_whh[:], h1)                     # L1(t)
            h2n, c2n = step(h2, c2, g2)
            h1n, c1n = step(h1, c1, g1)
            return h1n, c1n, h2n, c2n, acc

        h1, c1, h2, c2, acc = jax.lax.fori_loop(
            2, T, dec_body_skew, (h1, c1, h2, c2, acc0))
        # flush: out(T-2), L2(T-1), out(T-1)
        acc = out_step(T - 2, h2, acc)
        g2 = mm(d1_wih[:], h1) + mm(d1_whh[:], h2) + d1_b[:]
        h2, c2 = step(h2, c2, g2)
        acc = out_step(T - 1, h2, acc)
    else:
        def dec_body(t, carry):
            hs, cs, acc = carry
            new_h, new_c = [], []
            g = xp_const + mm(d0_whh[:], hs[0])
            h, c = step(hs[0], cs[0], g)
            new_h.append(h)
            new_c.append(c)
            for l in range(1, num_layers):
                wih, whh, b = dec[l]
                g = mm(wih[:], new_h[-1]) + mm(whh[:], hs[l]) + b[:]
                h, c = step(hs[l], cs[l], g)
                new_h.append(h)
                new_c.append(c)
            acc = out_step(t, new_h[-1], acc)
            return tuple(new_h), tuple(new_c), acc

        *_, acc = jax.lax.fori_loop(
            0, T, dec_body, ((zeros,) * num_layers, (zeros,) * num_layers, acc0))
    # padded feature rows contribute exactly 0 to acc (x and out head are
    # zero there), so the mean divides by the REAL feature count
    mse_ref[:] = acc / (T * d_real)


@functools.partial(
    jax.jit,
    static_argnames=("num_layers", "use_layernorm", "batch_tile", "dtype",
                     "io_dtype", "with_residual", "interpret", "emulate",
                     "skew", "sigmoid_impl", "tanh_impl", "residual_layout"),
)
def fused_vae_gate(
    params: Dict,
    Z: jax.Array,                 # [N, T, D] normalized windows
    *,
    num_layers: int = 2,
    use_layernorm: bool = True,
    batch_tile: int = 256,
    dtype=jnp.bfloat16,
    io_dtype=None,
    with_residual: bool = True,
    interpret: bool = False,
    emulate: bool = False,
    skew: bool = True,
    sigmoid_impl: str = "tanh",
    tanh_impl: str = "exact",
    residual_layout: str = "nhwc",
) -> Tuple[jax.Array, jax.Array | None]:
    """Fused deterministic VAE pass: returns (mse [N], residual [N, T, D] | None).

    Semantics match ``model.apply(..., sample=False)`` + residual/MSE epilogue
    (z = posterior mean). Batch is padded to a multiple of ``batch_tile``.

    - ``io_dtype``: dtype of the window tile in HBM/VMEM and of the residual
      output (bf16 halves HBM traffic; MSE still accumulates in f32).
    - ``with_residual=False``: gate-only scoring — skips the residual store
      entirely (the threshold-calibration path needs only the MSE).
    - ``skew`` (2-layer only): layer-skewed execution — L2 lags L1 by one
      step and the output head by one more, so each loop iteration issues
      independent matmul groups the MXU/VPU can overlap instead of the
      stacked form's serial mm->act->mm->act chain. Pure reordering of the
      identical math (pinned bit-exact vs skew=False in tests/test_ops.py).
    - ``tanh_impl``: "exact" (default) uses Mosaic's tanh lowering;
      "rational" evaluates every tanh (and the tanh-form sigmoid) as the
      clamped R(7,6) rational ``_tanh_rational`` — max 9.7e-7 deviation, no
      transcendental. Measured on the chip (tools/probe_fast_tanh.py,
      round 3): the rational form is a decisive LOSS (−36% device-side,
      563k → 356k win/s gate-only; 100% gate agreement) — Mosaic's
      hardware tanh outruns the 8-FMA + divide chain, so "exact" stays
      the default and the option remains as the documented dead end.
    - ``residual_layout``: "nhwc" (default) returns the residual as
      ``[N, T, D]``; "transposed" returns the kernel's native
      ``[T, Dp, Np]`` tile (Dp = D padded to 16 with exact-zero rows,
      Np = N padded to the batch tile) so a batch-in-lanes consumer (the
      transposed-layout CNN in ``shm_tpu.pipeline``) can read it without
      any layout transpose of the big tensor.
    """
    if num_layers not in (1, 2):
        raise NotImplementedError("fused kernel supports 1- or 2-layer presets")
    w = vae_params_to_kernel_weights(params, num_layers)
    N, T, D = Z.shape
    H = w["enc0_whh"].shape[1]
    io_dtype = io_dtype or Z.dtype

    # pad the feature dim (sublanes) to the 16-row tile: D=12 would make every
    # per-step [D, Bt] window read and residual store straddle a sublane tile
    # (read-modify-write on bf16 stores). Zero pad rows are exact no-ops: the
    # padded enc0 weight columns and out-head rows are zero, so gates, MSE sum
    # and residual rows beyond D are identically 0.
    Dp = _round_up(D, 16)
    if Dp != D:
        w["enc0_wih"] = jnp.pad(w["enc0_wih"], ((0, 0), (0, Dp - D)))
        w["out_w"] = jnp.pad(w["out_w"], ((0, Dp - D), (0, 0)))
        w["out_b"] = jnp.pad(w["out_b"], ((0, Dp - D), (0, 0)))

    Np = _round_up(max(N, 1), batch_tile)
    Zp = jnp.pad(Z, ((0, Np - N), (0, 0), (0, Dp - D)))
    Zt = jnp.transpose(Zp, (1, 2, 0)).astype(io_dtype)   # [T, Dp, Np] batch-in-lanes

    grid = (Np // batch_tile,)
    tile_in = pl.BlockSpec((T, Dp, batch_tile), lambda i: (0, 0, i),
                           memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)

    weights = []
    for l in range(num_layers):
        weights += [w[f"enc{l}_wih"], w[f"enc{l}_whh"], w[f"enc{l}_b"]]
    if use_layernorm:
        weights += [w["ln_scale"], w["ln_bias"]]
    weights += [w["mu_w"], w["mu_b"], w["z2h_w"], w["z2h_b"]]
    for l in range(num_layers):
        weights += [w[f"dec{l}_wih"], w[f"dec{l}_whh"], w[f"dec{l}_b"]]
    weights += [w["out_w"], w["out_b"]]
    weights = [jnp.asarray(x, jnp.float32) for x in weights]
    w_specs = [full(x.shape) for x in weights]

    if sigmoid_impl not in ("tanh", "exact"):
        raise ValueError(f"unknown sigmoid_impl {sigmoid_impl!r} "
                         "(expected 'tanh' or 'exact')")
    if tanh_impl not in ("exact", "rational"):
        raise ValueError(f"unknown tanh_impl {tanh_impl!r} "
                         "(expected 'exact' or 'rational')")
    kernel = functools.partial(_kernel, emulate=emulate, skew=skew,
                               T=T, H=H, num_layers=num_layers, d_real=D,
                               use_layernorm=use_layernorm, dtype=dtype,
                               sigmoid_impl=sigmoid_impl, tanh_impl=tanh_impl)
    mse_spec = pl.BlockSpec((1, batch_tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    mse_shape = jax.ShapeDtypeStruct((1, Np), jnp.float32)
    if with_residual:
        out_specs = (
            pl.BlockSpec((T, Dp, batch_tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            mse_spec,
        )
        out_shape = (jax.ShapeDtypeStruct((T, Dp, Np), io_dtype), mse_shape)
    else:
        out_specs = (mse_spec,)
        out_shape = (mse_shape,)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[tile_in] + w_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(Zt, *weights)

    if residual_layout not in ("nhwc", "transposed"):
        raise ValueError(f"unknown residual_layout {residual_layout!r}")
    if with_residual:
        resid_t, mse = outs
        if residual_layout == "transposed":
            resid = resid_t                                 # [T, Dp, Np]
        else:
            resid = jnp.transpose(resid_t[:, :D], (2, 0, 1))[:N]
    else:
        (mse,) = outs
        resid = None
    return mse[0, :N], resid


__all__ = ["fused_vae_gate", "vae_params_to_kernel_weights"]
