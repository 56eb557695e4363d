"""Pallas TPU kernel: the ENTIRE deterministic VAE forward pass, fused.

The hybrid gate's hot path is the LSTM-VAE forward (SURVEY.md §3.2). Under XLA
this is four sequential `lax.scan`s (2 encoder layers + 2 decoder layers) whose
carries round-trip through HBM-visible buffers between layers, plus separate
elementwise passes for LayerNorm / latent heads / residual / MSE.

This kernel runs the whole thing as ONE `pallas_call` per batch tile:

  x tile (VMEM) -> enc L1 scan -> enc L2 scan -> LayerNorm -> mu (z = mu)
      -> tanh(z @ W_z2h) -> dec input projection (computed ONCE: the decoder
         input is constant across time, 4DOF/Scripts/Models/temporal_vae.py:67-68)
      -> dec L1+L2 scan -> output head -> residual (x - recon)^2 (VMEM write)
      -> window MSE accumulation

All recurrent state (4 layers' h/c), all weights, and the input tile live in
VMEM for the full T-step loop; HBM traffic is exactly: read x tile once, write
residual tile + per-window MSE once. Per step the kernel issues four
[Bt, H] x [H, 4H] MXU matmuls (the recurrent projections) — everything else is
VPU elementwise fused in-register.

Layout notes (see pallas_guide.md):
- time-major [T, Bt, D] tiles so ``ref[t]`` is a contiguous [Bt, D] slab;
- batch tile Bt=256 rows (f32 sublane multiple), lane dim = 4H = 512;
- weights are passed pre-transposed as [in, 4H] so matmuls hit the MXU directly.

Used for inference/scoring only (the gate + CNN-residual path); training keeps
the XLA scan (autodiff through a Pallas kernel would need a custom VJP and the
training batch sizes are small enough that XLA is already fine there).
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
    """Flatten a TemporalVAE flax param tree into the kernel's weight dict.

    LSTM layer weights stay [in, 4H] (already the layout flax stores); biases
    of each layer are pre-summed (b_ih + b_hh).
    """
    w = {}
    for stack, prefix in (("encoder_lstm", "enc"), ("decoder_lstm", "dec")):
        for l in range(num_layers):
            p = params[stack][f"layer{l}"]
            w[f"{prefix}{l}_wih"] = p["w_ih"]
            w[f"{prefix}{l}_whh"] = p["w_hh"]
            w[f"{prefix}{l}_b"] = p["b_ih"] + p["b_hh"]
    if "layer_norm" in params:
        w["ln_scale"] = params["layer_norm"]["scale"]
        w["ln_bias"] = params["layer_norm"]["bias"]
    w["mu_w"] = params["fc_mu"]["kernel"]
    w["mu_b"] = params["fc_mu"]["bias"]
    w["z2h_w"] = params["fc_latent_to_hidden"]["kernel"]
    w["z2h_b"] = params["fc_latent_to_hidden"]["bias"]
    w["out_w"] = params["output_layer"]["kernel"]
    w["out_b"] = params["output_layer"]["bias"]
    return w


def _lstm_step(h, c, gates):
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h = jax.nn.sigmoid(o) * jnp.tanh(c)
    return h, c


def _kernel(
    # inputs (VMEM)
    x_ref,                     # [T, Bt, D] normalized windows (time-major)
    e0_wih, e0_whh, e0_b,      # encoder L1
    e1_wih, e1_whh, e1_b,      # encoder L2
    ln_scale, ln_bias,         # LayerNorm (H,)
    mu_w, mu_b,                # latent head
    z2h_w, z2h_b,              # latent -> decoder h0
    d0_wih, d0_whh, d0_b,      # decoder L1
    d1_wih, d1_whh, d1_b,      # decoder L2
    out_w, out_b,              # output head
    # outputs (VMEM)
    resid_ref,                 # [T, Bt, D] (x - recon)^2
    mse_ref,                   # [Bt, 1] per-window mean MSE
    *,
    T: int, H: int, use_layernorm: bool, dtype,
):
    Bt = x_ref.shape[1]
    f32 = jnp.float32

    def mm(a, b):
        return jnp.dot(a, b, preferred_element_type=f32)

    # ----- encoder: 2 stacked scans over time, state in VMEM registers -----
    h0 = jnp.zeros((Bt, H), f32)
    c0 = jnp.zeros((Bt, H), f32)

    def enc_body(t, carry):
        h1, c1, h2, c2 = carry
        x_t = x_ref[t].astype(dtype)
        g1 = mm(x_t, e0_wih[:].astype(dtype)) + mm(h1.astype(dtype),
                                                   e0_whh[:].astype(dtype)) + e0_b[:]
        h1, c1 = _lstm_step(h1, c1, g1)
        g2 = mm(h1.astype(dtype), e1_wih[:].astype(dtype)) + mm(
            h2.astype(dtype), e1_whh[:].astype(dtype)) + e1_b[:]
        h2, c2 = _lstm_step(h2, c2, g2)
        return h1, c1, h2, c2

    h1, c1, h2, c2 = jax.lax.fori_loop(0, T, enc_body, (h0, c0, h0, c0))

    # ----- LayerNorm + latent head (z = mu, deterministic gate) -----
    h_last = h2
    if use_layernorm:
        mean = jnp.mean(h_last, axis=-1, keepdims=True)
        var = jnp.mean((h_last - mean) ** 2, axis=-1, keepdims=True)
        h_last = (h_last - mean) * jax.lax.rsqrt(var + 1e-6) * ln_scale[:] + ln_bias[:]
    mu = mm(h_last.astype(dtype), mu_w[:].astype(dtype)) + mu_b[:]

    # ----- decoder: constant input projected ONCE -----
    dec_in = jnp.tanh(mm(mu.astype(dtype), z2h_w[:].astype(dtype)) + z2h_b[:])
    xp_const = mm(dec_in.astype(dtype), d0_wih[:].astype(dtype)) + d0_b[:]

    out_wc = out_w[:].astype(dtype)
    out_bc = out_b[:]

    def dec_body(t, carry):
        h1, c1, h2, c2, acc = carry
        g1 = xp_const + mm(h1.astype(dtype), d0_whh[:].astype(dtype))
        h1, c1 = _lstm_step(h1, c1, g1)
        g2 = mm(h1.astype(dtype), d1_wih[:].astype(dtype)) + mm(
            h2.astype(dtype), d1_whh[:].astype(dtype)) + d1_b[:]
        h2, c2 = _lstm_step(h2, c2, g2)
        y_t = mm(h2.astype(dtype), out_wc) + out_bc          # [Bt, D]
        r_t = (x_ref[t] - y_t) ** 2
        resid_ref[t] = r_t
        acc = acc + jnp.sum(r_t, axis=-1, keepdims=True)      # [Bt, 1]
        return h1, c1, h2, c2, acc

    acc0 = jnp.zeros((Bt, 1), f32)
    *_, acc = jax.lax.fori_loop(0, T, dec_body, (h0, c0, h0, c0, acc0))
    D = x_ref.shape[2]
    mse_ref[:] = acc / (T * D)


@functools.partial(
    jax.jit,
    static_argnames=("num_layers", "use_layernorm", "batch_tile", "dtype", "interpret"),
)
def fused_vae_gate(
    params: Dict,
    Z: jax.Array,                 # [N, T, D] normalized windows
    *,
    num_layers: int = 2,
    use_layernorm: bool = True,
    batch_tile: int = 256,
    dtype=jnp.bfloat16,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Fused deterministic VAE pass: returns (mse [N], residual [N, T, D]).

    Semantics match ``model.apply(..., sample=False)`` + residual/MSE epilogue
    (z = posterior mean). Batch is padded to a multiple of ``batch_tile``.
    """
    if num_layers != 2:
        raise NotImplementedError("fused kernel supports num_layers=2 (4DOF preset)")
    w = vae_params_to_kernel_weights(params, num_layers)
    N, T, D = Z.shape
    H = w["enc0_whh"].shape[0]

    Np = _round_up(max(N, 1), batch_tile)
    Zp = jnp.pad(Z, ((0, Np - N), (0, 0), (0, 0)))
    Zt = jnp.swapaxes(Zp, 0, 1)                      # [T, Np, D] time-major

    grid = (Np // batch_tile,)
    tile_in = pl.BlockSpec((T, batch_tile, D), lambda i: (0, i, 0),
                           memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)

    weights = [
        w["enc0_wih"], w["enc0_whh"], w["enc0_b"],
        w["enc1_wih"], w["enc1_whh"], w["enc1_b"],
        w.get("ln_scale", jnp.ones((H,), jnp.float32)),
        w.get("ln_bias", jnp.zeros((H,), jnp.float32)),
        w["mu_w"], w["mu_b"],
        w["z2h_w"], w["z2h_b"],
        w["dec0_wih"], w["dec0_whh"], w["dec0_b"],
        w["dec1_wih"], w["dec1_whh"], w["dec1_b"],
        w["out_w"], w["out_b"],
    ]
    weights = [jnp.asarray(x, jnp.float32) for x in weights]
    w_specs = [full(x.shape) for x in weights]

    kernel = functools.partial(_kernel, T=T, H=H, use_layernorm=use_layernorm,
                               dtype=dtype)
    resid_t, mse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[tile_in] + w_specs,
        out_specs=(
            pl.BlockSpec((T, batch_tile, D), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch_tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, Np, D), jnp.float32),
            jax.ShapeDtypeStruct((Np, 1), jnp.float32),
        ),
        interpret=interpret,
    )(Zt, *weights)

    resid = jnp.swapaxes(resid_t, 0, 1)[:N]
    return mse[:N, 0], resid


__all__ = ["fused_vae_gate", "vae_params_to_kernel_weights"]
