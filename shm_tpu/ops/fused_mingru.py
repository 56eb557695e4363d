"""Pallas TPU kernel: fused deterministic minGRU-VAE forward (gate + residual).

Companion to :mod:`shm_tpu.ops.fused_vae` (the LSTM kernel) for the opt-in
``cell="min_gru"`` preset (shm_tpu/models/minrnn.py). The XLA lowering of the
minGRU forward materializes every [B, T, 2H] projection through HBM, which is
why it measured BELOW the LSTM Pallas kernel despite doing ~6x less matmul
work (tools/probe_mingru.py: 358k vs 526k win/s device-side at bf16). This
kernel keeps the whole pass VMEM-resident per batch tile, and — unlike the
LSTM kernel, whose time loop serializes matmul -> 5 transcendentals per step —
exploits the minGRU's structure:

  - ALL hidden-to-gate projections are BATCHED matmuls over [*, T*Bt]
    (the gates never depend on the previous hidden state, so there is no
    per-step recurrent matmul at all);
  - the gate sigmoid is ONE batched VPU pass over [H, T*Bt] per layer;
  - the time recurrence is an elementwise multiply-add chain
    ``h = h + z * (h~ - h)`` on [H, Bt] blocks — 2 VPU ops per step, no
    transcendental, no matmul in the loop.

Layout: transposed like fused_vae (batch tile in lanes); the per-layer gate
scratch lives as [2H, T*Bt] with time-major lane blocks, so the recurrence
reads lane slices ``[:, t*Bt:(t+1)*Bt]`` — lane-tile aligned for Bt a
multiple of 128 (the default and minimum for the compiled path).

VMEM budget at Bt=128, T=100, H=128, bf16 scratch: gate scratch 6.6 MB +
hidden scratch 3.3 MB + x tile / y / residual / weights ~2 MB ~= 12 MB.
Bt=256 would need ~24 MB — over the 16 MB budget, hence the 128 default.

Inference only (the training path stays XLA: the parallel scan autodiffs
fine and training batches are small). Reference topology being served:
same LSTM-VAE wiring as 4DOF/Scripts/Models/temporal_vae.py:51-77 with the
recurrence swapped per models/minrnn.py (NOT a reference-parity cell).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from shm_tpu.ops.fused_vae import _round_up, _sigmoid_tanh


def mingru_params_to_kernel_weights(params: Dict, num_layers: int = 2) -> Dict:
    """Flatten a min_gru TemporalVAE param tree into transposed kernel weights
    ([out, in] matmul weights, [out, 1] biases)."""
    w = {}
    for stack, prefix in (("encoder_lstm", "enc"), ("decoder_lstm", "dec")):
        for l in range(num_layers):
            p = params[stack][f"layer{l}"]
            w[f"{prefix}{l}_wih"] = jnp.swapaxes(p["w_ih"], 0, 1)   # [2H, in]
            w[f"{prefix}{l}_b"] = p["b_ih"][:, None]                # [2H, 1]
    if "layer_norm" in params:
        w["ln_scale"] = params["layer_norm"]["scale"][:, None]
        w["ln_bias"] = params["layer_norm"]["bias"][:, None]
    w["mu_w"] = jnp.swapaxes(params["fc_mu"]["kernel"], 0, 1)
    w["mu_b"] = params["fc_mu"]["bias"][:, None]
    w["z2h_w"] = jnp.swapaxes(params["fc_latent_to_hidden"]["kernel"], 0, 1)
    w["z2h_b"] = params["fc_latent_to_hidden"]["bias"][:, None]
    w["out_w"] = jnp.swapaxes(params["output_layer"]["kernel"], 0, 1)
    w["out_b"] = params["output_layer"]["bias"][:, None]
    return w


def _kernel(
    x_ref,                      # [T, Dp, Bt] normalized windows (transposed)
    *refs,
    T: int, H: int, num_layers: int, use_layernorm: bool, dtype,
    d_real: int, emulate: bool, sigmoid_impl: str,
):
    it = iter(refs)
    enc = [(next(it), next(it)) for _ in range(num_layers)]
    ln_scale, ln_bias = (next(it), next(it)) if use_layernorm else (None, None)
    mu_w, mu_b = next(it), next(it)
    z2h_w, z2h_b = next(it), next(it)
    dec = [(next(it), next(it)) for _ in range(num_layers)]
    out_w, out_b = next(it), next(it)
    rest = list(it)
    # outputs then scratch: [resid?] mse, g_scratch, h_scratch, y_scratch
    g_ref, h_ref, y_ref = rest[-3], rest[-2], rest[-1]
    resid_ref = rest[0] if len(rest) == 5 else None
    mse_ref = rest[1] if len(rest) == 5 else rest[0]

    Bt = x_ref.shape[2]
    f32 = jnp.float32
    sig = _sigmoid_tanh if sigmoid_impl == "tanh" else jax.nn.sigmoid

    def mm(a, b):
        if emulate:
            return jnp.dot(a.astype(dtype).astype(f32),
                           b.astype(dtype).astype(f32),
                           preferred_element_type=f32)
        return jnp.dot(a.astype(dtype), b.astype(dtype),
                       preferred_element_type=f32)

    def lane(t):
        return pl.ds(t * Bt, Bt)

    # Chunked batched projection: g_ref[:, chunk] = sig/id(W @ src + b).
    # One whole-[*, T*Bt] matmul would materialize its f32 accumulator before
    # the ``dtype`` cast-store — 13 MB at Bt=128/T=100/H=128, which pushed the
    # first compile 616 KB over the 16 MB VMEM budget. 16-step lane chunks cap
    # the f32 temporary at 2 MB with the matmuls still [2H, 128] x [128, 2048].
    CHUNK = 16

    def project(w_ref, b_ref, src_ref, gate: bool):
        for c0 in range(0, T, CHUNK):
            n = min(CHUNK, T - c0)
            sl = pl.ds(c0 * Bt, n * Bt)
            g = mm(w_ref[:], src_ref[:, sl]) + b_ref[:]
            if gate:
                g = jnp.concatenate([sig(g[:H]), g[H:]], axis=0)
            g_ref[:, sl] = g.astype(g_ref.dtype)

    def recur_store(src_g_ref, store: bool):
        """z/h~ from the gate scratch; h_t = h + z*(h~ - h); optionally store
        every h_t into h_ref (as ``dtype``), always return h_T (f32)."""
        def body(t, h):
            z = src_g_ref[:H, lane(t)].astype(f32)
            hb = src_g_ref[H:, lane(t)].astype(f32)
            h = h + z * (hb - h)
            if store:
                h_ref[:, lane(t)] = h.astype(h_ref.dtype)
            return h

        return jax.lax.fori_loop(0, T, body, jnp.zeros((H, Bt), f32))

    # ----- encoder layer 1: per-t input projection (K = Dp is tiny, so
    # looped small matmuls cost little) with the gate sigmoid folded in -----
    (w1, b1) = enc[0]

    def proj1_body(t, _):
        g = mm(w1[:], x_ref[t]) + b1[:]
        g = jnp.concatenate([sig(g[:H]), g[H:]], axis=0)
        g_ref[:, lane(t)] = g.astype(g_ref.dtype)
        return 0

    jax.lax.fori_loop(0, T, proj1_body, 0)
    h_last = recur_store(g_ref, store=num_layers > 1)

    # ----- deeper encoder layers: chunk-batched projection from the stored
    # hidden sequence (sigmoid folded in); every layer except the last must
    # store its hidden sequence for the NEXT layer's projection (the read of
    # h_ref completes inside project() before recur_store overwrites it) -----
    for l in range(1, num_layers):
        wl, bl = enc[l]
        project(wl, bl, h_ref, gate=True)
        h_last = recur_store(g_ref, store=l < num_layers - 1)

    # ----- LayerNorm + latent head (z = mu) + decoder init -----
    if use_layernorm:
        mean = jnp.mean(h_last, axis=0, keepdims=True)
        var = jnp.mean((h_last - mean) ** 2, axis=0, keepdims=True)
        h_last = (h_last - mean) * jax.lax.rsqrt(var + 1e-5) * ln_scale[:] + ln_bias[:]
    mu = mm(mu_w[:], h_last) + mu_b[:]
    dec_in = jnp.tanh(mm(z2h_w[:], mu) + z2h_b[:])              # [H, Bt]

    # ----- decoder layer 1: constant input -> constant gates; the recurrence
    # still sweeps h from 0 toward h~ (stored: deeper layers need all t) -----
    (wd1, bd1) = dec[0]
    g1 = mm(wd1[:], dec_in) + bd1[:]                            # [2H, Bt]
    z1 = sig(g1[:H])
    hb1 = g1[H:]

    def dec1_body(t, h):
        h = h + z1 * (hb1 - h)
        h_ref[:, lane(t)] = h.astype(h_ref.dtype)
        return h

    jax.lax.fori_loop(0, T, dec1_body, jnp.zeros((H, Bt), f32))

    # ----- deeper decoder layers: batched projection + recurrence; the last
    # layer's hidden sequence overwrites h_ref (its projection is already in
    # the gate scratch, so the read is complete before the first store) -----
    for l in range(1, num_layers):
        wl, bl = dec[l]
        project(wl, bl, h_ref, gate=True)
        recur_store(g_ref, store=True)

    # ----- output head (chunk-batched matmul) + residual + MSE -----
    for c0 in range(0, T, CHUNK):
        n = min(CHUNK, T - c0)
        sl = pl.ds(c0 * Bt, n * Bt)
        y_ref[:, sl] = (mm(out_w[:], h_ref[:, sl]) + out_b[:]).astype(y_ref.dtype)

    def out_body(t, acc):
        r_t = (x_ref[t].astype(f32) - y_ref[:, lane(t)].astype(f32)) ** 2
        if resid_ref is not None:
            resid_ref[t] = r_t.astype(resid_ref.dtype)
        return acc + jnp.sum(r_t, axis=0, keepdims=True)

    acc = jax.lax.fori_loop(0, T, out_body, jnp.zeros((1, Bt), f32))
    # padded feature rows are exact zeros through the padded weights
    mse_ref[:] = acc / (T * d_real)


@functools.partial(
    jax.jit,
    static_argnames=("num_layers", "use_layernorm", "batch_tile", "dtype",
                     "io_dtype", "with_residual", "interpret", "emulate",
                     "sigmoid_impl"),
)
def fused_mingru_gate(
    params: Dict,
    Z: jax.Array,                 # [N, T, D] normalized windows
    *,
    num_layers: int = 2,
    use_layernorm: bool = True,
    batch_tile: int = 128,
    dtype=jnp.bfloat16,
    io_dtype=None,
    with_residual: bool = True,
    interpret: bool = False,
    emulate: bool = False,
    sigmoid_impl: str = "tanh",
) -> Tuple[jax.Array, jax.Array | None]:
    """Fused deterministic minGRU-VAE pass: (mse [N], residual [N,T,D] | None).

    Semantics match ``TemporalVAE(cell="min_gru").apply(..., sample=False)``
    plus the residual/MSE epilogue (equivalence pinned in tests/test_ops.py,
    interpret mode). ``dtype`` sets matmul-input AND gate/hidden scratch
    precision (f32 accumulation everywhere); ``batch_tile`` must be a
    multiple of 128 on the compiled path (lane-aligned recurrence slices).
    """
    w = mingru_params_to_kernel_weights(params, num_layers)
    N, T, D = Z.shape
    H = w["mu_w"].shape[1]
    io_dtype = io_dtype or Z.dtype
    if not interpret and batch_tile % 128:
        raise ValueError(f"batch_tile must be a multiple of 128 "
                         f"(lane-aligned time slices), got {batch_tile}")

    Dp = _round_up(D, 16)
    if Dp != D:
        w["enc0_wih"] = jnp.pad(w["enc0_wih"], ((0, 0), (0, Dp - D)))
        w["out_w"] = jnp.pad(w["out_w"], ((0, Dp - D), (0, 0)))
        w["out_b"] = jnp.pad(w["out_b"], ((0, Dp - D), (0, 0)))

    Np = _round_up(max(N, 1), batch_tile)
    Zp = jnp.pad(Z, ((0, Np - N), (0, 0), (0, Dp - D)))
    Zt = jnp.transpose(Zp, (1, 2, 0)).astype(io_dtype)   # [T, Dp, Np]

    grid = (Np // batch_tile,)
    tile_in = pl.BlockSpec((T, Dp, batch_tile), lambda i: (0, 0, i),
                           memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)

    weights = []
    for l in range(num_layers):
        weights += [w[f"enc{l}_wih"], w[f"enc{l}_b"]]
    if use_layernorm:
        weights += [w["ln_scale"], w["ln_bias"]]
    weights += [w["mu_w"], w["mu_b"], w["z2h_w"], w["z2h_b"]]
    for l in range(num_layers):
        weights += [w[f"dec{l}_wih"], w[f"dec{l}_b"]]
    weights += [w["out_w"], w["out_b"]]
    weights = [jnp.asarray(x, jnp.float32) for x in weights]
    w_specs = [full(x.shape) for x in weights]

    if sigmoid_impl not in ("tanh", "exact"):
        raise ValueError(f"unknown sigmoid_impl {sigmoid_impl!r}")
    kernel = functools.partial(_kernel, T=T, H=H, num_layers=num_layers,
                               use_layernorm=use_layernorm, dtype=dtype,
                               d_real=D, emulate=emulate,
                               sigmoid_impl=sigmoid_impl)

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

    TB = T * batch_tile
    scratch = [
        pltpu.VMEM((2 * H, TB), dtype),   # gate scratch
        pltpu.VMEM((H, TB), dtype),       # hidden-sequence scratch
        pltpu.VMEM((Dp, TB), dtype),      # output-head scratch
    ]

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[tile_in] + w_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(Zt, *weights)

    if with_residual:
        resid_t, mse = outs
        resid = jnp.transpose(resid_t[:, :D], (2, 0, 1))[:N]
    else:
        (mse,) = outs
        resid = None
    return mse[0, :N], resid


__all__ = ["fused_mingru_gate", "mingru_params_to_kernel_weights"]
