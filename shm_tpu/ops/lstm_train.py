"""Pallas TPU custom-VJP op: fused two-layer LSTM scan for TRAINING.

XLA's autodiff of a stacked-LSTM `lax.scan` issues many small sequential
matmuls per timestep with HBM-visible carries in both directions. This module
provides ``lstm2_scan`` — the two-layer LSTM sequence scan (the only part XLA
handles poorly) as a pair of Pallas kernels with a hand-written backward:

- **forward** (grid = (batch_tiles, T), time minor): both layers advance inside
  one kernel step; recurrent state lives in VMEM scratch across the whole scan;
  the per-step activation stash (post-activation gates, tanh(c), c_{t-1},
  h_{t-1}, h_layer0) streams to HBM through the normal Pallas output pipeline.
- **backward** (same grid, time-reversed index maps): consumes the stash in
  reverse, carries (dh, dc) per layer in VMEM scratch, accumulates ALL weight
  gradients in VMEM output blocks (constant index map -> resident across the
  grid, stored once), and emits d(input sequence) per step.

Everything around the scan — LayerNorm, latent heads, reparameterization,
dropout-mask application at the boundary, the decoder output head, the loss —
is plain JAX, so ``jax.grad`` composes through this op automatically.

Layout matches ops/fused_vae.py: transposed, batch in lanes; weights [out, in];
inter-layer dropout as an explicit [T, H, B] inverted mask (testable RNG).

Used by ``shm_tpu.train.vae`` as an optional fast training path for the 2-layer
presets; correctness is pinned against jax.grad of a pure-JAX reference with
identical masks (tests/test_lstm_train.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32

# stash row sections (x H rows each unless noted): layer0 gates (4H), tanh(c0),
# c0_prev, h0_prev, h0_cur; layer1 gates (4H), tanh(c1), c1_prev, h1_prev
# => 15H rows per step
_SECTS = ("g0", "tc0", "cp0", "hp0", "h0", "g1", "tc1", "cp1", "hp1")
_ROWS = {"g0": 4, "tc0": 1, "cp0": 1, "hp0": 1, "h0": 1,
         "g1": 4, "tc1": 1, "cp1": 1, "hp1": 1}


def _offsets(H: int):
    off = {}
    o = 0
    for name in _SECTS:
        off[name] = (o, o + _ROWS[name] * H)
        o += _ROWS[name] * H
    return off, o


def _cell_fwd(h, c, gates, H):
    i = jax.nn.sigmoid(gates[0 * H:1 * H])
    f = jax.nn.sigmoid(gates[1 * H:2 * H])
    g = jnp.tanh(gates[2 * H:3 * H])
    o = jax.nn.sigmoid(gates[3 * H:4 * H])
    c_new = f * c + i * g
    tc = jnp.tanh(c_new)
    h_new = o * tc
    return h_new, c_new, jnp.concatenate([i, f, g, o], axis=0), tc


def _cell_bwd(dh, dc_in, gates, tc, c_prev, H):
    i = gates[0 * H:1 * H]
    f = gates[1 * H:2 * H]
    g = gates[2 * H:3 * H]
    o = gates[3 * H:4 * H]
    do = dh * tc
    dc = dc_in + dh * o * (1.0 - tc * tc)
    d_gi = (dc * g) * i * (1.0 - i)
    d_gf = (dc * c_prev) * f * (1.0 - f)
    d_gg = (dc * i) * (1.0 - g * g)
    d_go = do * o * (1.0 - o)
    return jnp.concatenate([d_gi, d_gf, d_gg, d_go], axis=0), dc * f


def _fwd_kernel(x_ref, dm_ref, w0i, w0h, b0, w1i, w1h, b1,
                hs2_ref, stash_ref,
                h0s, c0s, h1s, c1s,
                *, H: int, Tc: int, dtype):
    """One (tile, chunk) step: advance both layers Tc timesteps; write hs2 +
    stash blocks. The time loop is inside the kernel so the pipeline overhead
    amortizes over Tc steps."""
    chunk = pl.program_id(1)
    off, _ = _offsets(H)

    @pl.when(chunk == 0)
    def _():
        h0s[:] = jnp.zeros_like(h0s)
        c0s[:] = jnp.zeros_like(c0s)
        h1s[:] = jnp.zeros_like(h1s)
        c1s[:] = jnp.zeros_like(c1s)

    def mm(a, b):
        return jnp.dot(a.astype(dtype), b.astype(dtype), preferred_element_type=F32)

    def step(tau, _):
        x_t = x_ref[tau]
        h0_prev, c0_prev = h0s[:], c0s[:]
        h1_prev, c1_prev = h1s[:], c1s[:]

        g0 = mm(w0i[:], x_t) + mm(w0h[:], h0_prev) + b0[:]
        h0, c0, gates0, tc0 = _cell_fwd(h0_prev, c0_prev, g0, H)
        h0d = h0 * dm_ref[tau]
        g1 = mm(w1i[:], h0d) + mm(w1h[:], h1_prev) + b1[:]
        h1, c1, gates1, tc1 = _cell_fwd(h1_prev, c1_prev, g1, H)

        h0s[:], c0s[:] = h0, c0
        h1s[:], c1s[:] = h1, c1

        hs2_ref[tau] = h1
        s = stash_ref
        s[tau, off["g0"][0]:off["g0"][1]] = gates0
        s[tau, off["tc0"][0]:off["tc0"][1]] = tc0
        s[tau, off["cp0"][0]:off["cp0"][1]] = c0_prev
        s[tau, off["hp0"][0]:off["hp0"][1]] = h0_prev
        s[tau, off["h0"][0]:off["h0"][1]] = h0
        s[tau, off["g1"][0]:off["g1"][1]] = gates1
        s[tau, off["tc1"][0]:off["tc1"][1]] = tc1
        s[tau, off["cp1"][0]:off["cp1"][1]] = c1_prev
        s[tau, off["hp1"][0]:off["hp1"][1]] = h1_prev
        return 0

    jax.lax.fori_loop(0, Tc, step, 0)


def _bwd_kernel(x_ref, dm_ref, w0i, w0h, b0, w1i, w1h, b1,
                stash_ref, dhs2_ref,
                dx_ref, gw0i, gw0h, gb0, gw1i, gw1h, gb1,
                dh0s, dc0s, dh1s, dc1s,
                *, H: int, Tc: int, dtype):
    """One reverse (tile, chunk) step: cell backward for both layers over Tc
    timesteps (reverse order within the chunk); accumulate weight grads in
    resident VMEM blocks; emit d(x_t)."""
    chunk = pl.program_id(1)
    first = jnp.logical_and(pl.program_id(0) == 0, chunk == 0)
    off, _ = _offsets(H)

    @pl.when(first)
    def _():
        for ref in (gw0i, gw0h, gb0, gw1i, gw1h, gb1):
            ref[:] = jnp.zeros_like(ref)

    @pl.when(chunk == 0)
    def _():
        dh0s[:] = jnp.zeros_like(dh0s)
        dc0s[:] = jnp.zeros_like(dc0s)
        dh1s[:] = jnp.zeros_like(dh1s)
        dc1s[:] = jnp.zeros_like(dc1s)

    def mm(a, b):
        return jnp.dot(a.astype(dtype), b.astype(dtype), preferred_element_type=F32)

    def mmT(a, b):
        return jax.lax.dot_general(
            a.astype(dtype), b.astype(dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=F32)

    # weight-grad accumulators carried through the chunk in registers (one
    # VMEM read-modify-write per chunk instead of per step)
    def step(k, acc):
        a0i, a0h, a0b, a1i, a1h, a1b = acc
        tau = Tc - 1 - k
        s = stash_ref
        gates0 = s[tau, off["g0"][0]:off["g0"][1]]
        tc0 = s[tau, off["tc0"][0]:off["tc0"][1]]
        cp0 = s[tau, off["cp0"][0]:off["cp0"][1]]
        hp0 = s[tau, off["hp0"][0]:off["hp0"][1]]
        h0 = s[tau, off["h0"][0]:off["h0"][1]]
        gates1 = s[tau, off["g1"][0]:off["g1"][1]]
        tc1 = s[tau, off["tc1"][0]:off["tc1"][1]]
        cp1 = s[tau, off["cp1"][0]:off["cp1"][1]]
        hp1 = s[tau, off["hp1"][0]:off["hp1"][1]]

        # layer 1 (top) backward
        dh1 = dhs2_ref[tau] + dh1s[:]
        dg1, dc1_prev = _cell_bwd(dh1, dc1s[:], gates1, tc1, cp1, H)
        h0d = h0 * dm_ref[tau]
        a1i = a1i + mmT(dg1, h0d)
        a1h = a1h + mmT(dg1, hp1)
        a1b = a1b + jnp.sum(dg1, axis=1, keepdims=True)
        dh0_from1 = mm(jnp.swapaxes(w1i[:], 0, 1), dg1) * dm_ref[tau]
        dh1s[:] = mm(jnp.swapaxes(w1h[:], 0, 1), dg1)
        dc1s[:] = dc1_prev

        # layer 0 backward
        dh0 = dh0_from1 + dh0s[:]
        dg0, dc0_prev = _cell_bwd(dh0, dc0s[:], gates0, tc0, cp0, H)
        a0i = a0i + mmT(dg0, x_ref[tau])
        a0h = a0h + mmT(dg0, hp0)
        a0b = a0b + jnp.sum(dg0, axis=1, keepdims=True)
        dx_ref[tau] = mm(jnp.swapaxes(w0i[:], 0, 1), dg0)
        dh0s[:] = mm(jnp.swapaxes(w0h[:], 0, 1), dg0)
        dc0s[:] = dc0_prev
        return a0i, a0h, a0b, a1i, a1h, a1b

    acc0 = tuple(jnp.zeros(r.shape, F32)
                 for r in (gw0i, gw0h, gb0, gw1i, gw1h, gb1))
    a0i, a0h, a0b, a1i, a1h, a1b = jax.lax.fori_loop(0, Tc, step, acc0)
    gw0i[:] += a0i
    gw0h[:] += a0h
    gb0[:] += a0b
    gw1i[:] += a1i
    gw1h[:] += a1h
    gb1[:] += a1b


def _specs(n_chunks, Tc, rows, Bt, reverse=False):
    if reverse:
        return pl.BlockSpec((Tc, rows, Bt),
                            lambda i, c: (n_chunks - 1 - c, 0, i),
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec((Tc, rows, Bt), lambda i, c: (c, 0, i),
                        memory_space=pltpu.VMEM)


def _pick_chunk(T: int, stash_rows: int, Bt: int,
                budget_bytes: int = 2_500_000) -> int:
    """Largest divisor of T whose stash block fits the VMEM budget.

    The stash block is (Tc, stash_rows, Bt) f32 and is double-buffered by the
    pipeline; blocks beyond ~2.5MB OOM the 16MB VMEM alongside weights/scratch.
    """
    per_step = stash_rows * Bt * 4
    cap = max(budget_bytes // per_step, 1)
    for tc in range(min(cap, T), 0, -1):
        if T % tc == 0:
            return tc
    return 1


def _const_spec(shape):
    return pl.BlockSpec(shape, lambda i, t: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def lstm2_scan(xs, dm, w0i, w0h, b0, w1i, w1h, b1,
               batch_tile=256, dtype=jnp.bfloat16, interpret=False):
    """Two-layer LSTM over a sequence, transposed layout.

    xs: [T, Din, B]; dm: [T, H, B] inverted-dropout mask applied to the
    layer-0 output before it feeds layer 1; weights [4H, *] / biases [4H, 1].
    Returns hs2 [T, H, B] — the top layer's per-step outputs. Differentiable
    w.r.t. xs and all six weights (mask treated as constant).
    """
    hs2, _ = _lstm2_fwd_impl(xs, dm, w0i, w0h, b0, w1i, w1h, b1,
                             batch_tile, dtype, interpret)
    return hs2


def _dims(xs, w0h, batch_tile):
    T, Din, B = xs.shape
    H = w0h.shape[1]
    if B % batch_tile:
        raise ValueError(f"batch {B} must be a multiple of batch_tile {batch_tile}")
    return T, Din, B, H, B // batch_tile


def _lstm2_fwd_impl(xs, dm, w0i, w0h, b0, w1i, w1h, b1,
                    batch_tile, dtype, interpret):
    T, Din, B, H, n_tiles = _dims(xs, w0h, batch_tile)
    _, stash_rows = _offsets(H)
    Tc = _pick_chunk(T, stash_rows, batch_tile)
    nc = T // Tc
    weights = [w0i, w0h, b0, w1i, w1h, b1]
    kernel = functools.partial(_fwd_kernel, H=H, Tc=Tc, dtype=dtype)
    hs2, stash = pl.pallas_call(
        kernel,
        grid=(n_tiles, nc),
        in_specs=[_specs(nc, Tc, Din, batch_tile), _specs(nc, Tc, H, batch_tile)]
        + [_const_spec(w.shape) for w in weights],
        out_specs=(_specs(nc, Tc, H, batch_tile),
                   _specs(nc, Tc, stash_rows, batch_tile)),
        out_shape=(jax.ShapeDtypeStruct((T, H, B), F32),
                   jax.ShapeDtypeStruct((T, stash_rows, B), F32)),
        scratch_shapes=[pltpu.VMEM((H, batch_tile), F32) for _ in range(4)],
        interpret=interpret,
    )(xs, dm, *weights)
    return hs2, stash


def _lstm2_fwd_vjp(xs, dm, w0i, w0h, b0, w1i, w1h, b1,
                   batch_tile, dtype, interpret):
    hs2, stash = _lstm2_fwd_impl(xs, dm, w0i, w0h, b0, w1i, w1h, b1,
                                 batch_tile, dtype, interpret)
    return hs2, (xs, dm, w0i, w0h, b0, w1i, w1h, b1, stash)


def _lstm2_bwd_vjp(batch_tile, dtype, interpret, res, d_hs2):
    xs, dm, w0i, w0h, b0, w1i, w1h, b1, stash = res
    T, Din, B, H, n_tiles = _dims(xs, w0h, batch_tile)
    _, stash_rows = _offsets(H)
    Tc = _pick_chunk(T, stash_rows, batch_tile)
    nc = T // Tc
    weights = [w0i, w0h, b0, w1i, w1h, b1]
    kernel = functools.partial(_bwd_kernel, H=H, Tc=Tc, dtype=dtype)
    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles, nc),
        in_specs=[_specs(nc, Tc, Din, batch_tile, reverse=True),
                  _specs(nc, Tc, H, batch_tile, reverse=True)]
        + [_const_spec(w.shape) for w in weights]
        + [_specs(nc, Tc, stash_rows, batch_tile, reverse=True),
           _specs(nc, Tc, H, batch_tile, reverse=True)],
        out_specs=tuple([_specs(nc, Tc, Din, batch_tile, reverse=True)]
                        + [_const_spec(w.shape) for w in weights]),
        out_shape=tuple([jax.ShapeDtypeStruct((T, Din, B), F32)]
                        + [jax.ShapeDtypeStruct(w.shape, F32) for w in weights]),
        scratch_shapes=[pltpu.VMEM((H, batch_tile), F32) for _ in range(4)],
        interpret=interpret,
    )(xs, dm, *weights, stash, d_hs2)
    dxs, gw0i, gw0h, gb0, gw1i, gw1h, gb1 = outs
    return (dxs, jnp.zeros_like(dm), gw0i, gw0h, gb0, gw1i, gw1h, gb1)


lstm2_scan.defvjp(_lstm2_fwd_vjp, _lstm2_bwd_vjp)


# ---------------------------------------------------------------------------
# pure-JAX reference (for tests) and the full VAE training apply
# ---------------------------------------------------------------------------


def lstm2_scan_reference(xs, dm, w0i, w0h, b0, w1i, w1h, b1):
    """jnp reference of lstm2_scan (same layout), for gradient cross-checks."""
    T, Din, B = xs.shape
    H = w0h.shape[1]
    zeros = jnp.zeros((H, B), F32)

    def step(carry, inp):
        h0, c0, h1, c1 = carry
        x_t, dm_t = inp
        g0 = w0i @ x_t + w0h @ h0 + b0
        h0n, c0n, _, _ = _cell_fwd(h0, c0, g0, H)
        g1 = w1i @ (h0n * dm_t) + w1h @ h1 + b1
        h1n, c1n, _, _ = _cell_fwd(h1, c1, g1, H)
        return (h0n, c0n, h1n, c1n), h1n

    _, hs2 = jax.lax.scan(step, (zeros, zeros, zeros, zeros), (xs, dm))
    return hs2


def vae_train_forward(params, Z, eps, dm_enc, dm_dec, *,
                      use_layernorm=True, batch_tile=256, dtype=jnp.bfloat16,
                      interpret=False, use_pallas=True):
    """Full training-mode VAE forward built on lstm2_scan + XLA glue.

    Z: [B, T, D] normalized windows; eps: [B, Zdim] reparam noise;
    dm_enc/dm_dec: [T, H, B] inverted-dropout masks (ones = deterministic).
    Returns (recon [B, T, D], mu, logvar). Fully differentiable w.r.t. params.
    """
    from shm_tpu.ops.fused_vae import vae_params_to_kernel_weights

    w = vae_params_to_kernel_weights(params, num_layers=2)
    lv_w = jnp.swapaxes(params["fc_logvar"]["kernel"], 0, 1)
    lv_b = params["fc_logvar"]["bias"][:, None]

    B, T, D = Z.shape
    H = w["enc0_whh"].shape[1]
    xs = jnp.transpose(Z, (1, 2, 0)).astype(F32)          # [T, D, B]

    scan = (functools.partial(lstm2_scan, batch_tile=batch_tile, dtype=dtype,
                              interpret=interpret)
            if use_pallas else
            lambda xs_, dm_, *ws: lstm2_scan_reference(xs_, dm_, *ws))

    hs2 = scan(xs, dm_enc, w["enc0_wih"], w["enc0_whh"], w["enc0_b"],
               w["enc1_wih"], w["enc1_whh"], w["enc1_b"])
    h_last = hs2[-1]                                       # [H, B]

    if use_layernorm:
        mean = jnp.mean(h_last, axis=0, keepdims=True)
        var = jnp.mean((h_last - mean) ** 2, axis=0, keepdims=True)
        h_last = ((h_last - mean) * jax.lax.rsqrt(var + 1e-6)
                  * w["ln_scale"] + w["ln_bias"])
    mu = w["mu_w"] @ h_last + w["mu_b"]                    # [Zdim, B]
    logvar = lv_w @ h_last + lv_b
    z = mu + eps.T * jnp.exp(0.5 * logvar)
    dec_in = jnp.tanh(w["z2h_w"] @ z + w["z2h_b"])         # [H, B]

    xs_dec = jnp.broadcast_to(dec_in[None], (T, H, B))
    hs2_dec = scan(xs_dec, dm_dec, w["dec0_wih"], w["dec0_whh"], w["dec0_b"],
                   w["dec1_wih"], w["dec1_whh"], w["dec1_b"])
    recon = jnp.einsum("dh,thb->tdb", w["out_w"], hs2_dec) + w["out_b"]
    return (jnp.transpose(recon, (2, 0, 1)), mu.T, logvar.T)


__all__ = ["lstm2_scan", "lstm2_scan_reference", "vae_train_forward"]
