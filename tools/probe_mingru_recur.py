"""Probe: what do the minGRU kernel's sequential recurrence loops cost?

The fused minGRU kernel (ops/fused_mingru.py) reduced the gate to batched
matmuls + one batched sigmoid + five T-step elementwise recurrence sweeps
(enc L0/L1, dec L0/L1, output-MSE accumulation). This probe attributes the
remaining device time to those serial loops by timing structurally-identical
kernel variants with the loop trip counts truncated (numerics are garbage —
this is ATTRIBUTION, not a shippable path):

  - full:   the shipping kernel (baseline)
  - rec1:   every recurrence/output fori_loop runs 1 step instead of T

If (full - rec1) is a large fraction, a log-depth (Hillis-Steele) scan
inside the kernel is worth building; if small, the kernel is already
projection/sigmoid-bound and the loops are not the lever.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_mingru_recur.py
"""

from __future__ import annotations

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(fn, *args, repeats=20):
    def readback(out):
        float(np.asarray(out).sum())

    readback(fn(*args))
    t0 = time.perf_counter()
    for _ in range(repeats):
        readback(fn(*args))
    return (time.perf_counter() - t0) / repeats


def make_gate(loop_T: int | None):
    """fused_mingru_gate clone (gate-only) with recurrence trip counts
    overridden to ``loop_T`` (None = full T). Mirrors ops/fused_mingru.py."""
    from shm_tpu.ops.fused_vae import _round_up, _sigmoid_tanh

    def _kernel(x_ref, *refs, T, H, num_layers, use_layernorm, dtype, d_real):
        it = iter(refs)
        enc = [(next(it), next(it)) for _ in range(num_layers)]
        ln_scale, ln_bias = (next(it), next(it)) if use_layernorm else (None, None)
        mu_w, mu_b = next(it), next(it)
        z2h_w, z2h_b = next(it), next(it)
        dec = [(next(it), next(it)) for _ in range(num_layers)]
        out_w, out_b = next(it), next(it)
        rest = list(it)
        g_ref, h_ref, y_ref = rest[-3], rest[-2], rest[-1]
        mse_ref = rest[0]

        Bt = x_ref.shape[2]
        f32 = jnp.float32
        sig = _sigmoid_tanh
        TL = T if loop_T is None else loop_T      # truncated trip count

        def mm(a, b):
            return jnp.dot(a.astype(dtype), b.astype(dtype),
                           preferred_element_type=f32)

        def lane(t):
            return pl.ds(t * Bt, Bt)

        CHUNK = 16

        def project(w_ref, b_ref, src_ref, gate):
            for c0 in range(0, T, CHUNK):
                n = min(CHUNK, T - c0)
                sl = pl.ds(c0 * Bt, n * Bt)
                g = mm(w_ref[:], src_ref[:, sl]) + b_ref[:]
                if gate:
                    g = jnp.concatenate([sig(g[:H]), g[H:]], axis=0)
                g_ref[:, sl] = g.astype(g_ref.dtype)

        def recur_store(src_g_ref, store):
            def body(t, h):
                z = src_g_ref[:H, lane(t)].astype(f32)
                hb = src_g_ref[H:, lane(t)].astype(f32)
                h = h + z * (hb - h)
                if store:
                    h_ref[:, lane(t)] = h.astype(h_ref.dtype)
                return h

            return jax.lax.fori_loop(0, TL, body, jnp.zeros((H, Bt), f32))

        (w1, b1) = enc[0]

        def proj1_body(t, _):
            g = mm(w1[:], x_ref[t]) + b1[:]
            g = jnp.concatenate([sig(g[:H]), g[H:]], axis=0)
            g_ref[:, lane(t)] = g.astype(g_ref.dtype)
            return 0

        jax.lax.fori_loop(0, T, proj1_body, 0)
        h_last = recur_store(g_ref, store=num_layers > 1)

        for l in range(1, num_layers):
            wl, bl = enc[l]
            project(wl, bl, h_ref, gate=True)
            h_last = recur_store(g_ref, store=False)

        if use_layernorm:
            mean = jnp.mean(h_last, axis=0, keepdims=True)
            var = jnp.mean((h_last - mean) ** 2, axis=0, keepdims=True)
            h_last = (h_last - mean) * jax.lax.rsqrt(var + 1e-6) * ln_scale[:] + ln_bias[:]
        mu = mm(mu_w[:], h_last) + mu_b[:]
        dec_in = jnp.tanh(mm(z2h_w[:], mu) + z2h_b[:])

        (wd1, bd1) = dec[0]
        g1 = mm(wd1[:], dec_in) + bd1[:]
        z1 = sig(g1[:H])
        hb1 = g1[H:]

        def dec1_body(t, h):
            h = h + z1 * (hb1 - h)
            h_ref[:, lane(t)] = h.astype(h_ref.dtype)
            return h

        jax.lax.fori_loop(0, TL, dec1_body, jnp.zeros((H, Bt), f32))

        for l in range(1, num_layers):
            wl, bl = dec[l]
            project(wl, bl, h_ref, gate=True)
            recur_store(g_ref, store=True)

        for c0 in range(0, T, CHUNK):
            n = min(CHUNK, T - c0)
            sl = pl.ds(c0 * Bt, n * Bt)
            y_ref[:, sl] = (mm(out_w[:], h_ref[:, sl]) + out_b[:]).astype(y_ref.dtype)

        def out_body(t, acc):
            r_t = (x_ref[t].astype(f32) - y_ref[:, lane(t)].astype(f32)) ** 2
            return acc + jnp.sum(r_t, axis=0, keepdims=True)

        acc = jax.lax.fori_loop(0, TL, out_body, jnp.zeros((1, Bt), f32))
        mse_ref[:] = acc / (T * d_real)

    @functools.partial(jax.jit, static_argnames=())
    def gate(params, Z):
        from shm_tpu.ops.fused_mingru import mingru_params_to_kernel_weights

        num_layers, use_layernorm, batch_tile = 2, True, 128
        dtype, io_dtype = jnp.bfloat16, jnp.bfloat16
        w = mingru_params_to_kernel_weights(params, num_layers)
        N, T, D = Z.shape
        H = w["mu_w"].shape[1]
        Dp = _round_up(D, 16)
        if Dp != D:
            w["enc0_wih"] = jnp.pad(w["enc0_wih"], ((0, 0), (0, Dp - D)))
            w["out_w"] = jnp.pad(w["out_w"], ((0, Dp - D), (0, 0)))
            w["out_b"] = jnp.pad(w["out_b"], ((0, Dp - D), (0, 0)))
        Np = _round_up(max(N, 1), batch_tile)
        Zp = jnp.pad(Z, ((0, Np - N), (0, 0), (0, Dp - D)))
        Zt = jnp.transpose(Zp, (1, 2, 0)).astype(io_dtype)

        grid = (Np // batch_tile,)
        tile_in = pl.BlockSpec((T, Dp, batch_tile), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)
        full = lambda s: pl.BlockSpec(s, lambda i: tuple(0 for _ in s),
                                      memory_space=pltpu.VMEM)
        weights = []
        for l in range(num_layers):
            weights += [w[f"enc{l}_wih"], w[f"enc{l}_b"]]
        weights += [w["ln_scale"], w["ln_bias"],
                    w["mu_w"], w["mu_b"], w["z2h_w"], w["z2h_b"]]
        for l in range(num_layers):
            weights += [w[f"dec{l}_wih"], w[f"dec{l}_b"]]
        weights += [w["out_w"], w["out_b"]]
        weights = [jnp.asarray(x, jnp.float32) for x in weights]

        kernel = functools.partial(_kernel, T=T, H=H, num_layers=num_layers,
                                   use_layernorm=use_layernorm,
                                   dtype=dtype, d_real=D)
        TB = T * batch_tile
        mse = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[tile_in] + [full(x.shape) for x in weights],
            out_specs=(pl.BlockSpec((1, batch_tile), lambda i: (0, i),
                                    memory_space=pltpu.VMEM),),
            out_shape=(jax.ShapeDtypeStruct((1, Np), jnp.float32),),
            scratch_shapes=[
                pltpu.VMEM((2 * H, TB), dtype),
                pltpu.VMEM((H, TB), dtype),
                pltpu.VMEM((Dp, TB), dtype),
            ],
        )(Zt, *weights)[0]
        return mse[0, :N]

    return gate


def main() -> None:
    import sys

    sys.path.insert(0, ".")
    from shm_tpu.config import VAEConfig
    from shm_tpu.models import vae_from_config
    from shm_tpu.ops import fused_mingru_gate

    cfg = VAEConfig(12, 16, 128, 2, 0.3, use_layernorm=True, cell="min_gru")
    model = vae_from_config(cfg)
    params = jax.device_put(model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((2, 100, 12), jnp.float32))["params"])

    N = 21760
    Z = jax.device_put(jax.random.normal(jax.random.PRNGKey(1), (N, 100, 12),
                                         jnp.float32))
    jax.block_until_ready(Z)

    ship = jax.jit(lambda p, Z: fused_mingru_gate(
        p, Z, num_layers=2, use_layernorm=True, with_residual=False,
        io_dtype=jnp.bfloat16)[0])
    t = timed(ship, params, Z)
    print(f"shipping kernel      : {N / t:,.0f} win/s  ({t * 1e3:.1f} ms)",
          flush=True)

    full = make_gate(None)
    t_full = timed(full, params, Z)
    print(f"probe clone (full T) : {N / t_full:,.0f} win/s  "
          f"({t_full * 1e3:.1f} ms)", flush=True)

    rec1 = make_gate(1)
    t_rec1 = timed(rec1, params, Z)
    print(f"loops truncated to 1 : {N / t_rec1:,.0f} win/s  "
          f"({t_rec1 * 1e3:.1f} ms)", flush=True)
    print(f"=> recurrence loops ~= {100 * (t_full - t_rec1) / t_full:.1f}% "
          "of kernel time", flush=True)


if __name__ == "__main__":
    main()
