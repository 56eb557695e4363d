"""Probe: what bounds the fused gate kernel — MXU, VPU transcendentals, or
recurrence latency?

Evidence so far (BENCHMARKS.md): throughput is flat across batch tiles
256/512/1024 and f32-vs-bf16 matmul compute makes no difference, which rules
out MXU-bound and pure-latency-bound. The remaining suspect is the VPU
elementwise work per step (3 sigmoids + 2 tanh per LSTM cell on [H, Bt]
blocks). This probe measures gate-only scoring variants on the 4x workload:

  A. shipping kernel (skew=True, bf16)            — baseline
  B. sigmoid-via-tanh variant: sigmoid(x) = 0.5*(tanh(0.5x)+1) — if Mosaic
     lowers logistic as exp-based with extra ops, one tanh may be cheaper;
     numerics differ at float rounding level (NOT bit-exact).
  C. two interleaved batch tiles per program (independent recurrences
     advanced in one loop) — helps only if issue latency still matters.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_vpu_bound.py
"""

from __future__ import annotations

import functools
import json
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import load_trained_workload
from shm_tpu.data.windows import normalize_windows
from shm_tpu.ops import fused_vae_gate
from shm_tpu.ops.fused_vae import vae_params_to_kernel_weights, _round_up

REPS = 10


def _rate(fn, Z, n):
    out = fn(Z)
    float(np.asarray(out).sum())
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(Z)
        float(np.asarray(out).sum())
    return n / ((time.perf_counter() - t0) / REPS)


def _make_gate_kernel(sig_via_tanh: bool, interleave: int,
                      act_bf16: bool = False):
    """Gate-only 2-layer skewed kernel, optionally with sigmoid-via-tanh,
    `interleave` independent batch sub-tiles advanced in one loop, and
    `act_bf16` (evaluate the transcendentals on bf16 inputs — probes whether
    Mosaic packs bf16 VPU transcendentals 2-per-lane)."""

    def sig(x):
        if sig_via_tanh:
            return 0.5 * (jnp.tanh(0.5 * x) + 1.0)
        return jax.nn.sigmoid(x)

    def step(h, c, gates, H):
        if act_bf16:
            gates = gates.astype(jnp.bfloat16)
        i = gates[0 * H:1 * H]
        f = gates[1 * H:2 * H]
        g = gates[2 * H:3 * H]
        o = gates[3 * H:4 * H]
        c = (sig(f).astype(jnp.float32) * c
             + sig(i).astype(jnp.float32) * jnp.tanh(g).astype(jnp.float32))
        h = sig(o).astype(jnp.float32) * jnp.tanh(
            c.astype(jnp.bfloat16) if act_bf16 else c).astype(jnp.float32)
        return h, c

    def kernel(x_ref, w1ih, w1hh, b1, w2ih, w2hh, b2, ln_s, ln_b,
               mu_w, mu_b, z2h_w, z2h_b,
               d0ih, d0hh, d0b, d1ih, d1hh, d1b, out_w, out_b,
               mse_ref, *, T, H, d_real, dtype):
        Bt = x_ref.shape[2]
        sub = Bt // interleave
        f32 = jnp.float32

        def mm(a, b):
            return jnp.dot(a.astype(dtype), b.astype(dtype),
                           preferred_element_type=f32)

        zeros = jnp.zeros((H, sub), f32)
        xs = [lambda t, k=k: x_ref[t, :, k * sub:(k + 1) * sub]
              for k in range(interleave)]

        # --- encoder, layer-skewed, interleaved over sub-tiles ---
        st = []
        for k in range(interleave):
            g1 = mm(w1ih[:], xs[k](0)) + b1[:]
            h1, c1 = step(zeros, zeros, g1, H)
            st.append((h1, c1, zeros, zeros))

        def enc_body(t, carry):
            out = []
            for k in range(interleave):
                h1, c1, h2, c2 = carry[k]
                g2 = mm(w2ih[:], h1) + mm(w2hh[:], h2) + b2[:]
                g1 = mm(w1ih[:], xs[k](t)) + mm(w1hh[:], h1) + b1[:]
                h2n, c2n = step(h2, c2, g2, H)
                h1n, c1n = step(h1, c1, g1, H)
                out.append((h1n, c1n, h2n, c2n))
            return tuple(out)

        st = jax.lax.fori_loop(1, T, enc_body, tuple(st))
        hl = []
        for k in range(interleave):
            h1, c1, h2, c2 = st[k]
            g2 = mm(w2ih[:], h1) + mm(w2hh[:], h2) + b2[:]
            h_last, _ = step(h2, c2, g2, H)
            mean = jnp.mean(h_last, axis=0, keepdims=True)
            var = jnp.mean((h_last - mean) ** 2, axis=0, keepdims=True)
            h_last = ((h_last - mean) * jax.lax.rsqrt(var + 1e-6)
                      * ln_s[:] + ln_b[:])
            hl.append(h_last)

        # --- latent + decoder input ---
        xpc, dst = [], []
        for k in range(interleave):
            mu = mm(mu_w[:], hl[k]) + mu_b[:]
            dec_in = jnp.tanh(mm(z2h_w[:], mu) + z2h_b[:])
            xpc.append(mm(d0ih[:], dec_in) + d0b[:])
            h1, c1 = step(zeros, zeros, xpc[k], H)
            g2 = mm(d1ih[:], h1) + d1b[:]
            g1 = xpc[k] + mm(d0hh[:], h1)
            h2, c2 = step(zeros, zeros, g2, H)
            h1, c1 = step(h1, c1, g1, H)
            dst.append((h1, c1, h2, c2, jnp.zeros((1, sub), f32)))

        def out_step(k, t, h2, acc):
            y = mm(out_w[:], h2) + out_b[:]
            r = (xs[k](t).astype(f32) - y) ** 2
            return acc + jnp.sum(r, axis=0, keepdims=True)

        def dec_body(t, carry):
            out = []
            for k in range(interleave):
                h1, c1, h2, c2, acc = carry[k]
                acc = out_step(k, t - 2, h2, acc)
                g2 = mm(d1ih[:], h1) + mm(d1hh[:], h2) + d1b[:]
                g1 = xpc[k] + mm(d0hh[:], h1)
                h2n, c2n = step(h2, c2, g2, H)
                h1n, c1n = step(h1, c1, g1, H)
                out.append((h1n, c1n, h2n, c2n, acc))
            return tuple(out)

        dst = jax.lax.fori_loop(2, T, dec_body, tuple(dst))
        for k in range(interleave):
            h1, c1, h2, c2, acc = dst[k]
            acc = out_step(k, T - 2, h2, acc)
            g2 = mm(d1ih[:], h1) + mm(d1hh[:], h2) + d1b[:]
            h2, c2 = step(h2, c2, g2, H)
            acc = out_step(k, T - 1, h2, acc)
            mse_ref[0, k * sub:(k + 1) * sub] = acc[0] / (T * d_real)

    return kernel


@functools.partial(jax.jit, static_argnames=("sig_via_tanh", "interleave",
                                             "batch_tile", "act_bf16"))
def gate_variant(params, Z, *, sig_via_tanh=False, interleave=1,
                 batch_tile=256, act_bf16=False):
    w = vae_params_to_kernel_weights(params, 2)
    N, T, D = Z.shape
    H = w["enc0_whh"].shape[1]
    Dp = _round_up(D, 16)
    if Dp != D:
        w["enc0_wih"] = jnp.pad(w["enc0_wih"], ((0, 0), (0, Dp - D)))
        w["out_w"] = jnp.pad(w["out_w"], ((0, Dp - D), (0, 0)))
        w["out_b"] = jnp.pad(w["out_b"], ((0, Dp - D), (0, 0)))
    bt = batch_tile * interleave
    Np = _round_up(max(N, 1), bt)
    Zp = jnp.pad(Z, ((0, Np - N), (0, 0), (0, Dp - D)))
    Zt = jnp.transpose(Zp, (1, 2, 0)).astype(jnp.bfloat16)

    names = ["enc0_wih", "enc0_whh", "enc0_b", "enc1_wih", "enc1_whh",
             "enc1_b", "ln_scale", "ln_bias", "mu_w", "mu_b", "z2h_w",
             "z2h_b", "dec0_wih", "dec0_whh", "dec0_b", "dec1_wih",
             "dec1_whh", "dec1_b", "out_w", "out_b"]
    weights = [jnp.asarray(w[n], jnp.float32) for n in names]
    full = lambda s: pl.BlockSpec(s, lambda i: tuple(0 for _ in s),
                                  memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _make_gate_kernel(sig_via_tanh, interleave, act_bf16),
        T=T, H=H, d_real=D, dtype=jnp.bfloat16)
    mse = pl.pallas_call(
        kernel,
        grid=(Np // bt,),
        in_specs=[pl.BlockSpec((T, Dp, bt), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)]
        + [full(x.shape) for x in weights],
        out_specs=pl.BlockSpec((1, bt), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, Np), jnp.float32),
    )(Zt, *weights)
    return mse[0, :N]


def main() -> None:
    vae, cnn, vae_params, cnn_vars, W, mean, std, thr = load_trained_workload()
    reps4 = -(-21760 // W.shape[0])
    W4 = np.concatenate([W] * reps4)[:21760].astype(np.float32)
    n = W4.shape[0]
    Zd = jax.device_put(normalize_windows(jnp.asarray(W4), jnp.asarray(mean),
                                          jnp.asarray(std)))
    vae_params = jax.device_put(vae_params)
    float(np.asarray(Zd).sum())

    ref = np.asarray(fused_vae_gate(vae_params, Zd, num_layers=2,
                                    use_layernorm=True, io_dtype=jnp.bfloat16,
                                    with_residual=False)[0])

    base = jax.jit(lambda Z: fused_vae_gate(
        vae_params, Z, num_layers=2, use_layernorm=True,
        io_dtype=jnp.bfloat16, with_residual=False)[0])
    r = _rate(base, Zd, n)
    print(json.dumps({"variant": "A_shipping_skew", "win_per_sec": round(r)}),
          flush=True)

    for name, kw in [
        ("B_sig_via_tanh", dict(sig_via_tanh=True, interleave=1)),
        ("C_interleave2", dict(sig_via_tanh=False, interleave=2)),
        ("D_probe_baseline", dict(sig_via_tanh=False, interleave=1)),
        ("E_tanh_plus_il2", dict(sig_via_tanh=True, interleave=2)),
        ("F_tanh_bf16_act", dict(sig_via_tanh=True, interleave=1,
                                 act_bf16=True)),
    ]:
        fn = jax.jit(lambda Z, kw=kw: gate_variant(vae_params, Z, **kw))
        try:
            out = np.asarray(fn(Zd))
            err = float(np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-9))
            r = _rate(fn, Zd, n)
            gate_agree = float((np.asarray(out > thr)
                                == np.asarray(ref > thr)).mean())
            print(json.dumps({"variant": name, "win_per_sec": round(r),
                              "rel_err": err, "gate_agree": gate_agree}),
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"variant": name,
                              "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
