"""Root-cause probe for the fused-kernel f32 cliff (ROADMAP item 2).

Round-1 measured fused_vae_gate at 885 ms with dtype=f32 vs 33 ms with bf16
on the 5,440-window workload. The only difference between the two variants is
the MXU matmul input dtype (accumulation is f32 on both paths), so this probe
isolates the per-matmul cost inside a Pallas kernel:

  A. fused_vae_gate, bf16 vs f32 (reproduce the cliff end-to-end)
  B. a minimal kernel: T iterations of one [4H,H]x[H,Bt] dot, bf16 vs f32
     inputs (pure recurrent-matmul loop - the kernel's MXU workload)
  C. the same loop with the dot replaced by a VPU multiply (elementwise
     baseline, dtype-independent)
  D. B with "bf16x3" inputs: hi/lo bf16 split, 3 MXU passes (~f32 accuracy
     at MXU speed) - the candidate fix if plain f32 confirms the cliff

Prints one JSON line per measurement. TPU only.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, BT, T, REPS = 128, 256, 100, 50
N_TILES = 21   # ~5,440 windows / 256


def _time(fn, *args) -> float:
    out = fn(*args)
    float(np.asarray(out).sum())          # force completion (readback)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
        float(np.asarray(out).sum())
    return (time.perf_counter() - t0) / REPS * 1e3   # ms


def matmul_loop_kernel(w_ref, x_ref, o_ref, *, mode):
    w = w_ref[:]
    if mode == "bf16x3":
        w_hi = w.astype(jnp.bfloat16)
        w_lo = (w - w_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def body(t, h):
        if mode == "vpu":
            return h * 1.000001 + x_ref[0:H]
        if mode == "bf16":
            g = jnp.dot(w.astype(jnp.bfloat16), h.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
        elif mode == "f32":
            g = jnp.dot(w, h, preferred_element_type=jnp.float32)
        elif mode == "bf16x3":
            hb = h.astype(jnp.bfloat16)
            h_lo = (h - hb.astype(jnp.float32)).astype(jnp.bfloat16)
            g = (jnp.dot(w_hi, hb, preferred_element_type=jnp.float32)
                 + jnp.dot(w_hi, h_lo, preferred_element_type=jnp.float32)
                 + jnp.dot(w_lo, hb, preferred_element_type=jnp.float32))
        return jnp.tanh(g[0:H]) * 0.25 + h * 0.75

    h = jax.lax.fori_loop(0, T, body, x_ref[0:H])
    o_ref[:] = h


@functools.partial(jax.jit, static_argnames=("mode",))
def matmul_loop(w, x, mode):
    kern = functools.partial(matmul_loop_kernel, mode=mode)
    return pl.pallas_call(
        kern,
        grid=(N_TILES,),
        in_specs=[pl.BlockSpec((4 * H, H), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((4 * H, BT), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((H, BT), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, N_TILES * BT), jnp.float32),
    )(w, x)


def main() -> None:
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(4 * H, H)).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.normal(size=(4 * H, N_TILES * BT)).astype(np.float32))

    for mode in ("vpu", "bf16", "f32", "bf16x3"):
        ms = _time(lambda a, b: matmul_loop(a, b, mode), w, x)
        print(json.dumps({"probe": f"matmul_loop/{mode}", "ms": round(ms, 3)}),
              flush=True)

    # end-to-end fused gate, bf16 vs f32
    from shm_tpu.config import Stage4DofConfig
    from shm_tpu.models import vae_from_config
    from shm_tpu.ops import fused_vae_gate

    cfg = Stage4DofConfig()
    vae = vae_from_config(cfg.vae)
    params = vae.init({"params": jax.random.PRNGKey(0)},
                      jnp.zeros((2, 100, 12)))["params"]
    W = jnp.asarray(rng.normal(size=(5440, 100, 12)).astype(np.float32))

    for dt, name in ((jnp.bfloat16, "bf16"), (jnp.float32, "f32")):
        fn = jax.jit(lambda p, z: fused_vae_gate(
            p, z, num_layers=2, use_layernorm=True, with_residual=False,
            dtype=dt)[0])
        ms = _time(fn, params, W)
        print(json.dumps({"probe": f"fused_gate/{name}", "ms": round(ms, 3)}),
              flush=True)


if __name__ == "__main__":
    main()
