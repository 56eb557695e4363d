"""Post-training int8 quantization of the 4DOF attribution CNN (inference).

VERDICT r4 #4: after the gate kernel reached its transcendental floor, the
attribution CNN is the remaining device-side cost of the hybrid (gate-only
523k -> full hybrid 352k win/s, ROADMAP). The v5e MXU runs int8 matmuls at
2x the bf16 rate with half the operand bytes; this module builds the int8
inference path for :class:`shm_tpu.models.cnn.CNN4DOF` and the A/B probe
(tools/probe_cnn_int8.py) decides whether it ships.

Scheme (chosen by measurement — see the design notes below):

- **BatchNorm folding**: inference BN is an affine map per channel, so it
  folds into the preceding conv's kernel/bias exactly
  (W' = W * g/sqrt(v+eps), b' = (b - m) * g/sqrt(v+eps) + beta), removing
  BN from the quantized graph entirely.
- **conv1 stays float** (compute dtype = ``dtype``, default bf16 like the
  production CNN): its input channel 1 is the squared VAE residual, whose
  per-position heavy tail makes 8-bit input quantization collapse
  (measured 21% activation error on synthetic heavy-tailed inputs).
  conv1 is also the layer with the least to gain (K = 3*3*2 = 18, the most
  MXU-underfilled contraction of the four).
- **conv2 / fc1 / fc2 weights**: symmetric per-output-column int8
  (scale = max|W'|/127 per cout); the scales fold into the f32 output
  rescale for free.
- **Activations: per-SAMPLE dynamic symmetric scales** (max|h_n|/127 per
  window, one VPU reduction per layer). Static per-tensor calibration is
  fundamentally mismatched here — the hybrid's activation magnitudes vary
  ~100x per WINDOW (anomalous vs normal), so one shared scale starves
  normal windows of resolution (measured: static per-tensor max-err 72-267
  vs logit spread 29 on heavy-tailed synthetic data; per-sample dynamic
  8.2, with 100% argmax agreement away from ties). A per-sample scale
  factors out of the matmul exactly (y_n = a_n * (q_n . W)), so the only
  error left is 8-bit rounding within a window.
- **Matmuls**: int8 x int8 -> int32 ``dot_general`` (MXU-native on TPU);
  outputs rescale to f32 with s_col * a_sample, add the folded bias,
  ReLU/pool in f32, requantize per sample for the next layer. fc2's
  logits stay f32 from the int32 accumulator.

Parity citation: the float topology being quantized is
4DOF/Scripts/Models/cnn_model.py:8-52 (see models/cnn.py::CNN4DOF).
Equivalence/quality gates: tests/test_cnn_int8.py (CPU) pins folding
exactness and quantized-vs-float fidelity; tools/probe_cnn_int8.py
measures throughput + the >=99.9% 3-class agreement bar on the trained
artifacts and real windows before any default changes.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

_BN_EPS = 1e-5      # CNN4DOF BatchNorm epsilon (models/cnn.py)


def _fold_bn(kernel, bias, bn_p, bn_s) -> Tuple[jax.Array, jax.Array]:
    """Fold an inference-mode BatchNorm (params scale/bias + batch_stats
    mean/var) into the preceding conv."""
    g = bn_p["scale"].astype(jnp.float32)
    b = bn_p["bias"].astype(jnp.float32)
    m = bn_s["mean"].astype(jnp.float32)
    v = bn_s["var"].astype(jnp.float32)
    s = g * jax.lax.rsqrt(v + _BN_EPS)                  # [cout]
    return (kernel.astype(jnp.float32) * s,             # broadcast over cout
            (bias.astype(jnp.float32) - m) * s + b)


def _quant_w(w2d: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-column int8 quantization of a [K, cout] f32 matrix."""
    scale = jnp.maximum(jnp.max(jnp.abs(w2d), axis=0), 1e-12) / 127.0
    q = jnp.clip(jnp.round(w2d / scale), -127, 127).astype(jnp.int8)
    return q, scale


@jax.tree_util.register_dataclass
@dataclass
class QuantCNN4DOF:
    """Folded conv1 (float) + int8 conv2/fc1/fc2 for the attribution CNN."""

    k1: jax.Array          # float [18, 16]  folded conv1 im2col weights
    b1: jax.Array          # f32   [16]
    w2: jax.Array          # int8  [144, 32] (3*3*16, BN2 folded)
    s2: jax.Array          # f32   [32]      weight scale per cout
    b2: jax.Array          # f32   [32]
    wf1: jax.Array         # int8  [2400, 128]
    sf1: jax.Array         # f32   [128]
    bf1: jax.Array         # f32   [128]
    wf2: jax.Array         # int8  [128, num_classes]
    sf2: jax.Array         # f32   [num_classes]
    bf2: jax.Array         # f32   [num_classes]


def _im2col(x: jax.Array, kt: int = 3, kw: int = 3) -> jax.Array:
    """SAME-padded [B, T, D, cin] -> [B, T, D, kt*kw*cin] patches, the
    (i, j)-major cin-minor order of models/cnn.py::Im2ColConv."""
    B, T, D, cin = x.shape
    xp = jnp.pad(x, ((0, 0), (kt // 2, kt // 2), (kw // 2, kw // 2), (0, 0)))
    cols = [xp[:, i:i + T, j:j + D, :] for i in range(kt) for j in range(kw)]
    return jnp.concatenate(cols, axis=-1)


def _q_sample(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-sample dynamic symmetric quantization over all non-batch axes:
    returns (int8 x_q, f32 scale [B]) with x ~= x_q * scale[:, None...]."""
    a = jnp.maximum(jnp.max(jnp.abs(x.reshape(x.shape[0], -1)), axis=1),
                    1e-12) / 127.0
    sh = (x.shape[0],) + (1,) * (x.ndim - 1)
    q = jnp.clip(jnp.round(x / a.reshape(sh)), -127, 127).astype(jnp.int8)
    return q, a


def _mm_i8(a: jax.Array, w: jax.Array) -> jax.Array:
    """int8 x int8 -> int32 contraction over the last/first axis."""
    nd = a.ndim - 1
    return jax.lax.dot_general(a, w, (((nd,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)


def _pool22(h: jax.Array) -> jax.Array:
    return jax.lax.reduce_window(h, -jnp.inf, jax.lax.max, (1, 2, 2, 1),
                                 (1, 2, 2, 1), "VALID")


def quantize_cnn4dof(variables: Dict, dtype: Any = jnp.bfloat16
                     ) -> QuantCNN4DOF:
    """Quantize trained CNN4DOF variables. No calibration data needed —
    activation scales are dynamic per sample at inference. ``dtype`` is the
    float conv1's compute/storage precision (bf16 in production, f32 in
    CPU equivalence tests)."""
    p = variables["params"]
    bs = variables["batch_stats"]
    k1, b1 = _fold_bn(p["conv1"]["kernel"], p["conv1"]["bias"],
                      p["bn1"], bs["bn1"])
    k2, b2 = _fold_bn(p["conv2"]["kernel"], p["conv2"]["bias"],
                      p["bn2"], bs["bn2"])
    w2, s2 = _quant_w(k2.reshape(-1, k2.shape[-1]))
    wf1, sf1 = _quant_w(p["fc1"]["kernel"].astype(jnp.float32))
    wf2, sf2 = _quant_w(p["fc2"]["kernel"].astype(jnp.float32))
    return QuantCNN4DOF(
        k1=k1.reshape(-1, k1.shape[-1]).astype(dtype), b1=b1,
        w2=w2, s2=s2, b2=b2,
        wf1=wf1, sf1=sf1, bf1=p["fc1"]["bias"].astype(jnp.float32),
        wf2=wf2, sf2=sf2, bf2=p["fc2"]["bias"].astype(jnp.float32))


def cnn4dof_int8_apply(q: QuantCNN4DOF, xin: jax.Array) -> jax.Array:
    """Quantized inference forward: [N, T, D, 2] float input ->
    [N, classes] f32 logits. conv1 runs float (its dtype is ``q.k1``'s);
    conv2/fc1/fc2 run int8 x int8 -> int32 on the MXU with per-sample
    dynamic activation scales."""
    dt = q.k1.dtype
    h = jax.lax.dot_general(_im2col(xin.astype(dt)), q.k1,
                            (((3,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) + q.b1
    h = _pool22(jnp.maximum(h, 0.0))
    xq, a = _q_sample(h)
    h = (_mm_i8(_im2col(xq), q.w2).astype(jnp.float32)
         * (q.s2 * a[:, None, None, None]) + q.b2)
    h = _pool22(jnp.maximum(h, 0.0))
    h = h.reshape(h.shape[0], -1)                     # [N, 2400]
    xq, a = _q_sample(h)
    h = (_mm_i8(xq, q.wf1).astype(jnp.float32) * (q.sf1 * a[:, None]) + q.bf1)
    h = jnp.maximum(h, 0.0)
    xq, a = _q_sample(h)
    return (_mm_i8(xq, q.wf2).astype(jnp.float32) * (q.sf2 * a[:, None])
            + q.bf2)


def cnn4dof_folded_apply(variables: Dict, xin: jax.Array) -> jax.Array:
    """BN-folded f32 forward (the exact float network the quantized path
    approximates) — the folding-correctness reference for tests."""
    p = variables["params"]
    bs = variables["batch_stats"]
    k1, b1 = _fold_bn(p["conv1"]["kernel"], p["conv1"]["bias"],
                      p["bn1"], bs["bn1"])
    k2, b2 = _fold_bn(p["conv2"]["kernel"], p["conv2"]["bias"],
                      p["bn2"], bs["bn2"])
    x = jnp.asarray(xin, jnp.float32)
    h = jnp.maximum(jax.lax.dot_general(
        _im2col(x), k1.reshape(-1, k1.shape[-1]),
        (((3,), (0,)), ((), ()))) + b1, 0.0)
    h = _pool22(h)
    h = jnp.maximum(jax.lax.dot_general(
        _im2col(h), k2.reshape(-1, k2.shape[-1]),
        (((3,), (0,)), ((), ()))) + b2, 0.0)
    h = _pool22(h)
    h = h.reshape(h.shape[0], -1)
    h = jnp.maximum(h @ p["fc1"]["kernel"].astype(jnp.float32)
                    + p["fc1"]["bias"].astype(jnp.float32), 0.0)
    return (h @ p["fc2"]["kernel"].astype(jnp.float32)
            + p["fc2"]["bias"].astype(jnp.float32))


__all__ = ["QuantCNN4DOF", "quantize_cnn4dof", "cnn4dof_int8_apply",
           "cnn4dof_folded_apply"]
