"""Pallas TPU kernel: fused deterministic attention-VAE forward (gate + residual).

Third member of the fused-gate family (fused_vae.py = LSTM, fused_mingru.py =
minGRU) for the opt-in ``cell="attention"`` preset
(shm_tpu/models/attention.py). The XLA lowering of the transformer gate
measured ~5x BELOW the LSTM kernel (98k vs 476k win/s device-side,
tools/probe_attention.py): at B*T ~ 2M tokens every inter-op [B, T, H]
activation round-trips HBM, so the un-fused op chain is bandwidth-bound at
<9% MFU. This kernel keeps the whole VAE pass VMEM-resident per batch tile.

The round-3 analysis that parked a transformer kernel feared the per-head
``[T, 32] x [32, T]`` score contractions would underfill the MXU (the
attribution transposed-layout probe's failure mode). The layout here
sidesteps that with **head-packed key/value blocks**:

  - activations run in the NATURAL layout ``[rows, H]`` with the model width
    in lanes (H pads to Hp=128) and ``rows = window * Tp + t`` (Tp = T
    rounded up to 128, so every per-window row block is sublane-aligned);
  - per window, keys/values are packed as ``K_cat = concat_h(K * mask_h)``
    of shape ``[heads*Tp, Hp]`` where ``mask_h`` zeroes every lane outside
    head ``h``'s 32-lane slice. One lanes-contracting matmul
    ``Q [Tp, Hp] . K_cat^T -> [Tp, heads*Tp]`` then yields ALL heads' score
    matrices side by side in aligned 128-lane blocks — a full-K (K=128) MXU
    contraction instead of ``heads`` K=32 slivers, at the same MXU occupancy
    (a K=32 matmul spends the same systolic passes as K=128);
  - softmax runs per aligned head block (f32, max-subtracted), and the
    weighted sum is one more full matmul ``P [Tp, heads*Tp] @ V_cat
    [heads*Tp, Hp]`` whose lane masks route each head's probabilities to
    exactly its own 32 output lanes;
  - QKV / output / MLP projections and LayerNorms are BATCHED over
    multi-window row chunks (pure [*, 128k] matmuls + row-local VPU);
  - padded key rows (t' >= T) are masked to -1e30 before softmax; padded
    query rows produce garbage that stays row-local (masked out of the
    mean-pool and the MSE/residual epilogue); padded lanes (H < 128) carry
    exact zeros end-to-end (zero-padded weights, lane-masked LayerNorm
    statistics).

Semantics match ``TemporalVAE(cell="attention").apply(..., sample=False)``
plus the residual/MSE epilogue (equivalence pinned in tests, interpret
mode): encoder stack -> final_norm -> mean-pool over the T real steps ->
[VAE LayerNorm] -> fc_mu (z = mu) -> tanh(fc_latent_to_hidden) -> decoder
in_proj broadcast over T + positions -> decoder stack -> final_norm ->
output head -> (x - x_hat)^2 residual + per-window mean MSE. Flax numerics
are reproduced exactly where they matter: the 1/sqrt(head_dim) query scale
is folded into W_q AND b_q (flax scales after the biased projection),
LayerNorm uses the mean2 - mean^2 variance with eps=1e-6, GELU is the
approximate (tanh) form, softmax subtracts the row max.

Reference topology being served: same VAE wiring as
4DOF/Scripts/Models/temporal_vae.py:51-77 with the recurrence replaced by
the (non-parity) transformer stack of models/attention.py.

Inference only, like the sibling kernels (training stays XLA - autodiff
through this would need a custom VJP and training batches are small).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from shm_tpu.models.attention import sinusoidal_positions
from shm_tpu.ops.fused_vae import _round_up

_HP = 128          # padded model width (lanes)
_HEAD_DIM = 32     # the stack's fixed head size (models/attention.py)
_LN_EPS = 1e-6       # flax LayerNorm default: the stack's INTERNAL norms
_MODEL_LN_EPS = 1e-5  # torch LayerNorm eps: the model-level norm on the
                      # pooled encoder state (torch-parity across cell
                      # families — see models/vae.py and probe_vae_offset.py)


def auto_stream(Tp: int) -> bool:
    """Default attention-inner-loop policy: streaming online-softmax for
    multi-key-block shapes (Tp > 128; measured +7% at the openLAB T=200
    shape), packed softmax otherwise (measured faster at T<=128, where a
    single key block makes online rescaling pure overhead)."""
    return Tp > 128


def _pad2(a: jax.Array, rows: int, cols: int) -> jax.Array:
    return jnp.pad(a, ((0, rows - a.shape[0]), (0, cols - a.shape[1])))


def _vec(a: jax.Array, cols: int) -> jax.Array:
    return _pad2(a[None, :].astype(jnp.float32), 1, cols)


def attention_params_to_kernel_weights(
    params: Dict, num_layers: int = 2, use_layernorm: bool = True,
) -> Tuple[List[jax.Array], int, int]:
    """Flatten an attention TemporalVAE param tree into the kernel's padded
    f32 weight list (order consumed by ``_kernel``). Returns
    ``(weights, H, heads)``. The query projection (kernel AND bias) is
    pre-scaled by 1/sqrt(head_dim) — flax divides the biased projection by
    sqrt(depth) before the QK contraction, so folding is exact."""
    H = params["fc_mu"]["kernel"].shape[0]
    w: List[jax.Array] = []
    heads = None

    def stack(tree):
        nonlocal heads
        ip = tree["in_proj"]
        w.append(_pad2(ip["kernel"].astype(jnp.float32), _HP, _HP))
        w.append(_vec(ip["bias"], _HP))
        for l in range(num_layers):
            lay = tree[f"layer{l}"]
            w.append(_vec(lay["attn_norm"]["scale"], _HP))
            w.append(_vec(lay["attn_norm"]["bias"], _HP))
            att = lay["attn"]
            hd = att["query"]["kernel"].shape[-1]
            if heads is None:
                heads = att["query"]["kernel"].shape[1]
            scale = 1.0 / (hd ** 0.5)
            qkv, qkv_b = [], []
            for name, s in (("query", scale), ("key", 1.0), ("value", 1.0)):
                kk = att[name]["kernel"].astype(jnp.float32) * s   # [H, heads, hd]
                bb = att[name]["bias"].astype(jnp.float32) * s     # [heads, hd]
                qkv.append(_pad2(kk.reshape(H, -1), _HP, _HP))
                qkv_b.append(_vec(bb.reshape(-1), _HP))
            w.append(jnp.concatenate(qkv, axis=1))                 # [Hp, 3Hp]
            w.append(jnp.concatenate(qkv_b, axis=1))               # [1, 3Hp]
            ok = att["out"]["kernel"].astype(jnp.float32)          # [heads, hd, H]
            w.append(_pad2(ok.reshape(-1, H), _HP, _HP))
            w.append(_vec(att["out"]["bias"], _HP))
            w.append(_vec(lay["mlp_norm"]["scale"], _HP))
            w.append(_vec(lay["mlp_norm"]["bias"], _HP))
            m4 = lay["mlp_in"]["kernel"].shape[1]
            w.append(_pad2(lay["mlp_in"]["kernel"].astype(jnp.float32), _HP, m4))
            w.append(_vec(lay["mlp_in"]["bias"], m4))
            w.append(_pad2(lay["mlp_out"]["kernel"].astype(jnp.float32), m4, _HP))
            w.append(_vec(lay["mlp_out"]["bias"], _HP))
        w.append(_vec(tree["final_norm"]["scale"], _HP))
        w.append(_vec(tree["final_norm"]["bias"], _HP))

    stack(params["encoder_lstm"])
    if use_layernorm:
        w.append(_vec(params["layer_norm"]["scale"], _HP))
        w.append(_vec(params["layer_norm"]["bias"], _HP))
    w.append(_pad2(params["fc_mu"]["kernel"].astype(jnp.float32), _HP, _HP))
    w.append(_vec(params["fc_mu"]["bias"], _HP))
    w.append(_pad2(params["fc_latent_to_hidden"]["kernel"].astype(jnp.float32),
                   _HP, _HP))
    w.append(_vec(params["fc_latent_to_hidden"]["bias"], _HP))
    stack(params["decoder_lstm"])
    w.append(_pad2(params["output_layer"]["kernel"].astype(jnp.float32),
                   _HP, _HP))
    w.append(_vec(params["output_layer"]["bias"], _HP))
    return w, H, int(heads)


def _kernel(
    x_ref,                      # [Bt*Tp, Dp] padded normalized windows
    pos_ref,                    # [Tp, Hp] f32 sinusoidal positions (padded)
    *refs,
    T: int, Tp: int, H: int, heads: int, num_layers: int,
    use_layernorm: bool, mlp_ratio: int, d_real: int, dtype, emulate: bool,
    Bt: int, CW: int, nt_dot: bool, stream: bool, ablate: frozenset,
):
    f32 = jnp.float32
    M4 = mlp_ratio * H
    it = iter(refs)

    def take(n):
        return [next(it) for _ in range(n)]

    def take_stack():
        in_w, in_b = take(2)
        layers = []
        for _ in range(num_layers):
            (ln1s, ln1b, wqkv, bqkv, wo, bo,
             ln2s, ln2b, w1, b1, w2, b2) = take(12)
            layers.append((ln1s, ln1b, wqkv, bqkv, wo, bo,
                           ln2s, ln2b, w1, b1, w2, b2))
        fs, fb = take(2)
        return in_w, in_b, layers, fs, fb

    enc_in_w, enc_in_b, enc_layers, enc_fs, enc_fb = take_stack()
    vae_ls, vae_lb = take(2) if use_layernorm else (None, None)
    mu_w, mu_b = take(2)
    z2h_w, z2h_b = take(2)
    dec_in_w, dec_in_b, dec_layers, dec_fs, dec_fb = take_stack()
    out_w, out_b = take(2)
    rest = list(it)
    # outputs then scratch: [resid?] mse, s, qkv, o, pooled
    s_ref, qkv_ref, o_ref, pooled_ref = rest[-4], rest[-3], rest[-2], rest[-1]
    resid_ref = rest[0] if len(rest) == 6 else None
    mse_ref = rest[1] if len(rest) == 6 else rest[0]

    # ---- masks (values, computed once per grid step) ----
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _HP), 1)
    lane_mask = (lane < H).astype(f32)                         # [1, Hp]
    head_masks = [(lane // _HEAD_DIM == h).astype(dtype)
                  for h in range(heads)]                       # [1, Hp] each
    Ws = heads * Tp
    klane = jax.lax.broadcasted_iota(jnp.int32, (1, Ws), 1)
    key_neg = jnp.where(klane % Tp < T, 0.0, -1e30).astype(f32)  # [1, Ws]
    rowi = jax.lax.broadcasted_iota(jnp.int32, (Tp, 1), 0)
    row_mask = (rowi < T).astype(f32)                          # [Tp, 1]

    def mm(a, b, nt=False):
        a = a.astype(dtype)
        b = b.astype(dtype)
        if emulate:
            a, b = a.astype(f32), b.astype(f32)
        dn = (((1,), (1,)), ((), ())) if nt else (((1,), (0,)), ((), ()))
        return jax.lax.dot_general(a, b, dn, preferred_element_type=f32)

    def ln(x, scale_ref, bias_ref, eps=_LN_EPS):
        """flax LayerNorm over the H REAL lanes of a [C, Hp] f32 block:
        var = mean(x^2) - mean^2 clamped at 0; zero-padded scale/bias
        re-zero the padded lanes. ``eps`` is 1e-6 (flax) for the stack's
        internal norms, 1e-5 (torch) for the model-level norm."""
        if "ln" in ablate:                # timing-only: norms become no-ops
            return x
        xm = x * lane_mask
        mean = jnp.sum(xm, axis=1, keepdims=True) / H
        mean2 = jnp.sum(xm * xm, axis=1, keepdims=True) / H
        var = jnp.maximum(mean2 - mean * mean, 0.0)
        y = (x - mean) * jax.lax.rsqrt(var + eps)
        return y * scale_ref[:] + bias_ref[:]

    C = CW * Tp
    nchunk = Bt // CW

    def for_chunks(fn):
        def body(ci, _):
            fn(pl.ds(pl.multiple_of(ci * C, C), C))
            return 0
        jax.lax.fori_loop(0, nchunk, body, 0)

    def for_windows(fn):
        def body(wi, _):
            fn(wi, pl.ds(pl.multiple_of(wi * Tp, Tp), Tp))
            return 0
        jax.lax.fori_loop(0, Bt, body, 0)

    pos_tile = jnp.concatenate([pos_ref[:]] * CW, axis=0)      # [C, Hp] f32

    KB = 128                     # streaming key-block width (lanes)
    nkb = Tp // KB
    kcol = jax.lax.broadcasted_iota(jnp.int32, (1, KB), 1)
    key_neg_blk = [jnp.where(jb * KB + kcol < T, 0.0, -1e30).astype(f32)
                   for jb in range(nkb)]                       # [1, KB] each

    def block(layer_refs):
        (ln1s, ln1b, wqkv, bqkv, wo, bo, ln2s, ln2b, w1, b1, w2, b2) = layer_refs

        def attn_pre(sl):
            nrm = ln(s_ref[sl, :].astype(f32), ln1s, ln1b)
            if "proj" in ablate:          # timing-only: copies instead of mm
                nd = nrm.astype(qkv_ref.dtype)
                qkv_ref[sl, 0:_HP] = nd
                qkv_ref[sl, _HP:2 * _HP] = nd
                qkv_ref[sl, 2 * _HP:3 * _HP] = nd
                return
            qkv_ref[sl, :] = (mm(nrm, wqkv[:]) + bqkv[:]).astype(qkv_ref.dtype)

        for_chunks(attn_pre)

        def attn_window(_, sl):
            q = qkv_ref[sl, 0:_HP]
            if "attn_mm" in ablate:       # timing-only: skip score+PV matmuls
                o_ref[sl, :] = q
                return
            k = qkv_ref[sl, _HP:2 * _HP]
            v = qkv_ref[sl, 2 * _HP:3 * _HP]
            k_cat = jnp.concatenate([k * hm for hm in head_masks], axis=0)
            if nt_dot:
                scores = mm(q, k_cat, nt=True)                 # [Tp, heads*Tp]
            else:
                scores = mm(q, jnp.swapaxes(k_cat, 0, 1))
            scores = scores + key_neg
            if "softmax" in ablate:       # timing-only: linear instead of exp
                p_cat = scores * 1e-4
            else:
                probs = []
                for h in range(heads):
                    blk = scores[:, h * Tp:(h + 1) * Tp]
                    mx = jnp.max(blk, axis=1, keepdims=True)
                    e = jnp.exp(blk - mx)
                    probs.append(e / jnp.sum(e, axis=1, keepdims=True))
                p_cat = jnp.concatenate(probs, axis=1)         # [Tp, heads*Tp]
            v_cat = jnp.concatenate([v * hm for hm in head_masks], axis=0)
            o_ref[sl, :] = mm(p_cat, v_cat).astype(o_ref.dtype)

        def attn_window_stream(_, sl):
            """Streaming (flash-style) attention: per head, scores are
            consumed in [Tp, KB] key blocks with an online max/denominator,
            so neither the packed [Tp, heads*Tp] score tensor nor the
            [heads*Tp, Hp] K/V concatenations ever materialize (VERDICT r3
            #4 — the score-tensor VMEM-traffic attack). Each head's PV
            product lands in its own 32 output lanes via the v*mask_h lane
            routing, so the per-head outputs sum directly."""
            q = qkv_ref[sl, 0:_HP]
            if "attn_mm" in ablate:       # timing-only: skip score+PV matmuls
                o_ref[sl, :] = q
                return
            k = qkv_ref[sl, _HP:2 * _HP]
            v = qkv_ref[sl, 2 * _HP:3 * _HP]
            o_total = jnp.zeros((Tp, _HP), f32)
            for h in range(heads):
                kh = k * head_masks[h]                         # [Tp, Hp]
                vh = v * head_masks[h]
                m = jnp.full((Tp, 1), -1e30, f32)
                l_sum = jnp.zeros((Tp, 1), f32)
                o = jnp.zeros((Tp, _HP), f32)
                for jb in range(nkb):
                    kb = kh[jb * KB:(jb + 1) * KB, :]
                    if nt_dot:
                        s_blk = mm(q, kb, nt=True)             # [Tp, KB]
                    else:
                        s_blk = mm(q, jnp.swapaxes(kb, 0, 1))
                    s_blk = s_blk + key_neg_blk[jb]
                    m_new = jnp.maximum(
                        m, jnp.max(s_blk, axis=1, keepdims=True))
                    alpha = jnp.exp(m - m_new)
                    p = jnp.exp(s_blk - m_new)
                    l_sum = l_sum * alpha + jnp.sum(p, axis=1, keepdims=True)
                    o = o * alpha + mm(p, vh[jb * KB:(jb + 1) * KB, :])
                    m = m_new
                o_total = o_total + o / l_sum
            o_ref[sl, :] = o_total.astype(o_ref.dtype)

        for_windows(attn_window_stream if stream else attn_window)

        def attn_post(sl):
            if "proj" in ablate:          # timing-only: skip the out matmul
                xo = o_ref[sl, :].astype(f32)
            else:
                xo = mm(o_ref[sl, :], wo[:]) + bo[:]
            s_ref[sl, :] = (s_ref[sl, :].astype(f32) + xo).astype(s_ref.dtype)

        for_chunks(attn_post)

        def mlp(sl):
            xs = s_ref[sl, :].astype(f32)
            nrm = ln(xs, ln2s, ln2b)
            h1 = jax.nn.gelu(mm(nrm, w1[:]) + b1[:], approximate=True)
            s_ref[sl, :] = (xs + mm(h1, w2[:]) + b2[:]).astype(s_ref.dtype)

        if "mlp" not in ablate:           # ablation is timing-only
            for_chunks(mlp)

    # ---- encoder ----
    def enc_in(sl):
        tok = mm(x_ref[sl, :], enc_in_w[:]) + enc_in_b[:] + pos_tile
        s_ref[sl, :] = tok.astype(s_ref.dtype)

    for_chunks(enc_in)
    for lay in enc_layers:
        block(lay)

    def pool(wi, sl):
        nrm = ln(s_ref[sl, :].astype(f32), enc_fs, enc_fb) * row_mask
        pooled_ref[pl.ds(wi, 1), :] = jnp.sum(nrm, axis=0, keepdims=True) / T

    for_windows(pool)

    # ---- latent heads -> decoder init token ----
    pooled = pooled_ref[:].astype(f32)                         # [Bt, Hp]
    if use_layernorm:
        pooled = ln(pooled, vae_ls, vae_lb, eps=_MODEL_LN_EPS)
    mu = mm(pooled, mu_w[:]) + mu_b[:]                         # [Bt, Zp]
    h0 = jnp.tanh(mm(mu, z2h_w[:]) + z2h_b[:])                 # [Bt, Hp]
    pooled_ref[:] = mm(h0, dec_in_w[:]) + dec_in_b[:]          # reuse as tok0

    def dec_init(wi, sl):
        t0 = pooled_ref[pl.ds(wi, 1), :]
        s_ref[sl, :] = (t0 + pos_ref[:]).astype(s_ref.dtype)

    for_windows(dec_init)
    for lay in dec_layers:
        block(lay)

    # ---- output head + residual/MSE epilogue (per window) ----
    def out_epilogue(wi, sl):
        nrm = ln(s_ref[sl, :].astype(f32), dec_fs, dec_fb)
        y = mm(nrm, out_w[:]) + out_b[:]                       # [Tp, Dp]
        r2 = ((x_ref[sl, :].astype(f32) - y) ** 2) * row_mask
        if resid_ref is not None:
            resid_ref[sl, :] = r2.astype(resid_ref.dtype)
        acc = jnp.sum(jnp.sum(r2, axis=0, keepdims=True), axis=1, keepdims=True)
        mse_ref[pl.ds(wi, 1), :] = acc / (T * d_real)

    for_windows(out_epilogue)


@functools.partial(
    jax.jit,
    static_argnames=("num_layers", "use_layernorm", "batch_tile", "dtype",
                     "io_dtype", "with_residual", "interpret", "emulate",
                     "mlp_ratio", "nt_dot", "stream", "chunk_windows",
                     "_ablate"),
)
def fused_attention_gate(
    params: Dict,
    Z: jax.Array,                 # [N, T, D] normalized windows
    *,
    num_layers: int = 2,
    use_layernorm: bool = True,
    batch_tile: int = 16,
    dtype=jnp.bfloat16,
    io_dtype=None,
    with_residual: bool = True,
    interpret: bool = False,
    emulate: bool = False,
    mlp_ratio: int = 4,
    nt_dot: bool = True,
    stream: bool | None = None,
    chunk_windows: int | None = None,
    _ablate: tuple = (),
) -> Tuple[jax.Array, jax.Array | None]:
    """Fused deterministic attention-VAE pass: (mse [N], residual [N,T,D] | None).

    Semantics match ``TemporalVAE(cell="attention").apply(..., sample=False)``
    plus the residual/MSE epilogue. ``dtype`` sets matmul-input and stream
    precision (f32 accumulation and softmax everywhere); ``io_dtype`` the
    window/residual HBM precision (defaults to ``Z.dtype``). ``stream``
    switches the attention inner loop to the flash-style online-softmax
    variant (per-head [Tp, 128] key blocks with running max/denominator; no
    packed score tensor or K/V concatenations) — mathematically identical
    softmax, float-level differences only. Default ``None`` auto-selects by
    shape: streaming ON for T > 128 (multiple key blocks — measured +7%
    gate-only at the openLAB T=200 shape on trained artifacts, 123.4k vs
    115.4k win/s at bt=16), OFF for T <= 128 where a single key block
    covers all keys and the online rescaling is pure overhead (measured
    −4..12% at the 4DOF T=100 shape; 100% decision agreement both ways —
    tools/probe_attention_stream.py, BENCHMARKS.md). Supported
    presets: hidden_dim a multiple of 32 up to 128 with the stack's default
    head packing (head_dim 32) — i.e. every ``VAEConfig(cell="attention")``
    preset (1DOF H=32, openLAB H=64, 4DOF H=128).

    ``chunk_windows`` sets how many windows each batched projection/MLP
    matmul covers (must divide ``batch_tile``; default: the largest
    divisor of ``batch_tile`` up to 16 with at most 2,048 rows per chunk —
    measured +13.6% gate-only at the 4DOF shape over the old fixed 4,
    bit-identical outputs; tools/probe_attention_breakdown.py). ``_ablate`` is
    PROBE-ONLY (tools/probe_attention_breakdown.py): a tuple of stage names
    ({"ln", "proj", "attn_mm", "softmax", "mlp"}) whose work is skipped so
    per-stage device time can be measured by differencing — ablated outputs
    are numerically WRONG by design; never set it outside timing probes.
    """
    weights, H, heads = attention_params_to_kernel_weights(
        params, num_layers, use_layernorm)
    if H % _HEAD_DIM or H > _HP:
        raise ValueError(f"fused_attention_gate supports hidden_dim multiples "
                         f"of {_HEAD_DIM} up to {_HP}, got {H}")
    if heads != max(1, H // _HEAD_DIM):
        raise ValueError(f"kernel assumes head_dim={_HEAD_DIM} packing "
                         f"(got {heads} heads at H={H})")
    if (mlp_ratio * H) % 128:
        raise ValueError(f"mlp width {mlp_ratio}*{H} must be a multiple of 128")
    N, T, D = Z.shape
    if D > _HP:
        raise ValueError(f"feature width {D} > {_HP} unsupported")
    Tp = _round_up(T, 128)
    if stream is None:
        stream = auto_stream(Tp)
    io_dtype = io_dtype or Z.dtype
    if not interpret:
        if batch_tile % 8:
            raise ValueError(f"batch_tile must be a multiple of 8 on the "
                             f"compiled path, got {batch_tile}")
    Bt = batch_tile
    # chunk width for the batched projection/MLP matmuls (windows per row
    # chunk). Default: the largest divisor of Bt up to 16 whose chunk
    # covers at most 2,048 rows — fewer, taller MXU ops over identical math
    # (row-partitioning a matmul leaves every row's dot products unchanged,
    # so outputs are BIT-identical across CW; pinned on-chip). Measured
    # +13.6% gate-only at the 4DOF shape (149.6k vs 131.7k win/s at bt=16:
    # cw=16 vs the old cw=4 — tools/probe_attention_breakdown.py, round 5).
    # The caps are VMEM-measured: cw=32 at bt=32/Tp=128 and cw=16 at
    # Tp=256 exceed the ~16 MB scoped-VMEM budget (the f32 pre-cast
    # projection/MLP temporaries scale with CW*Tp rows), so the row cap
    # pins every shape to the 2,048-row regime the win was measured in.
    if chunk_windows:
        CW = chunk_windows
    else:
        CW = max((d for d in (16, 8, 4, 2)
                  if Bt % d == 0 and d * Tp <= 2048), default=1)
    if Bt % CW:
        raise ValueError(f"chunk_windows={CW} must divide batch_tile={Bt}")
    Np = _round_up(max(N, 1), Bt)

    Zp = jnp.pad(Z, ((0, Np - N), (0, Tp - T), (0, _HP - D)))
    Zf = Zp.reshape(Np * Tp, _HP).astype(io_dtype)
    pos = _pad2(sinusoidal_positions(Tp, H), Tp, _HP).astype(jnp.float32)

    grid = (Np // Bt,)
    tile_in = pl.BlockSpec((Bt * Tp, _HP), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                       memory_space=pltpu.VMEM)
    w_specs = [const(x.shape) for x in weights]

    kernel = functools.partial(
        _kernel, T=T, Tp=Tp, H=H, heads=heads, num_layers=num_layers,
        use_layernorm=use_layernorm, mlp_ratio=mlp_ratio, d_real=D,
        dtype=dtype, emulate=emulate, Bt=Bt, CW=CW, nt_dot=nt_dot,
        stream=stream, ablate=frozenset(_ablate))

    mse_spec = pl.BlockSpec((Bt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    mse_shape = jax.ShapeDtypeStruct((Np, 1), jnp.float32)
    if with_residual:
        out_specs = (tile_in, mse_spec)
        out_shape = (jax.ShapeDtypeStruct((Np * Tp, _HP), io_dtype), mse_shape)
    else:
        out_specs = (mse_spec,)
        out_shape = (mse_shape,)

    scratch = [
        pltpu.VMEM((Bt * Tp, _HP), dtype),       # residual stream s
        pltpu.VMEM((Bt * Tp, 3 * _HP), dtype),   # packed QKV
        pltpu.VMEM((Bt * Tp, _HP), dtype),       # attention output
        pltpu.VMEM((Bt, _HP), jnp.float32),      # pooled summary / tok0
    ]

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[tile_in, const(pos.shape)] + w_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(Zf, pos, *weights)

    if with_residual:
        resid_f, mse = outs
        resid = resid_f.reshape(Np, Tp, _HP)[:N, :T, :D]
    else:
        (mse,) = outs
        resid = None
    return mse[:N, 0], resid


__all__ = ["fused_attention_gate", "attention_params_to_kernel_weights"]
