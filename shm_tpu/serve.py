"""Production serving surface for the hybrid gate->attribution pipeline.

The reference has no serving path at all — each evaluation script reloads
artifacts, rebuilds models, and loops on the host (e.g.
4DOF/Scripts/06_test_full_pipeline.py:276-314 reloads everything per run).
:class:`HybridScorer` is the deployment-shaped equivalent:

- artifacts load ONCE (params are ``device_put`` at construction — on the
  remote-tunneled platform a host-resident param tree re-uploads per call,
  measured 30k vs 171k win/s in bench.py);
- requests of ANY size run through a small set of power-of-two padded
  batch shapes ("buckets"), so a service sees a handful of compiles total
  instead of one per distinct request size (XLA recompiles per shape);
- :meth:`warmup` pre-compiles every bucket before traffic;
- scoring runs the fused Pallas VAE kernel on TPU and the XLA path
  elsewhere, both verified equivalent (tests/test_pipeline.py,
  tests/test_serve.py).

Example::

    scorer = HybridScorer.from_artifacts("data/4dof")
    scorer.warmup()
    out = scorer.score(windows)          # dict of numpy arrays
    out["y_pred"]                        # 0=Normal, 1=Sensor, 2=Structural

Multi-chip: pass ``mesh=shm_tpu.parallel.make_mesh(n)`` to shard each
request's batch over the mesh via ``shard_map`` (each device runs the full
pipeline — including the Pallas kernel — on its shard; equivalence pinned
on an 8-virtual-device mesh in tests/test_serve.py).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from shm_tpu.data.windows import make_windows
from shm_tpu.pipeline import concat_hybrid_outputs, make_hybrid_fn


def bucket_size(n: int, min_bucket: int, max_batch: int) -> int:
    """Smallest shape in the ``min_bucket * 2^k`` (capped at ``max_batch``)
    bucket series that fits ``n`` windows — the ONE padded-shape policy shared
    by :class:`HybridScorer` and :class:`shm_tpu.export.ExportedScorer`, so a
    request only ever dispatches shapes ``warmup()`` compiled."""
    b = min_bucket
    while b < n and b < max_batch:
        b *= 2
    return min(b, max_batch)


def bucket_series(min_bucket: int, max_batch: int) -> Sequence[int]:
    """Every padded batch shape the ``min_bucket * 2^k`` policy can dispatch
    — the enumeration half of the shared policy (``bucket_size`` is the
    sizing half); every scorer's ``buckets()``/``warmup()`` uses this ONE
    helper so warmed shapes can never drift from dispatched shapes."""
    out, b = [], min_bucket
    while b < max_batch:
        out.append(b)
        b *= 2
    out.append(max_batch)
    return out


def score_bucketed(fn, W: np.ndarray, min_bucket: int, max_batch: int,
                   ndim: int = 3) -> Dict[str, np.ndarray]:
    """Run ``fn(Wb) -> HybridOutputs`` over a batch-leading window stack in
    full ``max_batch`` batches plus one padded power-of-two bucket, trimming
    pad rows from the concatenated host outputs. ``ndim`` is the expected
    request rank (3 for (N, T, D) window stacks; 4 for the openLAB
    clean/raw-stacked (N, T, C, 2) requests)."""
    W = np.asarray(W, np.float32)
    if W.ndim != ndim:
        raise ValueError(f"expected a rank-{ndim} batch-leading window "
                         f"stack, got {W.shape}")
    N = W.shape[0]
    if N == 0:
        return {k: np.zeros((0,), np.float32) for k in
                ("mse", "anomalous", "y_pred", "p_struct")}
    outs, i = [], 0
    while i < N:
        n = min(max_batch, N - i)
        b = bucket_size(n, min_bucket, max_batch)
        Wb = W[i:i + n]
        if b != n:
            Wb = np.concatenate(
                [Wb, np.zeros((b - n,) + W.shape[1:], np.float32)])
        outs.append((fn(jnp.asarray(Wb)), n))
        i += n
    return concat_hybrid_outputs(outs)


class HybridScorer:
    """Artifact-loaded, bucket-batched scorer for the fused hybrid pipeline.

    ``use_fused_vae``: None (default) selects the Pallas kernel on TPU
    backends and the XLA path elsewhere. ``min_bucket``/``max_batch`` bound
    the padded batch shapes: a request of N windows runs in ceil(N /
    max_batch) full batches plus one power-of-two bucket for the remainder,
    so the compile-shape set is {min_bucket, 2*min_bucket, ..., max_batch}.
    """

    # calibrated healthy anomaly rate (set by from_artifacts from the
    # threshold manifest); serve_http's DriftMonitor baselines against it
    expected_anomaly_rate: Optional[float] = None
    # the percentile the loaded threshold was calibrated at (from the
    # manifest's "percentile"; None when hand-constructed) — the default
    # for serve_http's POST /recalibrate
    calibration_percentile: Optional[float] = None

    def __init__(self, vae_model, cnn_model, vae_params, cnn_variables,
                 mean, std, threshold: float, *,
                 use_fused_vae: Optional[bool] = None,
                 fused_dtype=jnp.bfloat16,
                 min_bucket: int = 256, max_batch: int = 8192,
                 mesh=None, seq_len: Optional[int] = None):
        if min_bucket < 1 or max_batch < min_bucket:
            raise ValueError("need 1 <= min_bucket <= max_batch")
        if use_fused_vae is None:
            from shm_tpu.ops import auto_fused_gate

            use_fused_vae = auto_fused_gate(vae_model)
        if mesh is not None:
            # multi-chip serving: each device runs the full pipeline on its
            # batch shard (shard_map — works with the Pallas kernel too,
            # which jit auto-partitioning cannot split). Buckets must divide
            # evenly across the mesh.
            n_dev = mesh.devices.size
            if min_bucket % n_dev or max_batch % n_dev:
                raise ValueError(
                    f"min_bucket/max_batch must be multiples of the mesh "
                    f"size ({n_dev}); got {min_bucket}/{max_batch}")
            from shm_tpu.parallel.mesh import make_dp_hybrid_shardmap

            sm = make_dp_hybrid_shardmap(vae_model, cnn_model, mesh,
                                         use_fused_vae=use_fused_vae,
                                         fused_dtype=fused_dtype)
            self._fn = (lambda vp, cv, W, mean, std, thr, key=None:
                        sm(vp, cv, W, mean, std, thr))
        else:
            self._fn = make_hybrid_fn(vae_model, cnn_model,
                                      use_fused_vae=use_fused_vae,
                                      fused_dtype=fused_dtype)
        self.mesh = mesh
        self.use_fused_vae = use_fused_vae
        # kept for introspection + AOT export (shm_tpu.export rebuilds the
        # portable XLA program from the same models/params)
        self.vae_model = vae_model
        self.cnn_model = cnn_model
        self.vae_params = jax.device_put(vae_params)
        self.cnn_variables = jax.device_put(cnn_variables)
        self.mean = jnp.asarray(mean)
        self.std = jnp.asarray(std)
        self.threshold = jnp.float32(threshold)
        self.min_bucket = int(min_bucket)
        self.max_batch = int(max_batch)
        self._series_fns: Dict[int, object] = {}   # stride -> jitted series fn
        # the window length this scorer serves; warmup() must compile the
        # shapes live traffic will dispatch, so T flows from the config/
        # artifacts (an openLAB-preset scorer serves T=200, not 100)
        self.seq_len = int(seq_len) if seq_len is not None else None

    @property
    def num_features(self) -> int:
        """Feature width D this scorer serves — the scorer-surface attribute
        shared with :class:`shm_tpu.export.ExportedScorer` (the HTTP daemon
        and DynamicBatcher introspect D through it, not through ``mean``)."""
        return int(np.asarray(self.mean).shape[-1])

    # ------------------------------------------------------------------
    @classmethod
    def from_artifacts(cls, root: str | Path, cfg=None, **kw) -> "HybridScorer":
        """Load the 4DOF artifact layout written by ``cli/stage4dof``
        (``models/*.msgpack``, ``processed/normal_stats.npz``,
        ``processed/vae_threshold.json``)."""
        from shm_tpu.cli.stage4dof import Paths, _load_stats, _load_vae
        from shm_tpu.config import Stage4DofConfig
        from shm_tpu.models import CNN4DOF
        from shm_tpu.utils.checkpoint import load_params
        from shm_tpu.utils.io import load_json

        cfg = cfg or Stage4DofConfig()
        paths = Paths(str(root))
        # NOTE: artifacts trained with --cell min_gru load transparently —
        # _load_vae reads the recurrence family from the training meta
        # manifest (the param trees differ, so a mismatch could not restore)
        mean, std = _load_stats(paths)
        vae, vae_params = _load_vae(paths, cfg)
        from shm_tpu.models.cnn import inference_conv_impl

        # bf16 CNN compute: serving default (MXU-friendly); the f32-evaluated
        # CLI path (cli/stage4dof.py cmd_test_pipeline) and this bf16 path are
        # equivalence-tested on the trained artifacts in tests/test_serve.py
        # (gate decision + 3-class prediction agreement). Native lax.conv on
        # TPU (+28% device-side, identical param tree/predictions).
        cnn = CNN4DOF(dropout=cfg.cnn.dropout,
                      dtype=kw.pop("cnn_dtype", jnp.bfloat16),
                      conv_impl=kw.pop("conv_impl", None) or inference_conv_impl())
        template = cnn.init({"params": jax.random.PRNGKey(0)},
                            jnp.zeros((2, cfg.seq_len, cfg.num_features, 2)))
        cnn_vars = load_params(template, paths.models / "cnn.msgpack")
        thr_meta = load_json(paths.processed / "vae_threshold.json")
        kw.setdefault("seq_len", cfg.seq_len)
        scorer = cls(vae, cnn, vae_params, cnn_vars, mean, std,
                     float(thr_meta["threshold"]), **kw)
        from shm_tpu.monitor import expected_rate_from_threshold_meta

        scorer.expected_anomaly_rate = expected_rate_from_threshold_meta(
            thr_meta)
        pct = thr_meta.get("percentile")
        scorer.calibration_percentile = None if pct is None else float(pct)
        return scorer

    def set_threshold(self, threshold: float) -> None:
        """Swap the gate threshold in place (live recalibration). The
        threshold rides every dispatch as an ARGUMENT, so no recompiles —
        but it must stay the committed jnp.float32 scalar: a bare Python
        float is weakly-typed and would retrace every warmed bucket."""
        self.threshold = jnp.float32(float(threshold))

    # ------------------------------------------------------------------
    def _bucket(self, n: int) -> int:
        # walk the SAME min_bucket * 2^k series buckets()/warmup enumerate —
        # a pure next-power-of-two here would dispatch shapes warmup never
        # compiled (and could break mesh divisibility) whenever min_bucket
        # is not itself a power of two.
        return bucket_size(n, self.min_bucket, self.max_batch)

    def buckets(self) -> Sequence[int]:
        """Every padded batch shape this scorer can dispatch."""
        return bucket_series(self.min_bucket, self.max_batch)

    def warmup(self, batch_sizes: Optional[Sequence[int]] = None,
               seq_len: Optional[int] = None,
               num_features: Optional[int] = None) -> None:
        """Compile every bucket shape before serving traffic. Shapes are
        inferred from the scorer's ``seq_len`` (set by ``from_artifacts`` from
        the stage config) and the mean/std feature dim unless given explicitly."""
        D = num_features or int(self.mean.shape[-1])
        T = seq_len or self.seq_len
        if T is None:
            raise ValueError(
                "warmup() needs the serving window length: construct the "
                "scorer with seq_len=, use from_artifacts(), or pass seq_len= "
                "here — warming a guessed T would compile shapes live traffic "
                "never dispatches and recompile (30s-5min/shape) on the first "
                "real request")
        for b in (batch_sizes or self.buckets()):
            W = np.zeros((b, T, D), np.float32)
            out = self._fn(self.vae_params, self.cnn_variables,
                           jnp.asarray(W), self.mean, self.std, self.threshold)
            np.asarray(out.mse)          # force completion (readback)

    # ------------------------------------------------------------------
    def _series_fn(self, stride: int):
        """Jitted series scorer for one stride: windowize ON DEVICE (one
        gather) then run the hybrid — the series upload is ~seq_len/stride x
        smaller than the equivalent window-stack upload, which is the
        request-latency floor on remote-attached TPUs."""
        fn = self._series_fns.get(stride)
        if fn is None:
            T, inner = self.seq_len, self._fn

            @jax.jit
            def fn(vp, cv, xs, mean, std, thr):
                return inner(vp, cv, make_windows(xs, T, stride),
                             mean, std, thr)

            self._series_fns[stride] = fn
        return fn

    def warmup_series(self, stride: int = 1,
                      batch_sizes: Optional[Sequence[int]] = None) -> None:
        """Pre-compile the series-scoring buckets for ``stride`` (same
        window-count bucket set as :meth:`warmup`)."""
        if self.mesh is not None:
            raise ValueError(
                "mesh scorers windowize on the host and dispatch through the "
                "windows path (score_series falls back to score()) — there "
                "are no series programs to warm; call warmup() instead")
        if self.seq_len is None:
            raise ValueError("series scoring needs seq_len (see warmup())")
        D = int(self.mean.shape[-1])
        fn = self._series_fn(stride)
        for b in (batch_sizes or self.buckets()):
            xs = np.zeros(((b - 1) * stride + self.seq_len, D), np.float32)
            out = fn(self.vae_params, self.cnn_variables, jnp.asarray(xs),
                     self.mean, self.std, self.threshold)
            np.asarray(out.mse)

    def score_series(self, x: np.ndarray, stride: int = 1) -> Dict[str, np.ndarray]:
        """Score every sliding window of a raw (T_total, D) series.

        Windows are built ON DEVICE inside the compiled program (one gather),
        so a request uploads the series itself — ~seq_len/stride x fewer
        bytes than ``score(make_windows(x))`` (for the 4DOF stride-1 recipe:
        48 KB per run instead of 4.3 MB). Output arrays have one entry per
        window, identical to the windows path (equivalence pinned in
        tests/test_serve.py). Requests longer than ``max_batch`` windows are
        split into overlapping series chunks; padded window-count buckets
        reuse :meth:`buckets`. With ``mesh=`` the batch-sharded windows path
        is used instead (host windowing), same outputs.
        """
        x = np.asarray(x, np.float32)
        if x.ndim != 2:
            raise ValueError(f"expected a (T_total, D) series, got {x.shape}")
        if self.seq_len is None:
            raise ValueError("series scoring needs seq_len: construct with "
                             "seq_len= or use from_artifacts()")
        if stride < 1:
            raise ValueError(f"stride must be >= 1, got {stride}")
        T = self.seq_len
        L = x.shape[0]
        n = (L - T) // stride + 1 if L >= T else 0
        if n <= 0:
            return {k: np.zeros((0,), np.float32) for k in
                    ("mse", "anomalous", "y_pred", "p_struct")}
        if self.mesh is not None:
            # same windowing helper as the jitted series program below —
            # hand-rolled indexing here could silently diverge from it
            W = np.asarray(make_windows(jnp.asarray(x), T, stride))
            return self.score(W)

        fn = self._series_fn(stride)
        outs, i = [], 0
        while i < n:
            m = min(self.max_batch, n - i)
            b = self._bucket(m)
            Lp = (b - 1) * stride + T            # padded-series length
            seg = x[i * stride: i * stride + (m - 1) * stride + T]
            if seg.shape[0] < Lp:
                seg = np.concatenate(
                    [seg, np.zeros((Lp - seg.shape[0], x.shape[1]), np.float32)])
            o = fn(self.vae_params, self.cnn_variables, jnp.asarray(seg),
                   self.mean, self.std, self.threshold)
            outs.append((o, m))
            i += m
        return concat_hybrid_outputs(outs)

    # ------------------------------------------------------------------
    def score(self, W: np.ndarray) -> Dict[str, np.ndarray]:
        """Score an (N, T, D) raw window stack; returns numpy arrays
        ``mse/anomalous/y_pred/p_struct`` of length N. Requests are split
        into full ``max_batch`` batches + one power-of-two bucket."""
        return score_bucketed(
            lambda Wb: self._fn(self.vae_params, self.cnn_variables, Wb,
                                self.mean, self.std, self.threshold),
            W, self.min_bucket, self.max_batch)


class StreamScorer:
    """Stateful incremental scoring of a continuous sensor stream.

    The deployment shape of structural monitoring: sensors deliver samples
    continuously and each sliding window must be scored as soon as its last
    sample arrives. ``push(samples)`` buffers on the host, scores every
    newly-complete window through the wrapped scorer's warmed programs
    (``score_series`` — on-device windowizing on the same compiled bucket
    set), and retains only the sample tail the next window still needs, so
    memory stays O(seq_len) regardless of stream length.

    Outputs carry ``window_start`` — the global sample index each window
    begins at — so downstream alerting can localize an anomaly in stream
    time. Feeding a series chunk-by-chunk produces EXACTLY the outputs of
    ``score_series`` on the whole series (pinned in tests/test_serve.py),
    independent of how the stream is chunked.

    The reference has no streaming path (every evaluation script scores a
    complete file after the fact — e.g. 4DOF/Scripts/06_test_full_pipeline
    .py:276-314); this subsystem is deployment-native by design.

    ``monitor``: drift detection on the stream's gate decisions
    (:class:`shm_tpu.monitor.DriftMonitor`). The default ``"auto"`` attaches
    one when the wrapped scorer knows its calibrated healthy anomaly rate
    (loaded via ``from_artifacts``); pass a ``DriftMonitor`` to share/tune
    one, or ``None`` to disable. Every ``push`` folds the newly-scored
    windows in stream order, so ``self.monitor.snapshot()`` is the live
    drift state; because the monitor's batch updates are chunking-invariant,
    the state is independent of how the stream arrives — the same contract
    the scoring outputs keep. ``reset()`` does NOT clear the monitor: drift
    history tracks the model/threshold, which outlives any one stream
    (call ``monitor.reset()`` after recalibration).
    """

    def __init__(self, scorer: HybridScorer, stride: int = 1,
                 monitor="auto"):
        if scorer.seq_len is None:
            raise ValueError("streaming needs seq_len: construct the scorer "
                             "with seq_len= or use from_artifacts()")
        if stride < 1:
            raise ValueError(f"stride must be >= 1, got {stride}")
        if isinstance(monitor, str):
            if monitor != "auto":
                raise ValueError(f"monitor must be 'auto', None, or a "
                                 f"DriftMonitor, got {monitor!r}")
            rate = getattr(scorer, "expected_anomaly_rate", None)
            if rate is not None:
                from shm_tpu.monitor import DriftMonitor

                monitor = DriftMonitor(rate)
            else:
                monitor = None
        self.monitor = monitor
        self.scorer = scorer
        self.stride = int(stride)
        self._D = int(np.asarray(scorer.mean).shape[-1])
        # invariant: the NEXT unscored window starts ``_skip`` samples past
        # _buf[0] (``_skip`` > 0 only with stride > seq_len, where the gap
        # samples between windows may not have arrived yet)
        self._buf = np.zeros((0, self._D), np.float32)
        self._next_start = 0          # global index of that window start
        self._skip = 0                # gap samples still to drop on arrival

    @property
    def buffered_samples(self) -> int:
        return int(self._buf.shape[0])

    def push(self, x: np.ndarray) -> Dict[str, np.ndarray]:
        """Feed ``(n, D)`` new samples; score every window they complete.

        Returns the usual output arrays plus ``window_start``; all arrays
        are empty until a window completes.
        """
        x = np.asarray(x, np.float32)
        if x.ndim != 2 or x.shape[1] != self._D:
            raise ValueError(f"expected (n, {self._D}) samples, "
                             f"got {x.shape}")
        if self._skip and x.shape[0]:
            # stride > seq_len: the previous push consumed gap samples that
            # had not arrived yet — drop them as they come in
            d = min(self._skip, x.shape[0])
            x = x[d:]
            self._skip -= d
        self._buf = np.concatenate([self._buf, x]) if x.shape[0] else self._buf
        T, s = self.scorer.seq_len, self.stride
        L = self._buf.shape[0]
        n = (L - T) // s + 1 if L >= T and not self._skip else 0
        starts = self._next_start + s * np.arange(n)
        if n == 0:
            out = {k: np.zeros((0,), np.float32)
                   for k in ("mse", "anomalous", "y_pred", "p_struct")}
        else:
            out = self.scorer.score_series(self._buf[: (n - 1) * s + T],
                                           stride=s)
            consumed = n * s              # can exceed L when stride > seq_len
            drop = min(consumed, L)
            self._buf = self._buf[drop:]
            self._skip = consumed - drop
            self._next_start += consumed
        out["window_start"] = starts
        if self.monitor is not None and out["anomalous"].size:
            self.monitor.update(out["anomalous"])
        return out

    def reset(self) -> None:
        """Drop buffered samples and restart stream indexing at 0."""
        self._buf = np.zeros((0, self._D), np.float32)
        self._next_start = 0
        self._skip = 0


__all__ = ["HybridScorer", "StreamScorer", "bucket_size", "bucket_series",
           "score_bucketed"]
