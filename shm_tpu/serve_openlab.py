"""Production serving for the openLAB (real bridge data) hybrid pipeline.

The reference's openLAB deployment story is batch scripts that reload every
artifact per run (Codes/10_test_hybrid_pipeline.py:300-453: joblib/torch
loads, host gather of anomalous windows, per-model loops). This module is
the load-once serving counterpart of :class:`shm_tpu.serve.HybridScorer`
for the bridge stage: a fused gate→stage-2 program over extracted window
pairs, bucket-batched to a bounded compile-shape set.

Pipeline semantics (identical to ``cli/openlab.py::cmd_test_hybrid``):

- **Gate**: standardize-clip the CLEAN windows' gate channels
  (``manifest["channels_idx"]``, Codes/04_train_vae.py:106-117), score
  per-window reconstruction MSE with the 1-layer temporal VAE, flag
  ``mse > threshold`` (strict, Codes/05_validate_vae.py).
- **Stage-2** (anomalous windows only): either the openLAB CNN on
  standardize-clipped RAW windows (``prob_st >= cnn_threshold`` →
  Structural, else Sensor; Codes/10_test_hybrid_pipeline.py:352-371), or
  one of the five classical models on the 76-dim feature vectors — scored
  ON DEVICE via the exported tree/SVM arrays (:mod:`shm_tpu.models
  .forest_jax` / :mod:`shm_tpu.models.svm_jax`).

TPU-native design: the CNN mode runs gate + stage-2 as ONE jit program per
bucket shape — the reference's host gather/scatter of anomalous windows
becomes masked fixed-shape compute (cheaper on TPU than dynamic shapes, and
it keeps the whole request on-device). The gate pass auto-routes through
the gate-only Pallas kernel on TPU (``with_residual=False`` — the openLAB
CNN consumes raw windows, not residuals, so nothing else needs the HBM
round-trip).

Request format: ONE ``(N, seq_len, channels, 2)`` float32 tensor with the
extraction stage's clean windows at ``[..., 0]`` and raw windows at
``[..., 1]`` (cleaning is a per-RUN cascade — ``data/openlab.py::
clean_openlab_and_rule`` — so it belongs to extraction, not the per-window
scorer). ``score_pair(Xc, Xr)`` accepts the two stacks separately; ML modes
take the per-window feature matrix as a third input.

Example::

    scorer = OpenLabScorer.from_artifacts("data/openlab")     # CNN stage-2
    out = scorer.score_pair(Xc[idx], Xr[idx])                 # dicts like
    rf = OpenLabScorer.from_artifacts("data/openlab", stage2="rf")
    out = rf.score_pair(Xc[idx], Xr[idx], features=X_feat[idx])

Label convention: 0 = Normal, 1 = Sensor Fault, 2 = Structural Fault.
Equivalence with ``cmd_test_hybrid`` is pinned in tests/test_serve_openlab.py.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from shm_tpu.pipeline import HybridOutputs
from shm_tpu.serve import bucket_series, score_bucketed

#: stage-2 models scorable on device (Codes/08_train_ml_baselines.py zoo)
ML_STAGE2 = ("cart", "rf", "gb", "hgb", "svm_rbf")


def stack_pair(Xc: np.ndarray, Xr: np.ndarray) -> np.ndarray:
    """Stack clean/raw window stacks into the (N, T, C, 2) request tensor —
    the ONE pairing helper shared by :class:`OpenLabScorer` and
    :class:`shm_tpu.export.ExportedScorer` (shape mismatch raises here)."""
    Xc = np.asarray(Xc, np.float32)
    Xr = np.asarray(Xr, np.float32)
    if Xc.shape != Xr.shape:
        raise ValueError(f"clean/raw shapes differ: {Xc.shape} vs {Xr.shape}")
    return np.stack([Xc, Xr], axis=-1)


def standardize_clip_device(X: jax.Array, mu: jax.Array, sd: jax.Array,
                            clip_z: float) -> jax.Array:
    """In-jit mirror of ``cli/openlab.py::standardize_clip`` (Codes/
    04_train_vae.py:106-117): (X - mu)/sd, clip to ±clip_z, non-finite → 0."""
    Z = (X - mu[None, None, :]) / sd[None, None, :]
    Z = jnp.clip(Z, -clip_z, clip_z)
    return jnp.nan_to_num(Z, nan=0.0, posinf=0.0, neginf=0.0).astype(jnp.float32)


class OpenLabScorer:
    """Load-once, bucket-batched scorer for the openLAB hybrid.

    ``stage2="cnn"`` (default) builds the fully fused gate+CNN program;
    ``stage2`` in :data:`ML_STAGE2` scores the gate on device and the
    classical model on device from caller-provided features (the 76-dim
    featurizer runs host-side at extraction time, mirroring the reference's
    ``Codes/03_featurize.py`` artifact flow).
    """

    # calibrated healthy anomaly rate (set by from_artifacts from the
    # threshold manifest); serve_http's DriftMonitor baselines against it
    expected_anomaly_rate: Optional[float] = None
    # percentile the loaded threshold was calibrated at (manifest
    # "percentile"); default for serve_http's POST /recalibrate
    calibration_percentile: Optional[float] = None

    def __init__(self, vae_model, vae_params, gate_mu, gate_sd, ch_idx,
                 clip_z: float, vae_threshold: float, *,
                 stage2: str = "cnn",
                 cnn_model=None, cnn_variables=None, cnn_mu=None, cnn_sd=None,
                 stage2_threshold: Optional[float] = None,
                 ml_predict=None,
                 min_bucket: int = 256, max_batch: int = 8192,
                 seq_len: Optional[int] = None,
                 num_channels: Optional[int] = None,
                 use_fused_gate: Optional[bool] = None,
                 gate_interpret: bool = False,
                 gate_io_dtype=jnp.bfloat16,
                 mesh=None):
        if min_bucket < 1 or max_batch < min_bucket:
            raise ValueError("need 1 <= min_bucket <= max_batch")
        if mesh is not None:
            # multi-chip serving: shard_map over the request batch axis —
            # each device runs the full gate(+CNN) program on its shard
            # (works with the Pallas gate kernel too; same rationale as
            # HybridScorer/make_dp_hybrid_shardmap). Buckets must divide
            # evenly across the mesh.
            n_dev = mesh.devices.size
            if min_bucket % n_dev or max_batch % n_dev:
                raise ValueError(
                    f"min_bucket/max_batch must be multiples of the mesh "
                    f"size ({n_dev}); got {min_bucket}/{max_batch}")
        if stage2 != "cnn" and stage2 not in ML_STAGE2:
            raise ValueError(f"unknown stage2 {stage2!r}; "
                             f"expected 'cnn' or one of {ML_STAGE2}")
        if stage2 == "cnn" and (cnn_model is None or cnn_variables is None):
            raise ValueError("stage2='cnn' needs cnn_model and cnn_variables")
        if stage2 != "cnn" and ml_predict is None:
            raise ValueError(f"stage2={stage2!r} needs ml_predict "
                             "(use from_artifacts)")
        if stage2_threshold is None:
            raise ValueError("stage2_threshold is required (cnn_best_threshold"
                             ".npy / <ml>_threshold.npy)")
        self.stage2 = stage2
        self.vae_model = vae_model
        self.vae_params = jax.device_put(vae_params)
        self.cnn_model = cnn_model
        self.cnn_variables = (jax.device_put(cnn_variables)
                              if cnn_variables is not None else None)
        self.gate_mu = jnp.asarray(gate_mu, jnp.float32)
        self.gate_sd = jnp.asarray(gate_sd, jnp.float32)
        self.cnn_mu = (jnp.asarray(cnn_mu, jnp.float32)
                       if cnn_mu is not None else None)
        self.cnn_sd = (jnp.asarray(cnn_sd, jnp.float32)
                       if cnn_sd is not None else None)
        self.ch_idx = tuple(int(i) for i in ch_idx)
        self.clip_z = float(clip_z)
        self.threshold = float(vae_threshold)
        self.stage2_threshold = float(stage2_threshold)
        self._ml_predict = ml_predict
        self.min_bucket = int(min_bucket)
        self.max_batch = int(max_batch)
        self.seq_len = int(seq_len) if seq_len is not None else None
        self.num_channels = (int(num_channels) if num_channels is not None
                             else None)
        if use_fused_gate is None:
            # the shared auto policy (gate-only Pallas kernel on TPU)
            from shm_tpu.ops import auto_fused_gate

            use_fused_gate = auto_fused_gate(vae_model)
        self.use_fused_gate = bool(use_fused_gate)
        # interpret lowering + io dtype exist so the fused-gate WIRING is
        # testable off-TPU (same precedent as make_hybrid_fn's
        # fused_interpret; the compiled bf16 kernel numerics are certified
        # on the chip — BENCHMARKS.md openLAB serving section)
        self.gate_interpret = bool(gate_interpret)
        self.gate_io_dtype = gate_io_dtype
        self.mesh = mesh
        self._fn = self._build_fn()
        self.use_fused_vae = self.use_fused_gate

    #: request tensor rank — the HTTP daemon validates (N, T, C, 2) bodies
    #: for this scorer instead of the default (N, T, D) window stacks
    request_rank = 4

    # ------------------------------------------------------------------
    @property
    def num_features(self) -> int:
        """Channel count C of the (N, T, C, 2) request tensor."""
        if self.num_channels is None:
            raise ValueError("scorer was built without num_channels")
        return self.num_channels

    def _gate_mse(self, vae_params, Zg):
        if self.use_fused_gate:
            cell = getattr(self.vae_model, "cell", "lstm")
            if cell == "min_gru":
                from shm_tpu.ops import fused_mingru_gate as gate_fn
            elif cell == "attention":
                from shm_tpu.ops import fused_attention_gate as gate_fn
            else:
                from shm_tpu.ops import fused_vae_gate as gate_fn
            extra = dict(interpret=self.gate_interpret,
                         emulate=self.gate_interpret)
            if self.gate_interpret:
                # interpret lowering executes on the host backend: emulate=
                # rounds matmul inputs to the compute dtype but dots in f32
                # (XLA-CPU lacks a bf16 dot thunk for some shapes), and the
                # compute dtype follows the io dtype so the wiring test can
                # pin near-exact f32 agreement against the XLA gate
                extra["dtype"] = self.gate_io_dtype
            mse, _ = gate_fn(vae_params, Zg,
                             num_layers=self.vae_model.num_layers,
                             use_layernorm=self.vae_model.use_layernorm,
                             with_residual=False,
                             io_dtype=self.gate_io_dtype, **extra)
            return mse
        recon, _, _ = self.vae_model.apply(
            {"params": vae_params}, Zg, sample=False)
        return ((Zg - recon) ** 2).mean(axis=(1, 2))

    def _wrap(self, local, n_batch_args: int):
        """jit ``local``, sharding the batch-leading arg over the mesh when
        one is configured (every other arg replicated)."""
        if self.mesh is None:
            return jax.jit(local)
        from jax.sharding import PartitionSpec as P

        n_args = local.__code__.co_argcount
        in_specs = tuple(P("data") if i == n_batch_args else P()
                         for i in range(n_args))
        out_specs = jax.tree_util.tree_map(lambda _: P("data"),
                                           self._out_spec_template())
        sm = jax.shard_map(local, mesh=self.mesh, in_specs=in_specs,
                           out_specs=out_specs, check_vma=False)
        return jax.jit(sm)

    def _out_spec_template(self):
        # pytree structure of the local fn's outputs, for out_specs mapping
        if self.stage2 == "cnn":
            return HybridOutputs(mse=0, anomalous=0, y_pred=0, p_struct=0,
                                 logits=0)
        return (0, 0)

    def _build_fn(self):
        # params/stats ride as ARGUMENTS (closure constants re-stage per call
        # on this platform — repo convention); only static config is closed
        # over
        ch = jnp.asarray(self.ch_idx, jnp.int32)
        clip_z = self.clip_z

        if self.stage2 == "cnn":
            def fn(vae_params, cnn_variables, X, gmu, gsd, cmu, csd,
                   thr, thr2):
                # X: (b, T, C, 2) stacked [clean, raw]
                Xc, Xr = X[..., 0], X[..., 1]
                Zg = standardize_clip_device(Xc[:, :, ch], gmu, gsd, clip_z)
                mse = self._gate_mse(vae_params, Zg)
                anom = mse > thr                              # strict >
                Za = standardize_clip_device(Xr, cmu, csd, clip_z)[..., None]
                logits = self.cnn_model.apply(cnn_variables, Za, train=False)
                p_st = jax.nn.softmax(logits, axis=1)[:, 1]
                y3 = jnp.where(anom,
                               jnp.where(p_st >= thr2, 2, 1).astype(jnp.int32),
                               0)
                return HybridOutputs(
                    mse=mse, anomalous=anom, y_pred=y3,
                    p_struct=jnp.where(anom, p_st, 0.0), logits=logits)
            return self._wrap(fn, n_batch_args=2)

        def gate_fn(vae_params, X, gmu, gsd, thr):
            Xc = X[..., 0]
            Zg = standardize_clip_device(Xc[:, :, ch], gmu, gsd, clip_z)
            mse = self._gate_mse(vae_params, Zg)
            return mse, mse > thr
        return self._wrap(gate_fn, n_batch_args=1)

    # ------------------------------------------------------------------
    @classmethod
    def from_artifacts(cls, root: str | Path, cfg=None, *,
                       stage2: str = "cnn", host_ml: bool = False,
                       **kw) -> "OpenLabScorer":
        """Load the openLAB artifact layout written by ``cli/openlab``
        (``output/VAE_Training``, ``.../CNN_Training``, ``.../ML_Baselines``).

        ``stage2`` picks the attribution model; ML names load the joblib
        and export it for on-device scoring (``host_ml=True`` keeps sklearn
        ``predict_proba`` — the validation escape hatch, same flag as the
        CLI's ``test-hybrid --host-ml``)."""
        from shm_tpu.cli.openlab import (Paths, _load_openlab_cnn,
                                         _load_openlab_vae)
        from shm_tpu.config import OpenLabConfig
        from shm_tpu.utils.io import load_json

        cfg = cfg or OpenLabConfig()
        conv_impl = kw.pop("conv_impl", None)
        paths = Paths(str(root), raw_dir="")
        model, params, mu, sd, manifest = _load_openlab_vae(paths, cfg)
        thr_meta = load_json(paths.vae_val_dir / "artifacts"
                             / "vae_threshold.json")
        common = dict(ch_idx=manifest["channels_idx"],
                      clip_z=cfg.standardize_clip,
                      vae_threshold=float(thr_meta["threshold"]),
                      seq_len=cfg.seq_len, num_channels=cfg.cnn.num_features)
        common.update(kw)

        if stage2 == "cnn":
            cnn_model, cnn_vars, cmu, csd = _load_openlab_cnn(
                paths, cfg, conv_impl=conv_impl)
            thr2 = float(np.load(paths.cnn_val_dir / "artifacts"
                                 / "cnn_best_threshold.npy").ravel()[0])
            scorer = cls(model, params, mu, sd, stage2="cnn",
                         cnn_model=cnn_model, cnn_variables=cnn_vars,
                         cnn_mu=cmu, cnn_sd=csd, stage2_threshold=thr2,
                         **common)
        else:
            if stage2 not in ML_STAGE2:
                raise ValueError(f"unknown stage2 {stage2!r}")
            if conv_impl is not None:
                raise ValueError("conv_impl applies only to stage2='cnn' "
                                 f"(got stage2={stage2!r})")
            import joblib

            mdl = joblib.load(paths.ml_dir / "artifacts" / f"{stage2}.joblib")
            thr2 = float(np.load(paths.ml_dir / "artifacts"
                                 / f"{stage2}_threshold.npy").ravel()[0])
            ml_predict = cls._make_ml_predict(stage2, mdl, host_ml)
            scorer = cls(model, params, mu, sd, stage2=stage2,
                         ml_predict=ml_predict, stage2_threshold=thr2,
                         **common)
        from shm_tpu.monitor import expected_rate_from_threshold_meta

        scorer.expected_anomaly_rate = expected_rate_from_threshold_meta(
            thr_meta)
        pct = thr_meta.get("percentile")
        scorer.calibration_percentile = None if pct is None else float(pct)
        return scorer

    def set_threshold(self, threshold: float) -> None:
        """Swap the gate threshold in place (live recalibration): here it is
        a host float that ``_dispatch`` wraps per call, so the swap is a
        plain attribute write — no recompiles."""
        self.threshold = float(threshold)

    @staticmethod
    def _make_ml_predict(name: str, mdl, host_ml: bool):
        """p(structural) for a feature matrix — on-device exported arrays by
        default, sklearn's own predict_proba with ``host_ml=True``. Same
        dispatch as cli/openlab.py::cmd_test_hybrid."""
        if host_ml:
            from shm_tpu.models.ml import get_prob_st
            return lambda F: np.asarray(get_prob_st(mdl, F), np.float64)

        from shm_tpu.models.forest_jax import transform_features

        if name == "svm_rbf":
            from sklearn.calibration import CalibratedClassifierCV
            from sklearn.pipeline import Pipeline

            from shm_tpu.models.svm_jax import (
                calibrated_svm_predict_proba, export_calibrated_svm,
                export_svm, svm_predict_proba)

            clf = mdl.steps[-1][1] if isinstance(mdl, Pipeline) else mdl
            if isinstance(clf, CalibratedClassifierCV):
                ex = export_calibrated_svm(mdl)
                return lambda F: np.asarray(
                    calibrated_svm_predict_proba(ex, transform_features(mdl, F)),
                    np.float64)
            ex = export_svm(mdl)
            return lambda F: np.asarray(
                svm_predict_proba(ex, transform_features(mdl, F)), np.float64)

        from shm_tpu.models.forest_jax import (ensemble_predict_proba,
                                               export_ensemble)

        ex = export_ensemble(mdl)
        return lambda F: np.asarray(
            ensemble_predict_proba(ex, transform_features(mdl, F)), np.float64)

    # ------------------------------------------------------------------
    def buckets(self) -> Sequence[int]:
        return bucket_series(self.min_bucket, self.max_batch)

    def warmup(self, batch_sizes: Optional[Sequence[int]] = None) -> None:
        """Compile every bucket shape before serving traffic."""
        if self.seq_len is None or self.num_channels is None:
            raise ValueError("warmup() needs seq_len and num_channels "
                             "(from_artifacts sets both)")
        for b in (batch_sizes or self.buckets()):
            X = np.zeros((b, self.seq_len, self.num_channels, 2), np.float32)
            out = self._dispatch(jnp.asarray(X))
            np.asarray(out.mse)          # force completion (readback)

    def warmup_series(self, stride: int = 1, batch_sizes=None) -> None:
        """openLAB serving has no raw-series endpoint (cleaning is a per-run
        cascade that lives in extraction); kept for daemon-surface parity."""
        if stride < 1:
            raise ValueError(f"stride must be >= 1, got {stride}")

    def _dispatch(self, Xb) -> HybridOutputs:
        thr = jnp.float32(self.threshold)
        if self.stage2 == "cnn":
            return self._fn(self.vae_params, self.cnn_variables, Xb,
                            self.gate_mu, self.gate_sd, self.cnn_mu,
                            self.cnn_sd, thr,
                            jnp.float32(self.stage2_threshold))
        mse, anom = self._fn(self.vae_params, Xb, self.gate_mu, self.gate_sd,
                             thr)
        b = Xb.shape[0]
        return HybridOutputs(mse=mse, anomalous=anom,
                             y_pred=jnp.zeros((b,), jnp.int32),
                             p_struct=jnp.zeros((b,), jnp.float32),
                             logits=jnp.zeros((b, 2), jnp.float32))

    # ------------------------------------------------------------------
    def score(self, X: np.ndarray,
              features: Optional[np.ndarray] = None) -> Dict[str, np.ndarray]:
        """Score an ``(N, seq_len, channels, 2)`` stacked [clean, raw] window
        tensor; returns ``mse/anomalous/y_pred/p_struct`` length-N arrays.
        ML stage-2 modes require ``features`` (N, 76) aligned row-for-row."""
        X = np.asarray(X, np.float32)
        if X.ndim != 4 or X.shape[-1] != 2:
            raise ValueError("expected (N, seq_len, channels, 2) stacked "
                             f"[clean, raw] windows, got {X.shape}")
        if self.stage2 != "cnn":
            if features is None:
                raise ValueError(f"stage2={self.stage2!r} needs features=")
            features = np.asarray(features, np.float32)
            if features.shape[0] != X.shape[0]:
                raise ValueError(f"features rows {features.shape[0]} != "
                                 f"windows {X.shape[0]}")
        out = score_bucketed(self._dispatch, X, self.min_bucket,
                             self.max_batch, ndim=4)
        if self.stage2 == "cnn" or X.shape[0] == 0:
            return out
        # classical stage-2: score ONLY the gated windows (their row count is
        # data-dependent — classical models are cheap and fixed-shape padding
        # buys nothing without a compiled program per bucket)
        anom = out["anomalous"].astype(bool)
        y3 = np.zeros(X.shape[0], np.int32)       # dtype matches the CNN
        p = np.zeros(X.shape[0], np.float64)      # mode's device outputs
        if anom.any():
            p_st = self._ml_predict(features[anom])
            y3[anom] = np.where(p_st >= self.stage2_threshold, 2, 1)
            p[anom] = p_st
        out["y_pred"] = y3
        out["p_struct"] = p.astype(np.float32)
        return out

    def export_program(self):
        """A jitted ``f(X) -> HybridOutputs-tuple`` with every weight,
        statistic, and threshold closed over as a program constant — the
        :mod:`shm_tpu.export` serialization entry point (CNN stage-2 only:
        classical modes depend on host-side sklearn feature transforms).

        Uses the portable XLA gate regardless of ``use_fused_gate`` — the
        Pallas kernel's Mosaic payload is not export-stable (see
        shm_tpu/export.py module docstring)."""
        if self.stage2 != "cnn":
            raise ValueError(
                f"only stage2='cnn' exports (got {self.stage2!r}); classical "
                "stage-2 needs host feature transforms at request time")
        ch = jnp.asarray(self.ch_idx, jnp.int32)
        clip_z = self.clip_z
        vae_apply, cnn_apply = self.vae_model.apply, self.cnn_model.apply
        vp, cv = self.vae_params, self.cnn_variables
        gmu, gsd = self.gate_mu, self.gate_sd
        cmu, csd = self.cnn_mu, self.cnn_sd
        thr = jnp.float32(self.threshold)
        thr2 = jnp.float32(self.stage2_threshold)

        @jax.jit
        def closed(X):
            Xc, Xr = X[..., 0], X[..., 1]
            Zg = standardize_clip_device(Xc[:, :, ch], gmu, gsd, clip_z)
            recon, _, _ = vae_apply({"params": vp}, Zg, sample=False)
            mse = ((Zg - recon) ** 2).mean(axis=(1, 2))
            anom = mse > thr
            Za = standardize_clip_device(Xr, cmu, csd, clip_z)[..., None]
            logits = cnn_apply(cv, Za, train=False)
            p_st = jax.nn.softmax(logits, axis=1)[:, 1]
            y3 = jnp.where(anom,
                           jnp.where(p_st >= thr2, 2, 1).astype(jnp.int32), 0)
            return (mse, anom, y3, jnp.where(anom, p_st, 0.0), logits)
        return closed

    def score_pair(self, Xc: np.ndarray, Xr: np.ndarray,
                   features: Optional[np.ndarray] = None
                   ) -> Dict[str, np.ndarray]:
        """Score clean/raw window stacks given separately (the extraction
        stage's native layout: ``X_clean.npy`` / ``X_raw.npy``)."""
        return self.score(stack_pair(Xc, Xr), features=features)


__all__ = ["OpenLabScorer", "ML_STAGE2", "stack_pair",
           "standardize_clip_device"]
