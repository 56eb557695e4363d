"""AOT model export: serialize a trained scorer to a self-contained artifact.

The reference's only deployment format is a torch ``state_dict`` that needs
the full model source tree to restore (e.g. 4DOF/Scripts/06_test_full_pipeline
.py:294-314 rebuilds both models before loading weights). This module exports
the ENTIRE deterministic hybrid program — normalization, VAE gate, CNN
attribution, thresholding, with the trained weights baked in as constants —
via :mod:`jax.export` (StableHLO). The resulting ``.shmx`` file reloads and
scores with nothing but jax + this loader: no flax, no model classes, no
msgpack/stats/threshold side files.

Design choices (TPU-native):

- **Shape-polymorphic batch**: the program is exported once with a symbolic
  batch dimension, so ONE artifact serves every padded bucket shape
  (compilation per concrete shape still happens at load site, exactly like
  the in-process scorer — :class:`ExportedScorer` reuses the same bucket
  policy via :func:`shm_tpu.serve.score_bucketed`).
- **Multi-platform lowering**: default ``platforms=("cpu", "tpu")`` — one
  artifact runs on either backend (jax.export cross-lowers without the
  target hardware present).
- **XLA path, not the Pallas kernel**: Pallas lowers to a ``tpu_custom_call``
  whose Mosaic payload is tied to the libtpu version that traced it —
  jax.export's compatibility guarantees only cover stable custom calls. The
  exported program therefore uses the portable XLA lowering (whose
  equivalence with the kernel path is pinned in tests/test_ops.py /
  tests/test_pipeline.py); in-process serving (:class:`shm_tpu.serve
  .HybridScorer`) keeps the kernel.

Example::

    scorer = HybridScorer.from_artifacts("data/4dof")
    save_exported_scorer(scorer, "gate4dof.shmx")
    ...                                   # any other process / machine:
    s = load_exported_scorer("gate4dof.shmx")
    out = s.score(windows)                # same dict as HybridScorer.score

CLI::

    python -m shm_tpu.export --root data/4dof --out gate4dof.shmx
"""

from __future__ import annotations

import argparse
import io
import json
import zipfile
from pathlib import Path
from typing import Dict, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax import export as jax_export

from shm_tpu.pipeline import HybridOutputs, make_hybrid_fn
from shm_tpu.serve import HybridScorer, bucket_series, score_bucketed

FORMAT_VERSION = 1
_PROGRAM_ENTRY = "program.jax_export"
_MANIFEST_ENTRY = "manifest.json"
_OUTPUT_KEYS = ("mse", "anomalous", "y_pred", "p_struct", "logits")


def export_scorer(scorer, *,
                  platforms: Sequence[str] = ("cpu", "tpu")) -> bytes:
    """Serialize ``scorer``'s deterministic hybrid program to jax.export bytes.

    ``scorer`` is a :class:`shm_tpu.serve.HybridScorer` (4DOF layout:
    rank-3 ``(batch, seq_len, num_features)`` requests) or a
    :class:`shm_tpu.serve_openlab.OpenLabScorer` with CNN stage-2 (rank-4
    ``(batch, seq_len, channels, 2)`` stacked [clean, raw] requests).
    Weights, normalization stats, and every threshold are captured as
    program constants; the exported callable takes ONE float32 array with a
    symbolic batch dimension and returns the plain tuple
    ``(mse, anomalous, y_pred, p_struct, logits)`` (a builtin pytree, so the
    artifact does not depend on this package's output types to deserialize).
    """
    if scorer.mesh is not None:
        raise ValueError(
            "mesh scorers are bound to this session's devices; export a "
            "single-device scorer (the load site can shard the batch itself)")
    if scorer.seq_len is None:
        raise ValueError(
            "export needs the serving window length: construct the scorer "
            "with seq_len= or use from_artifacts()")

    T, D = int(scorer.seq_len), int(scorer.num_features)
    if getattr(scorer, "request_rank", 3) == 4:
        closed = scorer.export_program()          # OpenLabScorer (XLA gate)
        shape = (T, D, 2)
    else:
        # Portable XLA program (see module docstring for why not Pallas).
        fn = make_hybrid_fn(scorer.vae_model, scorer.cnn_model,
                            use_fused_vae=False)
        vp, cv = scorer.vae_params, scorer.cnn_variables
        mean, std, thr = scorer.mean, scorer.std, scorer.threshold

        @jax.jit
        def closed(W):
            return tuple(fn(vp, cv, W, mean, std, thr))
        shape = (T, D)

    (b,) = jax_export.symbolic_shape("b")
    spec = jax.ShapeDtypeStruct((b,) + shape, jnp.float32)
    return jax_export.export(closed, platforms=tuple(platforms))(spec).serialize()


def save_exported_scorer(scorer, path: str | Path, *,
                         platforms: Sequence[str] = ("cpu", "tpu"),
                         extra_manifest: Optional[Dict] = None) -> Path:
    """Export ``scorer`` (HybridScorer or CNN-mode OpenLabScorer) and write
    the ``.shmx`` artifact (zip: program + JSON manifest). Returns the
    written path."""
    blob = export_scorer(scorer, platforms=platforms)
    vae = scorer.vae_model
    rank = int(getattr(scorer, "request_rank", 3))
    manifest = {
        "format_version": FORMAT_VERSION,
        "jax_version": jax.__version__,
        "platforms": list(platforms),
        "pipeline": "openlab" if rank == 4 else "4dof",
        "request_rank": rank,
        "seq_len": int(scorer.seq_len),
        "num_features": int(scorer.num_features),
        "threshold": float(scorer.threshold),
        "cell": getattr(vae, "cell", "lstm"),
        "num_layers": int(vae.num_layers),
        "min_bucket": int(scorer.min_bucket),
        "max_batch": int(scorer.max_batch),
        "outputs": list(_OUTPUT_KEYS),
        "calling_convention":
            ("call(X: float32[batch, seq_len, channels, 2]) -> "
             "(mse, anomalous, y_pred, p_struct, logits)" if rank == 4 else
             "call(W: float32[batch, seq_len, num_features]) -> "
             "(mse, anomalous, y_pred, p_struct, logits)"),
    }
    if rank == 4:
        manifest["stage2_threshold"] = float(scorer.stage2_threshold)
    if getattr(scorer, "expected_anomaly_rate", None) is not None:
        # carried so a daemon serving the standalone artifact can still
        # baseline its DriftMonitor against the calibrated healthy rate
        manifest["expected_anomaly_rate"] = float(scorer.expected_anomaly_rate)
    conv_impl = getattr(scorer.cnn_model, "conv_impl", None)
    if conv_impl is not None:
        # the conv lowering is frozen at trace time, so a multi-platform
        # artifact carries the EXPORTING host's choice to both backends;
        # the costs invert by backend (models/cnn.py::inference_conv_impl),
        # so record it and flag the pathological combination
        manifest["conv_impl"] = str(conv_impl)
        if conv_impl == "lax" and "cpu" in platforms:
            # a TPU host exports conv_impl="lax" by default (the fast TPU
            # lowering), so a default cpu,tpu artifact hits this for BOTH
            # pipelines — warn for both, not just openLAB
            import warnings

            warnings.warn(
                "exporting with conv_impl='lax' for a CPU target: XLA-CPU "
                "lax.conv is far slower than the im2col lowering for these "
                "CNNs (~150 s/batch measured for the openLAB model). For "
                "CPU-serving artifacts build the scorer with "
                "from_artifacts(conv_impl='im2col') (or pass --conv-impl "
                "im2col to python -m shm_tpu.export).",
                stacklevel=2)
    if extra_manifest:
        manifest.update(extra_manifest)
    path = Path(path)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(_MANIFEST_ENTRY, json.dumps(manifest, indent=2))
        zf.writestr(_PROGRAM_ENTRY, blob)
    path.write_bytes(buf.getvalue())
    return path


class ExportedScorer:
    """Bucket-batched scorer over a deserialized ``.shmx`` program.

    Mirrors :class:`shm_tpu.serve.HybridScorer`'s request surface (``score``
    / ``score_series`` return the same dicts of numpy arrays, requests ride
    the same ``min_bucket * 2^k`` padded shapes, ``warmup()`` precompiles
    them) but needs only the artifact — no model code, params, stats, or
    threshold files, so :mod:`shm_tpu.serve_http` can serve it directly
    (``--shmx``). Equivalence with the in-process scorer is pinned in
    tests/test_export.py.
    """

    # the daemon surface HybridScorer exposes: exported programs are always
    # single-device (the load site shards if it wants) and always the
    # portable XLA lowering (module docstring)
    mesh = None
    use_fused_vae = False
    exported = True          # /info introspection (getattr-based, not
                             # class-name string matching)

    def __init__(self, exported: "jax_export.Exported", manifest: Dict, *,
                 min_bucket: Optional[int] = None,
                 max_batch: Optional[int] = None):
        self._exported = exported
        self.manifest = dict(manifest)
        self.seq_len = int(manifest["seq_len"])
        self.num_features = int(manifest["num_features"])
        self.threshold = float(manifest["threshold"])
        self.request_rank = int(manifest.get("request_rank", 3))
        rate = manifest.get("expected_anomaly_rate")   # absent pre-round-3
        self.expected_anomaly_rate = None if rate is None else float(rate)
        # explicit `is not None`: a caller's invalid 0 must hit the range
        # check below, not silently fall back to the manifest value
        self.min_bucket = int(manifest["min_bucket"] if min_bucket is None
                              else min_bucket)
        self.max_batch = int(manifest["max_batch"] if max_batch is None
                             else max_batch)
        if self.min_bucket < 1 or self.max_batch < self.min_bucket:
            raise ValueError("need 1 <= min_bucket <= max_batch")

    # ------------------------------------------------------------------
    def call(self, W) -> HybridOutputs:
        """Raw program invocation on an (N, T, D) stack — compiles per
        concrete N like any jitted function; prefer :meth:`score`."""
        return HybridOutputs(*self._exported.call(jnp.asarray(W, jnp.float32)))

    def buckets(self) -> Sequence[int]:
        return bucket_series(self.min_bucket, self.max_batch)

    def _request_shape(self, b: int):
        base = (b, self.seq_len, self.num_features)
        return base + (2,) if self.request_rank == 4 else base

    def warmup(self, batch_sizes: Optional[Sequence[int]] = None) -> None:
        """Compile every bucket shape before serving traffic."""
        for b in (batch_sizes or self.buckets()):
            out = self.call(np.zeros(self._request_shape(b), np.float32))
            np.asarray(out.mse)          # force completion (readback)

    def score(self, W: np.ndarray) -> Dict[str, np.ndarray]:
        """Score a raw request stack — (N, T, D) windows for 4DOF-layout
        artifacts, (N, T, C, 2) stacked [clean, raw] for openLAB ones; same
        outputs and padded-shape policy as the in-process scorers."""
        return score_bucketed(self.call, W, self.min_bucket, self.max_batch,
                              ndim=self.request_rank)

    def score_pair(self, Xc: np.ndarray, Xr: np.ndarray
                   ) -> Dict[str, np.ndarray]:
        """openLAB artifacts only: score clean/raw stacks given separately."""
        if self.request_rank != 4:
            raise ValueError("score_pair is for openLAB-pipeline artifacts; "
                             "this artifact takes (N, T, D) windows")
        from shm_tpu.serve_openlab import stack_pair

        return self.score(stack_pair(Xc, Xr))

    def warmup_series(self, stride: int = 1,
                      batch_sizes: Optional[Sequence[int]] = None) -> None:
        """No-op beyond :meth:`warmup`: the exported program takes WINDOWS
        (the on-device series gather is not part of the artifact), so
        :meth:`score_series` windowizes on the host and dispatches through
        the already-warmed window buckets — there are no per-stride programs
        to compile. Kept so the HTTP daemon's acceptance-implies-warmed
        stride policy holds for ``--shmx`` scorers too."""
        if stride < 1:
            raise ValueError(f"stride must be >= 1, got {stride}")

    def score_series(self, x: np.ndarray, stride: int = 1
                     ) -> Dict[str, np.ndarray]:
        """Score every sliding window of a raw (T_total, D) series.

        Same outputs as ``HybridScorer.score_series``, but windows are built
        on the HOST (the artifact's program starts at the window stack) —
        the remote-upload savings of the in-process on-device windowizer do
        not apply to exported scorers. Uses the same windowing helper as the
        serving path so indexing cannot diverge (serve.py mesh fallback)."""
        from shm_tpu.data.windows import make_windows

        if self.request_rank == 4:
            raise ValueError(
                "openLAB-pipeline artifacts have no raw-series path "
                "(cleaning is a per-run cascade owned by extraction); "
                "score extracted [clean, raw] window pairs instead")
        x = np.asarray(x, np.float32)
        if x.ndim != 2:
            raise ValueError(f"expected a (T_total, D) series, got {x.shape}")
        if stride < 1:
            raise ValueError(f"stride must be >= 1, got {stride}")
        if x.shape[0] < self.seq_len:
            return {k: np.zeros((0,), np.float32) for k in
                    ("mse", "anomalous", "y_pred", "p_struct")}
        W = np.asarray(make_windows(jnp.asarray(x), self.seq_len, stride))
        return self.score(W)


def load_exported_scorer(path: str | Path, **kw) -> ExportedScorer:
    """Load a ``.shmx`` artifact written by :func:`save_exported_scorer`."""
    with zipfile.ZipFile(Path(path)) as zf:
        manifest = json.loads(zf.read(_MANIFEST_ENTRY))
        if manifest.get("format_version", 0) > FORMAT_VERSION:
            raise ValueError(
                f"artifact format {manifest.get('format_version')} is newer "
                f"than this loader ({FORMAT_VERSION})")
        exported = jax_export.deserialize(zf.read(_PROGRAM_ENTRY))
    return ExportedScorer(exported, manifest, **kw)


# ---------------------------------------------------------------------------
def main(argv: Optional[Sequence[str]] = None) -> None:
    p = argparse.ArgumentParser(
        prog="python -m shm_tpu.export",
        description="Export trained 4DOF-layout artifacts to a standalone "
                    ".shmx scoring program (StableHLO, weights baked in).")
    p.add_argument("--root", default=None,
                   help="4DOF-layout artifact root (shm_tpu.cli.stage4dof)")
    p.add_argument("--openlab", default=None, metavar="ROOT",
                   help="openLAB artifact root instead of --root (exports "
                        "the CNN-stage-2 bridge pipeline; rank-4 "
                        "[clean, raw] requests)")
    p.add_argument("--out", required=True, help="output .shmx path")
    p.add_argument("--platforms", default="cpu,tpu",
                   help="comma-separated lowering platforms (default cpu,tpu)")
    p.add_argument("--conv-impl", default=None, choices=("lax", "im2col"),
                   help="freeze this CNN conv lowering into the artifact "
                        "instead of the exporting host's backend default "
                        "(lax is fast on TPU, im2col on CPU — the lowering "
                        "is baked in at trace time)")
    args = p.parse_args(argv)
    if (args.root is None) == (args.openlab is None):
        p.error("exactly one of --root / --openlab is required")

    kw = {"conv_impl": args.conv_impl} if args.conv_impl else {}
    if args.openlab is not None:
        from shm_tpu.serve_openlab import OpenLabScorer

        scorer = OpenLabScorer.from_artifacts(args.openlab, **kw)
    else:
        scorer = HybridScorer.from_artifacts(args.root, **kw)
    out = save_exported_scorer(
        scorer, args.out, platforms=tuple(args.platforms.split(",")))
    size_kb = out.stat().st_size / 1024
    print(f"[export] wrote {out} ({size_kb:.0f} KB, "
          f"platforms={args.platforms}, T={scorer.seq_len})")


if __name__ == "__main__":
    main()


__all__ = ["export_scorer", "save_exported_scorer", "load_exported_scorer",
           "ExportedScorer", "FORMAT_VERSION"]
