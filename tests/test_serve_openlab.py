"""OpenLabScorer: equivalence with the cmd_test_hybrid computation on the
committed bridge artifacts, request validation, ML stage-2 routing.

The reference's openLAB deployment is per-script artifact reloading + host
anomaly gathers (Codes/10_test_hybrid_pipeline.py:300-453); these tests pin
that the load-once fused scorer reproduces that computation window-for-window.
"""

from pathlib import Path

import numpy as np
import pytest

from shm_tpu.serve_openlab import ML_STAGE2, OpenLabScorer

ROOT = Path("data/openlab")

pytestmark = pytest.mark.skipif(
    not (ROOT / "output" / "CNN_Training" / "artifacts"
         / "cnn_model_openlab.msgpack").exists(),
    reason="committed openLAB artifacts not present")


@pytest.fixture(scope="module")
def subset():
    """A small window subset guaranteed to include rows on BOTH sides of
    the gate threshold (picked by actually scoring a candidate pool — a
    fixed label-stratified pick can land entirely below the gate)."""
    from shm_tpu.cli.openlab import Paths, _load_openlab_vae, standardize_clip
    from shm_tpu.config import OpenLabConfig
    from shm_tpu.train.vae import reconstruction_mse
    from shm_tpu.utils.io import load_json

    Xc = np.load(ROOT / "extracted" / "X_clean.npy").astype(np.float32)
    Xr = np.load(ROOT / "extracted" / "X_raw.npy").astype(np.float32)
    Xf = np.load(ROOT / "features" / "X_feat.npy").astype(np.float32)

    cfg = OpenLabConfig()
    paths = Paths(str(ROOT), raw_dir="")
    model, params, mu, sd, manifest = _load_openlab_vae(paths, cfg)
    thr = float(load_json(paths.vae_val_dir / "artifacts"
                          / "vae_threshold.json")["threshold"])
    pool = np.linspace(0, len(Xc) - 1, 512).astype(int)
    Zg = standardize_clip(Xc[pool][:, :, list(map(int, manifest["channels_idx"]))],
                          mu, sd, cfg.standardize_clip)
    mse = reconstruction_mse(model, params, Zg, fused=False)
    above = pool[mse > thr][:30]
    below = pool[mse <= thr][:30]
    assert len(above) >= 5, "candidate pool never trips the gate"
    assert len(below) >= 5, ("candidate pool is all-anomalous — the Normal "
                             "routing assertions would become vacuous")
    idx = np.concatenate([above, below])
    return Xc[idx], Xr[idx], Xf[idx]


@pytest.fixture(scope="module")
def scorer():
    return OpenLabScorer.from_artifacts(ROOT, min_bucket=16, max_batch=64)


def _reference_outputs(Xc, Xr):
    """Mirror cmd_test_hybrid's CNN-mode computation with the library
    primitives (Codes/10_test_hybrid_pipeline.py:337-371 semantics)."""
    from shm_tpu.cli.openlab import (Paths, _load_openlab_cnn,
                                     _load_openlab_vae, standardize_clip)
    from shm_tpu.config import OpenLabConfig
    from shm_tpu.train.cnn import predict_probs
    from shm_tpu.train.vae import reconstruction_mse
    from shm_tpu.utils.io import load_json

    cfg = OpenLabConfig()
    paths = Paths(str(ROOT), raw_dir="")
    model, params, mu, sd, manifest = _load_openlab_vae(paths, cfg)
    ch_idx = list(map(int, manifest["channels_idx"]))
    thr = float(load_json(paths.vae_val_dir / "artifacts"
                          / "vae_threshold.json")["threshold"])
    Zg = standardize_clip(Xc[:, :, ch_idx], mu, sd, cfg.standardize_clip)
    mse = reconstruction_mse(model, params, Zg, fused=False)
    anom = mse > thr

    cnn_model, cnn_vars, cmu, csd = _load_openlab_cnn(paths, cfg)
    thr2 = float(np.load(paths.cnn_val_dir / "artifacts"
                         / "cnn_best_threshold.npy").ravel()[0])
    Za = standardize_clip(Xr, cmu, csd, cfg.standardize_clip)[..., None]
    p_st = predict_probs(cnn_model, cnn_vars, Za)[:, 1]
    y3 = np.where(anom, np.where(p_st >= thr2, 2, 1), 0)
    return {"mse": mse, "anomalous": anom, "y_pred": y3,
            "p_struct": np.where(anom, p_st, 0.0)}


def test_cnn_mode_matches_reference_computation(scorer, subset):
    Xc, Xr, _ = subset
    got = scorer.score_pair(Xc, Xr)
    ref = _reference_outputs(Xc, Xr)
    assert ref["anomalous"].any(), "subset never trips the gate — weak test"
    np.testing.assert_allclose(got["mse"], ref["mse"], rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(got["anomalous"].astype(bool),
                                  ref["anomalous"])
    np.testing.assert_array_equal(got["y_pred"], ref["y_pred"])
    np.testing.assert_allclose(got["p_struct"], ref["p_struct"],
                               rtol=1e-4, atol=1e-5)


def test_stacked_and_pair_agree(scorer, subset):
    Xc, Xr, _ = subset
    X = np.stack([Xc, Xr], axis=-1)
    a = scorer.score(X)
    b = scorer.score_pair(Xc, Xr)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


def test_bucketing_invariance(scorer, subset):
    """Padded-bucket split points must not change any output (17 rows ->
    one padded 32-bucket; vs scoring with batch-exact shapes)."""
    Xc, Xr, _ = subset
    whole = scorer.score_pair(Xc, Xr)
    part = OpenLabScorer.from_artifacts(ROOT, min_bucket=4, max_batch=16)
    split = part.score_pair(Xc, Xr)
    np.testing.assert_allclose(split["mse"], whole["mse"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(split["y_pred"], whole["y_pred"])


@pytest.mark.parametrize("stage2", ML_STAGE2)
def test_ml_stage2_matches_sklearn_routing(subset, stage2):
    """Every classical stage-2 mode: gate on device, model scored on device
    from features; y_pred must match the sklearn-host recomputation of the
    same routing (CLAUDE.md: every alternative compute path — here the
    exported on-device tree/SVM arrays vs host sklearn — needs an
    equivalence test)."""
    Xc, Xr, Xf = subset
    dev = OpenLabScorer.from_artifacts(ROOT, stage2=stage2,
                                       min_bucket=16, max_batch=64)
    host = OpenLabScorer.from_artifacts(ROOT, stage2=stage2, host_ml=True,
                                        min_bucket=16, max_batch=64)
    a = dev.score_pair(Xc, Xr, features=Xf)
    b = host.score_pair(Xc, Xr, features=Xf)
    assert a["anomalous"].astype(bool).any()
    np.testing.assert_array_equal(a["y_pred"], b["y_pred"])
    # trees reproduce sklearn's f64 probabilities near-exactly; the SVM's
    # on-device RBF/Platt runs in f32 (exp of kernel distances) — ~1e-4 rel
    rtol = 2e-4 if stage2 == "svm_rbf" else 1e-5
    np.testing.assert_allclose(a["p_struct"], b["p_struct"],
                               rtol=rtol, atol=1e-5)
    # non-anomalous rows stay Normal with p_struct 0
    normals = ~a["anomalous"].astype(bool)
    assert (np.asarray(a["y_pred"])[normals] == 0).all()
    assert (np.asarray(a["p_struct"])[normals] == 0).all()


def test_validation_errors(scorer, subset):
    Xc, Xr, Xf = subset
    with pytest.raises(ValueError, match="stacked"):
        scorer.score(Xc)                        # rank 3, no pair axis
    with pytest.raises(ValueError, match="clean/raw"):
        scorer.score_pair(Xc, Xr[:-1])
    ml = OpenLabScorer.from_artifacts(ROOT, stage2="hgb",
                                      min_bucket=16, max_batch=64)
    with pytest.raises(ValueError, match="features"):
        ml.score_pair(Xc, Xr)
    with pytest.raises(ValueError, match="rows"):
        ml.score_pair(Xc, Xr, features=Xf[:-1])
    with pytest.raises(ValueError, match="unknown stage2"):
        OpenLabScorer.from_artifacts(ROOT, stage2="nope")
    out = scorer.score(np.zeros((0, 200, 4, 2), np.float32))
    assert out["mse"].shape == (0,)


def test_warmup_and_buckets(scorer):
    assert list(scorer.buckets()) == [16, 32, 64]
    scorer.warmup([16])


def test_http_daemon_openlab_mode(scorer, subset):
    """Real-socket round trip of the rank-4 [clean, raw] request format
    (the --openlab daemon mode): /score parity with the in-process scorer,
    shape validation, and /score_series 422 (no per-run cascade in serving)."""
    import json
    import threading
    import urllib.error
    import urllib.request

    from shm_tpu.serve_http import make_server

    Xc, Xr, _ = subset
    srv = make_server(scorer, port=0, series_strides=(1,))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        assert srv.warm_event.wait(timeout=600)
        assert srv.RequestHandlerClass.warm_error is None

        X = np.stack([Xc[:9], Xr[:9]], axis=-1).astype(np.float32)
        req = urllib.request.Request(
            base + "/score", data=X.tobytes(),
            headers={"Content-Type": "application/octet-stream",
                     "X-Shape": "9,200,4,2"})
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())
        ref = scorer.score(X)
        np.testing.assert_allclose(out["mse"], ref["mse"],
                                   rtol=1e-5, atol=1e-6)
        assert out["y_pred"] == [int(v) for v in ref["y_pred"]]

        # rank-3 body must 400 (shape header), wrong channel count must 422
        rank3 = np.zeros((2, 200, 4), np.float32)
        req = urllib.request.Request(
            base + "/score", data=rank3.tobytes(),
            headers={"Content-Type": "application/octet-stream",
                     "X-Shape": "2,200,4"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 400

        bad = np.zeros((2, 200, 3, 2), np.float32)
        req = urllib.request.Request(
            base + "/score", data=bad.tobytes(),
            headers={"Content-Type": "application/octet-stream",
                     "X-Shape": "2,200,3,2"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 422

        req = urllib.request.Request(
            base + "/score_series", data=np.zeros((300, 4), np.float32).tobytes(),
            headers={"Content-Type": "application/octet-stream",
                     "X-Shape": "300,4"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 422
    finally:
        srv.shutdown()
        srv.server_close()


def test_export_roundtrip_openlab(scorer, subset, tmp_path):
    """CNN-mode OpenLabScorer exports to .shmx and the reloaded program
    scores [clean, raw] pairs identically; ML modes refuse (host feature
    transforms cannot be baked into a device program)."""
    from shm_tpu.export import load_exported_scorer, save_exported_scorer

    Xc, Xr, Xf = subset
    path = tmp_path / "bridge.shmx"
    save_exported_scorer(scorer, path, platforms=("cpu",))
    loaded = load_exported_scorer(path)
    m = loaded.manifest
    assert m["pipeline"] == "openlab" and m["request_rank"] == 4
    assert m["seq_len"] == 200 and m["num_features"] == 4
    assert m["stage2_threshold"] == scorer.stage2_threshold

    got = loaded.score_pair(Xc, Xr)
    ref = scorer.score_pair(Xc, Xr)
    np.testing.assert_allclose(got["mse"], ref["mse"], rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(got["anomalous"].astype(bool),
                                  ref["anomalous"].astype(bool))
    np.testing.assert_array_equal(got["y_pred"], ref["y_pred"])

    with pytest.raises(ValueError, match="series"):
        loaded.score_series(np.zeros((300, 4), np.float32))
    ml = OpenLabScorer.from_artifacts(ROOT, stage2="rf",
                                      min_bucket=16, max_batch=64)
    with pytest.raises(ValueError, match="cnn"):
        save_exported_scorer(ml, tmp_path / "nope.shmx", platforms=("cpu",))


def test_mesh_serving_matches_single_device(scorer, subset):
    """mesh= shard_map serving over 8 virtual devices must match the
    single-device scorer on every output (params replicated, request batch
    sharded; buckets are mesh-divisible by construction)."""
    from shm_tpu.parallel import make_mesh

    Xc, Xr, _ = subset
    sharded = OpenLabScorer.from_artifacts(ROOT, mesh=make_mesh(8),
                                           min_bucket=16, max_batch=64)
    got = sharded.score_pair(Xc, Xr)
    ref = scorer.score_pair(Xc, Xr)
    np.testing.assert_allclose(got["mse"], ref["mse"], rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(got["anomalous"].astype(bool),
                                  ref["anomalous"].astype(bool))
    np.testing.assert_array_equal(got["y_pred"], ref["y_pred"])
    np.testing.assert_allclose(got["p_struct"], ref["p_struct"],
                               rtol=1e-4, atol=1e-5)
    with pytest.raises(ValueError, match="multiples"):
        OpenLabScorer.from_artifacts(ROOT, mesh=make_mesh(8),
                                     min_bucket=12, max_batch=60)


def test_http_daemon_serves_openlab_shmx(scorer, subset, tmp_path):
    """The --shmx daemon mode composes with openLAB artifacts: a deserialized
    rank-4 .shmx serves /score round trips and 422s /score_series."""
    import json
    import threading
    import urllib.error
    import urllib.request

    from shm_tpu.export import load_exported_scorer, save_exported_scorer
    from shm_tpu.serve_http import make_server

    Xc, Xr, _ = subset
    path = tmp_path / "bridge.shmx"
    save_exported_scorer(scorer, path, platforms=("cpu",))
    loaded = load_exported_scorer(path, min_bucket=16, max_batch=64)
    srv = make_server(loaded, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        assert srv.warm_event.wait(timeout=600)
        assert srv.RequestHandlerClass.warm_error is None

        with urllib.request.urlopen(base + "/info", timeout=30) as r:
            info = json.loads(r.read())
        assert info["exported"] is True and info["seq_len"] == 200

        X = np.stack([Xc[:5], Xr[:5]], axis=-1).astype(np.float32)
        req = urllib.request.Request(
            base + "/score", data=X.tobytes(),
            headers={"Content-Type": "application/octet-stream",
                     "X-Shape": "5,200,4,2"})
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())
        ref = scorer.score(X)
        assert out["y_pred"] == [int(v) for v in ref["y_pred"]]

        req = urllib.request.Request(
            base + "/score_series",
            data=np.zeros((300, 4), np.float32).tobytes(),
            headers={"Content-Type": "application/octet-stream",
                     "X-Shape": "300,4"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 422
    finally:
        srv.shutdown()
        srv.server_close()


def test_fused_gate_wiring_matches_xla(scorer, subset):
    """The TPU production gate path (fused Pallas kernel inside the scorer's
    program, incl. under mesh) certified off-chip: interpret lowering with
    f32 io must match the XLA gate near-exactly (CLAUDE.md: every alternative
    compute path needs an equivalence test; the compiled bf16 kernel's
    numerics are certified on the chip — BENCHMARKS.md openLAB serving)."""
    import jax.numpy as jnp

    from shm_tpu.parallel import make_mesh

    Xc, Xr, _ = subset
    fused = OpenLabScorer.from_artifacts(
        ROOT, use_fused_gate=True, gate_interpret=True,
        gate_io_dtype=jnp.float32, min_bucket=16, max_batch=64)
    got = fused.score_pair(Xc, Xr)
    ref = scorer.score_pair(Xc, Xr)
    np.testing.assert_allclose(got["mse"], ref["mse"], rtol=2e-4, atol=2e-5)
    np.testing.assert_array_equal(got["anomalous"].astype(bool),
                                  ref["anomalous"].astype(bool))
    np.testing.assert_array_equal(got["y_pred"], ref["y_pred"])

    mesh_fused = OpenLabScorer.from_artifacts(
        ROOT, use_fused_gate=True, gate_interpret=True,
        gate_io_dtype=jnp.float32, mesh=make_mesh(8),
        min_bucket=16, max_batch=64)
    got_m = mesh_fused.score_pair(Xc, Xr)
    np.testing.assert_allclose(got_m["mse"], ref["mse"], rtol=2e-4, atol=2e-5)
    np.testing.assert_array_equal(got_m["y_pred"], ref["y_pred"])


def test_fused_gate_wiring_attention_cell():
    """``auto_fused_gate`` includes ``cell="attention"`` on TPU, so the
    openLAB scorer's ``_gate_mse`` must route that cell to
    ``fused_attention_gate`` — NOT the LSTM kernel (the param trees differ;
    a mis-route would crash or mis-score). Wiring certified off-chip via the
    interpret lowering at f32 io against the XLA gate (the compiled bf16
    kernel's numerics are certified on the chip — BENCHMARKS.md attention
    kernel section). Synthetic tiny preset: no committed openLAB attention
    artifacts exist (the bridge artifact tree stays LSTM)."""
    import jax
    import jax.numpy as jnp

    from shm_tpu.models import CNNOpenLab, TemporalVAE

    T, C = 16, 3
    vae = TemporalVAE(input_dim=C, latent_dim=2, hidden_dim=32, num_layers=1,
                      dropout=0.0, cell="attention")
    vp = vae.init({"params": jax.random.PRNGKey(0)},
                  jnp.zeros((2, T, C), jnp.float32))["params"]
    cnn = CNNOpenLab(dropout=0.0)
    cv = cnn.init({"params": jax.random.PRNGKey(1)},
                  jnp.zeros((2, T, C, 1), jnp.float32))
    rng = np.random.default_rng(3)
    Xc = rng.normal(size=(12, T, C)).astype(np.float32)
    Xr = rng.normal(size=(12, T, C)).astype(np.float32)
    common = dict(stage2="cnn", cnn_model=cnn, cnn_variables=cv,
                  cnn_mu=np.zeros(C, np.float32), cnn_sd=np.ones(C, np.float32),
                  stage2_threshold=0.5, seq_len=T, num_channels=C,
                  min_bucket=4, max_batch=16)
    args = (vae, vp, np.zeros(C, np.float32), np.ones(C, np.float32),
            tuple(range(C)), 5.0, 0.5)
    fused = OpenLabScorer(*args, use_fused_gate=True, gate_interpret=True,
                          gate_io_dtype=jnp.float32, **common)
    ref = OpenLabScorer(*args, use_fused_gate=False, **common)
    got, want = fused.score_pair(Xc, Xr), ref.score_pair(Xc, Xr)
    np.testing.assert_allclose(got["mse"], want["mse"], rtol=2e-4, atol=2e-5)
    np.testing.assert_array_equal(got["anomalous"].astype(bool),
                                  want["anomalous"].astype(bool))
    np.testing.assert_array_equal(got["y_pred"], want["y_pred"])


def test_conv_impl_override_plumbs_through(scorer, subset, tmp_path):
    """from_artifacts(conv_impl=...) freezes the requested CNN lowering into
    the scorer (and hence into an exported artifact — export.py records it
    in the manifest and warns on the lax+CPU openLAB combination, where
    XLA-CPU lax.conv is ~150 s/batch). Decisions must match the default
    lowering (im2col<->lax equivalence is pinned in tests/test_models.py;
    this pins the serving/export plumbing)."""
    import json
    import zipfile

    from shm_tpu.export import save_exported_scorer

    Xc, Xr, _ = subset
    lax_scorer = OpenLabScorer.from_artifacts(
        ROOT, conv_impl="lax", min_bucket=16, max_batch=64)
    assert lax_scorer.cnn_model.conv_impl == "lax"
    got = lax_scorer.score_pair(Xc, Xr)
    ref = scorer.score_pair(Xc, Xr)
    np.testing.assert_array_equal(got["y_pred"], ref["y_pred"])

    with pytest.warns(UserWarning, match="conv_impl='lax'"):
        out = save_exported_scorer(lax_scorer, tmp_path / "lax.shmx",
                                   platforms=("cpu",))
    with zipfile.ZipFile(out) as zf:
        manifest = json.loads(zf.read("manifest.json"))
    assert manifest["conv_impl"] == "lax"

    # the kwarg is meaningless for classical stage-2 modes — reject loudly
    # instead of silently discarding it
    with pytest.raises(ValueError, match="stage2"):
        OpenLabScorer.from_artifacts(ROOT, stage2="rf", conv_impl="im2col")
