"""AOT export (.shmx): round-trip, scorer equivalence, shape polymorphism.

The reference has no deployment format at all — its pipeline script rebuilds
both torch models from source before loading state_dicts
(4DOF/Scripts/06_test_full_pipeline.py). shm_tpu.export serializes the whole
deterministic hybrid program via jax.export; these tests pin that the
deserialized artifact scores bit-identically to the in-process XLA scorer.
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shm_tpu.config import VAEConfig
from shm_tpu.export import (ExportedScorer, FORMAT_VERSION, export_scorer,
                            load_exported_scorer, save_exported_scorer)
from shm_tpu.models import CNN4DOF, vae_from_config
from shm_tpu.serve import HybridScorer, bucket_size


@pytest.fixture(scope="module")
def scorer():
    cfg = VAEConfig(4, 3, 16, 2, 0.0, use_layernorm=True)
    vae = vae_from_config(cfg)
    cnn = CNN4DOF(dropout=0.0)
    T, D = 20, 4
    key = jax.random.PRNGKey(0)
    vae_params = vae.init({"params": key}, jnp.zeros((2, T, D)))["params"]
    cnn_vars = cnn.init({"params": key}, jnp.zeros((2, T, D, 2)))
    mean = np.zeros((D,), np.float32)
    std = np.ones((D,), np.float32)
    return HybridScorer(vae, cnn, vae_params, cnn_vars, mean, std, 1.0,
                        use_fused_vae=False, min_bucket=8, max_batch=32,
                        seq_len=T)


@pytest.fixture(scope="module")
def artifact(scorer, tmp_path_factory):
    path = tmp_path_factory.mktemp("export") / "gate.shmx"
    save_exported_scorer(scorer, path, platforms=("cpu",),
                         extra_manifest={"note": "test"})
    return path


def test_roundtrip_score_matches_in_process(scorer, artifact):
    """Deserialized program == in-process XLA scorer across a multi-bucket
    request (32-batch + padded buckets for the 45 remainder). Discrete
    outputs exact; floats to 1-ulp (the deserialized StableHLO program and
    the live jit fuse the softmax differently)."""
    loaded = load_exported_scorer(artifact)
    W = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (45, 20, 4)),
                   np.float32)
    got = loaded.score(W)
    ref = scorer.score(W)
    for k in ("anomalous", "y_pred"):
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(ref[k]),
                                      err_msg=k)
    for k in ("mse", "p_struct"):
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   atol=1e-6, rtol=1e-6, err_msg=k)


def test_shape_polymorphic_batch(scorer, artifact):
    """ONE exported program serves every batch size — including shapes that
    are not in the bucket series."""
    loaded = load_exported_scorer(artifact)
    W = np.asarray(jax.random.normal(jax.random.PRNGKey(2), (7, 20, 4)),
                   np.float32)
    out = loaded.call(W)            # direct N=7 dispatch, no padding
    ref = scorer.score(W)
    np.testing.assert_allclose(np.asarray(out.mse), ref["mse"],
                               atol=1e-6, rtol=1e-6)
    assert np.asarray(out.logits).shape == (7, 2)


def test_manifest_and_buckets(scorer, artifact):
    loaded = load_exported_scorer(artifact)
    m = loaded.manifest
    assert m["format_version"] == FORMAT_VERSION
    assert m["seq_len"] == 20 and m["num_features"] == 4
    assert m["cell"] == "lstm" and m["num_layers"] == 2
    assert m["note"] == "test"
    assert list(loaded.buckets()) == [8, 16, 32]
    loaded.warmup([8])              # compiles + runs one bucket
    assert loaded.score(np.zeros((0, 20, 4), np.float32))["mse"].shape == (0,)


def test_bucket_size_policy_shared(scorer):
    """The free function is the scorer's policy (same series, same caps)."""
    for n in (1, 8, 9, 16, 31, 32, 33, 1000):
        assert bucket_size(n, 8, 32) == scorer._bucket(min(n, 32))


def test_export_rejects_mesh_and_missing_seq_len(scorer):
    no_t = HybridScorer(scorer.vae_model, scorer.cnn_model, scorer.vae_params,
                        scorer.cnn_variables, np.zeros(4, np.float32),
                        np.ones(4, np.float32), 1.0, use_fused_vae=False)
    with pytest.raises(ValueError, match="seq_len"):
        export_scorer(no_t, platforms=("cpu",))

    # a mesh scorer's program is bound to this session's devices — exporting
    # it would serialize a .shmx broken on any other topology
    from shm_tpu.parallel import make_mesh

    meshed = HybridScorer(scorer.vae_model, scorer.cnn_model,
                          scorer.vae_params, scorer.cnn_variables,
                          np.zeros(4, np.float32), np.ones(4, np.float32),
                          1.0, use_fused_vae=False, mesh=make_mesh(8),
                          min_bucket=8, max_batch=32, seq_len=20)
    with pytest.raises(ValueError, match="mesh"):
        export_scorer(meshed, platforms=("cpu",))


def test_loader_rejects_newer_format(scorer, artifact, tmp_path):
    import json
    import zipfile
    newer = tmp_path / "future.shmx"
    with zipfile.ZipFile(artifact) as zin, \
            zipfile.ZipFile(newer, "w") as zout:
        m = json.loads(zin.read("manifest.json"))
        m["format_version"] = FORMAT_VERSION + 1
        zout.writestr("manifest.json", json.dumps(m))
        zout.writestr("program.jax_export", zin.read("program.jax_export"))
    with pytest.raises(ValueError, match="newer"):
        load_exported_scorer(newer)


def test_score_series_matches_in_process(scorer, artifact):
    """Exported score_series (host windowing) == in-process on-device
    windowizer, including a stride > 1 and a too-short series."""
    loaded = load_exported_scorer(artifact)
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(3), (83, 4)),
                   np.float32)
    for stride in (1, 3):
        got = loaded.score_series(x, stride=stride)
        ref = scorer.score_series(x, stride=stride)
        np.testing.assert_allclose(got["mse"], ref["mse"],
                                   atol=1e-6, rtol=1e-6)
        np.testing.assert_array_equal(got["y_pred"], ref["y_pred"])
    assert loaded.score_series(x[:5])["mse"].shape == (0,)
    with pytest.raises(ValueError, match="stride"):
        loaded.score_series(x, stride=0)


def test_http_daemon_serves_exported_artifact(scorer, artifact):
    """make_server over an ExportedScorer: /info reports exported=True,
    /score round-trips with in-process-identical outputs, /score_series
    serves through the host windowizer (the --shmx daemon mode)."""
    import json as _json
    import threading
    import urllib.request

    from shm_tpu.serve_http import make_server

    loaded = load_exported_scorer(artifact)
    srv = make_server(loaded, port=0, series_strides=(1,))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        assert srv.warm_event.wait(timeout=300)
        assert srv.RequestHandlerClass.warm_error is None

        with urllib.request.urlopen(base + "/info", timeout=30) as r:
            info = _json.loads(r.read())
        assert info["exported"] is True
        assert info["seq_len"] == 20 and info["num_features"] == 4

        W = np.asarray(jax.random.normal(jax.random.PRNGKey(4), (11, 20, 4)),
                       np.float32)
        req = urllib.request.Request(
            base + "/score", data=W.tobytes(),
            headers={"Content-Type": "application/octet-stream",
                     "X-Shape": "11,20,4"})
        with urllib.request.urlopen(req, timeout=60) as r:
            out = _json.loads(r.read())
        ref = scorer.score(W)
        np.testing.assert_allclose(out["mse"], ref["mse"],
                                   atol=1e-6, rtol=1e-6)
        assert out["y_pred"] == [int(v) for v in ref["y_pred"]]

        x = np.asarray(jax.random.normal(jax.random.PRNGKey(5), (40, 4)),
                       np.float32)
        req = urllib.request.Request(
            base + "/score_series", data=x.tobytes(),
            headers={"Content-Type": "application/octet-stream",
                     "X-Shape": "40,4"})
        with urllib.request.urlopen(req, timeout=60) as r:
            out = _json.loads(r.read())
        ref = scorer.score_series(x)
        assert out["n"] == len(ref["mse"])
        np.testing.assert_allclose(out["mse"], ref["mse"],
                                   atol=1e-6, rtol=1e-6)
    finally:
        srv.shutdown()
        srv.server_close()


def test_export_mingru_trained_artifacts(tmp_path):
    """The second cell family exports too: round-trip the committed trained
    minGRU 4DOF artifacts (from_artifacts auto-detects the recurrence from
    the training meta) and pin decision agreement with the in-process
    scorer on synthetic windows."""
    root = Path("data/4dof_mingru")
    if not (root / "models" / "temporal_vae.msgpack").exists():
        pytest.skip("trained minGRU artifacts not present")
    scorer = HybridScorer.from_artifacts(
        root, use_fused_vae=False, cnn_dtype=jnp.float32,
        min_bucket=4, max_batch=8)
    assert getattr(scorer.vae_model, "cell", "lstm") == "min_gru"
    # tmp_path, never the repo tree: a hard-killed run would leave a stray
    # artifact dirtying the checkout
    blob_path = tmp_path / "mingru.shmx"
    save_exported_scorer(scorer, blob_path, platforms=("cpu",))
    loaded = load_exported_scorer(blob_path)
    assert loaded.manifest["cell"] == "min_gru"
    W = np.asarray(
        0.1 * jax.random.normal(jax.random.PRNGKey(6), (5, 100, 12)),
        np.float32)
    got = loaded.score(W)
    ref = scorer.score(W)
    np.testing.assert_array_equal(got["anomalous"], ref["anomalous"])
    np.testing.assert_array_equal(got["y_pred"], ref["y_pred"])
    np.testing.assert_allclose(got["mse"], ref["mse"],
                               atol=1e-5, rtol=1e-5)


def test_export_attention_trained_artifacts(tmp_path):
    """The third cell family exports too: round-trip the committed trained
    attention 4DOF artifacts (from_artifacts auto-detects the family from
    the training meta) and pin decision agreement with the in-process
    scorer on synthetic windows."""
    root = Path("data/4dof_attention")
    if not (root / "models" / "temporal_vae.msgpack").exists():
        pytest.skip("trained attention artifacts not present")
    scorer = HybridScorer.from_artifacts(
        root, use_fused_vae=False, cnn_dtype=jnp.float32,
        min_bucket=4, max_batch=8)
    assert getattr(scorer.vae_model, "cell", "lstm") == "attention"
    blob_path = tmp_path / "attention.shmx"
    save_exported_scorer(scorer, blob_path, platforms=("cpu",))
    loaded = load_exported_scorer(blob_path)
    assert loaded.manifest["cell"] == "attention"
    W = np.asarray(
        0.1 * jax.random.normal(jax.random.PRNGKey(7), (5, 100, 12)),
        np.float32)
    got = loaded.score(W)
    ref = scorer.score(W)
    np.testing.assert_array_equal(got["anomalous"], ref["anomalous"])
    np.testing.assert_array_equal(got["y_pred"], ref["y_pred"])
    np.testing.assert_allclose(got["mse"], ref["mse"],
                               atol=1e-5, rtol=1e-5)
