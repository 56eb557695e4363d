"""HybridScorer serving surface: bucket padding, equivalence, artifacts."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shm_tpu.config import VAEConfig
from shm_tpu.models import CNN4DOF, vae_from_config
from shm_tpu.pipeline import make_hybrid_fn, run_hybrid_batched
from shm_tpu.serve import HybridScorer, StreamScorer

REPO = Path(__file__).resolve().parents[1]


@pytest.fixture(scope="module")
def setup():
    cfg = VAEConfig(4, 3, 16, 2, 0.0, use_layernorm=True)
    vae = vae_from_config(cfg)
    cnn = CNN4DOF(dropout=0.0)
    T, D = 20, 4
    key = jax.random.PRNGKey(0)
    vae_params = vae.init({"params": key}, jnp.zeros((2, T, D)))["params"]
    cnn_vars = cnn.init({"params": key}, jnp.zeros((2, T, D, 2)))
    W = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (70, T, D)),
                   np.float32)
    mean = np.zeros((D,), np.float32)
    std = np.ones((D,), np.float32)
    return vae, cnn, vae_params, cnn_vars, W, mean, std


def _scorer(setup, **kw):
    vae, cnn, vae_params, cnn_vars, W, mean, std = setup
    return HybridScorer(vae, cnn, vae_params, cnn_vars, mean, std, 1.0,
                        use_fused_vae=False, **kw)


def test_score_matches_run_hybrid_batched(setup):
    vae, cnn, vae_params, cnn_vars, W, mean, std = setup
    scorer = _scorer(setup, min_bucket=16, max_batch=64)
    got = scorer.score(W)

    fn = make_hybrid_fn(vae, cnn)
    ref = run_hybrid_batched(fn, vae_params, cnn_vars, W, mean, std, 1.0)
    for k in ("mse", "anomalous", "y_pred", "p_struct"):
        np.testing.assert_allclose(np.asarray(got[k], np.float64),
                                   np.asarray(ref[k], np.float64),
                                   atol=1e-6, err_msg=k)


def test_bucket_padding_invariance(setup):
    """Outputs must not depend on which padded bucket a window rides in."""
    _, _, _, _, W, _, _ = setup
    scorer = _scorer(setup, min_bucket=16, max_batch=64)
    full = scorer.score(W)               # 64-batch + 16-bucket (70 windows)
    tiny = scorer.score(W[:3])           # rides a 16-bucket with 13 pad rows
    np.testing.assert_allclose(tiny["mse"], full["mse"][:3], atol=1e-6)
    np.testing.assert_array_equal(tiny["y_pred"], full["y_pred"][:3])


@pytest.mark.parametrize("stride,chunks", [
    (1, (7, 1, 30, 4, 58)),        # ragged chunking, total 100 samples
    (3, (25, 25, 25, 25)),
    # stride > seq_len (T=20): windows are separated by gap samples, and a
    # chunk boundary can land INSIDE a gap that hasn't arrived yet — the
    # stream must skip those samples as they come in, not misindex the
    # buffer (regression: consumed = n*stride used to overshoot the buffer)
    (30, (21, 25, 40, 14)),
    (23, (20, 3, 77)),
])
def test_stream_scorer_matches_score_series(setup, stride, chunks):
    """Chunk-by-chunk streaming must produce EXACTLY the whole-series
    outputs, with correct global window_start indices, independent of how
    the stream is chunked."""
    T = 20
    scorer = _scorer(setup, min_bucket=16, max_batch=64, seq_len=T)
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(7), (sum(chunks), 4)),
                   np.float32)
    ref = scorer.score_series(x, stride=stride)

    stream = StreamScorer(scorer, stride=stride)
    got = {k: [] for k in ("mse", "anomalous", "y_pred", "p_struct",
                           "window_start")}
    i = 0
    for c in chunks:
        out = stream.push(x[i:i + c])
        for k in got:
            got[k].append(out[k])
        i += c
    got = {k: np.concatenate(v) for k, v in got.items()}
    n_ref = len(ref["mse"])
    assert len(got["mse"]) == n_ref
    np.testing.assert_array_equal(
        got["window_start"], stride * np.arange(n_ref))
    # float outputs to bucket-invariance tolerance (streamed windows ride
    # different padded buckets than the whole-series dispatch); decisions
    # must match exactly
    for k in ("mse", "p_struct"):
        np.testing.assert_allclose(got[k], ref[k], atol=1e-6, err_msg=k)
    for k in ("anomalous", "y_pred"):
        np.testing.assert_array_equal(got[k], ref[k], err_msg=k)
    # memory bound: only the tail the next window needs is retained
    assert stream.buffered_samples < T


def test_stream_scorer_edges(setup):
    T = 20
    scorer = _scorer(setup, min_bucket=16, max_batch=64, seq_len=T)
    stream = StreamScorer(scorer, stride=2)
    # no window complete yet -> empty outputs, nothing consumed
    out = stream.push(np.zeros((T - 1, 4), np.float32))
    assert out["mse"].shape == (0,) and out["window_start"].shape == (0,)
    assert stream.buffered_samples == T - 1
    # empty push is a no-op
    out = stream.push(np.zeros((0, 4), np.float32))
    assert out["mse"].shape == (0,)
    # one more sample completes exactly one window at global start 0
    out = stream.push(np.zeros((1, 4), np.float32))
    assert out["mse"].shape == (1,)
    np.testing.assert_array_equal(out["window_start"], [0])
    # wrong feature count / bad stride / missing seq_len
    with pytest.raises(ValueError, match="samples"):
        stream.push(np.zeros((5, 3), np.float32))
    with pytest.raises(ValueError, match="stride"):
        StreamScorer(scorer, stride=0)
    with pytest.raises(ValueError, match="seq_len"):
        StreamScorer(_scorer(setup, min_bucket=16, max_batch=64))
    # reset restarts global indexing
    stream.reset()
    assert stream.buffered_samples == 0
    out = stream.push(np.zeros((T, 4), np.float32))
    np.testing.assert_array_equal(out["window_start"], [0])


def test_stream_scorer_drift_monitor(setup):
    """monitor='auto' attaches a DriftMonitor only when the scorer knows its
    calibrated rate; push() folds gate decisions in stream order and the
    state equals feeding the whole decision stream at once; reset() keeps
    drift history (it tracks the model, not the stream)."""
    from shm_tpu.monitor import DriftMonitor

    T = 20
    scorer = _scorer(setup, min_bucket=16, max_batch=64, seq_len=T)
    # hand-constructed scorer: no calibrated rate -> auto resolves to off
    assert StreamScorer(scorer).monitor is None
    scorer.expected_anomaly_rate = 0.01
    stream = StreamScorer(scorer, stride=3)
    assert isinstance(stream.monitor, DriftMonitor)
    assert stream.monitor.expected_rate == pytest.approx(0.01)

    x = np.asarray(jax.random.normal(jax.random.PRNGKey(9), (400, 4)),
                   np.float32)
    decisions = []
    for lo in range(0, 400, 90):                  # ragged stream chunks
        decisions.append(stream.push(x[lo:lo + 90])["anomalous"])
    whole = DriftMonitor(0.01)
    whole.update(np.concatenate(decisions))
    got, ref = stream.monitor.snapshot(), whole.snapshot()
    for k in ("windows", "anomalous", "ewma_rate", "cusum_high",
              "cusum_low", "alerts_high_total", "alerts_low_total"):
        assert got[k] == pytest.approx(ref[k], rel=1e-12), k
    assert got["windows"] == sum(len(d) for d in decisions) > 0

    before = stream.monitor.snapshot()
    stream.reset()
    assert stream.monitor.snapshot() == before   # reset keeps drift history

    # explicit instances are shared verbatim; None and junk are rejected/off
    shared = DriftMonitor(0.2)
    assert StreamScorer(scorer, monitor=shared).monitor is shared
    assert StreamScorer(scorer, monitor=None).monitor is None
    with pytest.raises(ValueError, match="monitor"):
        StreamScorer(scorer, monitor="yes")


def test_bucket_shapes(setup):
    scorer = _scorer(setup, min_bucket=16, max_batch=128)
    assert list(scorer.buckets()) == [16, 32, 64, 128]
    assert scorer._bucket(1) == 16
    assert scorer._bucket(17) == 32
    assert scorer._bucket(500) == 128


@pytest.mark.parametrize("stride,length", [(1, 120), (3, 200), (1, 300)])
def test_score_series_matches_windows_path(setup, stride, length):
    """On-device windowizing (score_series) must match score() on host-built
    windows — incl. bucket padding and multi-chunk requests (length=300 with
    max_batch=64 -> 2 chunks + a ragged bucket)."""
    vae, cnn, vae_params, cnn_vars, W, mean, std = setup
    T, D = W.shape[1], W.shape[2]
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(7), (length, D)),
                   np.float32)
    scorer = _scorer(setup, min_bucket=16, max_batch=64, seq_len=T)
    got = scorer.score_series(x, stride=stride)
    n = (length - T) // stride + 1
    Wx = x[(np.arange(n) * stride)[:, None] + np.arange(T)[None, :]]
    ref = scorer.score(Wx)
    assert got["mse"].shape == (n,)
    for k in ("mse", "anomalous", "y_pred", "p_struct"):
        np.testing.assert_allclose(np.asarray(got[k], np.float64),
                                   np.asarray(ref[k], np.float64),
                                   atol=1e-6, err_msg=k)


def test_score_series_edges(setup):
    _, _, _, _, W, _, _ = setup
    T = W.shape[1]
    scorer = _scorer(setup, min_bucket=16, max_batch=32, seq_len=T)
    out = scorer.score_series(np.zeros((T - 1, 4), np.float32))   # too short
    assert all(v.shape == (0,) for v in out.values())
    with pytest.raises(ValueError, match="series"):
        scorer.score_series(np.zeros((100, 4, 1), np.float32))
    with pytest.raises(ValueError, match="stride"):
        scorer.score_series(np.zeros((100, 4), np.float32), stride=0)
    with pytest.raises(ValueError, match="seq_len"):
        _scorer(setup).score_series(np.zeros((100, 4), np.float32))
    scorer.warmup_series()                                        # compiles


def test_score_series_mesh_fallback(setup):
    from shm_tpu.parallel import make_mesh

    vae, cnn, vae_params, cnn_vars, W, mean, std = setup
    T = W.shape[1]
    sharded = HybridScorer(vae, cnn, vae_params, cnn_vars, mean, std, 1.0,
                           use_fused_vae=False, min_bucket=16, max_batch=64,
                           mesh=make_mesh(8), seq_len=T)
    single = _scorer(setup, min_bucket=16, max_batch=64, seq_len=T)
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(8), (150, 4)),
                   np.float32)
    got, ref = sharded.score_series(x), single.score_series(x)
    np.testing.assert_allclose(got["mse"], ref["mse"], atol=1e-6)
    np.testing.assert_array_equal(got["y_pred"], ref["y_pred"])


def test_empty_and_bad_input(setup):
    scorer = _scorer(setup)
    out = scorer.score(np.zeros((0, 20, 4), np.float32))
    assert all(v.shape == (0,) for v in out.values())
    with pytest.raises(ValueError, match="rank-3"):
        scorer.score(np.zeros((5, 20), np.float32))
    with pytest.raises(ValueError, match="min_bucket"):
        _scorer(setup, min_bucket=64, max_batch=32)


def test_warmup_compiles_buckets(setup):
    scorer = _scorer(setup, min_bucket=16, max_batch=32)
    scorer.warmup(seq_len=20, num_features=4)   # must not raise


def test_warmup_uses_scorer_seq_len_no_recompile(setup):
    """A scorer built with seq_len= warms the shapes live traffic dispatches:
    after warmup(), score() must hit only compiled buckets (cache size frozen).
    Guards the ADVICE/VERDICT finding that a hardcoded T=100 default silently
    recompiled every bucket on first traffic for T != 100 deployments."""
    _, _, _, _, W, _, _ = setup          # T = 20 here (stands in for T=200)
    scorer = _scorer(setup, min_bucket=16, max_batch=32, seq_len=W.shape[1])
    scorer.warmup()                      # no explicit seq_len: must use self.seq_len
    n_compiled = scorer._fn._cache_size()
    assert n_compiled >= 2               # both buckets warmed
    scorer.score(W[:3])                  # 16-bucket
    scorer.score(W[:50])                 # 32 + 32 batches
    assert scorer._fn._cache_size() == n_compiled, \
        "live traffic recompiled a shape warmup should have covered"


def test_warmup_without_seq_len_raises(setup):
    scorer = _scorer(setup)              # no seq_len known
    with pytest.raises(ValueError, match="seq_len"):
        scorer.warmup()


@pytest.mark.skipif(
    not (REPO / "data/4dof/models/temporal_vae.msgpack").exists(),
    reason="trained 4DOF artifacts not present")
def test_from_artifacts_scores_trained_model():
    """End-to-end on the committed trained artifacts (XLA path on CPU):
    healthy windows must score under the stored threshold."""
    from shm_tpu.cli.stage4dof import Paths, build_fraction_windows
    from shm_tpu.config import Stage4DofConfig
    from shm_tpu.utils.io import load_json

    scorer = HybridScorer.from_artifacts(REPO / "data/4dof",
                                         use_fused_vae=False)
    cfg = Stage4DofConfig()
    splits = load_json(Paths(str(REPO / "data/4dof")).run_splits)
    W = build_fraction_windows(splits["normal"]["files"][:1], cfg.test_frac,
                               cfg)[:64]
    out = scorer.score(W)
    assert out["mse"].shape == (len(W),)
    # trained gate: healthy windows overwhelmingly below threshold
    assert (~out["anomalous"]).mean() > 0.9
    assert (out["y_pred"][~out["anomalous"].astype(bool)] == 0).all()


@pytest.mark.skipif(
    not (REPO / "data/4dof/models/temporal_vae.msgpack").exists(),
    reason="trained 4DOF artifacts not present")
def test_from_artifacts_bf16_cnn_matches_f32_cli_path():
    """Serving default (bf16 CNN) vs the f32-evaluated CLI path on the trained
    artifacts: gate decisions and 3-class predictions must agree (project
    convention: every alternative compute path is equivalence-tested)."""
    import jax.numpy as jnp

    from shm_tpu.cli.stage4dof import Paths, build_fraction_windows
    from shm_tpu.config import Stage4DofConfig
    from shm_tpu.utils.io import load_json

    root = REPO / "data/4dof"
    cfg = Stage4DofConfig()
    splits = load_json(Paths(str(root)).run_splits)
    groups = [build_fraction_windows(splits[g]["files"][:1], cfg.test_frac, cfg)
              for g in ("normal", "sensor_fault", "structural_fault")
              if splits.get(g, {}).get("files")]
    W = np.concatenate([g[:40] for g in groups])   # mixed classes

    bf16 = HybridScorer.from_artifacts(root, use_fused_vae=False,
                                       min_bucket=64, max_batch=128)
    f32 = HybridScorer.from_artifacts(root, use_fused_vae=False,
                                      cnn_dtype=jnp.float32,
                                      min_bucket=64, max_batch=128)
    assert bf16.seq_len == cfg.seq_len == 100     # T flows from the config
    a, b = bf16.score(W), f32.score(W)
    np.testing.assert_allclose(a["mse"], b["mse"], rtol=1e-5)
    np.testing.assert_array_equal(a["anomalous"], b["anomalous"])
    np.testing.assert_array_equal(a["y_pred"], b["y_pred"])
    # bf16 CNN logits move softmax scores by O(1e-2); decisions above agree
    np.testing.assert_allclose(a["p_struct"], b["p_struct"], atol=2e-2)


@pytest.mark.skipif(
    not (REPO / "data/4dof_mingru/models/temporal_vae.msgpack").exists(),
    reason="trained minGRU 4DOF artifacts not present")
def test_from_artifacts_autodetects_mingru_cell():
    """Artifacts trained with ``--cell min_gru`` load without any cfg hint:
    from_artifacts reads the cell from stage1_vae_train_meta.json. A wrong
    cell cannot pass silently — the param trees differ ([D,2H] vs [D,4H]
    w_ih), so msgpack restore would raise — loading + sane scores IS the pin.
    Windows come from data/4dof/raw (byte-identical generator seeds; the
    minGRU root deliberately does not duplicate the 3.3 MB raw tree)."""
    from shm_tpu.cli.stage4dof import Paths, build_fraction_windows
    from shm_tpu.config import Stage4DofConfig
    from shm_tpu.utils.io import load_json

    scorer = HybridScorer.from_artifacts(REPO / "data/4dof_mingru",
                                         use_fused_vae=False)
    cfg = Stage4DofConfig()
    splits = load_json(Paths(str(REPO / "data/4dof")).run_splits)
    W = build_fraction_windows(splits["normal"]["files"][:1], cfg.test_frac,
                               cfg)[:64]
    out = scorer.score(W)
    assert (~out["anomalous"]).mean() > 0.9
    assert (out["y_pred"][~out["anomalous"].astype(bool)] == 0).all()


def test_mesh_sharded_scorer_matches_single_device(setup):
    """Multi-chip serving: the shard_map-backed scorer on an 8-virtual-device
    mesh produces the same outputs as the single-device path."""
    from shm_tpu.parallel import make_mesh

    vae, cnn, vae_params, cnn_vars, W, mean, std = setup
    mesh = make_mesh(8)
    sharded = HybridScorer(vae, cnn, vae_params, cnn_vars, mean, std, 1.0,
                           use_fused_vae=False, min_bucket=16, max_batch=64,
                           mesh=mesh)
    single = _scorer(setup, min_bucket=16, max_batch=64)
    got, ref = sharded.score(W), single.score(W)
    for k in ("mse", "anomalous", "y_pred", "p_struct"):
        np.testing.assert_allclose(np.asarray(got[k], np.float64),
                                   np.asarray(ref[k], np.float64),
                                   atol=1e-6, err_msg=k)

    with pytest.raises(ValueError, match="mesh"):
        HybridScorer(vae, cnn, vae_params, cnn_vars, mean, std, 1.0,
                     use_fused_vae=False, min_bucket=12, max_batch=64,
                     mesh=mesh)
