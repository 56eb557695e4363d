"""Root-cause probe for the systematic 4DOF VAE val-loss offset (VERDICT r3 #2).

Observed: our framework's best val total loss is 0.690-0.697 across seeds
42/43/44 on BOTH training paths, vs the torch reference's 0.6582-0.6597
measured on this machine (BENCHMARKS.md seed table) — a systematic ~5% offset,
six-for-six above torch, with gate thresholds 1.38-1.40 vs torch 1.281.

Suspects named by the judge: init distribution parity, dropout placement,
KL-anneal indexing. All three match torch on paper (models/lstm.py uses
U(-1/sqrt(H)) on all LSTM weights incl. recurrent + both biases;
LSTMStack applies interlayer dropout exactly like nn.LSTM; kl_anneal_sigmoid
reproduces 4DOF/Scripts/03_train_vae.py:120-135 including the int() pivot).
This probe tests them EMPIRICALLY, plus the un-named fourth suspect:

  TPU matmul input precision. jax f32 matmuls lower to bf16-input MXU passes
  under the DEFAULT precision config; torch-CPU trains in full f32. Every
  seed-table number was trained on TPU — nobody has trained this recipe at
  f32-faithful precision.

Phases (each prints one JSON line):

  parity      (CPU)  torch-initialized params imported into our model;
                     deterministic forward loss, gradients, and one coupled-wd
                     Adam step compared torch-vs-jax to tolerance. PASS means
                     model math + optimizer are exactly torch's; the offset
                     then lives in RNG streams or compute precision.
  train       (TPU)  the full committed-data 4DOF recipe (50 epochs, seed S)
                     through train_vae (XLA path) under
                     --precision {default,highest}; reports best val + p99
                     threshold. default vs highest isolates the MXU precision
                     effect on training dynamics.
  torch-train (CPU)  the reference's own training loop (faithful rebuild of
                     4DOF/Scripts/03_train_vae.py:177-331) on the SAME
                     committed windows, for an on-machine torch number with
                     the same data this repo trains on.

Usage:
  python tools/probe_vae_offset.py parity
  python tools/probe_vae_offset.py train --precision highest --seed 42
  JAX_PLATFORMS=cpu PYTHONPATH= python tools/probe_vae_offset.py torch-train
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "data", "4dof")


def build_normalized_windows():
    """Committed-data train/val window stacks, normalized exactly as
    cli/stage4dof.cmd_train_vae does (stats from the train fraction only)."""
    import jax.numpy as jnp

    from shm_tpu.cli.stage4dof import Paths, build_fraction_windows_multi
    from shm_tpu.config import Stage4DofConfig
    from shm_tpu.data import compute_mean_std_from_windows, normalize_windows
    from shm_tpu.utils.io import load_json

    cfg = Stage4DofConfig()
    paths = Paths(ROOT)
    splits = load_json(paths.run_splits)
    Wtr, Wva = build_fraction_windows_multi(
        splits["normal"]["files"], (cfg.train_frac, cfg.val_frac), cfg)
    mean, std = compute_mean_std_from_windows(jnp.asarray(Wtr))
    Ztr = np.asarray(normalize_windows(jnp.asarray(Wtr), mean, std))
    Zva = np.asarray(normalize_windows(jnp.asarray(Wva), mean, std))
    return Ztr, Zva, cfg


def make_torch_vae(seed: int = 42):
    """The reference 4DOF TemporalVAE (faithful rebuild of
    4DOF/Scripts/Models/temporal_vae.py:8-82), torch-default-initialized."""
    import torch
    import torch.nn as nn

    torch.manual_seed(seed)

    class TVAE(nn.Module):
        def __init__(self, D=12, Z=16, H=128, L=2, p=0.3):
            super().__init__()
            self.encoder_lstm = nn.LSTM(D, H, L, batch_first=True, dropout=p)
            self.layer_norm = nn.LayerNorm(H)
            self.fc_mu = nn.Linear(H, Z)
            self.fc_logvar = nn.Linear(H, Z)
            self.fc_latent_to_hidden = nn.Linear(Z, H)
            self.decoder_lstm = nn.LSTM(H, H, L, batch_first=True, dropout=p)
            self.output_layer = nn.Linear(H, D)

        def forward(self, x, sample=True):
            _, (hn, _) = self.encoder_lstm(x)
            h = self.layer_norm(hn[-1])
            mu, lv = self.fc_mu(h), self.fc_logvar(h)
            if sample:
                z = mu + torch.randn_like(mu) * torch.exp(0.5 * lv)
            else:
                z = mu
            h0 = torch.tanh(self.fc_latent_to_hidden(z))
            h0 = h0.unsqueeze(1).repeat(1, x.size(1), 1)
            d, _ = self.decoder_lstm(h0)
            return self.output_layer(d), mu, lv

    return TVAE()


def torch_params_to_jax(tv) -> dict:
    """torch state dict -> our flax param tree (transposed layouts)."""
    sd = {k: v.detach().numpy() for k, v in tv.state_dict().items()}

    def lstm_stack(prefix: str, n_layers: int = 2) -> dict:
        return {
            f"layer{i}": {
                "w_ih": sd[f"{prefix}.weight_ih_l{i}"].T.copy(),
                "w_hh": sd[f"{prefix}.weight_hh_l{i}"].T.copy(),
                "b_ih": sd[f"{prefix}.bias_ih_l{i}"].copy(),
                "b_hh": sd[f"{prefix}.bias_hh_l{i}"].copy(),
            }
            for i in range(n_layers)
        }

    def dense(name: str) -> dict:
        return {"kernel": sd[f"{name}.weight"].T.copy(),
                "bias": sd[f"{name}.bias"].copy()}

    return {
        "encoder_lstm": lstm_stack("encoder_lstm"),
        "decoder_lstm": lstm_stack("decoder_lstm"),
        "layer_norm": {"scale": sd["layer_norm.weight"].copy(),
                       "bias": sd["layer_norm.bias"].copy()},
        "fc_mu": dense("fc_mu"),
        "fc_logvar": dense("fc_logvar"),
        "fc_latent_to_hidden": dense("fc_latent_to_hidden"),
        "output_layer": dense("output_layer"),
    }


def phase_parity() -> None:
    import torch
    import torch.nn.functional as F

    import jax
    import jax.numpy as jnp

    from shm_tpu.models import vae_from_config
    from shm_tpu.models.vae import vae_loss
    from shm_tpu.config import Stage4DofConfig

    Ztr, _, cfg = build_normalized_windows()
    xb_np = Ztr[:256]

    tv = make_torch_vae()
    jax_params = jax.tree.map(jnp.asarray, torch_params_to_jax(tv))
    model = vae_from_config(cfg.vae)

    # deterministic forward + loss (z = mu; no dropout) ---------------------
    xb_t = torch.tensor(xb_np)
    tv.eval()
    recon_t, mu_t, lv_t = tv(xb_t, sample=False)
    recon_loss_t = F.mse_loss(recon_t, xb_t)
    kl_t = -0.5 * torch.mean(1.0 + lv_t - mu_t.pow(2) - lv_t.exp())
    total_t = recon_loss_t + 0.5 * kl_t

    def jax_loss(p, xb):
        recon, mu, lv = model.apply({"params": p}, xb, sample=False,
                                    deterministic=True)
        total, r, kl = vae_loss(recon, xb, mu, lv, 0.5)
        return total, (r, kl)

    (total_j, (r_j, kl_j)), grads_j = jax.value_and_grad(
        jax_loss, has_aux=True)(jax_params, jnp.asarray(xb_np))

    fwd_rel = abs(float(total_j) - float(total_t)) / abs(float(total_t))
    recon_rel = abs(float(r_j) - float(recon_loss_t)) / abs(float(recon_loss_t))
    kl_abs = abs(float(kl_j) - float(kl_t))

    # gradients -------------------------------------------------------------
    tv.zero_grad()
    total_t.backward()
    tg = {k: v.grad.detach().numpy() for k, v in tv.named_parameters()}

    def grad_pairs():
        yield "out.bias", tg["output_layer.bias"], grads_j["output_layer"]["bias"]
        yield ("out.kernel", tg["output_layer.weight"].T,
               grads_j["output_layer"]["kernel"])
        yield "mu.kernel", tg["fc_mu.weight"].T, grads_j["fc_mu"]["kernel"]
        yield ("enc.w_hh0", tg["encoder_lstm.weight_hh_l0"].T,
               grads_j["encoder_lstm"]["layer0"]["w_hh"])
        yield ("dec.w_ih1", tg["decoder_lstm.weight_ih_l1"].T,
               grads_j["decoder_lstm"]["layer1"]["w_ih"])
        yield "ln.scale", tg["layer_norm.weight"], grads_j["layer_norm"]["scale"]

    grad_rel = {}
    for name, a, b in grad_pairs():
        a, b = np.asarray(a), np.asarray(b)
        grad_rel[name] = float(np.abs(a - b).max() /
                               max(np.abs(a).max(), 1e-12))

    # one coupled-wd Adam step (clip 2.0, lr 1e-3, wd 1e-5) -----------------
    import optax

    from shm_tpu.train.vae import make_optimizer
    from shm_tpu.config import TrainConfig

    tcfg = TrainConfig(lr=1e-3, weight_decay=1e-5, grad_clip=2.0)
    tx = make_optimizer(tcfg)
    upd, _ = tx.update(grads_j, tx.init(jax_params), jax_params)
    stepped_j = optax.apply_updates(jax_params, upd)

    opt_t = torch.optim.Adam(tv.parameters(), lr=1e-3, weight_decay=1e-5)
    torch.nn.utils.clip_grad_norm_(tv.parameters(), max_norm=2.0)
    opt_t.step()
    stepped_t = torch_params_to_jax(tv)

    def tree_get(tree, path):
        for k in path:
            tree = tree[k]
        return np.asarray(tree)

    step_rel = {}
    for name, path in (("out.kernel", ("output_layer", "kernel")),
                       ("enc.w_hh0", ("encoder_lstm", "layer0", "w_hh")),
                       ("ln.scale", ("layer_norm", "scale"))):
        a, b = tree_get(stepped_t, path), tree_get(stepped_j, path)
        step_rel[name] = float(np.abs(a - b).max())

    ok = (fwd_rel < 1e-5 and recon_rel < 1e-5 and kl_abs < 1e-6
          and max(grad_rel.values()) < 1e-3
          and max(step_rel.values()) < 1e-5)
    print(json.dumps({
        "phase": "parity", "ok": bool(ok),
        "forward_total_rel": fwd_rel, "recon_rel": recon_rel,
        "kl_abs": kl_abs, "grad_max_rel": grad_rel,
        "adam_step_max_abs": step_rel,
    }))


def phase_train(precision: str, seed: int, epochs: int) -> None:
    import contextlib
    import jax
    import jax.numpy as jnp

    from shm_tpu.config import replace
    from shm_tpu.models import vae_from_config
    from shm_tpu.train import train_vae

    Ztr, Zva, cfg = build_normalized_windows()
    tcfg = replace(cfg.vae_train, seed=seed, epochs=epochs)
    model = vae_from_config(cfg.vae)

    ctx = (jax.default_matmul_precision(precision)
           if precision != "default" else contextlib.nullcontext())
    with ctx:
        res = train_vae(model, Ztr, Zva, tcfg, use_pallas_kernel=False)
        # p99 threshold over healthy-val per-window MSE, deterministic gate
        # (04_vae_thresholding.py:113-124 / calibrate.py semantics)
        @jax.jit
        def mses(p, Z):
            recon, _, _ = model.apply({"params": p}, Z, sample=False,
                                      deterministic=True)
            return ((recon - Z) ** 2).mean(axis=(1, 2))

        thr = float(np.percentile(np.asarray(mses(res.params,
                                                  jnp.asarray(Zva))), 99))
    print(json.dumps({
        "phase": "train", "platform": jax.default_backend(),
        "precision": precision, "seed": seed, "epochs": tcfg.epochs,
        "best_val": res.best_val, "best_epoch": res.best_epoch,
        "p99_threshold": thr, "seconds": round(res.seconds, 1),
    }))


def phase_torch_train(seed: int, epochs: int) -> None:
    """The reference trainer, faithfully (4DOF/Scripts/03_train_vae.py:177-331),
    on the same committed windows this repo trains on."""
    import torch
    import torch.nn.functional as F
    from torch.utils.data import DataLoader, TensorDataset

    from shm_tpu.train.vae import kl_anneal_sigmoid

    Ztr, Zva, _ = build_normalized_windows()

    torch.manual_seed(seed)
    np.random.seed(seed)
    tv = make_torch_vae(seed)
    opt = torch.optim.Adam(tv.parameters(), lr=1e-3, weight_decay=1e-5)
    g = torch.Generator()
    g.manual_seed(seed)
    dl_tr = DataLoader(TensorDataset(torch.tensor(Ztr)), batch_size=256,
                       shuffle=True, num_workers=0, generator=g)
    dl_va = DataLoader(TensorDataset(torch.tensor(Zva)), batch_size=256,
                       shuffle=False, num_workers=0)

    best_val, best_epoch = float("inf"), -1
    best_state = None
    for epoch in range(1, epochs + 1):
        kl_w = kl_anneal_sigmoid(epoch, epochs, 0.30)
        tv.train()
        for (xb,) in dl_tr:
            xhat, mu, lv = tv(xb)
            recon = F.mse_loss(xhat, xb)
            kl = -0.5 * torch.mean(1.0 + lv - mu.pow(2) - lv.exp())
            loss = recon + kl_w * kl
            opt.zero_grad(set_to_none=True)
            loss.backward()
            torch.nn.utils.clip_grad_norm_(tv.parameters(), max_norm=2.0)
            opt.step()
        tv.eval()
        va_sum, va_n = 0.0, 0
        with torch.no_grad():
            for (xb,) in dl_va:
                xhat, mu, lv = tv(xb)     # torch samples even under eval()
                recon = F.mse_loss(xhat, xb)
                kl = -0.5 * torch.mean(1.0 + lv - mu.pow(2) - lv.exp())
                va_sum += float((recon + kl_w * kl).item()) * xb.size(0)
                va_n += xb.size(0)
        vavg = va_sum / max(va_n, 1)
        if vavg < best_val:
            best_val, best_epoch = vavg, epoch
            best_state = {k: v.detach().clone()
                          for k, v in tv.state_dict().items()}
        print(f"[torch] epoch {epoch:03d} val={vavg:.6f}", flush=True)

    tv.load_state_dict(best_state)
    tv.eval()
    with torch.no_grad():
        X = torch.tensor(Zva)
        mses = []
        for i in range(0, X.shape[0], 512):
            xb = X[i:i + 512]
            xhat, _, _ = tv(xb)           # stochastic, as the reference scores
            mses.append(((xb - xhat) ** 2).mean(dim=(1, 2)))
        thr = float(np.percentile(torch.cat(mses).numpy(), 99))
    print(json.dumps({
        "phase": "torch-train", "seed": seed, "epochs": epochs,
        "best_val": best_val, "best_epoch": best_epoch,
        "p99_threshold": thr,
    }))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("phase", choices=["parity", "train", "torch-train"])
    ap.add_argument("--precision", default="default",
                    choices=["default", "highest", "float32", "bfloat16"])
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--epochs", type=int, default=50)
    args = ap.parse_args()
    if args.phase == "parity":
        phase_parity()
    elif args.phase == "train":
        phase_train(args.precision, args.seed, args.epochs)
    else:
        phase_torch_train(args.seed, args.epochs)


if __name__ == "__main__":
    main()
