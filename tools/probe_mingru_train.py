"""Probe: minGRU TRAINING throughput — scan lowering x execution structure.

The driven minGRU 4DOF training run took 19.8 s (50 epochs) where the LSTM
with its custom-VJP Pallas kernels takes 11.3 s — despite the minGRU forward
doing ~6x less matmul work. Candidate explanations: (a) the sequential
lax.scan's 100-step dependency chain (and its equally-sequential VJP) is
latency-bound at training batch sizes, where the associative scan's log-depth
could win; (b) the whole-run fused program's compile cost lands in the wall
time. This probe measures, on the 4DOF training shapes (3,010 train / 2,010
val windows, batch 256, 50 epochs, synthetic values — throughput does not
depend on data):

  - min_gru, scan_impl=sequential, fused whole-run (the shipping path)
  - min_gru, scan_impl=associative, fused whole-run
  - lstm, XLA forward, fused whole-run
  - lstm, Pallas custom-VJP kernels, fused whole-run (the shipping LSTM)

Each config reports train_vae's own res.seconds (excludes compile: the
trainer's timer starts after program build; dispatch/compile shows up in the
process wall clock, printed too).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_mingru_train.py
"""

from __future__ import annotations

import time

import numpy as np


def main() -> None:
    from shm_tpu.config import TrainConfig
    from shm_tpu.models import TemporalVAE
    from shm_tpu.train.vae import train_vae

    rng = np.random.default_rng(0)
    Ztr = rng.normal(size=(3010, 100, 12)).astype(np.float32)
    Zva = rng.normal(size=(2010, 100, 12)).astype(np.float32)
    tcfg = TrainConfig(seed=42, epochs=50, batch_size=256, lr=1e-3,
                       weight_decay=1e-5, grad_clip=2.0, kl_warmup_ratio=0.3)

    def vae(cell, scan_impl="sequential"):
        return TemporalVAE(input_dim=12, latent_dim=16, hidden_dim=128,
                           num_layers=2, dropout=0.3, use_layernorm=True,
                           cell=cell, scan_impl=scan_impl)

    configs = [
        ("min_gru seq    ", vae("min_gru", "sequential"), False),
        ("min_gru assoc  ", vae("min_gru", "associative"), False),
        ("lstm xla       ", vae("lstm"), False),
        ("lstm kernels   ", vae("lstm"), True),
    ]
    for name, model, kern in configs:
        t0 = time.perf_counter()
        res = train_vae(model, Ztr, Zva, tcfg, use_pallas_kernel=kern,
                        fused_epochs=True)
        wall = time.perf_counter() - t0
        print(f"{name}: train {res.seconds:6.1f}s | wall {wall:6.1f}s "
              f"| {res.seconds / tcfg.epochs * 1e3:6.0f} ms/epoch",
              flush=True)


if __name__ == "__main__":
    main()
