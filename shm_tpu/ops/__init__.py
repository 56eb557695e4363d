import jax

from shm_tpu.ops.fused_vae import fused_vae_gate, vae_params_to_kernel_weights
from shm_tpu.ops.fused_mingru import (
    fused_mingru_gate,
    mingru_params_to_kernel_weights,
)
from shm_tpu.ops.fused_attention import (
    fused_attention_gate,
    attention_params_to_kernel_weights,
)
from shm_tpu.ops.lstm_train import (
    lstm2_enc_last,
    lstm2_dec_head,
    lstm2_scan_reference,
    vae_train_forward,
)

def is_tpu_backend() -> bool:
    """True on a TPU backend (the remote-tunneled platform reports "axon")."""
    return jax.default_backend() in ("tpu", "axon")


def auto_fused_gate(model) -> bool:
    """The ONE auto-enable policy for the fused gate kernels: TPU backend and
    a preset ``fused_vae_gate``/``fused_mingru_gate``/``fused_attention_gate``
    supports. Every surface that defaults its fused flag (HybridScorer,
    OpenLabScorer, ``reconstruction_mse(fused="auto")``) must route through
    this helper so a policy change cannot leave one surface on the slow path.

    The attention kernel earned its slot on the trained 4DOF artifacts
    (tools/probe_attention_kernel.py, real chip, same-process): 100% gate and
    hybrid-prediction agreement vs the XLA path at the deployed threshold,
    +45% gate-only (105k vs 72k win/s) and +36% full hybrid (96k vs 71k)."""
    cell = getattr(model, "cell", "lstm")
    if cell == "attention":
        # the head-packed kernel needs head_dim-32 packing in <=128 lanes
        # (every VAEConfig attention preset qualifies; fused_attention.py)
        H = getattr(model, "hidden_dim", 0)
        if H % 32 or H > 128:
            return False
    return (is_tpu_backend()
            and getattr(model, "num_layers", 0) in (1, 2)
            and cell in ("lstm", "min_gru", "attention"))


__all__ = [
    "auto_fused_gate",
    "is_tpu_backend",
    "fused_vae_gate",
    "vae_params_to_kernel_weights",
    "fused_mingru_gate",
    "mingru_params_to_kernel_weights",
    "fused_attention_gate",
    "attention_params_to_kernel_weights",
    "lstm2_enc_last",
    "lstm2_dec_head",
    "lstm2_scan_reference",
    "vae_train_forward",
]
