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
    a preset ``fused_vae_gate``/``fused_mingru_gate`` supports. Every surface
    that defaults its fused flag (HybridScorer, OpenLabScorer,
    ``reconstruction_mse(fused="auto")``) must route through this helper so a
    policy change cannot leave one surface on the slow path."""
    return (is_tpu_backend()
            and getattr(model, "num_layers", 0) in (1, 2)
            and getattr(model, "cell", "lstm") in ("lstm", "min_gru"))


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
