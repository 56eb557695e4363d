from shm_tpu.ops.fused_vae import fused_vae_gate, vae_params_to_kernel_weights
from shm_tpu.ops.fused_mingru import (
    fused_mingru_gate,
    mingru_params_to_kernel_weights,
)
from shm_tpu.ops.lstm_train import (
    lstm2_enc_last,
    lstm2_dec_head,
    lstm2_scan_reference,
    vae_train_forward,
)

__all__ = [
    "fused_vae_gate",
    "vae_params_to_kernel_weights",
    "fused_mingru_gate",
    "mingru_params_to_kernel_weights",
    "lstm2_enc_last",
    "lstm2_dec_head",
    "lstm2_scan_reference",
    "vae_train_forward",
]
