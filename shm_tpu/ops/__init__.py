from shm_tpu.ops.fused_vae import fused_vae_gate, vae_params_to_kernel_weights

__all__ = ["fused_vae_gate", "vae_params_to_kernel_weights"]
