from shm_tpu.train.vae import kl_anneal_sigmoid, train_vae, reconstruction_mse
from shm_tpu.train.cnn import train_cnn, weighted_focal_loss

__all__ = [
    "kl_anneal_sigmoid",
    "train_vae",
    "reconstruction_mse",
    "train_cnn",
    "weighted_focal_loss",
]
