from shm_tpu.models.lstm import LSTMLayer, LSTMStack
from shm_tpu.models.minrnn import MinGRULayer, MinGRUStack, linear_recurrence
from shm_tpu.models.attention import AttentionStack, TransformerBlock
from shm_tpu.models.vae import TemporalVAE, vae_from_config
from shm_tpu.models.cnn import CNN4DOF, CNNOpenLab, cnn_from_config

__all__ = [
    "LSTMLayer",
    "LSTMStack",
    "MinGRULayer",
    "MinGRUStack",
    "linear_recurrence",
    "AttentionStack",
    "TransformerBlock",
    "TemporalVAE",
    "vae_from_config",
    "CNN4DOF",
    "CNNOpenLab",
    "cnn_from_config",
]
