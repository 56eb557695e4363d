from shm_tpu.parallel.mesh import (
    make_mesh,
    make_mesh_opt,
    shard_batch,
    replicate,
    make_dp_vae_train_step,
    make_dp_cnn_train_step,
    make_dp_hybrid_fn,
    make_dp_hybrid_shardmap,
)

__all__ = [
    "make_mesh",
    "make_mesh_opt",
    "shard_batch",
    "replicate",
    "make_dp_vae_train_step",
    "make_dp_cnn_train_step",
    "make_dp_hybrid_fn",
    "make_dp_hybrid_shardmap",
]
