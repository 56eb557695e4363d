"""shm_tpu — a TPU-native JAX framework for hybrid VAE+CNN structural health monitoring.

A ground-up rebuild of the capabilities of the reference project
``Ogunleyemma1/Hybrid-VAE-CNN-for-SHM`` (a PyTorch/NumPy script pipeline), designed
TPU-first:

* physics simulators (Newmark-beta) are batched ``jax.lax.scan`` integrators, vmapped
  over runs and jit-compiled;
* sliding-window extraction, standardization and featurization are vectorized XLA ops;
* the LSTM temporal VAE runs as a time-major ``lax.scan`` with the input projection
  hoisted into one large MXU matmul (optional Pallas fused kernel in ``shm_tpu.ops``);
* the staged gate->attribute hybrid pipeline executes fully on-device in a single
  fused pass (one VAE forward producing both the gate MSE and the CNN residual input,
  where the reference runs the VAE twice);
* scale-out is data-parallel over a ``jax.sharding.Mesh`` (``shm_tpu.parallel``).

Subpackages
-----------
- ``shm_tpu.config``    typed per-stage configuration (1-DOF, 4-DOF, openLAB)
- ``shm_tpu.sim``       Newmark-beta simulators, signal variants, fault injectors
- ``shm_tpu.data``      windowing, standardization, splits, openLAB ingestion
- ``shm_tpu.models``    LSTM-VAE and CNN model families, classical ML baselines
- ``shm_tpu.ops``       Pallas TPU kernels for the hot paths
- ``shm_tpu.train``     optax training loops (VAE, CNN) with KL annealing etc.
- ``shm_tpu.pipeline``  fused hybrid gate->attribution inference
- ``shm_tpu.serve``     production serving (bucket-batched ``HybridScorer``,
  streaming ``StreamScorer``); ``shm_tpu.serve_http`` HTTP daemon,
  ``shm_tpu.serve_batch`` cross-request dynamic batching,
  ``shm_tpu.serve_openlab`` the bridge-stage fused scorer
- ``shm_tpu.export``    AOT deployment: jax.export (StableHLO) ``.shmx``
  artifacts with weights baked in; reload + score with no model code
- ``shm_tpu.evals``     metrics (confusion matrix, PRF, ROC/PR) on-device
- ``shm_tpu.parallel``  mesh construction and data-parallel train/infer steps
- ``shm_tpu.utils``     IO, checkpointing, plotting
"""

__version__ = "0.1.0"
