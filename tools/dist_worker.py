"""Worker for the multi-process DCN integration tests (tests/test_distributed.py).

Each process: join the distributed runtime, build the global mesh, run ONE
data-parallel VAE train step on its local batch shard, print the global loss.

argv: rank num_processes port [flags]. Env (set by the parent):
JAX_PLATFORMS=cpu, XLA_FLAGS=--xla_force_host_platform_device_count=<N>.

Failure-injection flags (the worker-death characterization tests):
  --init-timeout S   pass initialization_timeout=S to jax.distributed
  --die-after-init   exit(17) right after distributed init completes —
                     simulates a worker crashing between startup and the
                     first collective
  --die-after-step   run the first train step normally, then _exit(9)
                     without shutdown — simulates a steady-state crash;
                     surviving ranks attempt a second step
  --two-steps        run a SECOND train step after the first (the
                     survivor's collective in the steady-state-death test:
                     pair rank 0 --two-steps with rank 1 --die-after-step)
"""

import sys


def main() -> None:
    args = sys.argv[1:]
    die_after_init = "--die-after-init" in args
    die_after_step = "--die-after-step" in args
    two_steps = "--two-steps" in args
    args = [a for a in args
            if a not in ("--die-after-init", "--die-after-step",
                         "--two-steps")]
    init_timeout = None
    if "--init-timeout" in args:
        i = args.index("--init-timeout")
        init_timeout = int(args[i + 1])
        del args[i:i + 2]
    rank, nproc, port = int(args[0]), int(args[1]), args[2]

    from shm_tpu.parallel import distributed as dist

    if nproc > 1:
        dist.initialize(f"localhost:{port}", nproc, rank,
                        initialization_timeout=init_timeout)
    if die_after_init:
        print("DYING after init", flush=True)
        raise SystemExit(17)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from shm_tpu.config import TrainConfig, VAEConfig
    from shm_tpu.models import vae_from_config
    from shm_tpu.parallel import make_dp_vae_train_step
    from shm_tpu.train.vae import make_optimizer

    mesh = dist.make_global_mesh()
    n_dev = len(jax.devices())
    B, T, D = 16, 10, 4
    assert B % n_dev == 0

    vae = vae_from_config(VAEConfig(D, 3, 8, 2, 0.0, use_layernorm=True))
    # identical data/init on every process (same seeds)
    W = np.asarray(jax.random.normal(jax.random.PRNGKey(0), (B, T, D)))
    params = vae.init({"params": jax.random.PRNGKey(1)},
                      jnp.zeros((2, T, D)))["params"]
    tx = make_optimizer(TrainConfig(batch_size=B, lr=1e-3, weight_decay=1e-5,
                                    grad_clip=2.0))
    opt_state = tx.init(params)

    params = dist.replicate_from_host(params, mesh)
    opt_state = dist.replicate_from_host(opt_state, mesh)
    per = B // nproc
    Wg = dist.host_local_batch_to_global(W[rank * per:(rank + 1) * per], mesh)

    step = make_dp_vae_train_step(vae, tx, mesh)
    params, opt_state, loss = step(params, opt_state, Wg,
                                   jax.random.PRNGKey(2), jnp.float32(0.5))
    print(f"LOSS {float(loss):.9f}", flush=True)
    if die_after_step:
        import os

        print("DYING after step", flush=True)
        os._exit(9)
    if not die_after_step and two_steps:
        params, opt_state, loss2 = step(params, opt_state, Wg,
                                        jax.random.PRNGKey(3),
                                        jnp.float32(0.5))
        print(f"LOSS2 {float(loss2):.9f}", flush=True)
    if nproc > 1:
        dist.shutdown()


if __name__ == "__main__":
    main()
