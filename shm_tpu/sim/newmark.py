"""Newmark-beta structural dynamics integrators as batched ``lax.scan`` kernels.

TPU-native rebuild of the reference simulators:

- 1-DOF free vibration: ``1_DOF/Scripts/signals_1dof.py:24-64`` — a sequential Python
  loop over ~3001 steps; here one ``lax.scan`` with scalar carries.
- N-DOF chain: ``4DOF/Scripts/utils/simulation_4dof.py:80-137`` — a Python loop of
  dense 4x4 matvecs; here the per-step update is a scan body of fused matvecs, and
  whole *batches of runs* integrate in parallel via ``vmap`` (the reference simulates
  runs one at a time on host).

Eigen-analysis for Rayleigh damping uses the symmetric trick
``eig(M^-1 K) == eigh(M^-1/2 K M^-1/2)`` (M diagonal) so it runs on TPU, where
nonsymmetric ``eigvals`` is unsupported.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from shm_tpu.config import SDOFParams, SystemConfig


# ---------------------------------------------------------------------------
# 1-DOF free vibration
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("n",))
def _sdof_scan(m, k, c, x0, v0, dt, beta, gamma, n):
    a0 = (-k * x0 - c * v0) / m
    k_eff = m / (beta * dt**2) + gamma * c / (beta * dt) + k

    c0 = 1.0 / (beta * dt**2)
    c1 = 1.0 / (beta * dt)
    c2 = 1.0 / (2.0 * beta) - 1.0

    def step(carry, _):
        x, v, a = carry
        b = m * (c0 * x + c1 * v + c2 * a) - c * (v + (1.0 - gamma) * dt * a)
        x_n = b / k_eff
        a_n = c0 * (x_n - x) - c1 * v - c2 * a
        v_n = v + dt * ((1.0 - gamma) * a + gamma * a_n)
        return (x_n, v_n, a_n), (x_n, v_n, a_n)

    (_, _, _), (xs, vs, accs) = jax.lax.scan(step, (x0, v0, a0), None, length=n - 1)
    x = jnp.concatenate([jnp.array([x0]), xs])
    v = jnp.concatenate([jnp.array([v0]), vs])
    a = jnp.concatenate([jnp.array([a0]), accs])
    return x, v, a


def simulate_free_vibration_sdof(p: SDOFParams = SDOFParams()):
    """Free vibration of a single-DOF oscillator. Returns ``(t, x, v, a)``.

    Parity: ``simulate_free_vibration`` at 1_DOF/Scripts/signals_1dof.py:24-64
    (time grid ``np.arange(0, t_total + dt, dt)``).
    """
    t = jnp.arange(0.0, p.t_total + p.dt, p.dt)
    n = int(t.shape[0])
    x, v, a = _sdof_scan(
        jnp.float64(p.m) if jax.config.jax_enable_x64 else jnp.float32(p.m),
        p.k, p.c, p.x0, p.v0, p.dt, 0.25, 0.5, n,
    )
    return t, x, v, a


# ---------------------------------------------------------------------------
# N-DOF chain system
# ---------------------------------------------------------------------------


def chain_stiffness_matrix(k: jax.Array) -> jax.Array:
    """Chain-topology stiffness matrix from spring constants (nd,) -> (nd, nd).

    Parity: ``compute_matrices`` K assembly at simulation_4dof.py:48-61, built
    vectorized: K = diag(k_i + k_{i+1}) - offdiag(k_{i+1}).
    """
    nd = k.shape[0]
    k_next = jnp.concatenate([k[1:], jnp.zeros((1,), k.dtype)])  # k_{i+1}, 0 at end
    diag = k + k_next
    off = -k[1:]
    K = jnp.diag(diag) + jnp.diag(off, 1) + jnp.diag(off, -1)
    return K


def rayleigh_damping(M: jax.Array, K: jax.Array, zeta: float | jax.Array) -> jax.Array:
    """Rayleigh damping C = alpha*M + beta*K fitted to the first two modes.

    Parity: simulation_4dof.py:63-76. Uses the symmetric similarity transform
    ``eigh(M^-1/2 K M^-1/2)`` (valid for diagonal mass) instead of nonsymmetric
    ``eigvals`` so it lowers to TPU.
    """
    m_diag = jnp.diagonal(M)
    inv_sqrt_m = 1.0 / jnp.sqrt(m_diag)
    A = inv_sqrt_m[:, None] * K * inv_sqrt_m[None, :]
    eigvals = jnp.linalg.eigvalsh(A)
    eigvals = jnp.clip(eigvals, 1e-12, None)
    omegas = jnp.sqrt(eigvals)  # ascending
    o1, o2 = omegas[0], omegas[1]
    Amat = jnp.array([[1.0 / (2 * o1), o1 / 2], [1.0 / (2 * o2), o2 / 2]])
    z = jnp.array([zeta, zeta], dtype=Amat.dtype) * jnp.ones((2,), Amat.dtype)
    ab = jnp.linalg.solve(Amat, z)
    alpha = jnp.maximum(ab[0], 0.0)
    beta = jnp.maximum(ab[1], 1e-4)
    return alpha * M + beta * K


def compute_matrices(m: jax.Array, k: jax.Array, zeta) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(M, C, K) for a chain system. Parity: simulation_4dof.py:44-77."""
    M = jnp.diag(m)
    K = chain_stiffness_matrix(k)
    C = rayleigh_damping(M, K, zeta)
    return M, C, K


def newmark_ndof(
    M: jax.Array,
    C: jax.Array,
    K: jax.Array,
    force: jax.Array,
    dt: float,
    beta: float = 0.25,
    gamma: float = 0.5,
    clip: float = 1e5,
) -> jax.Array:
    """Newmark-beta integration of M a + C v + K x = F(t).

    ``force``: (steps, nd). Returns (steps, 3*nd) laid out ``[x | v | a]`` matching
    the reference's DataFrame columns x1..xN, v1..vN, a1..aN
    (simulation_4dof.py:135-137). Zero initial conditions; a0 from equilibrium.
    """
    nd = M.shape[0]
    steps = force.shape[0]

    a0c = 1.0 / (beta * dt**2)
    a1c = gamma / (beta * dt)
    a2c = 1.0 / (beta * dt)
    a3c = 1.0 / (2.0 * beta) - 1.0
    a4c = gamma / beta - 1.0
    a5c = (dt / 2.0) * (gamma / beta - 2.0)

    K_eff = a0c * M + a1c * C + K
    K_eff_inv = jnp.linalg.inv(K_eff)
    M_inv = jnp.linalg.inv(M)

    x0 = jnp.zeros((nd,), force.dtype)
    v0 = jnp.zeros((nd,), force.dtype)
    acc0 = jnp.nan_to_num(M_inv @ (force[0] - C @ v0 - K @ x0), nan=0.0)

    def step(carry, Ft):
        x, v, a = carry
        P = Ft + M @ (a0c * x + a2c * v + a3c * a) + C @ (a1c * x + a4c * v + a5c * a)
        x_n = K_eff_inv @ P
        a_n = a0c * (x_n - x) - a2c * v - a3c * a
        v_n = v + dt * ((1.0 - gamma) * a + gamma * a_n)
        x_n = jnp.clip(x_n, -clip, clip)
        v_n = jnp.clip(v_n, -clip, clip)
        a_n = jnp.clip(a_n, -clip, clip)
        return (x_n, v_n, a_n), (x_n, v_n, a_n)

    _, (xs, vs, accs) = jax.lax.scan(step, (x0, v0, acc0), force[1:])
    xs = jnp.concatenate([x0[None], xs])
    vs = jnp.concatenate([v0[None], vs])
    accs = jnp.concatenate([acc0[None], accs])
    return jnp.concatenate([xs, vs, accs], axis=1)  # (steps, 3*nd)


@jax.jit
def _simulate_runs_jit(mass, stiffness, zeta, forces, dt, beta, gamma):
    def one(m, k, z, F):
        M, C, K = compute_matrices(m, k, z)
        return newmark_ndof(M, C, K, F, dt, beta, gamma)

    return jax.vmap(one)(mass, stiffness, zeta, forces)


def simulate_runs(
    mass: jax.Array,
    stiffness: jax.Array,
    zeta: jax.Array,
    forces: jax.Array,
    cfg: SystemConfig = SystemConfig(),
) -> jax.Array:
    """Integrate a batch of R runs in parallel.

    mass, stiffness: (R, nd); zeta: (R,); forces: (R, steps, nd).
    Returns (R, steps, 3*nd). This is the TPU replacement for the reference's
    run-at-a-time host loop (01_generate_normal_runs.py:115-129).
    """
    return _simulate_runs_jit(
        jnp.asarray(mass), jnp.asarray(stiffness), jnp.asarray(zeta),
        jnp.asarray(forces), cfg.dt, cfg.beta, cfg.gamma,
    )


__all__ = [
    "simulate_free_vibration_sdof",
    "chain_stiffness_matrix",
    "rayleigh_damping",
    "compute_matrices",
    "newmark_ndof",
    "simulate_runs",
]
