"""1-DOF signal-variant generators (seen + unseen families), pure jnp.

Parity targets:
- ``make_clean_variants`` at 1_DOF/Scripts/signals_1dof.py:67-128
- ``make_unseen_variants`` / ``_triangle_wave`` / ``_square_wave`` at :131-189

Each generator returns a dict of 12 named channels; ``variants_to_matrix`` stacks
them into the (T, 12) channel order used by the reference CSVs.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

SEEN_COLUMNS = [
    "x_original", "x_drift", "x_amplitude_scaled", "x_lowfreq",
    "v_original", "v_drift", "v_amplitude_scaled", "v_lowfreq",
    "a_original", "a_drift", "a_amplitude_scaled", "a_lowfreq",
]

UNSEEN_COLUMNS = [
    "x_original", "x_envelope", "x_triangle", "x_square",
    "v_original", "v_envelope", "v_triangle", "v_square",
    "a_original", "a_envelope", "a_triangle", "a_square",
]


def make_clean_variants(
    t: jax.Array,
    x: jax.Array,
    v: jax.Array,
    a: jax.Array,
    drift_rate: float = 0.001,
    amp_scale: float = 1.5,
    lowfreq_factor: float = 0.6,
) -> Dict[str, jax.Array]:
    """Four variants per channel: original / drift / amplitude-scaled / low-freq.

    Low-frequency variant is time-stretching ``x_low(t) = x(alpha t)`` via linear
    interpolation (signals_1dof.py:104-113).
    """
    if not (0.0 < lowfreq_factor <= 1.0):
        raise ValueError(f"lowfreq_factor must be in (0, 1], got {lowfreq_factor}")
    t_scaled = t * lowfreq_factor
    out: Dict[str, jax.Array] = {}
    for name, y in (("x", x), ("v", v), ("a", a)):
        out[f"{name}_original"] = y
        out[f"{name}_drift"] = y + drift_rate * t
        out[f"{name}_amplitude_scaled"] = y * amp_scale
        out[f"{name}_lowfreq"] = jnp.interp(t_scaled, t, y)
    return out


def _triangle_wave(t: jax.Array, f: float) -> jax.Array:
    return (2.0 / jnp.pi) * jnp.arcsin(jnp.sin(2.0 * jnp.pi * f * t))


def _square_wave(t: jax.Array, f: float) -> jax.Array:
    return jnp.sign(jnp.sin(2.0 * jnp.pi * f * t))


def _gradient(y: jax.Array, dt: jax.Array) -> jax.Array:
    """np.gradient semantics: central differences, one-sided at edges."""
    fwd = (y[1] - y[0]) / dt
    bwd = (y[-1] - y[-2]) / dt
    mid = (y[2:] - y[:-2]) / (2.0 * dt)
    return jnp.concatenate([fwd[None], mid, bwd[None]])


def make_unseen_variants(
    t: jax.Array,
    amplitude: float = 0.01,
    base_freq_hz: float = 0.33,
) -> Dict[str, jax.Array]:
    """Unseen analytic signals at the same amplitude scale; v/a via np.gradient."""
    w = 2.0 * jnp.pi * base_freq_hz
    x_ori = amplitude * jnp.sin(w * t)
    env = 0.5 * (1.0 + jnp.sin(0.2 * w * t))
    x_env = amplitude * env * jnp.sin(w * t)
    x_tri = amplitude * _triangle_wave(t, base_freq_hz)
    x_sqr = amplitude * _square_wave(t, base_freq_hz)

    dt = t[1] - t[0]
    out: Dict[str, jax.Array] = {}
    for name, xsig in (("original", x_ori), ("envelope", x_env),
                       ("triangle", x_tri), ("square", x_sqr)):
        vsig = _gradient(xsig, dt)
        asig = _gradient(vsig, dt)
        out[f"x_{name}"] = xsig
        out[f"v_{name}"] = vsig
        out[f"a_{name}"] = asig
    return out


def variants_to_matrix(variants: Dict[str, jax.Array], columns) -> jax.Array:
    """Stack named channels into a (T, F) matrix in the given column order."""
    return jnp.stack([variants[c] for c in columns], axis=1)


__all__ = [
    "SEEN_COLUMNS",
    "UNSEEN_COLUMNS",
    "make_clean_variants",
    "make_unseen_variants",
    "variants_to_matrix",
]
