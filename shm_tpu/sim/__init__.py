from shm_tpu.sim.newmark import (
    simulate_free_vibration_sdof,
    chain_stiffness_matrix,
    rayleigh_damping,
    compute_matrices,
    newmark_ndof,
    simulate_runs,
)
from shm_tpu.sim.forces import smoothed_gaussian_force, smoothed_gaussian_force_np
from shm_tpu.sim.signals import make_clean_variants, make_unseen_variants
from shm_tpu.sim.faults import (
    inject_noise,
    inject_spikes,
    inject_drift,
    inject_bias,
    inject_sensor_fault_triplet,
)

__all__ = [
    "simulate_free_vibration_sdof",
    "chain_stiffness_matrix",
    "rayleigh_damping",
    "compute_matrices",
    "newmark_ndof",
    "simulate_runs",
    "smoothed_gaussian_force",
    "smoothed_gaussian_force_np",
    "make_clean_variants",
    "make_unseen_variants",
    "inject_noise",
    "inject_spikes",
    "inject_drift",
    "inject_bias",
    "inject_sensor_fault_triplet",
]
