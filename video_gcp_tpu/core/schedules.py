"""Training-step-driven schedules (blox Updater surface, functional form).

The reference mutates module buffers each step via ``Updater`` objects advanced
by ``model.step()`` (base_model.py:24-25): ``LinearUpdater`` implements KL-weight
burn-in (base_gcp.py:121-128) and ``ExponentialDecayUpdater`` decays the DTW
matching temperature (adaptive.py:23-26). Under jit, mutation becomes a pure
function of the global step, evaluated inside the train step — no state to
carry, nothing to checkpoint.
"""
from __future__ import annotations

import jax.numpy as jnp


def linear_ramp(step, n_steps: int, target: float, start: float = 0.0):
    """Linear burn-in from ``start`` to ``target`` over ``n_steps``
    (blox LinearUpdater)."""
    frac = jnp.clip(step / max(n_steps, 1), 0.0, 1.0)
    return start + (target - start) * frac


def exponential_decay(step, initial: float, tenthlife: int, min_limit: float = 0.0):
    """Exponential decay with a tenth-life in steps: value(tenthlife) =
    initial / 10 (blox ExponentialDecayUpdater; matching temp decay,
    adaptive.py:25-26)."""
    decay = 0.1 ** (step / max(tenthlife, 1))
    return jnp.maximum(initial * decay, min_limit)


def kl_weight_at(step, kl_weight: float, burn_in_steps):
    """KL weight schedule: constant, or linear burn-in when configured
    (base_gcp.py:121-128)."""
    if burn_in_steps is None:
        return kl_weight
    return linear_ramp(step, burn_in_steps, kl_weight)


def matching_temp_at(step, temp: float, tenthlife: int, min_limit: float):
    """Matching temperature schedule: constant when tenthlife == -1."""
    if tenthlife == -1:
        return temp
    return exponential_decay(step, temp, tenthlife, min_limit)
