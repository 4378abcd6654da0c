"""Precision policy.

The reference keeps Nose-Hoover chain state and KE reduction buffers in
double precision even in mixed mode (CudaDrudeTGNHKernels.cpp:157,
drudeTGNH.cu:141,202) while positions/velocities are float + correction.

On TPU there is no fast f64, so the default policy is:
  - state (positions/velocities/forces) : float32
  - reductions / NH chain scalars       : float32 (the per-group KE sums are
    O(1e2-1e6 kJ/mol) over <=1e6 terms; the random component of f32 summation
    error has no systematic drift — validated against the f64 CPU path by
    tests/test_pos_err.py and the 1 ns on-chip drift measurement in
    ROADMAP.md: Drude bath resolved at 10 mK/ns)

Policies:
  "single" : everything f32
  "mixed"  : f32 state, f64 NH-chain/KE scalars (requires jax_enable_x64;
             used for CPU validation, or on TPU where the tiny (G+2, M)
             chain math tolerates emulated f64)
  "double" : everything f64 (requires jax_enable_x64; CPU ground truth)
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Precision:
    name: str
    real: jnp.dtype      # positions / velocities / forces
    accum: jnp.dtype     # KE reductions and NH chain state

    @property
    def x64_required(self) -> bool:
        return self.accum == jnp.float64 or self.real == jnp.float64


def _make(name: str) -> Precision:
    if name == "single":
        return Precision("single", jnp.dtype(jnp.float32), jnp.dtype(jnp.float32))
    if name == "mixed":
        return Precision("mixed", jnp.dtype(jnp.float32), jnp.dtype(jnp.float64))
    if name == "double":
        return Precision("double", jnp.dtype(jnp.float64), jnp.dtype(jnp.float64))
    raise ValueError(f"unknown precision {name!r}; expected single|mixed|double")


def get_precision(name_or_policy) -> Precision:
    if isinstance(name_or_policy, Precision):
        p = name_or_policy
    else:
        p = _make(name_or_policy)
    if p.x64_required and not jax.config.read("jax_enable_x64"):
        raise RuntimeError(
            f"precision {p.name!r} requires jax_enable_x64; call "
            "jax.config.update('jax_enable_x64', True) before building the system, "
            "or use precision='single'"
        )
    return p


SINGLE = _make("single")
