"""Context: binds a System + DrudeTGNHIntegrator into a runnable simulation.

Provides OpenMM-shaped semantics (setPositions / setVelocities /
setVelocitiesToTemperature / getState / applyConstraints / step) on top of
the jitted TPU step.  Compilation happens once here: the potential energy
function is assembled from the System's forces, composed with virtual-site
positioning, differentiated for forces, and baked into a scanned multi-step
function.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import precision as precision_mod
from ..constraints import shake as shake_mod
from ..constraints.vsites import apply_vsites
from ..core import spec as spec_mod
from ..core.state import SimState
from ..integrators import tgnh
from ..units import BOLTZ


class State:
    """Snapshot of simulation data, OpenMM State-shaped."""

    def __init__(self, positions=None, velocities=None, forces=None,
                 kinetic_energy=None, potential_energy=None, time=None,
                 box=None, group_temperatures=None, step=None):
        self._positions = positions
        self._velocities = velocities
        self._forces = forces
        self._ke = kinetic_energy
        self._pe = potential_energy
        self._time = time
        self._box = box
        self._group_temps = group_temperatures
        self._step = step

    def getPositions(self, asNumpy: bool = True):
        return self._positions

    def getVelocities(self, asNumpy: bool = True):
        return self._velocities

    def getForces(self, asNumpy: bool = True):
        return self._forces

    def getKineticEnergy(self):
        return self._ke

    def getPotentialEnergy(self):
        return self._pe

    def getTime(self):
        return self._time

    def getStepCount(self):
        return self._step

    def getPeriodicBoxVectors(self, asNumpy: bool = True):
        return self._box

    def getGroupTemperatures(self):
        """Per-bath instantaneous temperatures [group0..G-1, COM, Drude] —
        the quantity TGNH exists to control; the reference never reports it
        directly (SURVEY.md section 5)."""
        return self._group_temps


class Context:
    def __init__(self, system, integrator, precision="single",
                 strategy: str = "auto", seed: int = 0):
        self._system = system
        self._integrator = integrator
        integrator._context = self
        self._prec = precision_mod.get_precision(precision)
        r, a = self._prec.real, self._prec.accum

        self._spec, self._static, init_edd = spec_mod.build_spec(
            system, integrator, r, a)

        # assemble the potential: sum of compiled force terms over
        # vsite-composed positions; forces via autodiff (vsite force
        # redistribution is the chain rule)
        terms = []
        for f in system.getForces():
            compiled = f.compile(system, r) if hasattr(f, "compile") else None
            if compiled and compiled[0] is not None:
                terms.append(compiled)
        spec, static = self._spec, self._static

        def potential(positions, box):
            pos = apply_vsites(spec, static, positions)
            e = jnp.zeros((), positions.dtype)
            for fn, params in terms:
                e = e + fn(params, pos, box)
            return e

        def energy_and_forces(positions, box):
            pe, grad = jax.value_and_grad(potential)(positions, box)
            return pe, -grad

        self._energy_and_forces = energy_and_forces
        self._step_fns: Dict[int, callable] = {}
        self._ke_valid = False

        # initial state
        nb = static.n_baths
        box = np.array(system.getDefaultPeriodicBoxVectors(), np.float64)
        from ..core.state import zeros_state
        st = zeros_state(static.n_atoms, nb, static.n_chains, box, r, a,
                         seed=seed)
        self._state = st._replace(eta_dot_dot=jnp.asarray(init_edd, a))
        self._forces_valid = False

    # -- state manipulation ---------------------------------------------------
    def setPositions(self, positions) -> None:
        pos = jnp.asarray(np.asarray(positions, np.float64), self._prec.real)
        if pos.shape != (self._static.n_atoms, 3):
            raise ValueError(f"positions must have shape "
                             f"({self._static.n_atoms}, 3)")
        pos = apply_vsites(self._spec, self._static, pos)
        self._state = self._state._replace(positions=pos)
        self._forces_valid = False
        self._ke_valid = False

    def getPositions(self):
        return np.asarray(self._state.positions)

    def setVelocities(self, velocities) -> None:
        vel = jnp.asarray(np.asarray(velocities, np.float64), self._prec.real)
        self._state = self._state._replace(velocities=vel)
        self._ke_valid = False

    def setVelocitiesToTemperature(self, temperature: float,
                                   seed: Optional[int] = None) -> None:
        key = jax.random.PRNGKey(0 if seed is None else seed)
        sigma = np.sqrt(BOLTZ * float(temperature)
                        * np.asarray(self._spec.inv_mass, np.float64))
        v = jax.random.normal(key, (self._static.n_atoms, 3),
                              self._prec.real) * sigma[:, None].astype(
                                  self._prec.real)
        self._state = self._state._replace(velocities=v)
        self._ke_valid = False

    def setPeriodicBoxVectors(self, a, b, c) -> None:
        box = np.array([a, b, c], np.float64)
        self._state = self._state._replace(
            box=jnp.asarray(box, self._prec.real))
        self._forces_valid = False

    def applyConstraints(self, tol: float) -> None:
        """Project current positions onto the constraint manifold."""
        spec, static = self._spec, self._static
        if static.n_shake or static.n_settle:
            idx, dist = _all_constraints(spec, static)
            delta = jnp.zeros_like(self._state.positions)
            delta = shake_mod.apply_position_constraints(
                self._state.positions, delta, spec.inv_mass, idx, dist,
                float(tol), static.shake_max_iter)
            pos = apply_vsites(spec, static,
                               self._state.positions + delta)
            self._state = self._state._replace(positions=pos)
            self._forces_valid = False

    def applyVelocityConstraints(self, tol: float) -> None:
        spec, static = self._spec, self._static
        if static.n_shake or static.n_settle:
            idx, dist = _all_constraints(spec, static)
            v = shake_mod.apply_velocity_constraints(
                self._state.positions, self._state.velocities,
                spec.inv_mass, idx, dist, float(tol), static.shake_max_iter)
            self._state = self._state._replace(velocities=v)

    # -- stepping --------------------------------------------------------------
    def _ensure_forces(self) -> None:
        if not self._forces_valid:
            pe, f = jax.jit(self._energy_and_forces)(
                self._state.positions, self._state.box)
            self._state = self._state._replace(
                forces=f, potential_energy=pe.astype(self._prec.accum))
            self._forces_valid = True

    def _get_step_fn(self, inner: int):
        fn = self._step_fns.get(inner)
        if fn is None:
            fn = jax.jit(tgnh.make_multi_step(
                self._static, self._energy_and_forces, inner))
            self._step_fns[inner] = fn
        return fn

    def step(self, steps: int) -> None:
        """Advance the simulation.  One jitted lax.scan call per invocation
        (compiled once per distinct `steps` value)."""
        self._ensure_forces()
        self._state = self._get_step_fn(int(steps))(self._spec, self._state)
        self._ke_valid = True

    def _on_step_size_changed(self) -> None:
        self._spec = self._spec._replace(
            dt=jnp.asarray(self._integrator.getStepSize(), self._prec.accum))

    # -- queries ----------------------------------------------------------------
    def getState(self, positions: bool = False, velocities: bool = False,
                 forces: bool = False, energy: bool = False,
                 groups: bool = False, enforcePeriodicBox: bool = False,
                 **_) -> State:
        st = self._state
        kwargs = {"time": float(st.time), "step": int(st.step),
                  "box": np.asarray(st.box)}
        if positions:
            pos = np.asarray(st.positions, np.float64)
            if enforcePeriodicBox:
                box = np.diagonal(np.asarray(st.box))
                com_shift = np.floor(pos / box)
                pos = pos - com_shift * box
            kwargs["positions"] = pos
        if velocities:
            kwargs["velocities"] = np.asarray(st.velocities, np.float64)
        if forces:
            self._ensure_forces()
            kwargs["forces"] = np.asarray(self._state.forces, np.float64)
        if energy or groups:
            self._ensure_forces()
            kwargs["potential_energy"] = float(self._state.potential_energy)
            if self._ke_valid:
                ke = float(st.ke_sum)
            else:
                m = np.asarray(self._spec.mass, np.float64)
                v = np.asarray(st.velocities, np.float64)
                ke = 0.5 * float(np.sum(m * np.sum(v * v, axis=-1)))
            kwargs["kinetic_energy"] = ke
        if groups:
            # group_ke holds 2*KE per bath; T_g = 2KE_g / (dof_g kB)
            two_ke = np.asarray(st.group_ke, np.float64)
            nkbt = np.asarray(self._spec.nh_nkbt, np.float64)
            temps = np.where(nkbt > 0, two_ke / np.where(nkbt > 0, nkbt, 1.0),
                             0.0)
            # convert NkbT-relative ratio to kelvin via the bath targets
            targets = np.full_like(temps, self._integrator.getTemperature())
            targets[-1] = self._integrator.getDrudeTemperature()
            kwargs["group_temperatures"] = temps * targets
        return State(**kwargs)

    def getSystem(self):
        return self._system

    def getIntegrator(self):
        return self._integrator


def _all_constraints(spec, static):
    idx = spec.shake_idx
    dist = spec.shake_dist
    if static.n_settle:
        tri_idx = jnp.concatenate([
            spec.settle_idx[:, (0, 1)], spec.settle_idx[:, (0, 2)],
            spec.settle_idx[:, (1, 2)]], axis=0)
        tri_dist = jnp.concatenate([
            spec.settle_dist[:, 0], spec.settle_dist[:, 0],
            spec.settle_dist[:, 1]], axis=0)
        idx = jnp.concatenate([idx, tri_idx], axis=0)
        dist = jnp.concatenate([dist, tri_dist], axis=0)
    return idx, dist
