"""Replica ensembles (vmap) and multi-chip sharding (mesh + pjit).

The reference is strictly single-process single-GPU (SURVEY.md section 2.8);
these are greenfield TPU-native capabilities:

  * vmap replica batching: the whole SimState is a pytree, so an ensemble is
    just a leading replica axis — `jax.vmap(step)` — optionally sharded over
    a mesh 'replica' axis.
  * spatial scaling: atom-dimension sharding over a mesh 'atom' axis with
    sharding constraints; XLA inserts the collectives (all-gathers for
    neighbor gathers, psums for the (G+2) per-bath KE reductions — the only
    global communication TGNH itself needs).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.state import SimState
from ..integrators import tgnh


def stack_states(states):
    """Stack per-replica SimStates into one batched state."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def replicate_state(state: SimState, n_replicas: int, seed: int = 0) -> SimState:
    """Broadcast one state to an ensemble, with distinct PRNG keys."""
    batched = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (n_replicas,) + x.shape), state)
    keys = jax.random.split(jax.random.PRNGKey(seed), n_replicas)
    return batched._replace(key=keys)


def make_ensemble_step(static, energy_and_forces, spec, inner_steps: int = 1,
                       neighbor_fn=None, rebuild_interval: int = 16):
    """vmapped multi-step over a replica axis: state has a leading replica
    dimension; spec is shared."""
    multi = tgnh.make_multi_step(static, energy_and_forces, inner_steps,
                                 neighbor_fn, rebuild_interval)
    return jax.vmap(lambda st: multi(spec, st))


def state_sharding(mesh: Mesh, state: SimState,
                   replica_axis: Optional[str] = "replica",
                   atom_axis: Optional[str] = "atom"):
    """NamedShardings for a (batched) SimState: per-atom arrays sharded over
    the atom axis, everything batched over the replica axis, small chain
    state replicated along atoms."""
    axes = mesh.axis_names
    rep = replica_axis if replica_axis in axes else None
    atom = atom_axis if atom_axis in axes else None

    def spec_for(path, leaf):
        name = path[-1].name if path else ""
        ndim = leaf.ndim
        parts = []
        if rep:
            parts.append(rep)  # leading replica dim
        base = len(parts)
        if name in ("positions", "velocities", "forces") and ndim > base:
            parts.append(atom)
        return NamedSharding(mesh, P(*parts)) if parts else \
            NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, state)


def shard_ensemble(mesh: Mesh, state: SimState, replica_axis="replica",
                   atom_axis="atom") -> SimState:
    shardings = state_sharding(mesh, state, replica_axis, atom_axis)
    return jax.tree.map(jax.device_put, state, shardings)


class ReplicaEnsemble:
    """User-facing batched-replica simulation: N independent copies of a
    Context's system advanced together with one vmapped (optionally
    mesh-sharded) step — BASELINE.md config 5's 'vmap replica ensemble'.

        ens = ReplicaEnsemble(ctx, n_replicas=64, mesh=mesh)
        ens.setVelocitiesToTemperature(300.0)
        ens.step(1000)
        ke = ens.kinetic_energies()        # (64,)
    """

    def __init__(self, context, n_replicas: int, mesh: Optional[Mesh] = None,
                 seed: int = 0):
        context._ensure_forces()
        self._ctx = context
        self._spec = context._spec
        self._static = context._static
        self._mesh = mesh
        self._n_replicas = n_replicas
        # neighbor structures are rebuilt per replica (vmapped cellsort) at
        # chunk boundaries, mirroring Context.step's host-chunked rebuilds
        self.state = replicate_state(
            context._state._replace(neighbors=None), n_replicas, seed=seed)
        if mesh is not None:
            self.state = shard_ensemble(mesh, self.state)
        self._step_fns = {}
        self._nbl_fn = None

    def setVelocitiesToTemperature(self, temperature: float, seed: int = 0):
        from ..units import BOLTZ
        keys = jax.random.split(jax.random.PRNGKey(seed),
                                self.state.positions.shape[0])
        sigma = jnp.sqrt(BOLTZ * temperature * self._spec.inv_mass)[:, None]
        v = jax.vmap(lambda k: jax.random.normal(
            k, self._ctx._state.velocities.shape,
            self._ctx._state.velocities.dtype) * sigma)(keys)
        self.state = self.state._replace(velocities=v)

    def _get_step(self, inner: int):
        fn = self._step_fns.get(inner)
        if fn is None:
            multi = tgnh.make_multi_step(self._static,
                                         self._ctx._energy_and_forces, inner)
            vstep = jax.vmap(lambda st: multi(self._spec, st))
            if self._mesh is not None:
                sh = state_sharding(self._mesh, self.state)
                fn = jax.jit(vstep, in_shardings=(sh,), out_shardings=sh)
            else:
                fn = jax.jit(vstep)
            self._step_fns[inner] = fn
        return fn

    def _rebuild_neighbors(self) -> None:
        """Per-replica neighbor rebuild (vmapped cellsort / cell list),
        growing the shared capacity when any replica overflows — same
        escape hatch as Context._ensure_neighbors."""
        ctx = self._ctx
        for _ in range(8):
            if self._nbl_fn is None:
                self._nbl_fn = jax.jit(jax.vmap(ctx._neighbor_fn))
            nbl = self._nbl_fn(self.state.positions, self.state.box)
            if not bool(jnp.any(nbl.overflow)):
                break
            if ctx._cp_cfg is not None:
                from ..forces import cellpair
                ctx._nb_kwargs["capacity"] = cellpair.grow(
                    ctx._cp_cfg, self._static.n_atoms).capacity
            else:
                from ..forces import neighborlist
                ctx._nbl_cfg = neighborlist.grow(ctx._nbl_cfg,
                                                 self._static.n_atoms)
                ctx._rebind_neighbor_fn()
            ctx._build_potential()
            self._nbl_fn = None
            self._step_fns.clear()
        else:
            raise RuntimeError("replica neighbor structure capacity still "
                               "overflowing after growth")
        self.state = self.state._replace(neighbors=nbl)

    def _step_inner(self, steps: int) -> None:
        if self._ctx._neighbor_fn is None:
            self.state = self._get_step(int(steps))(self.state)
            return
        # chunked: rebuild per-replica neighbors every rebuild_interval
        # steps on the host boundary, scan rebuild-free steps in between
        # (a lax.cond rebuild would degrade to a select under vmap and
        # rebuild every step)
        interval = self._ctx._rebuild_interval
        remaining = int(steps)
        while remaining > 0:
            k = min(interval, remaining)
            self.state = self.state._replace(neighbors=None)
            self._rebuild_neighbors()
            self.state = self._get_step(k)(self.state)
            remaining -= k

    def step(self, steps: int) -> None:
        if self._mesh is not None:
            with self._mesh:
                self._step_inner(steps)
        else:
            self._step_inner(steps)

    def kinetic_energies(self):
        return np.asarray(self.state.ke_sum)

    def potential_energies(self):
        return np.asarray(self.state.potential_energy)

    def positions(self):
        return np.asarray(self.state.positions)
