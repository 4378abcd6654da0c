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
        self._rebuild_fn = None
        self._jit_potential = None
        self._pe_stale = False
        self._hardwall_warned = False
        self._drift_warned = False

    def setVelocitiesToTemperature(self, temperature: float, seed: int = 0):
        from ..units import BOLTZ
        keys = jax.random.split(jax.random.PRNGKey(seed),
                                self.state.positions.shape[0])
        sigma = jnp.sqrt(BOLTZ * temperature * self._spec.inv_mass)[:, None]
        v = jax.vmap(lambda k: jax.random.normal(
            k, self._ctx._state.velocities.shape,
            self._ctx._state.velocities.dtype) * sigma)(keys)
        self.state = self.state._replace(velocities=v)
        if self._mesh is not None:
            # the fresh velocity array is uncommitted; restore the ensemble
            # sharding or the step's pinned in_shardings reject it
            self.state = shard_ensemble(self._mesh, self.state)

    def _get_step(self, inner: int):
        fn = self._step_fns.get(inner)
        if fn is None:
            multi = tgnh.make_multi_step(self._static,
                                         self._ctx._energy_and_forces, inner,
                                         forces_fn=self._ctx._forces_only)
            vstep = jax.vmap(lambda st: multi(self._spec, st))
            if self._mesh is not None:
                sh = state_sharding(self._mesh, self.state)
                fn = jax.jit(vstep, in_shardings=(sh,), out_shardings=sh)
            else:
                fn = jax.jit(vstep)
            self._step_fns[inner] = fn
        return fn

    def _get_rebuild(self):
        """Jitted vmapped state -> state neighbor refresh with latched
        flags (overflow / full-skin drift / excluded-pair span), dispatched
        between interval scans with NO readback — the same host-pipelined
        [rebuild] -> [scan] pattern as Context.step (async dispatch hides
        the ~30 ms/call host latency as long as nothing synchronizes)."""
        if self._rebuild_fn is None:
            ctx = self._ctx
            skin = (ctx._cp_cfg.skin if ctx._cp_cfg is not None
                    else getattr(ctx._nbl_cfg, "skin", None))
            rebuild = tgnh._make_neighbor_rebuild(ctx._neighbor_fn, skin)
            self._rebuild_fn = jax.jit(jax.vmap(rebuild))
        return self._rebuild_fn

    def _grow_capacity(self) -> None:
        """Grow the shared neighbor-structure capacity from the measured
        max cell occupancy across ALL replicas (mirrors
        Context._grow_pair_capacity; +8 floor guarantees progress)."""
        ctx = self._ctx
        if ctx._cp_cfg is not None:
            cfg = ctx._cp_cfg
            pos = np.asarray(self.state.positions, np.float64)   # (R, N, 3)
            boxd = np.stack([np.diagonal(b) for b in
                             np.asarray(self.state.box, np.float64)])
            grid = np.asarray(cfg.grid)
            frac = pos / boxd[:, None, :]
            frac = frac - np.floor(frac)
            cell = np.minimum((frac * grid).astype(np.int64), grid - 1)
            flat = ((cell[..., 0] * grid[1] + cell[..., 1]) * grid[2]
                    + cell[..., 2])
            flat = flat + np.arange(pos.shape[0])[:, None] * cfg.n_cells
            occ_max = int(np.bincount(
                flat.ravel(), minlength=pos.shape[0] * cfg.n_cells).max())
            new_cap = max(-(-int(occ_max * 1.1 + 2) // 8) * 8,
                          cfg.capacity + 8)
            ctx._nb_kwargs["capacity"] = min(new_cap, self._static.n_atoms)
            ctx._build_potential()
        else:
            from ..forces import neighborlist
            ctx._nbl_cfg = neighborlist.grow(ctx._nbl_cfg,
                                             self._static.n_atoms)
            ctx._rebind_neighbor_fn()
        self._nbl_fn = None
        self._rebuild_fn = None
        self._jit_potential = None
        self._step_fns.clear()

    def _rebuild_neighbors(self) -> None:
        """Cold per-replica neighbor rebuild (vmapped cellsort / cell
        list), growing the shared capacity when any replica overflows —
        same escape hatch as Context._ensure_neighbors.  Used at step()
        entry and after a chunk retry; steady-state rebuilds go through
        the readback-free _get_rebuild path instead."""
        ctx = self._ctx
        for _ in range(8):
            if self._nbl_fn is None:
                self._nbl_fn = jax.jit(jax.vmap(ctx._neighbor_fn))
            nbl = self._nbl_fn(self.state.positions, self.state.box)
            if not bool(jnp.any(nbl.overflow)):
                break
            self._grow_capacity()
        else:
            raise RuntimeError("replica neighbor structure capacity still "
                               "overflowing after growth")
        self.state = self.state._replace(neighbors=nbl)

    def _step_inner(self, steps: int) -> None:
        if self._ctx._neighbor_fn is None:
            self.state = self._get_step(int(steps))(self.state)
            return
        # host-pipelined [vmapped rebuild] -> [interval-step scan] pairs
        # with no readbacks; latched overflow checked once per
        # 8*interval-step chunk, chunk re-run from the saved state after
        # capacity growth (exactly Context.step's pattern — an in-scan
        # lax.cond rebuild would degrade to a select under vmap and
        # rebuild every step)
        interval = self._ctx._rebuild_interval
        chunk = 8 * interval
        remaining = int(steps)
        while remaining > 0:
            k_chunk = min(chunk, remaining)
            if self.state.neighbors is None:
                self._rebuild_neighbors()
            saved = self.state
            for _ in range(8):
                st = saved
                rebuild = self._get_rebuild()
                r = k_chunk
                while r > 0:
                    k = min(interval, r)
                    st = rebuild(st)
                    st = self._get_step(k)(st)
                    r -= k
                if bool(jnp.any(st.neighbors.overflow)):
                    # slots were dropped from the overflowing rebuild
                    # onward — every step since is invalid
                    self.state = saved._replace(neighbors=None)
                    self._grow_capacity()
                    self._rebuild_neighbors()
                    saved = self.state
                    continue
                self.state = st
                break
            else:
                raise RuntimeError("replica neighbor structure capacity "
                                   "still overflowing after growth")
            remaining -= k_chunk
        self._check_flags()

    def _check_flags(self) -> None:
        """One host readback per step() call: surface the device-latched
        per-replica guard flags (hard-wall runaway, full-skin drift,
        excluded-pair cell span) with Context's semantics."""
        import warnings
        hw = self.state.hardwall_runaway
        if hw is not None and bool(jnp.any(hw)):
            if self._ctx._hardwall_strict:
                raise RuntimeError(
                    "a replica's Drude particle moved too far beyond the "
                    "hard wall constraint (displacement exceeded 2x "
                    "maxDrudeDistance); the ensemble has likely become "
                    "unstable — reduce the step size")
            if not self._hardwall_warned:
                self._hardwall_warned = True
                warnings.warn(
                    "a Drude particle transiently moved >2x past the hard "
                    "wall in at least one replica (bounced back; "
                    "hardwall_strict=True raises instead)",
                    RuntimeWarning, stacklevel=3)
        nbl = self.state.neighbors
        if nbl is None:
            return
        drift = getattr(nbl, "drift_exceeded", None)
        if (drift is not None and not self._drift_warned
                and bool(jnp.any(drift))):
            self._drift_warned = True
            warnings.warn(
                "an atom moved further than the neighbor skin between "
                "rebuilds in at least one replica — pair interactions may "
                "have been missed; reduce the step size or the rebuild "
                "interval", RuntimeWarning, stacklevel=3)
        span = getattr(nbl, "excl_span_exceeded", None)
        if span is not None and bool(jnp.any(span)):
            raise RuntimeError(
                "an excluded pair stretched across >= 2 cells mid-run in "
                "at least one replica while the Pallas far-offset "
                "exclusion skip was active — recent forces double-counted "
                "it (pass nb_options={'pallas_excl_skip': False} if the "
                "geometry is intentional)")

    def step(self, steps: int) -> None:
        if self._mesh is not None:
            with self._mesh:
                self._step_inner(steps)
        else:
            self._step_inner(steps)
        if self._ctx._forces_only is not None:
            self._pe_stale = True

    def kinetic_energies(self):
        return np.asarray(self.state.ke_sum)

    def potential_energies(self):
        """Per-replica potential energies, recomputed on demand when the
        force-only step path left state.potential_energy stale (same
        semantics as Context._ensure_pe)."""
        if self._pe_stale:
            if (self.state.neighbors is None
                    and self._ctx._neighbor_fn is not None):
                self._rebuild_neighbors()
            if self._jit_potential is None:
                self._jit_potential = jax.jit(jax.vmap(
                    lambda p, b, nb, pe: self._ctx._potential(p, b, nb, pe)))
            pe = self._jit_potential(self.state.positions, self.state.box,
                                     self.state.neighbors,
                                     self.state.pos_err)
            self.state = self.state._replace(
                potential_energy=pe.astype(self.state.eta.dtype))
            self._pe_stale = False
        return np.asarray(self.state.potential_energy)

    def positions(self):
        return np.asarray(self.state.positions)
