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
from ..constraints.vsites import apply_vsites, spread_vsite_forces
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
                 strategy: str = "auto", seed: int = 0,
                 hardwall_strict: bool = False,
                 nb_options: dict | None = None,
                 ensemble_r: int = 1):
        # ensemble_r > 1: the system is a flattened replica ensemble
        # (replica-major atom order) — set by parallel/flatrep.py, which
        # also passes nb_options={"ensemble": (R, rx, rz)} so the cellpair
        # grid embeds the replicas; NH baths become per-replica (R, G+2)
        self._system = system
        self._integrator = integrator
        self._ensemble_r = int(ensemble_r)
        integrator._context = self
        # hardwall_strict=True raises when a Drude moves >2x past the hard
        # wall (the Reference platform's throw,
        # ReferenceDrudeTGNHKernels.cpp:311-312); the default matches the
        # CUDA platform (bounce silently, drudeTGNH.cu:471-574) but still
        # latches the sticky hardwallRunaway flag and warns once
        self._hardwall_strict = bool(hardwall_strict)
        self._hardwall_warned = False
        self._drift_warned = False
        self._prec = precision_mod.get_precision(precision)
        r, a = self._prec.real, self._prec.accum

        self._spec, self._static, init_edd = spec_mod.build_spec(
            system, integrator, r, a, ensemble_r=self._ensemble_r)

        self._strategy = strategy
        # nb_options: advanced strategy tuning forwarded to the nonbonded
        # compile (skin, capacity, grid_x_multiple for slab-divisible cell
        # grids, use_pallas, ...)
        self._nb_kwargs: dict = dict(nb_options or {})
        self._ke_valid = False
        self._build_potential()

        # initial state
        nb = self._static.n_baths
        box = np.array(system.getDefaultPeriodicBoxVectors(), np.float64)
        from ..core.state import zeros_state
        st = zeros_state(self._static.n_atoms, nb, self._static.n_chains,
                         box, r, a, seed=seed, ensemble_r=self._ensemble_r)
        self._state = st._replace(eta_dot_dot=jnp.asarray(init_edd, a))
        self._forces_valid = False

    def _build_potential(self) -> None:
        """(Re)compile force terms into the total potential + neighbor
        machinery.  Re-run when pair-structure capacities grow."""
        r = self._prec.real
        spec, static = self._spec, self._static
        system = self._system
        terms = []
        for f in system.getForces():
            if hasattr(f, "compile"):
                kw = {}
                if type(f).__name__ == "NonbondedForce":
                    kw["strategy"] = self._strategy
                    kw["nb_kwargs"] = dict(self._nb_kwargs)
                compiled = f.compile(system, r, **kw)
                if compiled and compiled[0] is not None:
                    terms.append(compiled)

        self._terms = terms  # (fn, params) pairs; parallel/sharded.py reuses
        self._nbl_cfg = None
        self._cp_cfg = None
        self._neighbor_fn = None
        self._rebuild_interval = None
        nbl_terms = [t for t in terms
                     if getattr(t[0], "needs_neighbors", False)]
        if nbl_terms:
            t0 = nbl_terms[0][0]
            if hasattr(t0, "cellpair_cfg"):
                from ..forces import cellpair
                cfg = t0.cellpair_cfg
                self._cp_cfg = cfg
                # when the Pallas sweep skips the exclusion test at far
                # stencil offsets, every rebuild must verify (and latch)
                # that no excluded pair spans >= 2 cells
                excl_ij = (t0.nbl_exclusions
                           if getattr(t0, "pallas_excl_skip", False)
                           else None)

                def neighbor_fn(positions, box, rep_scale=None):
                    if rep_scale is not None:
                        # flat-ensemble NPT: bin STORED coordinates
                        # (physical / s_r) on the shared template grid
                        R = cfg.n_replicas
                        positions = (positions.reshape(R, -1, 3)
                                     / rep_scale[:, None, None].astype(
                                         positions.dtype)).reshape(-1, 3)
                    b = box if cfg.triclinic else jnp.diagonal(box)
                    return cellpair.build_cellsort(positions, b, cfg,
                                                   excl_ij=excl_ij,
                                                   rep_scale=rep_scale)
                self._neighbor_fn = neighbor_fn
                self._rebuild_interval = cfg.rebuild_interval
            else:
                from ..forces import neighborlist
                cutoff = max(t[0].nbl_cutoff for t in nbl_terms)
                box0 = np.diagonal(np.array(
                    system.getDefaultPeriodicBoxVectors(), np.float64))
                self._nbl_cfg = neighborlist.make_config(
                    cutoff, box0, static.n_atoms, **{
                        k: v for k, v in self._nb_kwargs.items()
                        if k in ("skin", "rebuild_interval", "max_neighbors",
                                 "density_margin")})
                exc_i, exc_j = t0.nbl_exclusions
                self._nbl_excl = neighborlist.build_exclusion_table(
                    static.n_atoms, exc_i, exc_j)
                self._rebind_neighbor_fn()
                self._rebuild_interval = self._nbl_cfg.rebuild_interval

        def potential(positions, box, neighbors, pos_err, rep_scale=None):
            pos = apply_vsites(spec, static, positions)
            e = jnp.zeros((), positions.dtype)
            for fn, params in terms:
                if getattr(fn, "needs_neighbors", False):
                    if getattr(fn, "wants_rep_scale", False):
                        e = e + fn(params, pos, box, neighbors, rep_scale)
                    else:
                        e = e + fn(params, pos, box, neighbors)
                elif getattr(fn, "wants_pos_err", False):
                    e = e + fn(params, pos, box, pos_err=pos_err)
                else:
                    e = e + fn(params, pos, box)
            return e

        def energy_and_forces(positions, box, neighbors=None, pos_err=None,
                              rep_scale=None):
            pe, grad = jax.value_and_grad(potential)(positions, box,
                                                     neighbors, pos_err,
                                                     rep_scale)
            return pe, -grad

        self._energy_and_forces = energy_and_forces
        self._potential = potential

        # force-only fast path: the sweep's pair chain is evaluated once
        # per force contraction instead of once more for the energy
        # reduction (the in-step pipeline never reads the potential energy;
        # it is recomputed on demand by _ensure_pe / the barostat)
        nb_split = next((t for t in terms
                         if hasattr(t[0], "sweep_forces")), None)
        self._forces_only = None
        if nb_split is not None:
            nb_fn, nb_params = nb_split
            recip_f = getattr(nb_fn, "recip_forces", None)

            def rest_energy_composed(pos, box, neighbors, pos_err,
                                     rep_scale=None):
                """Everything autodiffed in the force-only path, as a
                function of the COMPOSED (vsite-updated) positions: with an
                analytic reciprocal force available, only the extras; else
                extras + PME reciprocal."""
                if recip_f is not None:
                    e = nb_fn.extras_energy(nb_params, pos, box,
                                            rep_scale=rep_scale)
                elif getattr(nb_fn, "wants_rep_scale", False):
                    e = nb_fn.rest_energy(nb_params, pos, box, neighbors,
                                          rep_scale)
                else:
                    e = nb_fn.rest_energy(nb_params, pos, box, neighbors)
                for fn, params in terms:
                    if fn is nb_fn:
                        continue
                    if getattr(fn, "needs_neighbors", False):
                        e = e + fn(params, pos, box, neighbors)
                    elif getattr(fn, "wants_pos_err", False):
                        e = e + fn(params, pos, box, pos_err=pos_err)
                    else:
                        e = e + fn(params, pos, box)
                return e

            def forces_only(positions, box, neighbors=None, pos_err=None,
                            rep_scale=None):
                """Total force on the raw particles: every term is
                evaluated at the composed positions; the single J^T
                application at the end moves vsite-row forces onto the
                parents.  With average-only vsites the spread is the
                scatter-free gather table (constraints/vsites.py) and
                NOTHING in this path autodiffs through apply_vsites — the
                vsite scatter and its scatter-add adjoint vanish from the
                hot loop."""
                # triclinic (dense-strategy) sweeps minimum-image against
                # the full reduced box matrix (forces/boxutils.py)
                box_diag = (box if getattr(nb_fn, "mi_box_full", False)
                            else jnp.diagonal(box))
                if spec.vs_spread_src is not None:
                    pos_comp = apply_vsites(spec, static, positions)
                    spread = lambda f: spread_vsite_forces(spec, static, f)
                else:
                    pos_comp, vjp_fn = jax.vjp(
                        lambda p: apply_vsites(spec, static, p), positions)
                    spread = lambda f: vjp_fn(f)[0]
                if rep_scale is not None:
                    f = nb_fn.sweep_forces(nb_params, pos_comp, box_diag,
                                           neighbors, rep_scale)
                else:
                    f = nb_fn.sweep_forces(nb_params, pos_comp, box_diag,
                                           neighbors)
                if recip_f is not None:
                    f = f + recip_f(nb_params, pos_comp, box_diag, neighbors,
                                    rep_scale=rep_scale)
                f = f - jax.grad(rest_energy_composed)(pos_comp, box,
                                                       neighbors, pos_err,
                                                       rep_scale)
                return spread(f)

            self._forces_only = forces_only
        self._step_fns: Dict[int, callable] = {}
        self._jit_neighbor_fn = None
        self._jit_rebuild = None
        self._jit_potential = None
        self._pe_valid = False
        if getattr(self, "_state", None) is not None:
            self._state = self._state._replace(neighbors=None)
            self._forces_valid = False

    # -- state manipulation ---------------------------------------------------
    def setPositions(self, positions) -> None:
        pos64 = np.asarray(positions, np.float64)
        pos = jnp.asarray(pos64, self._prec.real)
        if pos.shape != (self._static.n_atoms, 3):
            raise ValueError(f"positions must have shape "
                             f"({self._static.n_atoms}, 3)")
        pos = apply_vsites(self._spec, self._static, pos)
        pos_err = None
        if self._prec.real == jnp.float32 and self._static.has_pairs:
            # two-float compensated positions (core/state.py pos_err):
            # start from the exact f64 rounding residual (vsite rows were
            # recomputed above, so their residual is meaningless — zero it)
            res = pos64 - np.asarray(pos, np.float64)
            res[np.abs(res) > 1e-5] = 0.0
            pos_err = jnp.asarray(res, jnp.float32)
        self._state = self._state._replace(positions=pos, neighbors=None,
                                           pos_err=pos_err)
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

    def _periodic_cutoff(self) -> float:
        """Largest cutoff of any periodic cutoff force, or 0.0 — the
        quantity the box-width validity rule cutoff <= min(ax,by,cz)/2
        bounds (minimum-image exactness for reduced boxes)."""
        cut = 0.0
        for f in self._system.getForces():
            if (type(f).__name__ == "NonbondedForce"
                    and f.usesPeriodicBoundaryConditions()
                    and f.getNonbondedMethod() != f.NoCutoff):
                cut = max(cut, f.getCutoffDistance())
        return cut

    def _validate_box_widths(self, box, origin: str) -> None:
        cut = self._periodic_cutoff()
        if not cut:
            return
        w_min = float(np.min(np.diagonal(np.asarray(box, np.float64))))
        if cut > w_min / 2 + 1e-9:
            raise ValueError(
                f"{origin}: cutoff {cut} exceeds half the smallest "
                f"perpendicular box width {w_min} — minimum imaging "
                "would miss images (shrink the cutoff or enlarge the "
                "box)")

    def setPeriodicBoxVectors(self, a, b, c) -> None:
        from ..forces.boxutils import is_triclinic, reduce_box
        box = reduce_box([a, b, c])
        if (is_triclinic(box)
                and not is_triclinic(np.asarray(self._state.box))):
            raise ValueError(
                "cannot switch an orthorhombic context to a triclinic "
                "box: the compiled strategy minimum-images against the "
                "diagonal — build the Context with the triclinic box "
                "instead")
        # triclinic-to-triclinic (and shrinking orthorhombic) changes must
        # re-satisfy the validity rule the compile-time check enforced
        # (ADVICE round 3: nothing guarded runtime box changes)
        self._validate_box_widths(box, "setPeriodicBoxVectors")
        self._state = self._state._replace(
            box=jnp.asarray(box, self._prec.real))
        self._forces_valid = False

    def applyConstraints(self, tol: float) -> None:
        """Project current positions onto the constraint manifold."""
        spec, static = self._spec, self._static
        if static.n_shake or static.n_settle:
            # the direct triangle solver assumes valid reference directions,
            # so initial projection uses the robust Jacobi sweep for all
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
        from ..constraints import settle as settle_mod
        spec, static = self._spec, self._static
        v = self._state.velocities
        if static.n_settle:
            v = settle_mod.apply_velocity_constraints(
                self._state.positions, v, spec.inv_mass, spec.settle_idx,
                spec.settle_dist, spec.settle_gather)
        if static.n_shake:
            v = shake_mod.apply_velocity_constraints(
                self._state.positions, v, spec.inv_mass, spec.shake_idx,
                spec.shake_dist, float(tol), static.shake_max_iter)
        self._state = self._state._replace(velocities=v)

    # -- stepping --------------------------------------------------------------
    def _rebind_neighbor_fn(self) -> None:
        from ..forces import neighborlist
        cfg = self._nbl_cfg
        excl_table = self._nbl_excl

        def neighbor_fn(positions, box, rep_scale=None):
            # rep_scale is a flat-ensemble-NPT concept (cellpair only);
            # always None on this strategy
            return neighborlist.build_neighbors(
                positions, jnp.diagonal(box), cfg, excl_table)
        self._neighbor_fn = neighbor_fn
        self._jit_neighbor_fn = None
        self._jit_rebuild = None

    def _ensure_neighbors(self) -> None:
        if self._neighbor_fn is None or self._state.neighbors is not None:
            return
        for _ in range(8):
            if self._jit_neighbor_fn is None:
                self._jit_neighbor_fn = jax.jit(self._neighbor_fn)
            nbl = self._jit_neighbor_fn(self._state.positions,
                                        self._state.box,
                                        self._state.rep_scale)
            if (getattr(nbl, "excl_span_exceeded", None) is not None
                    and bool(nbl.excl_span_exceeded)):
                # an excluded pair already spans >= 2 cells at setup (long
                # exclusion relative to the cell size): the Pallas
                # far-offset exclusion skip is unsound for this system —
                # disable it and recompile before any dynamics run
                self._nb_kwargs["pallas_excl_skip"] = False
                self._build_potential()
                continue
            if (getattr(nbl, "stencil_invalid", None) is not None
                    and bool(nbl.stencil_invalid)):
                # NPT shrink invalidated the compile-time stencil: replan
                # the cell grid (and the cell-aligned PME grid) at the
                # current box
                box = np.asarray(self._state.box, np.float64)
                self._system.setDefaultPeriodicBoxVectors(
                    tuple(box[0]), tuple(box[1]), tuple(box[2]))
                self._build_potential()
                continue
            if not bool(nbl.overflow):
                break
            self._grow_pair_capacity()
        else:
            raise RuntimeError("neighbor structure capacity still "
                               "overflowing after growth")
        self._state = self._state._replace(neighbors=nbl)

    def _grow_pair_capacity(self) -> None:
        """Capacity exceeded (clustered system): grow and recompile.

        The cellpair capacity is sized from the MEASURED max cell
        occupancy at the current positions: the blind 1.5x of
        cellpair.grow overshoots (liquid water at benchmark density
        overflows C=48 with a true max of ~51, and sweep cost scales with
        capacity), while +8 rounding under-grows clustered systems.
        Callers re-check overflow; capacity+8 guarantees progress even
        when the overflow happened at positions that have since been
        discarded (the in-scan chunk retry)."""
        if self._cp_cfg is not None:
            cfg = self._cp_cfg
            pos = np.asarray(self._state.positions, np.float64)
            # embedded replica-ensemble grids bin in the per-replica frame;
            # occupancy per extended cell == per (replica, local cell)
            grid = np.asarray(cfg.phys_grid)
            box_m = np.asarray(self._state.box, np.float64)
            if cfg.triclinic:
                frac = pos @ np.linalg.inv(box_m)
            else:
                frac = pos / np.diagonal(box_m)
            frac = frac - np.floor(frac)
            cell = np.minimum((frac * grid).astype(np.int64), grid - 1)
            flat = ((cell[:, 0] * grid[1] + cell[:, 1]) * grid[2]
                    + cell[:, 2])
            if cfg.n_replicas > 1:
                n0 = pos.shape[0] // cfg.n_replicas
                rep = np.arange(pos.shape[0]) // n0
                flat = rep * int(np.prod(grid)) + flat
            occ_max = int(np.bincount(flat, minlength=cfg.n_cells).max())
            new_cap = max(-(-int(occ_max * 1.1 + 2) // 8) * 8,
                          cfg.capacity + 8)
            self._nb_kwargs["capacity"] = min(new_cap,
                                              self._static.n_atoms)
            self._build_potential()
        else:
            from ..forces import neighborlist
            self._nbl_cfg = neighborlist.grow(self._nbl_cfg,
                                              self._static.n_atoms)
            self._rebind_neighbor_fn()
            self._step_fns.clear()

    def _ensure_forces(self) -> None:
        if not self._forces_valid:
            self._ensure_neighbors()
            pe, f = jax.jit(self._energy_and_forces)(
                self._state.positions, self._state.box,
                self._state.neighbors, self._state.pos_err,
                self._state.rep_scale)
            self._state = self._state._replace(
                forces=f, potential_energy=pe.astype(self._prec.accum))
            self._forces_valid = True
            self._pe_valid = True

    def _get_step_fn(self, inner: int):
        fn = self._step_fns.get(inner)
        if fn is None:
            mc = None
            mc_terms = [(getattr(t[0], "mc_energies"), t[1])
                        for t in self._terms
                        if getattr(t[0], "mc_energies", None)]
            if mc_terms:
                # sum every term's per-replica MC contribution (the
                # nonbonded sweep/PME/dispersion/NBFIX + the DrudeForce's
                # NBTHOLE hook)
                def mc(pos, box, nbl, rs, _terms=tuple(mc_terms)):
                    e = None
                    for _f, _p in _terms:
                        v = _f(_p, pos, box, nbl, rs)
                        e = v if e is None else e + v
                    return e
            fn = jax.jit(tgnh.make_multi_step(
                self._static, self._energy_and_forces, inner,
                forces_fn=self._forces_only, mc_energies=mc))
            self._step_fns[inner] = fn
        return fn

    def _get_rebuild_fn(self):
        """Jitted state -> state neighbor refresh that also latches the
        full-skin drift breach and carries the overflow latch forward
        (dispatched from the host between interval scans; NOT run inside
        the step program — XLA compiles the cellsort's argsort/scatter
        sequence inside a scanned loop ~10x slower than standalone,
        measured on v5e via scripts/ab_rebuild.py)."""
        if self._jit_rebuild is not None:
            return self._jit_rebuild
        skin = (self._cp_cfg.skin if self._cp_cfg is not None
                else getattr(self._nbl_cfg, "skin", None))
        self._jit_rebuild = jax.jit(
            tgnh._make_neighbor_rebuild(self._neighbor_fn, skin))
        return self._jit_rebuild

    def _ensure_pe(self) -> None:
        """Recompute the potential energy when the force-only step left it
        stale (jitted energy-only pass, run once per host-level request)."""
        if self._pe_valid:
            return
        self._ensure_neighbors()
        if self._jit_potential is None:
            self._jit_potential = jax.jit(self._potential)
        pe = self._jit_potential(self._state.positions, self._state.box,
                                 self._state.neighbors, self._state.pos_err,
                                 self._state.rep_scale)
        self._state = self._state._replace(
            potential_energy=pe.astype(self._prec.accum))
        self._pe_valid = True

    def step(self, steps: int) -> None:
        """Advance the simulation.

        Without a neighbor list this is one jitted lax.scan call (compiled
        once per distinct `steps` value).  With a cell list, the host
        dispatches pipelined [jitted rebuild] -> [interval-step scan] pairs
        WITHOUT reading anything back, and checks the latched overflow
        flag once per 8*interval-step chunk — async dispatch hides the
        ~30 ms/call host latency entirely (scripts/ab_rebuild.py: host
        pairs cost +0.3 ms/step over the no-rebuild floor, while compiling
        the rebuild INTO the scan cost +5 ms/step: XLA compiles the
        argsort/scatter ~10x slower inside a loop).  A rebuild cannot grow
        the cell capacity (static shapes): overflow latches on device, the
        whole chunk is discarded, capacity grows from measured occupancy,
        and the chunk re-runs from the saved pre-chunk state."""
        self._ensure_forces()
        steps = int(steps)
        if self._neighbor_fn is None:
            self._state = self._get_step_fn(steps)(self._spec, self._state)
            # the dense strategy has no stencil-coverage latch, so an
            # in-jit MC-barostat volume shrink could silently break exact
            # minimum imaging (ADVICE round 3); one tiny readback per
            # host-level call, alongside the hardwall one below
            if self._static.baro_freq:
                self._validate_box_widths(self._state.box,
                                          "barostat volume move")
        else:
            interval = self._rebuild_interval
            chunk = 8 * interval
            remaining = steps
            while remaining > 0:
                k_chunk = min(chunk, remaining)
                self._ensure_neighbors()
                rebuild = self._get_rebuild_fn()
                saved = self._state
                for _ in range(8):
                    st = saved
                    r = k_chunk
                    while r > 0:
                        k = min(interval, r)
                        st = rebuild(st)
                        st = self._get_step_fn(k)(self._spec, st)
                        r -= k
                    if bool(st.neighbors.overflow):
                        # slots were dropped from the overflowing rebuild
                        # onward — every step since is invalid
                        self._state = saved
                        self._grow_pair_capacity()
                        self._state = self._state._replace(neighbors=None)
                        self._ensure_neighbors()
                        rebuild = self._get_rebuild_fn()
                        saved = self._state
                        continue
                    self._state = st
                    break
                else:
                    raise RuntimeError("neighbor structure capacity still "
                                       "overflowing after growth")
                remaining -= k_chunk
            self._check_rebuild_drift()
            self._check_excl_span()
        self._ke_valid = True
        if self._forces_only is not None:
            self._pe_valid = False
        self._check_hardwall_runaway()

    def _check_rebuild_drift(self) -> None:
        """Warn once when an atom outran TWICE the skin between neighbor
        rebuilds — the violently-unequilibrated-start failure mode that
        silently corrupts trajectories.  (The strict two-atom bound is
        skin/2 and the full skin is grazed by healthy 300 K velocity
        tails at N ~ 1e5 — measured 0.086 nm/16 fs max in the equilibrated
        benchmark snapshot — so the latch triggers at 2x skin, where a
        breach can at most graze negligible cutoff-edge interactions;
        see tgnh._make_neighbor_rebuild.)"""
        nbl = self._state.neighbors
        if (nbl is None or self._drift_warned
                or getattr(nbl, "ref_positions", None) is None):
            return
        # in-scan rebuilds latch the full-skin breach at each rebuild
        # (make_step do_rebuild) — exactly the intervals whose pair
        # structure was actually used for forces.  The still-open tail
        # interval is judged by the NEXT rebuild; checking it here would
        # flag drift that never fed a stale force evaluation.
        latched = getattr(nbl, "drift_exceeded", None)
        if latched is not None and bool(latched):
            self._drift_warned = True
            import warnings
            warnings.warn(
                "an atom moved further than the neighbor skin between "
                "rebuilds — pair interactions may have been missed; "
                "reduce the step size or the rebuild interval (usually a "
                "sign of a violently unequilibrated start: minimize "
                "first)", RuntimeWarning, stacklevel=3)

    def _check_excl_span(self) -> None:
        """Raise when a mid-run rebuild latched excl_span_exceeded: an
        excluded (intramolecular) pair was binned >= 2 cells apart while
        the Pallas sweep was skipping the exclusion test at far stencil
        offsets — the steps since that rebuild double-counted the pair.
        Only ever set when the skip is active (excl_ij was passed to
        build_cellsort); a setup-time span is handled transparently in
        _ensure_neighbors by disabling the skip before any dynamics."""
        nbl = self._state.neighbors
        span = getattr(nbl, "excl_span_exceeded", None)
        if span is not None and bool(span):
            raise RuntimeError(
                "an excluded pair stretched across >= 2 cells mid-run "
                "while the Pallas far-offset exclusion skip was active — "
                "recent forces double-counted it (the molecule has likely "
                "become unstable; if the geometry is intentional, pass "
                "nb_options={'pallas_excl_skip': False})")

    def _check_hardwall_runaway(self) -> None:
        """Surface the device-latched runaway flag: a Drude moved >2x past
        the hard wall since the last clear.  Strict mode raises (Reference
        platform parity, ReferenceDrudeTGNHKernels.cpp:311-312); default
        warns once and leaves the sticky hardwallRunaway property set (CUDA
        platform bounces silently).  One bool readback per host-level
        step() call."""
        hw = self._state.hardwall_runaway
        if hw is None or not bool(hw):
            return
        if self._hardwall_strict:
            self.clearHardwallRunaway()
            raise RuntimeError(
                "Drude particle moved too far beyond hard wall constraint "
                "(displacement exceeded 2x maxDrudeDistance); the system "
                "has likely become unstable — reduce the step size or "
                "check initial positions")
        if not self._hardwall_warned:
            self._hardwall_warned = True
            import warnings
            warnings.warn(
                "a Drude particle transiently moved >2x past the hard wall "
                "(bounced back; set hardwall_strict=True to raise instead)",
                RuntimeWarning, stacklevel=3)

    @property
    def hardwallRunaway(self) -> bool:
        """Sticky: a Drude moved >2x past the hard wall since the last
        clearHardwallRunaway() (pre-bounce displacement; the bounce itself
        always restores the wall)."""
        hw = self._state.hardwall_runaway
        return bool(hw) if hw is not None else False

    def clearHardwallRunaway(self) -> None:
        self._state = self._state._replace(
            hardwall_runaway=jnp.zeros((), jnp.bool_))
        self._hardwall_warned = False

    def getConservedEnergy(self) -> float:
        """The TGNH conserved quantity: KE + PE + per-bath chain terms
        sum_g [ 1/2 Q_g0 etaDot_g0^2 + N_g kbT_g eta_g0
                + sum_{i>=1} (1/2 Q_gi etaDot_gi^2 + kbT_chain eta_gi) ].
        Its drift measures integrator/thermostat fidelity — a diagnostic
        the reference never exposes."""
        self._ensure_forces()
        self._ensure_pe()
        st = self._state
        spec = self._spec
        m = np.asarray(spec.mass, np.float64)
        v = np.asarray(st.velocities, np.float64)
        ke = 0.5 * float(np.sum(m * np.sum(v * v, axis=-1)))
        pe = float(st.potential_energy)
        eta = np.asarray(st.eta, np.float64)
        eta_dot = np.asarray(st.eta_dot, np.float64)[:, :-1]
        q = np.asarray(spec.nh_eta_mass, np.float64)
        nkbt = np.asarray(spec.nh_nkbt, np.float64)
        kbt_chain = np.asarray(spec.nh_kbt_chain, np.float64)
        chain = 0.5 * np.sum(q * eta_dot**2)
        chain += float(np.sum(nkbt * eta[:, 0]))
        if eta.shape[1] > 1:
            chain += float(np.sum(kbt_chain[:, None] * eta[:, 1:]))
        return ke + pe + chain

    def minimizeEnergy(self, tolerance: float = 10.0,
                       maxIterations: int = 500) -> None:
        """FIRE energy minimization (fast inertial relaxation engine) under
        jit — robust for the stiff Drude springs; stops when the force
        RMS drops below `tolerance` (kJ/mol/nm) or after maxIterations.
        Constraints are re-projected and vsites recomputed afterwards."""
        spec, static = self._spec, self._static
        self._ensure_neighbors()
        eaf = self._energy_and_forces
        movable = (np.asarray(self._spec.inv_mass) > 0)[:, None]
        movable = jnp.asarray(movable)

        dt0 = 1e-4
        dt_max = 1e-2

        def fire(pos, box, neighbors):
            def body(carry):
                pos, vel, dt, alpha, n_pos, it, _ = carry
                pe, f = eaf(pos, box, neighbors, None)
                f = jnp.where(movable, f, 0.0)
                p = jnp.sum(f * vel)
                f_norm = jnp.sqrt(jnp.sum(f * f))
                v_norm = jnp.sqrt(jnp.sum(vel * vel))
                vel = jnp.where(p > 0,
                                (1 - alpha) * vel
                                + alpha * f * (v_norm / jnp.maximum(f_norm, 1e-12)),
                                jnp.zeros_like(vel))
                n_pos = jnp.where(p > 0, n_pos + 1, 0)
                dt = jnp.where((p > 0) & (n_pos > 5),
                               jnp.minimum(dt * 1.1, dt_max),
                               jnp.where(p > 0, dt, dt * 0.5))
                alpha = jnp.where((p > 0) & (n_pos > 5), alpha * 0.99,
                                  jnp.where(p > 0, alpha, 0.1))
                vel = vel + dt * f
                move = dt * vel
                # cap the per-iteration displacement (stiff Drude springs
                # produce huge initial forces; uncapped FIRE diverges in f32)
                max_move = jnp.max(jnp.abs(move))
                scale = jnp.minimum(1.0, 0.01 / jnp.maximum(max_move, 1e-12))
                pos = pos + move * scale
                rms = f_norm / np.sqrt(pos.size)
                return pos, vel, dt, alpha, n_pos, it + 1, rms

            def cond(carry):
                *_, it, rms = carry
                return (it < maxIterations) & (rms > tolerance)

            init = (pos, jnp.zeros_like(pos), jnp.asarray(dt0, pos.dtype),
                    jnp.asarray(0.1, pos.dtype), jnp.zeros((), jnp.int32),
                    jnp.zeros((), jnp.int32),
                    jnp.asarray(np.inf, pos.dtype))
            pos, *_ = jax.lax.while_loop(cond, body, init)
            return pos

        pe_before, _ = jax.jit(eaf)(self._state.positions, self._state.box,
                                    self._state.neighbors)
        pos = jax.jit(fire)(self._state.positions, self._state.box,
                            self._state.neighbors)
        pe_after, _ = jax.jit(eaf)(pos, self._state.box,
                                   self._state.neighbors)
        if not bool(pe_after < pe_before):
            return  # never make things worse (already near a minimum)
        self._state = self._state._replace(
            positions=pos,
            pos_err=(None if self._state.pos_err is None
                     else jnp.zeros_like(self._state.pos_err)))
        self.applyConstraints(self._integrator.getConstraintTolerance())
        if static.has_hardwall and static.has_pairs:
            # the minimizer knows nothing about the integrator-time hard
            # wall; clamp Drude offsets back inside it so the first step
            # doesn't (correctly) flag a runaway
            p = self._state.positions
            is_drude = jnp.asarray(spec.is_pair & ~spec.is_parent)
            parent = p[spec.partner]
            delta = p - parent
            dist = jnp.sqrt(jnp.maximum(jnp.sum(delta * delta, axis=-1),
                                        1e-24))
            limit = 0.99 * spec.max_drude_distance.astype(p.dtype)
            scale = jnp.minimum(1.0, limit / dist)
            clamped = parent + delta * scale[:, None]
            p = jnp.where(is_drude[:, None], clamped, p)
            self._state = self._state._replace(positions=p)
        self._state = self._state._replace(
            positions=apply_vsites(spec, static, self._state.positions),
            neighbors=None)
        self._forces_valid = False

    @property
    def neighborListOverflowed(self) -> bool:
        """True if any cell-list capacity was exceeded since the last
        rebuild from scratch — results are then unreliable and the list
        should be rebuilt with a larger capacity."""
        nbl = self._state.neighbors
        return bool(nbl.overflow) if nbl is not None else False

    def _on_step_size_changed(self) -> None:
        self._spec = self._spec._replace(
            dt=jnp.asarray(self._integrator.getStepSize(), self._prec.accum))

    # -- queries ----------------------------------------------------------------
    def getState(self, positions: bool = False, velocities: bool = False,
                 forces: bool = False, energy: bool = False,
                 groups: bool = False, enforcePeriodicBox: bool = False,
                 **kwargs) -> State:
        # accept OpenMM-style keyword spellings (getPositions=True, ...)
        positions = positions or kwargs.get("getPositions", False)
        velocities = velocities or kwargs.get("getVelocities", False)
        forces = forces or kwargs.get("getForces", False)
        energy = energy or kwargs.get("getEnergy", False)
        st = self._state
        kwargs = {"time": float(st.time), "step": int(st.step),
                  "box": np.asarray(st.box)}
        if positions:
            pos = np.asarray(st.positions, np.float64)
            if enforcePeriodicBox:
                # wrap whole molecules (OpenMM semantics): shift every atom
                # of a residue by its geometric-center image so bonded atoms
                # stay contiguous across the boundary
                box_m = np.asarray(st.box, np.float64)
                resid = np.asarray(self._spec.resid)
                n_res = self._static.n_residues
                counts = np.bincount(resid, minlength=n_res).astype(np.float64)
                centers = np.stack([
                    np.bincount(resid, weights=pos[:, c], minlength=n_res)
                    for c in range(3)], axis=1) / counts[:, None]
                # fractional-coordinate image shift (exact for triclinic
                # reduced boxes; identical to the old diagonal formula for
                # orthorhombic ones)
                shift = np.floor(centers @ np.linalg.inv(box_m))
                pos = pos - shift[resid] @ box_m
            kwargs["positions"] = pos
        if velocities:
            kwargs["velocities"] = np.asarray(st.velocities, np.float64)
        if forces:
            self._ensure_forces()
            kwargs["forces"] = np.asarray(self._state.forces, np.float64)
        if energy or groups:
            self._ensure_forces()
            self._ensure_pe()
            kwargs["potential_energy"] = float(self._state.potential_energy)
            if self._ke_valid:
                # flattened ensembles cache per-replica sums (E,)
                ke = float(np.sum(np.asarray(st.ke_sum)))
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
            targets[..., -1] = self._integrator.getDrudeTemperature()
            kwargs["group_temperatures"] = temps * targets
        return State(**kwargs)

    def getSystem(self):
        return self._system

    def getIntegrator(self):
        return self._integrator

    def setParameter(self, name: str, value: float) -> None:
        """Set a Custom*Force global parameter (OpenMM
        Context::setParameter semantics, e.g. lambda scans).  Globals are
        baked into the compiled expression terms, so this recompiles the
        step via reinitialize(preserveState=True) — cheap on repeat values
        thanks to the persistent compile cache, but batch parameter sweeps
        through a vmapped ReplicaEnsemble when possible."""
        hit = False
        for f in self._system.getForces():
            globs = getattr(f, "_globals", None)
            if globs is None:
                continue
            for i, (nm, _) in enumerate(globs):
                if nm == name:
                    f.setGlobalParameterDefaultValue(i, float(value))
                    hit = True
        if not hit:
            raise ValueError(
                f"no force declares a global parameter {name!r}")
        self.reinitialize(preserveState=True)

    def getParameter(self, name: str) -> float:
        for f in self._system.getForces():
            globs = getattr(f, "_globals", None)
            if globs is None:
                continue
            for nm, v in globs:
                if nm == name:
                    return v
        raise ValueError(f"no force declares a global parameter {name!r}")

    def getParameters(self) -> dict:
        out: dict = {}
        for f in self._system.getForces():
            for nm, v in (getattr(f, "_globals", None) or ()):
                out.setdefault(nm, v)
        return out

    def reinitialize(self, preserveState: bool = True) -> None:
        """Recompile after System/Integrator edits (OpenMM
        Context::reinitialize semantics).  With preserveState, positions,
        velocities, box and thermostat state carry over."""
        old = self._state
        r, a = self._prec.real, self._prec.accum
        self._spec, self._static, init_edd = spec_mod.build_spec(
            self._system, self._integrator, r, a,
            ensemble_r=self._ensemble_r)
        self._build_potential()
        from ..core.state import zeros_state
        box = np.array(self._system.getDefaultPeriodicBoxVectors(),
                       np.float64)
        st = zeros_state(self._static.n_atoms, self._static.n_baths,
                         self._static.n_chains, box, r, a,
                         ensemble_r=self._ensemble_r)
        st = st._replace(eta_dot_dot=jnp.asarray(init_edd, a))
        if preserveState and old.positions.shape == st.positions.shape:
            st = st._replace(positions=old.positions,
                             velocities=old.velocities, box=old.box,
                             time=old.time, step=old.step, key=old.key,
                             pos_err=old.pos_err)
            if old.eta.shape == st.eta.shape:
                st = st._replace(eta=old.eta, eta_dot=old.eta_dot,
                                 eta_dot_dot=old.eta_dot_dot)
        self._state = st
        self._forces_valid = False
        self._ke_valid = False


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
