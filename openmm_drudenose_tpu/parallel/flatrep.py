"""Flattened replica ensembles: R identical replicas run as ONE extended
system on one embedded cell grid.

Motivation (ROADMAP round-3 design notes): small per-replica boxes leave
the cell-pair sweep's 128-lane tiles mostly padding (a 4k-atom box has an
(y, z) cell plane of ~25 cells), so a vmapped per-replica ensemble wastes
~3-5x in lane padding and pays 64 small argsorts per rebuild.  Embedding
the replicas into one extended grid — grid (rx*gx0, gy0, rz*gz0) with
per-replica wrap periods (forces/cellpair.py make_ensemble_config) —
makes the ensemble exactly one big cell-sorted system: ONE sweep, ONE
argsort per rebuild, full tiles.  Per-replica physics is preserved by
construction:

  * stencil neighbor maps wrap inside each replica's band (replicas never
    interact),
  * the PME reciprocal sum is vmapped per replica (replicas overlap in
    physical coordinates),
  * NH baths are (R, G+2) with per-replica constants
    (core/spec.py build_spec ensemble_r), and every KE / CM reduction is
    per replica (integrators/tgnh.py),
  * bonded terms / constraints / vsites replicate index-wise.

The reference has no ensemble concept at all (one Context per GPU); this
is the TPU-native widening of BASELINE.md config 5 beyond what
parallel/ensemble.py's vmap approach can do efficiently at small N.
"""

from __future__ import annotations

import numpy as np


def _shift_vsite(vs, o: int):
    from ..system import (LocalCoordinatesSite, OutOfPlaneSite,
                          ThreeParticleAverageSite, TwoParticleAverageSite)
    if isinstance(vs, TwoParticleAverageSite):
        return TwoParticleAverageSite(vs.particles[0] + o,
                                      vs.particles[1] + o,
                                      vs.weights[0], vs.weights[1])
    if isinstance(vs, ThreeParticleAverageSite):
        return ThreeParticleAverageSite(
            vs.particles[0] + o, vs.particles[1] + o, vs.particles[2] + o,
            *vs.weights)
    if isinstance(vs, OutOfPlaneSite):
        return OutOfPlaneSite(
            vs.particles[0] + o, vs.particles[1] + o, vs.particles[2] + o,
            *vs.weights)
    if isinstance(vs, LocalCoordinatesSite):
        return LocalCoordinatesSite(
            [p + o for p in vs.particles], vs.origin_weights, vs.x_weights,
            vs.y_weights, vs.local_position)
    raise ValueError(f"unsupported virtual site {type(vs).__name__}")


def _replicate_force(f, R: int, n0: int):
    from ..forces.cmmotion import CMMotionRemover, MonteCarloBarostat
    from ..forces.bonded import (HarmonicAngleForce, HarmonicBondForce,
                                 PeriodicTorsionForce)
    from ..forces.drude import DrudeForce
    from ..forces.nonbonded import NonbondedForce

    if isinstance(f, NonbondedForce):
        g = NonbondedForce()
        g.setNonbondedMethod(f.getNonbondedMethod())
        g.setCutoffDistance(f.getCutoffDistance())
        g.setReactionFieldDielectric(f.getReactionFieldDielectric())
        g.setUseSwitchingFunction(f.getUseSwitchingFunction())
        g.setSwitchingDistance(f.getSwitchingDistance())
        g.setEwaldErrorTolerance(f.getEwaldErrorTolerance())
        g.setUseDispersionCorrection(f.getUseDispersionCorrection())
        g._pme_params = tuple(f._pme_params)
        for r in range(R):
            for i in range(f.getNumParticles()):
                g.addParticle(*f.getParticleParameters(i))
        for r in range(R):
            o = r * n0
            for e in range(f.getNumExceptions()):
                i, j, qq, sig, eps = f.getExceptionParameters(e)
                g.addException(i + o, j + o, qq, sig, eps)
            for set1, set2, sig, eps in f._lj_overrides:
                g.addLJPairOverride([p + o for p in set1],
                                    [p + o for p in set2], sig, eps)
        return g

    if isinstance(f, DrudeForce):
        g = DrudeForce()
        np0 = f.getNumParticles()
        for r in range(R):
            o = r * n0
            for i in range(np0):
                p = f.getParticleParameters(i)
                g.addParticle(*[x + o if x >= 0 else -1 for x in p[:5]],
                              *p[5:])
        for r in range(R):
            op = r * np0          # screened/NBTHOLE pairs index the pair list
            for i in range(f.getNumScreenedPairs()):
                a, b, thole = f.getScreenedPairParameters(i)
                g.addScreenedPair(a + op, b + op, thole)
            for a, b, thole in f._nbthole:
                g.addNBTholePair(a + op, b + op, thole)
        return g

    if isinstance(f, HarmonicBondForce):
        g = HarmonicBondForce()
        for r in range(R):
            o = r * n0
            for i in range(f.getNumBonds()):
                p1, p2, length, k = f.getBondParameters(i)
                g.addBond(p1 + o, p2 + o, length, k)
        return g

    if isinstance(f, HarmonicAngleForce):
        g = HarmonicAngleForce()
        for r in range(R):
            o = r * n0
            for i in range(f.getNumAngles()):
                p1, p2, p3, th, k = f.getAngleParameters(i)
                g.addAngle(p1 + o, p2 + o, p3 + o, th, k)
        return g

    if isinstance(f, PeriodicTorsionForce):
        g = PeriodicTorsionForce()
        for r in range(R):
            o = r * n0
            for i in range(f.getNumTorsions()):
                p1, p2, p3, p4, per, ph, k = f.getTorsionParameters(i)
                g.addTorsion(p1 + o, p2 + o, p3 + o, p4 + o, per, ph, k)
        return g

    from ..forces.bonded import HarmonicTorsionForce
    if isinstance(f, HarmonicTorsionForce):
        g = HarmonicTorsionForce()
        for r in range(R):
            o = r * n0
            for i in range(f.getNumTorsions()):
                p1, p2, p3, p4, th0, k = f.getTorsionParameters(i)
                g.addTorsion(p1 + o, p2 + o, p3 + o, p4 + o, th0, k)
        return g

    from ..forces.cmap import CMAPTorsionForce
    if isinstance(f, CMAPTorsionForce):
        g = CMAPTorsionForce()
        for (size, energy) in f._maps:
            g.addMap(size, energy)
        for r in range(R):
            o = r * n0
            for t in f._torsions:
                g.addTorsion(t[0], *(x + o for x in t[1:]))
        return g

    from ..forces.custom import (CustomAngleForce, CustomBondForce,
                                 CustomExternalForce, CustomNonbondedForce,
                                 CustomTorsionForce)
    if isinstance(f, (CustomBondForce, CustomAngleForce,
                      CustomTorsionForce, CustomExternalForce)):
        g = type(f)(f.getEnergyFunction())
        g._per_names = list(f._per_names)
        g._globals = list(f._globals)
        npart = f._N_PARTICLES
        for r in range(R):
            o = r * n0
            for t in f._terms:
                g._terms.append(tuple(p + o for p in t[:npart])
                                + (t[npart],))
        return g

    if isinstance(f, CustomNonbondedForce):
        # replicas are embedded in ONE extended box; the general dense
        # pair matrix knows nothing of the per-replica wrap periods that
        # isolate them (cellpair stencils do), so cross-band pairs within
        # the cutoff would interact and minimum imaging would run over
        # the extended box.  The vmapped ReplicaEnsemble replicates
        # per-Context and stays exact.
        raise ValueError(
            "FlatReplicaEnsemble cannot replicate a general "
            "CustomNonbondedForce (replicas share one extended box; the "
            "dense pair path would couple them) — use the vmapped "
            "ReplicaEnsemble, or map the interaction onto NonbondedForce "
            "/ LennardJonesForce tables as app/forcefield.py does for "
            "the stock CHARMM decks")

    if isinstance(f, CMMotionRemover):
        return CMMotionRemover(f.getFrequency())

    if isinstance(f, MonteCarloBarostat):
        # per-replica NPT rides SimState.rep_scale (one shared template
        # grid, stored-coordinate sweep); each replica runs its own MC
        # volume moves, so ONE barostat object covers the ensemble
        return MonteCarloBarostat(f.getDefaultPressure(),
                                  f.getDefaultTemperature(),
                                  f.getFrequency())

    raise ValueError(f"cannot replicate force {type(f).__name__}")


def replicate_system(system, n_replicas: int):
    """A new System with `n_replicas` replica-major copies of `system`
    (same per-replica box; all indices offset per replica)."""
    from ..system import System
    R = int(n_replicas)
    n0 = system.getNumParticles()
    ext = System()
    for r in range(R):
        for i in range(n0):
            ext.addParticle(system.getParticleMass(i))
    for r in range(R):
        o = r * n0
        for ci in range(system.getNumConstraints()):
            p1, p2, d = system.getConstraintParameters(ci)
            ext.addConstraint(p1 + o, p2 + o, d)
        for i in range(n0):
            if system.isVirtualSite(i):
                ext.setVirtualSite(
                    i + o, _shift_vsite(system.getVirtualSite(i), o))
    ext.setDefaultPeriodicBoxVectors(*system.getDefaultPeriodicBoxVectors())
    for f in system.getForces():
        ext.addForce(_replicate_force(f, R, n0))
    return ext


def _clone_integrator(integ, R: int):
    from ..app.integrator import DrudeTGNHIntegrator
    g = DrudeTGNHIntegrator(
        integ.getTemperature(), integ.getCouplingTime(),
        integ.getDrudeTemperature(), integ.getDrudeCouplingTime(),
        integ.getStepSize(), integ.getDrudeStepsPerRealStep(),
        integ.getNumNHChains(), integ.getUseDrudeNHChains(),
        integ.getUseCOMTempGroup())
    g.setMaxDrudeDistance(integ.getMaxDrudeDistance())
    g.setConstraintTolerance(integ.getConstraintTolerance())
    g._temp_groups = list(integ._temp_groups)
    if integ._particle_temp_group:
        g._particle_temp_group = list(integ._particle_temp_group) * R
    return g


class FlatReplicaEnsemble:
    """R identical replicas of `template_context`'s system advanced as one
    flattened extended Context.

        ens = FlatReplicaEnsemble(ctx, n_replicas=64)
        ens.setVelocitiesToTemperature(300.0)
        ens.step(1000)
        ke = ens.kinetic_energies()          # (64,)
        t = ens.group_temperatures()         # (64, G+2)

    rx/rz: the replica grid factorization along the extended x and z cell
    axes.  The default layout may PAD the ensemble with extra replicas
    (rx*rz >= R) when that fills the sweep's 128-lane tiles better than
    any exact factorization — e.g. 64 replicas of a (5, 5, 5)-cell box run
    as 13x5 = 65 (lane pad 128/125 = 1.02) instead of 8x8 = 64 (256/200 =
    1.28).  Pad replicas are real physics (independent trajectories) that
    are simply never reported; every accessor returns the requested R.
    Passing rx/rz explicitly keeps the exact rx*rz == R behavior.
    Positions default to R copies of the template's current positions.
    """

    def __init__(self, context, n_replicas: int, rx: int | None = None,
                 rz: int | None = None, seed: int = 0,
                 nb_options: dict | None = None, pad_replicas: bool = True):
        from ..app.context import Context
        R = int(n_replicas)
        if rx is None and rz is None:
            rx, rz = self._auto_layout(context, R, nb_options, pad_replicas)
        elif rz is None:
            if R % rx:
                raise ValueError("rx must divide n_replicas")
            rz = R // rx
        elif rx is None:
            if R % rz:
                raise ValueError("rz must divide n_replicas")
            rx = R // rz
        if rx * rz < R:
            raise ValueError("rx*rz must be >= n_replicas")
        R_int = rx * rz                      # internal (padded) replica count
        self._n_replicas = R
        self._r_int = R_int
        self._n0 = context._system.getNumParticles()
        self._template = context
        ext_system = replicate_system(context._system, R_int)
        ext_integ = _clone_integrator(context._integrator, R_int)
        nb = dict(context._nb_kwargs)
        nb.update(nb_options or {})
        nb["ensemble"] = (R_int, rx, rz)
        self.context = Context(ext_system, ext_integ,
                               precision=context._prec,
                               strategy="cellpair", seed=seed,
                               hardwall_strict=context._hardwall_strict,
                               nb_options=nb, ensemble_r=R_int)
        from ..forces.cmmotion import MonteCarloBarostat
        if any(isinstance(f, MonteCarloBarostat)
               for f in context._system.getForces()):
            # per-replica NPT: intramolecular terms cancel in the MC
            # Metropolis delta; every INTERmolecular term contributes a
            # per-replica mc_energies hook (sweep/PME/dispersion/NBFIX on
            # the NonbondedForce, NBTHOLE on the DrudeForce) so
            # ionic-liquid-class systems run flat NPT too (round-4 work;
            # the round-3 refusal is gone)
            import jax.numpy as jnp
            accum = self.context._prec.accum
            self.context._state = self.context._state._replace(
                rep_scale=jnp.ones((R_int,), self.context._prec.real),
                baro_scale=jnp.zeros((R_int,), accum),
                baro_naccept=jnp.zeros((R_int,), jnp.int32),
                baro_nattempt=jnp.zeros((R_int,), jnp.int32))
        self._jit_pe = None
        pos0 = np.asarray(context._state.positions, np.float64)
        self.setPositions(np.broadcast_to(pos0, (R,) + pos0.shape))

    @staticmethod
    def _auto_layout(context, R: int, nb_options,
                     pad_replicas: bool = True) -> tuple:
        """(rx, rz) minimizing the modeled step cost.

        Cost model (calibrated on the session-8 v5e probe, where the sweep
        was ~half the flattened step): the sweep scales with PADDED lane
        slots rx*ceil(n_yz0*rz/128)*128 and everything else with the
        internal replica count rx*rz, weighted half/half.  With
        pad_replicas, rx*rz may exceed R by up to 25% when lane fill wins;
        otherwise only exact factorizations compete."""
        nb = dict(context._nb_kwargs)
        nb.update(nb_options or {})
        nbf = [f for f in context._system.getForces()
               if type(f).__name__ == "NonbondedForce"]
        if not nbf:
            return 1, R
        r_list = nbf[0].getCutoffDistance() + nb.get("skin", 0.1)
        target = r_list / nb.get("cells_per_cutoff", 2)
        box0 = np.diagonal(np.array(
            context._system.getDefaultPeriodicBoxVectors(), np.float64))
        pg = [max(int(np.floor(L / target)), 1) for L in box0]
        n_yz0 = pg[1] * pg[2]
        cell = box0 / np.array(pg)
        w = int(np.ceil(r_list / cell[0]))
        n_lay = 2 * w + 1
        cap = nb.get("capacity")
        if not cap:
            n0 = context._system.getNumParticles()
            density = n0 / float(np.prod(box0))
            cap = int(np.ceil(density * np.prod(cell) * 1.35)) + 2
            cap = max(int(np.ceil(cap / 8)) * 8, 8)
        best = None
        for rz in range(1, R + 1):
            rx = -(-R // rz)                 # ceil: smallest rx covering R
            if not pad_replicas and R % rz:
                continue
            r_int = rx * rz
            if r_int > max(R + 1, int(R * 1.25)):
                continue
            n_yz = n_yz0 * rz
            lanes = -(-n_yz // 128) * 128
            # mirror ops/pallas_sweep.supports()'s layout-dependent gates:
            # the XLA fallback measured ~2.5x on the whole sweep term
            # (scripts/probe_flat_layouts.py: 13x5 disengaged 157.8 ms vs
            # 7x10 engaged 100.1 ms at 64 x 4k)
            lay_stride = -(-2 * n_yz // 128) * 128
            fr_stride = lanes
            vmem = 4 * cap * n_lay * (8 * lay_stride + 6 * fr_stride)
            pallas_ok = (n_yz >= 128 and vmem <= 12 * 1024 * 1024
                         and pg[0] >= n_lay)
            pallas_penalty = 1.0 if pallas_ok else 2.5
            cost = (0.5 * pallas_penalty * (rx * lanes) / (R * n_yz0)
                    + 0.5 * r_int / R)
            key = (cost, r_int, rz)
            if best is None or key < best[0]:
                best = (key, (rx, rz))
        return best[1]

    # -- state I/O ----------------------------------------------------------

    def setPositions(self, positions) -> None:
        """(R, N0, 3) per-replica positions (or (N0, 3), broadcast).  Pad
        replicas (rx*rz > R layouts) receive copies of replica 0."""
        p = np.asarray(positions, np.float64)
        if p.ndim == 2:
            p = np.broadcast_to(p, (self._n_replicas,) + p.shape)
        if p.shape[0] == self._n_replicas and self._r_int > self._n_replicas:
            pad = np.broadcast_to(
                p[0], (self._r_int - self._n_replicas,) + p.shape[1:])
            p = np.concatenate([p, pad], axis=0)
        self.context.setPositions(p.reshape(-1, 3))

    def setVelocities(self, velocities) -> None:
        """(R, N0, 3) per-replica velocities (or (N0, 3), broadcast).  Pad
        replicas receive copies of replica 0's."""
        v = np.asarray(velocities, np.float64)
        if v.ndim == 2:
            v = np.broadcast_to(v, (self._n_replicas,) + v.shape)
        if v.shape[0] == self._n_replicas and self._r_int > self._n_replicas:
            pad = np.broadcast_to(
                v[0], (self._r_int - self._n_replicas,) + v.shape[1:])
            v = np.concatenate([v, pad], axis=0)
        self.context.setVelocities(v.reshape(-1, 3))

    def setVelocitiesToTemperature(self, temperature: float,
                                   seed: int = 0) -> None:
        self.context.setVelocitiesToTemperature(temperature, seed=seed)

    def positions(self) -> np.ndarray:
        """(R, N0, 3)."""
        return np.asarray(self.context._state.positions, np.float64).reshape(
            self._r_int, self._n0, 3)[:self._n_replicas]

    def velocities(self) -> np.ndarray:
        return np.asarray(self.context._state.velocities,
                          np.float64).reshape(
            self._r_int, self._n0, 3)[:self._n_replicas]

    def kinetic_energies(self) -> np.ndarray:
        """(R,) per-replica KE: the cached value of the last NH half-step
        (KESum semantics, reference CudaDrudeTGNHKernels.cpp:654-661), or
        instantaneous per-replica 1/2 m v^2 before any step has run."""
        if self.context._ke_valid:
            return np.asarray(self.context._state.ke_sum,
                              np.float64)[:self._n_replicas]
        m = np.asarray(self.context._spec.mass, np.float64)
        v = np.asarray(self.context._state.velocities, np.float64)
        ke = 0.5 * m * np.sum(v * v, axis=-1)
        return ke.reshape(self._r_int,
                          self._n0).sum(axis=1)[:self._n_replicas]

    def group_temperatures(self) -> np.ndarray:
        """(R, G+2) per-replica per-bath temperatures (K)."""
        st = self.context.getState(energy=True, groups=True)
        return np.asarray(st.getGroupTemperatures(),
                          np.float64)[:self._n_replicas]

    def potential_energies(self) -> np.ndarray:
        """(R,) per-replica potential energies.

        The flattened sweep only produces the ensemble total, so this
        re-evaluates the TEMPLATE context's potential per replica (vmapped,
        with per-replica neighbor rebuilds) on the current positions — a
        reporting path, not a hot path.  Identical physics by construction
        (tests/test_flatrep.py pins flattened == independent Contexts)."""
        import jax
        import jax.numpy as jnp
        tpl = self._template
        tpl._ensure_forces()
        R, n0 = self._n_replicas, self._n0
        st = self.context._state
        pos = jnp.reshape(st.positions, (self._r_int, n0, 3))[:R]
        perr = (None if st.pos_err is None
                else jnp.reshape(st.pos_err, (self._r_int, n0, 3))[:R])
        box = st.box
        # under NPT each replica carries its own box = template * s_r
        scales = (jnp.ones((R,), box.dtype) if st.rep_scale is None
                  else st.rep_scale[:R].astype(box.dtype))
        if self._jit_pe is None:
            nbf = tpl._neighbor_fn
            pot = tpl._potential

            def one(p, pe, s):
                b = box * s
                nb = None if nbf is None else nbf(p, b)
                return pot(p, b, nb, pe)

            if perr is None:
                self._jit_pe = jax.jit(
                    jax.vmap(lambda p, s: one(p, None, s)))
            else:
                self._jit_pe = jax.jit(jax.vmap(one))
        out = (self._jit_pe(pos, scales) if perr is None
               else self._jit_pe(pos, perr, scales))
        return np.asarray(out, np.float64)

    def total_potential_energy(self) -> float:
        """Sum of the R requested replicas' PEs (pad replicas excluded)."""
        if self._r_int != self._n_replicas:
            return float(self.potential_energies().sum())
        st = self.context.getState(energy=True)
        return float(st.getPotentialEnergy())

    def boxes(self) -> np.ndarray:
        """(R, 3, 3) per-replica box vectors (template box scaled by
        SimState.rep_scale under NPT; identical copies otherwise)."""
        box = np.asarray(self.context._state.box, np.float64)
        rs = self.context._state.rep_scale
        if rs is None:
            return np.broadcast_to(box, (self._n_replicas, 3, 3)).copy()
        s = np.asarray(rs, np.float64)[:self._n_replicas]
        return box[None, :, :] * s[:, None, None]

    def densities(self, total_mass_amu: float = None) -> np.ndarray:
        """(R,) per-replica mass densities in g/mL (mass defaults to the
        template system's total)."""
        if total_mass_amu is None:
            s = self._template._system
            total_mass_amu = sum(s.getParticleMass(i)
                                 for i in range(s.getNumParticles()))
        vols = np.linalg.det(self.boxes())  # nm^3
        return total_mass_amu * 1.66053906660 / (vols * 1e3)

    # -- dynamics -----------------------------------------------------------

    def step(self, n: int) -> None:
        self.context._integrator.step(n)

    @property
    def n_replicas(self) -> int:
        return self._n_replicas

    @property
    def n_replicas_padded(self) -> int:
        """Internal rx*rz replica count (== n_replicas unless the auto
        layout padded the ensemble to fill lane tiles)."""
        return self._r_int
