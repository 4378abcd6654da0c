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

    if isinstance(f, CMMotionRemover):
        return CMMotionRemover(f.getFrequency())

    if isinstance(f, MonteCarloBarostat):
        raise ValueError(
            "flattened ensembles do not support a barostat: per-replica "
            "boxes would break the shared embedded cell grid (use "
            "parallel/ensemble.py's vmap ReplicaEnsemble for NPT replicas)")

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
    axes (rx*rz == R).  The default picks the smallest rz (divisor of R)
    whose (y, z) plane fills one 128-lane tile and stacks the rest along
    x — filling lanes without blowing the Pallas kernel's VMEM layer
    slabs (which scale with gy*rz*gz).  Positions default to R copies of
    the template's current positions.
    """

    def __init__(self, context, n_replicas: int, rx: int | None = None,
                 rz: int | None = None, seed: int = 0,
                 nb_options: dict | None = None):
        from ..app.context import Context
        R = int(n_replicas)
        if rx is None and rz is None:
            rz = self._auto_rz(context, R, nb_options)
            rx = R // rz
        elif rz is None:
            if R % rx:
                raise ValueError("rx must divide n_replicas")
            rz = R // rx
        elif rx is None:
            if R % rz:
                raise ValueError("rz must divide n_replicas")
            rx = R // rz
        if rx * rz != R:
            raise ValueError("rx*rz must equal n_replicas")
        self._n_replicas = R
        self._n0 = context._system.getNumParticles()
        self._template = context
        ext_system = replicate_system(context._system, R)
        ext_integ = _clone_integrator(context._integrator, R)
        nb = dict(context._nb_kwargs)
        nb.update(nb_options or {})
        nb["ensemble"] = (R, rx, rz)
        self.context = Context(ext_system, ext_integ,
                               precision=context._prec,
                               strategy="cellpair", seed=seed,
                               hardwall_strict=context._hardwall_strict,
                               nb_options=nb, ensemble_r=R)
        pos0 = np.asarray(context._state.positions, np.float64)
        self.setPositions(np.broadcast_to(pos0, (R,) + pos0.shape))

    @staticmethod
    def _auto_rz(context, R: int, nb_options) -> int:
        """Smallest divisor of R whose extended (y, z) cell plane reaches
        one 128-lane tile (the per-replica grid plan mirrors
        cellpair.make_ensemble_config's)."""
        nb = dict(context._nb_kwargs)
        nb.update(nb_options or {})
        nbf = [f for f in context._system.getForces()
               if type(f).__name__ == "NonbondedForce"]
        if not nbf:
            return R
        r_list = nbf[0].getCutoffDistance() + nb.get("skin", 0.1)
        target = r_list / nb.get("cells_per_cutoff", 2)
        box0 = np.diagonal(np.array(
            context._system.getDefaultPeriodicBoxVectors(), np.float64))
        pg = [max(int(np.floor(L / target)), 1) for L in box0]
        n_yz0 = pg[1] * pg[2]
        for rz in range(1, R + 1):
            if R % rz == 0 and n_yz0 * rz >= 128:
                return rz
        return R

    # -- state I/O ----------------------------------------------------------

    def setPositions(self, positions) -> None:
        """(R, N0, 3) per-replica positions (or (N0, 3), broadcast)."""
        p = np.asarray(positions, np.float64)
        if p.ndim == 2:
            p = np.broadcast_to(p, (self._n_replicas,) + p.shape)
        self.context.setPositions(p.reshape(-1, 3))

    def setVelocitiesToTemperature(self, temperature: float,
                                   seed: int = 0) -> None:
        self.context.setVelocitiesToTemperature(temperature, seed=seed)

    def positions(self) -> np.ndarray:
        """(R, N0, 3)."""
        return np.asarray(self.context._state.positions,
                          np.float64).reshape(self._n_replicas, self._n0, 3)

    def velocities(self) -> np.ndarray:
        return np.asarray(self.context._state.velocities,
                          np.float64).reshape(self._n_replicas, self._n0, 3)

    def kinetic_energies(self) -> np.ndarray:
        """(R,) per-replica KE: the cached value of the last NH half-step
        (KESum semantics, reference CudaDrudeTGNHKernels.cpp:654-661), or
        instantaneous per-replica 1/2 m v^2 before any step has run."""
        if self.context._ke_valid:
            return np.asarray(self.context._state.ke_sum, np.float64)
        m = np.asarray(self.context._spec.mass, np.float64)
        v = np.asarray(self.context._state.velocities, np.float64)
        ke = 0.5 * m * np.sum(v * v, axis=-1)
        return ke.reshape(self._n_replicas, self._n0).sum(axis=1)

    def group_temperatures(self) -> np.ndarray:
        """(R, G+2) per-replica per-bath temperatures (K)."""
        st = self.context.getState(energy=True, groups=True)
        return np.asarray(st.getGroupTemperatures(), np.float64)

    def potential_energies(self) -> None:
        raise NotImplementedError(
            "per-replica potential energies are not decomposed by the "
            "flattened sweep; use total_potential_energy() or the vmap "
            "ReplicaEnsemble")

    def total_potential_energy(self) -> float:
        st = self.context.getState(energy=True)
        return float(st.getPotentialEnergy())

    # -- dynamics -----------------------------------------------------------

    def step(self, n: int) -> None:
        self.context._integrator.step(n)

    @property
    def n_replicas(self) -> int:
        return self._n_replicas
