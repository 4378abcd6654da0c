"""Compile a System + DrudeTGNHIntegrator into immutable dense-array pytrees.

This performs, once on the host, everything the reference does in
DrudeTGNHIntegrator::initialize() and the platform kernels' initialize()
(openmmapi/src/DrudeTGNHIntegrator.cpp:103-160,
platforms/cuda/src/CudaDrudeTGNHKernels.cpp:75-282):

  - locate the single DrudeForce (throw if 0 or >1)
  - residue (= molecule) decomposition and residue masses
  - temperature-group layout: user groups 0..G-1, group G = molecular COM
    bath, group G+1 = Drude internal bath
  - DOF accounting including the COM-projection reduced-mass correction
    (tempGroupRedMass, CudaDrudeTGNHKernels.cpp:130-132,219-220), constraint
    and CMMotionRemover deductions
  - NH chain masses and initial accelerations
  - constraint partitioning into analytic SETTLE triangles vs iterative SHAKE
  - virtual-site tables

The result is a SystemSpec pytree of jnp arrays (passed as a traced argument
to the jitted step) and a hashable StaticSpec (closure constants).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..units import BOLTZ
from . import topology


class SpecError(ValueError):
    pass


@dataclasses.dataclass(frozen=True)
class StaticSpec:
    n_atoms: int
    n_residues: int
    n_temp_groups: int          # G (user groups); total baths = G + 2
    n_chains: int               # NH chain length M
    drude_steps: int            # MTS substeps per real step
    use_drude_nh_chains: bool
    use_com_temp_group: bool
    has_pairs: bool
    has_hardwall: bool
    n_settle: int
    n_shake: int
    n_vsites_avg: int           # 2/3-particle average sites
    n_vsites_oop: int           # out-of-plane sites
    n_vsites_lc: int            # local-coordinates sites
    cm_freq: int                # 0 = no CMMotionRemover
    baro_freq: int              # 0 = no barostat
    constraint_tol: float
    shake_max_iter: int = 150
    # uniform molecule-major layout (build_spec detection): every residue
    # is K consecutive atoms with the SAME within-block partner offsets.
    # Lets the kinematics replace random partner gathers with lane shifts
    # (uniform_k = 0 disables the fast path; parallel/resident.py local
    # layouts disable it explicitly because of the dummy tail)
    uniform_k: int = 0
    partner_offsets: tuple = ()
    # flattened replica ensembles (parallel/flatrep.py): the system is R
    # identical replicas in replica-major atom order; NH baths become
    # (R, G+2) with PER-REPLICA constants (nh_nkbt etc. are per replica),
    # and all KE/CM reductions run per replica
    ensemble_r: int = 1
    # avg-only vsite composition as static LANE SHIFTS: out[j] =
    # sum_k vs_comp_w[k, j] * positions[j - shift_k] — replaces the
    # (Va, 3, 3) trailing-axis gathers + row scatter of the generic
    # apply_vsites path (both on this codebase's banned-op list; measured
    # 14 ms at 1M atoms).  () disables (OOP/LC sites, chained parents,
    # resident local layouts).
    vs_comp_shifts: tuple = ()
    # uniform SETTLE layout: (K, qa, qb, qc) when every residue carries
    # exactly one settle triangle at the same in-block atom offsets —
    # settle's ~7 random (3, S) gathers then collapse to strided slices
    # of the (3, R, K) reshape (constraints/settle.py).  () disables.
    settle_uniform: tuple = ()

    @property
    def n_baths(self) -> int:
        return self.n_temp_groups + 2


class SystemSpec(NamedTuple):
    """Dense per-atom/per-group arrays (all jnp; a single pytree argument)."""
    mass: jax.Array            # (N,)
    inv_mass: jax.Array        # (N,) 0 for massless
    tg: jax.Array              # (N,) int32 temperature group
    resid: jax.Array           # (N,) int32 residue id
    res_mass: jax.Array        # (R,)
    res_inv_mass: jax.Array    # (R,)
    res_members: jax.Array     # (R, S) int32 atom ids, padded with N —
                               # gather table replacing per-residue
                               # segment_sum scatters on TPU
    is_pair: jax.Array         # (N,) bool, member of a Drude pair
    is_parent: jax.Array       # (N,) bool, parent (core) of a pair
    partner: jax.Array         # (N,) int32, pair partner (self if not in a pair)
    # NH thermostat constants
    nh_nkbt: jax.Array         # (G+2,)
    nh_eta_mass: jax.Array     # (G+2, M)
    nh_kbt_chain: jax.Array    # (G+2,) kT target of chain links
    nh_link_active: jax.Array  # (G+2, M) bool
    # integration scalars
    dt: jax.Array              # step size, ps
    max_drude_distance: jax.Array
    hardwall_scale: jax.Array  # sqrt(kB * T_drude)
    # constraints
    settle_idx: jax.Array      # (S, 3) int32 [central, sat1, sat2]
    settle_dist: jax.Array     # (S, 2) [d_central_sat, d_sat_sat]
    settle_gather: jax.Array   # (N,) int32 into flattened (3S+1) correction
                               # rows (role*S + cluster; 3S = zero row) —
                               # scatter-free constraint application
    shake_idx: jax.Array       # (C, 2) int32
    shake_dist: jax.Array      # (C,)
    # constraint membership per atom (for velocity-constraint projection)
    # virtual sites
    vs_avg_idx: jax.Array      # (Va,) int32 site index
    vs_avg_p: jax.Array        # (Va, 3) parent indices
    vs_avg_w: jax.Array        # (Va, 3) weights
    vs_oop_idx: jax.Array      # (Vo,) int32
    vs_oop_p: jax.Array        # (Vo, 3)
    vs_oop_w: jax.Array        # (Vo, 3)
    vs_lc_idx: jax.Array       # (Vl,) int32
    vs_lc_p: jax.Array         # (Vl, K) int32 parents (padded with 0)
    vs_lc_ow: jax.Array        # (Vl, K) origin weights (padded with 0)
    vs_lc_xw: jax.Array        # (Vl, K) x-direction weights
    vs_lc_yw: jax.Array        # (Vl, K) y-direction weights
    vs_lc_local: jax.Array     # (Vl, 3) local position
    # barostat
    baro_pressure: jax.Array   # scalar, kJ/mol/nm^3
    baro_kt: jax.Array         # scalar, kB * T_baro
    # scatter-free J^T spread of vsite forces (constraints/vsites.py
    # spread_vsite_forces): row j lists the force rows feeding atom j —
    # itself with weight 1 (absent when j IS an average site: its raw
    # position never reaches the potential) plus (site, weight) for every
    # average site j parents.  Built only when ALL vsites are 2/3-particle
    # averages (constant Jacobian); None otherwise (OOP/LC Jacobians are
    # position-dependent — those systems keep the autodiff spread).
    vs_spread_src: jax.Array = None   # (N, R) int32, pad 0
    vs_spread_w: jax.Array = None     # (N, R), pad 0.0
    vs_comp_w: jax.Array = None       # (n_shifts, N) lane-shift weights


def _find_drude_force(system):
    from ..forces.drude import DrudeForce
    found = [f for f in system.getForces() if isinstance(f, DrudeForce)]
    # matches reference behavior: throws if 0 or >1 (DrudeTGNHIntegrator.cpp:110-124)
    if len(found) > 1:
        raise SpecError("The System contains multiple DrudeForces")
    if len(found) == 0:
        raise SpecError("The System does not contain a DrudeForce")
    return found[0]


def _partition_constraints(system, masses):
    """Split constraints into analytic SETTLE triangles and SHAKE list."""
    n_cons = system.getNumConstraints()
    cons = [system.getConstraintParameters(i) for i in range(n_cons)]
    # group constraints by the set of atoms they touch (via union-find)
    uf = topology.UnionFind(system.getNumParticles())
    for p1, p2, _ in cons:
        uf.union(p1, p2)
    clusters: dict[int, list] = {}
    for c in cons:
        clusters.setdefault(uf.find(c[0]), []).append(c)

    settle, shake = [], []
    for cl in clusters.values():
        atoms = sorted({a for c in cl for a in (c[0], c[1])})
        ok = False
        if len(cl) == 3 and len(atoms) == 3:
            # find central atom (member of two equal-length constraints)
            for center in atoms:
                others = [a for a in atoms if a != center]
                d_cs = [c[2] for c in cl if center in (c[0], c[1])]
                d_ss = [c[2] for c in cl if center not in (c[0], c[1])]
                if (len(d_cs) == 2 and len(d_ss) == 1
                        and abs(d_cs[0] - d_cs[1]) < 1e-10
                        and abs(masses[others[0]] - masses[others[1]]) < 1e-10
                        and masses[others[0]] > 0 and masses[center] > 0):
                    settle.append((center, others[0], others[1], d_cs[0], d_ss[0]))
                    ok = True
                    break
        if not ok:
            shake.extend(cl)
    return settle, shake


def build_spec(system, integrator, real_dtype, accum_dtype,
               ensemble_r: int = 1):
    """Returns (SystemSpec, StaticSpec, init_eta_dot_dot (np)).

    ensemble_r > 1: the system is a flattened replica ensemble — R
    identical replicas in replica-major atom order (parallel/flatrep.py).
    All per-atom bookkeeping is computed on the full (replicated) system;
    the NH bath constants are reduced to PER-REPLICA values (the DOF
    accounting is linear in R once the CMMotionRemover's -3 is applied per
    replica), because the baths themselves become (R, G+2)."""
    n = system.getNumParticles()
    drude_force = _find_drude_force(system)

    masses = np.array([system.getParticleMass(i) for i in range(n)], np.float64)
    inv_mass = np.where(masses > 0, 1.0 / np.where(masses > 0, masses, 1.0), 0.0)

    # residues = molecules (reference DrudeTGNHIntegrator.cpp:136-143)
    resid = topology.molecule_ids(system)
    res_mass = topology.residue_masses(system, resid)
    n_res = len(res_mass)
    res_inv_mass = np.where(res_mass > 0, 1.0 / np.where(res_mass > 0, res_mass, 1.0), 0.0)
    # padded per-residue member table (for gather-based COM reductions)
    counts = np.bincount(resid, minlength=n_res)
    res_max = int(counts.max()) if n_res else 1
    res_members = np.full((n_res, res_max), n, np.int32)
    fill = np.zeros(n_res, np.int64)
    for i, rid in enumerate(resid):
        res_members[rid, fill[rid]] = i
        fill[rid] += 1

    # temperature groups: default all particles to group 0 if none assigned
    # (reference DrudeTGNHIntegrator.cpp:127-134)
    G = max(integrator.getNumTempGroups(), 1)
    tg = np.array(integrator._particle_temp_group, np.int32) \
        if integrator._particle_temp_group else np.zeros(n, np.int32)
    if len(tg) != n:
        raise SpecError("Number of particle temperature groups must match "
                        "the number of particles in the System")
    if tg.min() < 0 or tg.max() >= G:
        raise SpecError("Particle temperature group out of range")

    # Drude pairs
    n_pairs = drude_force.getNumParticles()
    is_pair = np.zeros(n, bool)
    is_parent = np.zeros(n, bool)
    partner = np.arange(n, dtype=np.int32)
    for i in range(n_pairs):
        p = drude_force.getParticleParameters(i)
        d, c = p[0], p[1]
        if tg[d] != tg[c]:
            raise SpecError("Temperature group for drude particle must be the "
                            "same as the parent particle")
        is_pair[d] = is_pair[c] = True
        is_parent[c] = True
        partner[d], partner[c] = c, d

    # ---- DOF accounting (CudaDrudeTGNHKernels.cpp:109-235) ----------------
    use_com = bool(integrator.getUseCOMTempGroup())
    dof = np.zeros(G + 2)
    red_mass = np.zeros(G + 2)
    for i in range(n):
        if masses[i] != 0.0:
            dof[tg[i]] += 3
            if use_com:
                red_mass[tg[i]] += 3 * masses[i] * res_inv_mass[resid[i]]
    drude_dof = 3 * n_pairs
    for i in range(n_pairs):
        p = drude_force.getParticleParameters(i)
        dof[tg[p[0]]] -= 3
    for ci in range(system.getNumConstraints()):
        p1, p2, _ = system.getConstraintParameters(ci)
        if tg[p1] != tg[p2]:
            raise SpecError("Temperature group of constrained particles must "
                            "be the same")
        dof[tg[p1]] -= 1
    if use_com:
        dof[G] = 3 * n_res
    dof[G + 1] = drude_dof

    from ..forces.cmmotion import CMMotionRemover, MonteCarloBarostat
    cm_freq = 0
    baro_freq = 0
    baro_pressure = 0.0
    baro_temp = 0.0
    for f in system.getForces():
        if isinstance(f, CMMotionRemover):
            cm_freq = f.getFrequency()
            if use_com:
                # reference reduces the COM bath by 3 (CudaDrudeTGNHKernels.cpp:204-212);
                # a flattened ensemble removes each replica's own CM
                dof[G] -= 3 * ensemble_r
        elif isinstance(f, MonteCarloBarostat):
            from ..units import BAR_TO_KJ_PER_MOL_NM3
            baro_freq = f.getFrequency()
            baro_pressure = f.getDefaultPressure() * BAR_TO_KJ_PER_MOL_NM3
            baro_temp = f.getDefaultTemperature()

    if ensemble_r > 1:
        if n % ensemble_r or (n_res and n_res % ensemble_r) \
                or n_pairs % ensemble_r:
            raise SpecError("flattened ensemble: atom/residue/pair counts "
                            "must be divisible by the replica count")
        # barostat + flattened ensemble: per-replica NPT via
        # SimState.rep_scale (stored-coordinate sweep on the shared
        # template grid, per-replica MC moves —
        # integrators/barostat.maybe_attempt_mc_move_ensemble)
        # per-replica bath constants: identical replicas make the ext
        # accounting exactly R x the template's (CM -3 handled above)
        dof = dof / ensemble_r
        red_mass = red_mass / ensemble_r
        drude_dof = drude_dof // ensemble_r

    # ---- NH chain constants (CudaDrudeTGNHKernels.cpp:214-235) ------------
    M = integrator.getNumNHChains()
    real_kbt = BOLTZ * integrator.getTemperature()
    drude_kbt = BOLTZ * integrator.getDrudeTemperature()
    tau_r = integrator.getCouplingTime()
    tau_d = integrator.getDrudeCouplingTime()
    real_unit = real_kbt * tau_r ** 2
    drude_unit = drude_kbt * tau_d ** 2

    nkbt = np.zeros(G + 2)
    eta_mass = np.zeros((G + 2, M))
    kbt_chain = np.zeros(G + 2)
    init_edd = np.zeros((G + 2, M))
    for i in range(G + 1):
        nkbt[i] = (dof[i] - red_mass[i]) * real_kbt
        eta_mass[i, 0] = (dof[i] - red_mass[i]) * real_unit
        kbt_chain[i] = real_kbt
        for ich in range(1, M):
            eta_mass[i, ich] = real_unit
            init_edd[i, ich] = -real_kbt / eta_mass[i, ich]
    nkbt[G + 1] = drude_dof * drude_kbt
    eta_mass[G + 1, 0] = drude_dof * drude_unit
    kbt_chain[G + 1] = drude_kbt
    use_drude_chains = bool(integrator.getUseDrudeNHChains())
    for ich in range(1, M):
        eta_mass[G + 1, ich] = drude_unit
        if use_drude_chains:
            init_edd[G + 1, ich] = -drude_kbt / eta_mass[G + 1, ich]

    link_active = np.ones((G + 2, M), bool)
    if not use_drude_chains:
        link_active[G + 1, 1:] = False

    # ---- constraints ------------------------------------------------------
    settle, shake = _partition_constraints(system, masses)
    settle_idx = np.array([[s[0], s[1], s[2]] for s in settle], np.int32) \
        .reshape(-1, 3)
    settle_dist = np.array([[s[3], s[4]] for s in settle], np.float64).reshape(-1, 2)
    shake_idx = np.array([[c[0], c[1]] for c in shake], np.int32).reshape(-1, 2)
    shake_dist = np.array([c[2] for c in shake], np.float64)
    # scatter-free settle application: atom -> row of the flattened
    # (role * S + cluster) correction table; non-settle atoms -> zero row
    n_settle = len(settle)
    settle_gather = np.full(n, 3 * n_settle, np.int32)
    for k in range(n_settle):
        for role in range(3):
            settle_gather[settle_idx[k, role]] = role * n_settle + k

    # ---- virtual sites ----------------------------------------------------
    from ..system import (LocalCoordinatesSite, OutOfPlaneSite,
                          ThreeParticleAverageSite, TwoParticleAverageSite)
    avg_idx, avg_p, avg_w = [], [], []
    oop_idx, oop_p, oop_w = [], [], []
    lc = []
    for i in range(n):
        if not system.isVirtualSite(i):
            continue
        vs = system.getVirtualSite(i)
        if isinstance(vs, TwoParticleAverageSite):
            avg_idx.append(i)
            avg_p.append((vs.particles[0], vs.particles[1], vs.particles[0]))
            avg_w.append((vs.weights[0], vs.weights[1], 0.0))
        elif isinstance(vs, ThreeParticleAverageSite):
            avg_idx.append(i)
            avg_p.append(vs.particles)
            avg_w.append(vs.weights)
        elif isinstance(vs, OutOfPlaneSite):
            oop_idx.append(i)
            oop_p.append(vs.particles)
            oop_w.append(vs.weights)
        elif isinstance(vs, LocalCoordinatesSite):
            lc.append((i, vs))
        else:
            raise SpecError(f"Unsupported virtual site type {type(vs).__name__}")
    lc_k = max((len(v.particles) for _, v in lc), default=1)
    lc_idx = np.array([i for i, _ in lc], np.int32)
    lc_p = np.zeros((len(lc), lc_k), np.int32)
    lc_ow = np.zeros((len(lc), lc_k), np.float64)
    lc_xw = np.zeros((len(lc), lc_k), np.float64)
    lc_yw = np.zeros((len(lc), lc_k), np.float64)
    lc_local = np.zeros((len(lc), 3), np.float64)
    for row, (i, vs) in enumerate(lc):
        k = len(vs.particles)
        lc_p[row, :k] = vs.particles
        lc_ow[row, :k] = vs.origin_weights
        lc_xw[row, :k] = vs.x_weights
        lc_yw[row, :k] = vs.y_weights
        lc_local[row] = vs.local_position

    # ---- J^T spread tables (average-only vsite systems) -------------------
    spread_src = spread_w = None
    if avg_idx and not oop_idx and not lc:
        refs = [[] for _ in range(n)]
        is_avg = np.zeros(n, bool)
        is_avg[avg_idx] = True
        for row, site in enumerate(avg_idx):
            for k in range(3):
                if avg_w[row][k] != 0.0:
                    refs[avg_p[row][k]].append((site, avg_w[row][k]))
        for j in range(n):
            if not is_avg[j]:
                refs[j].insert(0, (j, 1.0))
        r_max = max(len(r_) for r_ in refs)
        spread_src = np.zeros((n, r_max), np.int32)
        spread_w = np.zeros((n, r_max), np.float64)
        for j, r_ in enumerate(refs):
            for k, (s_, w_) in enumerate(r_):
                spread_src[j, k] = s_
                spread_w[j, k] = w_

    # ---- lane-shift vsite composition (average-only systems) --------------
    comp_shifts = ()
    comp_w = None
    if avg_idx and not oop_idx and not lc:
        is_avg2 = np.zeros(n, bool)
        is_avg2[avg_idx] = True
        chained = any(is_avg2[p_] for row in avg_p for p_ in row)
        if not chained:
            from collections import defaultdict
            cmap = [defaultdict(float) for _ in range(n)]
            for j in range(n):
                if not is_avg2[j]:
                    cmap[j][0] += 1.0
            for row, site in enumerate(avg_idx):
                for k in range(3):
                    if avg_w[row][k] != 0.0:
                        cmap[site][site - avg_p[row][k]] += avg_w[row][k]
            shifts = sorted({d for m_ in cmap for d in m_})
            if len(shifts) <= 8:
                comp_shifts = tuple(int(d) for d in shifts)
                comp_w = np.zeros((len(shifts), n))
                for j, m_ in enumerate(cmap):
                    for d, w_ in m_.items():
                        comp_w[shifts.index(d), j] = w_

    # ---- uniform molecule-major layout detection --------------------------
    # When every residue is K consecutive atoms and the within-block partner
    # offset pattern is identical across residues (true for homogeneous
    # boxes like the 100k-atom SWM4 benchmark), the kinematics' random
    # partner gathers become static lane shifts (integrators/tgnh.py
    # _partner_rows) — gathers measured ~40x a linear pass on v5e.
    uniform_k = 0
    partner_offsets = ()
    if n_res and n % n_res == 0:
        K_u = n // n_res
        ids = np.arange(n)
        if np.array_equal(np.asarray(resid), ids // K_u):
            offK = (partner - ids).reshape(n_res, K_u)
            if (offK == offK[0]).all():
                uniform_k = K_u
                partner_offsets = tuple(int(x) for x in offK[0])

    settle_uniform = ()
    if uniform_k and n_settle and n_res and n_settle == n_res:
        K_u = uniform_k
        si = np.asarray(settle_idx)
        cl = si[:, 0] // K_u
        offs3 = si - (cl * K_u)[:, None]
        if (np.array_equal(cl, np.arange(n_settle))
                and (si // K_u == cl[:, None]).all()
                and (offs3 == offs3[0]).all()):
            settle_uniform = (int(K_u), int(offs3[0, 0]),
                              int(offs3[0, 1]), int(offs3[0, 2]))

    static = StaticSpec(
        n_atoms=n,
        n_residues=n_res,
        n_temp_groups=G,
        n_chains=M,
        drude_steps=integrator.getDrudeStepsPerRealStep(),
        use_drude_nh_chains=use_drude_chains,
        use_com_temp_group=use_com,
        has_pairs=n_pairs > 0,
        has_hardwall=integrator.getMaxDrudeDistance() > 0,
        n_settle=len(settle),
        n_shake=len(shake),
        n_vsites_avg=len(avg_idx),
        n_vsites_oop=len(oop_idx),
        n_vsites_lc=len(lc),
        cm_freq=cm_freq,
        baro_freq=baro_freq,
        constraint_tol=float(integrator.getConstraintTolerance()),
        uniform_k=uniform_k,
        partner_offsets=partner_offsets,
        vs_comp_shifts=comp_shifts,
        settle_uniform=settle_uniform,
        ensemble_r=ensemble_r,
    )

    r, a = real_dtype, accum_dtype
    spec = SystemSpec(
        mass=jnp.asarray(masses, r),
        inv_mass=jnp.asarray(inv_mass, r),
        tg=jnp.asarray(tg),
        resid=jnp.asarray(resid),
        res_mass=jnp.asarray(res_mass, r),
        res_inv_mass=jnp.asarray(res_inv_mass, r),
        res_members=jnp.asarray(res_members),
        is_pair=jnp.asarray(is_pair),
        is_parent=jnp.asarray(is_parent),
        partner=jnp.asarray(partner),
        nh_nkbt=jnp.asarray(nkbt, a),
        nh_eta_mass=jnp.asarray(eta_mass, a),
        nh_kbt_chain=jnp.asarray(kbt_chain, a),
        nh_link_active=jnp.asarray(link_active),
        dt=jnp.asarray(integrator.getStepSize(), a),
        max_drude_distance=jnp.asarray(integrator.getMaxDrudeDistance(), r),
        hardwall_scale=jnp.asarray(
            np.sqrt(BOLTZ * integrator.getDrudeTemperature()), r),
        settle_idx=jnp.asarray(settle_idx),
        settle_dist=jnp.asarray(settle_dist, r),
        settle_gather=jnp.asarray(settle_gather),
        shake_idx=jnp.asarray(shake_idx),
        shake_dist=jnp.asarray(shake_dist, r),
        vs_avg_idx=jnp.asarray(np.array(avg_idx, np.int32)),
        vs_avg_p=jnp.asarray(np.array(avg_p, np.int32).reshape(-1, 3)),
        vs_avg_w=jnp.asarray(np.array(avg_w, np.float64).reshape(-1, 3), r),
        vs_oop_idx=jnp.asarray(np.array(oop_idx, np.int32)),
        vs_oop_p=jnp.asarray(np.array(oop_p, np.int32).reshape(-1, 3)),
        vs_oop_w=jnp.asarray(np.array(oop_w, np.float64).reshape(-1, 3), r),
        vs_lc_idx=jnp.asarray(lc_idx),
        vs_lc_p=jnp.asarray(lc_p),
        vs_lc_ow=jnp.asarray(lc_ow, r),
        vs_lc_xw=jnp.asarray(lc_xw, r),
        vs_lc_yw=jnp.asarray(lc_yw, r),
        vs_lc_local=jnp.asarray(lc_local, r),
        baro_pressure=jnp.asarray(baro_pressure, a),
        baro_kt=jnp.asarray(BOLTZ * baro_temp, a),
        vs_spread_src=(jnp.asarray(spread_src) if spread_src is not None
                       else None),
        vs_spread_w=(jnp.asarray(spread_w, r) if spread_w is not None
                     else None),
        vs_comp_w=(jnp.asarray(comp_w, r) if comp_w is not None else None),
    )
    if ensemble_r > 1:
        # per-replica NH chain state: (R, G+2, M)
        init_edd = np.broadcast_to(
            init_edd, (ensemble_r,) + init_edd.shape).copy()
    return spec, static, init_edd
