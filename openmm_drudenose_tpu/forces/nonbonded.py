"""NonbondedForce: Lennard-Jones + Coulomb with exclusions/exceptions.

Methods (matching OpenMM semantics the reference systems rely on —
CutoffPeriodic in testWater at Test*DrudeTGNHIntegrator.cpp:128, PME in
testForceEnergyConsistency at :211 and example/nacl_tg.py:42):

  NoCutoff          : plain 1/r Coulomb + LJ over all pairs
  CutoffNonPeriodic : reaction-field Coulomb + LJ inside cutoff
  CutoffPeriodic    : minimum image + reaction-field Coulomb + LJ
  Ewald/PME         : erfc direct space + smooth-PME reciprocal (forces/pme.py)

Exceptions are excluded from the main pair sum and added as explicit pair
terms (plain Coulomb chargeProd/r + LJ, no cutoff), as in OpenMM.

Pair-sum strategies:
  "dense" : O(N^2) with static exclusion mask — maps straight onto the TPU
            VPU/MXU-free elementwise path; right for <= a few thousand atoms.
  "cell"  : padded neighbor lists from a cell list (forces/neighborlist.py)
            for large N.
Strategy is chosen at compile time from the atom count unless forced.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import erfc

from ..units import ONE_4PI_EPS0


class NonbondedForce:
    NoCutoff = 0
    CutoffNonPeriodic = 1
    CutoffPeriodic = 2
    Ewald = 3
    PME = 4

    def __init__(self):
        self._particles: List[Tuple[float, float, float]] = []  # charge, sigma, eps
        self._exceptions: List[Tuple[int, int, float, float, float]] = []
        self._lj_overrides: List[Tuple] = []  # (set1, set2, sigma, eps)
        self._method = self.NoCutoff
        self._cutoff = 1.0
        self._use_switching = False
        self._switching_distance = -1.0
        self._ewald_tol = 5e-4
        self._rf_dielectric = 78.3
        self._use_dispersion_correction = True
        self._pme_params = (0.0, 0, 0, 0)  # alpha, nx, ny, nz (0 = auto)

    # -- particles / exceptions -------------------------------------------
    def addParticle(self, charge: float, sigma: float, epsilon: float) -> int:
        self._particles.append((float(charge), float(sigma), float(epsilon)))
        return len(self._particles) - 1

    def getNumParticles(self) -> int:
        return len(self._particles)

    def getParticleParameters(self, index: int):
        return self._particles[index]

    def setParticleParameters(self, index: int, charge, sigma, epsilon):
        self._particles[index] = (float(charge), float(sigma), float(epsilon))

    def addException(self, particle1: int, particle2: int, chargeProd: float,
                     sigma: float, epsilon: float, replace: bool = False) -> int:
        self._exceptions.append((int(particle1), int(particle2), float(chargeProd),
                                 float(sigma), float(epsilon)))
        return len(self._exceptions) - 1

    def addLJPairOverride(self, particles1, particles2, sigma: float,
                          epsilon: float) -> int:
        """NBFIX-style pair-specific LJ: every (i in particles1, j in
        particles2) pair interacts with the given sigma/epsilon instead of
        the Lorentz-Berthelot combination (CHARMM NBFIX semantics; the
        reference example's charmm_polar_2013.xml carries these for ion
        pairs).  Implemented as an explicit cutoff-masked correction term
        over the cross pairs — exact, and O(n1*n2) is tiny for ion counts."""
        self._lj_overrides.append((tuple(int(p) for p in particles1),
                                   tuple(int(p) for p in particles2),
                                   float(sigma), float(epsilon)))
        return len(self._lj_overrides) - 1

    def getNumExceptions(self) -> int:
        return len(self._exceptions)

    def getExceptionParameters(self, index: int):
        return self._exceptions[index]

    # -- method / options --------------------------------------------------
    def setNonbondedMethod(self, method: int) -> None:
        self._method = int(method)

    def getNonbondedMethod(self) -> int:
        return self._method

    def setCutoffDistance(self, cutoff: float) -> None:
        self._cutoff = float(cutoff)

    def getCutoffDistance(self) -> float:
        return self._cutoff

    def setUseSwitchingFunction(self, use: bool) -> None:
        self._use_switching = bool(use)

    def getUseSwitchingFunction(self) -> bool:
        return self._use_switching

    def setSwitchingDistance(self, distance: float) -> None:
        self._switching_distance = float(distance)

    def getSwitchingDistance(self) -> float:
        return self._switching_distance

    def setEwaldErrorTolerance(self, tol: float) -> None:
        self._ewald_tol = float(tol)

    def getEwaldErrorTolerance(self) -> float:
        return self._ewald_tol

    def setReactionFieldDielectric(self, eps: float) -> None:
        self._rf_dielectric = float(eps)

    def getReactionFieldDielectric(self) -> float:
        return self._rf_dielectric

    def setUseDispersionCorrection(self, use: bool) -> None:
        self._use_dispersion_correction = bool(use)

    def getUseDispersionCorrection(self) -> bool:
        return self._use_dispersion_correction

    def setPMEParameters(self, alpha: float, nx: int, ny: int, nz: int) -> None:
        self._pme_params = (float(alpha), int(nx), int(ny), int(nz))

    def usesPeriodicBoundaryConditions(self) -> bool:
        return self._method in (self.CutoffPeriodic, self.Ewald, self.PME)

    def bonded_pairs(self) -> List[Tuple[int, int]]:
        """Exceptions link particles into molecules, as in OpenMM's
        getMolecules() (used for the residue decomposition,
        reference DrudeTGNHIntegrator.cpp:136-143)."""
        return [(e[0], e[1]) for e in self._exceptions]

    # -- compilation -------------------------------------------------------
    def compile(self, system, dtype, strategy: str = "auto", nb_kwargs=None):
        n = len(self._particles)
        if n == 0:
            return None, None
        if n != system.getNumParticles():
            raise ValueError("NonbondedForce must define parameters for every particle")

        charge = np.array([p[0] for p in self._particles], np.float64)
        sigma = np.array([p[1] for p in self._particles], np.float64)
        eps = np.array([p[2] for p in self._particles], np.float64)

        exc_i = np.array([e[0] for e in self._exceptions], np.int32)
        exc_j = np.array([e[1] for e in self._exceptions], np.int32)
        exc_qq = np.array([e[2] for e in self._exceptions], np.float64)
        exc_sigma = np.array([e[3] for e in self._exceptions], np.float64)
        exc_eps = np.array([e[4] for e in self._exceptions], np.float64)

        # triclinic (reduced-form) periodic boxes run through the dense
        # all-pairs strategy at small N and the cell-pair sweep at scale
        # (fractional-coordinate binning + plane-width stencil metric,
        # forces/cellpair.py); only the legacy neighbor-list strategy
        # stays orthorhombic
        from .boxutils import is_triclinic, mi_box, volume as box_volume
        box0_full = np.array(system.getDefaultPeriodicBoxVectors(),
                             np.float64)
        is_tri = (self._method in (self.CutoffPeriodic, self.Ewald,
                                   self.PME)
                  and is_triclinic(box0_full))
        if is_tri:
            w_min = min(box0_full[0, 0], box0_full[1, 1], box0_full[2, 2])
            if self._method != self.NoCutoff and self._cutoff > w_min / 2:
                raise ValueError(
                    f"cutoff {self._cutoff} exceeds half the smallest "
                    f"perpendicular width {w_min} of the triclinic box — "
                    "the sequential minimum-image reduction would miss "
                    "images")

        if strategy == "auto":
            strategy = ("dense" if n <= 4096 or self._method in
                        (self.NoCutoff, self.CutoffNonPeriodic) else "cellpair")
        if is_tri and strategy == "cell":
            raise ValueError(
                "triclinic periodic boxes are not supported by the legacy "
                "neighbor-list strategy; use 'dense', 'cellpair', or "
                "'auto'")

        params = {
            "charge": jnp.asarray(charge, dtype),
            "sigma": jnp.asarray(sigma, dtype),
            "eps": jnp.asarray(eps, dtype),
        }
        periodic = self._method in (self.CutoffPeriodic, self.Ewald, self.PME)
        use_cutoff = self._method != self.NoCutoff
        cutoff = self._cutoff
        method = self._method

        # reaction field constants
        eps_rf = self._rf_dielectric
        krf = (1.0 / cutoff**3) * (eps_rf - 1.0) / (2.0 * eps_rf + 1.0)
        crf = (1.0 / cutoff) * (3.0 * eps_rf) / (2.0 * eps_rf + 1.0)

        # switching function
        use_switch = self._use_switching and use_cutoff and self._switching_distance >= 0
        r_switch = self._switching_distance

        # PME setup
        pme = None
        if method in (self.Ewald, self.PME):
            from . import pme as pme_mod
            box = np.array(system.getDefaultPeriodicBoxVectors(), np.float64)
            alpha0, gx, gy, gz = self._pme_params
            pme = pme_mod.setup_pme(
                cutoff=cutoff, tol=self._ewald_tol,
                box_diag=np.diagonal(box).copy(),
                alpha=alpha0 or None,
                grid=(gx, gy, gz) if gx > 0 else None)
            params["pme_self"] = jnp.asarray(
                -pme.alpha / np.sqrt(np.pi) * ONE_4PI_EPS0 * np.sum(charge**2), dtype)

        # Exclusion handling: every exception pair is excluded from the main
        # sum.  Only exceptions with nonzero interaction get an explicit pair
        # term (zero exceptions — plain exclusions — would produce 0 * inf at
        # r = 0, e.g. a Drude shell starting on top of its core).
        act = (exc_qq != 0.0) | (exc_eps != 0.0)
        n_active_exc = int(np.sum(act))
        if n_active_exc:
            params["exc_i"] = jnp.asarray(exc_i[act])
            params["exc_j"] = jnp.asarray(exc_j[act])
            params["exc_qq"] = jnp.asarray(exc_qq[act], dtype)
            params["exc_sigma"] = jnp.asarray(exc_sigma[act], dtype)
            params["exc_eps"] = jnp.asarray(exc_eps[act], dtype)
        if len(self._exceptions) and method in (self.Ewald, self.PME):
            # reciprocal-space correction applies to ALL excluded pairs
            params["corr_i"] = jnp.asarray(exc_i)
            params["corr_j"] = jnp.asarray(exc_j)

        if strategy == "dense":
            # static (N, N) exclusion mask: False where the pair is skipped
            mask = np.ones((n, n), dtype=bool)
            np.fill_diagonal(mask, False)
            if len(self._exceptions):
                mask[exc_i, exc_j] = False
                mask[exc_j, exc_i] = False
            params["pair_mask"] = jnp.asarray(mask)
        elif strategy not in ("cell", "cellpair"):
            raise ValueError(f"unknown strategy {strategy!r}")

        # NBFIX-style LJ pair overrides -> explicit correction terms
        # (forces/pairterms.py), applied identically in every strategy.
        # ov_cat collects the concatenated pair data so flat-ensemble NPT
        # can evaluate per-replica override sums in the MC delta.
        override_terms = []
        ov_cat = None
        if self._lj_overrides:
            from . import pairterms
            excluded = {(min(a, b), max(a, b))
                        for a, b in zip(exc_i.tolist(), exc_j.tolist())}
            ov_cat = {"pi": [], "pj": [], "sig_new": [], "eps_new": [],
                      "sig_old": [], "eps_old": []}
            for set1, set2, sig_o, eps_o in self._lj_overrides:
                pi, pj = [], []
                for a in set1:
                    for b in set2:
                        if a == b:
                            continue
                        key = (min(a, b), max(a, b))
                        if key in excluded or key in {(p[0], p[1])
                                                      for p in zip(pi, pj)}:
                            continue
                        pi.append(key[0])
                        pj.append(key[1])
                if not pi:
                    continue
                pi = np.array(pi, np.int32)
                pj = np.array(pj, np.int32)
                sig_mix = 0.5 * (sigma[pi] + sigma[pj])
                eps_mix = np.sqrt(eps[pi] * eps[pj])
                ov_cat["pi"].append(pi)
                ov_cat["pj"].append(pj)
                ov_cat["sig_new"].append(np.full(len(pi), sig_o))
                ov_cat["eps_new"].append(np.full(len(pi), eps_o))
                ov_cat["sig_old"].append(sig_mix)
                ov_cat["eps_old"].append(eps_mix)
                override_terms.append(pairterms.make_pair_list_term(
                    n, pi, pj, pairterms.lj_override_eg(
                        jnp.asarray(np.full(len(pi), sig_o), dtype),
                        jnp.asarray(np.full(len(pi), eps_o), dtype),
                        jnp.asarray(sig_mix, dtype),
                        jnp.asarray(eps_mix, dtype),
                        cutoff if use_cutoff else np.inf,
                        use_switch, r_switch),
                    periodic=periodic))
            if not ov_cat["pi"]:
                ov_cat = None

        has_exceptions = n_active_exc > 0 or (
            len(self._exceptions) > 0 and method in (self.Ewald, self.PME))

        # exceptions + Ewald exclusion corrections as scatter-free
        # custom-vjp pair-list terms (forces/pairterms.py), shared by the
        # dense and cellpair strategies.  Uniform molecule-major layouts
        # (same detection as core/spec.py) use the lane-shift variant: all
        # rows are intra-block, so each distinct |j - i| evaluates as one
        # elementwise pass with rolls instead of pair + incidence gathers.
        exc_term = corr_term = None
        if strategy in ("dense", "cellpair"):
            from . import pairterms
            uniform_k = 0
            try:
                from ..core import topology
                resid_u = np.asarray(topology.molecule_ids(system))
                n_res_u = int(resid_u.max()) + 1 if len(resid_u) else 0
                if n_res_u and n % n_res_u == 0:
                    K_u = n // n_res_u
                    if np.array_equal(resid_u, np.arange(n) // K_u):
                        uniform_k = K_u
            except Exception:
                uniform_k = 0

            def shifted(i_rows, j_rows):
                return (uniform_k and pairterms.uniform_pair_shifts(
                    n, uniform_k, i_rows, j_rows) is not None)

            if n_active_exc:
                if shifted(exc_i[act], exc_j[act]):
                    exc_term = pairterms.make_uniform_pair_term(
                        n, uniform_k, exc_i[act], exc_j[act],
                        {"qq": ONE_4PI_EPS0 * exc_qq[act],
                         "sigma": exc_sigma[act], "eps": exc_eps[act]},
                        lambda qq, sigma, eps: pairterms.exception_eg(
                            jnp.asarray(qq, dtype), jnp.asarray(sigma, dtype),
                            jnp.asarray(eps, dtype)),
                        periodic=periodic)
                else:
                    exc_term = pairterms.make_pair_list_term(
                        n, exc_i[act], exc_j[act], pairterms.exception_eg(
                            jnp.asarray(ONE_4PI_EPS0 * exc_qq[act], dtype),
                            jnp.asarray(exc_sigma[act], dtype),
                            jnp.asarray(exc_eps[act], dtype)),
                        periodic=periodic)
            if len(self._exceptions) and method in (self.Ewald, self.PME):
                qq_full = ONE_4PI_EPS0 * charge[exc_i] * charge[exc_j]
                if shifted(exc_i, exc_j):
                    corr_term = pairterms.make_uniform_pair_term(
                        n, uniform_k, exc_i, exc_j, {"qq": qq_full},
                        lambda qq: pairterms.ewald_correction_eg(
                            jnp.asarray(qq, dtype), pme.alpha),
                        periodic=periodic)
                else:
                    corr_term = pairterms.make_pair_list_term(
                        n, exc_i, exc_j, pairterms.ewald_correction_eg(
                            jnp.asarray(qq_full, dtype), pme.alpha),
                        periodic=periodic)
        disp = None
        if self._use_dispersion_correction and periodic and use_cutoff \
                and method != self.NoCutoff:
            disp = _dispersion_coefficient(sigma, eps, cutoff,
                                           use_switch, r_switch)

        def pair_energy(qq, sig, ep, r2, valid):
            """Energy of non-excluded pairs at squared distance r2 (masked)."""
            r2 = jnp.where(valid, r2, 1.0)
            inv_r = 1.0 / jnp.sqrt(r2)
            r = r2 * inv_r
            # LJ
            x6 = (sig * sig * inv_r * inv_r) ** 3
            e_lj = 4.0 * ep * x6 * (x6 - 1.0)
            if use_switch:
                t = jnp.clip((r - r_switch) / (cutoff - r_switch), 0.0, 1.0)
                s = 1.0 + t * t * t * (-10.0 + t * (15.0 - 6.0 * t))
                e_lj = e_lj * s
            # Coulomb
            if method in (self.Ewald, self.PME):
                e_c = qq * erfc(pme.alpha * r) * inv_r
            elif method in (self.CutoffNonPeriodic, self.CutoffPeriodic):
                e_c = qq * (inv_r + krf * r2 - crf)
            else:
                e_c = qq * inv_r
            e = e_lj + e_c
            if use_cutoff:
                valid = valid & (r2 < cutoff * cutoff)
            return jnp.where(valid, e, 0.0)

        def exceptions_energy(params, positions, box_diag,
                              include_recip_corr=True):
            etot = jnp.zeros((), positions.dtype)
            if n_active_exc:
                pi = positions[params["exc_i"]]
                pj = positions[params["exc_j"]]
                delta = pi - pj
                if periodic:
                    delta = delta - box_diag * jnp.round(delta / box_diag)
                r2 = jnp.sum(delta * delta, axis=-1)
                inv_r = 1.0 / jnp.sqrt(r2)
                x6 = (params["exc_sigma"] ** 2 / r2) ** 3
                e = (4.0 * params["exc_eps"] * x6 * (x6 - 1.0)
                     + ONE_4PI_EPS0 * params["exc_qq"] * inv_r)
                etot = etot + jnp.sum(e)
            if method in (self.Ewald, self.PME) and include_recip_corr:
                # reciprocal space included the full charge product for every
                # excluded pair; subtract erf(alpha r)/r * q_i q_j.  The
                # r -> 0 limit (overlapping shell/core at setup) is
                # 2 alpha / sqrt(pi).  (The cellpair strategy applies this
                # correction inside the block sweep instead.)
                ci, cj = params["corr_i"], params["corr_j"]
                delta = positions[ci] - positions[cj]
                if periodic:
                    delta = delta - box_diag * jnp.round(delta / box_diag)
                r2 = jnp.sum(delta * delta, axis=-1)
                qq_full = params["charge"][ci] * params["charge"][cj]
                r = jnp.sqrt(jnp.where(r2 > 0, r2, 1.0))
                erf_over_r = jnp.where(
                    r2 > 0,
                    (1.0 - erfc(pme.alpha * r)) / r,
                    2.0 * pme.alpha / jnp.sqrt(jnp.asarray(np.pi, r.dtype)))
                etot = etot - jnp.sum(ONE_4PI_EPS0 * qq_full * erf_over_r)
            return etot

        if strategy == "dense":
            # analytic all-pairs sweep (forces/dense.py): row-block scan
            # over the full (N, N) matrix, custom-vjp forces, force-only
            # fast path — no neighbor structure, so Context.step is a
            # single scanned device program
            from . import cellpair as cp
            from . import dense as dense_mod
            nb_kwargs = nb_kwargs or {}
            if method in (self.Ewald, self.PME):
                pair_eg = cp.make_pair_eg("ewald", cutoff, alpha=pme.alpha,
                                          use_switch=use_switch,
                                          r_switch=r_switch,
                                          excl_in_sweep=False)
            elif method in (self.CutoffPeriodic, self.CutoffNonPeriodic):
                pair_eg = cp.make_pair_eg("rf", cutoff, krf=krf, crf=crf,
                                          use_switch=use_switch,
                                          r_switch=r_switch)
            else:
                pair_eg = cp.make_pair_eg("none", 1.0)
            sweep_energy, sweep_f = dense_mod.make_custom_energy(
                pair_eg, ONE_4PI_EPS0, params["pair_mask"],
                cutoff if use_cutoff else 1.0, periodic, use_cutoff,
                block_rows=int(nb_kwargs.get("block_rows", 512)))

            def rest_energy(params, positions, box, neighbors=None):
                """Everything except the direct-space sweep: the force-only
                step evaluates the sweep's analytic forces separately and
                autodiffs only this part."""
                bmi = mi_box(box, is_tri)
                e = jnp.zeros((), positions.dtype)
                if exc_term is not None:
                    e = e + exc_term(positions, bmi)
                if corr_term is not None:
                    e = e + corr_term(positions, bmi)
                for t in override_terms:
                    e = e + t(positions, bmi)
                if method in (self.Ewald, self.PME):
                    e = e + params["pme_self"]
                    e = e + pme.reciprocal_energy(params["charge"],
                                                  positions, bmi)
                if disp is not None:
                    e = e + disp / box_volume(bmi)
                return e

            def energy(params, positions, box):
                return (sweep_energy(params, positions, mi_box(box, is_tri))
                        + rest_energy(params, positions, box))

            def sweep_forces(params, positions, box_diag, neighbors=None):
                return sweep_f(params, positions, box_diag)

            energy.rest_energy = rest_energy
            energy.sweep_forces = sweep_forces
            energy.recip_forces = None
            energy.mi_box_full = is_tri
            energy.pme_setup = (pme if method in (self.Ewald, self.PME)
                                else None)
        elif strategy == "cellpair":
            # dense cell-pair block sweep (forces/cellpair.py): spatially
            # sorted atoms, fused block math, analytic in-block forces
            from . import cellpair as cp
            nb_kwargs = nb_kwargs or {}
            impl = None
            box0 = (box0_full if is_tri else np.diagonal(
                np.array(system.getDefaultPeriodicBoxVectors(),
                         np.float64)))
            # flattened replica ensembles (parallel/flatrep.py): R identical
            # replicas embedded in ONE extended cell grid so small replicas
            # fill the sweep's 128-lane tiles; the system is the replicated
            # (replica-major) ext system, the box is the per-replica box
            ens = nb_kwargs.get("ensemble")
            if ens and is_tri:
                raise ValueError("flattened replica ensembles require an "
                                 "orthorhombic replica box")
            if ens:
                ens_r, ens_rx, ens_rz = (int(v) for v in ens)
                if n % ens_r:
                    raise ValueError("ensemble atom count not divisible by "
                                     "the replica count")
                n0_e = n // ens_r
                cp_cfg = cp.make_ensemble_config(
                    cutoff, box0, n0_e, ens_r, exc_i, exc_j,
                    rx=ens_rx, rz=ens_rz,
                    allow_half=nb_kwargs.get("allow_half", True),
                    **{k: v for k, v in nb_kwargs.items()
                       if k in ("skin", "rebuild_interval",
                                "cells_per_cutoff", "capacity",
                                "density_margin")})
                if disp is not None:
                    # _dispersion_coefficient on the ext arrays counts
                    # R^2 n0^2 pairs; replicas don't interact -> R n0^2,
                    # divided by the PER-REPLICA volume downstream
                    disp = disp / ens_r
                if method in (self.Ewald, self.PME):
                    # same cell-aligned grid plan as a single-replica
                    # pencil context (setup_pme rounds K up to cell-grid
                    # multiples), so a flattened ensemble reproduces R
                    # independent Contexts; the reciprocal sum runs as the
                    # replica-batched per-(x, y, z-band) pencil spread
                    # (pme.recip_ens_packed) when the plan is viable,
                    # falling back to the vmapped generic spread otherwise
                    from . import pme as pme_mod
                    alpha0, gx0, _, _ = self._pme_params
                    pme = pme_mod.setup_pme(
                        cutoff=cutoff, tol=self._ewald_tol, box_diag=box0,
                        alpha=alpha0 or None,
                        grid=pme.grid if gx0 > 0 else None,
                        cell_grid=cp_cfg.phys_grid)
                    if pme.cell_grid is not None:
                        # locality gate (measured on v5e, 64 x 4k): at
                        # small per-replica grids the pencil windows stop
                        # being local — lwx*lwy = 225 of K1*K2 = 625
                        # (36%) made the batched pencil FORCE pass 27.0
                        # ms vs the vmapped generic autodiff's 15.4 ms
                        # (three (NP, lw^2, Cp) one-hot tensors dominate
                        # HBM).  Engage the pencil path only when the
                        # windows cover <= 25% of the (x, y) grid plane;
                        # otherwise keep cell_grid=None (generic spread,
                        # now gradient-correct at knots via the B-spline
                        # custom JVP).
                        plan = pme_mod._pencil_plan(pme.grid,
                                                    pme.cell_grid)
                        (_, lwx_p, _), (_, lwy_p, _) = plan
                        if (lwx_p * lwy_p) * 4 <= (pme.grid[0]
                                                   * pme.grid[1]):
                            n_pen0 = (cp_cfg.phys_grid[0]
                                      * cp_cfg.phys_grid[1])
                            cp_need = int(np.ceil(1.35 * n0_e / n_pen0)) + 8
                            cp_cfg = dataclasses.replace(
                                cp_cfg, pen_capacity=max(
                                    -(-cp_need // 128) * 128, 128))
                        else:
                            pme = dataclasses.replace(pme, cell_grid=None)
            else:
                ens_r = 1
                cp_cfg = cp.make_config(
                    cutoff, box0, n, exc_i, exc_j,
                    allow_half=nb_kwargs.get("allow_half", True),
                    **{k: v for k, v in nb_kwargs.items()
                       if k in ("skin", "rebuild_interval",
                                "cells_per_cutoff", "capacity",
                                "density_margin", "grid_x_multiple")})
            if method in (self.Ewald, self.PME) and not ens and not is_tri:
                # re-plan the reciprocal grid as a multiple of the cell
                # grid: the pencil spread (pme.spread_pencils) reuses the
                # sweep's cell-sorted slots for local-window spreading.
                # (Triclinic keeps the generic fractional-coordinate
                # spread planned above — the pencil tables assume
                # axis-aligned cells.)
                from . import pme as pme_mod
                alpha0, gx0, _, _ = self._pme_params
                pme = pme_mod.setup_pme(
                    cutoff=cutoff, tol=self._ewald_tol, box_diag=box0,
                    alpha=alpha0 or None,
                    grid=pme.grid if gx0 > 0 else None,
                    cell_grid=cp_cfg.grid)
                if pme.cell_grid is not None:
                    # compact (x, y)-pencil packing for the PME spread
                    # (pme.spread_pencils_packed): ~1.35x the mean pencil
                    # population, rounded to a 128-lane multiple
                    n_pen = cp_cfg.grid[0] * cp_cfg.grid[1]
                    cp_need = int(np.ceil(1.35 * n / n_pen)) + 8
                    cp_cfg = dataclasses.replace(
                        cp_cfg, pen_capacity=max(
                            -(-cp_need // 128) * 128, 128))
            params["excl_words"] = jnp.asarray(cp.build_exclusion_words(
                n, exc_i, exc_j, cp_cfg.excl_window, cp_cfg.excl_words))
            if method in (self.Ewald, self.PME):
                # the reciprocal exclusion correction runs as an
                # O(n_exclusions) pair-list term (below), not in the sweep
                pair_eg = cp.make_pair_eg("ewald", cutoff, alpha=pme.alpha,
                                          use_switch=use_switch,
                                          r_switch=r_switch,
                                          excl_in_sweep=False)
            elif method in (self.CutoffPeriodic, self.CutoffNonPeriodic):
                pair_eg = cp.make_pair_eg("rf", cutoff, krf=krf, crf=crf,
                                          use_switch=use_switch,
                                          r_switch=r_switch)
            else:
                raise ValueError("cellpair strategy requires a cutoff method")
            pair_term = cp.make_custom_energy(cp_cfg, pair_eg, ONE_4PI_EPS0,
                                              impl=impl)

            def extras_energy(params, positions, box, rep_scale=None):
                """Everything but the sweep and the PME reciprocal sum:
                explicit exceptions, reciprocal exclusion corrections,
                Ewald self term, dispersion tail.  Exposed separately so
                the work-sharded engine (parallel/sharded.py) can replicate
                the cheap bits while sharding the sweep and the
                spreading."""
                box_diag = jnp.diagonal(box)
                bmi = mi_box(box, is_tri)
                e = jnp.zeros((), positions.dtype)
                if exc_term is not None:
                    e = e + exc_term(positions, bmi)
                if corr_term is not None:
                    e = e + corr_term(positions, bmi)
                for t in override_terms:
                    e = e + t(positions, bmi)
                if method in (self.Ewald, self.PME):
                    e = e + params["pme_self"]
                if disp is not None:
                    vol = box_diag[0] * box_diag[1] * box_diag[2]
                    if rep_scale is None:
                        e = e + disp / vol
                    else:
                        # per-replica volumes V0 * s_r^3 (flat NPT);
                        # disp here is R x the per-replica coefficient
                        s3 = rep_scale.astype(positions.dtype) ** 3
                        e = e + (disp / ens_r) * jnp.sum(1.0 / s3) / vol
                return e

            def _stored(positions, rep_scale):
                """Flat-ensemble NPT stored coordinates p_phys / s_r (the
                shared template grid bins and sweeps in this frame)."""
                if rep_scale is None:
                    return positions
                return (positions.reshape(ens_r, n0_e, 3)
                        / rep_scale[:, None, None].astype(positions.dtype)
                        ).reshape(-1, 3)

            recip_energy = None
            recip_energies_rep = None
            if method in (self.Ewald, self.PME):
                if ens_r > 1:
                    # replicas overlap in physical coordinates (each lives
                    # in the per-replica box frame): one shared grid would
                    # interfere their charges.  Per-(x, y, z-band) pencil
                    # packing gives each replica its own pencil set, so
                    # ONE batched spread serves all R grids
                    # (pme.recip_ens_packed); the vmapped generic spread
                    # remains the fallback when the pencil plan is not
                    # viable or the cellsort lacks pencil tables.
                    use_pen = (pme.cell_grid is not None
                               and cp_cfg.pen_capacity > 0)

                    def recip_energies_rep(params, positions, box_diag,
                                           nbl=None, rep_scale=None):
                        if (use_pen and nbl is not None
                                and getattr(nbl, "pen_atom", None)
                                is not None):
                            e, _ = pme.recip_ens(
                                ens_r, params["charge"],
                                _stored(positions, rep_scale), box_diag,
                                nbl, rep_scale=rep_scale)
                            return e
                        q = params["charge"].reshape(ens_r, n0_e)
                        p = positions.reshape(ens_r, n0_e, 3)
                        if rep_scale is None:
                            return jax.vmap(
                                lambda qq, pp: pme.reciprocal_energy(
                                    qq, pp, box_diag))(q, p)
                        boxes = (box_diag[None, :]
                                 * rep_scale[:, None].astype(box_diag.dtype))
                        return jax.vmap(
                            lambda qq, pp, bd: pme.reciprocal_energy(
                                qq, pp, bd))(q, p, boxes)

                    def recip_energy(params, positions, box_diag, nbl,
                                     rep_scale=None):
                        return jnp.sum(recip_energies_rep(
                            params, positions, box_diag, nbl, rep_scale))
                elif pme.cell_grid is not None:
                    def recip_energy(params, positions, box_diag, nbl,
                                     rep_scale=None):
                        return pme.reciprocal_energy_sorted(
                            params["charge"], positions, box_diag,
                            nbl, cp_cfg.capacity)
                else:
                    def recip_energy(params, positions, box_diag, nbl,
                                     rep_scale=None):
                        return pme.reciprocal_energy(
                            params["charge"], positions, box_diag)

            def energy(params, positions, box, neighbors, rep_scale=None):
                # triclinic: the sweep and the generic PME both take the
                # full reduced matrix; orthorhombic stays on the diagonal
                sw_box = mi_box(box, is_tri)
                e = pair_term(params, _stored(positions, rep_scale),
                              sw_box, neighbors, rep_scale)
                e = e + extras_energy(params, positions, box,
                                      rep_scale=rep_scale)
                if recip_energy is not None:
                    e = e + recip_energy(params, positions, sw_box,
                                         neighbors, rep_scale)
                return e

            def rest_energy(params, positions, box, neighbors,
                            rep_scale=None):
                """Everything except the direct-space sweep (extras + PME
                reciprocal): the force-only step evaluates the sweep's
                analytic forces separately and autodiffs only this part."""
                sw_box = mi_box(box, is_tri)
                e = extras_energy(params, positions, box,
                                  rep_scale=rep_scale)
                if recip_energy is not None:
                    e = e + recip_energy(params, positions, sw_box,
                                         neighbors, rep_scale)
                return e

            mc_energies = None
            if ens_r > 1:
                # NBFIX overrides change under per-replica volume moves
                # (intermolecular): per-replica sums by reshape over the
                # replica-major concatenated pair list.  Template-box
                # minimum imaging at physical positions is exact here —
                # the correction is cutoff-masked, so any pair whose image
                # assignment could differ between box0 and box0*s sits at
                # ~half-box distance, far beyond the cutoff.
                ov_energies_rep = None
                if ov_cat is not None:
                    from . import pairterms
                    cat_pi = np.concatenate(ov_cat["pi"])
                    cat_pj = np.concatenate(ov_cat["pj"])
                    P_ov = len(cat_pi)
                    rep_of = cat_pi // n0_e
                    uniform = (P_ov % ens_r == 0 and np.array_equal(
                        rep_of, np.arange(P_ov) // (P_ov // ens_r))
                        and np.array_equal(rep_of, cat_pj // n0_e))
                    if not uniform:
                        raise ValueError(
                            "flat-ensemble NPT needs replica-uniform NBFIX "
                            "override pair lists (every replica the same "
                            "overrides, replica-major)")
                    ov_energies_rep = pairterms.make_pair_list_energies_rep(
                        ens_r, cat_pi, cat_pj, pairterms.lj_override_eg(
                            jnp.asarray(np.concatenate(ov_cat["sig_new"]),
                                        dtype),
                            jnp.asarray(np.concatenate(ov_cat["eps_new"]),
                                        dtype),
                            jnp.asarray(np.concatenate(ov_cat["sig_old"]),
                                        dtype),
                            jnp.asarray(np.concatenate(ov_cat["eps_old"]),
                                        dtype),
                            cutoff if use_cutoff else np.inf,
                            use_switch, r_switch),
                        periodic=periodic)

                def mc_energies(params, positions, box, neighbors,
                                rep_scale):
                    """(R,) per-replica energies of every term whose value
                    CHANGES under a per-replica molecule-COM volume move:
                    the direct-space sweep, the PME reciprocal sum, the
                    dispersion tail, and NBFIX override corrections
                    (NBTHOLE rides the DrudeForce's own mc_energies hook).
                    Intramolecular terms (bonded, Drude springs, screened
                    pairs, exceptions, reciprocal exclusion corrections,
                    the Ewald self term) are invariant under COM scaling
                    and cancel exactly in the Metropolis delta."""
                    box_diag = jnp.diagonal(box)
                    e, _ = cp.pair_energy_forces(
                        params, _stored(positions, rep_scale), box_diag,
                        neighbors, cp_cfg, pair_eg, ONE_4PI_EPS0,
                        with_energy=True, rep_scale=rep_scale,
                        energy_per_replica=True)
                    if recip_energies_rep is not None:
                        e = e + recip_energies_rep(params, positions,
                                                   box_diag, neighbors,
                                                   rep_scale)
                    if ov_energies_rep is not None:
                        e = e + ov_energies_rep(positions, box_diag)
                    if disp is not None:
                        vol = box_diag[0] * box_diag[1] * box_diag[2]
                        s3 = (jnp.ones((ens_r,), positions.dtype)
                              if rep_scale is None
                              else rep_scale.astype(positions.dtype) ** 3)
                        e = e + (disp / ens_r) / (vol * s3)
                    return e

            recip_forces = None
            if (method in (self.Ewald, self.PME) and pme.cell_grid is not None
                    and cp_cfg.pen_capacity):
                if ens_r > 1:
                    def recip_forces(params, positions, box_diag, neighbors,
                                     rep_scale=None):
                        """Analytic replica-batched reciprocal forces
                        (pme.recip_ens_packed); the force-only step then
                        autodiffs only extras_energy."""
                        _, f = pme.recip_ens(
                            ens_r, params["charge"],
                            _stored(positions, rep_scale), box_diag,
                            neighbors, rep_scale=rep_scale,
                            with_forces=True)
                        return f
                else:
                    def recip_forces(params, positions, box_diag, neighbors,
                                     rep_scale=None):
                        """Analytic reciprocal forces (pme.recip_forces);
                        the force-only step then autodiffs only
                        extras_energy."""
                        _, f = pme.recip_forces(params["charge"], positions,
                                                box_diag, neighbors)
                        return f

            # the half-stencil force-only Pallas kernel (ops/pallas_sweep)
            # is the default in-step sweep on TPU: 1.5x the XLA sweep at
            # 100k atoms, verified against CPU-f64 ground truth on chip
            # (scripts/check_pallas_tpu.py: both paths sit at the common
            # f32 noise floor, rms 3.4e-6 relative).  Opt out with
            # nb_kwargs {"use_pallas": 0}
            default_pallas = 2 if jax.default_backend() == "tpu" else 0
            up = nb_kwargs.get("use_pallas", default_pallas)
            use_pallas_sweep = up in (2, 3)
            if cp_cfg.triclinic and use_pallas_sweep and up != 3 \
                    and not nb_kwargs.get("pallas_triclinic", True):
                # escape hatch: nb_options {"pallas_triclinic": 0} falls
                # triclinic boxes back to the XLA sweep
                use_pallas_sweep = False
            pallas_chunk = None
            if use_pallas_sweep:
                from ..ops import pallas_sweep
                if up == 3:
                    # force the y-chunked kernel (parity tests)
                    pallas_chunk = nb_kwargs.get(
                        "pallas_chunk",
                        pallas_sweep.choose_chunk(cp_cfg, dtype, force=True))
                    use_pallas_sweep = pallas_chunk is not None
                elif not pallas_sweep.supports(cp_cfg, dtype):
                    # full-layer kernel disengaged (large (y, z) planes
                    # blow its VMEM gate) — fall back to the y-chunked
                    # program grid before giving up on Pallas entirely
                    pallas_chunk = pallas_sweep.choose_chunk(cp_cfg, dtype)
                    use_pallas_sweep = pallas_chunk is not None

            pallas_excl_skip = False
            if use_pallas_sweep:
                from ..ops import pallas_sweep
                ps_method = ("ewald" if method in (self.Ewald, self.PME)
                             else "rf")
                # skip the exclusion bitmask test at stencil offsets with
                # any |o| >= 2 (cells there are >= one whole cell apart —
                # no intramolecular pair reaches); soundness is latched per
                # rebuild via CellSort.excl_span_exceeded (the Context
                # passes the exclusion pairs to build_cellsort whenever
                # this attribute is True)
                pallas_excl_skip = bool(
                    nb_kwargs.get("pallas_excl_skip", True))

                if pallas_chunk is not None:
                    def _sweep_pallas(params, positions, box_diag,
                                      neighbors):
                        return pallas_sweep.pair_forces_pallas_chunked(
                            params, positions, box_diag, neighbors, cp_cfg,
                            ps_method, pallas_chunk,
                            alpha=pme.alpha if ps_method == "ewald" else 0.0,
                            krf=krf, crf=crf, coulomb_scale=ONE_4PI_EPS0,
                            excl_skip=pallas_excl_skip)
                else:
                    def _sweep_pallas(params, positions, box_diag,
                                      neighbors):
                        return pallas_sweep.pair_forces_pallas(
                            params, positions, box_diag, neighbors, cp_cfg,
                            ps_method,
                            alpha=pme.alpha if ps_method == "ewald" else 0.0,
                            krf=krf, crf=crf, coulomb_scale=ONE_4PI_EPS0,
                            excl_skip=pallas_excl_skip)

                def sweep_forces(params, positions, box_diag, neighbors,
                                 rep_scale=None):
                    if rep_scale is not None:
                        # flat-ensemble NPT runs the XLA sweep (the Pallas
                        # kernels assume one uniform cell size)
                        _, f = cp.pair_energy_forces(
                            params, _stored(positions, rep_scale),
                            box_diag, neighbors, cp_cfg, pair_eg,
                            ONE_4PI_EPS0, with_energy=False,
                            rep_scale=rep_scale)
                        return f
                    return _sweep_pallas(params, positions, box_diag,
                                         neighbors)
            else:
                def sweep_forces(params, positions, box_diag, neighbors,
                                 rep_scale=None):
                    _, f = cp.pair_energy_forces(
                        params, _stored(positions, rep_scale), box_diag,
                        neighbors, cp_cfg, pair_eg, ONE_4PI_EPS0,
                        with_energy=False, rep_scale=rep_scale)
                    return f

            energy.needs_neighbors = True
            energy.cellpair_cfg = cp_cfg
            energy.mi_box_full = is_tri
            energy.uses_pallas = bool(use_pallas_sweep)
            energy.pallas_chunk = pallas_chunk
            energy.pallas_excl_skip = pallas_excl_skip
            energy.nbl_cutoff = cutoff
            energy.nbl_exclusions = (exc_i, exc_j)
            # active (non-excluded) exception pairs, exposed for the
            # state-resident engine's per-molecule templates
            energy.exc_active = ((exc_i[act], exc_j[act], exc_qq[act],
                                  exc_sigma[act], exc_eps[act])
                                 if n_active_exc else None)
            energy.disp_const = disp        # dispersion tail numerator
            energy.pme_self_const = (float(params["pme_self"])
                                     if method in (self.Ewald, self.PME)
                                     else 0.0)
            # hooks for the sharded engine and the force-only step
            energy.pair_eg = pair_eg
            energy.coulomb_scale = ONE_4PI_EPS0
            energy.pme_setup = pme if method in (self.Ewald, self.PME) else None
            energy.extras_energy = extras_energy
            energy.rest_energy = rest_energy
            # flat-ensemble NPT hooks (parallel/flatrep.py)
            energy.wants_rep_scale = True
            energy.mc_energies = mc_energies
            energy.recip_forces = recip_forces
            energy.sweep_forces = sweep_forces
        else:
            # neighbor lists arrive pre-filtered for exclusions
            # (forces/neighborlist.py), padded with index N; a sentinel row
            # keeps padded gathers in-range and contributes nothing.
            def energy(params, positions, box, neighbors):
                box_diag = jnp.diagonal(box)
                idx = neighbors.idx  # (N, K)
                valid = idx < positions.shape[0]
                safe_idx = jnp.where(valid, idx, 0)

                # per-component distances: keep every big intermediate 2D
                # (N, K) — a trailing xyz axis would be lane-padded 3 -> 128
                def dist2_comp(c):
                    p = positions[:, c]
                    d = p[:, None] - p[safe_idx]
                    if periodic:
                        b = box_diag[c]
                        d = d - b * jnp.round(d / b)
                    return d * d
                r2 = dist2_comp(0) + dist2_comp(1) + dist2_comp(2)
                qq = (ONE_4PI_EPS0 * params["charge"][:, None]
                      * params["charge"][safe_idx])
                sig = 0.5 * (params["sigma"][:, None] + params["sigma"][safe_idx])
                ep = jnp.sqrt(params["eps"][:, None] * params["eps"][safe_idx])
                e = 0.5 * jnp.sum(pair_energy(qq, sig, ep, r2, valid))
                for t in override_terms:
                    e = e + t(positions, box_diag)
                if has_exceptions:
                    e = e + exceptions_energy(params, positions, box_diag)
                if method in (self.Ewald, self.PME):
                    e = e + params["pme_self"]
                    e = e + pme.reciprocal_energy(params["charge"], positions,
                                                  box_diag)
                if disp is not None:
                    vol = box_diag[0] * box_diag[1] * box_diag[2]
                    e = e + disp / vol
                return e
            energy.needs_neighbors = True
            energy.nbl_cutoff = cutoff
            energy.nbl_exclusions = (exc_i, exc_j)

        return energy, params


def _dispersion_coefficient(sigma, eps, cutoff, use_switch, r_switch):
    """Long-range LJ dispersion correction coefficient C such that
    E_corr = C / V.  Computed by numerically integrating the mean pair
    interaction beyond the cutoff (OpenMM's approach, averaged over all
    particle-type pairs)."""
    n = len(sigma)

    # mean over all pairs of eps_ij sig_ij^p with Lorentz-Berthelot mixing,
    # computed in O(N) via the binomial expansion of ((si+sj)/2)^p:
    #   mean_ij sqrt(ei ej) ((si+sj)/2)^p
    #     = 2^-p sum_k C(p,k) mean_i(sqrt(ei) si^k) mean_j(sqrt(ej) sj^(p-k))
    from math import comb
    sqrt_eps = np.sqrt(eps)

    def pair_mean(p):
        moments = [np.mean(sqrt_eps * sigma**k) for k in range(p + 1)]
        return sum(comb(p, k) * moments[k] * moments[p - k]
                   for k in range(p + 1)) / 2.0**p

    sig6 = pair_mean(6)
    sig12 = pair_mean(12)
    # integral of 4(sig12/r^12 - sig6/r^6) * 4 pi r^2 dr from rc to inf
    integral = 16.0 * np.pi * (sig12 / (9.0 * cutoff**9) - sig6 / (3.0 * cutoff**3))
    if use_switch and r_switch < cutoff:
        # add back the part lost to the switching window [r_switch, cutoff]
        r = np.linspace(r_switch, cutoff, 256)
        t = (r - r_switch) / (cutoff - r_switch)
        s = 1.0 + t**3 * (-10.0 + t * (15.0 - 6.0 * t))
        u = 4.0 * (sig12 / r**12 - sig6 / r**6)
        integral += 4.0 * np.pi * np.trapezoid((1.0 - s) * u * r**2, r)
    return 0.5 * n * n * integral
