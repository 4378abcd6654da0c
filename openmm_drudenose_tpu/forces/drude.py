"""DrudeForce: core-shell harmonic springs (optionally anisotropic) and
Thole-screened intra-molecular dipole-dipole interactions.

Physics matches the reference's documentation kernels (which it ships but
never compiles — platforms/cuda/src/kernels/drudeParticleForce.cu:1-46 and
drudePairForce.cu:1-57):

  spring:   E = 1/2 k3 r^2 + 1/2 k1 r1'^2 + 1/2 k2 r2'^2
            with k derived from charge/polarizability (OpenMM convention):
              a1 = aniso12 (or 1), a2 = aniso34 (or 1), a3 = 3-a1-a2
              k3 = ONE_4PI_EPS0 q^2 / (alpha a3)
              k1 = ONE_4PI_EPS0 q^2 / (alpha a1) - k3
              k2 = ONE_4PI_EPS0 q^2 / (alpha a2) - k3
  screened: E = sum over 4 core/shell cross pairs of s * qq * S(u) / r,
            S(u) = 1 - (1 + u/2) exp(-u),  u = thole * r / (a1 a2)^(1/6),
            signs (+,-,-,+) for (d1,d2),(d1,c2),(c1,d2),(c1,c2).

The energy function is pure jnp; forces come from autodiff of the total
energy (so there is no hand-written force kernel to keep in sync).
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from ..units import ONE_4PI_EPS0


class DrudeForce:
    """Container matching OpenMM's DrudeForce API.

    addParticle(particle, particle1, particle2, particle3, particle4,
                charge, polarizability, aniso12, aniso34)
      particle  : the Drude (shell) particle index
      particle1 : the parent (core) particle index
      particle2..4 : anisotropy axis particles (-1 if unused)
    """

    def __init__(self):
        self._particles: List[Tuple] = []
        self._screened_pairs: List[Tuple[int, int, float]] = []
        self._nbthole: List[Tuple[int, int, float]] = []

    def addParticle(self, particle, particle1, particle2, particle3, particle4,
                    charge, polarizability, aniso12, aniso34) -> int:
        self._particles.append((int(particle), int(particle1), int(particle2),
                                int(particle3), int(particle4), float(charge),
                                float(polarizability), float(aniso12), float(aniso34)))
        return len(self._particles) - 1

    def getNumParticles(self) -> int:
        return len(self._particles)

    def getParticleParameters(self, index: int):
        return self._particles[index]

    def setParticleParameters(self, index, particle, particle1, particle2, particle3,
                              particle4, charge, polarizability, aniso12, aniso34):
        self._particles[index] = (int(particle), int(particle1), int(particle2),
                                  int(particle3), int(particle4), float(charge),
                                  float(polarizability), float(aniso12), float(aniso34))

    def addNBTholePair(self, particle1: int, particle2: int,
                       thole: float) -> int:
        """CHARMM NBTHOLE: Thole screening between NON-bonded core-shell
        pairs (ion pairs in charmm_polar_2013).  particle1/particle2 index
        the DrudeForce particle list (like addScreenedPair).  Only the
        screening deficit qq (S(u) - 1)/r is added (the plain Coulomb is
        already in the NonbondedForce sum); minimum-imaged."""
        self._nbthole.append((int(particle1), int(particle2), float(thole)))
        return len(self._nbthole) - 1

    def addScreenedPair(self, particle1: int, particle2: int, thole: float) -> int:
        """particle1/particle2 are indices into this force's Drude pair list."""
        self._screened_pairs.append((int(particle1), int(particle2), float(thole)))
        return len(self._screened_pairs) - 1

    def getNumScreenedPairs(self) -> int:
        return len(self._screened_pairs)

    def getScreenedPairParameters(self, index: int):
        return self._screened_pairs[index]

    def usesPeriodicBoundaryConditions(self) -> bool:
        return False

    def bonded_pairs(self) -> List[Tuple[int, int]]:
        """Drude-parent links, used for molecule detection (the reference builds
        residues from contextRef.getMolecules(), DrudeTGNHIntegrator.cpp:136-143)."""
        return [(p[0], p[1]) for p in self._particles]

    # -- compilation -------------------------------------------------------
    def compile(self, system, dtype):
        n = len(self._particles)
        if n == 0:
            return None, None
        from .boxutils import is_triclinic
        is_tri = is_triclinic(np.array(
            system.getDefaultPeriodicBoxVectors(), np.float64))

        drude = np.array([p[0] for p in self._particles], np.int32)
        parent = np.array([p[1] for p in self._particles], np.int32)
        p2 = np.array([p[2] for p in self._particles], np.int32)
        p3 = np.array([p[3] for p in self._particles], np.int32)
        p4 = np.array([p[4] for p in self._particles], np.int32)
        charge = np.array([p[5] for p in self._particles], np.float64)
        alpha = np.array([p[6] for p in self._particles], np.float64)
        aniso12 = np.array([p[7] for p in self._particles], np.float64)
        aniso34 = np.array([p[8] for p in self._particles], np.float64)

        a1 = np.where(p2 >= 0, aniso12, 1.0)
        a2 = np.where(p3 >= 0, aniso34, 1.0)
        a3 = 3.0 - a1 - a2
        ktot = ONE_4PI_EPS0 * charge * charge / alpha
        k3 = ktot / a3
        k1 = np.where(p2 >= 0, ktot / a1 - k3, 0.0)
        k2 = np.where(p3 >= 0, ktot / a2 - k3, 0.0)

        has_aniso1 = bool(np.any(k1 != 0.0))
        has_aniso2 = bool(np.any(k2 != 0.0))

        params = {
            "drude": jnp.asarray(drude),
            "parent": jnp.asarray(parent),
            "k3": jnp.asarray(k3, dtype),
        }
        if has_aniso1:
            params["p2"] = jnp.asarray(np.maximum(p2, 0))
            params["k1"] = jnp.asarray(k1, dtype)
        if has_aniso2:
            params["p3"] = jnp.asarray(np.maximum(p3, 0))
            params["p4"] = jnp.asarray(np.maximum(p4, 0))
            params["k2"] = jnp.asarray(k2, dtype)

        nnt = len(self._nbthole)
        if nnt:
            nt1 = np.array([t[0] for t in self._nbthole], np.int32)
            nt2 = np.array([t[1] for t in self._nbthole], np.int32)
            ntthole = np.array([t[2] for t in self._nbthole], np.float64)
            params["nt_d1"] = jnp.asarray(drude[nt1])
            params["nt_c1"] = jnp.asarray(parent[nt1])
            params["nt_d2"] = jnp.asarray(drude[nt2])
            params["nt_c2"] = jnp.asarray(parent[nt2])
            params["nt_scale"] = jnp.asarray(
                ntthole / (alpha[nt1] * alpha[nt2]) ** (1.0 / 6.0), dtype)
            params["nt_qq"] = jnp.asarray(
                ONE_4PI_EPS0 * charge[nt1] * charge[nt2], dtype)

        nsp = len(self._screened_pairs)
        if nsp:
            sp1 = np.array([s[0] for s in self._screened_pairs], np.int32)
            sp2 = np.array([s[1] for s in self._screened_pairs], np.int32)
            thole = np.array([s[2] for s in self._screened_pairs], np.float64)
            screen_scale = thole / (alpha[sp1] * alpha[sp2]) ** (1.0 / 6.0)
            qq = ONE_4PI_EPS0 * charge[sp1] * charge[sp2]
            params["sp_d1"] = jnp.asarray(drude[sp1])
            params["sp_c1"] = jnp.asarray(parent[sp1])
            params["sp_d2"] = jnp.asarray(drude[sp2])
            params["sp_c2"] = jnp.asarray(parent[sp2])
            params["sp_scale"] = jnp.asarray(screen_scale, dtype)
            params["sp_qq"] = jnp.asarray(qq, dtype)

        def energy(params, positions, box, pos_err=None):
            pos_d = positions[params["drude"]]
            pos_c = positions[params["parent"]]
            delta = pos_d - pos_c
            if pos_err is not None:
                # two-float compensation (core/state.py pos_err): the tiny
                # core-shell displacement loses ~1e-4 relative precision to
                # f32 absolute-coordinate quantization, which noise-heats
                # the stiff spring; the dropped bits live in pos_err
                delta = delta + (pos_err[params["drude"]]
                                 - pos_err[params["parent"]])
            r2 = jnp.sum(delta * delta, axis=-1)
            e = 0.5 * jnp.sum(params["k3"] * r2)
            if has_aniso1:
                axis = positions[params["parent"]] - positions[params["p2"]]
                axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
                rprime = jnp.sum(axis * delta, axis=-1)
                e = e + 0.5 * jnp.sum(params["k1"] * rprime * rprime)
            if has_aniso2:
                axis = positions[params["p3"]] - positions[params["p4"]]
                axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
                rprime = jnp.sum(axis * delta, axis=-1)
                e = e + 0.5 * jnp.sum(params["k2"] * rprime * rprime)
            if nsp:
                e = e + _screened_energy(params, positions)
            # keyed on params (not just nnt): parallel/resident.py reuses
            # this closure on migration-local tables and evaluates NBTHOLE
            # separately as a class-tagged dense block
            if nnt and "nt_d1" in params:
                e = e + _nbthole_energy(
                    params, positions,
                    box if is_tri else jnp.diagonal(box))
            return e

        energy.wants_pos_err = True

        if nnt:
            def mc_energies(params, positions, box, neighbors, rep_scale):
                """(R,) per-replica NBTHOLE sums for the flat-ensemble NPT
                Metropolis delta (intermolecular — changes under volume
                moves).  Replica-major equal pair counts hold by
                replicate_system construction; template-box minimum
                imaging at physical positions is exact because the Thole
                deficit decays as e^{-u} (u ~ 40 r) — any pair whose image
                could differ between box0 and box0*s is at ~half-box
                distance where the deficit is numerically zero."""
                R = rep_scale.shape[0]
                if nnt % R:
                    raise ValueError(
                        "NBTHOLE pair count is not replica-uniform — "
                        "flat-ensemble NPT needs identical replicas")
                e = _nbthole_pair_energies(
                    params, positions, box if is_tri else jnp.diagonal(box))
                return e.reshape(R, nnt // R).sum(axis=1)
            energy.mc_energies = mc_energies
        return energy, params


def _nbthole_pair_energies(params, positions, box_diag):
    """(n_nbthole,) CHARMM NBTHOLE energies between non-bonded core-shell
    pairs: only the screening deficit qq (S(u) - 1)/r
    = -qq (1 + u/2) e^{-u}/r over the 4 cross pairs (the plain Coulomb is
    already in the nonbonded sum), minimum-imaged because the pairs live
    in different molecules."""
    d1 = positions[params["nt_d1"]]
    c1 = positions[params["nt_c1"]]
    d2 = positions[params["nt_d2"]]
    c2 = positions[params["nt_c2"]]
    scale = params["nt_scale"]
    qq = params["nt_qq"]

    def pair_e(pa, pb, sign):
        from .boxutils import min_image
        delta = min_image(pa - pb, box_diag)
        r = jnp.sqrt(jnp.sum(delta * delta, axis=-1))
        u = scale * r
        deficit = -(1.0 + 0.5 * u) * jnp.exp(-u)
        return sign * qq * deficit / r

    return (pair_e(d1, d2, 1.0) + pair_e(d1, c2, -1.0)
            + pair_e(c1, d2, -1.0) + pair_e(c1, c2, 1.0))


def _nbthole_energy(params, positions, box_diag):
    return jnp.sum(_nbthole_pair_energies(params, positions, box_diag))


def _screened_energy(params, positions):
    """Thole-screened charge-charge energy over the 4 core/shell cross pairs
    (math from reference drudePairForce.cu:7-57, rebuilt as vectorized jnp)."""
    d1 = positions[params["sp_d1"]]
    c1 = positions[params["sp_c1"]]
    d2 = positions[params["sp_d2"]]
    c2 = positions[params["sp_c2"]]
    scale = params["sp_scale"]
    qq = params["sp_qq"]

    def pair_e(pa, pb, sign):
        delta = pa - pb
        r = jnp.sqrt(jnp.sum(delta * delta, axis=-1))
        u = scale * r
        screening = 1.0 - (1.0 + 0.5 * u) * jnp.exp(-u)
        return sign * qq * screening / r

    e = (pair_e(d1, d2, 1.0) + pair_e(d1, c2, -1.0)
         + pair_e(c1, d2, -1.0) + pair_e(c1, c2, 1.0))
    return jnp.sum(e)
