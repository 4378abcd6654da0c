"""Bonded force terms: harmonic bonds, harmonic angles, periodic torsions.

Needed for general Drude force fields (CHARMM Drude-2013 systems built by
io/charmm or user scripts, cf. reference example/nacl_tg.py:42 which relies
on OpenMM's bonded forces for the solute).
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp
import numpy as np


class HarmonicBondForce:
    def __init__(self):
        self._bonds: List[Tuple[int, int, float, float]] = []

    def addBond(self, particle1: int, particle2: int, length: float, k: float) -> int:
        self._bonds.append((int(particle1), int(particle2), float(length), float(k)))
        return len(self._bonds) - 1

    def getNumBonds(self) -> int:
        return len(self._bonds)

    def getBondParameters(self, index: int):
        return self._bonds[index]

    def setBondParameters(self, index, particle1, particle2, length, k):
        self._bonds[index] = (int(particle1), int(particle2), float(length), float(k))

    def usesPeriodicBoundaryConditions(self) -> bool:
        return False

    def bonded_pairs(self):
        return [(b[0], b[1]) for b in self._bonds]

    def compile(self, system, dtype):
        if not self._bonds:
            return None, None
        params = {
            "i": jnp.asarray(np.array([b[0] for b in self._bonds], np.int32)),
            "j": jnp.asarray(np.array([b[1] for b in self._bonds], np.int32)),
            "r0": jnp.asarray(np.array([b[2] for b in self._bonds]), dtype),
            "k": jnp.asarray(np.array([b[3] for b in self._bonds]), dtype),
        }

        def energy(params, positions, box):
            delta = positions[params["i"]] - positions[params["j"]]
            r = jnp.sqrt(jnp.sum(delta * delta, axis=-1))
            dr = r - params["r0"]
            return 0.5 * jnp.sum(params["k"] * dr * dr)

        return energy, params


class HarmonicAngleForce:
    def __init__(self):
        self._angles: List[Tuple[int, int, int, float, float]] = []

    def addAngle(self, p1: int, p2: int, p3: int, angle: float, k: float) -> int:
        self._angles.append((int(p1), int(p2), int(p3), float(angle), float(k)))
        return len(self._angles) - 1

    def getNumAngles(self) -> int:
        return len(self._angles)

    def getAngleParameters(self, index: int):
        return self._angles[index]

    def usesPeriodicBoundaryConditions(self) -> bool:
        return False

    def bonded_pairs(self):
        out = []
        for a in self._angles:
            out.append((a[0], a[1]))
            out.append((a[1], a[2]))
        return out

    def compile(self, system, dtype):
        if not self._angles:
            return None, None
        params = {
            "i": jnp.asarray(np.array([a[0] for a in self._angles], np.int32)),
            "j": jnp.asarray(np.array([a[1] for a in self._angles], np.int32)),
            "k_": jnp.asarray(np.array([a[2] for a in self._angles], np.int32)),
            "theta0": jnp.asarray(np.array([a[3] for a in self._angles]), dtype),
            "k": jnp.asarray(np.array([a[4] for a in self._angles]), dtype),
        }

        def energy(params, positions, box):
            v1 = positions[params["i"]] - positions[params["j"]]
            v2 = positions[params["k_"]] - positions[params["j"]]
            dot = jnp.sum(v1 * v2, axis=-1)
            n1 = jnp.linalg.norm(v1, axis=-1)
            n2 = jnp.linalg.norm(v2, axis=-1)
            cos_t = jnp.clip(dot / (n1 * n2), -1.0, 1.0)
            dtheta = jnp.arccos(cos_t) - params["theta0"]
            return 0.5 * jnp.sum(params["k"] * dtheta * dtheta)

        return energy, params


class PeriodicTorsionForce:
    def __init__(self):
        self._torsions: List[Tuple[int, int, int, int, int, float, float]] = []

    def addTorsion(self, p1, p2, p3, p4, periodicity, phase, k) -> int:
        self._torsions.append((int(p1), int(p2), int(p3), int(p4),
                               int(periodicity), float(phase), float(k)))
        return len(self._torsions) - 1

    def getNumTorsions(self) -> int:
        return len(self._torsions)

    def getTorsionParameters(self, index: int):
        return self._torsions[index]

    def usesPeriodicBoundaryConditions(self) -> bool:
        return False

    def bonded_pairs(self):
        out = []
        for t in self._torsions:
            out.append((t[0], t[1]))
            out.append((t[1], t[2]))
            out.append((t[2], t[3]))
        return out

    def compile(self, system, dtype):
        if not self._torsions:
            return None, None
        arr = np.array(self._torsions, np.float64)
        params = {
            "i": jnp.asarray(arr[:, 0].astype(np.int32)),
            "j": jnp.asarray(arr[:, 1].astype(np.int32)),
            "k_": jnp.asarray(arr[:, 2].astype(np.int32)),
            "l": jnp.asarray(arr[:, 3].astype(np.int32)),
            "n": jnp.asarray(arr[:, 4], dtype),
            "phase": jnp.asarray(arr[:, 5], dtype),
            "k": jnp.asarray(arr[:, 6], dtype),
        }

        def energy(params, positions, box):
            b1 = positions[params["j"]] - positions[params["i"]]
            b2 = positions[params["k_"]] - positions[params["j"]]
            b3 = positions[params["l"]] - positions[params["k_"]]
            c1 = jnp.cross(b1, b2)
            c2 = jnp.cross(b2, b3)
            p1 = jnp.sum(c1 * c2, axis=-1)
            p2 = jnp.sum(jnp.cross(c1, b2 / jnp.linalg.norm(b2, axis=-1, keepdims=True))
                         * c2, axis=-1)
            phi = jnp.arctan2(p2, p1)
            return jnp.sum(params["k"] * (1.0 + jnp.cos(params["n"] * phi
                                                        - params["phase"])))

        return energy, params


class HarmonicTorsionForce:
    """Harmonic (CHARMM-improper-style) torsion: E = k * wrap(theta -
    theta0)^2 with wrap into (-pi, pi] — the energy OpenMM's CHARMM ports
    express through a CustomTorsionForce (app/forcefield.py ingests that
    known shape onto this force).  k follows the CHARMM convention (no
    1/2 factor).  The wrap's kink sits at |dtheta| = pi, half a turn from
    the minimum — dynamically unreachable for a bound improper; gradients
    there take the right-hand branch."""

    def __init__(self):
        self._torsions: List[Tuple[int, int, int, int, float, float]] = []

    def addTorsion(self, p1, p2, p3, p4, theta0, k) -> int:
        self._torsions.append((int(p1), int(p2), int(p3), int(p4),
                               float(theta0), float(k)))
        return len(self._torsions) - 1

    def getNumTorsions(self) -> int:
        return len(self._torsions)

    def getTorsionParameters(self, index: int):
        return self._torsions[index]

    def setTorsionParameters(self, index, p1, p2, p3, p4, theta0, k):
        self._torsions[index] = (int(p1), int(p2), int(p3), int(p4),
                                 float(theta0), float(k))

    def usesPeriodicBoundaryConditions(self) -> bool:
        return False

    def bonded_pairs(self):
        out = []
        for t in self._torsions:
            out.append((t[0], t[1]))
            out.append((t[1], t[2]))
            out.append((t[2], t[3]))
        return out

    def compile(self, system, dtype):
        if not self._torsions:
            return None, None
        arr = np.array(self._torsions, np.float64)
        params = {
            "i": jnp.asarray(arr[:, 0].astype(np.int32)),
            "j": jnp.asarray(arr[:, 1].astype(np.int32)),
            "k_": jnp.asarray(arr[:, 2].astype(np.int32)),
            "l": jnp.asarray(arr[:, 3].astype(np.int32)),
            "theta0": jnp.asarray(arr[:, 4], dtype),
            "k": jnp.asarray(arr[:, 5], dtype),
        }

        def energy(params, positions, box):
            b1 = positions[params["j"]] - positions[params["i"]]
            b2 = positions[params["k_"]] - positions[params["j"]]
            b3 = positions[params["l"]] - positions[params["k_"]]
            c1 = jnp.cross(b1, b2)
            c2 = jnp.cross(b2, b3)
            p1 = jnp.sum(c1 * c2, axis=-1)
            p2 = jnp.sum(jnp.cross(c1, b2 / jnp.linalg.norm(b2, axis=-1, keepdims=True))
                         * c2, axis=-1)
            phi = jnp.arctan2(p2, p1)
            d = phi - params["theta0"]
            two_pi = 2.0 * jnp.pi
            d = d - two_pi * jnp.round(d / two_pi)
            return jnp.sum(params["k"] * d * d)

        return energy, params
