"""General Custom*Force classes driven by the energy-expression compiler.

The reference workflow rides OpenMM's Custom*Force machinery (Lepton
expression parsing) for any force-field algebra outside the stock tags —
reference example/nacl_tg.py:37-42 loads XML decks whose CustomTorsionForce
/ CustomNonbondedForce entries carry arbitrary expressions.  This module is
the TPU-native equivalent built on utils/expr.py: expressions compile to
jax-traceable functions, forces come out of autodiff, and each term fuses
into the jitted step like the stock bonded forces (forces/bonded.py).

Conventions match OpenMM:
  * CustomBondForce      — variable `r` (nm), no periodic imaging
  * CustomAngleForce     — variable `theta` in [0, pi]
  * CustomTorsionForce   — variable `theta` in (-pi, pi] (atan2 dihedral,
    same geometry as PeriodicTorsionForce); expressions handle their own
    periodicity
  * CustomNonbondedForce — variable `r` plus per-particle parameters
    suffixed 1/2; exclusions, cutoff methods, and the standard switching
    polynomial S = 1 - 10x^3 + 15x^4 - 6x^5

Global parameters are baked in at compile; call Context.reinitialize()
after changing them (the reference's Context.setParameter round-trips
through the same recompile in our design).

CustomNonbondedForce evaluates the full ordered pair matrix in row blocks
(the forces/dense.py pattern): each unordered pair is computed twice and
the energy halved, which also symmetrizes any 1/2-asymmetric expression.
This is the correct general path, not the production hot path — systems at
cell-list scale should map onto NonbondedForce / LJ tables as
app/forcefield.py does for the stock charmm_polar_2013.xml shapes.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.expr import compile_expression


def _dihedral(positions, i, j, k, l):
    b1 = positions[j] - positions[i]
    b2 = positions[k] - positions[j]
    b3 = positions[l] - positions[k]
    c1 = jnp.cross(b1, b2)
    c2 = jnp.cross(b2, b3)
    p1 = jnp.sum(c1 * c2, axis=-1)
    p2 = jnp.sum(jnp.cross(c1, b2 / jnp.linalg.norm(b2, axis=-1,
                                                    keepdims=True))
                 * c2, axis=-1)
    return jnp.arctan2(p2, p1)


class _CustomBondedBase:
    """Shared per-term/global parameter bookkeeping."""

    _VAR: str = ""
    _N_PARTICLES: int = 0

    def __init__(self, energy: str):
        self._energy_expr = str(energy)
        self._per_names: List[str] = []
        self._globals: List[Tuple[str, float]] = []
        self._terms: List[tuple] = []

    # -- expression ------------------------------------------------------
    def getEnergyFunction(self) -> str:
        return self._energy_expr

    def setEnergyFunction(self, energy: str) -> None:
        self._energy_expr = str(energy)

    # -- parameters ------------------------------------------------------
    def addGlobalParameter(self, name: str, defaultValue: float) -> int:
        self._globals.append((str(name), float(defaultValue)))
        return len(self._globals) - 1

    def getNumGlobalParameters(self) -> int:
        return len(self._globals)

    def getGlobalParameterName(self, index: int) -> str:
        return self._globals[index][0]

    def getGlobalParameterDefaultValue(self, index: int) -> float:
        return self._globals[index][1]

    def setGlobalParameterDefaultValue(self, index: int, value: float):
        name, _ = self._globals[index]
        self._globals[index] = (name, float(value))

    def _add_per(self, name: str) -> int:
        self._per_names.append(str(name))
        return len(self._per_names) - 1

    def usesPeriodicBoundaryConditions(self) -> bool:
        return False

    # -- compile ---------------------------------------------------------
    def _compiled_expr(self):
        names = ([self._VAR] + list(self._per_names)
                 + [g[0] for g in self._globals])
        return compile_expression(self._energy_expr, names)

    def _term_env(self, dtype):
        env = {g[0]: jnp.asarray(g[1], dtype) for g in self._globals}
        per = np.array([t[self._N_PARTICLES] for t in self._terms],
                       np.float64)
        for c, name in enumerate(self._per_names):
            env[name] = jnp.asarray(per[:, c], dtype)
        return env

    def _check_term_params(self, params: Sequence[float]):
        if len(params) != len(self._per_names):
            raise ValueError(
                f"expected {len(self._per_names)} per-term parameter(s) "
                f"({self._per_names}), got {len(params)}")
        return tuple(float(p) for p in params)


class CustomBondForce(_CustomBondedBase):
    """OpenMM-compatible CustomBondForce: E = f(r) per bond."""

    _VAR = "r"
    _N_PARTICLES = 2

    def addPerBondParameter(self, name: str) -> int:
        return self._add_per(name)

    def getNumPerBondParameters(self) -> int:
        return len(self._per_names)

    def getPerBondParameterName(self, index: int) -> str:
        return self._per_names[index]

    def addBond(self, particle1: int, particle2: int,
                parameters: Sequence[float] = ()) -> int:
        self._terms.append((int(particle1), int(particle2),
                            self._check_term_params(parameters)))
        return len(self._terms) - 1

    def getNumBonds(self) -> int:
        return len(self._terms)

    def getBondParameters(self, index: int):
        return self._terms[index]

    def setBondParameters(self, index, particle1, particle2,
                          parameters: Sequence[float] = ()):
        self._terms[index] = (int(particle1), int(particle2),
                              self._check_term_params(parameters))

    def bonded_pairs(self):
        return [(t[0], t[1]) for t in self._terms]

    def compile(self, system, dtype):
        if not self._terms:
            return None, None
        fn = self._compiled_expr()
        env0 = self._term_env(dtype)
        params = dict(
            env0,
            i=jnp.asarray([t[0] for t in self._terms], jnp.int32),
            j=jnp.asarray([t[1] for t in self._terms], jnp.int32))

        def energy(params, positions, box):
            delta = positions[params["i"]] - positions[params["j"]]
            r = jnp.sqrt(jnp.sum(delta * delta, axis=-1))
            env = {k: v for k, v in params.items() if k not in ("i", "j")}
            env["r"] = r
            return jnp.sum(fn(env))

        return energy, params


class CustomAngleForce(_CustomBondedBase):
    """OpenMM-compatible CustomAngleForce: E = f(theta) per angle."""

    _VAR = "theta"
    _N_PARTICLES = 3

    def addPerAngleParameter(self, name: str) -> int:
        return self._add_per(name)

    def getNumPerAngleParameters(self) -> int:
        return len(self._per_names)

    def getPerAngleParameterName(self, index: int) -> str:
        return self._per_names[index]

    def addAngle(self, particle1: int, particle2: int, particle3: int,
                 parameters: Sequence[float] = ()) -> int:
        self._terms.append((int(particle1), int(particle2), int(particle3),
                            self._check_term_params(parameters)))
        return len(self._terms) - 1

    def getNumAngles(self) -> int:
        return len(self._terms)

    def getAngleParameters(self, index: int):
        return self._terms[index]

    def setAngleParameters(self, index, p1, p2, p3,
                           parameters: Sequence[float] = ()):
        self._terms[index] = (int(p1), int(p2), int(p3),
                              self._check_term_params(parameters))

    def bonded_pairs(self):
        out = []
        for t in self._terms:
            out.append((t[0], t[1]))
            out.append((t[1], t[2]))
        return out

    def compile(self, system, dtype):
        if not self._terms:
            return None, None
        fn = self._compiled_expr()
        env0 = self._term_env(dtype)
        params = dict(
            env0,
            i=jnp.asarray([t[0] for t in self._terms], jnp.int32),
            j=jnp.asarray([t[1] for t in self._terms], jnp.int32),
            k_=jnp.asarray([t[2] for t in self._terms], jnp.int32))

        def energy(params, positions, box):
            v1 = positions[params["i"]] - positions[params["j"]]
            v2 = positions[params["k_"]] - positions[params["j"]]
            dot = jnp.sum(v1 * v2, axis=-1)
            n1 = jnp.linalg.norm(v1, axis=-1)
            n2 = jnp.linalg.norm(v2, axis=-1)
            cos_t = jnp.clip(dot / (n1 * n2), -1.0, 1.0)
            env = {k: v for k, v in params.items()
                   if k not in ("i", "j", "k_")}
            env["theta"] = jnp.arccos(cos_t)
            return jnp.sum(fn(env))

        return energy, params


class CustomTorsionForce(_CustomBondedBase):
    """OpenMM-compatible CustomTorsionForce: E = f(theta) per torsion,
    theta the atan2 dihedral in (-pi, pi]."""

    _VAR = "theta"
    _N_PARTICLES = 4

    def addPerTorsionParameter(self, name: str) -> int:
        return self._add_per(name)

    def getNumPerTorsionParameters(self) -> int:
        return len(self._per_names)

    def getPerTorsionParameterName(self, index: int) -> str:
        return self._per_names[index]

    def addTorsion(self, p1: int, p2: int, p3: int, p4: int,
                   parameters: Sequence[float] = ()) -> int:
        self._terms.append((int(p1), int(p2), int(p3), int(p4),
                            self._check_term_params(parameters)))
        return len(self._terms) - 1

    def getNumTorsions(self) -> int:
        return len(self._terms)

    def getTorsionParameters(self, index: int):
        return self._terms[index]

    def setTorsionParameters(self, index, p1, p2, p3, p4,
                             parameters: Sequence[float] = ()):
        self._terms[index] = (int(p1), int(p2), int(p3), int(p4),
                              self._check_term_params(parameters))

    def bonded_pairs(self):
        out = []
        for t in self._terms:
            out.append((t[0], t[1]))
            out.append((t[1], t[2]))
            out.append((t[2], t[3]))
        return out

    def compile(self, system, dtype):
        if not self._terms:
            return None, None
        fn = self._compiled_expr()
        env0 = self._term_env(dtype)
        params = dict(
            env0,
            i=jnp.asarray([t[0] for t in self._terms], jnp.int32),
            j=jnp.asarray([t[1] for t in self._terms], jnp.int32),
            k_=jnp.asarray([t[2] for t in self._terms], jnp.int32),
            l=jnp.asarray([t[3] for t in self._terms], jnp.int32))

        def energy(params, positions, box):
            theta = _dihedral(positions, params["i"], params["j"],
                              params["k_"], params["l"])
            env = {k: v for k, v in params.items()
                   if k not in ("i", "j", "k_", "l")}
            env["theta"] = theta
            return jnp.sum(fn(env))

        return energy, params


class CustomExternalForce(_CustomBondedBase):
    """OpenMM-compatible CustomExternalForce: E = f(x, y, z) per tagged
    particle — the standard OpenMM vehicle for positional restraints,
    umbrella-sampling biases, and external fields (the reference workflow
    inherits it from the host toolkit; `CustomExternalForce.h` in OpenMM).

    Variables are the particle's Cartesian coordinates x, y, z (nm) plus
    per-particle and global parameters.  The OpenMM builtin
    ``periodicdistance(x1, y1, z1, x2, y2, z2)`` is available and applies
    minimum-image convention under the CURRENT box (orthorhombic or
    triclinic), so restraints stay correct under NPT box moves.
    Matching OpenMM, a particle may be tagged multiple times.
    """

    _VAR = None  # variables are x, y, z (handled directly)
    _N_PARTICLES = 1

    def addPerParticleParameter(self, name: str) -> int:
        return self._add_per(name)

    def getNumPerParticleParameters(self) -> int:
        return len(self._per_names)

    def getPerParticleParameterName(self, index: int) -> str:
        return self._per_names[index]

    def addParticle(self, particle: int,
                    parameters: Sequence[float] = ()) -> int:
        self._terms.append((int(particle),
                            self._check_term_params(parameters)))
        return len(self._terms) - 1

    def getNumParticles(self) -> int:
        return len(self._terms)

    def getParticleParameters(self, index: int):
        return self._terms[index]

    def setParticleParameters(self, index, particle: int,
                              parameters: Sequence[float] = ()):
        self._terms[index] = (int(particle),
                              self._check_term_params(parameters))

    def bonded_pairs(self):
        return []  # single-particle terms add no connectivity

    def usesPeriodicBoundaryConditions(self) -> bool:
        from ..utils.expr import expression_functions
        return "periodicdistance" in expression_functions(self._energy_expr)

    def _compiled_expr(self):
        names = (["x", "y", "z"] + list(self._per_names)
                 + [g[0] for g in self._globals])
        return compile_expression(self._energy_expr, names,
                                  extra_fns={"periodicdistance": 6})

    def compile(self, system, dtype):
        if not self._terms:
            return None, None
        fn = self._compiled_expr()
        env0 = self._term_env(dtype)
        params = dict(
            env0,
            i=jnp.asarray([t[0] for t in self._terms], jnp.int32))

        from . import boxutils
        box0 = np.array(system.getDefaultPeriodicBoxVectors(), np.float64)
        triclinic = bool(boxutils.is_triclinic(box0))

        def energy(params, positions, box):
            pos = positions[params["i"]]
            mib = box if triclinic else jnp.diagonal(box)

            def periodicdistance(x1, y1, z1, x2, y2, z2):
                delta = jnp.stack(
                    [jnp.asarray(x1) - x2, jnp.asarray(y1) - y2,
                     jnp.asarray(z1) - z2], axis=-1)
                d = boxutils.min_image(delta, mib)
                return jnp.sqrt(jnp.sum(d * d, axis=-1))

            env = {k: v for k, v in params.items() if k != "i"}
            env["x"] = pos[:, 0]
            env["y"] = pos[:, 1]
            env["z"] = pos[:, 2]
            env["periodicdistance"] = periodicdistance
            return jnp.sum(fn(env))

        return energy, params


class CustomNonbondedForce:
    """OpenMM-compatible CustomNonbondedForce: E = f(r, per-particle
    params suffixed 1/2) summed over non-excluded pairs.

    Evaluated over the full ordered pair matrix in row blocks (energy
    halved) — see the module docstring for why this is the general path,
    not the production one.
    """

    NoCutoff = 0
    CutoffNonPeriodic = 1
    CutoffPeriodic = 2

    def __init__(self, energy: str):
        self._energy_expr = str(energy)
        self._per_names: List[str] = []
        self._globals: List[Tuple[str, float]] = []
        self._particles: List[tuple] = []
        self._exclusions: List[Tuple[int, int]] = []
        self._method = self.NoCutoff
        self._cutoff = 1.0
        self._use_switch = False
        self._switch_dist = -1.0

    # -- expression / parameters ----------------------------------------
    getEnergyFunction = _CustomBondedBase.getEnergyFunction
    setEnergyFunction = _CustomBondedBase.setEnergyFunction
    addGlobalParameter = _CustomBondedBase.addGlobalParameter
    getNumGlobalParameters = _CustomBondedBase.getNumGlobalParameters
    getGlobalParameterName = _CustomBondedBase.getGlobalParameterName
    getGlobalParameterDefaultValue = \
        _CustomBondedBase.getGlobalParameterDefaultValue
    setGlobalParameterDefaultValue = \
        _CustomBondedBase.setGlobalParameterDefaultValue

    def addPerParticleParameter(self, name: str) -> int:
        self._per_names.append(str(name))
        return len(self._per_names) - 1

    def getNumPerParticleParameters(self) -> int:
        return len(self._per_names)

    def getPerParticleParameterName(self, index: int) -> str:
        return self._per_names[index]

    def addParticle(self, parameters: Sequence[float] = ()) -> int:
        if len(parameters) != len(self._per_names):
            raise ValueError(
                f"expected {len(self._per_names)} per-particle "
                f"parameter(s) ({self._per_names}), got {len(parameters)}")
        self._particles.append(tuple(float(p) for p in parameters))
        return len(self._particles) - 1

    def getNumParticles(self) -> int:
        return len(self._particles)

    def getParticleParameters(self, index: int):
        return self._particles[index]

    def setParticleParameters(self, index, parameters: Sequence[float]):
        if len(parameters) != len(self._per_names):
            raise ValueError(
                f"expected {len(self._per_names)} per-particle "
                f"parameter(s), got {len(parameters)}")
        self._particles[index] = tuple(float(p) for p in parameters)

    def addExclusion(self, particle1: int, particle2: int) -> int:
        self._exclusions.append((int(particle1), int(particle2)))
        return len(self._exclusions) - 1

    def getNumExclusions(self) -> int:
        return len(self._exclusions)

    def getExclusionParticles(self, index: int):
        return self._exclusions[index]

    # -- method / cutoff -------------------------------------------------
    def setNonbondedMethod(self, method: int) -> None:
        if method not in (self.NoCutoff, self.CutoffNonPeriodic,
                          self.CutoffPeriodic):
            raise ValueError(f"unsupported nonbonded method {method}")
        self._method = int(method)

    def getNonbondedMethod(self) -> int:
        return self._method

    def setCutoffDistance(self, cutoff: float) -> None:
        self._cutoff = float(cutoff)

    def getCutoffDistance(self) -> float:
        return self._cutoff

    def setUseSwitchingFunction(self, use: bool) -> None:
        self._use_switch = bool(use)

    def getUseSwitchingFunction(self) -> bool:
        return self._use_switch

    def setSwitchingDistance(self, distance: float) -> None:
        self._switch_dist = float(distance)

    def getSwitchingDistance(self) -> float:
        return self._switch_dist

    def usesPeriodicBoundaryConditions(self) -> bool:
        return self._method == self.CutoffPeriodic

    # -- compile ---------------------------------------------------------
    def compile(self, system, dtype, block_rows: int = 256):
        n = len(self._particles)
        if n == 0:
            return None, None
        if n != system.getNumParticles():
            raise ValueError(
                f"CustomNonbondedForce has {n} particles but the System "
                f"has {system.getNumParticles()}")
        names = (["r"] + [p + "1" for p in self._per_names]
                 + [p + "2" for p in self._per_names]
                 + [g[0] for g in self._globals])
        fn = compile_expression(self._energy_expr, names)

        per = np.array(self._particles, np.float64).reshape(
            n, len(self._per_names))
        # exclusion table: (n, E) padded with self-index (the diagonal is
        # excluded anyway), so the hot mask build is E scatter rows — this
        # path is dense/general, not the production cell sweep
        excl: List[List[int]] = [[] for _ in range(n)]
        for a, b in self._exclusions:
            excl[a].append(b)
            excl[b].append(a)
        E = max((len(e) for e in excl), default=0)
        excl_tab = np.tile(np.arange(n, dtype=np.int32)[:, None],
                           (1, max(E, 1)))
        for i2, es in enumerate(excl):
            excl_tab[i2, :len(es)] = es

        params = {
            "per": jnp.asarray(per, dtype),
            "excl": jnp.asarray(excl_tab),
            "glb": jnp.asarray([g[1] for g in self._globals], dtype),
        }
        periodic = self._method == self.CutoffPeriodic
        use_cut = self._method != self.NoCutoff
        cutoff = self._cutoff
        use_switch = self._use_switch and use_cut
        r_switch = self._switch_dist
        per_names = list(self._per_names)
        glb_names = [g[0] for g in self._globals]
        B = max(1, min(block_rows, n))
        nb = -(-n // B)

        from . import boxutils
        box0 = np.array(system.getDefaultPeriodicBoxVectors(), np.float64)
        triclinic = bool(boxutils.is_triclinic(box0))

        def energy(params, positions, box):
            pos = positions[:n]
            mib = box if triclinic else jnp.diagonal(box)
            npad = nb * B - n
            posp = jnp.concatenate(
                [pos, jnp.full((npad, 3), 1e6, pos.dtype)]) if npad else pos
            perp = params["per"]
            if npad:
                perp = jnp.concatenate(
                    [perp, jnp.zeros((npad, perp.shape[1]), perp.dtype)])
            ex = params["excl"]
            if npad:
                ex = jnp.concatenate(
                    [ex, jnp.tile(jnp.arange(n, n + npad,
                                             dtype=ex.dtype)[:, None],
                                  (1, ex.shape[1]))])

            def block(e_acc, bi):
                rows = bi * B + jnp.arange(B)
                prow = jax.lax.dynamic_slice_in_dim(posp, bi * B, B)
                delta = prow[:, None, :] - pos[None, :, :]
                if periodic:
                    delta = boxutils.min_image(delta, mib)
                r2 = jnp.sum(delta * delta, axis=-1)
                mask = rows[:, None] < n
                mask = mask & (rows[:, None] != jnp.arange(n)[None, :])
                exrow = jax.lax.dynamic_slice_in_dim(ex, bi * B, B)
                for e2 in range(exrow.shape[1]):
                    mask = mask & (exrow[:, e2][:, None]
                                   != jnp.arange(n)[None, :])
                if use_cut:
                    mask = mask & (r2 < cutoff * cutoff)
                # double-where: masked slots evaluate the expression at
                # r = 1 so an inf (e.g. r^-12 at the diagonal) cannot
                # poison the gradient through the outer where
                r = jnp.sqrt(jnp.where(mask, jnp.maximum(r2, 1e-12), 1.0))
                env = {"r": r}
                for c, name in enumerate(per_names):
                    prow_p = jax.lax.dynamic_slice_in_dim(
                        perp[:, c], bi * B, B)
                    env[name + "1"] = prow_p[:, None]
                    env[name + "2"] = params["per"][:, c][None, :]
                for c, name in enumerate(glb_names):
                    env[name] = params["glb"][c]
                e = fn(env)
                if use_switch and r_switch >= 0:
                    x = jnp.clip((r - r_switch) / (cutoff - r_switch),
                                 0.0, 1.0)
                    e = e * (1.0 + x * x * x
                             * (-10.0 + x * (15.0 - 6.0 * x)))
                return e_acc + 0.5 * jnp.sum(jnp.where(mask, e, 0.0)), None

            e, _ = jax.lax.scan(block, jnp.zeros((), pos.dtype),
                                jnp.arange(nb))
            return e

        return energy, params
