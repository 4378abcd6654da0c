"""System description: particles, constraints, virtual sites, forces, box.

This mirrors the object model the reference plugin leans on from the host
OpenMM library (System/Context semantics, cf. SURVEY.md layer map): the
reference itself never computes forces, but our framework has no host
toolkit, so the substrate lives here.  The API surface intentionally matches
OpenMM's (`addParticle`, `addConstraint`, `setVirtualSite`,
`setDefaultPeriodicBoxVectors`, `addForce`) so users of the reference can
switch over directly.

These are host-side mutable builders.  `core.spec.build_spec` compiles a
System + integrator into immutable dense-array pytrees for the jitted step.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple


class VirtualSite:
    """Base class for virtual site definitions (massless sites whose
    positions are functions of other particles)."""

    particles: Tuple[int, ...]


class TwoParticleAverageSite(VirtualSite):
    def __init__(self, particle1: int, particle2: int, weight1: float, weight2: float):
        self.particles = (particle1, particle2)
        self.weights = (weight1, weight2)


class ThreeParticleAverageSite(VirtualSite):
    """pos = w1*p1 + w2*p2 + w3*p3 (used by SWM4-NDP water M site;
    cf. reference test platforms/reference/tests/TestReferenceDrudeTGNHIntegrator.cpp:148)."""

    def __init__(self, particle1: int, particle2: int, particle3: int,
                 weight1: float, weight2: float, weight3: float):
        self.particles = (particle1, particle2, particle3)
        self.weights = (weight1, weight2, weight3)


class OutOfPlaneSite(VirtualSite):
    """pos = p1 + w12*r12 + w13*r13 + wcross*(r12 x r13)."""

    def __init__(self, particle1: int, particle2: int, particle3: int,
                 weight12: float, weight13: float, weightCross: float):
        self.particles = (particle1, particle2, particle3)
        self.weights = (weight12, weight13, weightCross)


class LocalCoordinatesSite(VirtualSite):
    """Site at a fixed position in a local frame defined by weighted sums of
    parent positions (OpenMM semantics; CHARMM-Drude lone pairs are built
    from these by the reference workflow's ForceField pass,
    /root/reference/example/nacl_tg.py:37-42):

      origin = sum_i ow_i p_i
      xdir   = sum_i xw_i p_i,  ydir = sum_i yw_i p_i
      x^ = xdir/|xdir|; z^ = (xdir x ydir)/|...|; y^ = z^ x x^
      pos = origin + local[0] x^ + local[1] y^ + local[2] z^
    """

    def __init__(self, particles: Sequence[int],
                 originWeights: Sequence[float],
                 xWeights: Sequence[float], yWeights: Sequence[float],
                 localPosition: Sequence[float]):
        if not (len(particles) == len(originWeights) == len(xWeights)
                == len(yWeights)):
            raise ValueError("particles and weight lists must match")
        self.particles = tuple(int(p) for p in particles)
        self.origin_weights = tuple(float(w) for w in originWeights)
        self.x_weights = tuple(float(w) for w in xWeights)
        self.y_weights = tuple(float(w) for w in yWeights)
        self.local_position = tuple(float(w) for w in localPosition)


class System:
    """Container for the physical description of a simulated system."""

    def __init__(self):
        self._masses: List[float] = []
        self._constraints: List[Tuple[int, int, float]] = []
        self._virtual_sites: dict[int, VirtualSite] = {}
        self._forces: List[object] = []
        # default box: 2 nm cube (like OpenMM's default)
        self._box = ((2.0, 0.0, 0.0), (0.0, 2.0, 0.0), (0.0, 0.0, 2.0))

    # -- particles ---------------------------------------------------------
    def addParticle(self, mass: float) -> int:
        self._masses.append(float(mass))
        return len(self._masses) - 1

    def getNumParticles(self) -> int:
        return len(self._masses)

    def getParticleMass(self, index: int) -> float:
        return self._masses[index]

    def setParticleMass(self, index: int, mass: float) -> None:
        self._masses[index] = float(mass)

    # -- constraints -------------------------------------------------------
    def addConstraint(self, particle1: int, particle2: int, distance: float) -> int:
        self._constraints.append((int(particle1), int(particle2), float(distance)))
        return len(self._constraints) - 1

    def getNumConstraints(self) -> int:
        return len(self._constraints)

    def getConstraintParameters(self, index: int) -> Tuple[int, int, float]:
        return self._constraints[index]

    # -- virtual sites -----------------------------------------------------
    def setVirtualSite(self, index: int, site: VirtualSite) -> None:
        self._virtual_sites[int(index)] = site

    def isVirtualSite(self, index: int) -> bool:
        return int(index) in self._virtual_sites

    def getVirtualSite(self, index: int) -> VirtualSite:
        return self._virtual_sites[int(index)]

    # -- forces ------------------------------------------------------------
    def addForce(self, force) -> int:
        self._forces.append(force)
        return len(self._forces) - 1

    def getNumForces(self) -> int:
        return len(self._forces)

    def getForce(self, index: int):
        return self._forces[index]

    def getForces(self) -> Sequence[object]:
        return list(self._forces)

    def removeForce(self, index: int) -> None:
        del self._forces[index]

    # -- box ---------------------------------------------------------------
    def setDefaultPeriodicBoxVectors(self, a, b, c) -> None:
        """Accepts orthorhombic boxes and triclinic cells in OpenMM's
        convention (a along x, b in the xy plane); triclinic inputs are
        reduced to the canonical form |bx| <= ax/2 etc. like OpenMM does
        (forces/boxutils.reduce_box).  Triclinic systems run through the
        dense all-pairs strategy + generic PME; the cell-pair fast path
        raises at compile (forces/nonbonded.py)."""
        from .forces.boxutils import reduce_box
        box = reduce_box([a, b, c])
        self._box = tuple(tuple(float(v) for v in row) for row in box)

    def getDefaultPeriodicBoxVectors(self):
        return self._box

    def usesPeriodicBoundaryConditions(self) -> bool:
        return any(getattr(f, "usesPeriodicBoundaryConditions", lambda: False)()
                   for f in self._forces)
