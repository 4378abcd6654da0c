"""Molecule (residue) decomposition.

The reference builds its residue <- molecule map from OpenMM's
Context::getMolecules() (DrudeTGNHIntegrator.cpp:136-143): particles are in
the same molecule iff they are connected through constraints, force-defined
bonds (including nonbonded exceptions and Drude pairs), or virtual-site
dependencies.  We reimplement that as a union-find over the same link set.
"""

from __future__ import annotations

import numpy as np


class UnionFind:
    def __init__(self, n: int):
        self.parent = np.arange(n, dtype=np.int64)

    def find(self, i: int) -> int:
        p = self.parent
        root = i
        while p[root] != root:
            root = p[root]
        while p[i] != root:
            p[i], i = root, p[i]
        return root

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[rb] = ra


def _link_edges(system) -> np.ndarray:
    edges = []
    for ci in range(system.getNumConstraints()):
        p1, p2, _ = system.getConstraintParameters(ci)
        edges.append((p1, p2))
    for f in system.getForces():
        edges.extend(getattr(f, "bonded_pairs", lambda: [])())
    for i in range(system.getNumParticles()):
        if system.isVirtualSite(i):
            for p in system.getVirtualSite(i).particles:
                edges.append((i, p))
    return np.array(edges, np.int64).reshape(-1, 2)


def molecule_ids(system) -> np.ndarray:
    """Return per-particle molecule ids, numbered 0..M-1 in order of first
    appearance (matching OpenMM's getMolecules ordering so residue ids are
    contiguous runs for contiguously-numbered molecules).

    Uses the native C++ union-find (utils/native.py) when available — the
    build-time hot path for million-atom systems — with this pure-Python
    fallback kept behaviorally identical."""
    n = system.getNumParticles()
    edges = _link_edges(system)

    from ..utils import native
    res = native.molecule_ids_native(n, edges)
    if res is not None:
        return res[0]

    uf = UnionFind(n)
    for a, b in edges:
        uf.union(int(a), int(b))
    ids = np.empty(n, dtype=np.int32)
    remap: dict[int, int] = {}
    for i in range(n):
        root = uf.find(i)
        if root not in remap:
            remap[root] = len(remap)
        ids[i] = remap[root]
    return ids


def residue_masses(system, resid: np.ndarray) -> np.ndarray:
    """Total mass of each residue (massless particles contribute zero),
    cf. reference DrudeTGNHIntegrator.cpp:146-153."""
    n_res = int(resid.max()) + 1 if len(resid) else 0
    masses = np.array([system.getParticleMass(i) for i in range(len(resid))])
    out = np.zeros(n_res)
    np.add.at(out, resid, masses)
    return out
