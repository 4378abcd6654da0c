"""Native C++ host runtime vs the pure-Python fallbacks."""

import numpy as np
import pytest

from openmm_drudenose_tpu.core import topology
from openmm_drudenose_tpu.utils import native

from util import swm4_water_box


requires_native = pytest.mark.skipif(native.get_lib() is None,
                                     reason="native library unavailable")


@requires_native
def test_union_find_matches_python():
    rng = np.random.default_rng(0)
    n = 5000
    edges = rng.integers(0, n, (4000, 2)).astype(np.int64)
    labels, n_mol = native.molecule_ids_native(n, edges)

    uf = topology.UnionFind(n)
    for a, b in edges:
        uf.union(int(a), int(b))
    remap = {}
    expect = np.empty(n, np.int32)
    for i in range(n):
        r = uf.find(i)
        if r not in remap:
            remap[r] = len(remap)
        expect[i] = remap[r]
    np.testing.assert_array_equal(labels, expect)
    assert n_mol == expect.max() + 1


@requires_native
def test_molecule_ids_uses_water_topology():
    system, _ = swm4_water_box(grid_size=2)
    ids = topology.molecule_ids(system)
    # 8 molecules of 5 contiguous atoms each
    np.testing.assert_array_equal(ids, np.repeat(np.arange(8), 5))


@requires_native
def test_residue_masses_native():
    rng = np.random.default_rng(1)
    resid = rng.integers(0, 50, 1000).astype(np.int32)
    masses = rng.uniform(0, 20, 1000)
    out = native.residue_masses_native(resid, masses, 50)
    expect = np.zeros(50)
    np.add.at(expect, resid, masses)
    np.testing.assert_allclose(out, expect, rtol=1e-12)


@requires_native
def test_pdb_parse_native_roundtrip(tmp_path):
    from openmm_drudenose_tpu.io import pdbfile
    pos = np.array([[0.1, 0.2, 0.3], [1.0, -0.5, 2.25]])
    path = str(tmp_path / "t.pdb")
    pdbfile.write_pdb(path, pos, box_nm=[3.0, 3.0, 3.0])
    coords, res_seq, names, res_names, box = native.parse_pdb_native(path)
    np.testing.assert_allclose(coords, pos, atol=1e-4)
    np.testing.assert_allclose(box, [3.0, 3.0, 3.0], atol=1e-4)
    # python parser agrees
    p = pdbfile.PDBFile(path)
    np.testing.assert_allclose(p.positions, coords, atol=1e-9)
