"""CMAP torsion-pair maps + harmonic (CHARMM improper) torsions.

Pins forces/cmap.py's bicubic construction against an analytic periodic
surface, autodiff forces against finite differences INCLUDING angles
landing exactly on grid knots (the CLAUDE.md B-spline lesson), the
ForceField <CmapTorsionForce>/<CustomTorsionForce> ingestion paths
(reconstructed OpenMM-shaped XML snippets — the stock protein decks'
encodings), System XML round-trip, and flat-ensemble replication.
"""

import math
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import openmm_drudenose_tpu as dn
from openmm_drudenose_tpu.forces.cmap import CMAPTorsionForce, _map_coefficients
from openmm_drudenose_tpu.forces.bonded import HarmonicTorsionForce
from openmm_drudenose_tpu.app import forcefield as ffmod
from openmm_drudenose_tpu.io import pdbfile

DATA = os.path.join(os.path.dirname(__file__), "data")


def _np_dihedral(p0, p1, p2, p3):
    b1 = np.asarray(p1) - np.asarray(p0)
    b2 = np.asarray(p2) - np.asarray(p1)
    b3 = np.asarray(p3) - np.asarray(p2)
    c1 = np.cross(b1, b2)
    c2 = np.cross(b2, b3)
    p1_ = np.dot(c1, c2)
    p2_ = np.dot(np.cross(c1, b2 / np.linalg.norm(b2)), c2)
    return math.atan2(p2_, p1_)


def _surface(phi, psi):
    return np.cos(phi) + np.sin(psi) + 0.3 * np.cos(phi + psi)


def _surface_map(n):
    h = 2.0 * np.pi / n
    a = -np.pi + np.arange(n) * h
    # energy[a + n*b] = f(phi_a, psi_b): angle1 index fastest
    return _surface(a[:, None], a[None, :]).reshape(-1, order="F")


def _energy_of(force, pos, box_edge=10.0):
    energy, params = force.compile(None, jnp.float64)
    box = jnp.asarray(np.diag([box_edge] * 3))
    e_fn = lambda p: energy(params, p, box)
    e = float(e_fn(jnp.asarray(pos, jnp.float64)))
    f = -np.asarray(jax.grad(e_fn)(jnp.asarray(pos, jnp.float64)))
    return e, f


def _chain_positions(rng=None, planar=False):
    if planar:
        # phi = 0 exactly (cis), psi = pi exactly (trans at the seam):
        # both angles land exactly on grid knots of any even-size map
        return np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0],
                         [1.0, 1.0, 0.0], [0.0, 1.0, 0.0],
                         [0.0, 2.0, 0.0]])
    pos = np.array([[0.0, 0.0, 0.0], [0.15, 0.0, 0.0],
                    [0.22, 0.14, 0.0], [0.36, 0.18, 0.11],
                    [0.42, 0.31, 0.05]])
    if rng is not None:
        pos = pos + rng.normal(0, 0.01, pos.shape)
    return pos


def test_patch_coefficients_reproduce_grid_knots():
    n = 12
    E = _surface_map(n).reshape(n, n, order="F")
    c = _map_coefficients(E).reshape(n, n, 4, 4)
    # patch (a, b) at (u, v) = (0, 0) must hit the grid value exactly
    np.testing.assert_allclose(c[:, :, 0, 0], E, rtol=0, atol=1e-12)
    # C0 across cell boundaries: patch (a,b) at u=1 equals patch (a+1,b) at 0
    u_at_1 = c.sum(axis=2)[:, :, 0]  # sum_m c[m, 0]
    np.testing.assert_allclose(u_at_1, np.roll(E, -1, axis=0),
                               rtol=0, atol=1e-10)


def test_cmap_energy_matches_analytic_surface():
    n = 24
    f = CMAPTorsionForce()
    f.addMap(n, _surface_map(n))
    f.addTorsion(0, 0, 1, 2, 3, 1, 2, 3, 4)
    rng = np.random.default_rng(11)
    for _ in range(8):
        pos = _chain_positions(rng)
        phi = _np_dihedral(*pos[0:4])
        psi = _np_dihedral(*pos[1:5])
        e, _ = _energy_of(f, pos)
        assert e == pytest.approx(_surface(phi, psi), abs=5e-4)


def test_cmap_forces_match_finite_difference():
    n = 16
    f = CMAPTorsionForce()
    f.addMap(n, _surface_map(n))
    f.addTorsion(0, 0, 1, 2, 3, 1, 2, 3, 4)
    for planar in (False, True):   # planar: BOTH angles exactly on knots
        pos = _chain_positions(np.random.default_rng(5), planar=planar)
        e0, force = _energy_of(f, pos)
        if planar:
            # phi = 0, psi = pi: knot values exactly (psi wraps to -pi)
            h = 2.0 * np.pi / n
            a_phi, a_psi = n // 2, 0
            expect = _surface_map(n)[a_phi + n * a_psi]
            assert e0 == pytest.approx(expect, abs=1e-10)
        eps = 1e-6
        num = np.zeros_like(pos)
        for i in range(pos.shape[0]):
            for d in range(3):
                pp = pos.copy(); pp[i, d] += eps
                pm = pos.copy(); pm[i, d] -= eps
                ep, _ = _energy_of(f, pp)
                em, _ = _energy_of(f, pm)
                num[i, d] = -(ep - em) / (2 * eps)
        np.testing.assert_allclose(force, num, rtol=2e-5, atol=1e-7)


def test_cmap_periodic_continuity_at_seam():
    """Energy is continuous as an angle crosses +-pi."""
    n = 12
    f = CMAPTorsionForce()
    f.addMap(n, _surface_map(n))
    f.addTorsion(0, 0, 1, 2, 3, 1, 2, 3, 4)
    base = _chain_positions(planar=True)   # psi exactly at the seam
    es = []
    for dz in (-1e-7, 0.0, 1e-7):
        pos = base.copy()
        pos[4, 2] += dz                     # rotate psi across +-pi
        es.append(_energy_of(f, pos)[0])
    assert abs(es[0] - es[1]) < 1e-5 and abs(es[2] - es[1]) < 1e-5


def test_cmap_two_maps_and_offsets():
    """Torsions referencing different-size maps coexist (concatenated
    coefficient table with per-torsion offsets)."""
    f = CMAPTorsionForce()
    f.addMap(8, _surface_map(8))
    f.addMap(12, 2.0 * _surface_map(12))
    f.addTorsion(0, 0, 1, 2, 3, 1, 2, 3, 4)
    f.addTorsion(1, 0, 1, 2, 3, 1, 2, 3, 4)
    pos = _chain_positions(np.random.default_rng(2))
    phi = _np_dihedral(*pos[0:4])
    psi = _np_dihedral(*pos[1:5])
    e, _ = _energy_of(f, pos)
    assert e == pytest.approx(3.0 * _surface(phi, psi), abs=0.02)


def test_harmonic_torsion_energy_and_wrap():
    f = HarmonicTorsionForce()
    f.addTorsion(0, 1, 2, 3, 2.9, 7.0)
    pos = _chain_positions(np.random.default_rng(9))[:4]
    phi = _np_dihedral(*pos)
    d = phi - 2.9
    d -= 2 * np.pi * round(d / (2 * np.pi))
    e, force = _energy_of(f, pos)
    assert e == pytest.approx(7.0 * d * d, rel=1e-10)
    eps = 1e-6
    for i in range(4):
        for dd in range(3):
            pp = pos.copy(); pp[i, dd] += eps
            pm = pos.copy(); pm[i, dd] -= eps
            num = -(_energy_of(f, pp)[0] - _energy_of(f, pm)[0]) / (2 * eps)
            assert force[i, dd] == pytest.approx(num, rel=1e-4, abs=1e-7)


# --------------------------------------------------------------- ingestion

_CMAP_XML = """<?xml version="1.0" encoding="utf-8"?>
<ForceField>
  <AtomTypes>
    <Type name="tA" class="CA" element="C" mass="12.011"/>
    <Type name="tB" class="CB" element="C" mass="12.011"/>
    <Type name="tC" class="CC" element="C" mass="12.011"/>
    <Type name="tD" class="CD" element="C" mass="12.011"/>
    <Type name="tE" class="CE" element="C" mass="12.011"/>
    <Type name="tF" class="CF" element="C" mass="12.011"/>
  </AtomTypes>
  <Residues>
    <Residue name="PEN">
      <Atom name="A1" type="tA" charge="0.0"/>
      <Atom name="A2" type="tB" charge="0.0"/>
      <Atom name="A3" type="tC" charge="0.0"/>
      <Atom name="A4" type="tD" charge="0.0"/>
      <Atom name="A5" type="tE" charge="0.0"/>
      <Atom name="A6" type="tF" charge="0.0"/>
      <Bond atomName1="A1" atomName2="A2"/>
      <Bond atomName1="A2" atomName2="A3"/>
      <Bond atomName1="A3" atomName2="A4"/>
      <Bond atomName1="A4" atomName2="A5"/>
      <Bond atomName1="A3" atomName2="A6"/>
    </Residue>
  </Residues>
  <HarmonicBondForce>
    <Bond class1="CA" class2="CB" length="0.15" k="100000"/>
    <Bond class1="CB" class2="CC" length="0.15" k="100000"/>
    <Bond class1="CC" class2="CD" length="0.15" k="100000"/>
    <Bond class1="CD" class2="CE" length="0.15" k="100000"/>
    <Bond class1="CC" class2="CF" length="0.15" k="100000"/>
  </HarmonicBondForce>
  <HarmonicAngleForce>
    <Angle class1="CA" class2="CB" class3="CC" angle="1.9" k="300"/>
    <Angle class1="CB" class2="CC" class3="CD" angle="1.9" k="300"/>
    <Angle class1="CB" class2="CC" class3="CF" angle="1.9" k="300"/>
    <Angle class1="CD" class2="CC" class3="CF" angle="1.9" k="300"/>
    <Angle class1="CC" class2="CD" class3="CE" angle="1.9" k="300"/>
  </HarmonicAngleForce>
  <CustomTorsionForce energy="k*(theta-theta0)^2">
    <PerTorsionParameter name="k"/>
    <PerTorsionParameter name="theta0"/>
    <Improper class1="CC" class2="CB" class3="CD" class4="CF"
              k="40.0" theta0="0.0"/>
  </CustomTorsionForce>
  <CmapTorsionForce>
    <Map>{map_text}</Map>
    <Torsion map="0" class1="{c1}" class2="{c2}" class3="{c3}"
             class4="{c4}" class5="{c5}"/>
  </CmapTorsionForce>
  <NonbondedForce coulomb14scale="1.0" lj14scale="1.0">
    <Atom type="tA" charge="0.0" sigma="0.3" epsilon="0.1"/>
    <Atom type="tB" charge="0.0" sigma="0.3" epsilon="0.1"/>
    <Atom type="tC" charge="0.0" sigma="0.3" epsilon="0.1"/>
    <Atom type="tD" charge="0.0" sigma="0.3" epsilon="0.1"/>
    <Atom type="tE" charge="0.0" sigma="0.3" epsilon="0.1"/>
    <Atom type="tF" charge="0.0" sigma="0.3" epsilon="0.1"/>
  </NonbondedForce>
</ForceField>
"""


def _pen_topology():
    atoms = [pdbfile.PDBAtom(i + 1, f"A{i + 1}", "PEN", "A", 1, "C")
             for i in range(6)]
    return pdbfile.PDBTopology(atoms)


def _write_cmap_xml(tmp_path, classes=("CA", "CB", "CC", "CD", "CE"), n=8):
    txt = _CMAP_XML.format(
        map_text=" ".join(repr(float(v)) for v in _surface_map(n)),
        c1=classes[0], c2=classes[1], c3=classes[2], c4=classes[3],
        c5=classes[4])
    out = tmp_path / "cmap_ff.xml"
    out.write_text(txt)
    return str(out)


def test_forcefield_cmap_and_harmonic_improper(tmp_path):
    ff = ffmod.ForceField(_write_cmap_xml(tmp_path))
    system = ff.createSystem(_pen_topology(), nonbondedMethod=ffmod.NoCutoff,
                             constraints=None, removeCMMotion=False)
    cmaps = [f for f in system.getForces()
             if isinstance(f, CMAPTorsionForce)]
    harms = [f for f in system.getForces()
             if isinstance(f, HarmonicTorsionForce)]
    assert len(cmaps) == 1 and len(harms) == 1
    assert cmaps[0].getNumMaps() == 1
    assert cmaps[0].getNumTorsions() == 1
    # chain A1..A5 -> dihedral pair (0,1,2,3) + (1,2,3,4)
    assert cmaps[0].getTorsionParameters(0) == (0, 0, 1, 2, 3, 1, 2, 3, 4)
    assert harms[0].getNumTorsions() == 1
    p = harms[0].getTorsionParameters(0)
    assert p[:4] == (2, 1, 3, 5) and p[4:] == (0.0, 40.0)


def test_forcefield_cmap_reversed_match(tmp_path):
    """A <Torsion> whose classes match the chain only in reverse adds the
    atoms reversed, preserving the asymmetric map's orientation."""
    ff = ffmod.ForceField(_write_cmap_xml(
        tmp_path, classes=("CE", "CD", "CC", "CB", "CA")))
    system = ff.createSystem(_pen_topology(), nonbondedMethod=ffmod.NoCutoff,
                             constraints=None, removeCMMotion=False)
    cmap = [f for f in system.getForces()
            if isinstance(f, CMAPTorsionForce)][0]
    assert cmap.getTorsionParameters(0) == (0, 4, 3, 2, 1, 3, 2, 1, 0)


def test_forcefield_cmap_energy_matches_hand_built(tmp_path):
    n = 8
    ff = ffmod.ForceField(_write_cmap_xml(tmp_path, n=n))
    system = ff.createSystem(_pen_topology(), nonbondedMethod=ffmod.NoCutoff,
                             constraints=None, removeCMMotion=False)
    cmap = [f for f in system.getForces()
            if isinstance(f, CMAPTorsionForce)][0]
    hand = CMAPTorsionForce()
    hand.addMap(n, _surface_map(n))
    hand.addTorsion(0, 0, 1, 2, 3, 1, 2, 3, 4)
    pos = np.vstack([_chain_positions(np.random.default_rng(4)),
                     [[0.25, 0.25, -0.12]]])
    e_ff, f_ff = _energy_of(cmap, pos)
    e_h, f_h = _energy_of(hand, pos)
    assert e_ff == pytest.approx(e_h, rel=1e-12)
    np.testing.assert_allclose(f_ff, f_h, rtol=1e-10, atol=1e-12)


def test_custom_torsion_normalized_variant(tmp_path):
    """Renamed parameters (kpsi/psi0), declaration order swapped,
    (theta0-theta) subtraction order, and a 0.5* prefix must all
    normalize onto the stock harmonic shape instead of raising
    (VERDICT round-4 item 7); the half folds into k."""
    txt = _CMAP_XML.format(
        map_text=" ".join(repr(float(v)) for v in _surface_map(8)),
        c1="CA", c2="CB", c3="CC", c4="CD", c5="CE").replace(
        '<CustomTorsionForce energy="k*(theta-theta0)^2">\n'
        '    <PerTorsionParameter name="k"/>\n'
        '    <PerTorsionParameter name="theta0"/>\n'
        '    <Improper class1="CC" class2="CB" class3="CD" class4="CF"\n'
        '              k="40.0" theta0="0.0"/>',
        '<CustomTorsionForce energy="0.5 * kpsi * (psi0 - theta)^2">\n'
        '    <PerTorsionParameter name="psi0"/>\n'
        '    <PerTorsionParameter name="kpsi"/>\n'
        '    <Improper class1="CC" class2="CB" class3="CD" class4="CF"\n'
        '              kpsi="80.0" psi0="0.0"/>')
    out = tmp_path / "variant.xml"
    out.write_text(txt)
    ff = ffmod.ForceField(str(out))
    system = ff.createSystem(_pen_topology(), nonbondedMethod=ffmod.NoCutoff,
                             constraints=None, removeCMMotion=False)
    harms = [f for f in system.getForces()
             if isinstance(f, HarmonicTorsionForce)]
    assert len(harms) == 1
    p = harms[0].getTorsionParameters(0)
    assert p[:4] == (2, 1, 3, 5) and p[4:] == (0.0, 40.0)


def test_custom_torsion_nonharmonic_ingests_as_general(tmp_path):
    # a shape outside the harmonic-improper family now falls back to the
    # GENERAL expression-compiled CustomTorsionForce (round-5 Custom*Force
    # support) instead of raising
    from openmm_drudenose_tpu.forces.custom import CustomTorsionForce
    txt = _CMAP_XML.format(
        map_text=" ".join(repr(float(v)) for v in _surface_map(8)),
        c1="CA", c2="CB", c3="CC", c4="CD", c5="CE").replace(
        'energy="k*(theta-theta0)^2"', 'energy="k*cos(theta-theta0)"')
    out = tmp_path / "gen.xml"
    out.write_text(txt)
    ff = ffmod.ForceField(str(out))
    system = ff.createSystem(_pen_topology(), nonbondedMethod=ffmod.NoCutoff,
                             constraints=None, removeCMMotion=False)
    gen = [f for f in system.getForces()
           if isinstance(f, CustomTorsionForce)]
    assert len(gen) == 1 and gen[0].getNumTorsions() >= 1
    assert gen[0].getEnergyFunction() == "k*cos(theta-theta0)"


def test_custom_torsion_invalid_expression_raises(tmp_path):
    txt = _CMAP_XML.format(
        map_text=" ".join(repr(float(v)) for v in _surface_map(8)),
        c1="CA", c2="CB", c3="CC", c4="CD", c5="CE").replace(
        'energy="k*(theta-theta0)^2"', 'energy="k*nosuchfn(theta)"')
    out = tmp_path / "bad.xml"
    out.write_text(txt)
    with pytest.raises(ffmod.ForceFieldError, match="nosuchfn"):
        ffmod.ForceField(str(out))


def test_cmap_serialization_round_trip(tmp_path):
    system = dn.System()
    for _ in range(5):
        system.addParticle(12.0)
    f = CMAPTorsionForce()
    f.addMap(8, _surface_map(8))
    f.addTorsion(0, 0, 1, 2, 3, 1, 2, 3, 4)
    h = HarmonicTorsionForce()
    h.addTorsion(0, 1, 2, 3, 0.5, 11.0)
    system.addForce(f)
    system.addForce(h)
    xml = dn.serialize_system(system)
    system2 = dn.deserialize_system(xml)
    f2 = [g for g in system2.getForces() if isinstance(g, CMAPTorsionForce)][0]
    h2 = [g for g in system2.getForces()
          if isinstance(g, HarmonicTorsionForce)][0]
    assert f2.getTorsionParameters(0) == f.getTorsionParameters(0)
    size, energy = f2.getMapParameters(0)
    assert size == 8
    np.testing.assert_array_equal(energy, _surface_map(8))
    assert h2.getTorsionParameters(0) == h.getTorsionParameters(0)
    pos = _chain_positions(np.random.default_rng(1))
    assert _energy_of(f2, pos)[0] == pytest.approx(_energy_of(f, pos)[0],
                                                   rel=1e-12)


def test_cmap_flat_replication():
    from openmm_drudenose_tpu.parallel.flatrep import _replicate_force
    f = CMAPTorsionForce()
    f.addMap(8, _surface_map(8))
    f.addTorsion(0, 0, 1, 2, 3, 1, 2, 3, 4)
    g = _replicate_force(f, 2, 5)
    assert g.getNumTorsions() == 2
    assert g.getTorsionParameters(1) == (0, 5, 6, 7, 8, 6, 7, 8, 9)
    h = HarmonicTorsionForce()
    h.addTorsion(0, 1, 2, 3, 0.5, 11.0)
    g2 = _replicate_force(h, 2, 4)
    assert g2.getTorsionParameters(1) == (4, 5, 6, 7, 0.5, 11.0)
    rng = np.random.default_rng(3)
    p0 = _chain_positions(rng)
    p1 = _chain_positions(rng)
    e_both, _ = _energy_of(g, np.vstack([p0, p1]))
    assert e_both == pytest.approx(_energy_of(f, p0)[0]
                                   + _energy_of(f, p1)[0], rel=1e-10)
