"""General Custom*Force XML ingestion (app/forcefield.py fallbacks).

The reference workflow rides OpenMM's Lepton parser for arbitrary
Custom*Force algebra in ffxml decks (example/nacl_tg.py:37-42); these
tests pin our expression-compiled general fallbacks: a Morse
CustomBondForce, a harmonic CustomAngleForce, a 3-parameter periodic
CustomTorsionForce (not the stock harmonic-improper shape), and a general
CustomNonbondedForce with bondCutoff exclusions — plus the System-XML
round trip for all four.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

import openmm_drudenose_tpu as dn
from openmm_drudenose_tpu.app import forcefield as ffmod
from openmm_drudenose_tpu.app.serialization import (deserialize_system,
                                                    serialize_system)
from openmm_drudenose_tpu.forces.custom import (CustomAngleForce,
                                                CustomBondForce,
                                                CustomNonbondedForce,
                                                CustomTorsionForce)
from openmm_drudenose_tpu.io import pdbfile

F64 = jnp.float64

DECK = """<ForceField>
  <AtomTypes>
    <Type name="A1" class="CA" element="C" mass="12.011"/>
    <Type name="B1" class="CB" element="C" mass="12.011"/>
  </AtomTypes>
  <Residues>
    <Residue name="MOL">
      <Atom name="C1" type="A1" charge="0.0"/>
      <Atom name="C2" type="B1" charge="0.0"/>
      <Atom name="C3" type="B1" charge="0.0"/>
      <Atom name="C4" type="A1" charge="0.0"/>
      <Bond atomName1="C1" atomName2="C2"/>
      <Bond atomName1="C2" atomName2="C3"/>
      <Bond atomName1="C3" atomName2="C4"/>
    </Residue>
  </Residues>
  <HarmonicBondForce>
    <Bond class1="CA" class2="CB" length="0.15" k="1000"/>
    <Bond class1="CB" class2="CB" length="0.15" k="1000"/>
  </HarmonicBondForce>
  <HarmonicAngleForce>
    <Angle class1="" class2="CB" class3="" angle="1.9" k="100"/>
  </HarmonicAngleForce>
  <CustomBondForce energy="D*(1-exp(-aa*(r-r0)))^2">
    <PerBondParameter name="D"/>
    <PerBondParameter name="aa"/>
    <PerBondParameter name="r0"/>
    <Bond class1="CA" class2="CB" D="300" aa="20" r0="0.15"/>
  </CustomBondForce>
  <CustomAngleForce energy="0.5*kq*(theta-th0)^2">
    <PerAngleParameter name="kq"/>
    <PerAngleParameter name="th0"/>
    <Angle class1="CA" class2="CB" class3="CB" kq="90" th0="1.8"/>
  </CustomAngleForce>
  <CustomTorsionForce energy="kt*(1+cos(np*theta-ph))">
    <PerTorsionParameter name="kt"/>
    <PerTorsionParameter name="np"/>
    <PerTorsionParameter name="ph"/>
    <Proper class1="CA" class2="CB" class3="CB" class4="CA"
            kt="5" np="2" ph="0.5"/>
  </CustomTorsionForce>
  <NonbondedForce coulomb14scale="1" lj14scale="1">
    <Atom type="A1" sigma="0.3" epsilon="0.2"/>
    <Atom type="B1" sigma="0.3" epsilon="0.2"/>
  </NonbondedForce>
  <CustomNonbondedForce energy="c1*c2/r^6" bondCutoff="2">
    <PerParticleParameter name="c"/>
    <Atom type="A1" c="0.002"/>
    <Atom type="B1" c="0.001"/>
  </CustomNonbondedForce>
</ForceField>
"""

POS = np.array([[0.00, 0.00, 0.00],
                [0.15, 0.00, 0.00],
                [0.20, 0.14, 0.00],
                [0.35, 0.15, 0.04]])


def _build(tmp_path):
    xml = tmp_path / "custom_deck.xml"
    xml.write_text(DECK)
    pdb_path = tmp_path / "mol.pdb"
    with open(pdb_path, "w") as f:
        f.write("CRYST1   30.000   30.000   30.000  90.00  90.00  90.00 "
                "P 1           1\n")
        for i, (name, p) in enumerate(zip("C1 C2 C3 C4".split(),
                                          POS * 10.0), start=1):
            f.write(f"ATOM  {i:5d} {name:<4.4s} MOL A   1    "
                    f"{p[0]:8.3f}{p[1]:8.3f}{p[2]:8.3f}  1.00  0.00\n")
        f.write("END\n")
    ff = ffmod.ForceField(str(xml))
    pdb = pdbfile.PDBFile(str(pdb_path))
    system = ff.createSystem(pdb.topology)
    return system


def _only(system, cls):
    fs = [f for f in system.getForces() if isinstance(f, cls)]
    assert len(fs) == 1, f"{cls.__name__}: {len(fs)} instances"
    return fs[0]


def test_general_custom_ingestion(tmp_path):
    system = _build(tmp_path)

    cb = _only(system, CustomBondForce)
    assert cb.getNumBonds() == 2                    # C1-C2, C3-C4 (CA-CB)
    assert cb.getEnergyFunction() == "D*(1-exp(-aa*(r-r0)))^2"
    for idx in range(2):
        assert cb.getBondParameters(idx)[2] == (300.0, 20.0, 0.15)

    ca = _only(system, CustomAngleForce)
    assert ca.getNumAngles() == 2                   # both CA-CB-CB angles

    ct = _only(system, CustomTorsionForce)
    assert ct.getNumTorsions() == 1
    assert ct.getTorsionParameters(0)[4] == (5.0, 2.0, 0.5)

    cn = _only(system, CustomNonbondedForce)
    assert cn.getNumParticles() == 4
    # bondCutoff=2 excludes d<=2 pairs: (0,1),(1,2),(2,3),(0,2),(1,3)
    excl = {tuple(sorted(cn.getExclusionParticles(i)))
            for i in range(cn.getNumExclusions())}
    assert excl == {(0, 1), (1, 2), (2, 3), (0, 2), (1, 3)}

    # energies against closed form at the PDB coordinates
    box = jnp.eye(3, dtype=F64) * 3.0
    pj = jnp.asarray(POS, F64)

    fn, prm = cb.compile(system, F64)
    r12 = np.linalg.norm(POS[0] - POS[1])
    r34 = np.linalg.norm(POS[2] - POS[3])
    ref = sum(300.0 * (1 - np.exp(-20.0 * (r - 0.15))) ** 2
              for r in (r12, r34))
    np.testing.assert_allclose(float(fn(prm, pj, box)), ref, rtol=1e-10)

    fn, prm = cn.compile(system, F64)
    r14 = np.linalg.norm(POS[0] - POS[3])
    np.testing.assert_allclose(float(fn(prm, pj, box)),
                               0.002 * 0.002 / r14 ** 6, rtol=1e-10)


def test_custom_system_xml_round_trip(tmp_path):
    system = _build(tmp_path)
    xml = serialize_system(system)
    system2 = deserialize_system(xml)
    box = jnp.eye(3, dtype=F64) * 3.0
    pj = jnp.asarray(POS, F64)
    for cls in (CustomBondForce, CustomAngleForce, CustomTorsionForce,
                CustomNonbondedForce):
        f1 = _only(system, cls)
        f2 = _only(system2, cls)
        fn1, p1 = f1.compile(system, F64)
        fn2, p2 = f2.compile(system2, F64)
        e1 = float(fn1(p1, pj, box))
        e2 = float(fn2(p2, pj, box))
        np.testing.assert_allclose(e2, e1, rtol=1e-12, err_msg=cls.__name__)


def test_bad_custom_expression_raises(tmp_path):
    bad = DECK.replace("D*(1-exp(-aa*(r-r0)))^2",
                       "D*notafunction(r-r0)")
    xml = tmp_path / "bad.xml"
    xml.write_text(bad)
    with pytest.raises(ffmod.ForceFieldError):
        ffmod.ForceField(str(xml))
