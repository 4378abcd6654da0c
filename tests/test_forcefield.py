"""ForceField XML ingestion (app/forcefield.py): the reference workflow's
actual entry path — ForceField(xml) + Modeller.addExtraParticles +
createSystem (/root/reference/example/nacl_tg.py:37-42) — validated against
the hand-built io/nacl.py system for identical parameters.

tests/data/swm4_nacl.xml carries the same published SWM4-NDP / Yu-2010 ion
parameters io/nacl.py builds in code, expressed in OpenMM's ffxml layout
(residue-carried charges, zero-mass Drudes, LennardJonesForce + NBFixPair),
so the two ingestion paths must produce equivalent Systems."""

import math
import os

import numpy as np
import pytest

import openmm_drudenose_tpu as dn
from openmm_drudenose_tpu.app import forcefield as ffmod
from openmm_drudenose_tpu.io import nacl, pdbfile
from openmm_drudenose_tpu.io.builders import SWM4_M_W1, SWM4_M_W23

DATA = os.path.join(os.path.dirname(__file__), "data")

D_OH, D_HH = 0.09572, 0.15139
NBFIX_SIGMA, NBFIX_EPS = 0.31, 0.20
NBTHOLE_A = 2.6


def _rotation(rng):
    """Uniform random rotation matrix (quaternion method)."""
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]])


def _water_sites(origin, rot):
    """O, H1, H2, OM (vsite position), DOH2 (at O) in nm, randomly rotated
    (a regular grid of identically-oriented molecules puts pairs exactly at
    half-box separations — the minimum-image cusp — where gradients are
    ill-conditioned)."""
    z = math.sqrt(D_OH**2 - (D_HH / 2) ** 2)
    o = np.asarray(origin)
    h1 = o + rot @ np.array([D_HH / 2, 0.0, z])
    h2 = o + rot @ np.array([-D_HH / 2, 0.0, z])
    om = SWM4_M_W1 * o + SWM4_M_W23 * h1 + SWM4_M_W23 * h2
    return [o, h1, h2, om, o.copy()]


def _write_pdb(path, entries, box):
    """entries: list of (res_name, [(atom_name, xyz_nm)])"""
    with open(path, "w") as f:
        b = np.asarray(box) * 10.0
        f.write(f"CRYST1{b[0]:9.3f}{b[1]:9.3f}{b[2]:9.3f}"
                f"  90.00  90.00  90.00 P 1           1\n")
        serial = 0
        for seq, (res, atoms) in enumerate(entries, start=1):
            for (name, xyz) in atoms:
                serial += 1
                p = np.asarray(xyz) * 10.0
                f.write(f"ATOM  {serial:5d} {name:<4.4s} {res:<4.4s}A"
                        f"{seq:4d}    {p[0]:8.3f}{p[1]:8.3f}{p[2]:8.3f}"
                        f"  1.00  0.00\n")
        f.write("END\n")


def _make_nacl_files(tmp_path, n_side=2):
    """Small SWM4 water grid + one Na + one Cl; returns (pos_pdb, bare_pdb)."""
    box = np.array([2.4, 2.4, 2.4])
    entries_pos, entries_bare = [], []
    rng = np.random.default_rng(7)
    spacing = box[0] / n_side
    pts = [(i + 0.5) * spacing for i in range(n_side)]
    sites = []
    for x in pts:
        for y in pts:
            for zz in pts:
                sites.append(np.array([x, y, zz])
                             + rng.uniform(-0.04, 0.04, 3))
    for o in sites[:-2]:
        w = _water_sites(o, _rotation(rng))
        names = ["OH2", "H1", "H2", "OM", "DOH2"]
        entries_pos.append(("HOH", list(zip(names, w))))
        entries_bare.append(("HOH", list(zip(names[:3], w[:3]))))
    na, cl = sites[-2], sites[-1]
    entries_pos.append(("SOD", [("SOD", na), ("DSOD", na.copy())]))
    entries_bare.append(("SOD", [("SOD", na)]))
    entries_pos.append(("CLA", [("CLA", cl), ("DCLA", cl.copy())]))
    entries_bare.append(("CLA", [("CLA", cl)]))
    pos_pdb = str(tmp_path / "nacl_pos.pdb")
    bare_pdb = str(tmp_path / "nacl.pdb")
    _write_pdb(pos_pdb, entries_pos, box)
    _write_pdb(bare_pdb, entries_bare, box)
    return pos_pdb, bare_pdb


def _repartition(system, topology):
    """The reference example's hand mass repartition
    (example/nacl_tg.py:49-53)."""
    for i, a in enumerate(topology.atoms):
        if system.getParticleMass(i) > 1.1:
            system.setParticleMass(i, system.getParticleMass(i) - 0.4)
        if a.name[0] == "D":
            system.setParticleMass(i, 0.4)


def _ff_system(bare_pdb, cutoff=0.9):
    ff = ffmod.ForceField(os.path.join(DATA, "swm4_nacl.xml"))
    pdb = pdbfile.PDBFile(bare_pdb)
    modeller = ffmod.Modeller(pdb.topology, pdb.positions)
    modeller.addExtraParticles(ff)
    system = ff.createSystem(modeller.topology, nonbondedMethod=ffmod.PME,
                             nonbondedCutoff=cutoff, constraints=ffmod.HBonds,
                             rigidWater=True)
    _repartition(system, modeller.topology)
    return system, modeller


def _hand_system(pos_pdb, cutoff=0.9):
    rmin_a = NBFIX_SIGMA * 2 ** (1 / 6) / 0.1
    eps_kcal = NBFIX_EPS / 4.184
    system, positions, top = nacl.load_nacl_swm4(
        pos_pdb, cutoff=cutoff,
        nbfix={("SOD", "CLA"): (rmin_a, eps_kcal)},
        nbthole={("SOD", "CLA"): NBTHOLE_A})
    return system, positions, top


def _force_of(system, cls):
    return [f for f in system.getForces() if isinstance(f, cls)][0]


def test_ff_system_matches_hand_built(tmp_path):
    pos_pdb, bare_pdb = _make_nacl_files(tmp_path)
    sys_h, positions, _ = _hand_system(pos_pdb)
    sys_f, modeller = _ff_system(bare_pdb)

    n = sys_h.getNumParticles()
    assert sys_f.getNumParticles() == n
    for i in range(n):
        assert sys_f.getParticleMass(i) == pytest.approx(
            sys_h.getParticleMass(i), abs=1e-12)

    # constraints as sets
    con_h = {(*sorted(sys_h.getConstraintParameters(i)[:2]),
              round(sys_h.getConstraintParameters(i)[2], 9))
             for i in range(sys_h.getNumConstraints())}
    con_f = {(*sorted(sys_f.getConstraintParameters(i)[:2]),
              round(sys_f.getConstraintParameters(i)[2], 9))
             for i in range(sys_f.getNumConstraints())}
    assert con_f == con_h

    # virtual sites
    for i in range(n):
        assert sys_f.isVirtualSite(i) == sys_h.isVirtualSite(i)
        if sys_f.isVirtualSite(i):
            vf, vh = sys_f.getVirtualSite(i), sys_h.getVirtualSite(i)
            assert vf.particles == vh.particles
            np.testing.assert_allclose(vf.weights, vh.weights, atol=1e-9)

    # nonbonded per-particle parameters
    nb_h = _force_of(sys_h, dn.NonbondedForce)
    nb_f = _force_of(sys_f, dn.NonbondedForce)
    for i in range(n):
        qh, sh, eh = nb_h.getParticleParameters(i)
        qf, sf, ef = nb_f.getParticleParameters(i)
        assert qf == pytest.approx(qh, abs=1e-9)
        assert ef == pytest.approx(eh, abs=1e-9)
        if eh:  # sigma of eps=0 placeholders is arbitrary
            assert sf == pytest.approx(sh, abs=1e-9)

    # exclusions as sets (all zero-charge-product here)
    exc_h = {tuple(sorted(nb_h.getExceptionParameters(i)[:2]))
             for i in range(nb_h.getNumExceptions())}
    exc_f = {tuple(sorted(nb_f.getExceptionParameters(i)[:2]))
             for i in range(nb_f.getNumExceptions())}
    assert exc_f == exc_h

    # drude rows
    dr_h = _force_of(sys_h, dn.DrudeForce)
    dr_f = _force_of(sys_f, dn.DrudeForce)
    assert dr_f.getNumParticles() == dr_h.getNumParticles()
    for i in range(dr_h.getNumParticles()):
        ph, pf = dr_h.getParticleParameters(i), dr_f.getParticleParameters(i)
        assert pf[:5] == ph[:5]
        np.testing.assert_allclose(pf[5:], ph[5:], atol=1e-9)
    assert dr_f._nbthole == dr_h._nbthole


def test_ff_energy_matches_hand_built(tmp_path):
    pos_pdb, bare_pdb = _make_nacl_files(tmp_path)
    sys_h, positions, _ = _hand_system(pos_pdb)
    sys_f, _ = _ff_system(bare_pdb)

    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.005, 0.001, 20, 1)
    states = []
    for system in (sys_h, sys_f):
        ctx = dn.Context(system, integ, precision="double")
        ctx.setPositions(positions)
        st = ctx.getState(energy=True, forces=True)
        states.append(st)
    e_h, e_f = (s.getPotentialEnergy() for s in states)
    assert e_f == pytest.approx(e_h, rel=1e-10)
    np.testing.assert_allclose(states[1].getForces(), states[0].getForces(),
                               rtol=1e-8, atol=1e-8)


def test_modeller_places_extra_particles(tmp_path):
    _, bare_pdb = _make_nacl_files(tmp_path)
    ff = ffmod.ForceField(os.path.join(DATA, "swm4_nacl.xml"))
    pdb = pdbfile.PDBFile(bare_pdb)
    modeller = ffmod.Modeller(pdb.topology, pdb.positions)
    n_bare = len(pdb.topology.atoms)
    modeller.addExtraParticles(ff)
    atoms = modeller.topology.atoms
    assert len(atoms) > n_bare
    # first water: OH2 H1 H2 OM DOH2 in template order
    names = [a.name for a in atoms[:5]]
    assert names == ["OH2", "H1", "H2", "OM", "DOH2"]
    pos = modeller.positions
    np.testing.assert_allclose(pos[4], pos[0], atol=1e-12)  # Drude at parent
    om = SWM4_M_W1 * pos[0] + SWM4_M_W23 * pos[1] + SWM4_M_W23 * pos[2]
    np.testing.assert_allclose(pos[3], om, atol=1e-12)
    # box flowed through
    assert getattr(modeller.topology, "box", None) is not None


def test_chain_bonded_terms_and_14_scaling():
    ff = ffmod.ForceField(os.path.join(DATA, "chain.xml"))
    atoms = [pdbfile.PDBAtom(i + 1, f"A{i + 1}", "BUT", "A", 1, "C")
             for i in range(4)]
    top = pdbfile.PDBTopology(atoms)
    system = ff.createSystem(top, nonbondedMethod=ffmod.NoCutoff,
                             constraints=None, removeCMMotion=False)

    # hand-built equivalent
    sys_m = dn.System()
    for _ in range(4):
        sys_m.addParticle(12.011)
    hb = dn.HarmonicBondForce()
    hb.addBond(0, 1, 0.153, 180000.0)
    hb.addBond(1, 2, 0.150, 160000.0)
    hb.addBond(2, 3, 0.153, 180000.0)
    hb.addBond(0, 2, 0.255, 5000.0)   # Urey-Bradley 1-3 springs
    hb.addBond(1, 3, 0.255, 5000.0)
    ha = dn.HarmonicAngleForce()
    ha.addAngle(0, 1, 2, 1.911, 400.0)
    ha.addAngle(1, 2, 3, 1.911, 400.0)
    tor = dn.PeriodicTorsionForce()
    tor.addTorsion(0, 1, 2, 3, 3, 0.0, 0.6)
    tor.addTorsion(0, 1, 2, 3, 1, math.pi, 0.2)
    nb = dn.NonbondedForce()
    q = [-0.27, 0.27, 0.27, -0.27]
    sig = [0.35, 0.39, 0.39, 0.35]
    eps = [0.28, 0.23, 0.23, 0.28]
    for i in range(4):
        nb.addParticle(q[i], sig[i], eps[i])
    for (i, j) in [(0, 1), (1, 2), (2, 3), (0, 2), (1, 3)]:
        nb.addException(i, j, 0.0, 1.0, 0.0)
    nb.addException(0, 3, q[0] * q[3] * 0.5, 0.35,
                    math.sqrt(eps[0] * eps[3]) * 0.4)
    for f in (nb, hb, ha, tor):
        sys_m.addForce(f)

    rng = np.random.default_rng(3)
    pos = np.array([[0.0, 0.0, 0.0], [0.15, 0.02, 0.01],
                    [0.22, 0.15, -0.03], [0.36, 0.18, 0.09]])
    pos += rng.normal(0, 0.003, pos.shape)
    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.005, 0.001, 20, 1)
    energies, forces = [], []
    for system_i in (system, sys_m):
        # no Drude force here: add a floating Drude-less system is not
        # supported by the integrator, so compare via raw force compilation
        from openmm_drudenose_tpu.core import spec as spec_mod
        import jax.numpy as jnp
        import jax
        fns = []
        e_total = 0.0
        f_total = np.zeros((4, 3))
        for f in system_i.getForces():
            compiled = f.compile(system_i, jnp.float64)
            if isinstance(compiled, tuple):
                energy, params = compiled
            else:
                continue
            if energy is None:
                continue
            box = jnp.asarray(np.diag([4.0, 4.0, 4.0]))
            e_fn = lambda p, _e=energy, _p=params: _e(_p, p, box)
            e_total += float(e_fn(jnp.asarray(pos)))
            f_total -= np.asarray(jax.grad(e_fn)(jnp.asarray(pos)))
        energies.append(e_total)
        forces.append(f_total)
    assert energies[0] == pytest.approx(energies[1], rel=1e-12)
    np.testing.assert_allclose(forces[0], forces[1], rtol=1e-9, atol=1e-12)


def test_unsupported_tag_raises(tmp_path):
    bad = tmp_path / "bad.xml"
    bad.write_text("<ForceField><MysteryForce/></ForceField>")
    with pytest.raises(ffmod.ForceFieldError, match="MysteryForce"):
        ffmod.ForceField(str(bad))


def test_missing_template_raises(tmp_path):
    ff = ffmod.ForceField(os.path.join(DATA, "swm4_nacl.xml"))
    with pytest.raises(ffmod.ForceFieldError, match="no residue template"):
        ff.match_template("XYZ", ["Q1", "Q2"])


def _write_pdb_elems(path, entries, box):
    """entries: (res_name, [(atom_name, element, xyz_nm)]) — writes the
    element column (cols 77-78), which the renamed-atom fallback needs."""
    with open(path, "w") as f:
        b = np.asarray(box) * 10.0
        f.write(f"CRYST1{b[0]:9.3f}{b[1]:9.3f}{b[2]:9.3f}"
                f"  90.00  90.00  90.00 P 1           1\n")
        serial = 0
        for seq, (res, atoms) in enumerate(entries, start=1):
            for (name, elem, xyz) in atoms:
                serial += 1
                p = np.asarray(xyz) * 10.0
                f.write(f"ATOM  {serial:5d} {name:<4.4s} {res:<4.4s}A"
                        f"{seq:4d}    {p[0]:8.3f}{p[1]:8.3f}{p[2]:8.3f}"
                        f"  1.00  0.00          {elem:>2.2s}\n")
        f.write("END\n")


def test_patched_residue_ingestion(tmp_path):
    """A <Patches> patch (hydroxide-like: strip H2 + M site, change the O
    charge) applied automatically when a residue matches no unpatched
    template — VERDICT round-2 item 6."""
    ff = ffmod.ForceField(os.path.join(DATA, "swm4_nacl.xml"),
                          os.path.join(DATA, "hoh_patch.xml"))
    box = np.array([2.4, 2.4, 2.4])
    rng = np.random.default_rng(11)
    entries = []
    centers = [np.array([0.6, 0.6, 0.6]), np.array([1.6, 1.0, 1.0]),
               np.array([1.0, 1.7, 1.6])]
    for o in centers[:2]:
        w = _water_sites(o, _rotation(rng))
        entries.append(("HOH", list(zip(["OH2", "H1", "H2"], w[:3]))))
    # the patched residue: water missing H2 (and OM/DOH2 as usual)
    w = _water_sites(centers[2], _rotation(rng))
    entries.append(("HOH", list(zip(["OH2", "H1"], w[:2]))))
    pdb_path = str(tmp_path / "patched.pdb")
    _write_pdb(pdb_path, entries, box)

    pdb = pdbfile.PDBFile(pdb_path)
    modeller = ffmod.Modeller(pdb.topology, pdb.positions)
    modeller.addExtraParticles(ff)
    # patched residue gained only its Drude: 2 waters x 5 + 1 OH x 3
    assert len(modeller.topology.atoms) == 13
    system = ff.createSystem(modeller.topology, nonbondedMethod=ffmod.PME,
                             nonbondedCutoff=0.9, constraints=ffmod.HBonds,
                             rigidWater=True)
    nb = _force_of(system, dn.NonbondedForce)
    # patched O carries the ChangeAtom charge; its Drude still attaches
    q_o = nb.getParticleParameters(10)[0]
    assert q_o == pytest.approx(1.2)
    dr = _force_of(system, dn.DrudeForce)
    assert dr.getNumParticles() == 3
    # full waters keep 3 rigid constraints each; the OH residue gets the
    # single O-H bond constrained by HBonds
    assert system.getNumConstraints() == 7


def test_renamed_atom_pdb_graph_matching(tmp_path):
    """A PDB whose water atoms carry non-template names must ingest via
    the bond-graph fallback and produce the identical System as the
    properly-named input — VERDICT round-2 item 6."""
    ff = ffmod.ForceField(os.path.join(DATA, "swm4_nacl.xml"))
    box = np.array([2.4, 2.4, 2.4])
    rng = np.random.default_rng(5)
    centers = [np.array([0.6, 0.6, 0.6]), np.array([1.6, 1.0, 1.0]),
               np.array([1.1, 1.7, 1.6])]
    good, renamed = [], []
    for o in centers:
        w = _water_sites(o, _rotation(rng))
        good.append(("HOH", [(n, e, x) for (n, e), x in
                             zip([("OH2", "O"), ("H1", "H"), ("H2", "H")],
                                 w[:3])]))
        renamed.append(("WAT", [(n, e, x) for (n, e), x in
                                zip([("OW1", "O"), ("HA", "H"),
                                     ("HB", "H")], w[:3])]))
    p_good = str(tmp_path / "good.pdb")
    p_ren = str(tmp_path / "renamed.pdb")
    _write_pdb_elems(p_good, good, box)
    _write_pdb_elems(p_ren, renamed, box)

    systems = []
    for path in (p_good, p_ren):
        pdb = pdbfile.PDBFile(path)
        modeller = ffmod.Modeller(pdb.topology, pdb.positions)
        modeller.addExtraParticles(ff)
        systems.append(ff.createSystem(
            modeller.topology, nonbondedMethod=ffmod.PME,
            nonbondedCutoff=0.9, constraints=ffmod.HBonds, rigidWater=True))
    xml0 = dn.XmlSerializer.serialize(systems[0])
    xml1 = dn.XmlSerializer.serialize(systems[1])
    assert xml0 == xml1


def test_renamed_without_positions_raises():
    ff = ffmod.ForceField(os.path.join(DATA, "swm4_nacl.xml"))
    with pytest.raises(ffmod.ForceFieldError, match="positions unavailable"):
        ff.match_residue("WAT", ["OW1", "HA", "HB"], ["O", "H", "H"], None)


def _custom_nb_xml(tmp_path, variant=False):
    """swm4_nacl.xml with <LennardJonesForce> re-encoded as the
    charmm_polar_2013.xml-style CustomNonbondedForce: a Discrete2D
    acoef/bcoef table indexed by a per-particle 'type' parameter, atoms
    keyed by class (the stock file's structure — the reference's own
    comment says its LJ lives there, /root/reference/example/nacl_tg.py:44).
    The NBFixPair becomes an off-diagonal table deviation.

    ``variant=True`` emits a near-stock spelling — renamed parameter
    ('ljt') and functions ('aa'/'bb'), reversed term order, one reversed
    argument order — that the round-5 expression normalizer must accept
    (VERDICT round-4 item 7)."""
    import xml.etree.ElementTree as ET
    tree = ET.parse(os.path.join(DATA, "swm4_nacl.xml"))
    root = tree.getroot()
    lj = root.find("LennardJonesForce")
    per = {a.get("class"): (float(a.get("sigma")), float(a.get("epsilon")))
           for a in lj if a.tag == "Atom"}
    nbfix = [(p.get("class1"), p.get("class2"), float(p.get("sigma")),
              float(p.get("epsilon"))) for p in lj if p.tag == "NBFixPair"]
    classes = sorted(per)
    n = len(classes)
    idx = {c: i for i, c in enumerate(classes)}
    A = np.zeros((n, n))
    B = np.zeros((n, n))
    for c1 in classes:
        for c2 in classes:
            s = 0.5 * (per[c1][0] + per[c2][0])
            e = math.sqrt(per[c1][1] * per[c2][1])
            A[idx[c1], idx[c2]] = 4 * e * s ** 12
            B[idx[c1], idx[c2]] = 4 * e * s ** 6
    for c1, c2, s, e in nbfix:
        for i, j in ((idx[c1], idx[c2]), (idx[c2], idx[c1])):
            A[i, j] = 4 * e * s ** 12
            B[i, j] = 4 * e * s ** 6
    root.remove(lj)
    if variant:
        energy = "- bb(ljt1, ljt2)/r^6 + aa(ljt2, ljt1)/r^12 ;"
        pname, a_name, b_name = "ljt", "aa", "bb"
    else:
        energy = "acoef(type1, type2)/r^12 - bcoef(type1, type2)/r^6;"
        pname, a_name, b_name = "type", "acoef", "bcoef"
    cnb = ET.SubElement(root, "CustomNonbondedForce", attrib={
        "energy": energy, "bondCutoff": "2"})
    ET.SubElement(cnb, "PerParticleParameter", name=pname)
    for name, M in ((a_name, A), (b_name, B)):
        f = ET.SubElement(cnb, "Function", attrib={
            "name": name, "type": "Discrete2D",
            "xsize": str(n), "ysize": str(n)})
        # Discrete2D ordering: x varies fastest -> values[y*n + x] = M[x,y]
        f.text = " ".join(repr(float(v)) for v in M.T.reshape(-1))
    for c in classes:
        ET.SubElement(cnb, "Atom", attrib={"class": c,
                                           pname: str(idx[c])})
    out = str(tmp_path / "swm4_custom.xml")
    tree.write(out)
    return out


@pytest.mark.parametrize("variant", [False, True],
                         ids=["stock", "normalized"])
def test_custom_nonbonded_lj_matches_lennard_jones(tmp_path, variant):
    """VERDICT round-3 item 6: the stock charmm_polar_2013.xml
    CustomNonbondedForce LJ encoding ingests and produces a System
    identical to the LennardJonesForce path (per-atom sigma/epsilon AND
    the NBFIX override).  The 'normalized' variant spells the same
    physics with renamed parameter/function names, reversed term order
    and one reversed argument order (round-5 normalizer, VERDICT item 7)."""
    pos_pdb, bare_pdb = _make_nacl_files(tmp_path)
    sys_lj, mod_lj = _ff_system(bare_pdb)

    ff = ffmod.ForceField(_custom_nb_xml(tmp_path, variant=variant))
    pdb = pdbfile.PDBFile(bare_pdb)
    modeller = ffmod.Modeller(pdb.topology, pdb.positions)
    modeller.addExtraParticles(ff)
    sys_c = ff.createSystem(modeller.topology, nonbondedMethod=ffmod.PME,
                            nonbondedCutoff=0.9, constraints=ffmod.HBonds,
                            rigidWater=True)
    _repartition(sys_c, modeller.topology)

    nb_lj = _force_of(sys_lj, dn.NonbondedForce)
    nb_c = _force_of(sys_c, dn.NonbondedForce)
    assert nb_c.getNumParticles() == nb_lj.getNumParticles()
    for i in range(nb_lj.getNumParticles()):
        q1, s1, e1 = nb_lj.getParticleParameters(i)
        q2, s2, e2 = nb_c.getParticleParameters(i)
        assert q1 == pytest.approx(q2, abs=1e-12)
        assert e1 == pytest.approx(e2, rel=1e-9, abs=1e-12)
        if e1 > 0:
            assert s1 == pytest.approx(s2, rel=1e-9)

    def norm_overrides(nb):
        return sorted(
            tuple(sorted([tuple(sorted(o[0])), tuple(sorted(o[1]))]))
            + (round(o[2], 9), round(o[3], 9))
            for o in nb._lj_overrides)
    assert norm_overrides(nb_c) == norm_overrides(nb_lj)
    assert len(nb_c._lj_overrides) == 1


def test_custom_nonbonded_undeclared_names_raise(tmp_path):
    # a non-tabulated-LJ shape now falls through to the GENERAL
    # expression-compiled CustomNonbondedForce (round-5 Custom*Force
    # support); undeclared parameter names still fail fast at parse time
    import xml.etree.ElementTree as ET
    tree = ET.parse(os.path.join(DATA, "swm4_nacl.xml"))
    root = tree.getroot()
    root.remove(root.find("LennardJonesForce"))
    cnb = ET.SubElement(root, "CustomNonbondedForce",
                        attrib={"energy": "k*exp(-r/rho)"})
    ET.SubElement(cnb, "PerParticleParameter", name="type")
    out = str(tmp_path / "bad_custom.xml")
    tree.write(out)
    with pytest.raises(ffmod.ForceFieldError, match="unknown name"):
        ffmod.ForceField(out)


def test_patch_stack_ingestion(tmp_path):
    """Two patches stacked on one residue (OpenMM tries patch stacks —
    VERDICT round-3 item 9): a bare-oxygen residue matches only the
    OHM (strip H2 + M site) + DEH1 (strip H1) combination; both
    application orders produce the same structure and deduplicate."""
    ff = ffmod.ForceField(os.path.join(DATA, "swm4_nacl.xml"),
                          os.path.join(DATA, "hoh_patch.xml"),
                          os.path.join(DATA, "hoh_patch2.xml"))
    box = np.array([2.4, 2.4, 2.4])
    rng = np.random.default_rng(13)
    entries = []
    centers = [np.array([0.6, 0.6, 0.6]), np.array([1.6, 1.0, 1.0]),
               np.array([1.0, 1.7, 1.6])]
    for o in centers[:2]:
        w = _water_sites(o, _rotation(rng))
        entries.append(("HOH", list(zip(["OH2", "H1", "H2"], w[:3]))))
    entries.append(("HOH", [("OH2", centers[2])]))
    pdb_path = str(tmp_path / "stacked.pdb")
    _write_pdb(pdb_path, entries, box)

    pdb = pdbfile.PDBFile(pdb_path)
    modeller = ffmod.Modeller(pdb.topology, pdb.positions)
    modeller.addExtraParticles(ff)
    # bare O gains only its Drude: 2 x 5 + 2
    assert len(modeller.topology.atoms) == 12
    system = ff.createSystem(modeller.topology, nonbondedMethod=ffmod.PME,
                             nonbondedCutoff=0.9, constraints=ffmod.HBonds,
                             rigidWater=True)
    nb = _force_of(system, dn.NonbondedForce)
    # the stacked O carries OHM's ChangeAtom charge regardless of order
    assert nb.getParticleParameters(10)[0] == pytest.approx(1.2)
    dr = _force_of(system, dn.DrudeForce)
    assert dr.getNumParticles() == 3
    assert system.getNumConstraints() == 6


_DISU_XML = """<?xml version="1.0" encoding="utf-8"?>
<ForceField>
  <AtomTypes>
    <Type name="tC" class="CT" element="C" mass="12.011"/>
    <Type name="tS" class="ST" element="S" mass="32.06"/>
    <Type name="tSS" class="SS" element="S" mass="32.06"/>
    <Type name="tH" class="HT" element="H" mass="1.008"/>
  </AtomTypes>
  <Residues>
    <Residue name="THL">
      <Atom name="C1" type="tC" charge="0.0"/>
      <Atom name="S1" type="tS" charge="-0.1"/>
      <Atom name="HS1" type="tH" charge="0.1"/>
      <Bond atomName1="C1" atomName2="S1"/>
      <Bond atomName1="S1" atomName2="HS1"/>
      <AllowPatch name="DISU"/>
    </Residue>
  </Residues>
  <Patches>
    <Patch name="DISU" residues="2">
      <RemoveAtom name="1:HS1"/>
      <RemoveAtom name="2:HS1"/>
      <ChangeAtom name="1:S1" type="tSS" charge="-0.05"/>
      <ChangeAtom name="2:S1" type="tSS" charge="-0.05"/>
      <AddBond atomName1="1:S1" atomName2="2:S1"/>
    </Patch>
  </Patches>
  <HarmonicBondForce>
    <Bond class1="CT" class2="ST" length="0.18" k="200000"/>
    <Bond class1="ST" class2="HT" length="0.135" k="250000"/>
    <Bond class1="CT" class2="SS" length="0.18" k="200000"/>
    <Bond class1="SS" class2="SS" length="0.204" k="150000"/>
  </HarmonicBondForce>
  <HarmonicAngleForce>
    <Angle class1="CT" class2="ST" class3="HT" angle="1.65" k="300"/>
    <Angle class1="CT" class2="SS" class3="SS" angle="1.78" k="350"/>
  </HarmonicAngleForce>
  <NonbondedForce coulomb14scale="1.0" lj14scale="1.0">
    <Atom type="tC" charge="0.0" sigma="0.35" epsilon="0.3"/>
    <Atom type="tS" charge="-0.1" sigma="0.36" epsilon="0.4"/>
    <Atom type="tSS" charge="-0.05" sigma="0.36" epsilon="0.4"/>
    <Atom type="tH" charge="0.1" sigma="0.2" epsilon="0.1"/>
  </NonbondedForce>
</ForceField>
"""


def _thl_topology(n_residues):
    atoms = []
    serial = 1
    for r in range(n_residues):
        for nm, el in (("C1", "C"), ("S1", "S")):
            atoms.append(pdbfile.PDBAtom(serial, nm, "THL", "A", r + 1, el))
            serial += 1
    return pdbfile.PDBTopology(atoms)


def test_two_residue_patch_single_pair(tmp_path):
    """A residues="2" (disulfide-class) patch: two bare THL residues
    match the patch parts and gain the cross-residue S-S bond."""
    out = tmp_path / "disu.xml"
    out.write_text(_DISU_XML)
    ff = ffmod.ForceField(str(out))
    system = ff.createSystem(_thl_topology(2), nonbondedMethod=ffmod.NoCutoff,
                             constraints=None, removeCMMotion=False)
    assert system.getNumParticles() == 4
    hb = _force_of(system, dn.HarmonicBondForce)
    bonds = {tuple(sorted(hb.getBondParameters(i)[:2]))
             for i in range(hb.getNumBonds())}
    assert (1, 3) in bonds            # the cross S-S bond
    ss = [hb.getBondParameters(i) for i in range(hb.getNumBonds())
          if tuple(sorted(hb.getBondParameters(i)[:2])) == (1, 3)][0]
    assert ss[2] == pytest.approx(0.204) and ss[3] == pytest.approx(150000.0)
    ha = _force_of(system, dn.HarmonicAngleForce)
    # C1-S1-S2 on both sides of the bridge
    angles = {tuple(ha.getAngleParameters(i)[:3])
              for i in range(ha.getNumAngles())}
    assert len(angles) == 2
    nb = _force_of(system, dn.NonbondedForce)
    assert nb.getParticleParameters(1)[0] == pytest.approx(-0.05)
    # exclusions span the bridge: S1-S2 bonded (1-2), C1-S2 1-3, C1-C2 1-4
    exc = {tuple(sorted(nb.getExceptionParameters(i)[:2]))
           for i in range(nb.getNumExceptions())}
    assert {(1, 3), (0, 3), (0, 2)} <= exc


def test_two_residue_patch_distance_pairing(tmp_path):
    """Four patched residues pair by nearest cross-bond-atom distance."""
    out = tmp_path / "disu.xml"
    out.write_text(_DISU_XML)
    ff = ffmod.ForceField(str(out))
    # S atoms at indices 1, 3, 5, 7; place so pairs are (0, 3) and (1, 2)
    pos = np.array([
        [0.0, 0.0, 0.0], [0.2, 0.0, 0.0],     # res 0: S near x=0.2
        [2.0, 0.0, 0.0], [1.8, 0.0, 0.0],     # res 1: S near x=1.8
        [1.4, 0.0, 0.0], [1.6, 0.0, 0.0],     # res 2: S near x=1.6
        [0.6, 0.0, 0.0], [0.4, 0.0, 0.0],     # res 3: S near x=0.4
    ])
    system = ff.createSystem(_thl_topology(4), nonbondedMethod=ffmod.NoCutoff,
                             constraints=None, removeCMMotion=False,
                             positions=pos)
    hb = _force_of(system, dn.HarmonicBondForce)
    bonds = {tuple(sorted(hb.getBondParameters(i)[:2]))
             for i in range(hb.getNumBonds())}
    assert (1, 7) in bonds and (3, 5) in bonds
    assert (1, 3) not in bonds and (5, 7) not in bonds


def test_two_residue_patch_odd_count_raises(tmp_path):
    out = tmp_path / "disu.xml"
    out.write_text(_DISU_XML)
    ff = ffmod.ForceField(str(out))
    with pytest.raises(ffmod.ForceFieldError, match="odd"):
        ff.createSystem(_thl_topology(3), nonbondedMethod=ffmod.NoCutoff,
                        constraints=None, removeCMMotion=False,
                        positions=np.zeros((6, 3)))


_TRI_XML = """<?xml version="1.0" encoding="utf-8"?>
<ForceField>
  <AtomTypes>
    <Type name="tC" class="CT" element="C" mass="12.011"/>
    <Type name="tS" class="ST" element="S" mass="32.06"/>
    <Type name="tSS" class="SS" element="S" mass="32.06"/>
    <Type name="tH" class="HT" element="H" mass="1.008"/>
  </AtomTypes>
  <Residues>
    <Residue name="RA">
      <Atom name="CA1" type="tC" charge="0.0"/>
      <Atom name="SA1" type="tS" charge="-0.1"/>
      <Atom name="HA1" type="tH" charge="0.1"/>
      <Bond atomName1="CA1" atomName2="SA1"/>
      <Bond atomName1="SA1" atomName2="HA1"/>
    </Residue>
    <Residue name="RB">
      <Atom name="CB1" type="tC" charge="0.0"/>
      <Atom name="SB1" type="tS" charge="-0.1"/>
      <Atom name="HB1" type="tH" charge="0.1"/>
      <Bond atomName1="CB1" atomName2="SB1"/>
      <Bond atomName1="SB1" atomName2="HB1"/>
    </Residue>
    <Residue name="RC">
      <Atom name="CC1" type="tC" charge="0.0"/>
      <Atom name="SC1" type="tS" charge="-0.1"/>
      <Atom name="HC1" type="tH" charge="0.1"/>
      <Bond atomName1="CC1" atomName2="SC1"/>
      <Bond atomName1="SC1" atomName2="HC1"/>
    </Residue>
  </Residues>
  <Patches>
    <Patch name="TRI" residues="3">
      <RemoveAtom name="1:HA1"/>
      <RemoveAtom name="2:HB1"/>
      <RemoveAtom name="3:HC1"/>
      <ChangeAtom name="1:SA1" type="tSS" charge="-0.05"/>
      <ChangeAtom name="2:SB1" type="tSS" charge="-0.05"/>
      <ChangeAtom name="3:SC1" type="tSS" charge="-0.05"/>
      <AddBond atomName1="1:SA1" atomName2="2:SB1"/>
      <AddBond atomName1="2:SB1" atomName2="3:SC1"/>
      <ApplyToResidue name="1:RA"/>
      <ApplyToResidue name="2:RB"/>
      <ApplyToResidue name="3:RC"/>
    </Patch>
  </Patches>
  <HarmonicBondForce>
    <Bond class1="CT" class2="ST" length="0.18" k="200000"/>
    <Bond class1="ST" class2="HT" length="0.135" k="250000"/>
    <Bond class1="CT" class2="SS" length="0.18" k="200000"/>
    <Bond class1="SS" class2="SS" length="0.204" k="150000"/>
  </HarmonicBondForce>
  <HarmonicAngleForce>
    <Angle class1="CT" class2="ST" class3="HT" angle="1.65" k="300"/>
    <Angle class1="CT" class2="SS" class3="SS" angle="1.78" k="350"/>
    <Angle class1="SS" class2="SS" class3="SS" angle="1.9" k="380"/>
  </HarmonicAngleForce>
  <NonbondedForce coulomb14scale="1.0" lj14scale="1.0">
    <Atom type="tC" charge="0.0" sigma="0.35" epsilon="0.3"/>
    <Atom type="tS" charge="-0.1" sigma="0.36" epsilon="0.4"/>
    <Atom type="tSS" charge="-0.05" sigma="0.36" epsilon="0.4"/>
    <Atom type="tH" charge="0.1" sigma="0.2" epsilon="0.1"/>
  </NonbondedForce>
</ForceField>
"""


def _tri_topology(n_groups):
    atoms = []
    serial = 1
    rid = 1
    for _ in range(n_groups):
        for res, (cn, sn) in (("RA", ("CA1", "SA1")),
                              ("RB", ("CB1", "SB1")),
                              ("RC", ("CC1", "SC1"))):
            atoms.append(pdbfile.PDBAtom(serial, cn, res, "A", rid, "C"))
            atoms.append(pdbfile.PDBAtom(serial + 1, sn, res, "A", rid, "S"))
            serial += 2
            rid += 1
    return pdbfile.PDBTopology(atoms)


def test_three_residue_patch_chain(tmp_path):
    """A residues="3" crosslink patch (VERDICT round-4 missing item 4):
    three distinct residues match the three parts and gain BOTH
    cross-residue bonds of the 1-2-3 chain."""
    out = tmp_path / "tri.xml"
    out.write_text(_TRI_XML)
    ff = ffmod.ForceField(str(out))
    system = ff.createSystem(_tri_topology(1), nonbondedMethod=ffmod.NoCutoff,
                             constraints=None, removeCMMotion=False)
    assert system.getNumParticles() == 6
    hb = _force_of(system, dn.HarmonicBondForce)
    bonds = {tuple(sorted(hb.getBondParameters(i)[:2]))
             for i in range(hb.getNumBonds())}
    # S atoms at 1 (RA), 3 (RB), 5 (RC): chain bonds 1-3 and 3-5
    assert (1, 3) in bonds and (3, 5) in bonds
    ss = [hb.getBondParameters(i) for i in range(hb.getNumBonds())
          if tuple(sorted(hb.getBondParameters(i)[:2])) == (1, 3)][0]
    assert ss[2] == pytest.approx(0.204) and ss[3] == pytest.approx(150000.0)
    # the hub angle S-S-S exists alongside both C-S-S arms
    ha = _force_of(system, dn.HarmonicAngleForce)
    angs = {tuple(ha.getAngleParameters(i)[:3])
            for i in range(ha.getNumAngles())}
    assert (1, 3, 5) in angs or (5, 3, 1) in angs
    nb = _force_of(system, dn.NonbondedForce)
    assert nb.getParticleParameters(1)[0] == pytest.approx(-0.05)
    # exclusions span both links: S-S 1-2s, C..S 1-3s, and the 1-3 pair
    # across the hub (SA1..SC1)
    exc = {tuple(sorted(nb.getExceptionParameters(i)[:2]))
           for i in range(nb.getNumExceptions())}
    assert {(1, 3), (3, 5), (1, 5)} <= exc


def test_three_residue_patch_distance_grouping(tmp_path):
    """Two triads group by nearest cross-bond-atom distance: the RA/RC of
    group 0 sit nearest the RB of 'group 1' in the topology order, so
    greedy grouping must cross the naive residue order."""
    out = tmp_path / "tri.xml"
    out.write_text(_TRI_XML)
    ff = ffmod.ForceField(str(out))
    # 6 residues = 12 atoms; S indices: RA0=1, RB0=3, RC0=5, RA1=7,
    # RB1=9, RC1=11.  Place RB1 next to RA0/RC0 and RB0 next to RA1/RC1.
    far = 10.0
    pos = np.zeros((12, 3))
    pos[0], pos[1] = [0.0, 0, 0], [0.2, 0, 0]        # RA0 (S at 0.2)
    pos[2], pos[3] = [far + 1.0, 0, 0], [far + 0.8, 0, 0]  # RB0 far
    pos[4], pos[5] = [0.8, 0, 0], [0.6, 0, 0]        # RC0 (S at 0.6)
    pos[6], pos[7] = [far + 0.0, 0, 0], [far + 0.2, 0, 0]  # RA1 far
    pos[8], pos[9] = [1.0, 0, 0], [0.4, 0, 0]        # RB1 near group 0
    pos[10], pos[11] = [far + 1.4, 0, 0], [far + 0.6, 0, 0]  # RC1 far
    system = ff.createSystem(_tri_topology(2), nonbondedMethod=ffmod.NoCutoff,
                             constraints=None, removeCMMotion=False,
                             positions=pos)
    hb = _force_of(system, dn.HarmonicBondForce)
    bonds = {tuple(sorted(hb.getBondParameters(i)[:2]))
             for i in range(hb.getNumBonds())}
    # group A: RA0-RB1-RC0 -> bonds (1,9) and (5,9)
    # group B: RA1-RB0-RC1 -> bonds (3,7) and (3,11)
    assert {(1, 9), (5, 9), (3, 7), (3, 11)} <= bonds
    assert (1, 3) not in bonds and (3, 5) not in bonds


def test_three_residue_patch_unequal_pools_raise(tmp_path):
    out = tmp_path / "tri.xml"
    out.write_text(_TRI_XML)
    ff = ffmod.ForceField(str(out))
    atoms = []
    serial = 1
    rid = 1
    for res, (cn, sn) in (("RA", ("CA1", "SA1")), ("RB", ("CB1", "SB1"))):
        atoms.append(pdbfile.PDBAtom(serial, cn, res, "A", rid, "C"))
        atoms.append(pdbfile.PDBAtom(serial + 1, sn, res, "A", rid, "S"))
        serial += 2
        rid += 1
    topo = pdbfile.PDBTopology(atoms)
    with pytest.raises(ffmod.ForceFieldError):
        ff.createSystem(topo, nonbondedMethod=ffmod.NoCutoff,
                        constraints=None, removeCMMotion=False,
                        positions=np.zeros((4, 3)))
