"""XML (de)serialization of System / DrudeTGNHIntegrator + pytree
checkpoints.

The reference proxy (serialization/src/DrudeTGNHIntegratorProxy.cpp:43-66)
serializes 9 scalar fields and silently DROPS temp groups, particle
assignments, maxDrudeDistance and useCOMTempGroup (lossy round trip,
SURVEY.md section 2.4) — and the NH chain state is lost entirely on
checkpoint (section 5).  Both are fixed here:

  * integrator XML carries every field including the group assignments
  * checkpoints dump the full SimState pytree (positions, velocities,
    forces, box, NH chain state, barostat state, PRNG key), so resume is
    bit-exact

The reference workflow also relies on the host OpenMM's
``XmlSerializer::serialize<System>`` (the plugin's serialization layer's
host side) so a Context is reconstructible from files alone; the
equivalent here is serialize_system/deserialize_system (every particle,
constraint, virtual site, and force — incl. the NBFIX/NBTHOLE tables
OpenMM keeps in separate force objects), plus the OpenMM-shaped
``XmlSerializer`` facade that dispatches on document type.
"""

from __future__ import annotations

import io
import xml.etree.ElementTree as ET

import jax
import jax.numpy as jnp
import numpy as np

from .integrator import DrudeTGNHIntegrator

_VERSION = 1


def serialize_integrator(integ: DrudeTGNHIntegrator) -> str:
    root = ET.Element("DrudeTGNHIntegrator", {
        "version": str(_VERSION),
        # the reference proxy's 9 fields
        "stepSize": repr(integ.getStepSize()),
        "constraintTolerance": repr(integ.getConstraintTolerance()),
        "temperature": repr(integ.getTemperature()),
        "couplingTime": repr(integ.getCouplingTime()),
        "drudeTemperature": repr(integ.getDrudeTemperature()),
        "drudeCouplingTime": repr(integ.getDrudeCouplingTime()),
        "drudeStepsPerRealStep": str(integ.getDrudeStepsPerRealStep()),
        "numNHChains": str(integ.getNumNHChains()),
        "useDrudeNHChains": str(int(integ.getUseDrudeNHChains())),
        # the fields the reference forgot
        "maxDrudeDistance": repr(integ.getMaxDrudeDistance()),
        "useCOMTempGroup": str(int(integ.getUseCOMTempGroup())),
        "numTempGroups": str(integ.getNumTempGroups()),
    })
    if integ._particle_temp_group:
        groups = ET.SubElement(root, "ParticleTempGroups")
        groups.text = " ".join(str(g) for g in integ._particle_temp_group)
    return ET.tostring(root, encoding="unicode")


def deserialize_integrator(xml: str) -> DrudeTGNHIntegrator:
    root = ET.fromstring(xml)
    if root.tag != "DrudeTGNHIntegrator":
        raise ValueError(f"not a DrudeTGNHIntegrator document: {root.tag}")
    a = root.attrib
    integ = DrudeTGNHIntegrator(
        float(a["temperature"]), float(a["couplingTime"]),
        float(a["drudeTemperature"]), float(a["drudeCouplingTime"]),
        float(a["stepSize"]), int(a["drudeStepsPerRealStep"]),
        int(a["numNHChains"]), bool(int(a["useDrudeNHChains"])),
        bool(int(a.get("useCOMTempGroup", "1"))))
    integ.setConstraintTolerance(float(a["constraintTolerance"]))
    integ.setMaxDrudeDistance(float(a.get("maxDrudeDistance", "0")))
    for _ in range(int(a.get("numTempGroups", "0"))):
        integ.addTempGroup()
    groups = root.find("ParticleTempGroups")
    if groups is not None and groups.text:
        for g in groups.text.split():
            integ.addParticleTempGroup(int(g))
    return integ


# -- System ------------------------------------------------------------------

def _vsite_to_xml(index: int, vs) -> ET.Element:
    from ..system import (LocalCoordinatesSite, OutOfPlaneSite,
                          ThreeParticleAverageSite, TwoParticleAverageSite)
    e = ET.Element("VirtualSite", {"index": str(index)})
    if isinstance(vs, TwoParticleAverageSite):
        e.set("type", "average2")
    elif isinstance(vs, ThreeParticleAverageSite):
        e.set("type", "average3")
    elif isinstance(vs, OutOfPlaneSite):
        e.set("type", "outOfPlane")
    elif isinstance(vs, LocalCoordinatesSite):
        e.set("type", "localCoords")
        e.set("particles", " ".join(map(str, vs.particles)))
        e.set("originWeights", " ".join(map(repr, vs.origin_weights)))
        e.set("xWeights", " ".join(map(repr, vs.x_weights)))
        e.set("yWeights", " ".join(map(repr, vs.y_weights)))
        e.set("localPosition", " ".join(map(repr, vs.local_position)))
        return e
    else:
        raise ValueError(f"unsupported virtual site {type(vs).__name__}")
    e.set("particles", " ".join(map(str, vs.particles)))
    e.set("weights", " ".join(map(repr, vs.weights)))
    return e


def _vsite_from_xml(e: ET.Element):
    from ..system import (LocalCoordinatesSite, OutOfPlaneSite,
                          ThreeParticleAverageSite, TwoParticleAverageSite)
    kind = e.get("type")
    particles = [int(x) for x in e.get("particles").split()]
    if kind == "localCoords":
        return LocalCoordinatesSite(
            particles,
            [float(x) for x in e.get("originWeights").split()],
            [float(x) for x in e.get("xWeights").split()],
            [float(x) for x in e.get("yWeights").split()],
            [float(x) for x in e.get("localPosition").split()])
    weights = [float(x) for x in e.get("weights").split()]
    cls = {"average2": TwoParticleAverageSite,
           "average3": ThreeParticleAverageSite,
           "outOfPlane": OutOfPlaneSite}[kind]
    return cls(*particles, *weights)


def _force_to_xml(f) -> ET.Element:
    from ..forces.bonded import (HarmonicAngleForce, HarmonicBondForce,
                                 PeriodicTorsionForce)
    from ..forces.cmmotion import CMMotionRemover, MonteCarloBarostat
    from ..forces.drude import DrudeForce
    from ..forces.nonbonded import NonbondedForce

    if isinstance(f, NonbondedForce):
        e = ET.Element("Force", {
            "type": "NonbondedForce",
            "method": str(f.getNonbondedMethod()),
            "cutoff": repr(f.getCutoffDistance()),
            "useSwitchingFunction": str(int(f.getUseSwitchingFunction())),
            "switchingDistance": repr(f.getSwitchingDistance()),
            "ewaldTolerance": repr(f.getEwaldErrorTolerance()),
            "rfDielectric": repr(f.getReactionFieldDielectric()),
            "dispersionCorrection":
                str(int(f.getUseDispersionCorrection())),
            "alpha": repr(f._pme_params[0]),
            "nx": str(f._pme_params[1]), "ny": str(f._pme_params[2]),
            "nz": str(f._pme_params[3]),
        })
        ps = ET.SubElement(e, "Particles")
        for q, sig, eps in f._particles:
            ET.SubElement(ps, "Particle", {"q": repr(q), "sig": repr(sig),
                                           "eps": repr(eps)})
        ex = ET.SubElement(e, "Exceptions")
        for p1, p2, qq, sig, eps in f._exceptions:
            ET.SubElement(ex, "Exception", {
                "p1": str(p1), "p2": str(p2), "q": repr(qq),
                "sig": repr(sig), "eps": repr(eps)})
        if f._lj_overrides:
            ov = ET.SubElement(e, "LJPairOverrides")
            for set1, set2, sig, eps in f._lj_overrides:
                ET.SubElement(ov, "Override", {
                    "particles1": " ".join(map(str, set1)),
                    "particles2": " ".join(map(str, set2)),
                    "sig": repr(sig), "eps": repr(eps)})
        return e

    if isinstance(f, DrudeForce):
        e = ET.Element("Force", {"type": "DrudeForce"})
        ps = ET.SubElement(e, "Particles")
        for p in f._particles:
            ET.SubElement(ps, "Particle", {
                "p": str(p[0]), "p1": str(p[1]), "p2": str(p[2]),
                "p3": str(p[3]), "p4": str(p[4]), "q": repr(p[5]),
                "alpha": repr(p[6]), "aniso12": repr(p[7]),
                "aniso34": repr(p[8])})
        sp = ET.SubElement(e, "ScreenedPairs")
        for a, b, thole in f._screened_pairs:
            ET.SubElement(sp, "Pair", {"p1": str(a), "p2": str(b),
                                       "thole": repr(thole)})
        if f._nbthole:
            nb = ET.SubElement(e, "NBTholePairs")
            for a, b, thole in f._nbthole:
                ET.SubElement(nb, "Pair", {"p1": str(a), "p2": str(b),
                                           "thole": repr(thole)})
        return e

    if isinstance(f, HarmonicBondForce):
        e = ET.Element("Force", {"type": "HarmonicBondForce"})
        for p1, p2, length, k in f._bonds:
            ET.SubElement(e, "Bond", {"p1": str(p1), "p2": str(p2),
                                      "d": repr(length), "k": repr(k)})
        return e

    if isinstance(f, HarmonicAngleForce):
        e = ET.Element("Force", {"type": "HarmonicAngleForce"})
        for p1, p2, p3, th, k in f._angles:
            ET.SubElement(e, "Angle", {"p1": str(p1), "p2": str(p2),
                                       "p3": str(p3), "a": repr(th),
                                       "k": repr(k)})
        return e

    if isinstance(f, PeriodicTorsionForce):
        e = ET.Element("Force", {"type": "PeriodicTorsionForce"})
        for p1, p2, p3, p4, per, ph, k in f._torsions:
            ET.SubElement(e, "Torsion", {
                "p1": str(p1), "p2": str(p2), "p3": str(p3), "p4": str(p4),
                "periodicity": str(per), "phase": repr(ph), "k": repr(k)})
        return e

    from ..forces.bonded import HarmonicTorsionForce
    if isinstance(f, HarmonicTorsionForce):
        e = ET.Element("Force", {"type": "HarmonicTorsionForce"})
        for p1, p2, p3, p4, th0, k in f._torsions:
            ET.SubElement(e, "Torsion", {
                "p1": str(p1), "p2": str(p2), "p3": str(p3), "p4": str(p4),
                "theta0": repr(th0), "k": repr(k)})
        return e

    from ..forces.cmap import CMAPTorsionForce
    if isinstance(f, CMAPTorsionForce):
        e = ET.Element("Force", {"type": "CMAPTorsionForce"})
        maps = ET.SubElement(e, "Maps")
        for size, energy in f._maps:
            m = ET.SubElement(maps, "Map", {"size": str(size)})
            m.text = " ".join(repr(float(v)) for v in energy)
        tors = ET.SubElement(e, "Torsions")
        for t in f._torsions:
            ET.SubElement(tors, "Torsion", {
                "map": str(t[0]),
                **{f"a{i+1}": str(t[1 + i]) for i in range(4)},
                **{f"b{i+1}": str(t[5 + i]) for i in range(4)}})
        return e

    if isinstance(f, CMMotionRemover):
        return ET.Element("Force", {"type": "CMMotionRemover",
                                    "frequency": str(f.getFrequency())})

    if isinstance(f, MonteCarloBarostat):
        return ET.Element("Force", {
            "type": "MonteCarloBarostat",
            "pressure": repr(f.getDefaultPressure()),
            "temperature": repr(f.getDefaultTemperature()),
            "frequency": str(f.getFrequency())})

    from ..forces.custom import (CustomAngleForce, CustomBondForce,
                                 CustomExternalForce, CustomNonbondedForce,
                                 CustomTorsionForce)
    if isinstance(f, (CustomBondForce, CustomAngleForce,
                      CustomTorsionForce, CustomExternalForce)):
        e = ET.Element("Force", {"type": type(f).__name__,
                                 "energy": f.getEnergyFunction()})
        pp = ET.SubElement(e, "PerTermParameters")
        for name in f._per_names:
            ET.SubElement(pp, "Parameter", {"name": name})
        gp = ET.SubElement(e, "GlobalParameters")
        for name, default in f._globals:
            ET.SubElement(gp, "Parameter", {"name": name,
                                            "default": repr(default)})
        ts = ET.SubElement(e, "Terms")
        npart = f._N_PARTICLES
        for t in f._terms:
            ET.SubElement(ts, "Term", {
                "particles": " ".join(map(str, t[:npart])),
                "params": " ".join(repr(v) for v in t[npart])})
        return e

    if isinstance(f, CustomNonbondedForce):
        e = ET.Element("Force", {
            "type": "CustomNonbondedForce",
            "energy": f.getEnergyFunction(),
            "method": str(f.getNonbondedMethod()),
            "cutoff": repr(f.getCutoffDistance()),
            "useSwitchingFunction": str(int(f.getUseSwitchingFunction())),
            "switchingDistance": repr(f.getSwitchingDistance())})
        pp = ET.SubElement(e, "PerParticleParameters")
        for name in f._per_names:
            ET.SubElement(pp, "Parameter", {"name": name})
        gp = ET.SubElement(e, "GlobalParameters")
        for name, default in f._globals:
            ET.SubElement(gp, "Parameter", {"name": name,
                                            "default": repr(default)})
        ps = ET.SubElement(e, "Particles")
        for prm in f._particles:
            ET.SubElement(ps, "Particle", {
                "params": " ".join(repr(v) for v in prm)})
        ex = ET.SubElement(e, "Exclusions")
        for a, b in f._exclusions:
            ET.SubElement(ex, "Exclusion", {"p1": str(a), "p2": str(b)})
        return e

    raise ValueError(f"cannot serialize force {type(f).__name__}")


def _force_from_xml(e: ET.Element):
    from ..forces.bonded import (HarmonicAngleForce, HarmonicBondForce,
                                 PeriodicTorsionForce)
    from ..forces.cmmotion import CMMotionRemover, MonteCarloBarostat
    from ..forces.drude import DrudeForce
    from ..forces.nonbonded import NonbondedForce

    kind = e.get("type")
    if kind == "NonbondedForce":
        f = NonbondedForce()
        f.setNonbondedMethod(int(e.get("method")))
        f.setCutoffDistance(float(e.get("cutoff")))
        f.setUseSwitchingFunction(bool(int(e.get("useSwitchingFunction"))))
        f.setSwitchingDistance(float(e.get("switchingDistance")))
        f.setEwaldErrorTolerance(float(e.get("ewaldTolerance")))
        f.setReactionFieldDielectric(float(e.get("rfDielectric")))
        f.setUseDispersionCorrection(
            bool(int(e.get("dispersionCorrection"))))
        f.setPMEParameters(float(e.get("alpha")), int(e.get("nx")),
                           int(e.get("ny")), int(e.get("nz")))
        for p in e.find("Particles"):
            f.addParticle(float(p.get("q")), float(p.get("sig")),
                          float(p.get("eps")))
        for x in e.find("Exceptions"):
            f.addException(int(x.get("p1")), int(x.get("p2")),
                           float(x.get("q")), float(x.get("sig")),
                           float(x.get("eps")))
        ov = e.find("LJPairOverrides")
        if ov is not None:
            for o in ov:
                f.addLJPairOverride(
                    [int(x) for x in o.get("particles1").split()],
                    [int(x) for x in o.get("particles2").split()],
                    float(o.get("sig")), float(o.get("eps")))
        return f

    if kind == "DrudeForce":
        f = DrudeForce()
        for p in e.find("Particles"):
            f.addParticle(int(p.get("p")), int(p.get("p1")),
                          int(p.get("p2")), int(p.get("p3")),
                          int(p.get("p4")), float(p.get("q")),
                          float(p.get("alpha")), float(p.get("aniso12")),
                          float(p.get("aniso34")))
        for x in e.find("ScreenedPairs"):
            f.addScreenedPair(int(x.get("p1")), int(x.get("p2")),
                              float(x.get("thole")))
        nb = e.find("NBTholePairs")
        if nb is not None:
            for x in nb:
                f.addNBTholePair(int(x.get("p1")), int(x.get("p2")),
                                 float(x.get("thole")))
        return f

    if kind == "HarmonicBondForce":
        f = HarmonicBondForce()
        for b in e:
            f.addBond(int(b.get("p1")), int(b.get("p2")),
                      float(b.get("d")), float(b.get("k")))
        return f

    if kind == "HarmonicAngleForce":
        f = HarmonicAngleForce()
        for a in e:
            f.addAngle(int(a.get("p1")), int(a.get("p2")),
                       int(a.get("p3")), float(a.get("a")),
                       float(a.get("k")))
        return f

    if kind == "PeriodicTorsionForce":
        f = PeriodicTorsionForce()
        for t in e:
            f.addTorsion(int(t.get("p1")), int(t.get("p2")),
                         int(t.get("p3")), int(t.get("p4")),
                         int(t.get("periodicity")), float(t.get("phase")),
                         float(t.get("k")))
        return f

    if kind == "HarmonicTorsionForce":
        from ..forces.bonded import HarmonicTorsionForce
        f = HarmonicTorsionForce()
        for t in e:
            f.addTorsion(int(t.get("p1")), int(t.get("p2")),
                         int(t.get("p3")), int(t.get("p4")),
                         float(t.get("theta0")), float(t.get("k")))
        return f

    if kind == "CMAPTorsionForce":
        from ..forces.cmap import CMAPTorsionForce
        f = CMAPTorsionForce()
        for m in e.find("Maps"):
            size = int(m.get("size"))
            f.addMap(size, [float(v) for v in (m.text or "").split()])
        for t in e.find("Torsions"):
            f.addTorsion(int(t.get("map")),
                         *(int(t.get(f"a{i+1}")) for i in range(4)),
                         *(int(t.get(f"b{i+1}")) for i in range(4)))
        return f

    if kind == "CMMotionRemover":
        return CMMotionRemover(int(e.get("frequency")))

    if kind == "MonteCarloBarostat":
        return MonteCarloBarostat(float(e.get("pressure")),
                                  float(e.get("temperature")),
                                  int(e.get("frequency")))

    if kind in ("CustomBondForce", "CustomAngleForce",
                "CustomTorsionForce", "CustomExternalForce"):
        from ..forces.custom import (CustomAngleForce, CustomBondForce,
                                     CustomExternalForce,
                                     CustomTorsionForce)
        cls = {"CustomBondForce": CustomBondForce,
               "CustomAngleForce": CustomAngleForce,
               "CustomTorsionForce": CustomTorsionForce,
               "CustomExternalForce": CustomExternalForce}[kind]
        f = cls(e.get("energy"))
        for p in e.find("PerTermParameters"):
            f._add_per(p.get("name"))
        for p in e.find("GlobalParameters"):
            f.addGlobalParameter(p.get("name"), float(p.get("default")))
        for t in e.find("Terms"):
            particles = [int(x) for x in t.get("particles").split()]
            prm = tuple(float(x) for x in t.get("params").split())
            f._terms.append(tuple(particles) + (prm,))
        return f

    if kind == "CustomNonbondedForce":
        from ..forces.custom import CustomNonbondedForce
        f = CustomNonbondedForce(e.get("energy"))
        f.setNonbondedMethod(int(e.get("method")))
        f.setCutoffDistance(float(e.get("cutoff")))
        f.setUseSwitchingFunction(bool(int(e.get("useSwitchingFunction"))))
        f.setSwitchingDistance(float(e.get("switchingDistance")))
        for p in e.find("PerParticleParameters"):
            f.addPerParticleParameter(p.get("name"))
        for p in e.find("GlobalParameters"):
            f.addGlobalParameter(p.get("name"), float(p.get("default")))
        for p in e.find("Particles"):
            f.addParticle([float(x) for x in p.get("params").split()])
        for x in e.find("Exclusions"):
            f.addExclusion(int(x.get("p1")), int(x.get("p2")))
        return f

    raise ValueError(f"unknown force type in XML: {kind}")


def serialize_system(system) -> str:
    """Non-lossy XML of a System: particles, constraints, virtual sites,
    periodic box, and every force (role of OpenMM's
    XmlSerializer::serialize<System>, which the reference workflow uses
    implicitly through the host toolkit — SURVEY.md section 2.4)."""
    root = ET.Element("System", {"version": str(_VERSION)})
    box = system.getDefaultPeriodicBoxVectors()
    bv = ET.SubElement(root, "PeriodicBoxVectors")
    for name, v in zip("ABC", box):
        ET.SubElement(bv, name, {"x": repr(v[0]), "y": repr(v[1]),
                                 "z": repr(v[2])})
    ps = ET.SubElement(root, "Particles")
    for i in range(system.getNumParticles()):
        ET.SubElement(ps, "Particle",
                      {"mass": repr(system.getParticleMass(i))})
    cs = ET.SubElement(root, "Constraints")
    for ci in range(system.getNumConstraints()):
        p1, p2, d = system.getConstraintParameters(ci)
        ET.SubElement(cs, "Constraint", {"p1": str(p1), "p2": str(p2),
                                         "d": repr(d)})
    vs = ET.SubElement(root, "VirtualSites")
    for i in sorted(system._virtual_sites):
        vs.append(_vsite_to_xml(i, system.getVirtualSite(i)))
    fs = ET.SubElement(root, "Forces")
    for f in system.getForces():
        fs.append(_force_to_xml(f))
    return ET.tostring(root, encoding="unicode")


def deserialize_system(xml: str):
    from ..system import System
    root = ET.fromstring(xml)
    if root.tag != "System":
        raise ValueError(f"not a System document: {root.tag}")
    system = System()
    for p in root.find("Particles"):
        system.addParticle(float(p.get("mass")))
    for c in root.find("Constraints"):
        system.addConstraint(int(c.get("p1")), int(c.get("p2")),
                             float(c.get("d")))
    for v in root.find("VirtualSites"):
        system.setVirtualSite(int(v.get("index")), _vsite_from_xml(v))
    bv = root.find("PeriodicBoxVectors")
    system.setDefaultPeriodicBoxVectors(
        *[[float(bv.find(n).get(ax)) for ax in "xyz"] for n in "ABC"])
    for f in root.find("Forces"):
        system.addForce(_force_from_xml(f))
    return system


class XmlSerializer:
    """OpenMM-shaped facade: ``XmlSerializer.serialize(obj)`` /
    ``XmlSerializer.deserialize(xml)``, dispatching on object/document
    type (System or DrudeTGNHIntegrator).

    The API shape mirrors OpenMM's, but the document schema is
    ENGINE-NATIVE: attribute names/structure differ from OpenMM's System
    XML, so files do not interchange with the OpenMM toolchain in either
    direction (serialize here -> deserialize here only).  The integrator
    document additionally round-trips fields OpenMM's proxy drops
    (temp groups, maxDrudeDistance, useCOMTempGroup —
    DrudeTGNHIntegratorProxy.cpp:43-55 is lossy)."""

    @staticmethod
    def serialize(obj) -> str:
        if isinstance(obj, DrudeTGNHIntegrator):
            return serialize_integrator(obj)
        from ..system import System
        if isinstance(obj, System):
            return serialize_system(obj)
        raise TypeError(f"cannot serialize {type(obj).__name__}")

    @staticmethod
    def deserialize(xml: str):
        tag = ET.fromstring(xml).tag
        if tag == "DrudeTGNHIntegrator":
            return deserialize_integrator(xml)
        if tag == "System":
            return deserialize_system(xml)
        raise ValueError(f"unknown document type: {tag}")


# -- checkpointing -----------------------------------------------------------

def save_checkpoint(path: str, context) -> None:
    """Dump the full SimState pytree (incl. NH chain + barostat + PRNG
    state) to an npz."""
    state = context._state
    leaves, treedef = jax.tree.flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["_n_leaves"] = np.asarray(len(leaves))
    with open(path, "wb") as f:
        np.savez(f, **arrays)


def load_checkpoint(path: str, context) -> None:
    with open(path, "rb") as f:
        data = np.load(f)
        n = int(data["_n_leaves"])
        leaves = [data[f"leaf_{i}"] for i in range(n)]
    template = context._state
    t_leaves, treedef = jax.tree.flatten(template)
    if len(t_leaves) != n:
        raise ValueError(
            f"checkpoint has {n} state leaves, context expects {len(t_leaves)}"
            " — was it saved for a different system or neighbor config?")
    new_leaves = [jnp.asarray(x, t.dtype) for x, t in zip(leaves, t_leaves)]
    context._state = jax.tree.unflatten(treedef, new_leaves)
    context._forces_valid = True
    context._ke_valid = True
