"""XML (de)serialization of DrudeTGNHIntegrator and pytree checkpoints.

The reference proxy (serialization/src/DrudeTGNHIntegratorProxy.cpp:43-66)
serializes 9 scalar fields and silently DROPS temp groups, particle
assignments, maxDrudeDistance and useCOMTempGroup (lossy round trip,
SURVEY.md section 2.4) — and the NH chain state is lost entirely on
checkpoint (section 5).  Both are fixed here:

  * integrator XML carries every field including the group assignments
  * checkpoints dump the full SimState pytree (positions, velocities,
    forces, box, NH chain state, barostat state, PRNG key), so resume is
    bit-exact
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
