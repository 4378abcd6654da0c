#!/usr/bin/env python
"""AOT memory analysis of the 1M/8-slab resident executables (no
execution): prints XLA buffer-class sizes for the rebuild and seg
programs so the OOM driver can be attacked by numbers, not guesses.
Reuses dryrun_1m's re-exec/env plumbing; the persistent compile cache
makes repeat analysis cheap."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_FLAGS = ("--xla_force_host_platform_device_count=8"
          " --xla_cpu_collective_call_warn_stuck_timeout_seconds=3600"
          " --xla_cpu_collective_call_terminate_timeout_seconds=7200")
if _FLAGS not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") + " "
                               + _FLAGS)
    if "jax" in sys.modules:
        os.execv(sys.executable, [sys.executable] + sys.argv)

import time

import numpy as np


def report(tag, compiled):
    try:
        ma = compiled.memory_analysis()
    except Exception as e:
        print(f"{tag}: memory_analysis unavailable: {e}")
        return
    gb = 1024 ** 3
    print(f"{tag}: temp {ma.temp_size_in_bytes / gb:.2f} GB  "
          f"args {ma.argument_size_in_bytes / gb:.2f} GB  "
          f"out {ma.output_size_in_bytes / gb:.2f} GB  "
          f"alias {ma.alias_size_in_bytes / gb:.2f} GB  "
          f"code {ma.generated_code_size_in_bytes / 1024**2:.1f} MB",
          flush=True)


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from openmm_drudenose_tpu.utils import compile_cache
    compile_cache.enable("/tmp/jaxcache")
    import openmm_drudenose_tpu as dn
    from jax.sharding import Mesh
    from openmm_drudenose_tpu.io import builders
    from openmm_drudenose_tpu.parallel import resident

    n_mol = 200_000
    cap = 40
    for a in sys.argv:
        if a.startswith("--mol="):
            n_mol = int(a.split("=")[1])
        if a.startswith("--cap="):
            cap = int(a.split("=")[1])
    t0 = time.time()
    system, positions = builders.build_water_box(n_mol)
    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.1, 0.001, 20, 1)
    integ.setMaxDrudeDistance(0.02)
    ctx = dn.Context(system, integ, precision="single", strategy="cellpair",
                     nb_options={"grid_x_multiple": 8, "capacity": cap})
    ctx.setPositions(positions)
    ctx.setVelocitiesToTemperature(300.0, seed=0)
    print(f"context ready ({time.time()-t0:.0f}s)", flush=True)

    mesh = Mesh(np.array(jax.devices()[:8]), ("atom",))
    rctx = resident.ResidentContext(ctx, mesh, Rc=27200, Ec=8)
    print(f"resident ready ({time.time()-t0:.0f}s)", flush=True)

    reb = rctx._get_reb()
    with rctx._mesh:
        lowered = reb.lower(rctx._st)
        report("reb", lowered.compile())
        print(f"reb compiled ({time.time()-t0:.0f}s)", flush=True)
        seg = rctx._get_seg(1)
        report("seg", seg.lower(rctx._st).compile())
        print(f"seg compiled ({time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
