import os, time, sys
import sys as _sys
_sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
from openmm_drudenose_tpu.utils import compile_cache
# env var is ignored (axon sitecustomize imports jax first);
# probe entries go to /tmp, not the committed repo cache
compile_cache.enable("/tmp/jaxcache")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

ITERS = 8
def timeit(fn, *a, n=3, warmup=1):
    for _ in range(warmup): out = fn(*a)
    jax.block_until_ready(out); best = 1e9
    for _ in range(n):
        t0 = time.time(); out = fn(*a); jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    return best * 1e3 / ITERS

def chain(f, x0):
    @jax.jit
    def run():
        def body(c, _): return f(c), None
        out, _ = jax.lax.scan(body, x0, None, length=ITERS)
        return out
    return run

import openmm_drudenose_tpu as dn
from openmm_drudenose_tpu.forces import cellpair as cp
from openmm_drudenose_tpu.io import builders
from openmm_drudenose_tpu.ops import pallas_sweep

system, positions = builders.build_water_box(20000)
integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.1, 0.001, 20, 1)
integ.setMaxDrudeDistance(0.02)
ctx = dn.Context(system, integ, precision="single", strategy="cellpair")
ctx.setPositions(positions)
ctx.setVelocitiesToTemperature(300.0, seed=0)
integ.step(500)
ctx._ensure_forces()
st = ctx._state
pos, boxd = st.positions, jnp.diagonal(st.box)
nb_fn, nb_params = next(t for t in ctx._terms if hasattr(t[0], "sweep_forces"))
cfg0 = ctx._cp_cfg
alpha = nb_fn.pme_setup.alpha
cs = cp.build_cellsort(pos, boxd, cfg0)

for clamp in (None, 40, 32, 24):
    def sweep(p):
        return p + 0.0 * pallas_sweep.pair_forces_pallas(
            nb_params, p, boxd, cs, cfg0, "ewald", alpha=alpha,
            debug_lmax_clamp=clamp)
    t = timeit(chain(sweep, pos))
    print(f"tile C=48, b-loop clamp {str(clamp):>4}: sweep {t:7.2f} ms")
