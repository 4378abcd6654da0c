#!/usr/bin/env python
"""Decision probes for the capacity-split sweep (ROADMAP round-3 design):

1. Dense sweep cost vs capacity: time the Pallas sweep at the production
   capacity and at candidate A-side caps (physics invalid at low caps —
   overflowing atoms drop — but the TIMING is what a capped a-side would
   cost, since cost scales with the slot loops, not occupancy).
2. (V, K) gather pair pass: time a synthetic overflow-list force pass at
   candidate sizes, measuring the real gather penalty at this shape
   (CLAUDE.md's 40x number came from (N, K) lists at full N).

Run on the real TPU.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import sys as _sys
_sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
from openmm_drudenose_tpu.utils import compile_cache
# env var is ignored (axon sitecustomize imports jax first);
# probe entries go to /tmp, not the committed repo cache
compile_cache.enable("/tmp/jaxcache")

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 8


def timeit(fn, *args, n=3, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(n):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    return best * 1e3 / ITERS


def chain(f, x0):
    @jax.jit
    def run():
        def body(c, _):
            return f(c), None
        out, _ = jax.lax.scan(body, x0, None, length=ITERS)
        return out
    return run


def main():
    import openmm_drudenose_tpu as dn
    from openmm_drudenose_tpu.forces import cellpair as cp
    from openmm_drudenose_tpu.io import builders
    from openmm_drudenose_tpu.ops import pallas_sweep

    n_mol = 20_000
    system, positions = builders.build_water_box(n_mol)
    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.1, 0.001, 20, 1)
    integ.setMaxDrudeDistance(0.02)
    ctx = dn.Context(system, integ, precision="single", strategy="cellpair")
    ctx.setPositions(positions)
    ctx.setVelocitiesToTemperature(300.0, seed=0)
    integ.step(500)                       # relax the lattice start
    ctx._ensure_forces()
    st = ctx._state
    pos = st.positions
    boxd = jnp.diagonal(st.box)
    n = pos.shape[0]

    # pull the live sweep params from the bound nonbonded term
    nb = next(t for t in ctx._terms if hasattr(t[0], "sweep_forces"))
    nb_fn, nb_params = nb
    cfg0 = ctx._cp_cfg

    cs0 = cp.build_cellsort(pos, boxd, cfg0)
    slot_occ = (np.asarray(cs0.slot_atom) < n).reshape(cfg0.n_cells,
                                                       cfg0.capacity)
    occ = slot_occ.sum(axis=1)
    print(f"occupancy: mean {occ.mean():.1f}  p95 {np.percentile(occ, 95):.0f}"
          f"  max {occ.max()}  capacity {cfg0.capacity}")

    alpha = nb_fn.pme_setup.alpha

    for cap in ((cfg0.capacity, 40, 32, 24) if os.environ.get('PROBE_SWEEP') else ()):   # 8-aligned (Mosaic tiling)
        import dataclasses
        cfg = dataclasses.replace(cfg0, capacity=cap)
        cs = cp.build_cellsort(pos, boxd, cfg)

        def sweep(p):
            return p + 0.0 * pallas_sweep.pair_forces_pallas(
                nb_params, p, boxd, cs, cfg, "ewald", alpha=alpha,
                coulomb_scale=None)
        t = timeit(chain(sweep, pos))
        drop = int(n - (np.asarray(cs.slot_atom) < n).sum())
        print(f"capacity {cap:3d}: sweep {t:7.2f} ms   "
              f"(drops {drop} atoms — timing only)")

    # ---- synthetic (V, K) gather pair pass -------------------------------
    pair_eg = cp.make_pair_eg("ewald", cfg0.cutoff, alpha=alpha)
    rng = np.random.default_rng(0)
    q = nb_params["charge"]
    sig = nb_params["sigma"]
    eps = nb_params["eps"]

    for V, K in ((4096, 128), (8192, 128), (8192, 64), (102400, 8)):
        ov = jnp.asarray(rng.integers(0, n, V), jnp.int32)
        part = jnp.asarray(rng.integers(0, n, (V, K)), jnp.int32)

        def ov_pass(p):
            # component-wise (V, K) arrays — no trailing size-3 axes
            # (CLAUDE.md: 42x lane padding on (V, K, 3) intermediates)
            ds = []
            r2 = 0.0
            for c in range(3):
                pc = p[:, c]
                dc = pc[ov][:, None] - pc[part]
                dc = dc - boxd[c] * jnp.round(dc / boxd[c])
                ds.append(dc)
                r2 = r2 + dc * dc
            r2s = jnp.maximum(r2, 1e-6)
            inv_r2 = 1.0 / r2s
            inv_r = jnp.sqrt(inv_r2)
            qq = q[ov][:, None] * q[part]
            sg = 0.5 * (sig[ov][:, None] + sig[part])
            ep = jnp.sqrt(eps[ov][:, None] * eps[part])
            e, g = pair_eg(qq * 138.935, sg, ep, r2s, inv_r, inv_r2,
                           jnp.zeros_like(r2, bool))
            g = jnp.where(r2 < cfg0.cutoff ** 2, g, 0.0)
            fs = [jnp.sum(2.0 * g * dc, axis=1) for dc in ds]   # 3 x (V,)
            return p + 0.0 * (jnp.sum(fs[0]) + jnp.sum(fs[1])
                              + jnp.sum(fs[2]))
        t = timeit(chain(ov_pass, pos))
        print(f"(V={V:6d}, K={K:3d}) gather pair pass: {t:7.2f} ms "
              f"({V * K / 1e6:.2f}M pairs)")


if __name__ == "__main__":
    main()
