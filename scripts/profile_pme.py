#!/usr/bin/env python
"""PME component probe on the current device: 3D FFT cost by grid size
(fftn vs rfftn), spread fwd / fwd+bwd for the generic vs pencil paths, and
energy_of_grid.  All scan-chained (dispatch amortized)."""

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


def timeit(fn, *args, n=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n / ITERS * 1e3


def chain(f, x0):
    @jax.jit
    def run():
        def body(c, _):
            return f(c), None
        out, _ = jax.lax.scan(body, x0, None, length=ITERS)
        return out
    return run


def main():
    key = jax.random.PRNGKey(0)

    # FFT size scan
    for K in (72, 75, 80, 90, 96):
        Q = jax.random.normal(key, (K, K, K), jnp.float32)
        t = timeit(chain(lambda q: jnp.real(
            jnp.fft.ifftn(jnp.fft.fftn(q) * 1.001)), Q))
        tr = timeit(chain(lambda q: jnp.fft.irfftn(
            jnp.fft.rfftn(q) * 1.001, q.shape), Q))
        print(f"K={K}: fftn+ifftn {t:7.3f} ms   rfftn+irfftn {tr:7.3f} ms")

    # spread paths at the bench config
    from openmm_drudenose_tpu.forces import cellpair as cp
    from openmm_drudenose_tpu.forces import pme as pm

    n = 100_000
    rng = np.random.default_rng(0)
    box = np.array([8.43, 8.43, 8.43])
    pos = jnp.asarray(rng.uniform(0, box[0], (n, 3)), jnp.float32)
    q = jnp.asarray(rng.normal(size=n), jnp.float32)
    boxd = jnp.asarray(box, jnp.float32)

    cfg = cp.make_config(1.0, box, n, [], [], skin=0.1)
    cs = cp.build_cellsort(pos, boxd, cfg)
    print(f"cell grid {cfg.grid} capacity {cfg.capacity} "
          f"overflow {bool(cs.overflow)}")

    gen = pm.setup_pme(1.0, 5e-4, box)
    pen = pm.setup_pme(1.0, 5e-4, box, cell_grid=cfg.grid)
    print(f"generic grid {gen.grid}  pencil grid {pen.grid}")

    def probe(name, efn):
        t = timeit(chain(lambda p: p + 0.0 * efn(p), pos))
        tg = timeit(chain(lambda p: p + 0.0 * jax.grad(efn)(p), pos))
        print(f"{name:24s}: energy {t:7.3f} ms   e+grad {tg:7.3f} ms")

    probe("generic recip", lambda p: gen.reciprocal_energy(q, p, boxd))
    probe("pencil recip", lambda p: pen.reciprocal_energy_sorted(
        q, p, boxd, cs, cfg.capacity))

    # spread alone
    t = timeit(chain(lambda p: p + 0.0 * jnp.sum(
        gen.spread(q, p, boxd)), pos))
    print(f"generic spread fwd      : {t:7.3f} ms")
    t = timeit(chain(lambda p: p + 0.0 * jnp.sum(pm.spread_pencils(
        pen.grid, pen.cell_grid, cfg.capacity, q, p, boxd, cs)), pos))
    print(f"pencil spread fwd       : {t:7.3f} ms")
    t = timeit(chain(lambda p: p + 0.0 * jax.grad(lambda r: jnp.sum(
        pm.spread_pencils(pen.grid, pen.cell_grid, cfg.capacity, q, r,
                          boxd, cs)) ** 2)(p), pos))
    print(f"pencil spread fwd+bwd   : {t:7.3f} ms")

    Q0 = pen.spread(q, pos, boxd)
    t = timeit(chain(lambda Q: Q + 0.0 * pen.energy_of_grid(Q, boxd), Q0))
    print(f"energy_of_grid fwd      : {t:7.3f} ms")
    t = timeit(chain(lambda Q: Q + 0.0 * jax.grad(
        lambda R: pen.energy_of_grid(R, boxd))(Q), Q0))
    print(f"energy_of_grid fwd+bwd  : {t:7.3f} ms")


if __name__ == "__main__":
    main()
