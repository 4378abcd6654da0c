#!/usr/bin/env python
"""Does packing per-atom pair data into one contiguous row make (V, K)
gather pair passes cheap enough to revive the capacity-split sweep?

probe_split.py measured ~30 ns/pair with ~8 separate random gathers per
pair.  Here each partner costs ONE gather of a packed (N, 8) row
[x, y, z, q, sigma, eps, pad, pad]; if the cost drops ~8x (to ~4 ns/pair)
the split design nets ~+4-5 ms at C0=32.  Run on the real TPU."""

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
    n = 100_000
    rng = np.random.default_rng(0)
    box = 8.43
    packed = np.zeros((n, 8), np.float32)
    packed[:, :3] = rng.uniform(0, box, (n, 3))
    packed[:, 3] = rng.normal(size=n)
    packed[:, 4] = 0.3
    packed[:, 5] = 0.5
    packed_j = jnp.asarray(packed)
    alpha = 2.628
    cutoff2 = 0.81

    for V, K in ((4096, 128), (8192, 128)):
        ov = jnp.asarray(rng.integers(0, n, V), jnp.int32)
        part = jnp.asarray(rng.integers(0, n, (V, K)), jnp.int32)

        def ov_pass(tbl):
            rows_i = tbl[ov]                    # (V, 8)
            rows_j = tbl[part]                  # (V, K, 8) — ONE gather
            r2 = jnp.zeros(part.shape, tbl.dtype)
            ds = []
            for c in range(3):
                dc = rows_i[:, None, c] - rows_j[..., c]
                dc = dc - box * jnp.round(dc / box)
                ds.append(dc)
                r2 = r2 + dc * dc
            r2s = jnp.maximum(r2, 1e-6)
            inv_r2 = 1.0 / r2s
            inv_r = jnp.sqrt(inv_r2)
            qq = rows_i[:, None, 3] * rows_j[..., 3]
            sg = 0.5 * (rows_i[:, None, 4] + rows_j[..., 4])
            ep = rows_i[:, None, 5] * rows_j[..., 5]
            u3 = (sg * sg * inv_r2) ** 3
            g_lj = -4.0 * ep * (6.0 * u3 * u3 - 3.0 * u3) * inv_r2
            ar = alpha * r2s * inv_r
            t = 1.0 / (1.0 + 0.3275911 * ar)
            expm = jnp.exp(-ar * ar)
            erfc_ar = t * (0.254829592 + t * (-0.284496736 + t * (
                1.421413741 + t * (-1.453152027 + t * 1.061405429)))) * expm
            g_c = -0.5 * qq * inv_r2 * (erfc_ar * inv_r + 1.128 * alpha * expm)
            g = jnp.where(r2 < cutoff2, g_lj + g_c, 0.0)
            out = 0.0
            for dc in ds:
                out = out + jnp.sum(jnp.sum(2.0 * g * dc, axis=1))
            return tbl + 0.0 * out
        t = timeit(chain(ov_pass, packed_j))
        print(f"(V={V:6d}, K={K:3d}) packed-row gather pass: {t:7.2f} ms "
              f"({V * K / 1e6:.2f}M pairs, {t * 1e6 / (V * K):.1f} ns/pair)")


if __name__ == "__main__":
    main()
