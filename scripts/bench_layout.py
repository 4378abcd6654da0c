#!/usr/bin/env python
"""Microbenchmark: (N,3) vs (3,N) state layouts for the kinematics ops.

(N,3) f32 arrays tile lanes 3 -> 128 (42x padded traffic); (3,N) pays only
sublanes 3 -> 8.  Measures elementwise AXPY chains and partner gathers in
both layouts, inside a lax.scan to amortize dispatch.  Decides the SimState
layout (core/state.py)."""

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

N = 100_000
ITERS = 50


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n / ITERS * 1e3  # ms per scan iteration


def scan(f, *xs):
    def body(c, _):
        return f(*c), None

    @jax.jit
    def run():
        out, _ = jax.lax.scan(body, xs, None, length=ITERS)
        return out
    return run


def main():
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    v_n3 = jax.random.normal(k1, (N, 3), jnp.float32)
    f_n3 = jax.random.normal(k2, (N, 3), jnp.float32)
    inv_m = jnp.abs(jax.random.normal(k3, (N,), jnp.float32)) + 0.1
    idx = jax.random.randint(k1, (N,), 0, N, jnp.int32)
    v_3n = v_n3.T.copy()
    f_3n = f_n3.T.copy()

    # 1. half-kick-like AXPY: v += dt * inv_m * f (plus a where)
    def kick_n3(v, f):
        nv = v + 0.0005 * inv_m[:, None] * f
        return jnp.where((inv_m > 0)[:, None], nv, v), f

    def kick_3n(v, f):
        nv = v + 0.0005 * inv_m[None, :] * f
        return jnp.where((inv_m > 0)[None, :], nv, v), f

    print(f"kick (N,3): {timeit(scan(kick_n3, v_n3, f_n3)):7.3f} ms")
    print(f"kick (3,N): {timeit(scan(kick_3n, v_3n, f_3n)):7.3f} ms")

    # 2. partner gather + pair math (half_kick pair branch shape)
    def pair_n3(v, f):
        vj = v[idx]
        fj = f[idx]
        cm = 0.5 * (v + vj) + 0.0005 * (f + fj)
        rel = (v - vj) + 0.0005 * inv_m[:, None] * (f - fj)
        return cm + 0.3 * rel, f

    def pair_3n(v, f):
        vj = v[:, idx]
        fj = f[:, idx]
        cm = 0.5 * (v + vj) + 0.0005 * (f + fj)
        rel = (v - vj) + 0.0005 * inv_m[None, :] * (f - fj)
        return cm + 0.3 * rel, f

    print(f"pair gather (N,3): {timeit(scan(pair_n3, v_n3, f_n3)):7.3f} ms")
    print(f"pair gather (3,N): {timeit(scan(pair_3n, v_3n, f_3n)):7.3f} ms")

    # 3. masked reduction (KE-like): sum m * |v|^2
    def ke_n3(v, f):
        ke = jnp.sum(inv_m[:, None] * v * v)
        return v + 1e-12 * ke, f

    def ke_3n(v, f):
        ke = jnp.sum(inv_m[None, :] * v * v)
        return v + 1e-12 * ke, f

    print(f"KE reduce (N,3): {timeit(scan(ke_n3, v_n3, f_n3)):7.3f} ms")
    print(f"KE reduce (3,N): {timeit(scan(ke_3n, v_3n, f_3n)):7.3f} ms")

    # 4. residue-sum-like gather table ((R, K) members, K=8)
    R = N // 4
    members = jax.random.randint(k2, (R, 8), 0, N + 1, jnp.int32)

    def res_n3(v, f):
        cols = []
        for c in range(3):
            vv = jnp.concatenate([v[:, c], jnp.zeros((1,), v.dtype)])
            cols.append(jnp.sum(vv[members], axis=1))
        s = jnp.stack(cols, axis=1)  # (R, 3)
        return v + 1e-12 * jnp.sum(s), f

    def res_3n(v, f):
        vv = jnp.concatenate([v, jnp.zeros((3, 1), v.dtype)], axis=1)
        s = jnp.sum(vv[:, members], axis=2)  # (3, R)
        return v + 1e-12 * jnp.sum(s), f

    print(f"residue sum (N,3): {timeit(scan(res_n3, v_n3, f_n3)):7.3f} ms")
    print(f"residue sum (3,N): {timeit(scan(res_3n, v_3n, f_3n)):7.3f} ms")


if __name__ == "__main__":
    main()
