"""Distributed PME reciprocal sum: sharded pencil FFT over the device mesh.

The classic slab decomposition of a 3D FFT (SURVEY.md section 2.8's
"distributed PME" line): the charge grid lives x-slab-sharded, each device
2D-FFTs its slab over (y, z), one all_to_all re-shards x -> y pencils over
ICI, a local 1D FFT over x completes the transform, and the reciprocal
energy reduces locally + psums.  Differentiable end to end (FFTs and
all_to_all have exact transposes), so interpolation forces arrive through
the same autodiff path as the replicated-FFT engine.

Used by parallel/sharded.py (distributed_fft=True): each device's spread
grid is psum_scatter'd into its x-slab (half the comm of the full-grid
psum) and the FFT work is split n_dev ways.  At benchmark grids (~75^3)
the replicated FFT is already cheap, so this is a scale-out capability for
the multi-million-atom regime where the grid itself outgrows one chip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..units import ONE_4PI_EPS0


def shardable(grid, n_dev: int) -> bool:
    K1, K2, _ = grid
    return K1 % n_dev == 0 and K2 % n_dev == 0


def local_energy(grid, alpha, bm2x, bm2y, bm2z, Q_loc, box_diag,
                 axis: str, n_dev: int):
    """LOCAL partial of the reciprocal energy from an x-slab-sharded
    charge grid (runs inside shard_map).  The caller must psum with an
    identity-transpose custom vjp (parallel/sharded.psum_grid pattern):
    jax's default psum transpose under shard_map would mis-scale the
    cotangent that each device's local partial must receive exactly once.

    Q_loc: (K1 / n_dev, K2, K3) this device's slab of the real grid.
    """
    K1, K2, K3 = grid
    k1_loc = K1 // n_dev
    k2_loc = K2 // n_dev
    dtype = Q_loc.dtype
    d = jax.lax.axis_index(axis)

    # 2D FFT over (y, z) on the local x-slab
    F_yz = jnp.fft.fftn(Q_loc.astype(jnp.complex64
                                     if dtype == jnp.float32
                                     else jnp.complex128), axes=(1, 2))
    # re-shard: x-slabs -> y-pencils.  split y into n_dev chunks and
    # all_to_all so each device collects the full x extent of its y chunk
    blocks = F_yz.reshape(k1_loc, n_dev, k2_loc, K3)
    blocks = jnp.moveaxis(blocks, 1, 0)           # (n_dev, k1_loc, k2_loc, K3)
    gathered = jax.lax.all_to_all(blocks, axis, split_axis=0, concat_axis=0,
                                  tiled=False)
    # gathered: (n_dev, k1_loc, k2_loc, K3) where leading axis is the
    # source device = x-slab index
    F_xslabs = gathered.reshape(K1, k2_loc, K3)
    F = jnp.fft.fft(F_xslabs, axis=0)             # full transform, y-pencil

    # local reciprocal sum over this device's y chunk
    m1 = jnp.fft.fftfreq(K1, d=1.0 / K1).astype(dtype)
    m2 = jnp.fft.fftfreq(K2, d=1.0 / K2).astype(dtype)
    m3 = jnp.fft.fftfreq(K3, d=1.0 / K3).astype(dtype)
    m2_loc = jax.lax.dynamic_slice_in_dim(m2, d * k2_loc, k2_loc)
    bm2y_loc = jax.lax.dynamic_slice_in_dim(
        jnp.asarray(bm2y).astype(dtype), d * k2_loc, k2_loc)
    mx = m1[:, None, None] / box_diag[0]
    my = m2_loc[None, :, None] / box_diag[1]
    mz = m3[None, None, :] / box_diag[2]
    m_sq = mx * mx + my * my + mz * mz
    bm2 = (jnp.asarray(bm2x).astype(dtype)[:, None, None]
           * bm2y_loc[None, :, None]
           * jnp.asarray(bm2z).astype(dtype)[None, None, :])
    volume = box_diag[0] * box_diag[1] * box_diag[2]
    pi = jnp.asarray(np.pi, dtype)
    m_sq_safe = jnp.where(m_sq > 0, m_sq, 1.0)
    eterm = jnp.where(m_sq > 0,
                      jnp.exp(-pi * pi * m_sq_safe / (alpha * alpha))
                      / m_sq_safe * bm2, 0.0)
    S2 = jnp.real(F) ** 2 + jnp.imag(F) ** 2
    return ONE_4PI_EPS0 / (2.0 * pi * volume) * jnp.sum(eterm * S2)
