"""Smooth Particle-Mesh Ewald reciprocal space, TPU-native.

Essmann et al. (1995) smooth PME with cardinal B-splines of order 5 (OpenMM's
order).  The reciprocal sum is a 3D FFT (jnp.fft.fftn) over a charge grid
built by scatter-add of separable B-spline weights; forces come from autodiff
of the energy through the spreading and the FFT, so there is no hand-written
interpolation-force kernel.

Parameter selection follows OpenMM's NonbondedForceImpl:
  alpha  = sqrt(-log(2 tol)) / cutoff
  grid_i = ceil(2 alpha L_i / (3 tol^(1/5))), rounded up to a 2,3,5-smooth size

Used by forces/nonbonded.py when the method is Ewald or PME (the reference's
example systems use PME: /root/reference/example/nacl_tg.py:42).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..units import ONE_4PI_EPS0

PME_ORDER = 5


def find_fft_dimension(minimum: int) -> int:
    """Smallest 2,3,5-smooth integer >= minimum (good jnp.fft sizes)."""
    n = max(int(minimum), 5)
    while True:
        m = n
        for f in (2, 3, 5):
            while m % f == 0:
                m //= f
        if m == 1:
            return n
        n += 1


def choose_alpha(cutoff: float, tol: float) -> float:
    return math.sqrt(-math.log(2.0 * tol)) / cutoff


def choose_grid(alpha: float, box_diag, tol: float):
    return tuple(find_fft_dimension(int(math.ceil(2.0 * alpha * L / (3.0 * tol ** 0.2))))
                 for L in box_diag)


def _Mn_np(n: int, x: np.ndarray) -> np.ndarray:
    """Cardinal B-spline M_n(x) (numpy, for host-side moduli)."""
    if n == 2:
        return np.clip(1.0 - np.abs(x - 1.0), 0.0, None)
    return (x * _Mn_np(n - 1, x) + (n - x) * _Mn_np(n - 1, x - 1.0)) / (n - 1)


def _bspline_moduli(order: int, K: int) -> np.ndarray:
    """|b(m)|^2, b(m) = exp(2 pi i (n-1) m / K) / sum_k M_n(k+1) e^{2 pi i m k / K}."""
    knots = _Mn_np(order, np.arange(1, order, dtype=np.float64))  # M_n(1..n-1)
    m = np.arange(K)
    k = np.arange(order - 1)
    denom = np.sum(knots[None, :] * np.exp(2j * np.pi * m[:, None] * k[None, :] / K),
                   axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        bm2 = 1.0 / np.abs(denom) ** 2
    # zeros of the denominator (odd order at K/2): interpolate like OpenMM
    bad = ~np.isfinite(bm2) | (np.abs(denom) < 1e-7)
    if bad.any():
        for i in np.nonzero(bad)[0]:
            bm2[i] = 0.5 * (bm2[(i - 1) % K] + bm2[(i + 1) % K])
    return bm2


def _bspline_weights(w, order: int):
    """M_order(w + j) for j = 0..order-1, vectorized over w in [0,1).

    Cox-de Boor: M_2(x) = 1 - |x - 1| on [0,2);
    M_n(x) = [x M_{n-1}(x) + (n - x) M_{n-1}(x-1)] / (n-1).
    Returns array shaped w.shape + (order,).
    """
    j = jnp.arange(order, dtype=w.dtype)
    x = w[..., None] + j  # M_n support is [0, n]; these are the nonzero knots

    def M(n, x):
        if n == 2:
            return jnp.clip(1.0 - jnp.abs(x - 1.0), 0.0, None)
        return (x * M(n - 1, x) + (n - x) * M(n - 1, x - 1.0)) / (n - 1)

    return M(order, x)


@dataclasses.dataclass(frozen=True)
class PmeSetup:
    alpha: float
    grid: tuple  # (K1, K2, K3)
    bm2x: np.ndarray
    bm2y: np.ndarray
    bm2z: np.ndarray

    def reciprocal_energy(self, charges, positions, box_diag):
        return _reciprocal_energy(self.grid, self.alpha,
                                  jnp.asarray(self.bm2x), jnp.asarray(self.bm2y),
                                  jnp.asarray(self.bm2z),
                                  charges, positions, box_diag)

    def spread(self, charges, positions, box_diag):
        return spread_charge_grid(self.grid, charges, positions, box_diag)

    def energy_of_grid(self, Q, box_diag):
        return grid_energy(self.grid, self.alpha,
                           jnp.asarray(self.bm2x), jnp.asarray(self.bm2y),
                           jnp.asarray(self.bm2z), Q, box_diag)


def setup_pme(cutoff: float, tol: float, box_diag, alpha=None, grid=None) -> PmeSetup:
    a = alpha if alpha else choose_alpha(cutoff, tol)
    g = grid if grid else choose_grid(a, box_diag, tol)
    return PmeSetup(alpha=a, grid=tuple(int(k) for k in g),
                    bm2x=_bspline_moduli(PME_ORDER, g[0]),
                    bm2y=_bspline_moduli(PME_ORDER, g[1]),
                    bm2z=_bspline_moduli(PME_ORDER, g[2]))


def _reciprocal_energy(grid, alpha, bm2x, bm2y, bm2z, charges, positions, box_diag):
    Q = spread_charge_grid(grid, charges, positions, box_diag)
    return grid_energy(grid, alpha, bm2x, bm2y, bm2z, Q, box_diag)


def spread_charge_grid(grid, charges, positions, box_diag):
    """B-spline charge spreading -> (K1, K2, K3) grid, as MXU matmuls.

    Separable from the reciprocal sum so the sharded engine
    (parallel/sharded.py) can spread disjoint atom chunks per device and
    psum the grids."""
    K1, K2, K3 = grid
    n = positions.shape[0]
    dtype = positions.dtype

    # fractional coordinates scaled to the grid (wrapped into the box)
    u = positions / box_diag  # (N, 3)
    u = (u - jnp.floor(u)) * jnp.asarray([K1, K2, K3], dtype)
    ti = jnp.floor(u)
    w = u - ti  # in [0, 1)
    ti = ti.astype(jnp.int32)

    # separable B-spline weights, (N, order) per dimension
    wx = _bspline_weights(w[:, 0], PME_ORDER)
    wy = _bspline_weights(w[:, 1], PME_ORDER)
    wz = _bspline_weights(w[:, 2], PME_ORDER)

    # grid indices for offset j: (floor(u) - j) mod K
    j = jnp.arange(PME_ORDER, dtype=jnp.int32)
    ix = jnp.mod(ti[:, 0:1] - j, K1)  # (N, order)
    iy = jnp.mod(ti[:, 1:2] - j, K2)
    iz = jnp.mod(ti[:, 2:3] - j, K3)

    # Spread as matmuls (MXU-native, no scatter): per-dimension dense
    # one-hot weight matrices W[i, k] = sum_j w_ij [k == idx_ij], then
    #   Q[a, bc] = (q Wx)^T @ (Wy (x) Wz)
    # chunked over atoms to bound the (chunk, K2*K3) intermediate.
    chunk = min(4096, n)
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n

    def padded(x, fill=0):
        if pad == 0:
            return x
        return jnp.concatenate(
            [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)], axis=0)

    qWx_all = padded(charges[:, None] * wx)      # (Np, o)
    wy_all = padded(wy)
    wz_all = padded(wz)
    ix_all = padded(ix)
    iy_all = padded(iy)
    iz_all = padded(iz)

    kx = jnp.arange(K1, dtype=jnp.int32)
    ky = jnp.arange(K2, dtype=jnp.int32)
    kz = jnp.arange(K3, dtype=jnp.int32)

    def one_hot_weights(idx_c, w_c, k):
        # (chunk, K): sum over the `order` taps of w * [k == idx]
        acc = jnp.zeros((idx_c.shape[0], k.shape[0]), dtype)
        for t in range(PME_ORDER):
            acc = acc + w_c[:, t:t + 1] * (idx_c[:, t:t + 1] == k[None, :])
        return acc

    def body(Q, c):
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, c * chunk, chunk)
        Wx = one_hot_weights(sl(ix_all), sl(qWx_all), kx)   # (chunk, K1)
        Wy = one_hot_weights(sl(iy_all), sl(wy_all), ky)    # (chunk, K2)
        Wz = one_hot_weights(sl(iz_all), sl(wz_all), kz)    # (chunk, K3)
        Wyz = (Wy[:, :, None] * Wz[:, None, :]).reshape(chunk, K2 * K3)
        return Q + jnp.dot(Wx.T, Wyz, preferred_element_type=dtype), None

    # scan (not fori_loop) so reverse-mode autodiff works through the chunks
    Q, _ = jax.lax.scan(body, jnp.zeros((K1, K2 * K3), dtype),
                        jnp.arange(n_chunks))
    return Q.reshape(K1, K2, K3)


def grid_energy(grid, alpha, bm2x, bm2y, bm2z, Q, box_diag):
    """Reciprocal-space energy of a spread charge grid."""
    K1, K2, K3 = grid
    dtype = Q.dtype
    F = jnp.fft.fftn(Q)
    m1 = jnp.fft.fftfreq(K1, d=1.0 / K1).astype(dtype)  # signed integer freqs
    m2 = jnp.fft.fftfreq(K2, d=1.0 / K2).astype(dtype)
    m3 = jnp.fft.fftfreq(K3, d=1.0 / K3).astype(dtype)
    mx = m1[:, None, None] / box_diag[0]
    my = m2[None, :, None] / box_diag[1]
    mz = m3[None, None, :] / box_diag[2]
    m_sq = mx * mx + my * my + mz * mz
    bm2 = (bm2x[:, None, None].astype(dtype) * bm2y[None, :, None].astype(dtype)
           * bm2z[None, None, :].astype(dtype))
    volume = box_diag[0] * box_diag[1] * box_diag[2]
    pi = jnp.asarray(np.pi, dtype)
    m_sq_safe = jnp.where(m_sq > 0, m_sq, 1.0)
    eterm = jnp.where(m_sq > 0,
                      jnp.exp(-pi * pi * m_sq_safe / (alpha * alpha)) / m_sq_safe * bm2,
                      0.0)
    S2 = jnp.real(F) ** 2 + jnp.imag(F) ** 2
    return ONE_4PI_EPS0 / (2.0 * pi * volume) * jnp.sum(eterm * S2)
