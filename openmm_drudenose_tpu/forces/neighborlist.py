"""Fixed-capacity cell-list neighbor lists, built on device with static
shapes.

The reference never needs this (it delegates pair enumeration to OpenMM's
CUDA neighbor machinery); for the TPU rebuild it is the scaling workhorse
(SURVEY.md section 7 'hard parts' item 3).

Design (all static shapes, jit/scan-safe):

  1. bin atoms into cells of side >= cutoff+skin (grid dims fixed at
     compile time from the reference box)
  2. argsort by flat cell id -> per-cell ranks -> scatter into a
     (n_cells, cell_capacity) table (mode='drop', overflow detected)
  3. per atom, gather the 27 neighboring cells' occupants, mask by
     distance <= (cutoff+skin)^2 and by the static exclusion table,
     compact to the first K hits via a stable argsort of the mask
  4. pad with N (a sentinel row of zeros is appended to gathered arrays)

Rebuilds happen inside the jitted step every `rebuild_interval` steps
(lax.cond), with the skin absorbing motion in between.  Overflow (cell or
neighbor capacity) sets a sticky flag in the state that the host surfaces.

Atom chunking (lax.map over row blocks) caps the transient candidate
buffers at rebuild to ~chunk * 27 * cell_capacity entries.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class Neighbors(NamedTuple):
    idx: jax.Array        # (N, K) int32 neighbor indices, padded with N
    overflow: jax.Array   # () bool — capacity exceeded somewhere
    ref_positions: jax.Array  # (N, 3) positions at last rebuild (skin check)


@dataclasses.dataclass(frozen=True)
class NeighborConfig:
    cutoff: float
    skin: float
    grid: tuple            # (nx, ny, nz) cells
    cell_capacity: int
    max_neighbors: int     # K
    rebuild_interval: int
    chunk: int = 2048

    @property
    def r_list(self) -> float:
        return self.cutoff + self.skin


def make_config(cutoff: float, box_diag, n_atoms: int, skin: float = 0.1,
                rebuild_interval: int = 16, density_margin: float = 2.0,
                max_neighbors: int | None = None) -> NeighborConfig:
    """Capacities are sized from mean density times `density_margin`; the
    overflow flag + `grow()` handle inhomogeneous systems (the Context
    retries with a larger capacity when a build overflows)."""
    box_diag = np.asarray(box_diag, np.float64)
    r_list = cutoff + skin
    grid = tuple(max(int(np.floor(L / r_list)), 1) for L in box_diag)
    n_cells = int(np.prod(grid))
    density = n_atoms / float(np.prod(box_diag))
    cell_vol = float(np.prod(box_diag)) / n_cells
    cell_capacity = min(int(np.ceil(density * cell_vol * density_margin)) + 8,
                        n_atoms)
    if max_neighbors is None:
        sphere = 4.0 / 3.0 * np.pi * r_list**3
        max_neighbors = int(np.ceil(density * sphere * density_margin)) + 16
        max_neighbors = min(max_neighbors, n_atoms)
    return NeighborConfig(cutoff=float(cutoff), skin=float(skin), grid=grid,
                          cell_capacity=cell_capacity,
                          max_neighbors=int(max_neighbors),
                          rebuild_interval=int(rebuild_interval))


def grow(cfg: NeighborConfig, n_atoms: int, factor: float = 1.5
         ) -> NeighborConfig:
    return dataclasses.replace(
        cfg,
        cell_capacity=min(int(cfg.cell_capacity * factor) + 1, n_atoms),
        max_neighbors=min(int(cfg.max_neighbors * factor) + 1, n_atoms))


def build_exclusion_table(n_atoms: int, exc_i, exc_j,
                          max_exclusions: int | None = None) -> jnp.ndarray:
    """(N, E) per-atom exclusion table padded with -1 (static, from
    exceptions; symmetric)."""
    lists: list[list[int]] = [[] for _ in range(n_atoms)]
    for a, b in zip(np.asarray(exc_i), np.asarray(exc_j)):
        lists[int(a)].append(int(b))
        lists[int(b)].append(int(a))
    E = max_exclusions or max((len(l) for l in lists), default=0)
    E = max(E, 1)
    table = np.full((n_atoms, E), -1, np.int32)
    for i, l in enumerate(lists):
        if len(l) > E:
            raise ValueError(f"atom {i} has {len(l)} exclusions > capacity {E}")
        table[i, :len(l)] = l
    return jnp.asarray(table)


def _offsets_for_grid(grid) -> np.ndarray:
    """Neighbor-cell offsets, deduplicated for small grids (with n < 3 cells
    in a dimension, -1 and +1 wrap to the same cell and would double-count
    candidate pairs)."""
    def per_dim(n):
        if n >= 3:
            return (-1, 0, 1)
        if n == 2:
            return (0, 1)
        return (0,)
    return np.array([(dx, dy, dz)
                     for dx in per_dim(grid[0])
                     for dy in per_dim(grid[1])
                     for dz in per_dim(grid[2])], np.int32)


def build_neighbors(positions, box_diag, cfg: NeighborConfig,
                    exclusion_table=None) -> Neighbors:
    n = positions.shape[0]
    grid = jnp.asarray(cfg.grid, jnp.int32)
    n_cells = int(np.prod(cfg.grid))
    dtype = positions.dtype

    # wrap into the box and bin
    frac = positions / box_diag
    frac = frac - jnp.floor(frac)
    cell3 = jnp.clip((frac * grid).astype(jnp.int32), 0, grid - 1)  # (N, 3)
    flat = (cell3[:, 0] * cfg.grid[1] + cell3[:, 1]) * cfg.grid[2] + cell3[:, 2]

    # When the cell neighborhood covers the whole box (small grids) the
    # cell table buys nothing — every atom is a candidate instead.
    n_off_static = _offsets_for_grid(cfg.grid).shape[0]
    all_candidates = n_off_static * cfg.cell_capacity >= n

    if not all_candidates:
        order = jnp.argsort(flat)
        sorted_flat = flat[order]
        # rank of each atom within its cell
        starts = jnp.searchsorted(sorted_flat,
                                  jnp.arange(n_cells, dtype=flat.dtype))
        rank = (jnp.arange(n, dtype=jnp.int32)
                - starts[sorted_flat].astype(jnp.int32))
        cell_overflow = jnp.any(rank >= cfg.cell_capacity)
        table = jnp.full((n_cells, cfg.cell_capacity), n, jnp.int32)
        table = table.at[sorted_flat, rank].set(order.astype(jnp.int32),
                                                mode="drop")
    else:
        cell_overflow = jnp.zeros((), bool)

    # periodic neighborhoods (27 cells, fewer on small grids)
    offsets = jnp.asarray(_offsets_for_grid(cfg.grid))
    r_list2 = jnp.asarray(cfg.r_list**2, dtype)
    # NOTE: all big intermediates below are kept strictly 2D with the large
    # candidate count in the lane (last) dimension — a trailing size-3 xyz
    # axis would be lane-padded 3 -> 128 on TPU (42x memory).
    far = 2 * cfg.r_list + box_diag
    px = jnp.concatenate([positions[:, 0], far[0:1]])
    py = jnp.concatenate([positions[:, 1], far[1:2]])
    pz = jnp.concatenate([positions[:, 2], far[2:3]])

    K = cfg.max_neighbors

    def per_chunk(args):
        idx_chunk, = args  # (chunk,) atom indices (may contain n = padding)
        safe = jnp.minimum(idx_chunk, n - 1)
        if all_candidates:
            cand = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32),
                                    (idx_chunk.shape[0], n))
        else:
            c3 = cell3[safe]                               # (chunk, 3)
            ncells3 = (c3[:, None, :] + offsets[None, :, :]) % grid
            nflat = ((ncells3[..., 0] * cfg.grid[1] + ncells3[..., 1])
                     * cfg.grid[2] + ncells3[..., 2])      # (chunk, n_off)
            cand = table[nflat].reshape(idx_chunk.shape[0], -1)

        def dist2_comp(p, b):
            d = p[safe][:, None] - p[cand]
            d = d - b * jnp.round(d / b)
            return d * d
        r2 = (dist2_comp(px, box_diag[0]) + dist2_comp(py, box_diag[1])
              + dist2_comp(pz, box_diag[2]))
        mask = (r2 <= r_list2) & (cand != idx_chunk[:, None]) & (cand < n)
        if exclusion_table is not None:
            excl = exclusion_table[safe]                   # (chunk, E)
            for e in range(excl.shape[1]):
                mask = mask & (cand != excl[:, e:e + 1])
        count = jnp.sum(mask, axis=1)
        # compact via cumsum + scatter (a sort over the candidate axis is
        # ~100x more expensive on TPU): hit m goes to column cumsum(mask)-1
        chunk_n = idx_chunk.shape[0]
        dest = jnp.cumsum(mask.astype(jnp.int32), axis=1) - 1
        rows = jax.lax.broadcasted_iota(jnp.int32, mask.shape, 0)
        writable = mask & (dest < K)
        flat_dest = jnp.where(writable, rows * K + dest, chunk_n * K)
        taken = jnp.full((chunk_n * K + 1,), n, jnp.int32)
        taken = taken.at[flat_dest.reshape(-1)].set(
            cand.reshape(-1).astype(jnp.int32), mode="drop")
        return taken[:chunk_n * K].reshape(chunk_n, K), count

    chunk = min(cfg.chunk, n)
    n_chunks = -(-n // chunk)
    padded = jnp.concatenate(
        [jnp.arange(n, dtype=jnp.int32),
         jnp.full((n_chunks * chunk - n,), n, jnp.int32)])
    idx_chunks, counts = jax.lax.map(
        per_chunk, (padded.reshape(n_chunks, chunk),))
    idx = idx_chunks.reshape(-1, K)[:n]
    counts = counts.reshape(-1)[:n]
    overflow = cell_overflow | jnp.any(counts > K)
    return Neighbors(idx=idx, overflow=overflow, ref_positions=positions)


def needs_rebuild(neighbors: Neighbors, positions, box_diag,
                  cfg: NeighborConfig):
    """True when some atom moved more than skin/2 since the last rebuild."""
    d = positions - neighbors.ref_positions
    d = d - box_diag * jnp.round(d / box_diag)
    max_d2 = jnp.max(jnp.sum(d * d, axis=-1))
    return max_d2 > (0.5 * cfg.skin) ** 2
