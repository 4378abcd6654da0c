"""Cell-pair dense-block nonbonded kernel — the TPU-native hot path.

Instead of per-atom neighbor lists (random gathers of ~1e8 elements per
step, which TPUs hate), atoms are spatially sorted into fixed-capacity
cells every `rebuild_interval` steps, and the direct-space sum is computed
as dense (C x C) blocks between each cell and its static neighbor-cell
stencil:

  * all per-step data movement is contiguous: one (N,)-gather to sort
    positions into cell-major order, regular block reads after that
  * the pair math is pure fused elementwise work on (n_cells, C, C)
    blocks — VPU-shaped, and exactly the block structure a Pallas kernel
    wants (ops/ later)
  * forces are computed analytically in the same pass (row-sums over the
    block axis, no scatter in the hot loop) and exposed through a
    custom_vjp, so `jax.grad` of the total energy stays cheap
  * exclusions are tested with an index-window bitmask: excluded pairs are
    intramolecular, so |i - j| <= W for a small static W; each atom carries
    (2W+1) bits packed into int32 words

The reference delegates all of this to OpenMM's CUDA neighbor machinery;
this module is its TPU-native replacement (SURVEY.md section 7, 'hard
parts' items 2-3).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..units import ONE_4PI_EPS0


class CellSort(NamedTuple):
    slot_atom: jax.Array   # (S,) int32 atom index per cell slot (N = empty)
    inv_slot: jax.Array    # (N,) int32 slot of each atom
    overflow: jax.Array    # () bool
    ref_positions: jax.Array  # (N, 3) at last rebuild
    image: jax.Array       # (N, 3) int32 floor(pos/box) at last rebuild —
    #  positions minus image*box are continuous "box frame" coordinates
    #  consistent with the cell assignment (atoms drifting across the box
    #  boundary between rebuilds stay continuous, so the static per-cell
    #  image shifts below remain exact)
    # the compile-time stencil no longer covers r_list at the current box
    # (NPT shrink): Context replans the grid when latched
    stencil_invalid: jax.Array = None
    # an atom moved further than skin/2 since the previous rebuild: pairs
    # may have been missed for up to rebuild_interval steps (diagnostic,
    # latched by the in-step rebuild; surfaced as a warning)
    drift_exceeded: jax.Array = None
    # (n_pencils * pen_capacity,) atom ids compacted per (x, y) pencil
    # (N = pad) — the PME packed spread's contraction structure; built only
    # when cfg.pen_capacity > 0
    pen_atom: jax.Array = None
    # (N,) pencil slot of each atom (inverse of pen_atom) — the
    # hand-written PME interpolation force's slot->atom gather
    pen_inv: jax.Array = None
    # an excluded (intramolecular) pair was binned into cells >= 2 apart
    # in some dimension at this rebuild — the Pallas sweep's far-offset
    # exclusion-test skip (ops/pallas_sweep.py excl_skip) would then miss
    # it; latched only when build_cellsort is given excl_ij (i.e. when the
    # skip is active).  Cell assignment is frozen between rebuilds, so
    # checking at rebuild time is exact, not heuristic.
    excl_span_exceeded: jax.Array = None


@dataclasses.dataclass(frozen=True)
class CellPairConfig:
    cutoff: float
    skin: float
    grid: tuple              # cells per dimension
    capacity: int            # atoms per cell (C)
    nbr_map: tuple           # static flattened neighbor-cell map, shape info below
    n_offsets: int
    rebuild_interval: int
    excl_window: int         # W
    excl_words: int          # ceil((2W+1)/31)
    half_stencil: bool = False
    inv_map: tuple = None    # inverse permutation per offset (half stencil)
    offsets: tuple = None    # the (n_off, 3) stencil offsets
    regular: bool = False    # all dims have >= 2w+1 cells: shift tables +
                             # box-frame coords replace per-pair round()
    window: tuple = None     # stencil half-width per dim (cells)
    pen_capacity: int = 0    # atoms per (x,y) pencil for the packed PME
                             # spread (0 = pencil packing off); set by
                             # forces/nonbonded.py when PME re-plans its
                             # grid on the cell grid
    trimmed: tuple = ()      # per-dim gap cell counts max(|o|-1, 0) of
                             # stencil offsets DROPPED because their
                             # closest cell-to-cell approach exceeds
                             # r_list at plan time; build_cellsort latches
                             # stencil_invalid if a live (NPT) box brings
                             # any of them back within range
    # flattened replica ensembles (parallel/flatrep.py): R identical
    # replicas embedded in ONE extended cell grid along x and z —
    # grid = (rx*gx0, gy0, rz*gz0) — with per-replica wrap periods, so the
    # sweep's tiles fill the 128-lane axis even when each replica's own
    # (y, z) plane is tiny.  Atoms are replica-major: atom a belongs to
    # replica a // (n_atoms / n_replicas), replica r = r_x * rz + r_z.
    # Stencil wraps stay inside each replica's band by construction, so
    # replicas never interact.
    n_replicas: int = 1
    x_period: int = 0        # per-replica gx (0 = grid[0], no x embedding)
    z_period: int = 0        # per-replica gz (0 = grid[2], no z embedding)
    # triclinic (reduced row-vector) boxes: cells are fractional-space
    # parallelepipeds — binning uses fractional coordinates, cell centers
    # are ((c3+0.5)/g) @ box, and each stencil offset's constant becomes
    # t = (o/g) @ box.  The sweep's cell-local identity
    # pair_delta = a_loc - (b_loc + t) is UNCHANGED (wraps still vanish
    # into t: center(a) + t = center(b_wrapped) + shift @ box exactly as
    # in the orthorhombic proof).  Stencil window/trim move to the
    # perpendicular plane-spacing metric w_d/g_d (boxutils.plane_widths).
    # Requires a regular grid; `box` arguments arrive as (3, 3).
    triclinic: bool = False

    @property
    def r_list(self) -> float:
        return self.cutoff + self.skin

    @property
    def n_cells(self) -> int:
        return int(np.prod(self.grid))

    @property
    def phys_grid(self) -> tuple:
        """The per-replica (physical) grid dimensions: wrap periods for
        embedded replica ensembles, the plain grid otherwise."""
        return (self.x_period or self.grid[0], self.grid[1],
                self.z_period or self.grid[2])


def _neighbor_offsets(grid, window) -> np.ndarray:
    def per_dim(n, w):
        if n >= 2 * w + 1:
            return range(-w, w + 1)
        # small grids: every distinct wrapped offset exactly once
        return range(0, min(n, 2 * w + 1))
    return np.array([(a, b, c)
                     for a in per_dim(grid[0], window[0])
                     for b in per_dim(grid[1], window[1])
                     for c in per_dim(grid[2], window[2])], np.int32)


def make_config(cutoff: float, box_diag, n_atoms: int, exc_i, exc_j,
                skin: float = 0.1, rebuild_interval: int = 16,
                cells_per_cutoff: int = 2, density_margin: float = 1.35,
                capacity: int | None = None,
                allow_half: bool = True,
                grid_x_multiple: int = 1) -> CellPairConfig:
    """`box_diag` is a (3,) diagonal (orthorhombic) or a (3, 3) reduced
    row-vector matrix (triclinic); triclinic grids plan in the
    perpendicular plane-width metric and must come out regular."""
    box_in = np.asarray(box_diag, np.float64)
    triclinic = box_in.ndim == 2
    if triclinic:
        from .boxutils import plane_widths
        widths = np.asarray(plane_widths(box_in), np.float64)
        volume = float(np.prod(np.diagonal(box_in)))
    else:
        widths = box_in
        volume = float(np.prod(box_in))
    r_list = cutoff + skin
    target = r_list / cells_per_cutoff
    grid = tuple(max(int(np.floor(L / target)), 1) for L in widths)
    if grid_x_multiple > 1:
        # slab decompositions (parallel/resident.py) need gx divisible by
        # the device count; rounding DOWN keeps cells >= target so the
        # stencil window still covers r_list (window recomputed below)
        gx = max((grid[0] // grid_x_multiple) * grid_x_multiple,
                 grid_x_multiple)
        grid = (gx, grid[1], grid[2])
    cell_size = widths / np.array(grid)      # plane spacings for triclinic
    window = tuple(int(np.ceil(r_list / cell_size[d])) for d in range(3))
    n_cells = int(np.prod(grid))
    if capacity is None:
        density = n_atoms / volume
        cap = int(np.ceil(density * volume / n_cells * density_margin)) + 2
        capacity = max(int(np.ceil(cap / 8)) * 8, 8)
    if triclinic and not all(g >= 2 * w + 1
                             for g, w in zip(grid, window)):
        raise ValueError(
            f"triclinic cell-pair sweeps need a regular grid (>= 2w+1 "
            f"cells per dim); got grid {grid}, window {window} — the box "
            "is too small relative to the cutoff; use strategy='dense'")
    offsets = _neighbor_offsets(grid, window)

    # Newton's-3rd-law half stencil when the full stencil is +/- symmetric
    # (all dims have >= 2w+1 cells): keep the self offset plus one of each
    # +/-o pair; the block sweep then credits forces to both sides.
    regular = all(g >= 2 * w + 1 for g, w in zip(grid, window))
    half = allow_half and regular
    if half:
        sel = [o for o in offsets.tolist()
               if (o[0], o[1], o[2]) > (0, 0, 0)]
        offsets = np.array([[0, 0, 0]] + sel, np.int32)

    # drop stencil offsets whose closest cell-to-cell approach
    # (per-dim gap of max(|o|-1, 0) whole cells) exceeds r_list — the
    # window box's far corners can't contribute pairs.  Only for regular
    # grids, where offset +-o is geometrically unambiguous (no wrap
    # aliasing).  The dropped gap vectors are kept so build_cellsort can
    # latch stencil_invalid if an NPT box shrink re-activates one.
    # Triclinic metric: the per-dim plane gaps are not orthogonal
    # components, so the valid lower bound is their MAX, not the
    # Euclidean norm (less aggressive trimming, still sound).
    trimmed = ()
    if regular:
        gap = np.maximum(np.abs(offsets) - 1, 0) * cell_size[None, :]
        reach = (np.max(gap, axis=1) if triclinic
                 else np.sqrt(np.sum(gap * gap, axis=1)))
        drop = reach > r_list
        if np.any(drop):
            trimmed = tuple(map(tuple, np.maximum(
                np.abs(offsets[drop]) - 1, 0).tolist()))
            offsets = offsets[~drop]

    # static neighbor-cell map (n_cells, n_off) and its per-offset inverse
    # permutation (cell that has c as its o-th neighbor), used to credit
    # Newton's-third-law reaction forces by gather instead of scatter
    cz = np.arange(n_cells)
    c3 = np.stack([cz // (grid[1] * grid[2]),
                   (cz // grid[2]) % grid[1],
                   cz % grid[2]], axis=1)
    nb3 = (c3[:, None, :] + offsets[None, :, :]) % np.array(grid)
    nbr = (nb3[..., 0] * grid[1] + nb3[..., 1]) * grid[2] + nb3[..., 2]
    ib3 = (c3[:, None, :] - offsets[None, :, :]) % np.array(grid)
    inv = (ib3[..., 0] * grid[1] + ib3[..., 1]) * grid[2] + ib3[..., 2]

    # exclusion window
    exc_i = np.asarray(exc_i, np.int64)
    exc_j = np.asarray(exc_j, np.int64)
    W = int(np.abs(exc_i - exc_j).max()) if len(exc_i) else 0
    n_words = max((2 * W + 1 + 30) // 31, 1)

    return CellPairConfig(
        cutoff=float(cutoff), skin=float(skin), grid=grid,
        capacity=int(capacity),
        nbr_map=(tuple(nbr.reshape(-1).tolist()), nbr.shape),
        n_offsets=len(offsets), rebuild_interval=int(rebuild_interval),
        excl_window=W, excl_words=n_words, half_stencil=half,
        inv_map=(tuple(inv.reshape(-1).tolist()), inv.shape),
        offsets=tuple(map(tuple, offsets.tolist())), regular=regular,
        window=window, trimmed=trimmed, triclinic=triclinic)


def make_ensemble_config(cutoff: float, box_diag0, n0: int, n_replicas: int,
                         exc_i, exc_j, rx: int, rz: int,
                         skin: float = 0.1, rebuild_interval: int = 16,
                         cells_per_cutoff: int = 2,
                         density_margin: float = 1.35,
                         capacity: int | None = None,
                         allow_half: bool = True) -> CellPairConfig:
    """Cell-pair config for a FLATTENED replica ensemble: rx*rz identical
    replicas of an n0-atom system (replica-major atom order, shared box
    `box_diag0`) embedded in one extended grid (rx*gx0, gy0, rz*gz0) with
    per-replica wrap periods.  Small replicas then fill the sweep's
    128-lane tiles — the whole point (a vmapped per-replica sweep at
    n_yz ~ 25 lanes pads ~5x; see ROADMAP round-3 design notes).

    exc_i/exc_j are the TEMPLATE replica's excluded pairs (the exclusion
    window and trim geometry are per-replica properties)."""
    if rx * rz != n_replicas:
        raise ValueError(f"rx*rz = {rx}*{rz} != n_replicas = {n_replicas}")
    box_diag0 = np.asarray(box_diag0, np.float64)
    r_list = cutoff + skin
    target = r_list / cells_per_cutoff
    pgrid = tuple(max(int(np.floor(L / target)), 1) for L in box_diag0)
    cell_size = box_diag0 / np.array(pgrid)
    window = tuple(int(np.ceil(r_list / cell_size[d])) for d in range(3))
    if not all(g >= 2 * w + 1 for g, w in zip(pgrid, window)):
        raise ValueError(
            f"flattened ensembles need a regular per-replica grid "
            f"(>= 2w+1 cells per dim); got grid {pgrid}, window {window} — "
            f"the replica box is too small for the cutoff")
    if capacity is None:
        density = n0 / float(np.prod(box_diag0))
        cap = int(np.ceil(density * np.prod(cell_size) * density_margin)) + 2
        capacity = max(int(np.ceil(cap / 8)) * 8, 8)

    offsets = _neighbor_offsets(pgrid, window)
    half = allow_half
    if half:
        sel = [o for o in offsets.tolist() if (o[0], o[1], o[2]) > (0, 0, 0)]
        offsets = np.array([[0, 0, 0]] + sel, np.int32)
    trimmed = ()
    gap = np.maximum(np.abs(offsets) - 1, 0) * cell_size[None, :]
    reach = np.sqrt(np.sum(gap * gap, axis=1))
    drop = reach > r_list
    if np.any(drop):
        trimmed = tuple(map(tuple, np.maximum(
            np.abs(offsets[drop]) - 1, 0).tolist()))
        offsets = offsets[~drop]

    # extended-grid neighbor maps: offsets wrap modulo the PER-REPLICA
    # periods in x and z (y is not embedded), so stencil neighbors stay in
    # the owning replica's band
    gx0, gy0, gz0 = pgrid
    grid = (rx * gx0, gy0, rz * gz0)
    n_cells = int(np.prod(grid))
    cz = np.arange(n_cells)
    ix = cz // (grid[1] * grid[2])
    iy = (cz // grid[2]) % grid[1]
    iz = cz % grid[2]
    bx, lx = ix // gx0, ix % gx0          # x band, local x
    bz, lz = iz // gz0, iz % gz0

    def flat(jx, jy, jz):
        return (jx * grid[1] + jy) * grid[2] + jz

    def wrapped(sign):
        out = np.empty((n_cells, len(offsets)), np.int64)
        for k, (ox, oy, oz) in enumerate(offsets.tolist()):
            jx = bx * gx0 + (lx + sign * ox) % gx0
            jy = (iy + sign * oy) % gy0
            jz = bz * gz0 + (lz + sign * oz) % gz0
            out[:, k] = flat(jx, jy, jz)
        return out

    nbr = wrapped(+1)
    inv = wrapped(-1)

    exc_i = np.asarray(exc_i, np.int64)
    exc_j = np.asarray(exc_j, np.int64)
    W = int(np.abs(exc_i - exc_j).max()) if len(exc_i) else 0
    n_words = max((2 * W + 1 + 30) // 31, 1)

    return CellPairConfig(
        cutoff=float(cutoff), skin=float(skin), grid=grid,
        capacity=int(capacity),
        nbr_map=(tuple(nbr.reshape(-1).tolist()), nbr.shape),
        n_offsets=len(offsets), rebuild_interval=int(rebuild_interval),
        excl_window=W, excl_words=n_words, half_stencil=half,
        inv_map=(tuple(inv.reshape(-1).tolist()), inv.shape),
        offsets=tuple(map(tuple, offsets.tolist())), regular=True,
        window=window, trimmed=trimmed,
        n_replicas=int(n_replicas), x_period=gx0, z_period=gz0)


def pencil_perm(cfg: CellPairConfig) -> np.ndarray:
    """(n_pen,) int32 permutation renumbering the natural per-(x, y,
    z-band) pencil ids (flat cell // z_period order: x_ext-major, then y,
    then z-band) into replica-major order
        new = ((r_x*rz + r_z) * gx0 + lx) * gy0 + y
    so the ensemble pencil tables reshape directly to (R, gx0*gy0, Cp)."""
    gx, gy, gz = cfg.grid
    gx0 = cfg.x_period or gx
    gz0 = cfg.z_period or gz
    rz = gz // gz0
    n_pen = gx * gy * rz
    p = np.arange(n_pen)
    x_ext = p // (gy * rz)
    y = (p // rz) % gy
    bz = p % rz
    bx, lx = x_ext // gx0, x_ext % gx0
    return (((bx * rz + bz) * gx0 + lx) * gy + y).astype(np.int32)


def rep_of_cell(cfg: CellPairConfig) -> np.ndarray:
    """(n_cells,) int32 replica index of each extended cell (embedded
    ensemble grids: x/z band decomposition matching build_cellsort)."""
    gx, gy, gz = cfg.grid
    px = cfg.x_period or gx
    pz = cfg.z_period or gz
    rz = gz // pz
    cz = np.arange(int(np.prod(cfg.grid)))
    ix = cz // (gy * gz)
    iz = cz % gz
    return ((ix // px) * rz + iz // pz).astype(np.int32)


def reduce_cells_to_replicas(e_cell, cfg: CellPairConfig):
    """(n_cells,) per-cell values -> (R,) per-replica sums by pure
    reshape-sum over the (x, z) band structure (no scatters)."""
    gx, gy, gz = cfg.grid
    px = cfg.x_period or gx
    pz = cfg.z_period or gz
    rx, rz = gx // px, gz // pz
    return e_cell.reshape(rx, px, gy, rz, pz).sum(axis=(1, 2, 4)).reshape(
        rx * rz)


def _local_c3(cfg: CellPairConfig) -> np.ndarray:
    """(n_cells, 3) per-replica-LOCAL cell indices (float64): the sweep's
    cell centers are local to each replica's own box frame, so embedded
    ensemble grids reduce the extended index modulo the wrap periods."""
    grid = cfg.grid
    px, py, pz = cfg.phys_grid
    cz = np.arange(int(np.prod(grid)))
    ix = (cz // (grid[1] * grid[2])) % px
    iy = (cz // grid[2]) % py
    iz = cz % pz
    return np.stack([ix, iy, iz], axis=1).astype(np.float64)


def _shift_table(cfg: CellPairConfig) -> np.ndarray:
    """(n_off, 3, n_cells) int8 periodic-image shift of each offset's
    neighbor cell relative to the row cell: +1 when the stencil wraps the
    high box face, -1 the low face.  With box-frame coordinates (positions
    minus rebuild image*box) the pair separation is exactly
    a - (b + shift*box): no per-pair round() min-imaging needed."""
    grid = np.array(cfg.grid)
    n_cells = int(np.prod(grid))
    cz = np.arange(n_cells)
    c3 = np.stack([cz // (grid[1] * grid[2]),
                   (cz // grid[2]) % grid[1],
                   cz % grid[2]], axis=1)                     # (n_cells, 3)
    off = np.array(cfg.offsets, np.int64)                     # (n_off, 3)
    sh = (c3[None, :, :] + off[:, None, :]) // grid           # floor div
    return sh.transpose(0, 2, 1).astype(np.int8)              # (n_off,3,nc)


def grow(cfg: CellPairConfig, n_atoms: int) -> CellPairConfig:
    return dataclasses.replace(
        cfg, capacity=min(int(cfg.capacity * 1.5) + 8, n_atoms))


def build_exclusion_words(n_atoms: int, exc_i, exc_j,
                          W: int, n_words: int) -> np.ndarray:
    """(N, n_words) int32: bit (d + W) set when (i, i+d) is excluded."""
    words = np.zeros((n_atoms, n_words), np.int32)
    for a, b in zip(np.asarray(exc_i), np.asarray(exc_j)):
        for i, j in ((int(a), int(b)), (int(b), int(a))):
            bit = j - i + W
            words[i, bit // 31] |= np.int32(1 << (bit % 31))
    return words


def build_cellsort(positions, box_diag, cfg: CellPairConfig,
                   excl_ij=None, rep_scale=None) -> CellSort:
    """excl_ij: optional (exc_i, exc_j) static index arrays of the excluded
    pairs.  When given, the rebuild latches CellSort.excl_span_exceeded if
    any excluded pair lands in cells >= 2 apart in some dimension (after
    periodic min-imaging of the cell delta) — the exact soundness condition
    for the Pallas sweep's far-offset exclusion-test skip.

    `box_diag` is the (3,) diagonal, or the full (3, 3) reduced matrix for
    triclinic configs (binning then happens in fractional coordinates and
    the stencil-coverage latch in the perpendicular plane-width metric)."""
    n = positions.shape[0]
    pgrid_t = cfg.phys_grid
    grid = jnp.asarray(pgrid_t, jnp.int32)
    n_cells = cfg.n_cells
    C = cfg.capacity

    if cfg.triclinic:
        from .boxutils import plane_widths
        widths = plane_widths(box_diag).astype(positions.dtype)
    else:
        widths = box_diag

    # NPT guard: the static stencil covers r_list only while
    # window_d * (width_d / grid_d) >= r_list; a shrinking box can violate
    # this silently — latch a flag so the Context replans the grid
    # flat-ensemble NPT: positions arrive in STORED coordinates (p/s), so
    # the effective list radius in this frame is r_list / min(s) — a
    # shrinking replica must trip the same stencil-coverage latch
    r_list_eff = cfg.r_list
    if rep_scale is not None:
        r_list_eff = cfg.r_list / jnp.min(rep_scale).astype(positions.dtype)
    if cfg.window is not None:
        wcell = (jnp.asarray(cfg.window, positions.dtype)
                 * widths / jnp.asarray(pgrid_t, positions.dtype))
        stencil_invalid = jnp.any(wcell < r_list_eff)
        if cfg.trimmed:
            # a shrinking NPT box can bring a trimmed far-corner offset
            # back within r_list reach even while the window still covers
            h_live = widths / jnp.asarray(pgrid_t, positions.dtype)
            gap = jnp.asarray(cfg.trimmed, positions.dtype) * h_live
            # triclinic trim metric is the per-dim MAX (see make_config)
            reach = (jnp.max(gap, axis=1) if cfg.triclinic
                     else jnp.sqrt(jnp.sum(gap * gap, axis=1)))
            stencil_invalid = stencil_invalid | jnp.any(
                reach <= r_list_eff)
    else:
        stencil_invalid = jnp.zeros((), jnp.bool_)

    # bin in the PER-REPLICA box frame; embedded ensembles then shift each
    # atom's (x, z) cell indices into its replica's band of the extended
    # grid (replica-major atoms: replica = index // n0, r = r_x*rz + r_z)
    if cfg.triclinic:
        # fractional binning, elementwise (no dot_general: TPU f32
        # matmuls read bf16 and would misbin near cell faces)
        from .boxutils import frac_coords_elem
        fr = frac_coords_elem(positions.T, box_diag).T
        image = jnp.floor(fr)
        frac = fr - image
    else:
        image = jnp.floor(positions / box_diag)
        frac = positions / box_diag - image
    cell3 = jnp.clip((frac * grid).astype(jnp.int32), 0, grid - 1)
    if cfg.n_replicas > 1:
        n0 = n // cfg.n_replicas
        rz_count = cfg.grid[2] // cfg.z_period
        rep = np.arange(n, dtype=np.int32) // n0
        band_x = jnp.asarray((rep // rz_count) * cfg.x_period)
        band_z = jnp.asarray((rep % rz_count) * cfg.z_period)
        flat = (((cell3[:, 0] + band_x) * cfg.grid[1] + cell3[:, 1])
                * cfg.grid[2] + cell3[:, 2] + band_z)
    else:
        flat = ((cell3[:, 0] * cfg.grid[1] + cell3[:, 1]) * cfg.grid[2]
                + cell3[:, 2])

    excl_span = None
    if excl_ij is not None and len(excl_ij[0]):
        ei = jnp.asarray(np.asarray(excl_ij[0], np.int32))
        ej = jnp.asarray(np.asarray(excl_ij[1], np.int32))
        d3 = cell3[ei] - cell3[ej]
        # periodic min-image of the integer cell delta (per-replica grid;
        # excluded pairs never cross replicas)
        d3 = jnp.mod(d3 + grid // 2, grid) - grid // 2
        excl_span = jnp.any(jnp.max(jnp.abs(d3), axis=1) >= 2)

    order = jnp.argsort(flat)
    sorted_flat = flat[order]
    starts = jnp.searchsorted(sorted_flat, jnp.arange(n_cells,
                                                      dtype=sorted_flat.dtype))
    rank = (jnp.arange(n, dtype=jnp.int32)
            - starts[sorted_flat].astype(jnp.int32))
    overflow = jnp.any(rank >= C)
    slot = sorted_flat.astype(jnp.int32) * C + jnp.minimum(rank, C - 1)
    slot_atom = jnp.full((n_cells * C,), n, jnp.int32)
    slot_atom = slot_atom.at[slot].set(order.astype(jnp.int32), mode="drop")
    inv_slot = jnp.zeros((n,), jnp.int32).at[order].set(slot, mode="drop")

    # (x, y)-pencil packing for the PME spread (pme.spread_pencils_packed):
    # cells are (cx, cy, cz)-major, so a pencil's atoms are contiguous in
    # `order`; its compact rank reuses the same searchsorted machinery.
    # Typical pencil capacity is ~5x tighter than gz * C.
    # Embedded replica ensembles divide by the PER-REPLICA z period, so
    # each pencil is a per-(x, y, z-band) segment owned by exactly one
    # replica; a static permutation renumbers pencils replica-major
    # ((r_x*rz + r_z)*gx0*gy0 + lx*gy0 + y) so the batched per-replica
    # spread (pme.recip_ens_packed) indexes by pure reshape.
    pen_atom = None
    pen_inv = None
    if cfg.pen_capacity:
        gz = cfg.z_period or cfg.grid[2]
        Cp = cfg.pen_capacity
        n_pen = n_cells // gz
        pen_sorted = sorted_flat // gz
        pstarts = jnp.searchsorted(
            sorted_flat, jnp.arange(n_pen, dtype=sorted_flat.dtype) * gz)
        rank_p = (jnp.arange(n, dtype=jnp.int32)
                  - pstarts[jnp.minimum(pen_sorted, n_pen - 1)]
                  .astype(jnp.int32))
        in_range = pen_sorted < n_pen
        overflow = overflow | jnp.any(in_range & (rank_p >= Cp))
        pen_id = pen_sorted.astype(jnp.int32)
        if cfg.n_replicas > 1:
            perm = jnp.asarray(pencil_perm(cfg))
            pen_id = perm[pen_id]
        pslot = jnp.where(in_range,
                          pen_id * Cp + jnp.minimum(rank_p, Cp - 1),
                          n_pen * Cp)
        pen_atom = jnp.full((n_pen * Cp,), n, jnp.int32)
        pen_atom = pen_atom.at[pslot].set(order.astype(jnp.int32),
                                          mode="drop")
        # inverse map; overflow atoms point past the end (gather clamps,
        # overflow is latched anyway)
        pen_inv = jnp.zeros((n,), jnp.int32).at[order].set(pslot,
                                                           mode="drop")

    return CellSort(slot_atom=slot_atom, inv_slot=inv_slot,
                    overflow=overflow, ref_positions=positions,
                    image=image.astype(jnp.int32),
                    stencil_invalid=stencil_invalid,
                    drift_exceeded=jnp.zeros((), jnp.bool_),
                    pen_atom=pen_atom, pen_inv=pen_inv,
                    excl_span_exceeded=excl_span)


# ---------------------------------------------------------------------------
# pair interaction kernels: (energy, dE/dr^2) per method
# ---------------------------------------------------------------------------

def _lj_e_g(sig, eps, inv_r2):
    u3 = (sig * sig * inv_r2) ** 3
    e = 4.0 * eps * u3 * (u3 - 1.0)
    g = -4.0 * eps * (6.0 * u3 * u3 - 3.0 * u3) * inv_r2  # dE/dr^2
    return e, g


def _switch(r2, inv_r, r_on, r_off):
    """OpenMM switching S(t), returns (S, dS/dr^2)."""
    r = r2 * inv_r
    t = jnp.clip((r - r_on) / (r_off - r_on), 0.0, 1.0)
    s = 1.0 + t * t * t * (-10.0 + t * (15.0 - 6.0 * t))
    ds_dt = t * t * (-30.0 + t * (60.0 - 30.0 * t))
    ds_dr2 = ds_dt / (r_off - r_on) * 0.5 * inv_r
    return s, ds_dr2


def erfc_approx(x):
    """Abramowitz & Stegun 7.1.26 rational erfc (|err| < 1.5e-7, x >= 0) —
    used inside Pallas kernels where jax.scipy's erfc cannot lower."""
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return poly * jnp.exp(-x * x)


def make_pair_eg(method: str, cutoff: float, alpha: float = 0.0,
                 krf: float = 0.0, crf: float = 0.0,
                 use_switch: bool = False, r_switch: float = 0.0,
                 erfc_fn=None, excl_in_sweep: bool = True):
    """Returns f(qq, sig, eps, r2, inv_r, inv_r2, excl) -> (e, dE/dr^2).

    `excl` marks excluded (intramolecular) pairs, which contribute nothing
    to the sweep.  With excl_in_sweep (legacy/sharded paths) the Ewald
    reciprocal-exclusion correction E = -qq erf(ar)/r is folded in here;
    the fast path computes it in the O(n_exclusions) pair-list term
    (forces/pairterms.py) instead, keeping ~6 vector passes out of the
    O(N * stencil * C^2) tile.

    In f32 erfc is the Abramowitz-Stegun 7.1.26 rational (|err| < 1.5e-7,
    i.e. below f32 epsilon) — jax.scipy.special.erfc lowers to ~40 vector
    ops per tile, the single most expensive part of the pair math."""
    two_over_sqrt_pi = 2.0 / np.sqrt(np.pi)

    def f(qq, sig, eps, r2, inv_r, inv_r2, excl):
        erfc = erfc_fn or (erfc_approx if r2.dtype == jnp.float32
                           else jax.scipy.special.erfc)
        e_lj, g_lj = _lj_e_g(sig, eps, inv_r2)
        if use_switch:
            s, ds = _switch(r2, inv_r, r_switch, cutoff)
            g_lj = g_lj * s + e_lj * ds
            e_lj = e_lj * s
        if method == "ewald":
            ar = alpha * r2 * inv_r
            erfc_ar = erfc(ar)
            e_c = qq * erfc_ar * inv_r
            # d/dr [qq erfc(ar)/r] = qq(-erfc/r^2 - 2a/sqrt(pi) e^{-a^2r^2}/r)
            g_c = -0.5 * qq * inv_r2 * (erfc_ar * inv_r
                                        + two_over_sqrt_pi * alpha
                                        * jnp.exp(-ar * ar))
            if excl_in_sweep:
                e_plain = qq * inv_r
                g_plain = -0.5 * qq * inv_r2 * inv_r
                e = jnp.where(excl, e_c - e_plain, e_lj + e_c)
                g = jnp.where(excl, g_c - g_plain, g_lj + g_c)
            else:
                zero = jnp.zeros_like(e_c)
                e = jnp.where(excl, zero, e_lj + e_c)
                g = jnp.where(excl, zero, g_lj + g_c)
            return e, g
        elif method == "rf":
            e_c = qq * (inv_r + krf * r2 - crf)
            g_c = qq * (-0.5 * inv_r2 * inv_r + krf)
        else:  # plain coulomb
            e_c = qq * inv_r
            g_c = -0.5 * qq * inv_r2 * inv_r
        zero = jnp.zeros_like(e_c)
        return (jnp.where(excl, zero, e_lj + e_c),
                jnp.where(excl, zero, g_lj + g_c))

    return f


# ---------------------------------------------------------------------------
# the block sweep: energy + forces in one pass
# ---------------------------------------------------------------------------

def _sweep_regular(params, positions, box_diag, cellsort,
                   cfg: CellPairConfig, pair_eg, coulomb_scale,
                   with_energy: bool = True, rep_scale=None,
                   energy_per_replica: bool = False):
    """Matmul-form sweep for regular grids (all dims >= 2w+1 cells).

    rep_scale (flat-ensemble NPT, (R,)): `positions` arrive in STORED
    coordinates (physical / s_r) so the grid/binning/stencil live on the
    shared template box; only the pair math sees per-replica physics —
    r2_phys = s_r^2 * r2_stored per ROW cell (row and neighbor cells are
    always in the same replica band).  Returned forces are then PHYSICAL
    (F_phys = s_r * f_contracted: E = sum e(s^2 |d_stored|^2) gives
    dE/dp_phys = (1/s) dE/dp_stored and the contractions below compute
    -(1/s^2) dE/dp_stored).  energy_per_replica returns a (R,) vector of
    per-replica sums instead of the scalar (row-cell attribution is
    exact — both pair atoms live in the row cell's replica).

    Coordinates are cell-local (box-frame position minus the cell center),
    so for stencil offset o the pair displacement is exactly
    a_loc - (b_loc + o*h): wraps and shifts vanish into the per-offset
    constant o*h, and the |a|^2 + |b|^2 - 2 a.b expansion is free of
    cancellation (|loc| <= half a cell + drift).  The cross term and both
    force contractions run as batched MXU dot_generals:

        f_a = a_loc * rowsum(g2) - g2 @ b'     (per row block)
        f_b = b' * colsum(g2) - g2^T @ a_loc   (reaction, half stencil)

    which removes the three per-component (rows, C, P*C) g2*dc tiles and
    their mixed-axis reductions from the VPU entirely."""
    n = positions.shape[0]
    n_cells, C = cfg.n_cells, cfg.capacity
    dtype = positions.dtype
    cutoff2 = cfg.cutoff * cfg.cutoff
    W = cfg.excl_window
    single_word = cfg.excl_words == 1 and 2 * W + 1 <= 31

    s = _sorted_arrays(params, positions, cellsort, cfg, n,
                       box_diag=box_diag)
    blocks = {k: v.reshape(n_cells, C) for k, v in s.items()}

    nbr_flat, nbr_shape = cfg.nbr_map
    nbr = jnp.asarray(np.array(nbr_flat, np.int32).reshape(nbr_shape))
    inv_flat, inv_shape = cfg.inv_map
    inv = jnp.asarray(np.array(inv_flat, np.int32).reshape(inv_shape))
    offs = jnp.asarray(np.array(cfg.offsets, np.float64), dtype)  # (n_off,3)

    s2_cell = None
    if rep_scale is not None:
        s_cell = rep_scale.astype(dtype)[jnp.asarray(rep_of_cell(cfg))]
        s2_cell = (s_cell * s_cell)[:, None, None]          # (nc, 1, 1)

    # cell centers (static index grid x traced cell size: NPT-safe);
    # replica-LOCAL indices for embedded ensemble grids — every replica's
    # band repeats the same per-replica centers, so the cell-local
    # coordinate identity a_loc - (b_loc + o*h) holds per replica.
    # Triclinic: centers are ((c3+0.5)/g) @ box and each offset's
    # constant is (o/g) @ box — the identity is unchanged (the stencil
    # wrap shift is a whole lattice vector, absorbed exactly as the
    # orthorhombic shift*box is); computed elementwise (bf16-safe).
    c3 = _local_c3(cfg) + 0.5
    if cfg.triclinic:
        from .boxutils import rows_combo_elem
        g_inv = 1.0 / np.asarray(cfg.phys_grid, np.float64)
        c3f = jnp.asarray((c3 * g_inv).T, dtype)            # (3, nc)
        cen = rows_combo_elem(c3f, box_diag)                # (3, nc)
        centers = [cen[d] for d in range(3)]
        offs_f = jnp.asarray(
            np.array(cfg.offsets, np.float64) * g_inv, dtype).T  # (3,n_off)
        t_all = rows_combo_elem(offs_f, box_diag).T         # (n_off, 3)
    else:
        h = box_diag.astype(dtype) / jnp.asarray(cfg.phys_grid, dtype)
        centers = [jnp.asarray(c3[:, d], dtype) * h[d] for d in range(3)]
        t_all = offs * h[None, :]                           # (n_off, 3)

    loc = [blocks[k] - centers[d][:, None]
           for d, k in enumerate("xyz")]                    # 3 x (nc, C)
    a_mat = jnp.stack(loc, axis=2)                          # (nc, C, 3)
    na = loc[0] ** 2 + loc[1] ** 2 + loc[2] ** 2            # (nc, C)
    qa = coulomb_scale * blocks["q"]
    seps = jnp.sqrt(blocks["eps"])

    half = cfg.half_stencil
    gid = blocks["gid"]

    def one(carry, ob, P, self_block=False):
        e_total, fx, fy, fz = carry
        b = jnp.take(nbr, ob, axis=1)                       # (nc, P)
        t = jnp.take(t_all, ob, axis=0)                     # (P, 3)
        bl = [loc[d][b] + t[None, :, d:d + 1] for d in range(3)]  # (nc,P,C)
        nb = (na[b] + 2.0 * (t[None, :, 0:1] * loc[0][b]
                             + t[None, :, 1:2] * loc[1][b]
                             + t[None, :, 2:3] * loc[2][b])
              + jnp.sum(t * t, axis=1)[None, :, None])      # (nc, P, C)
        b_mat = jnp.stack([x.reshape(n_cells, P * C) for x in bl],
                          axis=1)                           # (nc, 3, P*C)
        # precision=HIGHEST: TPU f32 dot_general defaults to bfloat16
        # inputs, whose 7-bit mantissa on the coordinates corrupts r^2 by
        # ~1e-2 nm^2 — a 10%+ force error through the steep LJ/Coulomb
        # slopes (measured on chip vs CPU f64; scripts/check_pallas_tpu.py)
        cross = jax.lax.dot_general(
            a_mat, b_mat, (((2,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=dtype)                   # (nc, C, P*C)
        r2 = (na[:, :, None] + nb.reshape(n_cells, P * C)[:, None, :]
              - (cross + cross))
        if s2_cell is not None:
            # per-replica physical distance from stored coordinates
            r2 = r2 * s2_cell
        valid = r2 < cutoff2
        if self_block:
            diag = (np.arange(C)[:, None] == np.arange(P * C)[None, :])
            valid = valid & jnp.asarray(~diag)
        if W > 0:
            dg = (gid[b].reshape(n_cells, P * C)[:, None, :]
                  - gid[:, :, None])
            in_win = jnp.abs(dg) <= W
            bit = jnp.where(in_win, dg + W, 0)
            if single_word:
                excl = in_win & (((blocks["ew0"][:, :, None] >> bit) & 1)
                                 == 1)
            else:
                excl = jnp.zeros_like(in_win)
                for w in range(cfg.excl_words):
                    hit = ((bit // 31 == w)
                           & (((blocks[f"ew{w}"][:, :, None]
                                >> (bit % 31)) & 1) == 1))
                    excl = excl | hit
                excl = in_win & excl
        else:
            excl = jnp.zeros_like(valid)
        # clamp large enough that LJ x6^2 cannot overflow f32 (see
        # make_block_eg); pad-pad pairs land here with eps = q = 0
        r2s = jnp.where(valid, jnp.maximum(r2, 1e-6), 1.0)
        inv_r = jax.lax.rsqrt(r2s)
        inv_r2 = inv_r * inv_r
        qq = qa[:, :, None] * blocks["q"][b].reshape(n_cells, P * C)[:, None, :]
        sig = 0.5 * (blocks["sig"][:, :, None]
                     + blocks["sig"][b].reshape(n_cells, P * C)[:, None, :])
        eps = seps[:, :, None] * seps[b].reshape(n_cells, P * C)[:, None, :]
        e, g = pair_eg(qq, sig, eps, r2s, inv_r, inv_r2, excl)
        e = jnp.where(valid, e, 0.0)
        g2 = jnp.where(valid, -2.0 * g, 0.0)
        # NOTE: g2 has 3 consumer fusions (energy reduce + two force
        # contractions) and XLA rebuilds the pair chain inside each;
        # forcing materialization with an optimization_barrier was measured
        # SLOWER (49 vs 38 ms at 100k atoms) — the HBM round-trips cost
        # more than the duplicated VPU work, so leave fusion to XLA

        if with_energy:
            factor = 1.0 if (half and not self_block) else 0.5
            if energy_per_replica:
                e_total = e_total + factor * jnp.sum(e, axis=(1, 2))
            else:
                e_total = e_total + factor * jnp.sum(e)
        # row forces: one MXU contraction gives both g2 @ b' and rowsum(g2)
        # (ones column appended)
        ones_b = jnp.ones((n_cells, 1, P * C), dtype)
        gb = jax.lax.dot_general(
            g2, jnp.concatenate([b_mat, ones_b], axis=1),
            (((2,), (2,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=dtype)                   # (nc, C, 4)
        s_a = gb[:, :, 3]
        fx = fx + loc[0] * s_a - gb[:, :, 0]
        fy = fy + loc[1] * s_a - gb[:, :, 1]
        fz = fz + loc[2] * s_a - gb[:, :, 2]
        if half and not self_block:
            iv = jnp.take(inv, ob, axis=1)                  # (nc, P)
            ones_a = jnp.ones((n_cells, C, 1), dtype)
            ha = jax.lax.dot_general(
                g2, jnp.concatenate([a_mat, ones_a], axis=2),
                (((1,), (1,)), ((0,), (0,))),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=dtype)               # (nc, P*C, 4)
            s_b = ha[:, :, 3]
            out = []
            for d, fc in enumerate((fx, fy, fz)):
                r = (b_mat[:, d, :] * s_b - ha[:, :, d]).reshape(
                    n_cells, P, C)
                for p in range(P):
                    fc = fc + r[:, p, :][iv[:, p]]
                out.append(fc)
            fx, fy, fz = out
        return (e_total, fx, fy, fz)

    zero = jnp.zeros((n_cells, C), dtype)
    e0 = (jnp.zeros((n_cells,), dtype) if energy_per_replica
          else jnp.zeros((), dtype))
    carry = (e0, zero, zero, zero)
    carry = one(carry, jnp.asarray([0], jnp.int32), 1, self_block=True)

    rest = list(range(1, cfg.n_offsets))
    pairs = [rest[i:i + 2] for i in range(0, len(rest) - 1, 2)]
    leftover = [rest[-1]] if len(rest) % 2 else []
    if pairs:
        def body(carry, ob):
            return one(carry, ob, 2), None
        carry, _ = jax.lax.scan(body, carry,
                                jnp.asarray(pairs, jnp.int32), unroll=2)
    for o in leftover:
        carry = one(carry, jnp.asarray([o], jnp.int32), 1)
    e_total, *f = carry
    if energy_per_replica:
        e_total = reduce_cells_to_replicas(e_total, cfg)

    f_slots = jnp.stack([fc.reshape(-1) for fc in f], axis=1)
    forces = f_slots[cellsort.inv_slot]
    if rep_scale is not None:
        R = rep_scale.shape[0]
        forces = (forces.reshape(R, n // R, 3)
                  * rep_scale.astype(dtype)[:, None, None]).reshape(n, 3)
    return e_total, forces

def _sorted_arrays(params, positions, cellsort, cfg, n, box_diag=None):
    """Gather per-atom data into cell-major order (padded slots -> inert).

    When `box_diag` is given, coordinates are rebased to the box frame
    (position - rebuild_image * box): continuous across rebuild-interval
    drift and consistent with the cell assignment, so the static per-cell
    shift table replaces per-pair round() min-imaging."""
    sa = cellsort.slot_atom
    pad = sa >= n
    safe = jnp.where(pad, 0, sa)
    out = {}
    if box_diag is None:
        pos = positions
    elif jnp.ndim(box_diag) == 2:
        # triclinic box frame: pos - image @ box, elementwise (bf16-safe)
        from .boxutils import rows_combo_elem
        shift = rows_combo_elem(
            cellsort.image.T.astype(positions.dtype), box_diag).T
        pos = positions - shift
    else:
        pos = positions - cellsort.image.astype(positions.dtype) * box_diag
    for c, name in enumerate("xyz"):
        out[name] = jnp.where(pad, 1e6 * (1 + c), pos[safe, c])
    out["q"] = jnp.where(pad, 0.0, params["charge"][safe])
    out["sig"] = jnp.where(pad, 1.0, params["sigma"][safe])
    out["eps"] = jnp.where(pad, 0.0, params["eps"][safe])
    out["gid"] = jnp.where(pad, -1 - jnp.arange(sa.shape[0], dtype=jnp.int32),
                           sa)
    if "excl_words" in params:
        for w in range(params["excl_words"].shape[1]):
            out[f"ew{w}"] = jnp.where(pad, 0, params["excl_words"][safe, w])
    return out


def make_block_eg(blocks, box_diag, cfg: CellPairConfig, pair_eg,
                  coulomb_scale, a_blocks=None):
    """Build block_eg(b, shift): pair energies/force-factors between the
    a-side cell blocks (all of `blocks`, or the row-slice `a_blocks` — used
    by the slab-sharded sweep in parallel/sharded.py) and the b-indexed
    neighbor blocks gathered from the full `blocks`.

    `b` is (rows, P): P neighbor cells are concatenated along the lane axis
    so the (rows, C, P*C) pair tile fills the 128-wide vector lanes (P = 2
    at typical capacities).  `shift`, when given, is a (3,)-tuple of
    (rows, P) periodic-image counts (from _shift_table) applied to the
    gathered coordinates — exact minimum imaging with zero per-pair round()
    work; when None, per-pair round() min-imaging is used (wrapped/small
    grids).

    Returns (e (rows,C,P*C), g2 = -2 dE/dr^2 masked, d components)."""
    cutoff2 = cfg.cutoff * cfg.cutoff
    W = cfg.excl_window
    A = a_blocks if a_blocks is not None else blocks
    # per-slot (2D, cheap) precomputation: scaled charge on the a side,
    # sqrt(eps) on both sides — saves one tile multiply and one multi-pass
    # tile sqrt per block
    qa_scaled = coulomb_scale * A["q"]
    seps_a = jnp.sqrt(A["eps"])
    seps_b_all = jnp.sqrt(blocks["eps"])
    single_word = cfg.excl_words == 1 and 2 * W + 1 <= 31

    def bgather(arr, b):
        v = arr[b]                             # (rows, P, C)
        return v.reshape(v.shape[0], -1)       # (rows, P*C)

    def block_eg(b, shift=None, self_block=False):
        """self_block: mask the slot diagonal (an atom against itself);
        offset blocks pair distinct cells, and padded slots are inert by
        construction (sentinel coords put real-pad pairs beyond the cutoff;
        pad-pad pairs have q = eps = 0 and a clamped r^2)."""
        if b.ndim == 1:
            b = b[:, None]
        rows, P = b.shape
        d = []
        r2 = jnp.zeros((), A["x"].dtype)
        for c, k in enumerate("xyz"):
            bk = blocks[k][b]                  # (rows, P, C)
            if shift is not None:
                bk = bk + (shift[c].astype(bk.dtype)
                           * box_diag[c])[:, :, None]
            dc = A[k][:, :, None] - bk.reshape(rows, -1)[:, None, :]
            if shift is None:
                dc = dc - box_diag[c] * jnp.round(dc / box_diag[c])
            d.append(dc)
            r2 = r2 + dc * dc
        valid = r2 < cutoff2
        if self_block:
            C = A["x"].shape[1]
            diag = (np.arange(C)[:, None] == np.arange(P * C)[None, :])
            valid = valid & jnp.asarray(~diag)
        if W > 0:
            gid_a = A["gid"][:, :, None]
            dg = bgather(blocks["gid"], b)[:, None, :] - gid_a
            in_win = jnp.abs(dg) <= W
            bit = jnp.where(in_win, dg + W, 0)
            if single_word:
                ew = A["ew0"][:, :, None]
                excl = in_win & (((ew >> bit) & 1) == 1)
            else:
                excl = jnp.zeros_like(in_win)
                for w in range(cfg.excl_words):
                    ew = A[f"ew{w}"][:, :, None]  # row atom a's words
                    hit = (bit // 31 == w) & (((ew >> (bit % 31)) & 1) == 1)
                    excl = excl | hit
                excl = in_win & excl
        else:
            excl = jnp.zeros_like(valid)
        # clamp r^2: excluded pairs can sit at r = 0 (shell on core at
        # setup), and pad-pad slot pairs sit at exactly 0 (identical
        # sentinels).  The clamp must be large enough that the LJ x6^2
        # term cannot overflow f32 (sig^2/r2s <= 1e6 -> x6^2 <= 1e36),
        # else 0 * inf = NaN leaks through the eps = 0 pad masking;
        # clamped pairs are all masked or physically exploded anyway
        r2s = jnp.where(valid, jnp.maximum(r2, 1e-6), 1.0)
        inv_r = jax.lax.rsqrt(r2s)
        inv_r2 = inv_r * inv_r
        qq = qa_scaled[:, :, None] * bgather(blocks["q"], b)[:, None, :]
        sig = 0.5 * (A["sig"][:, :, None]
                     + bgather(blocks["sig"], b)[:, None, :])
        eps = seps_a[:, :, None] * bgather(seps_b_all, b)[:, None, :]
        e, g = pair_eg(qq, sig, eps, r2s, inv_r, inv_r2, excl)
        e = jnp.where(valid, e, 0.0)
        g2 = jnp.where(valid, -2.0 * g, 0.0)
        return e, g2, d

    return block_eg


def pair_energy_forces(params, positions, box_diag, cellsort,
                       cfg: CellPairConfig, pair_eg, coulomb_scale,
                       with_energy: bool = True, rep_scale=None,
                       energy_per_replica: bool = False):
    """Returns (energy, forces (N,3)) for the direct-space sum.

    Regular grids (all dims >= 2w+1 cells) use the matmul-form sweep
    (_sweep_regular): cell-local coordinates, MXU cross-term and force
    contractions, Newton's-third-law reactions credited by an
    inverse-permutation row GATHER (each stencil offset is a cyclic shift
    of the cell grid, so the scatter fc[b] += r is exactly
    fc += r[inv_b]).

    rep_scale/energy_per_replica: flat-ensemble NPT (stored-coordinate
    positions; see _sweep_regular) — regular grids only."""
    if rep_scale is not None and not cfg.regular:
        raise ValueError("flat-ensemble NPT (rep_scale) requires a "
                         "regular cell grid")
    if cfg.triclinic and not cfg.regular:
        raise ValueError("triclinic cell-pair sweeps require a regular "
                         "grid (make_config enforces this)")
    if cfg.regular:
        # with_energy=False drops the energy reduction; XLA then dead-code
        # eliminates the e-tile chain inside that consumer fusion, leaving
        # one pair-chain evaluation per force contraction instead of three
        return _sweep_regular(params, positions, box_diag, cellsort, cfg,
                              pair_eg, coulomb_scale,
                              with_energy=with_energy, rep_scale=rep_scale,
                              energy_per_replica=energy_per_replica)

    n = positions.shape[0]
    n_cells, C = cfg.n_cells, cfg.capacity
    nbr_flat, nbr_shape = cfg.nbr_map
    nbr_map = np.array(nbr_flat, np.int32).reshape(nbr_shape)

    s = _sorted_arrays(params, positions, cellsort, cfg, n)
    blocks = {k: v.reshape(n_cells, C) for k, v in s.items()}
    nbr = jnp.asarray(nbr_map)  # (n_cells, n_off)

    block_eg = make_block_eg(blocks, box_diag, cfg, pair_eg, coulomb_scale)

    if True:
        # wrapped/small grids: every ordered cell pair appears once in
        # the stencil -> half energy, row forces only
        e_s, g2_s, d_s = block_eg(nbr[:, 0], self_block=True)
        e_total = 0.5 * jnp.sum(e_s)
        f = [jnp.sum(g2_s * dc, axis=2) for dc in d_s]

        if cfg.n_offsets > 1:
            def body(carry, o):
                e_total, fx, fy, fz = carry
                b = nbr[:, o]
                e, g2, d = block_eg(b)
                return (e_total + 0.5 * jnp.sum(e),
                        fx + jnp.sum(g2 * d[0], axis=2),
                        fy + jnp.sum(g2 * d[1], axis=2),
                        fz + jnp.sum(g2 * d[2], axis=2)), None

            (e_total, *f), _ = jax.lax.scan(
                body, (e_total, f[0], f[1], f[2]),
                jnp.arange(1, cfg.n_offsets), unroll=4)

    # unsort forces back to atom order
    f_slots = jnp.stack([fc.reshape(-1) for fc in f], axis=1)  # (S, 3)
    forces = f_slots[cellsort.inv_slot]
    return e_total, forces


def _zero_cotangent(x):
    if jnp.issubdtype(jnp.asarray(x).dtype, jnp.inexact):
        return jnp.zeros_like(x)
    return np.zeros(jnp.shape(x), jax.dtypes.float0)


def make_custom_energy(cfg: CellPairConfig, pair_eg, coulomb_scale,
                       impl=None):
    """energy(params, positions, box_diag, cellsort) with a custom VJP that
    returns the analytically-computed forces (no giant per-pair residuals,
    no scatter in the backward pass; dE/dpositions = -forces).

    impl: alternative (energy, forces) implementation with the same
    signature as pair_energy_forces."""
    sweep = impl or pair_energy_forces

    def _sweep(params, positions, box_diag, cellsort, rep_scale):
        if rep_scale is None:   # custom impls need not accept rep_scale
            return sweep(params, positions, box_diag, cellsort,
                         cfg, pair_eg, coulomb_scale)
        return sweep(params, positions, box_diag, cellsort,
                     cfg, pair_eg, coulomb_scale, rep_scale=rep_scale)

    @jax.custom_vjp
    def energy(params, positions, box_diag, cellsort, rep_scale=None):
        e, _ = _sweep(params, positions, box_diag, cellsort, rep_scale)
        return e

    def fwd(params, positions, box_diag, cellsort, rep_scale=None):
        e, f = _sweep(params, positions, box_diag, cellsort, rep_scale)
        return e, (f, params, box_diag, cellsort, rep_scale)

    def bwd(res, g):
        f, params, box_diag, cellsort, rep_scale = res
        params_bar = jax.tree.map(_zero_cotangent, params)
        box_bar = jax.tree.map(_zero_cotangent, box_diag)
        cs_bar = jax.tree.map(_zero_cotangent, cellsort)
        rs_bar = jax.tree.map(_zero_cotangent, rep_scale)
        pos_bar = g * (-f)
        if rep_scale is not None:
            # `positions` here are STORED coordinates (p_phys / s) while
            # `f` is the PHYSICAL force; dE/dp_stored = -s * F_phys, so
            # the caller's p_stored = p_phys / s chain rule recovers
            # exactly -F_phys for dE/dp_phys
            n = f.shape[0]
            R = rep_scale.shape[0]
            pos_bar = (pos_bar.reshape(R, n // R, 3)
                       * rep_scale.astype(f.dtype)[:, None, None]
                       ).reshape(n, 3)
        return params_bar, pos_bar, box_bar, cs_bar, rs_bar

    energy.defvjp(fwd, bwd)
    return energy
