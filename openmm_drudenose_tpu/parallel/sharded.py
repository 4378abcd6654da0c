"""Work-sharded TGNH step over a device mesh: the whole force pass runs
under shard_map with the expensive work partitioned across devices.

Decomposition (the TPU-idiomatic split — see SURVEY.md section 2.8 for why
this replaces the reference's nonexistent multi-GPU story):

  * direct-space cell sweep : cells partitioned as x-slabs; each device
    computes the dense block math for its own cell rows against the
    replicated sorted blocks (the "halo" is free because the sorted block
    arrays are replicated — no ppermute needed at this scale), forces
    psum-merged.  This is ~90% of the per-step FLOPs.
  * PME spreading           : each device B-spline-spreads a disjoint atom
    chunk onto its own grid copy; grids are psum'd; the FFT + eterm sum is
    replicated (a 3D FFT at MD grid sizes is far cheaper than the sweep).
    Interpolation forces arrive through the psum transpose: each device's
    gradient only touches its own chunk's spreading weights.
  * everything else         : exceptions, Ewald self term, dispersion tail,
    Drude springs, Thole pairs, bonded terms, virtual-site composition are
    O(N) elementwise — replicated and divided by n_dev so psum'd energies
    and forces come out exact.

The per-bath (G+2) KE reductions and the NH chain run replicated in the
surrounding step (they are O(N) elementwise + tiny vectors; the psum'd
force array is the only state the devices must agree on).  Because every
device holds the full state, the sharded trajectory matches the
single-device trajectory to reduction-order rounding (tests/test_sharded.py
pins this).

State-resident slab decomposition with atom redistribution (for atom counts
beyond replicated-state HBM limits) builds on the same block_eg/spread
pieces; at <= a few million atoms the replicated O(N) state is a few tens
of MB per device and the sweep dominates wall-clock, so work sharding is
the performance-correct cut.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..constraints.vsites import apply_vsites
from ..forces import cellpair as cp
from ..integrators import tgnh


def _shard_map(fn, mesh, in_specs, out_specs):
    try:
        from jax import shard_map as sm
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map as sm
    try:
        return sm(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                  check_vma=False)
    except TypeError:  # pre-rename
        return sm(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                  check_rep=False)


def make_slab_sweep(axis: str, n_dev: int):
    """A drop-in `impl` for cellpair.make_custom_energy that computes only
    this device's x-slab of cell rows (cfg.grid[0] must divide by n_dev).

    Forces are accumulated into full-(S, 3) slot arrays — a-side rows land
    in the local slab, Newton's-third-law reaction adds may land in
    neighboring slabs' rows; both are merged by the caller's psum."""

    def sweep(params, positions, box_diag, cellsort, cfg, pair_eg,
              coulomb_scale):
        n = positions.shape[0]
        n_cells, C = cfg.n_cells, cfg.capacity
        if n_cells % n_dev:
            raise ValueError(
                f"cell count {n_cells} not divisible by {n_dev} devices — "
                f"build the CellPairConfig with grid[0] % n_dev == 0")
        n_loc = n_cells // n_dev
        nbr_flat, nbr_shape = cfg.nbr_map
        nbr_map = jnp.asarray(
            np.array(nbr_flat, np.int32).reshape(nbr_shape))

        s = cp._sorted_arrays(params, positions, cellsort, cfg, n)
        blocks = {k: v.reshape(n_cells, C) for k, v in s.items()}

        d = jax.lax.axis_index(axis)
        lo = d * n_loc
        a_blocks = {k: jax.lax.dynamic_slice_in_dim(v, lo, n_loc)
                    for k, v in blocks.items()}
        nbr_loc = jax.lax.dynamic_slice_in_dim(nbr_map, lo, n_loc)

        block_eg = cp.make_block_eg(blocks, box_diag, cfg, pair_eg,
                                    coulomb_scale, a_blocks=a_blocks)

        # self block: both orders present within the slab row -> half energy
        e_s, g2_s, d_s = block_eg(nbr_loc[:, 0], self_block=True)
        e_total = 0.5 * jnp.sum(e_s)
        f_loc = [jnp.sum(g2_s * dc, axis=2) for dc in d_s]
        f_full = [jnp.zeros((n_cells, C), positions.dtype) for _ in range(3)]

        if cfg.n_offsets > 1:
            if cfg.half_stencil:
                def body(carry, o):
                    e_total, flx, fly, flz, fx, fy, fz = carry
                    b = nbr_loc[:, o]
                    e, g2, dd = block_eg(b)
                    e_total = e_total + jnp.sum(e)
                    fl = [flx + jnp.sum(g2 * dd[0], axis=2),
                          fly + jnp.sum(g2 * dd[1], axis=2),
                          flz + jnp.sum(g2 * dd[2], axis=2)]
                    # reaction on the b-side rows (may be outside the slab)
                    fs = [fc.at[b].add(-jnp.sum(g2 * dc, axis=1))
                          for fc, dc in zip((fx, fy, fz), dd)]
                    return (e_total, *fl, *fs), None
            else:
                def body(carry, o):
                    e_total, flx, fly, flz, fx, fy, fz = carry
                    b = nbr_loc[:, o]
                    e, g2, dd = block_eg(b)
                    return (e_total + 0.5 * jnp.sum(e),
                            flx + jnp.sum(g2 * dd[0], axis=2),
                            fly + jnp.sum(g2 * dd[1], axis=2),
                            flz + jnp.sum(g2 * dd[2], axis=2),
                            fx, fy, fz), None

            (e_total, *fs), _ = jax.lax.scan(
                body, (e_total, *f_loc, *f_full),
                jnp.arange(1, cfg.n_offsets), unroll=4)
            f_loc, f_full = fs[:3], fs[3:]

        # place the slab rows into the full arrays
        f_full = [jax.lax.dynamic_update_slice_in_dim(
            ff, jax.lax.dynamic_slice_in_dim(ff, lo, n_loc) + fl, lo, axis=0)
            for ff, fl in zip(f_full, f_loc)]

        f_slots = jnp.stack([fc.reshape(-1) for fc in f_full], axis=1)
        forces = f_slots[cellsort.inv_slot]
        return e_total, forces

    return sweep


def make_sharded_energy_and_forces(context, mesh: Mesh,
                                   axis: str = "atom",
                                   distributed_fft: bool = False) -> Callable:
    """energy_and_forces(positions, box, neighbors) -> (pe, forces), with
    the force work partitioned over `mesh[axis]` and merged by psum.
    Drop-in replacement for Context._energy_and_forces; trajectories match
    the single-device step to reduction-order rounding."""
    spec, static = context._spec, context._static
    n_dev = mesh.shape[axis]

    nb = next((t for t in context._terms
               if hasattr(t[0], "cellpair_cfg")), None)
    if nb is None:
        raise ValueError(
            "the sharded step requires the cellpair strategy "
            "(Context(..., strategy='cellpair'))")
    nb_fn, nb_params = nb
    cfg = nb_fn.cellpair_cfg
    if cfg.n_cells % n_dev:
        raise ValueError(
            f"cell grid {cfg.grid} has {cfg.n_cells} cells, not divisible "
            f"by {n_dev} devices")
    pme = nb_fn.pme_setup
    extras = nb_fn.extras_energy
    others = [t for t in context._terms if t is not nb]
    if distributed_fft:
        from . import distfft
        if pme is None:
            raise ValueError("distributed_fft requires PME")
        if not distfft.shardable(pme.grid, n_dev):
            raise ValueError(
                f"PME grid {pme.grid} not divisible by {n_dev} devices "
                f"in x and y")

    slab_impl = make_slab_sweep(axis, n_dev)
    sweep_term = cp.make_custom_energy(cfg, nb_fn.pair_eg,
                                       nb_fn.coulomb_scale, impl=slab_impl)

    n_atoms = static.n_atoms
    n_atom_loc = -(-n_atoms // n_dev)
    pad_n = n_dev * n_atom_loc - n_atoms

    # psum with an identity transpose: the grid cotangent dE/dQ_total is
    # replicated and must reach each device exactly once (each device's
    # spreading chunk is disjoint).  Pinned via custom_vjp so the result
    # does not depend on jax's psum-transpose convention under shard_map.
    @jax.custom_vjp
    def psum_grid(q):
        return jax.lax.psum(q, axis)

    def _psum_grid_fwd(q):
        return jax.lax.psum(q, axis), None

    def _psum_grid_bwd(_, g):
        return (g,)

    psum_grid.defvjp(_psum_grid_fwd, _psum_grid_bwd)

    def local_eaf(positions, box, neighbors, pos_err):
        d = jax.lax.axis_index(axis)
        box_diag = jnp.diagonal(box)

        def local_energy(pos):
            posv = apply_vsites(spec, static, pos)
            # sharded: this device's slab of the block sweep
            e_var = sweep_term(nb_params, posv, box_diag, neighbors)
            # replicated cheap terms, divided so the psum is exact
            e_rep = extras(nb_params, posv, box)
            for fn, p in others:
                if getattr(fn, "wants_pos_err", False):
                    e_rep = e_rep + fn(p, posv, box, pos_err=pos_err)
                else:
                    e_rep = e_rep + fn(p, posv, box)
            e_var = e_var + e_rep / n_dev
            # sharded PME spreading; replicated FFT of the psum'd grid
            if pme is not None:
                q = nb_params["charge"]
                if pad_n:
                    posp = jnp.concatenate(
                        [posv, jnp.zeros((pad_n, 3), posv.dtype)])
                    qp = jnp.concatenate([q, jnp.zeros((pad_n,), q.dtype)])
                else:
                    posp, qp = posv, q
                pos_d = jax.lax.dynamic_slice_in_dim(
                    posp, d * n_atom_loc, n_atom_loc)
                q_d = jax.lax.dynamic_slice_in_dim(
                    qp, d * n_atom_loc, n_atom_loc)
                if distributed_fft:
                    from . import distfft
                    # reduce-scatter the spread grids into x-slabs (half
                    # the comm of the full-grid psum), then the sharded
                    # pencil FFT completes the reciprocal sum
                    Q_loc = jax.lax.psum_scatter(
                        pme.spread(q_d, pos_d, box_diag), axis,
                        scatter_dimension=0, tiled=True)
                    e_pme = psum_grid(distfft.local_energy(
                        pme.grid, pme.alpha, pme.bm2x, pme.bm2y, pme.bm2z,
                        Q_loc, box_diag, axis, n_dev))
                else:
                    Q = psum_grid(pme.spread(q_d, pos_d, box_diag))
                    e_pme = pme.energy_of_grid(Q, box_diag)
            else:
                e_pme = jnp.zeros((), posv.dtype)
            # e_pme is replicated-valued but each device's gradient flows
            # only through its own spreading chunk (psum transpose), so
            # psum(grad) is the exact total force; keep it out of the
            # psum'd energy via aux
            return e_var + e_pme, (e_var, e_pme)

        (_, (e_var, e_pme)), g = jax.value_and_grad(
            local_energy, has_aux=True)(positions)
        pe = jax.lax.psum(e_var, axis) + e_pme
        forces = jax.lax.psum(-g, axis)
        return pe, forces

    sharded = _shard_map(local_eaf, mesh,
                         in_specs=(P(), P(), P(), P()),
                         out_specs=(P(), P()))

    def energy_and_forces(positions, box, neighbors=None, pos_err=None):
        return sharded(positions, box, neighbors, pos_err)

    return energy_and_forces


class ShardedContext:
    """Run a Context's simulation with the force pass work-sharded over a
    device mesh.  The state stays replicated (every device holds the full
    system); stepping semantics match Context.step exactly.

        mesh = Mesh(np.array(jax.devices()).reshape(-1), ("atom",))
        sctx = ShardedContext(ctx, mesh)
        sctx.step(1000)
    """

    def __init__(self, context, mesh: Mesh, axis: str = "atom",
                 distributed_fft: bool = False):
        context._ensure_forces()
        self._ctx = context
        self._mesh = mesh
        self._axis = axis
        self._dfft = distributed_fft
        self._rebuild_eaf()

    def _rebuild_eaf(self) -> None:
        self._eaf = make_sharded_energy_and_forces(
            self._ctx, self._mesh, self._axis, distributed_fft=self._dfft)
        self._terms_ref = self._ctx._terms
        self._step_fns = {}

    def _ensure_fresh(self) -> None:
        # neighbor-capacity growth rebuilds the context's potential
        # (Context._ensure_neighbors -> _build_potential); our closures
        # must follow or the slab sweep sees a stale CellPairConfig
        if self._ctx._terms is not self._terms_ref:
            self._rebuild_eaf()

    def _get_step(self, inner: int):
        self._ensure_fresh()
        fn = self._step_fns.get(inner)
        if fn is None:
            multi = tgnh.make_multi_step(self._ctx._static, self._eaf, inner)
            fn = jax.jit(multi)
            self._step_fns[inner] = fn
        return fn

    def step(self, steps: int) -> None:
        ctx = self._ctx
        steps = int(steps)
        with self._mesh:
            if ctx._neighbor_fn is None:
                ctx._state = self._get_step(steps)(ctx._spec, ctx._state)
            else:
                if ctx._jit_neighbor_fn is None:
                    ctx._jit_neighbor_fn = jax.jit(ctx._neighbor_fn)
                remaining = steps
                while remaining > 0:
                    k = min(ctx._rebuild_interval, remaining)
                    ctx._state = ctx._state._replace(neighbors=None)
                    ctx._ensure_neighbors()
                    ctx._state = self._get_step(k)(ctx._spec, ctx._state)
                    remaining -= k
        ctx._ke_valid = True
        ctx._check_hardwall_runaway()

    @property
    def state(self):
        return self._ctx._state
