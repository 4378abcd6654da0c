"""Exclusion-span latch for the Pallas far-offset exclusion skip.

ops/pallas_sweep.pair_forces_pallas(excl_skip=True) skips the exclusion
bitmask test at stencil offsets with any |o| >= 2 — sound only while every
excluded pair sits in cells <= 1 apart per dimension.  Cell assignment is
frozen between rebuilds, so build_cellsort checks the condition exactly at
rebuild time and latches CellSort.excl_span_exceeded; the latch must also
carry forward across rebuilds like the other sticky flags."""

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from openmm_drudenose_tpu.forces import cellpair as cp
from openmm_drudenose_tpu.integrators import tgnh


def _cfg_and_box():
    box = np.array([2.0, 2.0, 2.0])
    # cutoff 0.4 + skin 0.1 -> target cell edge 0.25 -> 8^3 grid
    cfg = cp.make_config(0.4, box, 6, [0], [1], skin=0.1)
    assert cfg.grid == (8, 8, 8)
    return cfg, box


def _sort(pos, cfg, box, excl_ij):
    return cp.build_cellsort(jnp.asarray(pos, jnp.float32),
                             jnp.asarray(box, jnp.float32), cfg,
                             excl_ij=excl_ij)


def test_latch_fires_on_spanning_pair():
    cfg, box = _cfg_and_box()
    pos = np.full((6, 3), 1.0)
    pos[2] = [0.30, 1.0, 1.0]
    pos[3] = [0.95, 1.0, 1.0]          # 2 cells apart in x (cells 1 and 3)
    cs = _sort(pos, cfg, box, (np.array([2]), np.array([3])))
    assert bool(cs.excl_span_exceeded)


def test_latch_quiet_for_adjacent_and_wrapped_pairs():
    cfg, box = _cfg_and_box()
    pos = np.full((6, 3), 1.0)
    pos[0] = [0.30, 1.0, 1.0]
    pos[1] = [0.45, 1.0, 1.0]          # adjacent cells
    pos[2] = [0.01, 0.5, 0.5]
    pos[3] = [1.99, 0.5, 0.5]          # adjacent via the periodic wrap
    cs = _sort(pos, cfg, box,
               (np.array([0, 2]), np.array([1, 3])))
    assert not bool(cs.excl_span_exceeded)


def test_latch_absent_when_not_requested():
    cfg, box = _cfg_and_box()
    cs = _sort(np.full((6, 3), 1.0), cfg, box, None)
    assert cs.excl_span_exceeded is None


class _FakeState(NamedTuple):
    positions: jnp.ndarray
    box: jnp.ndarray
    neighbors: object


def test_rebuild_carries_latch_forward():
    """A rebuild at healthy positions must not clear a previously latched
    span breach (one host readback per chunk sees the sticky flag)."""
    cfg, box = _cfg_and_box()
    good = np.full((6, 3), 1.0)
    good[2] = [0.30, 1.0, 1.0]
    good[3] = [0.40, 1.0, 1.0]
    excl = (np.array([2]), np.array([3]))

    def neighbor_fn(positions, b):
        return cp.build_cellsort(positions, jnp.diagonal(b), cfg,
                                 excl_ij=excl)

    bad = good.copy()
    bad[3] = [0.95, 1.0, 1.0]
    latched = _sort(bad, cfg, box, excl)
    assert bool(latched.excl_span_exceeded)

    rebuild = tgnh._make_neighbor_rebuild(neighbor_fn, cfg.skin)
    st = _FakeState(positions=jnp.asarray(good, jnp.float32),
                    box=jnp.asarray(np.diag(box), jnp.float32),
                    neighbors=latched._replace(
                        ref_positions=jnp.asarray(good, jnp.float32)))
    out = rebuild(st)
    assert bool(out.neighbors.excl_span_exceeded)
