"""Periodic-box utilities: orthorhombic AND triclinic minimum imaging.

The reference runs on OpenMM's substrate, which supports triclinic cells
in NonbondedForce/PME; this engine supports them through the DENSE
all-pairs strategy + the generic PME path (the cell-pair fast path keeps
its orthorhombic layout — the sweep's static stencil machinery is built
around axis-aligned cells).

Conventions (OpenMM's reduced form, which its own minimum-image scheme
also assumes): box row vectors a = (ax, 0, 0), b = (bx, by, 0),
c = (cx, cy, cz) with ax, by, cz > 0 and
|bx| <= ax/2, |cx| <= ax/2, |cy| <= by/2.  In this form the diagonal
entries ARE the perpendicular widths (a spans x, b stays in xy), so the
OpenMM validity rule cutoff <= min(ax, by, cz)/2 makes the sequential
c -> b -> a rounding below exact minimum imaging.

A `box` argument throughout this package is either a (3,) diagonal
(orthorhombic fast paths, bit-identical to the historical formula) or a
(3, 3) reduced row-vector matrix (triclinic) — jnp.ndim is static under
jit, so the branch costs nothing.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def reduce_box(box) -> np.ndarray:
    """OpenMM-style reduction of (3, 3) row vectors into the reduced form
    above (host-side, np).  Requires a along x and b in the xy plane."""
    box = np.asarray(box, np.float64).copy()
    if abs(box[0][1]) > 1e-12 or abs(box[0][2]) > 1e-12 \
            or abs(box[1][2]) > 1e-12:
        raise ValueError(
            "periodic box vectors must have a along x and b in the xy "
            f"plane (OpenMM convention); got {box.tolist()}")
    if min(box[0][0], box[1][1], box[2][2]) <= 0:
        raise ValueError("periodic box edge lengths must be positive")
    box[2] -= box[1] * round(box[2][1] / box[1][1])
    box[2] -= box[0] * round(box[2][0] / box[0][0])
    box[1] -= box[0] * round(box[1][0] / box[0][0])
    return box


def is_triclinic(box) -> bool:
    box = np.asarray(box)
    if box.ndim == 1:
        return False
    return bool(np.abs(box - np.diag(np.diagonal(box))).max() > 1e-12)


def volume(box):
    """det for reduced row vectors == product of the diagonal."""
    if jnp.ndim(box) == 1:
        return box[0] * box[1] * box[2]
    return box[0, 0] * box[1, 1] * box[2, 2]


def mi_box(box, triclinic: bool):
    """The minimum-image argument threaded into pair terms: the full
    (3, 3) matrix when triclinic, else the (3,) diagonal (whose code paths
    stay bit-identical to the historical per-component formula)."""
    return box if triclinic else jnp.diagonal(box)


def min_image(delta, box):
    """delta (..., 3) -> minimum image under `box` ((3,) or (3, 3))."""
    if jnp.ndim(box) == 1:
        return delta - box * jnp.round(delta / box)
    d = delta
    d = d - box[2] * jnp.round(d[..., 2:3] / box[2, 2])
    d = d - box[1] * jnp.round(d[..., 1:2] / box[1, 1])
    d = d - box[0] * jnp.round(d[..., 0:1] / box[0, 0])
    return d


def min_image_t(delta, box):
    """delta (3, ...) (lane-major pair layouts) -> minimum image."""
    if jnp.ndim(box) == 1:
        shape = (3,) + (1,) * (delta.ndim - 1)
        b = box.reshape(shape)
        return delta - b * jnp.round(delta / b)
    d = delta
    shape = (3,) + (1,) * (delta.ndim - 1)
    d = d - box[2].reshape(shape) * jnp.round(d[2] / box[2, 2])
    d = d - box[1].reshape(shape) * jnp.round(d[1] / box[1, 1])
    d = d - box[0].reshape(shape) * jnp.round(d[0] / box[0, 0])
    return d


def frac_coords(positions, box):
    """positions (N, 3) -> fractional coordinates (positions = frac @ box
    for row-vector boxes).  Closed-form lower-triangular inverse, applied
    ELEMENTWISE — `positions @ inv` would lower to a TPU f32 dot_general
    whose bf16 inputs corrupt the fractional coordinates by ~0.4%
    (measured on chip: 1e-2 rms force error through the PME spread's
    B-spline taps; CPU-f64 tests cannot see this)."""
    if jnp.ndim(box) == 1:
        return positions / box
    inv = inv_box(box)
    fx = (positions[..., 0] * inv[0, 0] + positions[..., 1] * inv[1, 0]
          + positions[..., 2] * inv[2, 0])
    fy = positions[..., 1] * inv[1, 1] + positions[..., 2] * inv[2, 1]
    fz = positions[..., 2] * inv[2, 2]
    return jnp.stack([fx, fy, fz], axis=-1)


def plane_widths(box):
    """(3,) perpendicular distances between opposite box faces along each
    FRACTIONAL axis: w_d = 1 / |inv_box[:, d]| (the gradient of frac_d is
    column d of the inverse, so adjacent frac_d = const planes 1 apart sit
    w_d apart).  Equals the diagonal for orthorhombic boxes.  These are
    the metric the cell-pair sweep's stencil coverage is computed in: two
    atoms whose cells differ by k in dim d are at least (k-1) * w_d/g_d
    apart."""
    if jnp.ndim(box) == 1:
        return box
    inv = inv_box(box)
    return 1.0 / jnp.sqrt(jnp.sum(inv * inv, axis=0))


def frac_coords_elem(positions_t, box):
    """(3, N) Cartesian -> (3, N) fractional, ELEMENTWISE (no dot_general:
    TPU f32 matmuls default to bfloat16 inputs, whose 7-bit mantissa would
    misbin atoms near cell faces — see CLAUDE.md TPU correctness rules)."""
    inv = inv_box(box)
    fx = (positions_t[0] * inv[0, 0] + positions_t[1] * inv[1, 0]
          + positions_t[2] * inv[2, 0])
    fy = positions_t[1] * inv[1, 1] + positions_t[2] * inv[2, 1]
    fz = positions_t[2] * inv[2, 2]
    return jnp.stack([fx, fy, fz])


def rows_combo_elem(coeff_t, box):
    """(3, ...) fractional/integer row coefficients -> (3, ...) Cartesian
    sum_k coeff_k * box[k], elementwise (same bf16-avoidance as above)."""
    b = box.astype(coeff_t.dtype)
    x = coeff_t[0] * b[0, 0] + coeff_t[1] * b[1, 0] + coeff_t[2] * b[2, 0]
    y = coeff_t[1] * b[1, 1] + coeff_t[2] * b[2, 1]
    z = coeff_t[2] * b[2, 2]
    return jnp.stack([x, y, z])


def inv_box(box):
    """Inverse of the reduced lower-triangular row-vector box (3, 3)."""
    ax = box[0, 0]
    bx, by = box[1, 0], box[1, 1]
    cx, cy, cz = box[2, 0], box[2, 1], box[2, 2]
    zero = jnp.zeros((), box.dtype)
    # rows of box are a, b, c; positions = frac @ box, so inv satisfies
    # box @ inv = I with inv ALSO lower-triangular
    i00 = 1.0 / ax
    i10 = -bx / (ax * by)
    i11 = 1.0 / by
    i20 = (bx * cy - by * cx) / (ax * by * cz)
    i21 = -cy / (by * cz)
    i22 = 1.0 / cz
    return jnp.stack([
        jnp.stack([i00, zero, zero]),
        jnp.stack([i10, i11, zero]),
        jnp.stack([i20, i21, i22]),
    ])
