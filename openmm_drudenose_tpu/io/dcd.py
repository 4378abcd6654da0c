"""Minimal CHARMM/X-PLOR DCD trajectory writer (the format the reference
example records through OpenMM's DCDReporter, example/nacl_tg.py:87)."""

from __future__ import annotations

import struct

import numpy as np


class DCDWriter:
    def __init__(self, path: str, dt_ps: float = 0.001,
                 interval: int = 1):
        self._f = open(path, "wb")
        self._n_atoms = None
        self._n_frames = 0
        self._dt = dt_ps
        self._interval = interval

    def _block(self, payload: bytes) -> None:
        self._f.write(struct.pack("<i", len(payload)))
        self._f.write(payload)
        self._f.write(struct.pack("<i", len(payload)))

    def _write_header(self, n_atoms: int) -> None:
        # AKMA time unit conversion: 1 AKMA = 0.04888821 ps
        delta = self._dt * self._interval / 0.04888821
        head = struct.pack(
            "<4s9if10i", b"CORD",
            0,              # frames so far (patched on close)
            0,              # first step
            self._interval, # steps between frames
            0, 0, 0, 0, 0, 0,
            delta,
            1,              # unit cell present
            0, 0, 0, 0, 0, 0, 0, 0,
            24)             # CHARMM version
        self._block(head)
        title = b"Created by openmm_drudenose_tpu" + b" " * 49
        self._block(struct.pack("<i", 1) + title[:80])
        self._block(struct.pack("<i", n_atoms))
        self._f.flush()

    def write_frame(self, positions_nm: np.ndarray, box_nm) -> None:
        """Write one frame.

        ``box_nm`` may be a length-3 diagonal (orthorhombic) or the full
        (3, 3) row-vector box matrix; triclinic cells are recorded as
        (a, b, c, alpha, beta, gamma) derived from the box vectors.
        """
        pos = np.asarray(positions_nm, np.float64) * 10.0  # nm -> angstrom
        if self._n_atoms is None:
            self._n_atoms = pos.shape[0]
            self._write_header(self._n_atoms)
        box = np.asarray(box_nm, np.float64) * 10.0
        if box.ndim == 1:
            a, b, c = box
            cos_a = cos_b = cos_g = 0.0
        else:
            v1, v2, v3 = box
            a = float(np.linalg.norm(v1))
            b = float(np.linalg.norm(v2))
            c = float(np.linalg.norm(v3))
            cos_a = float(np.dot(v2, v3) / (b * c))   # alpha: angle(b, c)
            cos_b = float(np.dot(v1, v3) / (a * c))   # beta:  angle(a, c)
            cos_g = float(np.dot(v1, v2) / (a * b))   # gamma: angle(a, b)
        # CHARMM unit-cell record: a, cos(gamma), b, cos(beta), cos(alpha), c
        cell = struct.pack("<6d", a, cos_g, b, cos_b, cos_a, c)
        self._block(cell)
        for c in range(3):
            self._block(pos[:, c].astype("<f4").tobytes())
        self._n_frames += 1
        self._f.flush()

    def close(self) -> None:
        if self._f.closed:
            return
        # patch the frame count
        self._f.seek(8)
        self._f.write(struct.pack("<i", self._n_frames))
        self._f.close()

    def __del__(self):  # best-effort frame-count patch on GC
        try:
            self.close()
        except Exception:
            pass
