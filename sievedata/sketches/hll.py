"""Dense HyperLogLog (Flajolet et al. 2007, with the standard small/large
range corrections) for approximate distinct counts of doc_id / invoice-number
fields per partition (north_rule uniqueness checks).

Registers merge by elementwise max — associative, commutative, idempotent.
"""
from __future__ import annotations

import numpy as np

from sievedata.sketches.hashing import hash64


class HyperLogLog:
    __slots__ = ("p", "m", "registers")

    def __init__(self, p: int = 12, registers: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        if registers is None:
            registers = np.zeros(self.m, dtype=np.uint8)
        self.registers = registers

    def update_hashes(self, hashes: np.ndarray) -> "HyperLogLog":
        if hashes.size == 0:
            return self
        idx = (hashes >> np.uint64(64 - self.p)).astype(np.int64)
        rest = hashes << np.uint64(self.p)
        # rank = leading zeros of the remaining 64-p bits + 1 (capped at 64-p+1)
        bl_full = _bit_length_u64(rest)
        rank = np.where(rest == 0, 64 - self.p + 1, 64 - bl_full + 1).astype(np.int64)
        np.maximum.at(self.registers, idx, rank.astype(np.uint8))
        return self

    def update(self, values) -> "HyperLogLog":
        h = hash64(values, seed=1215)
        return self.update_hashes(h[h != 0])

    def merged(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        return HyperLogLog(self.p, np.maximum(self.registers, other.registers))

    def cardinality(self) -> float:
        m = float(self.m)
        regs = self.registers.astype(np.float64)
        est = _alpha(self.m) * m * m / np.sum(np.exp2(-regs))
        zeros = int((self.registers == 0).sum())
        if est <= 2.5 * m and zeros > 0:
            est = m * np.log(m / zeros)  # linear counting
        elif est > (1 / 30) * 2**64:
            est = -(2**64) * np.log(1 - est / 2**64)
        return float(est)

    def to_bytes(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def sparse_partial(cls, values, p: int = 12) -> bytes:
        """Sparse partial-update blob for a SMALL value set: only the
        non-zero (register index, rank) pairs — ~3 B per distinct register
        instead of the 4 KB dense image, a 50×+ cut in per-(batch, key)
        partial shuffle volume.  Merging all partials with
        :meth:`merge_sparse` yields registers bit-identical to dense
        updates (register max is associative/commutative/idempotent).

        Layout: k little-endian uint16 indices, then k uint8 ranks
        (k = len(blob) // 3); requires p ≤ 16."""
        assert p <= 16
        tmp = cls(p)
        tmp.update(values)
        nz = np.flatnonzero(tmp.registers)
        return (nz.astype("<u2").tobytes() + tmp.registers[nz].tobytes())

    def to_sparse(self) -> bytes:
        """Re-serialize CURRENT registers in the sparse-partial layout, so a
        merged sketch can be persisted and later merged again with
        :meth:`merge_sparse` (incremental-validation chains).  Bit-exact:
        register max is idempotent, so sparse→merge→sparse round-trips."""
        nz = np.flatnonzero(self.registers)
        return (nz.astype("<u2").tobytes() + self.registers[nz].tobytes())

    def merge_sparse(self, blob: bytes) -> "HyperLogLog":
        k = len(blob) // 3
        if k:
            idx = np.frombuffer(blob[: 2 * k], dtype="<u2").astype(np.int64)
            rank = np.frombuffer(blob[2 * k:], dtype=np.uint8)
            np.maximum.at(self.registers, idx, rank)
        return self

    @classmethod
    def from_bytes(cls, data: bytes) -> "HyperLogLog":
        p = data[0]
        regs = np.frombuffer(data[1:], dtype=np.uint8).copy()
        return cls(p, regs)


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized bit_length for uint64 (0 → 0)."""
    out = np.zeros(x.shape, dtype=np.int64)
    tmp = x.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        ge = tmp >= (np.uint64(1) << np.uint64(shift))
        out += np.where(ge, shift, 0)
        tmp = np.where(ge, tmp >> np.uint64(shift), tmp)
    out += (tmp == 1).astype(np.int64)
    return out


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)
