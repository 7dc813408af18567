"""C4 alternative — partitioned cuckoo filter (BASELINE.json north_star:
"partitioned bloom/cuckoo URL-seen filter").

Same sidecar contract as the bloom path (operators/dedup.py): serialized
per-partition blobs in the `seen_filters` table, probed/updated inside
cogrouped `applyInPandas`, and — like bloom — strictly a NEGATIVE fast
path: a miss proves the key was never inserted; hits are confirmed by
the exact anti-join. Unlike bloom, cuckoo supports DELETE (needed if a
frontier ever retracts URLs) and probes exactly 2 buckets per key.

Layout (numpy, vectorized): `nbuckets` × `slots` uint16 fingerprint
table, fingerprint = 1 + (h >> 48) & 0x7FFF (never 0 = empty).
bucket1 = h mod nbuckets; bucket2 = bucket1 XOR (fp * 0x5bd1e995 mod
nbuckets) — the standard partial-key cuckoo scheme (Fan et al.,
"Cuckoo Filter: Practically Better Than Bloom", CoNEXT 2014).
"""

from __future__ import annotations

import numpy as np

_MIX = np.uint64(0x5BD1E995)


def _fingerprint(h: np.ndarray) -> np.ndarray:
    return (1 + ((h >> np.uint64(48)) & np.uint64(0x7FFF))).astype(np.uint16)


def _bucket1(h: np.ndarray, nbuckets: int) -> np.ndarray:
    return (h % np.uint64(nbuckets)).astype(np.int64)


def _bucket2(b1: np.ndarray, fp: np.ndarray, nbuckets: int) -> np.ndarray:
    alt = (fp.astype(np.uint64) * _MIX) % np.uint64(nbuckets)
    return (b1.astype(np.uint64) ^ alt).astype(np.int64) % nbuckets


class CuckooFilter:
    """Vectorized fixed-size cuckoo filter over uint64 keys."""

    def __init__(self, nbuckets: int = 1 << 13, slots: int = 4):
        self.nbuckets, self.slots = nbuckets, slots
        self.table = np.zeros((nbuckets, slots), dtype=np.uint16)

    # ------------------------------------------------------------- insert
    def insert(self, hashes: np.ndarray, max_kicks: int = 200) -> bool:
        """Insert all keys; False if the filter overflowed (caller should
        resize/rebuild — overflow never loses exactness because the filter
        is only a negative fast path, but it must be reported)."""
        fps = _fingerprint(hashes)
        b1s = _bucket1(hashes, self.nbuckets)
        b2s = _bucket2(b1s, fps, self.nbuckets)
        rng = np.random.default_rng(42)  # deterministic kick choice
        ok = True
        for fp, b1, b2 in zip(fps, b1s, b2s):
            if not self._insert_one(int(fp), int(b1), int(b2), rng, max_kicks):
                ok = False
        return ok

    def _insert_one(self, fp: int, b1: int, b2: int, rng, max_kicks: int) -> bool:
        for b in (b1, b2):
            row = self.table[b]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                return True
        b = b1
        for _ in range(max_kicks):
            slot = int(rng.integers(self.slots))
            fp, self.table[b, slot] = int(self.table[b, slot]), fp
            b = int(
                _bucket2(
                    np.asarray([b], dtype=np.int64),
                    np.asarray([fp], dtype=np.uint16),
                    self.nbuckets,
                )[0]
            )
            row = self.table[b]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                return True
        return False

    # -------------------------------------------------------------- probe
    def maybe_contains(self, hashes: np.ndarray) -> np.ndarray:
        fps = _fingerprint(hashes)
        b1s = _bucket1(hashes, self.nbuckets)
        b2s = _bucket2(b1s, fps, self.nbuckets)
        in1 = (self.table[b1s] == fps[:, None]).any(axis=1)
        in2 = (self.table[b2s] == fps[:, None]).any(axis=1)
        return in1 | in2

    # ------------------------------------------------------------- delete
    def delete(self, hashes: np.ndarray) -> np.ndarray:
        """Remove one copy of each key's fingerprint; returns per-key
        success (False = key was not present)."""
        fps = _fingerprint(hashes)
        b1s = _bucket1(hashes, self.nbuckets)
        b2s = _bucket2(b1s, fps, self.nbuckets)
        out = np.zeros(len(hashes), dtype=bool)
        for i, (fp, b1, b2) in enumerate(zip(fps, b1s, b2s)):
            for b in (int(b1), int(b2)):
                row = self.table[b]
                hit = np.nonzero(row == fp)[0]
                if len(hit):
                    row[hit[0]] = 0
                    out[i] = True
                    break
        return out

    # ---------------------------------------------------------- serialize
    def to_bytes(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes, nbuckets: int, slots: int) -> "CuckooFilter":
        f = cls.__new__(cls)
        f.nbuckets, f.slots = nbuckets, slots
        f.table = np.frombuffer(blob, dtype=np.uint16).reshape(nbuckets, slots).copy()
        return f
