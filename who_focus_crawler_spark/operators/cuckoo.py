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
        # power-of-two buckets is REQUIRED: _bucket2's XOR pairing is an
        # involution only then (b ^ alt < nbuckets); otherwise a kicked
        # fingerprint can land in a bucket maybe_contains never probes
        # → false negatives.
        if nbuckets <= 0 or (nbuckets & (nbuckets - 1)) != 0:
            raise ValueError(f"nbuckets must be a power of two, got {nbuckets}")
        self.nbuckets, self.slots = nbuckets, slots
        self.table = np.zeros((nbuckets, slots), dtype=np.uint16)

    # ------------------------------------------------------------- insert
    def insert(self, hashes: np.ndarray, max_kicks: int = 200) -> bool:
        """Insert all keys; False if the filter overflowed.

        IMPORTANT: an overflow means the kick loop dropped a resident
        fingerprint — the table now HAS false negatives and must not be
        probed again (callers rebuild at larger size or mark the
        partition saturated; see operators/dedup.py).

        Vectorized common case: one numpy scatter places every key whose
        primary bucket has a free slot, a second scatter the remainder's
        secondary buckets; only keys whose both buckets are full take the
        per-key kick loop (at ≤50% design load that's a tiny residue).
        """
        fps = _fingerprint(hashes)
        b1s = _bucket1(hashes, self.nbuckets)
        b2s = _bucket2(b1s, fps, self.nbuckets)
        pending = self._bulk_place(fps, b1s, np.arange(len(fps)))
        pending = self._bulk_place(fps, b2s, pending)
        rng = np.random.default_rng(42)  # deterministic kick choice
        ok = True
        for i in pending:
            if not self._insert_one(
                int(fps[i]), int(b1s[i]), int(b2s[i]), rng, max_kicks
            ):
                ok = False
        return ok

    def _bulk_place(self, fps: np.ndarray, buckets: np.ndarray, idx: np.ndarray) -> np.ndarray:
        """Scatter fps[idx] into free slots of buckets[idx] (delete()-made
        holes included); returns the sub-indices that did not fit."""
        if len(idx) == 0:
            return idx
        order = idx[np.argsort(buckets[idx], kind="stable")]
        bs = buckets[order]
        # within-group rank among same-bucket keys in this batch
        first = np.zeros(len(bs), dtype=bool)
        first[0] = True
        first[1:] = bs[1:] != bs[:-1]
        group_start = np.maximum.accumulate(np.where(first, np.arange(len(bs)), 0))
        within = np.arange(len(bs)) - group_start
        # each key takes the (within+1)-th free slot of its bucket
        free = self.table[bs] == 0  # (k, slots) — read-only copy
        cumfree = free.cumsum(axis=1)
        want = (within + 1)[:, None]
        match = free & (cumfree == want)
        placed = match.any(axis=1)
        slot = match.argmax(axis=1)
        self.table.flat[bs[placed] * self.slots + slot[placed]] = fps[order[placed]]
        return order[~placed]

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
        if nbuckets <= 0 or (nbuckets & (nbuckets - 1)) != 0:
            raise ValueError(f"nbuckets must be a power of two, got {nbuckets}")
        f = cls.__new__(cls)
        f.nbuckets, f.slots = nbuckets, slots
        f.table = np.frombuffer(blob, dtype=np.uint16).reshape(nbuckets, slots).copy()
        return f
