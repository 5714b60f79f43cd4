"""Partitioned blocked-Bloom-filter URL-seen set (SURVEY.md §2 A8 — the
"bloom" half of the north rule's "bloom/cuckoo URL-seen"; [B:14]).

Register-blocked Bloom filter (Putze, Sanders & Singler, "Cache-,
Hash- and Space-Efficient Bloom Filters", WEA'07): every key maps to
ONE 64-byte (512-bit) block — a single cache line — and sets k=8 bits
inside that block, so a lookup touches exactly one line instead of k
scattered ones.  All insert/lookup paths are numpy-vectorized, mirroring
``functions/cuckoo.py``: the filter lives inside grouped-map pandas
UDFs, one blob per host-hash partition, serialized to the ``binary``
column of the ``seen_filter`` table.

Role in the engine: identical to the cuckoo filter's — a *pruning
accelerator only*.  "Definitely new" candidates skip the exact
anti-join's shuffle of the (at design scale 10^10-row) ``seen`` table;
"maybe seen" survivors go through the exact anti-join, which remains
the authority (SURVEY.md §7.1).  A Bloom filter cannot overflow the way
a cuckoo table can — over-full blobs just degrade FPR, never raise —
which is why it is offered as the alternative ``filter_kind``: delta
blobs whose size estimate is wrong stay correct AND functional.

Sizing: 12 bits/key, k=8 → classic-Bloom FPR ≈ 0.3 %; blocking adds
block-load variance (Putze et al. §3) for a measured ≈ 0.5 % at exact
sizing, and power-of-two rounding of the block count only lowers it.
vs cuckoo (16-bit fp × 4 slots at 0.84 load ≈ 19 bits/key, FPR
≈ 0.012 %): the bloom blob is ~40 % smaller per key at ~40× the FPR —
both FPRs are pruning-quality differences only, far below the point
where the exact anti-join's survivor set stops shrinking usefully.

Keys are the engine's canonical-URL xxhash64 values (int64); block
index and in-block bit positions are derived by splitmix/multiply-shift
mixing, no string hashing here.
"""

from __future__ import annotations

import numpy as np

BLOCK_BITS = 512          # one 64-byte cache line per key
WORDS_PER_BLOCK = BLOCK_BITS // 64
K = 8                     # bits set per key
BITS_PER_KEY = 12         # pre-rounding sizing target

# magic: first int64 of the blob. Cuckoo blobs start with n_buckets (a
# positive power of two), so any negative sentinel is unambiguous —
# operators/seen.py's decode_filter dispatches on the sign.
MAGIC = np.int64(-0x424C4D31)  # "BLM1"

# 8 odd 64-bit multipliers (splitmix64 / xxh / wyhash-derived odd
# constants) for multiply-shift position hashing: position_j =
# top-9-bits(h * MULT_j). Independent multipliers decorrelate the k
# positions from one 64-bit mixed key.
_MULTS = np.array(
    [
        0x9E3779B97F4A7C15,
        0xC2B2AE3D27D4EB4F,
        0xBF58476D1CE4E5B9,
        0x94D049BB133111EB,
        0xD6E8FEB86659FD93,
        0xA0761D6478BD642F,
        0xE7037ED1A0B428DB,
        0x8EBC6AF09C88C6E3,
    ],
    dtype=np.uint64,
)


def _mix(x: np.ndarray) -> np.ndarray:
    # splitmix64 finalizer — same mixer as functions/cuckoo.py, for the
    # same reason: the seen set is partitioned by pmod(url_hash, P), so
    # raw low bits are constant within a partition and must not pick
    # the block index.
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


class BlockedBloomFilter:
    """One partition's filter. ``table`` is uint64[n_blocks, 8] — each
    row is one 512-bit block."""

    def __init__(
        self, n_blocks: int, table: np.ndarray | None = None, n_keys: int = 0
    ):
        # power-of-two block count so index math is a mask
        assert n_blocks & (n_blocks - 1) == 0, "n_blocks must be a power of two"
        self.n_blocks = n_blocks
        self.table = (
            table
            if table is not None
            else np.zeros((n_blocks, WORDS_PER_BLOCK), dtype=np.uint64)
        )
        self.n_keys = n_keys

    # -- key decomposition ----------------------------------------------------
    def _block_and_positions(self, keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(block_idx int64[n], positions int64[n, K] in 0..511)."""
        u = np.asarray(keys).astype(np.int64).view(np.uint64)
        h = _mix(u)
        blk = (h & np.uint64(self.n_blocks - 1)).astype(np.int64)
        # second independent mix feeds the multiply-shift position hashes
        h2 = _mix(u ^ np.uint64(0x2545F4914F6CDD1D))
        prod = h2[:, None] * _MULTS[None, :]          # wraps mod 2^64
        pos = (prod >> np.uint64(64 - 9)).astype(np.int64)  # top 9 bits: 0..511
        return blk, pos

    # -- vectorized membership --------------------------------------------------
    def contains(self, keys: np.ndarray) -> np.ndarray:
        """bool[n]: True = maybe present, False = definitely absent."""
        keys = np.asarray(keys)
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        blk, pos = self._block_and_positions(keys)
        words = pos >> 6                               # word index within block
        bits = (pos & 63).astype(np.uint64)
        got = (self.table[blk[:, None], words] >> bits) & np.uint64(1)
        return (got == 1).all(axis=1)

    # -- vectorized insertion ----------------------------------------------------
    def insert(self, keys: np.ndarray) -> int:
        """Insert keys (duplicates fine); returns number inserted.
        Never raises: an over-full bloom degrades FPR, not correctness."""
        keys = np.asarray(keys)
        if len(keys) == 0:
            return 0
        blk, pos = self._block_and_positions(keys)
        words = pos >> 6
        bits = np.uint64(1) << (pos & 63).astype(np.uint64)
        np.bitwise_or.at(
            self.table, (np.repeat(blk, K), words.ravel()), bits.ravel()
        )
        self.n_keys += len(keys)
        return len(keys)

    # -- serialization (binary column round-trip) ---------------------------------
    def to_bytes(self) -> bytes:
        header = np.array([MAGIC, self.n_blocks, self.n_keys], dtype=np.int64)
        return header.tobytes() + self.table.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "BlockedBloomFilter":
        magic, n_blocks, n_keys = np.frombuffer(blob[:24], dtype=np.int64)
        assert magic == MAGIC, "not a blocked-bloom blob"
        table = (
            np.frombuffer(blob[24:], dtype=np.uint64)
            .reshape(int(n_blocks), WORDS_PER_BLOCK)
            .copy()
        )
        return cls(int(n_blocks), table, int(n_keys))

    @classmethod
    def sized_for(cls, expected_keys: int, load: float | None = None) -> "BlockedBloomFilter":
        """``load`` accepted for cuckoo-signature parity; unused (bloom
        sizing is bits/key, not slot load)."""
        need = max(1, -(-max(1, expected_keys) * BITS_PER_KEY // BLOCK_BITS))
        n = 1
        while n < need:
            n <<= 1
        return cls(n)

    def grown(self, extra_keys: int) -> "BlockedBloomFilter":
        """A copy big enough for n_keys+extra_keys — same contract as
        CuckooFilter.grown: bits can't be unhashed, so callers rebuild
        from the ``seen`` table; this just sizes the new blob."""
        return BlockedBloomFilter.sized_for(self.n_keys + extra_keys)
