"""Stable content-hashing kernels: shingling, MinHash, SimHash.

Every hash here is PERMANENTLY stable (blake2b / explicit arithmetic —
never Python's salted ``hash()`` or a library hash that may change
between versions), because signatures are compared across processes,
runs and machines. Used by the near-duplicate stages in
``stages/dedup.py``.
"""
from __future__ import annotations

import hashlib
import re

import numpy as np

TOKEN_RE = re.compile(r"[A-Za-z0-9]+")

_MERSENNE_P = (1 << 61) - 1
_MAX_U64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def tokens_of(text: str) -> list[str]:
    return TOKEN_RE.findall(text.lower())


def stable_hash64(data: bytes) -> int:
    """64-bit stable hash (blake2b truncation)."""
    return int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "little")


def shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    """Word ``n``-gram shingles of a document, each hashed to uint64.
    Returns a unique array (set semantics for Jaccard)."""
    toks = tokens_of(text)
    if len(toks) < n:
        shingles = [" ".join(toks)] if toks else []
    else:
        shingles = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    if not shingles:
        return np.empty(0, dtype=np.uint64)
    arr = np.fromiter(
        (stable_hash64(s.encode("utf-8")) for s in shingles),
        dtype=np.uint64,
        count=len(shingles),
    )
    return np.unique(arr)


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard over two unique uint64 shingle-hash sets."""
    if len(a) == 0 and len(b) == 0:
        return 1.0
    if len(a) == 0 or len(b) == 0:
        return 0.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    return inter / (len(a) + len(b) - inter)


def minhash_params(num_perm: int, seed: int = 1234) -> tuple[np.ndarray, np.ndarray]:
    """Seeded (a, b) coefficients for the permutation family
    ``h_i(x) = (a_i * x + b_i) mod 2^64`` with odd ``a_i`` — an odd
    multiplier makes the affine map a bijection on uint64, so native
    wraparound arithmetic gives a true permutation with no bigint cost."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MAX_U64, size=num_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, _MAX_U64, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(
    shingles: np.ndarray, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """MinHash signature (num_perm,) of one shingle set. Fully
    vectorized: one (num_perm x num_shingles) uint64 multiply-add with
    intentional wraparound, then a min-reduce."""
    num_perm = len(a)
    if shingles.size == 0:
        return np.full(num_perm, _MAX_U64, dtype=np.uint64)
    with np.errstate(over="ignore"):
        vals = a[:, None] * shingles[None, :].astype(np.uint64) + b[:, None]
    return vals.min(axis=1)


def band_keys(signature: np.ndarray, num_bands: int) -> list[int]:
    """LSH band bucket keys: stable 64-bit hash of each band's rows."""
    rows = len(signature) // num_bands
    keys = []
    for bnd in range(num_bands):
        chunk = signature[bnd * rows : (bnd + 1) * rows]
        keys.append(stable_hash64(chunk.tobytes()))
    return keys


def simhash(text: str) -> int:
    """64-bit SimHash over token hashes weighted by frequency."""
    toks = tokens_of(text)
    if not toks:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    from collections import Counter

    for tok, cnt in Counter(toks).items():
        h = stable_hash64(tok.encode("utf-8"))
        bits = (np.uint64(h) >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), cnt, -cnt)
    out = np.uint64(0)
    for i in range(64):
        if acc[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out)


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def simhash_band_keys(value: int, num_bands: int = 4) -> list[int]:
    """Split a 64-bit simhash into ``num_bands`` chunks; two docs within
    ``num_bands - 1`` bit flips share at least one chunk only if the
    flips avoid it — standard banded candidate generation (guaranteed
    recall for hamming distance < num_bands when flips hit distinct
    bands; verification is exact afterwards)."""
    width = 64 // num_bands
    mask = (1 << width) - 1
    return [((value >> (i * width)) & mask) | (i << width) for i in range(num_bands)]


class UnionFind:
    """Driver-side union-find over candidate duplicate pairs. The
    partitioning assumption (documented per SURVEY §2 custom-operator
    rule): the candidate PAIR set is small (dup rate bounded), even when
    the corpus is huge — pairs, not docs, flow to the driver."""

    def __init__(self):
        self.parent: dict[int, int] = {}

    def find(self, x: int) -> int:
        p = self.parent.setdefault(x, x)
        if p != x:
            self.parent[x] = p = self.find(p)
        return p

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # deterministic: smaller id becomes the root
            if rb < ra:
                ra, rb = rb, ra
            self.parent[rb] = ra

    def groups(self) -> dict[int, list[int]]:
        out: dict[int, list[int]] = {}
        for x in list(self.parent):
            out.setdefault(self.find(x), []).append(x)
        return out
