"""Numpy-vectorized XXH64 over batches of variable-length byte strings,
bit-compatible with Spark's ``F.xxhash64`` (seed 42) — the string path only.

Written for the r11 map-only MinHash-profile experiment (OPTIMIZATION_r11.md,
q52 fourth pass): a `mapInArrow` tokenize+shingle+hash pass needs executor-side
hashing that reproduces Spark's xxhash64 exactly, and the pure-Python
tools/sparkhash.py is too slow for bulk use. The experiment LOST its A/B at
sf0.1 (Arrow boundary > JVM work replaced at 5 k docs) so nothing in the
package uses this yet; it is committed as the parity-proven primitive for a
future larger-corpus crossover (optimization round 2 note).

Parity: ``python tools/xxh64_np.py`` self-tests against tools/sparkhash.py on
107 edge-length cases (0..100, 127/128, 200, 255/256, 1000 bytes) plus a
300 k-string bulk set. The algorithm is the public XXH64 spec; see
tools/sparkhash.py for the Spark-specific framing.
"""
from __future__ import annotations

import numpy as np

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)
_M = 0xFFFFFFFFFFFFFFFF


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    return (x << np.uint64(r)) | (x >> np.uint64(64 - r))


def _fmix(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> np.uint64(33))
    h = h * _P2
    h = h ^ (h >> np.uint64(29))
    h = h * _P3
    h = h ^ (h >> np.uint64(32))
    return h


def _round(acc: np.ndarray, inp: np.ndarray) -> np.ndarray:
    acc = acc + inp * _P2
    acc = _rotl(acc, 31)
    return acc * _P1


def _merge_round(h: np.ndarray, acc: np.ndarray) -> np.ndarray:
    h = h ^ _round(np.uint64(0), acc)
    return h * _P1 + _P4


def xxh64_batch(data: np.ndarray, offsets: np.ndarray, seed: int = 42) -> np.ndarray:
    """XXH64 of n byte strings packed in ``data`` (uint8), string i spanning
    ``data[offsets[i]:offsets[i+1]]``. Returns a uint64 array of n hashes.

    Strategy: pad every row to a common 32-byte-multiple stride so the 8-byte
    lanes vectorize, then walk stripe/chunk positions with per-row validity
    masks (rows shorter than a position keep their running state). All
    arithmetic is wrapping uint64, matching the spec exactly.
    """
    n = len(offsets) - 1
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    lens = (offsets[1:] - offsets[:-1]).astype(np.int64)
    maxlen = int(lens.max())
    stride = max(32, ((maxlen + 31) // 32) * 32)
    buf = np.zeros(n * stride, dtype=np.uint8)
    total = int(lens.sum())
    if total:
        within = np.arange(total, dtype=np.int64) - np.repeat(
            offsets[:-1].astype(np.int64), lens
        )
        out_pos = np.repeat(np.arange(n, dtype=np.int64) * stride, lens) + within
        buf[out_pos] = data
    u64 = buf.view("<u8").reshape(n, stride // 8)
    u32 = buf.view("<u4").reshape(n, stride // 4)
    rows = buf.reshape(n, stride)

    seed64 = np.uint64(seed & _M)
    h = np.full(n, np.uint64((int(seed64) + int(_P5)) & _M), dtype=np.uint64)

    big = lens >= 32
    if big.any():
        v1 = np.full(n, np.uint64((int(seed64) + int(_P1) + int(_P2)) & _M), dtype=np.uint64)
        v2 = np.full(n, np.uint64((int(seed64) + int(_P2)) & _M), dtype=np.uint64)
        v3 = np.full(n, seed64, dtype=np.uint64)
        v4 = np.full(n, np.uint64((int(seed64) - int(_P1)) & _M), dtype=np.uint64)
        for s in range(maxlen // 32):
            valid = lens >= (s + 1) * 32
            if not valid.any():
                break
            base = s * 4
            v1 = np.where(valid, _round(v1, u64[:, base + 0]), v1)
            v2 = np.where(valid, _round(v2, u64[:, base + 1]), v2)
            v3 = np.where(valid, _round(v3, u64[:, base + 2]), v3)
            v4 = np.where(valid, _round(v4, u64[:, base + 3]), v4)
        hb = _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        hb = _merge_round(hb, v1)
        hb = _merge_round(hb, v2)
        hb = _merge_round(hb, v3)
        hb = _merge_round(hb, v4)
        h = np.where(big, hb, h)

    h = h + lens.astype(np.uint64)

    start = np.where(big, (lens // 32) * 32, 0).astype(np.int64)
    for p in range(stride // 8):
        pos = p * 8
        valid = (pos >= start) & (pos + 8 <= lens)
        if not valid.any():
            continue
        k1 = _round(np.uint64(0), u64[:, p])
        h = np.where(valid, _rotl(h ^ k1, 27) * _P1 + _P4, h)
    consumed = start + ((lens - start) // 8) * 8

    has4 = consumed + 4 <= lens
    if has4.any():
        # consumed is 4-aligned by construction (multiples of 32 and 8)
        w32 = u32[np.arange(n), np.clip(consumed // 4, 0, stride // 4 - 1)].astype(np.uint64)
        h = np.where(has4, _rotl(h ^ (w32 * _P1), 23) * _P2 + _P3, h)
    consumed = consumed + np.where(has4, 4, 0)

    for t in range(3):
        pos = consumed + t
        valid = pos < lens
        if not valid.any():
            break
        b = rows[np.arange(n), np.clip(pos, 0, stride - 1)].astype(np.uint64)
        h = np.where(valid, _rotl(h ^ (b * _P5), 11) * _P1, h)

    return _fmix(h)


def xxh64_strings(strs, seed: int = 42) -> np.ndarray:
    """Convenience: XXH64 of a sequence of Python strings (UTF-8 bytes)."""
    bs = [s.encode("utf-8") for s in strs]
    lens = np.fromiter((len(b) for b in bs), dtype=np.int64, count=len(bs))
    offsets = np.zeros(len(bs) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    data = np.frombuffer(b"".join(bs), dtype=np.uint8)
    return xxh64_batch(data, offsets, seed)


if __name__ == "__main__":
    import os
    import random
    import sys
    import time

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tools.sparkhash import xxh64_bytes

    random.seed(7)
    cases = [""]
    for ln in list(range(1, 101)) + [127, 128, 200, 255, 256, 1000]:
        cases.append("".join(random.choice("abcdefgh ij") for _ in range(ln)))
    got = xxh64_strings(cases)
    for s, g in zip(cases, got):
        want = xxh64_bytes(s.encode("utf-8"), 42)
        assert int(g) == want, (len(s), int(g), want)
    print(f"parity ok on {len(cases)} edge cases")

    bulk = ["tok%d tok%d tok%d" % (i, i + 1, i + 2) for i in range(300_000)]
    t0 = time.time()
    h = xxh64_strings(bulk)
    dt = time.time() - t0
    ref = [xxh64_bytes(s.encode(), 42) for s in bulk[:20_000]]
    assert [int(x) for x in h[:20_000]] == ref
    print(f"bulk parity ok; {len(bulk)} hashes in {dt:.3f}s")
