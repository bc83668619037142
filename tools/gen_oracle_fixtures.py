"""Generate committed oracle fixtures for the hash-based gate queries.

q52 (MinHash+LSH), q53 (SimHash), q55 (hyperplane-LSH ANN) and q57 (IVF-flat
ANN) are deterministic but use engine hash functions DuckDB cannot evaluate,
so their oracles are expected-output parquet fixtures at the gate scale
(sf0.01), produced HERE by an independent pure-Python/numpy reimplementation
of the same public algorithm specs:

- the hash primitive is tools/sparkhash.py (XXH64 re-derived from the public
  spec, validated against Spark's xxhash64 in tests/test_llmdata.py);
- shingling / banding / signatures / Lloyd steps are re-implemented from the
  algorithm definitions (not by calling the Spark operators), so a bug in the
  Spark pipeline cannot cancel out in the oracle;
- float math follows the same IEEE-754 left-fold evaluation order the Spark
  column expressions use, and rounding replicates Spark's HALF_UP-on-shortest-
  repr semantics, so doubles match bit-for-bit.

Usage: python tools/gen_oracle_fixtures.py  (rewrites tests/fixtures/*.parquet)
"""

from __future__ import annotations

import math
import os
import re
import sys
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.sparkhash import spark_xxhash64, xxh64_bytes  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "tests", "fixtures")

_WS = re.compile(r"\s+", re.ASCII)  # Java \s is ASCII-only by default


def spark_round(x: float, d: int = 6) -> float:
    """Spark's round(double, d): HALF_UP on the shortest decimal repr."""
    if x != x or math.isinf(x):
        return x
    return float(Decimal(repr(x)).quantize(Decimal(1).scaleb(-d), rounding=ROUND_HALF_UP))


def cos_sim(a, b) -> float:
    """cosine_similarity as the Spark column expression folds it: sequential
    left-fold dot and squared norms in element order, then dot/(sqrt*sqrt)."""
    dot = 0.0
    for x, y in zip(a, b):
        dot = dot + float(x) * float(y)
    na = 0.0
    for x in a:
        na = na + float(x) * float(x)
    nb = 0.0
    for y in b:
        nb = nb + float(y) * float(y)
    return dot / (math.sqrt(na) * math.sqrt(nb))


def _tokens_collapsed(text: str) -> list[str]:
    """split(regexp_replace(lower(trim(text)), '\\s+', ' '), ' ')."""
    return _WS.sub(" ", text.strip(" ").lower()).split(" ")


def _tokens_ws(text: str) -> list[str]:
    """split(lower(trim(text)), '\\s+')."""
    return _WS.split(text.strip(" ").lower())


def _read(table: str) -> pa.Table:
    return pq.read_table(os.path.join(SF_DIR, f"{table}.parquet"))


# -- q52: MinHash + LSH near-dup pairs -------------------------------------------

def gen_q52(doc_ids, texts, num_hashes=64, bands=16, k=3, threshold=0.12):
    rows_per_band = num_hashes // bands
    a_mul = np.array([((2 * i + 1) * 0x9E3779B9) & 0x7FFFFFFF | 1
                      for i in range(num_hashes)], dtype=np.uint64)
    b_add = np.array([(i * 0x27D4EB4F) & 0x7FFFFFFF for i in range(num_hashes)],
                     dtype=np.uint64)

    hsets: dict[int, frozenset[int]] = {}
    sigs: dict[int, np.ndarray] = {}
    buckets: dict[int, set[int]] = {}  # bucket value -> doc ids
    for did, text in zip(doc_ids, texts):
        toks = _tokens_collapsed(text)
        if len(toks) >= k:
            shs = {" ".join(toks[j : j + k]) for j in range(len(toks) - k + 1)}
        else:
            shs = {" ".join(toks)}
        hs = frozenset(xxh64_bytes(s.encode(), 42) & 0xFFFFFFFF for s in shs)
        hsets[did] = hs
        harr = np.fromiter(hs, dtype=np.uint64)
        # (h*a + b) mod 2^32, columnwise min — the universal-hash permutation
        perm = (harr[:, None] * a_mul[None, :] + b_add[None, :]) & np.uint64(0xFFFFFFFF)
        sig = perm.min(axis=0)
        sigs[did] = sig
        for b in range(bands):
            band = sig[b * rows_per_band : (b + 1) * rows_per_band]
            key = spark_xxhash64(",".join(str(int(v)) for v in band), b)
            buckets.setdefault(key, set()).add(did)

    cand: set[tuple[int, int]] = set()
    for ids in buckets.values():
        ordered = sorted(ids)
        for i, x in enumerate(ordered):
            for y in ordered[i + 1 :]:
                cand.add((x, y))

    out = []
    for ia, ib in sorted(cand):
        inter = len(hsets[ia] & hsets[ib])
        na, nb = len(hsets[ia]), len(hsets[ib])
        jacc = spark_round(inter / (na + nb - inter), 6)
        if jacc >= threshold:
            est = spark_round(int((sigs[ia] == sigs[ib]).sum()) / num_hashes, 6)
            out.append((ia, ib, est, jacc))
    return pa.table({
        "id_a": pa.array([r[0] for r in out], pa.int64()),
        "id_b": pa.array([r[1] for r in out], pa.int64()),
        "est_jaccard": pa.array([r[2] for r in out], pa.float64()),
        "jaccard": pa.array([r[3] for r in out], pa.float64()),
    })


# -- q53: SimHash near-dup pairs --------------------------------------------------

def gen_q53(doc_ids, texts, max_hamming=3):
    sigs: dict[int, int] = {}
    for did, text in zip(doc_ids, texts):
        toks = _tokens_ws(text)
        n = len(toks)
        counts = [0] * 64
        for t in toks:
            h = xxh64_bytes(t.encode(), 42)
            for b in range(64):
                counts[b] += (h >> b) & 1
        sig = 0
        for b in range(64):
            if counts[b] * 2 > n:
                sig |= 1 << b
        sigs[did] = sig

    # banding: any pair with hamming <= 3 shares one of the 4 16-bit bands
    # (pigeonhole), but stay faithful: candidates come from band collisions
    buckets: dict[tuple[int, int], set[int]] = {}
    for did, sig in sigs.items():
        for band in range(4):
            buckets.setdefault((band, (sig >> (band * 16)) & 0xFFFF), set()).add(did)
    cand: set[tuple[int, int]] = set()
    for ids in buckets.values():
        ordered = sorted(ids)
        for i, x in enumerate(ordered):
            for y in ordered[i + 1 :]:
                cand.add((x, y))
    out = []
    for ia, ib in sorted(cand):
        ham = bin(sigs[ia] ^ sigs[ib]).count("1")
        if ham <= max_hamming:
            out.append((ia, ib, ham))
    return pa.table({
        "id_a": pa.array([r[0] for r in out], pa.int64()),
        "id_b": pa.array([r[1] for r in out], pa.int64()),
        "hamming": pa.array([r[2] for r in out], pa.int32()),
    })


# -- hyperplane LSH machinery (q55) ------------------------------------------------

def plane_coeffs(dim: int, n_planes: int, seed: int) -> np.ndarray:
    """blake2b-derived deterministic planes in [-1, 1] — the published spec of
    operators/similarity._plane_coeffs, re-evaluated here."""
    import hashlib

    out = np.empty((n_planes, dim), dtype=np.float64)
    for p in range(n_planes):
        for i in range(dim):
            h = int.from_bytes(
                hashlib.blake2b(f"{seed}:{p}:{i}".encode(), digest_size=8).digest(),
                "big",
            )
            out[p, i] = (h % 2_000_001 - 1_000_000) / 1_000_000.0
    return out


def _signatures(vecs: np.ndarray, dim: int, n_planes: int, seeds: list[int]) -> np.ndarray:
    planes = np.stack([plane_coeffs(dim, n_planes, s) for s in seeds])  # (T,P,D)
    flat = planes.reshape(-1, dim).T  # (D, T*P)
    pows = (2 ** np.arange(n_planes)).astype("int64")
    bits = (vecs @ flat) >= 0
    return (bits.reshape(len(vecs), len(seeds), n_planes) * pows).sum(axis=2)  # (n,T)


def _topk_table(per_query: dict[int, list[tuple[int, object]]], k: int) -> pa.Table:
    """Rank candidates (qid -> [(vec_id, vec)]) by rounded cosine desc, id asc."""
    rows = []
    for qid, items in per_query.items():
        scored = [(vid, spark_round(cos_sim(vec, items_q), 6))
                  for vid, vec, items_q in items]
        scored.sort(key=lambda t: (-t[1], t[0]))
        for rank, (vid, sim) in enumerate(scored[:k], start=1):
            rows.append((qid, vid, sim, rank))
    rows.sort()
    return pa.table({
        "query_id": pa.array([r[0] for r in rows], pa.int64()),
        "vec_id": pa.array([r[1] for r in rows], pa.int64()),
        "sim": pa.array([r[2] for r in rows], pa.float64()),
        "rank": pa.array([r[3] for r in rows], pa.int32()),
    })


def gen_q55(vec_ids, vecs: np.ndarray, raw_vecs, dim=64, k=5, n_planes=4, n_tables=20):
    qmask = vec_ids % 100 == 0
    qids = vec_ids[qmask]
    csigs = _signatures(vecs, dim, n_planes, list(range(n_tables)))
    qsigs = csigs[qmask]
    per_query: dict[int, list] = {int(q): [] for q in qids}
    seen: dict[int, set[int]] = {int(q): set() for q in qids}
    for qi, qid in enumerate(qids):
        for ci, cid in enumerate(vec_ids):
            if any(csigs[ci, t] == qsigs[qi, t] for t in range(n_tables)):
                if cid not in seen[int(qid)]:
                    seen[int(qid)].add(int(cid))
                    per_query[int(qid)].append(
                        (int(cid), raw_vecs[ci], raw_vecs[np.where(vec_ids == qid)[0][0]])
                    )
    return _topk_table(per_query, k)


# -- q75: streaming MinHash-LSH near-dup keep set ---------------------------------

def gen_q75(doc_ids, texts, num_hashes=64, bands=16, k=3):
    """Greedy band-claim keep set per streaming/neardup_stream's pinned spec:
    docs in (ts, id) order (ts is synthesized FROM doc_id in the gate query,
    so id order); a doc is collided iff any of its band buckets was claimed
    earlier; every doc claims all its buckets (transitive suppression);
    kept = never-collided docs."""
    rows_per_band = num_hashes // bands
    a_mul = np.array([((2 * i + 1) * 0x9E3779B9) & 0x7FFFFFFF | 1
                      for i in range(num_hashes)], dtype=np.uint64)
    b_add = np.array([(i * 0x27D4EB4F) & 0x7FFFFFFF for i in range(num_hashes)],
                     dtype=np.uint64)

    claimed: set[int] = set()
    kept = []
    for did in sorted(int(d) for d in doc_ids):
        text = texts[list(doc_ids).index(did)]
        toks = _tokens_collapsed(text)
        if len(toks) >= k:
            shs = {" ".join(toks[j: j + k]) for j in range(len(toks) - k + 1)}
        else:
            shs = {" ".join(toks)}
        hs = frozenset(xxh64_bytes(s.encode(), 42) & 0xFFFFFFFF for s in shs)
        harr = np.fromiter(hs, dtype=np.uint64)
        perm = (harr[:, None] * a_mul[None, :] + b_add[None, :]) & np.uint64(0xFFFFFFFF)
        sig = perm.min(axis=0)
        keys = []
        for b in range(bands):
            band = sig[b * rows_per_band: (b + 1) * rows_per_band]
            keys.append(spark_xxhash64(
                ",".join(str(int(v)) for v in band), b))
        collided = any(kk in claimed for kk in keys)
        claimed.update(keys)
        if not collided:
            kept.append(did)
    return pa.table({"doc_id": pa.array(sorted(kept), pa.int64())})


# -- q57: IVF-flat ---------------------------------------------------------------

def ivf_cells(vec_ids, raw_vecs, n_centroids=16, iters=1):
    """Independent reimplementation of the pinned IVF coarse-training spec
    (shared by the q57/q79/q107 oracles): hash-sampled init, ``iters`` Lloyd
    rounds, cosine ties to the LOWER centroid id. Returns (cents dict,
    cells list aligned with vec_ids)."""
    n = len(vec_ids)
    # deterministic init: n_centroids ids with the smallest xxhash64(str(id)),
    # then centroid_id = rank of id ascending
    hashed = sorted(range(n), key=lambda i: spark_xxhash64(str(int(vec_ids[i]))))
    sample = sorted(hashed[:n_centroids], key=lambda i: vec_ids[i])
    # centroids keyed by ORIGINAL centroid_id: if a Lloyd round empties a
    # cell the surviving centroids keep their ids (no renumbering), matching
    # the Spark path's groupBy("centroid_id") — ADVICE r6 latent divergence.
    cents = {cidx: [float(x) for x in raw_vecs[i]] for cidx, i in enumerate(sample)}

    def assign(cents):
        cells = []
        for i in range(n):
            best, best_sim = -1, -math.inf
            for cidx in sorted(cents):
                s = cos_sim(raw_vecs[i], cents[cidx])
                if s > best_sim:  # strict: cosine ties go to the LOWER id
                    best, best_sim = cidx, s
            cells.append(best)
        return cells

    dim = len(raw_vecs[0])
    for _ in range(iters):
        cells = assign(cents)
        sums: dict[int, list] = {}
        cnts: dict[int, int] = {}
        for i, c in enumerate(cells):
            if c not in sums:
                sums[c] = [0.0] * dim
                cnts[c] = 0
            cnts[c] += 1
            for p, x in enumerate(raw_vecs[i]):
                sums[c][p] += float(x)
        cents = {c: [s / cnts[c] for s in sums[c]] for c in sums}
    return cents, assign(cents)


def gen_q57(vec_ids, raw_vecs, k=5, n_centroids=16, n_probe=8, iters=1):
    n = len(vec_ids)
    cents, cells = ivf_cells(vec_ids, raw_vecs, n_centroids, iters)

    qmask = vec_ids % 100 == 0
    per_query: dict[int, list] = {}
    for qi in np.where(qmask)[0]:
        qid = int(vec_ids[qi])
        scored = sorted(
            ((cos_sim(raw_vecs[qi], cents[cidx]), cidx) for cidx in sorted(cents)),
            key=lambda t: (-t[0], t[1]),
        )
        probe = {cidx for _, cidx in scored[:n_probe]}
        per_query[qid] = [
            (int(vec_ids[ci]), raw_vecs[ci], raw_vecs[qi])
            for ci in range(n) if cells[ci] in probe
        ]
    return _topk_table(per_query, k)


def gen_q74(vec_ids, raw_vecs, k=5, n_centroids=16, n_probe=8, m_sub=8,
            n_codes=64, iters=1):
    """IVF-PQ per operators/similarity.ivfpq_topk's pinned determinism spec:
    gen_q57's coarse trainer + product-quantization codebooks (squared-L2
    assignment, ties to the lower code id, per-(sub,code) means keeping
    original code ids) and ADC cosine against the reconstruction."""
    n = len(vec_ids)
    dim = len(raw_vecs[0])
    ds = dim // m_sub

    def seq_dot(a, b) -> float:
        d = 0.0
        for x, y in zip(a, b):
            d = d + float(x) * float(y)
        return d

    # ---- coarse cells: exactly gen_q57 (original-id-keyed, ties to lower id) ----
    hashed = sorted(range(n), key=lambda i: spark_xxhash64(str(int(vec_ids[i]))))
    sample = sorted(hashed[:n_centroids], key=lambda i: vec_ids[i])
    cents = {cidx: [float(x) for x in raw_vecs[i]] for cidx, i in enumerate(sample)}

    def coarse_assign(cents):
        cells = []
        for i in range(n):
            best, best_sim = -1, -math.inf
            for cidx in sorted(cents):
                s = cos_sim(raw_vecs[i], cents[cidx])
                if s > best_sim:  # strict: cosine ties go to the LOWER id
                    best, best_sim = cidx, s
            cells.append(best)
        return cells

    for _ in range(iters):
        cells = coarse_assign(cents)
        sums = {}
        cnts = {}
        for i, c in enumerate(cells):
            if c not in sums:
                sums[c] = [0.0] * dim
                cnts[c] = 0
            cnts[c] += 1
            for p, x in enumerate(raw_vecs[i]):
                sums[c][p] += float(x)
        cents = {c: [s / cnts[c] for s in sums[c]] for c in sums}
    cells = coarse_assign(cents)

    # ---- PQ codebooks ----
    sampc = sorted(hashed[:n_codes], key=lambda i: vec_ids[i])
    cb = {j: {ci: [float(x) for x in raw_vecs[rowi][j * ds:(j + 1) * ds]]
              for ci, rowi in enumerate(sampc)} for j in range(m_sub)}

    def pq_assign(cb):
        codes = []
        for i in range(n):
            row = []
            for j in range(m_sub):
                sv = raw_vecs[i][j * ds:(j + 1) * ds]
                svv = seq_dot(sv, sv)
                best = None
                for code in sorted(cb[j]):
                    c_ = cb[j][code]
                    d2 = svv - 2 * seq_dot(sv, c_) + seq_dot(c_, c_)
                    if best is None or d2 < best[0]:
                        best = (d2, code)
                row.append(best[1])
            codes.append(row)
        return codes

    for _ in range(iters):
        codes = pq_assign(cb)
        newcb = {}
        for j in range(m_sub):
            sums = {}
            cnts = {}
            for i in range(n):
                code = codes[i][j]
                sv = raw_vecs[i][j * ds:(j + 1) * ds]
                if code not in sums:
                    sums[code] = [0.0] * ds
                    cnts[code] = 0
                cnts[code] += 1
                for p, x in enumerate(sv):
                    sums[code][p] += float(x)
            newcb[j] = {code: [s / cnts[code] for s in sums[code]]
                        for code in sums}
        cb = newcb
    codes = pq_assign(cb)
    cbn2 = {j: {code: seq_dot(v, v) for code, v in cb[j].items()}
            for j in range(m_sub)}

    # ---- search: probes + ADC ----
    qmask = vec_ids % 100 == 0
    rows = []
    for qi in np.where(qmask)[0]:
        qid = int(vec_ids[qi])
        qv = raw_vecs[qi]
        qn = math.sqrt(seq_dot(qv, qv))
        scoredc = sorted(
            ((cos_sim(qv, cents[cidx]), cidx) for cidx in sorted(cents)),
            key=lambda t: (-t[0], t[1]))
        probe = {cidx for _, cidx in scoredc[:n_probe]}
        out = []
        for ci in range(n):
            if cells[ci] not in probe:
                continue
            sdot = 0.0
            sn2 = 0.0
            for j in range(m_sub):
                code = codes[ci][j]
                sdot = sdot + seq_dot(qv[j * ds:(j + 1) * ds], cb[j][code])
                sn2 = sn2 + cbn2[j][code]
            out.append((int(vec_ids[ci]),
                        spark_round(sdot / (qn * math.sqrt(sn2)), 6)))
        out.sort(key=lambda t: (-t[1], t[0]))
        for rank, (vid, s) in enumerate(out[:k], start=1):
            rows.append((qid, vid, s, rank))
    rows.sort()
    return pa.table({
        "query_id": pa.array([r[0] for r in rows], pa.int64()),
        "vec_id": pa.array([r[1] for r in rows], pa.int64()),
        "sim": pa.array([r[2] for r in rows], pa.float64()),
        "rank": pa.array([r[3] for r in rows], pa.int32()),
    })


def gen_q107(vec_ids, raw_vecs, per_cell=8, n_centroids=16, iters=1,
             seed="cbs"):
    """Cluster-balanced sampling oracle: same pinned IVF spec as q57/q79,
    then per-cell selection by (xxhash64(seed:id), id) capped at per_cell —
    independent of the Spark operator's Window implementation."""
    cents, cells = ivf_cells(vec_ids, raw_vecs, n_centroids, iters)
    by_cell: dict[int, list] = {}
    for i, c in enumerate(cells):
        by_cell.setdefault(c, []).append(int(vec_ids[i]))
    out_id, out_cell, out_rank = [], [], []
    for c in sorted(by_cell):
        ordered = sorted(by_cell[c],
                         key=lambda v: (spark_xxhash64(f"{seed}:{v}"), v))
        for r, v in enumerate(ordered[:per_cell], start=1):
            out_id.append(v)
            out_cell.append(c)
            out_rank.append(r)
    return pa.table({
        "vec_id": pa.array(out_id, pa.int64()),
        "cell": pa.array(out_cell, pa.int32()),
        "rank": pa.array(out_rank, pa.int32()),
    })


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    docs = _read("documents")
    doc_ids = docs.column("doc_id").to_pylist()
    texts = docs.column("text").to_pylist()

    t52 = gen_q52(doc_ids, texts)
    pq.write_table(t52, os.path.join(OUT_DIR, "oracle_q52_sf001.parquet"))
    print(f"q52: {t52.num_rows} rows")

    t53 = gen_q53(doc_ids, texts)
    pq.write_table(t53, os.path.join(OUT_DIR, "oracle_q53_sf001.parquet"))
    print(f"q53: {t53.num_rows} rows")

    t75 = gen_q75(doc_ids, texts)
    pq.write_table(t75, os.path.join(OUT_DIR, "oracle_q75_sf001.parquet"))
    print(f"q75: {t75.num_rows} rows")

    emb = _read("embeddings")
    vec_ids = np.array(emb.column("vec_id").to_pylist(), dtype=np.int64)
    raw_vecs = [np.array(v, dtype=np.float32) for v in emb.column("embedding").to_pylist()]
    vecs = np.stack([v.astype(np.float64) for v in raw_vecs])

    t55 = gen_q55(vec_ids, vecs, raw_vecs)
    pq.write_table(t55, os.path.join(OUT_DIR, "oracle_q55_sf001.parquet"))
    print(f"q55: {t55.num_rows} rows")

    t57 = gen_q57(vec_ids, raw_vecs)
    pq.write_table(t57, os.path.join(OUT_DIR, "oracle_q57_sf001.parquet"))
    print(f"q57: {t57.num_rows} rows")

    t74 = gen_q74(vec_ids, raw_vecs)
    pq.write_table(t74, os.path.join(OUT_DIR, "oracle_q74_sf001.parquet"))
    print(f"q74: {t74.num_rows} rows")

    t58 = gen_q58(vec_ids, raw_vecs)
    pq.write_table(t58, os.path.join(OUT_DIR, "oracle_q58_sf001.parquet"))
    print(f"q58: {t58.num_rows} rows")

    t79 = gen_q79(vec_ids, raw_vecs)
    pq.write_table(t79, os.path.join(OUT_DIR, "oracle_q79_sf001.parquet"))
    print(f"q79: {t79.num_rows} rows")

    t107 = gen_q107(vec_ids, raw_vecs)
    pq.write_table(t107, os.path.join(OUT_DIR, "oracle_q107_sf001.parquet"))
    print(f"q107: {t107.num_rows} rows")

    t84 = gen_q84()
    pq.write_table(t84, os.path.join(OUT_DIR, "oracle_q84_sf001.parquet"))
    print(f"q84: {t84.num_rows} rows")




# -- q58: HNSW (independent reimplementation of operators/hnsw.py's pinned
# determinism spec: heapq/dict style vs the operator's list/ndarray style) --

def _hnsw_level(node_id: int, m: int) -> int:
    import hashlib

    h = int.from_bytes(
        hashlib.blake2b(f"hnsw:{node_id}".encode(), digest_size=8).digest(),
        "big")
    return int(-math.log((h + 1) / 2.0 ** 64) / math.log(m))


def _hnsw_build_and_search(ids, vecs64, queries, k, m, efc, efs):
    """ids ascending; vecs64 list of float64 ndarrays; queries [(qid, qv)]."""
    n = len(ids)
    norms = [float(np.sqrt(np.dot(v, v))) for v in vecs64]
    levels = [_hnsw_level(int(i), m) for i in ids]
    layers = [dict() for _ in range(max(levels, default=0) + 1)]

    def sim_fn(vec, vnorm):
        def s(node):
            return float(np.dot(vecs64[node], vec)) / (norms[node] * vnorm)
        return s

    def greedy(layer, ep, s):
        cur, cs = ep, s(ep)
        moved = True
        while moved:
            moved = False
            for nb in sorted(layers[layer].get(cur, [])):
                v = s(nb)
                if v > cs:
                    cur, cs, moved = nb, v, True
        return cur

    def search_layer(layer, ep, ef, s):
        import heapq

        start = (s(ep), ep)
        visited = {ep}
        frontier = [(-start[0], start[1])]
        best = [start]
        while frontier:
            negs, c = heapq.heappop(frontier)
            worst = min(best, key=lambda t: (t[0], -t[1]))
            if len(best) >= ef and -negs < worst[0]:
                break
            for nb in sorted(layers[layer].get(c, [])):
                if nb in visited:
                    continue
                visited.add(nb)
                v = s(nb)
                worst = min(best, key=lambda t: (t[0], -t[1]))
                if len(best) < ef or v > worst[0]:
                    best.append((v, nb))
                    heapq.heappush(frontier, (-v, nb))
                    if len(best) > ef:
                        best.remove(min(best, key=lambda t: (t[0], -t[1])))
        return sorted(best, key=lambda t: (-t[0], t[1]))

    entry = -1
    for i in range(n):
        lvl = levels[i]
        for l in range(min(lvl, len(layers) - 1) + 1):
            layers[l].setdefault(i, [])
        if entry < 0:
            entry = i
            continue
        s = sim_fn(vecs64[i], norms[i])
        ep = entry
        for l in range(levels[entry], lvl, -1):
            ep = greedy(l, ep, s)
        for l in range(min(levels[entry], lvl), -1, -1):
            cand = search_layer(l, ep, efc, s)
            mmax = 2 * m if l == 0 else m
            nbrs = [c for _, c in cand[:m]]
            layers[l][i] = list(nbrs)
            for nb in nbrs:
                lst = layers[l][nb]
                lst.append(i)
                if len(lst) > mmax:
                    lst.sort(key=lambda x: (
                        -(float(np.dot(vecs64[nb], vecs64[x]))
                          / (norms[nb] * norms[x])), ids[x]))
                    del lst[mmax:]
            if cand:
                ep = cand[0][1]
        if lvl > levels[entry]:
            entry = i

    out = []
    for qid, qv in queries:
        qn = float(np.sqrt(np.dot(qv, qv)))
        s = sim_fn(qv, qn)
        ep = entry
        for l in range(levels[entry], 0, -1):
            ep = greedy(l, ep, s)
        for v, node in search_layer(0, ep, efs, s)[:k]:
            out.append((qid, int(ids[node]), spark_round(v, 6)))
    return out


def gen_q58(vec_ids, raw_vecs, k=5, m=8, efc=64, efs=48, n_indexes=4):
    vecs64 = [v.astype(np.float64) for v in raw_vecs]
    queries = [(int(vec_ids[i]), vecs64[i])
               for i in range(len(vec_ids)) if vec_ids[i] % 100 == 0]
    cands: dict[int, list] = {q: [] for q, _ in queries}
    for g in range(n_indexes):
        idx = [i for i in range(len(vec_ids)) if vec_ids[i] % n_indexes == g]
        idx.sort(key=lambda i: vec_ids[i])
        gids = [int(vec_ids[i]) for i in idx]
        gvecs = [vecs64[i] for i in idx]
        for qid, vid, s in _hnsw_build_and_search(
                gids, gvecs, queries, k, m, efc, efs):
            cands[qid].append((vid, s))
    rows = []
    for qid, items in cands.items():
        items.sort(key=lambda t: (-t[1], t[0]))
        for rank, (vid, s) in enumerate(items[:k], start=1):
            rows.append((qid, vid, s, rank))
    rows.sort()
    return pa.table({
        "query_id": pa.array([r[0] for r in rows], pa.int64()),
        "vec_id": pa.array([r[1] for r in rows], pa.int64()),
        "sim": pa.array([r[2] for r in rows], pa.float64()),
        "rank": pa.array([r[3] for r in rows], pa.int32()),
    })




# -- q84: geohash + trajectory (independent geohash + path derivation) ------------

_B32_GH = "0123456789bcdefghjkmnpqrstuvwxyz"


def _geohash(lat: float, lon: float, precision: int) -> str:
    """Standard geohash base32 interleaved bisection (public algorithm),
    written independently of functions/geo._geohash_py."""
    lo = [-90.0, -180.0]
    hi = [90.0, 180.0]
    val = (lat, lon)
    bits = []
    axis = 1  # longitude first
    while len(bits) < precision * 5:
        mid = (lo[axis] + hi[axis]) / 2
        if val[axis] >= mid:
            bits.append(1)
            lo[axis] = mid
        else:
            bits.append(0)
            hi[axis] = mid
        axis ^= 1
    out = []
    for i in range(precision):
        chunk = bits[i * 5 : i * 5 + 5]
        out.append(_B32_GH[int("".join(map(str, chunk)), 2)])
    return "".join(out)


def gen_q84():
    ev = _read("events")
    user = ev.column("user_id").to_pylist()
    ts = ev.column("ts").to_pylist()
    value = ev.column("value").to_pylist()
    pts: dict[int, list] = {}
    for u, t, v in zip(user, ts, value):
        if u % 25 != 0:
            continue
        lat = float(u % 180 - 90) * 0.9
        lng = math.fmod(v * 36, 360.0) - 180.0
        pts.setdefault(int(u), []).append((t, lat, lng))
    rows = []
    for u, items in sorted(pts.items()):
        items.sort()  # (ts, lat, lng) — geo_path's struct sort order
        min_gh = min(_geohash(la, ln, 6) for _, la, ln in items)
        rows.append((u, len(items), min_gh,
                     spark_round(items[0][2], 6), spark_round(items[-1][1], 6)))
    return pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "n_points": pa.array([r[1] for r in rows], pa.int64()),
        "min_gh": pa.array([r[2] for r in rows], pa.string()),
        "first_lng": pa.array([r[3] for r in rows], pa.float64()),
        "last_lat": pa.array([r[4] for r in rows], pa.float64()),
    })




# -- q79: SemDeDup (independent reimplementation of operators/similarity.py
# semdedup's pinned spec: gen_q57's coarse trainer + "drop any vector with a
# lower-id same-cell member at cosine >= eps", unrounded float64 compare) --

def gen_q79(vec_ids, raw_vecs, eps=0.4, n_centroids=16, iters=1):
    n = len(vec_ids)
    hashed = sorted(range(n), key=lambda i: spark_xxhash64(str(int(vec_ids[i]))))
    sample = sorted(hashed[:n_centroids], key=lambda i: vec_ids[i])
    cents = {cidx: [float(x) for x in raw_vecs[i]] for cidx, i in enumerate(sample)}

    def assign(cents):
        cells = []
        for i in range(n):
            best, best_sim = -1, -math.inf
            for cidx in sorted(cents):
                s = cos_sim(raw_vecs[i], cents[cidx])
                if s > best_sim:  # strict: cosine ties go to the LOWER id
                    best, best_sim = cidx, s
            cells.append(best)
        return cells

    dim = len(raw_vecs[0])
    for _ in range(iters):
        cells = assign(cents)
        sums: dict[int, list] = {}
        cnts: dict[int, int] = {}
        for i, c in enumerate(cells):
            if c not in sums:
                sums[c] = [0.0] * dim
                cnts[c] = 0
            cnts[c] += 1
            for p, x in enumerate(raw_vecs[i]):
                sums[c][p] += float(x)
        cents = {c: [s / cnts[c] for s in sums[c]] for c in sums}
    cells = assign(cents)

    by_cell: dict[int, list[int]] = {}
    for i, c in enumerate(cells):
        by_cell.setdefault(c, []).append(i)
    keep_ids, keep_cells = [], []
    for c, members in sorted(by_cell.items()):
        members = sorted(members, key=lambda i: vec_ids[i])
        for pos, i in enumerate(members):
            dup = any(
                cos_sim(raw_vecs[j], raw_vecs[i]) >= eps
                for j in members[:pos]
            )
            if not dup:
                keep_ids.append(int(vec_ids[i]))
                keep_cells.append(int(c))
    order = np.argsort(keep_ids)
    return pa.table({
        "vec_id": pa.array(np.array(keep_ids)[order], type=pa.int64()),
        "cell": pa.array(np.array(keep_cells)[order], type=pa.int32()),
    })

if __name__ == "__main__":
    main()
