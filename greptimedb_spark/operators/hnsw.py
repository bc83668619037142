"""HNSW approximate-nearest-neighbor search, Spark-first.

The reference attaches a usearch HNSW index to every SST and merges per-SST
results at query time (src/index/src/vector.rs:38, RFC
docs/rfcs/2025-12-05-vector-index.md). The Spark mapping is the same shape:

- the corpus is split into deterministic groups (``vec_id % n_indexes`` —
  the stand-in for SST membership);
- ``applyInPandas`` builds one in-memory HNSW graph per group and searches
  the broadcast query set against it (per-SST index + search);
- a global ``row_number`` top-k over the per-group candidates merges the
  results (the reference's multi-SST merge).

At 100 TB the per-group build is the one-time index build (the graph would
be serialized next to the data file); per-query cost is
n_indexes × ef_search node visits instead of a corpus scan, and only
(query × candidate) rows ever shuffle.

DETERMINISM SPEC (pinned so tests/fixtures can reimplement it
independently — tools/gen_oracle_fixtures.py gen_q58):
- insertion order: ascending vec_id within the group;
- node level: floor(-ln(u) / ln(M)) with u = (blake2b64("hnsw:<id>")+1)/2^64;
- similarity: cosine on float64 (np.dot + np.sqrt);
- all orderings tie-break by vec_id ascending after similarity descending;
- neighbor lists keep the top-M by (sim desc, id asc) — no diversity
  heuristic; layer 0 keeps 2*M;
- search: classic best-first with ef candidates; a candidate worse than the
  current ef-th best stops the loop; final top-k by (sim desc, id asc).
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _level(node_id: int, m: int) -> int:
    h = int.from_bytes(
        hashlib.blake2b(f"hnsw:{node_id}".encode(), digest_size=8).digest(),
        "big")
    u = (h + 1) / 2.0 ** 64
    return int(-math.log(u) / math.log(m))


def build_hnsw(ids, vecs, m: int = 8, ef_construction: int = 64):
    """Build the graph per the determinism spec. ``vecs`` is a float64
    (n, dim) ndarray aligned with ``ids`` (ascending). Returns
    (levels, graph, entry) with graph[layer][node_index] = [neighbor
    indexes]."""
    import numpy as np

    n = len(ids)
    norms = [float(np.sqrt(np.dot(vecs[i], vecs[i]))) for i in range(n)]

    def sim(a: int, b: int) -> float:
        return float(np.dot(vecs[a], vecs[b])) / (norms[a] * norms[b])

    levels = [_level(int(ids[i]), m) for i in range(n)]
    graph: list[dict[int, list[int]]] = [
        {} for _ in range(max(levels, default=0) + 1)
    ]
    entry = -1
    for i in range(n):  # ids ascending == index ascending
        lvl = levels[i]
        for l in range(min(lvl, len(graph) - 1) + 1):
            graph[l].setdefault(i, [])
        if entry < 0:
            entry = i
            continue
        ep = entry
        top = levels[entry]
        # greedy descend above the node's level
        for l in range(top, lvl, -1):
            ep = _greedy(graph, l, ep, i, sim)
        for l in range(min(top, lvl), -1, -1):
            cand = _search_layer(graph, l, ep, i, ef_construction, sim)
            mmax = 2 * m if l == 0 else m
            nbrs = [c for _, c in cand[:m]]
            graph[l][i] = list(nbrs)
            for nb in nbrs:
                lst = graph[l][nb]
                lst.append(i)
                if len(lst) > mmax:
                    lst.sort(key=lambda x: (-sim(nb, x), ids[x]))
                    del lst[mmax:]
            if cand:
                ep = cand[0][1]
        if lvl > levels[entry]:
            entry = i
    return levels, graph, entry


def _greedy(graph, layer, ep, q, sim):
    cur, cur_sim = ep, sim(ep, q)
    improved = True
    while improved:
        improved = False
        for nb in sorted(graph[layer].get(cur, [])):
            s = sim(nb, q)
            if s > cur_sim:
                cur, cur_sim, improved = nb, s, True
    return cur


def _search_layer(graph, layer, ep, q, ef, sim):
    """Best-first search; returns [(sim, node)] sorted by (sim desc, node
    asc), at most ef entries. ``q`` may be a node index or handled inside
    ``sim``.

    r12: heap-based frontier/result sets replacing list sort-per-pop and
    min()-scan-per-neighbor (the r12 cProfile of one 1,200-node build:
    637 k ``min(best, ...)`` calls = 16 s of 22 s, plus 2.9 s of frontier
    sorts — the dot products were 1.4 s). Selection order is IDENTICAL by
    construction, so the pinned determinism spec is untouched:
    - frontier pop: heap keyed (-sim, node) pops max sim, tie lowest node —
      exactly the old ``sort(key=(-sim, node)); pop(0)``;
    - result "worst": heap keyed (sim, -node) exposes min sim, tie highest
      node at [0] — exactly the old ``min(best, key=(sim, -node))``;
    - eviction pops that same element, as ``best.remove(worst)`` did.
    No float arithmetic changes (same sim() per pair)."""
    import heapq

    s0 = sim(ep, q)
    visited = {ep}
    cand = [(-s0, ep)]       # explore frontier: max sim first, tie low node
    best = [(s0, -ep)]       # current ef best: worst (min sim, high node) at [0]
    while cand:
        neg_c_sim, c = heapq.heappop(cand)
        if len(best) >= ef and -neg_c_sim < best[0][0]:
            break
        for nb in sorted(graph[layer].get(c, [])):
            if nb in visited:
                continue
            visited.add(nb)
            s = sim(nb, q)
            if len(best) < ef or s > best[0][0]:
                heapq.heappush(best, (s, -nb))
                heapq.heappush(cand, (-s, nb))
                if len(best) > ef:
                    heapq.heappop(best)
    out = [(s, -negn) for s, negn in best]
    out.sort(key=lambda t: (-t[0], t[1]))
    return out


def search_hnsw(ids, vecs, levels, graph, entry, qvec,
                k: int, ef_search: int = 32):
    """Top-k (id, sim) for one query vector against a built graph."""
    import numpy as np

    if entry < 0:
        return []
    qn = float(np.sqrt(np.dot(qvec, qvec)))
    norms_cache: dict[int, float] = {}

    def nsim(a: int, _q=None) -> float:
        na = norms_cache.get(a)
        if na is None:
            na = float(np.sqrt(np.dot(vecs[a], vecs[a])))
            norms_cache[a] = na
        return float(np.dot(vecs[a], qvec)) / (na * qn)

    ep = entry
    for l in range(levels[entry], 0, -1):
        ep = _greedy(graph, l, ep, None, nsim)
    best = _search_layer(graph, 0, ep, None, ef_search, nsim)
    return [(int(ids[i]), s) for s, i in best[:k]]


def _collect_queries(queries: DataFrame, query_id_col: str,
                     query_vec_col: str):
    """Fetch the query batch to the driver and return a SparkContext
    broadcast of [(qid, float64 vector)].

    BOUND: the query set must fit in driver memory — this is the reference's
    search-time shape (a bounded batch of query vectors probed against every
    per-SST index), not a table-scale relation. For query sets past ~10^5
    rows, run brute_force/ivf variants or batch the queries outside."""
    import numpy as np

    rows = [(int(r[0]), np.asarray(r[1], dtype=np.float64))
            for r in queries.select(query_id_col, query_vec_col).collect()]
    return queries.sparkSession.sparkContext.broadcast(rows)


def build_hnsw_index(
    corpus: DataFrame,
    index_path: str,
    m: int = 8,
    ef_construction: int = 64,
    n_indexes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Build and PERSIST the per-group HNSW graphs (the reference stores the
    usearch index beside each SST and reuses it across queries —
    docs/rfcs/2025-12-05-vector-index.md). One parquet row per group, all
    DATA-ONLY columns (ids/levels/flattened vectors as parquet arrays, the
    adjacency lists as JSON) — loading an index never executes code, unlike
    pickle, so an untrusted/tampered index file can corrupt results but not
    the process (ADVICE r6). ``hnsw_topk(..., index_path=...)`` then
    searches without rebuilding."""
    import json

    import numpy as np
    import pandas as pd

    def build_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        ids = pdf[id_col].to_numpy()
        vecs = np.stack([np.asarray(v, dtype=np.float64)
                         for v in pdf[vec_col]])
        levels, graph, entry = build_hnsw(ids, vecs, m, ef_construction)
        return pd.DataFrame({
            "group": [int(pdf["__idx"].iloc[0])],
            "entry": [int(entry)],
            "dim": [int(vecs.shape[1])],
            "ids": [[int(x) for x in ids]],
            "levels": [[int(x) for x in levels]],
            "vecs": [vecs.reshape(-1).tolist()],
            "graph": [json.dumps([{str(k): v for k, v in layer.items()}
                                  for layer in graph])],
        })

    (corpus.select(id_col, vec_col)
     .withColumn("__idx", F.pmod(F.col(id_col), F.lit(n_indexes)))
     .groupBy("__idx")
     .applyInPandas(
         build_group,
         "group int, entry int, dim int, ids array<long>, "
         "levels array<int>, vecs array<double>, graph string")
     .write.mode("overwrite").parquet(index_path))


def hnsw_topk(
    corpus: DataFrame | None,
    queries: DataFrame,
    k: int = 10,
    m: int = 8,
    ef_construction: int = 64,
    ef_search: int = 32,
    n_indexes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    index_path: str | None = None,
) -> DataFrame:
    """Approximate top-k per query: per-group HNSW graphs searched in
    parallel, candidates merged by a global rank. Returns
    (query_id, vec_id, sim, rank) like brute_force_topk; ``sim`` is rounded
    to 6 (HALF_UP) for cross-engine comparability.

    With ``index_path`` (written by :func:`build_hnsw_index`) the persisted
    graphs are loaded and searched — no rebuild; ``corpus`` may be None.
    Without it the graphs are built inline (one-shot usage). The query set
    rides a SparkContext broadcast; see _collect_queries for the bound."""
    import pandas as pd

    q_bc = _collect_queries(queries, query_id_col, query_vec_col)
    out_schema = f"{query_id_col} long, {id_col} long, sim double"

    def _search_built(ids, vecs, levels, graph, entry, rows):
        for qid, qv in q_bc.value:
            for vid, s in search_hnsw(ids, vecs, levels, graph, entry, qv,
                                      k, ef_search):
                rows.append((qid, vid, _round6(s)))

    if index_path is not None:
        import json

        import numpy as np

        spark = queries.sparkSession

        def per_blob(it):
            for pdf in it:
                rows: list = []
                for rec in pdf.itertuples(index=False):
                    ids = np.asarray(rec.ids, dtype=np.int64)
                    vecs = np.asarray(rec.vecs, dtype=np.float64).reshape(
                        len(ids), int(rec.dim))
                    graph = [{int(k): list(v) for k, v in layer.items()}
                             for layer in json.loads(rec.graph)]
                    _search_built(ids, vecs, list(rec.levels), graph,
                                  int(rec.entry), rows)
                yield pd.DataFrame(rows,
                                   columns=[query_id_col, id_col, "sim"])

        cand = (spark.read.parquet(index_path)
                .repartition("group")
                .mapInPandas(per_blob, out_schema))
    else:
        import numpy as np

        def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(id_col)
            ids = pdf[id_col].to_numpy()
            vecs = np.stack([np.asarray(v, dtype=np.float64)
                             for v in pdf[vec_col]])
            levels, graph, entry = build_hnsw(ids, vecs, m, ef_construction)
            rows: list = []
            _search_built(ids, vecs, levels, graph, entry, rows)
            return pd.DataFrame(rows, columns=[query_id_col, id_col, "sim"])

        grouped = corpus.select(id_col, vec_col).withColumn(
            "__idx", F.pmod(F.col(id_col), F.lit(n_indexes)))
        cand = grouped.groupBy("__idx").applyInPandas(per_group, out_schema)
    w = Window.partitionBy(query_id_col).orderBy(F.desc("sim"), F.asc(id_col))
    return cand.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k)


def _round6(x: float) -> float:
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(x)).quantize(Decimal("0.000001"),
                                           rounding=ROUND_HALF_UP))
