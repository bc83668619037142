"""Dedup + similarity operator semantics: recall against exact baselines."""

import pytest
from pyspark.sql import functions as F

from greptimedb_spark.operators import dedup as dd
from greptimedb_spark.operators import similarity as sim


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [
        (1, base),
        (2, base),  # exact dup of 1
        (3, base.replace("quick", "slow")),  # near dup of 1
        (4, "completely different content about spark sql aggregation engines"),
        (5, "  The   QUICK brown fox jumps over the lazy dog near the river bank today "),  # normalized dup
        (6, "unrelated text with nothing in common whatsoever here at all folks"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(docs):
    groups = dd.exact_duplicates(docs, "doc_id", "text").collect()
    assert len(groups) == 1
    g = groups[0]
    assert g.keep_id == 1 and g.n_dups == 3 and g.all_ids == [1, 2, 5]
    kept = dd.dedup_exact(docs, "doc_id", "text").select("doc_id").collect()
    assert sorted(r.doc_id for r in kept) == [1, 3, 4, 6]


def test_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("x y",)], "t string")
    out = df.select(dd.shingles("t", 3).alias("sh")).collect()
    assert out[0].sh == ["a b c", "b c d"]
    assert out[1].sh == ["x y"]  # shorter than k → whole text


def test_minhash_finds_near_dups(docs):
    pairs = dd.minhash_lsh_pairs(docs, "doc_id", "text", num_hashes=64, bands=32,
                                 jaccard_threshold=0.4)
    got = {(r.id_a, r.id_b): r for r in pairs.collect()}
    assert (1, 2) in got and got[(1, 2)].jaccard == 1.0
    assert (1, 5) in got and got[(1, 5)].jaccard == 1.0
    assert (1, 3) in got  # near dup: most 3-shingles shared
    assert all(p[1] != 4 and p[0] != 4 for p in got)  # unrelated doc never pairs
    # estimator within 0.35 of truth at 64 hashes
    for r in got.values():
        assert abs(r.est_jaccard - r.jaccard) < 0.35


def test_simhash_packed_agg_matches_per_bit_reference(docs):
    """r12: _simhash_agg packs two 32-bit bit-counters per long aggregate
    ((h >> b) & 0x100000001). Pin bit-identical signatures against the
    independent per-bit simhash64 column form on the same tokenization."""
    agg = {r["id"]: r["sig"] for r in dd._simhash_agg(docs, "doc_id", "text").collect()}
    ref = {
        r["doc_id"]: r["sig"]
        for r in docs.select("doc_id", dd.simhash64("text").alias("sig")).collect()
    }
    assert agg == ref
    # identical docs agree regardless of form; near dup is close
    assert agg[1] == agg[2] == agg[5]


def test_simhash_identical_and_near(docs):
    pairs = dd.simhash_pairs(docs, "doc_id", "text", max_hamming=10)
    got = {(r.id_a, r.id_b): r.hamming for r in pairs.collect()}
    assert got[(1, 2)] == 0
    assert got[(1, 5)] == 0
    assert got.get((1, 3), 99) <= 10
    assert (4, 6) not in got


def test_ngram_jaccard_blocked(spark):
    rows = [
        (1, "a", "one two three four five"),
        (2, "a", "one two three four six"),
        (3, "a", "nothing shared here at all"),
        (4, "b", "one two three four five"),  # same text, different block → no pair
    ]
    df = spark.createDataFrame(rows, "id long, blk string, t string")
    pairs = dd.ngram_jaccard_pairs(df, "id", "t", "blk", k=3, threshold=0.3)
    got = {(r.id_a, r.id_b): r.jaccard for r in pairs.collect()}
    assert set(got) == {(1, 2)}
    assert got[(1, 2)] == 0.5  # shingles: {o t t, t t f, t f f|s} → 2 shared / 4 union


def test_lsh_topk_recall(spark, sf_dir):
    from greptimedb_spark.queries import read

    e = read(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = sim.brute_force_topk(e, queries, k=5)
    # This synthetic corpus has weak neighbors (cos ≈ 0.4), so few planes +
    # many tables: P(hit) = 1-(1-(1-θ/π)^planes)^tables ≈ 0.97 at (4, 20).
    approx = sim.lsh_topk(e, queries, dim=64, k=5, n_planes=4, n_tables=20)
    ex = {(r.query_id, r.vec_id) for r in exact.collect()}
    ap = {(r.query_id, r.vec_id) for r in approx.collect()}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.8, f"LSH recall too low: {recall}"
    # self-match always survives (query vector is in the corpus)
    for q in {r.query_id for r in exact.collect()}:
        assert (q, q) in ap


def test_ivf_topk_exhaustive_equals_bruteforce(spark, sf_dir):
    """Probing every cell makes IVF exact — it must reproduce the
    brute-force top-k verbatim (same ranking tie-break)."""
    from greptimedb_spark.queries import read

    e = read(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = sim.brute_force_topk(e, queries, k=5)
    ivf = sim.ivf_topk(e, queries, k=5, n_centroids=8, n_probe=8, iters=1)
    ex = {(r.query_id, r.vec_id, r.rank) for r in exact.collect()}
    iv = {(r.query_id, r.vec_id, r.rank) for r in ivf.collect()}
    assert ex == iv


def test_ivf_topk_partial_probe_recall(spark, sf_dir):
    from greptimedb_spark.queries import read

    e = read(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = sim.brute_force_topk(e, queries, k=5)
    ivf = sim.ivf_topk(e, queries, k=5, n_centroids=16, n_probe=8, iters=1)
    ex = {(r.query_id, r.vec_id) for r in exact.collect()}
    iv = {(r.query_id, r.vec_id) for r in ivf.collect()}
    recall = len(ex & iv) / len(ex)
    assert recall >= 0.5, f"IVF recall too low: {recall}"
    # the query's own cell is always probed first, so self-match survives
    for q in {r.query_id for r in exact.collect()}:
        assert (q, q) in iv


def test_brute_force_topk_selfmatch(spark, sf_dir):
    from greptimedb_spark.queries import read

    e = read(spark, sf_dir, "embeddings")
    queries = e.limit(3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = sim.brute_force_topk(e, queries, k=1).collect()
    for r in out:
        assert r.query_id == r.vec_id and r.rank == 1 and abs(r.sim - 1.0) < 1e-5


def test_filtered_topk_equals_bruteforce_per_slice(spark, sf_dir):
    """Metadata-filtered ANN == brute force run on each label slice: the
    equi-join prune must not change scoring, only the candidate set."""
    from greptimedb_spark.queries import read

    e = read(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"), "label")
    got = sorted(
        (r.query_id, r.label, r.vec_id, r.rank, r.sim)
        for r in sim.filtered_topk(e, queries, k=3, match_cols=("label",)).collect())
    want = []
    for lab in [r.label for r in e.select("label").distinct().collect()]:
        sliced = e.filter(F.col("label") == lab)
        qs = queries.filter(F.col("label") == lab).drop("label")
        for r in sim.brute_force_topk(sliced, qs, k=3).collect():
            want.append((r.query_id, lab, r.vec_id, r.rank, r.sim))
    assert got == sorted(want)
    # every hit shares the query's label by construction
    assert all(g[1] is not None for g in got)


def test_sparkhash_matches_spark_xxhash64(spark):
    """tools/sparkhash (the independent hash primitive behind the committed
    q52/q53/q57 oracle fixtures) must agree with Spark's xxhash64 on strings,
    string+int chains, and long+string chains."""
    from tools.sparkhash import spark_xxhash64

    vals = ["", "a", "the quick brown fox", "x" * 100, "1704412800000", "42,17,9"]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    rows = df.select(
        "s",
        F.xxhash64("s").alias("h1"),
        F.xxhash64("s", F.lit(5)).alias("h2"),
        F.xxhash64(F.lit(987654321098765), "s").alias("h3"),
    ).collect()
    for r in rows:
        assert r.h1 == spark_xxhash64(r.s)
        assert r.h2 == spark_xxhash64(r.s, 5)
        assert r.h3 == spark_xxhash64(("long", 987654321098765), r.s)


def test_oracle_fixtures_fresh():
    """The committed gate fixtures must equal what the independent generator
    produces from the gate-scale data — catches stale fixtures after any
    change to the operators' hash/banding parameters."""
    import os

    import pyarrow.parquet as pq

    gate_dir = "/root/testdata/sf0.01"
    if not os.path.isdir(gate_dir):
        pytest.skip("gate-scale testdata unavailable")
    os.environ["SPARK_GRAFT_SF_DIR"] = gate_dir
    from tools import gen_oracle_fixtures as gen

    docs = pq.read_table(os.path.join(gate_dir, "documents.parquet"))
    doc_ids = docs.column("doc_id").to_pylist()
    texts = docs.column("text").to_pylist()
    fresh52 = gen.gen_q52(doc_ids, texts)
    committed52 = pq.read_table("/root/repo/tests/fixtures/oracle_q52_sf001.parquet")
    assert fresh52.equals(committed52)
    fresh53 = gen.gen_q53(doc_ids, texts)
    committed53 = pq.read_table("/root/repo/tests/fixtures/oracle_q53_sf001.parquet")
    assert fresh53.equals(committed53)
    import numpy as np

    emb = pq.read_table(os.path.join(gate_dir, "embeddings.parquet"))
    vec_ids = np.array(emb.column("vec_id").to_pylist(), dtype=np.int64)
    raw_vecs = [np.array(v, dtype=np.float32)
                for v in emb.column("embedding").to_pylist()]
    fresh74 = gen.gen_q74(vec_ids, raw_vecs)
    committed74 = pq.read_table("/root/repo/tests/fixtures/oracle_q74_sf001.parquet")
    assert fresh74.equals(committed74)


def test_ivfpq_determinism_and_selfmatch(spark, sf_dir):
    """IVF-PQ: two runs are identical; every query's own quantized vector
    survives into its candidate set (the query's cell is always probed)."""
    from greptimedb_spark.queries import read

    e = read(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
    got1 = sorted((r.query_id, r.vec_id, r.sim, r.rank)
                  for r in sim.ivfpq_topk(e, queries, k=5, n_centroids=16,
                                          n_probe=8, m_sub=8, n_codes=64,
                                          iters=1).collect())
    got2 = sorted((r.query_id, r.vec_id, r.sim, r.rank)
                  for r in sim.ivfpq_topk(e, queries, k=5, n_centroids=16,
                                          n_probe=8, m_sub=8, n_codes=64,
                                          iters=1).collect())
    assert got1 == got2 and len(got1) > 0
    qids = {r.query_id for r in queries.collect()}
    for q in qids:
        assert any(a == q and b == q for a, b, _, _ in got1), \
            f"query {q} lost its own vector"
    # n_probe == n_centroids with a code per corpus vector would be exact;
    # at the gate parameters PQ is lossy — sanity-bound the recall instead
    exact = {(r.query_id, r.vec_id)
             for r in sim.brute_force_topk(e, queries, k=5).collect()}
    recall = len(exact & {(a, b) for a, b, _, _ in got1}) / len(exact)
    assert recall >= 0.3, f"IVF-PQ recall collapsed: {recall}"


def test_hnsw_exhaustive_equals_bruteforce(spark, sf_dir):
    """With one index group, complete connectivity (M >= n) and ef covering
    the corpus, HNSW search degenerates to an exact scan — it must
    reproduce brute-force top-k verbatim (same tie-breaks)."""
    from greptimedb_spark.operators import hnsw
    from greptimedb_spark.queries import read

    e = read(spark, sf_dir, "embeddings").limit(80).cache()
    n = e.count()
    queries = e.filter(F.col("vec_id") % 40 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = sim.brute_force_topk(e, queries, k=5)
    approx = hnsw.hnsw_topk(e, queries, k=5, m=n, ef_construction=n,
                            ef_search=n, n_indexes=1)
    ex = {(r.query_id, r.vec_id, r.rank) for r in exact.collect()}
    hn = {(r.query_id, r.vec_id, r.rank) for r in approx.collect()}
    assert ex == hn


def test_hnsw_topk_recall_and_determinism(spark, sf_dir):
    from greptimedb_spark.operators import hnsw
    from greptimedb_spark.queries import read

    e = read(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = sim.brute_force_topk(e, queries, k=5)
    approx = hnsw.hnsw_topk(e, queries, k=5, m=8, ef_construction=64,
                            ef_search=48, n_indexes=4)
    ex = {(r.query_id, r.vec_id) for r in exact.collect()}
    got1 = sorted((r.query_id, r.vec_id, r.sim, r.rank) for r in approx.collect())
    recall = len(ex & {(q, v) for q, v, _, _ in got1}) / len(ex)
    assert recall >= 0.8, f"HNSW recall too low: {recall}"
    # self-match always survives (the query's own group indexes it)
    for q in {r.query_id for r in exact.collect()}:
        assert (q, q, 1.0, 1) in ((a, b, c, d) for a, b, c, d in got1)
    # determinism: a rebuild returns the identical result set
    got2 = sorted((r.query_id, r.vec_id, r.sim, r.rank)
                  for r in hnsw.hnsw_topk(e, queries, k=5, m=8,
                                          ef_construction=64, ef_search=48,
                                          n_indexes=4).collect())
    assert got1 == got2


def test_hnsw_index_persistence(spark, sf_dir, tmp_path):
    """build_hnsw_index writes per-group graph blobs; hnsw_topk(index_path=)
    searches them WITHOUT rebuilding, twice with identical results, equal to
    the inline-build path."""
    from greptimedb_spark.operators import hnsw
    from greptimedb_spark.queries import read

    e = read(spark, sf_dir, "embeddings").limit(200).cache()
    queries = e.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    idx = str(tmp_path / "hnsw_idx")
    hnsw.build_hnsw_index(e, idx, m=8, ef_construction=64, n_indexes=4)
    inline = sorted((r.query_id, r.vec_id, r.sim, r.rank)
                    for r in hnsw.hnsw_topk(e, queries, k=5, m=8,
                                            ef_construction=64, ef_search=48,
                                            n_indexes=4).collect())
    s1 = sorted((r.query_id, r.vec_id, r.sim, r.rank)
                for r in hnsw.hnsw_topk(None, queries, k=5, ef_search=48,
                                        index_path=idx).collect())
    s2 = sorted((r.query_id, r.vec_id, r.sim, r.rank)
                for r in hnsw.hnsw_topk(None, queries, k=5, ef_search=48,
                                        index_path=idx).collect())
    assert s1 == s2 == inline
    assert len(s1) > 0


def test_ivf_index_persistence(spark, sf_dir, tmp_path):
    """build_ivf_index writes centroids + (id, cell) keys; ivf_topk
    (index_path=) searches without retraining, identical to the inline
    trainer."""
    from greptimedb_spark.queries import read

    e = read(spark, sf_dir, "embeddings").limit(300).cache()
    queries = e.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    idx = str(tmp_path / "ivf_idx")
    sim.build_ivf_index(e, idx, n_centroids=16, iters=1)
    inline = sorted((r.query_id, r.vec_id, r.sim, r.rank)
                    for r in sim.ivf_topk(e, queries, k=5, n_centroids=16,
                                          n_probe=8, iters=1).collect())
    stored = sorted((r.query_id, r.vec_id, r.sim, r.rank)
                    for r in sim.ivf_topk(e, queries, k=5, n_probe=8,
                                          index_path=idx).collect())
    assert stored == inline
    assert len(stored) > 0


def test_dedup_clusters_connected_components(spark):
    """a-b, b-c chain into one component; d-e another; singleton f absent
    (no edges). keep_id = min member."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (3, 1)], "id_a long, id_b long")
    out = {r.cluster_id: (r.n_members, r.keep_id, r.member_ids)
           for r in dd.dedup_clusters(pairs).collect()}
    assert out == {1: (3, 1, [1, 2, 3]), 10: (2, 10, [10, 11])}


def test_connected_components_long_chain(spark):
    """propagation must close a diameter > 1 chain (0-1-2-...-9)."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "id_a long, id_b long")
    comp = dd.connected_components(pairs).collect()
    assert {r.component for r in comp} == {0}
    assert len(comp) == 10


def test_connected_components_nonconvergence_raises(spark):
    """max_iter too small for the diameter must raise, never return
    silently-split labels."""
    import pytest
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        dd.connected_components(pairs, max_iter=2)


def test_ivfpq_index_persistence(spark, sf_dir, tmp_path):
    """build_ivfpq_index persists centroids + codebooks + codes; ivfpq_topk
    (corpus=None, index_path=) searches WITHOUT the corpus — the PQ index is
    self-contained — and matches the inline trainer exactly (m_sub and the
    slice width are recovered from the stored codebooks)."""
    from greptimedb_spark.queries import read

    e = read(spark, sf_dir, "embeddings").limit(300).cache()
    queries = e.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    idx = str(tmp_path / "ivfpq_idx")
    sim.build_ivfpq_index(e, idx, n_centroids=16, m_sub=8, n_codes=16,
                          iters=1, dim=64)
    inline = sorted((r.query_id, r.vec_id, r.sim, r.rank)
                    for r in sim.ivfpq_topk(e, queries, k=5, n_centroids=16,
                                            n_probe=8, m_sub=8, n_codes=16,
                                            iters=1, dim=64).collect())
    stored = sorted((r.query_id, r.vec_id, r.sim, r.rank)
                    for r in sim.ivfpq_topk(None, queries, k=5, n_probe=8,
                                            index_path=idx).collect())
    assert stored == inline
    assert len(stored) > 0


def test_exact_substring_pairs_planted(spark):
    """exact_substring_pairs (Lee et al. 2022 ExactSubstr analog): planted
    shared runs are found with exact token lengths; unrelated docs pair
    with nothing; the within-doc repeat does not self-pair."""
    from greptimedb_spark.operators.dedup import exact_substring_pairs

    shared = "the quick brown fox jumps over the lazy dog tonight"  # 10 toks
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta {shared} gamma delta"),
            (2, f"zeta {shared} eta theta iota"),
            (3, "completely different text with no overlap at all here ok"),
            # doc 4 repeats an 8-token run of doc 3? no — repeats its own
            # tail twice; must not produce a (4,4) pair
            (4, "one two three four five six seven eight "
                "one two three four five six seven eight"),
        ],
        "doc_id int, text string",
    )
    got = {(r.doc_a, r.doc_b): (r.max_run_tokens, r.n_shared_grams)
           for r in exact_substring_pairs(docs, "doc_id", "text", k=8).collect()}
    assert set(got) == {(1, 2)}
    # 10 shared tokens -> max run 10, three overlapping 8-grams
    assert got[(1, 2)] == (10, 3)
    # k larger than the shared run -> nothing
    assert exact_substring_pairs(docs, "doc_id", "text", k=11).count() == 0
    # max_gram_docs cap drops boilerplate grams
    many = spark.createDataFrame(
        [(i, f"filler{i} {shared}") for i in range(5)],
        "doc_id int, text string")
    full = exact_substring_pairs(many, "doc_id", "text", k=8)
    assert full.count() == 10  # C(5,2) — every pair shares the run
    capped = exact_substring_pairs(many, "doc_id", "text", k=8,
                                   max_gram_docs=3)
    assert capped.count() == 0
