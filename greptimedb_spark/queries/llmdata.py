"""Training-data pipeline queries: dedup, similarity search, multimodal
plumbing — first-class operators beyond the reference's own surface.

Oracle strategy: exact/deterministic ops get full DuckDB oracles (fingerprint
dedup, n-gram Jaccard via unnest-join, brute-force cosine top-k). MinHash/
SimHash/LSH use engine-specific hash functions, so their *verification* is the
exact-Jaccard / brute-force recall tests in tests/test_llmdata.py and they run
rows-only here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from greptimedb_spark.operators import dedup as dd
from greptimedb_spark.operators import similarity as sim
from greptimedb_spark.queries import QuerySpec, read


# -- q50: exact dedup groups -----------------------------------------------------

def q50_dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    d = read(spark, sf, "documents")
    return dd.exact_duplicates(d, "doc_id", "text").select(
        "fp", "n_dups", "keep_id", F.size("all_ids").alias("group_size")
    )


Q50_SQL = """
SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
       COUNT(*) AS n_dups, MIN(doc_id) AS keep_id, CAST(COUNT(*) AS INTEGER) AS group_size
FROM documents
GROUP BY 1 HAVING COUNT(*) > 1
"""


# -- q51: exact n-gram Jaccard pairs, blocked by language --------------------------

def q51_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    d = read(spark, sf, "documents")
    return dd.ngram_jaccard_pairs(d, "doc_id", "text", "lang", k=3, threshold=0.12)


Q51_SQL = """
WITH sh AS (
  SELECT doc_id, lang,
         list_distinct([array_to_string(toks[i:i+2], ' ')
                        for i in range(1, len(toks) - 1)]) AS shset
  FROM (SELECT doc_id, lang,
               regexp_split_to_array(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
        FROM documents)
  WHERE len(toks) >= 3
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.lang AS block,
       ROUND(CAST(len(list_intersect(a.shset, b.shset)) AS DOUBLE)
             / (len(a.shset) + len(b.shset) - len(list_intersect(a.shset, b.shset))), 6) AS jaccard
FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.shset, b.shset)) AS DOUBLE)
      / (len(a.shset) + len(b.shset) - len(list_intersect(a.shset, b.shset))) >= 0.12
"""


# -- q52: MinHash+LSH near-dup candidates (hash-specific → rows-only) --------------

def q52_minhash_lsh(spark: SparkSession, sf: str) -> DataFrame:
    d = read(spark, sf, "documents")
    return dd.minhash_lsh_pairs(
        d, "doc_id", "text", num_hashes=64, bands=16, shingle_k=3, jaccard_threshold=0.12
    )


# -- q53: SimHash near-dup pairs (hash-specific → rows-only) -----------------------

def q53_simhash(spark: SparkSession, sf: str) -> DataFrame:
    d = read(spark, sf, "documents")
    return dd.simhash_pairs(d, "doc_id", "text", max_hamming=3)


# -- q54: brute-force cosine top-k (exact ANN baseline) ----------------------------

def q54_ann_bruteforce(spark: SparkSession, sf: str) -> DataFrame:
    e = read(spark, sf, "embeddings")
    queries = (
        e.filter(F.col("vec_id") % 100 == 0)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
    )
    return sim.brute_force_topk(e, queries, k=5)


Q54_SQL = """
WITH q AS (SELECT vec_id AS query_id, embedding AS query_vec FROM embeddings WHERE vec_id % 100 = 0),
     scored AS (
  SELECT q.query_id, e.vec_id,
         ROUND(
           list_aggregate(list_transform(list_zip(e.embedding, q.query_vec),
                          p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')
           / (sqrt(list_aggregate(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
              * sqrt(list_aggregate(list_transform(q.query_vec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))),
         6) AS sim
  FROM embeddings e, q
)
SELECT query_id, vec_id, sim,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id ASC) AS INTEGER) AS rank
FROM scored
QUALIFY rank <= 5
"""


# -- q55: LSH-bucketed ANN (approximate scale path → rows-only) --------------------

def q55_ann_lsh(spark: SparkSession, sf: str) -> DataFrame:
    e = read(spark, sf, "embeddings")
    queries = (
        e.filter(F.col("vec_id") % 100 == 0)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
    )
    return sim.lsh_topk(e, queries, dim=64, k=5, n_planes=4, n_tables=20)


# -- q57: IVF-flat ANN (centroid-bucketed scale path → rows-only) ------------------
# Probing every cell (n_probe == n_centroids) makes IVF exhaustive, so the
# pytest equality test pins it against brute force; the registry entry runs
# the honest partial-probe configuration (recall test covers it).

def q57_ann_ivf(spark: SparkSession, sf: str) -> DataFrame:
    e = read(spark, sf, "embeddings")
    queries = (
        e.filter(F.col("vec_id") % 100 == 0)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
    )
    return sim.ivf_topk(e, queries, k=5, n_centroids=16, n_probe=8, iters=1)


# -- q56: embedding near-dup pairs via the LSH production path (oracled) ------------
# The DuckDB oracle is the exact all-pairs scan, so this also asserts the LSH
# path's recall = 1.0 on the gate data (deterministic hyperplanes: 3 planes ×
# 24 tables keeps the miss probability at a 0.5-cosine boundary < 1e-3).
# brute_force_neardup_pairs stays as the pytest oracle for other thresholds.

def q56_embedding_neardup(spark: SparkSession, sf: str) -> DataFrame:
    e = read(spark, sf, "embeddings")
    return sim.embedding_neardup_pairs(e, dim=64, threshold=0.5, n_planes=3, n_tables=24)


Q56_SQL = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(
         list_aggregate(list_transform(list_zip(a.embedding, b.embedding),
                        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')
         / (sqrt(list_aggregate(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
            * sqrt(list_aggregate(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))),
       6) AS sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_aggregate(list_transform(list_zip(a.embedding, b.embedding),
                     p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')
      / (sqrt(list_aggregate(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
         * sqrt(list_aggregate(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))) >= 0.5
"""


QUERIES = {
    "q50_dedup_exact": QuerySpec(q50_dedup_exact, Q50_SQL, "exact dedup groups"),
    "q51_ngram_jaccard": QuerySpec(q51_ngram_jaccard, Q51_SQL, "blocked 3-gram Jaccard pairs"),
    "q52_minhash_lsh": QuerySpec(q52_minhash_lsh, None, "MinHash+LSH near-dup (rows-only)"),
    "q53_simhash": QuerySpec(q53_simhash, None, "SimHash near-dup (rows-only)"),
    "q54_ann_bruteforce": QuerySpec(q54_ann_bruteforce, Q54_SQL, "exact cosine top-k"),
    "q55_ann_lsh": QuerySpec(q55_ann_lsh, None, "LSH-bucketed ANN (rows-only)"),
    "q57_ann_ivf": QuerySpec(q57_ann_ivf, None, "IVF-flat ANN (rows-only)"),
    "q56_embedding_neardup": QuerySpec(q56_embedding_neardup, Q56_SQL, "cosine near-dup pairs"),
}
