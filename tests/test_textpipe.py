"""Tests for operators/textpipe.py (repetition signals, concat-and-chunk
packing, hash-threshold stratified sampling) and similarity.semdedup."""

import hashlib

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from greptimedb_spark.operators import textpipe as tp
from greptimedb_spark.operators import similarity as sim


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=0, text="a a a a"),
            Row(doc_id=1, text="the quick brown fox jumps over the lazy dog"),
            Row(doc_id=2, text="x y x y x y x y"),
            Row(doc_id=3, text="one"),
            Row(doc_id=4, text="  Mixed   CASE   mixed case  "),
        ]
    )


def test_repetition_signals_values(docs):
    rows = {r["doc_id"]: r for r in tp.repetition_signals(docs).collect()}
    # "a a a a": 4 tokens, 1 distinct; bigrams ["a a"]*3 -> top frac 1.0;
    # trigrams ["a a a"]*2 -> dup frac (2-1)/2 = 0.5
    r0 = rows[0]
    assert r0["n_tokens"] == 4
    assert r0["distinct_ratio"] == 0.25
    assert r0["top_bigram_frac"] == 1.0
    assert r0["dup_trigram_frac"] == 0.5
    assert not r0["repetition_ok"]
    # 9 distinct-ish tokens: "the" twice; all bigrams unique
    r1 = rows[1]
    assert r1["n_tokens"] == 9
    assert r1["distinct_ratio"] == round(8 / 9, 6)
    assert r1["top_bigram_frac"] == round(1 / 8, 6)
    assert r1["dup_trigram_frac"] == 0.0
    # single-token doc: no bigrams/trigrams -> fracs 0, ratio 1
    r3 = rows[3]
    assert r3["n_tokens"] == 1
    assert r3["distinct_ratio"] == 1.0
    assert r3["top_bigram_frac"] == 0.0
    assert r3["dup_trigram_frac"] == 0.0
    # normalization: lower + collapse whitespace -> "mixed case mixed case"
    r4 = rows[4]
    assert r4["n_tokens"] == 4
    assert r4["distinct_ratio"] == 0.5


def test_pack_concat_chunks_exact(spark):
    # token counts 3, 4, 5 with chunk size 4:
    # doc 0: offs 0-2  -> chunk 0
    # doc 1: offs 3-6  -> chunks 0-1
    # doc 2: offs 7-11 -> chunks 1-2
    d = spark.createDataFrame(
        [Row(doc_id=0, text="a b c"), Row(doc_id=1, text="a b c d"),
         Row(doc_id=2, text="a b c d e")]
    )
    rows = {r["doc_id"]: r for r in tp.pack_concat_chunks(d, chunk_tokens=4).collect()}
    assert (rows[0]["start_chunk"], rows[0]["end_chunk"], rows[0]["n_chunks"]) == (0, 0, 1)
    assert (rows[1]["start_chunk"], rows[1]["end_chunk"], rows[1]["n_chunks"]) == (0, 1, 2)
    assert (rows[2]["start_chunk"], rows[2]["end_chunk"], rows[2]["n_chunks"]) == (1, 2, 2)


def test_pack_concat_chunks_bucket_invariance(spark, sf_dir):
    """The two-level cumulative sum must give the same global offsets for any
    bucket_span — the parallel decomposition cannot change the math."""
    from greptimedb_spark.queries import read

    d = read(spark, sf_dir, "documents")
    a = tp.pack_concat_chunks(d, chunk_tokens=128, bucket_span=7)
    b = tp.pack_concat_chunks(d, chunk_tokens=128, bucket_span=10**6)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_stratified_hash_sample_exact_and_nested(spark, sf_dir):
    from greptimedb_spark.queries import read

    d = read(spark, sf_dir, "documents")
    got = tp.stratified_hash_sample(
        d, fractions={"en": 0.5}, default_frac=0.25
    ).select("doc_id", "lang").collect()
    for r in got:
        u = hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:8]
        assert u < ("80000000" if r["lang"] == "en" else "40000000")
    # every kept row at frac f is kept at any f' > f (threshold monotonicity)
    small = {r["doc_id"] for r in got}
    big = {
        r["doc_id"]
        for r in tp.stratified_hash_sample(
            d, fractions={"en": 0.9}, default_frac=0.5
        ).select("doc_id").collect()
    }
    assert small <= big
    # frac 1.0 keeps everything; frac 0.0 keeps nothing
    assert tp.stratified_hash_sample(d, fractions={}, default_frac=1.0).count() == d.count()
    assert tp.stratified_hash_sample(d, fractions={}, default_frac=0.0).count() == 0


def test_semdedup_bounds(spark, sf_dir):
    from greptimedb_spark.queries import read

    e = read(spark, sf_dir, "embeddings").limit(120)
    n = e.count()
    # eps above +1: cosine never reaches it -> everything kept
    all_kept = sim.semdedup(e, eps=1.01, n_centroids=8)
    assert all_kept.count() == n
    # eps at -1: every pair qualifies -> exactly one survivor per cell, and it
    # is the cell's lowest id
    one_per_cell = sim.semdedup(e, eps=-1.0, n_centroids=8).collect()
    cells = {}
    for r in all_kept.collect():
        cells.setdefault(r["cell"], []).append(r["vec_id"])
    assert sorted((r["cell"], r["vec_id"]) for r in one_per_cell) == sorted(
        (c, min(ids)) for c, ids in cells.items()
    )
    # monotone: a stricter eps (lower) keeps a subset
    k_040 = {r["vec_id"] for r in sim.semdedup(e, eps=0.40, n_centroids=8).collect()}
    k_030 = {r["vec_id"] for r in sim.semdedup(e, eps=0.30, n_centroids=8).collect()}
    assert k_030 <= k_040
    # n_centroids=None derives k from the sizing rule (n/target_cell_size)
    derived = sim.semdedup(e, eps=1.01, n_centroids=None, target_cell_size=30)
    assert derived.count() == n
    assert derived.select("cell").distinct().count() <= -(-n // 30)


def test_cluster_balanced_sample(spark, sf_dir):
    from greptimedb_spark.queries import read

    e = read(spark, sf_dir, "embeddings")
    out = sim.cluster_balanced_sample(e, per_cell=5, n_centroids=8).collect()
    by_cell = {}
    for r in out:
        by_cell.setdefault(r.cell, []).append(r)
    # quota enforced per cell, ranks dense from 1
    for rows in by_cell.values():
        assert len(rows) <= 5
        assert sorted(r.rank for r in rows) == list(range(1, len(rows) + 1))
    # per_cell larger than any cell keeps the whole corpus
    assert sim.cluster_balanced_sample(
        e, per_cell=10**6, n_centroids=8).count() == e.count()
    # deterministic: same spec, same selection
    again = sim.cluster_balanced_sample(e, per_cell=5, n_centroids=8).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_quality_filter(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today"),  # clean
         (2, "too short"),                                # too_few_words
         (3, "a b c d e f g h i j"),                      # word_length (mean 1)
         (4, "#### $$$$ %%%% ^^^^ &&&& !!!! @@@@ **** (((( ))))"),
         (5, "x" * 200 + " one two three four five six seven eight nine")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in tp.quality_filter(
        df, min_words=10, max_words=50, min_mean_word_len=2,
        max_mean_word_len=12).collect()}
    assert out[1]["keep"] and out[1]["reasons"] == ""
    assert out[1]["n_words"] == 10
    assert out[2]["reasons"] == "too_few_words" and not out[2]["keep"]
    assert "word_length" in out[3]["reasons"]
    # all-symbol doc (10 four-char tokens: word rules pass) fails alpha
    # ratio AND symbol ratio; reasons come back sorted
    assert out[4]["reasons"] == "high_symbol_ratio,low_alpha_ratio"
    assert "word_length" in out[5]["reasons"]  # 200-char token blows the mean
    # map-only claim: no exchange in the plan
    plan = tp.quality_filter(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_top_ngrams(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma alpha beta gamma"),
         (2, "alpha beta gamma delta"),
         (3, "zeta eta theta")],
        "doc_id long, text string")
    rows = tp.top_ngrams(df, n=3, k=3).collect()
    # 'alpha beta gamma' is in 2 docs (3 occurrences) -> rank 1; ties rank
    # by gram ascending so the set is deterministic
    assert rows[0]["g"] == "alpha beta gamma"
    assert rows[0]["doc_freq"] == 2 and rows[0]["total_count"] == 3
    assert [r["g"] for r in rows[1:]] == \
        sorted(r["g"] for r in rows[1:])[:2] or len(rows) == 3
    # doc shorter than n contributes nothing but doesn't error
    assert tp.top_ngrams(spark.createDataFrame(
        [(9, "one two")], "doc_id long, text string"), n=3, k=5).count() == 0


def test_ngram_contamination(spark):
    from pyspark.sql import Row

    docs = spark.createDataFrame([
        Row(doc_id=0, text="the quick brown fox jumps over the lazy dog"),
        Row(doc_id=1, text="a quick brown fox jumps over a fence today"),
        Row(doc_id=2, text="completely different words entirely here now"),
        Row(doc_id=3, text="too short"),          # < n tokens -> 0 grams
    ])
    bench = docs.filter("doc_id = 0")
    got = {r.doc_id: r for r in
           tp.ngram_contamination(docs, bench, n=3).collect()}
    # benchmark member self-contaminates fully
    assert got[0].contamination_frac == 1.0 and got[0].flagged
    # doc 1 shares "quick brown fox", "brown fox jumps", "fox jumps over"
    assert got[1].n_contaminated == 3 and got[1].flagged
    assert got[1].n_distinct_ngrams == 7
    assert got[2].n_contaminated == 0 and not got[2].flagged
    # short doc survives with zero grams and frac 0
    assert (got[3].n_distinct_ngrams, got[3].contamination_frac,
            got[3].flagged) == (0, 0.0, False)


def test_scrub_pii(spark):
    d = spark.createDataFrame([
        Row(doc_id=0, text="mail a.b+c@ex-ample.org and b@x.io, ip 192.168.0.1 call +4915112345678"),
        Row(doc_id=1, text="no pii here, just 1.2 numbers and v1.2.3.4.5 though"),
        Row(doc_id=2, text="edge: version 1.2.3.4 is an ip shape; +123 too short"),
    ])
    rows = {r["doc_id"]: r for r in tp.scrub_pii(d).collect()}
    r0 = rows[0]
    assert (r0["n_email"], r0["n_ip"], r0["n_phone"]) == (2, 1, 1)
    assert r0["scrubbed"] == "mail [EMAIL] and [EMAIL], ip [IP] call [PHONE]"
    # 1.2.3.4.5 contains the 4-octet shape as a substring boundary-wise:
    # \b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b matches "1.2.3.4" then ".5" stays
    r1 = rows[1]
    assert r1["n_email"] == 0 and r1["n_phone"] == 0
    r2 = rows[2]
    assert r2["n_ip"] == 1 and r2["n_phone"] == 0
    assert "[IP]" in r2["scrubbed"] and "+123" in r2["scrubbed"]
    # ordering: an email must not leave digits behind that count as phone
    e = spark.createDataFrame([Row(doc_id=0, text="x +12345678@mail.com y")])
    r = tp.scrub_pii(e).collect()[0]
    assert r["n_email"] == 1 and r["n_phone"] == 0


def test_stratified_exact_sample_quota(spark, sf_dir):
    from greptimedb_spark.queries import read
    import math

    d = read(spark, sf_dir, "documents")
    counts = {r["lang"]: r["n"] for r in
              d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    got = tp.stratified_exact_sample(
        d, fractions={"en": 0.5}, default_frac=0.2
    ).groupBy("lang").agg(F.count("*").alias("n")).collect()
    for r in got:
        frac = 0.5 if r["lang"] == "en" else 0.2
        assert r["n"] == math.ceil(frac * counts[r["lang"]])
    # deterministic: two runs pick the identical rows
    a = {r["doc_id"] for r in tp.stratified_exact_sample(d).select("doc_id").collect()}
    b = {r["doc_id"] for r in tp.stratified_exact_sample(d).select("doc_id").collect()}
    assert a == b


def test_corpus_frequency_score(spark):
    # corpus: "a" x5, "b" x2, "z" x1 across docs -> total 8
    d = spark.createDataFrame([
        Row(doc_id=0, text="a a a"),     # sum 5+5+5=15, score 15/(3*8)
        Row(doc_id=1, text="a b z"),     # sum 5+2+1=8, score 8/(3*8)
        Row(doc_id=2, text="b a"),       # sum 2+5=7, score 7/(2*8)
    ])
    rows = {r["doc_id"]: r for r in tp.corpus_frequency_score(d).collect()}
    assert rows[0]["sum_tok_freq"] == 15 and rows[0]["freq_score"] == 15 / 24
    assert rows[1]["sum_tok_freq"] == 8 and rows[1]["freq_score"] == 8 / 24
    assert rows[2]["sum_tok_freq"] == 7 and rows[2]["freq_score"] == 7 / 16
    # common-token doc scores above the one with a rare token
    assert rows[0]["freq_score"] > rows[1]["freq_score"]


def test_repetition_signals_random_against_python(spark):
    """Batch property test: 60 pseudo-random docs, Spark signals vs a direct
    Python recomputation of the spec (one Spark job for the whole batch)."""
    import random

    rng = random.Random(42)
    vocab = ["aa", "bb", "cc", "dd", "ee", "ff"]
    docs = []
    for i in range(60):
        n = rng.randint(1, 30)
        docs.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in tp.repetition_signals(df).collect()}

    for i, text in docs:
        toks = text.split(" ")
        bi = [" ".join(toks[j:j + 2]) for j in range(len(toks) - 1)]
        tri = [" ".join(toks[j:j + 3]) for j in range(len(toks) - 2)]
        r = got[i]
        assert r["n_tokens"] == len(toks)
        assert r["distinct_ratio"] == round(len(set(toks)) / len(toks), 6)
        want_top = round(max((bi.count(x) for x in set(bi)), default=0) / len(bi), 6) if bi else 0.0
        assert r["top_bigram_frac"] == want_top, (text, r)
        want_dup = round((len(tri) - len(set(tri))) / len(tri), 6) if tri else 0.0
        assert r["dup_trigram_frac"] == want_dup


def test_pack_concat_chunks_random_against_python(spark):
    import random

    rng = random.Random(7)
    docs = [(i, " ".join("w" for _ in range(rng.randint(1, 50)))) for i in range(80)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           tp.pack_concat_chunks(df, chunk_tokens=32, bucket_span=9).collect()}
    off = 0
    for i, text in docs:  # doc_id order == list order
        n = len(text.split(" "))
        assert got[i]["n_tokens"] == n
        assert got[i]["start_chunk"] == off // 32
        assert got[i]["end_chunk"] == (off + n - 1) // 32
        off += n
