"""Training-data text-pipeline operators: repetition/quality signals,
concat-and-chunk sequence packing, and hash-threshold stratified sampling.

These extend the reference's text surface (full-text search + the scalar
text helpers in functions/text.py) with the document-level operations a
100 TB pretraining-data pipeline runs between dedup and tokenization:

- :func:`repetition_signals` — Gopher-style repetition ratios (distinct-token
  ratio, top-bigram fraction, duplicate-trigram fraction), computed entirely
  with array column algebra inside the scan stage: no explode, no shuffle,
  no UDF. At 100 TB this is a map-only pass.
- :func:`pack_concat_chunks` — GPT-style "concatenate all documents in a
  fixed order and cut into fixed-size token chunks" packing. The global
  running token offset is computed with a two-level cumulative sum (per-
  bucket windows in parallel + one tiny window over bucket totals) so no
  single reducer ever sees more than one bucket of rows.
- :func:`stratified_hash_sample` — deterministic per-stratum subsampling
  (data mixing) by comparing a content-independent md5(id) prefix against a
  per-stratum threshold. Map-only: no shuffle, no count pass, reproducible
  across engines and runs.

Reference scope note: GreptimeDB itself stops at full-text search and scalar
string functions; these operators are the "beyond the reference" pipeline
surface called for by the project brief, built Spark-first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _norm_tokens(text_col) -> Column:
    """Whitespace tokens of the normalized text (same normalization as the
    dedup family: lower, trim, collapse whitespace runs)."""
    c = text_col if isinstance(text_col, Column) else F.col(text_col)
    return F.split(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "), " ")


def _token_ngrams(toks: Column, n: int) -> Column:
    """Token n-grams joined by a single space, as an array column.
    size = max(0, size(toks) - n + 1); pure column algebra. Docs shorter than
    ``n`` tokens get an empty array (sequence(1, 0) would count DOWN)."""
    cnt = F.size(toks) - (n - 1)
    return F.when(cnt <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), cnt),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        )
    )


def _max_element_count(arr: Column) -> Column:
    """Count of the most frequent element of ``arr``: sort the array, then a
    single ordered fold tracks the current run length and the best run.
    Stays in whole-stage codegen — no explode/groupBy for a per-row mode."""
    acc0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )
    return F.aggregate(
        F.array_sort(arr),
        acc0,
        lambda a, x: F.struct(
            x.alias("prev"),
            F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                a["best"],
                F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda a: a["best"],
    )


def repetition_signals(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_top_bigram_frac: float = 0.08,
    max_dup_trigram_frac: float = 0.05,
    min_distinct_ratio: float = 0.3,
) -> DataFrame:
    """Per-document repetition/quality signals in the spirit of the Gopher
    quality rules (Rae et al. 2021, arXiv:2112.11446 §A1.1) adapted to
    token n-grams:

    - ``distinct_ratio``   = |distinct tokens| / |tokens|
    - ``top_bigram_frac``  = occurrences of the most frequent token 2-gram
                             / total 2-grams (0.0 when the doc has < 2 tokens)
    - ``dup_trigram_frac`` = fraction of 3-gram occurrences that are repeats
                             of an earlier identical 3-gram
    - ``repetition_ok``    = all three signals inside the thresholds

    Everything is array column algebra on the scan stage: the plan is a
    single Project over the parquet scan (no shuffle, no Python). At 100 TB
    this is the cheapest possible shape — one map-only pass, usually fused
    with whatever filter consumes ``repetition_ok``.
    """
    # tokenize in its OWN projection level: passing the `toks` Column object
    # into each ngram expression copies the split+regexp subtree per use
    # (7 copies in the executed plan — HOF-lambda copies are also excluded
    # from codegen subexpression elimination). As a named column referenced
    # by non-cheap consumers it is evaluated once; CollapseProject keeps the
    # two Projects separate, still one map-only fused stage over the scan.
    toks = F.col("_toks")
    d = df.select(
        F.col(id_col), _norm_tokens(text_col).alias("_toks")
    ).select(
        F.col(id_col),
        "_toks",
        _token_ngrams(toks, 2).alias("_bi"),
        _token_ngrams(toks, 3).alias("_tri"),
    )
    n_tok = F.size("_toks")
    n_bi = F.size("_bi")
    n_tri = F.size("_tri")
    distinct_ratio = F.round(F.size(F.array_distinct("_toks")) / n_tok, 6)
    top_bigram_frac = F.when(n_bi == 0, F.lit(0.0)).otherwise(
        F.round(_max_element_count(F.col("_bi")) / n_bi, 6)
    )
    dup_trigram_frac = F.when(n_tri == 0, F.lit(0.0)).otherwise(
        F.round((n_tri - F.size(F.array_distinct("_tri"))) / n_tri, 6)
    )
    out = d.select(
        F.col(id_col),
        n_tok.cast("bigint").alias("n_tokens"),
        distinct_ratio.alias("distinct_ratio"),
        top_bigram_frac.alias("top_bigram_frac"),
        dup_trigram_frac.alias("dup_trigram_frac"),
    )
    return out.withColumn(
        "repetition_ok",
        (F.col("distinct_ratio") >= min_distinct_ratio)
        & (F.col("top_bigram_frac") <= max_top_bigram_frac)
        & (F.col("dup_trigram_frac") <= max_dup_trigram_frac),
    )


def pack_concat_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 256,
    bucket_span: int = 4096,
) -> DataFrame:
    """Concatenate-and-chunk sequence packing: documents are laid end to end
    in ``id_col`` order and the token stream is cut into fixed
    ``chunk_tokens``-size training chunks (the classic GPT pretraining
    packing). Returns per document: token count, global start/end chunk
    index, and how many chunks the document spans.

    Scale shape: the naive ``Window.orderBy(id)`` running sum puts the whole
    table on ONE reducer. Instead the cumulative sum is two-level:

    1. rows are grouped into buckets of ``bucket_span`` ids; the within-
       bucket running sum is a window PARTITIONED by bucket (parallel);
    2. bucket totals (|rows| / bucket_span of them) get their own tiny
       exclusive-prefix window and are broadcast back as per-bucket offsets.

    No reducer ever holds more than one bucket; the bucket-totals window is
    a few thousand rows per billion documents.

    r12 (guide §2.4 — remove shuffles outright): the bucket totals are
    derived from the WINDOWED relation (``max(_cum_in)`` per bucket — the
    running sum at the bucket's last row IS the bucket total) instead of a
    separate ``groupBy(_bucket).sum(n_tokens)`` over the raw rows. The two
    consumers then share one byte-identical ``hashpartitioning(_bucket)``
    exchange that ReuseExchange deduplicates, so the corpus is scanned and
    tokenized ONCE (plan: 4 scans → 1 scan + 3 ReusedExchange, 8 exchanges
    → 3; the old totals branch re-ran the tokenize because its partial-agg
    exchange carried different bytes and could not be reused).
    """
    toks = _norm_tokens(text_col)
    d = df.select(
        F.col(id_col),
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.floor(F.col(id_col) / bucket_span).alias("_bucket"),
    ).filter(F.col("_bucket").isNotNull())
    # ^ the planner injects this isnotnull on the offsets-join side anyway
    # (inner equi-join on _bucket); stating it on BOTH consumers keeps their
    # exchange subtrees byte-identical so ReuseExchange can deduplicate them.
    # Null ids never reached the output before either (the join dropped
    # them); now their tokens don't shift later buckets' offsets.
    w_in = (
        Window.partitionBy("_bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn("_cum_in", F.sum("n_tokens").over(w_in))
    totals = d.groupBy("_bucket").agg(F.max("_cum_in").alias("_tot"))
    w_off = (
        Window.orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "_bucket", F.coalesce(F.sum("_tot").over(w_off), F.lit(0)).alias("_off")
    )
    cum = F.col("_off") + F.col("_cum_in")
    start = cum - F.col("n_tokens")
    return (
        d.join(F.broadcast(offsets), "_bucket")
        .select(
            F.col(id_col),
            F.col("n_tokens"),
            F.floor(start / chunk_tokens).cast("bigint").alias("start_chunk"),
            F.floor((cum - 1) / chunk_tokens).cast("bigint").alias("end_chunk"),
        )
        .withColumn(
            "n_chunks", (F.col("end_chunk") - F.col("start_chunk") + 1).cast("bigint")
        )
    )


def _frac_to_hex8(frac: float) -> str:
    """Per-stratum keep threshold as an 8-hex-digit string: a row is kept iff
    the first 8 hex chars of md5(id) compare lexicographically below it.
    Hex-string order == numeric order for fixed-width lowercase hex, and the
    md5 prefix is uniform, so P(keep) = floor(frac * 2^32) / 2^32 exactly —
    the same rows in any engine with a standard md5."""
    n = int(frac * 4294967296.0)
    if n >= 4294967296:
        return "g"  # above every hex digit: keep all
    return format(max(0, n), "08x")


def stratified_hash_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    strata_col: str = "lang",
    fractions: dict[str, float] | None = None,
    default_frac: float = 0.1,
) -> DataFrame:
    """Deterministic stratified subsample (training-data mixing): keep each
    row with its stratum's probability, decided by hashing the row id —
    ``substr(md5(cast(id as string)), 1, 8) < threshold(stratum)``.

    Map-only: no shuffle, no per-group count pass, no RNG state. The same
    (id, stratum) always makes the same decision, so mixes are reproducible
    across runs, engines, and data layouts — at 100 TB the sample is a pure
    filter pushed to the scan, and re-running after appending new data never
    flips old rows. (Per-stratum counts land within binomial noise of the
    target fraction; use a window-rank variant when an exact quota matters
    more than a second shuffle.)
    """
    fractions = fractions or {}
    u = F.substring(F.md5(F.col(id_col).cast("string")), 1, 8)
    thresh = F.lit(_frac_to_hex8(default_frac))
    for key, frac in sorted(fractions.items()):
        thresh = F.when(F.col(strata_col) == key, F.lit(_frac_to_hex8(frac))).otherwise(
            thresh
        )
    return df.filter(u < thresh)


# Category → (pattern, replacement token). Patterns stay inside the regex
# subset Java util.regex and RE2 share (\b, \d, classes, bounded reps), so a
# SQL engine can reproduce the scrub exactly.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("phone", r"\+\d{7,15}\b", "[PHONE]"),
)


def scrub_pii(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    patterns=PII_PATTERNS,
) -> DataFrame:
    """Redact PII-shaped spans (emails, IPv4 literals, international phone
    numbers) from a text column — the C4-style scrubbing pass a pretraining
    pipeline runs before tokenization. Returns the input columns plus
    ``scrubbed`` and one ``n_<category>`` count per pattern.

    Applied strictly in ``patterns`` order on the progressively-scrubbed
    text (an email's digits must not double-count as a phone). Pure
    ``regexp_count``/``regexp_replace`` column algebra: map-only, scan-stage,
    no Python in the loop at any scale.
    """
    out = df
    cur = F.col(text_col)
    for name, pat, token in patterns:
        out = out.withColumn(f"n_{name}", F.regexp_count(cur, F.lit(pat)))
        cur = F.regexp_replace(cur, pat, token)
    return out.withColumn("scrubbed", cur)


def stratified_exact_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    strata_col: str = "lang",
    fractions: dict[str, float] | None = None,
    default_frac: float = 0.1,
) -> DataFrame:
    """EXACT-quota stratified sample: keep precisely ceil(frac * |stratum|)
    rows per stratum, chosen as the lowest md5(id) ranks — still fully
    deterministic and engine-reproducible, unlike RNG sampling.

    Costs one extra shuffle over :func:`stratified_hash_sample` (rank within
    stratum + a per-stratum count): use it when the mixing recipe demands
    exact proportions (e.g. a fixed epoch budget). Scale note: each stratum
    ranks on ONE reducer — fine for the usual few-hundred-strata mixing
    table; for billion-row single-stratum quotas prefer the hash-threshold
    variant, whose deviation is binomial noise.
    """
    fractions = fractions or {}
    u = F.substring(F.md5(F.col(id_col).cast("string")), 1, 16)
    frac = F.lit(float(default_frac))
    for key, fr in sorted(fractions.items()):
        frac = F.when(F.col(strata_col) == key, F.lit(float(fr))).otherwise(frac)
    w_rank = Window.partitionBy(strata_col).orderBy(u, F.col(id_col))
    w_all = Window.partitionBy(strata_col)
    return (
        df.withColumn("_rk", F.row_number().over(w_rank))
        .withColumn("_quota", F.ceil(frac * F.count(F.lit(1)).over(w_all)))
        .filter(F.col("_rk") <= F.col("_quota"))
        .drop("_rk", "_quota")
    )


def corpus_frequency_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level token-frequency quality score — the shape of CCNet-style
    LM filtering (Wenzek et al. 2019, arXiv:1911.00359) with the language
    model replaced by the corpus's own unigram distribution: documents made
    of common tokens score high, gibberish scores low.

    score = (Σ_t count_corpus(t)) / (n_tokens_doc * N_corpus_tokens)
          = mean over the doc's tokens of their corpus relative frequency.

    Exactly engine-reproducible by construction: the numerator is an INTEGER
    sum of corpus counts (no float fold order to pin) and the only floating
    operation is one final division. Returns (id, n_tokens, sum_tok_freq,
    freq_score).

    Scale shape: one count aggregate builds the vocabulary, one join scores
    the exploded tokens (Spark picks broadcast vs shuffle from the vocab
    size — web-scale vocabularies shuffle cleanly on the token key), one
    groupBy folds back to documents; the corpus total rides a broadcast
    one-row relation, never the driver.
    """
    toks = _norm_tokens(text_col)
    tok_rows = df.select(F.col(id_col), F.explode(toks).alias("tok"))
    # two consumers (vocabulary count + the scoring join) — deliberately NOT
    # persisted: an r11 A/B regressed 0.8->2.0 s at sf0.1 (materializing the
    # exploded token stream costs more than the second fused map pass, and
    # the vocab side loses its scan-fused partial aggregation)
    vocab = tok_rows.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = vocab.agg(F.sum("c").alias("n_total"))
    return (
        tok_rows.join(vocab, "tok")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("c").alias("sum_tok_freq"),
        )
        .join(F.broadcast(total))
        .select(
            F.col(id_col),
            F.col("n_tokens"),
            F.col("sum_tok_freq"),
            (F.col("sum_tok_freq") / (F.col("n_tokens") * F.col("n_total")))
            .alias("freq_score"),
        )
    )


def top_ngrams(
    df: DataFrame,
    n: int = 3,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide TOP-K most frequent token ``n``-grams with document
    frequencies — the pass that builds boilerplate/contamination blocklists
    (the most repeated n-grams in a crawl are navigation chrome, license
    headers, and benchmark leakage). Output: (g, doc_freq, total_count),
    ranked by doc_freq then total_count, with the gram itself as the final
    tiebreak so the top-k set is a TOTAL order (cross-engine deterministic).

    Scale shape: map-side explode + one groupBy on the gram (partial
    aggregation combines within each scan task before the shuffle;
    count(DISTINCT doc) plans as Spark's two-phase expand, still one
    logical shuffle) + TakeOrderedAndProject for the top-k — no global
    sort ever materializes. Gram-key skew is absorbed by the partial
    aggregates: a gram appearing in every document contributes ONE partial
    row per task, not one row per occurrence."""
    grams = df.select(
        F.col(id_col), _norm_tokens(text_col).alias("_toks")
    ).select(F.col(id_col),
             F.explode(_token_ngrams(F.col("_toks"), n)).alias("g"))
    return (
        grams.groupBy("g")
        .agg(F.countDistinct(id_col).alias("doc_freq"),
             F.count(F.lit(1)).alias("total_count"))
        .orderBy(F.desc("doc_freq"), F.desc("total_count"), F.asc("g"))
        .limit(k)
    )


def quality_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_alpha_word_frac: float = 0.7,
    max_symbol_frac: float = 0.1,
) -> DataFrame:
    """Rule-based document QUALITY FILTER — the C4/Gopher-style heuristic
    gate a pretraining pipeline runs before dedup/tokenization (C4: Raffel
    et al. 2020 §2.2; Gopher: Rae et al. 2021 A.1.1). Per document:

    - word count within [min_words, max_words]      -> ``too_few_words`` /
      ``too_many_words``
    - mean word length within [min, max]            -> ``word_length``
    - fraction of words containing a letter >= min  -> ``low_alpha_ratio``
    - non-alphanumeric/space character fraction <= max
                                                    -> ``high_symbol_ratio``

    Output: (id, n_words, mean_word_len, alpha_word_frac, symbol_frac,
    reasons, keep) — ``reasons`` is the comma-joined sorted list of failed
    rules ('' = clean), ``keep`` its emptiness. Thresholds are parameters:
    corpus-appropriate values beat one-size-fits-all (the cited defaults
    assume web text).

    Scale shape: pure column algebra over the scan — no explode, no
    shuffle, no UDF; at 100 TB this is a map-only pass that composes with
    predicate pushdown (filtering on ``keep`` prunes at the scan)."""
    # layered named columns: passing the raw Column trees into every
    # consumer copied the tokenize subtree 32x per row in the executed plan
    # (same construction-time duplication as repetition_signals); each layer
    # evaluates once, the stage stays one fused map-only pass
    mean_len = (F.length("_norm") - (F.col("_nw") - 1)) / F.col("_nw")
    symbol_frac = (F.length(F.regexp_replace("_norm", "[a-z0-9 ]", ""))
                   / F.length("_norm"))
    reasons = F.concat_ws(
        ",",
        F.array_sort(F.filter(F.array(
            F.when(F.col("_nw") < min_words, F.lit("too_few_words")),
            F.when(F.col("_nw") > max_words, F.lit("too_many_words")),
            F.when((F.col("_ml") < min_mean_word_len)
                   | (F.col("_ml") > max_mean_word_len), F.lit("word_length")),
            F.when(F.col("_af") < min_alpha_word_frac,
                   F.lit("low_alpha_ratio")),
            F.when(F.col("_sf") > max_symbol_frac,
                   F.lit("high_symbol_ratio")),
        ), lambda x: x.isNotNull())))
    return (
        df.select(F.col(id_col), _norm_tokens(text_col).alias("_toks"))
        .select(
            F.col(id_col),
            F.size("_toks").alias("_nw"),
            F.array_join("_toks", " ").alias("_norm"),
            F.size(F.filter("_toks", lambda t: t.rlike("[a-z]")))
            .alias("_nalpha"),
        )
        .select(
            F.col(id_col), "_nw",
            mean_len.alias("_ml"),
            (F.col("_nalpha") / F.col("_nw")).alias("_af"),
            symbol_frac.alias("_sf"),
        )
        .select(
            F.col(id_col),
            F.col("_nw").alias("n_words"),
            F.round("_ml", 4).alias("mean_word_len"),
            F.round("_af", 4).alias("alpha_word_frac"),
            F.round("_sf", 4).alias("symbol_frac"),
            reasons.alias("reasons"),
            (reasons == "").alias("keep"),
        )
    )


def ngram_contamination(
    df: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
) -> DataFrame:
    """Benchmark DECONTAMINATION: per training document, the fraction of its
    distinct token ``n``-grams that also occur anywhere in an evaluation/
    benchmark corpus — the standard n-gram-overlap contamination check run
    before LLM training (GPT-3 used 13-gram overlap; n is a parameter).
    Output: (id, n_distinct_ngrams, n_contaminated, contamination_frac,
    flagged).

    Scale shape: the benchmark side reduces to DISTINCT n-grams — tiny
    relative to a 100 TB corpus, so Spark broadcasts it and the whole check
    is scan + map-side explode + broadcast-hash semi-probe + one groupBy on
    the doc id. The broadcast is NOT forced: the size decision is left to
    autoBroadcastJoinThreshold/AQE, so a benchmark corpus that outgrows the
    driver genuinely degrades to a shuffle join keyed on the gram instead
    of OOMing on a forced hint. Grams are joined as strings for
    engine-agnostic oracles; at petabyte scale hash them first (xxhash64)
    to shrink the exchanged key — same plan, narrower rows.
    """
    bench_grams = (
        benchmark.select(_norm_tokens(bench_text_col or text_col)
                         .alias("_toks"))
        .select(F.explode(_token_ngrams(F.col("_toks"), n)).alias("g"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    doc_grams = df.select(
        F.col(id_col), _norm_tokens(text_col).alias("_toks")
    ).select(
        F.col(id_col),
        F.array_distinct(_token_ngrams(F.col("_toks"), n)).alias("gs"),
    ).select(
        id_col,
        F.size("gs").alias("n_distinct_ngrams"),
        F.explode_outer("gs").alias("g"),  # keep docs shorter than n tokens
    )
    frac = F.col("n_contaminated") / F.col("n_distinct_ngrams")
    return (
        doc_grams.join(bench_grams, "g", "left")
        .groupBy(id_col, "n_distinct_ngrams")
        .agg(F.count("__hit").alias("n_contaminated"))
        .select(
            F.col(id_col),
            "n_distinct_ngrams",
            "n_contaminated",
            F.round(F.when(F.col("n_distinct_ngrams") == 0, F.lit(0.0))
                    .otherwise(frac), 6).alias("contamination_frac"),
            (F.col("n_contaminated") > 0).alias("flagged"),
        )
    )
