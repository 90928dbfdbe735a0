"""Text-analysis operators over a documents table: token counting,
quality scoring, language identification, document fingerprinting.

All pure Catalyst expressions (JVM-side regex / array ops; no Python in
the hot path), so they scale linearly with the scan and stay inside
whole-stage codegen. Ratios are single exact divisions and score
formulas fixed expression trees, so the DuckDB oracle reproduces every
double bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import char_shingles, hash60, tokens

# BPE-ish pre-tokenization: letter runs, digit runs, single punctuation.
# Same pattern compiles identically under Java regex and RE2 (DuckDB).
BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

PUNCT_PATTERN = "[.,;:!?]"

# Tiny per-language stopword lexicons for the n-gram/stopword heuristic.
# Deterministic tie-break: first language in this order wins ties.
LANG_LEXICONS: list[tuple[str, list[str]]] = [
    ("en", ["the", "and", "of", "to", "in", "is"]),
    ("es", ["el", "la", "de", "que", "y", "los"]),
    ("de", ["der", "die", "und", "das", "ist", "nicht"]),
    ("fr", ["le", "les", "et", "des", "un", "est"]),
]

STOPWORDS_EN = LANG_LEXICONS[0][1]


def _count_matches(col, pattern: str):
    return F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0))).cast(
        "bigint"
    )


def lang_pattern(words: list[str]) -> str:
    return r"\b(" + "|".join(words) + r")\b"


def token_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens_ws, n_tokens_bpe): whitespace tokens and a
    BPE-style pre-tokenization count (letters/digits/punct runs).
    """
    return docs.select(
        "doc_id",
        F.size(tokens("text")).cast("bigint").alias("n_tokens_ws"),
        _count_matches(F.col("text"), BPE_PATTERN).alias("n_tokens_bpe"),
    )


CHUNK_TOKENS = 64
CHUNK_STEP = 48  # 16-token overlap between consecutive chunks


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = CHUNK_TOKENS,
    step: int = CHUNK_STEP,
) -> DataFrame:
    """Split each document into overlapping token windows — the
    tokenize/chunk step that precedes training-sequence packing:
    ``(doc_id, chunk_id, chunk_start, n_chunk_tokens, chunk_hash)``.

    Pure per-row work: tokenize once, `posexplode` a `sequence` of
    window starts, slice the token array per window. Zero shuffles at
    any corpus size — chunking at 100 TB is exactly a scan. The chunk
    content is carried as its md5 (dedupable key) rather than the text
    to keep the output narrow; callers wanting text join back on
    (doc_id, chunk_start).
    """
    ws = tokens("text")
    n = F.size(ws)
    starts = F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(step))
    return (
        docs.select(
            "doc_id",
            ws.alias("ws"),
            F.posexplode(starts).alias("chunk_id", "chunk_start"),
        )
        .select(
            "doc_id",
            F.col("chunk_id").cast("bigint").alias("chunk_id"),
            F.col("chunk_start").cast("bigint").alias("chunk_start"),
            F.size(F.slice("ws", F.col("chunk_start"), chunk_tokens))
            .cast("bigint")
            .alias("n_chunk_tokens"),
            F.md5(
                F.array_join(
                    F.slice("ws", F.col("chunk_start"), chunk_tokens), " "
                )
            ).alias("chunk_hash"),
        )
    )


def chunk_dedup(
    docs: DataFrame,
    chunk_tokens: int = CHUNK_TOKENS,
    step: int = CHUNK_STEP,
    min_docs: int = 2,
) -> DataFrame:
    """Repeated-passage discovery: token-window chunks whose content
    recurs across >= ``min_docs`` distinct documents — the chunk-level
    form of exact substring dedup (Lee et al., "Deduplicating Training
    Data Makes Language Models Better": repeated spans are memorized
    disproportionately; a production pipeline drops or down-weights
    them before packing training sequences).

    Returns ``(chunk_hash, n_docs, n_occurrences, canonical_doc)``.

    Physical shape: :func:`chunk_documents` is a pure scan (zero
    shuffles); the aggregation shuffles twice (the two-phase
    count-distinct: (chunk_hash, doc_id) occurrence dedup, then the
    per-digest counts) — both keyed on the 128-bit digest, never the
    text, so the shuffle payload is ~48 bytes/chunk at any corpus
    size. Pinned by ``tests/test_plans.py``.
    """
    ch = chunk_documents(docs, chunk_tokens, step)
    return (
        ch.groupBy("chunk_hash")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_occurrences"),
            F.min("doc_id").alias("canonical_doc"),
        )
        .where(F.col("n_docs") >= min_docs)
    )


def doc_repetition(docs: DataFrame, n: int = 3) -> DataFrame:
    """Within-document repetition scoring: the fraction of word
    ``n``-grams that are repeats of an earlier gram in the SAME document
    (Gopher/Rae et al.'s duplicate-n-gram quality signal — looping or
    template-stuffed text scores high and is filtered before training).

    ``rep_ratio = (total - distinct) / total`` over exact integer
    counts, so the oracle reproduces the double bitwise. Entirely
    per-row array expressions — zero shuffles, scan-linear; the gram
    set never leaves its row.

    Returns ``(doc_id, n_grams, n_distinct_grams, rep_ratio)``.
    """
    from ..functions.text import word_shingles

    grams = word_shingles("text", n)
    total = F.size(grams).cast("bigint")
    distinct = F.size(F.array_distinct(grams)).cast("bigint")
    return docs.select(
        "doc_id",
        total.alias("n_grams"),
        distinct.alias("n_distinct_grams"),
        ((total - distinct) / total).alias("rep_ratio"),
    )


SEQ_LEN = 512


def pack_sequences(
    docs: DataFrame, seq_len: int = SEQ_LEN, group: str = "lang"
) -> DataFrame:
    """Training-sequence packing by concatenation: documents are laid
    end-to-end per ``group`` in deterministic (doc_id) order and cut
    into fixed ``seq_len``-token sequences; each document's pack is
    where its first token lands (``tokens-before div seq_len``) — the
    standard concat-then-split packing a pre-training dataloader
    performs, computed engine-side so the pack manifest ships with the
    data. Returns the per-pack manifest
    ``(group, pack_id, n_docs, n_tokens, first_doc)``.

    Physical shape: one window shuffle on ``group`` for the running
    token count (explicit ROWS frame, total order), one aggregate on
    ``(group, pack_id)``. No skew risk beyond group cardinality —
    production would sub-salt a giant language by date/shard, which
    composes with the same two-stage shape.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(group)
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sized = docs.select(
        group, "doc_id", F.size(tokens("text")).cast("bigint").alias("n_tokens")
    )
    # Integer `div`, not a double divide+cast: the running token count
    # at 100 TB exceeds 2^53 and double division would misplace packs.
    packed = sized.withColumn(
        "cum_before", F.sum("n_tokens").over(w) - F.col("n_tokens")
    ).withColumn("pack_id", F.expr(f"cum_before div {seq_len}"))
    return packed.groupBy(group, "pack_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.min("doc_id").alias("first_doc"),
    )


TOKEN_BUDGET = 2000


def token_budget_sample(
    docs: DataFrame, budget: int = TOKEN_BUDGET, group: str = "lang"
) -> DataFrame:
    """Greedy quality-ranked token-budget selection per ``group``: rank
    documents by quality score (descending, doc_id tie-break), admit
    each while the tokens BEFORE it total under ``budget`` — how a
    training mix fills a per-language token quota with the best
    documents first. Deterministic (no RNG), so the selected set is
    reproducible across runs and engines.

    Returns ``(group, doc_id, n_tokens, cum_tokens, quality_score)``
    for admitted documents. One window shuffle on ``group``; the
    feature projection rides the scan. An explicit ROWS frame keeps the
    running sum peer-row-independent (the ordering is total anyway —
    doc_id breaks ties).
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(group)
        .orderBy(F.col("quality_score").desc(), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    scored = docs.select(
        group,
        "doc_id",
        F.size(tokens("text")).cast("bigint").alias("n_tokens"),
        quality_score_expr().alias("quality_score"),
    )
    return (
        scored.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .where(F.col("cum_tokens") - F.col("n_tokens") < budget)
        .select(group, "doc_id", "n_tokens", "cum_tokens", "quality_score")
    )


def quality_band_filter(
    docs: DataFrame,
    lo: float = 0.1,
    hi: float = 0.9,
    group: str = "lang",
) -> DataFrame:
    """Keep documents inside the [lo, hi] quality percentile band per
    ``group`` — the two-sided quantile prune (drop the bottom tail as
    garbage AND the top tail as boilerplate/templated text, whose
    "perfect" scores usually mean degenerate repetition). percent_rank
    = (rank-1)/(n-1) with a total ordering (doc_id tie-break), so band
    membership is exact and engine-reproducible — no approximate
    quantile sketch divergence.

    Returns ``(group, doc_id, quality_score, pr)``. One window shuffle.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group).orderBy(
        F.col("quality_score").asc(), F.col("doc_id")
    )
    scored = docs.select(
        group, "doc_id", quality_score_expr().alias("quality_score")
    )
    return (
        scored.withColumn("pr", F.percent_rank().over(w))
        .where((F.col("pr") >= lo) & (F.col("pr") <= hi))
    )


def quality_score_expr() -> "F.Column":
    """The composite quality score as a reusable expression over `text`."""
    ws = tokens("text")
    n_chars = F.length("text").cast("bigint")
    n_words = F.size(ws).cast("bigint")
    punct = _count_matches(F.col("text"), PUNCT_PATTERN)
    stop = _count_matches(F.col("text"), lang_pattern(STOPWORDS_EN))
    punct_ratio = punct / n_chars
    stop_ratio = stop / n_words
    return (
        F.lit(0.4) * F.least(stop_ratio * 4, F.lit(1.0))
        + F.lit(0.3) * F.least(n_words.cast("double") / 100.0, F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - F.least(punct_ratio * 10, F.lit(1.0)))
    )


def text_quality(docs: DataFrame) -> DataFrame:
    """Heuristic quality features + a composite score per document."""
    ws = tokens("text")
    n_chars = F.length("text").cast("bigint")
    n_words = F.size(ws).cast("bigint")
    punct = _count_matches(F.col("text"), PUNCT_PATTERN)
    stop = _count_matches(F.col("text"), lang_pattern(STOPWORDS_EN))
    avg_word_len = (n_chars - (n_words - 1)) / n_words  # chars net of single spaces
    punct_ratio = punct / n_chars
    stop_ratio = stop / n_words
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        avg_word_len.alias("avg_word_len"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        quality_score_expr().alias("quality_score"),
    )


def lang_pred_expr() -> "F.Column":
    """Language prediction as a reusable expression over `text`:
    stopword-lexicon scores with deterministic tie-breaking (first
    language in LANG_LEXICONS order wins); all-zero -> 'und'."""
    scores = {
        lang: _count_matches(F.lower(F.col("text")), lang_pattern(words))
        for lang, words in LANG_LEXICONS
    }
    best = F.greatest(*scores.values())
    pred = F.when(best == 0, F.lit("und"))
    for lang, _ in LANG_LEXICONS:
        pred = pred.when(scores[lang] == best, F.lit(lang))
    return pred


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-lexicon language ID with deterministic tie-breaking.

    Scores = per-language stopword hit counts; the CASE cascade picks
    the first language (in LANG_LEXICONS order) whose score equals the
    maximum; all-zero scores -> 'und' (undetermined).
    """
    scores = {
        lang: _count_matches(F.lower(F.col("text")), lang_pattern(words))
        for lang, words in LANG_LEXICONS
    }
    return docs.select(
        "doc_id",
        *[scores[lang].alias(f"score_{lang}") for lang, _ in LANG_LEXICONS],
        lang_pred_expr().alias("lang_pred"),
    )


def doc_fingerprint(docs: DataFrame, k: int = 8, bottom: int = 4) -> DataFrame:
    """Bottom-k sketch fingerprint: the ``bottom`` smallest 60-bit hashes
    of the document's distinct char k-gram shingles — a compact,
    order-stable signature for containment/near-dup screening
    (winnowing-style document fingerprinting).

    Output is flat (doc_id, fp_rank, fp_hash) for hash-stable comparison.

    Entirely array-native per row (distinct → hash → sort → slice inside
    one projection): zero shuffles, zero row explosion — the shingle
    blow-up never leaves the expression, so the operator scales with the
    scan alone. (The first cut exploded to rows and ranked with a
    window; that shuffled |text| rows per document for a 4-row answer.)
    """
    fp = F.slice(
        F.array_sort(
            F.transform(
                F.array_distinct(char_shingles("text", k)),
                lambda g: hash60(g),
            )
        ),
        1,
        bottom,
    )
    return docs.select("doc_id", F.posexplode(fp)).select(
        "doc_id",
        (F.col("pos") + 1).cast("bigint").alias("fp_rank"),
        F.col("col").alias("fp_hash"),
    )


def substring_duplicates(
    docs: DataFrame,
    k: int = 8,
    bottom: int = 4,
    min_shared: int = 2,
    max_df: int | None = None,
) -> DataFrame:
    """Document pairs sharing >= ``min_shared`` bottom-k fingerprint
    hashes (:func:`doc_fingerprint`) — a winnowing-style substring-
    overlap screen: two documents that share long literal runs share
    char-k-gram minima with high probability.

    Physical shape: the fingerprint index is BOUNDED at ``bottom`` rows
    per document (the bottom-k sketch, not the full shingle set), so
    the self equi-join on fp_hash shuffles O(bottom·N) rows and scales
    out on the hash key. Hot fingerprints (boilerplate runs shared by
    d docs) would still emit O(d²) join output, so the index is
    df-capped first (``dedup.df_capped``): fingerprints occurring in
    more than ``max_df`` documents are dropped, exactly like a stop-
    word list — measured 118 s → bounded on a 10x corpus replica where
    the uncapped join blew up. Default ``dedup.DEFAULT_MAX_DF`` (1000).
    """
    from .dedup import DEFAULT_MAX_DF, df_capped

    if max_df is None:
        max_df = DEFAULT_MAX_DF
    fp = doc_fingerprint(docs, k, bottom).select("doc_id", "fp_hash")
    fp = df_capped(fp, "fp_hash", max_df)
    a = fp.select(F.col("doc_id").alias("a"), "fp_hash")
    b = fp.select(F.col("doc_id").alias("b"), "fp_hash")
    return (
        a.join(b, "fp_hash")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


DECON_NGRAM = 8


def decontaminate(
    train: DataFrame,
    eval_docs: DataFrame,
    n: int = DECON_NGRAM,
    max_df: int | None = None,
) -> DataFrame:
    """Train/eval contamination screen: training documents that share at
    least one word ``n``-gram with any held-out evaluation document —
    the standard benchmark-decontamination pass (GPT-3 appx. C /
    PaLM-style 8-gram overlap) run before a training corpus ships.

    Returns ``(doc_id, n_shared_grams, n_eval_docs)`` for contaminated
    TRAIN docs: how many distinct n-grams leak and how many eval docs
    they touch.

    Physical shape: both sides reduce to distinct (doc, gram-hash) pairs
    per-row (``array_distinct`` inside the projection — no explode
    shuffle), the eval index is df-capped (a gram appearing in more than
    ``max_df`` eval docs is boilerplate, not contamination signal — and
    an uncapped hot gram makes the join output quadratic), and the
    match is one equi-join on the 60-bit gram hash. The eval side is
    typically orders of magnitude smaller than train, so AQE converts
    the join to broadcast at runtime when it fits; the declared plan
    stays a shuffle equi-join so a large eval set cannot OOM the build
    side. 8-grams (vs the 3-gram near-dup shingles) keep incidental
    phrase overlap out of the index entirely.
    """
    from .dedup import DEFAULT_MAX_DF, df_capped

    from ..functions.text import hash60, word_shingles

    if max_df is None:
        max_df = DEFAULT_MAX_DF

    def grams(df: DataFrame, id_alias: str) -> DataFrame:
        return df.select(
            F.col("doc_id").alias(id_alias),
            F.explode(
                F.array_distinct(
                    F.transform(word_shingles("text", n), lambda g: hash60(g))
                )
            ).alias("g"),
        )

    ev = df_capped(grams(eval_docs, "eval_id"), "g", max_df)
    return (
        grams(train, "doc_id")
        .join(ev, "g")
        .groupBy("doc_id")
        .agg(
            F.count_distinct("g").alias("n_shared_grams"),
            F.count_distinct("eval_id").alias("n_eval_docs"),
        )
    )


# PII patterns (name, regex, replacement). Patterns avoid backrefs /
# lookarounds so Java regex (Spark) and RE2 (DuckDB) compile them
# identically; redaction applies them in list order.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b555-[0-9]{4}\b", "<PHONE>"),
    ("ip", r"\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b", "<IP>"),
]


def pii_redact(docs: DataFrame) -> DataFrame:
    """Per-document PII scrub: counts and redacts emails, phone
    numbers, and IPv4 addresses in one projection — a standard
    pre-training privacy pass. Pure Catalyst regex (scan-linear, zero
    shuffles); counts are taken on the original text, then patterns
    replace in order.
    """
    redacted = F.col("text")
    counts = []
    for name, pat, token in PII_PATTERNS:
        counts.append(_count_matches(F.col("text"), pat).alias(f"n_{name}s"))
        redacted = F.regexp_replace(redacted, pat, token)
    return docs.select("doc_id", *counts, redacted.alias("redacted"))


def ngram_topk(docs: DataFrame, n: int = 2, k: int = 5) -> DataFrame:
    """Top-k most frequent word n-grams per language — the corpus-
    statistics pass used for boilerplate discovery and contamination
    screens. One explode + one count aggregate + one top-k window, all
    shuffle-partitioned by language/gram (scales out; the gram-count
    aggregate is map-side combined). Ties break deterministically on
    the gram string."""
    from pyspark.sql import Window

    from ..functions.text import word_shingles

    counts = (
        docs.select("lang", F.explode(word_shingles("text", n)).alias("gram"))
        .groupBy("lang", "gram")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("cnt").desc(), F.col("gram"))
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
    )


def stratified_sample(docs: DataFrame) -> DataFrame:
    """Deterministic stratified sampling: English documents kept at
    1/2, every other language at 1/4, decided by a seeded 60-bit hash
    of the document key — reproducible across runs and engines (no RNG
    state), and a pure scan-side filter (zero shuffles, pushdown-
    friendly), unlike ``df.sample`` whose seed is partition-layout
    dependent."""
    h = hash60(F.col("doc_id").cast("string"), seed="sample")
    keep = F.when(F.col("lang") == "en", h % 2 == 0).otherwise(h % 4 == 0)
    return docs.where(keep).select("doc_id", "lang")


def curate_corpus(
    docs: DataFrame, min_quality: float = 0.5, language: str = "en"
) -> DataFrame:
    """End-to-end corpus curation in ONE scan + ONE shuffle: language
    filter, quality threshold, and exact-duplicate canonicalization
    (keep the smallest doc_id of each byte-identical group) — the
    standard pre-training data cleaning pass, composed from the same
    expressions the individual operators use.

    All features (token count, quality score, language) are computed in
    a single projection; the only shuffle is the ``min(doc_id) OVER
    (PARTITION BY md5(text))`` canonical window. Returns
    ``(doc_id, n_tokens, quality_score)`` for kept documents.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(F.md5("text"))
    annotated = docs.select(
        "doc_id",
        F.size(tokens("text")).cast("bigint").alias("n_tokens"),
        quality_score_expr().alias("quality_score"),
        lang_pred_expr().alias("lang_pred"),
        F.min("doc_id").over(w).alias("canonical_id"),
    )
    return annotated.where(
        (F.col("doc_id") == F.col("canonical_id"))
        & (F.col("lang_pred") == language)
        & (F.col("quality_score") >= min_quality)
    ).select("doc_id", "n_tokens", "quality_score")


def bigram_novelty(docs: DataFrame) -> DataFrame:
    """Corpus-frequency n-gram language-model scoring, integer-exact.

    The classic LM-based quality signal (KenLM-style perplexity scoring
    a la CCNet/Gopher) needs log-probabilities, whose libm rounding
    differs across engines; this operator keeps the *signal* — "is this
    document made of common or of never-seen-again word sequences?" —
    in exact integer arithmetic so every value is reproducible
    bit-for-bit anywhere:

    * ``avg_gram_freq`` — mean corpus frequency of the document's word
      bigram occurrences (high = boilerplate-like, low = novel), one
      exact ``sum(bigint)/count`` division;
    * ``rare_ratio`` — fraction of the document's bigram occurrences
      whose corpus frequency is 1 (hapax bigrams: high = unique prose
      or noise), again a single exact division.

    Physical shape: one explode + map-side-combined count aggregate
    builds the corpus bigram frequency table, then one equi-join of
    gram occurrences against it and a per-document re-aggregate — two
    key-partitioned shuffles, both scale-out; no broadcast of the
    (corpus-sized) frequency table, and hot boilerplate grams are
    AQE-skew-join territory, same shape as :func:`decontaminate`.
    Documents shorter than 2 words shingle to the whole text
    (``word_shingles`` contract), so no document drops out.
    """
    from ..cache import materialize
    from ..functions.text import word_shingles

    # Materialized: the gram relation feeds BOTH the frequency rollup
    # and the scoring join — the same shared-subplan shape as
    # tfidf_top_terms' tf relation (Spark does not share uncached
    # subplans; without this the tokenize+shingle+explode scan runs
    # twice).
    grams = materialize(
        docs.select(
            "doc_id", F.explode(word_shingles("text", 2)).alias("gram")
        )
    )
    freq = grams.groupBy("gram").agg(F.count("*").alias("freq"))
    return (
        grams.join(freq, "gram")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum("freq").alias("freq_sum"),
            F.sum(F.when(F.col("freq") == 1, 1).otherwise(0)).alias("n_rare"),
        )
        .select(
            "doc_id",
            "n_grams",
            (F.col("freq_sum") / F.col("n_grams")).alias("avg_gram_freq"),
            (F.col("n_rare") / F.col("n_grams")).alias("rare_ratio"),
        )
    )


def domain_mixture(
    docs: DataFrame, budget_docs: int = 100_000
) -> DataFrame:
    """Temperature-scaled source-mixture weights for training-data
    sampling (the multi-corpus mixing step of every LLM data pipeline:
    upweight small high-quality sources, damp the giant crawl).

    Weight of source d with n_d documents is ``sqrt(n_d)`` normalized
    over sources — temperature alpha = 1/2, chosen because IEEE-754
    ``sqrt`` is correctly rounded on every engine (an ``n^0.7``-style
    ``pow`` is not, and a 1-ulp divergence would break cross-engine
    reproducibility). The rounded 1e6-scaled weight numerators are
    BIGINTs, so the normalization denominator is an exact integer sum
    (order-independent) and ``expected_docs`` is exact integer
    arithmetic end-to-end.

    One groupBy(source) aggregate (map-side combined) over the scan; the
    unpartitioned normalization window moves only one tiny row per
    source — cardinality = #corpora, not #documents.
    """
    from pyspark.sql import Window

    per_source = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(tokens("text"))).cast("bigint").alias("total_tokens"),
    )
    w_num = F.round(F.sqrt(F.col("n_docs")) * 1_000_000).cast("bigint")
    denom = F.sum("w_num").over(Window.partitionBy())
    return (
        per_source.withColumn("w_num", w_num)
        .select(
            "source",
            "n_docs",
            "total_tokens",
            (F.col("w_num") / denom).alias("weight"),
            F.floor(F.lit(budget_docs) * F.col("w_num") / denom)
            .cast("bigint")
            .alias("expected_docs"),
        )
    )


def assign_shards(docs: DataFrame, n_shards: int = 20) -> DataFrame:
    """Deterministic global shuffle + sharding for training output: the
    final step that turns a curated corpus into N equal-ish shard files
    in a reproducible pseudo-random read order.

    Each document hashes to a shard (seeded 60-bit hash, so the
    assignment is stable across runs, engines, and partition layouts —
    unlike ``repartition``'s internal hash) and gets a within-shard
    position by hash order (hash ties broken by doc_id). Writing with
    ``partitionBy(shard) sortWithinPartitions(pos)`` then streams each
    shard in training order. The only wide operation is the per-shard
    ranking window, partitioned on the shard key — shards are the
    parallel unit, so the sort scales out with shard count; no global
    sort, no driver state.
    """
    from pyspark.sql import Window

    h = hash60(F.col("doc_id").cast("string"), seed="shard")
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return (
        docs.select("doc_id", h.alias("h"))
        .withColumn("shard", F.pmod(F.col("h"), F.lit(n_shards)).cast("int"))
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .select("doc_id", "shard", "pos")
    )


def tfidf_top_terms(docs: DataFrame, k: int = 3) -> DataFrame:
    """Per-document top-k salient terms by TF-IDF — the keyword /
    topic-signal extraction step of a corpus-analysis pipeline (and the
    classic sparse-retrieval doc representation).

    Weighting: ``tf × (n_docs / df)`` — LINEAR inverse document
    frequency rather than the textbook ``log(n_docs/df)``. Rationale:
    ``tf * n_docs`` is exact integer arithmetic and the single IEEE-754
    division by ``df`` is correctly rounded identically on every
    engine, whereas ``ln`` is only ~1-ulp accurate and java.lang.Math
    vs libm may disagree in the last bit — a value-hash-exact oracle
    cannot be built on it. For a fixed tf both weightings are strictly
    decreasing in df; across terms the linear form weights rarity more
    aggressively (a deliberate variant, not an approximation).

    Shape at scale (100 TB): tokenize+explode is map-side; (doc, term)
    tf is one hash aggregation; term-level df REUSES the tf relation
    (one row per (doc, term), so ``count(*)`` per term IS the document
    frequency) — partial aggregation absorbs stopword skew map-side
    before the term shuffle. The corpus size joins in as a broadcast
    1-row relation, df joins back on the term equi-key (AQE handles
    stopword-key skew), and the final top-k is a per-document
    row_number window partitioned on doc_id — the parallel unit is the
    document, no global sort.
    """
    from pyspark.sql import Window

    from ..cache import materialize

    terms = docs.select(
        "doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("term")
    )
    # The tf relation feeds BOTH the score join and the df rollup;
    # Spark does not share uncached subplans, so without materializing
    # it the tokenize+explode+aggregate runs twice. Measured on the 10x
    # replica (warm, interleaved A/B): 4.5 s -> 1.9 s materialized.
    tf = materialize(
        terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df_, "term")
        .join(F.broadcast(n))
        .withColumn(
            "score",
            (F.col("tf") * F.col("n_docs")).cast("double") / F.col("df"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rnk") <= k)
        .select("doc_id", "term", "tf", "df", "score", "rnk")
    )


def corpus_drift(docs: DataFrame, k: int = 20) -> DataFrame:
    """Token-distribution drift between two corpus cohorts — the
    distribution-shift diagnostic run between crawl snapshots, data
    sources, or pipeline versions before blessing a new training mix.

    Cohorts here are the deterministic halves ``doc_id % 2`` (stand-in
    for snapshot A/B); the divergence score per token is the exact
    integer cross product ``|cnt_a·nb − cnt_b·na|`` — zero iff the
    token's relative frequency is identical in both cohorts, and
    scale-invariant in the same way as comparing the two ratios
    ``cnt/n`` without ever leaving integer arithmetic (so the oracle is
    value-hash exact; a float ratio diff would not be). Top-k most
    divergent tokens, ties to the lexically smaller token.

    Shape at scale: one exploded token aggregation (partial combine
    absorbs stopword skew map-side), a broadcast 1-row totals join, and
    a distributed TakeOrderedAndProject top-k — no global sort. The
    BIGINT cross product bounds exact use at ~3·10⁹ tokens per cohort
    (past that, run per shard/day slice — which is also the analysis
    you want — or accept one float rounding per side).
    """
    from pyspark.sql import Window

    toks = docs.select(
        (F.col("doc_id") % 2 == 0).alias("in_a"),
        F.explode(tokens(F.lower(F.col("text")))).alias("term"),
    )
    counts = toks.groupBy("term").agg(
        F.sum(F.when(F.col("in_a"), 1).otherwise(0)).alias("cnt_a"),
        F.sum(F.when(~F.col("in_a"), 1).otherwise(0)).alias("cnt_b"),
    )
    # Overflow guard (round-5 advice): the cross product is exact only
    # while na·nb fits BIGINT (cnt ≤ n, so na,nb < ~3e9 suffices); past
    # the bound fail loudly instead of ranking wrapped garbage.
    _DRIFT_EXACT_MAX = 3_000_000_000

    def _guarded(c: str):
        return F.when(
            F.col(c) < F.lit(_DRIFT_EXACT_MAX), F.col(c)
        ).otherwise(
            F.raise_error(
                F.lit(
                    f"corpus_drift: cohort token count {c} exceeds the "
                    "exact BIGINT cross-product bound (~3e9); run per-"
                    "shard/day slices (docstring) instead"
                )
            )
        )

    tot = counts.agg(
        F.sum("cnt_a").alias("na"), F.sum("cnt_b").alias("nb")
    ).select(_guarded("na").alias("na"), _guarded("nb").alias("nb"))
    scored = counts.join(F.broadcast(tot)).withColumn(
        "score",
        F.abs(
            F.col("cnt_a") * F.col("nb") - F.col("cnt_b") * F.col("na")
        ),
    )
    w = Window.orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.orderBy(F.col("score").desc(), "term")
        .limit(k)
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .select("term", "cnt_a", "cnt_b", "score", "rank")
    )


BOILER_TOKENS = 16  # non-overlapping window width (tokens)
BOILER_MIN_DOCS = 3  # window content in >= this many docs is boilerplate


def _doc_spans(docs: DataFrame, window: int = BOILER_TOKENS) -> DataFrame:
    """(doc_id, win_id, wtext, wtok, whash): each document's
    NON-overlapping ``window``-token spans — the span unit of the
    boilerplate family. Pure per-row scan (posexplode of a sequence,
    zero shuffles, streaming-safe); a token-less document yields one
    empty span so every input doc stays represented."""
    ws = tokens("text")
    n = F.size(ws)
    starts = F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(window))
    return (
        docs.select(
            "doc_id",
            ws.alias("ws"),
            F.posexplode(starts).alias("win_id", "start"),
        )
        .select(
            "doc_id",
            F.col("win_id").cast("bigint").alias("win_id"),
            F.array_join(
                F.slice("ws", F.col("start"), window), " "
            ).alias("wtext"),
            F.size(F.slice("ws", F.col("start"), window))
            .cast("bigint")
            .alias("wtok"),
        )
        .withColumn("whash", F.md5(F.col("wtext")))
    )


def boilerplate_index(
    docs_indexed: DataFrame,
    window: int = BOILER_TOKENS,
    min_docs: int = BOILER_MIN_DOCS,
) -> DataFrame:
    """(whash): distinct span digests whose content recurs in >=
    ``min_docs`` distinct documents of the INDEXED corpus — the static
    boilerplate index :func:`boilerplate_screen` (and its streaming
    twin) probes. One digest-keyed aggregation; ~36-byte rows.

    Zero-token spans are EXCLUDED (round-9 advice): `_doc_spans` emits
    one empty span per token-less document so screens can count every
    input doc, but md5('') in the INDEX would brand every future empty
    doc "boilerplate" — an artifact of representation, not recurrence
    of content."""
    return (
        _doc_spans(docs_indexed, window)
        .where(F.col("wtok") > 0)
        .groupBy("whash")
        .agg(F.count_distinct("doc_id").alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
        .select("whash")
    )


def boilerplate_screen(
    docs_incoming: DataFrame,
    index: DataFrame,
    window: int = BOILER_TOKENS,
) -> DataFrame:
    """Boilerplate SCREEN for continuous ingest: incoming documents'
    spans probe a static span-digest ``index``
    (:func:`boilerplate_index`, built once from the existing corpus) —
    the ingest-side analogue of :func:`boilerplate_removal`, which
    recomputes document frequencies over the whole corpus. Returns
    per-incoming-doc counts
    ``(doc_id, n_spans, n_boiler_spans, n_tokens, n_boiler_tokens)``
    — the decide-before-you-pay numbers an ingest pipeline thresholds
    on. ONE aggregation after a stream-static equi-join, so the same
    plan runs under Structured Streaming unchanged (the registered
    streaming twin shares this code and the batch oracle)."""
    sp = _doc_spans(docs_incoming, window)
    hit = index.withColumn("hit", F.lit(1))
    return (
        sp.join(hit, "whash", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_spans"),
            F.sum(F.when(F.col("hit").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_boiler_spans"),
            F.sum("wtok").alias("n_tokens"),
            F.sum(
                F.when(F.col("hit").isNotNull(), F.col("wtok")).otherwise(0)
            )
            .cast("bigint")
            .alias("n_boiler_tokens"),
        )
    )


def boilerplate_removal(
    docs: DataFrame,
    window: int = BOILER_TOKENS,
    min_docs: int = BOILER_MIN_DOCS,
) -> DataFrame:
    """Cross-document boilerplate REMOVAL (CCNet / Wenzek et al.: hash
    every paragraph, drop the ones repeated across documents; C4 did
    the same at three-sentence spans): each document splits into
    NON-overlapping ``window``-token spans, a span whose exact content
    recurs in >= ``min_docs`` distinct documents is boilerplate, and
    the document is REBUILT from its surviving spans — the output is a
    cleaned corpus, not a report (the transform `chunk_dedup` only
    diagnoses). Whitespace is token-normalized by the rebuild.

    Returns ``(doc_id, n_tokens, n_kept_tokens, clean_text)`` — every
    input document appears, fully-boilerplate documents with
    ``n_kept_tokens = 0`` and ``clean_text = ''``.

    Shape at scale (100 TB): span split is a pure scan (posexplode of
    a sequence, zero shuffles); the document-frequency aggregate and
    the anti-join both key on the 128-bit span digest (~48-byte shuffle
    rows, never text); the rebuild is one per-document aggregation.
    Nothing is broadcast and no stage touches pairs — DF-based removal
    is linear where pairwise dedup is quadratic, which is why CCNet
    runs it FIRST in the pipeline.
    """
    spans = _doc_spans(docs, window)
    common = (
        spans.groupBy("whash")
        .agg(F.count_distinct("doc_id").alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
        .select("whash")
    )
    kept = spans.join(common, "whash", "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.sum("wtok").alias("n_kept_tokens"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("win_id", "wtext"))),
                lambda s: s["wtext"],
            ),
            " ",
        ).alias("clean_text"),
    )
    return (
        docs.select(
            "doc_id",
            F.size(tokens("text")).cast("bigint").alias("n_tokens"),
        )
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("n_kept_tokens"), F.lit(0))
            .cast("bigint")
            .alias("n_kept_tokens"),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        )
    )


DSIR_BUCKETS = 1024  # hashed-feature dimensionality


def dsir_weights(
    docs: DataFrame,
    target,
    buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al., "Data Selection for
    Language Models via Importance Resampling"): score every raw
    document by how much its hashed-unigram profile looks like a small
    TARGET corpus relative to the raw pool — the standard recipe for
    tilting a web-scale crawl toward a quality domain before sampling.
    ``target`` is a boolean Column selecting the target slice.

    Departure from the paper, for engine-exact parity: the per-bucket
    weight is the LIKELIHOOD RATIO ``p_target(b) / p_raw(b)`` (one
    correctly-rounded IEEE division of exact integer products) rather
    than its logarithm, and the document score is the count-weighted
    SUM of ratios rather than of log-ratios — ``ln`` is only ~1-ulp
    accurate and differs between java.lang.Math and libm, so a
    value-hash-exact oracle cannot be built on it (same stance as
    `tfidf_top_terms`'s linear idf). Both Laplace-smoothed:
    ``p(b) = (c_b + 1) / (total + buckets)``. Monotonicity per bucket
    is identical; the ranking tilts the same way.

    Returns ``(doc_id, n_tokens, dsir_weight)``; token-less documents
    carry weight 0.

    Shape at scale: tokenize+explode is map-side; per-(doc, bucket)
    counts are one hash aggregation; bucket-level raw/target counts
    REUSE that relation (two ``buckets``-row aggregates — broadcast);
    the final score is one per-document fold over its own buckets,
    sorted-fold pinned (`kmeans._sorted_fold`) so the double sum is
    order-deterministic under any partitioning.
    """
    from .kmeans import _sorted_fold

    toks = docs.select(
        "doc_id",
        target.alias("is_target"),
        F.explode(tokens(F.lower(F.col("text")))).alias("term"),
    ).select(
        "doc_id",
        "is_target",
        F.pmod(hash60(F.col("term"), seed="dsir"), F.lit(buckets)).alias(
            "bucket"
        ),
    )
    doc_counts = toks.groupBy("doc_id", "is_target", "bucket").agg(
        F.count("*").alias("c")
    )
    raw = doc_counts.groupBy("bucket").agg(F.sum("c").alias("rc"))
    tgt = (
        doc_counts.where("is_target")
        .groupBy("bucket")
        .agg(F.sum("c").alias("tc"))
    )
    totals = doc_counts.agg(
        F.sum("c").alias("R"),
        F.sum(F.when(F.col("is_target"), F.col("c")).otherwise(0)).alias(
            "T"
        ),
    )
    ratios = (
        raw.join(tgt, "bucket", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            (
                (
                    (F.coalesce(F.col("tc"), F.lit(0)) + 1)
                    * (F.col("R") + buckets)
                ).cast("double")
                / (
                    (F.col("rc") + 1) * (F.col("T") + buckets)
                ).cast("double")
            ).alias("r"),
        )
    )
    scored = (
        doc_counts.join(F.broadcast(ratios), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            _sorted_fold(
                F.collect_list(
                    F.struct(
                        "bucket",
                        (F.col("c").cast("double") * F.col("r")).alias(
                            "val"
                        ),
                    )
                ),
                "val",
            ).alias("dsir_weight"),
        )
    )
    return (
        docs.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_tokens"), F.lit(0))
            .cast("bigint")
            .alias("n_tokens"),
            F.coalesce(F.col("dsir_weight"), F.lit(0.0)).alias(
                "dsir_weight"
            ),
        )
    )


def dsir_bucket_ratios(
    docs_indexed: DataFrame,
    target,
    buckets: int = DSIR_BUCKETS,
) -> "tuple[DataFrame, DataFrame]":
    """The STATIC half of ingest-time DSIR scoring: likelihood-ratio
    table ``(bucket, r)`` learned once from the indexed corpus (same
    Laplace-smoothed ratio form as :func:`dsir_weights`), plus a 1-row
    ``(r_default)`` frame — the ratio an unseen bucket takes
    (``tc = rc = 0``). Both bounded (≤ ``buckets`` rows / 1 row) and
    broadcast by every consumer."""
    tk = docs_indexed.select(
        target.alias("is_target"),
        F.explode(tokens(F.lower(F.col("text")))).alias("term"),
    ).select(
        "is_target",
        F.pmod(hash60(F.col("term"), seed="dsir"), F.lit(buckets)).alias(
            "bucket"
        ),
    )
    bc = tk.groupBy("bucket").agg(
        F.count("*").alias("rc"),
        F.sum(F.when(F.col("is_target"), 1).otherwise(0))
        .cast("bigint")
        .alias("tc"),
    )
    totals = bc.agg(
        F.sum("rc").alias("r_total"), F.sum("tc").alias("t_total")
    )
    ratios = bc.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            ((F.col("tc") + 1) * (F.col("r_total") + buckets)).cast(
                "double"
            )
            / ((F.col("rc") + 1) * (F.col("t_total") + buckets)).cast(
                "double"
            )
        ).alias("r"),
    )
    default = totals.select(
        (
            (F.col("r_total") + buckets).cast("double")
            / (F.col("t_total") + buckets).cast("double")
        ).alias("r_default")
    )
    return ratios, default


def dsir_score(
    docs_incoming: DataFrame,
    ratios: DataFrame,
    default: DataFrame,
    buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """Score INCOMING documents against a static DSIR ratio table
    (:func:`dsir_bucket_ratios`) — the ingest-side analogue of
    :func:`dsir_weights`, which learns ratios over the whole corpus.
    Returns ``(doc_id, n_tokens, dsir_score)``.

    The sum is TOKEN-level (one ratio lookup per token, folded in
    token-position order) rather than bucket-count-level: a per-bucket
    count needs a second aggregation, and Structured Streaming allows
    only one — this shape runs unchanged as the registered streaming
    twin, and the position-ordered fold keeps the double sum
    order-deterministic on both engines. Only documents with ≥ 1 token
    appear (raw corpus has none without)."""
    from .kmeans import _sorted_fold

    toks = docs_incoming.select(
        "doc_id",
        F.posexplode(tokens(F.lower(F.col("text")))).alias("pos", "term"),
    ).select(
        "doc_id",
        F.col("pos").cast("bigint").alias("pos"),
        F.pmod(hash60(F.col("term"), seed="dsir"), F.lit(buckets)).alias(
            "bucket"
        ),
    )
    scored = (
        toks.join(F.broadcast(ratios), "bucket", "left")
        .crossJoin(F.broadcast(default))
        .select(
            "doc_id",
            "pos",
            F.coalesce(F.col("r"), F.col("r_default")).alias("r"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_tokens"),
        _sorted_fold(
            F.collect_list(F.struct("pos", "r")), "r"
        ).alias("dsir_score"),
    )


# ------------------------------------------------------------- BM25
# Fixed deterministic keyword panel for the registered `bm25_search`
# query — terms drawn from the synthetic corpus vocabulary so every
# query matches documents. A literal panel (not a derived frame) keeps
# the Spark plan and the DuckDB oracle trivially identical.
BM25_PANEL: list[tuple[int, str]] = [
    (1, "spark"),
    (1, "join"),
    (2, "window"),
    (2, "filter"),
    (2, "sort"),
    (3, "customer"),
    (3, "order"),
    (4, "hash"),
    (4, "merge"),
    (4, "stream"),
]
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 10


def bm25_search(
    docs: DataFrame,
    queries: DataFrame,
    topk: int = BM25_TOPK,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Keyword retrieval over the corpus — BM25-shaped scoring of an
    inverted index, the search capability that sits NEXT TO the
    similarity family (ANN answers "documents like this vector"; this
    answers "documents matching these terms"). ``queries`` carries
    ``(query_id, term)`` rows; output is the per-query top-``topk``
    ``(query_id, doc_id, rank, n_terms_hit, score)``, rank by
    (score desc, doc_id asc).

    SCORING — BM25's tf-saturation and length normalization with a
    RATIONAL idf, ``(N - df + 0.5) / (df + 0.5)``, i.e. the classic
    Robertson-Spärck-Jones idf minus the ``ln``: `ln` is only ~1-ulp
    and java.lang.Math vs libm diverge in the last bit (the same
    stance as tfidf's linear idf and DSIR's ratio form), while the
    rational form is one correctly-rounded division of two exactly-
    representable halves — bit-reproducible across engines. Ranking
    WITHIN a term is unchanged (the map is monotone); across terms
    rare terms weigh relatively more than under the log — documented,
    deliberate. Every other float in the score is a fixed expression
    tree of correctly-rounded ops over exact integers
    (tf, dl, N, Σdl), and the per-(query, doc) sum folds in term
    order (`kmeans._sorted_fold`), so scores hash identically on both
    engines.

    SCALE SHAPE (round 14, guide §2.3/§2.4 — the :func:`bm25_route`
    projection shape, now on the search direction too): per-(doc,
    term) tf is a stateless ARRAY-COUNT PROJECTION over the doc's own
    token array after a broadcast join against the tiny distinct-term
    panel (``size(toks) − size(array_remove(toks, term))``), with
    ``dl = size(toks)`` riding the same row — so the previous
    inverted-index form's two full-corpus explode shuffles (~dl rows
    per doc, executed once for tf and AGAIN for dl, and re-executed
    per plan reference — four explode passes total) are gone
    entirely. The corpus scalars (N, Σdl) are one bounded aggregation
    over the per-row sizes; df is a per-term count over the
    tf-positive projection (partial-aggregated, |panel| groups);
    scoring joins only broadcasts; top-k is a window partitioned by
    query_id — per-query work, never a corpus sort. tf/dl/df are
    exactly the explode form's integers (tokens() drops empties, so
    ``size`` ≡ exploded-row count and zero-token docs are absent from
    both), and the score fold is unchanged — value-hash identical.
    """
    from pyspark.sql import Window

    from .kmeans import _sorted_fold

    k1p1 = k1 + 1.0
    one_minus_b = 1.0 - b

    toked = docs.select(
        "doc_id", tokens("text").alias("toks")
    ).withColumn("dl", F.size("toks").cast("bigint"))
    # Docs with zero tokens never enter the explode form's dl relation;
    # keep the same membership here.
    toked = toked.where(F.col("dl") > 0)
    # ONE corpus pass (round 15, guide §2.3): the r14 shape tokenized
    # the corpus TWICE — once into the materialized tf relation, once
    # more when the (n_docs, Σdl) stats broadcast was built from its
    # own `toked` subtree. The single materialized relation now
    # carries BOTH: per doc one null-term marker row (dl only — the
    # stats side) plus the tf-positive panel postings, produced by one
    # explode of a ≤(|panel|+1)-entry array per row. Values are
    # unchanged: stats aggregates exact integers over exactly the
    # dl>0 docs (order-insensitive bigint sums), postings are the
    # same (doc, term, dl, tf) integers. The per-term count rides a
    # `transform` over the broadcast 1-row terms array — the lambda
    # var feeds `array_remove` as a plain argument (the bm25_route
    # pushdown-resolution finding: no filter-lambda over an outer
    # JOIN column), and equality vs the panel-join form is pinned by
    # the oracle and `test_bm25_one_pass_relation_matches_two_pass`.
    terms_arr = (
        queries.select("term")
        .dropDuplicates()
        .groupBy()
        .agg(F.collect_list("term").alias("_terms"))
    )
    entries = F.concat(
        F.array(
            F.struct(
                F.lit(None).cast("string").alias("term"),
                F.lit(None).cast("bigint").alias("tf"),
            )
        ),
        F.filter(
            F.transform(
                F.col("_terms"),
                lambda t: F.struct(
                    t.alias("term"),
                    (
                        F.size("toks")
                        - F.size(F.array_remove(F.col("toks"), t))
                    )
                    .cast("bigint")
                    .alias("tf"),
                ),
            ),
            lambda s: s["tf"] > 0,
        ),
    )
    from ..cache import materialize

    rel = materialize(
        toked.crossJoin(F.broadcast(terms_arr))
        .select("doc_id", "dl", F.explode(entries).alias("e"))
        .select(
            "doc_id",
            "dl",
            F.col("e.term").alias("term"),
            F.col("e.tf").alias("tf"),
        )
    )
    stats = rel.where(F.col("term").isNull()).agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("total_tokens"),
    )
    tf = rel.where(F.col("term").isNotNull())
    # (doc_id, term) is unique in tf, so df is a plain count.
    df_rel = tf.groupBy("term").agg(
        F.count("*").cast("bigint").alias("df")
    )
    idf = ((F.col("n_docs") - F.col("df")) + F.lit(0.5)) / (
        F.col("df") + F.lit(0.5)
    )
    tfnorm = (F.col("tf") * F.lit(k1p1)) / (
        F.col("tf")
        + (
            F.lit(k1)
            * (
                F.lit(one_minus_b)
                + (
                    (F.lit(b) * F.col("dl"))
                    / (F.col("total_tokens") / F.col("n_docs"))
                )
            )
        )
    )
    scored = (
        tf.join(F.broadcast(df_rel), "term")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "term", (idf * tfnorm).alias("s"))
    )
    per = (
        F.broadcast(queries)
        .join(scored, "term")
        .groupBy("query_id", "doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_terms_hit"),
            _sorted_fold(
                F.collect_list(F.struct("term", "s")), "s"
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        per.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= topk)
        .select("query_id", "doc_id", "rank", "n_terms_hit", "score")
    )


def bm25_index_stats(
    docs_index: DataFrame, terms: DataFrame
) -> "tuple[DataFrame, DataFrame]":
    """The static half of BM25-at-ingest (:func:`bm25_route`): from the
    INDEXED corpus, the 1-row scalar frame ``(n_docs, total_tokens)``
    and the per-panel-term document frequencies ``(term, df)``. Built
    once; every incoming batch/stream joins these as broadcast
    relations — the percolation service's precomputed background
    statistics.

    Projection shape (round 14, guide §2.3 — the `bm25_search`
    restructure): ``dl = size(tokens(text))`` per row (identical to
    the exploded-row count; zero-token docs absent from both), so the
    scalar frame is one bounded aggregation with no explode shuffle;
    df counts docs whose token array CONTAINS the panel term —
    exactly ``count_distinct(doc_id)`` over the old inverted-index
    join, as a broadcast join + |panel|-group partial-aggregated
    count."""
    toked = docs_index.select(
        "doc_id", tokens("text").alias("toks")
    ).withColumn("dl", F.size("toks").cast("bigint"))
    toked = toked.where(F.col("dl") > 0)
    # ONE indexed-corpus pass (round 15, guide §2.3 — the bm25_search
    # one-pass shape): consumers embed BOTH returned frames, so the
    # r14 form tokenized the indexed half once for the stats broadcast
    # and again for the df broadcast. One materialized relation now
    # carries a null-term marker per doc (the stats side) plus one row
    # per (doc, matched panel term); stats sums exact integers, df
    # counts rows per term — value-identical to the membership join.
    from ..cache import materialize

    terms_arr = (
        terms.select("term")
        .dropDuplicates()
        .groupBy()
        .agg(F.collect_list("term").alias("_terms"))
    )
    matched = F.concat(
        F.array(F.lit(None).cast("string")),
        F.filter(
            F.col("_terms"),
            lambda t: F.array_contains(F.col("toks"), t),
        ),
    )
    rel = materialize(
        toked.crossJoin(F.broadcast(terms_arr)).select(
            "doc_id", "dl", F.explode(matched).alias("term")
        )
    )
    stats = rel.where(F.col("term").isNull()).agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("total_tokens"),
    )
    df_rel = (
        rel.where(F.col("term").isNotNull())
        .groupBy("term")
        .agg(F.count("*").cast("bigint").alias("df"))
    )
    return stats, df_rel


def bm25_route(
    docs_incoming: DataFrame,
    queries: DataFrame,
    stats: DataFrame,
    df_rel: DataFrame,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Route INCOMING documents against STANDING keyword queries — the
    percolation/alerting direction of :func:`bm25_search` (there: query
    arrives, corpus is indexed; here: queries stand, documents arrive —
    the shape a crawl pipeline uses to tag incoming docs by topic).
    Returns ``(doc_id, query_id, n_terms_hit, score)`` for every
    incoming doc matching >= 1 of a query's terms.

    SINGLE-AGGREGATION SHAPE (the `dsir_score` discipline): per-term
    tf comes from a stateless array-filter PROJECTION over the doc's
    own token array (``size(filter(toks, t -> t = term))``) after a
    1-key broadcast join against the tiny panel — never a
    (doc, term) aggregation, which would be a second agg upstream and
    ILLEGAL under Structured Streaming. The one aggregation is the
    per-(doc, query) term-ordered score fold, so this exact code runs
    as the registered streaming twin. Corpus statistics (N, Σdl, df)
    come from the static index side (:func:`bm25_index_stats`) —
    incoming docs are scored against the BACKGROUND corpus, their own
    text contributing only tf and dl. A panel term absent from the
    index takes df = 0 (maximum-rarity idf (N+0.5)/0.5 — still one
    exact division). Score expression tree and fold order are
    byte-identical to :func:`bm25_search`'s."""
    from .kmeans import _sorted_fold

    k1p1 = k1 + 1.0
    one_minus_b = 1.0 - b
    panel = (
        queries.join(df_rel, "term", "left")
        # one-row aggregate, but hint it like every sibling stats site
        # (VERDICT r12): a future stats-relation change must not be
        # able to plan a shuffled BNL here.
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "term",
            F.coalesce(F.col("df"), F.lit(0)).alias("df"),
            "n_docs",
            "total_tokens",
        )
    )
    per_term = (
        docs_incoming.select(
            "doc_id",
            tokens("text").alias("toks"),
            F.lit(1).alias("one"),
        )
        .join(F.broadcast(panel.withColumn("one", F.lit(1))), "one")
        .select(
            "doc_id",
            "query_id",
            "term",
            "df",
            "n_docs",
            "total_tokens",
            # tf = occurrences of `term` in the doc's token array.
            # NOT a filter-lambda with an outer column reference —
            # Catalyst's projection collapse pushes the lambda below
            # the panel join and fails resolution at runtime
            # (ATTRIBUTE_NOT_FOUND on `term`); array_remove takes the
            # column as a plain argument and survives pushdown.
            (
                F.size("toks")
                - F.size(F.array_remove(F.col("toks"), F.col("term")))
            )
            .cast("bigint")
            .alias("tf"),
            F.size("toks").cast("bigint").alias("dl"),
        )
        .where(F.col("tf") > 0)
    )
    idf = ((F.col("n_docs") - F.col("df")) + F.lit(0.5)) / (
        F.col("df") + F.lit(0.5)
    )
    tfnorm = (F.col("tf") * F.lit(k1p1)) / (
        F.col("tf")
        + (
            F.lit(k1)
            * (
                F.lit(one_minus_b)
                + (
                    (F.lit(b) * F.col("dl"))
                    / (F.col("total_tokens") / F.col("n_docs"))
                )
            )
        )
    )
    scored = per_term.select(
        "doc_id", "query_id", "term", (idf * tfnorm).alias("s")
    )
    return scored.groupBy("doc_id", "query_id").agg(
        F.count("*").cast("bigint").alias("n_terms_hit"),
        _sorted_fold(F.collect_list(F.struct("term", "s")), "s").alias(
            "score"
        ),
    )


def eval_span_index(
    docs_eval: DataFrame, window: int = BOILER_TOKENS
) -> DataFrame:
    """(whash): distinct digests of every OVERLAPPING ``window``-token
    span of the EVAL corpus — the index :func:`decontaminate_scrub`
    probes. Overlapping (stride 1) on the eval side so a train span
    matches at ANY alignment within an eval document; the eval corpus
    is small by assumption (that is what makes it an eval set), so the
    ~|tokens| spans per eval doc are cheap. Documents shorter than
    ``window`` contribute their whole text as one span; TOKEN-LESS
    eval documents contribute nothing (round-9 advice: md5('') in the
    index would flag every empty train doc as "contaminated")."""
    ws = tokens("text")
    n = F.size(ws)
    starts = F.sequence(
        F.lit(1), F.greatest(n - window + 1, F.lit(1)), F.lit(1)
    )
    return (
        docs_eval.where(F.size(tokens("text")) > 0)
        .select(
            ws.alias("ws"), F.explode(starts).alias("start")
        )
        .select(
            F.md5(
                F.array_join(F.slice("ws", F.col("start"), window), " ")
            ).alias("whash")
        )
        .dropDuplicates()
    )


def decontaminate_scrub(
    docs_train: DataFrame,
    docs_eval: DataFrame,
    window: int = BOILER_TOKENS,
) -> DataFrame:
    """SURGICAL decontamination — remove the contaminated SPANS and
    keep the document, where `decontaminate`/`decontaminate_fuzzy`/
    `decontaminate_semantic` only DETECT: each train document splits
    into non-overlapping ``window``-token spans (`_doc_spans` — the
    boilerplate-removal span unit), a span whose exact content occurs
    ANYWHERE in the eval corpus (any alignment — the eval side indexes
    overlapping spans, :func:`eval_span_index`) is dropped, and the
    document is REBUILT from its surviving spans. The fix a pipeline
    applies when dropping whole documents would cost too much data —
    the span-removal counterpart of C4/CCNet-style boilerplate
    removal, pointed across corpora.

    Returns ``(doc_id, n_tokens, n_kept_tokens, clean_text)`` for
    every train document (fully-contaminated docs keep
    ``n_kept_tokens = 0``). Caveat, documented: a train document's
    TRAILING span can be shorter than ``window`` and then matches only
    a short eval document's whole-text span — scrub at the span
    granularity, not a guarantee of zero residual n-gram overlap
    (`decontaminate` measures what remains).

    Scale shape: train side is the linear `_doc_spans` scan + one
    digest left join + ONE per-doc rebuild aggregation — no anti-join
    followed by a back-join to re-admit fully-contaminated docs: the
    hit FLAG rides into the fold instead, so every doc is represented
    by its own span rows (non-overlapping spans partition the tokens,
    so Σ wtok IS n_tokens) and the whole operator is a
    single-aggregation plan that runs unchanged under Structured
    Streaming (`streaming.windows.streaming_decontaminate_scrub` — the
    scrub-at-ingest twin). The eval index is |eval tokens| digest
    rows, distinct-ed once — nothing pairwise, nothing broadcast by
    construction (AQE broadcasts the index exactly when it is
    small)."""
    idx = eval_span_index(docs_eval, window).withColumn("hit", F.lit(1))
    spans = _doc_spans(docs_train, window)
    flagged = spans.join(idx, "whash", "left").select(
        "doc_id",
        "win_id",
        "wtext",
        "wtok",
        F.col("hit").isNotNull().alias("contaminated"),
    )
    return flagged.groupBy("doc_id").agg(
        F.sum("wtok").cast("bigint").alias("n_tokens"),
        F.sum(F.when(F.col("contaminated"), 0).otherwise(F.col("wtok")))
        .cast("bigint")
        .alias("n_kept_tokens"),
        F.array_join(
            F.transform(
                F.filter(
                    F.array_sort(
                        F.collect_list(
                            F.struct("win_id", "contaminated", "wtext")
                        )
                    ),
                    lambda s: ~s["contaminated"],
                ),
                lambda s: s["wtext"],
            ),
            " ",
        ).alias("clean_text"),
    )


# Sentence regex shared with the DuckDB oracle: runs of non-terminators
# plus an optional trailing terminator. No lookarounds (RE2-safe), so
# Java regex and DuckDB's RE2 tokenize identically.
SENTENCE_PATTERN = "[^.!?]+[.!?]?"
SENT_MIN_DOCS = 2  # a sentence in >= this many docs is removed


def _doc_sentences(docs: DataFrame) -> DataFrame:
    """(doc_id, sent_id, stext, stok): each document's sentences in
    order — trimmed, empty ones dropped. Pure per-row scan (regex
    extract + posexplode), zero shuffles at any corpus size."""
    sents = F.regexp_extract_all(
        F.col("text"), F.lit(SENTENCE_PATTERN), F.lit(0)
    )
    return (
        docs.select(
            "doc_id", F.posexplode(sents).alias("sent_id", "raw")
        )
        .select(
            "doc_id",
            F.col("sent_id").cast("bigint").alias("sent_id"),
            F.trim(F.col("raw")).alias("stext"),
        )
        .where(F.col("stext") != "")
        .withColumn("stok", F.size(tokens(F.col("stext"))).cast("bigint"))
    )


def sentence_dedup(
    docs: DataFrame, min_docs: int = SENT_MIN_DOCS
) -> DataFrame:
    """C4-style cross-document SENTENCE dedup (Raffel et al. C4 §2.2
    removed any three-sentence span occurring more than once; CCNet
    does the same at paragraph granularity — `boilerplate_removal` is
    the fixed-token-window sibling): a sentence whose exact trimmed
    content appears in >= ``min_docs`` DISTINCT documents is dropped,
    and every document is REBUILT from its surviving sentences in
    order. Returns ``(doc_id, n_sentences, n_kept_sentences,
    clean_text)`` for every input document (fully-boilerplate docs keep
    ``n_kept_sentences = 0`` and ``clean_text = ''``).

    Scale shape, same as the boilerplate family: sentence split is a
    pure scan; document frequency keys on the 128-bit sentence digest
    (~48-byte shuffle rows, never text); the drop decision rides into
    ONE per-document rebuild aggregation as a flag (no anti-join +
    back-join) — linear end-to-end where pairwise dedup is quadratic.
    """
    sp = _doc_sentences(docs).withColumn("shash", F.md5("stext"))
    common = (
        sp.groupBy("shash")
        .agg(F.count_distinct("doc_id").alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
        .select("shash")
        .withColumn("drop", F.lit(True))
    )
    flagged = sp.join(common, "shash", "left").withColumn(
        "dropped", F.coalesce(F.col("drop"), F.lit(False))
    )
    rebuilt = flagged.groupBy("doc_id").agg(
        F.count("*").alias("n_sentences"),
        F.sum(F.when(F.col("dropped"), 0).otherwise(1))
        .cast("bigint")
        .alias("n_kept_sentences"),
        F.array_join(
            F.transform(
                F.filter(
                    F.array_sort(
                        F.collect_list(
                            F.struct("sent_id", "dropped", "stext")
                        )
                    ),
                    lambda s: ~s["dropped"],
                ),
                lambda s: s["stext"],
            ),
            " ",
        ).alias("clean_text"),
    )
    return (
        docs.select("doc_id")
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_sentences"), F.lit(0))
            .cast("bigint")
            .alias("n_sentences"),
            F.coalesce(F.col("n_kept_sentences"), F.lit(0))
            .cast("bigint")
            .alias("n_kept_sentences"),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        )
    )


QC_WEIGHT_MOD = 2001  # weights span [-1000, 1000]


def quality_classifier(docs: DataFrame) -> DataFrame:
    """Deterministic hashed LINEAR quality scorer — the engine's
    bit-reproducible stand-in for a fastText-style model-scored
    quality filter (the real deployment swaps the hash-derived weight
    for a learned one; the Spark-side shape — per-token weight lookup
    folded per document — is identical): each lower-cased token maps to
    an integer weight ``hash60(tok) % 2001 - 1000``, a document's raw
    score is the exact bigint SUM of its token weights (order-free, so
    the identical expression runs under Structured Streaming), and the
    per-token mean is ONE final IEEE division.

    Pure per-row projection — tokenize, transform, aggregate inside the
    row — so it costs a scan with ZERO shuffles at any corpus size and
    whole-stage-codegens alongside the other per-row quality signals.
    Returns ``(doc_id, n_tokens, score_sum, quality_lr)`` for every
    document (token-less docs score 0.0)."""
    ws = tokens("text")
    weight = lambda t: (
        hash60(F.lower(t), seed="qcw") % QC_WEIGHT_MOD - 1000
    )
    ssum = F.aggregate(
        F.transform(ws, weight), F.lit(0).cast("bigint"), lambda a, x: a + x
    )
    n = F.size(ws).cast("bigint")
    return docs.select(
        "doc_id",
        n.alias("n_tokens"),
        ssum.alias("score_sum"),
        F.when(n > 0, ssum.cast("double") / n)
        .otherwise(F.lit(0.0))
        .alias("quality_lr"),
    )


# Learned-classifier config (quality_classifier_learned family).
QCL_TRAIN_MOD = 4  # deterministic training split: doc_id % 4 == 0
QCL_LABEL_THRESHOLD = 0.5  # quality_score_expr band boundary
QCL_RATIO_SCALE = 1_000_000  # ratio features as exact parts-per-million


def quality_label_expr() -> "F.Column":
    """0/1 training label from the existing heuristic band: 1 iff the
    composite :func:`quality_score_expr` clears the threshold. Both
    engines evaluate the identical IEEE expression (the proven
    `_DUCK_QUALITY_EXPR` twin), so the boundary comparison is
    bit-reproducible."""
    return (quality_score_expr() >= QCL_LABEL_THRESHOLD).cast("int")


def _quality_lda_features(docs: DataFrame) -> DataFrame:
    """(doc_id, label, f1, f2, f3): EXACT-INTEGER per-doc features for
    the learned classifier — the raw signals the heuristic band is
    built from, as parts-per-million ratios (integer division of
    nonneg ints truncates identically on both engines):
    f1 = stopword hits per million tokens, f2 = token count,
    f3 = punctuation per million chars. Integer features keep every
    TRAINING aggregate an order-free bigint sum (a double sum's value
    depends on partial-aggregation order — the reason money sums here
    accumulate in DECIMAL)."""
    ws = tokens("text")
    n_words = F.size(ws).cast("bigint")
    stop = _count_matches(F.col("text"), lang_pattern(STOPWORDS_EN))
    punct = _count_matches(F.col("text"), PUNCT_PATTERN)
    return docs.select(
        "doc_id",
        quality_label_expr().alias("label"),
        (F.lit(QCL_RATIO_SCALE) * stop).cast("bigint").alias("_s"),
        n_words.alias("f2"),
        (F.lit(QCL_RATIO_SCALE) * punct).cast("bigint").alias("_p"),
        F.length("text").cast("bigint").alias("_c"),
    ).select(
        "doc_id",
        "label",
        F.expr("_s div f2").alias("f1"),
        "f2",
        F.expr("_p div _c").alias("f3"),
    )


def quality_classifier_model(docs: DataFrame) -> DataFrame:
    """ONE-row LEARNED linear model (w1..w3, m1..m3) — the
    hash-stand-in → learned upgrade path `kmeans_embeddings` took for
    IVF (VERDICT r9 item 4), in CLOSED FORM so training is a single
    aggregation pass, no gradient loop.

    Model: diagonal linear discriminant (Fisher LDA with a diagonal
    pooled covariance — Hastie, Tibshirani & Friedman, ESL §4.3;
    "diagonal LDA" is the standard closed-form high-dimensional
    variant): per feature ``w_i = (μ1_i − μ0_i) / (σ_i² + 1)`` and
    midpoint ``m_i = (μ1_i + μ0_i)/2``; a document is positive iff
    ``Σ_i w_i·(f_i − m_i) > 0``. The +1 regularizer bounds w when a
    feature degenerates.

    Determinism: training reads only the ``doc_id % QCL_TRAIN_MOD ==
    0`` split with labels from the heuristic band
    (:func:`quality_label_expr`); every aggregate is an ORDER-FREE
    bigint sum over the exact integer features, and μ/σ²/w/m are fixed
    scalar expression trees over those sums — bit-identical across
    engines, so the held-out confusion matrix
    (:func:`quality_classifier_agreement`) is value-hash-stable.
    Measured on the held-out split: agreement 0.96–0.98 vs a 0.56–0.58
    majority base rate (sf0.001–0.1)."""
    feat = _quality_lda_features(docs).where(
        F.col("doc_id") % QCL_TRAIN_MOD == 0
    )
    lab = F.col("label")
    st = feat.agg(
        F.sum(lab).cast("bigint").alias("n1"),
        F.sum(F.lit(1) - lab).cast("bigint").alias("n0"),
        F.count("*").cast("bigint").alias("n"),
        *[
            e
            for i in (1, 2, 3)
            for e in (
                F.sum(lab * F.col(f"f{i}")).cast("bigint").alias(f"s1f{i}"),
                F.sum((F.lit(1) - lab) * F.col(f"f{i}"))
                .cast("bigint")
                .alias(f"s0f{i}"),
                F.sum(F.col(f"f{i}")).cast("bigint").alias(f"sf{i}"),
                F.sum(F.col(f"f{i}") * F.col(f"f{i}"))
                .cast("bigint")
                .alias(f"qf{i}"),
            )
        ],
    )

    def w(i):
        mu1 = F.col(f"s1f{i}") / F.col("n1")
        mu0 = F.col(f"s0f{i}") / F.col("n0")
        mean = F.col(f"sf{i}") / F.col("n")
        var = F.col(f"qf{i}") / F.col("n") - mean * mean
        return ((mu1 - mu0) / (var + F.lit(1.0))).alias(f"w{i}")

    def m(i):
        mu1 = F.col(f"s1f{i}") / F.col("n1")
        mu0 = F.col(f"s0f{i}") / F.col("n0")
        return ((mu1 + mu0) / F.lit(2)).alias(f"m{i}")

    return st.select(w(1), w(2), w(3), m(1), m(2), m(3))


def quality_classifier_learned(
    docs_score: DataFrame, model: DataFrame
) -> DataFrame:
    """Score documents with the LEARNED one-row ``model``
    (:func:`quality_classifier_model`): a pure per-row projection after
    a broadcast single-row cross join — NO shuffle, NO aggregation, so
    the identical plan runs append-mode under Structured Streaming
    (the registered streaming twin shares this code and the batch
    oracle). The score ``w1·(f1−m1) + w2·(f2−m2) + w3·(f3−m3)`` is one
    fixed-order double expression (engine-identical);
    ``predicted_good`` is its sign. Output ``(doc_id, f1, f2, f3,
    score, predicted_good)``."""
    feat = _quality_lda_features(docs_score).select(
        "doc_id", "f1", "f2", "f3"
    )
    score = (
        F.col("w1") * (F.col("f1") - F.col("m1"))
        + F.col("w2") * (F.col("f2") - F.col("m2"))
        + F.col("w3") * (F.col("f3") - F.col("m3"))
    )
    return feat.crossJoin(F.broadcast(model)).select(
        "doc_id",
        "f1",
        "f2",
        "f3",
        score.alias("score"),
        (score > 0).alias("predicted_good"),
    )


def quality_classifier_agreement(
    docs: DataFrame, model: DataFrame
) -> DataFrame:
    """Held-out agreement diagnostic for the learned classifier — the
    self-measuring row every learned structure in this repo ships
    (`pq_recall` / `minhash_recall` discipline): on the documents the
    training pass never saw (``doc_id % QCL_TRAIN_MOD != 0``), compare
    the classifier's sign prediction against the heuristic band label
    it was distilled from. Output is the exact confusion matrix
    ``(label, predicted, n)`` — ≤4 bigint rows, from which agreement /
    precision / recall are one division each."""
    held = docs.where(F.col("doc_id") % QCL_TRAIN_MOD != 0)
    scored = quality_classifier_learned(held, model).select(
        "doc_id", "predicted_good"
    )
    lab = held.select("doc_id", quality_label_expr().alias("label"))
    return (
        lab.join(scored, "doc_id")
        .groupBy(
            "label",
            F.col("predicted_good").cast("int").alias("predicted"),
        )
        .agg(F.count("*").cast("bigint").alias("n"))
    )


def sentence_index(
    docs_indexed: DataFrame, min_docs: int = SENT_MIN_DOCS
) -> DataFrame:
    """(shash): distinct digests of sentences recurring in >=
    ``min_docs`` distinct documents of the INDEXED corpus — the static
    index :func:`sentence_screen` (and its streaming twin) probes; the
    sentence-granularity sibling of :func:`boilerplate_index`. One
    digest-keyed aggregation; ~36-byte rows."""
    return (
        _doc_sentences(docs_indexed)
        .groupBy(F.md5("stext").alias("shash"))
        .agg(F.count_distinct("doc_id").alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
        .select("shash")
    )


def sentence_screen(docs_incoming: DataFrame, index: DataFrame) -> DataFrame:
    """Sentence-boilerplate SCREEN for continuous ingest: incoming
    documents' sentences probe a static digest ``index``
    (:func:`sentence_index`, built once from the existing corpus).
    Returns per-incoming-doc counts ``(doc_id, n_sentences,
    n_boiler_sentences, n_tokens, n_boiler_tokens)`` — the
    decide-before-you-pay numbers an ingest pipeline thresholds on.
    ONE aggregation after a stream-static equi-join, so the identical
    plan runs under Structured Streaming (the registered streaming
    twin shares this code and the batch oracle). Token-less incoming
    docs emit no sentences and so no row — the screen prices text, and
    a no-text doc has nothing to screen."""
    sp = _doc_sentences(docs_incoming).withColumn("shash", F.md5("stext"))
    hit = index.withColumn("hit", F.lit(1))
    return (
        sp.join(hit, "shash", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_sentences"),
            F.sum(F.when(F.col("hit").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_boiler_sentences"),
            F.sum("stok").alias("n_tokens"),
            F.sum(
                F.when(F.col("hit").isNotNull(), F.col("stok")).otherwise(0)
            )
            .cast("bigint")
            .alias("n_boiler_tokens"),
        )
    )
