"""Text-analysis operators for large-scale training-data pipelines.

All Catalyst-native (split/regexp/aggregate higher-order functions) — no
Python UDFs, so the whole pipeline stays inside whole-stage codegen and
scales linearly with executors. Designed for the ``documents`` table
(doc_id, text, lang, source, n_chars) but column names are parameters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from d2b_dataframework_spark.datapipe import cache
from d2b_dataframework_spark.functions.strings import normalize_whitespace

# Tiny per-language stopword marker sets for the n-gram/stopword heuristic
# language scorer. Deliberately small and deterministic.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los"],
    "fr": ["le", "la", "de", "et", "un", "les", "des", "en"],
    "de": ["der", "die", "das", "und", "in", "den", "von", "zu"],
}


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization over normalized text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(normalize_whitespace(F.lower(c)), " ")


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document token counts: total, unique, and mean token length."""
    toks = tokens(text_col)
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
        (
            F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)).cast("double")
            / F.size(toks).cast("double")
        ).alias("mean_token_len"),
    )


def quality_expr(text_col: str | Column = "text") -> Column:
    """The composite 0-1 quality score as a bare Column — the exact
    expression :func:`quality_score` publishes as ``quality``, exposed
    separately so a caller that also derives other per-row columns from
    the same text (token counts, language cells) can compute everything
    in ONE projection instead of joining ``quality_score``'s output back
    to a second scan of the corpus (one tokenize pass, no self-join)."""
    toks = tokens(text_col)
    n_tok = F.size(toks).cast("double")
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS["en"]))).cast("double")
    return F.round(
        F.least(n_tok / F.lit(100.0), F.lit(1.0)) * 0.5
        + F.least(stop_hits / n_tok * 4.0, F.lit(1.0)) * 0.5,
        6,
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features: length, alpha ratio, punctuation ratio,
    digit ratio, stopword ratio (English marker set), plus a composite
    0-1 score. Deterministic; thresholds are the caller's business."""
    c = F.col(text_col)
    n = F.length(c).cast("double")
    toks = tokens(text_col)
    n_tok = F.size(toks).cast("double")
    punct = F.length(F.regexp_replace(c, r"[^.,;:!?]", "")).cast("double")
    digits = F.length(F.regexp_replace(c, r"[^0-9]", "")).cast("double")
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS["en"]))).cast("double")
    return df.select(
        F.col(id_col),
        n.alias("n_chars_measured"),
        F.round(punct / n, 6).alias("punct_ratio"),
        F.round(digits / n, 6).alias("digit_ratio"),
        F.round(stop_hits / n_tok, 6).alias("stopword_ratio"),
        quality_expr(text_col).alias("quality"),
    )


def language_scores(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-marker language scoring: per language, the fraction of
    tokens hitting that language's marker set; ``lang_pred`` is the
    argmax (ties broken by language code order, deterministically)."""
    def _hits(words: list[str]):
        # closure factory — default-arg lambdas are misread as multi-arg HOFs
        return lambda t: t.isin(words)

    toks = tokens(text_col)
    n_tok = F.size(toks).cast("double")
    score_cols = {
        f"score_{lang}": F.round(
            F.size(F.filter(toks, _hits(words))).cast("double") / n_tok, 6
        )
        for lang, words in STOPWORDS.items()
    }
    out = df.select(F.col(id_col), *[v.alias(k) for k, v in score_cols.items()])
    # argmax via greatest + chained when (deterministic order)
    langs = sorted(STOPWORDS)
    best = F.greatest(*[F.col(f"score_{l}") for l in langs])
    pred = F.lit(None).cast("string")
    for lang in reversed(langs):
        pred = F.when(F.col(f"score_{lang}") == best, F.lit(lang)).otherwise(pred)
    return out.withColumn("lang_pred", pred)


def chunk_language_mix(
    df: DataFrame,
    chunk_tokens: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Chunk-level code-switching detector: split each document into
    fixed ``chunk_tokens``-token chunks (map-side sequence+explode, the
    text_chunks shape), score each chunk against every language's
    stopword-marker set, and aggregate per document — how many chunks
    identify as each language, and is the doc MIXED (two or more
    languages each owning a material share of the identifiable chunks)?
    Doc-level language ID (:func:`language_scores`) averages the
    evidence away: a 90% German page with an embedded English paragraph
    still argmaxes German; this operator localizes the minority text,
    which multilingual curation routes differently (translation pairs,
    contamination review) rather than averaging it into the majority.

    A chunk with ZERO marker hits is ``unknown`` (NULL prediction) and
    never votes — the all-scores-zero argmax tie would otherwise
    deterministically mislabel marker-free chunks as the alphabetically
    first language.

    Returns (id, n_chunks, n_known, n_langs, dom_lang, dom_share,
    is_mixed): ``dom_share`` is the dominant language's share of the
    KNOWN chunks (NULL when none are known); ``is_mixed`` is true when
    at least two languages are seen and the dominant share is <= 0.75.

    Scale shape: one explode (linear in chunks), per-chunk scoring is a
    map-side HOF over a bounded chunk array, and the per-doc agg
    shuffles one small row per chunk — no joins at all.
    """
    langs = sorted(STOPWORDS)
    toks = tokens(text_col)
    base = df.select(F.col(id_col), toks.alias("_t")).withColumn(
        "_n", F.size("_t").cast("long")
    )
    step = int(chunk_tokens)
    chunks = base.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(0).cast("long"),
                    F.greatest(F.col("_n") - 1, F.lit(0).cast("long")),
                    F.lit(step).cast("long"),
                ),
                lambda s: F.slice(F.col("_t"), s + 1, step),
            )
        ).alias("_ck"),
    )

    def _hits(words: list[str]):
        return lambda t: t.isin(words)

    hit_cols = {
        lang: F.size(F.filter(F.col("_ck"), _hits(STOPWORDS[lang])))
        for lang in langs
    }
    scored = chunks.select(
        F.col(id_col), *[v.alias(f"_h_{k}") for k, v in hit_cols.items()]
    )
    best = F.greatest(*[F.col(f"_h_{l}") for l in langs])
    pred = F.lit(None).cast("string")
    for lang in reversed(langs):
        pred = F.when(
            (best > 0) & (F.col(f"_h_{lang}") == best), F.lit(lang)
        ).otherwise(pred)
    labeled = scored.withColumn("_pred", pred)
    per_lang = labeled.filter(F.col("_pred").isNotNull()).groupBy(
        id_col, "_pred"
    ).agg(F.count(F.lit(1)).cast("long").alias("_c"))
    votes = per_lang.groupBy(id_col).agg(
        F.sum("_c").cast("long").alias("n_known"),
        F.count(F.lit(1)).cast("long").alias("n_langs"),
        # dominant = max count, tie -> language code order (min struct)
        F.min(
            F.struct((-F.col("_c")).alias("nc"), F.col("_pred").alias("l"))
        ).alias("_b"),
    )
    totals = labeled.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_chunks")
    )
    dom_share = F.round(
        (-F.col("_b.nc")).cast("double") / F.col("n_known").cast("double"), 6
    )
    return (
        totals.join(votes, id_col, "left")
        .select(
            F.col(id_col),
            "n_chunks",
            F.coalesce(F.col("n_known"), F.lit(0)).cast("long").alias("n_known"),
            F.coalesce(F.col("n_langs"), F.lit(0)).cast("long").alias("n_langs"),
            F.col("_b.l").alias("dom_lang"),
            dom_share.alias("dom_share"),
            F.coalesce(
                (F.col("n_langs") >= 2) & (dom_share <= 0.75), F.lit(False)
            ).alias("is_mixed"),
        )
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Canonical document fingerprint: md5 of lowercased,
    whitespace-normalized text. The exact-dedup key."""
    return df.select(
        F.col(id_col),
        F.md5(normalize_whitespace(F.lower(F.col(text_col)))).alias("fingerprint"),
    )


# Portable BPE-ish pre-tokenization pattern: letter runs, digit runs,
# single non-alphanumeric marks - the GPT-2 pre-tokenizer's shape without
# the lookahead constructs (identical semantics in Java regex and RE2, so
# a SQL oracle can replicate it verbatim).
BPE_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def token_bpe_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Subword-ish token counting via regex pre-tokenization: total
    pieces, unique pieces, and chars-per-piece (the compression-ratio
    proxy training pipelines threshold on). Catalyst-native
    (regexp_extract_all), zero Python."""
    norm = normalize_whitespace(F.lower(F.col(text_col)))
    pieces = F.regexp_extract_all(norm, F.lit(BPE_PATTERN), 0)
    return df.select(
        F.col(id_col),
        F.size(pieces).cast("long").alias("n_pieces"),
        F.size(F.array_distinct(pieces)).cast("long").alias("n_unique_pieces"),
        F.round(
            F.length(F.regexp_replace(norm, " ", "")).cast("double")
            / F.size(pieces).cast("double"),
            6,
        ).alias("chars_per_piece"),
    )


def clean_text(col: Column | str, lowercase: bool = True) -> Column:
    """Training-corpus scrub: lowercase, drop HTML tags, URLs, and e-mail
    addresses, collapse whitespace. Patterns use constructs with
    identical semantics in Java regex and RE2 (``\\S``, char classes),
    so a SQL oracle replicates them verbatim. Lowercasing happens FIRST
    so ``Https://`` matches the URL pattern.
    """
    c = F.col(col) if isinstance(col, str) else col
    if lowercase:
        c = F.lower(c)
    c = F.regexp_replace(c, "<[^>]+>", " ")
    c = F.regexp_replace(c, "https?://\\S+", " ")
    c = F.regexp_replace(c, "\\S+@\\S+\\.\\S+", " ")
    return normalize_whitespace(c)


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 50,
    overlap: int = 10,
    clean: bool = True,
) -> DataFrame:
    """Token-window chunking — the doc→training-window split every LLM
    data pipeline runs before tokenizer/packing: overlapping windows of
    ``chunk_size`` tokens advancing by ``chunk_size - overlap``.

    One row per (doc, window): ``doc_id, chunk_id, chunk_text,
    n_tokens``. Fully Catalyst-native (sequence → transform(slice) →
    posexplode), no shuffle at all — chunking is a per-row flatMap, so
    at 100TB it runs at scan speed and partition boundaries are
    preserved. The final window is short (no padding), matching the
    usual keep-the-tail convention.
    """
    if overlap >= chunk_size:
        raise ValueError("overlap must be smaller than chunk_size")
    stride = chunk_size - overlap
    src = clean_text(F.col(text_col)) if clean else normalize_whitespace(F.lower(F.col(text_col)))
    # Tokens staged as a column: the window lambda captures them, and a
    # captured raw-text expression would re-run clean+split per window
    # (interpreted HOF lambdas re-evaluate captures per element).
    toks = F.col("_toks")
    starts = F.sequence(
        F.lit(0), F.greatest(F.size(toks) - 1, F.lit(0)), F.lit(stride)
    )
    return df.select(
        F.col(id_col), F.split(src, " ").alias("_toks")
    ).select(
        F.col(id_col),
        F.posexplode(
            F.transform(starts, lambda s: F.slice(toks, s + 1, chunk_size))
        ).alias("chunk_id", "_ctoks"),
    ).select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.concat_ws(" ", "_ctoks").alias("chunk_text"),
        F.size("_ctoks").cast("long").alias("n_tokens"),
    )


# PII patterns over LOWERCASED text. Dict order = redaction order (emails
# before ipv4/card/phone so their digit runs aren't partially eaten).
# Constructs restricted to the Java-regex ∩ RE2 common subset (char
# classes, bounded quantifiers, \b) — no lookaround, no backrefs — so a
# SQL oracle replicates them verbatim and they run in whole-stage codegen.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}", "<EMAIL>"),
    "ipv4": (r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    "card": (r"\b[0-9]{13,16}\b", "<CARD>"),
    "phone": (r"\+[0-9][0-9() \-]{6,}[0-9]", "<PHONE>"),
}


def redact_pii(col: Column | str) -> Column:
    """Replace every PII match with its ``<TYPE>`` token, in the fixed
    PII_PATTERNS order. Input is lowercased first (patterns are
    lower-only by design)."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.lower(c)
    for pattern, token in PII_PATTERNS.values():
        c = F.regexp_replace(c, pattern, token)
    return c


def pii_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document PII hit counts (one ``n_<type>`` column per pattern,
    counted independently on the raw lowercased text) — the audit table
    a compliance pipeline keeps next to the scrubbed corpus."""
    c = F.lower(F.col(text_col))
    return df.select(
        F.col(id_col),
        *[
            F.regexp_count(c, F.lit(pattern)).cast("long").alias(f"n_{name}")
            for name, (pattern, _) in PII_PATTERNS.items()
        ],
    )


def pii_scrub(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Counts + redacted text in ONE projection (single pass over the
    corpus — at 100 TB you never want the audit and the scrub to be two
    scans). Returns ``id, n_email, n_ipv4, n_card, n_phone, text``
    where ``text`` is the redacted lowercased document."""
    c = F.lower(F.col(text_col))
    return df.select(
        F.col(id_col),
        *[
            F.regexp_count(c, F.lit(pattern)).cast("long").alias(f"n_{name}")
            for name, (pattern, _) in PII_PATTERNS.items()
        ],
        redact_pii(F.col(text_col)).alias(text_col),
    )


def repetition_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signals for corpus quality filtering:
    per document, the duplicate-token ratio, the most-frequent-token
    fraction, and the most-frequent-bigram fraction (high values mark
    boilerplate / machine-generated spam).

    Scale design: explode → ``groupBy(doc, token)`` → ``groupBy(doc)``
    instead of per-row O(L²) higher-order functions. Both aggregations
    get map-side partial combine and whole-stage codegen, so cost is
    linear in corpus size and the shuffle carries (doc, token, count)
    triples — the standard word-count shape that survives 100 TB. The
    two signal tables (token, bigram) join on the doc key they are
    already partitioned by.
    """
    toks = tokens(text_col)
    # Bigrams via zip_with over two shifted slices — a single linear pass
    # per document. (The tempting transform(sequence(1,n-1),
    # i -> element_at(_tk,i) || element_at(_tk,i+1)) is O(L²) per doc:
    # element_at on a variable-length string array re-walks offsets, and
    # it measured 6-8x slower at sf0.1.) Built in a second projection
    # because zip_with lambdas can't reference sibling select aliases.
    n = F.size("_tk")
    base = df.select(F.col(id_col), toks.alias("_tk")).select(
        id_col,
        "_tk",
        F.when(
            n >= 2,
            F.zip_with(
                F.slice("_tk", 1, n - 1),
                F.slice("_tk", 2, n - 1),
                lambda a, b: F.concat_ws(" ", a, b),
            ),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("_bg"),
    )
    # ONE combined wordcount pipeline for both signal families: bigram
    # items are tagged with a leading space (tokens are whitespace-split,
    # so no token can start with one) and both streams share a single
    # explode → groupBy(doc, item) → groupBy(doc) chain. Halves the
    # scans/shuffles of the two-pass version and drops its final join
    # (measured ~1.6x at sf0.1); output values are identical.
    items = F.concat(
        F.col("_tk"), F.transform(F.col("_bg"), lambda b: F.concat(F.lit(" "), b))
    )
    counts = (
        base.select(id_col, F.explode(items).alias("_i"))
        .groupBy(id_col, "_i")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    is_bg = F.col("_i").startswith(" ")
    tok_stats_df = counts.groupBy(id_col).agg(
        F.sum(F.when(is_bg, 0).otherwise(F.col("_c"))).cast("long").alias("n_tokens"),
        F.sum(F.when(is_bg, 0).otherwise(1)).cast("long").alias("_u"),
        F.max(F.when(is_bg, None).otherwise(F.col("_c"))).cast("long").alias("_top"),
        F.max(F.when(is_bg, F.col("_c"))).cast("long").alias("_topbg"),
    )
    n = F.col("n_tokens").cast("double")
    return (
        tok_stats_df
        .select(
            id_col,
            "n_tokens",
            F.round(F.lit(1.0) - F.col("_u").cast("double") / n, 6).alias(
                "dup_token_ratio"
            ),
            F.round(F.col("_top").cast("double") / n, 6).alias("top_token_frac"),
            F.when(
                F.col("n_tokens") >= 2,
                F.round(
                    F.coalesce(F.col("_topbg"), F.lit(0)).cast("double")
                    / (n - F.lit(1.0)),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("top_bigram_frac"),
        )
    )


def filter_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 5,
    max_tokens: int = 1_000_000,
    min_quality: float = 0.0,
    allowed_langs: list[str] | None = None,
) -> DataFrame:
    """The keep/drop decision a training pipeline ships: token-count
    window + composite quality threshold + predicted-language allowlist,
    composed in ONE projection + filter (every signal is an expression
    over the text column — no joins, no Python, the filter evaluates at
    scan speed and Catalyst prunes dropped rows before any downstream
    shuffle). Signal formulas are identical to :func:`token_stats`,
    :func:`quality_score`, :func:`language_scores`, each independently
    oracle-verified.

    Returns surviving rows as ``id, n_tokens, quality, lang_pred``.

    Staged like :func:`language_scores`: tokens and the per-language
    scores are real columns, so the argmax when-chain (which references
    each score up to 6x) reads attributes instead of re-running the
    tokenizer + marker filters per reference (~10x, measured).
    """
    toks = F.col("_tk")
    n_tok = F.size(toks).cast("double")
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS["en"]))).cast("double")
    quality = F.round(
        F.least(n_tok / F.lit(100.0), F.lit(1.0)) * 0.5
        + F.least(stop_hits / n_tok * 4.0, F.lit(1.0)) * 0.5,
        6,
    )

    def _hits(words: list[str]):
        return lambda t: t.isin(words)

    langs = sorted(STOPWORDS)
    scores = {
        lang: F.round(
            F.size(F.filter(toks, _hits(words))).cast("double") / n_tok, 6
        )
        for lang, words in STOPWORDS.items()
    }
    scored = df.select(F.col(id_col), tokens(text_col).alias("_tk")).select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        quality.alias("quality"),
        *[scores[lang].alias(f"_s_{lang}") for lang in langs],
    )
    best = F.greatest(*[F.col(f"_s_{lang}") for lang in langs])
    pred = F.lit(None).cast("string")
    for lang in reversed(langs):
        pred = F.when(F.col(f"_s_{lang}") == best, F.lit(lang)).otherwise(pred)

    out = scored.select(
        F.col(id_col), "n_tokens", "quality", pred.alias("lang_pred")
    ).filter(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
        & (F.col("quality") >= min_quality)
    )
    if allowed_langs is not None:
        out = out.filter(F.col("lang_pred").isin(list(allowed_langs)))
    return out


def bm25_scores(
    df: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 relevance of every document against a fixed term set —
    the retrieval-scoring stage of a RAG/data-curation pipeline
    (idf-weighted, length-normalized term frequency).

    Scale shape: per-doc term frequencies are ONE staged projection over
    the corpus scan; the corpus statistics (N, avgdl, per-term document
    frequencies) are a single-row aggregate crossJoin-broadcast back —
    no collect, no per-term shuffle, one pass + one tiny broadcast.
    idf uses the standard ln(1 + (N - df + 0.5)/(df + 0.5)).
    """
    tf_cols = [
        F.size(F.filter(F.col("_tk"), _eq_factory(t))).cast("double").alias(f"_tf_{i}")
        for i, t in enumerate(terms)
    ]
    staged = df.select(F.col(id_col), tokens(text_col).alias("_tk")).select(
        F.col(id_col), F.size("_tk").cast("long").alias("dl"), *tf_cols
    )
    stats = staged.agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.sum("dl").cast("double").alias("_sumdl"),
        *[
            F.sum((F.col(f"_tf_{i}") > 0).cast("long")).cast("double").alias(f"_df_{i}")
            for i in range(len(terms))
        ],
    )
    joined = staged.crossJoin(F.broadcast(stats))
    avgdl = F.col("_sumdl") / F.col("_n")
    norm_len = F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * (F.col("dl").cast("double") / avgdl))
    score = F.lit(0.0)
    for i in range(len(terms)):
        tf = F.col(f"_tf_{i}")
        idf = F.log(
            F.lit(1.0)
            + (F.col("_n") - F.col(f"_df_{i}") + F.lit(0.5)) / (F.col(f"_df_{i}") + F.lit(0.5))
        )
        score = score + idf * ((tf * F.lit(k1 + 1.0)) / (tf + norm_len))
    return joined.select(
        F.col(id_col),
        F.col("dl").alias("n_tokens"),
        F.round(score, 6).alias("bm25"),
    )


def _eq_factory(term: str):
    # closure factory — a default-arg lambda would be misread as a
    # multi-argument HOF by F.filter
    return lambda t: t == F.lit(term)


def bpe_merge_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 10,
) -> DataFrame:
    """One BPE "learn" step over the corpus: the most frequent adjacent
    character pairs inside words (rank 1 is the next merge a byte-pair
    tokenizer trainer would apply).

    Word-count shape end to end: explode words → explode char pairs
    (per-row flatMap, no shuffle) → groupBy(pair) with map-side combine
    → global top-n. The shuffle carries (pair, count) — at most
    |alphabet|² keys per partition regardless of corpus size.
    """
    words = df.select(F.explode(tokens(text_col)).alias("w")).filter(
        F.length("w") >= 2
    )
    pairs = words.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.col("w").substr(i, F.lit(2)),
            )
        ).alias("pair")
    )
    counted = pairs.groupBy("pair").agg(F.count(F.lit(1)).cast("long").alias("n_occ"))
    # limit-then-rank: TakeOrderedAndProject keeps the top-N selection
    # distributed; only the ≤top_n survivors cross the rank window.
    top = counted.orderBy(F.col("n_occ").desc(), F.col("pair").asc()).limit(top_n)
    w = Window.orderBy(F.col("n_occ").desc(), F.col("pair").asc())
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .select("rank", "pair", "n_occ")
    )


def _bigram_array(tok_col: str) -> Column:
    """Bigrams of a token-array column via shifted-slice zip (one linear
    pass per doc — see repetition_signals for why not element_at)."""
    n = F.size(tok_col)
    return (
        F.when(
            n >= 2,
            F.zip_with(
                F.slice(tok_col, 1, n - 1),
                F.slice(tok_col, 2, n - 1),
                lambda a, b: F.concat_ws(" ", a, b),
            ),
        )
        .otherwise(F.array().cast("array<string>"))
    )


def lm_bigram_scores(
    train: DataFrame,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 0.5,
) -> DataFrame:
    """CCNet-style language-model filtering signal: score every document
    by how predictable its bigrams are under an add-k-smoothed bigram
    model fit on ``train`` (in production: a held-out clean corpus, e.g.
    Wikipedia — documents whose bigrams the clean model finds improbable
    are candidates for removal).

    P(w2|w1) = (c(w1 w2) + k) / (c(w1) + k*V); emitted per doc:
    ``n_bigrams``, ``oov_bigrams`` (bigrams unseen in train), and
    ``mean_bigram_p`` — the mean smoothed probability, accumulated as
    a decimal sum of per-bigram doubles so the aggregate is
    order-independent (engine-exact; a log-space KenLM score would hinge
    on ln() ulp parity across engines, which IEEE does not guarantee).

    Scale shape: model "training" is two word-count aggregations over
    the train corpus (map-side combined); scoring joins each doc bigram
    against the count tables on their natural keys — shuffle joins, NOT
    broadcasts, because a web-scale bigram table exceeds executor
    memory; AQE downgrades to broadcast when the model side is actually
    small. V rides along as a single-row broadcast like bm25's stats.
    No collect, no Python.
    """
    uni = (
        train.select(F.explode(tokens(text_col)).alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).cast("long").alias("c1"))
    )
    bi = (
        train.select(tokens(text_col).alias("_tk"))
        .select(F.explode(_bigram_array("_tk")).alias("bg"))
        .groupBy("bg")
        .agg(F.count(F.lit(1)).cast("long").alias("c2"))
    )
    vocab = uni.agg(F.count(F.lit(1)).cast("double").alias("_v"))

    doc_bigrams = (
        docs.select(F.col(id_col), tokens(text_col).alias("_tk"))
        .select(id_col, F.explode(_bigram_array("_tk")).alias("bg"))
        .withColumn("w1", F.substring_index("bg", " ", 1))
    )
    joined = (
        doc_bigrams.join(bi, "bg", "left")
        .join(uni, "w1", "left")
        .crossJoin(F.broadcast(vocab))
    )
    # Double division is IEEE-exact (identical bits in any engine given
    # identical operands); round to 9 then sum as decimal for an
    # order-independent aggregate.
    p = (F.coalesce(F.col("c2"), F.lit(0)).cast("double") + F.lit(float(k))) / (
        F.coalesce(F.col("c1"), F.lit(0)).cast("double") + F.lit(float(k)) * F.col("_v")
    )
    per_doc = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum(F.when(F.col("c2").isNull(), 1).otherwise(0)).cast("long").alias("oov_bigrams"),
        F.sum(F.round(p, 9).cast("decimal(28,9)")).alias("_sum_p"),
    )
    return per_doc.select(
        id_col,
        "n_bigrams",
        "oov_bigrams",
        F.round(
            F.col("_sum_p").cast("double") / F.col("n_bigrams").cast("double"), 6
        ).alias("mean_bigram_p"),
    )


def linear_quality_scores(
    df: DataFrame,
    weights: list[float],
    bias: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Hashed-bag-of-words linear classifier scoring — the fastText-style
    quality-model pass of a curation pipeline, reduced to its Spark
    shape: feature-hash each token into ``len(weights)`` buckets
    (portable md5-prefix hash, same as the dedup family), look the
    bucket's weight up in a broadcast literal array, and average into a
    per-document logit. Weights come from an offline-trained model; any
    vector fits — the engine contract is only that scoring is one
    map-side projection + one per-doc aggregation (no join, no Python,
    whole-stage codegen end to end).

    Weights are quantized to 1e-3 (decimal(10,3)) so the per-doc sum is
    decimal-exact and order-independent; ``logit`` = mean bucket weight
    + bias, rounded to 6.
    """
    nb = len(weights)
    warr = F.array(
        *[F.lit(round(w, 3)).cast("decimal(10,3)") for w in weights]
    )
    tok = F.explode(tokens(text_col)).alias("w")
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("w")), 1, 7), 16, 10).cast("long"), F.lit(nb)
    )
    per_tok = df.select(F.col(id_col), tok).select(
        id_col, F.element_at(warr, (bucket + 1).cast("int")).alias("_w")
    )
    agg = per_tok.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum("_w").alias("_sw"),
    )
    return agg.select(
        id_col,
        "n_tokens",
        F.round(
            F.col("_sw").cast("double") / F.col("n_tokens").cast("double")
            + F.lit(float(bias)),
            6,
        ).alias("logit"),
    )


def pseudonymize(col: Column | str, secret: str, length: int = 16) -> Column:
    """Keyed deterministic pseudonym for an identifier column: the first
    ``length`` hex chars of sha256(secret || ':' || value).

    The GDPR-pipeline primitive redaction can't give you: the SAME input
    under the SAME secret always maps to the SAME token, so joins,
    groupBys, and dedup still work across pseudonymized tables, while
    the raw identifier never leaves the engine. Rotating the secret
    severs all linkage (crypto-shredding by key destruction). Pure
    projection — zero shuffle, codegen'd sha256.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(
        F.sha2(F.concat(F.lit(f"{secret}:"), c.cast("string")), 256), 1, length
    )


def hashed_embedding(
    df: DataFrame,
    dim: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Feature-hashed text embedding: every token lands in one of
    ``dim`` buckets (md5-prefix hash — the engine's portable 60-bit
    convention) with a deterministic ±1 sign, and the document vector
    is the signed token-count per bucket. The model-free bridge from
    the documents table into the similarity/ANN stack (hashing trick,
    Weinberger et al.): exact integer components, so downstream
    cosine/PQ arithmetic — and the oracle — reproduce bit-for-bit on
    any engine.

    Returns (id_col, embedding: array<double> of exact integers).
    Shape: one explode + one (doc, bucket) count + one map-assembled
    projection; the shuffle carries at most ``dim`` rows per document.
    """
    toks = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("_t")
    ).filter(F.col("_t") != "")
    h = F.conv(F.substring(F.md5(F.col("_t")), 1, 15), 16, 10).cast("long")
    # the sign draws on the hash bits ABOVE the bucket, so bucket and
    # sign are independent
    signed = toks.select(
        F.col(id_col),
        h.alias("_hv"),
    ).select(
        id_col,
        F.pmod(F.col("_hv"), F.lit(dim)).cast("int").alias("_b"),
        F.when(F.pmod(F.expr(f"_hv DIV {dim}"), 2) == 0, F.lit(1.0))
        .otherwise(F.lit(-1.0))
        .alias("_s"),
    )
    cells = signed.groupBy(id_col, "_b").agg(F.sum("_s").alias("_v"))
    assembled = cells.groupBy(id_col).agg(
        F.map_from_entries(F.collect_list(F.struct("_b", "_v"))).alias("_m")
    )
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(F.element_at(F.col("_m"), i.cast("int")), F.lit(0.0)),
    )
    return assembled.select(id_col, vec.alias("embedding"))


def corpus_report(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    source_col: str = "source",
) -> DataFrame:
    """Dataset-card summary: ONE tidy (metric, value) frame with the
    numbers a corpus release ships — volume (docs, tokens, mean
    length), provenance (distinct sources), language mix (one row per
    stored lang), and exact-duplicate mass (share of docs whose text
    fingerprint appears more than once).

    Shape: one full-scan aggregate for the volume block, one |langs|
    group-by, one fingerprint group-by whose shuffle carries
    (fingerprint, count) only — three bounded passes, no windows, no
    driver-side data beyond the tiny result. Values are exact integer
    counts or 6dp-rounded rationals of exact integers (deterministic
    cross-engine).
    """
    spark = df.sparkSession
    toks = tokens(text_col)
    # The volume block is ONE tiny row — materialize it driver-side
    # (model-parameter pattern) so its full-scan aggregate is not
    # re-embedded into every branch of the plan: without this, the
    # lang-share and dup-share branches would each replay the scan.
    vol = df.agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum(F.size(toks).cast("long")).cast("long").alias("_tok"),
        F.count_distinct(F.col(source_col)).cast("long").alias("_src"),
    ).collect()[0]
    n, tok, src = int(vol["_n"]), int(vol["_tok"] or 0), int(vol["_src"])
    n_lit = F.lit(float(n))
    volume = spark.createDataFrame(
        [
            ("n_docs", float(n)),
            # mean as an in-engine division of the exact integer literals
            # (identical IEEE op to the oracle's tok / n)
        ],
        "metric string, value double",
    ).unionByName(
        spark.createDataFrame(
            [("n_tokens_total", float(tok)), ("n_sources", float(src))],
            "metric string, value double",
        )
    ).unionByName(
        spark.range(1).select(
            F.lit("mean_doc_tokens").alias("metric"),
            F.round(F.lit(float(tok)) / n_lit, 6).alias("value"),
        )
    )
    langs = (
        df.groupBy(F.col(lang_col).alias("_lang"))
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
        .select(
            F.concat(F.lit("lang_share:"), F.col("_lang")).alias("metric"),
            F.round(F.col("_c") / n_lit, 6).alias("value"),
        )
    )
    fp = F.md5(normalize_whitespace(F.lower(F.col(text_col))))
    dup = (
        df.select(fp.alias("_fp"))
        .groupBy("_fp")
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
        .agg(
            F.sum(F.when(F.col("_c") > 1, F.col("_c")).otherwise(F.lit(0)))
            .cast("long")
            .alias("_dup")
        )
        .select(
            F.lit("dup_doc_share").alias("metric"),
            F.round(F.coalesce(F.col("_dup"), F.lit(0)) / n_lit, 6).alias("value"),
        )
    )
    return volume.unionByName(langs).unionByName(dup)


def strip_boilerplate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    min_frac: float = 0.5,
) -> DataFrame:
    """Per-source boilerplate removal — the CCNet/RefinedWeb-style
    cleanup that strips navigation chrome, disclaimers, and template
    text repeated across most documents of one origin. A token is
    boilerplate for a source when it appears in ≥ ``min_frac`` of that
    source's documents; cleaned text keeps the remaining tokens in
    original order.

    Fully declarative/JVM-side: one doc-frequency aggregation per
    (source, token), a per-source boilerplate array (collect_set —
    small: vocabulary-of-one-source sized) broadcast back onto the
    docs, and a higher-order ``filter`` + ``array_join`` rebuild. The
    shuffle carries (source, token) pairs, never document text; at
    100 TB the DF table is corpus-vocabulary sized, and per-source
    arrays stay broadcastable because min_frac keeps only the head.

    Returns (id, source, cleaned_text, n_tokens, n_removed).
    """
    toks = F.split(F.col(text_col), " ")
    base = df.select(
        F.col(id_col), F.col(source_col), toks.alias("_ts")
    )
    exploded = base.select(
        id_col, source_col, F.explode("_ts").alias("_tok")
    )
    dfreq = exploded.groupBy(source_col, "_tok").agg(
        F.countDistinct(id_col).alias("_dfreq")
    )
    ndocs = df.groupBy(source_col).agg(
        F.countDistinct(id_col).alias("_nd")
    )
    bp = (
        dfreq.join(ndocs, source_col)
        .filter(
            F.col("_dfreq").cast("double")
            >= F.lit(float(min_frac)) * F.col("_nd").cast("double")
        )
        .groupBy(source_col)
        .agg(F.collect_set("_tok").alias("_bts"))
    )
    joined = base.join(F.broadcast(bp), source_col, "left")
    bts = F.coalesce(F.col("_bts"), F.array().cast("array<string>"))
    kept = F.filter(F.col("_ts"), lambda t: ~F.array_contains(bts, t))
    return joined.select(
        F.col(id_col),
        F.col(source_col),
        F.array_join(kept, " ").alias("cleaned_text"),
        F.size("_ts").cast("long").alias("n_tokens"),
        (F.size("_ts") - F.size(kept)).cast("long").alias("n_removed"),
    )


def readability_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Flesch reading-ease per document from engine-portable proxies:
    whitespace words, ``[.!?]+`` sentence runs (min 1), and
    vowel-group syllable estimates — the classic curation signal for
    "too simple / too dense" document screens. All counting is
    regex/HOF built-ins (one map-side projection, no shuffle, no
    Python); the score is the standard ``206.835 - 1.015*(W/S) -
    84.6*(Syl/W)`` with IEEE doubles rounded to 6.

    Returns (id, n_words, n_sentences, n_syllables, flesch).
    """
    toks = F.split(F.col(text_col), " ")
    words = F.size(F.filter(toks, lambda t: t != F.lit("")))
    sentences = F.greatest(
        F.lit(1),
        F.size(F.expr(f"regexp_extract_all({text_col}, '[.!?]+', 0)")),
    )
    # regexp_extract_all inside a HOF needs the lambda var by name — SQL
    # expression form (still whole-stage JVM, no Python)
    syllables = F.expr(
        f"aggregate(split({text_col}, ' '), 0L, "
        f"(acc, t) -> acc + size(regexp_extract_all(t, '[aeiouyAEIOUY]+', 0)))"
    )
    w = words.cast("double")
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (w / sentences.cast("double"))
        - F.lit(84.6) * (syllables.cast("double") / w)
    )
    return df.select(
        F.col(id_col),
        words.cast("long").alias("n_words"),
        sentences.cast("long").alias("n_sentences"),
        syllables.cast("long").alias("n_syllables"),
        F.when(words > 0, F.round(flesch, 6)).alias("flesch"),
    )


def rake_keywords(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang: str = "en",
    top_k: int = 20,
    max_phrase_len: int = 4,
) -> DataFrame:
    """Corpus-level RAKE keyword extraction (Rose et al. 2010): candidate
    phrases are maximal stopword-free token runs; each word scores
    degree/frequency (degree = summed length of the phrases it appears
    in — co-occurrence mass); a phrase scores the sum of its words'
    scores. The classic unsupervised keyphrase screen for corpus
    exploration / tagging before any model spend.

    Distributed shape: one posexplode (map-side), a per-document window
    to number stopword-delimited segments, then three
    map-side-combining aggregations (phrase lengths, word stats, phrase
    scores) — no self-joins, no all-pairs anything; the only global
    step is top-k over UNIQUE phrases (orderBy + limit, the copurchase
    pattern). Word scores are rounded to 6dp and summed as DECIMAL so
    phrase scores are float-order-independent and engine-exact.

    Returns the global top-``top_k``: (phrase, n_words: int, n_occ:
    long, score, rank) by (score desc, phrase asc). Phrases longer than
    ``max_phrase_len`` words are dropped (they are near-unique strings
    with inflated additive scores — standard practice)."""
    stop = STOPWORDS[lang]
    toks = tokens(text_col)
    t = df.select(F.col(id_col).alias("_doc"), F.posexplode(toks).alias("pos", "tok"))
    flagged = t.withColumn("_stop", F.col("tok").isin(list(stop)))
    wseg = Window.partitionBy("_doc").orderBy("pos")
    words = (
        flagged.withColumn("seg", F.sum(F.col("_stop").cast("int")).over(wseg))
        .filter(~F.col("_stop") & (F.col("tok") != ""))
        .select("_doc", "seg", "pos", "tok")
    )
    plen = words.groupBy("_doc", "seg").agg(
        F.count(F.lit(1)).cast("long").alias("_plen")
    )
    occ = words.join(plen, ["_doc", "seg"])
    wstats = occ.groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("_freq"),
        F.sum("_plen").cast("long").alias("_deg"),
    )
    wscore = wstats.select(
        "tok",
        F.round(F.col("_deg").cast("double") / F.col("_freq").cast("double"), 6)
        .cast("decimal(18,6)")
        .alias("_ws"),
    )
    scored_occ = occ.join(wscore, "tok")
    phrases = scored_occ.groupBy("_doc", "seg").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("phrase"),
        F.count(F.lit(1)).cast("int").alias("n_words"),
        F.sum("_ws").alias("_score"),
    ).filter(F.col("n_words") <= max_phrase_len)
    uniq = phrases.groupBy("phrase").agg(
        F.max("n_words").alias("n_words"),
        F.count(F.lit(1)).cast("long").alias("n_occ"),
        F.max("_score").alias("_score"),
    )
    top = uniq.orderBy(F.col("_score").desc(), F.col("phrase").asc()).limit(top_k)
    wrank = Window.orderBy(F.col("_score").desc(), F.col("phrase").asc())
    return top.select(
        "phrase",
        "n_words",
        "n_occ",
        F.col("_score").cast("double").alias("score"),
        F.row_number().over(wrank).cast("int").alias("rank"),
    )


def sentence_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document sentence segmentation statistics: sentence count,
    mean/max sentence length in characters — the pre-tokenization
    readability/packing signal (a corpus whose "sentences" average
    thousands of chars is tables or minified markup, not prose; one
    whose sentences average five chars is navigation boilerplate).

    Segmentation is the deterministic terminal-punctuation split
    (``[.!?]+``) with empty/whitespace-only segments dropped — simple
    enough to replay exactly in any engine (the DuckDB oracle uses the
    same regex), which is the point: this is a *filter signal*, not NLP.

    Scale shape: pure per-row projection with higher-order functions
    (split → filter → transform → aggregate), zero shuffles, zero
    Python — whole-stage-codegen all the way; linear in corpus bytes.
    """
    segs = F.filter(
        F.transform(
            F.split(F.col(text_col), r"[.!?]+"), lambda s: F.trim(s)
        ),
        lambda s: F.length(s) > 0,
    )
    lens = F.transform(segs, lambda s: F.length(s).cast("long"))
    n = F.size(lens).cast("long")
    return df.select(
        F.col(id_col),
        n.alias("n_sentences"),
        F.when(
            n > 0,
            F.round(
                F.aggregate(
                    lens, F.lit(0).cast("long"), lambda acc, x: acc + x
                ).cast("double")
                / n.cast("double"),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("avg_sentence_chars"),
        F.coalesce(F.array_max(lens), F.lit(0).cast("long")).alias(
            "max_sentence_chars"
        ),
    )


def hapax_stats(
    df: DataFrame, text_col: str = "text", group_col: str = "lang"
) -> DataFrame:
    """Per-group hapax legomenon share: the fraction of the group's
    DISTINCT vocabulary that occurs exactly once in the corpus — the
    classic lexical-richness / OCR-noise dial (natural prose sits near
    40-60%; far above means typo/OCR noise or id-like junk inflating
    the vocab, far below means templated or deduplicated-to-death
    text). Complements zipf_fit (head shape) by measuring the tail.

    Scale shape: one explode → (group, token) count agg (map-side
    combine absorbs the heavy head tokens before the shuffle) → one
    group re-agg over the VOCABULARY-sized frame, never corpus-sized.
    """
    tok_counts = (
        df.select(F.col(group_col).alias("g"), tokens(text_col).alias("toks"))
        .select("g", F.explode("toks").alias("tok"))
        .filter(F.length("tok") > 0)
        .groupBy("g", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return (
        tok_counts.groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("vocab_size"),
            F.sum(F.when(F.col("n") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_hapax"),
            F.sum("n").cast("long").alias("n_tokens"),
        )
        .select(
            F.col("g").alias(group_col),
            "vocab_size",
            "n_hapax",
            "n_tokens",
            F.round(
                F.col("n_hapax").cast("double") / F.col("vocab_size").cast("double"),
                6,
            ).alias("hapax_share"),
        )
    )


def coverage_curve(
    df: DataFrame,
    text_col: str = "text",
    targets: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Vocabulary coverage curve: how many top-frequency tokens cover
    50/90/99% of the corpus token MASS — the tokenizer-budget question
    (vocab_coverage scores docs against a fixed top-k; this finds the k
    itself). Natural corpora need a few hundred tokens for half the
    mass and a long tail for the last percent; a flat curve means
    id-like junk is flooding the vocabulary.

    Scale shape: one explode → token-count shuffle (map-side combine),
    then rank + running mass over the VOCABULARY-sized count frame
    (never corpus-sized) via the DISTRIBUTED
    ``global_rank_running_sum`` (range partition + per-partition
    windows + broadcast offsets, operators/ranking.py) — a web-scale
    corpus's vocabulary is itself heavy-tailed and unbounded, so even
    the vocab frame must never funnel through a single-partition
    window. One final single-row agg. Returns one row: vocab_size,
    total_tokens, k_at_<pct> per target, plus the top token and its
    mass share.
    """
    from ..operators.ranking import global_rank_running_sum

    counts = (
        df.select(F.explode(tokens(text_col)).alias("tok"))
        .filter(F.length("tok") > 0)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    ranked = global_rank_running_sum(
        counts,
        [F.col("n").desc(), F.col("tok").asc()],
        "n",
        rank_col="rank",
        cum_col="cum",
    )
    total = counts.agg(F.sum("n").cast("long").alias("total"))
    joined = ranked.crossJoin(F.broadcast(total))
    aggs = [
        F.count(F.lit(1)).cast("long").alias("vocab_size"),
        F.max("total").cast("long").alias("total_tokens"),
    ]
    for t in targets:
        pct = str(int(round(t * 100)))
        aggs.append(
            F.min(
                F.when(
                    F.col("cum").cast("double")
                    >= F.lit(float(t)) * F.col("total").cast("double"),
                    F.col("rank"),
                )
            )
            .cast("long")
            .alias(f"k_at_{pct}")
        )
    aggs += [
        F.min(F.when(F.col("rank") == 1, F.col("tok"))).alias("top_token"),
        F.round(
            F.max(F.when(F.col("rank") == 1, F.col("n"))).cast("double")
            / F.max("total").cast("double"),
            6,
        ).alias("top_share"),
    ]
    # Re-track the range-partitioned intermediate: .crossJoin/.agg
    # return new objects without the release handle.
    return cache.track(joined.agg(*aggs), *getattr(ranked, "_d2b_persisted", ()))


# Gopher rule thresholds (Rae et al. 2021, arXiv:2112.11446 Table A1 —
# public): the document-level repetition/shape screens a pretraining
# corpus applies BEFORE model-based quality scoring.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_ALPHA_WORD_FRACTION = 0.8
GOPHER_MIN_STOPWORD_HITS = 2
GOPHER_MAX_DUP_LINE_FRACTION = 0.3


def gopher_quality_flags(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-rule document screens (Rae et al. 2021): word-count
    bounds, mean word length 3-10, hash/ellipsis symbol-to-word ratio
    < 0.1, >= 80% of words containing an alphabetic character, >= 2
    distinct English stopwords present, and duplicate-line fraction
    < 0.3 — each surfaced as its measured value plus the composite
    ``passes`` flag, so a curation run can report WHY a document was
    dropped, not just that it was.

    All JVM-side expressions (lengths, replaces, HOF filters) — one
    projection, zero shuffles, scan-speed at any size.
    """
    c = F.coalesce(F.col(text_col), F.lit(""))
    toks = tokens(text_col)
    n_words = F.size(toks).cast("long")
    nw = n_words.cast("double")
    mean_wl = F.round(
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
        ).cast("double")
        / nw,
        6,
    )
    n_hash = F.length(c) - F.length(F.replace(c, F.lit("#"), F.lit("")))
    n_ellipsis = (
        F.length(c) - F.length(F.replace(c, F.lit("..."), F.lit("")))
    ) / F.lit(3)
    symbol_ratio = F.round((n_hash + n_ellipsis).cast("double") / nw, 6)
    alpha_frac = F.round(
        F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))).cast("double") / nw, 6
    )
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(toks),
            F.array(*[F.lit(w) for w in STOPWORDS["en"]]),
        )
    ).cast("long")
    lines = F.split(c, "\n")
    dup_line_frac = F.round(
        F.lit(1.0)
        - F.size(F.array_distinct(lines)).cast("double")
        / F.size(lines).cast("double"),
        6,
    )
    out = df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        alpha_frac.alias("alpha_word_fraction"),
        stop_hits.alias("stopword_hits"),
        dup_line_frac.alias("dup_line_fraction"),
    )
    return out.withColumn(
        "passes",
        (F.col("n_words") >= GOPHER_MIN_WORDS)
        & (F.col("n_words") <= GOPHER_MAX_WORDS)
        & (F.col("mean_word_len") >= GOPHER_MIN_MEAN_WORD_LEN)
        & (F.col("mean_word_len") <= GOPHER_MAX_MEAN_WORD_LEN)
        & (F.col("symbol_ratio") < GOPHER_MAX_SYMBOL_RATIO)
        & (F.col("alpha_word_fraction") > GOPHER_MIN_ALPHA_WORD_FRACTION)
        & (F.col("stopword_hits") >= GOPHER_MIN_STOPWORD_HITS)
        & (F.col("dup_line_fraction") < GOPHER_MAX_DUP_LINE_FRACTION),
    )
