"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Everything here is expressed with Catalyst higher-order functions over
token arrays — zero Python UDFs — so dedup of a 100TB corpus is a pure
shuffle problem:

- exact:        1 shuffle (groupBy fingerprint)
- minhash LSH:  map-side signature computation (codegen), explode bands
                (×n_bands rows), 1 shuffle on band key, candidate join,
                verify. No O(n²) stage anywhere.
- jaccard:      blocked self-join — only for small blocks / verification.

Hashing is engine-portable by construction: word hash = first 7 hex chars
of md5 → integer (< 2^28), permutations (a*h+b) mod 2^31-1 with 32-bit
a,b — all products < 2^59, so the arithmetic is exact in int64 in ANY
engine (Spark, DuckDB oracle, a future Flink port...).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from d2b_dataframework_spark.datapipe import cache
from d2b_dataframework_spark.datapipe.text import tokens

MERSENNE31 = 2147483647  # 2^31 - 1
N_HASHES = 16
N_BANDS = 4  # 4 rows per band
ROWS_PER_BAND = N_HASHES // N_BANDS

# Deterministic permutation constants (odd multipliers, arbitrary offsets),
# shared verbatim with the SQL oracle generator in plans/queries.py.
_SEED_A = 1103515245
_SEED_B = 12345
PERMS = [
    ((_SEED_A * (i + 1) + 7919) % MERSENNE31 | 1, (_SEED_B * (i + 1) + 104729) % MERSENNE31)
    for i in range(N_HASHES)
]


def word_hash(col: Column) -> Column:
    """Portable token hash: int(md5(token)[:7], 16) — fits in 28 bits."""
    return F.conv(F.substring(F.md5(col), 1, 7), 16, 10).cast("long")


def token_hashes(text_col: Column | str) -> Column:
    """Distinct token-hash array for a text column (distinct again after
    hashing so rare hash collisions can't produce duplicate elements —
    keeps set semantics for Jaccard)."""
    toks = F.array_distinct(tokens(text_col))
    return F.array_distinct(F.transform(toks, word_hash))


def shingles(
    text_col: Column | str, n: int = 3, pre_tokenized: bool = False
) -> Column:
    """Distinct word n-gram shingles, order-preserving construction.

    MinHash over single words degenerates on low-vocabulary corpora
    (every document's word *set* converges to the vocabulary, so all
    LSH buckets collide and the candidate join goes quadratic).
    Shingling into n-grams expands the element space to |vocab|^n,
    which keeps bucket sizes O(1) — this is the canonical choice in
    near-dup literature (Broder '97) and what keeps the pipeline
    linear at 100TB. Documents shorter than ``n`` tokens collapse to a
    single whole-text shingle.

    ``pre_tokenized=True`` treats the input column as an ALREADY
    tokenized array. This matters for evaluation cost, not just API
    convenience: the gram lambda captures the token expression, and
    interpreted HOF lambdas re-evaluate captured subexpressions per
    element — raw text in means the tokenizer (lower+trim+regex+split)
    runs once per GRAM (~5x slower end-to-end, measured). Callers
    working on a DataFrame should stage ``tokens(text)`` as a real
    column first and pass it here; a multi-referenced non-cheap alias
    is not collapsed back into the lambda (SPARK-36718).
    """
    toks = (
        (F.col(text_col) if isinstance(text_col, str) else text_col)
        if pre_tokenized
        else tokens(text_col)
    )
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return F.array_distinct(
        F.when(F.size(toks) < n, F.array(F.concat_ws(" ", toks))).otherwise(grams)
    )


def shingle_hashes(
    text_col: Column | str, n: int = 3, pre_tokenized: bool = False
) -> Column:
    """Distinct hash set of word n-gram shingles (portable md5-prefix)."""
    return F.array_distinct(
        F.transform(shingles(text_col, n, pre_tokenized=pre_tokenized), word_hash)
    )


# Engine parity: Spark's regexp_replace(\s+) matches ONLY Java's
# default \s = [ \t\n\x0B\f\r] (no UNICODE_CHARACTER_CLASS), and Spark's
# SQL trim() strips ONLY U+0020 — while Python's \s and bare str.strip()
# are Unicode-aware (\xa0, thin/ideographic spaces, ...) and strip() also
# eats control chars. The twin must mirror the engine definitions exactly:
# collapse the Java \s class, then strip spaces ONLY (a stray \x08 is a
# token byte, not whitespace — caught by hypothesis in test_properties.py;
# the former strip of all chars <= U+0020 silently dropped it).
_JAVA_WS_RUN = re.compile("[ \t\n\x0b\f\r]+")
_SQL_TRIM_CHARS = " "


def _text_to_hashes(text: str, shingle_n: int | None):
    """Python twin of the declarative normalize→tokenize→(shingle)→
    md5-prefix-hash pipeline; returns the distinct hash array (int64).
    A worker-level memo caches item→hash across documents — near-dup
    corpora share most shingles, so this halves md5 work.

    Unicode parity: whitespace/trim use the Java definitions (above);
    ``str.lower()`` and JVM ``toLowerCase()`` both apply Unicode default
    case mappings, so accented/Greek/CJK text hashes identically on both
    paths (equivalence-tested with a Unicode corpus). Remaining caveat:
    a JVM running under a Turkish default locale lowercases I/İ
    differently — an environment property, not a data one.
    """
    import hashlib

    cache = _text_to_hashes._cache
    norm = _JAVA_WS_RUN.sub(" ", (text or "").lower()).strip(_SQL_TRIM_CHARS)
    toks = norm.split(" ")
    if shingle_n is None or shingle_n <= 1:
        items = set(toks)
    elif len(toks) < shingle_n:
        items = {" ".join(toks)}
    else:
        items = {
            " ".join(toks[i : i + shingle_n])
            for i in range(len(toks) - shingle_n + 1)
        }
    out = np.empty(len(items), dtype=np.int64)
    for i, w in enumerate(items):
        h = cache.get(w)
        if h is None:
            h = int(hashlib.md5(w.encode("utf-8")).hexdigest()[:7], 16)
            if len(cache) < 2_000_000:  # bound worker memory
                cache[w] = h
        out[i] = h
    return np.unique(out)


_text_to_hashes._cache = {}


def _perm_fn(a: int, b: int):
    # Closure factory: Spark counts lambda parameters, so default-arg
    # binding (lambda h, A=a: ...) would be misread as a multi-arg HOF.
    return lambda h: (h * a + b) % MERSENNE31


def minhash_signature(hashes: Column) -> list[Column]:
    """N_HASHES minhash values over a token-hash array."""
    return [F.array_min(F.transform(hashes, _perm_fn(a, b))) for a, b in PERMS]


def exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Groups of byte-identical (normalized) documents: fingerprint,
    group size, canonical (min) id. One shuffle."""
    from d2b_dataframework_spark.datapipe.text import fingerprint

    fp = fingerprint(df, text_col, id_col)
    return (
        fp.groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("canonical_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    vectorized: bool = True,
) -> DataFrame:
    """doc_id + mh_0..mh_{N-1} + the shingle-hash set (kept for verify).

    ``n`` is the shingle width; ``n=1`` degrades to word-set MinHash
    (only safe on large-vocabulary corpora — see :func:`shingles`).

    ``vectorized=True`` computes shingle hashes + all N_HASHES minhash
    values in one Arrow-batched pass (numpy int64 broadcast) instead of
    N_HASHES interpreted ``array_min(transform(...))`` trees per row —
    identical arithmetic (md5-prefix hash, PERMS constants, mod 2^31-1),
    same SQL oracle; normalization matches Java whitespace/trim/lower
    semantics, so parity holds on Unicode corpora too (see
    :func:`_text_to_hashes`).
    """
    if vectorized:
        return _minhash_signatures_vectorized(df, text_col, id_col, n)
    hashes = shingle_hashes(text_col, n) if n > 1 else token_hashes(text_col)
    with_hashes = df.select(F.col(id_col), hashes.alias("token_hashes"))
    sig = minhash_signature(F.col("token_hashes"))
    return with_hashes.select(
        id_col,
        "token_hashes",
        *[s.alias(f"mh_{i}") for i, s in enumerate(sig)],
    )


def _minhash_signatures_vectorized(
    df: DataFrame, text_col: str, id_col: str, n: int
) -> DataFrame:
    """Arrow-batched twin of the declarative signature pipeline."""
    a_consts = np.array([a for a, _ in PERMS], dtype=np.int64)[:, None]
    b_consts = np.array([b for _, b in PERMS], dtype=np.int64)[:, None]

    id_field = df.schema[id_col]
    out_schema = (
        f"`{id_col}` {id_field.dataType.simpleString()}, token_hashes array<bigint>, "
        + ", ".join(f"mh_{i} bigint" for i in range(N_HASHES))
    )

    def compute(batches):
        for pdf in batches:
            ids, hash_lists, sigs = [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                hs = _text_to_hashes(text, n)
                ids.append(doc_id)
                hash_lists.append(hs.tolist())
                sigs.append(
                    ((hs[None, :] * a_consts + b_consts) % MERSENNE31).min(axis=1)
                )
            sig_mat = np.stack(sigs) if sigs else np.empty((0, N_HASHES), np.int64)
            out = {id_col: ids, "token_hashes": hash_lists}
            for i in range(N_HASHES):
                out[f"mh_{i}"] = sig_mat[:, i]
            yield pd.DataFrame(out)

    return df.select(id_col, text_col).mapInPandas(compute, out_schema)


def shingle_hash_frame(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """(id, token_hashes) — the distinct md5-prefix hash set of word
    n-gram shingles, computed in ONE Arrow-batched pass with the
    worker-level shingle→hash memo (:func:`_text_to_hashes`). The
    declarative HOF pipeline (transform + concat_ws + md5 per gram) is
    interpreted per element and measured ~10-20x slower on real
    corpora; this is the shared fast path for any operator that needs
    the raw hash sets without minhash signatures (e.g.
    :func:`prefix_filter_pairs`)."""
    id_field = df.schema[id_col]
    out_schema = (
        f"`{id_col}` {id_field.dataType.simpleString()}, token_hashes array<bigint>"
    )

    def compute(batches):
        for pdf in batches:
            ids, hash_lists = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                ids.append(doc_id)
                hash_lists.append(_text_to_hashes(text, n).tolist())
            yield pd.DataFrame({id_col: ids, "token_hashes": hash_lists})

    return df.select(id_col, text_col).mapInPandas(compute, out_schema)


def _text_to_hash_seq(text: str, shingle_n: int) -> list[int]:
    """Ordered (positional) twin of :func:`_text_to_hashes`: the hash of
    every shingle OCCURRENCE in token order, duplicates kept — shares
    the same normalization and the same worker-level gram→hash memo."""
    import hashlib

    cache = _text_to_hashes._cache
    norm = _JAVA_WS_RUN.sub(" ", (text or "").lower()).strip(_SQL_TRIM_CHARS)
    toks = norm.split(" ")
    if len(toks) < shingle_n:
        items = [" ".join(toks)]
    else:
        items = [
            " ".join(toks[i : i + shingle_n])
            for i in range(len(toks) - shingle_n + 1)
        ]
    out = []
    for w in items:
        h = cache.get(w)
        if h is None:
            h = int(hashlib.md5(w.encode("utf-8")).hexdigest()[:7], 16)
            if len(cache) < 2_000_000:
                cache[w] = h
        out.append(h)
    return out


def positional_shingle_frame(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """(id, pos, gram_hash) — one row per shingle OCCURRENCE with its
    0-based token position, order and duplicates preserved (the
    positional input :func:`duplicate_spans` aligns on)."""
    id_field = df.schema[id_col]
    out_schema = (
        f"`{id_col}` {id_field.dataType.simpleString()}, gram_hashes array<bigint>"
    )

    def compute(batches):
        for pdf in batches:
            ids, seqs = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                ids.append(doc_id)
                seqs.append(_text_to_hash_seq(text, n))
            yield pd.DataFrame({id_col: ids, "gram_hashes": seqs})

    return (
        df.select(id_col, text_col)
        .mapInPandas(compute, out_schema)
        .select(id_col, F.posexplode("gram_hashes").alias("pos", "gram_hash"))
    )


def duplicate_spans(
    df: DataFrame,
    min_run: int = 5,
    n: int = 3,
    max_df: int | None = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document duplicated SPANS — contiguous runs of >=
    ``min_run`` matching word n-grams between two docs, with their
    positions: the span-level complement of the set-based dedup stack
    (Jaccard says *how much* two docs share; this says *where*), and
    the shape of substring-level training-data dedup / contamination
    localization (Lee et al., "Deduplicating Training Data Makes
    Language Models Better", arXiv:2107.06499 — re-expressed as
    relational diagonal-run detection instead of a suffix array).

    Mechanism: positional shingle hashes (same md5-prefix kernel as
    every other dedup operator) equi-join on the gram hash across doc
    pairs; within a (doc_a, doc_b) pair every match lies on a diagonal
    ``diag = pos_a - pos_b``, and consecutive positions on one diagonal
    are one copied span — detected with the standard island trick
    (``pos_a - row_number`` constant within a run), no iteration.

    ``max_df``: document-frequency cap on grams entering the join (a
    gram held by more than this many docs is boilerplate/stop-phrase,
    not evidence of copying — and its match volume grows ~df² per gram,
    the hot-bucket failure every blocked join here guards against).
    Capped grams can only SPLIT a reported run, never invent one; at
    100 TB this cap is what keeps the join linear. ``None`` disables.

    Returns (id_a, id_b, start_a, start_b, run_grams, span_tokens)
    where span_tokens = run_grams + n - 1.

    Scale shape: one Arrow pass per doc for positional hashes, one
    vocabulary-sized df agg, one hash equi-join whose buckets are
    df-capped, one window over matched pairs. No all-pairs stage.
    """
    base = positional_shingle_frame(
        df, text_col=text_col, id_col=id_col, n=n
    ).persist()
    pos = base
    if max_df is not None:
        docfreq = base.groupBy("gram_hash").agg(
            F.count_distinct(F.col(id_col)).alias("_df")
        )
        pos = (
            base.join(docfreq, "gram_hash")
            .filter(F.col("_df") <= int(max_df))
            .drop("_df")
        )
    a = pos.select(
        F.col(id_col).alias("id_a"), F.col("pos").alias("pa"), "gram_hash"
    )
    b = pos.select(
        F.col(id_col).alias("id_b"), F.col("pos").alias("pb"), "gram_hash"
    )
    m = (
        a.join(b, "gram_hash")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "pa", "pb", (F.col("pa") - F.col("pb")).alias("diag"))
    )
    w = Window.partitionBy("id_a", "id_b", "diag").orderBy("pa")
    runs = (
        m.withColumn("_island", F.col("pa") - F.row_number().over(w))
        .groupBy("id_a", "id_b", "diag", "_island")
        .agg(
            F.min("pa").cast("long").alias("start_a"),
            F.min("pb").cast("long").alias("start_b"),
            F.count(F.lit(1)).cast("long").alias("run_grams"),
        )
        .filter(F.col("run_grams") >= int(min_run))
        .select(
            "id_a",
            "id_b",
            "start_a",
            "start_b",
            "run_grams",
            (F.col("run_grams") + F.lit(int(n) - 1)).cast("long").alias("span_tokens"),
        )
    )
    # Track the PERSISTED frame, not the df-capped derivation of it —
    # releasing the derived (never-persisted) frame would no-op while
    # the real cached blocks leaked.
    return cache.track(runs, base)


def remove_repeated_lines(
    df: DataFrame,
    max_df: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CORPUS-WIDE line-level dedup (RefinedWeb/CCNet line dedup): a
    line that appears in more than ``max_df`` distinct documents is
    boilerplate (navigation chrome, cookie banners, footers) and is
    removed from every document; surviving lines are re-joined in
    original order.  Complements :func:`text.strip_boilerplate` (token
    level, per source) and :func:`remove_duplicate_spans` (token-run
    level, per pair) at the granularity real web pipelines actually
    dedup first — the LINE.

    Returns (id, n_lines, n_removed, cleaned_text).

    Scale shape: one posexplode (linear), one line-hash df aggregation
    (the shuffle key is the line hash — vocabulary-of-lines sized), one
    hash equi-join back, and a per-doc re-group whose collect_list is
    bounded by the document's own line count.  No pair join anywhere.
    """
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("_pos", "_line"),
    ).withColumn("_h", word_hash(F.col("_line")))
    dfreq = lines.groupBy("_h").agg(
        F.count_distinct(F.col(id_col)).alias("_ldf")
    )
    marked = lines.join(dfreq, "_h").withColumn(
        "_keep", F.col("_ldf") <= int(max_df)
    )
    return (
        marked.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(F.when(F.col("_keep"), 0).otherwise(1)).cast("long").alias(
                "n_removed"
            ),
            F.array_sort(
                F.collect_list(
                    F.when(F.col("_keep"), F.struct("_pos", "_line"))
                )
            ).alias("_kept"),
        )
        .select(
            F.col(id_col),
            "n_lines",
            "n_removed",
            F.array_join(
                F.transform(F.col("_kept"), lambda x: x["_line"]), "\n"
            ).alias("cleaned_text"),
        )
    )


def remove_duplicate_spans(
    df: DataFrame,
    spans: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Excise the duplicated regions :func:`duplicate_spans` reports —
    the transform stage of substring-level dedup (RefinedWeb/CCNet-style
    pipelines DROP or REWRITE copied regions rather than whole docs).

    Per document: union the [start, start+span_tokens) intervals from
    BOTH sides of every reported pair, merge overlaps (gaps-and-islands
    over a per-doc window), delete the covered token positions from the
    normalized token sequence, and re-join the survivors. Returns
    (id, n_tokens, removed_tokens, removed_share, cleaned_text) — one
    row per input document; untouched docs pass through with
    removed_tokens = 0 and their normalized text.

    Scale shape: the interval windows partition by document (never
    global); merged intervals collapse to ONE small array row per
    affected doc, so the only shuffle beyond the span join is the
    per-doc groupBy, and the excision itself is a map-side HOF over
    (token, position) pairs — cost O(tokens x islands_per_doc), with
    islands bounded by the span report, not the corpus.
    """
    iv = (
        spans.select(
            F.col("id_a").alias(id_col),
            F.col("start_a").cast("long").alias("s"),
            (F.col("start_a") + F.col("span_tokens")).cast("long").alias("e"),
        )
        .unionAll(
            spans.select(
                F.col("id_b").alias(id_col),
                F.col("start_b").cast("long").alias("s"),
                (F.col("start_b") + F.col("span_tokens")).cast("long").alias("e"),
            )
        )
        # identical intervals must collapse so the island window's
        # orderBy is a total order (same reasoning as dup-share)
        .distinct()
    )
    w = Window.partitionBy(id_col).orderBy("s", "e")
    prev_max = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    merged = (
        iv.withColumn(
            "_new",
            F.when(prev_max.isNull() | (F.col("s") > prev_max), 1).otherwise(0),
        )
        .withColumn(
            "_island", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
        )
        .groupBy(id_col, "_island")
        .agg(F.min("s").alias("s"), F.max("e").alias("e"))
        .groupBy(id_col)
        .agg(
            F.collect_list(F.struct("s", "e")).alias("_iv"),
            F.sum(F.col("e") - F.col("s")).cast("long").alias("removed_tokens"),
        )
    )
    toks = df.select(F.col(id_col), tokens(text_col).alias("_toks"))
    joined = toks.join(merged, id_col, "left").withColumn(
        "_iv",
        F.coalesce(F.col("_iv"), F.array().cast("array<struct<s:bigint,e:bigint>>")),
    )
    # (token, 0-based position) pairs; a token survives iff no merged
    # interval covers its position
    pairs = F.zip_with(
        F.col("_toks"),
        F.sequence(F.lit(0).cast("long"), (F.size("_toks") - 1).cast("long")),
        lambda t, i: F.struct(t.alias("t"), i.alias("i")),
    )
    kept = F.filter(
        pairs,
        lambda x: ~F.exists(
            F.col("_iv"), lambda r: (x["i"] >= r["s"]) & (x["i"] < r["e"])
        ),
    )
    return joined.select(
        F.col(id_col),
        F.greatest(F.size("_toks"), F.lit(1)).cast("long").alias("n_tokens"),
        F.coalesce(F.col("removed_tokens"), F.lit(0)).cast("long").alias(
            "removed_tokens"
        ),
        F.round(
            F.coalesce(F.col("removed_tokens"), F.lit(0)).cast("double")
            / F.greatest(F.size("_toks"), F.lit(1)).cast("double"),
            6,
        ).alias("removed_share"),
        F.array_join(F.transform(kept, lambda x: x["t"]), " ").alias("cleaned_text"),
    )


def lsh_bands(signatures: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, band_id, band_key) rows from a minhash-signature frame — the
    banding step shared by :func:`lsh_candidate_pairs` (which self-joins
    the buckets) and the band-skew audit (which only counts them)."""
    return signatures.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.concat_ws(
                            "_",
                            *[
                                F.col(f"mh_{b * ROWS_PER_BAND + r}")
                                for r in range(ROWS_PER_BAND)
                            ],
                        ).alias("band_key"),
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("band"),
    ).select(id_col, "band.band_id", "band.band_key")


def lsh_band_stats(signatures: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-band LSH bucket-skew audit: bucket count, the largest bucket,
    how many buckets actually collide (>1 member), and the candidate
    pairs each band would emit (sum of s·(s-1)/2) — the observable
    behind the hot-bucket caps: a band whose max bucket tracks the
    corpus is the quadratic corner SCALING.md documents, and this is
    the report that catches it BEFORE the candidate join runs.

    One groupBy over the (id × bands) frame then an N_BANDS-row re-agg;
    never forms a pair."""
    sizes = lsh_bands(signatures, id_col).groupBy("band_id", "band_key").agg(
        F.count(F.lit(1)).cast("long").alias("s")
    )
    return (
        sizes.groupBy("band_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_buckets"),
            F.sum("s").cast("long").alias("n_docs"),
            F.max("s").cast("long").alias("max_bucket"),
            F.sum(F.when(F.col("s") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_colliding_buckets"),
            (F.sum(F.col("s") * (F.col("s") - 1)) / F.lit(2))
            .cast("long")
            .alias("candidate_pairs"),
        )
        .select(
            F.col("band_id").cast("long").alias("band_id"),
            "n_buckets",
            "n_docs",
            "max_bucket",
            "n_colliding_buckets",
            "candidate_pairs",
        )
        .orderBy("band_id")
    )


def lsh_candidate_pairs(
    signatures: DataFrame, id_col: str = "doc_id", max_bucket_size: int | None = None
) -> DataFrame:
    """Candidate near-duplicate pairs via LSH banding.

    Explode each doc into N_BANDS (band_id, band_key) rows, self-join on
    the band bucket, keep id_a < id_b. The join key is (band_id, band_key)
    so a bucket never crosses bands; shuffle partitions by bucket —
    linear in corpus size for non-degenerate data.

    ``max_bucket_size``: optional hot-bucket guard for degenerate data
    (a family of thousands of identical/near-identical docs collapses
    into one bucket per band and the join goes quadratic in the family
    size — see SCALING.md). Over-cap buckets are dropped before the
    join; such families should be collapsed by exact dedup first.
    Default None preserves exact banded semantics (the oracle contract).
    """
    bands = lsh_bands(signatures, id_col)
    if max_bucket_size is not None:
        sizes = bands.groupBy("band_id", "band_key").agg(
            F.count(F.lit(1)).alias("_bn")
        )
        bands = (
            bands.join(sizes, ["band_id", "band_key"])
            .filter(F.col("_bn") <= max_bucket_size)
            .drop("_bn")
        )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def jaccard(tokens_a: Column, tokens_b: Column) -> Column:
    """Set Jaccard over two (distinct-element) arrays."""
    inter = F.size(F.array_intersect(tokens_a, tokens_b)).cast("double")
    union = F.size(F.array_union(tokens_a, tokens_b)).cast("double")
    return inter / union


def minhash_duplicate_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: signatures → banded candidates
    → exact Jaccard verification at `threshold`. Returns
    (id_a, id_b, jaccard_sim). ``max_bucket_size`` passes through to the
    hot-bucket guard in :func:`lsh_candidate_pairs`."""
    sigs = minhash_signatures(df, text_col, id_col, n).cache()
    cands = lsh_candidate_pairs(sigs, id_col, max_bucket_size=max_bucket_size)
    toks = sigs.select(F.col(id_col), F.col("token_hashes"))
    verified = (
        cands.join(toks.withColumnsRenamed({id_col: "id_a", "token_hashes": "toks_a"}), "id_a")
        .join(toks.withColumnsRenamed({id_col: "id_b", "token_hashes": "toks_b"}), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(jaccard(F.col("toks_a"), F.col("toks_b")), 6).alias("jaccard_sim"),
        )
        .filter(F.col("jaccard_sim") >= threshold)
    )
    # sigs feeds BOTH the banding and the verify join — cached above;
    # tracked so cache.release(verified) can free it.
    return cache.track(verified, sigs)


def ngram_jaccard_pairs(
    df: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    block_col: str | None = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact n-gram Jaccard similarity over blocked pairs, computed on
    md5-prefix HASHED element sets (near-dup-literature standard): the
    pair join then moves fixed-width int64 arrays instead of string
    arrays — a fraction of the shuffle bytes, and `array_intersect` on
    longs beats UTF8 comparisons. Identical hashing on the oracle side
    keeps values bit-matched; hash collisions (2^-28/pair) perturb both
    engines identically.

    O(block²) — use only with a blocking column or as the verification
    stage after LSH. ``n=1`` degrades to word-set Jaccard.
    """
    hashed = shingle_hashes(text_col, n) if n > 1 else token_hashes(text_col)
    # Persisted: the md5 shingle-hash projection would otherwise run once
    # per self-join side (Catalyst does not reuse the exchange here).
    base = df.select(
        F.col(id_col),
        *([F.col(block_col)] if block_col else []),
        hashed.alias("shingles"),
    ).persist()
    a, b = base.alias("a"), base.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    if block_col:
        cond = (F.col(f"a.{block_col}") == F.col(f"b.{block_col}")) & cond
    out = (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(jaccard(F.col("a.shingles"), F.col("b.shingles")), 6).alias("jaccard_sim"),
        )
        .filter(F.col("jaccard_sim") >= threshold)
    )
    return cache.track(out, base)


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    shingle_n: int | None = None,
    vectorized: bool = True,
) -> DataFrame:
    """SimHash fingerprint over token hashes (default 32 bits, drawn from
    the 28-bit word hash re-hashed per bit via the minhash permutations'
    low bit — fully portable arithmetic).

    For each bit b: sum over tokens of (2*((perm_b(h) & 1)) - 1); bit is 1
    iff the sum > 0. Near-dup detection = Hamming distance on the result.

    ``shingle_n``: hash word n-gram shingles instead of single words —
    REQUIRED for near-dup banding on low-vocabulary corpora, where word
    sets converge and fingerprints collide quadratically (same failure
    mode as word-set MinHash, see :func:`shingles`).

    ``vectorized=True`` computes the votes in an Arrow-batched pandas UDF
    (one int64 broadcast-matmul per document instead of ``bits``
    interpreted higher-order aggregates — HOF lambdas run outside
    codegen, so the declarative form is ~10× slower). Arithmetic is
    IDENTICAL (md5-prefix hash, same permutation constants, int64 exact);
    both paths hash-match the same SQL oracle, and normalization follows
    Java whitespace/trim/lower semantics so Unicode corpora hash
    identically on both paths (see :func:`_text_to_hashes`).
    """
    if vectorized:
        return _simhash_vectorized(df, text_col, id_col, bits, shingle_n)

    def _vote_fn(mult: int, offset: int):
        return lambda acc, h: acc + (((h * mult + offset) % MERSENNE31) % 2) * 2 - 1

    # Materialize the hash array in its own projection so the md5
    # tokenization runs once per row, not once per bit.
    src = shingle_hashes(text_col, shingle_n) if shingle_n else token_hashes(text_col)
    hashed = df.select(F.col(id_col), src.alias("_hs"))
    bit_cols = []
    for b in range(bits):
        a_c, b_c = PERMS[b % N_HASHES]
        # vary the permutation per bit beyond N_HASHES by mixing in b
        mult = (a_c + 2 * b) | 1
        vote = F.aggregate(F.col("_hs"), F.lit(0).cast("long"), _vote_fn(mult, b_c))
        bit_cols.append(F.when(vote > 0, F.lit(1)).otherwise(F.lit(0)).cast("long") * (2**b))
    return hashed.select(F.col(id_col), sum(bit_cols[1:], bit_cols[0]).alias("simhash"))


def _simhash_vectorized(
    df: DataFrame, text_col: str, id_col: str, bits: int, shingle_n: int | None
) -> DataFrame:
    """Arrow-batched simhash twin: same normalize→tokenize→(shingle)→
    md5-prefix-hash→permute→vote pipeline, numpy int64 inside."""
    consts = []
    for b in range(bits):
        a_c, b_c = PERMS[b % N_HASHES]
        consts.append(((a_c + 2 * b) | 1, b_c))
    mults = np.array([m for m, _ in consts], dtype=np.int64)[:, None]
    offs = np.array([o for _, o in consts], dtype=np.int64)[:, None]
    powers = (np.int64(1) << np.arange(bits, dtype=np.int64))

    @F.pandas_udf("long")
    def sim_udf(texts: pd.Series) -> pd.Series:
        out = []
        for text in texts:
            hs = _text_to_hashes(text, shingle_n)
            votes = (2 * (((hs[None, :] * mults + offs) % MERSENNE31) % 2) - 1).sum(axis=1)
            out.append(int(((votes > 0).astype(np.int64) * powers).sum()))
        return pd.Series(out)

    return df.select(F.col(id_col), sim_udf(F.col(text_col)).alias("simhash"))


SIMHASH_BANDS = 4
SIMHASH_BITS = 32
BITS_PER_BAND = SIMHASH_BITS // SIMHASH_BANDS


def simhash_near_dup_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int | None = 3,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """SimHash near-duplicate pairs: band the 32-bit fingerprint into 4
    bytes; any shared byte makes a candidate pair (pigeonhole: hamming
    <= 3 over 4 bands guarantees >= 1 identical band, so recall is 100%
    within the budget); verify with bit_count(xor) <= max_hamming.

    Scale shape: fingerprints are map-side; candidates come from a
    (band_id, band_value) equi-join - one shuffle, no O(n^2) stage; the
    xor popcount verify is a cheap integer op inside codegen.

    The signature table (id + one long) is persisted before the
    self-join: Catalyst does not reuse the exchange across the two join
    sides, so without it the whole tokenize+hash pipeline would execute
    once per side. At corpus scale this is the standard "materialize
    signatures, then join" staging (a few bytes per document).
    """
    sigs = simhash(df, text_col=text_col, id_col=id_col, shingle_n=shingle_n).persist()
    bands = sigs.select(
        F.col(id_col).alias("vid"),
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.shiftright(F.col("simhash"), b * BITS_PER_BAND)
                        .bitwiseAND(F.lit((1 << BITS_PER_BAND) - 1))
                        .alias("band_val"),
                    )
                    for b in range(SIMHASH_BANDS)
                ]
            )
        ).alias("band"),
    ).select("vid", "simhash", "band.band_id", "band.band_val")
    if max_bucket_size is not None:
        # Hot-bucket guard — same rationale as lsh_candidate_pairs.
        sizes = bands.groupBy("band_id", "band_val").agg(
            F.count(F.lit(1)).alias("_bn")
        )
        bands = (
            bands.join(sizes, ["band_id", "band_val"])
            .filter(F.col("_bn") <= max_bucket_size)
            .drop("_bn")
        )
    left = bands.select(
        F.col("vid").alias("id_a"), F.col("simhash").alias("sh_a"), "band_id", "band_val"
    )
    right = bands.select(
        F.col("vid").alias("id_b"), F.col("simhash").alias("sh_b"), "band_id", "band_val"
    )
    out = (
        left.join(right, ["band_id", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "hamming",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("long"),
        )
        # hamming is a function of the pair, so filtering BEFORE the
        # distinct shrinks the dedup shuffle from every candidate to just
        # the true near-dups (same result, far less data moved).
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
        .select("id_a", "id_b", "hamming")
    )
    return cache.track(out, sigs)


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Near-dup pair graph → connected components: ``(id, cluster_id)``
    where ``cluster_id`` is the MIN doc id in the component — the
    canonical-document assignment that turns pair output (MinHash/
    SimHash/cosine) into an actual dedup decision ("keep cluster_id,
    drop the rest").

    Iterative min-label propagation: each round joins labels to the
    symmetrized edge list, takes the per-node min over neighbor labels,
    and stops at a fixpoint (label sum is monotonically non-increasing,
    compared driver-side — one scalar per round, no row-level diff
    join). Rounds needed = graph diameter; near-dup components are
    dense and shallow (a cluster of variants of one document), so this
    converges in a handful of rounds. Each round is 2 shuffles over
    (id, label) pairs — never text or vectors. For adversarial
    long-chain graphs swap in large-star/small-star (Kiveris et al.);
    the fixpoint contract is identical.

    Materialization: edges are persisted (re-referenced every round);
    each round's labels are ``localCheckpoint``-ed (lazily — the
    fixpoint sum is the materializing action, so the truncation costs
    no extra job) — without truncation the
    logical plan deepens every round and Catalyst analysis time grows
    superlinearly (measured 1.2s → 10s per round by round 4 at sf0.1).
    Checkpoint blocks of dropped rounds are reclaimed by the context
    cleaner; the loop is bounded by ``max_iter``.
    """
    sym = pairs.select(
        F.col(id_a).cast("long").alias("a"), F.col(id_b).cast("long").alias("b")
    )
    edges = (
        sym.unionByName(sym.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .persist()
    )
    # Seed with min(id, min neighbor) — the same fixpoint one round
    # early: star-shaped near-dup components (a doc and its variants)
    # are already converged at init, so the loop only pays the one
    # verification round. Same shuffle count as a plain distinct init.
    #
    # localCheckpoint(eager=False) + the fixpoint collect as the
    # materializing action: the LAZY checkpoint truncates the logical
    # plan immediately (same analysis-blowup protection as eager) while
    # the sum aggregate — which every round needs anyway — triggers the
    # one job that materializes the round. Eager checkpointing ran a
    # dedicated job per round and then a second job for the sum; fusing
    # them halves the per-round job count (guide §1.2: per-round driver
    # latency is pure overhead at any scale).
    labels = (
        edges.groupBy(F.col("a").alias("id"))
        .agg(F.least(F.col("a"), F.min("b")).alias("cluster_id"))
        .localCheckpoint(eager=False)
    )
    prev_sum = labels.agg(F.sum("cluster_id")).collect()[0][0]
    for _ in range(max_iter):
        nbr_min = (
            edges.join(
                labels.select(F.col("id").alias("a"), F.col("cluster_id").alias("lab")),
                "a",
            )
            .groupBy(F.col("b").alias("id"))
            .agg(F.min("lab").alias("nbr_lab"))
        )
        labels = (
            labels.join(nbr_min, "id", "left")
            .select(
                "id",
                F.least(F.col("cluster_id"), F.coalesce("nbr_lab", "cluster_id")).alias(
                    "cluster_id"
                ),
            )
            .localCheckpoint(eager=False)  # fused with the sum below
        )
        new_sum = labels.agg(F.sum("cluster_id")).collect()[0][0]
        if new_sum == prev_sum:  # fixpoint: no label decreased
            break
        prev_sum = new_sum
    edges.unpersist()
    return labels.select(F.col("id").alias("doc_id"), "cluster_id")


def connected_components_star(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 15,
) -> DataFrame:
    """Large-star / small-star connected components (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14) — same
    ``(doc_id, cluster_id=min id in component)`` contract as
    :func:`connected_components`, but round count is O(log n) in the
    WORST case, not O(diameter): the right choice when the pair graph
    may contain adversarial long chains (transitive near-dup drift,
    e.g. v1~v2~...~v500 of one evolving document).

    Per round, two phases over the edge set, each expressed as
    groupBy-min + equi-join back (NO ``collect_list`` of neighbor sets:
    a celebrity node with 10M neighbors would OOM a task; min+join
    keeps every shuffle row at two longs and lets AQE split skewed
    keys):

    * large-star: every neighbor v > u re-attaches to m = min(N(u)∪{u})
    * small-star: every neighbor v <= u (edges oriented to the larger
      endpoint) re-attaches to the min of that neighborhood

    Both phases strictly shrink ``sum(parent)`` until the graph is a
    forest of stars rooted at component minima; the fixpoint test is a
    two-scalar driver-side compare (edge count + endpoint sum), one
    tiny job per round. Edge frames are localCheckpoint-ed each round —
    lineage truncation, same rationale as :func:`connected_components`.
    """
    sym0 = pairs.select(
        F.col(id_a).cast("long").alias("a"), F.col(id_b).cast("long").alias("b")
    )
    # Lazy localCheckpoints throughout: the plan is truncated
    # immediately (the analysis-blowup protection), while
    # materialization rides the job each round runs anyway — the
    # signature collect (for edges) and the final label join (for
    # nodes). Eager checkpointing paid one extra dedicated job per
    # frame per round.
    nodes = (
        sym0.select(F.col("a").alias("id"))
        .unionByName(sym0.select(F.col("b").alias("id")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # canonical (big, small) orientation; self-loops dropped
    edges = (
        sym0.filter(F.col("a") != F.col("b"))
        .select(
            F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )

    def _signature(e: DataFrame) -> tuple:
        row = e.agg(
            F.count(F.lit(1)).alias("n"), F.sum("u").alias("su"), F.sum("v").alias("sv")
        ).collect()[0]
        return (row["n"], row["su"], row["sv"])

    sig = _signature(edges)
    for _ in range(max_iter):
        # ---- large-star: neighbors of u larger than u attach to
        # m = min(N(u) ∪ {u}). Symmetrize, group on the small side.
        sym = edges.select("u", "v").unionByName(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
        m_l = mins.select("u", F.least("u", "mn").alias("m"))
        large = (
            sym.filter(F.col("v") > F.col("u"))
            .join(m_l, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        # ---- small-star on the large-star output (edges already point
        # big→small): every small neighbor, and u itself, attach to the
        # neighborhood min.
        ls = large.distinct()
        m_s = ls.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            ls.join(m_s, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(m_s.select("u", F.col("m").alias("v")))
        )
        edges = (
            small.filter(F.col("u") != F.col("v"))
            .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
            .distinct()
            .localCheckpoint(eager=False)  # fused with the signature below
        )
        new_sig = _signature(edges)
        if new_sig == sig:
            break
        sig = new_sig

    labels = nodes.join(
        edges.select(F.col("u").alias("id"), F.col("v").alias("root")), "id", "left"
    ).select(
        F.col("id").alias("doc_id"),
        F.coalesce("root", "id").alias("cluster_id"),
    )
    return labels


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    word n-gram with an evaluation/benchmark set (the n-gram-overlap
    rule used for LLM training corpora; canonical n is 8-13 words —
    smaller here only because the synthetic corpus is tiny).

    Scale shape: both sides explode to hashed n-grams (map-side, the
    same portable md5-prefix hash as the dedup family); the benchmark
    gram set is distinct-ed and BROADCAST — benchmark suites are
    thousands of documents, never corpus-scale — so contamination
    detection is a broadcast semi-join over the training scan: one
    aggregation shuffle on doc_id, nothing shuffled by corpus text.
    Output keeps every training doc with its gram counts so the caller
    chooses the drop threshold.
    """
    # Tokens staged as a real column so the gram lambda reads an
    # attribute instead of re-running the tokenizer per gram (see
    # shingles() docstring; ~5x end-to-end).
    t_grams = train.select(
        F.col(id_col).alias("did"), tokens(text_col).alias("toks")
    ).select(
        "did",
        F.explode(shingle_hashes("toks", n, pre_tokenized=True)).alias("g"),
    )
    b_grams = (
        benchmark.select(tokens(text_col).alias("toks"))
        .select(F.explode(shingle_hashes("toks", n, pre_tokenized=True)).alias("g"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    per_doc = (
        t_grams.join(F.broadcast(b_grams), "g", "left")
        .groupBy("did")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_contaminated"),
        )
    )
    return per_doc.select(
        F.col("did").alias(id_col),
        "n_grams",
        "n_contaminated",
        (F.col("n_contaminated") > 0).alias("contaminated"),
        F.round(
            F.col("n_contaminated").cast("double") / F.col("n_grams").cast("double"), 6
        ).alias("contamination_ratio"),
    )


def decontaminate_multi(
    train: DataFrame,
    benchmarks: dict[str, DataFrame],
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Decontamination against a benchmark SUITE (MMLU+GSM8K+HumanEval
    style): per training document and per benchmark, the hashed word
    n-gram overlap — so the caller gets per-benchmark hit masks and a
    combined drop decision in one pass over the corpus, instead of
    re-scanning the corpus once per benchmark the single-set
    :func:`decontaminate` would need.

    Returns one row per (training doc x benchmark):
    ``(id, benchmark, n_grams, n_contaminated, contaminated,
    contamination_ratio)`` — zero-filled for benchmarks the doc does
    not hit, so downstream rollups see every cell.

    Scale shape: each benchmark's gram set is distinct-ed, tagged with
    its name, UNIONed, and the union is broadcast ONCE (benchmark
    suites are thousands of documents, never corpus-scale) — the corpus
    explodes to grams exactly once and is never shuffled by text. Two
    key-shuffles total, both on the doc id: the per-doc gram count and
    the per-(doc, benchmark) hit count; the dense (doc x benchmark)
    grid comes from a broadcast join against the literal name list.
    """
    t_grams = train.select(
        F.col(id_col).alias("did"), tokens(text_col).alias("toks")
    ).select(
        "did",
        F.explode(shingle_hashes("toks", n, pre_tokenized=True)).alias("g"),
    )
    b_union = None
    for name in sorted(benchmarks):
        bg = (
            benchmarks[name]
            .select(tokens(text_col).alias("toks"))
            .select(
                F.explode(shingle_hashes("toks", n, pre_tokenized=True)).alias("g")
            )
            .distinct()
            .select(F.lit(name).alias("benchmark"), "g")
        )
        b_union = bg if b_union is None else b_union.unionByName(bg)
    if b_union is None:
        raise ValueError("decontaminate_multi needs at least one benchmark")
    spark = train.sparkSession
    names = spark.createDataFrame(
        [(name,) for name in sorted(benchmarks)], "benchmark string"
    )
    doc_tot = t_grams.groupBy("did").agg(
        F.count("*").cast("long").alias("n_grams")
    )
    hits = (
        t_grams.join(F.broadcast(b_union), "g")
        .groupBy("did", "benchmark")
        .agg(F.count("*").cast("long").alias("n_hit"))
    )
    grid = doc_tot.crossJoin(F.broadcast(names))
    per = grid.join(hits, ["did", "benchmark"], "left").select(
        F.col("did").alias(id_col),
        "benchmark",
        "n_grams",
        F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_contaminated"),
    )
    return per.select(
        id_col,
        "benchmark",
        "n_grams",
        "n_contaminated",
        (F.col("n_contaminated") > 0).alias("contaminated"),
        F.round(
            F.col("n_contaminated").cast("double") / F.col("n_grams").cast("double"), 6
        ).alias("contamination_ratio"),
    )


def decontamination_rollup(
    per_doc: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Suite-level report over :func:`decontaminate_multi` output: per
    benchmark, how many training docs are hit and the doc/gram hit
    rates — plus a combined ``__any__`` row (docs hit by AT LEAST one
    benchmark, i.e. the suite's drop mask size). Two small aggregations
    over the (doc x benchmark) grid; output is |benchmarks|+1 rows.

    The ``__any__`` row's ``n_hit_grams`` sums gram hits ACROSS
    benchmarks (a gram shared by k benchmark sets counts k times) —
    a documented convention so the rollup stays derivable from the
    per-doc grid without re-scanning the corpus."""
    per_b = per_doc.groupBy("benchmark").agg(
        F.count("*").cast("long").alias("n_train_docs"),
        F.sum(F.col("contaminated").cast("long")).cast("long").alias("n_hit_docs"),
        F.sum("n_grams").cast("long").alias("n_grams"),
        F.sum("n_contaminated").cast("long").alias("n_hit_grams"),
    )
    any_doc = (
        per_doc.groupBy(id_col)
        .agg(
            F.max(F.col("contaminated").cast("long")).alias("hit"),
            # n_grams repeats per benchmark row of the grid; min() picks
            # the one per-doc value deterministically on both legs
            F.min("n_grams").alias("n_grams"),
            F.sum("n_contaminated").cast("long").alias("n_hit_grams"),
        )
        .agg(
            F.lit("__any__").alias("benchmark"),
            F.count("*").cast("long").alias("n_train_docs"),
            F.sum("hit").cast("long").alias("n_hit_docs"),
            F.sum("n_grams").cast("long").alias("n_grams"),
            F.sum("n_hit_grams").cast("long").alias("n_hit_grams"),
        )
    )
    return per_b.unionByName(any_doc).select(
        "benchmark",
        "n_train_docs",
        "n_hit_docs",
        F.round(
            F.col("n_hit_docs").cast("double") / F.col("n_train_docs").cast("double"),
            6,
        ).alias("doc_hit_rate"),
        F.round(
            F.col("n_hit_grams").cast("double") / F.col("n_grams").cast("double"), 6
        ).alias("gram_hit_rate"),
    )


def segment_dup_stats(
    df: DataFrame,
    window: int = 15,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Line/segment-level dedup signal (the RefinedWeb/Falcon "duplicated
    lines" filter, adapted to unpunctuated text): split each document
    into non-overlapping ``window``-token segments, hash them, and score
    each document by how many of its segments occur in OTHER documents.

    Two shuffles total — (1) segment-hash counts (map-side combine;
    the heavy hitters ARE the duplicates, and partial aggregation
    absorbs them before the shuffle), (2) regroup per doc. The join
    back to segments is on the hash — salting-free because stage-1
    already collapsed each hash to ONE row, so no key carries more than
    its distinct-segment weight.
    """
    toks = F.col("toks")
    n_segs = F.greatest(
        F.lit(1), F.ceil(F.size(toks).cast("double") / window).cast("int")
    )
    segs = F.transform(
        F.sequence(F.lit(0), n_segs - 1),
        lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i * window + 1, window))),
    )
    doc_segs = df.select(
        F.col(id_col).alias("did"), tokens(F.col(text_col)).alias("toks")
    ).select(
        "did", F.posexplode(segs).alias("seg_idx", "seg_hash")
    )
    # Per segment hash: in how many distinct docs does it appear?
    seg_docs = doc_segs.groupBy("seg_hash").agg(
        F.countDistinct("did").cast("long").alias("n_docs_with_seg")
    )
    return (
        doc_segs.join(seg_docs, "seg_hash")
        .groupBy("did")
        .agg(
            F.count("*").cast("long").alias("n_segments"),
            F.sum(F.when(F.col("n_docs_with_seg") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_shared_segments"),
        )
        .select(
            F.col("did").alias(id_col),
            "n_segments",
            "n_shared_segments",
            F.round(
                F.col("n_shared_segments").cast("double")
                / F.col("n_segments").cast("double"),
                6,
            ).alias("shared_ratio"),
        )
    )


def incremental_dedup(
    new: DataFrame,
    corpus: DataFrame,
    threshold: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Daily-ingest admission control: classify each NEW document against
    the EXISTING corpus as ``exact_dup`` (fingerprint collision),
    ``near_dup`` (MinHash-banded Jaccard >= threshold vs any corpus
    doc), or ``new`` (admitted).

    Scale shape: this is the asymmetric version of the self-join dedup —
    the ingest batch is orders of magnitude smaller than the corpus, so
    the band join is new x corpus on the band key (linear, never
    corpus x corpus), the fingerprint check is a semi-join, and in
    production the corpus side reads PREcomputed fingerprint/signature
    artifacts (the staging tables every operator here can emit) instead
    of recomputing them per batch.
    """
    from d2b_dataframework_spark.datapipe.text import fingerprint

    corp_fp = fingerprint(corpus, text_col, id_col).select("fingerprint").distinct()
    new_fp = fingerprint(new, text_col, id_col)
    exact_ids = (
        new_fp.join(corp_fp, "fingerprint", "left_semi")
        .select(F.col(id_col).alias("_eid"))
        .distinct()
    )

    sigs_new = minhash_signatures(new, text_col, id_col, n).cache()
    sigs_corp = minhash_signatures(corpus, text_col, id_col, n).cache()

    def bands_of(sigs, out_id):
        return sigs.select(
            F.col(id_col).alias(out_id),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band_id"),
                            F.concat_ws(
                                "_",
                                *[
                                    F.col(f"mh_{b * ROWS_PER_BAND + r}")
                                    for r in range(ROWS_PER_BAND)
                                ],
                            ).alias("band_key"),
                        )
                        for b in range(N_BANDS)
                    ]
                )
            ).alias("band"),
        ).select(out_id, "band.band_id", "band.band_key")

    cands = (
        bands_of(sigs_new, "_nid")
        .join(bands_of(sigs_corp, "_cid"), ["band_id", "band_key"])
        .select("_nid", "_cid")
        .distinct()
    )
    toks_new = sigs_new.select(F.col(id_col).alias("_nid"), F.col("token_hashes").alias("_tn"))
    toks_corp = sigs_corp.select(F.col(id_col).alias("_cid"), F.col("token_hashes").alias("_tc"))
    near_ids = (
        cands.join(toks_new, "_nid")
        .join(toks_corp, "_cid")
        .filter(F.round(jaccard(F.col("_tn"), F.col("_tc")), 6) >= threshold)
        .select(F.col("_nid").alias("_near_id"))
        .distinct()
    )
    out = (
        new.select(id_col)
        .join(exact_ids, F.col(id_col) == F.col("_eid"), "left")
        .join(near_ids, F.col(id_col) == F.col("_near_id"), "left")
        .select(
            id_col,
            F.when(F.col("_eid").isNotNull(), "exact_dup")
            .when(F.col("_near_id").isNotNull(), "near_dup")
            .otherwise("new")
            .alias("status"),
            (F.col("_eid").isNull() & F.col("_near_id").isNull()).alias("admitted"),
        )
    )
    return cache.track(out, sigs_new, sigs_corp)


def containment_pairs(
    df: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_index_bucket_size: int | None = None,
) -> DataFrame:
    """ASYMMETRIC near-dup detection: containment ``|A∩B| / min(|A|,|B|)``
    catches what Jaccard misses — a short document quoted wholesale
    inside a long one scores near 1.0 on containment while its Jaccard
    stays tiny (the RefinedWeb/CCNet-style subset filter).

    Candidate generation is ANCHOR-PROBE, not a blocked self-join: every
    document probes with its MINIMUM shingle hash; an inverted index
    keyed by ALL shingle hashes answers the probe. A true subset shares
    every shingle with its container, so its min shingle is guaranteed
    to hit — 100%% recall for full containment; partial (≥threshold)
    pairs are found unless the probe's min shingle falls in the missing
    fraction (miss probability ≤ 1 − threshold, documented recall
    bound). Cost: index = total shingle volume (linear scan-explode),
    probe = one row per doc, one equi-join on the hash — never a block²
    pair join. Returns (id_a, id_b, containment) above ``threshold``.

    ``max_index_bucket_size``: optional hot-bucket guard, same mitigation
    as ``cosine_near_dup_pairs(max_bucket_size=…)``. The probe⋈index join
    fans out |probes whose min shingle is h| × |docs containing h|; a
    ubiquitous shingle (boilerplate trigram) that is also some documents'
    MINIMUM hash makes that product quadratic in the boilerplate family
    size (tools/scale_probe.py reproduces the blowup). Capping drops
    index hashes held by more than this many documents before the join.
    Recall tradeoff: a containment pair is missed only when the contained
    doc's min shingle is over-cap — such shingles are corpus boilerplate,
    and families that big should be routed through exact dedup first.
    Default None preserves exact anchor-probe semantics (the SQL oracle).
    """
    hashed = shingle_hashes(text_col, n) if n > 1 else token_hashes(text_col)
    base = df.select(F.col(id_col), hashed.alias("shingles")).persist()
    probe = base.select(
        F.col(id_col).alias("_pid"), F.array_min("shingles").alias("_h")
    )
    index = base.select(
        F.col(id_col).alias("_iid"), F.explode("shingles").alias("_h")
    )
    if max_index_bucket_size is not None:
        # One count-agg on the SAME key the candidate join shuffles on
        # (_h), then drop over-cap hashes before the join fans them out.
        sizes = index.groupBy("_h").agg(F.count(F.lit(1)).alias("_bn"))
        index = (
            index.join(sizes, "_h")
            .filter(F.col("_bn") <= max_index_bucket_size)
            .drop("_bn")
        )
    cand = (
        probe.join(index, "_h")
        .filter(F.col("_pid") != F.col("_iid"))
        .select(
            F.least("_pid", "_iid").alias("id_a"),
            F.greatest("_pid", "_iid").alias("id_b"),
        )
        .distinct()
    )
    a = base.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("_sa"))
    b = base.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("_sb"))
    inter = F.size(F.array_intersect(F.col("_sa"), F.col("_sb"))).cast("double")
    smaller = F.least(F.size("_sa"), F.size("_sb")).cast("double")
    out = (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(inter / smaller, 6).alias("containment"),
        )
        .filter(F.col("containment") >= threshold)
    )
    return cache.track(out, base)


def keep_best(
    corpus: DataFrame,
    pairs: DataFrame,
    quality_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-aware dedup decision: near-dup ``pairs`` → connected
    components → each cluster keeps its HIGHEST-``quality_col`` member
    (ties broken by min id — deterministic), singletons keep themselves.
    This is the selection policy production dedup ships: "drop
    near-duplicates, but keep the best copy, not the arbitrary
    min-id one" (e.g. keep the longest/cleanest variant of a document).

    Returns ``(id_col, cluster_id, keeper_id, kept)`` for EVERY corpus
    row.

    Scale shape: components over id-only pairs (connected_components —
    2 shuffles/round of (id,label)); the keeper election is a window
    over ``cluster_id`` — partition sizes are CLUSTER sizes (bounded by
    the near-dup family size, not the corpus), so no single-partition
    window exists. Docs outside any pair never enter the window: they
    short-circuit to keeper=self via the left join.
    """
    comp = connected_components(pairs)
    labeled = corpus.select(F.col(id_col), F.col(quality_col)).join(
        comp.withColumnRenamed("doc_id", id_col), id_col, "left"
    )
    clustered = labeled.filter(F.col("cluster_id").isNotNull())
    from pyspark.sql import Window

    w = Window.partitionBy("cluster_id").orderBy(
        F.col(quality_col).desc(), F.col(id_col).asc()
    )
    elected = clustered.withColumn("_rn", F.row_number().over(w))
    keepers = elected.filter(F.col("_rn") == 1).select(
        F.col("cluster_id").alias("_kc"), F.col(id_col).alias("_keeper")
    )
    decided = elected.join(keepers, elected.cluster_id == F.col("_kc")).select(
        id_col,
        "cluster_id",
        F.col("_keeper").alias("keeper_id"),
        (F.col(id_col) == F.col("_keeper")).alias("kept"),
    )
    singles = labeled.filter(F.col("cluster_id").isNull()).select(
        id_col,
        F.col(id_col).alias("cluster_id"),
        F.col(id_col).alias("keeper_id"),
        F.lit(True).alias("kept"),
    )
    return cache.track(decided.unionByName(singles), comp)


def soft_dedup_weights(
    corpus: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    decimals: int = 6,
) -> DataFrame:
    """Soft deduplication: instead of dropping near-duplicates, every
    document keeps a TRAINING WEIGHT of 1/|its near-dup cluster| (the
    "count each semantic unit once in expectation" policy — preserves
    coverage while removing duplication bias; singletons weigh 1.0).

    Returns (id_col, cluster_id, cluster_size, weight) for EVERY corpus
    row. Scale shape: connected components over id-only ``pairs`` (the
    candidate graph from any pair builder), one count per cluster
    (groupBy on cluster ids — cluster-count-sized), one broadcast-back
    join keyed on cluster_id; docs outside any pair never shuffle at
    all beyond the left join.
    """
    comp = connected_components(pairs)
    sizes = comp.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    labeled = corpus.select(F.col(id_col)).join(
        comp.withColumnRenamed("doc_id", id_col), id_col, "left"
    )
    clustered = labeled.filter(F.col("cluster_id").isNotNull()).join(
        sizes, "cluster_id"
    )
    singles = labeled.filter(F.col("cluster_id").isNull()).select(
        id_col,
        F.col(id_col).alias("cluster_id"),
        F.lit(1).cast("long").alias("cluster_size"),
    )
    out = clustered.select(id_col, "cluster_id", "cluster_size").unionByName(
        singles
    )
    return cache.track(
        out.select(
            id_col,
            "cluster_id",
            "cluster_size",
            F.round(F.lit(1.0) / F.col("cluster_size"), decimals).alias("weight"),
        ),
        comp,
    )


def lsh_recall_eval(
    df: DataFrame,
    threshold: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Candidate-generation quality audit for the MinHash-LSH pipeline:
    on an AUDIT SAMPLE (caller bounds the input — the ground truth is
    all-pairs exact Jaccard, quadratic by definition, same contract as
    similarity.ann_recall's brute-force leg), measure how many true
    near-dup pairs (shingle Jaccard >= threshold) the banding actually
    surfaces as candidates.

    Returns ONE row: n_true, n_candidates, n_hit, recall (hit/true) and
    candidate_precision (hit/candidates) — the two dials that justify a
    band/row configuration before trusting it at 100 TB. Production
    guidance: run this on a fixed few-thousand-doc sample per corpus
    snapshot; the sample cost is constant while the pipeline it
    certifies is corpus-sized.

    Scale shape: ONE signature pass feeds both legs (persisted by the
    caller if reused); candidates come from the banded self-join
    (linear), truth from the sample-bounded all-pairs join; the final
    metrics are three 1-row counts — no data-sized collect.
    """
    sigs = minhash_signatures(df, text_col=text_col, id_col=id_col, n=n)
    hashes = sigs.select(F.col(id_col), "token_hashes")
    # All-pairs as an EQUI-join (no CartesianProduct node): bucket side B
    # by id, explode side A onto every bucket — the join shuffles on the
    # bucket key, spreading the quadratic audit work across partitions
    # instead of funneling it through one nested-loop task.
    grid = 16
    a = hashes.select(
        F.col(id_col).alias("id_a"),
        F.col("token_hashes").alias("_ha"),
        F.explode(F.array(*[F.lit(g) for g in range(grid)])).alias("_g"),
    )
    b = hashes.select(
        F.col(id_col).alias("id_b"),
        F.col("token_hashes").alias("_hb"),
        # bucket on a portable hash of the id so STRING ids bucket too
        # (id % 16 silently yields NULL for strings and the equi-join
        # would then match nothing — a misleading n_true=0 audit)
        F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(grid))
        .cast("int")
        .alias("_g"),
    )
    truth = (
        a.join(b, "_g")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.round(jaccard(F.col("_ha"), F.col("_hb")), 6) >= F.lit(threshold)
        )
        .select("id_a", "id_b")
    )
    cands = lsh_candidate_pairs(sigs, id_col=id_col)
    hit = truth.join(cands, ["id_a", "id_b"], "left_semi")
    n_true = truth.agg(F.count(F.lit(1)).cast("long").alias("n_true"))
    n_cand = cands.agg(F.count(F.lit(1)).cast("long").alias("n_candidates"))
    n_hit = hit.agg(F.count(F.lit(1)).cast("long").alias("n_hit"))
    return (
        n_true.crossJoin(n_cand)
        .crossJoin(n_hit)
        .select(
            "n_true",
            "n_candidates",
            "n_hit",
            F.when(
                F.col("n_true") > 0,
                F.round(
                    F.col("n_hit").cast("double") / F.col("n_true").cast("double"), 6
                ),
            ).alias("recall"),
            F.when(
                F.col("n_candidates") > 0,
                F.round(
                    F.col("n_hit").cast("double")
                    / F.col("n_candidates").cast("double"),
                    6,
                ),
            ).alias("candidate_precision"),
        )
    )


def prefix_filter_pairs(
    df: DataFrame,
    threshold: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """EXACT word-set Jaccard >= threshold pairs via prefix filtering
    (PPJoin-style set-similarity join, Chaudhuri/Xiao-Wang lineage):
    each doc's distinct tokens are globally ordered by ascending
    document frequency; a pair with J >= t MUST share a token inside
    each side's first ``sz - ceil(t*sz) + 1`` tokens (the prefix), so
    candidates come from an equi-join on PREFIX tokens only — and
    because the ordering puts the RAREST tokens first, prefix buckets
    are small by construction (the frequent-token hot buckets that
    break naive token blocking never enter the join). Unlike
    MinHash-LSH this is exact: no missed pairs, no verification
    false-positive rate to tune — the complementary dedup tool when
    recall must be 1.0.

    Scale shape: one token-df agg (vocab-sized), one explode+join to
    attach dfs, one per-doc sort_array regroup, a prefix-token
    equi-join (small buckets), and an array-intersect verify on the
    candidate pairs. No all-pairs stage anywhere. ceil(t*sz) is IEEE
    double math — identical in the oracle.

    Returns (id_a, id_b, jaccard_sim) for pairs with J >= threshold.

    ``n`` is the shingle width. n=1 (word sets) is only safe on
    large-vocabulary corpora: on low-vocab text every doc's "rarest"
    words are still shared by many docs, prefix buckets go hot, and the
    candidate join degenerates — the SAME failure mode as word-set
    MinHash (see :func:`shingles`). n>=3 makes the element space
    |vocab|^n, so ascending-df prefixes are near-unique by
    construction; similarity becomes shingle Jaccard (the measure the
    MinHash path verifies, making the two directly comparable).
    """
    # Operate on 28-bit md5-prefix HASHES of the shingles, not the
    # shingle strings: every downstream stage (df agg, per-doc sort,
    # prefix equi-join, intersect/union verify) compares int64 instead
    # of ~20-byte strings, and the shingle+hash computation itself runs
    # in the Arrow-batched twin (interpreted HOF md5-per-gram measured
    # ~10x slower). Same portable hash kernel as MinHash;
    # distinct-after-hash keeps set semantics under collisions on BOTH
    # engines (the oracle replays list_distinct after hashing).
    toks = shingle_hash_frame(df, text_col=text_col, id_col=id_col, n=n).select(
        F.col(id_col), F.col("token_hashes").alias("_ts")
    )
    # The hash frame feeds THREE consumers (df counts, the ordered
    # regroup, and — via ordered — both verify sides); unpersisted, the
    # Arrow pass re-executes once per plan subtree (8 stages in the
    # audit, measured ~10x the persisted cost). Tracked for release.
    toks = toks.persist()
    flat = toks.select(F.col(id_col), F.explode("_ts").alias("_t"))
    dfreq = flat.groupBy("_t").agg(F.count(F.lit(1)).cast("long").alias("_df"))
    ordered = (
        flat.join(dfreq, "_t")
        .groupBy(id_col)
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("_df"), F.col("_t").alias("t")))
                ),
                lambda x: x["t"],
            ).alias("_ots"),
            F.count(F.lit(1)).cast("long").alias("_sz"),
        )
    )
    ordered = ordered.persist()
    p_len = (
        F.col("_sz")
        - F.ceil(F.lit(float(threshold)) * F.col("_sz").cast("double")).cast("long")
        + 1
    )
    pref = ordered.select(
        F.col(id_col),
        F.col("_sz"),
        F.explode(F.slice("_ots", 1, p_len.cast("int"))).alias("_t"),
    )
    a = pref.select(F.col(id_col).alias("id_a"), F.col("_sz").alias("_sza"), "_t")
    b = pref.select(F.col(id_col).alias("id_b"), F.col("_sz").alias("_szb"), "_t")
    # PPJoin LENGTH filter: J = |A∩B|/|A∪B| <= min(sz)/max(sz), so a
    # pair can only reach J >= t when each side's size is >= t x the
    # other's. Applied INSIDE the candidate join it prunes pairs before
    # the distinct and the array_intersect verify (the fan-in the r6
    # verdict measured as the suite's slowest stage). The epsilon keeps
    # the filter LOSSLESS relative to the verify arbiter, which accepts
    # round(inter/union, 6) >= t: a pair with true J as low as t - 5e-7
    # ROUND-passes verify, and J <= min(sz)/max(sz), so the filter must
    # keep every pair with size ratio >= t - 5e-7.  5.1e-7 covers that
    # 6dp rounding slack plus the IEEE error of t*sz itself (the old
    # 1e-9 covered only the latter and could prune a round-passing pair
    # once unions reach ~1e6 shingles — real at the 100 TB target).
    t_eps = float(threshold) - 5.1e-7
    cands = (
        a.join(
            b,
            (a["_t"] == b["_t"])
            & (F.col("id_a") < F.col("id_b"))
            & (F.col("_sza").cast("double") >= F.lit(t_eps) * F.col("_szb").cast("double"))
            & (F.col("_szb").cast("double") >= F.lit(t_eps) * F.col("_sza").cast("double")),
        )
        .select("id_a", "id_b")
        .distinct()
    )
    sa = ordered.select(F.col(id_col).alias("id_a"), F.col("_ots").alias("_oa"))
    sb = ordered.select(F.col(id_col).alias("id_b"), F.col("_ots").alias("_ob"))
    verified = (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.size(F.array_intersect("_oa", "_ob")).cast("double")
                / F.size(F.array_union("_oa", "_ob")).cast("double"),
                6,
            ).alias("jaccard_sim"),
        )
        .filter(F.col("jaccard_sim") >= F.lit(float(threshold)))
    )
    return cache.track(verified, ordered, toks)


def lsh_design_table(
    spark,
    n_perm: int = N_HASHES,
    s_grid: tuple[float, ...] = (0.5, 0.6, 0.7, 0.75, 0.8, 0.85, 0.9, 0.95),
):
    """The MinHash-LSH parameter planner: for every (bands, rows) split
    of an ``n_perm``-permutation signature, the candidate probability
    ``P(pair surfaces | jaccard = s) = 1 - (1 - s^r)^b`` across the
    ``s_grid``, plus the S-curve's 50% point ``(1/b)^(1/r)`` — the
    table you read BEFORE running minhash_duplicate_pairs to pick the
    banding for a target threshold (false-positive mass below the
    target = verify-stage cost; false-negative mass above = missed
    dups). Pure closed-form over a |divisors(n_perm)| x |s_grid|
    literal grid — no data scan; the planning twin of the empirical
    lsh_recall_eval audit."""
    combos = [(b, n_perm // b) for b in range(1, n_perm + 1) if n_perm % b == 0]
    grid = spark.createDataFrame(
        [(b, r, s) for b, r in combos for s in s_grid],
        "bands int, rows_per_band int, s double",
    )
    b = F.col("bands").cast("double")
    r = F.col("rows_per_band").cast("double")
    return grid.select(
        F.col("bands").cast("long").alias("bands"),
        F.col("rows_per_band").cast("long").alias("rows_per_band"),
        "s",
        F.round(
            F.lit(1.0) - F.pow(F.lit(1.0) - F.pow(F.col("s"), r), b), 6
        ).alias("p_candidate"),
        F.round(F.pow(F.lit(1.0) / b, F.lit(1.0) / r), 6).alias("threshold_est"),
    ).orderBy("bands", "s")


def shingle_dup_mass(
    df: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "lang",
) -> DataFrame:
    """Corpus-level duplicate-shingle pressure per group: of all
    (document, distinct n-gram) incidences, how much mass sits on
    shingles shared by MORE than one document — the single dial that
    says "this slice needs near-dedup before training" (decontaminate
    answers cross-corpus overlap; segment_dup_stats scores documents;
    this scores the CORPUS). Counts are document frequencies (each doc
    contributes a shingle once, so a doc repeating its own boilerplate
    doesn't masquerade as cross-doc duplication).

    Scale shape: the word-count shape end to end — explode per-doc
    distinct shingle hashes, one (group, gram) count shuffle with
    map-side combine (the duplicated grams ARE the heavy keys partial
    aggregation absorbs), one group re-agg over the gram-vocabulary
    frame. Linear in corpus bytes.
    """
    grams = df.select(
        F.col(group_col).alias("g"),
        tokens(text_col).alias("toks"),
    ).select(
        "g", F.explode(shingle_hashes("toks", n, pre_tokenized=True)).alias("gram")
    )
    gram_df = grams.groupBy("g", "gram").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    return (
        gram_df.groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum(F.when(F.col("df") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_shared_grams"),
            F.sum("df").cast("long").alias("total_incidences"),
            F.sum(F.when(F.col("df") > 1, F.col("df")).otherwise(0))
            .cast("long")
            .alias("shared_incidences"),
        )
        .select(
            F.col("g").alias(group_col),
            "n_grams",
            "n_shared_grams",
            "total_incidences",
            "shared_incidences",
            F.round(
                F.col("shared_incidences").cast("double")
                / F.col("total_incidences").cast("double"),
                6,
            ).alias("dup_mass_share"),
        )
    )


def idf_weighted_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    max_df: int = 50,
) -> DataFrame:
    """IDF-WEIGHTED set-similarity self-join: weighted Jaccard
    ``Σ_{g∈A∩B} w_g / Σ_{g∈A∪B} w_g`` with ``w_g = ln(N/df_g)`` — rare
    shingles count for more, so templated corpora (whose unweighted
    Jaccard is inflated by boilerplate) separate cleanly from genuine
    near-duplicates.  The standard refinement of plain Jaccard in
    near-dup mining (same weighting TF-IDF applies to retrieval).

    The measure is defined over shingles with ``df <= max_df`` — the
    boilerplate-EXCLUDED weighted Jaccard (ubiquitous grams carry
    negligible idf anyway, and excluding them is what keeps the
    candidate join linear: every kept shingle touches at most
    ``max_df`` docs, so bucket fan-out is bounded).  Candidates come
    from the kept-shingle equi-join; the verify arithmetic is
    order-free (weights rounded to 9 decimals, summed as
    DECIMAL(28,9)), so a DuckDB replay matches bit-for-bit.

    Scale shape: explode → df count (map-side combine) → bounded
    equi-join → per-pair agg.  No all-pairs stage; N is one driver-side
    count (a single long, same pattern as quantile_normalize's n).
    """
    n_docs = df.count()
    flat = shingle_hash_frame(df, text_col, id_col, n).select(
        F.col(id_col), F.explode("token_hashes").alias("_g")
    )
    dfreq = (
        flat.groupBy("_g")
        .agg(F.count(F.lit(1)).cast("long").alias("_df"))
        .filter(F.col("_df") <= max_df)
    )
    # Weights ride as SCALED LONGS (w * 1e9, classify._scale9 form), not
    # DECIMAL(28,9): the candidate join fans each gram out df-ways and
    # the per-pair partial aggregation over that fan-out was allocating
    # one BigDecimal per joined row — the query's dominant cost AND its
    # GC-jitter source (idle medians swung 5.7–13.6 s; optimization
    # guide §2.3 "narrower types"). Long sums are exact integers, so the
    # final ratio is the same rational as the decimal form; overflow
    # would need ~2.3e8 grams in ONE document/pair intersection
    # (|w9| <= ln(N)*1e9 ~ 4e10 at N=1e16), far past any real document.
    from d2b_dataframework_spark.datapipe.classify import _scale9

    w9 = _scale9(F.log(F.lit(float(n_docs)) / F.col("_df").cast("double")))
    weighted = flat.join(dfreq, "_g").select(id_col, "_g", w9.alias("_w9"))
    # Persisted once: the per-doc totals, both join sides, and the pair
    # agg all read it. Tracked for release.
    weighted = weighted.persist()
    totals = weighted.groupBy(id_col).agg(F.sum("_w9").alias("_W9"))
    a = weighted.select(F.col(id_col).alias("id_a"), "_g", F.col("_w9").alias("_wa9"))
    b = weighted.select(F.col(id_col).alias("id_b"), F.col("_g").alias("_gb"))
    inter = (
        a.join(b, (a["_g"] == b["_gb"]) & (F.col("id_a") < F.col("id_b")))
        .groupBy("id_a", "id_b")
        .agg(F.sum("_wa9").alias("_i9"))
    )
    out = (
        inter.join(totals.withColumnsRenamed({id_col: "id_a", "_W9": "_Wa9"}), "id_a")
        .join(totals.withColumnsRenamed({id_col: "id_b", "_W9": "_Wb9"}), "id_b")
        .select(
            "id_a",
            "id_b",
            # the 1e9 scale cancels exactly in the rational, so the
            # ratio of scaled longs is the same value; both legs replay
            # this exact cast/divide sequence
            F.round(
                F.col("_i9").cast("double")
                / (F.col("_Wa9") + F.col("_Wb9") - F.col("_i9")).cast("double"),
                6,
            ).alias("weighted_jaccard"),
        )
        .filter(F.col("weighted_jaccard") >= F.lit(float(threshold)))
    )
    return cache.track(out, weighted)
