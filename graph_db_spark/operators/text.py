"""Text-analysis operators for training-data pipelines.

All built-in expressions (single scan, no shuffle except final aggs):
token/char statistics, quality scoring, n-gram-profile language ID,
rolling-hash document fingerprinting. Designed so every result is
reproducible in ANSI SQL for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

WS = r"\s+"

# Tiny per-language marker vocabularies for the stopword-count heuristic —
# the classic cheap language-ID: count language-distinctive tokens, argmax
# wins, deterministic tie-break. (The driver's synthetic corpus shares one
# vocabulary across its ``lang`` labels, so these markers are arbitrary
# disjoint subsets of that vocabulary: the *operator* — scoring + argmax —
# is what's exercised and oracle-checked, not real-world accuracy.)
LANG_MARKERS = {
    "en": ["the", "a", "table", "row", "order"],
    "de": ["hash", "join", "batch", "key"],
    "fr": ["scan", "data", "query", "line"],
    "es": ["slow", "agg", "merge", "vector"],
    "zh": ["small", "customer", "column", "stream"],
}


def token_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document token/char statistics: n_tokens, n_distinct_tokens,
    n_chars, avg_token_len, punct ratio — one pass, no shuffle."""
    toks = F.filter(F.split(F.col(text_col), WS), lambda t: t != "")
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.length(F.col(text_col)).alias("n_chars_measured"),
        F.round(
            F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))
            / F.greatest(F.size(toks), F.lit(1)),
            4,
        ).alias("avg_token_len"),
        (
            F.length(F.col(text_col))
            - F.length(F.regexp_replace(F.col(text_col), r"[.,;:!?]", ""))
        ).alias("n_punct"),
    )


def quality_expr(text):
    """The quality formula as a ROW-LOCAL column expression (length band
    + type-token ratio − punctuation excess, deterministic arithmetic) —
    usable inside a streaming projection; ``quality_score`` is its batch
    DataFrame wrapper and the oracle target."""
    toks = F.filter(F.split(text, WS), lambda t: t != "")
    n_tokens = F.size(toks)
    n_punct = F.length(text) - F.length(F.regexp_replace(text, r"[.,;:!?]", ""))
    return F.round(
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.5
        + (F.size(F.array_distinct(toks)) / F.greatest(n_tokens, F.lit(1))) * 0.4
        - F.least(n_punct / F.greatest(F.length(text), F.lit(1)), F.lit(0.1)),
        6,
    )


def quality_score(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic quality score in [0,1]: length band + type-token ratio −
    punctuation excess. Deterministic integer/decimal arithmetic so the
    oracle reproduces it exactly."""
    return df.select(F.col(id_col), quality_expr(F.col(text_col)).alias("quality"))


def langid_struct(text):
    """Marker-token language ID as a ROW-LOCAL column expression:
    STRUCT(score, lang) of the argmax language (tie-break: higher count,
    then language code via array_max's struct ordering)."""
    toks = F.filter(F.split(F.lower(text), WS), lambda t: t != "")
    scores = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        arr = F.array(*[F.lit(m) for m in markers])
        cnt = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
        scores.append(F.struct(cnt.alias("score"), F.lit(lang).alias("lang")))
    return F.array_max(F.array(*scores))


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Marker-token language ID: per language, count tokens in its marker
    list; argmax with deterministic tie-break (higher count, then language
    code). Returns (id, pred_lang, score)."""
    best = langid_struct(F.col(text_col))
    return df.select(
        F.col(id_col),
        best["lang"].alias("pred_lang"),
        best["score"].cast("long").alias("score"),
    )


# PII patterns chosen for regex-dialect portability (Java regex on the
# Spark side, RE2 in the DuckDB oracle): character classes, bounded
# quantifiers and \b only — no lookaround, no backreferences.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
}


def pii_scrub(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """PII detection + redaction (the compliance pass every training-data
    pipeline runs before tokenization): per document, count matches of
    each PII category and replace them with ``[CATEGORY]`` placeholders.

    Whole-stage-codegen expressions only (regexp_count/regexp_replace run
    JVM-side) — one scan, zero shuffle, so at 100 TB this is a pure
    map-stage that rides along with whatever scan already happens.
    Categories are applied in sorted-name order so redaction is
    deterministic when patterns overlap (email before ipv4 before phone:
    an address inside an email match is consumed by the email rewrite
    first on both engines).
    """
    pats = dict(sorted((patterns or PII_PATTERNS).items()))
    out = F.col(text_col)
    counts = []
    for name, pat in pats.items():
        counts.append(F.regexp_count(out, F.lit(pat)).alias(f"n_{name}"))
        out = F.regexp_replace(out, pat, f"[{name.upper()}]")
    return df.select(F.col(id_col), *counts, out.alias("redacted"))


def chunk_tokens(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk: int = 32,
    overlap: int = 8,
) -> DataFrame:
    """RAG-style strided chunker: split the token stream into windows of
    *chunk* tokens advancing by ``chunk - overlap``, re-joined to chunk
    text. The tail chunk keeps whatever remains (>= 1 token), so every
    token lands in at least one chunk.

    Plan shape is scan -> project -> posexplode, no shuffle: chunking is
    embarrassingly parallel per document and stays that way at 100 TB.
    Returns (id, chunk_id, n_chunk_tokens, chunk_text).
    """
    if not 0 <= overlap < chunk:
        raise ValueError(f"need 0 <= overlap < chunk, got {overlap=} {chunk=}")
    step = chunk - overlap
    toks = F.filter(F.split(F.col(text_col), WS), lambda t: t != "")
    starts = F.sequence(
        F.lit(0),
        # last start: largest multiple of step covering a non-empty,
        # not-fully-overlapped tail; single short doc => one chunk at 0
        F.greatest(
            F.floor((F.size(toks) - F.lit(overlap) - 1) / F.lit(step)).cast("int"),
            F.lit(0),
        )
        * step,
        F.lit(step),
    )
    return (
        df.select(F.col(id_col), toks.alias("__toks"), starts.alias("__starts"))
        .filter(F.size("__toks") > 0)
        .select(
            F.col(id_col),
            F.posexplode(
                F.transform(F.col("__starts"), lambda s: F.slice(F.col("__toks"), s + 1, chunk))
            ).alias("chunk_id", "__piece"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_id"),
            F.size("__piece").alias("n_chunk_tokens"),
            F.concat_ws(" ", "__piece").alias("chunk_text"),
        )
    )


def fingerprint(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", shingle: int = 3, keep: int = 4
) -> DataFrame:
    """Winnowing-style document fingerprint: the *keep* lexicographically
    smallest md5 hashes of word k-shingles, concatenated. Robust to small
    edits; portable (md5 + array ops both engines)."""
    toks = F.filter(F.split(F.col(text_col), WS), lambda t: t != "")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - shingle, F.lit(0)))
    shingles = F.transform(
        idx, lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i + 1, shingle)))
    )
    return df.select(
        F.col(id_col),
        F.concat_ws("|", F.slice(F.array_sort(F.array_distinct(shingles)), 1, keep)).alias(
            "fingerprint"
        ),
    )


def dsir_weights(
    df: DataFrame,
    target_flag: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
    keep_cols: tuple[str, ...] = (),
    checkpoint: bool = True,
) -> DataFrame:
    """DSIR (Xie et al. 2023, arXiv:2302.03169) hashed-n-gram importance
    weights: fit bag-of-hashed-tokens unigram models over *n_buckets*
    md5 buckets with add-one smoothing for the TARGET slice (rows where
    boolean column *target_flag* is true) and the RAW corpus, then score
    every document with sum_b c_b * ln(p_target(b) / p_raw(b)).

    Returns (id_col, *keep_cols, dsir_weight, gumbel_key, selected) for
    EVERY input document — a zero-token doc (empty/whitespace text)
    scores its empty-sum weight of 0 with selected=true, it is never
    dropped. `gumbel_key` is the paper's Gumbel-perturbed resampling key
    made deterministic (uniform u from a 52-bit md5 hash of the id
    instead of RNG) so downstream top-k resampling is one orderBy/limit;
    `selected` is the row-local likelihood-ratio verdict (weight >= 0).

    Cross-engine determinism: per-bucket log-ratios are rounded to 6dp
    and the per-doc sum runs in DECIMAL (exact multiples of 1e-6 →
    order-independent), so a DuckDB twin reproduces the weights exactly.

    100 TB shape: token explode → ONE shuffle keyed (id, bucket) for the
    per-doc counts; the two feature models are n_buckets-row aggregates
    broadcast back; the per-doc sum shuffles fixed-width rows. No global
    sort — ranking is deferred to the gumbel_key top-k.

    *checkpoint* (default True) localCheckpoints the per-(doc, bucket)
    count frame so the model and weighting branches share one corpus
    scan. Caveats: the cut EXECUTES Spark jobs at plan-construction time,
    and localCheckpoint blocks are lost on executor failure (unlike
    reliable checkpoints). Pass checkpoint=False when merely composing
    plans or on preemptible executors."""
    from graph_db_spark.functions.text import ws_tokens

    def hex_int(col, n):
        return F.conv(F.substring(col, 1, n), 16, 10).cast("long")

    # explode_outer + null-drop: keeps InferFiltersFromGenerate from
    # re-evaluating the tokenize in an inferred pushed filter (see
    # operators.dedup.tokens).
    toks = df.select(
        F.col(id_col).alias("id"),
        F.col(target_flag).alias("_tgt"),
        *[F.col(c) for c in keep_cols],
        F.explode_outer(ws_tokens(F.lower(F.col(text_col)))).alias("token"),
    ).filter(F.col("token").isNotNull())
    bk = toks.withColumn(
        "bucket",
        hex_int(F.md5(F.concat(F.lit("dsir|"), F.col("token"))), 8) % n_buckets,
    ).drop("token")
    # ONE corpus-wide explode + shuffle: the per-(doc, bucket) counts,
    # materialized (localCheckpoint — per-branch column pruning would
    # otherwise give the model and weighting branches differently-pruned
    # copies of this subtree and re-scan the corpus three times; exchange
    # reuse cannot kick in across different pruned schemas). Both feature
    # models and their totals then derive from this already-collapsed
    # frame (a bucket-keyed agg over ~n_docs*distinct-buckets rows, then
    # a 1-row sum over the n_buckets-row model) — never a second scan or
    # shuffle of the raw token stream.
    per_doc = bk.groupBy("id", "_tgt", *keep_cols, "bucket").agg(
        F.count(F.lit(1)).alias("c")
    )
    if checkpoint:
        per_doc = per_doc.localCheckpoint(eager=True)
    model = per_doc.groupBy("bucket").agg(
        F.sum("c").alias("cq"),
        F.sum(F.when(F.col("_tgt"), F.col("c")).otherwise(0)).alias("ct"),
    )
    tot = model.groupBy().agg(
        F.sum("cq").alias("tot_q"), F.sum("ct").alias("tot_t")
    )
    lam = (
        model.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.round(
                F.log(
                    (F.col("ct") + 1).cast("double")
                    * (F.col("tot_q") + n_buckets)
                    / ((F.col("cq") + 1).cast("double") * (F.col("tot_t") + n_buckets))
                ),
                6,
            ).alias("lam"),
        )
    )
    sums = (
        per_doc.join(F.broadcast(lam), "bucket")
        .groupBy("id")
        .agg(F.sum(F.col("lam").cast("decimal(18,6)") * F.col("c")).alias("wsum"))
    )
    # LEFT join back to the full doc list: a zero-token document (empty /
    # all-whitespace text) emits no rows at the explode, and without this
    # re-anchor it would VANISH from the output instead of scoring its
    # correct empty-sum weight of 0 (selected=true) — silently excluded
    # from any downstream gumbel top-k.
    base = df.select(F.col(id_col).alias("id"), *[F.col(c) for c in keep_cols])
    wts = base.join(sums, "id", "left").select(
        "id",
        *keep_cols,
        F.coalesce(F.col("wsum").cast("double"), F.lit(0.0)).alias("dsir_weight"),
    )
    u = (
        hex_int(F.md5(F.concat(F.lit("g|"), F.col("id").cast("string"))), 13)
        + F.lit(0.5)
    ) / F.lit(4503599627370496.0)
    return wts.select(
        F.col("id").alias(id_col),
        *keep_cols,
        "dsir_weight",
        F.round(F.col("dsir_weight") - F.log(-F.log(u)), 6).alias("gumbel_key"),
        (F.col("dsir_weight") >= 0).alias("selected"),
    )
