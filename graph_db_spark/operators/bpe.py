"""Distributed BPE tokenizer: fit AND apply on the cluster.

Fit is the standard train-a-tokenizer-at-scale loop: the corpus collapses
to a word-frequency table once (vocabulary-sized state, corpus counts as
weights — the same trick as queries.bpe_merge_pair_counts), then each
merge step is one map-side-combinable pair count + one fold that rewrites
every word's symbol array. All set-oriented; the driver only picks the
argmax pair per step.

Apply comes in two forms:

- ``bpe_encode_expr``  — the merge rules unrolled into chained
  ``aggregate`` folds (pure column expressions, whole-stage codegen, and
  reproducible in DuckDB via ``list_reduce`` — the oracle path). Sound
  because BPE encoding applies merges in learned order: a rule's operand
  tokens can only be produced by EARLIER rules (a pair containing token
  "ab" is learnable only after "ab" exists), so sequential application in
  rank order equals the classic lowest-rank-first algorithm. Practical to
  ~a few dozen rules before expression depth dominates.
- ``bpe_encode``       — the scale path for real vocabularies (10k+
  merges): an Arrow-batched pandas UDF holding the rank table once per
  executor, with a per-batch word cache (Zipf makes the cache hit rate
  ~99%). This is the genuinely non-SQL-expressible loop the UDF tier
  exists for; everything around it stays in JVM expressions.

No reference analogue (the reference is an OLTP graph store); part of the
LLM-training-data suite alongside queries.bpe_merge_pair_counts (the
single-step fit kernel).
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf resolves 'pd.Series' hints here
from pyspark.sql import Column, DataFrame, functions as F

from graph_db_spark.functions.text import ws_tokens

__all__ = ["bpe_encode", "bpe_encode_expr", "char_symbols", "fit_bpe", "merge_pair"]


def char_symbols(word: Column) -> Column:
    """ARRAY<STRING> of single characters of *word* (1 element per char)."""
    return F.transform(
        F.sequence(F.lit(1), F.length(word)), lambda i: F.substring(word, i, F.lit(1))
    )


def merge_pair(symbols: Column, a: str, b: str) -> Column:
    """One BPE merge rule applied to a symbol array: every adjacent
    (a, b) becomes a+b, left-to-right, non-overlapping ("aaa" + rule
    (a,a) → ["aa","a"]). A single ``aggregate`` fold — no UDF, and
    bit-reproducible in DuckDB as a ``list_reduce`` (see the
    bpe_encode_fixed_rules oracle)."""
    # Single fold from an EMPTY accumulator, so *symbols* is referenced
    # exactly once — chaining n rules then nests linearly instead of
    # duplicating the whole upstream expression per reference (4 refs per
    # rule would blow up 4^n and hang analysis). F.get returns NULL on the
    # empty accumulator (no ANSI index error), which falls through to the
    # append branch.
    merged = F.lit(a + b)
    return F.aggregate(
        symbols,
        F.expr("cast(array() as array<string>)"),
        lambda acc, s: F.when(
            (F.get(acc, F.size(acc) - 1) == F.lit(a)) & (s == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def encode_word_expr(word: Column, merges: list[tuple[str, str]]) -> Column:
    """Symbol array of *word* after applying *merges* in rank order —
    chained folds, expression-only."""
    syms = char_symbols(word)
    for a, b in merges:
        syms = merge_pair(syms, a, b)
    return syms


def bpe_encode_expr(
    text: Column, merges: list[tuple[str, str]], word_sep: str = " ", tok_sep: str = "_"
) -> Column:
    """Encode a document: lower-cased whitespace words, each BPE-encoded
    by *merges*; tokens joined by *tok_sep* within a word and *word_sep*
    across words (a flat STRING so the result is hash-comparable across
    engines)."""
    words = ws_tokens(F.lower(text))
    return F.concat_ws(
        word_sep,
        F.transform(words, lambda w: F.concat_ws(tok_sep, encode_word_expr(w, merges))),
    )


def _fit_bpe_local(
    word_freqs: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """Driver-local BPE fit over an already-aggregated (word, freq) table.

    Bit-identical to the distributed loop: the same overlapping
    adjacent-pair count (weighted by word frequency), the same argmax
    tie-break (count desc, then pair asc — Python code-point order equals
    Spark's UTF8 binary order because UTF-8 is order-preserving), and the
    same left-to-right non-overlapping merge fold as ``merge_pair``."""
    state = [(list(w), n) for w, n in word_freqs]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, n in state:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + n
        if not counts:
            break
        a, b = min(counts, key=lambda p: (-counts[p], p[0], p[1]))
        merges.append((a, b))
        new_state = []
        for syms, n in state:
            acc: list[str] = []
            for s in syms:
                if acc and acc[-1] == a and s == b:
                    acc[-1] = a + b
                else:
                    acc.append(s)
            new_state.append((acc, n))
        state = new_state
    return merges


# Word-frequency tables at or under this row count are pulled to the
# driver and fitted locally in ONE Spark job total; larger vocabularies
# keep the distributed per-merge loop. 200k (word, count) rows ≈ a few MB
# — trivially driver-safe, while a real web-scale corpus (hundreds of
# millions of distinct "words" before merging) stays on the cluster.
FIT_LOCAL_MAX_WORDS = 200_000

# Max merges accepted per distributed round (see _select_merge_batch).
FIT_BATCH_CAP = 16


def _select_merge_batch(
    rows: list[tuple[str, str, int]],
    cap: int,
    known_tokens: set[str],
    exact: bool = True,
) -> list[tuple[str, str]]:
    """Pick the merges one pair-count table can SAFELY commit in a single
    round, guaranteed identical to running the sequential argmax loop.

    *rows* is the head of the pair-count table sorted exactly like the
    sequential argmax (count desc, a asc, b asc); *known_tokens* is the
    set of multi-char token strings already in the vocabulary (= concats
    of all merges so far — the initial alphabet is single chars, so every
    multi-char token string is some earlier merge's concat, exactly
    trackable on the driver). The batch is the maximal PREFIX of the
    sorted order in which every pair is non-interacting, trimmed by a
    strict-count guard. Proof of equality to the sequential loop:

    - Non-interaction within the batch: a later pair may not reuse an
      earlier accepted pair's operand symbols OR its concat string
      (operand reuse → occurrences could overlap positionally; concat
      reuse as an operand → the earlier merge manufactures the later
      pair's input; equal concats → two rules manufacture the same
      token string). Under this rule the accepted merges touch disjoint
      positions, commute, and none of their counts change while the
      others apply — so applying them chained equals applying each as a
      sequential argmax step.
    - Everything NOT accepted is bounded: merging an accepted p=(a,b)
      only (i) lowers counts of pairs sharing a symbol with p and
      (ii) creates occurrences of pairs involving the token a+b. When
      a+b is a BRAND-NEW string (enforced: a+b ∉ known_tokens, and not
      another accepted concat), such pairs start from count 0 and gain
      at most the count of the LINKING pair between adjacent merge
      sites (each new (x, ab) occurrence was an (x, a) occurrence;
      (ab, ab) occurrences come from (b, a) links). For a ≠ b those
      linking pairs share a symbol with p, are therefore unaccepted,
      and are bounded by c* — the count of the first candidate after
      the accepted prefix. For a SELF-SYMBOL pair (a == b) the linking
      pair over a run is p ITSELF ("bbb" → [bb, b] creates (bb, b)
      with count derived from p's own count, > c*), so a self-symbol
      pair may only be the LAST member of a batch: at its simulated
      sequential step every remaining batch pair has already been
      applied, and the round ends before its creations can preempt
      anything (found by the hypothesis property test — the
      counterexample was {"bbb"×2, "aaabbb"×1}). Likewise, if the HEAD
      pair's concat collides with an existing token string, the batch
      stops at size 1 (a solo head is trivially the sequential argmax;
      the collision could otherwise inflate an unaccepted pair past
      c*).
    - Strict-count trim: every accepted pair after the head must have
      count > c*. Then at each simulated sequential step the remaining
      batch pairs (counts unchanged, > c*) dominate every changed or
      created pair (≤ c*), and dominate every untouched unaccepted pair
      (≤ c* by sort order) — so the sequential argmax picks exactly the
      batch pairs, in batch order, tie-breaks included. Ambiguous tiers
      are trimmed and re-decided next round: the batch NEVER deviates
      from the sequential fit, it only degrades toward one-merge rounds
      (cap=1 ≡ the classic loop).

    The prefix-stop is the MAXIMAL exact rule: once a candidate q
    conflicts with the batch, every later candidate has count ≤ count(q)
    while q's own count can survive the batch unchanged — so the
    sequential loop might pick q first, and nothing after the conflict
    can be committed this round without risking deviation. Char-level
    corpora (top pairs share letters heavily) therefore batch modestly
    in exact mode; ``exact=False`` switches to standard
    frequency-snapshot batching — skip conflicting candidates and keep
    accepting non-interacting ones up to *cap*. The greedy batch is
    still well-defined (mutually non-interacting merges applied to the
    same snapshot commute), but pair frequencies are not refreshed
    between in-batch merges, so the learned merge ORDER (and on tied or
    interacting tiers, the merge set) may deviate from the sequential
    fit — the classic throughput/fidelity trade of batched BPE
    trainers."""
    accepted: list[tuple[str, str, int]] = []
    used: set[str] = set()
    next_cnt = None
    for a, b, cnt in rows:
        if len(accepted) >= cap:
            if next_cnt is None:
                next_cnt = cnt
            break
        conflict = accepted and (
            a in used or b in used or (a + b) in used or (a + b) in known_tokens
        )
        if conflict:
            if next_cnt is None:
                next_cnt = cnt
            if exact:
                break
            continue
        accepted.append((a, b, cnt))
        used.update((a, b, a + b))
        if exact and len(accepted) == 1 and (a + b) in known_tokens:
            # head collides with an existing token string: solo round
            break
        if exact and a == b:
            # self-symbol pair: its run-merges create pairs bounded by
            # its OWN count, not c* — safe only as the batch's last
            # member (see docstring)
            break
    if not exact:
        return [(a, b) for a, b, _ in accepted]
    if next_cnt is None:
        idx = len(accepted)
        if idx < len(rows):
            next_cnt = rows[idx][2]
        else:
            # prefix consumed every pulled row: the unpulled tail could
            # tie the last tier, so bound c* by the smallest count seen.
            next_cnt = accepted[-1][2] if accepted else 0
    return [(a, b) for i, (a, b, cnt) in enumerate(accepted) if i == 0 or cnt > next_cnt]


def fit_bpe(
    df: DataFrame,
    n_merges: int = 32,
    text_col: str = "text",
    local_max_words: int = FIT_LOCAL_MAX_WORDS,
    batch_cap: int = FIT_BATCH_CAP,
    batch_mode: str = "exact",
) -> list[tuple[str, str]]:
    """Learn *n_merges* BPE merge rules from a corpus.

    The corpus always collapses to a word-frequency table distributed
    (one explode + map-side-combinable count — vocabulary-sized state,
    NOT corpus-sized). What happens next is threshold-switched:

    - vocabulary ≤ *local_max_words*: the table comes to the driver ONCE
      and the merge loop runs locally — n_merges costs one Spark job
      total instead of one per merge (a real 30k-merge vocabulary would
      otherwise be 30k sequential jobs at ~0.3 s floor each);
    - larger: the distributed loop — per ROUND one map-side-combinable
      pair count whose head comes to the driver, then up to *batch_cap*
      mutually-non-adjacent merges committed in ONE fold job
      (_select_merge_batch: the maximal safe prefix, with a strict-count
      guard proving the batch equals the sequential argmax loop exactly
      — see its docstring). batch_cap=1 reproduces the classic
      one-merge-per-job loop. Lineage truncated per round with
      localCheckpoint, superseded blocks released (Pregel discipline).

    *batch_mode*: ``"exact"`` (default) commits only provably-safe
    batches — the result is bit-identical to the sequential argmax loop
    on EVERY corpus (equality-tested at n_merges=64; char-level corpora
    batch modestly because top pairs share letters). ``"greedy"`` is
    standard frequency-snapshot batching: up to *batch_cap* mutually
    non-interacting pairs per round regardless of tie/count guards —
    ~batch_cap× fewer rounds for a giant vocabulary, with the documented
    deviation that merge order (and tied tiers) may differ from the
    sequential fit."""
    from graph_db_spark.pregel import release
    from graph_db_spark.session import spread_small_input

    d = spread_small_input(df)
    # explode_outer + null-drop: see operators.dedup.tokens (blocks the
    # inferred-filter double tokenize).
    wf = (
        d.select(F.explode_outer(ws_tokens(F.lower(F.col(text_col)))).alias("word"))
        .filter(F.col("word").isNotNull())
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if local_max_words > 0:
        # limit-probe: one job; if the whole vocabulary came back, fit
        # locally — otherwise fall through to the distributed loop.
        head = wf.limit(local_max_words + 1).collect()
        if len(head) <= local_max_words:
            return _fit_bpe_local([(r["word"], r["n"]) for r in head], n_merges)
    state = wf.select(
        char_symbols(F.col("word")).alias("syms"), "n"
    ).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    head_rows = max(64, 4 * batch_cap)
    try:
        while len(merges) < n_merges:
            pairs = (
                state.filter(F.size("syms") >= 2)
                .select(
                    F.explode(
                        F.zip_with(
                            F.slice(F.col("syms"), 1, F.size("syms") - 1),
                            F.slice(F.col("syms"), 2, F.size("syms") - 1),
                            lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                        )
                    ).alias("p"),
                    "n",
                )
                .groupBy("p")
                .agg(F.sum("n").alias("cnt"))
                .orderBy(F.col("cnt").desc(), F.col("p.a").asc(), F.col("p.b").asc())
                .limit(head_rows)
                .collect()
            )
            if not pairs:
                break
            batch = _select_merge_batch(
                [(r["p"]["a"], r["p"]["b"], r["cnt"]) for r in pairs],
                min(batch_cap, n_merges - len(merges)),
                {x + y for x, y in merges},
                exact=(batch_mode == "exact"),
            )
            merges.extend(batch)
            syms = F.col("syms")
            for a, b in batch:
                syms = merge_pair(syms, a, b)
            new_state = state.select(syms.alias("syms"), "n").localCheckpoint(
                eager=True
            )
            release(state)
            state = new_state
        return merges
    finally:
        release(state)


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Scale-path BPE encode → (id, tokens ARRAY<STRING>): Arrow-batched
    pandas UDF applying the classic lowest-rank-first merge loop per word,
    with the rank table captured once per executor and a per-batch word
    cache (Zipf ⇒ most words repeat). Produces exactly the same
    segmentation as ``bpe_encode_expr`` (rank-order equivalence — see
    module docstring); tested for equality against it."""
    from pyspark.sql.functions import pandas_udf

    ranks = {pair: i for i, pair in enumerate(merges)}

    def encode_word(word: str, cache: dict) -> list[str]:
        hit = cache.get(word)
        if hit is not None:
            return hit
        syms = list(word)
        while len(syms) > 1:
            best_i, best_rank = -1, len(ranks)
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]), len(ranks))
                if r < best_rank:
                    best_i, best_rank = i, r
            if best_i < 0 or best_rank >= len(ranks):
                break
            # merge ALL non-overlapping occurrences of the chosen pair,
            # left to right (standard BPE merge-step semantics)
            a, b = syms[best_i], syms[best_i + 1]
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        cache[word] = syms
        return syms

    import re

    # Java's \s (ws_tokens) is ASCII-only; Python str.split()/re default
    # \s is Unicode-aware — pin ASCII semantics so both apply paths
    # tokenize identically on non-ASCII whitespace too.
    ws = re.compile(r"\s+", re.ASCII)

    @pandas_udf("array<string>")
    def enc(texts: pd.Series) -> pd.Series:
        cache: dict = {}
        return texts.map(
            lambda t: [
                tok
                for w in ws.split((t or "").lower())
                if w
                for tok in encode_word(w, cache)
            ]
        )

    return df.select(F.col(id_col).alias("id"), enc(F.col(text_col)).alias("tokens"))
