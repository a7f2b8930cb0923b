"""Text tokenization primitives shared by dedup / text-analysis operators.

The reference's only tokenizer is ``Text.words`` inside the demo's
search-term index emission (`executables/Demo.hs:28`); these generalize it.
All expression-only (no UDF), all reproducible in ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

WHITESPACE = r"\s+"


def ws_tokens(text: Column) -> Column:
    """Whitespace tokens with empties dropped (``Text.words`` semantics)."""
    return F.filter(F.split(text, WHITESPACE), lambda t: t != "")


def shingles_of_tokens(toks: Column, k: int = 3) -> Column:
    """Distinct word k-shingles from an ALREADY-TOKENIZED array — the
    body of ``shingle_array`` factored out so a pipeline that
    materializes one tokenize pass (pipeline_curated_pack) can derive
    every gram shape from it without re-tokenizing the corpus per gate.
    Bit-identical to ``shingle_array`` when *toks* = ``ws_tokens(text)``
    (it IS that composition)."""
    idx = F.sequence(F.lit(0), F.size(toks) - k)
    return F.when(F.size(toks) >= k, F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)))
    )).otherwise(F.array().cast("array<string>"))


def shingle_array(text: Column, k: int = 3) -> Column:
    """Distinct word k-shingles (k consecutive tokens joined by one space)
    — the standard near-dup unit; preserves word order that unigram sets
    lose.

    Documents with fewer than k tokens emit NO shingles (not a partial or
    empty-string shingle) — otherwise every short/empty doc shares one
    degenerate shingle and surfaces as a spurious MinHash near-dup
    candidate of every other short doc."""
    return shingles_of_tokens(ws_tokens(text), k)


def char_ngrams(text: Column, n: int = 3) -> Column:
    """Distinct character n-grams of the lowercased text."""
    t = F.lower(text)
    idx = F.sequence(F.lit(1), F.greatest(F.length(t) - (n - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: F.substring(t, i, F.lit(n))))
