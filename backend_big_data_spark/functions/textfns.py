"""Text column expressions used by the text-analysis and dedup operators.

All pure Catalyst expressions (split / higher-order array functions) — no
Python in the hot path. Tokenization is deliberately the simplest
deterministic scheme (whitespace) so the DuckDB oracle can reproduce it
exactly; a BPE-ish regex variant is provided for token-count estimation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: whitespace tokenizer pattern — identical semantics in Java regex (Spark)
#: and RE2 (DuckDB string_split_regex).
WS_PATTERN = r"\s+"

#: BPE-ish pattern: runs of word chars, or a single non-word non-space char.
BPE_PATTERN = r"\w+|[^\w\s]"


def tokens(text: Column) -> Column:
    """Whitespace tokens of trimmed text → array<string>."""
    return F.split(F.trim(text), WS_PATTERN)


def bpe_token_count(text: Column) -> Column:
    """Approximate subword-ish token count: count of BPE_PATTERN matches."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_PATTERN), F.lit(0)))


def word_shingles(toks: Column, n: int = 3, sep: str = " ") -> Column:
    """Distinct n-word shingles from a token array → array<string>.

    Built with sequence+transform (higher-order fns, JVM-side). Docs shorter
    than ``n`` tokens yield an empty array.
    """
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    joined = F.transform(
        idx,
        lambda i: F.concat_ws(sep, *[F.element_at(toks, i + k + 1) for k in range(n)]),
    )
    return F.when(F.size(toks) >= n, F.array_distinct(joined)).otherwise(
        F.array().cast("array<string>")
    )


def char_shingles(text: Column, n: int = 5) -> Column:
    """Distinct character n-grams of a string → array<string>."""
    idx = F.sequence(F.lit(1), F.length(text) - n + 1)
    grams = F.transform(idx, lambda i: F.substring(text, i, F.lit(n)))
    return F.when(F.length(text) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def token_chunks(toks: Column, size: int = 64, overlap: int = 16) -> Column:
    """Overlapping token-window chunks (LLM context-window chunking) →
    array<struct<chunk_idx:int, chunk:string>>.

    Pure higher-order expressions — the scale path for corpus chunking
    (the UDTF twin in tests demonstrates the same semantics via a Python
    UDTF, which is the flexible-but-slower path). Chunk i starts at token
    ``1 + i*(size-overlap)``; the last chunk may be shorter than ``size``.
    """
    if overlap >= size:
        raise ValueError("overlap must be < size")
    step = size - overlap
    starts = F.sequence(
        F.lit(1), F.greatest(F.size(toks) - overlap, F.lit(1)), F.lit(step)
    )
    return F.transform(
        starts,
        lambda s, i: F.struct(
            i.cast("int").alias("chunk_idx"),
            F.concat_ws(" ", F.slice(toks, s, size)).alias("chunk"),
        ),
    )


def normalize_text(text: Column) -> Column:
    """Canonical text form for normalization-aware dedup: lowercase, strip
    punctuation (anything outside [a-z0-9] and whitespace), collapse
    whitespace runs to single spaces, trim. Pure codegen (three regexp
    passes + lower/trim) — fuses into the scan; the same pipeline is
    expressible verbatim in DuckDB, which keeps the operator
    oracle-checkable. Case/spacing/punctuation variants of a document map
    to one canonical string, so an exact fingerprint on the OUTPUT catches
    the near-trivial duplicate class that raw exact dedup misses."""
    lowered = F.lower(text)
    stripped = F.regexp_replace(lowered, r"[^a-z0-9\s]", "")
    collapsed = F.regexp_replace(stripped, r"\s+", " ")
    return F.trim(collapsed)
