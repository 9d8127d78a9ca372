"""PII detection and redaction — the privacy-scrub pass every production
training-data pipeline runs before text leaves the curation zone (see e.g.
the BigScience ROOTS / Privacy-preserving corpus construction reports,
arXiv:2303.03915 §3, which scrub emails/phones/IPs with exactly this
regex-class approach).

Pure codegen: `regexp_extract_all` for counts, chained `regexp_replace`
for the scrub — zero Python, zero shuffles; the pass fuses into whatever
scan precedes it. Patterns deliberately restrict to character classes +
quantifiers (no lookaround, no backrefs) so the SAME pattern string is
valid and equivalent under Java regex (Spark), RE2 (DuckDB), and PCRE —
which is what makes the operator oracle-checkable bit-for-bit.

At 100 TB: map-only, no state — scales with the scan. Swap the regex set
for a model-based NER pass via `mapInPandas` when recall matters more
than throughput (the multimodal codec pattern: same plumbing, heavier
kernel).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Pattern set: (name, regex, replacement token). Order matters — emails
#: are scrubbed before phones so digits inside an address never half-match.
#: The phone pattern is an ordered alternation over the common separator /
#: grouping variants (intl 3-3-4, intl short 3-4, parenthesised area code,
#: bare dashed/dotted 10-digit). Alternation is leftmost-first in BOTH Java
#: regex and RE2, and ``\b`` is an ASCII word boundary in both, so counts
#: and redactions agree bit-for-bit across engines. The bare 10-digit form
#: requires ``[-.]`` separators (not spaces) so it can never swallow an
#: IPv4 octet run or ordinary prose numbers.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (
        "phone",
        r"\+[0-9]{1,2} [0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"
        r"|\+[0-9]{1,2} [0-9]{3}-[0-9]{4}"
        r"|\([0-9]{3}\) [0-9]{3}-[0-9]{4}"
        r"|\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b",
        "[PHONE]",
    ),
    ("ipv4", r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "[IP]"),
)


def pii_counts(text: Column) -> list[Column]:
    """One count column per pattern, aliased ``n_<name>``."""
    return [
        F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0))).alias(
            f"n_{name}"
        )
        for name, pat, _ in PII_PATTERNS
    ]


def redact(text: Column) -> Column:
    """Replace every PII match with its redaction token, in pattern
    order."""
    out = text
    for _, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def pii_profile(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII audit: match counts per class plus the md5 of the
    redacted text (the digest crosses the wire; the scrubbed text itself
    stays columnar)."""
    text = F.col(text_col)
    return df.select(
        F.col(id_col),
        *pii_counts(text),
        F.md5(redact(text)).alias("redacted_md5"),
    )
