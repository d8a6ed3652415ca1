"""Corpus-cleaning operators: PII redaction, C4-style line filtering,
badword-ratio flagging (the standard pre-training scrub stages —
CCNet/C4/RefinedWeb pipelines; the reference has no text payloads, so
this family comes from the task brief's webtext axis).

All three are pure column expressions (regexp_replace / regexp_count /
higher-order line filters) — zero shuffles, zero UDFs: at 100 TB they
run scan-side inside whole-stage codegen and rewrite each partition
in place.

Engine-portability: every regex stays inside the Java-regex ∩ RE2
common subset (character classes, bounded repetition, \\b, \\d —
no backreferences, no lookaround), so a DuckDB twin running the SAME
pattern string produces the same matches and the cleaned-text md5
can be hash-gated across engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Java ∩ RE2 regexes (no lookaround / backreferences).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
#: international-form phone only (+ then 7-15 digits): conservative on
#: purpose — aggressive phone regexes eat ordinary numbers
PHONE_RE = r"\+\d{7,15}\b"

#: C4 line rules (Raffel et al. 2020 §2.2): a retained line ends in
#: terminal punctuation, has >= ``min_words`` words, and mentions
#: neither javascript nor a curly brace (code/boilerplate tells).
C4_TERMINAL = (".", "!", "?", '"')


def redact_pii_cols(text: Column) -> dict:
    """Columns for PII redaction over ``text``: the redacted text
    (sentinels <EMAIL>/<IP>/<PHONE>) and per-kind match counts.
    Replacement order matters and is fixed: emails first (an email may
    contain digit runs), then IPs, then phones — the twin must apply
    the same order."""
    n_emails = F.regexp_count(text, F.lit(EMAIL_RE))
    step1 = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    n_ips = F.regexp_count(step1, F.lit(IPV4_RE))
    step2 = F.regexp_replace(step1, IPV4_RE, "<IP>")
    n_phones = F.regexp_count(step2, F.lit(PHONE_RE))
    step3 = F.regexp_replace(step2, PHONE_RE, "<PHONE>")
    return {
        "pii_clean": step3,
        "n_emails": n_emails.cast("long"),
        "n_ips": n_ips.cast("long"),
        "n_phones": n_phones.cast("long"),
    }


def c4_line_filter_cols(text: Column, min_words: int = 4) -> dict:
    """Columns for the C4 line rule over newline-separated ``text``:
    kept text (retained lines re-joined with \\n), total/kept line
    counts. A line is retained iff it ends in terminal punctuation,
    has >= ``min_words`` whitespace words, and contains neither
    'javascript' (case-insensitive) nor '{'."""
    lines = F.split(text, "\n")
    terminal = F.lit(list(C4_TERMINAL))

    def keep(ln):
        trimmed = F.trim(ln)
        return (
            F.array_contains(terminal, F.substring(trimmed, -1, 1))
            & (F.size(F.split(trimmed, r"\s+")) >= min_words)
            & ~F.lower(trimmed).contains("javascript")
            & ~trimmed.contains("{")
        )

    kept = F.filter(lines, keep)
    return {
        "c4_clean": F.array_join(kept, "\n"),
        "n_lines": F.size(lines).cast("long"),
        "n_kept_lines": F.size(kept).cast("long"),
    }


def badword_flag_cols(
    text: Column, badwords: list, max_ratio: float = 0.1
) -> dict:
    """Columns flagging documents whose badword token ratio exceeds
    ``max_ratio``: badword count, token count, and the flag. The
    ratio decision is made in cross-multiplied INTEGER form —
    ``max_ratio`` is rationalized to j/k and the test is
    ``n_bad * k > n_tok * j`` (``n_bad * 10 > n_tok`` for 0.1) — so
    the decision is exact integer arithmetic in any engine."""
    from fractions import Fraction

    toks = F.split(F.lower(F.trim(text)), r"\s+")
    bad = F.array(*[F.lit(w) for w in badwords])
    n_bad = F.size(F.filter(toks, lambda t: F.array_contains(bad, t)))
    n_tok = F.size(toks)
    fr = Fraction(max_ratio).limit_denominator(10**6)
    flagged = (
        n_bad.cast("long") * F.lit(fr.denominator)
        > n_tok.cast("long") * F.lit(fr.numerator)
    )
    return {
        "n_badwords": n_bad.cast("long"),
        "n_tokens_bw": n_tok.cast("long"),
        "bw_flagged": flagged.cast("long"),
    }
