"""Text analysis for the training-data pipeline (language-ID, quality,
token counting, fingerprinting) as native column expressions.

Everything here stays inside whole-stage codegen (regex/array/aggregate
expressions, no Python), and every function is engine-neutral: the exact
same computation is re-derivable in ANSI-ish SQL for the DuckDB oracle
(queries.py pairs each with one). Cross-engine exactness rules:

* counts/codes are integer arithmetic (exact in any engine);
* the rolling hash folds in int64 mod 1e9+7 (no float accumulation);
* ratio outputs are rounded to 6 decimals on both sides.
"""

from __future__ import annotations

from pyspark.sql import functions as F

# Explicit ASCII whitespace class instead of \s: Java regex \s includes
# vertical tab \x0B while RE2's (DuckDB's) does not, so any document
# containing \x0B would diverge from the SQL oracle (ADVICE r01). Both
# engines interpret these escapes identically.
WS_CLASS = r"[ \t\n\x0B\f\r]"

# BPE-ish pre-tokenizer: letter runs | digit runs | single non-alnum —
# the GPT-2 pre-tokenizer's shape without the unicode categories;
# deterministic and identical under Java regex and RE2.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\x0B\f\r]"

# Common-English trigrams for the n-gram language-ID heuristic.
LANG_TRIGRAMS = ("the", "and", "ing", "ion", "ent", "her", "for", "tha")

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def ws_token_count(text_col):
    """Whitespace token count (empty tokens dropped)."""
    toks = F.filter(F.split(text_col, WS_CLASS + "+"), lambda x: x != "")
    return F.size(toks).cast("long")


def bpe_token_count(text_col):
    """BPE-ish regex token count via regexp_extract_all (JVM-side)."""
    return F.size(F.regexp_extract_all(text_col, F.lit(BPE_TOKEN_RE), F.lit(0))).cast("long")


def trigram_hits(text_col):
    """Σ occurrences of the common-English trigram set (integer-exact;
    occurrences counted by literal split, not regex)."""
    low = F.lower(text_col)
    total = F.lit(0)
    for g in LANG_TRIGRAMS:
        total = total + (F.size(F.split(low, g, -1)) - 1)
    return total.cast("long")


def trigram_lang_score(text_col):
    """Trigram hits per 100 characters — the n-gram language-ID score."""
    return F.when(
        F.length(text_col) > 0,
        trigram_hits(text_col).cast("double") * 100.0
        / F.length(text_col).cast("double"),
    ).otherwise(F.lit(0.0))


def rolling_fingerprint(col_name: str, mod: int = 1_000_000_007, base: int = 31):
    """Polynomial rolling hash over character codes, folded in int64:
    ``h_{i+1} = (h_i * base + code_i) mod m`` — exact integer arithmetic,
    bit-identical across engines (no float accumulation). ``col_name``
    must be a plain column name (embedded in one codegen expression)."""
    return F.expr(
        f"aggregate(transform(sequence(1, length({col_name})), "
        f"i -> ascii(substr({col_name}, i, 1))), 0L, "
        f"(acc, x) -> pmod(acc * {base}L + x, {mod}L))"
    )
