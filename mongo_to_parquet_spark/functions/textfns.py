"""Text column expressions for the LLM-pipeline operators (SURVEY §2.3 N★).

Everything here is built-in-function composition (JVM-side); no Python UDFs
in any hot path. Tokenization is whitespace-based to match the fixtures'
space-separated ``documents.text``; a BPE-ish regex tokenizer is provided
for realistic corpora.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: GPT-2-style pre-tokenizer shape: word pieces, numbers, or single symbols.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(text) -> Column:
    """Whitespace tokens (fixture texts are single-space separated)."""
    return F.split(text, " ")


def token_count(text) -> Column:
    return F.size(tokens(text)).cast("int")


def regex_token_count(text) -> Column:
    """BPE-ish token count via regexp_count (JVM regex, no UDF)."""
    return F.regexp_count(text, F.lit(BPE_ISH_PATTERN)).cast("int")


def mean_word_len(text) -> Column:
    """Mean token length = (chars − separators) / tokens, in doubles."""
    n_tok = F.size(tokens(text))
    return (F.length(text) - (n_tok - F.lit(1))).cast("double") / n_tok.cast("double")


def shingles(text, n: int = 3) -> Column:
    """Word n-gram shingles as strings (for MinHash / Jaccard dedup).

    Built from the token array with transform+slice — stays JVM-side.
    Documents shorter than ``n`` tokens yield the whole text as one shingle.

    The token array is bound as a lambda VALUE (single-element-array
    wrapper): referencing the split expression directly inside the
    per-position lambda re-evaluates the split once per shingle —
    ~n_tokens× the work (the Catalyst projection-collapse/HOF trap,
    see operators/dedup.py minhash_signature). Measured 4× on the
    jaccard explode path at sf0.1.
    """
    toks = tokens(text)
    k = F.size(toks) - F.lit(n - 1)
    return F.when(k <= 0, F.array(text)).otherwise(
        F.flatten(
            F.transform(
                F.array(toks),
                lambda tk: F.transform(
                    F.sequence(F.lit(1), F.size(tk) - F.lit(n - 1)),
                    lambda i: F.array_join(F.slice(tk, i, n), " "),
                ),
            )
        )
    )
