"""Text analysis for training-data pipelines: language-ID, quality scores,
token counting, document fingerprinting.

All hot paths are JVM expressions; the language model and the winnowing
fingerprint run as vectorized Arrow UDFs over whole batches.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# tiny public-knowledge stopword profiles for the n-gram/word heuristic
_LANG_PROFILES: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to in is you that it he was for on are as with".split()),
    "es": frozenset("el la de que y en un ser se no haber por con su para como".split()),
    "de": frozenset("der die und in den von zu das mit sich des auf für ist im".split()),
    "fr": frozenset("le la de et les des en un du une que est pour qui dans".split()),
    "it": frozenset("il di che e la per un in una sono mi si lo ha ma con".split()),
}


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic language ID: argmax stopword-hit rate over tiny profiles.

    Returns (id, lang_pred, lang_score). Unknown (no hits) -> 'und'.
    """
    profiles = {k: v for k, v in _LANG_PROFILES.items()}

    @F.pandas_udf("lang_pred string, lang_score double")
    def lid(texts: pd.Series) -> pd.DataFrame:
        preds, scores = [], []
        for t in texts:
            toks = (t or "").lower().split()
            if not toks:
                preds.append("und")
                scores.append(0.0)
                continue
            best, best_s = "und", 0.0
            for lang, words in profiles.items():
                s = sum(1 for w in toks if w in words) / len(toks)
                if s > best_s:
                    best, best_s = lang, s
            preds.append(best)
            scores.append(best_s)
        return pd.DataFrame({"lang_pred": preds, "lang_score": scores})

    return df.select(F.col(id_col), lid(F.col(text_col)).alias("l")).select(
        id_col, "l.lang_pred", "l.lang_score"
    )


# GPT-2-style pretokenizer regex (public); Java regex dialect
BPE_ISH_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace + BPE-ish token counts, all JVM-side regexp."""
    return df.select(
        F.col(id_col),
        F.size(F.split(text_col, r"\s+")).alias("ws_tokens"),
        F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_PATTERN), F.lit(0))
        ).alias("bpe_ish_tokens"),
        F.length(text_col).alias("n_chars"),
    )


def quality_scores(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features (all JVM expressions):
    length, alpha ratio, punct ratio, mean word length, repetition ratio."""
    n_chars = F.length(text_col)
    alpha = F.length(F.regexp_replace(text_col, r"[^\p{L}]", ""))
    punct = F.length(F.regexp_replace(text_col, r"[^\p{Punct}]", ""))
    toks = F.split(text_col, r"\s+")
    n_tok = F.size(toks)
    n_uniq = F.size(F.array_distinct(toks))
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        (alpha.cast("double") / n_chars).alias("alpha_ratio"),
        (punct.cast("double") / n_chars).alias("punct_ratio"),
        (n_chars.cast("double") / n_tok).alias("mean_word_len"),
        (F.lit(1.0) - n_uniq.cast("double") / n_tok).alias("repetition_ratio"),
    )


def winnowing_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD 2003):
    rolling Karp-Rabin over k-grams of tokens, min-hash per window.

    Returns (id, fingerprints array<long>) — near-dup candidates are pairs
    sharing any fingerprint (explode + groupBy, linear shuffle).
    """

    from hashlib import blake2b

    def hash_stable(s: str) -> int:
        return int.from_bytes(blake2b(s.encode(), digest_size=8).digest(), "big") >> 1

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def fp(texts: pd.Series) -> pd.Series:
        B, M = 1_000_003, (1 << 61) - 1
        bk = pow(B, k - 1, M)
        out = []
        for t in texts:
            toks = (t or "").split()
            n = len(toks)
            hs = [hash_stable(w) for w in toks]
            if n < k:
                out.append([int(sum(hs) % M)] if n else [])
                continue
            # rolling polynomial (Karp-Rabin) hash over k-grams
            kg = np.empty(n - k + 1, dtype=np.int64)
            h = 0
            for i in range(k):
                h = (h * B + hs[i]) % M
            kg[0] = h
            for i in range(1, n - k + 1):
                h = ((h - hs[i - 1] * bk) * B + hs[i + k - 1]) % M
                kg[i] = h
            # winnow: the min of each sliding window of k-gram hashes
            picks = set()
            for i in range(max(1, len(kg) - window + 1)):
                picks.add(int(kg[i : i + window].min()))
            out.append(sorted(picks))
        return pd.Series(out)

    return df.select(F.col(id_col), fp(F.col(text_col)).alias("fingerprints"))


def fingerprint_candidates(fps: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Pairs of docs sharing >= 1 winnowing fingerprint."""
    x = fps.select(id_col, F.explode("fingerprints").alias("fp"))
    hot = x.groupBy("fp").count().filter("count > 1").drop("count")
    x2 = x.join(hot, "fp", "left_semi")
    b = x2.select(F.col("fp"), F.col(id_col).alias("id_b"))
    return (
        x2.join(b, "fp")
        .filter(F.col(id_col) < F.col("id_b"))
        .select(F.col(id_col).alias("id_a"), "id_b")
        .distinct()
    )
