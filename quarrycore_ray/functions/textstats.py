"""Text-analysis batch functions: token counts, quality scoring,
language ID, fingerprints.

Re-expresses the reference's quality/analysis layer as vectorized batch
transforms:

- quality scoring mirrors the reference's weighted scorer aggregation
  (`/root/reference/src/quarrycore/quality/scorers.py:74-84` LengthScorer
  len>400 -> 1.0, weight 0.3; language weight 0.4; coherence weight 0.3;
  weighted sum clamped to [0,1],
  `/root/reference/src/quarrycore/quality/assessor.py:70-119`). The
  model-based language/coherence scorers (fasttext / MiniLM) are not
  available in this environment, so both are replaced by deterministic
  lexical proxies (stopword-hit ratio; distinct-word ratio) — the
  *shape* (weights, clamping, per-component sub-scores) is the
  reference's.
- language ID replaces fasttext lid.176
  (`/root/reference/src/quarrycore/extractor/language_detector.py`) with
  a stopword/script heuristic over the same 5 test-corpus languages.
- token counting: whitespace tokens plus a BPE-ish regex token count.

All functions consume/produce Arrow batches; quality formulas are
deliberately SQL-expressible so DuckDB can serve as an exact oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..exactmath import floor_round_np

# deliberately small, fixed stopword sets — part of the spec so the SQL
# oracle can reproduce scores exactly
STOPWORDS_EN = ("the", "and", "of", "a", "to", "in", "is", "that", "it", "for")
STOPWORDS = {
    "en": STOPWORDS_EN,
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "von"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "de", "que", "pour"),
    "es": ("el", "la", "los", "las", "y", "es", "un", "una", "de", "que"),
}

LENGTH_FULL_SCORE_CHARS = 400  # reference scorers.py:74-84
W_LENGTH, W_LANGUAGE, W_COHERENCE = 0.3, 0.4, 0.3  # reference assessor weights


def add_token_counts(batch: pa.Table, text_col: str = "canonical") -> pa.Table:
    """n_tokens (single-space split of canonical text) + n_chars_norm."""
    toks = pc.list_value_length(pc.split_pattern(batch[text_col], " "))
    batch = batch.append_column("n_tokens", pc.cast(toks, pa.int64()))
    return batch.append_column(
        "n_chars_norm", pc.cast(pc.utf8_length(batch[text_col]), pa.int64())
    )


def add_regex_token_count(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """BPE-ish token count: alnum runs + isolated punctuation (vectorized)."""
    n = pc.count_substring_regex(batch[text_col], pattern=r"[A-Za-z0-9]+|[^A-Za-z0-9\s]")
    return batch.append_column("n_tokens_re", pc.cast(n, pa.int64()))


def quality_scores(batch: pa.Table, text_col: str = "canonical") -> pa.Table:
    """Deterministic quality sub-scores + weighted overall score.

    length_score   = min(len/400, 1)
    language_score = min(5 * en-stopword-ratio, 1)
    coherence      = min(2 * distinct-word-ratio, 1)
    quality        = round(0.3*ls + 0.4*lgs + 0.3*ch, 6)
    """
    texts = batch[text_col].to_pylist()
    ls = np.empty(len(texts))
    lgs = np.empty(len(texts))
    ch = np.empty(len(texts))
    stop = set(STOPWORDS_EN)
    for i, t in enumerate(texts):
        t = t or ""
        words = t.split(" ") if t else []
        n = len(words)
        ls[i] = min(len(t) / LENGTH_FULL_SCORE_CHARS, 1.0)
        if n == 0:
            lgs[i] = 0.0
            ch[i] = 0.0
        else:
            lgs[i] = min(5.0 * sum(1 for w in words if w in stop) / n, 1.0)
            ch[i] = min(2.0 * len(set(words)) / n, 1.0)
    quality = floor_round_np(W_LENGTH * ls + W_LANGUAGE * lgs + W_COHERENCE * ch, 6)
    batch = batch.append_column("length_score", pa.array(floor_round_np(ls, 6), pa.float64()))
    batch = batch.append_column("language_score", pa.array(floor_round_np(lgs, 6), pa.float64()))
    batch = batch.append_column("coherence_score", pa.array(floor_round_np(ch, 6), pa.float64()))
    return batch.append_column("quality", pa.array(quality, pa.float64()))


class LangIdStage:
    """Heuristic language ID (stateful: token sets prepared once per actor).

    Scores each language by stopword hits; CJK-script characters vote
    for `zh`. Replaces the reference's fasttext model stage — same
    actor-pool shape, deterministic output.
    """

    def __init__(self):
        from .models import try_fasttext_langid

        self.stop = {lang: set(ws) for lang, ws in STOPWORDS.items()}
        # real-model hook: when fasttext + lid weights are present
        # ($FASTTEXT_LID_PATH) the actor predicts with the actual model;
        # the stopword/script heuristic is the deterministic fallback
        self._model = try_fasttext_langid()

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        if self._model is not None:
            labels, probs = self._model.predict(
                [(t or "").replace("\n", " ") for t in texts]
            )
            preds = [ls[0].replace("__label__", "") if ls else "unknown" for ls in labels]
            confs = [round(float(ps[0]), 6) if len(ps) else 0.0 for ps in probs]
            batch = batch.append_column("pred_lang", pa.array(preds, pa.string()))
            return batch.append_column("lang_conf", pa.array(confs, pa.float64()))
        preds: list[str] = []
        confs: list[float] = []
        for t in texts:
            t = (t or "").lower()
            n_cjk = sum(1 for c in t[:400] if "一" <= c <= "鿿")
            words = t.split()
            scores = {
                lang: sum(1 for w in words if w in ws) for lang, ws in self.stop.items()
            }
            scores["zh"] = n_cjk
            best = max(sorted(scores), key=lambda k: scores[k])
            total = sum(scores.values())
            preds.append(best if total else "unknown")
            # floor-round (x*1e6+0.5 -> floor), matching the engine-wide
            # exactmath convention so the DuckDB oracle reproduces it
            confs.append(
                float(floor_round_np(np.array([scores[best] / total]), 6)[0])
                if total
                else 0.0
            )
        batch = batch.append_column("pred_lang", pa.array(preds, pa.string()))
        return batch.append_column("lang_conf", pa.array(confs, pa.float64()))


def add_fingerprint(batch: pa.Table, text_col: str = "canonical") -> pa.Table:
    """Rolling-hash document fingerprint (deterministic, int64)."""
    from ..text import rolling_fingerprint

    fps = [
        rolling_fingerprint(t or "") & ((1 << 63) - 1)
        for t in batch[text_col].to_pylist()
    ]
    return batch.append_column("fingerprint", pa.array(fps, pa.int64()))


def mattr_fraction(tokens: list, window: int) -> tuple:
    """Exact MATTR as an integer fraction (numerator, denominator):
    sum over all `window`-sized sliding windows of the distinct-token
    count, over window * n_windows — mathematically equal to the mean
    of per-window type-token ratios (reference
    `/root/reference/src/quarrycore/metadata/content_analyzer.py:715-726`)
    but exact, so distributed emitters hash-match their SQL oracle.

    O(n): token at position j is distinct within window start i iff
    i > prev_occurrence(j) and j-(window-1) <= i <= j; each token
    contributes the size of that start-range. Falls back to the plain
    TTR fraction below `window` tokens (reference behavior)."""
    n = len(tokens)
    if n < window:
        return len(set(tokens)), max(n, 1)
    prev: dict = {}
    total = 0
    for j, w in enumerate(tokens):
        p = prev.get(w, -1)
        lo = max(p + 1, j - (window - 1), 0)
        hi = min(j, n - window)
        if hi >= lo:
            total += hi - lo + 1
        prev[w] = j
    return total, window * (n - window + 1)


def syllables_word(w: str) -> int:
    """Reference syllable heuristic for one lowercase word
    (`/root/reference/src/quarrycore/metadata/content_analyzer.py:683-697`):
    vowel-group count, minus a silent trailing 'e', floored at 1."""
    import re

    n = len(re.findall(r"[aeiouy]+", w))
    if w.endswith("e"):
        n -= 1
    return n if n > 0 else 1
