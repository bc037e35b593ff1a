"""Optional real-model hooks with deterministic fallbacks.

The reference loads real models in its stateful stages: fasttext
lid.176 for language ID (`extractor/language_detector.py:167-260`),
sentence-transformers all-MiniLM-L6-v2 for embeddings
(`deduplicator/semantic_dedup.py:256-306`), and the HF gpt2 tokenizer
for chunking (`dataset/chunker.py:15-54`). None of those libraries
exist in this environment, so every consumer stage falls back to its
deterministic proxy — but each loader below try-imports the real
library first, so dropping the dependency into the environment swaps
the real model in with ZERO call-site changes (each stage calls its
loader once per actor in __init__).

Loaders return None (never raise) when the library or weights are
absent; a model object otherwise.
"""

from __future__ import annotations

import os


def try_sentence_transformer(model_name: str = "all-MiniLM-L6-v2"):
    """Embedding model with the SentenceTransformer `encode` surface,
    or None. Preference order: the actual sentence-transformers
    library; else a real safetensors encoder directory from
    `$QC_ENCODER_SAFETENSORS` (model.safetensors + vocab.json, loaded
    by the real `safetensors` lib when importable, the from-spec reader
    otherwise — `functions/safetensors_np.py`)."""
    try:
        from sentence_transformers import SentenceTransformer  # type: ignore

        return SentenceTransformer(model_name)
    except Exception:
        pass
    model_dir = os.environ.get("QC_ENCODER_SAFETENSORS", "")
    if model_dir and os.path.isdir(model_dir):
        try:
            from .safetensors_np import NumpyMeanPoolEncoder

            return NumpyMeanPoolEncoder.load(model_dir)
        except Exception:
            return None
    return None


def try_fasttext_langid(model_path: str | None = None):
    """fasttext lid model or None. Path from $FASTTEXT_LID_PATH.

    Prefers the actual `fasttext` library; falls back to the from-spec
    reader (`functions/fasttext_bin.FastTextModel`) for the
    supervised/softmax/no-subword corner of the format, so the hook leg
    runs on real .bin bytes even where the library is absent — the SAME
    file loads in either implementation, with the same batch `predict`
    surface."""
    path = model_path or os.environ.get("FASTTEXT_LID_PATH", "")
    if not path or not os.path.exists(path):
        return None
    try:
        import fasttext  # type: ignore

        return fasttext.load_model(path)
    except Exception:
        pass
    try:
        from .fasttext_bin import FastTextModel

        return FastTextModel.load(path)
    except Exception:
        return None


def try_gpt2_tokenizer():
    """HF gpt2 tokenizer (via `tokenizers` or `transformers`) or None."""
    try:
        from tokenizers import Tokenizer  # type: ignore

        return Tokenizer.from_pretrained("gpt2")
    except Exception:
        pass
    try:
        from transformers import AutoTokenizer  # type: ignore

        return AutoTokenizer.from_pretrained("gpt2")
    except Exception:
        return None


def try_tokenizer_json(path: str | None = None):
    """Tokenizer from a real HF-format tokenizer.json, or None.

    Path from `$QC_TOKENIZER_JSON`. Prefers the actual `tokenizers`
    library; falls back to the from-spec reader
    (`functions/tokenizer_json.JsonBpeTokenizer`) so the hook leg runs
    on real bytes even where the library is absent — the SAME file
    loads in either implementation, and the consumer call surface
    (`encode(text).ids`, `decode(ids)`) is identical."""
    path = path or os.environ.get("QC_TOKENIZER_JSON", "")
    if not path or not os.path.exists(path):
        return None
    try:
        from tokenizers import Tokenizer  # type: ignore

        return Tokenizer.from_file(path)
    except Exception:
        pass
    try:
        from .tokenizer_json import JsonBpeTokenizer

        return JsonBpeTokenizer.from_file(path)
    except Exception:
        return None
