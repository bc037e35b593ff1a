"""HF `tokenizer.json` (BPE) writer + from-spec reader/encoder.

The reference chunks with the HF gpt2 tokenizer
(`/root/reference/src/quarrycore/dataset/chunker.py:15-54`) loaded via
the `tokenizers` library. That library isn't in this environment, so
the real-model hook (`functions/models.try_tokenizer_json`) needs two
pieces, both here:

- `write_tokenizer_json`: serialize a trained BPE vocabulary (the
  output of `pipelines/training.bpe_train_merges`, Sennrich et al.
  2016) into the REAL `tokenizer.json` format (the documented
  huggingface/tokenizers serialization: `model.type == "BPE"` with
  `vocab` + `merges`, a `Whitespace` pre-tokenizer, `<unk>` fallback).
  A file written here loads unchanged in the actual `tokenizers`
  library wherever it is installed.
- `JsonBpeTokenizer`: a from-spec reader + encoder for that format —
  Whitespace pre-tokenization (`\\w+|[^\\w\\s]+`, the documented HF
  rule), greedy lowest-rank BPE merge application per pre-token, vocab
  lookup with unk fallback — exposing the same call surface the
  consumer stages use (`encode(text).ids` / `.tokens`, `decode(ids)`
  joining tokens with spaces, the library's documented behavior for a
  BPE model with no explicit decoder).

So the hook leg runs on REAL bytes in the real interchange format even
without the library, and swaps to the genuine implementation with zero
call-site changes when it exists.
"""

from __future__ import annotations

import json
import re

_PRETOKEN_RE = re.compile(r"\w+|[^\w\s]+")


def build_vocab(
    merges: list[tuple[str, str]], alphabet: "set[str] | list[str]"
) -> dict[str, int]:
    """Deterministic id assignment: ``<unk>`` = 0, sorted alphabet next,
    then merged tokens in merge order (the layout `tokenizers`' own BPE
    trainer produces: base alphabet before learned merges)."""
    vocab: dict[str, int] = {"<unk>": 0}
    for ch in sorted(set(alphabet)):
        if ch not in vocab:
            vocab[ch] = len(vocab)
    for left, right in merges:
        tok = left + right
        if tok not in vocab:
            vocab[tok] = len(vocab)
    return vocab


def write_tokenizer_json(
    path: str, merges: list[tuple[str, str]], alphabet: "set[str] | list[str]"
) -> dict[str, int]:
    """Write a real HF-format tokenizer.json; returns the vocab."""
    vocab = build_vocab(merges, alphabet)
    doc = {
        "version": "1.0",
        "truncation": None,
        "padding": None,
        "added_tokens": [
            {
                "id": 0,
                "content": "<unk>",
                "single_word": False,
                "lstrip": False,
                "rstrip": False,
                "normalized": False,
                "special": True,
            }
        ],
        "normalizer": None,
        "pre_tokenizer": {"type": "Whitespace"},
        "post_processor": None,
        "decoder": None,
        "model": {
            "type": "BPE",
            "dropout": None,
            "unk_token": "<unk>",
            "continuing_subword_prefix": None,
            "end_of_word_suffix": None,
            "fuse_unk": False,
            "byte_fallback": False,
            "vocab": vocab,
            "merges": [f"{l} {r}" for l, r in merges],
        },
    }
    with open(path, "w", encoding="utf-8") as f:
        json.dump(doc, f, ensure_ascii=False, indent=1)
    return vocab


class _Encoding:
    """The slice of `tokenizers.Encoding` the consumer stages touch."""

    __slots__ = ("ids", "tokens")

    def __init__(self, ids: list[int], tokens: list[str]):
        self.ids = ids
        self.tokens = tokens


class JsonBpeTokenizer:
    """From-spec reader/encoder for a BPE tokenizer.json (see module
    docstring). Only the Whitespace pre-tokenizer is supported — other
    pre-tokenizers (ByteLevel etc.) raise, honestly, rather than
    mis-tokenizing."""

    def __init__(self, vocab: dict[str, int], merges: list[tuple[str, str]],
                 unk_token: str = "<unk>"):
        self.vocab = vocab
        self.id_to_token = {i: t for t, i in vocab.items()}
        self.ranks = {pair: r for r, pair in enumerate(merges)}
        self.unk_token = unk_token
        self._cache: dict[str, list[str]] = {}

    @classmethod
    def from_file(cls, path: str) -> "JsonBpeTokenizer":
        with open(path, encoding="utf-8") as f:
            doc = json.load(f)
        model = doc.get("model", {})
        if model.get("type") != "BPE":
            raise ValueError(f"unsupported model type {model.get('type')!r}")
        pre = (doc.get("pre_tokenizer") or {}).get("type")
        if pre != "Whitespace":
            raise ValueError(f"unsupported pre_tokenizer {pre!r}")
        merges = []
        for m in model.get("merges", []):
            # both serializations are in the wild: "a b" strings (the
            # original format) and ["a", "b"] pairs (tokenizers >= 0.20)
            if isinstance(m, str):
                left, _, right = m.partition(" ")
            else:
                left, right = m
            merges.append((left, right))
        return cls(model["vocab"], merges, model.get("unk_token") or "<unk>")

    def _bpe(self, word: str) -> list[str]:
        """Greedy lowest-rank merge loop (the BPE apply rule)."""
        cached = self._cache.get(word)
        if cached is not None:
            return cached
        syms = list(word)
        while len(syms) > 1:
            best_rank = None
            best_i = -1
            for i in range(len(syms) - 1):
                r = self.ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank = r
                    best_i = i
            if best_rank is None:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        if len(self._cache) < 65536:
            self._cache[word] = syms
        return syms

    def encode(self, text: str) -> _Encoding:
        ids: list[int] = []
        tokens: list[str] = []
        unk_id = self.vocab.get(self.unk_token, 0)
        for m in _PRETOKEN_RE.finditer(text or ""):
            for sym in self._bpe(m.group(0)):
                tid = self.vocab.get(sym)
                if tid is None:
                    tokens.append(self.unk_token)
                    ids.append(unk_id)
                else:
                    tokens.append(sym)
                    ids.append(tid)
        return _Encoding(ids, tokens)

    def decode(self, ids: list[int]) -> str:
        # documented library behavior for a BPE model without a decoder:
        # token strings joined with single spaces, specials skipped
        return " ".join(
            self.id_to_token[i]
            for i in ids
            if i in self.id_to_token and self.id_to_token[i] != self.unk_token
        )
