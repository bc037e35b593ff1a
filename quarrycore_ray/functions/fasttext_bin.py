"""fastText `.bin` supervised-model writer + from-spec loader/predictor.

The reference's language detector loads a real fastText model
(`/root/reference/src/quarrycore/extractor/language_detector.py:167-260`,
lid.176). Neither the `fasttext` library nor its weights exist in this
environment, so — mirroring `tokenizer_json.py` — this module supplies
both halves of the real-artifact hook leg:

- `write_fasttext_bin`: serialize a supervised model into the REAL
  fastText binary format (the public serialization from the fastText
  source, `FastText::saveModel` / `Args::save` / `Dictionary::save` /
  `DenseMatrix::save`, file-format magic 793712314, version 12): args
  block, dictionary entries (word cstring + int64 count + int8 type),
  dense input and output matrices as float32. A file written here is
  what `fasttext.load_model` parses wherever the library is installed.
- `FastTextModel`: a from-spec reader + predictor for that format —
  whitespace tokenization with the `</s>` EOS token, hidden = mean of
  input vectors, scores = softmax(output @ hidden), exposing the
  library's batch-predict surface
  (`predict(list[str]) -> (labels, probs)` with `__label__x` labels).
- `train_langid_model`: deterministic SGD training of the (input,
  output) matrices on labeled text — softmax regression over averaged
  word vectors, exactly the supervised fastText objective with
  wordNgrams=1 / bucket=0 (no subword or ngram hashing, so the
  dictionary is the whole feature space).

Only the supervised/softmax/no-subword corner of the format is
supported; anything else raises rather than mis-parsing.
"""

from __future__ import annotations

import struct

import numpy as np

FASTTEXT_MAGIC = 793712314
FASTTEXT_VERSION = 12

#: args enums (fastText args.h): loss softmax = 3, model supervised = 3
_LOSS_SOFTMAX = 3
_MODEL_SUP = 3

EOS = "</s>"


def _pack_args(dim: int) -> bytes:
    """Args::save — 12 int32s + one float64 (field order from args.cc)."""
    ints = [
        dim,       # dim
        5,         # ws
        5,         # epoch
        1,         # minCount
        5,         # neg
        1,         # wordNgrams
        _LOSS_SOFTMAX,
        _MODEL_SUP,
        0,         # bucket (no ngram hashing)
        0,         # minn (no subwords)
        0,         # maxn
        100,       # lrUpdateRate
    ]
    return struct.pack("<12i", *ints) + struct.pack("<d", 1e-4)


def write_fasttext_bin(
    path: str,
    words: list[str],
    labels: list[str],
    counts: list[int],
    input_matrix: np.ndarray,
    output_matrix: np.ndarray,
) -> None:
    """Serialize a supervised model. `words` excludes the `__label__`
    prefix of `labels` (added here); `counts` covers words then labels;
    `input_matrix` is (n_words, dim) float32 (one row per word, no
    bucket rows), `output_matrix` is (n_labels, dim) float32."""
    n_words, dim = input_matrix.shape
    n_labels = output_matrix.shape[0]
    if n_words != len(words) or n_labels != len(labels):
        raise ValueError("matrix rows must match words/labels")
    full = [f"__label__{l}" for l in labels]
    with open(path, "wb") as f:
        f.write(struct.pack("<ii", FASTTEXT_MAGIC, FASTTEXT_VERSION))
        f.write(_pack_args(dim))
        # Dictionary::save — size, nwords, nlabels (int32), ntokens,
        # pruneidx_size (int64), then entries
        f.write(
            struct.pack(
                "<iiiqq",
                n_words + n_labels,
                n_words,
                n_labels,
                int(sum(counts)),
                -1,
            )
        )
        for i, w in enumerate(words + full):
            f.write(w.encode("utf-8") + b"\x00")
            f.write(struct.pack("<qb", int(counts[i]), 0 if i < n_words else 1))
        # quant flag, input matrix, qout flag, output matrix
        f.write(struct.pack("<?", False))
        f.write(struct.pack("<qq", n_words, dim))
        f.write(np.ascontiguousarray(input_matrix, dtype="<f4").tobytes())
        f.write(struct.pack("<?", False))
        f.write(struct.pack("<qq", n_labels, dim))
        f.write(np.ascontiguousarray(output_matrix, dtype="<f4").tobytes())


class FastTextModel:
    """From-spec reader/predictor for the subset written above."""

    def __init__(self, words, labels, input_matrix, output_matrix):
        self.word_id = {w: i for i, w in enumerate(words)}
        self.labels = labels  # with __label__ prefix
        self.input = input_matrix
        self.output = output_matrix

    @classmethod
    def load(cls, path: str) -> "FastTextModel":
        with open(path, "rb") as f:
            data = f.read()
        off = 0

        def take(fmt):
            nonlocal off
            vals = struct.unpack_from(fmt, data, off)
            off += struct.calcsize(fmt)
            return vals

        magic, version = take("<ii")
        if magic != FASTTEXT_MAGIC:
            raise ValueError(f"not a fastText model (magic {magic})")
        if version > FASTTEXT_VERSION:
            raise ValueError(f"unsupported fastText version {version}")
        (dim, _ws, _ep, _mc, _neg, _wn, loss, model, bucket, minn, _mx, _lr) = take("<12i")
        take("<d")  # sampling threshold t
        if model != _MODEL_SUP or loss != _LOSS_SOFTMAX:
            raise ValueError("only supervised/softmax models supported")
        if bucket != 0 or minn != 0:
            raise ValueError("ngram/subword buckets not supported")
        size, n_words, n_labels, _ntokens, pruneidx = take("<iiiqq")
        if pruneidx != -1:
            raise ValueError("pruned dictionaries not supported")
        words: list[str] = []
        for _ in range(size):
            end = data.index(b"\x00", off)
            words.append(data[off:end].decode("utf-8"))
            off = end + 1
            take("<qb")  # count, type
        quant = take("<?")[0]
        if quant:
            raise ValueError("quantized input not supported")
        m, n = take("<qq")
        inp = np.frombuffer(data, dtype="<f4", count=m * n, offset=off).reshape(m, n)
        off += m * n * 4
        qout = take("<?")[0]
        if qout:
            raise ValueError("quantized output not supported")
        m2, n2 = take("<qq")
        out = np.frombuffer(data, dtype="<f4", count=m2 * n2, offset=off).reshape(m2, n2)
        return cls(words[:n_words], words[n_words:], inp.copy(), out.copy())

    def _scores(self, text: str) -> "np.ndarray | None":
        toks = (text or "").split() + [EOS]
        ids = [self.word_id[t] for t in toks if t in self.word_id]
        if not ids:
            return None
        hidden = self.input[ids].mean(axis=0)
        z = self.output @ hidden
        z = z - z.max()
        e = np.exp(z)
        return e / e.sum()

    def predict(self, text, k: int = 1):
        """fastText batch-predict surface: list input -> (list of label
        tuples, list of prob arrays); str input -> one (tuple, array)."""
        single = isinstance(text, str)
        texts = [text] if single else list(text)
        all_labels: list[tuple] = []
        all_probs: list[np.ndarray] = []
        for t in texts:
            p = self._scores(t)
            if p is None:
                all_labels.append(())
                all_probs.append(np.array([]))
                continue
            top = np.argsort(-p, kind="stable")[:k]
            all_labels.append(tuple(self.labels[i] for i in top))
            all_probs.append(p[top].astype(np.float64))
        if single:
            return all_labels[0], all_probs[0]
        return all_labels, all_probs


def train_langid_model(
    samples: list[tuple[str, str]], dim: int = 16, epochs: int = 12,
    lr: float = 0.4, seed: int = 7,
):
    """Deterministic supervised training (softmax regression over
    averaged word vectors — the fastText supervised objective with
    unigram features). Returns (words, labels, counts, input, output)
    ready for `write_fasttext_bin`."""
    rng = np.random.default_rng(seed)
    vocab: dict[str, int] = {}
    counts: dict[str, int] = {}
    label_set: list[str] = []
    tokenized: list[tuple[list[int], int]] = []
    for text, label in samples:
        toks = text.split() + [EOS]
        ids = []
        for t in toks:
            if t not in vocab:
                vocab[t] = len(vocab)
            counts[t] = counts.get(t, 0) + 1
            ids.append(vocab[t])
        if label not in label_set:
            label_set.append(label)
        tokenized.append((ids, label_set.index(label)))
    n_words, n_labels = len(vocab), len(label_set)
    inp = (rng.random((n_words, dim), dtype=np.float32) - 0.5) / dim
    out = np.zeros((n_labels, dim), dtype=np.float32)
    order = np.arange(len(tokenized))
    for _ in range(epochs):
        rng.shuffle(order)
        for idx in order:
            ids, y = tokenized[idx]
            hidden = inp[ids].mean(axis=0)
            z = out @ hidden
            z -= z.max()
            p = np.exp(z)
            p /= p.sum()
            grad = -p
            grad[y] += 1.0
            # output update + backprop into the averaged input rows
            g_hidden = out.T @ grad
            out += lr * np.outer(grad, hidden)
            inp[ids] += (lr / len(ids)) * g_hidden
    words = list(vocab)
    return (
        words,
        label_set,
        [counts[w] for w in words] + [1] * n_labels,
        inp,
        out,
    )
