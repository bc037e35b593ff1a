"""Dataset-construction operators: chunking, formatting, sampling,
splitting, filtering — the `DatasetConstructor` surface of the
reference (`/root/reference/src/quarrycore/dataset/constructor.py:65-126`:
sample -> chunk -> format -> export -> analytics).

All deterministic; the RNG-flavored steps (curriculum sampling, splits)
use content hashes instead of random state so the DuckDB oracle can
reproduce them exactly.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..config import fixed_probe_pool
from ..sources.io import typed_pandas
from ..text import normalize_whitespace_array

CHUNK_TOKENS = 64  # reference: 2048 gpt2 tokens (dataset/chunker.py:15-54);
CHUNK_OVERLAP = 8  # scaled to whitespace tokens for the test corpus
MIN_WORDS, MAX_WORDS = 10, 50_000  # reference config.py:259-260 (50/50k), scaled
MIN_QUALITY = 0.6  # reference pipeline.py:761-779 default min_score


def _docs(sf_dir: str, columns=None) -> "rd.Dataset":
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


def _canon(sf_dir: str) -> "rd.Dataset":
    def _f(batch: pa.Table) -> pa.Table:
        return batch.append_column("canonical", normalize_whitespace_array(batch["text"]))

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(_f, batch_format="pyarrow").drop_columns(["text"])


class TokenChunker:
    """Token-window chunker with overlap (actor-pool stage, row explosion).

    Reference: `dataset/chunker.py:38-54` — 2048-token windows with 128
    overlap using the gpt2 tokenizer. No HF tokenizers in this
    environment, so tokens are whitespace tokens; the windowing/overlap/
    explosion mechanics are identical. Emits (doc_id, chunk_idx,
    chunk_text, n_chunk_tokens).
    """

    def __init__(self, chunk_tokens: int = CHUNK_TOKENS, overlap: int = CHUNK_OVERLAP):
        from ..functions.models import try_gpt2_tokenizer, try_tokenizer_json

        self.chunk_tokens = chunk_tokens
        self.overlap = overlap
        self.step = chunk_tokens - overlap
        # real-model hook: with HF tokenizers installed the actor
        # tokenizes with actual gpt2 BPE (reference chunker.py:15-54);
        # next preference is a real tokenizer.json artifact
        # ($QC_TOKENIZER_JSON, e.g. trained from the corpus by
        # bpe_train_merges); whitespace tokens are the deterministic
        # fallback
        self._tokenizer = try_gpt2_tokenizer() or try_tokenizer_json()

    def _tokens_and_joiner(self, text: str):
        """(token sequence, window -> chunk_text) for real or fallback path."""
        if self._tokenizer is not None:
            enc = self._tokenizer.encode(text)
            ids = list(getattr(enc, "ids", enc))
            return ids, self._tokenizer.decode
        words = text.split(" ") if text else []
        return words, " ".join

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_id: list[int] = []
        out_idx: list[int] = []
        out_text: list[str] = []
        out_n: list[int] = []
        for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["canonical"].to_pylist()):
            words, join = self._tokens_and_joiner(text)
            if not words:
                continue
            start = 0
            ci = 0
            while start < len(words):
                window = words[start : start + self.chunk_tokens]
                out_id.append(doc_id)
                out_idx.append(ci)
                out_text.append(join(window))
                out_n.append(len(window))
                if start + self.chunk_tokens >= len(words):
                    break
                start += self.step
                ci += 1
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "chunk_idx": pa.array(out_idx, pa.int64()),
                "chunk_text": pa.array(out_text, pa.string()),
                "n_chunk_tokens": pa.array(out_n, pa.int64()),
            }
        )


def chunk_documents(sf_dir: str) -> "rd.Dataset":
    """Explode documents into overlapping token windows."""
    return _canon(sf_dir).map_batches(
        TokenChunker, batch_format="pyarrow", concurrency=fixed_probe_pool()
    )


def format_instruction(sf_dir: str) -> "rd.Dataset":
    """Instruction-template formatting (reference dataset/formatter.py:18-77):
    (doc_id, formatted) with '### Instruction:\\n...\\n### Response:\\n...'."""

    def _f(batch: pa.Table) -> pa.Table:
        src = batch["source"].to_pylist()
        canon = normalize_whitespace_array(batch["text"]).to_pylist()
        formatted = [
            f"### Instruction:\nSummarize the following {s} document.\n### Response:\n{t}"
            for s, t in zip(src, canon)
        ]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "formatted": pa.array(formatted, pa.string()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text", "source"]).map_batches(_f, batch_format="pyarrow")


def format_document(sf_dir: str) -> "rd.Dataset":
    """Document-format passthrough (reference formatter.py:30-31:
    ``format_type == "document"`` emits ``{"text": chunk}``): one row
    per document with its whitespace-normalized text. Completes the
    reference's formatter trio (instruction / document / conversation).
    Output: (doc_id, text)."""

    def _f(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "text": normalize_whitespace_array(batch["text"]),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _f, batch_format="pyarrow"
    )


def filter_docs_by_length(sf_dir: str) -> "rd.Dataset":
    """Word-count gate (reference config min_word_count/max_word_count):
    docs with MIN_WORDS <= n_tokens <= MAX_WORDS -> (doc_id, n_tokens)."""

    def _f(batch: pa.Table) -> pa.Table:
        toks = pc.cast(
            pc.list_value_length(pc.split_pattern(batch["canonical"], " ")), pa.int64()
        )
        batch = batch.append_column("n_tokens", toks)
        keep = pc.and_(
            pc.greater_equal(toks, pa.scalar(MIN_WORDS)),
            pc.less_equal(toks, pa.scalar(MAX_WORDS)),
        )
        return batch.filter(keep).drop_columns(["canonical"])

    return _canon(sf_dir).map_batches(_f, batch_format="pyarrow")


def train_val_test_split(sf_dir: str) -> "rd.Dataset":
    """Deterministic 80/10/10 split by md5(doc_id) bucket -> counts.

    Reference: ratio-based split (`protocols.py:429-432`). Hash-based
    assignment keeps it reproducible across engines and runs — the
    DuckDB oracle computes the identical md5 buckets. Output:
    (split, n_docs).
    """
    import hashlib

    def _f(batch: pa.Table) -> pa.Table:
        splits = []
        for d in batch["doc_id"].to_pylist():
            bucket = int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16) % 10
            splits.append("train" if bucket < 8 else ("val" if bucket == 8 else "test"))
        return pa.table({"split": pa.array(splits, pa.string())})

    from ray.data.aggregate import Count

    return (
        _docs(sf_dir, ["doc_id"])
        .map_batches(_f, batch_format="pyarrow")
        .groupby("split")
        .aggregate(Count(alias_name="n_docs"))
    )


def curriculum_sample(sf_dir: str, k: int = 100) -> pd.DataFrame:
    """Curriculum ordering: easiest-first by a difficulty proxy, take k.

    Reference: `dataset/sampler.py:21-105` sorts by difficulty (quality
    proxy) with rejection sampling. The difficulty proxy here is
    document length (shorter = easier); deterministic tie-break doc_id.
    Output (rank, doc_id, n_chars).
    """
    top = (
        _docs(sf_dir, ["doc_id", "n_chars"])
        .sort(["n_chars", "doc_id"])
        .limit(k)
        .to_pandas()
    )
    top.insert(0, "rank", np.arange(1, len(top) + 1, dtype=np.int64))
    return top


def rejection_sample(sf_dir: str) -> "rd.Dataset":
    """Quality-weighted rejection sampling, deterministic.

    Reference: `dataset/sampler.py:21-105` rejection-samples with
    quality weighting (quality_weight=0.7, factor=2.0). RNG draws are
    replaced by a uniform hash of doc_id (md5 bucket / 256), so both the
    engine and the SQL oracle accept exactly the same documents:

        accept iff  u(doc_id) < 0.3 + 0.7 * length_score

    Output: (doc_id, accept_prob) for accepted docs, prob floor-rounded
    to 6 dp.
    """
    import hashlib

    from ..exactmath import floor_round_np

    def _f(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = normalize_whitespace_array(batch["text"]).to_pylist()
        keep_ids: list[int] = []
        probs: list[float] = []
        for d, t in zip(ids, texts):
            ls = min(len(t) / 400.0, 1.0)
            prob = 0.3 + 0.7 * ls
            u = (int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16) % 256) / 256.0
            if u < prob:
                keep_ids.append(d)
                probs.append(prob)
        return pa.table(
            {
                "doc_id": pa.array(keep_ids, pa.int64()),
                "accept_prob": pa.array(floor_round_np(np.asarray(probs)), pa.float64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(_f, batch_format="pyarrow")


def weighted_sample_docs(sf_dir: str, k: int = 50) -> pd.DataFrame:
    """Distributed weighted sampling (the A-Res / Efraimidis-Spirakis
    shape): each doc gets priority u / w — u a deterministic md5-derived
    uniform, w = n_chars — and the k SMALLEST priorities win, so longer
    docs are proportionally likelier. Output: (doc_id, n_chars,
    priority), priority floor-rounded at 1e-9.

    Determinism across engines: u = hash_int / 2^32 and u / w are each
    a single correctly-rounded IEEE double op, so the engine and the
    SQL oracle compute bit-identical priorities and select identical
    rows — no RNG, no float-library divergence (this is why the key is
    u/w and not the classic u^(1/w): pow is not correctly rounded).
    Scale shape: priorities are per-row map work; selection is a
    per-batch top-k combiner (each block keeps its k best) and a final
    k-row driver sort — never a global sort.
    """
    import hashlib

    import pyarrow.compute as pc

    from ..exactmath import floor_round_np

    def _pri(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        h = np.fromiter(
            (
                int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16)
                for d in ids
            ),
            dtype=np.int64,
            count=len(ids),
        )
        u = h / 2**32
        w = np.maximum(np.asarray(batch["n_chars"], dtype=np.int64), 1)
        pri = u / w
        out = pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_chars": batch["n_chars"],
                "pri": pa.array(pri, pa.float64()),
            }
        )
        order = pc.sort_indices(
            out, sort_keys=[("pri", "ascending"), ("doc_id", "ascending")]
        )
        return out.take(order[:k])

    best = (
        typed_pandas(
            _docs(sf_dir, ["doc_id", "n_chars"]).map_batches(
                _pri, batch_format="pyarrow"
            ),
            {"doc_id": "int64", "n_chars": "int64", "pri": "float64"},
        )
        .sort_values(["pri", "doc_id"])
        .head(k)
        .reset_index(drop=True)
    )
    best["priority"] = floor_round_np(best.pop("pri").to_numpy(), 9)
    return best[["doc_id", "n_chars", "priority"]]


def to_conversation_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Conversation-format records (reference formatter.py:60-77):
    messages = [user: 'Can you tell me about: <first line>', assistant:
    full text], plus a `format` tag column. Emits a list<struct> Arrow
    column — the nested shape HF chat datasets expect."""
    msg_t = pa.list_(pa.struct([("role", pa.string()), ("content", pa.string())]))
    msgs = []
    for t in batch[text_col].to_pylist():
        t = t or ""
        title = t.split("\n")[0].strip()
        msgs.append(
            [
                {"role": "user", "content": f"Can you tell me about: {title}"},
                {"role": "assistant", "content": t},
            ]
        )
    batch = batch.append_column("messages", pa.array(msgs, msg_t))
    return batch.append_column(
        "format", pa.array(["conversation"] * batch.num_rows, pa.string())
    )


def format_conversation(sf_dir: str) -> "rd.Dataset":
    """Flattened conversation formatting for the oracle gate:
    (doc_id, user_content, assistant_content, format). The nested
    messages shape lives in `to_conversation_batch`."""

    def _f(batch: pa.Table) -> pa.Table:
        nested = to_conversation_batch(batch, text_col="text")
        msgs = nested["messages"].to_pylist()
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "user_content": pa.array([m[0]["content"] for m in msgs], pa.string()),
                "assistant_content": pa.array(
                    [m[1]["content"] for m in msgs], pa.string()
                ),
                "format": nested["format"],
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(_f, batch_format="pyarrow")


def export_dataset(sf_dir: str, out_dir: str, fmt: str = "parquet") -> str:
    """Exporter (reference dataset/exporter.py:45-107): write the
    formatted dataset as parquet, jsonl, or an HF-consumable dataset
    directory; returns the output path.

    `hf`: with the `datasets` library installed the export goes through
    `Dataset.save_to_disk` (the reference's HuggingFaceExporter path);
    without it, the fallback writes sharded parquet under `data/` plus a
    `dataset_infos.json` — directly loadable with
    `load_dataset("parquet", data_files="data/*.parquet")`.
    """
    ds = format_instruction(sf_dir)
    path = os.path.join(out_dir, fmt)
    if fmt == "parquet":
        ds.write_parquet(path)
    elif fmt == "jsonl":
        ds.write_json(path)
    elif fmt == "hf":
        try:
            import datasets  # type: ignore

            hf = datasets.Dataset.from_pandas(ds.to_pandas())
            hf.save_to_disk(path)
        except ImportError:
            import json

            data_dir = os.path.join(path, "data")
            ds.write_parquet(data_dir)
            schema = {f.name: str(f.type) for f in ds.schema().base_schema}
            with open(os.path.join(path, "dataset_infos.json"), "w") as f:
                json.dump(
                    {
                        "default": {
                            "description": "instruction-formatted export",
                            "features": schema,
                            "splits": {"train": {"name": "train"}},
                        }
                    },
                    f,
                    indent=2,
                )
    else:
        raise ValueError(f"unknown export format: {fmt}")
    return path


def dataset_analytics_report(sf_dir: str) -> pd.DataFrame:
    """Reference dataset analytics report
    (/root/reference/src/quarrycore/dataset/analytics.py:27-101) as one
    single-row table: record count, vocabulary size, token-count
    distribution (mean/std/min/max + interpolated p25/p50/p75, the
    numpy-percentile definition), and quality-score distribution.

    Distribution stats come from bounded value HISTOGRAMS (one groupby
    per metric over distinct values, the length_quantiles pattern) —
    moments are exact integer sums over the histogram, percentiles are
    an O(distinct-values) driver walk, and nothing sorts or collects
    the corpus. Std dev uses the exact-moment form
    sqrt(S2/n - (S1/n)^2) (documented deviation from numpy's two-pass;
    mathematically equal). Vocabulary size is the exact distinct-token
    count via the combiner aggregate."""
    import numpy as np

    from ray.data.aggregate import Count

    from ..exactmath import floor_round_np
    from ..functions.textstats import quality_scores
    from .training import _term_counts, _token_aggregate

    def _stats(batch: pa.Table) -> pa.Table:
        qb = quality_scores(batch)
        n_tok = pc.cast(
            pc.list_value_length(pc.split_pattern(batch["canonical"], " ")),
            pa.int64(),
        )
        q_u = np.floor(
            np.asarray(qb["quality"], dtype=np.float64) * 1e6 + 0.5
        ).astype(np.int64)
        return pa.table(
            {"n_tokens": n_tok, "q_u": pa.array(q_u, pa.int64())}
        )

    scored = _canon(sf_dir).map_batches(_stats, batch_format="pyarrow").materialize()

    def _hist(col: str) -> pd.DataFrame:
        return typed_pandas(
            scored.groupby(col).aggregate(Count(alias_name="c")),
            {col: "int64", "c": "int64"},
        ).sort_values(col).reset_index(drop=True)

    def _dist(h: pd.DataFrame, col: str) -> dict:
        v = h[col].to_numpy(dtype=np.int64)
        c = h["c"].to_numpy(dtype=np.int64)
        n = int(c.sum())
        if n == 0:  # analytics over an empty corpus: all-zero report
            return {"n": 0, "mean": 0.0, "std": 0.0, "min": 0, "max": 0,
                    "p25": 0.0, "p50": 0.0, "p75": 0.0}
        s1 = int((v * c).sum())
        s2 = int((v * v * c).sum())
        mean = s1 * 1.0 / n
        var = s2 * 1.0 / n - mean * mean
        std = float(np.sqrt(max(var, 0.0)))
        cum = np.cumsum(c)

        def value_at(k: int) -> int:
            return int(v[np.searchsorted(cum, k + 1)])

        def pctl(q: float) -> float:
            idx = (n - 1) * q
            lo = int(np.floor(idx))
            frac = idx - lo
            x_lo = value_at(lo)
            if frac == 0.0:
                return float(x_lo)
            return x_lo + frac * (value_at(lo + 1) - x_lo)

        return {
            "n": n, "mean": mean, "std": std,
            "min": int(v[0]), "max": int(v[-1]),
            "p25": pctl(0.25), "p50": pctl(0.5), "p75": pctl(0.75),
        }

    tok = _dist(_hist("n_tokens"), "n_tokens")
    qual = _dist(_hist("q_u"), "q_u")
    vocab_size = _token_aggregate(
        _term_counts(_canon(sf_dir)), "df"
    ).count()

    r6 = lambda x: float(floor_round_np(np.array([x]))[0])
    return pd.DataFrame(
        {
            "total_records": pd.array([tok["n"]], dtype="int64"),
            "vocabulary_size": pd.array([int(vocab_size)], dtype="int64"),
            "tok_mean": [r6(tok["mean"])],
            "tok_std": [r6(tok["std"])],
            "tok_min": pd.array([tok["min"]], dtype="int64"),
            "tok_max": pd.array([tok["max"]], dtype="int64"),
            "tok_p25": [r6(tok["p25"])],
            "tok_p50": [r6(tok["p50"])],
            "tok_p75": [r6(tok["p75"])],
            "quality_mean": [r6(qual["mean"] / 1e6)],
            "quality_std": [r6(qual["std"] / 1e6)],
            "quality_min": [r6(qual["min"] / 1e6)],
            "quality_max": [r6(qual["max"] / 1e6)],
        }
    )


def construct_dataset(
    sf_dir: str,
    out_dir: str,
    sample_k: int = 200,
    export_formats: tuple = ("parquet", "jsonl"),
) -> dict:
    """End-to-end dataset construction job mirroring the reference's
    `DatasetConstructor.create_dataset`
    (/root/reference/src/quarrycore/dataset/constructor.py:65-126):
    curriculum sample -> token-window chunking -> instruction formatting
    -> export(s) -> analytics report, with stage-boundary checkpointing
    (`state/checkpoint.CheckpointManager`) so a rerun resumes past
    completed stages — the batch analog of the reference's linear
    in-memory flow.

    Returns a manifest dict: per-stage row counts, export paths,
    stages run vs skipped, and the analytics report row."""
    import json as _json
    import os as _os
    import shutil as _shutil

    import ray
    import ray.data as rd

    from ..state.checkpoint import CheckpointManager

    ckpt = CheckpointManager(out_dir)

    def _sampled() -> "rd.Dataset":
        ids = set(
            curriculum_sample(sf_dir, k=sample_k)["doc_id"].tolist()
        )
        ids_ref = ray.put(frozenset(ids))

        def _keep(batch: pa.Table) -> pa.Table:
            keep_ids = ray.get(ids_ref)
            mask = [i in keep_ids for i in batch["doc_id"].to_pylist()]
            return batch.filter(pa.array(mask))

        return _canon(sf_dir).map_batches(_keep, batch_format="pyarrow")

    sampled = ckpt.stage("sampled", _sampled)
    chunked = ckpt.stage(
        "chunked",
        lambda: sampled.map_batches(
            TokenChunker, concurrency=2, batch_format="pyarrow"
        ),
    )

    def _formatted() -> "rd.Dataset":
        def _fmt(batch: pa.Table) -> pa.Table:
            texts = batch["chunk_text"]
            formatted = pc.binary_join_element_wise(
                pa.array(["### Instruction:\nSummarize the following document."
                          "\n### Response:\n"] * batch.num_rows),
                pc.cast(texts, pa.string()),
                "",
            )
            return pa.table(
                {
                    "doc_id": batch["doc_id"],
                    "chunk_idx": batch["chunk_idx"],
                    "text": formatted,
                }
            )

        return chunked.map_batches(_fmt, batch_format="pyarrow")

    formatted = ckpt.stage("formatted", _formatted)

    exports = {}
    for fmt in export_formats:
        dest = _os.path.join(out_dir, f"export_{fmt}")
        if not _os.path.exists(dest):
            # write-to-tmp + atomic rename: a crash mid-export must not
            # leave a partial dir a resume would skip as complete (same
            # protocol as CheckpointManager.stage)
            tmp = dest + ".tmp"
            _shutil.rmtree(tmp, ignore_errors=True)
            if fmt == "parquet":
                formatted.write_parquet(tmp)
            elif fmt == "jsonl":
                formatted.write_json(tmp)
            _os.rename(tmp, dest)
        exports[fmt] = dest

    manifest = {
        "n_sampled": sampled.count(),
        "n_chunks": chunked.count(),
        "n_records": formatted.count(),
        "exports": exports,
        "stages_run": ckpt.stages_run,
        "stages_skipped": ckpt.stages_skipped,
    }
    with open(_os.path.join(out_dir, "job.json"), "w") as f:
        _json.dump(manifest, f, indent=2)
    return manifest


def stratified_sample_docs(sf_dir: str, total_k: int = 100) -> "rd.Dataset":
    """Proportional stratified sampling with EXACT largest-remainder
    (Hamilton) apportionment: allocate `total_k` sample slots across
    sources proportional to size — base_i = floor(K*n_i/N), the
    leftover slots go to the largest integer remainders (K*n_i) mod N,
    ties by source name — then pick each source's slots
    deterministically by md5(doc_id) order (the same
    deterministic-random order as `shard_docs_deterministic`).
    All-integer: the apportionment is reproducible in SQL with no
    float division anywhere.

    Scale shape: ONE tiny per-source count groupby drives the
    driver-side apportionment (O(#sources)); selection is one hash
    partition on source with a vectorized rank-and-head per partition.
    Output (source, doc_id, pick_rank).
    """
    import hashlib

    from ray.data.aggregate import Count

    from ..stages.grouped import partitioned_group_map
    from .documents import _docs

    cnt = (
        _docs(sf_dir, ["source"])
        .groupby("source")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    out_schema = pa.schema(
        [
            ("source", pa.string()),
            ("doc_id", pa.int64()),
            ("pick_rank", pa.int64()),
        ]
    )
    if cnt.empty:
        return rd.from_arrow(out_schema.empty_table())
    total_n = int(cnt["n"].sum())
    base = {
        s: (total_k * int(n)) // total_n
        for s, n in zip(cnt["source"], cnt["n"])
    }
    rem = {
        s: (total_k * int(n)) % total_n
        for s, n in zip(cnt["source"], cnt["n"])
    }
    leftover = total_k - sum(base.values())
    for s in sorted(rem, key=lambda s: (-rem[s], s))[:leftover]:
        base[s] += 1
    alloc = base  # source -> k_i, exact ints

    def _pick(tb: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(tb).with_columns(
            pl.col("doc_id")
            .cast(pl.String)
            .map_elements(
                lambda s: hashlib.md5(s.encode()).hexdigest(),
                return_dtype=pl.String,
            )
            .alias("h")
        )
        out = (
            df.sort(["source", "h", "doc_id"])
            .with_columns(
                (pl.int_range(pl.len()).over("source") + 1).alias("pick_rank")
            )
            .with_columns(
                pl.col("source")
                .map_elements(
                    lambda s: alloc.get(s, 0), return_dtype=pl.Int64
                )
                .alias("_k")
            )
            .filter(pl.col("pick_rank") <= pl.col("_k"))
            .select(["source", "doc_id", "pick_rank"])
        )
        return out.to_arrow().cast(out_schema)

    return partitioned_group_map(
        _docs(sf_dir, ["source", "doc_id"]), "source", _pick, arrow=True
    )


def stratified_oracle_sql(total_k: int = 100) -> str:
    """DuckDB twin of `stratified_sample_docs` (same integer Hamilton
    apportionment, same md5 pick order)."""
    return f"""
        WITH cnt AS (
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n
            FROM documents GROUP BY source
        ),
        tot AS (SELECT CAST(SUM(n) AS BIGINT) AS N FROM cnt),
        quota AS (
            SELECT source, n,
                   ({total_k} * n) // (SELECT N FROM tot) AS base,
                   ({total_k} * n) % (SELECT N FROM tot) AS rem
            FROM cnt
        ),
        lr AS (
            SELECT source, base, rem,
                   row_number() OVER (ORDER BY rem DESC, source) AS rr
            FROM quota
        ),
        alloc AS MATERIALIZED (
            SELECT source,
                   base + CASE WHEN rr <= {total_k} -
                       (SELECT CAST(SUM(base) AS BIGINT) FROM lr)
                       THEN 1 ELSE 0 END AS k
            FROM lr
        ),
        ranked AS (
            SELECT d.source, d.doc_id,
                   row_number() OVER (
                       PARTITION BY d.source
                       ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id
                   ) AS pick_rank
            FROM documents d
        )
        SELECT r.source, r.doc_id, CAST(r.pick_rank AS BIGINT) AS pick_rank
        FROM ranked r JOIN alloc a ON a.source = r.source
        WHERE r.pick_rank <= a.k
    """
