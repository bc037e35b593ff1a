"""Corpus-curation operators for LLM training data.

The C4 / CCNet / Gopher lineage of web-corpus cleaning, re-expressed
Ray-Data-first over the `documents` table: global segment-level exact
dedup (C4's "discard all but one of any three-sentence span"), PII
redaction (regex scrub with typed placeholder tokens), and repetition
quality metrics (Gopher's duplicate-n-gram fractions). The reference's
single-process quality pipeline applies per-document scorers
(`/root/reference/src/quarrycore/quality/assessor.py:70-119`); these
operators extend that surface with the *cross-document* curation steps a
100 TB pipeline needs, each with an exact DuckDB oracle.

Scale notes per operator are in the docstrings; the common theme is that
the only shuffles are hash-partitions on compact keys (segment digest,
int doc_id) via `stages.grouped.partitioned_group_map` — never on text.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

import numpy as np

from ray.data.aggregate import Sum

from ..exactmath import floor_round_np
from ..stages.grouped import attach_lookup, partitioned_group_map
from ..text import normalize_whitespace_array, sha256_hex_array

SEG_WORDS = 10  # words per dedup segment (C4 uses 3 sentences; the
# synthetic corpus has no sentence punctuation, so fixed word windows)


def _canonical_docs(sf_dir: str) -> "rd.Dataset":
    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def _f(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "canonical": normalize_whitespace_array(batch["text"]),
            }
        )

    return ds.map_batches(_f, batch_format="pyarrow")


# --- C4-style global segment dedup ------------------------------------------


def _make_segment_explode(seg_words: int):
    """Per-batch polars explode of canonical text into non-overlapping
    `seg_words`-word segments: (doc_id, seg_idx, seg, n_total_segs,
    seg_hash). No shuffle — segmentation is embarrassingly parallel."""

    def _explode(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(batch).with_columns(
            pl.col("canonical").str.split(" ").alias("_w")
        )
        segs = (
            df.select(["doc_id", "_w"])
            .explode("_w")
            .with_columns(pl.int_range(pl.len()).over("doc_id").alias("_i"))
            .group_by(
                "doc_id", (pl.col("_i") // seg_words).alias("seg_idx"),
                maintain_order=True,
            )
            .agg(pl.col("_w").str.join(" ").alias("seg"))
            .with_columns(pl.len().over("doc_id").alias("n_total_segs"))
        )
        tb = segs.to_arrow().cast(
            pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("seg_idx", pa.int64()),
                    ("seg", pa.string()),
                    ("n_total_segs", pa.int64()),
                ]
            )
        )
        return tb.append_column("seg_hash", sha256_hex_array(tb["seg"]))

    return _explode


def soft_dedup_weights(sf_dir: str) -> "rd.Dataset":
    """Soft deduplication: keep every document but downweight duplicates
    — the reweighting alternative to hard removal (SoftDeDup, He et al.
    2024, arXiv:2407.06654 reweights by n-gram commonness; this is the
    exact-duplicate-group variant: weight = 1 / multiplicity of the
    doc's canonical-text group, so each distinct text contributes unit
    total mass to the training mix).

    Scale: the only shuffle is a combiner aggregate keyed on the 64-char
    content hash (per-batch partial counts first, so only
    (hash, partial) rows move); counts are attached back via the
    broadcast/partitioned-join switch. Text never crosses the wire.
    Output (doc_id, group_size, weight)."""
    docs = _canonical_docs(sf_dir)

    def _h(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "h": sha256_hex_array(batch["canonical"]),
            }
        )

    hashed = docs.map_batches(_h, batch_format="pyarrow").materialize()

    _P_SCHEMA = pa.schema(
        [pa.field("h", pa.string()), pa.field("_p", pa.int64())]
    )

    def _partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        return (
            pl.from_arrow(batch.select(["h"]))
            .group_by("h")
            .len()
            .rename({"len": "_p"})
            .to_arrow()
            .cast(_P_SCHEMA)
        )

    cnt = (
        hashed.map_batches(_partial, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Sum("_p", alias_name="n"))
    )

    H_SCHEMA = pa.schema(
        [pa.field("doc_id", pa.int64()), pa.field("h", pa.string())]
    )
    out = attach_lookup(
        hashed, H_SCHEMA, ["h"], cnt, "h", "n", pa.int64(), ["group_size"]
    )

    def _w(batch: pa.Table) -> pa.Table:
        n = np.asarray(batch["group_size"], dtype=np.float64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "group_size": pc.cast(batch["group_size"], pa.int64()),
                "weight": pa.array(floor_round_np(1.0 / n), pa.float64()),
            }
        )

    return out.map_batches(_w, batch_format="pyarrow")


def segment_dedup_docs(sf_dir: str, seg_words: int = SEG_WORDS) -> "rd.Dataset":
    """Remove every repeated occurrence of any `seg_words`-word segment
    across the WHOLE corpus, keeping only its first occurrence in
    (doc_id, seg_idx) order, then reassemble documents from their
    surviving segments (C4 §2.2's span dedup, word-window variant).

    Output: (doc_id, kept_text, n_kept_segs, n_total_segs) for documents
    with >= 1 surviving segment.

    Scale shape: segmentation is a per-batch polars explode (no
    shuffle); the global keep-first decision hash-partitions on the
    segment's sha256 digest, so all occurrences of a segment meet in one
    partition and one vectorized pass keeps the (doc_id, seg_idx)-min
    row per digest — the same coarse-partitioned keep-min plan as
    `stages/exact.py`, applied to sub-document granularity. Reassembly
    hash-partitions survivors on int doc_id. Both shuffle payloads are
    one segment (~60 bytes) per row, never whole documents.
    """

    def _keep_first(tb: pa.Table) -> pa.Table:
        import polars as pl

        out = (
            pl.from_arrow(tb)
            .sort(["seg_hash", "doc_id", "seg_idx"])
            .unique(["seg_hash"], keep="first", maintain_order=True)
            .drop(["seg_hash"])
        )
        return out.to_arrow().cast(
            pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("seg_idx", pa.int64()),
                    ("seg", pa.string()),
                    ("n_total_segs", pa.int64()),
                ]
            )
        )

    def _reassemble(tb: pa.Table) -> pa.Table:
        import polars as pl

        out = (
            pl.from_arrow(tb)
            .sort(["doc_id", "seg_idx"])
            .group_by("doc_id", maintain_order=True)
            .agg(
                pl.col("seg").str.join(" ").alias("kept_text"),
                pl.len().cast(pl.Int64).alias("n_kept_segs"),
                pl.col("n_total_segs").first(),
            )
        )
        return out.to_arrow().cast(
            pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("kept_text", pa.string()),
                    ("n_kept_segs", pa.int64()),
                    ("n_total_segs", pa.int64()),
                ]
            )
        )

    exploded = _canonical_docs(sf_dir).map_batches(
        _make_segment_explode(seg_words), batch_format="pyarrow"
    )
    survivors = partitioned_group_map(exploded, "seg_hash", _keep_first, arrow=True)
    return partitioned_group_map(survivors, "doc_id", _reassemble, arrow=True)


def decontaminate_docs(
    sf_dir: str,
    seg_words: int = SEG_WORDS,
    holdout_mod: int = 50,
    canon: "rd.Dataset | None" = None,
) -> "rd.Dataset":
    """Benchmark decontamination: flag training documents that share any
    `seg_words`-word segment with a holdout/benchmark set (the GPT-3 /
    Gopher n-gram overlap filter applied before training). The holdout
    is the deterministic slice doc_id % holdout_mod == 0; output is
    (doc_id, n_contaminated_segs) over contaminated TRAINING docs, where
    the count is of distinct contaminated segment values per doc.

    Scale shape: both sides explode into segment rows per batch; ONE
    hash shuffle on the segment digest co-locates every occurrence, and
    the partition pass emits distinct (train doc_id, seg_hash) pairs for
    digests that also carry a holdout row — a semi-join expressed as the
    same coarse-partitioned group map as every other keyed step. The
    benchmark side is typically tiny but nothing assumes it: no
    broadcast, no driver state, skew bounded by segment-value
    cardinality.
    """

    segs = (canon if canon is not None else _canonical_docs(sf_dir)).map_batches(
        _make_segment_explode(seg_words), batch_format="pyarrow"
    )

    def _sides(batch: pa.Table) -> pa.Table:
        import numpy as np

        ids = np.asarray(batch["doc_id"], dtype=np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "seg_hash": batch["seg_hash"],
                "_bench": pa.array((ids % holdout_mod == 0).astype(np.int8)),
            }
        )

    def _semi(tb: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(tb)
        hot = df.filter(pl.col("_bench") == 1).select("seg_hash").unique()
        hits = (
            df.filter(pl.col("_bench") == 0)
            .join(hot, on="seg_hash", how="semi")
            .select(["doc_id", "seg_hash"])
            .unique()  # distinct segment values per doc
        )
        return hits.to_arrow().cast(
            pa.schema([("doc_id", pa.int64()), ("seg_hash", pa.string())])
        )

    pairs = partitioned_group_map(
        segs.map_batches(_sides, batch_format="pyarrow"), "seg_hash", _semi,
        arrow=True,
    )
    from ray.data.aggregate import Count

    return pairs.groupby("doc_id").aggregate(
        Count(alias_name="n_contaminated_segs")
    )


# --- PII redaction -----------------------------------------------------------

# RE2 syntax shared verbatim with the DuckDB oracle (both engines run
# RE2, so match boundaries and non-overlapping left-to-right counting
# agree by construction)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b555-[0-9]{4}\b"
IP_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def pii_redact_docs(sf_dir: str) -> "rd.Dataset":
    """Scrub emails / phone numbers / IPv4 addresses with typed
    placeholder tokens and count each kind per document.

    The synthetic corpus contains no PII, so a deterministic PII suffix
    derived from doc_id is appended first (identically in the DuckDB
    oracle) — the operator under test is the cascade itself: redact
    emails, then phones on the email-redacted text, then IPs, counting
    each pattern on the text it is applied to. Output: (doc_id,
    redacted, n_emails, n_phones, n_ips).

    Scale shape: a pure `map_batches` over Arrow string arrays — Arrow's
    RE2 kernels (`replace_substring_regex` / `count_substring_regex`)
    run compiled and zero-copy; no shuffle, no state, linear scan.
    """

    def _f(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"]
        # the PII suffix is synthetic test scaffolding (the corpus has
        # none); the operator under test — the RE2 cascade below — stays
        # fully vectorized
        suffix = pa.array(
            [
                f"contact user{d}@mail.example.com or call 555-0{d % 1000:03d}"
                f" from host 10.{d % 250}.{(d * 7) % 250}.{d % 99}"
                for d in ids.to_pylist()
            ],
            pa.string(),
        )
        injected = pc.binary_join_element_wise(batch["canonical"], suffix, " ")
        n_emails = pc.count_substring_regex(injected, EMAIL_RE)
        no_email = pc.replace_substring_regex(injected, EMAIL_RE, "<EMAIL>")
        n_phones = pc.count_substring_regex(no_email, PHONE_RE)
        no_phone = pc.replace_substring_regex(no_email, PHONE_RE, "<PHONE>")
        n_ips = pc.count_substring_regex(no_phone, IP_RE)
        redacted = pc.replace_substring_regex(no_phone, IP_RE, "<IP>")
        return pa.table(
            {
                "doc_id": ids,
                "redacted": redacted,
                "n_emails": n_emails.cast(pa.int64()),
                "n_phones": n_phones.cast(pa.int64()),
                "n_ips": n_ips.cast(pa.int64()),
            }
        )

    return _canonical_docs(sf_dir).map_batches(_f, batch_format="pyarrow")


# --- Gopher repetition metrics ----------------------------------------------


def repetition_stats_docs(sf_dir: str) -> "rd.Dataset":
    """Per-document repetition metrics in the Gopher rules' shape
    (Rae et al. 2021, Table A1): fraction of tokens taken by the single
    most frequent word, and fraction of word bigrams that are repeat
    occurrences. Output: (doc_id, n_words, top_word_frac,
    dup_bigram_frac), fractions floor-rounded at 1e-6 to match the
    oracle's arithmetic.

    Scale shape: per-document metrics are embarrassingly parallel — one
    polars explode + two grouped reductions per batch, no shuffle. A
    quality-filter predicate (e.g. top_word_frac <= 0.2) composes as a
    downstream `filter` without recomputation.
    """

    def _f(batch: pa.Table) -> pa.Table:
        import numpy as np
        import polars as pl

        df = pl.from_arrow(batch).with_columns(
            pl.col("canonical").str.split(" ").alias("_w")
        )
        words = (
            df.select(["doc_id", "_w"])
            .explode("_w")
            .with_columns(pl.col("_w").shift(-1).over("doc_id").alias("_nxt"))
            .with_columns(
                pl.concat_str(
                    [pl.col("_w"), pl.col("_nxt")], separator=" "
                ).alias("_bg")
            )
        )
        per_doc = words.group_by("doc_id", maintain_order=True).agg(
            pl.len().cast(pl.Int64).alias("n_words"),
            pl.col("_w").unique_counts().max().cast(pl.Int64).alias("_top"),
            pl.col("_bg").is_not_null().sum().cast(pl.Int64).alias("_n_bigrams"),
            pl.col("_bg").drop_nulls().n_unique().cast(pl.Int64).alias(
                "_uniq_bigrams"
            ),
        )
        n_words = per_doc["n_words"].to_numpy().astype(np.float64)
        top = per_doc["_top"].to_numpy().astype(np.float64)
        nb = per_doc["_n_bigrams"].to_numpy().astype(np.float64)
        ub = per_doc["_uniq_bigrams"].to_numpy().astype(np.float64)
        top_frac = np.where(n_words > 0, top / np.maximum(n_words, 1), 0.0)
        dup_frac = np.where(nb > 0, 1.0 - ub / np.maximum(nb, 1), 0.0)
        return pa.table(
            {
                "doc_id": pa.array(per_doc["doc_id"].to_numpy(), pa.int64()),
                "n_words": pa.array(per_doc["n_words"].to_numpy(), pa.int64()),
                "top_word_frac": pa.array(
                    floor_round_np(top_frac, 6), pa.float64()
                ),
                "dup_bigram_frac": pa.array(
                    floor_round_np(dup_frac, 6), pa.float64()
                ),
            }
        )

    return _canonical_docs(sf_dir).map_batches(_f, batch_format="pyarrow")


# --- ExactSubstr duplicated-span detection (Lee et al. 2022) -----------------

EXACT_SUBSTR_CHARS = 40  # Lee et al. use 50 BPE tokens; character
# analogue sized so the synthetic corpus's planted duplicates trip it


def exact_substr_spans(
    sf_dir: str, gram_chars: int = EXACT_SUBSTR_CHARS
) -> "rd.Dataset":
    """Maximal duplicated character spans across the WHOLE corpus:
    every position whose `gram_chars`-gram occurs >= 2 times anywhere
    (any document, including the same one), merged per document into
    maximal overlapping-or-touching spans — the ExactSubstr dedup of
    Lee et al., "Deduplicating Training Data Makes Language Models
    Better" (arXiv:2107.06499), §3.1, re-expressed Ray-Data-first.

    Output: (doc_id, span_start, span_end) with span_end exclusive;
    [span_start, span_end) is duplicated text a trainer would drop.

    Scale shape: gram explosion is a per-batch polars explode (no
    shuffle, n-L+1 rows per doc — the same work set as the paper's
    suffix array). The duplicate decision hash-partitions on the gram
    (all occurrences of a gram meet in one partition; one vectorized
    count-over pass). Span merging hash-partitions survivor POSITIONS
    (two ints) on doc_id — gaps-and-islands, vectorized. At 100 TB the
    gram shuffle is the dominant exchange, exactly as the paper's
    distributed suffix-array build is; a 128-bit gram digest (not the
    text) would be the shuffle key at that scale — here the gram is
    ~40 bytes, the same order as its digest, and keying on the text
    keeps the oracle collision-free.
    """

    def _keep_duplicated(tb: pa.Table) -> pa.Table:
        import polars as pl

        out = (
            pl.from_arrow(tb)
            .filter(pl.len().over("gram") >= 2)
            .select(["doc_id", "pos"])
        )
        return out.to_arrow().cast(
            pa.schema([("doc_id", pa.int64()), ("pos", pa.int64())])
        )

    grams = _canonical_docs(sf_dir).map_batches(
        _make_gram_explode(gram_chars), batch_format="pyarrow"
    )
    dup_positions = partitioned_group_map(
        grams, "gram", _keep_duplicated, arrow=True, lineage_stage="exact_substr_dup"
    )
    return partitioned_group_map(
        dup_positions, "doc_id", _make_span_merge(gram_chars), arrow=True,
        lineage_stage="exact_substr_merge",
    )


def _make_gram_explode(gram_chars: int):
    """Per-batch polars explode of canonical text into every overlapping
    `gram_chars`-gram: (doc_id, pos, gram). No shuffle."""

    def _grams(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = (
            pl.from_arrow(batch)
            .with_columns(pl.col("canonical").str.len_chars().alias("n"))
            .filter(pl.col("n") >= gram_chars)
        )
        if df.height == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "pos": pa.array([], pa.int64()),
                    "gram": pa.array([], pa.string()),
                }
            )
        out = (
            df.with_columns(
                pl.int_ranges(0, pl.col("n") - gram_chars + 1).alias("pos")
            )
            .explode("pos")
            .with_columns(
                pl.col("canonical")
                .str.slice(pl.col("pos"), gram_chars)
                .alias("gram")
            )
            .select(
                pl.col("doc_id").cast(pl.Int64),
                pl.col("pos").cast(pl.Int64),
                "gram",
            )
        )
        return out.to_arrow().cast(
            pa.schema(
                [("doc_id", pa.int64()), ("pos", pa.int64()), ("gram", pa.string())]
            )
        )

    return _grams


def _make_span_merge(gram_chars: int):
    """Partition fn: (doc_id, pos) rows -> maximal merged spans.
    Gaps-and-islands: a new span starts when the gap between consecutive
    positions exceeds the gram length (overlapping OR touching merge)."""

    def _merge_spans(tb: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(tb).sort(["doc_id", "pos"])
        if df.height == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "span_start": pa.array([], pa.int64()),
                    "span_end": pa.array([], pa.int64()),
                }
            )
        out = (
            df.with_columns(
                (
                    pl.col("pos").diff().over("doc_id").fill_null(gram_chars + 1)
                    > gram_chars
                )
                .cast(pl.Int64)
                .cum_sum()
                .over("doc_id")
                .alias("island")
            )
            .group_by(["doc_id", "island"])
            .agg(
                pl.col("pos").min().alias("span_start"),
                (pl.col("pos").max() + gram_chars).alias("span_end"),
            )
            .select(["doc_id", "span_start", "span_end"])
        )
        return out.to_arrow().cast(
            pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("span_start", pa.int64()),
                    ("span_end", pa.int64()),
                ]
            )
        )

    return _merge_spans


def exact_substr_dedup_docs(
    sf_dir: str, gram_chars: int = EXACT_SUBSTR_CHARS
) -> "rd.Dataset":
    """ExactSubstr REMOVAL (Lee et al. 2022, arXiv:2107.06499 §3.1):
    keep the corpus-wide FIRST occurrence (by (doc_id, pos)) of every
    duplicated `gram_chars`-gram and cut all later occurrences out of
    their documents, reassembling each document from the surviving
    ranges. The character-level analogue of the paper's "remove all but
    one occurrence of any repeated 50-token span".

    Output: (doc_id, kept_text, n_removed_chars) for EVERY document —
    unaffected docs pass through with n_removed_chars = 0.

    Scale shape: same two hash-partitions as `exact_substr_spans` (gram,
    then doc_id); the cut stage co-partitions removal spans WITH the
    canonical text by unioning both under the doc_id key — a partitioned
    hash join, never a driver-side collect. The only per-row python is
    the final string slicing, bounded by spans-per-doc.
    """

    def _keep_losers(tb: pa.Table) -> pa.Table:
        import polars as pl

        out = (
            pl.from_arrow(tb)
            .sort(["gram", "doc_id", "pos"])
            .filter(
                (pl.len().over("gram") >= 2)
                & (pl.int_range(pl.len()).over("gram") > 0)
            )
            .select(["doc_id", "pos"])
        )
        return out.to_arrow().cast(
            pa.schema([("doc_id", pa.int64()), ("pos", pa.int64())])
        )

    _UNION_SCHEMA = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("span_start", pa.int64()),
            ("span_end", pa.int64()),
            ("canonical", pa.string()),
        ]
    )

    def _tag_spans(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "span_start": batch["span_start"],
                "span_end": batch["span_end"],
                "canonical": pa.nulls(n, pa.string()),
            },
            schema=_UNION_SCHEMA,
        )

    def _tag_docs(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "span_start": pa.nulls(n, pa.int64()),
                "span_end": pa.nulls(n, pa.int64()),
                "canonical": batch["canonical"],
            },
            schema=_UNION_SCHEMA,
        )

    def _cut(tb: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(tb)
        docs = df.filter(pl.col("canonical").is_not_null())
        spans = (
            df.filter(pl.col("span_start").is_not_null())
            .sort(["doc_id", "span_start"])
        )
        by_doc: dict[int, list[tuple[int, int]]] = {}
        for d, s, e in zip(
            spans["doc_id"].to_list(),
            spans["span_start"].to_list(),
            spans["span_end"].to_list(),
        ):
            by_doc.setdefault(d, []).append((s, e))
        ids: list[int] = []
        kept: list[str] = []
        removed: list[int] = []
        for d, text in zip(docs["doc_id"].to_list(), docs["canonical"].to_list()):
            cuts = by_doc.get(d)
            if not cuts:
                ids.append(d)
                kept.append(text)
                removed.append(0)
                continue
            parts: list[str] = []
            prev = 0
            for s, e in cuts:
                parts.append(text[prev:s])
                prev = e
            parts.append(text[prev:])
            out_text = "".join(parts)
            ids.append(d)
            kept.append(out_text)
            removed.append(len(text) - len(out_text))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "kept_text": pa.array(kept, pa.string()),
                "n_removed_chars": pa.array(removed, pa.int64()),
            }
        )

    grams = _canonical_docs(sf_dir).map_batches(
        _make_gram_explode(gram_chars), batch_format="pyarrow"
    )
    removal_positions = partitioned_group_map(
        grams, "gram", _keep_losers, arrow=True,
        lineage_stage="exact_substr_losers",
    )
    removal_spans = partitioned_group_map(
        removal_positions, "doc_id", _make_span_merge(gram_chars), arrow=True,
        lineage_stage="exact_substr_rm_merge",
    )
    tagged = removal_spans.map_batches(_tag_spans, batch_format="pyarrow").union(
        _canonical_docs(sf_dir).map_batches(_tag_docs, batch_format="pyarrow")
    )
    return partitioned_group_map(
        tagged, "doc_id", _cut, arrow=True, lineage_stage="exact_substr_cut"
    )


# ---------------------------------------------------------------------------
# C4 line-quality filter + RefinedWeb within-document line dedup
# ---------------------------------------------------------------------------

LINE_WORDS = 8  # words per synthesized line (the corpus has no newlines)


def _lines_frame(batch: pa.Table):
    """Per-batch polars frame of synthesized lines: (doc_id, j, body).

    The synthetic corpus is a single-space word stream with no newlines
    or punctuation, so — exactly like `pii_redact_docs` injects PII —
    both the engine and the DuckDB oracle deterministically restructure
    each canonical document into `LINE_WORDS`-word lines before the
    operator under test runs. Line construction is a per-batch polars
    explode/group_by (docs are whole rows, so no shuffle)."""
    import polars as pl

    return (
        pl.from_arrow(batch)
        .with_columns(pl.col("canonical").str.split(" ").alias("_w"))
        .select(["doc_id", "_w"])
        .explode("_w")
        .with_columns(pl.int_range(pl.len()).over("doc_id").alias("_i"))
        .group_by(
            "doc_id", (pl.col("_i") // LINE_WORDS).alias("j"),
            maintain_order=True,
        )
        .agg(pl.col("_w").str.join(" ").alias("body"))
    )


def c4_line_filter_docs(sf_dir: str) -> "rd.Dataset":
    """C4's line- and page-level quality cascade (Raffel et al. 2020,
    arXiv:1910.10683 §2.2, public recipe), over deterministically
    synthesized lines (see `_lines_frame`): with injected markers
    mirrored bit-for-bit by the oracle —

      line kept iff it ends in terminal punctuation ([.!?"]), has >= 5
      words, and does not contain 'javascript';
      page kept iff >= 1 line survives, the surviving text has >= 3
      sentence terminators, and the page contains neither 'lorem ipsum'
      nor '{'.

    Injections (all deterministic in doc_id and line index j): terminal
    '.'/'!' on lines with (doc_id+j)%3 in {0,1}; ' javascript' on
    (doc_id+j)%7==0; ' lorem ipsum' on line 0 of doc_id%31==0; ' {' on
    line 1 of doc_id%37==0.

    Output: (doc_id, filtered_text, n_kept_lines, n_total_lines) for
    kept pages. Scale shape: one stateless map_batches — line
    synthesis, per-line predicates and page reassembly are all
    confined to the batch (documents arrive whole), so the operator
    never shuffles. Reference anchor: the quality-filter surface of
    `/root/reference/src/quarrycore/quality/assessor.py` applies
    per-document heuristics; this is the corpus-curation analogue."""

    def _filter(batch: pa.Table) -> pa.Table:
        import polars as pl

        lines = _lines_frame(batch).with_columns(
            (
                pl.col("body")
                + pl.when((pl.col("j") == 0) & (pl.col("doc_id") % 31 == 0))
                .then(pl.lit(" lorem ipsum")).otherwise(pl.lit(""))
                + pl.when((pl.col("j") == 1) & (pl.col("doc_id") % 37 == 0))
                .then(pl.lit(" {")).otherwise(pl.lit(""))
                + pl.when((pl.col("doc_id") + pl.col("j")) % 7 == 0)
                .then(pl.lit(" javascript")).otherwise(pl.lit(""))
                + pl.when((pl.col("doc_id") + pl.col("j")) % 3 == 0)
                .then(pl.lit("."))
                .when((pl.col("doc_id") + pl.col("j")) % 3 == 1)
                .then(pl.lit("!")).otherwise(pl.lit(""))
            ).alias("line")
        )
        out = (
            lines.with_columns(
                keep=pl.col("line").str.contains(r'[.!?"]$')
                & (pl.col("line").str.count_matches(r"[^ ]+") >= 5)
                & ~pl.col("line").str.contains("javascript", literal=True),
                bad=pl.col("line").str.contains("lorem ipsum", literal=True)
                | pl.col("line").str.contains("{", literal=True),
            )
            .group_by("doc_id", maintain_order=True)
            .agg(
                pl.col("line").filter(pl.col("keep")).str.join("\n")
                .alias("filtered_text"),
                pl.col("keep").sum().alias("n_kept_lines"),
                pl.len().alias("n_total_lines"),
                pl.col("bad").any().alias("_bad"),
            )
            .filter(
                ~pl.col("_bad")
                & (pl.col("n_kept_lines") >= 1)
                & (
                    pl.col("filtered_text").str.count_matches(r"[.!?]")
                    >= 3
                )
            )
            .select(
                "doc_id", "filtered_text", "n_kept_lines", "n_total_lines"
            )
        )
        return out.to_arrow().cast(
            pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("filtered_text", pa.string()),
                    ("n_kept_lines", pa.int64()),
                    ("n_total_lines", pa.int64()),
                ]
            )
        )

    return _canonical_docs(sf_dir).map_batches(
        _filter, batch_format="pyarrow"
    )


def dedup_lines_docs(sf_dir: str) -> "rd.Dataset":
    """RefinedWeb-style within-document line dedup (Penedo et al. 2023,
    arXiv:2306.01116 — 'remove duplicated lines within a page', public
    recipe): over the synthesized lines of `_lines_frame`, with every
    third line (j % 3 == 2) deterministically replaced by a copy of
    line j-2 (the injected duplication, mirrored by the oracle), keep
    only the FIRST occurrence of each distinct line per document and
    reassemble in order.

    Output: (doc_id, deduped_text, n_kept_lines, n_total_lines) for
    every document. Scale shape: one stateless map_batches — the
    dedup is within-document, so each batch resolves its own rows;
    no shuffle, no state."""

    def _dedup(batch: pa.Table) -> pa.Table:
        import polars as pl

        lines = (
            _lines_frame(batch)
            .sort(["doc_id", "j"], maintain_order=True)
            .with_columns(
                pl.when(pl.col("j") % 3 == 2)
                .then(pl.col("body").shift(2).over("doc_id"))
                .otherwise(pl.col("body"))
                .alias("line")
            )
        )
        out = (
            lines.with_columns(
                keep=pl.col("line").is_first_distinct().over("doc_id")
            )
            .group_by("doc_id", maintain_order=True)
            .agg(
                pl.col("line").filter(pl.col("keep")).str.join("\n")
                .alias("deduped_text"),
                pl.col("keep").sum().alias("n_kept_lines"),
                pl.len().alias("n_total_lines"),
            )
        )
        return out.to_arrow().cast(
            pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("deduped_text", pa.string()),
                    ("n_kept_lines", pa.int64()),
                    ("n_total_lines", pa.int64()),
                ]
            )
        )

    return _canonical_docs(sf_dir).map_batches(
        _dedup, batch_format="pyarrow"
    )


# --- composed curation pipeline with reject-stage lineage ---------------------

_STAGED_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.int64()),
        pa.field("canonical", pa.string()),
    ]
)


def _stage_rejects(
    canon: "rd.Dataset",
    g: "rd.Dataset",
    cc: "rd.Dataset",
    dec: "rd.Dataset",
    holdout_mod: int,
) -> "rd.Dataset":
    """Stitch the three curation signals onto the canonical corpus and
    attribute each doc to the FIRST rejecting stage -> (doc_id,
    canonical, rej) with rej in {holdout, gopher, ccnet, decontaminate,
    NULL}. Three doc_id-keyed `attach_lookup` passes (broadcast under
    1M docs, hash-partitioned join above); shared by
    `curation_pipeline_docs` and `html_curate_dedup_docs`."""
    t = attach_lookup(
        canon, _STAGED_SCHEMA, ["doc_id"], g, "doc_id", "keep",
        pa.int64(), ["keep"],
    )
    s2 = pa.schema(list(_STAGED_SCHEMA) + [pa.field("keep", pa.int64())])
    t = attach_lookup(
        t, s2, ["doc_id"], cc, "doc_id", "bucket", pa.string(), ["bucket"]
    )
    s3 = pa.schema(list(s2) + [pa.field("bucket", pa.string())])
    t = attach_lookup(
        t, s3, ["doc_id"], dec, "doc_id", "n_contaminated_segs",
        pa.int64(), ["n_cont"],
    )

    def _stage(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"], dtype=np.int64)
        keep = np.asarray(batch["keep"], dtype=np.int64)
        bucket = np.asarray(batch["bucket"])
        contaminated = ~np.asarray(pc.is_null(batch["n_cont"]))
        rej = np.full(len(ids), None, dtype=object)
        rej[contaminated] = "decontaminate"
        rej[bucket == "tail"] = "ccnet"
        rej[keep == 0] = "gopher"
        rej[ids % holdout_mod == 0] = "holdout"
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "canonical": batch["canonical"],
                "rej": pa.array(rej, pa.string()),
            }
        )

    return t.map_batches(_stage, batch_format="pyarrow")


def curation_pipeline_docs(
    sf_dir: str, holdout_mod: int = 50
) -> "rd.Dataset":
    """The composed corpus-curation pipeline with per-document reject
    lineage — the multi-stage orchestration the reference runs one
    document at a time (`pipeline.py` stage chain; multi-level dedup
    orchestration deduplicator/deduplicator.py:202-251) re-expressed as
    one Ray Data flow. Signals are computed corpus-wide (score, then
    filter — the CCNet/Gopher publication order), and each doc is
    attributed to the FIRST stage that rejects it:

      holdout        benchmark slice (doc_id % holdout_mod == 0)
      gopher         fails the Gopher quality rules
      ccnet          'tail' perplexity bucket
      decontaminate  shares a 10-word segment with the holdout slice
      exact_dup      survivor whose canonical text equals an earlier
                     (min-doc_id) survivor's
      kept           the surviving representative set

    Scale: three doc_id-keyed `attach_lookup` passes stitch the stage
    signals onto the corpus (broadcast under 1M docs, hash-partitioned
    join above); the dedup step shuffles on the SHA-256 digest of
    canonical text (compact key, never the text itself) and keeps the
    min doc_id per group. Output (doc_id, kept, reject_stage) — one row
    per input document, so lineage is total, not just the keep list."""
    from .training import ccnet_bucket_docs, gopher_quality_docs

    # ONE read + canonicalize pass shared by every downstream signal
    # (the composed pipeline would otherwise re-read and re-normalize
    # the corpus three more times)
    canon = _canonical_docs(sf_dir).materialize()

    g = gopher_quality_docs(sf_dir).select_columns(["doc_id", "keep"])
    cc = ccnet_bucket_docs(sf_dir, canon=canon).select_columns(
        ["doc_id", "bucket"]
    )
    dec = decontaminate_docs(sf_dir, holdout_mod=holdout_mod, canon=canon)
    staged = _stage_rejects(canon, g, cc, dec, holdout_mod).materialize()

    def _surv_key(batch: pa.Table) -> pa.Table:
        m = pc.is_null(batch["rej"])
        kept_rows = batch.filter(m)
        return pa.table(
            {
                "doc_id": kept_rows["doc_id"],
                "h": sha256_hex_array(kept_rows["canonical"]),
            }
        )

    surv = staged.map_batches(_surv_key, batch_format="pyarrow")

    def _rep_part(tb: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(tb)
        out = df.with_columns(
            pl.col("doc_id").min().over("h").alias("rep")
        )
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"].to_numpy(), pa.int64()),
                "rep": pa.array(out["rep"].to_numpy(), pa.int64()),
            }
        )

    withrep = partitioned_group_map(surv, "h", _rep_part, arrow=True)

    # staged still carries canonical; attach the rep on a slim projection
    staged_slim = staged.map_batches(
        lambda b: b.select(["doc_id", "rej"]), batch_format="pyarrow"
    )
    final = attach_lookup(
        staged_slim,
        pa.schema(
            [pa.field("doc_id", pa.int64()), pa.field("rej", pa.string())]
        ),
        ["doc_id"],
        withrep,
        "doc_id",
        "rep",
        pa.int64(),
        ["rep"],
    )

    def _final(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"], dtype=np.int64)
        rej = np.asarray(batch["rej"], dtype=object)
        rep = batch["rep"]
        rep_np = np.asarray(
            pc.fill_null(rep, pa.scalar(-1, pa.int64())), dtype=np.int64
        )
        surv_mask = np.array([r is None for r in rej])
        kept = surv_mask & (rep_np == ids)
        stage = rej.copy()
        stage[surv_mask & (rep_np != ids)] = "exact_dup"
        stage[kept] = "kept"
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "kept": pa.array(kept.astype(np.int64), pa.int64()),
                "reject_stage": pa.array(stage, pa.string()),
            }
        )

    return final.map_batches(_final, batch_format="pyarrow")


def html_curate_dedup_docs(sf_dir: str, holdout_mod: int = 50) -> "rd.Dataset":
    """The documents-axis end-to-end pipeline from HTML — the Ray-Data
    re-expression of the reference's main per-document loop (extract ->
    quality -> dedup -> store, pipeline.py:583-880), composed from the
    individually-oracled stages and with TOTAL reject lineage:

      html_pages     deterministic boilerplate page per document
      extract        full cascade (stages/extract.py; the DOM strategy
                     strips every planted fragment, recovering exactly
                     the normalized document text)
      curation gate  holdout / gopher / ccnet / decontaminate staging
                     computed ON THE EXTRACTED TEXT (`_stage_rejects`;
                     gopher's raw-text metrics therefore see the
                     single-line canonical form — what a real pipeline
                     scores after extraction)
      flagship dedup survivors through the full multi-level stack
                     (exact short-circuit -> MinHash/LSH -> verify ->
                     cluster, pipelines/dedup.dedup_conversations)

    Output: one row per input document —
      (doc_id, kept, reject_stage, cluster_id)
    with reject_stage in {holdout, gopher, ccnet, decontaminate,
    exact_dup, near_dup, kept}; cluster_id is NULL for curation-rejected
    docs and the flagship cluster label ('doc-XXXXXXXX' of the cluster
    representative) for survivors. Exact DuckDB oracle: the curation
    staging SQL composed with sqlgen.dedup_clusters_sql over the
    survivor body.

    Scale: the extracted corpus is canonicalized ONCE and shared by all
    three curation signals; stage signals attach by doc_id
    (broadcast/partitioned auto-switch); the dedup stack shuffles only
    digests and band keys; the final verdict attach joins the clusters
    table (O(survivors)) back by doc_id.
    """
    from ..stages.extract import extract_html
    from .dedup import dedup_conversations
    from .documents import html_pages
    from .training import ccnet_bucket_docs, gopher_stats_batch

    extracted = extract_html(html_pages(sf_dir))

    def _canon(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "canonical": normalize_whitespace_array(batch["text"]),
            }
        )

    # ONE materialized canonical pass over the EXTRACTED text feeds
    # every curation signal (the raw documents table is only re-read by
    # reference inside ccnet/dec when canon is None — here it never is)
    canon = extracted.map_batches(_canon, batch_format="pyarrow").materialize()

    def _as_text(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": batch["doc_id"], "text": batch["canonical"]}
        )

    g = (
        canon.map_batches(_as_text, batch_format="pyarrow")
        .map_batches(gopher_stats_batch, batch_format="pyarrow")
        .select_columns(["doc_id", "keep"])
    )
    cc = ccnet_bucket_docs(sf_dir, canon=canon).select_columns(
        ["doc_id", "bucket"]
    )
    dec = decontaminate_docs(sf_dir, holdout_mod=holdout_mod, canon=canon)
    staged = _stage_rejects(canon, g, cc, dec, holdout_mod).materialize()

    def _survivor_convs(batch: pa.Table) -> pa.Table:
        kept = batch.filter(pc.is_null(batch["rej"]))
        ids = [f"doc-{i:08d}" for i in kept["doc_id"].to_pylist()]
        return pa.table(
            {
                "conv_id": pa.array(ids, pa.string()),
                "canonical_text": kept["canonical"],
                "n_turns": pa.array(
                    np.ones(kept.num_rows, dtype=np.int32)
                ),
            }
        )

    convs = staged.map_batches(_survivor_convs, batch_format="pyarrow")
    clusters = dedup_conversations(convs).clusters

    # clusters (conv_id='doc-XXXXXXXX') -> per-doc verdict + label
    def _verdict(batch: pa.Table) -> pa.Table:
        did = pc.cast(
            pc.utf8_slice_codeunits(batch["conv_id"], 4, 64), pa.int64()
        )
        verdict = pc.if_else(
            batch["is_representative"],
            pa.scalar("kept"),
            pc.if_else(
                pc.equal(batch["dup_kind"], pa.scalar("exact")),
                pa.scalar("exact_dup"),
                pa.scalar("near_dup"),
            ),
        )
        return pa.table(
            {
                "doc_id": did,
                "verdict": verdict,
                "cluster_id": batch["cluster_id"],
            }
        )

    # materialized ONCE: both attach passes below call
    # lookup.materialize() on their lookup — a lazy verdicts would
    # re-run the whole cluster-assign + verdict map a second time
    verdicts = clusters.map_batches(
        _verdict, batch_format="pyarrow"
    ).materialize()

    staged_slim = staged.map_batches(
        lambda b: b.select(["doc_id", "rej"]), batch_format="pyarrow"
    )
    slim_schema = pa.schema(
        [pa.field("doc_id", pa.int64()), pa.field("rej", pa.string())]
    )
    t = attach_lookup(
        staged_slim, slim_schema, ["doc_id"], verdicts, "doc_id",
        "verdict", pa.string(), ["verdict"],
    )
    t = attach_lookup(
        t,
        pa.schema(list(slim_schema) + [pa.field("verdict", pa.string())]),
        ["doc_id"], verdicts, "doc_id", "cluster_id", pa.string(),
        ["cluster_id"],
    )

    out_schema = pa.schema(
        [
            pa.field("doc_id", pa.int64()),
            pa.field("kept", pa.int64()),
            pa.field("reject_stage", pa.string()),
            pa.field("cluster_id", pa.string()),
        ]
    )

    def _final(batch: pa.Table) -> pa.Table:
        stage = pc.coalesce(batch["rej"], batch["verdict"])
        kept = pc.cast(pc.equal(stage, pa.scalar("kept")), pa.int64())
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "kept": kept,
                "reject_stage": stage,
                "cluster_id": batch["cluster_id"],
            }
        ).cast(out_schema)

    return t.map_batches(_final, batch_format="pyarrow")


def ngram_novelty_docs(sf_dir: str, n: int = 3) -> "rd.Dataset":
    """Per-document n-gram novelty: of a document's distinct word
    n-grams, how many does it introduce to the corpus (this doc is the
    gram's minimum-doc_id occurrence)? The memorization/novelty
    diagnostic of training-data curation — a doc whose grams all first
    appeared elsewhere adds no new text even if it isn't a near-dup
    (complements MinHash, which misses low-Jaccard recombinations).

    Shuffle plan: docs explode to DISTINCT (gram, doc_id) rows once;
    ONE hash-partition on the gram string co-locates every occurrence
    of a gram, so the partition-local min doc_id IS the global
    first-occurrence and per-doc partials (grams seen, grams
    introduced) reduce inside the partition; a combiner-friendly
    integer Sum groupby on int doc_id folds the partials. Text never
    shuffles twice, and the second shuffle carries <= |docs| x
    |partitions| integer rows. Output (doc_id, n_grams, n_novel) for
    every doc with >= n tokens; all-integer, exact oracle.
    """
    import polars as pl

    from ray.data.aggregate import Sum as _Sum

    from ..sources.io import typed_pandas

    def _grams(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(
            pa.table(
                {
                    "doc_id": batch["doc_id"],
                    "canonical": normalize_whitespace_array(batch["text"]),
                }
            )
        )
        e = (
            df.with_columns(pl.col("canonical").str.split(" ").alias("w"))
            .select("doc_id", "w")
            .explode("w")
        )
        gram = pl.col("w")
        for k in range(1, n):
            gram = gram + " " + pl.col("w").shift(-k).over("doc_id")
        out = (
            e.with_columns(gram.alias("gram"))
            .drop_nulls("gram")
            .select("doc_id", "gram")
            .unique()
        )
        return out.to_arrow().cast(
            pa.schema(
                [pa.field("doc_id", pa.int64()),
                 pa.field("gram", pa.string())]
            )
        )

    keyed = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).map_batches(_grams, batch_format="pyarrow")

    def _part(tb: pa.Table) -> pa.Table:
        df = pl.from_arrow(tb)
        per_doc = (
            df.with_columns(
                pl.col("doc_id").min().over("gram").alias("first_doc")
            )
            .group_by("doc_id")
            .agg(
                pl.len().cast(pl.Int64).alias("n_grams_p"),
                (pl.col("doc_id") == pl.col("first_doc"))
                .sum()
                .cast(pl.Int64)
                .alias("n_novel_p"),
            )
        )
        return per_doc.to_arrow().cast(
            pa.schema(
                [pa.field("doc_id", pa.int64()),
                 pa.field("n_grams_p", pa.int64()),
                 pa.field("n_novel_p", pa.int64())]
            )
        )

    parts = partitioned_group_map(keyed, "gram", _part, arrow=True)
    agg = parts.groupby("doc_id").aggregate(
        _Sum("n_grams_p", alias_name="n_grams"),
        _Sum("n_novel_p", alias_name="n_novel"),
    )
    return rd.from_pandas(
        typed_pandas(
            agg, {"doc_id": "int64", "n_grams": "int64", "n_novel": "int64"}
        )
    )


# --- corpus-level boilerplate-line removal (CCNet / MassiveText) -------------

#: a line is boilerplate within its source when it appears in at least
#: this many distinct documents (CCNet removes high-DF paragraphs by
#: hash, Wenzek et al. 2020 arXiv:1911.00359 §3.1; MassiveText's
#: repetition filters are the within-doc complement, already covered by
#: `repetition_stats_docs`)
BOILER_MIN_DF = 8


def _boiler_line(src: str) -> str:
    return f"subscribe to the {src} newsletter for daily updates"


def boilerplate_lines_docs(
    sf_dir: str, min_df: int = BOILER_MIN_DF
) -> "rd.Dataset":
    """Remove ALL occurrences of lines that repeat across >= `min_df`
    distinct documents of the same source — site-level nav/footer
    boilerplate that first-occurrence line dedup (`dedup_lines_docs`)
    deliberately keeps once. Fixture: every line with j % 4 == 0 is
    deterministically replaced by a per-source footer (mirrored by the
    oracle), so each source's footer has DF = docs-in-source >> min_df
    while genuine lines stay below it.

    Output: (doc_id, n_total_lines, n_removed_lines, cleaned_md5) —
    the md5 of the newline-reassembled surviving text proves the
    reassembly is byte-exact, not just the counts.

    Scale shape (the CCNet plan): pass 1 computes per-(source, line)
    document frequency with per-batch distinct + combiner partials —
    the shuffle carries (source, md5, partial_count) rows, never line
    text; the over-threshold set is assembled into ONE Arrow table
    inside a Ray task (driver holds refs only) and broadcast; pass 2
    re-derives lines per batch and filters by hash membership — no
    second shuffle, no driver loop. The boiler set is bounded by
    total_lines / min_df and in practice by distinct *repeated* lines;
    at 100 TB the same pass shards the broadcast by source if a single
    table outgrows a worker heap.
    """
    import hashlib

    import polars as pl

    import ray as _ray

    def _read(sf: str) -> "rd.Dataset":
        ds = rd.read_parquet(
            os.path.join(sf, "documents.parquet"),
            columns=["doc_id", "text", "source"],
        )

        def _f(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": batch["doc_id"],
                    "source": batch["source"],
                    "canonical": normalize_whitespace_array(batch["text"]),
                }
            )

        return ds.map_batches(_f, batch_format="pyarrow")

    def _lines_with_source(batch: pa.Table) -> "pl.DataFrame":
        src = pl.from_arrow(batch.select(["doc_id", "source"]))
        lines = _lines_frame(batch).join(src, on="doc_id", how="left")
        return lines.with_columns(
            pl.when(pl.col("j") % 4 == 0)
            .then(
                pl.lit("subscribe to the ") + pl.col("source")
                + pl.lit(" newsletter for daily updates")
            )
            .otherwise(pl.col("body"))
            .alias("line")
        ).drop("body")

    # Internal line identity is a VECTORIZED 64-bit struct hash of
    # (source, line) — polars' native hash kernel, no per-line Python.
    # The hash never leaves the engine (the oracle groups by the line
    # string itself), so the choice is free; 64 bits over the distinct
    # boilerplate-candidate lines of a shard keeps collision odds
    # negligible, and a collision at worst misflags one line.
    # DEPLOYMENT ASSUMPTION: polars does NOT guarantee .hash() stability
    # across polars versions, so the DF-counting pass and the cleaning
    # pass must run under the SAME polars build on every worker (true
    # for any homogeneous cluster image). If heterogeneous workers are
    # ever possible, switch this key to a version-stable digest of the
    # utf8 bytes (e.g. text.sha256_hex_array on source + '\x00' + line)
    # at the cost of a wider shuffle key.
    _line_key = (
        pl.struct(["source", "line"]).hash(seed=0).reinterpret(signed=True)
    )

    _PART_SCHEMA = pa.schema(
        [
            ("h", pa.int64()),
            ("df_part", pa.int64()),
        ]
    )

    def _df_partials(batch: pa.Table) -> pa.Table:
        lines = _lines_with_source(batch)
        out = (
            lines.with_columns(_line_key.alias("h"))
            .unique(["h", "doc_id"])
            .group_by("h")
            .agg(pl.len().cast(pl.Int64).alias("df_part"))
        )
        return out.select(["h", "df_part"]).to_arrow().cast(_PART_SCHEMA)

    _BOILER_SCHEMA = pa.schema([("key", pa.int64())])

    def _over_threshold(tb: pa.Table) -> pa.Table:
        out = (
            pl.from_arrow(tb)
            .group_by("h")
            .agg(pl.col("df_part").sum().alias("df"))
            .filter(pl.col("df") >= min_df)
            .select(pl.col("h").alias("key"))
        )
        return out.to_arrow().cast(_BOILER_SCHEMA)

    docs = _read(sf_dir)
    partials = docs.map_batches(_df_partials, batch_format="pyarrow")
    boiler = partitioned_group_map(partials, "h", _over_threshold, arrow=True)

    def _concat_keys(blocks) -> pa.Table:
        # schemaless zero-row blocks (aggregate tails) carry no columns
        tables = [
            t for t in _ray.get(list(blocks)) if "key" in t.column_names
        ]
        if not tables:
            return _BOILER_SCHEMA.empty_table()
        return pa.concat_tables([t.select(["key"]) for t in tables])

    build = _ray.remote(num_cpus=1)(_concat_keys)
    boiler_ref = build.remote(boiler.materialize().to_arrow_refs())

    _OUT_SCHEMA = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_total_lines", pa.int64()),
            ("n_removed_lines", pa.int64()),
            ("cleaned_md5", pa.string()),
        ]
    )

    class _Clean:
        def __init__(self, ref):
            # zero-copy: the boiler-key arrow column becomes a polars
            # Series once per actor; membership below is a vectorized
            # is_in, not a per-line Python set probe
            self.keys = pl.from_arrow(_ray.get(ref)["key"]).rename("key")

        def __call__(self, batch: pa.Table) -> pa.Table:
            lines = _lines_with_source(batch).with_columns(
                _line_key.is_in(self.keys).alias("boiler")
            )
            out = (
                lines.sort(["doc_id", "j"])
                .group_by("doc_id", maintain_order=True)
                .agg(
                    pl.len().cast(pl.Int64).alias("n_total_lines"),
                    pl.col("boiler").sum().cast(pl.Int64).alias(
                        "n_removed_lines"
                    ),
                    pl.col("line").filter(~pl.col("boiler")).str.join("\n")
                    .alias("cleaned"),
                )
            )
            # cleaned_md5 is oracle-facing (DuckDB md5), so it stays
            # md5 — but per DOC, not per line, off the hot path
            md5s = [
                hashlib.md5((s or "").encode()).hexdigest()
                for s in out["cleaned"].to_list()
            ]
            out = (
                out.with_columns(pl.Series("cleaned_md5", md5s, pl.Utf8))
                .select(
                    ["doc_id", "n_total_lines", "n_removed_lines", "cleaned_md5"]
                )
            )
            return out.to_arrow().cast(_OUT_SCHEMA)

    return docs.map_batches(
        _Clean,
        fn_constructor_kwargs={"ref": boiler_ref},
        batch_format="pyarrow",
        concurrency=(1, 8),
    )


def boilerplate_oracle_sql(min_df: int = BOILER_MIN_DF) -> str:
    """DuckDB twin of `boilerplate_lines_docs`: same synthesized lines,
    same footer injection, DF per (source, line) over distinct docs,
    md5 of the newline-joined surviving lines."""
    return f"""
        WITH w AS (
            SELECT doc_id, source,
                   list_filter(string_split_regex(text, '\\s+'),
                               x -> x != '') AS words
            FROM documents
        ),
        ln AS (
            SELECT doc_id, source, gs.j AS j,
                   array_to_string(
                       list_slice(words, gs.j * {LINE_WORDS} + 1,
                                  gs.j * {LINE_WORDS} + {LINE_WORDS}), ' ')
                       AS body
            FROM w, unnest(range(CASE WHEN len(words) = 0 THEN 1
                                      ELSE CAST(ceil(len(words) / {LINE_WORDS}.0)
                                                AS BIGINT) END)) AS gs(j)
        ),
        lines AS MATERIALIZED (
            SELECT doc_id, source, j,
                   CASE WHEN j % 4 = 0
                        THEN 'subscribe to the ' || source ||
                             ' newsletter for daily updates'
                        ELSE body END AS line
            FROM ln
        ),
        df AS (
            SELECT source, line, count(DISTINCT doc_id) AS df
            FROM lines GROUP BY source, line
        ),
        flagged AS (
            SELECT l.doc_id, l.j, l.line,
                   (df.df >= {min_df}) AS boiler
            FROM lines l JOIN df ON df.source = l.source AND df.line = l.line
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_total_lines,
               CAST(sum(CASE WHEN boiler THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_removed_lines,
               md5(COALESCE(string_agg(line, chr(10) ORDER BY j)
                                FILTER (WHERE NOT boiler), ''))
                   AS cleaned_md5
        FROM flagged
        GROUP BY doc_id
    """
