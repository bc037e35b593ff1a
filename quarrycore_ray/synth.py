"""Deterministic synthetic transcript corpora with planted duplicates.

The engine's primary input shape (BASELINE.json `input_hint`) is a
Parquet table of multi-turn transcripts:

    conv_id: string, turn_idx: int32, role: string,
    text: string, tool: string, ts: timestamp[us]

No transcript table ships with the test data, so fixtures are
synthesised deterministically (fixed seed, no external data). The
planted duplicate structure mirrors the semantic shapes asserted by the
reference dedup suite (`/root/reference/tests/test_deduplication.py`):
exact copies, whitespace/case variants, near duplicates (light edits),
partial overlaps (prefix containment), distinct documents, plus a
hot-band boilerplate group to exercise skew-aware bucket splitting.

Rows are emitted in a deterministic *shuffled* order so pipelines must
honor the sort-within-group invariant (north rule: per-turn text
equality under stable turn ordering).
"""

from __future__ import annotations

import datetime as _dt
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_VOCAB = (
    "data ray arrow batch block shuffle stream actor task cluster node worker "
    "pipeline stage operator filter map reduce group sort merge join hash key "
    "column row table schema parquet vector index query plan scan write read "
    "memory spill cache object store partition replica checkpoint resume lineage "
    "metric count window session token text language model score quality sample"
).split()

_ROLES = ["user", "assistant"]
_TOOLS = ["", "", "", "search", "python", "browser"]

_EPOCH = _dt.datetime(2026, 1, 1)


def _make_turn_text(rng: np.random.Generator, n_words: int) -> str:
    idx = rng.integers(0, len(_VOCAB), size=n_words)
    return " ".join(_VOCAB[i] for i in idx)


def _near_edit(rng: np.random.Generator, text: str, n_swaps: int = 2) -> str:
    """Swap a few words for others — a light (~few %) edit."""
    words = text.split()
    for _ in range(n_swaps):
        pos = int(rng.integers(0, len(words)))
        words[pos] = _VOCAB[int(rng.integers(0, len(_VOCAB)))]
    return " ".join(words)


def _whitespace_variant(rng: np.random.Generator, text: str) -> str:
    """Inject extra whitespace/newlines/tabs; canonical text is unchanged."""
    words = text.split()
    seps = ["  ", " \n", "\t ", " ", "   "]
    out = []
    for w in words:
        out.append(w)
        out.append(seps[int(rng.integers(0, len(seps)))])
    return "".join(out).rstrip() + "  "


def generate_transcripts(
    n_convs: int = 200,
    seed: int = 42,
    turns_lo: int = 4,
    turns_hi: int = 12,
    words_lo: int = 12,
    words_hi: int = 40,
    frac_exact: float = 0.10,
    frac_ws: float = 0.05,
    frac_near: float = 0.10,
    frac_partial: float = 0.05,
    boilerplate_group: int = 0,
) -> tuple[pa.Table, pa.Table]:
    """Return (transcripts, truth_clusters) Arrow tables.

    `n_convs` base conversations are generated; duplicate variants are
    added on top (so total conversations > n_convs). Truth clusters
    label each conversation with the min conv_id of its planted group
    and a `dup_kind` in {exact, whitespace, near, partial, unique,
    boilerplate}. `partial`, `unique` and `boilerplate` rows are
    singletons for the pairwise-recall metric (FIXTURES.md §2).
    """
    rng = np.random.default_rng(seed)
    convs: list[tuple[str, list[str]]] = []  # (conv_id, turn_texts)
    truth: list[tuple[str, str, str]] = []  # (conv_id, truth_cluster_id, dup_kind)
    serial = 0

    def new_id() -> str:
        nonlocal serial
        cid = f"conv-{serial:06d}"
        serial += 1
        return cid

    boiler = [_make_turn_text(rng, 30) for _ in range(3)] if boilerplate_group else None

    base_ids: list[str] = []
    base_turns: list[list[str]] = []
    for i in range(n_convs):
        n_turns = int(rng.integers(turns_lo, turns_hi + 1))
        turns = [_make_turn_text(rng, int(rng.integers(words_lo, words_hi + 1))) for _ in range(n_turns)]
        cid = new_id()
        base_ids.append(cid)
        base_turns.append(turns)
        convs.append((cid, turns))
        truth.append((cid, cid, "unique"))

    def pick_base() -> int:
        return int(rng.integers(0, n_convs))

    n_exact = int(n_convs * frac_exact)
    n_ws = int(n_convs * frac_ws)
    n_near = int(n_convs * frac_near)
    n_partial = int(n_convs * frac_partial)

    for _ in range(n_exact):
        j = pick_base()
        cid = new_id()
        convs.append((cid, list(base_turns[j])))
        truth.append((cid, base_ids[j], "exact"))

    for _ in range(n_ws):
        j = pick_base()
        cid = new_id()
        convs.append((cid, [_whitespace_variant(rng, t) for t in base_turns[j]]))
        truth.append((cid, base_ids[j], "whitespace"))

    for _ in range(n_near):
        # lightly edit one turn of a longer conversation: a single word
        # swap in a >=6-turn conv keeps char-shingle Jaccard ~0.97, above
        # the LSH plan's reliable-recall zone (the reference band plan
        # catches s>=0.95 pairs with P > 0.999, but only ~80% at s=0.90 —
        # planting borderline pairs would make *any* faithful engine
        # fail the truth-recall gate).
        j = pick_base()
        tries = 0
        while len(base_turns[j]) < 6 and tries < 20:
            j = pick_base()
            tries += 1
        cid = new_id()
        turns = list(base_turns[j])
        pos = int(rng.integers(0, len(turns)))
        turns[pos] = _near_edit(rng, turns[pos], n_swaps=1)
        convs.append((cid, turns))
        truth.append((cid, base_ids[j], "near"))

    for _ in range(n_partial):
        j = pick_base()
        cid = new_id()
        extra = [
            _make_turn_text(rng, int(rng.integers(words_lo, words_hi + 1)))
            for _ in range(max(2, len(base_turns[j])))
        ]
        convs.append((cid, list(base_turns[j]) + extra))
        # partials are NOT expected in the LSH cluster => singleton truth
        truth.append((cid, cid, "partial"))

    for _ in range(boilerplate_group):
        cid = new_id()
        body = [_make_turn_text(rng, int(rng.integers(words_lo, words_hi + 1))) for _ in range(4)]
        convs.append((cid, list(boiler) + body))  # type: ignore[arg-type]
        truth.append((cid, cid, "boilerplate"))

    # --- flatten to rows, deterministically shuffled within the table ---
    conv_ids: list[str] = []
    turn_idxs: list[int] = []
    roles: list[str] = []
    texts: list[str] = []
    tools: list[str] = []
    tss: list[_dt.datetime] = []
    for ci, (cid, turns) in enumerate(convs):
        base_ts = _EPOCH + _dt.timedelta(minutes=ci)
        for ti, t in enumerate(turns):
            conv_ids.append(cid)
            turn_idxs.append(ti)
            roles.append(_ROLES[ti % 2])
            texts.append(t)
            tools.append(_TOOLS[(ci + ti) % len(_TOOLS)])
            tss.append(base_ts + _dt.timedelta(seconds=ti))

    order = np.random.default_rng(seed + 1).permutation(len(conv_ids))
    transcripts = pa.table(
        {
            "conv_id": pa.array([conv_ids[i] for i in order], pa.string()),
            "turn_idx": pa.array([turn_idxs[i] for i in order], pa.int32()),
            "role": pa.array([roles[i] for i in order], pa.string()),
            "text": pa.array([texts[i] for i in order], pa.string()),
            "tool": pa.array([tools[i] for i in order], pa.string()),
            "ts": pa.array([tss[i] for i in order], pa.timestamp("us")),
        }
    )
    truth_tbl = pa.table(
        {
            "conv_id": pa.array([t[0] for t in truth], pa.string()),
            "truth_cluster_id": pa.array([t[1] for t in truth], pa.string()),
            "dup_kind": pa.array([t[2] for t in truth], pa.string()),
        }
    )
    return transcripts, truth_tbl


def write_corpus(
    out_dir: str,
    n_convs: int,
    seed: int = 42,
    num_shards: int = 8,
    **kwargs,
) -> str:
    """Materialize a corpus as sharded Parquet; idempotent (keyed dir).

    Returns the directory containing ``transcripts/part-*.parquet`` and
    ``truth_clusters.parquet``. Sharded so Ray gets enough input blocks
    to parallelize the read.
    """
    tag = f"n{n_convs}_s{seed}"
    root = os.path.join(out_dir, tag)
    done = os.path.join(root, "_SUCCESS")
    if os.path.exists(done):
        return root
    transcripts, truth = generate_transcripts(n_convs, seed, **kwargs)
    tdir = os.path.join(root, "transcripts")
    os.makedirs(tdir, exist_ok=True)
    n = transcripts.num_rows
    per = (n + num_shards - 1) // num_shards
    for s in range(num_shards):
        chunk = transcripts.slice(s * per, per)
        if chunk.num_rows:
            pq.write_table(chunk, os.path.join(tdir, f"part-{s:05d}.parquet"))
    pq.write_table(truth, os.path.join(root, "truth_clusters.parquet"))
    with open(done, "w") as f:
        f.write("ok")
    return root


def transcripts_from_documents(sf_dir: str, seed: int = 7) -> pa.Table:
    """Deterministically expand the test `documents` table into transcripts.

    Each document becomes one conversation (turns = ~12-word chunks of
    its text, roles alternating). Deterministic duplicate conversations
    are planted on top as a function of `doc_id` only:

    - ``doc_id % 10 == 0`` -> an exact copy (conv id suffix ``-dup``),
    - ``doc_id % 10 == 5`` -> a whitespace variant (suffix ``-ws``).

    This gives driver smoke checks a transcript-shaped corpus derived
    purely from the shipped test data.
    """
    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    conv_ids: list[str] = []
    turn_idxs: list[int] = []
    roles: list[str] = []
    texts: list[str] = []
    tools: list[str] = []
    tss: list[_dt.datetime] = []

    def emit(cid: str, words: list[str], ci: int, did: int, ws: bool = False) -> None:
        base_ts = _EPOCH + _dt.timedelta(minutes=ci)
        chunks = [words[i : i + 12] for i in range(0, len(words), 12)] or [[""]]
        for ti, chunk in enumerate(chunks):
            sep = "  " if ws else " "
            conv_ids.append(cid)
            turn_idxs.append(ti)
            roles.append(_ROLES[ti % 2])
            texts.append(sep.join(chunk) + ("\n" if ws else ""))
            # deterministic agent tool calls on assistant turns (text and
            # therefore dedup semantics are untouched): (doc_id + ti) % 4
            # == 1 -> 'search', == 3 -> 'code', else no tool
            if ti % 2 == 1 and (did + ti) % 4 == 1:
                tools.append("search")
            elif ti % 2 == 1 and (did + ti) % 4 == 3:
                tools.append("code")
            else:
                tools.append("")
            tss.append(base_ts + _dt.timedelta(seconds=ti))

    ids = docs.column("doc_id").to_pylist()
    txts = docs.column("text").to_pylist()
    ci = 0
    for doc_id, text in zip(ids, txts):
        words = (text or "").split()
        cid = f"doc-{doc_id:08d}"
        emit(cid, words, ci, doc_id)
        ci += 1
        if doc_id % 10 == 0:
            emit(f"{cid}-dup", words, ci, doc_id)
            ci += 1
        elif doc_id % 10 == 5:
            emit(f"{cid}-ws", words, ci, doc_id, ws=True)
            ci += 1

    return pa.table(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "turn_idx": pa.array(turn_idxs, pa.int32()),
            "role": pa.array(roles, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array(tools, pa.string()),
            "ts": pa.array(tss, pa.timestamp("us")),
        }
    )
