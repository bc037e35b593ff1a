"""Transcript-shaped operators beyond dedup.

Chat-training pipelines run conversation-level maintenance passes the
document operators can't express: trimming each conversation to the
model's context budget (keep the most recent whole turns), validating
role structure, and reassembling after turn-level gates. The reference
works at document granularity (`dataset/constructor.py` chunks flat
text); these operators extend the same surface to the (conv_id,
turn_idx, role, text) transcript table the north rule targets.

At 100 TB the input is a real transcripts table; the driver queries
feed the deterministic `synth.transcripts_from_documents` expansion so
every result is exactly recomputable in DuckDB from the shipped
`documents` table (turns = 12-word chunks, roles alternate, planted
`-dup`/`-ws` variants).

Scale shape: everything here is ONE hash partition by `conv_id`
followed by a vectorized polars pass per partition
(`partitioned_group_map`) — the same discipline as
`stages/grouped.py`; no per-conversation Python dispatch and nothing
driver-side.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd

from ..config import fixed_probe_pool
from ..stages.grouped import partitioned_group_map

#: default context budget (words) for `truncate_conversations`
TRUNCATE_BUDGET = 20

_TRUNC_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("n_turns", pa.int64()),
        ("kept_turns", pa.int64()),
        ("kept_words", pa.int64()),
        ("first_kept_idx", pa.int64()),
    ]
)


def truncate_conversations(
    ds: "rd.Dataset", budget: int = TRUNCATE_BUDGET
) -> "rd.Dataset":
    """Context-window trim: keep each conversation's maximal suffix of
    whole turns whose total word count fits `budget`; the final turn is
    always kept even when it alone exceeds the budget (a chat fine-tune
    can't drop the most recent exchange).

    Words are `\\S+` runs, so the planted `-ws` whitespace variants
    count identically to their base conversations. The suffix rule is a
    reverse cumulative sum per conversation — monotone, so the kept set
    is always contiguous-from-the-end and `first_kept_idx` fully
    determines the applied truncation.

    Output (conv_id, n_turns, kept_turns, kept_words, first_kept_idx),
    all counters int64 — exact against the unrolled SQL twin.
    """

    def _part(tb: pa.Table) -> pa.Table:
        import polars as pl

        out = (
            pl.from_arrow(tb)
            .with_columns(
                pl.col("text")
                .str.count_matches(r"\S+")
                .cast(pl.Int64)
                .alias("wc"),
                pl.col("turn_idx").cast(pl.Int64),
            )
            .sort(["conv_id", "turn_idx"], descending=[False, True])
            .with_columns(pl.col("wc").cum_sum().over("conv_id").alias("rev"))
            .with_columns(
                (
                    (pl.col("rev") <= budget)
                    | (
                        pl.col("turn_idx")
                        == pl.col("turn_idx").max().over("conv_id")
                    )
                ).alias("keep")
            )
            .group_by("conv_id")
            .agg(
                pl.len().cast(pl.Int64).alias("n_turns"),
                pl.col("keep").cast(pl.Int64).sum().alias("kept_turns"),
                (pl.col("wc") * pl.col("keep").cast(pl.Int64))
                .sum()
                .alias("kept_words"),
                pl.col("turn_idx").filter(pl.col("keep")).min().alias(
                    "first_kept_idx"
                ),
            )
        )
        return out.to_arrow().cast(_TRUNC_SCHEMA)

    return partitioned_group_map(
        ds.select_columns(["conv_id", "turn_idx", "text"]),
        "conv_id",
        _part,
        arrow=True,
    )


def apply_truncation(ds: "rd.Dataset", budget: int = TRUNCATE_BUDGET) -> "rd.Dataset":
    """The row-level twin of `truncate_conversations`: return the kept
    turn rows themselves (same keep rule), for pipelines that feed the
    trimmed transcripts onward. Stats + `first_kept_idx` from
    `truncate_conversations` fully determine this output, so the SQL
    oracle on the stats table covers it."""

    def _part(tb: pa.Table) -> pa.Table:
        import polars as pl

        out = (
            pl.from_arrow(tb)
            .with_columns(
                pl.col("text").str.count_matches(r"\S+").cast(pl.Int64).alias("wc")
            )
            .sort(["conv_id", "turn_idx"], descending=[False, True])
            .with_columns(pl.col("wc").cum_sum().over("conv_id").alias("rev"))
            .filter(
                (pl.col("rev") <= budget)
                | (pl.col("turn_idx") == pl.col("turn_idx").max().over("conv_id"))
            )
            .drop(["wc", "rev"])
            .sort(["conv_id", "turn_idx"])
        )
        return out.to_arrow().cast(tb.schema)

    return partitioned_group_map(ds, "conv_id", _part, arrow=True)


def truncate_oracle_sql(budget: int = TRUNCATE_BUDGET) -> str:
    """DuckDB twin of `truncate_conversations` over the deterministic
    transcript synth: rebuilds per-turn word counts (12-word chunks,
    last turn gets the remainder; a 0-word doc is one empty turn) and
    replays the reverse-cumsum keep rule with a window sum."""
    return f"""
        WITH w AS (
            SELECT doc_id,
                   len(list_filter(string_split_regex(text, '\\s+'),
                                   x -> x != '')) AS nw
            FROM documents
        ),
        t AS (
            SELECT doc_id, nw,
                   'doc-' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS conv_id,
                   CASE WHEN nw = 0 THEN 1
                        ELSE CAST(ceil(nw / 12.0) AS BIGINT) END AS n_turns
            FROM w
        ),
        all_convs AS (
            SELECT conv_id, n_turns, nw FROM t
            UNION ALL
            SELECT conv_id || '-dup', n_turns, nw FROM t WHERE doc_id % 10 = 0
            UNION ALL
            SELECT conv_id || '-ws', n_turns, nw FROM t WHERE doc_id % 10 = 5
        ),
        turns AS (
            SELECT conv_id, n_turns, gs.ti AS ti,
                   CASE WHEN nw = 0 THEN 0
                        WHEN gs.ti < n_turns - 1 THEN 12
                        ELSE nw - 12 * (n_turns - 1) END AS wc
            FROM all_convs, unnest(range(all_convs.n_turns)) AS gs(ti)
        ),
        r AS (
            SELECT conv_id, n_turns, ti, wc,
                   SUM(wc) OVER (PARTITION BY conv_id ORDER BY ti DESC
                                 ROWS UNBOUNDED PRECEDING) AS rev
            FROM turns
        ),
        k AS (
            SELECT conv_id, n_turns, ti, wc,
                   (rev <= {budget} OR ti = n_turns - 1) AS keep
            FROM r
        )
        SELECT conv_id,
               CAST(n_turns AS BIGINT) AS n_turns,
               CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
                   AS kept_turns,
               CAST(SUM(CASE WHEN keep THEN wc ELSE 0 END) AS BIGINT)
                   AS kept_words,
               CAST(MIN(CASE WHEN keep THEN ti END) AS BIGINT)
                   AS first_kept_idx
        FROM k
        GROUP BY conv_id, n_turns
    """


#: sliding-window defaults for `conversation_windows`
WINDOW_TURNS, WINDOW_STRIDE = 4, 2

_WIN_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("window_idx", pa.int64()),
        ("start_turn", pa.int64()),
        ("end_turn", pa.int64()),
        ("n_words", pa.int64()),
    ]
)


def conversation_windows(
    ds: "rd.Dataset", k: int = WINDOW_TURNS, stride: int = WINDOW_STRIDE
) -> "rd.Dataset":
    """Sliding training windows over conversations: window i of a
    conversation covers turns [i*stride, i*stride + k); a conversation
    shorter than `k` turns yields ONE window covering all of it. The
    overlapping-context construction chat corpora use to turn long
    conversations into fixed-shape training examples (stride < k gives
    each reply a window where it has preceding context).

    Output (conv_id, window_idx, start_turn, end_turn, n_words) with
    end_turn inclusive. Whole partitions vectorize in numpy: window
    counts by arithmetic, word sums by one global cumulative-sum
    difference — no per-conversation Python in the hot path.
    """

    def _part(tb: pa.Table) -> pa.Table:
        import numpy as np
        import polars as pl

        if tb.num_rows == 0:
            return _WIN_SCHEMA.empty_table()
        df = (
            pl.from_arrow(tb)
            .with_columns(
                pl.col("text").str.count_matches(r"\S+").cast(pl.Int64).alias("wc")
            )
            .sort(["conv_id", "turn_idx"])
        )
        ids = df["conv_id"].to_numpy()
        tv = df["turn_idx"].to_numpy().astype(np.int64)
        wc = df["wc"].to_numpy()
        total = len(ids)
        starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
        lens = np.diff(np.r_[starts, total])
        wcum = np.cumsum(wc)
        w_count = np.where(lens <= k, 1, (lens - k) // stride + 1).astype(np.int64)
        conv_rep = np.repeat(np.arange(len(starts)), w_count)
        base = np.cumsum(w_count) - w_count
        widx = np.arange(int(w_count.sum()), dtype=np.int64) - base[conv_rep]
        s = widx * stride
        e = np.minimum(s + k, lens[conv_rep])
        off = starts[conv_rep]
        gs, ge = off + s, off + e
        nw = wcum[ge - 1] - np.where(gs > 0, wcum[gs - 1], 0)
        return pa.table(
            {
                "conv_id": pa.array(ids[off]),
                "window_idx": pa.array(widx, pa.int64()),
                "start_turn": pa.array(tv[gs], pa.int64()),
                "end_turn": pa.array(tv[ge - 1], pa.int64()),
                "n_words": pa.array(nw, pa.int64()),
            }
        ).cast(_WIN_SCHEMA)

    return partitioned_group_map(
        ds.select_columns(["conv_id", "turn_idx", "text"]),
        "conv_id",
        _part,
        arrow=True,
    )


def windows_oracle_sql(k: int = WINDOW_TURNS, stride: int = WINDOW_STRIDE) -> str:
    """DuckDB twin of `conversation_windows` over the transcript synth.

    The synth's turn structure (every turn 12 words except the last,
    which carries `nw - 12*(n_turns-1)`; a 0-word doc is one empty
    turn) makes each window's word sum closed-form — no per-turn
    table: n_words = 12 * (non-last turns in window) + (remainder if
    the last turn is inside)."""
    return f"""
        WITH w AS (
            SELECT doc_id,
                   len(list_filter(string_split_regex(text, '\\s+'),
                                   x -> x != '')) AS nw
            FROM documents
        ),
        t AS (
            SELECT doc_id, nw,
                   'doc-' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS conv_id,
                   CASE WHEN nw = 0 THEN 1
                        ELSE CAST(ceil(nw / 12.0) AS BIGINT) END AS n_turns
            FROM w
        ),
        all_convs AS (
            SELECT conv_id, n_turns, nw FROM t
            UNION ALL
            SELECT conv_id || '-dup', n_turns, nw FROM t WHERE doc_id % 10 = 0
            UNION ALL
            SELECT conv_id || '-ws', n_turns, nw FROM t WHERE doc_id % 10 = 5
        ),
        cw AS (
            SELECT conv_id, n_turns,
                   CASE WHEN nw = 0 THEN 0
                        ELSE nw - 12 * (n_turns - 1) END AS rem,
                   CASE WHEN n_turns <= {k} THEN 1
                        ELSE (n_turns - {k}) // {stride} + 1 END AS wcnt
            FROM all_convs
        ),
        win AS (
            SELECT conv_id, n_turns, rem, gs.wi AS window_idx,
                   gs.wi * {stride} AS s,
                   least(gs.wi * {stride} + {k}, n_turns) AS e
            FROM cw, unnest(range(cw.wcnt)) AS gs(wi)
        )
        SELECT conv_id,
               CAST(window_idx AS BIGINT) AS window_idx,
               CAST(s AS BIGINT) AS start_turn,
               CAST(e - 1 AS BIGINT) AS end_turn,
               CAST(12 * (least(e, n_turns - 1) - s)
                    + CASE WHEN e = n_turns THEN rem ELSE 0 END
                    AS BIGINT) AS n_words
        FROM win
    """


_Q_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("n_turns", pa.int64()),
        ("n_question_turns", pa.int64()),
        ("n_user_question_turns", pa.int64()),
    ]
)


def questions_per_conversation(ds: "rd.Dataset") -> "rd.Dataset":
    """Turn-CONTENT analytics: per conversation, how many turns (and
    how many user turns) contain a question mark — the engagement /
    intent signal a chat-data curator uses to pick instruction-rich
    conversations. Unlike the count-shaped transcript stats, this reads
    the turn text itself; the SQL twin reconstructs each turn's word
    slice from the document text, proving turn-level content operators
    are exactly oracle-able too.

    One stateless vectorized pass (polars `contains`) + one hash
    partition on conv_id. Output (conv_id, n_turns, n_question_turns,
    n_user_question_turns).
    """

    def _part(tb: pa.Table) -> pa.Table:
        import polars as pl

        out = (
            pl.from_arrow(tb)
            .with_columns(
                pl.col("text")
                .fill_null("")
                .str.contains("?", literal=True)
                .cast(pl.Int64)
                .alias("q"),
                (pl.col("role") == "user").cast(pl.Int64).alias("u"),
            )
            .group_by("conv_id")
            .agg(
                pl.len().cast(pl.Int64).alias("n_turns"),
                pl.col("q").sum().alias("n_question_turns"),
                (pl.col("q") * pl.col("u")).sum().alias(
                    "n_user_question_turns"
                ),
            )
        )
        return out.to_arrow().cast(_Q_SCHEMA)

    return partitioned_group_map(
        ds.select_columns(["conv_id", "role", "text"]),
        "conv_id",
        _part,
        arrow=True,
    )


def questions_oracle_sql() -> str:
    """DuckDB twin of `questions_per_conversation`: rebuilds every
    turn's 12-word slice from the document text (the synth's exact
    chunking) and replays the contains('?') test per slice; roles
    alternate user/assistant so user turns are the even indices."""
    return """
        WITH w AS (
            SELECT doc_id,
                   list_filter(string_split_regex(text, '\\s+'),
                               x -> x != '') AS words
            FROM documents
        ),
        t AS (
            SELECT doc_id, words,
                   'doc-' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS conv_id,
                   CASE WHEN len(words) = 0 THEN 1
                        ELSE CAST(ceil(len(words) / 12.0) AS BIGINT)
                   END AS n_turns
            FROM w
        ),
        all_convs AS (
            SELECT conv_id, words, n_turns FROM t
            UNION ALL
            SELECT conv_id || '-dup', words, n_turns FROM t
            WHERE doc_id % 10 = 0
            UNION ALL
            SELECT conv_id || '-ws', words, n_turns FROM t
            WHERE doc_id % 10 = 5
        ),
        turns AS (
            SELECT conv_id, n_turns, gs.ti AS ti,
                   CAST(len(list_filter(
                       list_slice(words, gs.ti * 12 + 1, gs.ti * 12 + 12),
                       x -> contains(x, '?'))) > 0 AS BIGINT) AS q
            FROM all_convs, unnest(range(all_convs.n_turns)) AS gs(ti)
        )
        SELECT conv_id,
               CAST(MAX(n_turns) AS BIGINT) AS n_turns,
               CAST(SUM(q) AS BIGINT) AS n_question_turns,
               CAST(SUM(CASE WHEN ti % 2 = 0 THEN q ELSE 0 END) AS BIGINT)
                   AS n_user_question_turns
        FROM turns
        GROUP BY conv_id
    """


_VERB_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("user_words", pa.int64()),
        ("assistant_words", pa.int64()),
        ("n_turns", pa.int64()),
    ]
)


def role_verbosity(ds: "rd.Dataset") -> "rd.Dataset":
    """Per-conversation verbosity split: total words spoken by each
    role — the assistant/user balance signal used to filter
    monologue-heavy or echo-style conversations from chat training
    data. Division-free: the ratio's exact numerator/denominator pair
    is returned, not a float.

    One vectorized pass + one conv_id hash partition.
    Output (conv_id, user_words, assistant_words, n_turns)."""

    def _part(tb: pa.Table) -> pa.Table:
        import polars as pl

        out = (
            pl.from_arrow(tb)
            .with_columns(
                pl.col("text")
                .fill_null("")
                .str.count_matches(r"\S+")
                .cast(pl.Int64)
                .alias("wc"),
                (pl.col("role") == "user").cast(pl.Int64).alias("u"),
            )
            .group_by("conv_id")
            .agg(
                (pl.col("wc") * pl.col("u")).sum().alias("user_words"),
                (pl.col("wc") * (1 - pl.col("u"))).sum().alias(
                    "assistant_words"
                ),
                pl.len().cast(pl.Int64).alias("n_turns"),
            )
        )
        return out.to_arrow().cast(_VERB_SCHEMA)

    return partitioned_group_map(
        ds.select_columns(["conv_id", "role", "text"]),
        "conv_id",
        _part,
        arrow=True,
    )


def verbosity_oracle_sql() -> str:
    """DuckDB twin of `role_verbosity`: user turns are the even chunk
    indices; every turn has 12 words except the last (remainder)."""
    return """
        WITH w AS (
            SELECT doc_id,
                   len(list_filter(string_split_regex(text, '\\s+'),
                                   x -> x != '')) AS nw
            FROM documents
        ),
        t AS (
            SELECT doc_id, nw,
                   'doc-' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS conv_id,
                   CASE WHEN nw = 0 THEN 1
                        ELSE CAST(ceil(nw / 12.0) AS BIGINT) END AS n_turns
            FROM w
        ),
        all_convs AS (
            SELECT conv_id, n_turns, nw FROM t
            UNION ALL
            SELECT conv_id || '-dup', n_turns, nw FROM t WHERE doc_id % 10 = 0
            UNION ALL
            SELECT conv_id || '-ws', n_turns, nw FROM t WHERE doc_id % 10 = 5
        ),
        turns AS (
            SELECT conv_id, n_turns, gs.ti AS ti,
                   CASE WHEN nw = 0 THEN 0
                        WHEN gs.ti < n_turns - 1 THEN 12
                        ELSE nw - 12 * (n_turns - 1) END AS wc
            FROM all_convs, unnest(range(all_convs.n_turns)) AS gs(ti)
        )
        SELECT conv_id,
               CAST(SUM(CASE WHEN ti % 2 = 0 THEN wc ELSE 0 END) AS BIGINT)
                   AS user_words,
               CAST(SUM(CASE WHEN ti % 2 = 1 THEN wc ELSE 0 END) AS BIGINT)
                   AS assistant_words,
               CAST(MAX(n_turns) AS BIGINT) AS n_turns
        FROM turns
        GROUP BY conv_id
    """


_CORR_SCHEMA = pa.schema(
    [
        ("n_pairs", pa.int64()),
        ("sx", pa.int64()),
        ("sy", pa.int64()),
        ("sxy", pa.int64()),
        ("sxx", pa.int64()),
        ("syy", pa.int64()),
    ]
)


def reply_length_moments(ds: "rd.Dataset") -> "pd.DataFrame":
    """Adjacent-turn interaction: exact Pearson moments between each
    user turn's word count (x) and the IMMEDIATELY following assistant
    reply's word count (y) — do longer questions get longer answers?
    Division-free (`link_assortativity_docs` discipline): one row of
    integer sums (n, Sx, Sy, Sxy, Sxx, Syy); the correlation is
    (n*Sxy - Sx*Sy) / sqrt((n*Sxx - Sx^2)(n*Syy - Sy^2)) for consumers.

    Pairing is conversation-local (turn t even, reply t+1), so ONE
    conv_id hash partition forms all pairs; the moment fold is an exact
    int64 sum over partitions.
    """
    import pandas as pd

    def _part(tb: pa.Table) -> pa.Table:
        import polars as pl

        df = (
            pl.from_arrow(tb)
            .with_columns(
                pl.col("text")
                .fill_null("")
                .str.count_matches(r"\S+")
                .cast(pl.Int64)
                .alias("wc")
            )
            .sort(["conv_id", "turn_idx"])
            .with_columns(
                pl.col("wc").shift(-1).over("conv_id").alias("y"),
                pl.col("turn_idx").cast(pl.Int64),
            )
            .filter((pl.col("turn_idx") % 2 == 0) & pl.col("y").is_not_null())
        )
        x = df["wc"]
        y = df["y"]
        out = pl.DataFrame(
            {
                "n_pairs": [df.height],
                "sx": [int(x.sum() or 0)],
                "sy": [int(y.sum() or 0)],
                "sxy": [int((x * y).sum() or 0)],
                "sxx": [int((x * x).sum() or 0)],
                "syy": [int((y * y).sum() or 0)],
            }
        )
        return out.to_arrow().cast(_CORR_SCHEMA)

    parts = partitioned_group_map(
        ds.select_columns(["conv_id", "turn_idx", "text"]),
        "conv_id",
        _part,
        arrow=True,
    ).to_pandas()
    if parts.empty:
        return _CORR_SCHEMA.empty_table().to_pandas()
    return pd.DataFrame(
        {c: pd.array([int(parts[c].sum())], dtype="int64") for c in parts.columns}
    )


def reply_moments_oracle_sql() -> str:
    """DuckDB twin of `reply_length_moments`: pairs (even turn t,
    t+1) with closed-form word counts from the 12-word chunking."""
    return """
        WITH w AS (
            SELECT doc_id,
                   len(list_filter(string_split_regex(text, '\\s+'),
                                   x -> x != '')) AS nw
            FROM documents
        ),
        t AS (
            SELECT doc_id, nw,
                   CASE WHEN nw = 0 THEN 1
                        ELSE CAST(ceil(nw / 12.0) AS BIGINT) END AS n_turns
            FROM w
        ),
        all_convs AS (
            SELECT doc_id * 3 AS cid, n_turns, nw FROM t
            UNION ALL
            SELECT doc_id * 3 + 1, n_turns, nw FROM t WHERE doc_id % 10 = 0
            UNION ALL
            SELECT doc_id * 3 + 2, n_turns, nw FROM t WHERE doc_id % 10 = 5
        ),
        pairs AS (
            SELECT CASE WHEN gs.ti < n_turns - 1 THEN 12
                        WHEN nw = 0 THEN 0
                        ELSE nw - 12 * (n_turns - 1) END AS x,
                   CASE WHEN gs.ti + 1 < n_turns - 1 THEN 12
                        ELSE nw - 12 * (n_turns - 1) END AS y
            FROM all_convs, unnest(range(all_convs.n_turns)) AS gs(ti)
            WHERE gs.ti % 2 = 0 AND gs.ti + 1 < n_turns
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(COALESCE(SUM(x), 0) AS BIGINT) AS sx,
               CAST(COALESCE(SUM(y), 0) AS BIGINT) AS sy,
               CAST(COALESCE(SUM(x * y), 0) AS BIGINT) AS sxy,
               CAST(COALESCE(SUM(x * x), 0) AS BIGINT) AS sxx,
               CAST(COALESCE(SUM(y * y), 0) AS BIGINT) AS syy
        FROM pairs
    """


#: adjacent-turn token-set Jaccard threshold for stutter detection as
#: an EXACT rational (4/5): engine and oracle compare the same integers
#: (5*inter >= 4*union), so no float boundary exists.
STUTTER_T_NUM = 4
STUTTER_T_DEN = 5

_STUTTER_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("n_pairs", pa.int64()),
        ("n_stutter", pa.int64()),
    ]
)


def turn_stutter_stats(ds: "rd.Dataset") -> "rd.Dataset":
    """Agent-loop (stutter) detection: per conversation, count adjacent
    turn pairs whose token SETS have Jaccard >= 4/5 — the signature of
    an agent repeating itself or a user re-pasting the same prompt,
    one of the highest-yield row-level gates when curating agent
    transcripts for training (near-identical consecutive turns add no
    signal and over-weight the repeated text).

    Tokens are `\\S+` runs (whitespace-variant turns compare equal);
    the predicate is all-integer (``5*inter >= 4*union``), and a pair
    of two EMPTY turns does not count (union 0). One vectorized polars
    pass per conv_id hash partition: token sets via `extract_all` +
    `list.unique`, the previous turn via `shift(1).over(conv_id)`, the
    intersection via `list.set_intersection` — no per-turn Python.

    Output (conv_id, n_pairs, n_stutter), n_pairs = n_turns - 1.
    """

    def _part(tb: pa.Table) -> pa.Table:
        import polars as pl

        d = (
            pl.from_arrow(tb)
            .with_columns(
                pl.col("text")
                .fill_null("")
                .str.extract_all(r"\S+")
                .list.unique()
                .alias("tok")
            )
            .sort(["conv_id", "turn_idx"])
            .with_columns(pl.col("tok").shift(1).over("conv_id").alias("prev"))
            .with_columns(
                pl.col("tok")
                .list.set_intersection(pl.col("prev"))
                .list.len()
                .cast(pl.Int64)
                .alias("inter"),
                (
                    pl.col("tok").list.len() + pl.col("prev").list.len()
                ).cast(pl.Int64).alias("nsum"),
            )
            .with_columns((pl.col("nsum") - pl.col("inter")).alias("union"))
            .with_columns(
                (
                    pl.col("prev").is_not_null()
                    & (pl.col("union") > 0)
                    & (
                        STUTTER_T_DEN * pl.col("inter")
                        >= STUTTER_T_NUM * pl.col("union")
                    )
                )
                .cast(pl.Int64)
                .alias("st"),
                pl.col("prev").is_not_null().cast(pl.Int64).alias("pr"),
            )
            .group_by("conv_id")
            .agg(
                pl.col("pr").sum().alias("n_pairs"),
                pl.col("st").sum().alias("n_stutter"),
            )
        )
        return d.to_arrow().cast(_STUTTER_SCHEMA)

    return partitioned_group_map(
        ds.select_columns(["conv_id", "turn_idx", "text"]),
        "conv_id",
        _part,
        arrow=True,
    )


def stutter_oracle_sql() -> str:
    """DuckDB twin of `turn_stutter_stats`: rebuilds each turn's 12-word
    slice, takes `list_distinct` token sets, and replays the integer
    Jaccard predicate on consecutive slices."""
    return f"""
        WITH w AS (
            SELECT doc_id,
                   list_filter(string_split_regex(text, '\\s+'),
                               x -> x != '') AS words
            FROM documents
        ),
        t AS (
            SELECT doc_id, words,
                   'doc-' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS conv_id,
                   CASE WHEN len(words) = 0 THEN 1
                        ELSE CAST(ceil(len(words) / 12.0) AS BIGINT)
                   END AS n_turns
            FROM w
        ),
        all_convs AS (
            SELECT conv_id, words, n_turns FROM t
            UNION ALL
            SELECT conv_id || '-dup', words, n_turns FROM t
            WHERE doc_id % 10 = 0
            UNION ALL
            SELECT conv_id || '-ws', words, n_turns FROM t
            WHERE doc_id % 10 = 5
        ),
        pairs AS (
            SELECT conv_id, n_turns,
                   list_distinct(list_slice(words, gs.ti * 12 + 1,
                                            gs.ti * 12 + 12)) AS a,
                   list_distinct(list_slice(words, gs.ti * 12 + 13,
                                            gs.ti * 12 + 24)) AS b
            FROM all_convs, unnest(range(all_convs.n_turns)) AS gs(ti)
            WHERE gs.ti + 1 < n_turns
        ),
        j AS (
            SELECT conv_id, n_turns,
                   len(list_intersect(a, b)) AS i,
                   len(a) + len(b) - len(list_intersect(a, b)) AS u
            FROM pairs
        )
        SELECT ac.conv_id,
               CAST(ac.n_turns - 1 AS BIGINT) AS n_pairs,
               CAST(COALESCE(SUM(CASE WHEN j.u > 0
                          AND {STUTTER_T_DEN} * j.i >= {STUTTER_T_NUM} * j.u
                          THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_stutter
        FROM all_convs ac LEFT JOIN j USING (conv_id)
        GROUP BY ac.conv_id, ac.n_turns
    """


_CHAIN_SCHEMA = pa.schema([("chain", pa.string()), ("n_convs", pa.int64())])


def tool_chain_stats(ds: "rd.Dataset") -> "rd.Dataset":
    """Tool-call chain mining: each conversation's ORDERED sequence of
    non-empty tool invocations joined with '>' (e.g. ``search>code``,
    '' for tool-free conversations), rolled up to (chain, n_convs) —
    the workflow-pattern inventory an agent-data curator uses to
    balance tool-use behaviors in a training mix.

    Two stages, both shuffles keyed small: the per-conversation chain
    needs one conv_id hash partition (order matters within the chain);
    the rollup is a per-batch combiner count + one groupby(chain)
    aggregate over the already-tiny (chain, partial) table.
    """

    def _chains(tb: pa.Table) -> pa.Table:
        import polars as pl

        out = (
            pl.from_arrow(tb)
            .sort(["conv_id", "turn_idx"])
            .group_by("conv_id", maintain_order=True)
            .agg(
                pl.col("tool")
                .filter(pl.col("tool").fill_null("") != "")
                .str.join(">")
                .alias("chain")
            )
            # per-partition combiner: count convs per chain before the
            # global aggregate ever sees a row
            .group_by("chain")
            .len()
            .with_columns(pl.col("len").cast(pl.Int64).alias("_cnt"))
            .select(["chain", "_cnt"])
        )
        return out.to_arrow().cast(
            pa.schema([("chain", pa.string()), ("_cnt", pa.int64())])
        )

    from ray.data.aggregate import Sum

    return (
        partitioned_group_map(
            ds.select_columns(["conv_id", "turn_idx", "tool"]),
            "conv_id",
            _chains,
            arrow=True,
        )
        .groupby("chain")
        .aggregate(Sum("_cnt", alias_name="n_convs"))
    )


def tool_chain_oracle_sql() -> str:
    """DuckDB twin of `tool_chain_stats`: replays the synth tool rule
    (assistant turns, (doc_id + ti) % 4 == 1 -> search, == 3 -> code)
    and aggregates ordered chains."""
    return """
        WITH w AS (
            SELECT doc_id,
                   len(list_filter(string_split_regex(text, '\\s+'),
                                   x -> x != '')) AS nw
            FROM documents
        ),
        t AS (
            SELECT doc_id,
                   'doc-' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS conv_id,
                   CASE WHEN nw = 0 THEN 1
                        ELSE CAST(ceil(nw / 12.0) AS BIGINT) END AS n_turns
            FROM w
        ),
        all_convs AS (
            SELECT doc_id, conv_id, n_turns FROM t
            UNION ALL
            SELECT doc_id, conv_id || '-dup', n_turns FROM t
            WHERE doc_id % 10 = 0
            UNION ALL
            SELECT doc_id, conv_id || '-ws', n_turns FROM t
            WHERE doc_id % 10 = 5
        ),
        calls AS (
            SELECT conv_id, gs.ti AS ti,
                   CASE WHEN (doc_id + gs.ti) % 4 = 1 THEN 'search'
                        WHEN (doc_id + gs.ti) % 4 = 3 THEN 'code'
                   END AS tool
            FROM all_convs, unnest(range(all_convs.n_turns)) AS gs(ti)
            WHERE gs.ti % 2 = 1 AND (doc_id + gs.ti) % 4 IN (1, 3)
        ),
        chains AS (
            SELECT ac.conv_id,
                   COALESCE(string_agg(c.tool, '>' ORDER BY c.ti), '')
                       AS chain
            FROM all_convs ac LEFT JOIN calls c USING (conv_id)
            GROUP BY ac.conv_id
        )
        SELECT chain, CAST(COUNT(*) AS BIGINT) AS n_convs
        FROM chains GROUP BY chain
    """


_OPENING_SCHEMA = pa.schema(
    [
        ("opening", pa.string()),
        ("n_convs", pa.int64()),
        ("rep_conv_id", pa.string()),
    ]
)


def conversation_opening_groups(ds: "rd.Dataset") -> "rd.Dataset":
    """Template-opening detection: group conversations whose first TWO
    turns have identical word content (the canonical key is the turns'
    `\\S+` words joined with single spaces, ' | ' between turns), and
    return groups with more than one conversation — the boilerplate
    system-prompt / scripted-intro detector that runs before dedup so
    shared openings don't fan out LSH candidate pairs.

    Stage 1 builds each conversation's opening key in one conv_id hash
    partition (turns 0-1 only are read: the input is pre-filtered to
    `turn_idx <= 1` so the shuffle carries two rows per conversation,
    not the corpus). Stage 2 is a combiner count + one groupby(opening)
    keep-min rollup. Output (opening, n_convs, rep_conv_id), groups
    with n_convs >= 2 only.
    """

    def _keys(tb: pa.Table) -> pa.Table:
        import polars as pl

        out = (
            pl.from_arrow(tb)
            .with_columns(
                pl.col("text")
                .fill_null("")
                .str.extract_all(r"\S+")
                .list.join(" ")
                .alias("norm")
            )
            .sort(["conv_id", "turn_idx"])
            .group_by("conv_id", maintain_order=True)
            .agg(pl.col("norm").str.join(" | ").alias("opening"))
            # per-partition combiner before the opening-keyed shuffle
            .group_by("opening")
            .agg(
                pl.len().cast(pl.Int64).alias("_cnt"),
                pl.col("conv_id").min().alias("_rep"),
            )
        )
        return out.to_arrow().cast(
            pa.schema(
                [
                    ("opening", pa.string()),
                    ("_cnt", pa.int64()),
                    ("_rep", pa.string()),
                ]
            )
        )

    def _rollup(tb: pa.Table) -> pa.Table:
        import polars as pl

        out = (
            pl.from_arrow(tb)
            .group_by("opening")
            .agg(
                pl.col("_cnt").sum().alias("n_convs"),
                pl.col("_rep").min().alias("rep_conv_id"),
            )
            .filter(pl.col("n_convs") >= 2)
        )
        return out.to_arrow().cast(_OPENING_SCHEMA)

    keyed = partitioned_group_map(
        ds.filter(expr="turn_idx <= 1").select_columns(
            ["conv_id", "turn_idx", "text"]
        ),
        "conv_id",
        _keys,
        arrow=True,
    )
    return partitioned_group_map(keyed, "opening", _rollup, arrow=True)


def opening_oracle_sql() -> str:
    """DuckDB twin of `conversation_opening_groups`: the opening key is
    the first two 12-word slices joined ' ' within and ' | ' between;
    `-dup` AND `-ws` variants normalize to their base opening."""
    return """
        WITH w AS (
            SELECT doc_id,
                   list_filter(string_split_regex(text, '\\s+'),
                               x -> x != '') AS words
            FROM documents
        ),
        t AS (
            SELECT doc_id, words,
                   'doc-' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS conv_id,
                   CASE WHEN len(words) = 0 THEN 1
                        ELSE CAST(ceil(len(words) / 12.0) AS BIGINT)
                   END AS n_turns
            FROM w
        ),
        all_convs AS (
            SELECT conv_id, words, n_turns FROM t
            UNION ALL
            SELECT conv_id || '-dup', words, n_turns FROM t
            WHERE doc_id % 10 = 0
            UNION ALL
            SELECT conv_id || '-ws', words, n_turns FROM t
            WHERE doc_id % 10 = 5
        ),
        keys AS (
            SELECT conv_id,
                   CASE WHEN n_turns >= 2
                        THEN array_to_string(list_slice(words, 1, 12), ' ')
                             || ' | '
                             || array_to_string(list_slice(words, 13, 24), ' ')
                        ELSE array_to_string(list_slice(words, 1, 12), ' ')
                   END AS opening
            FROM all_convs
        )
        SELECT opening,
               CAST(COUNT(*) AS BIGINT) AS n_convs,
               MIN(conv_id) AS rep_conv_id
        FROM keys
        GROUP BY opening
        HAVING COUNT(*) >= 2
    """


_CURATE_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("keep", pa.int64()),
        ("reject_stage", pa.string()),
    ]
)


def curate_conversations(ds: "rd.Dataset") -> "rd.Dataset":
    """Conversation-level curation gate with TOTAL per-conversation
    reject lineage — the transcript twin of
    `curation.curation_pipeline_docs`: every conversation gets exactly
    one row attributing it to the FIRST rule that rejects it, so a
    100 TB run can account for every dropped conversation:

      too_short   fewer than 2 turns (no exchange to learn from)
      empty_turn  any turn with zero words
      stutter     any adjacent turn pair with token-set Jaccard >= 4/5
                  (the `turn_stutter_stats` predicate — agent loops)
      unbalanced  assistant contribution too thin:
                  3 * assistant_words < user_words (all-integer)
      kept        survivors

    One conv_id hash partition computes every signal in a single
    vectorized polars pass (word counts, token sets + shifted
    intersections, role sums) — the corpus is read once and nothing
    per-conversation runs in Python.
    """

    def _part(tb: pa.Table) -> pa.Table:
        import polars as pl

        d = (
            pl.from_arrow(tb)
            .with_columns(
                pl.col("text")
                .fill_null("")
                .str.count_matches(r"\S+")
                .cast(pl.Int64)
                .alias("wc"),
                pl.col("text")
                .fill_null("")
                .str.extract_all(r"\S+")
                .list.unique()
                .alias("tok"),
                (pl.col("role") == "user").cast(pl.Int64).alias("u"),
            )
            .sort(["conv_id", "turn_idx"])
            .with_columns(pl.col("tok").shift(1).over("conv_id").alias("prev"))
            .with_columns(
                pl.col("tok")
                .list.set_intersection(pl.col("prev"))
                .list.len()
                .cast(pl.Int64)
                .alias("inter"),
                (pl.col("tok").list.len() + pl.col("prev").list.len())
                .cast(pl.Int64)
                .alias("nsum"),
            )
            .with_columns(
                (
                    pl.col("prev").is_not_null()
                    & ((pl.col("nsum") - pl.col("inter")) > 0)
                    & (
                        STUTTER_T_DEN * pl.col("inter")
                        >= STUTTER_T_NUM * (pl.col("nsum") - pl.col("inter"))
                    )
                )
                .cast(pl.Int64)
                .alias("st")
            )
            .group_by("conv_id")
            .agg(
                pl.len().cast(pl.Int64).alias("n_turns"),
                (pl.col("wc") == 0).any().alias("has_empty"),
                (pl.col("st").sum() > 0).alias("has_stutter"),
                (pl.col("wc") * pl.col("u")).sum().alias("uw"),
                (pl.col("wc") * (1 - pl.col("u"))).sum().alias("aw"),
            )
            .with_columns(
                pl.when(pl.col("n_turns") < 2)
                .then(pl.lit("too_short"))
                .when(pl.col("has_empty"))
                .then(pl.lit("empty_turn"))
                .when(pl.col("has_stutter"))
                .then(pl.lit("stutter"))
                .when(3 * pl.col("aw") < pl.col("uw"))
                .then(pl.lit("unbalanced"))
                .otherwise(pl.lit(None, dtype=pl.String))
                .alias("reject_stage")
            )
            .with_columns(
                pl.col("reject_stage").is_null().cast(pl.Int64).alias("keep")
            )
            .select(["conv_id", "keep", "reject_stage"])
        )
        return d.to_arrow().cast(_CURATE_SCHEMA)

    return partitioned_group_map(
        ds.select_columns(["conv_id", "turn_idx", "role", "text"]),
        "conv_id",
        _part,
        arrow=True,
    )


def curate_oracle_sql() -> str:
    """DuckDB twin of `curate_conversations`: rebuilds per-turn word
    counts and token sets from the synth expansion, replays the stutter
    predicate on consecutive slices and the first-reject attribution."""
    return f"""
        WITH w AS (
            SELECT doc_id,
                   list_filter(string_split_regex(text, '\\s+'),
                               x -> x != '') AS words
            FROM documents
        ),
        t AS (
            SELECT doc_id, words,
                   'doc-' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS conv_id,
                   CASE WHEN len(words) = 0 THEN 1
                        ELSE CAST(ceil(len(words) / 12.0) AS BIGINT)
                   END AS n_turns
            FROM w
        ),
        all_convs AS (
            SELECT conv_id, words, n_turns FROM t
            UNION ALL
            SELECT conv_id || '-dup', words, n_turns FROM t
            WHERE doc_id % 10 = 0
            UNION ALL
            SELECT conv_id || '-ws', words, n_turns FROM t
            WHERE doc_id % 10 = 5
        ),
        turns AS (
            SELECT conv_id, n_turns, gs.ti AS ti,
                   CASE WHEN len(words) = 0 THEN 0
                        WHEN gs.ti < n_turns - 1 THEN 12
                        ELSE len(words) - 12 * (n_turns - 1) END AS wc,
                   list_distinct(list_slice(words, gs.ti * 12 + 1,
                                            gs.ti * 12 + 12)) AS a,
                   CASE WHEN gs.ti + 1 < n_turns
                        THEN list_distinct(list_slice(words, gs.ti * 12 + 13,
                                                      gs.ti * 12 + 24))
                   END AS b
            FROM all_convs, unnest(range(all_convs.n_turns)) AS gs(ti)
        ),
        sig AS (
            SELECT conv_id, MAX(n_turns) AS n_turns,
                   bool_or(wc = 0) AS has_empty,
                   bool_or(
                       b IS NOT NULL
                       AND len(a) + len(b) - len(list_intersect(a, b)) > 0
                       AND {STUTTER_T_DEN} * len(list_intersect(a, b))
                           >= {STUTTER_T_NUM} *
                              (len(a) + len(b) - len(list_intersect(a, b)))
                   ) AS has_stutter,
                   SUM(CASE WHEN ti % 2 = 0 THEN wc ELSE 0 END) AS uw,
                   SUM(CASE WHEN ti % 2 = 1 THEN wc ELSE 0 END) AS aw
            FROM turns GROUP BY conv_id
        )
        SELECT conv_id,
               CAST(CASE WHEN n_turns >= 2 AND NOT has_empty
                          AND NOT has_stutter AND 3 * aw >= uw
                     THEN 1 ELSE 0 END AS BIGINT) AS keep,
               CASE WHEN n_turns < 2 THEN 'too_short'
                    WHEN has_empty THEN 'empty_turn'
                    WHEN has_stutter THEN 'stutter'
                    WHEN 3 * aw < uw THEN 'unbalanced'
               END AS reject_stage
        FROM sig
    """


def _ds_arrow_schema(ds: "rd.Dataset") -> pa.Schema:
    """The dataset's pyarrow schema (attach_lookup needs it exact for
    its partitioned path; the transcript surface accepts any column
    superset of (conv_id, turn_idx, role, text))."""
    sch = ds.schema()
    base = getattr(sch, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    return pa.schema(list(zip(sch.names, sch.types)))


def curate_then_dedup(ds: "rd.Dataset") -> "rd.Dataset":
    """The composed transcript pipeline: `curate_conversations` gate
    first, flagship dedup on the SURVIVORS — the order a real curation
    run uses (broken conversations out before they burn signature
    compute or pollute near-dup clusters). Returns the clusters table
    over kept conversations.

    The kept conv_id set attaches back to the turns table through
    `attach_lookup`'s broadcast/partitioned auto-switch (conv_id keys
    only — never the text), so the gate adds no text shuffle on top of
    dedup's own. Oracle: the generated flagship SQL with the curate
    twin nested into its convs body (sqlgen composes; DuckDB allows
    CTEs in subqueries)."""
    from ..stages.grouped import attach_lookup
    from .dedup import dedup_transcripts

    gate = curate_conversations(ds)

    def _kept(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        kept = batch.filter(pc.equal(batch["keep"], 1))
        return pa.table(
            {
                "conv_id": kept["conv_id"],
                "one": pa.array(
                    np.ones(kept.num_rows, dtype=np.int64)
                ),
            }
        )

    import numpy as np  # noqa: F811  (local to keep module header slim)

    marks = gate.map_batches(_kept, batch_format="pyarrow")
    flagged = attach_lookup(
        ds, _ds_arrow_schema(ds), ["conv_id"], marks, "conv_id", "one",
        pa.int64(), ["_keep"],
    )

    def _filter(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.is_valid(batch["_keep"])).drop_columns(
            ["_keep"]
        )

    survivors = flagged.map_batches(_filter, batch_format="pyarrow")
    return dedup_transcripts(survivors).clusters


def curated_dedup_oracle_sql() -> str:
    """Generated flagship dedup SQL over the curate-kept conversations:
    the curate twin nests into the convs body."""
    from ..sqlgen import TRANSCRIPT_CONVS_BODY, dedup_clusters_sql

    body = f"""
  SELECT * FROM ({TRANSCRIPT_CONVS_BODY}) tc
  WHERE tc.conv_id IN (
      SELECT conv_id FROM ({curate_oracle_sql()}) g WHERE g.keep = 1
  )
"""
    return dedup_clusters_sql(body)


def apply_curation(ds: "rd.Dataset") -> "rd.Dataset":
    """The row-level twin of `curate_conversations` (same pattern as
    `apply_truncation` next to `truncate_conversations`): return the
    turn rows of KEPT conversations, for pipelines that feed survivors
    onward without re-deriving the gate. The gate's lineage table fully
    determines this output, so the SQL oracle on the stats covers it;
    `curate_then_dedup` uses the same attach-and-filter shape."""
    import numpy as np

    from ..stages.grouped import attach_lookup

    gate = curate_conversations(ds)

    def _kept(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        kept = batch.filter(pc.equal(batch["keep"], 1))
        return pa.table(
            {
                "conv_id": kept["conv_id"],
                "one": pa.array(np.ones(kept.num_rows, dtype=np.int64)),
            }
        )

    flagged = attach_lookup(
        ds, _ds_arrow_schema(ds), ["conv_id"],
        gate.map_batches(_kept, batch_format="pyarrow"),
        "conv_id", "one", pa.int64(), ["_keep"],
    )

    def _filter(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.is_valid(batch["_keep"])).drop_columns(["_keep"])

    return flagged.map_batches(_filter, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Turn-level SimHash near-dedup (the segment tier of the dedup stack)
# ---------------------------------------------------------------------------

#: zero-padded digits for turn indices inside composite turn keys
#: (``conv_id#zfill(turn_idx)``). Six digits keeps lexicographic key
#: order aligned with numeric turn order for any realistic
#: conversation (10^6 turns per conversation is far beyond the
#: payload's bound); the SQL oracles lpad with the same width.
TURN_KEY_WIDTH = 6

#: band buckets larger than this emit a conversation-distinct chain
#: (each row -> head of the next conversation's k-run) instead of all
#: O(g^2) pairs — the boilerplate-turn guard ("You are a helpful
#: assistant" repeated across millions of conversations). Every row
#: reaches the next distinct conversation, so the bucket stays one
#: connected component even when intra-conversation repeats sit between
#: conversations in k-order; the SQL oracle applies the same rule.
TURN_SIMHASH_BUCKET_CAP = 256

_TURN_PAIR_SCHEMA = pa.schema(
    [
        ("a_conv", pa.string()),
        ("a_turn", pa.int64()),
        ("b_conv", pa.string()),
        ("b_turn", pa.int64()),
        ("hamming", pa.int64()),
    ]
)


def turn_simhash_dup_pairs(
    ds: "rd.Dataset",
    max_hamming: int = 3,
    bucket_cap: int = TURN_SIMHASH_BUCKET_CAP,
) -> "rd.Dataset":
    """Cross-conversation near-duplicate TURN pairs by 64-bit SimHash at
    Hamming <= `max_hamming`, via 16-bit-band LSH.

    The segment-granularity tier between turn-level *exact* dedup
    (`pipelines/dedup.duplicate_turns`) and conversation-level near
    dedup: catches lightly-edited assistant boilerplate that exact
    hashing misses and conversation-level signatures dilute (the
    reference dedups whole documents only,
    `/root/reference/src/quarrycore/dedup/hybrid_dedup.py:131-187`;
    this extends that stack down one level for chat corpora).

    Scale shape: one stateless fingerprint pass (the SimHasher cache is
    per-actor state), a 4x16-bit band explode (pigeonhole: Hamming <= 3
    leaves >= 1 of 4 bands intact, Manku et al. WWW 2007), ONE hash
    partition on band_key with a vectorized triu scan per bucket, and a
    pair-keyed dedup partition. Buckets over `bucket_cap` rows emit a
    conversation-distinct chain (every row -> the head of the next
    conversation's k-sorted run) instead of the full O(g^2) fan-out —
    the bucket remains one connected component across conversations,
    and the cap rule is deterministic so the DuckDB oracle reproduces
    it exactly.

    Output: (a_conv, a_turn, b_conv, b_turn, hamming), pairs ordered by
    the composite key `conv_id || '#' || zfill(turn_idx, TURN_KEY_WIDTH)` with
    a_conv != b_conv (intra-conversation repeats are `turn_stutter`'s
    job, not dedup's).
    """
    import numpy as np

    from ..simhash import SimHasher, md5_feature_hash64
    from ..stages.grouped import partitioned_group_map, run_bounds
    from ..stages.verify import _popcount64

    class _Fp:
        def __init__(self):
            self.sh = SimHasher(7, feature_hash=md5_feature_hash64)

        def __call__(self, batch: pa.Table) -> pa.Table:
            import polars as pl

            df = (
                pl.from_arrow(batch.select(["conv_id", "turn_idx", "text"]))
                .with_columns(
                    pl.col("text")
                    .fill_null("")
                    .str.replace_all(r"\s+", " ")
                    .str.strip_chars(" ")
                    .alias("canon")
                )
                .filter(pl.col("canon") != "")
                .with_columns(
                    (
                        pl.col("conv_id")
                        + pl.lit("#")
                        + pl.col("turn_idx").cast(pl.Utf8).str.zfill(TURN_KEY_WIDTH)
                    ).alias("k")
                )
            )
            fps = self.sh.fingerprints(df["canon"].to_list())
            return pa.table(
                {
                    "k": pa.array(df["k"].to_list(), pa.string()),
                    "conv_id": pa.array(df["conv_id"].to_list(), pa.string()),
                    "turn_idx": pa.array(
                        df["turn_idx"].to_numpy().astype(np.int64), pa.int64()
                    ),
                    "simhash": pa.array(fps.view(np.int64), pa.int64()),
                }
            )

    def _explode(batch: pa.Table) -> pa.Table:
        fp = np.asarray(batch["simhash"], dtype=np.int64).view(np.uint64)
        bands = [(fp >> np.uint64(16 * b)) & np.uint64(0xFFFF) for b in range(4)]
        band_key = np.concatenate(
            [b.astype(np.int64) | (np.int64(i) << np.int64(32)) for i, b in enumerate(bands)]
        )
        n = batch.num_rows
        idx = pa.array(np.tile(np.arange(n), 4))
        return pa.table(
            {
                "band_key": pa.array(band_key, pa.int64()),
                "k": batch["k"].take(idx),
                "conv_id": batch["conv_id"].take(idx),
                "turn_idx": batch["turn_idx"].take(idx),
                "simhash": batch["simhash"].take(idx),
            }
        )

    def _pairs_part(tb: pa.Table) -> pa.Table:
        import polars as pl

        df = (
            pl.from_arrow(tb)
            .sort(["band_key", "k"])
            .unique(["band_key", "k"], keep="first", maintain_order=True)
        )
        keys = df["band_key"].to_numpy()
        fps = df["simhash"].to_numpy().view(np.uint64)
        convs = df["conv_id"].to_numpy()
        bounds = run_bounds(keys)
        ai_all: list[np.ndarray] = []
        bi_all: list[np.ndarray] = []
        for s, e in zip(bounds[:-1], bounds[1:]):
            m = int(e - s)
            if m < 2:
                continue
            if m > bucket_cap:
                # chain over CONVERSATION-DISTINCT neighbors: k-order
                # groups a conversation's rows contiguously (k starts
                # with conv_id), so each row links to the head of the
                # next conversation's run. A naive row-consecutive
                # chain would lose its edge wherever an
                # intra-conversation repeat sits between two
                # conversations (the a!=b filter drops it), splitting
                # the cross-conversation group; linking every row to
                # the next distinct conversation keeps the bucket one
                # connected component at O(m) edges.
                run_convs = convs[s:e]
                heads = (
                    np.nonzero(run_convs[1:] != run_convs[:-1])[0] + 1 + s
                )
                if heads.size == 0:
                    continue  # whole bucket is one conversation
                rows = np.arange(s, e)
                pos = np.searchsorted(heads, rows, side="right")
                valid = pos < heads.size
                ai = rows[valid]
                bi = heads[pos[valid]]
            else:
                ai, bi = np.triu_indices(m, k=1)
                ai = ai + s
                bi = bi + s
            ai_all.append(ai)
            bi_all.append(bi)
        if not ai_all:
            return _TURN_PAIR_SCHEMA.empty_table()
        ai = np.concatenate(ai_all)
        bi = np.concatenate(bi_all)
        ham = _popcount64(np.bitwise_xor(fps[ai], fps[bi]))
        keep = ham <= max_hamming
        ai, bi, ham = ai[keep], bi[keep], ham[keep]
        out = pl.DataFrame(
            {
                "a_conv": df["conv_id"].gather(ai),
                "a_turn": df["turn_idx"].gather(ai),
                "a_k": df["k"].gather(ai),
                "b_conv": df["conv_id"].gather(bi),
                "b_turn": df["turn_idx"].gather(bi),
                "b_k": df["k"].gather(bi),
                "hamming": ham.astype(np.int64),
            }
        ).filter(pl.col("a_conv") != pl.col("b_conv"))
        # canonical pair order: smaller composite key first (triu over a
        # k-sorted frame already satisfies it; kept explicit for safety)
        swap = pl.col("a_k") > pl.col("b_k")
        out = out.with_columns(
            pl.when(swap).then(pl.col("b_conv")).otherwise(pl.col("a_conv")).alias("a_conv"),
            pl.when(swap).then(pl.col("b_turn")).otherwise(pl.col("a_turn")).alias("a_turn"),
            pl.when(swap).then(pl.col("b_k")).otherwise(pl.col("a_k")).alias("a_k"),
            pl.when(swap).then(pl.col("a_conv")).otherwise(pl.col("b_conv")).alias("b_conv"),
            pl.when(swap).then(pl.col("a_turn")).otherwise(pl.col("b_turn")).alias("b_turn"),
            pl.when(swap).then(pl.col("a_k")).otherwise(pl.col("b_k")).alias("b_k"),
        )
        return out.select(
            ["a_conv", "a_turn", "b_conv", "b_turn", "a_k", "b_k", "hamming"]
        ).to_arrow().cast(_TURN_PAIR_WIDE)

    def _dedup(tb: pa.Table) -> pa.Table:
        import polars as pl

        return (
            pl.from_arrow(tb)
            .unique(["a_k", "b_k"])
            .select(["a_conv", "a_turn", "b_conv", "b_turn", "hamming"])
            .to_arrow()
            .cast(_TURN_PAIR_SCHEMA)
        )

    exploded = (
        ds.select_columns(["conv_id", "turn_idx", "text"])
        .map_batches(
            _Fp, batch_format="pyarrow", concurrency=fixed_probe_pool()
        )
        .map_batches(_explode, batch_format="pyarrow")
    )
    pairs = partitioned_group_map(exploded, "band_key", _pairs_part, arrow=True)
    return partitioned_group_map(pairs, "a_k", _dedup, arrow=True)


_TURN_PAIR_WIDE = pa.schema(
    [
        ("a_conv", pa.string()),
        ("a_turn", pa.int64()),
        ("b_conv", pa.string()),
        ("b_turn", pa.int64()),
        ("a_k", pa.string()),
        ("b_k", pa.string()),
        ("hamming", pa.int64()),
    ]
)


def _removed_turn_keys(
    ds: "rd.Dataset", max_hamming: int, bucket_cap: int
):
    """Shared removal machinery for the segment-removal tier: SimHash
    turn pairs -> driver union-find (pair set is O(duplicate turns),
    same discipline as the flagship's verified edges) -> broadcast
    Arrow array of the NON-representative composite keys."""
    import ray as _ray

    from ..oracle import UnionFind

    pairs = turn_simhash_dup_pairs(ds, max_hamming, bucket_cap)
    uf = UnionFind()
    w = TURN_KEY_WIDTH
    for tb in pairs.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for c_a, t_a, c_b, t_b in zip(
            tb["a_conv"].to_pylist(), tb["a_turn"].to_pylist(),
            tb["b_conv"].to_pylist(), tb["b_turn"].to_pylist(),
        ):
            uf.union(f"{c_a}#{t_a:0{w}d}", f"{c_b}#{t_b:0{w}d}")
    removed = sorted(
        k for k, label in uf.components().items() if k != label
    )
    return _ray.put(pa.array(removed, pa.string()))


class _RemovedProbe:
    """Per-ACTOR probe state: the broadcast removed-key array becomes a
    polars Series once in __init__, not once per batch; the composite
    key expression is shared by both consumers. Null conv_id/turn_idx
    rows produce null keys whose membership is filled to False — such
    rows can never be in a pair, so they survive untouched."""

    def __init__(self, removed_ref):
        import polars as pl

        import ray as _ray

        self.removed = pl.Series(
            "k", _ray.get(removed_ref).to_pylist(), pl.Utf8
        )

    @staticmethod
    def _key_expr():
        import polars as pl

        return (
            pl.col("conv_id")
            + pl.lit("#")
            + pl.col("turn_idx").cast(pl.Utf8).str.zfill(TURN_KEY_WIDTH)
        )


class _MarkTurns(_RemovedProbe):
    def __call__(self, batch: pa.Table) -> pa.Table:
        import polars as pl

        df = (
            pl.from_arrow(batch.select(["conv_id", "turn_idx", "text"]))
            .with_columns(
                pl.col("text")
                .fill_null("")
                .str.replace_all(r"\s+", " ")
                .str.strip_chars(" ")
                .alias("canon"),
                self._key_expr().alias("k"),
            )
            .with_columns(
                pl.col("k")
                .is_in(self.removed)
                .fill_null(False)
                .alias("removed")
            )
            .select(["conv_id", "turn_idx", "canon", "removed"])
        )
        return df.to_arrow()


class _KeepTurns(_RemovedProbe):
    def __call__(self, batch: pa.Table) -> pa.Table:
        import polars as pl

        removed = (
            pl.from_arrow(batch.select(["conv_id", "turn_idx"]))
            .select(self._key_expr().alias("k"))["k"]
            .is_in(self.removed)
            .fill_null(False)  # null-key rows are kept, never dropped
        )
        return batch.filter((~removed).to_arrow())


def turn_dedup_conversations(
    ds: "rd.Dataset",
    max_hamming: int = 3,
    bucket_cap: int = TURN_SIMHASH_BUCKET_CAP,
) -> "rd.Dataset":
    """Segment-tier REMOVAL: cross-conversation near-duplicate turns are
    clustered transitively and every non-representative copy is dropped,
    then conversations are reassembled from the surviving turns — the
    acting counterpart of the `turn_simhash_dup_pairs` analytics tier
    (the per-segment dedup a chat-corpus curation pass runs between
    exact turn dedup and conversation-level near dedup; the reference
    removes whole documents only, hybrid_dedup.py:131-187).

    Rules (mirrored exactly by the DuckDB oracle):
    - duplicate groups = connected components over the SimHash turn
      pairs (Hamming <= `max_hamming`); representative = the minimal
      composite key ``conv_id#zfill6(turn_idx)`` in the component;
    - a removed turn is any group member that is not its group's
      representative; turns in no pair survive untouched;
    - cleaned conversation text = surviving turns' canonical texts
      (whitespace-normalized, original case), joined with single
      spaces in turn order, skipping empty turns.

    Output: (conv_id, n_turns, n_removed, cleaned_md5).

    Scale shape: see `_removed_turn_keys`; the removal set broadcasts
    once and is probed per actor with a vectorized is_in; reassembly
    is ONE conv_id-keyed partition pass.
    """
    import hashlib

    removed_ref = _removed_turn_keys(ds, max_hamming, bucket_cap)

    out_schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("n_turns", pa.int64()),
            ("n_removed", pa.int64()),
            ("cleaned_md5", pa.string()),
        ]
    )

    def _assemble(tb: pa.Table) -> pa.Table:
        import polars as pl

        out = (
            pl.from_arrow(tb)
            .sort(["conv_id", "turn_idx"])
            .group_by("conv_id", maintain_order=True)
            .agg(
                pl.len().cast(pl.Int64).alias("n_turns"),
                pl.col("removed").sum().cast(pl.Int64).alias("n_removed"),
                pl.col("canon")
                .filter(~pl.col("removed") & (pl.col("canon") != ""))
                .str.join(" ")
                .alias("cleaned"),
            )
        )
        md5s = [
            hashlib.md5((s or "").encode()).hexdigest()
            for s in out["cleaned"].to_list()
        ]
        return (
            out.with_columns(pl.Series("cleaned_md5", md5s, pl.Utf8))
            .select(["conv_id", "n_turns", "n_removed", "cleaned_md5"])
            .to_arrow()
            .cast(out_schema)
        )

    marked = ds.select_columns(["conv_id", "turn_idx", "text"]).map_batches(
        _MarkTurns,
        fn_constructor_kwargs={"removed_ref": removed_ref},
        batch_format="pyarrow",
        concurrency=fixed_probe_pool(),
    )
    return partitioned_group_map(marked, "conv_id", _assemble, arrow=True)


def apply_turn_dedup(
    ds: "rd.Dataset",
    max_hamming: int = 3,
    bucket_cap: int = TURN_SIMHASH_BUCKET_CAP,
) -> "rd.Dataset":
    """The row-level twin of `turn_dedup_conversations` (same pattern as
    `apply_truncation` / `apply_curation`): return the SURVIVING turn
    rows themselves — every column passed through, including rows with
    null keys (they can never be in a pair) — for pipelines that feed
    the segment-deduped transcripts onward. The stats table's
    (n_removed, cleaned_md5) fully determine this output, so its SQL
    oracle covers the keep rule."""
    removed_ref = _removed_turn_keys(ds, max_hamming, bucket_cap)
    return ds.map_batches(
        _KeepTurns,
        fn_constructor_kwargs={"removed_ref": removed_ref},
        batch_format="pyarrow",
        concurrency=fixed_probe_pool(),
    )
