"""DuckDB-SQL generators for the flagship dedup oracles.

The driver's correctness gate compares every ``queries()`` entry against
an ``oracle_sql()`` string executed by DuckDB. The flagship MinHash/LSH
pipeline was previously "rows-only" because its signatures derive from
SHA-1 (datasketch's ``sha1_hash32``) and DuckDB 1.0 has no ``sha1()``
function. This module closes that gap by *generating* SQL that computes
SHA-1 itself, which makes the entire chain — shingling, MinHash
signatures, LSH band buckets, signature-Jaccard estimates, SimHash
fingerprints, Hamming verification, and connected-component clustering —
exactly reproducible inside DuckDB, bit-for-bit against the engine
(`minhash.py`, `stages/lsh.py`, `stages/verify.py`, `stages/cluster.py`).

How the SHA-1 works in SQL
--------------------------
Every shingle is exactly ``shingle_size`` (7) ASCII bytes (the engine
only emits shorter shingles for texts shorter than k, which the test
corpora never contain — enforced by tests/test_sqlgen.py). A 7-byte
message fits one 512-bit SHA-1 block with message schedule
``W0 = bytes 0..3 (BE), W1 = bytes 4..6 + 0x80, W2..14 = 0, W15 = 56``.
Because ``rotl1`` distributes over XOR and W2..W15 are constants, each
expanded ``W[t] (t >= 16)`` is an XOR of *rotations of W0 and W1 plus a
constant*, all computable symbolically ahead of time (`_symbolic_w`).
The 80 rounds are emitted as 80 chained CTE projections (pure 32-bit
integer ops on BIGINT columns), fully vectorized over all distinct
shingles — no recursion, no UDFs.

Reference semantics being oracled: the hybrid dedup flow
(`/root/reference/src/quarrycore/dedup/hybrid_dedup.py:131-187`) with
datasketch-compatible MinHash(128, seed 1) over 7-char shingles
(`/root/reference/src/quarrycore/dedup/minhash_redis.py:162-202`).

All multiply-referenced CTEs are marked MATERIALIZED: DuckDB inlines
CTEs by default, which would re-run the whole SHA-1 + permutation chain
once per reference (observed 55 s -> ~3 s with materialization).
"""

from __future__ import annotations

from functools import lru_cache

_M32 = 0xFFFFFFFF
_MERSENNE = (1 << 61) - 1


def _rotl_const(x: int, k: int) -> int:
    return ((x << k) | (x >> (32 - k))) & _M32


@lru_cache(maxsize=1)
def _symbolic_w() -> list[tuple[frozenset, int]]:
    """W[t] as (xor-set of (var, rot) terms, xor-constant).

    vars are 'W0'/'W1'; constants fold W15 = 56 (messages are always 7
    bytes). XOR of identical terms cancels, so terms live in a set.
    """
    ws: list[tuple[set, int]] = []
    for t in range(16):
        if t == 0:
            ws.append(({("W0", 0)}, 0))
        elif t == 1:
            ws.append(({("W1", 0)}, 0))
        elif t == 15:
            ws.append((set(), 56))
        else:
            ws.append((set(), 0))
    for t in range(16, 80):
        terms: set = set()
        const = 0
        for dt in (3, 8, 14, 16):
            tt, cc = ws[t - dt]
            terms ^= tt
            const ^= cc
        terms = {(v, (r + 1) % 32) for (v, r) in terms}
        const = _rotl_const(const, 1)
        ws.append((terms, const))
    return [(frozenset(t), c) for t, c in ws]


def _w_sql(t: int) -> str:
    """SQL expression for the expanded message-schedule word W[t]."""
    if t == 0:
        return "W0"
    if t == 1:
        return "W1"
    if t < 15:
        return "0"
    if t == 15:
        return "56"
    terms, const = _symbolic_w()[t]
    parts = []
    for v, r in sorted(terms):
        if r == 0:
            parts.append(v)
        else:
            parts.append(f"((({v}<<{r})|({v}>>{32 - r}))&4294967295)")
    parts.append(str(const))
    expr = parts[0]
    for p in parts[1:]:
        expr = f"xor({expr},{p})"
    return expr


def _swap32(x: str) -> str:
    """Byte-swap a 32-bit word (digest words are big-endian; sha1_hash32
    reads the first digest bytes little-endian)."""
    return (
        f"((({x}&255)<<24)|((({x}>>8)&255)<<16)|"
        f"((({x}>>16)&255)<<8)|(({x}>>24)&255))"
    )


def sha1_cte_chain(src_cte: str = "msgs", col: str = "sh") -> list[tuple[str, str]]:
    """CTE chain computing SHA-1 of 7-byte ASCII messages.

    Input: ``src_cte(col)`` — one row per distinct message, each exactly
    7 ASCII bytes. Output: final CTE ``sha1w(col, h32, h64hi)`` where
    ``h32``    = first 4 digest bytes as little-endian uint32
                 (== minhash.sha1_hash32), and
    ``h64hi``  = digest bytes 4..7 as little-endian uint32, so the
                 SimHash feature hash h64 = h32 + h64hi * 2^32
                 (== the low 8 digest bytes little-endian, the shared
                 digest of minhash.CombinedMinSimHasher).
    """

    def byte(i: int) -> str:
        return f"ascii(substr({col},{i + 1},1))::BIGINT"

    w0 = f"(({byte(0)}<<24)|({byte(1)}<<16)|({byte(2)}<<8)|{byte(3)})"
    w1 = f"(({byte(4)}<<24)|({byte(5)}<<16)|({byte(6)}<<8)|128)"
    ctes: list[tuple[str, str]] = [
        (
            "s0",
            f"SELECT {col}, ({w0})::BIGINT AS W0, ({w1})::BIGINT AS W1, "
            "1732584193::BIGINT AS a, 4023233417::BIGINT AS b, "
            "2562383102::BIGINT AS c, 271733878::BIGINT AS d, "
            f"3285377520::BIGINT AS e FROM {src_cte}",
        )
    ]
    prev = "s0"
    for t in range(80):
        if t < 20:
            f = "xor(d, (b & xor(c, d)))"  # == (b&c)|((~b)&d)
            k = 0x5A827999
        elif t < 40:
            f = "xor(xor(b,c),d)"
            k = 0x6ED9EBA1
        elif t < 60:
            f = "((b&c)|(b&d)|(c&d))"
            k = 0x8F1BBCDC
        else:
            f = "xor(xor(b,c),d)"
            k = 0xCA62C1D6
        rotl5a = "(((a<<5)|(a>>27))&4294967295)"
        rotl30b = "(((b<<30)|(b>>2))&4294967295)"
        name = f"s{t + 1}"
        ctes.append(
            (
                name,
                f"SELECT {col}, W0, W1, "
                f"(({rotl5a} + {f} + e + {k} + {_w_sql(t)}) & 4294967295) AS a, "
                f"a AS b, {rotl30b} AS c, c AS d, d AS e FROM {prev}",
            )
        )
        prev = name
    ctes.append(
        (
            "dig",
            f"SELECT {col}, ((a+1732584193)&4294967295) AS h0, "
            f"((b+4023233417)&4294967295) AS h1 FROM {prev}",
        )
    )
    ctes.append(
        (
            "sha1w",
            f"SELECT {col}, {_swap32('h0')} AS h32, "
            f"{_swap32('h1')} AS h64hi FROM dig",
        )
    )
    return ctes


def _perm_values(num_perm: int = 128, seed: int = 1) -> str:
    """The engine's (a_i, b_i) universal-hash constants as a VALUES list
    (drawn from numpy RandomState exactly like datasketch; embedding the
    resolved constants is what makes the draw order SQL-irrelevant)."""
    from .minhash import permutations

    a, b = permutations(num_perm, seed)
    return ",".join(f"({i},{int(a[i])},{int(b[i])})" for i in range(num_perm))


def _signature_ctes(
    convs_cte: str, num_perm: int, seed: int, shingle_size: int
) -> str:
    """CTE text from a ``{convs_cte}(conv_id, canonical)`` relation to
    ``sigs(conv_id, i, v)`` (the MinHash signature, one row per slot)
    and ``maj(conv_id, b, mb)`` (the SimHash fingerprint, one row per
    bit). Mirrors minhash.MinHasher.signature / CombinedMinSimHasher:
    lowercased whitespace-collapsed shingles, sha1_hash32 token hashes,
    ``((a*h + b) mod 2^64) mod (2^61-1) & 0xFFFFFFFF`` slot hashes,
    column-min; SimHash = per-bit majority vote of the 64-bit feature
    hash over the shingle set.
    """
    k = shingle_size
    sha_sql = ",\n".join(f"{n} AS ({s})" for n, s in sha1_cte_chain())
    return f"""
norm AS (SELECT conv_id, lower(canonical) AS t FROM {convs_cte}),
docsh AS MATERIALIZED (
  SELECT DISTINCT conv_id, substring(t, i, {k}) AS sh
  FROM norm, generate_series(1, 65536) AS g(i)
  WHERE i <= length(t) - {k - 1}
),
msgs AS (SELECT DISTINCT sh FROM docsh),
{sha_sql},
sha1f AS MATERIALIZED (SELECT sh, h32, h64hi FROM sha1w),
perms AS (SELECT * FROM (VALUES {_perm_values(num_perm, seed)}) AS p(i, pa, pb)),
permed AS (
  SELECT sh, i,
    (((pa::HUGEINT * h32 + pb) % 18446744073709551616::HUGEINT)
      % 2305843009213693951 % 4294967296)::BIGINT AS pv
  FROM sha1f, perms
),
sigs AS MATERIALIZED (
  SELECT d.conv_id, p.i, min(p.pv) AS v
  FROM docsh d JOIN permed p USING (sh)
  GROUP BY d.conv_id, p.i
),
shbits AS (
  SELECT sh, g.b,
    CASE WHEN g.b < 32 THEN (h32 >> g.b) & 1
         ELSE (h64hi >> (g.b - 32)) & 1 END AS bit
  FROM sha1f, generate_series(0, 63) AS g(b)
),
votes AS (
  SELECT d.conv_id, s.b, sum(s.bit) AS ones, count(*) AS n
  FROM docsh d JOIN shbits s USING (sh)
  GROUP BY d.conv_id, s.b
),
maj AS MATERIALIZED (
  SELECT conv_id, b, CASE WHEN 2 * ones > n THEN 1 ELSE 0 END AS mb FROM votes
)"""


def _pair_verify_ctes(
    pairs_cte: str,
    threshold: float,
    strict_hamming: int,
    num_perm: int,
    thr_cte: str | None = None,
) -> str:
    """CTEs from ``{pairs_cte}(a_id, b_id)`` to ``edges(a_id, b_id,
    jaccard, hamming)`` via the shared duplicate predicate
    (stages/verify.py: jaccard_estimate >= threshold OR hamming <=
    strict_hamming). jaccard = equal-slot fraction of the signatures —
    exact, since counts and /{num_perm}.0 are exactly representable.

    With ``thr_cte`` (a CTE name providing (conv_id, thr)) the
    per-domain rule applies instead of the global threshold: a pair
    verifies at the STRICTER of its two sides' thresholds
    (greatest(thr_a, thr_b) — stages/verify.py:79-86, reference
    deduplicator.py:84-91)."""
    if thr_cte:
        pred = (
            f"e.eq / {num_perm}.0 >= greatest(ta.thr, tb.thr) "
            f"OR h.h <= {strict_hamming}"
        )
        thr_joins = (
            f"JOIN {thr_cte} ta ON ta.conv_id = e.a_id "
            f"JOIN {thr_cte} tb ON tb.conv_id = e.b_id"
        )
    else:
        pred = f"e.eq / {num_perm}.0 >= {threshold} OR h.h <= {strict_hamming}"
        thr_joins = ""
    return f"""
est AS (
  SELECT p.a_id, p.b_id, sum(CASE WHEN sa.v = sb.v THEN 1 ELSE 0 END) AS eq
  FROM {pairs_cte} p
  JOIN sigs sa ON sa.conv_id = p.a_id
  JOIN sigs sb ON sb.conv_id = p.b_id AND sb.i = sa.i
  GROUP BY p.a_id, p.b_id
),
ham AS (
  SELECT p.a_id, p.b_id, sum(CASE WHEN ma.mb != mbb.mb THEN 1 ELSE 0 END) AS h
  FROM {pairs_cte} p
  JOIN maj ma ON ma.conv_id = p.a_id
  JOIN maj mbb ON mbb.conv_id = p.b_id AND mbb.b = ma.b
  GROUP BY p.a_id, p.b_id
),
edges AS MATERIALIZED (
  -- CAST: DuckDB sums return HUGEINT, which pandas renders as float64;
  -- the engine's hamming column is int64 and the driver's value hash
  -- is dtype-sensitive
  SELECT e.a_id, e.b_id, e.eq / {num_perm}.0 AS jaccard,
         CAST(h.h AS BIGINT) AS hamming
  FROM est e JOIN ham h ON e.a_id = h.a_id AND e.b_id = h.b_id
  {thr_joins}
  WHERE {pred}
)"""


def dedup_clusters_sql(
    convs_body: str,
    threshold: float = 0.85,
    strict_hamming: int = 3,
    bands: int = 8,
    rows_per_band: int = 16,
    num_perm: int = 128,
    seed: int = 1,
    shingle_size: int = 7,
    thr_body: str | None = None,
) -> str:
    """Full flagship-dedup oracle: ``convs_body`` is the SQL body of a
    CTE producing (conv_id, canonical); the returned statement computes
    the engine's clusters table (conv_id, cluster_id, is_representative,
    dup_kind) exactly:

      S2 exact groups (min-conv_id representative per canonical text,
         stages/exact.py) ->
      S3 MinHash+SimHash signatures over representatives only ->
      S4 LSH candidates: any two reps sharing one band's {rows_per_band}
         signature slots (band-content equality == the engine's 64-bit
         band-key buckets, stages/lsh.py; the skew cap never binds on
         the test corpora — asserted by tests/test_sqlgen.py) ->
      S5 verified edges (est >= threshold OR hamming <= strict) ->
      S6 connected components, cluster label = min conv_id (recursive
         min-reachability == stages/cluster.driver_union_find) ->
      member explosion with the reference's duplicate_type semantics
      (exact | near | unique, pipelines/dedup.assign_clusters).

    ``thr_body`` (optional): SQL body of a CTE producing (conv_id, thr)
    per REPRESENTATIVE — per-domain verification thresholds (the
    reference's per-content-type rule); pairs then verify at
    greatest(thr_a, thr_b) instead of the global `threshold`.
    """
    thr_sql = f"rep_thr AS MATERIALIZED ({thr_body}),\n" if thr_body else ""
    return f"""
WITH RECURSIVE convs AS ({convs_body}),
groups AS MATERIALIZED (
  SELECT conv_id, canonical, min(conv_id) OVER (PARTITION BY canonical) AS rep
  FROM convs
),
reps AS (SELECT conv_id, canonical FROM groups WHERE conv_id = rep),
{thr_sql}{_signature_ctes("reps", num_perm, seed, shingle_size)},
bands AS (
  SELECT conv_id, i // {rows_per_band} AS band,
         string_agg(v::VARCHAR, ',' ORDER BY i) AS key
  FROM sigs GROUP BY conv_id, i // {rows_per_band}
),
pairs AS MATERIALIZED (
  SELECT DISTINCT x.conv_id AS a_id, y.conv_id AS b_id
  FROM bands x JOIN bands y
    ON x.band = y.band AND x.key = y.key AND x.conv_id < y.conv_id
),
{_pair_verify_ctes("pairs", threshold, strict_hamming, num_perm,
                   thr_cte="rep_thr" if thr_body else None)},
bi AS MATERIALIZED (
  SELECT a_id AS s, b_id AS d FROM edges
  UNION ALL SELECT b_id, a_id FROM edges
),
reach AS (
  SELECT s, d FROM bi
  UNION
  SELECT r.s, b2.d FROM reach r JOIN bi b2 ON r.d = b2.s
),
lbl AS (
  SELECT s AS conv_id, least(min(d), s) AS label FROM reach GROUP BY s
),
rep_label AS MATERIALIZED (
  SELECT r.conv_id AS rep, coalesce(l.label, r.conv_id) AS cluster_id,
         l.label IS NOT NULL AS has_edge
  FROM reps r LEFT JOIN lbl l ON l.conv_id = r.conv_id
)
SELECT g.conv_id, rl.cluster_id,
       g.conv_id = rl.cluster_id AS is_representative,
       CASE WHEN g.conv_id != g.rep THEN 'exact'
            WHEN rl.has_edge THEN 'near' ELSE 'unique' END AS dup_kind
FROM groups g JOIN rep_label rl ON g.rep = rl.rep
"""


def incremental_matches_sql(
    hist_body: str,
    new_body: str,
    threshold: float = 0.85,
    strict_hamming: int = 3,
    bands: int = 8,
    rows_per_band: int = 16,
    num_perm: int = 128,
    seed: int = 1,
    shingle_size: int = 7,
) -> str:
    """Oracle for the incremental near-dup probe
    (pipelines/incremental.incremental_near_dup): new-batch signatures
    vs a historical signature index via the two-sided band join. Output
    matches the engine's ``matches`` table (hist_id, new_id, jaccard,
    hamming): distinct cross-side pairs sharing >= 1 band, verified by
    the shared predicate. The historical-side bucket cap (64) never
    binds on the test corpora (tests/test_sqlgen.py asserts it).
    """
    return f"""
WITH hist AS ({hist_body}),
newb AS ({new_body}),
tagged AS (
  SELECT 'h|' || conv_id AS conv_id, canonical FROM hist
  UNION ALL
  SELECT 'n|' || conv_id AS conv_id, canonical FROM newb
),
{_signature_ctes("tagged", num_perm, seed, shingle_size)},
bands AS (
  SELECT conv_id, i // {rows_per_band} AS band,
         string_agg(v::VARCHAR, ',' ORDER BY i) AS key
  FROM sigs GROUP BY conv_id, i // {rows_per_band}
),
pairs AS MATERIALIZED (
  SELECT DISTINCT x.conv_id AS a_id, y.conv_id AS b_id
  FROM bands x JOIN bands y ON x.band = y.band AND x.key = y.key
  WHERE x.conv_id LIKE 'h|%' AND y.conv_id LIKE 'n|%'
),
{_pair_verify_ctes("pairs", threshold, strict_hamming, num_perm)}
SELECT substr(a_id, 3) AS hist_id, substr(b_id, 3) AS new_id,
       jaccard, hamming
FROM edges
"""


# --- conversation reconstructions of the synthetic corpora -------------------

#: canonical text of one document (matches text.normalize_whitespace_array)
CANON_EXPR = "trim(regexp_replace(text, '\\s+', ' ', 'g'))"

#: synth.transcripts_from_documents -> assembled conversations, in SQL.
#: Each document is one conversation whose turns are 12-word chunks of
#: its text; turns joined with the single-space TURN_SEP means the
#: conversation's canonical text equals the document's normalized text.
#: Variants are planted deterministically on doc_id (suffix -dup for
#: doc_id%10==0 with identical text, -ws for %10==5 with whitespace
#: noise that normalizes away) — both share the base canonical text.
TRANSCRIPT_CONVS_BODY = f"""
  SELECT 'doc-' || lpad(doc_id::VARCHAR, 8, '0') AS conv_id,
         {CANON_EXPR} AS canonical
  FROM documents
  UNION ALL
  SELECT 'doc-' || lpad(doc_id::VARCHAR, 8, '0')
           || (CASE WHEN doc_id % 10 = 0 THEN '-dup' ELSE '-ws' END),
         {CANON_EXPR}
  FROM documents WHERE doc_id % 10 IN (0, 5)
"""

#: pipelines/documents._docs_as_conversations, in SQL.
DOCS_CONVS_BODY = f"""
  SELECT 'doc-' || lpad(doc_id::VARCHAR, 8, '0') AS conv_id,
         {CANON_EXPR} AS canonical
  FROM documents
"""

#: the incremental query's historical side (base conversations) ...
TRANSCRIPT_HIST_BODY = f"""
  SELECT 'doc-' || lpad(doc_id::VARCHAR, 8, '0') AS conv_id,
         {CANON_EXPR} AS canonical
  FROM documents
"""

#: ... and its new-batch side (the planted variants).
TRANSCRIPT_NEW_BODY = f"""
  SELECT 'doc-' || lpad(doc_id::VARCHAR, 8, '0')
           || (CASE WHEN doc_id % 10 = 0 THEN '-dup' ELSE '-ws' END) AS conv_id,
         {CANON_EXPR} AS canonical
  FROM documents WHERE doc_id % 10 IN (0, 5)
"""


def threshold_sweep_sql(
    convs_body: str,
    thresholds: tuple = (0.75, 0.8, 0.85, 0.9, 0.95),
    bands: int = 8,
    rows_per_band: int = 16,
    num_perm: int = 128,
    seed: int = 1,
    shingle_size: int = 7,
) -> str:
    """Oracle for the dedup threshold-sweep analysis
    (pipelines/documents.dedup_threshold_sweep): candidates come from
    the FIXED banding plan; for each threshold t the est-only predicate
    (eq/num_perm >= t, no Hamming clause) defines the edge set, and a
    single threshold-parameterized recursive reach computes components.
    Output one row per threshold: (threshold, n_candidates, n_edges,
    n_clusters) with n_clusters = |reps| - (nodes-with-edges -
    components-among-them)."""
    ths = ", ".join(f"({t!r})" for t in thresholds)
    return f"""
WITH RECURSIVE convs AS ({convs_body}),
groups AS MATERIALIZED (
  SELECT conv_id, canonical, min(conv_id) OVER (PARTITION BY canonical) AS rep
  FROM convs
),
reps AS (SELECT conv_id, canonical FROM groups WHERE conv_id = rep),
{_signature_ctes("reps", num_perm, seed, shingle_size)},
bands AS (
  SELECT conv_id, i // {rows_per_band} AS band,
         string_agg(v::VARCHAR, ',' ORDER BY i) AS key
  FROM sigs GROUP BY conv_id, i // {rows_per_band}
),
pairs AS MATERIALIZED (
  SELECT DISTINCT x.conv_id AS a_id, y.conv_id AS b_id
  FROM bands x JOIN bands y
    ON x.band = y.band AND x.key = y.key AND x.conv_id < y.conv_id
),
est AS MATERIALIZED (
  SELECT p.a_id, p.b_id, sum(CASE WHEN sa.v = sb.v THEN 1 ELSE 0 END) AS eq
  FROM pairs p
  JOIN sigs sa ON sa.conv_id = p.a_id
  JOIN sigs sb ON sb.conv_id = p.b_id AND sb.i = sa.i
  GROUP BY p.a_id, p.b_id
),
ths(t) AS (VALUES {ths}),
bi AS MATERIALIZED (
  SELECT ths.t, e.a_id AS s, e.b_id AS d
  FROM est e JOIN ths ON e.eq / {num_perm}.0 >= ths.t
  UNION ALL
  SELECT ths.t, e.b_id, e.a_id
  FROM est e JOIN ths ON e.eq / {num_perm}.0 >= ths.t
),
reach AS (
  SELECT t, s, d FROM bi
  UNION
  SELECT r.t, r.s, b2.d FROM reach r JOIN bi b2
    ON b2.t = r.t AND r.d = b2.s
),
comp AS (
  SELECT t, s, least(min(d), s) AS label
  FROM reach GROUP BY t, s
),
merged AS (
  SELECT t, CAST(count(*) - count(DISTINCT label) AS BIGINT) AS m
  FROM comp GROUP BY t
),
edge_cnt AS (
  SELECT t, CAST(count(*) AS BIGINT) AS n_edges
  FROM (SELECT DISTINCT t, s, d FROM bi WHERE s < d) GROUP BY t
)
SELECT ths.t AS threshold,
       (SELECT CAST(count(*) AS BIGINT) FROM est) AS n_candidates,
       coalesce(edge_cnt.n_edges, 0) AS n_edges,
       (SELECT CAST(count(*) AS BIGINT) FROM reps)
           - coalesce(merged.m, 0) AS n_clusters
FROM ths
LEFT JOIN edge_cnt ON edge_cnt.t = ths.t
LEFT JOIN merged ON merged.t = ths.t
"""


def review_sample_sql(
    convs_body: str,
    per_bucket: int = 5,
    threshold: float = 0.85,
    strict_hamming: int = 3,
    rows_per_band: int = 16,
    num_perm: int = 128,
    seed: int = 1,
    shingle_size: int = 7,
) -> str:
    """Oracle for the stratified dup-pair review sample
    (pipelines/documents.dedup_review_sample): the flagship's verified
    edges (same signatures / banding / verify predicate as
    dedup_clusters_sql), bucketed by Jaccard-estimate decile and ranked
    inside each bucket by md5(a_id || '|' || b_id). The decile is
    all-integer — eq is recovered exactly from jaccard (eq/num_perm is
    a power-of-two division, so round(jaccard * num_perm) == eq) — and
    the md5 rank is deterministic, so the sample is reproducible across
    engines, block layouts and reruns."""
    return f"""
WITH convs AS ({convs_body}),
groups AS MATERIALIZED (
  SELECT conv_id, canonical, min(conv_id) OVER (PARTITION BY canonical) AS rep
  FROM convs
),
reps AS (SELECT conv_id, canonical FROM groups WHERE conv_id = rep),
{_signature_ctes("reps", num_perm, seed, shingle_size)},
bands AS (
  SELECT conv_id, i // {rows_per_band} AS band,
         string_agg(v::VARCHAR, ',' ORDER BY i) AS key
  FROM sigs GROUP BY conv_id, i // {rows_per_band}
),
pairs AS MATERIALIZED (
  SELECT DISTINCT x.conv_id AS a_id, y.conv_id AS b_id
  FROM bands x JOIN bands y
    ON x.band = y.band AND x.key = y.key AND x.conv_id < y.conv_id
),
{_pair_verify_ctes("pairs", threshold, strict_hamming, num_perm)},
bk AS (
  SELECT a_id, b_id, jaccard, hamming,
         (CAST(round(jaccard * {num_perm}) AS BIGINT) * 10) // {num_perm}
             AS bucket,
         md5(a_id || '|' || b_id) AS mk
  FROM edges
),
rk AS (
  SELECT *, row_number() OVER (
      PARTITION BY bucket ORDER BY mk, a_id, b_id) AS rank
  FROM bk
)
SELECT CAST(bucket AS BIGINT) AS bucket, CAST(rank AS BIGINT) AS rank,
       a_id, b_id, jaccard, hamming
FROM rk WHERE rank <= {per_bucket}
"""
