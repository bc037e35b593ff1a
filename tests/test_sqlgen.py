"""Parity and precondition tests for the generated flagship SQL oracles.

sqlgen.py re-computes the full MinHash/LSH/SimHash/cluster chain inside
DuckDB (including SHA-1 in generated SQL). These tests pin:

1. the SHA-1-in-SQL primitive against hashlib,
2. bit-exact MinHash signature parity SQL vs `minhash.MinHasher`,
3. full clusters-table parity SQL vs the engine pipeline,
4. the oracle's preconditions on the test corpora (7-byte ASCII
   shingles only; LSH bucket skew cap never binds; exact-margin gap
   between verified and rejected candidate pairs).
"""

from __future__ import annotations

import hashlib

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from quarrycore_ray import sqlgen

SF = "/root/testdata/sf0.001"


def _con(sf=SF):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    return con


class TestSha1Sql:
    def test_matches_hashlib(self):
        msgs = ["abcdefg", "ray dat", " minhas", "zz  zzz", "1234567"]
        ctes = sqlgen.sha1_cte_chain()
        sql = (
            "WITH msgs AS (SELECT unnest(" + str(msgs) + ") AS sh),\n"
            + ",\n".join(f"{n} AS ({s})" for n, s in ctes)
            + "\nSELECT sh, h32, h64hi FROM sha1w"
        )
        got = {r[0]: (r[1], r[2]) for r in duckdb.sql(sql).fetchall()}
        for m in msgs:
            d = hashlib.sha1(m.encode()).digest()
            h32 = int.from_bytes(d[:4], "little")
            h64 = int.from_bytes(d[:8], "little")
            assert got[m] == (h32, h64 >> 32), m

    def test_simhash_word_reconstruction(self):
        # h64 = h32 + h64hi * 2^32 equals the CombinedMinSimHasher digest
        d = hashlib.sha1(b"abcdefg").digest()
        h64 = int.from_bytes(d[:8], "little")
        h32 = int.from_bytes(d[:4], "little")
        assert h32 + (h64 >> 32 << 32) == h64


class TestSignatureParity:
    def test_signatures_bit_exact(self):
        from quarrycore_ray.minhash import MinHasher

        con = _con()
        sql = f"""
        WITH convs AS ({sqlgen.DOCS_CONVS_BODY}),
        {sqlgen._signature_ctes("convs", 128, 1, 7)}
        SELECT conv_id, i, v FROM sigs
        """
        sql_sigs: dict[str, np.ndarray] = {}
        for cid, i, v in con.execute(sql).fetchall():
            sql_sigs.setdefault(cid, np.zeros(128, dtype=np.uint64))[i] = v

        docs = con.execute(
            "SELECT doc_id, trim(regexp_replace(text, '\\s+', ' ', 'g')) "
            "FROM documents ORDER BY doc_id LIMIT 50"
        ).fetchall()
        mh = MinHasher()
        for doc_id, canon in docs:
            cid = f"doc-{doc_id:08d}"
            assert np.array_equal(mh.signature(canon), sql_sigs[cid]), cid

    def test_simhash_parity(self):
        from quarrycore_ray.minhash import CombinedMinSimHasher

        con = _con()
        sql = f"""
        WITH convs AS (
          {sqlgen.DOCS_CONVS_BODY.replace("FROM documents", "FROM documents WHERE doc_id < 40")}
        ),
        {sqlgen._signature_ctes("convs", 128, 1, 7)}
        SELECT conv_id,
               sum(CASE WHEN b < 63 THEN mb * (1::BIGINT << b) ELSE 0 END)
                 + max(CASE WHEN b = 63 THEN mb ELSE 0 END) * (-9223372036854775808)
          AS fp
        FROM maj GROUP BY conv_id
        """
        got = {r[0]: np.int64(r[1]).view(np.uint64) for r in con.execute(sql).fetchall()}
        docs = con.execute(
            "SELECT doc_id, trim(regexp_replace(text, '\\s+', ' ', 'g')) "
            "FROM documents WHERE doc_id < 40 ORDER BY doc_id"
        ).fetchall()
        hasher = CombinedMinSimHasher()
        _, fps = hasher.compute([c for _, c in docs])
        for (doc_id, _), fp in zip(docs, fps):
            assert got[f"doc-{doc_id:08d}"] == fp, doc_id


class TestClustersParity:
    def test_clusters_match_engine(self):
        import ray.data as rd

        from quarrycore_ray.pipelines.dedup import dedup_transcripts
        from quarrycore_ray.synth import transcripts_from_documents

        eng = (
            dedup_transcripts(rd.from_arrow(transcripts_from_documents(SF)))
            .clusters.to_pandas()
            .sort_values("conv_id")
            .reset_index(drop=True)
        )
        con = _con()
        sql_df = (
            con.execute(sqlgen.dedup_clusters_sql(sqlgen.TRANSCRIPT_CONVS_BODY))
            .df()
            .sort_values("conv_id")
            .reset_index(drop=True)
        )
        assert eng.equals(sql_df[eng.columns])

    def test_incremental_matches_engine_predicate(self):
        # the incremental oracle's edge set equals the clusters oracle's
        # hist x new subset plus pure-variant rows: both must verify the
        # planted variants (every -dup/-ws matches its base at jaccard 1)
        con = _con()
        df = con.execute(
            sqlgen.incremental_matches_sql(
                sqlgen.TRANSCRIPT_HIST_BODY, sqlgen.TRANSCRIPT_NEW_BODY
            )
        ).df()
        planted = df[df.new_id.str.replace("-dup", "").str.replace("-ws", "") == df.hist_id]
        n_variants = con.execute(
            "SELECT count(*) FROM documents WHERE doc_id % 10 IN (0, 5)"
        ).fetchone()[0]
        assert len(planted) == n_variants
        assert (planted.jaccard == 1.0).all()
        assert (planted.hamming == 0).all()


class TestOraclePreconditions:
    """The generated SQL assumes (a) every shingle is exactly 7 ASCII
    bytes and (b) the engine's LSH skew cap (bucket_cap=64) never binds.
    Assert both on every driver corpus so a testdata change surfaces
    here rather than as a silent oracle divergence."""

    @pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
    def test_texts_ascii_and_long_enough(self, sf):
        con = _con(sf)
        n_bad = con.execute(
            "SELECT count(*) FROM documents WHERE "
            "length(trim(regexp_replace(text, '\\s+', ' ', 'g'))) < 7 "
            "OR regexp_matches(text, '[^\\x20-\\x7e\\x0a\\x09\\x0d]')"
        ).fetchone()[0]
        assert n_bad == 0

    @pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
    def test_bucket_cap_never_binds(self, sf):
        con = _con(sf)
        sql = f"""
        WITH RECURSIVE convs AS ({sqlgen.TRANSCRIPT_CONVS_BODY}),
        groups AS (
          SELECT conv_id, canonical,
                 min(conv_id) OVER (PARTITION BY canonical) AS rep
          FROM convs
        ),
        reps AS (SELECT conv_id, canonical FROM groups WHERE conv_id = rep),
        {sqlgen._signature_ctes("reps", 128, 1, 7)},
        bands AS (
          SELECT conv_id, i // 16 AS band,
                 string_agg(v::VARCHAR, ',' ORDER BY i) AS key
          FROM sigs GROUP BY conv_id, i // 16
        )
        SELECT max(cnt) FROM (
          SELECT band, key, count(*) AS cnt FROM bands GROUP BY band, key
        )
        """
        assert con.execute(sql).fetchone()[0] <= 64

    def test_verified_margin(self):
        """No candidate pair sits ON the 0.85 decision boundary: the
        margin keeps float-vs-float threshold comparisons exact (the
        estimate is a multiple of 1/128; 0.85*128 = 108.8 is not an
        integer, so equality is impossible by construction)."""
        assert (0.85 * 128) % 1 != 0


class TestRandomCorpusParity:
    """Parity on RANDOM corpora (not just the fixed driver testdata):
    plant near-duplicates across the whole similarity range — including
    the LSH-marginal 0.7-0.95 zone where band-membership, estimate-vs-
    threshold and Hamming-rescue decisions genuinely vary — and require
    bit-identical clusters from the engine and the generated SQL."""

    @pytest.mark.parametrize("seed", [101, 202])
    def test_engine_matches_sql_on_random_corpus(self, seed, tmp_path):
        import ray.data as rd

        from quarrycore_ray.pipelines.dedup import dedup_conversations

        rng = np.random.default_rng(seed)
        vocab = [f"w{i:03d}" for i in range(400)]
        rows = []
        texts = []
        for i in range(80):
            n = int(rng.integers(30, 120))
            words = [vocab[int(rng.integers(0, len(vocab)))] for _ in range(n)]
            texts.append(words)
            rows.append((i, " ".join(words)))
        # exact copies, whitespace variants, and edits at varying depth
        nxt = 80
        for base in range(0, 60, 3):
            words = list(texts[base])
            kind = base % 9
            if kind == 0:
                rows.append((nxt, " ".join(words)))          # exact
            elif kind == 3:
                rows.append((nxt, "  ".join(words) + "\n"))  # whitespace
            else:
                n_edit = max(1, len(words) * (base % 5) // 20)  # 0-25% edits
                for _ in range(n_edit):
                    p = int(rng.integers(0, len(words)))
                    words[p] = vocab[int(rng.integers(0, len(vocab)))]
                rows.append((nxt, " ".join(words)))
            nxt += 1

        tbl = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
        pq_path = str(tmp_path / "documents.parquet")
        import pyarrow.parquet as pq

        pq.write_table(tbl, pq_path)

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq_path}')"
        )
        sql_df = (
            con.execute(sqlgen.dedup_clusters_sql(sqlgen.DOCS_CONVS_BODY))
            .df()
            .sort_values("conv_id")
            .reset_index(drop=True)
        )

        def _convs(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            from quarrycore_ray.text import normalize_whitespace_array

            ids = [f"doc-{i:08d}" for i in b["doc_id"].to_pylist()]
            return pa.table(
                {
                    "conv_id": pa.array(ids, pa.string()),
                    "canonical_text": normalize_whitespace_array(b["text"]),
                    "n_turns": pa.array(
                        np.ones(b.num_rows, dtype=np.int32)
                    ),
                }
            )

        eng = (
            dedup_conversations(
                rd.read_parquet(pq_path).map_batches(_convs, batch_format="pyarrow")
            )
            .clusters.to_pandas()
            .sort_values("conv_id")
            .reset_index(drop=True)
        )
        assert eng.equals(sql_df[eng.columns]), (
            eng.compare(sql_df[eng.columns]).head()
        )


class TestIncrementalPreconditions:
    @pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
    def test_cross_bucket_hist_side_under_cap(self, sf):
        """The incremental oracle ignores the engine's historical-side
        bucket cap (64); assert no tagged band bucket's hist side ever
        reaches it on the driver corpora."""
        con = _con(sf)
        sql = f"""
        WITH hist AS ({sqlgen.TRANSCRIPT_HIST_BODY}),
        newb AS ({sqlgen.TRANSCRIPT_NEW_BODY}),
        tagged AS (
          SELECT 'h|' || conv_id AS conv_id, canonical FROM hist
          UNION ALL SELECT 'n|' || conv_id, canonical FROM newb
        ),
        {sqlgen._signature_ctes("tagged", 128, 1, 7)},
        bands AS (
          SELECT conv_id, i // 16 AS band,
                 string_agg(v::VARCHAR, ',' ORDER BY i) AS key
          FROM sigs GROUP BY conv_id, i // 16
        )
        SELECT max(cnt) FROM (
          SELECT band, key, count(*) AS cnt FROM bands
          WHERE conv_id LIKE 'h|%' GROUP BY band, key
        )
        """
        assert con.execute(sql).fetchone()[0] <= 64


class TestRandomHotbandParity:
    def test_random_corpus_with_hot_family_matches_sql(self, tmp_path):
        """Random corpus + an 80-member suffix family (the hot-band
        shape): the engine's capped pair generation must still match
        the SQL full closure bit-for-bit on non-fixture data."""
        import pyarrow.parquet as pq
        import ray.data as rd

        from quarrycore_ray.pipelines.dedup import dedup_conversations
        from quarrycore_ray.text import normalize_whitespace_array

        rng = np.random.default_rng(307)
        vocab = [f"w{i:03d}" for i in range(300)]
        texts = [
            " ".join(vocab[int(rng.integers(0, 300))] for _ in range(int(rng.integers(40, 90))))
            for _ in range(60)
        ]
        rows = list(enumerate(texts))
        hot_base = texts[0]
        rows += [(100 + k, f"{hot_base} v{k}") for k in range(80)]
        tbl = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
        pq_path = str(tmp_path / "documents.parquet")
        pq.write_table(tbl, pq_path)

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq_path}')"
        )
        sql_df = (
            con.execute(sqlgen.dedup_clusters_sql(sqlgen.DOCS_CONVS_BODY))
            .df()
            .sort_values("conv_id")
            .reset_index(drop=True)
        )

        def _convs(b: pa.Table) -> pa.Table:
            ids = [f"doc-{i:08d}" for i in b["doc_id"].to_pylist()]
            return pa.table(
                {
                    "conv_id": pa.array(ids, pa.string()),
                    "canonical_text": normalize_whitespace_array(b["text"]),
                    "n_turns": pa.array(np.ones(b.num_rows, dtype=np.int32)),
                }
            )

        eng = (
            dedup_conversations(
                rd.read_parquet(pq_path).map_batches(_convs, batch_format="pyarrow")
            )
            .clusters.to_pandas()
            .sort_values("conv_id")
            .reset_index(drop=True)
        )
        assert eng.equals(sql_df[eng.columns])
        # the hot family collapsed into one cluster
        hot = eng[eng.conv_id >= "doc-00000100"]
        assert hot.cluster_id.nunique() == 1
