"""Scale smoke: run representative round-2 operators at sf0.1 (10x the
driver's correctness scale) and assert structural invariants — bins
monotone and gap-free, ranks bounded, overlap symmetric-free and
normalized, composite scores clamped. Catches anything that only breaks
past the tiny fixtures (block splits, multi-batch groupings)."""

import os

import pytest

SF_DIR = "/root/testdata/sf0.1"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(SF_DIR, "documents.parquet")),
    reason="sf0.1 testdata not present",
)


def test_pack_sequences_bins_gap_free():
    from quarrycore_ray.pipelines.training import pack_sequences

    out = pack_sequences(SF_DIR, budget=512).to_pandas().sort_values("doc_id")
    bins = out.bin_id.to_numpy()
    assert (bins[1:] >= bins[:-1]).all()  # monotone in doc order
    assert bins[0] == 0
    assert set(range(bins.max() + 1)) == set(bins)  # no empty bins
    # every bin except possibly the last holds >= budget-worth of starts
    assert out.n_tokens.sum() > 512 * bins.max()


def test_tfidf_ranks_bounded_and_dense():
    from quarrycore_ray.pipelines.training import tfidf_top_terms

    out = tfidf_top_terms(SF_DIR, k=3).to_pandas()
    g = out.groupby("doc_id")["rank"]
    assert int(out["rank"].max()) <= 3
    # ranks are dense 1..m per doc
    assert (g.min() == 1).all()
    assert (g.max() == g.count()).all()


def test_source_overlap_normalized():
    from quarrycore_ray.pipelines.training import source_overlap

    out = source_overlap(SF_DIR).to_pandas()
    assert (out.jaccard > 0).all() and (out.jaccard <= 1).all()
    assert (out.source_a < out.source_b).all()  # canonical pair order
    # no duplicate pairs
    assert not out.duplicated(["source_a", "source_b"]).any()


def test_composite_scores_clamped_everywhere():
    from quarrycore_ray.pipelines.documents import content_composite_scores

    out = content_composite_scores(SF_DIR).to_pandas()
    assert len(out) == 5000
    for c in ("quality_score", "readability_score", "engagement_score"):
        assert out[c].between(0, 1).all()


def test_cohort_retention_accounting():
    from quarrycore_ray.pipelines.relational import cohort_retention

    out = cohort_retention(SF_DIR).to_pandas()
    # offset-0 cell of each cohort holds its full cohort population:
    # every user's first event lands in offset 0 by construction
    z = out[out.week_offset == 0]
    assert set(out.cohort_week) == set(z.cohort_week)
    # retention never exceeds the cohort size
    m = z.set_index("cohort_week").n_users
    assert (out.n_users <= out.cohort_week.map(m)).all()


def test_setsim_dense_invariants_at_sf01():
    from quarrycore_ray.pipelines.documents import (
        SETSIM_T_DEN,
        SETSIM_T_NUM,
        setsim_join_docs,
    )

    out = setsim_join_docs(SF_DIR)
    assert (out.a_id < out.b_id).all()
    assert not out.duplicated(["a_id", "b_id"]).any()
    # the integer predicate holds on every emitted pair
    assert (
        SETSIM_T_DEN * out.inter_size >= SETSIM_T_NUM * out.union_size
    ).all()
    assert (out.inter_size <= out.union_size).all()
    # jaccard is exactly the advertised division
    assert (out.jaccard == out.inter_size / out.union_size).all()


def test_kcore_monotone_at_sf01():
    from quarrycore_ray.pipelines.graph import link_kcore_docs

    deep = link_kcore_docs(SF_DIR, k=3, rounds=8).to_pandas()
    shallow = link_kcore_docs(SF_DIR, k=3, rounds=2).to_pandas()
    assert set(deep.doc_id) <= set(shallow.doc_id)  # peeling only removes
    assert (deep.core_deg >= 1).all()


def test_curate_then_dedup_accounting_at_sf01():
    import ray.data as rd

    from quarrycore_ray.pipelines.transcripts import (
        curate_conversations,
        curate_then_dedup,
    )
    from quarrycore_ray.synth import transcripts_from_documents

    ts = transcripts_from_documents(SF_DIR)
    gate = curate_conversations(rd.from_arrow(ts)).to_pandas()
    clusters = curate_then_dedup(rd.from_arrow(ts)).to_pandas()
    kept = set(gate[gate.keep == 1].conv_id)
    assert set(clusters.conv_id) == kept  # total: every survivor clustered
    # representatives are cluster minima
    reps = clusters[clusters.is_representative]
    assert (reps.conv_id == reps.cluster_id).all()
