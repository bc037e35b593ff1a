"""Sequential oracle behavior — mirrors TestMinHashLSH semantics
(`/root/reference/tests/test_deduplication.py:126-188`): a near-duplicate
sentence pair is found, a distinct document is not; clusters form by
transitive closure."""

from quarrycore_ray.oracle import SequentialLSHOracle, UnionFind, cluster_pairs, pair_recall


def test_near_duplicate_found_distinct_not():
    orc = SequentialLSHOracle()
    base = (
        "the quick brown fox jumps over the lazy dog while the cat watches "
        "from the window and the birds sing in the morning light " * 3
    )
    # single-char edit in ONE occurrence -> Jaccard ~0.95, inside the
    # band plan's reliable-recall zone (s=0.86 pairs are coin-flips for
    # threshold-0.85 banding — by design, in the reference too)
    near = base.replace("lazy", "hazy", 1)
    distinct = "completely different content about distributed data processing " * 5

    assert orc.add("doc-1", base) == []
    assert orc.add("doc-2", near) == ["doc-1"]
    assert orc.add("doc-3", distinct) == []


def test_clusters_transitive():
    orc = SequentialLSHOracle()
    t = "shared boilerplate text that is long enough to produce many shingles " * 4
    orc.add("a", t)
    orc.add("b", t + " tiny tail")
    orc.add("c", t)
    cl = orc.clusters()
    assert cl["a"] == cl["b"] == cl["c"] == "a"


def test_union_find_deterministic_min_root():
    uf = UnionFind()
    uf.union("z", "m")
    uf.union("m", "a")
    assert uf.find("z") == "a"


def test_pair_recall_metric():
    truth = {"a": "a", "b": "a", "c": "a", "x": "x"}
    pred_perfect = {"a": "a", "b": "a", "c": "a", "x": "x"}
    pred_split = {"a": "a", "b": "a", "c": "c", "x": "x"}
    assert pair_recall(truth, pred_perfect) == 1.0
    assert abs(pair_recall(truth, pred_split) - 1 / 3) < 1e-9
    assert cluster_pairs(truth) == {("a", "b"), ("a", "c"), ("b", "c")}
