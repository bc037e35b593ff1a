"""Link-graph operators (pipelines/graph.py): the distributed
fixed-point PageRank matches a sequential integer reference on the same
deterministic edge rule, phantom targets (dst not a real doc_id) drop
out, and the generated oracle SQL reproduces the engine bit-for-bit."""

from collections import Counter

import pyarrow as pa
import pyarrow.parquet as pq


def _write_ids(tmp_path, ids):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array([f"text {i}" for i in ids], pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    return str(tmp_path)


def _seq_pagerank(ids, iters=5):
    """Sequential twin of the exact fixed-point recurrence."""
    from quarrycore_ray.pipelines.graph import PR_SCALE

    n = len(ids)
    id_set = set(ids)
    edges = {(d, (d * 31 + j * 17 + 1) % n) for d in ids for j in range(d % 3 + 1)}
    odeg = Counter(s for s, _ in edges)
    indeg = Counter(t for _, t in edges if t in id_set)
    teleport = (PR_SCALE * 15 // 100) // n
    r = {d: PR_SCALE // n for d in ids}
    for _ in range(iters):
        s = Counter()
        for u, v in edges:
            if v in id_set:
                s[v] += r[u] // odeg[u]
        r = {d: teleport + (85 * s.get(d, 0)) // 100 for d in ids}
    return r, indeg


class TestPagerank:
    def test_matches_sequential_reference(self, tmp_path):
        from quarrycore_ray.pipelines.graph import link_pagerank_docs

        ids = list(range(37))
        sf = _write_ids(tmp_path, ids)
        out = link_pagerank_docs(sf).to_pandas().set_index("doc_id")
        ref_r, ref_ind = _seq_pagerank(ids)
        assert sorted(out.index) == ids
        for d in ids:
            assert out.loc[d, "pagerank_fx"] == ref_r[d], d
            assert out.loc[d, "in_degree"] == ref_ind.get(d, 0), d
        # rank mass sums to ~PR_SCALE (floor-division loss only)
        total = int(out["pagerank_fx"].sum())
        assert 0 <= 10**12 - total < 10**12 // 100

    def test_phantom_targets_dropped(self, tmp_path):
        # non-contiguous doc_ids: `% n` targets may not exist as docs;
        # those contributions vanish in engine and reference alike
        from quarrycore_ray.pipelines.graph import link_pagerank_docs

        ids = [0, 2, 5, 9, 14, 20, 27, 35]
        sf = _write_ids(tmp_path, ids)
        out = link_pagerank_docs(sf).to_pandas().set_index("doc_id")
        ref_r, ref_ind = _seq_pagerank(ids)
        assert sorted(out.index) == ids
        for d in ids:
            assert out.loc[d, "pagerank_fx"] == ref_r[d], d
            assert out.loc[d, "in_degree"] == ref_ind.get(d, 0), d

    def test_components_match_union_find(self, tmp_path):
        from quarrycore_ray.pipelines.graph import link_components_docs

        ids = list(range(23))
        sf = _write_ids(tmp_path, ids)
        out = link_components_docs(sf).to_pandas().set_index("doc_id")

        n = len(ids)
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for d in ids:
            for j in range(d % 3 + 1):
                a, b = find(d), find((d * 31 + j * 17 + 1) % n)
                if a != b:
                    parent[max(a, b)] = min(a, b)
        comp = {d: find(d) for d in ids}
        sizes = Counter(comp.values())
        assert sorted(out.index) == ids
        for d in ids:
            assert out.loc[d, "component_id"] == comp[d], d
            assert out.loc[d, "component_size"] == sizes[comp[d]], d

    def test_components_oracle_matches_engine(self, tmp_path):
        import duckdb

        from quarrycore_ray.pipelines.graph import (
            components_oracle_sql,
            link_components_docs,
        )

        ids = [0, 2, 5, 9, 14, 20, 27, 35]  # non-contiguous: phantom targets
        sf = _write_ids(tmp_path, ids)
        eng = (
            link_components_docs(sf)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
        )
        ora = con.execute(components_oracle_sql() + " ORDER BY doc_id").fetchdf()
        assert eng["doc_id"].tolist() == ora["doc_id"].tolist()
        assert eng["component_id"].tolist() == ora["component_id"].tolist()
        assert eng["component_size"].tolist() == ora["component_size"].tolist()

    def test_oracle_sql_matches_engine(self, tmp_path):
        import duckdb

        from quarrycore_ray.pipelines.graph import (
            link_pagerank_docs,
            pagerank_oracle_sql,
        )

        ids = list(range(53))
        sf = _write_ids(tmp_path, ids)
        eng = (
            link_pagerank_docs(sf)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
        )
        ora = con.execute(
            pagerank_oracle_sql() + " ORDER BY doc_id"
        ).fetchdf()
        assert eng["pagerank_fx"].tolist() == ora["pagerank_fx"].tolist()
        assert eng["in_degree"].tolist() == ora["in_degree"].tolist()
        assert str(eng["pagerank_fx"].dtype) == str(ora["pagerank_fx"].dtype)


class TestAssortativity:
    def test_matches_hand_moments(self, tmp_path):
        from quarrycore_ray.pipelines.graph import link_assortativity_docs

        ids = list(range(19))
        sf = _write_ids(tmp_path, ids)
        n = len(ids)
        edges = {(d, (d * 31 + j * 17 + 1) % n) for d in ids for j in range(d % 3 + 1)}
        odeg = Counter(s for s, _ in edges)
        indeg = Counter(t for _, t in edges)
        xs = [odeg[s] for s, t in sorted(edges)]
        ys = [indeg[t] for s, t in sorted(edges)]
        m = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        sxx = sum(a * a for a in xs)
        syy = sum(b * b for b in ys)
        out = link_assortativity_docs(sf).to_pandas().iloc[0]
        assert out["n_edges"] == m
        assert out["sxy_num"] == m * sxy - sx * sy
        assert out["varx_num"] == m * sxx - sx * sx
        assert out["vary_num"] == m * syy - sy * sy

    def test_oracle_matches_engine(self, tmp_path):
        import duckdb

        from quarrycore_ray.pipelines.graph import (
            assortativity_oracle_sql,
            link_assortativity_docs,
        )

        sf = _write_ids(tmp_path, list(range(31)))
        eng = link_assortativity_docs(sf).to_pandas()
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
        )
        ora = con.execute(assortativity_oracle_sql()).fetchdf()
        for c in ["n_edges", "sxy_num", "varx_num", "vary_num"]:
            assert eng[c].tolist() == ora[c].tolist(), c


class TestHits:
    @staticmethod
    def _seq_hits(ids, iters=3):
        from quarrycore_ray.pipelines.graph import HITS_SCALE

        n = len(ids)
        edges = {(d, (d * 31 + j * 17 + 1) % n) for d in ids for j in range(d % 3 + 1)}
        h = {d: HITS_SCALE for d in ids}
        a = {}
        for _ in range(iters):
            a = {}
            for u, v in edges:
                a[v] = a.get(v, 0) + h.get(u, 0)
            amax = max(a.values())
            a = {k: v * HITS_SCALE // amax for k, v in a.items()}
            h = {}
            for u, v in edges:
                h[u] = h.get(u, 0) + a.get(v, 0)
            hmax = max(h.values())
            h = {k: v * HITS_SCALE // hmax for k, v in h.items()}
        return h, a

    def test_matches_sequential_reference(self, tmp_path):
        from quarrycore_ray.pipelines.graph import link_hits_docs

        ids = list(range(29))
        sf = _write_ids(tmp_path, ids)
        out = link_hits_docs(sf).to_pandas().set_index("doc_id")
        h, a = self._seq_hits(ids)
        assert sorted(out.index) == ids
        for d in ids:
            assert out.loc[d, "hub_fx"] == h[d], d
            assert out.loc[d, "auth_fx"] == a.get(d, 0), d

    def test_oracle_matches_engine(self, tmp_path):
        import duckdb

        from quarrycore_ray.pipelines.graph import hits_oracle_sql, link_hits_docs

        sf = _write_ids(tmp_path, list(range(41)))
        eng = (
            link_hits_docs(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
        )
        ora = con.execute(hits_oracle_sql() + " ORDER BY doc_id").fetchdf()
        assert eng["hub_fx"].tolist() == ora["hub_fx"].tolist()
        assert eng["auth_fx"].tolist() == ora["auth_fx"].tolist()


class TestTriangles:
    @staticmethod
    def _brute(ids):
        n = len(ids)
        und = {
            (min(d, t), max(d, t))
            for d in ids
            for j in range(d % 3 + 1)
            for t in [(d * 31 + j * 17 + 1) % n]
            if d != t
        }
        nbrs: dict = {}
        for a, b in und:
            nbrs.setdefault(a, set()).add(b)
            nbrs.setdefault(b, set()).add(a)
        # enumerate each triangle x<y<z once, credit all three nodes
        tri = Counter()
        nodes = sorted(nbrs)
        for x, y in und:
            for z in nbrs[x] & nbrs[y]:
                if z > y > x:
                    tri[x] += 1
                    tri[y] += 1
                    tri[z] += 1
        deg = {v: len(nbrs.get(v, ())) for v in ids}
        return deg, tri

    def test_matches_brute_force(self, tmp_path):
        from quarrycore_ray.pipelines.graph import link_triangles_docs

        ids = list(range(41))
        sf = _write_ids(tmp_path, ids)
        out = link_triangles_docs(sf).to_pandas().set_index("doc_id")
        deg, tri = self._brute(ids)
        assert sorted(out.index) == ids
        for d in ids:
            assert out.loc[d, "degree"] == deg.get(d, 0), d
            assert out.loc[d, "triangles"] == tri.get(d, 0), d
        # total credit divisible by 3 and positive on this graph
        assert out["triangles"].sum() % 3 == 0
        assert out["triangles"].sum() > 0

    def test_no_self_loop_triangles(self, tmp_path):
        from quarrycore_ray.pipelines.graph import link_triangles_docs

        # n=1: the single node links only to itself -> no edges at all
        sf = _write_ids(tmp_path, [0])
        out = link_triangles_docs(sf).to_pandas()
        assert out["degree"].tolist() == [0]
        assert out["triangles"].tolist() == [0]


class TestLocalBspParity:
    """The small-graph single-task path and the distributed BSP path
    must be bit-identical (same auto-switch contract as the dedup
    clusterer's union-find <-> label-prop switch)."""

    def test_pagerank_paths_identical(self, tmp_path):
        from quarrycore_ray.pipelines.graph import link_pagerank_docs

        sf = _write_ids(tmp_path, list(range(53)))
        local = (
            link_pagerank_docs(sf).to_pandas().sort_values("doc_id")
            .reset_index(drop=True)
        )
        bsp = (
            link_pagerank_docs(sf, local_max=0).to_pandas()
            .sort_values("doc_id").reset_index(drop=True)
        )
        assert local.equals(bsp)

    def test_triangles_paths_identical(self, tmp_path):
        from quarrycore_ray.pipelines.graph import link_triangles_docs

        sf = _write_ids(tmp_path, list(range(53)))
        local = (
            link_triangles_docs(sf).to_pandas().sort_values("doc_id")
            .reset_index(drop=True)
        )
        bsp = (
            link_triangles_docs(sf, local_max=0).to_pandas()
            .sort_values("doc_id").reset_index(drop=True)
        )
        assert local.equals(bsp)

    def test_components_paths_identical(self, tmp_path):
        from quarrycore_ray.pipelines.graph import link_components_docs

        sf = _write_ids(tmp_path, [0, 2, 5, 9, 14, 20, 27, 35])
        local = (
            link_components_docs(sf).to_pandas().sort_values("doc_id")
            .reset_index(drop=True)
        )
        bsp = (
            link_components_docs(sf, local_max=0).to_pandas()
            .sort_values("doc_id").reset_index(drop=True)
        )
        assert local.equals(bsp)

    def test_hits_paths_identical(self, tmp_path):
        from quarrycore_ray.pipelines.graph import link_hits_docs

        sf = _write_ids(tmp_path, list(range(53)))
        local = (
            link_hits_docs(sf).to_pandas().sort_values("doc_id")
            .reset_index(drop=True)
        )
        bsp = (
            link_hits_docs(sf, local_max=0).to_pandas()
            .sort_values("doc_id").reset_index(drop=True)
        )
        assert local.equals(bsp)


class TestBfsLayers:
    @staticmethod
    def _seq_bfs(ids, max_depth=6):
        n = len(ids)
        edges = [
            (d, (d * 31 + j * 17 + 1) % n)
            for d in ids
            for j in range(d % 3 + 1)
        ]
        root = min(ids)
        depth = {root: 0}
        frontier = {root}
        for dd in range(1, max_depth + 1):
            nxt = {
                v for u, v in edges if u in frontier and v not in depth
            }
            for v in nxt:
                depth[v] = dd
            frontier = nxt
        return {k: v for k, v in depth.items() if k in set(ids)}

    def test_matches_sequential_bfs(self, tmp_path):
        from quarrycore_ray.pipelines.graph import link_bfs_layers

        ids = list(range(41))
        sf = _write_ids(tmp_path, ids)
        out = link_bfs_layers(sf).to_pandas().set_index("doc_id")["depth"]
        ref = self._seq_bfs(ids)
        assert out.to_dict() == ref
        assert ref[0] == 0  # the root

    def test_bfs_paths_identical(self, tmp_path):
        from quarrycore_ray.pipelines.graph import link_bfs_layers

        sf = _write_ids(tmp_path, [0, 2, 5, 9, 14, 20, 27, 35])
        local = (
            link_bfs_layers(sf).to_pandas().sort_values("doc_id")
            .reset_index(drop=True)
        )
        bsp = (
            link_bfs_layers(sf, local_max=0).to_pandas()
            .sort_values("doc_id").reset_index(drop=True)
        )
        assert local.equals(bsp)


class TestKCore:
    """R-round k-core peel (graph.link_kcore_docs): local/BSP parity,
    convergence against a brute-force peel, and monotone shrinkage."""

    @staticmethod
    def _brute(ids, k, rounds):
        n = len(ids)
        idset = set(ids)
        edges = set()
        for d in ids:
            for j in range(d % 3 + 1):
                t = (d * 31 + j * 17 + 1) % n
                if t in idset and t != d:
                    edges.add((min(d, t), max(d, t)))
        alive = set(ids)
        for _ in range(rounds):
            deg = {}
            for a, b in edges:
                if a in alive and b in alive:
                    deg[a] = deg.get(a, 0) + 1
                    deg[b] = deg.get(b, 0) + 1
            alive = {v for v in alive if deg.get(v, 0) >= k}
        deg = {}
        for a, b in edges:
            if a in alive and b in alive:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
        return {v: c for v, c in deg.items() if v in alive}

    def test_local_matches_bruteforce(self, tmp_path):
        from quarrycore_ray.pipelines.graph import link_kcore_docs

        ids = list(range(80))
        sf = _write_ids(tmp_path, ids)
        out = link_kcore_docs(sf, k=3, rounds=4).to_pandas()
        got = dict(zip(out["doc_id"], out["core_deg"]))
        assert got == self._brute(ids, 3, 4)

    def test_paths_identical(self, tmp_path):
        from quarrycore_ray.pipelines.graph import link_kcore_docs

        sf = _write_ids(tmp_path, list(range(53)))
        local = (
            link_kcore_docs(sf).to_pandas().sort_values("doc_id")
            .reset_index(drop=True)
        )
        bsp = (
            link_kcore_docs(sf, local_max=0).to_pandas()
            .sort_values("doc_id").reset_index(drop=True)
        )
        assert local.equals(bsp)

    def test_monotone_and_converged(self, tmp_path):
        from quarrycore_ray.pipelines.graph import link_kcore_docs

        ids = list(range(120))
        sf = _write_ids(tmp_path, ids)
        sizes = [
            len(link_kcore_docs(sf, k=3, rounds=r).to_pandas())
            for r in (1, 3, 6)
        ]
        assert sizes[0] >= sizes[1] >= sizes[2]
        # a generous round budget reaches the true (converged) k-core
        deep = link_kcore_docs(sf, k=3, rounds=40).to_pandas()
        got = dict(zip(deep["doc_id"], deep["core_deg"]))
        assert got == self._brute(ids, 3, 40)
        # converged: one more round changes nothing
        again = link_kcore_docs(sf, k=3, rounds=41).to_pandas()
        assert dict(zip(again["doc_id"], again["core_deg"])) == got
