"""Join/window/distinct operators added on top of the round-1 relational
surface (pipelines/relational.py, pipelines/documents.py): tagged-union
anti-join, TPC-H-Q3-shaped multi-way join with a top-k combiner, per-user
lag windows, exact distinct-count per group, and per-group exact
quantiles — all on planted fixtures with hand-computed expectations."""

import datetime as dt

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write(tmp_path, name: str, table: pa.Table) -> None:
    pq.write_table(table, str(tmp_path / f"{name}.parquet"))


class TestAntiJoin:
    def test_customers_without_recent_orders(self, tmp_path):
        from quarrycore_ray.pipelines.relational import (
            customers_without_recent_orders,
        )

        _write(
            tmp_path,
            "customer",
            pa.table(
                {
                    "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
                    "c_name": pa.array(["a", "b", "c", "d"], pa.string()),
                    "c_acctbal": pa.array([1.0, 2.0, 3.0, 4.0], pa.float64()),
                }
            ),
        )
        old, new = dt.datetime(2000, 1, 1), dt.datetime(2001, 6, 1)
        _write(
            tmp_path,
            "orders",
            pa.table(
                {
                    # cust 1: recent order -> excluded; cust 2: only old
                    # orders -> kept; cust 3: old AND recent -> excluded;
                    # cust 4: no orders at all -> kept
                    "o_custkey": pa.array([1, 2, 2, 3, 3], pa.int64()),
                    "o_orderdate": pa.array([new, old, old, old, new],
                                            pa.timestamp("us")),
                }
            ),
        )
        out = (
            customers_without_recent_orders(str(tmp_path), cutoff="2001-01-01")
            .to_pandas()
            .sort_values("c_custkey")
            .reset_index(drop=True)
        )
        assert out["c_custkey"].tolist() == [2, 4]
        assert out["c_name"].tolist() == ["b", "d"]


class TestTopRevenueOrders:
    def test_planted_q3(self, tmp_path):
        from quarrycore_ray.pipelines.relational import top_revenue_orders

        _write(
            tmp_path,
            "customer",
            pa.table(
                {
                    "c_custkey": pa.array([1, 2], pa.int64()),
                    "c_mktsegment": pa.array(["BUILDING", "AUTOMOBILE"],
                                             pa.string()),
                }
            ),
        )
        before, after = dt.datetime(1997, 6, 1), dt.datetime(1998, 6, 1)
        _write(
            tmp_path,
            "orders",
            pa.table(
                {
                    # order 10: qualifies (BUILDING cust, placed before cutoff)
                    # order 11: wrong segment; order 12: placed after cutoff
                    "o_orderkey": pa.array([10, 11, 12], pa.int64()),
                    "o_custkey": pa.array([1, 2, 1], pa.int64()),
                    "o_orderdate": pa.array([before, before, after],
                                            pa.timestamp("us")),
                    "o_orderpriority": pa.array(["1-HI", "2-LO", "1-HI"],
                                                pa.string()),
                }
            ),
        )
        _write(
            tmp_path,
            "lineitem",
            pa.table(
                {
                    # order 10: two qualifying items (10*0.9 + 20*1.0 = 29)
                    # plus one shipped too early (ignored); order 11 would
                    # have revenue but its order fails the segment filter
                    "l_orderkey": pa.array([10, 10, 10, 11], pa.int64()),
                    "l_extendedprice": pa.array([10.0, 20.0, 99.0, 50.0],
                                                pa.float64()),
                    "l_discount": pa.array([0.1, 0.0, 0.0, 0.0], pa.float64()),
                    "l_shipdate": pa.array([after, after, before, after],
                                           pa.timestamp("us")),
                }
            ),
        )
        out = top_revenue_orders(str(tmp_path), segment="BUILDING",
                                 cutoff="1998-01-01", k=5)
        assert out["o_orderkey"].tolist() == [10]
        assert out["revenue"].tolist() == [29.0]
        assert out["o_orderpriority"].tolist() == ["1-HI"]


class TestInterarrival:
    def test_gaps_and_ties(self, tmp_path):
        from quarrycore_ray.pipelines.relational import events_interarrival

        t = dt.datetime(2024, 1, 1)
        s = dt.timedelta(seconds=1)
        _write(
            tmp_path,
            "events",
            pa.table(
                {
                    "event_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
                    "user_id": pa.array([1, 1, 1, 2, 1], pa.int64()),
                    # user 1: t, t+1s, t+1s (tie -> event_id order), t+3s
                    "ts": pa.array([t, t + s, t + s, t, t + 3 * s],
                                   pa.timestamp("us")),
                }
            ),
        )
        out = (
            events_interarrival(str(tmp_path))
            .to_pandas()
            .set_index("event_id")
            .sort_index()
        )
        assert pd.isna(out.loc[0, "gap_us"])      # user 1 first event
        assert out.loc[1, "gap_us"] == 1_000_000
        assert out.loc[2, "gap_us"] == 0          # ts tie, later event_id
        assert pd.isna(out.loc[3, "gap_us"])      # user 2 first event
        assert out.loc[4, "gap_us"] == 2_000_000


class TestDistinctUsers:
    def test_duplicate_pairs_counted_once(self, tmp_path):
        from quarrycore_ray.pipelines.relational import event_type_distinct_users

        t = dt.datetime(2024, 1, 1)
        _write(
            tmp_path,
            "events",
            pa.table(
                {
                    "event_id": pa.array(list(range(6)), pa.int64()),
                    "user_id": pa.array([1, 1, 2, 3, 3, 3], pa.int64()),
                    "event_type": pa.array(
                        ["a", "a", "a", "b", "b", "a"], pa.string()
                    ),
                    "ts": pa.array([t] * 6, pa.timestamp("us")),
                }
            ),
        )
        out = (
            event_type_distinct_users(str(tmp_path))
            .to_pandas()
            .set_index("event_type")
        )
        assert out.loc["a", "n_users"] == 3   # users 1, 2, 3
        assert out.loc["b", "n_users"] == 1   # user 3


class TestQuantilesBySource:
    def test_hand_computed(self, tmp_path):
        from quarrycore_ray.pipelines.documents import length_quantiles_by_source

        # source a: lengths 1..10 -> q.5 at floor(9*.5)=4 -> 5
        # source b: lengths [2, 4] -> q.5 at floor(1*.5)=0 -> 2, q.9 -> 2
        _write(
            tmp_path,
            "documents",
            pa.table(
                {
                    "doc_id": pa.array(list(range(12)), pa.int64()),
                    "source": pa.array(["a"] * 10 + ["b"] * 2, pa.string()),
                    "n_chars": pa.array(list(range(1, 11)) + [2, 4], pa.int64()),
                }
            ),
        )
        out = (
            length_quantiles_by_source(str(tmp_path))
            .to_pandas()
            .set_index(["source", "q"])
            .sort_index()
        )
        assert out.loc[("a", 0.25), "n_chars"] == 3
        assert out.loc[("a", 0.5), "n_chars"] == 5
        assert out.loc[("a", 0.9), "n_chars"] == 9
        assert out.loc[("b", 0.5), "n_chars"] == 2
        assert out.loc[("b", 0.9), "n_chars"] == 2  # floor((2-1)*0.9) = 0 -> first value


class TestTopTerms:
    def _write_zipf(self, tmp_path):
        # zipf-ish corpus: term_i appears ~200/i times; heavy head far
        # above the MG bound N/capacity so the two-pass sketch is exact
        texts = []
        words = []
        for i in range(1, 101):
            words.extend([f"w{i:03d}"] * (200 // i))
        for start in range(0, len(words), 40):
            texts.append(" ".join(words[start:start + 40]))
        tb = pa.table(
            {
                "doc_id": pa.array(list(range(len(texts))), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
        pq.write_table(tb, str(tmp_path / "documents.parquet"))
        return str(tmp_path)

    def test_exact_top_and_ties(self, tmp_path):
        from quarrycore_ray.pipelines.documents import top_terms

        sf = self._write_zipf(tmp_path)
        out = top_terms(sf, k=5)
        assert out["token"].tolist()[:2] == ["w001", "w002"]
        assert out["n"].tolist()[0] == 200
        assert out["n"].tolist()[1] == 100
        # counts are non-increasing; ties broken by token asc
        assert all(a >= b for a, b in zip(out["n"], out["n"][1:]))

    def test_sketch_matches_exact(self, tmp_path):
        from quarrycore_ray.pipelines.documents import top_terms

        sf = self._write_zipf(tmp_path)
        exact = top_terms(sf, k=10, method="exact")
        sketched = top_terms(sf, k=10, method="sketch")
        pd.testing.assert_frame_equal(exact, sketched)


class TestMisraGries:
    def test_undercount_bound_and_merge(self):
        from quarrycore_ray.functions.sketches import MisraGries

        import collections
        import random

        rng = random.Random(7)
        stream = [f"k{rng.randint(0, 400):03d}" for _ in range(5000)]
        stream += ["hot"] * 500
        rng.shuffle(stream)
        truth = collections.Counter(stream)
        n_total = len(stream)

        # two sketches over two halves, merged — simulates per-batch
        # sketches combined on the driver
        half = n_total // 2
        a, b = MisraGries(capacity=64), MisraGries(capacity=64)
        ca, cb = collections.Counter(stream[:half]), collections.Counter(stream[half:])
        a.update_many(list(ca), list(ca.values()))
        b.update_many(list(cb), list(cb.values()))
        m = a.merge(b)

        bound = n_total / 64
        # every key above the bound must be present
        for k, n in truth.items():
            if n > bound:
                assert k in m.counters
        # sketch never overcounts, and undercounts by at most the bound
        for k, v in m.counters.items():
            assert v <= truth[k]
            assert truth[k] - v <= bound


class TestCube:
    def test_four_grouping_sets(self, tmp_path):
        from quarrycore_ray.pipelines.relational import orders_cube

        _write(
            tmp_path,
            "orders",
            pa.table(
                {
                    "o_orderkey": pa.array([1, 2, 3], pa.int64()),
                    "o_orderstatus": pa.array(["O", "O", "F"], pa.string()),
                    "o_totalprice": pa.array([10.5, 20.25, 1.0], pa.float64()),
                    "o_orderpriority": pa.array(["1-HI", "2-LO", "1-HI"],
                                                pa.string()),
                }
            ),
        )
        out = orders_cube(str(tmp_path))
        # 3 fine + 2 by-status + 2 by-priority + 1 grand = 8
        assert len(out) == 8
        grand = out[out.o_orderstatus.isna() & out.o_orderpriority.isna()]
        assert grand["sum_price"].tolist() == [31.75]
        hi = out[out.o_orderstatus.isna() & (out.o_orderpriority == "1-HI")]
        assert hi["n_orders"].tolist() == [2]
        assert hi["sum_price"].tolist() == [11.5]


class TestAttachLookup:
    def test_broadcast_and_partitioned_agree(self):
        import ray.data as rd

        from quarrycore_ray.stages.grouped import attach_lookup

        left_schema = pa.schema(
            [("a_id", pa.int64()), ("b_id", pa.int64()), ("x", pa.int64())]
        )
        left_tb = pa.table(
            {
                "a_id": pa.array([1, 2, 3, 7], pa.int64()),   # 7 misses
                "b_id": pa.array([2, 3, 1, 1], pa.int64()),
                "x": pa.array([10, 20, 30, 40], pa.int64()),
            }
        )
        lookup_tb = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "n": pa.array([100, 200, 300], pa.int64()),
            }
        )

        def run(limit):
            out = attach_lookup(
                rd.from_arrow(left_tb),
                left_schema,
                ["a_id", "b_id"],
                rd.from_arrow(lookup_tb),
                "doc_id",
                "n",
                pa.int64(),
                ["na", "nb"],
                broadcast_limit=limit,
            )
            return (
                out.to_pandas()
                .sort_values(["a_id", "b_id"])
                .reset_index(drop=True)
            )

        bcast = run(1_000_000)   # broadcast fast path
        part = run(0)            # forced tagged-union partitioned join
        pd.testing.assert_frame_equal(bcast, part)
        assert bcast["na"].tolist()[:3] == [100, 200, 300]
        assert pd.isna(bcast["na"].iloc[3])
        assert bcast.loc[0, "nb"] == 200


class TestDuplicateTurns:
    def test_cross_conv_turn_counting(self):
        import ray.data as rd

        from quarrycore_ray.pipelines.dedup import duplicate_turns

        tb = pa.table(
            {
                "conv_id": pa.array(
                    ["a", "a", "a", "b", "b", "c"], pa.string()
                ),
                # "hello" in convs a+b (a has it twice -> counted once);
                # "bye" only in conv a; "hm" in b+c
                "text": pa.array(
                    ["hello", "hello", "bye", "hello", "hm", "hm"], pa.string()
                ),
            }
        )
        out = (
            duplicate_turns(rd.from_arrow(tb))
            .to_pandas()
            .set_index("turn_text")
            .sort_index()
        )
        assert list(out.index) == ["hello", "hm"]
        assert out.loc["hello", "n_convs"] == 2
        assert out.loc["hm", "n_convs"] == 2


class TestApproxQuantiles:
    def test_matches_exact_within_tolerance(self):
        import numpy as np

        import ray.data as rd

        from quarrycore_ray.functions.sketches import approx_quantiles

        # deterministic skewed data: exact quantiles known from sorting
        rng = np.random.RandomState(3)
        vals = np.concatenate([rng.exponential(100, 5000), rng.normal(1000, 50, 2000)])
        tb = pa.table({"x": pa.array(vals, pa.float64())})
        est = approx_quantiles(rd.from_arrow(tb), "x", qs=(0.25, 0.5, 0.9))
        s = np.sort(vals)
        n = len(s)
        for q, e in est.items():
            true_val = s[int(np.floor((n - 1) * q))]
            # rank error bound: estimate's rank within ~2*n/capacity
            rank = np.searchsorted(s, e)
            assert abs(rank - q * n) <= 2 * n / 512 + 8, (q, e, true_val)


class TestHoppingWindow:
    def test_each_event_in_two_windows(self, tmp_path):
        from quarrycore_ray.pipelines.relational import events_hopping_window

        t = dt.datetime(2024, 1, 1, 5, 30)  # window starts 05:00 and 04:00
        _write(
            tmp_path,
            "events",
            pa.table(
                {
                    "event_id": pa.array([0, 1], pa.int64()),
                    "ts": pa.array([t, t], pa.timestamp("us")),
                    "event_type": pa.array(["a", "a"], pa.string()),
                }
            ),
        )
        out = (
            events_hopping_window(str(tmp_path))
            .to_pandas()
            .sort_values("window_start")
            .reset_index(drop=True)
        )
        assert len(out) == 2
        assert out["window_start"].tolist() == [
            dt.datetime(2024, 1, 1, 4), dt.datetime(2024, 1, 1, 5)
        ]
        assert out["n_events"].tolist() == [2, 2]


class TestWeightedSample:
    def test_matches_bruteforce_priorities(self, tmp_path):
        import hashlib

        import numpy as np

        from quarrycore_ray.pipelines.dataset import weighted_sample_docs

        ids = list(range(40))
        chars = [(i * 37) % 500 + 1 for i in ids]
        _write(
            tmp_path,
            "documents",
            pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "n_chars": pa.array(chars, pa.int64()),
                }
            ),
        )
        out = weighted_sample_docs(str(tmp_path), k=5)
        # brute-force reference: same deterministic priority, k smallest
        pri = {
            d: (int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16) / 2**32)
            / max(c, 1)
            for d, c in zip(ids, chars)
        }
        expect = sorted(ids, key=lambda d: (pri[d], d))[:5]
        assert out["doc_id"].tolist() == expect
        assert (np.diff(out["priority"]) >= 0).all()


class TestLengthOutliers:
    def test_hand_computed_mad(self, tmp_path):
        from quarrycore_ray.pipelines.documents import length_outliers

        # source a: lengths [10,10,10,10,100] -> med 10, devs [0,0,0,0,90]
        # -> MAD 0 -> doc 4 (dev 90 > 0) is the only outlier
        # source b: [5,6,7] -> med 6, devs [1,0,1] -> MAD 1 -> none (>3)
        _write(
            tmp_path,
            "documents",
            pa.table(
                {
                    "doc_id": pa.array(list(range(8)), pa.int64()),
                    "source": pa.array(["a"] * 5 + ["b"] * 3, pa.string()),
                    "n_chars": pa.array([10, 10, 10, 10, 100, 5, 6, 7],
                                        pa.int64()),
                }
            ),
        )
        out = length_outliers(str(tmp_path)).to_pandas()
        assert out["doc_id"].tolist() == [4]
        assert out["dev"].tolist() == [90]


class TestLabelScatter:
    def test_hand_computed(self, tmp_path):
        from quarrycore_ray.functions.similarity import label_scatter

        # label 7: vecs (0,0) and (2,2) -> centroid (1,1), each vec at
        # squared distance 2 -> mean 2.0; label 8: single vec -> 0.0
        tb = pa.table(
            {
                "vec_id": pa.array([0, 1, 2], pa.int64()),
                "embedding": pa.array(
                    [[0.0, 0.0], [2.0, 2.0], [5.0, 5.0]],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array([7, 7, 8], pa.int32()),
            }
        )
        pq.write_table(tb, str(tmp_path / "embeddings.parquet"))
        out = (
            label_scatter(str(tmp_path))
            .to_pandas()
            .set_index("label")
            .sort_index()
        )
        assert out.loc[7, "n_vecs"] == 2
        assert out.loc[7, "mean_sq_dist"] == 2.0
        assert out.loc[8, "mean_sq_dist"] == 0.0


class TestLeftOuterJoin:
    def test_customer_order_totals_full(self, tmp_path):
        from quarrycore_ray.pipelines.relational import customer_order_totals_full

        _write(
            tmp_path,
            "customer",
            pa.table(
                {
                    "c_custkey": pa.array([1, 2, 3], pa.int64()),
                    "c_name": pa.array(["a", "b", "c"], pa.string()),
                }
            ),
        )
        _write(
            tmp_path,
            "orders",
            pa.table(
                {
                    # cust 1: two orders; cust 2: none; cust 3: one order
                    "o_custkey": pa.array([1, 1, 3], pa.int64()),
                    "o_totalprice": pa.array([10.5, 20.25, 5.0], pa.float64()),
                }
            ),
        )
        out = (
            customer_order_totals_full(str(tmp_path))
            .to_pandas()
            .set_index("c_custkey")
            .sort_index()
        )
        assert list(out.index) == [1, 2, 3]
        assert out.loc[1, "n_orders"] == 2 and out.loc[1, "total_spent"] == 30.75
        # the outer side: zero orders, zero spend — row still present
        assert out.loc[2, "n_orders"] == 0 and out.loc[2, "total_spent"] == 0.0
        assert out.loc[3, "n_orders"] == 1 and out.loc[3, "total_spent"] == 5.0


class TestFunnelConversions:
    def test_window_boundaries(self, tmp_path):
        from quarrycore_ray.pipelines.relational import funnel_conversions

        base = dt.datetime(2024, 1, 1, 12, 0, 0)
        m = dt.timedelta(minutes=1)
        _write(
            tmp_path,
            "events",
            pa.table(
                {
                    "event_id": pa.array(list(range(8)), pa.int64()),
                    "user_id": pa.array([1, 1, 1, 1, 2, 2, 3, 3], pa.int64()),
                    "event_type": pa.array(
                        # u1: view, click(+5m, conv), click(+40m, stale),
                        #     view-free click later handled by ffill chain
                        ["view", "click", "click", "other",
                         # u2: click BEFORE any view -> not converted
                         "click", "view",
                         # u3: view and click same instant -> converted
                         "view", "click"],
                        pa.string(),
                    ),
                    "ts": pa.array(
                        [base, base + 5 * m, base + 40 * m, base + 41 * m,
                         base, base + 1 * m,
                         base, base],
                        pa.timestamp("us"),
                    ),
                }
            ),
        )
        out = (
            funnel_conversions(str(tmp_path), window_minutes=30)
            .to_pandas()
            .set_index("user_id")
            .sort_index()
        )
        assert out.loc[1, "n_clicks"] == 2 and out.loc[1, "n_converted"] == 1
        assert out.loc[2, "n_clicks"] == 1 and out.loc[2, "n_converted"] == 0
        # same-instant view counts (v.ts <= c.ts)
        assert out.loc[3, "n_clicks"] == 1 and out.loc[3, "n_converted"] == 1


class TestCohortRetention:
    def test_cohorts_offsets_and_distinct_users(self, tmp_path):
        from quarrycore_ray.pipelines.relational import cohort_retention

        wk = dt.timedelta(days=7)
        w0 = dt.datetime(2024, 1, 1)  # all within one epoch-week bucket? use exact week starts
        # align to epoch weeks: pick timestamps well inside weeks
        _write(
            tmp_path,
            "events",
            pa.table(
                {
                    "user_id": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
                    # u1: first week w0, returns in w0 (twice!) and w0+2
                    # u2: first week w0+1, returns w0+2
                    # u3: only w0
                    "ts": pa.array(
                        [w0, w0 + dt.timedelta(days=1), w0 + 2 * wk,
                         w0 + wk, w0 + 2 * wk,
                         w0],
                        pa.timestamp("us"),
                    ),
                }
            ),
        )
        out = (
            cohort_retention(str(tmp_path))
            .to_pandas()
            .set_index(["cohort_week", "week_offset"])
            .sort_index()
        )
        c0 = int(out.index[0][0])
        # cohort c0 (u1, u3): offset 0 has both; u1's two same-week events
        # count once; offset 2 has u1 only
        assert out.loc[(c0, 0), "n_users"] == 2
        assert out.loc[(c0, 2), "n_users"] == 1
        # cohort c0+1 (u2): offsets 0 and 1
        assert out.loc[(c0 + 1, 0), "n_users"] == 1
        assert out.loc[(c0 + 1, 1), "n_users"] == 1
        assert len(out) == 4


class TestPromoAndRegion:
    def test_promo_share_hand_computed(self, tmp_path):
        from quarrycore_ray.pipelines.relational import promo_revenue_share

        _write(
            tmp_path,
            "part",
            pa.table(
                {
                    "p_partkey": pa.array([1, 2], pa.int64()),
                    "p_type": pa.array(["PROMO", "STANDARD"], pa.string()),
                }
            ),
        )
        _write(
            tmp_path,
            "lineitem",
            pa.table(
                {
                    "l_partkey": pa.array([1, 2], pa.int64()),
                    "l_extendedprice": pa.array([100.0, 300.0], pa.float64()),
                    "l_discount": pa.array([0.0, 0.0], pa.float64()),
                }
            ),
        )
        out = promo_revenue_share(str(tmp_path)).iloc[0]
        assert out.promo_revenue == 100.0
        assert out.total_revenue == 400.0
        assert abs(out.promo_share - 25.0) < 1e-6

    def test_region_chain_counts(self, tmp_path):
        from quarrycore_ray.pipelines.relational import region_supplier_counts

        _write(
            tmp_path,
            "region",
            pa.table(
                {
                    "r_regionkey": pa.array([0, 1], pa.int64()),
                    "r_name": pa.array(["ASIA", "EUROPE"], pa.string()),
                }
            ),
        )
        _write(
            tmp_path,
            "nation",
            pa.table(
                {
                    "n_nationkey": pa.array([10, 11, 12], pa.int64()),
                    "n_regionkey": pa.array([0, 0, 1], pa.int64()),
                }
            ),
        )
        _write(
            tmp_path,
            "supplier",
            pa.table({"s_nationkey": pa.array([10, 11, 11, 12], pa.int64())}),
        )
        out = (
            region_supplier_counts(str(tmp_path))
            .to_pandas()
            .set_index("r_name")
        )
        assert out.loc["ASIA", "n_suppliers"] == 3
        assert out.loc["EUROPE", "n_suppliers"] == 1


class TestEventsWindowDedup:
    def test_keep_first_per_hour_window(self, tmp_path):
        from quarrycore_ray.pipelines.relational import events_window_dedup

        h5, h6 = dt.datetime(2024, 1, 1, 5), dt.datetime(2024, 1, 1, 6)
        rows = [
            # three dups of (u1, click) inside hour 5 -> earliest ts wins
            (0, h5.replace(minute=10), 1, "click"),
            (1, h5.replace(minute=5), 1, "click"),
            (2, h5.replace(minute=50), 1, "click"),
            # same user+type in the NEXT window survives separately
            (3, h6.replace(minute=1), 1, "click"),
            # same window, different type -> kept
            (4, h5.replace(minute=20), 1, "purchase"),
            # same window+type, different user -> kept
            (5, h5.replace(minute=30), 2, "click"),
            # exact ts tie -> min event_id wins
            (7, h6.replace(minute=30), 2, "view"),
            (6, h6.replace(minute=30), 2, "view"),
        ]
        _write(
            tmp_path,
            "events",
            pa.table(
                {
                    "event_id": pa.array([r[0] for r in rows], pa.int64()),
                    "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                    "user_id": pa.array([r[2] for r in rows], pa.int64()),
                    "event_type": pa.array([r[3] for r in rows], pa.string()),
                }
            ),
        )
        out = (
            events_window_dedup(str(tmp_path))
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        assert out["event_id"].tolist() == [1, 3, 4, 5, 6]
        kept = out[out["event_id"] == 1].iloc[0]
        assert kept["window_start"] == h5


class TestOrderCountDistribution:
    """TPC-H-Q13-shaped count-of-counts histogram
    (relational.customer_order_count_distribution): zero bucket kept."""

    def test_zero_bucket_and_counts(self, tmp_path):
        from quarrycore_ray.pipelines.relational import (
            customer_order_count_distribution,
        )

        _write(
            tmp_path,
            "customer",
            pa.table(
                {
                    "c_custkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
                    "c_name": pa.array(list("abcde"), pa.string()),
                }
            ),
        )
        # cust 1: 3 orders, cust 2: 1, cust 3: 1, cust 4/5: none
        _write(
            tmp_path,
            "orders",
            pa.table(
                {
                    "o_custkey": pa.array([1, 1, 1, 2, 3], pa.int64()),
                    "o_totalprice": pa.array([10.0] * 5, pa.float64()),
                }
            ),
        )
        out = (
            customer_order_count_distribution(str(tmp_path))
            .to_pandas()
            .sort_values("n_orders")
            .reset_index(drop=True)
        )
        assert dict(zip(out["n_orders"], out["n_customers"])) == {
            0: 2,
            1: 2,
            3: 1,
        }


class TestLargeVolumeOrders:
    """TPC-H-Q18-shaped large-volume orders
    (relational.large_volume_orders): integer micro-unit threshold,
    deterministic (price DESC, date, orderkey) top-k."""

    def test_threshold_join_and_order(self, tmp_path):
        from quarrycore_ray.pipelines.relational import large_volume_orders

        d = dt.datetime(2001, 3, 1)
        _write(
            tmp_path,
            "lineitem",
            pa.table(
                {
                    # order 10: qty 7 (> 5); order 20: qty 5 (== 5,
                    # excluded: strict >); order 30: qty 6 (> 5)
                    "l_orderkey": pa.array([10, 10, 20, 30], pa.int64()),
                    "l_quantity": pa.array([3.0, 4.0, 5.0, 6.0], pa.float64()),
                }
            ),
        )
        _write(
            tmp_path,
            "orders",
            pa.table(
                {
                    "o_orderkey": pa.array([10, 20, 30], pa.int64()),
                    "o_custkey": pa.array([1, 1, 2], pa.int64()),
                    "o_orderdate": pa.array([d, d, d], pa.timestamp("us")),
                    # order 30 outranks order 10 by price
                    "o_totalprice": pa.array([100.0, 500.0, 200.0],
                                             pa.float64()),
                }
            ),
        )
        _write(
            tmp_path,
            "customer",
            pa.table(
                {
                    "c_custkey": pa.array([1, 2], pa.int64()),
                    "c_name": pa.array(["alice", "bob"], pa.string()),
                }
            ),
        )
        out = large_volume_orders(str(tmp_path), qty_threshold=5, k=10)
        assert out["o_orderkey"].tolist() == [30, 10]
        assert out["c_name"].tolist() == ["bob", "alice"]
        assert out["sum_qty"].tolist() == [6.0, 7.0]

    def test_top_k_truncation(self, tmp_path):
        from quarrycore_ray.pipelines.relational import large_volume_orders

        d = dt.datetime(2001, 3, 1)
        n = 7
        _write(
            tmp_path,
            "lineitem",
            pa.table(
                {
                    "l_orderkey": pa.array(list(range(n)), pa.int64()),
                    "l_quantity": pa.array([9.0] * n, pa.float64()),
                }
            ),
        )
        _write(
            tmp_path,
            "orders",
            pa.table(
                {
                    "o_orderkey": pa.array(list(range(n)), pa.int64()),
                    "o_custkey": pa.array([1] * n, pa.int64()),
                    "o_orderdate": pa.array([d] * n, pa.timestamp("us")),
                    # equal prices: the orderkey tie-break decides
                    "o_totalprice": pa.array([50.0] * n, pa.float64()),
                }
            ),
        )
        _write(
            tmp_path,
            "customer",
            pa.table(
                {
                    "c_custkey": pa.array([1], pa.int64()),
                    "c_name": pa.array(["c"], pa.string()),
                }
            ),
        )
        out = large_volume_orders(str(tmp_path), qty_threshold=5, k=3)
        assert out["o_orderkey"].tolist() == [0, 1, 2]


class TestFunnel3:
    """Three-step ordered funnel (relational.events_funnel3): EXISTS
    chain semantics through latest qualifying predecessors."""

    @staticmethod
    def _events(tmp_path, rows):
        _write(
            tmp_path,
            "events",
            pa.table(
                {
                    "event_id": pa.array(
                        list(range(len(rows))), pa.int64()
                    ),
                    "user_id": pa.array([r[0] for r in rows], pa.int64()),
                    "event_type": pa.array([r[1] for r in rows], pa.string()),
                    "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
                }
            ),
        )
        return str(tmp_path)

    def test_chains_and_window(self, tmp_path):
        from quarrycore_ray.pipelines.relational import events_funnel3

        t0 = dt.datetime(2001, 5, 1, 12, 0, 0)
        m = lambda k: t0 + dt.timedelta(minutes=k)  # noqa: E731
        rows = [
            # user 1: clean chain within the hour
            (1, "view", m(0)), (1, "click", m(10)), (1, "purchase", m(30)),
            # user 2: chain exists ONLY through the later view
            # (view@0 -> click@50 -> purchase@70 misses the 60-min window,
            # but view@45 -> click@50 -> purchase@70 completes)
            (2, "view", m(0)), (2, "view", m(45)),
            (2, "click", m(50)), (2, "purchase", m(70)),
            # user 3: purchase BEFORE the click -> pair only
            (3, "view", m(0)), (3, "purchase", m(5)), (3, "click", m(10)),
            # user 4: click before any view -> view step only
            (4, "click", m(0)), (4, "view", m(5)),
            # user 5: no view at all
            (5, "click", m(0)), (5, "purchase", m(1)),
        ]
        out = events_funnel3(self._events(tmp_path, rows), window_minutes=60)
        got = dict(zip(out["step"], out["n_users"]))
        assert got == {
            "view": 4,
            "view>click": 3,
            "view>click>purchase": 2,
        }

    def test_window_boundary_inclusive(self, tmp_path):
        from quarrycore_ray.pipelines.relational import events_funnel3

        t0 = dt.datetime(2001, 5, 1)
        rows = [
            (1, "view", t0),
            (1, "click", t0 + dt.timedelta(minutes=30)),
            # exactly at the window edge: <= keeps it
            (1, "purchase", t0 + dt.timedelta(minutes=60)),
            (2, "view", t0),
            (2, "click", t0 + dt.timedelta(minutes=30)),
            (2, "purchase", t0 + dt.timedelta(minutes=60, microseconds=1)),
        ]
        out = events_funnel3(self._events(tmp_path, rows), window_minutes=60)
        got = dict(zip(out["step"], out["n_users"]))
        assert got["view>click>purchase"] == 1
