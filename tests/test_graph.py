"""PageRank (actor-sharded power iteration) vs a dense NumPy reference,
plus structural properties (star-hub ordering, shard-count invariance,
isolated-vertex baseline)."""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


def _edges_ds(e: np.ndarray) -> rd.Dataset:
    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array(e[:, 0], pa.int64()),
                "dst": pa.array(e[:, 1], pa.int64()),
            }
        )
    )


def _nodes_ds(n: np.ndarray) -> rd.Dataset:
    return rd.from_arrow(pa.table({"node": pa.array(n, pa.int64())}))


class TestPageRank:
    def test_star_graph_hub_ranks_highest(self, ray_session):
        from crossai_ts_ray.pipelines.graph import pagerank

        # 1..8 all point at 0; 0 is dangling
        e = np.array([[i, 0] for i in range(1, 9)], np.int64)
        res = pd.DataFrame(
            pagerank(_edges_ds(e), _nodes_ds(np.arange(9)), shards=4)
            .take_all()
        ).set_index("node")["rank"]
        assert res.idxmax() == 0
        leaves = res.drop(0)
        assert np.allclose(leaves, leaves.iloc[0])
        assert abs(res.sum() - 1.0) < 1e-4

    def test_matches_dense_reference_random_graph(self, ray_session):
        from crossai_ts_ray.pipelines.graph import (
            pagerank,
            pagerank_numpy_reference,
        )

        rng = np.random.default_rng(11)
        nodes = np.arange(200)
        e = rng.integers(0, 200, size=(800, 2)).astype(np.int64)
        res = pd.DataFrame(
            pagerank(_edges_ds(e), _nodes_ds(nodes), shards=8).take_all()
        )
        ref = pagerank_numpy_reference(e, nodes)
        got = dict(zip(res["node"], res["rank"]))
        for v in nodes:
            assert abs(got[int(v)] - round(ref[int(v)], 6)) <= 1e-6

    def test_shard_count_invariance(self, ray_session):
        from crossai_ts_ray.pipelines.graph import pagerank

        rng = np.random.default_rng(5)
        nodes = np.arange(150)
        e = rng.integers(0, 150, size=(500, 2)).astype(np.int64)
        a = pd.DataFrame(
            pagerank(_edges_ds(e), _nodes_ds(nodes), shards=3).take_all()
        ).sort_values("node").reset_index(drop=True)
        b = pd.DataFrame(
            pagerank(_edges_ds(e), _nodes_ds(nodes), shards=8).take_all()
        ).sort_values("node").reset_index(drop=True)
        assert np.allclose(a["rank"], b["rank"], atol=2e-6)

    def test_isolated_vertices_keep_uniform_baseline(self, ray_session):
        from crossai_ts_ray.pipelines.graph import pagerank

        # no edges at all: every node keeps rank 1/N
        res = pd.DataFrame(
            pagerank(
                _edges_ds(np.zeros((0, 2), np.int64)),
                _nodes_ds(np.arange(10)),
                shards=2,
            ).take_all()
        )
        assert np.allclose(res["rank"], 0.1)

    def test_empty_vertex_set_raises(self, ray_session):
        from crossai_ts_ray.pipelines.graph import pagerank

        with pytest.raises(ValueError):
            pagerank(
                _edges_ds(np.zeros((0, 2), np.int64)),
                _nodes_ds(np.zeros(0, np.int64)),
            )

    def test_simgraph_vs_dense_reference(self, ray_session):
        import pyarrow.parquet as pq

        from crossai_ts_ray.pipelines.graph import (
            pagerank_numpy_reference,
            pagerank_simgraph,
        )
        from crossai_ts_ray.pipelines.text_pipeline import (
            dedup_minhash_pairs,
        )

        pairs = pd.DataFrame(dedup_minhash_pairs(SF).take_all())
        res = pd.DataFrame(pagerank_simgraph(SF).take_all())
        docs = pq.read_table(
            f"{SF}/documents.parquet", columns=["doc_id"]
        )["doc_id"].to_numpy()
        assert len(res) == len(docs)
        if len(pairs):
            e = np.concatenate(
                [
                    pairs[["doc_a", "doc_b"]].values,
                    pairs[["doc_b", "doc_a"]].values,
                ]
            ).astype(np.int64)
        else:
            e = np.zeros((0, 2), np.int64)
        ref = pagerank_numpy_reference(e, docs)
        got = dict(zip(res["doc_id"], res["rank"]))
        for d in docs:
            assert abs(got[int(d)] - round(ref[int(d)], 6)) <= 1e-6
        # near-dup members outrank isolated docs
        if len(pairs):
            members = set(pairs["doc_a"]) | set(pairs["doc_b"])
            isolated = [d for d in docs if int(d) not in members]
            if isolated:
                base = got[int(isolated[0])]
                assert max(got[int(m)] for m in members) > base


class TestTriangles:
    def test_matches_composed_oracle(self, ray_session):
        import duckdb

        from crossai_ts_ray.pipelines.graph import (
            SIMGRAPH_TRIANGLES_SQL,
            simgraph_triangles,
        )

        rdf = pd.DataFrame(simgraph_triangles(SF).take_all())
        con = duckdb.connect()
        con.sql(
            f"create view documents as select * from "
            f"'{SF}/documents.parquet'"
        )
        odf = con.sql(SIMGRAPH_TRIANGLES_SQL).df()
        pd.testing.assert_frame_equal(
            rdf, odf.astype(rdf.dtypes.to_dict())
        )

    def test_planted_clique_and_chain(self, ray_session):
        # kernel-level: K4 has 4 triangles + a disjoint chain has none
        from crossai_ts_ray.pipelines.graph import simgraph_triangles  # noqa: F401
        import itertools

        import numpy as np

        # use the wedge-join pieces indirectly: verify the combinatorics
        # the operator relies on with a local reference
        def tri_count(edges):
            es = {tuple(e) for e in edges}
            nodes = sorted({v for e in edges for v in e})
            return sum(
                1
                for x, y, z in itertools.combinations(nodes, 3)
                if (x, y) in es and (x, z) in es and (y, z) in es
            )

        k4 = [(a, b) for a, b in itertools.combinations(range(4), 2)]
        chain = [(10, 11), (11, 12), (12, 13)]
        assert tri_count(k4) == 4
        assert tri_count(k4 + chain) == 4

    def test_degree_guard_raises(self, ray_session):
        from crossai_ts_ray.pipelines.graph import simgraph_triangles

        with pytest.raises(Exception) as ei:
            simgraph_triangles(SF, max_degree=0).take_all()
        assert "max_degree" in str(ei.value)
