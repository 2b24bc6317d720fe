"""Graph analytics over edge tables: distributed PageRank power iteration.

Engine-new family (the reference has no graph code): ranks documents by
centrality in the near-duplicate similarity graph — the standard way to
pick CANONICAL representatives and surface template/boilerplate hubs in a
training-data corpus (a doc near-duplicating many others is a hub).

Why actors, not Dataset exchanges: an iterative fixpoint re-reads the SAME
edge partitions and updates the SAME node-sized rank vector every round.
Expressed as Dataset ops that is 3 all-to-all exchanges per iteration
(join, groupby, join-back), and the per-exchange coordination floor
(measured ~1-3 s on this Ray build, see BASELINE.md "explain" row)
multiplies by iterations x 3 regardless of data size.  This module
instead holds the rank vector SHARDED ACROSS STATEFUL ACTORS (the brief's
sanctioned escape hatch for shared mutable state): edges are
hash-partitioned by src ONCE into per-shard Parquet (pruned reads, the
same persisted-partition trade as the MinHash signature table); each
iteration is pure NumPy inside the shards plus one in-memory all-to-all
of PRE-AGGREGATED (dst, contribution) arrays through the object store —
B^2 small messages, no Dataset coordination.  Memory per shard is
node-sized / B; at 10^12-doc scale raise ``shards`` so each holds its
slice.

Determinism: each shard pre-aggregates its outgoing contributions per dst
(np.add.at — one slot per (shard, dst)), and the receiver folds incoming
shard blocks in FIXED shard order, so reruns are bit-identical at equal
shard count.  Cross-shard-count and dense-reference parity hold to 1e-12
(asserted in tests/test_graph.py); the query output rounds to 6.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..sources.readers import read_parquet_sized
from ..stages.joins import hash_prt


@ray.remote
class _RankShard:
    """One shard of the PageRank state: the nodes whose
    ``hash_prt(node, B) == shard_id``, their out-degrees, their current
    ranks, and ALL edges whose src lives here (Parquet partition read
    once in __init__)."""

    def __init__(self, shard_id: int, shards: int, edge_dir: str,
                 nodes: np.ndarray):
        import pyarrow.parquet as pq

        self.sid = shard_id
        self.B = shards
        self.nodes = np.sort(nodes.astype(np.int64))
        part = os.path.join(edge_dir, f"shard={shard_id}")
        if os.path.isdir(part):
            t = pq.read_table(part, columns=["src", "dst"])
            self.src = t["src"].to_numpy().astype(np.int64)
            self.dst = t["dst"].to_numpy().astype(np.int64)
        else:
            self.src = np.zeros(0, np.int64)
            self.dst = np.zeros(0, np.int64)
        # out-degree: every edge of a src is in its shard, so the count
        # is complete locally
        self.outdeg = np.zeros(len(self.nodes), np.int64)
        if len(self.src):
            pos = np.searchsorted(self.nodes, self.src)
            np.add.at(self.outdeg, pos, 1)
        self.r = np.empty(0, np.float64)
        # precompute the outgoing routing: target shard per edge, edges
        # sorted by (target shard, dst) once
        if len(self.dst):
            tgt = hash_prt(self.dst, shards)
            order = np.lexsort((self.dst, tgt))
            self.src = self.src[order]
            self.dst = self.dst[order]
            self.tgt_starts = np.searchsorted(tgt[order], np.arange(shards))
            self.tgt_ends = np.searchsorted(
                tgt[order], np.arange(shards), side="right"
            )
        else:
            self.tgt_starts = np.zeros(shards, np.int64)
            self.tgt_ends = np.zeros(shards, np.int64)

    def init_ranks(self, r0: float) -> int:
        self.r = np.full(len(self.nodes), r0, np.float64)
        return len(self.nodes)

    def dangling(self) -> float:
        return float(self.r[self.outdeg == 0].sum())

    def contribs(self) -> list:
        """Per target shard: (dst_ids, summed contributions) — one slot
        per (this shard, dst), exact scatter-add."""
        if not len(self.src):
            return [(np.zeros(0, np.int64), np.zeros(0, np.float64))] * self.B
        pos = np.searchsorted(self.nodes, self.src)
        c = self.r[pos] / self.outdeg[pos]
        out = []
        for t in range(self.B):
            s, e = self.tgt_starts[t], self.tgt_ends[t]
            if e <= s:
                out.append((np.zeros(0, np.int64), np.zeros(0, np.float64)))
                continue
            d = self.dst[s:e]
            starts = np.flatnonzero(
                np.concatenate(([True], d[1:] != d[:-1]))
            )
            sums = np.add.reduceat(c[s:e], starts)
            out.append((d[starts], sums))
        return out

    def apply(self, incoming: list, spread: float, damping: float) -> None:
        """Fold incoming blocks in FIXED shard order (deterministic)."""
        s = np.zeros(len(self.nodes), np.float64)
        for dst_ids, sums in incoming:
            if len(dst_ids):
                s[np.searchsorted(self.nodes, dst_ids)] += sums
        self.r = damping * s + spread

    def result(self) -> pa.Table:
        return pa.table(
            {
                "node": pa.array(self.nodes, pa.int64()),
                "rank": pa.array(np.round(self.r, 6), pa.float64()),
            }
        )


def pagerank(
    edges: rd.Dataset,
    nodes: rd.Dataset,
    n_iter: int = 15,
    damping: float = 0.85,
    shards: int = 8,
) -> rd.Dataset:
    """Power-iteration PageRank over a directed edge table.

    ``edges``: columns (src, dst) int64. ``nodes``: column (node) int64,
    the full vertex set (isolated vertices keep the teleport baseline).
    Returns (node, rank) after ``n_iter`` iterations from the uniform
    start, rank rounded to 6 decimals; ranks sum to ~1.
    """
    edge_dir = tempfile.mkdtemp(prefix="crossai_pr_edges_")
    try:
        # ONE streaming pass hash-partitions the edges by src shard
        def route(t: pa.Table) -> pa.Table:
            t = t.combine_chunks()
            src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    "src": pa.array(src, pa.int64()),
                    "dst": t["dst"].cast(pa.int64()),
                    "shard": pa.array(hash_prt(src, shards), pa.int64()),
                }
            )

        edges.map_batches(route, batch_format="pyarrow").write_parquet(
            edge_dir, partition_cols=["shard"]
        )

        # node shards: gather each shard's node-id slice (node-sized / B
        # per actor; the only driver-side transfer is the vertex ids)
        def node_route(t: pa.Table) -> pa.Table:
            t = t.combine_chunks()
            n = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    "node": pa.array(n, pa.int64()),
                    "shard": pa.array(hash_prt(n, shards), pa.int64()),
                }
            )

        shard_nodes: list[list[np.ndarray]] = [[] for _ in range(shards)]
        for b in nodes.map_batches(
            node_route, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow"):
            sh = b["shard"].to_numpy(zero_copy_only=False)
            nn = b["node"].to_numpy(zero_copy_only=False)
            for s in np.unique(sh):
                shard_nodes[int(s)].append(nn[sh == s].copy())
        node_arrays = [
            np.concatenate(a) if a else np.zeros(0, np.int64)
            for a in shard_nodes
        ]
        n_nodes = int(sum(len(a) for a in node_arrays))
        if n_nodes == 0:
            raise ValueError("empty vertex set")
        n = float(n_nodes)

        actors = [
            _RankShard.remote(i, shards, edge_dir, node_arrays[i])
            for i in range(shards)
        ]
        ray.get([a.init_ranks.remote(1.0 / n) for a in actors])
        teleport = (1.0 - damping) / n
        for _ in range(n_iter):
            dangling = sum(ray.get([a.dangling.remote() for a in actors]))
            spread = damping * dangling / n + teleport
            # B lists of B blocks; block transfer rides the object store
            all_contribs = ray.get([a.contribs.remote() for a in actors])
            ray.get(
                [
                    a.apply.remote(
                        [all_contribs[s][t] for s in range(shards)],
                        spread,
                        damping,
                    )
                    for t, a in enumerate(actors)
                ]
            )
        tables = ray.get([a.result.remote() for a in actors])
        for a in actors:
            ray.kill(a)
        return rd.from_arrow(pa.concat_tables(tables))
    finally:
        shutil.rmtree(edge_dir, ignore_errors=True)


def pagerank_numpy_reference(
    edges: np.ndarray, nodes: np.ndarray, n_iter: int = 15,
    damping: float = 0.85,
) -> dict[int, float]:
    """Dense single-process reference (parity target for tests)."""
    idx = {int(v): i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n, np.int64)
    for s, _ in edges:
        out[idx[int(s)]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        dangling = r[out == 0].sum()
        nr = np.full(n, (1.0 - damping) / n + damping * dangling / n)
        for s, d in edges:
            si = idx[int(s)]
            nr[idx[int(d)]] += damping * r[si] / out[si]
        r = nr
    return {int(v): float(r[idx[int(v)]]) for v in nodes}


def pagerank_simgraph(
    sf_dir: str, n_iter: int = 15, damping: float = 0.85,
    threshold: float = 0.6, shards: int = 8,
) -> rd.Dataset:
    """PageRank of documents in the symmetrized MinHash near-duplicate
    graph: edges are ``dedup_minhash_pairs`` pairs in both directions;
    the vertex set is ALL documents (isolated docs keep the teleport
    baseline).  High-rank docs are near-dup hubs — template/boilerplate
    candidates a curation pass should inspect first.  Returns
    (doc_id, rank)."""
    from .text_pipeline import dedup_minhash_pairs

    pairs = dedup_minhash_pairs(sf_dir, threshold=threshold)

    def sym(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        a = t["doc_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["doc_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b]), pa.int64()),
                "dst": pa.array(np.concatenate([b, a]), pa.int64()),
            }
        )

    edges = pairs.map_batches(sym, batch_format="pyarrow")
    nodes = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(
        lambda t: pa.table({"node": t["doc_id"].cast(pa.int64())}),
        batch_format="pyarrow",
    )
    ranked = pagerank(
        edges, nodes, n_iter=n_iter, damping=damping, shards=shards
    )
    return ranked.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t["node"].cast(pa.int64()),
                "rank": t["rank"].cast(pa.float64()),
            }
        ),
        batch_format="pyarrow",
    )


def simgraph_triangles(sf_dir: str, buckets: int = 16,
                       max_degree: int = 65536) -> rd.Dataset:
    """Triangle count of the MinHash near-duplicate graph — the
    clustering-coefficient numerator that separates chain-shaped
    near-dup families (pairwise-transitive edits) from clique-shaped
    ones (template stamping).  Returns one row (n_triangles, n_wedges).

    Scale shape (the standard wedge-join): ONE hash exchange builds each
    vertex's sorted neighbor list; every vertex emits its wedges (pairs
    of larger-id neighbors — at most deg^2/2, with a loud ``max_degree``
    guard on hub vertices); ONE partitioned equijoin on the packed
    (y, z) key intersects wedges with the edge set.  Each triangle
    x < y < z is counted exactly once, at its smallest vertex."""
    from ..stages.joins import keyed_equijoin
    from .text_pipeline import dedup_minhash_pairs

    pairs = dedup_minhash_pairs(sf_dir)

    def edge_key(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        a = t["doc_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["doc_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        if (b >= (1 << 31)).any():
            raise ValueError("doc_id exceeds pack width")
        return pa.table(
            {
                "ek": pa.array(a * (1 << 31) + b, pa.int64()),
                "one": pa.array(np.ones(len(a), np.int8)),
            }
        )

    # pairs are query-postings-small (near-dup families); reuse for both
    # the adjacency pass and the edge side of the join
    pairs = pairs.materialize()
    edges = pairs.map_batches(edge_key, batch_format="pyarrow")

    def adj_partial(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        a = t["doc_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["doc_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "x": pa.array(a, pa.int64()),
                "y": pa.array(b, pa.int64()),
                "prt": pa.array(hash_prt(a, buckets), pa.int64()),
            }
        )

    wedge_schema = pa.schema([("ek", pa.int64()), ("w", pa.int8())])

    def wedges(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=wedge_schema)
        x = t["x"].to_numpy(zero_copy_only=False)
        y = t["y"].to_numpy(zero_copy_only=False)
        order = np.lexsort((y, x))
        x, y = x[order], y[order]
        starts = np.flatnonzero(
            np.concatenate(([True], x[1:] != x[:-1]))
        )
        ends = np.concatenate((starts[1:], [len(x)]))
        eks = []
        for s, e in zip(starts, ends):
            deg = e - s
            if deg > max_degree:
                raise ValueError(
                    f"vertex {x[s]} has degree {deg} (> max_degree="
                    f"{max_degree}); wedge enumeration would be "
                    f"quadratic — raise the guard deliberately"
                )
            nb = y[s:e]  # sorted, all > x (doc_a < doc_b edges)
            iu = np.triu_indices(deg, k=1)
            eks.append(nb[iu[0]] * (1 << 31) + nb[iu[1]])
        ek = (
            np.concatenate(eks) if eks else np.zeros(0, np.int64)
        )
        return pa.table(
            {
                "ek": pa.array(ek, pa.int64()),
                "w": pa.array(np.ones(len(ek), np.int8)),
            },
            schema=wedge_schema,
        )

    wedge_ds = (
        pairs.map_batches(adj_partial, batch_format="pyarrow")
        .groupby("prt")
        .map_groups(
            lambda g: wedges(g.drop_columns(["prt"])),
            batch_format="pyarrow",
        )
    )
    n_wedges = wedge_ds.count()
    hits = keyed_equijoin(
        wedge_ds,
        edges,
        on=("ek", "ek"),
        buckets=buckets,
        schemas=(
            wedge_schema,
            pa.schema([("ek", pa.int64()), ("one", pa.int8())]),
        ),
    )
    n_tri = hits.count()
    return rd.from_arrow(
        pa.table(
            {
                "n_triangles": pa.array([n_tri], pa.int64()),
                "n_wedges": pa.array([n_wedges], pa.int64()),
            }
        )
    )


def _triangles_sql() -> str:
    from .text_pipeline import DEDUP_MINHASH_PAIRS_SQL

    return f"""
WITH e AS (
  SELECT doc_a AS a, doc_b AS b FROM ({DEDUP_MINHASH_PAIRS_SQL}) mh
)
SELECT
  (SELECT count(*) FROM e e1
     JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
     JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b)::BIGINT AS n_triangles,
  (SELECT count(*) FROM e e1
     JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b)::BIGINT AS n_wedges
"""


SIMGRAPH_TRIANGLES_SQL = _triangles_sql()
