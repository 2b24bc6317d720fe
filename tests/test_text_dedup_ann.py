"""Text / dedup / ANN: hash-family algorithms verified against exact
baselines (MinHash vs true Jaccard, LSH top-k recall vs brute force,
SimHash near-dup property)."""

from __future__ import annotations

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def test_minhash_estimates_jaccard():
    from crossai_ts_ray.functions.dedup import MinHasher, _shingle_hashes
    from crossai_ts_ray.functions.text import char_ngrams, jaccard

    mh = MinHasher(num_hashes=128)
    a = "the quick brown fox jumps over the lazy dog and runs away fast"
    variants = [
        a,
        a.replace("quick", "quack"),
        a[: len(a) // 2],
        "completely different content about database engines and shuffles",
    ]
    for b in variants:
        sa, sb = mh.signature(a), mh.signature(b)
        est = float((sa == sb).mean())
        ha, hb = set(_shingle_hashes(a).tolist()), set(_shingle_hashes(b).tolist())
        true = len(ha & hb) / len(ha | hb)
        assert abs(est - true) < 0.15, (b[:30], est, true)


def test_minhash_deterministic_across_instances():
    from crossai_ts_ray.functions.dedup import MinHasher

    s1 = MinHasher().signature("some document text here")
    s2 = MinHasher().signature("some document text here")
    assert (s1 == s2).all()


def test_simhash_near_duplicates_close():
    from crossai_ts_ray.functions.dedup import hamming64, simhash64

    a = "the quick brown fox jumps over the lazy dog " * 5
    b = a.replace("lazy", "sleepy")
    c = "entirely unrelated text about ray data pipelines and arrow " * 5
    fa, fb, fc = simhash64(a), simhash64(b), simhash64(c)
    d_ab = int(hamming64(np.array([fa], dtype=np.uint64), fb)[0])
    d_ac = int(hamming64(np.array([fa], dtype=np.uint64), fc)[0])
    assert d_ab < d_ac
    assert d_ab <= 12


def test_minhash_pipeline_finds_known_dups(ray_session):
    """Near-identical docs injected into a corpus must come out as a
    candidate pair with high estimated Jaccard."""
    import pyarrow as pa

    from crossai_ts_ray.pipelines.text_pipeline import (
        MinHashSignatures,
        band_table,
        _sig_matrix,
    )

    base = "spark window batch merge value column agg join small line " * 8
    docs = pa.table(
        {
            "doc_id": pa.array(list(range(6)), pa.int64()),
            "text": pa.array(
                [
                    base,
                    base + " tail",
                    "other unrelated document with distinct words entirely",
                    "yet another different doc about time series rollups",
                    base.replace("spark", "flink"),
                    "short",
                ]
            ),
        }
    )
    sigs = MinHashSignatures()(docs)
    assert sigs.num_rows == 6  # one row per doc, sig shipped once
    bands = band_table(sigs)
    sig_m = _sig_matrix(sigs)
    by_doc = dict(zip(sigs["doc_id"].to_pylist(), sig_m))
    # bucket by (band_id, band_key), emit pairs
    import collections

    buckets = collections.defaultdict(list)
    for r in bands.to_pylist():
        buckets[(r["band_id"], r["band_key"])].append(r["doc_id"])
    found = set()
    for members in buckets.values():
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                a, b = members[i], members[j]
                if a != b:
                    est = float((by_doc[a] == by_doc[b]).mean())
                    if est >= 0.5:
                        found.add((min(a, b), max(a, b)))
    assert (0, 1) in found
    assert (0, 4) in found
    assert not any(2 in p or 3 in p for p in found)


def test_band_keys_match_minhasher(ray_session):
    """Vectorized band_table must produce byte-identical keys to the per-doc
    MinHasher.band_keys kernel."""
    import pyarrow as pa

    from crossai_ts_ray.functions.dedup import MinHasher
    from crossai_ts_ray.pipelines.text_pipeline import MinHashSignatures, band_table

    texts = ["doc one text here", "another entirely different doc", "third doc"]
    docs = pa.table(
        {
            "doc_id": pa.array([10, 20, 30], pa.int64()),
            "text": pa.array(texts),
        }
    )
    bands = band_table(MinHashSignatures()(docs))
    mh = MinHasher()
    want = {}
    for did, tx in zip([10, 20, 30], texts):
        for b_id, k in enumerate(mh.band_keys(mh.signature(tx), 16).view(np.int64)):
            want[(did, b_id)] = int(k)
    got = {
        (r["doc_id"], r["band_id"]): r["band_key"] for r in bands.to_pylist()
    }
    assert got == want


def test_simhash_banded_pairs_match_bruteforce(ray_session):
    """The banded multi-probe SimHash blocking must find EXACTLY the pairs a
    brute-force all-pairs scan finds (completeness guarantee)."""
    from crossai_ts_ray.functions.dedup import hamming64
    from crossai_ts_ray.pipelines.text_pipeline import (
        dedup_simhash_pairs,
        simhash_fingerprints,
    )
    from crossai_ts_ray.util import dataset_to_table

    fps = dataset_to_table(simhash_fingerprints(SF))
    ids = np.array(fps["doc_id"].to_pylist(), dtype=np.int64)
    vals = np.array(fps["simhash"].to_pylist(), dtype=np.int64).view(np.uint64)
    want = set()
    for i in range(len(ids)):
        d = hamming64(vals, vals[i])
        for j in np.flatnonzero((d <= 10) & (ids > ids[i])):
            want.add((int(ids[i]), int(ids[j]), int(d[j])))
    got_t = dataset_to_table(dedup_simhash_pairs(SF, max_hamming=10))
    got_list = list(
        zip(
            got_t["doc_a"].to_pylist(),
            got_t["doc_b"].to_pylist(),
            got_t["hamming"].to_pylist(),
        )
    )
    got = set(got_list)
    assert got == want
    # canonical-bucket emission: each pair produced EXACTLY once, no dedup
    assert len(got_list) == len(got)


def test_lsh_topk_recall(ray_session):
    from crossai_ts_ray.pipelines import ann_pipeline
    from crossai_ts_ray.pipelines.ann_pipeline import cosine_topk, lsh_topk
    from crossai_ts_ray.util import dataset_to_table

    exact = dataset_to_table(cosine_topk(SF, k=10))
    approx = dataset_to_table(lsh_topk(SF, k=10))
    e = set(exact["vec_id"].to_pylist())
    a = set(approx["vec_id"].to_pylist())
    assert len(a) == 10  # cross-band candidates deduped, k distinct ids
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"LSH recall too low: {recall}"
    # the probe must be partial: only the multi-probe ball's partitions read
    stats = ann_pipeline.LAST_PROBE_STATS
    assert 0 < stats["partitions_probed"] < stats["partitions_total"]
    assert stats["row_fraction_bound"] < 0.5
    # every approx hit's sim matches the exact score for that id
    exact_sims = dict(zip(exact["vec_id"].to_pylist(), exact["sim"].to_pylist()))
    for vid, sim in zip(approx["vec_id"].to_pylist(), approx["sim"].to_pylist()):
        if vid in exact_sims:
            assert sim == exact_sims[vid]


def test_lsh_topk_multi_matches_per_query(ray_session):
    """The union-read multi-query path must return EXACTLY what running
    lsh_topk per query returns (candidacy is recomputed per batch from the
    rows' own band keys, so sharing the index read cannot change results)."""
    from crossai_ts_ray.pipelines.ann_pipeline import lsh_topk, lsh_topk_multi
    from crossai_ts_ray.util import dataset_to_table

    qids = (0, 3, 7)
    multi = dataset_to_table(lsh_topk_multi(SF, k=10, query_ids=qids))
    for qid in qids:
        single = dataset_to_table(lsh_topk(SF, k=10, query_id=qid))
        want = sorted(
            zip(single["vec_id"].to_pylist(), single["sim"].to_pylist())
        )
        import pyarrow.compute as pc

        sub = multi.filter(pc.equal(multi["query_id"], qid))
        got = sorted(zip(sub["vec_id"].to_pylist(), sub["sim"].to_pylist()))
        assert got == want, f"query {qid} diverged"


def test_ivf_topk_multi_matches_per_query(ray_session):
    """Union-cell multi-query IVF must return exactly per-query ivf_topk
    results (recomputed cell assignment equals the stored partition)."""
    import pyarrow.compute as pc

    from crossai_ts_ray.pipelines.ann_pipeline import ivf_topk, ivf_topk_multi
    from crossai_ts_ray.util import dataset_to_table

    qids = (0, 2, 9)
    multi = dataset_to_table(ivf_topk_multi(SF, k=10, query_ids=qids))
    for qid in qids:
        single = dataset_to_table(ivf_topk(SF, k=10, query_id=qid))
        want = sorted(
            zip(single["vec_id"].to_pylist(), single["sim"].to_pylist())
        )
        sub = multi.filter(pc.equal(multi["query_id"], qid))
        got = sorted(zip(sub["vec_id"].to_pylist(), sub["sim"].to_pylist()))
        assert got == want, f"query {qid} diverged"


def test_embedding_near_pairs_exact_triangle_join(ray_session):
    """The triangle block join must produce exactly the brute-force pair
    set (it is an exact algorithm, only the partitioning is new)."""
    import pyarrow.parquet as pq

    from crossai_ts_ray.pipelines.ann_pipeline import _emb_matrix, embedding_near_pairs
    from crossai_ts_ray.util import dataset_to_table

    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    m, ids = _emb_matrix(t)
    mn = m / np.sqrt((m * m).sum(axis=1, keepdims=True))
    sims = mn @ mn.T
    ai, bj = np.nonzero(sims >= 0.35)
    keep = ids[ai] < ids[bj]
    want = set(
        zip(
            ids[ai[keep]].tolist(),
            ids[bj[keep]].tolist(),
            np.round(sims[ai[keep], bj[keep]], 6).tolist(),
        )
    )
    got_t = dataset_to_table(embedding_near_pairs(SF, threshold=0.35))
    got = set(
        zip(
            got_t["vec_a"].to_pylist(),
            got_t["vec_b"].to_pylist(),
            got_t["sim"].to_pylist(),
        )
    )
    assert got == want


def test_embedding_near_pairs_ivf_recall(ray_session):
    from crossai_ts_ray.pipelines.ann_pipeline import (
        embedding_near_pairs,
        embedding_near_pairs_ivf,
    )
    from crossai_ts_ray.util import dataset_to_table

    exact_t = dataset_to_table(embedding_near_pairs(SF, threshold=0.35))
    exact = set(zip(exact_t["vec_a"].to_pylist(), exact_t["vec_b"].to_pylist()))
    ivf_t = dataset_to_table(embedding_near_pairs_ivf(SF, threshold=0.35))
    ivf = set(zip(ivf_t["vec_a"].to_pylist(), ivf_t["vec_b"].to_pylist()))
    assert ivf <= exact  # no false positives: within-cell sims are exact
    recall = len(ivf & exact) / max(1, len(exact))
    assert recall >= 0.3, f"IVF recall too low: {recall}"
    # sims reported for IVF pairs match the exact values
    exact_sims = dict(
        zip(
            zip(exact_t["vec_a"].to_pylist(), exact_t["vec_b"].to_pylist()),
            exact_t["sim"].to_pylist(),
        )
    )
    for a, b, s in zip(
        ivf_t["vec_a"].to_pylist(), ivf_t["vec_b"].to_pylist(), ivf_t["sim"].to_pylist()
    ):
        assert s == exact_sims[(a, b)]


def test_language_detection():
    from crossai_ts_ray.functions.text import detect_language

    assert detect_language("the cat sat on the mat and it is a fine day") == "en"
    assert detect_language("el perro y la casa en un lugar de la mancha") == "es"
    assert detect_language("der hund und die katze mit ein buch von goethe") == "de"
    assert detect_language("这是一个中文句子 关于时间序列的处理") == "zh"


def test_rolling_hash_fingerprint_order_sensitive():
    from crossai_ts_ray.functions.text import rolling_hash_fingerprint

    a = rolling_hash_fingerprint(np.array([1, 2, 3, 4], dtype=np.int64))
    b = rolling_hash_fingerprint(np.array([4, 3, 2, 1], dtype=np.int64))
    c = rolling_hash_fingerprint(np.array([1, 2, 3, 4], dtype=np.int64))
    assert a == c
    assert a != b


def test_dedup_clusters_connected_components(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from crossai_ts_ray.pipelines.text_pipeline import dedup_clusters

    # components: {1,2,3,9}, {5,6}, singleton edges imply membership
    pairs = pa.table(
        {
            "doc_a": pa.array([1, 2, 3, 5], pa.int64()),
            "doc_b": pa.array([2, 3, 9, 6], pa.int64()),
        }
    )
    labels = dedup_clusters(rd.from_arrow(pairs))
    got = {r["doc_id"]: r["cluster"] for r in labels.take_all()}
    assert got == {1: 1, 2: 1, 3: 1, 9: 1, 5: 5, 6: 5}


def test_dedup_clusters_random_graph_vs_bfs(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from crossai_ts_ray.pipelines.text_pipeline import dedup_clusters

    rng = np.random.default_rng(7)
    n_nodes, n_edges = 400, 300
    a = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    b = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    pairs = pa.table({"doc_a": pa.array(a), "doc_b": pa.array(b)})

    # reference: BFS connected components, label = min node id
    adj = {}
    for x, y in zip(a.tolist(), b.tolist()):
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    want, seen = {}, set()
    for start in sorted(adj):
        if start in seen:
            continue
        comp, stack = [], [start]
        seen.add(start)
        while stack:
            u = stack.pop()
            comp.append(u)
            for v in adj[u]:
                if v not in seen:
                    seen.add(v)
                    stack.append(v)
        m = min(comp)
        for u in comp:
            want[u] = m

    labels = dedup_clusters(rd.from_arrow(pairs), buckets=7)
    got = {r["doc_id"]: r["cluster"] for r in labels.take_all()}
    assert got == want


def test_keyed_equijoin_salted_identical_and_balanced(ray_session):
    """Hot-key salting: outputs row-for-row identical to unsalted; the hot
    key's rows fan out over `salt` sub-buckets instead of one task."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from crossai_ts_ray.stages.joins import keyed_equijoin

    rng = np.random.default_rng(17)
    # left: one pathologically hot key (6k rows) + a cold tail
    lk = np.concatenate([np.full(6000, 7, np.int64), rng.integers(100, 200, 500)])
    left = pa.table(
        {"k": pa.array(lk, pa.int64()),
         "payload": pa.array(rng.integers(0, 1000, len(lk)), pa.int64())}
    )
    rk = np.concatenate([[7, 7], np.arange(100, 200, dtype=np.int64)])
    right = pa.table(
        {"rk": pa.array(rk, pa.int64()),
         "attr": pa.array(np.arange(len(rk), dtype=np.int64), pa.int64())}
    )
    schemas = (left.schema, right.schema)

    def run(salt):
        ds = keyed_equijoin(
            rd.from_arrow(left), rd.from_arrow(right),
            on=("k", "rk"), buckets=8, schemas=schemas, salt=salt,
        )
        df = ds.to_pandas().sort_values(["k", "payload", "attr"]).reset_index(drop=True)
        return df

    a, b = run(1), run(4)
    pd.testing.assert_frame_equal(a, b)
    # the hot key matched both right rows: 6000 x 2 pairs present
    assert int((a["k"] == 7).sum()) == 12000
    # auto-salt: the measured hot-key fraction picks salt > 1 on this
    # layout and the output stays bitwise identical
    from crossai_ts_ray.stages.joins import estimate_salt
    assert estimate_salt(rd.from_arrow(left), "k", buckets=8) > 1
    # a uniform layout measures no skew worth the replication
    uniform = pa.table({"k": pa.array(np.arange(5000, dtype=np.int64), pa.int64())})
    assert estimate_salt(rd.from_arrow(uniform), "k", buckets=8) == 1
    pd.testing.assert_frame_equal(a, run("auto"))
    # left-join flavor too
    def run_left(salt):
        ds = keyed_equijoin(
            rd.from_arrow(left), rd.from_arrow(right),
            on=("k", "rk"), buckets=8, how="left", schemas=schemas, salt=salt,
        )
        return ds.to_pandas().sort_values(["k", "payload", "attr"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(run_left(1), run_left(4))


def test_dedup_minhash_pairs_invariant_to_partitioning(ray_session):
    """Near-dup pair extraction must be bitwise independent of block
    boundaries -- the distributed-determinism invariant the rollup family
    already pins.  Shrinking target_max_block_size forces different block
    splits through every exchange."""
    import pandas as pd
    from ray.data import DataContext

    from crossai_ts_ray.pipelines.text_pipeline import dedup_minhash_pairs

    ctx = DataContext.get_current()
    old = ctx.target_max_block_size

    def run():
        df = dedup_minhash_pairs(SF).to_pandas()
        return df.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)

    try:
        a = run()
        ctx.target_max_block_size = 64 * 1024  # force tiny blocks
        b = run()
    finally:
        ctx.target_max_block_size = old
    pd.testing.assert_frame_equal(a, b)


def test_clean_corpus_keeps_representatives_and_unclustered(ray_session):
    import duckdb

    from crossai_ts_ray.pipelines.text_pipeline import (
        clean_corpus,
        dedup_clusters,
        dedup_simhash_pairs,
    )

    kept = clean_corpus(SF).to_pandas()
    cl = dedup_clusters(dedup_simhash_pairs(SF)).to_pandas()
    n_docs = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/documents.parquet')"
    ).fetchone()[0]

    clustered = set(cl["doc_id"])
    reps = set(cl.loc[cl["doc_id"] == cl["cluster"], "doc_id"])
    losers = clustered - reps
    kept_ids = set(kept["doc_id"])

    all_ids = set(
        duckdb.sql(
            f"SELECT doc_id FROM read_parquet('{SF}/documents.parquet')"
        ).df()["doc_id"].astype(int)
    )
    # exactly the non-representative clustered docs are removed
    assert kept_ids == all_ids - losers
    assert len(kept) == n_docs - len(losers)
    assert reps <= kept_ids
    # every cluster keeps exactly one member (its representative)
    survivors = cl[cl["doc_id"].isin(kept_ids)]
    assert survivors.groupby("cluster").size().eq(1).all()
    assert (survivors["doc_id"] == survivors["cluster"]).all()


def test_bucket_cap_drops_only_overfull_buckets(ray_session):
    """max_bucket: pairs from buckets <= cap are unchanged; an over-full
    (boilerplate) bucket contributes nothing -- and the cap is logged, not
    silent (the 100 TB pair-explosion valve)."""
    import pyarrow as pa
    import ray.data as rd

    from crossai_ts_ray.pipelines.text_pipeline import _bucket_candidate_pairs

    # bucket A: 20 docs (over cap of 5 -> 190 pairs skipped); bucket B: 3 docs
    doc = list(range(100, 120)) + [1, 2, 3]
    key = [7] * 20 + [9, 9, 9]
    t = pa.table({"doc_id": pa.array(doc, pa.int64()),
                  "band_id": pa.array([0] * 23, pa.int64()),
                  "band_key": pa.array(key, pa.int64())})
    capped = _bucket_candidate_pairs(
        rd.from_arrow(t), ["band_id", "band_key"], max_bucket=5
    ).to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    assert capped["doc_a"].tolist() == [1, 1, 2]
    assert capped["doc_b"].tolist() == [2, 3, 3]
    full = _bucket_candidate_pairs(
        rd.from_arrow(t), ["band_id", "band_key"]
    ).to_pandas()
    assert len(full) == 190 + 3


def test_ivf_topk_recall_and_partial_probe(ray_session):
    """IVF top-k over the persisted cell-partitioned index: recall vs exact,
    partial probe (row fraction < 1), and exact sims for every hit."""
    from crossai_ts_ray.pipelines import ann_pipeline
    from crossai_ts_ray.pipelines.ann_pipeline import cosine_topk, ivf_topk
    from crossai_ts_ray.util import dataset_to_table

    exact = dataset_to_table(cosine_topk(SF, k=10))
    approx = dataset_to_table(ivf_topk(SF, k=10, nprobe=6))
    a = set(approx["vec_id"].to_pylist())
    assert len(a) == 10
    e = set(exact["vec_id"].to_pylist())
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"IVF recall too low: {recall}"
    stats = ann_pipeline.LAST_IVF_STATS
    assert 0 < stats["cells_probed"] < stats["cells_total"]
    assert stats["row_fraction"] < 1.0
    exact_sims = dict(zip(exact["vec_id"].to_pylist(), exact["sim"].to_pylist()))
    for vid, sim in zip(approx["vec_id"].to_pylist(), approx["sim"].to_pylist()):
        if vid in exact_sims:
            assert sim == exact_sims[vid]
    # nprobe = all cells -> exact result (IVF degenerates to brute force)
    full = dataset_to_table(ivf_topk(SF, k=10, nprobe=10**6))
    assert full["vec_id"].to_pylist() == exact["vec_id"].to_pylist()


def test_perplexity_semantics(ray_session, tmp_path):
    """Uniform-vocabulary doc has perplexity == vocab size; a doc of one
    repeated common word scores lower than a doc of rare words."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crossai_ts_ray.pipelines.text_pipeline import doc_unigram_perplexity
    from tools.verify_correctness import canon, to_pandas

    d = str(tmp_path / "ppl")
    os.makedirs(d, exist_ok=True)
    # corpus: 'a' x 8, 'b' x 4, 'c' x 2, 'd' x 2  (N=16)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(
                    [
                        "a a a a a a a a",   # common word only
                        "b b b b c c d d",   # mixed
                        "c d",               # rare words only
                    ]
                ),
            }
        ),
        f"{d}/documents.parquet",
    )
    got = canon(to_pandas(doc_unigram_perplexity(d))).set_index("doc_id")
    # N=18: a=8, b=4, c=3, d=3.  p(a)=8/18 -> ppl(doc1)=18/8=2.25;
    # doc3 = one c + one d, p=3/18 each -> ppl = 6
    assert abs(got.loc[1, "perplexity"] - 2.25) < 1e-4
    assert abs(got.loc[3, "perplexity"] - 6.0) < 1e-4
    assert got.loc[1, "perplexity"] < got.loc[2, "perplexity"] < got.loc[3, "perplexity"]
    assert got.loc[2, "n_words"] == 8


def test_tfidf_prefers_rare_terms(ray_session, tmp_path):
    """A term unique to one doc outranks corpus-wide terms; k and tiebreak
    are deterministic."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from crossai_ts_ray.pipelines.text_pipeline import doc_tfidf_top_terms
    from tools.verify_correctness import canon, to_pandas

    d = str(tmp_path / "tfidf")
    os.makedirs(d, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(
                    [
                        "common common zebra",
                        "common common common",
                        "common yak yak",
                    ]
                ),
            }
        ),
        f"{d}/documents.parquet",
    )
    got = canon(to_pandas(doc_tfidf_top_terms(d))).set_index(
        ["doc_id", "word"]
    )
    # 'zebra' (df=1) tops doc 1 despite tf=1 < tf(common)=2
    d1 = got.loc[1].sort_values("tfidf", ascending=False)
    assert d1.index[0] == "zebra"
    # 'common' appears in every doc -> idf = ln(1) = 0 -> score 0
    assert got.loc[(2, "common"), "tfidf"] == 0.0
    d3 = got.loc[3].sort_values("tfidf", ascending=False)
    assert d3.index[0] == "yak"


def test_clean_corpus_embedding_matches_duckdb_and_semantics(ray_session):
    """Embedding-modality corpus clean: exact DuckDB recursive-CTE mirror
    at sf0.001 plus the representative-keep invariants (every component
    keeps exactly its min vec_id; unpaired vectors all survive)."""
    import duckdb
    import numpy as np

    from crossai_ts_ray.pipelines.ann_pipeline import (
        CLEAN_CORPUS_EMBEDDING_SQL,
        clean_corpus_embedding,
        embedding_near_pairs,
    )
    from crossai_ts_ray.util import dataset_to_table
    from tools.verify_correctness import TABLES, canon, to_pandas

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    got = canon(to_pandas(clean_corpus_embedding(SF)))
    want = canon(con.sql(CLEAN_CORPUS_EMBEDDING_SQL).df())
    assert list(got.columns) == list(want.columns)
    assert got.equals(want)

    # invariants vs the pair list: paired vec_ids that survive must each
    # be their component's minimum (greedy first-occurrence keep)
    pairs = dataset_to_table(embedding_near_pairs(SF, threshold=0.35))
    pa_ids = pairs["vec_a"].to_numpy(zero_copy_only=False)
    pb_ids = pairs["vec_b"].to_numpy(zero_copy_only=False)
    kept = set(got["vec_id"].tolist())
    # union-find reference on the driver (test-scale only)
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pa_ids.tolist(), pb_ids.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp: dict = {}
    for x in parent:
        comp.setdefault(find(x), []).append(x)
    for root, members in comp.items():
        assert kept & set(members) == {min(members)}


def test_heavy_hitter_terms_threshold_and_planted(ray_session, tmp_path):
    """Exact heavy hitters: planted corpus vs a pandas exact reference at
    two denominators (integer ``cnt*denom >= N`` threshold, boundary
    inclusive), plus the sf0.001 DuckDB mirror."""
    import collections
    import os

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crossai_ts_ray.pipelines.text_pipeline import (
        HEAVY_HITTER_TERMS_SQL,
        heavy_hitter_terms,
    )
    from tools.verify_correctness import TABLES, canon, to_pandas

    d = str(tmp_path / "hh")
    os.makedirs(d, exist_ok=True)
    # "the" is spread thin across docs (never dominant in one doc) but
    # globally heavy; "rare" appears once
    texts = ["the alpha beta the gamma"] * 6 + ["delta the rare"]
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        f"{d}/documents.parquet",
    )
    all_words = " ".join(texts).split(" ")
    n = len(all_words)
    exact = collections.Counter(all_words)
    for denom in (3, 12):
        got = canon(to_pandas(heavy_hitter_terms(d, denom=denom)))
        want = sorted(
            (w, c) for w, c in exact.items() if c * denom >= n
        )
        assert list(map(tuple, got[["word", "cnt"]].to_numpy())) == want
        assert all(int(c) == exact[w] for w, c in want)  # counts exact

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    got = canon(to_pandas(heavy_hitter_terms(SF)))
    want = canon(con.sql(HEAVY_HITTER_TERMS_SQL).df())
    assert got.equals(want)


def test_ivf_append_placement_replay_and_crash_recovery(ray_session):
    """Incremental IVF append: (1) appended vectors land in the argmax cell
    the build kernel would choose; (2) a committed replay is a no-op;
    (3) a crash window with partially-renamed files but no marker recovers
    to exactly one copy; (4) .tmp files are never visible to readers."""
    import glob
    import os

    import numpy as np
    import pyarrow.parquet as pq

    from crossai_ts_ray.pipelines.ann_pipeline import (
        _ivf_split_root,
        _read_ivf_centroids,
        append_ivf_index,
        _read_emb,
    )

    sf = "/root/testdata/sf0.001"
    root = _ivf_split_root(sf, cells=4)
    all_ids = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id"])[
        "vec_id"
    ].to_numpy(zero_copy_only=False)

    # (4) committed index has no .tmp anywhere
    assert not glob.glob(os.path.join(root, "cell=*", "*.tmp"))

    # (1) every appended (odd) vector sits in its argmax cell
    C, _ = _read_ivf_centroids(root)
    emb = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    m = np.array(emb["embedding"].combine_chunks().to_pylist(), dtype=np.float64)
    ids = emb["vec_id"].to_numpy(zero_copy_only=False)
    mn = m / np.sqrt((m * m).sum(axis=1, keepdims=True))
    want_cell = dict(zip(ids, np.argmax(mn @ C.T, axis=1)))
    seen = {}
    for d in glob.glob(os.path.join(root, "cell=*")):
        cell = int(d.split("=")[1])
        for f in glob.glob(os.path.join(d, "append-odd-half.parquet")):
            for v in pq.read_table(f, columns=["vec_id"])["vec_id"].to_pylist():
                seen[v] = cell
    assert seen, "append wrote no files"
    assert set(seen) == {int(i) for i in all_ids if i % 2 == 1}
    for v, c in seen.items():
        assert c == want_cell[v]

    # (2) replay of a committed batch is a no-op
    odd = _read_emb(sf).map_batches(
        lambda t: t.filter(
            (t["vec_id"].to_pandas() % 2 == 1).to_numpy()
        ),
        batch_format="pyarrow",
    )
    rep = append_ivf_index(root, odd, batch_id="odd-half")
    assert rep["replayed"] and rep["appended"] == 0
    files_before = sorted(glob.glob(os.path.join(root, "cell=*", "*.parquet")))

    # (3) crash window: marker gone, one data file of the batch still
    # present (as if renamed before the crash) -> replay must converge to
    # exactly one committed copy per cell, identical totals
    total_before = sum(
        pq.read_metadata(f).num_rows for f in files_before
    )
    os.remove(os.path.join(root, "_append_odd-half.committed"))
    rep2 = append_ivf_index(root, odd, batch_id="odd-half")
    assert not rep2["replayed"] and rep2["appended"] == len(seen)
    files_after = sorted(glob.glob(os.path.join(root, "cell=*", "*.parquet")))
    total_after = sum(pq.read_metadata(f).num_rows for f in files_after)
    assert total_after == total_before
    assert os.path.exists(os.path.join(root, "_append_odd-half.committed"))
