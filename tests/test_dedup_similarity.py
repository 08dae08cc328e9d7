"""Extra semantics tests for the dedup/similarity scale paths:
LSH candidates verify to a SUBSET of the exact pairs, and injected
near-duplicates are actually found.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from glug_spark.operators import dedup, similarity
from tests.conftest import SF_DIR


def test_embedding_lsh_subset_of_exact(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    exact = {
        (r["vec_a"], r["vec_b"])
        for r in similarity.embedding_dup_pairs(emb, threshold=0.9).collect()
    }
    lsh = {
        (r["vec_a"], r["vec_b"])
        for r in similarity.embedding_dup_pairs_lsh(emb, threshold=0.9).collect()
    }
    assert lsh <= exact


def test_embedding_lsh_finds_injected_dup(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    # clone vector 0 as vec_id 10_000 → an exact duplicate pair must be
    # recalled by every probe configuration (identical sign bits)
    clone = (
        emb.where(F.col("vec_id") == 0)
        .select(F.lit(10_000).cast("long").alias("vec_id"), "embedding",
                F.col("label"))
    )
    aug = emb.unionByName(clone)
    pairs = {
        (r["vec_a"], r["vec_b"])
        for r in similarity.embedding_dup_pairs_lsh(aug, threshold=0.99).collect()
    }
    assert (0, 10_000) in pairs


def test_simhash_pairs_find_injected_near_dup(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # doc 10_000 = doc 0's text with one appended token → tiny hamming
    base = docs.where(F.col("doc_id") == 0)
    clone = base.select(
        F.lit(10_000).cast("long").alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra")).alias("text"),
        "lang", "source", "n_chars",
    )
    aug = docs.unionByName(clone)
    pairs = dedup.simhash_pairs(aug, max_hamming=8).collect()
    assert any(
        (r["doc_a"], r["doc_b"]) == (0, 10_000) for r in pairs
    ), pairs[:5]


def test_embedding_lsh_candidates_match_oracle_nontrivially(spark, duck):
    """At threshold 0 every shared-bucket pair is emitted — the
    candidate SET (not just the verified survivors) must agree with the
    oracle's literal-plane banding, proving the sign bits are engine-
    identical and the green driver row isn't a trivial 0 == 0."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    got = {
        (r["vec_a"], r["vec_b"], r["sim"])
        for r in similarity.embedding_dup_pairs_lsh(emb, threshold=0.0).collect()
    }
    want = {
        tuple(r)
        for r in duck.execute(
            similarity.embedding_dup_pairs_lsh_sql(threshold=0.0)
        ).fetchall()
    }
    assert len(got) > 100  # non-trivial candidate volume
    assert got == want


def test_simhash_pairs_hamming_is_exact(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    h = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
    for r in dedup.simhash_pairs(docs, max_hamming=16).limit(20).collect():
        expected = bin((h[r["doc_a"]] ^ h[r["doc_b"]]) & (2**64 - 1)).count("1")
        assert r["hamming"] == expected


def test_train_centroids_deterministic(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    s = similarity.sample_for_training(emb, sample=256)
    c1 = similarity.train_centroids(s, n_lists=4)
    c2 = similarity.train_centroids(list(s), n_lists=4)
    assert c1 == c2
    assert len(c1) == 4 and len(c1[0]) == len(s[0])


def test_ivf_trained_full_probe_is_exact(spark):
    """Probing every cluster must reproduce the exact brute-force
    top-k (the probe prune is the ONLY source of approximation)."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cents = similarity.train_centroids(
        similarity.sample_for_training(emb, sample=256), n_lists=4
    )
    exact = [
        (r["vec_id"], r["sim"])
        for r in similarity.cosine_topk(emb, query_vec_id=3, k=10).collect()
    ]
    full_probe = [
        (r["vec_id"], r["sim"])
        for r in similarity.ivf_topk_trained(
            emb, query_vec_id=3, k=10, n_lists=4, n_probe=4, centroids=cents
        ).collect()
    ]
    assert full_probe == exact


def test_ivf_trained_recall_reasonable(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cents = similarity.train_centroids(
        similarity.sample_for_training(emb, sample=256), n_lists=4
    )
    exact = {
        r["vec_id"]
        for r in similarity.cosine_topk(emb, query_vec_id=3, k=10).collect()
    }
    probed = {
        r["vec_id"]
        for r in similarity.ivf_topk_trained(
            emb, query_vec_id=3, k=10, n_lists=4, n_probe=2, centroids=cents
        ).collect()
    }
    assert len(exact & probed) / len(exact) >= 0.3  # prune is honest, not broken


def test_cosine_topk_many_slices_match_individual(spark):
    """Every batched slice must be rank-identical to cosine_topk for
    that query vector (same order, same rounded sims)."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qids = [0, 5, 9]
    batched = similarity.cosine_topk_many(emb, qids, k=8).collect()
    by_q = {}
    for r in batched:
        by_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["vec_id"], r["sim"])
        )
    for q in qids:
        want = [
            (r["rank"], r["vec_id"], r["sim"])
            for r in similarity.cosine_topk(emb, q, k=8).collect()
        ]
        assert sorted(by_q[str(q)]) == want, q


def test_cosine_topk_many_single_scan_plan(spark):
    """One corpus scan + broadcast queries; the only wide exchange moves
    per-partition top-k rows (bounded by partitions x Q x k), never the
    full n_vecs x Q expansion through a window."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    df = similarity.cosine_topk_many(emb, [0, 5], k=8)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "Window" not in plan, plan
    import re

    # corpus + broadcast queries (numbered plan-detail sections)
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 2


def test_ivf_indexed_rank_identical_and_pruned(spark, tmp_path):
    """Persisted IVF index: probe must be rank-identical to the in-plan
    ivf_topk_trained with the same frozen centroids, and the vectors
    scan must prune to the probed list partitions (PartitionFilters)."""
    from glug_spark.operators.ivf_centroids import CENTROIDS

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    idx = str(tmp_path / "ivf")
    summary = similarity.build_ivf_index(emb, idx, CENTROIDS)
    assert summary["n_vectors"] == emb.count()

    for qid in (0, 7):
        want = [
            (r["rank"], r["vec_id"], r["sim"])
            for r in similarity.ivf_topk_trained(
                emb, qid, k=10, centroids=CENTROIDS
            ).collect()
        ]
        got_df = similarity.ivf_topk_indexed(
            spark, idx, query_vec_id=qid, k=10
        )
        got = [(r["rank"], r["vec_id"], r["sim"]) for r in got_df.collect()]
        assert got == want, qid

    plan = got_df._sc._jvm.PythonSQLUtils.explainString(
        got_df._jdf.queryExecution(), "formatted"
    )
    import re
    assert re.search(r"PartitionFilters: \[.*list_id.* IN \(", plan), plan


def test_ivf_arrow_assignment_matches_jvm(spark):
    """The Arrow build-side nearest-centroid kernel (_assign_map) must
    assign EVERY vector to the same list as the in-plan JVM fold
    (_assigned) — same IEEE operation sequence, same argmax tie rule."""
    from glug_spark.operators.ivf_centroids import CENTROIDS

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cents = spark.createDataFrame(
        [(i, c) for i, c in enumerate(CENTROIDS)],
        "list_id int, c array<double>",
    )
    jvm = {
        r["vec_id"]: r["list_id"]
        for r in similarity._assigned(
            emb, similarity._cent_array(cents)
        ).collect()
    }
    arrow = {
        r["vec_id"]: r["list_id"]
        for r in emb.mapInArrow(
            similarity._assign_map(CENTROIDS, len(CENTROIDS[0])),
            "vec_id long, v array<double>, list_id int",
        ).collect()
    }
    assert arrow == jvm


def test_ivf_query_vec_lookup_driver_side(spark, tmp_path):
    """_lookup_query_vec (pyarrow, no Spark job) must return exactly the
    vector the old Spark-side head() lookup returned, and None for an
    absent vec_id (→ empty probe result)."""
    from glug_spark.operators.ivf_centroids import CENTROIDS

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    idx = str(tmp_path / "ivf")
    similarity.build_ivf_index(emb, idx, CENTROIDS)
    vectors = spark.read.parquet(f"{idx}/vectors")
    for qid in (0, 7, 123):
        want = list(
            vectors.where(F.col("vec_id") == qid).select("v").head()["v"]
        )
        assert similarity._lookup_query_vec(idx, qid) == want, qid
    assert similarity._lookup_query_vec(idx, 10**9) is None
    assert similarity.ivf_topk_indexed(
        spark, idx, query_vec_id=10**9, k=5
    ).count() == 0


def test_curate_docs_matches_audit_projection(spark):
    """curate_docs (full original columns, what build_index consumes)
    must keep exactly the doc set the audit projection reports."""
    from glug_spark.operators.curation import curate, curate_docs

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    audit = {r["doc_id"] for r in curate(docs, 0.5, ["en"]).collect()}
    full = curate_docs(docs, 0.5, ["en"])
    assert {r["doc_id"] for r in full.select("doc_id").collect()} == audit
    assert full.columns == docs.columns


def test_dup_clusters_transitive_closure(spark):
    """Chains must collapse transitively: a-b, b-c, c-d → one cluster
    labeled by the min doc_id, even though a and d share no pair."""
    from glug_spark.operators.dedup import dup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4),      # chain → cluster 1
         (10, 11),                    # isolated pair → cluster 10
         (20, 22), (21, 22)],         # star → cluster 20
        "doc_a long, doc_b long",
    )
    want = {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20),
    }
    # both paths: driver-side union-find (default below the edge-count
    # cutoff) and the distributed label-propagation loop (cutoff 0)
    got = {(r["doc_id"], r["cluster_id"])
           for r in dup_clusters(pairs).collect()}
    assert got == want
    got_dist = {(r["doc_id"], r["cluster_id"])
                for r in dup_clusters(pairs, driver_max_edges=0).collect()}
    assert got_dist == want


def test_dup_clusters_driver_path_matches_distributed(spark):
    """The driver-side union-find fast path must produce EXACTLY the
    distributed loop's labels on real LSH candidate pairs (the corpus
    graph: chains, stars, and isolated pairs all present)."""
    from glug_spark.operators.dedup import dup_clusters, dup_pairs_minhash

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    pairs = dup_pairs_minhash(docs)
    fast = {(r["doc_id"], r["cluster_id"])
            for r in dup_clusters(pairs).collect()}
    dist = {(r["doc_id"], r["cluster_id"])
            for r in dup_clusters(pairs, driver_max_edges=0).collect()}
    assert fast == dist
    assert fast  # the corpus does contain near-dups


def test_dup_clusters_empty(spark):
    from glug_spark.operators.dedup import dup_clusters

    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    assert dup_clusters(pairs).count() == 0


def test_dup_clusters_long_chain_beyond_naive_iter_bound(spark):
    """Adversarial path graph with diameter 60 > the old max_iter=20:
    plain neighbor-min propagation needs 60 rounds (and used to return
    silently WRONG partial labels); pointer jumping must converge well
    inside max_iter=20 and label every node with the chain min. Chain
    ids run HIGH→LOW so the min label must travel the full diameter."""
    from glug_spark.operators.dedup import dup_clusters

    n = 61  # nodes 100..160 in a path; min = 100 at one end
    pairs = spark.createDataFrame(
        [(100 + i, 100 + i + 1) for i in range(n - 1)],
        "doc_a long, doc_b long",
    )
    got = {(r["doc_id"], r["cluster_id"])
           for r in dup_clusters(pairs, max_iter=20,
                                 driver_max_edges=0).collect()}
    assert got == {(100 + i, 100) for i in range(n)}


def test_dup_clusters_raises_on_non_convergence(spark):
    """Exhausting max_iter with labels still moving must RAISE, never
    return partial labels (spurious canonicals would survive dedup)."""
    import pytest

    from glug_spark.operators.dedup import dup_clusters

    pairs = spark.createDataFrame(
        [(100 + i, 100 + i + 1) for i in range(40)],
        "doc_a long, doc_b long",
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dup_clusters(pairs, max_iter=2, driver_max_edges=0)


def test_dedup_apply_fuzzy_differential(spark):
    """dedup_apply_fuzzy must keep exactly: non-clustered docs plus the
    min-doc_id canonical of every near-dup cluster — checked against a
    DuckDB recursive-CTE closure over the same candidate pairs."""
    import duckdb

    from glug_spark.operators.dedup import dedup_apply_fuzzy, dup_clusters_sql
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    kept = {r["doc_id"] for r in dedup_apply_fuzzy(docs).select("doc_id").collect()}

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    drop = {
        r[0]
        for r in con.execute(
            f"SELECT doc_id FROM ({dup_clusters_sql()}) "
            "WHERE doc_id <> cluster_id"
        ).fetchall()
    }
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert kept == all_ids - drop
    assert len(kept) < len(all_ids)  # the corpus does contain near-dups


def test_dedup_apply_fuzzy_verified_differential(spark):
    """Jaccard-verified fuzzy dedup: clusters form only over candidate
    pairs with exact Jaccard ≥ 0.5 — checked against the recursive-CTE
    closure over the verified pair set, and the verified drop set must
    be a (strict, on this corpus) subset of the raw-candidate drops."""
    import duckdb

    from glug_spark.operators.dedup import (
        dedup_apply_fuzzy,
        dup_clusters_sql,
    )
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    kept_raw = {r["doc_id"]
                for r in dedup_apply_fuzzy(docs).select("doc_id").collect()}
    kept_ver = {
        r["doc_id"]
        for r in dedup_apply_fuzzy(docs, verify_threshold=0.5)
        .select("doc_id").collect()
    }
    assert kept_raw <= kept_ver  # verification only ever keeps MORE

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    drop = {
        r[0]
        for r in con.execute(
            f"SELECT doc_id FROM ({dup_clusters_sql(0.5)}) "
            "WHERE doc_id <> cluster_id"
        ).fetchall()
    }
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert kept_ver == all_ids - drop


def test_curate_fuzzy_differential(spark):
    """curate(fuzzy=True) vs the DuckDB twin (exact keepers minus
    recursive-CTE near-dup non-canonicals + quality/lang floor). The
    twin clusters over ALL docs while Spark clusters after exact dedup
    — equivalent by construction (byte-identical copies carry identical
    band signatures, so they add no connectivity and never hold the
    cluster minimum); this test pins that equivalence on real data."""
    import duckdb

    from glug_spark.operators.curation import curate, curate_fuzzy_sql
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = {
        (r["doc_id"], r["quality"], r["pred_lang"])
        for r in curate(docs, min_quality=0.5, langs=["en"], fuzzy=True).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    want = {
        (r[0], r[1], r[2])
        for r in con.execute(
            curate_fuzzy_sql(min_quality=0.5, langs=["en"])
        ).fetchall()
    }
    assert got == want
    assert len(got) > 0
    # and fuzzy is strictly stronger than exact-only curation here
    exact_only = curate(docs, min_quality=0.5, langs=["en"]).count()
    assert len(got) < exact_only


def test_latest_crawl_supersession(spark):
    """Newest fetch per url wins; equal-ts ties break on larger doc_id;
    urls without a recrawl pass through untouched."""
    from glug_spark.operators.curation import latest_crawl

    rows = [
        ("u1", 100, 1), ("u1", 200, 2),          # superseded
        ("u2", 100, 3),                           # single fetch
        ("u3", 100, 4), ("u3", 100, 5),           # tie → larger doc_id
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts long, doc_id long"
    )
    got = {
        r["url"]: (r["warc_ts"], r["doc_id"])
        for r in latest_crawl(pages).collect()
    }
    assert got == {"u1": (200, 2), "u2": (100, 3), "u3": (100, 5)}


def test_latest_crawl_webtext_shape(spark):
    """Over the canonical webtext corpus with simulated recrawls: one
    row per url, and exactly the recrawled urls carry the newer ts."""
    from glug_spark import corpus
    from glug_spark.operators.curation import latest_crawl

    pages = corpus.webtext(spark, SF_DIR).select(
        "url", F.unix_timestamp("warc_ts").cast("long").alias("ts"),
        "doc_id",
    )
    recrawl = pages.where(F.col("doc_id") % 10 == 0).withColumn(
        "ts", F.col("ts") + F.lit(86400)
    )
    out = latest_crawl(pages.unionByName(recrawl), ts_col="ts").collect()
    assert len(out) == pages.count()  # one per url (urls are unique)
    bumped = {r["doc_id"] for r in out if r["ts"] - r["doc_id"] != 1735689600}
    assert bumped == {r["doc_id"] for r in out if r["doc_id"] % 10 == 0}


def test_simhash_arrow_tokenizer_matches_python_re(spark):
    """The C-level Arrow tokenizer (split on non-word runs) must yield
    exactly re.findall(r"\\w+") tokens — differential on unicode,
    punctuation-only, empty and null texts."""
    import re

    import numpy as np

    texts = [
        "héllo wörld_1  ,, héllo", "...", "", None, "a_b-c d",
        "数据 表 scan", "x" * 5, "tab\tnewline\nmix 42",
    ]
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["simhash"] for r in dedup.simhash(df).collect()}

    # reference: the pre-round-6 pandas kernel (re.findall + factorize)
    import hashlib
    def ref_simhash(text):
        toks = re.findall(r"\w+", text or "", re.UNICODE)
        if not toks:
            return 0
        acc = np.zeros(64)
        shifts = np.arange(64, dtype=np.uint64)
        for t in toks:
            h = np.frombuffer(
                hashlib.md5(t.encode()).digest()[:8], dtype=">u8"
            )[0]
            bits = ((np.uint64(h) >> shifts) & np.uint64(1)).astype(float)
            acc += bits * 2.0 - 1.0
        packed = ((acc > 0).astype(np.uint64) << shifts).sum(dtype=np.uint64)
        return int(packed.view(np.int64)) if hasattr(packed, "view") else int(
            np.uint64(packed).astype(np.int64)
        )
    for i, t in enumerate(texts):
        assert got[i] == ref_simhash(t), (i, t)


def test_minhash_fused_kernel_matches_expr_pipeline(spark):
    """The fused Arrow signature kernel (tokenize + shingle + md5 +
    permutation mins in one mapInArrow pass) must be BIT-IDENTICAL to
    the JVM-expression pipeline it replaced — every (doc_id, h0..h127)
    row — on the real corpus AND on edge-case texts (short docs below
    the shingle width, empty/null text, CRLF/trailing whitespace,
    unicode, repeated shingles)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    edge = spark.createDataFrame(
        [
            (1000001, "one two"),                       # < k tokens
            (1000002, ""),                              # empty
            (1000003, None),                            # null
            (1000004, "a b\r\nc d\r\ne f   "),          # CRLF + trailing ws
            (1000005, "héllo wörld 数据 表 scan mix"),   # unicode
            (1000006, "the the the the the the"),       # repeated shingle
            (1000007, "Term1 TERM1 term1 Term1 TERM1"), # case-sensitivity
        ],
        "doc_id long, text string",
    )
    both = docs.select("doc_id", "text").unionByName(edge)
    fused = {r["doc_id"]: tuple(r)[1:]
             for r in dedup.minhash_signatures(both).collect()}
    expr = {r["doc_id"]: tuple(r)[1:]
            for r in dedup._minhash_signatures_expr(both).collect()}
    assert fused == expr
    # docs below the shingle width have no signature row in either form
    assert 1000001 not in fused and 1000003 not in fused


def test_mod_p_inplace_equals_modulo():
    """The division-free Mersenne fold must equal ``%`` over the whole
    legal input range [0, 2^62): boundary values + a dense random
    sweep (products a·h+b in the kernel never exceed 2^62)."""
    import numpy as np

    P = dedup.MINHASH_P
    edge = np.array(
        [0, 1, P - 1, P, P + 1, 2 * P, 2 * P + 1,
         (1 << 31), (1 << 32) - 1, (1 << 62) - 1],
        dtype=np.int64,
    )
    rng = np.random.default_rng(7)
    rand = rng.integers(0, 1 << 62, size=200_000, dtype=np.int64)
    for arr in (edge, rand):
        m = arr.copy()
        dedup._mod_p_inplace(m)
        assert (m == arr % P).all()
