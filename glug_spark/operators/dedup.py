"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Portability design: every hash that must agree between the Spark plan
and the DuckDB oracle is ``md5`` of a string (both engines emit identical
lowercase hex), and "min-hash" is the lexicographic MIN of seeded md5
hex strings — a valid random-permutation family keyed by seed prefix,
with zero cross-engine numeric-hash coupling.

Scale notes:
- shingling + per-seed min-aggregation is one groupBy(doc_id) with
  map-side partial min — no skew (doc_id is the key).
- LSH banding turns near-dup search from O(n²) into a self-equi-join on
  (band_id, band_key); AQE skew-join handles hot buckets (boilerplate
  pages at web scale) and the band key space grows with corpus size.
- SimHash is a Pandas UDF (Arrow-batched): bit-twiddling is not
  SQL-friendly; it stays vectorized NumPy inside the executor.
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame, functions as F

from glug_spark.index.build import shingle_array, token_array

#: default MinHash geometry. r = N_HASHES/N_BANDS rows per band sets the
#: LSH s-curve: P(candidate) = 1-(1-s^r)^b with midpoint ≈ (1/b)^(1/r).
#: 128 perms / 32 bands × 4 rows (the de-facto production standard,
#: e.g. datasketch's default) puts the midpoint at (1/32)^(1/4) ≈ 0.42 —
#: theoretical recall 0.87 for pairs at EXACTLY the 0.5 near-dup
#: contract and ≈1.0 above 0.6, vs 0.64@0.5 for 64/16 and a shallow
#: high-waste curve for the old 8/4×2. Measured precision/recall per
#: geometry vs exhaustive ground truth: BASELINE.md (tools/minhash_tune.py).
N_HASHES = 128
N_BANDS = 32
SHINGLE = 3


def _check_geometry(n_hashes: int, n_bands: int) -> int:
    if n_hashes % n_bands:
        raise ValueError(
            f"n_hashes={n_hashes} must be divisible by n_bands={n_bands}"
        )
    return n_hashes // n_bands


# --- exact dedup --------------------------------------------------------

def exact_groups(docs: DataFrame) -> DataFrame:
    """(content_hash, n_copies, keep_doc_id) — canonical = min doc_id."""
    return (
        docs.select(F.col("doc_id"), F.md5(F.col("text")).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("keep_doc_id"),
        )
    )


EXACT_GROUPS_SQL = """
SELECT md5(text) AS content_hash,
       count(*) AS n_copies,
       min(doc_id) AS keep_doc_id
FROM documents
GROUP BY md5(text)
"""


def dedup_apply(docs: DataFrame) -> DataFrame:
    """The end-to-end exact-dedup a training pipeline actually runs:
    keep one canonical copy per content hash (min doc_id), drop the
    rest. One hash-agg + one semi-join on the (content_hash-sized)
    keeper set — skew-free, no corpus-sized driver state."""
    keep = exact_groups(docs).select(F.col("keep_doc_id").alias("doc_id"))
    return docs.join(keep, "doc_id", "left_semi").select("doc_id")


DEDUP_APPLY_SQL = """
SELECT doc_id FROM documents
WHERE doc_id IN (
    SELECT min(doc_id) FROM documents GROUP BY md5(text)
)
"""


# --- MinHash + LSH ------------------------------------------------------

def _shingles(docs: DataFrame, shingle: int = SHINGLE) -> DataFrame:
    """(doc_id, shingle) — token n-grams, JVM-side, O(tokens) per row
    (see :func:`glug_spark.index.build.shingle_array` for why the naive
    ``element_at``-in-``transform`` form is quadratic)."""
    return docs.select(
        "doc_id",
        F.explode(shingle_array(token_array(), shingle)).alias("shingle"),
    )


def _shingles_sql(shingle: int = SHINGLE) -> str:
    parts = " || ' ' || ".join(
        "term" if j == 0 else f"lead(term, {j}) OVER w" for j in range(shingle)
    )
    return f"""
SELECT doc_id, {parts} AS shingle
FROM (
    SELECT doc_id,
           unnest(regexp_extract_all(text, '[\\p{{L}}\\p{{N}}_]+')) AS term,
           generate_subscripts(regexp_extract_all(text, '[\\p{{L}}\\p{{N}}_]+'), 1) AS pos
    FROM documents
)
WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
QUALIFY lead(term, {shingle - 1}) OVER w IS NOT NULL
"""


_SHINGLES_SQL = _shingles_sql()


#: universal-hash permutation field: Mersenne prime 2^31 - 1. Products
#: a·h stay below 2^62, so BOTH engines compute them in plain signed
#: 64-bit arithmetic — no overflow, no wrap games.
MINHASH_P = (1 << 31) - 1


def _perm_consts(n_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) for the h_i(x) = (a_i·x + b_i) mod P
    permutation family (closed form, embedded as literals in both the
    Spark plan and the oracle SQL)."""
    out = []
    for i in range(n_hashes):
        a = (1103515245 * (i + 1) + 12345) % MINHASH_P or 1
        b = (7919 * (i + 1)) % MINHASH_P
        out.append((a, b))
    return out


def _minhash_partial_map(
    n_hashes: int,
) -> "Callable[[Iterator[pa.RecordBatch]], Iterator[pa.RecordBatch]]":
    """mapInArrow worker: (doc_id, h) shingle-hash batches → per-doc
    PARTIAL minima over all ``n_hashes`` permutations — the map-side
    half of the min aggregation, vectorized: one (rows × n_hashes)
    (a·h+b) mod P matrix per batch and a segmented ``minimum.reduceat``
    over the batch's doc runs (explode output is doc-contiguous). A doc
    split across batches/partitions emits several partial rows; the
    final groupBy-min merges them exactly. All math is int64 (products
    < 2^62), identical to the JVM/oracle expressions."""
    import pyarrow as pa

    consts = _perm_consts(n_hashes)
    a = np.array([c[0] for c in consts], dtype=np.int64)
    b = np.array([c[1] for c in consts], dtype=np.int64)
    names = ["doc_id"] + [f"h{i}" for i in range(n_hashes)]

    def run(batches: "Iterator[pa.RecordBatch]") -> "Iterator[pa.RecordBatch]":
        for batch in batches:
            if batch.num_rows == 0:
                continue
            doc = batch.column("doc_id").to_numpy(zero_copy_only=False)
            h = batch.column("h").to_numpy(zero_copy_only=False)
            starts = np.flatnonzero(np.diff(doc, prepend=doc[0] - 1))
            perms = (h[:, None] * a[None, :] + b[None, :]) % MINHASH_P
            mins = np.minimum.reduceat(perms, starts, axis=0)
            arrays = [pa.array(doc[starts], type=pa.int64())] + [
                pa.array(mins[:, i], type=pa.int64())
                for i in range(n_hashes)
            ]
            yield pa.RecordBatch.from_arrays(arrays, names)

    return run


#: per-executor shingle→base-hash cache (the shingle-level analog of
#: :data:`_TOKEN_HASH_CACHE`): the oracle contract pins the base hash to
#: md5(shingle), but head shingles (stopword n-grams) recur across every
#: Arrow batch — caching makes the md5 cost proportional to NEW shingle
#: strings, not batches × uniques.
_SHINGLE_HASH_CACHE: dict[str, int] = {}
_SHINGLE_HASH_CACHE_MAX = 4_000_000  # strings + one int each; bounded


def _shingle_hashes(uniques: "list[str]") -> "np.ndarray":
    """md5-derived base hashes for UNIQUE shingle strings — identical
    integer per string to the JVM expression
    ``pmod(conv(substring(md5(s), 1, 15), 16, 10), P)``: first 15 hex
    chars = a 60-bit non-negative int, so Python ``int(hex, 16) % P``
    computes the same value with no sign games."""
    import hashlib

    cache = _SHINGLE_HASH_CACHE
    md5 = hashlib.md5
    get = cache.get
    out = np.empty(len(uniques), dtype=np.int64)
    for i, u in enumerate(uniques):
        h = get(u)
        if h is None:
            h = int(md5(u.encode("utf-8")).hexdigest()[:15], 16) % MINHASH_P
            cache[u] = h
        out[i] = h
    if len(cache) > _SHINGLE_HASH_CACHE_MAX:
        cache.clear()
    return out


#: docs-count ceiling for the pre-kernel spread shuffle. A FILTERED
#: slice of a big corpus (the fuzzy-curation shape: 100k docs selected
#: out of 2M) occupies only the few input splits whose row groups
#: survive predicate pushdown — ``getNumPartitions()`` still reports
#: the full split count, so the split-count heuristic cannot see the
#: starvation, and the fused kernel would run ~4-wide on a 32-core
#: cluster (measured: 31 s vs 6 s). Below this bound the input is
#: shuffle-class small (≤ ~1.3 GB of text) and one round-robin
#: repartition to ``min(2·cores, n_docs/1000)`` costs seconds against
#: the kernel's minutes; above it, inputs necessarily span many
#: data-bearing splits and the zero-shuffle narrow path stands.
MINHASH_SPREAD_MAX_DOCS = int(
    os.environ.get("GLUG_MINHASH_SPREAD_MAX_DOCS", "1000000")
)


def _mod_p_inplace(m: np.ndarray) -> None:
    """In-place ``m mod P`` for 0 ≤ m < 2^62, P = 2^31−1 (Mersenne):
    two shift-and-add folds + one conditional subtract replace the
    hardware 64-bit division ``%`` costs per element. Bounds: after
    fold 1 m < 2^32, after fold 2 m ≤ P+1, the subtract lands m in
    [0, P). Property-tested equal to ``%`` over the full input range."""
    p = np.int64(MINHASH_P)
    for _ in range(2):
        hi = m >> np.int64(31)
        m &= p
        m += hi
    np.subtract(m, p, out=m, where=m >= p)


def _perm_mins(
    h: np.ndarray, sdoc: np.ndarray, a: np.ndarray, b: np.ndarray,
) -> "tuple[np.ndarray, np.ndarray]":
    """Per-doc-run minima of the n_hashes permutations over shingle
    base hashes ``h`` (doc index ``sdoc`` non-decreasing), computed
    one PERMUTATION at a time: the working set per pass is the 1-D
    ``m`` scratch (8·rows bytes — cache-resident for Arrow-batch-sized
    inputs) instead of a (rows × n_hashes) matrix whose 8 read-write
    passes are DRAM-bandwidth-bound (measured 3.2× on a 330k-row
    batch; an earlier matrix form also peaked at ~2 GB × concurrent
    tasks on 10k-DOC batches — memory thrash)."""
    n_hashes = len(a)
    starts = np.flatnonzero(np.diff(sdoc, prepend=sdoc[0] - 1))
    out = np.empty((len(starts), n_hashes), dtype=np.int64)
    m = np.empty(len(h), dtype=np.int64)
    for i in range(n_hashes):
        np.multiply(h, a[i], out=m)
        m += b[i]
        _mod_p_inplace(m)
        out[:, i] = np.minimum.reduceat(m, starts)
    return sdoc[starts], out


def _minhash_text_map(
    n_hashes: int, shingle: int,
) -> "Callable[[Iterator[pa.RecordBatch]], Iterator[pa.RecordBatch]]":
    """mapInArrow worker: (doc_id, text) batches → per-doc PARTIAL
    signature minima, fused end to end. Tokenize with Arrow's RE2 split
    (== ``regexp_extract_all('[\\p{L}\\p{N}_]+')`` after dropping empty
    edge strings — the differential the simhash kernel already proved),
    build k-gram strings with ``binary_join_element_wise`` over k
    offset slices of the flat token array (masking starts whose k-th
    token falls in the next doc), ``dictionary_encode`` so md5 runs
    once per UNIQUE shingle (cache-amortized across batches), then the
    (rows × n_hashes) permutation matrix + segmented
    ``minimum.reduceat`` per doc run. Only (doc_id, text) cross the
    JVM→Python boundary — the predecessor shipped one row per shingle
    OCCURRENCE (21M rows / 100k webtext docs) through explode + JVM md5
    + base-16 conv first."""
    import pyarrow as pa

    consts = _perm_consts(n_hashes)
    a = np.array([c[0] for c in consts], dtype=np.int64)
    b = np.array([c[1] for c in consts], dtype=np.int64)
    names = ["doc_id"] + [f"h{i}" for i in range(n_hashes)]

    def run(batches: "Iterator[pa.RecordBatch]") -> "Iterator[pa.RecordBatch]":
        import pyarrow.compute as pc

        for batch in batches:
            if batch.num_rows == 0:
                continue
            texts = batch.column("text")
            if isinstance(texts, pa.ChunkedArray):
                texts = texts.combine_chunks()
            doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            splits = pc.split_pattern_regex(texts, _NONWORD_SPLIT)
            flat = pc.list_flatten(splits)
            parent = pc.list_parent_indices(splits)
            keep = pc.not_equal(flat, "")
            flat = pc.filter(flat, keep)
            parent = pc.filter(parent, keep)
            n_starts = len(flat) - shingle + 1
            if n_starts <= 0:
                continue
            par_np = parent.to_numpy(zero_copy_only=False).astype(np.int64)
            valid = par_np[:n_starts] == par_np[shingle - 1:]
            if not valid.any():
                continue  # no doc has >= k tokens in this batch
            pieces = [flat.slice(j, n_starts) for j in range(shingle)]
            sh = pc.binary_join_element_wise(*pieces, " ")
            sh = pc.filter(sh, pa.array(valid))
            sdoc = par_np[:n_starts][valid]
            dic = pc.dictionary_encode(sh)
            codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            h = _shingle_hashes(dic.dictionary.to_pylist())[codes]
            run_docs, mins = _perm_mins(h, sdoc, a, b)
            arrays = [pa.array(doc_ids[run_docs], type=pa.int64())] + [
                pa.array(np.ascontiguousarray(mins[:, i]), type=pa.int64())
                for i in range(n_hashes)
            ]
            yield pa.RecordBatch.from_arrays(arrays, names)

    return run


def _minhash_signatures_expr(docs: DataFrame, n_hashes: int = N_HASHES,
                             shingle: int = SHINGLE) -> DataFrame:
    """The previous-generation JVM-expression signature pipeline
    (shingle explode → md5/conv per occurrence → Arrow partial mins) —
    kept as the differential twin the fused kernel is tested
    bit-identical against."""
    sh = _shingles(docs, shingle=shingle)
    h = F.pmod(
        F.conv(F.substring(F.md5(F.col("shingle")), 1, 15), 16, 10)
        .cast("long"),
        F.lit(MINHASH_P),
    )
    base = sh.select("doc_id", h.alias("h"))
    schema = ", ".join(["doc_id long"]
                       + [f"h{i} long" for i in range(n_hashes)])
    partial = base.mapInArrow(_minhash_partial_map(n_hashes), schema=schema)
    aggs = [F.min(f"h{i}").alias(f"h{i}") for i in range(n_hashes)]
    return partial.groupBy("doc_id").agg(*aggs)


def minhash_signatures(docs: DataFrame, n_hashes: int = N_HASHES,
                       shingle: int = SHINGLE) -> DataFrame:
    """(doc_id, h0..h{n-1} bigint) — minhash via the standard universal
    hashing family: ONE md5 per shingle (first 15 hex chars → 60-bit
    int, mod P) and ``n_hashes`` cheap (a·h+b) mod P permutations,
    aggregated with NUMERIC mins.

    Three generations of this kernel predate the current one: the
    per-seed ``min(md5('<seed>|' || shingle))`` form cost n_hashes md5s
    per shingle occurrence (480 s / 100k docs); the all-JVM numeric
    form (one md5, 128 ``min((h·a+b) % P)`` agg expressions) measured
    ~45 s; the half-Arrow form (JVM explode + md5 per occurrence →
    Arrow permutation mins) ~23 s, dominated by materializing and
    hashing one JVM row per shingle occurrence. The whole chain —
    tokenize, shingle, md5 (once per UNIQUE shingle, cache-amortized),
    permutations, map-side min — now runs fused in one ``mapInArrow``
    pass over (doc_id, text) (guide §4.2), then a final groupBy-min
    over ~n_docs partial rows. Values are bit-identical (same token
    sequence, same md5-derived integers, min is order-free; differential
    test vs :func:`_minhash_signatures_expr`); the oracle SQL is
    unchanged."""
    src = docs.select(F.col("doc_id").cast("long").alias("doc_id"), "text")
    par = docs.sparkSession.sparkContext.defaultParallelism
    n = src.count()  # pushed-filter columnar count — one cheap job
    if 0 < n <= MINHASH_SPREAD_MAX_DOCS:
        src = src.repartition(min(2 * par, max(1, n // 1000)))
    elif src.rdd.getNumPartitions() < par:
        src = src.repartition(par)
    schema = ", ".join(["doc_id long"]
                       + [f"h{i} long" for i in range(n_hashes)])
    partial = src.mapInArrow(_minhash_text_map(n_hashes, shingle),
                             schema=schema)
    aggs = [F.min(f"h{i}").alias(f"h{i}") for i in range(n_hashes)]
    return partial.groupBy("doc_id").agg(*aggs)


def minhash_bands(docs: DataFrame, n_hashes: int = N_HASHES,
                  n_bands: int = N_BANDS,
                  shingle: int = SHINGLE) -> DataFrame:
    """(doc_id, band_id, band_key) — LSH bucket keys, ``n_bands`` bands
    of ``n_hashes/n_bands`` signature rows each."""
    r = _check_geometry(n_hashes, n_bands)
    sig = minhash_signatures(docs, n_hashes=n_hashes, shingle=shingle)
    bands = F.array(*[
        F.md5(F.concat_ws(
            "|", *[F.col(f"h{b * r + j}") for j in range(r)]
        ))
        for b in range(n_bands)
    ])
    return sig.select(
        "doc_id", F.posexplode(bands).alias("band_id", "band_key")
    )


def _minhash_sig_sql(n_hashes: int = N_HASHES,
                     shingle: int = SHINGLE) -> str:
    mins = ", ".join(
        f"min((h * {a} + {b}) % {MINHASH_P}) AS h{i}"
        for i, (a, b) in enumerate(_perm_consts(n_hashes))
    )
    return (
        f"SELECT doc_id, {mins} FROM ("
        f"SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT "
        f"% {MINHASH_P} AS h FROM ({_shingles_sql(shingle)})"
        f") GROUP BY doc_id"
    )


def minhash_bands_sql(n_hashes: int = N_HASHES, n_bands: int = N_BANDS,
                      shingle: int = SHINGLE) -> str:
    r = _check_geometry(n_hashes, n_bands)
    selects = [
        "SELECT doc_id, {b} AS band_id, md5({key}) AS band_key FROM sig".format(
            b=b,
            key=" || '|' || ".join(f"h{b * r + j}" for j in range(r)),
        )
        for b in range(n_bands)
    ]
    return (
        f"WITH sig AS ({_minhash_sig_sql(n_hashes, shingle)}) "
        + " UNION ALL ".join(selects)
    )


def dup_pairs_minhash(docs: DataFrame, n_hashes: int = N_HASHES,
                      n_bands: int = N_BANDS,
                      shingle: int = SHINGLE) -> DataFrame:
    """(doc_a, doc_b) candidate near-dup pairs sharing any LSH band."""
    bands = minhash_bands(docs, n_hashes=n_hashes, n_bands=n_bands,
                          shingle=shingle)
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def dup_pairs_minhash_sql(n_hashes: int = N_HASHES,
                          n_bands: int = N_BANDS,
                          shingle: int = SHINGLE) -> str:
    return f"""
WITH bands AS ({minhash_bands_sql(n_hashes, n_bands, shingle)})
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b
  ON a.band_id = b.band_id AND a.band_key = b.band_key
 AND a.doc_id < b.doc_id
"""


#: edge-count cutoff below which dup_clusters solves connected
#: components ON THE DRIVER instead of running the distributed
#: label-propagation loop. The candidate-pair table is already ≪ corpus
#: (LSH output); below this bound it is broadcast-class data (2 longs ×
#: 5M ≈ 80 MB — the same scale Spark happily collects for a broadcast
#: join), and the iterative loop's cost is pure fixed overhead: each
#: round is ~5 shuffle stages over KB-sized tables, ~40 s of scheduling
#: at local[32] for a graph union-find solves in <1 s. Web-scale edge
#: sets (above the bound) keep the distributed loop unchanged.
DRIVER_CC_MAX_EDGES = int(
    os.environ.get("GLUG_CC_DRIVER_MAX_EDGES", "5000000")
)


def _driver_components(edges: DataFrame) -> DataFrame:
    """Union-find (path compression, min-root) over a collected edge
    list: (doc_id, cluster_id = min doc_id of the component), the same
    fixpoint the distributed loop converges to — min over a set, no
    ordering dependence."""
    import pandas as pd

    pdf = edges.toPandas()  # Arrow-backed; ≤ DRIVER_CC_MAX_EDGES rows
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(pdf["src"].to_list(), pdf["dst"].to_list()):
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    nodes = sorted(set(pdf["src"].to_list()))
    out = pd.DataFrame(
        {"doc_id": nodes, "cluster_id": [find(n) for n in nodes]},
        dtype="int64",
    )
    spark = edges.sparkSession
    if out.empty:
        return spark.createDataFrame([], "doc_id long, cluster_id long")
    return spark.createDataFrame(out)


def dup_clusters(pairs: DataFrame, max_iter: int = 20,
                 checkpoint_every: int = 4,
                 driver_max_edges: int | None = None) -> DataFrame:
    """(doc_id, cluster_id) — transitive near-dup CLUSTERS over candidate
    pairs: connected components, ``cluster_id`` = min doc_id in the
    component (the canonical survivor a training pipeline keeps).

    Min-label propagation WITH POINTER JUMPING, run to fixpoint: each
    round every node takes the minimum of (its own label, its
    neighbors' labels, its label's label). The neighbor-min step alone
    needs O(diameter) rounds — a long chain of gradually drifting
    templated docs defeats any fixed bound — but the label-of-label
    shortcut halves remaining path lengths each round, so convergence
    is O(log diameter): ``max_iter=20`` covers diameters beyond 10^6.
    Both steps preserve the invariants ``label(v) ≤ v`` and "label(v)
    is a node in v's component", and the combined fixpoint (stable
    under neighbor-min across every edge, both directions) forces one
    label per component = its min doc_id. If the loop still exhausts
    ``max_iter`` without a fixpoint it RAISES rather than silently
    returning partial labels (spurious canonicals would survive
    dedup downstream).

    Scale shape: the edge table is the CANDIDATE PAIR set (≪ corpus —
    this never touches documents); each round is two equi-joins + a
    min-agg on label-sized tables, and every ``checkpoint_every``
    rounds the labels are ``localCheckpoint``-ed to truncate the
    otherwise exponentially deepening lineage (the classic
    large-star/small-star CC formulation from Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14, has the
    same join shape and round bound). Deterministic: min over a set,
    no ordering dependence.

    Oracle (:func:`dup_clusters_sql`): DuckDB recursive CTE computing
    min reachable doc_id — the same fixpoint by definition.

    ``driver_max_edges`` (default :data:`DRIVER_CC_MAX_EDGES`, 0
    disables): edge sets at or below this count are solved driver-side
    by :func:`_driver_components` — identical labels, none of the
    per-round scheduling cost. The distributed loop is the scale path.
    """
    fwd = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    rev = pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    edges = fwd.union(rev).distinct().cache()
    if driver_max_edges is None:
        driver_max_edges = DRIVER_CC_MAX_EDGES
    if driver_max_edges:
        n_edges = edges.count()  # materializes the cache either way
        if n_edges <= driver_max_edges:
            try:
                return _driver_components(edges)
            finally:
                edges.unpersist()
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
        .cache()
    )
    changed = -1  # sentinel for max_iter=0 misuse
    try:
        for it in range(max_iter):
            nbr = (
                edges.join(labels, edges["dst"] == labels["doc_id"])
                .groupBy("src")
                .agg(F.min("cluster_id").alias("nb_min"))
            )
            old = labels
            stepped = (
                old.alias("l")
                .join(nbr, F.col("l.doc_id") == nbr["src"], "left")
                .select(
                    F.col("l.doc_id").alias("doc_id"),
                    F.least(
                        F.col("l.cluster_id"),
                        F.coalesce("nb_min", F.col("l.cluster_id")),
                    ).alias("cluster_id"),
                )
            )
            # pointer jump: cluster_id → label(cluster_id). label values
            # are node ids (min-so-far of a component member), so the
            # self-join always finds the parent row.
            labels = (
                stepped.alias("s")
                .join(
                    old.alias("p"),
                    F.col("s.cluster_id") == F.col("p.doc_id"),
                    "left",
                )
                .select(
                    F.col("s.doc_id").alias("doc_id"),
                    F.least(
                        F.col("s.cluster_id"),
                        F.coalesce(
                            F.col("p.cluster_id"), F.col("s.cluster_id")
                        ),
                    ).alias("cluster_id"),
                )
            )
            if (it + 1) % checkpoint_every == 0:
                labels = labels.localCheckpoint(eager=True)
            else:
                labels = labels.cache()
            changed = (
                labels.alias("n")
                .join(old.alias("o"), "doc_id")
                .where(F.col("n.cluster_id") != F.col("o.cluster_id"))
                .count()
            )
            old.unpersist()
            if changed == 0:
                return labels.orderBy("doc_id")
        raise RuntimeError(
            f"dup_clusters: min-label propagation did not converge in "
            f"{max_iter} rounds ({changed} labels still changing) — "
            "returning partial labels would let spurious 'canonical' "
            "docs survive fuzzy dedup. With pointer jumping this bounds "
            "component diameter at ~2^max_iter; raise max_iter."
        )
    finally:
        edges.unpersist()


def dup_pairs_verified(docs: DataFrame, threshold: float = 0.5,
                       n_hashes: int = N_HASHES, n_bands: int = N_BANDS,
                       shingle: int = SHINGLE) -> DataFrame:
    """(doc_a, doc_b) — LSH candidates VERIFIED by exact shingle-set
    Jaccard ≥ ``threshold``. The production fuzzy-dedup edge set:
    clustering raw LSH candidates transitively merges below-threshold
    chance collisions (measured: 24% of a 100k webtext corpus lands in
    a raw-candidate cluster, most below 0.5 Jaccard), while verification
    is one candidate-sized join pass and caps every edge at the
    contract threshold."""
    cand = dup_pairs_minhash(docs, n_hashes=n_hashes, n_bands=n_bands,
                             shingle=shingle)
    return jaccard_pairs(docs, threshold, cand=cand).select(
        "doc_a", "doc_b"
    )


def _closure_sql(pairs_sql: str) -> str:
    """DuckDB recursive-CTE connected components over a pair query."""
    return f"""
WITH RECURSIVE pairs AS ({pairs_sql}),
edges AS (
    SELECT doc_a AS src, doc_b AS dst FROM pairs
    UNION
    SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach(node, lab) AS (
    SELECT src, src FROM edges
    UNION
    SELECT e.src, r.lab FROM edges e JOIN reach r ON e.dst = r.node
)
SELECT node AS doc_id, CAST(min(lab) AS BIGINT) AS cluster_id
FROM reach GROUP BY node ORDER BY doc_id
"""


def dup_clusters_sql(verify_threshold: float | None = None) -> str:
    """Recursive-CTE oracle for :func:`dup_clusters` over the raw LSH
    candidate pairs, or the Jaccard-verified pairs when
    ``verify_threshold`` is given."""
    if verify_threshold is None:
        return _closure_sql(dup_pairs_minhash_sql())
    return _closure_sql(
        f"SELECT doc_a, doc_b FROM ({jaccard_pairs_sql(verify_threshold)})"
    )


def dedup_apply_fuzzy(docs: DataFrame, max_iter: int = 20,
                      verify_threshold: float | None = None) -> DataFrame:
    """Fuzzy dedup APPLIED: drop every non-canonical member of each
    near-dup cluster (MinHash-LSH candidates → transitive closure →
    keep min doc_id per cluster; docs in no cluster survive untouched).
    ``verify_threshold`` inserts the exact-Jaccard candidate-verify
    pass before clustering (:func:`dup_pairs_verified`) — the
    production configuration; ``None`` clusters raw candidates.

    Scale shape: clustering runs on the candidate-pair table only; the
    single corpus-sized operation is the final left_anti join of docs
    against the (tiny) drop set."""
    pairs = (
        dup_pairs_minhash(docs) if verify_threshold is None
        else dup_pairs_verified(docs, verify_threshold)
    )
    clusters = dup_clusters(pairs, max_iter=max_iter)
    drop = clusters.where(F.col("doc_id") != F.col("cluster_id")).select(
        "doc_id"
    )
    return docs.join(drop, "doc_id", "left_anti")


# --- n-gram Jaccard verify (over LSH candidates) ------------------------

def jaccard_pairs(docs: DataFrame, threshold: float = 0.5,
                  cand: DataFrame | None = None) -> DataFrame:
    """(doc_a, doc_b, jaccard) — exact shingle-set Jaccard for LSH
    candidate pairs (candidate-verify pattern: LSH recalls, Jaccard
    confirms). Jaccard over DISTINCT 3-gram shingles. ``cand``
    overrides the candidate set (e.g. :func:`all_shared_shingle_pairs`
    for exhaustive ground truth).

    Only docs that appear in a candidate pair are shingled: the verify
    pass needs sets and sizes for CANDIDATE MEMBERS only (every output
    row is a cand pair), so the corpus is semi-joined to the member
    ids before the shingle explode + distinct — at LSH-typical
    candidate rates that skips the expensive distinct-shingle shuffle
    for the large non-duplicate majority. Join strategy is left to
    AQE: the member set is runtime-sized (KBs at bench scale, possibly
    corpus-class on pathological near-dup corpora), exactly the case
    runtime stats decide better than a forced broadcast.

    ``cand`` and the distinct shingle sets are each consumed by
    SEVERAL branches of the plan (cand: member ids ×2 + the intersect
    join; sets: both intersect sides + both size lookups) and Spark's
    exchange reuse does not unify them across the union/self-join
    aliases — measured, the un-materialized plan held 34 SortMergeJoins
    and recomputed the LSH pipeline ~3× and the shingle distinct ~4×.
    Both are ``localCheckpoint``-ed (eager), which is intra-query
    materialization of candidate-scale intermediates, and the
    intersect joins are hinted SHUFFLE_HASH so the (pair × shingle)
    stream is never sorted (it only feeds a hash aggregation)."""
    if cand is None:
        cand = dup_pairs_minhash(docs)
    cand = cand.localCheckpoint(eager=True)
    members = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .union(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    sets_ = (
        _shingles(docs.join(members, "doc_id", "left_semi"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    sizes = sets_.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))

    inter = (
        cand.join(sets_.alias("sa").hint("SHUFFLE_HASH"),
                  F.col("doc_a") == F.col("sa.doc_id"))
        .join(
            sets_.alias("sb").hint("SHUFFLE_HASH"),
            (F.col("doc_b") == F.col("sb.doc_id"))
            & (F.col("sa.shingle") == F.col("sb.shingle")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(sizes.alias("na"), F.col("doc_a") == F.col("na.doc_id"))
        .join(sizes.alias("nb"), F.col("doc_b") == F.col("nb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_inter")
                / (F.col("na.n") + F.col("nb.n") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def jaccard_pairs_sql(threshold: float = 0.5) -> str:
    return f"""
WITH bands AS ({minhash_bands_sql()}),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band_id = b.band_id AND a.band_key = b.band_key
     AND a.doc_id < b.doc_id
),
sets_ AS (SELECT DISTINCT doc_id, shingle FROM ({_SHINGLES_SQL})),
sizes AS (SELECT doc_id, count(*) AS n FROM sets_ GROUP BY doc_id),
inter AS (
    SELECT c.doc_a, c.doc_b, count(*) AS n_inter
    FROM cand c
    JOIN sets_ sa ON sa.doc_id = c.doc_a
    JOIN sets_ sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
    GROUP BY c.doc_a, c.doc_b
)
SELECT i.doc_a, i.doc_b,
       round(i.n_inter / (na.n + nb.n - i.n_inter), 6) AS jaccard
FROM inter i
JOIN sizes na ON na.doc_id = i.doc_a
JOIN sizes nb ON nb.doc_id = i.doc_b
WHERE round(i.n_inter / (na.n + nb.n - i.n_inter), 6) >= {threshold}
"""


def all_shared_shingle_pairs(docs: DataFrame) -> DataFrame:
    """(doc_a, doc_b) — EVERY pair sharing at least one shingle. Jaccard
    > 0 requires a shared shingle, so feeding this to
    :func:`jaccard_pairs` yields the COMPLETE set of pairs above any
    positive threshold: the exhaustive ground truth
    ``tools/minhash_tune.py`` scores LSH candidate recall against.
    Quadratic in per-shingle doc frequency — a measurement tool, not a
    production path (that is the whole point of LSH)."""
    sets_ = _shingles(docs).distinct()
    a = sets_.alias("a")
    b = sets_.alias("b")
    return (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


# --- SimHash (Pandas UDF, batch-vectorized; md5-keyed → oracle-SQL) -----

#: per-executor token→md5-prefix cache. The oracle contract pins the
#: hash to md5(token) (per-message — no batch API exists), but Zipf
#: means the SAME head tokens recur in every Arrow batch: caching makes
#: the md5 cost proportional to NEW vocabulary, not batches × uniques.
_TOKEN_HASH_CACHE: dict[str, bytes] = {}
_TOKEN_HASH_CACHE_MAX = 4_000_000  # ~token strings + 8B each; bounded


def _token_hashes(uniques: "np.ndarray | pd.Index") -> "np.ndarray":
    import hashlib

    cache = _TOKEN_HASH_CACHE
    md5 = hashlib.md5
    get = cache.get
    out = []
    for u in uniques:
        h = get(u)
        if h is None:
            h = md5(u.encode("utf-8")).digest()[:8]
            cache[u] = h
        out.append(h)
    if len(cache) > _TOKEN_HASH_CACHE_MAX:
        cache.clear()
    return np.frombuffer(b"".join(out), dtype=">u8").astype(np.uint64)


#: token pattern for the C-level Arrow tokenizer: splitting on runs of
#: NON-word chars (RE2 \p classes) yields exactly re.findall(r"\w+")'s
#: tokens after dropping the empty edge strings (differentially tested
#: against the Python tokenizer in tests)
_NONWORD_SPLIT = r"[^\p{L}\p{N}_]+"


def _simhash_batch(texts: "pa.Array", n: int) -> np.ndarray:
    """64-bit SimHash per text for one Arrow batch — C-level end to end.

    Tokenize with Arrow's RE2 split (no per-doc Python regex, no Python
    token strings except the UNIQUE vocabulary), ``dictionary_encode``
    to hash only the uniques (Zipf: uniques ≪ occurrences), then
    accumulate the ±1 bit votes. Two accumulation strategies by batch
    shape: a dense (docs × uniques) count matrix + one BLAS matmul when
    that matrix is small (always true for corpus-like vocabularies),
    else the sparse (doc, code) pair-count path. The hash of a token is
    the big-endian first 8 bytes of md5 — reproducible in oracle SQL
    (see ``simhash_sql``)."""
    import pyarrow.compute as pc

    splits = pc.split_pattern_regex(texts, _NONWORD_SPLIT)
    flat = pc.list_flatten(splits)
    parent = pc.list_parent_indices(splits)
    keep = pc.not_equal(flat, "")
    flat = pc.filter(flat, keep)
    parent = pc.filter(parent, keep)
    if not len(flat):
        return np.zeros(n, dtype=np.int64)
    dic = pc.dictionary_encode(flat)
    codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    doc_idx = parent.to_numpy(zero_copy_only=False).astype(np.int64)
    uniques = dic.dictionary.to_pylist()

    hashes = _token_hashes(uniques)
    shifts = np.arange(64, dtype=np.uint64)
    votes = (
        ((hashes[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.float64)
        * 2.0 - 1.0
    )  # (uniques, 64) in {-1, +1}
    n_uniq = len(uniques)
    # doubles are exact throughout (|votes·count| ≤ tokens/doc ≪ 2^53)
    if n * n_uniq <= 16_000_000:
        # dense: per-doc term-count matrix, votes via one matmul
        counts = np.bincount(
            doc_idx * np.int64(n_uniq) + codes, minlength=n * n_uniq
        ).astype(np.float64).reshape(n, n_uniq)
        acc = counts @ votes
    else:
        # sparse: compress occurrences to (doc, code) pair counts, then
        # per-bit weighted bincounts (C-speed histograms)
        pair, pcounts = np.unique(
            doc_idx * np.int64(n_uniq) + codes, return_counts=True
        )
        pdoc = (pair // n_uniq).astype(np.int64)
        pcode = (pair % n_uniq).astype(np.int64)
        w = pcounts.astype(np.float64)
        acc = np.empty((n, 64), dtype=np.float64)
        for j in range(64):
            acc[:, j] = np.bincount(
                pdoc, weights=w * votes[pcode, j], minlength=n
            )
    packed = ((acc > 0).astype(np.uint64) << shifts[None, :]).sum(
        axis=1, dtype=np.uint64
    )
    return packed.view(np.int64)  # two's-complement reinterpret


def _simhash_map(batches: "Iterator[pa.RecordBatch]") -> "Iterator[pa.RecordBatch]":
    """mapInArrow worker: (doc_id, text) batches → (doc_id, simhash).
    Arrow in, Arrow out — no pandas conversion on either side."""
    import pyarrow as pa

    for batch in batches:
        texts = batch.column("text")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        out = _simhash_batch(texts, batch.num_rows)
        yield pa.RecordBatch.from_arrays(
            [batch.column("doc_id"), pa.array(out, type=pa.int64())],
            ["doc_id", "simhash"],
        )


def simhash(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash) — 64-bit SimHash of the token multiset.

    Near-dups differ in few bits; :func:`simhash_pairs` does the
    hamming-join. Only (doc_id, text) cross the Python boundary
    (explicit select — mapInArrow is opaque to column pruning), and an
    under-split input (one small parquet file) is round-robin
    repartitioned to cluster width first so the kernel parallelizes —
    at scale inputs carry ≥ cores splits and the repartition is a no-op.
    """
    src = docs.select(F.col("doc_id").cast("long").alias("doc_id"), "text")
    par = docs.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < par:
        src = src.repartition(par)
    return src.mapInArrow(_simhash_map, schema="doc_id long, simhash long")


#: oracle twin of _simhash64: per (doc, bit) vote sums over md5-derived
#: 64-bit token hashes, packed to a signed BIGINT. 2^63/2^64 appear as
#: exact HUGEINT literals.
def simhash_sql() -> str:
    from glug_spark.semantics.tokenize import TOKEN_PATTERN

    return f"""
WITH toks AS (
    SELECT doc_id, unnest(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS term
    FROM documents
),
h AS (
    SELECT doc_id, ('0x' || substr(md5(term), 1, 16))::UBIGINT AS hv
    FROM toks
),
acc AS (
    SELECT doc_id, j,
           sum(CASE WHEN (hv >> j) & 1 = 1 THEN 1 ELSE -1 END) AS votes
    FROM h CROSS JOIN range(64) t(j)
    GROUP BY doc_id, j
),
packed AS (
    SELECT doc_id,
           sum(CASE WHEN votes > 0 THEN ((1::UBIGINT << j)::HUGEINT)
               ELSE 0::HUGEINT END) AS u
    FROM acc GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(
           CASE WHEN p.u >= 9223372036854775808::HUGEINT
                THEN p.u - 18446744073709551616::HUGEINT
                ELSE p.u END, 0) AS BIGINT) AS simhash
FROM documents d LEFT JOIN packed p ON p.doc_id = d.doc_id
"""


def simhash_pairs_sql(max_hamming: int = 3, n_bands: int = 4) -> str:
    """Oracle twin of :func:`simhash_pairs`: same pigeonhole banding and
    popcount verify over the simhash oracle."""
    width = 64 // n_bands
    mask = (1 << width) - 1
    return f"""
WITH sh AS ({simhash_sql()}),
u AS (
    SELECT doc_id,
           (CASE WHEN simhash < 0
                 THEN simhash::HUGEINT + 18446744073709551616::HUGEINT
                 ELSE simhash::HUGEINT END)::UBIGINT AS uh
    FROM sh
),
bands AS (
    SELECT doc_id, uh, b.band_id,
           (uh >> (b.band_id * {width})) & {mask} AS band_key
    FROM u CROSS JOIN range({n_bands}) b(band_id)
),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.uh, b.uh)) AS INT) AS hamming
    FROM bands a JOIN bands b
      ON a.band_id = b.band_id AND a.band_key = b.band_key
     AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, hamming FROM cand WHERE hamming <= {max_hamming}
"""


def simhash_pairs(docs: DataFrame, max_hamming: int = 3,
                  n_bands: int = 4) -> DataFrame:
    """(doc_a, doc_b, hamming) pairs with hamming(simhash) ≤ max_hamming.

    Pigeonhole banding: split the 64-bit hash into ``n_bands`` 16-bit
    bands — any pair within hamming ≤ n_bands-1 shares at least one
    exact band, so the self-join touches only same-band buckets (the
    web-scale trick from Manku et al., WWW'07); candidates are verified
    with an exact JVM popcount (bit_count), no UDF in the join path.
    """
    h = simhash(docs)
    width = 64 // n_bands
    bands = F.array(*[
        F.shiftrightunsigned(F.col("simhash"), b * width).bitwiseAND(
            F.lit((1 << width) - 1)
        )
        for b in range(n_bands)
    ])
    keyed = h.select(
        "doc_id", "simhash", F.posexplode(bands).alias("band_id", "band_key")
    )
    a = keyed.alias("a")
    b = keyed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
    )
    return cand.where(F.col("hamming") <= max_hamming)
