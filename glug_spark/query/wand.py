"""Index-backed top-k: segment-distributed MaxScore with block-max skip.

Query plan:

1. term→bucket via the same ``pmod(xxhash64(term), n_buckets)`` used at
   build → the posting scan prunes to the query terms' bucket
   partitions (partition pruning; everything else is never read).
2. term stats (df, idf) — a handful of rows, collected and closed over.
3. posting rows group by ``segment`` → ``applyInPandas`` scores each
   doc-space segment independently (segments partition doc space, so
   per-segment top-k sets cover the global top-k superset exactly).
4. global ``orderBy(score desc, doc_id).limit(k)`` → TakeOrdered merge.

Inside a segment (NumPy, vectorized):

- conjunctive: block-level skip — only blocks whose doc ranges
  intersect across ALL terms are decoded (``codec.decode_blocks``),
  then exact id intersection and full scoring.
- disjunctive: MaxScore — score the highest-upper-bound term's docs
  exactly to seed the threshold θ; terms whose upper-bound suffix sum
  < θ become non-essential; only docs present in essential lists can
  enter the top-k (docs absent from all essential lists are bounded by
  Σ non-essential ubs < θ). Exact, with whole lists of frequent terms
  skipped at the candidate-generation stage.

Scores are the same double math as the full-scan reference scorer
(query.bm25) — rank-identical output is asserted by tests, mirroring
the reference's differential parity strategy.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window, functions as F, types as T

from glug_spark.index import codec
from glug_spark.index.build import K1, B
from glug_spark.index.pipeline import python_bucket

_SCORE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("raw_score", T.DoubleType()),
])

#: collection stats are immutable per index build → cache per index_dir
_COLLECTION_CACHE: dict[str, dict] = {}


def _collection(spark: SparkSession, index_dir: str) -> dict:
    row = _COLLECTION_CACHE.get(index_dir)
    if row is None:
        row = spark.read.parquet(f"{index_dir}/collection").collect()[0].asDict()
        _COLLECTION_CACHE[index_dir] = row
    return row


def _term_buckets(spark: SparkSession, terms: list[str], n_buckets: int) -> dict[str, int]:
    return {t: python_bucket(t, n_buckets) for t in terms}


def _contribution(tfs: np.ndarray, dls: np.ndarray, idf: float, avgdl: float) -> np.ndarray:
    tfs = tfs.astype(np.float64)
    return idf * (tfs * (K1 + 1.0)) / (tfs + K1 * (1.0 - B + B * dls.astype(np.float64) / avgdl))


def _upper_bound(max_tf: float, idf: float) -> float:
    # dl→0 bound: tf(k1+1)/(tf + k1(1-b)) is increasing in tf, maximal as dl→0
    return idf * (max_tf * (K1 + 1.0)) / (max_tf + K1 * (1.0 - B))


def _sorted_lists(parts) -> dict:
    ids_l, tfs_l, dls_l = parts
    if not ids_l:
        z = np.zeros(0, np.int64)
        return {"ids": z, "tfs": z.copy(), "dls": z.copy()}
    ids = np.concatenate(ids_l)
    order = np.argsort(ids, kind="stable")
    return {
        "ids": ids[order],
        "tfs": np.concatenate(tfs_l)[order],
        "dls": np.concatenate(dls_l)[order],
    }


def _decode_full(grp: pd.DataFrame) -> dict:
    """All rows of one term fully decoded, doc_id-sorted."""
    ids_l, tfs_l, dls_l = [], [], []
    for gaps, tfb, dlb in zip(grp["doc_gaps"], grp["tfs"], grp["dls"]):
        ids_l.append(codec.delta_decode(codec.varbyte_decode(gaps)).astype(np.int64))
        tfs_l.append(codec.varbyte_decode(tfb).astype(np.int64))
        dls_l.append(codec.varbyte_decode(dlb).astype(np.int64))
    return _sorted_lists((ids_l, tfs_l, dls_l))


def _decode_covering(grp: pd.DataFrame, targets: np.ndarray) -> dict:
    """Block-selective decode: only the blocks that can contain a target
    doc_id are touched (the block-max skip — a frequent term's long list
    is read a few 128-posting blocks at a time, not end to end)."""
    if not len(targets):
        return _sorted_lists(([], [], []))
    ids_l, tfs_l, dls_l = [], [], []
    for row in grp.to_dict("records"):
        block_last = np.asarray(row["block_last"], dtype=np.int64)
        if not len(block_last):
            continue
        blocks = np.unique(np.searchsorted(block_last, targets, side="left"))
        blocks = blocks[blocks < len(block_last)]
        if not len(blocks):
            continue
        ids, tfs, dls = codec.decode_blocks(row, blocks)
        ids_l.append(ids)
        tfs_l.append(tfs)
        dls_l.append(dls)
    return _sorted_lists((ids_l, tfs_l, dls_l))


def _term_max_tf(grp: pd.DataFrame) -> int:
    maxtf = 0
    for bmt in grp["block_max_tf"]:
        if len(bmt):
            maxtf = max(maxtf, int(max(bmt)))
    return maxtf


def _score_candidates(cand: np.ndarray, lists: dict[str, dict],
                      idfs: dict[str, float], avgdl: float) -> np.ndarray:
    scores = np.zeros(len(cand), dtype=np.float64)
    for term, lst in lists.items():
        pos = np.searchsorted(lst["ids"], cand)
        pos_c = np.minimum(pos, len(lst["ids"]) - 1) if len(lst["ids"]) else pos
        hit = len(lst["ids"]) > 0
        if not hit:
            continue
        mask = lst["ids"][pos_c] == cand
        contrib = _contribution(lst["tfs"][pos_c], lst["dls"][pos_c],
                                idfs[term], avgdl)
        scores += np.where(mask, contrib, 0.0)
    return scores


def _conjunctive_blocks(rows_by_term: pd.DataFrame, terms: list[str]) -> dict[str, dict]:
    """Block-skip decode for AND queries: a term's block is decoded only
    if its doc range can intersect every other term's covered ranges."""
    metas = {}
    for term, grp in rows_by_term.groupby("term", sort=False):
        # (row, block_first, block_last) per block across segment rows
        entries = []
        for row in grp.to_dict("records"):
            last = np.asarray(row["block_last"], dtype=np.int64)
            if not len(last):
                continue
            first = np.empty_like(last)
            first[0] = -(2**62)
            first[1:] = last[:-1] + 1
            entries.append((row, first, last))
        metas[term] = entries

    # global candidate range intersection: [max of min-last, min of max-last]
    lo = max(
        (min(e[1][0] for e in entries) for entries in metas.values() if entries),
        default=0,
    )
    decoded: dict[str, dict] = {}
    for term, entries in metas.items():
        ids_l, tfs_l, dls_l, maxtf = [], [], [], 0
        for row, first, last in entries:
            keep = np.flatnonzero(last >= lo)  # cheap range prune
            if not len(keep):
                continue
            ids, tfs, dls = codec.decode_blocks(row, keep)
            ids_l.append(ids)
            tfs_l.append(tfs)
            dls_l.append(dls)
            maxtf = max(maxtf, int(max(row["block_max_tf"])))
        if not ids_l:
            decoded[term] = {"ids": np.zeros(0, np.int64),
                             "tfs": np.zeros(0, np.int64),
                             "dls": np.zeros(0, np.int64), "max_tf": 0}
            continue
        ids = np.concatenate(ids_l)
        order = np.argsort(ids, kind="stable")
        decoded[term] = {"ids": ids[order],
                         "tfs": np.concatenate(tfs_l)[order],
                         "dls": np.concatenate(dls_l)[order],
                         "max_tf": maxtf}
    return decoded


def make_segment_scorer(terms: list[str], idfs: dict[str, float], avgdl: float,
                        k: int, conjunctive: bool):
    uniq_terms = list(dict.fromkeys(terms))

    def score_segment(pdf: pd.DataFrame) -> pd.DataFrame:
        if conjunctive:
            lists = _conjunctive_blocks(pdf, uniq_terms)
            present = [lists[t] for t in uniq_terms if t in lists]
            if len(present) < len(uniq_terms) or any(
                len(p["ids"]) == 0 for p in present
            ):
                return pd.DataFrame({"doc_id": [], "raw_score": []}).astype(
                    {"doc_id": "int64", "raw_score": "float64"}
                )
            cand = present[0]["ids"]
            for p in present[1:]:
                cand = cand[np.isin(cand, p["ids"], assume_unique=True)]
            scores = _score_candidates(cand, lists, idfs, avgdl)
        else:
            # --- block-max MaxScore with lazy, block-selective decode ---
            groups = {t: g for t, g in pdf.groupby("term", sort=False)}
            ubs = {
                t: _upper_bound(_term_max_tf(g), idfs[t])
                for t, g in groups.items()  # metadata only, no blob decode
            }
            by_ub = sorted(groups, key=lambda t: -ubs[t])

            # pass 1: fully decode ONLY the top-ub term; its docs seed θ.
            # Other terms contribute via block-selective decode covering
            # the seed ids (skipped blocks are never even varbyte-decoded).
            lists = {by_ub[0]: _decode_full(groups[by_ub[0]])}
            seed = lists[by_ub[0]]["ids"]
            for t in by_ub[1:]:
                lists[t] = _decode_covering(groups[t], seed)
            seed_scores = _score_candidates(seed, lists, idfs, avgdl)
            if len(seed_scores) >= k:
                theta = np.partition(seed_scores, -k)[-k]
            else:
                theta = -np.inf

            # non-essential suffix: the maximal low-ub suffix with Σub < θ —
            # a doc found ONLY in those lists is bounded below θ, so the
            # candidate set is the union of the remaining (essential) lists
            essential = []
            suffix_sum = 0.0
            for t in reversed(by_ub):
                if suffix_sum + ubs[t] < theta:
                    suffix_sum += ubs[t]
                else:
                    essential.append(t)
            if not essential:
                essential = [by_ub[0]]

            # essential terms (candidate generators) need their full lists;
            # non-essential terms only need blocks covering the candidates
            for t in essential:
                if t != by_ub[0]:
                    lists[t] = _decode_full(groups[t])
            cand = np.unique(np.concatenate([lists[t]["ids"] for t in essential]))
            for t in by_ub:
                if t not in essential:
                    lists[t] = _decode_covering(groups[t], cand)
            scores = _score_candidates(cand, lists, idfs, avgdl)

        # segment-local top-k in the GLOBAL order (score desc, doc_id asc):
        # the global top-k takes at most k rows from this segment, and they
        # are exactly the segment's first k under the same order.
        if len(cand) > k:
            order = np.lexsort((cand, -scores))[:k]
            cand, scores = cand[order], scores[order]
        return pd.DataFrame({"doc_id": cand.astype("int64"),
                             "raw_score": scores.astype("float64")})

    return score_segment


def wand_topk(
    spark: SparkSession,
    index_dir: str,
    terms: list[str],
    k: int = 10,
    conjunctive: bool = False,
    n_buckets: int = 16,
) -> DataFrame:
    """Top-k (rank, doc_id, score) from the encoded index — must be
    rank-identical to query.bm25.bm25_topk on the same corpus."""
    uniq = list(dict.fromkeys(terms))
    buckets = sorted(set(_term_buckets(spark, uniq, n_buckets).values()))

    stats = (
        spark.read.parquet(f"{index_dir}/term_stats")
        .where(F.col("bucket").isin(buckets) & F.col("term").isin(uniq))
        .select("term", "df", "idf")
        .collect()
    )
    idfs = {r["term"]: r["idf"] for r in stats}
    if conjunctive and len(idfs) < len(uniq):
        return spark.createDataFrame([], "rank int, doc_id long, score double")
    avgdl = _collection(spark, index_dir)["avgdl"]

    rows = (
        spark.read.parquet(f"{index_dir}/postings")
        .where(F.col("bucket").isin(buckets) & F.col("term").isin(list(idfs)))
        # column-prune the positions blob (the largest column): scoring
        # never touches it — only the phrase path reads positions
        .select(
            "term", "segment", "df_local", "doc_gaps", "tfs", "dls",
            "block_last", "block_max_tf",
            "gap_offsets", "tf_offsets", "dl_offsets",
        )
    )
    scorer = make_segment_scorer(uniq, idfs, avgdl, k, conjunctive)
    per_segment = rows.groupBy("segment").applyInPandas(
        lambda pdf: scorer(pdf), schema=_SCORE_SCHEMA
    )
    topk = per_segment.orderBy(F.desc("raw_score"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("raw_score"), F.asc("doc_id"))
    return topk.select(
        F.row_number().over(w).alias("rank"),
        F.col("doc_id"),
        F.round(F.col("raw_score"), 6).alias("score"),
    )


def docs_with_any(
    spark: SparkSession,
    index_dir: str,
    terms: list[str],
    n_buckets: int = 16,
) -> DataFrame:
    """Distinct doc_ids containing ANY of ``terms`` — the semi/anti-join
    building block for composed queries (group filters, negation)."""
    uniq = list(dict.fromkeys(terms))
    if not uniq:
        return spark.createDataFrame([], "doc_id long")
    buckets = sorted({python_bucket(t, n_buckets) for t in uniq})
    rows = (
        spark.read.parquet(f"{index_dir}/postings")
        .where(F.col("bucket").isin(buckets) & F.col("term").isin(uniq))
        .select("segment", "doc_gaps")
    )

    def decode(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = [
            codec.delta_decode(codec.varbyte_decode(g)).astype(np.int64)
            for g in pdf["doc_gaps"]
        ]
        out = np.unique(np.concatenate(ids)) if ids else np.zeros(0, np.int64)
        return pd.DataFrame({"doc_id": out})

    return rows.groupBy("segment").applyInPandas(
        lambda pdf: decode(pdf),
        schema=T.StructType([T.StructField("doc_id", T.LongType())]),
    ).distinct()


def glob_topk(
    spark: SparkSession,
    index_dir: str,
    glob: str,
    k: int = 10,
    n_buckets: int = 16,
) -> DataFrame:
    """Glob-pattern query from the index: expand the pattern against the
    vocabulary (term_stats is vocab-sized — tiny next to the corpus),
    then score the matching terms disjunctively."""
    from glug_spark.semantics.glob import full_match_regex

    pattern = full_match_regex(glob)
    terms = [
        r["term"]
        for r in spark.read.parquet(f"{index_dir}/term_stats")
        .where(F.col("term").rlike(pattern))
        .select("term")
        .collect()
    ]
    if not terms:
        return spark.createDataFrame([], "rank int, doc_id long, score double")
    return wand_topk(spark, index_dir, terms, k=k, n_buckets=n_buckets)


def phrase_docs_indexed(
    spark: SparkSession,
    index_dir: str,
    phrase: list[str],
    n_buckets: int = 16,
) -> DataFrame:
    """Phrase match from position lists — doc_ids containing the exact
    adjacent-token phrase; rank-identical to query.bm25.phrase_docs."""
    uniq = list(dict.fromkeys(phrase))
    buckets = sorted(set(_term_buckets(spark, uniq, n_buckets).values()))
    rows = (
        spark.read.parquet(f"{index_dir}/postings")
        .where(F.col("bucket").isin(buckets) & F.col("term").isin(uniq))
        .drop("bucket")
    )

    words = list(phrase)

    def match_segment(pdf: pd.DataFrame) -> pd.DataFrame:
        per_term: dict[str, dict] = {}
        for term, grp in pdf.groupby("term", sort=False):
            ids_l, tfs_l, pos_l = [], [], []
            for gaps, tfb, posb in zip(
                grp["doc_gaps"], grp["tfs"], grp["positions"]
            ):
                ids = codec.delta_decode(codec.varbyte_decode(gaps)).astype(np.int64)
                tfs = codec.varbyte_decode(tfb).astype(np.int64)
                plists = codec.decode_positions(posb, tfs)
                ids_l.append(ids)
                tfs_l.append(tfs)
                pos_l.extend(plists)
            ids = np.concatenate(ids_l) if ids_l else np.zeros(0, np.int64)
            per_term[term] = {"ids": ids, "plists": pos_l}
        if any(w not in per_term or len(per_term[w]["ids"]) == 0 for w in words):
            return pd.DataFrame({"doc_id": []}).astype({"doc_id": "int64"})

        cand = per_term[words[0]]["ids"]
        for w_ in words[1:]:
            cand = cand[np.isin(cand, per_term[w_]["ids"], assume_unique=True)]
        hits = []
        index_of = {
            w_: {int(d): i for i, d in enumerate(per_term[w_]["ids"])} for w_ in set(words)
        }
        for d in cand:
            spots = per_term[words[0]]["plists"][index_of[words[0]][int(d)]]
            spots = np.asarray(spots, dtype=np.int64)
            for offset, w_ in enumerate(words[1:], start=1):
                nxt = np.asarray(
                    per_term[w_]["plists"][index_of[w_][int(d)]], dtype=np.int64
                )
                spots = spots[np.isin(spots + offset, nxt)]
                if not len(spots):
                    break
            if len(spots):
                hits.append(int(d))
        return pd.DataFrame({"doc_id": hits}).astype({"doc_id": "int64"})

    matched = rows.groupBy("segment").applyInPandas(
        match_segment, schema=T.StructType([T.StructField("doc_id", T.LongType())])
    )
    return matched.orderBy("doc_id")
