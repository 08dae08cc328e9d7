"""Query-many handle: one index opened once, many low-latency queries.

The module-level functions in :mod:`glug_spark.query.wand` re-read the
index metadata per call — always correct, but each query pays parquet
listing/footers, a stats lookup job and plan analysis again (~2× the
latency of the query itself on a warm executor). A :class:`Searcher`
is the service shape: it opens the index ONCE, pins the tiny metadata
(collection stats, segment map) on the driver, keeps the postings /
term_stats DataFrames analyzed, and optionally ``persist()``s them.

Scale posture: term_stats is vocab-sized (fine to persist); postings
persist is a knob — on a 100 TB index you leave it off and let
executor-side page cache + bucket pruning do the work, on a hot-bucket
service you persist just the DataFrame (partition-level MEMORY_AND_DISK
eviction keeps it bounded). NOTHING corpus-sized is ever collected.

A Searcher snapshots the index layout at open time: reopen after
``compact_index``, stream ingestion, or ``delete_docs``/``purge_deletes``
(the tombstone set is pinned with the rest of the metadata).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from glug_spark.query import wand
from glug_spark.query.parser import parse_query
from glug_spark.index.pipeline import python_bucket


class Searcher:
    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        n_buckets: int = 16,
        persist: bool = True,
    ) -> None:
        from glug_spark.index.compact import read_segmap

        self.spark = spark
        self.index_dir = index_dir
        self.n_buckets = n_buckets
        self._persisted: list[DataFrame] = []

        self.postings = spark.read.parquet(f"{index_dir}/postings")
        self.term_stats = spark.read.parquet(f"{index_dir}/term_stats")
        self.segmap = read_segmap(spark, index_dir)
        coll = spark.read.parquet(f"{index_dir}/collection").collect()[0]
        self.avgdl = float(coll["avgdl"])
        self.n_docs = int(coll["n_docs"])
        from glug_spark.index.deletes import read_deleted_ids

        #: merge-on-read tombstone set, pinned at open like the segmap.
        #: Shipped as a Spark broadcast (torrent, cached per executor
        #: across this Searcher's queries) instead of riding every
        #: query job's task closure — at production tombstone counts
        #: between purges the closure would re-serialize MBs per query.
        arr = read_deleted_ids(spark, index_dir)
        self.deleted = (
            None if arr is None else spark.sparkContext.broadcast(arr)
        )
        if persist:
            for df in (self.postings, self.term_stats):
                df.persist()
                self._persisted.append(df)
            # materialize metadata eagerly; postings fill lazily per bucket
            self.term_stats.count()
            self._warm()

    def _warm(self) -> None:
        """Front-load the first query's fixed costs at open time (the
        service shape pays them once per handle, not on a user query):
        spin up the Arrow Python workers with a one-row groupBy kernel
        job, and touch the postings parquet footers via a metadata-only
        count (column-pruned count-star — no posting blob is read, and
        the persisted cache is NOT materialized)."""
        import pandas as pd  # noqa: F401 — worker-side import warm

        (
            self.spark.createDataFrame([(1,)], "x int")
            .groupBy("x")
            .applyInPandas(lambda p: p, schema="x int")
            .count()
        )
        self.spark.read.parquet(f"{self.index_dir}/postings").count()

    def close(self) -> None:
        for df in self._persisted:
            df.unpersist()
        self._persisted.clear()
        if self.deleted is not None:
            self.deleted.unpersist()
            self.deleted = None

    def __enter__(self) -> "Searcher":
        return self

    def __exit__(self, *exc: object) -> None:
        self.close()

    # --- internals -------------------------------------------------------

    def _with_grp(self, rows: DataFrame) -> DataFrame:
        if self.segmap is None:
            return rows.withColumn("grp", F.col("segment"))
        return rows.join(F.broadcast(self.segmap), "segment", "left").withColumn(
            "grp", F.coalesce("grp", F.col("segment"))
        )

    def attach_urls(self, results: DataFrame,
                    snippet_terms: list[str] | None = None) -> DataFrame:
        """Join each result row's ``url`` (and, with ``snippet_terms``,
        a ``snippet``) from the index's docmap side table — a k-row
        lookup, never a corpus scan: the (tiny) result set is broadcast
        onto the doc_id-bucketed map and the join key includes the
        partition column ``doc_bucket``, so the scan prunes to at most
        k of the map's partition directories (dynamic partition
        pruning; plan-asserted in tests). The snippet is the
        deterministic match window of query.snippet computed on the doc
        store's ``text`` column — read only for the pruned buckets, and
        not read at all for url-only lookups (parquet column pruning)."""
        from glug_spark.index.pipeline import (
            docmap_n_buckets,
            read_docmap,
        )
        from glug_spark.query.snippet import snippet_col

        dm = read_docmap(self.spark, self.index_dir)
        if dm is None:
            raise FileNotFoundError(
                f"{self.index_dir}/docmap does not exist — the index "
                "predates docmap; rebuild (build_index writes it) to "
                "use with_urls"
            )
        n = docmap_n_buckets(self.spark, self.index_dir)
        res = results.withColumn(
            "doc_bucket",
            F.pmod(F.col("doc_id"), F.lit(n)).cast("int"),
        )
        out_cols = [c for c in results.columns]
        side: list[F.Column] = [F.col("url")]
        dm_cols = ["doc_bucket", "doc_id", "url"]
        if snippet_terms is not None:
            if "text" not in dm.columns:
                raise FileNotFoundError(
                    f"{self.index_dir}/docmap has no text column — the "
                    "index predates the doc store; rebuild to use "
                    "with_snippets"
                )
            dm_cols.append("text")
            side.append(
                snippet_col(snippet_terms, F.col("text")).alias("snippet")
            )
        return (
            dm.select(*dm_cols)
            .join(F.broadcast(res), ["doc_bucket", "doc_id"])
            .select(*out_cols, *side)
        )

    # --- queries ----------------------------------------------------------

    def topk(self, terms: list[str], k: int = 10,
             conjunctive: bool = False,
             with_urls: bool = False,
             with_snippets: bool = False) -> DataFrame:
        """Rank-identical to wand.wand_topk over the same index.

        Single Spark job: idf rides a broadcast stats join instead of a
        separate driver lookup (a vocab-absent term simply joins to
        nothing; the conjunctive scorer already returns empty when a
        term's list is missing from its group)."""
        uniq = list(dict.fromkeys(terms))
        buckets = sorted({python_bucket(t, self.n_buckets) for t in uniq})
        stats = (
            self.term_stats
            .where(F.col("bucket").isin(buckets) & F.col("term").isin(uniq))
            .select("term", "idf")
        )
        rows = self._with_grp(
            self.postings
            .where(F.col("bucket").isin(buckets) & F.col("term").isin(uniq))
            .select(*wand._SCORING_COLS)
            .join(F.broadcast(stats), "term")
        )
        scorer = wand.make_segment_scorer(
            uniq, None, self.avgdl, k, conjunctive, deleted=self.deleted
        )
        per_group = wand.scorer_partitions(rows).groupBy("grp").applyInPandas(
            lambda pdf: scorer(pdf), schema=wand._SCORE_SCHEMA
        )
        out = wand._ranked_bounded(per_group, k)
        if with_urls or with_snippets:
            return self.attach_urls(
                out, snippet_terms=uniq if with_snippets else None
            )
        return out

    def topk_many(self, queries: dict[str, list[str]], k: int = 10) -> DataFrame:
        """MANY disjunctive top-k queries in ONE Spark job:
        (query_id, rank, doc_id, score).

        The per-query latency floor at local[*] is the Arrow groupBy
        round trip (~0.3 s regardless of data); batching amortizes it —
        the rows of each query's terms are tagged with query_id via a
        broadcast join (a term shared by multiple queries fans out one
        row per query), one exchange co-locates (grp), and the scorer
        runs the MaxScore kernel per (query, group). Each query's
        result is rank-identical to :meth:`topk` (asserted by tests).
        """
        import pandas as pd
        from pyspark.sql import types as T

        qitems = [(qid, t) for qid, terms in queries.items()
                  for t in dict.fromkeys(terms)]
        if not qitems:
            return self.spark.createDataFrame(
                [], "query_id string, rank int, doc_id long, score double"
            )
        qterms = self.spark.createDataFrame(
            qitems, "query_id string, term string"
        )
        all_terms = sorted({t for _, t in qitems})
        buckets = sorted({python_bucket(t, self.n_buckets) for t in all_terms})
        stats = (
            self.term_stats
            .where(F.col("bucket").isin(buckets) & F.col("term").isin(all_terms))
            .select("term", "idf")
        )
        rows = self._with_grp(
            self.postings
            .where(F.col("bucket").isin(buckets) & F.col("term").isin(all_terms))
            .select(*wand._SCORING_COLS)
            .join(F.broadcast(qterms), "term")
            .join(F.broadcast(stats), "term")
        )
        terms_by_query = {qid: list(dict.fromkeys(t)) for qid, t in queries.items()}
        avgdl = self.avgdl
        deleted = self.deleted

        schema = T.StructType([
            T.StructField("query_id", T.StringType()),
            T.StructField("doc_id", T.LongType()),
            T.StructField("raw_score", T.DoubleType()),
        ])

        def score_group(pdf: pd.DataFrame) -> pd.DataFrame:
            outs = []
            for qid, qpdf in pdf.groupby("query_id", sort=False):
                scorer = wand.make_segment_scorer(
                    terms_by_query[qid], None, avgdl, k, False,
                    deleted=deleted,
                )
                res = scorer(qpdf)
                res.insert(0, "query_id", qid)
                outs.append(res)
            return pd.concat(outs) if outs else pd.DataFrame(
                {"query_id": [], "doc_id": [], "raw_score": []}
            ).astype({"query_id": "object", "doc_id": "int64",
                      "raw_score": "float64"})

        per_group = wand.scorer_partitions(rows).groupBy("grp").applyInPandas(score_group, schema=schema)
        from pyspark.sql import Window as W

        w = W.partitionBy("query_id").orderBy(
            F.desc("raw_score"), F.asc("doc_id")
        )
        return (
            per_group.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "doc_id",
                    F.round("raw_score", 6).alias("score"))
        )

    def composed_topk(self, groups: list[list[tuple[str, str]]],
                      negations: list[tuple[str, str]] | None = None,
                      phrases: list[list[str]] | None = None,
                      k: int = 10,
                      nears: list[tuple[str, str, int, bool]] | None = None,
                      ) -> DataFrame:
        negations = negations or []
        phrases = phrases or []
        nears = nears or []
        pos_words = list(dict.fromkeys(
            [w for ph in phrases for w in ph]
            + [w for a, b, _, _ in nears for w in (a, b)]
        ))
        if not groups and not pos_words:
            raise ValueError("composed query has no positive constraint")
        members = wand.build_members(
            self.term_stats, groups, negations, pos_words
        )
        return wand._composed_from_parts(
            self.spark, self.postings, members, self._with_grp, self.avgdl,
            groups, negations, phrases, k, self.n_buckets,
            nears=nears,
            deleted=self.deleted,
        )

    def glob_topk(self, glob: str, k: int = 10) -> DataFrame:
        return self.composed_topk(groups=[[("glob", glob)]], k=k)

    def search(self, query: str, k: int = 10,
               with_urls: bool = False,
               with_snippets: bool = False) -> DataFrame:
        """glug-dialect query string → exact top-k (see execute.search).

        Snippets use the query's literal positive terms plus its phrase
        words (a glob's matched vocabulary is per-doc, so glob-only
        queries yield NULL snippets by the closed-form rule)."""
        plan = parse_query(query)
        if not plan.groups and not plan.phrases and not plan.nears:
            raise ValueError(f"query has no positive constraint: {query!r}")
        out = self.composed_topk(
            groups=plan.groups, negations=plan.negations,
            phrases=plan.phrases, k=k, nears=plan.nears,
        )
        if with_urls or with_snippets:
            terms = None
            if with_snippets:
                terms = list(dict.fromkeys(
                    plan.positive_terms
                    + [w for p in plan.phrases for w in p]
                    + plan.near_words
                ))
            return self.attach_urls(out, snippet_terms=terms)
        return out

    def search_many(self, queries: dict[str, str], k: int = 10) -> DataFrame:
        """MANY glug-dialect query strings in ONE Spark job:
        (query_id, rank, doc_id, score). The composed analog of
        :meth:`topk_many` — per-query role columns ride one unioned
        broadcast members table; the exact filtered MaxScore kernel
        runs per (query, doc-group). Each slice is rank-identical to
        :meth:`search` (asserted by tests)."""
        import pandas as pd
        from pyspark.sql import types as T

        plans = {}
        for qid, q in queries.items():
            plan = parse_query(q)
            if not plan.groups and not plan.phrases and not plan.nears:
                raise ValueError(f"query has no positive constraint: {q!r}")
            plans[qid] = plan
        if not plans:
            return self.spark.createDataFrame(
                [], "query_id string, rank int, doc_id long, score double"
            )

        members = None
        any_positions = False
        all_member_lists = []
        for qid, plan in plans.items():
            pw = list(dict.fromkeys(
                [w for ph in plan.phrases for w in ph] + plan.near_words
            ))
            any_positions = any_positions or bool(pw)
            m = wand.build_members(
                self.term_stats, plan.groups, plan.negations, pw
            ).withColumn("query_id", F.lit(qid))
            members = m if members is None else members.unionByName(m)
            all_member_lists.append(
                [mm for g in plan.groups for mm in g] + plan.negations
                + [("term", w) for w in pw]
            )

        # scan pruning, same as composed_topk but unioned across the
        # batch: bucket partitions prune when EVERY query's members are
        # explicit terms; the pushable (In|StartsWith) conjunct applies
        # when every query has a pushable form — row-group skipping on
        # the term-sorted layout, exact semantics still ride the join
        postings = self.postings
        flat = [m for lst in all_member_lists for m in lst]
        if all(kind == "term" for kind, _ in flat):
            buckets = sorted({
                python_bucket(v, self.n_buckets) for _, v in flat
            })
            postings = postings.where(F.col("bucket").isin(buckets))
        pushables = [wand._pushable_member_pred(lst) for lst in all_member_lists]
        if all(p is not None for p in pushables):
            pred = pushables[0]
            for p in pushables[1:]:
                pred = pred | p
            postings = postings.where(pred)

        cols = wand._SCORING_COLS + (
            ["positions", "pos_offsets"] if any_positions else []
        )
        rows = self._with_grp(
            postings.select(*cols).join(F.broadcast(members), "term")
        )

        meta = {
            qid: (len(plan.groups), plan.phrases, plan.nears)
            for qid, plan in plans.items()
        }
        avgdl = self.avgdl
        deleted = self.deleted

        schema = T.StructType([
            T.StructField("query_id", T.StringType()),
            T.StructField("doc_id", T.LongType()),
            T.StructField("raw_score", T.DoubleType()),
        ])

        def score_group(pdf: pd.DataFrame) -> pd.DataFrame:
            outs = []
            for qid, qpdf in pdf.groupby("query_id", sort=False):
                n_groups, phrases, nears = meta[qid]
                scorer = wand.make_composed_scorer(n_groups, phrases, avgdl,
                                                   k, nears=nears,
                                                   deleted=deleted)
                res = scorer(qpdf)
                res.insert(0, "query_id", qid)
                outs.append(res)
            return pd.concat(outs) if outs else pd.DataFrame(
                {"query_id": [], "doc_id": [], "raw_score": []}
            ).astype({"query_id": "object", "doc_id": "int64",
                      "raw_score": "float64"})

        per_group = wand.scorer_partitions(rows).groupBy("grp").applyInPandas(score_group, schema=schema)
        from pyspark.sql import Window as W

        w = W.partitionBy("query_id").orderBy(
            F.desc("raw_score"), F.asc("doc_id")
        )
        return (
            per_group.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "doc_id",
                    F.round("raw_score", 6).alias("score"))
        )

    def phrase_docs(self, phrase: list[str]) -> DataFrame:
        uniq = list(dict.fromkeys(phrase))
        buckets = sorted({python_bucket(t, self.n_buckets) for t in uniq})
        rows = self._with_grp(
            self.postings
            .where(F.col("bucket").isin(buckets) & F.col("term").isin(uniq))
            .drop("bucket")
        )
        words = list(phrase)
        deleted = self.deleted

        import pandas as pd
        from pyspark.sql import types as T

        def match_segment(pdf: pd.DataFrame) -> pd.DataFrame:
            from glug_spark.index.deletes import (
                not_deleted_mask, resolve_deleted,
            )

            hits = wand._phrase_hits_segment(pdf, words)
            hits = hits[not_deleted_mask(resolve_deleted(deleted), hits)]
            return pd.DataFrame({"doc_id": hits}).astype({"doc_id": "int64"})

        matched = wand.scorer_partitions(rows).groupBy("grp").applyInPandas(
            match_segment,
            schema=T.StructType([T.StructField("doc_id", T.LongType())]),
        )
        return wand._sorted_docs(matched)

    def near_docs(self, term_a: str, term_b: str, slop: int = 3,
                  ordered: bool = False) -> DataFrame:
        """Proximity (NEAR) match over the pinned postings — same
        output as wand.near_docs_indexed on this index."""
        uniq = list(dict.fromkeys([term_a, term_b]))
        buckets = sorted({python_bucket(t, self.n_buckets) for t in uniq})
        rows = self._with_grp(
            self.postings
            .where(F.col("bucket").isin(buckets) & F.col("term").isin(uniq))
            .drop("bucket")
        )

        import pandas as pd
        from pyspark.sql import types as T

        deleted = self.deleted

        def match_segment(pdf: pd.DataFrame) -> pd.DataFrame:
            from glug_spark.index.deletes import (
                not_deleted_mask, resolve_deleted,
            )

            hits = wand._near_hits_segment(pdf, term_a, term_b, slop,
                                           ordered)
            hits = hits[not_deleted_mask(resolve_deleted(deleted), hits)]
            return pd.DataFrame({"doc_id": hits}).astype({"doc_id": "int64"})

        matched = wand.scorer_partitions(rows).groupBy("grp").applyInPandas(
            match_segment,
            schema=T.StructType([T.StructField("doc_id", T.LongType())]),
        )
        return wand._sorted_docs(matched)
