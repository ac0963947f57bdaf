"""The reference's complete user surface as one engine class.

A user of the reference does four things (SURVEY §3): stage documents
(/root/reference/AI.py:191-201), build the vector index (AI.py:48-96),
ask questions against it (AI.py:163-185), and manage per-session chat
history (AI.py:155-161,232-235). ``RagEngine`` exposes exactly those
verbs on Spark:

- ``index_documents`` / ``index_files`` — chunk → embed → parquet
  index, content-hash incremental (the reference's LRU memoization at
  AI.py:89-96, storage-backed — re-indexing unchanged content embeds
  nothing).
- ``retrieve`` / ``ask`` — embed question → top-k cosine
  (TakeOrderedAndProject) → order-preserving context stuffing →
  pluggable answerer → refusal/first-line post-processing
  (AI.py:176-185). The query *rewrite hook* (AI.py:137-139) is
  pluggable and defaults to pass-through, which is also the reference's
  effective behavior (its history is never written — SURVEY §3.2).
- ``history`` / ``clear_session`` — append-only per-session message
  log with get-or-create and clear semantics (AI.py:155-161,29-30).
  The log lives driver-side like the reference's in-process ``store``
  dict; the scale path for massive event logs is the streaming surface
  (streaming/session_state.py), not this convenience store.

The LLM call itself stays outside the deterministic engine (SURVEY
§3.2 non-goal): ``answerer`` is any ``(question, context) -> str``
callable; the default answers extractively from the best chunk so the
whole pipeline is deterministic and testable.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.chunker import DEFAULT_CHUNK_SIZE
from .functions.embedder import EMBED_DIM, embed_text
from .operators.retrieval import (
    DEFAULT_K,
    REFUSAL_PREFIX,
    postprocess_answers,
    topk_cosine,
    write_index_incremental,
)
from .sources.binary_docs import load_binary_documents, utf8_extractor


def passthrough_rewrite(question: str, history: list[dict]) -> str:
    """Default query-rewrite hook: identity. The reference wires a
    history-aware rewriter (AI.py:137-139) but never populates the
    history it reads, so pass-through is its effective behavior."""
    return question


_ANAPHORA = frozenset(
    "it they them that this these those he she its their what about more".split()
)
_STOPWORDS = frozenset(
    (
        "a an the and or but if then else of in on at to for with by from as is are "
        "was were be been being do does did have has had will would can could should "
        "i you we they he she it my your our what which who when where why how not no"
    ).split()
)


def history_aware_rewrite(question: str, history: list[dict]) -> str:
    """Deterministic stand-in for the reference's history-aware
    retriever prompt (AI.py:137-139, LangChain
    ``create_history_aware_retriever``: question + chat history →
    standalone question). A follow-up question that cannot stand alone
    — short, or leaning on anaphora ("what about X?", "why is that?")
    — is contextualized by appending the salient content words of the
    most recent turns (stopword-filtered, frequency-then-recency
    ranked), so retrieval sees the topic the pronoun points at.
    Standalone questions pass through untouched.

    No model call: the rewrite must be reproducible for tests and
    oracle runs, exactly like the engine's extractive default answerer."""
    if not history:
        return question
    # stripped forms serve BOTH the anaphora check and the exclusion
    # test below — an unstripped 'shipping?' must still exclude
    # 'shipping' from the appended context
    q_tokens = [t.strip("?.,!") for t in question.lower().split()]
    q_tokens = [t for t in q_tokens if t]
    needs_context = len(q_tokens) < 4 or any(t in _ANAPHORA for t in q_tokens)
    if not needs_context:
        return question
    freq: dict[str, int] = {}
    order: dict[str, int] = {}
    for i, msg in enumerate(history[-4:]):
        for raw in msg.get("content", "").lower().split():
            w = raw.strip("?.,!:;\"'()")
            if len(w) < 3 or w in _STOPWORDS or w in q_tokens:
                continue
            freq[w] = freq.get(w, 0) + 1
            order[w] = i  # later turn wins the recency tie-break
    salient = sorted(freq, key=lambda w: (-freq[w], -order[w], w))[:4]
    if not salient:
        return question
    return f"{question} (context: {' '.join(salient)})"


def extractive_answerer(question: str, context: str) -> str:
    """Deterministic default answerer: the first context line, or a
    refusal-shaped answer when there is no context at all (which the
    post-processor then canonicalizes, AI.py:176-179)."""
    if not context:
        return REFUSAL_PREFIX + " to answer this question."
    return context.split("\n")[0]


@dataclass
class RagEngine:
    spark: SparkSession
    index_path: str
    k: int = DEFAULT_K  # reference default k=4 (AI.py:138)
    chunk_size: int = DEFAULT_CHUNK_SIZE  # 1000 chars (AI.py:209)
    dim: int = EMBED_DIM
    rewrite: Callable[[str, list[dict]], str] = passthrough_rewrite
    answerer: Callable[[str, str], str] = extractive_answerer
    # the reference's brute-force→ANN delegation split (Pinecone
    # serverless past memory scale, AI.py:49-55) through the USER path:
    # below this many index rows every retrieval is the exact scan;
    # above it retrieval probes the persisted cell-partitioned IVF
    # layout (partition-pruned scan, built at index time)
    ann_threshold_rows: int = 1_000_000
    # cells probed per question on the IVF route: 8 of √N cells keeps
    # recall high while scanning <1% of a 2M-row index's partitions
    ann_nprobe: int = 8
    _sessions: dict[str, list[dict]] = field(default_factory=dict)
    _index_rows: int | None = field(default=None, repr=False)
    # True once THIS instance has verified (or written) an IVF layout
    # matching the current corpus — the per-question short-circuit; an
    # in-session corpus change resets it
    _ann_built: bool = field(default=False, repr=False)
    _lex_built: bool = field(default=False, repr=False)
    _codebook: object = field(default=None, repr=False)

    # -- index build (S2-S5, F5, F6, F8) -----------------------------------

    def index_documents(self, docs: DataFrame) -> int:
        """Chunk+embed ``docs(doc_id, text, ...)`` into the index;
        returns newly embedded chunk count (0 ⇒ fully cached). Past the
        ANN threshold a cell-partitioned IVF twin of the index serves
        retrieval; its codebook train + partitioned rewrite are
        index-BUILD-time costs paid once per corpus change (the
        reference's Pinecone upsert builds its ANN structures on write,
        AI.py:89-96) — deferred to the first retrieval after a change,
        so a sub-threshold build never pays even the routing count."""
        self._index_rows = None  # size changed: re-count lazily
        n_new = write_index_incremental(
            docs, self.index_path, chunk_size=self.chunk_size, dim=self.dim
        )
        # defer the ANN build to the first retrieval: deciding the route
        # needs a row count, and paying that job here would tax every
        # sub-threshold (reference-scale) index build; clearing the
        # built flag makes the first post-change retrieval re-verify
        # (fingerprint probe) or rebuild instead
        if n_new > 0:
            self._ann_built = False
            self._lex_built = False
            self._codebook = None
        return n_new

    @staticmethod
    def _cid():
        # one packed int64 per chunk (doc_id · 2²⁰ + chunk_id; the
        # chunker bounds chunk ordinals far below 2²⁰) — the ANN
        # kernels key on a single integral id
        return (F.col("doc_id") * (1 << 20) + F.col("chunk_id")).alias("cid")

    def _ann_paths(self) -> tuple[str, str]:
        return f"{self.index_path}_ivf", f"{self.index_path}_ivf_codebook"

    def _lex_paths(self) -> tuple[str, str]:
        return f"{self.index_path}_lex", f"{self.index_path}_lex_stats"

    def _corpus_signature(self, rows: int) -> str:
        """Reuse fingerprint for derived layouts (IVF codebook, postings
        stats). Row count alone would let any corpus change that
        preserves row count (an external rewrite of ``index_path``, an
        in-place re-chunk by another process) silently serve a stale
        layout, so the signature also folds in the index parquet's
        total byte length and the newest modification time among its
        direct children (covers in-place file rewrites, which leave the
        directory's own mtime untouched on local FS). Driver-side FS
        metadata only — no Spark job. Degrades to rows-only on FS
        quirks: the safe direction, since a later successful probe then
        mismatches and rebuilds."""
        sig = f"rows={rows}"
        try:
            jpath = self.spark._jvm.org.apache.hadoop.fs.Path(self.index_path)
            fs = jpath.getFileSystem(self.spark._jsc.hadoopConfiguration())
            length = fs.getContentSummary(jpath).getLength()
            mtime = fs.getFileStatus(jpath).getModificationTime()
            for st in fs.listStatus(jpath):
                if st.getModificationTime() > mtime:
                    mtime = st.getModificationTime()
            sig += f";bytes={length};mtime={mtime}"
        except Exception:
            pass
        return sig

    def _ensure_lex_index(self) -> None:
        """Lexical twin of ``_ensure_ann_index``: above the routing
        threshold the hybrid path's BM25 leg reads a bucket-partitioned
        posting-list layout instead of tokenizing every chunk per
        question (the scan leg dominated hybrid latency at the
        2 M-chunk tier). Same per-corpus reuse contract: the stats
        parquet carries the corpus row count, a fresh engine verifies
        it before rebuilding, and ``_lex_built`` short-circuits every
        later question. Built lazily on the first hybrid retrieval —
        vector-only users never pay it."""
        from .operators.ranking import write_postings_index

        if self._lex_built:
            return
        rows = self._count_index_rows()
        if rows <= self.ann_threshold_rows:
            return
        lex_path, stats_path = self._lex_paths()
        sig = self._corpus_signature(rows)
        try:
            st = self.spark.read.parquet(stats_path).collect()
        except Exception:
            st = []
        if st and all(getattr(r, "corpus_sig", None) == sig for r in st):
            self._lex_built = True
            return
        write_postings_index(
            self.index().select(
                F.concat_ws("#", F.col("doc_id"), F.col("chunk_id")).alias(
                    "cid"
                ),
                "text",
            ),
            lex_path,
            stats_path,
            id_col="cid",
            fingerprint=rows,
            signature=sig,
        )
        self._lex_built = True

    def _ensure_ann_index(self) -> None:
        from .operators.similarity import train_centroids_sample, write_ivf_index

        if self._ann_built:  # verified in-session: zero jobs per question
            return
        rows = self._count_index_rows()
        if rows <= self.ann_threshold_rows:
            return
        ivf_path, cb_path = self._ann_paths()
        # The IVF layout is a PER-CORPUS artifact, not per-instance: a
        # fresh engine pointed at an already-built index must reuse the
        # on-disk codebook+layout, not retrain KMeans and rewrite 2 M
        # rows. The codebook parquet carries the corpus fingerprint
        # (row count + index bytes + newest child mtime at build time,
        # _corpus_signature) beside the centroids; a match proves the
        # layout serves the current corpus, and the read doubles as the
        # codebook load. One probe per instance (or per in-session
        # corpus change) — _ann_built short-circuits after.
        sig = self._corpus_signature(rows)
        try:
            cb_rows = self.spark.read.parquet(cb_path).collect()
        except Exception:
            cb_rows = []  # absent codebook: build below
        if cb_rows and all(
            getattr(r, "corpus_sig", None) == sig for r in cb_rows
        ):
            import numpy as np

            self._codebook = np.array(
                [r.centroid for r in sorted(cb_rows, key=lambda r: r.cell)],
                dtype=np.float64,
            )
            self._ann_built = True
            return
        if cb_rows and self._try_ivf_append(cb_rows, rows, sig):
            return
        import math

        n_cells = int(
            min(4096, max(16, 2 ** round(math.log2(max(math.sqrt(rows), 16.0)))))
        )
        centroids = train_centroids_sample(
            self.index(),
            n_cells,
            "embedding",
            sample_rows=max(4096, 8 * n_cells),
            # corpus-versioned key: a stale-rebuild after index growth
            # must RETRAIN, not replay the previous corpus's centroids
            # memoized under the bare path
            cache_key=f"{self.index_path}@rows={rows}",
        )
        write_ivf_index(
            self.index().select(
                self._cid(), "embedding", "doc_id", "chunk_id", "text"
            ),
            ivf_path,
            centroids,
            index_id="cid",
            payload_cols=("doc_id", "chunk_id", "text"),
        )
        self.spark.createDataFrame(
            [
                (i, [float(x) for x in c], rows, sig)
                for i, c in enumerate(centroids)
            ],
            "cell int, centroid array<double>, corpus_rows long, corpus_sig string",
        ).coalesce(1).write.mode("overwrite").parquet(cb_path)
        self._codebook = centroids
        self._ann_built = True

    #: a corpus that grew by more than this fraction since the codebook
    #: trained gets a RETRAIN, not an append — per-row cell assignment
    #: under the old codebook stays exactly correct at any growth, but
    #: codebook optimality (and with it recall-per-nprobe) drifts with
    #: the corpus distribution, so the append path is for the
    #: steady-state trickle, not for doublings
    IVF_APPEND_MAX_GROWTH = 0.25

    def _try_ivf_append(self, cb_rows, rows: int, sig: str) -> bool:
        """Incremental IVF maintenance: when the corpus GREW (bounded,
        append-only — the engine's own ``index_documents`` contract)
        since the layout was built, assign only the delta chunks to the
        existing codebook's cells and append them into the
        cell-partitioned layout, instead of retraining KMeans and
        rewriting millions of rows for a 1 % addition (measured at the
        2 M-chunk tier: full rebuild 150-190 s, append seconds).
        Eligibility is PROVEN, not assumed: the old layout must be a
        clean subset of the current index (zero orphan cids — an
        external rewrite that removed rows fails this and falls through
        to the retrain path) and growth must stay within
        ``IVF_APPEND_MAX_GROWTH``. Returns True when the append served;
        False falls through to the rebuild."""
        ivf_path, cb_path = self._ann_paths()
        old_rows = {getattr(r, "corpus_rows", -1) for r in cb_rows}
        if len(old_rows) != 1:
            return False
        old = old_rows.pop()
        if not (0 < old < rows and rows - old <= self.IVF_APPEND_MAX_GROWTH * old):
            return False
        try:
            layout_ids = self.spark.read.parquet(ivf_path).select("cid")
        except Exception:
            return False
        # subset proof + delta discovery in ONE pass over the 8-byte
        # cid lanes: a full-outer marker join, keeping only the rows
        # missing from either side (delta + would-be orphans), eagerly
        # checkpointed at delta size. Separate anti-joins re-scanned
        # the 1024-file cell layout and the index per job (profiled
        # 14 s + 14 s + a 36 s payload shuffle at the 2 M-chunk tier);
        # anti-joining the full payload was worse still (47 s).
        full_ids = self.index().select(self._cid(), F.lit(1).alias("in_f"))
        anomalies = (
            full_ids.join(
                layout_ids.withColumn("in_l", F.lit(1)), "cid", "full"
            )
            .filter(F.col("in_f").isNull() | F.col("in_l").isNull())
            .localCheckpoint(eager=True)
        )
        if anomalies.filter(F.col("in_f").isNull()).limit(1).count():
            return False  # orphans: the old layout is not a subset
        import numpy as np

        from .operators.similarity import append_ivf_index

        codebook = np.array(
            [r.centroid for r in sorted(cb_rows, key=lambda r: r.cell)],
            dtype=np.float64,
        )
        # payload rides a cid equi-join against the CHECKPOINTED delta
        # id set (AQE broadcasts it at runtime) — the index is scanned
        # once more for the payload columns, never shuffled
        delta = self.index().select(
            self._cid(), "embedding", "doc_id", "chunk_id", "text"
        ).join(anomalies.select("cid"), "cid")
        append_ivf_index(
            delta,
            ivf_path,
            codebook,
            index_id="cid",
            payload_cols=("doc_id", "chunk_id", "text"),
        )
        self.spark.createDataFrame(
            [
                (int(r.cell), [float(x) for x in r.centroid], rows, sig)
                for r in cb_rows
            ],
            "cell int, centroid array<double>, corpus_rows long, corpus_sig string",
        ).coalesce(1).write.mode("overwrite").parquet(cb_path)
        self._codebook = codebook
        self._ann_built = True
        return True

    def _load_codebook(self):
        # cached in-engine: the codebook is a static index artifact and
        # re-reading its parquet per question was one of the fixed jobs
        # dominating IVF latency at the 5 M-chunk tier
        if self._codebook is None:
            import numpy as np

            rows = self.spark.read.parquet(self._ann_paths()[1]).collect()
            self._codebook = np.array(
                [r.centroid for r in sorted(rows, key=lambda r: r.cell)],
                dtype=np.float64,
            )
        return self._codebook

    def index_files(
        self,
        path: str,
        glob: str | None = None,
        extractor: Callable[[bytes], str] = utf8_extractor,
    ) -> int:
        """Stage-free file ingestion (reference staged uploads to /tmp,
        AI.py:194-201; a distributed scan reads in place)."""
        docs = load_binary_documents(self.spark, path, glob, extractor)
        return self.index_documents(docs)

    def index(self) -> DataFrame:
        return self.spark.read.parquet(self.index_path)

    # -- query path (J1, O1, A1, P1, P2) ------------------------------------

    def retrieve(
        self,
        question: str,
        k: int | None = None,
        search_type: str = "similarity",
        fetch_k: int | None = None,
    ) -> DataFrame:
        """Top-k chunks for a question. ``search_type`` mirrors the
        LangChain retriever switch the reference could pass at
        AI.py:138 (``as_retriever(search_type=...)``):

        - ``"similarity"`` (reference behavior): one broadcastable
          literal query vector scored against the index scan.
        - ``"mmr"``: fetch_k cosine candidates, then the MMR greedy
          (operators/ranking weights) diversifies down to k. The
          greedy here runs driver-side over the collected fetch_k≈2k
          rows — reference-scale; the distributed batch form is
          q_mmr_rerank's cogrouped operator.
        - ``"hybrid"``: BM25 over the chunk texts (question content
          words) fused with the cosine ranking by reciprocal rank —
          the plan-side form of q_hybrid_rrf over the engine's index.
        """
        k = k or self.k
        if search_type == "similarity":
            qvec = embed_text(question, self.dim)
            return self._topk_chunks(qvec, k, payload_cols=("text",))
        if search_type == "mmr":
            return self._retrieve_mmr(question, k, fetch_k or max(2 * k, 8))
        if search_type == "hybrid":
            return self._retrieve_hybrid(question, k)
        raise ValueError(f"unknown search_type: {search_type!r}")

    def _count_index_rows(self) -> int:
        # one parquet-metadata count per built index, then cached — the
        # router must not pay a count per question
        if self._index_rows is None:
            self._index_rows = self.index().count()
        return self._index_rows

    def _below_ann_threshold(self) -> bool:
        """Route decision with a free fast path: a driver-side FS size
        listing (no Spark job) proves a reference-scale index is below
        the ANN threshold. The bytes bound SCALES with the configured
        threshold: each index row carries a dim-float embedding plus
        id+text payload, and even byte-stream-split+compressed parquet
        does not shrink a random-float vector below ~1 byte per
        component, so < threshold_rows × max(32, dim) bytes implies
        rows < threshold for any threshold (a fixed 100 MB/100 k pair
        silently routed a 150 k-row index past a 100 k threshold to
        the exact scan, defeating the user's setting). The shortcut
        can only ever pick the EXACT route (a misestimate costs a
        scan, never recall), and it is bypassed for the artificially
        tiny thresholds tests use. Only past the bytes bound does the
        exact count job run (cached)."""
        if self._index_rows is None and self.ann_threshold_rows >= 100_000:
            try:
                jpath = self.spark._jvm.org.apache.hadoop.fs.Path(
                    self.index_path
                )
                fs = jpath.getFileSystem(
                    self.spark._jsc.hadoopConfiguration()
                )
                min_row_bytes = max(32, self.dim)
                bound = self.ann_threshold_rows * min_row_bytes
                if fs.getContentSummary(jpath).getLength() < bound:
                    return True
            except Exception:
                pass  # non-local FS quirks: fall through to the count
        return self._count_index_rows() <= self.ann_threshold_rows

    def _topk_chunks(
        self, qvec, k: int, payload_cols: tuple[str, ...]
    ) -> DataFrame:
        """Single-question top-k against the chunk index, routed on
        index size: the exact TakeOrderedAndProject scan below
        ``ann_threshold_rows`` (reference behavior, bit-stable for
        every correctness-tier caller); above it, an IVF probe over the
        cell-partitioned layout ``index_documents`` persisted — the
        probe's ``nprobe`` cells resolve driver-side into a PARTITION
        FILTER, so the scan opens ~nprobe/n_cells of the index's files
        instead of all of them. That layout is the part a per-question
        ANN route actually needs at scale: any scheme that re-hashes or
        re-scans the full index per question (inline LSH banding
        included — measured 17.9 s vs the exact scan's 3.4 s at the
        2 M-chunk tier) just races the exact scan and loses; only
        index-time structure beats it. The probe id −1 cannot collide
        with any packed chunk id. Output schema matches the exact
        path: (doc_id, chunk_id, *payload, score)."""
        if self._below_ann_threshold():
            return topk_cosine(
                self.index(),
                qvec,
                k=k,
                id_cols=("doc_id", "chunk_id"),
                payload_cols=payload_cols,
            )
        from .operators.similarity import ivf_knn_pruned, nearest_cells

        self._ensure_ann_index()
        probes = self.spark.createDataFrame(
            [(-1, [float(x) for x in qvec])], "query_id long, qvec array<double>"
        )
        codebook = self._load_codebook()
        hits = ivf_knn_pruned(
            self.spark,
            self._ann_paths()[0],
            probes,
            codebook,
            k=k,
            nprobe=self.ann_nprobe,
            # the question vector is already driver-side: its cells come
            # from a numpy matmul, not an Arrow UDF + collect round-trip
            probe_cells=nearest_cells(qvec, codebook, self.ann_nprobe),
            # the probe frame is built 4 lines up with exactly one row;
            # declaring it skips probe_cells' verification count job
            n_probes=1,
            index_id="cid",
            # payload is co-located in the layout, so hits come back
            # fully materialized from the probed partitions — a lookup
            # join against the full chunk index would re-scan 2 M rows
            # to serve 4 of them (measured: that join alone cost more
            # than the brute-force scan it was meant to avoid)
            payload_cols=("doc_id", "chunk_id", *payload_cols),
        )
        return hits.select(
            "doc_id", "chunk_id", *payload_cols, "score"
        ).orderBy(F.desc("score"), F.asc("doc_id"), F.asc("chunk_id"))

    def _retrieve_mmr(self, question: str, k: int, fetch_k: int) -> DataFrame:
        # Delegates the λ-scoring to the SAME greedy core the
        # oracle-checked cogrouped operator uses (mmr_greedy), so the
        # engine's retriever cannot drift from the hash-verified
        # algebra. Collecting fetch_k (≈8) candidate rows is bounded by
        # construction; the distributed form for query batches is
        # q_mmr_rerank.
        from .operators.ranking import mmr_greedy

        qvec = embed_text(question, self.dim)
        cand = {
            (r.doc_id, r.chunk_id): r
            for r in self._topk_chunks(
                qvec, fetch_k, payload_cols=("text", "embedding")
            ).collect()
        }

        def cos(a, b) -> float:
            ea, eb = cand[a].embedding, cand[b].embedding
            num = sum(x * y for x, y in zip(ea, eb))
            na = sum(x * x for x in ea) ** 0.5
            nb = sum(y * y for y in eb) ** 0.5
            return num / (na * nb) if na > 0 and nb > 0 else 0.0

        rel = {key: float(r.score) for key, r in cand.items()}
        picked = [cand[key] for key, _, _ in mmr_greedy(rel, cos, k)]
        return self.spark.createDataFrame(
            [(r.doc_id, r.chunk_id, r.text, float(r.score)) for r in picked],
            "doc_id long, chunk_id int, text string, score double",
        )

    def _retrieve_hybrid(self, question: str, k: int, depth: int = 50) -> DataFrame:
        from .operators.ranking import bm25_scores, rrf_fuse

        # question-side normalization (lowercase, punctuation strip):
        # doc tokens follow the engine-wide whitespace contract, so a
        # trailing '?' on a question word would otherwise never match
        # dedupe BEFORE the [:5] slice (order-preserving): a question
        # like "spark spark streaming joins state windows" must not
        # waste question-term slots on duplicates
        terms = list(
            dict.fromkeys(
                t.strip("?.,!")
                for t in question.lower().split()
                if t.strip("?.,!") and t.strip("?.,!") not in _STOPWORDS
            )
        )[:5]
        if not terms:
            return self.retrieve(question, k, search_type="similarity")
        idx = self.index().withColumn(
            "cid", F.concat_ws("#", F.col("doc_id"), F.col("chunk_id"))
        )
        if self._below_ann_threshold():
            # reference-scale: tokenize-and-score scan, bit-stable with
            # the historical path and the oracle-checked operator
            bm = bm25_scores(
                idx.select(F.col("cid").alias("doc_id"), "text"), terms
            ).withColumnRenamed("doc_id", "cid")
        else:
            # above-threshold: the posting-list layout serves the leg —
            # per-question cost is |terms| bucket directories + row-group
            # pruning on the sorted term column, never a corpus tokenize.
            # Scores are bit-identical to the scan form for every chunk
            # containing >=1 query term (bm25_postings_scores docstring).
            from .operators.ranking import bm25_postings_scores

            self._ensure_lex_index()
            lex_path, stats_path = self._lex_paths()
            bm = bm25_postings_scores(
                self.spark, lex_path, stats_path, terms, id_col="cid"
            )
        qvec = embed_text(question, self.dim)
        # the vector leg routes on index size like every retrieval
        vs = self._topk_chunks(qvec, depth, payload_cols=()).select(
            F.concat_ws("#", F.col("doc_id"), F.col("chunk_id")).alias("cid"),
            "score",
        )
        top = rrf_fuse(bm, vs, "cid", "bm25", "score", k=k, depth=depth).select(
            "cid", F.col("rrf").alias("score")
        )
        # payload pruning: above the threshold the fused top-k is
        # collected (k rows — the same boundedness ask() relies on) so
        # its doc_ids become a PUSHABLE parquet predicate on the index
        # scan; the broadcast-join-against-the-full-scan form read all
        # 2 M rows to serve k of them. Below the threshold the scan is
        # the cheap part and the historical lazy plan stays untouched.
        if not self._below_ann_threshold():
            from pyspark.sql.types import DoubleType, StructField, StructType

            picked = top.collect()  # k rows by construction
            # doc_id values come back via the cid string; cast the
            # LITERALS to the index's own doc_id type (constant-folded,
            # so the In predicate still pushes to the parquet scan)
            # instead of int()-parsing them — type-agnostic like the
            # broadcast-join path this replaces
            doc_strs = sorted({c.cid.rsplit("#", 1)[0] for c in picked})
            did_type = idx.schema["doc_id"].dataType
            scores = {c.cid: float(c.score) for c in picked}
            hits = (
                idx.filter(
                    F.col("doc_id").isin(
                        [F.lit(s).cast(did_type) for s in doc_strs]
                    )
                )
                .filter(F.col("cid").isin(list(scores)))
                .select("cid", "doc_id", "chunk_id", "text")
                .collect()
            )
            schema = StructType(
                [
                    idx.schema["doc_id"],
                    idx.schema["chunk_id"],
                    idx.schema["text"],
                    StructField("score", DoubleType()),
                ]
            )
            return self.spark.createDataFrame(
                sorted(
                    (
                        (r.doc_id, r.chunk_id, r.text, scores[r.cid])
                        for r in hits
                    ),
                    key=lambda t: (-t[3], t[0], t[1]),
                ),
                schema,
            )
        return (
            F.broadcast(top)
            .join(idx, "cid")
            .select("doc_id", "chunk_id", "text", "score")
            .orderBy(F.desc("score"), F.asc("doc_id"), F.asc("chunk_id"))
        )

    def ask(self, question: str, session_id: str | None = None) -> dict:
        """Full reference query path; returns the reference's result
        shape {input, context, answer} (AI.py:173-185) plus the
        retrieved rows."""
        history = self._sessions.get(session_id, []) if session_id else []
        effective = self.rewrite(question, history)
        retrieved = self.retrieve(effective).collect()  # k rows, k≈4
        context = "\n\n".join(r.text for r in retrieved)
        raw = self.answerer(effective, context)
        answer = (
            postprocess_answers(
                self.spark.createDataFrame([(raw,)], "answer string")
            )
            .collect()[0]
            .answer
        )
        if session_id is not None:
            log = self._sessions.setdefault(session_id, [])  # get-or-create
            log.append({"role": "user", "content": question})
            log.append({"role": "assistant", "content": answer})
        return {
            "input": question,
            "context": context,
            "answer": answer,
            "retrieved": retrieved,
        }

    def recommend(self, session_id: str, k: int | None = None) -> DataFrame:
        """Adaptive recommendations — the "Recommendation" in the
        reference's title: surface the chunks most similar to what the
        session has ASKED SO FAR. The reference achieves adaptivity by
        feeding chat history back into retrieval
        (create_history_aware_retriever, AI.py:163-171); the engine
        form concatenates the session's user turns into one profile
        query and runs the same top-k path, so recommendations shift
        as the conversation does. An empty/unknown session degrades to
        the empty-profile embedding (deterministic, still k rows) —
        the cold-start behavior a recommender needs defined."""
        history = self._sessions.get(session_id, [])
        profile = " ".join(m["content"] for m in history if m["role"] == "user")
        return self.retrieve(profile, k)

    # -- session lifecycle (T1 batch view; AI.py:155-161,232-235) -----------

    def history(self, session_id: str) -> list[dict]:
        return list(self._sessions.get(session_id, []))

    def history_df(self, session_id: str) -> DataFrame:
        rows = [
            (session_id, i, m["role"], m["content"])
            for i, m in enumerate(self._sessions.get(session_id, []))
        ]
        return self.spark.createDataFrame(
            rows, "session_id string, turn int, role string, content string"
        ).orderBy("turn") if rows else self.spark.createDataFrame(
            [], "session_id string, turn int, role string, content string"
        )

    def clear_session(self, session_id: str) -> None:
        self._sessions.pop(session_id, None)
