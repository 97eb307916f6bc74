"""Full-text relevance search (BM25) over a document corpus.

The retrieval step of a data pipeline (mining a corpus for documents
relevant to a topic, building seed sets, hard-negative mining).  The
design inverts the textbook inverted-index build for the
small-query-set case: query terms are plan literals, so per-document
term frequencies are array expressions over the existing text column —
the corpus is never exploded into postings and never shuffled.

Plan shape for 100 TB:

1. one narrow pass computes ``(dl, tf_term...)`` per document (word
   array bound once — HOF lambdas re-evaluate referenced subtrees);
2. one aggregation collapses that to a single stats row (N, Σdl, and
   per-term document frequencies) — a scalar exchange;
3. the stats row is broadcast back (literal-free cross join) and the
   BM25 score is a pure column expression; only documents matching at
   least one query term survive into
4. the per-query top-k window — the only data-sized exchange, and it
   carries just the matching subset.

The corpus is scanned twice (stats + scoring); that is inherent to
engine-side IDF and still beats a postings shuffle.  For query sets
too large for plan literals, the classic explode→postings→broadcast
query join applies instead; this operator targets the interactive
few-queries case.

Scores are quantized to 1e-4 (``floor(score * 1e4)`` as int) and
ranking happens on the quantized value with doc_id tie-break, so the
ordering is replayable across engines (ln() may legitimately differ
in the last ulp between libm implementations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import ensure_parallelism, normalize_text


def _query_terms(queries: list[str]) -> list[str]:
    """Distinct normalized terms across all queries, first-seen order."""
    seen: list[str] = []
    for q in queries:
        for t in q.lower().split():
            if t and t not in seen:
                seen.append(t)
    return seen


def bm25_topk(docs: DataFrame, queries: list[str], k: int = 10,
              k1: float = 1.2, b: float = 0.75,
              text_col: str = "text") -> DataFrame:
    """Top-k documents per query under BM25.

    Returns (query_id, rank, doc_id, score_q4) where ``score_q4`` is
    the BM25 score in 1e-4 units (integer).  Documents with no query
    term are excluded; ties rank by doc_id.
    """
    terms = _query_terms(queries)
    words = F.split(normalize_text(F.col(text_col)), " ")

    def body(w):
        return F.struct(
            F.size(w).cast("long").alias("dl"),
            *[F.size(F.filter(w, lambda x: x == F.lit(t)))
              .cast("long").alias(f"tf_{i}")
              for i, t in enumerate(terms)])

    s = F.element_at(F.transform(F.array(words), body), 1)
    t = ensure_parallelism(docs).select("doc_id", s.alias("s")).select(
        "doc_id", "s.*")

    stats = t.agg(
        F.count("*").alias("n"),
        F.sum("dl").alias("sdl"),
        *[F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
          for i in range(len(terms))])

    scored = t.crossJoin(F.broadcast(stats))
    avgdl = F.col("sdl") / F.col("n")

    def term_score(i: int):
        idf = F.log(F.lit(1.0) + (F.col("n") - F.col(f"df_{i}") + F.lit(0.5))
                    / (F.col(f"df_{i}") + F.lit(0.5)))
        tf = F.col(f"tf_{i}")
        return (idf * (tf * F.lit(k1 + 1.0))
                / (tf + F.lit(k1) * (F.lit(1.0) - F.lit(b)
                                     + F.lit(b) * F.col("dl") / avgdl)))

    per_query = []
    for qi, q in enumerate(queries):
        idxs = [terms.index(tok) for tok in _query_terms([q])]
        expr = term_score(idxs[0])
        for i in idxs[1:]:
            expr = expr + term_score(i)
        per_query.append(F.struct(F.lit(qi).alias("query_id"),
                                  F.floor(expr * F.lit(1e4))
                                  .cast("long").alias("score_q4")))

    flat = (scored
            .select("doc_id", F.explode(F.array(*per_query)).alias("r"))
            .select("doc_id", "r.query_id", "r.score_q4")
            .filter(F.col("score_q4") > 0))
    w = Window.partitionBy("query_id").orderBy(F.desc("score_q4"), "doc_id")
    return (flat.select("query_id", F.row_number().over(w).alias("rank"),
                        "doc_id", "score_q4")
            .filter(F.col("rank") <= k))


def rrf_fuse(docs: DataFrame, queries: list[str], k: int = 10,
             dim: int = 16, pool: int = 20, rrf_k: int = 60,
             text_col: str = "text") -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion of BM25 (lexical) and
    feature-hash embedding cosine (semantic proxy) rankings — the
    standard two-tower fusion for corpus mining, where each ranker's
    top-``pool`` feeds ``score = Σ 1/(rrf_k + rank)``.

    Plan shape for 100 TB: both rankers follow the literal-query
    design (corpus never exploded, one narrow scoring pass each, the
    only data-sized exchange being the per-query top-``pool`` window);
    the fusion join then touches ≤ 2·pool rows per query — driver-free
    and broadcastable by construction.

    Everything the final ranking depends on is integer: BM25 ranks,
    cosine ranks (cos quantized to 1e-6 before ranking), and the RRF
    contribution ``floor(1e9 / (rrf_k + rank))`` — so the fused order
    replays exactly in the SQL oracle.
    """
    from ..phash import h60, h60_py

    bm = bm25_topk(docs, queries, k=pool, text_col=text_col).select(
        "query_id", "doc_id", F.col("rank").alias("rank_bm"))

    # embedding side: feature-hash the corpus (JVM-side, one pass)...
    toks = F.split(normalize_text(F.col(text_col)), " ")
    hs_expr = F.transform(toks, lambda s: h60(s) % dim)

    def body(hb):
        return F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda kk: F.size(F.filter(hb, lambda h: h == kk)).cast("long"))

    emb = ensure_parallelism(docs).select(
        "doc_id",
        F.element_at(F.transform(F.array(hs_expr), body), 1).alias("dv"))

    # ...and the queries driver-side with the SAME hash → plan literals
    def qvec(q: str) -> list[int]:
        import re
        norm = re.sub(r"\s+", " ", re.sub(r"[^a-z0-9\s]", " ", q.lower())).strip()
        v = [0] * dim
        for t in norm.split(" "):
            if t:
                v[h60_py(t) % dim] += 1
        return v

    per_query = []
    for qi, q in enumerate(queries):
        qv = qvec(q)
        qnorm = sum(x * x for x in qv) ** 0.5
        dot = sum(
            (F.element_at(F.col("dv"), i + 1) * qv[i]
             for i in range(dim) if qv[i]), F.lit(0))
        dd = F.aggregate(F.col("dv"), F.lit(0).cast("long"),
                         lambda a, x: a + x * x)
        cos_q6 = F.floor(F.lit(1e6) * dot.cast("double")
                         / (F.lit(qnorm) * F.sqrt(dd.cast("double"))))
        per_query.append(F.struct(F.lit(qi).alias("query_id"),
                                  cos_q6.cast("long").alias("cos_q6")))

    sem = (emb.select("doc_id", F.explode(F.array(*per_query)).alias("r"))
           .select("doc_id", "r.query_id", "r.cos_q6")
           .filter(F.col("cos_q6") > 0))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_q6"), "doc_id")
    se = (sem.select("query_id", "doc_id",
                     F.row_number().over(w).alias("rank_sem"))
          .filter(F.col("rank_sem") <= pool))

    fused = (bm.join(se, ["query_id", "doc_id"], "full_outer")
             .select("query_id", "doc_id",
                     (F.coalesce(
                         F.floor(F.lit(1e9) / (F.lit(rrf_k)
                                               + F.col("rank_bm"))), F.lit(0))
                      + F.coalesce(
                         F.floor(F.lit(1e9) / (F.lit(rrf_k)
                                               + F.col("rank_sem"))),
                         F.lit(0))).cast("long").alias("rrf_q9")))
    wf = Window.partitionBy("query_id").orderBy(F.desc("rrf_q9"), "doc_id")
    return (fused.select("query_id",
                         F.row_number().over(wf).alias("rank"),
                         "doc_id", "rrf_q9")
            .filter(F.col("rank") <= k))
