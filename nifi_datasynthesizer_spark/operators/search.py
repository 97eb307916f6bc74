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
