"""Round-5 data-selection / substring-dedup registry queries.

Four published training-data-pipeline techniques not covered by the
earlier dedup/quality/similarity families:

* ``dedup_repeated_ngrams`` — cross-document repeated k-gram spans
  (Lee et al., substring-level dedup) with exact interval-merged
  coverage;
* ``text_lm_perplexity`` — CCNet-style corpus-self-trained bigram LM
  scoring;
* ``dsir_importance_weights`` — DSIR hashed-n-gram importance weights
  toward a target domain;
* ``sim_matryoshka_topk`` — truncated-prefix (Matryoshka) embedding
  search with per-query recall against the full-dimension exact
  top-k.

All four follow the established parity rules: md5-only hashing,
integer counts, and log/dot terms snapped per-term to scaled BIGINT
before summation (see operators/selection.py and
operators/similarity.py docstrings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import repeated_ngram_report
from ..operators.selection import bigram_lm_scores, dsir_weights
from ..operators.similarity import brute_force_topk, matryoshka_topk
from ..sources.testdata import load_table
from .pipeline_queries import _O_ELEMENTS, _O_NORM
from .queries import query_fn

# ---------------------------------------------------------------------------
# cross-document repeated n-gram spans (k = 5, df >= 2)
# ---------------------------------------------------------------------------

_RN_K = 5


@query_fn(
    "dedup_repeated_ngrams",
    oracle=f"""
WITH toks AS (SELECT doc_id, string_split({_O_NORM}, ' ') t FROM documents),
base AS (SELECT doc_id, CAST(len(t) AS INTEGER) AS n_tokens FROM toks),
pos AS (
  SELECT doc_id, unnest(range(1, len(t) - {_RN_K} + 2)) AS i, t
  FROM toks WHERE len(t) >= {_RN_K}
),
grams AS (
  SELECT doc_id, CAST(i AS INTEGER) AS i,
         md5(array_to_string(t[i:i+{_RN_K - 1}], ' ')) AS gh
  FROM pos
),
docgram AS (SELECT DISTINCT doc_id, gh FROM grams),
dup AS (SELECT gh FROM docgram GROUP BY gh HAVING COUNT(*) >= 2),
dp AS (SELECT doc_id, i, i + {_RN_K - 1} AS e FROM grams JOIN dup USING (gh)),
m AS (
  SELECT doc_id, i, e,
         MAX(e) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe
  FROM dp
),
isl AS (
  SELECT doc_id, i, e,
         SUM(CASE WHEN pe IS NULL OR i > pe THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY i
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl_id
  FROM m
),
icov AS (
  SELECT doc_id, isl_id, MAX(e) - MIN(i) + 1 AS cov, COUNT(*) AS np
  FROM isl GROUP BY 1, 2
),
perdoc AS (
  SELECT doc_id, SUM(cov) AS covered, SUM(np) AS ndup FROM icov GROUP BY 1
)
SELECT b.doc_id, b.n_tokens,
  CAST(GREATEST(b.n_tokens - {_RN_K - 1}, 0) AS INTEGER) AS n_grams,
  CAST(COALESCE(ndup, 0) AS INTEGER) AS n_dup_grams,
  CAST(COALESCE(covered, 0) AS INTEGER) AS covered_tokens,
  CASE WHEN b.n_tokens - {_RN_K - 1} > 0
       THEN CAST(COALESCE(ndup, 0) AS DOUBLE)
            / CAST(b.n_tokens - {_RN_K - 1} AS DOUBLE)
       ELSE 0.0e0 END AS dup_gram_share,
  CAST(COALESCE(covered, 0) AS DOUBLE) / CAST(b.n_tokens AS DOUBLE)
    AS dup_token_share,
  (CAST(COALESCE(covered, 0) AS DOUBLE) / CAST(b.n_tokens AS DOUBLE))
    >= 0.5e0 AS is_substring_dup
FROM base b LEFT JOIN perdoc USING (doc_id)
ORDER BY doc_id
""",
)
def dedup_repeated_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc cross-document repeated 5-gram span coverage
    (operators/dedup.repeated_ngram_report)."""
    docs = load_table(spark, sf_dir, "documents")
    return repeated_ngram_report(docs, k=_RN_K, min_docs=2).orderBy("doc_id")


# ---------------------------------------------------------------------------
# corpus-self-trained bigram LM scoring (CCNet-style)
# ---------------------------------------------------------------------------

@query_fn(
    "text_lm_perplexity",
    oracle=f"""
WITH toks AS (SELECT doc_id, string_split({_O_NORM}, ' ') t FROM documents),
pos AS (
  SELECT doc_id, unnest(range(1, len(t))) AS i, t
  FROM toks WHERE len(t) >= 2
),
bg AS (
  SELECT doc_id, t[CAST(i AS INTEGER)] AS w1,
         array_to_string(t[i:i+1], ' ') AS bg
  FROM pos
),
c2 AS (SELECT bg, COUNT(*) AS c2 FROM bg GROUP BY bg),
uni AS (SELECT unnest(t) AS w FROM toks),
c1 AS (SELECT w, COUNT(*) AS c1 FROM uni GROUP BY w),
v AS (SELECT COUNT(*) AS v FROM c1),
terms AS (
  SELECT doc_id,
    CAST(FLOOR((ln(CAST(c2 + 1 AS DOUBLE)) - ln(CAST(c1 + v AS DOUBLE)))
               * 1e6) AS BIGINT) AS term
  FROM bg JOIN c2 USING (bg) JOIN c1 ON bg.w1 = c1.w CROSS JOIN v
)
SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_bigrams,
  CAST(SUM(term) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1e6 AS lm_score
FROM terms GROUP BY doc_id
ORDER BY doc_id
""",
)
def text_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean smoothed bigram log-probability per document under the
    corpus's own bigram LM (operators/selection.bigram_lm_scores)."""
    docs = load_table(spark, sf_dir, "documents")
    return bigram_lm_scores(docs).orderBy("doc_id")


# ---------------------------------------------------------------------------
# DSIR hashed-unigram importance weights (target = lang 'en')
# ---------------------------------------------------------------------------

_DSIR_B = 64
_O_HEXD = (
    "(CASE WHEN ascii(substr(hx,{i},1)) >= 97 "
    "THEN ascii(substr(hx,{i},1)) - 87 "
    "ELSE ascii(substr(hx,{i},1)) - 48 END)"
)


@query_fn(
    "dsir_importance_weights",
    oracle=f"""
WITH occ0 AS (
  SELECT doc_id, lang, unnest(string_split({_O_NORM}, ' ')) AS w
  FROM documents
),
occ AS (
  SELECT doc_id, (lang = 'en') AS is_t, md5(w) AS hx FROM occ0
),
buck AS (
  SELECT doc_id, is_t,
         ({_O_HEXD.format(i=1)} * 16 + {_O_HEXD.format(i=2)}) % {_DSIR_B}
           AS b
  FROM occ
),
stats AS (
  SELECT b, SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS tc, COUNT(*) AS sc
  FROM buck GROUP BY b
),
tot AS (SELECT SUM(tc) AS t_tot, SUM(sc) AS s_tot FROM stats),
lr AS (
  SELECT b,
    CAST(FLOOR((ln(CAST(tc + 1 AS DOUBLE))
                - ln(CAST(t_tot + {_DSIR_B} AS DOUBLE))) * 1e6) AS BIGINT)
  - CAST(FLOOR((ln(CAST(sc + 1 AS DOUBLE))
                - ln(CAST(s_tot + {_DSIR_B} AS DOUBLE))) * 1e6) AS BIGINT)
      AS lr
  FROM stats CROSS JOIN tot
),
pb AS (SELECT doc_id, b, COUNT(*) AS n FROM buck GROUP BY 1, 2)
SELECT doc_id, CAST(SUM(n) AS INTEGER) AS n_tokens,
       CAST(SUM(n * lr) AS DOUBLE) / 1e6 AS dsir_logweight
FROM pb JOIN lr USING (b) GROUP BY doc_id
ORDER BY doc_id
""",
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR hashed-unigram log importance weights toward the English
    slice of the corpus (operators/selection.dsir_weights)."""
    docs = load_table(spark, sf_dir, "documents")
    return dsir_weights(
        docs, F.col("lang") == "en", num_buckets=_DSIR_B
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Matryoshka truncated-prefix search + recall report (d = 16 of 64)
# ---------------------------------------------------------------------------

_MK_D = 16
_MK_K = 10

_O_TOPK_TMPL = """
dots{sfx} AS (
  SELECT p.vid AS qid, c.vid AS cid,
         CAST(SUM(CAST(FLOOR(p.val * c.val * 1e6) AS BIGINT)) AS DOUBLE) / 1e6
           AS dot
  FROM pel{sfx} p JOIN el{sfx} c ON p.pos = c.pos
  GROUP BY 1, 2
),
cos{sfx} AS (
  SELECT qid, cid, dot / NULLIF(nq.norm * nc.norm, 0.0) AS cosine
  FROM dots{sfx}
  JOIN nrm{sfx} nq ON nq.vid = qid
  JOIN nrm{sfx} nc ON nc.vid = cid
  WHERE qid <> cid
),
top{sfx} AS (
  SELECT qid, cid
  FROM (
    SELECT qid, cid,
           ROW_NUMBER() OVER (PARTITION BY qid
                              ORDER BY cosine DESC, cid) AS rnk
    FROM cos{sfx}
  ) WHERE rnk <= {k}
)
"""


@query_fn(
    "sim_matryoshka_topk",
    oracle=f"""
WITH {_O_ELEMENTS},
pel AS (SELECT * FROM el WHERE vid % 100 = 0),
eld AS (SELECT * FROM el WHERE pos <= {_MK_D}),
nrmd AS (
  SELECT vid,
         sqrt(CAST(SUM(CAST(FLOOR(val * val * 1e6) AS BIGINT)) AS DOUBLE)
              / 1e6) AS norm
  FROM eld GROUP BY vid
),
peld AS (SELECT * FROM eld WHERE vid % 100 = 0),
{_O_TOPK_TMPL.format(sfx="", k=_MK_K).strip().rstrip()},
{_O_TOPK_TMPL.format(sfx="d", k=_MK_K).strip().rstrip()}
SELECT t.qid AS query_id,
       CAST(COUNT(td.cid) AS INTEGER) AS n_overlap,
       CAST(COUNT(td.cid) AS DOUBLE) / {_MK_K} AS recall
FROM top t
LEFT JOIN topd td ON td.qid = t.qid AND td.cid = t.cid
GROUP BY t.qid
ORDER BY query_id
""",
)
def sim_matryoshka_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-probe recall of the 16-dim Matryoshka-prefix top-10 against
    the exact 64-dim top-10 (operators/similarity.matryoshka_topk) —
    the measured answer to "how much of the ranking does the cheap
    prefix pass preserve"."""
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") % 100 == 0)
    full = brute_force_topk(emb, probes, _MK_K)
    trunc = matryoshka_topk(emb, probes, _MK_D, _MK_K)
    overlap = (
        full.join(
            trunc.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
            "left_semi",
        )
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return (
        full.select("query_id")
        .distinct()
        .join(overlap, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_hit", F.lit(0)).cast("int").alias("n_overlap"),
            (
                F.coalesce("n_hit", F.lit(0)).cast("double")
                / F.lit(float(_MK_K))
            ).alias("recall"),
        )
        .orderBy("query_id")
    )
