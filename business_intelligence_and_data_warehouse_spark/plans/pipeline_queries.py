"""Driver-checkable LLM-data-pipeline operator queries.

Dedup (exact / n-gram Jaccard / MinHash-LSH / SimHash / embedding
cosine), similarity search (brute-force top-k, hyperplane-LSH ANN),
text analysis (token stats, quality, language-ID, fingerprints) and
multimodal blob plumbing — every entry paired with a DuckDB oracle.

Oracle-parity techniques used here (beyond plans/queries.py):
* all hashing via md5 (identical hex in both engines);
* MinHash = lexicographic MIN over disjoint 32-bit (8-hex) slices of
  md5 digests, 4 hash functions per digest (salted second digest past
  4) — a portable permutation-min sketch at 1/4 the hashing cost;
* SimHash bits come from hex-digit tests on md5 (pure string ops);
* cosine terms explode to an element table and snap per-element
  products to DECIMAL(18,6) (order-independent sums; raw double
  summation diverges between engines on 100% of pairs);
* LSH hyperplanes are integer-arithmetic-generated from (bit, pos) —
  identical constants in both engines, no RNG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import (
    BPE_ISH_PATTERN,
    EMAIL_RE,
    EN_STOPWORDS,
    LANG_MARKERS,
    PHONE_RE,
    normalize_text,
    pii_counts,
    punct_ratio,
    redact_pii,
    rolling_min_fingerprint,
    token_count_bpe_ish,
    tokens_ws,
    uniq_token_ratio,
)
from ..operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    minhash_lsh_dedup,
    shingle_table,
    simhash_near_dups,
)
from ..operators.curation import curate_corpus
from ..operators.graph import dedup_cluster_assignments
from ..operators.split import NUM_BUCKETS, hash_split
from ..operators.multimodal import attach_blob, extract_features
from ..operators.similarity import (
    brute_force_topk,
    cosine_pairs,
    hyperplane_params,
    ivf_topk,
    lsh_ann_pairs,
)
from ..sources.testdata import load_table, table_count
from .queries import query_fn

# normalized text + distinct 3-word shingles, as a DuckDB CTE prefix
_O_NORM = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"
_O_SHINGLES = f"""
toks AS (
  SELECT doc_id, string_split({_O_NORM}, ' ') t FROM documents
),
idx AS (
  SELECT doc_id, t, unnest(range(1, len(t) - 3 + 2)) AS i FROM toks WHERE len(t) >= 3
),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s FROM idx
)
"""


# ---------------------------------------------------------------------------
# dedup: exact
# ---------------------------------------------------------------------------

@query_fn(
    "dedup_exact",
    oracle=f"""
SELECT md5({_O_NORM}) AS content_hash,
       MIN(doc_id) AS kept_id,
       COUNT(*) AS n_duplicates
FROM documents
GROUP BY 1
ORDER BY content_hash
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy over normalized text."""
    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup(docs).orderBy("content_hash")


# ---------------------------------------------------------------------------
# dedup: n-gram Jaccard similarity join (df-capped candidates)
# ---------------------------------------------------------------------------

_JACCARD_T = 0.5
_MAX_DF = 50


@query_fn(
    "dedup_ngram_jaccard",
    oracle=f"""
WITH {_O_SHINGLES},
kept AS (
  SELECT s FROM sh GROUP BY s HAVING COUNT(*) <= {_MAX_DF}
),
shc AS (SELECT sh.doc_id, sh.s FROM sh JOIN kept USING (s)),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM shc GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
  FROM shc a JOIN shc b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, c / (sa.n + sb.n - c) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE c / (sa.n + sb.n - c) >= {_JACCARD_T}
ORDER BY doc_a, doc_b
""",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by 3-gram shingle Jaccard >= 0.5 (prefix-filtered)."""
    docs = load_table(spark, sf_dir, "documents")
    shingles = shingle_table(docs, 3)
    return jaccard_pairs(shingles, _JACCARD_T, max_df=_MAX_DF).orderBy(
        "doc_a", "doc_b"
    )


# ---------------------------------------------------------------------------
# dedup: asymmetric max-containment pairs (quote/subset detector)
# ---------------------------------------------------------------------------

_CONT_T = 0.6


@query_fn(
    "dedup_containment",
    oracle=f"""
WITH {_O_SHINGLES},
kept AS (
  SELECT s FROM sh GROUP BY s HAVING COUNT(*) <= {_MAX_DF}
),
shc AS (SELECT sh.doc_id, sh.s FROM sh JOIN kept USING (s)),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM shc GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS c
  FROM shc a JOIN shc b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, c AS n_common,
       c / LEAST(sa.n, sb.n) AS containment,
       c / (sa.n + sb.n - c) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE c / LEAST(sa.n, sb.n) >= {_CONT_T}
ORDER BY doc_a, doc_b
""",
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup pairs by 3-gram max-containment
    C(A,B) = |A∩B| / min(|A|,|B|) >= 0.6 — the quote/subset signal
    symmetric Jaccard misses (a page embedding a whole short document
    scores J ≈ |small|/|big| but C = 1.0).  Same df-capped blocking as
    ``dedup_ngram_jaccard`` (the cap bounds the candidate join; the
    measure is exact on the capped vocabulary); both measures come off
    ONE common-count join so curation policies can threshold either.
    Exact integer counts -> IEEE-identical doubles in both engines.
    """
    from ..operators.dedup import containment_pairs

    docs = load_table(spark, sf_dir, "documents")
    shingles = shingle_table(docs, 3)
    return containment_pairs(
        shingles, threshold=_CONT_T, max_df=_MAX_DF
    ).orderBy("doc_a", "doc_b")


# ---------------------------------------------------------------------------
# dedup: MinHash + LSH (4 bands x 2 rows) with exact verification
# ---------------------------------------------------------------------------

# 4 disjoint 32-bit (8-hex) slices per md5 digest as the hash family;
# hashes 4-7 read the salted second digest
# (must mirror operators/dedup.minhash_signatures exactly)
_MH = ",\n  ".join(
    f"MIN(substr(md5({'s' if h < 4 else chr(39) + '1|' + chr(39) + ' || s'}),"
    f" {(h % 4) * 8 + 1}, 8)) AS mh{h}"
    for h in range(8)
)
_BANDS = "\nUNION ALL\n".join(
    f"SELECT doc_id, {b} AS band, mh{2*b} || '|' || mh{2*b+1} AS sig FROM mh"
    for b in range(4)
)


# The full MinHash-LSH near-dup pair pipeline as a reusable CTE chain
# ending in `dup_pairs` — shared by dedup_minhash_lsh (the pairs
# themselves) and dedup_clusters (connected components over them).
_O_DUP_PAIRS = f"""{_O_SHINGLES},
mh AS (
  SELECT doc_id,
  {_MH}
  FROM sh GROUP BY doc_id
),
bandrows AS (
{_BANDS}
),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bandrows x
  JOIN bandrows y ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS ca, b.doc_id AS cb, COUNT(*) AS c
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
dup_pairs AS (
  SELECT cand.doc_a, cand.doc_b, c / (sa.n + sb.n - c) AS jaccard
  FROM cand
  JOIN common ON common.ca = cand.doc_a AND common.cb = cand.doc_b
  JOIN sizes sa ON sa.doc_id = cand.doc_a
  JOIN sizes sb ON sb.doc_id = cand.doc_b
  WHERE c / (sa.n + sb.n - c) >= {_JACCARD_T}
)"""


@query_fn(
    "dedup_minhash_lsh",
    oracle=f"""
WITH {_O_DUP_PAIRS}
SELECT doc_a, doc_b, jaccard FROM dup_pairs
ORDER BY doc_a, doc_b
""",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(8) -> 4 LSH bands -> bucket join -> verified Jaccard."""
    docs = load_table(spark, sf_dir, "documents")
    return minhash_lsh_dedup(
        docs, k=3, bands=4, rows_per_band=2, threshold=_JACCARD_T
    ).orderBy("doc_a", "doc_b")


# ---------------------------------------------------------------------------
# dedup: pair -> cluster closure (connected components)
# ---------------------------------------------------------------------------

@query_fn(
    "dedup_clusters",
    oracle=f"""
WITH RECURSIVE {_O_DUP_PAIRS},
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM dup_pairs
  UNION
  SELECT doc_b, doc_a FROM dup_pairs
),
reach(node, r) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.u, reach.r FROM edges e JOIN reach ON reach.node = e.v
)
SELECT node AS doc_id,
       MIN(r) AS cluster_id,
       (node = MIN(r)) AS is_kept
FROM reach
GROUP BY node
ORDER BY doc_id
""",
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs closed into duplicate CLUSTERS via distributed
    connected components (operators/graph.py); cluster_id is the
    minimum member — the canonical survivor. The oracle computes the
    same closure with a recursive reachability CTE."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_dedup(
        docs, k=3, bands=4, rows_per_band=2, threshold=_JACCARD_T
    )
    return dedup_cluster_assignments(pairs).orderBy("doc_id")


# ---------------------------------------------------------------------------
# dedup: SimHash Hamming-ball pairs
# ---------------------------------------------------------------------------

_SIMHASH_BITS = 32
_HEX_HIGH = "('8','9','a','b','c','d','e','f')"
_VOTES = ",\n  ".join(
    f"SUM(CASE WHEN substr(md5(tok), {j + 1}, 1) IN {_HEX_HIGH} "
    f"THEN tf ELSE -tf END) AS v{j}"
    for j in range(_SIMHASH_BITS)
)
_SIG = " + ".join(
    f"(CASE WHEN v{j} > 0 THEN {2**j} ELSE 0 END)" for j in range(_SIMHASH_BITS)
)


# SimHash signature/pair CTE chain with s-prefixed names so it can
# compose with the shingle/minhash chains in one WITH (multi-signal)
_O_SIMHASH_PAIRS = f"""stoks AS (
  SELECT doc_id, unnest(string_split({_O_NORM}, ' ')) AS tok FROM documents
),
stf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM stoks GROUP BY 1, 2),
svotes AS (
  SELECT doc_id,
  {_VOTES}
  FROM stf GROUP BY doc_id
),
ssigs AS (SELECT doc_id, CAST({_SIG} AS BIGINT) AS simhash FROM svotes),
sblocks AS (
  -- 4-block pigeonhole: Hamming <= 3 pairs share >= 1 exact 8-bit block
  {" UNION ALL ".join(
      f"SELECT doc_id, simhash, {j} AS blk, "
      f"(simhash // {2 ** (j * 8)}) % 256 AS block FROM ssigs"
      for j in range(4)
  )}
),
spairs AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
         x.simhash AS sa, y.simhash AS sb
  FROM sblocks x
  JOIN sblocks y ON x.blk = y.blk AND x.block = y.block AND x.doc_id < y.doc_id
)"""


@query_fn(
    "dedup_simhash",
    oracle=f"""
WITH {_O_SIMHASH_PAIRS}
SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS INTEGER) AS hamming
FROM spairs
WHERE bit_count(xor(sa, sb)) <= 3
ORDER BY doc_a, doc_b
""",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-weighted 32-bit SimHash; ALL pairs within Hamming distance 3
    (exact — 4-block pigeonhole blocking guarantees recall 1 for
    distance <= 3)."""
    docs = load_table(spark, sf_dir, "documents")
    out = simhash_near_dups(docs, num_bits=_SIMHASH_BITS, max_hamming=3)
    return out.withColumn("hamming", F.col("hamming").cast("int")).orderBy(
        "doc_a", "doc_b"
    )


# ---------------------------------------------------------------------------
# dedup: multi-signal report off ONE shared tokenize pass
# ---------------------------------------------------------------------------

@query_fn(
    "dedup_multi_signal",
    oracle=f"""
WITH {_O_DUP_PAIRS},
{_O_SIMHASH_PAIRS},
hp AS (
  SELECT doc_a, doc_b FROM spairs WHERE bit_count(xor(sa, sb)) <= 3
),
ex AS (SELECT doc_id, md5({_O_NORM}) AS content_hash FROM documents),
exg AS (
  SELECT content_hash, COUNT(*) AS n_exact_copies, MIN(doc_id) AS keeper
  FROM ex GROUP BY 1
),
nd AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM (
    SELECT doc_a AS doc_id FROM dup_pairs
    UNION ALL SELECT doc_b FROM dup_pairs
  ) GROUP BY 1
),
hd AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM (
    SELECT doc_a AS doc_id FROM hp UNION ALL SELECT doc_b FROM hp
  ) GROUP BY 1
)
SELECT ex.doc_id, ex.content_hash, exg.n_exact_copies,
       ex.doc_id = exg.keeper AS is_canonical,
       CAST(COALESCE(nd.n, 0) AS BIGINT) AS n_near_dup_neighbors,
       CAST(COALESCE(hd.n, 0) AS BIGINT) AS n_hamming_neighbors
FROM ex
JOIN exg USING (content_hash)
LEFT JOIN nd ON nd.doc_id = ex.doc_id
LEFT JOIN hd ON hd.doc_id = ex.doc_id
ORDER BY ex.doc_id
""",
)
def dedup_multi_signal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document dedup report: exact copies + MinHash-verified
    near-dup degree + SimHash Hamming-ball degree, all derived from
    ONE pinned normalize+tokenize pass (operators/dedup.py
    multi_signal_dedup) — the amortized-scan shape a 100-TB curation
    run uses instead of re-tokenizing the corpus once per signal."""
    from ..operators.dedup import multi_signal_dedup

    docs = load_table(spark, sf_dir, "documents")
    return multi_signal_dedup(
        docs, k=3, bands=4, rows_per_band=2, threshold=_JACCARD_T,
        num_bits=_SIMHASH_BITS, max_hamming=3,
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# embedding ops: shared oracle element-table CTE (dim = 64)
# ---------------------------------------------------------------------------

_O_ELEMENTS = """
el AS (
  SELECT vec_id AS vid, CAST(i AS INTEGER) AS pos,
         CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) AS val
  FROM embeddings CROSS JOIN range(1, 65) t(i)
),
nrm AS (
  SELECT vid,
         sqrt(CAST(SUM(CAST(FLOOR(val * val * 1e6) AS BIGINT)) AS DOUBLE) / 1e6)
           AS norm
  FROM el GROUP BY vid
)
"""


@query_fn(
    "sim_embedding_topk",
    oracle=f"""
WITH {_O_ELEMENTS},
pel AS (SELECT * FROM el WHERE vid % 100 = 0),
dots AS (
  SELECT p.vid AS qid, c.vid AS cid,
         CAST(SUM(CAST(FLOOR(p.val * c.val * 1e6) AS BIGINT)) AS DOUBLE) / 1e6
           AS dot
  FROM pel p JOIN el c ON p.pos = c.pos
  GROUP BY 1, 2
),
cos AS (
  SELECT qid, cid, dot / NULLIF(nq.norm * nc.norm, 0.0) AS cosine
  FROM dots
  JOIN nrm nq ON nq.vid = qid
  JOIN nrm nc ON nc.vid = cid
  WHERE qid != cid
)
SELECT qid AS query_id, cid AS neighbor_id,
       CAST(row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid) AS INTEGER)
         AS rank,
       cosine
FROM cos
QUALIFY rank <= 10
ORDER BY query_id, rank
""",
)
def sim_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 neighbors for the probe subset
    (vec_id % 100 == 0)."""
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") % 100 == 0)
    return brute_force_topk(emb, probes, k=10).orderBy("query_id", "rank")


_NEARDUP_T = 0.35


@query_fn(
    "dedup_embedding_cosine",
    oracle=f"""
WITH {_O_ELEMENTS},
sel AS (SELECT * FROM el WHERE vid % 5 = 0),
dots AS (
  SELECT a.vid AS qid, b.vid AS cid,
         CAST(SUM(CAST(FLOOR(a.val * b.val * 1e6) AS BIGINT)) AS DOUBLE) / 1e6
           AS dot
  FROM sel a JOIN sel b ON a.pos = b.pos AND a.vid < b.vid
  GROUP BY 1, 2
)
SELECT qid AS vec_a, cid AS vec_b,
       dot / NULLIF(nq.norm * nc.norm, 0.0) AS cosine
FROM dots
JOIN nrm nq ON nq.vid = qid
JOIN nrm nc ON nc.vid = cid
WHERE dot / NULLIF(nq.norm * nc.norm, 0.0) >= {_NEARDUP_T}
ORDER BY vec_a, vec_b
""",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs (cosine >= 0.35) over the sampled
    subset vec_id % 5 == 0 (brute force — the exact baseline the LSH
    path approximates)."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 5 == 0)
    pairs = cosine_pairs(emb, emb).filter(F.col("qid") < F.col("cid"))
    return (
        pairs.filter(F.col("cosine") >= _NEARDUP_T)
        .select(
            F.col("qid").alias("vec_a"), F.col("cid").alias("vec_b"), "cosine"
        )
        .orderBy("vec_a", "vec_b")
    )


# ---------------------------------------------------------------------------
# hyperplane-LSH ANN (the scale path) — candidates via banded signature
# ---------------------------------------------------------------------------

_ANN_BITS, _ANN_BANDS, _ANN_MIN_COS = 40, 4, 0.4
_HP_PARAMS = [hyperplane_params(b) for b in range(_ANN_BITS)]
# exact snapped-cosine verify of a ``cand`` (qid, cid) CTE — vdots +
# vcos, the one fragment every IVF-family oracle shares.  Factored
# (r11 review) so a change to the snapping contract lands in exactly
# one place; ``el``/``nrm`` must be in scope.
_O_VERIFY_PAIR = """vdots AS (
  SELECT cand.qid, cand.cid,
         CAST(SUM(CAST(FLOOR(a.val * b.val * 1e6) AS BIGINT)) AS DOUBLE) / 1e6
           AS dot
  FROM cand
  JOIN el a ON a.vid = cand.qid
  JOIN el b ON b.vid = cand.cid AND b.pos = a.pos
  GROUP BY 1, 2
),
vcos AS (
  SELECT qid, cid, dot / NULLIF(nq.norm * nc.norm, 0.0) AS cosine
  FROM vdots
  JOIN nrm nq ON nq.vid = qid
  JOIN nrm nc ON nc.vid = cid
)"""


_HSUMS = ",\n  ".join(
    f"SUM(CAST(FLOOR(val * 1e6) AS BIGINT) * ((({c} + pos * {st}) % 1013 % 19) - 9)) AS h{b}"
    for b, (c, st) in enumerate(_HP_PARAMS)
)
_SIG_ANN = " + ".join(
    f"(CASE WHEN h{b} > 0 THEN {2**b} ELSE 0 END)" for b in range(_ANN_BITS)
)
_BAND_KEYS = "\nUNION ALL\n".join(
    f"SELECT vid, {b} AS band, (sig // {2**(b*10)}) % 1024 AS key FROM sigs"
    for b in range(_ANN_BANDS)
)


@query_fn(
    "sim_ann_lsh",
    oracle=f"""
WITH {_O_ELEMENTS},
hs AS (
  SELECT vid,
  {_HSUMS}
  FROM el GROUP BY vid
),
sigs AS (SELECT vid, CAST({_SIG_ANN} AS BIGINT) AS sig FROM hs),
bandrows AS (
{_BAND_KEYS}
),
cand AS (
  SELECT DISTINCT x.vid AS qid, y.vid AS cid
  FROM bandrows x
  JOIN bandrows y ON x.band = y.band AND x.key = y.key AND x.vid < y.vid
),
dots AS (
  SELECT cand.qid, cand.cid,
         CAST(SUM(CAST(FLOOR(a.val * b.val * 1e6) AS BIGINT)) AS DOUBLE) / 1e6
           AS dot
  FROM cand
  JOIN el a ON a.vid = cand.qid
  JOIN el b ON b.vid = cand.cid AND b.pos = a.pos
  GROUP BY 1, 2
)
SELECT qid AS vec_a, cid AS vec_b,
       dot / NULLIF(nq.norm * nc.norm, 0.0) AS cosine
FROM dots
JOIN nrm nq ON nq.vid = qid
JOIN nrm nc ON nc.vid = cid
WHERE dot / NULLIF(nq.norm * nc.norm, 0.0) >= {_ANN_MIN_COS}
ORDER BY vec_a, vec_b
""",
)
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded hyperplane-LSH candidate generation + exact verify
    (cosine >= 0.4).

    SCALE CAVEAT (measured, round-8 ramp): the band-key space here is
    FIXED (4 × 10-bit bands), so random band collisions grow the
    candidate set as ~N²·bands/2^10 — the x10→x30 fit is 1.28 with
    the full-rank hyperplane family (the original 2.85 / 213s-at-x30
    measurement was dominated by the degenerate ≤19-plane family,
    since fixed — hyperplane_params has both layers).  This form
    stays registered as the ramp subject and oracle-history anchor;
    the PRODUCTION all-pairs form is ``sim_ann_lsh_sized`` (band keys
    sized to the corpus, candidates linear — fit 0.52 out to x100),
    and the serving form is ``sim_ann_lsh_fixed`` (probe panel,
    linear by construction)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_ann_pairs(
        emb, num_bits=_ANN_BITS, bands=_ANN_BANDS, min_cosine=_ANN_MIN_COS
    ).orderBy("vec_a", "vec_b")


# size-aware variant: 60-bit signatures (the widest 4-band layout
# whose per-band slice arithmetic stays in exact long/double range),
# band keys masked to w = bitlength(N-1) - 3 bits — expected bucket
# occupancy ~4-8 at ANY corpus size (smallest w with 2^w >= N/8
# bounds N/2^w to (4, 8]; SCALE.md measures 4.6-7.6), so candidate
# generation is
# linear in N (operators/similarity.lsh_key_bits has the math and the
# measured quadratic it replaces)
# per-band DIRECT keys: band b's key is built from its OWN 30
# hyperplanes (plane index b·30 + j), never packed through one
# 60-bit signature word — the packed form caps key width at 15 bits
# and its size-aware sizing clamps once N passes ~2^18 (measured:
# 8.4s at x100 → 125.8s at x300); 30-bit bands hold occupancy
# constant out to ~2^33 vectors
_SZ_BANDS, _SZ_R = 4, 30
_HP_PARAMS_SZ = [hyperplane_params(b) for b in range(_SZ_BANDS * _SZ_R)]
_HSUMS_SZ = ",\n  ".join(
    f"SUM(CAST(FLOOR(val * 1e6) AS BIGINT) * ((({c} + pos * {st}) % 1013 % 19) - 9)) AS h{b}"
    for b, (c, st) in enumerate(_HP_PARAMS_SZ)
)


def _sz_band_key(b: int) -> str:
    return " + ".join(
        f"(CASE WHEN h{b * _SZ_R + j} > 0 THEN {2**j} ELSE 0 END)"
        for j in range(_SZ_R)
    )


_BAND_KEYS_SZ = "\nUNION ALL\n".join(
    f"SELECT vid, {b} AS band,"
    f" CAST({_sz_band_key(b)} AS BIGINT)"
    f" % (SELECT kmod FROM lpar) AS key FROM hs"
    for b in range(_SZ_BANDS)
)


@query_fn(
    "sim_ann_lsh_sized",
    oracle=f"""
WITH {_O_ELEMENTS},
lpar AS (
  SELECT CAST(1 AS BIGINT) << GREATEST(1, LEAST({_SZ_R},
           CAST(LENGTH(BIN(CAST(COUNT(*) - 1 AS BIGINT))) AS INTEGER) - 3))
         AS kmod
  FROM embeddings
),
hs AS (
  SELECT vid,
  {_HSUMS_SZ}
  FROM el GROUP BY vid
),
bandrows AS (
{_BAND_KEYS_SZ}
),
cand AS (
  SELECT DISTINCT x.vid AS qid, y.vid AS cid
  FROM bandrows x
  JOIN bandrows y ON x.band = y.band AND x.key = y.key AND x.vid < y.vid
),
dots AS (
  SELECT cand.qid, cand.cid,
         CAST(SUM(CAST(FLOOR(a.val * b.val * 1e6) AS BIGINT)) AS DOUBLE) / 1e6
           AS dot
  FROM cand
  JOIN el a ON a.vid = cand.qid
  JOIN el b ON b.vid = cand.cid AND b.pos = a.pos
  GROUP BY 1, 2
)
SELECT qid AS vec_a, cid AS vec_b,
       dot / NULLIF(nq.norm * nc.norm, 0.0) AS cosine
FROM dots
JOIN nrm nq ON nq.vid = qid
JOIN nrm nc ON nc.vid = cid
WHERE dot / NULLIF(nq.norm * nc.norm, 0.0) >= {_ANN_MIN_COS}
ORDER BY vec_a, vec_b
""",
)
def sim_ann_lsh_sized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION all-pairs hyperplane-LSH form: band keys carry
    w = bitlength(N−1) − 3 bits computed DIRECTLY per band from 30
    hyperplanes each, so expected bucket occupancy — and with it the
    candidate count per vector — stays constant out to ~2^33 vectors,
    where the fixed 10-bit key space of ``sim_ann_lsh`` is quadratic
    by random collisions alone (round-8 ramp: fixed-key 1.28; the
    intermediate packed-60-bit sizing clamped at 15 key bits and
    jumped 8.4s→125.8s at x300 when N outgrew 2^15 keys — the direct
    per-band form removes the word-width ceiling entirely).  Same
    exact-cosine verify and threshold; recall per pair follows
    1-(1-p^w)^bands — the bit budget is the recall dial, spent here
    on keeping cost linear."""
    from ..operators.similarity import banded_ann_pairs, lsh_key_bits

    emb = load_table(spark, sf_dir, "embeddings")
    n = table_count(spark, sf_dir, "embeddings")
    return banded_ann_pairs(
        emb,
        bands=_SZ_BANDS,
        bits_per_band=_SZ_R,
        min_cosine=_ANN_MIN_COS,
        key_bits=lsh_key_bits(n, seg_bits=_SZ_R),
    ).orderBy("vec_a", "vec_b")


@query_fn(
    "lsh_candidate_stats",
    oracle=f"""
WITH {{_O_ELEMENTS}},
lpar AS (
  SELECT CAST(1 AS BIGINT) << GREATEST(1, LEAST({_SZ_R},
           CAST(LENGTH(BIN(CAST(COUNT(*) - 1 AS BIGINT))) AS INTEGER) - 3))
         AS kmod
  FROM embeddings
),
hs AS (
  SELECT vid,
  {_HSUMS_SZ}
  FROM el GROUP BY vid
),
bandrows AS (
{_BAND_KEYS_SZ}
),
cand AS (
  SELECT DISTINCT x.vid AS qid, y.vid AS cid
  FROM bandrows x
  JOIN bandrows y ON x.band = y.band AND x.key = y.key AND x.vid < y.vid
),
ver AS (
  SELECT d.qid FROM (
    SELECT cand.qid, cand.cid,
           CAST(SUM(CAST(FLOOR(a.val * b.val * 1e6) AS BIGINT)) AS DOUBLE)
             / 1e6 AS dot
    FROM cand
    JOIN el a ON a.vid = cand.qid
    JOIN el b ON b.vid = cand.cid AND b.pos = a.pos
    GROUP BY 1, 2
  ) d
  JOIN nrm nq ON nq.vid = d.qid
  JOIN nrm nc ON nc.vid = d.cid
  WHERE d.dot / NULLIF(nq.norm * nc.norm, 0.0) >= {_ANN_MIN_COS}
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM embeddings) AS n_vectors,
       (SELECT CAST(GREATEST(1, LEAST({_SZ_R},
          CAST(LENGTH(BIN(CAST(COUNT(*) - 1 AS BIGINT))) AS INTEGER) - 3))
          AS INTEGER) FROM embeddings) AS key_bits,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS candidate_pairs,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM ver) AS verified_pairs,
       CAST((SELECT COUNT(*) FROM cand) AS DOUBLE)
         / CAST((SELECT COUNT(*) FROM embeddings) AS DOUBLE)
         AS pairs_per_vector
""".replace("{_O_ELEMENTS}", _O_ELEMENTS),
)
def lsh_candidate_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pair-normalized LSH scale invariant as a FIRST-CLASS query
    (round 9): one row of (n_vectors, key_bits, candidate_pairs,
    verified_pairs, pairs_per_vector) for the sized banded LSH —
    operators/similarity.banded_ann_stats, sharing the pinned key
    table and candidate set the production `sim_ann_lsh_sized` pair
    join uses.

    Why it exists: the round-9 ramp showed wall-clock exponents for
    the LSH family are dominated by integer key-width quantization
    (occupancy oscillates in (4, 8] as w steps), while cost per
    candidate pair stays flat-to-falling across six decades (SCALE.md
    "pair-normalized cost").  pairs_per_vector IS that invariant: a
    monitoring job alerts when it drifts above the bands·occupancy
    envelope (sizing regression / hot-bucket skew) without
    materializing pair rows."""
    from ..operators.similarity import banded_ann_stats, lsh_key_bits

    emb = load_table(spark, sf_dir, "embeddings")
    n = table_count(spark, sf_dir, "embeddings")
    return banded_ann_stats(
        emb,
        bands=_SZ_BANDS,
        bits_per_band=_SZ_R,
        key_bits=lsh_key_bits(n, seg_bits=_SZ_R),
        min_cosine=_ANN_MIN_COS,
        n=n,
    )


# ---------------------------------------------------------------------------
# IVF ANN (the query-workload scale path) — coarse-quantize into cells,
# probe only the nprobe nearest cells
# ---------------------------------------------------------------------------

_IVF_STRIDE, _IVF_NPROBE, _IVF_K = 25, 4, 10

# the scaling probe set every sim_ann_* query uses, and the FIXED
# 50-id serving panel (ids 0,10,...,490 — present at every SF) the
# *_fixed production variants probe, so their bench timings measure a
# constant probe batch instead of conflating corpus and probe growth
_O_PROBE_PRED = "vid % 100 = 0"
_O_PANEL_PRED = "vid % 10 = 0 AND vid < 500"


def _panel_filter(col: str = "vec_id"):
    """Spark twin of _O_PANEL_PRED."""
    return (F.col(col) % 10 == 0) & (F.col(col) < 500)


# shared by sim_ann_ivf (one-shot) and sim_ann_ivf_indexed (prebuilt
# index) — identical query semantics, different execution lifecycle
# candidate-generation CTE chain (cell assign + probe cells + cand) —
# shared with the IVF-PQ composition in plans/selection_queries.py;
# parameterized on the probe predicate so the fixed-panel serving
# variants replay through the SAME fragment
def _o_ivf_cand(
    probe_pred: str,
    stride_sql: str | None = None,
    nprobe_sql: str | None = None,
) -> str:
    """``stride_sql``/``nprobe_sql`` override the literal stride-25 /
    nprobe-4 constants with SQL expressions (e.g. scalar subqueries
    over a size-derived parameter CTE) — the √N-cell production
    variants replay through the SAME fragment."""
    stride_sql = stride_sql or str(_IVF_STRIDE)
    nprobe_sql = nprobe_sql or str(_IVF_NPROBE)
    return f"""
adots AS (
  SELECT v.vid AS vid, c.vid AS cvid,
         CAST(SUM(CAST(FLOOR(v.val * c.val * 1e6) AS BIGINT)) AS DOUBLE) / 1e6
           AS dot
  FROM el v JOIN el c ON v.pos = c.pos AND c.vid % {stride_sql} = 0
  GROUP BY 1, 2
),
acos AS (
  SELECT adots.vid AS vid, cvid, dot / NULLIF(nv.norm * nc.norm, 0.0) AS cosine
  FROM adots
  JOIN nrm nv ON nv.vid = adots.vid
  JOIN nrm nc ON nc.vid = cvid
),
assign AS (
  SELECT vid, cvid FROM acos
  QUALIFY row_number() OVER (PARTITION BY vid ORDER BY cosine DESC, cvid) = 1
),
pcells AS (
  SELECT vid AS qid, cvid FROM acos WHERE {probe_pred}
  QUALIFY row_number() OVER (PARTITION BY vid ORDER BY cosine DESC, cvid)
    <= {nprobe_sql}
),
cand AS (
  SELECT DISTINCT p.qid, a.vid AS cid
  FROM pcells p JOIN assign a ON a.cvid = p.cvid
  WHERE a.vid != p.qid
)
"""


_O_IVF_CAND = _o_ivf_cand(_O_PROBE_PRED)

_O_IVF = f"""
WITH {_O_ELEMENTS},
{_O_IVF_CAND.strip()},
dots AS (
  SELECT cand.qid, cand.cid,
         CAST(SUM(CAST(FLOOR(a.val * b.val * 1e6) AS BIGINT)) AS DOUBLE) / 1e6
           AS dot
  FROM cand
  JOIN el a ON a.vid = cand.qid
  JOIN el b ON b.vid = cand.cid AND b.pos = a.pos
  GROUP BY 1, 2
),
cos AS (
  SELECT qid, cid, dot / NULLIF(nq.norm * nc.norm, 0.0) AS cosine
  FROM dots
  JOIN nrm nq ON nq.vid = qid
  JOIN nrm nc ON nc.vid = cid
)
SELECT qid AS query_id, cid AS neighbor_id,
       CAST(row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid)
            AS INTEGER) AS rank,
       cosine
FROM cos
QUALIFY rank <= {_IVF_K}
ORDER BY query_id, rank
"""


@query_fn("sim_ann_ivf", oracle=_O_IVF)
def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-10 for the probe subset (vec_id % 100 == 0):
    centroid cells from the deterministic stride-25 quantizer, each
    probe searching only its 4 nearest cells. Compare against
    ``sim_embedding_topk`` (the exact baseline) for recall."""
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") % 100 == 0)
    return ivf_topk(
        emb,
        probes,
        k=_IVF_K,
        centroid_stride=_IVF_STRIDE,
        nprobe=_IVF_NPROBE,
    ).orderBy("query_id", "rank")


@query_fn("sim_ann_ivf_indexed", oracle=_O_IVF)
def sim_ann_ivf_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME IVF top-10 through the build-once/probe-many index
    lifecycle: the cell table is written PARTITIONED BY CELL and the
    probe scan partition-prunes to its nprobe cells (dynamic partition
    pruning; plan-gated) — the serving shape where probe IO is
    O(corpus · nprobe / cells), not a full corpus pass per probe
    batch.  Must hash-match sim_ann_ivf's oracle exactly."""
    from ..operators.similarity import build_ivf_index, ivf_probe_index
    from .streaming_queries import _fresh_result_dir

    emb = load_table(spark, sf_dir, "embeddings")
    index_dir = _fresh_result_dir("ivf_index")
    build_ivf_index(emb, index_dir, centroid_stride=_IVF_STRIDE)
    probes = emb.filter(F.col("vec_id") % 100 == 0)
    return ivf_probe_index(
        spark, index_dir, probes, k=_IVF_K, nprobe=_IVF_NPROBE
    ).orderBy("query_id", "rank")


# ---------------------------------------------------------------------------
# ANN recall report: measured recall@k of IVF vs the exact baseline
# ---------------------------------------------------------------------------

@query_fn(
    "sim_ann_recall_report",
    oracle=f"""
WITH {_O_ELEMENTS},
pel AS (SELECT * FROM el WHERE vid % 100 = 0),
bdots AS (
  SELECT p.vid AS qid, c.vid AS cid,
         CAST(SUM(CAST(FLOOR(p.val * c.val * 1e6) AS BIGINT)) AS DOUBLE) / 1e6
           AS dot
  FROM pel p JOIN el c ON p.pos = c.pos
  GROUP BY 1, 2
),
bcos AS (
  SELECT qid, cid, dot / NULLIF(nq.norm * nc.norm, 0.0) AS cosine
  FROM bdots
  JOIN nrm nq ON nq.vid = qid
  JOIN nrm nc ON nc.vid = cid
  WHERE qid != cid
),
bt AS (
  SELECT qid, cid FROM bcos
  QUALIFY row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid)
    <= {_IVF_K}
),
adots AS (
  SELECT v.vid AS vid, c.vid AS cvid,
         CAST(SUM(CAST(FLOOR(v.val * c.val * 1e6) AS BIGINT)) AS DOUBLE) / 1e6
           AS dot
  FROM el v JOIN el c ON v.pos = c.pos AND c.vid % {_IVF_STRIDE} = 0
  GROUP BY 1, 2
),
acos AS (
  SELECT adots.vid AS vid, cvid, dot / NULLIF(nv.norm * nc.norm, 0.0) AS cosine
  FROM adots
  JOIN nrm nv ON nv.vid = adots.vid
  JOIN nrm nc ON nc.vid = cvid
),
assign AS (
  SELECT vid, cvid FROM acos
  QUALIFY row_number() OVER (PARTITION BY vid ORDER BY cosine DESC, cvid) = 1
),
pcells AS (
  SELECT vid AS qid, cvid FROM acos WHERE vid % 100 = 0
  QUALIFY row_number() OVER (PARTITION BY vid ORDER BY cosine DESC, cvid)
    <= {_IVF_NPROBE}
),
cand AS (
  SELECT DISTINCT p.qid, a.vid AS cid
  FROM pcells p JOIN assign a ON a.cvid = p.cvid
  WHERE a.vid != p.qid
),
{_O_VERIFY_PAIR},
it AS (
  SELECT qid, cid FROM vcos
  QUALIFY row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid)
    <= {_IVF_K}
)
SELECT CAST(COUNT(DISTINCT bt.qid) AS BIGINT) AS n_probes,
       CAST({_IVF_K} AS INTEGER) AS k,
       CAST(COUNT(it.cid) AS BIGINT) AS n_hits,
       CAST(COUNT(*) AS BIGINT) AS n_expected,
       COUNT(it.cid) * 1.0e0 / COUNT(*) AS recall_at_k
FROM bt LEFT JOIN it ON it.qid = bt.qid AND it.cid = bt.cid
""",
)
def sim_ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEASURED recall@10 of the stride-quantizer IVF against the
    exact brute-force baseline over the probe set.  One row:
    (n_probes, k, n_hits, n_expected, recall_at_k).

    CAVEAT (round-8 finding): this report's 0.96 is PROBE-CENTROID
    ALIASING, not quantizer quality — every probe id (%100) is also a
    stride-25 centroid id, so each probe's own Voronoi cell contains
    its nearest neighbors by construction; with non-centroid probes
    the stride quantizer measures 0.53.  The honest production number
    is sim_ann_recall_trained (trained centroids are means, which no
    probe can alias).  This row stays registered as the measured
    record of the artifact."""
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") % 100 == 0)
    exact = brute_force_topk(emb, probes, k=_IVF_K).select(
        "query_id", "neighbor_id"
    )
    approx = ivf_topk(
        emb, probes, k=_IVF_K,
        centroid_stride=_IVF_STRIDE, nprobe=_IVF_NPROBE,
    ).select("query_id", F.col("neighbor_id").alias("_hit_id"))
    joined = exact.join(
        approx,
        (exact.query_id == approx.query_id)
        & (exact.neighbor_id == approx._hit_id),
        "left",
    ).select(exact.query_id, exact.neighbor_id, "_hit_id")
    return joined.agg(
        F.countDistinct("query_id").alias("n_probes"),
        F.lit(_IVF_K).cast("int").alias("k"),
        F.count("_hit_id").alias("n_hits"),
        F.count(F.lit(1)).alias("n_expected"),
        (F.count("_hit_id") * F.lit(1.0) / F.count(F.lit(1))).alias(
            "recall_at_k"
        ),
    )


# ---------------------------------------------------------------------------
# TRAINED √N-cell IVF — the production ANN path (deterministic Lloyd
# quantizer, oracle-replayed bit for bit; operators/similarity.py
# train_ivf_centroids / ivf_topk_trained)
# ---------------------------------------------------------------------------

_IVF_ITERS = 2       # Lloyd rounds — assignments stabilize by 2 here
_NPROBE_FRAC = 0.7   # probe ceil(0.7·√N) cells: recall 0.98 measured


def _o_lloyd_round(i: int, prev: str) -> str:
    """One Lloyd iteration as CTEs: normed view of the previous
    centroid table, snapped-cosine argmax assignment, floor-snapped
    mean update — each arithmetic step written exactly as the Spark
    operator computes it (exact BIGINT sums, one correctly-rounded
    double divide), so the trained centroids replay bit for bit.
    Training reads only ``tel``/``telq`` (the TRAINING-corpus views),
    which equal ``el``/``elq`` except in the incremental-append
    oracle, where training saw only the initial corpus."""
    return f"""
c{i}v AS (SELECT cvid, pos, CAST(cq AS DOUBLE) / 1e6 AS cval FROM {prev}),
c{i}n AS (
  SELECT cvid,
         sqrt(CAST(SUM(CAST(FLOOR(cval * cval * 1e6) AS BIGINT)) AS DOUBLE) / 1e6)
           AS cnorm
  FROM c{i}v GROUP BY 1
),
a{i}d AS (
  SELECT v.vid, c.cvid,
         CAST(SUM(CAST(FLOOR(v.val * c.cval * 1e6) AS BIGINT)) AS DOUBLE) / 1e6
           AS dot
  FROM tel v JOIN c{i}v c ON v.pos = c.pos GROUP BY 1, 2
),
a{i} AS (
  SELECT a{i}d.vid, a{i}d.cvid AS cvid FROM a{i}d
  JOIN nrm nv ON nv.vid = a{i}d.vid
  JOIN c{i}n cn ON cn.cvid = a{i}d.cvid
  QUALIFY row_number() OVER (
    PARTITION BY a{i}d.vid
    ORDER BY dot / NULLIF(nv.norm * cn.cnorm, 0.0) DESC, a{i}d.cvid) = 1
),
c{i + 1} AS (
  SELECT a{i}.cvid, telq.pos,
         CAST(FLOOR(CAST(SUM(telq.q) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
              AS BIGINT) AS cq
  FROM a{i} JOIN telq ON telq.vid = a{i}.vid GROUP BY 1, 2
)"""


def _o_ivf_trained_cand(
    probe_pred: str,
    corpus_pred: str = "TRUE",
    nprobe_sql: str = "(SELECT nprobe FROM par)",
) -> str:
    """CTE chain replaying the trained quantizer end-to-end — ≈√N
    strided seeds, _IVF_ITERS Lloyd rounds, final assignment, probe
    cells sized ceil(_NPROBE_FRAC·√N), candidate pairs. ``el``/``nrm``
    must be in scope (the shared _O_ELEMENTS prologue).

    ``nprobe_sql`` overrides the size-derived probe budget with a SQL
    expression (e.g. a fixed literal for the clustered-corpus serving
    form, where a constant nprobe holds recall — SCALE.md r11 study).

    ``corpus_pred`` (over ``vid``) restricts the TRAINING corpus —
    seeds, Lloyd assignments, mean updates, and the N that sizes
    stride/nprobe — while the FINAL assignment and probes still cover
    every vector: the incremental-append semantics, where data that
    arrived after training is assigned to the frozen centroids."""
    t = _IVF_ITERS
    rounds = ",".join(_o_lloyd_round(i, f"c{i}") for i in range(t))
    return f"""
tel AS (SELECT * FROM el WHERE {corpus_pred}),
par AS (
  SELECT CAST(FLOOR(CAST(COUNT(*) AS DOUBLE)
              / FLOOR(SQRT(CAST(COUNT(*) AS DOUBLE)))) AS BIGINT) AS stride,
         CAST(CEIL({_NPROBE_FRAC} * FLOOR(SQRT(CAST(COUNT(*) AS DOUBLE))))
              AS BIGINT) AS nprobe
  FROM (SELECT DISTINCT vid FROM tel)
),
telq AS (SELECT vid, pos, CAST(FLOOR(val * 1e6) AS BIGINT) AS q FROM tel),
seeds AS (
  SELECT vid FROM (
    SELECT vid, row_number() OVER (ORDER BY vid) AS rn
    FROM (SELECT DISTINCT vid FROM telq)
  ) WHERE (rn - 1) % (SELECT stride FROM par) = 0
),
c0 AS (
  SELECT telq.vid AS cvid, pos, q AS cq FROM telq JOIN seeds USING (vid)
),
{rounds},
ctv AS (SELECT cvid, pos, CAST(cq AS DOUBLE) / 1e6 AS cval FROM c{t}),
ctn AS (
  SELECT cvid,
         sqrt(CAST(SUM(CAST(FLOOR(cval * cval * 1e6) AS BIGINT)) AS DOUBLE) / 1e6)
           AS cnorm
  FROM ctv GROUP BY 1
),
fdots AS (
  SELECT v.vid, c.cvid,
         CAST(SUM(CAST(FLOOR(v.val * c.cval * 1e6) AS BIGINT)) AS DOUBLE) / 1e6
           AS dot
  FROM el v JOIN ctv c ON v.pos = c.pos GROUP BY 1, 2
),
fcos AS (
  SELECT fdots.vid AS vid, fdots.cvid AS cvid,
         dot / NULLIF(nv.norm * cn.cnorm, 0.0) AS cosine
  FROM fdots
  JOIN nrm nv ON nv.vid = fdots.vid
  JOIN ctn cn ON cn.cvid = fdots.cvid
),
assign AS (
  SELECT vid, cvid FROM fcos
  QUALIFY row_number() OVER (PARTITION BY vid ORDER BY cosine DESC, cvid) = 1
),
pcells AS (
  SELECT vid AS qid, cvid FROM fcos WHERE {probe_pred}
  QUALIFY row_number() OVER (PARTITION BY vid ORDER BY cosine DESC, cvid)
    <= {nprobe_sql}
),
cand AS (
  SELECT DISTINCT p.qid, a.vid AS cid
  FROM pcells p JOIN assign a ON a.cvid = p.cvid
  WHERE a.vid != p.qid
)
"""


# exact-cosine verify + per-probe rank over a ``cand`` CTE — shared
# tail of every IVF-family oracle
_O_IVF_VERIFY_TAIL = f"""
{_O_VERIFY_PAIR}
SELECT qid AS query_id, cid AS neighbor_id,
       CAST(row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid)
            AS INTEGER) AS rank,
       cosine
FROM vcos
QUALIFY rank <= {_IVF_K}
ORDER BY query_id, rank
"""

_O_IVF_TRAINED = f"""
WITH {_O_ELEMENTS},
{_o_ivf_trained_cand(_O_PROBE_PRED).strip()},
{_O_IVF_VERIFY_TAIL.strip()}
"""

_O_IVF_TRAINED_PANEL = f"""
WITH {_O_ELEMENTS},
{_o_ivf_trained_cand(_O_PANEL_PRED).strip()},
{_O_IVF_VERIFY_TAIL.strip()}
"""

# incremental-append lifecycle: train + build on the initial 2/3 of
# the corpus (vec_id % 3 != 0), append the remaining 1/3 against the
# frozen centroids, probe the fixed serving panel over the union
_O_APPEND_CORPUS_PRED = "vid % 3 != 0"

_O_IVF_APPEND = f"""
WITH {_O_ELEMENTS},
{_o_ivf_trained_cand(_O_PANEL_PRED, _O_APPEND_CORPUS_PRED).strip()},
{_O_IVF_VERIFY_TAIL.strip()}
"""


def _trained_nprobe(n: int) -> int:
    """ceil(_NPROBE_FRAC · floor(sqrt(N))) — the Python twin of the
    oracle's ``par.nprobe`` (same IEEE double multiply and ceil)."""
    import math

    return math.ceil(_NPROBE_FRAC * max(1, math.floor(math.sqrt(n))))


@query_fn("sim_ann_ivf_trained", oracle=_O_IVF_TRAINED)
def sim_ann_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE PRODUCTION IVF: Lloyd-trained √N-cell coarse quantizer
    (deterministic snapped arithmetic — the oracle replays the
    *training* too, not just the probe), probe budget ceil(0.7·√N)
    cells.  Replaces the stride quantizer, whose corpus/stride
    centroid growth made the assign pass quadratic at scale
    (SCALE.md: √N sizing measured 2.6× faster at x10).

    Honesty note on recall (SCALE.md round 8): the stride recall
    report's 0.96 was PROBE-CENTROID ALIASING — every probe id
    (%100) is a stride-25 centroid, so each probe's own Voronoi cell
    contains exactly its nearest neighbors; re-measured with
    non-centroid probes the stride quantizer scores 0.53.  Trained
    cells score 0.58 at the same 4-cell budget and 0.98 at the
    registered 0.7·√N budget — on UNIFORM-SPHERE synthetic data,
    where every direction is equally populated and no quantizer has
    cheap cells to skip; clustered production embeddings need far
    smaller fractions."""
    from ..operators.similarity import ivf_topk_trained

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") % 100 == 0)
    return ivf_topk_trained(
        emb, probes, k=_IVF_K, iters=_IVF_ITERS, nprobe_frac=_NPROBE_FRAC,
        n=table_count(spark, sf_dir, "embeddings"),
    ).orderBy("query_id", "rank")


@query_fn("sim_ann_ivf_serving", oracle=_O_IVF_TRAINED_PANEL)
def sim_ann_ivf_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full production SERVING shape: trained √N cells through
    the build-once/probe-many index lifecycle (cells written
    partitioned by cvid, probe scan partition-prunes), probing the
    FIXED 50-id panel — so its bench timing tracks a constant probe
    batch against a growing corpus instead of conflating the two
    (the scaling-probe forms stay registered for the scale ramp)."""
    from ..operators.similarity import (
        _corpus_fingerprint,
        build_ivf_index_cached,
        ivf_probe_index,
        trained_centroids_cached,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    # train-once/build-once via the per-process artifact memo (the PQ
    # pattern, SCALE.md r10): deterministic training, so reuse is
    # hash-identical; probes are READ-ONLY so they hit the shared dir.
    # One fingerprint scan covers both memo lookups (r11 review) AND
    # the corpus count — its row count IS the table count, so the
    # separate count job is gone (r12 optimization).
    fp = _corpus_fingerprint(emb, "vec_id", "embedding")
    n = fp[0]
    cents = trained_centroids_cached(
        emb, f"{sf_dir}|full", iters=_IVF_ITERS, n=n, fingerprint=fp
    )
    index_dir = build_ivf_index_cached(
        emb, f"{sf_dir}|full", cents, centroids_key=f"iters{_IVF_ITERS}",
        fingerprint=fp,
    )
    probes = emb.filter(_panel_filter())
    return ivf_probe_index(
        spark, index_dir, probes, k=_IVF_K, nprobe=_trained_nprobe(n)
    ).orderBy("query_id", "rank")


@query_fn("sim_ann_ivf_append", oracle=_O_IVF_APPEND)
def sim_ann_ivf_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The INGEST lifecycle: train √N cells + build the partitioned
    index on the initial 2/3 of the corpus, then
    ``ivf_index_append`` the late-arriving 1/3 against the FROZEN
    centroids — assignment cost O(batch · cells), no retrain, no
    rewrite of existing cells — and probe the fixed serving panel
    over the union.

    This is the standing pattern for continuously-arriving embeddings
    at 100 TB (the inverted-file ``add()``): per-load cost is the
    batch's broadcast centroid assignment plus one cell-partitioned
    parquet append; the probe path is unchanged.  The oracle replays
    training on the initial corpus only and assignment over ALL
    vectors — exactly the lifecycle's visible semantics."""
    from ..operators.similarity import (
        _corpus_fingerprint,
        build_ivf_index_cached,
        ivf_index_append,
        ivf_probe_index,
        trained_centroids_cached,
    )
    from .streaming_queries import _fresh_result_dir

    emb = load_table(spark, sf_dir, "embeddings")
    initial = emb.filter(F.col("vec_id") % 3 != 0)
    late = emb.filter(F.col("vec_id") % 3 == 0)
    # shared with stream_ann_ingest (same training split): centroids
    # and the base index come from the per-process memo; the append
    # MUTATES, so it gets a fresh byte-identical copy of the base.
    # The fingerprint's row count IS the split count — no separate
    # count job (r12 optimization).
    fp = _corpus_fingerprint(initial, "vec_id", "embedding")
    n = fp[0]
    cents = trained_centroids_cached(
        initial, f"{sf_dir}|mod3", iters=_IVF_ITERS, n=n, fingerprint=fp
    )
    index_dir = build_ivf_index_cached(
        initial, f"{sf_dir}|mod3", cents,
        index_dir=_fresh_result_dir("ivf_append_index"),
        centroids_key=f"iters{_IVF_ITERS}",
        fingerprint=fp,
    )
    ivf_index_append(spark, index_dir, late)
    probes = emb.filter(_panel_filter())
    return ivf_probe_index(
        spark, index_dir, probes, k=_IVF_K, nprobe=_trained_nprobe(n)
    ).orderBy("query_id", "rank")


@query_fn("stream_ann_ingest", oracle=_O_IVF_APPEND)
def stream_ann_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME incremental-ingest semantics as ``sim_ann_ivf_append``,
    but the late third arrives as a REAL file-source stream in three
    micro-batches through the exactly-once ingest sink
    (streaming/sinks.run_ann_ingest_stream): each batch is assigned to
    the frozen centroids and written as its own (cell, load) partition
    set via dynamic partition overwrite — idempotent on redelivery, no
    ledger, no snapshot rewrite.  Appends are order-independent and
    assignment is deterministic, so the final index — and therefore
    the probe result — hash-matches the batch append oracle exactly."""
    from ..operators.similarity import (
        _corpus_fingerprint,
        build_ivf_index_cached,
        ivf_probe_index,
        trained_centroids_cached,
    )
    from ..streaming.sinks import run_ann_ingest_stream
    from .streaming_queries import _fresh_result_dir

    emb = load_table(spark, sf_dir, "embeddings")
    initial = emb.filter(F.col("vec_id") % 3 != 0)
    late = emb.filter(F.col("vec_id") % 3 == 0)
    # shared with sim_ann_ivf_append (same training split); the stream
    # sink MUTATES the index, so copy the memoized base.  The
    # fingerprint's row count IS the split count — no separate count
    # job (r12 optimization).
    fp = _corpus_fingerprint(initial, "vec_id", "embedding")
    n = fp[0]
    cents = trained_centroids_cached(
        initial, f"{sf_dir}|mod3", iters=_IVF_ITERS, n=n, fingerprint=fp
    )
    index_dir = build_ivf_index_cached(
        initial, f"{sf_dir}|mod3", cents,
        index_dir=_fresh_result_dir("ann_ingest_index"),
        centroids_key=f"iters{_IVF_ITERS}",
        fingerprint=fp,
    )
    src_dir = _fresh_result_dir("ann_ingest_src")
    late.repartition(3).write.mode("overwrite").parquet(src_dir)
    stream = (
        spark.readStream.schema(spark.read.parquet(src_dir).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    run_ann_ingest_stream(stream, spark, index_dir)
    probes = emb.filter(_panel_filter())
    return ivf_probe_index(
        spark, index_dir, probes, k=_IVF_K, nprobe=_trained_nprobe(n)
    ).orderBy("query_id", "rank")


@query_fn(
    "sim_ann_recall_trained",
    oracle=f"""
WITH {_O_ELEMENTS},
pel AS (SELECT * FROM el WHERE vid % 100 = 0),
bdots AS (
  SELECT p.vid AS qid, c.vid AS cid,
         CAST(SUM(CAST(FLOOR(p.val * c.val * 1e6) AS BIGINT)) AS DOUBLE) / 1e6
           AS dot
  FROM pel p JOIN el c ON p.pos = c.pos
  GROUP BY 1, 2
),
bcos AS (
  SELECT qid, cid, dot / NULLIF(nq.norm * nc.norm, 0.0) AS cosine
  FROM bdots
  JOIN nrm nq ON nq.vid = qid
  JOIN nrm nc ON nc.vid = cid
  WHERE qid != cid
),
bt AS (
  SELECT qid, cid FROM bcos
  QUALIFY row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid)
    <= {_IVF_K}
),
{_o_ivf_trained_cand(_O_PROBE_PRED).strip()},
{_O_VERIFY_PAIR},
it AS (
  SELECT qid, cid FROM vcos
  QUALIFY row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid)
    <= {_IVF_K}
)
SELECT CAST(COUNT(DISTINCT bt.qid) AS BIGINT) AS n_probes,
       CAST({_IVF_K} AS INTEGER) AS k,
       CAST(COUNT(it.cid) AS BIGINT) AS n_hits,
       CAST(COUNT(*) AS BIGINT) AS n_expected,
       COUNT(it.cid) * 1.0e0 / COUNT(*) AS recall_at_k
FROM bt LEFT JOIN it ON it.qid = bt.qid AND it.cid = bt.cid
""",
)
def sim_ann_recall_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEASURED recall@10 of the trained-√N IVF against the exact
    brute-force baseline — the honest replacement for
    sim_ann_recall_report, whose 0.96 was probe-centroid aliasing
    (see sim_ann_ivf_trained).  Trained centroids are means, never
    corpus points, so no probe can alias its own cell; 0.98 at the
    registered 0.7·√N probe budget at sf0.01."""
    from ..operators.similarity import brute_force_topk, ivf_topk_trained

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") % 100 == 0)
    exact = brute_force_topk(emb, probes, k=_IVF_K).select(
        "query_id", "neighbor_id"
    )
    approx = ivf_topk_trained(
        emb, probes, k=_IVF_K, iters=_IVF_ITERS, nprobe_frac=_NPROBE_FRAC,
        n=table_count(spark, sf_dir, "embeddings"),
    ).select("query_id", F.col("neighbor_id").alias("_hit_id"))
    joined = exact.join(
        approx,
        (exact.query_id == approx.query_id)
        & (exact.neighbor_id == approx._hit_id),
        "left",
    ).select(exact.query_id, exact.neighbor_id, "_hit_id")
    return joined.agg(
        F.countDistinct("query_id").alias("n_probes"),
        F.lit(_IVF_K).cast("int").alias("k"),
        F.count("_hit_id").alias("n_hits"),
        F.count(F.lit(1)).alias("n_expected"),
        (F.count("_hit_id") * F.lit(1.0) / F.count(F.lit(1))).alias(
            "recall_at_k"
        ),
    )


# deterministic clustered corpus (operators/similarity.clustered_corpus
# — integer arithmetic through prime 1013, one exact double division),
# regenerated bit-identically by the oracle from the embeddings ids
_CLUSTERED_DIM, _CLUSTERED_CENTERS, _CLUSTERED_NPROBE = 16, 32, 8

_O_CLUSTERED_EL = f"""
ids AS (SELECT vec_id AS vid FROM embeddings),
poss AS (SELECT range AS pos FROM range({_CLUSTERED_DIM})),
el AS (
  SELECT vid, pos,
         CAST((((((vid * 2654435761) % 1013) % {_CLUSTERED_CENTERS})
                 * 40503 + pos * 69069 + 17) % 1013 - 506) * 7
              + (((vid * 97 + pos * 31 + 7) % 151) - 75) * 30 AS DOUBLE)
           / 1000.0e0 AS val
  FROM ids, poss
),
nrm AS (
  SELECT vid,
         sqrt(CAST(SUM(CAST(FLOOR(val * val * 1e6) AS BIGINT)) AS DOUBLE) / 1e6)
           AS norm
  FROM el GROUP BY 1
)
"""


@query_fn(
    "sim_ann_clustered_recall",
    oracle=f"""
WITH {_O_CLUSTERED_EL.strip()},
pel AS (SELECT * FROM el WHERE {_O_PANEL_PRED}),
bdots AS (
  SELECT p.vid AS qid, c.vid AS cid,
         CAST(SUM(CAST(FLOOR(p.val * c.val * 1e6) AS BIGINT)) AS DOUBLE) / 1e6
           AS dot
  FROM pel p JOIN el c ON p.pos = c.pos
  GROUP BY 1, 2
),
bcos AS (
  SELECT qid, cid, dot / NULLIF(nq.norm * nc.norm, 0.0) AS cosine
  FROM bdots
  JOIN nrm nq ON nq.vid = qid
  JOIN nrm nc ON nc.vid = cid
  WHERE qid != cid
),
bt AS (
  SELECT qid, cid FROM bcos
  QUALIFY row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid)
    <= {_IVF_K}
),
{_o_ivf_trained_cand(_O_PANEL_PRED, nprobe_sql=str(_CLUSTERED_NPROBE)).strip()},
{_O_VERIFY_PAIR},
it AS (
  SELECT qid, cid FROM vcos
  QUALIFY row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid)
    <= {_IVF_K}
)
SELECT CAST((SELECT COUNT(*) FROM ids) AS BIGINT) AS n_vectors,
       CAST(FLOOR(SQRT(CAST((SELECT COUNT(*) FROM ids) AS DOUBLE)))
            AS BIGINT) AS n_cells,
       CAST({_CLUSTERED_NPROBE} AS INTEGER) AS nprobe,
       CAST(COUNT(DISTINCT bt.qid) AS BIGINT) AS n_probes,
       CAST({_IVF_K} AS INTEGER) AS k,
       CAST(COUNT(it.cid) AS BIGINT) AS n_hits,
       CAST(COUNT(*) AS BIGINT) AS n_expected,
       COUNT(it.cid) * 1.0e0 / COUNT(*) AS recall_at_k
FROM bt LEFT JOIN it ON it.qid = bt.qid AND it.cid = bt.cid
""",
)
def sim_ann_clustered_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r11 nprobe study's clustered-data claim as an ORACLE-GATED
    registry entry: on a deterministic 32-cluster corpus (derived
    arithmetically from the embeddings ids —
    operators/similarity.clustered_corpus), the trained √N-cell IVF
    holds high recall@10 at a FIXED nprobe=8
    regardless of corpus size, so candidates/probe is O(√N) — the
    production serving shape on real (structured) embeddings, vs the
    uniform testdata corpus where honest recall needs a ~0.7 cell
    fraction (see sim_ann_recall_trained and SCALE.md round 11).

    The oracle regenerates the corpus bit-identically (integer
    arithmetic + one exact double division), replays Lloyd training,
    fixed-panel probing at the constant budget, and the brute-force
    baseline, then hash-checks the recall summary — recall itself is
    driver-verified, not just tool-measured."""
    import math

    from ..operators.similarity import (
        brute_force_topk,
        clustered_corpus,
        ivf_topk_trained,
    )

    ids = load_table(spark, sf_dir, "embeddings").select("vec_id")
    emb = clustered_corpus(
        ids, dim=_CLUSTERED_DIM, centers=_CLUSTERED_CENTERS
    )
    n = table_count(spark, sf_dir, "embeddings")
    probes = emb.filter(_panel_filter())
    exact = brute_force_topk(emb, probes, k=_IVF_K).select(
        "query_id", "neighbor_id"
    )
    approx = ivf_topk_trained(
        emb, probes, k=_IVF_K, iters=_IVF_ITERS, nprobe=_CLUSTERED_NPROBE,
        n=n,
    ).select("query_id", F.col("neighbor_id").alias("_hit_id"))
    joined = exact.join(
        approx,
        (exact.query_id == approx.query_id)
        & (exact.neighbor_id == approx._hit_id),
        "left",
    ).select(exact.query_id, exact.neighbor_id, "_hit_id")
    return joined.agg(
        F.lit(n).cast("long").alias("n_vectors"),
        F.lit(math.floor(math.sqrt(n))).cast("long").alias("n_cells"),
        F.lit(_CLUSTERED_NPROBE).cast("int").alias("nprobe"),
        F.countDistinct("query_id").alias("n_probes"),
        F.lit(_IVF_K).cast("int").alias("k"),
        F.count("_hit_id").alias("n_hits"),
        F.count(F.lit(1)).alias("n_expected"),
        (F.count("_hit_id") * F.lit(1.0) / F.count(F.lit(1))).alias(
            "recall_at_k"
        ),
    )


@query_fn(
    "sim_ann_lsh_fixed",
    oracle=f"""
WITH {_O_ELEMENTS},
hs AS (
  SELECT vid,
  {_HSUMS}
  FROM el GROUP BY vid
),
sigs AS (SELECT vid, CAST({_SIG_ANN} AS BIGINT) AS sig FROM hs),
bandrows AS (
{_BAND_KEYS}
),
cand AS (
  SELECT DISTINCT p.vid AS qid, c.vid AS cid
  FROM (SELECT * FROM bandrows WHERE {_O_PANEL_PRED}) p
  JOIN bandrows c ON c.band = p.band AND c.key = p.key AND c.vid != p.vid
),
{_O_IVF_VERIFY_TAIL.strip()}
""",
)
def sim_ann_lsh_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probe-panel hyperplane-LSH top-10 over the FIXED 50-id panel —
    the serving form of sim_ann_lsh (operators/similarity.
    lsh_ann_probe): panel band keys broadcast against the corpus
    signature table, exact verify of bucket-mates only, at most k
    rows per probe (LSH prunes, it does not backfill)."""
    from ..operators.similarity import lsh_ann_probe

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(_panel_filter())
    return lsh_ann_probe(
        emb, probes, k=_IVF_K, num_bits=_ANN_BITS, bands=_ANN_BANDS
    ).orderBy("query_id", "rank")


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

@query_fn(
    "text_token_stats",
    oracle=f"""
SELECT lang, source,
       COUNT(*) AS n_docs,
       CAST(SUM(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT)
         AS tokens_ws,
       CAST(SUM(len(regexp_extract_all(text, '{BPE_ISH_PATTERN}'))) AS BIGINT)
         AS tokens_bpe,
       SUM(n_chars) * 1.0 / COUNT(*) AS avg_chars
FROM documents
GROUP BY lang, source
ORDER BY lang, source
""",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace + BPE-ish regex) rolled up by corpus
    slice."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(F.split(F.trim("text"), r"\s+"))).alias("tokens_ws"),
            F.sum(token_count_bpe_ish(F.col("text"))).alias("tokens_bpe"),
            (F.sum("n_chars") * 1.0 / F.count(F.lit(1))).alias("avg_chars"),
        )
        .orderBy("lang", "source")
    )


_STOP_SQL = "(" + ", ".join(f"'{w}'" for w in EN_STOPWORDS) + ")"


@query_fn(
    "text_quality_score",
    oracle=f"""
WITH t AS (
  SELECT doc_id, text, string_split({_O_NORM}, ' ') AS toks FROM documents
)
SELECT doc_id,
       CAST(len(toks) AS INTEGER) AS n_tokens,
       len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) * 1.0
         / greatest(length(text), 1) AS punct_ratio,
       len(list_distinct(toks)) * 1.0 / greatest(len(toks), 1) AS uniq_ratio,
       len(list_filter(toks, x -> x IN {_STOP_SQL})) * 1.0
         / greatest(len(toks), 1) AS stopword_ratio,
       0.4 * (len(list_distinct(toks)) * 1.0 / greatest(len(toks), 1))
       + 0.4 * (1.0 - len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) * 1.0
                      / greatest(length(text), 1))
       + 0.2 * (len(list_filter(toks, x -> x IN {_STOP_SQL})) * 1.0
                / greatest(len(toks), 1)) AS quality
FROM t
ORDER BY doc_id
""",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features + composite score (all exact
    integer ratios -> engine-parity-safe doubles)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_ws(normalize_text(F.col("text")))
    n = F.greatest(F.size(toks), F.lit(1))
    stop_ratio = (
        F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS))) * 1.0 / n
    )
    uniq = F.size(F.array_distinct(toks)) * 1.0 / n
    punct = punct_ratio(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(toks).cast("int").alias("n_tokens"),
        punct.alias("punct_ratio"),
        uniq.alias("uniq_ratio"),
        stop_ratio.alias("stopword_ratio"),
        (0.4 * uniq + 0.4 * (1.0 - punct) + 0.2 * stop_ratio).alias("quality"),
    ).orderBy("doc_id")


_MARKER_VALUES = ", ".join(
    f"('{lang}', '{w}')" for lang, words in sorted(LANG_MARKERS.items()) for w in words
)


@query_fn(
    "text_lang_id",
    oracle=f"""
WITH markers(lang, word) AS (VALUES {_MARKER_VALUES}),
toks AS (
  SELECT doc_id, unnest(string_split({_O_NORM}, ' ')) AS tok FROM documents
),
hits AS (
  SELECT t.doc_id, m.lang, COUNT(*) AS hits
  FROM toks t JOIN markers m ON m.word = t.tok
  GROUP BY 1, 2
),
best AS (
  SELECT doc_id, lang, hits,
         row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, lang) AS rn
  FROM hits
)
SELECT d.doc_id,
       COALESCE(b.lang, 'und') AS lang_pred,
       COALESCE(b.hits, 0) AS marker_hits
FROM documents d
LEFT JOIN best b ON b.doc_id = d.doc_id AND b.rn = 1
ORDER BY d.doc_id
""",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language ID (n-gram heuristic): argmax of
    marker-word hits per language; 'und' when nothing matches.

    Fully MAP-SIDE: the marker sets are compile-time constants, so the
    per-language hit counts are `F.filter` traversals of the bound
    token array and the argmax is a CASE chain over those scalars — no
    explode, no join, no window, no shuffle. (The oracle states the
    same semantics relationally; the explode+join formulation is what
    a marker TABLE would need, but constants belong in the expression.)
    """
    from ..functions.text import lang_marker_hits, lang_pred_from_hits

    docs = load_table(spark, sf_dir, "documents")
    langs = sorted(LANG_MARKERS)
    toked = docs.select(
        "doc_id", tokens_ws(normalize_text(F.col("text"))).alias("toks")
    )
    hits = toked.select(
        "doc_id",
        *[
            lang_marker_hits(F.col("toks"), lang).alias(f"hits_{lang}")
            for lang in langs
        ],
    )
    pred, max_hits = lang_pred_from_hits(
        {lang: F.col(f"hits_{lang}") for lang in langs}
    )
    return hits.select(
        "doc_id",
        pred.alias("lang_pred"),
        max_hits.cast("long").alias("marker_hits"),
    ).orderBy("doc_id")


@query_fn(
    "text_fingerprint",
    oracle=f"""
WITH norm AS (
  SELECT doc_id, {_O_NORM} AS full_norm, substr({_O_NORM}, 1, 200) AS p
  FROM documents
),
grams AS (
  SELECT doc_id, min(md5(substr(p, CAST(i AS INTEGER), 8))) AS fp_rolling
  FROM (SELECT doc_id, p, unnest(range(1, len(p) - 8 + 2)) AS i
        FROM norm WHERE len(p) >= 8)
  GROUP BY doc_id
)
SELECT n.doc_id, md5(n.full_norm) AS fp_md5, g.fp_rolling
FROM norm n LEFT JOIN grams g ON g.doc_id = n.doc_id
ORDER BY n.doc_id
""",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-document md5 + winnowing-style min-gram fingerprint.

    The normalized text is projected into its own column FIRST so the
    n-gram lambda reads a bound attribute; inlining the normalizer
    into the lambda would re-run its regexes once per n-gram (a silent
    ~200× blow-up measured at 11s for 5k docs)."""
    docs = load_table(spark, sf_dir, "documents")
    normed = docs.select(
        "doc_id", normalize_text(F.col("text")).alias("norm")
    )
    return normed.select(
        "doc_id",
        F.md5(F.col("norm")).alias("fp_md5"),
        rolling_min_fingerprint(F.col("norm"), n=8, max_chars=200).alias(
            "fp_rolling"
        ),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# multimodal blob plumbing (mapInPandas feature extraction vs SQL oracle)
# ---------------------------------------------------------------------------

@query_fn(
    "multimodal_blob_features",
    oracle="""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS digest,
       CAST(ascii(substr(text, 1, 1)) AS INTEGER) AS first_byte,
       CAST(ascii(substr(text, 1, 1)) % 10 AS INTEGER) AS fake_label
FROM documents
ORDER BY doc_id
""",
)
def multimodal_blob_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload column -> Arrow-batched mapInPandas feature
    extraction (byte-level stub features; real decode is stubbed, see
    operators/multimodal.py)."""
    docs = load_table(spark, sf_dir, "documents")
    blobs = attach_blob(docs)
    return extract_features(blobs).orderBy("doc_id")


# ---------------------------------------------------------------------------
# end-to-end corpus curation (operators/curation.py): lang filter ->
# quality filter -> exact dedup -> MinHash near-dup removal
# ---------------------------------------------------------------------------

_CUR_LANG, _CUR_MIN_Q, _CUR_MIN_TOK = "en", 0.55, 16

# Shared oracle CTE chain mirroring every stage. Reuses the exact
# text_lang_id / text_quality_score / dedup_minhash_lsh oracle
# formulations so each stage's parity argument is already proven by its
# standalone query.
_CURATION_CTES = f"""
markers(lang, word) AS (VALUES {_MARKER_VALUES}),
t AS (
  SELECT doc_id, text, {_O_NORM} AS norm, string_split({_O_NORM}, ' ') AS toks
  FROM documents
),
toksl AS (SELECT doc_id, unnest(toks) AS tok FROM t),
mhits AS (
  SELECT tl.doc_id, m.lang, COUNT(*) AS h
  FROM toksl tl JOIN markers m ON m.word = tl.tok
  GROUP BY 1, 2
),
best AS (
  SELECT doc_id, lang FROM mhits
  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, lang) = 1
),
base AS (
  SELECT t.doc_id, t.norm, t.toks,
         COALESCE(b.lang, 'und') AS lang_pred,
         len(t.toks) AS n_tokens,
         0.4 * (len(list_distinct(t.toks)) * 1.0 / greatest(len(t.toks), 1))
         + 0.4 * (1.0 - len(regexp_extract_all(t.text, '[^A-Za-z0-9\\s]')) * 1.0
                        / greatest(length(t.text), 1))
         + 0.2 * (len(list_filter(t.toks, x -> x IN {_STOP_SQL})) * 1.0
                  / greatest(len(t.toks), 1)) AS quality
  FROM t LEFT JOIN best b ON b.doc_id = t.doc_id
),
s2 AS (
  SELECT * FROM base
  WHERE lang_pred = '{_CUR_LANG}'
    AND quality >= {_CUR_MIN_Q} AND n_tokens >= {_CUR_MIN_TOK}
),
s3 AS (
  SELECT * FROM s2
  QUALIFY row_number() OVER (PARTITION BY md5(norm) ORDER BY doc_id) = 1
),
cidx AS (
  SELECT doc_id, toks AS tk, unnest(range(1, len(toks) - 3 + 2)) AS i
  FROM s3 WHERE len(toks) >= 3
),
sh AS (SELECT DISTINCT doc_id, array_to_string(tk[i:i+2], ' ') AS s FROM cidx),
mh AS (
  SELECT doc_id,
  {_MH}
  FROM sh GROUP BY doc_id
),
bandrows AS (
{_BANDS}
),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bandrows x
  JOIN bandrows y ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS ca, b.doc_id AS cb, COUNT(*) AS c
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
dropped AS (
  SELECT DISTINCT cand.doc_b AS doc_id
  FROM cand
  JOIN common ON common.ca = cand.doc_a AND common.cb = cand.doc_b
  JOIN sizes sa ON sa.doc_id = cand.doc_a
  JOIN sizes sb ON sb.doc_id = cand.doc_b
  WHERE c / (sa.n + sb.n - c) >= {_JACCARD_T}
)
"""


@query_fn(
    "corpus_curation",
    oracle=f"""
WITH {_CURATION_CTES}
SELECT doc_id, lang_pred, CAST(n_tokens AS INTEGER) AS n_tokens, quality
FROM s3
WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
ORDER BY doc_id
""",
)
def corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curated corpus: language == '{_CUR_LANG}', quality >=
    {_CUR_MIN_Q}, >= {_CUR_MIN_TOK} tokens, exact-dedup'd, MinHash
    near-dups removed (keep-lowest-id rule)."""
    docs = load_table(spark, sf_dir, "documents")
    curated, _ = curate_corpus(
        docs,
        target_lang=_CUR_LANG,
        min_quality=_CUR_MIN_Q,
        min_tokens=_CUR_MIN_TOK,
        jaccard_threshold=_JACCARD_T,
    )
    return curated.orderBy("doc_id")


@query_fn(
    "corpus_curation_funnel",
    oracle=f"""
WITH {_CURATION_CTES}
SELECT * FROM (
  SELECT '0_input' AS stage, COUNT(*) AS n_docs FROM base
  UNION ALL
  SELECT '1_lang', COUNT(*) FROM base WHERE lang_pred = '{_CUR_LANG}'
  UNION ALL
  SELECT '2_quality', COUNT(*) FROM s2
  UNION ALL
  SELECT '3_exact_dedup', COUNT(*) FROM s3
  UNION ALL
  SELECT '4_near_dedup', COUNT(*) FROM s3
  WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
)
ORDER BY stage
""",
)
def corpus_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stage survivor counts for the curation pipeline (the
    monitoring view a production curation job publishes)."""
    docs = load_table(spark, sf_dir, "documents")
    _, funnel = curate_corpus(
        docs,
        target_lang=_CUR_LANG,
        min_quality=_CUR_MIN_Q,
        min_tokens=_CUR_MIN_TOK,
        jaccard_threshold=_JACCARD_T,
    )
    return funnel.orderBy("stage")


# ---------------------------------------------------------------------------
# deterministic hash split (train/val/test)
# ---------------------------------------------------------------------------

_TRAIN_END = int(0.70 * NUM_BUCKETS)
_VAL_END = int(0.85 * NUM_BUCKETS)

_O_HEXV = (
    "(CASE WHEN ascii(substr(hx,{i},1)) >= 97 "
    "THEN ascii(substr(hx,{i},1)) - 87 "
    "ELSE ascii(substr(hx,{i},1)) - 48 END)"
)


@query_fn(
    "ml_hash_split",
    oracle=f"""
WITH h AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS hx FROM documents),
b AS (
  SELECT doc_id,
         {_O_HEXV.format(i=1)} * 256
       + {_O_HEXV.format(i=2)} * 16
       + {_O_HEXV.format(i=3)} AS bucket
  FROM h
)
SELECT doc_id,
       CAST(bucket AS INTEGER) AS bucket,
       CASE WHEN bucket < {_TRAIN_END} THEN 'train'
            WHEN bucket < {_VAL_END} THEN 'val'
            ELSE 'test' END AS split
FROM b
ORDER BY doc_id
""",
)
def ml_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic, partitioning-invariant train/val/test assignment
    (operators/split.py): bucket = first 3 md5 hex digits of the id;
    the oracle reproduces the identical bucketing with portable SQL."""
    docs = load_table(spark, sf_dir, "documents")
    return hash_split(docs, "doc_id").select(
        "doc_id", "bucket", "split"
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# PII redaction (training-data hygiene)
# ---------------------------------------------------------------------------

# Deterministically inject synthetic PII into every third document so
# the patterns are exercised with nonzero counts (testdata text has no
# real PII) — identical concat in both engines.
_O_PII_INJECT = """
SELECT doc_id,
       CASE WHEN doc_id % 3 = 0
            THEN concat(text, ' contact user', CAST(doc_id AS VARCHAR),
                        '@example.com or 555-',
                        lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0'),
                        '-1234 now')
            ELSE text END AS text
FROM documents
"""


@query_fn(
    "text_pii_redact",
    oracle=f"""
WITH injected AS ({_O_PII_INJECT})
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS INTEGER) AS n_emails,
       CAST(len(regexp_extract_all(text, '{PHONE_RE}')) AS INTEGER) AS n_phones,
       regexp_replace(
         regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
         '{PHONE_RE}', '<PHONE>', 'g') AS redacted
FROM injected
ORDER BY doc_id
""",
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Email/phone redaction with per-document match counts — pure
    regexp expressions (whole-stage codegen, no UDF); patterns are
    Java-regex/RE2 portable (functions/text.py)."""
    docs = load_table(spark, sf_dir, "documents")
    injected = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com or 555-"),
                F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
                F.lit("-1234 now"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    n_emails, n_phones = pii_counts(F.col("text"))
    return injected.select(
        "doc_id",
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        redact_pii(F.col("text")).alias("redacted"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# dedup: semantic (cluster-then-dedup, SemDeDup-shaped) — round 3
# ---------------------------------------------------------------------------

_SEM_STRIDE, _SEM_T = 25, 0.4


@query_fn(
    "dedup_semantic",
    oracle=f"""
WITH {_O_ELEMENTS},
adots AS (
  SELECT v.vid AS vid, c.vid AS cvid,
         CAST(SUM(CAST(FLOOR(v.val * c.val * 1e6) AS BIGINT)) AS DOUBLE) / 1e6
           AS dot
  FROM el v JOIN el c ON v.pos = c.pos AND c.vid % {_SEM_STRIDE} = 0
  GROUP BY 1, 2
),
acos AS (
  SELECT adots.vid AS vid, cvid, dot / NULLIF(nv.norm * nc.norm, 0.0) AS cosine
  FROM adots
  JOIN nrm nv ON nv.vid = adots.vid
  JOIN nrm nc ON nc.vid = cvid
),
assign AS (
  SELECT vid, cvid FROM acos
  QUALIFY row_number() OVER (PARTITION BY vid ORDER BY cosine DESC, cvid) = 1
),
cellpairs AS (
  SELECT a.vid AS va, b.vid AS vb
  FROM assign a JOIN assign b ON a.cvid = b.cvid AND a.vid < b.vid
),
pdots AS (
  SELECT cp.va, cp.vb,
         CAST(SUM(CAST(FLOOR(x.val * y.val * 1e6) AS BIGINT)) AS DOUBLE) / 1e6
           AS dot
  FROM cellpairs cp
  JOIN el x ON x.vid = cp.va
  JOIN el y ON y.vid = cp.vb AND y.pos = x.pos
  GROUP BY 1, 2
)
SELECT va AS vec_a, vb AS vec_b,
       dot / NULLIF(na.norm * nb.norm, 0.0) AS cosine
FROM pdots
JOIN nrm na ON na.vid = va
JOIN nrm nb ON nb.vid = vb
WHERE dot / NULLIF(na.norm * nb.norm, 0.0) >= {_SEM_T}e0
ORDER BY vec_a, vec_b
""",
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-then-dedup semantic near-dup pairs (SemDeDup-shaped,
    Abbas et al. 2023): nearest-centroid cell assignment, exact cosine
    only within cells, pairs >= 0.4. Recall loss = pairs straddling a
    cell boundary — the locality trade that keeps the pipeline linear
    at 100 TB (see operators/similarity.semantic_dedup_pairs)."""
    from ..operators.similarity import semantic_dedup_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup_pairs(
        emb, centroid_stride=_SEM_STRIDE, threshold=_SEM_T
    ).orderBy("vec_a", "vec_b")


# ---------------------------------------------------------------------------
# Incremental dedup: the daily-crawl batch classified vs the corpus
# ---------------------------------------------------------------------------

def _o_split_shingles(cte: str, tag: str) -> str:
    """Shingle CTE chain for one side of the split (mirrors
    _O_SHINGLES over a named source CTE)."""
    return f"""
{tag}toks AS (
  SELECT doc_id, string_split({_O_NORM}, ' ') t FROM {cte}
),
{tag}idx AS (
  SELECT doc_id, t, unnest(range(1, len(t) - 3 + 2)) AS i
  FROM {tag}toks WHERE len(t) >= 3
),
{tag}sh AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s FROM {tag}idx
)"""


_O_INCREMENTAL = f"""
WITH newd AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
exd AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 != 0),
nh AS (SELECT doc_id, md5({_O_NORM}) AS h FROM newd),
eh AS (
  SELECT md5({_O_NORM}) AS h, MIN(doc_id) AS exact_match_id
  FROM exd GROUP BY 1
),{_o_split_shingles("newd", "n")},{_o_split_shingles("exd", "e")},
stop AS (SELECT s FROM esh GROUP BY s HAVING COUNT(*) > {_MAX_DF}),
nshc AS (SELECT * FROM nsh WHERE s NOT IN (SELECT s FROM stop)),
eshc AS (SELECT * FROM esh WHERE s NOT IN (SELECT s FROM stop)),
nsz AS (SELECT doc_id, COUNT(*) AS n FROM nshc GROUP BY 1),
esz AS (SELECT doc_id, COUNT(*) AS n FROM eshc GROUP BY 1),
common AS (
  SELECT a.doc_id, b.doc_id AS match_id, COUNT(*) AS c
  FROM nshc a JOIN eshc b ON a.s = b.s GROUP BY 1, 2
),
scored AS (
  SELECT common.doc_id, match_id, c / (nsz.n + esz.n - c) AS jaccard
  FROM common
  JOIN nsz ON nsz.doc_id = common.doc_id
  JOIN esz ON esz.doc_id = match_id
  WHERE c / (nsz.n + esz.n - c) >= {_JACCARD_T}
),
best AS (
  SELECT doc_id, match_id, jaccard,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY jaccard DESC, match_id) AS rn
  FROM scored QUALIFY rn = 1
)
SELECT nh.doc_id,
       CASE WHEN eh.exact_match_id IS NOT NULL THEN 'exact_dup'
            WHEN best.match_id IS NOT NULL THEN 'near_dup'
            ELSE 'novel' END AS verdict,
       COALESCE(eh.exact_match_id, best.match_id) AS match_id,
       CASE WHEN eh.exact_match_id IS NULL THEN best.jaccard END AS jaccard
FROM nh
LEFT JOIN eh USING (h)
LEFT JOIN best ON best.doc_id = nh.doc_id
ORDER BY nh.doc_id
"""


@query_fn("dedup_incremental", oracle=_O_INCREMENTAL)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The daily-crawl increment (doc_id % 10 == 0) classified against
    the standing corpus: exact_dup / near_dup (best Jaccard >= 0.5) /
    novel, without ever re-pairing the corpus against itself — see
    operators/dedup.incremental_dedup for the asymmetric-join scale
    contract."""
    from ..operators.dedup import incremental_dedup

    docs = load_table(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % 10 == 0)
    existing = docs.filter(F.col("doc_id") % 10 != 0)
    return incremental_dedup(
        new, existing, k=3, threshold=_JACCARD_T, max_df=_MAX_DF
    ).orderBy("doc_id")


_DEDUP_INDEX_PARENT: str | None = None


def _dedup_index_dir(sf_dir: str) -> str:
    """Per-process index location (same aliasing rationale as the
    warehouse layouts: a shared fixed path would let two concurrent
    processes race on overwrite-vs-scan)."""
    global _DEDUP_INDEX_PARENT
    import atexit
    import hashlib
    import os
    import shutil
    import tempfile

    if _DEDUP_INDEX_PARENT is None:
        _DEDUP_INDEX_PARENT = tempfile.mkdtemp(prefix="bidw_dedup_index_")
        atexit.register(
            shutil.rmtree, _DEDUP_INDEX_PARENT, ignore_errors=True
        )
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    return os.path.join(_DEDUP_INDEX_PARENT, tag)


@query_fn("dedup_incremental_indexed", oracle=_O_INCREMENTAL)
def dedup_incremental_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME batch classification through the build-once/probe-many
    index lifecycle (operators/dedup.build_dedup_index /
    probe_dedup_index): the corpus is scanned, normalized, shingled,
    df-capped, and sized ONCE into an on-disk index; each load probes
    it touching only the batch plus index reads — the daily-ingest
    serving shape, mirroring sim_ann_ivf_indexed for ANN.  Identical
    oracle to dedup_incremental: the lifecycle must not change a
    single verdict."""
    import os

    from ..operators.dedup import build_dedup_index, probe_dedup_index

    docs = load_table(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % 10 == 0)
    existing = docs.filter(F.col("doc_id") % 10 != 0)
    index_dir = _dedup_index_dir(sf_dir)
    if not os.path.isdir(os.path.join(index_dir, "meta")):
        build_dedup_index(existing, index_dir, k=3, max_df=_MAX_DF)
    return probe_dedup_index(
        new, spark, index_dir, k=3, threshold=_JACCARD_T, max_df=_MAX_DF
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# cross-corpus segment ("line") dedup — the C4 recipe
# ---------------------------------------------------------------------------

_LINE_SEG = 8


@query_fn(
    "text_line_dedup",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, string_split({_O_NORM}, ' ') AS t FROM documents
),
segs AS (
  SELECT doc_id, CAST(i AS INTEGER) AS seg_idx,
         array_to_string(
           list_slice(t, i * {_LINE_SEG} + 1, i * {_LINE_SEG} + {_LINE_SEG}),
           ' ') AS seg
  FROM (
    SELECT doc_id, t,
           unnest(range(0, GREATEST(
             CAST(CEIL(len(t) / {_LINE_SEG}.0e0) AS BIGINT), 1))) AS i
    FROM toks
  )
),
marked AS (
  SELECT doc_id, seg_idx, seg,
         ROW_NUMBER() OVER (PARTITION BY md5(seg)
                            ORDER BY doc_id, seg_idx) = 1 AS kept
  FROM segs
)
SELECT doc_id,
       CAST(COUNT(*) AS INTEGER) AS n_segments,
       CAST(SUM(CASE WHEN kept THEN 0 ELSE 1 END) AS INTEGER) AS n_removed,
       COALESCE(string_agg(CASE WHEN kept THEN seg END, ' '
                           ORDER BY seg_idx), '') AS clean_text
FROM marked
GROUP BY doc_id
ORDER BY doc_id
""",
)
def text_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style cross-corpus line dedup over fixed 8-token segments:
    keep each distinct segment's first occurrence corpus-wide and
    re-assemble every document from its survivors
    (operators/corpus_quality.line_dedup — map-side segmentation, one
    segment-hash window, one per-doc gather)."""
    from ..operators.corpus_quality import line_dedup

    docs = load_table(spark, sf_dir, "documents")
    return line_dedup(docs, seg_tokens=_LINE_SEG).orderBy("doc_id")


# ---------------------------------------------------------------------------
# dedup: MinHash-LSH recall/precision report (the banding honesty meter)
# ---------------------------------------------------------------------------

@query_fn(
    "dedup_lsh_recall_report",
    oracle=f"""
WITH {_O_DUP_PAIRS},
kept AS (SELECT s FROM sh GROUP BY s HAVING COUNT(*) <= {_MAX_DF}),
shc AS (SELECT sh.doc_id, sh.s FROM sh JOIN kept USING (s)),
csizes AS (SELECT doc_id, COUNT(*) AS n FROM shc GROUP BY doc_id),
ccommon AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
  FROM shc a JOIN shc b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
truth AS (
  SELECT doc_a, doc_b FROM ccommon
  JOIN csizes sa ON sa.doc_id = doc_a
  JOIN csizes sb ON sb.doc_id = doc_b
  WHERE c / (sa.n + sb.n - c) >= {_JACCARD_T}
),
hits AS (
  SELECT t.doc_a FROM truth t
  JOIN cand ON cand.doc_a = t.doc_a AND cand.doc_b = t.doc_b
)
SELECT CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_true,
       CAST((SELECT COUNT(*) FROM cand) AS BIGINT) AS n_candidates,
       CAST((SELECT COUNT(*) FROM hits) AS BIGINT) AS n_true_hit,
       CASE WHEN (SELECT COUNT(*) FROM truth) > 0
            THEN CAST((SELECT COUNT(*) FROM hits) AS DOUBLE)
                 / (SELECT COUNT(*) FROM truth)
            ELSE NULL END AS recall,
       CAST((SELECT COUNT(*) FROM dup_pairs) AS BIGINT) AS n_verified,
       CASE WHEN (SELECT COUNT(*) FROM cand) > 0
            THEN CAST((SELECT COUNT(*) FROM dup_pairs) AS DOUBLE)
                 / (SELECT COUNT(*) FROM cand)
            ELSE NULL END AS verify_precision
""",
)
def dedup_lsh_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEST-SCALE ACCURACY COMPANION to ``dedup_minhash_lsh`` (the
    production path the bench times): measured recall AND candidate
    precision of the 4-band × 2-row MinHash blocking — the honesty
    report for the near-dup family's recall knobs, as
    `sim_ann_recall_report` is for IVF and `sim_pq_recall_report` for
    PQ.  The exact-Jaccard truth side is the price of the measurement
    and runs at validation SFs only — a 100-TB user ships the
    production query and runs this on a sample.

    recall = banded candidates ∩ truth / truth, where truth is the
    df-capped exact-Jaccard ≥ 0.5 pair set (`dedup_ngram_jaccard`'s
    own pair set — the cap bounds the truth join's quadratic exactly
    as documented there, and excludes stop-shingle-only pairs from
    numerator and denominator alike). verify_precision = candidates
    surviving the exact uncapped per-pair verify / candidates — the
    fraction of bucket-join work that yields real near-dups (1 −
    collision waste). Theoretical recall for J ≥ 0.5 at b=4, r=2 is
    1−(1−J²)⁴ ≥ 68%; the measured number is what the knobs actually
    buy on THIS corpus.

    One pinned shingle table feeds the signature, truth, and verify
    passes (unlike exchanges — the shared-tokenize rule); ``cand`` is
    pinned because it feeds BOTH aggregate branches plus the verify
    probe; ``truth`` has a single consumer and stays unpinned (the
    ledger rule: persists pay only across separate actions or unlike
    exchanges).
    """
    from ..operators.caching import pin
    from ..operators.dedup import jaccard_for_pairs, minhash_lsh_candidates

    docs = load_table(spark, sf_dir, "documents")
    sh = pin(shingle_table(docs, 3))
    cand = pin(minhash_lsh_candidates(sh, 4, 2))
    truth = jaccard_pairs(sh, _JACCARD_T, max_df=_MAX_DF).select(
        "doc_a", "doc_b"
    )
    # two aggregate branches instead of four count actions: truth
    # carries its hit marker (cand ⊇ hits), candidates carry their
    # exact verify value (a candidate pair with NO shared shingle —
    # possible only via minhash collision — is a left-join miss and
    # correctly counts unverified)
    verified_vals = jaccard_for_pairs(cand, sh)
    cand_stats = (
        cand.join(verified_vals, ["doc_a", "doc_b"], "left")
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.sum(
                F.when(F.col("jaccard") >= _JACCARD_T, 1).otherwise(0)
            ).alias("n_verified"),
        )
    )
    truth_stats = (
        truth.join(
            cand.withColumn("_c", F.lit(1)), ["doc_a", "doc_b"], "left"
        )
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("n_true"),
            F.count("_c").alias("n_true_hit"),
        )
    )
    return (
        # both sides are single-row global aggregates; hint the
        # broadcast explicitly for consistency with every sibling
        # scalar-crossJoin site (plan gate: no unbroadcast cartesian)
        truth_stats.crossJoin(F.broadcast(cand_stats))
        .select(
            "n_true",
            "n_candidates",
            "n_true_hit",
            # zero-denominator guard mirrored in the oracle: a slice
            # with no truth pairs reports NULL recall in BOTH engines
            F.when(
                F.col("n_true") > 0,
                F.col("n_true_hit").cast("double") / F.col("n_true"),
            ).alias("recall"),
            "n_verified",
            F.when(
                F.col("n_candidates") > 0,
                F.col("n_verified").cast("double") / F.col("n_candidates"),
            ).alias("verify_precision"),
        )
    )


# ---------------------------------------------------------------------------
# end-to-end composite: curation -> greedy sequence packing
# ---------------------------------------------------------------------------

_PIPE_BUDGET = 200


@query_fn(
    "pipeline_curate_pack",
    oracle=f"""
WITH RECURSIVE {_CURATION_CTES},
surv AS (
  SELECT d.source, s3.doc_id, CAST(s3.n_tokens AS INTEGER) AS n_tokens
  FROM s3 JOIN documents d USING (doc_id)
  WHERE s3.doc_id NOT IN (SELECT doc_id FROM dropped)
),
t2 AS (
  SELECT *, row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM surv
),
pack AS (
  SELECT source, doc_id, n_tokens, rn, 0 AS seq_id, n_tokens AS fill
  FROM t2 WHERE rn = 1
  UNION ALL
  SELECT t2.source, t2.doc_id, t2.n_tokens, t2.rn,
         CASE WHEN p.fill + t2.n_tokens > {_PIPE_BUDGET}
              THEN p.seq_id + 1 ELSE p.seq_id END,
         CASE WHEN p.fill + t2.n_tokens > {_PIPE_BUDGET}
              THEN t2.n_tokens ELSE p.fill + t2.n_tokens END
  FROM t2 JOIN pack p ON t2.source = p.source AND t2.rn = p.rn + 1
)
SELECT source, CAST(seq_id AS INTEGER) AS seq_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens
FROM pack
GROUP BY 1, 2
ORDER BY source, seq_id
""",
)
def pipeline_curate_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END pretraining-data composite: the raw corpus flows
    through the full curation funnel (language -> quality -> exact
    dedup -> MinHash near-dedup, `operators/curation.curate_corpus`)
    and the SURVIVORS are greedily packed per source into <=200-token
    training sequences (`operators/packing.pack_sequences`), reported
    per sequence — one registry entry proving the stages compose into
    the pipeline a user would actually run, with the whole chain
    hash-checked against one DuckDB replay (curation CTEs + the
    recursive packing CTE, both reused from the per-stage oracles).

    Plan shape is the sum of its audited parts: the curation stages
    share one tokenize pass, near-dedup is banded + df-capped, and
    only (source, doc_id, n_tokens) — never text — crosses the Arrow
    boundary into the per-source packing recurrence.
    """
    from ..operators.packing import pack_sequences

    docs = load_table(spark, sf_dir, "documents")
    # thresholds passed explicitly: the oracle bakes in these module
    # constants, so relying on curate_corpus's defaults would couple
    # parity to a default drifting silently (same rule as
    # corpus_curation above)
    curated, _funnel = curate_corpus(
        docs,
        target_lang=_CUR_LANG,
        min_quality=_CUR_MIN_Q,
        min_tokens=_CUR_MIN_TOK,
        jaccard_threshold=_JACCARD_T,
    )
    with_tokens = curated.join(
        docs.select("doc_id", "source"), "doc_id"
    ).select("source", "doc_id", F.col("n_tokens").cast("int").alias("n_tokens"))
    packed = pack_sequences(
        with_tokens, budget=_PIPE_BUDGET, group_col="source",
        id_col="doc_id", tokens_col="n_tokens", shards=1,
    )
    return (
        packed.groupBy("source", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("seq_tokens"),
        )
        .select("source", F.col("seq_id").cast("int").alias("seq_id"),
                "n_docs", "seq_tokens")
        .orderBy("source", "seq_id")
    )
