"""Similarity search over the `embeddings` table (array<float> column).

Two paths:

- brute-force cosine top-k: the correctness baseline. Queries are
  broadcast; each executor scans its candidate partition once and
  keeps a per-query top-k (window row_number) — O(Q·N) but embarrass-
  ingly parallel and broadcast-joined, no shuffle of the big side.
- IVF (inverted-file) top-k: the 100 TB scale path. Vectors are
  routed through a two-level codebook (coarse ~N^0.25 cells, fine
  ~sqrt(N) cells nested under them) once, queries multi-probe their
  top-2 fine cells — assignment is O(N^1.25) and the candidate set
  per query shrinks to ~2N/nf. Centroids here are deterministic
  content-hash-picked representatives (duplicate contents collapse to
  one centroid, so duplicate-heavy corpora keep full cell
  resolution); `similarity_kmeans_ivf` is the learned-centroid
  production variant.

Determinism: embeddings are quantized to 1e-4 (integer-valued doubles)
so dot products / squared distances are exact integer sums in double —
identical in Spark's fold and DuckDB's list functions regardless of
summation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table

_SCALED = (
    "transform(embedding, e -> round(CAST(e AS DOUBLE) * 10000, 0))"
)
_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, x) -> acc + x)"


def _scaled_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.expr(_SCALED).alias("v"),
        F.expr(_DOT.format(a=_SCALED, b=_SCALED)).alias("nrm"),
    )


_BRUTE_ORACLE = """
WITH sc AS (
  SELECT vec_id,
         LIST_TRANSFORM(embedding, e -> ROUND(CAST(e AS DOUBLE) * 10000, 0)) AS v
  FROM embeddings
),
norms AS (SELECT vec_id, v, LIST_DOT_PRODUCT(v, v) AS nrm FROM sc),
q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM norms WHERE vec_id % 100 = 0),
pairs AS (
  SELECT q.q_id, n.vec_id,
         LIST_DOT_PRODUCT(q.qv, n.v) / SQRT(q.qn * n.nrm) AS cosine
  FROM q, norms n WHERE n.vec_id <> q.q_id
)
SELECT q_id, vec_id, ROUND(cosine, 6) AS cosine FROM (
  SELECT q_id, vec_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rn
  FROM pairs
) WHERE rn <= 5"""


@register("similarity_bruteforce_topk", oracle=_BRUTE_ORACLE)
def similarity_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 per query vector (queries: vec_id%100=0).

    Plan shape: broadcast(queries) ⨯ candidates → per-partition
    row_number top-k; the big side is scanned once and never shuffled
    until the tiny (q_id, top-k) result.
    """
    vecs = _scaled_vectors(spark, sf_dir)
    q = vecs.select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    ).filter(F.col("q_id") % 100 == 0)
    pairs = vecs.join(F.broadcast(q), F.col("vec_id") != F.col("q_id"))
    cosine = F.expr(_DOT.format(a="qv", b="v")) / F.sqrt(
        F.col("qn") * F.col("nrm")
    )
    scored = pairs.select("q_id", "vec_id", cosine.alias("cosine"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), "vec_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("q_id", "vec_id", F.round("cosine", 6).alias("cosine"))
    )


_WSUM = (
    "aggregate(zip_with({a}, sequence(1, size({a})), (x, i) ->"
    " x * CAST(i AS DOUBLE)), CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
)

_IVF_ORACLE = """
WITH sc AS (
  SELECT vec_id,
         LIST_TRANSFORM(embedding, e -> ROUND(CAST(e AS DOUBLE) * 10000, 0)) AS v
  FROM embeddings
),
norms AS (SELECT vec_id, v, LIST_DOT_PRODUCT(v, v) AS nrm FROM sc),
hked AS (
  SELECT vec_id, v, nrm,
         ((CAST(nrm AS BIGINT) * 31
           + CAST(LIST_DOT_PRODUCT(v, LIST_TRANSFORM(
               GENERATE_SERIES(1, LEN(v)), i -> CAST(i AS DOUBLE))) AS BIGINT))
          % 2147483648 + 2147483648) % 2147483648
         * 2654435761 % 4294967296 AS hk
  FROM norms
),
par AS (
  SELECT MIN(hk) AS min_hk,
         GREATEST(1, COUNT(DISTINCT hk) // GREATEST(2,
           CAST(POWER(2, (LENGTH(BIN(COUNT(*))) - 1) // 4) AS BIGINT))) AS cdstride,
         GREATEST(1, COUNT(DISTINCT hk) // GREATEST(4,
           CAST(POWER(2, (LENGTH(BIN(COUNT(*))) - 1) // 2) AS BIGINT))) AS fdstride
  FROM hked
),
ccand AS (
  SELECT MIN(vec_id) AS ccent_id, ARG_MIN(v, vec_id) AS ccv,
         ARG_MIN(nrm, vec_id) AS cnrm
  FROM hked, par WHERE hk % cdstride = 0 OR hk = min_hk
  GROUP BY hk
),
fcand AS (
  SELECT MIN(vec_id) AS fcent_id, ARG_MIN(v, vec_id) AS fcv,
         ARG_MIN(nrm, vec_id) AS fnrm
  FROM hked, par WHERE hk % fdstride = 0 OR hk = min_hk
  GROUP BY hk
),
f2c AS (
  SELECT fcent_id, fcv, fnrm, ccent_id FROM (
    SELECT f.fcent_id, f.fcv, f.fnrm, c.ccent_id,
           ROW_NUMBER() OVER (PARTITION BY f.fcent_id
             ORDER BY f.fnrm - 2 * LIST_DOT_PRODUCT(f.fcv, c.ccv) + c.cnrm,
                      c.ccent_id) AS rn
    FROM fcand f, ccand c
  ) WHERE rn = 1
),
a1 AS (
  SELECT vec_id, v, nrm, ccent_id FROM (
    SELECT n.vec_id, n.v, n.nrm, c.ccent_id,
           ROW_NUMBER() OVER (PARTITION BY n.vec_id
             ORDER BY n.nrm - 2 * LIST_DOT_PRODUCT(n.v, c.ccv) + c.cnrm,
                      c.ccent_id) AS rn
    FROM norms n, ccand c
  ) WHERE rn = 1
),
vf AS (
  SELECT vec_id, v, nrm, ccent_id, cell_id FROM (
    SELECT a.vec_id, a.v, a.nrm, a.ccent_id,
           COALESCE(f.fcent_id, -a.ccent_id - 1) AS cell_id,
           ROW_NUMBER() OVER (PARTITION BY a.vec_id
             ORDER BY COALESCE(a.nrm - 2 * LIST_DOT_PRODUCT(a.v, f.fcv) + f.fnrm, 0),
                      COALESCE(f.fcent_id, -a.ccent_id - 1)) AS rn
    FROM a1 a LEFT JOIN f2c f ON f.ccent_id = a.ccent_id
  ) WHERE rn = 1
),
q AS (
  SELECT vec_id AS q_id, v AS qv, nrm AS qn, ccent_id AS q_ccent
  FROM vf WHERE vec_id % 100 = 0
),
qp AS (
  SELECT q_id, qv, qn, probe_cell FROM (
    SELECT q.q_id, q.qv, q.qn,
           COALESCE(f.fcent_id, -q.q_ccent - 1) AS probe_cell,
           ROW_NUMBER() OVER (PARTITION BY q.q_id
             ORDER BY COALESCE(q.qn - 2 * LIST_DOT_PRODUCT(q.qv, f.fcv) + f.fnrm, 0),
                      COALESCE(f.fcent_id, -q.q_ccent - 1)) AS rn
    FROM q LEFT JOIN f2c f ON f.ccent_id = q.q_ccent
  ) WHERE rn <= 2
),
pairs AS (
  SELECT qp.q_id, a.vec_id,
         LIST_DOT_PRODUCT(qp.qv, a.v) / SQRT(qp.qn * a.nrm) AS cosine
  FROM qp JOIN vf a ON a.cell_id = qp.probe_cell AND a.vec_id <> qp.q_id
)
SELECT q_id, vec_id, ROUND(cosine, 6) AS cosine FROM (
  SELECT q_id, vec_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rn
  FROM pairs
) WHERE rn <= 3"""


def ivf_topk(
    spark: SparkSession,
    sf_dir: str,
    nprobe: int = 2,
    k: int = 3,
    coarse_probe: int = 1,
) -> DataFrame:
    """Hierarchical (two-level) IVF ANN with CONTENT-KEYED codebooks
    and top-``nprobe`` multi-probe — the r4->r5 curve-flattening
    rework, parameterized in r6 so RECALL IS A DIAL: each query probes
    its ``nprobe`` nearest fine cells and the pooled candidates are
    re-ranked by EXACT cosine (the scores inside the pool are true
    cosines, never quantized approximations), so raising nprobe
    monotonically raises recall toward brute force at linearly rising
    probe cost — the measured recall/nprobe curve is recorded in
    ML_BASELINE.md. The registered key pins nprobe=2, k=3 (the oracle
    derives the identical codebooks and probes).

    Why content-keyed: real corpora are duplicate-heavy, and any
    codebook sampled BY ROW (id stride, uniform sample) collapses —
    64 copies of one embedding yield 64 centroids at a single point,
    so the effective cell count shrinks by the duplication factor and
    probe candidate lists explode quadratically (measured: the 64x
    replicated corpus drove the row-sampled variant to all-vectors-
    in-four-cells). Here every vector gets a deterministic integer
    content key (hk = knuth-hash of (nrm, position-weighted sum) —
    exact BIGINT arithmetic, identical in both engines), codebook
    candidates are chosen by hk residue, and each hk group is
    COLLAPSED to one representative (min vec_id), so codebook size
    tracks DISTINCT content, never raw row count.

    Why two-level: flat IVF with nlist ~ sqrt(N) pays O(N*sqrt(N)) in
    assignment; routing through a coarse codebook of nc ~ N^0.25
    cells then the nf ~ sqrt(N) fine centroids nested under the
    chosen coarse cell is O(N * (nc + nf/nc)) ~ O(N^1.25). Vectors in
    a coarse cell that owns no fine centroid fall back to a sentinel
    cell (-ccent_id-1), so assignment is total; the min-hk candidate
    is always selected, so both codebooks are provably non-empty for
    any id or content distribution. Queries (vec_id % 100 = 0)
    MULTI-PROBE their top-2 fine cells — the recall lever that
    compensates for the cheaper hierarchical routing (measured recall
    vs `similarity_bruteforce_topk` is recorded in ML_BASELINE.md).

    All parameters (strides, min-hk anchor) are integer arithmetic
    evaluated IN-PLAN from a 1-row aggregate, so the key is fully
    lazy and the DuckDB oracle derives the identical codebooks from
    the data alone — no floats, no seeds, no driver-side action.

    Scale: codebook joins broadcast at-most-sqrt(N)-sized frames and
    fold with map-side-combined min(struct) aggregation (shuffles
    carry N rows, never N*nlist); the probe join is an equi-join on
    cell_id with no forced broadcast, so AQE picks broadcast while
    the query side fits and shuffles on cell_id beyond that. Ties
    everywhere break on centroid id, keeping both engines'
    assignments bit-identical.

    ``coarse_probe`` (r7, the SECOND recall dial): probe the
    top-``nprobe`` fine cells under EACH of the query's top-c COARSE
    cells (budget c × nprobe, monotone in c — pytest-asserted). Keep
    the default 1 for deduplicated/near-dup corpora (the pinned
    regime: recall@3 ≈ 0.91 at nprobe=2, ~0.2× brute wall); raise it
    for LOOSE/high-noise embeddings, where one group's members
    scatter across coarse cells and fine multi-probe alone plateaus
    (~0.73 on the measured loose corpus; coarse_probe=2 × nprobe=8
    reaches 0.90 at 0.4× brute). Measured curves + the per-round
    pinned-default regression row live in ML_BASELINE.md; CLI:
    ``python -m etl_stocks_with_sentiment_analysis_spark ann
    --nprobe N --coarse-probe C``.
    """
    vecs = _scaled_vectors(spark, sf_dir)
    hk = F.expr(
        "pmod(pmod(CAST(nrm AS BIGINT) * 31 + CAST(" + _WSUM.format(a="v")
        + " AS BIGINT), 2147483648) * 2654435761, 4294967296)"
    )
    hked = vecs.withColumn("hk", hk)
    par = hked.agg(
        F.count("*").alias("n"),
        F.countDistinct("hk").alias("nd"),
        F.min("hk").alias("min_hk"),
    ).select(
        F.expr(
            "greatest(CAST(1 AS BIGINT), nd div greatest(CAST(2 AS BIGINT),"
            " CAST(pow(2, (length(bin(n)) - 1) div 4) AS BIGINT)))"
        ).alias("cdstride"),
        F.expr(
            "greatest(CAST(1 AS BIGINT), nd div greatest(CAST(4 AS BIGINT),"
            " CAST(pow(2, (length(bin(n)) - 1) div 2) AS BIGINT)))"
        ).alias("fdstride"),
        "min_hk",
    )
    withpar = hked.crossJoin(F.broadcast(par))

    def _codebook(stride_col: str, id_alias: str, v_alias: str, n_alias: str):
        return (
            withpar.filter(
                (F.col("hk") % F.col(stride_col) == 0)
                | (F.col("hk") == F.col("min_hk"))
            )
            .groupBy("hk")
            .agg(F.min(F.struct("vec_id", "v", "nrm")).alias("m"))
            .select(
                F.col("m.vec_id").alias(id_alias),
                F.col("m.v").alias(v_alias),
                F.col("m.nrm").alias(n_alias),
            )
        )

    ccand = _codebook("cdstride", "ccent_id", "ccv", "cnrm")
    fcand = _codebook("fdstride", "fcent_id", "fcv", "fnrm")
    # fine -> coarse ownership (codebook x codebook, both tiny)
    fc_dist = (
        F.col("fnrm") - 2 * F.expr(_DOT.format(a="fcv", b="ccv")) + F.col("cnrm")
    )
    f2c = (
        fcand.join(F.broadcast(ccand))
        .groupBy("fcent_id")
        .agg(
            F.min(
                F.struct(fc_dist.alias("d"), F.col("ccent_id").alias("ccent_id"))
            ).alias("m"),
            F.first("fcv").alias("fcv"),
            F.first("fnrm").alias("fnrm"),
        )
        .select("fcent_id", "fcv", "fnrm", F.col("m.ccent_id").alias("ccent_id"))
    )
    # vector -> coarse cell: O(N * nc), nc ~ N^0.25
    vc_dist = F.col("nrm") - 2 * F.expr(_DOT.format(a="v", b="ccv")) + F.col("cnrm")
    a1 = (
        vecs.join(F.broadcast(ccand))
        .groupBy("vec_id")
        .agg(
            F.min(
                F.struct(vc_dist.alias("d"), F.col("ccent_id").alias("ccent_id"))
            ).alias("m"),
            F.first("v").alias("v"),
            F.first("nrm").alias("nrm"),
        )
        .select("vec_id", "v", "nrm", F.col("m.ccent_id").alias("ccent_id"))
    )
    # vector -> fine cell within its coarse cell (ONE pass off a1: the
    # left join keeps fine-less coarse cells as a single null row, so
    # the coalesced sentinel wins only when there is nothing else)
    vf_dist = F.col("nrm") - 2 * F.expr(_DOT.format(a="v", b="fcv")) + F.col("fnrm")
    cell_struct = F.struct(
        F.coalesce(vf_dist, F.lit(0.0)).alias("d"),
        F.coalesce(F.col("fcent_id"), -F.col("ccent_id") - 1).alias("cell"),
    )
    vf = (
        a1.join(F.broadcast(f2c), "ccent_id", "left")
        .groupBy("vec_id")
        .agg(
            F.min(cell_struct).alias("m"),
            F.first("v").alias("v"),
            F.first("nrm").alias("nrm"),
            F.first("ccent_id").alias("ccent_id"),
        )
        .select(
            "vec_id", "v", "nrm", "ccent_id", F.col("m.cell").alias("cell_id")
        )
    )
    q = vf.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        F.col("ccent_id").alias("q_ccent"),
    )
    # COARSE multi-probe (r7, default 1 = the assigned coarse cell,
    # byte-identical to the r6 path): the hierarchical router's hard
    # recall ceiling is that fine multi-probe only explores cells
    # under ONE coarse cell — when per-member noise rivals the gap
    # between coarse-anchor distances (measured on the loose clustered
    # corpus, ML_BASELINE.md), a group's members scatter across coarse
    # cells fine probing can never reach. coarse_probe=c ranks the
    # query against ALL coarse anchors (nc ~ N^0.25, broadcast — the
    # same O(queries * nc) the assignment already paid) and probes the
    # top-nprobe fine cells under EACH of its top-c coarse cells
    # (budget c*nprobe). Per-coarse budgets, not a pooled top-nprobe,
    # so raising the dial strictly GROWS the candidate pool — with
    # exact re-rank, every query's rank-i score is monotone in c
    # (pytest-asserted). Same tie-break (distance, ccent_id) as
    # assignment, so c=1 reproduces q_ccent byte-identically.
    if coarse_probe > 1:
        qc_dist = (
            F.col("qn") - 2 * F.expr(_DOT.format(a="qv", b="ccv")) + F.col("cnrm")
        )
        wc = Window.partitionBy("q_id").orderBy("qcd", "ccent_id")
        qcc = (
            q.select("q_id", "qv", "qn")
            .join(F.broadcast(ccand))
            .select("q_id", "qv", "qn", qc_dist.alias("qcd"), "ccent_id")
            .withColumn("crn", F.row_number().over(wc))
            .filter(F.col("crn") <= coarse_probe)
            .select("q_id", "qv", "qn", "ccent_id")
        )
    else:
        qcc = q.select(
            "q_id", "qv", "qn", F.col("q_ccent").alias("ccent_id")
        )
    # top-nprobe fine cells per (query, probed coarse cell), sentinel
    # fallback when a coarse cell owns no fine centroid. The window is
    # per coarse cell so each probed coarse cell contributes its own
    # nprobe budget; at coarse_probe=1 that partitioning degenerates
    # to per-query — the registered key's exact plan.
    qf_dist = F.col("qn") - 2 * F.expr(_DOT.format(a="qv", b="fcv")) + F.col("fnrm")
    wq = Window.partitionBy("q_id", "ccent_id").orderBy("qd", "pc")
    qp = (
        qcc.join(F.broadcast(f2c), "ccent_id", "left")
        .select(
            "q_id",
            "qv",
            "qn",
            "ccent_id",
            F.coalesce(qf_dist, F.lit(0.0)).alias("qd"),
            F.coalesce(F.col("fcent_id"), -F.col("ccent_id") - 1).alias("pc"),
        )
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select("q_id", "qv", "qn", F.col("pc").alias("probe_cell"))
    )
    pairs = vf.join(
        qp,
        (F.col("cell_id") == F.col("probe_cell")) & (F.col("vec_id") != F.col("q_id")),
    )
    cosine = F.expr(_DOT.format(a="qv", b="v")) / F.sqrt(F.col("qn") * F.col("nrm"))
    scored = pairs.select("q_id", "vec_id", cosine.alias("cosine"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), "vec_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "vec_id", F.round("cosine", 6).alias("cosine"))
    )


@register("similarity_ivf_topk", oracle=_IVF_ORACLE)
def similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered pin of `ivf_topk` at nprobe=2, k=3 — the exact
    configuration the DuckDB oracle reproduces. See `ivf_topk` for the
    algorithm and the recall/nprobe dial."""
    return ivf_topk(spark, sf_dir, nprobe=2, k=3)


_KMEANS_IVF_ORACLE = """
SELECT vec_id AS q_id,
       CAST(1 AS BIGINT) AS n_ok,
       CAST(1 AS BIGINT) AS cosine_ok
FROM embeddings WHERE vec_id % 100 = 0"""


@register("similarity_kmeans_ivf", oracle=_KMEANS_IVF_ORACLE)
def similarity_kmeans_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with LEARNED centroids: MLlib KMeans (k=8, seed 42) replaces
    similarity_ivf_topk's deterministic content-hash codebook — the
    other production option (centroids fit the data distribution, so
    cluster sizes balance and recall rises at the same probe budget,
    at the cost of an iterative fit). The deterministic variant above
    carries the exact oracle for the probe plumbing.

    Self-verifying: learned cluster assignments aren't
    SQL-reproducible, so the key emits one row per query id (the
    deterministic vec_id % 100 = 0 set — also proving no query lands
    in a degenerate singleton cluster) with invariant booleans: 1-3
    neighbors returned, every cosine in [-1, 1]. The raw neighbor
    list is the internal `topk` frame below.

    Scale: fit runs on a sample/feature frame (here: full table —
    500-5k vectors); assignment is one model.transform scan; the probe
    join shuffles on the learned cluster id exactly like the static
    IVF path.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = _scaled_vectors(spark, sf_dir).withColumn(
        "features", array_to_vector(F.col("v").cast("array<double>"))
    )
    model = KMeans(k=8, seed=42, featuresCol="features", predictionCol="cent_id").fit(
        vecs
    )
    assign = model.transform(vecs).select("vec_id", "v", "nrm", "cent_id")
    q = assign.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        F.col("cent_id").alias("q_cent"),
    )
    pairs = assign.join(
        F.broadcast(q),
        (F.col("cent_id") == F.col("q_cent")) & (F.col("vec_id") != F.col("q_id")),
    )
    cosine = F.expr(_DOT.format(a="qv", b="v")) / F.sqrt(F.col("qn") * F.col("nrm"))
    scored = pairs.select("q_id", "vec_id", cosine.alias("cosine"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), "vec_id")
    topk = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("q_id", "vec_id", F.round("cosine", 6).alias("cosine"))
    )
    per_q = topk.groupBy("q_id").agg(
        F.count("*").alias("n_results"),
        F.min("cosine").alias("mn"),
        F.max("cosine").alias("mx"),
    )
    return per_q.select(
        "q_id",
        F.col("n_results").between(1, 3).cast("long").alias("n_ok"),
        ((F.col("mn") >= -1.0) & (F.col("mx") <= 1.0))
        .cast("long")
        .alias("cosine_ok"),
    )


_CENTROID_ORACLE = """
WITH e AS (
  SELECT label,
         UNNEST(GENERATE_SERIES(0, LEN(embedding) - 1)) AS dim,
         UNNEST(LIST_TRANSFORM(embedding,
                x -> CAST(ROUND(CAST(x AS DOUBLE) * 10000, 0) AS BIGINT))) AS bp
  FROM embeddings
)
SELECT label, CAST(dim AS INT) AS dim,
       CAST(SUM(bp) AS BIGINT) AS sum_bp,
       COUNT(*) AS n,
       CAST(SUM(bp) AS DOUBLE) / COUNT(*) / 10000.0 AS centroid
FROM e GROUP BY 1, 2"""


@register("embedding_centroid_by_label", oracle=_CENTROID_ORACLE)
def embedding_centroid_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding column, one row per
    (label, dimension) — the class-prototype computation behind
    nearest-centroid classification, cluster drift monitoring, and
    IVF coarse quantizer refresh.

    posexplode → (label, dim) agg: map-side combinable, shuffle
    cardinality = labels × dims (tiny, independent of row count).
    Sums are over 1e-4-quantized integers (exact, order-free); the
    final centroid is one double division from identical BIGINTs.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "label",
        F.posexplode(
            F.expr(
                "transform(embedding,"
                " x -> CAST(round(CAST(x AS DOUBLE) * 10000, 0) AS LONG))"
            )
        ).alias("dim", "bp"),
    )
    return e.groupBy("label", F.col("dim").cast("int").alias("dim")).agg(
        F.sum("bp").alias("sum_bp"),
        F.count("*").alias("n"),
        (F.sum("bp").cast("double") / F.count("*") / 10000.0).alias("centroid"),
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) ANN — the compressed-domain scale path
# ---------------------------------------------------------------------------

_PQ_M, _PQ_K, _PQ_DSUB = 8, 4, 8  # 64 dims = 8 subspaces x 8 dims, 4 codes each


def _sub_dot(a: str, b: str, m: int, dsub: int = _PQ_DSUB) -> str:
    """Exact dot product of subspace m of two integer-valued array
    columns (Spark SQL expression)."""
    s = m * dsub + 1
    return (
        f"aggregate(zip_with(slice({a}, {s}, {dsub}),"
        f" slice({b}, {s}, {dsub}),"
        " (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
    )


def _duck_sub_dot(a: str, b: str, m: int) -> str:
    s = m * _PQ_DSUB + 1
    e = s + _PQ_DSUB - 1
    return f"LIST_DOT_PRODUCT({a}[{s}:{e}], {b}[{s}:{e}])"


def _pq_score(dot, m: int, k: int, vec: str) -> str:
    """Per-(subspace, code) assignment score cc - 2*v·c — the argmin-
    equivalent of the true L2² distance (the common ||v_m||² term is
    dropped; see tests/test_new_op_properties.py for the property)."""
    c = f"cv{k}"
    return f"(({dot(c, c, m)}) - 2 * ({dot(vec, c, m)}))"


def _pq_oracle() -> str:
    code_cols = []
    for m in range(_PQ_M):
        scores = [_pq_score(_duck_sub_dot, m, k, "v") for k in range(_PQ_K)]
        conds = []
        for k in range(_PQ_K - 1):
            ands = " AND ".join(
                f"{scores[k]} <= {scores[j]}" for j in range(k + 1, _PQ_K)
            )
            conds.append(f"WHEN {ands} THEN {k}")
        code_cols.append(f"CASE {' '.join(conds)} ELSE {_PQ_K - 1} END AS code{m}")
    terms = []
    for m in range(_PQ_M):
        branches = " ".join(
            f"WHEN {k} THEN {_pq_score(_duck_sub_dot, m, k, 'q.qv')}"
            for k in range(_PQ_K)
        )
        terms.append(f"(CASE a.code{m} {branches} END)")
    adc = " + ".join(terms)
    codes = ",\n         ".join(code_cols)
    anchors = ",\n".join(
        f"a{k} AS (SELECT v AS cv{k} FROM sc WHERE vec_id = {k + 1})"
        for k in range(_PQ_K)
    )
    anchor_tables = ", ".join(f"a{k}" for k in range(_PQ_K))
    return f"""
WITH sc AS (
  SELECT vec_id,
         LIST_TRANSFORM(embedding, e -> ROUND(CAST(e AS DOUBLE) * 10000, 0)) AS v
  FROM embeddings
),
{anchors},
codes AS (
  SELECT vec_id, v,
         {codes}
  FROM sc, {anchor_tables}
),
q AS (
  SELECT vec_id AS q_id, v AS qv, LIST_DOT_PRODUCT(v, v) AS qn
  FROM sc WHERE vec_id % 100 = 0
),
pairs AS (
  SELECT q.q_id, a.vec_id, CAST(q.qn + {adc} AS BIGINT) AS adc_dist
  FROM q, codes a, {anchor_tables} WHERE a.vec_id <> q.q_id
)
SELECT q_id, vec_id, adc_dist FROM (
  SELECT q_id, vec_id, adc_dist,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adc_dist, vec_id) AS rn
  FROM pairs
) WHERE rn <= 5"""


@register("similarity_pq_topk", oracle=_pq_oracle())
def similarity_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (the Jégou-style compressed-domain
    path): 64-dim vectors → 8 sub-codes of 2 bits, queries score
    candidates by ASYMMETRIC distance — 8 code-table lookups + adds
    per pair instead of a 64-mult dot product.

    Sub-codebooks are anchored on DATA vectors (the subvectors of
    vec_id 1–4, the same fixed-anchor device as
    `similarity_ivf_topk`'s coarse centroids), so code assignment
    follows the real embedding distribution — random-span codebooks
    quantize to noise and measured recall collapses to ~0 (the pytest
    recall floor in tests/test_analytics.py guards this). Measured
    recall@5 on the synthetic corpus is ~0.08 vs ~0.01 random: real
    signal, deliberately far from production quality — near-uniform
    64-d vectors concentrate distances, which no 16-bit code can rank
    finely. Production raises K to 256 per subspace via k-means and
    re-ranks a PQ shortlist exactly; every other part of the pipeline
    (encode pass, LUT build, scoring join) is identical.

    Why this is the 100 TB shape: the encode pass reads the corpus
    once and emits 8 small ints per vector (8 bytes vs 256 — a 32×
    memory cut); the per-query lookup tables are built once per query
    against the CODEBOOK (constant size), never the corpus; and the
    scoring join broadcasts queries over code tuples with no shuffle
    of the big side, at ~8× less arithmetic per pair than brute force.

    Determinism: anchors and vectors are 1e-4-quantized integers, all
    scores exact integer sums in double ⇒ argmin and top-k order match
    the DuckDB oracle bit-for-bit.
    """
    return pq_topk(spark, sf_dir)


def pq_topk(
    spark: SparkSession,
    sf_dir: str,
    m: int = _PQ_M,
    kcode: int = _PQ_K,
    dim: int = 64,
    k: int = 5,
) -> DataFrame:
    """The parameterized PQ pipeline behind `similarity_pq_topk` (r13:
    factored out so the high-dim measurement, `tools/ann_highdim.py`,
    can run PQ at 256+ dims where subspace COUNT — the expression-
    width lever — actually grows). `m` subspaces of `dim // m` dims,
    `kcode` codes per subspace anchored on vec_id 1..kcode, queries
    vec_id % 100 == 0, exact-integer ADC scores, top-``k`` per query.
    Same plan shape at every size: encode pass is one projection of
    m small argmin folds, LUTs build against the broadcast codebook,
    the scoring join broadcasts queries — no shuffle of the big side.
    """
    dsub = dim // m
    vecs = _scaled_vectors(spark, sf_dir)
    cb = (
        vecs.filter(F.col("vec_id").isin(*range(1, kcode + 1)))
        .groupBy()
        .agg(
            *[
                F.max(F.when(F.col("vec_id") == j + 1, F.col("v"))).alias(f"cv{j}")
                for j in range(kcode)
            ]
        )
    )
    sd = lambda a, b, mm: _sub_dot(a, b, mm, dsub)
    code_exprs = []
    for mm in range(m):
        structs = ", ".join(
            f"named_struct('d', {_pq_score(sd, mm, j, 'v')}, 'k', {j})"
            for j in range(kcode)
        )
        code_exprs.append(
            F.expr(f"array_sort(array({structs}))[0].k").alias(f"code{mm}")
        )
    codes = vecs.join(F.broadcast(cb)).select("vec_id", "v", *code_exprs)

    lut_exprs = []
    for mm in range(m):
        entries = ", ".join(
            _pq_score(sd, mm, j, "qv") for j in range(kcode)
        )
        lut_exprs.append(F.expr(f"array({entries})").alias(f"lut{mm}"))
    q = (
        vecs.filter(F.col("vec_id") % 100 == 0)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qn"),
        )
        .join(F.broadcast(cb))
        .select("q_id", "qn", *lut_exprs)
    )

    pairs = codes.join(F.broadcast(q), F.col("vec_id") != F.col("q_id"))
    adc = F.col("qn")
    for mm in range(m):
        adc = adc + F.element_at(f"lut{mm}", F.col(f"code{mm}") + 1)
    scored = pairs.select("q_id", "vec_id", adc.cast("long").alias("adc_dist"))
    w = Window.partitionBy("q_id").orderBy("adc_dist", "vec_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "vec_id", "adc_dist")
    )


_QUANT_ORACLE = """
WITH sc AS (
  SELECT vec_id,
         LIST_TRANSFORM(embedding,
           e -> CAST(ROUND(CAST(e AS DOUBLE) * 10000, 0) AS BIGINT)) AS v
  FROM embeddings
),
s AS (
  SELECT vec_id, v,
         GREATEST(1, LIST_MAX(LIST_TRANSFORM(v, x -> ABS(x)))) AS scale_int
  FROM sc
),
q AS (
  SELECT vec_id, scale_int,
         LIST_TRANSFORM(v, x ->
           CAST(SIGN(x) AS BIGINT) * ((ABS(x) * 127) // scale_int)) AS code
  FROM s
)
SELECT vec_id, scale_int,
       CAST(LIST_SUM(code) AS BIGINT) AS code_sum,
       CAST(LIST_SUM(LIST_TRANSFORM(code, c -> ABS(c))) AS BIGINT) AS code_l1,
       CAST(LIST_MAX(LIST_TRANSFORM(code, c -> ABS(c))) AS BIGINT) AS code_max,
       LIST_MAX(LIST_TRANSFORM(code, c -> ABS(c))) <= 127 AS within_int8
FROM q"""


@register("embedding_quantize_int8", oracle=_QUANT_ORACLE)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column — the
    storage/serving compression a 100 TB vector corpus ships with
    (4x smaller than fp32, ~1% recall loss at this codebook-free
    scheme): per-vector scale = max |component|, code = sign·(|v|·127
    div scale). All arithmetic is exact integers over the engine's
    standard x10000 quantization, with integer division applied to
    NON-NEGATIVE operands only (sign re-applied after), because
    truncating vs flooring division differ between engines on
    negatives. Emits per-vector code statistics plus the in-plan
    `within_int8` range proof.

    Scale: pure per-row projection — zero shuffles, whole-stage
    codegen end-to-end; the natural `mapInPandas` alternative would
    pay an Arrow round-trip for arithmetic Catalyst does natively.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    scaled = emb.select(
        "vec_id",
        F.expr(
            "transform(embedding,"
            " e -> CAST(round(CAST(e AS DOUBLE) * 10000, 0) AS BIGINT))"
        ).alias("v"),
    )
    with_scale = scaled.select(
        "vec_id",
        "v",
        F.expr(
            "greatest(CAST(1 AS BIGINT), array_max(transform(v, x -> abs(x))))"
        ).alias("scale_int"),
    )
    coded = with_scale.select(
        "vec_id",
        "scale_int",
        F.expr(
            "transform(v, x -> CAST(sign(x) AS BIGINT)"
            " * ((abs(x) * 127) div scale_int))"
        ).alias("code"),
    ).select(
        "vec_id",
        "scale_int",
        F.expr("aggregate(code, CAST(0 AS BIGINT), (a, x) -> a + x)").alias(
            "code_sum"
        ),
        F.expr(
            "aggregate(transform(code, c -> abs(c)),"
            " CAST(0 AS BIGINT), (a, x) -> a + x)"
        ).alias("code_l1"),
        F.expr("array_max(transform(code, c -> abs(c)))").alias("code_max"),
    )
    return coded.withColumn("within_int8", F.col("code_max") <= 127)
