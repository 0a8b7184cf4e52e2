"""Similarity search over embedding columns (SURVEY.md §2 M2).

- ``cosine_expr``: pure-expression cosine (zip_with product, sequential
  aggregate fold → deterministic summation order, mirrorable in DuckDB with
  list_zip + list_sum).
- ``topk_bruteforce``: exact top-k per query via a query×candidate join and
  a row_number window. The baseline; O(Q×N) — fine when Q is small or N is
  pre-filtered.
- ``topk_lsh``: banded multi-table LSH scale path — 16 tables × 4 sign
  bits over seeded hyperplanes; a pair is a candidate on ANY table
  collision, queries multi-probe each band's 1-bit flips, and exact cosine
  re-ranks candidates only. Recall < 1 by design; the bucket join replaces
  the O(Q×N) product with per-bucket fan-out.
- ``embedding_near_dup_lsh``: the M1 near-dup *scale path* — the same
  banded signatures generate candidate pairs through a bucket self-join,
  and exact cosine verifies candidates only. The O(N²) cross join never
  materializes; the small-scale exact twin
  (plans.llmdata.dedup_embedding_cosine) is the oracle for its recall test.

Hyperplanes are seeded (numpy, seed 11) → deterministic across runs.
The banded signature is a vectorized Arrow pandas_udf (one numpy matmul per
batch) — 64 hyperplane dot products per vector is exactly the workload
where Arrow batching beats interpreted HOF lambdas by orders of magnitude.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

# Banded near-dup signature: 16 bands × 4 planes. Two vectors at cosine c
# agree on one plane w.p. 1 − arccos(c)/π; at the 0.4 near-dup threshold the
# expected candidate recall is 1 − (1 − p⁴)¹⁶ ≈ 0.94, rising fast with c.
N_DUP_BANDS = 16
DUP_ROWS_PER_BAND = 4
_dup_planes = np.random.RandomState(11).normal(
    size=(N_DUP_BANDS * DUP_ROWS_PER_BAND, 64)
)


def dot_expr(a: Column, b: Column) -> Column:
    """Sequential-fold dot product — keeps the summation order identical to
    the DuckDB list_sum oracle mirror, so oracle-checked cosine queries
    hash-match. Measured note: an unrolled 64-term getItem chain is ~3×
    SLOWER than this HOF on Spark 4 (codegen blow-up); where fold-order
    parity doesn't matter (rows-only paths), batch the math in numpy
    instead (see embedding_near_dup_lsh's per-bucket gram matrix)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def topk_bruteforce(
    queries: DataFrame,
    candidates: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    max_exact_rows: int | None = 200_000,
) -> DataFrame:
    """Exact cosine top-k per query vector. Deterministic tie-break on
    (score desc, neighbor id).

    This is the EXACT baseline / oracle twin — it scores every (query,
    candidate) pair and must never be the production ANN path (that's
    :func:`topk_lsh` / :func:`topk_ivf` / :func:`topk_ivfpq`). The scale
    fence is machine-enforced, not comment-enforced: more candidate rows
    than ``max_exact_rows`` raises (pass None to disable for a deliberate
    exact sweep)."""
    if max_exact_rows is not None:
        # limit-bounded guards on BOTH sides: a bare count() would execute
        # the caller's whole plan an extra time just to check the fence,
        # and fencing only the candidate side left an oversized QUERY frame
        # free to blow up the product (ADVICE r4)
        for side, frame in (("candidate", candidates), ("query", queries)):
            if frame.limit(max_exact_rows + 1).count() > max_exact_rows:
                raise ValueError(
                    f"topk_bruteforce is the exact O(Q×N) twin: more than"
                    f" max_exact_rows={max_exact_rows} {side} rows. Use"
                    f" topk_lsh / topk_ivf / topk_ivfpq for the scale path,"
                    f" or pass max_exact_rows=None for a deliberate exact"
                    f" sweep."
                )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    # candidates stream, the (small) query side broadcasts — the planner's
    # default put the corpus on the build side, which inverts at scale
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("score", F.round(cosine_expr(F.col("qv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
        .orderBy("query_id", "rank")
    )


def assign_centroids(
    vectors: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cent_id: str = "centroid_id",
) -> DataFrame:
    """Nearest-centroid assignment (one IVF build pass).

    Collects ONLY the k×dim centroid table to the driver (O(1) in the data
    — 16×64 doubles ≈ 1 KB) and scores each Arrow batch of vectors against
    it as a single numpy matmul inside a Pandas UDF; the vectors never
    shuffle, and the centroid matrix rides the UDF closure to every
    executor. The previous formulation — crossJoin(broadcast) + interpreted
    HOF cosine + row_number window — evaluated ~200 interpreted expression
    nodes per (vector, centroid) pair and cost ~1-2 s per Lloyd round at
    sf0.1; the matmul is milliseconds for the same math. Deterministic
    tie-break on centroid id (centroids sorted by id; argmax takes the
    first maximum)."""
    rows = sorted(
        ((r[cent_id], np.asarray(r[vec_col], dtype=np.float64)) for r in centroids.collect()),
        key=lambda t: t[0],
    )
    cids = [cid for cid, _ in rows]
    mat = np.vstack([v for _, v in rows])
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    matn = mat / norms
    id_dt = centroids.schema[cent_id].dataType

    @pandas_udf(id_dt)
    def _nearest(emb: pd.Series) -> pd.Series:
        m = np.vstack(emb.to_numpy()).astype(np.float64)
        mn = np.linalg.norm(m, axis=1, keepdims=True)
        mn[mn == 0] = 1.0
        idx = np.argmax((m / mn) @ matn.T, axis=1)
        return pd.Series([cids[i] for i in idx])

    return vectors.withColumn(cent_id, _nearest(F.col(vec_col)))


def train_kmeans_centroids(
    vectors: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 16,
    n_iters: int = 5,
    sample_per_centroid: int | None = 256,
    mode: str = "auto",
    max_driver_rows: int = 1_000_000,
) -> DataFrame:
    """(centroid_id, cv: array<double>) k-means centroids via Lloyd
    iterations — the IVF training pass.

    Two formulations behind ``mode``:

    - ``"driver"``: one distributed top-N job picks a bounded deterministic
      SAMPLE (``k × sample_per_centroid`` vectors, the FAISS guidance of
      tens-to-hundreds of points per centroid) by smallest
      ``xxhash64(id)`` (TakeOrdered — per-partition top-N + merge, never a
      full sort); the Lloyd rounds then run in numpy on the driver. This is
      how production IVF trainers work at scale — the corpus is billions of
      vectors, the training sample fits in memory, and only the cell
      ASSIGNMENT pass is distributed. One bounded job regardless of
      n_iters. Guarded: collecting more than ``max_driver_rows`` raises
      (the driver is not a place to materialize a corpus).
    - ``"distributed"``: vectors never leave the cluster. Each Lloyd round
      is one ``mapInPandas`` job emitting per-partition partial sums — a
      (k × n_partitions)-row exchange of (cell, Σv, count) triples (~KBs) —
      reduced on the driver into new means. Use when the training set must
      exceed driver memory (``sample_per_centroid=None`` over a big corpus)
      or when the caller needs means over EVERY row.
    - ``"auto"`` (default): ``"distributed"`` when
      ``sample_per_centroid is None``, else ``"driver"``.

    Determinism: each mode is individually deterministic (seeding takes
    the k smallest-id vectors of the training set; assignment is cosine
    argmax with ties to the smallest centroid index = smallest seed id;
    means are computed over RAW vectors and rounded to 6 decimals per
    round; cells that lose all members keep their previous centroid, so
    exactly k centroids always survive). ACROSS modes the centroids agree
    through the 6-decimal rounding (pinned on the fixtures by pytest), but
    the float summation orders differ — driver mode pairwise-sums
    id-ordered rows, distributed mode reduces partition partial sums — so
    a mean component sitting within ~1 ulp of a x.xxxxx5 boundary could in
    principle round differently; treat cross-mode equality as
    fixture-verified, not an algebraic guarantee. Fixed ``n_iters``
    (k-means converges fast on clustered data; IVF needs a good partition,
    not the optimum)."""
    if mode not in ("auto", "driver", "distributed"):
        raise ValueError(f"mode must be auto|driver|distributed, got {mode!r}")
    if mode == "auto":
        mode = "distributed" if sample_per_centroid is None else "driver"
    id_type = vectors.schema[id_col].dataType
    cent_schema = StructType(
        [
            StructField("centroid_id", id_type),
            StructField("cv", ArrayType(DoubleType())),
        ]
    )
    base = vectors.select(
        F.col(id_col).alias("__id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__v"),
    )
    if sample_per_centroid is not None:
        base = base.orderBy(
            F.xxhash64(F.col("__id").cast("string")), F.col("__id")
        ).limit(k * sample_per_centroid)

    if mode == "distributed":
        cent_rows = _lloyd_distributed(base, k, n_iters)
        return vectors.sparkSession.createDataFrame(cent_rows, cent_schema)

    if sample_per_centroid is None:
        n = base.count()
        if n > max_driver_rows:
            raise ValueError(
                f"mode='driver' with sample_per_centroid=None would collect"
                f" {n} rows to the driver (cap {max_driver_rows});"
                f" use mode='distributed' or a bounded sample_per_centroid"
            )
    rows = sorted(base.collect(), key=lambda r: r["__id"])
    ids = [r["__id"] for r in rows]
    m = np.array([r["__v"] for r in rows], dtype=np.float64)
    mn = np.linalg.norm(m, axis=1, keepdims=True)
    mn[mn == 0] = 1.0
    mn_unit = m / mn
    # seed: k smallest-id vectors of the sample, in id order
    cent_rows = [
        (ids[i], [float(x) for x in m[i]]) for i in range(min(k, len(ids)))
    ]
    for _ in range(n_iters):
        matn = np.vstack([cv for _, cv in cent_rows])
        cn = np.linalg.norm(matn, axis=1, keepdims=True)
        cn[cn == 0] = 1.0
        idx = np.argmax(mn_unit @ (matn / cn).T, axis=1)
        new_rows = []
        for i, (cid, cv) in enumerate(cent_rows):
            members = m[idx == i]
            if len(members):
                new_rows.append(
                    (
                        cid,
                        [float(x) for x in np.round(members.mean(axis=0), 6)],
                    )
                )
            else:
                new_rows.append((cid, cv))
        cent_rows = new_rows
    return vectors.sparkSession.createDataFrame(cent_rows, cent_schema)


def _lloyd_distributed(base: DataFrame, k: int, n_iters: int) -> list[tuple]:
    """Lloyd rounds as n_iters sequential mapInPandas jobs over a pinned
    training frame; only (cell, partial Σv, count) triples — k rows per
    partition, ~KBs total — ever cross to the driver. ``base`` must have
    columns (__id, __v: array<double>)."""
    base = base.persist()
    try:
        # seed: k smallest-id vectors (TakeOrdered, never a full sort)
        seed_rows = base.orderBy("__id").limit(k).collect()
        if not seed_rows:
            return []
        ids = [r["__id"] for r in seed_rows]
        cent = np.array([r["__v"] for r in seed_rows], dtype=np.float64)
        kk = len(ids)

        for _ in range(n_iters):
            cn = np.linalg.norm(cent, axis=1, keepdims=True)
            cn[cn == 0] = 1.0
            cent_unit = cent / cn

            def _partials(batches, _cu=cent_unit, _k=kk):
                sums = None
                counts = np.zeros(_k, dtype=np.int64)
                for pdf in batches:
                    if not len(pdf):
                        continue
                    m = np.vstack(pdf["__v"].to_numpy()).astype(np.float64)
                    if sums is None:
                        sums = np.zeros((_k, m.shape[1]), dtype=np.float64)
                    mn = np.linalg.norm(m, axis=1, keepdims=True)
                    mn[mn == 0] = 1.0
                    idx = np.argmax((m / mn) @ _cu.T, axis=1)
                    np.add.at(sums, idx, m)  # means over RAW vectors
                    counts += np.bincount(idx, minlength=_k)
                if sums is not None:
                    yield pd.DataFrame(
                        {
                            "cell": np.arange(_k, dtype=np.int64),
                            "psum": list(sums),
                            "pcount": counts,
                        }
                    )

            partials = base.mapInPandas(
                _partials, "cell long, psum array<double>, pcount long"
            ).collect()
            tot = np.zeros_like(cent)
            cnt = np.zeros(kk, dtype=np.int64)
            # reduce in deterministic (cell, partition-arrival) independent
            # order: sort partials by cell so the float sum order is stable
            for r in sorted(partials, key=lambda r: r["cell"]):
                tot[r["cell"]] += np.asarray(r["psum"], dtype=np.float64)
                cnt[r["cell"]] += r["pcount"]
            new = cent.copy()
            nz = cnt > 0
            new[nz] = np.round(tot[nz] / cnt[nz, None], 6)
            cent = new
        return [(ids[i], [float(x) for x in cent[i]]) for i in range(kk)]
    finally:
        base.unpersist()


@dataclass
class Tombstones:
    """Removal state carried by an index between ``*_index_remove`` calls
    (the delete half of the ANN lifecycle, VERDICT r5 "Next round" #2):
    the distinct removed-id set (broadcast into the live view's anti-join
    only below ``INDEX_TOMBSTONE_BROADCAST_MAX_IDS`` — the fraction-based
    compaction trigger alone would let it grow to 20% of a billion-row
    index), the PHYSICAL index table that still contains the
    removed rows, and the counts the compaction trigger compares. The
    serve attribute (``encoded`` / ``assigned``) is always the LIVE
    anti-joined view, so every serve function works unchanged on a
    tombstoned index; compaction (rewrite to live rows only) happens only
    when ``n_removed > threshold · n_base`` — at 100 TB nobody rewrites
    the corpus table per delete."""

    ids: DataFrame      # distinct removed ids, single column 'neighbor_id'
    base: DataFrame     # physical table incl. tombstoned rows
    n_removed: int      # ids present in the index when tombstoned (absent
    n_base: int         # ids never count — they would skew fraction)

    @property
    def fraction(self) -> float:
        return self.n_removed / max(self.n_base, 1)


# Broadcast the tombstone id set into the live view's anti-join only while
# it stays below this ABSOLUTE row count. The compaction trigger is a
# FRACTION of the index (INDEX_COMPACT_THRESHOLD = 20%), so "below the
# threshold" is not "small": 20% of a 1B-vector index is 200M live
# tombstone ids, and a forced F.broadcast hint makes the driver build and
# ship that hash relation regardless of autoBroadcastJoinThreshold — OOM
# at exactly the scale the lifecycle exists for (VERDICT r6 What's-wrong
# #1). Above the cap the join runs unhinted: AQE/stats pick the strategy,
# and at that size a shuffled anti-join is the correct plan. 5M ids is
# O(100 MB) as a driver hash relation — comfortable, and far past any
# fixture (sf1 tombstones ≈ 1.2k ids).
INDEX_TOMBSTONE_BROADCAST_MAX_IDS = 5_000_000


def _tomb_hint(ids: DataFrame, n_removed: int) -> DataFrame:
    """The tombstone side of a live-view join, broadcast-hinted only below
    the absolute id cap. ``n_removed`` rides stale across adds, but an add
    never grows the tombstone set (re-adds of tombstoned ids are rejected),
    so a stale count can never force-broadcast a set that outgrew the cap."""
    if n_removed <= INDEX_TOMBSTONE_BROADCAST_MAX_IDS:
        return F.broadcast(ids)
    return ids


@dataclass
class IVFIndex:
    """A built IVF index: the (tiny) centroid table plus the cell-assigned
    corpus (neighbor_id, cv, centroid_id). Assignment runs once at build;
    serve probes cells and re-ranks inside them."""

    centroids: DataFrame
    assigned: DataFrame
    tombstones: Tombstones | None = None
    # the durable root this index was built/grown at (None = memory-only);
    # removal uses it to refuse tombstone-clearing in-memory compactions of
    # an index whose parquet still holds the removed rows
    path: str | None = None

    def unpersist(self) -> None:
        self.assigned.unpersist()
        if self.tombstones is not None:
            self.tombstones.ids.unpersist()
            self.tombstones.base.unpersist()


def build_ivf_index(
    candidates: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    centroids: DataFrame | None = None,
    persist: bool = True,
    path: str | None = None,
) -> IVFIndex:
    """The IVF index-build step: fix the centroid table and assign every
    candidate to its nearest cell (one Arrow matmul pass,
    :func:`assign_centroids`).

    ``centroids``: a (centroid_id, <vec_col>) table, e.g. from
    :func:`train_kmeans_centroids`. Default: the first ``n_centroids``
    candidate vectors (deterministic un-trained seeding) — seeded from the
    smallest-id candidates with the vector's own id as centroid id, no
    global window (a Window.orderBy() with no partition funnels the frame
    through one partition and warns; the id is already unique and
    deterministic).

    ``persist=True`` materializes the assignment eagerly; ``path`` writes
    both tables as parquet under ``path`` (assigned/ + centroids/) and
    re-reads — the durable index-table shape."""
    cents = (
        candidates.orderBy(id_col)
        .limit(n_centroids)
        .select(F.col(id_col).alias("centroid_id"), F.col(vec_col))
        if centroids is None
        else centroids.select("centroid_id", F.col(vec_col))
    )
    assigned = assign_centroids(
        candidates.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")),
        cents.select("centroid_id", F.col(vec_col).alias("cv")),
        vec_col="cv",
        id_col="neighbor_id",
    )
    if path is not None:
        spark = candidates.sparkSession
        assigned.write.mode("overwrite").parquet(f"{path}/assigned")
        cents.write.mode("overwrite").parquet(f"{path}/centroids")
        assigned = spark.read.parquet(f"{path}/assigned")
        cents = spark.read.parquet(f"{path}/centroids")
    elif persist:
        assigned = assigned.persist()
        assigned.count()
    return IVFIndex(centroids=cents, assigned=assigned, path=path)


def topk_ivf(
    queries: DataFrame,
    candidates: DataFrame | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    centroids: DataFrame | None = None,
    index: IVFIndex | None = None,
) -> DataFrame:
    """IVF-style ANN: partition candidates into centroid cells, probe the
    query's ``n_probe`` nearest cells, exact re-rank inside them.

    Scale shape: the cell assignment is one broadcast pass at BUILD time;
    search joins on the 8-byte cell id with per-cell fan-out ≈
    N/n_centroids × n_probe — the O(Q×N) product never materializes.

    Pass a pre-built ``index`` (:func:`build_ivf_index`) to serve against a
    materialized assignment; the (queries, candidates) form assigns inline
    as one self-contained plan."""
    if index is None:
        if candidates is None:
            raise ValueError("topk_ivf needs either candidates or index")
        index = build_ivf_index(
            candidates, vec_col, id_col, n_centroids=n_centroids,
            centroids=centroids, persist=False,
        )
    cents = index.centroids.select(
        "centroid_id", F.col(index.centroids.columns[1]).alias(vec_col)
    )
    cand_cells = index.assigned
    # each query probes its n_probe nearest cells
    qc = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    q_scored = qc.crossJoin(
        F.broadcast(cents.select("centroid_id", F.col(vec_col).alias("__cv")))
    ).withColumn("__cs", cosine_expr(F.col("qv"), F.col("__cv")))
    wq = Window.partitionBy("query_id").orderBy(F.desc("__cs"), F.col("centroid_id"))
    q_cells = (
        q_scored.withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= n_probe)
        .select("query_id", "qv", "centroid_id")
    )
    # candidate cells stream; the queries × n_probe relation broadcasts
    scored = (
        cand_cells.join(F.broadcast(q_cells), "centroid_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("score", F.round(cosine_expr(F.col("qv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
        .orderBy("query_id", "rank")
    )


def topk_lsh(
    queries: DataFrame,
    candidates: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    hamming_probe: int = 1,
) -> DataFrame:
    """Approximate top-k via banded multi-table LSH: both sides hash into 16
    tables of 4 sign bits (the same seeded signature as the near-dup path),
    a pair is a candidate if it collides in ANY table, and exact cosine
    re-ranks candidates only.

    One b-bit table has recall p(cos)^b — hopeless for weakly-similar
    neighbors (measured 0.08 on the fixture at 8 bits). Sixteen 4-bit
    tables give 1−(1−p⁴)¹⁶; ``hamming_probe=1`` additionally probes each
    query band's four 1-bit flips (a vector near a hyperplane falls on
    either side), lifting per-band hit probability to P(≥3 of 4 bits agree).
    Only the (small) query side pays the ×5 probe explode; the candidate
    side is the standard ×16 multi-table explode, and the join still
    shuffles on an 8-byte bucket key."""
    if hamming_probe not in (0, 1):
        # only the 1-bit flip set is implemented; a larger value would
        # silently behave as 1 and under-deliver the recall the caller
        # tuned for — refuse instead
        raise ValueError(
            f"hamming_probe={hamming_probe} not supported: only 0 (exact"
            f" band) or 1 (four 1-bit flips per band) are implemented"
        )
    buckets = pandas_udf(_dup_band_buckets, ArrayType(LongType()))
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        F.explode(buckets(F.col(vec_col))).alias("bucket"),
    )
    q0 = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.explode(buckets(F.col(vec_col))).alias("__b"),
    )
    probes = [F.col("__b")]
    if hamming_probe >= 1:
        # band value occupies the low DUP_ROWS_PER_BAND bits; the band index
        # lives above bit 32, so 1-bit flips stay inside the same table
        probes += [
            F.col("__b").bitwiseXOR(F.lit(1 << j))
            for j in range(DUP_ROWS_PER_BAND)
        ]
    q = q0.select("query_id", "qv", F.explode(F.array(*probes)).alias("bucket"))
    # candidate buckets stream; the exploded query probes broadcast
    cand = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.withColumn(
        "score", F.round(cosine_expr(F.col("qv"), F.col("cv")), 6)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
        .orderBy("query_id", "rank")
    )


def _dup_band_buckets(emb: pd.Series) -> pd.Series:
    """Banded sign-bit signature: one (batch × 64) matmul against the seeded
    hyperplanes, then 4 sign bits packed per band with the band index mixed
    into the key so buckets never collide across bands."""
    m = np.vstack(emb.to_numpy()).astype(np.float64)
    signs = (m @ _dup_planes.T) > 0
    out = np.empty((m.shape[0], N_DUP_BANDS), dtype=np.int64)
    for band in range(N_DUP_BANDS):
        chunk = signs[:, band * DUP_ROWS_PER_BAND : (band + 1) * DUP_ROWS_PER_BAND]
        val = np.zeros(m.shape[0], dtype=np.int64)
        for j in range(DUP_ROWS_PER_BAND):
            val = (val << 1) | chunk[:, j]
        out[:, band] = (np.int64(band) << 32) | val
    return pd.Series(list(out))


def embedding_near_dup_lsh(
    vectors: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.4,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine ≥ ``threshold`` — the M1
    scale path. Candidates come from banded-LSH buckets; each bucket's
    all-pairs cosines are computed as ONE BLAS gram matrix (``U @ U.T`` on
    the bucket's unit vectors) inside applyInPandas, and only pairs at or
    above the threshold ever materialize as rows. No O(N²) stage exists
    and — unlike a bucket self-JOIN — no O(Σ bucket²) *row* stage either:
    the shuffle moves each vector ×16 (one per band, 8-byte key + 256-byte
    payload), and the quadratic part stays inside a dense matmul whose
    output is immediately thresholded.

    Scale bound: the largest bucket must fit in one task's memory
    (m × dim floats + an m×m gram tile) — tune bits-per-band up to shrink
    occupancy at larger N. Exact twin for the recall pytest:
    plans.llmdata.dedup_embedding_cosine (the cross join stays a
    small-scale oracle only)."""
    buckets = pandas_udf(_dup_band_buckets, ArrayType(LongType()))
    # pair-id columns carry the CALLER's id type (string doc keys etc.) —
    # a hardcoded long schema broke/coerced non-long ids, the bug class
    # build_ivfpq_index's id typing already fixed
    id_spark_type = vectors.schema[id_col].dataType.simpleString()
    id_pd_type = "int64" if id_spark_type in ("bigint", "long", "int") else "object"
    sig = vectors.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.explode(buckets(F.col(vec_col))).alias("bucket"),
    )

    def bucket_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
                {"id_a": id_pd_type, "id_b": id_pd_type, "cosine": "float64"}
            )
        ids = pdf["id"].to_numpy()
        m = np.vstack(pdf["v"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0.0] = 1.0  # zero vectors match nothing (cos 0)
        u = m / norms[:, None]
        gram = np.round(u @ u.T, 6)
        ii, jj = np.nonzero(np.triu(gram >= threshold, k=1))
        id_a = np.minimum(ids[ii], ids[jj])
        id_b = np.maximum(ids[ii], ids[jj])
        return pd.DataFrame({"id_a": id_a, "id_b": id_b, "cosine": gram[ii, jj]})

    return (
        sig.groupBy("bucket")
        .applyInPandas(
            bucket_pairs,
            f"id_a {id_spark_type}, id_b {id_spark_type}, cosine double",
        )
        .dropDuplicates(["id_a", "id_b"])
        .orderBy("id_a", "id_b")
    )


def semdedup(
    vectors: DataFrame,
    centroids: DataFrame | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.4,
    k: int = 16,
    max_cluster_rows: int = 20_000,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster embeddings
    with k-means, then drop within-cluster semantic duplicates — pairs at
    cosine ≥ ``threshold`` — keeping per duplicate neighborhood the member
    FARTHEST from its centroid (the paper's diversity-preserving policy:
    outliers survive, prototypical near-copies go). Returns the full audit
    ledger ``(id, centroid_id, cent_sim, kept)``, one row per input vector.

    Drop rule (exactly the published implementation's upper-triangle scan):
    rank a cluster's members by keep priority ``(cent_sim ASC, id ASC)``;
    a member is dropped iff ANY earlier-ranked member sits at cosine ≥
    ``threshold`` — whether or not that earlier member itself survived.
    Pairwise-exists, not connected components, so the rule is a single
    deterministic predicate both engines can evaluate identically (the
    DuckDB mirror in plans/llmdata.py is an EXISTS join; all similarities
    round to 6 before every comparison on both sides).

    Scale shape (the whole point of the paper): the O(N²) work never exists
    globally — it is confined to per-cluster dense BLAS grams inside
    applyInPandas, and cluster size is controlled by ``k`` (the paper runs
    k ≈ 50 000 on LAION so E[cluster] stays tens of thousands; at 100 TB
    scale k with N). One shuffle on ``centroid_id``; the centroid matrix
    (k × dim, KBs) rides the UDF closure — nothing corpus-sized moves.
    ``max_cluster_rows`` fences the per-task gram tile: a cluster above it
    raises with the remediation (raise k) instead of silently OOMing a
    task. The default 20 000 is sized to the tile math, not a guess: the
    scan's peak is one float64 gram (8m²) rounded IN PLACE plus one bool
    mask (m²) ≈ 9m² bytes — 3.6 GB at m = 20k, inside a 4 GB task budget
    (128 GiB / 32 slots). ``centroids`` takes a ``(centroid_id, cv)`` frame (the
    :func:`train_kmeans_centroids` output) for deterministic/oracle use;
    None trains one with the default pipeline."""
    if centroids is None:
        centroids = train_kmeans_centroids(vectors, vec_col, id_col, k=k)
    rows = sorted(
        ((r["centroid_id"], np.asarray(r["cv"], dtype=np.float64)) for r in centroids.collect()),
        key=lambda t: t[0],
    )
    if not rows:
        raise ValueError("semdedup: empty centroid frame")
    cids = np.asarray([cid for cid, _ in rows])
    mat = np.vstack([v for _, v in rows])
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    matn = mat / norms

    id_spark_type = vectors.schema[id_col].dataType.simpleString()
    cid_spark_type = centroids.schema["centroid_id"].dataType.simpleString()
    id_pd_type = "int64" if id_spark_type in ("bigint", "long", "int") else "object"
    cid_pd_type = "int64" if cid_spark_type in ("bigint", "long", "int") else "object"

    assign_schema = StructType(
        [
            StructField("centroid_id", centroids.schema["centroid_id"].dataType),
            StructField("cent_sim", DoubleType()),
        ]
    )

    @pandas_udf(assign_schema)
    def _assign(emb: pd.Series) -> pd.DataFrame:
        m = np.vstack(emb.to_numpy()).astype(np.float64)
        mn = np.linalg.norm(m, axis=1, keepdims=True)
        mn[mn == 0] = 1.0
        # round BEFORE argmax: assignment ties must break the same way the
        # round-6 SQL mirror's (sim DESC, cid ASC) ordering does
        sims = np.round((m / mn) @ matn.T, 6)
        idx = np.argmax(sims, axis=1)  # first max = smallest cid (sorted)
        return pd.DataFrame(
            {"centroid_id": cids[idx], "cent_sim": sims[np.arange(len(idx)), idx]}
        )

    asg = vectors.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    ).withColumn("a", _assign(F.col("v")))
    asg = asg.select(
        "id", "v", F.col("a.centroid_id").alias("centroid_id"),
        F.col("a.cent_sim").alias("cent_sim"),
    )

    out_schema = (
        f"{id_col} {id_spark_type}, centroid_id {cid_spark_type}, "
        "cent_sim double, kept boolean"
    )

    def cluster_scan(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > max_cluster_rows:
            raise ValueError(
                f"semdedup cluster {pdf['centroid_id'].iloc[0]!r} has "
                f"{len(pdf)} rows > max_cluster_rows={max_cluster_rows}; "
                "its gram tile would not fit one task — raise k so clusters "
                "shrink, or raise max_cluster_rows with executor memory"
            )
        order = np.lexsort((pdf["id"].to_numpy(), pdf["cent_sim"].to_numpy()))
        p = pdf.iloc[order]
        m = np.vstack(p["v"].to_numpy()).astype(np.float64)
        mn = np.linalg.norm(m, axis=1)
        mn[mn == 0.0] = 1.0
        u = m / mn[:, None]
        # one float64 gram, rounded IN PLACE, one bool mask — never the
        # round-copy + tril-copy pair (each another 8m²/m² bytes): the
        # fence's memory math in the docstring assumes this shape
        gram = u @ u.T
        np.round(gram, 6, out=gram)
        mask = gram >= threshold
        n = mask.shape[0]
        dropped = np.zeros(n, dtype=bool)
        for i in range(1, n):  # row-wise strict lower triangle, no copy
            dropped[i] = mask[i, :i].any()
        return pd.DataFrame(
            {
                id_col: p["id"].to_numpy(),
                "centroid_id": p["centroid_id"].to_numpy(),
                "cent_sim": p["cent_sim"].to_numpy(),
                "kept": ~dropped,
            }
        ).astype({id_col: id_pd_type, "centroid_id": cid_pd_type})

    return (
        asg.groupBy("centroid_id")
        .applyInPandas(cluster_scan, out_schema)
        .orderBy(id_col)
    )


# ── Product quantization (PQ) — compressed-domain ANN ───────────────────────

def train_pq_codebooks(
    vectors: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    k: int = 256,
    n_iters: int = 5,
    sample_per_centroid: int = 64,
) -> list[list[list[float]]]:
    """PQ codebooks (Jégou/Douze/Schmid, "Product Quantization for Nearest
    Neighbor Search", TPAMI 2011): split the (L2-normalized) vector into
    ``m`` contiguous subspaces and train ``k`` k-means centroids per
    subspace (k=256 — the standard 8-bit PQ code). Returns
    ``codebooks[s][j] = centroid j of subspace s`` as plain floats —
    m×k×(dim/m) doubles (8×256×8 = 16 KB at dim 64), small enough to ride
    every UDF closure and Column literal.

    Training follows the sampled-Lloyd shape of
    :func:`train_kmeans_centroids`: ONE distributed TakeOrdered job picks
    ``k × sample_per_centroid`` vectors by smallest ``xxhash64(id)``, the
    per-subspace Lloyd rounds run in numpy on the driver. Determinism: the
    sample is (hash, id)-ordered; each subspace seeds from the k
    smallest-id sample vectors; means round to 6 decimals per round;
    argmin ties take the smallest code; empty cells keep their previous
    centroid."""
    base = vectors.select(
        F.col(id_col).alias("__id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__v"),
    ).orderBy(F.xxhash64(F.col("__id").cast("string")), F.col("__id")).limit(
        k * sample_per_centroid
    )
    rows = sorted(base.collect(), key=lambda r: r["__id"])
    mat = np.array([r["__v"] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mat = mat / norms  # PQ approximates the dot product of UNIT vectors
    dim = mat.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    books: list[list[list[float]]] = []
    for s in range(m):
        cents = _lloyd_numpy(mat[:, s * sub : (s + 1) * sub], k, n_iters)
        books.append([[float(x) for x in c] for c in cents])
    return books


def pq_encode(
    vectors: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Append ``pq_codes: array<int>`` (length m) — each vector's nearest
    codebook entry per subspace, computed on the L2-normalized vector as
    one numpy pass per Arrow batch. 8 codes replace 64 floats: a 32×
    payload compression, which at 100 TB is the difference between a scan
    that fits in the page cache and one that doesn't."""
    books = [np.asarray(b, dtype=np.float64) for b in codebooks]
    m = len(books)
    sub = books[0].shape[1]

    @pandas_udf(ArrayType(LongType()))
    def _codes(emb: pd.Series) -> pd.Series:
        vv = np.vstack(emb.to_numpy()).astype(np.float64)
        nn = np.linalg.norm(vv, axis=1, keepdims=True)
        nn[nn == 0] = 1.0
        vv = vv / nn
        out = np.empty((len(vv), m), dtype=np.int64)
        for s in range(m):
            block = vv[:, s * sub : (s + 1) * sub]
            out[:, s] = np.argmin(_sq_dists(block, books[s]), axis=1)
        return pd.Series(list(out))

    return vectors.withColumn("pq_codes", _codes(F.col(vec_col)))


@dataclass
class PQIndex:
    """A built PQ index: driver-held codebooks (m×k×sub doubles, ~16 KB)
    plus the ENCODED corpus table (neighbor_id, cv, pq_codes). Build once,
    serve many — at 100 TB nobody re-encodes the corpus per query (the r4
    sf1 bench showed exactly that accounting error: 7.6× scale ratio that
    was all index build, VERDICT r4 "Next round" #1)."""

    codebooks: list[list[list[float]]]
    encoded: DataFrame
    tombstones: Tombstones | None = None
    path: str | None = None

    def unpersist(self) -> None:
        self.encoded.unpersist()
        if self.tombstones is not None:
            self.tombstones.ids.unpersist()
            self.tombstones.base.unpersist()


def build_pq_index(
    candidates: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    k: int = 256,
    n_iters: int = 5,
    sample_per_centroid: int = 64,
    codebooks: list[list[list[float]]] | None = None,
    persist: bool = True,
    path: str | None = None,
) -> PQIndex:
    """The PQ index-build step: train codebooks (one bounded sample job +
    driver Lloyd) and encode the corpus (one Arrow pass, 8 codes replace 64
    floats). ``persist=True`` materializes the encoded table eagerly so
    serve calls never pay the encode; ``path`` writes it as parquet and
    re-reads (the durable at-scale shape — the index is a TABLE; the
    codebooks stay driver-held, they are 16 KB and ride serve-call
    closures). ``persist=False, path=None`` returns a lazy plan — the
    self-contained single-call shape the registry queries use."""
    books = (
        codebooks
        if codebooks is not None
        else train_pq_codebooks(
            candidates, vec_col, id_col, m=m, k=k, n_iters=n_iters,
            sample_per_centroid=sample_per_centroid,
        )
    )
    enc = pq_encode(candidates, books, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        "pq_codes",
    )
    if path is not None:
        enc.write.mode("overwrite").parquet(path)
        enc = candidates.sparkSession.read.parquet(path)
    elif persist:
        enc = enc.persist()
        enc.count()  # materialize now: build pays the encode, serve doesn't
    return PQIndex(codebooks=books, encoded=enc, path=path)


def _adc_expr(m: int, lut_col: str = "__lut") -> Column:
    """Unrolled m-term ADC sum ``Σ_s lut[s][code_s]`` as plain
    ``element_at`` terms (r13): ``aggregate(zip_with(...))`` is
    CodegenFallback, so every (query, candidate) pair paid interpreted
    HOF evaluation — measured 82.1 s vs 5.0 s (16×) for the same
    13M-pair max-ADC scan at sf1. m is small and fixed per index (8
    default), so the unroll is a handful of codegen'd terms (the
    dot_expr warning about 64-term unrolls does not apply). Left-to-
    right addition with s ascending ≡ the HOF fold (``0.0 + x ≡ x``):
    scores are bit-identical, so ranks, ties, recall pins and the
    lifecycle-parity pytests are unchanged by construction."""
    from functools import reduce
    from operator import add

    return reduce(
        add,
        [
            F.element_at(
                F.col(lut_col).getItem(s),
                (F.col("pq_codes").getItem(s) + 1).cast("int"),
            )
            for s in range(m)
        ],
    )


def topk_pq(
    queries: DataFrame,
    candidates: DataFrame | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    codebooks: list[list[list[float]]] | None = None,
    refine: int = 4,
    index: PQIndex | None = None,
) -> DataFrame:
    """Approximate top-k by asymmetric distance computation (ADC) over PQ
    codes, then exact cosine re-rank of a ×``refine`` shortlist.

    Scale shape: candidates are scanned in COMPRESSED form — the ADC score
    reads only the m-byte code array; the full vector is touched for just
    the ``k × refine`` shortlist per query. Each query row carries its
    m×k lookup table (dot products of its subvectors against every
    codebook entry, built by one Arrow UDF pass over the small query
    side); the per-candidate score is an UNROLLED m-term
    ``element_at`` sum (r13): the previous ``aggregate(zip_with(...))``
    HOF form is CodegenFallback — interpreted per (query, candidate)
    pair — which the semantic-gate profiling exposed at bulk shapes:
    82.1 s vs 5.0 s for the same 13M-pair scan (16×). m is small and
    fixed (8 here), so the unroll stays a handful of codegen'd terms
    (the dot_expr 64-term warning does not apply); summation order is
    s ascending in both forms and ``0.0 + x ≡ x``, so scores are
    bit-identical (ranks, ties and recall pins unchanged).

    Pass a pre-built ``index`` (:func:`build_pq_index`) to serve against a
    materialized encode — the production path (build once, serve many);
    the (queries, candidates) form trains+encodes inline as one
    self-contained lazy plan."""
    if index is None:
        if candidates is None:
            raise ValueError("topk_pq needs either candidates or index")
        index = build_pq_index(
            candidates, vec_col, id_col, codebooks=codebooks, persist=False
        )
    books = [np.asarray(b, dtype=np.float64) for b in index.codebooks]
    m = len(books)
    sub = books[0].shape[1]

    @pandas_udf(ArrayType(ArrayType(DoubleType())))
    def _lut(emb: pd.Series) -> pd.Series:
        vv = np.vstack(emb.to_numpy()).astype(np.float64)
        nn = np.linalg.norm(vv, axis=1, keepdims=True)
        nn[nn == 0] = 1.0
        vv = vv / nn
        out = []
        for row in vv:
            out.append(
                [
                    [float(x) for x in books[s] @ row[s * sub : (s + 1) * sub]]
                    for s in range(m)
                ]
            )
        return pd.Series(out)

    cenc = index.encoded
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        _lut(F.col(vec_col)).alias("__lut"),
    )
    adc = _adc_expr(m)
    # compressed corpus streams; queries (with their LUTs) broadcast
    shortlist = (
        cenc.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("__adc", adc)
    )
    ws = Window.partitionBy("query_id").orderBy(F.desc("__adc"), F.col("neighbor_id"))
    refined = (
        shortlist.withColumn("__arank", F.row_number().over(ws))
        .filter(F.col("__arank") <= k * refine)
        .withColumn("score", F.round(cosine_expr(F.col("qv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.col("neighbor_id"))
    return (
        refined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
        .orderBy("query_id", "rank")
    )


# ── IVF-PQ (IVFADC) — cells restrict the scan, codes compress it ────────────

def _read_celled(spark, path: str) -> DataFrame:
    """Read a cell-partitioned encoded table, restoring ``cell`` to long
    (partition discovery infers int from the ``cell=<n>`` dir names)."""
    return spark.read.parquet(path).withColumn(
        "cell", F.col("cell").cast("long")
    )

def _sq_dists(block: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """(n, k) squared L2 distances via the GEMM identity
    ‖x−c‖² = ‖x‖² + ‖c‖² − 2·x·cᵀ. The naive broadcast-subtract form
    materializes an (n, k, d) tensor — 268 MB and memory-bandwidth-bound
    at n=16384, k=256, d=8 (measured 3.6 s per subspace, 29 s per PQ
    train); this form is one BLAS matmul (~milliseconds). Mildly negative
    values on exact hits are fine — only argmin order matters, and BLAS
    dgemm is run-to-run deterministic, preserving the trainer contract.
    The combine runs in-place on the gram output: the (n, k) array is the
    dominant memory traffic, so avoiding two temporaries halves the
    post-matmul cost (measured)."""
    d2 = block @ cents.T
    d2 *= -2.0
    d2 += (block * block).sum(axis=1)[:, None]
    d2 += (cents * cents).sum(axis=1)[None, :]
    return d2


def _lloyd_numpy(block: np.ndarray, k: int, n_iters: int) -> np.ndarray:
    """Deterministic numpy Lloyd on a (n, d) sample: seed = first k rows,
    6-decimal mean rounding, first-minimum (smallest-code) ties, empty
    cells keep their previous centroid.

    The means step is one ``np.add.at`` scatter + ``bincount`` instead of a
    per-cluster Python mask loop — at k=256 the loop was 256 full passes
    over the sample per round and dominated PQ training (measured ~10× on
    the codebook fit). Scatter accumulation is row-order sequential, so
    results stay deterministic; sum/count means match the previous
    per-cluster ``mean`` to well inside the 6-decimal rounding."""
    cents = block[: min(k, len(block))].copy()
    kk = len(cents)
    for _ in range(n_iters):
        idx = np.argmin(_sq_dists(block, cents), axis=1)
        sums = np.zeros((kk, block.shape[1]), dtype=np.float64)
        np.add.at(sums, idx, block)
        counts = np.bincount(idx, minlength=kk)
        nz = counts > 0
        new = cents.copy()
        new[nz] = np.round(sums[nz] / counts[nz, None], 6)
        cents = new
    return cents


def train_ivfpq(
    vectors: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = 16,
    m: int = 8,
    pq_k: int = 256,
    n_iters: int = 5,
    sample_rows: int = 16384,
) -> tuple[np.ndarray, list[np.ndarray]]:
    """IVFADC training (Jégou et al. TPAMI 2011 §IV): coarse centroids over
    unit vectors, then ONE SHARED product-quantization codebook set over
    the RESIDUALS ``unit(v) − coarse_centroid(v)`` — residual energy is a
    fraction of vector energy, so the same code budget quantizes far more
    precisely than raw-vector PQ. One bounded TakeOrdered sample job; all
    Lloyd rounds in numpy on the driver (the production shape — FAISS
    trains exactly this way on a memory-resident sample)."""
    base = vectors.select(
        F.col(id_col).alias("__id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__v"),
    ).orderBy(F.xxhash64(F.col("__id").cast("string")), F.col("__id")).limit(
        sample_rows
    )
    rows = sorted(base.collect(), key=lambda r: r["__id"])
    mat = np.array([r["__v"] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mat = mat / norms
    dim = mat.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    coarse = _lloyd_numpy(mat, n_cells, n_iters)
    cn = np.linalg.norm(coarse, axis=1, keepdims=True)
    cn[cn == 0] = 1.0
    cell = np.argmax(mat @ (coarse / cn).T, axis=1)
    resid = mat - coarse[cell]
    sub = dim // m
    books = [
        _lloyd_numpy(resid[:, s * sub : (s + 1) * sub], pq_k, n_iters)
        for s in range(m)
    ]
    return coarse, books


@dataclass
class IVFPQIndex:
    """A built IVFADC index: driver-held coarse centroids + shared residual
    codebooks, plus the ENCODED corpus table (neighbor_id, cv, cell,
    pq_codes). The index-add pass runs once at build; serve only probes."""

    coarse: np.ndarray
    books: list[np.ndarray]
    encoded: DataFrame
    tombstones: Tombstones | None = None
    path: str | None = None

    def unpersist(self) -> None:
        self.encoded.unpersist()
        if self.tombstones is not None:
            self.tombstones.ids.unpersist()
            self.tombstones.base.unpersist()


def build_ivfpq_index(
    candidates: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = 16,
    m: int = 8,
    pq_k: int = 256,
    trained: tuple[np.ndarray, list[np.ndarray]] | None = None,
    persist: bool = True,
    path: str | None = None,
) -> IVFPQIndex:
    """The IVFADC index-build step: train (bounded sample + driver Lloyd,
    :func:`train_ivfpq`) and encode the corpus — ONE mapInPandas pass
    emitting (id, vector, cell, residual codes). A struct-returning
    pandas_udf whose fields are extracted in a projection gets its
    ArrowEvalPython node DUPLICATED per extracted field (the encode ran
    twice in the physical plan); mapInPandas materializes the encoded table
    in a single Python pass — also the natural "index add" shape.
    ``persist=True`` materializes eagerly (build pays the encode, serve
    doesn't); ``path`` writes/rereads parquet (the durable table shape);
    ``persist=False, path=None`` stays lazy for self-contained one-shot
    plans."""
    if trained is None:
        trained = train_ivfpq(
            candidates, vec_col, id_col, n_cells=n_cells, m=m, pq_k=pq_k
        )
    coarse, books = trained
    dim = coarse.shape[1]
    sub = dim // m
    cn = np.linalg.norm(coarse, axis=1, keepdims=True)
    cn[cn == 0] = 1.0
    coarse_unit = coarse / cn

    def _enc_rows(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vv = np.vstack(pdf["__v"].to_numpy()).astype(np.float64)
            nn = np.linalg.norm(vv, axis=1, keepdims=True)
            nn[nn == 0] = 1.0
            vv = vv / nn
            cell = np.argmax(vv @ coarse_unit.T, axis=1)
            resid = vv - coarse[cell]
            codes = np.empty((len(vv), m), dtype=np.int64)
            for s in range(m):
                block = resid[:, s * sub : (s + 1) * sub]
                codes[:, s] = np.argmin(_sq_dists(block, books[s]), axis=1)
            yield pd.DataFrame(
                {
                    "neighbor_id": pdf["__id"].to_numpy(),
                    "cv": pdf["__v"],
                    "cell": cell,
                    "pq_codes": list(codes),
                }
            )

    vec_spark_type = candidates.schema[vec_col].dataType.simpleString()
    # The id type rides through from the candidate schema (like the vec type
    # does) — hardcoding `long` broke / silently coerced string doc ids.
    id_spark_type = candidates.schema[id_col].dataType.simpleString()
    enc = candidates.select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__v")
    ).mapInPandas(
        _enc_rows,
        f"neighbor_id {id_spark_type}, cv {vec_spark_type}, cell long,"
        " pq_codes array<long>",
    )
    if path is not None:
        # cell-partitioned layout (r14): the durable index IS the inverted
        # file — a celled serve with prune_cells reads ONLY the probed
        # cells' files, which is what makes per-query cost independent of
        # index size (the IVF contract; a flat layout scans everything and
        # only saves ADC compute). Repartition ON cell first: a direct
        # partitionBy write fans out to (writing tasks × cells) tiny
        # files, and the per-file open cost then grows with cells —
        # measured as the whole benefit gone at 80 cells (2560 files).
        # One build-time shuffle of the slim encoded rows buys ~one file
        # per cell, the contiguous inverted-list shape. Partition
        # discovery types `cell` as int, so reads cast it back to long.
        enc.repartition("cell").write.mode("overwrite").partitionBy(
            "cell"
        ).parquet(path)
        enc = _read_celled(candidates.sparkSession, path)
    elif persist:
        enc = enc.persist()
        enc.count()
    return IVFPQIndex(coarse=coarse, books=books, encoded=enc, path=path)


# ── incremental index add (frozen parameters) ──────────────────────────────
# The standard production lifecycle (and the SCALE.md §3 contract): new
# vectors are encoded with the FROZEN trained parameters and appended to
# the index table; full retrain happens only on distribution drift. Each
# add is one linear encode pass over the NEW vectors only — nothing
# already indexed is touched. Caller contract: ids are append-only (an add
# does not dedupe against already-indexed ids).

def _require_reads_from(df: DataFrame, target: str, consequence: str) -> str:
    """Validate (never trust) that ``df``'s leaf scans all live under
    ``target`` — the shared precondition for every operation that rewrites
    or appends to a durable index directory. Returns the normalized
    absolute target path."""
    import os

    t = target[len("file:"):] if target.startswith("file:") else target
    prefix = os.path.abspath(t)

    def _under(uri: str) -> bool:
        # strip only a LEADING file: scheme (mid-string 'file:' is path
        # content), then require containment under prefix as a path
        # COMPONENT — bare startswith let a sibling like '/data/index2'
        # pass a '/data/index' guard
        p = uri[len("file:"):] if uri.startswith("file:") else uri
        p = os.path.abspath(p)
        return p == prefix or p.startswith(prefix + os.sep)

    inputs = df.inputFiles()
    if not inputs or not all(_under(f) for f in inputs):
        raise ValueError(
            f"path={target!r}: the index does not read from that path"
            f" (inputFiles={inputs[:3]}...), so {consequence}."
            f" Pass the path the index was built/grown with."
        )
    return prefix


def _grown(old: DataFrame, fresh: DataFrame, persist: bool, path: str | None,
           read_path: str | None = None,
           validate: DataFrame | None = None,
           partition_by: str | None = None) -> DataFrame:
    """Union an index table with freshly encoded rows. ``path`` appends the
    new rows to the durable parquet index and re-reads it — valid ONLY
    when the base index already lives at that path (built or previously
    grown with the same ``path``); appending to a path the base never
    wrote would silently produce an index containing just the new batch,
    so that precondition is VALIDATED against the base frame's input
    files, not trusted (:func:`_require_reads_from`). ``validate``
    overrides which frame the guard inspects: for a TOMBSTONED index the
    serve frame ``old`` is an anti-join VIEW, and ``inputFiles()`` on a
    join is best-effort — a Spark version that surfaces the right side's
    (remove-ids) leaves would make the guard spuriously raise on every
    add-after-remove (ADVICE r6), so callers pass the physical base table
    (a pure file scan) instead. Otherwise: a persisted (or lazy)
    in-memory union."""
    if path is not None:
        target = read_path or path
        _require_reads_from(
            validate if validate is not None else old, target,
            "a parquet append would DROP every already-indexed row",
        )
        if partition_by is not None:
            # celled tables stay celled through adds (the r14 inverted-
            # file layout): appended rows land in their cell=<n> dirs
            fresh.write.mode("append").partitionBy(partition_by).parquet(
                target
            )
            return _read_celled(fresh.sparkSession, target)
        fresh.write.mode("append").parquet(target)
        return fresh.sparkSession.read.parquet(target)
    grown = old.unionByName(fresh)
    if persist:
        grown = grown.persist()
        grown.count()
        old.unpersist()
    return grown


def _check_no_tombstoned_readds(tombs: Tombstones | None, fresh: DataFrame) -> None:
    """Re-adding a TOMBSTONED id raises — BEFORE any durable append
    mutates the index directory: after an append, the old (removed) and
    new rows are indistinguishable, so the removal filter would silently
    kill the fresh vector in durable mode while in-memory mode would serve
    it — a silent mode divergence either way. Compact first (clearing the
    tombstone set), then add."""
    if tombs is None:
        return
    readded = (
        fresh.select("neighbor_id")
        .join(_tomb_hint(tombs.ids, tombs.n_removed), "neighbor_id", "semi")
        .limit(5)
        .collect()
    )
    if readded:
        ids = [r["neighbor_id"] for r in readded]
        raise ValueError(
            f"index add would re-insert tombstoned ids {ids}: after a"
            f" durable append old and new rows are indistinguishable, so"
            f" the removal filter would drop the fresh vectors too."
            f" Compact the index first (remove past the threshold with the"
            f" index path, clearing tombstones), then add."
        )


def _carry_tombstones(
    grown: DataFrame,
    tombs: Tombstones | None,
    fresh: DataFrame,
    durable: bool,
) -> tuple[DataFrame, Tombstones | None]:
    """Preserve removal state across an index add. Durable mode re-reads
    the FULL parquet table — including previously tombstoned rows — so the
    anti-join must be reapplied or the add would resurrect deletions;
    in-memory mode grows both the live view and the physical base. Counts
    ride along stale; the next remove recomputes them from the frames.

    Tombstoned-id re-adds are rejected earlier, before the append
    (:func:`_check_no_tombstoned_readds` in each ``*_index_add``)."""
    if tombs is None:
        return grown, None
    if durable:
        base = grown
        live = base.join(
            _tomb_hint(tombs.ids, tombs.n_removed), "neighbor_id", "left_anti"
        )
    else:
        base = tombs.base.unionByName(fresh)
        live = grown
    return live, Tombstones(
        ids=tombs.ids, base=base, n_removed=tombs.n_removed, n_base=tombs.n_base
    )


def pq_index_add(
    index: PQIndex,
    new_vectors: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    persist: bool = True,
    path: str | None = None,
) -> PQIndex:
    """Encode ``new_vectors`` with the index's frozen codebooks and append.
    Serving the grown index is bit-identical to having built it with the
    same codebooks over the full corpus (pytest pins this)."""
    fresh = build_pq_index(
        new_vectors, vec_col, id_col,
        codebooks=index.codebooks, persist=False,
    ).encoded
    _check_no_tombstoned_readds(index.tombstones, fresh)
    grown = _grown(
        index.encoded, fresh, persist, path,
        validate=index.tombstones.base if index.tombstones else None,
    )
    live, tombs = _carry_tombstones(grown, index.tombstones, fresh, path is not None)
    return PQIndex(
        codebooks=index.codebooks, encoded=live, tombstones=tombs,
        path=path if path is not None else index.path,
    )


def ivf_index_add(
    index: IVFIndex,
    new_vectors: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    persist: bool = True,
    path: str | None = None,
) -> IVFIndex:
    """Assign ``new_vectors`` to the index's frozen centroid cells and
    append (durable layout: ``path/assigned``, matching build_ivf_index).
    The centroid table's vector column is positional (columns[1], the
    same tolerance topk_ivf applies) so an add whose ``vec_col`` differs
    from the build's still resolves."""
    cents = index.centroids
    cents = cents.select("centroid_id", F.col(cents.columns[1]).alias(vec_col))
    fresh = build_ivf_index(
        new_vectors, vec_col, id_col, centroids=cents, persist=False,
    ).assigned
    _check_no_tombstoned_readds(index.tombstones, fresh)
    grown = _grown(
        index.assigned, fresh, persist, path,
        read_path=f"{path}/assigned" if path else None,
        validate=index.tombstones.base if index.tombstones else None,
    )
    live, tombs = _carry_tombstones(grown, index.tombstones, fresh, path is not None)
    return IVFIndex(
        centroids=index.centroids, assigned=live, tombstones=tombs,
        path=path if path is not None else index.path,
    )


def ivfpq_index_add(
    index: IVFPQIndex,
    new_vectors: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    persist: bool = True,
    path: str | None = None,
) -> IVFPQIndex:
    """Encode ``new_vectors`` against the frozen coarse centroids + shared
    residual codebooks and append."""
    fresh = build_ivfpq_index(
        new_vectors, vec_col, id_col,
        # m must come from the frozen books, not build_ivfpq_index's
        # default — an index trained with m=4 encodes adds with m=4
        m=len(index.books),
        trained=(index.coarse, index.books), persist=False,
    ).encoded
    _check_no_tombstoned_readds(index.tombstones, fresh)
    grown = _grown(
        index.encoded, fresh, persist, path,
        validate=index.tombstones.base if index.tombstones else None,
        partition_by="cell",
    )
    live, tombs = _carry_tombstones(grown, index.tombstones, fresh, path is not None)
    return IVFPQIndex(
        coarse=index.coarse, books=index.books, encoded=live, tombstones=tombs,
        path=path if path is not None else index.path,
    )


# ── index remove / compact — the delete half of the lifecycle ───────────────

# Compact when removed rows exceed this fraction of the physical table.
# Below it the index serves through an anti-join on the tombstone set
# (broadcast-hinted only under INDEX_TOMBSTONE_BROADCAST_MAX_IDS) — the
# physical table is never rewritten per delete; above it the rot is worth
# one rewrite of live rows (FAISS/Lucene practice: tombstone-then-merge,
# not delete-in-place).
INDEX_COMPACT_THRESHOLD = 0.2


def _swap_dirs(target: str, tmp: str) -> None:
    """Two-rename swap of a freshly written parquet dir into place (the
    streaming upsert's crash pattern): target → target.old, tmp → target,
    then drop .old. A crash between the renames leaves the index parked at
    ``.old`` — recoverable by hand, never a half-written table."""
    import os
    import shutil

    old = target + ".old"
    if os.path.exists(old):
        shutil.rmtree(old)
    os.rename(target, old)
    os.rename(tmp, target)
    shutil.rmtree(old)


def _index_remove(
    live: DataFrame,
    tombstones: Tombstones | None,
    remove_ids: DataFrame,
    id_col: str,
    compact_threshold: float,
    persist: bool,
    path: str | None,
    read_path: str | None = None,
    index_path: str | None = None,
    partition_by: str | None = None,
) -> tuple[DataFrame, Tombstones | None]:
    """Shared removal body: fold ``remove_ids`` into the tombstone set,
    rebuild the live anti-join view over the UNCHANGED physical table
    (one anti-join total, never a chain — each call re-derives the view
    from the base; broadcast-hinted only below the absolute id cap,
    :func:`_tomb_hint`), and compact only past the threshold.
    ``index_path`` is the durable root the index lives at (None =
    memory-only): a durable index never compacts in memory (see the
    comment at the threshold check). Returns (new live/serve frame, new
    tombstone state — None after a compaction)."""
    new_ids = remove_ids.select(F.col(id_col).alias("neighbor_id")).distinct()
    base = live if tombstones is None else tombstones.base
    # Tombstone only ids actually PRESENT in the index (ADVICE r6): absent
    # ids folded into n_removed inflate Tombstones.fraction and can trigger
    # a premature compaction rewrite. Prior tombstone ids were
    # presence-filtered when they entered the set, so only the NEW batch
    # needs the semi-join; the base scan prunes to the id column. No
    # broadcast hint here — remove batches are caller-sized and AQE picks
    # the build side.
    new_present = base.select("neighbor_id").join(new_ids, "neighbor_id", "semi")
    rem = (
        new_present
        if tombstones is None
        else new_present.unionByName(tombstones.ids).distinct()
    )
    rem = rem.persist()
    n_removed = rem.count()
    if tombstones is not None:
        tombstones.ids.unpersist()
    n_base = base.count()
    filtered = base.join(
        _tomb_hint(rem, n_removed), "neighbor_id", "left_anti"
    )
    # An IN-MEMORY compaction of a DURABLE index must not clear the
    # tombstones: the index parquet still contains the removed rows, and a
    # later durable *_index_add would append + re-read the full table —
    # with no tombstone record left, every removed vector would silently
    # resurrect (the _grown path guard passes: the live view's lineage
    # still reads the index files). Durable indexes compact durably (pass
    # path); until then they stay tombstoned.
    if n_removed <= compact_threshold * n_base or (
        path is None and index_path is not None
    ):
        return filtered, Tombstones(
            ids=rem, base=base, n_removed=n_removed, n_base=n_base
        )
    # compact: rewrite live rows only, clear tombstones
    if path is not None:
        # same precondition _grown validates for append: the physical table
        # must actually read from the target, or the swap would clobber an
        # unrelated directory
        target = _require_reads_from(
            base, read_path or path,
            "the compaction swap would clobber an unrelated directory",
        )
        tmp = target + ".compact"
        if partition_by is not None:
            # celled tables stay celled through compaction (r14 layout)
            filtered.repartition(partition_by).write.mode(
                "overwrite"
            ).partitionBy(partition_by).parquet(tmp)
            _swap_dirs(target, tmp)
            new = _read_celled(filtered.sparkSession, target)
        else:
            filtered.write.mode("overwrite").parquet(tmp)
            _swap_dirs(target, tmp)
            new = filtered.sparkSession.read.parquet(target)
    elif persist:
        new = filtered.persist()
        new.count()
        base.unpersist()
    else:
        new = filtered
    rem.unpersist()
    return new, None


def pq_index_remove(
    index: PQIndex,
    remove_ids: DataFrame,
    id_col: str = "vec_id",
    compact_threshold: float = INDEX_COMPACT_THRESHOLD,
    persist: bool = True,
    path: str | None = None,
) -> PQIndex:
    """Retire vectors from a PQ index without re-encoding anything: the ids
    join the tombstone set and ``encoded`` becomes the anti-join live
    view (every serve function works unchanged); past
    ``compact_threshold`` the live rows are rewritten and tombstones
    clear — durably via the two-rename parquet swap when the index lives
    at ``path``, or by re-persist for a memory-only index (an index WITH
    a durable path but called without one stays tombstoned instead: its
    parquet still holds the removed rows, and clearing the record would
    let a later durable add resurrect them). Re-adding a tombstoned id
    is rejected at add time. Codebooks are untouched — removal never
    retrains. Invariant (pytest): remove(add(X), X) serves bit-identically
    to the original index."""
    new_enc, tombs = _index_remove(
        index.encoded, index.tombstones, remove_ids, id_col,
        compact_threshold, persist, path, index_path=index.path,
    )
    return PQIndex(
        codebooks=index.codebooks, encoded=new_enc, tombstones=tombs,
        path=path if path is not None else index.path,
    )


def ivf_index_remove(
    index: IVFIndex,
    remove_ids: DataFrame,
    id_col: str = "vec_id",
    compact_threshold: float = INDEX_COMPACT_THRESHOLD,
    persist: bool = True,
    path: str | None = None,
) -> IVFIndex:
    """IVF removal twin (durable layout ``path/assigned``, matching
    build/add). Centroids are untouched: emptying a cell is fine — probes
    of an empty cell return nothing."""
    new_asgn, tombs = _index_remove(
        index.assigned, index.tombstones, remove_ids, id_col,
        compact_threshold, persist, path,
        read_path=f"{path}/assigned" if path else None,
        index_path=index.path,
    )
    return IVFIndex(
        centroids=index.centroids, assigned=new_asgn, tombstones=tombs,
        path=path if path is not None else index.path,
    )


def ivfpq_index_remove(
    index: IVFPQIndex,
    remove_ids: DataFrame,
    id_col: str = "vec_id",
    compact_threshold: float = INDEX_COMPACT_THRESHOLD,
    persist: bool = True,
    path: str | None = None,
) -> IVFPQIndex:
    """IVFADC removal twin — frozen coarse centroids + residual codebooks
    stay; only the encoded table's live view changes."""
    new_enc, tombs = _index_remove(
        index.encoded, index.tombstones, remove_ids, id_col,
        compact_threshold, persist, path, index_path=index.path,
        partition_by="cell",
    )
    return IVFPQIndex(
        coarse=index.coarse, books=index.books, encoded=new_enc,
        tombstones=tombs, path=path if path is not None else index.path,
    )


def index_tombstone_stats(index) -> DataFrame:
    """Per-cell rot accounting for a tombstoned index: (cell, n_live,
    n_removed, removed_frac) — how an operator decides WHICH indexes are
    worth compacting before the global threshold forces it. Cell column:
    ``centroid_id`` (IVF), ``cell`` (IVFADC); a PQ index is one flat cell
    (-1). On a tombstone-free index n_removed is 0 everywhere."""
    if index.tombstones is not None:
        base = index.tombstones.base
    elif hasattr(index, "assigned"):
        base = index.assigned
    else:
        base = index.encoded
    cell = next(
        (c for c in ("centroid_id", "cell") if c in base.columns), None
    )
    cell_col = F.col(cell) if cell is not None else F.lit(-1).cast("long")
    if index.tombstones is None:
        marked = base.select(cell_col.alias("cell_id"), F.lit(False).alias("__rm"))
    else:
        marked = base.join(
            _tomb_hint(
                index.tombstones.ids.withColumn("__rm", F.lit(True)),
                index.tombstones.n_removed,
            ),
            "neighbor_id",
            "left",
        ).select(
            cell_col.alias("cell_id"),
            F.coalesce(F.col("__rm"), F.lit(False)).alias("__rm"),
        )
    return (
        marked.groupBy("cell_id")
        .agg(
            F.sum(F.when(~F.col("__rm"), 1).otherwise(0)).alias("n_live"),
            F.sum(F.when(F.col("__rm"), 1).otherwise(0)).alias("n_removed"),
        )
        .withColumn(
            "removed_frac",
            F.round(
                F.col("n_removed") / (F.col("n_live") + F.col("n_removed")), 6
            ),
        )
        .orderBy("cell_id")
    )


def topk_ivfpq(
    queries: DataFrame,
    candidates: DataFrame | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    m: int = 8,
    pq_k: int = 256,
    refine: int = 4,
    trained: tuple[np.ndarray, list[np.ndarray]] | None = None,
    index: IVFPQIndex | None = None,
    prune_cells: bool = False,
) -> DataFrame:
    """IVFADC search: each candidate is stored as (cell, m residual codes);
    a query probes its ``n_probe`` nearest cells and ADC-scores ONLY the
    candidates in those cells — the scan is simultaneously restricted
    (IVF: n_probe/n_cells of the corpus) and compressed (PQ: m bytes per
    vector). score(q,v) ≈ q·c_cell + q·r_v: the first term rides the
    probe join, the second is the codes-vs-LUT sum — a pure
    zip_with/element_at Column expression, JVM-side. Exact cosine
    re-ranks the ×``refine`` shortlist only.

    Pass a pre-built ``index`` (:func:`build_ivfpq_index`) to serve
    against a materialized encode — the production path; the (queries,
    candidates) form trains+encodes inline as one self-contained plan.

    ``prune_cells=True`` (r14) collects the batch's DISTINCT probed cells
    first — one extra bounded job, result ≤ n_cells values — and filters
    the encoded scan to them statically. On the cell-partitioned durable
    layout (build_ivfpq_index(path=...) / save_ivfpq_index) that is file-
    level partition pruning: the scan touches only the probed cells'
    files, so serve cost tracks n_probe × cell size instead of index
    size — the property that keeps a per-micro-batch consult flat while
    the index grows (a broadcast join alone still SCANS the whole table;
    Spark's dynamic partition pruning does not fire without a selective
    build-side predicate, verified). Worth it when the query side is
    small relative to the index (the gate's shape); leave off for bulk
    scans that touch most cells anyway."""
    if index is None:
        if candidates is None:
            raise ValueError("topk_ivfpq needs either candidates or index")
        index = build_ivfpq_index(
            candidates, vec_col, id_col, n_cells=n_cells, m=m, pq_k=pq_k,
            trained=trained, persist=False,
        )
    coarse, books = index.coarse, index.books
    # geometry comes from the index's frozen books, NOT the caller's m
    # argument — an index built with m=4 must serve with m=4 even when the
    # caller left the default (the m parameter only shapes inline builds)
    m = len(books)
    dim = coarse.shape[1]
    sub = dim // m
    cn = np.linalg.norm(coarse, axis=1, keepdims=True)
    cn[cn == 0] = 1.0
    coarse_unit = coarse / cn

    probe_schema = StructType(
        [
            StructField("cell", LongType()),
            StructField("qdotc", DoubleType()),
            StructField("lut", ArrayType(ArrayType(DoubleType()))),
        ]
    )

    @pandas_udf(ArrayType(probe_schema))
    def _probes(emb: pd.Series) -> pd.Series:
        vv = np.vstack(emb.to_numpy()).astype(np.float64)
        nn = np.linalg.norm(vv, axis=1, keepdims=True)
        nn[nn == 0] = 1.0
        vv = vv / nn
        sims = vv @ coarse_unit.T
        out = []
        for row, sim in zip(vv, sims):
            cells = np.argsort(-sim)[:n_probe]
            lut = [
                [float(x) for x in books[s] @ row[s * sub : (s + 1) * sub]]
                for s in range(m)
            ]
            out.append(
                [
                    {
                        "cell": int(c),
                        "qdotc": float(row @ coarse[c]),
                        "lut": lut,
                    }
                    for c in cells
                ]
            )
        return pd.Series(out)

    cenc = index.encoded
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.explode(_probes(F.col(vec_col))).alias("__p"),
    ).select("query_id", "qv", "__p.cell", "__p.qdotc", "__p.lut")
    if prune_cells:
        # LUT-free probe pass for the bounded distinct-cells collect:
        # pruning through `q` would re-evaluate the full _probes UDF —
        # including the m×k LUT python lists, the expensive part — just
        # to read the cell field (column pruning cannot reach inside a
        # UDF). Cell assignment alone is one argsort per row.
        @pandas_udf(ArrayType(LongType()))
        def _probe_cells(emb: pd.Series) -> pd.Series:
            vv = np.vstack(emb.to_numpy()).astype(np.float64)
            nn = np.linalg.norm(vv, axis=1, keepdims=True)
            nn[nn == 0] = 1.0
            sims = (vv / nn) @ coarse_unit.T
            return pd.Series(
                [np.argsort(-s)[:n_probe].tolist() for s in sims]
            )

        probed = [
            r["c"]
            for r in queries.select(
                F.explode(_probe_cells(F.col(vec_col))).alias("c")
            )
            .distinct()
            .collect()
        ]
        if not probed:
            # empty query side: nothing to probe, keep the plan trivial
            cenc = cenc.filter(F.lit(False))
        else:
            cenc = cenc.filter(F.col("cell").isin(probed))
    # unrolled ADC (r13 — see _adc_expr/topk_pq): the HOF form was
    # interpreted per (probe, candidate) pair
    adc = F.col("qdotc") + _adc_expr(m, lut_col="lut")
    # Broadcast the PROBE side: queries × n_probe is the small relation by
    # construction; the encoded corpus streams. (Without the hint the local
    # planner broadcast the corpus side — backwards at scale.)
    shortlist = (
        cenc.join(F.broadcast(q), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("__adc", adc)
    )
    ws = Window.partitionBy("query_id").orderBy(F.desc("__adc"), F.col("neighbor_id"))
    refined = (
        shortlist.withColumn("__arank", F.row_number().over(ws))
        .filter(F.col("__arank") <= k * refine)
        .withColumn("score", F.round(cosine_expr(F.col("qv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.col("neighbor_id"))
    return (
        refined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
        .orderBy("query_id", "rank")
    )


# ── durable PQ index artifact (r13): codebooks + encoded corpus + meta ──────
# build_pq_index(path=...) already made the ENCODED TABLE durable, but the
# codebooks lived only in the building session — a restart (or a streaming
# consumer on another driver) could serve the table it couldn't decode.
# The artifact closes the loop, mirroring the classifier/LM/PCA artifact
# discipline: <path>/meta (one row: kind, m, k, sub), <path>/codebooks
# (m×k rows: s, j, centroid), <path>/encoded (the corpus codes). Everything
# validated at load so a half-written artifact fails there, not as silently
# wrong ADC scores.

def _parquet_dir_exists(spark, path: str) -> bool:
    """True iff a readable parquet directory exists at ``path``. The sniff
    is deliberately NARROW (ADVICE r13): only a missing path reads as
    absence — a present but unreadable/corrupt directory PROPAGATES
    instead of being swallowed, because the caller's fallback on absence
    (e.g. ``resolve_ann_index`` loading plain PQ when no OPQ marker
    exists) would otherwise silently serve the wrong artifact kind."""
    from pyspark.errors import AnalysisException

    try:
        spark.read.parquet(path)
        return True
    except AnalysisException as e:
        msg = str(e)
        if "PATH_NOT_FOUND" in msg or "Path does not exist" in msg:
            return False
        raise


def save_pq_index(index: PQIndex, path: str, _opq_root: bool = False) -> None:
    """Persist a :class:`PQIndex` as a self-contained parquet artifact —
    the restart/cross-session form of ``build_pq_index(path=...)``. An
    index with live tombstones must be compacted first (the artifact
    stores the index as-built; a tombstone side-table would make two
    sources of truth). ``_opq_root`` is the internal flag
    :func:`..embeddings.save_opq_index` passes when delegating the PQ
    parts under an OPQ root (where the opq_meta marker legitimately
    coexists)."""
    if index.tombstones is not None:
        raise ValueError(
            "save_pq_index: index has live tombstones — compact first "
            "(pq_index_remove past the compaction threshold rewrites the "
            "table) so the artifact is the single source of truth"
        )
    spark = index.encoded.sparkSession
    books = index.codebooks
    m, k, sub = len(books), len(books[0]), len(books[0][0])
    root = path.rstrip("/")
    rows = [
        (s, j, [float(x) for x in books[s][j]])
        for s in range(m)
        for j in range(k)
    ]
    spark.createDataFrame(rows, "s int, j int, c array<double>").write.mode(
        "overwrite"
    ).parquet(root + "/codebooks")
    index.encoded.write.mode("overwrite").parquet(root + "/encoded")
    # one-row meta via range+lit: pure JVM (the r13 segmeta finding —
    # createDataFrame one-row frames pay Python-worker roundtrips)
    spark.range(0, 1, 1, 1).select(
        F.lit("pq").alias("kind"),
        F.lit(m).cast("int").alias("m"),
        F.lit(k).cast("int").alias("k"),
        F.lit(sub).cast("int").alias("sub"),
    ).write.mode("overwrite").parquet(root + "/meta")


def load_pq_index(
    spark,
    path: str,
    persist: bool = False,
    _opq_root: bool = False,
    include_stream_adds: bool = True,
) -> PQIndex:
    """Load a :func:`save_pq_index` artifact. Codebooks are a bounded
    collect (m×k rows, ~16 KB of doubles); the encoded corpus stays a
    lazy parquet read (``persist=True`` pins it for serve-many sessions —
    the streaming gate does this for the stream's lifetime). Validates
    meta cardinality, codebook completeness/contiguity and subvector
    width so a torn write fails at load.

    Refuses an OPQ root (ADVICE r13): an OPQ artifact CONTAINS a valid
    PQ artifact, so loading one here would serve unrotated queries
    against the rotated corpus — exactly the silent corruption the
    artifact exists to prevent. ``_opq_root`` is
    :func:`..embeddings.load_opq_index`'s internal bypass (it owns the
    rotation half)."""
    root = path.rstrip("/")
    if not _opq_root and _parquet_dir_exists(spark, root + "/opq_meta"):
        raise ValueError(
            f"{path} is an OPQ index artifact (opq_meta marker present) — "
            "load it with load_opq_index / resolve_ann_index; a plain PQ "
            "load would serve unrotated queries against the rotated corpus"
        )
    meta_rows = spark.read.parquet(root + "/meta").collect()
    if len(meta_rows) != 1 or meta_rows[0]["kind"] != "pq":
        raise ValueError(
            f"corrupt PQ index artifact at {path}: meta must be exactly "
            f"one kind='pq' row, found {meta_rows}"
        )
    meta = meta_rows[0]
    m, k, sub = meta["m"], meta["k"], meta["sub"]
    got = spark.read.parquet(root + "/codebooks").collect()
    by_key = {(r["s"], r["j"]): r["c"] for r in got}
    if (
        len(got) != m * k
        or len(by_key) != m * k
        or any((s, j) not in by_key for s in range(m) for j in range(k))
        or any(len(c) != sub for c in by_key.values())
    ):
        raise ValueError(
            f"corrupt PQ index artifact at {path}: expected {m}x{k} "
            f"codebook rows of width {sub} — rebuild and re-save"
        )
    books = [
        [[float(x) for x in by_key[(s, j)]] for j in range(k)]
        for s in range(m)
    ]
    enc = spark.read.parquet(root + "/encoded")
    # streaming keeper registrations (r14) ride the serve view so batch
    # jobs and restarts judge against every registered keeper; an index
    # loaded with live stream_adds refuses durable *_index_add appends
    # (the _require_reads_from guard fires on the union's extra leaves) —
    # promote_stream_adds folds them into the base first. The registering
    # stream itself loads with include_stream_adds=False: it reads the
    # adds FRESH each micro-batch (minus its own epoch), so a lifetime
    # pin of the union here would be stale and double-counted.
    if include_stream_adds:
        adds = _stream_adds_df(spark, root)
        if adds is not None:
            enc = enc.unionByName(adds.drop("batch"))
    if persist:
        enc = enc.persist()
    return PQIndex(codebooks=books, encoded=enc, path=root + "/encoded")


# ── durable IVFADC (IVF-PQ) index artifact (r14) ────────────────────────────
# The celled twin of save_pq_index/load_pq_index: coarse centroids ride the
# artifact next to the shared residual codebooks and the encoded corpus, so
# a restarted stream (or another driver) can serve n_probe-celled consults
# without the building session. Layout mirrors the PQ artifact and reuses
# its meta/codebooks discipline: <root>/meta (ONE row, kind='ivfpq', m, k,
# sub, n_cells, dim), <root>/coarse (n_cells rows: cell, c), <root>/
# codebooks (m×k rows: s, j, c — the RESIDUAL books), <root>/encoded
# (neighbor_id, cv, cell, pq_codes). Everything validated at load so a torn
# write fails there. kind='ivfpq' makes a plain load_pq_index of this root
# fail loudly on the meta check (and vice versa), and resolve_ann_index
# dispatches on it.

def save_ivfpq_index(index: IVFPQIndex, path: str) -> None:
    """Persist an :class:`IVFPQIndex` as a self-contained parquet artifact.
    Same tombstone rule as :func:`save_pq_index`: compact first — the
    artifact is the single source of truth."""
    if index.tombstones is not None:
        raise ValueError(
            "save_ivfpq_index: index has live tombstones — compact first "
            "(ivfpq_index_remove past the compaction threshold rewrites "
            "the table) so the artifact is the single source of truth"
        )
    spark = index.encoded.sparkSession
    books = [np.asarray(b, dtype=np.float64) for b in index.books]
    coarse = np.asarray(index.coarse, dtype=np.float64)
    m, k, sub = len(books), books[0].shape[0], books[0].shape[1]
    n_cells, dim = coarse.shape
    root = path.rstrip("/")
    spark.createDataFrame(
        [(int(c), [float(x) for x in coarse[c]]) for c in range(n_cells)],
        "cell int, c array<double>",
    ).write.mode("overwrite").parquet(root + "/coarse")
    spark.createDataFrame(
        [
            (s, j, [float(x) for x in books[s][j]])
            for s in range(m)
            for j in range(k)
        ],
        "s int, j int, c array<double>",
    ).write.mode("overwrite").parquet(root + "/codebooks")
    # cell-partitioned: the artifact IS the inverted file — prune_cells
    # serves read only the probed cells' files; repartition keeps it to
    # ~one file per cell (see build_ivfpq_index on the write fan-out)
    index.encoded.repartition("cell").write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(root + "/encoded")
    # meta LAST: its presence marks a complete artifact (a torn save has
    # no readable meta and fails the load's kind check loudly)
    spark.range(0, 1, 1, 1).select(
        F.lit("ivfpq").alias("kind"),
        F.lit(m).cast("int").alias("m"),
        F.lit(k).cast("int").alias("k"),
        F.lit(sub).cast("int").alias("sub"),
        F.lit(n_cells).cast("int").alias("n_cells"),
        F.lit(dim).cast("int").alias("dim"),
    ).write.mode("overwrite").parquet(root + "/meta")


def load_ivfpq_index(
    spark, path: str, persist: bool = False, include_stream_adds: bool = True
) -> IVFPQIndex:
    """Load a :func:`save_ivfpq_index` artifact: bounded collects for the
    coarse centroids (n_cells rows) and residual codebooks (m×k rows),
    lazy parquet read for the encoded corpus (``persist=True`` pins it for
    serve-many sessions). Validates meta cardinality, coarse contiguity /
    width and codebook completeness so a torn write fails at load."""
    root = path.rstrip("/")
    meta_rows = spark.read.parquet(root + "/meta").collect()
    if len(meta_rows) != 1 or meta_rows[0]["kind"] != "ivfpq":
        raise ValueError(
            f"corrupt IVFPQ index artifact at {path}: meta must be exactly "
            f"one kind='ivfpq' row, found {meta_rows}"
        )
    meta = meta_rows[0]
    m, k, sub = meta["m"], meta["k"], meta["sub"]
    n_cells, dim = meta["n_cells"], meta["dim"]
    crows = sorted(
        spark.read.parquet(root + "/coarse").collect(), key=lambda r: r["cell"]
    )
    if (
        [r["cell"] for r in crows] != list(range(n_cells))
        or any(len(r["c"]) != dim for r in crows)
    ):
        raise ValueError(
            f"corrupt IVFPQ index artifact at {path}: coarse must be "
            f"{n_cells} contiguous rows of width {dim} — rebuild and re-save"
        )
    coarse = np.array([r["c"] for r in crows], dtype=np.float64)
    got = spark.read.parquet(root + "/codebooks").collect()
    by_key = {(r["s"], r["j"]): r["c"] for r in got}
    if (
        len(got) != m * k
        or len(by_key) != m * k
        or any((s, j) not in by_key for s in range(m) for j in range(k))
        or any(len(c) != sub for c in by_key.values())
    ):
        raise ValueError(
            f"corrupt IVFPQ index artifact at {path}: expected {m}x{k} "
            f"codebook rows of width {sub} — rebuild and re-save"
        )
    books = [
        np.array([by_key[(s, j)] for j in range(k)], dtype=np.float64)
        for s in range(m)
    ]
    enc = _read_celled(spark, root + "/encoded")
    # streaming keeper registrations ride the serve view (see
    # load_pq_index); promote_stream_adds folds them into the base
    if include_stream_adds:
        adds = _stream_adds_df(spark, root)
        if adds is not None:
            enc = enc.unionByName(adds.drop("batch"))
    if persist:
        enc = enc.persist()
    return IVFPQIndex(
        coarse=coarse, books=books, encoded=enc, path=root + "/encoded"
    )


# ── streaming keeper registration (r14, VERDICT r13 #4) ─────────────────────
# The consult-only semantic gate left one gap: a stream keeper entered the
# index only via the nightly add job, so a semantic dup of a just-kept doc
# passed for the rest of the run. Registration closes it with the signature
# index's own discipline: each micro-batch's kept (and embedded) rows are
# encoded with the index's FROZEN parameters and written under
# <root>/stream_adds/batch=<id>, where <id> comes from the same per-epoch
# reservation-marker protocol the sigs/segdf indexes use (streaming.pipeline
# _gate_batch_id) — re-delivery reuses its id and overwrites ITS OWN dir
# only, so registration is idempotent. Consults exclude the CURRENT epoch's
# dir (a re-delivered batch must judge against exactly the history its
# first delivery saw — including its own earlier registration would flip
# mutual within-batch near-dups from kept to dropped on re-delivery).
# Artifact loads union stream_adds in, so batch jobs and restarts serve
# every registered keeper; promote_stream_adds folds them into the base
# table nightly.


def _stream_adds_df(spark, root: str) -> DataFrame | None:
    """The ``<root>/stream_adds`` registration table (partition column
    ``batch``), or None when absent/empty. Marker-only state (an epoch
    reserved but crashed before its write, or a finished promote) reads
    as empty — the dot-prefixed reservation dirs are invisible to
    partition discovery, and a directory with no data files is
    legitimately 'no registrations', unlike the artifact-kind sniff
    where unreadable must stay loud."""
    from pyspark.errors import AnalysisException

    p = root.rstrip("/") + "/stream_adds"
    try:
        return spark.read.parquet(p)
    except AnalysisException as e:
        msg = str(e)
        if (
            "PATH_NOT_FOUND" in msg
            or "Path does not exist" in msg
            or "UNABLE_TO_INFER_SCHEMA" in msg
            or "Unable to infer schema" in msg
        ):
            return None
        raise


def encode_for_index(
    index,
    rows: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Encode ``rows`` with ``index``'s FROZEN parameters (no training),
    returning rows in the index's own encoded-table schema — the shared
    encode step behind every ``*_index_add`` and the streaming keeper
    registration. Dispatches on the index family: PQ (codebooks), IVFPQ
    (coarse centroids + residual books), OPQ (rotate with the index's
    components, then the inner PQ's codebooks — the featurizer-identity
    discipline: registration MUST use the exact featurizer the index
    serves with)."""
    from .embeddings import OPQIndex, rotate_pandas

    if isinstance(index, OPQIndex):
        rotated = rows.select(
            F.col(id_col),
            rotate_pandas(vec_col, index.components).alias(vec_col),
        )
        return build_pq_index(
            rotated, vec_col, id_col, codebooks=index.pq.codebooks,
            persist=False,
        ).encoded
    if isinstance(index, IVFPQIndex):
        return build_ivfpq_index(
            rows, vec_col, id_col, m=len(index.books),
            trained=(index.coarse, index.books), persist=False,
        ).encoded
    return build_pq_index(
        rows, vec_col, id_col, codebooks=index.codebooks, persist=False,
    ).encoded


def promote_stream_adds(spark, path: str) -> int:
    """Nightly maintenance: fold streaming keeper registrations
    (``<root>/stream_adds/batch=*``) into the base encoded table and
    clear them. Rewrites ``<root>/encoded`` as the id-deduplicated union
    via the two-rename swap (:func:`_swap_dirs`), then deletes the
    stream_adds directory (data dirs AND reservation markers). Returns
    the number of rows added to the base table.

    Self-healing: the id-dedup makes a re-run after ANY crash converge —
    a crash between the swap and the delete leaves rows present in both
    the base and stream_adds (loads serve them twice, which the anti-join
    gate is insensitive to: same neighbor, same score), and the next
    promote collapses them. Id-dedup is safe because encode is
    deterministic under frozen parameters: two registrations of one id
    carry identical rows.

    Single-writer contract (the index family's): run promote only
    BETWEEN stream generations, after the previous run terminated
    cleanly. Promoting under a live checkpoint deletes reservation
    markers a crashed epoch would need — its re-delivery would allocate
    a fresh id and judge against its own promoted keepers, flipping
    mutual within-batch near-dups from kept to dropped."""
    root = path.rstrip("/")
    adds = _stream_adds_df(spark, root)
    if adds is None:
        return 0
    enc_path = root + "/encoded"
    base = spark.read.parquet(enc_path)
    celled = "cell" in base.columns
    if celled:
        base = _read_celled(spark, enc_path)
    n_before = base.count()
    combined = base.unionByName(adds.drop("batch")).dropDuplicates(
        ["neighbor_id"]
    )
    tmp = enc_path + ".tmp"
    if celled:
        combined.repartition("cell").write.mode("overwrite").partitionBy(
            "cell"
        ).parquet(tmp)
    else:
        combined.write.mode("overwrite").parquet(tmp)
    n_after = spark.read.parquet(tmp).count()
    _swap_dirs(enc_path, tmp)
    jvm = spark.sparkContext._jvm
    p = jvm.org.apache.hadoop.fs.Path(root + "/stream_adds")
    fs = p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    fs.delete(p, True)
    return n_after - n_before
