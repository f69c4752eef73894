"""Materialized ANN index: signature/cell as a PARTITION column.

`similarity.lsh_topk` / `ivf_topk` recompute signatures or cells over the
whole table on every query — right for one-shot catalog queries, wrong for
a served index over 10^9 vectors, where the probe should touch only the
probed fraction of storage. This module persists the bucketed layout once:

- ``build_lsh_index``: vectors written partitioned by ``sig`` (bit-packed
  random-hyperplane signature) — one directory per signature value;
- ``build_ivf_index``: vectors partitioned by ``cell`` (nearest-centroid
  id), centroids persisted beside them;

and probe paths that read ONLY the probed partitions: the ``isin`` filter
on the partition column becomes a `PartitionFilters` entry on the parquet
scan (asserted in tests/test_plans.py), so Spark lists and reads just the
probed directories — n_probe/n_cells of the data for IVF, the ≤hamming
signature ball for LSH — instead of scanning everything and filtering.

Layout under ``path``:
    vectors/   parquet, partitioned by sig= / cell=
    meta/      single-row parquet: kind, dim, n_planes|n_cells, seed
    centroids/ (IVF only) parquet: cell_id, centroid array<double>

Everything needed to probe is read back from the index (planes are re-seeded
from meta, centroids from their table), so a probe never needs the original
table — and two clusters probing the same index get identical plans.
Determinism: planes are seeded; centroids come from the passed trainer
(``ivf_centroids_kmeans`` by default — hash-ordered sample, fixed Lloyd
iterations).

The writers ``repartition`` on the partition column first, so each
signature/cell directory holds one file per shuffle partition that owns it
(not one file per input task x value — the small-files explosion).
"""

from __future__ import annotations

from itertools import combinations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F

from sparkocr.pipeline.similarity import (
    N_PLANES,
    _SEED,
    _as_double,
    cosine_expr,
    detect_dim,
    hyperplanes,
    ivf_cell_col,
    ivf_centroids_kmeans,
    lsh_signature_col,
)


def _write_meta(spark: SparkSession, path: str, **kv) -> None:
    spark.createDataFrame([tuple(kv.values())], list(kv.keys())).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/meta")


def _invalidate_meta(spark: SparkSession, path: str) -> None:
    """Delete meta/ BEFORE a rebuild touches vectors/. meta/ is written
    last, so a complete meta marks a complete index: without this, a
    rebuild that dies after overwriting vectors leaves the OLD meta (old
    n_planes/seed) beside NEW vectors — a probe-able inconsistent index
    that silently returns near-zero recall (probe signatures computed in
    a different space than the stored partitions)."""
    from sparkocr.checkpoint import _fs

    _, fs, jpath = _fs(spark, f"{path}/meta")
    fs.delete(jpath, True)  # recursive; False (absent) is fine


def _read_meta(spark: SparkSession, path: str):
    try:
        return spark.read.parquet(f"{path}/meta").first()
    except Exception as e:
        raise ValueError(
            f"no complete ANN index at {path}: meta/ is missing or "
            "unreadable — the build failed mid-way, is still in progress, "
            "or the path is wrong; rebuild the index"
        ) from e


def _check_vectors_nonempty(spark: SparkSession, path: str, builder: str) -> None:
    """partitionBy over zero rows writes only _SUCCESS: a probe would
    later die with an opaque UNABLE_TO_INFER_SCHEMA — fail loudly at
    build time instead. Detected AFTER the write (a footer-only driver
    read), not with a pre-write isEmpty(), which is an extra action
    recomputing the whole upstream DAG just to improve an error message.
    Only the schema-inference signature is relabelled as empty input; any
    other read failure (FS, permissions, corruption) propagates as-is."""
    try:
        spark.read.parquet(f"{path}/vectors")
    except Exception as e:
        if "UNABLE_TO_INFER_SCHEMA" in str(e):
            raise ValueError(
                f"{builder}: input table has no rows — nothing was indexed"
            ) from e
        raise


def build_lsh_index(
    emb: DataFrame,
    path: str,
    n_planes: int = N_PLANES,
    seed: int = _SEED,
    dim: int | None = None,
) -> None:
    """Materialize ``emb`` partitioned by LSH signature at ``path``."""
    if dim is None:
        dim = detect_dim(emb)
    planes = hyperplanes(dim, n_planes, seed)
    spark = emb.sparkSession
    _invalidate_meta(spark, path)  # meta last: no probe-able half-index
    sigged = emb.withColumn("sig", lsh_signature_col(F.col("embedding"), planes))
    sigged.repartition("sig").write.mode("overwrite").partitionBy("sig").parquet(
        f"{path}/vectors"
    )
    _check_vectors_nonempty(spark, path, "build_lsh_index")
    _write_meta(spark, path, kind="lsh", dim=dim, n_planes=n_planes, seed=seed)


def _sig_ball(qsig: int, n_planes: int, hamming: int) -> list[int]:
    """All signatures within ``hamming`` bit flips of ``qsig`` —
    1 + C(n,1) + ... + C(n,hamming) values (79 at n=12, h=2)."""
    out = [qsig]
    for h in range(1, hamming + 1):
        for bits in combinations(range(n_planes), h):
            s = qsig
            for b in bits:
                s ^= 1 << b
            out.append(s)
    return out


def lsh_topk_indexed(
    spark: SparkSession,
    path: str,
    query: list[float],
    k: int = 10,
    hamming: int = 2,
) -> DataFrame:
    """Probe a materialized LSH index: exact cosine inside the signature
    ball, reading ONLY the matching sig= partitions (partition pruning —
    the scan never touches the other directories)."""
    m = _read_meta(spark, path)
    if m["kind"] != "lsh":
        raise ValueError(f"index at {path} is kind={m['kind']}, expected lsh")
    if len(query) != m["dim"]:
        # same caller bug ivf_topk names: without this the probe dies in
        # np.dot with an opaque shapes-not-aligned error
        raise ValueError(
            f"lsh_topk_indexed: query dim {len(query)} != index dim {m['dim']}"
        )
    planes = hyperplanes(m["dim"], m["n_planes"], m["seed"])
    qv = np.asarray(query, dtype=float)
    qsig = 0
    for i, p in enumerate(planes):
        if float(np.dot(qv, p)) > 0:
            qsig |= 1 << i
    probe_sigs = _sig_ball(qsig, m["n_planes"], hamming)
    # size==dim mirrors lsh_topk: null / wrong-dim rows are zero-filled
    # into sig 0 at build, so a ball containing 0 would surface them as
    # null-cosine junk whenever k exceeds the real match count
    vecs = spark.read.parquet(f"{path}/vectors").filter(
        F.col("sig").isin(probe_sigs) & (F.size("embedding") == int(m["dim"]))
    )
    q = F.array(*[F.lit(float(v)) for v in query])
    return (
        vecs.select(
            "vec_id",
            F.round(cosine_expr(_as_double(F.col("embedding")), q), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(k)
    )


def build_ivf_index(
    emb: DataFrame,
    path: str,
    n_cells: int = 16,
    trainer=ivf_centroids_kmeans,
) -> None:
    """Materialize ``emb`` partitioned by IVF cell at ``path``; centroids
    (from ``trainer(emb, n_cells)``) are persisted so probes replay the
    exact assignment."""
    cents = np.asarray(trainer(emb, n_cells), dtype=np.float64)
    spark = emb.sparkSession
    _invalidate_meta(spark, path)  # meta last: no probe-able half-index
    celled = emb.withColumn("cell", ivf_cell_col(F.col("embedding"), cents))
    celled.repartition("cell").write.mode("overwrite").partitionBy("cell").parquet(
        f"{path}/vectors"
    )
    # the default trainer rejects an empty table before anything is
    # written, but a custom trainer with precomputed centroids would
    # otherwise build a complete, probe-crashing empty index
    _check_vectors_nonempty(spark, path, "build_ivf_index")
    cent_rows = [(int(i), [float(v) for v in c]) for i, c in enumerate(cents)]
    spark.createDataFrame(cent_rows, "cell_id int, centroid array<double>").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{path}/centroids")
    _write_meta(spark, path, kind="ivf", dim=int(cents.shape[1]), n_cells=len(cents))


def ivf_topk_indexed(
    spark: SparkSession,
    path: str,
    query: list[float],
    k: int = 10,
    n_probe: int = 4,
) -> DataFrame:
    """Probe a materialized IVF index: exact cosine inside the ``n_probe``
    cells nearest the query, reading ONLY those cell= partitions."""
    m = _read_meta(spark, path)
    if m["kind"] != "ivf":
        raise ValueError(f"index at {path} is kind={m['kind']}, expected ivf")
    if len(query) != m["dim"]:
        raise ValueError(
            f"ivf_topk_indexed: query dim {len(query)} != index dim {m['dim']}"
        )
    cent_rows = spark.read.parquet(f"{path}/centroids").orderBy("cell_id").collect()
    cents = np.asarray([r["centroid"] for r in cent_rows], dtype=np.float64)
    qv = np.asarray(query, dtype=np.float64)
    d = ((cents - qv[None, :]) ** 2).sum(axis=1)
    probe = [int(i) for i in np.argsort(d, kind="stable")[:n_probe]]
    # same size==dim restriction ivf_topk applies: zero-filled null /
    # wrong-dim rows got a garbage cell at build time and would surface
    # as null-cosine rows whenever k exceeds the matching-row count —
    # without it the indexed and recompute probes diverge on dirty tables
    vecs = spark.read.parquet(f"{path}/vectors").filter(
        F.col("cell").isin(probe) & (F.size("embedding") == int(m["dim"]))
    )
    q = F.array(*[F.lit(float(v)) for v in query])
    return (
        vecs.select(
            "vec_id",
            F.round(cosine_expr(_as_double(F.col("embedding")), q), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(k)
    )
