"""Persisted IVF-PQ ANN index: build once, probe many.

The inline ANN queries (queries/llm_similarity.emb_ivf_ann_topk,
queries/llm_extra.emb_ivf_pq_topk) recompute centroids, assignments, PQ
codes, and lookup tables inside every query — correct for oracle checks,
wrong for serving: a production corpus builds its index in one O(corpus)
job and then answers every probe from the stored artifact. This operator
persists exactly the IVF-PQ memory layout (FAISS-IVFPQ shape) under the
same versioned-manifest commit protocol as the state store:

- ``centroids``   (cid, ce, cn)            — coarse quantizer, tiny,
  broadcast at probe time;
- ``codebook``    (s, pqcid, csub)         — PQ codewords per subspace,
  tiny, broadcast to score query subvectors into a per-query ADC LUT;
- ``cells``       (cid, vec_id, s, pqcid)  — the corpus as 8 small ints
  per vector (the ~32x memory cut), **partitioned by cell id**: a probe
  reads ONLY its nprobe cells' directories (partition pruning is the
  disk-level analogue of IVF candidate pruning).

Commit protocol (mirrors streaming/statestore.py, via pgcdc_spark/fs.py
so the index root may be local or an HDFS/file: URI): each build writes a
fresh ``v-<label>-<uuid8>/`` version dir holding the three tables, then
atomically swaps the one-line ``_CURRENT`` manifest; readers always see a
complete index, rebuilds never mutate a live version, and superseded
versions are GC'd (previous kept as escape hatch).

Scale: build is the same jobs the inline query runs (broadcast centroid
scoring, one argmin shuffle for codes, one co-partitioned write); probe
is O(nprobe cells + LUT) — centroids/codebook/LUT/probe-list all
broadcast, the only scan is the pruned cells read, the only shuffle the
(qid, vec_id) ADC aggregate. Determinism: the quantizer stand-ins are
fixed rules (vec_id mod 53 / mod 127), doubles round-trip parquet
exactly, and the ADC sum is exact decimal — probe-from-artifact is
bit-identical to the inline plan (pinned in tests/test_operators.py).
"""

from __future__ import annotations

import os
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..fs import get_fs

_MANIFEST = "_CURRENT"
_KEEP_VERSIONS = 2
_TABLES = ("centroids", "codebook", "cells")


class AnnIndex:
    """Versioned on-disk IVF-PQ index under ``root``."""

    def __init__(self, root: str) -> None:
        self.root = root
        self._fs = None

    @property
    def fs(self):
        if self._fs is None:
            self._fs = get_fs(self.root)
        return self._fs

    # -- manifest (same pointer-swap protocol as statestore) -----------------

    def current_version(self) -> str | None:
        try:
            name = self.fs.read_text(os.path.join(self.root, _MANIFEST)).strip()
        except FileNotFoundError:
            return None
        return name or None

    def table_path(self, table: str, version: str | None = None) -> str:
        v = version or self.current_version()
        if v is None:
            raise FileNotFoundError(f"no committed index under {self.root}")
        return os.path.join(self.root, v, table)

    def _publish(self, version: str) -> None:
        self.fs.write_text_atomic(os.path.join(self.root, _MANIFEST), version + "\n")
        live = version
        dirs = [
            d for d in self.fs.listdir(self.root)
            if d.startswith("v-") and d != live
            and self.fs.is_dir(os.path.join(self.root, d))
        ]
        dirs.sort(key=lambda d: self.fs.mtime(os.path.join(self.root, d)))
        for d in dirs[: max(0, len(dirs) - (_KEEP_VERSIONS - 1))]:
            self.fs.delete(os.path.join(self.root, d))

    # -- build ----------------------------------------------------------------

    def build(self, emb: DataFrame, label: str = "build") -> str:
        """One O(corpus) indexing job: coarse-assign every vector, PQ-encode
        it, and commit the three tables as a fresh version.

        ``emb`` must have (vec_id: long, embedding: array<float|double>).
        """
        from ..queries.llm_extra import _PQ_CB_MOD, _PQ_M, _PQ_SUB, pq_codes
        from ..queries.llm_similarity import ivf_centroids, nearest_cells
        from ..functions.vectors import norm_fold_expr

        base = emb.select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("e"),
            norm_fold_expr("embedding", cast=True).alias("n"),
        )
        cent = ivf_centroids(base)  # (cid, ce, cn)
        asg = nearest_cells(base, cent, "vec_id", 1).select("vec_id", "cid")
        codes = pq_codes(emb, "pqcid")  # (vec_id, s, pqcid)
        # co-locate codes with their cell: the serving layout is
        # (cell -> member codes); one shuffle on vec_id here buys
        # shuffle-free pruned probes forever after
        cells = asg.join(codes, "vec_id").select("cid", "vec_id", "s", "pqcid")
        codebook = emb.filter(F.col("vec_id") % _PQ_CB_MOD == 1).select(
            F.col("vec_id").alias("pqcid"),
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, {_PQ_M - 1}),"
                    f" s -> slice(CAST(embedding AS ARRAY<DOUBLE>),"
                    f" s * {_PQ_SUB} + 1, {_PQ_SUB}))"
                )
            ).alias("s", "csub"),
        ).select("s", "pqcid", "csub")

        version = f"v-{label}-{uuid.uuid4().hex[:8]}"
        vdir = os.path.join(self.root, version)
        cent.write.parquet(os.path.join(vdir, "centroids"))
        codebook.write.parquet(os.path.join(vdir, "codebook"))
        cells.write.partitionBy("cid").parquet(os.path.join(vdir, "cells"))
        self._publish(version)
        return version

    # -- probe ----------------------------------------------------------------

    def probe(
        self, spark: SparkSession, queries: DataFrame,
        nprobe: int = 2, k: int = 10,
    ) -> DataFrame:
        """Top-k neighbors per query from the stored index, never touching
        a float corpus vector.

        ``queries``: (qid: long, e: array<double>). Reads ONLY the probed
        cells' partitions (driver-side list bounded by
        |queries| * nprobe); broadcasts centroids, the probe list, and the
        per-query ADC LUT. Self-matches (vec_id == qid) are excluded,
        mirroring the inline query."""
        from ..queries.llm_extra import _PQ_M, _PQ_SUB, _sub_d2
        from ..queries.llm_similarity import nearest_cells
        from ..functions.vectors import norm_fold_expr

        cent = spark.read.parquet(self.table_path("centroids"))
        q = queries.select(
            "qid", "e", norm_fold_expr("e", cast=False).alias("n")
        )
        probe = nearest_cells(q, cent, "qid", nprobe).select("qid", "cid")
        probed = sorted(r[0] for r in probe.select("cid").distinct().collect())
        if not probed:
            return spark.createDataFrame(
                [], "qid long, neighbor_id long, approx_dist2 double, rank int"
            )
        cells_root = self.table_path("cells")
        cells = spark.read.option("basePath", cells_root).parquet(
            *[os.path.join(cells_root, f"cid={c}") for c in probed]
        )
        # per-query ADC lookup table: query subvectors x stored codebook
        q_subs = queries.select(
            "qid",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, {_PQ_M - 1}),"
                    f" s -> slice(e, s * {_PQ_SUB} + 1, {_PQ_SUB}))"
                )
            ).alias("s", "sub"),
        )
        codebook = spark.read.parquet(self.table_path("codebook"))
        lut = q_subs.join(F.broadcast(codebook), "s").select(
            "qid", "s", "pqcid", _sub_d2("sub", "csub").alias("d2")
        )
        adc = (
            cells.join(F.broadcast(probe), "cid")
            .filter(F.col("vec_id") != F.col("qid"))
            .join(F.broadcast(lut), ["qid", "s", "pqcid"])
            .groupBy("qid", "vec_id")
            .agg(
                F.sum(F.col("d2").cast("decimal(28,9)")).cast("double")
                .alias("approx_dist2")
            )
        )
        w = Window.partitionBy("qid").orderBy("approx_dist2", "vec_id")
        return (
            adc.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", F.col("vec_id").alias("neighbor_id"),
                    "approx_dist2", "rank")
        )
