"""Persisted IVF-PQ ANN index: build once, probe many, APPEND incrementally.

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
fresh ``v-<label>-<uuid8>/`` version dir holding its tables plus a
``_META`` manifest, then atomically swaps the one-line ``_CURRENT``
pointer; readers always see a complete index, rebuilds never mutate a
live version, and unreferenced versions are GC'd (previous tip's closure
kept as escape hatch).

Incremental maintenance (``append``): a production corpus appends
embeddings continuously; re-running the O(corpus) build per batch would
be quadratic. ``append`` is the FAISS ``add``/``remove_ids`` shape —
the coarse quantizer and PQ codebook are FROZEN at build time (k-means
is trained once, additions are encoded against the trained quantizer),
so an append only (a) assigns + PQ-encodes the NEW vectors (O(batch)
broadcast jobs), (b) rewrites the TOUCHED ``cid=`` partitions (old
members minus upserted/deleted ids, plus the delta) into the new
version, and (c) inherits every untouched cell BY REFERENCE through the
``_META`` cellmap — untouched partitions are never read, rewritten, or
copied (their files stay byte-identical in the owning version; pinned in
tests/test_operators.py). This is the touched-buckets-only pattern of
streaming/statestore.py applied to IVF cell partitions. Deletes are
handled the same way: the deleted vector's frozen-quantizer assignment
names its cell, so a tombstone costs one touched-partition rewrite, not
a corpus scan.

Scale: build is the same jobs the inline query runs (broadcast centroid
scoring, one argmin shuffle for codes, one co-partitioned write); append
is O(batch + touched cells); probe is O(nprobe cells + LUT) —
centroids/codebook/LUT/probe-list all broadcast, the only scan is the
pruned cells read, the only shuffle the (qid, vec_id) ADC aggregate.
Determinism: the quantizer stand-ins are fixed rules (vec_id mod 53 /
mod 127), doubles round-trip parquet exactly, and the ADC sum is exact
decimal — probe-from-artifact is bit-identical to the inline plan, and
append-then-probe is bit-identical to a full rebuild over base+delta
(both pinned in tests/test_operators.py).
"""

from __future__ import annotations

import json
import os
import uuid
from collections import defaultdict
from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..fs import get_fs

_MANIFEST = "_CURRENT"
_META = "_META"
# Replay gate: recently applied maintenance labels ride in the version
# manifest (bounded window, statestore discipline) — the manifest swap is
# atomic, so a label is recorded iff its batch's state is visible, which
# makes micro-batch replays exact no-ops.
_APPLIED_WINDOW = 64


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

    def meta(self, version: str | None = None) -> dict:
        """The version's manifest: which version owns the quantizer tables
        and, per cell id, which version owns its current partition. One
        small JSON read resolves every path — no directory walking, no
        chain traversal at probe time."""
        v = version or self.current_version()
        if v is None:
            raise FileNotFoundError(f"no committed index under {self.root}")
        raw = self.fs.read_text(os.path.join(self.root, v, _META))
        m = json.loads(raw)
        m["version"] = v
        return m

    def table_path(self, table: str, version: str | None = None) -> str:
        """Path of a quantizer table (``centroids``/``codebook``) resolved
        through the manifest. ``cells`` is only resolvable when a single
        version owns every cell (fresh build) — appended indexes span
        versions and must go through ``meta()['cellmap']``."""
        m = self.meta(version)
        if table in ("centroids", "codebook"):
            return os.path.join(self.root, m[table], table)
        owners = set(m["cellmap"].values())
        if len(owners) > 1:
            raise ValueError(
                f"cells span versions {sorted(owners)}; resolve via meta()"
            )
        return os.path.join(self.root, owners.pop(), "cells")

    def _cell_dirs(self, version: str) -> list[str]:
        cells = os.path.join(self.root, version, "cells")
        if not self.fs.is_dir(cells):
            return []
        return sorted(
            d.split("=", 1)[1]
            for d in self.fs.listdir(cells)
            if d.startswith("cid=")
        )

    def _closure(self, version: str) -> set[str]:
        """Every version dir the given tip still references."""
        try:
            m = self.meta(version)
        except FileNotFoundError:
            return {version}
        return (
            {version, m["centroids"], m["codebook"]}
            | set(m["cellmap"].values())
        )

    def _publish(self, version: str) -> None:
        prev = self.current_version()
        self.fs.write_text_atomic(os.path.join(self.root, _MANIFEST), version + "\n")
        # GC: drop version dirs referenced by NEITHER the new tip's closure
        # nor the previous tip's (the previous tip is the escape hatch —
        # repointing _CURRENT at it must yield a complete index).
        live = self._closure(version)
        if prev is not None:
            live |= self._closure(prev)
        for d in self.fs.listdir(self.root):
            if (
                d.startswith("v-") and d not in live
                and self.fs.is_dir(os.path.join(self.root, d))
            ):
                self.fs.delete(os.path.join(self.root, d))

    # -- build ----------------------------------------------------------------

    def build(self, emb: DataFrame, label: str = "build") -> str:
        """One O(corpus) indexing job: train the quantizer (deterministic
        stand-in rules), coarse-assign every vector, PQ-encode it, and
        commit the tables as a fresh self-contained version.

        ``emb`` must have (vec_id: long, embedding: array<float|double>).
        """
        from ..functions.vectors import norm_fold_expr
        from ..queries.llm_extra import _PQ_CB_MOD, _PQ_M, _PQ_SUB, pq_codes
        from ..queries.llm_similarity import ivf_centroids, nearest_cells

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
        meta = {
            "base": None,
            "centroids": version,
            "codebook": version,
            # the manifest IS the invlist directory: probes intersect with
            # it instead of trusting partition dirs to exist (an empty or
            # never-populated cell is simply absent here)
            "cellmap": {c: version for c in self._cell_dirs(version)},
            "applied": [label],
        }
        self.fs.write_text_atomic(
            os.path.join(vdir, _META), json.dumps(meta, sort_keys=True)
        )
        self._publish(version)
        return version

    # -- incremental append / delete ------------------------------------------

    def append(
        self,
        new_emb: DataFrame | None,
        deletes: DataFrame | None = None,
        label: str = "append",
    ) -> str:
        """Incremental maintenance: O(batch + touched cells), never
        O(corpus).

        ``new_emb`` (vec_id, embedding) rows are assigned and PQ-encoded
        against the index's FROZEN quantizer (centroids + codebook read
        from the current version — k-means is trained once; FAISS ``add``
        semantics). ``deletes`` (vec_id, embedding) rows are tombstoned:
        the frozen assignment of the embedding names the one cell that
        holds the vector, so a delete is a touched-partition rewrite, not
        a scan. A vec_id present in ``new_emb`` that already exists is an
        UPSERT (old row dropped from its cell, new encoding written).

        Only the touched ``cid=`` partitions are rewritten into the new
        version; every other cell is inherited by reference through the
        cellmap — its files in the owning version are not even opened.
        """
        from ..functions.vectors import norm_fold_expr
        from ..queries.llm_extra import _PQ_M, _PQ_SUB, _pq_codes_from, _sub_d2
        from ..queries.llm_similarity import nearest_cells

        if new_emb is None and deletes is None:
            raise ValueError("append needs new_emb and/or deletes")
        spark = (new_emb if new_emb is not None else deletes).sparkSession
        m = self.meta()
        if label in m.get("applied", []):
            return m["version"]  # replayed micro-batch: exact no-op
        cent = spark.read.parquet(
            os.path.join(self.root, m["centroids"], "centroids")
        )
        codebook = spark.read.parquet(
            os.path.join(self.root, m["codebook"], "codebook")
        )

        def _assign(emb: DataFrame) -> DataFrame:
            base = emb.select(
                "vec_id",
                F.col("embedding").cast("array<double>").alias("e"),
                norm_fold_expr("embedding", cast=True).alias("n"),
            )
            return nearest_cells(base, cent, "vec_id", 1).select("vec_id", "cid")

        changed_ids = []  # DataFrames of vec_id to drop from old partitions
        touched: set[int] = set()
        delta_cells = None
        if new_emb is not None:
            asg = _assign(new_emb)
            # encode against the STORED codebook (frozen), not donors drawn
            # from the batch — identical d2 folds and argmin tie-break as
            # pq_codes, so append == rebuild bit-for-bit
            subs = new_emb.select(
                "vec_id",
                F.posexplode(
                    F.expr(
                        f"transform(sequence(0, {_PQ_M - 1}),"
                        f" s -> slice(CAST(embedding AS ARRAY<DOUBLE>),"
                        f" s * {_PQ_SUB} + 1, {_PQ_SUB}))"
                    )
                ).alias("s", "sub"),
            )
            dist = subs.join(F.broadcast(codebook), "s").select(
                "vec_id", "s", "pqcid", _sub_d2("sub", "csub").alias("d2")
            )
            codes = _pq_codes_from(dist, "pqcid")
            delta_cells = asg.join(codes, "vec_id").select(
                "cid", "vec_id", "s", "pqcid"
            )
            # O(n_cells) driver metadata: which partitions does this batch
            # touch (the statestore touched-buckets list)
            touched |= {r[0] for r in asg.select("cid").distinct().collect()}
            changed_ids.append(asg.select("vec_id"))
        if deletes is not None:
            dasg = _assign(deletes)
            # a tombstone only touches a cell the index actually holds
            dcells = {r[0] for r in dasg.select("cid").distinct().collect()}
            touched |= {c for c in dcells if str(c) in m["cellmap"]}
            changed_ids.append(dasg.select("vec_id"))

        # old rows of touched partitions only — resolved through the
        # cellmap, read per owning version so partition-column recovery
        # (basePath) stays exact; cells the batch creates from scratch
        # have no old rows to read
        old_touched = self._read_cells(
            spark, m, [c for c in sorted(touched) if str(c) in m["cellmap"]]
        )
        changed = reduce(DataFrame.unionByName, changed_ids).distinct()
        parts = []
        if old_touched is not None:
            parts.append(old_touched.join(changed, "vec_id", "left_anti"))
        if delta_cells is not None:
            parts.append(delta_cells)
        if not parts:  # delete-only batch aimed at cells the index lacks
            parts = [spark.createDataFrame(
                [], "cid long, vec_id long, s int, pqcid long"
            )]
        merged = reduce(DataFrame.unionByName, parts).select(
            "cid", "vec_id", "s", "pqcid"
        )

        version = f"v-{label}-{uuid.uuid4().hex[:8]}"
        vdir = os.path.join(self.root, version)
        merged.write.partitionBy("cid").parquet(os.path.join(vdir, "cells"))
        cellmap = dict(m["cellmap"])
        for c in touched:
            cellmap.pop(str(c), None)  # a fully-tombstoned cell vanishes
        for c in self._cell_dirs(version):
            cellmap[c] = version
        meta = {
            "base": m["version"],
            "centroids": m["centroids"],
            "codebook": m["codebook"],
            "cellmap": cellmap,
            "applied": (m.get("applied", []) + [label])[-_APPLIED_WINDOW:],
        }
        self.fs.write_text_atomic(
            os.path.join(vdir, _META), json.dumps(meta, sort_keys=True)
        )
        self._publish(version)
        return version

    # -- compaction -----------------------------------------------------------

    def compact(self, spark: SparkSession, label: str = "compact") -> str:
        """Fold the version chain: rewrite every LIVE cell partition into
        one self-contained version so long append histories stop spanning
        many small per-version layers (the LSM fold of the statestore,
        applied to cells). O(live state) read + one partitioned write —
        codes are MOVED, never recomputed; the frozen quantizer tables
        stay referenced in their owning version. After the next publish
        cycle, superseded delta versions leave the GC closure and are
        dropped."""
        m = self.meta()
        if label in m.get("applied", []):
            return m["version"]
        cids = sorted(int(c) for c in m["cellmap"])
        version = f"v-{label}-{uuid.uuid4().hex[:8]}"
        vdir = os.path.join(self.root, version)
        live = self._read_cells(spark, m, cids)
        if live is not None:
            live.select("cid", "vec_id", "s", "pqcid").write.partitionBy(
                "cid"
            ).parquet(os.path.join(vdir, "cells"))
        meta = {
            "base": m["version"],
            "centroids": m["centroids"],
            "codebook": m["codebook"],
            "cellmap": {c: version for c in self._cell_dirs(version)},
            "applied": (m.get("applied", []) + [label])[-_APPLIED_WINDOW:],
        }
        self.fs.write_text_atomic(
            os.path.join(vdir, _META), json.dumps(meta, sort_keys=True)
        )
        self._publish(version)
        return version

    # -- probe ----------------------------------------------------------------

    def _read_cells(
        self, spark: SparkSession, m: dict, cids: list[int]
    ) -> DataFrame | None:
        """The (cid, vec_id, s, pqcid) rows of exactly the given cells,
        resolved through the cellmap — reads only those partitions' files,
        grouped per owning version so basePath partition recovery is exact."""
        by_version: dict[str, list] = defaultdict(list)
        for c in cids:
            by_version[m["cellmap"][str(c)]].append(c)
        parts = []
        for v, cs in sorted(by_version.items()):
            croot = os.path.join(self.root, v, "cells")
            parts.append(
                spark.read.option("basePath", croot).parquet(
                    *[os.path.join(croot, f"cid={c}") for c in sorted(cs)]
                )
            )
        if not parts:
            return None
        return reduce(DataFrame.unionByName, parts)

    def probe(
        self, spark: SparkSession, queries: DataFrame,
        nprobe: int = 2, k: int = 10, version: str | None = None,
    ) -> DataFrame:
        """Top-k neighbors per query from the stored index, never touching
        a float corpus vector.

        ``queries``: (qid: long, e: array<double>). Reads ONLY the probed
        cells' partitions (driver-side list bounded by
        |queries| * nprobe, intersected with the manifest's live-cell map
        so empty/absent cells contribute nothing instead of failing);
        broadcasts centroids, the probe list, and the per-query ADC LUT.
        Self-matches (vec_id == qid) are excluded, mirroring the inline
        query."""
        from ..functions.vectors import norm_fold_expr
        from ..queries.llm_extra import _PQ_M, _PQ_SUB, _sub_d2

        from ..queries.llm_similarity import nearest_cells

        # version=None probes the tip; a retained older tip (the GC keeps
        # the previous tip's closure) may be probed for time travel
        m = self.meta(version)
        cent = spark.read.parquet(
            os.path.join(self.root, m["centroids"], "centroids")
        )
        q = queries.select(
            "qid", "e", norm_fold_expr("e", cast=False).alias("n")
        )
        probe = nearest_cells(q, cent, "qid", nprobe).select("qid", "cid")
        probed = sorted(
            c for (c,) in probe.select("cid").distinct().collect()
            if str(c) in m["cellmap"]
        )
        cells = self._read_cells(spark, m, probed)
        if cells is None:
            return spark.createDataFrame(
                [], "qid long, neighbor_id long, approx_dist2 double, rank int"
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
        codebook = spark.read.parquet(
            os.path.join(self.root, m["codebook"], "codebook")
        )
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
