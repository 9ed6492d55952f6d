#!/usr/bin/env python
"""Scale the driver's sf0.1 corpus up Nx (default 10x -> "sf1") by
key-remapped replication, for scale-curve measurement (SCALE_SF1.json).

The driver's generator is not available, so sf1 is synthesized from
sf0.1 itself: N replicas of every scaling table, each replica's keys
offset by r * key_range so referential integrity holds WITHIN a replica
(replica r's lineitems reference replica r's orders/parts/suppliers).
This preserves exactly the properties a scale measurement needs:

- value distributions, string content, and key skew are byte-identical
  to the driver's corpus;
- per-key join fan-out is CONSTANT across scale (distinct keys grow Nx,
  rows-per-key stay fixed) — the TPC-H scaling model;
- region/nation stay fixed (non-scaling dimensions, as in TPC-H);
- events extend the TIME AXIS (replica r shifted by r*31 days): stream
  density per window is constant, the number of windows grows Nx;
- documents get a replica-keyed injective word substitution
  (w -> w~r for ~1/3 of the vocabulary, position-independent): texts
  that are exact/near duplicates WITHIN a replica remain exactly as
  duplicated (an injective word map preserves shingle-set Jaccard),
  while cross-replica 5-gram Jaccard collapses to ~(4/9)^5 ≈ 2% — so
  the dup rate per corpus is constant across scale instead of every
  doc acquiring N-1 artificial twins;
- embeddings get a replica-specific ORTHOGONAL ROTATION (Q_r from a
  seeded Gaussian QR; Q_0 = I): all pairwise cosines within a replica
  are preserved EXACTLY (ANN/k-means/semantic-dedup structure
  replicates), while cross-replica cosines drop to ~N(0, 1/64);
  labels offset per replica so cluster identities stay distinct.

Usage: python scripts/make_sf1.py [out_dir] [n_replicas] [table ...]
Defaults: out_dir=/root/repo/testdata_sf1, n_replicas=10, all tables.
Naming TABLES writes only those (plus the non-scaling dims) — the
"sf10" second decade (n_replicas=100) only needs documents+embeddings
for the ANN/dedup/CC exponent measurement, not 60M lineitems.
Replicas stream to the ParquetWriter one at a time, so peak memory is
one replica regardless of n. Deterministic (seeded); never touches
/root/testdata.
"""
from __future__ import annotations

import os
import sys
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

# key column -> its dense range at sf0.1 (offsets are r * range)
KEY_RANGES = {
    "c_custkey": 15_000, "o_custkey": 15_000,
    "s_suppkey": 1_000, "l_suppkey": 1_000,
    "p_partkey": 20_000, "l_partkey": 20_000,
    "o_orderkey": 150_000, "l_orderkey": 150_000,
    "event_id": 100_000, "user_id": 1_500,
    "doc_id": 5_000, "vec_id": 2_000,
}
NAME_COLS = {  # regenerated from the offset key so names stay key-derived
    "c_name": ("c_custkey", "Customer#{:09d}"),
    "s_name": ("s_suppkey", "Supplier#{:09d}"),
}
EVENTS_SHIFT_US = 31 * 24 * 3600 * 1_000_000  # 31 days, > the 30-day span


def _sub_word(w: str, r: int) -> str:
    return f"{w}~{r}" if zlib.crc32(f"{w}|{r}".encode()) % 3 == 0 else w


def _perturb_texts(texts: list[str], r: int) -> list[str]:
    cache: dict[str, str] = {}

    def f(w: str) -> str:
        out = cache.get(w)
        if out is None:
            out = cache[w] = _sub_word(w, r)
        return out

    return [" ".join(f(w) for w in t.split(" ")) for t in texts]


def _rotation(dim: int, r: int) -> np.ndarray:
    if r == 0:
        return np.eye(dim, dtype=np.float64)
    g = np.random.default_rng(1000 + r).standard_normal((dim, dim))
    q, rr = np.linalg.qr(g)
    return q * np.sign(np.diag(rr))  # sign-fix: a proper orthonormal Q


def _replica(name: str, tbl: pa.Table, r: int) -> pa.Table:
    cols = {c: tbl.column(c) for c in tbl.column_names}
    for c, rng in KEY_RANGES.items():
        if c in cols and r > 0:
            cols[c] = pc.add(cols[c], pa.scalar(r * rng, type=pa.int64()))
    for c, (keycol, fmt) in NAME_COLS.items():
        if c in cols and r > 0:
            keys = cols[keycol].to_numpy()
            cols[c] = pa.array([fmt.format(k) for k in keys], type=pa.string())
    if name == "events" and r > 0:
        shifted = pc.add(cols["ts"].cast(pa.int64()),
                         pa.scalar(r * EVENTS_SHIFT_US, type=pa.int64()))
        cols["ts"] = shifted.cast(pa.timestamp("us"))
    if name == "documents" and r > 0:
        texts = _perturb_texts(
            [t.as_py() for chunk in cols["text"].chunks for t in chunk], r)
        cols["text"] = pa.array(texts, type=pa.string())
        cols["n_chars"] = pa.array([len(t) for t in texts], type=pa.int64())
    if name == "embeddings":
        vecs = np.stack([np.asarray(v, dtype=np.float64)
                         for v in tbl.column("embedding").to_pylist()])
        rot = (vecs @ _rotation(vecs.shape[1], r).T).astype(np.float32)
        cols["embedding"] = pa.array(list(rot), type=pa.list_(pa.float32()))
        if r > 0:
            cols["label"] = pc.add(
                cols["label"].cast(pa.int32()),
                pa.scalar(r * 10, type=pa.int32())).cast(pa.int32())
    arrays, fields = [], []
    for f in tbl.schema:
        col = cols[f.name]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        arrays.append(col.cast(f.type))
        fields.append(f)
    return pa.Table.from_arrays(arrays, schema=pa.schema(fields))


ALL_TABLES = ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    subset = sys.argv[3:] or ALL_TABLES
    unknown = set(subset) - set(ALL_TABLES)
    if unknown:
        sys.exit(f"unknown table(s) {sorted(unknown)}; "
                 f"choose from {ALL_TABLES}")
    os.makedirs(out_dir, exist_ok=True)
    for name in ALL_TABLES:
        if name not in subset and name not in ("region", "nation"):
            continue
        src = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
        dst = os.path.join(out_dir, f"{name}.parquet")
        if name in ("region", "nation"):
            pq.write_table(src, dst, compression="snappy")
            n_rows = src.num_rows
        else:
            writer, n_rows = None, 0
            try:
                for r in range(n):
                    rep = _replica(name, src, r)
                    if writer is None:
                        writer = pq.ParquetWriter(
                            dst, rep.schema, compression="snappy")
                    writer.write_table(rep, row_group_size=131_072)
                    n_rows += rep.num_rows
            finally:
                if writer is not None:
                    writer.close()
        print(f"{name}: {src.num_rows} -> {n_rows} rows "
              f"({os.path.getsize(dst) / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
