"""Local replica of the driver's DuckDB-oracle correctness check.

The driver (see __spark_entry__.py docstring) runs each registered Spark
query and its oracle SQL side-by-side and compares row-count + schema +
order-insensitive value hash. This module reproduces that comparison so
parity bugs surface in `pytest` before a round ends.

Comparison is EXACT (bit-level for floats after canonicalization): the
engine's parity discipline (pgcdc_spark/queries/__init__.py docstring)
makes both sides compute identical doubles, so nothing weaker is needed.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import duckdb
import pandas as pd

from .catalog import TABLES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_obj(v) -> str:
    import datetime

    if v is None:
        return "<null>"
    if isinstance(v, float) and math.isnan(v):
        return "<null>"
    if isinstance(v, pd.Timestamp):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, datetime.date):
        return f"{v.isoformat()} 00:00:00.000000"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_obj(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif s.dtype == object:
            df[c] = s.map(_canon_obj)
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


@dataclass
class ParityResult:
    name: str
    ok: bool
    detail: str = ""


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> ParityResult:
    s_cols, d_cols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if s_cols != d_cols:
        return ParityResult(name, False, f"schema mismatch: spark={s_cols} duck={d_cols}")
    if len(spark_pdf) != len(duck_pdf):
        return ParityResult(name, False, f"rowcount: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    a, b = _canon(spark_pdf), _canon(duck_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) and pd.api.types.is_float_dtype(bv):
            eq = (av == bv) | (av.isna() & bv.isna())
            if not eq.all():
                i = int((~eq).idxmax())
                worst = float(abs(av - bv).max())
                return ParityResult(
                    name,
                    False,
                    f"float col {c} differs (maxabs={worst:.3e}) e.g. row {i}: "
                    f"{av[i]!r} vs {bv[i]!r}",
                )
        else:
            if not av.astype(str).equals(bv.astype(str)):
                diff = av.astype(str) != bv.astype(str)
                i = int(diff.idxmax())
                return ParityResult(
                    name, False, f"col {c} differs e.g. row {i}: {av[i]!r} vs {bv[i]!r}"
                )
    if len(a) == 0:
        return ParityResult(name, True, "ok (0 rows — weak)")
    return ParityResult(name, True, f"ok ({len(a)} rows)")


def run_parity(spark, sf_dir: str, names: list[str] | None = None) -> list[ParityResult]:
    from .queries import all_queries

    from .cache import release_shared

    qs = all_queries()
    con = duck_connect(sf_dir)
    results = []
    for qname, qd in qs.items():
        if names and qname not in names:
            continue
        if qd.oracle is None:
            continue
        try:
            spark_pdf = qd.fn(spark, sf_dir).toPandas()
            duck_pdf = con.execute(qd.oracle).df()
            results.append(compare(qname, spark_pdf, duck_pdf))
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            results.append(ParityResult(qname, False, f"EXCEPTION {type(e).__name__}: {e}"))
        finally:
            release_shared()  # free shared-subplan blocks after the action
    return results
