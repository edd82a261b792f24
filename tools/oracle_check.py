#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the same parquet tables, compare against the Spark parquet dump
(columns sorted by name, rows sorted), report per-query match. Usage:
  python3 tools/oracle_check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for f in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(f)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
ok, bad = [], []
def hash_unsafe_types(rel):
    """Driver-hash-unsafe DuckDB output types. The driver hashes the typed
    representation, so a DuckDB HUGEINT (sum of BIGINT promotes!), DECIMAL
    (width differs from Spark's) or DATE (fetched timestamp-promoted) fails
    the hash even when pandas values compare equal."""
    out = []
    for cname, t in zip(rel.columns, rel.types):
        ts = str(t)
        if (ts in ("HUGEINT", "UHUGEINT", "DATE")
                or ts.startswith("DECIMAL")
                or "TIME ZONE" in ts or ts == "TIMESTAMPTZ"):
            out.append(f"{cname}:{ts}")
    return out

for name, sql in sorted(oracle.items()):
    try:
        rel = con.sql(sql)
        unsafe = hash_unsafe_types(rel)
        if unsafe:
            bad.append((name, f"oracle output types unsafe for driver hash: {unsafe}")); continue
        exp = con.execute(sql).fetchdf()
        files = glob.glob(f"{out}/{name}/*.parquet")
        got = pd.concat([pq.read_table(f).to_pandas() for f in files]) if files else None
        if got is None:
            bad.append((name, "no spark output")); continue
        exp = exp[sorted(exp.columns)]
        got = got[sorted(got.columns)]
        if list(exp.columns) != list(got.columns):
            bad.append((name, f"cols exp={list(exp.columns)} got={list(got.columns)}")); continue
        if len(exp) != len(got):
            bad.append((name, f"rows exp={len(exp)} got={len(got)}")); continue
        # normalize: sort rows, reset index, compare with exact equality
        def norm(df):
            d = df.copy()
            for c in d.columns:
                if d[c].dtype == object:
                    d[c] = d[c].astype(str)
                # unify datetime unit: us-vs-ns frames with any NaT make
                # assert_frame_equal fall back to raw int64 compare and
                # false-fail even when every value is equal. tz-aware
                # columns must be de-localized first: astype from tz-aware
                # to naive raises TypeError in pandas 2.x (the unsafe-type
                # gate above catches TIMESTAMPTZ oracles before this, but
                # norm must not crash on a tz-aware Spark dump either)
                elif str(d[c].dtype).startswith("datetime64"):
                    if getattr(d[c].dtype, "tz", None) is not None:
                        d[c] = d[c].dt.tz_convert("UTC").dt.tz_localize(None)
                    d[c] = d[c].astype("datetime64[us]")
            return d.sort_values(by=list(d.columns)).reset_index(drop=True)
        e, g = norm(exp), norm(got)
        # integer columns must agree in KIND (int vs int) — check_dtype=False
        # below is only meant to forgive int64-vs-Int64/float width noise on
        # float columns, not an integer/float representation drift that the
        # driver's typed hash would catch.
        kind_bad = [c for c in e.columns
                    if (e[c].dtype.kind in "iu") != (g[c].dtype.kind in "iu")]
        if kind_bad:
            bad.append((name, f"int-kind mismatch (driver hash would fail): "
                              f"{[(c, str(e[c].dtype), str(g[c].dtype)) for c in kind_bad]}")); continue
        # same-kind WIDTH drift (Spark INT32 vs oracle BIGINT/int64) is just
        # as fatal to the driver's typed hash — require the exact dtype
        width_bad = [c for c in e.columns
                     if e[c].dtype.kind in "iu" and g[c].dtype.kind in "iu"
                     and str(e[c].dtype) != str(g[c].dtype)]
        if width_bad:
            bad.append((name, f"int-width mismatch (driver hash would fail): "
                              f"{[(c, str(e[c].dtype), str(g[c].dtype)) for c in width_bad]}")); continue
        # NEGATIVE-ZERO DETECTOR (round-5 post-mortem): numpy/pandas compare
        # -0.0 == +0.0 as equal, so assert_frame_equal passes while the
        # driver's byte-level hash fails (DuckDB round() keeps the sign bit;
        # Spark's BigDecimal-based Round cannot emit -0.0). Flag any float
        # column with a negative zero on EITHER side — the fix is
        # `round(...) + 0.0` in the oracle SQL (see TextQueries t16).
        import numpy as np
        negzero = []
        for c in e.columns:
            for side, df_ in (("oracle", e), ("spark", g)):
                col = df_[c]
                if col.dtype.kind == "f":
                    v = col.to_numpy()
                    nz = int(((v == 0.0) & np.signbit(v)).sum())
                    if nz:
                        negzero.append(f"{side}.{c}:{nz}")
        if negzero:
            bad.append((name, f"negative zero present (hash would MISMATCH): "
                              f"{negzero} — normalize with round(...) + 0.0")); continue
        try:
            pd.testing.assert_frame_equal(e, g, check_dtype=False, check_exact=True)
            ok.append(name)
        except AssertionError as ex:
            # retry with tolerance to distinguish float jitter from real bugs
            try:
                pd.testing.assert_frame_equal(e, g, check_dtype=False, rtol=1e-9)
                bad.append((name, "float-jitter-only (hash would MISMATCH)"))
            except AssertionError:
                bad.append((name, str(ex).split("\n")[0][:200]))
    except Exception as ex:
        bad.append((name, f"oracle error: {str(ex)[:200]}"))

print(f"PASS {len(ok)}/{len(oracle)}")
for n, why in bad:
    print(f"FAIL {n}: {why}")
