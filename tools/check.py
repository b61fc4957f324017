"""Local replica of the driver's correctness gate.

Round-1 lesson: this script MUST mirror the driver exactly, or local green
diverges from driver red.  Two round-1 divergences are now pinned:

1. **Bare session.** The driver builds its own SparkSession with none of
   get_spark's builder confs; queries must self-assert runtime confs
   (esper_tv_spark.session.ensure_runtime_confs).  We therefore build a
   vanilla builder here (master only).
2. **pandas canonicalization.** The driver canonicalizes via
   ``pd.DataFrame(...).sort_values(by=<name-sorted columns>)`` — which
   raises ``TypeError: unhashable type`` on list-valued cells.  We do the
   same, so any array-typed output column fails HERE first.

Usage: python tools/check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def canon(cols, rows) -> pd.DataFrame:
    """Driver-style canonical form: name-sorted columns, pandas row sort.

    Raises (like the driver) if any cell is unhashable (list/dict/ndarray)."""
    pdf = pd.DataFrame(rows, columns=list(cols))
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(drop=True)
    return pdf


def cell_repr(v) -> str:
    if v is None or v is pd.NA or (isinstance(v, float) and math.isnan(v)):
        return "<null>"
    if isinstance(v, float):
        return repr(v)
    return repr(v)


def frame_lines(pdf: pd.DataFrame) -> list[str]:
    return ["|".join(cell_repr(v) for v in row) for row in pdf.itertuples(index=False, name=None)]


def approx_equal(a: list[str], b: list[str], tol=1e-9) -> bool:
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        xs, ys = x.split("|"), y.split("|")
        if len(xs) != len(ys):
            return False
        for u, v in zip(xs, ys):
            if u == v:
                continue
            try:
                if not math.isclose(float(u), float(v), rel_tol=tol, abs_tol=tol):
                    return False
            except ValueError:
                return False
    return True


def bare_spark():
    """Vanilla session, like the driver's harness: NO repo confs.

    One env-gated deviation: SPARK_CHECK_DRIVER_MEMORY sets
    spark.driver.memory for SCALE REHEARSALS only (the sf100 gate collects
    multi-million-row results, which the default ~1g driver JVM cannot
    hold; the driver's own gate runs at sf0.01 where this never binds).
    Leave it unset for driver-replica runs."""
    from pyspark.sql import SparkSession
    import os

    b = (
        SparkSession.builder.master("local[8]")
        .appName("check-bare")
        .config("spark.ui.enabled", "false")
    )
    mem = os.environ.get("SPARK_CHECK_DRIVER_MEMORY")
    if mem:
        b = b.config("spark.driver.memory", mem)
    return b.getOrCreate()


def _oracle_cache_key(sf_dir: str, sql: str) -> str:
    """Cache key for a DuckDB oracle RESULT: sha256 of the oracle SQL text
    + a stat fingerprint (relpath, size, mtime_ns) of every file under the
    data dir.  The oracle is a pure function of (SQL, data), so replaying
    it on unchanged inputs is pure cost — at sf100 the q98 residual replay
    alone is ~18 min.  Any data regeneration or SQL edit changes the key
    and forces a live replay; the SPARK side always runs live."""
    import hashlib
    import os

    h = hashlib.sha256(sql.encode())
    for root, _dirs, files in sorted(os.walk(sf_dir)):
        for fn in sorted(files):
            st = os.stat(os.path.join(root, fn))
            rel = os.path.relpath(os.path.join(root, fn), sf_dir)
            h.update(f"{rel}:{st.st_size}:{st.st_mtime_ns};".encode())
    return h.hexdigest()[:32]


def main():
    import os

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # Opt-in oracle-RESULT cache (SPARK_CHECK_ORACLE_CACHE=<dir>): used by
    # the sf100 spot gate, where heavy index-replay oracles dominate the
    # wall; a second consecutive gate run replays from cache.  Driver-
    # replica runs leave it unset — the driver always replays live.
    cache_dir = os.environ.get("SPARK_CHECK_ORACLE_CACHE")
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
    # point oracle generation at the corpus under test: q51's plane count
    # is derived from the embeddings parquet footer at oracle-build time
    # (cross-scale gates get a matching oracle with no hand regeneration)
    os.environ.setdefault("SPARK_GRAFT_ORACLE_SF_DIR", sf_dir)

    con = duckdb.connect()
    # a heavy oracle must SPILL, not OOM-kill the whole gate: the q94
    # rotation replay at sf100 grew past 119 GB RSS and took the global
    # OOM killer with it (losing every later query's record).  Cap the
    # oracle engine and give it a disk spill dir; genuinely-infeasible
    # oracles then fail their own query with an out-of-memory error and
    # the gate keeps going.
    con.execute(
        f"SET memory_limit = '{os.environ.get('SPARK_CHECK_DUCKDB_MEM', '48GB')}'"
    )
    os.makedirs("/tmp/duckdb_spill", exist_ok=True)
    con.execute("SET temp_directory = '/tmp/duckdb_spill'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    spark = bare_spark()
    spark.sparkContext.setLogLevel("ERROR")
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            s_canon = canon(s_cols, s_rows)
        except Exception as e:
            print(f"FAIL {name}: spark/canon error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(s_rows)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            cache_path = None
            d_canon = None
            if cache_dir:
                key = _oracle_cache_key(sf_dir, oracles[name])
                cache_path = os.path.join(cache_dir, f"{name}_{key}.pkl")
                if os.path.exists(cache_path):
                    d_canon = pd.read_pickle(cache_path)
                    print(f"  (oracle cache hit: {os.path.basename(cache_path)})")
            if d_canon is None:
                cur = con.execute(oracles[name])
                d_cols = [d[0] for d in cur.description]
                d_rows = cur.fetchall()
                d_canon = canon(d_cols, d_rows)
                if cache_path:
                    d_canon.to_pickle(cache_path)
        except Exception as e:
            print(f"FAIL {name}: duckdb/canon error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        problems = []
        if list(s_canon.columns) != list(d_canon.columns):
            problems.append(f"cols spark={list(s_canon.columns)} duck={list(d_canon.columns)}")
        if len(s_canon) != len(d_canon):
            problems.append(f"rowcount spark={len(s_canon)} duck={len(d_canon)}")
        if not problems:
            ls, ld = frame_lines(s_canon), frame_lines(d_canon)
            if ls != ld:
                diff = sum(1 for a, b in zip(ls, ld) if a != b)
                if approx_equal(ls, ld):
                    problems.append(f"values differ EXACTLY but match approx ({diff} rows)")
                else:
                    problems.append(f"values differ ({diff}/{len(ls)} rows)")
                    for a, b in zip(ls, ld):
                        if a != b:
                            problems.append(f"  spark: {a}\n   duck: {b}")
                            break
        if problems:
            print(f"FAIL {name} ({time.time()-t0:.1f}s): " + "; ".join(problems[:3]))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_rows)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
