"""Local rehearsal of the driver's correctness gate.

Runs every `queries()` entry at sf0.01 through Spark AND its
`oracle_sql()` twin through DuckDB, then compares:
  - row count
  - schema (column names; order-insensitive)
  - order-insensitive value hash (columns sorted by name, rows sorted,
    floats normalized to 9 significant digits after the queries' own
    rounding)

Exit code 0 iff every oracle-backed query matches and every rows-only
query executes. Usage:
    python tools/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon_value(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0:
            return "0"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return "t" if v else "f"
    return str(v)


def table_digest(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon_rows = sorted(
        "|".join(canon_value(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in canon_rows:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, REPO)
    import __spark_entry__ as entrymod
    from algoritmos_etl_spark.session import get_spark

    spark = get_spark("verify-local", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    # big-corpus sweeps (the 10x/30x/100x notches) run the oracle next
    # to a live Spark JVM: cap DuckDB below the default 80%-of-RAM so
    # the two engines fit together, and give it a spill directory so
    # the heavy pair-join CTE oracles offload instead of OOM-ing
    import tempfile

    def fresh_con():
        c = duckdb.connect()
        c.sql(
            f"SET memory_limit = "
            f"'{os.environ.get('VERIFY_DUCKDB_MEM', '48GB')}'"
        )
        c.sql(
            f"SET temp_directory = "
            f"'{tempfile.mkdtemp(prefix='duck_spill_')}'"
        )
        for t in TABLES:
            c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        return c

    con = fresh_con()

    failures, passed, rows_only = [], [], []
    # oracles proven beyond the single-node SQL engine's memory at a
    # big notch (the pair-join CTEs at 30x) can be demoted to the
    # rows-only check for that run — the Spark side still executes
    # and its row count is recorded, which IS the scale point
    skip_oracle = set(
        (os.environ.get("VERIFY_SKIP_ORACLE") or "").split(",")
    ) - {""}
    # VERIFY_SHARD_ORACLE=a,b,c — run those queries' oracles in the
    # sharded form (driver_queries_ext.SHARDED_ORACLES): the heavy
    # pair-generation core runs once per doc_id-residue shard (peak
    # memory ~1/n_shards — the 30x-notch fix), shard outputs union
    # into a temp table, and the light combine query produces the
    # FULL result for the normal hash compare.
    shard_oracle = set(
        (os.environ.get("VERIFY_SHARD_ORACLE") or "").split(",")
    ) - {""}
    from algoritmos_etl_spark.driver_queries_ext import SHARDED_ORACLES

    unknown_shard = shard_oracle - set(SHARDED_ORACLES)
    if unknown_shard:
        raise SystemExit(
            f"VERIFY_SHARD_ORACLE names without a shard spec: "
            f"{sorted(unknown_shard)}"
        )

    def run_sharded(name: str):
        spec = SHARDED_ORACLES[name]
        # VERIFY_SHARD_N overrides the shard count (bigger notches
        # want more, smaller shards); disjointness/completeness hold
        # for any n since a pair lands in shard doc_a % n
        n_shards = int(os.environ.get("VERIFY_SHARD_N", spec["n_shards"]))
        con.sql("DROP TABLE IF EXISTS _shard_union")
        # one-shot setup tables (e.g. the BPE-relearn product) so the
        # linear stage is not repeated per shard
        for tbl, sql in spec.get("setup_sql", []):
            con.sql(f"DROP TABLE IF EXISTS {tbl}")
            con.sql(f"CREATE TABLE {tbl} AS {sql}")
            print(f"    [setup] {name}: {tbl}", flush=True)
        for s in range(n_shards):
            sql = spec["shard_sql"](s, n_shards)
            if s == 0:
                con.sql(f"CREATE TABLE _shard_union AS {sql}")
            else:
                con.sql(f"INSERT INTO _shard_union {sql}")
            print(f"    [shard {s + 1}/{n_shards}] {name}", flush=True)
        rel = con.sql(spec["combine_sql"])
        ocols = [d[0] for d in rel.description]
        orows = rel.fetchall()
        con.sql("DROP TABLE IF EXISTS _shard_union")
        for tbl, _sql in spec.get("setup_sql", []):
            con.sql(f"DROP TABLE IF EXISTS {tbl}")
        return ocols, orows

    for name, fn in qs.items():
        if name in skip_oracle:
            oracles = {k: v for k, v in oracles.items() if k != name}
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {type(e).__name__}: {e}"))
            print(f"[FAIL-spark] {name}: {e}")
            continue
        if name not in oracles and name not in shard_oracle:
            rows_only.append(name)
            print(f"[rows-only] {name}: {len(srows)} rows in {time.time()-t0:.1f}s")
            continue
        try:
            if name in shard_oracle:
                ocols, orows = run_sharded(name)
            else:
                rel = con.sql(oracles[name])
                ocols = [d[0] for d in rel.description]
                orows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"ORACLE ERROR: {e}"))
            print(f"[FAIL-oracle] {name}: {e}")
            # an OOM-killed query can leave the connection's buffer
            # pool pinned (observed at 100x: every later oracle then
            # fails allocating KILOBYTES) — rebuild the connection so
            # one oracle's death cannot poison the rest of the sweep
            try:
                con.close()
            except Exception:  # noqa: BLE001
                pass
            con = fresh_con()
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"schema spark={sorted(scols)} oracle={sorted(ocols)}")
        if not problems:
            hs = table_digest(scols, srows)
            ho = table_digest(ocols, orows)
            if hs != ho:
                sset = {tuple(canon_value(v) for v in r) for r in srows}
                oset = {tuple(canon_value(v) for v in r) for r in orows}
                examples = list(sset ^ oset)[:4]
                problems.append(f"hash mismatch; sym-diff {len(sset ^ oset)} e.g. {examples}")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"[FAIL] {name}: {'; '.join(problems)}")
        else:
            passed.append(name)
            print(f"[ok]   {name}: {len(srows)} rows in {time.time()-t0:.1f}s")

    print(
        f"\n{len(passed)} matched, {len(rows_only)} rows-only, {len(failures)} failed"
        f" (sf_dir={sf_dir})"
    )
    for name, why in failures:
        print(f"  FAIL {name}: {why[:400]}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
