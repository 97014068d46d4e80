"""Sharded big-notch oracles (r11): the doc_id-residue decomposition
of the shingle-pair core must reproduce the plain oracle EXACTLY —
disjoint, complete shards + light combine == one-shot SQL. Pure
DuckDB (no Spark): this pins the decomposition itself; verify_local
pins sharded-vs-Spark."""

from __future__ import annotations

import duckdb
import pytest

from algoritmos_etl_spark.driver_queries import REGISTRY
from algoritmos_etl_spark.driver_queries_ext import SHARDED_ORACLES

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


@pytest.mark.parametrize("name", sorted(SHARDED_ORACLES))
def test_sharded_equals_plain_oracle(con, name):
    spec = SHARDED_ORACLES[name]
    con.sql("DROP TABLE IF EXISTS _shard_union")
    for tbl, sql in spec.get("setup_sql", []):
        con.sql(f"DROP TABLE IF EXISTS {tbl}")
        con.sql(f"CREATE TABLE {tbl} AS {sql}")
    for s in range(spec["n_shards"]):
        sql = spec["shard_sql"](s, spec["n_shards"])
        if s == 0:
            con.sql(f"CREATE TABLE _shard_union AS {sql}")
        else:
            con.sql(f"INSERT INTO _shard_union {sql}")
    sharded = con.sql(spec["combine_sql"])
    scols = [d[0] for d in sharded.description]
    srows = sorted(map(tuple, sharded.fetchall()))
    plain = con.sql(REGISTRY[name].oracle)
    pcols = [d[0] for d in plain.description]
    prows = sorted(map(tuple, plain.fetchall()))
    con.sql("DROP TABLE IF EXISTS _shard_union")
    for tbl, _sql in spec.get("setup_sql", []):
        con.sql(f"DROP TABLE IF EXISTS {tbl}")
    assert scols == pcols
    assert srows == prows
    assert srows, f"{name}: empty result — fixture no longer overlaps"


def test_shards_are_disjoint_and_complete(con):
    """Pair grain: every (doc_a, doc_b) appears in exactly one shard."""
    spec = SHARDED_ORACLES["dedup_ngram_jaccard"]
    seen: dict = {}
    for s in range(spec["n_shards"]):
        for a, b, _j in con.sql(
            spec["shard_sql"](s, spec["n_shards"])
        ).fetchall():
            assert (a, b) not in seen, f"pair in shards {seen[(a, b)]} and {s}"
            seen[(a, b)] = s
            assert a % spec["n_shards"] == s
    plain = {
        (a, b)
        for a, b, _ in con.sql(
            REGISTRY["dedup_ngram_jaccard"].oracle
        ).fetchall()
    }
    assert set(seen) == plain
