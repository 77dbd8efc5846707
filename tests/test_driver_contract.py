"""Driver-contract invariants, cheap enough to run on every commit:
the ``queries()`` / ``oracle_sql()`` surfaces stay consistent and every
oracle is valid DuckDB SQL (EXPLAIN parses and binds against the real
sf0.001 views without executing) — a renamed column or SQL typo fails
here in milliseconds instead of in the driver's 10-minute gate."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
SF = os.environ.get("GRAFT_SF_SMALL", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF),
    reason=f"sf0.001 fixture dir {SF} absent (set GRAFT_SF_SMALL)")


@pytest.fixture(scope="module")
def entrymod():
    import __ray_entry__ as m
    return m


def test_every_oracle_has_a_query(entrymod):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs), sorted(set(oracles) - set(qs))
    # the driver surface advertised in the docs
    assert len(qs) >= 91
    assert len(oracles) >= 80


def test_queries_are_callables(entrymod):
    for name, fn in entrymod.queries().items():
        assert callable(fn), name


def test_all_oracle_sql_parses_and_binds(entrymod):
    # the transcript-corpus oracles read through the /tmp symlink; seed
    # it exactly the way the driver does (repoints 'current')
    entrymod._corpus(SF)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    bad = []
    for name, sql in entrymod.oracle_sql().items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as e:          # pragma: no cover - diagnostic
            bad.append((name, str(e).splitlines()[0]))
    assert not bad, bad
