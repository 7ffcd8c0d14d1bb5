"""Guard the driver's dtype-sensitive value hasher against HUGEINT.

Round-2 postmortem (VERDICT r2 "What's wrong" #1): five oracles left a
``sum()``-derived column as DuckDB HUGEINT (int128).  Spark has no
int128, so even value-identical results hash differently in the
driver's CORRECTNESS gate.  Each was fixed with ``CAST(... AS
BIGINT)`` — this test pins the invariant for EVERY oracle, current and
future: no output column may be a type Spark cannot produce.

DuckDB-only (no SparkSession), so it runs in milliseconds via
``DESCRIBE`` over the sf0.001 views.
"""

import os

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_001", "/root/testdata/sf0.001")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# Types with no Spark equivalent — any oracle emitting one will
# hash-mismatch in the driver even when values are exactly equal.
FORBIDDEN = {"HUGEINT", "UHUGEINT", "INT128", "UINT128",
             "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT"}


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql()))
def test_oracle_emits_no_spark_incomparable_types(con, name):
    sql = entrymod.oracle_sql()[name]
    desc = con.sql(f"DESCRIBE ({sql})").fetchall()
    bad = [(col, typ) for col, typ, *_ in desc
           if typ.upper().split("(")[0] in FORBIDDEN]
    assert not bad, (
        f"oracle {name} emits driver-incomparable column types {bad}; "
        f"wrap in CAST(... AS BIGINT) like pack_sequences does"
    )
