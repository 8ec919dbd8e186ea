"""Lint every ORACLES entry for engine-private DuckDB result types.

The driver hashes DuckDB oracle output; DuckDB promotes SUM(BIGINT) to
HUGEINT, which the driver's hasher canonicalizes differently from int64 —
every round-3 driver-red query (9/9) had a HUGEINT column and nothing else
did (VERDICT.md round 3). This lint runs `LIMIT 0` through DuckDB per
oracle and reports any column whose type is not in the portable allowlist,
so the gate stays type-stable without running the full compare.
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)

ALLOWED_PREFIXES = (
    "BOOLEAN",
    "TINYINT",
    "SMALLINT",
    "INTEGER",
    "BIGINT",
    "FLOAT",
    "DOUBLE",
    "VARCHAR",
    "DATE",
    "TIMESTAMP",
    "BLOB",
    "DECIMAL",
)


def connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


import re

# Words inside a rendered complex type that are grammar, not base types:
# STRUCT(a BIGINT, b VARCHAR[]) tokenizes to STRUCT/a/BIGINT/b/VARCHAR.
_TYPE_GRAMMAR = {"STRUCT", "LIST", "MAP", "ARRAY", "NOT", "NULL",
                 "WITH", "TIME", "ZONE"}


def _base_type_tokens(rendered: str) -> list[str]:
    """Every ALL-CAPS word in a rendered DuckDB type that names a base
    type. Field names are user-cased (lower/snake in this repo) so the
    caps filter keeps only type names + grammar keywords; grammar is
    dropped explicitly. This makes the complex-type check closed-world:
    UHUGEINT/UUID/INTERVAL nested three levels deep still surface."""
    words = re.findall(r"[A-Z][A-Z_0-9]*", rendered)
    return [w for w in words if w not in _TYPE_GRAMMAR]


def bad_columns(con: duckdb.DuckDBPyConnection, sql: str) -> list[tuple[str, str]]:
    rel = con.sql(f"SELECT * FROM ({sql}) LIMIT 0")
    out = []
    for name, typ in zip(rel.columns, rel.types):
        t = str(typ)
        base = t.split("(")[0].split("[")[0]
        if base.startswith("STRUCT") or base.startswith("LIST") \
                or base.startswith("MAP") or t.endswith("[]"):
            # ANY top-level complex type is driver-unhashable, no matter
            # how portable its element types are: the driver's
            # canonicalizer sorts raw result columns with pandas, and
            # sort_values on array/struct cells dies with `unhashable
            # type: 'list'` (round-5 `user_journeys` red row). Gated
            # outputs must render sequences as scalar strings
            # (array_join / array_to_string) or pivot to one row per
            # element. The base-type recursion below is secondary — it
            # names WHICH nested type is also non-portable when one is.
            bad_base = [tok for tok in _base_type_tokens(t)
                        if not any(tok == p or tok.startswith(p + "_")
                                   for p in ALLOWED_PREFIXES)]
            detail = f" (non-portable base: {', '.join(bad_base)})" \
                if bad_base else ""
            out.append((name, f"{t} [complex: driver-unhashable]{detail}"))
            continue
        if not any(base == p for p in ALLOWED_PREFIXES):
            out.append((name, t))
    return out


def main() -> int:
    from photon_spark import queries as q

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    con = connect(sf_dir)
    n_bad = 0
    for name, sql in sorted(q.ORACLES.items()):
        try:
            bad = bad_columns(con, sql)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {e}")
            n_bad += 1
            continue
        if bad:
            n_bad += 1
            cols = ", ".join(f"{c}:{t}" for c, t in bad)
            print(f"{name}: {cols}")
    print(f"---\n{n_bad} oracles with non-portable result types "
          f"(of {len(q.ORACLES)})")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
