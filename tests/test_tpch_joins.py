"""TPC-H-shaped join-pattern queries (Q4/Q13/Q16/Q17/Q22 analogues)
pinned against DuckDB at sf0.001 — the same rows+values contract the
driver's oracle gate enforces at sf0.01."""
import os

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
QUERIES = [
    "tpch_q4_priority",
    "tpch_q7_volume",
    "tpch_q8_share",
    "tpch_q9_profit",
    "tpch_q11_part_value",
    "tpch_q13_custdist",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_cnt",
    "tpch_q17_small_qty",
    "tpch_q19_discount",
    "tpch_q22_idle_rich",
    "tpch_q2_mincost",
    "tpch_q12_priority",
    "tpch_q20_dominant",
    "tpch_q21_waiting",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("orders", "customer", "lineitem", "supplier", "part",
              "nation", "region"):
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM "
              f"read_parquet('{SF}/{t}.parquet')")
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns),
                          kind="stable").reset_index(drop=True)


@pytest.mark.parametrize("name", QUERIES)
def test_tpch_join_query_matches_oracle(ray_session, con, name):
    import ray.data

    import __ray_entry__ as entry

    res = entry.queries()[name](SF)
    if isinstance(res, ray.data.Dataset):
        res = res.to_pandas()
    odf = con.sql(entry.oracle_sql()[name]).df()
    rdf, odf = _norm(res), _norm(odf)
    assert list(rdf.columns) == list(odf.columns)
    assert len(rdf) == len(odf)
    pd.testing.assert_frame_equal(
        rdf, odf, check_dtype=False, check_exact=True)
