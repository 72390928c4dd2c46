"""Every registered query must survive ALL-EMPTY input tables.

At 100-TB scale empty partitions and empty tables are routine (a filter
that matches nothing, a day with no events, a shard that failed upstream).
Two engine-level traps make this non-trivial on Ray Data and are regression-
pinned here:

- ``Dataset.join`` hash partitions that receive zero rows come back
  SCHEMALESS, so Acero fails with ``No match ... FieldRef`` — inner joins
  short-circuit through ``queries._inner_join(empty_schema=...)``.
- ``Dataset.schema()`` is ``None`` when every block is empty, so empty
  short-circuits must state their output schema explicitly
  (``ann._centroid_sample``, ``ann.ivf_topk``).
"""

import os

import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory):
    """Zero-row copies of every sf table, schemas preserved."""
    src = "/root/testdata/sf0.001"
    if not os.path.isdir(src):
        pytest.skip("driver testdata not present")
    dst = tmp_path_factory.mktemp("empty_sf")
    for f in os.listdir(src):
        if f.endswith(".parquet"):
            pq.write_table(
                pq.read_table(os.path.join(src, f)).slice(0, 0),
                str(dst / f),
            )
    return str(dst)


def test_every_query_survives_empty_tables(empty_sf_dir):
    import pandas as pd
    import pyarrow as pa
    import ray.data

    import __ray_entry__ as entry_mod

    failures = {}
    for name, fn in entry_mod.queries().items():
        try:
            res = fn(empty_sf_dir)
            if isinstance(res, ray.data.Dataset):
                n = res.count()
            elif isinstance(res, pa.Table):
                n = res.num_rows
            else:
                n = len(res)
            # linkage_fixture_clusters generates its own corpus (ignores
            # sf_dir); events_funnel is an aggregate-without-GROUP-BY, so
            # like its SQL it yields exactly one all-zero row; everything
            # else must come back empty
            if name == "events_funnel":
                assert n == 1, f"{name} returned {n} rows from empty inputs"
                row = res.to_pandas().iloc[0]
                assert list(row) == [0, 0, 0, 0], f"{name} nonzero on empty: {list(row)}"
            elif name in ("orders_rollup", "orders_cube"):
                # SQL ROLLUP/CUBE over an empty table still emits the ()
                # grouping set: one ('ALL','ALL', 0, NULL) grand-total row
                assert n == 1, f"{name} returned {n} rows from empty inputs"
                row = res.to_pandas().iloc[0]
                assert row["n"] == 0 and pd.isna(row["total_cents"]), list(row)
            elif name != "linkage_fixture_clusters":
                assert n == 0, f"{name} returned {n} rows from empty inputs"
        except Exception as ex:  # collect all, report once
            failures[name] = f"{type(ex).__name__}: {ex}"
    assert not failures, failures
