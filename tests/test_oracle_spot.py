"""Spot-check the driver's correctness gate inside pytest: a fast subset of
the query registry runs against its DuckDB oracle at sf0.001 (the full gate
is `scripts/check_oracles.py`)."""

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

SPOT_QUERIES = [
    "corpus_normalize",
    "corpus_exact_dedup",
    "corpus_parse_paths",
    "doc_stats",
    "doc_langid",
    "doc_rolling_fingerprint",
    "q1_pricing_summary",
    "events_user_sessions",
    "events_sliding_windows",
    "ann_topk",
    "embedding_lsh_pairs",
    "doc_train_val_split",
    "doc_near_dedup_keep",
    "embedding_near_dedup_keep",
    "events_asof_join",
    "events_range_join",
    "events_user_running_stats",
    "events_funnel",
    "events_value_histogram",
    "customers_without_big_orders",
    "customers_with_urgent_orders",
    "orders_priority_quantiles",
    "corpus_fuzzy_pairs",
    "orders_rollup",
    "events_pivot_daily",
    "doc_bigram_lift",
    "part_soundex_blocks",
    "part_fuzzy_matches",
    "orders_priority_quantiles_cont",
    "events_cumulative_users",
    "corpus_stem_jw_pairs",
    "customer_balance_ranks",
    "events_gapfill_hourly",
    "lineitem_qty_disc_corr",
    "events_churned_pairs",
    "doc_hash_sample",
    "q10_returned_revenue",
    "events_user_moving_avg",
    "orders_cube",
    "doc_stratified_sample",
    "doc_bm25_search",
    "orders_priority_share",
    "customers_above_nation_avg",
    "part_size_brand_mode",
    "part_unpivot_attrs",
    "q7_nation_trade",
    "events_cohort_retention",
    "events_type_transitions",
    "q18_big_orders",
    "doc_pack_offsets",
    "events_daily_distinct_users",
    "orders_priority_mad",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", SPOT_QUERIES)
def test_query_matches_oracle(name, con):
    from localhost_address_matching_ray.pipelines.queries import REGISTRY

    qd = REGISTRY[name]
    assert qd.sql is not None
    mine = _canon(qd.fn(SF_DIR).to_pandas())
    oracle = _canon(con.execute(qd.sql).df())
    assert list(mine.columns) == list(oracle.columns)
    assert len(mine) == len(oracle)
    pd.testing.assert_frame_equal(mine, oracle, check_dtype=False, check_exact=True)


def test_registry_contract():
    """Every oracled query has matching names in queries()/oracle_sql() and
    the driver entry module exposes the full registry."""
    import __ray_entry__ as entry

    q = entry.queries()
    o = entry.oracle_sql()
    assert set(o) <= set(q)
    # session-7 registry floor: a dropped registration must fail loud
    assert len(q) >= 95 and len(o) >= 89


def test_q10_fallback_join_path_matches_broadcast():
    """broadcast_orders_max=0 forces the partitioned pre-aggregate + hash
    join fallback; results must be identical to the broadcast fast path."""
    from localhost_address_matching_ray.pipelines.queries import q10_returned_revenue

    fast = _canon(q10_returned_revenue(SF_DIR).to_pandas())
    slow = _canon(q10_returned_revenue(SF_DIR, broadcast_orders_max=0).to_pandas())
    pd.testing.assert_frame_equal(fast, slow, check_exact=True)


def test_q7_fallback_join_path_matches_broadcast():
    """broadcast_keys_max=0 forces the partitioned hash-join path; the exact
    int64 1e-4-unit revenue sums make both paths bit-identical."""
    from localhost_address_matching_ray.pipelines.queries import q7_nation_trade

    fast = _canon(q7_nation_trade(SF_DIR).to_pandas())
    slow = _canon(q7_nation_trade(SF_DIR, broadcast_keys_max=0).to_pandas())
    pd.testing.assert_frame_equal(fast, slow, check_exact=True)


def test_transitions_null_event_types_match_oracle(tmp_path):
    """Null event_type rows: SQL drops null-PREV transitions but keeps the
    null-NEXT group; the Ray side must match (nulls ride the sort-shuffle as
    a sentinel — Ray's groupby can't order null keys)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from localhost_address_matching_ray.pipelines.queries import REGISTRY

    rng = np.random.default_rng(0)
    n = 400
    et = rng.choice(["a", "b", "c"], size=n).astype(object)
    et[rng.random(n) < 0.12] = None
    t = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(
            (np.int64(1_700_000_000_000_000)
             + rng.integers(0, 10**9, n)).astype("datetime64[us]")
        ),
        "user_id": pa.array(rng.integers(0, 25, n), pa.int64()),
        "event_type": pa.array(list(et), pa.string()),
        "value": pa.array(rng.random(n)),
        "props": pa.array(["{}"] * n),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    qd = REGISTRY["events_type_transitions"]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet')"
    )
    mine = qd.fn(str(tmp_path)).to_pandas()
    oracle = con.execute(qd.sql).df()
    assert mine.next_type.isna().any()  # the null-NEXT group exists

    def nulls_last(df):
        df = df[sorted(df.columns)].copy()
        return df.sort_values(
            list(df.columns), kind="mergesort", na_position="last"
        ).reset_index(drop=True)

    pd.testing.assert_frame_equal(
        nulls_last(mine), nulls_last(oracle), check_dtype=False
    )


def test_q18_empty_orders_and_missing_customers(tmp_path):
    """Surviving lineitem orders with an empty orders table → empty result
    (was: ArrowInvalid from concat of nothing); an order whose customer is
    missing drops, matching the SQL inner join."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from localhost_address_matching_ray.pipelines.queries import q18_big_orders

    src = SF_DIR
    for t in TABLES:
        shutil.copy(f"{src}/{t}.parquet", tmp_path / f"{t}.parquet")
    orders = pq.read_table(str(tmp_path / "orders.parquet"))
    pq.write_table(orders.schema.empty_table(), str(tmp_path / "orders.parquet"))
    out = q18_big_orders(str(tmp_path)).to_pandas()
    assert len(out) == 0

    # restore orders; empty CUSTOMER drops every survivor (inner join)
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    cust = pq.read_table(str(tmp_path / "customer.parquet"))
    pq.write_table(cust.schema.empty_table(), str(tmp_path / "customer.parquet"))
    out = q18_big_orders(str(tmp_path)).to_pandas()
    assert len(out) == 0


def test_q7_degenerate_fks_match_oracle_both_paths(tmp_path):
    """Dangling FKs everywhere the join tree can dangle: a customer whose
    nationkey is absent from nation, a supplier likewise, a lineitem whose
    suppkey has no supplier, and an order whose custkey has no customer.
    The SQL inner joins drop all of them; both the broadcast-lookup path
    and the partitioned-join fallback must match the oracle exactly (was:
    bare searchsorted aliased a missing nationkey to a neighbor's code)."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from localhost_address_matching_ray.pipelines.queries import (
        REGISTRY, q7_nation_trade,
    )

    for t in TABLES:
        shutil.copy(f"{SF_DIR}/{t}.parquet", tmp_path / f"{t}.parquet")

    def corrupt(name, col, frac=0.2, bump=10_000_000):
        t = pq.read_table(str(tmp_path / f"{name}.parquet"))
        v = t[col].to_numpy(zero_copy_only=False).copy()
        k = max(1, int(len(v) * frac))
        v[:k] = v[:k] + bump  # now points at nothing
        t = t.set_column(
            t.schema.get_field_index(col), col, pa.array(v, t.schema.field(col).type)
        )
        pq.write_table(t, str(tmp_path / f"{name}.parquet"))

    corrupt("customer", "c_nationkey", bump=500)   # beyond any nationkey
    corrupt("supplier", "s_nationkey", bump=500)
    corrupt("lineitem", "l_suppkey")
    corrupt("orders", "o_custkey")

    con2 = duckdb.connect()
    for t in TABLES:
        con2.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{tmp_path}/{t}.parquet')"
        )
    oracle = _canon(con2.execute(REGISTRY["q7_nation_trade"].sql).df())
    assert len(oracle) > 0  # corruption left enough intact rows to compare
    fast = _canon(q7_nation_trade(str(tmp_path)).to_pandas())
    slow = _canon(q7_nation_trade(str(tmp_path), broadcast_keys_max=0).to_pandas())
    pd.testing.assert_frame_equal(fast, oracle, check_dtype=False, check_exact=True)
    pd.testing.assert_frame_equal(slow, oracle, check_dtype=False, check_exact=True)


def test_transitions_nul_sentinel_collision_fails_loud(tmp_path):
    """A real event_type containing \\x00 would collide with the null
    sentinel riding the sort-shuffle; the guard must raise instead of
    silently rewriting it to NULL in the output."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from localhost_address_matching_ray.pipelines.queries import REGISTRY

    n = 10
    t = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(
            (np.int64(1_700_000_000_000_000) + np.arange(n)).astype("datetime64[us]")
        ),
        "user_id": pa.array(np.zeros(n, np.int64)),
        "event_type": pa.array(["ok", "bad\x00type"] * (n // 2), pa.string()),
        "value": pa.array(np.zeros(n)),
        "props": pa.array(["{}"] * n),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    with pytest.raises(Exception, match="sentinel"):
        REGISTRY["events_type_transitions"].fn(str(tmp_path)).to_pandas()


def test_q18_beyond_ceiling_partitioned_join_matches_broadcast():
    """survivors_max=1 forces the partitioned hash-join fallback; its
    output must be identical to the broadcast join-back path (which a
    tiny ceiling would previously reject with a ValueError)."""
    from localhost_address_matching_ray.pipelines.queries import q18_big_orders

    fast = _canon(q18_big_orders(SF_DIR).to_pandas())
    assert len(fast) > 0
    slow = _canon(q18_big_orders(SF_DIR, survivors_max=1).to_pandas())
    pd.testing.assert_frame_equal(fast, slow, check_exact=True)


def test_q10_degenerate_dims_backfill_to_20_matches_oracle(tmp_path):
    """Customers missing from the customer table (or pointing at missing
    nations) must be dropped BEFORE the top-20 cut, with next-ranked
    survivors backfilling — exactly the SQL inner-join-then-LIMIT order
    (was: filter after limit → short result)."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from localhost_address_matching_ray.pipelines.queries import (
        REGISTRY, q10_returned_revenue,
    )

    for t in TABLES:
        shutil.copy(f"{SF_DIR}/{t}.parquet", tmp_path / f"{t}.parquet")
    # drop 40% of customer rows entirely: many top-revenue customers now
    # dangle, forcing the over-fetch + backfill path
    cust = pq.read_table(str(tmp_path / "customer.parquet"))
    pq.write_table(cust.slice(0, int(cust.num_rows * 0.6)),
                   str(tmp_path / "customer.parquet"))

    con2 = duckdb.connect()
    for t in TABLES:
        con2.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{tmp_path}/{t}.parquet')"
        )
    oracle = _canon(con2.execute(REGISTRY["q10_returned_revenue"].sql).df())
    mine = _canon(q10_returned_revenue(str(tmp_path)).to_pandas())
    assert len(oracle) == 20  # enough surviving customers to fill the cut
    pd.testing.assert_frame_equal(mine, oracle, check_dtype=False, check_exact=True)


@pytest.mark.parametrize("name,kwargs", [
    ("q3_top_orders", {"broadcast_keys_max": 0}),
    ("q5_region_revenue", {"broadcast_orders_max": 0}),
])
def test_q3_q5_fallback_join_paths_match_broadcast(name, kwargs, con):
    """Ceiling=0 forces the partitioned-join fallback; results must match
    the broadcast path AND the oracle."""
    from localhost_address_matching_ray.pipelines import queries as q

    fn = getattr(q, name)
    fast = _canon(fn(SF_DIR).to_pandas())
    slow = _canon(fn(SF_DIR, **kwargs).to_pandas())
    pd.testing.assert_frame_equal(fast, slow, check_exact=True)
    oracle = _canon(con.execute(q.REGISTRY[name].sql).df())
    pd.testing.assert_frame_equal(fast, oracle, check_dtype=False, check_exact=True)


def test_gapfill_fallback_join_path_matches_broadcast(monkeypatch, con):
    """Ceiling 0 forces the distributed left-join zero-fill; output must
    match the broadcast grid-fill path and the oracle."""
    from localhost_address_matching_ray.pipelines import queries as q

    fast = _canon(q.events_gapfill_hourly(SF_DIR).to_pandas())
    monkeypatch.setattr(q, "GAPFILL_BROADCAST_MAX", 0)
    slow = _canon(q.events_gapfill_hourly(SF_DIR).to_pandas())
    pd.testing.assert_frame_equal(fast, slow, check_exact=True)
    oracle = _canon(con.execute(q.REGISTRY["events_gapfill_hourly"].sql).df())
    pd.testing.assert_frame_equal(fast, oracle, check_dtype=False, check_exact=True)
