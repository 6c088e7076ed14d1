"""Union gate keys (operators/unionkeys.py / union_spec.py).

Structural invariants of the round-5 union-key pack plus a live
cross-engine check of representative unions. The full 18-union sweep
runs via tools/gate_check.py at sf0.001/sf0.01/sf0.1 (GATE_r05 logs);
here we pin the machinery so a spec or combinator regression fails
fast without re-running every member family.
"""

import glob
import json
import os
import sys

import duckdb
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

import __spark_entry__ as entry_mod  # noqa: E402
from distributedcodesearchengine_spark.operators.union_spec import (  # noqa: E402
    GROUPS,
    SPEC,
)
from distributedcodesearchengine_spark.operators.unionkeys import (  # noqa: E402
    _slot_counts,
)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]
# cheap families (each << 10s at sf0.001) chosen to span the slot
# shapes: d-heavy (geo), s-heavy + NaN padding (events), mixed (text)
LIVE_KEYS = ["u_geo_ip", "u_events_extra", "u_textstats"]


def test_groups_partition_the_never_verified_set():
    """Every key with no r1-r4 driver row is in exactly ONE group."""
    members = [m for ms in GROUPS.values() for m in ms]
    assert len(members) == len(set(members)) == 164
    reg = set(entry_mod.queries())
    assert set(members) <= reg
    verified = set()
    for p in sorted(glob.glob(os.path.join(REPO_ROOT, "CORRECTNESS_r0[1-4].json"))):
        with open(p) as f:
            verified.update(json.load(f).keys())
    never = {k for k in reg if k not in verified and not k.startswith("u_")}
    assert set(members) == never


def test_spec_covers_every_member_with_sorted_scalar_columns():
    for ms in GROUPS.values():
        for m in ms:
            cols = SPEC[m]
            names = [c for c, _ in cols]
            assert names == sorted(names), m
            assert all(kind in ("str", "float") for _, kind in cols), m


def test_union_keys_registered_with_oracles():
    osql = entry_mod.oracle_sql()
    qs = entry_mod.queries()
    for ukey, ms in GROUPS.items():
        assert ukey in qs and ukey in osql
        # the SQL embeds every member body once, discriminated by part
        for m in ms:
            assert f"'{m}' AS part" in osql[ukey]


def test_slot_counts_match_sql_width():
    """The generated SQL's widest SELECT has part + n_s + n_d slots."""
    osql = entry_mod.oracle_sql()
    for ukey, ms in GROUPS.items():
        n_s, n_d = _slot_counts(ms)
        first = osql[ukey].split(" FROM ")[0]
        assert f"s{n_s:02d}" in first and (n_d == 0 or f"d{n_d:02d}" in first)
        assert f"s{n_s + 1:02d}" not in osql[ukey]
        assert f"d{n_d + 1:02d}" not in osql[ukey]


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("ukey", LIVE_KEYS)
def test_union_matches_oracle_live(spark, sf_dir, ddb, ukey):
    """Cross-engine: rows, schema, and canonical values match; the
    per-part row counts equal each member's own row count (so ONE
    union row really certifies every member's full result set)."""
    sdf = entry_mod.queries()[ukey](spark, sf_dir)
    spark_rows = [
        tuple(r[c] for c in sorted(sdf.columns)) for r in sdf.collect()
    ]
    res = ddb.execute(entry_mod.oracle_sql()[ukey])
    cols = [d[0] for d in res.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    duck_rows = [tuple(r[i] for i in order) for r in res.fetchall()]
    assert sorted(sdf.columns) == [cols[i] for i in order]
    assert len(spark_rows) == len(duck_rows)

    def norm(rows):
        return sorted(
            (
                tuple(
                    round(v, 6) if isinstance(v, float) else v for v in r
                )
                for r in rows
            ),
            key=lambda t: tuple(str(x) for x in t),
        )

    for ra, rb in zip(norm(spark_rows), norm(duck_rows)):
        for va, vb in zip(ra, rb):
            if isinstance(va, float) and isinstance(vb, float):
                assert va == pytest.approx(vb, abs=2e-6)
            else:
                assert va == vb

    part_idx = sorted(sdf.columns).index("part")
    from collections import Counter

    per_part = Counter(r[part_idx] for r in spark_rows)
    for m in GROUPS[ukey]:
        mdf = entry_mod.queries()[m](spark, sf_dir)
        assert per_part[m] == mdf.count(), m
