"""Hostile-testdata differential gate: the driver regenerates testdata
between rounds (r4 flipped events.ts NANOS→MICROS and burned a round), so
every engine/oracle pair must agree BYTE-FOR-BYTE on degenerate rows the
current corpus happens not to contain: token-less and NULL texts, source
names that are not 'src<digits>', NULL/negative/out-of-band order totals,
and adversarial JSON props shapes.
"""

from __future__ import annotations

import os
import shutil

import duckdb
import pytest

from tests.conftest import SF_SMOKE
from tests.parity import compare, run_oracle


@pytest.fixture(scope="module")
def hostile_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("hostile"))
    for f in os.listdir(SF_SMOKE):
        shutil.copy(os.path.join(SF_SMOKE, f), os.path.join(d, f))
    con = duckdb.connect()
    con.execute(
        f"""COPY (
        SELECT * FROM read_parquet('{SF_SMOKE}/documents.parquet')
        UNION ALL
        SELECT * FROM (VALUES
          (90001, '!!! ??? ...', 'en', 'web', 11),      -- token-less text
          (90002, NULL, 'en', 'w', 0),                  -- NULL text, short source
          (90003, '--- !!!', 'en', 'books', 7),         -- token-less, alpha source
          (90004, 'one', 'en', 'wiki99x', 3),           -- <3 tokens (no shingles)
          (90005, '', 'en', 'src1', 0),                 -- empty string text
          (90006, '돼지 농장 주간 보고서 돼지 농장', 'ko', 'src2', 22),  -- Korean (the reference domain)
          (90007, 'İstanbul constantinople ISTANBUL istanbul', 'tr', 'src3', 41), -- casefold edge
          (90008, 'naïve café naïve café résumé', 'fr', 'src4', 28),   -- combining accents
          (90009, 'mixed 한글 and english words 한글', 'ko', 'src5', 29), -- mixed scripts
          (90010, 'doc with null source stratum', NULL, NULL, 28),     -- NULL lang AND source
          (90011, 'second null source doc packs after it', NULL, NULL, 38), -- NULL shard size >= 2
          (90012, repeat('spam ', 2000) || 'tail', 'en', 'src6', 10004), -- single-token-dominated long doc (repetition-filter max-run path)
          (90013, 'alpha beta ' || repeat('gamma delta ', 500), 'en', 'src7', 6011) -- repeated-bigram-dominated doc
        ) v(doc_id, text, lang, source, n_chars)
    ) TO '{d}/documents.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (
        SELECT * FROM read_parquet('{SF_SMOKE}/orders.parquet')
        UNION ALL
        SELECT * FROM (VALUES
          (990001, 1, 'O', NULL, TIMESTAMP '1997-01-01', '1-URGENT'),
          (990002, 1, 'O', -500.0, TIMESTAMP '1997-01-02', '1-URGENT'),
          (990003, 1, 'O', 2e9, TIMESTAMP '1997-01-03', '1-URGENT')
        ) v(o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority)
    ) TO '{d}/orders.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (
        SELECT * FROM read_parquet('{SF_SMOKE}/events.parquet')
        UNION ALL
        SELECT * FROM (VALUES
          (9900001, TIMESTAMP '2024-01-05 00:00:01', 1, 'view', 1.0, '{{"k": "7"}}'),
          (9900002, TIMESTAMP '2024-01-05 00:00:02', 1, 'view', 1.0, '{{"k": 1.5}}'),
          (9900003, TIMESTAMP '2024-01-05 00:00:03', 1, 'view', 1.0, 'not json'),
          (9900004, TIMESTAMP '2024-01-05 00:00:04', 1, 'view', 1.0, '{{"k": true}}'),
          (9900005, TIMESTAMP '2024-01-05 00:00:05', 1, 'view', 1.0, '{{"k": 3000000000}}'),
          (9900006, TIMESTAMP '2024-01-05 00:00:06', 1, 'view', 1.0, NULL)
        ) v(event_id, ts, user_id, event_type, value, props)
    ) TO '{d}/events.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (
        SELECT * FROM read_parquet('{SF_SMOKE}/lineitem.parquet')
        UNION ALL
        SELECT * FROM (VALUES
          (990001, 1, 1, 1, NULL, NULL, NULL, NULL, 'N', 'O', TIMESTAMP '1997-02-01'),
          (990001, 1, 1, 2, -5.0, -100.0, 0.5, 0.0, 'R', 'F', NULL)
        ) v(l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
            l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate)
    ) TO '{d}/lineitem.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (
        SELECT * FROM read_parquet('{SF_SMOKE}/customer.parquet')
        UNION ALL
        SELECT * FROM (VALUES
          (990001, NULL, 0, NULL, NULL)
        ) v(c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment)  -- REAL parquet column order
    ) TO '{d}/customer.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (
        SELECT * FROM read_parquet('{SF_SMOKE}/part.parquet')
        UNION ALL
        SELECT * FROM (VALUES
          (990001, NULL, NULL, NULL, NULL, NULL)
        ) v(p_partkey, p_name, p_brand, p_type, p_size, p_retailprice)
    ) TO '{d}/part.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (
        SELECT * FROM read_parquet('{SF_SMOKE}/supplier.parquet')
        UNION ALL
        SELECT * FROM (VALUES
          (990001, NULL, 0, NULL)
        ) v(s_suppkey, s_name, s_nationkey, s_acctbal)
    ) TO '{d}/supplier.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (
        SELECT * FROM read_parquet('{SF_SMOKE}/embeddings.parquet')
        UNION ALL
        SELECT vec_id, embedding, label FROM (VALUES
          (990001, CAST(NULL AS FLOAT[]), 0),
          (990002, CAST([0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0] AS FLOAT[]), NULL)
        ) v(vec_id, embedding, label)
    ) TO '{d}/embeddings.parquet' (FORMAT PARQUET)"""
    )
    # More event poison: NULL event_type / NULL value (keys and timestamps
    # stay sane — the regen scenario changes values and dtypes, not keys).
    con.execute(
        f"""COPY (
        SELECT * FROM read_parquet('{d}/events.parquet')
        UNION ALL
        SELECT * FROM (VALUES
          (9900007, TIMESTAMP '2024-01-05 00:00:07', 2, NULL, 1.0, NULL),
          (9900008, TIMESTAMP '2024-01-05 00:00:08', 2, 'purchase', NULL, NULL),
          (9900009, TIMESTAMP '1969-12-31 23:59:59.999999', 3, 'view', 1.0, NULL),
          (9900010, TIMESTAMP '2199-06-15 12:00:00', 3, 'purchase', 2.0, NULL)
        ) v(event_id, ts, user_id, event_type, value, props)
    ) TO '{d}/events2.parquet' (FORMAT PARQUET)"""
    )
    os.replace(f"{d}/events2.parquet", f"{d}/events.parquet")
    con.close()
    return d


def _all_oracled():
    from inspig_etl_spark import queries as reg

    reg._load()
    return [q.name for q in reg.REGISTRY.values() if q.oracle is not None]


def test_parity_survives_hostile_rows(spark, hostile_dir):
    from tests.parity import sweep

    failures = sweep(spark, hostile_dir, _all_oracled())
    assert not failures, (
        f"{len(failures)} queries diverge on the hostile clone:\n"
        + "\n".join(failures)
    )


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory):
    """Schema-only clone: every table with zero rows — the degenerate end
    of the scale-factor axis (and of any filtered regen)."""
    d = str(tmp_path_factory.mktemp("empty"))
    con = duckdb.connect()
    for f in os.listdir(SF_SMOKE):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SF_SMOKE}/{f}') WHERE 1 = 0) "
            f"TO '{d}/{f}' (FORMAT PARQUET)"
        )
    con.close()
    return d


def test_parity_survives_empty_tables(spark, empty_dir):
    """Zero input rows must yield the SAME (usually zero-row, sometimes
    spine/zero-fill) result on both engines — no crashes on empty
    aggregates, windows, folds, or pivots."""
    from tests.parity import sweep

    failures = sweep(spark, empty_dir, _all_oracled())
    assert not failures, (
        f"{len(failures)} queries diverge on the empty clone:\n"
        + "\n".join(failures)
    )


def test_semdedup_two_level_survives_hostile_rows(spark, hostile_dir):
    """f>1 + poison together: target_cell=10 over the ~501-vector hostile
    corpus forces f=7, so the short 8-length vector's NULL fine scores flow
    through the composed-cell argmax on BOTH engines (the oracle's fs[1:f]
    slice vs Spark's zip-pad NULL dot) — the one combination neither the
    registered query (f=1 at driver SFs) nor the plain hostile sweep
    reaches (ADVICE r9)."""
    from inspig_etl_spark.queries.llm_clustering import (
        semdedup_oracle_sql,
        semdedup_prune_frame,
    )
    from tests.parity import compare, run_oracle

    df = semdedup_prune_frame(spark, hostile_dir, target_cell=10)
    cols, rows = run_oracle(semdedup_oracle_sql(target_cell=10), hostile_dir)
    compare("semdedup_f7_hostile", df, cols, rows)
