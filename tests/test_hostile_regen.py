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

DOC_QUERIES = [
    "docs_token_stats",
    "docs_quality_by_source",
    "docs_bpe_token_count",
    "docs_repetition_filter",
    "docs_lang_id",
    "docs_sequence_packing",
    "docs_chunk_dedup",
    "docs_pii_redaction",
    "docs_exact_dedup",
    "docs_fingerprint",
    "docs_stratified_hash_sample",
    "docs_reservoir_per_source",
    "docs_mix_weighted_epochs",
    "docs_simhash_neardup_pairs",
    "docs_minhash_neardup_pairs",
    "docs_ngram_jaccard_pairs",
    "docs_decontaminate_eval_overlap",
    "order_value_band_join",
    "json_props_extract",
]


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
          (90005, '', 'en', 'src1', 0)                  -- empty string text
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
    con.close()
    return d


@pytest.mark.parametrize("name", DOC_QUERIES)
def test_parity_survives_hostile_rows(spark, hostile_dir, name):
    from inspig_etl_spark import queries as reg

    reg._load()
    q = reg.REGISTRY[name]
    compare(q.name, q.fn(spark, hostile_dir), *run_oracle(q.oracle, hostile_dir))
