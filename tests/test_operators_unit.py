"""Golden unit tests for operators with no SQL oracle: the UD1 status truth
table, week boundaries, prev/next windows, rounding edges, schedule SEQ
filtering, and wide-row padding.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from inspig_etl_spark.functions.dates import report_week_bounds
from inspig_etl_spark.functions.rounding import round_half_up
from inspig_etl_spark.operators.events import with_prev_next
from inspig_etl_spark.operators.schedule import DEFAULT_RULES, expand_schedule, rules_df
from inspig_etl_spark.operators.status import status_from_last_event


# The 8-state truth table from /root/reference/src/weekly/data_loader.py:28-46,
# with accident codes from the live SAGO_GUBUN_CD domain
# (/root/reference/src/weekly/processors/accident.py:20-37):
# (wk_gubun, sago_cd, daeri_yn, entry_status) -> expected status code.
TRUTH_TABLE = [
    ("G", None, "N", None, "010002"),  # mated -> pregnant
    ("B", None, "N", None, "010003"),  # farrowed -> nursing
    ("B", None, "Y", None, "010004"),  # farrowed + surrogate -> surrogate
    ("E", None, "N", None, "010005"),  # weaned
    ("F", "050008", "N", None, "010006"),  # accident: recurrence (재발)
    ("F", "050002", "N", None, "010007"),  # accident: abortion (유산)
    ("F", "050003", "N", "010002", "010002"),  # culling (도태) -> entry status
    ("F", "050009", "N", "010002", "010002"),  # other accident -> entry status
    (None, None, "N", None, "010001"),  # no event -> candidate
    (None, None, "N", "010005", "010005"),  # no event, entry status kept
]


def test_status_truth_table(spark):
    df = spark.createDataFrame(
        [(i, *row) for i, row in enumerate(TRUTH_TABLE)],
        "id INT, wk STRING, sago STRING, daeri STRING, entry STRING, expected STRING",
    )
    out = df.withColumn(
        "got",
        status_from_last_event(F.col("wk"), F.col("sago"), F.col("daeri"), F.col("entry")),
    )
    bad = out.filter(F.col("got") != F.col("expected")).collect()
    assert not bad, f"truth table mismatches: {bad}"


def test_report_week_bounds():
    # From a Wednesday: previous Mon..Sun week.
    assert report_week_bounds(dt.date(2024, 1, 10)) == (dt.date(2024, 1, 1), dt.date(2024, 1, 7))
    # From a Monday.
    assert report_week_bounds(dt.date(2024, 1, 8)) == (dt.date(2024, 1, 1), dt.date(2024, 1, 7))
    # From a Sunday: reference semantics back up a FULL week (days=7).
    assert report_week_bounds(dt.date(2024, 1, 14)) == (dt.date(2024, 1, 1), dt.date(2024, 1, 7))
    # Year boundary.
    assert report_week_bounds(dt.date(2025, 1, 1)) == (dt.date(2024, 12, 23), dt.date(2024, 12, 29))


def test_with_prev_next(spark):
    df = spark.createDataFrame(
        [(1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (2, 1, "x")],
        "k INT, seq INT, v STRING",
    )
    out = {
        (r.k, r.seq): (r.prev_v, r.next_v)
        for r in with_prev_next(df, keys=["k"], order_by=["seq"], cols=["v"]).collect()
    }
    assert out[(1, 1)] == (None, "b")
    assert out[(1, 2)] == ("a", "c")
    assert out[(1, 3)] == ("b", None)
    assert out[(2, 1)] == (None, None)  # windows never cross keys


def test_round_half_up_edges(spark):
    # x.5 at 1 decimal must round AWAY from zero (Oracle ROUND), not banker's.
    df = spark.createDataFrame(
        [(0.25,), (0.35,), (1.25,), (2.5,), (-0.25,)], "x DOUBLE"
    ).select(
        round_half_up(F.col("x"), 1).alias("r1"),
        round_half_up(F.col("x"), 0).alias("r0"),
    )
    rows = df.collect()
    # Spark rounds the SHORTEST decimal repr of the double (BigDecimal
    # .valueOf), so 0.35 -> 0.4 even though the binary value is 0.34999…;
    # DuckDB's multiply-then-round agrees on these values (parity suite
    # guards the general case).
    assert [r.r1 for r in rows] == [0.3, 0.4, 1.3, 2.5, -0.3]
    assert rows[3].r0 == 3.0  # 2.5 -> 3 (banker's would give 2)
    assert rows[4].r1 == -0.3  # half away from zero


def test_schedule_seq_filter_protocol(spark):
    last = spark.createDataFrame(
        [(1, "G", dt.date(2024, 1, 1))], "user_id INT, wk_gubun STRING, event_day DATE"
    )
    rules = rules_df(spark)

    def run(seq_filter):
        return expand_schedule(
            last, rules, "event_day", "2024-01-01", "2024-12-31", seq_filter=seq_filter
        ).count()

    g_rules = sum(1 for r in DEFAULT_RULES if r[1] == "G")
    assert run(None) == g_rules  # -1 protocol: all tasks
    assert run([]) == 0  # '' protocol: none
    assert run([1]) == 1  # '1,2,3' protocol: listed only


def test_chunked_wide_rows_padding(spark):
    from inspig_etl_spark.operators.pivots import chunked_wide_rows

    df = spark.createDataFrame(
        [(f"n{i}", i) for i in range(7)], "nm STRING, cnt INT"
    )
    out = chunked_wide_rows(
        df, order_by=[F.col("cnt").desc()], name_col="nm", value_col="cnt", per_row=5
    ).collect()
    by_chunk = {r.chunk_no: r for r in out}
    assert set(by_chunk) == {0, 1}
    assert by_chunk[0].str_1 == "n6" and by_chunk[0].cnt_1 == 6
    assert by_chunk[1].str_2 == "n0" and by_chunk[1].cnt_2 == 0
    assert by_chunk[1].str_3 is None and by_chunk[1].cnt_3 is None  # NULL tail


def test_salted_join_matches_plain_join(spark):
    from inspig_etl_spark.operators.skew import salted_join

    big = spark.createDataFrame(
        [(k, v) for k in ("hot", "warm", "cold") for v in range(40 if k == "hot" else 3)],
        "k STRING, v INT",
    )
    small = spark.createDataFrame([("hot", 1), ("cold", 2), ("absent", 3)], "k STRING, d INT")
    plain = sorted(big.join(small, "k").collect())
    salted = sorted(salted_join(big, small, on=["k"], n_salts=4).collect())
    assert salted == plain
    left_plain = sorted(big.join(small, "k", "left").collect())
    left_salted = sorted(salted_join(big, small, on=["k"], n_salts=4, how="left").collect())
    assert left_salted == left_plain
    import pytest

    with pytest.raises(ValueError):
        salted_join(big, small, on=["k"], how="full")


def test_parse_seq_filter_protocol():
    """The reference's '-1' / '' / '1,2,3' TB_PLAN_MODON.SEQ filter protocol
    (schedule.py:186-207): -1 = all tasks, '' = none, csv = that subset."""
    from inspig_etl_spark.operators.schedule import parse_seq_filter

    assert parse_seq_filter("-1") is None
    assert parse_seq_filter(None) is None
    assert parse_seq_filter("") == []
    assert parse_seq_filter("1,2,3") == [1, 2, 3]
    assert parse_seq_filter("5") == [5]


def test_expand_schedule_seq_filter_strings(spark):
    df = spark.createDataFrame(
        [(1, "G", dt.date(2024, 1, 20))], "user_id INT, wk_gubun STRING, event_day DATE"
    )
    rules = rules_df(spark)
    full = expand_schedule(df, rules, "event_day", "2024-01-01", "2024-12-31")
    sub = expand_schedule(
        df, rules, "event_day", "2024-01-01", "2024-12-31", seq_filter="1,2"
    )
    none = expand_schedule(
        df, rules, "event_day", "2024-01-01", "2024-12-31", seq_filter=""
    )
    assert full.count() == 3  # G has rules 1, 2, 3
    assert sorted(r.task_seq for r in sub.collect()) == [1, 2]
    assert none.count() == 0


def test_farm_default_schedule_mating_clamps_early_to_first_day(spark):
    from inspig_etl_spark.operators.schedule import farm_default_schedule

    df = spark.createDataFrame(
        [
            (1, "E", "N", dt.date(2024, 1, 1)),   # +7 = Jan 8, early -> clamp to Jan 22
            (2, "F", "N", dt.date(2024, 1, 23)),  # +1 = Jan 24, in window
            (3, "G", "N", dt.date(2024, 1, 1)),   # farrowing +115 = Apr 25, OUT (no clamp)
            (4, "B", "Y", dt.date(2024, 1, 10)),  # weaning +21 = Jan 31, OUT of window
        ],
        "user_id INT, wk_gubun STRING, daeri_yn STRING, event_day DATE",
    )
    out = {
        r.user_id: (r.schedule_type, str(r.pass_dt))
        for r in farm_default_schedule(df, "2024-01-22", "2024-01-28").collect()
    }
    assert out == {
        1: ("mating", "2024-01-22"),
        2: ("mating", "2024-01-24"),
    }


def test_two_stage_count_distinct(spark):
    from inspig_etl_spark.operators.skew import two_stage_count_distinct

    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", 2), ("b", 9)], "k STRING, u INT"
    )
    got = {r.k: r.n_distinct for r in two_stage_count_distinct(df, ["k"], "u").collect()}
    assert got == {"a": 2, "b": 1}


def test_two_stage_count_distinct_null_semantics(spark):
    """COUNT(DISTINCT x) never counts NULL; an all-NULL key still groups."""
    from inspig_etl_spark.operators.skew import two_stage_count_distinct

    df = spark.createDataFrame(
        [("a", 1), ("a", None), ("a", 2), ("b", None), ("b", None)],
        "k STRING, u INT",
    )
    got = {r.k: r.n_distinct for r in two_stage_count_distinct(df, ["k"], "u").collect()}
    sql = {
        r.k: r.n_distinct
        for r in df.groupBy("k").agg(F.countDistinct("u").alias("n_distinct")).collect()
    }
    assert got == sql == {"a": 2, "b": 0}


def test_parse_mid_weather_truth_table(spark):
    """_parse_mid_weather (weather.py:2332-2362): precipitation words beat
    sky words; empty/unknown fall back to cloudy."""
    from inspig_etl_spark.functions.weather_codes import parse_mid_weather_cd

    CASES = [
        ("맑음", "sunny"),
        ("구름많음", "cloudy"),
        ("구름 많음", "cloudy"),
        ("흐림", "overcast"),
        ("흐리고 비", "rainy"),      # rain beats overcast
        ("비/눈", "rain_snow"),
        ("눈", "snow"),
        ("소나기", "rainy"),
        ("흐리고 눈", "snow"),
        ("", "cloudy"),
        (None, "cloudy"),
        ("안개", "cloudy"),          # unknown -> default
    ]
    df = spark.createDataFrame(
        [(i, txt, want) for i, (txt, want) in enumerate(CASES)],
        "id INT, txt STRING, want STRING",
    )
    out = df.withColumn("got", parse_mid_weather_cd(F.col("txt")))
    bad = out.filter(F.col("got") != F.col("want")).collect()
    assert not bad, f"parse mismatches: {bad}"


class TestConnectedComponents:
    """Transitive near-dup clustering (operators/dedup.connected_components)."""

    @staticmethod
    def _run(spark, pairs, ids, **kw):
        from inspig_etl_spark.operators.dedup import connected_components

        pdf = spark.createDataFrame(pairs or [(None, None)], "id_a long, id_b long")
        if not pairs:
            pdf = pdf.where("id_a IS NOT NULL")
        nodes = spark.createDataFrame([(i,) for i in ids], "doc_id long")
        out = connected_components(pdf, nodes, "doc_id", **kw)
        return {r.doc_id: r.cluster_id for r in out.collect()}

    def test_chain_collapses_to_min(self, spark):
        # 1-2, 2-3, 3-4 is one component even though 1 and 4 never pair.
        got = self._run(spark, [(1, 2), (2, 3), (3, 4), (6, 7)], [1, 2, 3, 4, 5, 6, 7])
        assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 6, 7: 6}

    def test_cycle_terminates(self, spark):
        got = self._run(spark, [(1, 2), (2, 3), (1, 3)], [1, 2, 3])
        assert got == {1: 1, 2: 1, 3: 1}

    def test_empty_pairs_all_singletons(self, spark):
        got = self._run(spark, [], [10, 20])
        assert got == {10: 10, 20: 20}

    def test_star_agrees_with_propagation(self, spark):
        # Mixed topology: chain, triangle+tail, singleton, 2-clique.
        pairs = [(1, 2), (2, 3), (3, 4), (6, 7), (7, 8), (6, 8), (8, 9), (11, 12)]
        ids = list(range(1, 13))
        prop = self._run(spark, pairs, ids, algorithm="propagation")
        star = self._run(spark, pairs, ids, algorithm="star")
        assert star == prop

    def test_auto_switches_on_long_path(self, spark):
        # A 40-node path has diameter 39: propagation alone would need ~39
        # rounds, so with switch_after=3 the auto path MUST hand off to the
        # star contraction — and still land every node on the component min.
        n = 40
        pairs = [(i, i + 1) for i in range(1, n)]
        got = self._run(
            spark, pairs, list(range(1, n + 1)), algorithm="auto", switch_after=3
        )
        assert got == {i: 1 for i in range(1, n + 1)}

    def test_propagation_budget_is_honored_without_auto(self, spark):
        # Sanity: explicit propagation with a tiny budget does NOT magically
        # finish a long path (guards against the auto switch leaking into
        # the plain algorithm).
        pairs = [(i, i + 1) for i in range(1, 20)]
        got = self._run(
            spark, pairs, list(range(1, 21)), algorithm="propagation", max_iters=2
        )
        assert got[20] != 1  # label hasn't reached the far end in 2 rounds

    def test_star_contraction_round_bound_on_path(self, spark):
        # The Kiveris et al. bound is O(log^2 n) rounds on any topology; a
        # path graph is the adversarial case for per-diameter propagation
        # (256 nodes -> diameter 255). Assert the measured round count stays
        # within log2(n)^2 — orders below the ~n rounds propagation needs.
        import math

        from inspig_etl_spark.operators.dedup import _alternating_star

        n = 256
        und = (
            spark.createDataFrame(
                [(i, i + 1) for i in range(1, n)], "u long, v long"
            )
            .persist()
        )
        star, rounds = _alternating_star(und, max_rounds=64)
        labels = {r.v: r.u for r in star.collect()}
        star.unpersist()
        assert all(root == 1 for root in labels.values())
        assert set(labels) == set(range(2, n + 1))  # depth-1 star over all
        assert rounds <= int(math.log2(n)) ** 2, rounds


class TestLinearInterpolate:
    def test_interior_leading_trailing_and_allnull(self, spark):
        from inspig_etl_spark.operators.timeseries import linear_interpolate

        rows = [
            # series A: leading gap, interior 2-wide gap, trailing gap
            ("A", 0, None), ("A", 1, 10.0), ("A", 2, None), ("A", 3, None),
            ("A", 4, 40.0), ("A", 5, None),
            # series B: all NULL stays NULL
            ("B", 0, None), ("B", 1, None),
        ]
        df = spark.createDataFrame(rows, "k string, t int, v double")
        got = {
            (r.k, r.t): r.value_filled
            for r in linear_interpolate(df, ["k"], "t", "v").collect()
        }
        assert got[("A", 0)] == 10.0        # leading gap back-fills
        assert got[("A", 1)] == 10.0        # observed passes through
        assert got[("A", 2)] == 20.0        # 10 + (40-10) * 1/3
        assert got[("A", 3)] == 30.0
        assert got[("A", 5)] == 40.0        # trailing gap forward-fills
        assert got[("B", 0)] is None and got[("B", 1)] is None


def test_asof_single_scan_matches_union_asof(spark):
    """The single-scan as-of kernel must agree with the generic two-input
    asof_join on both strict and inclusive semantics, including ties."""
    from inspig_etl_spark.operators.events import asof_join, asof_value_single_scan
    from pyspark.sql import functions as F

    rows = [
        # (key, ts, id, side, val)  — tie at ts=5 exercises strictness
        ("u1", 1, 1, "R", 10.0),
        ("u1", 5, 2, "L", None),
        ("u1", 5, 3, "R", 50.0),
        ("u1", 9, 4, "L", None),
        ("u2", 2, 5, "L", None),   # left with no earlier right
        ("u2", 3, 6, "R", 30.0),
        ("u2", 4, 7, "L", None),
    ]
    df = spark.createDataFrame(rows, "k string, t int, id int, side string, val double")
    for strict in (True, False):
        left = df.filter(F.col("side") == "L").select("k", "t", "id")
        right = df.filter(F.col("side") == "R").select(
            "k", "t", "id", F.col("val").alias("rv")
        )
        expect = {
            (r.k, r.id): r.rv_asof
            for r in asof_join(
                left, right, keys=["k"], left_ts="t", right_ts="t",
                right_vals=["rv"], strict=strict, tiebreak=["id"],
            ).collect()
        }
        got = {
            (r.k, r.id): r.asof_value
            for r in asof_value_single_scan(
                df, keys=["k"], ts="t",
                is_left=F.col("side") == "L",
                right_val=F.col("val"),
                tiebreak=["id"], strict=strict,
            ).collect()
        }
        assert got == expect, f"strict={strict}: {got} != {expect}"


def test_token_len_sum_null_and_empty_text_parity(spark):
    """NULL / empty / whitespace-only text must yield 0 on BOTH engines
    (ADVICE r4/r5: a missing outer COALESCE would return NULL on the Spark
    side for NULL token arrays while the oracle returns 0)."""
    import duckdb
    from pyspark.sql import functions as F

    from inspig_etl_spark.functions.text import (
        sql_token_len_sum,
        sql_tokens,
        token_len_sum,
        tokens,
    )

    df = spark.createDataFrame(
        [(1, "hello world"), (2, None), (3, ""), (4, "   ")], "id int, text string"
    )
    got = {
        r.id: r.s
        for r in df.select("id", token_len_sum(tokens(F.col("text"))).alias("s")).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d AS SELECT * FROM (VALUES (1,'hello world'),(2,NULL),(3,''),(4,'   ')) t(id, text)"
    )
    want = {
        k: int(v)
        for k, v in con.execute(
            f"SELECT id, {sql_token_len_sum(sql_tokens('text'))} FROM d"
        ).fetchall()
    }
    assert got == want == {1: 10, 2: 0, 3: 0, 4: 0}


# --- round-6 kernels: PII redaction, chunk dedup -------------------------
#
# The parity tests prove Spark and DuckDB agree on the registry queries;
# these golden tests pin the KERNEL INTENT on hand-written real-shaped
# inputs (actual emails/phones/IPs, actual duplicate chunks), so a driver
# testdata regeneration can never silently hollow the queries out.


def test_pii_patterns_on_real_shaped_text(spark):
    from inspig_etl_spark.queries.llm_text import _PII_EMAIL, _PII_IP, _PII_PHONE

    rows = [
        (1, "mail a.b-c_d@sub.example.co.kr now", 1, 0, 0),
        (2, "call 010-1234-5678 or 011-123-4567", 0, 2, 0),
        (3, "from 192.168.0.1 to 10.0.255.254", 0, 0, 2),
        (4, "plain text, no pii at all", 0, 0, 0),
        (5, "x@y.io 019-9999-0000 8.8.8.8", 1, 1, 1),
        # non-matches: bare @, short TLD, 2-digit phone block, 3-part IP
        (6, "a@b a@b.c 012-12-1234 1.2.3", 0, 0, 0),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t, *_ in rows], "doc_id INT, aug STRING"
    )
    got = {
        r["doc_id"]: (r["e"], r["p"], r["i"])
        for r in df.select(
            "doc_id",
            F.size(F.regexp_extract_all("aug", F.lit(_PII_EMAIL), 0)).alias("e"),
            F.size(F.regexp_extract_all("aug", F.lit(_PII_PHONE), 0)).alias("p"),
            F.size(F.regexp_extract_all("aug", F.lit(_PII_IP), 0)).alias("i"),
        ).collect()
    }
    for doc_id, _, e, p, i in rows:
        assert got[doc_id] == (e, p, i), f"doc {doc_id}: {got[doc_id]} != {(e, p, i)}"


def test_pii_redaction_replaces_every_occurrence(spark):
    from inspig_etl_spark.queries.llm_text import _PII_EMAIL, _PII_IP, _PII_PHONE

    df = spark.createDataFrame(
        [(1, "a@b.co then c@d.org then 010-1111-2222 at 1.2.3.4")], "id INT, t STRING"
    )
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("t", _PII_EMAIL, "<EMAIL>"), _PII_PHONE, "<PHONE>"
        ),
        _PII_IP,
        "<IP>",
    )
    out = df.select(red.alias("r")).first()["r"]
    assert out == "<EMAIL> then <EMAIL> then <PHONE> at <IP>"


def test_chunk_dedup_keeps_globally_first_occurrence(spark, tmp_path):
    # doc 1: chunks [a b c] [d e f]; doc 2 repeats [a b c] then a fresh one;
    # doc 3 repeats BOTH of its own chunks from docs 1+2; doc 4 too short
    # for any chunk (dropped from output like the registry query drops it).
    docs = [
        (1, "a b c d e f"),
        (2, "a b c x y z"),
        (3, "d e f x y z"),
        (4, "a b"),
    ]
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                "text": [t for _, t in docs],
                "lang": ["en"] * len(docs),
                "source": ["unit"] * len(docs),
                "n_chars": pa.array([len(t) for _, t in docs], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    from inspig_etl_spark.queries.llm_dedup import docs_chunk_dedup

    got = {
        r["doc_id"]: (r["n_chunks"], r["n_kept_chunks"], r["n_removed_chunks"])
        for r in docs_chunk_dedup(spark, str(tmp_path)).collect()
    }
    assert got == {1: (2, 2, 0), 2: (2, 1, 1), 3: (2, 0, 2)}


def test_sequence_packing_greedy_semantics(spark, tmp_path):
    # capacity 128: doc1 (100) seeds bin 0; doc2 (30) overflows -> bin 1;
    # doc3 (200, oversized) -> bin 2 alone; doc4 (1) fits nothing prior ->
    # joins bin 2? NO — greedy never back-fills: 200+1 > 128 -> bin 3.
    # Other source packs independently from bin 0.
    import pyarrow as pa
    import pyarrow.parquet as pq

    def words(n):
        return " ".join(f"w{i}" for i in range(n))

    docs = [
        (1, words(100), "a"),
        (2, words(30), "a"),
        (3, words(200), "a"),
        (4, words(1), "a"),
        (5, words(128), "b"),
        (6, words(128), "b"),
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([d for d, *_ in docs], pa.int64()),
                "text": [t for _, t, _ in docs],
                "lang": ["en"] * len(docs),
                "source": [s for *_, s in docs],
                "n_chars": pa.array([len(t) for _, t, _ in docs], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    from inspig_etl_spark.queries.llm_text import docs_sequence_packing

    got = {
        r.doc_id: (r.source, r.n_tokens, r.bin_no, r.bin_fill)
        for r in docs_sequence_packing(spark, str(tmp_path)).collect()
    }
    assert got == {
        1: ("a", 100, 0, 100),
        2: ("a", 30, 1, 30),
        3: ("a", 200, 2, 200),
        4: ("a", 1, 3, 1),
        5: ("b", 128, 0, 128),
        6: ("b", 128, 1, 128),
    }


def test_asof_single_scan_rejects_colliding_columns(spark):
    """The tag/output columns must never silently replace caller data —
    same contract the two-input asof_join enforces."""
    import pytest

    from inspig_etl_spark.operators.events import asof_value_single_scan

    df = spark.createDataFrame([(1, 10, "x", 1.0)], "k INT, ts_us LONG, asof_value STRING, v DOUBLE")
    with pytest.raises(ValueError, match="collide"):
        asof_value_single_scan(
            df, keys=["k"], ts="ts_us", is_left=F.lit(True), right_val=F.col("v")
        )


def test_runner_manual_accepts_farm_zero(tmp_path, capsys):
    """Regression: farm 0 exists in the synthetic data (user_id % 10); the
    --manual guard must test 'is None', not falsiness."""
    from inspig_etl_spark.runner import main

    rc = main(
        [
            "weekly", "--manual", "--farm-no", "0", "--dry-run",
            "--base-date", "2024-01-10", "--sf-dir", "/root/testdata/sf0.001",
            "--output", str(tmp_path / "out"),
        ]
    )
    out = capsys.readouterr()
    assert rc == 0, out.err
    assert "ERROR" not in out.err


def test_cosine_topk_survives_zero_norm_embedding(spark):
    """Regression: an all-zeros embedding made sim divide by zero — a job-
    killing DIVIDE_BY_ZERO under Spark 4's default ANSI mode."""
    from inspig_etl_spark.operators.similarity import cosine_topk

    rows = [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.0, 0.0])]
    q = spark.createDataFrame(rows, "q_id BIGINT, q_vec ARRAY<DOUBLE>")
    c = spark.createDataFrame(
        [(i, v) for i, v in rows], "c_id BIGINT, c_vec ARRAY<DOUBLE>"
    )
    got = cosine_topk(q, c, k=2, query_id="q_id", corpus_id="c_id").collect()
    assert got  # no SparkArithmeticException; zero-norm pairs rank last (NULL sim)


def test_linear_interpolate_duplicate_timestamp_anchor(spark):
    """Regression: a NULL row sharing its timestamp with an observed row
    resolved both anchors to the same instant — 0/0 under ANSI mode."""
    from inspig_etl_spark.operators.timeseries import linear_interpolate

    df = spark.createDataFrame(
        [(1, 5, 10.0), (1, 5, None), (1, 7, 20.0)], "k INT, t INT, v DOUBLE"
    )
    got = linear_interpolate(df, ["k"], "t", "v").collect()
    filled = [r.value_filled for r in got if r.v is None]
    assert filled == [10.0]  # degenerates to the same-instant observation


def test_simhash_tokenless_docs_are_not_neardups(spark, tmp_path):
    """Regression: punct-only docs all sketched to simhash 0 and verified
    as Hamming-0 'near-dups' of each other despite sharing no content."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = [(1, "!!! ???"), (2, "... ---"), (3, "real words here overlap"),
            (4, "real words here overlap too")]
    pq.write_table(
        pa.table({
            "doc_id": pa.array([d for d, _ in docs], pa.int64()),
            "text": [t for _, t in docs],
            "lang": ["en"] * 4, "source": ["u"] * 4,
            "n_chars": pa.array([len(t) for _, t in docs], pa.int64()),
        }),
        str(tmp_path / "documents.parquet"),
    )
    from inspig_etl_spark.queries.llm_dedup import (
        docs_minhash_neardup_pairs,
        docs_simhash_neardup_pairs,
    )

    sim_pairs = {(r.id_a, r.id_b) for r in docs_simhash_neardup_pairs(spark, str(tmp_path)).collect()}
    assert (1, 2) not in sim_pairs  # token-less docs never pair
    # minhash: the zero-shingle docs (1, 2 — no 3-gram shingles) are excluded
    # from banding instead of colliding in one sentinel bucket.
    mh_pairs = {(r.id_a, r.id_b) for r in docs_minhash_neardup_pairs(spark, str(tmp_path)).collect()}
    assert all(a not in (1, 2) and b not in (1, 2) for a, b in mh_pairs)


def test_asof_join_rejects_output_name_collision(spark):
    import pytest

    from inspig_etl_spark.operators.events import asof_join

    left = spark.createDataFrame(
        [(1, 10, 5.0)], "k INT, t INT, price_asof DOUBLE"
    )
    right = spark.createDataFrame([(1, 5, 1.0)], "k INT, t INT, price DOUBLE")
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, ["k"], "t", "t", ["price"])


def test_resize_blob_shorter_than_header_is_foreign(spark):
    import pytest
    from pyspark.errors import PythonException

    from inspig_etl_spark.operators.multimodal import resize_media

    df = spark.createDataFrame(
        [(1, "image", b"IM\x01", (1, 1, 1))],
        "id BIGINT, media_type STRING, blob BINARY, meta STRUCT<width:INT,height:INT,channels:INT>",
    )
    with pytest.raises(PythonException, match="NotImplementedError"):
        resize_media(df, 2, 2).collect()
