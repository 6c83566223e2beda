"""Landing readers: schema-enforced JSON-lines/CSV with corrupt-row
quarantine, and the land-then-decode composition with the S4 kernels."""

from __future__ import annotations

from inspig_etl_spark.sources.landing import read_csv, read_json_lines


def test_json_lines_quarantines_corrupt_rows(spark, tmp_path):
    p = tmp_path / "items.jsonl"
    p.write_text(
        '{"nx": 60, "ny": 127, "category": "T1H", "obsr_value": "-2.5"}\n'
        '{"nx": 61, "ny": 128, "category": "REH", "obsr_value": "80"}\n'
        "this is not json at all\n"
        '{"nx": "also-bad }\n'
    )
    good, rejects = read_json_lines(
        spark, str(p), "nx INT, ny INT, category STRING, obsr_value STRING"
    )
    rows = {r.nx: r for r in good.collect()}
    assert set(rows) == {60, 61}
    assert rows[60].obsr_value == "-2.5" and rows[61].category == "REH"
    bad = [r["_corrupt_record"] for r in rejects.collect()]
    assert len(bad) == 2 and any("not json" in b for b in bad)


def test_csv_schema_enforced_and_quarantine(spark, tmp_path):
    p = tmp_path / "obs.csv"
    p.write_text(
        "nx,ny,tm,ta\n"
        "60,127,2024-01-10 13:00,-1.2\n"
        "not-an-int,127,2024-01-10 14:00,0.5\n"
        "61,128,2024-01-10 15:00,3.5\n"
    )
    good, rejects = read_csv(spark, str(p), "nx INT, ny INT, tm STRING, ta STRING")
    rows = sorted((r.nx, r.ta) for r in good.collect())
    assert rows == [(60, "-1.2"), (61, "3.5")]
    # NOTE: count() would prune to the corrupt column alone, which Spark's
    # raw-relation guard rejects; materialize full rows instead (the real
    # usage — writing rejects out — references all columns anyway).
    assert len(rejects.collect()) == 1


def test_landed_json_feeds_decode_kernel(spark, tmp_path):
    """Land JSON items, then run the distributed nowcast decode on them —
    the file-landing twin of the REST-landed path."""
    from inspig_etl_spark.sources.weather_api import parse_ncst_items

    p = tmp_path / "ncst.jsonl"
    p.write_text(
        '{"nx": 60, "ny": 127, "base_date": "20240110", "base_time": "1200", "category": "T1H", "obsr_value": "-2.3"}\n'
        '{"nx": 60, "ny": 127, "base_date": "20240110", "base_time": "1200", "category": "PTY", "obsr_value": "3"}\n'
    )
    good, _ = read_json_lines(
        spark,
        str(p),
        "nx INT, ny INT, base_date STRING, base_time STRING, category STRING, obsr_value STRING",
    )
    r = parse_ncst_items(good).collect()[0]
    assert r.temp == -2.3 and r.weather_cd == "snow"
