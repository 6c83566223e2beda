"""Unit tests for the S4 endpoint parsers (sources/weather_api.py) against
the reference's documented semantics (weather.py:407-664,984-1237,1999-2024).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from inspig_etl_spark.sources.weather_api import (
    asos_daily_params,
    asos_hourly_params,
    expand_mid_forecast,
    forecast_base_datetime,
    mid_base_datetime,
    mid_land_params,
    mid_land_reg_id,
    mid_ta_params,
    mid_ta_reg_id,
    ncst_base_datetime,
    ncst_params,
    parse_asos_daily_items,
    parse_asos_hourly_items,
    parse_ncst_items,
)

ITEM_SCHEMA = "nx int, ny int, base_date string, base_time string, category string, obsr_value string"


def _ncst(spark, items):
    rows = [(60, 127, "20240110", "1200", c, v) for c, v in items]
    return parse_ncst_items(spark.createDataFrame(rows, ITEM_SCHEMA)).collect()[0]


class TestNcstParse:
    def test_full_record(self, spark):
        r = _ncst(
            spark,
            [
                ("T1H", "-2.3"),
                ("RN1", "1.5mm"),
                ("REH", "82"),
                ("WSD", "3.4"),
                ("VEC", "270"),
                ("PTY", "1"),
                ("SKY", "4"),
            ],
        )
        assert r.wk_date == "20240110" and r.wk_time == "1200"
        assert r.temp == -2.3 and r.rain_amt == 1.5 and r.humidity == 82
        assert r.wind_speed == 3.4 and r.wind_dir == 270
        # PTY=1 (rain) wins over SKY=4.
        assert r.weather_cd == "rainy" and r.weather_nm == "비"
        assert r.is_forecast == "N" and r.rain_prob is None

    def test_no_rain_sentinel_and_null_sky_reads_clear(self, spark):
        r = _ncst(spark, [("RN1", "강수없음"), ("PTY", "0")])
        assert r.rain_amt == 0.0
        # PTY=0 falls through to SKY; missing SKY reads clear (code 1).
        assert r.weather_cd == "sunny" and r.weather_nm == "맑음"
        assert r.sky_cd is None and r.pty_cd == "0"

    def test_unparseable_values_are_null_not_errors(self, spark):
        r = _ncst(spark, [("T1H", "junk"), ("REH", "n/a"), ("RN1", "?mm")])
        assert r.temp is None and r.humidity is None
        assert r.rain_amt == 0.0  # junk rain coalesces to the 0 default

    def test_snow_via_pty(self, spark):
        r = _ncst(spark, [("PTY", "3"), ("SKY", "1")])
        assert r.weather_cd == "snow" and r.weather_nm == "눈"


class TestAsosHourly:
    SCHEMA = "nx int, ny int, tm string, ta string, rn string, hm string, ws string, wd string"

    def test_decode_and_rain_flip(self, spark):
        df = spark.createDataFrame(
            [
                (60, 127, "2024-01-10 13:00", "-1.2", "2.5", "80.4", "3.1", "180.0"),
                (60, 127, "2024-01-10 14:00", "0.5", "", "", "", ""),
                (60, 127, "garbage-no-space", "1", "1", "1", "1", "1"),
                (60, 127, None, "1", "1", "1", "1", "1"),
            ],
            self.SCHEMA,
        )
        rows = {r.wk_time: r for r in parse_asos_hourly_items(df).collect()}
        assert set(rows) == {"1300", "1400"}  # malformed tm rows dropped
        r = rows["1300"]
        assert r.wk_date == "20240110"
        assert r.temp == -1.2 and r.rain_amt == 2.5
        assert r.humidity == 80 and r.wind_dir == 180  # int(float(x)) truncation
        assert r.weather_cd == "rainy" and r.weather_nm == "비"
        r2 = rows["1400"]
        assert r2.rain_amt == 0.0 and r2.weather_cd == "sunny"
        assert r2.humidity is None and r2.sky_cd is None and r2.is_forecast == "N"


class TestAsosDaily:
    SCHEMA = (
        "nx int, ny int, tm string, avg_ta string, max_ta string, min_ta string, "
        "sum_rn string, avg_rhm string, avg_ws string"
    )

    def test_decode(self, spark):
        df = spark.createDataFrame(
            [
                (60, 127, "2024-01-10", "3.25", "8.5", "-1.75", "12.5", "75.8", "2.25"),
                (60, 127, "2024-01-11", "", "", "", "", "", ""),
                (60, 127, "", "1", "1", "1", "1", "1", "1"),
            ],
            self.SCHEMA,
        )
        rows = {r.wk_date: r for r in parse_asos_daily_items(df).collect()}
        assert set(rows) == {"20240110", "20240111"}
        r = rows["20240110"]
        assert r.temp_avg == 3.2 or r.temp_avg == 3.3  # round(3.25, 1)
        assert r.temp_high == 8.5 and r.temp_low == -1.8
        assert r.rain_amt == 12.5 and r.humidity == 75
        assert r.weather_cd == "rainy" and r.sky_cd == "1" and r.is_forecast == "N"
        r2 = rows["20240111"]
        assert r2.temp_avg is None and r2.rain_amt is None
        assert r2.weather_cd == "sunny"  # no rain info defaults clear


class TestMidExpand:
    def test_expansion_shape_and_semantics(self, spark):
        grids = spark.createDataFrame(
            [(60, 127, "11B10101", "11B00000"), (61, 128, "ZZ", "ZZ")],
            "nx int, ny int, ta_reg_id string, land_reg_id string",
        )
        ta_cols = {"ta_reg_id": "11B10101"}
        for d in range(3, 11):
            ta_cols[f"taMin{d}"] = d  # 3..10
            ta_cols[f"taMax{d}"] = d + 10
        ta_cols["taMin5"] = None  # one-sided day still kept
        land_cols = {"land_reg_id": "11B00000"}
        for d in range(3, 8):
            land_cols[f"wf{d}Am"] = "흐리고 비"
            land_cols[f"rnSt{d}Am"] = 30
            land_cols[f"rnSt{d}Pm"] = 60
        for d in range(8, 11):
            land_cols[f"wf{d}"] = "맑음"
            land_cols[f"rnSt{d}"] = 10
        land_cols["rnSt4Am"] = None  # missing AM side counts 0 in the max
        ta_schema = "ta_reg_id string, " + ", ".join(
            f"taMin{d} int, taMax{d} int" for d in range(3, 11)
        )
        land_schema = "land_reg_id string, " + ", ".join(
            [f"wf{d}Am string, rnSt{d}Am int, rnSt{d}Pm int" for d in range(3, 8)]
            + [f"wf{d} string, rnSt{d} int" for d in range(8, 11)]
        )
        ta = spark.createDataFrame([Row(**ta_cols)], ta_schema)
        land = spark.createDataFrame([Row(**land_cols)], land_schema)

        out = expand_mid_forecast(grids, ta, land, base_date="20240110")
        rows = {(r.nx, r.wk_date): r for r in out.collect()}

        # The unmapped grid has no ta response -> both temps null -> dropped.
        assert all(nx == 60 for nx, _ in rows)
        assert len(rows) == 8  # offsets 3..10
        r3 = rows[(60, "20240113")]  # base +3
        assert r3.temp_low == 3 and r3.temp_high == 13 and r3.temp_avg == 8.0
        assert r3.rain_prob == 60  # max(30, 60)
        assert r3.weather_cd == "rainy" and r3.sky_cd == "4"  # wet reads overcast
        assert r3.is_forecast == "Y"
        r4 = rows[(60, "20240114")]
        assert r4.rain_prob == 60  # max(0-for-missing-AM, 60)
        r5 = rows[(60, "20240115")]
        assert r5.temp_low is None and r5.temp_high == 15  # one-sided kept
        assert r5.temp_avg is None
        r9 = rows[(60, "20240119")]  # offset 9: whole-day fields
        assert r9.rain_prob == 10 and r9.weather_cd == "sunny" and r9.sky_cd == "1"

    def test_missing_land_leaves_weather_null(self, spark):
        grids = spark.createDataFrame(
            [(1, 1, "11B10101", "11B00000")],
            "nx int, ny int, ta_reg_id string, land_reg_id string",
        )
        ta_cols = {"ta_reg_id": "11B10101"}
        for d in range(3, 11):
            ta_cols[f"taMin{d}"], ta_cols[f"taMax{d}"] = 0, 10
        ta = spark.createDataFrame([Row(**ta_cols)])
        land = spark.createDataFrame(
            [], "land_reg_id string, " + ", ".join(
                [f"wf{d}Am string, rnSt{d}Am int, rnSt{d}Pm int" for d in range(3, 8)]
                + [f"wf{d} string, rnSt{d} int" for d in range(8, 11)]
            )
        )
        out = expand_mid_forecast(grids, ta, land, base_date="20240110").collect()
        assert len(out) == 8
        assert all(
            r.weather_cd is None and r.rain_prob is None and r.sky_cd is None
            for r in out
        )


class TestRegIdMaps:
    def test_mapping_and_defaults(self, spark):
        df = spark.createDataFrame(
            [("4113510000",), ("2611000000",), ("9900000000",), ("1",), (None,)],
            "sigun string",
        ).select(
            mid_ta_reg_id(F.col("sigun")).alias("ta"),
            mid_land_reg_id(F.col("sigun")).alias("land"),
        )
        got = [(r.ta, r.land) for r in df.collect()]
        assert got[0] == ("11B20601", "11B00000")  # Gyeonggi
        assert got[1] == ("11H10701", "11H10000")  # Busan
        assert got[2] == ("11B10101", "11B00000")  # unmapped -> Seoul default
        assert got[3] == ("11B10101", "11B00000")  # too short -> default
        assert got[4] == ("11B10101", "11B00000")  # null -> default


class TestBaseDatetimes:
    def test_ncst_minus_40min(self):
        assert ncst_base_datetime(datetime(2024, 1, 10, 12, 39)) == ("20240110", "1100")
        assert ncst_base_datetime(datetime(2024, 1, 10, 12, 41)) == ("20240110", "1200")
        assert ncst_base_datetime(datetime(2024, 1, 10, 0, 20)) == ("20240109", "2300")

    def test_forecast_3hourly_announce(self):
        assert forecast_base_datetime(datetime(2024, 1, 10, 12, 0)) == ("20240110", "1100")
        assert forecast_base_datetime(datetime(2024, 1, 10, 2, 5)) == ("20240109", "2300")
        assert forecast_base_datetime(datetime(2024, 1, 10, 2, 15)) == ("20240110", "0200")
        assert forecast_base_datetime(datetime(2024, 1, 10, 1, 0)) == ("20240109", "2300")
        assert forecast_base_datetime(datetime(2024, 1, 10, 23, 30)) == ("20240110", "2300")

    def test_mid_twice_daily(self):
        assert mid_base_datetime(datetime(2024, 1, 10, 6, 29)) == "202401091800"
        assert mid_base_datetime(datetime(2024, 1, 10, 6, 30)) == "202401100600"
        assert mid_base_datetime(datetime(2024, 1, 10, 18, 29)) == "202401100600"
        assert mid_base_datetime(datetime(2024, 1, 10, 18, 30)) == "202401101800"


class TestParams:
    def test_endpoint_param_shapes(self):
        p = ncst_params(60, 127, "20240110", "1200")
        assert p["nx"] == 60 and p["base_time"] == "1200" and p["dataType"] == "JSON"
        p = asos_hourly_params(108, "20240101", "00", "20240107", "23")
        assert p["dataCd"] == "ASOS" and p["dateCd"] == "HR" and p["stnIds"] == 108
        p = asos_daily_params(108, "20240101", "20240107")
        assert p["dateCd"] == "DAY" and "startHh" not in p
        assert mid_ta_params("11B10101", "202401100600")["regId"] == "11B10101"
        assert mid_land_params("11B00000", "202401100600")["tmFc"] == "202401100600"


class TestVillageForecast:
    """S3 getVilageFcst decode kernels (weather.py:741-982,1359-1420)."""

    FSCHEMA = (
        "nx int, ny int, base_date string, base_time string, "
        "fcst_date string, fcst_time string, category string, fcst_value string"
    )

    def _items(self, spark, rows):
        full = [("20240110", "1100") + r for r in rows]
        return spark.createDataFrame(
            [(60, 127, bd, bt, fd, ft, c, v) for bd, bt, fd, ft, c, v in full],
            self.FSCHEMA,
        )

    def test_hourly_decode_and_tmn_only_hour(self, spark):
        from inspig_etl_spark.sources.weather_api import parse_forecast_hourly

        raw = self._items(
            spark,
            [
                ("20240111", "0600", "TMP", "-1.5"),
                ("20240111", "0600", "POP", "30"),
                ("20240111", "0600", "PCP", "1.5mm"),
                ("20240111", "0600", "PTY", "1"),
                ("20240111", "0600", "SKY", "4"),
                # TMN-only hour still yields a (default-filled) record.
                ("20240111", "0700", "TMN", "-3.0"),
            ],
        )
        got = {r.wk_time: r for r in parse_forecast_hourly(raw).collect()}
        h6 = got["0600"]
        assert h6.temp == -1.5 and h6.rain_prob == 30 and h6.rain_amt == 1.5
        assert h6.weather_cd == "rainy" and h6.is_forecast == "Y"
        h7 = got["0700"]
        assert h7.temp is None and h7.rain_prob == 0 and h7.rain_amt == 0.0
        # No SKY/PTY at that hour -> the reference's dict-get default: unknown.
        assert h7.weather_cd == "unknown" and h7.weather_nm == "알수없음"

    def test_daily_skips_single_temp_days_and_rolls_up(self, spark):
        from inspig_etl_spark.sources.weather_api import parse_forecast_daily

        raw = self._items(
            spark,
            [
                # day 1: two temps -> kept; mode weather; POP max.
                ("20240111", "0600", "TMP", "10.5"),
                ("20240111", "0600", "SKY", "1"),
                ("20240111", "0600", "POP", "20"),
                ("20240111", "0900", "TMP", "12.5"),
                ("20240111", "0900", "SKY", "3"),
                ("20240111", "0900", "POP", "60"),
                ("20240111", "1200", "SKY", "3"),
                # day 2: one temp -> skipped.
                ("20240112", "0600", "TMP", "5.0"),
            ],
        )
        rows = parse_forecast_daily(raw).collect()
        assert [r.wk_date for r in rows] == ["20240111"]
        d = rows[0]
        assert d.temp_high == 12.5 and d.temp_low == 10.5
        assert d.temp_avg == 11.5 and d.rain_prob == 60
        # cloudy(2 hours) beats sunny(1 hour); first SKY item is '1'.
        assert d.weather_cd == "cloudy" and d.sky_cd == "1"

    def test_daily_mode_tie_breaks_on_first_appearance(self, spark):
        from inspig_etl_spark.sources.weather_api import parse_forecast_daily

        raw = self._items(
            spark,
            [
                ("20240111", "0300", "TMP", "1.0"),
                ("20240111", "0300", "SKY", "4"),   # overcast first at 03
                ("20240111", "0600", "TMP", "2.0"),
                ("20240111", "0600", "SKY", "1"),   # sunny first at 06
                ("20240111", "0900", "SKY", "4"),
                ("20240111", "1200", "SKY", "1"),   # 2x overcast vs 2x sunny
            ],
        )
        d = parse_forecast_daily(raw).collect()[0]
        assert d.weather_cd == "overcast"  # tie -> earliest first appearance

    def test_daily_tmn_tmx_backfill_precedence(self, spark):
        from inspig_etl_spark.sources.weather_api import parse_forecast_daily

        raw = self._items(
            spark,
            [
                ("20240111", "0600", "TMP", "1.0"),
                ("20240111", "0900", "TMP", "3.0"),
                ("20240111", "0600", "TMN", "-2.0"),   # primary present
                ("20240112", "0600", "TMP", "4.0"),
                ("20240112", "0900", "TMP", "6.0"),
                # day 2 has no parseable TMN/TMX -> backfilled from 05:00.
                ("20240112", "0600", "TMN", ""),
            ],
        )
        fb = spark.createDataFrame(
            [
                (60, 127, "20240111", "TMN", "-9.9"),  # must NOT override -2.0
                (60, 127, "20240112", "TMN", "-5.5"),
                (60, 127, "20240112", "TMX", "7.7"),
            ],
            "nx int, ny int, fcst_date string, category string, fcst_value string",
        )
        got = {r.wk_date: r for r in parse_forecast_daily(raw, tmn_tmx_raw=fb).collect()}
        assert got["20240111"].tmn == -2.0
        assert got["20240112"].tmn == -5.5 and got["20240112"].tmx == 7.7

    def test_collect_village_forecast_end_to_end(self, spark):
        from inspig_etl_spark.sources.rest import ApiKeyManager, RestSource
        from inspig_etl_spark.sources.weather_api import collect_village_forecast

        calls = []

        def transport(url, params):
            calls.append(params["base_time"])
            if params["base_time"] == "0500":
                item = [{"fcstDate": "20240111", "fcstTime": "0600",
                         "category": "TMX", "fcstValue": "9.5"}]
            else:
                item = [
                    {"fcstDate": "20240111", "fcstTime": "0600",
                     "category": "TMP", "fcstValue": "1.5"},
                    {"fcstDate": "20240111", "fcstTime": "0900",
                     "category": "TMP", "fcstValue": "3.5"},
                    {"category": "TMP", "fcstValue": "99"},  # dropped: no key
                ]
            return 200, {"response": {"body": {"items": {"item": item}}}}

        src = RestSource("http://x/getVilageFcst", ApiKeyManager(["k1"]), transport)
        daily, hourly = collect_village_forecast(
            spark, src, [(60, 127), (60, 127)], "20240110", "1100"
        )
        assert calls == ["1100", "0500"]  # grid deduped; 05:00 re-fetch ran
        d = daily.collect()[0]
        assert d.tmx == 9.5 and d.temp_high == 3.5 and d.temp_avg == 2.5
        assert hourly.count() == 2
