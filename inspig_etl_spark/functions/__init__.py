from inspig_etl_spark.functions.rounding import dec_avg, dec_sum, round_half_up  # noqa: F401
from inspig_etl_spark.functions.dates import date_spine, iso_week, iso_year  # noqa: F401
