from newyork_taxi_etl_spark.functions.datetime import (  # noqa: F401
    time_of_day_slot,
    with_calendar_features,
)
from newyork_taxi_etl_spark.functions.exact import (  # noqa: F401
    avg_exact,
    sum_exact,
)
