from fcs_etl_reactor_spark.functions.exact import (  # noqa: F401
    davg,
    dsum,
    o_davg,
    o_dsum,
)
