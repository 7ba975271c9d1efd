from datalake_etlscripts_spark.plans.registry import (  # noqa: F401
    ORACLES,
    QUERIES,
    oracle_sql,
    queries,
    query,
)

# importing the modules registers their queries
from datalake_etlscripts_spark.plans import relational, versioned  # noqa: F401, E402
