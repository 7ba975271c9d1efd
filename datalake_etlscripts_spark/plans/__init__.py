from datalake_etlscripts_spark.plans.registry import (  # noqa: F401
    ORACLES,
    QUERIES,
    oracle_sql,
    queries,
    query,
)

# importing the modules registers their queries
from datalake_etlscripts_spark.plans import (  # noqa: F401, E402
    diffcrawl,
    events,
    featureops,
    functions_showcase,
    geoops,
    graphops,
    inference,
    lakeops,
    linkops,
    relational,
    sources,
    sources_formats,
    statops,
    streamtwins,
    sync,
    textops,
    tpch_more,
    txstore_plan,
    vectorops,
    versioned,
)
