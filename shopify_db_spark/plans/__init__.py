"""Query plans: the declared query catalog (driver-checked against a
DuckDB oracle), the commerce invoice pipeline, and validation suites.
Importing this package registers every catalog query."""

from shopify_db_spark.plans.catalog import QUERIES, QuerySpec, query  # noqa: F401


def load_all() -> dict[str, "QuerySpec"]:
    """Import every query module so their ``@query`` registrations run."""
    from shopify_db_spark.plans import (  # noqa: F401
        commerce,
        commerce_checks,
        curation,
        eventops,
        legacy,
        linkage,
        mediaops,
        streamops,
        textops,
        tpch,
        vectorops,
    )

    return QUERIES
