"""Oracle-checked query corpus (SURVEY.md §2 contract).

Importing this package loads every query module so the registry is
fully populated. ``registry.all_queries()`` / ``registry.all_oracles()``
are what ``__spark_entry__.py`` exposes to the driver.
"""

from xlearning_spark.queries import registry


def _load_all() -> None:
    # Import for registration side effects.
    from xlearning_spark.queries import relational  # noqa: F401
    from xlearning_spark.queries import eventsq  # noqa: F401
    from xlearning_spark.queries import llm  # noqa: F401
    from xlearning_spark.queries import reference_ops  # noqa: F401


_load_all()

all_queries = registry.all_queries
all_oracles = registry.all_oracles
