"""Oracle-checked query corpus (SURVEY.md §2 contract).

Importing this package loads every query module so the registry is
fully populated. ``registry.all_queries()`` / ``registry.all_oracles()``
are what ``__spark_entry__.py`` exposes to the driver.
"""

from importlib import import_module

from xlearning_spark.queries import registry

#: Query modules imported for their @query registration side effects.
_MODULES = ("relational", "eventsq", "llm", "reference_ops")


def _load_all() -> None:
    for mod in _MODULES:
        # A missing/broken module must never take down the whole corpus:
        # the driver grades whatever registered successfully.
        try:
            import_module(f"xlearning_spark.queries.{mod}")
        except Exception as exc:  # pragma: no cover - defensive
            import warnings

            warnings.warn(f"query module {mod!r} failed to load: {exc}")


_load_all()

all_queries = registry.all_queries
all_oracles = registry.all_oracles
