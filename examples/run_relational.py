"""Relational surface demo: Engine session, registered tables, the
same query through SQL and the DataFrame API.

Reference analogue: a user's first `hbox-submit` smoke run
(tests/test-simple/test.sh) — submit something small, read the output.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_SF = "/root/testdata/sf0.001"


def main(spark, sf_dir: str = DEFAULT_SF) -> None:
    from pyspark.sql import functions as F

    from xlearning_spark.engine import Engine

    eng = Engine(spark, sf_dir)
    eng.register_tables()

    top_sql = eng.sql(
        """
        SELECT n.n_name, COUNT(*) AS n_customers
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name ORDER BY n_customers DESC, n_name LIMIT 5
        """
    )
    top_df = (
        eng.table("customer")
        .join(eng.table("nation"), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count("*").alias("n_customers"))
        .orderBy(F.desc("n_customers"), "n_name")
        .limit(5)
    )
    print("SQL API:")
    top_sql.show()
    print("DataFrame API (same plan family):")
    top_df.show()
    assert [tuple(r) for r in top_sql.collect()] == [tuple(r) for r in top_df.collect()]


if __name__ == "__main__":
    from xlearning_spark.engine import build_session

    main(build_session(app_name="example-relational"))
