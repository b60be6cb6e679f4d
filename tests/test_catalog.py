"""Catalog namespaces: persistent views in a database (the reference's
schema-namespace model) + temp-view bootstrap."""

from __future__ import annotations

import pyspark.sql.functions as F

from science_datalake_spark.catalog import register_views


def test_temp_views_and_convenience(spark, sf_oracle):
    out = register_views(spark, sf_oracle)
    assert "lineitem" in out and "documents" in out
    assert spark.sql("SELECT count(*) FROM recent_orders").first()[0] > 0
    assert spark.sql("SELECT count(*) FROM documents_en").first()[0] == 218


def test_database_namespace_views(spark, sf_oracle):
    spark.sql("DROP DATABASE IF EXISTS lake_sf001 CASCADE")
    register_views(spark, sf_oracle, database="lake_sf001")
    n = spark.sql("SELECT count(*) AS n FROM lake_sf001.orders").first()["n"]
    assert n == 15000
    # namespaced join across two schema-qualified views
    joined = spark.sql(
        """
        SELECT r.r_name, count(*) AS n
        FROM lake_sf001.nation n JOIN lake_sf001.region r
          ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
        """
    )
    assert joined.count() == 5
    # the view is lazy — it must reflect the file, not a copy
    dbs = [d.name for d in spark.catalog.listDatabases()]
    assert "lake_sf001" in dbs
    spark.sql("DROP DATABASE IF EXISTS lake_sf001 CASCADE")
