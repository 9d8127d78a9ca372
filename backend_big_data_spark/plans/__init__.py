"""Named query plans over the test-data catalog.

Importing :mod:`backend_big_data_spark.plans.all_plans` populates the
registry consumed by ``__spark_entry__.py`` (the driver contract) and by
``bench.py``.
"""
