"""Operator library: Spark-first re-expressions of SURVEY.md §2.

Each module groups one operator family; every public function takes and
returns ``pyspark.sql.DataFrame`` so operators compose into lazy plans that
Catalyst optimizes as a whole (no eager materialization between steps).
"""
