"""Operator library — each function is a composable DataFrame transform or a
``(spark, sf_dir) -> DataFrame`` query builder (SURVEY §2, §7.1)."""
