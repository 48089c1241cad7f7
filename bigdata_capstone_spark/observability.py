"""Pipeline observability via Spark's Observation API.

Production pipelines need row counts / quality gauges per run WITHOUT a
second pass over the data: ``df.observe`` attaches aggregate metrics to
the plan itself — collected as a side effect of the action (one job, no
extra scan), unlike the reference's four separate ``count()`` actions
that each recomputed the lineage (splitting_data.py:42-45; SURVEY §4.2
anti-pattern 4).

At 100 TB an extra count() IS an extra 100 TB scan; observed metrics are
free. Works on batch actions; for streams the same metrics surface per
micro-batch via the StreamingQueryListener.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation


def run_with_metrics(
    df: DataFrame, metrics: dict[str, Column], sink_format: str = "noop"
) -> dict:
    """Execute ``df`` once into ``sink_format`` and return the observed
    metric values piggybacked on that single job.

    ``metrics`` maps output names to aggregate expressions, e.g.
    ``{"n_rows": F.count(F.lit(1)), "null_keys": F.count_if(F.col("k").isNull())}``.
    """
    obs = Observation()
    observed = df.observe(obs, *[c.alias(k) for k, c in metrics.items()])
    observed.write.format(sink_format).mode("overwrite").save()
    return obs.get
