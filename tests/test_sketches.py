"""Sketch accuracy/soundness properties beyond the hash-equality oracle.

The catalog oracle proves Spark and DuckDB compute the SAME sketch; these
tests prove the sketch is a CORRECT sketch: CMS never underestimates,
both estimators land near the exact answer on known data, and the HLL
register grain is what makes it mergeable.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_capstone_spark.operators import sketches as sk


def _ids_df(spark, n, label):
    return spark.range(n).select(
        F.lit(label).alias("grp"), F.concat(F.lit(f"{label}-"), F.col("id")).alias("k")
    )


def test_hll_estimate_near_truth(spark):
    # 5000 distinct keys, duplicated 3x: duplicates must not move registers.
    base = _ids_df(spark, 5000, "a")
    df = base.union(base).union(base)
    [(grp, est, nreg)] = (
        sk.hll_estimate(df, ["grp"], F.col("k")).collect()
    )
    assert nreg == sk.HLL_M  # all 64 registers hit at this cardinality
    # m=64 raw HLL: standard error ~1.04/sqrt(64) = 13%; allow 3 sigma.
    assert abs(est - 5000) / 5000 < 0.4


def test_hll_duplicates_are_free(spark):
    once = sk.hll_registers(_ids_df(spark, 1000, "x"), ["grp"], F.col("k"))
    thrice = sk.hll_registers(
        _ids_df(spark, 1000, "x").union(_ids_df(spark, 1000, "x")), ["grp"], F.col("k")
    )
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, thrice.collect()))


def test_hll_empty_registers_estimate_zero(spark):
    # An all-empty stream leaves ZERO registers; the global estimator must
    # report 0 distinct, not alpha*m^2/m ≈ 45 from 64 phantom empty
    # registers (the read_latest_snapshot_or_empty path of
    # streaming_distinct_users_hll).
    empty = spark.createDataFrame([], "bucket BIGINT, rho_max INT")
    [(est, nreg)] = sk.hll_estimate_from_registers(empty, []).collect()
    assert est == 0.0 and nreg == 0
    # grouped path: no groups -> no rows, never a phantom estimate
    assert sk.hll_estimate_from_registers(
        empty.withColumn("grp", F.lit("g")), ["grp"]
    ).count() == 0


def test_hll_registers_merge_across_partitions(spark):
    # Mergeability: registers of (A ∪ B) == element-wise max of registers.
    a, b = _ids_df(spark, 800, "g"), _ids_df(spark, 800, "h").withColumn(
        "grp", F.lit("g")
    )
    union_regs = sk.hll_registers(a.union(b), ["grp"], F.col("k"))
    merged = (
        sk.hll_registers(a, ["grp"], F.col("k"))
        .union(sk.hll_registers(b, ["grp"], F.col("k")))
        .groupBy("grp", "bucket")
        .agg(F.max("rho_max").alias("rho_max"))
    )
    assert sorted(map(tuple, union_regs.collect())) == sorted(
        map(tuple, merged.collect())
    )


def test_quantile_bins_merge_and_accuracy(spark):
    # Mergeability: bins of (A ∪ B) == per-bin sum of separate sketches;
    # accuracy: every reported quantile is within one bin width above the
    # exact order statistic.
    import numpy as np

    rs = np.random.RandomState(7)
    # shifted so ~1/4 of values are negative: bin = floor(v/w) must order
    # correctly through the sign change (floor, not trunc)
    vals = [float(v) - 30.0 for v in rs.gamma(4.0, 25.0, 4000)]
    half = len(vals) // 2
    a = spark.createDataFrame([("g", v) for v in vals[:half]], ["grp", "v"])
    b = spark.createDataFrame([("g", v) for v in vals[half:]], ["grp", "v"])
    u = a.union(b)
    w = 2.0
    union_bins = sk.quantile_bins(u, ["grp"], F.col("v"), w)
    merged = (
        sk.quantile_bins(a, ["grp"], F.col("v"), w)
        .union(sk.quantile_bins(b, ["grp"], F.col("v"), w))
        .groupBy("grp", "bin")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert sorted(map(tuple, union_bins.collect())) == sorted(
        map(tuple, merged.collect())
    )
    [row] = sk.quantiles_from_bins(union_bins, ["grp"], w).collect()
    assert row["n_rows"] == len(vals)
    svals = sorted(vals)
    import math

    for q in (0.5, 0.9, 0.99):
        exact = svals[math.ceil(q * len(svals)) - 1]
        est = row[f"p{int(q * 100)}"]
        assert exact <= est <= exact + w, (q, exact, est)


@pytest.fixture(scope="module")
def zipf_counts(spark):
    # Skewed frequencies: key i appears (50 - i) times for i in 0..49.
    rows = [(f"k{i}",) for i in range(50) for _ in range(50 - i)]
    return spark.createDataFrame(rows, ["k"])


def test_cms_never_underestimates_and_is_tight_here(spark, zipf_counts):
    counters = sk.cms_counters(zipf_counts, F.col("k"), d=4)
    assert counters.count() <= 4 * 256
    exact = zipf_counts.groupBy("k").agg(F.count(F.lit(1)).alias("exact_cnt"))
    est = sk.cms_point_estimates(counters, exact, "k", d=4)
    rows = est.collect()
    assert len(rows) == 50
    for r in rows:
        assert r.cms_estimate >= r.exact_cnt  # CMS is one-sided
    # 1275 total rows into 256 slots x 4 rows: collisions are rare enough
    # that at least the top key should be exact.
    top = max(rows, key=lambda r: r.exact_cnt)
    assert top.cms_estimate == top.exact_cnt


def test_bloom_no_false_negatives_and_bounded_fp(spark, sf_small):
    """Every inserted key must probe as present (no false negatives —
    the Bloom contract); false positives over a disjoint candidate set
    stay near the analytic k,m,n bound. Regression test for the
    element_at-on-map off-by-one that silently shifted every word of the
    dense bitmap (map lookup is BY KEY, not 1-based position)."""
    from pyspark.sql import functions as F

    from bigdata_capstone_spark.operators.sketches import (
        bloom_build,
        bloom_probe,
    )
    from bigdata_capstone_spark.sources.tables import load_table

    ev = load_table(spark, sf_small, "events")
    keys = ev.select(F.col("user_id").cast("string").alias("k")).distinct()
    n = keys.count()
    bm = bloom_build(keys, F.col("k"), 12, 4)
    present = bloom_probe(keys, bm, F.col("k"), 12, 4).count()
    assert present == n  # no false negatives
    absent = spark.range(1_000_000, 1_001_000).select(
        F.col("id").cast("string").alias("k")
    )
    fp = bloom_probe(absent, bm, F.col("k"), 12, 4).count()
    # analytic FP ~ (1 - exp(-k n / m))^k; generous 5x headroom
    import math

    p = (1 - math.exp(-4 * n / 4096)) ** 4
    assert fp <= max(5, 5 * p * 1000), (fp, p)


def test_quantiles_from_bins_guards(spark):
    """ADVICE r4: empty group_cols would plan the banned single-partition
    window — must raise; and sub-percent quantile labels must not collide
    (int(q*100) mapped 0.999 and 0.99 both to p99)."""
    import pytest

    df = spark.createDataFrame([("g", float(v)) for v in range(100)], ["grp", "v"])
    bins = sk.quantile_bins(df, ["grp"], F.col("v"), 2.0)
    with pytest.raises(ValueError, match="group_cols"):
        sk.quantiles_from_bins(bins, [], 2.0)
    [row] = sk.quantiles_from_bins(
        bins, ["grp"], 2.0, qs=(0.99, 0.999)
    ).collect()
    assert "p99" in row.asDict() and "p99_9" in row.asDict()
    assert row["p99_9"] >= row["p99"]
    with pytest.raises(ValueError, match="collide"):
        # identical labels after formatting must be rejected loudly
        sk.quantiles_from_bins(bins, ["grp"], 2.0, qs=(0.5, 0.5))
