"""Synthesize a larger-SF dataset from sf0.1 for SCALING measurement.

Usage: python tools/scale_up_testdata.py <src_sf_dir> <out_dir> <factor>

r10 verdict Next-round #3: at sf0.1 every headline query runs as fast
or faster on 8 cores than on 32 — the tables are too small to measure
data-parallel scaling, and /root/testdata is read-only (driver-owned,
no larger SF provided). This tool replicates the sf0.1 tables
``factor`` times into a SCRATCH directory so one recorded sitting can
separate queries that parallelize from genuinely driver-bound ones.
It is a measurement fixture, NOT part of the oracle/bench contract:
nothing in the engine reads it unless $SPARK_GRAFT_SF_DIR points at it.

Replication scheme (deterministic, replica i in 0..factor-1):
- every entity key (custkey, orderkey, partkey, suppkey, user_id,
  doc_id, vec_id) offsets by i * 100_000_000 — replicas are disjoint
  sub-universes, so every join/filter keeps its selectivity;
- dimension tables (region, nation) are NOT replicated (fixed-size
  dims, like production);
- embeddings are circularly shifted by i positions — distinct vectors
  with identical norms/distribution, so replicas do not collapse into
  exact-duplicate points (which would blow up every LSH bucket);
- document/text tokens get a per-replica suffix (replica 0 unchanged)
  so shingle/minhash dedup does not explode with factor² cross-replica
  near-dup pairs — each replica keeps the original near-dup structure.
  (``n_chars`` is NOT recomputed — fine for timing, not for oracles.)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bigdata_capstone_spark.session import build_session  # noqa: E402
from bigdata_capstone_spark.sources.tables import load_table  # noqa: E402

OFF = 100_000_000

KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["region", "nation"]


def main() -> int:
    src, out, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    spark = build_session(app_name="scale_up_testdata")
    # Spark's default parquet timestamp encoding is legacy INT96, which
    # pyarrow footers report as unit 'ns' — sending load_table down the
    # TIMESTAMP(NANOS) raw-long path, which then fails on INT96. Write
    # plain microsecond timestamps instead.
    spark.conf.set(
        "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
    )
    os.makedirs(out, exist_ok=True)
    for name in DIMS:
        load_table(spark, src, name).write.mode("overwrite").parquet(
            f"{out}/{name}.parquet"
        )
        print(f"copied dim {name}", flush=True)
    for name, keys in KEY_COLS.items():
        base = load_table(spark, src, name)
        reps = []
        for i in range(factor):
            r = base
            for k in keys:
                r = r.withColumn(k, F.col(k) + F.lit(i * OFF))
            if name == "embeddings" and i > 0:
                # circular shift by i: distinct vector, same norm
                r = r.withColumn(
                    "embedding",
                    F.concat(
                        F.slice(
                            "embedding",
                            i + 1,
                            F.size("embedding") - i,
                        ),
                        F.slice("embedding", 1, i),
                    ),
                )
            if name == "documents" and i > 0:
                # suffix every whitespace token (keeps lengths/zipf
                # shape per replica, decorrelates shingles)
                r = r.withColumn(
                    "text",
                    F.array_join(
                        F.transform(
                            F.split(F.col("text"), " "),
                            lambda t: F.concat(t, F.lit(f"x{i}")),
                        ),
                        " ",
                    ),
                )
            reps.append(r)
        u = reps[0]
        for r in reps[1:]:
            u = u.unionByName(r)
        u.write.mode("overwrite").parquet(f"{out}/{name}.parquet")
        print(f"wrote {name} x{factor}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
