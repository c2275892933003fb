"""dot_unrolled must be BIT-identical to the HOF dot — the kNN pair
projection's oracle hash rides on it (r13: the interpreted
aggregate(zip_with) fold was unrolled into whole-stage codegen; see
functions/vectors.dot_unrolled).  Also pins the r12 ADVICE item: the
SQL kNN engine's drop_null_cos=False shortcut stays row-identical to
the filtered path on zero-norm / null-element / dimension-mismatched
vectors."""

from __future__ import annotations

import random
import struct

from pyspark.sql import functions as F

from mcm_problem_f_data_wrangling_spark.functions.vectors import (
    dot,
    dot_unrolled,
)


def _bits(v) -> object:
    if v is None:
        return None
    return struct.unpack("<Q", struct.pack("<d", v))[0]


def _frame(spark):
    rng = random.Random(13)
    rows = []
    for i in range(512):
        rows.append(
            (
                i,
                [rng.uniform(-1, 1) for _ in range(64)],
                [rng.uniform(-1, 1) for _ in range(64)],
            )
        )
    # adversarial rows: -0.0 leading product, nan/inf propagation,
    # dimension mismatches (fallback arm), NULL array, NULL element
    rows.append((9001, [-0.0] * 64, [1.0] * 64))
    rows.append((9002, [float("nan")] * 64, [1.0] * 64))
    rows.append((9003, [float("inf")] + [0.0] * 63, [1.0] * 64))
    rows.append((9004, [1.0] * 32, [1.0] * 32))
    rows.append((9005, [1.0] * 64, [1.0] * 32))
    rows.append((9006, None, [1.0] * 64))
    rows.append((9007, [None] + [1.0] * 63, [1.0] * 64))
    return spark.createDataFrame(
        rows, "id long, a array<double>, b array<double>"
    )


def test_dot_unrolled_bit_identical(spark):
    got = (
        _frame(spark)
        .select(
            "id",
            dot("a", "b").alias("ref"),
            dot_unrolled("a", "b", 64).alias("new"),
        )
        .collect()
    )
    assert len(got) == 519
    for r in got:
        assert _bits(r["ref"]) == _bits(r["new"]), r


def test_dot_unrolled_qualified_names(spark):
    # the kNN/semdedup call sites pass alias-qualified names
    df = _frame(spark).alias("x")
    got = df.select(
        dot("a", "b").alias("ref"),
        dot_unrolled("x.a", "x.b", 64).alias("new"),
    ).collect()
    for r in got:
        assert _bits(r["ref"]) == _bits(r["new"])


def test_knn_join_dim_hint_row_identical(spark):
    """dim is a pure performance hint: any value (right, wrong) gives
    row-identical output, including on degenerate vectors — the
    drop_null_cos=False invariant (r12 ADVICE item 4)."""
    from mcm_problem_f_data_wrangling_spark.operators.similarity import (
        ivf_knn_join,
    )

    rng = random.Random(7)
    rows = []
    for i in range(60):
        rows.append(
            (i, [rng.uniform(-1, 1) for _ in range(8)], i % 3)
        )
    rows.append((100, [0.0] * 8, 0))  # zero norm -> NULL unit
    rows.append((101, None, 1))  # null vector
    rows.append((102, [None] * 8, 1))  # null elements -> NULL norm
    rows.append((103, [1.0] * 4, 2))  # dimension mismatch
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    base = sorted(
        tuple(r) for r in ivf_knn_join(df, df, k=3).collect()
    )
    for dim in (8, 4, 16):
        got = sorted(
            tuple(r) for r in ivf_knn_join(df, df, k=3, dim=dim).collect()
        )
        assert got == base, f"dim={dim}"
    # the degenerate ids never appear on either side of a pair
    flat = {r[0] for r in base} | {r[1] for r in base}
    assert not ({100, 101, 102} & flat)


def test_spread_by_clusters_on_key(spark):
    from mcm_problem_f_data_wrangling_spark.operators.skew import spread

    df = spark.range(0, 1000, 1, 1).withColumn("k", F.col("id") % 97)
    out = spread(df, width=1.0, by=["k"])
    # every key's rows land in ONE partition (hash clustering)
    chk = (
        out.withColumn("p", F.spark_partition_id())
        .groupBy("k")
        .agg(F.countDistinct("p").alias("np"))
        .agg(F.max("np"))
        .first()[0]
    )
    assert chk == 1
    assert out.rdd.getNumPartitions() > 1
    # identity on already-wide plans
    wide = spark.range(0, 1000, 1, 64).withColumn("k", F.col("id") % 97)
    assert spread(wide, by=["k"]) is wide
