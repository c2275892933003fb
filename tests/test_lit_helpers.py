"""One-py4j-call double-array literals must be BIT-identical to
F.lit(list) — the oracle hash contract rides on it (r12: lit_doubles /
lit_double_matrix replaced per-element F.lit in the PQ/IVF/SRP literal
paths; see functions/vectors.py)."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from mcm_problem_f_data_wrangling_spark.functions.vectors import (
    lit_double_matrix,
    lit_doubles,
)

SPECIALS = [
    0.0,
    -0.0,
    1.0,
    -1.5,
    float("nan"),
    float("inf"),
    float("-inf"),
    1e-308,  # subnormal territory
    -2.2250738585072014e-308,
    1.7976931348623157e308,  # max double
    0.1,  # classic non-representable decimal
    1 / 3,
]


def _bits(v: float) -> int:
    import struct

    return struct.unpack("<Q", struct.pack("<d", v))[0]


def test_lit_doubles_bit_identical(spark):
    rng = random.Random(7)
    vals = SPECIALS + [rng.uniform(-1e6, 1e6) for _ in range(500)]
    row = spark.range(1).select(
        F.lit([float(v) for v in vals]).alias("ref"),
        lit_doubles(vals).alias("got"),
    ).first()
    assert [_bits(v) for v in row["ref"]] == [_bits(v) for v in row["got"]]


def test_lit_doubles_constant_folded(spark):
    # the casts must fold to one literal at optimization time — a
    # per-row parse would silently tank every consumer
    df = spark.range(10).select(F.element_at(lit_doubles([1.5, 2.5]), 1).alias("v"))
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "cast(" not in plan.lower(), plan


def test_lit_double_matrix_bit_identical(spark):
    rng = random.Random(11)
    rows = [[rng.gauss(0, 1) for _ in range(16)] for _ in range(32)]
    rows.append(SPECIALS[:8])
    got = spark.range(1).select(lit_double_matrix(rows).alias("m")).first()["m"]
    assert len(got) == len(rows)
    for ref_r, got_r in zip(rows, got):
        assert [_bits(float(v)) for v in ref_r] == [_bits(v) for v in got_r]


def test_empty_literals(spark):
    row = spark.range(1).select(
        lit_doubles([]).alias("a"), lit_double_matrix([]).alias("m")
    ).first()
    assert row["a"] == [] and row["m"] == []


def test_nan_inf_round_trip(spark):
    got = spark.range(1).select(lit_doubles(SPECIALS).alias("a")).first()["a"]
    assert math.isnan(got[4]) and got[5] == math.inf and got[6] == -math.inf
    assert math.copysign(1.0, got[1]) == -1.0  # -0.0 preserved
