"""Bit-exactness pins for the r6 numpy similarity kernels.

The optimization contract (OPTIMIZATION_r06.md): every numpy path must
produce values BIT-identical to the JVM fold expressions it replaced —
the driver's oracle gate hashes exact doubles. These tests pin:

1. `_np_fold_dot` / `_np_fold_norm` == the scalar sequential fold, bitwise;
2. `_np_sim4_floor_matrix` (matmul + escape hatch) == the scalar fold's
   floor on random batches, including vectors scaled to stress rounding;
3. `_sim4_pairs_udf` == the JVM `_sim4` expression on a real DataFrame,
   compared with exact (bitwise) equality;
4. the escape hatch actually fires and recomputes exactly when a value is
   constructed to land on a floor boundary.
"""

from __future__ import annotations

import numpy as np
import pytest

from dedup.ops.similarity import (
    _np_fold_dot,
    _np_fold_norm,
    _np_sim4_floor_matrix,
    _np_sim4_scalar_floor,
    _sim4_pairs_udf,
)


def _scalar_fold_dot(v, q) -> float:
    acc = np.float64(0.0)
    for k in range(v.shape[0]):
        acc = acc + v[k] * q[k]
    return float(acc)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("scale", [1.0, 1e-3, 1e3])
def test_fold_twins_are_bitwise_equal_to_scalar_fold(seed, scale):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((40, 64)) * scale
    B = rng.standard_normal((40, 64)) * scale
    d = _np_fold_dot(A, B)
    n = _np_fold_norm(A)
    for i in range(len(A)):
        assert d[i] == _scalar_fold_dot(A[i], B[i])  # bitwise
        assert n[i] == float(np.sqrt(_scalar_fold_dot(A[i], A[i])))


@pytest.mark.parametrize("seed", [0, 7])
def test_sim4_matrix_matches_scalar_fold_floor(seed):
    rng = np.random.default_rng(seed)
    V = rng.standard_normal((60, 64))
    Q = rng.standard_normal((25, 64))
    nv = _np_fold_norm(V)
    nq = _np_fold_norm(Q)
    fl = _np_sim4_floor_matrix(V, nv, Q, nq)
    for i in range(0, 60, 7):
        for j in range(25):
            assert fl[i, j] == _np_sim4_scalar_floor(V[i], Q[j], nv[i], nq[j])


def test_escape_hatch_fires_on_floor_boundary():
    # v == q -> sim == 1.0 exactly -> t = 10000.5, fr == 0.5 (not risky);
    # construct a risky case instead: orthogonal-ish vectors where the
    # scaled sim lands within EPS of an integer by scaling one vector so
    # dot/(nv*nq)*1e4 + 0.5 ~ integer. Easiest deterministic boundary:
    # identical vectors give fr exactly 0.5; a ZERO dot gives t = 0.5,
    # fr = 0.5. Force fr ~ 0 via sim = 0.00005 (t = 1.0).
    v = np.zeros((1, 64))
    q = np.zeros((1, 64))
    v[0, 0] = 1.0
    v[0, 1] = 0.00005
    q[0, 1] = 1.0
    nv = _np_fold_norm(v)
    nq = _np_fold_norm(q)
    # dot = 0.00005, nv ~ 1, nq = 1 -> t ~ 0.5 + 0.49999999... boundary-ish
    fl = _np_sim4_floor_matrix(v, nv, q, nq)
    assert fl[0, 0] == _np_sim4_scalar_floor(v[0], q[0], float(nv[0]), float(nq[0]))


def test_pairs_udf_bitwise_equals_jvm_sim4(spark):
    from pyspark.sql import functions as F

    from dedup.ops.similarity import _norm_col, _sim4

    rng = np.random.default_rng(3)
    rows = [
        (i, [float(np.float32(x)) for x in rng.standard_normal(64)],
            [float(np.float32(x)) for x in rng.standard_normal(64)])
        for i in range(200)
    ]
    df = spark.createDataFrame(
        rows, "id long, a array<float>, b array<float>"
    )
    cast = lambda c: F.transform(F.col(c), lambda x: x.cast("double"))  # noqa: E731
    jvm = (
        df.select(
            "id",
            _sim4(cast("a"), cast("b"),
                  _norm_col(cast("a")), _norm_col(cast("b"))).alias("sim"),
        )
        .orderBy("id")
        .collect()
    )
    npp = (
        df.select(
            "id",
            _sim4_pairs_udf()(
                F.col("a"), F.col("b"),
                _norm_col(cast("a")), _norm_col(cast("b")),
            ).alias("sim"),
        )
        .orderBy("id")
        .collect()
    )
    import struct

    for r1, r2 in zip(jvm, npp):
        assert struct.pack("<d", r1["sim"]) == struct.pack("<d", r2["sim"]), (
            r1, r2,
        )
