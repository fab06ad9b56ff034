"""RBF-kernel MMD_l drift-operator invariants (q342): null calibration,
planted-shift detection, partial-block handling, plan shape, and a
first-principles numpy re-implementation of the full quantization
contract on generated inputs."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from inspectadb_spark.operators.drift import mmd_linear
from tests.conftest import SF_DIR


# -- linear-time MMD ------------------------------------------------------------

def _mmd_numpy(vecs: np.ndarray, sigma2: float, shift_dim: int | None):
    """First-principles MMD_l with the engine's quantization contract:
    h per block rounded to 6 dp, exact sums, 4-dp readout."""
    v = vecs.astype(np.float64)
    if shift_dim is not None:
        v = v.copy()
        v[1::2, shift_dim] += 0.5  # odd ids are the Y half

    def k(a, b):
        return math.exp(-float(np.sum((a - b) ** 2)) / (2.0 * sigma2))

    hs = []
    for t in range(len(v) // 4):
        x1, y1, x2, y2 = v[4 * t: 4 * t + 4]
        hs.append(round(k(x1, x2) + k(y1, y2) - k(x1, y2) - k(x2, y1), 6))
    n = len(hs)
    sh = sum(hs)
    sh2 = sum(h * h for h in hs)
    mean = sh / n
    var = (sh2 - sh * sh / n) / (n - 1)
    return (n, round(mean, 4), round(math.sqrt(var), 4),
            round(mean / math.sqrt(var / n), 4))


def _vec_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(vecs)],
        "vec_id bigint, embedding array<double>")


@pytest.mark.parametrize("seed,n,dim", [(0, 40, 8), (1, 37, 5), (2, 96, 16)])
def test_mmd_matches_numpy_reference_on_generated_inputs(spark, seed, n, dim):
    rng = np.random.default_rng(seed)
    vecs = rng.normal(0, 0.3, size=(n, dim))
    for shift in (None, 1):
        want = _mmd_numpy(vecs, float(dim), shift)
        y_shift = None
        if shift is not None:
            y_shift = lambda v: F.transform(  # noqa: E731
                v, lambda x, i: x + F.when(i == F.lit(shift), F.lit(0.5))
                                     .otherwise(F.lit(0.0)))
        got = mmd_linear(_vec_df(spark, vecs), sigma2=float(dim),
                         y_shift=y_shift).collect()[0]
        assert (got.n_blocks, got.mmd_l, got.h_sd, got.z) == want


def test_mmd_drops_trailing_partial_block(spark):
    rng = np.random.default_rng(3)
    vecs = rng.normal(0, 0.3, size=(11, 4))  # 2 full blocks + 3 leftovers
    out = mmd_linear(_vec_df(spark, vecs), sigma2=4.0).collect()[0]
    assert out.n_blocks == 2


def test_q342_null_calm_and_shift_detected(spark):
    from inspectadb_spark.queries import REGISTRY

    out = REGISTRY["q342_rbf_mmd_drift"].builder(spark, SF_DIR).collect()
    z = {r.scenario: r.z for r in out}
    assert abs(z["observed"]) < 3.0  # i.i.d. halves: inside the CLT band
    assert z["shifted"] > 5.0        # planted +0.5 on one dim: fires


def test_mmd_plan_is_one_block_shuffle_no_window(spark):
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    plan = mmd_linear(e)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan  # the pairing is id arithmetic, not row_number
    # exactly the block-key hash exchange plus the global-agg single
    # partition fold; no other data movement
    n_exch = plan.count("Exchange hashpartitioning")
    assert n_exch == 1, plan


def test_mmd_starved_stream_reports_null_z_with_block_count(spark):
    """Fewer than 2 complete blocks cannot estimate a variance: h_sd and z
    are NULL while n_blocks says why — so a monitor must gate on
    n_blocks >= 2 AND |z|, never |z| alone (docstring contract)."""
    from inspectadb_spark.operators.drift import mmd_linear

    rows = [(i, [float(i % 3), 1.0]) for i in range(6)]  # exactly 1 block
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = mmd_linear(df, sigma2=4.0).first()
    assert out.n_blocks == 1
    assert out.mmd_l is not None
    assert out.h_sd is None and out.z is None
