"""Device sumcheck/MLE engine must be transcript-identical to the host path."""

import random

import jax.numpy as jnp
import numpy as np

from zinc_tpu.fields.config import FieldConfig
from zinc_tpu.poly.device import (
    build_eq_table_device,
    evaluate_mle_device,
    fps_to_limbs,
    mle_from_device,
)
from zinc_tpu.poly.mle import DenseMleF, build_eq_x_r_vec
from zinc_tpu.sumcheck import prove_as_subprotocol, verify_as_subprotocol
from zinc_tpu.sumcheck.device import DeviceSumcheckExecutor, prove_as_subprotocol_device
from zinc_tpu.transcript import KeccakTranscript

Q128 = 312829638388039969874974628075306023441
CFG = FieldConfig(Q128, 3)


def random_tables(nv, n_mles, rng):
    return [[CFG.fp(rng.randrange(CFG.q)) for _ in range(1 << nv)] for _ in range(n_mles)]


def test_device_eq_table_matches_host():
    rng = random.Random(0)
    r = [CFG.fp(rng.randrange(CFG.q)) for _ in range(5)]
    host = build_eq_x_r_vec(r)
    dev = mle_from_device(CFG, build_eq_table_device(CFG, r))
    assert dev == host


def test_device_evaluate_matches_host():
    rng = random.Random(1)
    nv = 6
    evals = [CFG.fp(rng.randrange(CFG.q)) for _ in range(1 << nv)]
    point = [CFG.fp(rng.randrange(CFG.q)) for _ in range(nv)]
    host = DenseMleF(nv, evals, CFG).evaluate(point)
    table = jnp.asarray(fps_to_limbs(evals, CFG))
    dev = evaluate_mle_device(CFG, table, point)
    assert dev == host


def test_device_sumcheck_transcript_identical():
    rng = random.Random(2)
    nv, n_mles, degree = 5, 3, 3
    tabs = random_tables(nv, n_mles, rng)
    comb = [
        (CFG.fp(7), (0, 1)),
        (CFG.fp(3), (1, 2, 0)),
        (CFG.fp(-1), (2,)),
    ]

    # host
    t_host = KeccakTranscript()
    mles = [DenseMleF(nv, list(t), CFG) for t in tabs]
    proof_host, state = prove_as_subprotocol(t_host, mles, nv, degree, comb, CFG)

    # device
    t_dev = KeccakTranscript()
    stacked = jnp.asarray(
        np.stack([fps_to_limbs(t, CFG) for t in tabs])
    )
    ex = DeviceSumcheckExecutor(CFG, stacked, degree, comb)
    proof_dev, rand_dev = prove_as_subprotocol_device(t_dev, ex, nv, degree, CFG)

    assert proof_dev == proof_host
    assert rand_dev == state.randomness
    # final transcript states agree
    assert t_host.get_random_bytes(16) == t_dev.get_random_bytes(16)
    # final folded values = full evaluations at the challenge point
    finals = ex.final_values()
    for m, fv in zip(mles, finals):
        assert m.evaluate(state.randomness) == fv


def test_device_sumcheck_verifies():
    rng = random.Random(3)
    nv, degree = 6, 2
    tabs = random_tables(nv, 2, rng)
    comb = [(CFG.one(), (0, 1))]
    total = CFG.zero()
    for a, b in zip(*tabs):
        total = total + a * b

    t_dev = KeccakTranscript()
    stacked = jnp.asarray(np.stack([fps_to_limbs(t, CFG) for t in tabs]))
    ex = DeviceSumcheckExecutor(CFG, stacked, degree, comb)
    proof, _ = prove_as_subprotocol_device(t_dev, ex, nv, degree, CFG)

    sub = verify_as_subprotocol(KeccakTranscript(), nv, degree, total, proof, CFG)
    vals = ex.final_values()
    assert vals[0] * vals[1] == sub.expected_evaluation
