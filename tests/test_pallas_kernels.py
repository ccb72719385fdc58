"""Pallas round kernels must match the XLA round body bit-for-bit.

These only run where Pallas TPU kernels can execute (the attached chip);
on the CPU test backend they are skipped — the XLA path they are checked
against is what the CPU suite exercises everywhere else.
"""

import random

import jax
import numpy as np
import pytest

requires_tpu = pytest.mark.skipif(
    jax.devices()[0].platform != "tpu", reason="needs the TPU backend"
)


@requires_tpu
def test_pallas_round_matches_xla():
    import jax.numpy as jnp

    from zinc_tpu.fields.config import FieldConfig
    from zinc_tpu.fields.limbs import ints_to_limbs, limbs_to_int
    from zinc_tpu.fields.montgomery import device_field
    from zinc_tpu.ops.pallas_field import mont_fold_pallas, round_eval_pallas
    from zinc_tpu.sumcheck.device import _round_body

    cfg = FieldConfig((1 << 255) + 95, 4)
    ctx = device_field(cfg)
    pr = random.Random(7)
    n_mles, b, l = 4, 512, 16
    degree, idx_terms = 3, ((0, 3), (1, 3), (2, 3))
    tabs = jnp.asarray(
        np.stack([ints_to_limbs([pr.randrange(cfg.q) for _ in range(b)], l) for _ in range(n_mles)])
    )
    coeffs = jnp.asarray(ints_to_limbs([pr.randrange(cfg.q) for _ in range(len(idx_terms))], l))
    r = jnp.asarray(ints_to_limbs([pr.randrange(cfg.q)], l)[0])

    folded_ref, wide_ref = _round_body(ctx, tabs, (r, coeffs), False, degree, idx_terms)
    folded_p = mont_fold_pallas(ctx, tabs, r, 128)
    assert np.array_equal(np.asarray(folded_p), np.asarray(folded_ref))

    sums_p = np.asarray(round_eval_pallas(ctx, folded_p, coeffs, degree, idx_terms, 128))
    wide_ref2 = np.asarray(_round_body(ctx, folded_ref, (r, coeffs), True, degree, idx_terms)[1])
    for p in range(degree + 1):
        assert limbs_to_int(sums_p[p]) % cfg.q == limbs_to_int(wide_ref2[p]) % cfg.q


@requires_tpu
def test_pallas_mont_mul_matches_xla():
    import jax.numpy as jnp

    from zinc_tpu.fields.config import FieldConfig
    from zinc_tpu.fields.limbs import ints_to_limbs
    from zinc_tpu.fields.montgomery import device_field, mont_mul
    from zinc_tpu.ops.pallas_field import mont_mul_pallas_t

    cfg = FieldConfig((1 << 255) + 95, 4)
    ctx = device_field(cfg)
    pr = random.Random(8)
    vals_a = [pr.randrange(cfg.q) for _ in range(256)]
    vals_b = [pr.randrange(cfg.q) for _ in range(256)]
    a = jnp.asarray(ints_to_limbs(vals_a, 16))
    b = jnp.asarray(ints_to_limbs(vals_b, 16))
    assert np.array_equal(
        np.asarray(mont_mul_pallas_t(ctx, a, b, 128)), np.asarray(mont_mul(ctx, a, b))
    )
