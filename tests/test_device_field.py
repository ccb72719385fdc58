"""Device (jnp limb-array) field arithmetic vs the host oracle."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zinc_tpu.fields.config import FieldConfig
from zinc_tpu.fields.limbs import (
    carry_sweep,
    int_to_limbs,
    ints_to_limbs,
    limbs_to_int,
    limbs_to_ints,
    mul_columns,
)
from zinc_tpu.fields.montgomery import (
    device_field,
    from_mont,
    lazy_sum,
    mod_reduce_wide,
    mont_add,
    mont_mul,
    mont_neg,
    mont_sub,
    to_mont,
)

Q256 = 57316695564490278656402085503
Q128 = 312829638388039969874974628075306023441
CONFIGS = [FieldConfig(Q128, 3), FieldConfig(Q256, 4)]


@pytest.mark.parametrize("cfg", CONFIGS, ids=["128bit", "256bit"])
def test_mont_ops_match_host(cfg):
    rng = random.Random(0)
    ctx = device_field(cfg)
    B = 64
    avals = [rng.randrange(cfg.q) for _ in range(B)]
    bvals = [rng.randrange(cfg.q) for _ in range(B)]
    am = [cfg.to_mont(v) for v in avals]
    bm = [cfg.to_mont(v) for v in bvals]
    a = jnp.asarray(ints_to_limbs(am, ctx.n16))
    b = jnp.asarray(ints_to_limbs(bm, ctx.n16))

    got_mul = limbs_to_ints(np.asarray(mont_mul(ctx, a, b)))
    got_add = limbs_to_ints(np.asarray(mont_add(ctx, a, b)))
    got_sub = limbs_to_ints(np.asarray(mont_sub(ctx, a, b)))
    got_neg = limbs_to_ints(np.asarray(mont_neg(ctx, a)))
    for i in range(B):
        assert got_mul[i] == cfg.mont_mul(am[i], bm[i])
        assert got_add[i] == cfg.add(am[i], bm[i])
        assert got_sub[i] == cfg.sub(am[i], bm[i])
        assert got_neg[i] == cfg.neg(am[i])


@pytest.mark.parametrize("cfg", CONFIGS, ids=["128bit", "256bit"])
def test_to_from_mont(cfg):
    rng = random.Random(1)
    ctx = device_field(cfg)
    vals = [rng.randrange(cfg.q) for _ in range(32)] + [0, 1, cfg.q - 1]
    v = jnp.asarray(ints_to_limbs(vals, ctx.n16))
    m = to_mont(ctx, v)
    assert limbs_to_ints(np.asarray(m)) == [cfg.to_mont(x) for x in vals]
    back = from_mont(ctx, m)
    assert limbs_to_ints(np.asarray(back)) == vals


def test_mul_columns_exact():
    rng = random.Random(2)
    for _ in range(20):
        x = rng.randrange(1 << 250)
        y = rng.randrange(1 << 250)
        a = jnp.asarray(int_to_limbs(x, 16))[None, :]
        b = jnp.asarray(int_to_limbs(y, 16))[None, :]
        prod = carry_sweep(mul_columns(a, b), 33)
        assert limbs_to_int(np.asarray(prod)[0]) == x * y


def test_lazy_sum_and_reduce():
    cfg = CONFIGS[1]
    ctx = device_field(cfg)
    rng = random.Random(3)
    vals = [rng.randrange(cfg.q) for _ in range(1000)]
    a = jnp.asarray(ints_to_limbs(vals, ctx.n16))
    wide = lazy_sum(ctx, a, axis=0)
    assert limbs_to_int(np.asarray(wide)) == sum(vals)
    reduced = mod_reduce_wide(ctx, wide)
    assert limbs_to_int(np.asarray(reduced)) == sum(vals) % cfg.q


def test_ops_jit_and_batch_shapes():
    cfg = CONFIGS[0]
    ctx = device_field(cfg)
    f = jax.jit(lambda a, b: mont_mul(ctx, a, b))
    rng = random.Random(4)
    vals = [cfg.to_mont(rng.randrange(cfg.q)) for _ in range(24)]
    arr = jnp.asarray(ints_to_limbs(vals, ctx.n16)).reshape(2, 3, 4, ctx.n16)
    out = f(arr, arr)
    assert out.shape == arr.shape
    flat = limbs_to_ints(np.asarray(out).reshape(24, ctx.n16))
    assert flat == [cfg.mont_mul(v, v) for v in vals]


def test_mod_reduce_wide_sparse_modulus():
    """Regression: q·2^k shifted past the limb width used to wrap mod 2^(16W);
    for sparse moduli (2^255+95) the wrapped value is tiny and the cond-sub
    chain subtracted garbage on every element."""
    import random

    import jax.numpy as jnp
    import numpy as np

    from zinc_tpu.fields.config import FieldConfig
    from zinc_tpu.fields.limbs import ints_to_limbs, limbs_to_int
    from zinc_tpu.fields.montgomery import device_field, mod_reduce_wide

    cfg_sparse = FieldConfig((1 << 255) + 95, 4)
    ctx = device_field(cfg_sparse)
    rng = random.Random(5)
    for width in (17, 18, 20):
        vals = [rng.randrange(32 * cfg_sparse.q) for _ in range(32)]
        red = np.asarray(mod_reduce_wide(ctx, jnp.asarray(ints_to_limbs(vals, width))))
        for i, v in enumerate(vals):
            assert limbs_to_int(red[i]) == v % cfg_sparse.q
