"""Limb-primitive edge cases (mirror of the reference's carry-edge tests,
/root/reference/src/field/biginteger/arithmetic.rs:232-420): max-value
carries, borrow ripples, wrap semantics, width changes — on both the
scan (CPU) and Kogge-Stone implementations."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from zinc_tpu.fields import limbs as L


def _int(limbs):
    return L.limbs_to_int(np.asarray(limbs))


@pytest.mark.parametrize("width", [1, 2, 4, 16, 17, 33])
def test_add_limbs_carry_ripple(width):
    maxv = (1 << (16 * width)) - 1
    a = jnp.asarray(L.ints_to_limbs([maxv, maxv, 0, 1], width))
    b = jnp.asarray(L.ints_to_limbs([1, maxv, 0, maxv], width))
    out = L.add_limbs(a, b, width + 1)
    expect = [(maxv + 1), (2 * maxv), 0, (maxv + 1)]
    for i, e in enumerate(expect):
        assert _int(np.asarray(out)[i]) == e


@pytest.mark.parametrize("width", [1, 2, 16, 18])
def test_sub_limbs_borrow_ripple(width):
    m = 1 << (16 * width)
    cases = [(0, 1), (1, 0), (m - 1, m - 1), (0, m - 1), (1 << (16 * (width // 2)), 1)]
    av = [a for a, _ in cases]
    bv = [b for _, b in cases]
    a = jnp.asarray(L.ints_to_limbs(av, width))
    b = jnp.asarray(L.ints_to_limbs(bv, width))
    d, borrow = L.sub_limbs(a, b)
    d_np, borrow_np = np.asarray(d), np.asarray(borrow)
    for i, (x, y) in enumerate(cases):
        assert _int(d_np[i]) == (x - y) % m
        assert int(borrow_np[i]) == (1 if x < y else 0)


def test_carry_sweep_max_columns():
    # every column at the maximum lazy value the contract allows
    cols = jnp.full((3, 8), (1 << 32) - (1 << 16) - 1, jnp.uint32)
    out = np.asarray(L.carry_sweep(cols, 11))
    val = sum(((1 << 32) - (1 << 16) - 1) << (16 * j) for j in range(8))
    for i in range(3):
        assert _int(out[i]) == val % (1 << (16 * 11))


def test_mul_columns_vs_python():
    rng = random.Random(0)
    for la, lb in [(1, 1), (4, 4), (16, 16), (16, 4)]:
        av = [rng.randrange(1 << (16 * la)) for _ in range(8)]
        bv = [rng.randrange(1 << (16 * lb)) for _ in range(8)]
        a = jnp.asarray(L.ints_to_limbs(av, la))
        b = jnp.asarray(L.ints_to_limbs(bv, lb))
        cols = L.mul_columns(a, b)
        out = np.asarray(L.carry_sweep(cols, la + lb + 1))
        for i in range(8):
            assert _int(out[i]) == av[i] * bv[i]


def test_cond_sub_boundary():
    m = jnp.asarray(L.ints_to_limbs([1000], 4)[0])
    a = jnp.asarray(L.ints_to_limbs([999, 1000, 1001], 4))
    out = np.asarray(L.cond_sub(a, m))
    assert [_int(out[i]) for i in range(3)] == [999, 0, 1]


def test_geq_limbs():
    a = jnp.asarray(L.ints_to_limbs([5, 5, 6], 3))
    b = jnp.asarray(L.ints_to_limbs([6, 5, 5], 3))
    assert list(np.asarray(L.geq_limbs(a, b))) == [False, True, True]


def test_find_naf_usefulness_and_correctness():
    """Mirror of arithmetic.rs:403-434: 12 has NAF length 5, relaxed 4, and
    both recodings sum back to the input for random 256-bit values."""
    import random

    from zinc_tpu.fields.limbs import find_naf, find_relaxed_naf

    assert len(find_naf(12)) == 5
    assert len(find_relaxed_naf(12)) == 4
    rng = random.Random(9)
    for _ in range(10):
        num = rng.getrandbits(256)
        for digits in (find_naf(num), find_relaxed_naf(num)):
            assert all(d in (-1, 0, 1) for d in digits)
            assert sum(d << i for i, d in enumerate(digits)) == num
        # non-adjacency holds for the strict NAF
        naf = find_naf(num)
        assert all(not (naf[i] and naf[i + 1]) for i in range(len(naf) - 1))
