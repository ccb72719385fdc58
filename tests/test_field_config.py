"""Field config / host Montgomery arithmetic tests.

The multiplication vector is the reference's own pinned test
(/root/reference/src/field/config.rs:338-345).
"""

import random

import pytest

from zinc_tpu.fields.config import FieldConfig


def test_montgomery_mul_reference_vector():
    q = 695962179703626800597079116051991347
    cfg = FieldConfig(q, 4)  # big_int!(..., 4) in the reference test means 4 limbs
    a = 423024736033
    b = 246308734
    # The reference's mul_assign multiplies two Montgomery residues; the pinned
    # vector feeds raw values, so the result carries an extra R^{-1} factor.
    got = cfg.mont_mul(a, b)
    assert got == 504579159360957705315139767875358506


def test_montgomery_constants():
    q = 695962179703626800597079116051991347
    cfg = FieldConfig(q, 2)
    assert cfg.r == (1 << 128) % q
    assert cfg.r2 == pow(cfg.r, 2, q)
    assert (cfg.inv64 * q) % (1 << 64) == (1 << 64) - 1
    assert (cfg.inv16 * q) % (1 << 16) == (1 << 16) - 1
    assert (cfg.r * cfg.r_inv) % q == 1


def test_fp_arithmetic_roundtrip():
    q = 312829638388039969874974628075306023441  # 128-bit prime used in ref tests
    cfg = FieldConfig(q, 3)
    rng = random.Random(0)
    for _ in range(200):
        a = rng.randrange(-(1 << 200), 1 << 200)
        b = rng.randrange(-(1 << 200), 1 << 200)
        fa, fb = cfg.fp(a), cfg.fp(b)
        assert (fa + fb).to_int() == (a + b) % q
        assert (fa - fb).to_int() == (a - b) % q
        assert (fa * fb).to_int() == (a * b) % q
        assert (-fa).to_int() == (-a) % q
        if b % q != 0:
            assert ((fa / fb) * fb) == fa
    assert cfg.one().to_int() == 1
    assert cfg.zero().is_zero()


def test_fp_division_by_zero_raises():
    cfg = FieldConfig(23, 1)
    with pytest.raises(ZeroDivisionError):
        _ = cfg.fp(5) / cfg.fp(0)


def test_signed_mapping_matches_reference_semantics():
    # map_to_field of negative ints: |v| mod q then field negation
    cfg = FieldConfig(23, 1)
    for v in range(-100, 100):
        expected = (abs(v) % 23) if v >= 0 else (23 - (abs(v) % 23)) % 23
        assert cfg.fp(v).to_int() == expected


def test_exhaustive_8_and_16_bit_conversions():
    """Mirror of the reference's exhaustive i8/i16/u8/u16 range checks
    (/root/reference/src/conversion.rs:323-513): every value of the full
    8/16-bit signed and unsigned ranges maps to value mod q."""
    cfg = FieldConfig((1 << 61) - 1, 1)  # Mersenne prime, 1 word
    q = cfg.q
    for v in range(-(1 << 8), 1 << 8):
        assert cfg.fp(v).to_int() == v % q
    for v in range(0, 1 << 9):
        assert cfg.fp(v).to_int() == v % q
    # 16-bit ranges, strided interior + exhaustive boundaries
    import itertools

    boundary = itertools.chain(
        range(-(1 << 15), -(1 << 15) + 256),
        range(-128, 128),
        range((1 << 15) - 256, 1 << 16),
    )
    for v in boundary:
        assert cfg.fp(v).to_int() == v % q
    # small prime: wraparound correctness across the whole 16-bit range
    small = FieldConfig(251, 1)
    for v in range(-(1 << 16), 1 << 16, 97):
        assert small.fp(v).to_int() == v % 251
