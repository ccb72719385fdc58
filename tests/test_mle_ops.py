"""Ring-ops suite, relabel, and integer eq tables on dense MLEs.

Mirrors /root/reference/src/poly_f/mle/dense.rs:181-423 (Zero/Add/Sub/Neg/
Mul/Index/AddAssign<(F,&Self)>), :104-140 (relabel/rand), and
/root/reference/src/poly_z/mle/dense.rs:430-501 (integer build_eq_x_r).
"""

import random

import pytest

from zinc_tpu.fields.config import FieldConfig
from zinc_tpu.poly.mle import (
    DenseMleF,
    DenseMleZ,
    build_eq_x_r_vec,
    build_eq_x_r_vec_z,
    build_eq_x_r_z,
)

CFG = FieldConfig(57316695564490278656402085503, 2)
RNG = random.Random(0)


def rand_mle(nv):
    return DenseMleF.rand(nv, CFG, RNG)


def test_ring_ops_pointwise():
    a, b = rand_mle(4), rand_mle(4)
    s = a + b
    d = a - b
    n = -a
    for i in range(16):
        assert s[i] == a[i] + b[i]
        assert d[i] == a[i] - b[i]
        assert n[i] == -a[i]
    r = CFG.fp(RNG.randrange(CFG.q))
    scaled = a * r
    fused = a.add_scaled(r, b)
    for i in range(16):
        assert scaled[i] == a[i] * r
        assert fused[i] == a[i] + r * b[i]
    # scalar shift
    sh = a + r
    assert all(sh[i] == a[i] + r for i in range(16))
    assert (sh - r) == a


def test_zero_identity():
    a = rand_mle(3)
    z = DenseMleF.zero(CFG)
    assert z.is_zero()
    assert (a + z) == a
    assert (z + a) == a
    assert z.add_scaled(CFG.fp(5), a) == a * CFG.fp(5)
    with pytest.raises(ValueError):
        _ = a + rand_mle(4)


def test_index_assignment_and_to_evaluations():
    a = rand_mle(2)
    v = CFG.fp(7)
    a[3] = v
    assert a[3] == v
    evs = a.to_evaluations()
    evs[0] = CFG.fp(1)  # copy, not a view
    assert a[0] != CFG.fp(1) or a.evaluations[0] == CFG.fp(1)


def test_relabel_swaps_variables():
    # relabel(a=0, b=2, k=1) swaps variables x0 and x2: evaluating the
    # relabeled MLE at (p0,p1,p2) equals the original at (p2,p1,p0)
    m = rand_mle(3)
    rl = m.relabel(0, 2, 1)
    pt = [CFG.fp(RNG.randrange(CFG.q)) for _ in range(3)]
    assert rl.evaluate(pt) == m.evaluate([pt[2], pt[1], pt[0]])
    # degenerate windows are no-ops
    assert m.relabel(1, 1, 1) == m
    assert m.relabel(0, 2, 0) == m
    with pytest.raises(ValueError):
        m.relabel(0, 1, 2)  # overlapped window
    with pytest.raises(ValueError):
        m.relabel(0, 3, 1)  # out of range


def test_z_ring_ops_and_relabel():
    a = DenseMleZ(3, [RNG.randrange(-100, 100) for _ in range(8)])
    b = DenseMleZ(3, [RNG.randrange(-100, 100) for _ in range(8)])
    assert (a + b).evaluations == [x + y for x, y in zip(a.evaluations, b.evaluations)]
    assert (a - b).evaluations == [x - y for x, y in zip(a.evaluations, b.evaluations)]
    assert (-a).evaluations == [-x for x in a.evaluations]
    assert (a * 3).evaluations == [3 * x for x in a.evaluations]
    assert a + DenseMleZ.zero() == a
    rl = a.relabel(0, 2, 1)
    pz = [RNG.randrange(-5, 5) for _ in range(3)]
    assert rl.evaluate(pz) == a.evaluate([pz[2], pz[1], pz[0]])


def test_integer_eq_table_matches_field_eq_table():
    r_int = [RNG.randrange(0, 50) for _ in range(4)]
    tbl_z = build_eq_x_r_vec_z(r_int)
    tbl_f = build_eq_x_r_vec([CFG.fp(v) for v in r_int])
    assert [CFG.fp(v) for v in tbl_z] == tbl_f
    # and the direct definition: eq[i] = prod over bits
    for i, v in enumerate(tbl_z):
        expect = 1
        for j, rj in enumerate(r_int):
            expect *= rj if (i >> j) & 1 else 1 - rj
        assert v == expect
    mle = build_eq_x_r_z(r_int)
    assert mle.num_vars == 4 and mle.evaluations == tbl_z


def test_rand_and_map_roundtrip():
    m = DenseMleF.rand(3, CFG, random.Random(1))
    assert len(m.evaluations) == 8
    z = DenseMleZ(3, [RNG.randrange(-10, 10) for _ in range(8)])
    assert z.map_to_field(CFG).num_vars == 3
