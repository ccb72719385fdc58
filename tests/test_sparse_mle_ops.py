"""Sparse-MLE trait completions: relabel, rand, to_evaluations, ring ops.

Mirrors /root/reference/src/poly_f/mle/sparse.rs:68-98 (rand_with_config),
:144-171 (rand/relabel), :218-230 (to_evaluations), :232-420 (ops), and the
poly_z twins.
"""

import random

import pytest

from zinc_tpu.fields.config import FieldConfig
from zinc_tpu.poly.sparse_mle import SparseMleF, SparseMleZ

CFG = FieldConfig(57316695564490278656402085503, 2)
RNG = random.Random(42)


def test_rand_with_config_counts_and_range():
    m = SparseMleF.rand_with_config(6, 9, CFG, RNG)
    assert m.num_vars == 6 and len(m.entries) == 9
    assert all(i < 64 for i in m.entries)
    d = SparseMleF.rand(8, CFG, RNG)
    assert len(d.entries) == 16  # sqrt(2^8)
    with pytest.raises(ValueError):
        SparseMleF.rand_with_config(2, 5, CFG, RNG)


def test_sparse_relabel_matches_dense():
    m = SparseMleF.rand_with_config(5, 7, CFG, RNG)
    rl = m.relabel(0, 3, 2)
    assert rl.to_dense() == m.to_dense().relabel(0, 3, 2)
    pt = [CFG.fp(RNG.randrange(CFG.q)) for _ in range(5)]
    assert rl.evaluate(pt) == m.evaluate([pt[3], pt[4], pt[2], pt[0], pt[1]])
    with pytest.raises(ValueError):
        m.relabel(0, 2, 3)


def test_sparse_ring_ops_match_dense():
    a = SparseMleF.rand_with_config(4, 5, CFG, RNG)
    b = SparseMleF.rand_with_config(4, 5, CFG, RNG)
    r = CFG.fp(RNG.randrange(CFG.q))
    assert (a + b).to_dense() == a.to_dense() + b.to_dense()
    assert (a - b).to_dense() == a.to_dense() - b.to_dense()
    assert (-a).to_dense() == -(a.to_dense())
    assert (a * r).to_dense() == a.to_dense() * r
    assert a.to_evaluations() == a.to_dense().evaluations
    with pytest.raises(ValueError):
        _ = a + SparseMleF.rand_with_config(3, 2, CFG, RNG)


def test_sparse_z_ops():
    a = SparseMleZ(3, {1: 4, 6: -2})
    b = SparseMleZ(3, {1: -4, 3: 9})
    s = a + b
    assert s.entries == {3: 9, 6: -2}  # the index-1 entries cancel to zero
    assert (a - a).entries == {}
    assert (a * 3).entries == {1: 12, 6: -6}
    rl = a.relabel(0, 1, 1)  # swap bits 0 and 1: 1->2, 6->5
    assert rl.entries == {2: 4, 5: -2}
    assert a.to_evaluations() == [0, 4, 0, 0, 0, 0, -2, 0]
