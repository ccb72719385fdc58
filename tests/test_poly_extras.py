"""Sparse MLEs, virtual-poly helpers, and index utils (reference parity)."""

import random

from zinc_tpu.fields.config import FieldConfig
from zinc_tpu.poly import (
    DenseMleF,
    SparseMleF,
    SparseMleZ,
    bit_decompose,
    evaluate_opt,
    fix_last_variables,
    get_batched_nv,
    get_index,
    identity_permutation_mles,
    merge_polynomials,
    project,
    random_mle_list,
    random_permutation,
    random_zero_mle_list,
)

CFG = FieldConfig((1 << 255) + 95, 4)


def _rand_point(rng, n):
    return [CFG.fp(rng.randrange(CFG.q)) for _ in range(n)]


def test_sparse_mle_matches_dense():
    rng = random.Random(0)
    nv = 6
    entries = {rng.randrange(1 << nv): CFG.fp(rng.randrange(CFG.q)) for _ in range(10)}
    sp = SparseMleF(nv, entries, CFG)
    dn = sp.to_dense()
    pt = _rand_point(rng, nv)
    assert sp.evaluate(pt) == dn.evaluate(pt)
    # partial fixing agrees too
    partial = _rand_point(rng, 3)
    assert sp.fix_variables(partial).to_dense().evaluations == dn.fix_variables(partial).evaluations


def test_sparse_mle_z_projection():
    rng = random.Random(1)
    nv = 5
    entries = {rng.randrange(1 << nv): rng.randrange(-1000, 1000) for _ in range(8)}
    spz = SparseMleZ(nv, entries)
    spf = spz.map_to_field(CFG)
    pt_int = [rng.randrange(100) for _ in range(nv)]
    assert CFG.fp(spz.evaluate(pt_int)) == spf.evaluate([CFG.fp(v) for v in pt_int])


def test_random_mle_list_sum():
    rng = random.Random(2)
    mles, total = random_mle_list(4, 3, rng, CFG)
    acc = CFG.zero()
    for b in range(1 << 4):
        prod = CFG.one()
        for m in mles:
            prod = prod * m.evaluations[b]
        acc = acc + prod
    assert acc == total
    zeros = random_zero_mle_list(4, 3, rng, CFG)
    for b in range(1 << 4):
        prod = CFG.one()
        for m in zeros:
            prod = prod * m.evaluations[b]
        assert prod.is_zero()


def test_fix_last_variables_against_full_eval():
    rng = random.Random(3)
    nv = 5
    poly = DenseMleF(nv, _rand_point(rng, 1 << nv), CFG)
    pt = _rand_point(rng, nv)
    # fixing the last k variables then the first nv-k must equal full eval
    for k in range(nv + 1):
        partial = fix_last_variables(poly, pt[nv - k :])
        assert partial.num_vars == nv - k
        assert evaluate_opt(partial, pt[: nv - k]) == poly.evaluate(pt)


def test_merge_and_batched_nv():
    rng = random.Random(4)
    nv = 3
    polys = [DenseMleF(nv, _rand_point(rng, 1 << nv), CFG) for _ in range(3)]
    merged = merge_polynomials(polys, CFG)
    assert merged.num_vars == get_batched_nv(nv, 3) == nv + 2
    for i, p in enumerate(polys):
        assert merged.evaluations[i << nv : (i + 1) << nv if i else 1 << nv] is not None
        assert merged.evaluations[i * (1 << nv) : (i + 1) * (1 << nv)] == p.evaluations


def test_index_utils():
    assert bit_decompose(0b1011, 4) == [True, True, False, True]
    assert project(bit_decompose(0b1011, 4)) == 0b1011
    x0, x1, sign = get_index(0b101, 3)
    # x0 = (0, i0, i1) LE = 0b010; x1 = (1, i0, i1) = 0b011; sign = i2
    assert x0 == 0b010 and x1 == 0b011 and sign is True


def test_identity_permutation_mles():
    mles = identity_permutation_mles(2, 2, CFG)
    assert mles[0].evaluations != mles[1].evaluations
    assert mles[0].evaluations[3] == CFG.fp(3)
    assert mles[1].evaluations[0] == CFG.fp(4)

    rng = random.Random(5)
    perm = random_permutation(2, 2, rng, CFG)
    assert sorted(str(v) for v in perm) == sorted(str(CFG.fp(i)) for i in range(8))


# ---------------------------------------------------------------------------
# ℤ-side virtual-poly twins (poly/virtual_z.py, mirror of
# /root/reference/src/poly_z/polynomials/multilinear_polynomial.rs)
# ---------------------------------------------------------------------------


def test_random_mle_list_z_sum():
    from zinc_tpu.poly import random_mle_list_z, random_zero_mle_list_z

    rng = random.Random(11)
    mles, total = random_mle_list_z(4, 3, rng, bits=32)
    acc = 0
    for b in range(1 << 4):
        prod = 1
        for m in mles:
            prod *= m.evaluations[b]
        acc += prod
    assert acc == total
    zeros = random_zero_mle_list_z(4, 3, rng, bits=32)
    for b in range(1 << 4):
        prod = 1
        for m in zeros:
            prod *= m.evaluations[b]
        assert prod == 0


def test_fix_last_variables_z_matches_field_side():
    """ℤ fix-last projected into the field must equal the F-side fix-last of
    the projected polynomial (FieldMap commutes with variable fixing)."""
    from zinc_tpu.poly import DenseMleZ, fix_last_variables, fix_last_variables_z

    rng = random.Random(12)
    nv = 5
    evals = [rng.randrange(-(1 << 40), 1 << 40) for _ in range(1 << nv)]
    pz = DenseMleZ(nv, evals)
    pt_int = [rng.randrange(-(1 << 20), 1 << 20) for _ in range(3)]
    fixed_z = fix_last_variables_z(pz, pt_int)
    fixed_f = fix_last_variables(pz.map_to_field(CFG), [CFG.fp(v) for v in pt_int])
    assert fixed_z.num_vars == fixed_f.num_vars == nv - 3
    assert [CFG.fp(v) for v in fixed_z.evaluations] == fixed_f.evaluations


def test_merge_and_permutations_z():
    from zinc_tpu.poly import (
        DenseMleZ,
        get_batched_nv,
        identity_permutation_mles_z,
        merge_polynomials_z,
        random_permutation_z,
    )

    rng = random.Random(13)
    nv = 3
    polys = [
        DenseMleZ(nv, [rng.randrange(-100, 100) for _ in range(1 << nv)])
        for _ in range(3)
    ]
    merged = merge_polynomials_z(polys)
    assert merged.num_vars == get_batched_nv(nv, 3)
    for i, p in enumerate(polys):
        assert merged.evaluations[i * (1 << nv) : (i + 1) * (1 << nv)] == p.evaluations
    assert merged.evaluations[3 * (1 << nv) :] == [0] * ((1 << merged.num_vars) - 3 * (1 << nv))

    mles = identity_permutation_mles_z(2, 2)
    assert mles[0].evaluations == [0, 1, 2, 3]
    assert mles[1].evaluations == [4, 5, 6, 7]
    perm = random_permutation_z(2, 2, rng)
    assert sorted(perm) == list(range(8))


def test_evaluate_opt_z_matches_field():
    from zinc_tpu.poly import DenseMleZ, evaluate_opt_z

    rng = random.Random(14)
    nv = 4
    pz = DenseMleZ(nv, [rng.randrange(-(1 << 30), 1 << 30) for _ in range(1 << nv)])
    pt = [rng.randrange(-(1 << 10), 1 << 10) for _ in range(nv)]
    got = evaluate_opt_z(pz, pt)
    want = pz.map_to_field(CFG).evaluate([CFG.fp(v) for v in pt])
    assert CFG.fp(got) == want


def test_instance_z_trait_and_bigint_serializer():
    from zinc_tpu.ccs import InstanceZ, Statement
    from zinc_tpu.fields.limbs import bigint_deserialize, bigint_serialize

    st = Statement(constraints=[], public_input=[7, 9])
    assert isinstance(st, InstanceZ)
    assert st.get_z_vector([3, 4]) == [7, 9, 1, 3, 4]

    v = (1 << 200) + 12345
    blob = bigint_serialize(v, 4)
    assert len(blob) == 32
    assert bigint_deserialize(blob, 4) == v
    # LE u64 word order: word 0 first
    assert blob[:8] == (12345).to_bytes(8, "little")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        bigint_serialize(1 << 256, 4)
    with _pytest.raises(ValueError):
        bigint_deserialize(blob[:-1], 4)
