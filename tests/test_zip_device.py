"""Device Zip PCS must produce byte-identical commitments and proofs to host."""

import random

import numpy as np

import jax.numpy as jnp

from zinc_tpu.fields.config import FieldConfig
from zinc_tpu.fields.integers import combine_rows_signed, i64_to_mag8, ints_to_mag8
from zinc_tpu.ops.blake3_kernel import hash_single_chunk_batch, limbs16_to_msg_words, merge_pairs_batch
from zinc_tpu.hashing.blake3 import blake3
from zinc_tpu.poly.mle import DenseMleZ
from zinc_tpu.spartan_dev import z_to_device
from zinc_tpu.transcript import KeccakTranscript
from zinc_tpu.zip.code import DefaultLinearCodeSpec, RaaCode, ZipTypes
from zinc_tpu.zip.device import commit_device, open_device
from zinc_tpu.zip.merkle import int_to_leaf_bytes
from zinc_tpu.zip.pcs import commit, open_poly, setup, verify_poly
from zinc_tpu.zip.transcript import PcsTranscript

Q256 = 57316695564490278656402085503
CFG = FieldConfig(Q256, 4)
ZT1 = ZipTypes(1)


def test_blake3_kernel_matches_host():
    rng = random.Random(0)
    vals = [rng.randrange(-(1 << 255), 1 << 255) for _ in range(32)]
    from zinc_tpu.fields.limbs import ints_to_limbs

    limbs = jnp.asarray(ints_to_limbs(vals, 16))
    msg = limbs16_to_msg_words(limbs, 4)
    digests = np.asarray(hash_single_chunk_batch(msg, 32))
    for i, v in enumerate(vals):
        expected = blake3(int_to_leaf_bytes(v, 4))
        assert digests[i].astype("<u4").tobytes() == expected

    # level merges
    pairs = jnp.asarray(digests.reshape(16, 2, 8))
    merged = np.asarray(merge_pairs_batch(pairs))
    for i in range(16):
        left = digests[2 * i].astype("<u4").tobytes()
        right = digests[2 * i + 1].astype("<u4").tobytes()
        assert merged[i].astype("<u4").tobytes() == blake3(left + right)


def test_combine_rows_signed_exact():
    rng = random.Random(1)
    R, C = 8, 4
    coeffs = [rng.randrange(-(1 << 63), 1 << 63) for _ in range(R)]
    evals = np.array(
        [[rng.randrange(-(1 << 62), 1 << 62) for _ in range(C)] for _ in range(R)],
        np.int64,
    )
    c8, cs = ints_to_mag8(coeffs, 8)
    e8, es = i64_to_mag8(evals)
    out = np.asarray(
        combine_rows_signed(jnp.asarray(c8), jnp.asarray(cs), jnp.asarray(e8), jnp.asarray(es), 32)
    )
    width = 1 << (16 * 32)
    for c in range(C):
        expected = sum(coeffs[r] * int(evals[r, c]) for r in range(R)) % width
        got = sum(int(out[c, j]) << (16 * j) for j in range(32))
        assert got == expected


class MockTranscript:
    def __init__(self):
        self.counter = 0

    def get_u64(self):
        self.counter += 1
        return self.counter


def _setup(num_vars):
    poly_size = 1 << num_vars
    code = RaaCode(DefaultLinearCodeSpec(), poly_size, MockTranscript(), ZT1)
    return setup(poly_size, code, ZT1)


def test_device_commit_matches_host():
    num_vars = 6
    pp = _setup(num_vars)
    rng = random.Random(3)
    vals = [rng.randrange(-(1 << 62), 1 << 62) for _ in range(1 << num_vars)]
    poly = DenseMleZ(num_vars, vals)
    _, comm_host = commit(pp, poly)
    _, comm_dev = commit_device(pp, np.array(vals, np.int64), CFG)
    assert comm_dev.roots == comm_host.roots


def test_device_open_proof_bytes_identical_and_verify():
    num_vars = 6
    pp = _setup(num_vars)
    rng = random.Random(4)
    vals = [rng.randrange(-(1 << 62), 1 << 62) for _ in range(1 << num_vars)]
    poly = DenseMleZ(num_vars, vals)
    point = [CFG.fp(rng.randrange(CFG.q)) for _ in range(num_vars)]

    data_h, comm_h = commit(pp, poly)
    th = PcsTranscript()
    open_poly(pp, poly, data_h, point, CFG, th)
    proof_host = th.into_proof()

    z_np = np.array(vals, np.int64)
    data_d, comm_d = commit_device(pp, z_np, CFG)
    td = PcsTranscript()
    z_f = z_to_device(CFG, vals)
    open_device(pp, z_np, z_f, data_d, point, CFG, td)
    proof_dev = td.into_proof()

    assert comm_d.roots == comm_h.roots
    assert proof_dev == proof_host

    # device proof verifies through the host verifier
    v = poly.map_to_field(CFG).evaluate(point)
    vt = PcsTranscript.from_proof(proof_dev)
    verify_poly(pp, comm_d, point, v, vt, CFG)


def test_device_commit_ziplincode_matches_host():
    """The dense-matmul ZipLinearCode device encoder reproduces the host
    commit byte-for-byte (rows, trees, roots)."""
    from zinc_tpu.transcript import KeccakTranscript
    from zinc_tpu.zip.code import ZipLinearCode

    num_vars = 6
    n = 1 << num_vars
    t = KeccakTranscript()
    t.absorb(b"zlc-dev")
    code = ZipLinearCode(DefaultLinearCodeSpec(), n, t, ZT1)
    pp = setup(n, code, ZT1)
    rng = random.Random(31)
    vals = [rng.randrange(-(1 << 60), 1 << 60) for _ in range(n)]
    data_h, comm_h = commit(pp, DenseMleZ(num_vars, vals))
    data_d, comm_d = commit_device(pp, np.array(vals, np.int64), CFG)
    assert comm_d.roots == comm_h.roots
    # encoded limb rows must equal the host integers' two's-complement limbs
    lk = data_d.enc_limbs.shape[-1]
    mask = (1 << (16 * lk)) - 1
    flat = data_d.enc_limbs.reshape(-1, lk).astype(np.uint64)
    got = [int(sum(int(v) << (16 * j) for j, v in enumerate(row))) for row in flat]
    want = [v & mask for v in data_h.rows]
    assert got == want
