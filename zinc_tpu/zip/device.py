"""Device Zip PCS: RAA encoding, Merkle hashing, and opening on TPU.

Hot loops #2 and #3 of the system.  The commit path runs entirely on device:

    witness ints → K-width limbs → repeat → gather(σ₁) → cumsum → gather(σ₂)
    → cumsum → batched BLAKE3 leaves → log-depth batched level merges

(the two seeded permutations are host-precomputed index arrays; the
accumulations are per-limb cumulative sums — see fields/integers.py).

The open path computes the proximity combined row (signed-magnitude f32
matmul) and the q₀ᵀ·U field row (Montgomery broadcast-multiply + lazy sum)
on device, then assembles the 1000 column openings from the downloaded
layer arrays with bulk numpy serialization — the byte stream is identical
to the host backend's.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.config import FieldConfig
from ..fields.integers import (
    combine_rows_signed,
    cumsum_wrap,
    i64_to_mag8,
    ints_to_mag8,
    sign_extend,
)
from ..fields.limbs import i64_to_limbs, ints_to_limbs
from ..fields.montgomery import device_field, lazy_sum, mod_reduce_wide, mont_mul
from ..ops.blake3_kernel import merkle_tree_device
from ..poly.device import build_eq_table_device
from .pcs import ZipCommitment, ZipParams
from .transcript import PcsTranscript


@dataclass
class DeviceZipData:
    """Prover-side commitment data.

    `enc` / `layer_arrays` may be DEVICE arrays (commit_device defers the
    bulk download: open_device gathers the opened columns and leaf siblings
    on device and fetches only proof-sized slices plus the small upper
    levels) or host numpy arrays (sharded commit paths, tests).  The
    `enc_limbs` / `layers` properties force a full host copy for callers
    that need one (identity tests)."""

    enc: object  # (R, cw, Lk) u16/u32 limbs — jnp or np
    layer_arrays: list  # list[(R, n_level, 8) uint32], leaves first — jnp or np
    roots: list  # list[bytes]

    @property
    def enc_limbs(self) -> np.ndarray:
        if not isinstance(self.enc, np.ndarray):
            self.enc = np.asarray(self.enc.astype(jnp.uint16))
        return self.enc

    @property
    def layers(self) -> list:
        self.layer_arrays = [
            l if isinstance(l, np.ndarray) else np.asarray(l)
            for l in self.layer_arrays
        ]
        return self.layer_arrays


@partial(jax.jit, static_argnums=(1, 2, 3))
def _raa_encode_rows(z_limbs: jnp.ndarray, row_len: int, rep: int, lk: int, p1, p2):
    """(R·row_len, Ln) limbs → (R, cw, Lk) encoded rows."""
    r = z_limbs.shape[0] // row_len
    rows = sign_extend(z_limbs, lk).reshape(r, row_len, lk)
    vec = jnp.concatenate([rows] * rep, axis=1)  # repeat
    vec = vec[:, p1, :]
    vec = cumsum_wrap(vec, axis=1)
    vec = vec[:, p2, :]
    vec = cumsum_wrap(vec, axis=1)
    return vec


@partial(jax.jit, static_argnums=(2,))
def _zlc_encode_rows(z_limbs: jnp.ndarray, mat: jnp.ndarray, lk: int):
    """ZipLinearCode encoder: (R·row_len, Ln) limbs → (R, cw, Lk) rows.

    codeword = [A·row ‖ B·row] (/root/reference/src/zip/code.rs:77-215) with
    `mat` the stacked dense (cw, row_len) 0/1 matrix — the sampled "sparse"
    matrices have density row_len/2, so on TPU the natural form is a dense
    MXU matmul over 8-bit limb planes (partial sums ≤ 255·row_len < 2^24,
    f32-exact), followed by one carry-wrap to two's-complement width K.
    """
    row_len = mat.shape[1]
    r = z_limbs.shape[0] // row_len
    rows = sign_extend(z_limbs, lk).reshape(r, row_len, lk)
    # 8-bit planes of the two's-complement limbs: exact bf16/f32 operands
    lo8 = (rows & 0xFF).astype(jnp.float32)
    hi8 = (rows >> 8).astype(jnp.float32)
    planes = jnp.concatenate([lo8, hi8], axis=-1)  # (R, row_len, 2Lk)
    acc = jnp.einsum(
        "cw,rwl->rcl", mat, planes,
        preferred_element_type=jnp.float32, precision="highest",
    ).astype(jnp.uint32)  # (R, cw, 2Lk) lazy 8-bit planes
    lazy16 = acc[..., :lk] + (acc[..., lk:] << 8)  # (R, cw, Lk) lazy 16-bit cols
    from ..fields.integers import _carry_limbs_lastaxis

    return _carry_limbs_lastaxis(lazy16, lk)


def _zlc_dense_matrix(code) -> np.ndarray:
    """Stacked dense (cw, row_len) 0/1 f32 matrix for [A ‖ B]."""
    cw, row_len = code.codeword_len(), code.row_len
    m = np.zeros((cw, row_len), np.float32)
    half = cw // 2
    for r, cells in enumerate(code.a):
        for col, coeff in cells:
            m[r, col] = float(coeff)
    for r, cells in enumerate(code.b):
        for col, coeff in cells:
            m[half + r, col] = float(coeff)
    return m


def commit_device(
    pp: ZipParams, z_values: np.ndarray | list, cfg: FieldConfig
) -> tuple[DeviceZipData, ZipCommitment]:
    """Device commit; byte-identical trees/roots to zip.pcs.commit."""
    row_len = pp.code.row_len
    lk = 4 * pp.zt.k_words  # 16-bit limbs of width K

    if isinstance(z_values, np.ndarray) and z_values.dtype == np.int64:
        z_limbs = jnp.asarray(i64_to_limbs(z_values, 4 * pp.zt.n_words))
    else:
        z_limbs = jnp.asarray(ints_to_limbs(list(z_values), 4 * pp.zt.n_words))
    assert z_limbs.shape[0] == pp.num_rows * row_len

    if hasattr(pp.code, "permutations"):  # RAA
        rep = pp.code.repetition_factor
        p1, p2 = pp.code.permutations()
        enc = _raa_encode_rows(
            z_limbs, row_len, rep, lk, jnp.asarray(p1), jnp.asarray(p2)
        )
    else:  # ZipLinearCode
        enc = _zlc_encode_rows(z_limbs, jnp.asarray(_zlc_dense_matrix(pp.code)), lk)
    layers_dev = merkle_tree_device(enc, pp.zt.k_words)
    # download ONLY the roots now (32 B/row); the codeword and layers stay
    # device-resident until open_device slices out the proof-sized pieces.
    # The UPPER levels (column-independent, ~half the open-phase transfer)
    # start copying to host immediately — the transfer overlaps the rest of
    # the prove and open_device's np.asarray then completes instantly.
    for lvl in layers_dev[1:]:
        if hasattr(lvl, "copy_to_host_async"):
            lvl.copy_to_host_async()
    top = np.asarray(layers_dev[-1][:, 0, :])
    roots = [top[r].astype("<u4").tobytes() for r in range(top.shape[0])]
    return DeviceZipData(enc, list(layers_dev), roots), ZipCommitment(roots)


def _write_limb_ints(transcript: PcsTranscript, arr: np.ndarray) -> None:
    """Bulk write two's-complement limb arrays (..., L) as LE integer bytes."""
    transcript._write(arr.astype("<u2").tobytes())


def _field_row_bytes(cfg: FieldConfig, limbs: np.ndarray) -> list[bytes]:
    """(C, L) Montgomery limbs → per-element big-endian byte strings."""
    c, l = limbs.shape
    swapped = (((limbs & 0xFF) << 8) | (limbs >> 8)).astype(np.uint16)  # bswap16
    be = swapped[:, ::-1]  # most-significant limb first
    raw = be.astype("<u2").tobytes()
    step = 2 * l
    return [raw[i * step : (i + 1) * step] for i in range(c)]


def open_device(
    pp: ZipParams,
    z_values: np.ndarray,  # int64 (fast path) — the poly evaluations
    z_f: jnp.ndarray,  # (m, L) field projection of z (device, Montgomery)
    data: DeviceZipData,
    point: list,
    cfg: FieldConfig,
    transcript: PcsTranscript,
) -> None:
    """Device open; proof bytes identical to zip.pcs.open_poly."""
    row_len = pp.code.row_len
    codeword_len = pp.code.codeword_len()
    num_rows = pp.num_rows
    kw = pp.zt.k_words
    ctx = device_field(cfg)

    # ---- squeeze EVERY challenge up front ----------------------------------
    # Integer/commitment proof writes are NOT absorbed into the FS state
    # (zip/transcript.py), so the proximity coefficients and all column
    # indices depend only on the state entering the open — squeeze them
    # first, then DISPATCH every device computation before any blocking
    # download.  Transfers overlap each other and the record assembly
    # (VERDICT r2 item 3: pipeline the open phase).
    prox_coeffs = []
    if num_rows > 1:
        prox_coeffs = [
            transcript.fs.get_integer_challenges(num_rows, pp.zt.n_words)
            for _ in range(pp.code.num_proximity_testing())
        ]
    depth = (codeword_len - 1).bit_length() if codeword_len > 1 else 0
    n_open = pp.code.num_column_opening()
    cols = np.array(
        [transcript.squeeze_challenge_idx(cfg, codeword_len) for _ in range(n_open)]
    )

    # ---- dispatch all device work ------------------------------------------
    def _async(arr):
        if hasattr(arr, "copy_to_host_async"):
            arr.copy_to_host_async()
        return arr

    combined_rows = []
    if prox_coeffs:
        if isinstance(z_values, np.ndarray) and z_values.dtype == np.int64:
            e_mag8, e_sign = i64_to_mag8(z_values)
        else:
            e_mag8, e_sign = ints_to_mag8(list(z_values), 8 * pp.zt.n_words)
        e_mag8 = jnp.asarray(e_mag8.reshape(num_rows, row_len, -1))
        e_sign = jnp.asarray(e_sign.reshape(num_rows, row_len))
        for coeffs in prox_coeffs:
            c_mag8, c_sign = ints_to_mag8(coeffs, 8 * pp.zt.n_words)
            combined_rows.append(_async(combine_rows_signed(
                jnp.asarray(c_mag8), jnp.asarray(c_sign),
                e_mag8, e_sign, 4 * pp.zt.m_words,
            )))

    width_bits = getattr(pp.code, "codeword_width_bits", None)
    gathers = dispatch_column_gathers(data, cols, depth, width_bits)
    if gathers is not None:
        for g in gathers[:2]:
            if g is not None:
                _async(g)

    log_rows = num_rows.bit_length() - 1
    lo = point[len(point) - log_rows :]
    if lo:
        q0 = build_eq_table_device(cfg, lo)  # (R, L)
        e_f = z_f.reshape(num_rows, row_len, -1)
        prod = mont_mul(ctx, q0[:, None, :], e_f)  # (R, C, L)
        wide = lazy_sum(ctx, prod, axis=0)  # (C, Lw)
        combined_f = _async(mod_reduce_wide(ctx, wide))  # (C, L)
    else:
        combined_f = z_f

    # ---- write the proof stream in wire order -------------------------------
    for combined in combined_rows:
        _write_limb_ints(transcript, np.asarray(combined))
    write_column_records(
        data, cols, depth, num_rows, transcript,
        width_bits=width_bits, gathers=gathers,
    )
    write_eval_row(cfg, np.asarray(combined_f), transcript)


def dispatch_column_gathers(
    data: DeviceZipData, cols: np.ndarray, depth: int, width_bits: int | None
):
    """Enqueue the device-side column/sibling gathers; returns
    (vals_d, sib0_d, narrow) handles or None for host-resident data.

    ``width_bits`` (the code's |value| bound) lets the device path download
    only the non-sign-extension limb prefix (e.g. 6 of 64 u16 limbs at the
    default 2^20 parameters) and reconstruct the full two's-complement wire
    form on host — an ~10× cut of the biggest open-phase transfer."""
    if isinstance(data.enc, np.ndarray):
        return None
    lk = data.enc.shape[-1]
    cols_d = jnp.asarray(cols)
    narrow = lk
    if width_bits is not None:
        narrow = min(lk, (width_bits + 1 + 15) // 16 + 1)
    vals_d = jnp.transpose(
        data.enc[:, cols_d, :narrow], (1, 0, 2)
    ).astype(jnp.uint16)
    sib0_d = (
        jnp.transpose(data.layer_arrays[0][:, cols_d ^ 1, :], (1, 0, 2))
        if depth > 0
        else None
    )
    return vals_d, sib0_d, narrow


def write_column_records(
    data: DeviceZipData,
    cols: np.ndarray,
    depth: int,
    num_rows: int,
    transcript: PcsTranscript,
    width_bits: int | None = None,
    gathers=None,
) -> None:
    """Assemble and write the per-column opening records (values + paths).

    ``gathers`` may carry pre-dispatched device handles from
    :func:`dispatch_column_gathers` (the pipelined open); otherwise they are
    dispatched here (host paths, sharded callers)."""
    n_open = cols.shape[0]
    lk = data.enc.shape[-1]
    val_bytes = 2 * lk * num_rows
    rec_bytes = val_bytes + num_rows * (8 + depth * 32)
    records = np.empty((n_open, rec_bytes), dtype=np.uint8)
    if isinstance(data.enc, np.ndarray):
        vals = np.ascontiguousarray(np.transpose(data.enc_limbs[:, cols, :], (1, 0, 2)))
        sib0 = None
        layer_nps = data.layers
    else:
        # device-resident commit: gather the opened columns and the leaf-level
        # siblings on device (proof-sized), download the (much smaller) upper
        # levels whole.  Both gathers are dispatched before any fetch blocks.
        if gathers is None:
            gathers = dispatch_column_gathers(data, cols, depth, width_bits)
        vals_d, sib0_d, narrow = gathers
        vals_narrow = np.ascontiguousarray(np.asarray(vals_d))
        if narrow < lk:
            vals = np.empty((n_open, num_rows, lk), np.uint16)
            vals[:, :, :narrow] = vals_narrow
            sign_fill = (vals_narrow[:, :, narrow - 1] >> 15).astype(np.uint16) * np.uint16(0xFFFF)
            vals[:, :, narrow:] = sign_fill[:, :, None]
        else:
            vals = vals_narrow
        sib0 = np.ascontiguousarray(np.asarray(sib0_d)) if sib0_d is not None else None
        layer_nps = [None] + [np.asarray(l) for l in data.layer_arrays[1:]]
    records[:, :val_bytes] = (
        vals.astype("<u2").view(np.uint8).reshape(n_open, val_bytes)
    )
    paths = records[:, val_bytes:].reshape(n_open, num_rows, 8 + depth * 32)
    paths[:, :, :8] = np.frombuffer(depth.to_bytes(8, "big"), np.uint8)
    idx = cols.copy()
    for lvl in range(depth):
        if lvl == 0 and sib0 is not None:
            sib = sib0  # (n_open, R, 8) u32, gathered on device
        else:
            sib = np.ascontiguousarray(
                np.transpose(layer_nps[lvl][:, idx ^ 1, :], (1, 0, 2))
            )  # (n_open, R, 8) u32
        paths[:, :, 8 + lvl * 32 : 8 + (lvl + 1) * 32] = (
            sib.astype("<u4").view(np.uint8).reshape(n_open, num_rows, 32)
        )
        idx >>= 1
    transcript._write(records.tobytes())


def write_eval_row(cfg: FieldConfig, combined_f: np.ndarray, transcript: PcsTranscript) -> None:
    """Absorb + write the evaluation-phase combined field row."""
    elems = _field_row_bytes(cfg, combined_f)
    for eb in elems:
        # absorb exactly like write_field_element (modulus framing + value)
        transcript.fs.h.update(b"\x03")
        transcript.fs.h.update(cfg.modulus_bytes_be())
        transcript.fs.h.update(b"\x05")
        transcript.fs.h.update(b"\x01")
        transcript.fs.h.update(eb)
        transcript.fs.h.update(b"\x03")
        transcript._write(eb)
