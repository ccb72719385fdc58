"""Device (TPU) Spartan prover — transcript-identical to spartan.spartan_prove.

The entire witness-sized state lives on device: the field-projected z vector,
the Mz tables, the eq tables, and the sumcheck folds.  Per round only the
d+1 claim sums cross to the host for Fiat-Shamir.  The final folded sumcheck
tables double as the V_s evaluations (sumcheck 1) and the PCS opening value
z̃(r_y) (sumcheck 2) — no separate evaluation passes.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .ccs import CCS, Statement
from .fields.config import FieldConfig
from .ops.field_map import i64_to_field_device, ints_to_field_device
from .ops.sparse import upload_matrix
from .poly.device import fps_to_limbs
from .fields.montgomery import device_field, mont_add, mont_mul
from .spartan import SpartanProof, squeeze_beta_challenges, squeeze_gamma_challenge
from .sumcheck.device import prove_as_subprotocol_device
from .transcript import KeccakTranscript


@dataclass
class DeviceStatement:
    """Statement uploaded once; reusable across proofs for the same circuit."""

    matrices: list  # list[DeviceCsr]
    cfg: FieldConfig

    @staticmethod
    def upload(cfg: FieldConfig, statement: Statement) -> "DeviceStatement":
        return DeviceStatement(
            matrices=[upload_matrix(cfg, m) for m in statement.constraints], cfg=cfg
        )


def z_to_device(cfg: FieldConfig, z_ccs: list[int]) -> jnp.ndarray:
    if all(-(1 << 63) <= v < (1 << 63) for v in z_ccs):
        return i64_to_field_device(cfg, np.array(z_ccs, np.int64))
    return ints_to_field_device(cfg, z_ccs)


@partial(jax.jit, static_argnums=(0, 1, 5))
def _sc1_setup(ctx, n_rows: int, mats, z_f, beta_l, with_eq: bool = True):
    """One launch: Mz per matrix (+ eq(β) table unless the Gruen kernel
    will factor eq out — sumcheck/device_fs.py) — (t[+1], m, L)."""
    from .ops.sparse import _segmented_matvec
    from .poly.device import _eq_table_device

    mz = [
        _segmented_matvec(ctx, vals, cols, row_ends, z_f)
        for vals, cols, row_ends in mats
    ]
    if not with_eq:
        return jnp.stack(mz)
    eq_beta = _eq_table_device(ctx, beta_l)
    return jnp.concatenate([jnp.stack(mz), eq_beta[None]], axis=0)


@partial(jax.jit, static_argnums=(0, 1))
def _sc2_setup(ctx, n_cols: int, mats, z_f, rx_l, gamma_l):
    """One launch: eq(r_x), Σⱼγʲ·(rₓᵀMⱼ) Horner, stack with z — (2, m, L)."""
    from .ops.sparse import _segmented_matvec
    from .poly.device import _eq_table_device

    eq_rx = _eq_table_device(ctx, rx_l)
    evals = None
    for vals_bc, rows_bc, col_ends in reversed(mats):
        table_j = _segmented_matvec(ctx, vals_bc, rows_bc, col_ends, eq_rx)
        evals = (
            table_j
            if evals is None
            else mont_add(ctx, mont_mul(ctx, evals, gamma_l), table_j)
        )
    return jnp.stack([evals, z_f])


def spartan_prove_device(
    dstatement: DeviceStatement,
    z_f: jnp.ndarray,  # (m, L) field-projected z (from z_to_device)
    ccs: CCS,  # integer-flavor CCS (c: ints)
    transcript: KeccakTranscript,
    cfg: FieldConfig,
    mesh=None,
):
    """Returns (SpartanProof, r_y, v) with v = z̃(r_y) for the PCS binding.

    With ``mesh`` given, the sumcheck eval tables are block-sharded over its
    axis and each round closes with a psum (parallel/sumcheck.py); the
    transcript is bit-identical either way.
    """
    ctx = device_field(cfg)
    c_f = [cfg.fp(ci) for ci in ccs.c]

    def run_sumcheck(tables, nvars, degree, comb, eq_beta=None):
        """(proof, randomness, final_values) with the best available driver:
        device-resident Fiat-Shamir (one sync per sumcheck) — single-chip
        or sharded — else the per-round executor."""
        import os

        if mesh is None and not os.environ.get("ZINC_TPU_NO_DEVICE_FS"):
            from .sumcheck.device_fs import prove_as_subprotocol_device_fs

            proof, randomness, mles = prove_as_subprotocol_device_fs(
                transcript, cfg, tables, nvars, degree, comb, eq_beta=eq_beta
            )
            return proof, randomness, [m[0] for m in mles]
        if mesh is not None and not os.environ.get("ZINC_TPU_NO_DEVICE_FS"):
            from .parallel.fs import (
                prove_as_subprotocol_device_fs_sharded,
                wants_fs_sharded,
            )

            eq_idx = tables.shape[0] if eq_beta is not None else None
            if wants_fs_sharded(cfg, comb, tables.shape[1], mesh, eq_idx):
                proof, randomness, mles = prove_as_subprotocol_device_fs_sharded(
                    transcript, cfg, tables, nvars, degree, comb, mesh,
                    eq_beta=eq_beta,
                )
                return proof, randomness, [m[0] for m in mles]
        if mesh is not None:
            from .parallel.sumcheck import make_sharded_executor

            ex = make_sharded_executor(cfg, tables, degree, comb, mesh,
                                       eq_beta=eq_beta)
        else:
            from .sumcheck.device import make_executor as _make

            ex = _make(cfg, tables, degree, comb)
        proof, randomness = prove_as_subprotocol_device(transcript, ex, nvars, degree, cfg)
        return proof, randomness, ex.final_values()

    from .utils.timing import timed

    # ---- sumcheck 1 -------------------------------------------------------
    import os as _os

    beta_s = squeeze_beta_challenges(transcript, ccs.s, cfg)
    eq_idx = len(dstatement.matrices)
    comb1 = [(ci, tuple(ccs.S[i]) + (eq_idx,)) for i, ci in enumerate(c_f) if not ci.is_zero()]
    from .sumcheck.device_fs import wants_gruen

    if mesh is None:
        gruen1 = (
            not _os.environ.get("ZINC_TPU_NO_DEVICE_FS")
            and not _os.environ.get("ZINC_TPU_NO_GRUEN")
            and wants_gruen(cfg, comb1, eq_idx, ccs.m)
        )
    else:
        from .parallel.sumcheck import wants_gruen_sharded

        gruen1 = (
            not _os.environ.get("ZINC_TPU_NO_GRUEN")
            and wants_gruen_sharded(cfg, comb1, eq_idx, ccs.m, mesh)
        )
    from .utils.export_cache import cached_call

    with timed("spartan.sc1_setup"):
        # routed through the jax.export disk cache: the setup traces were
        # the largest cold-start cost after the FS kernels (r4 battery:
        # 94.8 s of the 220 s cold prove was sc1_setup tracing)
        tables = cached_call(
            "sc1-setup", (cfg.q, ccs.m, not gruen1),
            lambda mats, z, b: _sc1_setup(ctx, ccs.m, mats, z, b, not gruen1),
            tuple((m.vals, m.cols_idx, m.row_ends) for m in dstatement.matrices),
            z_f,
            jnp.asarray(fps_to_limbs(beta_s, cfg)),
        )
        np.asarray(tables[:, :1, :1])  # tiny fetch: waits for the enqueued setup
    with timed("spartan.sumcheck1"):
        proof1, r_x, finals1 = run_sumcheck(
            tables, ccs.s, ccs.d + 1, comb1, eq_beta=beta_s if gruen1 else None
        )
    v_s = finals1[: len(dstatement.matrices)]

    # ---- sumcheck 2 -------------------------------------------------------
    gamma = squeeze_gamma_challenge(transcript, cfg)
    with timed("spartan.sc2_setup"):
        tables2 = cached_call(
            "sc2-setup", (cfg.q, ccs.m),
            lambda mats, z, rx, g: _sc2_setup(ctx, ccs.m, mats, z, rx, g),
            tuple((m.vals_by_col, m.rows_by_col, m.col_ends) for m in dstatement.matrices),
            z_f,
            jnp.asarray(fps_to_limbs(r_x, cfg)),
            jnp.asarray(fps_to_limbs([gamma], cfg)[0]),
        )
        np.asarray(tables2[:, :1, :1])
    comb2 = [(cfg.one(), (0, 1))]
    with timed("spartan.sumcheck2"):
        proof2, r_y, finals2 = run_sumcheck(tables2, ccs.s, 2, comb2)
    v = finals2[1]

    return SpartanProof(proof1, proof2, v_s), r_y, v
