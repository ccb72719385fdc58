"""Device (TPU) Spartan prover — transcript-identical to spartan.spartan_prove.

The entire witness-sized state lives on device: the field-projected z vector,
the Mz tables, the eq tables, and the sumcheck folds.  Per round only the
d+1 claim sums cross to the host for Fiat-Shamir.  The final folded sumcheck
tables double as the V_s evaluations (sumcheck 1) and the PCS opening value
z̃(r_y) (sumcheck 2) — no separate evaluation passes.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from .ccs import CCS, Statement
from .fields.config import FieldConfig, Fp
from .ops.field_map import i64_to_field_device, ints_to_field_device
from .ops.sparse import DeviceCsr, eval_table_device, mat_vec_mul_device, upload_matrix
from .poly.device import build_eq_table_device, fps_to_limbs
from .fields.montgomery import device_field, mont_add, mont_mul
from .spartan import SpartanProof, squeeze_beta_challenges, squeeze_gamma_challenge
from .sumcheck.device import DeviceSumcheckExecutor, prove_as_subprotocol_device
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

    def make_executor(tables, degree, comb):
        if mesh is not None:
            from .parallel.sumcheck import ShardedSumcheckExecutor

            return ShardedSumcheckExecutor(cfg, tables, degree, comb, mesh)
        from .sumcheck.device import make_executor as _make

        return _make(cfg, tables, degree, comb)

    # ---- sumcheck 1 -------------------------------------------------------
    beta_s = squeeze_beta_challenges(transcript, ccs.s, cfg)
    mz = [mat_vec_mul_device(cfg, m, z_f) for m in dstatement.matrices]
    eq_beta = build_eq_table_device(cfg, beta_s)
    tables = jnp.concatenate([jnp.stack(mz), eq_beta[None]], axis=0)
    eq_idx = len(mz)
    comb1 = [(ci, tuple(ccs.S[i]) + (eq_idx,)) for i, ci in enumerate(c_f) if not ci.is_zero()]
    ex1 = make_executor(tables, ccs.d + 1, comb1)
    proof1, r_x = prove_as_subprotocol_device(transcript, ex1, ccs.s, ccs.d + 1, cfg)
    finals1 = ex1.final_values()
    v_s = finals1[: len(mz)]

    # ---- sumcheck 2 -------------------------------------------------------
    gamma = squeeze_gamma_challenge(transcript, cfg)
    eq_rx = build_eq_table_device(cfg, r_x)
    gamma_l = jnp.asarray(fps_to_limbs([gamma], cfg)[0])
    evals = None
    for m in reversed(dstatement.matrices):
        table_j = eval_table_device(cfg, m, eq_rx, ccs.m)
        evals = table_j if evals is None else mont_add(ctx, mont_mul(ctx, evals, gamma_l), table_j)
    tables2 = jnp.stack([evals, z_f])
    comb2 = [(cfg.one(), (0, 1))]
    ex2 = make_executor(tables2, 2, comb2)
    proof2, r_y = prove_as_subprotocol_device(transcript, ex2, ccs.s, 2, cfg)
    v = ex2.final_values()[1]

    return SpartanProof(proof1, proof2, v_s), r_y, v
