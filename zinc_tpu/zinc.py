"""The Zinc protocol: Spartan over a CCS of integers + Zip PCS binding.

Mirrors /root/reference/src/zinc/: the prover projects the integer statement
into the Fiat-Shamir-derived random field, runs the Spartan two-sumcheck
PIOP, then commits to the integer witness MLE with the RAA-code Zip PCS and
proves its evaluation at r_y.  The verifier re-derives the field from the
public input (rejecting on mismatch), verifies Spartan, verifies the PCS
opening, and closes with Σⱼ γʲ·M̃ⱼ(r_x‖r_y)·v == e_y — evaluated sparsely in
O(nnz) rather than via the reference's dense matrix MLE materialization
(verifier.rs:249-261).
"""

from __future__ import annotations

from dataclasses import dataclass

from .ccs import CCS, Statement, Witness
from .fields.config import FieldConfig, Fp
from .poly.mle import DenseMleZ
from .prime import draw_random_field
from .sparse import evaluate_mle
from .spartan import (
    SpartanError,
    SpartanProof,
    lin_comb_gamma,
    spartan_prove,
    spartan_verify,
)
from .transcript import KeccakTranscript
from .zip.code import DefaultLinearCodeSpec, LinearCodeSpec, RaaCode, ZipTypes
from .zip.pcs import ZipCommitment, commit, open_poly, setup, verify_poly
from .zip.transcript import PcsTranscript


class ZincError(Exception):
    pass


@dataclass
class ZipProof:
    z_comm: ZipCommitment
    v: Fp
    pcs_proof: bytes


@dataclass
class ZincProof:
    spartan_proof: SpartanProof
    zip_proof: ZipProof


def prepare_for_random_field_piop(
    statement: Statement, wit: Witness, ccs: CCS, cfg: FieldConfig
):
    """z = (io ‖ 1 ‖ w) padded to m; integer z-MLE; field projections."""
    z_ccs = statement.get_z_vector(wit.w_ccs)
    if len(z_ccs) <= ccs.m:
        z_ccs = z_ccs + [0] * (ccs.m - len(z_ccs))
    z_mle = DenseMleZ(ccs.s_prime, z_ccs)
    z_ccs_f = [cfg.fp(v) for v in z_ccs]
    ccs_f = ccs.map_to_field(cfg)
    statement_f = statement.map_to_field(cfg)
    return z_ccs_f, z_mle, ccs_f, statement_f


class ZincProver:
    """Top-level prover.  ``backend="device"`` runs every hot path (field
    projection, Mz matvecs, sumcheck folds, RAA encode, Merkle hashing,
    opening matvecs) on the JAX device; ``backend="host"`` is the pure-Python
    reference path.  Both produce bit-identical proofs."""

    def __init__(
        self,
        zt: ZipTypes,
        lc_spec: LinearCodeSpec | None = None,
        backend: str = "host",
        mesh=None,
    ):
        self.zt = zt
        self.lc_spec = lc_spec or DefaultLinearCodeSpec()
        assert backend in ("host", "device")
        self.backend = backend
        self.mesh = mesh  # jax.sharding.Mesh → shard the device backend over it

    def prove(
        self,
        statement: Statement,
        wit: Witness,
        transcript: KeccakTranscript,
        ccs: CCS,
        cfg: FieldConfig,
    ) -> ZincProof:
        if self.backend == "device":
            return self._prove_device(statement, wit, transcript, ccs, cfg)
        z_ccs, z_mle, ccs_f, statement_f = prepare_for_random_field_piop(
            statement, wit, ccs, cfg
        )

        spartan_proof, r_y = spartan_prove(statement_f, z_ccs, z_mle, ccs_f, transcript, cfg)

        zip_proof = self._commit_and_prove_evaluation(
            z_mle, ccs_f, r_y, transcript, cfg
        )

        return ZincProof(spartan_proof=spartan_proof, zip_proof=zip_proof)

    def _prove_device(
        self,
        statement: Statement,
        wit: Witness,
        transcript: KeccakTranscript,
        ccs: CCS,
        cfg: FieldConfig,
    ) -> ZincProof:
        import numpy as np

        from .spartan_dev import DeviceStatement, spartan_prove_device, z_to_device
        from .utils.timing import timed
        from .zip.device import commit_device, open_device

        z_ccs = statement.get_z_vector(wit.w_ccs)
        if len(z_ccs) <= ccs.m:
            z_ccs = z_ccs + [0] * (ccs.m - len(z_ccs))

        with timed("prove.upload"):
            dstatement = DeviceStatement.upload(cfg, statement)
            z_f = z_to_device(cfg, z_ccs)
            # force the CSR/witness transfers NOW: an executable that pulls
            # dispatched-but-unfinished uploads lazily pays a chunked
            # sync-per-chunk tunnel path (measured 839 s vs 27 s at 2^20 —
            # utils/transfer.py)
            from .utils.transfer import csr_arrays, force_transfers

            force_transfers(csr_arrays(dstatement.matrices) + [z_f])
        with timed("prove.spartan"):
            spartan_proof, r_y, v = spartan_prove_device(
                dstatement, z_f, ccs, transcript, cfg, mesh=self.mesh
            )

        code = RaaCode(self.lc_spec, ccs.m, transcript, self.zt)
        pp = setup(ccs.m, code, self.zt)
        if all(-(1 << 63) <= x < (1 << 63) for x in z_ccs):
            z_vals = np.array(z_ccs, np.int64)
        else:
            z_vals = z_ccs
        with timed("prove.zip_commit"):
            if self.mesh is not None and len(self.mesh.axis_names) >= 2:
                from .parallel.zip import commit_device_sharded_2d

                data, z_comm = commit_device_sharded_2d(pp, z_vals, cfg, self.mesh)
            elif self.mesh is not None:
                from .parallel.zip import commit_device_sharded

                data, z_comm = commit_device_sharded(pp, z_vals, cfg, self.mesh)
            else:
                data, z_comm = commit_device(pp, z_vals, cfg)
        with timed("prove.zip_open"):
            pcs_transcript = PcsTranscript()
            if self.mesh is not None:
                from .parallel.zip import open_device_sharded

                open_device_sharded(
                    pp, z_vals, z_f, data, r_y, cfg, pcs_transcript, self.mesh
                )
            else:
                open_device(pp, z_vals, z_f, data, r_y, cfg, pcs_transcript)
        zip_proof = ZipProof(z_comm=z_comm, v=v, pcs_proof=pcs_transcript.into_proof())
        return ZincProof(spartan_proof=spartan_proof, zip_proof=zip_proof)

    def _commit_and_prove_evaluation(
        self,
        z_mle: DenseMleZ,
        ccs_f: CCS,
        r_y: list[Fp],
        transcript: KeccakTranscript,
        cfg: FieldConfig,
    ) -> ZipProof:
        code = RaaCode(self.lc_spec, ccs_f.m, transcript, self.zt)
        pp = setup(ccs_f.m, code, self.zt)
        data, z_comm = commit(pp, z_mle)
        pcs_transcript = PcsTranscript()
        v = z_mle.map_to_field(cfg).evaluate(r_y)
        open_poly(pp, z_mle, data, r_y, cfg, pcs_transcript)
        return ZipProof(z_comm=z_comm, v=v, pcs_proof=pcs_transcript.into_proof())


class ZincVerifier:
    """``backend="device"`` runs the final Σγʲ·M̃ⱼ(r_x‖r_y) matrix
    evaluations as device gather-reduce kernels (the one O(nnz) step of
    verification); everything else is host-side."""

    def __init__(
        self, zt: ZipTypes, lc_spec: LinearCodeSpec | None = None, backend: str = "host"
    ):
        self.zt = zt
        self.lc_spec = lc_spec or DefaultLinearCodeSpec()
        assert backend in ("host", "device")
        self.backend = backend
        # (statement, q, DeviceCsr list) — a verifier checks many proofs of
        # the same circuit, so the matrix upload amortizes like the prover's
        # DeviceStatement does
        self._csr_cache: tuple | None = None

    def verify(
        self,
        statement: Statement,
        proof: ZincProof,
        transcript: KeccakTranscript,
        ccs: CCS,
        cfg: FieldConfig,
    ) -> None:
        from .utils.timing import timed

        with timed("verify.draw_field"):
            drawn = draw_random_field(
                statement.public_input, transcript, self.zt.n_words, cfg.n64
            )
            if drawn != cfg:
                raise ZincError("field config mismatch: wrong public input binding")

        with timed("verify.ccs_map"):
            ccs_f = ccs.map_to_field(cfg)
        # the device backend projects the (integer) constraint matrices on
        # device inside the final evaluation — the host-side map_to_field of
        # every nonzero is the single most expensive verifier step at 2^20.
        # The ENTIRE upload pipeline (host CSR packing, device_put dispatch,
        # forced transfer — utils/transfer.py) runs in a background thread so
        # it rides under the host-side Spartan + PCS walls; r4 measured the
        # synchronous version serializing 2.8 s of packing + ~1 s of forced
        # transfer ahead of the 3.4 s PCS stage.
        forcer = None
        uploaded: dict = {}
        with timed("verify.upload_matrices"):
            if self.backend == "device":
                import threading

                from .ops.sparse import upload_matrix
                from .utils.transfer import csr_arrays, force_transfers

                cache = self._csr_cache
                if (cache is not None and cache[0] is statement
                        and cache[1] == cfg.q):
                    uploaded["matrices"] = cache[2]  # resident from last verify
                else:

                    def _upload_and_force():
                        try:
                            # the final evaluations read only vals/rows/cols —
                            # skip the prover-side column views (half the
                            # payload over the tunnel)
                            ms = [
                                upload_matrix(cfg, m, with_col_views=False)
                                for m in statement.constraints
                            ]
                            force_transfers(csr_arrays(ms))
                            uploaded["matrices"] = ms
                            self._csr_cache = (statement, cfg.q, ms)
                        except BaseException as e:  # re-raised at the join
                            uploaded["error"] = e

                    forcer = threading.Thread(target=_upload_and_force, daemon=True)
                    forcer.start()
                statement_k = None  # resolved at the dispatch point
            else:
                statement_k = statement.map_to_field(cfg).constraints

        with timed("verify.spartan"):
            try:
                points = spartan_verify(proof.spartan_proof, ccs_f, transcript, cfg)
            except SpartanError as e:
                # a daemon thread still inside an XLA dispatch at interpreter
                # teardown aborts the process — drain it before propagating
                if forcer is not None:
                    forcer.join()
                raise ZincError(f"Spartan verification failed: {e}") from e

        self._verify_pcs_proof(
            statement_k, proof.zip_proof, points, ccs_f, transcript, cfg,
            upload_forcer=forcer, uploaded=uploaded,
        )

    def _verify_pcs_proof(
        self,
        statement_k,  # list: DeviceCsr uploads (device) | field matrices (host)
        zip_proof: ZipProof,
        points,
        ccs_f: CCS,
        transcript: KeccakTranscript,
        cfg: FieldConfig,
        upload_forcer=None,  # background thread forcing the matrix uploads
        uploaded=None,  # dict the forcer fills: {"matrices": [...]} | {"error": e}
    ) -> None:
        from .utils.timing import timed

        with timed("verify.code_setup"):
            code = RaaCode(self.lc_spec, ccs_f.m, transcript, self.zt)
            pp = setup(ccs_f.m, code, self.zt)
        pcs_transcript = PcsTranscript.from_proof(zip_proof.pcs_proof)
        r_x = points.rx_ry[: ccs_f.s]
        r_y = points.rx_ry[ccs_f.s :]

        # Final-check evaluations (Σⱼ γʲ·M̃ⱼ(r_x‖r_y)): on the device
        # backend a second background thread waits for the uploads and then
        # DISPATCHES the evaluations (async, with host copies started), so
        # both the transfers and the O(nnz) device work ride under
        # verify_poly's wall time; the results are fetched after it.
        dispatcher = None
        dispatched: dict = {}
        if self.backend == "device":
            import threading

            from .ops.sparse import dispatch_mle_evals

            def _join_and_dispatch():
                try:
                    if upload_forcer is not None:
                        upload_forcer.join()  # operands resident pre-dispatch
                    if uploaded and "error" in uploaded:
                        raise uploaded["error"]
                    ms = (uploaded or {}).get("matrices", statement_k)
                    dispatched["handles"] = dispatch_mle_evals(cfg, ms, r_x, r_y)
                except BaseException as e:
                    dispatched["error"] = e

            dispatcher = threading.Thread(target=_join_and_dispatch, daemon=True)
            dispatcher.start()

        with timed("verify.pcs"):
            try:
                verify_poly(pp, zip_proof.z_comm, r_y, zip_proof.v, pcs_transcript, cfg)
            except Exception as e:
                # drain the background matrix-eval dispatcher (it joins the
                # upload forcer itself) before propagating — see verify.spartan
                if dispatcher is not None:
                    dispatcher.join()
                raise ZincError(f"PCS verification failed: {e}") from e

        # Final check: Σⱼ γʲ·M̃ⱼ(r_x‖r_y)·v == e_y (sparse evaluation)
        with timed("verify.final_evals"):
            if self.backend == "device":
                from .ops.sparse import fetch_mle_evals

                dispatcher.join()
                if "error" in dispatched:
                    raise dispatched["error"]
                v_xy = fetch_mle_evals(cfg, dispatched["handles"])
            else:
                v_xy = [evaluate_mle(m, r_x, r_y, cfg) for m in statement_k]
        if not lin_comb_gamma(points.gamma, v_xy) * zip_proof.v == points.e_y:
            raise ZincError("gamma combination of matrix evaluations != e_y")
