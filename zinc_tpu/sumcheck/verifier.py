"""Multilinear sumcheck verifier.

Mirrors /root/reference/src/sumcheck.rs:116-164 and
/root/reference/src/sumcheck/verifier.rs:97-303: replay the transcript,
check p(0) + p(1) = claim each round, and reduce the claim by Lagrange
interpolation of the d+1 evaluation points at the round challenge.

``interpolate_uni_poly`` computes the same value as the reference's
factorial-ratio implementation (the i64/i128/field regimes there are
arithmetic optimizations of one formula); here it is a direct product-form
Lagrange evaluation in the field.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..fields.config import FieldConfig, Fp
from ..transcript import KeccakTranscript
from .prover import SumcheckProof, _absorb_nvars_degree


class SumcheckError(Exception):
    pass


@dataclass
class SubClaim:
    point: list  # list[Fp]
    expected_evaluation: Fp


def interpolate_uni_poly(evals: list[Fp], x: Fp) -> Fp:
    """Evaluate at x the unique degree-(len−1) polynomial through
    (i, evals[i]) for i = 0..len−1."""
    cfg = x.cfg
    n = len(evals)
    points = [cfg.fp(i) for i in range(n)]
    # early exit when x is one of the nodes (matches reference behavior and
    # avoids division by zero)
    for i, pi in enumerate(points):
        if x == pi:
            return evals[i]
    # prod = Π_j (x - j)
    diffs = [x - pi for pi in points]
    prod = cfg.one()
    for d in diffs:
        prod = prod * d
    res = cfg.zero()
    for i in range(n):
        # denom_i = Π_{j≠i} (i - j)
        denom = cfg.one()
        for j in range(n):
            if j != i:
                denom = denom * cfg.fp(i - j)
        res = res + evals[i] * prod / (denom * diffs[i])
    return res


def verify_as_subprotocol(
    transcript: KeccakTranscript,
    num_vars: int,
    degree: int,
    claimed_sum: Fp,
    proof: SumcheckProof,
    cfg: FieldConfig,
) -> SubClaim:
    _absorb_nvars_degree(transcript, num_vars, degree, cfg)

    if num_vars == 0:
        transcript.absorb_field(claimed_sum)
        return SubClaim(point=[], expected_evaluation=claimed_sum)

    if len(proof) != num_vars:
        raise SumcheckError(f"invalid proof length: expected {num_vars}, got {len(proof)}")

    randomness: list[Fp] = []
    for evals in proof:
        transcript.absorb_field_slice(evals)
        r = transcript.get_challenge(cfg)
        transcript.absorb_field(r)
        randomness.append(r)

    expected = claimed_sum
    for i in range(num_vars):
        evals = proof[i]
        if len(evals) != degree + 1:
            raise SumcheckError("max degree exceeded")
        if degree > 0:
            if not (evals[0] + evals[1]) == expected:
                raise SumcheckError(
                    f"sumcheck round {i}: p(0)+p(1) != expected claim"
                )
        else:
            if not evals[0] == expected:
                raise SumcheckError(f"sumcheck round {i}: constant mismatch")
        expected = interpolate_uni_poly(evals, randomness[i])

    return SubClaim(point=randomness, expected_evaluation=expected)
