"""zinc-tpu: a TPU-native implementation of the Zinc SNARK system.

Spartan over a CCS of integers + the Zip multilinear PCS (RAA linear codes,
BLAKE3 Merkle trees), with the witness arithmetized over ℤ and projected into
a Fiat-Shamir-derived random prime field at proof time.

Built for TPU: prover hot paths (limb/Montgomery arithmetic, sumcheck folds,
RAA encoding, Merkle hashing) run as batched JAX/XLA/Pallas kernels over
16-bit-limb arrays; protocol logic and Fiat-Shamir chaining run on host.
The host backend is also a complete reference implementation used as the
bit-exactness oracle.

Public API (the equivalent of the reference's ``zinc::prelude``,
/root/reference/src/zinc.rs:12-24):
"""

def _enable_compilation_cache() -> None:
    """Persist XLA compilations (~10 s per sumcheck-round shape over the
    tunnel AOT; a prove touches dozens of shapes).  Opt out with
    ZINC_TPU_NO_COMPCACHE=1.

    The backend choice is read from the JAX_PLATFORMS env var, NOT from
    ``jax.default_backend()`` — querying the backend at import time would
    initialize XLA and make ``parallel.init_distributed`` (which must run
    before any backend init) impossible for any process that imports this
    package first."""
    import os

    if os.environ.get("ZINC_TPU_NO_COMPCACHE"):
        return
    try:
        import jax

        if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
            # XLA:CPU AOT cache entries pin host machine features and can
            # SIGILL across runners; compiles are cheap there anyway.
            return
        cache_dir = os.environ.get(
            "ZINC_TPU_COMPCACHE_DIR", os.path.expanduser("~/.cache/zinc_tpu_xla")
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:  # pragma: no cover - jax misconfiguration must not break import
        pass


_enable_compilation_cache()

from .ccs import CCS, CSError, Statement, Witness
from .fields.config import FieldConfig, Fp
from .prime import draw_random_field
from .transcript import KeccakTranscript
from .zinc import ZincError, ZincProof, ZincProver, ZincVerifier
from .zip.code import DefaultLinearCodeSpec, LinearCodeSpec, RaaCode, ZipLinearCode, ZipTypes

__version__ = "0.1.0"

__all__ = [
    "CCS",
    "CSError",
    "Statement",
    "Witness",
    "FieldConfig",
    "Fp",
    "draw_random_field",
    "KeccakTranscript",
    "ZincError",
    "ZincProof",
    "ZincProver",
    "ZincVerifier",
    "DefaultLinearCodeSpec",
    "LinearCodeSpec",
    "RaaCode",
    "ZipLinearCode",
    "ZipTypes",
]
