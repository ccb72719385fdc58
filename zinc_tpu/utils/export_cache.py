"""Serialized-program cache: skip per-process TRACING of the FS kernels.

The persistent XLA compilation cache (~/.cache/zinc_tpu_xla) already covers
recompiles, but jax still re-TRACES every program in each fresh process —
and the device-resident Fiat-Shamir sumcheck kernels (sumcheck/device_fs.py)
are the largest traces in the system (minutes of the measured ~280 s cold
2^20 prove; PERF.md "Cold-process note").  ``jax.export`` serializes the
traced/lowered StableHLO, so a cold process deserializes the artifact and
goes straight to the (cached) executable: seconds instead of minutes.

Keying: a content hash of the package's own sources + jax version +
backend + field modulus + the kernel's static argument tuple + every
dynamic aval — any mismatch is a different file, so stale artifacts can
never be *loaded* for the wrong program (including after a kernel code
change: the source fingerprint rotates every artifact).  Artifacts are
written atomically; any failure (unsupported custom call, version drift,
corrupt file) falls back to the plain jitted call.

Enabled on the TPU backend by default (cold-start tax is a TPU-process
problem; CPU test processes should not churn the cache), override with
ZINC_TPU_EXPORT_CACHE=1/0.  Cache dir: ZINC_TPU_EXPORT_CACHE_DIR or
~/.cache/zinc_tpu_export.
"""

from __future__ import annotations

import hashlib
import os
import pathlib
import sys


_SRC_FP: str | None = None
_EXP_MEMO: dict = {}  # key → deserialized jax.export.Exported (per process)


def _source_fingerprint() -> str:
    """Content hash over every .py in the zinc_tpu package (~0.4 MB, once
    per process).  A serialized program is a function of the code that
    traced it, so the code belongs in the cache key — without this, a
    kernel fix with unchanged shapes/statics would silently replay the old
    StableHLO from disk."""
    global _SRC_FP
    if _SRC_FP is None:
        pkg = pathlib.Path(__file__).resolve().parents[1]
        h = hashlib.sha256()
        for p in sorted(pkg.rglob("*.py")):
            h.update(str(p.relative_to(pkg)).encode())
            h.update(p.read_bytes())
        _SRC_FP = h.hexdigest()[:16]
    return _SRC_FP


def _cache_dir() -> pathlib.Path:
    return pathlib.Path(
        os.environ.get(
            "ZINC_TPU_EXPORT_CACHE_DIR",
            os.path.expanduser("~/.cache/zinc_tpu_export"),
        )
    )


def enabled() -> bool:
    import jax

    v = os.environ.get("ZINC_TPU_EXPORT_CACHE")
    if v is not None:
        return v not in ("0", "off", "")
    return jax.default_backend() == "tpu"


def cached_call(kind: str, static_key, make_fn, *dyn_args, in_shardings=None):
    """Run ``make_fn(*dyn_args)`` through a disk-cached ``jax.export``
    artifact (skipping tracing on cache hits); plain jit on any failure.

    ``make_fn`` must be a pure function of the dynamic (array-pytree)
    arguments — all static configuration goes into ``static_key``.

    ``in_shardings`` (optional): one ``NamedSharding`` per dynamic arg —
    required for ``shard_map``'d programs, whose export avals must carry
    their mesh placement.  The mesh topology (axis names + sizes) and the
    partition specs join the cache key, so an artifact is only ever loaded
    for an identically-shaped mesh (VERDICT r3 item 4: a multi-host
    deployment re-traces the sharded FS program once per topology, not
    once per process)."""
    import jax

    if not enabled():
        return make_fn(*dyn_args)
    if in_shardings is None:
        avals = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), tuple(dyn_args)
        )
        shard_sig = None
    else:
        avals = tuple(
            jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s)
            for x, s in zip(dyn_args, in_shardings)
        )
        shard_sig = tuple(
            (tuple(dict(s.mesh.shape).items()), str(s.spec)) for s in in_shardings
        )
    aval_sig = jax.tree.map(lambda a: (tuple(a.shape), str(a.dtype)), avals)
    key_src = repr(
        (kind, _source_fingerprint(), jax.__version__, jax.default_backend(),
         static_key, aval_sig, shard_sig)
    )
    key = hashlib.sha256(key_src.encode()).hexdigest()[:32]
    path = _cache_dir() / f"{kind}-{key}.jaxexport"
    memo_key = str(path)  # includes the cache dir (tests use per-test dirs)
    from .timing import timed

    try:
        if memo_key in _EXP_MEMO:  # in-process: deserialize/trace + compile ONCE
            return _EXP_MEMO[memo_key](*dyn_args)
        if path.exists():
            with timed(f"export.deserialize({kind})"):
                exp = jax.export.deserialize(path.read_bytes())
        else:
            with timed(f"export.trace+write({kind})"):
                exp = jax.export.export(
                    jax.jit(make_fn),
                    disabled_checks=[
                        jax.export.DisabledSafetyCheck.custom_call(
                            "tpu_custom_call"
                        )
                    ],
                )(*avals)
                blob = exp.serialize()
                path.parent.mkdir(parents=True, exist_ok=True)
                tmp = path.with_suffix(f".tmp{os.getpid()}")
                tmp.write_bytes(blob)
                os.replace(tmp, path)
        # memoize the JITTED wrapper: repeat calls hit the jit executable
        # cache instead of re-tracing exp.call per invocation
        _EXP_MEMO[memo_key] = jax.jit(exp.call)
        return _EXP_MEMO[memo_key](*dyn_args)
    except Exception as e:  # noqa: BLE001 — cache must never break the prover
        print(f"[zinc-tpu] export cache bypass ({kind}): {e}", file=sys.stderr)
        return make_fn(*dyn_args)
