"""Field-arithmetic microbenchmarks (mirror of
/root/reference/benches/random_field_benches.rs:19-97: mul/add/div/neg/sum/
product over a 128-bit prime, plus the batched device tier at 2^20).

Usage: python benches/bench_field.py   (runs on the default JAX platform)
"""

from __future__ import annotations

import json
import random
import sys
import time

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

from zinc_tpu.fields.config import FieldConfig

P128 = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFF61  # 128-bit prime (2^128 - 159)


def host_ubench() -> None:
    cfg = FieldConfig(P128, 2)
    rng = random.Random(0)
    a = cfg.fp(rng.randrange(cfg.q))
    b = cfg.fp(rng.randrange(cfg.q))
    n = 10_000
    for name, op in [
        ("mul", lambda: a * b),
        ("add", lambda: a + b),
        ("div", lambda: a / b),
        ("neg", lambda: -a),
    ]:
        t0 = time.perf_counter()
        for _ in range(n):
            op()
        dt = (time.perf_counter() - t0) / n
        print(json.dumps({"metric": f"host_fp_{name}_128bit", "value": round(dt * 1e9, 1), "unit": "ns"}))


def device_batch_bench() -> None:
    import jax
    import numpy as np

    from zinc_tpu.fields.montgomery import device_field, mont_add, mont_mul
    from zinc_tpu.sumcheck.device import _use_pallas

    cfg = FieldConfig((1 << 255) + 95, 4)
    ctx = device_field(cfg)
    b = 1 << 20 if jax.devices()[0].platform == "tpu" else 1 << 16
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.integers(0, 1 << 16, (b, 16), dtype=np.uint32))
    y = jax.device_put(rng.integers(0, 1 << 16, (b, 16), dtype=np.uint32))

    ops = {"mont_add": lambda c, u, v: mont_add(c, u, v), "mont_mul": mont_mul}
    if _use_pallas(b):
        from zinc_tpu.ops.pallas_field import mont_mul_pallas_t

        ops["mont_mul_pallas"] = lambda c, u, v: mont_mul_pallas_t(c, u, v)

    for name, op in ops.items():
        def chained(k, op=op):
            @jax.jit
            def f(u, v):
                z = u
                for _ in range(k):
                    z = op(ctx, z, v)
                return jax.numpy.sum(z, dtype=jax.numpy.uint32)

            return f

        c1, c9 = chained(1), chained(9)
        int(c1(x, y)); int(c9(x, y))  # compile
        t0 = time.perf_counter(); int(c1(x, y)); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); int(c9(x, y)); t9 = time.perf_counter() - t0
        per = (t9 - t1) / 8
        print(json.dumps({
            "metric": f"device_{name}_2p{b.bit_length()-1}",
            "value": round(per * 1e3, 3), "unit": "ms",
            "throughput_meps": round(b / per / 1e6, 1),
        }))


if __name__ == "__main__":
    host_ubench()
    device_batch_bench()
