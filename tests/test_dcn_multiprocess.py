"""REAL multi-process (DCN) execution test.

Everything else in the suite simulates multi-host with a single-process
virtual mesh; this test launches TWO actual ``jax.distributed`` processes
(Gloo over localhost standing in for DCN), builds the production
("host", "chip") hierarchical mesh across them, runs the COMPLETE sharded
prove, and asserts the proof bytes equal the host oracle's and that the
verifier accepts — the executable version of docs/SCALING.md's DCN design
(SURVEY §2.12/§5.8; replaces the reference's single-host Rayon ceiling,
/root/reference/src/zip/pcs/commit.rs:164-180).

Implementation notes this test pins against regressions:
- ``import zinc_tpu`` must NOT initialize the XLA backends (else
  ``jax.distributed`` can never attach — zinc_tpu/__init__.py,
  fields/integers.py MASK16);
- every host fetch of a mesh-sharded array must go through
  ``parallel.mesh.fetch_global`` (np.asarray raises on non-addressable
  shards).
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]

_WORKER = r'''
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ.pop("ZINC_TPU_EXPORT_CACHE", None)
sys.path.insert(0, %(root)r)

pid = int(sys.argv[1]); port = sys.argv[2]

from zinc_tpu.parallel import hierarchical_mesh, init_distributed

assert init_distributed(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
), "init_distributed returned False in a 2-process run"

import jax
assert jax.process_count() == 2
mesh = hierarchical_mesh()
assert mesh.axis_names == ("host", "chip")
assert mesh.shape == {"host": 2, "chip": 2}

import random
from zinc_tpu.ccs import dummy_ccs_of_size
from zinc_tpu.prime import draw_random_field
from zinc_tpu.serialize import serialize_proof
from zinc_tpu.transcript import KeccakTranscript
from zinc_tpu.zinc import ZincProver, ZincVerifier
from zinc_tpu.zip.code import ZipTypes

zt = ZipTypes(1)
_, ccs, statement, wit = dummy_ccs_of_size(1 << 6, random.Random(21), int_bits=62)

def prove(backend, mesh_arg):
    t = KeccakTranscript()
    cfg = draw_random_field(statement.public_input, t, zt.n_words, 4)
    return cfg, ZincProver(zt, backend=backend, mesh=mesh_arg).prove(
        statement, wit, t, ccs, cfg
    )

cfg_m, proof_m = prove("device", mesh)
blob_m = serialize_proof(proof_m, cfg_m)
if pid == 0:
    cfg_h, proof_h = prove("host", None)
    assert blob_m == serialize_proof(proof_h, cfg_h), "DCN proof != host oracle"
    ZincVerifier(zt).verify(statement, proof_m, KeccakTranscript(), ccs, cfg_m)
    print("DCN_OK", len(blob_m), flush=True)
'''


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dcn_prove_bit_identical(tmp_path):
    worker = tmp_path / "dcn_worker.py"
    worker.write_text(_WORKER % {"root": str(ROOT)})
    port = _free_port()
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                     "JAX_PROCESS_ID")
    }
    # shell-level: sitecustomize imports jax before worker code runs, and a
    # blank axon pool skips the TPU-tunnel registration that would otherwise
    # hang interpreter boot when the tunnel is down (CLAUDE.md)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for pid in (1, 0)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=840)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        raise
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
    assert "DCN_OK" in outs[1], outs[1][-3000:]
