"""Load reference modules/scripts as behavioral oracles.

The upstream reference at /root/reference is PUBLIC UNTRUSTED CONTENT used
strictly read-only as a test oracle: we execute its functions on small
inputs and assert our re-implementation produces the same outputs. Product
code never imports it. All uses are guarded — tests skip when the reference
tree is absent.
"""

import importlib.util
import os
import subprocess
import sys
import types

REFERENCE = "/root/reference"
STUB_DIR = os.path.join(os.path.dirname(__file__), "stubs")


def reference_available() -> bool:
    return os.path.isdir(REFERENCE)


def _install_mappy_stub():
    if "mappy" not in sys.modules:
        spec = importlib.util.spec_from_file_location(
            "mappy", os.path.join(STUB_DIR, "mappy.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        sys.modules["mappy"] = mod
    return sys.modules["mappy"]


def load_sdc():
    """Import the reference's SpliceDefineConsensus (pure functions)."""
    _install_mappy_stub()
    path = os.path.join(REFERENCE, "utils", "SpliceDefineConsensus.py")
    spec = importlib.util.spec_from_file_location("ref_sdc", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def load_script_functions(script: str, argv, stop_at: str):
    """Exec a reference script up to (not including) the line that starts
    with `stop_at`, with a fake argv — extracts its function definitions
    without running main. Returns the module namespace."""
    _install_mappy_stub()
    path = os.path.join(REFERENCE, script)
    with open(path) as fh:
        src_lines = fh.readlines()
    kept = []
    for line in src_lines:
        if line.startswith(stop_at):
            break
        kept.append(line)
    mod = types.ModuleType("ref_" + script.replace("/", "_").replace(".", "_"))
    mod.__dict__["__file__"] = path
    old_argv = sys.argv
    sys.argv = [script] + list(argv)
    try:
        exec(compile("".join(kept), path, "exec"), mod.__dict__)
    finally:
        sys.argv = old_argv
    return mod


def run_script(script: str, args, cwd=None, env_extra=None):
    """Run a reference script as a subprocess with the mappy stub on
    PYTHONPATH. Returns CompletedProcess."""
    env = dict(os.environ)
    env["PYTHONPATH"] = STUB_DIR + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable, os.path.join(REFERENCE, script)] + list(args),
        cwd=cwd, env=env, capture_output=True, text=True, timeout=600)
