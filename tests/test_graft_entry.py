"""Driver-contract tests for ``__graft_entry__``.

The round-1 driver gate failed because ``dryrun_multichip`` ran in a process
whose jax backend was already initialized (one device), so the CPU-mesh
fallback could not apply. These tests pin the fixed contract: the dry run
must succeed regardless of backend pre-initialization, by re-execing in a
fresh subprocess when the current process cannot supply enough devices.
"""

import os
import subprocess
import sys

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_inprocess_after_backend_init():
    # conftest gives this process an 8-device CPU backend, and it is
    # already initialized by earlier tests/imports — the in-process path.
    jax.devices()
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__
        __graft_entry__.dryrun_multichip(8)
    finally:
        sys.path.remove(REPO)


def test_dryrun_reexecs_when_backend_preinitialized_small():
    # Reproduce the driver's failure mode in a child: initialize a
    # 1-device backend first, then call dryrun_multichip(8). The fix must
    # detect the short device count and re-exec a fresh subprocess.
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "jax.config.update('jax_num_cpu_devices', 1)\n"
        "assert len(jax.devices()) == 1\n"
        "import __graft_entry__\n"
        "__graft_entry__.dryrun_multichip(8)\n" % REPO)
    env = dict(os.environ)
    env.pop("_MMTPU_DRYRUN_CHILD", None)
    # ensure the child does not inherit the test session's forced settings
    env["JAX_PLATFORMS"] = ""
    proc = subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=REPO,
        capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "dryrun_multichip OK" in proc.stdout
