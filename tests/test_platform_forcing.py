"""JAX_PLATFORMS=cpu must actually force the CPU backend.

The axon TPU plugin on this host ignores the JAX_PLATFORMS env var; with the
TPU tunnel down, a process that merely sets the env hangs forever inside
backend init. `umnn_tpu/__init__.py` therefore mirrors the env var into
jax.config (which the plugin does respect) at import time. This test runs the
import in a fresh subprocess — the in-process backend is already pinned by
conftest, so only a child process can observe the behavior.
"""

import os
import subprocess
import sys


def test_env_var_forces_cpu_backend():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("JAX_PLATFORM_NAME", None)
    out = subprocess.run(
        [
            sys.executable,
            "-c",
            "import umnn_tpu, jax; "
            "print(','.join(d.platform for d in jax.devices()))",
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    platforms = set(out.stdout.strip().split(","))
    assert platforms == {"cpu"}, out.stdout
