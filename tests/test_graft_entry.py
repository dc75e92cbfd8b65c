"""Regression tests for the driver hooks in __graft_entry__.py.

Round-1 failure (VERDICT.md): the driver calls dryrun_multichip(8) in an
environment where JAX_PLATFORMS=axon is exported globally and the env var
`JAX_PLATFORMS=cpu` is ignored by the axon plugin; the hook must self-force
an n-device virtual CPU platform (jax.config.update + XLA_FLAGS) or re-exec
in a subprocess. These tests exercise both entry paths the driver can hit.
"""

import pytest
import os
import subprocess
import sys

pytestmark = pytest.mark.slow  # heavyweight e2e; quick pass skips via -m 'not slow'

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code: str, extra_env: dict) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    env.pop("_ADAPTIVE_DRYRUN_CHILD", None)
    env.update(extra_env)
    return subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )


def test_dryrun_multichip_fresh_process_under_hostile_env():
    """Driver path 1: fresh python, JAX_PLATFORMS env pointing at a platform
    that is not cpu and has 1 device. The hook must still build a 2-device
    virtual CPU mesh. (We simulate the axon trap with JAX_PLATFORMS=cpu and
    *no* device-count flag: without the hook's self-forcing, device_count
    would be 1 and make_mesh would assert exactly like MULTICHIP_r01.)"""
    res = _run(
        "import __graft_entry__ as g; g.dryrun_multichip(2)",
        {"JAX_PLATFORMS": "cpu", "XLA_FLAGS": ""},
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "dryrun_multichip OK" in res.stdout


def test_dryrun_multichip_with_jax_preinitialized():
    """Driver path 2: jax already initialized (1 device) before the call —
    the hook must detect this and re-exec in a subprocess."""
    code = (
        "import jax; jax.config.update('jax_platforms','cpu'); jax.devices(); "
        "assert jax.device_count() == 1, jax.device_count(); "
        "import __graft_entry__ as g; g.dryrun_multichip(2)"
    )
    res = _run(code, {"JAX_PLATFORMS": "cpu", "XLA_FLAGS": ""})
    assert res.returncode == 0, res.stderr[-2000:]
