"""Driver-contract tests for __graft_entry__.py.

The driver grades `dryrun_multichip` by its exit code: ok must mean "the
requested N-way mesh actually ran". Round-3 verdict #4: a silent 1x1
fallback (backend initialized before the virtual-CPU switch) could record
ok=true while validating no sharding — the guard must fail loudly instead.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_dryrun(n_devices: int, forced_count: int):
    """Run dryrun_multichip(n_devices) in a child whose XLA_FLAGS already
    pins the host device count (the bootstrap's `in`-check respects an
    existing flag, so this deterministically fixes the visible devices)."""
    env = os.environ.copy()
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={forced_count}"
    )
    env.pop("JAX_PLATFORMS", None)
    code = (
        "import __graft_entry__ as g; "
        f"g.dryrun_multichip({n_devices})"
    )
    return subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=600,
    )


def test_dryrun_multichip_fails_loudly_on_degraded_mesh():
    # Only 2 virtual devices visible but 8 requested: must exit nonzero
    # with the degradation message, never silently validate a small mesh.
    r = _run_dryrun(n_devices=8, forced_count=2)
    assert r.returncode != 0, r.stdout + r.stderr
    assert "refusing to validate a degraded mesh" in (r.stdout + r.stderr)
    # It must fail BEFORE printing the OK line.
    assert "dryrun_multichip OK" not in r.stdout
