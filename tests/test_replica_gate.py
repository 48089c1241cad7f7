"""CI-style gate: the full driver-replica run must report 0 failures.

`tools/driver_replica.py` is the local reproduction of the external
driver's correctness gate (every `queries()` entry hash-compared against
its `oracle_sql()` on DuckDB). Wiring its exit status into the suite means
a round cannot ship green while any registered query mismatches its
oracle.

Runs at sf0.001 by default (~1-2 min, catches wiring + value bugs — the
md5-PRF determinism contract makes values scale-independent); set
REPLICA_GATE_SF=/root/testdata/sf0.01 to run the driver's exact scale.
Set REPLICA_GATE_SKIP=1 to skip (e.g. when iterating on one operator).
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.replica_gate
def test_driver_replica_reports_zero_failures():
    if os.environ.get("REPLICA_GATE_SKIP"):
        pytest.skip("REPLICA_GATE_SKIP set")
    sf_dir = os.environ.get("REPLICA_GATE_SF", "/root/testdata/sf0.001")
    env = dict(os.environ)
    # The FULL registry (220+ queries) in one session needs more than
    # Spark's default 1g driver heap (GCLocker allocation failures past
    # ~170 queries — see .claude/skills/verify/SKILL.md); the external
    # driver never hits this because it runs only the ~50 pinned keys.
    env.setdefault("REPLICA_DRIVER_MEM", "4g")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "driver_replica.py"), sf_dir],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=1800,
        env=env,
    )
    tail = "\n".join(proc.stdout.splitlines()[-120:])
    assert proc.returncode == 0, f"replica rc={proc.returncode}\n{tail}\n{proc.stderr[-2000:]}"
    assert ", 0 failures" in proc.stdout, tail
