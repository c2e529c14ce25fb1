"""Real 2-process ``jax.distributed`` cluster execution (verdict item:
the hybrid-DCN branch and the multihost checkpoint path must run with
``jax.process_count() == 2``, not only on single-process virtual meshes).

Heavy tier: spawns three subprocesses (a single-process reference and two
cluster workers) that each compile the tiny train step on CPU."""

import json
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

pytestmark = pytest.mark.heavy


def test_two_process_cluster_proof(tmp_path):
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "multiproc_proof.py"),
         "--out", str(tmp_path)],
        cwd=REPO, capture_output=True, text=True, timeout=2400,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    result = json.loads((tmp_path / "result.json").read_text())
    assert result["ok"]
    assert result["process_count"] == 2
    assert result["mesh_shape"] == {"dcn": 2, "data": 4, "model": 1}
    assert result["hybrid_branch"] and result["checkpoint_roundtrip_ok"]
    assert result["loss_delta"] <= 1e-5
