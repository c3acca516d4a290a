"""Head-to-head quality parity vs the ACTUAL reference implementation.

Runs `tools/reference_parity.py` (which imports TFRS v0.7.7 from
/root/reference under TF/tf-keras and trains it on the same synthetic
interactions as recommenders_tpu) at reduced scale. The script exits
nonzero if any metric diverges past tolerance — this is the strongest
form of the reference's published-quality north star (BASELINE.md:
recall@k parity; deep_recommenders.ipynb top-100, multitask.ipynb RMSE)
available without real MovieLens files.

Measured at full scale (100k interactions, 3 epochs, matched init —
docs/PARITY_HEAD_TO_HEAD.md): top-100 0.8576 (ref) vs 0.8588 (ours),
top-10 0.1897 vs 0.1927, RMSE 0.8684 vs 0.8664 — all within 0.006.
"""

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    not os.path.exists("/root/reference/tensorflow_recommenders"),
    reason="reference TFRS checkout unavailable",
)


def test_head_to_head_parity(tmp_path):
    out = str(tmp_path / "parity.md")
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "reference_parity.py"),
            "--interactions", "30000",
            "--epochs", "2",
            "--batch", "4096",
            "--seeds", "2",
            "--tolerance", "0.08",
            "--rmse-tolerance", "0.15",
            "--out", out,
        ],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=900,
    )
    assert proc.returncode == 0, (
        f"parity harness failed:\n{proc.stdout[-3000:]}\n"
        f"{proc.stderr[-2000:]}"
    )
    table = open(out).read()
    assert "| retrieval top-100 |" in table
    assert "NO" not in table
    # Multi-seed run: the table must carry across-seed error bars.
    assert "±" in table
    # Keep the measured table inspectable next to the test run.
    if os.environ.get("RTPU_KEEP_PARITY_TABLE"):
        shutil.copy(out, os.path.join(REPO, "docs", "PARITY_HEAD_TO_HEAD.md"))


def test_auc_and_unified_embedding_head_to_head(tmp_path):
    """DLRM AUC parity + the uet.ipynb three-way quality ordering,
    against the actual reference implementation (reduced scale; the
    full-scale table lives in docs/PARITY_HEAD_TO_HEAD.md)."""
    out = str(tmp_path / "parity_ctr.md")
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "reference_parity_ctr.py"),
            "--examples", "30000",
            "--epochs", "3",
            "--batch", "4096",
            "--tolerance", "0.05",
            "--uet-margin", "0.02",
            "--out", out,
        ],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=1800,
    )
    assert proc.returncode == 0, (
        f"CTR parity harness failed:\n{proc.stdout[-3000:]}\n"
        f"{proc.stderr[-2000:]}"
    )
    table = open(out).read()
    assert "| DLRM test AUC |" in table
    assert "collisionless" in table
    assert "NO" not in table
