"""Example runner: executes every example script and reports pass/fail.

Counterpart of the reference's notebook CI harness
(`tensorflow_recommenders/examples/nbtool.py:83-104`, 600 s timeout per
notebook): each `examples/*.py` runs as a subprocess with a timeout;
failures print the tail of their output. Exit code is the failure count.

Usage:
    python tools/run_examples.py               # all examples
    python tools/run_examples.py quickstart    # substring filter
    python tools/run_examples.py --timeout 300
"""

import argparse
import glob
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("filter", nargs="?", default="")
    parser.add_argument("--timeout", type=int, default=600)
    parser.add_argument(
        "--budget", type=int, default=120,
        help="per-example time budget (s); overruns are reported "
        "(and FAIL the gate) even when the example passes",
    )
    parser.add_argument(
        "--platform", default="cpu",
        help="JAX platform for the examples (default cpu: the gate is "
        "an integration test; an ambient remote-TPU plugin would pay "
        "a per-dispatch tunnel round-trip per step and 7x the gate)",
    )
    args = parser.parse_args()

    scripts = sorted(glob.glob(os.path.join(REPO, "examples", "*.py")))
    scripts = [s for s in scripts if args.filter in os.path.basename(s)]
    if not scripts:
        print("no examples matched", file=sys.stderr)
        return 1

    failures = 0
    for script in scripts:
        name = os.path.basename(script)
        start = time.perf_counter()
        try:
            # runpy + a repo-root sys.path entry instead of PYTHONPATH:
            # setting PYTHONPATH breaks JAX platform-plugin discovery in
            # some environments. JAX_PLATFORMS alone is ignored when a
            # TPU plugin is ambient, so the platform choice is forced via
            # jax.config too.
            bootstrap = (
                "import os, runpy, sys; "
                "sys.path.insert(0, sys.argv[2]); "
                "p = os.environ.get('JAX_PLATFORMS'); "
                "exec('import jax; jax.config.update(\"jax_platforms\", p)' "
                "if p else ''); "
                "runpy.run_path(sys.argv[1], run_name='__main__')"
            )
            env = dict(os.environ, JAX_PLATFORMS=args.platform)
            proc = subprocess.run(
                [sys.executable, "-c", bootstrap, script, REPO],
                cwd=REPO,
                env=env,
                capture_output=True,
                text=True,
                timeout=args.timeout,
            )
            ok = proc.returncode == 0
            tail = (proc.stdout + proc.stderr).strip().splitlines()[-8:]
        except subprocess.TimeoutExpired:
            ok, tail = False, [f"TIMEOUT after {args.timeout}s"]
        elapsed = time.perf_counter() - start
        over = elapsed > args.budget
        status = "PASS" if ok else "FAIL"
        print(
            f"[{status}] {name} ({elapsed:.1f}s"
            f"{f' — OVER {args.budget}s budget' if over else ''})"
        )
        if ok and over:
            failures += 1
        if not ok:
            failures += 1
            for line in tail:
                print(f"    {line}")
    print(f"{len(scripts) - failures}/{len(scripts)} examples passed")
    return failures


if __name__ == "__main__":
    sys.exit(main())
