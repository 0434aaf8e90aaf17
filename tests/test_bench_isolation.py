"""bench.py crash isolation (VERDICT r3 weak #3 / next #2): one broken
section must never erase the round's perf record — the driver parses the
LAST stdout line, so it must be valid JSON carrying the failure in
``extra["errors"]`` even when a section raises.

Runs bench.py in a subprocess on the CPU backend with ``--inject-error``
so no model ever compiles (the injection raises at section entry) — the
test exercises the isolation plumbing, not the benchmark itself.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_BASE = [sys.executable, os.path.join(REPO, "bench.py"),
         "--backend", "cpu", "--steps", "1", "--batch", "2",
         "--frames", "128", "--no-from-disk", "--no-presets",
         "--no-csj-scale"]


def _run(extra_args):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    return subprocess.run(_BASE + extra_args, capture_output=True,
                          text=True, timeout=900, env=env, cwd=REPO)


def test_injected_section_failure_still_emits_final_json():
    out = _run(["--inject-error", "device_resident"])
    assert out.returncode == 0, (out.stdout, out.stderr)
    line = json.loads(out.stdout.strip().splitlines()[-1])
    assert line["metric"] == "train_utterances_per_sec_per_chip"
    assert line["value"] == 0.0
    err = line["extra"]["errors"]["device_resident"]
    assert "injected failure" in err
