"""Run the TPU test lane and write the committed JSON artifact.

Usage (bench environment):
    PYTHONPATH=.:/root/.axon_site python tpu_tests/run_lane.py

Writes TPU_TESTS.json at the repo root: per-test outcomes + backend, the
executable record that the Pallas kernels were validated on hardware
(round-1 verdict item 6).
"""
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)


def main():
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", HERE, "-v", "--tb=line",
         "-p", "no:cacheprovider"],
        capture_output=True, text=True, cwd=ROOT,
    )
    wall = time.time() - t0
    lines = proc.stdout.splitlines()
    results = {}
    for ln in lines:
        if "::" in ln and (" PASSED" in ln or " FAILED" in ln
                           or " SKIPPED" in ln or " ERROR" in ln):
            name, _, rest = ln.partition(" ")
            results[name.split("::", 1)[1]] = rest.split()[0]
    summary = lines[-1] if lines else ""
    import jax

    artifact = {
        "backend": jax.default_backend(),
        "devices": [str(d) for d in jax.devices()],
        "passed": sum(1 for v in results.values() if v == "PASSED"),
        "failed": sum(1 for v in results.values() if v == "FAILED"),
        "skipped": sum(1 for v in results.values() if v == "SKIPPED"),
        "wall_s": round(wall, 1),
        "summary": summary.strip("= "),
        "tests": results,
        "returncode": proc.returncode,
    }
    out = os.path.join(ROOT, "TPU_TESTS.json")
    with open(out, "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(json.dumps(artifact, indent=1))
    sys.exit(proc.returncode)


if __name__ == "__main__":
    main()
