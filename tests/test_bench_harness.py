"""The bench parent retry harness (VERDICT r3 item 1): a wedged/failed
attempt must not lose the round's perf number — fresh-subprocess retries,
bounded per-attempt timeouts, JSON line passthrough.

These tests drive bench.py's real parent loop against the QASR_BENCH_FAKE
child hook (no device touched)."""
import json
import os
import subprocess
import sys

BENCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "bench.py")


def _run(env_extra, timeout=60):
    env = {k: v for k, v in os.environ.items()
           if not k.startswith("QASR_BENCH")}
    env.update(env_extra)
    return subprocess.run([sys.executable, BENCH], env=env,
                          capture_output=True, text=True, timeout=timeout)


def test_success_passthrough():
    line = json.dumps({"metric": "m", "value": 1.0, "unit": "u",
                       "vs_baseline": 0.05, "mfu": 0.1})
    p = _run({"QASR_BENCH_FAKE": line})
    assert p.returncode == 0
    out = json.loads(p.stdout.strip().splitlines()[-1])
    assert out["metric"] == "m" and out["mfu"] == 0.1


def test_failing_child_exhausts_attempts_nonzero():
    p = _run({"QASR_BENCH_FAKE": "not json", "QASR_BENCH_FAKE_RC": "7",
              "QASR_BENCH_ATTEMPTS": "2"})
    assert p.returncode != 0
    assert p.stderr.count("failed rc=7") == 2


def test_nonzero_rc_with_json_is_not_trusted():
    # a child that crashed after printing must not be treated as success
    line = json.dumps({"metric": "m", "value": 1.0})
    p = _run({"QASR_BENCH_FAKE": line, "QASR_BENCH_FAKE_RC": "3",
              "QASR_BENCH_ATTEMPTS": "1"})
    assert p.returncode != 0


def test_hung_child_is_killed_and_retried():
    p = _run({"QASR_BENCH_FAKE": "hang", "QASR_BENCH_ATTEMPTS": "2",
              "QASR_BENCH_ATTEMPT_TIMEOUT": "2"}, timeout=60)
    assert p.returncode != 0
    assert p.stderr.count("failed rc=-1") == 2
    assert "hard-timed out" in p.stderr
