"""Bench supervisor outage discipline (VERDICT r03 item #1).

BENCH_r03 was rc=124/parsed=null: the supervisor waited 30 minutes for
tunnel recovery BEFORE emitting its stale-fallback JSON, and the
external timeout on the bench run killed it first. The contract now is
emit-early: a parseable JSON line must hit stdout right after the FIRST
failed probe (~seconds of overhead beyond the probe itself), with any
real measurement printed later as a superseding line.

These tests run bench.py as a subprocess with a faked dead probe
(TILER_BENCH_FAKE_PROBE=dead) and tiny retry budgets, and assert the
stale line appears fast under every fallback source condition.
"""
import json
import os
import subprocess
import sys
import time

BENCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "bench.py")


def _run_dead_probe(extra_env, timeout=90):
    env = dict(os.environ)
    env.update({
        "TILER_BENCH_FAKE_PROBE": "dead",
        "TILER_BENCH_OUTAGE_BUDGET_S": "3",
        "TILER_BENCH_PROBE_RETRY_S": "1",
    })
    env.update(extra_env)
    t0 = time.time()
    r = subprocess.run([sys.executable, BENCH], capture_output=True,
                       timeout=timeout, env=env, text=True)
    return r, time.time() - t0


def test_stale_line_emitted_fast_on_dead_tunnel(tmp_path):
    good = tmp_path / "last_good.json"
    good.write_text(json.dumps({
        "metric": "encode_fps_720p", "value": 3.2, "unit": "frames/s",
        "vs_baseline": 0.1067,
    }))
    r, wall = _run_dead_probe({"TILER_BENCH_LAST_GOOD": str(good)})
    assert r.returncode == 0, r.stderr
    # the line must appear long before any external timeout window:
    # with a faked probe the only waits are the 1s retry x 3s budget
    assert wall < 60, f"stale emit took {wall:.1f}s"
    lines = [ln for ln in r.stdout.splitlines() if ln.strip()]
    assert lines, "no stdout line emitted"
    parsed = json.loads(lines[-1])
    assert parsed["stale"] is True
    assert parsed["value"] == 3.2
    assert "stale_reason" in parsed


def test_stale_line_emitted_even_without_last_good(tmp_path):
    r, wall = _run_dead_probe(
        {"TILER_BENCH_LAST_GOOD": str(tmp_path / "missing.json")})
    assert r.returncode == 0, r.stderr
    assert wall < 60
    parsed = json.loads(
        [ln for ln in r.stdout.splitlines() if ln.strip()][-1])
    assert parsed["stale"] is True
    assert parsed["value"] == 0.0
    assert parsed["metric"] == "encode_fps_720p"


def test_placeholder_emitted_before_live_attempts(tmp_path):
    """An outage can START mid-run: the probe passes, then the child
    wedges and the stall/retry loop can spend longer than any external
    timeout. A parseable stale line must therefore be on stdout BEFORE
    the first child attempt, superseded later by the real measurement
    (or by a stale line with the accurate failure reason)."""
    good = tmp_path / "last_good.json"
    good.write_text(json.dumps({"metric": "encode_fps_720p", "value": 2.5,
                                "unit": "frames/s", "vs_baseline": 0.083}))
    env = dict(os.environ)
    env.update({
        "TILER_BENCH_FAKE_PROBE": "alive",
        "TILER_BENCH_LAST_GOOD": str(good),
        # malformed on purpose: the child crashes in <1s at int() parse,
        # exercising the retry loop without running a real encode
        "TILER_BENCH_W": "not-a-number",
    })
    r = subprocess.run([sys.executable, BENCH], capture_output=True,
                       timeout=120, env=env, text=True)
    lines = [ln for ln in r.stdout.splitlines() if ln.strip()]
    assert lines, "no stdout line emitted"
    first = json.loads(lines[0])
    assert first["stale"] is True and first["value"] == 2.5
    # children exhausted with a healthy probe => visible failure, and the
    # last (superseding) line carries the accurate reason
    assert r.returncode == 1
    last = json.loads(lines[-1])
    assert last["stale"] is True
    assert "HEALTHY" in last["stale_reason"]


def test_stale_line_is_flushed_before_recovery_wait(tmp_path):
    """The stale line must be on stdout BEFORE the recovery wait ends —
    read the pipe incrementally and require the line within seconds of
    process start, while the process is still alive and waiting."""
    good = tmp_path / "last_good.json"
    good.write_text(json.dumps({"metric": "encode_fps_720p", "value": 2.0,
                                "unit": "frames/s", "vs_baseline": 0.066}))
    env = dict(os.environ)
    env.update({
        "TILER_BENCH_FAKE_PROBE": "dead",
        "TILER_BENCH_OUTAGE_BUDGET_S": "30",
        "TILER_BENCH_PROBE_RETRY_S": "1",
        "TILER_BENCH_LAST_GOOD": str(good),
    })
    p = subprocess.Popen([sys.executable, BENCH], stdout=subprocess.PIPE,
                         stderr=subprocess.DEVNULL, env=env, text=True)
    try:
        t0 = time.time()
        line = p.stdout.readline()
        latency = time.time() - t0
        assert json.loads(line)["stale"] is True
        assert latency < 20, f"stale line took {latency:.1f}s to appear"
        assert p.poll() is None, "process should still be retrying"
    finally:
        p.kill()
        p.wait(timeout=30)
