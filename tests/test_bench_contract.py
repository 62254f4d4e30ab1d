"""The driver runs `python bench.py` and parses ONE JSON line
{"metric", "value", "unit", "vs_baseline"} — a formatting regression means
the round records no metric, so the contract is pinned here (CPU backend:
vs_baseline reports 0.0 by design)."""

import json
import os
import subprocess
import sys


def test_bench_prints_driver_json_line():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # the env var alone cannot beat the axon sitecustomize (CLAUDE.md): the
    # plugin registers first and jax.devices() dials the tunnel — force the
    # platform via jax.config before exec'ing bench.py
    runner = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "exec(open('bench.py').read())"
    )
    out = subprocess.run(
        [sys.executable, '-c', runner],
        capture_output=True, text=True, timeout=480, cwd=repo,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.strip().startswith('{')]
    assert len(lines) == 1, out.stdout
    d = json.loads(lines[0])
    assert d['metric'] == 'quantize_vectors_per_sec_per_chip'
    assert d['unit'] == 'vectors/s'
    assert d['value'] > 0
    assert isinstance(d['vs_baseline'], float)
    assert d['bf16_tier_speedup'] > 0


def _run_bench_with_probe(probe_cmd, timeout_env=None):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, VQTPU_BENCH_PROBE_CMD=probe_cmd)
    if timeout_env is not None:
        env['VQTPU_BENCH_PROBE_TIMEOUT'] = timeout_env
    return subprocess.run(
        [sys.executable, 'bench.py'],
        capture_output=True, text=True, timeout=240, cwd=repo, env=env,
    )


def _assert_skipped_line(out):
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.strip().startswith('{')]
    assert len(lines) == 1, out.stdout
    d = json.loads(lines[0])
    assert d['skipped'] == 'tpu-unavailable'
    assert d['metric'] == 'quantize_vectors_per_sec_per_chip'
    assert d['value'] is None and d['vs_baseline'] is None


def test_bench_emits_skipped_json_when_backend_raises():
    # round-3 outage mode: PJRT init raises (BENCH_r03.json recorded
    # parsed=null from the raw traceback — VERDICT r3 item 5)
    out = _run_bench_with_probe(
        f'{sys.executable} -c "raise SystemExit(1)"')
    _assert_skipped_line(out)


def test_bench_emits_skipped_json_when_backend_hangs():
    # round-4 outage mode: init hangs inside the chip claim
    out = _run_bench_with_probe(
        f'{sys.executable} -c "import time; time.sleep(60)"',
        timeout_env='3',
    )
    _assert_skipped_line(out)
