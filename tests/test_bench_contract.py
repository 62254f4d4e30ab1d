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
