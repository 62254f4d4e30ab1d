"""True multi-process execution: 2 CPU processes x 4 devices running the
data-parallel train step over one global mesh (jax.distributed — the DCN
stand-in), asserting bit-identical codebooks across processes and parity
with a single-process run of the same job.

The reference can only claim this by construction (DDP guards,
vector_quantize_pytorch.py:334-336); here it is executed."""

import base64
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_CHILD = os.path.join(os.path.dirname(__file__), '_mp_child.py')


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        return s.getsockname()[1]


def _run_child(proc_id: int, nproc: int, port: int,
               mode: str = 'dp') -> subprocess.Popen:
    env = dict(os.environ)
    env.pop('XLA_FLAGS', None)           # child sets its own device count
    env['JAX_PLATFORMS'] = 'cpu'
    return subprocess.Popen(
        [sys.executable, _CHILD, str(proc_id), str(nproc), str(port), mode],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
    )


def _parse(proc: subprocess.Popen) -> dict:
    out, err = proc.communicate(timeout=240)
    assert proc.returncode == 0, f'child failed:\n{err[-3000:]}'
    return json.loads(out.strip().splitlines()[-1])


def test_two_process_dp_bit_identical_codebooks():
    port = _free_port()
    procs = [_run_child(i, 2, port) for i in range(2)]
    results = [_parse(p) for p in procs]

    cb = [
        np.frombuffer(base64.b64decode(r['codebook_b64']), np.float32)
        for r in results
    ]
    assert results[0]['losses'] == results[1]['losses'], 'losses diverged'
    assert cb[0].tobytes() == cb[1].tobytes(), (
        'codebooks diverged across processes'
    )

    # parity vs the identical job run single-process (8 local devices):
    # same global batch, same mesh size — reduction topology may differ, so
    # allow float tolerance rather than bit equality
    single = _parse(_run_child(0, 1, port))
    cb_single = np.frombuffer(
        base64.b64decode(single['codebook_b64']), np.float32
    )
    np.testing.assert_allclose(cb_single, cb[0], atol=1e-5)
    np.testing.assert_allclose(single['losses'], results[0]['losses'],
                               atol=1e-5)


def test_two_process_group_axis():
    """Group-axis (EP-style) GroupedResidualVQ with the group axis crossing
    the PROCESS boundary: train losses and a post-training eval probe must
    be bit-identical across the two processes and match the identical
    single-process job (8 local devices)."""
    port = _free_port()
    procs = [_run_child(i, 2, port, mode='group') for i in range(2)]
    results = [_parse(p) for p in procs]

    assert results[0]['losses'] == results[1]['losses'], 'losses diverged'
    assert results[0]['probe'] == results[1]['probe'], 'probes diverged'

    single = _parse(_run_child(0, 1, port, mode='group'))
    np.testing.assert_allclose(single['losses'], results[0]['losses'],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(single['probe'][0], results[0]['probe'][0],
                               rtol=1e-5, atol=1e-4)
    # indices checksum: exact
    assert single['probe'][1] == results[0]['probe'][1]


def test_two_process_lfq_fused_entropy():
    """LFQ's fused Pallas entropy (interpret mode on CPU) inside the DP
    train step across a process boundary: the differentiable avg_prob psum
    must produce identical losses on both processes and match the
    single-process run of the same global job."""
    port = _free_port()
    procs = [_run_child(i, 2, port, mode='lfq') for i in range(2)]
    results = [_parse(p) for p in procs]

    assert results[0]['losses'] == results[1]['losses'], 'losses diverged'

    single = _parse(_run_child(0, 1, port, mode='lfq'))
    np.testing.assert_allclose(single['losses'], results[0]['losses'],
                               rtol=1e-5, atol=1e-6)


def test_two_process_2d_tp_mesh():
    """The full tensor-parallel path ACROSS a process boundary: a 2D
    (data=2 processes, code=4 local devices) mesh trains the code_axis
    VectorQuantize with kmeans init + expiry; both processes must end with
    the identical assembled codebook (data-replicated, code-sharded)."""
    port = _free_port()
    procs = [_run_child(i, 2, port, mode='tp') for i in range(2)]
    results = [_parse(p) for p in procs]

    assert results[0]['losses'] == results[1]['losses'], 'losses diverged'
    cb = [
        np.frombuffer(base64.b64decode(r['codebook_b64']), np.float32)
        for r in results
    ]
    assert cb[0].tobytes() == cb[1].tobytes(), (
        'assembled codebooks diverged across processes'
    )
    assert np.isfinite(cb[0]).all() and np.abs(cb[0]).max() > 0
