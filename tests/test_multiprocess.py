"""True multi-process distributed integration test.

The in-suite sharding tests emulate a v4-8 with 8 virtual devices inside ONE
process; that never exercises the multi-host seams: gloo cross-process
collectives, ``shard_batch`` assembling a global array from per-host slices
(jax.make_array_from_process_local_data — device_put can't target another
process's devices), ``process_shard_indices`` disjointness, and the
``barrier``.  Here two real OS processes with 2 virtual CPU devices each form
a 4-device global mesh and run pmean-synced SGD steps — the JAX-native
equivalent of the reference's multi-GPU `accelerate launch` path
(reference train.py:122-126,185-202; SURVEY.md §2.3).
"""

import pytest
import json
import os
import socket
import subprocess
import sys

import numpy as np

WORKER = os.path.join(os.path.dirname(__file__), "mp_worker.py")
LOOP_WORKER = os.path.join(os.path.dirname(__file__), "mp_loop_worker.py")
NPROC = 2


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_data_parallel(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(WORKER))
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(NPROC), str(port),
             str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(NPROC)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    results = {}
    for pid in range(NPROC):
        with open(tmp_path / f"result_{pid}.json") as f:
            results[pid] = json.load(f)

    # process_shard_indices: disjoint slices covering the dataset
    all_idx = sorted(i for r in results.values() for i in r["shard_indices"])
    assert all_idx == list(range(10))
    assert set(results[0]["shard_indices"]).isdisjoint(
        results[1]["shard_indices"])
    # uneven n: every process gets the SAME count (remainder dropped) so
    # hosts agree on batches-per-epoch — unequal slices would deadlock the
    # first collective of the extra batch
    uneven = [r["shard_indices_uneven"] for r in results.values()]
    assert len(uneven[0]) == len(uneven[1]) == 5
    assert set(uneven[0]).isdisjoint(uneven[1])
    assert set(uneven[0]) | set(uneven[1]) <= set(range(11))

    # pmean-synced SGD: both processes hold identical params equal to the
    # single-host 2-step reference computed here in numpy
    x = np.arange(16, dtype=np.float32).reshape(4, 4) / 10.0
    y = np.ones(4, np.float32)
    w = np.zeros(4, np.float32)
    for _ in range(2):
        # per-device loss over 1 row; pmean of grads == global mean grad
        pred = x @ w
        grad = np.mean(2 * (pred - y)[:, None] * x, axis=0)
        loss = float(np.mean((pred - y) ** 2))
        w = w - 0.1 * grad
    for r in results.values():
        np.testing.assert_allclose(r["w"], w, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(r["loss"], loss, rtol=1e-5)
    assert results[0]["w"] == results[1]["w"]


@pytest.mark.slow
def test_two_process_training_loop(tmp_path):
    """The REAL production loop cross-process: per-host dataset slicing,
    local-slice batch feeding, pmean-synced updates, replicated val/infer
    batches, single-writer metrics."""
    port = _free_port()
    datadir = tmp_path / "data"
    workdir = tmp_path / "work"
    datadir.mkdir()
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(WORKER))
    procs = [
        subprocess.Popen(
            [sys.executable, LOOP_WORKER, str(pid), str(NPROC), str(port),
             str(datadir), str(workdir), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(NPROC)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"loop worker failed:\n{out[-4000:]}"

    results = {}
    for pid in range(NPROC):
        with open(tmp_path / f"loop_result_{pid}.json") as f:
            results[pid] = json.load(f)

    # both hosts ran 2 epochs with finite, IDENTICAL pmean-synced metrics
    for r in results.values():
        assert len(r["train_losses"]) == 2
        assert all(np.isfinite(r["train_losses"]))
        assert all(np.isfinite(r["val_losses"]))
    np.testing.assert_allclose(results[0]["train_losses"],
                               results[1]["train_losses"], rtol=1e-5)
    # params ended identical on both hosts (replicated across the mesh)
    np.testing.assert_allclose(results[0]["param_probe"],
                               results[1]["param_probe"], rtol=1e-6)
    # exactly one metrics writer (process 0) on the shared filesystem:
    # 2 epoch records + 1 interleaved-inference record (inference_every=2)
    records = [json.loads(l) for l in
               (workdir / "metrics.jsonl").read_text().splitlines()]
    assert len([r for r in records if r.get("kind") != "inference"]) == 2
    assert len([r for r in records if r.get("kind") == "inference"]) == 1
