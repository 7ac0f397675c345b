"""CLI surface smoke tests (no training runs)."""

import os
import subprocess
import sys

import pytest


def test_train_help():
    out = subprocess.run([sys.executable, "train.py", "--help"],
                         capture_output=True, text=True, timeout=120)
    assert out.returncode == 0
    for flag in ("--inference", "--dataset", "--sdxl-checkpoint",
                 "--sample-budget", "--tiny", "--epochs", "--lr",
                 "--guidance-scale", "--distributed", "--coordinator",
                 "--resume", "--data-parallel", "--tensor-parallel",
                 "--sp", "--fsdp", "--remat", "--lr-schedule"):
        assert flag in out.stdout


def test_fit_nerf_help():
    out = subprocess.run([sys.executable, "scripts/fit_nerf.py", "--help"],
                         capture_output=True, text=True, timeout=120)
    assert out.returncode == 0
    assert "--dataset" in out.stdout


def test_run_sd_help():
    out = subprocess.run([sys.executable, "scripts/run_sd.py", "--help"],
                         capture_output=True, text=True, timeout=120)
    assert out.returncode == 0
    assert "--sdxl-checkpoint" in out.stdout
    assert "--sp" in out.stdout and "--tp" in out.stdout


def test_coordinator_requires_process_topology():
    """--coordinator without --num-processes/--process-id must fail loudly
    BEFORE jax.distributed.initialize blocks waiting for peers."""
    out = subprocess.run(
        [sys.executable, "train.py", "--coordinator", "localhost:1",
         "--tiny"],
        capture_output=True, text=True, timeout=300,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "PYTHONPATH": "."},
    )
    assert out.returncode != 0
    assert "--num-processes" in (out.stderr + out.stdout)


def test_missing_dataset_message(tmp_path):
    out = subprocess.run(
        [sys.executable, "train.py", "--tiny", "--dataset", "nerf",
         "--data-root", str(tmp_path), "--epochs", "1"],
        capture_output=True, text=True, timeout=300,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "PYTHONPATH": "."},
    )
    assert out.returncode != 0
    assert "tiny_nerf_data.npz" in (out.stderr + out.stdout)


def test_compile_cache_flags_and_plumbing(tmp_path):
    """enable_compile_cache points JAX's persistent cache at the requested
    dir (verified live on the TPU tunnel: 2nd-process compile 1.33->0.54 s);
    'none' disables it; --checkpoint-every reaches TrainConfig."""
    import jax

    sys.path.insert(0, ".")
    import train as train_mod

    cache = tmp_path / "xla_cache"
    prev = jax.config.jax_compilation_cache_dir
    try:
        got = train_mod.enable_compile_cache(str(cache))
        assert got == str(cache) and cache.is_dir()
        assert jax.config.jax_compilation_cache_dir == str(cache)
        assert train_mod.enable_compile_cache("none") is None
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)

    args = train_mod.build_parser().parse_args(
        ["--checkpoint-every", "7", "--compile-cache", "none"])
    assert args.checkpoint_every == 7 and args.compile_cache == "none"


def test_compile_cache_default_is_repo_local(monkeypatch):
    """The default cache dir lives INSIDE the repo tree, not under the
    (ephemeral-on-target-hosts) home dir — a home-dir default silently
    turns every warm start cold across host resets (round-5 root cause
    of the 'cache barely benefits' observation)."""
    import jax

    sys.path.insert(0, ".")
    import train as train_mod

    monkeypatch.delenv("STABLE_NERF_COMPILE_CACHE", raising=False)
    prev = jax.config.jax_compilation_cache_dir
    try:
        got = train_mod.enable_compile_cache(None)
        repo = os.path.dirname(os.path.abspath(train_mod.__file__))
        assert got == os.path.join(repo, ".cache", "jax")
        assert not got.startswith(os.path.expanduser("~/.cache"))
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
