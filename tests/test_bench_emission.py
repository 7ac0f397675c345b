"""bench.py emission contract (VERDICT r3 weak #1 / next #1).

The driver captures bench.py under a hard timeout and parses the LAST
JSON line of stdout.  BENCH_r03 was erased (rc=124, parsed: null)
because the old main() printed its single JSON line only after every
metric — including a ~14-minute full-SDXL subprocess — completed.  The
contract now under test:

  * the cumulative result line is printed after EVERY metric, so killing
    the process at any point leaves the already-measured metrics
    parseable;
  * every stdout line is valid JSON (progress goes to stderr);
  * a metric failure or budget exhaustion is recorded in-line
    (``<name>_error`` / ``<name>_skipped``) and never aborts the run;
  * a full-SDXL subprocess timeout records ``joint_full_sdxl_skipped``
    instead of raising.
"""

import json
import subprocess

import pytest

import bench


@pytest.fixture
def patched_bench(monkeypatch):
    monkeypatch.setattr(bench, "backend_reachable",
                        lambda timeout_s=0: True)
    monkeypatch.setattr(
        bench, "bench_nerf_render",
        lambda stochastic=False: (50000.0 if stochastic else 20000.0, 0.1))
    monkeypatch.setattr(bench, "bench_nerf_eval",
                        lambda: (250.0, 82.0, 0.005, 65536))
    monkeypatch.setattr(
        bench, "bench_sd_denoise",
        lambda n_steps=10, batch=2: (31.0, 32.0, 0.48 + 0.01 * batch,
                                     "TPU v5 lite", 197e12, 3.06e12,
                                     3.3e11, ("live_arrays", 6.0 + batch)))
    monkeypatch.setattr(bench, "bench_joint_step",
                        lambda stochastic=False: 110.0 if stochastic
                        else 420.0)
    return monkeypatch


def run_main(capsys):
    bench.main()
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert lines, "no stdout emitted"
    records = [json.loads(l) for l in lines]   # every line must parse
    return records


def test_every_line_parses_and_grows(patched_bench, monkeypatch, capsys):
    monkeypatch.setenv("BENCH_BUDGET_S", "100000")
    monkeypatch.setenv("BENCH_SKIP_FULL_SDXL", "1")
    records = run_main(capsys)
    assert len(records) >= 5, "one cumulative line per metric expected"
    # first emitted record already carries the primary metric
    assert records[0]["metric"] == "nerf_train_rays_per_sec"
    assert records[0]["value"] == 20000.0
    # records only grow: any truncation point leaves a valid subset
    for a, b in zip(records, records[1:]):
        assert set(a) <= set(b)
    last = records[-1]
    assert last["nerf_train_rays_per_sec_stochastic"] == 50000.0
    assert last["nerf_eval_ms_per_image_auto"] == 82.0
    assert last["sd_denoise_mfu"] == pytest.approx(0.5)
    assert last["sd_denoise_mfu_b4"] == pytest.approx(0.52)
    assert last["sd_denoise_hbm_gb_b8"] == 14.0
    assert last["sd_denoise_hbm_measure_b8"] == "live_arrays"
    assert last["joint_step_ms"] == 420.0
    assert last["joint_step_ms_stochastic"] == 110.0


def test_metric_failure_is_recorded_not_fatal(patched_bench, monkeypatch,
                                              capsys):
    monkeypatch.setenv("BENCH_BUDGET_S", "100000")
    monkeypatch.setenv("BENCH_SKIP_FULL_SDXL", "1")

    def boom():
        raise RuntimeError("transient tunnel blip")

    monkeypatch.setattr(bench, "bench_nerf_eval", boom)
    last = run_main(capsys)[-1]
    assert "transient tunnel blip" in last["nerf_eval_error"]
    assert last["joint_step_ms"] == 420.0      # later metrics still ran


def test_full_sdxl_timeout_records_skip(patched_bench, monkeypatch, capsys):
    monkeypatch.setenv("BENCH_BUDGET_S", "100000")
    monkeypatch.delenv("BENCH_SKIP_FULL_SDXL", raising=False)

    def timeout(timeout_s=0):
        raise subprocess.TimeoutExpired("bench_joint_full_sdxl", timeout_s)

    monkeypatch.setattr(bench, "bench_joint_full_sdxl", timeout)
    last = run_main(capsys)[-1]
    assert "joint_full_sdxl_skipped" in last
    assert "joint_step_full_sdxl_ms" not in last


def test_exhausted_budget_skips_and_records(patched_bench, monkeypatch,
                                            capsys):
    monkeypatch.setenv("BENCH_BUDGET_S", "0")
    monkeypatch.setenv("BENCH_SKIP_FULL_SDXL", "1")
    records = run_main(capsys)
    last = records[-1]
    # the primary metric always runs; everything else records the skip
    assert last["value"] == 20000.0
    assert "insufficient budget" in last["nerf_stochastic_skipped"]
    assert "insufficient budget" in last["joint_step_skipped"]
    assert "joint_step_ms" not in last
