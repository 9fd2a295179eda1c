"""Bench parent-orchestration tests (VERDICT r3 #1: the scored line must
survive timeouts).  The TPU children are faked with tiny subprocesses so
the no-TPU parent logic — progressive line forwarding, budget-based
abandonment without killing, merge semantics, failure line — is testable
on CPU."""

import json
import subprocess
import sys
import time

import pytest

from manga_ocr_tpu import benchmark as bm


def _fake_child(code: str):
    return subprocess.Popen(
        [sys.executable, "-u", "-c", code],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
    )


def test_stream_child_forwards_lines_progressively():
    proc = _fake_child(
        "import json,time\n"
        "print(json.dumps({'value': 1.0}), flush=True)\n"
        "time.sleep(0.2)\n"
        "print(json.dumps({'value': 2.0, 'x': 1}), flush=True)\n"
    )
    seen = []
    done = bm._stream_child(proc, time.time() + 30, seen.append)
    assert done is True
    assert seen == [{"value": 1.0}, {"value": 2.0, "x": 1}]


def test_stream_child_abandons_overrun_without_killing():
    proc = _fake_child(
        "import json,time\n"
        "print(json.dumps({'value': 3.0}), flush=True)\n"
        "time.sleep(60)\n"
        "print(json.dumps({'value': 9.0}), flush=True)\n"
    )
    seen = []
    t0 = time.time()
    # margin covers child interpreter startup (~2 s with the image's heavy
    # sitecustomize), far below the 60 s the child would run
    done = bm._stream_child(proc, time.time() + 8, seen.append)
    assert done is False
    assert time.time() - t0 < 20
    assert seen == [{"value": 3.0}]  # the early line was captured
    assert proc.poll() is None, "child must be abandoned, never killed"
    proc.kill()  # test cleanup only (a plain sleep, not a TPU client)
    proc.wait()


def test_main_merges_phases_and_prints_final_line(monkeypatch, capsys):
    """Parent end-to-end with fake phase children: the last stdout line
    carries the best scored value plus the full-path and budget-300 keys."""

    def fake_spawn(flag, deadline):
        if flag == "--model-only":
            return _fake_child(
                "import json\n"
                "print(json.dumps({'metric': 'm', 'value': 100.0, 'unit': 'c/s',"
                " 'vs_baseline': 0.02, 'config': 'fast'}), flush=True)\n"
                "print(json.dumps({'metric': 'm', 'value': 200.0, 'unit': 'c/s',"
                " 'vs_baseline': 0.04, 'config': 'serving'}), flush=True)\n"
            )
        if flag == "--full-path":
            return _fake_child(
                "import json\n"
                "print(json.dumps({'full_path_crops_per_s': 50.0,"
                " 'stage_summary': {'h2d': {'mean_ms': 1.5}}}), flush=True)\n"
            )
        return _fake_child(
            "import json\n"
            "print(json.dumps({'crops_per_s_budget300_realistic': 75.0,"
            " 'budget300_mean_emitted_len': 14.1, 'budget300_batch': 256}),"
            " flush=True)\n"
        )

    monkeypatch.setattr(bm, "_spawn", fake_spawn)
    monkeypatch.setenv("BENCH_BUDGET_S", "120")
    # phase D must not fire here even on a machine where the trained
    # checkpoint exists (it is covered by its own test below)
    monkeypatch.setenv(bm.TRAINED_CKPT_ENV, "/nonexistent/trained_ckpt")
    bm.main()
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    assert len(lines) >= 2  # progressive lines plus the final merge
    first, final = json.loads(lines[0]), json.loads(lines[-1])
    assert first["value"] == 100.0  # the early line was already out
    assert final["value"] == 200.0
    assert final["config"] == "serving"
    assert final["vs_baseline"] == 0.04
    assert final["full_path_crops_per_s"] == 50.0
    assert final["full_path_stage_ms"] == {"h2d": 1.5}
    assert final["crops_per_s_budget300_realistic"] == 75.0
    assert "bench_wall_s" in final
    # every line parsed — a driver reading ANY of them gets a valid score
    for line in lines:
        assert "value" in json.loads(line)


def test_main_runs_phase_d_when_trained_ckpt_exists(monkeypatch, capsys, tmp_path):
    """With a trained-checkpoint dir present, the parent appends the
    genuine-EOS phase and its keys land in the final merged line."""

    def fake_spawn(flag, deadline):
        payloads = {
            "--model-only": {"metric": "m", "value": 10.0, "unit": "c/s",
                             "vs_baseline": 0.002, "config": "fast"},
            "--full-path": {"full_path_crops_per_s": 5.0},
            "--budget300": {"crops_per_s_budget300_realistic": 7.5},
            "--trained-eos": {"trained_eos_crops_per_s": 9.0,
                              "trained_fixed32_crops_per_s": 11.0},
        }
        return _fake_child(
            f"import json\nprint(json.dumps({payloads[flag]!r}), flush=True)\n"
        )

    monkeypatch.setattr(bm, "_spawn", fake_spawn)
    monkeypatch.setenv("BENCH_BUDGET_S", "120")
    monkeypatch.setenv(bm.TRAINED_CKPT_ENV, str(tmp_path))
    bm.main()
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    final = json.loads(lines[-1])
    assert final["value"] == 10.0
    assert final["trained_eos_crops_per_s"] == 9.0
    assert final["trained_fixed32_crops_per_s"] == 11.0


def test_main_emits_failure_line_when_nothing_measured(monkeypatch, capsys):
    monkeypatch.setattr(bm, "_spawn", lambda flag, deadline: _fake_child("pass"))
    monkeypatch.setenv("BENCH_BUDGET_S", "30")
    bm.main()
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    final = json.loads(lines[-1])
    assert final["value"] == 0.0 and "error" in final
    assert final["metric"] == "bubble_crop_ocr_decodes_per_sec_per_chip"


def test_scored_line_shape():
    d = bm._scored(4100.0, "serving B=256")
    assert d["metric"] == "bubble_crop_ocr_decodes_per_sec_per_chip"
    assert d["unit"] == "crops/s"
    assert d["vs_baseline"] == pytest.approx(0.82)
    assert 0 < d["mfu_vs_bf16_peak"] < 1
    assert d["model_gflops_per_crop"] > 0


def test_committed_lengths_distribution():
    lens = bm.committed_lengths(4096)
    assert lens.min() >= bm.LENGTH_CLIP[0] and lens.max() <= bm.LENGTH_CLIP[1]
    import numpy as np

    assert 10 <= np.median(lens) <= 14  # median ~12 tokens
