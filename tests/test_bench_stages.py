"""The driver-bench capture contract (VERDICT r3 #1/#7).

BENCH_r03.json was `rc: 124, parsed: null`: the old bench printed its single
JSON line only after ALL stages, so one slow tunnel stage forfeited the
round's whole performance artifact. These tests pin the staged protocol:

- a cumulative, parseable headline JSON line lands on stdout after EVERY
  completed stage (the driver keeps the last complete line);
- an artificially wedged stage degrades to skip+annotate — the run still
  exits 0 with a complete final line (per-stage watchdog, VERDICT r3 #7);
- a global wall-clock budget skips the remainder instead of overrunning.

The bench runs as a subprocess in CPU smoke mode (tiny corpus; the
device-only stages gate themselves off), so these tests cost seconds.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# bench.py decides CPU-smoke mode from jax.default_backend(); the platform
# must be forced before the first device lookup (env vars are latched by
# sitecustomize on this image, so flip the config knob instead)
_RUN_BENCH = (
    "import jax; jax.config.update('jax_platforms', 'cpu'); "
    "import bench; bench.main()"
)


def _run(env_extra: dict, timeout: int = 240):
    env = dict(os.environ)
    env.update(env_extra)
    proc = subprocess.run(
        [sys.executable, "-c", _RUN_BENCH],
        cwd=REPO, env=env, timeout=timeout,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    parsed = [json.loads(ln) for ln in lines]
    return proc, parsed


def test_cumulative_emission_every_stage():
    proc, parsed = _run({})
    assert proc.returncode == 0, proc.stderr[-2000:]
    # two lines (full + compact) per completed/skipped-with-emit stage: at
    # least the four CPU-smoke stages (setup + 3 scans) plus the final emit
    assert len(parsed) >= 8
    # every line is a complete, self-contained artifact with the headline
    for res in parsed:
        assert {"metric", "value", "unit", "vs_baseline", "details"} <= set(res)
    # FINAL line: the compact driver-parseable digest (VERDICT r4 #1) —
    # the r4 artifact was lost because the full line outgrew the driver's
    # 2000-char tail capture
    raw_lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert len(raw_lines[-1]) < 1500, len(raw_lines[-1])
    last = parsed[-1]
    assert last["metric"] == "hybrid_search_device_scan_qps_1m_chunks"
    assert last["value"] > 0
    d = last["details"]
    assert d["scan_qps"] == last["value"]
    assert "stage_timings_s" in d and "setup_scan" in d["stage_timings_s"]
    assert "full_details" in d  # pointer to the full artifact
    # PENULTIMATE line: the full cumulative details (with provenance —
    # VERDICT r3 #8: the scan figure is labeled as the upper-bound scan)
    full = parsed[-2]
    fd = full["details"]
    assert "scan_qps" in fd["provenance"]
    assert "NOT a full search" in fd["provenance"]["scan_qps"]
    # ...and the same full line is mirrored to BENCH_LOCAL.json
    with open(os.path.join(REPO, "BENCH_LOCAL.json")) as f:
        local = json.loads(f.read())
    assert local["metric"] == full["metric"]
    assert "provenance" in local["details"]
    # intermediate lines are prefixes: the scan headline appears before the
    # final pair too (stage-by-stage accumulation, not one big print)
    assert any("scan_qps" in p["details"] for p in parsed[:-2])


def test_compact_line_capped_with_fat_details():
    # the digest must stay under the cap no matter how many figures and
    # how verbose the skip/error annotations get — the r4 failure mode
    import bench

    details = {k: 123456.789 for k in bench._DIGEST_PRIORITY}
    details.update(
        {f"extra_metric_{i}": 1e9 + i for i in range(200)},
        config_10m={k: 0.123456 for k in bench._CONFIG_10M_KEYS},
        stages_skipped={f"stage_{i}": "x" * 400 for i in range(20)},
        stage_errors={f"stage_{i}": "y" * 400 for i in range(20)},
        supervisor="z" * 1000,
        stage_timings_s={f"stage_{i}": 99.9 for i in range(20)},
        provenance={f"k{i}": "p" * 200 for i in range(40)},
    )
    res = {
        "metric": "certified_search_qps_1m_chunks", "value": 83093.2,
        "unit": "qps", "vs_baseline": 0.8309,
        "note": "n" * 500,
        "secondary": {
            "metric": "hybrid_search_device_scan_qps_1m_chunks",
            "value": 180000.0, "vs_baseline": 1.8,
            "padding": "s" * 300,
        },
        "details": details,
    }
    line = json.dumps(bench._compact_result(res))
    assert len(line) < 1500, len(line)
    out = json.loads(line)
    # headline fields verbatim; top-priority figures survive the cap
    assert out["metric"] == res["metric"] and out["value"] == res["value"]
    assert out["secondary"]["value"] == 180000.0
    assert out["details"]["serve_device_qps"] == 123456.789
    assert out["details"]["e2e_qps_projected_dd_pipelined"] == 123456.789
    # idempotent: re-compacting a compact line keeps the cap and headline
    line2 = json.dumps(bench._compact_result(out))
    assert len(line2) < 1500
    assert json.loads(line2)["value"] == res["value"]


def test_wedged_stage_degrades_to_skip_annotate():
    # scan_full wedges for 120 s; every stage's deadline is capped at 15 s
    # (the real stages finish in 1-4 s on the CPU smoke corpus, so only the
    # wedged one trips it) — the checkpoint-aware loop aborts, the stage is
    # annotated, later stages still run, and the run exits 0 with a
    # complete final line
    proc, parsed = _run({
        "OMNI_BENCH_FAKE_SLOW_STAGE": "scan_full:120",
        "OMNI_BENCH_STAGE_DEADLINE_S": "15",
    })
    assert proc.returncode == 0, proc.stderr[-2000:]
    last = parsed[-1]
    d = last["details"]
    assert "scan_full" in d.get("stages_skipped", {}), d.get("stages_skipped")
    assert "abort" in d["stages_skipped"]["scan_full"]
    # the wedged stage did NOT take its figures down with it...
    assert "full_fused_scan_qps" not in d
    # ...and did not take the rest of the bench down either: the headline
    # scan (an earlier stage) and the kw scan (a later stage) both landed
    assert last["value"] > 0
    assert "kw_only_scan_qps" in d


def _run_supervised(wedge_mode: str):
    env = dict(os.environ)
    env.update({
        "OMNI_BENCH_PLATFORM": "cpu",
        "OMNI_BENCH_FAKE_WEDGE_STAGE": f"scan_full:600{wedge_mode}",
        "OMNI_BENCH_BUDGET_S": "600",        # between-stage gate stays open
        "OMNI_BENCH_HARD_EXIT_S": "45",      # hard deadline at 45 s
        "OMNI_BENCH_STAGE_DEADLINE_S": "600",
    })
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        cwd=REPO, env=env, timeout=180,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    # the supervisor-patched tail line must ALSO respect the driver's
    # capture cap (VERDICT r4 #1: every tier, including this one)
    assert len(lines[-1]) < 1500, len(lines[-1])
    last = json.loads(lines[-1])
    return last, last["details"]


def test_child_hard_exit_on_wedged_stage():
    # a wedge that RELEASES the GIL: the child's own hard-exit timer fires
    # (slightly before the supervisor's deadline), annotates the wedged
    # stage, emits the final line, and exits 0
    last, d = _run_supervised("")
    assert "hard_exit_at_s" in d, d.keys()
    assert "hard-exit" in d.get("stages_skipped", {}).get("scan_full", "")
    assert last["value"] > 0          # scan_coarse's headline landed
    assert "full_fused_scan_qps" not in d


def test_supervisor_kills_gil_wedged_child():
    # the real failure mode on the dev tunnel: a native call wedges while
    # HOLDING THE GIL, so no in-process timer thread can ever run
    # (observed live: 4 s CPU over 17 min, watchdog never fired). Only the
    # no-jax supervisor parent can still act: it kills the child at the
    # hard deadline and patches the last complete line, rc=0.
    last, d = _run_supervised(":gil")
    assert "supervisor" in d, d.keys()
    assert "hard deadline" in d["supervisor"]
    assert last["value"] > 0          # scan_coarse's headline landed
    assert "full_fused_scan_qps" not in d


def test_global_budget_skips_remainder():
    # budget expires during setup_scan's successor stages: everything after
    # is skipped with a budget annotation, final line complete, rc=0
    proc, parsed = _run({
        "OMNI_BENCH_FAKE_SLOW_STAGE": "scan_coarse:60",
        "OMNI_BENCH_BUDGET_S": "1",
        # hard-exit would fire at budget+105 anyway; keep it far away so
        # this test exercises the between-stage budget path specifically
        "OMNI_BENCH_HARD_EXIT_S": "200",
    })
    assert proc.returncode == 0, proc.stderr[-2000:]
    d = parsed[-1]["details"]
    skipped = d.get("stages_skipped", {})
    # scan_coarse aborted at the global-budget checkpoint; scan_full and
    # scan_kw never started (skipped by the between-stage budget gate)
    assert "scan_coarse" in skipped and "budget" in skipped["scan_coarse"]
    assert "scan_full" in skipped and "budget" in skipped["scan_full"]
    assert d["stage_timings_s"]["setup_scan"] > 0
