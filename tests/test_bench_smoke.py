"""Smoke test for the driver-facing bench entry point.

Round 2's official bench crashed (``BENCH_r02.json`` rc=1) because a
``Dataset`` schema change landed in ``algo/update.py`` without touching
``bench.py`` — and nothing in the suite imported it. This test runs the
actual ``bench.main`` path (all four bench functions + the JSON assembly)
at tiny sizes on CPU so the entry point can never silently rot again.
"""

import importlib.util
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _load_bench():
    spec = importlib.util.spec_from_file_location("bench", REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_bench_main_tiny(capsys):
    bench = _load_bench()
    record = bench.main(tiny=True)

    # The driver contract: the LAST stdout line is ONE compact JSON record
    # (the driver's tail window truncates long lines — round 3's audit-laden
    # line came back ``parsed: null``). Audit rides on stderr + BENCH_CLEAN.
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    assert len(out[-1]) < 1024, f"driver line too long ({len(out[-1])} bytes)"
    parsed = json.loads(out[-1])
    assert set(parsed) == {"metric", "value", "unit", "vs_baseline"}
    assert parsed["metric"] == "fused_rollout_env_steps_per_second"
    assert parsed["value"] > 0
    assert {k: record[k] for k in parsed} == parsed

    # Audit block completeness — the fields the judge re-derives from.
    audit = record["audit"]
    ro = audit["rollout"]
    for key in ("batch", "trip_count", "total_moves", "best_seconds",
                "occupancy_pct", "model_mfu_pct", "runs"):
        assert key in ro, key
    assert ro["total_moves"] > 0
    assert audit["env_only_steps_per_second"] > 0
    assert audit["learner_bs512_kl"]["updates_per_second"] > 0
    assert audit["learner_bs4096_nokl"]["updates_per_second"] > 0
    assert audit["train_step_e2e_ht"]["env_steps_per_second"] > 0
    packed = audit["train_step_e2e_packed_256lane"]
    assert packed["env_steps_per_second"] > 0
    assert packed["occupancy_pct"] == 100.0


def test_bench_learner_dataset_schema():
    """bench_learner must construct algo.update.Dataset with every field —
    this is exactly the call that broke in round 2."""
    bench = _load_bench()
    stats = bench.bench_learner(8, S=32, kl_diagnostic=False)
    assert stats["updates_per_second"] > 0
