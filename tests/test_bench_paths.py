"""Execute every bench.py path body at smoke scale on CPU.

The TPU backend is intermittently unavailable for hours (CLAUDE.md), so
measurement windows are scarce: a Python/tracing error inside a bench
body must be caught HERE, not when the recovery queue finally gets the
chip.  VST_BENCH_SMOKE=1 shrinks every path to tiny shapes and 1-vs-2
chains; the numbers are meaningless but the full body executes — model
forwards, train steps, streaming pipeline, metric assembly.
"""

import pytest

import bench


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(bench.PATHS))
def test_path_body_executes(name, monkeypatch):
    monkeypatch.setenv("VST_BENCH_SMOKE", "1")
    metric, value, unit, vs = bench.PATHS[name]()
    assert isinstance(metric, str) and metric
    assert isinstance(unit, str) and unit
    float(value), float(vs)  # finite-ish scalars (jitter can do anything)
