"""Observability utilities (SURVEY.md §5): timers, memory stats, logging."""

import jax.numpy as jnp

from fastedit_tpu.utils.logging import get_logger
from fastedit_tpu.utils.profiling import StageTimer, device_memory_stats, sync


def test_stage_timer_accumulates():
    t = StageTimer()
    with t.stage("a") as out:
        out["result"] = jnp.ones((4, 4)) * 2
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    assert t.counts["a"] == 2 and t.counts["b"] == 1
    report = t.report()
    assert "a" in report and "avg_ms" in report


def test_sync_handles_nested_trees():
    sync({"x": jnp.ones(3), "y": [jnp.zeros((2, 2))], "z": 5})


def test_device_memory_stats_keys():
    stats = device_memory_stats()
    assert set(stats) == {
        "bytes_in_use_gb",
        "peak_bytes_in_use_gb",
        "bytes_limit_gb",
    }


def test_logger_singleton_and_tag():
    import io
    import logging

    log = get_logger("TestComp")
    # attach a capture handler on the shared root (the stdout handler may
    # hold a pre-capsys stream, so capture explicitly).
    buf = io.StringIO()
    handler = logging.StreamHandler(buf)
    handler.setFormatter(logging.Formatter("[%(name)s] %(message)s"))
    logging.getLogger("fastedit").addHandler(handler)
    try:
        log.info("hello %d", 42)
    finally:
        logging.getLogger("fastedit").removeHandler(handler)
    out = buf.getvalue()
    assert "[fastedit.TestComp]" in out and "hello 42" in out
