"""Profiling utility tests."""

import numpy as np

from annsearch_tpu.utils.profiling import Timer, force, span


def test_timer_accumulates():
    t = Timer()
    with t.span("a"):
        pass
    with t.span("a"):
        pass
    with t.span("b"):
        pass
    assert t.counts["a"] == 2 and t.counts["b"] == 1
    assert "a" in t.report()


def test_span_prints(capsys):
    with span("unit", verbose=True):
        pass
    assert "[unit]" in capsys.readouterr().out


def test_force():
    import jax.numpy as jnp

    assert force(jnp.ones((3,))) == 1.0
    assert force(jnp.zeros((0,))) == 0.0
