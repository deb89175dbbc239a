"""Pin the lakehouse scratch-slot lifetime contract (ADVICE r8):
each invocation gets a fresh generation subdirectory, the PREVIOUS
generation stays readable (a caller may still hold its lazy result),
and anything older is deleted — bounded retention of exactly one
back-generation."""

from __future__ import annotations

import os

from etl_inreach_spark import queries_lakehouse as L


def test_scratch_keeps_exactly_one_back_generation():
    slot = "retention_probe"
    d1 = L._scratch(slot)
    open(os.path.join(d1, "f"), "w").write("1")
    d2 = L._scratch(slot)
    assert d1 != d2
    # previous generation still readable after the next invocation
    assert os.path.exists(os.path.join(d1, "f"))
    d3 = L._scratch(slot)
    # keep-last-1: g1 is gone, g2 survives, g3 is fresh and empty
    assert not os.path.exists(d1)
    assert os.path.exists(d2)
    assert os.path.exists(d3) and not os.listdir(d3)
    # slots are independent
    other = L._scratch("retention_probe_other")
    assert os.path.exists(d2) and os.path.exists(other)
