"""Doctest runner for API-contract examples (the reference's tier-1 test
style: runnable examples on public items, SURVEY.md §4)."""

import doctest

import pytest

import pasture_tpu.layout.schema
import pasture_tpu.layout.conversion
import pasture_tpu.math.aabb
import pasture_tpu.math.morton

MODULES = [
    pasture_tpu.layout.schema,
    pasture_tpu.layout.conversion,
    pasture_tpu.math.aabb,
    pasture_tpu.math.morton,
]


@pytest.mark.parametrize("module", MODULES, ids=lambda m: m.__name__)
def test_doctests(module):
    failures, _ = doctest.testmod(module, verbose=False)
    assert failures == 0
