"""Doctest runner for API-contract examples (the reference's tier-1 test
style: runnable examples on public items, SURVEY.md §4), plus a
docstring-coverage sweep over every ``__all__`` name of the public
modules."""

import doctest
import importlib
import inspect
import pkgutil

import pytest

import pasture_tpu

# importlib avoids package attributes that shadow submodules (e.g.
# pasture_tpu.registration.icp is the FUNCTION after the package's
# `from .icp import icp`)
_M = [importlib.import_module(n) for n in [
    "pasture_tpu.layout.schema",
    "pasture_tpu.layout.conversion",
    "pasture_tpu.math.aabb",
    "pasture_tpu.math.morton",
    "pasture_tpu.io.base",
    "pasture_tpu.io.streaming",
    "pasture_tpu.ops.voxel",
    "pasture_tpu.ops.voxel_merge",
    "pasture_tpu.algorithms.normals",
    "pasture_tpu.registration.icp",
    "pasture_tpu.pipeline",
    "pasture_tpu.parallel.partition",
]]
MODULES = _M


@pytest.mark.parametrize("module", MODULES, ids=lambda m: m.__name__)
def test_doctests(module):
    failures, _ = doctest.testmod(module, verbose=False)
    assert failures == 0


def _public_modules():
    """Every pasture_tpu module that declares ``__all__`` (skipping the
    native build helpers, which may shell out to a compiler on import)."""
    out = []
    for info in pkgutil.walk_packages(pasture_tpu.__path__,
                                      prefix="pasture_tpu."):
        if ".native" in info.name:
            continue
        mod = importlib.import_module(info.name)
        if getattr(mod, "__all__", None):
            out.append(mod)
    return out


def test_every_public_name_is_documented():
    """Every ``__all__`` name of every public module carries a docstring —
    the reference documents every public item (point_layout.rs:767-777
    style); runnable examples cover the user-facing entry points via
    the doctest modules above."""
    missing = []
    for mod in _public_modules():
        for name in mod.__all__:
            obj = getattr(mod, name, None)
            if obj is None:
                missing.append(f"{mod.__name__}.{name} (unresolvable)")
                continue
            if isinstance(obj, (int, float, str, dict, tuple, frozenset)):
                continue  # constants: documented by the module docstring
            import typing
            if typing.get_origin(obj) is not None:
                continue  # typing aliases: documented by a #: comment
            doc = inspect.getdoc(obj)
            if not doc or not doc.strip():
                missing.append(f"{mod.__name__}.{name}")
    assert not missing, f"undocumented public names: {missing}"


def test_entry_points_have_runnable_examples():
    """The flagship user-facing entry points must carry at least one
    doctest example (round-3 verdict task 6)."""
    by_name = {m.__name__: m for m in MODULES}
    targets = [
        by_name["pasture_tpu.io.base"].read_all,
        by_name["pasture_tpu.ops.voxel"].voxel_downsample,
        by_name["pasture_tpu.ops.voxel_merge"].merge_voxel_batches,
        by_name["pasture_tpu.algorithms.normals"].compute_normals,
        by_name["pasture_tpu.registration.icp"].icp,
        by_name["pasture_tpu.pipeline"].RegistrationPipeline,
        by_name["pasture_tpu.parallel.partition"].morton_partition,
    ]
    for obj in targets:
        examples = doctest.DocTestFinder().find(obj)
        assert any(t.examples for t in examples), obj
