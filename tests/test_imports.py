"""Import-everything check.

Round 3 shipped a suite that did not even collect (a stale import of a
deleted module in ops/generator.py) because no cheap gate imported
every module. This is that gate: it fails in seconds on any broken
import, unused-module rot, or missing dependency, the way the
reference's CI catches it by compiling the whole workspace on every
push (/root/reference/.github/workflows/ci.yml test job).
"""

import importlib
import pkgutil

import bellman_tpu


def test_import_every_module():
    failures = []
    for mod in pkgutil.walk_packages(bellman_tpu.__path__, "bellman_tpu."):
        try:
            importlib.import_module(mod.name)
        except Exception as e:  # noqa: BLE001 - collect all, report once
            failures.append(f"{mod.name}: {type(e).__name__}: {e}")
    assert not failures, "broken imports:\n" + "\n".join(failures)


def test_import_entry_points():
    import __graft_entry__  # noqa: F401  (driver entry)

    import bench  # noqa: F401  (driver bench harness)
