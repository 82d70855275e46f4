# One-command gates (the reference's CI discipline,
# /root/reference/.github/workflows/ci.yml: test matrix + no-default-
# features build + bench bitrot). CPU-only; bench.py targets the chip.

PY ?= python

.PHONY: smoke test-fast test-slow test-full dryrun gate bench

# smoke tier (seconds–2 min on the 1-core host): import-everything +
# the golden-value DummyEngine pipeline + constraint-count pins.
# Run this after EVERY change; it catches collection/import breakage
# and protocol regressions without any device-kernel compiles.
smoke:
	$(PY) -m pytest tests/test_imports.py tests/test_groth16_dummy.py \
	  tests/test_algebra_host.py -x -q

# fast suite: everything not marked slow (pyproject addopts)
test-fast:
	$(PY) -m pytest tests/ -x -q

# slow suite: compile-heavy e2e paths (device generator/prover, Pallas
# scan kernels, sha256d e2e). MUST run in CI — it is the only coverage
# of those paths (ADVICE.md round 1).
test-slow:
	$(PY) -m pytest tests/ -x -q -m slow

test-full: test-fast test-slow

# 8-virtual-device sharded training-step compile+run (what the driver runs)
dryrun:
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	  $(PY) -c "import __graft_entry__ as e; e.dryrun_multichip(8); print('dryrun ok')"

# the full local gate
gate: test-fast dryrun

bench:
	$(PY) bench.py

# driver-fidelity check: clone the COMMITTED tree to a temp dir and run
# the bench exactly as the driver does (fresh clone, default budget).
# Uncommitted work is invisible here by design.
freshcheck:
	rm -rf /tmp/bellman_freshcheck
	git clone -q . /tmp/bellman_freshcheck
	cd /tmp/bellman_freshcheck && $(PY) bench.py
