.PHONY: test suite native bench clean viewer device-check

native:
	$(MAKE) -C raytracer_tpu/native

test: native
	python -m pytest tests/ -q

# Survivable full run: one pytest subprocess per file, crash retry
# (XLA has segfaulted mid-suite on this host — see scripts/run_suite.py)
suite: native
	python scripts/run_suite.py

# device-only regression gate (run on TPU before every BENCH capture):
# bf16-split canary, split-scan + K-slot bitwise parity, physics vs jnp
device-check:
	python scripts/device_check.py

bench:
	python bench.py

bench-all:
	BENCH_CONFIG=all python bench.py

viewer:
	python -m raytracer_tpu.app.viewer --config demo

clean:
	$(MAKE) -C raytracer_tpu/native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
