# Developer entry points (reference parity: Makefile with venv/test/example/
# tensorboard targets).

PY ?= python

.PHONY: tests tests-fast training_example evaluation_example bench graft tensorboard docs

tests:
	$(PY) -m pytest tests/ -q

tests-fast:
	$(PY) -m pytest tests/ -q -x

training_example:
	$(PY) -m examples.run_example examples/training/minimal_example.yaml

evaluation_example:
	$(PY) -m examples.run_example examples/evaluation/evaluation_example.yaml

bench:
	$(PY) bench.py

docs:
	$(PY) scripts/gen_api_docs.py
	$(PY) scripts/build_docs.py

graft:
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
		$(PY) __graft_entry__.py

tensorboard:
	tensorboard --logdir ./data/results
