# occm-tpu developer entry points

.PHONY: native test test-fast test-slow bench demo clean

native:
	$(MAKE) -C native

test-fast: native
	python -m pytest tests/ -q -m "not slow"

test-slow: native
	python -m pytest tests/ -q -m "slow"

test: test-fast test-slow

bench:
	python bench.py

demo:
	python examples/synthetic_demo.py --cpu

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
