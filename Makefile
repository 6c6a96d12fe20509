.PHONY: test test-fast test-comprehensive test-multichip bench lint clean native

native:
	python setup_native.py

test:
	python -m pytest tests/ -x -q

test-fast:
	python -m pytest tests/ -m "fast and not slow and not tpu" -q

test-comprehensive:
	python scripts/run_comprehensive_tests.py --phases fast integration multichip examples

test-multichip:
	python -m pytest tests/ -m multichip -q

bench:
	python bench.py

lint:
	python scripts/lint.py

clean:
	find . -type d -name __pycache__ -exec rm -rf {} +
	rm -rf .pytest_cache benchmarks/results
