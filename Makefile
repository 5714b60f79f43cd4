.PHONY: test test-fast dist bench bench-scaling diff check-queries

test:
	python -m pytest tests/ -x -q

test-fast:
	python -m pytest tests/test_functions.py tests/test_parse_golden.py tests/test_oracle.py -x -q

dist:
	python -c "import sys; sys.path.insert(0,'.'); from scripts.bench_scaling import build_zip; print(build_zip())"

bench:
	python bench.py

bench-scaling:
	python scripts/bench_scaling.py --scale scaling

diff:
	python scripts/diff_vs_oracle.py smoke 16

check-queries:
	python scripts/check_queries.py /root/testdata/sf0.01
