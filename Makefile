# Convenience targets for the build loop.  `make hygiene` is the fast
# Spark-free tripwire set the pre-commit hook runs; `make check` is the
# full suite; `make survey` regenerates SURVEY.md §2.3 from the registry.

.PHONY: hygiene check check-sf001 bench bench-regress survey hooks

hygiene:
	python tools/priority_check.py
	python -m pytest tests/test_engine.py -q -x -k "pinned or idempotent or survey or similarity"
	python -m pytest tests/test_bench_regress.py tests/test_changed_keys.py -q -x

check:
	python -m pytest tests/ -q
	python tools/bench_regress.py

bench-regress:
	python tools/bench_regress.py

check-sf001:
	SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 python -m pytest tests/ -q

bench:
	SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 python bench.py

survey:
	python -m nedp_etl_spark.registry --update-survey

hooks:
	git config core.hooksPath .githooks
	chmod +x .githooks/pre-commit
