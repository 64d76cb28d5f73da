.PHONY: test test-fast bench lint dryrun

test:
	python -m pytest tests/ -x -q

test-fast:
	python -m pytest tests/ -x -q -k "not sharding and not golden and not engine_multidevice"

bench:
	python bench.py

dryrun:
	python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

lint:
	python -m compileall -q style_transfer_tpu tests tools bench.py __graft_entry__.py
