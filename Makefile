.PHONY: test verify verify-full bench plans

test:
	python -m pytest tests/ -x -q

verify:
	python tools/verify_local.py /root/testdata/sf0.01

verify-full:
	python tools/verify_local.py /root/testdata/sf0.1

bench:
	python bench.py

plans:
	python tools/plan_audit.py
