# Developer entry points (the reference's Makefile declares test/lint targets;
# here they actually work).
.PHONY: test lint native bench verify

test:
	python -m pytest tests/ -x -q

lint:
	python -m compileall -q olmoasr_tpu tests bench.py __graft_entry__.py

native:
	python -m olmoasr_tpu.cpp.build

bench:
	python bench.py
