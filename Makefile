# Developer entry points (reference analogue: Makefile at repo root)
.PHONY: test test-fast bench example native docs clean

docs:
	python tools/gen_api_index.py > docs/api.md

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x -m "not slow" -k "not hypothesis"

bench:
	python bench.py

example:
	python examples/end_to_end.py

native:
	g++ -O3 -shared -fPIC -std=c++17 lidbox_tpu/native/audioio.cpp \
	    -o lidbox_tpu/native/libaudioio.so

clean:
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null; \
	rm -f lidbox_tpu/native/libaudioio.so cProfile.log
