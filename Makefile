# Convenience targets (see README.md / BENCH.md for details).

.PHONY: test bench bench-pipeline quickstart native clean

test:
	python -m pytest tests/ -q

bench:
	python bench.py

bench-pipeline:
	python bench_pipeline.py

quickstart:
	python examples/quickstart.py

# Build the fused JPEG decoder explicitly (otherwise built on first use).
native:
	g++ -O3 -march=native -shared -fPIC native/osijpeg.cpp \
	    -o native/libosijpeg.so -ljpeg

clean:
	rm -rf native/libosijpeg.so tests/.jax_cache .pytest_cache
