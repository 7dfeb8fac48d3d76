# Convenience targets (see README.md / BENCH.md for details).

.PHONY: test bench bench-pipeline quickstart native clean dryrun verify

test:
	python -m pytest tests/ -q

# Multi-chip compile/execute validation on a virtual 8-device CPU mesh.
dryrun:
	python -c "import __graft_entry__ as g; g.dryrun_multichip(8); \
	print('dryrun ok')"

# Full local validation: suite + virtual-mesh dryrun + quickstart chain.
verify: test dryrun quickstart

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
