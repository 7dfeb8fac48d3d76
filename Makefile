# Convenience targets (see README.md / BENCH.md for details).

.PHONY: test bench bench-pipeline quickstart native clean dryrun verify \
        parity-real

test:
	python -m pytest tests/ -q

# Multi-chip compile/execute validation on a virtual 8-device CPU mesh.
dryrun:
	python -c "import __graft_entry__ as g; g.dryrun_multichip(8); \
	print('dryrun ok')"

# Full local validation: suite + virtual-mesh dryrun + quickstart chain.
verify: test dryrun quickstart

# End-to-end CLI workflow on a synthetic world (protocols -> train ->
# evaluate -> 2-process launcher -> plot -> learning bar).
drive:
	python tools/drive_cli.py --loss garbage

# Data-gated parity validation: run the moment the real artifacts exist
# (none are fetchable in this image — zero egress).  Expected inputs:
#   OSI_IMAGENET_METADATA   dir with wordnet.is_a.txt, words.txt,
#                           imagenet_class_index.json (robustness pkg data)
#   OSI_PROTOCOL_GOLDENS    (optional) JSON of the reference's class lists
#                           per protocol: {"1": {"kn": [...], ...}, ...}
#   OSI_REFERENCE_MODEL     a published reference .pth checkpoint
#                           (reference readme.md:25-33)
#   OSI_REFERENCE_MODEL_LOGITS (optional) npz {images, logits} from the
#                           reference model in eval mode for logit parity
# plus an installed torchvision for the direct transform check.
parity-real:
	@test -n "$$OSI_IMAGENET_METADATA" || \
	  echo "note: OSI_IMAGENET_METADATA unset - metadata parity will skip"
	@test -n "$$OSI_REFERENCE_MODEL" || \
	  echo "note: OSI_REFERENCE_MODEL unset - model import smoke will skip"
	python -m pytest -v -rs \
	  tests/test_wordnet_equivalence.py::test_protocol_real_metadata_class_lists \
	  tests/test_transform_parity.py::test_against_installed_torchvision_if_available \
	  tests/test_real_model_import.py

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
