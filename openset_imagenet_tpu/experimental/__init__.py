"""Experimental surfaces: measured NEGATIVE results kept for documentation.

Nothing in this package runs by default.  Each module is a fully built,
gradient-exact, tested implementation that LOST its benchmark on the
current toolchain and is preserved as an executable record plus a
re-measure hook for future toolchains (CLAUDE.md open items):

* :mod:`.fused_block` — block-level custom-VJP bottleneck with Pallas
  backward kernels.  Benched 2295 imgs/s vs the 2625 XLA baseline on v5e
  (BENCH.md round-2b): the Mosaic streaming ceiling on this jaxlib sits at
  ~1/3 of XLA's own fusion bandwidth, and restructuring the block perturbs
  XLA's layout/fusion assignment.  Re-measure on every toolchain bump; if
  Mosaic ever approaches ~680 GB/s the stage-1 fusions become a ~10-15%
  end-to-end lever.  Opt in via ``model.fused_blocks`` /
  ``model.boundary_mask`` config flags (and ``OSI_FUSED_BLOCK_BWD=pallas``
  for the Pallas backward).
"""
