"""openset_imagenet_tpu.script subpackage."""
