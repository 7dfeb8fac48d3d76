"""openset_imagenet_tpu.parallel subpackage."""
