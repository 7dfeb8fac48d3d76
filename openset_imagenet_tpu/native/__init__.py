"""openset_imagenet_tpu.native subpackage."""
