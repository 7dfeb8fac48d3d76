"""openset_imagenet_tpu.ops subpackage."""
