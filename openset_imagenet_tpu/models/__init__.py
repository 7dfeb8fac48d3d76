"""openset_imagenet_tpu.models subpackage."""
