"""CLI stub — implemented later this round."""


def main(argv=None):
    raise NotImplementedError("openset_imagenet_tpu.script.protocols: coming in this round")
