"""CLI stub — implemented later this round."""


def main(argv=None):
    raise NotImplementedError("openset_imagenet_tpu.script.train_all: coming in this round")
