def gradient_update_parameters(*args, **kwargs):
    raise RuntimeError(
        "torchmeta stub: MAML training is not supported in the reference "
        "baseline harness (torchmeta is not installed in this image)")
